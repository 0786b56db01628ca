"""Python UDTFs (SURVEY.md §2.11 UDTF row): one input row → many
output rows through the table-function API (Spark 3.5+).

The reference's UDTF shape is one material → nsites site-feature rows
(ml_prediction.py:44). Most engine explosions use posexplode (JVM);
this module demonstrates the *Python* UDTF surface for logic that
needs imperative parsing — formula decomposition, mirroring
pymatgen's Composition iteration (reference main.py:33).
"""

from __future__ import annotations

import re

from pyspark.sql.functions import udtf

_TOKEN = re.compile(r"[A-Z][a-z]?[0-9.]*")
_EL = re.compile(r"[A-Z][a-z]?")


@udtf(returnType="element string, cnt double")
class FormulaExplode:
    """'Ca2SnO4' → rows (Ca,2.0), (Sn,1.0), (O,4.0) — the UDTF twin of
    functions.formula.parse_formula (same token grammar)."""

    def eval(self, formula: str):  # noqa: D102
        for tok in _TOKEN.findall(formula or ""):
            el = _EL.match(tok).group(0)
            num = tok[len(el):]
            yield el, float(num) if num else 1.0


def register_udtfs(spark) -> None:
    spark.udtf.register("formula_explode", FormulaExplode)
