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
_GROUP = re.compile(r"\(([^()]*)\)([0-9.]*)")


def _flat_tokens(s: str, mult: float):
    for tok in _TOKEN.findall(s):
        el = _EL.match(tok).group(0)
        num = tok[len(el):]
        yield el, (float(num) if num else 1.0) * mult


@udtf(returnType="element string, cnt double")
class FormulaExplode:
    """'Ba(AuO2)2' → rows (Ba,1.0), (Au,2.0), (O,4.0) — the UDTF twin of
    functions.formula.parse_formula (same grammar incl. depth-1 group
    multipliers; outside tokens first, then group tokens, matching
    formula_pairs' expansion order)."""

    def eval(self, formula: str):  # noqa: D102
        f = formula or ""
        yield from _flat_tokens(_GROUP.sub("", f), 1.0)
        for m in _GROUP.finditer(f):
            yield from _flat_tokens(m.group(1), float(m.group(2) or "1"))


def register_udtfs(spark) -> None:
    spark.udtf.register("formula_explode", FormulaExplode)
