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
import string

from pyspark.sql.functions import udtf

# Must match functions.text.ascii_lower exactly: ASCII-only A-Z fold,
# NOT locale-aware str.lower() — U+212A 'K'.lower() is ASCII 'k' and
# U+0130 'İ'.lower() is 'i'+U+0307, either of which would diverge from
# the Catalyst translate() twin and the DuckDB oracle on non-ASCII text.
_ASCII_FOLD = str.maketrans(string.ascii_uppercase, string.ascii_lowercase)

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
    spark.udtf.register("ngram_explode", udtf(NgramExplode))
    spark.udtf.register(
        "partition_summarize",
        udtf(
            PartitionSummarize,
            returnType="event_type string, n bigint, total double",
        ),
    )


class NgramExplode:
    """POLYMORPHIC UDTF (Spark 4 ``analyze`` API): output schema is
    computed at plan time from the CONSTANT n argument — ``n=3`` emits
    (pos, w1, w2, w3), ``n=2`` emits (pos, w1, w2). The dynamic-schema
    table function the engine exposes for n-gram feature extraction;
    tokenization matches functions.text.norm_words (ASCII-only case
    fold via translate, split on non-[a-z0-9] runs) so expression-based
    and UDTF-based n-grams agree token-for-token, including under
    Unicode-adversarial input (dotted-İ, Kelvin-sign K)."""

    @staticmethod
    def analyze(text, n):
        from pyspark.sql.types import IntegerType, StringType, StructType
        from pyspark.sql.udtf import AnalyzeResult

        if n.value is None or not isinstance(n.value, int) or n.value < 1:
            raise ValueError("n must be a constant positive integer")
        schema = StructType().add("pos", IntegerType())
        for k in range(n.value):
            schema = schema.add(f"w{k + 1}", StringType())
        return AnalyzeResult(schema=schema)

    def eval(self, text: str, n: int):  # noqa: D102
        folded = (text or "").translate(_ASCII_FOLD)
        words = [w for w in re.split("[^a-z0-9]+", folded) if w]
        for i in range(len(words) - n + 1):
            yield (i + 1, *words[i : i + n])


class PartitionSummarize:
    """UDTF consuming a TABLE(...) PARTITION BY input (Spark 3.5+
    table-argument API, the one UDTF invocation shape scalar-arg
    UDTFs like formula_explode/ngram_explode don't exercise): rows of
    one partition stream through eval() and terminate() emits the
    partition's summary — count plus an exact cent-integer value sum,
    so the output is hash-comparable to a plain GROUP BY. The Python
    twin of a partial aggregate; registered by register_udtfs as
    ``partition_summarize``."""

    def __init__(self):
        self._key = None
        self._n = 0
        self._cents = 0

    def eval(self, row):  # noqa: D102
        self._key = row["event_type"]
        self._n += 1
        v = row["value"]
        if v is not None:
            self._cents += int(round(v * 100))

    def terminate(self):  # noqa: D102
        if self._n:
            yield self._key, self._n, self._cents / 100.0
