"""Composition-level featurizers (SURVEY.md §2.9) as pure Catalyst
expressions over the formula string — the engine's replacement for
matminer's ScalarFeaturizer wrappers (reference ml_prediction.py:26-37).

Each featurizer ships a DuckDB SQL twin generated from the SAME Python
constants, so feature values are oracle-checked — the reference can
only eyeball its features; here they are hash-verified cross-engine.

Determinism: every reduction folds the token list in formula order in
both engines (left fold), so doubles match bit-for-bit before the
final ROUND.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from oxi_diel_db_spark.functions.formula import PAULING_EN, formula_tokens

# Transition metals (public periodic-table fact; matminer's
# TMetalFraction uses the same d-block set — ml_prediction.py:107).
TRANSITION_METALS = [
    "Sc", "Ti", "V", "Cr", "Mn", "Fe", "Co", "Ni", "Cu", "Zn",
    "Y", "Zr", "Nb", "Mo", "Tc", "Ru", "Rh", "Pd", "Ag", "Cd",
    "Hf", "Ta", "W", "Re", "Os", "Ir", "Pt", "Au", "Hg",
]


def _tok_counts(formula: Column | str) -> Column:
    """array<struct<el,cnt>> in formula order."""
    toks = formula_tokens(formula)
    return F.transform(
        toks,
        lambda t0: F.struct(
            F.regexp_extract(t0, "[A-Z][a-z]?", 0).alias("el"),
            F.coalesce(
                F.nullif(F.regexp_extract(t0, "[0-9.]+", 0), F.lit("")), F.lit("1")
            )
            .cast("double")
            .alias("cnt"),
        ),
    )


_SQL_TOKS = (
    "list_transform(regexp_extract_all({f}, '[A-Z][a-z]?[0-9.]*'), t -> struct_pack("
    "el := regexp_extract(t, '[A-Z][a-z]?'), "
    "cnt := CAST(CASE WHEN regexp_extract(t, '[0-9.]+') = '' THEN '1' "
    "ELSE regexp_extract(t, '[0-9.]+') END AS DOUBLE)))"
)


def _fold_sum(arr: Column, fn) -> Column:
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + fn(x))


def total_atoms(formula: Column | str) -> Column:
    return _fold_sum(_tok_counts(formula), lambda s: s["cnt"])


SQL_TOTAL_ATOMS = (
    "list_aggregate(list_transform(" + _SQL_TOKS + ", s -> s.cnt), 'sum')"
)


def stoichiometry_pnorm(formula: Column | str, p: int) -> Column:
    """Stoichiometry featurizer (matminer preset p-norms; reference
    ml_prediction.py:119): ||x||_p of the atomic-fraction vector."""
    toks = _tok_counts(formula)
    tot = _fold_sum(toks, lambda s: s["cnt"])
    if p == 0:
        return F.size(toks).cast("double")
    powsum = _fold_sum(toks, lambda s: F.pow(s["cnt"] / tot, float(p)))
    return F.pow(powsum, 1.0 / p)


def sql_stoichiometry_pnorm(f: str, p: int) -> str:
    toks = _SQL_TOKS.format(f=f)
    tot = f"list_aggregate(list_transform({toks}, s -> s.cnt), 'sum')"
    if p == 0:
        return f"CAST(len({toks}) AS DOUBLE)"
    return (
        f"pow(list_aggregate(list_transform({toks}, "
        f"s -> pow(s.cnt / ({tot}), {float(p)})), 'sum'), {1.0 / p})"
    )


def tmetal_fraction(formula: Column | str) -> Column:
    """TMetalFraction featurizer (reference ml_prediction.py:107):
    fraction of atoms that are transition metals."""
    toks = _tok_counts(formula)
    tot = _fold_sum(toks, lambda s: s["cnt"])
    tm = _fold_sum(
        toks,
        lambda s: F.when(s["el"].isin(TRANSITION_METALS), s["cnt"]).otherwise(0.0),
    )
    return tm / tot


def sql_tmetal_fraction(f: str) -> str:
    toks = _SQL_TOKS.format(f=f)
    tms = ", ".join(repr(x) for x in TRANSITION_METALS)
    tot = f"list_aggregate(list_transform({toks}, s -> s.cnt), 'sum')"
    tm = (
        f"list_aggregate(list_transform({toks}, "
        f"s -> CASE WHEN s.el IN ({tms}) THEN s.cnt ELSE 0.0 END), 'sum')"
    )
    return f"({tm}) / ({tot})"


def _en_map_expr() -> Column:
    kv = [x for el, en in sorted(PAULING_EN.items()) for x in (F.lit(el), F.lit(en))]
    return F.create_map(*kv)


def _sql_en_case() -> str:
    # CAST: DuckDB types bare decimal literals as DECIMAL, not DOUBLE —
    # downstream arithmetic would run in decimal and hash-mismatch.
    whens = " ".join(
        f"WHEN '{el}' THEN {en}" for el, en in sorted(PAULING_EN.items())
    )
    return f"CAST((CASE s.el {whens} ELSE NULL END) AS DOUBLE)"


def electronegativity_stats(formula: Column | str) -> dict[str, Column]:
    """ElementProperty-style elemental stats (reference
    ml_prediction.py:76): count-weighted mean + min/max/range of Pauling
    EN over the composition. The element table is a literal map — the
    broadcast-dim pattern of §2.9 without even a join."""
    toks = _tok_counts(formula)
    en_map = _en_map_expr()
    tot = _fold_sum(toks, lambda s: s["cnt"])
    wsum = _fold_sum(toks, lambda s: en_map[s["el"]] * s["cnt"])
    ens = F.transform(toks, lambda s: en_map[s["el"]])
    return {
        "en_mean": wsum / tot,
        "en_min": F.array_min(ens),
        "en_max": F.array_max(ens),
        "en_range": F.array_max(ens) - F.array_min(ens),
    }


def sql_electronegativity_stats(f: str) -> dict[str, str]:
    toks = _SQL_TOKS.format(f=f)
    case = _sql_en_case()
    tot = f"list_aggregate(list_transform({toks}, s -> s.cnt), 'sum')"
    wsum = f"list_aggregate(list_transform({toks}, s -> {case} * s.cnt), 'sum')"
    ens = f"list_transform({toks}, s -> {case})"
    return {
        "en_mean": f"({wsum}) / ({tot})",
        "en_min": f"list_min({ens})",
        "en_max": f"list_max({ens})",
        "en_range": f"list_max({ens}) - list_min({ens})",
    }


def band_center(formula: Column | str) -> Column:
    """BandCenter featurizer (reference ml_prediction.py:112): the
    count-weighted geometric mean of electronegativities,
    exp(Σ c·ln(EN) / Σ c)."""
    toks = _tok_counts(formula)
    en_map = _en_map_expr()
    tot = _fold_sum(toks, lambda s: s["cnt"])
    lnsum = _fold_sum(toks, lambda s: s["cnt"] * F.log(en_map[s["el"]]))
    return F.exp(lnsum / tot)


def sql_band_center(f: str) -> str:
    toks = _SQL_TOKS.format(f=f)
    case = _sql_en_case()
    tot = f"list_aggregate(list_transform({toks}, s -> s.cnt), 'sum')"
    lnsum = f"list_aggregate(list_transform({toks}, s -> s.cnt * ln({case})), 'sum')"
    return f"exp(({lnsum}) / ({tot}))"
