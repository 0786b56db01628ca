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

from oxi_diel_db_spark.functions.formula import (
    PAULING_EN,
    formula_pairs,
    sql_formula_pairs,
)

# Transition metals (public periodic-table fact; matminer's
# TMetalFraction uses the same d-block set — ml_prediction.py:107).
TRANSITION_METALS = [
    "Sc", "Ti", "V", "Cr", "Mn", "Fe", "Co", "Ni", "Cu", "Zn",
    "Y", "Zr", "Nb", "Mo", "Tc", "Ru", "Rh", "Pd", "Ag", "Cd",
    "Hf", "Ta", "W", "Re", "Os", "Ir", "Pt", "Au", "Hg",
]


def _tok_counts(formula: Column | str) -> Column:
    """array<struct<el,cnt>> in expansion order (paren groups expanded —
    ADVICE r1: 189/1,278 corpus formulas carry a group multiplier)."""
    return formula_pairs(formula)


class _SqlToks:
    """Shim keeping the `_SQL_TOKS.format(f=...)` call sites working while
    delegating to the group-aware sql_formula_pairs()."""

    @staticmethod
    def format(f: str) -> str:
        return sql_formula_pairs(f)


_SQL_TOKS = _SqlToks()


def _fold_sum(arr: Column, fn) -> Column:
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + fn(x))


def total_atoms(formula: Column | str) -> Column:
    return _fold_sum(_tok_counts(formula), lambda s: s["cnt"])


SQL_TOTAL_ATOMS = (
    "list_aggregate(list_transform("
    + sql_formula_pairs("{f}")
    + ", s -> s.cnt), 'sum')"
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


def tmetal_fraction(formula: Column | str, toks: Column | None = None) -> Column:
    """TMetalFraction featurizer (reference ml_prediction.py:107):
    fraction of atoms that are transition metals.

    ``toks``: pre-staged _tok_counts column — referencing a shared
    projection keeps the tokenizer subtree out of this expression
    (plan-compile tax; see el_comp_descriptors). Fold order and
    arithmetic are unchanged either way, so values are bit-identical."""
    toks = _tok_counts(formula) if toks is None else toks
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
    return _prop_map_expr(PAULING_EN)


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


def band_center(formula: Column | str, toks: Column | None = None) -> Column:
    """BandCenter featurizer (reference ml_prediction.py:112): the
    count-weighted geometric mean of electronegativities,
    exp(Σ c·ln(EN) / Σ c). ``toks``: see tmetal_fraction."""
    toks = _tok_counts(formula) if toks is None else toks
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


# Standard atomic weights (amu; public IUPAC values) for the corpus's
# elements — backs DensityFeatures (§2.9, reference ml_prediction.py:184).
ATOMIC_MASS = {
    "H": 1.008, "Li": 6.94, "Be": 9.012, "B": 10.81, "C": 12.011,
    "N": 14.007, "O": 15.999, "F": 18.998, "Na": 22.99, "Mg": 24.305,
    "Al": 26.982, "Si": 28.085, "P": 30.974, "S": 32.06, "Cl": 35.45,
    "K": 39.098, "Ca": 40.078, "Sc": 44.956, "Ti": 47.867, "V": 50.942,
    "Cr": 51.996, "Mn": 54.938, "Fe": 55.845, "Co": 58.933, "Ni": 58.693,
    "Cu": 63.546, "Zn": 65.38, "Ga": 69.723, "Ge": 72.63, "As": 74.922,
    "Se": 78.971, "Br": 79.904, "Rb": 85.468, "Sr": 87.62, "Y": 88.906,
    "Zr": 91.224, "Nb": 92.906, "Mo": 95.95, "Tc": 98.0, "Ru": 101.07,
    "Rh": 102.906, "Pd": 106.42, "Ag": 107.868, "Cd": 112.414,
    "In": 114.818, "Sn": 118.71, "Sb": 121.76, "Te": 127.6, "I": 126.904,
    "Cs": 132.905, "Ba": 137.327, "La": 138.905, "Ce": 140.116,
    "Pr": 140.908, "Nd": 144.242, "Sm": 150.36, "Eu": 151.964,
    "Gd": 157.25, "Tb": 158.925, "Dy": 162.5, "Ho": 164.93,
    "Er": 167.259, "Tm": 168.934, "Yb": 173.045, "Lu": 174.967,
    "Hf": 178.486, "Ta": 180.948, "W": 183.84, "Re": 186.207,
    "Os": 190.23, "Ir": 192.217, "Pt": 195.084, "Au": 196.967,
    "Hg": 200.592, "Tl": 204.38, "Pb": 207.2, "Bi": 208.98,
    "Th": 232.038, "U": 238.029,
}

AMU_PER_A3_TO_G_CM3 = 1.66053906660  # 1 amu/Å³ in g/cm³

# Covalent radii in Å (public tabulated values, Cordero et al. 2008,
# "Covalent radii revisited", Dalton Trans.; low-spin values for the
# spin-dependent 3d metals Mn/Fe/Co). Backs the packing-fraction
# featurizer — the AtomicPackingEfficiency-analog of SURVEY §2.9 that
# was data-blocked in round 1.
COVALENT_RADIUS = {
    "H": 0.31, "Li": 1.28, "Be": 0.96, "B": 0.84, "C": 0.76, "N": 0.71,
    "O": 0.66, "F": 0.57, "Na": 1.66, "Mg": 1.41, "Al": 1.21, "Si": 1.11,
    "P": 1.07, "S": 1.05, "Cl": 1.02, "K": 2.03, "Ca": 1.76, "Sc": 1.70,
    "Ti": 1.60, "V": 1.53, "Cr": 1.39, "Mn": 1.39, "Fe": 1.32, "Co": 1.26,
    "Ni": 1.24, "Cu": 1.32, "Zn": 1.22, "Ga": 1.22, "Ge": 1.20, "As": 1.19,
    "Se": 1.20, "Br": 1.20, "Rb": 2.20, "Sr": 1.95, "Y": 1.90, "Zr": 1.75,
    "Nb": 1.64, "Mo": 1.54, "Tc": 1.47, "Ru": 1.46, "Rh": 1.42, "Pd": 1.39,
    "Ag": 1.45, "Cd": 1.44, "In": 1.42, "Sn": 1.39, "Sb": 1.39, "Te": 1.38,
    "I": 1.39, "Cs": 2.44, "Ba": 2.15, "La": 2.07, "Ce": 2.04, "Pr": 2.03,
    "Nd": 2.01, "Sm": 1.98, "Eu": 1.98, "Gd": 1.96, "Tb": 1.94, "Dy": 1.92,
    "Ho": 1.92, "Er": 1.89, "Tm": 1.90, "Yb": 1.87, "Lu": 1.87, "Hf": 1.75,
    "Ta": 1.70, "W": 1.62, "Re": 1.51, "Os": 1.44, "Ir": 1.41, "Pt": 1.36,
    "Au": 1.36, "Hg": 1.32, "Tl": 1.45, "Pb": 1.46, "Bi": 1.48, "Th": 2.06,
    "U": 1.96,
}


def radius_map_expr() -> Column:
    kv = [
        x
        for el, r in sorted(COVALENT_RADIUS.items())
        for x in (F.lit(el), F.lit(r))
    ]
    return F.create_map(*kv)


def sql_radius_case(var: str) -> str:
    whens = " ".join(
        f"WHEN '{el}' THEN {r}" for el, r in sorted(COVALENT_RADIUS.items())
    )
    return f"CAST((CASE {var} {whens} ELSE NULL END) AS DOUBLE)"


def mass_map_expr() -> Column:
    kv = [x for el, m in sorted(ATOMIC_MASS.items()) for x in (F.lit(el), F.lit(m))]
    return F.create_map(*kv)


def sql_mass_case(var: str) -> str:
    whens = " ".join(
        f"WHEN '{el}' THEN {m}" for el, m in sorted(ATOMIC_MASS.items())
    )
    return f"CAST((CASE {var} {whens} ELSE NULL END) AS DOUBLE)"


def en_diff_to_oxygen(formula: Column | str) -> Column:
    """ElectronegativityDiff-style feature (reference ml_prediction.py:79,
    oxidation-state-aware in matminer; here the anion is O by
    construction — the corpus is oxides, README.md:50): count-weighted
    mean EN difference between O and each cation."""
    toks = _tok_counts(formula)
    en_map = _en_map_expr()
    en_o = F.lit(PAULING_EN["O"])
    cation_cnt = _fold_sum(
        toks, lambda s: F.when(s["el"] != "O", s["cnt"]).otherwise(0.0)
    )
    diff_sum = _fold_sum(
        toks,
        lambda s: F.when(s["el"] != "O", (en_o - en_map[s["el"]]) * s["cnt"]).otherwise(0.0),
    )
    return diff_sum / cation_cnt


def sql_en_diff_to_oxygen(f: str) -> str:
    toks = _SQL_TOKS.format(f=f)
    case = _sql_en_case()
    en_o = PAULING_EN["O"]
    cation = (
        f"list_aggregate(list_transform({toks}, "
        f"s -> CASE WHEN s.el <> 'O' THEN s.cnt ELSE 0.0 END), 'sum')"
    )
    diff = (
        f"list_aggregate(list_transform({toks}, "
        f"s -> CASE WHEN s.el <> 'O' THEN ({en_o} - {case}) * s.cnt ELSE 0.0 END), 'sum')"
    )
    return f"({diff}) / ({cation})"


def avg_ionic_character(formula: Column | str, toks: Column | None = None) -> Column:
    """IonProperty featurizer (reference ml_prediction.py:78): Pauling's
    average ionic character Σᵢⱼ xᵢxⱼ·(1 − exp(−ΔEN²/4)) over element
    pairs (i<j), normalized by Σᵢⱼ xᵢxⱼ — a nested fold over the token
    list, still a pure expression. ``toks``: see tmetal_fraction — the
    nested fold otherwise embeds the tokenizer subtree O(n²) times."""
    toks = _tok_counts(formula) if toks is None else toks
    en_map = _en_map_expr()
    tot = _fold_sum(toks, lambda s: s["cnt"])

    def pair_terms(outer):
        return _fold_sum(
            toks,
            lambda inner: F.when(
                inner["el"] != outer["el"],
                (outer["cnt"] / tot)
                * (inner["cnt"] / tot)
                * (1 - F.exp(-F.pow(en_map[outer["el"]] - en_map[inner["el"]], 2) / 4)),
            ).otherwise(0.0),
        )

    def pair_weights(outer):
        return _fold_sum(
            toks,
            lambda inner: F.when(
                inner["el"] != outer["el"], (outer["cnt"] / tot) * (inner["cnt"] / tot)
            ).otherwise(0.0),
        )

    num = _fold_sum(toks, pair_terms)
    den = _fold_sum(toks, pair_weights)
    return F.when(den > 0, num / den).otherwise(F.lit(0.0))


def sql_avg_ionic_character(f: str) -> str:
    toks = _SQL_TOKS.format(f=f)
    tot = f"list_aggregate(list_transform({toks}, s -> s.cnt), 'sum')"
    case_o = _sql_en_case().replace("s.el", "o.el")
    case_i = _sql_en_case().replace("s.el", "i.el")
    num = (
        f"list_aggregate(list_transform({toks}, o -> "
        f"list_aggregate(list_transform({toks}, i -> "
        f"CASE WHEN i.el <> o.el THEN (o.cnt / ({tot})) * (i.cnt / ({tot})) "
        f"* (1 - exp(-pow({case_o} - {case_i}, 2) / 4)) ELSE 0.0 END), 'sum')), 'sum')"
    )
    den = (
        f"list_aggregate(list_transform({toks}, o -> "
        f"list_aggregate(list_transform({toks}, i -> "
        f"CASE WHEN i.el <> o.el THEN (o.cnt / ({tot})) * (i.cnt / ({tot})) ELSE 0.0 END), 'sum')), 'sum')"
    )
    return f"(CASE WHEN ({den}) > 0 THEN ({num}) / ({den}) ELSE 0.0 END)"


# Periodic-table position facts (exact, public) for the corpus's
# elements — backs the full ElementProperty stats (reference
# ml_prediction.py:83-92: "mean row", "std_dev row", "mean group",
# "mean block", "std_dev block", mass/radius stats). Block is encoded
# s=0, p=1, d=2, f=3 so statistics are numeric.
PERIOD = {
    "Li": 2, "Be": 2, "B": 2, "O": 2, "Na": 3, "Mg": 3, "Al": 3,
    "Si": 3, "K": 4, "Ca": 4, "Sc": 4, "Ti": 4, "V": 4, "Cr": 4,
    "Mn": 4, "Co": 4, "Ni": 4, "Cu": 4, "Zn": 4, "Ga": 4, "Ge": 4,
    "As": 4, "Rb": 5, "Sr": 5, "Y": 5, "Zr": 5, "Nb": 5, "Mo": 5,
    "Tc": 5, "Rh": 5, "Pd": 5, "Ag": 5, "Cd": 5, "In": 5, "Sn": 5,
    "Sb": 5, "Cs": 6, "Ba": 6, "La": 6, "Hf": 6, "Ta": 6, "W": 6,
    "Re": 6, "Os": 6, "Pt": 6, "Au": 6, "Hg": 6, "Tl": 6, "Pb": 6,
    "Bi": 6, "Th": 7,
}

GROUP = {
    "Li": 1, "Be": 2, "B": 13, "O": 16, "Na": 1, "Mg": 2, "Al": 13,
    "Si": 14, "K": 1, "Ca": 2, "Sc": 3, "Ti": 4, "V": 5, "Cr": 6,
    "Mn": 7, "Co": 9, "Ni": 10, "Cu": 11, "Zn": 12, "Ga": 13,
    "Ge": 14, "As": 15, "Rb": 1, "Sr": 2, "Y": 3, "Zr": 4, "Nb": 5,
    "Mo": 6, "Tc": 7, "Rh": 9, "Pd": 10, "Ag": 11, "Cd": 12,
    "In": 13, "Sn": 14, "Sb": 15, "Cs": 1, "Ba": 2, "La": 3,
    "Hf": 4, "Ta": 5, "W": 6, "Re": 7, "Os": 8, "Pt": 10, "Au": 11,
    "Hg": 12, "Tl": 13, "Pb": 14, "Bi": 15, "Th": 3,
}

BLOCK = {  # s=0, p=1, d=2, f=3
    "Li": 0, "Be": 0, "B": 1, "O": 1, "Na": 0, "Mg": 0, "Al": 1,
    "Si": 1, "K": 0, "Ca": 0, "Sc": 2, "Ti": 2, "V": 2, "Cr": 2,
    "Mn": 2, "Co": 2, "Ni": 2, "Cu": 2, "Zn": 2, "Ga": 1, "Ge": 1,
    "As": 1, "Rb": 0, "Sr": 0, "Y": 2, "Zr": 2, "Nb": 2, "Mo": 2,
    "Tc": 2, "Rh": 2, "Pd": 2, "Ag": 2, "Cd": 2, "In": 1, "Sn": 1,
    "Sb": 1, "Cs": 0, "Ba": 0, "La": 2, "Hf": 2, "Ta": 2, "W": 2,
    "Re": 2, "Os": 2, "Pt": 2, "Au": 2, "Hg": 2, "Tl": 1, "Pb": 1,
    "Bi": 1, "Th": 3,
}


def _prop_map_expr(table: dict[str, float]) -> Column:
    # One F.expr string instead of ~160 F.lit py4j round trips per map
    # (the r7 plan-compile/py4j tax). repr() round-trips doubles
    # exactly and the D suffix forces DoubleLiteral, so the map holds
    # bit-identical values to the F.lit form.
    kv = ", ".join(
        f"'{el}', {float(v)!r}D" for el, v in sorted(table.items())
    )
    return F.expr(f"map({kv})")


def _sql_prop_case(table: dict[str, float]) -> str:
    whens = " ".join(f"WHEN '{el}' THEN {float(v)}" for el, v in sorted(table.items()))
    return f"CAST((CASE s.el {whens} ELSE NULL END) AS DOUBLE)"


def elemental_stats(formula: Column | str, table: dict[str, float]) -> dict[str, Column]:
    """Count-weighted mean / population std / min / max / range of an
    elemental property over a composition — the generalized
    ElementProperty reduction (matminer PropertyStats with fraction
    weights). Same literal-map + fold shape as the EN stats; std is
    sqrt(E[x²] − E[x]²) with atomic-fraction weights."""
    toks = _tok_counts(formula)
    pm = _prop_map_expr(table)
    tot = _fold_sum(toks, lambda s: s["cnt"])
    wsum = _fold_sum(toks, lambda s: pm[s["el"]] * s["cnt"])
    wsq = _fold_sum(toks, lambda s: pm[s["el"]] * pm[s["el"]] * s["cnt"])
    vals = F.transform(toks, lambda s: pm[s["el"]])
    mean = wsum / tot
    var = wsq / tot - mean * mean
    return {
        "mean": mean,
        "std": F.sqrt(F.greatest(var, F.lit(0.0))),
        "min": F.array_min(vals),
        "max": F.array_max(vals),
        "range": F.array_max(vals) - F.array_min(vals),
    }


def sql_elemental_stats(f: str, table: dict[str, float]) -> dict[str, str]:
    toks = _SQL_TOKS.format(f=f)
    case = _sql_prop_case(table)
    tot = f"list_aggregate(list_transform({toks}, s -> s.cnt), 'sum')"
    wsum = f"list_aggregate(list_transform({toks}, s -> {case} * s.cnt), 'sum')"
    wsq = f"list_aggregate(list_transform({toks}, s -> {case} * {case} * s.cnt), 'sum')"
    vals = f"list_transform({toks}, s -> {case})"
    mean = f"(({wsum}) / ({tot}))"
    var = f"(({wsq}) / ({tot}) - {mean} * {mean})"
    return {
        "mean": mean,
        "std": f"sqrt(greatest({var}, 0.0))",
        "min": f"list_min({vals})",
        "max": f"list_max({vals})",
        "range": f"list_max({vals}) - list_min({vals})",
    }


# ---------------------------------------------------------------------------
# matminer-exact stat helpers (reference-parity descriptor tier, ml6)
# ---------------------------------------------------------------------------


def _agg_tok_counts(formula: Column | str, toks: Column | None = None) -> Column:
    """Per-ELEMENT aggregated (el, cnt) pairs — matminer's
    ``comp.element_composition.items()`` view. _tok_counts is
    expansion-ordered and may repeat an element (paren groups, e.g.
    'Ba(CO3)2' style formulas); stats that depend on Σcnt² per element
    (the unbiased weighted std) need the aggregated view.

    Element order is SORTED in both engines: DuckDB's list_distinct
    does not preserve first-occurrence order, and a different fold
    order shifts double sums by an ulp — enough to flip a 6-dp
    rounding boundary and hash-mismatch the gate.

    ``toks``: pre-staged _tok_counts column (see tmetal_fraction)."""
    toks = _tok_counts(formula) if toks is None else toks
    els = F.array_sort(F.array_distinct(F.transform(toks, lambda s: s["el"])))
    return F.transform(
        els,
        lambda e: F.struct(
            e.alias("el"),
            F.aggregate(
                F.filter(toks, lambda s: s["el"] == e),
                F.lit(0.0),
                lambda acc, s: acc + s["cnt"],
            ).alias("cnt"),
        ),
    )


def sql_agg_tok_counts(f: str) -> str:
    toks = _SQL_TOKS.format(f=f)
    return (
        f"list_transform(list_sort(list_distinct(list_transform({toks}, s -> s.el))), "
        f"e -> struct_pack(el := e, cnt := list_aggregate("
        f"list_transform(list_filter({toks}, s -> s.el = e), s -> s.cnt), 'sum')))"
    )


def _unbiased_weighted_std(agg: Column, value_of) -> Column:
    """matminer PropertyStats.std_dev with weights (featurizers/utils/
    stats.py, public): beta = n/(n² − Σcᵢ²); std = √(beta·Σcᵢ(xᵢ−μ)²).
    Null for single-element compositions (beta denominator 0), exactly
    like matminer's divide-by-zero → nan."""
    n = _fold_sum(agg, lambda s: s["cnt"])
    sumsq = _fold_sum(agg, lambda s: s["cnt"] * s["cnt"])
    mean = _fold_sum(agg, lambda s: value_of(s) * s["cnt"]) / n
    dev = F.aggregate(
        agg,
        F.lit(0.0),
        lambda acc, s: acc + (value_of(s) - mean) * (value_of(s) - mean) * s["cnt"],
    )
    beta = n / F.nullif(n * n - sumsq, F.lit(0.0))
    return F.sqrt(F.greatest(beta * dev, F.lit(0.0)))


def _sql_unbiased_weighted_std(agg: str, value_sql: str) -> str:
    """DuckDB twin of _unbiased_weighted_std; value_sql is an expression
    over lambda var ``s`` (e.g. a property CASE on s.el)."""
    n = f"list_aggregate(list_transform({agg}, s -> s.cnt), 'sum')"
    sumsq = f"list_aggregate(list_transform({agg}, s -> s.cnt * s.cnt), 'sum')"
    mean = (
        f"(list_aggregate(list_transform({agg}, s -> ({value_sql}) * s.cnt), 'sum')"
        f" / ({n}))"
    )
    dev = (
        f"list_aggregate(list_transform({agg}, "
        f"s -> (({value_sql}) - {mean}) * (({value_sql}) - {mean}) * s.cnt), 'sum')"
    )
    beta = f"(({n}) / NULLIF(({n}) * ({n}) - ({sumsq}), 0.0))"
    return f"sqrt(greatest(({beta}) * ({dev}), 0.0))"


def matminer_stats(
    formula: Column | str, table: dict[str, float], agg: Column | None = None
) -> dict[str, Column]:
    """ElementProperty reduction with matminer's EXACT stat semantics
    (ml_prediction.py:76 ElementProperty.from_preset('matminer')):
    count-weighted mean, unbiased weighted std_dev, unweighted
    min/max/range — computed over per-element aggregated counts.

    Pass ``agg`` (a pre-computed _agg_tok_counts column) when deriving
    MANY stats from one formula: referencing a shared column keeps
    Catalyst from duplicating the tokenizer subtree per stat (ml6's 28
    consumers would otherwise cost ~17 s of plan compile)."""
    agg = _agg_tok_counts(formula) if agg is None else agg
    pm = _prop_map_expr(table)
    vals = F.transform(agg, lambda s: pm[s["el"]])
    n = _fold_sum(agg, lambda s: s["cnt"])
    mean = _fold_sum(agg, lambda s: pm[s["el"]] * s["cnt"]) / n
    return {
        "mean": mean,
        "std": _unbiased_weighted_std(agg, lambda s: pm[s["el"]]),
        "min": F.array_min(vals),
        "max": F.array_max(vals),
        "range": F.array_max(vals) - F.array_min(vals),
    }


def enrich_agg(agg: Column, tables: dict[str, dict[str, float]]) -> Column:
    """Attach per-element property values to a pre-staged _agg column:
    ``array<struct<el,cnt,<one field per table>>>``. Each literal
    element→value map appears ONCE in the plan (inside this transform);
    downstream stat folds reference the struct field instead of
    re-embedding the ~80-entry map per occurrence — the ml6 family's
    plan-compile tax fix (r7 verdict ask #4). Lookup semantics are
    identical to ``pm[s.el]`` (element missing from a table → NULL), so
    downstream arithmetic is bit-identical."""
    pms = {fld: _prop_map_expr(tbl) for fld, tbl in tables.items()}
    return F.transform(
        agg,
        lambda s: F.struct(
            s["el"].alias("el"),
            s["cnt"].alias("cnt"),
            *[pms[fld][s["el"]].alias(fld) for fld in tables],
        ),
    )


def matminer_stats_field(enr: Column, field: str) -> dict[str, Column]:
    """matminer_stats over an enrich_agg() column: the same folds in the
    same sorted-element order with ``value_of(s) = s[field]`` — the
    adds/multiplies see identical doubles in identical order, so values
    are bit-identical to the literal-map form (hash-gate safe)."""
    get = lambda s: s[field]  # noqa: E731
    vals = F.transform(enr, get)
    n = _fold_sum(enr, lambda s: s["cnt"])
    mean = _fold_sum(enr, lambda s: s[field] * s["cnt"]) / n
    return {
        "mean": mean,
        "std": _unbiased_weighted_std(enr, get),
        "min": F.array_min(vals),
        "max": F.array_max(vals),
        "range": F.array_max(vals) - F.array_min(vals),
    }


# ---------------------------------------------------------------------------
# Spark-SQL-dialect string kernels (plan-compile/py4j tax fix, r7
# verdict ask #4). Each returns a SQL string over a pre-staged column
# name ("_toks" / "_enr"); F.expr() parses it in ONE py4j round trip
# where the Column-DSL form costs ~15 ms per higher-order lambda. The
# strings produce the SAME Catalyst operators (aggregate/transform/
# CaseWhen/GetMapValue) as the DSL builders above, so values are
# bit-identical — proven by the unchanged DuckDB oracle hash gate.
# ---------------------------------------------------------------------------


def _sp_fold_sum(arr: str, term: str) -> str:
    return f"aggregate({arr}, 0.0D, (acc, s) -> acc + ({term}))"


def sp_prop_map(table: dict[str, float]) -> str:
    kv = ", ".join(f"'{el}', {float(v)!r}D" for el, v in sorted(table.items()))
    return f"map({kv})"


def sp_unbiased_weighted_std(agg: str, val: str) -> str:
    """Spark-SQL twin of _unbiased_weighted_std; ``val`` is an
    expression over lambda var ``s``."""
    n = _sp_fold_sum(agg, "s.cnt")
    sumsq = _sp_fold_sum(agg, "s.cnt * s.cnt")
    mean = f"({_sp_fold_sum(agg, f'({val}) * s.cnt')} / ({n}))"
    dev = (
        f"aggregate({agg}, 0.0D, (acc, s) -> "
        f"acc + (({val}) - {mean}) * (({val}) - {mean}) * s.cnt)"
    )
    beta = f"(({n}) / nullif(({n}) * ({n}) - ({sumsq}), 0.0D))"
    return f"sqrt(greatest(({beta}) * ({dev}), 0.0D))"


def sp_matminer_stats(agg: str, val: str) -> dict[str, str]:
    """Spark-SQL twin of matminer_stats_field over an enriched agg
    column; ``val`` is an expression over lambda var ``s`` (usually
    ``s.<field>``)."""
    vals = f"transform({agg}, s -> {val})"
    n = _sp_fold_sum(agg, "s.cnt")
    mean = f"({_sp_fold_sum(agg, f'({val}) * s.cnt')} / ({n}))"
    return {
        "mean": mean,
        "std": sp_unbiased_weighted_std(agg, val),
        "min": f"array_min({vals})",
        "max": f"array_max({vals})",
        "range": f"(array_max({vals}) - array_min({vals}))",
    }


def sp_en_diff_stats(agg: str, en_field: str) -> dict[str, str]:
    """Spark-SQL twin of en_diff_stats over an enriched agg column."""
    en_o = float(PAULING_EN["O"])
    cat = f"filter({agg}, s -> s.el <> 'O')"
    val = f"({en_o!r}D - s.{en_field})"
    vals = f"transform({cat}, s -> {val})"
    n = _sp_fold_sum(cat, "s.cnt")
    mean = f"({_sp_fold_sum(cat, f'({val}) * s.cnt')} / nullif({n}, 0.0D))"
    return {
        "max": f"array_max({vals})",
        "range": f"(array_max({vals}) - array_min({vals}))",
        "min": f"array_min({vals})",
        "mean": mean,
        "std": sp_unbiased_weighted_std(cat, val),
    }


def sp_oxi_state_std(agg: str) -> str:
    """Spark-SQL twin of oxi_state_std over a (possibly enriched) agg
    column."""
    n_o = _sp_fold_sum(agg, "CASE WHEN s.el = 'O' THEN s.cnt ELSE 0.0D END")
    n_cat = _sp_fold_sum(agg, "CASE WHEN s.el <> 'O' THEN s.cnt ELSE 0.0D END")
    q = f"(2.0D * ({n_o}) / nullif({n_cat}, 0.0D))"
    state = f"(CASE WHEN s.el = 'O' THEN -2.0D ELSE {q} END)"
    return sp_unbiased_weighted_std(agg, state)


def sp_tmetal_fraction(toks: str) -> str:
    """Spark-SQL twin of tmetal_fraction over a pre-staged toks column."""
    tms = ", ".join(repr(x) for x in TRANSITION_METALS)
    tot = _sp_fold_sum(toks, "s.cnt")
    tm = _sp_fold_sum(toks, f"CASE WHEN s.el IN ({tms}) THEN s.cnt ELSE 0.0D END")
    return f"(({tm}) / ({tot}))"


def sp_band_center(toks: str) -> str:
    """Spark-SQL twin of band_center over a pre-staged toks column."""
    en = f"{sp_prop_map(PAULING_EN)}[s.el]"
    tot = _sp_fold_sum(toks, "s.cnt")
    lnsum = _sp_fold_sum(toks, f"s.cnt * ln({en})")
    return f"exp(({lnsum}) / ({tot}))"


def sp_avg_ionic_character(toks: str) -> str:
    """Spark-SQL twin of avg_ionic_character over a pre-staged toks
    column (the nested pair fold)."""
    en = sp_prop_map(PAULING_EN)
    tot = _sp_fold_sum(toks, "s.cnt")
    term = (
        f"CASE WHEN i.el <> o.el THEN (o.cnt / ({tot})) * (i.cnt / ({tot})) "
        f"* (1 - exp(-pow({en}[o.el] - {en}[i.el], 2) / 4)) ELSE 0.0D END"
    )
    inner = f"aggregate({toks}, 0.0D, (acc2, i) -> acc2 + ({term}))"
    num = f"aggregate({toks}, 0.0D, (acc, o) -> acc + ({inner}))"
    wterm = (
        f"CASE WHEN i.el <> o.el THEN (o.cnt / ({tot})) * (i.cnt / ({tot})) "
        f"ELSE 0.0D END"
    )
    winner = f"aggregate({toks}, 0.0D, (acc2, i) -> acc2 + ({wterm}))"
    den = f"aggregate({toks}, 0.0D, (acc, o) -> acc + ({winner}))"
    return f"(CASE WHEN ({den}) > 0 THEN ({num}) / ({den}) ELSE 0.0D END)"


def sp_stoichiometry_pnorm(toks: str, p: int) -> str:
    """Spark-SQL twin of stoichiometry_pnorm over a pre-staged toks
    column."""
    tot = _sp_fold_sum(toks, "s.cnt")
    if p == 0:
        return f"CAST(size({toks}) AS DOUBLE)"
    powsum = _sp_fold_sum(toks, f"pow(s.cnt / ({tot}), {float(p)!r}D)")
    return f"pow({powsum}, {1.0 / p!r}D)"


def sp_mean_radius(agg: str, field: str = "p_radius") -> str:
    """Spark-SQL twin of mean_radius over an enriched agg column whose
    ``field`` carries the Cordero radius."""
    tot = _sp_fold_sum(agg, "s.cnt")
    return f"({_sp_fold_sum(agg, f's.{field} * s.cnt')} / ({tot}))"


def _sp_best_ideal(ratio: str) -> str:
    """Spark-SQL twin of _best_ideal (same nested-CASE argmin chain,
    ascending CN, strictly-less wins)."""
    items = sorted(CRITICAL_RATIOS.items())
    best_ideal = f"{items[0][1]!r}D"
    best_diff = f"abs(({ratio}) - {items[0][1]!r}D)"
    for _cn, ideal in items[1:]:
        d = f"abs(({ratio}) - {ideal!r}D)"
        best_ideal = (
            f"(CASE WHEN {d} < {best_diff} THEN {ideal!r}D ELSE {best_ideal} END)"
        )
        best_diff = f"(CASE WHEN {d} < {best_diff} THEN {d} ELSE {best_diff} END)"
    return best_ideal


def sp_ape_stats(agg: str, rbar: str, field: str = "p_radius") -> dict[str, str]:
    """Spark-SQL twin of ape_stats over an enriched agg column; pass a
    STAGED rbar column name."""
    ratio = f"(s.{field} / {rbar})"
    ape = f"(({ratio}) / {_sp_best_ideal(ratio)})"
    tot = _sp_fold_sum(agg, "s.cnt")
    mean = f"({_sp_fold_sum(agg, f'({ape}) * s.cnt')} / ({tot}))"
    mean_abs = f"({_sp_fold_sum(agg, f'abs(1.0D - ({ape})) * s.cnt')} / ({tot}))"
    return {"mean": mean, "mean_abs": mean_abs}


def sp_oxi_state_range(agg: str) -> str:
    """Spark-SQL twin of oxi_state_range over a (possibly enriched)
    agg column."""
    n_o = _sp_fold_sum(agg, "CASE WHEN s.el = 'O' THEN s.cnt ELSE 0.0D END")
    n_cat = _sp_fold_sum(agg, "CASE WHEN s.el <> 'O' THEN s.cnt ELSE 0.0D END")
    q = f"(2.0D * ({n_o}) / nullif({n_cat}, 0.0D))"
    vals = f"transform({agg}, s -> (CASE WHEN s.el = 'O' THEN -2.0D ELSE {q} END))"
    return f"(array_max({vals}) - array_min({vals}))"


def sql_matminer_stats(
    f: str, table: dict[str, float], agg: str | None = None
) -> dict[str, str]:
    agg = sql_agg_tok_counts(f) if agg is None else agg
    case = _sql_prop_case(table)
    vals = f"list_transform({agg}, s -> {case})"
    n = f"list_aggregate(list_transform({agg}, s -> s.cnt), 'sum')"
    mean = (
        f"(list_aggregate(list_transform({agg}, s -> {case} * s.cnt), 'sum') / ({n}))"
    )
    return {
        "mean": mean,
        "std": _sql_unbiased_weighted_std(agg, case),
        "min": f"list_min({vals})",
        "max": f"list_max({vals})",
        "range": f"(list_max({vals}) - list_min({vals}))",
    }


def en_diff_stats(
    formula: Column | str, agg: Column | None = None, en_field: str | None = None
) -> dict[str, Column]:
    """ElectronegativityDiff analog for the oxide corpus
    (ml_prediction.py:78 — anion fixed at O, the m23 convention,
    extended to the full stat set the descriptor consumes): per-cation
    ΔEN = EN(O) − EN(cation); unweighted max/range, count-weighted
    mean, unbiased weighted std over cations.

    ``en_field``: when ``agg`` is an enrich_agg() column carrying the
    Pauling EN as a struct field, read it from there instead of
    re-embedding the literal EN map (bit-identical; see enrich_agg)."""
    en_o = F.lit(PAULING_EN["O"])
    pm = None if en_field is not None else _en_map_expr()
    base = _agg_tok_counts(formula) if agg is None else agg
    cat = F.filter(base, lambda s: s["el"] != "O")
    if en_field is not None:
        diff = lambda s: en_o - s[en_field]  # noqa: E731
    else:
        diff = lambda s: en_o - pm[s["el"]]  # noqa: E731
    vals = F.transform(cat, diff)
    n = _fold_sum(cat, lambda s: s["cnt"])
    mean = _fold_sum(cat, lambda s: diff(s) * s["cnt"]) / F.nullif(n, F.lit(0.0))
    return {
        "max": F.array_max(vals),
        "range": F.array_max(vals) - F.array_min(vals),
        "min": F.array_min(vals),
        "mean": mean,
        "std": _unbiased_weighted_std(cat, diff),
    }


def sql_en_diff_stats(f: str, agg: str | None = None) -> dict[str, str]:
    en_o = PAULING_EN["O"]
    base = sql_agg_tok_counts(f) if agg is None else agg
    cat = f"list_filter({base}, s -> s.el <> 'O')"
    case = f"({en_o} - {_sql_en_case()})"
    vals = f"list_transform({cat}, s -> {case})"
    n = f"list_aggregate(list_transform({cat}, s -> s.cnt), 'sum')"
    mean = (
        f"(list_aggregate(list_transform({cat}, s -> {case} * s.cnt), 'sum')"
        f" / NULLIF({n}, 0.0))"
    )
    return {
        "max": f"list_max({vals})",
        "range": f"(list_max({vals}) - list_min({vals}))",
        "min": f"list_min({vals})",
        "mean": mean,
        "std": _sql_unbiased_weighted_std(cat, case),
    }


def oxi_state_std(formula: Column | str, agg: Column | None = None) -> Column:
    """OxidationStates std_dev analog (ml_prediction.py:80, the m25
    charge-balance convention): O at −2, every cation at the uniform
    balance state q = 2·n_O/n_cat; unbiased weighted std over the
    per-element state list. (The weighted mean is 0 by construction —
    charge balance — so std reduces to √(beta·Σcᵢqᵢ²).)"""
    agg = _agg_tok_counts(formula) if agg is None else agg
    n_o = _fold_sum(
        agg, lambda s: F.when(s["el"] == "O", s["cnt"]).otherwise(F.lit(0.0))
    )
    n_cat = _fold_sum(
        agg, lambda s: F.when(s["el"] != "O", s["cnt"]).otherwise(F.lit(0.0))
    )
    q = 2.0 * n_o / F.nullif(n_cat, F.lit(0.0))
    state = lambda s: F.when(s["el"] == "O", F.lit(-2.0)).otherwise(q)  # noqa: E731
    return _unbiased_weighted_std(agg, state)


def sql_oxi_state_std(f: str, agg: str | None = None) -> str:
    agg = sql_agg_tok_counts(f) if agg is None else agg
    n_o = (
        f"list_aggregate(list_transform({agg}, "
        f"s -> CASE WHEN s.el = 'O' THEN s.cnt ELSE 0.0 END), 'sum')"
    )
    n_cat = (
        f"list_aggregate(list_transform({agg}, "
        f"s -> CASE WHEN s.el <> 'O' THEN s.cnt ELSE 0.0 END), 'sum')"
    )
    q = f"(2.0 * ({n_o}) / NULLIF({n_cat}, 0.0))"
    state = f"(CASE WHEN s.el = 'O' THEN -2.0 ELSE {q} END)"
    return _sql_unbiased_weighted_std(agg, state)


# ---------------------------------------------------------------------------
# AtomicPackingEfficiency analog (reference ml_prediction.py:126, the
# ion_comp descriptor's APE slots) — ml8 reference-parity tier
# ---------------------------------------------------------------------------

import math as _math

#: Critical (ideal) center/shell radius ratios for efficient packing at
#: coordination number CN — CLOSED-FORM polyhedron geometry (the classic
#: Pauling critical ratios; public facts): triangle 2/√3−1, tetrahedron
#: √(3/2)−1, octahedron √2−1, cube √3−1, icosahedron 2·(circumradius/
#: edge)−1. The engine's documented analog of matminer's Miracle-table
#: APE: same ideal-ratio machinery, geometry-derived table.
CRITICAL_RATIOS: dict[int, float] = {
    3: 2.0 / _math.sqrt(3.0) - 1.0,
    4: _math.sqrt(1.5) - 1.0,
    6: _math.sqrt(2.0) - 1.0,
    8: _math.sqrt(3.0) - 1.0,
    12: 2.0 * 0.9510565162951535 - 1.0,
}

#: (center_el, shell_el, cn) triples where the Cordero radius ratio is
#: within 1% of the ideal ratio for cn — the "efficiently packed
#: clusters" the APE distance slots measure against. Deterministic
#: constant (sorted element loops), 233 triples at the current radius
#: table; shared verbatim by the Spark broadcast side and the DuckDB
#: VALUES twin so both engines see the identical cluster universe.
EFFICIENT_CLUSTERS: list[tuple[str, str, int]] = [
    (a, b, cn)
    for a in sorted(COVALENT_RADIUS)
    for b in sorted(COVALENT_RADIUS)
    if a != b
    for cn, ideal in sorted(CRITICAL_RATIOS.items())
    if abs(COVALENT_RADIUS[a] / COVALENT_RADIUS[b] / ideal - 1.0) < 0.01
]


def mean_radius(agg: Column) -> Column:
    """Count-weighted mean Cordero radius over the composition — the
    shell-radius proxy the per-element APE ratio divides by."""
    rm = radius_map_expr()
    tot = _fold_sum(agg, lambda s: s["cnt"])
    return _fold_sum(agg, lambda s: rm[s["el"]] * s["cnt"]) / tot


def sql_mean_radius(agg: str) -> str:
    case = sql_radius_case("s.el")
    tot = f"list_aggregate(list_transform({agg}, s -> s.cnt), 'sum')"
    return (
        f"(list_aggregate(list_transform({agg}, s -> {case} * s.cnt), 'sum')"
        f" / ({tot}))"
    )


def _best_ideal(ratio):
    """Nested-CASE argmin over CRITICAL_RATIOS (ascending CN,
    strictly-less wins) → the ideal ratio nearest ``ratio``. Identical
    chain built for both engines, so tie resolution is bit-identical."""
    items = sorted(CRITICAL_RATIOS.items())
    best_ideal = F.lit(items[0][1])
    best_diff = F.abs(ratio - items[0][1])
    for _cn, ideal in items[1:]:
        d = F.abs(ratio - ideal)
        best_ideal = F.when(d < best_diff, F.lit(ideal)).otherwise(best_ideal)
        best_diff = F.when(d < best_diff, d).otherwise(best_diff)
    return best_ideal


def _sql_best_ideal(ratio: str) -> str:
    items = sorted(CRITICAL_RATIOS.items())
    best_ideal = repr(items[0][1])
    best_diff = f"abs(({ratio}) - {items[0][1]!r})"
    for _cn, ideal in items[1:]:
        d = f"abs(({ratio}) - {ideal!r})"
        best_ideal = f"(CASE WHEN {d} < {best_diff} THEN {ideal!r} ELSE {best_ideal} END)"
        best_diff = f"(CASE WHEN {d} < {best_diff} THEN {d} ELSE {best_diff} END)"
    return best_ideal


def ape_stats(agg: Column, rbar: Column) -> dict[str, Column]:
    """Per-composition simultaneous-packing-efficiency analog: each
    element's ratio rᵢ/r̄ is matched to its nearest ideal critical
    ratio; APEᵢ = (rᵢ/r̄)/R*ᵢ. Returns the fraction-weighted mean APE
    and mean |1−APE| (reference slots 'mean simul. packing efficiency'
    and 'mean abs …', ml_prediction.py:158-159). Pass a STAGED rbar
    column (mean_radius) — inlining it per element would replicate the
    radius fold ~10× per when-branch."""
    rm = radius_map_expr()
    tot = _fold_sum(agg, lambda s: s["cnt"])

    def ape(s):
        ratio = rm[s["el"]] / rbar
        return ratio / _best_ideal(ratio)

    mean = _fold_sum(agg, lambda s: ape(s) * s["cnt"]) / tot
    mean_abs = _fold_sum(agg, lambda s: F.abs(F.lit(1.0) - ape(s)) * s["cnt"]) / tot
    return {"mean": mean, "mean_abs": mean_abs}


def sql_ape_stats(agg: str, rbar: str) -> dict[str, str]:
    case = sql_radius_case("s.el")
    ratio = f"(({case}) / ({rbar}))"
    ape = f"(({ratio}) / ({_sql_best_ideal(ratio)}))"
    tot = f"list_aggregate(list_transform({agg}, s -> s.cnt), 'sum')"
    mean = (
        f"(list_aggregate(list_transform({agg}, s -> ({ape}) * s.cnt), 'sum')"
        f" / ({tot}))"
    )
    mean_abs = (
        f"(list_aggregate(list_transform({agg}, "
        f"s -> abs(1.0 - ({ape})) * s.cnt), 'sum') / ({tot}))"
    )
    return {"mean": mean, "mean_abs": mean_abs}


def oxi_state_range(formula: Column | str, agg: Column | None = None) -> Column:
    """OxidationStates range analog (m25 charge-balance convention,
    extended for the ion_comp descriptor's 'range oxidation state'
    slot): states are −2 for O and the uniform balance state q for
    cations; range = max − min over the per-element state list."""
    agg = _agg_tok_counts(formula) if agg is None else agg
    n_o = _fold_sum(
        agg, lambda s: F.when(s["el"] == "O", s["cnt"]).otherwise(F.lit(0.0))
    )
    n_cat = _fold_sum(
        agg, lambda s: F.when(s["el"] != "O", s["cnt"]).otherwise(F.lit(0.0))
    )
    q = 2.0 * n_o / F.nullif(n_cat, F.lit(0.0))
    vals = F.transform(
        agg, lambda s: F.when(s["el"] == "O", F.lit(-2.0)).otherwise(q)
    )
    return F.array_max(vals) - F.array_min(vals)


def sql_oxi_state_range(f: str, agg: str | None = None) -> str:
    agg = sql_agg_tok_counts(f) if agg is None else agg
    n_o = (
        f"list_aggregate(list_transform({agg}, "
        f"s -> CASE WHEN s.el = 'O' THEN s.cnt ELSE 0.0 END), 'sum')"
    )
    n_cat = (
        f"list_aggregate(list_transform({agg}, "
        f"s -> CASE WHEN s.el <> 'O' THEN s.cnt ELSE 0.0 END), 'sum')"
    )
    q = f"(2.0 * ({n_o}) / NULLIF({n_cat}, 0.0))"
    vals = (
        f"list_transform({agg}, s -> CASE WHEN s.el = 'O' THEN -2.0 ELSE {q} END)"
    )
    return f"(list_max({vals}) - list_min({vals}))"


#: Covalent-sphere volume per element, (4/3)π r³ over the Cordero
#: radii — the engine's documented public analog for Magpie's
#: GSvolume_pa LocalPropertyDifference table (ml12's lpd_gsvol slots).
GS_VOLUME: dict[str, float] = {
    el: 4.0 / 3.0 * _math.pi * r * r * r for el, r in COVALENT_RADIUS.items()
}
