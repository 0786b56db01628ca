"""Valence-electron featurizer support (SURVEY.md §2.9 ValenceOrbital,
reference ml_prediction.py:77).

Valence s/p/d/f electron counts are COMPUTED from the Aufbau filling
order plus the textbook exception set — public periodic-table physics,
derived in code rather than hand-entered, so the table is auditable.
Valence shell definition matches the usual featurizer convention:
electrons outside the preceding noble-gas core (for d/f elements this
includes the open (n-1)d / (n-2)f subshells).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Z for the elements the corpus uses (subset of PAULING_EN's keys).
_Z = {
    "H": 1, "Li": 3, "Be": 4, "B": 5, "C": 6, "N": 7, "O": 8, "F": 9,
    "Na": 11, "Mg": 12, "Al": 13, "Si": 14, "P": 15, "S": 16, "Cl": 17,
    "K": 19, "Ca": 20, "Sc": 21, "Ti": 22, "V": 23, "Cr": 24, "Mn": 25,
    "Fe": 26, "Co": 27, "Ni": 28, "Cu": 29, "Zn": 30, "Ga": 31, "Ge": 32,
    "As": 33, "Se": 34, "Br": 35, "Rb": 37, "Sr": 38, "Y": 39, "Zr": 40,
    "Nb": 41, "Mo": 42, "Tc": 43, "Ru": 44, "Rh": 45, "Pd": 46, "Ag": 47,
    "Cd": 48, "In": 49, "Sn": 50, "Sb": 51, "Te": 52, "I": 53, "Cs": 55,
    "Ba": 56, "La": 57, "Ce": 58, "Pr": 59, "Nd": 60, "Sm": 62, "Eu": 63,
    "Gd": 64, "Tb": 65, "Dy": 66, "Ho": 67, "Er": 68, "Tm": 69, "Yb": 70,
    "Lu": 71, "Hf": 72, "Ta": 73, "W": 74, "Re": 75, "Os": 76, "Ir": 77,
    "Pt": 78, "Au": 79, "Hg": 80, "Tl": 81, "Pb": 82, "Bi": 83,
    "Th": 90, "U": 92,
}

# Aufbau order: (n, l) by n+l then n.
_AUFBAU = [
    (1, 0), (2, 0), (2, 1), (3, 0), (3, 1), (4, 0), (3, 2), (4, 1),
    (5, 0), (4, 2), (5, 1), (6, 0), (4, 3), (5, 2), (6, 1), (7, 0),
    (5, 3), (6, 2), (7, 1),
]
_CAP = {0: 2, 1: 6, 2: 10, 3: 14}
_NOBLE_Z = [2, 10, 18, 36, 54, 86]

# Textbook ground-state exceptions (moved electron: s→d / s→f etc.).
# {element: {(n,l): delta}} applied after Aufbau filling.
_EXCEPTIONS = {
    "Cr": {(4, 0): -1, (3, 2): +1}, "Cu": {(4, 0): -1, (3, 2): +1},
    "Nb": {(5, 0): -1, (4, 2): +1}, "Mo": {(5, 0): -1, (4, 2): +1},
    "Ru": {(5, 0): -1, (4, 2): +1}, "Rh": {(5, 0): -1, (4, 2): +1},
    "Pd": {(5, 0): -2, (4, 2): +2}, "Ag": {(5, 0): -1, (4, 2): +1},
    "Pt": {(6, 0): -1, (5, 2): +1}, "Au": {(6, 0): -1, (5, 2): +1},
    "La": {(4, 3): -1, (5, 2): +1}, "Ce": {(4, 3): -1, (5, 2): +1},
    "Gd": {(4, 3): -1, (5, 2): +1}, "Th": {(5, 3): -2, (6, 2): +2},
    "U": {(5, 3): -1, (6, 2): +1},
}


def electron_configuration(el: str) -> dict[tuple[int, int], int]:
    z = _Z[el]
    conf: dict[tuple[int, int], int] = {}
    left = z
    for n, l in _AUFBAU:
        if left <= 0:
            break
        take = min(_CAP[l], left)
        conf[(n, l)] = take
        left -= take
    for shell, delta in _EXCEPTIONS.get(el, {}).items():
        conf[shell] = conf.get(shell, 0) + delta
        if conf[shell] == 0:
            del conf[shell]
    return conf


def valence_spdf(el: str) -> tuple[int, int, int, int]:
    """Valence electrons per orbital type: everything beyond the
    largest noble-gas core that fits."""
    z = _Z[el]
    core = max((nz for nz in _NOBLE_Z if nz < z), default=0)
    conf = electron_configuration(el)
    # remove the core by re-deriving it with the same filler
    core_conf: dict[tuple[int, int], int] = {}
    left = core
    for n, l in _AUFBAU:
        if left <= 0:
            break
        take = min(_CAP[l], left)
        core_conf[(n, l)] = take
        left -= take
    out = [0, 0, 0, 0]
    for (n, l), cnt in conf.items():
        cnt -= core_conf.get((n, l), 0)
        if cnt > 0:
            out[l] += cnt
    return tuple(out)


VALENCE_TABLE = {el: valence_spdf(el) for el in _Z}


def _map_expr(idx: int) -> Column:
    from oxi_diel_db_spark.functions.composition import _prop_map_expr

    return _prop_map_expr({el: float(v[idx]) for el, v in VALENCE_TABLE.items()})


def sql_valence_case(var: str, idx: int) -> str:
    whens = " ".join(
        f"WHEN '{el}' THEN {float(v[idx])}" for el, v in sorted(VALENCE_TABLE.items())
    )
    return f"CAST((CASE {var} {whens} ELSE NULL END) AS DOUBLE)"


def valence_fractions(
    formula: Column | str, toks: "Column | None" = None
) -> dict[str, Column]:
    """ValenceOrbital featurizer: count-weighted average valence
    electrons per orbital type + the s/p/d/f fractions. ``toks``:
    pre-staged token column (see composition.tmetal_fraction) — keeps
    the tokenizer subtree out of these eight expressions."""
    from oxi_diel_db_spark.functions.composition import _fold_sum, _tok_counts

    toks = _tok_counts(formula) if toks is None else toks
    tot = _fold_sum(toks, lambda s: s["cnt"])
    avg = {}
    for idx, name in enumerate("spdf"):
        m = _map_expr(idx)
        avg[f"avg_{name}"] = _fold_sum(toks, lambda s, m=m: m[s["el"]] * s["cnt"]) / tot
    total_val = avg["avg_s"] + avg["avg_p"] + avg["avg_d"] + avg["avg_f"]
    out = dict(avg)
    for name in "spdf":
        out[f"frac_{name}"] = avg[f"avg_{name}"] / total_val
    return out


def sp_valence_fractions(toks: str) -> dict[str, str]:
    """Spark-SQL-dialect twin of valence_fractions over a pre-staged
    toks column (see composition's sp_* kernels — same Catalyst
    operators as the DSL form, one F.expr parse instead of dozens of
    py4j lambda round trips)."""
    from oxi_diel_db_spark.functions.composition import _sp_fold_sum, sp_prop_map

    tot = _sp_fold_sum(toks, "s.cnt")
    avg = {}
    for idx, name in enumerate("spdf"):
        m = sp_prop_map({el: float(v[idx]) for el, v in VALENCE_TABLE.items()})
        avg[f"avg_{name}"] = (
            f"({_sp_fold_sum(toks, f'{m}[s.el] * s.cnt')} / ({tot}))"
        )
    total = " + ".join(avg[f"avg_{n}"] for n in "spdf")
    out = dict(avg)
    for name in "spdf":
        out[f"frac_{name}"] = f"(({avg[f'avg_{name}']}) / ({total}))"
    return out


def sql_valence_fractions(f: str) -> dict[str, str]:
    from oxi_diel_db_spark.functions.composition import _SQL_TOKS

    toks = _SQL_TOKS.format(f=f)
    tot = f"list_aggregate(list_transform({toks}, s -> s.cnt), 'sum')"
    avg = {}
    for idx, name in enumerate("spdf"):
        case = sql_valence_case("s.el", idx)
        avg[f"avg_{name}"] = (
            f"(list_aggregate(list_transform({toks}, s -> {case} * s.cnt), 'sum') / ({tot}))"
        )
    total = " + ".join(avg[f"avg_{n}"] for n in "spdf")
    out = dict(avg)
    for name in "spdf":
        out[f"frac_{name}"] = f"({avg[f'avg_{name}']}) / ({total})"
    return out


# ---------------------------------------------------------------------------
# Derived per-element property tables for the LocalPropertyDifference
# reference-parity slots (ml10/ml12; reference ml_prediction.py
# 'ward-prb-2017' preset properties). All derived from the auditable
# aufbau VALENCE_TABLE above — public periodic-table physics, no
# hand-entered data. Unfilled counts follow the Magpie convention
# (capacity − electrons for each PARTIALLY/once-occupied valence
# subshell; an unoccupied subshell contributes 0); the GSmagmom slot is
# served by the documented Hund unpaired-electron analog (per-subshell
# unpaired count: n if n ≤ cap/2 else cap − n).
# ---------------------------------------------------------------------------

_SUBSHELL_CAP = (2, 6, 10, 14)


def _unfilled(counts: tuple[int, int, int, int], idx: int) -> int:
    n = counts[idx]
    return (_SUBSHELL_CAP[idx] - n) if n > 0 else 0


def _unpaired(counts: tuple[int, int, int, int]) -> int:
    total = 0
    for idx, n in enumerate(counts):
        half = _SUBSHELL_CAP[idx] // 2
        if n > 0:
            total += n if n <= half else _SUBSHELL_CAP[idx] - n
    return total


ATOMIC_NUMBER = {el: float(z) for el, z in _Z.items()}
N_VALENCE = {el: float(sum(v)) for el, v in VALENCE_TABLE.items()}
ND_VALENCE = {el: float(v[2]) for el, v in VALENCE_TABLE.items()}
NS_UNFILLED = {el: float(_unfilled(v, 0)) for el, v in VALENCE_TABLE.items()}
ND_UNFILLED = {el: float(_unfilled(v, 2)) for el, v in VALENCE_TABLE.items()}
N_UNFILLED = {
    el: float(sum(_unfilled(v, i) for i in range(4)))
    for el, v in VALENCE_TABLE.items()
}
UNPAIRED_ELECTRONS = {el: float(_unpaired(v)) for el, v in VALENCE_TABLE.items()}
