"""Chemical-formula functions (SURVEY.md §2.8 F4, §2.6 O1).

parse_formula reimplements the semantics the reference gets from
pymatgen's ``Composition("SiO2")`` (reference main.py:33) as pure
Catalyst expressions — regexp token split, no Python. The
electronegativity-ordered formula (O1: reference README.md:18, cations
ordered by EN) uses a broadcast element-property lookup, which is also
the engine's pattern for every composition-level featurizer (§2.9).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# element token: capital + optional lowercase + optional count (int/float)
_TOKEN_RE = "[A-Z][a-z]?[0-9.]*"


def formula_tokens(formula: Column | str) -> Column:
    c = F.col(formula) if isinstance(formula, str) else formula
    return F.regexp_extract_all(c, F.lit(_TOKEN_RE), 0)


def parse_formula(formula: Column | str) -> Column:
    """'Ca2SnO4' → map<string,double> {Ca:2.0, Sn:1.0, O:4.0}."""
    toks = formula_tokens(formula)
    elems = F.transform(toks, lambda t0: F.regexp_extract(t0, "[A-Z][a-z]?", 0))
    counts = F.transform(
        toks,
        lambda t0: F.coalesce(
            F.nullif(F.regexp_extract(t0, "[0-9.]+", 0), F.lit("")), F.lit("1")
        ).cast("double"),
    )
    return F.map_from_arrays(elems, counts)


def formula_canonical(formula: Column | str) -> Column:
    """Deterministic canonical form: 'El:count' sorted by element symbol,
    joined with spaces — the hash-comparable rendering of parse_formula."""
    toks = formula_tokens(formula)
    pairs = F.transform(
        toks,
        lambda t0: F.concat_ws(
            ":",
            F.regexp_extract(t0, "[A-Z][a-z]?", 0),
            F.coalesce(
                F.nullif(F.regexp_extract(t0, "[0-9.]+", 0), F.lit("")), F.lit("1")
            ),
        ),
    )
    return F.concat_ws(" ", F.array_sort(pairs))


def sql_formula_canonical(col: str) -> str:
    """DuckDB twin of formula_canonical()."""
    return f"""
    array_to_string(list_sort(list_transform(
        regexp_extract_all({col}, '[A-Z][a-z]?[0-9.]*'),
        t -> regexp_extract(t, '[A-Z][a-z]?')
             || ':' ||
             CASE WHEN regexp_extract(t, '[0-9.]+') = ''
                  THEN '1' ELSE regexp_extract(t, '[0-9.]+') END
    )), ' ')
    """


# Pauling electronegativities for every element appearing in the corpus
# (public tabulated values; O ordered last as the anion, matching the
# reference's formula convention, README.md:18).
PAULING_EN = {
    "H": 2.20, "Li": 0.98, "Be": 1.57, "B": 2.04, "C": 2.55, "N": 3.04,
    "O": 3.44, "F": 3.98, "Na": 0.93, "Mg": 1.31, "Al": 1.61, "Si": 1.90,
    "P": 2.19, "S": 2.58, "Cl": 3.16, "K": 0.82, "Ca": 1.00, "Sc": 1.36,
    "Ti": 1.54, "V": 1.63, "Cr": 1.66, "Mn": 1.55, "Fe": 1.83, "Co": 1.88,
    "Ni": 1.91, "Cu": 1.90, "Zn": 1.65, "Ga": 1.81, "Ge": 2.01, "As": 2.18,
    "Se": 2.55, "Br": 2.96, "Rb": 0.82, "Sr": 0.95, "Y": 1.22, "Zr": 1.33,
    "Nb": 1.60, "Mo": 2.16, "Tc": 1.90, "Ru": 2.20, "Rh": 2.28, "Pd": 2.20,
    "Ag": 1.93, "Cd": 1.69, "In": 1.78, "Sn": 1.96, "Sb": 2.05, "Te": 2.10,
    "I": 2.66, "Cs": 0.79, "Ba": 0.89, "La": 1.10, "Ce": 1.12, "Pr": 1.13,
    "Nd": 1.14, "Sm": 1.17, "Eu": 1.20, "Gd": 1.20, "Tb": 1.10, "Dy": 1.22,
    "Ho": 1.23, "Er": 1.24, "Tm": 1.25, "Yb": 1.10, "Lu": 1.27, "Hf": 1.30,
    "Ta": 1.50, "W": 2.36, "Re": 1.90, "Os": 2.20, "Ir": 2.20, "Pt": 2.28,
    "Au": 2.54, "Hg": 2.00, "Tl": 1.62, "Pb": 2.33, "Bi": 2.02, "Th": 1.30,
    "U": 1.38,
}


def element_property_table(spark: SparkSession) -> DataFrame:
    """Broadcast element-property dim table — the engine's replacement
    for matminer's elemental lookups (§2.9 'composition-level →
    broadcast element-property table')."""
    rows = [(el, en) for el, en in sorted(PAULING_EN.items())]
    return spark.createDataFrame(rows, "element string, electronegativity double")


def en_ordered_formula(elements_col: Column | str) -> Column:
    """Elements sorted ascending by Pauling EN (cation order of the
    reference's formula field) rendered as a '-'-joined string.

    Implemented as a pure expression over a literal map (the EN table is
    O(100) entries — a map literal beats a join for a fixed vocabulary).
    """
    c = F.col(elements_col) if isinstance(elements_col, str) else elements_col
    kv = [x for el, en in sorted(PAULING_EN.items()) for x in (F.lit(el), F.lit(en))]
    en_map = F.create_map(*kv)
    decorated = F.transform(
        c,
        lambda e: F.concat_ws(
            "|",
            F.lpad(F.format_number(en_map[e] * 100, 0), 4, "0"),
            e,
        ),
    )
    return F.concat_ws(
        "-", F.transform(F.array_sort(decorated), lambda s: F.split(s, "\\|")[1])
    )
