"""Cross-form parity for the r8 Spark-SQL string kernels (sp_*).

The descriptor assemblies moved from Column-DSL folds to selectExpr
strings (plan-compile tax, NOTES_r8 #4) on the claim that both forms
build the SAME Catalyst operators and are therefore bit-identical.
The DuckDB hash gates prove that on the corpus; these tests pin it on
RANDOMIZED compositions (seeded, deterministic) including shapes the
corpus lacks — single-element formulas (std → NULL via the beta
denominator), oxygen-free formulas (en_diff over an empty cation
list), and paren-group multiplicities.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from oxi_diel_db_spark.functions import atomic_orbitals as AO
from oxi_diel_db_spark.functions import composition as C

SEED = 20260815


def _random_formulas(n: int = 60) -> list[str]:
    rng = random.Random(SEED)
    els = sorted(C.PAULING_EN)
    out = []
    for i in range(n):
        k = rng.randint(1, 4)
        parts = [
            f"{rng.choice(els)}{rng.choice(['', '2', '3', '12'])}"
            for _ in range(k)
        ]
        f = "".join(parts)
        if i % 3 == 0:  # paren-group tier ('Ba(CO3)2' shapes)
            inner = f"{rng.choice(els)}{rng.choice(els)}{rng.randint(2, 4)}"
            f += f"({inner}){rng.randint(2, 3)}"
        if i % 4 != 0:  # most rows oxide-like, some oxygen-free
            f += f"O{rng.randint(1, 6)}"
        out.append(f)
    return out


@pytest.fixture(scope="module")
def staged(spark):
    df = spark.createDataFrame(
        [(i, f) for i, f in enumerate(_random_formulas())], "id long, formula string"
    )
    toks = df.select("id", "formula", C._tok_counts("formula").alias("_toks"))
    from oxi_diel_db_spark.queries.reference_parity import _EP_FIELDS

    return toks.select(
        "id",
        "formula",
        "_toks",
        C.enrich_agg(
            C._agg_tok_counts("formula", toks=F.col("_toks")), _EP_FIELDS
        ).alias("_enr"),
    ).localCheckpoint(eager=True)


def _pairs_equal(df, a_prefix="a_", b_prefix="b_"):
    """Exact (bitwise, via <=> on doubles) equality of a_*/b_* column
    pairs; returns the list of differing (column, count)."""
    bad = []
    for c in [c[len(a_prefix):] for c in df.columns if c.startswith(a_prefix)]:
        n = df.filter(
            ~F.col(f"{a_prefix}{c}").eqNullSafe(F.col(f"{b_prefix}{c}"))
        ).count()
        if n:
            bad.append((c, n))
    return bad


def test_sp_matminer_stats_bitwise_equals_dsl(staged):
    dsl = C.matminer_stats_field(F.col("_enr"), "p_en")
    sql = C.sp_matminer_stats("_enr", "s.p_en")
    cols = []
    for stat in ("mean", "std", "min", "max", "range"):
        cols.append(dsl[stat].alias(f"a_{stat}"))
        cols.append(F.expr(sql[stat]).alias(f"b_{stat}"))
    assert _pairs_equal(staged.select(*cols)) == []


def test_sp_scalar_kernels_bitwise_equal_dsl(staged):
    toks = F.col("_toks")
    enr = F.col("_enr")
    pairs = [
        ("tm", C.tmetal_fraction("formula", toks=toks), C.sp_tmetal_fraction("_toks")),
        ("bc", C.band_center("formula", toks=toks), C.sp_band_center("_toks")),
        ("ion", C.avg_ionic_character("formula", toks=toks),
         C.sp_avg_ionic_character("_toks")),
        ("oxs", C.oxi_state_std("formula", agg=enr), C.sp_oxi_state_std("_enr")),
        ("oxr", C.oxi_state_range("formula", agg=enr), C.sp_oxi_state_range("_enr")),
        ("p3", C.stoichiometry_pnorm("formula", 3), C.sp_stoichiometry_pnorm("_toks", 3)),
    ]
    cols = []
    for name, dsl_col, sql_str in pairs:
        cols.append(dsl_col.alias(f"a_{name}"))
        cols.append(F.expr(sql_str).alias(f"b_{name}"))
    ed = C.en_diff_stats("formula", agg=enr, en_field="p_en")
    eds = C.sp_en_diff_stats("_enr", "p_en")
    for stat in ("max", "range", "mean", "std"):
        cols.append(ed[stat].alias(f"a_ed{stat}"))
        cols.append(F.expr(eds[stat]).alias(f"b_ed{stat}"))
    assert _pairs_equal(staged.select(*cols)) == []


def test_sp_valence_fractions_bitwise_equal_dsl(staged):
    from oxi_diel_db_spark.functions.valence import (
        sp_valence_fractions,
        valence_fractions,
    )

    dsl = valence_fractions("formula", toks=F.col("_toks"))
    sql = sp_valence_fractions("_toks")
    cols = []
    for name in dsl:
        cols.append(dsl[name].alias(f"a_{name}"))
        cols.append(F.expr(sql[name]).alias(f"b_{name}"))
    assert _pairs_equal(staged.select(*cols)) == []


def test_sp_atomic_orbitals_equals_window_form(spark, staged):
    """The zero-shuffle AO expression twin must reproduce the window
    pipeline's HOMO/LUMO/gap on random compositions — including the
    exact-fill LUMO tier and compositions the corpus lacks. The window
    form needs (mp_id, formula, structure-free), so both run from the
    same formula set."""
    ao = AO.sp_atomic_orbitals("_enr")
    expr_side = (
        staged.selectExpr(
            "id", "formula", "_enr",
            f"{ao['_aosort']} AS _aosort", f"{ao['_tote']} AS _tote",
        )
        .selectExpr("id", "formula", "_aosort", "_tote",
                    f"{ao['_aoscan']} AS _aoscan")
        .selectExpr(
            "id",
            f"{ao['homo_energy']} AS a_homo",
            f"{ao['lumo_energy']} AS a_lumo",
            f"{ao['gap_ao']} AS a_gap",
        )
    )
    m = staged.select(F.col("id").cast("string").alias("mp_id"), "formula")
    win = AO.atomic_orbitals_features(m, spark).select(
        F.col("mp_id").cast("long").alias("id"),
        F.col("homo_energy").alias("b_homo"),
        F.col("lumo_energy").alias("b_lumo"),
        F.col("gap_ao").alias("b_gap"),
    )
    j = expr_side.join(win, "id", "left")
    # window form drops a material only when no HOMO row exists —
    # the expression side must then be NULL too (join yields NULLs)
    assert _pairs_equal(j) == []
    assert j.count() == staged.count()


def test_sp_radius_and_ape_kernels_bitwise_equal_dsl(staged):
    """r9 (r8 verdict ask #6): the two sp_* kernels the randomized net
    did not yet cover — sp_mean_radius (reads the enriched s.p_radius
    field where the DSL re-looks-up the radius map by element: same
    doubles by construction of enrich_agg) and sp_ape_stats (the
    nested-CASE argmin chain over critical ratios). Both compared on
    a SHARED staged rbar so any divergence isolates to the kernel
    under test, not the divisor."""
    rbar_sql = C.sp_mean_radius("_enr")
    df = staged.select(
        "id",
        "formula",
        "_enr",
        C.mean_radius(F.col("_enr")).alias("a_rbar"),
        F.expr(rbar_sql).alias("b_rbar"),
    )
    assert _pairs_equal(df) == []

    with_rbar = df.withColumnRenamed("b_rbar", "rbar")
    dsl = C.ape_stats(F.col("_enr"), F.col("rbar"))
    sql = C.sp_ape_stats("_enr", "rbar")
    cols = []
    for stat in ("mean", "mean_abs"):
        cols.append(dsl[stat].alias(f"a_{stat}"))
        cols.append(F.expr(sql[stat]).alias(f"b_{stat}"))
    assert _pairs_equal(with_rbar.select(*cols)) == []


def test_sp_prop_map_matches_enrichment(staged):
    """sp_prop_map literals must agree with what enrich_agg stored in
    the struct fields — the assumption every sp_* kernel that reads
    s.<field> instead of map[s.el] rests on (randomized formulas
    include elements absent from some tables → NULL on both sides)."""
    from oxi_diel_db_spark.queries.reference_parity import _EP_FIELDS

    field, table = "p_en", C.PAULING_EN
    assert field in _EP_FIELDS
    m = F.expr(C.sp_prop_map(table))
    probe = staged.select(
        "id",
        F.explode(F.col("_enr")).alias("s"),
    ).select(
        F.col("s.el").alias("el"),
        F.col(f"s.{field}").alias("a_v"),
        m[F.col("s.el")].alias("b_v"),
    )
    assert probe.filter(~F.col("a_v").eqNullSafe(F.col("b_v"))).count() == 0
    assert probe.count() > 0
