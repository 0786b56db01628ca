"""Reference descriptor-level parity tier (round 7).

The reference assembles four fixed descriptor vectors
(ml_prediction.py:82-117 el_comp 34-dim, :127-170 ion_comp 42-dim,
:190-220 el_comp_st 29-dim, :230-276 ion_comp_st 45-dim) from matminer
featurizers, scales them, and feeds a RandomForest. Rounds 1-6
implemented every underlying featurizer family (m13-m36) but scored
the corpus through an 11+4-feature engine-native analog set
(ml/comp_model.py). This module closes the largest remaining fidelity
gap (VERDICT r6 "What's missing" #2): ml6 assembles the reference's
EXACT el_comp 34-slot descriptor, slot by slot, from the implemented
featurizer columns; ml7 trains/scores on it and is parity-gated
against the reference's own golden predictions
(prediction_model/prediction_result_el_comp.json, 1,266 rows) in
tests/test_reference_parity.py.

Semantics notes (each slot cites its reference line):

* ElementProperty slots use matminer's exact PropertyStats semantics
  (count-weighted mean, unbiased weighted std, unweighted min/range) —
  functions/composition.matminer_stats.
* atomic_radius rides the Cordero covalent-radius table and block the
  s0/p1/d2/f3 encoding — the engine's declared public analogs.
* ElectronegativityDiff / OxidationStates ride the oxide-corpus
  anion=O / charge-balance analogs (m23/m25 convention), with one
  divergence: matminer yields NaN std for single-cation compositions
  (beta = n/(n²−Σc²) → ∞ with a 0 deviation sum); the engine yields
  0.0 on both sides of the gate (the sane limit, hash-stable).
* HOMO/LUMO/gap_AO are the m29 aufbau-filling columns.

Everything is one projection over the materials table plus one
per-material window for the orbital filling — no shuffle grows with
corpus size, so the 100 TB posture is the same as m32's.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from oxi_diel_db_spark.functions import atomic_orbitals as AO
from oxi_diel_db_spark.functions import composition as C
from oxi_diel_db_spark.functions.element_data import (
    MELTING_POINT,
    MENDELEEV_NO,
    THERMAL_CONDUCTIVITY,
)
from oxi_diel_db_spark.queries import register
from oxi_diel_db_spark.sources import materials as M


def _r6n(col, alias):
    """ROUND(x + 1e-9, 6): the 1e-9 nudge breaks decimal-tie values
    (…xxx5 shortest-repr) that Spark's round (HALF_UP on the shortest
    decimal repr) and DuckDB's (binary-value) resolve differently —
    one corpus row hit exactly that on mean_thermcond. Applied on BOTH
    sides of the gate, so values stay bit-identical."""
    return (F.round(col + F.lit(1e-9), 6) + F.lit(0.0)).alias(alias)


def _sql_r6n(expr: str, alias: str) -> str:
    return f"ROUND(({expr}) + 1e-9, 6) + 0 AS {alias}"


def _sp_r6n(expr: str, alias: str) -> str:
    """Spark-SQL-dialect _r6n (same Round/Add operators as the Column
    form — bit-identical)."""
    return f"round(({expr}) + 1e-9D, 6) + 0.0D AS {alias}"

_MAT = f"read_parquet('{M.MATERIALS_PARQUET}/*.parquet')"

#: Deterministic structural-descriptor gate sample (md5-prefix rule;
#: see queries/site_exact.py — constant gate cost at any corpus
#: scale). The LIBRARY descriptor functions stay full-corpus (ml11/
#: ml13 train on every material); only the REGISTERED ml10/ml12 gates
#: restrict to the sample, because their exact-tessellation oracles
#: re-derive the full Voronoi/OPSF construction relationally. Every
#: compositional slot family remains full-corpus-gated through
#: ml6/ml8.
VOR_SAMPLE_SQL = "md5(mp_id) LIKE '0%'"
_MAT_SAMPLE = f"(SELECT * FROM {_MAT} WHERE {VOR_SAMPLE_SQL})"


def _exact_site_features(m):
    """One fused OPSF + Voronoi per-site pass (r11: replaces the two
    standalone kernel passes behind ml10/ml12 — one 12 Å image build
    serves both slot families, and the kernel parallelizes per SITE).
    No checkpoint of the projection: with a single consumer the eager
    barrier only serializes (the deleted _exact_site_slim checkpoint
    existed to share the projection across TWO kernel scans)."""
    from oxi_diel_db_spark.operators.op_fingerprint import (
        exact_site_features,
    )

    return exact_site_features(m)

#: (column, table, stat) for the 18 ElementProperty slots of the
#: el_comp descriptor, in reference order (ml_prediction.py:83-100).
_EP_SLOTS: list[tuple[str, dict, str]] = [
    ("min_x", C.PAULING_EN, "min"),
    ("range_x", C.PAULING_EN, "range"),
    ("std_x", C.PAULING_EN, "std"),
    ("mean_row", C.PERIOD, "mean"),
    ("std_row", C.PERIOD, "std"),
    ("mean_group", C.GROUP, "mean"),
    ("mean_block", C.BLOCK, "mean"),
    ("std_block", C.BLOCK, "std"),
    ("mean_mass", C.ATOMIC_MASS, "mean"),
    ("std_mass", C.ATOMIC_MASS, "std"),
    ("std_radius", C.COVALENT_RADIUS, "std"),
    ("min_mendeleev", MENDELEEV_NO, "min"),
    ("range_mendeleev", MENDELEEV_NO, "range"),
    ("std_mendeleev", MENDELEEV_NO, "std"),
    ("mean_thermcond", THERMAL_CONDUCTIVITY, "mean"),
    ("std_thermcond", THERMAL_CONDUCTIVITY, "std"),
    ("mean_melting", MELTING_POINT, "mean"),
    ("std_melting", MELTING_POINT, "std"),
]

#: The 34 descriptor column names, reference slot order
#: (ml_prediction.py:82-117).
EL_COMP_COLUMNS: list[str] = (
    [name for name, _, _ in _EP_SLOTS]
    + ["avg_s", "avg_d", "frac_s", "frac_p", "frac_d"]  # ValenceOrbital :103-107
    + ["avg_ionic_char", "tm_frac"]  # IonProperty :108, TMetalFraction :109
    + ["max_endiff", "range_endiff", "mean_endiff", "std_endiff"]  # :110-113
    + ["band_center", "std_oxi"]  # BandCenter :114, OxidationStates :115
    + ["homo_energy", "lumo_energy", "gap_ao"]  # AtomicOrbitals :116-118
)


#: field name → element-property table for the enriched _agg struct
#: (one literal map per table, embedded ONCE in the plan — see
#: composition.enrich_agg).
_EP_FIELDS: dict[str, dict] = {
    "p_en": C.PAULING_EN,
    "p_row": C.PERIOD,
    "p_group": C.GROUP,
    "p_block": C.BLOCK,
    "p_mass": C.ATOMIC_MASS,
    "p_radius": C.COVALENT_RADIUS,
    "p_mend": MENDELEEV_NO,
    "p_thermcond": THERMAL_CONDUCTIVITY,
    "p_melting": MELTING_POINT,
}
_EP_FIELD_OF: dict[int, str] = {id(t): f for f, t in _EP_FIELDS.items()}


def el_comp_descriptors(spark) -> "F.DataFrame":
    """(mp_id, formula, <34 descriptor columns>) for the whole corpus —
    the library entry point ml7 trains on.

    Three-stage projection (the r7-verdict plan-compile-tax fix):
    stage 1 materializes the expansion-order token array ONCE as
    ``_toks`` (the regexp tokenizer subtree otherwise re-embeds per
    featurizer — avg_ionic_char's nested fold alone carried it O(n²)
    times); stage 2 derives the sorted per-element ``_agg`` from it
    and enriches it with the nine element-property values as struct
    fields (each ~80-entry literal map appears once instead of ~6× per
    EP slot); stage 3's 28 stat columns are small folds over those two
    columns. Catalyst's CollapseProject declines to inline non-cheap
    expressions referenced this many times, so each stage stays staged.
    Fold order and arithmetic are unchanged — values bit-identical to
    the literal-map form (hash gate unmoved). The finished Column list
    is memoized at module level: unresolved Column expression trees
    are session-independent within a JVM, and rebuilding them costs
    seconds of py4j round trips per invocation (r7 profiling)."""
    m = M.materials(spark)
    staged = m.select(
        "mp_id", "formula", C._tok_counts("formula").alias("_toks")
    )
    enriched = staged.select(
        "mp_id",
        "formula",
        "_toks",
        C.enrich_agg(
            C._agg_tok_counts("formula", toks=F.col("_toks")), _EP_FIELDS
        ).alias("_enr"),
    )
    ao = AO.sp_atomic_orbitals("_enr")
    with_ao = enriched.selectExpr(
        "*", f"{ao['_aosort']} AS _aosort", f"{ao['_tote']} AS _tote"
    ).selectExpr("*", f"{ao['_aoscan']} AS _aoscan")
    return with_ao.selectExpr(
        "mp_id",
        "formula",
        *_el_comp_cols(),
        f"{ao['homo_energy']} AS homo_energy",
        f"{ao['lumo_energy']} AS lumo_energy",
        f"{ao['gap_ao']} AS gap_ao",
    )


_EL_COLS_CACHE: list | None = None


def _el_comp_cols() -> list[str]:
    """The 28 compositional stat columns as Spark-SQL strings over the
    staged ``_toks``/``_enr`` columns — one selectExpr parse instead of
    ~100 py4j lambda round trips (see composition's sp_* kernels; same
    Catalyst operators as the Column DSL, bit-identical values)."""
    global _EL_COLS_CACHE
    if _EL_COLS_CACHE is not None:
        return _EL_COLS_CACHE
    from oxi_diel_db_spark.functions.valence import sp_valence_fractions

    cols: list[str] = []
    stats_cache: dict[str, dict] = {}
    for name, table, stat in _EP_SLOTS:
        field = _EP_FIELD_OF[id(table)]
        if field not in stats_cache:
            stats_cache[field] = C.sp_matminer_stats("_enr", f"s.{field}")
        cols.append(_sp_r6n(stats_cache[field][stat], name))
    vf = sp_valence_fractions("_toks")
    for name in ("avg_s", "avg_d", "frac_s", "frac_p", "frac_d"):
        cols.append(_sp_r6n(vf[name], name))
    cols.append(_sp_r6n(C.sp_avg_ionic_character("_toks"), "avg_ionic_char"))
    cols.append(_sp_r6n(C.sp_tmetal_fraction("_toks"), "tm_frac"))
    ed = C.sp_en_diff_stats("_enr", "p_en")
    for stat, name in (
        ("max", "max_endiff"),
        ("range", "range_endiff"),
        ("mean", "mean_endiff"),
        ("std", "std_endiff"),
    ):
        cols.append(_sp_r6n(ed[stat], name))
    cols.append(_sp_r6n(C.sp_band_center("_toks"), "band_center"))
    cols.append(_sp_r6n(C.sp_oxi_state_std("_enr"), "std_oxi"))
    _EL_COLS_CACHE = cols
    return cols


def _ml6_oracle() -> str:
    from oxi_diel_db_spark.functions.valence import sql_valence_fractions

    parts = []
    for name, table, stat in _EP_SLOTS:
        parts.append(
            _sql_r6n(C.sql_matminer_stats("m.formula", table, agg="m.agg")[stat], name)
        )
    vf = sql_valence_fractions("m.formula")
    for name in ("avg_s", "avg_d", "frac_s", "frac_p", "frac_d"):
        parts.append(_sql_r6n(vf[name], name))
    parts.append(
        _sql_r6n(C.sql_avg_ionic_character("m.formula"), "avg_ionic_char")
    )
    parts.append(_sql_r6n(C.sql_tmetal_fraction("m.formula"), "tm_frac"))
    ed = C.sql_en_diff_stats("m.formula", agg="m.agg")
    for stat, name in (
        ("max", "max_endiff"),
        ("range", "range_endiff"),
        ("mean", "mean_endiff"),
        ("std", "std_endiff"),
    ):
        parts.append(_sql_r6n(ed[stat], name))
    parts.append(_sql_r6n(C.sql_band_center("m.formula"), "band_center"))
    parts.append(_sql_r6n(C.sql_oxi_state_std("m.formula", agg="m.agg"), "std_oxi"))
    sel = ",\n           ".join(parts)
    return f"""
    WITH ao AS ({AO.sql_atomic_orbitals(_MAT)}),
    staged AS (
      SELECT mp_id, formula, {C.sql_agg_tok_counts('formula')} AS agg
      FROM {_MAT}
    )
    SELECT m.mp_id,
           {sel},
           ao.homo_energy, ao.lumo_energy, ao.gap_ao
    FROM staged m LEFT JOIN ao ON m.mp_id = ao.mp_id
    """


@register("ml6_reference_descriptors", oracle=_ml6_oracle())
def ml6_reference_descriptors(spark, sf_dir):
    """§2.11/§2.9 capstone: the reference's EXACT el_comp 34-dim
    descriptor vector (ml_prediction.py:82-117), one column per slot in
    reference order, for every corpus material. See module docstring
    for the three documented analog slots. Plan: literal-map folds in
    one projection + the m29 orbital window — zero corpus-sized
    shuffles."""
    return el_comp_descriptors(spark).drop("formula")


# ---------------------------------------------------------------------------
# ml7: score the corpus on the exact descriptor set
# ---------------------------------------------------------------------------

import os as _os

_SCRATCH = _os.path.join(
    _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))),
    ".scratch",
)
_DESC_PARQUET = _os.path.join(_SCRATCH, "ref_el_comp_descriptors.parquet")
_MODEL_DIR = _os.path.join(_SCRATCH, "models", "ref_el_comp_rf60")


def materialized_descriptors(spark):
    """el_comp descriptors materialized to scratch parquet. The 34-col
    descriptor plan is a single wide projection — fine to EXECUTE, but
    iterative ML on top of it (RF's many passes + the scaler's
    cross-join re-deriving it per pass) needs the lineage cut; at
    cluster scale this is the standard persist-features-then-train
    boundary (a real feature store write)."""
    if not _os.path.isdir(_DESC_PARQUET):
        el_comp_descriptors(spark).write.mode("overwrite").parquet(_DESC_PARQUET)
    return spark.read.parquet(_DESC_PARQUET)


def train_el_comp_reference(spark, num_trees: int = 60):
    """RandomForest on the reference's exact el_comp descriptor
    (scaled with population std, matching sklearn StandardScaler /
    the reference's el_comp_scaler.joblib, ddof=0) → (model, feats).
    Cached under .scratch/models like the other model artifacts (S5)."""
    from pyspark.ml import Pipeline, PipelineModel
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.regression import RandomForestRegressor

    from oxi_diel_db_spark.ml import comp_model as CM
    from oxi_diel_db_spark.ml.pipeline import scale_features_pop

    labels = CM._labels(M.materials(spark)).select("mp_id", "label_el")
    feats = scale_features_pop(
        materialized_descriptors(spark).join(labels, "mp_id"), EL_COMP_COLUMNS
    ).dropna(subset=EL_COMP_COLUMNS + ["label_el"])
    if _os.path.isdir(_MODEL_DIR):
        return PipelineModel.load(_MODEL_DIR), feats
    pipe = Pipeline(
        stages=[
            VectorAssembler(inputCols=EL_COMP_COLUMNS, outputCol="features"),
            RandomForestRegressor(
                featuresCol="features",
                labelCol="label_el",
                predictionCol="pred_log10",
                numTrees=num_trees,
                maxDepth=12,
                seed=42,
            ),
        ]
    )
    model = pipe.fit(feats)
    _os.makedirs(_os.path.dirname(_MODEL_DIR), exist_ok=True)
    model.write().overwrite().save(_MODEL_DIR)
    return model, feats


@register("ml7_reference_scoring", oracle=None)  # ML internals — rows-only;
# descriptor-level golden parity gated in tests/test_reference_parity.py
def ml7_reference_scoring(spark, sf_dir):
    """§2.11 reference-parity scoring: RF over the EXACT el_comp 34-dim
    descriptor (ml6), corpus-scored. Closes VERDICT r6 "What's missing"
    #2: corr vs the reference's own golden predictions
    (prediction_result_el_comp.json) measured 0.995 at 60 trees —
    floor 0.98 asserted in tests/test_reference_parity.py (the
    reference's own corr to stored actuals is 0.986, BASELINE.md)."""
    model, feats = train_el_comp_reference(spark)
    return model.transform(feats).select(
        "mp_id", F.round("pred_log10", 6).alias("pred_log10")
    )


# ---------------------------------------------------------------------------
# ml8: the reference's EXACT ion_comp 42-dim descriptor
# (ml_prediction.py:127-170), slot by slot in reference order
# ---------------------------------------------------------------------------

#: (column, table, stat) for the 21 ElementProperty slots of ion_comp
#: (ml_prediction.py:130-152), reference order.
_ION_EP_SLOTS: list[tuple[str, dict, str]] = [
    ("mean_x", C.PAULING_EN, "mean"),
    ("mean_row", C.PERIOD, "mean"),
    ("std_row", C.PERIOD, "std"),
    ("std_group", C.GROUP, "std"),
    ("mean_block", C.BLOCK, "mean"),
    ("std_block", C.BLOCK, "std"),
    ("max_mass", C.ATOMIC_MASS, "max"),
    ("range_mass", C.ATOMIC_MASS, "range"),
    ("mean_mass", C.ATOMIC_MASS, "mean"),
    ("std_mass", C.ATOMIC_MASS, "std"),
    ("max_radius", C.COVALENT_RADIUS, "max"),
    ("range_radius", C.COVALENT_RADIUS, "range"),
    ("mean_radius", C.COVALENT_RADIUS, "mean"),
    ("std_radius", C.COVALENT_RADIUS, "std"),
    ("min_mendeleev", MENDELEEV_NO, "min"),
    ("mean_mendeleev", MENDELEEV_NO, "mean"),
    ("std_mendeleev", MENDELEEV_NO, "std"),
    ("mean_thermcond", THERMAL_CONDUCTIVITY, "mean"),
    ("std_thermcond", THERMAL_CONDUCTIVITY, "std"),
    ("mean_melting", MELTING_POINT, "mean"),
    ("std_melting", MELTING_POINT, "std"),
]

#: The 42 ion_comp descriptor column names, reference slot order.
ION_COMP_COLUMNS: list[str] = (
    ["norm3", "norm5"]  # Stoichiometry :129-130
    + [name for name, _, _ in _ION_EP_SLOTS]
    + ["avg_s", "frac_s", "frac_p", "frac_d"]  # ValenceOrbital :153-156
    + ["avg_ionic_char", "tm_frac"]  # IonProperty :157, TMetalFraction :158
    + ["min_endiff", "range_endiff", "mean_endiff", "std_endiff"]  # :159-162
    + ["range_oxi", "std_oxi"]  # OxidationStates :163-164
    + ["lumo_energy", "gap_ao"]  # AtomicOrbitals :165-166
    + ["ape_mean", "ape_mean_abs", "ape_dist_1", "ape_dist_3", "ape_dist_5"]
    # AtomicPackingEfficiency :167-171 (documented critical-ratio analog)
)


def ion_comp_descriptors(spark) -> "F.DataFrame":
    """(mp_id, formula, <42 descriptor columns>) — ml9 trains on this.
    Same staged-SQL-string discipline as el_comp (see its docstring):
    tokenizer → enriched agg → staged rbar/AO/APE intermediates → one
    selectExpr of small folds. The APE cluster distances are a
    233-entry literal-array transform + sort (replacing the former
    1,278 × 233 broadcast product + collect_list aggregate — same
    sorted distance list, zero shuffles)."""
    m = M.materials(spark)
    staged = m.select(
        "mp_id", "formula", C._tok_counts("formula").alias("_toks")
    )
    enriched = staged.select(
        "mp_id",
        "formula",
        "_toks",
        C.enrich_agg(
            C._agg_tok_counts("formula", toks=F.col("_toks")), _EP_FIELDS
        ).alias("_enr"),
    )
    ao = AO.sp_atomic_orbitals("_enr")
    s3 = enriched.selectExpr(
        "*",
        f"{C.sp_mean_radius('_enr')} AS _rbar",
        f"{ao['_aosort']} AS _aosort",
        f"{ao['_tote']} AS _tote",
        "map_from_entries(transform(_enr, s -> struct(s.el, s.cnt))) AS _fmap",
        f"{C._sp_fold_sum('_enr', 's.cnt')} AS _total",
    )
    s4 = s3.selectExpr(
        "*",
        f"{ao['_aoscan']} AS _aoscan",
        f"{C._sp_fold_sum('_enr', '(s.cnt / _total) * (s.cnt / _total)')} AS _sumsq",
    )
    s5 = s4.selectExpr("*", f"{_sp_ape_dists()} AS _apedists")
    exprs = _ion_comp_exprs()
    exprs["lumo_energy"] = ao["lumo_energy"]
    exprs["gap_ao"] = ao["gap_ao"]
    return s5.selectExpr(
        "mp_id",
        "formula",
        *[f"{exprs[n]} AS {n}" for n in ION_COMP_COLUMNS],
    )


def _sp_ape_dists() -> str:
    """Sorted L2 distances to the 233 efficiently-packed binary
    clusters as a per-row expression over the staged _fmap/_total/
    _sumsq columns (same arithmetic, same sorted order as the former
    broadcast-join + collect_list form — exact doubles, so sort ties
    resolve identically)."""
    clusters = ", ".join(
        f"named_struct('center', '{a}', 'shell', '{b}', "
        f"'cc', {1.0 / (cn + 1)!r}D, 'cs', {float(cn) / (cn + 1)!r}D)"
        for a, b, cn in C.EFFICIENT_CLUSTERS
    )
    fr_c = "(coalesce(_fmap[c.center], 0.0D) / _total)"
    fr_s = "(coalesce(_fmap[c.shell], 0.0D) / _total)"
    d = (
        f"sqrt(greatest(_sumsq + c.cc * c.cc + c.cs * c.cs "
        f"- 2.0D * ({fr_c} * c.cc + {fr_s} * c.cs), 0.0D))"
    )
    return f"sort_array(transform(array({clusters}), c -> {d}))"


_ION_EXPRS_CACHE: dict | None = None


def _ion_comp_exprs() -> dict[str, str]:
    """name → Spark-SQL expr for the composition slots of ION_COMP_
    COLUMNS (AO slots filled in by the caller)."""
    global _ION_EXPRS_CACHE
    if _ION_EXPRS_CACHE is not None:
        return dict(_ION_EXPRS_CACHE)
    from oxi_diel_db_spark.functions.valence import sp_valence_fractions

    r6 = lambda e: f"round(({e}) + 1e-9D, 6) + 0.0D"  # noqa: E731
    exprs: dict[str, str] = {
        "norm3": r6(C.sp_stoichiometry_pnorm("_toks", 3)),
        "norm5": r6(C.sp_stoichiometry_pnorm("_toks", 5)),
    }
    stats_cache: dict[str, dict] = {}
    for name, table, stat in _ION_EP_SLOTS:
        field = _EP_FIELD_OF[id(table)]
        if field not in stats_cache:
            stats_cache[field] = C.sp_matminer_stats("_enr", f"s.{field}")
        exprs[name] = r6(stats_cache[field][stat])
    vf = sp_valence_fractions("_toks")
    for name in ("avg_s", "frac_s", "frac_p", "frac_d"):
        exprs[name] = r6(vf[name])
    exprs["avg_ionic_char"] = r6(C.sp_avg_ionic_character("_toks"))
    exprs["tm_frac"] = r6(C.sp_tmetal_fraction("_toks"))
    ed = C.sp_en_diff_stats("_enr", "p_en")
    for stat, name in (
        ("min", "min_endiff"),
        ("range", "range_endiff"),
        ("mean", "mean_endiff"),
        ("std", "std_endiff"),
    ):
        exprs[name] = r6(ed[stat])
    exprs["range_oxi"] = r6(C.sp_oxi_state_range("_enr"))
    exprs["std_oxi"] = r6(C.sp_oxi_state_std("_enr"))
    ape = C.sp_ape_stats("_enr", "_rbar")
    exprs["ape_mean"] = r6(ape["mean"])
    exprs["ape_mean_abs"] = r6(ape["mean_abs"])
    for k in (1, 3, 5):
        exprs[f"ape_dist_{k}"] = r6(
            f"aggregate(slice(_apedists, 1, {k}), 0.0D, (acc, x) -> acc + x) / {k}"
        )
    _ION_EXPRS_CACHE = exprs
    return dict(exprs)


def _ml8_oracle() -> str:
    from oxi_diel_db_spark.functions.valence import sql_valence_fractions

    parts = [
        _sql_r6n(C.sql_stoichiometry_pnorm("m.formula", 3), "norm3"),
        _sql_r6n(C.sql_stoichiometry_pnorm("m.formula", 5), "norm5"),
    ]
    for name, table, stat in _ION_EP_SLOTS:
        parts.append(
            _sql_r6n(C.sql_matminer_stats("m.formula", table, agg="m.agg")[stat], name)
        )
    vf = sql_valence_fractions("m.formula")
    for name in ("avg_s", "frac_s", "frac_p", "frac_d"):
        parts.append(_sql_r6n(vf[name], name))
    parts.append(_sql_r6n(C.sql_avg_ionic_character("m.formula"), "avg_ionic_char"))
    parts.append(_sql_r6n(C.sql_tmetal_fraction("m.formula"), "tm_frac"))
    ed = C.sql_en_diff_stats("m.formula", agg="m.agg")
    for stat, name in (
        ("min", "min_endiff"),
        ("range", "range_endiff"),
        ("mean", "mean_endiff"),
        ("std", "std_endiff"),
    ):
        parts.append(_sql_r6n(ed[stat], name))
    parts.append(_sql_r6n(C.sql_oxi_state_range("m.formula", agg="m.agg"), "range_oxi"))
    parts.append(_sql_r6n(C.sql_oxi_state_std("m.formula", agg="m.agg"), "std_oxi"))
    ape = C.sql_ape_stats("m.agg", "m.rbar")
    parts.append(_sql_r6n(ape["mean"], "ape_mean"))
    parts.append(_sql_r6n(ape["mean_abs"], "ape_mean_abs"))
    sel = ",\n           ".join(parts)
    values = ",\n      ".join(
        f"('{a}', '{b}', {cn})" for a, b, cn in C.EFFICIENT_CLUSTERS
    )
    lookup = (
        "COALESCE(list_aggregate(list_transform("
        "list_filter(comp.agg, s -> s.el = {el}), s -> s.cnt), 'sum'), 0.0)"
        " / comp.total"
    )
    return f"""
    WITH ao AS ({AO.sql_atomic_orbitals(_MAT)}),
    staged AS (
      SELECT mp_id, formula, {C.sql_agg_tok_counts('formula')} AS agg
      FROM {_MAT}
    ),
    m AS (
      SELECT mp_id, formula, agg,
             {C.sql_mean_radius('agg')} AS rbar,
             list_aggregate(list_transform(agg, s -> s.cnt), 'sum') AS total
      FROM staged
    ),
    clusters(center, shell, cn) AS (VALUES
      {values}
    ),
    cl AS (
      SELECT center, shell, cn,
             1.0 / (cn + 1) AS cc, cn * 1.0 / (cn + 1) AS cs
      FROM clusters
    ),
    comp AS (
      SELECT mp_id, agg, total,
             list_aggregate(list_transform(agg,
               s -> (s.cnt / total) * (s.cnt / total)), 'sum') AS sumsq
      FROM m
    ),
    dist AS (
      SELECT comp.mp_id,
             sqrt(greatest(comp.sumsq + cl.cc * cl.cc + cl.cs * cl.cs
               - 2.0 * (({lookup.format(el='cl.center')}) * cl.cc
                        + ({lookup.format(el='cl.shell')}) * cl.cs), 0.0)) AS d
      FROM comp CROSS JOIN cl
    ),
    dk AS (
      SELECT mp_id, list(d ORDER BY d) AS ds FROM dist GROUP BY mp_id
    ),
    aped AS (
      SELECT mp_id,
             {_sql_r6n("list_aggregate(ds[1:1], 'sum') / 1", "ape_dist_1")},
             {_sql_r6n("list_aggregate(ds[1:3], 'sum') / 3", "ape_dist_3")},
             {_sql_r6n("list_aggregate(ds[1:5], 'sum') / 5", "ape_dist_5")}
      FROM dk
    )
    SELECT m.mp_id,
           {sel},
           ao.lumo_energy, ao.gap_ao,
           aped.ape_dist_1, aped.ape_dist_3, aped.ape_dist_5
    FROM m
    LEFT JOIN ao ON m.mp_id = ao.mp_id
    JOIN aped ON m.mp_id = aped.mp_id
    """


@register("ml8_ion_descriptors", oracle=_ml8_oracle())
def ml8_ion_descriptors(spark, sf_dir):
    """§2.11/§2.9: the reference's EXACT ion_comp 42-dim descriptor
    (ml_prediction.py:127-170), one column per slot in reference
    order. Analog slots documented in the module docstring + the APE
    tier (critical-ratio table, composition.CRITICAL_RATIOS). Plan:
    literal-map folds + the m29 orbital window + a 233-row broadcast
    cluster product — zero corpus-sized shuffles."""
    return ion_comp_descriptors(spark).drop("formula")


# ---------------------------------------------------------------------------
# ml9: score the corpus on the exact ion_comp descriptor set
# ---------------------------------------------------------------------------

_ION_DESC_PARQUET = _os.path.join(_SCRATCH, "ref_ion_comp_descriptors.parquet")
_ION_MODEL_DIR = _os.path.join(_SCRATCH, "models", "ref_ion_comp_rf60")


def materialized_ion_descriptors(spark):
    """ion_comp descriptors materialized to scratch parquet (same
    persist-features-then-train boundary as el_comp's)."""
    if not _os.path.isdir(_ION_DESC_PARQUET):
        ion_comp_descriptors(spark).write.mode("overwrite").parquet(
            _ION_DESC_PARQUET
        )
    return spark.read.parquet(_ION_DESC_PARQUET)


def train_ion_comp_reference(spark, num_trees: int = 60):
    """RandomForest on the reference's exact ion_comp descriptor,
    population-std scaled (the reference's StandardScaler, ddof=0)."""
    from pyspark.ml import Pipeline, PipelineModel
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.regression import RandomForestRegressor

    from oxi_diel_db_spark.ml import comp_model as CM
    from oxi_diel_db_spark.ml.pipeline import scale_features_pop

    labels = CM._labels(M.materials(spark)).select("mp_id", "label_ion")
    feats = scale_features_pop(
        materialized_ion_descriptors(spark).join(labels, "mp_id"),
        ION_COMP_COLUMNS,
    ).dropna(subset=ION_COMP_COLUMNS + ["label_ion"])
    if _os.path.isdir(_ION_MODEL_DIR):
        return PipelineModel.load(_ION_MODEL_DIR), feats
    pipe = Pipeline(
        stages=[
            VectorAssembler(inputCols=ION_COMP_COLUMNS, outputCol="features"),
            RandomForestRegressor(
                featuresCol="features",
                labelCol="label_ion",
                predictionCol="pred_log10",
                numTrees=num_trees,
                maxDepth=12,
                seed=42,
            ),
        ]
    )
    model = pipe.fit(feats)
    _os.makedirs(_os.path.dirname(_ION_MODEL_DIR), exist_ok=True)
    model.write().overwrite().save(_ION_MODEL_DIR)
    return model, feats


@register("ml9_ion_reference_scoring", oracle=None)  # ML internals —
# rows-only; golden parity gated in tests/test_reference_parity.py
def ml9_ion_reference_scoring(spark, sf_dir):
    """§2.11 reference-parity scoring, ion tier: RF over the EXACT
    ion_comp 42-dim descriptor (ml8), corpus-scored; corr vs the
    reference's own golden predictions (prediction_result_ion_comp
    .json) gated in tests/test_reference_parity.py, floor above the
    11-feature analog model's measured 0.928."""
    model, feats = train_ion_comp_reference(spark)
    return model.transform(feats).select(
        "mp_id", F.round("pred_log10", 6).alias("pred_log10")
    )


# ---------------------------------------------------------------------------
# ml10: the reference's el_comp_st 29-dim descriptor
# (ml_prediction.py:190-220) — compositional slots exact, structural
# slots from the engine's declared site-featurizer kernels (the m16/
# m18/m20/m26/m28/m30 conventions: in-cell non-periodic geometry,
# documented analogs for OPSF/Voronoi/Ewald). Every slot hash-gated.
# ---------------------------------------------------------------------------

from oxi_diel_db_spark.functions import valence as VAL

#: The 29 el_comp_st column names, reference slot order
#: (ml_prediction.py:192-219).
EL_COMP_ST_COLUMNS: list[str] = [
    "std_x", "mean_block", "std_mass",          # ElementProperty :192-194
    "frac_d",                                    # ValenceOrbital :195
    "tm_frac",                                   # TMetalFraction :196
    "max_endiff", "mean_endiff",                 # ElectronegativityDiff :197-198
    "homo_energy", "lumo_energy",                # AtomicOrbitals :199-200
    "density",                                   # DensityFeatures :201
    "mean_min_dist", "std_min_dist",             # MinimumRelativeDistances :202-203
    "tet_max", "seesaw_max",                     # OPSiteFingerprint :204-205 (q_tet/q4 analogs)
    "ewald_max",                                 # EwaldSiteEnergy :206 (1/d proxy, m16)
    "vor_area_std_max", "vor_area_std_mean",     # VoronoiFingerprint :207-208 (dist-std analog)
    "vor_dist_min_min", "vor_dist_min_std",      # :209-210
    "g2_20_std", "g2_80_max", "g4_m1_mean",      # GaussianSymmFunc :211-213
    "lpd_ndvalence_mean",                        # LocalPropertyDifference :214
    "lpd_nvalence_min", "lpd_nvalence_std",      # :215-216
    "lpd_ndunfilled_mean",                       # :217
    "lpd_nunfilled_min", "lpd_nunfilled_mean",   # :218-219
    "lpd_gsmagmom_mean",                         # :220 (Hund unpaired analog)
]

_LPD_EL_PROPS = {
    "lpd_ndvalence": VAL.ND_VALENCE,
    "lpd_nvalence": VAL.N_VALENCE,
    "lpd_ndunfilled": VAL.ND_UNFILLED,
    "lpd_nunfilled": VAL.N_UNFILLED,
    "lpd_gsmagmom": VAL.UNPAIRED_ELECTRONS,
}


def el_comp_st_descriptors(spark, mats=None) -> "F.DataFrame":
    """(mp_id, formula, <29 descriptor columns>) — ml11 trains on this.
    Plan: one compositional projection (staged _agg) + five site-kernel
    mapInPandas passes reduced by per-material hash aggregates, joined
    on mp_id (1,278-row joins — broadcast territory). Nothing shuffles
    with corpus size except the site tables themselves, which are
    site-count bounded."""
    from oxi_diel_db_spark.operators import site_features as SF

    m = mats if mats is not None else M.materials(spark)
    staged = m.select(
        "mp_id", "formula", C._tok_counts("formula").alias("_toks")
    )
    enriched = staged.select(
        "mp_id",
        "formula",
        "_toks",
        C.enrich_agg(
            C._agg_tok_counts("formula", toks=F.col("_toks")), _EP_FIELDS
        ).alias("_enr"),
    )
    from oxi_diel_db_spark.functions.valence import sp_valence_fractions

    aox = AO.sp_atomic_orbitals("_enr")
    s3 = enriched.selectExpr(
        "*", f"{aox['_aosort']} AS _aosort", f"{aox['_tote']} AS _tote"
    ).selectExpr("*", f"{aox['_aoscan']} AS _aoscan")
    r6 = lambda e, n: f"round(({e}) + 1e-9D, 6) + 0.0D AS {n}"  # noqa: E731
    ep_x = C.sp_matminer_stats("_enr", "s.p_en")
    ep_b = C.sp_matminer_stats("_enr", "s.p_block")
    ep_m = C.sp_matminer_stats("_enr", "s.p_mass")
    ed = C.sp_en_diff_stats("_enr", "p_en")
    comp = s3.selectExpr(
        "mp_id",
        "formula",
        r6(ep_x["std"], "std_x"),
        r6(ep_b["mean"], "mean_block"),
        r6(ep_m["std"], "std_mass"),
        r6(sp_valence_fractions("_toks")["frac_d"], "frac_d"),
        r6(C.sp_tmetal_fraction("_toks"), "tm_frac"),
        r6(ed["max"], "max_endiff"),
        r6(ed["mean"], "mean_endiff"),
        f"{aox['homo_energy']} AS homo_energy",
        f"{aox['lumo_energy']} AS lumo_energy",
    )
    mass = C.mass_map_expr()
    dens = (
        m.select(
            "mp_id",
            F.col("structure.lattice.volume").alias("volume"),
            F.explode("structure.sites").alias("site"),
        )
        .select(
            "mp_id", "volume",
            F.element_at(F.col("site.species"), 1)["element"].alias("el"),
        )
        .groupBy("mp_id")
        .agg(
            _r6n(
                F.sum(mass[F.col("el")]) / F.any_value("volume")
                * F.lit(1.66053906660),
                "density",
            )
        )
    )
    # one scan + one repartition feeds all six site kernels (r8;
    # SF.shared_slim docstring) — localCheckpoint materializes the
    # spread projection so each mapInPandas reads cached partitions
    site_src = SF._spread(SF.shared_slim(m)).localCheckpoint(eager=True)
    mind = SF.site_min_distances(m, slim=site_src).groupBy("mp_id").agg(
        _r6n(F.avg("min_dist"), "mean_min_dist"),
        _r6n(F.stddev_pop("min_dist"), "std_min_dist"),
    )
    # exact-tessellation kernels for the OPSF/Voronoi slots (r10:
    # analogs superseded; reference ml_prediction.py:186-187,204-210).
    # r11: ONE fused pass serves both slot families — the 12 Å image
    # build is shared and the per-site rows checkpoint once, instead
    # of two kernels re-building images over the same projection
    exact = (
        _exact_site_features(m).localCheckpoint(eager=True)
    )
    ops = exact.groupBy("mp_id").agg(
        _r6n(F.max("tet"), "tet_max"),
        _r6n(F.max("seesaw"), "seesaw_max"),
    )
    se = SF.site_inverse_distance_energy(m, slim=site_src).groupBy("mp_id").agg(
        _r6n(F.max("inv_dist_energy"), "ewald_max")
    )
    vor = exact.groupBy("mp_id").agg(
        _r6n(F.max("area_std"), "vor_area_std_max"),
        _r6n(F.avg("area_std"), "vor_area_std_mean"),
        _r6n(F.min("dist_min"), "vor_dist_min_min"),
        _r6n(F.stddev_pop("dist_min"), "vor_dist_min_std"),
    )
    gsf = SF.gaussian_symm_full(m, slim=site_src).groupBy("mp_id").agg(
        _r6n(F.stddev_pop("g2_20"), "g2_20_std"),
        _r6n(F.max("g2_80"), "g2_80_max"),
        _r6n(F.avg("g4_m1"), "g4_m1_mean"),
    )
    lpd = SF.local_property_differences(m, _LPD_EL_PROPS, slim=site_src).groupBy("mp_id").agg(
        _r6n(F.avg("lpd_ndvalence"), "lpd_ndvalence_mean"),
        _r6n(F.min("lpd_nvalence"), "lpd_nvalence_min"),
        _r6n(F.stddev_pop("lpd_nvalence"), "lpd_nvalence_std"),
        _r6n(F.avg("lpd_ndunfilled"), "lpd_ndunfilled_mean"),
        _r6n(F.min("lpd_nunfilled"), "lpd_nunfilled_min"),
        _r6n(F.avg("lpd_nunfilled"), "lpd_nunfilled_mean"),
        _r6n(F.avg("lpd_gsmagmom"), "lpd_gsmagmom_mean"),
    )
    out = (
        comp
        .join(dens, "mp_id")
        .join(mind, "mp_id")
        .join(ops, "mp_id")
        .join(se, "mp_id")
        .join(vor, "mp_id")
        .join(gsf, "mp_id")
        .join(lpd, "mp_id")
    )
    return out.select("mp_id", "formula", *EL_COMP_ST_COLUMNS)


def _site_prop_case(table: dict[str, float], var: str = "el") -> str:
    whens = " ".join(
        f"WHEN '{el}' THEN {float(v)!r}" for el, v in sorted(table.items())
    )
    return f"CAST((CASE {var} {whens} ELSE NULL END) AS DOUBLE)"


#: Shared site/pair CTE prefix for the structural oracles (the proven
#: m16/m18/m20/m26/m28/m30 float shapes, verbatim).
def _site_ctes(mat_rel: str) -> str:
    """Shared site/pair CTE prefix for the structural oracles (the
    proven m16/m18/m20/m26/m28/m30 float shapes), parameterized over
    the material relation (full corpus or the md5 gate sample)."""
    return f"""
    s AS (
      SELECT mp_id, t.idx AS idx, structure.sites[t.idx].xyz AS xyz,
             structure.sites[t.idx].species[1].element AS el
      FROM {mat_rel}, UNNEST(range(1, len(structure.sites) + 1)) AS t(idx)
    ),
    p AS (
      SELECT a.mp_id, a.idx AS i, b.idx AS j, b.el AS el_j, a.el AS el_i,
             sqrt((b.xyz[1] - a.xyz[1]) * (b.xyz[1] - a.xyz[1])
                + (b.xyz[2] - a.xyz[2]) * (b.xyz[2] - a.xyz[2])
                + (b.xyz[3] - a.xyz[3]) * (b.xyz[3] - a.xyz[3])) AS d,
             b.xyz[1] - a.xyz[1] AS vx,
             b.xyz[2] - a.xyz[2] AS vy,
             b.xyz[3] - a.xyz[3] AS vz,
             (a.xyz[1] + b.xyz[1]) / 2 AS mx,
             (a.xyz[2] + b.xyz[2]) / 2 AS my,
             (a.xyz[3] + b.xyz[3]) / 2 AS mz
      FROM s a JOIN s b ON a.mp_id = b.mp_id AND a.idx <> b.idx
    ),
    mind AS (
      SELECT mp_id, i, MIN(d) AS md FROM p GROUP BY mp_id, i
    ),
    se AS (
      SELECT mp_id, i, SUM(1.0 / d) AS e FROM p GROUP BY mp_id, i
    ),
    g2 AS (
      SELECT mp_id, i,
             SUM(CASE WHEN d <= 6.0 THEN exp(-20.0 * (d / 6.0) * (d / 6.0)) ELSE 0.0 END) AS g2_20,
             SUM(CASE WHEN d <= 6.0 THEN exp(-80.0 * (d / 6.0) * (d / 6.0)) ELSE 0.0 END) AS g2_80
      FROM p GROUP BY mp_id, i
    ),
    nbr AS (
      SELECT mp_id, i, j, d, vx / d AS ux, vy / d AS uy, vz / d AS uz
      FROM p WHERE d <= 6.0
    ),
    g4p AS (
      SELECT n1.mp_id, n1.i,
             n1.ux * n2.ux + n1.uy * n2.uy + n1.uz * n2.uz AS cc,
             n1.d AS d1, n2.d AS d2
      FROM nbr n1 JOIN nbr n2
        ON n1.mp_id = n2.mp_id AND n1.i = n2.i AND n1.j < n2.j
    ),
    g4 AS (
      SELECT mp_id, i,
             COALESCE(SUM((1.0 - cc) * (1.0 - cc) * (1.0 - cc) * (1.0 - cc)
               * exp(-0.005 * (d1 * d1 + d2 * d2
                 + (d1 * d1 + d2 * d2 - 2.0 * d1 * d2 * cc)) / (6.0 * 6.0))), 0.0) AS g4_m1,
             COALESCE(SUM((1.0 + cc) * (1.0 + cc) * (1.0 + cc) * (1.0 + cc)
               * exp(-0.005 * (d1 * d1 + d2 * d2
                 + (d1 * d1 + d2 * d2 - 2.0 * d1 * d2 * cc)) / (6.0 * 6.0))), 0.0) AS g4_p1
      FROM g4p GROUP BY mp_id, i
    ),
    g4full AS (
      SELECT g2.mp_id, g2.i,
             COALESCE(g4.g4_m1, 0.0) AS g4_m1, COALESCE(g4.g4_p1, 0.0) AS g4_p1
      FROM g2 LEFT JOIN g4 ON g2.mp_id = g4.mp_id AND g2.i = g4.i
    ),
    nbr3 AS (
      SELECT mp_id, i, j, vx / d AS ux, vy / d AS uy, vz / d AS uz
      FROM p WHERE d <= 3.0
    ),
    ql AS (
      SELECT n1.mp_id, n1.i,
             n1.ux * n2.ux + n1.uy * n2.uy + n1.uz * n2.uz AS c
      FROM nbr3 n1 JOIN nbr3 n2 ON n1.mp_id = n2.mp_id AND n1.i = n2.i
    ),
    qs AS (
      SELECT mp_id, i,
             sqrt(GREATEST(SUM((35.0 * c2 * c2 - 30.0 * c2 + 3.0) / 8.0) / COUNT(*), 0.0)) AS q4,
             sqrt(GREATEST(SUM((231.0 * c2 * c2 * c2 - 315.0 * c2 * c2 + 105.0 * c2 - 5.0) / 16.0) / COUNT(*), 0.0)) AS q6
      FROM (SELECT mp_id, i, c * c AS c2 FROM ql)
      GROUP BY mp_id, i
    ),
    rk AS (
      SELECT mp_id, i, j, vx / d AS ux, vy / d AS uy, vz / d AS uz,
             ROW_NUMBER() OVER (PARTITION BY mp_id, i ORDER BY d, j) AS rn
      FROM p
    ),
    nn4 AS (SELECT * FROM rk WHERE rn <= 4),
    tp AS (
      SELECT a.mp_id, a.i,
             (a.ux * b.ux + a.uy * b.uy + a.uz * b.uz + CAST(1 AS DOUBLE) / 3) AS t
      FROM nn4 a JOIN nn4 b ON a.mp_id = b.mp_id AND a.i = b.i AND a.rn < b.rn
    ),
    tet AS (
      SELECT mp_id, i, 1.0 - CAST(3 AS DOUBLE) / 8 * SUM(t * t) AS q_tet
      FROM tp GROUP BY mp_id, i
    ),
    vcut AS (
      SELECT pc.mp_id, pc.i, pc.j, pc.d,
             MIN(sqrt((pc.mx - k.xyz[1]) * (pc.mx - k.xyz[1])
                    + (pc.my - k.xyz[2]) * (pc.my - k.xyz[2])
                    + (pc.mz - k.xyz[3]) * (pc.mz - k.xyz[3]))) AS min_k
      FROM (SELECT * FROM p WHERE d <= 6.0) pc
      LEFT JOIN s k
        ON k.mp_id = pc.mp_id AND k.idx <> pc.i AND k.idx <> pc.j
      GROUP BY pc.mp_id, pc.i, pc.j, pc.d
    ),
    vkept AS (
      SELECT * FROM vcut WHERE min_k IS NULL OR min_k > d / 2 + 1e-06
    ),
    vor AS (
      SELECT s.mp_id, s.idx AS i,
             COUNT(vkept.j) AS vor_cn,
             AVG(vkept.d) AS mean_vd,
             MIN(vkept.d) AS min_vd,
             MAX(vkept.d) AS max_vd,
             STDDEV_POP(vkept.d) AS std_vd,
             STDDEV_POP(1.0 / (vkept.d * vkept.d)) AS std_inv2
      FROM s LEFT JOIN vkept ON vkept.mp_id = s.mp_id AND vkept.i = s.idx
      GROUP BY s.mp_id, s.idx
    ),
    nn2 AS (
      SELECT r1.mp_id, r1.i,
             r1.ux * r2.ux + r1.uy * r2.uy + r1.uz * r2.uz AS cos_nn2
      FROM rk r1 JOIN rk r2
        ON r1.mp_id = r2.mp_id AND r1.i = r2.i AND r1.rn = 1 AND r2.rn = 2
    ),
    nn3 AS (
      SELECT r1.mp_id, r1.i,
             1.0 - abs(r1.ux * (r2.uy * r3.uz - r2.uz * r3.uy)
                   - r1.uy * (r2.ux * r3.uz - r2.uz * r3.ux)
                   + r1.uz * (r2.ux * r3.uy - r2.uy * r3.ux)) AS planar3
      FROM rk r1
      JOIN rk r2 ON r1.mp_id = r2.mp_id AND r1.i = r2.i AND r2.rn = 2
      JOIN rk r3 ON r1.mp_id = r3.mp_id AND r1.i = r3.i AND r3.rn = 3
      WHERE r1.rn = 1
    )
"""


_SITE_CTES = _site_ctes(_MAT)


def _sql_lpd_cte(props: dict[str, dict[str, float]]) -> str:
    """Per-site multi-property LPD CTE over the shared pair CTE ``p``
    (m26's proven float shape, one numerator per property)."""
    nums = ",\n             ".join(
        f"SUM(CASE WHEN d <= 5.0 THEN (1.0 / (d * d)) * "
        f"abs({_site_prop_case(t, 'el_i')} - {_site_prop_case(t, 'el_j')}) "
        f"ELSE 0.0 END) AS num_{n}"
        for n, t in props.items()
    )
    vals = ",\n             ".join(
        f"CASE WHEN den > 0 THEN num_{n} / den ELSE 0.0 END AS {n}"
        for n in props
    )
    return f"""
    lpd_raw AS (
      SELECT mp_id, i,
             {nums},
             SUM(CASE WHEN d <= 5.0 THEN 1.0 / (d * d) ELSE 0.0 END) AS den
      FROM p GROUP BY mp_id, i
    ),
    lpd AS (
      SELECT mp_id, i,
             {vals}
      FROM lpd_raw
    )
"""


def _ml10_oracle() -> str:
    from oxi_diel_db_spark.functions.valence import sql_valence_fractions

    ep_x = C.sql_matminer_stats("m.formula", C.PAULING_EN, agg="m.agg")
    ep_b = C.sql_matminer_stats("m.formula", C.BLOCK, agg="m.agg")
    ep_m = C.sql_matminer_stats("m.formula", C.ATOMIC_MASS, agg="m.agg")
    ed = C.sql_en_diff_stats("m.formula", agg="m.agg")
    comp_sel = ",\n           ".join(
        [
            _sql_r6n(ep_x["std"], "std_x"),
            _sql_r6n(ep_b["mean"], "mean_block"),
            _sql_r6n(ep_m["std"], "std_mass"),
            _sql_r6n(sql_valence_fractions("m.formula")["frac_d"], "frac_d"),
            _sql_r6n(C.sql_tmetal_fraction("m.formula"), "tm_frac"),
            _sql_r6n(ed["max"], "max_endiff"),
            _sql_r6n(ed["mean"], "mean_endiff"),
        ]
    )
    from oxi_diel_db_spark.queries._site_sql import (
        opsf_site_ctes,
        vor_site_ctes,
    )

    return f"""
    WITH ao AS ({AO.sql_atomic_orbitals(_MAT_SAMPLE)}),
    staged AS (
      SELECT mp_id, formula, {C.sql_agg_tok_counts('formula')} AS agg
      FROM {_MAT_SAMPLE}
    ),
    {_site_ctes(_MAT_SAMPLE)},
    {vor_site_ctes(_MAT_SAMPLE)},
    {opsf_site_ctes(_MAT_SAMPLE)},
    {_sql_lpd_cte(_LPD_EL_PROPS)},
    dens AS (
      SELECT mp_id, {_sql_r6n(
          "SUM(" + _site_prop_case(C.ATOMIC_MASS, "el") + ") / ANY_VALUE(vol) * 1.66053906660",
          "density")}
      FROM (
        SELECT s.mp_id, s.el, x.vol
        FROM s JOIN (SELECT mp_id, structure.lattice.volume AS vol FROM {_MAT_SAMPLE}) x
          ON s.mp_id = x.mp_id
      ) GROUP BY mp_id
    ),
    mind_m AS (
      SELECT mp_id, {_sql_r6n('AVG(md)', 'mean_min_dist')},
             {_sql_r6n('STDDEV_POP(md)', 'std_min_dist')}
      FROM mind GROUP BY mp_id
    ),
    ops_m AS (
      -- exact OPSiteFingerprint slots (opsf_site chain; r10)
      SELECT mp_id, {_sql_r6n('MAX(tet)', 'tet_max')},
             {_sql_r6n('MAX(seesaw)', 'seesaw_max')}
      FROM opsf_site GROUP BY mp_id
    ),
    se_m AS (
      SELECT mp_id, {_sql_r6n('MAX(e)', 'ewald_max')} FROM se GROUP BY mp_id
    ),
    vor_m AS (
      -- exact tessellation slots (vor_site chain; r10)
      SELECT mp_id, {_sql_r6n('MAX(area_std)', 'vor_area_std_max')},
             {_sql_r6n('AVG(area_std)', 'vor_area_std_mean')},
             {_sql_r6n('MIN(dist_min)', 'vor_dist_min_min')},
             {_sql_r6n('STDDEV_POP(dist_min)', 'vor_dist_min_std')}
      FROM vor_site GROUP BY mp_id
    ),
    gsf_m AS (
      SELECT g2.mp_id, {_sql_r6n('STDDEV_POP(g2.g2_20)', 'g2_20_std')},
             {_sql_r6n('MAX(g2.g2_80)', 'g2_80_max')},
             {_sql_r6n('AVG(g4full.g4_m1)', 'g4_m1_mean')}
      FROM g2 JOIN g4full ON g2.mp_id = g4full.mp_id AND g2.i = g4full.i
      GROUP BY g2.mp_id
    ),
    lpd_m AS (
      SELECT mp_id, {_sql_r6n('AVG(lpd_ndvalence)', 'lpd_ndvalence_mean')},
             {_sql_r6n('MIN(lpd_nvalence)', 'lpd_nvalence_min')},
             {_sql_r6n('STDDEV_POP(lpd_nvalence)', 'lpd_nvalence_std')},
             {_sql_r6n('AVG(lpd_ndunfilled)', 'lpd_ndunfilled_mean')},
             {_sql_r6n('MIN(lpd_nunfilled)', 'lpd_nunfilled_min')},
             {_sql_r6n('AVG(lpd_nunfilled)', 'lpd_nunfilled_mean')},
             {_sql_r6n('AVG(lpd_gsmagmom)', 'lpd_gsmagmom_mean')}
      FROM lpd GROUP BY mp_id
    )
    SELECT m.mp_id,
           {comp_sel},
           ao.homo_energy, ao.lumo_energy,
           dens.density,
           mind_m.mean_min_dist, mind_m.std_min_dist,
           ops_m.tet_max, ops_m.seesaw_max,
           se_m.ewald_max,
           vor_m.vor_area_std_max, vor_m.vor_area_std_mean,
           vor_m.vor_dist_min_min, vor_m.vor_dist_min_std,
           gsf_m.g2_20_std, gsf_m.g2_80_max, gsf_m.g4_m1_mean,
           lpd_m.lpd_ndvalence_mean, lpd_m.lpd_nvalence_min,
           lpd_m.lpd_nvalence_std, lpd_m.lpd_ndunfilled_mean,
           lpd_m.lpd_nunfilled_min, lpd_m.lpd_nunfilled_mean,
           lpd_m.lpd_gsmagmom_mean
    FROM staged m
    LEFT JOIN ao ON m.mp_id = ao.mp_id
    JOIN dens ON m.mp_id = dens.mp_id
    JOIN mind_m ON m.mp_id = mind_m.mp_id
    JOIN ops_m ON m.mp_id = ops_m.mp_id
    JOIN se_m ON m.mp_id = se_m.mp_id
    JOIN vor_m ON m.mp_id = vor_m.mp_id
    JOIN gsf_m ON m.mp_id = gsf_m.mp_id
    JOIN lpd_m ON m.mp_id = lpd_m.mp_id
    """


@register("ml10_el_st_descriptors", oracle=_ml10_oracle())
def ml10_el_st_descriptors(spark, sf_dir):
    """§2.11/§2.9: the reference's el_comp_st 29-dim descriptor
    (ml_prediction.py:190-220), reference slot order. Compositional
    slots exact; the OPSF/Voronoi slots are the EXACT kernels as of
    r10 (m37 periodic tessellation face statistics, m38 motif
    fingerprints — analogs superseded; Ewald keeps the documented 1/d
    proxy, GSmagmom the Hund count). Gated on the md5-'0%' material
    sample because the oracle re-derives the full tessellation
    relationally (constant gate cost at any corpus scale; the
    compositional families stay full-corpus-gated via ml6), while the
    library function feeds ml11 training over the full corpus."""
    return el_comp_st_descriptors(
        spark, M.materials(spark).filter(F.md5("mp_id").startswith("0"))
    ).drop("formula")


# ---------------------------------------------------------------------------
# ml11: score the corpus on the exact el_comp_st descriptor set
# ---------------------------------------------------------------------------

_ELST_DESC_PARQUET = _os.path.join(_SCRATCH, "ref_el_st_descriptors.parquet")
_ELST_MODEL_DIR = _os.path.join(_SCRATCH, "models", "ref_el_st_rf60")


def materialized_el_st_descriptors(spark):
    if not _os.path.isdir(_ELST_DESC_PARQUET):
        el_comp_st_descriptors(spark).write.mode("overwrite").parquet(
            _ELST_DESC_PARQUET
        )
    return spark.read.parquet(_ELST_DESC_PARQUET)


def train_el_st_reference(spark, num_trees: int = 60):
    """RandomForest on the reference's el_comp_st descriptor (exact
    compositional + declared-analog structural slots), pop-std scaled.
    NULL structural slots (e.g. q4 in a sparse cell) drop the row,
    matching the reference's NaN-row handling in training."""
    from pyspark.ml import Pipeline, PipelineModel
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.regression import RandomForestRegressor

    from oxi_diel_db_spark.ml import comp_model as CM
    from oxi_diel_db_spark.ml.pipeline import scale_features_pop

    labels = CM._labels(M.materials(spark)).select("mp_id", "label_el")
    feats = scale_features_pop(
        materialized_el_st_descriptors(spark).join(labels, "mp_id"),
        EL_COMP_ST_COLUMNS,
    ).dropna(subset=EL_COMP_ST_COLUMNS + ["label_el"])
    if _os.path.isdir(_ELST_MODEL_DIR):
        return PipelineModel.load(_ELST_MODEL_DIR), feats
    pipe = Pipeline(
        stages=[
            VectorAssembler(inputCols=EL_COMP_ST_COLUMNS, outputCol="features"),
            RandomForestRegressor(
                featuresCol="features",
                labelCol="label_el",
                predictionCol="pred_log10",
                numTrees=num_trees,
                maxDepth=12,
                seed=42,
            ),
        ]
    )
    model = pipe.fit(feats)
    _os.makedirs(_os.path.dirname(_ELST_MODEL_DIR), exist_ok=True)
    model.write().overwrite().save(_ELST_MODEL_DIR)
    return model, feats


@register("ml11_el_st_reference_scoring", oracle=None)  # ML internals —
# rows-only; golden parity gated in tests/test_reference_parity.py
def ml11_el_st_reference_scoring(spark, sf_dir):
    """§2.11 reference-parity scoring, el structural tier: RF over the
    el_comp_st 29-dim descriptor (ml10); corr vs the reference's golden
    prediction_result_el_comp_st.json gated in
    tests/test_reference_parity.py."""
    model, feats = train_el_st_reference(spark)
    return model.transform(feats).select(
        "mp_id", F.round("pred_log10", 6).alias("pred_log10")
    )


# ---------------------------------------------------------------------------
# ml12: the reference's ion_comp_st 45-dim descriptor
# (ml_prediction.py:230-276) — the heaviest descriptor: composition +
# density/packing + structural heterogeneity + 8 orientational-order
# slots + Voronoi/GSF/Ewald tiers + 19 LocalPropertyDifference slots.
# Analog conventions continue the declared engine kernels; the three
# CN-affinity OP slots (single-bond / pentagonal / octahedral /
# symmetry-weighted) use exp(−(CN−k)²/2) over the Voronoi CN, the
# angular slots use the true two/three-nearest-bond geometry
# (cos_nn2 / planar3), and GSvolume_pa / SpaceGroupNumber ride the
# Cordero-sphere-volume / group-number documented stand-ins.
# ---------------------------------------------------------------------------

_COS150 = -0.8660254037844387  # cos(150°) = −√3/2

ION_COMP_ST_COLUMNS: list[str] = [
    "std_row", "mean_thermcond", "std_melting",      # ElementProperty :232-234
    "tm_frac",                                        # TMetalFraction :235
    "gap_ao",                                         # AtomicOrbitals :236
    "density", "packing_fraction",                    # DensityFeatures :237-238
    "nbr_var_mean", "nbr_var_avg_dev",                # StructuralHeterogeneity :239-240
    "sgl_bd_mean", "bent150_mean", "linear_mean",     # OPSiteFingerprint :241-243
    "trig_planar_mean", "pent_cn5_std",               # :244-245
    "oct_cn6_max", "oct_cn6_std", "q6_cn12_mean",     # :246-248
    "ewald_max",                                      # EwaldSiteEnergy :249 (1/d proxy)
    "sym_w4_std", "vol_max_mean", "area_std_mean",    # VoronoiFingerprint :250-252
    "area_min_std", "area_max_min", "dist_std_mean",  # :253-255
    "g2_80_min", "g4_p1_std",                         # GaussianSymmFunc :256-257
    "lpd_number_max", "lpd_mendeleev_max", "lpd_mendeleev_min",   # LPD :258-260
    "lpd_atomicweight_max", "lpd_atomicweight_mean",  # :261-262
    "lpd_meltingt_mean", "lpd_row_max", "lpd_en_min", # :263-265
    "lpd_nvalence_std", "lpd_nsunfilled_mean",        # :266-267
    "lpd_ndunfilled_max", "lpd_ndunfilled_std",       # :268-269
    "lpd_nunfilled_max", "lpd_nunfilled_min",         # :270-271
    "lpd_nunfilled_mean", "lpd_nunfilled_std",        # :272-273
    "lpd_gsvol_max", "lpd_gsvol_min",                 # :274-275 (Cordero-volume analog)
    "lpd_sg_max",                                     # :276 (group-number stand-in)
]

_LPD_ION_PROPS = {
    "lpd_number": VAL.ATOMIC_NUMBER,
    "lpd_mendeleev": MENDELEEV_NO,
    "lpd_atomicweight": C.ATOMIC_MASS,
    "lpd_meltingt": MELTING_POINT,
    "lpd_row": C.PERIOD,
    "lpd_en": C.PAULING_EN,
    "lpd_nvalence": VAL.N_VALENCE,
    "lpd_nsunfilled": VAL.NS_UNFILLED,
    "lpd_ndunfilled": VAL.ND_UNFILLED,
    "lpd_nunfilled": VAL.N_UNFILLED,
    "lpd_gsvol": C.GS_VOLUME,
    "lpd_sg": C.GROUP,
}


def _cn_affinity(cn_col, k: float):
    c = cn_col.cast("double") - F.lit(k)
    return F.exp(-(c * c) / F.lit(2.0))


def _sql_cn_affinity(cn: str, k: float) -> str:
    c = f"(CAST({cn} AS DOUBLE) - {k!r})"
    return f"exp(-({c} * {c}) / 2.0)"


def ion_comp_st_descriptors(spark, mats=None) -> "F.DataFrame":
    """(mp_id, formula, <45 descriptor columns>) — ml13 trains on this.
    Same plan family as ml10: one compositional projection + the site
    kernels reduced per material and joined on mp_id."""
    from oxi_diel_db_spark.operators import site_features as SF

    m = mats if mats is not None else M.materials(spark)
    staged = m.select(
        "mp_id", "formula", C._tok_counts("formula").alias("_toks")
    )
    enriched = staged.select(
        "mp_id",
        "formula",
        "_toks",
        C.enrich_agg(
            C._agg_tok_counts("formula", toks=F.col("_toks")), _EP_FIELDS
        ).alias("_enr"),
    )
    aox = AO.sp_atomic_orbitals("_enr")
    s3 = enriched.selectExpr(
        "*", f"{aox['_aosort']} AS _aosort", f"{aox['_tote']} AS _tote"
    ).selectExpr("*", f"{aox['_aoscan']} AS _aoscan")
    r6 = lambda e, n: f"round(({e}) + 1e-9D, 6) + 0.0D AS {n}"  # noqa: E731
    ep_r = C.sp_matminer_stats("_enr", "s.p_row")
    ep_t = C.sp_matminer_stats("_enr", "s.p_thermcond")
    ep_m = C.sp_matminer_stats("_enr", "s.p_melting")
    comp = s3.selectExpr(
        "mp_id",
        "formula",
        r6(ep_r["std"], "std_row"),
        r6(ep_t["mean"], "mean_thermcond"),
        r6(ep_m["std"], "std_melting"),
        r6(C.sp_tmetal_fraction("_toks"), "tm_frac"),
        f"{aox['gap_ao']} AS gap_ao",
    )
    mass = C.mass_map_expr()
    rad = C.radius_map_expr()
    import math as _m

    dens = (
        m.select(
            "mp_id",
            F.col("structure.lattice.volume").alias("volume"),
            F.explode("structure.sites").alias("site"),
        )
        .select(
            "mp_id", "volume",
            F.element_at(F.col("site.species"), 1)["element"].alias("el"),
        )
        .groupBy("mp_id")
        .agg(
            _r6n(
                F.sum(mass[F.col("el")]) / F.any_value("volume")
                * F.lit(1.66053906660),
                "density",
            ),
            _r6n(
                F.sum(F.lit(4.0 / 3.0 * _m.pi) * F.pow(rad[F.col("el")], 3))
                / F.any_value("volume"),
                "packing_fraction",
            ),
        )
    )
    site_src = SF._spread(SF.shared_slim(m)).localCheckpoint(eager=True)
    # exact-tessellation kernels for the OPSF/Voronoi/heterogeneity
    # slots (r10: analogs superseded; reference ml_prediction.py:
    # 186-187,251-269); r11: ONE fused OPSF+Voronoi pass, checkpointed
    # because het's two-pass mean/avg-dev join reads the per-site
    # table twice and ops/vora once more each — Spark doesn't share
    # subplans across self-joins (SCALE.md §3)
    vor_site = _exact_site_features(m).localCheckpoint(eager=True)
    # StructuralHeterogeneity: per-site coefficient of variation of the
    # TRUE Voronoi face distances; mean and mean-absolute-deviation
    # over sites (two-pass for the avg_dev)
    v = vor_site.select(
        "mp_id", (F.col("dist_std") / F.col("dist_mean")).alias("v")
    )
    vmean = v.groupBy("mp_id").agg(F.avg("v").alias("vm"))
    het = (
        v.join(vmean, "mp_id")
        .groupBy("mp_id")
        .agg(
            _r6n(F.any_value("vm"), "nbr_var_mean"),
            _r6n(F.avg(F.abs(F.col("v") - F.col("vm"))), "nbr_var_avg_dev"),
        )
    )
    ops = vor_site.groupBy("mp_id").agg(
        _r6n(F.avg("lin"), "linear_mean"),
        _r6n(F.avg("bent150"), "bent150_mean"),
        _r6n(F.avg("tri_plan"), "trig_planar_mean"),
        _r6n(F.avg("q6"), "q6_cn12_mean"),
        _r6n(F.avg("sgl_bd"), "sgl_bd_mean"),
        _r6n(F.stddev_pop("pent_plan"), "pent_cn5_std"),
        _r6n(F.max("oct"), "oct_cn6_max"),
        _r6n(F.stddev_pop("oct"), "oct_cn6_std"),
    )
    vora = vor_site.groupBy("mp_id").agg(
        _r6n(F.stddev_pop("symw4"), "sym_w4_std"),
        _r6n(F.avg("vol_max"), "vol_max_mean"),
        _r6n(F.avg("area_std"), "area_std_mean"),
        _r6n(F.stddev_pop("area_min"), "area_min_std"),
        _r6n(F.min("area_max"), "area_max_min"),
        _r6n(F.avg("dist_std"), "dist_std_mean"),
    )
    se = SF.site_inverse_distance_energy(m, slim=site_src).groupBy("mp_id").agg(
        _r6n(F.max("inv_dist_energy"), "ewald_max")
    )
    gsf = SF.gaussian_symm_full(m, slim=site_src).groupBy("mp_id").agg(
        _r6n(F.min("g2_80"), "g2_80_min"),
        _r6n(F.stddev_pop("g4_p1"), "g4_p1_std"),
    )
    lpd = SF.local_property_differences(m, _LPD_ION_PROPS, slim=site_src).groupBy("mp_id").agg(
        _r6n(F.max("lpd_number"), "lpd_number_max"),
        _r6n(F.max("lpd_mendeleev"), "lpd_mendeleev_max"),
        _r6n(F.min("lpd_mendeleev"), "lpd_mendeleev_min"),
        _r6n(F.max("lpd_atomicweight"), "lpd_atomicweight_max"),
        _r6n(F.avg("lpd_atomicweight"), "lpd_atomicweight_mean"),
        _r6n(F.avg("lpd_meltingt"), "lpd_meltingt_mean"),
        _r6n(F.max("lpd_row"), "lpd_row_max"),
        _r6n(F.min("lpd_en"), "lpd_en_min"),
        _r6n(F.stddev_pop("lpd_nvalence"), "lpd_nvalence_std"),
        _r6n(F.avg("lpd_nsunfilled"), "lpd_nsunfilled_mean"),
        _r6n(F.max("lpd_ndunfilled"), "lpd_ndunfilled_max"),
        _r6n(F.stddev_pop("lpd_ndunfilled"), "lpd_ndunfilled_std"),
        _r6n(F.max("lpd_nunfilled"), "lpd_nunfilled_max"),
        _r6n(F.min("lpd_nunfilled"), "lpd_nunfilled_min"),
        _r6n(F.avg("lpd_nunfilled"), "lpd_nunfilled_mean"),
        _r6n(F.stddev_pop("lpd_nunfilled"), "lpd_nunfilled_std"),
        _r6n(F.max("lpd_gsvol"), "lpd_gsvol_max"),
        _r6n(F.min("lpd_gsvol"), "lpd_gsvol_min"),
        _r6n(F.max("lpd_sg"), "lpd_sg_max"),
    )
    out = (
        comp
        .join(dens, "mp_id")
        .join(het, "mp_id")
        .join(ops, "mp_id")
        .join(vora, "mp_id")
        .join(se, "mp_id")
        .join(gsf, "mp_id")
        .join(lpd, "mp_id")
    )
    return out.select("mp_id", "formula", *ION_COMP_ST_COLUMNS)


def _ml12_oracle() -> str:
    ep_r = C.sql_matminer_stats("m.formula", C.PERIOD, agg="m.agg")
    ep_t = C.sql_matminer_stats("m.formula", THERMAL_CONDUCTIVITY, agg="m.agg")
    ep_m = C.sql_matminer_stats("m.formula", MELTING_POINT, agg="m.agg")
    comp_sel = ",\n           ".join(
        [
            _sql_r6n(ep_r["std"], "std_row"),
            _sql_r6n(ep_t["mean"], "mean_thermcond"),
            _sql_r6n(ep_m["std"], "std_melting"),
            _sql_r6n(C.sql_tmetal_fraction("m.formula"), "tm_frac"),
        ]
    )
    from oxi_diel_db_spark.queries._site_sql import (
        opsf_site_ctes,
        vor_site_ctes,
    )

    return f"""
    WITH ao AS ({AO.sql_atomic_orbitals(_MAT_SAMPLE)}),
    staged AS (
      SELECT mp_id, formula, {C.sql_agg_tok_counts('formula')} AS agg
      FROM {_MAT_SAMPLE}
    ),
    {_site_ctes(_MAT_SAMPLE)},
    {vor_site_ctes(_MAT_SAMPLE)},
    {opsf_site_ctes(_MAT_SAMPLE)},
    {_sql_lpd_cte(_LPD_ION_PROPS)},
    dens AS (
      SELECT mp_id,
             {_sql_r6n("SUM(" + _site_prop_case(C.ATOMIC_MASS, "el") + ") / ANY_VALUE(vol) * 1.66053906660", "density")},
             {_sql_r6n("SUM(4.0 / 3.0 * pi() * pow(" + _site_prop_case(C.COVALENT_RADIUS, "el") + ", 3)) / ANY_VALUE(vol)", "packing_fraction")}
      FROM (
        SELECT s.mp_id, s.el, x.vol
        FROM s JOIN (SELECT mp_id, structure.lattice.volume AS vol FROM {_MAT_SAMPLE}) x
          ON s.mp_id = x.mp_id
      ) GROUP BY mp_id
    ),
    hv AS (
      -- exact per-site face-distance variation (vor_site chain; r10)
      SELECT mp_id, i, dist_std / dist_mean AS v FROM vor_site
    ),
    hvm AS (SELECT mp_id, AVG(v) AS vm FROM hv GROUP BY mp_id),
    het AS (
      SELECT hv.mp_id, {_sql_r6n('ANY_VALUE(hvm.vm)', 'nbr_var_mean')},
             {_sql_r6n('AVG(ABS(hv.v - hvm.vm))', 'nbr_var_avg_dev')}
      FROM hv JOIN hvm ON hv.mp_id = hvm.mp_id GROUP BY hv.mp_id
    ),
    ops_m AS (
      -- exact OPSiteFingerprint slots (opsf_site chain; r10)
      SELECT mp_id,
             {_sql_r6n('AVG(lin)', 'linear_mean')},
             {_sql_r6n('AVG(bent150)', 'bent150_mean')},
             {_sql_r6n('AVG(tri_plan)', 'trig_planar_mean')},
             {_sql_r6n('AVG(q6)', 'q6_cn12_mean')},
             {_sql_r6n('AVG(sgl_bd)', 'sgl_bd_mean')},
             {_sql_r6n('STDDEV_POP(pent_plan)', 'pent_cn5_std')},
             {_sql_r6n('MAX(oct)', 'oct_cn6_max')},
             {_sql_r6n('STDDEV_POP(oct)', 'oct_cn6_std')}
      FROM opsf_site GROUP BY mp_id
    ),
    vora AS (
      -- exact tessellation slots (vor_site chain; r10)
      SELECT mp_id,
             {_sql_r6n('STDDEV_POP(symw4)', 'sym_w4_std')},
             {_sql_r6n('AVG(vol_max)', 'vol_max_mean')},
             {_sql_r6n('AVG(area_std)', 'area_std_mean')},
             {_sql_r6n('STDDEV_POP(area_min)', 'area_min_std')},
             {_sql_r6n('MIN(area_max)', 'area_max_min')},
             {_sql_r6n('AVG(dist_std)', 'dist_std_mean')}
      FROM vor_site GROUP BY mp_id
    ),
    se_m AS (
      SELECT mp_id, {_sql_r6n('MAX(e)', 'ewald_max')} FROM se GROUP BY mp_id
    ),
    gsf_m AS (
      SELECT g2.mp_id, {_sql_r6n('MIN(g2.g2_80)', 'g2_80_min')},
             {_sql_r6n('STDDEV_POP(g4full.g4_p1)', 'g4_p1_std')}
      FROM g2 JOIN g4full ON g2.mp_id = g4full.mp_id AND g2.i = g4full.i
      GROUP BY g2.mp_id
    ),
    lpd_m AS (
      SELECT mp_id,
             {_sql_r6n('MAX(lpd_number)', 'lpd_number_max')},
             {_sql_r6n('MAX(lpd_mendeleev)', 'lpd_mendeleev_max')},
             {_sql_r6n('MIN(lpd_mendeleev)', 'lpd_mendeleev_min')},
             {_sql_r6n('MAX(lpd_atomicweight)', 'lpd_atomicweight_max')},
             {_sql_r6n('AVG(lpd_atomicweight)', 'lpd_atomicweight_mean')},
             {_sql_r6n('AVG(lpd_meltingt)', 'lpd_meltingt_mean')},
             {_sql_r6n('MAX(lpd_row)', 'lpd_row_max')},
             {_sql_r6n('MIN(lpd_en)', 'lpd_en_min')},
             {_sql_r6n('STDDEV_POP(lpd_nvalence)', 'lpd_nvalence_std')},
             {_sql_r6n('AVG(lpd_nsunfilled)', 'lpd_nsunfilled_mean')},
             {_sql_r6n('MAX(lpd_ndunfilled)', 'lpd_ndunfilled_max')},
             {_sql_r6n('STDDEV_POP(lpd_ndunfilled)', 'lpd_ndunfilled_std')},
             {_sql_r6n('MAX(lpd_nunfilled)', 'lpd_nunfilled_max')},
             {_sql_r6n('MIN(lpd_nunfilled)', 'lpd_nunfilled_min')},
             {_sql_r6n('AVG(lpd_nunfilled)', 'lpd_nunfilled_mean')},
             {_sql_r6n('STDDEV_POP(lpd_nunfilled)', 'lpd_nunfilled_std')},
             {_sql_r6n('MAX(lpd_gsvol)', 'lpd_gsvol_max')},
             {_sql_r6n('MIN(lpd_gsvol)', 'lpd_gsvol_min')},
             {_sql_r6n('MAX(lpd_sg)', 'lpd_sg_max')}
      FROM lpd GROUP BY mp_id
    )
    SELECT m.mp_id,
           {comp_sel},
           ao.gap_ao,
           dens.density, dens.packing_fraction,
           het.nbr_var_mean, het.nbr_var_avg_dev,
           ops_m.sgl_bd_mean, ops_m.bent150_mean, ops_m.linear_mean,
           ops_m.trig_planar_mean, ops_m.pent_cn5_std,
           ops_m.oct_cn6_max, ops_m.oct_cn6_std, ops_m.q6_cn12_mean,
           se_m.ewald_max,
           vora.sym_w4_std, vora.vol_max_mean, vora.area_std_mean,
           vora.area_min_std, vora.area_max_min, vora.dist_std_mean,
           gsf_m.g2_80_min, gsf_m.g4_p1_std,
           lpd_m.lpd_number_max, lpd_m.lpd_mendeleev_max, lpd_m.lpd_mendeleev_min,
           lpd_m.lpd_atomicweight_max, lpd_m.lpd_atomicweight_mean,
           lpd_m.lpd_meltingt_mean, lpd_m.lpd_row_max, lpd_m.lpd_en_min,
           lpd_m.lpd_nvalence_std, lpd_m.lpd_nsunfilled_mean,
           lpd_m.lpd_ndunfilled_max, lpd_m.lpd_ndunfilled_std,
           lpd_m.lpd_nunfilled_max, lpd_m.lpd_nunfilled_min,
           lpd_m.lpd_nunfilled_mean, lpd_m.lpd_nunfilled_std,
           lpd_m.lpd_gsvol_max, lpd_m.lpd_gsvol_min, lpd_m.lpd_sg_max
    FROM staged m
    LEFT JOIN ao ON m.mp_id = ao.mp_id
    JOIN dens ON m.mp_id = dens.mp_id
    JOIN het ON m.mp_id = het.mp_id
    JOIN ops_m ON m.mp_id = ops_m.mp_id
    JOIN vora ON m.mp_id = vora.mp_id
    JOIN se_m ON m.mp_id = se_m.mp_id
    JOIN gsf_m ON m.mp_id = gsf_m.mp_id
    JOIN lpd_m ON m.mp_id = lpd_m.mp_id
    """


@register("ml12_ion_st_descriptors", oracle=_ml12_oracle())
def ml12_ion_st_descriptors(spark, sf_dir):
    """§2.11/§2.9: the reference's ion_comp_st 45-dim descriptor
    (ml_prediction.py:230-276), reference slot order. The eight OPSF
    slots, six Voronoi slots and the two StructuralHeterogeneity slots
    are the EXACT kernels as of r10 (m37/m38 — analogs superseded).
    Gated on the md5-'0%' sample (oracle re-derives the tessellation
    relationally; ml8 keeps the compositional families full-corpus);
    the library function feeds ml13 training over the full corpus."""
    return ion_comp_st_descriptors(
        spark, M.materials(spark).filter(F.md5("mp_id").startswith("0"))
    ).drop("formula")


# ---------------------------------------------------------------------------
# ml13: score the corpus on the exact ion_comp_st descriptor set
# ---------------------------------------------------------------------------

_IONST_DESC_PARQUET = _os.path.join(_SCRATCH, "ref_ion_st_descriptors.parquet")
_IONST_MODEL_DIR = _os.path.join(_SCRATCH, "models", "ref_ion_st_rf60")


def materialized_ion_st_descriptors(spark):
    if not _os.path.isdir(_IONST_DESC_PARQUET):
        ion_comp_st_descriptors(spark).write.mode("overwrite").parquet(
            _IONST_DESC_PARQUET
        )
    return spark.read.parquet(_IONST_DESC_PARQUET)


def train_ion_st_reference(spark, num_trees: int = 60):
    from pyspark.ml import Pipeline, PipelineModel
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.regression import RandomForestRegressor

    from oxi_diel_db_spark.ml import comp_model as CM
    from oxi_diel_db_spark.ml.pipeline import scale_features_pop

    labels = CM._labels(M.materials(spark)).select("mp_id", "label_ion")
    feats = scale_features_pop(
        materialized_ion_st_descriptors(spark).join(labels, "mp_id"),
        ION_COMP_ST_COLUMNS,
    ).dropna(subset=ION_COMP_ST_COLUMNS + ["label_ion"])
    if _os.path.isdir(_IONST_MODEL_DIR):
        return PipelineModel.load(_IONST_MODEL_DIR), feats
    pipe = Pipeline(
        stages=[
            VectorAssembler(inputCols=ION_COMP_ST_COLUMNS, outputCol="features"),
            RandomForestRegressor(
                featuresCol="features",
                labelCol="label_ion",
                predictionCol="pred_log10",
                numTrees=num_trees,
                maxDepth=12,
                seed=42,
            ),
        ]
    )
    model = pipe.fit(feats)
    _os.makedirs(_os.path.dirname(_IONST_MODEL_DIR), exist_ok=True)
    model.write().overwrite().save(_IONST_MODEL_DIR)
    return model, feats


@register("ml13_ion_st_reference_scoring", oracle=None)  # ML internals —
# rows-only; golden parity gated in tests/test_reference_parity.py
def ml13_ion_st_reference_scoring(spark, sf_dir):
    """§2.11 reference-parity scoring, ion structural tier: RF over the
    ion_comp_st 45-dim descriptor (ml12); corr vs the reference's
    golden prediction_result_ion_comp_st.json gated in
    tests/test_reference_parity.py. With ml7/ml9/ml11 this completes
    reference-exact scoring for all four model configurations."""
    model, feats = train_ion_st_reference(spark)
    return model.transform(feats).select(
        "mp_id", F.round("pred_log10", 6).alias("pred_log10")
    )
