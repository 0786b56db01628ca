"""Coverage extensions: pivot/unpivot, literal sources, sink
round-trips (SURVEY.md §2.1 S4/S7/S9), composition featurizers (§2.9),
the Ewald-pattern site aggregation (A6/A7), stateful streaming (T6),
and MLlib batch scoring (§2.11)."""

from __future__ import annotations

import os

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from oxi_diel_db_spark.functions import composition as C
from oxi_diel_db_spark.functions import text as TX
from oxi_diel_db_spark.functions import formula as FM
from oxi_diel_db_spark.queries import register
from oxi_diel_db_spark.queries._util import fanout, r6, sql_sum_money, sum_money, t
from oxi_diel_db_spark.sources import materials as M

_MAT = f"read_parquet('{M.MATERIALS_PARQUET}/*.parquet')"

_SCRATCH = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".scratch")


def _scratch(name: str) -> str:
    os.makedirs(_SCRATCH, exist_ok=True)
    return os.path.join(_SCRATCH, name)


@register(
    "q15_pivot",
    oracle=f"""
    SELECT l_returnflag,
           {sql_sum_money("CASE WHEN l_linestatus = 'O' THEN l_extendedprice END")} AS O,
           {sql_sum_money("CASE WHEN l_linestatus = 'F' THEN l_extendedprice END")} AS F
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q15_pivot(spark, sf_dir):
    """PIVOT: linestatus columns out of rows. Explicit value list — an
    unlisted pivot would need a pre-pass distinct over 100 TB."""
    l = t(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("bigint")) / 100.0)
    )


@register(
    "q16_unpivot",
    oracle="""
    SELECT c_custkey, kind, val FROM (
      SELECT c_custkey, 'acctbal' AS kind, c_acctbal AS val FROM customer
      UNION ALL
      SELECT c_custkey, 'nationkey', CAST(c_nationkey AS DOUBLE) FROM customer
    )
    """,
)
def q16_unpivot(spark, sf_dir):
    """UNPIVOT / melt via the native unpivot operator (wide → tall)."""
    c = t(spark, sf_dir, "customer").select(
        "c_custkey",
        F.col("c_acctbal").alias("acctbal"),
        F.col("c_nationkey").cast("double").alias("nationkey"),
    )
    return c.unpivot("c_custkey", ["acctbal", "nationkey"], "kind", "val")


@register(
    "q17_values_source",
    oracle="""
    WITH priorities(o_orderpriority, weight) AS (
      VALUES ('1-URGENT', 5.0), ('2-HIGH', 3.0), ('3-MEDIUM', 1.0),
             ('4-NOT SPECIFIED', 0.5), ('5-LOW', 0.1)
    )
    SELECT p.o_orderpriority, COUNT(o_orderkey) AS n,
           ROUND(COUNT(o_orderkey) * ANY_VALUE(CAST(weight AS DOUBLE)), 2) AS weighted
    FROM priorities p LEFT JOIN orders o USING (o_orderpriority)
    GROUP BY p.o_orderpriority
    """,
)
def q17_values_source(spark, sf_dir):
    """S4: literal/VALUES source (the reference builds a Composition from
    a CLI string, main.py:33 — a one-row literal relation) joined to a
    fact as a broadcast dim."""
    weights = spark.createDataFrame(
        [
            ("1-URGENT", 5.0),
            ("2-HIGH", 3.0),
            ("3-MEDIUM", 1.0),
            ("4-NOT SPECIFIED", 0.5),
            ("5-LOW", 0.1),
        ],
        "o_orderpriority string, weight double",
    )
    o = t(spark, sf_dir, "orders")
    return (
        F.broadcast(weights)
        .join(o, "o_orderpriority", "left")
        .groupBy("o_orderpriority")
        .agg(
            F.count("o_orderkey").alias("n"),
            F.round(F.count("o_orderkey") * F.any_value("weight"), 2).alias("weighted"),
        )
    )


@register(
    "q18_partitioned_sink_roundtrip",
    oracle="""
    SELECT o_orderstatus, YEAR(o_orderdate) AS y, COUNT(*) AS n,
           SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) / 100.0 AS total
    FROM orders GROUP BY 1, 2
    """,
)
def q18_partitioned_sink_roundtrip(spark, sf_dir):
    """S7/S9 sink: write orders partitioned by (status, year), read the
    partition tree back, aggregate. Verifies partitionBy round-trip
    fidelity — at 100 TB this layout IS the table (partition pruning on
    status/year comes free afterwards)."""
    out = _scratch("sink_orders")
    o = t(spark, sf_dir, "orders").withColumn("y", F.year("o_orderdate"))
    o.write.mode("overwrite").partitionBy("o_orderstatus", "y").parquet(out)
    back = spark.read.parquet(out)
    return back.groupBy("o_orderstatus", "y").agg(
        F.count(F.lit(1)).alias("n"),
        sum_money("o_totalprice", "total"),
    )


@register(
    "q19_csv_roundtrip",
    oracle="""
    SELECT n_name, COUNT(*) AS n_suppliers
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def q19_csv_roundtrip(spark, sf_dir):
    """S9: CSV egress + ingress with explicit schema (never inferSchema
    at scale), then a dim join — proves the text path preserves data."""
    out = _scratch("sink_supplier_csv")
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    s.write.mode("overwrite").option("header", True).csv(out)
    back = spark.read.schema("s_suppkey bigint, s_name string, s_nationkey int").option(
        "header", True
    ).csv(out)
    n = t(spark, sf_dir, "nation")
    return (
        back.join(F.broadcast(n), back.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )


@register(
    "m13_stoichiometry",
    oracle=f"""
    SELECT mp_id,
           {C.sql_stoichiometry_pnorm('formula', 0)} AS p0,
           ROUND({C.sql_stoichiometry_pnorm('formula', 2)}, 6) + 0 AS p2,
           ROUND({C.sql_stoichiometry_pnorm('formula', 3)}, 6) + 0 AS p3,
           ROUND({C.sql_stoichiometry_pnorm('formula', 7)}, 6) + 0 AS p7
    FROM {_MAT}
    """,
)
def m13_stoichiometry(spark, sf_dir):
    """§2.9 Stoichiometry featurizer (ml_prediction.py:119): p-norms of
    the atomic-fraction vector, as pure expressions — oracle-checked,
    which matminer features never were."""
    m = M.materials(spark)
    return m.select(
        "mp_id",
        C.stoichiometry_pnorm("formula", 0).alias("p0"),
        r6(C.stoichiometry_pnorm("formula", 2), "p2"),
        r6(C.stoichiometry_pnorm("formula", 3), "p3"),
        r6(C.stoichiometry_pnorm("formula", 7), "p7"),
    )


@register(
    "m14_tmetal_fraction",
    oracle=f"""
    SELECT mp_id, formula,
           ROUND({C.sql_tmetal_fraction('formula')}, 6) + 0 AS tm_frac
    FROM {_MAT}
    """,
)
def m14_tmetal_fraction(spark, sf_dir):
    """§2.9 TMetalFraction featurizer (ml_prediction.py:107)."""
    m = M.materials(spark)
    return m.select(
        "mp_id", "formula", r6(C.tmetal_fraction("formula"), "tm_frac")
    )


@register(
    "m15_element_property",
    oracle=f"""
    SELECT mp_id,
           ROUND({C.sql_electronegativity_stats('formula')['en_mean']}, 6) + 0 AS en_mean,
           ROUND({C.sql_electronegativity_stats('formula')['en_min']}, 6) + 0  AS en_min,
           ROUND({C.sql_electronegativity_stats('formula')['en_max']}, 6) + 0  AS en_max,
           ROUND({C.sql_electronegativity_stats('formula')['en_range']}, 6) + 0 AS en_range
    FROM {_MAT}
    """,
)
def m15_element_property(spark, sf_dir):
    """§2.9 ElementProperty featurizer (ml_prediction.py:76): weighted
    elemental-property statistics via a literal element map (the
    broadcast-dim pattern)."""
    m = M.materials(spark)
    stats = C.electronegativity_stats("formula")
    return m.select(
        "mp_id",
        r6(stats["en_mean"], "en_mean"),
        r6(stats["en_min"], "en_min"),
        r6(stats["en_max"], "en_max"),
        r6(stats["en_range"], "en_range"),
    )


@register(
    "m16_site_energy",
    oracle=f"""
    WITH s AS (
      SELECT mp_id, t.idx AS idx, structure.sites[t.idx].xyz AS xyz
      FROM {_MAT}, UNNEST(range(1, len(structure.sites) + 1)) AS t(idx)
    ),
    p AS (
      SELECT a.mp_id, a.idx,
             sqrt((a.xyz[1] - b.xyz[1]) * (a.xyz[1] - b.xyz[1])
                + (a.xyz[2] - b.xyz[2]) * (a.xyz[2] - b.xyz[2])
                + (a.xyz[3] - b.xyz[3]) * (a.xyz[3] - b.xyz[3])) AS d
      FROM s a JOIN s b ON a.mp_id = b.mp_id AND a.idx <> b.idx
    )
    SELECT mp_id,
           ROUND(MAX(e), 6) AS max_site_energy,
           ROUND(AVG(e), 6) AS mean_site_energy,
           ROUND(STDDEV_POP(e), 6) AS std_site_energy,
           COUNT(*) AS n_sites
    FROM (SELECT mp_id, idx, SUM(1.0 / d) AS e FROM p GROUP BY mp_id, idx)
    GROUP BY mp_id
    """,
)
def m16_site_energy(spark, sf_dir):
    """A6/A7: the Ewald-pattern site aggregation — mapInPandas pairwise
    site energies → groupBy(mp_id).agg(max/mean/stddev_pop), replacing
    the reference's per-site Python loop (ml_prediction.py:205,248)."""
    from oxi_diel_db_spark.operators.site_features import site_energy_stats

    return site_energy_stats(M.materials(spark))


@register(
    "st6_stateful_counts",
    # full value-hash gate (upgraded from rows-only): update mode emits
    # a RUNNING total per key per micro-batch, so the final value per
    # key — max over emissions — must equal the batch aggregate. The
    # raw emission log (per-batch trajectory) stays asserted in
    # tests/test_streaming.py.
    oracle="""
    SELECT user_id, COUNT(*) AS n_events FROM events GROUP BY user_id
    """,
)
def st6_stateful_counts(spark, sf_dir):
    """T6: applyInPandasWithState running per-user counters, streamed to
    a memory sink in update mode; the query returns each key's FINAL
    state (max emission), which a correct stateful operator must land
    exactly on the batch count."""
    from oxi_diel_db_spark.streaming import ops

    stream = ops.read_events_stream(spark, sf_dir)
    log = ops.run_stream_to_memory(
        ops.stateful_user_counts(stream), spark, mode="update"
    )
    return log.groupBy("user_id").agg(F.max("n_events").alias("n_events"))


@register("ml1_rf_scoring", oracle=None)  # statistical parity — pytest floor
def ml1_rf_scoring(spark, sf_dir):
    """§2.11 ML pipeline: VectorAssembler → population-std scaling →
    RandomForestRegressor, batch-scored — the engine twin of the
    reference's golden prediction run (§3.3). Scores from the committed
    pre-trained artifact (data/models, the S5 surface) so a cold run
    pays model LOAD not RF training; trains transparently if absent.
    Quality floor (corr > 0.85 in-corpus) asserted in tests/test_ml.py."""
    from oxi_diel_db_spark.ml import pipeline as P

    model, feats = P.load_or_train(M.materials(spark), which="el", seed=42)
    return P.score(model, feats)


@register(
    "m17_band_center",
    oracle=f"""
    SELECT mp_id,
           ROUND({{bc}}, 6) + 0 AS band_center
    FROM {_MAT}
    """.format(bc=C.sql_band_center("formula")),
)
def m17_band_center(spark, sf_dir):
    """§2.9 BandCenter featurizer: weighted geometric-mean EN."""
    m = M.materials(spark)
    return m.select("mp_id", r6(C.band_center("formula"), "band_center"))


@register(
    "m18_min_rel_distances",
    oracle=f"""
    WITH s AS (
      SELECT mp_id, t.idx AS idx, structure.sites[t.idx].xyz AS xyz
      FROM {_MAT}, UNNEST(range(1, len(structure.sites) + 1)) AS t(idx)
    ),
    p AS (
      SELECT a.mp_id, a.idx,
             sqrt((a.xyz[1] - b.xyz[1]) * (a.xyz[1] - b.xyz[1])
                + (a.xyz[2] - b.xyz[2]) * (a.xyz[2] - b.xyz[2])
                + (a.xyz[3] - b.xyz[3]) * (a.xyz[3] - b.xyz[3])) AS d
      FROM s a JOIN s b ON a.mp_id = b.mp_id AND a.idx <> b.idx
    )
    SELECT mp_id,
           ROUND(AVG(md), 6) AS mean_min_dist,
           ROUND(STDDEV_POP(md), 6) AS std_min_dist,
           ROUND(MIN(md), 6) AS global_min_dist
    FROM (SELECT mp_id, idx, MIN(d) AS md FROM p GROUP BY mp_id, idx)
    GROUP BY mp_id
    """,
)
def m18_min_rel_distances(spark, sf_dir):
    """§2.9 MinimumRelativeDistances + A7 (np.mean/np.std over NN
    distances, reference ml_prediction.py:185,201-202)."""
    from oxi_diel_db_spark.operators.site_features import min_distance_stats

    return min_distance_stats(M.materials(spark))


@register(
    "m19_formula_udtf",
    oracle=f"""
    SELECT mp_id, u.el AS element, u.cnt
    FROM (
      SELECT mp_id, unnest({FM.sql_formula_pairs('formula')}) AS u
      FROM {_MAT}
    )
    """,
)
def m19_formula_udtf(spark, sf_dir):
    """§2.11 UDTF: one material row → one row per element via the
    Python table-function API (LATERAL join in SQL) — the imperative
    twin of the expression-based parse_formula."""
    from oxi_diel_db_spark.functions.udtfs import register_udtfs

    register_udtfs(spark)
    M.materials(spark).createOrReplaceTempView("materials_udtf")
    return spark.sql(
        """
        SELECT m.mp_id, f.element, f.cnt
        FROM materials_udtf m, LATERAL formula_explode(m.formula) f
        """
    )


@register(
    "m20_gaussian_symm",
    oracle=f"""
    WITH s AS (
      SELECT mp_id, t.idx AS idx, structure.sites[t.idx].xyz AS xyz
      FROM {_MAT}, UNNEST(range(1, len(structure.sites) + 1)) AS t(idx)
    ),
    p AS (
      SELECT a.mp_id, a.idx,
             sqrt((a.xyz[1] - b.xyz[1]) * (a.xyz[1] - b.xyz[1])
                + (a.xyz[2] - b.xyz[2]) * (a.xyz[2] - b.xyz[2])
                + (a.xyz[3] - b.xyz[3]) * (a.xyz[3] - b.xyz[3])) AS d
      FROM s a JOIN s b ON a.mp_id = b.mp_id AND a.idx <> b.idx
    )
    SELECT mp_id,
           ROUND(AVG(g05), 6) + 0 AS mean_g05,
           ROUND(STDDEV_POP(g05), 6) + 0 AS std_g05,
           ROUND(MAX(g4), 6) + 0 AS max_g4
    FROM (
      SELECT mp_id, idx,
             SUM(CASE WHEN d <= 6.0 THEN exp(-0.5 * (d / 6.0) * (d / 6.0)) ELSE 0.0 END) AS g05,
             SUM(CASE WHEN d <= 6.0 THEN exp(-4.0 * (d / 6.0) * (d / 6.0)) ELSE 0.0 END) AS g4
      FROM p GROUP BY mp_id, idx
    )
    GROUP BY mp_id
    """,
)
def m20_gaussian_symm(spark, sf_dir):
    """§2.9 GaussianSymmFunc: per-site radial symmetry functions reduced
    to per-material stats (A1 pattern over a site featurizer)."""
    from oxi_diel_db_spark.operators.site_features import gaussian_symm_func

    per_site = gaussian_symm_func(M.materials(spark))
    return per_site.groupBy("mp_id").agg(
        r6(F.avg("g_eta_05"), "mean_g05"),
        r6(F.stddev_pop("g_eta_05"), "std_g05"),
        r6(F.max("g_eta_4"), "max_g4"),
    )


@register(
    "m28_site_order_params",
    oracle=f"""
    WITH s AS (
      SELECT mp_id, t.idx AS idx, structure.sites[t.idx].xyz AS xyz
      FROM {_MAT}, UNNEST(range(1, len(structure.sites) + 1)) AS t(idx)
    ),
    p AS (
      SELECT a.mp_id, a.idx AS i, b.idx AS j,
             sqrt((b.xyz[1] - a.xyz[1]) * (b.xyz[1] - a.xyz[1])
                + (b.xyz[2] - a.xyz[2]) * (b.xyz[2] - a.xyz[2])
                + (b.xyz[3] - a.xyz[3]) * (b.xyz[3] - a.xyz[3])) AS d,
             b.xyz[1] - a.xyz[1] AS vx,
             b.xyz[2] - a.xyz[2] AS vy,
             b.xyz[3] - a.xyz[3] AS vz
      FROM s a JOIN s b ON a.mp_id = b.mp_id AND a.idx <> b.idx
    ),
    nbr AS (
      SELECT mp_id, i, j, vx / d AS ux, vy / d AS uy, vz / d AS uz
      FROM p WHERE d <= 3.0
    ),
    ql AS (
      SELECT n1.mp_id, n1.i,
             n1.ux * n2.ux + n1.uy * n2.uy + n1.uz * n2.uz AS c
      FROM nbr n1 JOIN nbr n2 ON n1.mp_id = n2.mp_id AND n1.i = n2.i
    ),
    qs AS (
      SELECT mp_id, i,
             sqrt(GREATEST(SUM((35.0 * c2 * c2 - 30.0 * c2 + 3.0) / 8.0) / COUNT(*), 0.0)) AS q4,
             sqrt(GREATEST(SUM((231.0 * c2 * c2 * c2 - 315.0 * c2 * c2 + 105.0 * c2 - 5.0) / 16.0) / COUNT(*), 0.0)) AS q6
      FROM (SELECT mp_id, i, c * c AS c2 FROM ql)
      GROUP BY mp_id, i
    ),
    rk AS (
      SELECT mp_id, i, vx / d AS ux, vy / d AS uy, vz / d AS uz,
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
    )
    SELECT s.mp_id,
           ROUND(AVG(q4), 6) + 0 AS mean_q4,
           ROUND(STDDEV_POP(q4), 6) + 0 AS std_q4,
           ROUND(AVG(q6), 6) + 0 AS mean_q6,
           ROUND(AVG(q_tet), 6) + 0 AS mean_tet,
           COUNT(q_tet) AS n_tet_sites
    FROM s
    LEFT JOIN qs ON s.mp_id = qs.mp_id AND s.idx = qs.i
    LEFT JOIN tet ON s.mp_id = tet.mp_id AND s.idx = tet.i
    GROUP BY s.mp_id
    """,
)
def m28_site_order_params(spark, sf_dir):
    """§2.9 OPSiteFingerprint analog (scipy-blocked in round 1; now a
    scipy-free kernel): Steinhardt q4/q6 bond-orientational order via
    the Legendre addition theorem + Errington–Debenedetti q_tet over
    the 4 nearest neighbors, reduced to per-material stats (A1). The
    oracle replays the identical geometry as a site self-join — unit
    bond vectors → neighbor-pair cosines → P4/P6 polynomial sums — so
    even this heavy site featurizer is value-hash-checked."""
    from oxi_diel_db_spark.operators.site_features import site_order_parameters

    per_site = site_order_parameters(M.materials(spark))
    return per_site.groupBy("mp_id").agg(
        r6(F.avg("q4"), "mean_q4"),
        r6(F.stddev_pop("q4"), "std_q4"),
        r6(F.avg("q6"), "mean_q6"),
        r6(F.avg("q_tet"), "mean_tet"),
        F.count("q_tet").alias("n_tet_sites"),
    )


@register(
    "m21_density",
    oracle=f"""
    SELECT mp_id,
           ROUND(cell_mass / volume * 1.66053906660, 6) AS density_g_cm3,
           ROUND(volume / n_sites, 6) AS vol_per_atom
    FROM (
      SELECT mp_id,
             ANY_VALUE(structure.lattice.volume) AS volume,
             COUNT(*) AS n_sites,
             SUM({{mass_case}}) AS cell_mass
      FROM (
        SELECT mp_id, structure, unnest(structure.sites) AS site FROM {_MAT}
      ) AS exploded,
      LATERAL (SELECT site.species[1].element AS el) AS species
      GROUP BY mp_id
    )
    """.format(mass_case=C.sql_mass_case("el")),
)
def m21_density(spark, sf_dir):
    """§2.9 DensityFeatures (reference ml_prediction.py:184): mass
    density + volume per atom from the actual cell contents — explode
    sites, broadcast-map atomic masses, divide by lattice volume.

    Mass sums fold over sites in cell order in both engines; ROUND(6)
    absorbs any libm residue."""
    m = M.materials(spark)
    sites = m.select(
        "mp_id",
        F.col("structure.lattice.volume").alias("volume"),
        F.explode("structure.sites").alias("site"),
    ).select(
        "mp_id",
        "volume",
        F.element_at(F.col("site.species"), 1)["element"].alias("el"),
    )
    mass = C.mass_map_expr()
    return (
        sites.groupBy("mp_id")
        .agg(
            F.any_value("volume").alias("volume"),
            F.count(F.lit(1)).alias("n_sites"),
            F.sum(mass[F.col("el")]).alias("cell_mass"),
        )
        .select(
            "mp_id",
            F.round(
                F.col("cell_mass") / F.col("volume") * C.AMU_PER_A3_TO_G_CM3, 6
            ).alias("density_g_cm3"),
            F.round(F.col("volume") / F.col("n_sites"), 6).alias("vol_per_atom"),
        )
    )


@register(
    "m22_valence_orbital",
    oracle=None,  # placeholder replaced below at import time
)
def m22_valence_orbital(spark, sf_dir):
    """§2.9 ValenceOrbital featurizer (ml_prediction.py:77): weighted
    s/p/d/f valence-electron averages and fractions; the element table
    is DERIVED in code from Aufbau + textbook exceptions, not
    hand-entered."""
    from oxi_diel_db_spark.functions.valence import valence_fractions

    m = M.materials(spark)
    v = valence_fractions("formula")
    return m.select(
        "mp_id",
        r6(v["avg_s"], "avg_s"),
        r6(v["avg_d"], "avg_d"),
        r6(v["frac_s"], "frac_s"),
        r6(v["frac_p"], "frac_p"),
        r6(v["frac_d"], "frac_d"),
        r6(v["frac_f"], "frac_f"),
    )


def _m22_oracle() -> str:
    from oxi_diel_db_spark.functions.valence import sql_valence_fractions

    v = sql_valence_fractions("formula")
    return f"""
    SELECT mp_id,
           ROUND({v['avg_s']}, 6) + 0 AS avg_s,
           ROUND({v['avg_d']}, 6) + 0 AS avg_d,
           ROUND({v['frac_s']}, 6) + 0 AS frac_s,
           ROUND({v['frac_p']}, 6) + 0 AS frac_p,
           ROUND({v['frac_d']}, 6) + 0 AS frac_d,
           ROUND({v['frac_f']}, 6) + 0 AS frac_f
    FROM {_MAT}
    """


# patch the registered oracle (computed SQL is too large for the decorator line)
from oxi_diel_db_spark.queries import REGISTRY as _REG
from dataclasses import replace as _replace

_REG["m22_valence_orbital"] = _replace(_REG["m22_valence_orbital"], oracle=_m22_oracle())


@register(
    "m23_en_diff",
    oracle=f"""
    SELECT mp_id,
           ROUND({C.sql_en_diff_to_oxygen('formula')}, 6) + 0 AS mean_en_diff
    FROM {_MAT}
    """,
)
def m23_en_diff(spark, sf_dir):
    """§2.9 ElectronegativityDiff: weighted mean EN gap between the O
    anion and the cations (the corpus is oxides — anion fixed)."""
    m = M.materials(spark)
    return m.select("mp_id", r6(C.en_diff_to_oxygen("formula"), "mean_en_diff"))


@register(
    "m24_ion_property",
    oracle=f"""
    SELECT mp_id,
           ROUND({C.sql_avg_ionic_character('formula')}, 6) + 0 AS avg_ionic_char
    FROM {_MAT}
    """,
)
def m24_ion_property(spark, sf_dir):
    """§2.9 IonProperty: Pauling average ionic character — a nested
    pair fold over the composition, pure expressions in both engines."""
    m = M.materials(spark)
    return m.select("mp_id", r6(C.avg_ionic_character("formula"), "avg_ionic_char"))


@register(
    "m25_oxidation_balance",
    oracle=f"""
    SELECT mp_id,
           ROUND(2.0 * n_o / NULLIF(n_cat, 0), 6) AS mean_cation_oxidation
    FROM (
      SELECT mp_id,
             list_aggregate(list_transform({C._SQL_TOKS.format(f='formula')},
               s -> CASE WHEN s.el = 'O' THEN s.cnt ELSE 0.0 END), 'sum') AS n_o,
             list_aggregate(list_transform({C._SQL_TOKS.format(f='formula')},
               s -> CASE WHEN s.el <> 'O' THEN s.cnt ELSE 0.0 END), 'sum') AS n_cat
      FROM {_MAT}
    )
    """,
)
def m25_oxidation_balance(spark, sf_dir):
    """§2.9 OxidationStates analog for an oxide corpus: with O fixed at
    -2 (the convention the reference's oxidation-state guess resolves
    to for these compounds, ml_prediction.py:74), charge balance gives
    the mean cation oxidation state = 2·n_O / n_cations directly from
    the formula."""
    from oxi_diel_db_spark.functions.composition import _fold_sum, _tok_counts

    m = M.materials(spark)
    toks = _tok_counts(F.col("formula"))
    n_o = _fold_sum(toks, lambda s: F.when(s["el"] == "O", s["cnt"]).otherwise(0.0))
    n_cat = _fold_sum(toks, lambda s: F.when(s["el"] != "O", s["cnt"]).otherwise(0.0))
    return m.select(
        "mp_id",
        F.round(2.0 * n_o / F.nullif(n_cat, F.lit(0.0)), 6).alias(
            "mean_cation_oxidation"
        ),
    )


@register(
    "m26_local_property_diff",
    oracle=f"""
    WITH s AS (
      SELECT mp_id, t.idx AS idx, structure.sites[t.idx].xyz AS xyz,
             CAST((CASE structure.sites[t.idx].species[1].element WHEN 'Ag' THEN 1.93 WHEN 'Al' THEN 1.61 WHEN 'As' THEN 2.18 WHEN 'Au' THEN 2.54 WHEN 'B' THEN 2.04 WHEN 'Ba' THEN 0.89 WHEN 'Be' THEN 1.57 WHEN 'Bi' THEN 2.02 WHEN 'Br' THEN 2.96 WHEN 'C' THEN 2.55 WHEN 'Ca' THEN 1.0 WHEN 'Cd' THEN 1.69 WHEN 'Ce' THEN 1.12 WHEN 'Cl' THEN 3.16 WHEN 'Co' THEN 1.88 WHEN 'Cr' THEN 1.66 WHEN 'Cs' THEN 0.79 WHEN 'Cu' THEN 1.9 WHEN 'Dy' THEN 1.22 WHEN 'Er' THEN 1.24 WHEN 'Eu' THEN 1.2 WHEN 'F' THEN 3.98 WHEN 'Fe' THEN 1.83 WHEN 'Ga' THEN 1.81 WHEN 'Gd' THEN 1.2 WHEN 'Ge' THEN 2.01 WHEN 'H' THEN 2.2 WHEN 'Hf' THEN 1.3 WHEN 'Hg' THEN 2.0 WHEN 'Ho' THEN 1.23 WHEN 'I' THEN 2.66 WHEN 'In' THEN 1.78 WHEN 'Ir' THEN 2.2 WHEN 'K' THEN 0.82 WHEN 'La' THEN 1.1 WHEN 'Li' THEN 0.98 WHEN 'Lu' THEN 1.27 WHEN 'Mg' THEN 1.31 WHEN 'Mn' THEN 1.55 WHEN 'Mo' THEN 2.16 WHEN 'N' THEN 3.04 WHEN 'Na' THEN 0.93 WHEN 'Nb' THEN 1.6 WHEN 'Nd' THEN 1.14 WHEN 'Ni' THEN 1.91 WHEN 'O' THEN 3.44 WHEN 'Os' THEN 2.2 WHEN 'P' THEN 2.19 WHEN 'Pb' THEN 2.33 WHEN 'Pd' THEN 2.2 WHEN 'Pr' THEN 1.13 WHEN 'Pt' THEN 2.28 WHEN 'Rb' THEN 0.82 WHEN 'Re' THEN 1.9 WHEN 'Rh' THEN 2.28 WHEN 'Ru' THEN 2.2 WHEN 'S' THEN 2.58 WHEN 'Sb' THEN 2.05 WHEN 'Sc' THEN 1.36 WHEN 'Se' THEN 2.55 WHEN 'Si' THEN 1.9 WHEN 'Sm' THEN 1.17 WHEN 'Sn' THEN 1.96 WHEN 'Sr' THEN 0.95 WHEN 'Ta' THEN 1.5 WHEN 'Tb' THEN 1.1 WHEN 'Tc' THEN 1.9 WHEN 'Te' THEN 2.1 WHEN 'Th' THEN 1.3 WHEN 'Ti' THEN 1.54 WHEN 'Tl' THEN 1.62 WHEN 'Tm' THEN 1.25 WHEN 'U' THEN 1.38 WHEN 'V' THEN 1.63 WHEN 'W' THEN 2.36 WHEN 'Y' THEN 1.22 WHEN 'Yb' THEN 1.1 WHEN 'Zn' THEN 1.65 WHEN 'Zr' THEN 1.33 ELSE NULL END) AS DOUBLE) AS chi
      FROM {_MAT}, UNNEST(range(1, len(structure.sites) + 1)) AS t(idx)
    ),
    p AS (
      SELECT a.mp_id, a.idx,
             sqrt((a.xyz[1] - b.xyz[1]) * (a.xyz[1] - b.xyz[1])
                + (a.xyz[2] - b.xyz[2]) * (a.xyz[2] - b.xyz[2])
                + (a.xyz[3] - b.xyz[3]) * (a.xyz[3] - b.xyz[3])) AS d,
             abs(a.chi - b.chi) AS dchi
      FROM s a JOIN s b ON a.mp_id = b.mp_id AND a.idx <> b.idx
    ),
    per_site AS (
      SELECT mp_id, idx,
             SUM(CASE WHEN d <= 5.0 THEN (1.0 / (d * d)) * dchi ELSE 0.0 END) AS num,
             SUM(CASE WHEN d <= 5.0 THEN 1.0 / (d * d) ELSE 0.0 END) AS den
      FROM p GROUP BY mp_id, idx
    )
    SELECT mp_id,
           ROUND(AVG(lpd), 6) + 0 AS mean_lpd,
           ROUND(STDDEV_POP(lpd), 6) + 0 AS std_lpd,
           ROUND(MAX(lpd), 6) + 0 AS max_lpd
    FROM (SELECT mp_id, idx, CASE WHEN den > 0 THEN num / den ELSE 0.0 END AS lpd FROM per_site)
    GROUP BY mp_id
    """,
)
def m26_local_property_diff(spark, sf_dir):
    """§2.9 LocalPropertyDifference: inverse-square-weighted neighbor
    |ΔEN| per site, reduced to per-material stats (A1 pattern)."""
    from oxi_diel_db_spark.operators.site_features import local_property_difference

    per_site = local_property_difference(M.materials(spark))
    return per_site.groupBy("mp_id").agg(
        r6(F.avg("local_en_diff"), "mean_lpd"),
        r6(F.stddev_pop("local_en_diff"), "std_lpd"),
        r6(F.max("local_en_diff"), "max_lpd"),
    )


@register(
    "ml2_linear_regression",
    oracle=f"""
    SELECT spacegroup.crystal_system AS crystal_system,
           COUNT(*) AS n,
           ROUND(regr_slope(LOG10(dielectric.epsilon_electronic_avg), band_gap), 6) + 0 AS slope,
           ROUND(regr_intercept(LOG10(dielectric.epsilon_electronic_avg), band_gap), 6) + 0 AS intercept,
           ROUND(regr_r2(LOG10(dielectric.epsilon_electronic_avg), band_gap), 6) + 0 AS r2
    FROM {_MAT}
    GROUP BY 1
    """,
)
def ml2_linear_regression(spark, sf_dir):
    """§2.11 ML surface, the oracle-checkable tier: OLS of
    log10(ε_electronic) on band_gap per crystal system via the regr_*
    aggregate family (closed-form moments — unlike RF, exact enough to
    value-hash against DuckDB after 6dp rounding). The physics: ε and
    gap anticorrelate (Penn model), so slopes come out negative.
    Runs as one hash-aggregate: partial moments map-side, no second
    pass — the 100 TB plan is the same single shuffle as any groupBy."""
    m = M.materials(spark)
    y = F.log10(F.col("dielectric.epsilon_electronic_avg"))
    x = F.col("band_gap")
    return m.groupBy(
        F.col("spacegroup.crystal_system").alias("crystal_system")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        (F.round(F.regr_slope(y, x), 6) + F.lit(0.0)).alias("slope"),
        (F.round(F.regr_intercept(y, x), 6) + F.lit(0.0)).alias("intercept"),
        (F.round(F.regr_r2(y, x), 6) + F.lit(0.0)).alias("r2"),
    )


@register(
    "m27_packing_fraction",
    oracle=f"""
    SELECT mp_id,
           ROUND(sphere_vol / volume, 6) AS packing_fraction,
           ROUND(sphere_vol / n_sites, 6) AS mean_atom_vol
    FROM (
      SELECT mp_id,
             ANY_VALUE(structure.lattice.volume) AS volume,
             COUNT(*) AS n_sites,
             SUM(4.0 / 3.0 * pi() * pow({{rad_case}}, 3)) AS sphere_vol
      FROM (
        SELECT mp_id, structure, unnest(structure.sites) AS site FROM {_MAT}
      ) AS exploded,
      LATERAL (SELECT site.species[1].element AS el) AS species
      GROUP BY mp_id
    )
    """.format(rad_case=C.sql_radius_case("el")),
)
def m27_packing_fraction(spark, sf_dir):
    """§2.9 AtomicPackingEfficiency analog (data-blocked in round 1;
    now backed by the public Cordero-2008 covalent radii in
    composition.COVALENT_RADIUS): Σ_sites (4/3)π r³ / cell volume, plus
    the mean atomic sphere volume. Covalent spheres overlap in bonded
    solids, so the fraction is a RELATIVE compactness feature (ranking/
    model input), not a physical sphere-packing density. Same plan as
    m21: explode sites, literal-map radius lookup, one hash aggregate."""
    m = M.materials(spark)
    sites = m.select(
        "mp_id",
        F.col("structure.lattice.volume").alias("volume"),
        F.explode("structure.sites").alias("site"),
    ).select(
        "mp_id",
        "volume",
        F.element_at(F.col("site.species"), 1)["element"].alias("el"),
    )
    rad = C.radius_map_expr()
    import math

    sphere = F.lit(4.0 / 3.0 * math.pi) * F.pow(rad[F.col("el")], 3)
    return (
        sites.groupBy("mp_id")
        .agg(
            F.any_value("volume").alias("volume"),
            F.count(F.lit(1)).alias("n_sites"),
            F.sum(sphere).alias("sphere_vol"),
        )
        .select(
            "mp_id",
            F.round(F.col("sphere_vol") / F.col("volume"), 6).alias(
                "packing_fraction"
            ),
            F.round(F.col("sphere_vol") / F.col("n_sites"), 6).alias(
                "mean_atom_vol"
            ),
        )
    )


@register("ml3_feature_importances", oracle=None)  # model internals — rows-only
def ml3_feature_importances(spark, sf_dir):
    """RF feature importances for the el model, ranked — the engine twin
    of the reference's implicit descriptor ranking (its 34-dim el_comp
    vector ordering, ml_prediction.py:82-117). Seeded training makes
    the ranking reproducible run-to-run; importances are model
    internals with no SQL form → rows-only check, floor asserted in
    tests/test_ml.py (band_gap-derived features must carry nonzero
    weight)."""
    from oxi_diel_db_spark.ml import pipeline as P

    model, _ = P.train(M.materials(spark), which="el", seed=42)
    rf = model.stages[-1]
    imps = rf.featureImportances.toArray()
    rows = [(name, float(w)) for name, w in zip(P.FEATURES, imps)]
    out = spark.createDataFrame(rows, "feature string, importance double")
    from pyspark.sql import Window

    rank_w = Window.orderBy(F.col("importance").desc(), F.col("feature"))
    return out.withColumn("rank", F.row_number().over(rank_w))


@register("ml4_cross_validation", oracle=None)  # model selection — rows-only
def ml4_cross_validation(spark, sf_dir):
    """k-fold CV over the RF depth grid (rows-only: fold metrics are
    model internals). Seeded splits/forests make the grid table
    reproducible; determinism asserted in tests/test_ml.py."""
    from oxi_diel_db_spark.ml import pipeline as P

    return P.cross_validate(M.materials(spark), which="el")


@register("ml5_kmeans_embeddings", oracle=None)  # iterative — rows-only
def ml5_kmeans_embeddings(spark, sf_dir):
    """MLlib clustering surface: seeded KMeans over the embedding
    column, reporting per-cluster size and mean distance to centroid.
    Iterative Lloyd refinement has no SQL form → rows-only; the
    clustered fixture (20 true centers) is asserted in tests/test_ml.py
    (k=20 must recover near-balanced clusters). At 100 TB this is the
    centroid-train step of the IVF index build: train on a sample,
    assign the full corpus with the literal-centroid expressions of
    operators/similarity.ivf_index."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    from oxi_diel_db_spark.functions.vectors import as_double

    emb = t(spark, sf_dir, "embeddings").select(
        "vec_id", array_to_vector(as_double("embedding")).alias("features")
    )
    km = KMeans(k=20, seed=42, maxIter=10, initMode="k-means||")
    model = km.fit(emb)
    pred = model.transform(emb)
    centers = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        "prediction int, center array<double>",
    )
    dist = F.sqrt(
        F.aggregate(
            F.zip_with(
                vector_to_array("features"),
                F.col("center"),
                lambda a, b: (a - b) * (a - b),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    return (
        pred.join(F.broadcast(centers), "prediction")
        .groupBy(F.col("prediction").alias("cluster"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg(dist), 6).alias("mean_dist"),
        )
    )


from oxi_diel_db_spark.operators.scale import sql_zvalue as _sql_zvalue


@register(
    "q69_zorder_stats",
    oracle=f"""
    SELECT zval >> 12 AS zbucket, COUNT(*) AS n,
           MIN(zval) AS zmin, MAX(zval) AS zmax
    FROM (SELECT {_sql_zvalue(["l_partkey", "l_suppkey"], 11)} AS zval FROM lineitem)
    GROUP BY 1
    """,
)
def q69_zorder_stats(spark, sf_dir):
    """Z-order (Morton) clustering value over (partkey, suppkey) with
    per-Z-range occupancy stats — the computation behind
    operators/scale.zorder_repartition's 100 TB layout story (see
    test_scale.py for the footer-stats pruning proof). Pure codegen'd
    bit arithmetic; integer math end-to-end -> full value-hash oracle."""
    from oxi_diel_db_spark.operators import scale

    l = t(spark, sf_dir, "lineitem")
    return (
        l.select(scale.zvalue(["l_partkey", "l_suppkey"], 11).alias("zval"))
        .groupBy(F.shiftright(F.col("zval"), 12).alias("zbucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("zval").alias("zmin"),
            F.max("zval").alias("zmax"),
        )
    )


@register(
    "q70_orc_roundtrip",
    oracle="""
    SELECT p_brand, COUNT(*) AS n_parts,
           SUM(CAST(ROUND(p_retailprice * 100, 0) AS BIGINT)) / 100.0 AS total_retail
    FROM part GROUP BY p_brand
    """,
)
def q70_orc_roundtrip(spark, sf_dir):
    """S9: ORC egress + ingress (the other columnar format Spark ships
    a vectorized reader for — ecosystems standardized on ORC swap one
    format string). Write part as ORC, read it back, aggregate; proves
    schema + values survive the format boundary."""
    out = _scratch("sink_part_orc")
    p = t(spark, sf_dir, "part")
    p.write.mode("overwrite").orc(out)
    back = spark.read.orc(out)
    return back.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_parts"),
        sum_money("p_retailprice", "total_retail"),
    )


from oxi_diel_db_spark.functions import atomic_orbitals as AO


@register("m29_atomic_orbitals", oracle=AO.sql_atomic_orbitals(_MAT))
def m29_atomic_orbitals(spark, sf_dir):
    """§2.9 AtomicOrbitals featurizer (reference ml_prediction.py:81,
    125,183,223): composition HOMO/LUMO/gap_AO via aufbau filling of
    the pooled per-atom subshell list — explode → broadcast dim join →
    per-material window, no UDF. Closes the HOMO_energy/LUMO_energy/
    gap_AO slots of the el_comp, ion_comp and el_comp_st descriptor
    sets; see functions/atomic_orbitals.py for the data model."""
    return AO.atomic_orbitals_features(M.materials(spark), spark)


@register(
    "m30_voronoi_neighbors",
    oracle=f"""
    WITH s AS (
      SELECT mp_id, t.idx AS idx, structure.sites[t.idx].xyz AS xyz
      FROM {_MAT}, UNNEST(range(1, len(structure.sites) + 1)) AS t(idx)
    ),
    pc AS (
      SELECT a.mp_id, a.idx AS i, b.idx AS j,
             sqrt((b.xyz[1] - a.xyz[1]) * (b.xyz[1] - a.xyz[1])
                + (b.xyz[2] - a.xyz[2]) * (b.xyz[2] - a.xyz[2])
                + (b.xyz[3] - a.xyz[3]) * (b.xyz[3] - a.xyz[3])) AS d,
             (a.xyz[1] + b.xyz[1]) / 2 AS mx,
             (a.xyz[2] + b.xyz[2]) / 2 AS my,
             (a.xyz[3] + b.xyz[3]) / 2 AS mz
      FROM s a JOIN s b ON a.mp_id = b.mp_id AND a.idx <> b.idx
    ),
    cut AS (
      SELECT pc.mp_id, pc.i, pc.j, pc.d,
             MIN(sqrt((pc.mx - k.xyz[1]) * (pc.mx - k.xyz[1])
                    + (pc.my - k.xyz[2]) * (pc.my - k.xyz[2])
                    + (pc.mz - k.xyz[3]) * (pc.mz - k.xyz[3]))) AS min_k
      FROM (SELECT * FROM pc WHERE d <= 6.0) pc
      LEFT JOIN s k
        ON k.mp_id = pc.mp_id AND k.idx <> pc.i AND k.idx <> pc.j
      GROUP BY pc.mp_id, pc.i, pc.j, pc.d
    ),
    kept AS (
      SELECT * FROM cut WHERE min_k IS NULL OR min_k > d / 2 + 1e-06
    ),
    per_site AS (
      SELECT s.mp_id, s.idx,
             COUNT(kept.j) AS vor_cn,
             AVG(kept.d) AS mean_vor_dist
      FROM s LEFT JOIN kept ON kept.mp_id = s.mp_id AND kept.i = s.idx
      GROUP BY s.mp_id, s.idx
    )
    SELECT mp_id,
           ROUND(AVG(vor_cn), 6) + 0 AS mean_cn,
           ROUND(STDDEV_POP(vor_cn), 6) + 0 AS std_cn,
           MAX(vor_cn) AS max_cn,
           ROUND(AVG(mean_vor_dist), 6) + 0 AS mean_vor_dist,
           COUNT(*) AS n_sites
    FROM per_site GROUP BY mp_id
    """,
)
def m30_voronoi_neighbors(spark, sf_dir):
    """§2.9 VoronoiFingerprint (approx; reference ml_prediction.py:187,
    227): bounded-radius midpoint half-space Voronoi-neighbor test in
    the pairwise mapInPandas site kernel (scipy-free), reduced to the
    mean/std/max coordination stats the reference descriptor consumes.
    Analytic lattice tests (sc 6 / bcc 14 / fcc 12) in pytest."""
    from oxi_diel_db_spark.operators.site_features import voronoi_stats

    return voronoi_stats(M.materials(spark))


@register("m31_ewald_site_energy", oracle=None)  # transcendental periodic sum — rows-only
def m31_ewald_site_energy(spark, sf_dir):
    """§2.9 EwaldSiteEnergy, the TRUE periodic sum (reference
    ml_prediction.py:205,248) — erfc short-range over lattice images +
    reciprocal-space term + self/background corrections, m25's
    charge-balance convention (O = −2, cations neutralizing), reduced
    to the reference's max/mean/std descriptor slots. The 1/r-kernel
    proxy (m16) stays the hash-checked default; this one is rows-only
    (no SQL form for the transcendental sums) with the NaCl Madelung
    constant pinned in tests/test_ewald.py."""
    from oxi_diel_db_spark.operators.site_features import ewald_energy_stats

    return ewald_energy_stats(M.materials(spark))


@register(
    "q76_merge_upsert",
    oracle="""
    WITH upd AS (
      SELECT o_orderkey, o_custkey, o_orderstatus,
             CAST(ROUND(o_totalprice * 110, 0) AS BIGINT) / 100.0 AS o_totalprice,
             o_orderdate, o_orderpriority
      FROM orders WHERE o_orderkey % 97 = 0
      UNION ALL
      SELECT o_orderkey + 10000000, o_custkey, 'N', o_totalprice,
             o_orderdate, o_orderpriority
      FROM orders WHERE o_orderkey % 193 = 0
    ),
    merged AS (
      SELECT COALESCE(u.o_orderkey, t.o_orderkey) AS o_orderkey,
             COALESCE(u.o_totalprice, t.o_totalprice) AS o_totalprice,
             COALESCE(u.o_orderdate, t.o_orderdate) AS o_orderdate
      FROM orders t FULL JOIN upd u ON t.o_orderkey = u.o_orderkey
    )
    SELECT YEAR(o_orderdate) AS y, COUNT(*) AS n,
           SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) / 100.0 AS total
    FROM merged GROUP BY 1
    """,
)
def q76_merge_upsert(spark, sf_dir):
    """MERGE/upsert into a partitioned parquet table with DYNAMIC
    partition overwrite (operators/scale.merge_upsert_partitioned) —
    the incremental-ingest primitive: ~1% of keys get a price bump,
    ~0.5% arrive as brand-new keys, and only the year-partitions those
    rows touch are rewritten (untouched partitions' files are proven
    byte-identical in tests/test_scale.py). The oracle replays the
    same merge as a FULL JOIN over the raw table — file layout is an
    implementation detail the hash gate can't see, which is the point."""
    from oxi_diel_db_spark.operators.scale import merge_upsert_partitioned

    out = _scratch("merge_orders")
    o = t(spark, sf_dir, "orders").withColumn("y", F.year("o_orderdate"))
    o.write.mode("overwrite").partitionBy("y").parquet(out)
    updates = (
        o.filter(F.col("o_orderkey") % 97 == 0)
        .withColumn(
            "o_totalprice",
            F.round(F.col("o_totalprice") * 110, 0).cast("bigint") / 100.0,
        )
        .unionByName(
            o.filter(F.col("o_orderkey") % 193 == 0)
            .withColumn("o_orderkey", F.col("o_orderkey") + 10000000)
            .withColumn("o_orderstatus", F.lit("N"))
        )
    )
    merge_upsert_partitioned(spark, out, updates, key="o_orderkey", part_col="y")
    back = spark.read.parquet(out)
    return back.groupBy(F.col("y")).agg(
        F.count(F.lit(1)).alias("n"),
        sum_money("o_totalprice", "total"),
    )


def _m32_oracle() -> str:
    import oxi_diel_db_spark.functions.composition as _C

    cols = []
    for prop, table in (
        ("row", _C.PERIOD),
        ("grp", _C.GROUP),
        ("blk", _C.BLOCK),
        ("mass", _C.ATOMIC_MASS),
        ("rad", _C.COVALENT_RADIUS),
    ):
        st = _C.sql_elemental_stats("formula", table)
        cols.append(f"ROUND({st['mean']}, 6) + 0 AS {prop}_mean")
        cols.append(f"ROUND({st['std']}, 6) + 0 AS {prop}_std")
        cols.append(f"ROUND({st['range']}, 6) + 0 AS {prop}_range")
    return f"SELECT mp_id, {', '.join(cols)} FROM {_MAT}"


@register("m32_element_property_full", oracle=_m32_oracle())
def m32_element_property_full(spark, sf_dir):
    """§2.9 ElementProperty, the FULL stats block the reference's
    descriptor sets consume (ml_prediction.py:83-92: mean/std_dev row,
    mean group, mean/std_dev block, mass and radius stats): weighted
    mean / population std / range over period, group, block (s0 p1 d2
    f3), IUPAC atomic mass, Cordero covalent radius — five literal
    property maps, one projection, no joins or shuffles at any scale.
    Complements m15's electronegativity stats."""
    m = M.materials(spark)
    out = [F.col("mp_id")]
    for prop, table in (
        ("row", C.PERIOD),
        ("grp", C.GROUP),
        ("blk", C.BLOCK),
        ("mass", C.ATOMIC_MASS),
        ("rad", C.COVALENT_RADIUS),
    ):
        st = C.elemental_stats("formula", table)
        out.append(r6(st["mean"], f"{prop}_mean"))
        out.append(r6(st["std"], f"{prop}_std"))
        out.append(r6(st["range"], f"{prop}_range"))
    return m.select(*out)


@register(
    "q79_jsonl_roundtrip",
    oracle="""
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(CASE WHEN source = 'web' THEN 1 ELSE 0 END) AS BIGINT) AS n_web
    FROM documents GROUP BY lang
    """,
)
def q79_jsonl_roundtrip(spark, sf_dir):
    """S9: JSON-Lines egress + ingress — the interchange format every
    training-data pipeline speaks. Write documents as .jsonl (one JSON
    object per line, Spark's native json sink), read back with an
    EXPLICIT schema (inference = a second full scan at 100 TB),
    aggregate — proves typed fields and string payloads survive the
    text-format boundary byte-for-byte."""
    out = _scratch("sink_documents_jsonl")
    d = t(spark, sf_dir, "documents")
    d.write.mode("overwrite").json(out)
    back = spark.read.schema(
        "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).json(out)
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.sum(F.when(F.col("source") == "web", 1).otherwise(0)).alias("n_web"),
    )


@register(
    "q80_poscar_source",
    # Oracle: the same 24 structures' site rows computed directly from
    # the materials parquet — element blocks in first-appearance order
    # (exactly how format_poscar groups them), cart = frac @ lattice.
    # Parallel unnests zip row-wise in DuckDB.
    oracle=f"""
    WITH sel AS (
      SELECT mp_id, structure FROM {_MAT} ORDER BY mp_id LIMIT 24
    ), s AS (
      SELECT mp_id,
             unnest(structure.sites).species[1].element AS element,
             unnest(generate_series(1, len(structure.sites))) AS i0,
             unnest(structure.sites).abc AS abc,
             structure.lattice.matrix AS m
      FROM sel
    ), g AS (
      SELECT *, MIN(i0) OVER (PARTITION BY mp_id, element) AS first_i0 FROM s
    )
    SELECT mp_id, element,
      CAST(ROW_NUMBER() OVER (PARTITION BY mp_id ORDER BY first_i0, i0) - 1 AS INT) AS site_idx,
      ROUND(abc[1], 6) + 0 AS frac_a,
      ROUND(abc[2], 6) + 0 AS frac_b,
      ROUND(abc[3], 6) + 0 AS frac_c,
      ROUND(abc[1] * m[1][1] + abc[2] * m[2][1] + abc[3] * m[3][1], 6) + 0 AS cart_x,
      ROUND(abc[1] * m[1][2] + abc[2] * m[2][2] + abc[3] * m[3][2], 6) + 0 AS cart_y,
      ROUND(abc[1] * m[1][3] + abc[2] * m[2][3] + abc[3] * m[3][3], 6) + 0 AS cart_z
    FROM g
    """,
)
def q80_poscar_source(spark, sf_dir):
    """S3 POSCAR source end-to-end (reference main.py:31 accepts a
    POSCAR path): 24 structures from the materials corpus are written
    out as POSCAR text (format_poscar — repr floats, element blocks),
    read back through ``spark.read.format("poscar")`` (the Spark-4
    Python DataSource, one input partition per file), and the parsed
    site rows are hash-checked against the corpus structs. mp_id
    recovery from the file name is the F5 pattern (regexp on
    source_file). The 24-structure collect is fixture materialization,
    not a data path; the fixture dir is node-local here and would be a
    shared FS on a cluster."""
    import tempfile

    from oxi_diel_db_spark.sources import poscar as P

    sel = (
        M.materials(spark)
        .orderBy("mp_id")
        .limit(24)
        .select("mp_id", "structure")
        .collect()
    )
    work = tempfile.mkdtemp(prefix="q80_poscar_")
    for row in sel:
        with open(os.path.join(work, f"{row['mp_id']}.poscar"), "w") as fh:
            fh.write(P.format_poscar(row["mp_id"], row["structure"]))
    try:
        P.register_poscar_source(spark)
    except Exception:
        pass  # already registered earlier in this session
    df = spark.read.format("poscar").load(work)
    return df.select(
        F.regexp_extract(F.col("source_file"), r"([^/]+)\.poscar$", 1).alias("mp_id"),
        "element",
        "site_idx",
        r6(F.col("frac_a"), "frac_a"),
        r6(F.col("frac_b"), "frac_b"),
        r6(F.col("frac_c"), "frac_c"),
        r6(F.col("cart_x"), "cart_x"),
        r6(F.col("cart_y"), "cart_y"),
        r6(F.col("cart_z"), "cart_z"),
    )


@register(
    "q82_schema_evolution",
    # Oracle reconstructs the evolved table: even doc_ids were written
    # BEFORE the n_chars column existed (read back as NULL), odd ones
    # after. Missing-column semantics is the whole point of the check.
    oracle="""
    WITH unioned AS (
      SELECT lang, CAST(NULL AS BIGINT) AS n_chars
      FROM documents WHERE doc_id % 2 = 0
      UNION ALL
      SELECT lang, n_chars FROM documents WHERE doc_id % 2 = 1
    )
    SELECT lang, COUNT(*) AS n,
           COUNT(*) - COUNT(n_chars) AS n_missing,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM unioned GROUP BY lang
    """,
)
def q82_schema_evolution(spark, sf_dir):
    """S8/S9 schema evolution: a long-lived table gains a column —
    files written before the change lack it, and a mergeSchema read
    must surface them as NULLs, not errors (the alternative at 100 TB
    is rewriting every historical file). Two generations are written
    (old: doc_id+lang; new: +n_chars), read back through ONE
    mergeSchema scan, and the null-vs-present accounting is
    hash-checked. mergeSchema=true costs a footer read per file at
    planning time — enable it per-read like here, not globally."""
    out = _scratch("schema_evolution")
    d = t(spark, sf_dir, "documents")
    d.filter(F.col("doc_id") % 2 == 0).select("doc_id", "lang").write.mode(
        "overwrite"
    ).parquet(f"{out}/gen0")
    d.filter(F.col("doc_id") % 2 == 1).select("doc_id", "lang", "n_chars").write.mode(
        "overwrite"
    ).parquet(f"{out}/gen1")
    back = spark.read.option("mergeSchema", "true").parquet(
        f"{out}/gen0", f"{out}/gen1"
    )
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("n_chars").isNull(), 1).otherwise(0)).alias("n_missing"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
    )


@register(
    "m33_tensor_invariants",
    # Both engines evaluate the SAME double-precision expressions over
    # the same stored values, so the pre-round results are bit-equal
    # (the repo's per-row IEEE-754 discipline); round-6 is belt and
    # braces. Matrix side: I1 = tr(A), I2 = sum of principal 2x2
    # minors, I3 = det(A). Eigen side via Newton/Vieta: sum, pairwise
    # product sum, product.
    oracle=f"""
    WITH m AS (
      SELECT mp_id,
             dielectric.epsilon_electronic AS a,
             dielectric.epsilon_electronic_eig AS e
      FROM {_MAT}
    )
    SELECT mp_id,
      ROUND(a[1][1] + a[2][2] + a[3][3], 6) + 0 AS i1_trace,
      ROUND( (a[2][2] * a[3][3] - a[2][3] * a[3][2])
           + (a[1][1] * a[3][3] - a[1][3] * a[3][1])
           + (a[1][1] * a[2][2] - a[1][2] * a[2][1]), 6) + 0 AS i2_minors,
      ROUND( a[1][1] * (a[2][2] * a[3][3] - a[2][3] * a[3][2])
           - a[1][2] * (a[2][1] * a[3][3] - a[2][3] * a[3][1])
           + a[1][3] * (a[2][1] * a[3][2] - a[2][2] * a[3][1]), 6) + 0 AS i3_det,
      ROUND(e[1] + e[2] + e[3], 6) + 0 AS eig_sum,
      ROUND(e[1] * e[2] + e[1] * e[3] + e[2] * e[3], 6) + 0 AS eig_pairsum,
      ROUND(e[1] * e[2] * e[3], 6) + 0 AS eig_prod
    FROM m
    """,
)
def m33_tensor_invariants(spark, sf_dir):
    """F2/A4 tensor algebra under the hash gate: the three principal
    invariants of the electronic dielectric tensor computed from the
    MATRIX (trace, principal-minor sum, determinant — pure higher-order
    array expressions, no UDF, no LAPACK) alongside the same invariants
    from the STORED eigenvalues via Vieta. The corpus invariant
    I_k(A) == e_k(eigs) to ~1e-6 becomes visible data; m10's LAPACK
    eigensolve stays the engine path for actually computing spectra
    (rows-only by design), while this query puts the algebra itself
    under cross-engine value-hash."""
    m = M.materials(spark)
    a = F.col("dielectric.epsilon_electronic")
    e = F.col("dielectric.epsilon_electronic_eig")

    def el(i, j):
        return F.element_at(F.element_at(a, i), j)

    def ev(i):
        return F.element_at(e, i)

    i1 = el(1, 1) + el(2, 2) + el(3, 3)
    i2 = (
        (el(2, 2) * el(3, 3) - el(2, 3) * el(3, 2))
        + (el(1, 1) * el(3, 3) - el(1, 3) * el(3, 1))
        + (el(1, 1) * el(2, 2) - el(1, 2) * el(2, 1))
    )
    i3 = (
        el(1, 1) * (el(2, 2) * el(3, 3) - el(2, 3) * el(3, 2))
        - el(1, 2) * (el(2, 1) * el(3, 3) - el(2, 3) * el(3, 1))
        + el(1, 3) * (el(2, 1) * el(3, 2) - el(2, 2) * el(3, 1))
    )
    return m.select(
        "mp_id",
        r6(i1, "i1_trace"),
        r6(i2, "i2_minors"),
        r6(i3, "i3_det"),
        r6(ev(1) + ev(2) + ev(3), "eig_sum"),
        r6(ev(1) * ev(2) + ev(1) * ev(3) + ev(2) * ev(3), "eig_pairsum"),
        r6(ev(1) * ev(2) * ev(3), "eig_prod"),
    )


@register(
    "q84_dpp_join",
    oracle=f"""
    SELECT d.label, COUNT(*) AS n, {sql_sum_money('o_totalprice')} AS total
    FROM orders o
    JOIN (VALUES ('F', 'finished'), ('P', 'pending')) d(st, label)
      ON o.o_orderstatus = d.st
    GROUP BY d.label
    """,
)
def q84_dpp_join(spark, sf_dir):
    """Dynamic partition pruning on the oracle record (SURVEY §4.2;
    the plan-shape twin of q83's bucketing row): orders written
    partitioned by status, then joined through a 2-row dim — at run
    time the dim's keys become a dynamicpruning subquery on the
    partition column, so the fact scan reads ONLY the F and P
    partition directories (asserted in tests/test_plans.py). At 100 TB
    with date-partitioned facts this is the mechanism that turns a
    dim-table date filter into a fact-scan partition list without any
    static predicate."""
    out = _scratch("dpp_orders")
    o = t(spark, sf_dir, "orders")
    o.write.mode("overwrite").partitionBy("o_orderstatus").parquet(out)
    fact = spark.read.parquet(out)
    dim = spark.createDataFrame(
        [("F", "finished"), ("P", "pending")], "o_orderstatus string, label string"
    )
    return (
        fact.join(dim, "o_orderstatus")
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            sum_money("o_totalprice", "total"),
        )
    )


@register(
    "q86_variant_json",
    # The oracle derives the same values arithmetically from the one
    # field events.props actually carries (regexp, not a JSON engine —
    # same policy as q12): the Spark side must round-trip them through
    # a real VARIANT value to agree.
    oracle="""
    SELECT event_id,
           k            AS outer_k,
           k * 2        AS arr_0,
           k + 1        AS arr_1,
           k % 7        AS deep_m,
           TRUE         AS missing_is_null
    FROM (
      SELECT event_id,
             CAST(regexp_extract(props, '([0-9]+)', 1) AS INT) AS k
      FROM events
      WHERE event_id < 2000
    )
    """,
)
def q86_variant_json(spark, sf_dir):
    """Semi-structured data through Spark 4's VARIANT type (the
    post-JSON-string path: parse once into a typed binary-encoded
    document, then cheap typed path extraction — the engine-native
    answer to get_json_object re-parsing the string per extraction).
    The query composes a nested document around events.props
    (object + array + nested object), parses it with ``parse_json``,
    and reads it back with ``variant_get`` typed paths;
    ``try_variant_get`` on a missing path returns NULL rather than
    erroring. At 100 TB the parse happens once at ingest and the
    shredded VARIANT columns scan like any other column."""
    e = t(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    k = F.get_json_object("props", "$.k").cast("int")
    doc = F.format_string(
        '{"outer":{"k":%d},"arr":[%d,%d],"m":{"deep":%d}}', k, k * 2, k + 1, k % 7
    )
    v = F.parse_json(doc)
    return e.select(
        "event_id",
        F.variant_get(v, "$.outer.k", "int").alias("outer_k"),
        F.variant_get(v, "$.arr[0]", "int").alias("arr_0"),
        F.variant_get(v, "$.arr[1]", "int").alias("arr_1"),
        F.variant_get(v, "$.m.deep", "int").alias("deep_m"),
        F.try_variant_get(v, "$.nope.q", "int").isNull().alias("missing_is_null"),
    )


@register(
    "q87_runtime_bloom_join",
    oracle=f"""
    SELECT o.o_orderpriority,
           COUNT(*) AS n_lines,
           {sql_sum_money('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_totalprice > 400000
    GROUP BY o.o_orderpriority
    """,
)
def q87_runtime_bloom_join(spark, sf_dir):
    """Runtime Bloom-filter join (SURVEY §4.2's runtime-filter row): a
    selective dim-side predicate is turned into a Bloom filter at run
    time and pushed into the FACT scan, so a sort-merge join over a
    100 TB lineitem reads/shuffles only rows whose orderkey might
    survive — the row-level complement of q84's partition-level DPP.
    Locally the injection thresholds are lowered so the tiny test scan
    qualifies (`bloom_filter_agg` / `BloomFilterMightContain` asserted
    in tests/test_plans.py); broadcast is disabled for THIS query so
    the join stays SMJ — `configure()` restores both knobs at the next
    query's build. Cluster guidance: defaults
    (creationSideThreshold 10 MB, applicationSideScanSizeThreshold
    10 GB) are already right at scale; no code change needed."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0"
    )
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            sum_money(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
        )
    )


@register(
    "q89_xml_source",
    oracle=f"""
    SELECT o_orderkey,
           o_orderkey               AS xml_key,
           o_orderstatus            AS xml_status,
           CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)       AS xml_price_cents
    FROM orders
    WHERE o_orderkey < 3000
    """,
)
def q89_xml_source(spark, sf_dir):
    """Semi-structured XML ingest (the XML twin of q86's VARIANT row):
    documents are built from order fields, then parsed back with Spark
    4's native ``from_xml`` into a typed struct — the oracle recomputes
    the fields arithmetically, so a parse that drops/shifts any element
    fails the value hash. At scale the same expression chain ingests
    real XML feeds (spark.read.format('xml') shares the parser)."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 3000)
    cents_price = F.round(F.col("o_totalprice") * 100, 0).cast("bigint")
    xml = F.format_string(
        "<order><key>%d</key><status>%s</status><price>%d</price></order>",
        F.col("o_orderkey"),
        F.col("o_orderstatus"),
        cents_price,
    )
    parsed = F.from_xml(xml, "key BIGINT, status STRING, price BIGINT")
    return o.select(
        "o_orderkey",
        parsed.getField("key").alias("xml_key"),
        parsed.getField("status").alias("xml_status"),
        parsed.getField("price").alias("xml_price_cents"),
    )


@register(
    "q90_python_sink",
    oracle="""
    SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY lang
    """,
)
def q90_python_sink(spark, sf_dir):
    """S9+ via the Spark 4 Python DataSource WRITE path (the writer
    twin of q80's POSCAR reader): documents shard to one JSONL file
    per partition through sources/jsonl_sink.py — task-local
    serialization, no driver collect — then the shards are read back
    with the standard JSON reader and re-aggregated under the hash
    gate, so a sink that drops/duplicates/mangles any row fails."""
    import shutil

    from oxi_diel_db_spark.sources.jsonl_sink import register_sink

    register_sink(spark)
    out = _scratch("jsonl_shards_docs")
    shutil.rmtree(out, ignore_errors=True)
    d = t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    d.write.format("jsonl_shards").option("path", out).mode("append").save()
    back = spark.read.schema("doc_id bigint, lang string, n_chars bigint").json(out)
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )


@register(
    "q93_prediction_stdout",
    oracle=f"""
    WITH fit AS (
      SELECT ROUND(regr_slope(LOG10(dielectric.epsilon_electronic_avg), band_gap), 6) AS slope,
             ROUND(regr_intercept(LOG10(dielectric.epsilon_electronic_avg), band_gap), 6) AS intercept
      FROM {_MAT}
    ),
    pred AS (
      SELECT ROUND(intercept + slope * 2.5, 6) AS p FROM fit
    )
    SELECT 1 AS line_no,
           printf('Prediction result (log10): %.6f', p) AS line
    FROM pred
    UNION ALL
    SELECT 2, printf('Prediction result (not log value): %.6f', ROUND(POW(10, p), 6))
    FROM pred
    """,
)
def q93_prediction_stdout(spark, sf_dir):
    """S6 stdout sink, the full-gate form (reference main.py:36-37
    prints 'Prediction result (log10): …' and 'Prediction result (not
    log value): …'): the line-PREFIX contract reproduced with 6-dp
    values (the reference prints pred via default f-string float repr
    at full precision; fixed 6-dp keeps the lines hash-stable across
    engines), produced
    from the hash-checkable OLS tier (global log10(ε)~band_gap fit,
    evaluated at band_gap = 2.5) instead of the RF blob so both lines
    sit under the cross-engine value hash. The CLI prints these rows
    verbatim (`oxi_diel_db_spark query q93_prediction_stdout --json` —
    asserted in tests/test_cli.py), so the print surface itself is the
    thing being checked, not just the scalar."""
    m = M.materials(spark)
    y = F.log10(F.col("dielectric.epsilon_electronic_avg"))
    x = F.col("band_gap")
    fit = m.agg(
        F.round(F.regr_slope(y, x), 6).alias("slope"),
        F.round(F.regr_intercept(y, x), 6).alias("intercept"),
    )
    pred = fit.select(
        F.round(F.col("intercept") + F.col("slope") * 2.5, 6).alias("p")
    )
    l1 = pred.select(
        F.lit(1).alias("line_no"),
        F.format_string("Prediction result (log10): %.6f", F.col("p")).alias(
            "line"
        ),
    )
    l2 = pred.select(
        F.lit(2).alias("line_no"),
        F.format_string(
            "Prediction result (not log value): %.6f",
            F.round(F.pow(F.lit(10.0), F.col("p")), 6),
        ).alias("line"),
    )
    return l1.unionByName(l2)


@register(
    "q100_grouped_agg_udaf",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(EXP(AVG(LN(l_extendedprice))), 4) AS geo_mean_price,
           ROUND(EXP(AVG(LN(CAST(l_quantity AS DOUBLE)))), 4) AS geo_mean_qty
    FROM lineitem
    WHERE l_extendedprice > 0 AND l_quantity > 0
    GROUP BY l_returnflag
    """,
)
def q100_grouped_agg_udaf(spark, sf_dir):
    """§2.11 GROUPED_AGG pandas UDAF — the one pandas-UDF API shape the
    registry had not yet exercised (scalar pandas_udf: F3; grouped-map
    applyInPandas: p5; mapInPandas: site kernels; UDTF: m19/t11). A
    true vectorized aggregate: the UDAF receives each group's column
    as ONE Arrow-backed pandas Series and returns a scalar — here the
    geometric mean via exp(mean(log)), numerically the float shape the
    DuckDB twin replays as EXP(AVG(LN(x))). Partial aggregation still
    applies upstream (the filter and column pruning push down; only
    group columns shuffle) — but note the honest caveat: GROUPED_AGG
    UDAFs do NOT get map-side combine (each group's full series
    crosses the shuffle), which is why the built-in expression form is
    preferred at 100 TB and this entry exists as API-surface coverage
    with a 4-dp round absorbing pandas' different summation order."""
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    # explicit functionType: the module's `from __future__ import
    # annotations` stringifies type hints, so the inferred-signature
    # form cannot see pd.Series -> float
    def _geo_mean(v):
        import numpy as np

        return float(np.exp(np.log(v.to_numpy()).mean()))

    geo_mean = pandas_udf(_geo_mean, "double", PandasUDFType.GROUPED_AGG)

    def _n(v):
        return len(v)

    # GROUPED_AGG UDAFs cannot mix with JVM aggregates in one agg()
    # (INVALID_PANDAS_UDF_PLACEMENT) — so the count is a UDAF too
    n_udaf = pandas_udf(_n, "long", PandasUDFType.GROUPED_AGG)

    l = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_extendedprice") > 0) & (F.col("l_quantity") > 0)
    )
    return l.groupBy("l_returnflag").agg(
        n_udaf("l_orderkey").alias("n"),
        F.round(geo_mean("l_extendedprice"), 4).alias("geo_mean_price"),
        F.round(geo_mean(F.col("l_quantity").cast("double")), 4).alias(
            "geo_mean_qty"
        ),
    )


_Q101_WALK = """
    e AS (SELECT src, dst FROM eu UNION SELECT dst, src FROM eu),
    srcs AS (SELECT DISTINCT src AS node FROM e WHERE src % 5 = 0),
    walk(node, dist) AS (
      SELECT node, 0 FROM srcs
      UNION ALL
      SELECT e.dst, w.dist + 1
      FROM walk w JOIN e ON e.src = w.node
      WHERE w.dist < 2
    )
    SELECT node AS user_id, CAST(MIN(dist) AS INT) AS dist
    FROM walk GROUP BY node
"""


@register(
    "q101_recursive_cte",
    oracle=f"""
    WITH RECURSIVE eu AS (
      SELECT ua AS src, ub AS dst FROM (
        SELECT a.user_id AS ua, b.user_id AS ub, COUNT(*) AS shared
        FROM (SELECT user_id, k FROM (
                SELECT user_id, k,
                       ROW_NUMBER() OVER (PARTITION BY k
                         ORDER BY substring(md5('42:' || CAST(user_id AS VARCHAR)), 1, 8),
                                  user_id) AS ukr
                FROM (SELECT DISTINCT user_id,
                             CAST(REGEXP_EXTRACT(props, '"k":\\s*(-?\\d+)', 1) AS INTEGER) AS k
                      FROM events WHERE event_type = 'purchase')
              ) WHERE ukr <= 64) a
        JOIN (SELECT user_id, k FROM (
                SELECT user_id, k,
                       ROW_NUMBER() OVER (PARTITION BY k
                         ORDER BY substring(md5('42:' || CAST(user_id AS VARCHAR)), 1, 8),
                                  user_id) AS ukr
                FROM (SELECT DISTINCT user_id,
                             CAST(REGEXP_EXTRACT(props, '"k":\\s*(-?\\d+)', 1) AS INTEGER) AS k
                      FROM events WHERE event_type = 'purchase')
              ) WHERE ukr <= 64) b
          ON a.k = b.k AND a.user_id < b.user_id
        GROUP BY 1, 2
      ) WHERE shared >= 6
    ),
    {_Q101_WALK}
    """,
)
def q101_recursive_cte(spark, sf_dir):
    """Spark 4 native ``WITH RECURSIVE`` (SPARK-24497): the SAME
    multi-source BFS recipe as g4_bfs_distances (same co-purchase
    graph construction, tighter ``shared >= 6`` edge threshold and a
    2-hop bound), but executed by Spark's own recursive-CTE operator
    instead of the hand-rolled frontier-only DataFrame loop in
    operators/graph.bfs_distances — a three-way cross-check (native
    recursive SQL vs DataFrame iteration vs the DuckDB recursive
    oracle) of an iterative traversal under the full value-hash
    gate. Spark supports only UNION ALL in the recursive member
    (UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE), so the accumulated walk
    carries multi-path MULTIPLICITY that the final MIN(dist) GROUP
    BY collapses; the oracle replays the identical UNION ALL form.
    The parameters are chosen for that multiplicity, measured: at
    sf0.1 the g4 parameters (>= 4, 3 hops) generate 1.3M walk rows
    and trip Spark's RECURSION_ROW_LIMIT_EXCEEDED (1M); >= 6 with 2
    hops stays at 56k. That cliff is structural — the native
    operator re-shuffles the full accumulated result each step and
    cannot prune visited nodes — so g4's frontier-pruned loop with
    localCheckpoint remains the 100 TB path; this entry is the
    engine-surface twin, bounded for exactly that reason (DEPLOY.md
    round-7 notes). r9: the edge builder carries the same per-k
    md5-rank contribution cap (64) as _copurchase_edges - the first
    full-registry sf1 run showed the uncapped quadratic k-join alone
    ran q101 for 517 s before failing; cap not binding at gate SF
    (max 29 users/k), values unchanged."""
    t(spark, sf_dir, "events").createOrReplaceTempView("events_q101")
    return spark.sql(
        f"""
        WITH RECURSIVE eu AS (
          SELECT ua AS src, ub AS dst FROM (
            SELECT a.user_id AS ua, b.user_id AS ub, COUNT(*) AS shared
            FROM (SELECT user_id, k FROM (
                    SELECT user_id, k,
                           ROW_NUMBER() OVER (PARTITION BY k
                             ORDER BY substring(md5(concat('42:', CAST(user_id AS STRING))), 1, 8),
                                      user_id) AS ukr
                    FROM (SELECT DISTINCT user_id,
                                 CAST(get_json_object(props, '$.k') AS INT) AS k
                          FROM events_q101 WHERE event_type = 'purchase')
                  ) WHERE ukr <= 64) a
            JOIN (SELECT user_id, k FROM (
                    SELECT user_id, k,
                           ROW_NUMBER() OVER (PARTITION BY k
                             ORDER BY substring(md5(concat('42:', CAST(user_id AS STRING))), 1, 8),
                                      user_id) AS ukr
                    FROM (SELECT DISTINCT user_id,
                                 CAST(get_json_object(props, '$.k') AS INT) AS k
                          FROM events_q101 WHERE event_type = 'purchase')
                  ) WHERE ukr <= 64) b
              ON a.k = b.k AND a.user_id < b.user_id
            GROUP BY 1, 2
          ) WHERE shared >= 6
        ),
        {_Q101_WALK}
        """
    )


@register(
    "q102_lateral_topk",
    oracle="""
    SELECT c.c_custkey,
           l.o_orderkey,
           CAST(l.o_orderdate AS DATE) AS o_orderdate,
           ROUND(l.o_totalprice, 2) AS o_totalprice
    FROM customer c,
    LATERAL (
      SELECT o_orderkey, o_orderdate, o_totalprice
      FROM orders o
      WHERE o.o_custkey = c.c_custkey
      ORDER BY o.o_orderdate DESC, o.o_orderkey
      LIMIT 3
    ) l
    WHERE c.c_mktsegment = 'BUILDING'
    """,
)
def q102_lateral_topk(spark, sf_dir):
    """Correlated LATERAL subquery with a BARE per-row
    ORDER BY ... LIMIT — no window function in the subquery at all
    (q91 is the lateral-with-explicit-ROW_NUMBER form; here Catalyst
    must SYNTHESIZE the rank itself). The "3 most recent orders per
    BUILDING customer" shape users otherwise write with a window +
    rank filter (q06). Spark decorrelates the lateral subquery into
    a ranked join
    (DecorrelateInnerQuery rewrites the per-row LIMIT as a
    partitioned row_number filter), so the physical plan is the same
    single hash-partitioned shuffle as W4 top-N per group — with
    WindowGroupLimit doing map-side top-3 pruning BEFORE the
    exchange, and the filtered customer side broadcast. No
    nested-loop re-execution per outer row (plan-asserted in
    tests/test_plans.py), which is what makes the construct safe at
    100 TB. Ties broken deterministically by o_orderkey so both
    engines pick identical rows."""
    t(spark, sf_dir, "customer").createOrReplaceTempView("customer_q102")
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders_q102")
    return spark.sql(
        """
        SELECT c.c_custkey,
               l.o_orderkey,
               CAST(l.o_orderdate AS DATE) AS o_orderdate,
               ROUND(l.o_totalprice, 2) AS o_totalprice
        FROM customer_q102 c,
        LATERAL (
          SELECT o_orderkey, o_orderdate, o_totalprice
          FROM orders_q102 o
          WHERE o.o_custkey = c.c_custkey
          ORDER BY o.o_orderdate DESC, o.o_orderkey
          LIMIT 3
        ) l
        WHERE c.c_mktsegment = 'BUILDING'
        """
    )


@register(
    "q103_sql_functions",
    oracle="""
    SELECT tier,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) / 100.0
             AS total_value
    FROM (
      SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
                  WHEN o_totalprice < 200000 THEN 'mid'
                  ELSE 'large' END AS tier,
             o_totalprice
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1999-01-01'
    ) GROUP BY tier
    """,
)
def q103_sql_functions(spark, sf_dir):
    """Spark 4 SQL-defined functions (SPARK-46246): a scalar
    ``CREATE TEMPORARY FUNCTION ... RETURNS STRING RETURN CASE ...``
    and a table function ``RETURNS TABLE(...) RETURN SELECT ...`` —
    the catalog-level reusable-logic surface (DuckDB's MACRO, Trino's
    SQL routines). Both are inlined into the plan at analysis time
    (the CASE folds into the projection, the table function's WHERE
    pushes down to the parquet scan like any view), so unlike Python
    UDFs they cost nothing at 100 TB — which is exactly why a user
    should reach for them first. The oracle replays the inlined
    expressions directly; money sums go through exact cent-BIGINTs
    per the _util convention."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders_q103")
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION order_tier_q103(p DOUBLE)
        RETURNS STRING
        RETURN CASE WHEN p < 50000 THEN 'small'
                    WHEN p < 200000 THEN 'mid'
                    ELSE 'large' END
        """
    )
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION orders_since_q103(cut TIMESTAMP)
        RETURNS TABLE (o_totalprice DOUBLE)
        RETURN SELECT o_totalprice FROM orders_q103 WHERE o_orderdate >= cut
        """
    )
    return spark.sql(
        """
        SELECT order_tier_q103(o_totalprice) AS tier,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) / 100.0
                 AS DOUBLE) AS total_value
        FROM orders_since_q103(TIMESTAMP '1999-01-01')
        GROUP BY order_tier_q103(o_totalprice)
        """
    )


@register(
    "q104_parameterized_sql",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) / 100.0
             AS total_value
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1998-01-01' AND o_orderstatus = 'O'
    GROUP BY o_orderpriority
    """,
)
def q104_parameterized_sql(spark, sf_dir):
    """Named-parameter ``spark.sql(sql, args=...)`` with an
    ``IDENTIFIER(:tbl)`` table reference — the injection-safe dynamic
    SQL surface (parameters bind as typed literals, never string
    splicing; IDENTIFIER restricts the binding to a name, so a value
    like ``'orders; DROP ...'`` cannot parse as SQL). Parameter
    markers are resolved before optimization, so the bound cutoff
    still reaches the parquet scan as a pushed filter and the
    IDENTIFIER resolves through the normal catalog path — dynamic SQL
    without giving up Catalyst. The oracle replays the same query
    with the constants inlined."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders_q104")
    return spark.sql(
        """
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) / 100.0
                 AS DOUBLE) AS total_value
        FROM IDENTIFIER(:tbl)
        WHERE o_orderdate >= CAST(:cutoff AS TIMESTAMP)
          AND o_orderstatus = :status
        GROUP BY o_orderpriority
        """,
        args={"tbl": "orders_q104", "cutoff": "1998-01-01", "status": "O"},
    )


@register(
    "ml14_pca_covariance",
    oracle="""
    WITH x AS (
      SELECT vec_id,
             GENERATE_SUBSCRIPTS(embedding, 1) - 1 AS i,
             UNNEST(CAST(embedding AS DOUBLE[])) AS xi
      FROM embeddings
    )
    SELECT CAST(a.i AS INT) AS i, CAST(b.i AS INT) AS j,
           ROUND(COVAR_POP(a.xi, b.xi), 6) + 0 AS cov
    FROM x a JOIN x b ON a.vec_id = b.vec_id AND a.i <= b.i
    GROUP BY 1, 2
    """,
)
def ml14_pca_covariance(spark, sf_dir):
    """Distributed covariance matrix of the 64-dim embedding column —
    the data-parallel half of PCA (ml15 eigendecomposes the result).
    Scale shape: mapInPandas accumulates ONE d x d partial outer
    product per partition in numpy (Arrow-batched, X^T X per batch),
    so the shuffle carries P x d(d+1)/2 partial rows — never the
    n x d^2 explosion of a pairwise self-join — and per-dim sums ride
    a posexplode aggregate (n x d rows). cov = E[xy] - E[x]E[y] from
    exact counts; the oracle's COVAR_POP accumulates in a different
    order, so both sides round to 6 dp (FP noise ~1e-12, five orders
    below the step). Upper triangle only (i <= j): 2,080 gate rows at
    d=64."""
    import numpy as np
    import pandas as pd

    from oxi_diel_db_spark.functions.vectors import as_double

    emb = t(spark, sf_dir, "embeddings").select(
        as_double("embedding").alias("e")
    )
    d = 64

    def _partials(it):
        ss = np.zeros((d, d))
        n = 0
        for pdf in it:
            if not len(pdf):
                continue
            m = np.stack(pdf["e"].to_numpy()).astype(np.float64)
            ss += m.T @ m
            n += len(m)
        if n == 0:
            return
        iu, ju = np.triu_indices(d)
        yield pd.DataFrame(
            {"i": iu.astype("int32"), "j": ju.astype("int32"),
             "ss": ss[iu, ju], "pn": np.full(len(iu), n, dtype="int64")}
        )

    parts = emb.mapInPandas(_partials, "i int, j int, ss double, pn bigint")
    ss = parts.groupBy("i", "j").agg(F.sum("ss").alias("sxy"))
    # pn repeats per (i,j) within a partition's frame: count it once
    # via the (0,0) row of each partition
    n_total = parts.filter((F.col("i") == 0) & (F.col("j") == 0)).agg(
        F.sum("pn").alias("n")
    )
    sums = (
        emb.select(F.posexplode("e").alias("i", "x"))
        .groupBy("i")
        .agg(F.sum("x").alias("sx"))
    )
    si = sums.select(F.col("i").alias("i"), F.col("sx").alias("s_i"))
    sj = sums.select(F.col("i").alias("j"), F.col("sx").alias("s_j"))
    return (
        ss.join(F.broadcast(si), "i")
        .join(F.broadcast(sj), "j")
        .crossJoin(F.broadcast(n_total))
        .select(
            "i",
            "j",
            r6(
                F.col("sxy") / F.col("n")
                - (F.col("s_i") / F.col("n")) * (F.col("s_j") / F.col("n")),
                "cov",
            ),
        )
    )


@register("ml15_pca_explained", oracle=None)  # rows-only BY NECESSITY, see below
def ml15_pca_explained(spark, sf_dir):
    """PCA spectrum of the embedding corpus: eigendecompose the d x d
    covariance from ml14's distributed pass (collect is d(d+1)/2 =
    2,080 rows — bounded by DIMENSION, not data, the same honest-valve
    shape as the IVF/PQ index builds in operators/similarity) and emit
    the top-8 components' eigenvalue, explained-variance ratio, and
    cumulative ratio. numpy.linalg.eigh on the symmetric matrix is
    deterministic; rows-only BY NECESSITY: DuckDB has no eigensolver,
    and the one SQL-expressible replacement — unrolled fixed-iteration
    power iteration with deflation (the g1/t18 fold pattern) — was
    measured (r11) and REJECTED: the synthetic embedding spectrum is
    near-flat (adjacent eigenvalue ratios 0.95-0.99), so even 120
    unrolled iterations leave |λ̂ − λ| ≈ 5e-5, two orders above the
    5e-7 a 6-dp hash gate needs. The gate that IS possible is ml14's:
    the full COVAR_POP matrix the eigh consumes is hash-verified, and
    tests/test_ml.py pins the eigh output against an independent
    numpy replay — the m10/m34 eigvals pattern. At 100 TB the
    covariance pass is the only part that touches the data; the eigh
    stays O(d^3) on the driver."""
    import numpy as np

    rows = ml14_pca_covariance(spark, sf_dir).collect()
    if not rows:
        return spark.createDataFrame(
            [], "component int, eigenvalue double, explained double, cumulative double"
        )
    d = 64
    cov = np.zeros((d, d))
    for r in rows:
        cov[r["i"], r["j"]] = r["cov"]
        cov[r["j"], r["i"]] = r["cov"]
    vals = np.linalg.eigh(cov)[0][::-1]  # descending
    tot = float(vals.sum())
    out = []
    cum = 0.0
    for k in range(8):
        ratio = float(vals[k]) / tot
        cum += ratio
        out.append((k + 1, round(float(vals[k]), 6), round(ratio, 6), round(cum, 6)))
    return spark.createDataFrame(
        out, "component int, eigenvalue double, explained double, cumulative double"
    )


@register(
    "q105_gapfill_interpolate",
    oracle="""
    WITH agg AS (
      SELECT event_type,
             CAST(to_timestamp(FLOOR(epoch(ts) / 900) * 900) AS TIMESTAMP) AS b,
             SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) / 100.0
               / COUNT(*) AS v
      FROM events GROUP BY 1, 2
    ), bounds AS (
      SELECT MIN(b) AS lo, MAX(b) AS hi FROM agg
    ), spine AS (
      SELECT t.event_type, s.b
      FROM (SELECT DISTINCT event_type FROM agg) t,
           (SELECT UNNEST(generate_series(lo, hi, INTERVAL 15 MINUTE)) AS b
            FROM bounds) s
    ), j AS (
      SELECT spine.event_type, spine.b, agg.v FROM spine
      LEFT JOIN agg ON agg.event_type = spine.event_type AND agg.b = spine.b
    ), w AS (
      SELECT event_type, b, v,
             LAST_VALUE(v IGNORE NULLS) OVER
               (PARTITION BY event_type ORDER BY b
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
             LAST_VALUE(CASE WHEN v IS NOT NULL THEN b END IGNORE NULLS) OVER
               (PARTITION BY event_type ORDER BY b
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pb,
             FIRST_VALUE(v IGNORE NULLS) OVER
               (PARTITION BY event_type ORDER BY b
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
             FIRST_VALUE(CASE WHEN v IS NOT NULL THEN b END IGNORE NULLS) OVER
               (PARTITION BY event_type ORDER BY b
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nb
      FROM j
    )
    SELECT event_type, b AS bucket,
           ROUND((CASE
             WHEN v IS NOT NULL THEN v
             WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
               pv + (nv - pv) * ((epoch(b) - epoch(pb)) / (epoch(nb) - epoch(pb)))
           END) * 1000000, 0) / 1000000 + 0 AS value_filled,
           CASE WHEN v IS NOT NULL THEN 'actual'
                WHEN pv IS NOT NULL AND nv IS NOT NULL THEN 'interp'
                ELSE 'edge' END AS src
    FROM w
    """,
)
def q105_gapfill_interpolate(spark, sf_dir):
    """Time-bucket gap-fill with linear interpolation — the hypertable
    resample staple (TimescaleDB's time_bucket_gapfill + interpolate):
    15-minute per-type averages of events.value, a dense bucket spine
    where empty buckets get the linear interpolation between the
    nearest observed neighbors (edges stay NULL — no extrapolation),
    each row tagged actual/interp/edge. Windowing is PARTITIONED by
    series key and the spine is O(time-range / bucket) per key —
    independent of event count, so a 100 TB ingest gap-fills over the
    same few-thousand-row-per-key spine. Determinism: bucket averages
    go through exact cent-sums and the interpolation ratio is a
    quotient of integer epoch deltas, so both engines compute
    bit-identical doubles — which is precisely why the output round
    must use the multiply-based form on both sides: exact 5e-7 TIES
    occur (rational values), and Spark's decimal HALF_UP disagrees
    with DuckDB's multiply-based ROUND on them by 1 ulp (caught by
    the sf0.001 suite gate, two tie rows in 14,390)."""
    ev = t(spark, sf_dir, "events")
    b = F.timestamp_seconds(
        F.floor(F.unix_timestamp("ts") / 900) * 900
    ).alias("b")
    # lazy barrier (r13 opt, guide §3.3): this bucket-average table is
    # referenced THREE times below (bounds, types, the spine join) and
    # Spark does not share common subplans across self-references — the
    # events scan + group agg ran 3x (6 parquet scans, 10 Exchange in
    # the before plan; 2 scans, 7 Exchange after). The table is
    # spine-sized (types x buckets, bounded regardless of event count),
    # so materializing it once is safe at any scale; swap for reliable
    # checkpoint() on a real cluster.
    agg = ev.groupBy(F.col("event_type"), b).agg(
        (
            F.sum(F.round(F.col("value") * 100, 0).cast("bigint"))
            / 100.0
            / F.count(F.lit(1))
        ).alias("v")
    ).localCheckpoint(eager=False)
    bounds = agg.agg(F.min("b").alias("lo"), F.max("b").alias("hi"))
    types = agg.select("event_type").distinct()
    spine = types.crossJoin(F.broadcast(bounds)).select(
        "event_type",
        F.explode(
            F.sequence("lo", "hi", F.expr("interval 15 minutes"))
        ).alias("b"),
    )
    j = spine.join(agg, ["event_type", "b"], "left")
    w_prev = (
        W.partitionBy("event_type")
        .orderBy("b")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    w_next = (
        W.partitionBy("event_type")
        .orderBy("b")
        .rowsBetween(0, W.unboundedFollowing)
    )
    marked = j.select(
        "event_type",
        "b",
        "v",
        F.last("v", ignorenulls=True).over(w_prev).alias("pv"),
        F.last(
            F.when(F.col("v").isNotNull(), F.col("b")), ignorenulls=True
        ).over(w_prev).alias("pb"),
        F.first("v", ignorenulls=True).over(w_next).alias("nv"),
        F.first(
            F.when(F.col("v").isNotNull(), F.col("b")), ignorenulls=True
        ).over(w_next).alias("nb"),
    )
    ratio = (
        (F.unix_timestamp("b") - F.unix_timestamp("pb")).cast("double")
        / (F.unix_timestamp("nb") - F.unix_timestamp("pb")).cast("double")
    )
    filled = F.when(F.col("v").isNotNull(), F.col("v")).when(
        F.col("pv").isNotNull() & F.col("nv").isNotNull(),
        F.col("pv") + (F.col("nv") - F.col("pv")) * ratio,
    )
    src = (
        F.when(F.col("v").isNotNull(), F.lit("actual"))
        .when(
            F.col("pv").isNotNull() & F.col("nv").isNotNull(), F.lit("interp")
        )
        .otherwise(F.lit("edge"))
    )
    # NOT r6: interpolation over cent-exact values and rational hop
    # ratios lands on EXACT 5e-7 ties (two rows at sf0.001), where
    # Spark's BigDecimal HALF_UP at 6 dp and DuckDB's multiply-based
    # ROUND disagree by 1 ulp. Multiply-based rounding on BOTH sides
    # makes the tie rule identical: y = x*1e6 is the same double in
    # both engines, round-half-away-from-zero at 0 dp agrees
    # (Java HALF_UP == C++ round for ties), and /1e6 is exact.
    return marked.select(
        "event_type",
        F.col("b").alias("bucket"),
        (F.round(filled * 1000000.0, 0) / 1000000.0 + F.lit(0.0)).alias(
            "value_filled"
        ),
        src.alias("src"),
    )


@register(
    "q106_pipe_syntax",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
           SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) / 100.0
             AS sum_base_price,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= DATE '2001-09-02'
    GROUP BY l_returnflag, l_linestatus
    HAVING COUNT(*) > 100
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q106_pipe_syntax(spark, sf_dir):
    """Spark 4 SQL pipe syntax (SPARK-49555): the flagship pricing
    summary re-expressed as a linear |> chain — FROM |> WHERE |>
    AGGREGATE ... GROUP BY |> WHERE (the post-aggregation HAVING
    stage) |> ORDER BY. Pipe stages are pure parse-time sugar over
    the same logical plan, so the filter still pushes down to the
    scan and the aggregate keeps partial+final hash aggregation —
    asserted by hash-equality with the standard-SQL oracle. The
    money sum rides the exact cent-BIGINT convention with an explicit
    DOUBLE cast (Spark parses a bare 100.0 as DECIMAL)."""
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_q106")
    return spark.sql(
        """
        FROM lineitem_q106
        |> WHERE l_shipdate <= DATE '2001-09-02'
        |> AGGREGATE
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
             CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT))
                  / 100.0 AS DOUBLE) AS sum_base_price,
             COUNT(*) AS count_order
           GROUP BY l_returnflag, l_linestatus
        |> WHERE count_order > 100
        |> ORDER BY l_returnflag, l_linestatus
        """
    )


@register(
    "q107_session_variables",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_above,
           SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) / 100.0
             AS value_above
    FROM orders
    WHERE o_totalprice > (
      SELECT SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) / 100.0
             / COUNT(*)
      FROM orders
    )
    GROUP BY o_orderpriority
    """,
)
def q107_session_variables(spark, sf_dir):
    """Spark 4 SQL session variables + EXECUTE IMMEDIATE
    (SPARK-46908/SPARK-44838): a data-derived threshold is computed
    once into a DECLAREd variable via SET VAR (scalar subquery), then
    consumed by a dynamically-executed statement through a ? USING
    binding — the stored-procedure-style parameter flow users port
    from warehouse SQL. The variable is a typed session literal at
    plan time, so the threshold comparison still pushes into the
    scan, and the exact cent-arithmetic average makes both engines
    derive a bit-identical threshold (the oracle inlines it as a
    scalar subquery)."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders_q107")
    spark.sql("DECLARE OR REPLACE VARIABLE v_avg_q107 DOUBLE DEFAULT 0.0")
    spark.sql(
        """
        SET VAR v_avg_q107 = (
          SELECT CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
                      / 100.0 / COUNT(*) AS DOUBLE)
          FROM orders_q107
        )
        """
    )
    return spark.sql(
        """
        EXECUTE IMMEDIATE
          'SELECT o_orderpriority,
                  CAST(COUNT(*) AS BIGINT) AS n_above,
                  CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
                       / 100.0 AS DOUBLE) AS value_above
           FROM orders_q107
           WHERE o_totalprice > ?
           GROUP BY o_orderpriority'
          USING v_avg_q107
        """
    )


@register(
    "q108_udtf_table_args",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) / 100.0 AS total
    FROM events
    GROUP BY event_type
    """,
)
def q108_udtf_table_args(spark, sf_dir):
    """Python UDTF with a TABLE(...) PARTITION BY argument (Spark
    3.5+/4 table-argument API) — the one UDTF invocation shape the
    registry's scalar-arg UDTFs (m19 formula_explode, t11 polymorphic
    ngram_explode) don't exercise: whole partitions stream through
    eval() and terminate() emits the partition summary, i.e. a
    Python-side partial aggregate. The exact cent-integer sum makes
    the Python accumulation hash-equal to the oracle's GROUP BY —
    pinning not just that the API runs but that partition-complete
    delivery holds (a dropped or split partition would change n).
    API-surface row: the JVM GROUP BY is of course the 100 TB path."""
    from oxi_diel_db_spark.functions.udtfs import register_udtfs
    from oxi_diel_db_spark.tables import small_scan

    register_udtfs(spark)
    ev = t(spark, sf_dir, "events")
    ev.createOrReplaceTempView("events_q108")
    # r13 opt (guide §4.1 "pass only the columns the function needs"):
    # the inner SELECT prunes the scan AND the per-row pickled payload
    # to event_type+value (ReadSchema drops event_id/ts/user_id/props).
    # r14 adjudication of the r13 local regression: the pruned PARTITION
    # BY shuffle lands under AQE's coalescePartitions.minPartitionSize
    # at gate scale, so the BatchEvalPythonUDTF stage — the query's real
    # cost — coalesces to ONE task (stage decomposition: 1 task/2.4 s
    # pruned vs 2 tasks/1.8 s unpruned wall; interleaved A/B 1.2x,
    # steal 0.01). Condition on the same split estimate fanout uses:
    # small local scan → keep the declared 6-col surface (Python-stage
    # parallelism dominates bytes); real scale → prune (the shuffle is
    # then far above minPartitionSize and the pickle bytes dominate).
    # Values identical either way: the UDTF never reads the pruned
    # columns (both variants oracle-verified).
    table_arg = (
        "TABLE(events_q108)"
        if small_scan(ev)
        else "TABLE(SELECT event_type, value FROM events_q108)"
    )
    return spark.sql(
        f"""
        SELECT event_type, n, CAST(total AS DOUBLE) AS total
        FROM partition_summarize(
          {table_arg}
          PARTITION BY event_type)
        """
    )


@register(
    "q109_sql_scripting",
    oracle="""
    WITH RECURSIVE walk(i, thr) AS (
      SELECT 0, CAST(512.0 AS DOUBLE)
      UNION ALL
      SELECT i + 1, thr / 2 FROM walk
      WHERE i < 12
        AND (SELECT COUNT(*) FROM events WHERE value > walk.thr) < 1000
    )
    SELECT w.thr AS threshold,
           CAST((SELECT COUNT(*) FROM events e WHERE e.value > w.thr)
                AS BIGINT) AS n_above
    FROM walk w ORDER BY w.i DESC LIMIT 1
    """,
)
def q109_sql_scripting(spark, sf_dir):
    """Spark 4 SQL scripting (SPARK-48338, spark.sql.scripting.
    enabled): a BEGIN...END block with DECLAREd state and a
    data-driven WHILE loop — halve a threshold until at least 1,000
    events exceed it (bounded at 12 iterations so the loop terminates
    on any input, including empty). The procedural-SQL migration
    surface warehouse users port PL/SQL-ish jobs through. The loop's
    per-iteration COUNT is a full aggregate the engine runs
    distributed; only the control flow is driver-side. Halving is
    exact in binary FP, so the DuckDB oracle — which cannot run the
    script — replays the IDENTICAL iteration as a recursive CTE and
    must land on the same threshold and count."""
    spark.conf.set("spark.sql.scripting.enabled", "true")
    t(spark, sf_dir, "events").createOrReplaceTempView("events_q109")
    return spark.sql(
        """
        BEGIN
          DECLARE thr DOUBLE DEFAULT 512.0;
          DECLARE i INT DEFAULT 0;
          WHILE i < 12
            AND (SELECT COUNT(*) FROM events_q109 WHERE value > thr) < 1000
          DO
            SET thr = thr / 2;
            SET i = i + 1;
          END WHILE;
          SELECT thr AS threshold,
                 CAST((SELECT COUNT(*) FROM events_q109 WHERE value > thr)
                      AS BIGINT) AS n_above;
        END
        """
    )


@register(
    "q110_ordered_string_agg",
    oracle="""
    SELECT o_orderpriority,
           string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus)
             AS statuses,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q110_ordered_string_agg(spark, sf_dir):
    """Spark 4 ``listagg(...) WITHIN GROUP (ORDER BY ...)``
    (SPARK-42746) — the ordered string aggregate warehouse SQL leans
    on for denormalized rollup columns; previously the engine's only
    deterministic spelling was A11's sort(collect_set) → concat. The
    WITHIN GROUP ordering is what makes the value hash-stable: an
    unordered listagg would concatenate in partition-arrival order.
    DISTINCT + ORDER BY on the same expression keeps both engines'
    dedup-then-sort semantics aligned (DuckDB string_agg DISTINCT
    ... ORDER BY)."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders_q110")
    return spark.sql(
        """
        SELECT o_orderpriority,
               listagg(DISTINCT o_orderstatus, ',')
                 WITHIN GROUP (ORDER BY o_orderstatus) AS statuses,
               CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM orders_q110
        GROUP BY o_orderpriority
        """
    )


def _ml16_oracle() -> str:
    """Full value-hash replay of the isotonic fit WITHOUT iterating
    PAVA: the minimax characterization (Robertson/Wright/Dykstra) —
    fitted value at point k = max_{i<=k} min_{j>=k} of the weighted
    mean over [i, j] — is closed-form SQL: prefix sums over the
    (score, weight, weighted-label) table, an i<=j interval-mean
    self-join (O(d²) rows at d = distinct scores — 494 at sf0.01,
    score granularity not corpus size), one suffix-MIN window per i,
    one MAX per k. Both engines divide exact integer-valued sums, so
    the pooled means are bit-identical before the shared 6-dp round.
    Composed from the registered t2/t12 oracles verbatim (the c5
    pattern — ml16 can never drift from the gates it builds on).

    Margin audit (r12, ADVICE ask): measured AT THE GATE SCALE,
    sf0.01 (494 fit values) — min distance to a 6-dp boundary
    4.05e-8 on bit-identical ROUND inputs; asserted in
    tests/test_round_margin.py. Re-measure there before gating at a
    larger sf."""
    from oxi_diel_db_spark.queries import REGISTRY
    from oxi_diel_db_spark.queries import llm_ops  # noqa: F401 (registers t2/t12)

    t2 = REGISTRY["t2_quality_score"].oracle
    t12 = REGISTRY["t12_gopher_rules"].oracle
    return f"""
    WITH sc AS ({t2}),
    gp AS ({t12}),
    pts AS (
      SELECT sc.quality AS score, CAST(COUNT(*) AS BIGINT) AS w,
             SUM(CASE WHEN gp.pass THEN 1.0 ELSE 0.0 END) AS wy
      FROM sc JOIN gp USING (doc_id) GROUP BY sc.quality
    ),
    idx AS (
      SELECT score, w, wy, ROW_NUMBER() OVER (ORDER BY score) AS k,
             SUM(w)  OVER (ORDER BY score) AS cw,
             SUM(wy) OVER (ORDER BY score) AS cwy
      FROM pts
    ),
    pairs AS (
      SELECT a.k AS i, b.k AS j,
             (b.cwy - (a.cwy - a.wy)) / (b.cw - (a.cw - a.w)) AS m
      FROM idx a JOIN idx b ON a.k <= b.k
    ),
    suff AS (
      SELECT i, j, MIN(m) OVER (PARTITION BY i ORDER BY j DESC) AS mn
      FROM pairs
    ),
    fit AS (SELECT j AS k, MAX(mn) AS f FROM suff GROUP BY j)
    SELECT idx.score, ROUND(fit.f, 6) + 0 AS calibrated, idx.w AS n_docs
    FROM idx JOIN fit ON fit.k = idx.k
    """


@register("ml16_isotonic_calibration", oracle=_ml16_oracle())
def ml16_isotonic_calibration(spark, sf_dir):
    """MLlib IsotonicRegression (the one classical-regression family
    the §2.11 surface hadn't exercised): calibrate the t2 quality
    score into P(doc passes the t12 Gopher ruleset) — the standard
    monotone-calibration step before using a heuristic score as a
    sampling weight (a score of 0.61 means nothing until calibrated
    against an accepted ground truth). Output is the fitted monotone
    curve evaluated at every distinct score: (score, calibrated,
    n_docs). Isotonic fit = weighted PAVA, deterministic given the
    (score, pass-rate, weight) triples — MLlib's parallel
    pool-adjacent-violators reaches the same optimum as the
    sequential form, which tests/test_ml.py verifies against a
    from-scratch Python PAVA point-for-point; since r11 the gate is
    a FULL value-hash via the minimax closed form (_ml16_oracle —
    no SQL engine iterates PAVA, but none needs to)."""
    from pyspark.ml.regression import IsotonicRegression

    from oxi_diel_db_spark.queries.llm_ops import t12_gopher_rules

    d = (
        # fanout (r13 opt): quality_score regexes at scan parallelism
        fanout(t(spark, sf_dir, "documents"), "doc_id")
        .filter(F.col("text").isNotNull())
        .select("doc_id", TX.quality_score("text").alias("score"))
        .join(
            t12_gopher_rules(spark, sf_dir).select(
                "doc_id", F.col("pass").cast("double").alias("label")
            ),
            "doc_id",
        )
    )
    iso = IsotonicRegression(
        featuresCol="score", labelCol="label", isotonic=True
    )
    model = iso.fit(d.select("score", "label"))
    fitted = model.transform(d.select("score"))
    return (
        fitted.groupBy("score")
        .agg(
            F.round(F.first("prediction"), 6).alias("calibrated"),
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        )
        .select(F.col("score"), "calibrated", "n_docs")
    )


@register(
    "q111_map_in_arrow",
    oracle=f"""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           {sql_sum_money("l_extendedprice * (1 - l_discount)")} AS net_revenue
    FROM lineitem
    WHERE l_shipdate <= DATE '1998-09-02'
    GROUP BY l_returnflag
    """,
)
def q111_map_in_arrow(spark, sf_dir):
    """§2.11 mapInArrow — the zero-copy RecordBatch transform, the one
    Arrow batch API the registry had not yet exercised (mapInPandas:
    site kernels; scalar pandas_udf: F3; GROUPED_AGG UDAF: q100;
    Arrow-optimized @udf: q78; UDTF: m19/t11). The per-row net-revenue
    cents land via pyarrow.compute entirely inside the Arrow batch —
    no pandas materialization, no per-row Python — then the JVM
    finishes the hash aggregate, so partial aggregation and shuffle
    behavior are the ordinary built-in path. round_mode=
    'half_towards_infinity' matches Spark/DuckDB ROUND (half away
    from zero) so the cents are bit-identical on both engines; the
    shipdate filter is applied BEFORE the mapInArrow so the parquet
    scan still sees the pushable predicate (a filter after a Python
    map never pushes down — the plan-shape rule this entry documents).
    Production note: prefer built-in expressions for arithmetic this
    simple; mapInArrow is the right tool when a kernel needs a real
    Arrow-native library (compute kernels, Arrow-native encoders) —
    this entry pins the API contract and its exactness envelope."""
    import pyarrow as pa

    def net_cents(batches):
        import pyarrow.compute as pc

        for b in batches:
            net = pc.multiply(
                b.column("l_extendedprice"),
                pc.subtract(pa.scalar(1.0), b.column("l_discount")),
            )
            c = pc.cast(
                pc.round(
                    pc.multiply(net, pa.scalar(100.0)),
                    round_mode="half_towards_infinity",
                ),
                pa.int64(),
            )
            yield pa.RecordBatch.from_arrays(
                [b.column("l_returnflag"), c], ["l_returnflag", "net_cents"]
            )

    l = (
        t(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .select("l_returnflag", "l_extendedprice", "l_discount")
    )
    mapped = l.mapInArrow(net_cents, "l_returnflag string, net_cents bigint")
    return mapped.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        (F.sum("net_cents") / 100.0).alias("net_revenue"),
    )


@register(
    "q112_apply_in_arrow",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS n,
           {sql_sum_money("l_extendedprice")} AS sum_price,
           MIN(l_extendedprice) AS min_price,
           MAX(l_extendedprice) AS max_price
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q112_apply_in_arrow(spark, sf_dir):
    """§2.11 applyInArrow — grouped-map over pyarrow Tables (the Arrow
    sibling of applyInPandas, Spark 4): each (returnflag, linestatus)
    group arrives as ONE Arrow table and the kernel reduces it with
    pyarrow.compute aggregates. Exactness: integer cent-sums are
    order-independent, min/max of raw doubles are exact — so the gate
    is a full value-hash, no rounding slack. The honest scale caveat
    (same as q100's): grouped-map gets NO map-side combine — each
    group's full rows cross the shuffle, and one giant group is one
    task's memory — so built-in aggregates own this query at 100 TB;
    the entry exists to pin the API surface with a group-cardinality-
    bounded (3×2 groups) kernel."""
    import pyarrow as pa

    def group_stats(table):
        import pyarrow.compute as pc

        price = table.column("l_extendedprice")
        c = pc.cast(
            pc.round(
                pc.multiply(price, pa.scalar(100.0)),
                round_mode="half_towards_infinity",
            ),
            pa.int64(),
        )
        return pa.table(
            {
                "l_returnflag": [table.column("l_returnflag")[0].as_py()],
                "l_linestatus": [table.column("l_linestatus")[0].as_py()],
                "n": [table.num_rows],
                "sum_price": [pc.sum(c).as_py() / 100.0],
                "min_price": [pc.min(price).as_py()],
                "max_price": [pc.max(price).as_py()],
            }
        )

    l = t(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus", "l_extendedprice"
    )
    return l.groupBy("l_returnflag", "l_linestatus").applyInArrow(
        group_stats,
        "l_returnflag string, l_linestatus string, n bigint, "
        "sum_price double, min_price double, max_price double",
    )


_Q113_CELL = "MAX(CASE WHEN l_returnflag = '{f}' THEN {v} END)"


@register(
    "q113_transpose",
    oracle=f"""
    WITH a AS (
      SELECT l_returnflag,
             {sql_sum_money("l_extendedprice")} AS sum_price,
             CAST(SUM(CAST(ROUND(l_quantity, 0) AS BIGINT)) AS DOUBLE) AS sum_qty,
             CAST(COUNT(*) AS DOUBLE) AS n
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT 'sum_price' AS key,
           {_Q113_CELL.format(f='A', v='sum_price')} AS A,
           {_Q113_CELL.format(f='N', v='sum_price')} AS N,
           {_Q113_CELL.format(f='R', v='sum_price')} AS R
    FROM a
    UNION ALL
    SELECT 'sum_qty',
           {_Q113_CELL.format(f='A', v='sum_qty')},
           {_Q113_CELL.format(f='N', v='sum_qty')},
           {_Q113_CELL.format(f='R', v='sum_qty')}
    FROM a
    UNION ALL
    SELECT 'n',
           {_Q113_CELL.format(f='A', v='n')},
           {_Q113_CELL.format(f='N', v='n')},
           {_Q113_CELL.format(f='R', v='n')}
    FROM a
    """,
)
def q113_transpose(spark, sf_dir):
    """Spark 4 ``DataFrame.transpose()`` (SPARK-49386): rows of the
    index column (the FIRST column, l_returnflag) become columns, the
    remaining metric columns become rows keyed by ``key`` — the
    metrics-wide → metrics-long reshape every reporting layer does
    after an aggregate. The DuckDB twin replays it as a conditional-
    aggregation pivot per former column. Scale posture: transpose is a
    driver-bounded reshape by construction — Spark caps the index
    cardinality (spark.sql.transposeMaxValues, default 500) because
    the index values become the *schema*; it belongs strictly AFTER
    the aggregate has reduced 100 TB to a report-sized table, exactly
    where this entry places it. All transposed cells must share a
    least-common type, so the metrics are cast to DOUBLE up front."""
    a = (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            sum_money("l_extendedprice", "sum_price"),
            F.sum(F.round("l_quantity", 0).cast("bigint"))
            .cast("double")
            .alias("sum_qty"),
            F.count(F.lit(1)).cast("double").alias("n"),
        )
    )
    return a.transpose()


@register(
    "q114_approx_top_k",
    oracle="""
    SELECT event_type AS item, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM events
    WHERE event_type IS NOT NULL
    GROUP BY event_type
    """,
)
def q114_approx_top_k(spark, sf_dir):
    """Spark 4.1 ``approx_top_k`` — the Space-Saving/heavy-hitters
    sketch surface (A9's third sketch family next to HLL q71 and KLL
    q74/q75). The sketch is EXACT whenever maxItemsTracked >= the
    column's distinct count — event_type has single-digit cardinality
    against a 10^4 tracking budget, and k exceeds the cardinality, so
    the exploded (item, count) pairs equal the exact GROUP BY and the
    full value-hash gate applies (no rows-only slack, unlike the
    inherently-approximate KLL rows). NULLs are excluded on both
    sides: the sketch ignores NULL inputs by contract, the twin
    filters them (the NULL-adversary fixture exercises this). At
    100 TB the sketch is the right tool precisely when the heavy-
    hitter set is small: per-partition sketches merge associatively
    (partial aggregation applies), so the full distinct set never
    shuffles — the same mergeable-sketch posture q71 documents."""
    ev = t(spark, sf_dir, "events").filter(F.col("event_type").isNotNull())
    sk = ev.agg(
        F.expr("approx_top_k(event_type, 50, 10000)").alias("topk")
    )
    return sk.select(F.explode("topk").alias("e")).select(
        F.col("e.item").alias("item"), F.col("e.count").cast("bigint").alias("cnt")
    )


#: ml17 design matrix, exposed for the from-scratch IRLS parity twin in
#: tests/test_ml.py (the t18/ml14 pattern: the engine result is checked
#: point-for-point against an independent numpy implementation).
ML17_FEATURES = ["f_logwords", "f_meanwlen", "f_alphafrac", "f_quality"]


def ml17_features(spark, sf_dir):
    """(doc_id, 4 quality signals, label) — the Gopher-style pseudo-
    labeled design matrix for the quality classifier: label = t12's
    composite rule verdict, features = the underlying continuous
    signals (log word count, mean word length, alphabetic fraction,
    composite quality score). One tokenization, pure Catalyst — the
    feature scan is a single pass at any corpus scale."""
    from oxi_diel_db_spark.queries.llm_ops import t12_gopher_rules

    from oxi_diel_db_spark.tables import fanout

    # fanout (r14 opt, ml16's pattern per the r13 verdict Next #5): the
    # word-split/regex feature chain below otherwise runs at scan
    # parallelism (one task on the gate file); identity at real scale
    d = fanout(t(spark, sf_dir, "documents"), "doc_id")
    txt = F.coalesce(F.col("text"), F.lit(""))
    words = F.filter(F.split(txt, r"\s+"), lambda x: x != "")
    n_words = F.size(words)
    nz = n_words > 0
    wlen_sum = F.aggregate(
        words, F.lit(0).cast("long"), lambda a, x: a + F.length(x)
    )
    mean_wlen = F.when(nz, wlen_sum / n_words).otherwise(F.lit(0.0))
    alpha_frac = F.when(
        nz, F.size(F.filter(words, lambda x: x.rlike("[a-zA-Z]"))) / n_words
    ).otherwise(F.lit(0.0))
    feats = d.select(
        "doc_id",
        F.log1p(n_words.cast("double")).alias("f_logwords"),
        mean_wlen.cast("double").alias("f_meanwlen"),
        alpha_frac.cast("double").alias("f_alphafrac"),
        TX.quality_score(txt).alias("f_quality"),
    )
    labels = t12_gopher_rules(spark, sf_dir).select(
        "doc_id", F.col("pass").cast("double").alias("label")
    )
    return feats.join(labels, "doc_id")


@register("ml17_quality_classifier", oracle=None)  # trained-model scores: IRLS parity in tests/test_ml.py
def ml17_quality_classifier(spark, sf_dir):
    """The model-based quality filter every production corpus pipeline
    runs next to its rule-based one (the CCNet/fastText-classifier
    recipe, public): a logistic-regression classifier trained on
    Gopher-rule pseudo-labels (t12) over continuous quality signals,
    scored back over the corpus so borderline documents get a GRADED
    probability instead of t12's hard conjunction. MLlib
    LogisticRegression with an explicitly pinned objective —
    mean-logloss + (1e-4/2)·||w||², standardization OFF, intercept
    unpenalized — so the from-scratch numpy IRLS twin
    (tests/test_ml.py) converges to the SAME unique optimum:
    coefficient-level parity, not a correlation floor. Rows-only gate
    by design (the model's weights are not SQL-expressible); the
    feature assembly underneath is the already-hash-gated t12/t2
    surface. Scale: training collects nothing — MLlib LBFGS
    aggregates gradient partials tree-wise (O(d) driver state, d=4);
    scoring is one broadcast-coefficients map pass."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    # lazy barrier (r14 opt, guide §3.3/§5): the featurization feeds the
    # LBFGS fit AND the scoring projection below — without it the
    # regex/word-split chain ran twice (measured 1.5 s per walk at
    # sf0.1; MLlib persists its own instances RDD inside fit, but the
    # scoring select re-derived the features from the raw scan). The
    # table is (doc_id, 4 doubles, label) — doc-count-sized and narrow,
    # the approved barrier class; swap for reliable checkpoint() on a
    # real cluster.
    data = ml17_features(spark, sf_dir).localCheckpoint(eager=False)
    assembled = VectorAssembler(
        inputCols=ML17_FEATURES, outputCol="features"
    ).transform(data)
    lr = LogisticRegression(
        featuresCol="features",
        labelCol="label",
        regParam=1e-4,
        elasticNetParam=0.0,
        standardization=False,
        fitIntercept=True,
        tol=1e-12,
        maxIter=500,
        family="binomial",
    )
    model = lr.fit(assembled)
    # Score with Catalyst expressions from the fitted coefficients, NOT
    # model.transform: the trained model drags its training summary —
    # which pins the live SparkSession — into the scoring UDF's closure
    # (order-dependent NotSerializableException once anything
    # non-serializable lands in the session, e.g. an ObservationManager
    # entry), and a 4-term dot product is whole-stage-codegen work
    # anyway. This IS the "broadcast coefficients, one map pass" the
    # scale posture promises — as literal plan, not UDF.
    w = model.coefficients.toArray()
    b = float(model.intercept)
    margin = F.lit(b)
    for feat, wi in zip(ML17_FEATURES, w):
        margin = margin + F.lit(float(wi)) * F.col(feat)
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))
    return data.select(
        "doc_id",
        F.col("label").cast("bigint").alias("label"),
        F.round(p, 4).alias("p_pass"),
        (p > 0.5).cast("int").alias("predicted"),
    )


@register(
    "q115_count_min_sketch",
    oracle="""
    SELECT event_type AS item, CAST(COUNT(*) AS BIGINT) AS est_n
    FROM events
    WHERE event_type IS NOT NULL
    GROUP BY event_type
    """,
)
def q115_count_min_sketch(spark, sf_dir):
    """A9's fourth sketch family — Count-Min (Cormode & Muthukrishnan
    2005) via Spark's ``count_min_sketch`` aggregate: point-frequency
    estimation in fixed memory, the mergeable-summary complement to
    HLL's distinct count (q71) and Space-Saving's top-k (q114). The
    query builds TWO sketches over disjoint halves of the stream
    (event_id parity), merges them driver-side through the public
    ``CountMinSketch.readFrom``/``mergeInPlace`` API, and answers
    point queries for every observed item — proving the property that
    makes CMS the 100 TB tool: per-partition sketches of fixed size
    (depth x width counters) combine associatively, so per-key
    frequencies come out of a map-side-combinable aggregate whose
    state never grows with cardinality. Gate: CMS overestimates ONLY
    on hash collisions; at width 2000 against single-digit
    cardinality (and a pinned seed) there are none, so the estimates
    equal the exact GROUP BY and the full value-hash applies — same
    exactness argument as q114. The two driver collects are O(sketch)
    and O(distinct items), both bounded by construction."""
    ev = t(spark, sf_dir, "events").filter(F.col("event_type").isNotNull())
    halves = ev.withColumn("half", (F.col("event_id") % 2).cast("int"))
    sketches = (
        halves.groupBy("half")
        .agg(
            F.expr("count_min_sketch(event_type, 0.001d, 0.99d, 42)").alias("cms")
        )
        .collect()
    )
    items = sorted(
        r.item for r in ev.select(F.col("event_type").alias("item")).distinct().collect()
    )
    if not sketches:
        return spark.createDataFrame([], "item string, est_n bigint")
    jcms = spark._jvm.org.apache.spark.util.sketch.CountMinSketch
    merged = jcms.readFrom(bytes(sketches[0].cms))
    for row in sketches[1:]:
        merged.mergeInPlace(jcms.readFrom(bytes(row.cms)))
    est = [(it, int(merged.estimateCount(it))) for it in items]
    return spark.createDataFrame(est, "item string, est_n bigint")


#: ml19 design matrix, exposed for the from-scratch Newton/IRLS parity
#: twin in tests/test_ml.py (the ml17 pattern).
ML19_FEATURES = ["x_logviews", "x_logvalue"]


def ml19_design(spark, sf_dir):
    """(user_id, log1p(n_views), log1p(total_value), n_purchases) —
    the per-user count-model design matrix: one groupBy over events,
    map-side combinable, O(users) output at any corpus scale."""
    ev = t(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.log1p(
            F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
            .cast("double")
        ).alias("x_logviews"),
        F.log1p(
            (
                F.coalesce(
                    F.sum(F.round(F.col("value") * 100, 0).cast("bigint")),
                    F.lit(0),
                )
                / 100.0
            )
        ).alias("x_logvalue"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("double")
        .alias("y"),
    )


@register("ml19_poisson_glm", oracle=None)  # trained-model scores: Newton parity in tests/test_ml.py
def ml19_poisson_glm(spark, sf_dir):
    """Poisson regression of per-user purchase counts on activity
    signals — the GLM count-model family (MLlib
    GeneralizedLinearRegression, family=poisson, link=log): the
    workload-forecasting / engagement-rate primitive next to ml2's
    OLS tier and ml17's logistic tier. regParam 0 and a tight tol pin
    the UNIQUE MLE, so the from-scratch numpy Newton/IRLS twin
    (tests/test_ml.py) must land on the SAME coefficients —
    coefficient-level parity, not a correlation floor. Scoring is a
    Catalyst exp(b + w·x) map pass from the fitted coefficients (the
    ml17 lesson: never close over a fitted model whose training
    summary pins the SparkSession). Rows-only gate by design; the
    design matrix underneath is plain hash-gateable aggregation.
    Scale: IRLS aggregates X^T W X gram partials tree-wise (O(d²)
    driver state, d=3); scoring is one map pass."""
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.regression import GeneralizedLinearRegression

    data = ml19_design(spark, sf_dir)
    if data.limit(1).count() == 0:  # fresh-ingest day: nothing to fit
        return spark.createDataFrame(
            [],
            "user_id bigint, n_purchases bigint, mu_hat double, "
            "pearson_resid double",
        )
    assembled = VectorAssembler(
        inputCols=ML19_FEATURES, outputCol="features"
    ).transform(data)
    glr = GeneralizedLinearRegression(
        family="poisson",
        link="log",
        featuresCol="features",
        labelCol="y",
        regParam=0.0,
        fitIntercept=True,
        tol=1e-12,
        maxIter=200,
    )
    model = glr.fit(assembled)
    w = model.coefficients.toArray()
    b = float(model.intercept)
    eta = F.lit(b)
    for feat, wi in zip(ML19_FEATURES, w):
        eta = eta + F.lit(float(wi)) * F.col(feat)
    mu = F.exp(eta)
    return data.select(
        "user_id",
        F.col("y").cast("bigint").alias("n_purchases"),
        F.round(mu, 4).alias("mu_hat"),
        F.round((F.col("y") - mu) / F.sqrt(mu), 4).alias("pearson_resid"),
    )


_ML20_CELLS = """
      SELECT {cat} AS cat,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS label
      FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
"""


def _ml20_chi2_sql(feature: str, cat_expr: str) -> str:
    base = _ML20_CELLS.format(cat=cat_expr)
    return f"""
    SELECT '{feature}' AS feature,
           ROUND(SUM((c.o - c.e) * (c.o - c.e) / c.e), 6) AS statistic,
           CAST((COUNT(DISTINCT c.cat) - 1)
                * (COUNT(DISTINCT c.label) - 1) AS INT) AS dof
    FROM (
      WITH b AS ({base}),
      obs AS (SELECT cat, label, COUNT(*) AS n FROM b GROUP BY 1, 2),
      rt AS (SELECT cat, SUM(n) AS rn FROM obs GROUP BY 1),
      ct AS (SELECT label, SUM(n) AS cn FROM obs GROUP BY 1),
      tot AS (SELECT CAST(SUM(n) AS DOUBLE) AS t FROM obs)
      SELECT r.cat, c.label,
             CAST(COALESCE(o.n, 0) AS DOUBLE) AS o,
             r.rn * c.cn / t.t AS e
      FROM rt r CROSS JOIN ct c CROSS JOIN tot t
      LEFT JOIN obs o ON o.cat = r.cat AND o.label = c.label
    ) c
    """


@register(
    "ml20_chi_square",
    oracle=(
        _ml20_chi2_sql("dow", "DAYOFWEEK(ts)")
        + " UNION ALL "
        + _ml20_chi2_sql("hour", "HOUR(ts)")
    ),
)
def ml20_chi_square(spark, sf_dir):
    """Pearson chi-square independence test via MLlib ChiSquareTest —
    the categorical-feature-selection primitive (does day-of-week /
    hour-of-day carry signal about purchasing?) and the third
    hypothesis-test family next to dq10's KS and dq2's PSI. MLlib
    builds the contingency distributed (one groupBy per feature) and
    the DuckDB twin recomputes the identical Pearson statistic from
    first principles — Σ(O−E)²/E over the row-marginal × col-marginal
    expected cells, zero cells included — so the MLlib implementation
    is value-hash-checked against the textbook formula (statistic to
    6 dp, exact dof). Category LABELS never leave the query, so the
    engines' different weekday numbering conventions cannot matter.
    p-values are excluded from the gate (no chi² CDF in SQL) — the
    (statistic, dof) pair determines them."""
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.stat import ChiSquareTest

    ev = (
        t(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull() & F.col("event_type").isNotNull())
        .select(
            F.dayofweek("ts").cast("double").alias("dow"),
            F.hour("ts").cast("double").alias("hour"),
            (F.col("event_type") == "purchase").cast("double").alias("label"),
        )
    )
    if ev.limit(1).count() == 0:
        return spark.createDataFrame(
            [], "feature string, statistic double, dof int"
        )
    assembled = VectorAssembler(
        inputCols=["dow", "hour"], outputCol="features"
    ).transform(ev)
    r = ChiSquareTest.test(assembled, "features", "label").head()
    rows = [
        ("dow", round(float(r.statistics[0]), 6), int(r.degreesOfFreedom[0])),
        ("hour", round(float(r.statistics[1]), 6), int(r.degreesOfFreedom[1])),
    ]
    return spark.createDataFrame(rows, "feature string, statistic double, dof int")


@register(
    "q117_lateral_column_alias",
    oracle="""
    SELECT l_returnflag,
           SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100, 0)
                    AS BIGINT)) / 100.0 AS net,
           ROUND(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100, 0)
                          AS BIGINT)) / 100.0
                 / COUNT(*), 4) AS net_per_item,
           ROUND(ROUND(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100,
                                      0) AS BIGINT)) / 100.0
                       / COUNT(*), 4) * 365, 4) AS net_per_item_annualized
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q117_lateral_column_alias(spark, sf_dir):
    """Spark 4 LATERAL COLUMN ALIAS resolution (SPARK-27561): a
    select-list alias referenced by LATER expressions in the SAME
    select list — including chained references through two hops and
    on top of aggregates — instead of repeating the expression or
    nesting a subquery. Pure analysis-time sugar: the resolved plan
    is identical to the twin's fully-inlined form (the alias chain
    collapses at analysis, so nothing about pushdown or partial
    aggregation changes), which is exactly what the value hash
    certifies."""
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("q117_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag,
               SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100, 0)
                        AS BIGINT)) / CAST(100.0 AS DOUBLE) AS net,
               ROUND(net / COUNT(*), 4) AS net_per_item,
               ROUND(net_per_item * CAST(365 AS DOUBLE), 4)
                 AS net_per_item_annualized
        FROM q117_lineitem
        GROUP BY l_returnflag
        """
    )


def ml21_baskets(spark, sf_dir):
    """(user_id, item, cnt) implicit-feedback triples: purchase counts
    of props.k items — ml18's basket data in rating-matrix form."""
    return (
        t(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.get_json_object("props", "$.k").cast("int").alias("item"),
        )
        .filter(F.col("item").isNotNull())
        .groupBy("user_id", "item")
        .agg(F.count(F.lit(1)).cast("float").alias("cnt"))
    )


@register("ml21_als_recommender", oracle=None)  # factorization internals: preference-separation + reproducibility tests
def ml21_als_recommender(spark, sf_dir):
    """Implicit-feedback ALS matrix factorization (Hu, Koren & Volinsky
    2008 — MLlib's blocked ALS): the collaborative-filtering pillar of
    the MLlib surface (next to RF/OLS/KMeans/LogReg/GLM/Isotonic/PCA/
    FPGrowth/ChiSq), factoring the user x item purchase-count matrix
    and emitting top-3 recommendations per user. Seeded and therefore
    run-to-run reproducible (asserted); the learned preferences must
    separate held items from non-items (tests/test_ml.py) — the
    honest gate for a latent-factor model whose internals are not
    SQL-expressible (rows-only, the m10/ml1 pattern). Scale: blocked
    ALS shuffles factor blocks, never the ratings cross join; each
    normal-equation solve is rank x rank per block."""
    from pyspark.ml.recommendation import ALS

    ratings = ml21_baskets(spark, sf_dir)
    if ratings.limit(1).count() == 0:
        return spark.createDataFrame(
            [], "user_id bigint, rec_rank int, item int, score double"
        )
    als = ALS(
        userCol="user_id",
        itemCol="item",
        ratingCol="cnt",
        rank=8,
        maxIter=8,
        seed=42,
        implicitPrefs=True,
        alpha=10.0,
        regParam=0.1,
        coldStartStrategy="drop",
    )
    model = als.fit(ratings)
    recs = model.recommendForAllUsers(3).select(
        "user_id", F.posexplode("recommendations").alias("pos", "r")
    )
    return recs.select(
        F.col("user_id").cast("bigint").alias("user_id"),
        (F.col("pos") + 1).cast("int").alias("rec_rank"),
        F.col("r.item").cast("int").alias("item"),
        F.round(F.col("r.rating").cast("double"), 4).alias("score"),
    )


@register("ml22_gbt_scoring", oracle=None)  # boosted ensemble internals: reproducibility + quality-floor tests
def ml22_gbt_scoring(spark, sf_dir):
    """Gradient-boosted trees regression (MLlib GBTRegressor) on the
    ml1 feature pipeline — the boosting pillar of the MLlib surface
    (sequential residual-fitting ensemble vs ml1's bagged RF): 40
    depth-4 stages, seeded, batch-scored over the corpus. Scale: GBT
    is inherently sequential ACROSS stages (40 fits, each one
    distributed pass) — the structural trade vs RF's fully-parallel
    trees that makes RF the default at 100 TB and GBT the
    accuracy-per-tree choice; both share VectorAssembler + pop-std
    scaling. Rows-only (ensemble internals are not SQL-expressible);
    seeded reproducibility + an in-corpus quality floor vs ml1's RF in
    tests/test_ml.py."""
    from pyspark.ml import Pipeline
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.regression import GBTRegressor

    from oxi_diel_db_spark.ml import pipeline as P

    # r14 audit (r13 verdict Next #5): decomposed — featurization is
    # 0.67 s of ml22's ~11 s at sf0.1 and the 40 sequential boosted
    # fits are ~87% (GBT caches its own treePoints RDD internally, so
    # nothing re-reads the corpus per stage). A featurization barrier
    # was tried and measured a wash (7.69 vs 7.67 interleaved A/B) —
    # fit-internal time dominates by algorithm; left as-is.
    feats = P.scale_features_pop(
        P.featurize(M.materials(spark)), P.FEATURES
    ).dropna(subset=P.FEATURES + ["label_el"])
    gbt = Pipeline(
        stages=[
            VectorAssembler(inputCols=P.FEATURES, outputCol="features"),
            GBTRegressor(
                featuresCol="features",
                labelCol="label_el",
                predictionCol="pred_log10",
                maxIter=40,
                maxDepth=4,
                stepSize=0.1,
                seed=42,
            ),
        ]
    ).fit(feats)
    return gbt.transform(feats).select(
        "mp_id", F.round("pred_log10", 6).alias("pred_log10")
    )
