"""Exact-tessellation site featurizers (§2.9 OPSiteFingerprint /
VoronoiFingerprint slots, reference ml_prediction.py:186-187,226-227).

m37 gates the exact periodic Voronoi tessellation
(operators/voronoi_exact.py) against a full relational DuckDB twin:
the SAME two-stage half-space vertex enumeration — candidate images →
plane ranks → stage-A bound polytope (K nearest + the six ±lattice
bisectors) → adaptive stage-B Cramer triples → generating-triple face
membership → boundary-ordered fan areas / Van Oosterom–Strackee solid
angles — written as SQL joins and windows over the identical float
expressions. The gated output carries two exactness witnesses that a
wrong tessellation cannot fake: per-material Σ(sub-polyhedron volumes)
equals the lattice volume, and per-site Σ(face solid angles) equals
4π, both rounded to 3 dp.

The oracle is heavy by design (hundreds of millions of triple rows at
the 1,278-material fixture) — it exists to certify the kernel, which
is the production path (mapInPandas, per-material numpy, no shuffle).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from oxi_diel_db_spark.queries import register
from oxi_diel_db_spark.queries._site_sql import (
    opsf_site_ctes,
    vor_site_ctes,
)
from oxi_diel_db_spark.queries.reference_parity import _MAT, _r6n, _sql_r6n
from oxi_diel_db_spark.sources import materials as M

#: 4π as the exact double both engines compare against.
FOUR_PI = "12.566370614359172"

#: Deterministic gate sample: materials whose md5(mp_id) starts with
#: '0' (~1/16 of the corpus, ≈80 materials / ≈1,700 sites). The
#: tessellation gate cross-checks every float of the construction on
#: the sample at CONSTANT cost no matter the corpus scale (the
#: d17-d19 harness pattern); the full-corpus Spark path is certified
#: by tests/test_voronoi_exact.py's invariants and the one-time
#: full-corpus cross-engine run recorded in SCALE.md §13.
from oxi_diel_db_spark.queries.reference_parity import (  # noqa: E402
    _MAT_SAMPLE,
)


#: m37 cross-check: the area fan in vtri computes cross((vb-va),(vc-va))
#: norms — the kernel's np.cross over a = ordv - ordv[0] with the same
#: component formula; tau/dd are the Van Oosterom–Strackee terms in the
#: kernel's addition order.


@register(
    "m37_voronoi_tessellation",
    oracle=f"""
    WITH {vor_site_ctes(_MAT_SAMPLE)}
    SELECT v.mp_id,
           COUNT(*) AS n_sites,
           CAST(SUM(n_faces) AS BIGINT) AS faces_total,
           ROUND((SUM(vol_sum) - ANY_VALUE(g.lat_vol)) + 1e-9, 3) + 0
             AS vol_gap,
           ROUND(MAX(abs(omega_sum - {FOUR_PI})) + 1e-9, 3) + 0
             AS omega_gap,
           {_sql_r6n("MAX(area_std)", "vor_area_std_max")},
           {_sql_r6n("AVG(area_std)", "vor_area_std_mean")},
           {_sql_r6n("MIN(dist_min)", "vor_dist_min_min")},
           {_sql_r6n("STDDEV_POP(dist_min)", "vor_dist_min_std")},
           {_sql_r6n("STDDEV_POP(symw4)", "symw4_std")},
           {_sql_r6n("AVG(vol_max)", "vor_vol_max_mean")},
           {_sql_r6n("STDDEV_POP(area_min)", "vor_area_min_std")},
           {_sql_r6n("MIN(area_max)", "vor_area_max_min")},
           {_sql_r6n("AVG(dist_std)", "vor_dist_std_mean")}
    FROM vor_site v
    JOIN (SELECT mp_id, structure.lattice.volume AS lat_vol
          FROM {_MAT_SAMPLE}) g ON g.mp_id = v.mp_id
    GROUP BY v.mp_id
    """,
)
def m37_voronoi_tessellation(spark, sf_dir):
    """§2.9 VoronoiFingerprint, EXACT periodic tessellation (reference
    ml_prediction.py:187,227 ``VoronoiFingerprint(use_symm_weights=
    True)``) — supersedes the m30 midpoint analog for the ml10/ml12
    descriptor slots. Per-material reductions of the true per-site
    face statistics (areas, neighbor distances, sub-volumes, solid-
    angle-weighted 4-vertex index), PLUS two exactness witnesses the
    gate hashes: vol_gap (Σ sub-volumes − lattice volume, 3 dp — the
    cells tile the cell) and omega_gap (max |Σω − 4π| over sites,
    3 dp — every cell closes). Both are 0.0 for all 1,278 materials.

    Spark side: mapInPandas numpy kernel (no shuffle, per-material
    parallelism — the 100 TB shape); oracle: the same two-stage vertex
    enumeration as relational SQL over identical float expressions."""
    from oxi_diel_db_spark.operators.voronoi_exact import (
        voronoi_fingerprint_sites,
    )

    m = M.materials(spark).filter(F.md5("mp_id").startswith("0"))
    per_site = voronoi_fingerprint_sites(m)
    vol = m.select(
        "mp_id", F.col("structure.lattice.volume").alias("lat_vol")
    )
    return (
        per_site.groupBy("mp_id")
        .agg(
            F.count(F.lit(1)).alias("n_sites"),
            F.sum("n_faces").alias("faces_total"),
            F.sum("vol_sum").alias("_vol_sum"),
            (
                F.round(
                    F.max(F.abs(F.col("omega_sum") - F.lit(4.0 * 3.141592653589793)))
                    + F.lit(1e-9),
                    3,
                )
                + F.lit(0.0)
            ).alias("omega_gap"),
            _r6n(F.max("area_std"), "vor_area_std_max"),
            _r6n(F.avg("area_std"), "vor_area_std_mean"),
            _r6n(F.min("dist_min"), "vor_dist_min_min"),
            _r6n(F.stddev_pop("dist_min"), "vor_dist_min_std"),
            _r6n(F.stddev_pop("symw4"), "symw4_std"),
            _r6n(F.avg("vol_max"), "vor_vol_max_mean"),
            _r6n(F.stddev_pop("area_min"), "vor_area_min_std"),
            _r6n(F.min("area_max"), "vor_area_max_min"),
            _r6n(F.avg("dist_std"), "vor_dist_std_mean"),
        )
        .join(vol, "mp_id")
        .select(
            "mp_id",
            "n_sites",
            "faces_total",
            (
                F.round(F.col("_vol_sum") - F.col("lat_vol") + F.lit(1e-9), 3)
                + F.lit(0.0)
            ).alias("vol_gap"),
            "omega_gap",
            "vor_area_std_max",
            "vor_area_std_mean",
            "vor_dist_min_min",
            "vor_dist_min_std",
            "symw4_std",
            "vor_vol_max_mean",
            "vor_area_min_std",
            "vor_area_max_min",
            "vor_dist_std_mean",
        )
    )


# ---------------------------------------------------------------------------
# m38: OPSiteFingerprint slots (reference ml_prediction.py:186,226;
# slot list at :204-205 and :251-259), gated against a relational twin
# of operators/op_fingerprint.py — adaptive shell radius, relative-
# distance binning at three dr widths, prefix-CN shells with zero_ops,
# (mean 1/drel)^2 distance weighting, per-motif pairwise kernels,
# median over the dr variants. Constants (SIGMA, DRS, target-angle
# multisets) are EMITTED from the kernel module so both engines
# evaluate identical doubles.
# ---------------------------------------------------------------------------


@register(
    "m38_op_fingerprint",
    oracle=f"""
    WITH {opsf_site_ctes(_MAT_SAMPLE)}
    SELECT mp_id,
           CAST(COUNT(*) AS BIGINT) AS n_sites,
           {_sql_r6n("MAX(tet)", "tet_max")},
           {_sql_r6n("MAX(seesaw)", "seesaw_max")},
           {_sql_r6n("AVG(sgl_bd)", "sgl_bd_mean")},
           {_sql_r6n("AVG(bent150)", "bent150_mean")},
           {_sql_r6n("AVG(lin)", "lin_mean")},
           {_sql_r6n("AVG(tri_plan)", "tri_plan_mean")},
           {_sql_r6n("STDDEV_POP(pent_plan)", "pent_plan_std")},
           {_sql_r6n("MAX(oct)", "oct_max")},
           {_sql_r6n("STDDEV_POP(oct)", "oct_std")},
           {_sql_r6n("AVG(q6)", "q6_mean")}
    FROM opsf_site GROUP BY mp_id
    """,
)
def m38_op_fingerprint(spark, sf_dir):
    """§2.9 OPSiteFingerprint, slot-for-slot (reference
    ml_prediction.py:186,226; consumed slots at :204-205,:251-259) —
    supersedes the m28 Steinhardt-proxy analog for the ml10/ml12
    descriptor slots. Per-material reductions of the nine per-site
    motif fingerprints computed under the published scheme (adaptive
    ≥12-neighbor shell, relative-distance binning at dr ± ddr,
    zero_ops prefix-CN matching, (mean 1/drel)² weighting, median
    across the three dr variants); kernels per motif: exact
    Chau–Hardwick q_tet, exact Steinhardt q6, exact 1 − d₁/d₂ single-
    bond, Gaussian angular family at the ideal motif angle multisets
    for the rest. Gated on the md5-'0%' material sample (constant gate
    cost at any corpus scale); the Spark production path is the
    mapInPandas kernel over the full corpus."""
    from oxi_diel_db_spark.operators.op_fingerprint import (
        op_fingerprint_sites,
    )

    m = M.materials(spark).filter(F.md5("mp_id").startswith("0"))
    per_site = op_fingerprint_sites(m)
    return per_site.groupBy("mp_id").agg(
        F.count(F.lit(1)).alias("n_sites"),
        _r6n(F.max("tet"), "tet_max"),
        _r6n(F.max("seesaw"), "seesaw_max"),
        _r6n(F.avg("sgl_bd"), "sgl_bd_mean"),
        _r6n(F.avg("bent150"), "bent150_mean"),
        _r6n(F.avg("lin"), "lin_mean"),
        _r6n(F.avg("tri_plan"), "tri_plan_mean"),
        _r6n(F.stddev_pop("pent_plan"), "pent_plan_std"),
        _r6n(F.max("oct"), "oct_max"),
        _r6n(F.stddev_pop("oct"), "oct_std"),
        _r6n(F.avg("q6"), "q6_mean"),
    )
