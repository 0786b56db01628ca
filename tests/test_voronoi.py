"""Approximate Voronoi neighbors (§2.9 VoronoiFingerprint analog):
the midpoint half-space test must reproduce the known face-neighbor
counts of the cubic lattices for an interior site — simple cubic 6,
bcc 14 (8 corner + 6 axial faces), fcc 12 — and the degenerate
equidistant shells (sc second shell, fcc second shell) must be
excluded, which is exactly what the tolerance term is for."""

from __future__ import annotations

import numpy as np

from oxi_diel_db_spark.operators.site_features import voronoi_neighbors


def _material_df(spark, mp_id, pts):
    rows = [(mp_id, {"sites": [{"xyz": [float(c) for c in p]} for p in pts]})]
    return spark.createDataFrame(
        rows,
        "mp_id string, structure struct<sites: array<struct<xyz: array<double>>>>",
    )


def _cn_at(spark, pts, center):
    idx = next(i for i, p in enumerate(pts) if np.allclose(p, center))
    df = voronoi_neighbors(_material_df(spark, "m", pts))
    return {r["site_idx"]: r["vor_cn"] for r in df.collect()}[idx]


def test_simple_cubic_cn6(spark):
    a = 2.0
    pts = [(i * a, j * a, k * a) for i in range(5) for j in range(5) for k in range(5)]
    assert _cn_at(spark, pts, (4.0, 4.0, 4.0)) == 6


def test_bcc_cn14(spark):
    a = 4.0
    pts = [(i * a, j * a, k * a) for i in range(4) for j in range(4) for k in range(4)]
    pts += [
        ((i + 0.5) * a, (j + 0.5) * a, (k + 0.5) * a)
        for i in range(3)
        for j in range(3)
        for k in range(3)
    ]
    assert _cn_at(spark, pts, (6.0, 6.0, 6.0)) == 14


def test_fcc_cn12(spark):
    a = 4.0
    basis = [(0, 0, 0), (0, 0.5, 0.5), (0.5, 0, 0.5), (0.5, 0.5, 0)]
    pts = [
        ((i + bx) * a, (j + by) * a, (k + bz) * a)
        for i in range(4)
        for j in range(4)
        for k in range(4)
        for bx, by, bz in basis
    ]
    assert _cn_at(spark, pts, (6.0, 6.0, 4.0)) == 12


def test_lone_pair_and_singleton(spark):
    # two sites: each is the other's only Voronoi neighbor; a singleton
    # site has no neighbors and a NULL mean distance
    rows = voronoi_neighbors(
        _material_df(spark, "m", [(0.0, 0.0, 0.0), (2.0, 0.0, 0.0)])
    ).collect()
    assert all(r["vor_cn"] == 1 and r["mean_vor_dist"] == 2.0 for r in rows)
    solo = voronoi_neighbors(_material_df(spark, "m", [(0.0, 0.0, 0.0)])).collect()
    assert solo[0]["vor_cn"] == 0 and solo[0]["mean_vor_dist"] is None
