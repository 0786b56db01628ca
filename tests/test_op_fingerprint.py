"""OPSiteFingerprint kernel (operators/op_fingerprint.py — §2.9,
reference ml_prediction.py:186,226).

Perfect-motif structures pin each slot to its analytic value: a
rock-salt site is a perfect octahedron (oct = 1 at CN_6), a zincblende
site a perfect tetrahedron (tet = 1 via Chau–Hardwick), an fcc site a
perfect cuboctahedron (Steinhardt q6 = 0.57452425…), and the sgl_bd
ratio is exact by construction. The first shell of each test lattice
has relative distance 1 for every neighbor, so the (mean 1/drel)²
weight is exactly 1 and the slot equals the raw kernel value."""

from __future__ import annotations

import numpy as np

from oxi_diel_db_spark.operators.op_fingerprint import (
    op_fingerprint_site,
)
from oxi_diel_db_spark.operators.voronoi_exact import candidate_images


def _site0(lat, frac):
    vecs, _ = candidate_images(
        np.asarray(frac, dtype=float), np.asarray(lat, dtype=float),
        cutoff=12.0,
    )
    return op_fingerprint_site(vecs[0])


def test_rocksalt_octahedral():
    a = 4.0  # conventional cell, Na at corners/faces, Cl at edge mids
    frac = [
        [0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5],
        [0.5, 0, 0], [0, 0.5, 0], [0, 0, 0.5], [0.5, 0.5, 0.5],
    ]
    vals = _site0(np.diag([a, a, a]), frac)
    assert abs(vals["oct"] - 1.0) < 1e-9  # perfect octahedron, CN 6
    assert vals["tet"] == 0.0  # no CN_4 shell exists (zero_ops)
    # six equidistant nearest neighbors → d₁ = d₂ → sgl_bd = 0
    assert vals["sgl_bd"] == 0.0


def test_zincblende_tetrahedral():
    a = 5.0
    frac = [
        [0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5],
        [0.25, 0.25, 0.25], [0.75, 0.75, 0.25],
        [0.75, 0.25, 0.75], [0.25, 0.75, 0.75],
    ]
    vals = _site0(np.diag([a, a, a]), frac)
    assert abs(vals["tet"] - 1.0) < 1e-9  # Chau–Hardwick exact 1
    # see-saw kernel at the perfect tetrahedron: all 6 pair angles are
    # 109.47°, far from both 90° and 180° targets → small
    assert vals["seesaw"] < 0.35
    assert vals["oct"] == 0.0  # no CN_6 shell before CN jumps


def test_fcc_q6_cuboctahedron():
    a = 4.0
    frac = [[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]]
    vals = _site0(np.diag([a, a, a]), frac)
    # Steinhardt q6 of the perfect fcc 12-neighbor shell
    assert abs(vals["q6"] - 0.5745242597140698) < 1e-6
    assert vals["oct"] == 0.0 and vals["tet"] == 0.0


def test_linear_chain():
    # widely separated chains along z: first shell is the two axial
    # neighbors → perfect linear CN_2
    lat = np.diag([10.0, 10.0, 3.0])
    vals = _site0(lat, [[0.0, 0.0, 0.0]])
    assert abs(vals["lin"] - 1.0) < 1e-9
    assert vals["bent150"] < 0.2  # 180° is 2.5σ from the 150° target
