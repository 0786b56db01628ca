"""Exact periodic Voronoi tessellation (operators/voronoi_exact.py —
§2.9 VoronoiFingerprint, reference ml_prediction.py:187,227).

The analytic lattices pin the geometry to textbook ground truth:
face counts AND face shapes (bcc's truncated octahedron = 8 hexagons
+ 6 squares), exact face areas/volumes, 4π solid-angle closure, and
the space-filling invariant Σ(sub-volumes over all sites) == lattice
volume. The corpus test runs the same invariants over a deterministic
sample plus the guard-never-fires certification that the hash-gated
oracle relies on (the SQL twin cannot raise, so the kernel's guards
must be provably idle on the gated fixture — the full 1,278-material
sweep runs in the round log; here a 150-material sample keeps CI
fast)."""

from __future__ import annotations

import numpy as np
import pytest

from oxi_diel_db_spark.operators.voronoi_exact import (
    CUT,
    candidate_images,
    voronoi_cell_faces,
)


def _cells(lat, frac):
    lat = np.asarray(lat, dtype=float)
    frac = np.asarray(frac, dtype=float)
    vecs, _ = candidate_images(frac, lat)
    out = []
    for s in range(len(frac)):
        out.append(voronoi_cell_faces(vecs[s], lat))
    return lat, out


FOUR_PI = 4.0 * np.pi


def test_sc_cube():
    a = 3.0
    lat, cells = _cells(np.diag([a, a, a]), [[0, 0, 0]])
    faces, _ = cells[0]
    assert len(faces) == 6
    assert all(f["n_verts"] == 4 for f in faces)
    assert all(abs(f["area"] - a * a) < 1e-9 for f in faces)
    assert all(abs(f["dist"] - a) < 1e-12 for f in faces)
    assert abs(sum(f["vol"] for f in faces) - a**3) < 1e-9
    assert abs(sum(f["omega"] for f in faces) - FOUR_PI) < 1e-9


def test_bcc_truncated_octahedron():
    a = 4.0
    lat, cells = _cells(
        np.diag([a, a, a]), [[0, 0, 0], [0.5, 0.5, 0.5]]
    )
    total = 0.0
    for faces, _ in cells:
        shapes = sorted(f["n_verts"] for f in faces)
        assert shapes == [4] * 6 + [6] * 8  # squares + hexagons
        total += sum(f["vol"] for f in faces)
        assert abs(sum(f["omega"] for f in faces) - FOUR_PI) < 1e-9
        # hexagonal faces belong to the 8 nearest (body-diagonal)
        # neighbors at d = a√3/2; square faces to the 6 at d = a
        hex_d = sorted(f["dist"] for f in faces if f["n_verts"] == 6)
        assert all(abs(d - a * np.sqrt(3) / 2) < 1e-9 for d in hex_d)
        sq_d = [f["dist"] for f in faces if f["n_verts"] == 4]
        assert all(abs(d - a) < 1e-9 for d in sq_d)
    assert abs(total - a**3) < 1e-8


def test_fcc_rhombic_dodecahedron():
    a = 4.0
    lat, cells = _cells(
        np.diag([a, a, a]),
        [[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]],
    )
    total = 0.0
    for faces, _ in cells:
        assert sorted(f["n_verts"] for f in faces) == [4] * 12
        total += sum(f["vol"] for f in faces)
    assert abs(total - a**3) < 1e-8


def test_hcp_trapezo_rhombic():
    a, c = 3.0, 4.9
    lat = [[a, 0, 0], [-a / 2, a * np.sqrt(3) / 2, 0], [0, 0, c]]
    lat, cells = _cells(lat, [[1 / 3, 2 / 3, 0.25], [2 / 3, 1 / 3, 0.75]])
    vol = abs(np.linalg.det(lat))
    total = sum(sum(f["vol"] for f in faces) for faces, _ in cells)
    assert abs(total - vol) < 1e-8
    assert all(len(faces) == 12 for faces, _ in cells)


def test_triclinic_closure():
    lat = [[3.1, 0.2, 0.1], [0.4, 4.0, 0.3], [0.2, 0.5, 5.0]]
    lat, cells = _cells(lat, [[0.1, 0.2, 0.3], [0.6, 0.7, 0.8]])
    vol = abs(np.linalg.det(lat))
    total = sum(sum(f["vol"] for f in faces) for faces, _ in cells)
    assert abs(total - vol) < 1e-8
    for faces, _ in cells:
        assert abs(sum(f["omega"] for f in faces) - FOUR_PI) < 1e-4


def test_uncertifiable_cell_raises():
    """A lone site in a 12 Å cube owns the whole cell — vertices at
    6√3 ≈ 10.4 Å exceed cutoff/2 = 5 Å, so the guards must refuse
    rather than emit wrong geometry."""
    lat = np.diag([12.0, 12.0, 12.0])
    vecs, _ = candidate_images(np.array([[0.0, 0.0, 0.0]]), lat)
    with pytest.raises(ValueError, match="bounded|closed"):
        voronoi_cell_faces(vecs[0], lat)


def test_boundary_pair_slab_cells():
    """Two sites 0.28 Å apart through the cell corner: thin slab
    cells, still exactly space-filling — the image-completeness case
    that broke the naive offset grid."""
    lat = np.diag([4.0, 4.0, 4.0])
    frac = [[0.02, 0.02, 0.02], [0.98, 0.98, 0.98]]
    vecs, _ = candidate_images(np.array(frac), lat)
    total = 0.0
    for s in range(2):
        faces, _ = voronoi_cell_faces(vecs[s], lat)
        assert abs(sum(f["omega"] for f in faces) - FOUR_PI) < 1e-4
        total += sum(f["vol"] for f in faces)
    assert abs(total - 64.0) < 1e-6


def test_corpus_invariants_and_guards():
    """Deterministic 150-material sample: every cell closes (Σω = 4π),
    cells tile the cell volume, no guard fires, max vertex radius
    stays inside the certification bound, and the corpus min cell
    height clears the fixed ±9 offset table shared by BOTH SQL twins
    at the LARGER cutoff — ±9 offsets cover cutoff C when (9−1)·h ≥ C
    (the −1 absorbs fractional site offsets up to one cell), so the
    binding bound is h ≥ 12/8 = 1.5 Å from the OPSF twin's 12 Å pool,
    not the Voronoi twin's 10/8 = 1.25 Å. Also certifies the OPSF
    kernel's candidate-pool adequacy: the adaptive shell radius is
    max(6, ceil(d12)), so every site's 12th-nearest periodic neighbor
    must sit within the 12 Å pool (op_fingerprint.py cites this
    assertion)."""
    import duckdb

    con = duckdb.connect()
    rows = con.execute(
        """SELECT mp_id, structure.lattice.matrix,
                  [s.abc FOR s IN structure.sites],
                  structure.lattice.volume
           FROM read_parquet('data/materials.parquet/*.parquet')
           ORDER BY md5(mp_id) LIMIT 150"""
    ).fetchall()
    assert len(rows) == 150
    for mp_id, m, abc, vol in rows:
        lat = np.array(m)
        fr = np.array([np.array(p) for p in abc])
        # SQL-twin offset-table coverage bound at the max cutoff
        # (OPSF twin: 12 Å over the same ±9 table → h ≥ 12/8)
        v = abs(np.linalg.det(lat))
        for u, w in ((1, 2), (0, 2), (0, 1)):
            h = v / np.linalg.norm(np.cross(lat[u], lat[w]))
            assert h >= 12.0 / 8.0, (mp_id, h)
        # OPSF candidate-pool adequacy: adaptive shell radius is
        # max(6, ceil(d12)) ≤ 12 requires d12 ≤ 12 Å for every site
        vecs12, _ = candidate_images(fr, lat, cutoff=12.0)
        for s in range(len(fr)):
            d = np.sort(np.linalg.norm(vecs12[s], axis=1))
            assert len(d) >= 12 and d[11] <= 12.0, (
                mp_id,
                s,
                d[11] if len(d) >= 12 else len(d),
            )
        vecs, _ = candidate_images(fr, lat)
        total = 0.0
        for s in range(len(fr)):
            faces, max_vr = voronoi_cell_faces(vecs[s], lat)  # no raise
            assert faces, (mp_id, s)
            assert max_vr <= CUT / 2
            assert (
                abs(sum(f["omega"] for f in faces) - FOUR_PI) < 1e-4
            ), (mp_id, s)
            total += sum(f["vol"] for f in faces)
        assert abs(total - vol) < 2e-4 * max(1.0, vol / 100.0), (
            mp_id,
            total,
            vol,
        )


def test_fused_exact_site_features_bit_identical(spark):
    """The r11 fused OPSF+Voronoi pass must be BIT-identical to the two
    standalone kernels: (a) candidate_images(sites=subset) returns the
    same arrays as the full build's subset, (b) the 12 Å pool filtered
    to d² ≤ CUT² equals a dedicated CUT build, (c) the registered
    DataFrames agree cell-for-cell on a corpus slice."""
    import numpy as np
    import duckdb

    from oxi_diel_db_spark.operators.op_fingerprint import (
        exact_site_features,
        op_fingerprint_sites,
    )
    from oxi_diel_db_spark.operators.voronoi_exact import (
        CUT,
        candidate_images,
        voronoi_fingerprint_sites,
    )

    con = duckdb.connect()
    rows = con.execute(
        """SELECT mp_id, structure.lattice.matrix,
                  [s.abc FOR s IN structure.sites]
           FROM read_parquet('data/materials.parquet/*.parquet')
           ORDER BY md5(mp_id) LIMIT 12"""
    ).fetchall()
    for mp_id, m, abc in rows:
        lt = np.array(m)
        fr = np.array([np.array(p) for p in abc])
        full12, meta12 = candidate_images(fr, lt, cutoff=12.0)
        full10, _ = candidate_images(fr, lt)
        sub, subm = candidate_images(
            fr, lt, cutoff=12.0, sites=[0, len(fr) - 1]
        )
        # (a) origin restriction is exact
        assert np.array_equal(sub[0], full12[0])
        assert np.array_equal(subm[1], meta12[len(fr) - 1])
        # (b) d² prefix of the 12 Å pool == dedicated 10 Å build
        for s in range(len(fr)):
            v12 = full12[s]
            d2 = (
                v12[:, 0] * v12[:, 0] + v12[:, 1] * v12[:, 1]
            ) + v12[:, 2] * v12[:, 2]
            assert np.array_equal(v12[d2 <= CUT * CUT], full10[s])

    # (c) registered-surface equality on a 12-material slice
    from pyspark.sql import functions as F

    from oxi_diel_db_spark.sources import materials as M

    mats = (
        M.materials(spark)
        .withColumn("_h", F.md5("mp_id"))
        .orderBy("_h")
        .limit(12)
        .drop("_h")
    )
    key = lambda r: (r["mp_id"], r["site_idx"])  # noqa: E731
    fused = {key(r): r.asDict() for r in exact_site_features(mats).collect()}
    ops = {key(r): r.asDict() for r in op_fingerprint_sites(mats).collect()}
    vor = {
        key(r): r.asDict()
        for r in voronoi_fingerprint_sites(mats).collect()
    }
    assert set(fused) == set(ops) == set(vor)
    for k, f in fused.items():
        for col, v in ops[k].items():
            assert f[col] == v, (k, col)
        for col, v in vor[k].items():
            assert f[col] == v, (k, col)


def test_fused_pass_zero_site_material_emits_no_rows(spark):
    """A zero-site material must yield ZERO rows, matching the
    standalone kernels' behavior — NOT crash. Without the size guard,
    sequence(0, size(abc)-1) = sequence(0, -1) is DESCENDING [0, -1]
    in Spark, so site_idx=-1 reached candidate_images and abc[origins]
    raised IndexError in the Arrow worker (r11 ADVICE, latent — no
    zero-site material exists in the corpus)."""
    from pyspark.sql import functions as F

    from oxi_diel_db_spark.operators.op_fingerprint import (
        exact_site_features,
    )

    a = 3.0
    cubic = [[0.0, 0.0, 0.0]]
    lat = [[a, 0.0, 0.0], [0.0, a, 0.0], [0.0, 0.0, a]]
    slim = spark.createDataFrame(
        [("mp-real", cubic, lat), ("mp-empty", [], lat)],
        "mp_id string, abc array<array<double>>, lat array<array<double>>",
    )
    rows = exact_site_features(slim, slim=slim).collect()
    assert {r["mp_id"] for r in rows} == {"mp-real"}
    assert len(rows) == 1 and rows[0]["site_idx"] == 0
    # sc lattice sanity: 6 square faces (pins that the guard filters
    # rows, not arithmetic)
    assert rows[0]["n_faces"] == 6
