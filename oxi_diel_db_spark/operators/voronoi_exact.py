"""Exact periodic Voronoi tessellation (§2.9 VoronoiFingerprint,
reference ml_prediction.py:187,227 ``VoronoiFingerprint(
use_symm_weights=True)``).

Replaces the r1-era bounded-radius midpoint analog
(site_features.voronoi_neighbors) for the ml10/ml12 descriptor slots
with the REAL tessellation: for every site, the Voronoi cell against
all periodic images within ``CUT`` is built by half-space vertex
enumeration —

  1. candidate planes: perpendicular bisectors of site→image vectors,
     capped to the K nearest (plus distance ties); planes beyond the
     cap cannot cut the cell when every final vertex lies within
     d_K/2 of the site (asserted corpus-wide in pytest);
  2. vertices: all 3-plane intersections (closed-form Cramer — NOT a
     LAPACK solve, so the float expression shape is reproducible in
     the DuckDB oracle), kept iff they satisfy every half-space;
  3. faces: vertex/plane incidence; a face exists iff ≥3 distinct
     vertices lie on the plane. Face area and solid angle come from a
     fan over the boundary-ordered vertices (Voronoi faces are convex,
     so angle-around-centroid ordering IS the boundary order); the
     sub-polyhedron volume is area·(d/2)/3.

Exactness witness: the sub-volumes of all faces of all sites sum to
the LATTICE volume (the cells tile the cell) — gated to 6 dp in the
registered m37 output and pytest-checked on analytic lattices (sc
cube 6 faces, bcc truncated octahedron 8 hexagons + 6 squares, fcc
rhombic dodecahedron 12 rhombi).

Per-face quantities mirror matminer's VoronoiFingerprint inputs
(face area, neighbor distance, sub-polyhedron volume, vertex count,
solid angle); the symmetry-weighted index_n is the solid-angle-
weighted share of faces with n boundary vertices (3 ≤ n ≤ 10), per
the public matminer featurizer contract.

Float-expression conventions shared with the SQL oracle (the repo's
cross-engine hash rule): squared norms associate ((x*x + y*y) + z*z),
Cramer cofactors expand in the canonical column order, thresholds
carry the same literal tolerances, and candidate ordering ties break
on (j, oa, ob, oc).
"""

from __future__ import annotations

from collections.abc import Iterator
from itertools import combinations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Candidate-image cutoff (Å). matminer's VoronoiFingerprint default
#: is 6.5, which this corpus's layered oxides genuinely exceed (cells
#: with a >6.5 Å interlayer neighbor go OPEN — the closure guard
#: caught them); 10.0 certifies every cell, and the adaptive stage-B
#: bound keeps the triple cost unchanged (only candidate generation
#: scales with the cutoff).
CUT = 10.0
#: Stage-A nearest-plane cap (plus ties) — only bounds the cell, so
#: correctness never depends on it; stage B adapts to the bound. 24
#: left one corpus site's bound loose enough to fail certification
#: (mp-28244 site 4: stage-A vertex 5.2 Å vs true cell 2.66 Å); 32
#: certifies the full corpus.
K_PLANES = 32
#: |det| below this ⇒ the 3 planes are near-parallel, no vertex.
DET_TOL = 1e-10
#: Half-space slack (Å) and on-plane face-membership tolerance (Å).
HS_TOL = 1e-6
FACE_TOL = 1e-5
#: Vertex dedup grid (decimals). Duplicate solves of one geometric
#: vertex differ by Cramer noise (~1e-9 Å, bounded by DET_TOL), so a
#: 1e-5 grid merges them safely while keeping the corpus's thinnest
#: real sliver faces alive (a 4-dp grid collapsed a ~2.6e-4 sr face
#: and broke the closure guard).
DEDUP_DP = 5

_TRI_CACHE: dict[int, np.ndarray] = {}


def _triples(k: int) -> np.ndarray:
    if k not in _TRI_CACHE:
        _TRI_CACHE[k] = (
            np.array(list(combinations(range(k), 3)), dtype=np.int64)
            if k >= 3
            else np.empty((0, 3), dtype=np.int64)
        )
    return _TRI_CACHE[k]


def candidate_images(
    abc: np.ndarray,
    lat: np.ndarray,
    cutoff: float = CUT,
    sites: "np.ndarray | list[int] | None" = None,
) -> tuple[np.ndarray, np.ndarray]:
    """All periodic-image displacement vectors within ``cutoff`` of
    each site, from FRACTIONAL coordinates (``structure.sites.abc`` —
    the same column the SQL twin reads, so both engines build the
    identical candidate set). Returns (vecs, meta): vecs[s] is the
    (m_s, 3) array of site-s→image cartesian vectors sorted by
    (d, j, oa, ob, oc); meta[s] the matching (m_s, 4) [j, oa, ob, oc].

    ``sites`` restricts the ORIGIN sites computed (targets j always
    span the full cell); vecs/meta are then indexed by position in
    ``sites``. Per-site arithmetic is untouched — vecs for site s is
    bit-identical with or without the restriction (the r11 site-level
    parallel path behind exact_site_features relies on this; asserted
    in tests/test_voronoi_exact.py).

    Offsets range per axis over ceil(cutoff / h_axis) + 1 — the +1
    covers |Δfrac| up to 1 for site pairs near opposite cell faces
    (without it, boundary pairs lose images and cells go open — found
    by the closure guard on the real corpus). The widened grid is then
    cut by the exact per-axis projection bound |o + Δf|·h ≤ cutoff
    (the displacement's component along each reciprocal direction is a
    distance lower bound) before any cartesian math."""
    # explicit cofactor det + cross norms (not np.linalg) — the SQL
    # twin mirrors these exact expressions
    vol = float(
        abs(
            lat[0, 0] * (lat[1, 1] * lat[2, 2] - lat[1, 2] * lat[2, 1])
            - lat[0, 1] * (lat[1, 0] * lat[2, 2] - lat[1, 2] * lat[2, 0])
            + lat[0, 2] * (lat[1, 0] * lat[2, 1] - lat[1, 1] * lat[2, 0])
        )
    )

    def _xnorm(u, v):
        cx = u[1] * v[2] - u[2] * v[1]
        cy = u[2] * v[0] - u[0] * v[2]
        cz = u[0] * v[1] - u[1] * v[0]
        return np.sqrt((cx * cx + cy * cy) + cz * cz)

    h = np.array(
        [
            vol / _xnorm(lat[1], lat[2]),
            vol / _xnorm(lat[0], lat[2]),
            vol / _xnorm(lat[0], lat[1]),
        ]
    )
    na, nb, nc = (np.ceil(cutoff / h) + 1).astype(int)
    oa, ob, oc = np.meshgrid(
        np.arange(-na, na + 1),
        np.arange(-nb, nb + 1),
        np.arange(-nc, nc + 1),
        indexing="ij",
    )
    offs = np.stack([oa.ravel(), ob.ravel(), oc.ravel()], axis=1)  # (O,3)
    n = len(abc)
    origins = np.arange(n) if sites is None else np.asarray(sites, dtype=int)
    # fractional displacement i→image(j,o): abc[j] + o − abc[i]
    df = (
        abc[None, :, None, :]
        + offs[None, None, :, :]
        - abc[origins, None, None, :]
    )  # (n_origins, n_j, O, 3)
    df_flat = df.reshape(len(origins), -1, 3)
    j_ids = np.repeat(np.arange(n), len(offs))
    off_ids = np.tile(offs, (n, 1))
    vecs_out, meta_out = [], []
    cut2 = cutoff * cutoff
    for i in range(len(origins)):
        f = df_flat[i]
        pre = (np.abs(f) * h[None, :] <= cutoff).all(axis=1)
        f = f[pre]
        # explicit components (not @): BLAS accumulation order is not
        # reproducible in the SQL twin; left-assoc mirrors the oracle
        v = np.column_stack(
            [
                (f[:, 0] * lat[0, 0] + f[:, 1] * lat[1, 0])
                + f[:, 2] * lat[2, 0],
                (f[:, 0] * lat[0, 1] + f[:, 1] * lat[1, 1])
                + f[:, 2] * lat[2, 1],
                (f[:, 0] * lat[0, 2] + f[:, 1] * lat[1, 2])
                + f[:, 2] * lat[2, 2],
            ]
        )
        d2 = (v[:, 0] * v[:, 0] + v[:, 1] * v[:, 1]) + v[:, 2] * v[:, 2]
        keep = (d2 > 1e-12) & (d2 <= cut2)
        vk, d2k = v[keep], d2[keep]
        jk, ok = j_ids[pre][keep], off_ids[pre][keep]
        order = np.lexsort((ok[:, 2], ok[:, 1], ok[:, 0], jk, d2k))
        vecs_out.append(vk[order])
        meta_out.append(
            np.column_stack([jk[order], ok[order]]).astype(np.int64)
        )
    return vecs_out, meta_out


def _solve_triples(
    nrm: np.ndarray, dh: np.ndarray, idx: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Intersection points of all 3-plane combinations drawn from the
    plane subset ``idx`` — closed-form Cramer in the canonical cofactor
    order (mirrors the SQL twin; never a LAPACK solve). Returns
    (points, triples): the generating plane triple of each point, in
    lexicographic triple order (combinations enumerate lex-sorted, so
    "first occurrence" below is the lex-smallest generator — the same
    deterministic representative rule the SQL twin's row_number
    uses)."""
    tri = idx[_triples(len(idx))]
    if len(tri) == 0:
        return np.empty((0, 3)), np.empty((0, 3), dtype=np.int64)
    n1, n2, n3 = nrm[tri[:, 0]], nrm[tri[:, 1]], nrm[tri[:, 2]]
    b1, b2, b3 = dh[tri[:, 0]], dh[tri[:, 1]], dh[tri[:, 2]]
    c1 = n2[:, 1] * n3[:, 2] - n2[:, 2] * n3[:, 1]
    c2 = n2[:, 0] * n3[:, 2] - n2[:, 2] * n3[:, 0]
    c3 = n2[:, 0] * n3[:, 1] - n2[:, 1] * n3[:, 0]
    det = n1[:, 0] * c1 - n1[:, 1] * c2 + n1[:, 2] * c3
    ok = np.abs(det) > DET_TOL
    if not ok.any():
        return np.empty((0, 3)), np.empty((0, 3), dtype=np.int64)
    tri = tri[ok]
    n1, n2, n3 = n1[ok], n2[ok], n3[ok]
    b1, b2, b3 = b1[ok], b2[ok], b3[ok]
    c1, c2, c3, det = c1[ok], c2[ok], c3[ok], det[ok]
    x = (
        b1 * c1
        - n1[:, 1] * (b2 * n3[:, 2] - n2[:, 2] * b3)
        + n1[:, 2] * (b2 * n3[:, 1] - n2[:, 1] * b3)
    ) / det
    y = (
        n1[:, 0] * (b2 * n3[:, 2] - n2[:, 2] * b3)
        - b1 * c2
        + n1[:, 2] * (n2[:, 0] * b3 - b2 * n3[:, 0])
    ) / det
    z = (
        n1[:, 0] * (n2[:, 1] * b3 - b2 * n3[:, 1])
        - n1[:, 1] * (n2[:, 0] * b3 - b2 * n3[:, 0])
        + b1 * c3
    ) / det
    return np.column_stack([x, y, z]), tri


def voronoi_cell_faces(
    vecs: np.ndarray, lat: np.ndarray, k_planes: int = K_PLANES,
    cutoff: float = CUT,
) -> tuple[list[dict], float]:
    """Faces of the Voronoi cell at the origin given candidate image
    vectors ``vecs`` (sorted by distance) and the lattice matrix.
    Returns (faces, max_vr): one dict per face — candidate index
    ``cand``, ``n_verts``, ``area``, ``dist`` (full neighbor
    distance), ``vol`` (sub-polyhedron), ``omega`` (solid angle) —
    plus the max vertex radius.

    Two-stage adaptive construction (exact; the triple count adapts to
    each site instead of paying a worst-case flat cap):

    * Stage A bounds the cell rigorously: the polytope of the K
      nearest planes PLUS the six ±lattice-vector bisectors CONTAINS
      the true cell (more planes only shrink it, and the six lattice
      planes — true Voronoi constraints, since the site's own
      translates are always neighbors — span 3D, so the polytope is
      bounded by construction; a nearest-K-only stage A can leave a
      direction cone open and silently under-bound). Its max vertex
      radius r̂ therefore upper-bounds every true vertex radius, so
      every face-forming plane satisfies d/2 ≤ r̂.
      (A cheaper 98-direction ray-extent bound was tried and measured
      corpus-wide at worst 1.43× below the true radius — too loose to
      certify within cutoff/2 — so the rigorous polytope stays.)
    * Stage B is exact within the bound: triples over ALL planes with
      d ≤ 2r̂ (+tol), vertices kept within r̂ (+tol) and inside every
      stage-B plane. Planes beyond 2r̂ cannot cut points within r̂,
      so the result is the true cell.

    Guards (violations raise — wrong geometry is never emitted
    silently; the corpus-wide pytest proves neither fires at the gate,
    so the raise-free SQL twin stays in parity): the radius guard
    rejects any stage-A vertex beyond cutoff/2 (planes beyond the
    candidate cutoff are unknown, so the bound would be unsound), and
    the closure guard requires the final face solid angles to tile the
    sphere (Σω = 4π), catching any open cell."""
    d2 = (vecs[:, 0] * vecs[:, 0] + vecs[:, 1] * vecs[:, 1]) + vecs[
        :, 2
    ] * vecs[:, 2]
    d = np.sqrt(d2)
    m = len(d)
    if m < 4:
        raise ValueError(
            f"only {m} candidate planes within cutoff — cell cannot be "
            "bounded; raise cutoff"
        )
    nrm = vecs / d[:, None]  # unit normals, ALL candidates
    dh = d * 0.5  # plane offsets
    # --- stage A: rigorous radius bound ---
    lat_d = np.sqrt(
        (lat[:, 0] * lat[:, 0] + lat[:, 1] * lat[:, 1])
        + lat[:, 2] * lat[:, 2]
    )
    lat_nrm = np.concatenate([lat / lat_d[:, None], -lat / lat_d[:, None]])
    lat_dh = np.concatenate([lat_d, lat_d]) * 0.5
    nrm_a = np.concatenate([nrm, lat_nrm])
    dh_a = np.concatenate([dh, lat_dh])
    ka = int((d <= d[min(k_planes, m) - 1] + 1e-9).sum())  # cap + ties
    idx_a = np.concatenate([np.arange(ka), np.arange(m, m + 6)])
    pts_a, _ = _solve_triples(nrm_a, dh_a, idx_a)
    rmax = cutoff * 0.5 + HS_TOL
    r2a = (pts_a[:, 0] * pts_a[:, 0] + pts_a[:, 1] * pts_a[:, 1]) + pts_a[
        :, 2
    ] * pts_a[:, 2]
    na_, da_ = nrm_a[idx_a], dh_a[idx_a]
    dots_a = (
        pts_a[:, 0:1] * na_[None, :, 0].reshape(1, -1)
        + pts_a[:, 1:2] * na_[None, :, 1].reshape(1, -1)
    ) + pts_a[:, 2:3] * na_[None, :, 2].reshape(1, -1)
    ins_a = (dots_a <= da_[None, :] + HS_TOL).all(axis=1)
    if not ins_a.any():
        raise ValueError("stage-A polytope has no vertices; raise cutoff")
    if (ins_a & (r2a > rmax * rmax)).any():
        raise ValueError(
            "voronoi cell not certifiably bounded within cutoff/2 "
            f"(stage-A vertex at r={np.sqrt(r2a[ins_a].max()):.3f} > "
            f"{rmax:.3f}); raise cutoff"
        )
    r_b = float(np.sqrt(r2a[ins_a].max()))
    # --- stage B: exact cell from every plane within the bound ---
    kb = int((d <= 2.0 * r_b + 1e-6).sum())  # sorted prefix
    pts, tri = _solve_triples(nrm, dh, np.arange(kb))
    r2 = (pts[:, 0] * pts[:, 0] + pts[:, 1] * pts[:, 1]) + pts[
        :, 2
    ] * pts[:, 2]
    rb = r_b + HS_TOL
    near = r2 <= rb * rb
    pts, tri = pts[near], tri[near]
    dots_b = (
        pts[:, 0:1] * nrm[None, :kb, 0].reshape(1, -1)
        + pts[:, 1:2] * nrm[None, :kb, 1].reshape(1, -1)
    ) + pts[:, 2:3] * nrm[None, :kb, 2].reshape(1, -1)
    inside = (dots_b <= dh[None, :kb] + HS_TOL).all(axis=1)
    pts, tri = pts[inside], tri[inside]
    if len(pts) < 4:
        raise ValueError(
            "stage-B polytope has fewer than 4 vertices — cell cannot "
            "be bounded; raise cutoff"
        )
    max_vr = float(
        np.sqrt(
            (
                (pts[:, 0] * pts[:, 0] + pts[:, 1] * pts[:, 1])
                + pts[:, 2] * pts[:, 2]
            ).max()
        )
    )
    # Face membership comes from the GENERATING triples: a vertex on q
    # planes is solved by every 3-subset of them, so each of its
    # (vertex, face) incidences has a generator containing that plane —
    # complete by construction, with no coordinate tolerance to lose a
    # membership at near-degenerate vertices (a tolerance test on a
    # deduped representative dropped faces to 1-2 vertices on the real
    # corpus and broke closure). Duplicate solves of the same geometric
    # vertex are deduped PER FACE on the 5-dp (DEDUP_DP) grid; the
    # representative is the first (lex-smallest generating triple)
    # occurrence.
    key = np.round(pts + 1e-9, DEDUP_DP)
    faces: list[dict] = []
    for p in range(kb):
        on_p = (tri == p).any(axis=1)
        if not on_p.any():
            continue
        kp = key[on_p]
        _, first = np.unique(
            kp.view([("x", float), ("y", float), ("z", float)]).ravel(),
            return_index=True,
        )
        mem = pts[on_p][np.sort(first)]
        nv = len(mem)
        if nv < 3:
            continue
        nhat = nrm[p]
        cen = mem.mean(axis=0)
        rel = mem - cen
        # in-plane basis anchored at the first member (dedup order);
        # explicit component math mirrors the SQL twin
        e1n = np.sqrt(
            (rel[0, 0] * rel[0, 0] + rel[0, 1] * rel[0, 1])
            + rel[0, 2] * rel[0, 2]
        )
        e1 = rel[0] / e1n
        e2 = np.array(
            [
                nhat[1] * e1[2] - nhat[2] * e1[1],
                nhat[2] * e1[0] - nhat[0] * e1[2],
                nhat[0] * e1[1] - nhat[1] * e1[0],
            ]
        )
        theta = np.arctan2(
            (rel[:, 0] * e2[0] + rel[:, 1] * e2[1]) + rel[:, 2] * e2[2],
            (rel[:, 0] * e1[0] + rel[:, 1] * e1[1]) + rel[:, 2] * e1[2],
        )
        ordv = mem[np.argsort(theta, kind="stable")]
        a = ordv - ordv[0]
        cr = np.cross(a[1:-1], a[2:])
        area = 0.5 * float(
            np.sqrt(
                (cr[:, 0] * cr[:, 0] + cr[:, 1] * cr[:, 1])
                + cr[:, 2] * cr[:, 2]
            ).sum()
        )
        # solid angle: Van Oosterom–Strackee over the same fan, apex
        # at the site (origin)
        va = ordv[0]
        la = np.linalg.norm(va)
        vb, vc = ordv[1:-1], ordv[2:]
        lb = np.sqrt((vb * vb).sum(axis=1))
        lc = np.sqrt((vc * vc).sum(axis=1))
        tau = (va[None, :] * np.cross(vb, vc)).sum(axis=1)
        dd = (
            la * lb * lc
            + (va[None, :] * vb).sum(axis=1) * lc
            + (va[None, :] * vc).sum(axis=1) * lb
            + (vb * vc).sum(axis=1) * la
        )
        omega = float(np.abs(2.0 * np.arctan2(tau, dd)).sum())
        faces.append(
            {
                "cand": p,
                "n_verts": nv,
                "area": area,
                "dist": float(d[p]),
                "vol": area * float(dh[p]) / 3.0,
                "omega": omega,
            }
        )
    # closure: face solid angles of a bounded cell tile the sphere
    # (sliver faces collapsed by the 5-dp dedup cost ≲1e-6 sr)
    omega_sum = sum(f["omega"] for f in faces)
    if abs(omega_sum - 4.0 * np.pi) > 1e-4:
        raise ValueError(
            f"voronoi cell not closed (Σω = {omega_sum:.6f} ≠ 4π); "
            "raise K_PLANES or cutoff"
        )
    return faces, max_vr


# ---- Spark surface -------------------------------------------------------

VORX_SCHEMA = (
    "mp_id string, site_idx int, n_faces int, symw4 double, "
    "area_min double, area_max double, area_std double, "
    "dist_min double, dist_mean double, dist_std double, vol_max double, "
    "vol_sum double, omega_sum double"
)


def voronoi_fingerprint_sites(
    materials: DataFrame, slim: DataFrame | None = None
) -> DataFrame:
    """Per-site exact-tessellation VoronoiFingerprint statistics (the
    matminer per-site block the reference's SiteFeaturizer reduces,
    ml_prediction.py:187,227): population-std/min/max over FACE areas,
    neighbor distances and sub-polyhedron volumes, plus the solid-
    angle-weighted share of 4-vertex faces (Symmetry_weighted_index_4,
    faces with 3-10 vertices). ``vol_sum``/``omega_sum`` are the
    exactness witnesses (Σvol over a material's sites == lattice
    volume; Σω == 4π per site).

    Same mapInPandas shape as the other site kernels — one Arrow
    crossing per partition, per-material numpy, embarrassingly
    parallel at corpus scale (no joins, no shuffle beyond the
    _spread rebalance)."""
    from oxi_diel_db_spark.operators.site_features import _spread

    own = materials.select(
        "mp_id",
        F.col("structure.sites.abc").alias("abc"),
        F.col("structure.lattice.matrix").alias("lat"),
    )

    def _vor(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "mp_id", "site_idx", "n_faces", "symw4", "area_min",
                "area_max", "area_std", "dist_min", "dist_mean",
                "dist_std", "vol_max", "vol_sum", "omega_sum",
            )}
            for mp_id, abc, lat in zip(pdf["mp_id"], pdf["abc"], pdf["lat"]):
                fr = np.array([np.asarray(p, dtype=float) for p in abc])
                lt = np.array([np.asarray(r, dtype=float) for r in lat])
                vecs, _ = candidate_images(fr, lt)
                for s in range(len(fr)):
                    faces, _ = voronoi_cell_faces(vecs[s], lt)
                    ar = np.array([f["area"] for f in faces])
                    di = np.array([f["dist"] for f in faces])
                    vo = np.array([f["vol"] for f in faces])
                    om = np.array([f["omega"] for f in faces])
                    nv = np.array([f["n_verts"] for f in faces])
                    idx_ok = (nv >= 3) & (nv <= 10)
                    wsum = om[idx_ok].sum()
                    w4 = om[idx_ok & (nv == 4)].sum()
                    out["mp_id"].append(mp_id)
                    out["site_idx"].append(s)
                    out["n_faces"].append(len(faces))
                    out["symw4"].append(
                        float(w4 / wsum) if wsum > 0 else None
                    )
                    out["area_min"].append(float(ar.min()))
                    out["area_max"].append(float(ar.max()))
                    out["area_std"].append(float(ar.std()))
                    out["dist_min"].append(float(di.min()))
                    out["dist_mean"].append(float(di.mean()))
                    out["dist_std"].append(float(di.std()))
                    out["vol_max"].append(float(vo.max()))
                    out["vol_sum"].append(float(vo.sum()))
                    out["omega_sum"].append(float(om.sum()))
            yield pd.DataFrame(out)

    return (_spread(own) if slim is None else slim).mapInPandas(
        _vor, schema=VORX_SCHEMA
    )
