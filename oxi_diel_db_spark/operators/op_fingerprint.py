"""OPSiteFingerprint, slot-for-slot (§2.9, reference
ml_prediction.py:186,226 — the nine motif/CN slots the comp_st
descriptors consume at :204-205 and :251-259).

Replaces the r1-era family-level proxies (Steinhardt q4/q6 + q_tet at
a fixed cutoff) with the published OPSiteFingerprint SCHEME: per site,

1. adaptive shell radius r_cut = max(6, ceil(d12)) Å — the smallest
   integer radius ≥ 6 Å holding ≥ 12 periodic neighbors (the
   featurizer's grow-by-1-Å rule);
2. RELATIVE distances drel = d/dmin, smoothed over three bin widths
   dr ∈ {0.09, 0.10, 0.11} (dr ± ddr, ndr = 1): dbin =
   (floor(drel/dr + 0.5) + 0.5)·dr;
3. neighbor shells = prefixes of the sorted distinct dbin values; a
   target motif "X CN_n" is evaluated ONLY on the prefix whose
   coordination number is exactly n (zero_ops: no such prefix → 0),
   weighted by d_fac = (mean over the prefix of 1/drel)², the
   dist_exp = 2 distance penalty;
4. the slot value is the MEDIAN over the three dr variants (the
   engine's deterministic, SQL-expressible reduction of the
   featurizer's dop-binned histogram peak — identical whenever two of
   the three smoothed values agree, which is the designed common
   case).

Motif kernels (pairwise, unit neighbor vectors û):

* sgl_bd CN_1    = 1 − d₁/d₂ over ALL shell neighbors (absolute
                   distances; 1 when a single bond dominates);
* linear CN_2 / bent 150° CN_2 / trigonal planar CN_3 / pentagonal
  planar CN_5 / octahedral CN_6 / rectangular see-saw CN_4 — the
  Gaussian angular family: q = (1/Npairs)·Σ_pairs max_t
  exp(−0.5·((θ − θ_t)/σ)²) with σ = 0.0667·180° = 12.006° and the
  motif's ideal angle multiset θ_t (180° | 150° | 120° | {72°,144°} |
  {90°,180°} | {90°,180°}); a perfect motif scores exactly 1;
* tetrahedral CN_4 = Chau–Hardwick q_tet = 1 − (3/8)·Σ_{j<k}
  (cos θ_jk + 1/3)² (exactly 1 for a perfect tetrahedron);
* q6 CN_12 = Steinhardt l=6 in the pair-average Legendre form
  q6² = (1/N²)·Σ_{j,k} P₆(û_j·û_k) (self-pairs included — the
  spherical-harmonic identity).

The per-motif target-angle kernels and the shell scheme are the
published formulas; the constants (σ, dr, ddr, dist_exp, the 6 Å/12-
neighbor shell rule) are pinned here and mirrored verbatim by the SQL
oracle, so the gate hashes the full numerics cross-engine.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from oxi_diel_db_spark.operators.voronoi_exact import candidate_images

#: Gaussian angular width: 0.0667 of 180°, in radians.
SIGMA = 0.0667 * np.pi
#: dr smoothing variants (dr = 0.1, ddr = 0.01, ndr = 1).
DRS = (0.09, 0.10, 0.11)
#: target-angle multisets (radians) for the Gaussian family
_DEG = np.pi / 180.0
MOTIF_TARGETS = {
    "lin": np.array([180.0]) * _DEG,
    "bent150": np.array([150.0]) * _DEG,
    "tri_plan": np.array([120.0]) * _DEG,
    "pent_plan": np.array([72.0, 144.0]) * _DEG,
    "oct": np.array([90.0, 180.0]) * _DEG,
    "seesaw": np.array([90.0, 180.0]) * _DEG,
}
#: motif → coordination number the slot is evaluated at
MOTIF_CN = {
    "lin": 2,
    "bent150": 2,
    "tri_plan": 3,
    "pent_plan": 5,
    "oct": 6,
    "seesaw": 4,
    "tet": 4,
    "q6": 12,
}

OPX_SCHEMA = (
    "mp_id string, site_idx int, sgl_bd double, lin double, "
    "bent150 double, tri_plan double, pent_plan double, oct double, "
    "seesaw double, tet double, q6 double"
)


def _gauss_kernel(cos_t: np.ndarray, targets: np.ndarray) -> np.ndarray:
    """max over targets of exp(−0.5·((θ − θ_t)/σ)²), θ = arccos."""
    th = np.arccos(np.clip(cos_t, -1.0, 1.0))
    best = None
    for t in targets:
        v = np.exp(-0.5 * ((th - t) / SIGMA) * ((th - t) / SIGMA))
        best = v if best is None else np.maximum(best, v)
    return best


def _p6(c: np.ndarray) -> np.ndarray:
    """Legendre P6 — the same polynomial text as the SQL twin."""
    c2 = c * c
    return (
        (231.0 * c2 * c2 * c2 - 315.0 * c2 * c2) + 105.0 * c2 - 5.0
    ) / 16.0


def op_fingerprint_site(vecs: np.ndarray) -> dict[str, float]:
    """The nine slot values for one site given its candidate image
    vectors (sorted by distance; from voronoi_exact.candidate_images
    at cutoff ≥ the adaptive shell radius)."""
    d2 = (vecs[:, 0] * vecs[:, 0] + vecs[:, 1] * vecs[:, 1]) + vecs[
        :, 2
    ] * vecs[:, 2]
    d = np.sqrt(d2)
    if len(d) < 12:
        raise ValueError("fewer than 12 periodic neighbors in cutoff")
    # adaptive integer shell radius: max(6, ceil(d12))
    r_cut = max(6.0, float(np.ceil(d[11])))
    shell = d <= r_cut
    dv = d[shell]
    uv = vecs[shell] / dv[:, None]
    out: dict[str, float] = {}
    # sgl_bd over ALL shell neighbors (absolute distances)
    out["sgl_bd"] = (
        1.0 - float(dv[0]) / float(dv[1]) if len(dv) > 1 else 1.0
    )
    dmin = float(dv[0])
    drel = dv / dmin
    inv_drel = 1.0 / drel
    per_dr: dict[str, list[float]] = {
        m: [] for m in MOTIF_CN if m != "sgl_bd"
    }
    for this_dr in DRS:
        dbin = (np.floor(drel / this_dr + 0.5) + 0.5) * this_dr
        shells = np.unique(dbin)  # sorted distinct
        got: dict[str, float] = {}
        prev_cn = 0
        for sv in shells:
            sel = dbin <= sv
            cn = int(sel.sum())
            if cn == prev_cn:
                continue
            d_fac = float(inv_drel[sel].mean()) ** 2
            u = uv[sel]
            if cn >= 2:
                jj, kk = np.triu_indices(cn, k=1)
                cos_t = (
                    u[jj, 0] * u[kk, 0] + u[jj, 1] * u[kk, 1]
                ) + u[jj, 2] * u[kk, 2]
            for m, tcn in MOTIF_CN.items():
                if m == "sgl_bd" or tcn != cn or m in got:
                    continue
                if m == "tet":
                    q = 1.0 - 0.375 * float(
                        (
                            (cos_t + 1.0 / 3.0) * (cos_t + 1.0 / 3.0)
                        ).sum()
                    )
                elif m == "q6":
                    cc = (
                        u[:, 0:1] * u[:, 0:1].T
                        + u[:, 1:2] * u[:, 1:2].T
                    ) + u[:, 2:3] * u[:, 2:3].T
                    q = float(np.sqrt(max(_p6(cc).sum() / (cn * cn), 0.0)))
                else:
                    q = float(
                        _gauss_kernel(cos_t, MOTIF_TARGETS[m]).sum()
                        / len(cos_t)
                    )
                got[m] = d_fac * q
            prev_cn = cn
            if prev_cn >= 12:
                break
        for m in per_dr:
            per_dr[m].append(got.get(m, 0.0))
    for m, vals in per_dr.items():
        out[m] = float(np.median(vals))
    return out


def op_fingerprint_sites(
    materials: DataFrame, slim: DataFrame | None = None
) -> DataFrame:
    """Per-site OPSiteFingerprint slots via the shared mapInPandas
    site-kernel shape (one Arrow crossing per partition, per-material
    numpy, no shuffle — the 100 TB form)."""
    from oxi_diel_db_spark.operators.site_features import _spread

    own = materials.select(
        "mp_id",
        F.col("structure.sites.abc").alias("abc"),
        F.col("structure.lattice.matrix").alias("lat"),
    )

    cols = (
        "sgl_bd lin bent150 tri_plan pent_plan oct seesaw tet q6"
    ).split()

    def _ops(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {"mp_id": [], "site_idx": []}
            for c in cols:
                out[c] = []
            for mp_id, abc, lat in zip(pdf["mp_id"], pdf["abc"], pdf["lat"]):
                fr = np.array([np.asarray(p, dtype=float) for p in abc])
                lt = np.array([np.asarray(r, dtype=float) for r in lat])
                # 12 Å candidate pool covers the adaptive shell for
                # every corpus site (d12 ≤ 12 Å per site is asserted
                # by tests/test_voronoi_exact.py corpus certification)
                vecs, _ = candidate_images(fr, lt, cutoff=12.0)
                for s in range(len(fr)):
                    vals = op_fingerprint_site(vecs[s])
                    out["mp_id"].append(mp_id)
                    out["site_idx"].append(s)
                    for c in cols:
                        out[c].append(vals[c])
            yield pd.DataFrame(out)

    return (_spread(own) if slim is None else slim).mapInPandas(
        _ops, schema=OPX_SCHEMA
    )


# ---- fused OPSF + Voronoi pass (r11) --------------------------------------

EXACT_SITE_SCHEMA = (
    OPX_SCHEMA
    + ", n_faces int, symw4 double, area_min double, area_max double,"
    " area_std double, dist_min double, dist_mean double,"
    " dist_std double, vol_max double, vol_sum double, omega_sum double"
)


def exact_site_features(
    materials: DataFrame, slim: DataFrame | None = None
) -> DataFrame:
    """Fused OPSF + VoronoiFingerprint per-site pass behind the
    ml10/ml12 descriptor assemblies: ONE candidate-image build per
    material at the larger (12 Å, OPSF) cutoff serves both kernels —
    the OPSF shell reads it directly; the tessellation takes the
    d² ≤ CUT² prefix. The sub-filter is EXACT, not approximate: both
    cutoffs compute displacement components and d² with the same
    left-associated arithmetic and sort by the same (d², j, o) key,
    and the 12 Å offset range is a superset of the 10 Å one, so the
    filtered array is element-identical to a dedicated 10 Å build
    (asserted corpus-wide in tests/test_voronoi_exact.py). Halves the
    Arrow crossings, image builds and scans of the site projection
    vs running op_fingerprint_sites + voronoi_fingerprint_sites
    separately; per-site outputs are bit-identical to the two
    standalone kernels by construction.

    Parallelism is per SITE, not per material (r11): the input is
    exploded to (mp_id, site_idx) rows before the shuffle, so the
    task critical path is bounded by sites-per-partition instead of
    the material hash skew (measured on the ml10 sample: max bucket
    114 sites vs mean 54 at material granularity — a 2.1× critical
    path). Within a partition, sites of the same material share ONE
    image build via candidate_images(sites=...) — the origin
    restriction keeps per-site arithmetic bit-identical."""
    from oxi_diel_db_spark.operators.voronoi_exact import (
        CUT,
        voronoi_cell_faces,
    )

    own = (
        None
        if slim is not None  # don't resolve structure.* on slim callers
        else materials.select(
            "mp_id",
            F.col("structure.sites.abc").alias("abc"),
            F.col("structure.lattice.matrix").alias("lat"),
        )
    )
    op_cols = (
        "sgl_bd lin bent150 tri_plan pent_plan oct seesaw tet q6"
    ).split()
    vor_cols = (
        "n_faces symw4 area_min area_max area_std dist_min dist_mean"
        " dist_std vol_max vol_sum omega_sum"
    ).split()

    def _both(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cut2 = CUT * CUT
        for pdf in batches:
            out: dict[str, list] = {"mp_id": [], "site_idx": []}
            for c in op_cols + vor_cols:
                out[c] = []
            for (mp_id,), grp in pdf.groupby(["mp_id"], sort=False):
                first = grp.iloc[0]
                fr = np.array(
                    [np.asarray(p, dtype=float) for p in first["abc"]]
                )
                lt = np.array(
                    [np.asarray(r, dtype=float) for r in first["lat"]]
                )
                site_ids = grp["site_idx"].to_numpy()
                vecs12, _ = candidate_images(
                    fr, lt, cutoff=12.0, sites=site_ids
                )
                for pos, s in enumerate(site_ids):
                    v12 = vecs12[pos]
                    ops = op_fingerprint_site(v12)
                    d2 = (
                        v12[:, 0] * v12[:, 0] + v12[:, 1] * v12[:, 1]
                    ) + v12[:, 2] * v12[:, 2]
                    faces, _ = voronoi_cell_faces(v12[d2 <= cut2], lt)
                    ar = np.array([f["area"] for f in faces])
                    di = np.array([f["dist"] for f in faces])
                    vo = np.array([f["vol"] for f in faces])
                    om = np.array([f["omega"] for f in faces])
                    nv = np.array([f["n_verts"] for f in faces])
                    idx_ok = (nv >= 3) & (nv <= 10)
                    wsum = om[idx_ok].sum()
                    w4 = om[idx_ok & (nv == 4)].sum()
                    out["mp_id"].append(mp_id)
                    out["site_idx"].append(int(s))
                    for c in op_cols:
                        out[c].append(ops[c])
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

    # block granularity (8 sites): fine enough to break the material
    # hash skew, coarse enough that image-build calls stay ~2×/material
    # (full per-site fragmentation multiplied the per-call fixed cost
    # — offset meshgrid + id tables — ~15× for no extra balance)
    src = slim if slim is not None else own
    n = 2 * src.sparkSession.sparkContext.defaultParallelism
    # zero-site guard: sequence(0, -1) is DESCENDING [0, -1] in Spark,
    # so an empty material would emit site_idx=-1 and abc[origins]
    # would IndexError in the Arrow worker; the standalone kernels emit
    # zero rows for such a material — match that by filtering first
    src = src.where(F.size("abc") > 0)
    per_site = (
        src.select(
            "mp_id",
            "abc",
            "lat",
            F.posexplode(F.expr("sequence(0, size(abc) - 1)")).alias(
                "_p", "site_idx"
            ),
        )
        .drop("_p")
        .repartition(
            n, F.col("mp_id"), F.floor(F.col("site_idx") / 8)
        )
    )
    return per_site.mapInPandas(_both, schema=EXACT_SITE_SCHEMA)
