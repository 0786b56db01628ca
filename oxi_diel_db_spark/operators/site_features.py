"""Site-level featurizer harness (SURVEY.md §2.9 site rows, A6/A7).

The reference computes site features in a per-site Python loop that
re-instantiates the featurizer every iteration
(EwaldSiteEnergy at ml_prediction.py:205,248) and then reduces with
np.max / np.mean / np.std (ml_prediction.py:50-51). The engine shape:

    materials → applyInPandas(per-material batch, vectorized numpy)
              → per-site rows → groupBy(mp_id).agg(...)

One Arrow crossing per partition (not per site), all pairwise math in
numpy. The actual Ewald sum needs pymatgen (absent here); the proxy
below — Σ_j 1/|r_i − r_j| over the sites in the cell — has the same
computational shape (pairwise distance matrix → per-site reduction)
and is deterministic, so the harness is fully testable.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SITE_ENERGY_SCHEMA = "mp_id string, site_idx int, inv_dist_energy double"


def _spread(slim: DataFrame) -> DataFrame:
    """Repartition the slim per-material projection before a pandas
    kernel: the committed corpus is ONE parquet file, so without this
    every mapInPandas below runs as a single task. The partition count
    must be EXPLICIT — these rows are tiny in bytes but heavy in CPU
    (Ewald is O(n_sites²·images) per row), and a bare repartition(col)
    participates in AQE partition coalescing, which sees a few MB of
    shuffle and merges everything back to ONE task (measured: still
    serial). CPU-bound pandas stages must size partitions by compute,
    not bytes. The shuffle moves ~KB-sized arrays for 1278 rows; at
    real corpus scale the scan already has file parallelism and this
    is a cheap rebalance."""
    n = slim.sparkSession.sparkContext.defaultParallelism
    return slim.repartition(n, F.col("mp_id"))


def shared_slim(materials: DataFrame) -> DataFrame:
    """Superset per-material projection (mp_id, xyz, els) serving EVERY
    site kernel below: a descriptor assembly spreads + localCheckpoints
    this ONCE and passes it to each kernel via ``slim=``, collapsing N
    parquet scans + N repartition shuffles into one (r8; ml10 runs six
    kernels, ml12 five). The batch functions read columns by name, so
    the extra ``els`` column is invisible to xyz-only kernels — and the
    kernels' numerics are untouched, so hashes cannot move. At 100 TB
    the same rule applies with a real ``checkpoint()``: the structure
    payload crosses the wire once, not once per featurizer."""
    return materials.select(
        "mp_id",
        F.col("structure.sites.xyz").alias("xyz"),
        F.expr("transform(structure.sites, s -> s.species[0].element)").alias("els"),
    )


def site_inverse_distance_energy(
    materials: DataFrame, slim: DataFrame | None = None
) -> DataFrame:
    """Per-site Σ 1/r proxy energy via mapInPandas (vectorized pairwise
    distances per material — the loop the reference runs per site is a
    single numpy broadcast here)."""
    own = materials.select(
        "mp_id", F.col("structure.sites.xyz").alias("xyz")  # array<array<double>>
    )

    def _energy(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_id, out_idx, out_e = [], [], []
            for mp_id, xyz in zip(pdf["mp_id"], pdf["xyz"]):
                pts = np.array([np.asarray(p, dtype=float) for p in xyz])
                d = np.linalg.norm(pts[:, None, :] - pts[None, :, :], axis=-1)
                np.fill_diagonal(d, np.inf)
                e = (1.0 / d).sum(axis=1)
                out_id.extend([mp_id] * len(pts))
                out_idx.extend(range(len(pts)))
                out_e.extend(e.tolist())
            yield pd.DataFrame(
                {"mp_id": out_id, "site_idx": out_idx, "inv_dist_energy": out_e}
            )

    return (_spread(own) if slim is None else slim).mapInPandas(
        _energy, schema=SITE_ENERGY_SCHEMA
    )


def site_energy_stats(materials: DataFrame) -> DataFrame:
    """A6 (max over sites) + A1/A7 (mean/std, ddof=0) of the site energy
    — the reference's get_from_label_func(label, np.max/np.mean/np.std)
    reduction (ml_prediction.py:50-51) as a grouped aggregate."""
    per_site = site_inverse_distance_energy(materials)
    return per_site.groupBy("mp_id").agg(
        F.round(F.max("inv_dist_energy"), 6).alias("max_site_energy"),
        F.round(F.avg("inv_dist_energy"), 6).alias("mean_site_energy"),
        F.round(F.stddev_pop("inv_dist_energy"), 6).alias("std_site_energy"),
        F.count(F.lit(1)).alias("n_sites"),
    )


MIN_DIST_SCHEMA = "mp_id string, site_idx int, min_dist double"


def site_min_distances(
    materials: DataFrame, slim: DataFrame | None = None
) -> DataFrame:
    """MinimumRelativeDistances (§2.9; reference ml_prediction.py:185):
    per-site nearest-neighbor distance — same mapInPandas pairwise
    kernel as the energy proxy, different reduction."""
    own = materials.select("mp_id", F.col("structure.sites.xyz").alias("xyz"))

    def _mind(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_id, out_idx, out_d = [], [], []
            for mp_id, xyz in zip(pdf["mp_id"], pdf["xyz"]):
                pts = np.array([np.asarray(p, dtype=float) for p in xyz])
                if len(pts) == 1:
                    out_id.append(mp_id); out_idx.append(0); out_d.append(float("nan"))
                    continue
                d = np.linalg.norm(pts[:, None, :] - pts[None, :, :], axis=-1)
                np.fill_diagonal(d, np.inf)
                md = d.min(axis=1)
                out_id.extend([mp_id] * len(pts))
                out_idx.extend(range(len(pts)))
                out_d.extend(md.tolist())
            yield pd.DataFrame({"mp_id": out_id, "site_idx": out_idx, "min_dist": out_d})

    return (_spread(own) if slim is None else slim).mapInPandas(
        _mind, schema=MIN_DIST_SCHEMA
    )


def min_distance_stats(materials: DataFrame) -> DataFrame:
    """A7: np.mean / np.std (ddof=0) over the per-site NN distances
    (reference ml_prediction.py:201-202)."""
    per_site = site_min_distances(materials)
    return per_site.groupBy("mp_id").agg(
        F.round(F.avg("min_dist"), 6).alias("mean_min_dist"),
        F.round(F.stddev_pop("min_dist"), 6).alias("std_min_dist"),
        F.round(F.min("min_dist"), 6).alias("global_min_dist"),
    )


GSF_SCHEMA = "mp_id string, site_idx int, g_eta_05 double, g_eta_4 double"

GSF_FULL_SCHEMA = (
    "mp_id string, site_idx int, g_eta_05 double, g_eta_4 double, "
    "g2_20 double, g2_80 double, g4_m1 double, g4_p1 double"
)


def gaussian_symm_full(
    materials: DataFrame, cutoff: float = 6.0, slim: DataFrame | None = None
) -> DataFrame:
    """GaussianSymmFunc at the reference descriptor's full parameter
    set (ml_prediction.py:208-210, 252-253): radial G2 at η ∈
    {0.5, 4, 20, 80} plus angular G4 at (η=0.005, ζ=4, λ=±1) —
    G4_λ(i) = Σ_{j<k∈N(i)} (1+λ·cosθ_jik)^ζ ·
              exp(−η(d_ij²+d_ik²+d_jk²)/Rc²)
    over in-cell neighbors within the cutoff (the engine's declared
    non-periodic kernel convention, shared by every site featurizer
    here). cosθ comes from unit bond vectors and d_jk² from the law of
    cosines — the identical float shapes the SQL twin replays."""
    own = materials.select("mp_id", F.col("structure.sites.xyz").alias("xyz"))
    etas = (0.5, 4.0, 20.0, 80.0)

    def _gsf(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "mp_id": [], "site_idx": [], "g_eta_05": [], "g_eta_4": [],
                "g2_20": [], "g2_80": [], "g4_m1": [], "g4_p1": [],
            }
            for mp_id, xyz in zip(pdf["mp_id"], pdf["xyz"]):
                pts = np.array([np.asarray(p, dtype=float) for p in xyz])
                n = len(pts)
                dx = pts[None, :, 0] - pts[:, None, 0]
                dy = pts[None, :, 1] - pts[:, None, 1]
                dz = pts[None, :, 2] - pts[:, None, 2]
                d = np.sqrt(dx * dx + dy * dy + dz * dz)
                np.fill_diagonal(d, np.inf)
                within = d <= cutoff
                g2 = []
                for eta in etas:
                    w = np.exp(-eta * (d / cutoff) ** 2) * within
                    g2.append(w.sum(axis=1))
                for i in range(n):
                    nbr = np.where(within[i])[0]
                    g4m = g4p = 0.0
                    for a in range(len(nbr)):
                        for b in range(a + 1, len(nbr)):
                            j, k = nbr[a], nbr[b]
                            cc = (
                                (dx[i, j] / d[i, j]) * (dx[i, k] / d[i, k])
                                + (dy[i, j] / d[i, j]) * (dy[i, k] / d[i, k])
                                + (dz[i, j] / d[i, j]) * (dz[i, k] / d[i, k])
                            )
                            djk2 = (
                                d[i, j] * d[i, j] + d[i, k] * d[i, k]
                                - 2.0 * d[i, j] * d[i, k] * cc
                            )
                            rad = np.exp(
                                -0.005
                                * (d[i, j] * d[i, j] + d[i, k] * d[i, k] + djk2)
                                / (cutoff * cutoff)
                            )
                            om = 1.0 - cc
                            op = 1.0 + cc
                            g4m += om * om * om * om * rad
                            g4p += op * op * op * op * rad
                    out["mp_id"].append(mp_id)
                    out["site_idx"].append(i)
                    out["g_eta_05"].append(float(g2[0][i]))
                    out["g_eta_4"].append(float(g2[1][i]))
                    out["g2_20"].append(float(g2[2][i]))
                    out["g2_80"].append(float(g2[3][i]))
                    out["g4_m1"].append(float(g4m))
                    out["g4_p1"].append(float(g4p))
            yield pd.DataFrame(out)

    return (_spread(own) if slim is None else slim).mapInPandas(
        _gsf, schema=GSF_FULL_SCHEMA
    )


def gaussian_symm_func(materials: DataFrame, etas=(0.5, 4.0), cutoff: float = 6.0) -> DataFrame:
    """GaussianSymmFunc featurizer (§2.9; reference ml_prediction.py:188):
    per-site radial symmetry functions G2 = Σ_j exp(-η(r_ij/σ)²) within
    a cutoff — the third reduction over the same pairwise-distance
    kernel (energy proxy, NN distance, now Gaussian-weighted shells)."""
    slim = materials.select("mp_id", F.col("structure.sites.xyz").alias("xyz"))

    def _gsf(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"mp_id": [], "site_idx": [], "g_eta_05": [], "g_eta_4": []}
            for mp_id, xyz in zip(pdf["mp_id"], pdf["xyz"]):
                pts = np.array([np.asarray(p, dtype=float) for p in xyz])
                d = np.linalg.norm(pts[:, None, :] - pts[None, :, :], axis=-1)
                np.fill_diagonal(d, np.inf)
                within = d <= cutoff
                g = []
                for eta in etas:
                    w = np.exp(-eta * (d / cutoff) ** 2) * within
                    g.append(w.sum(axis=1))
                out["mp_id"].extend([mp_id] * len(pts))
                out["site_idx"].extend(range(len(pts)))
                out["g_eta_05"].extend(g[0].tolist())
                out["g_eta_4"].extend(g[1].tolist())
            yield pd.DataFrame(out)

    return _spread(slim).mapInPandas(_gsf, schema=GSF_SCHEMA)


LPD_SCHEMA = "mp_id string, site_idx int, local_en_diff double"


def local_property_difference(materials: DataFrame, cutoff: float = 5.0) -> DataFrame:
    """LocalPropertyDifference featurizer (§2.9; reference
    ml_prediction.py:189, 'ward-prb-2017' preset): per site, the
    1/d²-weighted mean |Δ electronegativity| to neighbors within the
    cutoff — the same pairwise kernel, now consuming the element column
    and a broadcast property map."""
    from oxi_diel_db_spark.functions.formula import PAULING_EN

    slim = materials.select(
        "mp_id",
        F.col("structure.sites.xyz").alias("xyz"),
        F.expr("transform(structure.sites, s -> s.species[0].element)").alias("els"),
    )

    def _lpd(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"mp_id": [], "site_idx": [], "local_en_diff": []}
            for mp_id, xyz, els in zip(pdf["mp_id"], pdf["xyz"], pdf["els"]):
                pts = np.array([np.asarray(p, dtype=float) for p in xyz])
                chi = np.array([PAULING_EN.get(e, np.nan) for e in els])
                d = np.linalg.norm(pts[:, None, :] - pts[None, :, :], axis=-1)
                np.fill_diagonal(d, np.inf)
                w = np.where(d <= cutoff, 1.0 / (d * d), 0.0)
                dchi = np.abs(chi[:, None] - chi[None, :])
                wsum = w.sum(axis=1)
                with np.errstate(invalid="ignore"):
                    lpd = np.where(wsum > 0, (w * dchi).sum(axis=1) / wsum, 0.0)
                out["mp_id"].extend([mp_id] * len(pts))
                out["site_idx"].extend(range(len(pts)))
                out["local_en_diff"].extend(lpd.tolist())
            yield pd.DataFrame(out)

    return _spread(slim).mapInPandas(_lpd, schema=LPD_SCHEMA)


def local_property_differences(
    materials: DataFrame,
    props: dict[str, dict[str, float]],
    cutoff: float = 5.0,
    slim: DataFrame | None = None,
) -> DataFrame:
    """Multi-property LocalPropertyDifference (reference-parity tier,
    ml_prediction.py:189 'ward-prb-2017' preset): per site, the
    1/d²-weighted mean |Δp| to neighbors within the cutoff, one output
    column per property in ``props`` (name → element table) — one
    pairwise-distance pass shared by every property. Same kernel
    convention and float shapes as local_property_difference."""
    names = list(props)
    own = materials.select(
        "mp_id",
        F.col("structure.sites.xyz").alias("xyz"),
        F.expr("transform(structure.sites, s -> s.species[0].element)").alias("els"),
    )
    schema = "mp_id string, site_idx int, " + ", ".join(
        f"{n} double" for n in names
    )

    def _lpd(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {"mp_id": [], "site_idx": []}
            for n in names:
                out[n] = []
            for mp_id, xyz, els in zip(pdf["mp_id"], pdf["xyz"], pdf["els"]):
                pts = np.array([np.asarray(p, dtype=float) for p in xyz])
                d = np.linalg.norm(pts[:, None, :] - pts[None, :, :], axis=-1)
                np.fill_diagonal(d, np.inf)
                w = np.where(d <= cutoff, 1.0 / (d * d), 0.0)
                wsum = w.sum(axis=1)
                out["mp_id"].extend([mp_id] * len(pts))
                out["site_idx"].extend(range(len(pts)))
                for name in names:
                    table = props[name]
                    p = np.array([table.get(e, np.nan) for e in els])
                    dp = np.abs(p[:, None] - p[None, :])
                    with np.errstate(invalid="ignore"):
                        vals = np.where(wsum > 0, (w * dp).sum(axis=1) / wsum, 0.0)
                    out[name].extend(vals.tolist())
            yield pd.DataFrame(out)

    return (_spread(own) if slim is None else slim).mapInPandas(
        _lpd, schema=schema
    )


OP_SCHEMA = (
    "mp_id string, site_idx int, q4 double, q6 double, q_tet double, "
    "cos_nn2 double, planar3 double"
)


def site_order_parameters(
    materials: DataFrame, cutoff: float = 3.0, slim: DataFrame | None = None
) -> DataFrame:
    """OPSiteFingerprint analog (§2.9; reference ml_prediction.py:186,226):
    per-site bond-orientational order parameters, scipy-free.

    * Steinhardt q4/q6 over neighbors within ``cutoff``, via the
      spherical-harmonic addition theorem — Σ_m |⟨Y_lm⟩|² reduces to a
      double sum of Legendre polynomials over neighbor-PAIR angles:
      q_l = sqrt( Σ_{j,k∈N(i)} P_l(û_ij·û_ik) / |N(i)|² )  (j=k included,
      P_l(1)=1), so only P4/P6 polynomials are needed, no Y_lm code.
    * q_tet (Errington–Debenedetti) over the 4 nearest neighbors:
      1 − 3/8 Σ_{j<k} (cosθ_jk + 1/3)².

    Same in-cell (non-periodic) pairwise kernel as the other site
    featurizers here. Every per-row float expression mirrors the SQL
    oracle's shape exactly (dx*dx+dy*dy left-assoc, c*c not pow) so the
    only cross-engine drift is aggregation order, absorbed by round-6.
    NULL when a site has no neighbor in the cutoff (q4/q6) or fewer
    than 2 other sites (q_tet)."""
    own = materials.select("mp_id", F.col("structure.sites.xyz").alias("xyz"))
    third = 1.0 / 3.0

    def _ops(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "mp_id": [], "site_idx": [], "q4": [], "q6": [], "q_tet": [],
                "cos_nn2": [], "planar3": [],
            }
            for mp_id, xyz in zip(pdf["mp_id"], pdf["xyz"]):
                pts = np.array([np.asarray(p, dtype=float) for p in xyz])
                n = len(pts)
                dx = pts[None, :, 0] - pts[:, None, 0]
                dy = pts[None, :, 1] - pts[:, None, 1]
                dz = pts[None, :, 2] - pts[:, None, 2]
                d = np.sqrt(dx * dx + dy * dy + dz * dz)
                np.fill_diagonal(d, np.inf)
                for i in range(n):
                    nbr = np.where(d[i] <= cutoff)[0]
                    q4 = q6 = None
                    if len(nbr):
                        ux = dx[i, nbr] / d[i, nbr]
                        uy = dy[i, nbr] / d[i, nbr]
                        uz = dz[i, nbr] / d[i, nbr]
                        c = (
                            ux[:, None] * ux[None, :]
                            + uy[:, None] * uy[None, :]
                            + uz[:, None] * uz[None, :]
                        )
                        c2 = c * c
                        p4 = (35.0 * c2 * c2 - 30.0 * c2 + 3.0) / 8.0
                        p6 = (231.0 * c2 * c2 * c2 - 315.0 * c2 * c2 + 105.0 * c2 - 5.0) / 16.0
                        m2 = float(len(nbr) * len(nbr))
                        q4 = float(np.sqrt(max(p4.sum() / m2, 0.0)))
                        q6 = float(np.sqrt(max(p6.sum() / m2, 0.0)))
                    q_tet = None
                    cos_nn2 = None
                    planar3 = None
                    if n >= 3:
                        order = np.lexsort((np.arange(n), d[i]))[: min(4, n - 1)]
                        ux = dx[i, order] / d[i, order]
                        uy = dy[i, order] / d[i, order]
                        uz = dz[i, order] / d[i, order]
                        acc = 0.0
                        for a in range(len(order)):
                            for b in range(a + 1, len(order)):
                                cc = ux[a] * ux[b] + uy[a] * uy[b] + uz[a] * uz[b]
                                t = cc + third
                                acc += t * t
                        q_tet = 1.0 - 3.0 / 8.0 * acc
                        # angle of the two nearest bonds (ion_comp_st's
                        # linear/bent OP analogs, ml_prediction.py:240-241)
                        cos_nn2 = (
                            ux[0] * ux[1] + uy[0] * uy[1] + uz[0] * uz[1]
                        )
                        if len(order) >= 3:
                            # coplanarity of the three nearest unit bonds
                            # (trigonal-planar OP analog, :242): 1 − |u1·(u2×u3)|
                            det = (
                                ux[0] * (uy[1] * uz[2] - uz[1] * uy[2])
                                - uy[0] * (ux[1] * uz[2] - uz[1] * ux[2])
                                + uz[0] * (ux[1] * uy[2] - uy[1] * ux[2])
                            )
                            planar3 = 1.0 - abs(det)
                    out["mp_id"].append(mp_id)
                    out["site_idx"].append(i)
                    out["q4"].append(q4)
                    out["q6"].append(q6)
                    out["q_tet"].append(q_tet)
                    out["cos_nn2"].append(cos_nn2)
                    out["planar3"].append(planar3)
            yield pd.DataFrame(out)

    return (_spread(own) if slim is None else slim).mapInPandas(
        _ops, schema=OP_SCHEMA
    )


VOR_SCHEMA = (
    "mp_id string, site_idx int, vor_cn int, mean_vor_dist double, "
    "min_vor_dist double, max_vor_dist double, std_vor_dist double, "
    "std_vor_inv2 double"
)


def voronoi_neighbors(
    materials: DataFrame,
    cutoff: float = 6.0,
    tol: float = 1e-6,
    slim: DataFrame | None = None,
) -> DataFrame:
    """Approximate VoronoiFingerprint (§2.9; reference
    ml_prediction.py:187,227) without scipy: bounded-radius midpoint
    half-space test. Candidate j (within ``cutoff`` of i) is kept as a
    Voronoi neighbor iff no third site k is at least as close to the
    i-j midpoint as i itself (tolerance ``tol`` removes the degenerate
    equidistant faces of symmetric lattices — e.g. the 12 edge-touching
    second shells of simple cubic, which true Voronoi also excludes).
    Exact for the face neighbors of the common lattices (sc 6, bcc 14,
    fcc 12 — analytic pytest); approximate in general because only the
    midpoint of each face is tested, not the whole face.

    Same non-periodic in-cell mapInPandas kernel as the other site
    featurizers; per-row float expressions mirror the SQL oracle's
    shape ((dx*dx + dy*dy) + dz*dz, left-assoc) so threshold decisions
    agree bit-for-bit cross-engine."""
    own = materials.select("mp_id", F.col("structure.sites.xyz").alias("xyz"))

    def _vor(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "mp_id": [], "site_idx": [], "vor_cn": [], "mean_vor_dist": [],
                "min_vor_dist": [], "max_vor_dist": [], "std_vor_dist": [],
                "std_vor_inv2": [],
            }
            for mp_id, xyz in zip(pdf["mp_id"], pdf["xyz"]):
                pts = np.array([np.asarray(p, dtype=float) for p in xyz])
                n = len(pts)
                dx = pts[None, :, 0] - pts[:, None, 0]
                dy = pts[None, :, 1] - pts[:, None, 1]
                dz = pts[None, :, 2] - pts[:, None, 2]
                d = np.sqrt(dx * dx + dy * dy + dz * dz)
                np.fill_diagonal(d, np.inf)
                for i in range(n):
                    kept_d = []
                    for j in np.where(d[i] <= cutoff)[0]:
                        mx = (pts[i, 0] + pts[j, 0]) / 2
                        my = (pts[i, 1] + pts[j, 1]) / 2
                        mz = (pts[i, 2] + pts[j, 2]) / 2
                        dkx = mx - pts[:, 0]
                        dky = my - pts[:, 1]
                        dkz = mz - pts[:, 2]
                        dk = np.sqrt(dkx * dkx + dky * dky + dkz * dkz)
                        dk[i] = np.inf
                        dk[j] = np.inf
                        if dk.min() > d[i, j] / 2 + tol:
                            kept_d.append(d[i, j])
                    out["mp_id"].append(mp_id)
                    out["site_idx"].append(i)
                    out["vor_cn"].append(len(kept_d))
                    out["mean_vor_dist"].append(
                        float(np.mean(kept_d)) if kept_d else None
                    )
                    out["min_vor_dist"].append(
                        float(np.min(kept_d)) if kept_d else None
                    )
                    out["max_vor_dist"].append(
                        float(np.max(kept_d)) if kept_d else None
                    )
                    # population std, the np.std default the reference's
                    # SiteFeaturizer reductions use (ml_prediction.py:50)
                    out["std_vor_dist"].append(
                        float(np.std(kept_d)) if kept_d else None
                    )
                    # facet-AREA analog per neighbor: 1/d² (solid-angle
                    # proxy); per-site std is the Voro_area_std_dev slot
                    out["std_vor_inv2"].append(
                        float(np.std([1.0 / (x * x) for x in kept_d]))
                        if kept_d else None
                    )
            yield pd.DataFrame(out)

    return (_spread(own) if slim is None else slim).mapInPandas(
        _vor, schema=VOR_SCHEMA
    )


def voronoi_stats(materials: DataFrame, cutoff: float = 6.0) -> DataFrame:
    """Per-material reduction of the Voronoi-neighbor fingerprint — the
    mean/std/max coordination-number stats the reference's descriptor
    consumes from VoronoiFingerprint (np.mean/np.std reductions,
    ml_prediction.py:50-51)."""
    per_site = voronoi_neighbors(materials, cutoff=cutoff)
    return per_site.groupBy("mp_id").agg(
        F.round(F.avg("vor_cn"), 6).alias("mean_cn"),
        F.round(F.stddev_pop("vor_cn"), 6).alias("std_cn"),
        F.max("vor_cn").alias("max_cn"),
        F.round(F.avg("mean_vor_dist"), 6).alias("mean_vor_dist"),
        F.count(F.lit(1)).alias("n_sites"),
    )


# ---- true Ewald site energy (§2.9 EwaldSiteEnergy, reference
# ml_prediction.py:205,248) -------------------------------------------------

# e²/(4πε₀) in eV·Å — the conversion pymatgen's EwaldSummation uses.
EWALD_CONV = 14.399645478425668


def _erfc(x: np.ndarray) -> np.ndarray:
    """Vectorized complementary error function, Abramowitz–Stegun
    7.1.26 (|err| ≤ 1.5e-7) — scipy is absent and math.erfc is scalar.
    Valid for x ≥ 0, which distances guarantee."""
    t = 1.0 / (1.0 + 0.3275911 * x)
    poly = t * (
        0.254829592
        + t * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429)))
    )
    return poly * np.exp(-x * x)


def ewald_site_potentials(
    lattice: np.ndarray,
    frac: np.ndarray,
    q: np.ndarray,
    r_cut: float = 10.0,
    eps: float = 1e-6,
) -> np.ndarray:
    """Per-site electrostatic potential φ_i of a periodic point-charge
    lattice by classic Ewald summation (the REAL sum, not the 1/r
    proxy): short-range erfc part over periodic images within r_cut,
    long-range part over reciprocal vectors, self-term removal, plus
    the uniform-background correction for non-neutral cells. Returns
    φ in e/Å units; site energy E_i = ½ q_i φ_i · EWALD_CONV eV.

    Splitting parameter α is set so the real-space tail at r_cut and
    the k-space tail at k_cut are both < eps — the standard balanced
    choice; both sums then converge to ~1e-5 absolute, verified
    against the NaCl Madelung constant in pytest."""
    lattice = np.asarray(lattice, dtype=float)
    frac = np.asarray(frac, dtype=float) % 1.0
    q = np.asarray(q, dtype=float)
    n = len(q)
    vol = abs(np.linalg.det(lattice))
    cart = frac @ lattice

    log_eps = -np.log(eps)
    alpha = np.sqrt(log_eps) / r_cut
    k_cut = 2.0 * alpha * np.sqrt(log_eps)

    # real-space: enough image shells that every point within r_cut of
    # the home cell is covered (plane spacing d_i = 1/|row_i(inv)|)
    inv = np.linalg.inv(lattice)
    n_img = np.ceil(r_cut * np.linalg.norm(inv, axis=0)).astype(int) + 1
    rng = [np.arange(-m, m + 1) for m in n_img]
    shifts = (
        np.stack(np.meshgrid(*rng, indexing="ij"), axis=-1).reshape(-1, 3) @ lattice
    )
    # d[i, j, s] = |r_i - (r_j + R_s)|
    diff = cart[:, None, None, :] - (cart[None, :, None, :] + shifts[None, None, :, :])
    d = np.sqrt((diff * diff).sum(axis=-1))
    self_mask = (d < 1e-10)
    d = np.where(self_mask, np.inf, d)
    contrib = np.where(d <= r_cut, _erfc(alpha * d) / d, 0.0)
    phi = (contrib * q[None, :, None]).sum(axis=(1, 2))

    # reciprocal space: b rows of 2π·inv^T; k = m @ B for integer m
    B = 2.0 * np.pi * inv.T
    n_k = np.ceil(k_cut / (2.0 * np.pi * np.linalg.norm(inv, axis=1))).astype(int) + 1
    rngk = [np.arange(-m, m + 1) for m in n_k]
    mm = np.stack(np.meshgrid(*rngk, indexing="ij"), axis=-1).reshape(-1, 3)
    mm = mm[(mm != 0).any(axis=1)]
    kv = mm @ B
    k2 = (kv * kv).sum(axis=1)
    keep = k2 <= k_cut * k_cut
    kv, k2 = kv[keep], k2[keep]
    kr = cart @ kv.T  # (n, nk)
    ck, sk = np.cos(kr), np.sin(kr)
    Cs = q @ ck  # structure-factor components Σ_j q_j cos/sin(k·r_j)
    Ss = q @ sk
    w = 4.0 * np.pi / vol * np.exp(-k2 / (4.0 * alpha * alpha)) / k2
    phi += (w * (ck * Cs[None, :] + sk * Ss[None, :])).sum(axis=1)

    # self-interaction (the k-sum includes j=i) and the neutralizing
    # background for charged cells
    phi -= 2.0 * alpha / np.sqrt(np.pi) * q
    phi -= np.pi / (vol * alpha * alpha) * q.sum()
    return phi


EWALD_SCHEMA = "mp_id string, site_idx int, ewald_energy double"


def site_ewald_energy(materials: DataFrame) -> DataFrame:
    """Per-site Ewald energies E_i = ½ q_i φ_i · 14.3996 eV over the
    oxide corpus, with the same charge convention as m25: O = −2 and
    every cation at the charge-balancing mean 2·n_O/n_cations (counts
    from the actual cell sites, so every cell is exactly neutral).
    Same mapInPandas batch shape as the proxy kernel — one Arrow
    crossing per partition, all math vectorized numpy."""
    slim = materials.select(
        "mp_id",
        F.col("structure.lattice.matrix").alias("lattice"),
        F.col("structure.sites.abc").alias("abc"),
        F.expr("transform(structure.sites, s -> s.species[0].element)").alias("els"),
    )

    def _ewald(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"mp_id": [], "site_idx": [], "ewald_energy": []}
            for mp_id, lat, abc, els in zip(
                pdf["mp_id"], pdf["lattice"], pdf["abc"], pdf["els"]
            ):
                lattice = np.array([np.asarray(r, dtype=float) for r in lat])
                frac = np.array([np.asarray(p, dtype=float) for p in abc])
                els = list(els)
                n_o = sum(1 for e in els if e == "O")
                n_cat = len(els) - n_o
                q_cat = 2.0 * n_o / n_cat if n_cat else 0.0
                q = np.array([-2.0 if e == "O" else q_cat for e in els])
                phi = ewald_site_potentials(lattice, frac, q)
                e = 0.5 * q * phi * EWALD_CONV
                out["mp_id"].extend([mp_id] * len(els))
                out["site_idx"].extend(range(len(els)))
                out["ewald_energy"].extend(e.tolist())
            yield pd.DataFrame(out)

    return _spread(slim).mapInPandas(_ewald, schema=EWALD_SCHEMA)


def ewald_energy_stats(materials: DataFrame) -> DataFrame:
    """max/mean/std (ddof=0) reduction of the true Ewald site energies —
    the reference's EwaldSiteEnergy → np.max/np.mean/np.std pipeline
    (ml_prediction.py:50-51,205,248) with the real periodic sum."""
    per_site = site_ewald_energy(materials)
    return per_site.groupBy("mp_id").agg(
        F.round(F.max("ewald_energy"), 6).alias("max_ewald_energy"),
        F.round(F.avg("ewald_energy"), 6).alias("mean_ewald_energy"),
        F.round(F.stddev_pop("ewald_energy"), 6).alias("std_ewald_energy"),
        F.count(F.lit(1)).alias("n_sites"),
    )
