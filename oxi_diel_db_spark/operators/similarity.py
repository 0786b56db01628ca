"""Similarity search over embedding columns (north star; SURVEY.md J8).

Two tiers:

* brute_force_topk — exact cosine top-k: probe ⨯ corpus, per-probe
  heap via window rank. The correctness baseline; cost O(|probe|·|corpus|).
  Fine when |probe| is small (interactive search) even on a huge corpus,
  because the corpus side streams: no shuffle of the corpus, probes are
  broadcast.

* lsh_topk — random-hyperplane LSH (sign bits of r fixed projections →
  bucket). Only same-bucket candidates are scored; multi-probe over
  Hamming-1 neighbor buckets recovers recall. Cost drops by ~2^r.
  Hyperplanes are seeded (numpy RandomState) and broadcast — fully
  deterministic run-to-run; recall vs brute force asserted in tests.

* ivf_topk — inverted-file (IVF) index: corpus vectors are assigned to
  their nearest of n_centroids "cells"; probes search only their nprobe
  nearest cells. Centroids here are hash-seeded corpus vectors (a
  deterministic stand-in for a k-means training pass — the routing and
  cell-partition plumbing, which is what scales, is identical). The
  centroid set is tiny and collected driver-side (that IS the IVF
  index), so cell assignment compiles to a literal expression over the
  scan: one pass, zero shuffle, whole-stage codegen.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from oxi_diel_db_spark.functions.vectors import as_double, dot, norm
from oxi_diel_db_spark.tables import fanout


def brute_force_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k by cosine for each probe row.

    Ranking ties break on candidate id; cosine is rounded to 6 dp BEFORE
    ranking so the rank order is identical across engines.
    """
    # per-vector norms precomputed once, never per pair. fanout (r13
    # opt): the per-row probe-dot chain runs at scan parallelism — one
    # task on a one-row-group gate file; identity at real scale.
    c = fanout(corpus, id_col).select(
        F.col(id_col), as_double(vec_col).alias("cv")
    ).withColumn("cn", norm(F.col("cv")))
    p = probes.select(
        F.col(probe_id_col).alias("query_id"), as_double(vec_col).alias("pv")
    ).withColumn("pn", norm(F.col("pv")))
    cos = F.round(
        dot(F.col("pv"), F.col("cv")) / (F.col("pn") * F.col("cn")), 6
    ) + F.lit(0.0)  # -0.0 → +0.0
    scored = (
        F.broadcast(p)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col(id_col))
        .select("query_id", F.col(id_col).alias("neighbor_id"), cos.alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cos", "rn")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.RandomState(seed)
    return rng.randn(n_planes, dim).tolist()


def lsh_bucket(vec: F.Column, planes: list[list[float]]) -> F.Column:
    """Sign-bit bucket id: bit_i = 1 if vec · plane_i > 0."""
    bucket = F.lit(0)
    for i, plane in enumerate(planes):
        d = F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(float(x)) for x in plane]),
                lambda x, y: x * y,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(d > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket


def lsh_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 10,
    n_planes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id_col: str = "query_id",
    multiprobe: bool = True,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: score only candidates in the probe's LSH bucket
    (plus Hamming-1 neighbor buckets when multiprobe=True)."""
    dim = len(
        corpus.select(F.col(vec_col)).limit(1).collect()[0][0]
    )  # driver reads ONE row for the dimension — not a data pass
    planes = _hyperplanes(dim, n_planes, seed)

    c = fanout(corpus, id_col).select(
        F.col(id_col), as_double(vec_col).alias("cv")
    ).withColumn("cn", norm(F.col("cv")))
    c = c.withColumn("bucket", lsh_bucket(F.col("cv"), planes))
    p = probes.select(
        F.col(probe_id_col).alias("query_id"), as_double(vec_col).alias("pv")
    ).withColumn("pn", norm(F.col("pv")))
    p = p.withColumn("bucket0", lsh_bucket(F.col("pv"), planes))
    if multiprobe:
        flips = F.array(
            F.col("bucket0"),
            *[F.col("bucket0").bitwiseXOR(F.lit(1 << i)) for i in range(n_planes)],
        )
    else:
        flips = F.array(F.col("bucket0"))
    p = p.select("query_id", "pv", "pn", F.explode(flips).alias("bucket"))

    cos = F.round(
        dot(F.col("pv"), F.col("cv")) / (F.col("pn") * F.col("cn")), 6
    ) + F.lit(0.0)  # -0.0 → +0.0
    scored = (
        F.broadcast(p)
        .join(c, "bucket")
        .filter(F.col("query_id") != F.col(id_col))
        .select("query_id", F.col(id_col).alias("neighbor_id"), cos.alias("cos"))
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cos", "rn")
    )


def _seed_centroids(
    corpus: DataFrame, n_centroids: int, id_col: str, seed: int
) -> list[tuple]:
    """Deterministic centroid pick: the n corpus vectors with the
    smallest md5('ivf<seed>:' || id) — a reproducible uniform sample
    (same trick as operators/sampling.hash_sample), identically
    expressible in the DuckDB oracle. Returns [(cent_id, vec, norm)].
    The collect is the index-build step: n_centroids rows, not a scan
    of the data (Spark plans a TakeOrdered over the hash)."""
    rows = (
        corpus.withColumn(
            "__h", F.md5(F.concat(F.lit(f"ivf{seed}:"), F.col(id_col).cast("string")))
        )
        .orderBy("__h", id_col)
        .limit(n_centroids)
        .select(F.col(id_col), "cv", "cn")
        .collect()
    )
    return [(r[0], r["cv"], r["cn"]) for r in rows]


def _cell_sims(cents: list[tuple], vec: F.Column, vnorm: F.Column) -> F.Column:
    # array<struct<sim, neg_id>>: array_max/array_sort compare
    # lexicographically → max sim, then SMALLEST cent_id (negated).
    # Centroids enter as THREE literal nodes (ids/vectors/norms) scanned
    # by one transform — per-centroid literal expressions put
    # n_centroids × dim leaves in the plan and Catalyst analysis time
    # dwarfed execution (same lesson as the PQ codebook).
    ids = F.lit([int(c[0]) for c in cents])
    vecs = F.lit([list(c[1]) for c in cents])
    norms = F.lit([float(c[2]) for c in cents])
    return F.transform(
        F.sequence(F.lit(1), F.lit(len(cents))),
        lambda i: F.struct(
            (
                F.round(
                    dot(vec, F.element_at(vecs, i)) / (vnorm * F.element_at(norms, i)),
                    6,
                )
                + F.lit(0.0)
            ).alias("sim"),
            (-F.element_at(ids, i)).alias("neg_id"),
        ),
    )


def ivf_index(
    corpus: DataFrame,
    n_centroids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    filter_col: str | None = None,
) -> tuple[DataFrame, list[tuple]]:
    """IVF index build: returns (assigned corpus with a ``cell`` column,
    centroid list). The assignment is the expensive pass — O(|corpus| ×
    n_centroids) dot products — and is what an IVF deployment builds
    ONCE, persists, and amortizes over every query batch; ``.persist()``
    or write the returned DataFrame. Single-shot callers can use
    ivf_topk, but for one batch of probes a brute-force scan is often
    cheaper than building the index (measured in tools/scale_probe.py
    vectors mode) — IVF's win is the amortized query path."""
    keep = [F.col(id_col), as_double(vec_col).alias("cv")]
    if filter_col:
        # metadata rides the index (s6/s7's hybrid-search predicate is
        # applied INSIDE the selected cells — never post-filtered)
        keep.insert(1, F.col(filter_col).alias("__fc"))
    # fanout (r13 opt): the O(n·k) assignment dots are the expensive
    # pass and otherwise run at scan parallelism; identity at scale.
    # Seed pass reads the RAW scan (r14 opt): _seed_centroids' collect
    # is its own action, so seeding from the fanned projection executed
    # the fanout exchange twice — once for the seed job, once again in
    # the main query (measured: the r13 fanout made s3 0.9x). The seed
    # is a TakeOrdered over md5(id); the picked rows and their cv/cn
    # expressions are identical either way.
    raw = corpus.select(*keep).withColumn("cn", norm(F.col("cv")))
    cents = _seed_centroids(raw, n_centroids, id_col, seed)
    c = fanout(corpus, id_col).select(*keep).withColumn("cn", norm(F.col("cv")))
    return ivf_assign(c, cents, prepared=True, id_col=id_col), cents


def ivf_assign(
    corpus: DataFrame,
    cents: list[tuple],
    prepared: bool = False,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Expression-path assignment of an arbitrary corpus to FIXED
    centroids — the incremental-maintenance primitive (new vectors
    arrive after the index is built; the cells don't move until the
    next rebuild). Same argmax/tie semantics as ivf_index, which now
    delegates here; ivf_assign_gemm is the measured deployment twin.
    With ``prepared=True`` the input already carries cv/cn columns."""
    c = (
        corpus
        if prepared
        else fanout(corpus, id_col)
        .select(F.col(id_col), as_double(vec_col).alias("cv"))
        .withColumn("cn", norm(F.col("cv")))
    )
    return c.withColumn(
        "cell",
        -F.array_max(_cell_sims(cents, F.col("cv"), F.col("cn"))).getField("neg_id"),
    )


def ivf_assign_gemm(
    corpus: DataFrame,
    cents: list[tuple],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Scale-path IVF assignment: one numpy GEMM per Arrow batch
    against the centroid matrix (shipped in the task closure — k×dim
    doubles, megabytes at most), replacing the per-row O(k)
    expression fold. The r8 semdedup scale probe measured the fold
    path at ~0.6 µs/dot — ~2 hours for 10M vectors at k=12800 —
    versus BLAS minutes; assignment is THE cliff of the SemDeDup
    shape at corpus scale (tools/scale_probe.py semdedup).

    Same argmax semantics as ivf_index: cosine rounded to 6 dp, ties
    broken toward the smallest centroid id (centroid columns sorted by
    id, first-max argmax). numpy's SIMD dot may differ from the
    sequential fold by an ulp, so a vector whose top-two ROUNDED sims
    tie at 1e-6 could route differently — which is why the hash-gated
    d16/s3 queries keep the expression form at gate SF and this is the
    documented deployment path. Output: (id, cell, cn, <vec_col>)."""
    import numpy as np
    import pandas as pd

    order = sorted(range(len(cents)), key=lambda i: int(cents[i][0]))
    cmat = np.array([list(cents[i][1]) for i in order], dtype=np.float64)
    cnorm = np.array([float(cents[i][2]) for i in order], dtype=np.float64)
    cids = np.array([int(cents[i][0]) for i in order], dtype=np.int64)

    row_block = max(1, 16_777_216 // max(1, len(cids)))  # ≤128 MB sims

    def assign(batches):
        for pdf in batches:
            v = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            vn = np.sqrt((v * v).sum(axis=1))
            # zero-norm guard: 0/0 would yield NaN cosines, and numpy's
            # argmax treats NaN as maximal while Spark's comparison
            # semantics rank NaN above every double — an undocumented
            # divergence between the two paths (r8 advice). With the
            # guard a zero vector scores cosine 0.0 against every
            # centroid and routes deterministically to the smallest
            # centroid id (first-max argmax) in BOTH paths. cn keeps
            # the true norm (0.0) so downstream consumers see it.
            vsafe = np.where(vn == 0.0, 1.0, vn)
            cell = np.empty(len(v), dtype=np.int64)
            # row blocks bound the b×k sims matrix (plus its rounded
            # copy) to ~128 MB regardless of k — at k=8192 a full
            # 10k-row Arrow batch would otherwise churn ~1.3 GB per
            # batch and the 2M-vector sweep measured 9× superlinear
            # assignment cost from exactly that (SCALE.md §6)
            for s in range(0, len(v), row_block):
                e = min(s + row_block, len(v))
                sims = np.round(
                    (v[s:e] @ cmat.T) / np.outer(vsafe[s:e], cnorm), 6
                )
                cell[s:e] = cids[sims.argmax(axis=1)]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "cell": cell,
                    "cn": vn,
                    vec_col: pdf[vec_col],
                }
            )

    return corpus.select(id_col, vec_col).mapInPandas(
        assign, f"{id_col} long, cell long, cn double, {vec_col} array<double>"
    )


def semdedup_cells_gemm(
    assigned: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    row_block: int = 2048,
) -> DataFrame:
    """Scale path of d16's within-cell pairwise stage: applyInPandas
    per IVF cell, cosine matrix via numpy GEMM in row blocks (peak
    extra memory = row_block × |cell| doubles, independent of cell
    size), n_near_i = #{j : id_j < id_i ∧ cos(i,j) ≥ threshold},
    keep = (n_near == 0) — SemDeDup keep-first semantics. The cell
    sizes are what the IVF knob bounds (n_centroids grows with the
    corpus), so per-task work stays ~(n/k)² GEMM flops."""
    import numpy as np
    import pandas as pd

    def per_cell(pdf: "pd.DataFrame") -> "pd.DataFrame":
        ids = pdf[id_col].to_numpy()
        v = np.array(pdf[vec_col].tolist(), dtype=np.float64)
        vn = np.sqrt((v * v).sum(axis=1))
        # zero-norm guard (see ivf_assign_gemm): a zero vector keeps
        # cosine 0.0 against everything — never "near", always kept —
        # instead of NaN rows whose numpy comparisons silently go
        # False while Spark's would go True.
        vnorm = v / np.where(vn == 0.0, 1.0, vn)[:, None]
        n_near = np.zeros(len(ids), dtype=np.int64)
        for s in range(0, len(ids), row_block):
            e = min(s + row_block, len(ids))
            sims = np.round(vnorm[s:e] @ vnorm.T, 6)
            mask = (sims >= threshold) & (ids[None, :] < ids[s:e, None])
            n_near[s:e] = mask.sum(axis=1)
        return pd.DataFrame(
            {
                id_col: ids,
                "cell": pdf["cell"].to_numpy(),
                "n_near": n_near,
                "keep": (n_near == 0).astype("int32"),
            }
        )

    return assigned.groupBy("cell").applyInPandas(
        per_cell, f"{id_col} long, cell long, n_near long, keep int"
    )


def ivf_search(
    assigned: DataFrame,
    cents: list[tuple],
    probes: DataFrame,
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    probe_id_col: str = "query_id",
    vec_col: str = "embedding",
    broadcast_probes: bool = True,
    filter_col: str | None = None,
) -> DataFrame:
    """Query side of the IVF index: route each probe to its nprobe
    nearest centroids, score only those cells' members. Cost per query
    batch ≈ |probes| × |corpus| × nprobe / n_centroids pair scores.

    broadcast_probes=True ships the routed probe batch to every executor
    (right for the common case: probe batches of thousands against a
    large corpus). For probe batches in the millions the broadcast
    would OOM the driver — pass False to shuffle-hash-join on cell
    instead (both sides exchange on the ~n_centroids cell keys; a hot
    cell is AQE skew-join territory, or raise n_centroids)."""
    pcols = [F.col(probe_id_col).alias("query_id"), as_double(vec_col).alias("pv")]
    if filter_col:
        pcols.append(F.col(filter_col).alias("__fp"))
    p = probes.select(*pcols).withColumn("pn", norm(F.col("pv")))
    routed = p.select(
        "query_id",
        "pv",
        "pn",
        *(["__fp"] if filter_col else []),
        F.explode(
            F.transform(
                F.slice(
                    F.reverse(F.array_sort(_cell_sims(cents, F.col("pv"), F.col("pn")))),
                    1,
                    nprobe,
                ),
                lambda s: -s.getField("neg_id"),
            )
        ).alias("cell"),
    )
    cos = F.round(
        dot(F.col("pv"), F.col("cv")) / (F.col("pn") * F.col("cn")), 6
    ) + F.lit(0.0)
    left = F.broadcast(routed) if broadcast_probes else routed.hint("shuffle_hash")
    joined = left.join(assigned, "cell")
    if filter_col:
        joined = joined.filter(F.col("__fp") == F.col("__fc"))
    scored = (
        joined
        .filter(F.col("query_id") != F.col(id_col))
        .select("query_id", F.col(id_col).alias("neighbor_id"), cos.alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cos", "rn")
    )


def ivf_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 10,
    n_centroids: int = 8,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id_col: str = "query_id",
    seed: int = 42,
    filter_col: str | None = None,
) -> DataFrame:
    """Single-shot IVF top-k (index build + search in one plan; see
    ivf_index for the amortized deployment shape).

    Cell assignment / probe routing use cosine ROUNDed to 6 dp with
    cent_id-ascending tie-break, so the partition of the corpus into
    cells — and therefore the result — is bit-identical across engines
    (full DuckDB oracle, unlike LSH's rows-only check).
    """
    assigned, cents = ivf_index(
        corpus, n_centroids, id_col, vec_col, seed, filter_col=filter_col
    )
    return ivf_search(
        assigned, cents, probes, k=k, nprobe=nprobe,
        id_col=id_col, probe_id_col=probe_id_col, vec_col=vec_col,
        filter_col=filter_col,
    )


def _l2sq(a: F.Column, b: F.Column) -> F.Column:
    """Squared L2 distance of two array columns — elementwise
    (x−y)·(x−y) folded left-to-right from 0.0 (the shape the SQL twin
    replays; round-6 absorbs fold-order drift)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _subspace_dists(cb_lit: F.Column, vec: F.Column, s: int, d: int) -> F.Column:
    """Distances of ``vec``'s s-th subvector to every codebook entry's
    s-th subvector: ONE transform over the codebook array literal. The
    codebook enters the plan as a single nested-array Literal node —
    with per-code literal vectors instead, Catalyst analysis of the
    m × n_codes × dim leaf expressions dominated wall-clock (~5 s of
    driver time for a scan whose execution takes milliseconds)."""
    sub = F.slice(vec, s * d + 1, d)
    return F.transform(
        cb_lit, lambda cb: F.round(_l2sq(sub, F.slice(cb, s * d + 1, d)), 6)
    )


def pq_index(
    corpus: DataFrame,
    m: int = 4,
    n_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> tuple[DataFrame, list[list[float]]]:
    """Product-quantization index build: split each D-dim vector into m
    subvectors; store only the id of the nearest codebook entry per
    subspace. The encoded corpus is m small ints per vector —
    D·8 bytes → m bytes-ish, the memory lever that lets a 100 TB
    embedding corpus live in executor RAM for ADC scans.

    Codebook entries are hash-seeded corpus vectors (deterministic
    stand-in for a k-means training pass, exactly like ivf_index's
    centroids — the encode/scan plumbing is what scales). Subspace
    assignment: argmin of ROUND(l2², 6) with smallest-code tie-break →
    the encoding is bit-identical across engines, so PQ search gets a
    full value-hash oracle."""
    # fanout (r13 opt): the m-subspace encode argmins below are the
    # expensive pass and otherwise run at scan parallelism; identity at
    # real scale. Codebook seed pass reads the RAW scan (r14 opt, same
    # reasoning as ivf_index): the collect is its own action and must
    # not execute the fanout exchange a second time.
    c = fanout(corpus, id_col).select(
        F.col(id_col), as_double(vec_col).alias("cv")
    )
    raw = corpus.select(F.col(id_col), as_double(vec_col).alias("cv"))
    rows = (
        raw.withColumn(
            "__h", F.md5(F.concat(F.lit(f"pq{seed}:"), F.col(id_col).cast("string")))
        )
        .orderBy("__h", id_col)
        .limit(n_codes)
        .select("cv")
        .collect()
    )
    codebook = [list(r["cv"]) for r in rows]
    dim = len(codebook[0])
    d = dim // m
    cb_lit = F.lit(codebook)
    codes = []
    for s in range(m):
        dists = _subspace_dists(cb_lit, F.col("cv"), s, d)
        # array_position finds the FIRST occurrence of the min —
        # exactly the smallest-code tie-break the SQL twin replays
        codes.append((F.array_position(dists, F.array_min(dists)) - 1).cast("int"))
    encoded = c.select(F.col(id_col), F.array(*codes).alias("codes"))
    return encoded, codebook


def pq_search(
    encoded: DataFrame,
    codebook: list[list[float]],
    probes: DataFrame,
    k: int = 10,
    m: int = 4,
    id_col: str = "vec_id",
    probe_id_col: str = "query_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Asymmetric-distance (ADC) PQ scan: each probe precomputes an
    m × n_codes distance table against the codebook (one small literal
    expression), then every corpus row costs m table lookups + (m−1)
    adds — no full-dimension math against the corpus at all. Probes
    (with their tables) broadcast; the encoded corpus streams."""
    dim = len(codebook[0])
    d = dim // m
    p = probes.select(
        F.col(probe_id_col).alias("query_id"), as_double(vec_col).alias("pv")
    )
    cb_lit = F.lit(codebook)
    dtab = F.array(
        *[_subspace_dists(cb_lit, F.col("pv"), s, d) for s in range(m)]
    )
    p = p.select("query_id", dtab.alias("dtab"))
    adist = None
    for s in range(m):
        term = F.element_at(
            F.element_at(F.col("dtab"), s + 1),
            F.element_at(F.col("codes"), s + 1) + F.lit(1),
        )
        adist = term if adist is None else adist + term
    scored = (
        F.broadcast(p)
        .crossJoin(encoded)
        .filter(F.col("query_id") != F.col(id_col))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            F.round(adist, 6).alias("adist"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adist").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "adist", "rn")
    )


def pq_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 10,
    m: int = 4,
    n_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id_col: str = "query_id",
    seed: int = 42,
) -> DataFrame:
    """Single-shot PQ top-k (index build + ADC scan in one plan); see
    pq_index for the amortized deployment shape."""
    encoded, codebook = pq_index(corpus, m, n_codes, id_col, vec_col, seed)
    return pq_search(
        encoded, codebook, probes, k=k, m=m,
        id_col=id_col, probe_id_col=probe_id_col, vec_col=vec_col,
    )


def filtered_topk(
    corpus: DataFrame,
    probes: DataFrame,
    filter_col: str,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id_col: str = "query_id",
) -> DataFrame:
    """Metadata-FILTERED vector search (the hybrid-search shape): each
    probe's neighbors are restricted to corpus rows sharing its
    ``filter_col`` value (tenant, language, label, …) — filtering
    happens BEFORE ranking (pre-filter), so top-k is exact within the
    predicate rather than a post-filtered, possibly-short tail of an
    unfiltered top-k (the classic vector-store correctness trap).

    At scale the predicate rides the corpus scan (partition/row-group
    pruning when the table is laid out by the filter column — q69/q83
    posture); the IVF variant applies the same predicate inside the
    selected cells only. Here: broadcast probes, stream corpus, one
    top-k window per probe — no corpus shuffle."""
    c = fanout(corpus, id_col).select(
        F.col(id_col), F.col(filter_col).alias("__fc"), as_double(vec_col).alias("cv")
    ).withColumn("cn", norm(F.col("cv")))
    p = probes.select(
        F.col(probe_id_col).alias("query_id"),
        F.col(filter_col).alias("__fp"),
        as_double(vec_col).alias("pv"),
    ).withColumn("pn", norm(F.col("pv")))
    cos = F.round(
        dot(F.col("pv"), F.col("cv")) / (F.col("pn") * F.col("cn")), 6
    ) + F.lit(0.0)
    scored = (
        F.broadcast(p)
        .join(c, F.col("__fp") == F.col("__fc"))  # the metadata predicate
        .filter(F.col("query_id") != F.col(id_col))
        .select("query_id", F.col(id_col).alias("neighbor_id"), cos.alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cos", "rn")
    )


def mmr_rerank(
    corpus: DataFrame,
    probes: DataFrame,
    k_candidates: int = 20,
    k_select: int = 5,
    lam: float = 0.7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal-marginal-relevance diversification — the context-
    packing step after retrieval (RAG): from each query's exact
    top-``k_candidates`` (brute_force_topk), greedily select
    ``k_select`` maximizing ``lam*rel - (1-lam)*max-sim-to-selected``.
    The sequential greedy runs per query over a BOUNDED candidate
    list (k_candidates rows + a k^2 cosine matrix in numpy) via
    applyInPandas — per-group state is O(k^2), never corpus-sized.
    Determinism: relevance and the MMR objective are rounded to 6 dp
    before each argmax and ties break on the lowest candidate id, the
    brute_force_topk convention. The objective round is an explicit
    floor(x*1e6 + 0.5)/1e6 — library round() semantics differ between
    numpy scalars (scaling half-even) and Python floats
    (decimal-correct) on values a handful of ulps from a tie, which
    this corpus actually produces."""
    import math

    import pandas as pd

    cands = brute_force_topk(
        corpus, probes, k=k_candidates, id_col=id_col, vec_col=vec_col
    )
    vecs = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double(vec_col).alias("nv")
    )
    joined = cands.join(vecs, "neighbor_id").select(
        "query_id", "neighbor_id", "cos", "nv"
    )

    def _mmr(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("neighbor_id").reset_index(drop=True)
        m = np.stack(pdf["nv"].to_numpy()).astype(np.float64)
        nrm = np.sqrt((m * m).sum(axis=1))
        # +1e-9 nudge before the 6-dp round (the repo's cross-engine
        # rule): the corpus produces candidate cosines EXACTLY at a
        # .5e-6 boundary, where numpy's half-even and the SQL twin's
        # half-away disagree — r10, found by s8's new hash gate
        sim = np.round((m @ m.T) / np.outer(nrm, nrm) + 1e-9, 6)
        rel = pdf["cos"].to_numpy()
        ids = pdf["neighbor_id"].to_numpy()
        selected: list[int] = []
        out = []
        for step in range(min(k_select, len(pdf))):
            best_i, best_s = None, None
            for i in range(len(pdf)):
                if i in selected:
                    continue
                penalty = max(sim[i, j] for j in selected) if selected else 0.0
                x = float(lam * rel[i] - (1 - lam) * penalty)
                s = math.floor(x * 1e6 + 0.5) / 1e6
                if best_s is None or s > best_s or (
                    s == best_s and ids[i] < ids[best_i]
                ):
                    best_i, best_s = i, s
            selected.append(best_i)
            out.append(
                (
                    int(pdf["query_id"].iloc[0]),
                    step + 1,
                    int(ids[best_i]),
                    float(rel[best_i]),
                    float(best_s),
                )
            )
        return pd.DataFrame(
            out,
            columns=["query_id", "mmr_rank", "neighbor_id", "relevance", "mmr_score"],
        )

    return joined.groupBy("query_id").applyInPandas(
        _mmr,
        "query_id bigint, mmr_rank int, neighbor_id bigint, "
        "relevance double, mmr_score double",
    )


def gemm_brute_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k by cosine, BLAS-batched: the vectorized brute-force
    baseline that actually gets deployed (one numpy GEMM per Arrow
    batch against the broadcast probe matrix beats row-wise SQL dot
    products by 1-2 orders of magnitude — measured in
    tests/test_similarity.py). Semantics are IDENTICAL to
    brute_force_topk: cosine rounded to 6 dp before ranking, ties on
    neighbor id; same oracle applies verbatim.

    Plan shape: probes collect driver-side (bounded, they are the
    query batch by construction), the corpus streams through ONE
    mapInPandas emitting each partition's per-query top-k, and the
    global top-k is a window over the O(partitions x probes x k)
    survivor set — the standard two-level top-k reduction. At 100 TB
    the corpus is never shuffled and never leaves the JVM except as
    Arrow batches.

    Rounding is HALF-AWAY-FROM-ZERO via sign*floor(|x|*1e6+0.5) to
    match Spark's ROUND and DuckDB's ROUND on doubles (numpy's .round
    is half-even — the s8 lesson applied)."""
    import numpy as np
    import pandas as pd

    rows = probes.select(
        F.col(probe_id_col).alias("query_id"), as_double(vec_col).alias("pv")
    ).collect()
    if not rows:
        return corpus.sparkSession.createDataFrame(
            [], "query_id bigint, neighbor_id bigint, cos double, rn int"
        )
    qids = np.array([r["query_id"] for r in rows], dtype=np.int64)
    Q = np.stack([np.asarray(r["pv"], dtype=np.float64) for r in rows])
    Qn = np.linalg.norm(Q, axis=1)

    def _topk(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            M = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            # dot / (|q|·|m|), mirroring the SQL formula's op order
            S = (Q @ M.T) / np.outer(Qn, np.linalg.norm(M, axis=1))
            S = np.sign(S) * np.floor(np.abs(S) * 1e6 + 0.5) / 1e6
            S += 0.0  # -0.0 → +0.0
            out = {"query_id": [], "neighbor_id": [], "cos": []}
            for qi in range(len(qids)):
                mask = ids != qids[qi]
                cand_ids, cand_s = ids[mask], S[qi][mask]
                if not len(cand_ids):
                    continue
                # partial top-k inside the batch: sort by (-cos, id)
                order = np.lexsort((cand_ids, -cand_s))[:k]
                out["query_id"].extend([int(qids[qi])] * len(order))
                out["neighbor_id"].extend(int(i) for i in cand_ids[order])
                out["cos"].extend(float(s) for s in cand_s[order])
            yield pd.DataFrame(
                {
                    "query_id": pd.Series(out["query_id"], dtype="int64"),
                    "neighbor_id": pd.Series(out["neighbor_id"], dtype="int64"),
                    "cos": pd.Series(out["cos"], dtype="float64"),
                }
            )

    survivors = corpus.select(id_col, vec_col).mapInPandas(
        _topk, schema="query_id bigint, neighbor_id bigint, cos double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        survivors.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cos", "rn")
    )
