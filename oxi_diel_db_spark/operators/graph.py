"""Iterative graph algorithms as DataFrame loops (north star: the
reference's corpus is flat, but a 100 TB training-data pipeline needs
graph passes — link-based quality scores over a crawl graph, influence
propagation over citation edges).

PageRank here is the template for ANY fixed-point DataFrame iteration
at scale:

* each step is join(edges, ranks on src) → groupBy(dst) → one shuffle
  on dst per iteration; pre-partitioning edges AND ranks by the join
  key makes every step co-located (zero extra exchanges at cluster
  scale — the same bucketing argument as operators/scale.py).
* the loop unrolls into ONE lazy plan (no action per step); AQE
  re-plans each shuffle with actual sizes. For deep iteration counts
  (>~20) checkpoint every k steps to cut lineage growth.
* per-iteration ROUND pins the trajectory: double summation order
  differs across engines/partitions, and without re-rounding the
  1e-16 drift compounds per step. Rounded at 9 dp each step, the
  DuckDB twin (the same step SQL unrolled) reproduces every iterate
  bit-identically — an ITERATIVE algorithm under the value-hash gate,
  like dedup.dedup_clusters' connected components.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    iters: int = 10,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = None,
    broadcast_max_nodes: int = 1_000_000,
) -> DataFrame:
    """Weighted PageRank over (src, dst[, weight]) edges; returns
    (node, rank) rounded to 6 dp. Nodes = union of endpoints; dangling
    mass is dropped (simplified PR — the oracle drops it identically).
    Contribution of src → dst is rank_src · w / Σ_out(w)."""
    w = F.col(weight_col).cast("double") if weight_col else F.lit(1.0)
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst"), w.alias("w")
    )
    # Spark does not share common subplans across self-references: the
    # unrolled loop references nodes/trans ~2× per iteration, so without
    # materialization the (possibly expensive) edge-building lineage
    # re-executes O(iters) times. localCheckpoint truncates it once;
    # on a real cluster use reliable checkpoint() instead (localCheckpoint
    # blocks die with their executor).
    # Partitioning note: localCheckpoint erases outputPartitioning
    # (LogicalRDD reports UnknownPartitioning — measured, not guessed),
    # so pre-repartitioning the checkpointed sides cannot make the loop
    # joins exchange-free. It also doesn't need to: the checkpointed
    # trans/nodes exchanges are IDENTICAL subplans across iterations
    # and come back as ReusedExchange (one physical shuffle each for
    # the whole run — verified in the executed plan). The per-iteration
    # exchanges that remain are rank-sized (node count, not edge
    # count): the irreducible data movement of PageRank.
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionAll(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # count() is a real (cheap) job over the checkpointed blocks; N is
    # also the teleport term. The checkpoint blocks are reclaimed by the
    # ContextCleaner when the DataFrame is GC'd — long-lived drivers
    # calling pagerank repeatedly can del/unpersist explicitly.
    n_nodes = nodes.count()
    outw = e.groupBy("src").agg(F.sum("w").alias("outw"))
    # normalized transition weight, fixed once (round: engine-portable)
    trans = e.join(outw, "src").select(
        "src", "dst", F.round(F.col("w") / F.col("outw"), 9).alias("p")
    ).localCheckpoint(eager=True)
    base = F.round(F.lit(1.0 / n_nodes), 9)
    ranks = nodes.select("node", base.alias("rank"))
    teleport = F.round(F.lit((1.0 - damping) / n_nodes), 9)
    # Join strategy (r13 opt, guide §3.1): the rank/contrib tables are
    # node-count-sized, and n_nodes was just MEASURED — when the whole
    # rank table fits a broadcast (1M nodes ≈ tens of MB, under the
    # session's 64m threshold), hint it explicitly. The checkpointed
    # trans side reports UnknownPartitioning/huge stats, so without the
    # hint the planner falls back to 2 sort-merge joins per iteration —
    # measured 62 exchanges across the unrolled 10-iteration plan at
    # sf0.1 (plans/r13/g1_pagerank_before.txt). With the hint each
    # iteration is 2 BroadcastHashJoins + ONE node-sized aggregation
    # exchange — the irreducible data movement. Big graphs (> the
    # threshold) keep the sort-merge path unchanged.
    small = n_nodes <= broadcast_max_nodes

    def _b(df):
        return F.broadcast(df) if small else df

    for _ in range(iters):
        r = _b(ranks)
        contrib = (
            trans.join(r, trans.src == r.node)
            .select("dst", (F.col("rank") * F.col("p")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("inflow"))
        )
        c = _b(contrib)
        ranks = (
            nodes.join(c, nodes.node == c.dst, "left")
            .select(
                "node",
                F.round(
                    teleport + F.lit(damping) * F.coalesce("inflow", F.lit(0.0)), 9
                ).alias("rank"),
            )
        )
    return ranks.select("node", F.round("rank", 6).alias("rank"))


def sql_pagerank_ctes(
    edges_cte: str,
    damping: float = 0.85,
    iters: int = 10,
) -> str:
    """DuckDB twin: the same step SQL unrolled ``iters`` times (many
    engines forbid aggregates inside a recursive CTE, and unrolling
    keeps the per-step ROUND placement textually identical to the
    DataFrame loop). ``edges_cte`` must define e(src, dst, w). Ends in
    pr{iters}(node, rank)."""
    parts = [
        f"e AS ({edges_cte})",
        "nodes AS (SELECT DISTINCT node FROM (SELECT src AS node FROM e UNION SELECT dst FROM e))",
        "nn AS (SELECT COUNT(*) AS n FROM nodes)",
        "outw AS (SELECT src, SUM(w) AS outw FROM e GROUP BY src)",
        "trans AS (SELECT e.src, e.dst, ROUND(e.w / outw.outw, 9) AS p FROM e JOIN outw USING (src))",
        "pr0 AS (SELECT node, ROUND(1.0::DOUBLE / n, 9) AS rank FROM nodes, nn)",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"""pr{i} AS (
      SELECT nodes.node,
             ROUND(ROUND((1.0 - {damping})::DOUBLE / nn.n, 9)
                   + {damping}::DOUBLE * COALESCE(inflow, 0.0), 9) AS rank
      FROM nodes CROSS JOIN nn
      LEFT JOIN (SELECT trans.dst, SUM(pr{i - 1}.rank * trans.p) AS inflow
                 FROM trans JOIN pr{i - 1} ON trans.src = pr{i - 1}.node
                 GROUP BY trans.dst) c ON nodes.node = c.dst)"""
        )
    return ",\n    ".join(parts)


def triangle_count(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    persist: bool = False,
) -> DataFrame:
    """Per-node triangle counts over an undirected graph; returns
    (node, triangles) including zero rows for triangle-free nodes.

    Degree-ordered orientation: each undirected edge is directed from
    its lower-(degree, id) endpoint, so every triangle is enumerated
    exactly once from its lowest-degree corner and no vertex fans out
    more than O(sqrt(m)) wedges — the bound that keeps the wedge join
    from exploding on skewed (celebrity-node) graphs at 100 TB. Three
    shuffles total (degree agg, wedge self-join, closing-edge join);
    all comparisons use (degree, id) struct ordering, which DuckDB
    mirrors as row-value comparison — full value-hash oracle.

    ``persist=True`` caches `deg` and the oriented edge list: the plan
    references `oriented` three times (two wedge sides + the
    closing-edge probe) and `deg` twice, and Spark does not share
    common subplans across self-joins, so without caching the
    distinct + degree agg + orientation joins execute 3×. Leave off
    for small oracle runs (cache hygiene under the parity gate); turn
    on for real graphs — the caller owns `spark.catalog.clearCache()`.
    """
    sym = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        sym.select(F.col("a").alias("node"))
        .unionAll(sym.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    if persist:
        deg = deg.persist()
    da = deg.select(F.col("node").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("node").alias("b"), F.col("d").alias("db"))
    ka = F.struct(F.col("da"), F.col("a"))
    kb = F.struct(F.col("db"), F.col("b"))
    oriented = (
        sym.join(da, "a")
        .join(db, "b")
        .select(
            F.when(ka < kb, F.col("a")).otherwise(F.col("b")).alias("u"),
            F.when(ka < kb, F.col("b")).otherwise(F.col("a")).alias("v"),
            F.when(
                ka < kb,
                F.struct(F.col("db").alias("d"), F.col("b").alias("n")),
            )
            .otherwise(F.struct(F.col("da").alias("d"), F.col("a").alias("n")))
            .alias("kv"),
        )
    )
    if persist:
        oriented = oriented.persist()
    e1, e2 = oriented.alias("e1"), oriented.alias("e2")
    wedges = e1.join(e2, (F.col("e1.u") == F.col("e2.u"))).where(
        F.col("e1.kv") < F.col("e2.kv")
    )
    e3 = oriented.alias("e3")
    tri = wedges.join(
        e3, (F.col("e1.v") == F.col("e3.u")) & (F.col("e2.v") == F.col("e3.v"))
    ).select(
        F.col("e1.u").alias("x"), F.col("e1.v").alias("y"), F.col("e2.v").alias("z")
    )
    per_node = (
        tri.select(F.explode(F.array("x", "y", "z")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    return (
        deg.join(per_node, "node", "left")
        .select(
            "node",
            F.coalesce(F.col("triangles"), F.lit(0)).cast("long").alias("triangles"),
        )
    )


def sql_triangle_ctes(edges_cte: str) -> str:
    """DuckDB twin of :func:`triangle_count`: identical degree-ordered
    orientation via row-value comparison. ``edges_cte`` must define
    e(src, dst); ends in tri_counts(node, triangles)."""
    return f"""e AS ({edges_cte}),
    sym AS (
      SELECT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
      FROM e WHERE src <> dst GROUP BY 1, 2
    ),
    deg AS (
      SELECT node, COUNT(*) AS d
      FROM (SELECT a AS node FROM sym UNION ALL SELECT b FROM sym)
      GROUP BY node
    ),
    oriented AS (
      SELECT CASE WHEN (da.d, sym.a) < (db.d, sym.b) THEN sym.a ELSE sym.b END AS u,
             CASE WHEN (da.d, sym.a) < (db.d, sym.b) THEN sym.b ELSE sym.a END AS v,
             CASE WHEN (da.d, sym.a) < (db.d, sym.b) THEN db.d ELSE da.d END AS dv
      FROM sym
      JOIN deg da ON da.node = sym.a
      JOIN deg db ON db.node = sym.b
    ),
    tri AS (
      SELECT e1.u AS x, e1.v AS y, e2.v AS z
      FROM oriented e1
      JOIN oriented e2 ON e1.u = e2.u AND (e1.dv, e1.v) < (e2.dv, e2.v)
      JOIN oriented e3 ON e3.u = e1.v AND e3.v = e2.v
    ),
    tri_counts AS (
      SELECT deg.node, CAST(COALESCE(t.c, 0) AS BIGINT) AS triangles
      FROM deg
      LEFT JOIN (
        SELECT node, COUNT(*) AS c
        FROM (SELECT unnest([x, y, z]) AS node FROM tri)
        GROUP BY node
      ) t ON t.node = deg.node
    )"""


def label_propagation(
    edges: DataFrame,
    iters: int = 5,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Community detection via semi-synchronous label propagation over
    an undirected graph: every node starts as its own label; each
    round it adopts the most frequent label among its neighbors,
    ties broken by the SMALLEST label — a fully deterministic rule, so
    the trajectory (not just the fixed point) is reproducible and the
    unrolled DuckDB twin can value-hash-check it. Returns
    (node, community).

    Known property of the synchronous variant: bipartite subgraphs
    (stars, even cycles) oscillate with period 2 instead of
    converging. Determinism makes the oscillation itself reproducible;
    production LPA damps it with asynchronous or parity-split updates,
    which would break cross-engine replay — chosen deliberately.

    Per round: one shuffle to co-locate neighbor labels, one partial
    (map-side-combinable) count agg, one window argmax — all on the
    node key, so AQE can reuse the partitioning. Rounds are O(m) each;
    at 100 TB graph scale, persist the symmetric edge list once
    (it is re-scanned every round) and keep iters small — LPA
    plateaus in a handful of rounds.
    """
    sym = (
        edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
        .unionAll(
            edges.select(F.col(dst_col).alias("u"), F.col(src_col).alias("v"))
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
        # materialized once, as the scale note below prescribes: every
        # round joins sym, and without this the upstream edge
        # derivation (for g3: a purchase-affinity self-join over
        # events) replays per iteration — measured 7.9 s → 4.9 s at
        # sf0.1. Reliable checkpoint() on a real cluster.
        .localCheckpoint(eager=True)
    )
    labels = sym.select(F.col("u").alias("node")).distinct().select(
        "node", F.col("node").alias("lab")
    )
    w = Window.partitionBy("node").orderBy(F.col("c").desc(), F.col("lab"))
    for _ in range(iters):
        nbr = sym.join(
            labels.select(F.col("node").alias("v"), "lab"), "v"
        ).select(F.col("u").alias("node"), "lab")
        counts = nbr.groupBy("node", "lab").agg(F.count(F.lit(1)).alias("c"))
        labels = (
            counts.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("node", "lab")
        )
    return labels.select("node", F.col("lab").alias("community"))


def sql_lpa_ctes(edges_cte: str, iters: int = 5) -> str:
    """DuckDB twin of :func:`label_propagation`: identical rule,
    iterations unrolled as chained CTEs (aggregates are not allowed in
    recursive CTE terms). ``edges_cte`` must define e(src, dst); ends
    in lab{iters}(node, lab)."""
    parts = [
        f"e AS ({edges_cte})",
        """sym AS (
      SELECT u, v FROM (
        SELECT src AS u, dst AS v FROM e UNION ALL SELECT dst, src FROM e
      ) WHERE u <> v GROUP BY u, v
    )""",
        "lab0 AS (SELECT DISTINCT u AS node, u AS lab FROM sym)",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"""lab{i} AS (
      SELECT node, lab FROM (
        SELECT s.u AS node, l.lab,
               ROW_NUMBER() OVER (
                 PARTITION BY s.u
                 ORDER BY COUNT(*) DESC, l.lab
               ) AS rn
        FROM sym s JOIN lab{i - 1} l ON l.node = s.v
        GROUP BY s.u, l.lab
      ) WHERE rn = 1
    )"""
        )
    return ",\n    ".join(parts)


def _driver_bfs(spark, e: DataFrame, sources: DataFrame, max_hops: int):
    """Small-graph fast path for bfs_distances (same adaptive valve as
    dedup._driver_union_find): multi-source BFS over a collected
    adjacency map. The BFS crossover sits much lower than union-find's
    (the Python adjacency build pays per collected Row): measured
    break-even around ~80k edges, clear wins only below ~20k where
    per-round scheduler fixed costs dominate — hence the smaller
    default bound. Identical fixpoint: hop distance is unique."""
    from collections import deque

    node_type = dict(e.dtypes)["src"]
    adj: dict = {}
    for row in e.collect():
        adj.setdefault(row.src, []).append(row.dst)
    dist = {}
    dq = deque()
    for row in sources.collect():
        n = row[0]
        if n not in dist:
            dist[n] = 0
            dq.append(n)
    while dq:
        u = dq.popleft()
        if dist[u] >= max_hops:
            continue
        for v in adj.get(u, ()):
            if v not in dist:
                dist[v] = dist[u] + 1
                dq.append(v)
    rows = list(dist.items())
    schema = f"node {node_type}, dist int"
    if not rows:
        return spark.createDataFrame([], schema)
    rdd = spark.sparkContext.parallelize(rows, max(1, len(rows) // 50_000))
    return spark.createDataFrame(rdd, schema)


def bfs_distances(
    edges: DataFrame,
    sources: DataFrame,
    max_hops: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
    small_graph_max_edges: int = 20_000,
) -> DataFrame:
    """Multi-source BFS hop distances over an UNDIRECTED edge list:
    (node, dist) for every node within ``max_hops`` of any source,
    dist = MINIMUM hop count (0 for the sources themselves).

    The distributed BFS shape: hop k joins ONLY the frontier (nodes
    first reached at k−1) against the edge list — visited nodes drop
    out via an anti-join, so per-round work tracks the frontier size,
    not the graph (on an expander the frontier saturates in a few
    hops; on a 100 TB edge list each round is one shuffle of
    frontier-incident edges). Deterministic: hop distance has a unique
    fixpoint. Edge list is materialized once (same posture as
    dedup_clusters / pagerank — swap localCheckpoint for reliable
    checkpoint() on a cluster, DEPLOY.md §1).
    """
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .unionByName(
            edges.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    if e.count() <= small_graph_max_edges:
        return _driver_bfs(
            edges.sparkSession, e, sources.select(sources.columns[0]), max_hops
        )
    dist = (
        sources.select(F.col(sources.columns[0]).alias("node"))
        .distinct()
        .withColumn("dist", F.lit(0))
        .localCheckpoint(eager=True)
    )
    frontier = dist.select("node")
    for k in range(1, max_hops + 1):
        reached = (
            e.join(frontier, e.src == frontier.node)
            .select(F.col("dst").alias("node"))
            .distinct()
        )
        new = (
            reached.join(dist, "node", "left_anti")
            .withColumn("dist", F.lit(k))
            .localCheckpoint(eager=True)
        )
        if new.limit(1).count() == 0:
            break
        dist = dist.unionByName(new).localCheckpoint(eager=True)
        frontier = new.select("node")
    return dist


def _large_star(e: DataFrame) -> DataFrame:
    """One large-star round over a SYMMETRIC edge set e(src, dst):
    every node points its strictly-larger neighbors at the minimum of
    its closed neighborhood. Emitted edges always run larger → smaller
    (dst < src), so each round strictly reduces the potential function
    of Kiveris et al. §3."""
    m = (
        e.groupBy("src")
        .agg(F.min("dst").alias("mn"))
        .withColumn("mn", F.least(F.col("mn"), F.col("src")))
    )
    return (
        e.join(m, "src")
        .where(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("mn").alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """One small-star round: edges oriented larger → smaller, then every
    node rewires its smaller neighbors (and itself) to the minimum of
    that set. Keeps the component-min invariant while flattening short
    chains the large-star step created."""
    oriented = e.select(
        F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
    ).distinct()
    m = oriented.groupBy("src").agg(F.min("dst").alias("mn"))
    rewired = oriented.join(m, "src").select(
        F.col("dst").alias("src"), F.col("mn").alias("dst")
    )
    self_edges = m.select("src", F.col("mn").alias("dst"))
    return (
        rewired.unionByName(self_edges)
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


def connected_components(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    max_rounds: int = 30,
) -> DataFrame:
    """Connected components via ALTERNATING LARGE-STAR / SMALL-STAR
    contraction (Kiveris et al., "Connected Components in MapReduce and
    Beyond", SoCC'14 — public): the fully-distributed CC algorithm that
    converges in O(log n) rounds and needs NO driver-side state at any
    scale — the 100 TB successor of dedup._driver_union_find's bounded
    valve and dedup_clusters' min-label loop (which needs O(diameter)
    rounds on chain-y graphs).

    Each round is two groupBy-min shuffles on the node key plus a
    distinct; edges only ever point larger-id → smaller-id, and the
    unique fixpoint is the star graph (node → component minimum).
    Deterministic: every step is a pure min, so the trajectory — not
    just the fixpoint — is engine-independent and the DuckDB twin can
    value-hash the result. Isolated nodes carry their own id.

    Returns (node, component) for every node incident to an edge.
    Lineage is truncated per round (localCheckpoint — swap for reliable
    checkpoint() on a cluster, DEPLOY.md §1); the loop exits when a
    round changes nothing, with ``max_rounds`` as a safety bound far
    above the O(log n) need.
    """
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    if e.limit(1).count() == 0:
        return e.select(F.col("src").alias("node"), F.col("dst").alias("component"))
    # symmetric closure only for round 1; later rounds keep orientation
    cur = (
        e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # r13 opt — two job-count cuts per round, values untouched:
    # * after_large is no longer checkpointed: _small_star references
    #   its (distinct-terminated) subtree through ONE `oriented`
    #   projection whose exchange Spark reuses (ReusedExchange), so the
    #   extra materialization job bought nothing;
    # * cur's row count is carried in a Python variable instead of
    #   re-counting the checkpointed RDD every round (one count job per
    #   round saved; the exceptAll probe still runs only when counts
    #   match, i.e. normally once, at the fixpoint).
    cur_count = cur.count()
    for _ in range(max_rounds):
        after_large = _large_star(
            cur.unionByName(
                cur.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
            ).distinct()
        )
        after_small = _small_star(after_large).localCheckpoint(eager=True)
        new_count = after_small.count()
        if (
            new_count == cur_count
            and after_small.exceptAll(cur).limit(1).count() == 0
        ):
            cur = after_small
            break
        cur = after_small
        cur_count = new_count
    roots = cur.select(F.col("dst").alias("node")).distinct()
    return (
        cur.select(F.col("src").alias("node"), F.col("dst").alias("component"))
        .unionByName(roots.select("node", F.col("node").alias("component")))
        .distinct()
    )


def k_core(
    edges: DataFrame,
    k: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
    max_rounds: int = 50,
) -> DataFrame:
    """The k-core of an undirected graph (Matula & Beck 1983 peeling,
    distributed): repeatedly delete every node with degree < k until
    none remain; what survives is the unique maximal subgraph with
    min-degree >= k — the density backbone behind community seeding,
    spam-farm detection, and influence-core extraction. Each round is
    one degree aggregate (groupBy-count, map-side combinable) and one
    semi-join filter of the edge list; rounds needed = peeling depth
    (bounded by the degeneracy ordering, small for real graphs).
    Deterministic: the k-core is unique regardless of removal order,
    so the fixpoint is engine- and schedule-independent. Returns
    (node, degree) for surviving nodes; lineage truncated per round
    (localCheckpoint -> reliable checkpoint() on a cluster)."""
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    cur = (
        e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    for _ in range(max_rounds):
        deg = cur.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
        bad = deg.where(F.col("deg") < k).select(F.col("src").alias("node"))
        if bad.limit(1).count() == 0:
            break
        cur = (
            cur.join(bad, cur.src == bad.node, "left_anti")
            .join(bad, cur.dst == bad.node, "left_anti")
            .localCheckpoint(eager=True)
        )
    return (
        cur.groupBy(F.col("src").alias("node"))
        .agg(F.count(F.lit(1)).cast("int").alias("degree"))
    )
