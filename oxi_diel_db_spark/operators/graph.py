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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    iters: int = 10,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = None,
) -> DataFrame:
    """Weighted PageRank over (src, dst[, weight]) edges; returns
    (node, rank) rounded to 6 dp. Nodes = union of endpoints; dangling
    mass is dropped (simplified PR — the oracle drops it identically).
    Contribution of src → dst is rank_src · w / Σ_out(w)."""
    w = F.col(weight_col).cast("double") if weight_col else F.lit(1.0)
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst"), w.alias("w")
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionAll(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    n_nodes = nodes.count()  # one tiny action; N is also the teleport term
    outw = e.groupBy("src").agg(F.sum("w").alias("outw"))
    # normalized transition weight, fixed once (round: engine-portable)
    trans = e.join(outw, "src").select(
        "src", "dst", F.round(F.col("w") / F.col("outw"), 9).alias("p")
    )
    base = F.round(F.lit(1.0 / n_nodes), 9)
    ranks = nodes.select("node", base.alias("rank"))
    teleport = F.round(F.lit((1.0 - damping) / n_nodes), 9)
    for _ in range(iters):
        contrib = (
            trans.join(ranks, trans.src == ranks.node)
            .select("dst", (F.col("rank") * F.col("p")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = (
            nodes.join(contrib, nodes.node == contrib.dst, "left")
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
