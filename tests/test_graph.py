"""Iterative graph pass: PageRank analytic + structural checks."""

from __future__ import annotations

from oxi_diel_db_spark.operators.graph import pagerank, triangle_count


def test_pagerank_two_node_cycle_is_symmetric(spark):
    """a⇄b: the fixed point is exactly (0.5, 0.5) for any damping."""
    edges = spark.createDataFrame([("a", "b"), ("b", "a")], "src string, dst string")
    ranks = {r["node"]: r["rank"] for r in pagerank(edges, iters=10).collect()}
    assert ranks == {"a": 0.5, "b": 0.5}


def test_pagerank_star_center_dominates(spark):
    """leaves → center: the center accumulates all damped mass; every
    leaf holds only the teleport share, and mass is conserved (no
    dangling loss here because the center links back)."""
    leaves = [f"l{i}" for i in range(4)]
    edges = spark.createDataFrame(
        [(leaf, "c") for leaf in leaves] + [("c", leaf) for leaf in leaves],
        "src string, dst string",
    )
    ranks = {r["node"]: r["rank"] for r in pagerank(edges, iters=20).collect()}
    assert ranks["c"] > 0.4
    leaf_ranks = {ranks[leaf] for leaf in leaves}
    assert len(leaf_ranks) == 1  # symmetry
    assert abs(sum(ranks.values()) - 1.0) < 1e-4


def test_pagerank_weights_shift_mass(spark):
    """src splits 3:1 between b and c → b's rank strictly exceeds c's."""
    edges = spark.createDataFrame(
        [("a", "b", 3.0), ("a", "c", 1.0), ("b", "a", 1.0), ("c", "a", 1.0)],
        "src string, dst string, w double",
    )
    ranks = {
        r["node"]: r["rank"]
        for r in pagerank(edges, iters=20, weight_col="w").collect()
    }
    assert ranks["b"] > ranks["c"]


def test_triangle_count_k4_and_isolated_edge(spark):
    """K4 has 3 triangles per vertex; a disjoint edge contributes 0s.
    Duplicate/reversed input edges must not inflate counts."""
    k4 = [(a, b) for a in "abcd" for b in "abcd" if a < b]
    edges = spark.createDataFrame(
        k4 + [(b, a) for a, b in k4] + [("x", "y"), ("y", "x")],
        "src string, dst string",
    )
    out = {r["node"]: r["triangles"] for r in triangle_count(edges).collect()}
    assert out == {"a": 3, "b": 3, "c": 3, "d": 3, "x": 0, "y": 0}


def test_triangle_count_path_has_none(spark):
    """A 4-path has zero triangles everywhere; self-loops are dropped."""
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("b", "b")],
        "src string, dst string",
    )
    out = {r["node"]: r["triangles"] for r in triangle_count(edges).collect()}
    assert out == {"a": 0, "b": 0, "c": 0, "d": 0}


def test_label_propagation_disjoint_cliques(spark):
    """Two disjoint triangles each converge to their minimum label
    (min-label tie-break makes the rule deterministic)."""
    from oxi_diel_db_spark.operators.graph import label_propagation

    tri = lambda a, b, c: [(a, b), (b, c), (a, c)]  # noqa: E731
    edges = spark.createDataFrame(
        tri(1, 2, 3) + tri(10, 11, 12), "src long, dst long"
    )
    out = {r["node"]: r["community"] for r in label_propagation(edges, iters=5).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10}


def test_label_propagation_star_oscillates_deterministically(spark):
    """Synchronous LPA on a bipartite star flip-flops: each round the
    center adopts the min leaf label while every leaf adopts the
    center's previous label. The value of determinism is that the
    oscillation itself is reproducible — after any EVEN number of
    rounds the state is exactly (center: own, leaves: min-leaf)."""
    from oxi_diel_db_spark.operators.graph import label_propagation

    edges = spark.createDataFrame(
        [(5, leaf) for leaf in (6, 7, 8, 9)], "src long, dst long"
    )
    out = {r["node"]: r["community"] for r in label_propagation(edges, iters=6).collect()}
    assert out == {5: 5, 6: 6, 7: 6, 8: 6, 9: 6}


def test_bfs_distances_path_and_bounds(spark):
    """Path 1-2-3-4-5 plus island 10-11: seeds {1, 10}; max_hops=2 must
    reach exactly dist<=2 nodes with min hop counts, island included."""
    from oxi_diel_db_spark.operators.graph import bfs_distances

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(1,), (10,)], "node long")
    got = {r.node: r.dist for r in bfs_distances(edges, seeds, max_hops=2).collect()}
    assert got == {1: 0, 2: 1, 3: 2, 10: 0, 11: 1}
    # distributed frontier loop (small_graph_max_edges=0) must agree
    dist = {r.node: r.dist for r in bfs_distances(
        edges, seeds, max_hops=2, small_graph_max_edges=0).collect()}
    assert dist == got
    # diamond: two equal-length paths -> MIN dist, counted once
    edges2 = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 4), (3, 4)], "src long, dst long"
    )
    seeds2 = spark.createDataFrame([(1,)], "node long")
    got2 = {r.node: r.dist for r in bfs_distances(edges2, seeds2, max_hops=5).collect()}
    assert got2 == {1: 0, 2: 1, 3: 1, 4: 2}


def test_connected_components_star_contraction(spark):
    """Chain, triangle, and isolated pair resolve to component minima;
    the fixpoint must label every incident node."""
    from oxi_diel_db_spark.operators.graph import connected_components

    edges = spark.createDataFrame(
        [(2, 1), (3, 2), (4, 3), (5, 4), (10, 11), (11, 12), (12, 10), (20, 21)],
        "src long, dst long",
    )
    got = {r.node: r.component for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1,
                   10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_connected_components_empty_and_selfloop(spark):
    from oxi_diel_db_spark.operators.graph import connected_components

    empty = spark.createDataFrame([], "src long, dst long")
    assert connected_components(empty).collect() == []
    loops = spark.createDataFrame([(7, 7), (3, 8)], "src long, dst long")
    got = {r.node: r.component for r in connected_components(loops).collect()}
    assert got == {3: 3, 8: 3}


def test_connected_components_long_chain_needs_log_rounds(spark):
    """A 33-node chain: min-label propagation would need 32 rounds;
    alternating stars must converge inside the default bound and still
    label everything with the minimum."""
    from oxi_diel_db_spark.operators.graph import connected_components

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 33)], "src long, dst long"
    )
    got = {r.node: r.component for r in connected_components(edges).collect()}
    assert got == {i: 1 for i in range(1, 34)}


def test_k_core_matches_python_peeling(spark):
    """The distributed peel must agree with a from-scratch sequential
    peeling node-for-node (the k-core is unique), on a graph with a
    planted 4-clique (survives k=3), a chain (peels away), and a
    triangle (peels at k=3 after the pendant goes)."""
    from collections import defaultdict

    from oxi_diel_db_spark.operators.graph import k_core

    edges = [
        (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),  # 4-clique
        (4, 5), (5, 6), (6, 7),                          # chain tail
        (10, 11), (11, 12), (12, 10),                    # triangle
    ]
    got = {
        r["node"]: r["degree"]
        for r in k_core(
            spark.createDataFrame(edges, "src long, dst long"), k=3
        ).collect()
    }

    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    changed = True
    while changed:
        changed = False
        for n in list(adj):
            if len(adj[n]) < 3:
                for m in adj.pop(n):
                    adj[m].discard(n)
                changed = True
    want = {n: len(ms) for n, ms in adj.items() if ms}
    assert got == want
    assert set(got) == {1, 2, 3, 4}  # only the clique survives k=3


def test_k_core_registered_runs(spark):
    from oxi_diel_db_spark.queries import load_registry

    rows = load_registry()["g6_kcore"].build(
        spark, "/root/testdata/sf0.001"
    ).collect()
    # every surviving node has in-core degree >= 3 by definition
    assert all(r["degree"] >= 3 for r in rows)


def test_copurchase_cap_not_binding_at_gate_sf(spark):
    """The r9 per-k contribution cap (64, added after the sf1 sweep
    OOM'd the uncapped quadratic k-join) must be INVISIBLE at gate
    SF: max users-per-k at sf0.01 is 29, so the capped edge set
    equals the uncapped one — the five graph queries' official rows
    stay valid without re-certification."""
    import pyspark.sql.functions as F

    from oxi_diel_db_spark.queries.llm_ops import _copurchase_edges
    from oxi_diel_db_spark.queries._util import t

    sf = "/root/testdata/sf0.01"
    capped = {(r["src"], r["dst"]) for r in _copurchase_edges(spark, sf).collect()}

    uk = (
        t(spark, sf, "events")
        .filter(F.col("event_type") == "purchase")
        .select("user_id", F.get_json_object("props", "$.k").cast("int").alias("k"))
        .distinct()
    )
    a = uk.select(F.col("user_id").alias("ua"), "k")
    b = uk.select(F.col("user_id").alias("ub"), "k")
    uncapped = {
        (r["src"], r["dst"])
        for r in (
            a.join(b, "k")
            .where(F.col("ua") < F.col("ub"))
            .groupBy("ua", "ub")
            .agg(F.count(F.lit(1)).alias("shared"))
            .where(F.col("shared") >= 4)
            .select(F.col("ua").alias("src"), F.col("ub").alias("dst"))
            .collect()
        )
    }
    assert capped == uncapped and len(capped) > 0


def test_copurchase_cap_bounds_hot_key_fanout(spark):
    """Planted hot key: 200 users all purchasing the same 4 k values
    would produce C(200,2)=19,900 edges uncapped; the md5-rank cap
    keeps <= 64 users per k, bounding edges at C(64,2) — the
    quadratic blowup the sf1 sweep measured (680 s + OOM) cannot
    recur however hot a key gets."""
    import pyspark.sql.functions as F

    from oxi_diel_db_spark.operators.sampling import capped_sample_per_key

    rows = [(u, k) for u in range(200) for k in (1, 2, 3, 4)]
    uk = spark.createDataFrame(rows, "user_id long, k int")
    capped = capped_sample_per_key(uk, "k", "user_id", max_rows=64)
    assert capped.groupBy("k").count().agg(F.max("count")).collect()[0][0] == 64
    a = capped.select(F.col("user_id").alias("ua"), "k")
    b = capped.select(F.col("user_id").alias("ub"), "k")
    edges = (
        a.join(b, "k")
        .where(F.col("ua") < F.col("ub"))
        .groupBy("ua", "ub")
        .agg(F.count(F.lit(1)).alias("shared"))
        .where(F.col("shared") >= 4)
    )
    n = edges.count()
    assert 0 < n <= 64 * 63 // 2
