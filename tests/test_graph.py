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
