"""ANN: brute-force exactness on a known geometry + LSH recall."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from oxi_diel_db_spark.operators import similarity


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.RandomState(7)
    base = rng.randn(20, 16)
    vecs = rng.randn(200, 16) * 0.1 + base[rng.randint(0, 20, 200)]
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_brute_force_topk_matches_numpy(spark, emb):
    probes = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = similarity.brute_force_topk(emb, probes, k=5).collect()
    mat = np.array(
        [r["embedding"] for r in emb.orderBy("vec_id").collect()], dtype=np.float64
    )
    norms = np.linalg.norm(mat, axis=1)
    for q in range(3):
        cos = mat @ mat[q] / (norms * norms[q])
        cos[q] = -np.inf
        expected = set(np.argsort(-np.round(cos, 6), kind="stable")[:5])
        got_q = {r["neighbor_id"] for r in got if r["query_id"] == q}
        # allow tie-boundary slack of one element
        assert len(expected & got_q) >= 4


def test_lsh_recall_vs_brute_force(spark, emb):
    probes = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = similarity.brute_force_topk(emb, probes, k=5).collect()
    approx = similarity.lsh_topk(emb, probes, k=5, n_planes=4).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    approx_sets = {}
    for r in approx:
        approx_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recalls = [
        len(exact_sets[q] & approx_sets.get(q, set())) / len(exact_sets[q])
        for q in exact_sets
    ]
    assert sum(recalls) / len(recalls) >= 0.5  # multiprobe LSH, 4 planes


def test_lsh_deterministic(spark, emb):
    probes = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    a = sorted(map(tuple, similarity.lsh_topk(emb, probes, k=5).collect()))
    b = sorted(map(tuple, similarity.lsh_topk(emb, probes, k=5).collect()))
    assert a == b


def test_ivf_recall_vs_brute_force(spark, emb):
    probes = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = similarity.brute_force_topk(emb, probes, k=5).collect()
    approx = similarity.ivf_topk(emb, probes, k=5, n_centroids=8, nprobe=3).collect()
    exact_sets, approx_sets = {}, {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    for r in approx:
        approx_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recalls = [
        len(exact_sets[q] & approx_sets.get(q, set())) / len(exact_sets[q])
        for q in exact_sets
    ]
    # clustered fixture (20 true centers): nearest neighbors share the
    # probe's cell almost always; 3-probe routing recovers the rest
    assert sum(recalls) / len(recalls) >= 0.6


def test_ivf_cells_partition_corpus(spark, emb):
    from oxi_diel_db_spark.functions.vectors import as_double, norm

    c = emb.select("vec_id", as_double("embedding").alias("cv")).withColumn(
        "cn", norm(F.col("cv"))
    )
    cents = similarity._seed_centroids(c, 8, "vec_id", 42)
    assert len(cents) == 8
    assert len({cid for cid, _, _ in cents}) == 8


def test_ivf_shuffled_probe_join_matches_broadcast(spark, emb):
    """broadcast_probes=False (the million-probe scale path: shuffle-hash
    join on cell) must return exactly the broadcast path's results."""
    probes = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    assigned, cents = similarity.ivf_index(emb, n_centroids=8)
    bc = similarity.ivf_search(assigned, cents, probes, k=5, nprobe=3)
    sh = similarity.ivf_search(
        assigned, cents, probes, k=5, nprobe=3, broadcast_probes=False
    )
    assert sorted(map(tuple, bc.collect())) == sorted(map(tuple, sh.collect()))
    # the scale path must not contain a broadcast of the probe side
    plan = sh._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in plan


def test_pq_twin_recovery_and_recall(spark, emb):
    """PQ/ADC sanity on the clustered fixture: (1) an exact twin of a
    corpus vector lands in the ADC top-10 (its ADC distance equals the
    twin's own quantization error; same-cluster vectors may legitimately
    rank closer); (2) recall@30 of the exact cosine top-10 is high —
    clusters survive quantization (vs ~15% chance rate)."""
    probes = emb.filter((F.col("vec_id") >= 100) & (F.col("vec_id") < 105)).select(
        (F.col("vec_id") + 1000).alias("query_id"), "embedding"
    )
    top10 = similarity.pq_topk(emb, probes, k=10).collect()
    hits = {(r.query_id, r.neighbor_id) for r in top10}
    assert {(q + 1000, q) for q in range(100, 105)} <= hits

    base = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {
        (r.query_id, r.neighbor_id)
        for r in similarity.brute_force_topk(emb, base, k=10).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in similarity.pq_topk(emb, base, k=30).collect()
    }
    assert len(exact & approx) / len(exact) >= 0.8


def test_filtered_ann_prefilter_not_postfilter(spark):
    """Pre-filter vs post-filter: with a selective predicate, the
    post-filtered unfiltered top-k returns SHORT lists while the
    pre-filtered search still yields k exact in-predicate neighbors —
    the difference s6 exists to pin down."""
    from pyspark.sql import functions as F

    from oxi_diel_db_spark.operators.similarity import brute_force_topk, filtered_topk
    from oxi_diel_db_spark.tables import load

    emb = load(spark, "embeddings", "/root/testdata/sf0.01")
    probes = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "label", "embedding"
    )
    pre = filtered_topk(emb, probes, filter_col="label", k=10)
    assert all(r["rn"] <= 10 for r in pre.collect())
    counts = {r["query_id"]: r["n"] for r in pre.groupBy("query_id").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert all(v == 10 for v in counts.values())  # full lists under the predicate

    # post-filter: take the unfiltered top-10, THEN apply the predicate
    post = brute_force_topk(emb, probes.drop("label"), k=10).join(
        emb.select(F.col("vec_id").alias("neighbor_id"), "label"), "neighbor_id"
    ).join(
        probes.select("query_id", F.col("label").alias("plabel")), "query_id"
    ).filter(F.col("label") == F.col("plabel"))
    post_counts = {
        r["query_id"]: r["n"]
        for r in post.groupBy("query_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    # with several labels in the corpus, the post-filtered lists come up short
    assert any(post_counts.get(q, 0) < 10 for q in counts)
    # and every pre-filtered neighbor really shares the probe's label
    chk = pre.join(
        emb.select(F.col("vec_id").alias("neighbor_id"), "label"), "neighbor_id"
    ).join(probes.select("query_id", F.col("label").alias("plabel")), "query_id")
    assert chk.filter(F.col("label") != F.col("plabel")).count() == 0


def test_ivf_filtered_respects_predicate_and_recall(spark):
    """s7: every neighbor shares the probe's label, and the in-cell
    predicate loses little vs the filtered brute force (recall@10
    floor on this corpus)."""
    from pyspark.sql import functions as F

    from oxi_diel_db_spark.operators.similarity import filtered_topk, ivf_topk
    from oxi_diel_db_spark.tables import load

    emb = load(spark, "embeddings", "/root/testdata/sf0.01")
    probes = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "label", "embedding"
    )
    ivf = ivf_topk(emb, probes, k=10, n_centroids=8, nprobe=2, filter_col="label")
    chk = ivf.join(
        emb.select(F.col("vec_id").alias("neighbor_id"), "label"), "neighbor_id"
    ).join(probes.select("query_id", F.col("label").alias("plabel")), "query_id")
    assert chk.filter(F.col("label") != F.col("plabel")).count() == 0

    truth = filtered_topk(emb, probes, filter_col="label", k=10)
    hit = ivf.join(truth, ["query_id", "neighbor_id"], "inner").count()
    assert hit / truth.count() >= 0.3  # aggressive pruning on 500 vecs


def test_s8_mmr_matches_pure_python(spark):
    """The distributed MMR must replay step-for-step against a
    from-scratch Python greedy over the same candidates: same
    selections, same order, same scores — including the 6-dp round
    before each argmax and the lowest-id tie-break."""
    import numpy as np

    import pyspark.sql.functions as F

    from oxi_diel_db_spark.operators.similarity import brute_force_topk
    from oxi_diel_db_spark.queries import load_registry
    from oxi_diel_db_spark.queries._util import t

    sf = "/root/testdata/sf0.001"
    got = [
        tuple(r)
        for r in load_registry()["s8_mmr_rerank"]
        .build(spark, sf)
        .orderBy("query_id", "mmr_rank")
        .collect()
    ]

    emb = t(spark, sf, "embeddings")
    probes = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cands = brute_force_topk(emb, probes, k=20).toPandas()
    vecs = {
        int(r["vec_id"]): np.array(r["embedding"], dtype=np.float64)
        for r in emb.select("vec_id", "embedding").collect()
    }
    lam = 0.7
    want = []
    for qid in sorted(cands["query_id"].unique()):
        sub = cands[cands["query_id"] == qid].sort_values("neighbor_id")
        ids = sub["neighbor_id"].tolist()
        rel = dict(zip(sub["neighbor_id"], sub["cos"]))
        m = np.stack([vecs[i] for i in ids])
        nrm = np.sqrt((m * m).sum(axis=1))
        sim = np.round((m @ m.T) / np.outer(nrm, nrm) + 1e-9, 6)
        pos = {d: i for i, d in enumerate(ids)}
        sel = []
        for step in range(5):
            best, best_s = None, None
            for d in ids:
                if d in sel:
                    continue
                pen = max(sim[pos[d], pos[s]] for s in sel) if sel else 0.0
                import math

                x = float(lam * rel[d] - (1 - lam) * pen)
                sc = math.floor(x * 1e6 + 0.5) / 1e6
                if best_s is None or sc > best_s or (sc == best_s and d < best):
                    best, best_s = d, sc
            sel.append(best)
            want.append((int(qid), step + 1, int(best), float(rel[best]), best_s))
    assert got == want


def test_gemm_brute_matches_sql_brute_exactly(spark):
    """The GEMM path must reproduce brute_force_topk value-for-value
    on a synthetic corpus large enough to span many Arrow batches and
    force the two-level top-k reduction (per-partition then global)."""
    import numpy as np

    from pyspark.sql import functions as F

    from oxi_diel_db_spark.operators.similarity import (
        brute_force_topk,
        gemm_brute_topk,
    )

    rng = np.random.RandomState(5)
    n, d = 4000, 16
    vecs = rng.randn(n, d).round(3)
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id bigint, embedding array<double>",
    ).repartition(8)
    probes = corpus.filter(F.col("vec_id") < 7).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    a = sorted(map(tuple, brute_force_topk(corpus, probes, k=10).collect()))
    b = sorted(map(tuple, gemm_brute_topk(corpus, probes, k=10).collect()))
    assert a == b
    assert len(a) == 70


def test_gemm_brute_empty_probes_and_corpus(spark):
    from oxi_diel_db_spark.operators.similarity import gemm_brute_topk

    empty = spark.createDataFrame([], "vec_id bigint, embedding array<double>")
    probes = empty.selectExpr("vec_id AS query_id", "embedding")
    assert gemm_brute_topk(empty, probes).collect() == []
    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "vec_id bigint, embedding array<double>"
    )
    assert gemm_brute_topk(corpus, probes).collect() == []


def test_gemm_ivf_assignment_matches_expression_path(spark, sf_dir):
    """The r8 semdedup scale probe's deployment path (ivf_assign_gemm)
    must agree with the hash-gated expression fold (ivf_index) on the
    gate corpus: same cell for every vector, same norms to 1e-9. The
    documented divergence risk is a 1e-6 ROUNDED-cosine argmax tie —
    absent from this corpus, so exact agreement is asserted (if a
    future testdata refresh plants such a tie, this test is the canary
    that documents it)."""
    import pyspark.sql.functions as F

    from oxi_diel_db_spark.operators.similarity import ivf_assign_gemm, ivf_index
    from oxi_diel_db_spark.tables import load

    emb = load(spark, "embeddings", sf_dir)
    assigned_expr, cents = ivf_index(emb, n_centroids=16, seed=42)
    a = assigned_expr.select("vec_id", F.col("cell").alias("cell_e"),
                             F.col("cn").alias("cn_e"))
    b = ivf_assign_gemm(emb, cents).select(
        "vec_id", F.col("cell").alias("cell_g"), F.col("cn").alias("cn_g"))
    j = a.join(b, "vec_id")
    assert j.count() == emb.count()
    assert j.filter(F.col("cell_e") != F.col("cell_g")).count() == 0
    assert j.filter(F.abs(F.col("cn_e") - F.col("cn_g")) > 1e-9).count() == 0


def test_semdedup_gemm_keep_set_matches_d16(spark, sf_dir):
    """semdedup_cells_gemm (the scale path) must reproduce d16's
    registered keep/n_near decisions on the gate corpus — same cells,
    same keep-first semantics, same threshold. d16 rounds cosine to
    6 dp before the >= test exactly like the GEMM kernel's np.round,
    so only a true 1e-6 tie could diverge (none in the corpus)."""
    import pyspark.sql.functions as F

    from oxi_diel_db_spark.operators.similarity import (
        ivf_assign_gemm, ivf_index, semdedup_cells_gemm)
    from oxi_diel_db_spark.queries import load_registry
    from oxi_diel_db_spark.tables import load

    emb = load(spark, "embeddings", sf_dir)
    _, cents = ivf_index(emb, n_centroids=16, seed=42)
    assigned = ivf_assign_gemm(emb, cents)
    got = {
        r["vec_id"]: (r["cell"], r["n_near"], r["keep"])
        for r in semdedup_cells_gemm(assigned, threshold=0.4).collect()
    }
    want = {
        r["vec_id"]: (r["cell"], r["n_near"], r["keep"])
        for r in load_registry()["d16_semantic_dedup"].build(spark, sf_dir).collect()
    }
    assert got == want and len(got) > 0


def test_gemm_zero_norm_vector_is_deterministic_and_never_near(spark):
    """r8 advice: a zero vector's 0/0 cosine used to NaN-poison the
    GEMM paths (numpy argmax treats NaN as maximal; numpy comparisons
    with NaN go False while Spark ranks NaN above every double). With
    the guard, cosine is 0.0 everywhere: assignment routes to the
    smallest centroid id (first-max argmax, same as the expression
    fold's all-equal tie rule) and the pairwise stage never counts it
    near anything — it is always kept, in both paths."""
    import math

    from oxi_diel_db_spark.operators.similarity import (
        ivf_assign_gemm, ivf_index, semdedup_cells_gemm)

    rows = [(i, [math.cos(i * 0.7), math.sin(i * 0.7)]) for i in range(1, 40)]
    rows.append((0, [0.0, 0.0]))  # the zero vector, smallest id
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    _, cents = ivf_index(emb.filter("vec_id > 0"), n_centroids=4, seed=42)
    assigned = ivf_assign_gemm(emb, cents)
    zrow = assigned.filter("vec_id = 0").collect()[0]
    assert zrow["cell"] == min(int(c[0]) for c in cents)  # deterministic
    assert zrow["cn"] == 0.0  # true norm survives the guard
    out = {
        r["vec_id"]: (r["n_near"], r["keep"])
        for r in semdedup_cells_gemm(assigned, threshold=0.4).collect()
    }
    assert out[0] == (0, 1)  # zero vector near nothing, kept
    # and no NaN leaked anywhere: every other vector got a real cell
    assert all(not math.isnan(float(r["cn"])) for r in assigned.collect())


def test_s10_rerank_is_exact_over_candidates(spark, sf_dir):
    """Two-stage contract: s10's final top-10 per query must equal the
    EXACT squared-L2 ranking restricted to the PQ candidate set — ADC
    only nominates, never orders the final list."""
    import collections

    import pyspark.sql.functions as F

    from oxi_diel_db_spark.functions.vectors import as_double
    from oxi_diel_db_spark.operators.similarity import _l2sq, pq_topk
    from oxi_diel_db_spark.queries import load_registry
    from oxi_diel_db_spark.tables import load

    sf = "/root/testdata/sf0.01"
    got = {
        (r["query_id"], r["rn"]): (r["neighbor_id"], r["l2sq"])
        for r in load_registry()["s10_two_stage_retrieval"].build(spark, sf).collect()
    }
    emb = load(spark, "embeddings", sf)
    probes = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cand = pq_topk(emb, probes, k=50, m=16, n_codes=16, seed=42)
    nv = emb.select(F.col("vec_id").alias("neighbor_id"),
                    as_double("embedding").alias("nv"))
    pv = probes.select("query_id", as_double("embedding").alias("pv"))
    rows = (cand.select("query_id", "neighbor_id").join(nv, "neighbor_id")
            .join(pv, "query_id")
            .select("query_id", "neighbor_id",
                    F.round(_l2sq(F.col("pv"), F.col("nv")), 6).alias("l2sq"))
            .collect())
    per_q = collections.defaultdict(list)
    for r in rows:
        per_q[r["query_id"]].append((r["l2sq"], r["neighbor_id"]))
    want = {}
    for q, lst in per_q.items():
        for rn, (l2, nid) in enumerate(sorted(lst)[:10], start=1):
            want[(q, rn)] = (nid, l2)
    assert got == want and len(got) == 50


def test_s10_recall_vs_exact_l2_brute(spark):
    """Two-stage recall@10 vs the exact full-corpus L2 ranking (the
    SAME metric ADC approximates — the original cosine version of
    this test measured recall 0.32 and exposed the mixed-metric
    two-stage bug the query now documents; the m=4 nominator scored
    the same 0.32 — the subspace sweep in s10's docstring picked
    m=16). Observed 0.80; floor 0.7."""
    import collections

    import pyspark.sql.functions as F

    from oxi_diel_db_spark.functions.vectors import as_double
    from oxi_diel_db_spark.operators.similarity import _l2sq
    from oxi_diel_db_spark.queries import load_registry
    from oxi_diel_db_spark.tables import load

    sf = "/root/testdata/sf0.01"
    emb = load(spark, "embeddings", sf)
    probes = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    nv = emb.select(F.col("vec_id").alias("neighbor_id"),
                    as_double("embedding").alias("nv"))
    pv = probes.select("query_id", as_double("embedding").alias("pv"))
    rows = (pv.crossJoin(nv)
            .where(F.col("query_id") != F.col("neighbor_id"))
            .select("query_id", "neighbor_id",
                    _l2sq(F.col("pv"), F.col("nv")).alias("l2sq")).collect())
    per_q = collections.defaultdict(list)
    for r in rows:
        per_q[r["query_id"]].append((r["l2sq"], r["neighbor_id"]))
    exact = {
        (q, nid)
        for q, lst in per_q.items()
        for _l2, nid in sorted(lst)[:10]
    }
    two = {
        (r["query_id"], r["neighbor_id"])
        for r in load_registry()["s10_two_stage_retrieval"].build(spark, sf).collect()
    }
    assert len(two & exact) / len(exact) >= 0.7
