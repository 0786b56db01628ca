"""Plan-shape assertions — the 100 TB posture checks (SURVEY §4.2).

Correctness tests prove the small-SF answer; these prove the PLAN is
the one that survives a 1000-executor / 100 TB scale-up: filters reach
the parquet scan, projections prune columns (including nested fields),
dim joins broadcast, top-k avoids a global sort.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from oxi_diel_db_spark.queries import load_registry

SF = "/root/testdata/sf0.001"


@pytest.fixture(autouse=True)
def _uncached(spark):
    # other test modules cache tables; a cached relation replaces the
    # parquet scan and would hide pushdown/pruning from these plans
    spark.catalog.clearCache()
    yield


def plan_of(spark, name: str) -> str:
    reg = load_registry()
    df = reg[name].build(spark, SF)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def test_filter_pushdown_to_parquet(spark):
    plan = plan_of(spark, "q03_predicates")
    assert "PushedFilters:" in plan
    # the BETWEEN bounds and IN set must reach the scan
    assert "GreaterThanOrEqual(l_quantity,10.0)" in plan
    assert "In(l_returnflag" in plan


def test_column_pruning(spark):
    plan = plan_of(spark, "q06_topk")
    # ReadSchema must contain only the 3 projected columns
    read = [line for line in plan.splitlines() if "ReadSchema" in line][0]
    assert "l_extendedprice" in read and "l_quantity" not in read and "l_tax" not in read


def test_topk_plans_take_ordered(spark):
    plan = plan_of(spark, "q06_topk")
    assert "TakeOrderedAndProject" in plan  # no global sort for ORDER+LIMIT


def test_dim_joins_broadcast(spark):
    plan = plan_of(spark, "q30_multiway_join")
    assert plan.count("BroadcastHashJoin") >= 3  # customer, nation, region


def test_point_lookup_pushes_key(spark):
    plan = plan_of(spark, "q02_point_lookup")
    assert "EqualTo(o_orderkey,7)" in plan


def test_nested_schema_pruning(spark):
    """m01 projects one struct field; the scan must not read the full
    spacegroup struct (nestedSchemaPruning)."""
    plan = plan_of(spark, "m01_point_lookup")
    read = [line for line in plan.splitlines() if "ReadSchema" in line][0]
    assert "symbol" in read
    assert "crystal_system" not in read  # sibling field pruned
    assert "structure" not in read  # untouched big struct pruned entirely


def test_asof_join_single_shuffle(spark):
    """The as-of recipe must not multiply rows: exactly one Exchange for
    the window (plus scan-side exchanges are absent — union is free)."""
    plan = plan_of(spark, "q37_asof_join")
    n_exchange = plan.count(") Exchange")
    assert n_exchange == 1, plan


def test_pit_enrich_single_shuffle(spark):
    """q99: N feature streams must NOT mean N shuffles of the
    observations — the tagged-union recipe carries every stream under
    ONE window, so exactly one Exchange appears (two chained asof
    joins would show two)."""
    plan = plan_of(spark, "q99_observation_join")
    assert plan.count(") Exchange") == 1, plan


def test_agg_is_partial_then_final(spark):
    plan = plan_of(spark, "q01_pricing_summary")
    assert plan.count("HashAggregate") >= 2  # map-side combine present


def test_agg_runs_in_whole_stage_codegen(spark):
    """Codegen spans only materialize in the executed (post-AQE) plan."""
    reg = load_registry()
    df = reg["q01_pricing_summary"].build(spark, SF)
    df.collect()
    executed = df._jdf.queryExecution().executedPlan().toString()
    # '*(n)' prefixes mark whole-stage-codegen'd operators
    assert "*(1)" in executed and "partial_sum" in executed


def test_q51_aggregates_before_join(spark):
    """Q18 shape: the lineitem aggregate must sit BELOW the join with
    orders (aggregate-before-join keeps the join input ~200 rows at any
    scale; joining 100 TB of raw lineitem first would be the wrong
    plan)."""
    plan = plan_of(spark, "q51_large_volume")
    assert "SortMergeJoin" in plan or "BroadcastHashJoin" in plan
    # the tree prints the join with the aggregate indented beneath it
    # (child = runs first); a plan that joined raw lineitem would show
    # the join under the aggregate instead
    tree = plan.split("\n\n")[0]
    agg_line = next(ln for ln in tree.splitlines() if "HashAggregate" in ln)
    join_line = next(
        ln for ln in tree.splitlines() if "MergeJoin" in ln or "BroadcastHashJoin" in ln
    )
    assert tree.index(join_line) < tree.index(agg_line)
    # and the aggregate really is the orderkey rollup (details section)
    assert "Keys [1]: [l_orderkey" in plan


def test_tfidf_df_side_broadcasts(spark):
    """t5: the vocabulary-sized document-frequency aggregate joins the
    doc-partitioned tf side via broadcast — no shuffle of tf."""
    plan = plan_of(spark, "t5_tfidf_topterms")
    assert "BroadcastHashJoin" in plan


def test_ivf_corpus_side_streams(spark):
    """s3: cell assignment is a literal expression over the scan; the
    corpus never shuffles before the (broadcast) cell join. The only
    Exchanges allowed are for the tiny routed/probe side and the final
    per-query window."""
    plan = plan_of(spark, "s3_ann_ivf")
    assert "BroadcastHashJoin" in plan
    # corpus side: scan feeds the join through project/filter only —
    # no Exchange may sit between the embeddings scan and the join.
    # Cheap proxy: exactly one SortMergeJoin-free plan with <= 3
    # Exchanges total (probe broadcast + window partitioning).
    assert "SortMergeJoin" not in plan
    assert plan.count("Exchange") <= 6  # formatted mode double-counts


def test_asof_explicit_repartition_reused_by_window(spark):
    """asof_join(shuffle_partitions=N): the explicit hash repartition on
    the keys must satisfy the window's required distribution — exactly
    one Exchange in the plan, not two."""
    from oxi_diel_db_spark.operators.asof import asof_join
    from oxi_diel_db_spark.tables import load

    e = load(spark, "events", SF)
    probes = e.filter(F.col("event_type") == "purchase").select("event_id", "ts", "user_id")
    builds = e.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("b_ts"), F.col("value").alias("b_value")
    )
    df = asof_join(
        probe=probes, build=builds, on="user_id", probe_ts="ts",
        build_ts="b_ts", payload=["b_value"], shuffle_partitions=64,
    )
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    plan = df._jdf.queryExecution().explainString(mode)
    assert plan.count("Exchange hashpartitioning") == 1


def test_deterministic_shuffle_rank_fans_out(spark):
    """p3's global row-number must NOT single-partition the data: the
    rank window partitions by the hash-prefix bucket (Exchange
    hashpartitioning(__b)), and the only SinglePartition exchange in
    the plan feeds the <=256-row bucket-offset aggregate."""
    plan = plan_of(spark, "p3_deterministic_shuffle")
    assert "hashpartitioning(__b" in plan  # data-side rank shuffle fans out
    # offsets prefix-sum is the lone single-partition stage (tiny agg)
    assert plan.count("SinglePartition") <= 1


def test_pack_sequences_cumsum_fans_out(spark):
    plan = plan_of(spark, "p4_sequence_packing")
    assert "hashpartitioning(__b" in plan
    assert plan.count("SinglePartition") <= 1


def test_bucketed_join_has_no_prejoin_exchange(spark):
    """q83: both sides bucketed on the join key → the sort-merge join
    consumes the bucketed scans directly; the ONLY hash exchange in the
    plan is the post-join segment rollup. SelectedBucketsCount in the
    scan proves the bucketed layout is actually read as buckets."""
    reg = load_registry()
    df = reg["q83_bucketed_join"].build(spark, SF)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    plan = df._jdf.queryExecution().explainString(mode)
    assert "SortMergeJoin" in plan
    assert plan.count("Exchange hashpartitioning") == 1  # the rollup only
    fmt = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "SelectedBucketsCount: 8 out of 8" in fmt


def test_dpp_join_query_prunes_partitions(spark):
    """q84: the registry query's executed plan must carry a
    dynamicpruning subquery on the partition column (the dim's keys
    become the fact scan's partition list at runtime)."""
    reg = load_registry()
    df = reg["q84_dpp_join"].build(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert (
        "dynamicpruning" in plan.lower()
        or "PartitionFilters: [isnotnull(o_orderstatus" in plan
    ), plan[:2000]


def test_runtime_bloom_join_injects_filter(spark):
    """q87: with the application-side threshold lowered, the optimizer
    must inject a runtime Bloom filter — creation side aggregates
    `bloom_filter_agg` over the filtered orders keys and the lineitem
    side probes with `BloomFilterMightContain` BEFORE the join."""
    reg = load_registry()
    try:
        df = reg["q87_runtime_bloom_join"].build(spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert (
            "bloom_filter" in plan.lower() or "mightcontain" in plan.lower()
        ), plan[:2000]
    finally:
        # q87 lowers injection thresholds and disables broadcast for its
        # own plan; restore so later raw-operator tests (which never go
        # through configure()) keep the session defaults
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "10GB",
        )


def test_session_window_single_shuffle(spark):
    """q85: batch sessionization is ONE exchange on the grouping key
    (session merge happens in-partition after the shuffle) — no
    self-join, no second aggregation exchange."""
    reg = load_registry()
    df = reg["q85_session_window"].build(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan[:3000]


def test_ohlc_is_aggregate_not_window(spark):
    """q88: open/close come from argmin/argmax AGGREGATION — the plan
    must contain no Window operator and only the one aggregation
    exchange (the window-based formulation would sort every row)."""
    reg = load_registry()
    df = reg["q88_ohlc_resample"].build(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan[:2000]
    assert plan.count("Exchange hashpartitioning") == 1, plan[:3000]


def test_dq7_profile_single_scan_expand(spark):
    """dq7 computes every per-column profile in ONE Expand-based pass —
    exactly one parquet scan of events, no per-column rescans."""
    reg = load_registry()
    df = reg["dq7_profile_drift"].build(spark, SF)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    plan = df._jdf.queryExecution().explainString(mode)
    assert "Expand" in plan
    assert plan.count("FileScan parquet") == 1


def test_q91_lateral_decorrelates_to_window(spark):
    """The LATERAL top-2-per-nation must decorrelate into a ranked
    window join, not N correlated executions or a cartesian product."""
    plan = plan_of(spark, "q91_lateral_topn")
    assert "Window" in plan
    assert "CartesianProduct" not in plan


def test_t14_postings_filter_before_aggregate(spark):
    """BM25's scale claim: term frequencies are computed only for
    QUERY terms — the broadcast postings join must land BELOW the
    (query_id, doc_id, term) aggregate, so shuffled state is
    O(matching postings), never the full inverted index."""
    plan = plan_of(spark, "t14_bm25_search")
    assert "BroadcastHashJoin" in plan
    # the join feeds the partial aggregate, not the other way around:
    # in the formatted plan the first HashAggregate listed above the
    # broadcast join consumes its output
    bj = plan.index("BroadcastHashJoin")
    agg = plan.index("HashAggregate")
    assert agg < bj  # formatted plans list consumers before producers


def test_q101_recursive_cte_runs_natively(spark):
    """Spark 4's WITH RECURSIVE must resolve to the native
    UnionLoop recursion operator (not fail analysis), bounded by the
    dist < 3 guard. Plan-level check only — value parity is the
    oracle gate."""
    plan = plan_of(spark, "q101_recursive_cte")
    assert "UnionLoop" in plan or "Recursion" in plan or "CTE" in plan


def test_q102_bare_limit_lateral_decorrelates(spark):
    """The window-free ORDER BY ... LIMIT lateral must decorrelate
    into a synthesized ranked window with map-side WindowGroupLimit
    pruning and a broadcast of the filtered customer side — never a
    nested-loop/cartesian per-row re-execution."""
    plan = plan_of(spark, "q102_lateral_topk")
    assert "WindowGroupLimit" in plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_join_strategy_hints_are_honored(spark):
    """The join-hint surface (SPARK-27225): the optimizer must honor
    MERGE / SHUFFLE_HASH / BROADCAST hints on the SAME equi-join —
    the manual override every production tuning guide reaches for
    when statistics mislead the planner (e.g. a 'small' side that
    explodes after a filter)."""
    from oxi_diel_db_spark import tables

    o = tables.load(spark, "orders", SF)
    c = tables.load(spark, "customer", SF)

    def plan(df):
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
        return df._jdf.queryExecution().explainString(mode)

    base = o.join(c.hint("broadcast"), o.o_custkey == c.c_custkey)
    assert "BroadcastHashJoin" in plan(base)
    merge = o.join(c.hint("merge"), o.o_custkey == c.c_custkey)
    assert "SortMergeJoin" in plan(merge)
    shash = o.join(c.hint("shuffle_hash"), o.o_custkey == c.c_custkey)
    assert "ShuffledHashJoin" in plan(shash)
    # hints must never change ANSWERS — same row count all three ways
    n = base.count()
    assert merge.count() == n and shash.count() == n


def test_t24_extraction_is_shuffle_free(spark):
    """t24's whole extraction (page build, block split, classification,
    content hash) is one narrow projection per document — ZERO
    exchanges beyond the adaptive scan fanout (tables.fanout — active
    only when the gate file under-parallelizes the scan, identity at
    real scale): nothing about a page depends on any other page, and a
    plan that shuffles the extraction itself would be wrong at any
    corpus scale. The fanout exchange is REPARTITION_BY_COL on doc_id;
    no ENSURE_REQUIREMENTS (operator-demanded) exchange may appear."""
    plan = plan_of(spark, "t24_html_extract")
    assert "ENSURE_REQUIREMENTS" not in plan
    assert plan.count("Arguments: hashpartitioning") <= 1  # the fanout only


def test_t25_single_shuffle_on_canonical_key(spark):
    """t25's dedup verdict needs exactly ONE operator-demanded hash
    exchange — the canonical URL key shared by both windows (count +
    min). A second ENSURE_REQUIREMENTS exchange would mean the windows
    failed to share partitioning. (The adaptive scan fanout adds one
    REPARTITION_BY_COL exchange at gate scale only — identity at real
    scale; counted separately.)"""
    plan = plan_of(spark, "t25_url_canonicalize")
    assert plan.count("ENSURE_REQUIREMENTS") == 1
    assert plan.count("Arguments: hashpartitioning") <= 2


def test_d21_store_join_reuses_gram_partitioning(spark):
    """d21's batch side shuffles ONCE on the gram key: the in-batch
    count window and the store join share hashpartitioning(h) (at
    gate scale AQE broadcasts the aggregated store, which also needs
    no batch-side re-exchange). doc_id-keyed exchanges belong to the
    islands/accounting tail, not the gram stage."""
    plan = plan_of(spark, "d21_incremental_substring_dedup")
    import re

    gram_ex = re.findall(r"Arguments: hashpartitioning\(h#\d+", plan)
    # one per side (batch window + store aggregate), never a third
    assert len(gram_ex) == 2, gram_ex


def test_p20_manifest_single_shard_key_exchange(spark):
    """Downstream of the partitioned read-back, p20 costs exactly ONE
    hash exchange — the (split, shard_id) manifest aggregate; the doc
    rows reach the manifest join via broadcast, never a reshuffle.
    shard_bins is the max-min+1 closed form precisely so no
    count-distinct Expand sneaks in a second exchange."""
    plan = plan_of(spark, "p20_shard_export")
    import re

    hashex = re.findall(r"Arguments: hashpartitioning\(([^)]*)\)", plan)
    assert len(hashex) == 1, hashex
    assert "split" in hashex[0] and "shard_id" in hashex[0]
    assert "BroadcastHashJoin" in plan
    # partition pruning is live on the exported tree
    assert "PartitionFilters" in plan


def test_d22_blocklist_is_broadcast_only(spark):
    """d22 costs ZERO hash exchanges: registrable-domain extraction is
    a narrow projection and both blocklist tiers are broadcast hash
    joins against O(blocklist) rows — equality on the registrable
    domain IS the *.domain suffix match, so no LIKE nested loop and
    no shuffle at any corpus scale."""
    plan = plan_of(spark, "d22_domain_blocklist")
    assert "Arguments: hashpartitioning" not in plan
    # formatted mode prints each node twice (tree + detail section)
    assert plan.count("BroadcastHashJoin") == 4
    assert "BroadcastNestedLoopJoin" not in plan


def test_c7_release_gate_plan_shape(spark):
    """c7 chains curation -> per-split shard walk -> leak audit with
    only key-equi machinery: no cartesian/nested-loop join anywhere
    (the pair audit joins by doc key, the shard walk exchanges only on
    bucket/bin/shard keys), and every documents scan is column-pruned
    to the three fields the chain needs (doc_id, text, lang) — at
    100 TB nothing drags source/n_chars through the curation."""
    plan = plan_of(spark, "c7_release_gate")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    import re

    for rs in re.findall(r"ReadSchema: struct<([^>]*)>", plan):
        cols = {c.split(":")[0] for c in rs.split(",") if c}
        assert cols <= {"doc_id", "text", "lang"}, cols


def test_r13_single_walk_barriers(spark):
    """r13 opt: queries whose shared subtree used to be re-evaluated
    per reference (Spark does not share common subplans) now walk it
    once behind a lazy localCheckpoint barrier. The visible plan keeps
    at most the irreducible scans: d15's 16 scans (norms + both
    self-join sides re-tokenized) and q105's 6 (bounds/types/spine)
    collapse behind the barrier; t17 keeps exactly its 2 corpus
    tokenization passes (model build + scoring), t14 its 2 (dl + tf),
    t15/p14 at most 2. A regression that re-inlines a subtree
    reappears here as a scan-count jump."""
    for name, max_scans in (
        ("d15_tfidf_cosine_pairs", 2),
        ("q105_gapfill_interpolate", 2),
        ("t17_perplexity_filter", 2),
        ("t14_bm25_search", 4),
        ("t15_keyword_extraction", 2),
        ("p14_length_matching", 2),
    ):
        plan = plan_of(spark, name)
        assert plan.count("Scan parquet") <= max_scans, (
            name, plan.count("Scan parquet"))
