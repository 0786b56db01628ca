#!/usr/bin/env python
"""Interleaved same-session A/B adjudication for the r13 touched-path
regressions the r13 verdict flagged (VERDICT Next #1): g1, q105, q108,
s3, d13.

Methodology (the only one the r13 ABAB adjudication proved honest on
this box): ONE Spark session, q01 warmup, then for each query the two
variants run ALTERNATELY (A,B,A,B,A,B), min-of-3 per variant, so both
variants sit inside the same host-drift window. /proc/stat steal is
sampled around the whole block and printed.

Variant B ("before") reconstructs the r13-before behavior in-session:
  * g1:   pagerank(broadcast_max_nodes=0)  — disables the r13 broadcast
          hint (the only r13 g1 change; plans/r13/g1_pagerank_before).
  * q105: monkeypatch DataFrame.localCheckpoint(eager=False) to identity
          while building — removes the r13 lazy barrier (the only
          localCheckpoint in q105's build).
  * q108: run the r13-before SQL text (TABLE(events_q108) unpruned)
          against the same registered UDTF + view.
  * s3/d13: monkeypatch tables.fanout (as imported by similarity/dedup/
          llm_ops) to identity — removes the r13 fanout, the only r13
          change on those paths.

Usage: python scripts/ab_probe_r14.py [query ...]   (default: all five)
"""

from __future__ import annotations

import os
import sys
import time
from contextlib import contextmanager

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))


def _steal():
    with open("/proc/stat") as fh:
        vals = [int(x) for x in fh.readline().split()[1:]]
    return vals[7], sum(vals[:8])


@contextmanager
def no_fanout():
    import oxi_diel_db_spark.tables as tables
    import oxi_diel_db_spark.operators.similarity as sim
    import oxi_diel_db_spark.operators.dedup as ded
    import oxi_diel_db_spark.queries.llm_ops as llm

    ident = lambda df, *keys: df  # noqa: E731
    saved = (tables.fanout, sim.fanout, ded.fanout, llm.fanout)
    tables.fanout = sim.fanout = ded.fanout = llm.fanout = ident
    try:
        yield
    finally:
        tables.fanout, sim.fanout, ded.fanout, llm.fanout = saved


@contextmanager
def no_local_checkpoint():
    from pyspark.sql import DataFrame

    saved = DataFrame.localCheckpoint
    DataFrame.localCheckpoint = lambda self, eager=True: self
    try:
        yield
    finally:
        DataFrame.localCheckpoint = saved


def main() -> None:
    only = set(sys.argv[1:])
    from oxi_diel_db_spark.queries import load_registry
    from oxi_diel_db_spark.session import get_spark

    spark = get_spark("ab_probe_r14")
    reg = load_registry()
    reg["q01_pricing_summary"].build(spark, SF_DIR).collect()  # warmup

    def run_g1_after():
        return reg["g1_pagerank"].build(spark, SF_DIR).collect()

    def run_g1_before():
        # identical to the registered query body (nation→nation trade
        # graph) but with the r13 broadcast hint disabled (threshold 0)
        from pyspark.sql import functions as F
        from oxi_diel_db_spark.operators.graph import pagerank
        from oxi_diel_db_spark.tables import load as tload

        l = tload(spark, "lineitem", SF_DIR)
        o = tload(spark, "orders", SF_DIR)
        c = tload(spark, "customer", SF_DIR)
        s = tload(spark, "supplier", SF_DIR)
        n = tload(spark, "nation", SF_DIR)
        cn = n.select(
            F.col("n_nationkey").alias("ck"), F.col("n_name").alias("src")
        )
        sn = n.select(
            F.col("n_nationkey").alias("sk"), F.col("n_name").alias("dst")
        )
        edges = (
            l.join(o, l.l_orderkey == o.o_orderkey)
            .join(c, o.o_custkey == c.c_custkey)
            .join(s, l.l_suppkey == s.s_suppkey)
            .join(F.broadcast(cn), c.c_nationkey == F.col("ck"))
            .join(F.broadcast(sn), s.s_nationkey == F.col("sk"))
            .groupBy("src", "dst")
            .agg(F.count(F.lit(1)).alias("weight"))
        )
        return pagerank(
            edges, damping=0.85, iters=10, weight_col="weight",
            broadcast_max_nodes=0,
        ).collect()

    def run_q105_after():
        return reg["q105_gapfill_interpolate"].build(spark, SF_DIR).collect()

    def run_q105_before():
        with no_local_checkpoint():
            df = reg["q105_gapfill_interpolate"].build(spark, SF_DIR)
        return df.collect()

    def run_q108_after():
        return reg["q108_udtf_table_args"].build(spark, SF_DIR).collect()

    def run_q108_before():
        # r13-before text (git show e62c86c^): unpruned TABLE arg
        from oxi_diel_db_spark.functions.udtfs import register_udtfs
        from oxi_diel_db_spark.tables import load as tload

        register_udtfs(spark)
        tload(spark, "events", SF_DIR).createOrReplaceTempView("events_q108")
        return spark.sql(
            """
            SELECT event_type, n, CAST(total AS DOUBLE) AS total
            FROM partition_summarize(
              TABLE(events_q108) PARTITION BY event_type)
            """
        ).collect()

    def run_s3_after():
        return reg["s3_ann_ivf"].build(spark, SF_DIR).collect()

    def run_s3_before():
        with no_fanout():
            df = reg["s3_ann_ivf"].build(spark, SF_DIR)
        return df.collect()

    def run_d13_after():
        return reg["d13_neardup_curation"].build(spark, SF_DIR).collect()

    def run_d13_before():
        with no_fanout():
            df = reg["d13_neardup_curation"].build(spark, SF_DIR)
        return df.collect()

    cases = {
        "g1_pagerank": (run_g1_after, run_g1_before),
        "q105_gapfill_interpolate": (run_q105_after, run_q105_before),
        "q108_udtf_table_args": (run_q108_after, run_q108_before),
        "s3_ann_ivf": (run_s3_after, run_s3_before),
        "d13_neardup_curation": (run_d13_after, run_d13_before),
    }
    if only:
        cases = {k: v for k, v in cases.items() if k in only}

    s0, t0 = _steal()
    for name, (after, before) in cases.items():
        # value-identity check once per variant pair (rounded values
        # must agree — the A/B is only valid if both compute the query)
        ra = after()
        rb = before()
        same = sorted(map(tuple, ra)) == sorted(map(tuple, rb))
        best_a = best_b = float("inf")
        laps_a, laps_b = [], []
        for _ in range(REPS):
            spark.sparkContext.setJobDescription(f"{name}: after")
            t = time.time()
            after()
            laps_a.append(time.time() - t)
            spark.sparkContext.setJobDescription(f"{name}: before")
            t = time.time()
            before()
            laps_b.append(time.time() - t)
        spark.sparkContext.setJobDescription(None)
        best_a, best_b = min(laps_a), min(laps_b)
        print(
            f"{name}: after={best_a:.3f}s before={best_b:.3f}s "
            f"ratio(before/after)={best_b / best_a:.2f} values_equal={same} "
            f"laps_after={[round(x, 2) for x in laps_a]} "
            f"laps_before={[round(x, 2) for x in laps_b]}",
            flush=True,
        )
    s1, t1 = _steal()
    if t1 > t0:
        print(f"steal_pct over block: {100.0 * (s1 - s0) / (t1 - t0):.2f}")


if __name__ == "__main__":
    main()
