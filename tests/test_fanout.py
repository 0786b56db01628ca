"""tables.fanout — the r13 optimization round's scan-parallelism floor.

Contract under test (see tables.py docstring):
* ACTIVE case: a small parquet scan (one row group → one task) feeding
  compute-dense work is hash-repartitioned on the given keys to
  defaultParallelism — values unchanged, partition count raised;
* IDENTITY cases: enough input splits already (estimated from file
  sizes the way Spark sizes scan splits), or a non-file-backed plan
  (inputFiles() empty/unavailable) → the DataFrame is returned AS-IS
  (same object), so fanout can never add a shuffle at real scale;
* the added exchange is REPARTITION_BY_COL (deterministic hash keys,
  retry-safe), never round-robin.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from oxi_diel_db_spark import tables
from tests.conftest import SF_DIR


def test_fanout_active_on_single_split_scan(spark):
    docs = tables.load(spark, "documents", SF_DIR)
    n = spark.sparkContext.defaultParallelism
    out = tables.fanout(docs, "doc_id")
    # sf0.001 documents is a single small file -> must spread
    assert out is not docs
    assert out.rdd.getNumPartitions() == n
    # deterministic hash partitioning, not round-robin
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "REPARTITION_BY_COL" in plan or "hashpartitioning" in plan
    assert "roundrobin" not in plan.lower()


def test_fanout_values_unchanged(spark):
    docs = tables.load(spark, "documents", SF_DIR).select("doc_id", "text")
    a = sorted(r.doc_id for r in docs.collect())
    b = sorted(r.doc_id for r in tables.fanout(docs, "doc_id").collect())
    assert a == b


def test_fanout_identity_on_non_file_plan(spark):
    df = spark.range(10).select(F.col("id").alias("doc_id"))
    # range() has no input files -> identity (same object back)
    assert tables.fanout(df, "doc_id") is df


def test_fanout_identity_when_splits_cover_cores(spark, tmp_path):
    # Write >= defaultParallelism files so the split estimate covers
    # the cores — the helper must NOT add an exchange at "real scale".
    n = spark.sparkContext.defaultParallelism
    p = os.path.join(str(tmp_path), "many")
    spark.range(n * 4).repartition(n).write.parquet(p)
    df = spark.read.parquet(p)
    assert len(df.inputFiles()) >= n
    assert tables.fanout(df, "id") is df


def test_small_scan_predicate_and_memo(spark, tmp_path):
    # r14: small_scan is fanout's decision predicate, exposed for other
    # scale-adaptive choices (q108's TABLE-arg pruning), with a
    # session-lifetime (path -> size) memo so back-to-back registry
    # builds stop re-statting the same immutable files.
    docs = tables.load(spark, "documents", SF_DIR)
    assert tables.small_scan(docs) is True
    # memo now holds the gate file(s) and the cached decision agrees
    for f in docs.inputFiles():
        path = f[len("file://"):] if f.startswith("file://") else f[len("file:"):]
        assert tables._FILE_SIZES.get(path) == os.path.getsize(path)
    assert tables.small_scan(docs) is True  # memoized path, same answer
    # non-file-backed plan: never "small" (unknown must read as big)
    assert tables.small_scan(spark.range(5)) is False
    # enough splits to cover the cores: not small
    n = spark.sparkContext.defaultParallelism
    p = os.path.join(str(tmp_path), "many2")
    spark.range(n * 4).repartition(n).write.parquet(p)
    assert tables.small_scan(spark.read.parquet(p)) is False
    # fanout decisions are unchanged by the memo: identity at scale,
    # active on the small scan (same asserts as the r13 tests above)
    big = spark.read.parquet(p)
    assert tables.fanout(big, "id") is big
    assert tables.fanout(docs, "doc_id") is not docs
