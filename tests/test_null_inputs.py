"""Null-value robustness: the clean synthetic testdata has no NULLs,
production data does. Induce NULLs in nullable payload columns (text,
value, props, discounts, balances) and sweep representative operators:
they must complete — dropping, null-propagating, or zero-scoring the
affected rows per their documented semantics — never throw."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from oxi_diel_db_spark.queries import load_registry

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

REPRESENTATIVE = [
    "q01_pricing_summary",
    "q13_null_handling",
    "q85_session_window",
    "q88_ohlc_resample",
    "d1_exact_dedup",
    "d3_minhash_lsh",
    "d4_simhash",
    "t1_lang_id",
    "t2_quality_score",
    "t3_token_count",
    "p5_greedy_packing",
    "p11_temperature_sampling",
    "dq1_constraint_audit",
    "dq2_distribution_drift",
    "dq6_reconciliation",
    "mm1_binary_meta",
    # round-6 additions (t14's avgdl under NULL text was a REAL latent
    # cross-engine divergence: legacy size(NULL) = -1 entered Spark's
    # average while DuckDB's AVG skipped the NULL — fixed, both
    # engines now count NULL text as a length-0 doc)
    "t12_gopher_rules",
    "t13_vocab_stats",
    "t14_bm25_search",
    "p13_curriculum_interleave",
    "p14_length_matching",
    "dq7_profile_drift",
    "dq8_snapshot_diff",
    "c3_hybrid_search",
    "t18_bpe_merges",
    "dq10_ks_drift",
    "dq11_row_quarantine",
    "p16_multimodal_packing",
    "dq12_winsorize",
]


@pytest.fixture(scope="module")
def nulled_sf_dir(spark, tmp_path_factory):
    """Copies of the tables with ~8-14% NULLs in nullable payload
    columns (keys stay intact — null keys are a schema violation the
    dq audit exists to catch, not an input operators must accept)."""
    out = str(tmp_path_factory.mktemp("nulled_sf"))
    nullers = {
        "documents": [("text", F.col("doc_id") % 10 == 0)],
        "events": [
            ("value", F.col("event_id") % 13 == 0),
            ("props", F.col("event_id") % 17 == 0),
        ],
        "lineitem": [("l_discount", F.col("l_orderkey") % 11 == 0)],
        "customer": [("c_acctbal", F.col("c_custkey") % 7 == 0)],
    }
    for name in TABLES:
        df = spark.read.parquet(f"/root/testdata/sf0.001/{name}.parquet")
        for col, cond in nullers.get(name, []):
            df = df.withColumn(
                col, F.when(cond, F.lit(None)).otherwise(F.col(col))
            )
        df.write.mode("overwrite").parquet(os.path.join(out, f"{name}.parquet"))
    return out


@pytest.mark.parametrize("name", REPRESENTATIVE)
def test_operator_survives_nulls(spark, nulled_sf_dir, name):
    reg = load_registry()
    rows = reg[name].build(spark, nulled_sf_dir).collect()
    assert rows is not None  # completed; shape checks below where cheap
    if name == "t3_token_count":
        # null text rows must still be present, counted as 0 — NOT the
        # -1 that legacy size(NULL) leaks under ansi-off
        assert len(rows) == 500
        nulled = [r for r in rows if r["n_chars"] is None]
        assert nulled and all(
            r["ws_tokens"] == 0 and r["bpe_tokens"] == 0 for r in nulled
        )
    if name == "dq1_constraint_audit":
        assert len(rows) == 6
