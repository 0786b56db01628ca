"""Empty-input robustness: a 100 TB pipeline routinely sees empty
tables (fresh ingest day, fully-filtered partition, new tenant). Every
representative operator family must degrade to an empty / summary
result — never throw — when every input table has zero rows."""

from __future__ import annotations

import os

import pytest

from oxi_diel_db_spark.queries import load_registry

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

# one per execution family; ml/streaming excluded (model artifacts and
# file-replay sources have their own empty-behavior tests)
REPRESENTATIVE = [
    "q01_pricing_summary",   # hash agg
    "q06_topk",              # TakeOrdered
    "q30_multiway_join",     # SMJ/broadcast chain
    "q40_ranking",           # window
    "q85_session_window",    # session merge
    "q88_ohlc_resample",     # argmin agg
    "d1_exact_dedup",        # dedup groupBy
    "d3_minhash_lsh",        # banded LSH self-join
    "d8_dedup_clusters",     # iterative CC loop on empty edges
    "s1_ann_brute_force",    # broadcast topk (empty corpus AND probes)
    "p1_hash_sample",        # filter
    "p5_greedy_packing",     # sharded applyInPandas
    "p11_temperature_sampling",  # data-derived rates on no data
    "t1_lang_id",            # text expressions
    "t11_ngram_udtf",        # UDTF lateral join
    "dq1_constraint_audit",  # audit rows over empty tables
    "dq2_distribution_drift",  # PSI with null bounds
    "dq6_reconciliation",    # reconciliation with no orders
    "mm8_image_neardup",     # mapInPandas over zero rows
    # round-6 additions
    "g4_bfs_distances",      # BFS on an empty edge list
    "t12_gopher_rules",      # composite rule verdicts over no docs
    "dq7_profile_drift",     # Expand profile with no periods
    "dq8_snapshot_diff",     # full-outer diff of two empty snapshots
    "p13_curriculum_interleave",  # interleave with zero sources
    "mm9_audio_neardup",     # audio fingerprint over zero rows
    "q91_lateral_topn",      # LATERAL over empty dims
    "q92_collations",        # collated distinct over no rows
    "t13_vocab_stats",       # vocab profile of an empty corpus
    "t14_bm25_search",       # BM25 with zero postings
    "p14_length_matching",   # rate derivation over zero docs
    "c3_hybrid_search",      # RRF fusion of two empty rank lists
    "q95_malformed_json",    # corrupt-record accounting over no rows
    "q96_observed_metrics",  # observe() metrics on an empty scan
    # round-7 additions
    "q99_observation_join",  # pit_enrich with zero observations+features
    "t15_keyword_extraction",  # tf-idf over an empty corpus
    "dq9_schema_contract",   # contract verdicts on a zero-row drop
    "q101_recursive_cte",    # native recursion with an empty seed set
    "q102_lateral_topk",     # bare-LIMIT lateral over empty outer+inner
    "q103_sql_functions",    # SQL UDF + table function over no orders
    "q104_parameterized_sql",  # bound params against an empty table
    "dq10_ks_drift",         # KS over two empty samples
    "ml14_pca_covariance",   # outer-product partials over zero rows
    "ml15_pca_explained",    # eigh path on an absent covariance
    "t18_bpe_merges",        # merge loop exits on an empty pair table
    "dq11_row_quarantine",   # siphon over zero rows
    "q105_gapfill_interpolate",  # spine over an absent time range
    "p16_multimodal_packing",    # two-budget packer over zero docs
    "q106_pipe_syntax",          # pipe chain over no lineitems
    "q107_session_variables",    # NULL-threshold variable over no orders
    "q108_udtf_table_args",      # partition UDTF over zero partitions
    "q109_sql_scripting",        # WHILE loop exits on the iteration bound
    "p17_preference_pairs",      # pair builder over zero groups
    "q110_ordered_string_agg",   # ordered listagg over no rows
    "dq12_winsorize",            # percentile clip over zero rows
    "ml16_isotonic_calibration", # isotonic fit over zero docs
    "mm11_spectrogram",          # STFT over zero wavs
    "s8_mmr_rerank",             # greedy over zero candidates
    # round-7 continuation additions
    "q111_map_in_arrow",         # Arrow batch map over zero batches
    "q112_apply_in_arrow",       # grouped Arrow kernel over zero groups
    "q113_transpose",            # transpose with an empty index column
    "q114_approx_top_k",         # heavy-hitters sketch of nothing
    "st16_python_stream_source", # Python stream source drains immediately
    "g5_connected_components",   # star contraction on an empty edge list
    "q115_count_min_sketch",     # CMS of an empty stream (no sketch rows)
    "q116_bitmap_distinct",      # bitmap rollup over zero events
    "dq13_benford_audit",        # digit spine over zero amounts
    "t19_vocab_growth",          # growth curve of an empty corpus
    "ml18_frequent_itemsets",    # FPGrowth over zero baskets
    "mm12_phash_neardup",        # banded Hamming join over zero images
    "t20_readability",           # readability over an empty corpus
    "dq14_functional_dependency", # vacuous FD verdicts with real zeros
    "ml19_poisson_glm",          # GLM guard over zero users
    "s9_gemm_knn",               # GEMM top-k over zero probes+corpus
    "mm13_shot_boundaries",      # frame-delta detector over zero streams
    "ml20_chi_square",           # chi-square guard over zero events
    "q117_lateral_column_alias", # alias chain over zero lineitems
    "st18_stream_full_outer_join",  # both null tiers over zero events
    "c4_multimodal_ledger",      # three-modality ledger over zero docs
    "q118_explode_outer",        # outer explode over zero docs
    "dq15_cusum_shift",          # CUSUM over an empty day spine
    "q119_dynamic_session",      # dynamic-gap sessions over zero events
    "p18_epoch_shard_order",     # epoch ordering over zero docs
    "g6_kcore",                  # peeling loop over an empty edge list
    "q120_regexp_family",        # regexp expressions over zero docs
    "ml21_als_recommender",      # ALS guard over zero ratings
    "q121_array_set_ops",        # set algebra over zero events
    "p19_embargo_split",         # embargo bands over zero events
    "mm14_voice_activity",       # VAD over zero wavs
    "q122_locf_impute",          # LOCF over an absent date range
    "t21_script_profile",        # script buckets over zero docs
    "c5_corpus_health",          # health metrics over an empty corpus
    "t22_compression_ratio",     # deflate ratio over zero docs
    "q123_timestamp_units",      # unit arithmetic over zero funnels
    "dq16_ewma_control",         # EWMA over an empty day spine
    # round-12 additions (incl. the r10/r11 births the list had missed)
    "d20_substring_dedup",       # gram windows over zero docs
    "d21_incremental_substring_dedup",  # store join over zero batches
    "t23_bpe_apply",             # learned merges applied to no corpus
    "t24_html_extract",          # block classifier over zero pages
    "t25_url_canonicalize",      # canonical-key dedup over zero urls
    "mm15_cdc_chunk_dedup",      # CDC chunking over zero payloads
    "c6_crawl_curation",         # four-stage funnel over zero docs
    "p20_shard_export",          # partitioned write+read-back of zero shards
    "p21_incremental_shard_export",  # ledger loop over zero flushes
    "d22_domain_blocklist",      # broadcast blocklist joins over zero docs
    "dq19_split_leakage_audit",  # leak audit over zero pairs + zero splits
]


@pytest.fixture(scope="module")
def empty_sf_dir(spark, tmp_path_factory):
    """Schema-identical, zero-row copy of every test table."""
    out = str(tmp_path_factory.mktemp("empty_sf"))
    for name in TABLES:
        df = spark.read.parquet(f"/root/testdata/sf0.001/{name}.parquet")
        df.limit(0).write.mode("overwrite").parquet(
            os.path.join(out, f"{name}.parquet")
        )
    return out


@pytest.mark.parametrize("name", REPRESENTATIVE)
def test_operator_survives_empty_input(spark, empty_sf_dir, name):
    reg = load_registry()
    rows = reg[name].build(spark, empty_sf_dir).collect()
    if name == "dq1_constraint_audit":
        # the audit still emits one summary row per constraint, with
        # REAL zeros (not the NULLs a bare SUM over empty would give)
        assert len(rows) == 6
        assert all(r["n_violations"] == 0 and r["violation_rate"] == 0.0 for r in rows)
    elif name == "dq2_distribution_drift":
        # the bin spine survives: 10 bins, uniform smoothed prior on
        # both sides → zero drift, never NaN
        assert len(rows) == 10
        assert all(r["psi_term"] == 0.0 for r in rows)
    elif name == "dq6_reconciliation":
        assert rows == []  # no orders → no bands
    elif name == "q96_observed_metrics":
        # observability contract: the metrics row EXISTS with real
        # zeros even when the pipeline saw nothing
        assert len(rows) == 1
        assert tuple(rows[0]) == (0, 0, 0, 0)
    elif name == "dq9_schema_contract":
        # an empty drop still has a schema: all 14 verdicts emitted,
        # structural rules pass, data rules pass with real zeros
        assert len(rows) == 14
        assert all(
            r["status"] == "pass" and r["n_violations"] == 0 for r in rows
        )
    elif name == "q109_sql_scripting":
        # the iteration bound, not the data, terminates the loop: one
        # summary row with the fully-halved threshold and zero matches
        assert len(rows) == 1
        assert rows[0]["n_above"] == 0 and rows[0]["threshold"] == 512.0 / 2**12
    elif name == "q113_transpose":
        # the metric spine survives as rows (transpose keys are the
        # former COLUMNS); the value columns are data-dependent by
        # transpose's contract, so an empty index yields none of them
        assert [r["key"] for r in rows] == ["sum_price", "sum_qty", "n"]
    elif name == "dq14_functional_dependency":
        # every candidate FD holds vacuously over empty tables, with
        # real zeros in every count
        assert len(rows) == 3
        assert all(
            r["holds"] == 1 and r["n_lhs_groups"] == 0
            and r["n_violating_groups"] == 0 and r["max_distinct_rhs"] == 0
            for r in rows
        )
    elif name == "c5_corpus_health":
        # the dashboard keeps its metric spine: volume is a REAL zero;
        # rates over zero docs have no value (NULL, never a fake 0%)
        got = {r["metric"]: r["value"] for r in rows}
        assert got["docs_total"] == 0.0
        assert len(got) == 6
    elif name == "q116_bitmap_distinct":
        # the merged '__ALL__' row must report a REAL zero (the twin's
        # global COUNT(DISTINCT) over empty is 0, not NULL)
        assert len(rows) == 1
        assert tuple(rows[0]) == ("__ALL__", 0)
    elif name == "dq13_benford_audit":
        # the 1-9 digit spine survives with n = 0; fractions are NULL
        # (0/0 has no value — matching the twin's NULL total)
        assert [r["digit"] for r in rows] == list(range(1, 10))
        assert all(r["n"] == 0 and r["obs_frac"] is None for r in rows)
    elif name == "t19_vocab_growth":
        # every checkpoint survives with zero tokens and zero vocab
        assert len(rows) == 6
        assert all(r["n_tokens"] == 0 and r["vocab"] == 0 for r in rows)
    else:
        assert rows == []
