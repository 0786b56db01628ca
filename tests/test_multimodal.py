"""Multimodal plumbing: binary columns, Arrow-batched decode UDF."""

from __future__ import annotations

import hashlib

import pytest

from oxi_diel_db_spark.operators import multimodal as MM


def test_to_binary_table_schema(spark):
    docs = spark.createDataFrame([(1, "hello")], "doc_id long, text string")
    media = MM.to_binary_table(docs)
    assert [f.name for f in media.schema.fields] == [
        "doc_id", "payload", "media_type", "n_bytes", "content_md5",
    ]
    row = media.collect()[0]
    assert bytes(row["payload"]) == b"hello"
    assert row["n_bytes"] == 5
    assert row["content_md5"] == hashlib.md5(b"hello").hexdigest()


def test_extract_features_deterministic(spark):
    docs = spark.createDataFrame(
        [(i, f"payload number {i}") for i in range(50)], "doc_id long, text string"
    )
    media = MM.to_binary_table(docs).repartition(4)
    a = sorted(map(tuple, MM.extract_features(media).collect()))
    b = sorted(map(tuple, MM.extract_features(media).collect()))
    assert a == b
    assert len(a) == 50
    row = dict(zip([f.name for f in MM.extract_features(media).schema.fields], a[0]))
    assert 64 <= row["width"] <= 255 and 1 <= row["channels"] <= 4


def test_fake_decode_matches_direct_call(spark):
    docs = spark.createDataFrame([(7, "abc")], "doc_id long, text string")
    got = MM.extract_features(MM.to_binary_table(docs)).collect()[0]
    exp = MM.fake_decode(b"abc")
    assert got["width"] == exp["width"] and got["mean_luma"] == exp["mean_luma"]


def test_resize_stub_raises(spark):
    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    media = MM.to_binary_table(docs)
    with pytest.raises(Exception, match="NotImplementedError|image codec"):
        MM.resize_stub(media, 32, 32).collect()


def test_frame_sampling_fanout(spark):
    from oxi_diel_db_spark.operators import multimodal as MM

    docs = spark.createDataFrame(
        [(1, "x" * 10), (2, "y" * 3500)], "doc_id long, text string"
    )
    frames = MM.sample_frames(MM.to_binary_table(docs), every_ms=1000).collect()
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # duration = 1000 + n_bytes % 5000 → doc1: 1010ms → 2 frames; doc2: 4500ms → 5
    assert len(by_doc[1]) == 2
    assert len(by_doc[2]) == 5
    f0 = sorted(by_doc[2], key=lambda r: r["frame_idx"])
    assert [r["frame_ts_ms"] for r in f0] == [0, 1000, 2000, 3000, 4000]
    assert len({r["frame_md5"] for r in frames}) == 7  # all distinct
