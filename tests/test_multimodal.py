"""Multimodal plumbing: binary columns, Arrow-batched decode UDF."""

from __future__ import annotations

import hashlib

import pytest

from pyspark.sql import functions as F

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


def test_audio_chunking_reconstructs_payload(spark):
    import hashlib

    docs = spark.createDataFrame(
        [(1, "a" * 700), (2, "b" * 320), (3, "c" * 321), (4, "short")],
        "doc_id long, text string",
    )
    chunks = MM.chunk_audio(MM.to_audio_table(docs), chunk_ms=20).collect()
    by_doc = {}
    for r in chunks:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, text in [(1, "a" * 700), (2, "b" * 320), (3, "c" * 321), (4, "short")]:
        rows = sorted(by_doc[doc_id], key=lambda r: r["chunk_idx"])
        n = len(text)
        sr = 8000 + (n % 3) * 4000
        bpc = sr * 2 * 20 // 1000
        # fan-out cardinality, contiguous offsets, full coverage
        assert len(rows) == -(-n // bpc)
        assert [r["byte_offset"] for r in rows] == [i * bpc for i in range(len(rows))]
        assert sum(r["byte_len"] for r in rows) == n
        # concatenated chunk bytes reconstruct the payload exactly
        assert b"".join(bytes(r["chunk"]) for r in rows) == text.encode()
        # md5 is over the real binary slice
        assert rows[0]["chunk_md5"] == hashlib.md5(text[:bpc].encode()).hexdigest()


def test_audio_chunk_oracle_ascii_invariant(spark, sf_dir):
    # the mm4 oracle equates byte and char offsets — only valid while
    # the corpus is pure ASCII; fail loudly if testdata ever changes
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    non_ascii = d.filter(
        F.octet_length(F.col("text")) != F.length(F.col("text"))
    ).count()
    assert non_ascii == 0
