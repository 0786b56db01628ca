"""Multimodal column plumbing (north star).

Images/audio/video are opaque ``binary`` columns + a typed metadata
struct. The engine treats payload bytes as pass-through data and runs
decode / feature-extract / resize / frame-sample as Arrow-batched
``mapInPandas`` stages, so a 100 TB media table processes partition-
parallel with no driver involvement.

The decode step is STUBBED (this container has no image/audio codecs):
``fake_decode`` derives deterministic pseudo-features from the payload
bytes. The Spark-side plumbing — schema, UDF signature, batch shape,
partitioning — is real and tested (tests/test_multimodal.py). Swap
``fake_decode`` for a PIL/libav call in a codec-enabled image.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Metadata struct carried beside every payload.
MEDIA_META_SCHEMA = (
    "doc_id bigint, media_type string, n_bytes int, content_md5 string"
)

FEATURE_SCHEMA = (
    "doc_id bigint, media_type string, n_bytes int, "
    "width int, height int, channels int, mean_luma double"
)


def to_binary_table(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Model a media table: (id, payload binary, media_type, metadata).
    Here payload = utf-8 bytes of text (the container has no real media);
    schema/partitioning identical to an image table."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return docs.select(
        F.col(id_col),
        payload.alias("payload"),
        F.lit("image/fake").alias("media_type"),
        F.octet_length(payload).alias("n_bytes"),
        F.md5(F.col(text_col)).alias("content_md5"),
    )


def fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in for an image decoder.

    Real implementation would be e.g.::

        img = PIL.Image.open(io.BytesIO(payload))   # NotImplementedError here
        return {"width": img.width, ...}

    The fake derives stable pseudo-dimensions from a digest so tests can
    assert exact values.
    """
    digest = hashlib.md5(payload or b"").digest()
    return {
        "width": 64 + digest[0] % 192,  # 64..255
        "height": 64 + digest[1] % 192,
        "channels": 1 + digest[2] % 4,
        "mean_luma": digest[3] / 255.0,
    }


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched decode + feature extraction over the payload column.

    mapInPandas (not a scalar UDF) because a real decoder returns
    multiple columns and may need per-batch library state (decoder
    objects are hoisted out of the per-row loop — the reference
    re-instantiates its featurizer per site, ml_prediction.py:205,248;
    this is the fixed version of that pattern).
    """

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # per-partition setup would open the codec ONCE here
        for pdf in batches:
            feats = pdf["payload"].map(fake_decode)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["n_bytes"],
                    "width": feats.map(lambda f: f["width"]).astype("int32"),
                    "height": feats.map(lambda f: f["height"]).astype("int32"),
                    "channels": feats.map(lambda f: f["channels"]).astype("int32"),
                    "mean_luma": feats.map(lambda f: f["mean_luma"]),
                }
            )

    return media.mapInPandas(_decode, schema=FEATURE_SCHEMA)


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing: passes payloads through the same mapInPandas
    shape; the actual pixel op raises NotImplementedError (no codecs)."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            raise NotImplementedError(
                "resize requires an image codec (PIL/opencv) not present in "
                "this container; plumbing is exercised via extract_features"
            )
            yield pdf  # pragma: no cover

    return media.mapInPandas(_resize, schema=media.schema)


def to_audio_table(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Model an audio table: (id, payload binary, sample_rate, metadata).
    Payload = utf-8 bytes of text standing in for PCM16 mono samples
    (no codecs in this container); sample_rate is derived
    deterministically from the byte length so every engine agrees."""
    payload = F.encode(F.col(text_col), "UTF-8")
    n = F.octet_length(payload)
    return docs.select(
        F.col(id_col),
        payload.alias("payload"),
        F.lit("audio/pcm16").alias("media_type"),
        n.alias("n_bytes"),
        (F.lit(8000) + (n % 3) * F.lit(4000)).cast("int").alias("sample_rate"),
        F.md5(F.col(text_col)).alias("content_md5"),
    )


def chunk_audio(audio: DataFrame, chunk_ms: int = 20) -> DataFrame:
    """Split each audio payload into fixed-duration chunks: one row per
    ``chunk_ms`` of PCM16 mono at the row's sample_rate
    (bytes_per_chunk = sample_rate · 2 · chunk_ms / 1000; the last
    chunk may be short). The ASR/diarization pre-segmentation shape.

    Entirely built-in expressions — ``sequence``+``explode`` derives the
    chunk list from metadata and ``substring`` slices the binary payload
    JVM-side, so a 100 TB audio table chunks inside whole-stage codegen
    with no Python crossing and no UDF. A real pipeline would follow
    with a decode/resample ``mapInPandas`` stage (same stub policy as
    :func:`extract_features`).
    """
    bpc = F.floor(F.col("sample_rate").cast("long") * 2 * chunk_ms / 1000)
    n_chunks = F.ceil(F.col("n_bytes").cast("double") / bpc)
    idx = F.explode(
        F.when(
            n_chunks > 0, F.sequence(F.lit(0).cast("long"), (n_chunks - 1).cast("long"))
        ).otherwise(F.lit([]).cast("array<long>"))
    )
    c = audio.withColumn("__bpc", bpc).withColumn("chunk_idx", idx)
    byte_offset = F.col("chunk_idx") * F.col("__bpc")
    byte_len = F.least(F.col("__bpc"), F.col("n_bytes") - byte_offset)
    return c.select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        byte_offset.cast("long").alias("byte_offset"),
        byte_len.cast("long").alias("byte_len"),
        "sample_rate",
        F.substring(
            F.col("payload"), (byte_offset + 1).cast("int"), byte_len.cast("int")
        ).alias("chunk"),
        F.md5(
            F.substring(
                F.col("payload"), (byte_offset + 1).cast("int"), byte_len.cast("int")
            )
        ).alias("chunk_md5"),
    )


FRAME_SCHEMA = (
    "doc_id bigint, frame_idx int, frame_ts_ms int, frame_md5 string"
)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame sampling for video-as-binary: ONE media row fans out to
    its sampled frames (the one-to-many multimodal shape; decode is the
    same stub policy as extract_features). A real implementation seeks
    the container every ``every_ms`` and decodes keyframes; the fake
    derives a deterministic duration from the payload digest and emits
    one row per sampled timestamp with a stable per-frame digest, so
    the fan-out cardinality and values are exactly testable — and SQL-
    expressible, which gives this mapInPandas stage a full oracle.

    Fake semantics (mirrored in m m3's oracle SQL):
      duration_ms = 1000 + (n_bytes % 5000)
      frames at t = 0, every_ms, 2·every_ms, ... < duration_ms
      frame_md5   = md5(content_md5 || ':' || frame_idx)
    """

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "frame_ts_ms": [], "frame_md5": []}
            for doc_id, n_bytes, cmd5 in zip(
                pdf["doc_id"], pdf["n_bytes"], pdf["content_md5"]
            ):
                duration_ms = 1000 + (int(n_bytes) % 5000)
                for idx, ts in enumerate(range(0, duration_ms, every_ms)):
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(idx)
                    out["frame_ts_ms"].append(ts)
                    out["frame_md5"].append(
                        hashlib.md5(f"{cmd5}:{idx}".encode()).hexdigest()
                    )
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                    "frame_idx": pd.Series(out["frame_idx"], dtype="int32"),
                    "frame_ts_ms": pd.Series(out["frame_ts_ms"], dtype="int32"),
                    "frame_md5": pd.Series(out["frame_md5"], dtype="object"),
                }
            )

    return media.mapInPandas(_sample, schema=FRAME_SCHEMA)
