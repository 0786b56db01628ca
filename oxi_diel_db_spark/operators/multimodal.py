"""Multimodal column plumbing (north star).

Images/audio/video are opaque ``binary`` columns + a typed metadata
struct. The engine treats payload bytes as pass-through data and runs
decode / feature-extract / resize / frame-sample as Arrow-batched
``mapInPandas`` stages, so a 100 TB media table processes partition-
parallel with no driver involvement.

Two decode tiers:

* REAL decoders for the uncompressed container formats that need no
  codec library — PPM (P6), BMP (24bpp uncompressed), WAV (PCM16 mono)
  — pure header parse + ``numpy.frombuffer`` reshape. These back the
  mm2 query with a full value-hash oracle (the fixture generator's
  ramp payloads have closed-form statistics; see
  :func:`media_fixture_table`). Compressed formats (JPEG/PNG/FLAC/mp4)
  would slot into the same ``decode_media`` dispatch behind a PIL/
  libav import — absent from this container by design.
* ``fake_decode`` — the original deterministic stand-in, kept for the
  plumbing tests (schema, Arrow batch shape, partition-parallelism).
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from oxi_diel_db_spark.tables import fanout

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
    # fanout (r13 opt): downstream decode stages (mapInPandas) inherit
    # this table's partitioning — without it they run in ONE Python
    # worker at gate scale; identity at real scale
    return fanout(docs, id_col).select(
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


# --------------------------------------------------------------------
# Real uncompressed-format codecs (pure numpy — no codec libraries).
# Format subset: PPM P6 (binary RGB), BMP 24bpp uncompressed
# (BITMAPINFOHEADER, bottom-up, 4-byte row padding), WAV PCM16 mono.
# --------------------------------------------------------------------


def encode_ppm(width: int, height: int, pixel_bytes: np.ndarray) -> bytes:
    """P6 PPM: ASCII header + raw RGB. ``pixel_bytes`` is the flat
    uint8 sequence of w·h·3 values in row-major RGB order."""
    assert pixel_bytes.size == width * height * 3
    return b"P6\n%d %d\n255\n" % (width, height) + pixel_bytes.astype(
        np.uint8
    ).tobytes()


def encode_bmp(width: int, height: int, pixel_bytes: np.ndarray) -> bytes:
    """24bpp uncompressed BMP, bottom-up rows padded to 4 bytes.
    ``pixel_bytes`` fills the file's pixel area in FILE order (padding
    excluded) — callers that care about geometry must pre-arrange
    bottom-up BGR themselves; ramp fixtures only care that padding is
    excluded from the value sequence."""
    assert pixel_bytes.size == width * height * 3
    stride = (width * 3 + 3) // 4 * 4
    rows = pixel_bytes.astype(np.uint8).reshape(height, width * 3)
    padded = np.zeros((height, stride), dtype=np.uint8)
    padded[:, : width * 3] = rows
    data = padded.tobytes()
    data_offset = 14 + 40
    file_size = data_offset + len(data)
    file_header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, data_offset)
    info_header = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(data), 2835, 2835, 0, 0
    )
    return file_header + info_header + data


def encode_wav(sample_rate: int, samples: np.ndarray) -> bytes:
    """RIFF/WAVE, PCM16 mono little-endian."""
    data = samples.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _ppm_header(payload: bytes, start: int = 0) -> tuple[int, int, int, int]:
    """Parse a P6 header at ``start`` (whitespace tokens, ``#``
    comments) → (width, height, maxval, absolute data_offset). Walks by
    index so stream decoders can parse frame N without slicing a copy
    of the remaining buffer (the r6-advice quadratic-walk fix)."""
    assert payload[start : start + 2] == b"P6", "not a P6 PPM"
    pos, vals = start + 2, []
    while len(vals) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        vals.append(int(payload[start:pos]))
    return vals[0], vals[1], vals[2], pos + 1  # single whitespace after maxval


def decode_media(payload: bytes, want_array: bool = False) -> dict:
    """Sniff the container by magic bytes and decode it.

    Returns ``{fmt, width, height, channels, sample_rate, n_values,
    mean_value}`` (+ ``array`` when ``want_array``: (h, w, 3) uint8
    top-down RGB for images, int16 samples for audio). ``n_values`` /
    ``mean_value`` are over pixel bytes (images) or samples (audio) —
    padding bytes excluded, which is exactly what a header-blind
    "decoder" gets wrong.
    """
    if payload[:2] == b"P6":
        w, h, maxval, off = _ppm_header(payload)
        assert maxval == 255, "only 8-bit PPM supported"
        px = np.frombuffer(payload, np.uint8, count=w * h * 3, offset=off)
        out = {
            "fmt": "ppm",
            "width": w,
            "height": h,
            "channels": 3,
            "sample_rate": None,
            "n_values": w * h * 3,
            "mean_value": float(px.sum()) / (w * h * 3),
        }
        if want_array:
            out["array"] = px.reshape(h, w, 3).copy()
        return out
    if payload[:2] == b"BM":
        data_offset = struct.unpack_from("<I", payload, 10)[0]
        w, h = struct.unpack_from("<ii", payload, 18)
        bpp = struct.unpack_from("<H", payload, 28)[0]
        compression = struct.unpack_from("<I", payload, 30)[0]
        assert bpp == 24 and compression == 0, "only 24bpp uncompressed BMP"
        bottom_up, h = h > 0, abs(h)
        stride = (w * 3 + 3) // 4 * 4
        rows = np.frombuffer(
            payload, np.uint8, count=stride * h, offset=data_offset
        ).reshape(h, stride)[:, : w * 3]
        out = {
            "fmt": "bmp",
            "width": w,
            "height": h,
            "channels": 3,
            "sample_rate": None,
            "n_values": w * h * 3,
            "mean_value": float(rows.sum()) / (w * h * 3),
        }
        if want_array:
            px = rows.reshape(h, w, 3)
            if bottom_up:
                px = px[::-1]
            out["array"] = px[:, :, ::-1].copy()  # BGR → RGB
        return out
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        pos, sr, channels, data = 12, None, None, None
        while pos + 8 <= len(payload):
            cid, clen = payload[pos : pos + 4], struct.unpack_from("<I", payload, pos + 4)[0]
            body = payload[pos + 8 : pos + 8 + clen]
            if cid == b"fmt ":
                audio_fmt, channels, sr = struct.unpack_from("<HHI", body, 0)
                bits = struct.unpack_from("<H", body, 14)[0]
                assert audio_fmt == 1 and bits == 16, "only PCM16 WAV"
            elif cid == b"data":
                data = body
            pos += 8 + clen + (clen & 1)  # RIFF chunks are 2-byte aligned
        assert sr is not None and data is not None, "missing fmt/data chunk"
        samples = np.frombuffer(data, "<i2")
        out = {
            "fmt": "wav",
            "width": None,
            "height": None,
            "channels": channels,
            "sample_rate": sr,
            "n_values": samples.size,
            "mean_value": float(samples.astype(np.int64).sum()) / max(samples.size, 1),
        }
        if want_array:
            out["array"] = samples.copy()
        return out
    raise NotImplementedError(
        "unknown container magic %r — compressed formats (JPEG/PNG/FLAC) "
        "need a codec library not present in this container" % payload[:4]
    )


DECODE_SCHEMA = (
    "doc_id bigint, fmt string, width int, height int, channels int, "
    "sample_rate int, n_values bigint, mean_value double"
)


def decode_features(media: DataFrame) -> DataFrame:
    """Arrow-batched REAL decode over binary payloads: one output row
    per media row with header-parsed dimensions and exact value stats.
    mapInPandas so per-batch decoder state is hoisted out of the row
    loop (the fixed version of the reference's per-site featurizer
    re-instantiation, ml_prediction.py:205,248)."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_media(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "fmt": [f["fmt"] for f in feats],
                    "width": pd.array([f["width"] for f in feats], dtype="Int32"),
                    "height": pd.array([f["height"] for f in feats], dtype="Int32"),
                    "channels": pd.array([f["channels"] for f in feats], dtype="Int32"),
                    "sample_rate": pd.array(
                        [f["sample_rate"] for f in feats], dtype="Int32"
                    ),
                    "n_values": pd.array([f["n_values"] for f in feats], dtype="Int64"),
                    "mean_value": [f["mean_value"] for f in feats],
                }
            )

    return media.mapInPandas(_decode, schema=DECODE_SCHEMA)


def media_fixture_table(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic media blobs for every doc id — REAL containers
    with closed-form statistics, so a full value-hash oracle exists
    without any media files on disk.

    Per-id parameters (mirrored literally in mm2's oracle SQL):

    * ``fmt = doc_id % 3`` → 0 ppm, 1 bmp, 2 wav
    * images: ``w = 4 + doc_id % 13``, ``h = 4 + (doc_id // 13) % 11``,
      pixel byte k = ``(seed + k) % 256`` (k over w·h·3 unpadded pixel
      bytes in file order) with ``seed = doc_id % 9973``
    * wav: ``n = 256 + doc_id % 2048`` samples at
      ``sr = 8000 + (doc_id % 5) * 2000``; sample i =
      ``(seed + i) % 4096 - 2048``

    The ramp makes header/padding bugs observable: a decoder that
    miscounts the header or reads BMP row padding shifts the sequence
    and the mean stops matching the oracle's closed form.
    """

    def _encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id in pdf[id_col]:
                i = int(doc_id)
                seed = i % 9973
                if i % 3 == 2:
                    n = 256 + i % 2048
                    samples = (seed + np.arange(n, dtype=np.int64)) % 4096 - 2048
                    payloads.append(encode_wav(8000 + (i % 5) * 2000, samples))
                else:
                    w, h = 4 + i % 13, 4 + (i // 13) % 11
                    px = (seed + np.arange(w * h * 3, dtype=np.int64)) % 256
                    enc = encode_ppm if i % 3 == 0 else encode_bmp
                    payloads.append(enc(w, h, px))
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "payload": payloads,
                    "n_bytes": [len(p) for p in payloads],
                }
            )

    # fanout (r13 opt): synth+encode is CPU-dense and otherwise runs in
    # ONE Python worker at the gate file's scan parallelism; identity at
    # real scale (scan splits >= cores)
    return fanout(
        docs.select(F.col(id_col).cast("long").alias(id_col)), id_col
    ).mapInPandas(
        _encode, schema="doc_id bigint, payload binary, n_bytes int"
    )


AUDIO_SCHEMA = (
    "doc_id bigint, sample_rate int, n_samples bigint, "
    "mean_value double, rms double"
)


def audio_features(media: DataFrame) -> DataFrame:
    """Real audio feature extraction over WAV payloads: decode PCM16
    samples and compute mean + RMS (the loudness/normalization features
    an audio-training pipeline computes before chunking/resampling).
    Non-WAV payloads are dropped (an image in an audio column is a
    schema error upstream)."""

    def _features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "sample_rate", "n_samples", "mean_value", "rms")}
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(p)
                if raw[:4] != b"RIFF":
                    continue
                d = decode_media(raw, want_array=True)
                v = d["array"].astype(np.float64)
                out["doc_id"].append(int(doc_id))
                out["sample_rate"].append(d["sample_rate"])
                out["n_samples"].append(v.size)
                out["mean_value"].append(float(v.mean()))
                out["rms"].append(float(np.sqrt(np.mean(v * v))))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                    "sample_rate": pd.Series(out["sample_rate"], dtype="int32"),
                    "n_samples": pd.Series(out["n_samples"], dtype="int64"),
                    "mean_value": pd.Series(out["mean_value"], dtype="float64"),
                    "rms": pd.Series(out["rms"], dtype="float64"),
                }
            )

    return media.mapInPandas(_features, schema=AUDIO_SCHEMA)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """REAL nearest-neighbor resize for decodable image payloads
    (PPM/BMP): decode → index-sample → re-encode as PPM. Same
    mapInPandas shape a PIL/opencv-backed resize would use; audio and
    unknown containers pass through untouched with ``resized=false``."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_payload, out_flag = [], []
            for p in pdf["payload"]:
                raw = bytes(p)
                if raw[:2] not in (b"P6", b"BM"):
                    out_payload.append(raw)
                    out_flag.append(False)
                    continue
                d = decode_media(raw, want_array=True)
                arr = d["array"]
                yi = np.arange(height) * d["height"] // height
                xi = np.arange(width) * d["width"] // width
                resized = arr[yi][:, xi]
                out_payload.append(encode_ppm(width, height, resized.reshape(-1)))
                out_flag.append(True)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "payload": out_payload,
                    "resized": out_flag,
                }
            )

    return media.mapInPandas(
        _resize, schema="doc_id bigint, payload binary, resized boolean"
    )


def to_audio_table(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Model an audio table: (id, payload binary, sample_rate, metadata).
    Payload = utf-8 bytes of text standing in for PCM16 mono samples
    (no codecs in this container); sample_rate is derived
    deterministically from the byte length so every engine agrees."""
    payload = F.encode(F.col(text_col), "UTF-8")
    n = F.octet_length(payload)
    # fanout (r13 opt): see to_binary_table
    return fanout(docs, id_col).select(
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


# --------------------------------------------------------------------
# Perceptual image hashing (average hash) over REAL decoded pixels —
# content-level image dedup, the multimodal twin of the text near-dup
# family in operators/dedup.py.
# --------------------------------------------------------------------


def ahash64(arr: np.ndarray) -> int:
    """64-bit average hash of an (h, w, 3) uint8 RGB array: Rec.601
    luma → 8×8 nearest-neighbor downsample → threshold at the mean →
    row-major bit pack. Luma (not the channel mean) on purpose: it is
    CHANNEL-ORDER SENSITIVE, so a decoder that forgets BMP's BGR→RGB
    swap (or its bottom-up row order) produces a different hash and
    the cross-format clusters in mm8 fail to merge."""
    h, w = arr.shape[:2]
    luma = (
        0.299 * arr[:, :, 0].astype(np.float64)
        + 0.587 * arr[:, :, 1].astype(np.float64)
        + 0.114 * arr[:, :, 2].astype(np.float64)
    )
    yi = np.arange(8) * h // 8
    xi = np.arange(8) * w // 8
    s = luma[yi][:, xi]
    bits = (s > s.mean()).reshape(-1)
    val = 0
    for b in bits:
        val = (val << 1) | int(b)
    return val - (1 << 64) if val >= (1 << 63) else val


AHASH_SCHEMA = "doc_id bigint, fmt string, ahash bigint"


def _dct_matrix(n: int) -> np.ndarray:
    """Orthonormal DCT-II basis matrix C (n x n): C @ x applies the
    1-D DCT-II; the 2-D transform of image block L is C @ L @ C.T."""
    k = np.arange(n).reshape(-1, 1)
    i = np.arange(n).reshape(1, -1)
    c = np.cos(np.pi * (2 * i + 1) * k / (2 * n)) * np.sqrt(2.0 / n)
    c[0, :] = np.sqrt(1.0 / n)
    return c


_DCT32 = _dct_matrix(32)


def phash64(arr: np.ndarray) -> int:
    """64-bit DCT perceptual hash of an (h, w, 3) uint8 RGB array —
    the classic pHash recipe (public: Zauner 2010, "Implementation and
    Benchmarking of Perceptual Image Hash Functions"): Rec.601 luma →
    32x32 nearest-neighbor resample → 2-D DCT-II → top-left 8x8
    low-frequency block → threshold at the block median → row-major
    bit pack. Differs from ahash64 in WHAT survives: the low-frequency
    spectrum — on content with real low-frequency structure,
    high-frequency dither leaves the block's bit pattern intact
    (asserted in tests; on flat/structureless input the AC
    coefficients sit near the median and the bits are noise, the
    known degenerate case of median-threshold spectral hashes).
    Channel-order-sensitive like ahash64 (luma weights), so a
    BGR-blind decode still fails mm12's cross-format gate."""
    h, w = arr.shape[:2]
    luma = (
        0.299 * arr[:, :, 0].astype(np.float64)
        + 0.587 * arr[:, :, 1].astype(np.float64)
        + 0.114 * arr[:, :, 2].astype(np.float64)
    )
    yi = np.arange(32) * h // 32
    xi = np.arange(32) * w // 32
    s = luma[yi][:, xi]
    spectrum = _DCT32 @ s @ _DCT32.T
    block = spectrum[:8, :8]
    bits = (block > np.median(block)).reshape(-1)
    val = 0
    for b in bits:
        val = (val << 1) | int(b)
    return val - (1 << 64) if val >= (1 << 63) else val


PHASH_SCHEMA = "doc_id bigint, fmt string, phash bigint"


def image_phash(media: DataFrame) -> DataFrame:
    """Arrow-batched decode → DCT perceptual hash per image payload
    (the phash64 twin of image_ahash; same one-narrow-pass posture:
    pixels never leave the partition, only 8-byte hashes shuffle)."""

    def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "fmt": [], "phash": []}
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(p)
                if raw[:2] not in (b"P6", b"BM"):
                    continue
                d = decode_media(raw, want_array=True)
                out["doc_id"].append(int(doc_id))
                out["fmt"].append(d["fmt"])
                out["phash"].append(phash64(d["array"]))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                    "fmt": pd.Series(out["fmt"], dtype="object"),
                    "phash": pd.Series(out["phash"], dtype="int64"),
                }
            )

    return media.mapInPandas(_hash, schema=PHASH_SCHEMA)



def image_ahash(media: DataFrame) -> DataFrame:
    """Arrow-batched decode → perceptual hash per image payload.
    Non-image payloads are dropped. At 100 TB this is one narrow
    mapInPandas pass; the downstream dedup is a groupBy on the 8-byte
    hash (exact-match clustering) or a banded Hamming join for
    near-match — both shuffle hashes, never pixels."""

    def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "fmt": [], "ahash": []}
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(p)
                if raw[:2] not in (b"P6", b"BM"):
                    continue
                d = decode_media(raw, want_array=True)
                out["doc_id"].append(int(doc_id))
                out["fmt"].append(d["fmt"])
                out["ahash"].append(ahash64(d["array"]))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                    "fmt": pd.Series(out["fmt"], dtype="object"),
                    "ahash": pd.Series(out["ahash"], dtype="int64"),
                }
            )

    return media.mapInPandas(_hash, schema=AHASH_SCHEMA)


def neardup_fixture_table(docs: DataFrame, id_col: str = "doc_id", n_groups: int = 40) -> DataFrame:
    """Image fixtures for content-level dedup: every doc in group
    ``g = doc_id % n_groups`` carries the SAME pseudo-random image
    (RandomState(1000+g), dims from g alone) — but alternating group
    OCCURRENCES ship it as PPM (top-down RGB) vs BMP (bottom-up BGR +
    row padding): format parity is ``(doc_id // n_groups) % 2``, which
    alternates WITHIN a group (``doc_id % 2`` would not — group members
    differ by multiples of n_groups, so their low bit is constant).
    Clusters therefore merge across formats ONLY under a correct
    decode; the group arithmetic gives mm8 a closed-form oracle with
    no image engine on the DuckDB side."""

    def _encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id in pdf[id_col]:
                i = int(doc_id)
                g = i % n_groups
                w = 8 + (g % 5) * 4
                h = 8 + ((g // 5) % 4) * 4
                img = np.random.RandomState(1000 + g).randint(
                    0, 256, size=(h, w, 3)
                ).astype(np.uint8)
                if (i // n_groups) % 2 == 0:
                    payloads.append(encode_ppm(w, h, img.reshape(-1)))
                else:
                    # file order: bottom-up rows, BGR channels
                    payloads.append(
                        encode_bmp(w, h, img[::-1, :, ::-1].reshape(-1))
                    )
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "payload": payloads,
                }
            )

    # fanout (r13 opt): synth+encode is CPU-dense and otherwise runs in
    # ONE Python worker at the gate file's scan parallelism; identity at
    # real scale (scan splits >= cores)
    return fanout(
        docs.select(F.col(id_col).cast("long").alias(id_col)), id_col
    ).mapInPandas(
        _encode, schema="doc_id bigint, payload binary"
    )


def audio_content_fixture_table(
    docs: DataFrame, id_col: str = "doc_id", group: int = 16
) -> DataFrame:
    """WAV fixtures with PLANTED duplicate audio content: every doc in
    the same ``doc_id // group`` block carries IDENTICAL samples
    (``content = doc_id // group``; sample j = (content + j) % 4096
    − 2048, n = 512 + content % 1024) but a doc-varying sample RATE
    (8000 + (doc_id % 5)·2000) — so the BYTE payloads differ within a
    group (fmt-chunk differs) while the audio content matches. A
    byte-level dedup cannot merge these; a content fingerprint must.
    Distinct contents get distinct (seed, n) pairs for all corpora
    under 4096·group ids (the mm9 oracle's collision-freedom bound,
    documented there)."""

    def _encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id in pdf[id_col]:
                i = int(doc_id)
                content = i // group
                n = 512 + content % 1024
                samples = (content + np.arange(n, dtype=np.int64)) % 4096 - 2048
                payloads.append(encode_wav(8000 + (i % 5) * 2000, samples))
            yield pd.DataFrame(
                {"doc_id": pdf[id_col].astype("int64"), "payload": payloads}
            )

    # fanout (r13 opt): synth+encode is CPU-dense and otherwise runs in
    # ONE Python worker at the gate file's scan parallelism; identity at
    # real scale (scan splits >= cores)
    return fanout(
        docs.select(F.col(id_col).cast("long").alias(id_col)), id_col
    ).mapInPandas(
        _encode, schema="doc_id bigint, payload binary"
    )


def audio_fingerprint(media: DataFrame, n_windows: int = 16) -> DataFrame:
    """Content fingerprint over decoded PCM samples: the sample vector
    is cut into ``n_windows`` equal time windows, each reduced to its
    mean absolute amplitude rounded to 3 dp, and the fingerprint is
    the md5 of that energy-signature vector (+ the sample count).
    Container metadata (sample rate, header layout, padding) does NOT
    enter the fingerprint — re-encoded or re-containered audio with
    identical samples collides on purpose; different content separates
    (windowed energies are content-determined). Arrow-batched
    mapInPandas; downstream clustering shuffles (doc_id, 32-char fp)
    rows only, never samples — the mm8 posture at 100 TB."""
    import hashlib

    def _fp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_id, out_fp, out_n = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    meta = decode_media(bytes(payload), want_array=True)
                except Exception:
                    continue
                if meta.get("fmt") != "wav":
                    continue
                samples = meta["array"].astype(np.float64)
                n = len(samples)
                if n == 0:
                    continue
                bounds = (np.arange(n_windows + 1) * n) // n_windows
                energies = [
                    round(float(np.abs(samples[bounds[k]:bounds[k + 1]]).mean()), 3)
                    if bounds[k + 1] > bounds[k]
                    else 0.0
                    for k in range(n_windows)
                ]
                sig = f"{n}:" + ",".join(f"{e:.3f}" for e in energies)
                out_id.append(int(doc_id))
                out_fp.append(hashlib.md5(sig.encode()).hexdigest())
                out_n.append(n)
            yield pd.DataFrame(
                {"doc_id": out_id, "fp": out_fp, "n_samples": out_n}
            )

    return media.mapInPandas(
        _fp, schema="doc_id bigint, fp string, n_samples bigint"
    )


def video_stream_fixture_table(
    docs: DataFrame,
    id_col: str = "doc_id",
    group: int = 16,
    base_frames: int = 4,
    dense_content: bool = False,
) -> DataFrame:
    """Video fixtures in a REAL public container: a concatenated-P6
    frame stream — exactly what ``ffmpeg -f image2pipe -vcodec ppm``
    emits — so the decoder below is genuine format plumbing, not a
    stub. Content (the sequence of ``base_frames`` distinct 16×12
    frames) is keyed by ``doc_id // group``; each doc then appends
    ``doc_id % 3`` EXTRA repeats of its last frame (a freeze-frame
    tail), so payloads within a group are byte-DIFFERENT and
    frame-count-different while the scene content matches — byte
    dedup and naive per-frame-count signatures both fail; the
    consecutive-duplicate-collapsed scene signature must merge
    them.

    ``dense_content=False`` (the gated mm10 fixture, byte-pinned) uses
    arithmetic ramps whose seed enters pixels additively — everything
    is mod 256, so CONTENT ENTROPY IS BOUNDED (~850 distinct videos;
    measured by the r9 video scale probe, which planted 12,500 groups
    and got 837 clusters). Collision-free at gate scale (313 groups at
    sf0.1), saturating above ~1k groups. ``dense_content=True`` (the
    probe path) draws frames from a content-seeded RandomState —
    full-entropy, collision-free at any scale — without touching the
    gated bytes."""

    def _encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id in pdf[id_col]:
                i = int(doc_id)
                content = i // group
                w, h = 16, 12
                frames = []
                rng = (
                    np.random.RandomState((content * 2654435761) % 2**31)
                    if dense_content
                    else None
                )
                for k in range(base_frames):
                    # stride varies per frame (spatial frequency, not
                    # just offset): shifted ramps can COLLIDE on aHash
                    # (measured), different-frequency ramps do not
                    seed = (content * 131 + k * 7919) % 9973
                    if rng is not None:
                        px = rng.randint(0, 256, size=w * h * 3)
                    else:
                        px = (
                            seed
                            + np.arange(w * h * 3, dtype=np.int64) * (2 * k + 1)
                        ) % 256
                    frames.append(encode_ppm(w, h, px))
                frames.extend([frames[-1]] * (i % 3))  # freeze-frame tail
                payloads.append(b"".join(frames))
            yield pd.DataFrame(
                {"doc_id": pdf[id_col].astype("int64"), "payload": payloads}
            )

    # fanout (r13 opt): synth+encode is CPU-dense and otherwise runs in
    # ONE Python worker at the gate file's scan parallelism; identity at
    # real scale (scan splits >= cores)
    return fanout(
        docs.select(F.col(id_col).cast("long").alias(id_col)), id_col
    ).mapInPandas(
        _encode, schema="doc_id bigint, payload binary"
    )


def decode_ppm_stream(payload: bytes) -> list[np.ndarray]:
    """Walk a concatenated-P6 stream (ffmpeg image2pipe layout):
    repeatedly parse a header, slice that frame's pixel block, advance.
    Returns the frames as (h, w, 3) uint8 arrays. A decoder that
    miscounts a header or a pixel block desynchronizes the walk and
    every later frame is garbage — which the mm10 gate would catch."""
    frames, pos = [], 0
    while pos < len(payload):
        if payload[pos : pos + 2] != b"P6":
            raise ValueError(f"desynchronized P6 stream at offset {pos}")
        w, h, maxval, off = _ppm_header(payload, start=pos)
        assert maxval == 255
        n = w * h * 3
        # absolute-offset frombuffer over the ONE payload buffer: the
        # walk is O(stream) total, not O(frames x stream) re-slicing
        px = np.frombuffer(payload, np.uint8, count=n, offset=off)
        frames.append(px.reshape(h, w, 3))
        pos = off + n
    return frames


def video_fingerprint(media: DataFrame) -> DataFrame:
    """Scene-level video fingerprint: per-frame aHash (the mm8 kernel)
    → collapse CONSECUTIVE duplicate hashes (freeze frames, held
    shots) → md5 over the collapsed hash sequence. Frame-rate padding
    and held-frame tails do not change the fingerprint; any actual
    scene change does. Arrow-batched mapInPandas; clustering
    downstream shuffles (doc_id, 32-char fp) rows, never frames."""
    import hashlib

    def _fp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_id, out_fp, out_nf, out_ns = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    frames = decode_ppm_stream(bytes(payload))
                except Exception:
                    continue
                if not frames:
                    continue
                hashes = [ahash64(fr) for fr in frames]
                scenes = [hashes[0]]
                for hsh in hashes[1:]:
                    if hsh != scenes[-1]:
                        scenes.append(hsh)
                sig = ",".join(str(x) for x in scenes)
                out_id.append(int(doc_id))
                out_fp.append(hashlib.md5(sig.encode()).hexdigest())
                out_nf.append(len(hashes))
                out_ns.append(len(scenes))
            yield pd.DataFrame(
                {
                    "doc_id": out_id,
                    "fp": out_fp,
                    "n_frames": out_nf,
                    "n_scenes": out_ns,
                }
            )

    return media.mapInPandas(
        _fp, schema="doc_id bigint, fp string, n_frames bigint, n_scenes bigint"
    )


def stft_features(
    media: DataFrame, frame: int = 256, hop: int = 128, n_bands: int = 4
) -> DataFrame:
    """Spectrogram features over WAV payloads — the STFT step every
    audio-training pipeline runs before token/codec models: Hann-
    windowed power spectra per frame, averaged over frames, reduced
    to ``n_bands`` contiguous log-energy bands plus the spectral
    centroid in Hz. All numpy (rfft is deterministic for a given
    input), Arrow-batched via mapInPandas; per-doc state is one
    frame x bins matrix — never materialized across docs. Non-WAV
    payloads are dropped (schema error upstream, as audio_features)."""

    def _stft(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        win = np.hanning(frame)
        cols = ("doc_id", "sample_rate", "n_frames", "centroid_hz") + tuple(
            f"e_band{b}" for b in range(n_bands)
        )
        for pdf in batches:
            out = {k: [] for k in cols}
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(p)
                if raw[:4] != b"RIFF":
                    continue
                d = decode_media(raw, want_array=True)
                v = d["array"].astype(np.float64) / 2048.0
                if v.size < frame:
                    continue
                nf = 1 + (v.size - frame) // hop
                idx = np.arange(frame)[None, :] + hop * np.arange(nf)[:, None]
                spec = np.abs(np.fft.rfft(v[idx] * win, axis=1)) ** 2
                mean_spec = spec.mean(axis=0)
                freqs = np.fft.rfftfreq(frame, 1.0 / d["sample_rate"])
                tot = float(mean_spec.sum())
                out["doc_id"].append(int(doc_id))
                out["sample_rate"].append(int(d["sample_rate"]))
                out["n_frames"].append(int(nf))
                out["centroid_hz"].append(
                    float((freqs * mean_spec).sum() / tot) if tot > 0 else 0.0
                )
                bins = np.array_split(mean_spec, n_bands)
                for b in range(n_bands):
                    out[f"e_band{b}"].append(float(np.log10(1.0 + bins[b].sum())))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                    "sample_rate": pd.Series(out["sample_rate"], dtype="int32"),
                    "n_frames": pd.Series(out["n_frames"], dtype="int64"),
                    "centroid_hz": pd.Series(out["centroid_hz"], dtype="float64"),
                    **{
                        f"e_band{b}": pd.Series(out[f"e_band{b}"], dtype="float64")
                        for b in range(n_bands)
                    },
                }
            )

    schema = (
        "doc_id bigint, sample_rate int, n_frames bigint, centroid_hz double, "
        + ", ".join(f"e_band{b} double" for b in range(n_bands))
    )
    return media.mapInPandas(_stft, schema)


def jittered_video_fixture_table(
    docs: DataFrame, id_col: str = "doc_id", group: int = 16
) -> DataFrame:
    """Shot-boundary fixtures: a concatenated-P6 stream of
    ``2 + doc_id % 3`` shots x 3 frames each, where frames WITHIN a
    shot differ by a small deterministic luma jitter (+frame_idx on
    every byte — real video is never byte-identical frame to frame)
    and shots differ by a large content change (fresh ramp seed and
    stride). An exact-hash scene collapse (mm10's kernel) sees every
    jittered frame as its own scene; only a TOLERANT frame-delta
    detector recovers the planted shot count — which is exactly what
    mm13 gates. Shot structure is pure doc_id arithmetic, so the
    oracle is closed-form."""

    def _encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id in pdf[id_col]:
                i = int(doc_id)
                content = i // group
                w, h = 16, 12
                frames = []
                for s in range(2 + i % 3):
                    seed = (content * 131 + s * 7919) % 9973
                    base = (
                        seed
                        + np.arange(w * h * 3, dtype=np.int64) * (2 * s + 1)
                    ) % 256
                    for f in range(3):
                        frames.append(encode_ppm(w, h, (base + f) % 256))
                payloads.append(b"".join(frames))
            yield pd.DataFrame(
                {"doc_id": pdf[id_col].astype("int64"), "payload": payloads}
            )

    # fanout (r13 opt): synth+encode is CPU-dense and otherwise runs in
    # ONE Python worker at the gate file's scan parallelism; identity at
    # real scale (scan splits >= cores)
    return fanout(
        docs.select(F.col(id_col).cast("long").alias(id_col)), id_col
    ).mapInPandas(
        _encode, schema="doc_id bigint, payload binary"
    )


def shot_boundaries(media: DataFrame, threshold: float = 8.0) -> DataFrame:
    """Soft shot-boundary detection over concatenated-P6 streams: mean
    absolute LUMA delta between consecutive frames, cut where the
    delta exceeds ``threshold`` (the classic pixel-difference detector
    — Boreczky & Rowe 1996's baseline). Tolerates within-shot jitter
    that breaks exact-hash scene collapse (mm10's kernel is the
    held-frame/freeze-frame tool; this is the real-footage tool).
    Emits (doc_id, n_frames, n_shots, cut_positions) — one Arrow
    batch pass, frames never leave the decode stage."""

    def _detect(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "n_frames": [], "n_shots": [], "cut_positions": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    frames = decode_ppm_stream(bytes(payload))
                except Exception:
                    continue
                if not frames:
                    continue
                lumas = [
                    0.299 * fr[:, :, 0].astype(np.float64)
                    + 0.587 * fr[:, :, 1].astype(np.float64)
                    + 0.114 * fr[:, :, 2].astype(np.float64)
                    for fr in frames
                ]
                cuts = [
                    k + 1
                    for k in range(len(lumas) - 1)
                    if float(np.mean(np.abs(lumas[k + 1] - lumas[k]))) > threshold
                ]
                out["doc_id"].append(int(doc_id))
                out["n_frames"].append(len(frames))
                out["n_shots"].append(len(cuts) + 1)
                out["cut_positions"].append(",".join(str(c) for c in cuts))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                    "n_frames": pd.Series(out["n_frames"], dtype="int64"),
                    "n_shots": pd.Series(out["n_shots"], dtype="int64"),
                    "cut_positions": pd.Series(out["cut_positions"], dtype="object"),
                }
            )

    return media.mapInPandas(
        _detect,
        schema="doc_id bigint, n_frames bigint, n_shots bigint, cut_positions string",
    )


def speech_gap_fixture_table(
    docs: DataFrame, id_col: str = "doc_id", frame: int = 160
) -> DataFrame:
    """VAD fixtures: WAV payloads alternating ACTIVE blocks (full-scale
    square tone) and SILENT blocks (zeros, below any threshold), block
    boundaries on exact frame multiples. The activity pattern is pure
    doc_id arithmetic — ``2 + doc_id % 3`` active segments separated by
    single silent blocks, each block ``2 + (doc_id // 3) % 2`` frames
    long — so expected segment counts and durations are closed-form
    and mm14's gate needs no audio engine on the DuckDB side."""

    def _encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id in pdf[id_col]:
                i = int(doc_id)
                n_active = 2 + i % 3
                block_frames = 2 + (i // 3) % 2
                block = frame * block_frames
                chunks = []
                for s in range(n_active):
                    if s:
                        chunks.append(np.zeros(block, dtype=np.int64))
                    tone = np.where(
                        (np.arange(block) // 8) % 2 == 0, 12000, -12000
                    )
                    chunks.append(tone)
                payloads.append(encode_wav(16000, np.concatenate(chunks)))
            yield pd.DataFrame(
                {"doc_id": pdf[id_col].astype("int64"), "payload": payloads}
            )

    # fanout (r13 opt): synth+encode is CPU-dense and otherwise runs in
    # ONE Python worker at the gate file's scan parallelism; identity at
    # real scale (scan splits >= cores)
    return fanout(
        docs.select(F.col(id_col).cast("long").alias(id_col)), id_col
    ).mapInPandas(
        _encode, schema="doc_id bigint, payload binary"
    )


def voice_activity(
    media: DataFrame, frame: int = 160, threshold: float = 1000.0
) -> DataFrame:
    """Energy-threshold voice-activity detection (the classic
    frame-RMS VAD — Rabiner & Sambur 1975's baseline): PCM16 samples →
    ``frame``-sample frames → RMS per frame → active where RMS >
    ``threshold`` → consecutive active frames collapse into segments.
    Emits (doc_id, n_frames, n_active_frames, n_segments,
    segment_frames) — the speech-data curation primitive (silence
    trimming, speech-ratio quality filters) over one Arrow-batched
    decode pass; samples never leave the partition."""

    def _vad(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "doc_id": [], "n_frames": [], "n_active_frames": [],
                "n_segments": [], "segment_frames": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)
                if raw[:4] != b"RIFF":
                    continue
                d = decode_media(raw, want_array=True)
                s = d["array"].astype(np.float64)
                n_frames = len(s) // frame
                if n_frames == 0:
                    continue
                frames = s[: n_frames * frame].reshape(n_frames, frame)
                rms = np.sqrt(np.mean(frames * frames, axis=1))
                active = rms > threshold
                segs = []
                run = 0
                for a in active:
                    if a:
                        run += 1
                    elif run:
                        segs.append(run)
                        run = 0
                if run:
                    segs.append(run)
                out["doc_id"].append(int(doc_id))
                out["n_frames"].append(int(n_frames))
                out["n_active_frames"].append(int(active.sum()))
                out["n_segments"].append(len(segs))
                out["segment_frames"].append(",".join(str(x) for x in segs))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                    "n_frames": pd.Series(out["n_frames"], dtype="int64"),
                    "n_active_frames": pd.Series(out["n_active_frames"], dtype="int64"),
                    "n_segments": pd.Series(out["n_segments"], dtype="int64"),
                    "segment_frames": pd.Series(out["segment_frames"], dtype="object"),
                }
            )

    return media.mapInPandas(
        _vad,
        schema=(
            "doc_id bigint, n_frames bigint, n_active_frames bigint, "
            "n_segments bigint, segment_frames string"
        ),
    )


def payload_integrity(media: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Payload integrity classifier — the quarantine gate a media
    ingest pipeline runs BEFORE any decode/dedup stage (a truncated
    or magic-corrupted blob must be routed out, not crash a decoder
    mid-job or silently mis-hash). REAL byte inspection, not metadata
    trust: parse the magic, then check the container's own declared
    size against the actual byte count —

    * ``P6``: header walk (dims, maxval) → declared = offset + w·h·3;
    * ``BM``: little-endian file-size field at offset 2;
    * anything else → ``unknown_magic``;
    * declared > actual → ``truncated`` (headers parse fine on a cut
      payload — exactly why length-vs-declared is the check);
    * unparseable header on a known magic → ``malformed_header``.

    Arrow-batched mapInPandas; emits (id, verdict, n_bytes,
    declared_bytes). Bytes never shuffle — downstream aggregation
    moves verdict strings."""
    import struct

    def _classify(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, verdicts, n_bytes, declared = [], [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                raw = bytes(payload)
                n = len(raw)
                ids.append(int(doc_id))
                n_bytes.append(n)
                if raw[:2] == b"P6":
                    try:
                        w, h, _maxval, off = _ppm_header(raw)
                        want = off + w * h * 3
                    except Exception:
                        verdicts.append("malformed_header")
                        declared.append(-1)
                        continue
                    declared.append(want)
                    verdicts.append("valid_ppm" if n >= want else "truncated")
                elif raw[:2] == b"BM":
                    if n < 6:
                        verdicts.append("malformed_header")
                        declared.append(-1)
                        continue
                    want = struct.unpack("<I", raw[2:6])[0]
                    declared.append(want)
                    verdicts.append("valid_bmp" if n >= want else "truncated")
                else:
                    verdicts.append("unknown_magic")
                    declared.append(-1)
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "verdict": verdicts,
                    "n_bytes": pd.Series(n_bytes, dtype="int64"),
                    "declared_bytes": pd.Series(declared, dtype="int64"),
                }
            )

    return media.select(id_col, "payload").mapInPandas(
        _classify,
        schema=f"{id_col} bigint, verdict string, n_bytes bigint, "
        "declared_bytes bigint",
    )


# --------------------------------------------------------------------
# Content-defined chunking (CDC) — rolling-hash chunk boundaries for
# binary payloads, connecting the mm tier to the d tier at SUB-FILE
# granularity (reference scope: sub-file dedup of media/binary blobs;
# the public FastCDC/LBFS recipe). A boundary is declared after byte i
# whenever the polynomial hash of the LAST `CDC_WINDOW` bytes is
# 0 mod `CDC_MOD` — a purely content-LOCAL predicate, so chunk
# boundaries re-align after any insertion/deletion/shift: shifted
# duplicate payloads share all chunks past the first boundary, which
# fixed-offset chunking provably misses (pinned in pytest).
# --------------------------------------------------------------------

CDC_WINDOW = 8  # rolling-hash window (bytes)
CDC_POW = 31  # polynomial base
CDC_MOD = 64  # boundary divisor → expected chunk length ≈ 64 bytes


def cdc_fixture_table(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic binary payloads with planted SHIFTED duplicates —
    mirrored literally by mm15's oracle SQL (1-indexed byte i):

    * base(d): n = 1200 + d % 7 * 100 bytes,
      b[i] = (d·7919 + i·104729 + (i² mod 251)·31) mod 256
    * doc_id % 10 == 1: payload = filler(1 + doc_id % 7 bytes,
      f[j] = (doc_id·31 + j·17) mod 256) ++ base(doc_id − 1) — the
      previous doc's ENTIRE payload at a 1-7 byte shift (never a
      multiple of any fixed chunk size)."""

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def base(d: int) -> np.ndarray:
            n = 1200 + (d % 7) * 100
            i = np.arange(1, n + 1, dtype=np.int64)
            return (
                (d * 7919 + i * 104729 + ((i * i) % 251) * 31) % 256
            ).astype(np.uint8)

        for pdf in batches:
            payloads = []
            for doc_id in pdf[id_col]:
                d = int(doc_id)
                if d % 10 == 1:
                    shift = 1 + d % 7
                    j = np.arange(1, shift + 1, dtype=np.int64)
                    filler = ((d * 31 + j * 17) % 256).astype(np.uint8)
                    payloads.append(
                        np.concatenate([filler, base(d - 1)]).tobytes()
                    )
                else:
                    payloads.append(base(d).tobytes())
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "payload": payloads,
                }
            )

    # fanout (r13 opt): synth+encode is CPU-dense and otherwise runs in
    # ONE Python worker at the gate file's scan parallelism; identity at
    # real scale (scan splits >= cores)
    return fanout(
        docs.select(F.col(id_col).cast("long").alias(id_col)), id_col
    ).mapInPandas(
        _gen, schema="doc_id bigint, payload binary"
    )


def cdc_chunk_list(b: np.ndarray) -> list[tuple[int, int, int, str]]:
    """Chunk one payload: [(chunk_idx, offset, length, md5)] with
    1-indexed offsets. The rolling hash over every window is one
    vectorized sliding-window dot product (no per-byte Python loop);
    md5 keys use the cross-engine canonical form — comma-joined
    decimal byte values — so DuckDB can rebuild identical keys
    without BLOB encoding pitfalls."""
    n = len(b)
    bi = b.astype(np.int64)
    bds: list[int] = []
    if n >= CDC_WINDOW:
        pows = CDC_POW ** np.arange(CDC_WINDOW, dtype=np.int64)
        win = np.lib.stride_tricks.sliding_window_view(bi, CDC_WINDOW)
        h = win @ pows[::-1]  # h[k] ends at 1-indexed position k + 8
        bds = (np.nonzero(h % CDC_MOD == 0)[0] + CDC_WINDOW).tolist()
    if not bds or bds[-1] != n:
        bds.append(n)
    out, s = [], 1
    for k, e in enumerate(bds, 1):
        seg = bi[s - 1 : e]
        chash = hashlib.md5(
            ",".join(str(int(x)) for x in seg).encode()
        ).hexdigest()
        out.append((k, s, e - s + 1, chash))
        s = e + 1
    return out


def cdc_chunks(media: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, chunk_idx, c_off, c_len, chash) for every payload —
    one Arrow-batched pass; payload bytes never leave their partition,
    only the 16-byte chunk keys shuffle for the dedup join."""

    def _split(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {
                "doc_id": [], "chunk_idx": [], "c_off": [],
                "c_len": [], "chash": [],
            }
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                b = np.frombuffer(bytes(payload), dtype=np.uint8)
                for k, s, ln, chash in cdc_chunk_list(b):
                    rows["doc_id"].append(int(doc_id))
                    rows["chunk_idx"].append(k)
                    rows["c_off"].append(s)
                    rows["c_len"].append(ln)
                    rows["chash"].append(chash)
            yield pd.DataFrame(rows)

    return media.select(id_col, "payload").mapInPandas(
        _split,
        schema=f"{id_col} bigint, chunk_idx bigint, c_off bigint, "
        "c_len bigint, chash string",
    )


def cdc_chunk_state(chunks: DataFrame) -> DataFrame:
    """Compact per-key CDC dedup state — ONE row per distinct chunk
    key: ``(chash, min_doc, cnt_min)`` where ``min_doc`` is the lowest
    doc_id holding the key and ``cnt_min`` how many instances that doc
    holds. This is the ENTIRE state the st23 order rule needs: with an
    append-first store, a chunk ``(doc_id, idx, chash)`` is duplicated
    iff some OTHER instance exists at ``p_doc < doc_id``, or in the
    same doc at another index. Equivalently, against the compact
    state: ``min_doc < doc_id`` (an earlier doc holds the content) or
    ``min_doc == doc_id AND cnt_min > 1`` (the key's first doc holds
    it at least twice — chunk_idx is unique within a doc, so a second
    instance necessarily sits at a different index). Instances at
    HIGHER doc_ids can never flip the rule, so nothing else needs
    storing.

    This is the st23 chunk-store "rung 2" (r12 verdict Next #3): the
    store the per-batch score joins against holds O(distinct keys)
    rows instead of O(all chunk instances) — the d21-style count-store
    compaction, run continuously (every batch merges into the compact
    state rather than appending raw instances). Store-read growth per
    batch is therefore bounded by UNIQUE content, sub-linear in
    ingested bytes whenever duplication exists — which is the regime a
    dedup store exists for."""
    per_doc = chunks.groupBy("chash", "doc_id").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    # doc_id is unique within each chash group after the per-doc agg,
    # so min(struct) is deterministic (no tie on the leading field)
    return (
        per_doc.groupBy("chash")
        .agg(F.min(F.struct("doc_id", "cnt")).alias("s"))
        .select(
            "chash",
            F.col("s.doc_id").alias("min_doc"),
            F.col("s.cnt").alias("cnt_min"),
        )
    )


def cdc_state_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two compact CDC states built over DISJOINT doc sets (a
    doc's chunks never split across micro-batches, so the same doc_id
    cannot appear on both sides). Per key, the row with the smaller
    min_doc wins outright — disjointness makes min_doc ties
    impossible, so min(struct) is exact, and the merge is associative:
    any batch arrival grouping folds to the same state (the
    arrival-order-independence the st23 oracle replays)."""
    u = a.unionByName(b)
    return (
        u.groupBy("chash")
        .agg(F.min(F.struct("min_doc", "cnt_min")).alias("s"))
        .select(
            "chash",
            F.col("s.min_doc").alias("min_doc"),
            F.col("s.cnt_min").alias("cnt_min"),
        )
    )
