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


def test_ppm_roundtrip():
    import numpy as np

    px = np.arange(2 * 2 * 3) % 256
    blob = MM.encode_ppm(2, 2, px)
    assert blob.startswith(b"P6\n2 2\n255\n")
    d = MM.decode_media(blob, want_array=True)
    assert (d["fmt"], d["width"], d["height"], d["channels"]) == ("ppm", 2, 2, 3)
    assert d["mean_value"] == px.mean()
    assert (d["array"].reshape(-1) == px).all()


def test_ppm_header_comments_and_whitespace():
    import numpy as np

    px = np.full(1 * 1 * 3, 9)
    blob = b"P6\n# a comment\n 1\t1 \n# another\n255\n" + bytes([9, 9, 9])
    d = MM.decode_media(blob)
    assert (d["width"], d["height"], d["mean_value"]) == (1, 1, 9.0)
    del px


def test_bmp_padding_excluded():
    import numpy as np

    # w=5 → row 15 bytes, stride 16: one padding byte per row that a
    # naive frombuffer-everything decoder would average in
    w, h = 5, 3
    px = (7 + np.arange(w * h * 3)) % 256
    blob = MM.encode_bmp(w, h, px)
    d = MM.decode_media(blob)
    assert (d["fmt"], d["width"], d["height"]) == ("bmp", w, h)
    assert d["n_values"] == w * h * 3
    assert d["mean_value"] == pytest.approx(px.mean())
    # file really is padded: pixel area is stride*h not 3*w*h
    assert len(blob) == 54 + 16 * h


def test_wav_roundtrip():
    import numpy as np

    samples = np.array([-2048, 0, 1024, 2047], dtype=np.int64)
    blob = MM.encode_wav(16000, samples)
    d = MM.decode_media(blob, want_array=True)
    assert (d["fmt"], d["sample_rate"], d["channels"]) == ("wav", 16000, 1)
    assert d["n_values"] == 4
    assert d["mean_value"] == samples.mean()
    assert (d["array"] == samples).all()


def test_decode_media_unknown_magic_raises():
    with pytest.raises(NotImplementedError, match="codec"):
        MM.decode_media(b"\x89PNG\r\n\x1a\n....")


def test_resize_images_nearest(spark):
    import numpy as np

    # 4x4 image with distinct pixel values → 2x2 nearest picks rows/cols 0,2
    px = np.arange(4 * 4 * 3) % 256
    docs = spark.createDataFrame([(1, bytearray(MM.encode_ppm(4, 4, px)))],
                                 "doc_id long, payload binary")
    out = MM.resize_images(docs, 2, 2).collect()[0]
    assert out["resized"]
    d = MM.decode_media(bytes(out["payload"]), want_array=True)
    assert (d["width"], d["height"]) == (2, 2)
    full = px.reshape(4, 4, 3)
    assert (d["array"] == full[::2, ::2]).all()
    # non-image payloads pass through untouched
    wav = MM.encode_wav(8000, np.zeros(4))
    docs2 = spark.createDataFrame([(2, bytearray(wav))], "doc_id long, payload binary")
    out2 = MM.resize_images(docs2, 2, 2).collect()[0]
    assert not out2["resized"] and bytes(out2["payload"]) == wav


def test_media_fixture_decode_matches_closed_form(spark):
    # the mm2 contract in miniature: fixture blobs decode to the ramp's
    # analytic mean for all three formats
    docs = spark.createDataFrame([(i,) for i in range(30)], "doc_id long")
    rows = {
        r["doc_id"]: r
        for r in MM.decode_features(MM.media_fixture_table(docs)).collect()
    }
    for i in range(30):
        seed, r = i % 9973, rows[i]
        if i % 3 == 2:
            n = 256 + i % 2048
            exp = sum((seed + k) % 4096 - 2048 for k in range(n)) / n
            assert r["fmt"] == "wav" and r["sample_rate"] == 8000 + (i % 5) * 2000
        else:
            w, h = 4 + i % 13, 4 + (i // 13) % 11
            n = w * h * 3
            exp = sum((seed + k) % 256 for k in range(n)) / n
            assert r["fmt"] == ("ppm" if i % 3 == 0 else "bmp")
            assert (r["width"], r["height"]) == (w, h)
        assert r["n_values"] == n
        assert r["mean_value"] == pytest.approx(exp, abs=1e-9)


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


def test_audio_features_known_samples(spark):
    import math

    import numpy as np

    samples = np.array([100, -100, 300, -300], dtype=np.int64)
    docs = spark.createDataFrame(
        [(5, bytearray(MM.encode_wav(12000, samples)))], "doc_id long, payload binary"
    )
    r = MM.audio_features(docs).collect()[0]
    assert (r["sample_rate"], r["n_samples"]) == (12000, 4)
    assert r["mean_value"] == 0.0
    assert r["rms"] == pytest.approx(math.sqrt((100**2 + 100**2 + 300**2 + 300**2) / 4))
    # non-WAV payloads are dropped, not mis-decoded
    img = MM.encode_ppm(2, 2, np.zeros(12))
    docs2 = spark.createDataFrame([(6, bytearray(img))], "doc_id long, payload binary")
    assert MM.audio_features(docs2).count() == 0


# ---------------------------------------------------------------- aHash


def test_ahash_cross_format_equal():
    """The same image content as PPM (top-down RGB) and BMP (bottom-up
    BGR + padding) must hash identically — only a decoder that undoes
    the BMP geometry does this."""
    import numpy as np

    from oxi_diel_db_spark.operators.multimodal import (
        ahash64,
        decode_media,
        encode_bmp,
        encode_ppm,
    )

    img = np.random.RandomState(7).randint(0, 256, size=(12, 20, 3)).astype(np.uint8)
    ppm = encode_ppm(20, 12, img.reshape(-1))
    bmp = encode_bmp(20, 12, img[::-1, :, ::-1].reshape(-1))
    a_ppm = ahash64(decode_media(ppm, want_array=True)["array"])
    a_bmp = ahash64(decode_media(bmp, want_array=True)["array"])
    assert a_ppm == a_bmp
    # a decode that FORGOT the bottom-up flip or the BGR swap diverges
    assert ahash64(img[::-1]) != a_ppm
    assert ahash64(img[:, :, ::-1]) != a_ppm


def test_ahash_resize_invariant():
    """ahash ∘ resize_images(8, 8) == ahash: both use the same
    nearest-neighbor index formula, so the pipeline composition is
    exact (resize-then-hash equals hash-directly)."""
    import numpy as np

    from oxi_diel_db_spark.operators.multimodal import (
        ahash64,
        decode_media,
        encode_ppm,
    )

    img = np.random.RandomState(11).randint(0, 256, size=(16, 24, 3)).astype(np.uint8)
    direct = ahash64(img)
    yi = np.arange(8) * 16 // 8
    xi = np.arange(8) * 24 // 8
    resized = img[yi][:, xi]
    rt = decode_media(encode_ppm(8, 8, resized.reshape(-1)), want_array=True)["array"]
    assert ahash64(rt) == direct


def test_ahash_noise_robust():
    """Small pixel noise must move few bits (that's what makes it a
    near-dup hash, not a checksum): ±1 on every pixel flips ≤ 4 of 64
    bits for this seed."""
    import numpy as np

    from oxi_diel_db_spark.operators.multimodal import ahash64

    img = np.random.RandomState(3).randint(1, 255, size=(16, 16, 3)).astype(np.uint8)
    noise = np.random.RandomState(4).choice([-1, 1], size=img.shape)
    noisy = (img.astype(np.int32) + noise).clip(0, 255).astype(np.uint8)
    ham = bin((ahash64(img) ^ ahash64(noisy)) & ((1 << 64) - 1)).count("1")
    assert ham <= 4
    # while DIFFERENT random content is far away
    other = np.random.RandomState(5).randint(0, 256, size=(16, 16, 3)).astype(np.uint8)
    ham_other = bin((ahash64(img) ^ ahash64(other)) & ((1 << 64) - 1)).count("1")
    assert ham_other >= 16


def test_mm8_clusters_merge_formats(spark):
    """End-to-end: every fixture group with both parities present must
    collapse to ONE cluster spanning both containers."""
    from oxi_diel_db_spark.operators.multimodal import (
        image_ahash,
        neardup_fixture_table,
    )

    docs = spark.range(80).withColumnRenamed("id", "doc_id")
    hashed = image_ahash(neardup_fixture_table(docs))
    clusters = (
        hashed.groupBy("ahash")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.count_distinct("fmt").alias("n_formats"),
        )
        .collect()
    )
    assert len(clusters) == 40  # one cluster per planted group
    assert all(r["n_members"] == 2 and r["n_formats"] == 2 for r in clusters)


def test_mm8_near_match_via_banded_hamming(spark):
    """The claimed composition: mm8's aHash feeds the generic banded
    Hamming join (pigeonhole over 4 16-bit bands) to find NEAR-matching
    images — a perturbed copy (one sampled cell altered) lands within
    Hamming <= 3 of its original and must be found without all-pairs."""
    import numpy as np
    import pandas as pd

    from pyspark.sql import functions as F

    from oxi_diel_db_spark.operators.dedup import hamming_neardup_pairs
    from oxi_diel_db_spark.operators.multimodal import ahash64

    rng = np.random.RandomState(123)
    rows = []
    for g in range(20):
        img = rng.randint(0, 256, size=(16, 16, 3)).astype(np.uint8)
        near = img.copy()
        near[0, 0] = 255 - near[0, 0]  # flip one sampled cell hard
        rows.append((g * 2, int(ahash64(img))))
        rows.append((g * 2 + 1, int(ahash64(near))))
    hashed = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "ahash"])
    )
    pairs = hamming_neardup_pairs(
        hashed, hash_col="ahash", id_col="doc_id", max_hamming=3, bands=4
    ).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    planted = {(g * 2, g * 2 + 1) for g in range(20)}
    missing = {
        p for p in planted - found
        # only pairs genuinely within the radius are owed to us
        if bin((dict(rows)[p[0]] ^ dict(rows)[p[1]]) & ((1 << 64) - 1)).count("1") <= 3
    }
    assert not missing  # pigeonhole: nothing in-radius may be missed
    assert all(r["hamming"] <= 3 for r in pairs)


def test_audio_fingerprint_container_invariant_content_sensitive(spark):
    """Same samples at different sample rates → SAME fingerprint
    (container metadata must not leak into the signature); any sample
    change — one dropped, one perturbed — must separate."""
    import numpy as np

    from oxi_diel_db_spark.operators import multimodal as MM

    samples = (np.arange(1000, dtype=np.int64) * 37) % 4096 - 2048
    rows = [
        (1, MM.encode_wav(8000, samples)),
        (2, MM.encode_wav(16000, samples)),          # re-containered
        (3, MM.encode_wav(8000, samples[:-1])),      # one sample short
        (4, MM.encode_wav(8000, np.concatenate([samples[:500] + 40, samples[500:]]))),
    ]
    media = spark.createDataFrame(rows, "doc_id long, payload binary")
    fp = {r.doc_id: r.fp for r in MM.audio_fingerprint(media).collect()}
    assert fp[1] == fp[2]
    assert fp[3] != fp[1] and fp[4] != fp[1] and fp[3] != fp[4]


def test_audio_fixture_plants_byte_distinct_content_groups(spark):
    """The mm9 fixture must actually arm the trap: within a block the
    byte payloads DIFFER (sr varies) while fingerprints collide."""
    from oxi_diel_db_spark.operators import multimodal as MM

    docs = spark.createDataFrame([(i,) for i in range(32)], "doc_id long")
    media = MM.audio_content_fixture_table(docs, group=16)
    rows = {r.doc_id: bytes(r.payload) for r in media.collect()}
    assert rows[0] != rows[1]  # different fmt chunk → different bytes
    fps = {r.doc_id: r.fp for r in MM.audio_fingerprint(media).collect()}
    assert fps[0] == fps[1] == fps[15]
    assert fps[0] != fps[16] and fps[16] == fps[31]


def test_video_scene_signature_tail_invariant_content_sensitive(spark):
    """Freeze-frame tails of any length must not change the scene
    signature; changing ONE frame's content must. A desynchronized
    stream (truncated mid-frame) must be skipped, not mis-hashed."""
    import numpy as np

    from oxi_diel_db_spark.operators import multimodal as MM

    w, h = 16, 12
    def frame(k):
        px = (7 + np.arange(w * h * 3, dtype=np.int64) * (2 * k + 1)) % 256
        return MM.encode_ppm(w, h, px)

    base = [frame(0), frame(1), frame(2)]
    rows = [
        (1, b"".join(base)),
        (2, b"".join(base + [base[-1]] * 5)),      # long freeze tail
        (3, b"".join([base[0], base[0], base[1], base[2]])),  # held first shot
        (4, b"".join([frame(0), frame(3), frame(2)])),        # scene changed
        (5, b"".join(base)[:-7]),                  # truncated mid-frame
    ]
    media = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: (r.fp, r.n_frames, r.n_scenes)
           for r in MM.video_fingerprint(media).collect()}
    assert got[1][0] == got[2][0] == got[3][0]
    assert got[1][2] == got[2][2] == got[3][2] == 3
    assert got[2][1] == 8 and got[3][1] == 4
    assert got[4][0] != got[1][0]
    assert 5 not in got  # desynchronized stream skipped, not mis-hashed


def test_mm11_stft_matches_closed_form_signal(spark):
    """The STFT pipeline must reproduce features computed directly
    from the fixture's closed-form sawtooth DEFINITION (sample i =
    (seed+i) % 4096 - 2048), bypassing the WAV container entirely —
    so decode, framing, windowing, and fft are all on the hook: one
    dropped sample shifts every frame and the spectra diverge."""
    import numpy as np

    from oxi_diel_db_spark.queries import load_registry

    rows = {
        r["doc_id"]: r
        for r in load_registry()["mm11_spectrogram"]
        .build(spark, "/root/testdata/sf0.001")
        .collect()
    }
    assert rows
    frame, hop = 256, 128
    win = np.hanning(frame)
    for doc_id, r in list(rows.items())[:40]:
        i = int(doc_id)
        n = 256 + i % 2048
        sr = 8000 + (i % 5) * 2000
        v = ((i % 9973 + np.arange(n, dtype=np.int64)) % 4096 - 2048).astype(
            np.float64
        ) / 2048.0
        nf = 1 + (n - frame) // hop
        idx = np.arange(frame)[None, :] + hop * np.arange(nf)[:, None]
        spec = np.abs(np.fft.rfft(v[idx] * win, axis=1)) ** 2
        mean_spec = spec.mean(axis=0)
        freqs = np.fft.rfftfreq(frame, 1.0 / sr)
        assert r["sample_rate"] == sr and r["n_frames"] == nf
        assert abs(
            r["centroid_hz"] - (freqs * mean_spec).sum() / mean_spec.sum()
        ) < 1e-4
        for b, chunk in enumerate(np.array_split(mean_spec, 4)):
            assert abs(r[f"e_band{b}"] - np.log10(1.0 + chunk.sum())) < 1e-5, (
                doc_id,
                b,
            )


def test_dct_matrix_matches_direct_definition():
    """The matrix-form 2-D DCT-II (C @ L @ C.T) must equal the direct
    textbook double sum, orthonormal scaling included."""
    import numpy as np

    from oxi_diel_db_spark.operators.multimodal import _dct_matrix

    n = 8
    rng = np.random.RandomState(7)
    L = rng.rand(n, n)
    C = _dct_matrix(n)
    got = C @ L @ C.T
    want = np.zeros((n, n))
    for u in range(n):
        for v in range(n):
            au = np.sqrt(1.0 / n) if u == 0 else np.sqrt(2.0 / n)
            av = np.sqrt(1.0 / n) if v == 0 else np.sqrt(2.0 / n)
            s = 0.0
            for i in range(n):
                for j in range(n):
                    s += (
                        L[i, j]
                        * np.cos(np.pi * (2 * i + 1) * u / (2 * n))
                        * np.cos(np.pi * (2 * j + 1) * v / (2 * n))
                    )
            want[u, v] = au * av * s
    assert np.allclose(got, want, atol=1e-12)


def test_phash_high_frequency_noise_and_discrimination():
    """The property that earns pHash its slot next to aHash: on an
    image with REAL low-frequency structure (random amplitudes on the
    8x8 low-freq DCT basis — the content class photos live in), a
    +/-8 checkerboard (pure highest-frequency energy) leaves the DCT
    low-frequency bit pattern intact; unrelated random images stay
    far apart. (On flat/structureless images the 63 AC coefficients
    sit near the median and the bits are noise — the documented
    degenerate case of every median-threshold spectral hash, which is
    why the property is asserted on structured content.)"""
    import numpy as np

    from oxi_diel_db_spark.operators.multimodal import _dct_matrix, phash64

    rng = np.random.RandomState(11)
    n = 32
    C = _dct_matrix(n)
    A = np.zeros((n, n))
    A[:8, :8] = rng.uniform(50, 100, (8, 8)) * rng.choice([-1, 1], (8, 8))
    img = C.T @ A @ C
    img = (img - img.min()) / (img.max() - img.min()) * 200 + 20
    noise = 8.0 * ((-1.0) ** (np.add.outer(np.arange(n), np.arange(n))))
    to_rgb = lambda g: np.clip(  # noqa: E731
        np.repeat(g[:, :, None], 3, 2), 0, 255
    ).astype(np.uint8)

    def ham(a, b):
        return bin((a ^ b) & (2**64 - 1)).count("1")

    assert ham(phash64(to_rgb(img)), phash64(to_rgb(img + noise))) == 0
    a = rng.randint(0, 256, (16, 24, 3)).astype(np.uint8)
    b = rng.randint(0, 256, (16, 24, 3)).astype(np.uint8)
    assert ham(phash64(a), phash64(b)) >= 16


def test_phash_cross_format_parity():
    """PPM and BMP containers of the SAME pixels must hash identically
    (BGR swap + bottom-up rows + padding all undone by the decoder;
    the BMP file order is pre-arranged bottom-up BGR exactly like the
    mm8/mm12 fixture does)."""
    import numpy as np

    from oxi_diel_db_spark.operators.multimodal import (
        decode_media,
        encode_bmp,
        encode_ppm,
        phash64,
    )

    rng = np.random.RandomState(3)
    w, h = 20, 12
    img = rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8)
    ppm = decode_media(encode_ppm(w, h, img.reshape(-1)), want_array=True)
    bmp = decode_media(
        encode_bmp(w, h, img[::-1, :, ::-1].reshape(-1)), want_array=True
    )
    assert phash64(ppm["array"]) == phash64(bmp["array"])


def test_shot_boundaries_jitter_vs_cut_margins():
    """The detector's threshold must sit with wide margin between the
    within-shot jitter delta (~2 luma units incl. wrap pixels) and the
    cross-shot content delta (~85): assert both sides numerically so a
    fixture or luma change that erodes the margin fails loudly."""
    import numpy as np

    from oxi_diel_db_spark.operators.multimodal import decode_ppm_stream

    # rebuild one doc's stream exactly like the fixture (doc_id=2 → 4 shots)
    i, group, w, h = 2, 16, 16, 12
    frames_bytes = []
    from oxi_diel_db_spark.operators.multimodal import encode_ppm

    for s in range(2 + i % 3):
        seed = ((i // group) * 131 + s * 7919) % 9973
        base = (seed + np.arange(w * h * 3, dtype=np.int64) * (2 * s + 1)) % 256
        for f in range(3):
            frames_bytes.append(encode_ppm(w, h, (base + f) % 256))
    frames = decode_ppm_stream(b"".join(frames_bytes))
    lumas = [
        0.299 * fr[:, :, 0].astype(np.float64)
        + 0.587 * fr[:, :, 1].astype(np.float64)
        + 0.114 * fr[:, :, 2].astype(np.float64)
        for fr in frames
    ]
    deltas = [
        float(np.mean(np.abs(lumas[k + 1] - lumas[k])))
        for k in range(len(lumas) - 1)
    ]
    within = [d for k, d in enumerate(deltas) if (k + 1) % 3 != 0]
    across = [d for k, d in enumerate(deltas) if (k + 1) % 3 == 0]
    assert max(within) < 4.0, within     # jitter stays far under 8
    assert min(across) > 20.0, across    # cuts stay far over 8


def test_payload_integrity_classifies_planted_damage(spark):
    """Operator-level matrix for dq18's classifier: intact PPM/BMP,
    header-surviving truncation of each, corrupted magic, and a
    sub-header stub — every class by REAL byte inspection."""
    import numpy as np

    from oxi_diel_db_spark.operators.multimodal import (
        encode_bmp,
        encode_ppm,
        payload_integrity,
    )

    px = np.arange(8 * 8 * 3, dtype=np.int64) % 256
    ppm = encode_ppm(8, 8, px)
    bmp = encode_bmp(8, 8, px)
    rows = [
        (1, bytearray(ppm)),
        (2, bytearray(bmp)),
        (3, bytearray(ppm[: int(len(ppm) * 0.6)])),   # truncated, header ok
        (4, bytearray(bmp[: int(len(bmp) * 0.6)])),   # truncated, header ok
        (5, bytearray(b"XX" + ppm[2:])),              # magic damage
        (6, bytearray(b"BM\x01")),                    # sub-header stub
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, payload binary")
    out = {r["doc_id"]: r for r in payload_integrity(df).collect()}
    assert out[1]["verdict"] == "valid_ppm"
    assert out[2]["verdict"] == "valid_bmp"
    assert out[3]["verdict"] == "truncated"
    assert out[4]["verdict"] == "truncated"
    assert out[5]["verdict"] == "unknown_magic"
    assert out[6]["verdict"] == "malformed_header"
    # declared sizes are the containers' own numbers
    assert out[1]["declared_bytes"] == len(ppm)
    assert out[2]["declared_bytes"] == len(bmp)
    assert out[3]["declared_bytes"] == len(ppm)  # truncation doesn't change the claim


def test_dq18_clean_corpus_reports_no_quarantine(spark):
    """Null case: with no planted damage every payload is valid and
    the verdict mix is exactly the fixture's container parity."""
    import pyspark.sql.functions as F

    from oxi_diel_db_spark.operators.multimodal import (
        neardup_fixture_table,
        payload_integrity,
    )
    from oxi_diel_db_spark.tables import load

    docs = load(spark, "documents", "/root/testdata/sf0.001").select("doc_id")
    out = payload_integrity(neardup_fixture_table(docs))
    verdicts = {r["verdict"] for r in out.select("verdict").distinct().collect()}
    assert verdicts == {"valid_ppm", "valid_bmp"}
    n_ppm = out.filter(F.col("verdict") == "valid_ppm").count()
    want = docs.filter((F.col("doc_id") / 40).cast("int") % 2 == 0).count()
    assert n_ppm == want


# ---- mm15: content-defined chunking dedup (r11 birth) ---------------------


def test_mm15_cdc_realigns_where_fixed_offset_misses(spark, tmp_path):
    """The planted shifted-duplicate pair: doc 11's payload is doc
    10's entire payload behind a 5-byte filler. CDC boundaries are
    content-local, so the two docs share every chunk past the first
    boundary; fixed-offset chunking at ANY block size the shift does
    not divide shares ZERO chunks. Also pins the tiling invariant
    (chunk lengths sum to the payload) and boundary content-locality
    (every boundary position's window hash is 0 mod 64)."""
    import hashlib

    import numpy as np

    from oxi_diel_db_spark.operators.multimodal import (
        CDC_MOD,
        CDC_POW,
        CDC_WINDOW,
        cdc_chunk_list,
        cdc_chunks,
        cdc_fixture_table,
    )
    from oxi_diel_db_spark.queries.llm_ops import mm15_cdc_chunk_dedup

    pdf = spark.createDataFrame(
        [(i, "x", "en", "t", 1) for i in (10, 11, 42)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf = str(tmp_path / "sf")
    pdf.write.parquet(sf + "/documents.parquet")

    media = {
        r["doc_id"]: bytes(r["payload"])
        for r in cdc_fixture_table(
            spark.createDataFrame([(10,), (11,), (42,)], "doc_id long")
        ).collect()
    }
    # planted shift: doc 11 = 5 filler bytes + doc 10's payload
    assert media[11][5:] == media[10]
    assert len(media[11]) == len(media[10]) + 5

    chunks = {
        d: cdc_chunk_list(np.frombuffer(media[d], dtype=np.uint8))
        for d in media
    }
    for d, cl in chunks.items():
        b = np.frombuffer(media[d], dtype=np.uint8).astype(np.int64)
        # tiling: offsets contiguous, lengths sum to the payload
        assert cl[0][1] == 1 and sum(c[2] for c in cl) == len(b)
        # content-locality: every non-final boundary's window hash
        # is 0 mod CDC_MOD
        pows = CDC_POW ** np.arange(CDC_WINDOW, dtype=np.int64)
        for _, s, ln, _h in cl[:-1]:
            e = s + ln - 1  # 1-indexed end
            w = b[e - CDC_WINDOW : e]
            assert int(w @ pows[::-1]) % CDC_MOD == 0

    # CDC: docs 10 and 11 share all but the first (shift-polluted) chunk
    h10 = {c[3] for c in chunks[10]}
    h11 = {c[3] for c in chunks[11]}
    shared = h10 & h11
    assert len(shared) >= len(h10) - 1
    assert not (h10 & {c[3] for c in chunks[42]})

    # fixed-offset chunking at several block sizes: ZERO shared chunks
    # (the 5-byte shift divides none of them)
    for block in (64, 100, 128):
        fx = {
            d: {
                hashlib.md5(media[d][o : o + block]).hexdigest()
                for o in range(0, len(media[d]), block)
            }
            for d in (10, 11)
        }
        assert not (fx[10] & fx[11]), block

    # registered accounting over the 3-doc corpus: the pair is ~all-dup,
    # the loner clean
    out = {
        r["doc_id"]: r.asDict() for r in mm15_cdc_chunk_dedup(spark, sf).collect()
    }
    assert out[42]["n_dup_chunks"] == 0 and out[42]["dup_ratio"] < 1e-6
    assert out[10]["dup_ratio"] > 0.9 and out[11]["dup_ratio"] > 0.9
    assert out[10]["n_bytes"] == len(media[10])

    # distributed chunker agrees with the local kernel
    dist = cdc_chunks(cdc_fixture_table(
        spark.createDataFrame([(10,)], "doc_id long")
    )).collect()
    assert [(r["chunk_idx"], r["c_off"], r["c_len"], r["chash"]) for r in
            sorted(dist, key=lambda r: r["chunk_idx"])] == chunks[10]
