"""Property-based layer (SURVEY.md §5.2 layer 3).

Spark-side properties run as ONE job over a batch of seeded-random
cases (per-example Spark jobs would be 100× slower); pure-Python
pieces (POSCAR parser) use hypothesis directly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from oxi_diel_db_spark.functions import arrays as A
from oxi_diel_db_spark.functions.composition import ATOMIC_MASS
from oxi_diel_db_spark.functions.formula import formula_canonical, parse_formula

RNG = np.random.RandomState(42)


def test_eigvals_random_tensors(spark):
    """tensor_eigvals == numpy eigvals for 200 random (near-symmetric
    and asymmetric) 3×3 tensors."""
    tensors = []
    for i in range(200):
        t = RNG.randn(3, 3) * 5
        if i % 2 == 0:
            t = (t + t.T) / 2  # symmetric half
        tensors.append(t.tolist())
    df = spark.createDataFrame(
        pd.DataFrame({"i": range(200), "t": tensors}),
        "i long, t array<array<double>>",
    )
    got = {r["i"]: r["e"] for r in df.select("i", A.tensor_eigvals("t").alias("e")).collect()}
    for i, t in enumerate(tensors):
        exp = np.sort(np.real(np.linalg.eigvals(np.array(t))))
        assert np.allclose(got[i], exp, atol=1e-9), i


def test_array_mean_equals_explode_avg(spark):
    """A1 equivalence: higher-order array_mean == explode + AVG."""
    arrays = [list(RNG.randn(RNG.randint(1, 30))) for _ in range(100)]
    df = spark.createDataFrame(
        pd.DataFrame({"i": range(100), "a": arrays}), "i long, a array<double>"
    )
    hof = {r["i"]: r["m"] for r in df.select("i", A.array_mean(F.col("a")).alias("m")).collect()}
    exploded = (
        df.select("i", F.explode("a").alias("x"))
        .groupBy("i")
        .agg(F.avg("x").alias("m"))
    )
    agg = {r["i"]: r["m"] for r in exploded.collect()}
    for i in hof:
        assert abs(hof[i] - agg[i]) < 1e-9


def test_stddev_pop_is_numpy_std(spark):
    """ddof warning (SURVEY §2.11): engine stddev_pop == np.std (ddof=0),
    and != sample std, for random groups."""
    vals = RNG.randn(500) * 10
    groups = RNG.randint(0, 7, 500)
    df = spark.createDataFrame(
        pd.DataFrame({"g": groups, "v": vals}), "g int, v double"
    )
    got = {r["g"]: r["s"] for r in df.groupBy("g").agg(F.stddev_pop("v").alias("s")).collect()}
    for g in np.unique(groups):
        expected = np.std(vals[groups == g])  # ddof=0, like the reference
        assert abs(got[int(g)] - expected) < 1e-9


@st.composite
def compositions(draw):
    els = draw(
        st.lists(
            st.sampled_from(sorted(ATOMIC_MASS)), min_size=1, max_size=5, unique=True
        )
    )
    counts = draw(
        st.lists(
            st.integers(min_value=1, max_value=40),
            min_size=len(els),
            max_size=len(els),
        )
    )
    return dict(zip(els, counts))


@settings(max_examples=30, deadline=None)
@given(compositions())
def test_parse_formula_roundtrip_python(comp):
    """Formula grammar round-trip: build a formula string, parse it with
    the SAME regex grammar the Column functions compile to, recover the
    composition exactly. (Pure-python mirror of parse_formula; the
    Column variant is pinned by test_parse_formula_map + m09's oracle.)"""
    import re

    formula = "".join(f"{el}{c if c != 1 else ''}" for el, c in comp.items())
    toks = re.findall(r"[A-Z][a-z]?[0-9.]*", formula)
    parsed = {}
    for tok in toks:
        el = re.match(r"[A-Z][a-z]?", tok).group(0)
        num = tok[len(el):]
        parsed[el] = parsed.get(el, 0) + (float(num) if num else 1.0)
    assert parsed == {k: float(v) for k, v in comp.items()}


def test_parse_formula_spark_batch(spark):
    """The Column-level parse agrees with the python mirror on 50 random
    compositions (one Spark job)."""
    comps = []
    for _ in range(50):
        els = RNG.choice(sorted(ATOMIC_MASS), size=RNG.randint(1, 5), replace=False)
        comps.append({el: int(RNG.randint(1, 30)) for el in els})
    formulas = [
        "".join(f"{el}{c if c != 1 else ''}" for el, c in comp.items())
        for comp in comps
    ]
    df = spark.createDataFrame([(i, f) for i, f in enumerate(formulas)], "i long, formula string")
    got = {r["i"]: r["m"] for r in df.select("i", parse_formula("formula").alias("m")).collect()}
    for i, comp in enumerate(comps):
        assert got[i] == {k: float(v) for k, v in comp.items()}


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["Si", "O", "Ca", "Ti"]),
            st.floats(min_value=0.0, max_value=0.99, allow_nan=False),
            st.floats(min_value=0.0, max_value=0.99, allow_nan=False),
            st.floats(min_value=0.0, max_value=0.99, allow_nan=False),
        ),
        min_size=1,
        max_size=8,
    )
)
def test_poscar_parser_roundtrip(sites):
    """parse_poscar_text recovers elements and fractional coords for
    arbitrary direct-coordinate POSCARs."""
    from oxi_diel_db_spark.sources.poscar import parse_poscar_text

    by_el: dict[str, list] = {}
    for el, a, b, c in sites:
        by_el.setdefault(el, []).append((a, b, c))
    lines = ["gen", "1.0", "6 0 0", "0 6 0", "0 0 6"]
    lines.append(" ".join(by_el))
    lines.append(" ".join(str(len(v)) for v in by_el.values()))
    lines.append("Direct")
    for coords in by_el.values():
        for a, b, c in coords:
            lines.append(f"{a!r} {b!r} {c!r}")
    pdf = parse_poscar_text("\n".join(lines))
    assert len(pdf) == len(sites)
    k = 0
    for el, coords in by_el.items():
        for a, b, c in coords:
            row = pdf.iloc[k]
            assert row["element"] == el
            assert abs(row["frac_a"] - a) < 1e-9
            assert abs(row["cart_x"] - 6 * a) < 1e-8
            k += 1


@given(
    w=st.integers(min_value=1, max_value=24),
    h=st.integers(min_value=1, max_value=24),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=40, deadline=None)
def test_image_codec_roundtrip_property(w, h, seed):
    """encode->decode is the identity for both image containers, for
    ANY dimensions (odd widths exercise BMP row padding) and any
    payload: dims, channel count, exact mean, and the full pixel array
    must survive. BMP's bottom-up BGR file order must be undone by the
    decoder's want_array path."""
    import numpy as np

    from oxi_diel_db_spark.operators import multimodal as MM

    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=w * h * 3, dtype=np.int64)
    for enc in (MM.encode_ppm, MM.encode_bmp):
        d = MM.decode_media(enc(w, h, px), want_array=True)
        assert (d["width"], d["height"], d["channels"]) == (w, h, 3)
        assert d["n_values"] == w * h * 3
        assert d["mean_value"] == px.mean()
        if enc is MM.encode_ppm:
            assert (d["array"].reshape(-1) == px).all()
        else:
            # encode_bmp writes the byte sequence in FILE order; the
            # decoder must undo bottom-up rows and BGR channels exactly
            assert (d["array"] == px.reshape(h, w, 3)[::-1, :, ::-1]).all()


@given(
    n=st.integers(min_value=1, max_value=3000),
    sr=st.sampled_from([8000, 16000, 44100]),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=40, deadline=None)
def test_wav_codec_roundtrip_property(n, sr, seed):
    import numpy as np

    from oxi_diel_db_spark.operators import multimodal as MM

    rng = np.random.default_rng(seed)
    samples = rng.integers(-32768, 32768, size=n, dtype=np.int64)
    d = MM.decode_media(MM.encode_wav(sr, samples), want_array=True)
    assert (d["sample_rate"], d["channels"], d["n_values"]) == (sr, 1, n)
    assert (d["array"] == samples).all()
    assert d["mean_value"] == samples.mean()


# ---------------------------------------------------------------- aHash laws


@given(
    w=st.integers(8, 24),
    h=st.integers(8, 24),
    seed=st.integers(0, 10_000),
    shift=st.integers(1, 40),
)
@settings(max_examples=30, deadline=None)
def test_ahash_brightness_invariant(w, h, seed, shift):
    """Adding a constant to every pixel (global brightness) shifts the
    luma and its mean equally, so the threshold pattern — and the hash
    — is unchanged (as long as nothing clips). The defining perceptual
    property: a checksum would change."""
    from oxi_diel_db_spark.operators.multimodal import ahash64

    img = np.random.RandomState(seed).randint(40, 200, size=(h, w, 3)).astype(np.uint8)
    brighter = (img.astype(np.int32) + shift).clip(0, 255).astype(np.uint8)
    assert (brighter > img).any()  # really shifted
    assert ahash64(img) == ahash64(brighter)


@given(w=st.integers(8, 24), h=st.integers(8, 24), seed=st.integers(0, 10_000))
@settings(max_examples=30, deadline=None)
def test_ahash_codec_independence(w, h, seed):
    """Any image must hash identically through the PPM and BMP codecs
    (encode → decode → hash), whatever the dims — the property the mm8
    fixture samples at 40 planted groups."""
    from oxi_diel_db_spark.operators.multimodal import (
        ahash64,
        decode_media,
        encode_bmp,
        encode_ppm,
    )

    img = np.random.RandomState(seed).randint(0, 256, size=(h, w, 3)).astype(np.uint8)
    via_ppm = decode_media(encode_ppm(w, h, img.reshape(-1)), want_array=True)["array"]
    via_bmp = decode_media(
        encode_bmp(w, h, img[::-1, :, ::-1].reshape(-1)), want_array=True
    )["array"]
    assert ahash64(via_ppm) == ahash64(via_bmp) == ahash64(img)


# ------------------------------------------------------------------ PSI laws


@given(
    ref=st.lists(st.integers(0, 5000), min_size=10, max_size=10),
    cur=st.lists(st.integers(0, 5000), min_size=10, max_size=10),
)
@settings(max_examples=50, deadline=None)
def test_psi_nonnegative_and_zero_iff_equal(ref, cur):
    """The smoothed PSI is a sum of (p-q)·ln(p/q) terms, each ≥ 0
    (same sign factors), zero exactly when the smoothed distributions
    coincide — for ANY bin counts including empty bins (the Laplace
    floor keeps every term finite)."""
    import math

    t_ref, t_cur = sum(ref) + 10, sum(cur) + 10
    terms = [
        ((r + 1) / t_ref - (c + 1) / t_cur)
        * math.log(((r + 1) / t_ref) / ((c + 1) / t_cur))
        for r, c in zip(ref, cur)
    ]
    assert all(x >= 0 and math.isfinite(x) for x in terms)
    if ref == cur:
        assert sum(terms) < 1e-12


# -------------------------------------------------- temperature-sampling laws


@given(
    counts=st.lists(st.integers(1, 10_000), min_size=2, max_size=12),
    alpha=st.floats(0.1, 1.0),
)
@settings(max_examples=50, deadline=None)
def test_temperature_rates_laws(counts, alpha):
    """(p/p_min)^(α−1): the rarest stratum always keeps everything,
    rates are antitone in population (bigger strata never keep a
    HIGHER rate), all rates in (0, 1], and α=1 is a no-op (uniform
    rate 1 — no rebalancing)."""
    m = min(counts)
    rates = [(c / m) ** (alpha - 1.0) for c in counts]
    assert all(0 < r <= 1.0 + 1e-12 for r in rates)
    assert rates[counts.index(m)] == pytest.approx(1.0)
    for (ca, ra), (cb, rb) in zip(
        sorted(zip(counts, rates)), sorted(zip(counts, rates))[1:]
    ):
        assert ra >= rb - 1e-12  # antitone
    if alpha == 1.0:
        assert all(r == pytest.approx(1.0) for r in rates)
