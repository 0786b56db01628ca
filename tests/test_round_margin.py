"""Rounding-boundary margin audit for the r11 oracle upgrades.

mm11 and ml16 gate on ROUND(x, 6) + 0 with NO epsilon nudge, relying
on the gated values sitting far from every 6-dp rounding boundary
relative to the cross-engine FP disagreement. The r11 ADVICE flagged
that reliance as unmeasured at scale: a corpus rescale could park a
value within the FP-error band of a boundary and flip the hash gate.

This module IS the measurement (r12): at the GATE scale factor
(sf0.01 — the driver's correctness gate), every value the oracle
rounds is recomputed from its closed form, its distance to the
nearest 6-dp boundary is measured, and the minimum margin is asserted
against the measured cross-path disagreement with orders-of-magnitude
headroom. Re-run (and re-measure: see the module-level constants) if
either gate ever moves to a different sf. No Spark session needed —
both closed forms are replayed in numpy / DuckDB.

Measured at registration (sf0.01, 2026-08-16):
  mm11 — 830 values (166 docs x 5 cols): min boundary margin
         9.03e-10; max |naive-DFT - pocketfft| delta 1.6e-14;
         min margin/delta ratio 8.1e4.
  ml16 — 494 fit values: min boundary margin 4.05e-8 (and the
         rounding INPUTS are bit-identical across engines by
         construction — exact integer-sum ratios — so the margin
         only needs to clear ROUND-implementation disagreement).
"""

from __future__ import annotations

import numpy as np

GATE_SF = "/root/testdata/sf0.01"

_TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _boundary_margin(x: np.ndarray) -> np.ndarray:
    """Distance (value domain) to the nearest 6-dp rounding boundary
    (boundaries sit at the .5 fractions of x * 1e6)."""
    s = np.asarray(x, dtype=np.float64) * 1e6
    return np.abs(s - np.floor(s) - 0.5) / 1e6


def test_mm11_margins_dominate_fft_disagreement():
    """Every mm11 gated value must sit ≥1000x farther from its 6-dp
    boundary than the measured naive-DFT-vs-pocketfft disagreement for
    that same value (measured headroom at registration: 8.1e4x)."""
    import duckdb

    ids = [
        r[0]
        for r in duckdb.sql(
            "SELECT doc_id FROM read_parquet("
            f"'{GATE_SF}/documents.parquet') WHERE doc_id % 3 = 2"
        ).fetchall()
    ]
    assert len(ids) > 100  # the sf0.01 gate population
    frame, hop = 256, 128
    win = np.hanning(frame)
    k = np.arange(129)
    s = np.arange(256)
    # the oracle's tw CTE verbatim: cos/sin twiddle + Hann table
    C = np.cos(2 * np.pi * np.outer(k, s) / 256.0)
    S = np.sin(2 * np.pi * np.outer(k, s) / 256.0)
    margins, deltas = [], []
    for i in ids:
        n = 256 + i % 2048
        sr = 8000 + (i % 5) * 2000
        v = (
            (i % 9973 + np.arange(n, dtype=np.int64)) % 4096 - 2048
        ).astype(np.float64) / 2048.0
        nf = 1 + (n - frame) // hop
        idx = np.arange(frame)[None, :] + hop * np.arange(nf)[:, None]
        fr = v[idx] * win
        spec_f = np.abs(np.fft.rfft(fr, axis=1)) ** 2  # Spark's path
        re = fr @ C.T  # DuckDB's naive-DFT path (error-scale twin)
        im = fr @ S.T
        spec_n = re * re + im * im
        freqs = np.fft.rfftfreq(frame, 1.0 / sr)

        def _features(mean_spec: np.ndarray) -> np.ndarray:
            vals = [(freqs * mean_spec).sum() / mean_spec.sum()]
            for chunk in np.array_split(mean_spec, 4):
                vals.append(np.log10(1.0 + chunk.sum()))
            return np.array(vals)

        fft_vals = _features(spec_f.mean(0))
        naive_vals = _features(spec_n.mean(0))
        margins.extend(_boundary_margin(fft_vals))
        deltas.extend(np.abs(fft_vals - naive_vals))
    margins = np.array(margins)
    deltas = np.array(deltas)
    assert len(margins) == 5 * len(ids)
    # absolute floors (regression pins for the fixed fixture)
    assert margins.min() > 5e-10, margins.min()
    assert deltas.max() < 1e-13, deltas.max()
    # the headroom assertion the ADVICE asked for: per-value margin
    # must dominate per-value cross-path error by ≥3 orders
    ratio = margins / np.maximum(deltas, 1e-300)
    assert ratio.min() > 1e3, ratio.min()


def test_ml16_margins_clear_round_boundary():
    """Every ml16 fit value (the oracle's own closed form, rounding
    stripped) must sit ≥1e-8 from its 6-dp boundary — the inputs to
    ROUND are bit-identical across engines (exact integer-sum
    ratios), so this is the whole residual risk."""
    import duckdb

    from oxi_diel_db_spark.queries import load_registry

    sql = load_registry()["ml16_isotonic_calibration"].oracle
    assert "ROUND(fit.f, 6) + 0 AS calibrated" in sql  # oracle shape pin
    raw = sql.replace("ROUND(fit.f, 6) + 0 AS calibrated", "fit.f AS calibrated")
    con = duckdb.connect()
    for t in _TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{GATE_SF}/{t}.parquet')"
        )
    vals = np.array([r[1] for r in con.sql(raw).fetchall()])
    assert len(vals) > 400  # the sf0.01 distinct-score population
    assert _boundary_margin(vals).min() > 1e-8
