"""Aggregate semantics that the oracle can't check directly."""

from __future__ import annotations

from pyspark.sql import functions as F

from oxi_diel_db_spark.queries import load_registry
from oxi_diel_db_spark.tables import load

SF = "/root/testdata/sf0.01"


def test_approx_distinct_within_5pct(spark):
    """q21 (A9): HLL++ at rsd=0.01 must land within ±5% of exact."""
    reg = load_registry()
    approx = {
        r["l_returnflag"]: (r["approx_parts"], r["approx_supps"])
        for r in reg["q21_approx_distinct"].build(spark, SF).collect()
    }
    l = load(spark, "lineitem", SF)
    exact = {
        r["l_returnflag"]: (r["p"], r["s"])
        for r in l.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("p"),
            F.countDistinct("l_suppkey").alias("s"),
        )
        .collect()
    }
    for k, (ap, asup) in approx.items():
        ep, es = exact[k]
        assert abs(ap - ep) / ep < 0.05, (k, ap, ep)
        assert abs(asup - es) / es < 0.05, (k, asup, es)


def test_grouping_flag_distinguishes_subtotals(spark):
    """q22 (A10): GROUPING() must be 1 exactly on subtotal rows."""
    reg = load_registry()
    rows = reg["q22_rollup"].build(spark, SF).collect()
    grand = [r for r in rows if r["g_status"] == 1 and r["g_priority"] == 1]
    assert len(grand) == 1
    assert grand[0]["n"] == load(spark, "orders", SF).count()
    # subtotal layer: one row per status
    subs = [r for r in rows if r["g_status"] == 0 and r["g_priority"] == 1]
    statuses = {r["o_orderstatus"] for r in subs}
    assert len(subs) == len(statuses) == 3


def test_hll_mergeable_union_within_5pct(spark):
    """q71: quarterly estimates from UNIONed monthly sketches must land
    within ±5% of the exact quarterly distinct count — merging
    pre-aggregated sketches must not degrade accuracy beyond the
    sketch's own error."""
    reg = load_registry()
    approx = {
        (r["y"], r["q"]): r["approx_custs"]
        for r in reg["q71_hll_mergeable"].build(spark, SF).collect()
    }
    o = load(spark, "orders", SF)
    exact = {
        (r["y"], r["q"]): r["n"]
        for r in o.groupBy(
            F.year("o_orderdate").alias("y"),
            (((F.month("o_orderdate") - 1) / 3).cast("int") + 1).alias("q"),
        )
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    assert approx.keys() == exact.keys()
    for k, est in approx.items():
        assert abs(est - exact[k]) <= 0.05 * exact[k], (k, est, exact[k])


def test_gap_fill_locf_and_interp_hand_computed(spark):
    """key a: obs at idx 1 (10.0) and 4 (40.0) -> gaps 2,3 interpolate
    to 20/30 and locf to 10; leading/trailing edges fall back to the
    nearest observation. Key b pins the spine to [1,6]."""
    from oxi_diel_db_spark.operators.timeseries import gap_fill

    series = spark.createDataFrame(
        [("a", 1, 10.0), ("a", 4, 40.0), ("b", 2, 5.0), ("b", 6, 9.0)],
        "k string, i int, v double",
    )
    rows = {
        (r["k"], r["i"]): (r["v"], r["locf"], r["interp"])
        for r in gap_fill(series, "k", "i", "v").collect()
    }
    assert len(rows) == 12  # 2 keys x idx 1..6
    assert rows[("a", 2)] == (None, 10.0, 20.0)
    assert rows[("a", 3)] == (None, 10.0, 30.0)
    assert rows[("a", 4)] == (40.0, 40.0, 40.0)
    assert rows[("a", 5)] == (None, 40.0, 40.0)   # trailing -> locf/nearest
    assert rows[("b", 1)] == (None, None, 5.0)    # leading -> next obs
    assert rows[("b", 4)] == (None, 5.0, 7.0)


def test_q74_approx_percentiles_close_to_exact(spark, sf_dir):
    from oxi_diel_db_spark.queries import load_registry

    reg = load_registry()
    approx = {
        r["o_orderstatus"]: (r["p25"], r["p50"], r["p75"])
        for r in reg["q74_approx_percentiles"].build(spark, sf_dir).collect()
    }
    exact = {
        r["o_orderstatus"]: (r["p25"], r["p50"], r["p75"])
        for r in reg["q26_percentiles"].build(spark, sf_dir).collect()
    }
    assert approx.keys() == exact.keys()
    for k in exact:
        for a, e in zip(approx[k], exact[k]):
            # GK at accuracy 10k on sf0.001 is near-exact; exact values
            # are interpolated, approx are data points -> small gap
            assert abs(a - e) <= 0.05 * abs(e) + 1e-9, (k, a, e)


def test_q75_approx_ntile_agrees_with_exact(spark, sf_dir):
    import pyspark.sql.functions as F
    from pyspark.sql import Window as W

    from oxi_diel_db_spark.queries import load_registry

    got = {
        r["c_custkey"]: r["decile"]
        for r in load_registry()["q75_approx_ntile"].build(spark, sf_dir).collect()
    }
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    exact = {
        r["c_custkey"]: r["d"]
        for r in c.select(
            "c_custkey",
            F.ntile(10).over(W.orderBy("c_acctbal", "c_custkey")).alias("d"),
        ).collect()
    }
    assert got.keys() == exact.keys()
    # boundary rows may land one bucket off (sketch error + tie handling);
    # bulk agreement is the contract
    agree = sum(1 for k in got if got[k] == exact[k])
    off_by_one = sum(1 for k in got if abs(got[k] - exact[k]) <= 1)
    assert agree / len(got) > 0.9, agree / len(got)
    assert off_by_one == len(got)


def test_ohlc_open_close_tie_break(spark):
    """min_by/max_by with a (ts, event_id) struct key: equal timestamps
    resolve by event_id, so open/close are deterministic even when the
    bar's extreme ts is shared."""
    from pyspark.sql import functions as F

    e = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", 5.0),
            (2, "2024-01-01 00:00:00", 7.0),  # same ts, higher id
            (3, "2024-01-01 00:30:00", 6.0),
        ],
        "event_id long, ts string, value double",
    ).select("event_id", F.col("ts").cast("timestamp").alias("ts"), "value")
    key = F.struct("ts", "event_id")
    row = (
        e.groupBy(F.date_trunc("hour", "ts").alias("h"))
        .agg(F.min_by("value", key).alias("open"), F.max_by("value", key).alias("close"))
        .collect()[0]
    )
    assert row["open"] == 5.0  # event_id 1 wins the ts tie
    assert row["close"] == 6.0


def test_gk_exactness_regime_boundary(spark):
    """The r12 q74/q75 gate upgrade rests on a regime claim: at
    accuracy = _GK_EXACT_ACC the GK summary's delta bound floor(2·ε·n)
    is 0, so percentile_approx returns EXACT lower order statistics —
    and at the old accuracy 1e4 it genuinely compresses (the sketch is
    approximating, not idling). Pin both halves on synthetic data with
    DISTINCT values (any rank slip must change the value), at an even
    and an odd n to pin the rank convention."""
    import pyspark.sql.functions as F

    from oxi_diel_db_spark.queries.aggregates import _GK_EXACT_ACC

    for n in (20000, 20001):
        # distinct, shuffled-ish values: v = (i * 7919) % n is a
        # permutation of 0..n-1 when gcd(7919, n) = 1
        assert 7919 % 7 != 0 and n % 7919 != 0
        df = spark.range(n).select(
            ((F.col("id") * 7919) % n).cast("double").alias("v")
        )
        ps = [0.1, 0.25, 0.5, 0.75, 0.9]
        exact_regime = df.agg(
            F.percentile_approx(
                "v", F.array(*[F.lit(p) for p in ps]), F.lit(_GK_EXACT_ACC)
            ).alias("qs")
        ).collect()[0]["qs"]
        # lower order statistic: smallest v with CDF >= p over 0..n-1
        import math

        want = [float(math.ceil(p * n) - 1) for p in ps]
        assert exact_regime == want, (n, exact_regime, want)
        compressed = df.agg(
            F.percentile_approx(
                "v", F.array(*[F.lit(p) for p in ps]), F.lit(10000)
            ).alias("qs")
        ).collect()[0]["qs"]
        # the compressed sketch must differ somewhere (it really
        # approximates at 2·ε·n = 4) while staying within ε·n ranks
        assert compressed != want, "accuracy 1e4 unexpectedly exact"
        for c, w, p in zip(compressed, want, ps):
            assert abs(c - w) <= n / 10000 + 1, (n, p, c, w)


def test_gk_exactness_onset_at_predicted_boundary(spark):
    """r12 verdict Next #2: MEASURE the compression onset, don't just
    claim it. The q74/q75 hash gates rest on floor(2·ε·n) = 0, i.e.
    n < accuracy/2. Sweep n across that boundary at accuracy 1e5
    (ε = 1e-5, boundary 50k — the regime the r12 sf1 measurement saw
    diverge) over DISTINCT permuted values (any rank slip must change
    the value) and pin both directions:

    * every n below accuracy/2 is bit-identical to the exact lower
      order statistic (the bound is sufficient), and
    * an onset exists at or shortly above accuracy/2 (the bound is
      tight in practice, not just an upper bound — the sketch really
      compresses once permitted).

    The measured onset is the honesty artifact behind
    _GK_MAX_CERTIFIED_SF: sf3's max group (1,505,670) < 5M = 1e7/2,
    a future sf10 lands right at the 1e7 boundary and must re-run
    this measurement at that scale before hash-gating."""
    import math

    import pyspark.sql.functions as F

    acc = 100_000
    limit = acc // 2  # 50_000
    ps = [0.1, 0.25, 0.5, 0.75, 0.9]

    def approx_vs_exact(n: int) -> bool:
        """True iff percentile_approx at accuracy=acc is bit-identical
        to the exact lower order statistic on n distinct values."""
        # v = (i * 7919) % n permutes 0..n-1 when gcd(7919, n) = 1
        assert math.gcd(7919, n) == 1
        df = spark.range(n).select(
            ((F.col("id") * 7919) % n).cast("double").alias("v")
        )
        got = df.agg(
            F.percentile_approx(
                "v", F.array(*[F.lit(p) for p in ps]), F.lit(acc)
            ).alias("qs")
        ).collect()[0]["qs"]
        want = [float(math.ceil(p * n) - 1) for p in ps]
        return got == want

    # below the boundary: exact at every probed n, including n = limit-1
    for n in (10_000, 30_000, 49_999):
        assert approx_vs_exact(n), f"diverged BELOW the bound at n={n}"
    # at/above the boundary: walk up until the first divergence; the
    # bound only *permits* merging from n = limit, so the onset may sit
    # a little above it, but must appear well before 8x (else the
    # "exactness window" framing would be meaninglessly conservative)
    onset = None
    n = limit + 1  # odd -> coprime with 7919 holds for these probes
    while n <= 8 * limit:
        if math.gcd(7919, n) == 1 and not approx_vs_exact(n):
            onset = n
            break
        n += limit // 2
    assert onset is not None, (
        f"no compression onset found up to {8 * limit} — regime claim "
        "needs re-measuring"
    )
    assert onset >= limit, "onset below the theoretical bound"


def test_gk_regime_guard_fires_and_stays_lazy(spark):
    """The q74/q75 builders carry a lazy in-plan regime guard
    (F.assert_true riding a kept output column). Verify both halves
    without building a 5M-row group: in-window passes through the
    wrapped value, out-of-window raises with the regime pointer."""
    import pyspark.sql.functions as F
    import pytest

    from oxi_diel_db_spark.queries.aggregates import (
        _GK_EXACT_ACC,
        _gk_regime_guard,
    )

    df = spark.range(1)
    ok = _gk_regime_guard(F.lit(_GK_EXACT_ACC // 2 - 1), "t")
    row = df.select(F.when(ok.isNull(), F.lit(7)).alias("v")).collect()[0]
    assert row["v"] == 7
    bad = _gk_regime_guard(F.lit(_GK_EXACT_ACC // 2), "q74_test")
    with pytest.raises(Exception, match="GK exactness regime exceeded"):
        df.select(F.when(bad.isNull(), F.lit(7)).alias("v")).collect()
