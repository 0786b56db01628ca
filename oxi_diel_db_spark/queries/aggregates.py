"""Aggregation operators (SURVEY.md §2.4: A8-A11).

All shapes are partial+final hash aggregates in Spark — map-side combine
happens automatically, so the shuffle carries one row per (partition,
group), not per input row. ROLLUP/CUBE expand grouping sets before the
aggregate; Spark plans a single Expand + HashAggregate (no N scans).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from oxi_diel_db_spark.queries import register
from oxi_diel_db_spark.queries._util import sql_sum_money, sum_money, t


@register(
    "q20_count_distinct",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*)                   AS n_orders,
           COUNT(DISTINCT o_custkey)  AS n_customers,
           COUNT(DISTINCT o_orderstatus) AS n_statuses
    FROM orders GROUP BY o_orderpriority
    """,
)
def q20_count_distinct(spark, sf_dir):
    """Distinct aggregates (A9). Spark rewrites multi-distinct via Expand;
    each distinct column gets its own partial dedup — no row explosion on
    the shuffle beyond distinct keys."""
    o = t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_customers"),
        F.countDistinct("o_orderstatus").alias("n_statuses"),
    )


@register("q21_approx_distinct", oracle=None)  # approximate → rows-only check
def q21_approx_distinct(spark, sf_dir):
    """approx_count_distinct (A9, HLL++). At 100 TB this replaces exact
    COUNT(DISTINCT) for dashboards: constant memory per group, one pass,
    mergeable sketches. rsd=0.01. Correctness vs exact is asserted in
    tests/test_aggregates.py (±5%)."""
    l = t(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", 0.01).alias("approx_parts"),
        F.approx_count_distinct("l_suppkey", 0.01).alias("approx_supps"),
    )


@register(
    "q22_rollup",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n,
           {sql_sum_money('o_totalprice')} AS total_price,
           GROUPING(o_orderstatus)    AS g_status,
           GROUPING(o_orderpriority)  AS g_priority
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def q22_rollup(spark, sf_dir):
    """ROLLUP subtotal lattice (A10) with GROUPING() disambiguation of
    real NULLs vs subtotal rows."""
    o = t(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        sum_money("o_totalprice", "total_price"),
        F.grouping("o_orderstatus").cast("long").alias("g_status"),
        F.grouping("o_orderpriority").cast("long").alias("g_priority"),
    )


@register(
    "q23_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def q23_cube(spark, sf_dir):
    """CUBE over two dims (A10): 4 grouping sets in one Expand pass."""
    l = t(spark, sf_dir, "lineitem")
    return l.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"),
    )


@register(
    "q24_grouping_sets",
    oracle="""
    SELECT o_orderstatus, YEAR(o_orderdate) AS order_year, COUNT(*) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (order_year), ())
    """,
)
def q24_grouping_sets(spark, sf_dir):
    """Explicit GROUPING SETS via the SQL surface (spark.sql) — proves the
    engine exposes full SQL, not just the DataFrame DSL."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus, YEAR(o_orderdate) AS order_year, COUNT(*) AS n
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (YEAR(o_orderdate)), ())
        """
    )


@register(
    "q25_stat_aggs",
    oracle="""
    SELECT l_returnflag,
           ROUND(STDDEV_POP(l_quantity), 4)              AS std_qty,
           ROUND(VAR_POP(l_quantity), 4)                 AS var_qty,
           ROUND(STDDEV_SAMP(l_discount), 6) + 0         AS stds_disc,
           ROUND(CORR(l_quantity, l_extendedprice), 6) + 0 AS corr_qty_price,
           ROUND(COVAR_POP(l_quantity, l_discount), 6) + 0 AS covar_qty_disc,
           MIN(l_extendedprice)                          AS min_price,
           MAX(l_extendedprice)                          AS max_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q25_stat_aggs(spark, sf_dir):
    """Statistical aggregates (A11). Note the reference's np.std is
    ddof=0 → STDDEV_POP, not Spark's sample-std default (SURVEY §2.4 A1);
    both variants are exercised here."""
    l = t(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.round(F.stddev_pop("l_quantity"), 4).alias("std_qty"),
        F.round(F.var_pop("l_quantity"), 4).alias("var_qty"),
        (F.round(F.stddev_samp("l_discount"), 6) + F.lit(0.0)).alias("stds_disc"),
        (F.round(F.corr("l_quantity", "l_extendedprice"), 6) + F.lit(0.0)).alias("corr_qty_price"),
        (F.round(F.covar_pop("l_quantity", "l_discount"), 6) + F.lit(0.0)).alias("covar_qty_disc"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
    )


@register(
    "q26_percentiles",
    oracle="""
    SELECT o_orderstatus,
           ROUND(QUANTILE_CONT(o_totalprice, 0.25), 4) AS p25,
           ROUND(QUANTILE_CONT(o_totalprice, 0.50), 4) AS p50,
           ROUND(QUANTILE_CONT(o_totalprice, 0.75), 4) AS p75,
           ROUND(MEDIAN(o_totalprice), 4)              AS med
    FROM orders GROUP BY o_orderstatus
    """,
)
def q26_percentiles(spark, sf_dir):
    """Exact interpolated percentiles (A11). At 100 TB swap to
    percentile_approx (mergeable KLL-ish sketch); exact variant kept for
    oracle parity and small dims."""
    o = t(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.round(F.percentile("o_totalprice", F.lit(0.25)), 4).alias("p25"),
        F.round(F.percentile("o_totalprice", F.lit(0.50)), 4).alias("p50"),
        F.round(F.percentile("o_totalprice", F.lit(0.75)), 4).alias("p75"),
        F.round(F.median("o_totalprice"), 4).alias("med"),
    )


@register(
    "q27_ordered_set_agg",
    oracle="""
    SELECT o_orderpriority,
           STRING_AGG(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses
    FROM orders GROUP BY o_orderpriority
    """,
)
def q27_ordered_set_agg(spark, sf_dir):
    """collect_set → deterministic string (A11 collect_list/set). Sorting
    before concat makes the value order-independent, i.e. shuffle-safe."""
    o = t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.concat_ws(",", F.array_sort(F.collect_set("o_orderstatus"))).alias("statuses")
    )


@register(
    "q28_conditional_agg",
    oracle=f"""
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n_returned,
           {sql_sum_money("CASE WHEN l_discount > 0.05 THEN l_extendedprice ELSE 0 END")} AS discounted_revenue,
           COUNT(CASE WHEN l_quantity >= 30 THEN 1 END)                AS n_bulk
    FROM lineitem GROUP BY l_linestatus
    """,
)
def q28_conditional_agg(spark, sf_dir):
    """Conditional aggregation — one pass computing several filtered
    measures (vs the reference's branch-per-config featurization,
    ml_prediction.py:69,118,171: lazy CASE folds 4 passes into 1)."""
    l = t(spark, sf_dir, "lineitem")
    return l.groupBy("l_linestatus").agg(
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("n_returned"),
        sum_money(
            F.when(F.col("l_discount") > 0.05, F.col("l_extendedprice")).otherwise(F.lit(0)),
            "discounted_revenue",
        ),
        F.count(F.when(F.col("l_quantity") >= 30, 1)).alias("n_bulk"),
    )


@register(
    "q56_time_rollup",
    oracle="""
    SELECT event_type,
           CAST(date_trunc('day', ts) AS TIMESTAMP)  AS day_bucket,
           CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_bucket,
           COUNT(*) AS n,
           SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) / 100.0 AS total_value
    FROM events
    GROUP BY GROUPING SETS (
      (event_type, CAST(date_trunc('day', ts) AS TIMESTAMP),
       CAST(date_trunc('hour', ts) AS TIMESTAMP)),
      (event_type, CAST(date_trunc('day', ts) AS TIMESTAMP)),
      (event_type),
      ()
    )
    """,
)
def q56_time_rollup(spark, sf_dir):
    """Hypertable-style multi-resolution time rollup (the continuous-
    aggregate shape): hour, day, per-type, and grand totals from ONE
    pass via ROLLUP over (event_type, day, hour). The hierarchy is what
    a 100 TB metrics store maintains incrementally; batch form is a
    single shuffle with partial aggregation at the finest grain, and
    coarser grains derive from the partials — Spark's expand+aggregate
    does exactly that."""
    e = t(spark, sf_dir, "events")
    return (
        e.select(
            "event_type",
            F.date_trunc("day", "ts").alias("day_bucket"),
            F.date_trunc("hour", "ts").alias("hour_bucket"),
            "value",
        )
        .rollup("event_type", "day_bucket", "hour_bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(F.round(F.col("value") * 100, 0).cast("bigint")) / 100.0).alias(
                "total_value"
            ),
        )
    )


@register("q71_hll_mergeable", oracle=None)  # sketch internals → rows-only check
def q71_hll_mergeable(spark, sf_dir):
    """Mergeable-sketch rollup (A9 at warehouse scale): per-month
    DataSketches HLL sketches of the distinct customer set, then
    quarterly distinct estimates via sketch UNION — no rescan of the
    fact table. This is THE 100 TB distinct-count design: materialize
    binary sketches at the finest grain once; any coarser window
    (quarter, year, trailing-90d) is a cheap union over pre-aggregated
    state, where exact COUNT(DISTINCT) would re-shuffle the raw keys
    every time. Register-max merging makes the sketch value independent
    of partition order, so results are run-to-run stable; accuracy vs
    exact is asserted in tests (±5%). DuckDB's approx sketches use a
    different algorithm → rows-only."""
    o = t(spark, sf_dir, "orders")
    monthly = (
        o.groupBy(
            F.year("o_orderdate").alias("y"), F.month("o_orderdate").alias("m")
        )
        .agg(F.hll_sketch_agg("o_custkey", F.lit(12)).alias("sk"))
    )
    return (
        monthly.groupBy(
            "y", (((F.col("m") - 1) / 3).cast("int") + 1).alias("q")
        )
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_custs"))
    )


@register(
    "q72_gapfill_interpolate",
    oracle=f"""
    WITH rev AS (
      SELECT n_name,
             (YEAR(o_orderdate) * 12 + MONTH(o_orderdate) - 1) AS mi,
             {sql_sum_money('o_totalprice')} AS val
      FROM orders JOIN customer ON o_custkey = c_custkey
                  JOIN nation ON c_nationkey = n_nationkey
      WHERE YEAR(o_orderdate) = 1997
      GROUP BY 1, 2
    ),
    bounds AS (SELECT MIN(mi) AS lo, MAX(mi) AS hi FROM rev),
    spine AS (
      SELECT n_name, CAST(u.mi AS INT) AS mi
      FROM (SELECT DISTINCT n_name FROM rev) k
      CROSS JOIN (SELECT unnest(range(lo, hi + 1)) AS mi FROM bounds) u
    ),
    dense AS (
      SELECT s.n_name, s.mi, rev.val FROM spine s
      LEFT JOIN rev ON s.n_name = rev.n_name AND s.mi = rev.mi
    ),
    filled AS (
      SELECT n_name, mi, val,
        last_value(val IGNORE NULLS) OVER (PARTITION BY n_name ORDER BY mi
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_val,
        last_value(CASE WHEN val IS NOT NULL THEN mi END IGNORE NULLS)
          OVER (PARTITION BY n_name ORDER BY mi
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_mi,
        first_value(val IGNORE NULLS) OVER (PARTITION BY n_name ORDER BY mi
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_val,
        first_value(CASE WHEN val IS NOT NULL THEN mi END IGNORE NULLS)
          OVER (PARTITION BY n_name ORDER BY mi
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_mi
      FROM dense
    )
    SELECT n_name, mi, val, prev_val AS locf,
           CASE WHEN val IS NOT NULL THEN val
                WHEN prev_val IS NULL THEN next_val
                WHEN next_val IS NULL THEN prev_val
                ELSE ROUND(prev_val + (next_val - prev_val)
                           * (mi - prev_mi) / (next_mi - prev_mi), 6)
           END AS interp
    FROM filled
    """,
)
def q72_gapfill_interpolate(spark, sf_dir):
    """Time-series densify + fill (the continuous-aggregate triple
    gapfill/locf/interpolate): monthly order revenue per nation over
    1997 — sparse at small SF, so real gaps appear — densified to the
    full month spine, then LOCF and linear interpolation as window
    algebra (operators/timeseries.py). One shuffle on the series key;
    integer month indices keep the spine and the interpolation weights
    engine-portable."""
    from oxi_diel_db_spark.operators.timeseries import gap_fill, month_index

    o = t(spark, sf_dir, "orders").filter(F.year("o_orderdate") == 1997)
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    rev = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name", month_index("o_orderdate").alias("mi"))
        .agg(sum_money("o_totalprice", "val"))
    )
    return gap_fill(rev, "n_name", "mi", "val")


#: GK exactness-regime accuracy for the q74/q75 gates: the sketch's
#: per-tuple delta bound is floor(2·ε·n) with ε = 1/accuracy, so with
#: n/group ≤ 1,505,670 measured at the largest swept corpus (data/sf3
#: orders, F-status group) and accuracy 1e7 the bound is 0 — the
#: summary provably never merges and its query IS the exact lower
#: order statistic, which DuckDB replays as quantile_disc (r12
#: measurement: 9/9 values bit-identical at sf0.01 AND at sf1/sf3;
#: accuracy 1e5 already diverges at sf1 — 1/3 groups — exactly the
#: compression onset the bound predicts). The regime holds while
#: n/group < accuracy/2 = 5M, i.e. orders up to roughly sf10; the
#: builders carry a LAZY in-plan guard (F.assert_true riding a kept
#: output column — zero extra jobs) that fails the gate with THIS
#: pointer instead of a silent hash mismatch when a group crosses the
#: boundary, and tools/time_registry.py refuses to hash-gate q74/q75
#: above the certified sf (r12 ADVICE + verdict Next #2). Boundary
#: measured empirically in tests/test_aggregates.py
#: (test_gk_exactness_regime_boundary): bit-identity to the exact
#: order statistic holds up to floor(2·ε·n)=0 and flips exactly where
#: the bound predicts.
_GK_EXACT_ACC = 10_000_000

#: Largest SF whose per-group n has been certified inside the GK
#: exactness window (sf3 measured max group = 1,505,670 < 5M). Sweep
#: tooling must not hash-gate q74/q75 above this without re-measuring.
_GK_MAX_CERTIFIED_SF = 3.0


def _gk_regime_guard(n_col, entry: str):
    """NULL iff the group size stays inside the GK exactness window
    (floor(2·ε·n) = 0 ⇔ n < accuracy/2); raises with a regime pointer
    otherwise. Lazy by construction: ride it on a kept output column
    via F.when(guard.isNull(), col) so Catalyst cannot prune it and no
    extra job runs."""
    return F.assert_true(
        n_col < F.lit(_GK_EXACT_ACC // 2),
        F.lit(
            f"{entry}: GK exactness regime exceeded — a group holds >= "
            f"accuracy/2 = {_GK_EXACT_ACC // 2} rows, so floor(2*eps*n) > 0, "
            "the sketch compresses, and the hash gate is no longer exact. "
            "See the _GK_EXACT_ACC note in queries/aggregates.py; re-certify "
            "or gate rows-only above sf%s." % _GK_MAX_CERTIFIED_SF
        ),
    )


@register(
    "q74_approx_percentiles",
    # Full value-hash gate (r12; was rows-only): the r11 audit measured
    # GK compressing at accuracy 1e4 even at 5k rows/group, so THAT
    # regime can never hash-match an exact engine. The registered gate
    # instead runs the same operator in its EXACTNESS regime (see
    # _GK_EXACT_ACC) where the answer is provably the exact lower order
    # statistic — no tolerance anywhere. The compressed regime stays
    # exercised and bounded in tests/test_aggregates.py, including an
    # assertion that accuracy 1e4 really does diverge from exact (the
    # sketch is approximating, not idling).
    oracle="""
    SELECT o_orderstatus,
           quantile_disc(o_totalprice, 0.25) AS p25,
           quantile_disc(o_totalprice, 0.50) AS p50,
           quantile_disc(o_totalprice, 0.75) AS p75,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM orders GROUP BY o_orderstatus
    """,
)
def q74_approx_percentiles(spark, sf_dir):
    """A11's 100 TB path, exercised for real (q26's docstring names it;
    this runs it): percentile_approx — the mergeable Greenwald-Khanna
    sketch, map-side partials like any hash aggregate, no sort, no
    whole-data shuffle. Gate accuracy sits in the exactness regime
    (floor(2·ε·n) = 0 → no compression → exact order statistics; the
    _GK_EXACT_ACC note has the measured regime boundary). At a true
    100 TB group you run accuracy ~1e4 and accept ε·n rank error with
    O((1/ε)·log(ε·n)) state — that compressed regime is pinned by the
    tolerance tests, not the hash gate."""
    o = t(spark, sf_dir, "orders")
    acc = F.lit(_GK_EXACT_ACC)
    agg = o.groupBy("o_orderstatus").agg(
        F.percentile_approx("o_totalprice", F.lit(0.25), acc).alias("p25"),
        F.percentile_approx("o_totalprice", F.lit(0.50), acc).alias("p50"),
        F.percentile_approx("o_totalprice", F.lit(0.75), acc).alias("p75"),
        F.count(F.lit(1)).alias("n"),
    )
    guard = _gk_regime_guard(F.col("n"), "q74_approx_percentiles")
    return agg.select(
        "o_orderstatus",
        "p25",
        "p50",
        "p75",
        F.when(guard.isNull(), F.col("n")).alias("n"),
    )


@register(
    "q75_approx_ntile",
    # Full value-hash gate (r12; was rows-only) — same exactness-regime
    # argument as q74: the decile boundaries are exact lower order
    # statistics, and the bucket-by-comparison rule is identical SQL in
    # both engines.
    oracle="""
    WITH b AS (
      SELECT quantile_disc(c_acctbal,
               [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS bs
      FROM customer
    )
    SELECT c_custkey, c_acctbal,
           1 + len(list_filter(b.bs, v -> c_acctbal > v)) AS decile
    FROM customer, b
    """,
)
def q75_approx_ntile(spark, sf_dir):
    """q44's 100 TB rewrite, exercised for real: decile assignment
    WITHOUT the single-partition ntile window — decile boundaries from
    one mergeable-sketch aggregate broadcast back onto the stream,
    each row bucketed by comparison. The scan never converges to one
    task. Gate accuracy sits in GK's exactness regime (see
    _GK_EXACT_ACC); the compressed regime's boundary error stays
    bounded in pytest."""
    c = t(spark, sf_dir, "customer")
    bounds = c.agg(
        F.percentile_approx(
            "c_acctbal",
            F.array([F.lit(i / 10.0) for i in range(1, 10)]),
            F.lit(_GK_EXACT_ACC),
        ).alias("bs"),
        F.count(F.lit(1)).alias("__n"),
    )
    bucketed = c.select("c_custkey", "c_acctbal").crossJoin(F.broadcast(bounds))
    # decile = 1 + number of boundaries strictly below the value
    decile = F.aggregate(
        "bs",
        F.lit(1),
        lambda acc, b: acc + F.when(F.col("c_acctbal") > b, 1).otherwise(0),
    )
    # one global group here, so the regime bound applies to the whole
    # table count rides the broadcast row; guard stays lazy (see
    # _gk_regime_guard)
    guard = _gk_regime_guard(F.col("__n"), "q75_approx_ntile")
    return bucketed.select(
        "c_custkey",
        "c_acctbal",
        F.when(guard.isNull(), decile).alias("decile"),
    )


@register(
    "q81_dataset_profile",
    oracle="""
    SELECT 'lang' AS col_name, COUNT(*) AS n,
           COUNT(*) - COUNT(lang) AS n_null,
           COUNT(DISTINCT lang) AS n_distinct,
           CAST(MIN(lang) AS VARCHAR) AS min_val,
           CAST(MAX(lang) AS VARCHAR) AS max_val
    FROM documents
    UNION ALL
    SELECT 'source', COUNT(*), COUNT(*) - COUNT(source),
           COUNT(DISTINCT source),
           CAST(MIN(source) AS VARCHAR), CAST(MAX(source) AS VARCHAR)
    FROM documents
    UNION ALL
    SELECT 'n_chars', COUNT(*), COUNT(*) - COUNT(n_chars),
           COUNT(DISTINCT n_chars),
           CAST(MIN(n_chars) AS VARCHAR), CAST(MAX(n_chars) AS VARCHAR)
    FROM documents
    """,
)
def q81_dataset_profile(spark, sf_dir):
    """One-pass dataset profiling (the data-quality pass every ingest
    runs before training): per-column row/null/distinct counts and
    min/max, computed in a SINGLE aggregate over one scan — Spark
    rewrites the three exact DISTINCTs into one Expand (×3 row
    multiplication, one shuffle), which beats three separate scans at
    100 TB; swap countDistinct for approx_count_distinct to drop the
    Expand when ±2% is acceptable. The wide 1-row aggregate unpivots to
    the (col, stats) long form with stack()."""
    d = t(spark, sf_dir, "documents")
    cols = ["lang", "source", "n_chars"]
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"{c}__nn"),
            F.count_distinct(F.col(c)).alias(f"{c}__nd"),
            F.min(F.col(c)).cast("string").alias(f"{c}__mn"),
            F.max(F.col(c)).cast("string").alias(f"{c}__mx"),
        ]
    wide = d.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__nn, {c}__nd, {c}__mn, {c}__mx" for c in cols
    )
    return wide.selectExpr(
        "__n",
        f"stack({len(cols)}, {stack_args}) AS (col_name, n_null, n_distinct, min_val, max_val)",
    ).select(
        "col_name",
        F.col("__n").alias("n"),
        "n_null",
        "n_distinct",
        "min_val",
        "max_val",
    )


@register(
    "q88_ohlc_resample",
    # The oracle derives open/close by explicit ROW_NUMBER over the
    # deterministic (ts, event_id) order — semantically identical to
    # the engine's native argmin/argmax, implementation-independent.
    oracle="""
    WITH x AS (
      SELECT event_type, date_trunc('hour', ts) AS bar_hour, value,
             ROW_NUMBER() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                                ORDER BY ts, event_id)           AS rn_a,
             ROW_NUMBER() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                                ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM events
    )
    SELECT event_type, bar_hour,
           MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
           MAX(value)                             AS high,
           MIN(value)                             AS low,
           MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
           COUNT(*)                               AS n_ticks,
           SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) / 100.0 AS volume
    FROM x
    GROUP BY event_type, bar_hour
    """,
)
def q88_ohlc_resample(spark, sf_dir):
    """Time-series downsampling to OHLC bars (the metrics/market shape
    of q56's rollup): per (stream, hour), open/close are the values at
    the deterministic (ts, event_id) extremes via native
    ``min_by``/``max_by`` with a struct ordering key — single hash
    aggregate, no window, no self-join. At 100 TB this is one partial-
    aggregated shuffle of (type, hour) cells; the window-based oracle
    form would shuffle every row into a sort, which is exactly what
    argmin/argmax aggregation avoids."""
    e = t(spark, sf_dir, "events")
    key = F.struct(F.col("ts"), F.col("event_id"))
    return (
        e.groupBy("event_type", F.date_trunc("hour", "ts").alias("bar_hour"))
        .agg(
            F.min_by("value", key).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", key).alias("close"),
            F.count(F.lit(1)).alias("n_ticks"),
            sum_money("value", "volume"),
        )
    )


@register(
    "q116_bitmap_distinct",
    oracle="""
    SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events
    WHERE user_id IS NOT NULL AND event_type IS NOT NULL
    GROUP BY event_type
    UNION ALL
    SELECT '__ALL__' AS event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events
    WHERE user_id IS NOT NULL AND event_type IS NOT NULL
    """,
)
def q116_bitmap_distinct(spark, sf_dir):
    """EXACT distinct counting via the Spark 3.5 bitmap aggregate
    family (bitmap_bucket_number / bitmap_bit_position /
    bitmap_construct_agg / bitmap_count / bitmap_or_agg) — the
    middle ground A9 was missing between exact COUNT(DISTINCT)
    (re-shuffles raw keys per rollup) and HLL (q71, approximate):
    keys are folded into fixed 32 Kbit bucket bitmaps that OR
    together associatively, so any coarser grouping is a cheap
    bitmap_or_agg over pre-aggregated state with NO error bar — the
    materialized-bitmap design warehouses use for exact funnel /
    reach rollups. Per event_type the bitmaps sum to the exact
    distinct user count; the '__ALL__' row re-derives the global
    count from the SAME per-type bitmaps via bitmap_or_agg (never
    rescanning the fact table) — merge correctness is what the gate
    checks. Shuffle posture: one agg keyed by (type, bucket) where
    bucket fan-out is |keyspace|/32768, then O(buckets) rows upward."""
    ev = (
        t(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull() & F.col("event_type").isNotNull())
        .select("event_type", "user_id")
    )
    lvl1 = ev.groupBy(
        "event_type", F.expr("bitmap_bucket_number(user_id)").alias("bucket")
    ).agg(F.expr("bitmap_construct_agg(bitmap_bit_position(user_id))").alias("bm"))
    per_type = lvl1.groupBy("event_type").agg(
        F.sum(F.expr("bitmap_count(bm)")).alias("n_users")
    )
    merged = (
        lvl1.groupBy("bucket")
        .agg(F.expr("bitmap_or_agg(bm)").alias("bm"))
        # COALESCE: the twin's global COUNT(DISTINCT) over an empty
        # table is 0, Spark's SUM over no buckets is NULL
        .agg(
            F.coalesce(F.sum(F.expr("bitmap_count(bm)")), F.lit(0))
            .cast("bigint")
            .alias("n_users")
        )
        .select(F.lit("__ALL__").alias("event_type"), "n_users")
    )
    return per_type.unionByName(merged)
