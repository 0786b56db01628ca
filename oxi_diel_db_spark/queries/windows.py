"""Window functions (SURVEY.md §2.5: W1-W4).

Each window is ONE shuffle on its partition key, then a per-partition
sort. Frames that sum doubles use exact integer cents so running totals
are bit-stable across engines (segment-tree vs streaming accumulation
would otherwise reorder FP additions).
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from oxi_diel_db_spark.queries import register
from oxi_diel_db_spark.queries._util import cents, t


@register(
    "q40_ranking",
    oracle="""
    SELECT * FROM (
        SELECT c_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER w AS rn,
               RANK()       OVER w AS rnk,
               DENSE_RANK() OVER w AS drnk
        FROM orders JOIN customer ON o_custkey = c_custkey
        WINDOW w AS (PARTITION BY c_custkey ORDER BY o_totalprice DESC, o_orderkey)
    ) WHERE rn <= 3
    """,
)
def q40_ranking(spark, sf_dir):
    """row_number/rank/dense_rank + top-N-per-group (W1 + W4). The
    o_orderkey tie-break makes row_number deterministic. At scale this is
    the standard 'top 3 orders per customer' pattern: one shuffle by
    customer, heap-sort within."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    w = W.partitionBy("c_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
        )
        .filter(F.col("rn") <= 3)
    )


@register(
    "q41_lag_lead",
    oracle="""
    SELECT event_id, user_id, ts, value,
           LAG(value)  OVER w                         AS prev_value,
           LEAD(value) OVER w                         AS next_value,
           FIRST_VALUE(event_id) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_event,
           value - LAG(value) OVER w                  AS delta
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q41_lag_lead(spark, sf_dir):
    """lag/lead/first_value analytics per user timeline (W2). delta is a
    per-row IEEE subtraction of identical inputs → hash-stable."""
    e = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    wrows = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    return e.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.first("event_id").over(wrows).alias("first_event"),
        (F.col("value") - F.lag("value").over(w)).alias("delta"),
    )


@register(
    "q42_running_frames",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber,
           SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT))
               OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / 100.0 AS running_revenue,
           SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT))
               OVER (w ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
             / (100.0 * COUNT(*) OVER (w ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)) AS moving_avg4
    FROM lineitem
    WHERE l_suppkey <= 20
    WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber)
    """,
)
def q42_running_frames(spark, sf_dir):
    """Running total + moving average with explicit ROWS frames (W3).
    Sums run on exact cents; the moving average divides two exact frame
    aggregates, so both engines produce identical doubles."""
    l = t(spark, sf_dir, "lineitem").filter(F.col("l_suppkey") <= 20)
    w = W.partitionBy("l_suppkey").orderBy("l_shipdate", "l_orderkey", "l_linenumber")
    run = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    mov = w.rowsBetween(-3, W.currentRow)
    c = cents("l_extendedprice")
    return l.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        (F.sum(c).over(run) / 100.0).alias("running_revenue"),
        (F.sum(c).over(mov) / (100.0 * F.count(F.lit(1)).over(mov))).alias("moving_avg4"),
    )


@register(
    "q43_range_frame",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice,
           COUNT(*) OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice
                          RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW) AS n_within_10k
    FROM orders WHERE o_orderkey <= 3000
    """,
)
def q43_range_frame(spark, sf_dir):
    """RANGE frame on a numeric ordering (W3): peers within a value
    distance, not a row count. COUNT → exact across engines."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 3000)
    w = (
        W.partitionBy("o_orderstatus")
        .orderBy(F.col("o_totalprice").asc())
        .rangeBetween(-10000, W.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        F.count(F.lit(1)).over(w).alias("n_within_10k"),
    )


@register(
    "q44_distribution",
    oracle="""
    SELECT c_custkey, c_acctbal,
           NTILE(10)      OVER w AS decile,
           PERCENT_RANK() OVER w AS pct_rank,
           CUME_DIST()    OVER w AS cume
    FROM customer
    WINDOW w AS (ORDER BY c_acctbal, c_custkey)
    """,
)
def q44_distribution(spark, sf_dir):
    """ntile/percent_rank/cume_dist (W1 distribution family). Exact
    rationals k/(n-1) — identical doubles in both engines. Single
    unpartitioned window: fine for dims; at 100 TB use approx quantiles
    instead of a global ntile."""
    c = t(spark, sf_dir, "customer")
    w = W.orderBy(F.col("c_acctbal").asc(), F.col("c_custkey").asc())
    return c.select(
        "c_custkey",
        "c_acctbal",
        F.ntile(10).over(w).alias("decile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


@register(
    "q54_funnel",
    oracle="""
    WITH u1 AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY 1
    ),
    u2 AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN u1 USING (user_id)
      WHERE e.event_type = 'click' AND e.ts > u1.t1 GROUP BY 1
    ),
    u3 AS (
      SELECT e.user_id, MIN(e.ts) AS t3
      FROM events e JOIN u2 USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > u2.t2 GROUP BY 1
    )
    SELECT * FROM (
      SELECT 1 AS step, 'view' AS event_type, COUNT(*) AS n_users FROM u1
      UNION ALL
      SELECT 2, 'click', COUNT(*) FROM u2
      UNION ALL
      SELECT 3, 'purchase', COUNT(*) FROM u3
    )
    """,
)
def q54_funnel(spark, sf_dir):
    """Ordered conversion funnel view → click → purchase: a user reaches
    step k only via an event strictly after their step-k-1 time (the
    strict-sequence semantics product funnels need — an early purchase
    before any view does NOT count). Each stage is one per-user
    aggregate; all three shuffle on user_id, so AQE/co-partitioning
    reuses the same exchange — at 100 TB this is 'shuffle events by
    user once, fold three times'."""
    e = t(spark, sf_dir, "events")
    u1 = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id").agg(F.min("ts").alias("t1"))
    )
    u2 = (
        e.filter(F.col("event_type") == "click")
        .join(u1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id").agg(F.min("ts").alias("t2"))
    )
    u3 = (
        e.filter(F.col("event_type") == "purchase")
        .join(u2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id").agg(F.min("ts").alias("t3"))
    )
    rows = [
        u1.agg(F.lit(1).alias("step"), F.lit("view").alias("event_type"),
               F.count(F.lit(1)).alias("n_users")),
        u2.agg(F.lit(2).alias("step"), F.lit("click").alias("event_type"),
               F.count(F.lit(1)).alias("n_users")),
        u3.agg(F.lit(3).alias("step"), F.lit("purchase").alias("event_type"),
               F.count(F.lit(1)).alias("n_users")),
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


@register(
    "q55_event_transitions",
    oracle="""
    SELECT prev_type, event_type AS next_type, COUNT(*) AS n
    FROM (
      SELECT user_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    )
    WHERE prev_type IS NOT NULL
    GROUP BY 1, 2
    """,
)
def q55_event_transitions(spark, sf_dir):
    """Event-to-event transition matrix (per-user Markov counts): lag
    over the user's time-ordered stream, then count (prev, next) pairs.
    event_id breaks timestamp ties so the sequence — and the matrix —
    is deterministic. One shuffle on user_id feeds both the window and
    (via partial aggregation) the final count."""
    e = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return (
        e.select(
            "user_id", "event_type",
            F.lag("event_type").over(w).alias("prev_type"),
        )
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "q85_session_window",
    oracle="""
    WITH g AS (
      SELECT user_id, ts, value,
             CASE WHEN LAG(ts) OVER w IS NULL
                    OR ts - LAG(ts) OVER w > INTERVAL 12 HOUR
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), s AS (
      SELECT user_id, ts, value,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS sid
      FROM g
    )
    SELECT user_id,
           MIN(ts)                     AS session_start,
           MAX(ts) + INTERVAL 12 HOUR  AS session_end,
           COUNT(*)                    AS n_events,
           SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) / 100.0 AS total_value
    FROM s
    GROUP BY user_id, sid
    """,
)
def q85_session_window(spark, sf_dir):
    """Batch sessionization via ``F.session_window`` (the batch twin of
    st3's streaming session window): dynamic-gap sessions close 12 h
    after the last event, so ``session_window.end = MAX(ts) + gap`` —
    mirrored in the oracle's gaps-and-islands form (LAG → island id →
    per-island aggregate). Spark executes this as ONE shuffle on
    user_id followed by an in-partition session merge (no O(n²)
    self-join); at 100 TB the plan is identical, sized by the user_id
    shuffle. Events average ~10 h apart per user here, so a 12 h gap
    yields real multi-event sessions (≈3 events/session at sf0.01)."""
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "12 hours"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(cents("value")) / 100.0).alias("total_value"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


_Q119_GAP_SQL = """CASE event_type
             WHEN 'purchase' THEN INTERVAL 24 HOUR
             WHEN 'signup'   THEN INTERVAL 12 HOUR
             WHEN 'error'    THEN INTERVAL 1 HOUR
             ELSE INTERVAL 6 HOUR END"""


@register(
    "q119_dynamic_session",
    oracle=f"""
    WITH g AS (
      SELECT user_id, ts, value,
             ts + {_Q119_GAP_SQL} AS end_t
      FROM events
    ),
    o AS (
      SELECT user_id, ts, value, end_t,
             MAX(end_t) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND 1 PRECEDING) AS prev_max_end
      FROM g
    ),
    s AS (
      SELECT user_id, ts, value, end_t,
             SUM(CASE WHEN prev_max_end IS NULL OR ts > prev_max_end
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts
                     ROWS UNBOUNDED PRECEDING) AS sid
      FROM o
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(end_t) AS session_end,
           COUNT(*) AS n_events,
           SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) / 100.0 AS total_value
    FROM s
    GROUP BY user_id, sid
    """,
)
def q119_dynamic_session(spark, sf_dir):
    """DYNAMIC-GAP sessionization (``session_window`` with an
    expression gap, SPARK-36465): each event extends its session by a
    duration that depends on the EVENT — purchases hold attention 24 h,
    errors 1 h, browse events 6 h — the engagement-modeling refinement
    a fixed gap (q85) cannot express. Merge semantics are interval
    union, so the twin is the classic sweep: a session breaks where
    ts exceeds the running MAX of all previous interval ends (a plain
    LAG is wrong — an early long-gap event can bridge past a nearer
    short-gap one), and session_end = MAX(member ends). Same plan
    shape as q85: ONE shuffle on user_id, in-partition merge."""
    e = t(spark, sf_dir, "events")
    gap = (
        F.when(F.col("event_type") == "purchase", F.lit("24 hours"))
        .when(F.col("event_type") == "signup", F.lit("12 hours"))
        .when(F.col("event_type") == "error", F.lit("1 hour"))
        .otherwise(F.lit("6 hours"))
    )
    return (
        e.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(F.round(F.col("value") * 100, 0).cast("bigint")) / 100.0).alias(
                "total_value"
            ),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


@register(
    "q122_locf_impute",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) / 100.0 AS v
      FROM events
      WHERE event_type IN ('purchase', 'signup') AND ts IS NOT NULL
      GROUP BY 1, 2
    ),
    bounds AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM daily),
    spine AS (
      SELECT e.event_type, lo + CAST(x.g AS INT) AS day
      FROM (SELECT UNNEST(['purchase', 'signup']) AS event_type) e
      CROSS JOIN bounds
      CROSS JOIN (SELECT UNNEST(range(0, CAST(hi - lo AS INT) + 1)) AS g
                  FROM bounds) x
    ),
    joined AS (
      SELECT s.event_type, s.day, d.v
      FROM spine s LEFT JOIN daily d
        ON d.event_type = s.event_type AND d.day = s.day
    )
    SELECT event_type, day,
           CASE WHEN v IS NULL THEN 1 ELSE 0 END AS imputed,
           LAST_VALUE(v IGNORE NULLS) OVER (
             PARTITION BY event_type ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_locf
    FROM joined
    """,
)
def q122_locf_impute(spark, sf_dir):
    """Last-observation-carried-forward imputation over a dense date
    spine — the step-function fill for STATE-like series (prices,
    configs, inventory) where q105's linear interpolation would
    invent values that never existed: missing days take the most
    recent observed value via last_value(..., ignoreNulls) over an
    ordered window, and an ``imputed`` flag keeps filled rows
    distinguishable (the audit trail every imputation pass owes its
    consumers). Days before the first observation stay NULL — LOCF
    has nothing to carry. Spine is O(range) per series; the window
    partitions by series key."""
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "signup") & F.col("ts").isNotNull()
    )
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(
        (F.sum(F.round(F.col("value") * 100, 0).cast("bigint")) / 100.0).alias("v")
    )
    bounds = daily.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    types = spark.createDataFrame(
        [("purchase",), ("signup",)], "event_type string"
    )
    spine = (
        F.broadcast(bounds)
        .select(F.explode(F.sequence("lo", "hi")).alias("day"))
        .crossJoin(F.broadcast(types))
    )
    joined = spine.join(daily, ["event_type", "day"], "left")
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "event_type",
        "day",
        F.when(F.col("v").isNull(), 1).otherwise(0).alias("imputed"),
        F.last("v", ignorenulls=True).over(w).alias("v_locf"),
    )
