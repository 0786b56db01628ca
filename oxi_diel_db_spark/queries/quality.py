"""Data-quality operators (EXT, north star §2.12): the audit pass a
training-data pipeline runs over every ingest batch before anything
downstream consumes it.

Three shapes:

* dq1 — declarative constraint audit (null / uniqueness / range /
  referential / enum-membership), one summary row per constraint. Every
  check is an independent aggregate over one table; at 100 TB each is a
  single scan with map-side partial aggregation, and the final UNION is
  a few dozen rows. The FK check is a broadcast-able anti-join count.
* dq2 — distribution drift between two pipeline runs as a Population
  Stability Index over fixed equal-width bins: two scans (global
  min/max, then binned counts), no shuffle wider than 10 bins.
* dq3 — per-partition freshness lag (how stale is each event stream
  vs the freshest one) — the monitoring query behind ingest SLAs.
* dq4 — k-anonymous release: quasi-identifier cells below k are
  suppressed into a masked residual before aggregates leave the
  pipeline (the privacy gate next to t6's PII redaction).
* dq5 — ingest-volume anomaly detection over a date spine: a day that
  produced NOTHING still appears (n = 0) and must be flagged against
  the trailing 7-day average.

All five are fully SQL-expressible, so they sit under the exact
cross-engine value-hash gate.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from oxi_diel_db_spark.queries import register
from oxi_diel_db_spark.queries._util import r6, t


def _audit_row(df, constraint: str, violation_col, n_checked_col=None):
    """One constraint → one summary row: (constraint, n_checked,
    n_violations, violation_rate). ``violation_col`` is a boolean
    column evaluated per row."""
    n_checked = (
        F.count(n_checked_col) if n_checked_col is not None else F.count(F.lit(1))
    )
    # COALESCE: SUM over an EMPTY table is NULL — an audit must report
    # 0 violations over 0 rows, not null (rate 0 likewise)
    n_viol = F.coalesce(F.sum(F.when(violation_col, 1).otherwise(0)), F.lit(0))
    return df.agg(
        F.lit(constraint).alias("constraint"),
        n_checked.alias("n_checked"),
        n_viol.alias("n_violations"),
        r6(
            F.coalesce(n_viol / n_checked, F.lit(0.0)),
            "violation_rate",
        ),
    )


@register(
    "dq1_constraint_audit",
    oracle="""
    SELECT 'range_lineitem_quantity_1_40' AS constraint, COUNT(*) AS n_checked,
           CAST(SUM(CASE WHEN l_quantity < 1 OR l_quantity > 40 THEN 1 ELSE 0 END) AS BIGINT) AS n_violations,
           ROUND(SUM(CASE WHEN l_quantity < 1 OR l_quantity > 40 THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6) + 0 AS violation_rate
    FROM lineitem
    UNION ALL
    SELECT 'nonneg_customer_acctbal', COUNT(*),
           CAST(SUM(CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END) AS BIGINT),
           ROUND(SUM(CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6) + 0
    FROM customer
    UNION ALL
    SELECT 'enum_events_event_type', COUNT(*),
           CAST(SUM(CASE WHEN event_type NOT IN ('view','click','purchase','signup') THEN 1 ELSE 0 END) AS BIGINT),
           ROUND(SUM(CASE WHEN event_type NOT IN ('view','click','purchase','signup') THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6) + 0
    FROM events
    UNION ALL
    SELECT 'notnull_documents_text', COUNT(*),
           CAST(SUM(CASE WHEN text IS NULL OR length(text) = 0 THEN 1 ELSE 0 END) AS BIGINT),
           ROUND(SUM(CASE WHEN text IS NULL OR length(text) = 0 THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6) + 0
    FROM documents
    UNION ALL
    SELECT 'unique_customer_custkey', COUNT(*),
           CAST(COUNT(*) - COUNT(DISTINCT c_custkey) AS BIGINT),
           ROUND((COUNT(*) - COUNT(DISTINCT c_custkey)) * 1.0 / COUNT(*), 6) + 0
    FROM customer
    UNION ALL
    SELECT 'fk_orders_custkey', COUNT(*),
           CAST(SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           ROUND(SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6) + 0
    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def dq1_constraint_audit(spark, sf_dir):
    """Declarative constraint audit: range, sign, enum-membership,
    not-null, key-uniqueness, and referential integrity — one summary
    row each. The quantity range is deliberately [1, 40] (the data's
    41-50 tail must be FOUND) and the enum set omits 'error', so the
    audit provably reports nonzero violations rather than vacuous
    zeros. Each check is one map-side-combined aggregate; the FK check
    broadcasts the customer keys."""
    li = t(spark, sf_dir, "lineitem")
    cu = t(spark, sf_dir, "customer")
    ev = t(spark, sf_dir, "events")
    dc = t(spark, sf_dir, "documents")
    od = t(spark, sf_dir, "orders")

    uniq = cu.agg(
        F.lit("unique_customer_custkey").alias("constraint"),
        F.count(F.lit(1)).alias("n_checked"),
        (F.count(F.lit(1)) - F.count_distinct("c_custkey")).alias("n_violations"),
        r6(
            F.coalesce(
                (F.count(F.lit(1)) - F.count_distinct("c_custkey"))
                / F.count(F.lit(1)),
                F.lit(0.0),
            ),
            "violation_rate",
        ),
    )
    fk = _audit_row(
        od.join(
            F.broadcast(cu.select("c_custkey")),
            od.o_custkey == F.col("c_custkey"),
            "left",
        ),
        "fk_orders_custkey",
        F.col("c_custkey").isNull(),
    )
    rows = [
        _audit_row(
            li,
            "range_lineitem_quantity_1_40",
            (F.col("l_quantity") < 1) | (F.col("l_quantity") > 40),
        ),
        _audit_row(cu, "nonneg_customer_acctbal", F.col("c_acctbal") < 0),
        _audit_row(
            ev,
            "enum_events_event_type",
            ~F.col("event_type").isin("view", "click", "purchase", "signup"),
        ),
        _audit_row(
            dc,
            "notnull_documents_text",
            F.col("text").isNull() | (F.length("text") == 0),
        ),
        uniq,
        fk,
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


@register(
    "dq2_distribution_drift",
    oracle="""
    WITH b AS (
      SELECT MIN(value) AS lo, MAX(value) AS hi FROM events
    ), binned AS (
      SELECT LEAST(CAST(FLOOR((value - b.lo) / ((b.hi - b.lo) / 10)) AS INT), 9) AS bin,
             event_id % 2 AS half
      FROM events, b
    ), c AS (
      SELECT s.bin,
             COALESCE(SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END), 0) AS n_ref,
             COALESCE(SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END), 0) AS n_cur
      FROM (SELECT CAST(range AS INT) AS bin FROM range(10)) s
      LEFT JOIN binned b ON b.bin = s.bin
      GROUP BY s.bin
    ), tot AS (
      SELECT SUM(n_ref) AS t_ref, SUM(n_cur) AS t_cur FROM c
    )
    SELECT bin,
           ROUND((n_ref + 1.0) / (t_ref + 10), 6) + 0 AS p_ref,
           ROUND((n_cur + 1.0) / (t_cur + 10), 6) + 0 AS p_cur,
           ROUND(((n_ref + 1.0) / (t_ref + 10) - (n_cur + 1.0) / (t_cur + 10))
                 * LN(((n_ref + 1.0) / (t_ref + 10)) / ((n_cur + 1.0) / (t_cur + 10))), 6) + 0 AS psi_term
    FROM c, tot
    """,
)
def dq2_distribution_drift(spark, sf_dir):
    """Distribution drift between two pipeline runs (here: even vs odd
    event_id halves standing in for yesterday/today) as a Population
    Stability Index over 10 equal-width bins. Two passes: a global
    min/max (exact, order-independent), then one binned count — the
    whole PSI reduces to a 10-row aggregate however large the input.
    Counts are Laplace-smoothed ((n+1)/(t+10), the standard empty-bin
    guard — heavy-tailed values leave high bins empty in one half) and
    a bin spine keeps all 10 bins on the record even when unoccupied.
    PSI > 0.2 is the conventional retrain/alert threshold; per-bin
    terms are emitted so the drifted region is identifiable."""
    ev = t(spark, sf_dir, "events")
    bounds = ev.agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    binned = ev.crossJoin(F.broadcast(bounds)).select(
        F.least(
            F.floor((F.col("value") - F.col("lo")) / ((F.col("hi") - F.col("lo")) / 10))
            .cast("int"),
            F.lit(9),
        ).alias("bin"),
        (F.col("event_id") % 2).alias("half"),
    )
    c = binned.groupBy("bin").agg(
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0)).alias("n_ref"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0)).alias("n_cur"),
    )
    spine = spark.range(10).select(F.col("id").cast("int").alias("bin"))
    c = (
        spine.join(c, "bin", "left")
        .select(
            "bin",
            F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
            F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
        )
    )
    tot = c.agg(F.sum("n_ref").alias("t_ref"), F.sum("n_cur").alias("t_cur"))
    p_ref = (F.col("n_ref") + 1.0) / (F.col("t_ref") + 10)
    p_cur = (F.col("n_cur") + 1.0) / (F.col("t_cur") + 10)
    return c.crossJoin(F.broadcast(tot)).select(
        "bin",
        r6(p_ref, "p_ref"),
        r6(p_cur, "p_cur"),
        r6((p_ref - p_cur) * F.log(p_ref / p_cur), "psi_term"),
    )


@register(
    "dq3_freshness_lag",
    oracle="""
    SELECT event_type,
           MAX(ts) AS latest,
           ROUND((epoch_us(MAX(MAX(ts)) OVER ()) - epoch_us(MAX(ts))) / 3600e6, 6) + 0
             AS hours_behind
    FROM events
    GROUP BY event_type
    """,
)
def dq3_freshness_lag(spark, sf_dir):
    """Per-stream freshness lag: each event type's latest timestamp vs
    the freshest stream, in hours — the ingest-SLA monitoring query.
    One aggregate to ≤ a handful of rows, then a global window over
    those rows only (bounded by the event-type cardinality, never the
    data size)."""
    ev = t(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(F.max("ts").alias("latest"))
    w = W.partitionBy()
    return agg.select(
        "event_type",
        "latest",
        r6(
            (F.unix_micros(F.max("latest").over(w)) - F.unix_micros("latest"))
            / 3600e6,
            "hours_behind",
        ),
    )


@register(
    "dq4_k_anonymity",
    oracle="""
    WITH g AS (
      SELECT c_nationkey, c_mktsegment, COUNT(*) AS n,
             SUM(CAST(ROUND(c_acctbal * 100, 0) AS BIGINT)) AS cents
      FROM customer GROUP BY 1, 2
    )
    SELECT CASE WHEN n >= 10 THEN CAST(c_nationkey AS VARCHAR) ELSE '*' END AS nation_qi,
           CASE WHEN n >= 10 THEN c_mktsegment ELSE '*' END              AS segment_qi,
           CAST(SUM(n) AS BIGINT) AS n_customers,
           SUM(cents) / 100.0     AS total_acctbal
    FROM g
    GROUP BY 1, 2
    """,
)
def dq4_k_anonymity(spark, sf_dir):
    """k-anonymous release (k = 10) over the (nation, segment)
    quasi-identifiers: groups smaller than k are SUPPRESSED — their
    identifiers masked to '*' and their rows merged into one residual
    cell — so no published cell describes fewer than k people (the
    privacy gate a data-release pipeline runs before sharing
    aggregates). Two hash aggregates end-to-end; the suppression
    decision is itself data-derived, so the oracle must reproduce the
    entire group→mask→re-aggregate chain."""
    cu = t(spark, sf_dir, "customer")
    g = cu.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("c_acctbal") * 100, 0).cast("bigint")).alias("cents"),
    )
    keep = F.col("n") >= 10
    return (
        g.select(
            F.when(keep, F.col("c_nationkey").cast("string"))
            .otherwise(F.lit("*"))
            .alias("nation_qi"),
            F.when(keep, F.col("c_mktsegment")).otherwise(F.lit("*")).alias("segment_qi"),
            "n",
            "cents",
        )
        .groupBy("nation_qi", "segment_qi")
        .agg(
            F.sum("n").alias("n_customers"),
            (F.sum("cents") / 100.0).alias("total_acctbal"),
        )
    )


@register(
    "dq5_volume_anomaly",
    oracle="""
    WITH ev AS (
      SELECT * FROM events WHERE NOT day(ts) = 15
    ), bounds AS (
      SELECT CAST(date_trunc('day', MIN(ts)) AS DATE) AS d0,
             CAST(date_trunc('day', MAX(ts)) AS DATE) AS d1
      FROM ev
    ), spine AS (
      SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
      FROM bounds
    ), daily AS (
      SELECT s.day, COUNT(e.event_id) AS n
      FROM spine s LEFT JOIN ev e ON CAST(date_trunc('day', e.ts) AS DATE) = s.day
      GROUP BY s.day
    ), w AS (
      SELECT day, n,
             AVG(n) OVER (ORDER BY day ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
               AS trail
      FROM daily
    )
    SELECT day, n,
           ROUND(COALESCE(trail, n), 6) + 0 AS trailing_avg,
           (trail IS NOT NULL AND n < 0.5 * trail) AS is_anomaly
    FROM w
    """,
)
def dq5_volume_anomaly(spark, sf_dir):
    """Ingest-volume anomaly detection: rows per day against the
    trailing 7-day average, with a DATE SPINE so a day that produced
    NOTHING still appears (the usual failure a bare GROUP BY hides —
    no rows, no group, no alert). Day 15 is filtered out in both
    engines to stage exactly that outage: the spine resurrects it with
    n = 0 and the detector must flag it (< 50% of trailing average).
    One daily aggregate then a window over ~365 rows/year — never over
    the data."""
    ev = t(spark, sf_dir, "events").filter(F.dayofmonth("ts") != 15)
    bounds = ev.agg(
        F.date_trunc("day", F.min("ts")).cast("date").alias("d0"),
        F.date_trunc("day", F.max("ts")).cast("date").alias("d1"),
    )
    spine = bounds.select(
        F.explode(F.sequence("d0", "d1")).alias("day")
    )
    daily = (
        spine.join(
            ev.select(F.date_trunc("day", "ts").cast("date").alias("day"), "event_id"),
            "day",
            "left",
        )
        .groupBy("day")
        .agg(F.count("event_id").alias("n"))
    )
    w = W.orderBy("day").rowsBetween(-7, -1)
    trail = F.avg("n").over(w)
    return daily.select(
        "day",
        "n",
        r6(F.coalesce(trail, F.col("n")), "trailing_avg"),
        (trail.isNotNull() & (F.col("n") < 0.5 * trail)).alias("is_anomaly"),
    )


@register(
    "dq6_reconciliation",
    oracle="""
    WITH r AS (
      SELECT o.o_orderkey, o.o_totalprice,
             SUM(l.l_extendedprice * (1 + l.l_tax) * (1 - l.l_discount)) AS s
      FROM orders o LEFT JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      GROUP BY 1, 2
    )
    SELECT band, COUNT(*) AS n_orders FROM (
      SELECT CASE
               WHEN s IS NULL THEN 'no_lineitems'
               WHEN ABS(o_totalprice - s) / o_totalprice < 0.01 THEN 'within_1pct'
               WHEN ABS(o_totalprice - s) / o_totalprice < 0.1  THEN '1_to_10pct'
               WHEN ABS(o_totalprice - s) / o_totalprice < 1.0  THEN '10_to_100pct'
               ELSE 'over_100pct' END AS band
      FROM r)
    GROUP BY band
    """,
)
def dq6_reconciliation(spark, sf_dir):
    """Cross-table reconciliation (the accounting audit): every order
    header's total is recomputed from its lines and the relative
    deviation is banded — childless orders surface as their own band
    rather than vanishing from an inner join. This corpus does NOT
    maintain the invariant (only ~1% of orders reconcile within 1%,
    257 childless at sf0.01), which is exactly what the report must
    say. One shuffle on orderkey, then a 5-row aggregate."""
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    s = li.groupBy("l_orderkey").agg(
        F.sum(
            F.col("l_extendedprice") * (1 + F.col("l_tax")) * (1 - F.col("l_discount"))
        ).alias("s")
    )
    r = o.join(s, o.o_orderkey == s.l_orderkey, "left")
    rel = F.abs(F.col("o_totalprice") - F.col("s")) / F.col("o_totalprice")
    band = (
        F.when(F.col("s").isNull(), "no_lineitems")
        .when(rel < 0.01, "within_1pct")
        .when(rel < 0.1, "1_to_10pct")
        .when(rel < 1.0, "10_to_100pct")
        .otherwise("over_100pct")
    )
    return r.select(band.alias("band")).groupBy("band").agg(
        F.count(F.lit(1)).alias("n_orders")
    )


@register(
    "dq7_profile_drift",
    oracle="""
    WITH ev AS (
      SELECT *, CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 'p1' ELSE 'p2' END AS period
      FROM events
    ),
    prof AS (
      SELECT period, 'event_type' AS col, COUNT(*) AS n,
             COUNT(event_type) AS nn, COUNT(DISTINCT event_type) AS nd
      FROM ev GROUP BY period
      UNION ALL
      SELECT period, 'value', COUNT(*), COUNT(value), COUNT(DISTINCT value)
      FROM ev GROUP BY period
      UNION ALL
      SELECT period, 'user_id', COUNT(*), COUNT(user_id), COUNT(DISTINCT user_id)
      FROM ev GROUP BY period
      UNION ALL
      SELECT period, 'props', COUNT(*), COUNT(props), COUNT(DISTINCT props)
      FROM ev GROUP BY period
    ),
    wide AS (
      SELECT col,
             CAST(MAX(CASE WHEN period = 'p1' THEN nd END) AS BIGINT) AS nd_p1,
             CAST(MAX(CASE WHEN period = 'p2' THEN nd END) AS BIGINT) AS nd_p2,
             ROUND(MAX(CASE WHEN period = 'p1' THEN 1.0 - nn * 1.0 / n END), 6) AS null_rate_p1,
             ROUND(MAX(CASE WHEN period = 'p2' THEN 1.0 - nn * 1.0 / n END), 6) AS null_rate_p2
      FROM prof GROUP BY col
    )
    SELECT col,
           nd_p1, nd_p2, null_rate_p1, null_rate_p2,
           (ABS(nd_p2 - nd_p1) * 1.0 / GREATEST(nd_p1, nd_p2, 1) > 0.5
            OR ABS(null_rate_p2 - null_rate_p1) > 0.01) AS drifted
    FROM wide
    """,
)
def dq7_profile_drift(spark, sf_dir):
    """Column-profile drift between two pipeline runs (Deequ-style
    profile anomaly detection, completing dq2's single-column PSI):
    per column, null-rate and exact distinct-count for the first vs
    second half-month of events, plus a drift verdict (>50% relative
    distinct-count shift or >1pp null-rate shift). ONE Expand-based
    pass per period computes every per-column profile (no per-column
    rescans — the q81 one-pass-profile shape), then a 4-row pivot.
    At 100 TB: a single scan with map-side partials; the profile table
    is O(columns), not O(rows)."""
    cols = ["event_type", "value", "user_id", "props"]
    ev = t(spark, sf_dir, "events").withColumn(
        "period",
        F.when(F.col("ts") < F.lit("2024-01-16").cast("timestamp"), "p1").otherwise(
            "p2"
        ),
    )
    prof = ev.groupBy("period").agg(
        F.count(F.lit(1)).alias("n"),
        *[F.count(c).alias(f"nn_{c}") for c in cols],
        *[F.countDistinct(c).alias(f"nd_{c}") for c in cols],
    )
    # unpivot to (period, col, n, nn, nd) rows
    stacked = prof.select(
        "period",
        "n",
        F.expr(
            "stack({}, {}) as (col, nn, nd)".format(
                len(cols),
                ", ".join(f"'{c}', nn_{c}, nd_{c}" for c in cols),
            )
        ),
    )
    wide = stacked.groupBy("col").agg(
        F.max(F.when(F.col("period") == "p1", F.col("nd"))).alias("nd_p1"),
        F.max(F.when(F.col("period") == "p2", F.col("nd"))).alias("nd_p2"),
        r6(
            F.max(
                F.when(
                    F.col("period") == "p1", 1.0 - F.col("nn") / F.col("n")
                )
            ),
            "null_rate_p1",
        ),
        r6(
            F.max(
                F.when(
                    F.col("period") == "p2", 1.0 - F.col("nn") / F.col("n")
                )
            ),
            "null_rate_p2",
        ),
    )
    drifted = (
        F.abs(F.col("nd_p2") - F.col("nd_p1"))
        / F.greatest(F.col("nd_p1"), F.col("nd_p2"), F.lit(1))
        > 0.5
    ) | (F.abs(F.col("null_rate_p2") - F.col("null_rate_p1")) > 0.01)
    return wide.select(
        "col", "nd_p1", "nd_p2", "null_rate_p1", "null_rate_p2",
        drifted.alias("drifted"),
    )


@register(
    "dq8_snapshot_diff",
    oracle="""
    WITH old AS (
      SELECT o_orderkey, o_totalprice, o_orderstatus
      FROM orders WHERE o_orderkey % 97 <> 0
    ),
    new AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 13 = 0
                  THEN ROUND(o_totalprice * 1.1, 2) ELSE o_totalprice END AS o_totalprice,
             o_orderstatus
      FROM orders WHERE o_orderkey % 89 <> 0
    )
    SELECT COALESCE(old.o_orderkey, new.o_orderkey) AS o_orderkey,
           CASE WHEN old.o_orderkey IS NULL THEN 'added'
                WHEN new.o_orderkey IS NULL THEN 'removed'
                ELSE 'changed' END AS status,
           CASE WHEN old.o_orderkey IS NULL OR new.o_orderkey IS NULL
                THEN ''
                ELSE array_to_string(list_filter(
                  [CASE WHEN old.o_totalprice IS DISTINCT FROM new.o_totalprice THEN 'o_totalprice' END,
                   CASE WHEN old.o_orderstatus IS DISTINCT FROM new.o_orderstatus THEN 'o_orderstatus' END],
                  x -> x IS NOT NULL), ',') END AS changed_cols
    FROM old FULL OUTER JOIN new ON old.o_orderkey = new.o_orderkey
    WHERE old.o_orderkey IS NULL OR new.o_orderkey IS NULL
       OR old.o_totalprice IS DISTINCT FROM new.o_totalprice
       OR old.o_orderstatus IS DISTINCT FROM new.o_orderstatus
    """,
)
def dq8_snapshot_diff(spark, sf_dir):
    """Row-level snapshot reconciliation (operators/scale.table_diff):
    two deterministic versions of orders — rows missing from the old
    snapshot (key % 97), rows dropped from the new (key % 89), and a
    10% price bump on key % 13 — diffed into (key, status,
    changed_cols). Output is O(churn), not O(table); the full-outer
    join is the single shuffle and rides pre-bucketed keys at scale.
    Null-safe compare: NULL→value counts as changed, NULL→NULL does
    not (eqNullSafe / IS DISTINCT FROM in both engines).

    Gate shape: the library operator returns changed_cols as
    array<string>; the registered query projects it through
    array_join because the driver's pandas canonicalizer can only
    hash atomic cell types (registry convention: atomic outputs
    only, enforced by tests/test_lint.py)."""
    from oxi_diel_db_spark.operators.scale import table_diff

    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    old = o.filter(F.col("o_orderkey") % 97 != 0)
    new = o.filter(F.col("o_orderkey") % 89 != 0).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 13 == 0, F.round(F.col("o_totalprice") * 1.1, 2)
        ).otherwise(F.col("o_totalprice")),
    )
    diff = table_diff(old, new, ["o_orderkey"])
    return diff.withColumn("changed_cols", F.array_join("changed_cols", ","))


#: (column, spark_type, duck_type) — the declared documents contract.
_DQ9_CONTRACT = [
    ("doc_id", "bigint", "BIGINT"),
    ("text", "string", "VARCHAR"),
    ("lang", "string", "VARCHAR"),
    ("source", "string", "VARCHAR"),
    ("n_chars", "bigint", "BIGINT"),
]


@register(
    "dq9_schema_contract",
    oracle="""
    WITH cols AS (SELECT column_name, column_type FROM (DESCRIBE documents)),
    contract(col, want) AS (VALUES {contract}),
    schema_rules AS (
      SELECT 'present:' || c.col AS rule,
             CASE WHEN cols.column_name IS NULL THEN 'fail' ELSE 'pass' END AS status,
             CAST(CASE WHEN cols.column_name IS NULL THEN 1 ELSE 0 END AS BIGINT) AS n_violations
      FROM contract c LEFT JOIN cols ON cols.column_name = c.col
      UNION ALL
      SELECT 'type:' || c.col,
             CASE WHEN cols.column_type = c.want THEN 'pass' ELSE 'fail' END,
             CAST(CASE WHEN cols.column_type = c.want THEN 0 ELSE 1 END AS BIGINT)
      FROM contract c LEFT JOIN cols ON cols.column_name = c.col
    ),
    data_rules AS (
      SELECT 'not_null:doc_id' AS rule,
             CAST(COUNT(*) FILTER (doc_id IS NULL) AS BIGINT) AS n FROM documents
      UNION ALL
      SELECT 'unique:doc_id',
             CAST(COUNT(doc_id) - COUNT(DISTINCT doc_id) AS BIGINT) FROM documents
      UNION ALL
      SELECT 'non_negative:n_chars',
             CAST(COUNT(*) FILTER (n_chars < 0) AS BIGINT) FROM documents
      UNION ALL
      SELECT 'len_consistent:n_chars',
             CAST(COUNT(*) FILTER (text IS NOT NULL AND n_chars <> length(text)) AS BIGINT)
      FROM documents
    )
    SELECT rule, status, n_violations FROM schema_rules
    UNION ALL
    SELECT rule, CASE WHEN n > 0 THEN 'fail' ELSE 'pass' END, n FROM data_rules
    """.format(
        contract=", ".join(f"('{c}', '{d}')" for c, _s, d in _DQ9_CONTRACT)
    ),
)
def dq9_schema_contract(spark, sf_dir):
    """Schema-contract validation — the ingest gate a data platform
    runs before accepting a producer's drop: STRUCTURAL rules (every
    contract column present with the declared type — checked against
    the DataFrame schema, O(1) driver-side, no scan) and DATA rules
    (doc_id non-null + unique, n_chars non-negative and consistent
    with length(text)) — all four counted in ONE aggregate pass and
    unpivoted via stack(). One row per rule: (rule, status,
    n_violations). At 100 TB the cost is a single scan computing four
    counters map-side; the schema half costs nothing (catalog
    metadata). The oracle re-derives both halves in DuckDB (DESCRIBE
    for structure), each engine checking the contract against its OWN
    type names — the cross-engine gate compares verdicts, not type
    strings."""
    docs = t(spark, sf_dir, "documents")
    actual = {f.name: f.dataType.simpleString() for f in docs.schema.fields}
    rows = []
    for col, want_spark, _want_duck in _DQ9_CONTRACT:
        present = col in actual
        rows.append(
            (f"present:{col}", "pass" if present else "fail",
             0 if present else 1)
        )
        ok = present and actual[col] == want_spark
        rows.append((f"type:{col}", "pass" if ok else "fail", 0 if ok else 1))
    schema_rules = spark.createDataFrame(
        rows, "rule string, status string, n_violations bigint"
    )
    agg = docs.agg(
        F.count(F.when(F.col("doc_id").isNull(), 1)).alias("a"),
        (F.count("doc_id") - F.countDistinct("doc_id")).alias("b"),
        F.count(F.when(F.col("n_chars") < 0, 1)).alias("c"),
        F.count(
            F.when(
                F.col("text").isNotNull()
                & (F.col("n_chars") != F.length("text")),
                1,
            )
        ).alias("d"),
    )
    data_rules = agg.selectExpr(
        "stack(4, 'not_null:doc_id', a, 'unique:doc_id', b, "
        "'non_negative:n_chars', c, 'len_consistent:n_chars', d) "
        "AS (rule, n_violations)"
    ).select(
        "rule",
        F.when(F.col("n_violations") > 0, "fail").otherwise("pass").alias("status"),
        F.col("n_violations").cast("bigint").alias("n_violations"),
    )
    return schema_rules.unionByName(data_rules)


@register(
    "dq10_ks_drift",
    oracle="""
    WITH v AS (
      SELECT value,
             SUM(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END) AS n_ref,
             SUM(CASE WHEN event_id % 2 = 1 THEN 1 ELSE 0 END) AS n_cur
      FROM events WHERE value IS NOT NULL GROUP BY value
    ), tot AS (
      SELECT CAST(SUM(n_ref) AS BIGINT) AS t_ref,
             CAST(SUM(n_cur) AS BIGINT) AS t_cur
      FROM v
    ), c AS (
      SELECT value,
             SUM(n_ref) OVER (ORDER BY value
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_ref,
             SUM(n_cur) OVER (ORDER BY value
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_cur
      FROM v
    ), d AS (
      SELECT value,
             ABS(CAST(cum_ref AS DOUBLE) / CAST(t_ref AS DOUBLE)
               - CAST(cum_cur AS DOUBLE) / CAST(t_cur AS DOUBLE)) AS dd,
             t_ref, t_cur,
             1.358 * SQRT(CAST(t_ref + t_cur AS DOUBLE)
                          / (CAST(t_ref AS DOUBLE) * CAST(t_cur AS DOUBLE)))
               AS crit
      FROM c, tot
    )
    SELECT t_ref AS n_ref, t_cur AS n_cur,
           ROUND(dd, 6) + 0 AS ks_d,
           value AS ks_at,
           ROUND(crit, 6) + 0 AS crit_05,
           CAST(ROUND(dd, 6) > ROUND(crit, 6) AS INT) AS drifted
    FROM d
    ORDER BY dd DESC, value ASC
    LIMIT 1
    """,
)
def dq10_ks_drift(spark, sf_dir):
    """Two-sample Kolmogorov–Smirnov drift test (even vs odd event_id
    halves of events.value, same split as dq2's PSI): D = max |F_ref -
    F_cur| over the pooled distinct values, plus the 5%-level critical
    value 1.358·sqrt((n+m)/(n·m)) and the verdict — the classical,
    binning-free complement to dq2 (PSI needs bin choices; KS does
    not). EXACT at scale without a global window: the empirical CDFs
    are integer prefix sums computed with the bucketed two-pass from
    operators/sampling (equal-width value buckets are a monotone
    prefix of the sort key → per-bucket totals → exclusive offsets
    over ≤64 aggregate rows → within-bucket cumsum), bit-identical to
    the oracle's naive ORDER BY window at any parallelism. The argmax
    row comes off a top-1 TakeOrdered, never a global sort. Integer
    cumulative counts make the CDFs exact, so the max position and
    tie-break (smallest value) agree across engines at full double
    precision."""
    B = 64
    # NULL value is an explicit exclusion on BOTH sides: a NULL group
    # would otherwise enter the CDF at a different end per engine
    # (Spark windows order NULLS FIRST, DuckDB NULLS LAST) — the same
    # latent-divergence class as the r6 avgdl/q95 fixes. KS is over
    # observed values; missingness belongs to dq1's audit, not here.
    ev = t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    v = ev.groupBy("value").agg(
        F.sum(F.when(F.col("event_id") % 2 == 0, 1).otherwise(0)).alias("n_ref"),
        F.sum(F.when(F.col("event_id") % 2 == 1, 1).otherwise(0)).alias("n_cur"),
    )
    bounds = ev.agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    v = v.crossJoin(F.broadcast(bounds)).withColumn(
        "__b",
        F.coalesce(
            F.least(
                F.floor(
                    (F.col("value") - F.col("lo"))
                    / ((F.col("hi") - F.col("lo")) / B)
                ).cast("int"),
                F.lit(B - 1),
            ),
            F.lit(0),
        ),
    )
    w_off = W.orderBy("__b").rowsBetween(W.unboundedPreceding, -1)
    off = v.groupBy("__b").agg(
        F.sum("n_ref").alias("br"), F.sum("n_cur").alias("bc")
    ).select(
        "__b",
        F.coalesce(F.sum("br").over(w_off), F.lit(0)).alias("offr"),
        F.coalesce(F.sum("bc").over(w_off), F.lit(0)).alias("offc"),
    )
    w_cum = W.partitionBy("__b").orderBy("value").rowsBetween(
        W.unboundedPreceding, 0
    )
    c = v.join(F.broadcast(off), "__b").select(
        "value",
        (F.sum("n_ref").over(w_cum) + F.col("offr")).alias("cum_ref"),
        (F.sum("n_cur").over(w_cum) + F.col("offc")).alias("cum_cur"),
    )
    tot = v.agg(
        F.sum("n_ref").cast("bigint").alias("t_ref"),
        F.sum("n_cur").cast("bigint").alias("t_cur"),
    )
    crit = 1.358 * F.sqrt(
        (F.col("t_ref") + F.col("t_cur")).cast("double")
        / (F.col("t_ref").cast("double") * F.col("t_cur").cast("double"))
    )
    d = c.crossJoin(F.broadcast(tot)).select(
        "value",
        "t_ref",
        "t_cur",
        F.abs(
            F.col("cum_ref").cast("double") / F.col("t_ref").cast("double")
            - F.col("cum_cur").cast("double") / F.col("t_cur").cast("double")
        ).alias("dd"),
        crit.alias("crit"),
    )
    top = d.orderBy(F.col("dd").desc(), F.col("value").asc()).limit(1)
    return top.select(
        F.col("t_ref").alias("n_ref"),
        F.col("t_cur").alias("n_cur"),
        r6(F.col("dd"), "ks_d"),
        F.col("value").alias("ks_at"),
        r6(F.col("crit"), "crit_05"),
        (F.round(F.col("dd"), 6) > F.round(F.col("crit"), 6))
        .cast("int")
        .alias("drifted"),
    )


@register(
    "dq11_row_quarantine",
    oracle="""
    WITH checked AS (
      SELECT event_id, event_type,
             CASE WHEN event_type IS NULL OR event_type NOT IN
                  ('view', 'click', 'purchase', 'signup')
                  THEN 'bad_enum' END AS r1,
             CASE WHEN value IS NULL THEN 'null_value' END AS r2,
             CASE WHEN value > 400 THEN 'high_value' END AS r3
      FROM events
    )
    SELECT event_id, event_type,
           CONCAT_WS(',', r1, r2, r3) AS reasons,
           CAST((CASE WHEN r1 IS NOT NULL THEN 1 ELSE 0 END)
              + (CASE WHEN r2 IS NOT NULL THEN 1 ELSE 0 END)
              + (CASE WHEN r3 IS NOT NULL THEN 1 ELSE 0 END) AS INT)
             AS n_reasons
    FROM checked
    WHERE r1 IS NOT NULL OR r2 IS NOT NULL OR r3 IS NOT NULL
    """,
)
def dq11_row_quarantine(spark, sf_dir):
    """Row-level quarantine — the bad-row SIPHON that complements
    dq1's aggregate audit: every violating row is emitted with the
    full comma-joined reason list (fixed rule order, so multi-reason
    rows like an 'error'-typed event with value > 400 hash
    deterministically) instead of being silently dropped or merely
    counted. The write-side pattern at 100 TB: main =
    df.filter(n_reasons = 0) continues the pipeline, quarantine lands
    in a side table for replay after the upstream fix — one scan,
    both outputs, no second pass. NULL semantics pinned on both
    engines: CONCAT_WS skips NULL reason slots (Spark and DuckDB
    agree) and the range rule's NULL comparison is made explicit by
    the dedicated null_value rule, so a NULL value row is quarantined
    as null_value — never dropped by three-valued logic."""
    ev = t(spark, sf_dir, "events")
    rules = [
        (
            "bad_enum",
            F.col("event_type").isNull()
            | ~F.col("event_type").isin("view", "click", "purchase", "signup"),
        ),
        ("null_value", F.col("value").isNull()),
        ("high_value", F.col("value") > 400),
    ]
    reason_slots = [F.when(cond, F.lit(code)) for code, cond in rules]
    n_reasons = sum(
        F.when(cond, 1).otherwise(0) for _, cond in rules
    )
    return (
        ev.select(
            "event_id",
            "event_type",
            F.concat_ws(",", *reason_slots).alias("reasons"),
            n_reasons.cast("int").alias("n_reasons"),
        )
        .filter(F.col("n_reasons") >= 1)
    )


@register(
    "dq12_winsorize",
    oracle="""
    WITH p AS (
      SELECT event_type,
             quantile_cont(value, 0.01) AS p01,
             quantile_cont(value, 0.99) AS p99
      FROM events WHERE value IS NOT NULL GROUP BY event_type
    )
    SELECT e.event_type,
           ROUND(p.p01, 6) + 0 AS p01,
           ROUND(p.p99, 6) + 0 AS p99,
           CAST(SUM(CASE WHEN e.value < p.p01 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_clipped_low,
           CAST(SUM(CASE WHEN e.value > p.p99 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_clipped_high,
           ROUND(SUM(CAST(ROUND(e.value * 100, 0) AS BIGINT)) / 100.0
                 / COUNT(*), 6) + 0 AS mean_before,
           ROUND((SUM(CASE WHEN e.value >= p.p01 AND e.value <= p.p99
                           THEN CAST(ROUND(e.value * 100, 0) AS BIGINT)
                           ELSE 0 END) / 100.0
                  + SUM(CASE WHEN e.value < p.p01 THEN 1 ELSE 0 END) * p.p01
                  + SUM(CASE WHEN e.value > p.p99 THEN 1 ELSE 0 END) * p.p99)
                 / COUNT(*), 6) + 0 AS mean_after
    FROM events e JOIN p ON e.event_type = p.event_type
    WHERE e.value IS NOT NULL
    GROUP BY e.event_type, p.p01, p.p99
    """,
)
def dq12_winsorize(spark, sf_dir):
    """Per-group winsorization audit — the outlier-clipping step of a
    feature pipeline: exact interpolated P1/P99 per event_type (Spark
    ``percentile`` and DuckDB ``quantile_cont`` share the linear-
    interpolation definition), counts clipped on each side, and the
    mean before/after clipping. The after-mean is DECOMPOSED so no
    engine ever sums interpolated doubles in arrival order:
    cent-exact sum of the unclipped middle + n_low*p01 + n_high*p99,
    each term deterministic — the same discipline as the _util money
    convention, extended to derived bounds. Two passes (percentile
    agg, broadcast back, one summary agg); the percentile state is
    O(groups), the summary is map-side combined. NULL values are
    excluded on both sides (dq1/dq11 own missingness)."""
    ev = t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    p = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.01)).alias("p01"),
        F.percentile("value", F.lit(0.99)).alias("p99"),
    )
    j = ev.join(F.broadcast(p), "event_type")
    cents = F.round(F.col("value") * 100, 0).cast("bigint")
    mid_cents = F.sum(
        F.when(
            (F.col("value") >= F.col("p01")) & (F.col("value") <= F.col("p99")),
            cents,
        ).otherwise(F.lit(0))
    )
    n_low = F.sum(F.when(F.col("value") < F.col("p01"), 1).otherwise(0))
    n_high = F.sum(F.when(F.col("value") > F.col("p99"), 1).otherwise(0))
    n = F.count(F.lit(1))
    return j.groupBy("event_type", "p01", "p99").agg(
        n_low.cast("bigint").alias("n_clipped_low"),
        n_high.cast("bigint").alias("n_clipped_high"),
        r6(F.sum(cents) / 100.0 / n, "mean_before"),
        r6(
            (mid_cents / 100.0 + n_low * F.col("p01") + n_high * F.col("p99"))
            / n,
            "mean_after",
        ),
    ).select(
        "event_type",
        r6(F.col("p01"), "p01"),
        r6(F.col("p99"), "p99"),
        "n_clipped_low",
        "n_clipped_high",
        "mean_before",
        "mean_after",
    )


@register(
    "dq13_benford_audit",
    oracle="""
    WITH digits AS (
      SELECT CAST(SUBSTR(CAST(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                              AS VARCHAR), 1, 1) AS INTEGER) AS digit
      FROM lineitem WHERE l_extendedprice > 0
    ),
    obs AS (
      SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM digits GROUP BY digit
    ),
    tot AS (SELECT CAST(SUM(n) AS DOUBLE) AS total FROM obs),
    spine AS (SELECT UNNEST(range(1, 10)) AS digit)
    SELECT s.digit,
           COALESCE(o.n, 0) AS n,
           ROUND(COALESCE(o.n, 0) / t.total, 6) AS obs_frac,
           ROUND(LOG10(1.0 + 1.0 / s.digit), 6) AS exp_frac,
           ROUND(POWER(COALESCE(o.n, 0) - t.total * LOG10(1.0 + 1.0 / s.digit), 2)
                 / (t.total * LOG10(1.0 + 1.0 / s.digit)), 4) AS chi2_term
    FROM spine s LEFT JOIN obs o ON o.digit = s.digit CROSS JOIN tot t
    ORDER BY s.digit
    """,
)
def dq13_benford_audit(spark, sf_dir):
    """Benford first-significant-digit audit — the forensic
    fabricated-data detector every financial/ingest QA suite carries
    (Nigrini's digit analysis, public): observed first-digit
    distribution of line amounts vs the Benford expectation
    log10(1+1/d), with per-digit chi-square contributions so the
    drilling-down is already done (a synthetic price generator screams
    at d=1). The audit does NOT assert conformance — TPC-H prices are
    formula-generated and non-Benford by construction; it reports the
    evidence, and the gate hashes the evidence. First digit is taken
    from the INTEGER cents string (exact: avoids the FLOOR(LOG10(x))
    float edge at powers of ten); a static 1-9 spine keeps absent
    digits visible as zeros (the dq5 empty-bucket discipline). One
    scan, 9-row output — free at any scale."""
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_extendedprice") > 0)
    cents = F.round(F.col("l_extendedprice") * 100, 0).cast("bigint")
    digit = F.substring(cents.cast("string"), 1, 1).cast("int")
    obs = li.select(digit.alias("digit")).groupBy("digit").agg(
        F.count(F.lit(1)).alias("n")
    )
    spine = spark.range(1, 10).select(F.col("id").cast("int").alias("digit"))
    tot = obs.agg(F.sum("n").cast("double").alias("total"))
    exp_frac = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit"))
    n = F.coalesce(F.col("n"), F.lit(0))
    return (
        spine.join(obs, "digit", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "digit",
            n.alias("n"),
            F.round(n / F.col("total"), 6).alias("obs_frac"),
            F.round(exp_frac, 6).alias("exp_frac"),
            F.round(
                F.pow(n - F.col("total") * exp_frac, F.lit(2))
                / (F.col("total") * exp_frac),
                4,
            ).alias("chi2_term"),
        )
        .orderBy("digit")
    )


_DQ14_FDS = [
    # (name, table, lhs, rhs) — one held-by-design FD, one PK-backed
    # FD, and one that FAILS on purpose (an order spans return flags)
    ("nation_to_region", "nation", "n_nationkey", "n_regionkey"),
    ("cust_to_nation", "customer", "c_custkey", "c_nationkey"),
    ("order_to_returnflag", "lineitem", "l_orderkey", "l_returnflag"),
]


def _dq14_oracle() -> str:
    parts = []
    for name, tbl, lhs, rhs in _DQ14_FDS:
        parts.append(f"""
    SELECT '{name}' AS fd,
           CAST(COUNT(*) AS BIGINT) AS n_lhs_groups,
           CAST(COALESCE(SUM(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END), 0) AS BIGINT)
             AS n_violating_groups,
           CAST(COALESCE(MAX(n_rhs), 0) AS INT) AS max_distinct_rhs,
           CAST(COALESCE(MAX(n_rhs), 0) <= 1 AS INT) AS holds
    FROM (SELECT {lhs}, COUNT(DISTINCT {rhs}) AS n_rhs
          FROM {tbl} GROUP BY {lhs})""")
    return "\nUNION ALL\n".join(parts)


@register("dq14_functional_dependency", oracle=_dq14_oracle())
def dq14_functional_dependency(spark, sf_dir):
    """Functional-dependency audit (the Deequ/constraint-suggestion
    primitive next to dq1's declarative checks): for each candidate
    FD A → B, count LHS groups whose RHS is not single-valued. The
    suite carries one FD that holds by design (nation → region), one
    PK-backed FD (customer → nation), and one that FAILS on purpose
    (an order spans return flags) so the violation path is always
    exercised — an audit whose red path never fires is untested. Per
    FD: one groupBy(A) agg countDistinct(B) — map-side combinable,
    output O(candidates), no cross-table shuffle. At 100 TB, FD
    auditing is how schema contracts (dq9) get DISCOVERED before
    they're declared."""
    out = None
    for name, tbl, lhs, rhs in _DQ14_FDS:
        g = (
            t(spark, sf_dir, tbl)
            .groupBy(lhs)
            .agg(F.count_distinct(F.col(rhs)).alias("n_rhs"))
        )
        row = g.agg(
            F.lit(name).alias("fd"),
            F.count(F.lit(1)).alias("n_lhs_groups"),
            F.coalesce(
                F.sum(F.when(F.col("n_rhs") > 1, 1).otherwise(0)), F.lit(0)
            ).cast("bigint").alias("n_violating_groups"),
            # COALESCE on BOTH engines: an empty table holds every FD
            # vacuously (real zeros, never the NULLs a bare MAX gives)
            F.coalesce(F.max("n_rhs"), F.lit(0)).cast("int").alias("max_distinct_rhs"),
            (F.coalesce(F.max("n_rhs"), F.lit(0)) <= 1)
            .cast("int")
            .alias("holds"),
        )
        out = row if out is None else out.unionByName(row)
    return out


@register(
    "dq15_cusum_shift",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) / 100.0 / COUNT(*)
               AS daily_mean
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
      GROUP BY 1
    ),
    stats AS (
      SELECT AVG(daily_mean) AS mu, STDDEV_POP(daily_mean) AS sigma
      FROM daily
    ),
    z AS (
      SELECT day, n, daily_mean,
             ROUND((daily_mean - s.mu) / s.sigma, 6) AS z
      FROM daily CROSS JOIN stats s
    ),
    pre AS (
      SELECT day, n, daily_mean, z,
             SUM(z - 0.5) OVER (ORDER BY day
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS p
      FROM z
    )
    SELECT day, n, ROUND(daily_mean, 6) AS daily_mean, z,
           ROUND(p - LEAST(0.0, MIN(p) OVER (ORDER BY day
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), 6)
             AS cusum,
           CAST(p - LEAST(0.0, MIN(p) OVER (ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) > 4.0
                AS INT) AS alarm
    FROM pre
    """,
)
def dq15_cusum_shift(spark, sf_dir):
    """One-sided CUSUM level-shift detector over the daily-mean series
    (Page 1954 — the SEQUENTIAL drift family next to the two-sample
    tests: KS dq10, PSI dq2, chi-square ml20; fires as soon as a
    persistent upward shift accumulates, not at a fixed comparison
    point). The recursion S_t = max(0, S_{t-1} + z_t - k) is
    deliberately NOT computed as a loop: with prefix sums P_t it has
    the closed form S_t = P_t - min(0, min_{j<=t} P_j), which is two
    ordered windows over the O(days) daily relation — the global
    window is inherent to sequential detection and its input is the
    day spine, never the fact table (enrolled in the tiny-input
    runtime lint). z is rounded at 6 dp BEFORE accumulation on both
    engines, so the ordered prefix fold is bit-reproducible;
    reference k = 0.5 sigma, alarm threshold h = 4 sigma (the
    textbook defaults)."""
    from pyspark.sql import Window as W

    ev = t(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("value").isNotNull()
    )
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).alias("n"),
        (
            F.sum(F.round(F.col("value") * 100, 0).cast("bigint"))
            / 100.0
            / F.count(F.lit(1))
        ).alias("daily_mean"),
    )
    stats = daily.agg(
        F.avg("daily_mean").alias("mu"), F.stddev_pop("daily_mean").alias("sigma")
    )
    z = daily.crossJoin(F.broadcast(stats)).select(
        "day",
        "n",
        "daily_mean",
        F.round((F.col("daily_mean") - F.col("mu")) / F.col("sigma"), 6).alias("z"),
    )
    w = W.orderBy("day").rowsBetween(W.unboundedPreceding, W.currentRow)
    pre = z.withColumn("p", F.sum(F.col("z") - F.lit(0.5)).over(w))
    cusum = F.col("p") - F.least(F.lit(0.0), F.min("p").over(w))
    return pre.select(
        "day",
        "n",
        F.round("daily_mean", 6).alias("daily_mean"),
        "z",
        F.round(cusum, 6).alias("cusum"),
        (cusum > 4.0).cast("int").alias("alarm"),
    )


@register(
    "dq16_ewma_control",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) / 100.0 / COUNT(*)
               AS x
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
      GROUP BY 1
    ),
    idx AS (
      SELECT day, n, x,
             CAST(ROW_NUMBER() OVER (ORDER BY day) AS INT) AS i
      FROM daily
    ),
    stats AS (
      SELECT AVG(x) AS mu, STDDEV_POP(x) AS sigma, COUNT(*) AS total
      FROM idx
    ),
    z AS (
      SELECT day, n, i, ROUND((x - s.mu) / s.sigma, 6) AS z
      FROM idx CROSS JOIN stats s
    ),
    pre AS (
      SELECT day, n, i, z,
             SUM(z / POWER(0.7, i)) OVER (ORDER BY i
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS u,
             FIRST_VALUE(z) OVER (ORDER BY i
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS z1
      FROM z
    )
    SELECT day, n, z,
           ROUND(CASE WHEN i = 1 THEN z
                 ELSE 0.3 * POWER(0.7, i) * (u - z1 / 0.7)
                      + POWER(0.7, i - 1) * z1 END, 6) AS ewma,
           CAST(ABS(CASE WHEN i = 1 THEN z
                ELSE 0.3 * POWER(0.7, i) * (u - z1 / 0.7)
                     + POWER(0.7, i - 1) * z1 END) >
                3.0 * SQRT(0.3 / (2 - 0.3)
                           * (1 - POWER(0.49, CAST(i AS DOUBLE))))
                AS INT) AS alarm
    FROM pre
    """,
)
def dq16_ewma_control(spark, sf_dir):
    """EWMA control chart over the standardized daily-mean series
    (Roberts 1959 — the small-persistent-shift detector between
    Shewhart's per-point limits and CUSUM's dq15 accumulation; the
    fourth member of the drift family after PSI/KS/CUSUM). The
    recursion s_t = a·z_t + (1−a)·s_{t−1} is computed CLOSED-FORM:
    with u_i = z_i/(1−a)^i and prefix sums U_t,
    s_t = a·(1−a)^t·(U_t − u_1) + (1−a)^{t−1}·z_1 — two ordered
    windows over the O(days) spine, no loop ((1−a)^−t stays ≤ 7e4 for
    a month of days — no overflow at this horizon; for year-long
    horizons chunk the series, the standard trick). Control limits
    use the exact time-varying EWMA variance a/(2−a)·(1−(1−a)^{2t});
    a = 0.3, 3-sigma. z is rounded before accumulation (the dq15
    discipline) so the ordered fold is bit-reproducible."""
    from pyspark.sql import Window as W

    a = 0.3
    ev = t(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("value").isNotNull()
    )
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).alias("n"),
        (
            F.sum(F.round(F.col("value") * 100, 0).cast("bigint"))
            / 100.0
            / F.count(F.lit(1))
        ).alias("x"),
    )
    stats = daily.agg(
        F.avg("x").alias("mu"), F.stddev_pop("x").alias("sigma")
    )
    wd = W.orderBy("day")
    z = (
        daily.crossJoin(F.broadcast(stats))
        .withColumn("i", F.row_number().over(wd))
        .select(
            "day",
            "n",
            "i",
            F.round((F.col("x") - F.col("mu")) / F.col("sigma"), 6).alias("z"),
        )
    )
    wcum = W.orderBy("i").rowsBetween(W.unboundedPreceding, W.currentRow)
    pre = z.withColumn(
        "u", F.sum(F.col("z") / F.pow(F.lit(1 - a), F.col("i"))).over(wcum)
    ).withColumn("z1", F.first("z").over(wcum))
    ewma = F.when(F.col("i") == 1, F.col("z")).otherwise(
        F.lit(a)
        * F.pow(F.lit(1 - a), F.col("i"))
        * (F.col("u") - F.col("z1") / F.lit(1 - a))
        + F.pow(F.lit(1 - a), F.col("i") - 1) * F.col("z1")
    )
    limit = F.lit(3.0) * F.sqrt(
        F.lit(a / (2 - a))
        * (F.lit(1.0) - F.pow(F.lit((1 - a) ** 2), F.col("i").cast("double")))
    )
    return pre.select(
        "day",
        "n",
        "z",
        F.round(ewma, 6).alias("ewma"),
        (F.abs(ewma) > limit).cast("int").alias("alarm"),
    )


@register(
    "dq17_embedding_drift",
    oracle="""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    hb AS (SELECT (MAX(vec_id) + 1) // 2 AS half FROM e),
    ex AS (
      SELECT CASE WHEN vec_id < (SELECT half FROM hb) THEN 0 ELSE 1 END AS cur,
             t.dim, v[t.dim] AS x
      FROM e, UNNEST(range(1, len(v) + 1)) AS t(dim)
    ),
    stats AS (
      SELECT dim, cur, AVG(x) AS m, VAR_SAMP(x) AS s2, COUNT(*) AS n
      FROM ex GROUP BY dim, cur
    )
    SELECT CAST(r.dim AS INT) AS dim,
           ROUND(r.m, 6) AS mean_ref,
           ROUND(c.m, 6) AS mean_cur,
           ROUND(c.m - r.m, 6) AS delta,
           ROUND((c.m - r.m) / sqrt(r.s2 / r.n + c.s2 / c.n), 4) AS z,
           CAST(CASE WHEN abs((c.m - r.m) / sqrt(r.s2 / r.n + c.s2 / c.n)) > 3
                THEN 1 ELSE 0 END AS INT) AS drifted
    FROM stats r JOIN stats c ON r.dim = c.dim AND r.cur = 0 AND c.cur = 1
    """,
)
def dq17_embedding_drift(spark, sf_dir):
    """Embedding-population drift monitor — the dq-family face of the
    vector tier (dq2/dq10 watch scalar columns; a training pipeline
    must also watch its FEATURE VECTORS between snapshot and serving
    populations, or a silently-updated encoder poisons every
    downstream similarity/dedup threshold). Reference = first half of
    the embeddings table, current = second half; per-DIMENSION Welch
    z on the mean shift, drifted = |z| > 3.

    Plan shape at 100 TB: posexplode(64 dims) feeds a groupBy(dim,
    population) whose map-side partial aggregation reduces the
    shuffle to 128 rows per input partition (sum/sumsq/count per
    dim) — the same single-pass profile posture as dq1/dq2; no
    window, no join bigger than 64×2 rows."""
    emb = t(spark, sf_dir, "embeddings")
    half = (emb.agg(F.max("vec_id")).collect()[0][0] + 1) // 2  # scalar anchor
    ex = emb.select(
        (F.col("vec_id") >= half).cast("int").alias("cur"),
        F.posexplode(F.col("embedding").cast("array<double>")).alias(
            "dim0", "x"
        ),
    ).select("cur", (F.col("dim0") + 1).alias("dim"), "x")  # 1-based like SQL
    # ONE corpus pass: conditional aggregates per population instead
    # of filtering the stats subtree twice (the two-branch form
    # re-executed the explode+partial-agg per side — visible as two
    # Generate/HashAggregate subtrees in the plan)
    ref_x = F.when(F.col("cur") == 0, F.col("x"))
    cur_x = F.when(F.col("cur") == 1, F.col("x"))
    stats = ex.groupBy("dim").agg(
        F.avg(ref_x).alias("m_r"),
        F.var_samp(ref_x).alias("s2_r"),
        F.count(ref_x).alias("n_r"),
        F.avg(cur_x).alias("m_c"),
        F.var_samp(cur_x).alias("s2_c"),
        F.count(cur_x).alias("n_c"),
    )
    z = (F.col("m_c") - F.col("m_r")) / F.sqrt(
        F.col("s2_r") / F.col("n_r") + F.col("s2_c") / F.col("n_c")
    )
    return stats.select(
        F.col("dim").cast("int").alias("dim"),
        F.round("m_r", 6).alias("mean_ref"),
        F.round("m_c", 6).alias("mean_cur"),
        F.round(F.col("m_c") - F.col("m_r"), 6).alias("delta"),
        F.round(z, 4).alias("z"),
        (F.abs(z) > 3).cast("int").alias("drifted"),
    )


@register(
    "dq18_payload_integrity",
    # Closed-form oracle: the corruption is PLANTED by doc_id rule
    # (order matters: %11 truncation wins over %13 magic damage for
    # ids divisible by both), the intact payloads' container is the
    # mm8 fixture's parity rule — so the oracle knows every verdict
    # WITHOUT decoding a byte, and the gate checks that the Spark
    # side's REAL header/length inspection recovers exactly the
    # planted truth (the mm8/mm10 gate pattern).
    oracle="""
    WITH v AS (
      SELECT source,
             CASE WHEN doc_id % 11 = 0 THEN 'truncated'
                  WHEN doc_id % 13 = 0 THEN 'unknown_magic'
                  WHEN (doc_id // 40) % 2 = 0 THEN 'valid_ppm'
                  ELSE 'valid_bmp' END AS verdict
      FROM documents
    )
    SELECT source, verdict, COUNT(*) AS n_docs,
           ROUND(CAST(COUNT(*) AS DOUBLE) /
                 SUM(COUNT(*)) OVER (PARTITION BY source), 6) AS share
    FROM v GROUP BY source, verdict
    """,
)
def dq18_payload_integrity(spark, sf_dir):
    """Media-ingest quarantine audit — the dq-family face of the
    multimodal tier: classify every payload by REAL byte inspection
    (magic sniff + the container's own declared size vs actual byte
    count — operators/multimodal.payload_integrity) and report the
    per-source verdict mix. A truncated or magic-corrupted blob must
    be routed out BEFORE decode/dedup stages, not crash a decoder
    mid-job; the share column is what a pipeline alarms on (a source
    whose truncation share jumps = a broken crawler or transfer).

    Fixture: the mm8 image payloads with planted damage — doc_id % 11
    truncated to 60% (headers survive, so only the length-vs-declared
    check catches it), else doc_id % 13 magic bytes overwritten. Both
    injections are pure Spark expressions over the binary column
    (substring/concat work on BINARY — no extra Python pass); the
    classifier is the only Arrow stage, and bytes never shuffle."""
    from oxi_diel_db_spark.operators.multimodal import (
        neardup_fixture_table,
        payload_integrity,
    )

    docs = t(spark, sf_dir, "documents").select("doc_id", "source")
    media = neardup_fixture_table(docs.select("doc_id"))
    damaged = media.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 11 == 0,
            F.expr(
                "substring(payload, 1, cast(octet_length(payload) * 0.6 AS INT))"
            ),
        )
        .when(
            F.col("doc_id") % 13 == 0,
            F.expr(
                "concat(X'5858', substring(payload, 3, octet_length(payload)))"
            ),
        )
        .otherwise(F.col("payload"))
        .alias("payload"),
    )
    verdicts = payload_integrity(damaged).join(docs, "doc_id")
    counts = verdicts.groupBy("source", "verdict").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    return counts.select(
        "source",
        "verdict",
        "n_docs",
        F.round(
            F.col("n_docs").cast("double")
            / F.sum("n_docs").over(W.partitionBy("source")),
            6,
        ).alias("share"),
    )


def _dq19_oracle() -> str:
    """Composed verbatim from the registered d3/p20 oracles (the
    c5/ml16 pattern — the audit can never drift from the dedup pairs
    or the split assignment it audits)."""
    from oxi_diel_db_spark.queries import REGISTRY
    from oxi_diel_db_spark.queries import llm_ops  # noqa: F401 (registers d3/p20)

    d3 = REGISTRY["d3_minhash_lsh"].oracle
    p20 = REGISTRY["p20_shard_export"].oracle
    return f"""
    WITH prs AS ({d3}),
    sp AS ({p20})
    SELECT p.doc_a, p.doc_b,
           sa.split AS split_a, sb.split AS split_b,
           p.est_jaccard,
           CAST(sa.split <> sb.split AS INT) AS leaked
    FROM prs p
    JOIN sp sa ON sa.doc_id = p.doc_a
    JOIN sp sb ON sb.doc_id = p.doc_b
    """


@register("dq19_split_leakage_audit", oracle=_dq19_oracle())
def dq19_split_leakage_audit(spark, sf_dir):
    """Train/val split-leakage audit — the DETECTION face of p12's
    leakage-safe split (which PREVENTS): after p20 assigns every doc a
    shard + split, any near-duplicate pair (d3's banded MinHash, the
    100 TB dedup default) whose members landed in DIFFERENT splits is
    contamination — the val member leaks training signal. Real
    pipelines run exactly this audit before trusting held-out metrics
    (test-set decontamination's intra-corpus sibling; d9/d10 audit
    against EXTERNAL benchmarks, this audits the corpus against its
    own split). Pair-level verdicts under the full value hash:
    (pair, both splits, similarity, leaked flag) — builders AND
    oracles composed verbatim from the registered d3 and p20 gates.

    Plan shape: d3's banded self-join produces O(near-dup pairs), the
    split table joins in by doc key twice — two key-equi joins over
    pair rows, no new shuffle class; at 100 TB the audit costs one
    dedup pass it shares with curation anyway.

    Deployment note (r12 verdict watch item): this gate rebuilds
    p20_shard_export inline — including its partitioned parquet write
    + read-back — because compositional oracle reuse is the registry's
    verification pattern; a DEPLOYED audit reads the already-written
    export tree instead (the same `spark.read.schema(...).parquet`
    p20 uses) and skips the rebuild entirely."""
    from oxi_diel_db_spark.queries.llm_ops import (
        d3_minhash_lsh,
        p20_shard_export,
    )

    pairs = d3_minhash_lsh(spark, sf_dir).select(
        "doc_a", "doc_b", "est_jaccard"
    )
    # roundtrip=False (r13 opt): the audit needs the split VALUES, not
    # the parquet tree — skip p20's write+read-back (see its docstring's
    # deployment note; values identical by p20's own fidelity gate)
    splits = p20_shard_export(spark, sf_dir, roundtrip=False).select(
        "doc_id", "split"
    )
    a = splits.select(
        F.col("doc_id").alias("doc_a"), F.col("split").alias("split_a")
    )
    b = splits.select(
        F.col("doc_id").alias("doc_b"), F.col("split").alias("split_b")
    )
    return (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "split_a",
            "split_b",
            "est_jaccard",
            (F.col("split_a") != F.col("split_b")).cast("int").alias("leaked"),
        )
    )
