"""Scans, projections, filters, sorts, limits, set ops, scalar functions.

SURVEY.md §2.1 (S2, S8), §2.2 (P1, P4, P6), §2.6 (O2, O3), §2.7,
§2.8 (F1, F2, F5, F9, F10, F11). Reference semantics sites are cited per
query; execution is Spark-first (declarative plans, pushdown-friendly).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from oxi_diel_db_spark.queries import register
from oxi_diel_db_spark.queries._util import (
    avg_money,
    sql_avg_money,
    sql_sum_money,
    sum_money,
    t,
)

# --------------------------------------------------------------------------
# Flagship: TPC-H-Q1-shaped pricing summary (S8 scan → P6 filter → A8 agg).
# Scale posture: single scan, partial aggregation map-side, 6-group output;
# the only shuffle is the tiny final agg. Filter + 7-column projection push
# into the parquet reader (verified in tests/test_plans.py).
# --------------------------------------------------------------------------


@register(
    "q01_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT)          AS sum_qty,
           {sql_sum_money('l_extendedprice')}                       AS sum_base_price,
           {sql_sum_money('l_extendedprice * (1 - l_discount)')}    AS sum_disc_price,
           {sql_sum_money('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
           {sql_avg_money('l_quantity')}                            AS avg_qty,
           {sql_avg_money('l_extendedprice')}                       AS avg_price,
           ROUND(AVG(l_discount), 6)                                AS avg_disc,
           COUNT(*)                                                 AS count_order
    FROM lineitem
    WHERE l_shipdate <= DATE '2001-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q01_pricing_summary(spark, sf_dir):
    """Pricing summary report — the engine's flagship aggregation.

    Reference parity: the explode→reduce feature aggregations of
    ml_prediction.py:50-51 generalize to grouped SUM/AVG/COUNT; this is
    the canonical Spark hash-aggregate (partial+final) shape.
    """
    l = t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("2001-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"),
            sum_money("l_extendedprice", "sum_base_price"),
            sum_money(disc_price, "sum_disc_price"),
            sum_money(charge, "sum_charge"),
            avg_money("l_quantity", "avg_qty"),
            avg_money("l_extendedprice", "avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "q02_point_lookup",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate
    FROM orders WHERE o_orderkey = 7
    """,
)
def q02_point_lookup(spark, sf_dir):
    """Point lookup by key (S2: main.py:26-29 opens one record by mp_id).

    Scale posture: the equality predicate pushes to parquet row-group
    stats; on a key-partitioned/bucketed 100 TB table this prunes to one
    file (partition pruning), mirroring the reference's one-file read.
    """
    return t(spark, sf_dir, "orders").filter(F.col("o_orderkey") == 7).select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate"
    )


@register(
    "q03_predicates",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_returnflag
    FROM lineitem
    WHERE l_quantity BETWEEN 10 AND 20
      AND l_returnflag IN ('A', 'R')
      AND l_shipdate >= DATE '1996-01-01'
      AND (l_discount < 0.03 OR l_tax > 0.06)
      AND l_extendedprice IS NOT NULL
    """,
)
def q03_predicates(spark, sf_dir):
    """Full predicate algebra (P6): BETWEEN/IN/>=/OR/IS NOT NULL.

    All conjuncts are parquet-pushable (shown in PushedFilters); the OR
    branch stays a scan-level filter. No shuffle at all.
    """
    l = t(spark, sf_dir, "lineitem")
    return l.filter(
        F.col("l_quantity").between(10, 20)
        & F.col("l_returnflag").isin("A", "R")
        & (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
        & ((F.col("l_discount") < 0.03) | (F.col("l_tax") > 0.06))
        & F.col("l_extendedprice").isNotNull()
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_returnflag")


@register(
    "q04_case_buckets",
    oracle="""
    SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
                WHEN o_totalprice < 150000 THEN 'medium'
                ELSE 'large' END AS bucket,
           COUNT(*) AS n_orders,
           COUNT(DISTINCT o_custkey) AS n_customers
    FROM orders GROUP BY 1
    """,
)
def q04_case_buckets(spark, sf_dir):
    """CASE-based dispatch (P4: ml_prediction.py:64-67 validates/dispatches
    on dielectric_type/model_type — re-expressed as vectorized CASE WHEN)."""
    o = t(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 150000, "medium")
        .otherwise("large")
        .alias("bucket")
    )
    return o.groupBy(bucket).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_customers"),
    )


@register(
    "q05_global_sort",
    oracle="""
    SELECT o_orderkey, o_orderpriority, o_orderdate, o_totalprice
    FROM orders
    ORDER BY o_orderpriority DESC NULLS LAST, o_orderdate ASC, o_orderkey ASC
    LIMIT 100
    """,
)
def q05_global_sort(spark, sf_dir):
    """Global multi-key sort + limit (O2). o_orderkey tie-break makes the
    LIMIT row-set deterministic. Spark plans TakeOrderedAndProject —
    per-partition top-k then merge, no full global sort at scale."""
    return (
        t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderpriority", "o_orderdate", "o_totalprice")
        .orderBy(
            F.col("o_orderpriority").desc_nulls_last(),
            F.col("o_orderdate").asc(),
            F.col("o_orderkey").asc(),
        )
        .limit(100)
    )


@register(
    "q06_topk",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 50
    """,
)
def q06_topk(spark, sf_dir):
    """ORDER BY ... LIMIT k (O3) → TakeOrderedAndProject (heap per
    partition, driver merge of k·P rows — scales to any row count)."""
    return (
        t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber")
        .limit(50)
    )


@register(
    "q07_union_all",
    oracle="""
    SELECT c_nationkey AS nationkey, 'customer' AS side FROM customer
    UNION ALL
    SELECT s_nationkey AS nationkey, 'supplier' AS side FROM supplier
    """,
)
def q07_union_all(spark, sf_dir):
    """UNION ALL (§2.7) — no shuffle, plain concatenation of scans."""
    c = t(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey"), F.lit("customer").alias("side")
    )
    s = t(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey"), F.lit("supplier").alias("side")
    )
    return c.unionByName(s)


@register(
    "q08_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def q08_intersect(spark, sf_dir):
    """INTERSECT (distinct semantics) — hash-partitioned both sides."""
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@register(
    "q09_except",
    oracle="""
    SELECT o_custkey AS custkey FROM orders
    EXCEPT
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def q09_except(spark, sf_dir):
    """EXCEPT (distinct set semantics → subtract) — J2's id-set-difference
    shape (12 unscored mp_ids) generalized: customers who ordered but
    never had an 'F'-status order (non-empty at every SF)."""
    o = t(spark, sf_dir, "orders")
    all_c = o.select(F.col("o_custkey").alias("custkey"))
    f_c = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    return all_c.subtract(f_c)


@register(
    "q10_string_funcs",
    oracle="""
    SELECT p_partkey,
           UPPER(p_name)                                   AS name_upper,
           LOWER(p_brand)                                  AS brand_lower,
           SUBSTRING(p_type, 1, 3)                         AS type_prefix,
           CONCAT(p_brand, ':', p_type)                    AS brand_type,
           REPLACE(p_name, ' ', '_')                       AS name_snake,
           LENGTH(p_name)                                  AS name_len,
           CASE WHEN p_name LIKE '%gold%' THEN 1 ELSE 0 END AS has_gold,
           REGEXP_EXTRACT(p_brand, '#(\\d+)', 1)           AS brand_num
    FROM part
    """,
)
def q10_string_funcs(spark, sf_dir):
    """String function family (F10 surface; F5's regexp-id-extraction
    pattern appears as brand_num)."""
    p = t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.substring("p_type", 1, 3).alias("type_prefix"),
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("brand_type"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
        F.length("p_name").alias("name_len"),
        F.when(F.col("p_name").like("%gold%"), 1).otherwise(0).alias("has_gold"),
        F.regexp_extract("p_brand", r"#(\d+)", 1).alias("brand_num"),
    )


@register(
    "q11_datetime",
    oracle="""
    SELECT o_orderkey,
           YEAR(o_orderdate)                                    AS order_year,
           MONTH(o_orderdate)                                   AS order_month,
           DAYOFMONTH(o_orderdate)                              AS order_day,
           CAST(DATE_TRUNC('month', o_orderdate) AS DATE)       AS month_start,
           DATEDIFF('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since_epoch_start,
           CAST(o_orderdate + INTERVAL 30 DAY AS DATE)          AS due_date,
           CAST(EPOCH(o_orderdate) AS BIGINT)                   AS epoch_sec
    FROM orders WHERE o_orderkey < 500
    """,
)
def q11_datetime(spark, sf_dir):
    """Date/time function family (F9) over the orders timestamps."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).alias("order_year"),
        F.month(d).alias("order_month"),
        F.dayofmonth(d).alias("order_day"),
        F.date_trunc("month", d).cast("date").alias("month_start"),
        F.datediff(d.cast("date"), F.lit("1995-01-01").cast("date")).alias(
            "days_since_epoch_start"
        ),
        F.date_add(d.cast("date"), 30).alias("due_date"),
        F.unix_timestamp(d).alias("epoch_sec"),
    )


@register(
    "q12_json_extract",
    oracle="""
    SELECT event_id,
           CAST(REGEXP_EXTRACT(props, '"k":\\s*(-?\\d+)', 1) AS INTEGER) AS prop_k
    FROM events WHERE event_id < 1000
    """,
)
def q12_json_extract(spark, sf_dir):
    """JSON extraction (F11: events.props is a JSON string). Spark side
    uses the real JSON path expression; the oracle mirrors it with a
    regexp so the check does not depend on DuckDB's json extension."""
    e = t(spark, sf_dir, "events").filter(F.col("event_id") < 1000)
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("prop_k"),
    )


@register(
    "q13_null_handling",
    oracle="""
    SELECT c_custkey,
           COALESCE(NULLIF(c_mktsegment, 'MACHINERY'), 'OTHER') AS segment_or_other,
           CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS nonneg_bal,
           c_acctbal IS NULL                                    AS bal_is_null,
           IFNULL(CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END, 0.0) AS bal_or_zero
    FROM customer
    """,
)
def q13_null_handling(spark, sf_dir):
    """NULL algebra: NULLIF/COALESCE/IS NULL/IFNULL (P4 fail-fast
    validation re-expressed as null-safe expressions)."""
    c = t(spark, sf_dir, "customer")
    nonneg = F.when(F.col("c_acctbal") < 0, F.lit(None)).otherwise(F.col("c_acctbal"))
    return c.select(
        "c_custkey",
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("MACHINERY")), F.lit("OTHER")).alias(
            "segment_or_other"
        ),
        nonneg.alias("nonneg_bal"),
        F.isnull("c_acctbal").alias("bal_is_null"),
        F.ifnull(nonneg, F.lit(0.0)).alias("bal_or_zero"),
    )


@register(
    "q14_math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(POW(10, l_discount), 6)        AS pow10_disc,
           ROUND(LOG10(l_extendedprice), 6)     AS log10_price,
           ABS(l_discount - l_tax)              AS abs_diff,
           ROUND(SQRT(l_quantity), 6)           AS sqrt_qty,
           ROUND(EXP(l_discount), 6)            AS exp_disc,
           CAST(FLOOR(l_extendedprice) AS BIGINT) AS floor_price,
           CAST(CEIL(l_extendedprice) AS BIGINT)  AS ceil_price,
           CAST(l_quantity AS BIGINT) % 7       AS qty_mod7
    FROM lineitem WHERE l_orderkey < 200
    """,
)
def q14_math_funcs(spark, sf_dir):
    """Math scalar family. F1 is literal reference behavior: main.py:37
    de-logs the model output with 10**pred → pow(10, x) here; log10 is
    the label transform of the reference's training target."""
    l = t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 200)
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.pow(F.lit(10), F.col("l_discount")), 6).alias("pow10_disc"),
        F.round(F.log10("l_extendedprice"), 6).alias("log10_price"),
        F.abs(F.col("l_discount") - F.col("l_tax")).alias("abs_diff"),
        F.round(F.sqrt("l_quantity"), 6).alias("sqrt_qty"),
        F.round(F.exp("l_discount"), 6).alias("exp_disc"),
        F.floor("l_extendedprice").alias("floor_price"),
        F.ceil("l_extendedprice").alias("ceil_price"),
        (F.col("l_quantity").cast("bigint") % 7).alias("qty_mod7"),
    )


@register(
    "q52_intersect_all",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT ALL
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def q52_intersect_all(spark, sf_dir):
    """INTERSECT ALL (§2.7 multiset semantics): each nationkey survives
    min(count_customer, count_supplier) times — the bag variant q08's
    distinct semantics collapses. Spark plans both set ops the same
    shuffle; only the dedup/count logic differs."""
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersectAll(s)


@register(
    "q53_except_all",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT ALL
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def q53_except_all(spark, sf_dir):
    """EXCEPT ALL (multiset difference): each nationkey survives
    max(0, count_customer - count_supplier) times."""
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.exceptAll(s)


@register(
    "q57_recursive_date_spine",
    oracle="""
    WITH RECURSIVE spine(m) AS (
      SELECT DATE '1995-01-01'
      UNION ALL
      SELECT CAST(m + INTERVAL 1 MONTH AS DATE) FROM spine
      WHERE m < DATE '2001-12-01'
    ),
    monthly AS (
      SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
             COUNT(*) AS n_orders,
             SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) / 100.0 AS total_price
      FROM orders GROUP BY 1
    )
    SELECT spine.m AS month,
           COALESCE(monthly.n_orders, 0) AS n_orders,
           COALESCE(monthly.total_price, 0.0) AS total_price
    FROM spine LEFT JOIN monthly ON spine.m = monthly.m
    """,
)
def q57_recursive_date_spine(spark, sf_dir):
    """Gap-filled monthly order series over a recursive-CTE calendar
    spine (WITH RECURSIVE landed in Spark 4.0) — the time-series
    completeness pattern: months with zero orders still appear, which
    no GROUP BY over the fact alone can produce. The spine is 84 rows
    built driver-free in SQL; the fact aggregates once and broadcasts
    against it. Identical recursion runs in DuckDB as the oracle."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders_q57")
    return spark.sql(
        """
        WITH RECURSIVE spine(m) AS (
          SELECT DATE '1995-01-01'
          UNION ALL
          SELECT add_months(m, 1) FROM spine WHERE m < DATE '2001-12-01'
        ),
        monthly AS (
          SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
                 COUNT(*) AS n_orders,
                 SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
                   / CAST(100.0 AS DOUBLE) AS total_price
          FROM orders_q57 GROUP BY 1
        )
        SELECT spine.m AS month,
               COALESCE(monthly.n_orders, 0) AS n_orders,
               COALESCE(monthly.total_price, CAST(0.0 AS DOUBLE)) AS total_price
        FROM spine LEFT JOIN monthly ON spine.m = monthly.m
        """
    )


@register(
    "q91_lateral_topn",
    oracle="""
    SELECT n_name,
           c.c_name AS top_customer,
           c.rnk AS rnk,
           c.c_acctbal AS acctbal
    FROM nation, LATERAL (
      SELECT c_name, c_acctbal,
             CAST(ROW_NUMBER() OVER (ORDER BY c_acctbal DESC, c_custkey) AS INT) AS rnk
      FROM customer
      WHERE c_nationkey = n_nationkey
      ORDER BY c_acctbal DESC, c_custkey
      LIMIT 2
    ) c
    """,
)
def q91_lateral_topn(spark, sf_dir):
    """Correlated LATERAL subquery (Spark 3.2+ SQL surface): per
    nation, the top-2 customers by account balance — the for-each-row
    table subquery SQL users reach for before learning window
    functions; the engine must support BOTH spellings (q06/q44 are the
    window forms). Catalyst decorrelates the LATERAL into a
    DomainJoin → ranked window under the hood, so the plan is the same
    shuffle as the window form, not N correlated executions —
    exactly the rewrite a 100 TB per-group top-k needs. (c_custkey
    tiebreak pins determinism cross-engine.)"""
    t(spark, sf_dir, "nation").createOrReplaceTempView("nation_q91")
    t(spark, sf_dir, "customer").createOrReplaceTempView("customer_q91")
    return spark.sql(
        """
        SELECT n_name,
               c.c_name AS top_customer,
               c.rnk AS rnk,
               c.c_acctbal AS acctbal
        FROM nation_q91, LATERAL (
          SELECT c_name, c_acctbal,
                 CAST(ROW_NUMBER() OVER (ORDER BY c_acctbal DESC, c_custkey) AS INT) AS rnk
          FROM customer_q91
          WHERE c_nationkey = n_nationkey
          ORDER BY c_acctbal DESC, c_custkey
          LIMIT 2
        ) c
        """
    )


@register(
    "q92_collations",
    oracle="""
    WITH mixed AS (
      SELECT user_id % 10 AS bucket,
             CASE WHEN event_id % 2 = 0
                  THEN upper(substr(event_type, 1, 1)) || substr(event_type, 2)
                  ELSE event_type END AS etype
      FROM events
    )
    SELECT bucket,
           CAST(COUNT(DISTINCT etype) AS BIGINT) AS n_types_binary,
           CAST(COUNT(DISTINCT lower(etype)) AS BIGINT) AS n_types_ci,
           CAST(SUM(CASE WHEN lower(etype) = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view_ci
    FROM mixed GROUP BY bucket
    """,
)
def q92_collations(spark, sf_dir):
    """String COLLATIONS (Spark 4.0 surface): half the event types are
    deterministically re-cased (initcap on even event_ids), then
    distinct-counts and an equality filter run under the UTF8_LCASE
    collation — the engine-level way to make comparison, grouping and
    DISTINCT case-insensitive WITHOUT rewriting every expression
    through lower() (which defeats dictionary/statistics pushdown on a
    100 TB column). Binary distinct sees 8 variants per bucket, the
    collated distinct 4; the oracle spells the same semantics with
    lower() since DuckDB lacks per-expression collation aliases."""
    ev = t(spark, sf_dir, "events").select(
        (F.col("user_id") % 10).alias("bucket"),
        F.when(
            F.col("event_id") % 2 == 0, F.initcap("event_type")
        ).otherwise(F.col("event_type")).alias("etype"),
    )
    ci = F.collate(F.col("etype"), "UTF8_LCASE")
    return ev.groupBy("bucket").agg(
        F.countDistinct("etype").alias("n_types_binary"),
        F.countDistinct(ci).alias("n_types_ci"),
        F.sum(F.when(ci == F.lit("view"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_view_ci"),
    )


@register(
    "q95_malformed_json",
    oracle="""
    WITH raw AS (
      SELECT event_type,
             CASE WHEN event_id % 11 = 0
                  THEN substring(props, 1, length(props) - 2)
                  ELSE props END AS j
      FROM events
    ),
    parsed AS (
      SELECT event_type,
             CASE WHEN j IS NULL THEN 0
                  WHEN json_valid(j) THEN 1 ELSE 0 END AS ok,
             CASE WHEN j IS NOT NULL AND json_valid(j)
                  THEN CAST(j ->> 'k' AS INTEGER) END AS k
      FROM raw
    )
    SELECT event_type,
           COUNT(*) AS n_rows,
           CAST(SUM(ok) AS BIGINT) AS n_parsed,
           CAST(SUM(1 - ok) AS BIGINT) AS n_corrupt,
           ROUND(SUM(ok) * 1.0 / COUNT(*), 6) AS parse_rate,
           ROUND(AVG(k), 6) AS avg_k
    FROM parsed GROUP BY event_type
    """,
)
def q95_malformed_json(spark, sf_dir):
    """Malformed-record ingest robustness: every 11th props payload is
    deterministically corrupted (truncated mid-object — trailing
    garbage alone is NOT enough: Jackson tolerates it), then parsed
    with from_json in PERMISSIVE mode — corrupt rows surface through
    the _corrupt_record column (a struct of NULL fields otherwise
    looks identical to a legitimately-null payload) and are COUNTED,
    not dropped and not fatal (the
    badRecords accounting every production JSON ingest needs; a
    FAILFAST parser would kill the job on row one). Typed extraction
    (props.k) proceeds on the valid tier only. The oracle mirrors
    validity with DuckDB's json_valid. At 100 TB: a single scan;
    corruption accounting is free within the same aggregate."""
    ev = t(spark, sf_dir, "events").select(
        "event_type",
        F.when(
            F.col("event_id") % 11 == 0,
            F.expr("substring(props, 1, length(props) - 2)"),
        ).otherwise(F.col("props")).alias("j"),
    )
    # PERMISSIVE from_json yields a struct of NULL fields for corrupt
    # input (not a NULL struct) — detection requires the explicit
    # _corrupt_record column, which is also the production accounting
    # surface (badRecords routing keys off it). NULL input is its OWN
    # explicit case: from_json(NULL) returns a NULL struct with a NULL
    # _corrupt_record, which would otherwise count as parsed while the
    # oracle's json_valid(NULL) counts it as not-parsed (ADVICE r6 —
    # the same latent class as the BM25 avgdl divergence). A NULL
    # payload is not a parse success: ok requires j IS NOT NULL.
    parsed = ev.select(
        "event_type",
        F.col("j"),
        F.from_json(
            "j",
            "k int, _corrupt_record string",
            {"columnNameOfCorruptRecord": "_corrupt_record"},
        ).alias("p"),
    ).select(
        "event_type",
        F.when(
            F.col("j").isNotNull() & F.col("p._corrupt_record").isNull(), 1
        ).otherwise(0).alias("ok"),
        F.when(
            F.col("j").isNotNull() & F.col("p._corrupt_record").isNull(),
            F.col("p.k"),
        ).alias("k"),
    )
    return parsed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("ok").alias("n_parsed"),
        F.sum(1 - F.col("ok")).alias("n_corrupt"),
        F.round(F.sum("ok") / F.count(F.lit(1)), 6).alias("parse_rate"),
        F.round(F.avg("k"), 6).alias("avg_k"),
    )


@register(
    "q96_observed_metrics",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_input,
           CAST(COUNT(CASE WHEN l_quantity >= 30 THEN 1 END) AS BIGINT) AS n_kept,
           CAST(COALESCE(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)), 0) AS BIGINT)
             AS price_cents,
           CAST(COUNT(*) - COUNT(l_returnflag) AS BIGINT) AS n_null_flag
    FROM lineitem
    """,
)
def q96_observed_metrics(spark, sf_dir):
    """Pipeline observability via df.observe (the Observation API):
    named metrics — input rows, filter survivors, exact price cents,
    null-flag count — are harvested DURING the pipeline's own action,
    in the same pass as the work (zero extra scans; an AccumulatorV2
    under the hood, exactly how production jobs emit DQ counters
    without re-reading 100 TB). The query triggers one bounded action
    to collect the observation, then returns the metrics as a 1-row
    DataFrame under the hash gate — proving observed values equal the
    oracle's independent aggregate."""
    from pyspark.sql import Observation

    l = t(spark, sf_dir, "lineitem")
    obs = Observation("q96")
    instrumented = l.observe(
        obs,
        F.count(F.lit(1)).alias("n_input"),
        F.count(F.when(F.col("l_quantity") >= 30, 1)).alias("n_kept"),
        # COALESCE: SUM over an EMPTY relation observes NULL — the
        # metrics row must report 0, not crash int(None) (found by the
        # empty-input matrix)
        F.coalesce(
            F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("bigint")),
            F.lit(0),
        ).alias("price_cents"),
        (F.count(F.lit(1)) - F.count("l_returnflag")).alias("n_null_flag"),
    )
    # the observation fires with the pipeline's OWN action — here a
    # cheap count over the instrumented frame (the driver's collect of
    # the returned metrics row would not touch `l` again)
    instrumented.filter(F.col("l_quantity") >= 30).count()
    m = obs.get
    return spark.createDataFrame(
        [
            (
                int(m["n_input"]),
                int(m["n_kept"]),
                int(m["price_cents"]),
                int(m["n_null_flag"]),
            )
        ],
        "n_input bigint, n_kept bigint, price_cents bigint, n_null_flag bigint",
    )


_Q97_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT)
         AS price_cents,
       COUNT(*) AS n
FROM {table}
GROUP BY ALL
ORDER BY ALL
"""


@register("q97_group_by_all", oracle=_Q97_SQL.format(table="lineitem"))
def q97_group_by_all(spark, sf_dir):
    """GROUP BY ALL / ORDER BY ALL (Spark 3.4+/4 SQL sugar, also
    DuckDB's): the SAME query text — literally the oracle string with
    only the table name swapped — runs on BOTH engines, the strongest
    possible portability statement for the SQL surface (every other
    gate pairs a DataFrame plan with an equivalent SQL; this one pairs
    the identical SQL with itself). Grouping keys are inferred from
    the non-aggregate select list; ordering covers the full output."""
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_q97")
    return spark.sql(_Q97_SQL.format(table="lineitem_q97"))


@register(
    "q98_try_arithmetic",
    oracle="""
    SELECT l_linenumber,
           COUNT(*) AS n,
           CAST(SUM(CASE WHEN CAST(l_quantity AS BIGINT) - 25 = 0 THEN NULL
                         ELSE CAST(ROUND(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
                                         * 1.0 / (CAST(l_quantity AS BIGINT) - 25), 0) AS BIGINT)
                    END) AS BIGINT) AS ratio_sum,
           CAST(SUM(CASE WHEN CAST(l_quantity AS BIGINT) - 25 = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_div_zero,
           CAST(SUM(TRY_CAST(CASE WHEN l_orderkey % 2 = 0
                                  THEN CAST(CAST(l_quantity AS INTEGER) AS VARCHAR)
                                  ELSE l_returnflag END AS INTEGER)) AS BIGINT)
             AS parsed_sum
    FROM lineitem GROUP BY l_linenumber
    """,
)
def q98_try_arithmetic(spark, sf_dir):
    """The try_* error-safe arithmetic family (try_divide/try_cast —
    Spark 3.2+/4): under ANSI mode plain division THROWS on zero
    divisors (the m34 class of failure this round's full-ANSI sweep
    exists to catch); try_divide returns NULL instead, making the
    query mode-INDEPENDENT by construction — the migration path the
    ANSI default needs. Zero-divisor rows are counted, not lost;
    try_cast over a mixed numeric/alpha string column parses the
    numeric half and NULLs the rest in both engines (DuckDB TRY_CAST
    twin) instead of throwing under ANSI. This query is deliberately in the ANSI
    sweep: it must hash identically with ansi on and off.

    Cost note (r7 measurement): ~3 s at sf0.1 is EXECUTION, not plan
    compile — try_cast on the ~50%-guaranteed-failing string branch
    pays a caught JVM exception per failing row. That cost is the
    exercised surface (error-safe ingest of dirty columns), so it's
    inherent; bench tracks the query under `singles`. Production
    guidance the number teaches: don't try_cast a column KNOWN to be
    mostly non-numeric — pre-screen with a cheap regexp and reserve
    try_cast for the residue."""
    l = t(spark, sf_dir, "lineitem")
    # integer-cent dividend / integer divisor: IEEE p/q division is
    # bit-identical across engines, and ROUND to integer dodges the
    # round(x, 2) decimal knife-edges arbitrary double ratios hit
    cents = F.round(F.col("l_extendedprice") * 100, 0).cast("bigint")
    qdelta = F.col("l_quantity").cast("bigint") - 25  # zero when qty = 25
    ratio = F.try_divide(cents, qdelta)
    return l.groupBy("l_linenumber").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(ratio, 0).cast("bigint")).alias("ratio_sum"),
        F.sum(F.when(qdelta == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_div_zero"),
        # a mixed numeric/alpha string column: try_cast parses the
        # numeric half and NULLs the flags — no exception either mode
        F.sum(
            F.expr(
                "try_cast(CASE WHEN l_orderkey % 2 = 0 "
                "THEN CAST(CAST(l_quantity AS int) AS string) "
                "ELSE l_returnflag END AS int)"
            )
        )
        .cast("bigint")
        .alias("parsed_sum"),
    )


@register(
    "q123_timestamp_units",
    oracle="""
    WITH f AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view' THEN ts END) AS first_view,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS first_buy
      FROM events
      GROUP BY user_id
    )
    SELECT user_id, first_view, first_buy,
           CAST(FLOOR((epoch(first_buy) - epoch(first_view)) / 3600)
                AS BIGINT) AS hours_to_buy,
           CAST(FLOOR((epoch(first_buy) - epoch(first_view)) / 86400)
                AS BIGINT) AS days_to_buy,
           first_buy + INTERVAL 72 HOUR AS return_deadline
    FROM f
    WHERE first_view IS NOT NULL AND first_buy IS NOT NULL
      AND first_buy >= first_view
    """,
)
def q123_timestamp_units(spark, sf_dir):
    """``timestampdiff`` / ``timestampadd`` — the ANSI unit-arithmetic
    surface, with the cross-engine trap PINNED: Spark's timestampdiff
    counts COMPLETE elapsed units (10:30→12:29:59 is 1 hour), while
    DuckDB's date_diff counts boundary CROSSINGS (same span: 2) — the
    off-by-one every SLA report hits. The twin therefore replays the
    complete-units semantics explicitly as floor(epoch delta / unit),
    making the contract part of the gate instead of an engine
    accident. Funnel framing: per user, complete hours/days from first
    view to first purchase, plus a 72 h return deadline via
    timestampadd."""
    ev = t(spark, sf_dir, "events")
    f = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias(
            "first_view"
        ),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "first_buy"
        ),
    )
    return (
        f.where(
            F.col("first_view").isNotNull()
            & F.col("first_buy").isNotNull()
            & (F.col("first_buy") >= F.col("first_view"))
        )
        .select(
            "user_id",
            "first_view",
            "first_buy",
            F.expr("timestampdiff(HOUR, first_view, first_buy)")
            .cast("bigint")
            .alias("hours_to_buy"),
            F.expr("timestampdiff(DAY, first_view, first_buy)")
            .cast("bigint")
            .alias("days_to_buy"),
            F.expr("timestampadd(HOUR, 72, first_buy)").alias(
                "return_deadline"
            ),
        )
    )
