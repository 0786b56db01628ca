"""Join operators (SURVEY.md §2.3: J1-J7).

Join-strategy posture for 100 TB:

* dims (region/nation/supplier/customer at TPC-H ratios) → broadcast
  hash join, explicitly hinted where Catalyst's size estimate might
  miss (post-filter sizes are what matter; AQE re-checks at runtime);
* fact-to-fact (lineitem ⋈ orders) → sort-merge on the shuffled key;
  at scale both sides should be bucketed by orderkey so this is a
  zero-shuffle bucket join;
* non-equi → banded/bucketed to avoid BroadcastNestedLoop blowup;
* as-of → the one-shuffle union+window recipe in operators/asof.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from oxi_diel_db_spark.operators.asof import asof_join
from oxi_diel_db_spark.queries import register
from oxi_diel_db_spark.queries._util import avg_money, cents, sql_avg_money, sql_sum_money, sum_money, t


@register(
    "q30_multiway_join",
    oracle=f"""
    SELECT n_name,
           {sql_sum_money('l_extendedprice * (1 - l_discount)')} AS revenue,
           COUNT(*) AS n_items
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA' AND o_orderdate >= DATE '1996-01-01'
    GROUP BY n_name
    """,
)
def q30_multiway_join(spark, sf_dir):
    """TPC-H-Q5-shaped 5-way join (J3). lineitem⋈orders is the only
    big-big edge (sort-merge / bucket join at scale); customer, nation,
    region are broadcast — the region filter prunes before the join."""
    l = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1996-01-01").cast("date")
    )
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            sum_money(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "q31_left_join_agg",
    oracle=f"""
    SELECT c_custkey, c_name,
           COUNT(o_orderkey) AS n_orders,
           COALESCE({sql_sum_money('o_totalprice')}, 0.0) AS total_spent
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_name
    """,
)
def q31_left_join_agg(spark, sf_dir):
    """LEFT OUTER join preserving customers with zero orders (J3);
    COUNT(col) counts only matched rows — null-correct outer-join agg."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint")) / 100.0, F.lit(0.0)).alias(
                "total_spent"
            ),
        )
    )


@register(
    "q32_full_outer",
    oracle="""
    SELECT COALESCE(c.k, s.k) AS nationkey, c.n_cust, s.n_supp
    FROM (SELECT c_nationkey AS k, COUNT(*) AS n_cust FROM customer WHERE c_acctbal > 9000 GROUP BY 1) c
    FULL OUTER JOIN
         (SELECT s_nationkey AS k, COUNT(*) AS n_supp FROM supplier WHERE s_acctbal > 9000 GROUP BY 1) s
    ON c.k = s.k
    """,
)
def q32_full_outer(spark, sf_dir):
    """FULL OUTER join (J3) of two filtered aggregates — either side may
    be missing a key; COALESCE reconstructs the unified key."""
    c = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .groupBy(F.col("c_nationkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    s = (
        t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 9000)
        .groupBy(F.col("s_nationkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return c.join(s, c.k == s.k, "full").select(
        F.coalesce(c.k, s.k).alias("nationkey"), "n_cust", "n_supp"
    )


@register(
    "q33_semi_join",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
    """,
)
def q33_semi_join(spark, sf_dir):
    """LEFT SEMI join = EXISTS (J4). Semi joins ship only the key of the
    right side and stop at first match — never multiplies rows."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "q34_anti_join",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 250000)
    """,
)
def q34_anti_join(spark, sf_dir):
    """LEFT ANTI join = NOT EXISTS (J4) — the J2 reference fixture shape
    (12 mp_ids with no prediction; see materials.m08)."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 250000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "q35_range_join",
    oracle="""
    WITH bands(band, lo, hi) AS (
        VALUES ('cheap', 0.0, 1200.0), ('mid', 1200.0, 1500.0),
               ('premium', 1500.0, 1800.0), ('luxury', 1800.0, 1e18)
    )
    SELECT band, COUNT(*) AS n_parts,
           ROUND(MIN(p_retailprice), 2) AS min_price,
           ROUND(MAX(p_retailprice), 2) AS max_price
    FROM part JOIN bands ON p_retailprice >= lo AND p_retailprice < hi
    GROUP BY band
    """,
)
def q35_range_join(spark, sf_dir):
    """Theta/range join (J5): fact ⋈ band table on an interval predicate.
    The band side is tiny → BroadcastNestedLoopJoin, which is the RIGHT
    plan here: |bands| is O(10), so the 'nested loop' is a constant-cost
    per-row band lookup, fully parallel, no shuffle of the fact."""
    bands = spark.createDataFrame(
        [
            ("cheap", 0.0, 1200.0),
            ("mid", 1200.0, 1500.0),
            ("premium", 1500.0, 1800.0),
            ("luxury", 1800.0, 1e18),
        ],
        "band string, lo double, hi double",
    )
    p = t(spark, sf_dir, "part")
    return (
        p.join(
            F.broadcast(bands),
            (p.p_retailprice >= bands.lo) & (p.p_retailprice < bands.hi),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.round(F.min("p_retailprice"), 2).alias("min_price"),
            F.round(F.max("p_retailprice"), 2).alias("max_price"),
        )
    )


@register(
    "q36_cross_join",
    oracle="""
    SELECT r_name, x.o_orderstatus AS status
    FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) x
    """,
)
def q36_cross_join(spark, sf_dir):
    """Cartesian product of two small sets (J7). Only valid when one side
    is provably tiny — the engine never cross-joins two facts."""
    r = t(spark, sf_dir, "region").select("r_name")
    st = t(spark, sf_dir, "orders").select(F.col("o_orderstatus").alias("status")).distinct()
    return r.crossJoin(st)


@register(
    "q37_asof_join",
    oracle="""
    SELECT p.event_id, p.ts, p.user_id,
           b.event_id AS prior_click_id, b.value AS prior_click_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') b
      ON p.user_id = b.user_id AND p.ts >= b.ts
    """,
)
def q37_asof_join(spark, sf_dir):
    """As-of join (J6): each purchase event matched to the user's latest
    click at-or-before it. DuckDB's native ASOF JOIN is the oracle; the
    Spark side runs the one-shuffle union+window recipe
    (operators/asof.py)."""
    e = t(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "ts", "user_id"
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("prior_click_id"),
        F.col("value").alias("prior_click_value"),
    )
    return asof_join(
        probe=purchases,
        build=clicks,
        on="user_id",
        probe_ts="ts",
        build_ts="click_ts",
        payload=["prior_click_id", "prior_click_value"],
        how="left",
    )


@register(
    "q38_scalar_subquery",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_totalprice > (SELECT AVG(o_totalprice) * 1.5 FROM orders)
    """,
)
def q38_scalar_subquery(spark, sf_dir):
    """Scalar subquery in a predicate (§4.2 subquery handling) via the
    SQL surface — Catalyst plans the subquery as a broadcast scalar."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders_ssq")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM orders_ssq
        WHERE o_totalprice > (SELECT AVG(o_totalprice) * 1.5 FROM orders_ssq)
        """
    )


@register(
    "q39_correlated_in",
    oracle="""
    SELECT s_suppkey, s_name FROM supplier
    WHERE s_nationkey IN (SELECT n_nationkey FROM nation
                          JOIN region ON n_regionkey = r_regionkey
                          WHERE r_name IN ('EUROPE', 'ASIA'))
    """,
)
def q39_correlated_in(spark, sf_dir):
    """IN-subquery (decorrelated to a semi join by Catalyst)."""
    for name in ("supplier", "nation", "region"):
        t(spark, sf_dir, name).createOrReplaceTempView(f"{name}_q39")
    return spark.sql(
        """
        SELECT s_suppkey, s_name FROM supplier_q39
        WHERE s_nationkey IN (SELECT n_nationkey FROM nation_q39
                              JOIN region_q39 ON n_regionkey = r_regionkey
                              WHERE r_name IN ('EUROPE', 'ASIA'))
        """
    )


@register(
    "q45_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           {sql_sum_money('l_extendedprice * (1 - l_discount)')} AS revenue,
           o_orderdate, o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < DATE '1998-01-01'
      AND l_shipdate > DATE '1998-01-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)
def q45_shipping_priority(spark, sf_dir):
    """TPC-H-Q3-shaped composition: selective dim filter → two joins →
    group-by → top-10 by aggregate. The final ORDER BY an AGGREGATE is
    the interesting part: it needs the agg to finish, then
    TakeOrderedAndProject — revenue is exact cents so the top-10 set is
    deterministic cross-engine (ties break on date+key)."""
    c = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("date")
    )
    l = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("date")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            sum_money(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@register(
    "q46_correlated_scalar",
    oracle="""
    SELECT p_partkey, p_brand, p_retailprice
    FROM part p1
    WHERE p_retailprice > 1.1 * (SELECT AVG(p_retailprice) FROM part p2
                                 WHERE p2.p_brand = p1.p_brand)
    """,
)
def q46_correlated_scalar(spark, sf_dir):
    """Correlated scalar subquery (§4.2 decorrelation): parts priced
    >10% above their brand average. Catalyst rewrites the correlation
    into an aggregate + join — verified by the passing plan, not by a
    hand-decorrelated reimplementation."""
    t(spark, sf_dir, "part").createOrReplaceTempView("part_q46")
    return spark.sql(
        """
        SELECT p_partkey, p_brand, p_retailprice
        FROM part_q46 p1
        WHERE p_retailprice > 1.1 * (SELECT AVG(p_retailprice) FROM part_q46 p2
                                     WHERE p2.p_brand = p1.p_brand)
        """
    )


@register(
    "q47_merge_upsert",
    oracle="""
    WITH source AS (
      SELECT c_custkey, c_name, c_nationkey, c_acctbal, 'VIP' AS c_mktsegment
      FROM customer WHERE c_acctbal > 9000
      UNION ALL
      SELECT c_custkey + 1000000, c_name, c_nationkey, 0.0, 'NEW'
      FROM customer WHERE c_custkey <= 20
    )
    SELECT * FROM source
    UNION ALL
    SELECT c.* FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM source s WHERE s.c_custkey = c.c_custkey)
    """,
)
def q47_merge_upsert(spark, sf_dir):
    """MERGE INTO emulation (upsert): high-balance customers update to
    a VIP segment, 20 synthetic customers insert — source wins on key,
    untouched rows survive (operators/merge.merge_upsert)."""
    from oxi_diel_db_spark.operators.merge import merge_upsert

    c = t(spark, sf_dir, "customer")
    updates = c.filter(F.col("c_acctbal") > 9000).withColumn(
        "c_mktsegment", F.lit("VIP")
    )
    inserts = (
        c.filter(F.col("c_custkey") <= 20)
        .withColumn("c_custkey", F.col("c_custkey") + 1000000)
        .withColumn("c_acctbal", F.lit(0.0))
        .withColumn("c_mktsegment", F.lit("NEW"))
    )
    return merge_upsert(c, updates.unionByName(inserts), "c_custkey")


@register(
    "q48_scd2_intervals",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           o_orderdate AS valid_from,
           LEAD(o_orderdate) OVER w AS valid_to,
           LEAD(o_orderdate) OVER w IS NULL AS is_current
    FROM orders
    WHERE o_custkey <= 100
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def q48_scd2_intervals(spark, sf_dir):
    """SCD2 effectivity intervals from a version stream (each order =
    a new version of the customer's latest-order state): valid_to =
    next version's timestamp, NULL marks the current row — one window,
    no self-join (operators/merge.scd2_intervals)."""
    from oxi_diel_db_spark.operators.merge import scd2_intervals

    o = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") <= 100)
        .select("o_custkey", "o_orderkey", "o_totalprice", "o_orderdate")
    )
    return scd2_intervals(
        o, key="o_custkey", ts_col="o_orderdate", tiebreak=["o_orderkey"]
    ).select(
        "o_custkey", "o_orderkey", "o_totalprice",
        "valid_from", "valid_to", "is_current",
    )


@register(
    "q49_market_share",
    oracle=f"""
    SELECT CAST(YEAR(o_orderdate) AS INT) AS o_year,
           ROUND(CAST(SUM(CASE WHEN sn.n_name = 'NATION_5'
                               THEN CAST(ROUND(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT)
                               ELSE 0 END) AS DOUBLE)
                 / SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT)), 6) + 0
             AS mkt_share,
           {sql_sum_money('l_extendedprice * (1 - l_discount)')} AS total_rev
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    JOIN region   ON cn.n_regionkey = r_regionkey
    WHERE r_name = 'ASIA' AND p_type = 'PROMO'
    GROUP BY 1
    """,
)
def q49_market_share(spark, sf_dir):
    """TPC-H-Q8-shaped market share: NATION_5 suppliers' slice of PROMO
    part revenue sold to ASIA customers, per year. Exercises a 7-way
    join with the SAME dim (nation) entering twice under different
    roles, plus a ratio-of-conditional-aggregates — the share divides
    two exact cent-sums, so the double quotient is bit-identical
    cross-engine. lineitem⋈orders stays the one big-big edge; part,
    supplier, both nations, customer, region all broadcast."""
    l = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    s = t(spark, sf_dir, "supplier")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    sn = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("sn_name")
    )
    cn = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_rkey")
    )
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    rev_cents = cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    nation5_cents = F.when(F.col("sn_name") == "NATION_5", rev_cents).otherwise(
        F.lit(0).cast("bigint")
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(r), F.col("cn_rkey") == F.col("r_regionkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (
                F.round(
                    F.sum(nation5_cents).cast("double") / F.sum(rev_cents), 6
                )
                + F.lit(0.0)
            ).alias("mkt_share"),
            sum_money(F.col("l_extendedprice") * (1 - F.col("l_discount")), "total_rev"),
        )
    )


@register(
    "q50_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name, n_name,
           {sql_sum_money('l_extendedprice * (1 - l_discount)')} AS revenue,
           COUNT(*) AS n_items
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= DATE '1997-01-01' AND o_orderdate < DATE '1998-01-01'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q50_returned_items(spark, sf_dir):
    """TPC-H-Q10-shaped returned-item report: top-20 customers by lost
    revenue (returnflag 'R') in one order-year. Selective fact filter →
    join → group → TakeOrderedAndProject; exact cent revenue makes the
    top-20 cutoff deterministic (ties break on custkey)."""
    l = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("date"))
    )
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            sum_money(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "q51_large_volume",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
           big.total_qty
    FROM (SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
          FROM lineitem GROUP BY 1
          HAVING SUM(CAST(l_quantity AS BIGINT)) > 250) big
    JOIN orders   ON o_orderkey = big.l_orderkey
    JOIN customer ON c_custkey = o_custkey
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def q51_large_volume(spark, sf_dir):
    """TPC-H-Q18-shaped large-volume-customer: orders whose total
    quantity exceeds a threshold, with their customers, by price. The
    Spark plan aggregates lineitem FIRST (partial sums map-side), then
    joins the ~200 surviving orders — the aggregate-before-join rewrite
    that Q18's IN-subquery form decorrelates to; at 100 TB the
    pre-aggregation is what keeps the join input small. Quantities are
    integral doubles → BIGINT sums, exact in both engines."""
    l = t(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("total_qty"))
        .filter(F.col("total_qty") > 250)
    )
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            "c_custkey", "c_name", "o_orderkey", "o_orderdate",
            "o_totalprice", "total_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


@register(
    "q58_volume_shipping",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year,
           {sql_sum_money('volume')} AS revenue,
           COUNT(*) AS n_items
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             YEAR(l_shipdate) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate BETWEEN DATE '1996-01-01' AND DATE '1997-12-31'
    )
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q58_volume_shipping(spark, sf_dir):
    """TPC-H-Q7-shaped volume shipping (J3): the nation dim enters the
    join TWICE (supplier's and customer's nation) with a symmetric OR
    pair condition. Each nation side pre-filters to the two names of
    interest BEFORE its broadcast join (the IN-filter is pushable even
    though the OR pair condition is not), so the broadcast tables carry
    2 rows, and the pair condition runs as a cheap post-join filter.
    lineitem⋈orders stays the only big-big edge."""
    two = ["NATION_1", "NATION_2"]
    n1 = t(spark, sf_dir, "nation").filter(F.col("n_name").isin(two)).select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = t(spark, sf_dir, "nation").filter(F.col("n_name").isin(two)).select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    s = t(spark, sf_dir, "supplier")
    c = t(spark, sf_dir, "customer")
    l = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between("1996-01-01", "1997-12-31")
    )
    o = t(spark, sf_dir, "orders")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation", "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(
            sum_money(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "q59_promo_revenue",
    oracle=f"""
    SELECT YEAR(l_shipdate) AS l_year, MONTH(l_shipdate) AS l_month,
           CAST({sql_sum_money("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0 END")} AS DOUBLE) AS promo_revenue,
           {sql_sum_money('l_extendedprice * (1 - l_discount)')} AS total_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-07-01'
    GROUP BY 1, 2
    """,
)
def q59_promo_revenue(spark, sf_dir):
    """TPC-H-Q14-shaped promo revenue (J3 + A11): fact-to-dim join on
    partkey with a conditional revenue split by part type, monthly. The
    part dim broadcasts (pruned to partkey+type by column pruning); the
    promo/total ratio is left to the reader so both sums stay exact
    cents (a ratio of exact cent-sums is bit-identical cross-engine,
    but keeping the addends is the more reusable shape)."""
    l = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1996-07-01").cast("date"))
    )
    p = t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy(
            F.year("l_shipdate").alias("l_year"),
            F.month("l_shipdate").alias("l_month"),
        )
        .agg(
            sum_money(
                F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0)),
                "promo_revenue",
            ),
            sum_money(rev, "total_revenue"),
        )
    )


@register(
    "q60_priority_late_ships",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1997-01-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    """,
)
def q60_priority_late_ships(spark, sf_dir):
    """TPC-H-Q4 shape (order-priority checking): correlated EXISTS with
    an inequality on BOTH tables' columns → left-semi join whose
    condition mixes the equi key with a derived date bound, then a
    single-key count. The semi join shuffles once on the key; the date
    predicate rides along in the join condition (no pre-join
    materialization of the correlated column)."""
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("date"))
    )
    l = t(spark, sf_dir, "lineitem")
    late = o.join(
        l,
        (o.o_orderkey == l.l_orderkey)
        & (l.l_shipdate > F.date_add(o.o_orderdate, 60)),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


@register(
    "q61_custorder_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    )
    GROUP BY c_count
    """,
)
def q61_custorder_distribution(spark, sf_dir):
    """TPC-H-Q13 shape (customer order distribution): outer join with a
    residual predicate INSIDE the join condition (not a post-filter —
    unmatched customers must survive with count 0), then a two-level
    aggregate whose second GROUP BY key is itself an aggregate."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q62_small_qty_revenue",
    oracle=f"""
    SELECT {sql_sum_money('l_extendedprice')} / 7.0 AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#23'
      AND l_quantity < 0.2 * (SELECT AVG(l_quantity) FROM lineitem l2
                              WHERE l2.l_partkey = p_partkey)
    """,
)
def q62_small_qty_revenue(spark, sf_dir):
    """TPC-H-Q17 shape (small-quantity-order revenue): a correlated
    scalar AVG decorrelated into a per-part aggregate broadcast back
    onto the fact table. l_quantity is integer-valued, so its plain AVG
    is exact (integer sums commute) and the 0.2x threshold compares
    identically cross-engine; the revenue output goes through the exact
    cent-sum. The per-part averages are |part|-sized -> broadcast."""
    l = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    avgs = l.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(avgs), l.l_partkey == F.col("a_partkey"))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg((sum_money("l_extendedprice", "rev") / F.lit(7.0)).alias("avg_yearly"))
        .select(F.col("avg_yearly"))
    )


@register(
    "q63_disjunctive_filter",
    oracle=f"""
    SELECT {sql_sum_money('l_extendedprice * (1 - l_discount)')} AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q63_disjunctive_filter(spark, sf_dir):
    """TPC-H-Q19 shape (disjunctive join predicates): three OR'd
    conjunct groups spanning both join sides. Catalyst extracts the
    common join key and pushes the per-side disjunction residuals below
    the join (part is dim-sized -> broadcast), instead of evaluating
    the whole OR as a post-join filter."""
    l = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    q, b, s = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    cond = (
        ((b == "Brand#12") & s.between(1, 5) & q.between(1, 11))
        | ((b == "Brand#23") & s.between(1, 10) & q.between(10, 20))
        | ((b == "Brand#34") & s.between(1, 15) & q.between(20, 30))
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            sum_money(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "q64_idle_rich_customers",
    oracle=f"""
    SELECT c_nationkey, COUNT(*) AS numcust,
           {sql_sum_money('c_acctbal')} AS totacctbal
    FROM customer
    WHERE c_acctbal > (SELECT {sql_avg_money('c_acctbal')} FROM customer
                       WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderdate >= DATE '1999-01-01')
    GROUP BY c_nationkey
    """,
)
def q64_idle_rich_customers(spark, sf_dir):
    """TPC-H-Q22 shape (global-sales-opportunity): an uncorrelated
    scalar subquery (above-average balance, computed via the exact
    cent-sum so the threshold is bit-identical cross-engine) gating an
    anti join against recent orders ("rich but lapsed"), grouped by
    nation. The scalar is a
    1-row cross join (broadcast); the anti join shuffles on custkey."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    thresh = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg(avg_money("c_acctbal", "avg_bal"))
    )
    return (
        c.join(F.broadcast(thresh))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(
            o.filter(F.col("o_orderdate") >= F.lit("1999-01-01").cast("date")),
            c.c_custkey == o.o_custkey,
            "left_anti",
        )
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            sum_money("c_acctbal", "totacctbal"),
        )
    )


@register(
    "q65_forecast_revenue",
    oracle=f"""
    SELECT {sql_sum_money('l_extendedprice * l_discount')} AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q65_forecast_revenue(spark, sf_dir):
    """TPC-H-Q6 shape (forecasting revenue change): the pure
    scan-filter-aggregate — no join, no group key. All three predicates
    (date range, discount band, quantity cap) push down to the parquet
    scan; the whole query is one map-side partial sum + a 1-row final
    reduce, the cheapest possible shape at 100 TB. The discount band
    compares the stored doubles directly — both engines read the same
    parquet bits, so the boundary rows agree."""
    l = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("date"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    )
    return l.agg(
        sum_money(F.col("l_extendedprice") * F.col("l_discount"), "revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@register(
    "q66_priority_ship_class",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_returnflag IN ('R', 'A')
      AND l_shipdate >= o_orderdate + INTERVAL 30 DAY
      AND l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
    GROUP BY l_returnflag
    """,
)
def q66_priority_ship_class(spark, sf_dir):
    """TPC-H-Q12 shape (shipping modes / order priority): fact-to-fact
    join with a cross-table inequality (slow ships: l_shipdate ≥ 30
    days past the order date — the testdata has no
    commitdate/receiptdate, so the delay predicate stands in for
    commit<receipt), then two complementary conditional counts per
    class. The IN-list and date range prune lineitem before the join;
    the join shuffles once on orderkey (bucket join at scale)."""
    o = t(spark, sf_dir, "orders")
    l = t(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag").isin("R", "A")
        & (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("date"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, (l.l_orderkey == o.o_orderkey))
        .filter(F.col("l_shipdate") >= F.date_add(F.col("o_orderdate"), 30))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "q67_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey,
             {sql_sum_money('l_extendedprice * (1 - l_discount)')} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = l_suppkey
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def q67_top_supplier(spark, sf_dir):
    """TPC-H-Q15 shape (top supplier): a revenue "view" (quarterly
    cent-exact sum per supplier), its global MAX as an uncorrelated
    scalar, and an equality re-join back to the view — the
    argmax-via-view pattern. The per-supplier revenue relation is
    |supplier|-sized, so both the max (1 row) and the view broadcast;
    the only real shuffle is the lineitem groupBy on suppkey. Cent-sums
    make the MAX and the equality bit-deterministic cross-engine."""
    l = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("date"))
    )
    s = t(spark, sf_dir, "supplier")
    revenue = l.groupBy("l_suppkey").agg(
        sum_money(F.col("l_extendedprice") * (1 - F.col("l_discount")), "total_revenue")
    )
    mx = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        s.join(F.broadcast(revenue), s.s_suppkey == F.col("l_suppkey"))
        .join(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q68_waiting_suppliers",
    oracle="""
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier, lineitem l1, orders
    WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
      AND o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAY)
    GROUP BY s_name
    """,
)
def q68_waiting_suppliers(spark, sf_dir):
    """TPC-H-Q21 shape (suppliers who kept orders waiting): the
    sole-blame pattern — count late lines whose supplier is the ONLY
    late supplier on a multi-supplier order. "Late" is ship > 90 days
    past order date (the commit/receipt columns don't exist in the
    testdata). The two correlated EXISTS decorrelate into ONE per-order
    aggregate — distinct suppliers and distinct *late* suppliers — so
    the whole query is two shuffles on orderkey (join + groupBy, and at
    scale a bucket layout makes both co-located) instead of three
    self-joins of the fact table."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    l = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    lo = l.join(o, l.l_orderkey == o.o_orderkey).withColumn(
        "is_late", F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 90)
    )
    stats = lo.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("is_late"), F.col("l_suppkey"))).alias(
            "n_late_supp"
        ),
    )
    blamed = (
        lo.filter(F.col("is_late"))
        .join(stats, "l_orderkey")
        .filter((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
    )
    return (
        blamed.join(F.broadcast(s), blamed.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@register(
    "q83_bucketed_join",
    oracle=f"""
    SELECT c_mktsegment, COUNT(*) AS n_orders,
           {sql_sum_money('o_totalprice')} AS total
    FROM customer JOIN orders ON c_custkey = o_custkey
    GROUP BY c_mktsegment
    """,
)
def q83_bucketed_join(spark, sf_dir):
    """J3 at its 100 TB posture: BUCKETED co-located join. Both sides
    are written ``bucketBy(8, custkey)`` + sortBy into catalog tables,
    then sort-merge joined — the bucketed scans already satisfy the
    join's HashPartitioning, so NO exchange moves fact data before the
    join (asserted in tests/test_plans.py; the only shuffle left is the
    tiny post-join segment rollup). This is the layout answer for
    recurring fact-to-fact joins: pay the bucketing shuffle once at
    ingest, never again per query. The merge hint pins SMJ so the demo
    doesn't silently degrade to a broadcast join at toy scale.

    Bucket-count guidance at scale: buckets ≈ data size / 128 MB per
    side, and ALWAYS the same count on both tables (Spark 3 can
    coalesce mismatched counts when one divides the other, at reduced
    parallelism).
    """
    import os
    import tempfile

    # per-PROCESS scratch: a fixed shared path let two concurrent
    # sessions race (one rebuilding b_customer while the other's scan
    # read it → FAILED_READ_FILE.FILE_NOT_EXIST, observed when the r9
    # default and ANSI sweeps overlapped). Same-session invocations
    # still reuse the tables; separate processes get separate dirs.
    base = os.path.join(
        tempfile.gettempdir(), "spark_graft_scratch", f"bucketed_{os.getpid()}"
    )
    os.makedirs(base, exist_ok=True)
    # explicit LOCATION: the default warehouse dir is relative to the
    # DRIVER's cwd, which a host process may not be able to write
    spark.sql(
        "CREATE DATABASE IF NOT EXISTS bucketdemo "
        f"LOCATION '{os.path.join(base, 'bucketdemo.db')}'"
    )
    for name, df, key in (
        ("b_customer", t(spark, sf_dir, "customer"), "c_custkey"),
        ("b_orders", t(spark, sf_dir, "orders"), "o_custkey"),
    ):
        spark.sql(f"DROP TABLE IF EXISTS bucketdemo.{name}")
        (
            df.write.mode("overwrite")
            .format("parquet")
            .option("path", os.path.join(base, name))
            .bucketBy(8, key)
            .sortBy(key)
            .saveAsTable(f"bucketdemo.{name}")
        )
    bc = spark.table("bucketdemo.b_customer")
    bo = spark.table("bucketdemo.b_orders")
    return (
        bc.hint("merge")
        .join(bo, bc.c_custkey == bo.o_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            sum_money("o_totalprice", "total"),
        )
    )


@register(
    "q99_observation_join",
    oracle="""
    WITH p AS (SELECT event_id, ts, user_id, value FROM events
               WHERE event_type = 'purchase'),
    v AS (SELECT user_id, ts, value FROM events WHERE event_type = 'view'),
    c AS (SELECT user_id, ts, value FROM events WHERE event_type = 'click')
    SELECT p.event_id, p.user_id,
           ROUND(p.value, 6) AS purchase_value,
           ROUND(v.value, 6) AS prior_view_value,
           CAST(FLOOR(epoch(p.ts)) - FLOOR(epoch(v.ts)) AS BIGINT)
             AS secs_since_view,
           ROUND(c.value, 6) AS prior_click_value
    FROM p
    ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts
    ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def q99_observation_join(spark, sf_dir):
    """Feature-store observation join (point-in-time training-set
    assembly): each purchase OBSERVATION is enriched with the
    as-of-correct latest value from TWO feature streams (views and
    clicks) plus feature freshness (seconds since the last view) — the
    no-future-leakage join every feature store performs when building
    training sets. The Spark side runs operators/asof.pit_enrich: all
    streams tagged + unioned + carried forward under ONE window, so
    the plan has a single key shuffle regardless of how many feature
    families ride along (two chained ASOF JOINs — the DuckDB oracle's
    form — would shuffle the observations once per stream). At 100 TB:
    cost is one sort of |obs| + Σ|features| per key partition; skew
    and sizing levers identical to q37's asof (SCALE.md)."""
    from oxi_diel_db_spark.operators.asof import pit_enrich

    e = t(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "ts", "user_id", F.col("value").alias("purchase_value")
    )
    views = e.filter(F.col("event_type") == "view").select(
        "user_id",
        F.col("ts").alias("view_ts"),
        F.col("value").alias("prior_view_value"),
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("click_ts"),
        F.col("value").alias("prior_click_value"),
    )
    enriched = pit_enrich(
        probe=purchases,
        builds=[
            (views, "view_ts", ["view_ts", "prior_view_value"]),
            (clicks, "click_ts", ["prior_click_value"]),
        ],
        on="user_id",
        probe_ts="ts",
    )
    return enriched.select(
        "event_id",
        "user_id",
        F.round("purchase_value", 6).alias("purchase_value"),
        F.round("prior_view_value", 6).alias("prior_view_value"),
        (F.col("ts").cast("long") - F.col("view_ts").cast("long")).alias(
            "secs_since_view"
        ),
        F.round("prior_click_value", 6).alias("prior_click_value"),
    )
