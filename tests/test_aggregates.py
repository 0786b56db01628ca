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
