"""Plan linter: each antipattern detector fires on a plan built to
exhibit it, and the flagship query comes back clean."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from oxi_diel_db_spark.plans.lint import lint


def _codes(df, **kw):
    return {c for c, _, _ in lint(df, **kw)}


def test_cartesian_flagged(spark):
    a, b = spark.range(10), spark.range(10).withColumnRenamed("id", "id2")
    assert "CARTESIAN" in _codes(a.crossJoin(b))


def test_global_window_flagged(spark):
    df = spark.range(100).withColumn(
        "rn", F.row_number().over(Window.orderBy("id"))
    )
    assert "GLOBAL_WINDOW" in _codes(df)


def test_partitioned_window_clean(spark):
    df = spark.range(100).withColumn(
        "rn", F.row_number().over(Window.partitionBy(F.col("id") % 7).orderBy("id"))
    )
    assert "GLOBAL_WINDOW" not in _codes(df)


def test_row_udf_flagged_and_pandas_udf_clean(spark):
    from pyspark.sql.types import LongType

    row_udf = F.udf(lambda x: x + 1, LongType())
    assert "PY_ROW_UDF" in _codes(spark.range(10).select(row_udf("id")))

    from oxi_diel_db_spark.functions.vectors import pandas_dot

    arr = spark.range(10).select(
        F.array(F.col("id").cast("double")).alias("a")
    )
    assert "PY_ROW_UDF" not in _codes(arr.select(pandas_dot("a", "a")))


def test_global_sort_flagged_topk_clean(spark, sf_dir):
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    assert "GLOBAL_SORT" in _codes(l.orderBy("l_extendedprice"))
    assert "GLOBAL_SORT" not in _codes(l.orderBy("l_extendedprice").limit(5))


def test_unpushed_filter_adjacency(spark, sf_dir, tmp_path):
    # a filter the parquet reader can't evaluate (expression over a
    # column) sits directly above the scan and never reaches pushdown
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    unpushable = l.filter(F.length(F.col("l_returnflag")) % 7 == 1)
    assert "UNPUSHED_FILTER" in _codes(unpushable)

    # a post-join filter next to an unfiltered scan is NOT a pushdown
    # miss — the old any-Filter + any-empty-scan heuristic flagged this
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    joined = l.join(o, l.l_orderkey == o.o_orderkey).filter(
        F.col("l_extendedprice") > F.col("o_totalprice") * 0.5
    )
    assert "UNPUSHED_FILTER" not in _codes(joined)


def test_flagship_query_is_clean(spark, sf_dir):
    import __spark_entry__ as E

    df = E.queries()["q01_pricing_summary"](spark, sf_dir)
    findings = lint(df)
    assert not [f for f in findings if f[1] == "error"], findings


def test_global_window_inputs_stay_tiny(spark):
    """Runtime enforcement of the GLOBAL_WINDOW triage (COVERAGE.md):
    every query whose plan carries an unpartitioned window must feed it
    a TINY relation (model grids, per-bucket offset tables, dim-only
    inputs) — never a fact-table-sized one. Reads the executed plan's
    shuffle metrics, so this fails the moment someone reroutes a fact
    table through a global window."""
    from oxi_diel_db_spark.plans.lint import global_window_input_rows
    from oxi_diel_db_spark.queries import load_registry

    # the full triaged list as of r4 (compile-sweep over the registry);
    # a query leaving the list is fine — the lint check below is a
    # freshness guard, not an exhaustiveness one
    TRIAGED = {
        "p3_deterministic_shuffle": 512,  # <=256-row bucket offset table
        "p4_sequence_packing": 512,
        "c1_curation_pipeline": 2048,  # post-aggregation stats relation
        "q44_distribution": 256,  # customer table at the pinned test SF;
        # docstring documents the approx-quantile rewrite for 100 TB
        "p13_curriculum_interleave": 256,  # DISTINCT source list (20
        # rows) — the dense_rank deliberately runs over O(sources),
        # never O(docs); the broadcast 1-row count join is the same
        # bounded shape
        "dq10_ks_drift": 64,  # per-bucket CDF offset table (B=64) —
        # the bucketed two-pass keeps the distinct-value relation out
        # of the single-partition window by construction
        "dq15_cusum_shift": 64,  # the day spine — sequential detection
        # is inherently ordered; its input is O(days), never the facts
        "c5_corpus_health": 64,  # the per-language share window — its
        # input is the O(langs) aggregate, never documents
        "dq16_ewma_control": 64,  # same day spine as dq15 — sequential
        # detection is inherently ordered over O(days)
    }
    reg = load_registry()
    for name, max_rows in TRIAGED.items():
        df = reg[name].build(spark, "/root/testdata/sf0.001")
        df.collect()
        counts = global_window_input_rows(df)
        if not counts:
            continue  # plan no longer has a global window — even better
        for n in counts:
            assert n is not None and n <= max_rows, (
                f"{name}: global window saw {n} rows (cap {max_rows}) — "
                "a fact-table-sized relation reached a single-partition window"
            )


def test_arrow_udf_is_arrow_not_pickled(spark):
    """q78's useArrow UDF must compile to ArrowEvalPython (Arrow batch
    transfer), never BatchEvalPython (pickled row loop) — and therefore
    stays clear of the PY_ROW_UDF lint."""
    from oxi_diel_db_spark.queries import load_registry

    df = load_registry()["q78_arrow_udf"].build(spark, "/root/testdata/sf0.001")
    phys = df._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in phys
    assert "BatchEvalPython" not in phys
    assert "PY_ROW_UDF" not in _codes(df)
    # and the UDF agrees with the built-in on every row
    import pyspark.sql.functions as F

    assert df.filter(F.col("udf_tokens") != F.col("builtin_tokens")).count() == 0


def test_registered_outputs_must_be_atomic(spark):
    """Round-6 driver failure class (dq8): the driver's pandas
    canonicalizer cannot hash array/map/struct cells, so register()
    rejects any query whose output schema carries one — at build time,
    before the driver ever sees it."""
    import pytest

    from oxi_diel_db_spark.queries import REGISTRY, register

    @register("zz_lint_nested_output_probe")
    def probe(s, sf_dir):
        return s.range(3).select(F.array(F.col("id")).alias("a"))

    try:
        with pytest.raises(TypeError, match="non-atomic column 'a'"):
            REGISTRY["zz_lint_nested_output_probe"].build(spark, "ignored")
    finally:
        del REGISTRY["zz_lint_nested_output_probe"]

    # and the fixed dq8 passes the guard: changed_cols is now a string
    from oxi_diel_db_spark.queries import load_registry

    df = load_registry()["dq8_snapshot_diff"].build(spark, "/root/testdata/sf0.001")
    assert dict(df.dtypes)["changed_cols"] == "string"


def test_numeric_family_parity_lint():
    """Round-7 driver failure class (q14): Spark FLOOR returns BIGINT,
    DuckDB FLOOR returns DOUBLE; the driver canonicalizer hashes 12345
    and 12345.0 differently even though values match. The sweep tool's
    family check must flag a planted int-vs-double mismatch and pass a
    matched pair."""
    from tools.check_oracle import numeric_family_mismatches

    # planted mismatch: spark bigint vs duck DOUBLE, and the converse
    bad = numeric_family_mismatches(
        {"floor_price": "bigint", "ratio": "double"},
        ["floor_price", "ratio"],
        ["DOUBLE", "BIGINT"],
    )
    assert bad == ["floor_price:bigint-vs-DOUBLE", "ratio:double-vs-BIGINT"]

    # matched families (and non-numeric columns) stay clean
    ok = numeric_family_mismatches(
        {"floor_price": "bigint", "ratio": "double", "name": "string"},
        ["floor_price", "ratio", "name"],
        ["BIGINT", "DOUBLE", "VARCHAR"],
    )
    assert ok == []


def test_q14_numeric_families_match_oracle(spark, sf_dir):
    """The q14 fix itself: both engines now emit BIGINT floor/ceil."""
    import duckdb

    from oxi_diel_db_spark.queries import load_registry
    from tools.check_oracle import TABLES, numeric_family_mismatches

    qd = load_registry()["q14_math_funcs"]
    sdf = qd.build(spark, sf_dir)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    rel = con.sql(qd.oracle)
    dcols = [d[0] for d in rel.description]
    dtypes = [str(x) for x in rel.types]
    assert numeric_family_mismatches(dict(sdf.dtypes), dcols, dtypes) == []
    assert dict(sdf.dtypes)["floor_price"] == "bigint"
    assert dict(zip(dcols, dtypes))["floor_price"] == "BIGINT"


def test_numeric_family_lint_flags_decimal():
    """r8 advice: DuckDB DECIMAL is its own family — it reaches the
    driver canonicalizer as decimal.Decimal / scaled repr, so BOTH
    bigint-vs-DECIMAL and double-vs-DECIMAL are the q14 hash class.
    Spark decimal vs DuckDB DECIMAL stays clean."""
    from tools.check_oracle import numeric_family_mismatches

    bad = numeric_family_mismatches(
        {"amt": "bigint", "rate": "double", "money": "decimal(18,2)"},
        ["amt", "rate", "money"],
        ["DECIMAL(18,3)", "DECIMAL(10,1)", "DOUBLE"],
    )
    assert bad == [
        "amt:bigint-vs-DECIMAL(18,3)",
        "rate:double-vs-DECIMAL(10,1)",
        "money:decimal(18,2)-vs-DOUBLE",
    ]
    ok = numeric_family_mismatches(
        {"money": "decimal(18,2)", "n": "bigint"},
        ["money", "n"],
        ["DECIMAL(18,2)", "BIGINT"],
    )
    assert ok == []
