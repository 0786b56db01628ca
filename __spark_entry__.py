"""Driver contract for the spark-graft builder (PySpark target).

entry()      — flagship pricing-summary aggregation at sf0.001.
queries()    — every implemented operator from SURVEY.md §2
               (oxi_diel_db_spark.queries registry).
oracle_sql() — DuckDB twins for the hash-checked subset; approx /
               domain-UDF / stateful-streaming queries are rows-only
               by design (SURVEY §5.2).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from oxi_diel_db_spark.queries import load_registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    reg = load_registry()
    return reg["q01_pricing_summary"].build(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: qd.build for name, qd in load_registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each hash-checkable query."""
    return {
        name: qd.oracle
        for name, qd in load_registry().items()
        if qd.oracle is not None
    }
