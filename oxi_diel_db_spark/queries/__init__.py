"""Named-query registry backing ``__spark_entry__.py``.

Every operator row in SURVEY.md §2 registers here as
``(name, spark_builder, oracle_sql_or_None)``. The driver runs the
Spark builder and the DuckDB oracle side-by-side at sf0.01 and compares
row-count + schema + order-insensitive value-hash.

Determinism rules (so value-hashes match across engines):

* Alias every computed column identically in Spark and SQL.
* Money-like SUMs go through DECIMAL (exact, order-independent), then
  CAST back to DOUBLE — double summation order differs across engines.
* Other derived doubles are ROUND()ed (4-6 dp) in both engines; their
  FP error is orders of magnitude below the rounding step.
* Timestamps: session timezone pinned to UTC (DuckDB is naive-UTC).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from oxi_diel_db_spark.session import configure


@dataclass(frozen=True)
class QueryDef:
    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL, or None → driver does rows-only check


REGISTRY: dict[str, QueryDef] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame`` under ``name``."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            configure(spark)  # UTC tz, AQE, Arrow — idempotent
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QueryDef(name, wrapped, oracle)
        return wrapped

    return deco


def load_registry() -> dict[str, QueryDef]:
    """Import every query module (side effect: fills REGISTRY).

    Import order IS registry iteration order (dicts preserve insertion),
    and the driver's correctness sweep samples a prefix of it — so the
    families go in round-robin verification priority: the LLM-pipeline
    (d*/s*/t*/p*/g*/mm*/c*), streaming (st*), and materials surfaces
    lead; the relational/TPC-H families (heavily sampled in earlier
    rounds) trail. Rotate this order in later rounds so every family
    accumulates official driver-checked rows.
    """
    from oxi_diel_db_spark.queries import (  # noqa: F401
        llm_ops,
        streaming_q,
        materials,
        relational,
        windows,
        joins,
        aggregates,
        extras,
    )

    return REGISTRY
