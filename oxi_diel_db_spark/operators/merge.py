"""MERGE / CDC recipes (no Delta/Iceberg jars in this image — the
semantics as pure DataFrame algebra, per the classic emulation:
anti-join + union for upsert, window over version history for SCD2).

At 100 TB both recipes are one shuffle on the merge key; with the
target bucketed by key (operators/scale.write_bucketed) the anti-join
side needs no shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_upsert(target: DataFrame, source: DataFrame, key: str) -> DataFrame:
    """MERGE INTO target USING source ON key
       WHEN MATCHED THEN UPDATE *  WHEN NOT MATCHED THEN INSERT *.

    = source ∪ (target ⟕̸ source)  (source wins on key collision).
    Column sets must match (the full-row update form)."""
    untouched = target.join(source.select(key), key, "left_anti")
    return source.select(*target.columns).unionByName(untouched)


def merge_delete(target: DataFrame, tombstones: DataFrame, key: str) -> DataFrame:
    """WHEN MATCHED THEN DELETE — anti-join with the tombstone keys."""
    return target.join(tombstones.select(key), key, "left_anti")


def scd2_intervals(
    versions: DataFrame,
    key: str,
    ts_col: str,
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Slowly-changing-dimension type 2: a stream of (key, ts, attrs)
    versions → effectivity intervals [valid_from, valid_to) per key,
    valid_to = next version's ts (NULL marks the current version).
    One window per key; no self-join. ``tiebreak`` columns make the
    version order total when timestamps can collide."""
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in (tiebreak or [])]
    w = Window.partitionBy(key).orderBy(*order)
    return (
        versions.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead(ts_col).over(w))
        .withColumn("is_current", F.col("valid_to").isNull())
        .drop(ts_col)
    )
