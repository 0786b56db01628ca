#!/usr/bin/env python
"""One-time ingest: reference JSON corpus → repo-committed parquet.

Reads /root/reference/oxi_diel_db/data/*.json (1,278 multiLine docs,
CC BY 4.0) with the explicit MATERIALS_SCHEMA and the 4 golden
prediction maps, writes data/materials.parquet + data/predictions.parquet.
Queries and the DuckDB oracle both read the parquet afterwards —
multiLine JSON is a one-time cost by design (SURVEY §7 hard part (f)).

Usage: python scripts/ingest_materials.py
"""

import sys

sys.path.insert(0, ".")

from oxi_diel_db_spark.session import get_spark
from oxi_diel_db_spark.sources.materials import ingest_to_parquet


def main() -> None:
    spark = get_spark("ingest_materials")
    ingest_to_parquet(spark)
    from oxi_diel_db_spark.sources.materials import materials, predictions

    n_mat = materials(spark).count()
    n_pred = predictions(spark).count()
    print(f"materials: {n_mat} rows, predictions: {n_pred} rows")
    assert n_mat == 1278, n_mat
    assert n_pred == 4 * 1266, n_pred


if __name__ == "__main__":
    main()
