"""oxi_diel_db_spark — a PySpark-native analytics engine.

A ground-up Spark reimplementation of the query & data-processing
capabilities of the reference repo ``takahashi-akira-36m/oxi_diel_db``
(a materials-science document store + ML inference pipeline), extended
with general relational, streaming, and LLM-data-pipeline operators
(dedup, similarity search, multimodal columns, text analysis), all
designed for a 1000-executor / 100 TB posture while being testable on
``local[*]``.

Layout
------
- ``session``     : SparkSession builder with scale-ready defaults
- ``tables``      : loaders for the driver's TPC-H-ish parquet tables
- ``sources``     : materials JSON ingest (explicit nested schema), predictions
- ``functions``   : scalar/array function library (tensor eig, formula parse,
                    text analysis, vector math)
- ``operators``   : composed operators Spark lacks as single primitives
                    (as-of join, dedup family, ANN search, multimodal plumbing)
- ``queries``     : the registry of named queries + DuckDB oracle SQL that
                    backs ``__spark_entry__.py``
- ``ml``          : MLlib pipeline mirroring the reference's predictor
- ``streaming``   : Structured Streaming recipes (windows, watermarks, state)
"""

__version__ = "0.1.0"


def __getattr__(name):
    if name == "Engine":  # lazy: avoid importing the ML stack at package import
        from oxi_diel_db_spark.engine import Engine

        return Engine
    raise AttributeError(name)
