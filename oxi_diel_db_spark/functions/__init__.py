"""Engine scalar/array function library (SURVEY.md §2.8).

Every function is built from JVM-side ``pyspark.sql.functions``
expressions (whole-stage-codegen'd) unless the math genuinely needs
Python (eigenvalues → one vectorized pandas_udf). Functions that back
oracle-checked queries have SQL twins (DuckDB dialect) defined beside
them so Spark and oracle always tokenize/compute identically.
"""
