"""SQL-surface registration of the engine function library
(SURVEY.md §2.8 F3 'register as engine scalar fn tensor_eigvals').

After register_all(spark), the SQL surface can call the engine's
Python-backed functions directly:

    SELECT tensor_eigvals(dielectric.epsilon_electronic) FROM materials
    SELECT * FROM formula_explode('Ca2SnO4')
    SELECT simhash64(text) FROM documents

Expression-based functions (parse_formula, quality_score, …) need no
registration — they compile to built-in Catalyst expressions and are
exposed as Python helpers; only genuinely-Python functions appear
here.
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf type-hint resolution
from pyspark.sql import SparkSession


def register_all(spark: SparkSession) -> None:
    import hashlib
    import re

    from pyspark.sql import functions as F

    from oxi_diel_db_spark.functions.arrays import tensor_eigvals
    from oxi_diel_db_spark.functions.udtfs import register_udtfs

    spark.udf.register("tensor_eigvals", tensor_eigvals)

    @F.pandas_udf("long")
    def _simhash64(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            words = [w for w in re.split(r"[^a-z0-9]+", (t or "").lower()) if w]
            acc = [0] * 64
            for w in words:
                h = int.from_bytes(hashlib.md5(w.encode()).digest()[:8], "big")
                for i in range(64):
                    acc[i] += 1 if (h >> i) & 1 else -1
            v = sum(1 << i for i in range(64) if acc[i] > 0)
            out.append(v - (1 << 64) if v >= (1 << 63) else v)
        return pd.Series(out)

    spark.udf.register("simhash64", _simhash64)
    register_udtfs(spark)  # formula_explode
