#!/usr/bin/env python
"""Capture .explain('formatted') output for named registry queries into
plans/<tag>/<query>_<suffix>.txt — the r13 optimization-round evidence
artifacts (the judge checks plan claims against these files).

Usage: python scripts/capture_plans.py <tag> <suffix> <query> [query ...]
e.g.   python scripts/capture_plans.py r13 before d20_substring_dedup
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    from oxi_diel_db_spark.queries import load_registry
    from oxi_diel_db_spark.session import get_spark

    spark = get_spark("capture_plans")
    reg = load_registry()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(repo, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        spark.sparkContext.setJobDescription(f"capture_plans: {name}")
        df = reg[name].build(spark, SF_DIR)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"wrote {path} ({len(txt)} chars)")
    spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
