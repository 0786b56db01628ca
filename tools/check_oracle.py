#!/usr/bin/env python
"""Local replica of the driver's t2 correctness gate.

Runs every queries() entry on Spark and its oracle_sql() twin on DuckDB
at the given sf dir, compares row count, column-name sets, and an
order-insensitive value hash (columns sorted by name, rows sorted,
floats rounded to 9 significant-ish decimals before hashing).

Usage: python tools/check_oracle.py [sf_dir] [query_name ...]

ANSI mode sweep: SPARK_GRAFT_ANSI=true python tools/check_oracle.py
runs the identical sweep with spark.sql.ansi.enabled=true (session.py
reads the env override inside configure(), so the per-query wrapper
can't flip it back). Every hash must match in BOTH modes — proof no
query's values depend on legacy NULL/size/cast semantics.
"""

from __future__ import annotations

import hashlib
import math
import sys
import time

sys.path.insert(0, ".")

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def norm_val(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_val(x) for x in v) + "]"
    return str(v)


_SPARK_INT = {"tinyint", "smallint", "int", "bigint"}
_SPARK_FLOAT = {"float", "double"}
_DUCK_INT = {
    "TINYINT", "SMALLINT", "INTEGER", "BIGINT",
    "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT",
}
_DUCK_FLOAT = {"FLOAT", "DOUBLE"}


def numeric_family_mismatches(
    spark_dtypes: dict[str, str], duck_cols: list[str], duck_types: list[str]
) -> list[str]:
    """Columns where Spark emits an int family and the oracle a float
    family (or vice versa). The driver's pandas canonicalizer hashes
    12345 and 12345.0 differently, so numerically-identical results
    still fail the official gate (r7's q14, r6's dq8 class). Local
    ``norm_val``'s %.9g hides this — flag it structurally instead."""
    bad = []
    for c, dty in zip(duck_cols, duck_types):
        sty = spark_dtypes.get(c)
        if sty is None:
            continue  # schema check reports missing columns
        s_dec = sty.startswith("decimal")
        d_dec = dty.upper().startswith("DECIMAL")
        s_int, s_flt = sty in _SPARK_INT, sty in _SPARK_FLOAT
        d_int, d_flt = dty in _DUCK_INT, dty in _DUCK_FLOAT
        # DECIMAL is its OWN family (r8 advice): DuckDB DECIMAL comes
        # back through pandas as decimal.Decimal / scaled repr, so both
        # bigint-vs-DECIMAL AND double-vs-DECIMAL can canonicalize
        # differently — the exact q14 class the lint exists to kill.
        if (
            (s_dec and (d_int or d_flt))
            or (d_dec and (s_int or s_flt))
            or (s_int and d_flt)
            or (s_flt and d_int)
        ):
            bad.append(f"{c}:{sty}-vs-{dty}")
    return bad


def table_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(norm_val(r[i]) for i in order) for r in rows)
    h = hashlib.md5()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def main() -> None:
    import duckdb

    from __spark_entry__ import oracle_sql, queries
    from oxi_diel_db_spark.session import get_spark

    spark = get_spark("check_oracle")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    qs, os_ = queries(), oracle_sql()

    # GK exactness-regime refusal (r12 verdict Next #2): the q74/q75
    # hash gates are provably exact only while every group holds
    # < accuracy/2 rows (see _GK_EXACT_ACC in queries/aggregates.py).
    # Above that the in-plan assert_true guard fails the Spark side
    # loudly; here we refuse up front with the regime pointer so a
    # large-sf sweep degrades to an explicit SKIP, never a silent red.
    from oxi_diel_db_spark.queries.aggregates import _GK_EXACT_ACC

    gk_limit = _GK_EXACT_ACC // 2
    gk_skip: dict[str, str] = {}
    for gk_name, probe_sql in (
        (
            "q74_approx_percentiles",
            "SELECT MAX(n) FROM (SELECT COUNT(*) AS n FROM orders "
            "GROUP BY o_orderstatus)",
        ),
        ("q75_approx_ntile", "SELECT COUNT(*) FROM customer"),
    ):
        if gk_name in qs and (not ONLY or gk_name in ONLY):
            n_max = con.sql(probe_sql).fetchone()[0] or 0
            if n_max >= gk_limit:
                gk_skip[gk_name] = (
                    f"SKIP gk-regime: max group {n_max} >= accuracy/2 "
                    f"({gk_limit}); hash gate only certified inside the "
                    "GK exactness window (queries/aggregates.py "
                    "_GK_EXACT_ACC note) — re-certify before gating here"
                )

    results = {}
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        if name in gk_skip:
            results[name] = gk_skip[name]
            print(f"{name:28s} {gk_skip[name]}", flush=True)
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            stypes = dict(sdf.dtypes)
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            results[name] = f"SPARK-ERROR: {type(e).__name__}: {e}"
            print(f"{name:28s} SPARK-ERROR {e}", flush=True)
            continue
        if name not in os_:
            results[name] = f"rows-only ({len(srows)} rows)"
            print(f"{name:28s} rows-only    {len(srows):6d} rows  {time.time()-t0:5.1f}s", flush=True)
            continue
        try:
            rel = con.sql(os_[name])
            dcols = [d[0] for d in rel.description]
            dtypes = [str(x) for x in rel.types]
            drows = rel.fetchall()
        except Exception as e:  # noqa: BLE001
            results[name] = f"DUCK-ERROR: {type(e).__name__}: {e}"
            print(f"{name:28s} DUCK-ERROR  {e}", flush=True)
            continue
        problems = []
        # The driver fetches through pandas/arrow, where HUGEINT/DECIMAL
        # become float64/object and hash differently than Spark's int64.
        # Our fetchall() path hides that — flag the types explicitly.
        bad_types = [
            f"{c}:{ty}"
            for c, ty in zip(dcols, dtypes)
            if ty in ("HUGEINT", "UHUGEINT") or ty.startswith("DECIMAL")
        ]
        if bad_types:
            problems.append(f"oracle-type {','.join(bad_types)} (cast to BIGINT/DOUBLE)")
        fam = numeric_family_mismatches(stypes, dcols, dtypes)
        if fam:
            problems.append(f"numeric-family {','.join(fam)}")
        if len(srows) != len(drows):
            problems.append(f"rowcount {len(srows)} vs {len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"schema {sorted(scols)} vs {sorted(dcols)}")
        if not problems:
            hs, hd = table_hash(scols, srows), table_hash(dcols, drows)
            if hs != hd:
                problems.append("value-hash mismatch")
                # show a few differing lines for debugging
                order_s = sorted(range(len(scols)), key=lambda i: scols[i])
                order_d = sorted(range(len(dcols)), key=lambda i: dcols[i])
                ls = sorted("|".join(norm_val(r[i]) for i in order_s) for r in srows)
                ld = sorted("|".join(norm_val(r[i]) for i in order_d) for r in drows)
                diffs = [(a, b) for a, b in zip(ls, ld) if a != b][:3]
                for a, b in diffs:
                    print(f"    spark: {a[:160]}")
                    print(f"    duck : {b[:160]}")
        status = "OK" if not problems else "; ".join(problems)
        results[name] = status
        print(f"{name:28s} {status:12s} {len(srows):6d} rows  {time.time()-t0:5.1f}s", flush=True)

    n_ok = sum(1 for v in results.values() if v == "OK")
    n_ro = sum(1 for v in results.values() if str(v).startswith("rows-only"))
    n_skip = sum(1 for v in results.values() if str(v).startswith("SKIP"))
    n_bad = len(results) - n_ok - n_ro - n_skip
    print(
        f"\n{n_ok} OK, {n_ro} rows-only, {n_skip} skipped, "
        f"{n_bad} FAILING of {len(results)}"
    )
    if n_bad:
        for k, v in results.items():
            if v != "OK" and not str(v).startswith(("rows-only", "SKIP")):
                print(f"  FAIL {k}: {v}")
        sys.exit(1)


if __name__ == "__main__":
    main()
