#!/usr/bin/env python
"""Generate an sf1-shaped dataset (10× sf0.1) for scale runs.

The driver ships sf{0.001,0.01,0.1} only; the registry has never been
executed above sf0.1 (r8 verdict ask #4). This tool upscales sf0.1
10× with REFERENTIAL INTEGRITY preserved: replica r offsets every
primary key by r × (max_key+1) and every foreign key by the matching
offset, so join fan-outs, group cardinalities per key, and
survivorship shapes match a genuine 10× corpus rather than a skewed
blowup. region/nation stay fixed (they are SF-invariant in TPC-H).

Content columns are perturbed deterministically per replica where
exact cross-replica duplicates would distort an operator family:

* documents.text gets a per-replica suffix for r>0 — replicas become
  NEAR-duplicates (Jaccard ≈ 1), so the dedup tier sees realistic
  heavy duplication with bounded group size (10), not exact-hash
  collapse;
* embeddings get ±1e-3 deterministic noise for r>0 — semantic
  near-dups across replicas, exact planted structure preserved in
  the r=0 copy.

DuckDB does the heavy lifting (single process, ~seconds for 6M rows);
output parquet reads back through oxi_diel_db_spark.tables.load
(DuckDB TIMESTAMP → Spark timestamp_ntz → cast path).

Usage: python tools/gen_sf1.py [out_dir] [src_dir] [replicas]
Defaults: data/sf1  /root/testdata/sf0.1  10
"""

from __future__ import annotations

import os
import sys

import duckdb

OUT = sys.argv[1] if len(sys.argv) > 1 else "data/sf1"
SRC = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
R = int(sys.argv[3]) if len(sys.argv) > 3 else 10

# per-table key offsets (max_key+1 at sf0.1); FK columns share the
# offset of the table they reference
K_CUST, K_SUPP, K_PART, K_ORD = 15_000, 1_000, 20_000, 150_000
K_EVT, K_USER, K_DOC, K_VEC = 100_000, 1_500, 5_000, 2_000


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW reps AS SELECT range AS r FROM range({R})")

    def gen(name: str, select: str, passthrough: bool = False) -> None:
        src = f"read_parquet('{SRC}/{name}.parquet')"
        q = (
            f"COPY (SELECT * FROM {src}) TO '{OUT}/{name}.parquet' (FORMAT PARQUET)"
            if passthrough
            else f"COPY (SELECT {select} FROM {src} CROSS JOIN reps ORDER BY r) "
            f"TO '{OUT}/{name}.parquet' (FORMAT PARQUET)"
        )
        con.execute(q)
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{OUT}/{name}.parquet')"
        ).fetchone()[0]
        print(f"{name:12s} {n:>9,} rows")

    gen("region", "", passthrough=True)
    gen("nation", "", passthrough=True)
    gen(
        "customer",
        f"c_custkey + r*{K_CUST} AS c_custkey, c_name, c_nationkey, "
        "c_acctbal, c_mktsegment",
    )
    gen(
        "supplier",
        f"s_suppkey + r*{K_SUPP} AS s_suppkey, s_name, s_nationkey, s_acctbal",
    )
    gen(
        "part",
        f"p_partkey + r*{K_PART} AS p_partkey, p_name, p_brand, p_type, "
        "p_size, p_retailprice",
    )
    gen(
        "orders",
        f"o_orderkey + r*{K_ORD} AS o_orderkey, "
        f"o_custkey + r*{K_CUST} AS o_custkey, "
        "o_orderstatus, o_totalprice, o_orderdate, o_orderpriority",
    )
    gen(
        "lineitem",
        f"l_orderkey + r*{K_ORD} AS l_orderkey, "
        f"l_partkey + r*{K_PART} AS l_partkey, "
        f"l_suppkey + r*{K_SUPP} AS l_suppkey, "
        "l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, "
        "l_returnflag, l_linestatus, l_shipdate",
    )
    gen(
        "events",
        f"event_id + r*{K_EVT} AS event_id, ts, "
        f"user_id + r*{K_USER} AS user_id, event_type, value, props",
    )
    gen(
        "documents",
        f"doc_id + r*{K_DOC} AS doc_id, "
        "CASE WHEN r = 0 THEN text ELSE text || ' r' || r END AS text, "
        "lang, source, n_chars + CASE WHEN r = 0 THEN 0 ELSE 2 + "
        "length(CAST(r AS VARCHAR)) END AS n_chars",
    )
    gen(
        "embeddings",
        f"vec_id + r*{K_VEC} AS vec_id, "
        "CASE WHEN r = 0 THEN embedding ELSE "
        "list_transform(list_zip(embedding, range(len(embedding))), "
        "z -> CAST(z[1] + 0.001 * sin(vec_id * 7.3 + r * 1.7 + z[2]) "
        "AS FLOAT)) END AS embedding, label",
    )
    print(f"\nwrote {OUT} ({R}x {SRC})")


if __name__ == "__main__":
    main()
