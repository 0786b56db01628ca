"""Every oracle-paired query must hash-match DuckDB — the driver's t2
gate, replicated at sf0.001 so the whole suite stays fast in pytest.
(tools/check_oracle.py runs the same comparison standalone at sf0.01.)
"""

from __future__ import annotations

import duckdb
import pytest

from tools.check_oracle import TABLES, table_hash

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


def _pairs():
    from __spark_entry__ import oracle_sql, queries

    qs, osql = queries(), oracle_sql()
    return [(name, qs[name], osql[name]) for name in sorted(osql)]


@pytest.mark.parametrize("name,fn,sql", _pairs(), ids=[p[0] for p in _pairs()])
def test_oracle_parity(spark, con, name, fn, sql):
    sdf = fn(spark, SF)
    srows = [tuple(r) for r in sdf.collect()]
    rel = con.sql(sql)
    dcols = [d[0] for d in rel.description]
    drows = rel.fetchall()
    assert len(srows) == len(drows), f"rowcount {len(srows)} vs {len(drows)}"
    assert sorted(sdf.columns) == sorted(dcols)
    assert table_hash(sdf.columns, srows) == table_hash(dcols, drows)
