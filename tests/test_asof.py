"""asof_join correctness vs pandas merge_asof (the well-known reference
implementation) on synthetic keyed timelines, plus edge semantics."""

from __future__ import annotations

import datetime as dt

import pandas as pd

from oxi_diel_db_spark.operators.asof import asof_join

T0 = dt.datetime(2024, 1, 1)


def _ts(minutes):
    return T0 + dt.timedelta(minutes=minutes)


def test_asof_matches_pandas(spark):
    build = pd.DataFrame(
        {
            "k": [1, 1, 1, 2, 2, 3],
            "bts": [_ts(0), _ts(10), _ts(20), _ts(5), _ts(15), _ts(100)],
            "val": [10.0, 11.0, 12.0, 20.0, 21.0, 30.0],
        }
    )
    probe = pd.DataFrame(
        {
            "k": [1, 1, 1, 2, 2, 3, 4],
            "pts": [_ts(-1), _ts(10), _ts(25), _ts(4), _ts(16), _ts(50), _ts(9)],
        }
    )
    got = (
        asof_join(
            spark.createDataFrame(probe),
            spark.createDataFrame(build),
            on="k",
            probe_ts="pts",
            build_ts="bts",
            payload=["val"],
            how="left",
        )
        .toPandas()
        .sort_values(["k", "pts"])
        .reset_index(drop=True)
    )
    exp = (
        pd.merge_asof(
            probe.sort_values("pts"),
            build.sort_values("bts"),
            left_on="pts",
            right_on="bts",
            by="k",
            direction="backward",  # <= semantics, inclusive — same as ours
        )
        .drop(columns=["bts"])
        .sort_values(["k", "pts"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[["k", "pts", "val"]], exp[["k", "pts", "val"]])


def test_asof_inner_drops_unmatched(spark):
    build = spark.createDataFrame(
        pd.DataFrame({"k": [1], "bts": [_ts(10)], "val": [1.0]})
    )
    probe = spark.createDataFrame(
        pd.DataFrame({"k": [1, 1, 2], "pts": [_ts(5), _ts(15), _ts(15)]})
    )
    rows = asof_join(
        probe, build, on="k", probe_ts="pts", build_ts="bts",
        payload=["val"], how="inner",
    ).collect()
    assert len(rows) == 1
    assert rows[0]["val"] == 1.0


def test_asof_tie_is_inclusive(spark):
    """build.ts == probe.ts must match (DuckDB ASOF >= semantics)."""
    build = spark.createDataFrame(
        pd.DataFrame({"k": [1], "bts": [_ts(10)], "val": [7.0]})
    )
    probe = spark.createDataFrame(pd.DataFrame({"k": [1], "pts": [_ts(10)]}))
    rows = asof_join(
        probe, build, on="k", probe_ts="pts", build_ts="bts",
        payload=["val"], how="left",
    ).collect()
    assert rows[0]["val"] == 7.0


def test_asof_null_build_ts_never_matches(spark):
    import pandas as pd

    build = spark.createDataFrame(
        pd.DataFrame({"k": [1, 1], "bts": [None, _ts(10)], "val": [99.0, 1.0]}),
        "k long, bts timestamp, val double",
    )
    probe = spark.createDataFrame(
        pd.DataFrame({"k": [1, 1], "pts": [_ts(5), _ts(15)]}),
        "k long, pts timestamp",
    )
    rows = {r["pts"]: r["val"] for r in asof_join(
        probe, build, on="k", probe_ts="pts", build_ts="bts",
        payload=["val"], how="left",
    ).collect()}
    assert rows[_ts(5)] is None    # no build row at/before
    assert rows[_ts(15)] == 1.0    # null-ts row never carried


def test_asof_null_key_never_matches(spark):
    """ADVICE r1: NULL probe keys must NOT receive NULL-key build
    payload (SQL equality semantics — NULL never equals NULL)."""
    import pandas as pd

    build = spark.createDataFrame(
        pd.DataFrame({"k": [None, 1], "bts": [_ts(1), _ts(1)],
                      "val": [99.0, 1.0]}),
        "k long, bts timestamp, val double",
    )
    probe = spark.createDataFrame(
        pd.DataFrame({"k": [None, 1], "pts": [_ts(5), _ts(5)]}),
        "k long, pts timestamp",
    )
    left = {r["k"]: r["val"] for r in asof_join(
        probe, build, on="k", probe_ts="pts", build_ts="bts",
        payload=["val"], how="left",
    ).collect()}
    assert left[None] is None   # NULL key: kept, payload NULL
    assert left[1] == 1.0
    inner = asof_join(
        probe, build, on="k", probe_ts="pts", build_ts="bts",
        payload=["val"], how="inner",
    ).collect()
    assert [r["k"] for r in inner] == [1]


def test_pit_enrich_two_streams(spark):
    """pit_enrich: each observation gets the latest at-or-before value
    from EVERY stream independently — one stream matching never implies
    the other does, ties are inclusive, NULL keys get NULL payloads."""
    import pandas as pd

    from oxi_diel_db_spark.operators.asof import pit_enrich

    obs = spark.createDataFrame(
        pd.DataFrame({"k": [1, 1, 2, None], "ots": [_ts(5), _ts(10), _ts(5), _ts(5)]}),
        "k long, ots timestamp",
    )
    s1 = spark.createDataFrame(
        pd.DataFrame({"k": [1, 1, 2], "t1": [_ts(4), _ts(10), _ts(7)],
                      "a": [10.0, 11.0, 20.0]}),
        "k long, t1 timestamp, a double",
    )
    s2 = spark.createDataFrame(
        pd.DataFrame({"k": [1], "t2": [_ts(6)], "b": [100.0]}),
        "k long, t2 timestamp, b double",
    )
    rows = {
        (r["k"], r["ots"].minute): (r["a"], r["b"])
        for r in pit_enrich(
            obs, [(s1, "t1", ["a"]), (s2, "t2", ["b"])], on="k", probe_ts="ots"
        ).collect()
    }
    assert rows[(1, 5)] == (10.0, None)      # s1 matched, s2 in future
    assert rows[(1, 10)] == (11.0, 100.0)    # tie inclusive on s1
    assert rows[(2, 5)] == (None, None)      # both streams in future
    assert rows[(None, 5)] == (None, None)   # NULL key never matches
    assert len(rows) == 4                    # all observations kept
