"""Engine facade: the switch-from-the-reference user journey."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def eng(spark, sf_dir):
    from oxi_diel_db_spark.engine import Engine

    return Engine(spark, sf_dir)


def test_sql_over_registered_views(eng):
    n = eng.sql("SELECT count(*) AS n FROM materials WHERE band_gap > 3").collect()[0]["n"]
    assert 0 < n < 1278
    assert eng.sql("SELECT count(*) AS n FROM lineitem").collect()[0]["n"] == 6000


def test_registered_sql_functions(eng):
    row = eng.sql(
        """
        SELECT tensor_eigvals(dielectric.epsilon_electronic) AS eig,
               dielectric.epsilon_electronic_eig AS stored
        FROM materials WHERE mp_id = 'mp-4747'
        """
    ).collect()[0]
    assert len(row["eig"]) == 3
    assert abs(row["eig"][0] - sorted(row["stored"])[0]) < 1e-6

    rows = eng.sql("SELECT * FROM formula_explode('SiO2')").collect()
    assert [(r["element"], r["cnt"]) for r in rows] == [("Si", 1.0), ("O", 2.0)]

    h = eng.sql("SELECT simhash64('the quick brown fox') AS h").collect()[0]["h"]
    assert isinstance(h, int)


def test_table_and_query_access(eng):
    assert eng.table("region").count() == 5
    assert eng.table("materials").count() == 1278
    assert eng.query("q01_pricing_summary").count() == 6


def test_prediction_api(eng):
    pred = eng.predict_log10_eps("SiO2", "electronic", "comp", num_trees=10)
    assert 0.0 < pred < 1.5  # log10 of a plausible electronic epsilon


def test_python_sink_shards_and_preserves_rows(spark, tmp_path):
    """The custom Python DataSource sink must write one shard per
    partition and preserve every row byte-exactly (read-back equals
    input)."""
    import glob

    from pyspark.sql import functions as F

    from oxi_diel_db_spark.sources.jsonl_sink import register_sink

    register_sink(spark)
    out = str(tmp_path / "shards")
    df = spark.range(1000).select(
        "id", (F.col("id") % 7).alias("k")
    ).repartition(5)
    df.write.format("jsonl_shards").option("path", out).mode("append").save()
    files = glob.glob(out + "/part-*.jsonl")
    assert len(files) == 5
    back = spark.read.schema("id bigint, k bigint").json(out)
    assert back.count() == 1000
    assert back.exceptAll(df).count() == 0 and df.exceptAll(back).count() == 0
