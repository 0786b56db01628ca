"""Synthetic fixture generator (FIXTURES.md A1/A2) × the ingest
data-quality gate (SURVEY §1.3): invariants must hold by construction
on generated corpora of any size, and the gate must catch corruption."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from oxi_diel_db_spark.plans import quality
from oxi_diel_db_spark.sources import fixtures


@pytest.fixture(scope="module")
def synth(spark):
    return fixtures.generate_materials(spark, n=150, seed=7).cache()


def test_synthetic_corpus_passes_all_invariants(spark, synth):
    assert all(v == 0 for v in quality.invariant_violations(synth).values())
    quality.assert_clean(synth)  # no raise


def test_real_corpus_passes_gate(spark):
    from oxi_diel_db_spark.sources import materials as M

    quality.assert_clean(M.materials(spark))


def test_gate_catches_corruption(spark, synth):
    corrupted = synth.withColumn(
        "nsites", F.when(F.col("mp_id").endswith("7"), F.col("nsites") + 1).otherwise(F.col("nsites"))
    )
    v = quality.invariant_violations(corrupted)
    assert v["inv5_nsites"] > 0
    with pytest.raises(ValueError, match="inv5_nsites"):
        quality.assert_clean(corrupted)


def test_synthetic_predictions_fixture(spark, synth):
    preds = fixtures.generate_predictions(synth, seed=7)
    n_models = preds.select("model").distinct().count()
    assert n_models == 4
    # anti-join fixture: some ids unscored
    unscored = synth.join(preds, "mp_id", "left_anti").count()
    assert 0 <= unscored <= 10
    # fidelity band like the reference's golden files
    el = preds.filter(F.col("model") == "el_comp")
    c = (
        synth.join(el, "mp_id")
        .select(
            F.corr(F.log10("dielectric.epsilon_electronic_avg"), "log10_eps").alias("c")
        )
        .collect()[0]["c"]
    )
    assert c > 0.9


def test_synthetic_schema_matches_real(spark, synth):
    from oxi_diel_db_spark.sources import materials as M

    # parquet round-trip relaxes nullability; compare type structure
    assert synth.schema.simpleString() == M.materials(spark).schema.simpleString()


def test_validated_scan_passes_clean_and_raises_on_corrupt(spark, synth):
    # clean corpus: validation is a pass-through
    assert quality.validated(synth).count() == synth.count()
    corrupted = synth.withColumn(
        "band_gap",
        F.when(F.col("mp_id").endswith("3"), -1.0).otherwise(F.col("band_gap")),
    )
    with pytest.raises(Exception, match="invariant violated at mp_id"):
        quality.validated(corrupted).count()


def test_distributed_generator_scale_smoke(spark):
    """20k synthetic materials generated executor-side: the invariant
    gate and the explode-aggregate path must hold beyond the 1,278-row
    real corpus (the shape a 100 TB load test scales up)."""
    big = fixtures.generate_materials_distributed(spark, n=20000, seed=11)
    assert big.count() == 20000
    v = quality.invariant_violations(big)
    assert all(x == 0 for x in v.values()), v
    # explode-aggregate over ~250k sites
    sites = big.select(F.explode("structure.sites").alias("s"))
    n_sites = sites.count()
    assert n_sites > 200000
    per = big.groupBy("nelements").count().collect()
    assert sum(r["count"] for r in per) == 20000
