"""Composition/site featurizers: spot-values vs hand math + numpy."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from oxi_diel_db_spark.functions import composition as C


def _one(spark, formula, col):
    df = spark.createDataFrame([(formula,)], "formula string")
    return df.select(col.alias("v")).collect()[0]["v"]


def test_stoichiometry_pnorms(spark):
    # SiO2: fractions (1/3, 2/3)
    p0 = _one(spark, "SiO2", C.stoichiometry_pnorm("formula", 0))
    p2 = _one(spark, "SiO2", C.stoichiometry_pnorm("formula", 2))
    assert p0 == 2.0
    assert abs(p2 - np.sqrt((1 / 3) ** 2 + (2 / 3) ** 2)) < 1e-12


def test_tmetal_fraction(spark):
    assert _one(spark, "SiO2", C.tmetal_fraction("formula")) == 0.0
    # Fe2O3: 2 of 5 atoms are transition metals
    assert abs(_one(spark, "Fe2O3", C.tmetal_fraction("formula")) - 0.4) < 1e-12


def test_en_stats(spark):
    stats = C.electronegativity_stats("formula")
    # Ca1 O1: mean = (1.00 + 3.44)/2
    assert abs(_one(spark, "CaO", stats["en_mean"]) - 2.22) < 1e-9
    assert _one(spark, "CaO", stats["en_min"]) == 1.00
    assert _one(spark, "CaO", stats["en_max"]) == 3.44


def test_total_atoms_weighting(spark):
    stats = C.electronegativity_stats("formula")
    # Ca2SnO4: weighted mean = (2*1.00 + 1*1.96 + 4*3.44)/7
    exp = (2 * 1.00 + 1 * 1.96 + 4 * 3.44) / 7
    assert abs(_one(spark, "Ca2SnO4", stats["en_mean"]) - exp) < 1e-9


def test_site_energy_matches_numpy(spark):
    from oxi_diel_db_spark.operators.site_features import (
        site_inverse_distance_energy,
    )
    from oxi_diel_db_spark.sources import materials as M

    mats = M.materials(spark).filter(F.col("mp_id") == "mp-4747")
    got = {
        r["site_idx"]: r["inv_dist_energy"]
        for r in site_inverse_distance_energy(mats).collect()
    }
    xyz = mats.select(F.col("structure.sites.xyz").alias("x")).collect()[0]["x"]
    pts = np.array(xyz)
    d = np.linalg.norm(pts[:, None, :] - pts[None, :, :], axis=-1)
    np.fill_diagonal(d, np.inf)
    exp = (1.0 / d).sum(axis=1)
    assert len(got) == len(pts)
    for i, e in enumerate(exp):
        assert abs(got[i] - e) < 1e-9


def test_min_distances_match_numpy(spark):
    from oxi_diel_db_spark.operators.site_features import site_min_distances
    from oxi_diel_db_spark.sources import materials as M

    mats = M.materials(spark).filter(F.col("mp_id") == "mp-4747")
    got = {r["site_idx"]: r["min_dist"] for r in site_min_distances(mats).collect()}
    xyz = mats.select(F.col("structure.sites.xyz").alias("x")).collect()[0]["x"]
    pts = np.array(xyz)
    d = np.linalg.norm(pts[:, None, :] - pts[None, :, :], axis=-1)
    np.fill_diagonal(d, np.inf)
    exp = d.min(axis=1)
    for i, e in enumerate(exp):
        assert abs(got[i] - e) < 1e-9


def test_band_center_spot(spark):
    # CaO: exp((ln 1.00 + ln 3.44)/2) = sqrt(1.00*3.44)
    got = _one(spark, "CaO", C.band_center("formula"))
    assert abs(got - np.sqrt(1.00 * 3.44)) < 1e-9


def test_formula_udtf(spark):
    from oxi_diel_db_spark.functions.udtfs import FormulaExplode, register_udtfs

    register_udtfs(spark)
    rows = spark.sql(
        "SELECT * FROM formula_explode('Ca2SnO4')"
    ).collect()
    assert [(r["element"], r["cnt"]) for r in rows] == [
        ("Ca", 2.0), ("Sn", 1.0), ("O", 4.0),
    ]
