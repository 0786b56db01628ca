"""Materials-domain golden tests (SURVEY.md §5.2 layer 2): the six
verified invariants, the 1,266/12 join fixture, eigenvalue parity, and
model-fidelity floors — all against the ingested reference corpus."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from oxi_diel_db_spark.functions import arrays as A
from oxi_diel_db_spark.sources import materials as M


@pytest.fixture(scope="module")
def mats(spark):
    return M.materials(spark).cache()


@pytest.fixture(scope="module")
def preds(spark):
    return M.predictions(spark).cache()


def test_corpus_count(mats):
    assert mats.count() == 1278


def test_invariant1_eps_avg_is_mean_eig(mats):
    for kind in ("electronic", "ionic"):
        bad = mats.filter(
            F.abs(
                A.array_mean(F.col(f"dielectric.epsilon_{kind}_eig"))
                - F.col(f"dielectric.epsilon_{kind}_avg")
            )
            > 1e-6
        ).count()
        assert bad == 0, kind


def test_invariant2_eig_of_tensor(mats):
    """epsilon_*_eig are the eigenvalues of the 3×3 tensor (via the
    engine's vectorized tensor_eigvals)."""
    for kind in ("electronic", "ionic"):
        calc = A.tensor_eigvals(F.col(f"dielectric.epsilon_{kind}"))
        stored = F.array_sort(F.col(f"dielectric.epsilon_{kind}_eig"))
        bad = mats.select(
            F.array_max(F.zip_with(calc, stored, lambda a, b: F.abs(a - b))).alias("d")
        ).filter(F.col("d") > 1e-4).count()
        assert bad == 0, kind


def test_invariant3_lowest_freq(mats):
    bad = mats.filter(
        F.array_min("phonon.frequency") != F.col("phonon.lowest_freq")
    ).count()
    assert bad == 0


def test_invariant4_avg_abs_trace(mats):
    bad = mats.filter(
        F.abs(
            A.avg_abs_trace3(F.col("born_effective_charge.tensors"))
            - F.col("born_effective_charge.avg_abs_trace")
        )
        > 1e-6
    ).count()
    assert bad == 0


def test_invariant5_sizes(mats):
    assert mats.filter(F.size("elements") != F.col("nelements")).count() == 0
    assert mats.filter(F.size("structure.sites") != F.col("nsites")).count() == 0
    assert mats.filter(F.size("phonon.frequency") != 3 * F.col("nsites")).count() == 0
    assert (
        mats.filter(
            F.size("born_effective_charge.tensors") != F.col("nsites")
        ).count()
        == 0
    )


def test_invariant6_screening(mats):
    assert mats.filter(~F.array_contains("elements", "O")).count() == 0
    assert mats.filter(F.col("band_gap") < 0.5).count() == 0


def test_join_fixture_1266_and_12(mats, preds):
    el = preds.filter(F.col("model") == "el_comp")
    assert mats.join(el, "mp_id").count() == 1266
    unscored = mats.join(preds, "mp_id", "left_anti")
    ids = {r["mp_id"] for r in unscored.select("mp_id").collect()}
    assert len(ids) == 12
    assert "mp-733" in ids and "mp-1103519" in ids  # SURVEY §1.1 list


def test_golden_correlation(mats, preds):
    """corr(golden prediction, stored log10 ε) ≥ 0.98 / 0.96 — the
    reference's model-fidelity floor (BASELINE.md)."""
    for model, col, floor in (
        ("el_comp", "dielectric.epsilon_electronic_avg", 0.98),
        ("ion_comp", "dielectric.epsilon_ionic_avg", 0.96),
    ):
        p = preds.filter(F.col("model") == model)
        c = (
            mats.join(p, "mp_id")
            .select(F.corr(F.log10(col), "log10_eps").alias("c"))
            .collect()[0]["c"]
        )
        assert c >= floor, (model, c)


def test_tensor_invariants_match_eigenvalue_symmetric_functions(spark):
    """m33's content claim: the matrix invariants equal the elementary
    symmetric functions of the stored eigenvalues (Newton/Vieta) on
    every corpus record — the algebraic form of invariant 2."""
    from oxi_diel_db_spark.queries import load_registry

    df = load_registry()["m33_tensor_invariants"].build(spark, "ignored")
    bad = df.filter(
        (F.abs(F.col("i1_trace") - F.col("eig_sum")) > 1e-3)
        | (F.abs(F.col("i2_minors") - F.col("eig_pairsum")) > 1e-2)
        | (F.abs(F.col("i3_det") - F.col("eig_prod")) > 1e-2)
    ).count()
    assert bad == 0


def test_closed_form_eigvals_match_lapack(spark):
    """m34's content claim: the trigonometric closed-form eigenvalues
    (pure Catalyst expressions) agree with numpy's LAPACK eigvalsh
    (the m10 pandas_udf) on every corpus tensor — two independent
    algorithms, one answer."""
    from oxi_diel_db_spark.functions import arrays as A
    from oxi_diel_db_spark.queries import load_registry
    from oxi_diel_db_spark.sources import materials as M

    import numpy as np

    closed = {
        r["mp_id"]: (r["eig_min"], r["eig_mid"], r["eig_max"])
        for r in load_registry()["m34_eigvals_closed_form"]
        .build(spark, "ignored")
        .collect()
    }
    raw = M.materials(spark).select(
        "mp_id", F.col("dielectric.epsilon_electronic").alias("t")
    ).collect()
    assert len(raw) == len(closed) == 1278
    worst = 0.0
    for r in raw:
        t = np.array(r["t"])
        # symmetrize before eigvalsh, matching m34's convention (the
        # stored tensors are asymmetric by up to ~1.5e-2 and eigvalsh
        # reads only one triangle)
        lap = np.linalg.eigvalsh((t + t.T) / 2)
        cf = closed[r["mp_id"]]
        worst = max(worst, max(abs(lap[i] - cf[i]) for i in range(3)))
    assert worst < 2e-6, worst  # 1e-6 rounding step + ULP noise
