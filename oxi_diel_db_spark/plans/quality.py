"""Data-quality assertions for the materials table (SURVEY.md §1.3:
'enforce invariants 1-6 as data-quality assertions on ingest').

Each invariant compiles to ONE filter count over the nested columns —
no UDFs, so the checks run at full scan speed and can gate a 100 TB
ingest as a single multi-aggregate pass (``invariant_violations`` fuses
them into one job).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from oxi_diel_db_spark.functions import arrays as A

TOL = 1e-6


def _violations() -> dict[str, Column]:
    eps = lambda kind: F.col(f"dielectric.epsilon_{kind}")  # noqa: E731
    checks: dict[str, Column] = {}
    for kind in ("electronic", "ionic"):
        checks[f"inv1_{kind}_avg_is_mean_eig"] = (
            F.abs(
                A.array_mean(F.col(f"dielectric.epsilon_{kind}_eig"))
                - F.col(f"dielectric.epsilon_{kind}_avg")
            )
            > TOL
        )
        # invariant 2 (eig == eigvals(tensor)) needs LAPACK → checked in
        # pytest via functions.arrays.tensor_eigvals, not at scan speed.
        checks[f"inv2_{kind}_tensor_is_3x3"] = (
            (F.size(eps(kind)) != 3)
            | (F.size(F.element_at(eps(kind), 1)) != 3)
        )
    checks["inv3_lowest_freq_is_min"] = (
        F.array_min("phonon.frequency") != F.col("phonon.lowest_freq")
    )
    checks["inv4_avg_abs_trace"] = (
        F.abs(
            A.avg_abs_trace3(F.col("born_effective_charge.tensors"))
            - F.col("born_effective_charge.avg_abs_trace")
        )
        > TOL
    )
    checks["inv5_nelements"] = F.size("elements") != F.col("nelements")
    checks["inv5_nsites"] = F.size("structure.sites") != F.col("nsites")
    checks["inv5_freq_3n"] = F.size("phonon.frequency") != 3 * F.col("nsites")
    checks["inv5_tensors_n"] = (
        F.size("born_effective_charge.tensors") != F.col("nsites")
    )
    checks["inv6_contains_O"] = ~F.array_contains("elements", "O")
    checks["inv6_band_gap"] = F.col("band_gap") < 0.5
    return checks


def invariant_violations(materials: DataFrame) -> dict[str, int]:
    """Violation count per invariant — ONE aggregate pass."""
    checks = _violations()
    row = materials.agg(
        *[
            F.sum(F.when(cond, 1).otherwise(0)).alias(name)
            for name, cond in checks.items()
        ]
    ).collect()[0]
    return {name: int(row[name]) for name in checks}


def assert_clean(materials: DataFrame) -> None:
    """Ingest gate: raise if any invariant is violated."""
    bad = {k: v for k, v in invariant_violations(materials).items() if v}
    if bad:
        raise ValueError(f"materials failed ingest invariants: {bad}")


def validated(materials: DataFrame) -> DataFrame:
    """Fail-fast scan (SURVEY §4.1: the reference validates before any
    compute, ml_prediction.py:64-67): returns the input with an inline
    raise_error CHECK — the first violating row aborts the job with the
    offending mp_id, instead of poisoning downstream aggregates.
    Zero-cost when clean: the check is one codegen'd branch per row."""
    checks = _violations()
    cond = None
    for c in checks.values():
        cond = c if cond is None else (cond | c)
    # the guard lives in a FILTER: an unused withColumn would be pruned
    # by Catalyst and the raise_error would never evaluate
    guard = F.when(
        cond,
        F.raise_error(
            F.concat(F.lit("materials invariant violated at mp_id="), F.col("mp_id"))
        ).cast("boolean"),
    ).otherwise(F.lit(True))
    return materials.filter(guard)
