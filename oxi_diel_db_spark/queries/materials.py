"""Materials-domain queries — the REF operator rows of SURVEY.md §2
(S1-S2, P1/P5, J1-J2, A2-A5, F3-F4, O1) on the ingested reference
corpus.

The corpus parquet is committed at data/materials.parquet (built once by
scripts/ingest_materials.py from /root/reference — CC BY 4.0). Oracle
SQL reads the SAME parquet via read_parquet(), so Spark and DuckDB see
identical bits; sf_dir is ignored (the corpus has one scale).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from oxi_diel_db_spark.functions import arrays as A
from oxi_diel_db_spark.functions import formula as FM
from oxi_diel_db_spark.queries import register
from oxi_diel_db_spark.queries._util import r6
from oxi_diel_db_spark.sources import materials as M

_MAT = f"read_parquet('{M.MATERIALS_PARQUET}/*.parquet')"
_PRED = f"read_parquet('{M.PREDICTIONS_PARQUET}/*.parquet')"


@register(
    "m01_point_lookup",
    oracle=f"""
    SELECT mp_id, formula, band_gap, nsites, nelements,
           spacegroup.symbol AS sg_symbol, is_direct
    FROM {_MAT} WHERE mp_id = 'mp-4747'
    """,
)
def m01_point_lookup(spark, sf_dir):
    """S2: point lookup by mp_id + nested projection (reference
    main.py:26-29 opens exactly one record). The mp_id predicate prunes
    parquet row groups; nested pruning reads only spacegroup.symbol."""
    return M.materials(spark).filter(F.col("mp_id") == "mp-4747").select(
        "mp_id",
        "formula",
        "band_gap",
        "nsites",
        "nelements",
        F.col("spacegroup.symbol").alias("sg_symbol"),
        "is_direct",
    )


@register(
    "m02_eps_avg_invariant",
    oracle=f"""
    SELECT mp_id,
           (dielectric.epsilon_electronic_eig[1] + dielectric.epsilon_electronic_eig[2]
            + dielectric.epsilon_electronic_eig[3]) / 3.0 AS el_avg_calc,
           dielectric.epsilon_electronic_avg AS el_avg_stored,
           ABS((dielectric.epsilon_electronic_eig[1] + dielectric.epsilon_electronic_eig[2]
            + dielectric.epsilon_electronic_eig[3]) / 3.0
               - dielectric.epsilon_electronic_avg) < 1e-6 AS holds
    FROM {_MAT}
    """,
)
def m02_eps_avg_invariant(spark, sf_dir):
    """A2 / invariant 1: epsilon_electronic_avg == mean(eig). Explicit
    ((a+b)+c)/3 so the recomputation is bit-identical in both engines."""
    m = M.materials(spark)
    calc = A.mean3(F.col("dielectric.epsilon_electronic_eig"))
    stored = F.col("dielectric.epsilon_electronic_avg")
    return m.select(
        "mp_id",
        calc.alias("el_avg_calc"),
        stored.alias("el_avg_stored"),
        (F.abs(calc - stored) < 1e-6).alias("holds"),
    )


@register(
    "m03_lowest_freq_invariant",
    oracle=f"""
    SELECT mp_id,
           list_min(phonon.frequency) AS min_freq,
           phonon.lowest_freq         AS stored_freq,
           list_min(phonon.frequency) = phonon.lowest_freq AS holds,
           len(phonon.frequency)      AS n_modes,
           3 * nsites                 AS expected_modes
    FROM {_MAT}
    """,
)
def m03_lowest_freq_invariant(spark, sf_dir):
    """A3 / invariants 3+5: lowest_freq == min(frequency), exactly, and
    |frequency| == 3·nsites. array_min is exact — no tolerance needed."""
    m = M.materials(spark)
    return m.select(
        "mp_id",
        F.array_min("phonon.frequency").alias("min_freq"),
        F.col("phonon.lowest_freq").alias("stored_freq"),
        (F.array_min("phonon.frequency") == F.col("phonon.lowest_freq")).alias("holds"),
        F.size("phonon.frequency").alias("n_modes"),
        (3 * F.col("nsites")).alias("expected_modes"),
    )


@register(
    "m04_born_trace_invariant",
    oracle=f"""
    SELECT mp_id,
           ROUND(list_sum(list_transform(born_effective_charge.tensors,
                    t -> abs((t[1][1] + t[2][2] + t[3][3]) / 3.0)))
                 / len(born_effective_charge.tensors), 6) AS avg_abs_trace_calc,
           ROUND(born_effective_charge.avg_abs_trace, 6)  AS avg_abs_trace_stored
    FROM {_MAT}
    """,
)
def m04_born_trace_invariant(spark, sf_dir):
    """A4 / invariant 4: avg_abs_trace == mean over sites of |trace/3|,
    computed entirely in higher-order functions over the 3-level nested
    tensor array — no UDF, so nested pruning + codegen survive."""
    m = M.materials(spark)
    return m.select(
        "mp_id",
        F.round(A.avg_abs_trace3(F.col("born_effective_charge.tensors")), 6).alias(
            "avg_abs_trace_calc"
        ),
        F.round(F.col("born_effective_charge.avg_abs_trace"), 6).alias(
            "avg_abs_trace_stored"
        ),
    )


@register(
    "m05_counting_invariants",
    oracle=f"""
    SELECT mp_id,
           len(elements)                    AS n_elem_calc,
           nelements                        AS n_elem_stored,
           len(structure.sites)             AS n_sites_calc,
           nsites                           AS n_sites_stored,
           len(born_effective_charge.tensors) AS n_tensors
    FROM {_MAT}
    """,
)
def m05_counting_invariants(spark, sf_dir):
    """A5 / invariant 5: stored counts == collection sizes."""
    m = M.materials(spark)
    return m.select(
        "mp_id",
        F.size("elements").alias("n_elem_calc"),
        F.col("nelements").alias("n_elem_stored"),
        F.size("structure.sites").alias("n_sites_calc"),
        F.col("nsites").alias("n_sites_stored"),
        F.size("born_effective_charge.tensors").alias("n_tensors"),
    )


@register(
    "m06_screening",
    oracle=f"""
    SELECT spacegroup.crystal_system AS crystal_system,
           COUNT(*) AS n_materials,
           ROUND(MIN(band_gap), 6) AS min_gap,
           ROUND(MAX(band_gap), 6) AS max_gap,
           CAST(SUM(CASE WHEN is_direct THEN 1 ELSE 0 END) AS BIGINT) AS n_direct
    FROM {_MAT}
    WHERE list_contains(elements, 'O') AND band_gap >= 0.5
    GROUP BY 1
    """,
)
def m06_screening(spark, sf_dir):
    """P5: the corpus screening predicate (oxides, gapped — reference
    README.md:24,50) + a grouped profile by crystal system."""
    m = M.materials(spark)
    return (
        m.filter(F.array_contains("elements", "O") & (F.col("band_gap") >= 0.5))
        .groupBy(F.col("spacegroup.crystal_system").alias("crystal_system"))
        .agg(
            F.count(F.lit(1)).alias("n_materials"),
            F.round(F.min("band_gap"), 6).alias("min_gap"),
            F.round(F.max("band_gap"), 6).alias("max_gap"),
            F.sum(F.when(F.col("is_direct"), 1).otherwise(0)).alias("n_direct"),
        )
    )


@register(
    "m07_join_predictions",
    oracle=f"""
    SELECT m.mp_id,
           ROUND(p.log10_eps, 6) AS pred_log10,
           ROUND(LOG10(m.dielectric.epsilon_electronic_avg), 6) AS actual_log10
    FROM {_MAT} m JOIN {_PRED} p ON m.mp_id = p.mp_id
    WHERE p.model = 'el_comp'
    """,
)
def m07_join_predictions(spark, sf_dir):
    """J1: materials ⋈ golden predictions on mp_id (the reference's
    dict-lookup join, prediction_result_el_comp.json) — broadcast hash
    join: predictions are 1,266 rows."""
    m = M.materials(spark)
    p = M.predictions(spark).filter(F.col("model") == "el_comp")
    return m.join(F.broadcast(p), "mp_id").select(
        "mp_id",
        F.round("log10_eps", 6).alias("pred_log10"),
        F.round(F.log10("dielectric.epsilon_electronic_avg"), 6).alias("actual_log10"),
    )


@register(
    "m08_unscored_anti_join",
    oracle=f"""
    SELECT mp_id, formula FROM {_MAT}
    WHERE mp_id NOT IN (SELECT DISTINCT mp_id FROM {_PRED})
    """,
)
def m08_unscored_anti_join(spark, sf_dir):
    """J2: the 12 materials with no prediction in any model — the
    reference's natural anti-join fixture (SURVEY §1.1), verified to
    return exactly those 12 ids in tests/test_materials.py."""
    m = M.materials(spark)
    p = M.predictions(spark)
    return m.join(F.broadcast(p), "mp_id", "left_anti").select("mp_id", "formula")


@register(
    "m09_parse_formula",
    oracle=f"""
    SELECT mp_id, formula,
           {FM.sql_formula_canonical('formula')} AS parsed,
           len({FM.sql_formula_pairs('formula')}) = nelements AS token_count_ok
    FROM {_MAT}
    """,
)
def m09_parse_formula(spark, sf_dir):
    """F4: Composition('SiO2')-style formula parsing (reference
    main.py:33) as pure regexp expressions; canonical 'El:count' render."""
    m = M.materials(spark)
    return m.select(
        "mp_id",
        "formula",
        FM.formula_canonical("formula").alias("parsed"),
        (F.size(FM.formula_pairs("formula")) == F.col("nelements")).alias(
            "token_count_ok"
        ),
    )


@register("m10_tensor_eigvals", oracle=None)  # needs LAPACK — rows-only + pytest
def m10_tensor_eigvals(spark, sf_dir):
    """F3 / invariant 2: eigenvalues of the dielectric tensors via the
    engine's vectorized tensor_eigvals pandas_udf, compared to the
    stored eigenvalues (max|Δ| per record). Tolerance asserted in
    tests/test_materials.py; here rows-only."""
    m = M.materials(spark)
    calc = A.tensor_eigvals(F.col("dielectric.epsilon_electronic"))
    stored = F.array_sort(F.col("dielectric.epsilon_electronic_eig"))
    diff = F.zip_with(calc, stored, lambda a, b: F.abs(a - b))
    return m.select(
        "mp_id",
        F.array_max(diff).alias("max_eig_diff"),
        (F.array_max(diff) < 1e-4).alias("within_tol"),
    )


@register(
    "m11_site_explode_agg",
    oracle=f"""
    SELECT mp_id,
           COUNT(*)                        AS n_sites,
           ROUND(MAX(z), 6) + 0            AS max_z,
           ROUND(MIN(z), 6) + 0            AS min_z,
           ROUND(AVG(z), 6) + 0            AS mean_z,
           ROUND(STDDEV_POP(z), 6) + 0     AS std_z
    FROM (
        SELECT mp_id, unnest(structure.sites).xyz[3] AS z FROM {_MAT}
    )
    GROUP BY mp_id
    """,
)
def m11_site_explode_agg(spark, sf_dir):
    """A1: the reference's explode-sites→aggregate pattern
    (ml_prediction.py:44,50-51 builds a per-site feature matrix, then
    reduces with np.max/min/mean/std). posexplode → groupBy(mp_id) with
    STDDEV_POP (np.std is ddof=0 — SURVEY §2.11 numeric-parity warning)."""
    m = M.materials(spark)
    sites = m.select(
        "mp_id", F.explode("structure.sites").alias("site")
    ).select("mp_id", F.element_at("site.xyz", 3).alias("z"))
    return sites.groupBy("mp_id").agg(
        F.count(F.lit(1)).alias("n_sites"),
        r6(F.max("z"), "max_z"),
        r6(F.min("z"), "min_z"),
        r6(F.avg("z"), "mean_z"),
        r6(F.stddev_pop("z"), "std_z"),
    )


@register(
    "m12_en_ordered_formula",
    oracle=f"""
    SELECT mp_id, formula,
           array_to_string(list_transform(list_sort(list_transform(elements,
             e -> struct_pack(k := CAST((CASE e WHEN 'Ag' THEN 1.93 WHEN 'Al' THEN 1.61 WHEN 'As' THEN 2.18 WHEN 'Au' THEN 2.54 WHEN 'B' THEN 2.04 WHEN 'Ba' THEN 0.89 WHEN 'Be' THEN 1.57 WHEN 'Bi' THEN 2.02 WHEN 'Br' THEN 2.96 WHEN 'C' THEN 2.55 WHEN 'Ca' THEN 1.0 WHEN 'Cd' THEN 1.69 WHEN 'Ce' THEN 1.12 WHEN 'Cl' THEN 3.16 WHEN 'Co' THEN 1.88 WHEN 'Cr' THEN 1.66 WHEN 'Cs' THEN 0.79 WHEN 'Cu' THEN 1.9 WHEN 'Dy' THEN 1.22 WHEN 'Er' THEN 1.24 WHEN 'Eu' THEN 1.2 WHEN 'F' THEN 3.98 WHEN 'Fe' THEN 1.83 WHEN 'Ga' THEN 1.81 WHEN 'Gd' THEN 1.2 WHEN 'Ge' THEN 2.01 WHEN 'H' THEN 2.2 WHEN 'Hf' THEN 1.3 WHEN 'Hg' THEN 2.0 WHEN 'Ho' THEN 1.23 WHEN 'I' THEN 2.66 WHEN 'In' THEN 1.78 WHEN 'Ir' THEN 2.2 WHEN 'K' THEN 0.82 WHEN 'La' THEN 1.1 WHEN 'Li' THEN 0.98 WHEN 'Lu' THEN 1.27 WHEN 'Mg' THEN 1.31 WHEN 'Mn' THEN 1.55 WHEN 'Mo' THEN 2.16 WHEN 'N' THEN 3.04 WHEN 'Na' THEN 0.93 WHEN 'Nb' THEN 1.6 WHEN 'Nd' THEN 1.14 WHEN 'Ni' THEN 1.91 WHEN 'O' THEN 3.44 WHEN 'Os' THEN 2.2 WHEN 'P' THEN 2.19 WHEN 'Pb' THEN 2.33 WHEN 'Pd' THEN 2.2 WHEN 'Pr' THEN 1.13 WHEN 'Pt' THEN 2.28 WHEN 'Rb' THEN 0.82 WHEN 'Re' THEN 1.9 WHEN 'Rh' THEN 2.28 WHEN 'Ru' THEN 2.2 WHEN 'S' THEN 2.58 WHEN 'Sb' THEN 2.05 WHEN 'Sc' THEN 1.36 WHEN 'Se' THEN 2.55 WHEN 'Si' THEN 1.9 WHEN 'Sm' THEN 1.17 WHEN 'Sn' THEN 1.96 WHEN 'Sr' THEN 0.95 WHEN 'Ta' THEN 1.5 WHEN 'Tb' THEN 1.1 WHEN 'Tc' THEN 1.9 WHEN 'Te' THEN 2.1 WHEN 'Th' THEN 1.3 WHEN 'Ti' THEN 1.54 WHEN 'Tl' THEN 1.62 WHEN 'Tm' THEN 1.25 WHEN 'U' THEN 1.38 WHEN 'V' THEN 1.63 WHEN 'W' THEN 2.36 WHEN 'Y' THEN 1.22 WHEN 'Yb' THEN 1.1 WHEN 'Zn' THEN 1.65 WHEN 'Zr' THEN 1.33 ELSE NULL END) AS DOUBLE), e := e))), s -> s.e), '-') AS en_ordered_elements
    FROM {_MAT}
""",
)
def m12_en_ordered_formula(spark, sf_dir):
    """O1: elements ordered by Pauling electronegativity (the reference's
    formula convention, README.md:18) via a literal EN map — the
    broadcast-lookup pattern every composition featurizer uses (§2.9)."""
    m = M.materials(spark)
    return m.select(
        "mp_id",
        "formula",
        FM.en_ordered_formula("elements").alias("en_ordered_elements"),
    )


_TWO_PI_3 = 2.0943951023931953  # float64(2π/3); same literal in the SQL twin


@register(
    "m34_eigvals_closed_form",
    oracle=f"""
    WITH a AS (
      SELECT mp_id,
             dielectric.epsilon_electronic[1][1] AS a11,
             dielectric.epsilon_electronic[2][2] AS a22,
             dielectric.epsilon_electronic[3][3] AS a33,
             (dielectric.epsilon_electronic[1][2]
              + dielectric.epsilon_electronic[2][1]) / 2 AS a12,
             (dielectric.epsilon_electronic[1][3]
              + dielectric.epsilon_electronic[3][1]) / 2 AS a13,
             (dielectric.epsilon_electronic[2][3]
              + dielectric.epsilon_electronic[3][2]) / 2 AS a23
      FROM {_MAT}
    ),
    s1 AS (SELECT *, (a11 + a22 + a33) / 3 AS q,
                     a12 * a12 + a13 * a13 + a23 * a23 AS p1 FROM a),
    s2 AS (SELECT *, (a11 - q) * (a11 - q) + (a22 - q) * (a22 - q)
                     + (a33 - q) * (a33 - q) + 2 * p1 AS p2 FROM s1),
    s3 AS (SELECT *, sqrt(p2 / 6) AS p FROM s2),
    s4 AS (SELECT *, (a11 - q) / p AS b11, (a22 - q) / p AS b22,
                     (a33 - q) / p AS b33, a12 / p AS b12,
                     a13 / p AS b13, a23 / p AS b23 FROM s3),
    s5 AS (SELECT *, (b11 * (b22 * b33 - b23 * b23)
                      - b12 * (b12 * b33 - b23 * b13)
                      + b13 * (b12 * b23 - b22 * b13)) / 2 AS det_r FROM s4),
    s6 AS (SELECT *, acos(greatest(-1.0, least(1.0, det_r))) / 3 AS phi FROM s5),
    s7 AS (SELECT *, q + 2 * p * cos(phi) AS emax,
                     q + 2 * p * cos(phi + {_TWO_PI_3}) AS emin FROM s6)
    SELECT mp_id,
           ROUND(CASE WHEN p2 = 0 THEN q ELSE emin END, 6) + 0 AS eig_min,
           ROUND(CASE WHEN p2 = 0 THEN q ELSE 3 * q - emax - emin END, 6) + 0 AS eig_mid,
           ROUND(CASE WHEN p2 = 0 THEN q ELSE emax END, 6) + 0 AS eig_max
    FROM s7
    """,
)
def m34_eigvals_closed_form(spark, sf_dir):
    """F3's zero-UDF scale path: eigenvalues of the symmetric 3×3
    dielectric tensor via the closed-form trigonometric cubic (Smith's
    method) as pure Catalyst expressions — no Arrow crossing, full
    whole-stage codegen, and (unlike the LAPACK pandas_udf in m10)
    exactly mirrorable in SQL, so eigendecomposition itself sits under
    the cross-engine value hash. tests/test_materials.py asserts the
    closed form agrees with numpy's eigvalsh to 1e-6 corpus-wide.

    Both engines evaluate the IDENTICAL expression tree (same
    association order, same 2π/3 float64 literal, same clamp), so the
    only FP divergence is libm acos/cos ULP noise — orders of
    magnitude below the 1e-6 rounding step."""
    m = M.materials(spark)
    t = F.col("dielectric.epsilon_electronic")
    e = lambda i, j: F.element_at(F.element_at(t, i), j)  # noqa: E731
    # symmetrize (A+Aᵀ)/2 first: the stored DFPT tensors carry up to
    # ~1.5e-2 of numerical asymmetry, and eigvalsh silently reads one
    # triangle — the principled convention both engines share is the
    # symmetric projection (verified: closed form vs LAPACK agree to
    # 3.5e-8 corpus-wide after symmetrizing, 1.4e-2 before)
    a = m.select(
        "mp_id",
        e(1, 1).alias("a11"), e(2, 2).alias("a22"), e(3, 3).alias("a33"),
        ((e(1, 2) + e(2, 1)) / 2).alias("a12"),
        ((e(1, 3) + e(3, 1)) / 2).alias("a13"),
        ((e(2, 3) + e(3, 2)) / 2).alias("a23"),
    )
    c = F.col
    s = a.withColumn("q", (c("a11") + c("a22") + c("a33")) / 3).withColumn(
        "p1", c("a12") * c("a12") + c("a13") * c("a13") + c("a23") * c("a23")
    )
    s = s.withColumn(
        "p2",
        (c("a11") - c("q")) * (c("a11") - c("q"))
        + (c("a22") - c("q")) * (c("a22") - c("q"))
        + (c("a33") - c("q")) * (c("a33") - c("q"))
        + 2 * c("p1"),
    )
    s = s.withColumn("p", F.sqrt(c("p2") / 6))
    # ANSI-safe divisor: for a scalar matrix p = 0, and although the
    # final select masks those rows behind the `deg` CASE, these b
    # columns are eager projections — under ansi.enabled=true the 0/0
    # raises DIVIDE_BY_ZERO before the CASE can skip it (found by the
    # SPARK_GRAFT_ANSI=true full sweep). Dividing by 1 instead makes
    # every numerator 0 for deg rows (a_ij − q = 0 and a12 = a13 =
    # a23 = 0 exactly when p2 = 0), so b = 0, det_r = 0, and
    # emin/emax = q + 2·0·cos(·) = q — identical values either way.
    psafe = F.when(c("p") == 0, F.lit(1.0)).otherwise(c("p"))
    s = (
        s.withColumn("b11", (c("a11") - c("q")) / psafe)
        .withColumn("b22", (c("a22") - c("q")) / psafe)
        .withColumn("b33", (c("a33") - c("q")) / psafe)
        .withColumn("b12", c("a12") / psafe)
        .withColumn("b13", c("a13") / psafe)
        .withColumn("b23", c("a23") / psafe)
    )
    s = s.withColumn(
        "det_r",
        (
            c("b11") * (c("b22") * c("b33") - c("b23") * c("b23"))
            - c("b12") * (c("b12") * c("b33") - c("b23") * c("b13"))
            + c("b13") * (c("b12") * c("b23") - c("b22") * c("b13"))
        )
        / 2,
    )
    s = s.withColumn(
        "phi", F.acos(F.greatest(F.lit(-1.0), F.least(F.lit(1.0), c("det_r")))) / 3
    )
    s = s.withColumn("emax", c("q") + 2 * c("p") * F.cos(c("phi"))).withColumn(
        "emin", c("q") + 2 * c("p") * F.cos(c("phi") + F.lit(_TWO_PI_3))
    )
    deg = c("p2") == 0  # scalar matrix → triple eigenvalue q
    return s.select(
        "mp_id",
        r6(F.when(deg, c("q")).otherwise(c("emin")), "eig_min"),
        r6(F.when(deg, c("q")).otherwise(3 * c("q") - c("emax") - c("emin")), "eig_mid"),
        r6(F.when(deg, c("q")).otherwise(c("emax")), "eig_max"),
    )


def _m36_oracle() -> str:
    pairs = FM.sql_formula_pairs("formula")
    return f"""
    WITH base AS (
      SELECT mp_id, {pairs} AS pairs FROM {_MAT}
    ),
    dedup AS (
      SELECT mp_id,
             list_transform(
               list_sort(list_distinct(list_transform(pairs, p -> p.el))),
               e -> struct_pack(
                 el := e,
                 cnt := list_aggregate(
                   list_transform(list_filter(pairs, p -> p.el = e), p -> p.cnt),
                   'sum')
               )
             ) AS elems
      FROM base
    ),
    tot AS (
      SELECT mp_id, elems,
             list_aggregate(list_transform(elems, x -> x.cnt), 'sum') AS total
      FROM dedup
    )
    SELECT mp_id,
           CAST(len(elems) AS INT) AS n_elements,
           ROUND(total, 6) AS total_atoms,
           array_to_string(
             list_transform(
               list_filter(
                 list_transform(elems,
                   x -> struct_pack(el := x.el, frac := ROUND(x.cnt / total, 6))),
                 x -> x.frac >= 0.2),
               x -> x.el || ':' || CAST(x.frac AS VARCHAR)),
             ',') AS majors
    FROM tot
    """


@register("m36_map_functions", oracle=_m36_oracle())
def m36_map_functions(spark, sf_dir):
    """The MAP higher-order-function surface (F7's depth tier) over
    parse_formula's map<string,double>: map_values + aggregate for
    the atom total, transform_values to normalize counts into
    fractions, map_filter to keep major elements (≥ 20%), and a
    canonical sorted-entry render via map_entries — all pure Catalyst
    map expressions, zero UDFs. The DuckDB twin computes identical
    values from the pair-list representation (its map type lacks
    these lambdas), which is the point: the GATE checks semantics,
    the Spark side exercises the map-native operator set a 100 TB
    metadata column (headers, tags, feature maps) needs."""
    m = M.materials(spark)
    fmap = FM.parse_formula("formula")
    base = m.select("mp_id", fmap.alias("fmap"))
    total = F.aggregate(
        F.map_values("fmap"), F.lit(0.0), lambda a, x: a + x
    )
    withtot = base.withColumn("total", total)
    fracs = F.transform_values(
        "fmap", lambda _k, v: F.round(v / F.col("total"), 6)
    )
    majors = F.map_filter(fracs, lambda _k, v: v >= 0.2)
    major_str = F.array_join(
        F.array_sort(
            F.transform(
                F.map_entries(majors),
                lambda e: F.concat(
                    e["key"], F.lit(":"), e["value"].cast("string")
                ),
            )
        ),
        ",",
    )
    return withtot.select(
        "mp_id",
        F.size("fmap").alias("n_elements"),
        F.round("total", 6).alias("total_atoms"),
        major_str.alias("majors"),
    )
