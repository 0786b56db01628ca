"""AtomicOrbitals featurizer (SURVEY.md §2.9; reference
ml_prediction.py:81,125,183,223 — the HOMO/LUMO/gap_AO slots of the
el_comp / ion_comp / el_comp_st descriptor sets).

Semantics follow the public matminer AtomicOrbitals featurizer, which
delegates to pymatgen's ``MolecularOrbitals``: pool every atom's atomic
subshells (label, LDA orbital energy) into one list sorted by energy,
aufbau-fill it with the formula unit's total electron count; the last
subshell to receive electrons is the HOMO, the next subshell in energy
order is the LUMO (HOMO == LUMO when the last subshell is only
partially filled), and ``gap_AO = E_LUMO − E_HOMO``.

Data model here:

* ``FRONTIER_ORBITALS`` lists, per element, the valence-region occupied
  subshells of the neutral atom with their orbital energies (Hartree).
  The energies are the public NIST-LDA neutral-atom eigenvalues (the
  same dataset pymatgen ships in ``periodic_table.json``), transcribed
  to limited precision — HOMO/LUMO selection depends only on the energy
  ORDERING near the frontier, which these values preserve. Where
  pymatgen is available the table can be regenerated exactly.
* Deeper (core) subshells are collapsed into ONE always-filled pseudo
  level per element, at a synthetic energy far below every listed
  subshell (−1000 − Z, unique per element for deterministic ordering).
  This is exact, not an approximation: core levels lie far below every
  frontier level in the real data, so they are always completely filled
  before the crossing point and can never be the HOMO or LUMO (a pytest
  asserts this over the whole corpus).

The Spark realization is the idiomatic distributed shape: explode the
composition, broadcast-join the tiny (element, subshell) dim table, one
per-material window for the running capacity sum + LEAD — no UDF, no
driver loop. The DuckDB twin mirrors the same algorithm from the same
Python constants, so the feature is value-hash-checked cross-engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from oxi_diel_db_spark.functions.formula import formula_pairs, sql_formula_pairs

# Atomic numbers (exact, public) for the corpus's elements.
ATOMIC_NUMBER = {
    "Li": 3, "Be": 4, "B": 5, "O": 8, "Na": 11, "Mg": 12, "Al": 13,
    "Si": 14, "K": 19, "Ca": 20, "Sc": 21, "Ti": 22, "V": 23, "Cr": 24,
    "Mn": 25, "Co": 27, "Ni": 28, "Cu": 29, "Zn": 30, "Ga": 31,
    "Ge": 32, "As": 33, "Rb": 37, "Sr": 38, "Y": 39, "Zr": 40,
    "Nb": 41, "Mo": 42, "Tc": 43, "Rh": 45, "Pd": 46, "Ag": 47,
    "Cd": 48, "In": 49, "Sn": 50, "Sb": 51, "Cs": 55, "Ba": 56,
    "La": 57, "Hf": 72, "Ta": 73, "W": 74, "Re": 75, "Os": 76,
    "Pt": 78, "Au": 79, "Hg": 80, "Tl": 81, "Pb": 82, "Bi": 83,
    "Th": 90,
}

# Per element: (core_electron_count, [(subshell, energy_Ha), ...]).
# Listed subshells are the ground-state-occupied valence region
# (energies ≳ −1 Ha); everything deeper is in the collapsed core count.
# Invariant (pytest-checked): core + ground occupancy of the listed
# subshells == Z, and listed capacities can absorb Z − core electrons.
FRONTIER_ORBITALS: dict[str, tuple[int, list[tuple[str, float]]]] = {
    "Li": (2, [("2s", -0.105624)]),
    "Be": (2, [("2s", -0.205744)]),
    "B":  (2, [("2s", -0.344701), ("2p", -0.136603)]),
    "O":  (2, [("2s", -0.871362), ("2p", -0.338381)]),
    "Na": (10, [("3s", -0.103415)]),
    "Mg": (10, [("3s", -0.175427)]),
    "Al": (10, [("3s", -0.286883), ("3p", -0.102545)]),
    "Si": (10, [("3s", -0.398139), ("3p", -0.153293)]),
    "K":  (18, [("4s", -0.088815)]),
    "Ca": (18, [("4s", -0.141411)]),
    "Sc": (18, [("3d", -0.131080), ("4s", -0.156478)]),
    "Ti": (18, [("3d", -0.170869), ("4s", -0.167106)]),
    "V":  (18, [("3d", -0.204634), ("4s", -0.175968)]),
    "Cr": (18, [("3d", -0.118123), ("4s", -0.150445)]),
    "Mn": (18, [("3d", -0.266540), ("4s", -0.191136)]),
    "Co": (18, [("3d", -0.322368), ("4s", -0.204497)]),
    "Ni": (18, [("3d", -0.348699), ("4s", -0.210764)]),
    "Cu": (18, [("3d", -0.202272), ("4s", -0.172056)]),
    "Zn": (18, [("3d", -0.398944), ("4s", -0.222725)]),
    "Ga": (18, [("3d", -0.736204), ("4s", -0.328019), ("4p", -0.101634)]),
    "Ge": (28, [("4s", -0.426523), ("4p", -0.149882)]),
    "As": (28, [("4s", -0.523670), ("4p", -0.197497)]),
    "Rb": (36, [("5s", -0.085375)]),
    "Sr": (36, [("5s", -0.131793)]),
    "Y":  (36, [("4d", -0.108691), ("5s", -0.150723)]),
    "Zr": (36, [("4d", -0.150673), ("5s", -0.163093)]),
    "Nb": (36, [("4d", -0.125252), ("5s", -0.144272)]),
    "Mo": (36, [("4d", -0.153347), ("5s", -0.149788)]),
    "Tc": (36, [("4d", -0.217436), ("5s", -0.183636)]),
    "Rh": (36, [("4d", -0.239422), ("5s", -0.154624)]),
    "Pd": (36, [("4d", -0.160771)]),
    "Ag": (36, [("4d", -0.298706), ("5s", -0.157407)]),
    "Cd": (36, [("4d", -0.407604), ("5s", -0.204228)]),
    "In": (36, [("4d", -0.940717), ("5s", -0.290497), ("5p", -0.101782)]),
    "Sn": (46, [("5s", -0.369349), ("5p", -0.144450)]),
    "Sb": (46, [("5s", -0.445605), ("5p", -0.185623)]),
    "Cs": (54, [("6s", -0.078699)]),
    "Ba": (54, [("6s", -0.118967)]),
    "La": (54, [("5d", -0.141085), ("6s", -0.132233)]),
    "Hf": (54, [("4f", -0.703000), ("5d", -0.143805), ("6s", -0.166465)]),
    "Ta": (54, [("4f", -0.859000), ("5d", -0.174814), ("6s", -0.182464)]),
    "W":  (68, [("5d", -0.192613), ("6s", -0.188189)]),
    "Re": (68, [("5d", -0.208538), ("6s", -0.193331)]),
    "Os": (68, [("5d", -0.222154), ("6s", -0.197707)]),
    "Pt": (68, [("5d", -0.273634), ("6s", -0.161308)]),
    "Au": (68, [("5d", -0.304738), ("6s", -0.162334)]),
    "Hg": (68, [("5d", -0.452552), ("6s", -0.205137)]),
    "Tl": (68, [("5d", -0.812000), ("6s", -0.285020), ("6p", -0.101507)]),
    "Pb": (78, [("6s", -0.357187), ("6p", -0.141831)]),
    "Bi": (78, [("6s", -0.426129), ("6p", -0.180198)]),
    "Th": (86, [("6d", -0.101000), ("7s", -0.131905)]),
}

SUBSHELL_CAPACITY = {"s": 2, "p": 6, "d": 10, "f": 14}

# The core pseudo-subshell sorts before every real label ("0core" < "1s")
# and its synthetic energy (−1000 − Z) is below every real energy.
CORE_LABEL = "0core"


def _core_energy(z: int) -> float:
    return -1000.0 - z


def orbital_rows() -> list[tuple[str, str, float, int]]:
    """(el, orb, energy, capacity) rows for the dim table, core included."""
    rows: list[tuple[str, str, float, int]] = []
    for el, (core, shells) in sorted(FRONTIER_ORBITALS.items()):
        z = ATOMIC_NUMBER[el]
        rows.append((el, CORE_LABEL, _core_energy(z), core))
        for orb, energy in shells:
            rows.append((el, orb, energy, SUBSHELL_CAPACITY[orb[-1]]))
    return rows


def sp_atomic_orbitals(agg: str) -> dict[str, str]:
    """Zero-shuffle Spark-SQL expression twin of
    atomic_orbitals_features, computed per-row over a pre-staged
    aggregated (el, cnt) array column (``_agg``/``_enr``) — no explode,
    no window, no joins. Used by the ml6/ml8/ml10/ml12 descriptor
    assemblies (r7 verdict ask #4: the AO window pipeline was 3.1 s of
    the 6 s cold cost, all scheduling overhead at corpus size; at 100 TB
    the per-row expression is also the better plan — the orbital dim is
    a constant, so nothing shuffles at all).

    Value parity with the window form (m29's gate keeps that shape
    honest): the row set is the same inner-join semantics (elements
    absent from the orbital table are filtered), the sort key is the
    same (energy, el, orb) total order, and the running-capacity scan
    folds cap_total in that same order, so HOMO selection and the
    exact-fill LUMO tier see identical doubles.

    Returns staging exprs (``_aosort``, ``_tote``, ``_aoscan`` — stage
    each in its own select so the scan isn't inlined per consumer) and
    the final ``homo_energy``/``lumo_energy``/``gap_ao`` exprs over
    them."""
    orb_entries = []
    for el, (core, shells) in sorted(FRONTIER_ORBITALS.items()):
        z = ATOMIC_NUMBER[el]
        rows = [
            f"named_struct('orb', '{CORE_LABEL}', 'energy', "
            f"{_core_energy(z)!r}D, 'cap', {core})"
        ]
        for orb, energy in shells:
            rows.append(
                f"named_struct('orb', '{orb}', 'energy', {float(energy)!r}D, "
                f"'cap', {SUBSHELL_CAPACITY[orb[-1]]})"
            )
        orb_entries.append(f"'{el}', array({', '.join(rows)})")
    orb_map = f"map({', '.join(orb_entries)})"
    z_map = (
        "map("
        + ", ".join(f"'{el}', {z}" for el, z in sorted(ATOMIC_NUMBER.items()))
        + ")"
    )
    present = f"filter({agg}, s -> {orb_map}[s.el] IS NOT NULL)"
    rows = (
        f"flatten(transform({present}, s -> transform({orb_map}[s.el], "
        f"o -> named_struct('energy', o.energy, 'el', s.el, 'orb', o.orb, "
        f"'cap_total', s.cnt * o.cap))))"
    )
    aosort = f"sort_array({rows})"
    # coalesce: the window form's SUM(cnt * z_map[el]) silently SKIPS
    # elements missing from the table (SQL SUM ignores NULLs) — the
    # fold must match that semantics, not NULL-poison the total (the
    # corpus never hits this; the randomized cross-form parity test in
    # tests/test_sp_kernels.py does)
    tote = (
        f"aggregate({agg}, 0.0D, "
        f"(acc, s) -> acc + coalesce(s.cnt * {z_map}[s.el], 0.0D))"
    )
    # running-capacity scan: homo = 1-based index of the first row where
    # the cumulative capacity reaches _tote (same predicate as the
    # window form's cum−cap_total < total_e AND cum >= total_e);
    # homocum = cum at that row (for the exact-fill test).
    scan = (
        "aggregate(_aosort, "
        "named_struct('cum', 0.0D, 'idx', 0, 'homo', -1, 'homocum', 0.0D), "
        "(acc, r) -> named_struct("
        "'cum', acc.cum + r.cap_total, "
        "'idx', acc.idx + 1, "
        "'homo', IF(acc.homo >= 0, acc.homo, "
        "IF(acc.cum + r.cap_total >= _tote AND acc.cum < _tote, acc.idx + 1, -1)), "
        "'homocum', IF(acc.homo >= 0, acc.homocum, "
        "IF(acc.cum + r.cap_total >= _tote AND acc.cum < _tote, "
        "acc.cum + r.cap_total, 0.0D))))"
    )
    hr = "element_at(_aosort, _aoscan.homo)"
    lead_e = (
        "IF(_aoscan.homo < size(_aosort), "
        "element_at(_aosort, _aoscan.homo + 1).energy, CAST(NULL AS DOUBLE))"
    )
    lumo_raw = f"IF(_aoscan.homocum = _tote, {lead_e}, {hr}.energy)"
    guard = "IF(_aoscan.homo >= 1, {x}, CAST(NULL AS DOUBLE))"
    return {
        "_aosort": aosort,
        "_tote": tote,
        "_aoscan": scan,
        "homo_energy": guard.format(x=f"round({hr}.energy, 6)"),
        "lumo_energy": guard.format(x=f"round({lumo_raw}, 6)"),
        "gap_ao": guard.format(x=f"round(({lumo_raw}) - {hr}.energy, 6)"),
    }


def atomic_orbitals_features(materials: DataFrame, spark: SparkSession) -> DataFrame:
    """HOMO/LUMO/gap_AO per material: explode composition → broadcast
    orbital dim join → per-material running-capacity window. Partitioned
    by material, so the shuffle key is the natural one and the window
    never sees more than (#elements × #subshells) ≈ tens of rows."""
    dim = spark.createDataFrame(
        orbital_rows(), "el string, orb string, energy double, cap int"
    )
    z_map = F.create_map(
        *[x for el, z in sorted(ATOMIC_NUMBER.items()) for x in (F.lit(el), F.lit(z))]
    )

    toks = (
        materials.select(
            "mp_id", "formula", F.explode(formula_pairs("formula")).alias("s")
        )
        .groupBy("mp_id", "formula", F.col("s.el").alias("el"))
        .agg(F.sum("s.cnt").alias("cnt"))
    )
    tot = toks.groupBy("mp_id").agg(
        F.sum(F.col("cnt") * z_map[F.col("el")]).alias("total_e")
    )
    rows = toks.join(F.broadcast(dim), "el").select(
        "mp_id",
        "formula",
        "el",
        "orb",
        "energy",
        (F.col("cnt") * F.col("cap")).alias("cap_total"),
    )
    w = W.partitionBy("mp_id").orderBy("energy", "el", "orb")
    win = rows.select(
        "*",
        F.sum("cap_total").over(w.rowsBetween(W.unboundedPreceding, 0)).alias("cum"),
        F.lead("el").over(w).alias("lead_el"),
        F.lead("orb").over(w).alias("lead_orb"),
        F.lead("energy").over(w).alias("lead_energy"),
    ).join(tot, "mp_id")
    homo = win.filter(
        (F.col("cum") - F.col("cap_total") < F.col("total_e"))
        & (F.col("cum") >= F.col("total_e"))
    )
    exact = F.col("cum") == F.col("total_e")
    return homo.select(
        "mp_id",
        "formula",
        F.col("el").alias("homo_el"),
        F.col("orb").alias("homo_orb"),
        F.round("energy", 6).alias("homo_energy"),
        F.when(exact, F.col("lead_el")).otherwise(F.col("el")).alias("lumo_el"),
        F.when(exact, F.col("lead_orb")).otherwise(F.col("orb")).alias("lumo_orb"),
        F.round(
            F.when(exact, F.col("lead_energy")).otherwise(F.col("energy")), 6
        ).alias("lumo_energy"),
        F.round(
            F.when(exact, F.col("lead_energy")).otherwise(F.col("energy"))
            - F.col("energy"),
            6,
        ).alias("gap_ao"),
    )


def sql_atomic_orbitals(materials_rel: str) -> str:
    """DuckDB twin of atomic_orbitals_features, generated from the SAME
    Python constants (dim table inlined as VALUES)."""
    dim_vals = ", ".join(
        f"('{el}', '{orb}', {energy!r}, {cap})"
        for el, orb, energy, cap in orbital_rows()
    )
    z_vals = ", ".join(f"('{el}', {z})" for el, z in sorted(ATOMIC_NUMBER.items()))
    toks = sql_formula_pairs("formula")
    return f"""
    WITH dim AS (
      SELECT el, orb, CAST(energy AS DOUBLE) AS energy, cap
      FROM (VALUES {dim_vals}) v(el, orb, energy, cap)
    ),
    zt AS (SELECT * FROM (VALUES {z_vals}) v(el, z)),
    tk AS (
      SELECT mp_id, formula, s.el AS el, SUM(s.cnt) AS cnt
      FROM (SELECT mp_id, formula, UNNEST({toks}) AS s FROM {materials_rel})
      GROUP BY mp_id, formula, s.el
    ),
    tot AS (
      SELECT tk.mp_id, SUM(tk.cnt * zt.z) AS total_e
      FROM tk JOIN zt ON tk.el = zt.el GROUP BY tk.mp_id
    ),
    rows_ AS (
      SELECT tk.mp_id, tk.formula, dim.el, dim.orb, dim.energy,
             tk.cnt * dim.cap AS cap_total
      FROM tk JOIN dim ON tk.el = dim.el
    ),
    win AS (
      SELECT *,
             SUM(cap_total) OVER w AS cum,
             LEAD(el) OVER w AS lead_el,
             LEAD(orb) OVER w AS lead_orb,
             LEAD(energy) OVER w AS lead_energy
      FROM rows_
      WINDOW w AS (PARTITION BY mp_id ORDER BY energy, el, orb
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT win.mp_id, win.formula,
           win.el AS homo_el, win.orb AS homo_orb,
           ROUND(win.energy, 6) + 0 AS homo_energy,
           CASE WHEN win.cum = tot.total_e THEN win.lead_el ELSE win.el END AS lumo_el,
           CASE WHEN win.cum = tot.total_e THEN win.lead_orb ELSE win.orb END AS lumo_orb,
           ROUND(CASE WHEN win.cum = tot.total_e THEN win.lead_energy
                      ELSE win.energy END, 6) + 0 AS lumo_energy,
           ROUND(CASE WHEN win.cum = tot.total_e THEN win.lead_energy
                      ELSE win.energy END - win.energy, 6) + 0 AS gap_ao
    FROM win JOIN tot ON win.mp_id = tot.mp_id
    WHERE win.cum - win.cap_total < tot.total_e AND win.cum >= tot.total_e
    """
