"""AtomicOrbitals featurizer (§2.9): data-model invariants + a
hand-computed aufbau case + the corpus-wide core-collapse soundness
claim (the collapsed core pseudo-level must never surface as HOMO or
LUMO — that is what makes the collapse exact, not approximate)."""

from __future__ import annotations

from oxi_diel_db_spark.functions import atomic_orbitals as AO


def test_table_invariants():
    for el, (core, shells) in AO.FRONTIER_ORBITALS.items():
        z = AO.ATOMIC_NUMBER[el]
        caps = sum(AO.SUBSHELL_CAPACITY[orb[-1]] for orb, _ in shells)
        # valence electrons exist and fit in the listed subshells
        assert core < z <= core + caps, el
        # energies strictly increasing after sort, all above the core level
        es = [e for _, e in shells]
        assert all(e > AO._core_energy(z) for e in es), el
        assert len(set(es)) == len(es), f"{el}: degenerate subshell energies"


def test_srtio3_hand_computed(spark):
    # SrTiO3: 84 electrons; cores absorb 60; valence fill order
    # O2s(6) -> O2p(18) lands exactly at 84 => HOMO = O 2p, LUMO = Ti 3d.
    m = spark.createDataFrame([("x-1", "SrTiO3")], "mp_id string, formula string")
    row = AO.atomic_orbitals_features(m, spark).collect()[0]
    assert (row["homo_el"], row["homo_orb"]) == ("O", "2p")
    assert (row["lumo_el"], row["lumo_orb"]) == ("Ti", "3d")
    assert abs(row["gap_ao"] - (-0.170869 - -0.338381)) < 1e-6


def test_partial_fill_homo_equals_lumo(spark):
    # Ti2O3: 2*22+3*8 = 68 e; cores 42; O2s 6 -> 48; O2p 18 -> 66;
    # Ti 3d (cap 20) partially fills with the last 2 => HOMO == LUMO == Ti 3d.
    m = spark.createDataFrame([("x-2", "Ti2O3")], "mp_id string, formula string")
    row = AO.atomic_orbitals_features(m, spark).collect()[0]
    assert (row["homo_el"], row["homo_orb"]) == ("Ti", "3d")
    assert (row["lumo_el"], row["lumo_orb"]) == ("Ti", "3d")
    assert row["gap_ao"] == 0.0


def test_core_never_band_edge_on_corpus(spark):
    from oxi_diel_db_spark.sources import materials as M

    feats = AO.atomic_orbitals_features(M.materials(spark), spark)
    assert feats.count() == 1278
    bad = feats.filter(
        (feats.homo_orb == AO.CORE_LABEL) | (feats.lumo_orb == AO.CORE_LABEL)
    )
    assert bad.count() == 0
