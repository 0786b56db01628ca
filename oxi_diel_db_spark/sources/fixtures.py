"""Synthetic materials fixture generator (FIXTURES.md §A1-A2).

Generates an arbitrary-N corpus with the reference's exact nested
schema where all six derived-field invariants hold BY CONSTRUCTION —
the test bed for ingest/derive operators independent of the 1,278-row
real corpus (and the shape a 100 TB load test would scale up).

Generation is driver-side numpy (seeded) → Arrow → DataFrame for the
sizes tests use; the distributed path for huge N is the same row
builder inside mapInPandas over a range() frame.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, SparkSession

from oxi_diel_db_spark.sources.materials import MATERIALS_SCHEMA

_ELEMENTS = [
    "Li", "Be", "B", "Na", "Mg", "Al", "Si", "K", "Ca", "Sc", "Ti", "V",
    "Cr", "Mn", "Fe", "Co", "Ni", "Cu", "Zn", "Ga", "Ge", "Sr", "Y",
    "Zr", "Nb", "Mo", "Sn", "Ba", "La", "Hf", "Ta", "W",
]
_CRYSTAL = [
    ("triclinic", 95), ("monoclinic", 382), ("orthorhombic", 302),
    ("tetragonal", 162), ("trigonal", 184), ("hexagonal", 66), ("cubic", 87),
]


def _sym3(rng: np.random.RandomState, lo: float, hi: float) -> np.ndarray:
    a = rng.uniform(-1, 1, (3, 3))
    m = (a + a.T) / 2 + np.eye(3) * rng.uniform(lo, hi)
    return m


def generate_materials(spark: SparkSession, n: int = 200, seed: int = 42) -> DataFrame:
    rng = np.random.RandomState(seed)
    crystal_names = [c for c, _ in _CRYSTAL]
    crystal_p = np.array([w for _, w in _CRYSTAL], dtype=float)
    crystal_p /= crystal_p.sum()

    rows = []
    for i in range(n):
        mp_id = f"{'mvc' if rng.rand() < 0.01 else 'mp'}-{900000 + i}"
        nelements = int(rng.choice([2, 3, 4, 5], p=[0.05, 0.55, 0.35, 0.05]))
        els = list(
            rng.choice(_ELEMENTS, size=nelements - 1, replace=False)
        ) + ["O"]
        nsites = int(rng.randint(2, 24))
        lat = np.diag(rng.uniform(4, 12, 3)) + rng.uniform(-0.3, 0.3, (3, 3))
        volume = float(abs(np.linalg.det(lat)))
        abc_len = np.linalg.norm(lat, axis=1)

        site_els = [els[rng.randint(0, len(els))] for _ in range(nsites)]
        frac = rng.rand(nsites, 3)
        cart = frac @ lat
        sites = [
            {
                "species": [{"element": site_els[j], "occu": 1.0}],
                "abc": [float(x) for x in frac[j]],
                "xyz": [float(x) for x in cart[j]],
                "label": site_els[j],
                "properties": {},
            }
            for j in range(nsites)
        ]

        diel = {}
        for kind, lo, hi in (("electronic", 2.0, 12.0), ("ionic", 1.0, 40.0)):
            t = _sym3(rng, lo, hi)
            eig = np.sort(np.linalg.eigvalsh(t))
            diel[f"epsilon_{kind}"] = [[float(x) for x in r] for r in t]
            diel[f"epsilon_{kind}_eig"] = [float(x) for x in eig]
            diel[f"epsilon_{kind}_avg"] = float(eig.mean())

        freq = rng.uniform(-1, 25, 3 * nsites)
        tensors = [_sym3(rng, 0.5, 4.0) for _ in range(nsites)]
        avg_abs_trace = float(
            np.mean([abs(np.trace(t0) / 3.0) for t0 in tensors])
        )

        counts: dict[str, int] = {}
        for el in site_els:
            counts[el] = counts.get(el, 0) + 1
        formula = "".join(
            f"{el}{c if c > 1 else ''}" for el, c in sorted(counts.items())
        )

        rows.append(
            {
                "mp_id": mp_id,
                "nelements": len(set(els)),
                "nsites": nsites,
                "elements": sorted(set(els)),
                "structure": {
                    "@module": "pymatgen.core.structure",
                    "@class": "Structure",
                    "charge": None,
                    "lattice": {
                        "matrix": [[float(x) for x in r] for r in lat],
                        "a": float(abc_len[0]),
                        "b": float(abc_len[1]),
                        "c": float(abc_len[2]),
                        "alpha": 90.0,
                        "beta": 90.0,
                        "gamma": 90.0,
                        "volume": volume,
                    },
                    "sites": sites,
                },
                "spacegroup": {
                    "source": "spglib",
                    "symbol": "P1",
                    "number": int(rng.randint(1, 231)),
                    "point_group": "1",
                    "crystal_system": str(rng.choice(crystal_names, p=crystal_p)),
                    "hall": "P 1",
                },
                "dielectric": diel,
                "phonon": {
                    "lowest_freq": float(freq.min()),
                    "frequency": [float(x) for x in freq],
                },
                "born_effective_charge": {
                    "avg_abs_trace": avg_abs_trace,
                    "tensors": [
                        [[float(x) for x in r] for r in t0] for t0 in tensors
                    ],
                },
                "band_gap": float(rng.uniform(0.503, 7.474)),
                "is_direct": bool(rng.rand() < 0.19),
                "formula": formula,
            }
        )
    # elements list must match nelements used above
    for r in rows:
        r["nelements"] = len(r["elements"])
    return spark.createDataFrame(rows, MATERIALS_SCHEMA)


def generate_predictions(
    materials: DataFrame, seed: int = 42, unscored_frac: float = 0.01
) -> DataFrame:
    """FIXTURES §A2: 4 model configs per scored id, log10(actual)+noise
    so corr lands in the reference's 0.96-0.99 band; ~1% unscored (the
    anti-join fixture)."""
    import pandas as pd

    from pyspark.sql import functions as F

    pdf = materials.select(
        "mp_id",
        F.col("dielectric.epsilon_electronic_avg").alias("el"),
        F.col("dielectric.epsilon_ionic_avg").alias("ion"),
    ).toPandas()
    rng = np.random.RandomState(seed)
    scored = pdf[rng.rand(len(pdf)) >= unscored_frac]
    out = []
    for model, col in (
        ("el_comp", "el"),
        ("el_comp_st", "el"),
        ("ion_comp", "ion"),
        ("ion_comp_st", "ion"),
    ):
        for _, row in scored.iterrows():
            out.append(
                (row["mp_id"], model, float(np.log10(row[col]) + rng.randn() * 0.05))
            )
    spark = materials.sparkSession
    return spark.createDataFrame(
        pd.DataFrame(out, columns=["mp_id", "model", "log10_eps"]),
        "mp_id string, model string, log10_eps double",
    )


def generate_materials_distributed(
    spark: SparkSession, n: int, seed: int = 42, partitions: int | None = None
) -> DataFrame:
    """Executor-side generation for big synthetic corpora: a range()
    frame fans out to partitions, each builds its slice with a
    deterministic per-row seed (seed + id) inside mapInPandas — the
    generator that scales a load test to 10⁸ rows, no driver loop."""
    import pandas as pd

    from pyspark.sql import functions as F

    parts = partitions or max(spark.sparkContext.defaultParallelism, 4)
    idx = spark.range(0, n, 1, parts)

    def _gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                one = _generate_one(int(i), seed)
                rows.append(one)
            yield pd.DataFrame({"json": [__import__("json").dumps(r) for r in rows]})

    # rows serialize as JSON strings inside Arrow (nested structs with
    # maps are awkward through pandas); from_json restores the schema.
    raw = idx.mapInPandas(_gen, schema="json string")
    return raw.select(
        F.from_json("json", MATERIALS_SCHEMA).alias("r")
    ).select("r.*")


def _generate_one(i: int, seed: int) -> dict:
    """One synthetic material (same construction as generate_materials,
    factored per-row so executors can call it independently)."""
    rng = np.random.RandomState(seed * 1_000_003 + i)
    crystal_names = [c for c, _ in _CRYSTAL]
    crystal_p = np.array([w for _, w in _CRYSTAL], dtype=float)
    crystal_p /= crystal_p.sum()
    nelements = int(rng.choice([2, 3, 4, 5], p=[0.05, 0.55, 0.35, 0.05]))
    els = list(rng.choice(_ELEMENTS, size=nelements - 1, replace=False)) + ["O"]
    nsites = int(rng.randint(2, 24))
    lat = np.diag(rng.uniform(4, 12, 3)) + rng.uniform(-0.3, 0.3, (3, 3))
    volume = float(abs(np.linalg.det(lat)))
    abc_len = np.linalg.norm(lat, axis=1)
    site_els = [els[rng.randint(0, len(els))] for _ in range(nsites)]
    frac = rng.rand(nsites, 3)
    cart = frac @ lat
    diel = {}
    for kind, lo, hi in (("electronic", 2.0, 12.0), ("ionic", 1.0, 40.0)):
        t = _sym3(rng, lo, hi)
        eig = np.sort(np.linalg.eigvalsh(t))
        diel[f"epsilon_{kind}"] = [[float(x) for x in r] for r in t]
        diel[f"epsilon_{kind}_eig"] = [float(x) for x in eig]
        diel[f"epsilon_{kind}_avg"] = float(eig.mean())
    freq = rng.uniform(-1, 25, 3 * nsites)
    tensors = [_sym3(rng, 0.5, 4.0) for _ in range(nsites)]
    counts: dict[str, int] = {}
    for el in site_els:
        counts[el] = counts.get(el, 0) + 1
    return {
        "mp_id": f"mp-{9_000_000 + i}",
        "nelements": len(set(els)),
        "nsites": nsites,
        "elements": sorted(set(els)),
        "structure": {
            "@module": "pymatgen.core.structure",
            "@class": "Structure",
            "charge": None,
            "lattice": {
                "matrix": [[float(x) for x in r] for r in lat],
                "a": float(abc_len[0]), "b": float(abc_len[1]), "c": float(abc_len[2]),
                "alpha": 90.0, "beta": 90.0, "gamma": 90.0, "volume": volume,
            },
            "sites": [
                {
                    "species": [{"element": site_els[j], "occu": 1.0}],
                    "abc": [float(x) for x in frac[j]],
                    "xyz": [float(x) for x in cart[j]],
                    "label": site_els[j],
                    "properties": {},
                }
                for j in range(nsites)
            ],
        },
        "spacegroup": {
            "source": "spglib", "symbol": "P1",
            "number": int(rng.randint(1, 231)), "point_group": "1",
            "crystal_system": str(rng.choice(crystal_names, p=crystal_p)),
            "hall": "P 1",
        },
        "dielectric": diel,
        "phonon": {
            "lowest_freq": float(freq.min()),
            "frequency": [float(x) for x in freq],
        },
        "born_effective_charge": {
            "avg_abs_trace": float(np.mean([abs(np.trace(t0) / 3.0) for t0 in tensors])),
            "tensors": [[[float(x) for x in r] for r in t0] for t0 in tensors],
        },
        "band_gap": float(rng.uniform(0.503, 7.474)),
        "is_direct": bool(rng.rand() < 0.19),
        "formula": "".join(f"{el}{c if c > 1 else ''}" for el, c in sorted(counts.items())),
    }
