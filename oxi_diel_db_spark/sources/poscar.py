"""POSCAR (VASP) structure-file source (SURVEY.md §2.1 S3).

The reference accepts a POSCAR path and parses it with pymatgen
(``Structure.from_file("POSCAR")``, reference main.py:31). The engine
reads the file through Spark (``spark.read.text(wholetext=True)``) and
parses the public POSCAR format directly — scaled lattice, element
symbol/count lines, Direct or Cartesian coordinates — yielding one row
per site, the same long format the site-featurizer harness consumes.

Format reference: the VASP POSCAR spec (public documentation):
  line 1  comment
  line 2  global scaling factor
  3-5     lattice vectors (3×3)
  6       element symbols      (e.g. ``Ca Sn O``)
  7       element counts       (e.g. ``2 1 4``)
  8       'Direct'/'Cartesian' (optionally preceded by 'Selective dynamics')
  9-      one coordinate triple per site
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession

SITE_SCHEMA = (
    "element string, site_idx int, frac_a double, frac_b double, frac_c double, "
    "cart_x double, cart_y double, cart_z double"
)


def parse_poscar_text(text: str) -> pd.DataFrame:
    lines = [ln.strip() for ln in text.splitlines() if ln.strip()]
    scale = float(lines[1])
    lattice = np.array([[float(x) for x in lines[i].split()[:3]] for i in (2, 3, 4)])
    lattice *= scale
    symbols = lines[5].split()
    counts = [int(x) for x in lines[6].split()]
    mode_idx = 7
    if lines[mode_idx][0].lower() == "s":  # Selective dynamics
        mode_idx += 1
    cartesian = lines[mode_idx][0].lower() in ("c", "k")
    coords = []
    elements = []
    i = mode_idx + 1
    for sym, cnt in zip(symbols, counts):
        for _ in range(cnt):
            coords.append([float(x) for x in lines[i].split()[:3]])
            elements.append(sym)
            i += 1
    coords = np.array(coords)
    if cartesian:
        cart = coords * scale
        frac = cart @ np.linalg.inv(lattice)
    else:
        frac = coords
        cart = frac @ lattice
    return pd.DataFrame(
        {
            "element": elements,
            "site_idx": range(len(elements)),
            "frac_a": frac[:, 0],
            "frac_b": frac[:, 1],
            "frac_c": frac[:, 2],
            "cart_x": cart[:, 0],
            "cart_y": cart[:, 1],
            "cart_z": cart[:, 2],
        }
    )


def read_poscar(spark: SparkSession, path: str) -> DataFrame:
    """POSCAR file(s) → one row per site. Reads through Spark's text
    source (wholetext: one file = one record, like the reference's
    one-structure-per-file model); parsing runs in executors via
    mapInPandas, so a directory of millions of POSCARs scales out."""
    raw = spark.read.text(path, wholetext=True)

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for text in pdf["value"]:
                yield parse_poscar_text(text)

    return raw.mapInPandas(_parse, schema=SITE_SCHEMA)


def format_poscar(comment: str, structure) -> str:
    """Inverse of :func:`parse_poscar_text`: a structure row (the
    materials table's ``structure`` struct — lattice matrix + sites)
    → POSCAR text. Sites are grouped per element in first-appearance
    order (the format requires one count block per symbol); floats are
    printed with ``repr`` so the parse round-trips bit-exact."""
    m = structure["lattice"]["matrix"]
    order: list[str] = []
    groups: dict[str, list] = {}
    for s in structure["sites"]:
        el = s["species"][0]["element"]
        if el not in groups:
            order.append(el)
            groups[el] = []
        groups[el].append(s)
    lines = [comment, "1.0"]
    lines += [" ".join(repr(float(x)) for x in row) for row in m]
    lines.append(" ".join(order))
    lines.append(" ".join(str(len(groups[el])) for el in order))
    lines.append("Direct")
    for el in order:
        lines += [
            " ".join(repr(float(x)) for x in s["abc"]) for s in groups[el]
        ]
    return "\n".join(lines) + "\n"


# ---------------------------------------------------------------------------
# Spark 4 Python DataSource wrapper: spark.read.format("poscar")
# ---------------------------------------------------------------------------

try:  # pyspark >= 4.0
    from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

    class PoscarDataSource(DataSource):
        """``spark.read.format("poscar").load(path)`` — the same parser
        as read_poscar exposed through the Python DataSource API (the
        idiomatic Spark-4 form of a custom file source). One input
        partition per file: a directory of millions of POSCARs
        parallelizes across executors with no driver-side parsing; the
        driver only lists paths."""

        @classmethod
        def name(cls) -> str:
            return "poscar"

        def schema(self) -> str:
            return SITE_SCHEMA + ", source_file string"

        def reader(self, schema):
            return _PoscarReader(self.options)

    class _PoscarReader(DataSourceReader):
        def __init__(self, options):
            self.path = options.get("path")
            if not self.path:
                raise ValueError("poscar source requires a path: .load(path)")

        def partitions(self):
            import glob
            import os

            if os.path.isdir(self.path):
                files = sorted(
                    f
                    for f in glob.glob(os.path.join(self.path, "*"))
                    if os.path.isfile(f)
                )
            else:
                files = sorted(glob.glob(self.path)) or [self.path]
            return [InputPartition(f) for f in files]

        def read(self, partition):
            path = partition.value
            with open(path) as fh:
                pdf = parse_poscar_text(fh.read())
            pdf["source_file"] = path
            yield from pdf.itertuples(index=False)

    def register_poscar_source(spark: SparkSession) -> None:
        spark.dataSource.register(PoscarDataSource)

except ImportError:  # pragma: no cover — pyspark < 4 has no DataSource API

    def register_poscar_source(spark: SparkSession) -> None:
        raise NotImplementedError(
            "Python DataSource API requires pyspark >= 4.0; use read_poscar()"
        )
