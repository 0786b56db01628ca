"""CLI entry point — the engine twin of the reference's
``python main.py -diel el -des comp_st -s POSCAR`` (main.py:9-37).

Differences are deliberate fixes of documented reference bugs
(SURVEY.md §3.1):

* accepts BOTH the documented ("electronic"/"ionic") and implemented
  ("el"/"ion") dielectric spellings (the reference's help text and
  validation disagree);
* requiring exactly one of -c/-s is validated up front (the reference
  hits NameError when neither is given, main.py:32-33).

Subcommands: predict (S2/S3/S4 sources → S6 stdout sink), ingest,
list (registry inventory), query (run any registry operator by name —
table/JSONL output or the formatted physical plan).
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def _structure_features(args) -> dict:
    """Structure-derived descriptor values from a JSON record or POSCAR
    (S2: database JSON, main.py:26-29; S3: Structure.from_file,
    main.py:31)."""
    if args.structure.endswith(".json"):
        with open(args.structure) as fr:
            d = json.load(fr)
        struct = d["structure"] if "structure" in d else d
        lattice = np.array(struct["lattice"]["matrix"], dtype=float)
        sites = struct["sites"]
        pts = np.array([s["xyz"] for s in sites], dtype=float)
        elements = [s["species"][0]["element"] for s in sites]
    else:  # POSCAR
        from oxi_diel_db_spark.sources.poscar import parse_poscar_text

        with open(args.structure) as fr:
            text = fr.read()
        lines = [ln.strip() for ln in text.splitlines() if ln.strip()]
        scale = float(lines[1])
        lattice = (
            np.array([[float(x) for x in lines[i].split()[:3]] for i in (2, 3, 4)])
            * scale
        )
        pdf = parse_poscar_text(text)
        pts = pdf[["cart_x", "cart_y", "cart_z"]].to_numpy()
        elements = list(pdf["element"])

    volume = float(abs(np.linalg.det(lattice)))
    n = len(pts)
    if n > 1:
        dist = np.linalg.norm(pts[:, None, :] - pts[None, :, :], axis=-1)
        np.fill_diagonal(dist, np.inf)
        md = dist.min(axis=1)
        mean_md, std_md = float(md.mean()), float(md.std())
    else:
        mean_md = std_md = 0.0

    counts: dict[str, int] = {}
    for el in elements:
        counts[el] = counts.get(el, 0) + 1
    formula = "".join(f"{el}{c if c > 1 else ''}" for el, c in sorted(counts.items()))
    return {
        "formula": formula,
        "vol_per_site": volume / n,
        "density_proxy": n / volume,
        "mean_min_dist": mean_md,
        "std_min_dist": std_md,
    }


def cmd_predict(args) -> None:
    from oxi_diel_db_spark.ml.comp_model import predict_log10_eps
    from oxi_diel_db_spark.session import get_spark
    from oxi_diel_db_spark.sources.materials import materials

    if bool(args.composition) == bool(args.structure):
        sys.exit("predict: specify exactly one of -c COMPOSITION or -s STRUCTURE_FILE")
    if args.descriptor_type == "comp_st" and not args.structure:
        sys.exit("predict: -des comp_st needs -s (a structure file)")

    spark = get_spark("oxi_diel_db_spark.predict")
    target = (
        {"formula": args.composition}
        if args.composition
        else _structure_features(args)
    )
    pred = predict_log10_eps(
        spark,
        materials(spark),
        target,
        dielectric_type=args.dielectric_type,
        model_type=args.descriptor_type,
        num_trees=args.trees,
    )
    # S6 stdout sink — same two lines the reference prints (main.py:36-37)
    print(f"Predicted log10(epsilon): {pred}")
    print(f"Predicted epsilon: {10 ** pred}")


def cmd_list(_args) -> None:
    from oxi_diel_db_spark.queries import load_registry

    for name, qdef in load_registry().items():
        doc = (qdef.build.__doc__ or "").strip().split("\n")[0]
        gate = "oracle" if qdef.oracle else "rows-only"
        print(f"{name:32s} [{gate}] {doc}")


def cmd_query(args) -> None:
    from oxi_diel_db_spark.queries import load_registry
    from oxi_diel_db_spark.session import get_spark

    reg = load_registry()
    if args.name not in reg:
        sys.exit(
            f"query: unknown query {args.name!r} "
            f"(run `oxi_diel_db_spark list` for the registry)"
        )
    spark = get_spark("oxi_diel_db_spark.query")
    df = reg[args.name].build(spark, args.sf_dir)
    if args.explain:
        df.explain("formatted")
        return
    if args.json:
        for row in df.limit(args.limit).collect():  # S6 stdout sink
            print(json.dumps(row.asDict(), default=str, sort_keys=True))
    else:
        df.show(args.limit, truncate=False)


def cmd_ingest(_args) -> None:
    from oxi_diel_db_spark.session import get_spark
    from oxi_diel_db_spark.sources.materials import ingest_to_parquet

    ingest_to_parquet(get_spark("oxi_diel_db_spark.ingest"))
    print("ingested data/materials.parquet + data/predictions.parquet")


def main(argv: list[str] | None = None) -> None:
    parser = argparse.ArgumentParser(
        prog="oxi_diel_db_spark",
        description="PySpark-native dielectric-constant analytics engine",
    )
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("predict", help="predict dielectric constant by ML models")
    p.add_argument(
        "-diel",
        dest="dielectric_type",
        default="el",
        choices=["el", "electronic", "ion", "ionic"],
        help="electronic or ionic contribution (both spellings accepted)",
    )
    p.add_argument(
        "-des",
        dest="descriptor_type",
        default="comp",
        choices=["comp", "comp_st"],
        help="compositional or compositional+structural descriptors",
    )
    p.add_argument("-c", dest="composition", help="composition, e.g. SiO2")
    p.add_argument(
        "-s",
        dest="structure",
        help="structure file: POSCAR or a database JSON record",
    )
    p.add_argument("--trees", type=int, default=100, help="RandomForest size")
    p.set_defaults(fn=cmd_predict)

    p = sub.add_parser("ingest", help="reference JSON corpus → data/ parquet")
    p.set_defaults(fn=cmd_ingest)

    p = sub.add_parser("list", help="list every registry query")
    p.set_defaults(fn=cmd_list)

    p = sub.add_parser("query", help="run a registry query by name")
    p.add_argument("name", help="registry key, e.g. q01_pricing_summary")
    p.add_argument(
        "--sf-dir", default="/root/testdata/sf0.01", help="parquet table directory"
    )
    p.add_argument("--limit", type=int, default=20, help="rows to print")
    p.add_argument(
        "--json", action="store_true", help="JSONL to stdout instead of a table"
    )
    p.add_argument(
        "--explain", action="store_true", help="print the formatted physical plan"
    )
    p.set_defaults(fn=cmd_query)

    args = parser.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
