#!/usr/bin/env python
"""Machine-compute the next round's sampling rotation.

The driver's correctness gate samples the FIRST 50 registry keys per
round (CORRECTNESS_r0N.json). This tool unions every existing
CORRECTNESS file, diffs against the current registry, and prints:

* the never-officially-sampled residue (exact list, import order),
* any sampled query whose LATEST official status was not fully green
  (these should lead the next prefix),
* how many slots remain for new-in-round queries.

Usage: python tools/rotation_plan.py [--json]
Run at the START of a round, after the driver has written the new
CORRECTNESS file — the output is the next `_R{N+1}_PRIORITY` seed
(new/changed queries then take slots from the tail, per the standing
deferral rule in queries/__init__.py).
"""

from __future__ import annotations

import glob
import json
import sys

sys.path.insert(0, ".")


def main() -> None:
    from oxi_diel_db_spark.queries import load_registry

    reg = load_registry()
    latest: dict[str, dict] = {}
    files = sorted(glob.glob("CORRECTNESS_r*.json"))
    for path in files:
        with open(path) as fh:
            data = json.load(fh)
        for name, row in data.items():
            latest[name] = {"round": path, **(row if isinstance(row, dict) else {})}

    never = [n for n in reg if n not in latest]
    def _green(n: str, row: dict) -> bool:
        if reg[n].oracle is None:
            # rows-only by design: a recorded row count IS the pass;
            # but if the query HAS an oracle NOW, an old rows-only
            # record is stale (gate upgraded) and must be re-sampled
            return row.get("err") == "no_oracle" and row.get("spark_rows") is not None
        return bool(
            row.get("rows_match")
            and row.get("schema_match")
            and row.get("hash_match")
        )

    not_green = [n for n, row in latest.items() if n in reg and not _green(n, row)]
    out = {
        "registry": len(reg),
        "officially_sampled": len([n for n in reg if n in latest]),
        "never_sampled": never,
        "latest_status_not_green": not_green,
        "free_slots_after_residue": max(0, 50 - len(never) - len(not_green)),
        "correctness_files": files,
    }
    if "--json" in sys.argv:
        print(json.dumps(out, indent=2))
        return
    print(f"registry: {out['registry']}; officially sampled: {out['officially_sampled']}")
    print(f"\nnever-sampled residue ({len(never)}):")
    for n in never:
        print(f"    \"{n}\",")
    if not_green:
        print(f"\nLATEST STATUS NOT GREEN ({len(not_green)}) — lead the prefix:")
        for n in not_green:
            print(f"    \"{n}\",  # {latest[n]}")
    print(f"\nfree slots after residue: {out['free_slots_after_residue']}")


if __name__ == "__main__":
    main()
