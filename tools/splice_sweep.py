"""Splice freshly-run queries into an existing verify_local --json
artifact.

Use case: a multi-hour full sweep snapshots the registry at launch;
operators registered while it runs are verified with the SAME
sweep() harness afterwards and their rows merged, so the committed
artifact covers the final registry without re-paying the full wall.

Usage: python tools/splice_sweep.py ARTIFACT.json SF_DIR q_a [q_b ...]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.verify_local import sweep  # noqa: E402


def main() -> int:
    artifact_path, sf_dir, *names = sys.argv[1:]
    with open(artifact_path) as f:
        artifact = json.load(f)
    if sf_dir not in artifact["sweeps"]:
        raise SystemExit(f"{sf_dir} not in {artifact_path}: {list(artifact['sweeps'])}")

    from data_wrangler_spark.session import get_spark

    spark = get_spark("splice_sweep")
    results, n_pass, n_fail, n_ro = sweep(spark, sf_dir, set(names))

    sw = artifact["sweeps"][sf_dir]
    for name, row in results.items():
        prev = sw["results"].get(name)
        if prev is not None:  # replacing: back its tallies out first
            sw["n_pass"] -= prev.get("status") == "PASS"
            sw["n_rows_only"] -= prev.get("status") == "ROWS_ONLY"
            sw["n_fail"] -= prev.get("status") not in ("PASS", "ROWS_ONLY")
            sw["n_total"] -= 1
        sw["results"][name] = row
    sw["n_pass"] += n_pass
    sw["n_fail"] += n_fail
    sw["n_rows_only"] += n_ro
    sw["n_total"] += len(results)
    artifact["ok"] = all(s["n_fail"] == 0 for s in artifact["sweeps"].values())

    # match verify_local's writer exactly so splices don't reformat
    with open(artifact_path, "w") as f:
        json.dump(artifact, f, indent=1, default=str)
    print(
        f"spliced {sorted(results)} into {artifact_path}[{sf_dir}]: "
        f"{sw['n_pass']} pass / {sw['n_fail']} fail / "
        f"{sw['n_rows_only']} rows-only of {sw['n_total']}"
    )
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
