"""Isolated median timing for individual queries (guide §1).

Runs each named query once unmeasured (warmup) then N measured runs
(noop sink, pinned frames released after the measured block), and
prints median + spread. The per-query complement of time_sweep.py's
single-pass triage — use this to claim before/after numbers for one
operator without the sweep's ordering/contention noise.

Usage: python tools/isolate.py [-n RUNS] QUERY [QUERY ...]
       (data dir from $SPARK_GRAFT_SF_DIR, default /root/testdata/sf0.1)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = sys.argv[1:]
    n = 5
    if args and args[0] == "-n":
        n = int(args[1])
        args = args[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from data_wrangler_spark.session import get_spark
    from data_wrangler_spark import REGISTRY
    from data_wrangler_spark.catalog import enable_table_df_cache
    from data_wrangler_spark.functions.distributed import release_pinned

    spark = get_spark("isolate")
    enable_table_df_cache()
    out = {}
    for name in args:
        spark.sparkContext.setJobDescription(f"isolate warmup: {name}")
        REGISTRY[name].run(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        runs = []
        for i in range(n):
            spark.sparkContext.setJobDescription(f"isolate {i}: {name}")
            t0 = time.perf_counter()
            REGISTRY[name].run(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            runs.append(round(time.perf_counter() - t0, 4))
        release_pinned()
        spark.sparkContext.setJobDescription(None)
        med = sorted(runs)[len(runs) // 2]
        out[name] = {"median": med, "runs": runs}
        print(json.dumps({"query": name, "median": med, "runs": runs}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
