"""Ad-hoc cross-factor timing of this session's new operators
(q_dedup_embed_2day, q_embed_index_refresh, q_stream_embed_gate,
q_quality_classifier) — SCALE.md protocol: noop sink, cold = first
call (incl. index builds), warm = median of 3.

Usage: python tools/time_new_ops_r12b.py SF_DIR [SF_DIR ...]
"""

from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

OPS = [
    "q_dedup_embed_2day",
    "q_embed_index_refresh",
    "q_stream_embed_gate",
    "q_quality_classifier",
]


def main() -> None:
    from data_wrangler_spark.session import get_spark
    from data_wrangler_spark import REGISTRY

    spark = get_spark("time_new_ops")
    for sf_dir in sys.argv[1:]:
        for name in OPS:
            def run() -> float:
                t0 = time.time()
                REGISTRY[name].run(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                return time.time() - t0

            cold = run()
            warm = statistics.median(run() for _ in range(3))
            print(
                f"{sf_dir.rstrip('/').rsplit('/', 1)[-1]} {name}: "
                f"cold {cold:.2f}s warm {warm:.2f}s",
                flush=True,
            )


if __name__ == "__main__":
    main()
