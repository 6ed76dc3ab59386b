"""Amortized warm-serving head-to-head for the standing weak set.

Every round since r9 the seven f50 Arrow ratios >2x (BENCH_F50_ARROW:
q_sort_paginate 9.2x ... q_text_fingerprint 2.3x) have been adjudged
"fixed job-launch floors, not data terms" by narrative. This measures
the claim once (VERDICT r12 #5): serve each weak query through a WARM
engine N back-to-back times — the regime a real serving layer
(server.py's template catalog) runs in, where the plan is built once
and requests reuse it — and report per-request amortized latency for
both engines under the identical protocol (Arrow delivery, plan/SQL
prepared once, N repeated executions, mean after one unmeasured
warmup). DuckDB gets the same treatment: one connection, one warmup,
N repeated fetch_arrow_table of the same oracle SQL.

Three Spark modes (ADVICE r13):
- serving: ONE DataFrame, N toArrow() — repeated byte-identical
  requests reuse registered shuffle map outputs (skipped stages);
  the long-lived-session best case, disclosed as such.
- fresh_plan: a NEW DataFrame per request — full re-plan + full
  re-execution. The disclosed per-request-constant qualifier.
- parameterized: the template-serving regime — same plan SHAPE,
  a DIFFERENT bind value per request (q_sort_paginate's page, the
  one weak query with a real template parameter and the worst
  ratio of the seven), so skipped-stage reuse is impossible while
  the workload is still "serve the catalog template". DuckDB gets
  the identical varied bind spliced into its oracle SQL.

Usage: python tools/bench_amortized.py [sf_dir] [N]
Defaults: the derived f50 fixture (the factor the weak labels were
assigned at), N=100. Writes one JSON line to stdout; commit it as
BENCH_AMORTIZED_r{N}.json each round (kept self-sustaining since
r14 — the serving claim is re-measured, not narrated forward).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from bench_duckdb import duck_con  # noqa: E402  (tools/ sibling)

WEAK = [
    "q_sort_paginate",
    "q_agg_count_distinct",
    "q_topk",
    "q_join_multi",
    "q_agg_groupby",
    "q_stream_tumbling",
    "q_text_fingerprint",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scratch/sfprobe/f50"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    load_before = [round(x, 2) for x in os.getloadavg()]

    from data_wrangler_spark import REGISTRY
    from data_wrangler_spark.session import get_spark

    con = duck_con(sf_dir)
    spark = get_spark("bench_amortized")

    n_fresh = max(1, n // 5)
    out: dict = {
        "metric": "amortized_serving_sec_per_request",
        "sf_dir": sf_dir,
        "n_requests": n,
        "n_requests_fresh_plan": n_fresh,
        "delivery": "arrow",
        "queries": {},
        "fresh_plan": {},
    }
    for name in WEAK:
        spec = REGISTRY[name]

        # DuckDB: one connection, one warmup, N repeated serves.
        # DuckDB re-plans and re-executes in full every request —
        # that IS its serving regime (planning is microseconds and
        # it keeps no cross-query execution state), so one mode
        # covers it.
        con.execute(spec.oracle).fetch_arrow_table()
        t0 = time.perf_counter()
        for _ in range(n):
            con.execute(spec.oracle).fetch_arrow_table()
        d_total = time.perf_counter() - t0

        # Spark serving mode: plan built ONCE, N repeated serves —
        # the server.py template-catalog regime. Each toArrow()
        # launches real jobs, but Spark reuses the registered map
        # outputs of already-computed shuffle stages on the same
        # plan (skipped stages), so repeated identical requests pay
        # only the result-side stage — the warm-serving behavior a
        # long-lived session gives for free, stated explicitly so
        # the number isn't mistaken for full recompute.
        df = spec.run(spark, sf_dir)
        df.toArrow()
        t0 = time.perf_counter()
        for _ in range(n):
            df.toArrow()
        s_total = time.perf_counter() - t0

        q = {
            "duckdb_amortized": round(d_total / n, 5),
            "spark_amortized": round(s_total / n, 5),
            "ratio_spark_over_duckdb": round(s_total / d_total, 2),
            "duckdb_total": round(d_total, 3),
            "spark_total": round(s_total, 3),
        }
        out["queries"][name] = q
        print(f"{name}: {json.dumps(q)}", file=sys.stderr, flush=True)

        # Spark fresh-plan mode: a NEW DataFrame per request — full
        # re-plan + full re-execution, no stage reuse. The gap to
        # the serving mode is exactly the per-request constant the
        # weak labels were measuring (plan build + stage recompute).
        t0 = time.perf_counter()
        for _ in range(n_fresh):
            spec.run(spark, sf_dir).toArrow()
        f_total = time.perf_counter() - t0
        fq = {
            "spark_amortized": round(f_total / n_fresh, 5),
            "ratio_spark_over_duckdb": round(
                (f_total / n_fresh) / (d_total / n), 2
            ),
            "spark_total": round(f_total, 3),
        }
        out["fresh_plan"][name] = fq
        print(f"{name} fresh: {json.dumps(fq)}", file=sys.stderr, flush=True)

        # Parameterized serving (module docstring): only queries with
        # a real template bind run here; the bind varies per request
        # on BOTH engines, so neither side can reuse a prior
        # request's execution.
        if name == "q_sort_paginate":
            pages = [2 + (i % 8) for i in range(n_fresh)]
            spec.run(spark, sf_dir, page=pages[0]).toArrow()
            t0 = time.perf_counter()
            for p in pages:
                spec.run(spark, sf_dir, page=p).toArrow()
            sp_total = time.perf_counter() - t0

            def duck_sql(p: int) -> str:
                return spec.oracle.replace(
                    "LIMIT 50 OFFSET 100", f"LIMIT 50 OFFSET {50 * (p - 1)}"
                )

            assert duck_sql(7) != spec.oracle  # splice point must exist
            con.execute(duck_sql(pages[0])).fetch_arrow_table()
            t0 = time.perf_counter()
            for p in pages:
                con.execute(duck_sql(p)).fetch_arrow_table()
            dp_total = time.perf_counter() - t0
            pq = {
                "param": "page 2..9 rotating",
                "n_requests": n_fresh,
                "duckdb_amortized": round(dp_total / n_fresh, 5),
                "spark_amortized": round(sp_total / n_fresh, 5),
                "ratio_spark_over_duckdb": round(sp_total / dp_total, 2),
            }
            out.setdefault("parameterized", {})[name] = pq
            print(
                f"{name} parameterized: {json.dumps(pq)}",
                file=sys.stderr,
                flush=True,
            )

    out["load"] = {
        "before": load_before,
        "after": [round(x, 2) for x in os.getloadavg()],
        "ncpu": os.cpu_count(),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
