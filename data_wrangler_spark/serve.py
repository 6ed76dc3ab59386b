"""Foreground server process — the app the init wrapper manages.

The reference ships an LSB init script (`/root/reference/
iqdatawrangler.init.d`) whose managed app is `node index.js` under
the `forever` supervisor: `start_server` launches it with
timestamped output/error logs, `running()` greps the supervisor's
process list, `stop` asks the supervisor to kill it. This module is
the Spark-native managed app: `python -m data_wrangler_spark.serve`
boots a SparkSession + GatewayServer in the foreground, optionally
records its pid and its bound URL (the wrapper's readiness probe —
port 0 binds ephemerally, so the URL must be REPORTED, not assumed),
and serves until SIGTERM/SIGINT, exiting cleanly so the wrapper's
stop-wait loop (`DIETIME`) observes a real shutdown. The supervisor
half lives in `scripts/data_wrangler_spark.init.d`.

Defaults mirror the reference config: port 4400 (`config.json:3`),
`--debug` flips to 4401 via the same `listen_port` rule the server
uses (`index.js:47-48`).
"""

from __future__ import annotations

import argparse
import os
import signal
import sys
import threading


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="python -m data_wrangler_spark.serve")
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"),
        help="parquet table directory the engine serves",
    )
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument(
        "--port",
        type=int,
        default=4400,
        help="listen port (reference config.json:3); 0 = ephemeral",
    )
    ap.add_argument(
        "--debug",
        action="store_true",
        help="listen on 4401 regardless of --port (index.js:47-48)",
    )
    ap.add_argument(
        "--pidfile", help="write this process's pid here once serving"
    )
    ap.add_argument(
        "--ready-file",
        help="write the bound base URL here once listening — the init "
        "wrapper's readiness probe (replaces forever's STARTTIME guess "
        "with a positive signal)",
    )
    args = ap.parse_args(argv)

    from data_wrangler_spark.server import GatewayServer
    from data_wrangler_spark.session import get_spark

    spark = get_spark("data_wrangler_spark.serve")
    srv = GatewayServer(
        spark, args.sf_dir, host=args.host, port=args.port, debug=args.debug
    ).start()

    if args.pidfile:
        with open(args.pidfile, "w") as f:
            f.write(str(os.getpid()))
    if args.ready_file:
        tmp = args.ready_file + ".tmp"
        with open(tmp, "w") as f:
            f.write(srv.base_url + "\n")
        os.replace(tmp, args.ready_file)  # atomic: never a partial URL
    print(f"serving {args.sf_dir} at {srv.base_url}", flush=True)

    stop = threading.Event()

    def _term(signum, frame):
        stop.set()

    signal.signal(signal.SIGTERM, _term)
    signal.signal(signal.SIGINT, _term)
    stop.wait()
    srv.stop()
    spark.stop()
    if args.pidfile:
        try:
            os.unlink(args.pidfile)
        except OSError:
            pass
    return 0


if __name__ == "__main__":
    sys.exit(main())
