"""The service wrapper — the reference's `iqdatawrangler.init.d`
(forever-supervised `node index.js`) mirrored as
scripts/data_wrangler_spark.init.d over `python -m
data_wrangler_spark.serve`. Driven end-to-end: start (waits on the
app's ready-file, not a sleep), status, a real HTTP query through
the managed process, stop (SIGTERM → clean shutdown + pidfile
removal), double-stop idempotence."""

import json
import os
import subprocess
import sys
import urllib.request

SCRIPT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "scripts",
    "data_wrangler_spark.init.d",
)


def _run(args, env):
    return subprocess.run(
        ["sh", SCRIPT, *args],
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )


def test_init_wrapper_lifecycle(tmp_path, sf_dir):
    env = {
        **os.environ,
        "DW_LOGDIR": str(tmp_path),
        "DW_PORT": "0",  # ephemeral — the ready-file reports the URL
        "DW_SF_DIR": sf_dir,
        "DW_PYTHON": sys.executable,
        "DW_STARTTIME": "240",  # SparkSession boot on a loaded box
        "DW_DIETIME": "60",
    }
    # not running yet: status exits 3 (LSB), stop is a no-op success
    assert _run(["status"], env).returncode == 3
    assert _run(["stop"], env).returncode == 0

    r = _run(["start"], env)
    assert r.returncode == 0, r.stdout + r.stderr
    url = (tmp_path / "server.url").read_text().strip()
    assert url.startswith("http://127.0.0.1:")
    try:
        # start is idempotent while running
        again = _run(["start"], env)
        assert again.returncode == 0 and "already running" in again.stdout

        st = _run(["status"], env)
        assert st.returncode == 0 and "running" in st.stdout

        # a real query through the MANAGED process
        with urllib.request.urlopen(f"{url}/run/q_topk?limit=5") as resp:
            body = json.loads(resp.read())
        assert body["ok"] is True and len(body["results"]) == 5

        # timestamped log pair exists (the reference's OLOG/ELOG shape)
        logs = [p.name for p in tmp_path.iterdir()]
        assert any(n.endswith(".output.log") for n in logs)
        assert any(n.endswith(".error.log") for n in logs)
    finally:
        r = _run(["stop"], env)
    assert r.returncode == 0, r.stdout + r.stderr
    assert not (tmp_path / "server.pid").exists()  # app removed it
    assert _run(["status"], env).returncode == 3
    # stop again: still a success no-op
    assert _run(["stop"], env).returncode == 0
