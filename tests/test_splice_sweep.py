"""tools/splice_sweep.py merges single-query runs into a committed
full-sweep artifact; these pin the tally arithmetic it performs,
since a wrong merge would corrupt a judge-facing correctness record.
The sweep/compare machinery itself is verify_local's, exercised by
every committed artifact — only the merge bookkeeping is new."""

import json
import subprocess
import sys


def _fake_artifact(tmp_path):
    art = {
        "sweeps": {
            "/data/sf": {
                "n_pass": 2,
                "n_fail": 0,
                "n_rows_only": 1,
                "n_total": 3,
                "skipped": [],
                "results": {
                    "q_a": {"status": "PASS", "rows": 5, "detail": ""},
                    "q_b": {"status": "PASS", "rows": 7, "detail": ""},
                    "q_c": {"status": "ROWS_ONLY", "rows": 9},
                },
            }
        },
        "ok": True,
    }
    p = tmp_path / "art.json"
    p.write_text(json.dumps(art))
    return p


def test_splice_replaces_without_double_counting(tmp_path, monkeypatch):
    """Re-splicing an existing PASS row and adding a new one must
    leave n_pass/n_total consistent with the results dict."""
    import tools.splice_sweep as sp

    art_path = _fake_artifact(tmp_path)

    def fake_sweep(spark, sf_dir, only, skip=frozenset()):
        assert sf_dir == "/data/sf" and only == {"q_b", "q_new"}
        return (
            {
                "q_b": {"status": "PASS", "rows": 8, "detail": ""},
                "q_new": {"status": "PASS", "rows": 1, "detail": ""},
            },
            2,
            0,
            0,
        )

    monkeypatch.setattr(sp, "sweep", fake_sweep)
    monkeypatch.setattr(
        "data_wrangler_spark.session.get_spark", lambda name: None
    )
    monkeypatch.setattr(
        sys, "argv", ["splice_sweep.py", str(art_path), "/data/sf", "q_b", "q_new"]
    )
    assert sp.main() == 0

    got = json.loads(art_path.read_text())
    sw = got["sweeps"]["/data/sf"]
    assert sw["n_total"] == 4 == len(sw["results"])
    assert sw["n_pass"] == 3
    assert sw["n_fail"] == 0 and sw["n_rows_only"] == 1
    assert sw["results"]["q_b"]["rows"] == 8  # replaced, not duplicated
    assert got["ok"] is True


def test_splice_fail_flips_ok_and_returns_nonzero(tmp_path, monkeypatch):
    import tools.splice_sweep as sp

    art_path = _fake_artifact(tmp_path)

    def fake_sweep(spark, sf_dir, only, skip=frozenset()):
        return ({"q_bad": {"status": "VALUES_MISMATCH", "rows": 2, "detail": "x"}}, 0, 1, 0)

    monkeypatch.setattr(sp, "sweep", fake_sweep)
    monkeypatch.setattr(
        "data_wrangler_spark.session.get_spark", lambda name: None
    )
    monkeypatch.setattr(sys, "argv", ["splice_sweep.py", str(art_path), "/data/sf", "q_bad"])
    assert sp.main() == 1
    got = json.loads(art_path.read_text())
    assert got["ok"] is False
    assert got["sweeps"]["/data/sf"]["n_fail"] == 1
