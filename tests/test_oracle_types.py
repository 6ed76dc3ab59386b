"""Regression guard for the r03 q_dedup_eval divergence class.

DuckDB SUM(int) yields HUGEINT (int128); fetchall() paths compare it
equal to Spark's long, but pandas/Arrow fetch paths (which the driver
harness may use) convert HUGEINT to float64 — so the driver's
value-hash diverges while local verification passes. Same risk for
DECIMAL. Every oracle's OUTPUT column types must therefore stay in
the hash-stable set; computed integer outputs need an explicit
CAST(... AS BIGINT).
"""

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.oracle_type_audit import TABLES, type_ok  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def oracle_types():
    import __spark_entry__ as entry_mod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    out = {}
    for name, sql in entry_mod.oracle_sql().items():
        rel = con.sql(sql)  # prepare only — no execution
        out[name] = list(zip(rel.columns, [str(t) for t in rel.types]))
    return out


def test_no_hash_fragile_oracle_output_types(oracle_types):
    bad = {
        name: [(c, t) for c, t in cols if not type_ok(t)]
        for name, cols in oracle_types.items()
    }
    bad = {k: v for k, v in bad.items() if v}
    assert not bad, (
        f"oracles with HUGEINT/DECIMAL/other hash-fragile output types "
        f"(add CAST(... AS BIGINT)): {bad}"
    )
