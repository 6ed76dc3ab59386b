"""Audit every registered oracle's DuckDB OUTPUT COLUMN TYPES.

Root-cause tool for the r03 q_dedup_eval divergence: DuckDB SUM(int)
returns HUGEINT (int128); verify_local's fetchall() yields Python ints
(compares equal to Spark longs), but any pandas/Arrow fetch path —
which the driver may use — converts HUGEINT to float64, so the
value-hash diverges even when the values are numerically identical.
Same class of risk: DECIMAL outputs vs Spark double.

This audit PREPAREs (no execution) every oracle at a given sf_dir and
flags output columns whose DuckDB type is not in the hash-stable set
{BIGINT, INTEGER, SMALLINT, TINYINT, DOUBLE, FLOAT, VARCHAR, BOOLEAN,
DATE, TIMESTAMP*, lists/structs thereof}.

Usage: python tools/oracle_type_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

STABLE = {
    "BIGINT", "INTEGER", "SMALLINT", "TINYINT", "UBIGINT", "UINTEGER",
    "DOUBLE", "FLOAT", "VARCHAR", "BOOLEAN", "DATE",
    "TIMESTAMP", "TIMESTAMP WITH TIME ZONE", "TIMESTAMP_NS",
}


def type_ok(t) -> bool:
    s = str(t)
    if s in STABLE:
        return True
    if s.startswith(("TIMESTAMP",)):
        return True
    if s.endswith("[]"):  # list type — check the element
        return type_ok(s[:-2])
    if s.startswith("STRUCT(") and s.endswith(")"):
        # crude: flag structs containing HUGEINT/DECIMAL anywhere
        return "HUGEINT" not in s and "DECIMAL" not in s and "INT128" not in s
    return False


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001"
    )
    import __spark_entry__ as entry_mod

    oracles = entry_mod.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    n_bad = 0
    for name, sql in sorted(oracles.items()):
        try:
            rel = con.sql(sql)
            cols, types = rel.columns, rel.types
        except Exception as e:  # noqa: BLE001
            print(f"? {name}: PREPARE_ERROR {e}")
            n_bad += 1
            continue
        bad = [(c, str(t)) for c, t in zip(cols, types) if not type_ok(t)]
        if bad:
            n_bad += 1
            print(f"✗ {name}: {bad}")
    print(f"\n{n_bad} oracles with hash-fragile output types "
          f"(of {len(oracles)})")
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
