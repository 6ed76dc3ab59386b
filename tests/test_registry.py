"""Registry/driver-contract invariants."""

import data_wrangler_spark as dws
import __spark_entry__ as entry_mod


def test_all_queries_callable():
    qs = entry_mod.queries()
    assert len(qs) >= 54, f"declared inventory is 54+, got {len(qs)}"
    assert set(entry_mod.oracle_sql()) <= set(qs)


def test_oracle_coverage():
    """Only the contract-allowed ops may omit oracles (approx/LSH)."""
    no_oracle = {
        name for name, spec in dws.REGISTRY.items() if spec.oracle is None
    }
    assert no_oracle == {
        "q_sim_search_ivf",
        "q_sim_search_ivf_indexed",  # persisted index — pinned vs in-memory IVF
        "q_pagerank",  # iterative — numpy-pinned in tests/test_graph.py
    } | {n for n in no_oracle if "stream" in n}


def test_specs_have_docs():
    for name, spec in dws.REGISTRY.items():
        assert spec.doc, f"{name} has no docstring"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert "o_orderkey" in df.columns
