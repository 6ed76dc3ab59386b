"""Plugin loading: the reference's `require('./plugins/'+name)` surface
(index.js:140-157) re-expressed as register_queries(register) modules."""

import textwrap

import pytest

from data_wrangler_spark.plugins import PluginError, load_plugin
from data_wrangler_spark.registry import REGISTRY


PLUGIN_SRC = textwrap.dedent(
    '''
    from pyspark.sql import functions as F


    def register_queries(register):
        @register(
            "q_plugin_nation_count",
            oracle="SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nation",
            tags=("plugin",),
        )
        def q_plugin_nation_count(spark, sf_dir):
            """Plugin-provided query: nation rowcount."""
            df = spark.read.parquet(f"{sf_dir}/nation.parquet")
            return df.agg(F.count(F.lit(1)).alias("n"))
    '''
)


def test_load_plugin_registers_runnable_query(spark, sf_dir, tmp_path):
    p = tmp_path / "my_plugin.py"
    p.write_text(PLUGIN_SRC)
    try:
        added = load_plugin(str(p))
        assert added == ["q_plugin_nation_count"]
        spec = REGISTRY["q_plugin_nation_count"]
        assert spec.oracle and spec.doc
        assert spec.run(spark, sf_dir).collect()[0].n == 25
        # reloading collides on the query name — no silent shadowing
        with pytest.raises(ValueError):
            load_plugin(str(p))
    finally:
        REGISTRY.pop("q_plugin_nation_count", None)


def test_load_plugin_rejects_hookless_module(tmp_path):
    p = tmp_path / "bad_plugin.py"
    p.write_text("x = 1\n")
    with pytest.raises(PluginError, match="register_queries"):
        load_plugin(str(p))


def test_load_plugin_rejects_missing_module():
    with pytest.raises(PluginError, match="cannot import"):
        load_plugin("no_such_plugin_module_xyz")


def test_register_auth_plugin_warns_on_replacement():
    """Two plugin modules sharing a SERVICE_NAME must not silently
    change which credentials /auth accepts (ADVICE r5)."""
    import warnings

    from data_wrangler_spark.plugins import AUTH_PLUGINS, register_auth_plugin

    def auth_a(info):
        return {"ok": True}

    def auth_b(info):
        return {"ok": False}

    name = "_dup_svc_test"
    try:
        register_auth_plugin(name, auth_a)
        # same fn again: idempotent, no warning
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            register_auth_plugin(name, auth_a)
        # different fn: warns, but still replaces
        with pytest.warns(UserWarning, match="replaces an existing"):
            register_auth_plugin(name, auth_b)
        assert AUTH_PLUGINS[name] is auth_b
    finally:
        AUTH_PLUGINS.pop(name, None)
