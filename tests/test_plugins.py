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


def test_salesforce_retry_contract():
    """salesforce.js:19-47 pinned: first login fails → exactly ONE
    retry with password+securityToken concatenated → ok with the
    connection attached; two failures → {ok: false, error}
    (VERDICT r6 #6)."""
    from data_wrangler_spark.plugins import make_salesforce_auth

    calls = []

    def flaky_login(username, password):
        calls.append((username, password))
        if len(calls) == 1:
            raise RuntimeError("INVALID_LOGIN: outside trusted IP range")
        return {"session": "live"}

    auth = make_salesforce_auth(flaky_login)
    info = {"username": "u@x.com", "password": "pw", "securityToken": "TOK"}
    rval = auth(info)
    assert calls == [("u@x.com", "pw"), ("u@x.com", "pwTOK")]
    assert rval["ok"] is True
    assert rval["info"]["conn"] == {"session": "live"}
    assert rval["info"]["username"] == "u@x.com"
    # the caller's info dict is not mutated (jsforce mutates; the
    # mirror returns a copy so a failed auth leaves no stale conn)
    assert "conn" not in info

    # first attempt succeeding never touches the security token
    ok_calls = []

    def good_login(username, password):
        ok_calls.append((username, password))
        return {"session": "first"}

    rval = make_salesforce_auth(good_login)(info)
    assert ok_calls == [("u@x.com", "pw")] and rval["ok"] is True

    # both attempts failing relays the SECOND error, like the
    # reference's `fn({ ok: false, error: e })` in the inner callback
    def dead_login(username, password):
        raise RuntimeError(f"bad creds for {password}")

    rval = make_salesforce_auth(dead_login)(info)
    assert rval == {"ok": False, "error": "bad creds for pwTOK"}

    # JS-falsiness parity (the sessions.py rule): a present but
    # Python-falsy connection object is SUCCESS — jsforce signals
    # failure via err/None, not via truthiness of the result
    falsy_calls = []

    def falsy_login(username, password):
        falsy_calls.append(password)
        return {}

    rval = make_salesforce_auth(falsy_login)(info)
    assert falsy_calls == ["pw"] and rval["ok"] is True
    assert rval["info"]["conn"] == {}


def test_salesforce_retry_through_auth_route(spark, sf_dir):
    """End-to-end: the retry plugin registered under 'salesforce',
    /auth POST → first-fail → one retry → SESSION SAVED with the auth
    info stashed under the service key (index.js:617-624)."""
    from data_wrangler_spark.plugins import (
        AUTH_PLUGINS,
        make_salesforce_auth,
        register_auth_plugin,
    )
    from data_wrangler_spark.server import GatewayServer

    calls = []

    def flaky_login(username, password):
        calls.append(password)
        if len(calls) == 1:
            return None  # falsy err-path, like the jsforce callback
        return {"session": "live"}

    from contextlib import nullcontext

    prev = AUTH_PLUGINS.get("salesforce")
    with pytest.warns(UserWarning) if prev is not None else nullcontext():
        register_auth_plugin("salesforce", make_salesforce_auth(flaky_login))
    srv = GatewayServer(spark, sf_dir)
    try:
        code, body = srv.route(
            "/auth",
            method="POST",
            body={
                "service": "salesforce",
                "auth": {
                    "username": "u@x.com",
                    "password": "pw",
                    "securityToken": "TOK",
                },
            },
        )
        assert code == 200 and body["ok"] is True and body["token"]
        assert calls == ["pw", "pwTOK"]
        saved = srv.sessions.resolve(body["token"])
        assert saved.get("salesforce")["conn"] == {"session": "live"}
    finally:
        if prev is not None:
            with pytest.warns(UserWarning):
                register_auth_plugin("salesforce", prev)
        else:
            AUTH_PLUGINS.pop("salesforce", None)
