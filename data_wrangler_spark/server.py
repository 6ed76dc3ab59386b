"""HTTP serving layer — the reference's route surface over the engine.

The reference IS an HTTP gateway: named-query routes
(`/root/reference/index.js:264-325`), a self-description endpoint
(`index.js:371-425`), dataType introspection (`index.js:383-392` via
`examineQuery`, `lib/examiner.js:139-160`), and a generic paged
relation list (`index.js:431-492`). Rounds 1-2 declared the HTTP
envelope out of analytic scope (SURVEY §7.4) because it carries no
query semantics — all of which live in Engine / SQLTemplates — but a
user switching from the reference still has HTTP clients. This module
closes that last surface gap with a zero-dependency stdlib server:

    GET /                               self-description (routes + catalogs)
    GET /q/<db>/<qname>[/p1[/p2...]]    named template, positional params
    GET /dt/<db>/<qname>                output schema of a template
    GET /db/<db>/rel/<relation>         paged generic list (page/perpage/sortby)
    GET /run/<qname>[?limit=N]          any registered engine query (extension)

Parity notes: positional params arrive as strings exactly like the
reference's auto-quoted `?` substitution (`README.md:153,184`) —
binding is value-only (injection-safe), Spark coerces types at the
comparison. /dt upgrades the reference's regex field-name inference
to Catalyst's exact typed schema whenever the template is analyzable
without parameters, and falls back to the same SELECT-list parse the
reference uses (`examiner.js:82-160`) when it is not. Errors: 404 for
unknown names, 400 for bad/ambiguous input — the reference's codes
(`index.js:286-300`).

The G8 session STORE lives in `sessions.py` (a faithful
lib/session.js mirror — not to be confused with `session.py`, the
SparkSession helpers); this server stays stateless because nothing
in the analytic surface needs per-request state — a deployment
wiring auth would attach `SessionStore.resolve(token)` in do_GET the
way gateKeeper does (index.js:211-216). Still NOT in scope: the auth
flows themselves (G8's Salesforce login), reconnection (G10), CRUD
writes (G11 — NIY in the reference itself, `index.js:427-429`).

Scale note: this is a control-plane front door for the CATALOG, not a
data plane — results collect on the gateway like the reference's own
JSON responses. At 100 TB interactive routes serve pre-aggregated
rollups (q_rollup_serve) or paged lists; bulk results belong in sinks
(parquet/ORC/CSV writers), not HTTP bodies.
"""

from __future__ import annotations

import json
import re
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, unquote, urlparse

from pyspark.sql import DataFrame, SparkSession

from data_wrangler_spark.engine import Engine
from data_wrangler_spark.gateway import reference_catalog
from data_wrangler_spark.plans.templates import (
    AmbiguousTemplateError,
    MissingParameterError,
)

_SELECT_RE = re.compile(r"^\s*select\s+(.+?)\s+from\b.*$", re.I | re.S)

DEFAULT_RUN_LIMIT = 100


def parse_select_fields(sql: str) -> list[str]:
    """The reference's name-only field inference (`examineQuery`,
    `lib/examiner.js:139-160`): split the SELECT list on top-level
    commas (paren-aware, so `f(a, b) AS x` is one column —
    `parseColspec`, `examiner.js:82-137`), then take the alias (last
    whitespace token) or the name after the last dot. `select *`
    defeats inference, exactly as it does in the reference."""
    m = _SELECT_RE.match(sql)
    if not m:
        return []
    spec, fields, depth, cur = m.group(1), [], 0, []
    for ch in spec:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            fields.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        fields.append("".join(cur).strip())

    def name_of(col: str) -> str:
        tok = col.split()[-1] if col.split() else col
        return tok.rsplit(".", 1)[-1]

    return [name_of(c) for c in fields if c]


def _rows_json(df: DataFrame, limit: int | None = None) -> list[dict]:
    if limit is not None:
        df = df.limit(limit)
    return [r.asDict(recursive=True) for r in df.collect()]


class GatewayServer:
    """Threaded stdlib HTTP server over Engine + the reference
    catalog. Port 0 picks a free port (tests); `base_url` after
    start(). One Spark session serves all requests — the gateway is
    a thin routing shim, exactly like the reference."""

    def __init__(
        self,
        spark: SparkSession,
        sf_dir: str,
        host: str = "127.0.0.1",
        port: int = 0,
    ):
        self.engine = Engine(spark, sf_dir)
        self.templates = reference_catalog(spark, sf_dir)
        self.spark = spark
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet test logs
                pass

            def _send(self, code: int, payload) -> None:
                body = json.dumps(payload, default=str).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self) -> None:  # noqa: N802 (stdlib contract)
                try:
                    code, payload = outer.route(self.path)
                except Exception as exc:  # defensive 500, like index.js
                    code, payload = 500, {"error": str(exc)}
                self._send(code, payload)

        self.httpd = ThreadingHTTPServer((host, port), Handler)
        self._thread: threading.Thread | None = None
        self._run_lock = threading.Lock()

    # ── routing (pure function of the path — unit-testable) ──────
    def route(self, path: str) -> tuple[int, object]:
        url = urlparse(path)
        parts = [unquote(p) for p in url.path.split("/") if p]
        q = {k: v[-1] for k, v in parse_qs(url.query).items()}

        if not parts:
            return 200, self._describe_root()
        try:
            if parts[0] == "q" and len(parts) >= 3:
                return self._named_query(parts[1], parts[2], parts[3:], q)
            if parts[0] == "dt" and len(parts) == 3:
                return self._data_type(parts[1], parts[2])
            if parts[0] == "db" and len(parts) == 4 and parts[2] == "rel":
                return self._relation_list(parts[1], parts[3], q)
            if parts[0] == "run" and len(parts) == 2:
                return self._run_registered(parts[1], q)
        except AmbiguousTemplateError as exc:
            # must precede KeyError — AmbiguousTemplateError IS a
            # KeyError subclass, and ambiguity is a 400, not a 404
            return 400, {"error": str(exc)}
        except KeyError as exc:
            return 404, {"error": f"not found: {exc}"}
        except (MissingParameterError, ValueError) as exc:
            return 400, {"error": str(exc)}
        return 404, {"error": f"no route for {url.path}"}

    def _describe_root(self) -> dict:
        by_db: dict[str, list[str]] = {}
        for name in self.templates.names():
            db, _, bare = name.partition(".")
            by_db.setdefault(db, []).append(bare)
        return {
            "routes": [
                "/q/<db>/<qname>[/p1[/p2...]]",
                "/dt/<db>/<qname>",
                "/db/<db>/rel/<relation>?page=&perpage=&sortby=",
                "/run/<qname>?limit=",
            ],
            "databases": by_db,
            "registered_queries": len(self.engine.names()),
        }

    def _named_query(
        self, db: str, qname: str, params: list[str], q: dict
    ) -> tuple[int, object]:
        tpl = self.templates.get(f"{db}.{qname}")  # KeyError → 404
        named = {
            k: v
            for k, v in q.items()
            if k in tpl.named_params or k in tpl.identifier_params
        }
        limit = int(q["limit"]) if "limit" in q else None
        try:
            df = self.templates.run(self.spark, tpl.name, *params, **named)
            return 200, _rows_json(df, limit)
        except Exception as exc:
            # a param that cannot cast to the column type (ANSI mode
            # rejects '1 OR 1=1' meeting a BIGINT) is the reference's
            # 400-invalid-parameter case (examiner.js:70-80), not a
            # server error — and proof the value never became SQL.
            # Only INPUT-shaped Spark errors map to 400; an
            # AnalysisException for a vanished fixture path stays a
            # 500 (operational fault, not the client's parameter)
            msg = str(exc)
            input_shaped = any(
                k in msg
                for k in (
                    "CAST_INVALID_INPUT",
                    "ARITHMETIC_OVERFLOW",
                    "CANNOT_PARSE",
                    "NUMBER_FORMAT",
                    "INVALID_PARAMETER",
                )
            )
            if type(exc).__module__.startswith("pyspark") and input_shaped:
                return 400, {"error": f"invalid parameter: {exc.__class__.__name__}"}
            raise

    def _data_type(self, db: str, qname: str) -> tuple[int, object]:
        tpl = self.templates.get(f"{db}.{qname}")
        if tpl.n_positional == 0 and not tpl.named_params and not tpl.identifier_params:
            schema = self.templates.run(self.spark, tpl.name).schema
            fields = [
                {"name": f.name, "type": f.dataType.simpleString()}
                for f in schema.fields
            ]
            return 200, {"query": tpl.name, "fields": fields, "inferred": False}
        return 200, {
            "query": tpl.name,
            "fields": [{"name": n, "type": None} for n in parse_select_fields(tpl.sql)],
            "inferred": True,
        }

    def _relation_list(
        self, db: str, relation: str, q: dict
    ) -> tuple[int, object]:
        known = {n.partition(".")[0] for n in self.templates.names() if "." in n}
        if db not in known:
            raise KeyError(f"unknown database {db!r}")
        df = self.engine.list_records(
            relation,
            page=int(q.get("page", 1)),
            perpage=int(q.get("perpage", 20)),
            sortby=q.get("sortby"),
        )
        return 200, _rows_json(df)

    def _run_registered(self, qname: str, q: dict) -> tuple[int, object]:
        if qname not in self.engine.names():
            raise KeyError(qname)
        # SERIALIZED: release_cache pops the process-global pin list,
        # so releasing after one request while another request's
        # two-phase window still depends on its pinned
        # range-partitioned frame would silently corrupt results
        # (functions/distributed.py documents why the persist is
        # load-bearing). One /run at a time also serializes the
        # operators' check-then-write scratch builds, which carry no
        # locking of their own. /q, /dt and /db stay concurrent —
        # they touch neither pins nor scratch.
        with self._run_lock:
            try:
                df = self.engine.run(qname)
            except TypeError as exc:
                if "required positional argument" in str(exc):
                    # invoked without a required parameter — client
                    # input problem; other TypeErrors stay 500s
                    return 400, {"error": "missing required query parameter"}
                raise
            try:
                return 200, _rows_json(df, int(q.get("limit", DEFAULT_RUN_LIMIT)))
            finally:
                self.engine.release_cache()

    # ── lifecycle ─────────────────────────────────────────────────
    @property
    def base_url(self) -> str:
        host, port = self.httpd.server_address[:2]
        return f"http://{host}:{port}"

    def start(self) -> "GatewayServer":
        self._thread = threading.Thread(
            target=self.httpd.serve_forever, daemon=True
        )
        self._thread.start()
        return self

    def stop(self) -> None:
        self.engine.release_cache()
        self.httpd.shutdown()
        self.httpd.server_close()
        if self._thread:
            self._thread.join(timeout=5)
