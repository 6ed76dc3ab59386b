"""Dynamic operator-plugin loading — the reference's extension surface.

The reference extends its gateway by loading plugin modules at config
time: `require('./plugins/' + pname)` (`/root/reference/index.js:
140-157`), each plugin exporting `auth` + `routes`
(`/root/reference/plugins/salesforce.js:11-14`). The Spark-native
mirror loads a Python module — by dotted import path or by .py file
path — and hands it the engine's `register` decorator so it can add
named queries (with oracles, tags, defaults) to the same registry the
built-in operators use. A plugin's queries are first-class: they show
up in `Engine.names()`, `__spark_entry__.queries()`, and the
correctness harness like any other operator.

Auth — the other half of the reference's plugin contract
(`plugins/salesforce.js:11-14` exports `auth(info, fn)`) — is a
registry of per-service callables here: `register_auth_plugin(name,
fn)` with `fn(auth_info) -> {"ok": bool, "info"|"error": ...}`, the
callback's rval shape made a return value. `/auth` (server.py)
resolves `plugins[service].auth` through this registry exactly like
`index.js:610-630`. A loaded plugin module may also expose
`auth(info) -> dict` plus `SERVICE_NAME` to self-register. No live
Salesforce exists in this environment, so the shipped contract is the
interface + tests with a fake service — the reference's retry-with-
security-token dance (salesforce.js:19-42) belongs inside a concrete
plugin's `auth`.
"""

from __future__ import annotations

import importlib
import importlib.util
import os
import sys
import warnings
from typing import Callable

from data_wrangler_spark.registry import REGISTRY, register

# service name → auth callable; the reference's `plugins` map
# (`index.js:140-157`) restricted to its auth surface
AUTH_PLUGINS: dict[str, Callable[[dict], dict]] = {}


def register_auth_plugin(name: str, fn: Callable[[dict], dict]) -> None:
    """Register `auth(info) -> {"ok": bool, ...}` under a service
    name — what `config.json`'s plugins block does at boot."""
    if not callable(fn):
        raise PluginError(f"auth plugin {name!r} is not callable")
    prev = AUTH_PLUGINS.get(name)
    if prev is not None and prev is not fn:
        # two plugin modules sharing a basename/SERVICE_NAME would
        # silently change which credentials /auth accepts (ADVICE r5)
        warnings.warn(
            f"auth plugin {name!r} replaces an existing registration "
            f"({getattr(prev, '__module__', '?')} -> "
            f"{getattr(fn, '__module__', '?')})",
            stacklevel=2,
        )
    AUTH_PLUGINS[name] = fn


class PluginError(ValueError):
    """Module not loadable, or it lacks the register_queries hook."""


def make_salesforce_auth(login: Callable[[str, str], object]):
    """Build a Salesforce-shaped `auth(info) -> dict` implementing the
    reference's security-token retry dance (`plugins/salesforce.js:
    19-47`): attempt `login(username, password)`; on failure, retry
    EXACTLY ONCE with the security token CONCATENATED onto the
    password (`info.password + info.securityToken`, salesforce.js:28)
    — Salesforce's contract for logins from outside a trusted IP
    range; on second failure return `{ok: false, error}` verbatim
    (salesforce.js:31-33). A successful attempt attaches the live
    connection under `info["conn"]` and returns `{ok: true, info}`
    (salesforce.js:35-37,44-46).

    `login(username, password)` is injected because no live
    Salesforce exists in this environment: production wires a real
    client; tests wire a fake that fails the first attempt. Raising
    or returning a falsy value both count as login failure (jsforce
    signals via the callback's `err`)."""

    def _attempt(username: str, password: str):
        try:
            conn = login(username, password)
        except Exception as exc:
            return None, exc
        # only None (the callback's missing-result case) is failure:
        # jsforce signals errors via `err`, and JS falsiness differs
        # from Python's ([]/{}/empty clients are TRUTHY in JS — the
        # sessions.py parity rule), so a falsy-but-present connection
        # object must count as success
        return (conn, None) if conn is not None else (None, "login failed")

    def auth(info: dict) -> dict:
        conn, err = _attempt(info.get("username"), info.get("password"))
        if err is not None:
            conn, err = _attempt(
                info.get("username"),
                str(info.get("password") or "")
                + str(info.get("securityToken") or ""),
            )
            if err is not None:
                return {"ok": False, "error": str(err)}
        out = dict(info)
        out["conn"] = conn
        return {"ok": True, "info": out}

    return auth


def load_plugin(module_or_path: str) -> list[str]:
    """Load one plugin and return the query names it registered.

    ``module_or_path`` is a dotted module path (``my_pkg.my_plugin``)
    or a filesystem path to a ``.py`` file. The module must expose
    ``register_queries(register)`` taking the engine's register
    decorator. Name collisions with existing queries raise (the
    registry already enforces uniqueness), so a plugin cannot
    silently shadow a built-in operator.
    """
    if module_or_path.endswith(".py") and os.path.exists(module_or_path):
        mod_name = f"dws_plugin_{os.path.splitext(os.path.basename(module_or_path))[0]}"
        spec = importlib.util.spec_from_file_location(mod_name, module_or_path)
        if spec is None or spec.loader is None:
            raise PluginError(f"cannot load plugin file: {module_or_path!r}")
        mod = importlib.util.module_from_spec(spec)
        sys.modules[mod_name] = mod
        spec.loader.exec_module(mod)
    else:
        try:
            mod = importlib.import_module(module_or_path)
        except ImportError as e:
            raise PluginError(f"cannot import plugin {module_or_path!r}: {e}") from e

    hook = getattr(mod, "register_queries", None)
    if not callable(hook):
        raise PluginError(
            f"plugin {module_or_path!r} has no register_queries(register) hook"
        )
    before = set(REGISTRY)
    hook(register)
    # optional auth surface (the reference plugin contract's other
    # export): module-level auth(info) -> dict, named by SERVICE_NAME
    # or the module's basename
    auth_fn = getattr(mod, "auth", None)
    if callable(auth_fn):
        service = getattr(mod, "SERVICE_NAME", mod.__name__.rsplit(".", 1)[-1])
        register_auth_plugin(str(service).removeprefix("dws_plugin_"), auth_fn)
    return sorted(set(REGISTRY) - before)
