"""Per-token session store — the reference's G8 surface, faithfully.

The reference keeps an in-memory token → key/value session
(`/root/reference/lib/session.js:1-45`), attached per request by
`gateKeeper` (`index.js:211-216`: a recognized token reuses the
stored session, anything else gets a fresh unsaved one), and used by
the Salesforce plugin to stash auth state
(`plugins/salesforce.js:75`). Semantics preserved exactly:

- ``get`` returns None for a missing key (session.js `|| null`);
- ``has`` is true for a key explicitly set to None — present-but-
  falsy keys exist (session.js checks ``!== undefined``, and its
  ``get`` collapses falsy values to null while ``has`` does not);
- ``put``/``delete`` return the session for chaining;
- the store only RETAINS sessions that were explicitly saved
  (``sessions[token]`` is populated by the auth flow, not by
  gateKeeper — an unknown token gets a fresh, unsaved session every
  request).

This carries no query semantics (why SURVEY §7.4 scoped it out of
the analytic engine) — it exists so the serving layer's surface is
complete for a reference user. No TTL, like the reference (its
sessions live until process restart); a production deployment puts
an expiry sweep here.
"""

from __future__ import annotations

from typing import Any

_MISSING = object()


class Session:
    """Mirror of session.js's closure object."""

    def __init__(self, token: str | None):
        self._token = token
        self._vars: dict[str, Any] = {}

    def id(self) -> str | None:
        return self._token

    def get(self, key: str) -> Any:
        # session.js: `vars[key] || null` — JS-falsy values collapse.
        # JS falsiness, not Python's: 0, '', false, null, NaN are
        # falsy, but empty containers [] / {} are TRUTHY in JS and
        # must come back intact (a bare `not val` would eat them).
        val = self._vars.get(key, _MISSING)
        if val is _MISSING or val is None or val is False:
            return None
        if isinstance(val, (int, float)) and (val != val or val == 0):
            return None  # 0, 0.0, NaN
        if isinstance(val, str) and val == "":
            return None
        return val

    def put(self, key: str, val: Any) -> "Session":
        self._vars[key] = val
        return self

    def delete(self, key: str) -> "Session":
        self._vars.pop(key, None)
        return self

    def has(self, key: str) -> bool:
        # session.js: `vars[key] !== undefined` — present-but-falsy
        # keys ARE present (asymmetric with get, faithfully)
        return key in self._vars

    def keys(self) -> list[str]:
        return list(self._vars)


class SessionStore:
    """The gateway's ``sessions`` map + gateKeeper resolution."""

    def __init__(self) -> None:
        self._sessions: dict[str, Session] = {}

    def resolve(self, token: str | None) -> Session:
        """gateKeeper (index.js:211-216): a saved token's session is
        reused; any other token (or none) gets a FRESH session that
        is NOT retained — saving is the auth flow's explicit act."""
        if token is not None and token in self._sessions:
            return self._sessions[token]
        return Session(token)

    def save(self, session: Session) -> Session:
        """The auth flow's `sessions[token] = ...` — only now does
        the store retain it across requests."""
        token = session.id()
        if token is None:
            raise ValueError("cannot save a session without a token")
        self._sessions[token] = session
        return session

    def drop(self, token: str) -> None:
        self._sessions.pop(token, None)

    def __len__(self) -> int:
        return len(self._sessions)
