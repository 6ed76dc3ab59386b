"""G8 session-store parity with the reference's lib/session.js
semantics (falsy-collapsing get vs presence-checking has; unsaved
fresh sessions for unknown tokens)."""

from data_wrangler_spark.sessions import Session, SessionStore


def test_get_collapses_falsy_but_has_sees_presence():
    s = Session("tok")
    s.put("zero", 0).put("empty", "").put("none", None).put("real", "x")
    # session.js `vars[key] || null`
    assert s.get("zero") is None
    assert s.get("empty") is None
    assert s.get("none") is None
    assert s.get("missing") is None
    assert s.get("real") == "x"
    # session.js `vars[key] !== undefined`
    assert s.has("zero") and s.has("empty") and s.has("none")
    assert not s.has("missing")
    assert sorted(s.keys()) == ["empty", "none", "real", "zero"]


def test_get_keeps_empty_containers_js_truthy():
    """ADVICE r4 regression: JS `[] || null` and `{} || null` keep the
    container (objects are truthy in JS) — Python's `not val` must
    not eat them. NaN and False, JS-falsy, still collapse."""
    s = Session("tok")
    s.put("list", []).put("dict", {}).put("false", False).put("nan", float("nan"))
    assert s.get("list") == []
    assert s.get("dict") == {}
    assert s.get("false") is None
    assert s.get("nan") is None
    # 0.0 is JS-falsy too (0 == 0.0 in JS — one number type)
    s.put("fzero", 0.0)
    assert s.get("fzero") is None


def test_put_delete_chain_and_id():
    s = Session("t1")
    assert s.put("a", 1).delete("a").put("b", 2) is s
    assert not s.has("a") and s.get("b") == 2
    assert s.id() == "t1"


def test_store_reuses_only_saved_sessions():
    store = SessionStore()
    # unknown token → fresh session every resolve, never retained
    a = store.resolve("tok")
    a.put("k", "v")
    b = store.resolve("tok")
    assert b is not a and not b.has("k")
    assert len(store) == 0
    # the auth flow saves explicitly; then gateKeeper reuses it
    store.save(a)
    assert store.resolve("tok") is a
    assert store.resolve("tok").get("k") == "v"
    store.drop("tok")
    assert not store.resolve("tok").has("k")


def test_save_requires_token():
    import pytest

    store = SessionStore()
    with pytest.raises(ValueError):
        store.save(Session(None))
