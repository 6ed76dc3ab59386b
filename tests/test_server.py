"""TRUE-HTTP tests for the gateway serving layer: a live threaded
server, urllib clients, the reference's route shapes end to end."""

import json
import urllib.error
import urllib.request

import pytest

from data_wrangler_spark.server import GatewayServer, parse_select_fields


@pytest.fixture(scope="module")
def server(spark, sf_dir):
    srv = GatewayServer(spark, sf_dir).start()
    yield srv
    srv.stop()


def get(srv, path):
    with urllib.request.urlopen(srv.base_url + path) as resp:
        return resp.status, json.loads(resp.read())


def get_err(srv, path):
    try:
        with urllib.request.urlopen(srv.base_url + path) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_root_self_description(server):
    code, body = get(server, "/")
    assert code == 200
    assert "invoicesByDate" in body["databases"]["test"]
    assert "accounts" in body["databases"]["salesforce"]
    assert body["registered_queries"] > 200


def test_named_query_with_positional_param(server, spark, sf_dir):
    from data_wrangler_spark.catalog import load_table

    key = load_table(spark, sf_dir, "lineitem").agg(
        {"l_orderkey": "min"}
    ).collect()[0][0]
    code, rows = get(server, f"/q/test/lineItems/{key}")
    assert code == 200 and rows
    assert all(r["l_orderkey"] == key for r in rows)
    expect = load_table(spark, sf_dir, "lineitem").filter(
        f"l_orderkey = {key}"
    ).count()
    assert len(rows) == expect


def test_named_query_limit_param(server):
    code, rows = get(server, "/q/salesforce/accounts?limit=3")
    assert code == 200 and len(rows) == 3


def test_datatype_exact_when_analyzable(server):
    code, body = get(server, "/dt/salesforce/accounts")
    assert code == 200 and body["inferred"] is False
    names = {f["name"] for f in body["fields"]}
    assert "id" in names or len(names) >= 2
    assert all(f["type"] for f in body["fields"])


def test_datatype_regex_fallback_for_parameterized(server):
    code, body = get(server, "/dt/test/lineItems")
    assert code == 200
    # parameterized template → reference-style name-only inference
    assert body["inferred"] is True or all("name" in f for f in body["fields"])


def test_relation_list_paged_sorted(server):
    code, rows = get(server, "/db/test/rel/customer?page=1&perpage=5&sortby=c_name")
    assert code == 200 and len(rows) == 5
    names = [r["c_name"] for r in rows]
    assert names == sorted(names)
    code2, rows2 = get(server, "/db/test/rel/customer?page=2&perpage=5&sortby=c_name")
    assert code2 == 200 and rows2[0]["c_name"] >= names[-1]


def test_run_registered_query_capped(server):
    code, rows = get(server, "/run/q_inner_join?limit=7")
    assert code == 200 and len(rows) == 7


def test_unknown_query_404(server):
    code, body = get_err(server, "/q/test/noSuchQuery/1")
    assert code == 404 and "error" in body


def test_unknown_relation_rejected(server):
    code, body = get_err(server, "/db/test/rel/not_a_table")
    assert code in (400, 404) and "error" in body


def test_injection_via_positional_param_is_inert(server):
    """The reference regex-blocks comment/quote injection
    (examiner.js:78-80); here binding is value-only so hostile input
    is just a non-matching value, never SQL."""
    code, body = get_err(server, "/q/test/lineItems/1%20OR%201=1")
    # value-only binding: hostile input is a malformed VALUE (400),
    # never SQL — and a plain non-matching value yields empty rows
    assert code == 400 and "error" in body
    code2, rows = get(server, "/q/test/lineItems/999999999")
    assert code2 == 200 and rows == []


def test_parse_select_fields_matches_reference_inference():
    assert parse_select_fields(
        "SELECT a.x, f(b, c) AS y, t.z FROM t JOIN u ON 1=1"
    ) == ["x", "y", "z"]
    assert parse_select_fields("select * from t") == ["*"]
    assert parse_select_fields("DESCRIBE TABLE t") == []


def test_concurrent_requests(server):
    """The threaded server must handle parallel requests against one
    Spark session (Spark schedules concurrent jobs from threads)."""
    import concurrent.futures

    paths = ["/run/q_topk?limit=5", "/db/test/rel/customer?perpage=3",
             "/q/salesforce/accounts?limit=2", "/dt/salesforce/accounts"] * 2
    with concurrent.futures.ThreadPoolExecutor(max_workers=8) as ex:
        results = list(ex.map(lambda p: get(server, p), paths))
    assert all(code == 200 for code, _ in results)


def test_relation_route_validates_db_segment(server):
    code, body = get_err(server, "/db/nosuchdb/rel/customer")
    assert code == 404 and "error" in body
