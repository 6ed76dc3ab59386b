"""External REST ingestion as a Spark Python DataSource (G9).

The reference proxies parameterized REST endpoints verbatim —
`/ffi/<name>` routes with handlebars path templates, response piped
through untouched (`/root/reference/index.js:327-366`). That design
makes the gateway a single-threaded I/O chokepoint: one Node process
streams every byte.

The Spark-native re-expression is a custom `DataSource`
(pyspark.sql.datasource, Spark ≥4.0): each REST *page* becomes an
input partition, so a 1000-executor cluster fetches 1000 pages
concurrently, and results land directly in the scan — filterable,
joinable, and (via `pushFilters`, Spark ≥4.1) *prunable*: predicates
on the paging key skip whole pages before any request is issued, the
source-side analog of parquet partition pruning.

Transport: `fetch_page` issues a REAL urllib GET for http(s)
endpoints — tests/test_sources.py drives it against an in-process
`http.server` and asserts page pruning on the server's access log —
and falls back to a deterministic in-process computation for the
`/ffi/...` pseudo-endpoints so the DuckDB oracle can replay the
payload arithmetic. Schema, options, partition planning, filter
pushdown, and the per-partition iterator protocol are identical on
both paths.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)
from pyspark.sql.types import StructType

REST_SCHEMA = "id bigint, name string, value double"


def fetch_page(
    endpoint: str, page: int, perpage: int, style: str = "query"
) -> list[dict]:
    """`GET {endpoint}?page={page}&perpage={perpage}` (style="query")
    or `GET {endpoint}/{page}/{perpage}` (style="path" — the paging
    convention of handlebars path templates, so the source can scan
    THROUGH the gateway's /ffi relay whose routes expand path $vars
    only, exactly like the reference's makeRESTroute,
    `/root/reference/index.js:327-366`).

    http(s) endpoints hit the network for real (each executor's
    partition fetches its own page — the whole point of page-per-
    partition planning). Non-URL endpoints (`/ffi/...`) compute the
    records a paged JSON API would return, with arithmetic derivable
    in any SQL engine so the DuckDB oracle can replay it over
    `range()`: id is the global row number, value =
    ((id*37) mod 1000) / 4 — exact in binary floating point.
    """
    if endpoint.startswith(("http://", "https://")):
        import json
        import time
        import urllib.error
        import urllib.request

        url = (
            f"{endpoint}/{page}/{perpage}"
            if style == "path"
            else f"{endpoint}?page={page}&perpage={perpage}"
        )
        # Bounded retry with backoff: a page fetch IS a Spark task, so
        # without this, one transient 5xx/timeout fails the task and —
        # after Spark's task retries re-run the whole partition — the
        # job. 4xx responses don't retry (they won't heal).
        last_err: Exception | None = None
        for attempt in range(4):
            if attempt:
                time.sleep(0.5 * (2 ** (attempt - 1)))
            try:
                with urllib.request.urlopen(url, timeout=30) as resp:
                    body = resp.read().decode("utf-8")
                try:
                    return json.loads(body)
                except ValueError as e:
                    raise ValueError(
                        f"restapi: non-JSON response from {url}: "
                        f"{body[:200]!r}"
                    ) from e
            except urllib.error.HTTPError as e:
                last_err = RuntimeError(
                    f"restapi: GET {url} failed with HTTP {e.code} {e.reason}"
                )
                if e.code < 500:  # client error — retrying won't help
                    raise last_err from e
            except (urllib.error.URLError, TimeoutError, OSError) as e:
                last_err = RuntimeError(f"restapi: GET {url} failed: {e}")
        raise last_err
    lo = page * perpage
    return [
        {"id": i, "name": f"item_{i}", "value": float((i * 37) % 1000) / 4.0}
        for i in range(lo, lo + perpage)
    ]


@dataclass
class PagePartition(InputPartition):
    page: int


class RestApiReader(DataSourceReader):
    """One partition per REST page; id-range predicates prune pages."""

    def __init__(self, options: dict) -> None:
        self.endpoint = options.get("endpoint", "/ffi/fake")
        self.pages = int(options.get("pages", 8))
        self.perpage = int(options.get("perpage", 250))
        self.pagestyle = options.get("pagestyle", "query")
        # [id_lo, id_hi) bounds tightened by pushed filters
        self.id_lo = 0
        self.id_hi = self.pages * self.perpage

    def pushFilters(self, filters: list[Filter]) -> Sequence[Filter]:
        """Tighten the page range from id predicates. Every filter is
        also returned as residual (Spark re-applies it), so pushdown
        is purely an I/O optimization — it can never change results,
        only skip requests."""
        for f in filters:
            v = getattr(f, "value", None)
            if getattr(f, "attribute", None) == ("id",) and isinstance(v, int):
                if isinstance(f, (GreaterThanOrEqual, EqualTo)):
                    self.id_lo = max(self.id_lo, v)
                if isinstance(f, GreaterThan):
                    self.id_lo = max(self.id_lo, v + 1)
                if isinstance(f, (LessThanOrEqual, EqualTo)):
                    self.id_hi = min(self.id_hi, v + 1)
                if isinstance(f, LessThan):
                    self.id_hi = min(self.id_hi, v)
        return filters

    def partitions(self) -> Sequence[PagePartition]:
        return [
            PagePartition(p)
            for p in range(self.pages)
            if p * self.perpage < self.id_hi and (p + 1) * self.perpage > self.id_lo
        ]

    def read(self, partition: PagePartition) -> Iterator[tuple]:
        for rec in fetch_page(
            self.endpoint, partition.page, self.perpage, self.pagestyle
        ):
            yield (rec["id"], rec["name"], rec["value"])


class RestApiDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "restapi"

    def schema(self) -> str | StructType:
        return REST_SCHEMA

    def reader(self, schema: StructType) -> RestApiReader:
        return RestApiReader(self.options)
