"""Pagination with the reference's exact clamp semantics.

Reference behavior being pinned (`/root/reference/index.js:431-492`):
- defaults: page=1, perpage=20, sortby = the table's id column
  (`index.js:434-436`);
- perpage clamped to [1, 1000] (`index.js:475-478`);
- offset = perpage * (page - 1) (`index.js:480`).

Spark upgrade: the reference inherited whatever ordering the backing
RDBMS happened to produce; Spark guarantees nothing without a total
order, so every sort appends the table's primary key as a unique
tiebreaker (SURVEY.md §7.3). `orderBy().offset().limit()` plans as a
global sort + CollectLimit; at cluster scale the sort is a range
shuffle and the limit prunes early (TakeOrderedAndProject for page 1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from data_wrangler_spark.catalog import pk_cols

PERPAGE_MIN = 1
PERPAGE_MAX = 1000  # reference clamp, index.js:475-478
DEFAULT_PERPAGE = 20  # index.js:434


def clamp_perpage(perpage: int) -> int:
    return max(PERPAGE_MIN, min(PERPAGE_MAX, int(perpage)))


def paginate(
    df: DataFrame,
    table: str,
    page: int = 1,
    perpage: int = DEFAULT_PERPAGE,
    sortby: str | None = None,
) -> DataFrame:
    limit = clamp_perpage(perpage)
    page = max(1, int(page))
    offset = limit * (page - 1)
    keys = pk_cols(table)
    sort_cols = ([sortby] if sortby and sortby not in keys else []) + keys
    out = df.orderBy(*sort_cols)
    if offset:
        out = out.offset(offset)
    return out.limit(limit)
