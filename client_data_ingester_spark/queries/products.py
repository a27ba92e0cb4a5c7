"""Product list/search query (SURVEY §2.2 P3-P4, §2.6 O1-O3).

Replicates GET /products/list (B/web/api/products.py:34-75):
- mandatory tenant filter (client_id == caller's client);
- optional search q: case-insensitive substring over title/remote_id/sku;
- relevance rank: exact ci sku match first, sku-prefix match next, then
  alphabetical sku;
- offset/limit pagination (offset ≥ 0 default 0; 1 ≤ limit ≤ 50 default 5).

At scale the global sort never materializes: limit ≤ 50 keeps Spark on the
TakeOrderedAndProject path (top-k per partition + driver-side k-way merge),
and the tenant filter prunes at the manifest/partition level before the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MAX_PAGE_SIZE = 50


def _escape_like(q: str) -> str:
    return q.replace("\\", "\\\\").replace("%", r"\%").replace("_", r"\_")


def search_predicate(q: str) -> Column:
    pat = f"%{_escape_like(q)}%"
    return (
        F.col("title").ilike(pat)
        | F.col("remote_id").ilike(pat)
        | F.col("sku").ilike(pat)
    )


def rank_and_paginate(
    df: DataFrame, q: str | None, offset: int, limit: int
) -> DataFrame:
    if q:
        exact = F.when(F.lower(F.col("sku")) == q.lower(), 0).otherwise(1)
        prefix = F.when(F.col("sku").ilike(f"{_escape_like(q)}%"), 0).otherwise(1)
        ranked = df.filter(search_predicate(q)).orderBy(
            exact, prefix, F.col("sku")
        )
    else:
        ranked = df.orderBy("sku")
    return ranked.offset(offset).limit(limit)


def list_products(
    products: DataFrame,
    client_id: int,
    q: str | None = None,
    offset: int = 0,
    limit: int = 5,
) -> DataFrame:
    """``products`` is the current snapshot (SnapshotTable.read or any DF)."""
    if offset < 0:
        raise ValueError("offset must be >= 0")
    if not (1 <= limit <= MAX_PAGE_SIZE):
        raise ValueError(f"limit must be in [1, {MAX_PAGE_SIZE}]")
    scoped = products.filter(F.col("client_id") == F.lit(client_id))
    return rank_and_paginate(scoped, q, offset, limit)
