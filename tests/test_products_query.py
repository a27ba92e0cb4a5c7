"""List/search query contracts (B/web/api/products.py:34-75 + list tests in
B/tests/web/api/test_products.py:97-141)."""

import pytest
from pyspark.sql import functions as F

from client_data_ingester_spark.queries.products import list_products


@pytest.fixture(scope="module")
def products(spark):
    rows = [
        (1, 1, "ABC-1", "r1", "Widget Alpha", True),
        (2, 1, "ABC-2", "r2", "Widget Beta", True),
        (3, 1, "XYZ-9", "abc", "Gadget", True),
        (4, 1, "abc-1x", "r4", "Other", True),
        (5, 2, "ABC-1", "r5", "Tenant2 thing", True),
    ]
    return spark.createDataFrame(
        rows, "id long, client_id int, sku string, remote_id string, title string, active boolean"
    )


def skus(df):
    return [r["sku"] for r in df.collect()]


def test_tenant_scoping(products):
    assert skus(list_products(products, 2, limit=50)) == ["ABC-1"]


def test_default_sort_and_pagination(products):
    assert skus(list_products(products, 1, limit=2)) == ["ABC-1", "ABC-2"]
    assert skus(list_products(products, 1, offset=2, limit=2)) == ["XYZ-9", "abc-1x"]


def test_search_rank_exact_prefix_alpha(products):
    # exact ci match first, then prefix matches, then alphabetical;
    # 'abc' also matches XYZ-9 via remote_id substring
    got = skus(list_products(products, 1, q="ABC-1", limit=50))
    assert got[0] == "ABC-1"
    assert got[1] == "abc-1x"  # prefix (ci) before plain substring matches
    got_sub = skus(list_products(products, 1, q="abc", limit=50))
    assert set(got_sub) == {"ABC-1", "ABC-2", "abc-1x", "XYZ-9"}
    assert got_sub[-1] == "XYZ-9"  # non-prefix match sorts last group


def test_limit_bounds(products):
    with pytest.raises(ValueError):
        list_products(products, 1, limit=0)
    with pytest.raises(ValueError):
        list_products(products, 1, limit=51)
    with pytest.raises(ValueError):
        list_products(products, 1, offset=-1)


def test_like_escaping(products, spark):
    tricky = spark.createDataFrame(
        [(1, 1, "A%B", "r", "t", True), (2, 1, "AxB", "r", "t", True)],
        "id long, client_id int, sku string, remote_id string, title string, active boolean",
    )
    got = skus(list_products(tricky, 1, q="A%B", limit=50))
    assert got == ["A%B"]  # % treated literally, not as wildcard
