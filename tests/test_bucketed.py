"""Bucketed tables ([EXT], tables/bucketed.py): the write-once-shuffle-never
contract — a fact-fact equi-join on the bucket key must have NO Exchange on
either side, and results must match the plain shuffled join."""

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from client_data_ingester_spark.tables.bucketed import cojoin, write_bucketed

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def bucketdb(spark, tmp_path):
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bucketdb LOCATION '{tmp_path}/wh'")
    yield "bucketdb"
    spark.sql("DROP DATABASE bucketdb CASCADE")


def _tree(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue().split("== Physical Plan ==")[1].split("\n\n")[0]


def test_bucketed_join_has_no_exchange(spark, bucketdb):
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF}/lineitem.parquet")
    write_bucketed(
        orders, f"{bucketdb}.orders_b", 8, ["o_orderkey"], ["o_orderkey"]
    )
    write_bucketed(
        lineitem,
        f"{bucketdb}.lineitem_b",
        8,
        ["l_orderkey"],
        ["l_orderkey"],
    )
    # different key names on each side → explicit expression join (cojoin
    # covers the same-named-key case)
    joined = (
        spark.table(f"{bucketdb}.lineitem_b")
        .hint("merge")
        .join(
            spark.table(f"{bucketdb}.orders_b"),
            F.col("l_orderkey") == F.col("o_orderkey"),
            "inner",
        )
        .select("l_orderkey", "o_orderdate", "l_quantity")
    )
    tree = _tree(joined)
    assert "SortMergeJoin" in tree
    # the whole point: neither side shuffles — the write-time bucketing IS
    # the exchange, paid once
    assert "Exchange" not in tree

    # and the answer is the same as the plain (shuffled) join
    plain = (
        lineitem.join(
            orders, F.col("l_orderkey") == F.col("o_orderkey"), "inner"
        )
        .select("l_orderkey", "o_orderdate", "l_quantity")
    )
    assert joined.count() == plain.count()


def test_bucketed_aggregation_skips_shuffle(spark, bucketdb):
    """groupBy on the bucket key also rides the bucketing: no Exchange
    before the final aggregate."""
    lineitem = spark.read.parquet(f"{SF}/lineitem.parquet")
    write_bucketed(
        lineitem,
        f"{bucketdb}.lineitem_agg_b",
        8,
        ["l_orderkey"],
        ["l_orderkey"],
    )
    agg = (
        spark.table(f"{bucketdb}.lineitem_agg_b")
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    assert "Exchange" not in _tree(agg)


def test_mismatched_bucket_counts_still_correct(spark, bucketdb):
    """Different bucket counts can't co-join shuffle-free, but must still
    return correct results (Spark shuffles one side)."""
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    write_bucketed(orders, f"{bucketdb}.o8", 8, ["o_orderkey"])
    write_bucketed(orders, f"{bucketdb}.o4", 4, ["o_orderkey"])
    j = cojoin(spark, f"{bucketdb}.o8", f"{bucketdb}.o4", ["o_orderkey"])
    assert j.count() == orders.count()
