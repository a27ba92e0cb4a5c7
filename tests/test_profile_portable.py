"""Portable-HLL profile mode: cross-engine determinism on edge cases the
scored lineitem query can't reach — all-null columns (NULL ndv state),
negative numerics through the DECIMAL(30,6) hash canonicalization, and
duplicate-heavy columns (registers must fold, not count rows). The oracle
generator runs against an in-process DuckDB on the same rows."""

import duckdb
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from client_data_ingester_spark.operators.profile import (
    portable_profile_oracle_sql,
    profile_table,
)

COLS = [("k", "num"), ("v", "num"), ("s", "str"), ("t", "ts"), ("n", "num")]

SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("v", T.DoubleType()),
        T.StructField("s", T.StringType()),
        T.StructField("t", T.TimestampType()),
        T.StructField("n", T.DoubleType()),  # all null
    ]
)


@pytest.fixture(scope="module")
def frames(spark, tmp_path_factory):
    import datetime

    rows = []
    for i in range(300):
        rows.append(
            (
                i % 37,  # duplicate-heavy
                (i - 150) * 1.5,  # negatives
                f"s{i % 11}" if i % 13 else None,  # some nulls
                datetime.datetime(2024, 1, 1 + i % 28, i % 24, 0, 0),
                None,  # all-null column
            )
        )
    # canon-overflow values: |x| >= 1e24 and inf TRY_CAST to NULL in both
    # engines — excluded from the ndv sketch, still counted in
    # n_rows/min/max
    rows.append((998, 1e30, "big", datetime.datetime(2024, 2, 1), None))
    rows.append(
        (999, float("inf"), "inf", datetime.datetime(2024, 2, 2), None)
    )
    df = spark.createDataFrame(rows, SCHEMA)
    path = str(tmp_path_factory.mktemp("pp") / "t.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(path)
    return spark.read.parquet(path), path


def test_portable_profile_matches_duckdb_oracle(spark, frames):
    df, path = frames
    got = {
        r["col_name"]: r for r in profile_table(
            df, COLS, ndv_mode="portable"
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW t AS SELECT * FROM read_parquet('{path}/*.parquet')"
    )
    want = {
        r[0]: r
        for r in con.execute(portable_profile_oracle_sql("t", COLS)).fetchall()
    }
    assert set(got) == set(want) == {c for c, _ in COLS}
    for c, _ in COLS:
        g, w = got[c], want[c]
        assert (g["n_rows"], g["n_nulls"], g["ndv"]) == (w[1], w[2], w[3]), c
        assert (g["min_num"], g["max_num"]) == (w[4], w[5]), c
        assert (g["min_str"], g["max_str"]) == (w[6], w[7]), c


def test_portable_profile_handles_non_identifier_column_names(spark, tmp_path):
    """Column names are data: spaces/quotes must survive the generated
    SQL on both engines (backticks Spark-side, double quotes DuckDB-side)."""
    path = str(tmp_path / "odd.parquet")
    spark.createDataFrame(
        [(1.5, "a"), (2.5, "b"), (2.5, None)],
        "`order key` double, `o'brien` string",
    ).coalesce(1).write.mode("overwrite").parquet(path)
    df = spark.read.parquet(path)
    cols = [("order key", "num"), ("o'brien", "str")]
    got = {
        r["col_name"]: r
        for r in profile_table(df, cols, ndv_mode="portable").collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW t AS SELECT * FROM read_parquet('{path}/*.parquet')"
    )
    want = {
        r[0]: r
        for r in con.execute(portable_profile_oracle_sql("t", cols)).fetchall()
    }
    for c, _ in cols:
        g, w = got[c], want[c]
        assert (g["n_rows"], g["n_nulls"], g["ndv"]) == (w[1], w[2], w[3]), c
        assert (g["min_num"], g["max_num"], g["min_str"], g["max_str"]) == (
            w[4], w[5], w[6], w[7],
        ), c


def test_exact_mode_handles_quoted_column_names(spark):
    """The stack() literal must escape quotes/backslashes too — exact and
    hllpp modes crash otherwise on the same names portable now accepts."""
    df = spark.createDataFrame(
        [(1.5, "a"), (2.5, "b")], "`order key` double, `o'brien` string"
    )
    cols = [("order key", "num"), ("o'brien", "str")]
    for mode in ("exact", "hllpp"):
        got = {
            r["col_name"]: r
            for r in profile_table(df, cols, ndv_mode=mode).collect()
        }
        assert set(got) == {"order key", "o'brien"}, mode
        assert got["order key"]["ndv"] == 2


def test_portable_profile_empty_table_matches_oracle(spark, tmp_path):
    """An empty drop (exactly what a pre-ingest profiler may see) must
    still emit one row per column, matching the ungrouped-aggregate
    oracle: n_rows 0, everything else NULL."""
    path = str(tmp_path / "empty.parquet")
    spark.createDataFrame([], SCHEMA).write.mode("overwrite").parquet(path)
    df = spark.read.parquet(path)
    got = sorted(
        map(tuple, profile_table(df, COLS, ndv_mode="portable").collect())
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW t AS SELECT * FROM read_parquet('{path}/*.parquet')"
    )
    want = sorted(
        tuple(r)
        for r in con.execute(portable_profile_oracle_sql("t", COLS)).fetchall()
    )
    assert got == want
    assert len(got) == len(COLS)
    for row in got:
        assert row[1] == 0  # n_rows


def test_portable_ndv_tracks_exact_within_sketch_error(spark, frames):
    df, _ = frames
    portable = {
        r["col_name"]: r["ndv"]
        for r in profile_table(df, COLS, ndv_mode="portable").collect()
    }
    exact = {
        r["col_name"]: r["ndv"]
        for r in profile_table(df, COLS, ndv_mode="exact").collect()
    }
    assert portable["n"] is None  # all-null: no register state, no claim
    assert exact["n"] == 0
    for c in ("k", "v", "s", "t"):
        # m=64 registers: ±~13% standard error; allow 3 sigma
        assert abs(portable[c] - exact[c]) <= max(3, 0.4 * exact[c]), (
            c,
            portable[c],
            exact[c],
        )
