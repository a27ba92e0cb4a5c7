"""Unit tests for transformer expressions — the null/garbage matrix from
B/ingestion/transformers.py:19-68 (SURVEY §7 watch-list #2)."""

from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from client_data_ingester_spark.ingestion.transformers import get_transformer


def _apply(spark, tid, values):
    t = get_transformer(tid)
    df = spark.createDataFrame([(v,) for v in values], "v string")
    rows = df.select(
        t.expr(F.col("v")).alias("out"), t.invalid(F.col("v")).alias("bad")
    ).collect()
    return [(r["out"], r["bad"]) for r in rows]


def test_decimal_happy_path(spark):
    out = _apply(spark, "decimal", ["1234.56", "$1,234.56", " £99.90 ", "0"])
    assert [o for o, _ in out] == [
        Decimal("1234.56"),
        Decimal("1234.56"),
        Decimal("99.90"),
        Decimal("0.00"),
    ]
    assert not any(bad for _, bad in out)


def test_decimal_garbage_flagged_invalid(spark):
    # reference RAISES on garbage (InvalidOperation) → whole-file abort
    out = _apply(spark, "decimal", ["abc", "", "$,"])
    assert all(o is None and bad for o, bad in out)


def test_decimal_interior_whitespace_flagged_invalid(spark):
    # Reference parity: Decimal('1 234.56') raises (only $ £ , are stripped
    # and whitespace trimmed at the ends) — interior whitespace must trip the
    # invalid flag, never silently ingest as 1234.56.
    out = _apply(spark, "decimal", ["1 234.56", "$1 234.56"])
    assert all(o is None and bad for o, bad in out)


def test_decimal_null_stays_null_not_invalid(spark):
    out = _apply(spark, "decimal", [None])
    assert out == [(None, False)]


def test_text_strips(spark):
    out = _apply(spark, "text", ["  hello ", "", None])
    assert [o for o, _ in out] == ["hello", "", None]
    assert not any(bad for _, bad in out)


def test_integer_semantics(spark):
    # int(float(s)) truncation; garbage → 0 silently; null stays null
    out = _apply(
        spark, "integer", ["42", " 12.7 ", "-3.9", "abc", "", None, "1e3"]
    )
    assert [o for o, _ in out] == [42, 12, -3, 0, 0, None, 1000]
    assert not any(bad for _, bad in out)


def test_integer_nan_is_zero(spark):
    out = _apply(spark, "integer", ["nan"])
    assert out[0][0] == 0


@pytest.mark.parametrize(
    "v,expected",
    [
        ("yes", True), ("TRUE", True), (" 1 ", True),
        ("No", False), ("false", False), ("0", False),
    ],
)
def test_boolean_tokens(spark, v, expected):
    out = _apply(spark, "boolean", [v])
    assert out == [(expected, False)]


def test_boolean_invalid_flagged(spark):
    # reference raises TransformerError → whole-file abort
    out = _apply(spark, "boolean", ["maybe", "", "2"])
    assert all(o is None and bad for o, bad in out)


def test_boolean_null_ok(spark):
    assert _apply(spark, "boolean", [None]) == [(None, False)]
