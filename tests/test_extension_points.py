"""Extension-point parity (SURVEY §2.10): the reference discovers
transformers/parsers by subclass scan keyed on a class-attr id; here the
registries accept new entries the same way — a custom transformer is a
Column-expression builder, a custom parser is a reader function."""

from decimal import Decimal

from pyspark.sql import functions as F
from pyspark.sql import types as T

from client_data_ingester_spark.ingestion import ParserConfig, ingest_data
from client_data_ingester_spark.ingestion.parsers import (
    PARSERS,
    _df_from_rows,
    register_parser,
)
from client_data_ingester_spark.ingestion.transformers import (
    TRANSFORMERS,
    Transformer,
    register_transformer,
)


def test_custom_transformer_pluggable(spark, products_table):
    register_transformer(
        Transformer(
            "percent_decimal",
            lambda c: (
                F.regexp_replace(F.trim(c.cast("string")), "%", "").try_cast(
                    "decimal(12,2)"
                )
                / 100
            ).cast(T.DecimalType(12, 2)),
            output_type=T.DecimalType(12, 2),
        )
    )
    try:
        cfg = ParserConfig(
            "csv",
            {"sku": ("sku", "text"), "margin": ("max_price", "percent_decimal")},
        )
        rep = ingest_data(
            spark,
            products_table,
            b"sku,margin\nA,25%\n",
            cfg,
            client_id=1,
        )
        assert rep.success, rep.message
        row = products_table.read(spark, 1).collect()[0]
        assert row["max_price"] == Decimal("0.25")
    finally:
        TRANSFORMERS.pop("percent_decimal", None)


def test_custom_parser_pluggable(spark, products_table):
    def read_pipe(s, source: bytes):
        lines = source.decode().splitlines()
        header = lines[0].split("|")
        rows = [ln.split("|") for ln in lines[1:]]
        return _df_from_rows(s, header, rows)

    register_parser("pipe", read_pipe)
    try:
        cfg = ParserConfig(
            "pipe", {"sku": ("sku", "text"), "title": ("title", "text")}
        )
        rep = ingest_data(
            spark,
            products_table,
            b"sku|title\nP1|Piped product\n",
            cfg,
            client_id=1,
        )
        assert rep.success, rep.message
        row = products_table.read(spark, 1).collect()[0]
        assert row["sku"] == "P1" and row["title"] == "Piped product"
    finally:
        PARSERS.pop("pipe", None)
