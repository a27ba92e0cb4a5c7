"""Transformer registry — the engine's scalar-function surface.

The reference's transformers (B/ingestion/transformers.py:19-68) are
row-at-a-time Python classes; here each transformer is a **Column-expression
builder** so the transform stays JVM-side inside whole-stage codegen — no
Python UDFs in the ingest hot path (SURVEY §2.10).

Raise-semantics parity (SURVEY §2.8 F5): the reference *raises* on garbage in
``decimal``/``boolean`` which aborts the whole file. Spark casts yield null
instead of raising, so each transformer also exposes an ``invalid`` predicate;
the validation stage counts invalid cells in one pass and aborts the file
before any write ("permissive parse, strict apply").

Exact semantics replicated per transformer (CSV input is always string/null;
a null cell means "column not supplied for this row" and stays null):

- decimal  (B/ingestion/transformers.py:19-30): strip ``$ £ ,`` and trim
  leading/trailing whitespace (interior whitespace is NOT removed — it fails
  the parse, as in the reference), parse as Decimal(12,2); unparsable
  non-null input (incl. empty string) RAISES in the reference → flagged
  invalid here.
- text     (:33-38): str().strip().
- integer  (:40-53): int(float(s.strip())) truncating toward zero;
  unparsable → 0 (silent default, never raises).
- boolean  (:55-68): lower(strip()) in {yes,true,1} → True, {no,false,0} →
  False, anything else RAISES → flagged invalid here.

Extension point parity: the reference discovers transformers by subclass scan
keyed on a class-attr id (B/config.py:131-137). Here, ``register_transformer``
adds to the registry; ids are strings either way.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

def _never_invalid(c: Column) -> Column:
    return F.lit(False)


@dataclass(frozen=True)
class Transformer:
    """A vectorized transformer: typed output expr + invalid-cell predicate."""

    id: str
    expr: Callable[[Column], Column]
    invalid: Callable[[Column], Column] = _never_invalid
    output_type: T.DataType = T.StringType()


def _decimal_expr(c: Column) -> Column:
    # try_cast (not cast): null-on-garbage regardless of spark.sql.ansi.enabled.
    # Only currency symbols and thousands separators are removed; whitespace
    # is TRIMMED at the ends, never stripped from the interior — the reference
    # raises on '1 234.56' (Decimal parse fails → file aborted), so here it
    # must fail the try_cast and trip the invalid flag, not silently ingest.
    cleaned = F.regexp_replace(F.trim(c.cast("string")), r"[$£,]", "")
    return cleaned.try_cast(T.DecimalType(12, 2))


def _decimal_invalid(c: Column) -> Column:
    return c.isNotNull() & _decimal_expr(c).isNull()


def _text_expr(c: Column) -> Column:
    return F.trim(c.cast("string"))


def _integer_expr(c: Column) -> Column:
    # int(float(s)) truncates toward zero; Spark double→int cast matches.
    # Unparsable (cast null) → 0, but a NULL cell stays NULL (cell absent).
    parsed = F.trim(c.cast("string")).try_cast("double")
    parsed = F.when(F.isnan(parsed), F.lit(None)).otherwise(parsed)
    return F.when(c.isNull(), F.lit(None).cast("int")).otherwise(
        F.coalesce(parsed.try_cast("int"), F.lit(0))
    )


_TRUE_TOKENS = ["yes", "true", "1"]
_FALSE_TOKENS = ["no", "false", "0"]


def _boolean_expr(c: Column) -> Column:
    n = F.lower(F.trim(c.cast("string")))
    return (
        F.when(n.isin(_TRUE_TOKENS), F.lit(True))
        .when(n.isin(_FALSE_TOKENS), F.lit(False))
        .otherwise(F.lit(None).cast("boolean"))
    )


def _boolean_invalid(c: Column) -> Column:
    return c.isNotNull() & _boolean_expr(c).isNull()


TRANSFORMERS: dict[str, Transformer] = {}


def register_transformer(t: Transformer) -> Transformer:
    TRANSFORMERS[t.id] = t
    return t


register_transformer(
    Transformer("decimal", _decimal_expr, _decimal_invalid, T.DecimalType(12, 2))
)
register_transformer(Transformer("text", _text_expr, output_type=T.StringType()))
register_transformer(
    Transformer("integer", _integer_expr, output_type=T.IntegerType())
)
register_transformer(
    Transformer("boolean", _boolean_expr, _boolean_invalid, T.BooleanType())
)


def get_transformer(transformer_id: str) -> Transformer:
    try:
        return TRANSFORMERS[transformer_id]
    except KeyError:
        raise KeyError(f"Unknown transformer id: {transformer_id!r}") from None
