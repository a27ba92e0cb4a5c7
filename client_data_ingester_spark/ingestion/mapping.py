"""ParserConfig + mapping→projection compiler (SURVEY §1.3, §2.2 P1).

The reference bridges a dynamic source schema to the fixed target schema with
a per-request ``ParserConfig.column_mapping`` of
``client_column → (target_column, transformer_id)`` (B/ingestion/base.py:19-22)
and interprets row-by-row (base.py:38-68). Here the whole mapping compiles to
ONE vectorized ``select`` projection:

    df.select([T[tid].expr(col(src)).alias(dst), ...])

Unmapped source columns are dropped by the select (and Catalyst prunes them
out of the scan — column pruning for free). Target-column legality is
asserted at plan-build time, mirroring the reference's interpret-time assert
(base.py:41).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..schemas import ALL_TARGET_COLUMN_NAMES
from .transformers import get_transformer


@dataclass(frozen=True)
class ParserConfig:
    """Mirror of B/ingestion/base.py:19-22 (pydantic there, dataclass here)."""

    parser_id: str
    # client column name -> (target column name, transformer id)
    column_mapping: Mapping[str, Sequence[str]] = field(default_factory=dict)

    @classmethod
    def from_json(cls, payload: str | bytes) -> "ParserConfig":
        import json

        obj = json.loads(payload)
        return cls(
            parser_id=obj["parser_id"],
            column_mapping={k: tuple(v) for k, v in obj["column_mapping"].items()},
        )

    def validate_targets(self) -> None:
        for src, (dst, _tid) in self.column_mapping.items():
            if dst not in ALL_TARGET_COLUMN_NAMES:
                raise ValueError(
                    f"Invalid target column {dst!r} for source column {src!r}; "
                    f"legal targets: {ALL_TARGET_COLUMN_NAMES}"
                )


@dataclass(frozen=True)
class CompiledMapping:
    projection: list[Column]       # typed, aliased target columns
    invalid_flags: list[Column]    # one boolean per mapped column (aliased dst)
    source_cols: list[str]         # mapped source columns present in the df
    target_cols: list[str]         # mapped target columns (order matches)


def compile_mapping(config: ParserConfig, df: DataFrame) -> CompiledMapping:
    """Compile column_mapping into select-list expressions against ``df``.

    Source columns absent from the file are skipped entirely (the reference
    only maps cells that exist, B/ingestion/base.py:58-66); mapped-but-absent
    columns therefore contribute nothing, matching "unsupplied column never
    overwrites".
    """
    config.validate_targets()
    present = set(df.columns)
    projection: list[Column] = []
    invalid_flags: list[Column] = []
    source_cols: list[str] = []
    target_cols: list[str] = []
    for src, (dst, tid) in config.column_mapping.items():
        if src not in present:
            continue
        t = get_transformer(tid)
        c = F.col(src)
        projection.append(t.expr(c).alias(dst))
        invalid_flags.append(t.invalid(c).alias(dst))
        source_cols.append(src)
        target_cols.append(dst)
    return CompiledMapping(projection, invalid_flags, source_cols, target_cols)
