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
    projection: list[Column]       # typed, aliased target columns (one per
    #                                DISTINCT target — duplicates resolved
    #                                last-file-column-wins, see below)
    invalid_flags: list[Column]    # one boolean per mapped column — ALL of
    #                                them, losers included (error parity)
    source_cols: list[str]         # mapped source columns present in the df
    target_cols: list[str]         # mapped target columns (aligned with
    #                                invalid_flags, duplicates retained)
    distinct_targets: list[str]    # deduped target names — what the merge
    #                                path must use; feeding the raw
    #                                target_cols to fold_duplicate_skus
    #                                would emit two aggregates aliased to
    #                                the same name and every downstream
    #                                F.col(dst) would raise
    #                                AMBIGUOUS_REFERENCE


def compile_mapping(config: ParserConfig, df: DataFrame) -> CompiledMapping:
    """Compile column_mapping into select-list expressions against ``df``.

    Source columns absent from the file are skipped entirely (the reference
    only maps cells that exist, B/ingestion/base.py:58-66); mapped-but-absent
    columns therefore contribute nothing, matching "unsupplied column never
    overwrites".

    Two source columns MAY map to the same target: the reference collapses
    its interpreted elements with a dict comprehension over the row's cells
    in FILE order (B/ingestion/service.py:86), so the later file column
    wins. The projection replicates that (one aliased expression per
    distinct target, the winner being the source latest in ``df.columns``)
    — emitting both would make every downstream ``F.col(dst)`` reference
    AMBIGUOUS and reject the file with a raw Catalyst error. The losing
    column's transformer still runs for validation (``invalid_flags``
    keeps every mapped column): in the reference, garbage in the losing
    cell raises during interpret() before the dict ever collapses it.
    """
    config.validate_targets()
    file_order = {c: i for i, c in enumerate(df.columns)}
    projection_by_dst: dict[str, tuple[int, Column]] = {}
    invalid_flags: list[Column] = []
    source_cols: list[str] = []
    target_cols: list[str] = []
    for src, (dst, tid) in config.column_mapping.items():
        if src not in file_order:
            continue
        t = get_transformer(tid)
        c = F.col(src)
        # last-file-column-wins per target (dict insert order tracks the
        # mapping; overwrite only when this src is later in the file)
        prev = projection_by_dst.get(dst)
        if prev is None or file_order[src] >= prev[0]:
            projection_by_dst[dst] = (file_order[src], t.expr(c).alias(dst))
        invalid_flags.append(t.invalid(c).alias(dst))
        source_cols.append(src)
        target_cols.append(dst)
    projection = [expr for _pos, expr in projection_by_dst.values()]
    distinct_targets = list(dict.fromkeys(target_cols))
    return CompiledMapping(
        projection, invalid_flags, source_cols, target_cols, distinct_targets
    )
