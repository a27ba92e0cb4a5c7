"""Custom stateful streaming operator ([EXT], SURVEY §2.9 / north star).

Per-user running aggregates maintained with ``applyInPandasWithState`` — the
escape hatch for stateful logic Spark's built-in streaming aggregates can't
express (here: a running event counter + last-seen timestamp + a session
counter with a custom gap rule, emitted per micro-batch).

State design for scale: state is keyed by user_id (the shuffle key) and each
group's state is O(1) (three scalars). In production, pass
``timeout="ProcessingTimeTimeout"`` so idle users expire and the state store
stays bounded — note that with a processing-time timeout the engine schedules
extra "cleanup" micro-batches even without data, which means
``processAllAvailable()`` never returns; deterministic test drives use the
default NoTimeout.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, total_events long, total_value double, "
    "n_sessions long, last_seen timestamp"
)
STATE_SCHEMA = "total_events long, total_value double, n_sessions long, last_ts long"

SESSION_GAP_SECONDS = 30 * 60


def _make_update_fn(timeout_enabled: bool):
    def update_user_state(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            state.remove()
            return
        total_events, total_value, n_sessions, last_ts = (
            state.get if state.exists else (0, 0.0, 0, None)
        )
        rows = pd.concat(list(pdfs)).sort_values("ts")
        for ts, value in zip(rows["ts"], rows["value"]):
            if pd.isna(ts):
                # a null-ts event can't be sessionized; skipping the row
                # beats int(NaT.timestamp()) raising and killing the
                # whole streaming query on one malformed record
                continue
            epoch = int(ts.timestamp())
            if last_ts is None or epoch - last_ts > SESSION_GAP_SECONDS:
                n_sessions += 1
            last_ts = epoch
            total_events += 1
            total_value += float(value) if value == value else 0.0  # NaN-safe
        state.update((total_events, total_value, n_sessions, last_ts))
        if timeout_enabled:
            state.setTimeoutDuration(3600 * 1000)  # expire idle users after 1h
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "total_events": [total_events],
                "total_value": [total_value],
                "n_sessions": [n_sessions],
                "last_seen": [pd.Timestamp(last_ts, unit="s")],
            }
        )

    return update_user_state


def running_user_totals(
    stream: DataFrame, timeout: str = GroupStateTimeout.NoTimeout
) -> DataFrame:
    """events stream → one row per user per micro-batch with running totals."""
    return (
        stream.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_update_fn(timeout != GroupStateTimeout.NoTimeout),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=timeout,
        )
    )
