"""Incremental daily rollup (continuous-aggregate semantics): maintenance
must process only new/tail days, leave settled partitions byte-untouched,
and always equal a full recompute."""

import glob
import os

from pyspark.sql import functions as F

from conftest import SF_DIR

from client_data_ingester_spark.sources import load_table
from client_data_ingester_spark.tables.rollup import (
    daily_rollup,
    maintain_daily_rollup,
    read_rollup,
)


def _events(spark):
    return load_table(spark, SF_DIR, "events")


def _snap(rollup_path):
    """(path -> mtime_ns) for every parquet file under every day dir."""
    return {
        p: os.stat(p).st_mtime_ns
        for p in glob.glob(os.path.join(rollup_path, "event_date=*", "*.parquet"))
    }


def _rows(spark, path):
    return sorted(
        (str(r["event_date"]), r["event_type"], r["n_events"],
         r["sum_value"], r["n_users"])
        for r in read_rollup(spark, path).collect()
    )


def test_incremental_maintenance_matches_full_recompute(spark, tmp_path):
    ev = _events(spark)
    days = sorted(
        str(r["d"]) for r in
        ev.select(F.to_date("ts").alias("d")).distinct().collect()
    )
    assert len(days) >= 3, "testdata must span several days"
    cut = days[len(days) // 2]
    path = str(tmp_path / "rollup")

    # first maintenance over the early half materializes those days
    early = ev.filter(F.to_date("ts") <= cut)
    written1 = maintain_daily_rollup(spark, early, path)
    assert written1 == [d for d in days if d <= cut]

    # second maintenance over the FULL source: only the new days plus the
    # 1-day reprocess tail are written; settled partitions stay byte-
    # untouched on disk
    before = _snap(path)
    written2 = maintain_daily_rollup(spark, ev, path)
    assert written2 == [d for d in days if d >= cut]  # tail day == cut
    after = _snap(path)
    settled = [d for d in days if d < cut]
    for p, m in before.items():
        day = p.split("event_date=")[1].split(os.sep)[0]
        if day in settled:
            assert after.get(p) == m, f"settled partition rewritten: {p}"

    # and the final table equals a from-scratch recompute
    expect = sorted(
        (str(r["event_date"]), r["event_type"], r["n_events"],
         r["sum_value"], r["n_users"])
        for r in daily_rollup(ev).collect()
    )
    assert _rows(spark, path) == expect


def test_maintenance_is_idempotent_and_noop_when_current(spark, tmp_path):
    ev = _events(spark)
    path = str(tmp_path / "rollup")
    maintain_daily_rollup(spark, ev, path)
    rows1 = _rows(spark, path)
    # a re-run with no new data touches only the reprocess tail…
    written = maintain_daily_rollup(spark, ev, path)
    assert len(written) == 1  # just the tail day
    assert _rows(spark, path) == rows1
    # …and with reprocess_tail_days=0 it is a pure no-op
    before = _snap(path)
    assert maintain_daily_rollup(spark, ev, path, reprocess_tail_days=0) == []
    assert _snap(path) == before


def test_late_data_lands_via_tail_reprocess(spark, tmp_path):
    ev = _events(spark)
    days = sorted(
        str(r["d"]) for r in
        ev.select(F.to_date("ts").alias("d")).distinct().collect()
    )
    last = days[-1]
    path = str(tmp_path / "rollup")
    # materialize with the last day only half-loaded (late rows missing)
    partial = ev.filter(
        (F.to_date("ts") < last)
        | ((F.to_date("ts") == last) & (F.col("user_id") % 2 == 0))
    )
    maintain_daily_rollup(spark, partial, path)
    # the late rows arrive; the tail reprocess folds them in
    maintain_daily_rollup(spark, ev, path)
    expect = sorted(
        (str(r["event_date"]), r["event_type"], r["n_events"],
         r["sum_value"], r["n_users"])
        for r in daily_rollup(ev).collect()
    )
    assert _rows(spark, path) == expect


def test_null_ts_rows_do_not_wedge_maintenance(spark, tmp_path):
    """A null ts has no day: it must be dropped from the day list, or the
    phantom day is never satisfied by a written partition and every
    maintenance run re-queues (and claims to have written) it forever."""
    base = _events(spark)
    ev = base.unionByName(
        spark.createDataFrame(
            [(999999, None, 1, "t", 1.0, None)],
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string",
        ).select(*base.columns)
    )
    path = str(tmp_path / "rollup")
    first = maintain_daily_rollup(spark, ev, path)
    assert first  # real days written
    assert "None" not in first
    assert maintain_daily_rollup(spark, ev, path, reprocess_tail_days=0) == []


def test_partial_partition_without_ledger_entry_is_reaggregated(
    spark, tmp_path
):
    """A crash between the parquet job commit and the ledger append
    leaves an event_date dir with no completion record — the next run
    must re-aggregate that day, not skip it forever (regression:
    presence-based detection under-counted the crashed day once it aged
    out of the reprocess tail)."""
    import datetime as dt
    import os

    from client_data_ingester_spark.tables.rollup import (
        existing_rollup_days,
        maintain_daily_rollup,
        read_rollup,
    )

    path = str(tmp_path / "rollup")
    ev = spark.createDataFrame(
        [
            (i, dt.datetime(2024, 1, 1 + (i % 3), 10), i, "view", 1.0)
            for i in range(30)
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double",
    )
    maintain_daily_rollup(spark, ev, path, reprocess_tail_days=0)
    assert len(existing_rollup_days(path)) == 3
    full = {
        (str(r["event_date"]), r["event_type"]): r["n_events"]
        for r in read_rollup(spark, path).collect()
    }

    # simulate the crash: day 2024-01-02's dir is half-gone and its
    # ledger record vanishes with the pre-commit state
    day_dir = os.path.join(path, "event_date=2024-01-02")
    for f in os.listdir(day_dir):
        os.remove(os.path.join(day_dir, f))
    ledger = os.path.join(path, "_COMPLETED_DAYS")
    with open(ledger) as f:
        recorded = [line for line in f if "2024-01-02" not in line]
    with open(ledger, "w") as f:
        f.writelines(recorded)

    assert "2024-01-02" not in existing_rollup_days(path)
    redone = maintain_daily_rollup(spark, ev, path, reprocess_tail_days=0)
    assert redone == ["2024-01-02"]
    repaired = {
        (str(r["event_date"]), r["event_type"]): r["n_events"]
        for r in read_rollup(spark, path).collect()
    }
    assert repaired == full
