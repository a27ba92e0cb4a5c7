"""Zone-map manifest: distributed footer-stat collection, evidence-based
file pruning, and full-scan-equivalent pruned reads."""

import pytest
from pyspark.sql import functions as F

from conftest import SF_DIR

from client_data_ingester_spark.sources import load_table
from client_data_ingester_spark.tables.manifest import (
    build_manifest,
    list_data_files,
    prune_files,
    read_pruned,
)


@pytest.fixture(scope="module")
def events_by_day(spark, tmp_path_factory):
    """events written one file per day, value-sorted within each — the
    layout that gives zone maps disjoint per-file value ranges on ts."""
    path = str(tmp_path_factory.mktemp("zm") / "events_by_day")
    ev = load_table(spark, SF_DIR, "events").withColumn(
        "event_date", F.to_date("ts")
    )
    (
        ev.repartition("event_date")
        .sortWithinPartitions("value")
        .write.partitionBy("event_date")
        .mode("overwrite")
        .parquet(path)
    )
    return path


def test_manifest_covers_every_file_and_column(spark, events_by_day):
    files = list_data_files(events_by_day)
    m = build_manifest(spark, events_by_day, ["value", "user_id"]).collect()
    assert len(m) == 2 * len(files)
    by_file = {}
    for r in m:
        by_file.setdefault(r["file"], {})[r["col_name"]] = r
    for f, cols in by_file.items():
        assert cols["value"]["min_num"] <= cols["value"]["max_num"]
        assert cols["value"]["n_rows"] > 0


def test_pruned_read_equals_full_scan(spark, events_by_day):
    manifest = build_manifest(
        spark, events_by_day, ["value", "user_id"]
    ).cache()
    lo, hi = 10.0, 40.0
    pruned = read_pruned(
        spark, events_by_day, manifest, "value", lo, hi
    )
    full = spark.read.parquet(events_by_day).filter(
        (F.col("value") >= lo) & (F.col("value") <= hi)
    )
    got = sorted(r["event_id"] for r in pruned.select("event_id").collect())
    want = sorted(r["event_id"] for r in full.select("event_id").collect())
    assert got == want and len(got) > 0
    # partition column survives the explicit-file read (basePath)
    assert "event_date" in pruned.columns


def test_ts_zone_maps_prune_day_files(spark, events_by_day):
    """ts is monotone with event_date, so per-day files have disjoint ts
    ranges: a one-day ts window must prune to a strict file subset."""
    manifest = build_manifest(spark, events_by_day, ["ts"]).cache()
    all_files = list_data_files(events_by_day)
    span = manifest.agg(
        F.min("min_num").alias("lo"), F.max("max_num").alias("hi")
    ).collect()[0]
    one_day_us = 24 * 3600 * 1_000_000
    kept = prune_files(
        manifest, "ts", span["lo"], min(span["lo"] + one_day_us, span["hi"])
    )
    assert 0 < len(kept) < len(all_files)


def test_pruning_is_evidence_based_keeps_statless_files(spark, events_by_day):
    """A column absent from the footers (never written) must never prune:
    every file survives when there is no evidence."""
    manifest = build_manifest(spark, events_by_day, ["no_such_column"])
    kept = prune_files(manifest, "no_such_column", 0.0, 1.0)
    assert sorted(kept) == sorted(list_data_files(events_by_day))


def test_stale_manifest_never_loses_new_files(spark, tmp_path):
    """A data file added AFTER the manifest was built has no stats row;
    read_pruned must scan it anyway (missing-from-manifest == missing
    stats == evidence-based keep) so results stay byte-identical to the
    full scan even against a stale manifest."""
    path = str(tmp_path / "t")
    spark.range(0, 100).select(
        F.col("id").alias("event_id"), (F.col("id") % 50).alias("value")
    ).coalesce(1).write.mode("overwrite").parquet(path)
    manifest = build_manifest(spark, path, ["value"]).cache()
    manifest.count()

    # late-arriving file whose values sit INSIDE the query range — a
    # file-list intersection with the manifest would silently drop it
    spark.range(1000, 1010).select(
        F.col("id").alias("event_id"),
        F.lit(20).cast("long").alias("value"),
    ).coalesce(1).write.mode("append").parquet(path)

    lo, hi = 10.0, 30.0
    pruned = read_pruned(spark, path, manifest, "value", lo, hi)
    full = spark.read.parquet(path).filter(
        (F.col("value") >= lo) & (F.col("value") <= hi)
    )
    got = sorted(r["event_id"] for r in pruned.collect())
    want = sorted(r["event_id"] for r in full.collect())
    assert got == want
    assert any(e >= 1000 for e in got), "late file's rows missing"


def test_stale_manifest_drops_vanished_files(spark, tmp_path):
    """A manifested file that was compacted/GC'd away must be dropped from
    the scan list instead of failing the read."""
    import os

    path = str(tmp_path / "t")
    spark.range(0, 100).select(
        F.col("id").alias("event_id"), (F.col("id") % 50).alias("value")
    ).repartition(4).write.mode("overwrite").parquet(path)
    manifest = build_manifest(spark, path, ["value"]).cache()
    manifest.count()
    victim = list_data_files(path)[0]
    os.remove(victim)

    pruned = read_pruned(spark, path, manifest, "value", 0.0, 100.0)
    full = spark.read.parquet(path)
    assert pruned.count() == full.count()


def test_update_manifest_incremental(spark, tmp_path):
    """Incremental refresh: reuse stats rows for unchanged files, footer-
    read only additions, drop vanished files — result must equal a full
    rebuild of the live tree."""
    import os

    from client_data_ingester_spark.tables.manifest import update_manifest

    path = str(tmp_path / "t")
    spark.range(0, 100).select(
        F.col("id").alias("event_id"), (F.col("id") % 50).alias("value")
    ).repartition(3).write.mode("overwrite").parquet(path)
    m0 = build_manifest(spark, path, ["value"]).cache()
    m0.count()

    # add a file and remove one
    spark.range(1000, 1010).select(
        F.col("id").alias("event_id"),
        F.lit(77).cast("long").alias("value"),
    ).coalesce(1).write.mode("append").parquet(path)
    os.remove(list_data_files(path)[0])

    updated = update_manifest(spark, path, ["value"], m0)
    rebuilt = build_manifest(spark, path, ["value"])
    key = lambda r: (r["file"], r["col_name"])  # noqa: E731
    assert sorted(map(tuple, updated.collect()), key=lambda t: t[:2]) == \
        sorted(map(tuple, rebuilt.collect()), key=lambda t: t[:2])
    assert {r["file"] for r in updated.collect()} == set(
        list_data_files(path)
    )


def test_update_manifest_rejects_column_change(spark, tmp_path):
    import pytest

    from client_data_ingester_spark.tables.manifest import update_manifest

    path = str(tmp_path / "t")
    spark.range(0, 10).select(
        F.col("id").alias("event_id"), F.col("id").alias("value")
    ).coalesce(1).write.mode("overwrite").parquet(path)
    m0 = build_manifest(spark, path, ["value"])
    with pytest.raises(ValueError, match="column set changed"):
        update_manifest(spark, path, ["value", "event_id"], m0)


def test_snapshot_manifest_build_has_no_driver_walk(
    spark, tmp_path, monkeypatch
):
    """build_manifest_for_snapshot sources the file list from the snapshot
    manifest's directories + an executor-side listing — the driver-side
    os.walk must never run (pinned by poisoning it)."""
    import os

    from client_data_ingester_spark.schemas import CLIENT_PRODUCTS_SCHEMA
    from client_data_ingester_spark.tables import SnapshotTable
    from client_data_ingester_spark.tables import manifest as mf

    t = SnapshotTable(str(tmp_path / "snap"), CLIENT_PRODUCTS_SCHEMA)
    rows = [
        (i, 1, f"S{i}", None, None, f"t{i}", None, i, True, None, None, None)
        for i in range(20)
    ]
    t.overwrite_partitions(
        spark.createDataFrame(rows, CLIENT_PRODUCTS_SCHEMA), [1]
    )

    # the walk legitimately runs on EXECUTORS (the distributed listing
    # ships list_data_files into the flatMap); only a DRIVER-process call
    # is the bug being pinned
    driver_pid = os.getpid()
    real = mf.list_data_files

    def _driver_guard(path):
        if os.getpid() == driver_pid:
            raise AssertionError("driver-side os.walk listing was invoked")
        return real(path)

    monkeypatch.setattr(mf, "list_data_files", _driver_guard)
    m = mf.build_manifest_for_snapshot(spark, t, ["stock_quantity"])
    rows = m.collect()
    assert len(rows) > 0
    assert {r["col_name"] for r in rows} == {"stock_quantity"}
    assert min(r["min_num"] for r in rows) == 0.0
    assert max(r["max_num"] for r in rows) == 19.0


def test_pruned_read_on_timestamp_column_equals_full_scan(
    spark, events_by_day
):
    """The temporal path end to end: ts stats are stored as epoch MICROS,
    so read_pruned must compare the timestamp column in that domain — a
    raw ts-vs-double comparison is a Spark type error, not a coercion
    (regression: every pruned read on a temporal column crashed with
    DATATYPE_MISMATCH.BINARY_OP_DIFF_TYPES)."""
    manifest = build_manifest(spark, events_by_day, ["ts"]).cache()
    span = manifest.agg(
        F.min("min_num").alias("lo"), F.max("max_num").alias("hi")
    ).collect()[0]
    one_day_us = 24 * 3600 * 1_000_000
    lo, hi = span["lo"], min(span["lo"] + one_day_us, span["hi"])
    pruned = read_pruned(spark, events_by_day, manifest, "ts", lo, hi)
    full = spark.read.parquet(events_by_day).filter(
        (F.unix_micros(F.col("ts")) >= lo) & (F.unix_micros(F.col("ts")) <= hi)
    )
    got = sorted(r["event_id"] for r in pruned.select("event_id").collect())
    want = sorted(r["event_id"] for r in full.select("event_id").collect())
    assert got == want and len(got) > 0


def test_prune_on_unmanifested_column_keeps_every_file(
    spark, events_by_day
):
    """A column that was never in the manifest's build list has no stats
    rows at all — evidence-based pruning must keep EVERY file (regression:
    the col_name filter matched nothing and the prune silently returned
    zero files, turning the pruned read into an empty relation)."""
    manifest = build_manifest(spark, events_by_day, ["value"]).cache()
    kept = prune_files(manifest, "user_id", 0.0, 1.0)
    assert sorted(kept) == sorted(list_data_files(events_by_day))
    # and the read stays full-scan-equivalent through the same gap
    pruned = read_pruned(spark, events_by_day, manifest, "user_id", 0.0, 5.0)
    full = spark.read.parquet(events_by_day).filter(
        (F.col("user_id") >= 0.0) & (F.col("user_id") <= 5.0)
    )
    assert pruned.count() == full.count() > 0


def test_read_pruned_string_column_correct_but_unpruned(spark, events_by_day):
    """String/boolean stats live in min_str/max_str, which range pruning
    never consults — prune_files keeps every file (min_num is NULL) and
    the predicate is re-applied as a RAW-column comparison, so the read
    stays correct, just unpruned. (A prior revision raised ValueError
    here, turning existing correct callers into hard errors.)"""
    manifest = build_manifest(spark, events_by_day, ["event_type"]).cache()
    full = spark.read.parquet(events_by_day)
    lo, hi = "click", "purchase"
    pruned = read_pruned(spark, events_by_day, manifest, "event_type", lo, hi)
    expect = full.filter(
        (full["event_type"] >= lo) & (full["event_type"] <= hi)
    ).count()
    assert pruned.count() == expect > 0


def test_pruned_read_equals_full_scan_for_any_range(spark, events_by_day):
    """Property: for ANY [lo, hi] — inverted, disjoint-left, disjoint-
    right, degenerate, open-ended — the pruned read returns exactly the
    full scan's rows (zone maps only shrink the file list; the re-applied
    predicate is authoritative)."""
    manifest = build_manifest(spark, events_by_day, ["value"]).cache()
    full_df = spark.read.parquet(events_by_day)
    span = full_df.agg(
        F.min("value").alias("lo"), F.max("value").alias("hi")
    ).collect()[0]
    lo0, hi0 = span["lo"], span["hi"]
    width = hi0 - lo0
    cases = [
        (lo0 - width, lo0 - 1.0),        # fully left of the data
        (hi0 + 1.0, hi0 + width),        # fully right
        (hi0, lo0),                      # inverted: provably empty
        (lo0, lo0),                      # degenerate point at the min
        (lo0 + width / 3, lo0 + width / 3),  # degenerate interior point
        (None, lo0 + width / 4),         # open lower bound
        (lo0 + 3 * width / 4, None),     # open upper bound
        (lo0 - 1.0, hi0 + 1.0),          # superset of everything
    ]
    for lo, hi in cases:
        pruned = read_pruned(spark, events_by_day, manifest, "value", lo, hi)
        pred = F.lit(True)
        if lo is not None:
            pred = pred & (F.col("value") >= lo)
        if hi is not None:
            pred = pred & (F.col("value") <= hi)
        want = sorted(
            r["event_id"]
            for r in full_df.filter(pred).select("event_id").collect()
        )
        got = sorted(
            r["event_id"] for r in pruned.select("event_id").collect()
        )
        assert got == want, (lo, hi)


def test_snapshot_manifest_refuses_stale_snapshots(spark, tmp_path):
    """A degraded shared dir (multi-partition commit, one partition later
    overwritten) holds superseded rows that SnapshotTable.read
    anti-filters — but the zone-map path reads listed files RAW, so
    building a manifest over such a snapshot must refuse loudly instead
    of silently violating the pruned-read ≡ full-scan contract."""
    import pytest as _pytest

    from client_data_ingester_spark.schemas import CLIENT_PRODUCTS_SCHEMA
    from client_data_ingester_spark.tables import SnapshotTable
    from client_data_ingester_spark.tables import manifest as mf

    t = SnapshotTable(str(tmp_path / "snap"), CLIENT_PRODUCTS_SCHEMA)

    def _rows(cid, skus):
        return spark.createDataFrame(
            [
                (i + 1, cid, s, None, None, None, None, None, True,
                 None, None, None)
                for i, s in enumerate(skus)
            ],
            CLIENT_PRODUCTS_SCHEMA,
        )

    t.overwrite_partitions(_rows(1, ["A"]).union(_rows(2, ["B"])), [1, 2])
    t.overwrite_partitions(_rows(1, ["A2"]), [1])  # degrades the shared dir
    with _pytest.raises(ValueError, match="stale rows in shared dirs"):
        mf.build_manifest_for_snapshot(spark, t, ["stock_quantity"])


def test_churn_fuzz_pruned_read_always_equals_full_scan(spark, tmp_path):
    """Seeded churn fuzz on the stale-manifest contract: files are added
    and whole day-dirs removed WITHOUT rebuilding the manifest, with
    occasional update_manifest refreshes, and after every step a pruned
    read over a random range must equal the full scan + filter exactly.
    Unmanifested files must always be scanned (evidence-based keep);
    vanished manifested files must drop out instead of failing."""
    import random

    from client_data_ingester_spark.tables.manifest import (
        build_manifest,
        update_manifest,
    )

    rng = random.Random(7)
    path = str(tmp_path / "churn")

    def write_day(day, base):
        (
            spark.range(40)
            .select(
                (F.col("id") + base).cast("double").alias("value"),
                F.lit(day).alias("event_date"),
            )
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(f"{path}/event_date={day}")
        )

    days = []
    for d in range(4):
        write_day(f"2024-01-{d+1:02d}", d * 100)
        days.append(f"2024-01-{d+1:02d}")
    # the persisted flow (write_manifest): the in-memory relations from
    # build/update are LAZY — their footer reads re-execute at every
    # evaluation, against files later churn deletes. Real deployments
    # persist the manifest; the fuzz models exactly that.
    built = build_manifest(spark, path, ["value"])
    manifest = spark.createDataFrame(built.collect(), built.schema)

    def check(step):
        # Spark's session file-status cache can serve stale listings
        # after external file churn — standard refreshByPath territory,
        # orthogonal to the manifest contract under test
        spark.catalog.refreshByPath(path)
        lo = float(rng.randint(-50, 450))
        hi = lo + rng.randint(10, 200)
        got = sorted(
            r["value"]
            for r in read_pruned(
                spark, path, manifest, "value", lo, hi
            ).collect()
        )
        want = sorted(
            r["value"]
            for r in spark.read.parquet(path)
            .filter((F.col("value") >= lo) & (F.col("value") <= hi))
            .collect()
        )
        assert got == want, f"step {step}: pruned != full for [{lo},{hi}]"

    next_day = 4
    for step in range(12):
        op = rng.random()
        if op < 0.45:
            # new day lands; manifest NOT rebuilt (stale-manifest state)
            write_day(f"2024-01-{next_day+1:02d}", next_day * 100)
            days.append(f"2024-01-{next_day+1:02d}")
            next_day += 1
        elif op < 0.7 and len(days) > 1:
            # a manifested day vanishes (compaction/GC analogue)
            gone = days.pop(rng.randrange(len(days)))
            import shutil as _sh

            _sh.rmtree(f"{path}/event_date={gone}")
        else:
            # refresh: stats catch up with the live tree. Materialize the
            # result (the write_manifest flow): the returned relation is
            # LAZY, so its footer reads would otherwise re-execute at
            # every later evaluation — against files later churn deletes
            refreshed = update_manifest(spark, path, ["value"], manifest)
            manifest = spark.createDataFrame(
                refreshed.collect(), refreshed.schema
            )
        check(step)
