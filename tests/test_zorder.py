"""Z-order layout ([EXT], tables/layout.py): the write-side clustering that
makes parquet min/max skipping work on MORE THAN ONE column. A 1-D sort
gives tight file stats on the sort column only; the Morton curve gives
usably tight stats on every participating column."""

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from client_data_ingester_spark.tables.layout import (
    write_zordered,
    zorder_key,
)


def test_zorder_key_interleaves_bits(spark):
    """bits=2 over a 0..3 domain makes scaled == raw, so the Morton key is
    checkable by hand: col0's bits land at even positions, col1's at odd."""
    rows = [(0, 0), (3, 0), (0, 3), (3, 3), (1, 1), (None, 2)]
    df = spark.createDataFrame(rows, "a int, b int")
    keyed, kcol = zorder_key(df, ["a", "b"], bits=2)
    got = {(r["a"], r["b"]): r[kcol] for r in keyed.collect()}
    assert got[(0, 0)] == 0
    assert got[(3, 0)] == 0b0101  # a → bits 0,2
    assert got[(0, 3)] == 0b1010  # b → bits 1,3
    assert got[(3, 3)] == 0b1111
    assert got[(1, 1)] == 0b0011
    # NULL normalizes to the curve origin on that dimension, not the top
    assert got[(None, 2)] < got[(3, 3)]
    assert got[(None, 2)] & 0b0101 == 0  # a-bits all zero


def _files_hit(path: str, col: str, lo: float, hi: float) -> tuple[int, int]:
    """(files whose [min,max] intersects [lo, hi], total files) — the
    file-skipping decision a stats-aware reader makes from footers alone."""
    hit = total = 0
    for f in sorted(glob.glob(f"{path}/*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.to_arrow_schema().get_field_index(col)
        fmin = min(
            md.row_group(g).column(idx).statistics.min
            for g in range(md.num_row_groups)
        )
        fmax = max(
            md.row_group(g).column(idx).statistics.max
            for g in range(md.num_row_groups)
        )
        total += 1
        if fmax >= lo and fmin <= hi:
            hit += 1
    return hit, total


def test_zorder_skips_files_on_both_dimensions(spark, tmp_path):
    # two deterministic, mutually-uncorrelated uniform dims in [0, 1000)
    df = spark.range(40_000).select(
        F.pmod(F.hash(F.col("id")), F.lit(1000)).alias("a"),
        F.pmod(F.hash(F.col("id") * 31 + 7), F.lit(1000)).alias("b"),
    )
    zpath = str(tmp_path / "z")
    lpath = str(tmp_path / "linear")
    n_files = 64
    write_zordered(df, zpath, ["a", "b"], num_files=n_files)
    # baseline: classic 1-D global sort on `a`
    (
        df.repartitionByRange(n_files, F.col("a"))
        .sortWithinPartitions("a")
        .write.mode("overwrite")
        .parquet(lpath)
    )

    # 4%-wide slab queries at several positions: pruning depends on where
    # a slab falls relative to the curve's bit boundaries (a slab
    # straddling the top-bit split at 500 touches both halves), so assert
    # the aggregate behavior, not one cherry-picked position
    slabs = [(480, 519), (510, 559), (260, 299), (700, 739), (60, 99)]
    z_hits, l_hits_a, l_hits_b = [], [], []
    for lo, hi in slabs:
        for col in ("a", "b"):
            h, t = _files_hit(zpath, col, lo, hi)
            assert t == n_files
            z_hits.append(h)
        la, _ = _files_hit(lpath, "a", lo, hi)
        lb, _ = _files_hit(lpath, "b", lo, hi)
        l_hits_a.append(la)
        l_hits_b.append(lb)

    # NOTE on tolerances: repartitionByRange samples its boundaries (seeded
    # by RDD id, so exact file splits legitimately differ run-to-run /
    # suite-vs-standalone); assertions leave margin for boundary placement
    # while still separating the two layouts by a wide gap.
    # linear layout: near-perfect on its sort column (a 40-wide slab spans
    # ~3.6 of 64 ranges; sampled boundaries can stretch that), useless on
    # the other dimension
    assert max(l_hits_a) <= 8, (l_hits_a, l_hits_b, z_hits)
    assert all(h == n_files for h in l_hits_b), (l_hits_a, l_hits_b, z_hits)
    # z-order: EVERY slab on EITHER dimension skips files (even the
    # boundary-straddling worst case), and on average a 4% slab reads
    # under half the files — the 1-D layout reads 100% on dim b
    assert max(z_hits) <= int(0.65 * n_files), (l_hits_a, l_hits_b, z_hits)
    assert sum(z_hits) / len(z_hits) <= 0.45 * n_files, (
        l_hits_a,
        l_hits_b,
        z_hits,
    )
    # and the layouts are not even close: z-order's worst dimension beats
    # the linear layout's non-sort dimension on every slab
    assert max(z_hits) < min(l_hits_b), (l_hits_a, l_hits_b, z_hits)

    # layout must not change the data: same multiset back
    assert (
        spark.read.parquet(zpath).groupBy("a", "b").count().orderBy("a", "b").collect()
        == df.groupBy("a", "b").count().orderBy("a", "b").collect()
    )


def test_zorder_key_fits_bigint_with_many_columns(spark):
    """4+ columns at the default 16 bits would reach the sign bit (and
    alias mod 64 beyond it); the clamp coarsens per-column resolution so
    the interleaved key stays a valid non-negative BIGINT and the curve
    order survives."""
    rows = [(i, i * 2, 1000 - i, i % 7, i % 11) for i in range(200)]
    df = spark.createDataFrame(rows, "a int, b int, c int, d int, e int")
    for cols in (["a", "b", "c", "d"], ["a", "b", "c", "d", "e"]):
        keyed, kcol = zorder_key(df, cols)  # default bits=16 must clamp
        mn, mx = keyed.agg(
            F.min(kcol), F.max(kcol)
        ).first()
        assert mn >= 0, f"{cols}: sign-bit overflow (min key {mn})"
        assert mx > 0


def test_zorder_key_on_date_and_timestamp_columns(spark):
    """DATE -> DOUBLE is a Spark type error, not a coercion: the Morton
    key must render temporal columns monotonically itself (regression —
    zorder_key crashed at plan time on the module's own (event_date,
    user_id) use case)."""
    import datetime as dt

    from client_data_ingester_spark.tables.layout import zorder_key

    df = spark.createDataFrame(
        [
            (dt.date(2024, 1, d), dt.datetime(2024, 1, d, 12), d)
            for d in range(1, 11)
        ],
        "event_date date, ts timestamp, user_id long",
    )
    keyed, key = zorder_key(df, ["event_date", "user_id"])
    assert keyed.select(key).distinct().count() == 10
    keyed2, key2 = zorder_key(df, ["ts", "user_id"])
    assert keyed2.select(key2).distinct().count() == 10
    # monotone rendering: later dates get later per-column ranks, so the
    # max key belongs to the max (date, user_id) row
    top = keyed.orderBy(F.col(key).desc()).first()
    assert top["event_date"] == dt.date(2024, 1, 10)


def test_write_partitioned_salts_nested_map_columns(spark, tmp_path):
    """Maps nested in arrays must not reach F.hash (regression: only
    top-level MapType was serialized to JSON and array<map> crashed the
    salted write)."""
    from client_data_ingester_spark.tables.layout import write_partitioned

    df = spark.createDataFrame(
        [(d, [{"k": str(i)}]) for d in ("a", "b") for i in range(50)],
        "part string, tags array<map<string,string>>",
    )
    path = str(tmp_path / "nested")
    write_partitioned(df, path, ["part"], files_per_partition=2)
    assert spark.read.parquet(path).count() == 100
