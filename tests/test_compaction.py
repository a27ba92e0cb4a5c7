"""Shard compaction: the read-side file-count bound for every
append-one-dir-per-batch stream artifact (VERDICT r10 ask #5).

The per-batch shard pattern bounds WRITE cost but lets the read side
accumulate one dir per micro-batch forever; ``compact_batch_shards``
folds the settled prefix so N batches read as O(keep_last + cadence)
dirs. These tests pin the three contracts that substitution relies on:
(1) merged results are value-identical before/after a fold, (2) the
directory count actually collapses to keep_last + 1, and (3) the
warm-started cluster refresh stays exact when a fold re-surfaces edges
above its watermark (the at-least-once property the docstring claims).
"""

import json
import os

from pyspark.sql import functions as F

from client_data_ingester_spark.streaming.compaction import (
    batch_shard_ids,
    compact_batch_shards,
)


def _write_shards(spark, shard_dir, n_batches, rows_of):
    for b in range(n_batches):
        spark.createDataFrame(rows_of(b), "doc_a long, doc_b long").write.mode(
            "overwrite"
        ).parquet(f"{shard_dir}/batch_id={b}")


def test_compaction_preserves_merged_rows_and_bounds_dirs(spark, tmp_path):
    shard_dir = str(tmp_path / "edges")
    _write_shards(
        spark, shard_dir, 12, lambda b: [(b, b + 1), (b, b + 100)]
    )
    before = {
        (r["doc_a"], r["doc_b"])
        for r in spark.read.parquet(shard_dir).select("doc_a", "doc_b").collect()
    }
    target = compact_batch_shards(spark, shard_dir, keep_last=2)
    assert target == 9  # ids 0..9 folded, 10 and 11 kept
    assert batch_shard_ids(shard_dir) == [9, 10, 11]  # O(1) dirs, not O(N)
    after = {
        (r["doc_a"], r["doc_b"])
        for r in spark.read.parquet(shard_dir).select("doc_a", "doc_b").collect()
    }
    assert after == before
    # and no stray staging dir survives a completed fold
    assert not os.path.exists(os.path.join(shard_dir, "_compact_tmp"))


def test_compaction_noop_below_min_shards(spark, tmp_path):
    shard_dir = str(tmp_path / "few")
    _write_shards(spark, shard_dir, 3, lambda b: [(b, b + 1)])
    assert compact_batch_shards(spark, shard_dir, min_shards=8) is None
    assert batch_shard_ids(shard_dir) == [0, 1, 2]
    assert compact_batch_shards(spark, str(tmp_path / "missing")) is None


def test_compaction_is_idempotent_under_refold(spark, tmp_path):
    """A second compaction over a part-compacted dir (the crash-recovery
    path: rerun after a fold that died before source deletion) converges
    to the same merged rows."""
    shard_dir = str(tmp_path / "edges")
    _write_shards(spark, shard_dir, 10, lambda b: [(b, b + 1)])
    before = {
        (r["doc_a"], r["doc_b"])
        for r in spark.read.parquet(shard_dir).select("doc_a", "doc_b").collect()
    }
    compact_batch_shards(spark, shard_dir, keep_last=1)
    # more batches arrive, then a second fold over old-fold + new shards
    for b in (10, 11, 12, 13, 14, 15):
        spark.createDataFrame([(b, b + 1)], "doc_a long, doc_b long").write.mode(
            "overwrite"
        ).parquet(f"{shard_dir}/batch_id={b}")
    compact_batch_shards(spark, shard_dir, keep_last=1, min_shards=2)
    after = {
        (r["doc_a"], r["doc_b"])
        for r in spark.read.parquet(shard_dir).select("doc_a", "doc_b").collect()
    }
    assert after == before | {(b, b + 1) for b in range(10, 16)}
    assert len(batch_shard_ids(shard_dir)) == 2


def test_dedupe_cols_guard_for_row_sinks(spark, tmp_path):
    """Doc-output shards are not set-merged on read: the fold must be
    able to collapse key duplicates so crash-window re-folds cannot
    multiply rows across compaction generations."""
    shard_dir = str(tmp_path / "docs")
    # the same doc_id lands in two shards (e.g. watermark-expired resend)
    for b, rows in enumerate([[(1, 10)], [(1, 10)], [(2, 20)], [(3, 30)]]):
        spark.createDataFrame(rows, "doc_a long, doc_b long").write.mode(
            "overwrite"
        ).parquet(f"{shard_dir}/batch_id={b}")
    compact_batch_shards(
        spark, shard_dir, keep_last=1, min_shards=2, dedupe_cols=["doc_a"]
    )
    got = sorted(
        (r["doc_a"], r["doc_b"])
        for r in spark.read.parquet(shard_dir).select("doc_a", "doc_b").collect()
    )
    assert got == [(1, 10), (2, 20), (3, 30)]


def _write_docs(path, docs):
    with open(path, "w") as f:
        for d in docs:
            f.write(json.dumps(d) + "\n")


def test_cluster_state_compaction_keeps_labeling_and_refresh_exact(
    spark, tmp_path
):
    """End to end on the real stream: N micro-batches land N band and N
    edge shards; compaction collapses both to keep_last+1 dirs while
    merged_clusters stays value-identical, cross-batch edges generated
    AFTER the fold still see every folded band key, and the warm-started
    refresh (watermark BELOW the fold target, so folded edges re-surface
    above it) still equals a cold recompute."""
    from client_data_ingester_spark.streaming.cluster_stream import (
        compact_cluster_state,
        merged_clusters,
        refresh_cluster_index,
        start_cluster_edge_stream,
    )
    from client_data_ingester_spark.operators.dedup import load_cluster_index

    src = tmp_path / "docs"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    state = str(tmp_path / "state")
    idx = str(tmp_path / "idx")
    texts = {
        1: "alpha beta gamma delta epsilon",
        2: "alpha beta gamma delta epsilon",  # dup of 1
        3: "wholly different text one two",
        4: "alpha beta gamma delta epsilon",  # chains 1-2-4
        5: "another unique document here now",
    }
    q = start_cluster_edge_stream(spark, str(src), ckpt, state)
    try:
        for b, (did, text) in enumerate(texts.items()):
            _write_docs(src / f"b{b}.json", [{"doc_id": did, "text": text}])
            q.processAllAvailable()
    finally:
        q.stop()
    # refresh once NOW so the watermark sits below the upcoming fold id
    refresh_cluster_index(spark, state, idx)
    before = {
        (r["doc_id"], r["cluster_id"])
        for r in merged_clusters(spark, state).collect()
    }
    assert len(batch_shard_ids(f"{state}/bands")) >= 5
    res = compact_cluster_state(spark, state, keep_last=1, min_shards=3)
    assert res["bands"] is not None and res["edges"] is not None
    assert len(batch_shard_ids(f"{state}/bands")) == 2
    assert len(batch_shard_ids(f"{state}/edges")) == 2
    after = {
        (r["doc_id"], r["cluster_id"])
        for r in merged_clusters(spark, state).collect()
    }
    assert after == before
    # a post-fold batch still pairs against FOLDED band keys: doc 6
    # duplicates doc 1, whose band shard was folded
    q2 = start_cluster_edge_stream(spark, str(src), ckpt, state)
    try:
        _write_docs(
            src / "b9.json",
            [{"doc_id": 6, "text": "alpha beta gamma delta epsilon"}],
        )
        q2.processAllAvailable()
    finally:
        q2.stop()
    final = {
        (r["doc_id"], r["cluster_id"])
        for r in merged_clusters(spark, state).collect()
    }
    assert (6, 1) in final
    # warm-started refresh across the fold boundary == cold recompute
    refresh_cluster_index(spark, state, idx)
    warm = {
        (r["doc_id"], r["cluster_id"])
        for r in load_cluster_index(spark, idx).collect()
    }
    assert warm == final


def test_change_feed_prune_bounds_version_dirs(spark, tmp_path):
    """The CDC feed's version=N dirs are the last unbounded accumulator:
    prune() must delete fully-published dirs beyond the retention bound,
    never the cursor-adjacent ones, and the surviving feed must still
    read through the explicit schema."""
    from client_data_ingester_spark.schemas import CLIENT_PRODUCTS_SCHEMA
    from client_data_ingester_spark.streaming.changes_stream import (
        ChangeFeedPublisher,
        feed_schema,
    )
    from client_data_ingester_spark.tables import SnapshotTable

    def _row(i, sku):
        return (
            i, 1, sku, None, None, f"t{i}", None, None, True,
            None, None, None,
        )

    table = SnapshotTable(str(tmp_path / "tbl"), CLIENT_PRODUCTS_SCHEMA)
    feed = str(tmp_path / "feed")
    pub = ChangeFeedPublisher(spark, table, ["client_id", "sku"], feed)
    for v in range(1, 8):
        table.overwrite_partitions(
            spark.createDataFrame(
                [_row(v, f"S{v}")], CLIENT_PRODUCTS_SCHEMA
            ),
            [1],
        )
        pub.poll()
    dirs = [d for d in os.listdir(feed) if d.startswith("version=")]
    assert len(dirs) == 7
    pruned = pub.prune(keep_versions=3)
    assert pruned == [1, 2, 3, 4]
    left = sorted(
        int(d.split("=")[1])
        for d in os.listdir(feed)
        if d.startswith("version=")
    )
    assert left == [5, 6, 7]
    rows = (
        spark.read.schema(feed_schema(table, ["sku"]))
        .option("basePath", feed)
        .parquet(feed + "/version=*")
        .count()
    )
    assert rows > 0


def test_dedup_output_compaction_preserves_first_seen_rows(spark, tmp_path):
    """The dedup sink's convenience compactor folds doc shards keyed on
    doc_id: the surviving corpus is row-identical and the dir count
    collapses, on the REAL stream's output."""
    from client_data_ingester_spark.streaming.dedup_stream import (
        compact_output,
        start_dedup_stream_to_parquet,
    )

    src = tmp_path / "docs"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    ts = "2024-01-01T10:{:02d}:00.000Z"
    q = start_dedup_stream_to_parquet(
        spark, str(src), ckpt, out, reader_options={"maxFilesPerTrigger": 1}
    )
    try:
        for b in range(8):
            _write_docs(
                src / f"b{b}.json",
                [{"doc_id": b, "ts": ts.format(b), "text": f"text {b}"}],
            )
        q.processAllAvailable()
    finally:
        q.stop()
    before = {
        (r["doc_id"], r["text"])
        for r in spark.read.parquet(out).select("doc_id", "text").collect()
    }
    # >= 8: with maxFilesPerTrigger=1 each file lands its own batch, but
    # the stream may additionally fire an empty batch 0 if its first
    # trigger races the first file write (seen under box load) — the
    # contract is one-shard-per-file, not an exact total
    assert len(batch_shard_ids(out)) >= 8
    assert compact_output(spark, out, keep_last=1, min_shards=4) is not None
    assert len(batch_shard_ids(out)) == 2
    after = {
        (r["doc_id"], r["text"])
        for r in spark.read.parquet(out).select("doc_id", "text").collect()
    }
    assert after == before


def test_recovery_completes_interrupted_publish(spark, tmp_path):
    """Crash after the manifest is written but before sources are
    deleted (the staged fold is durable, the publish never ran):
    recovery must finish the publish with zero row loss."""
    import json as _json

    from client_data_ingester_spark.streaming.compaction import (
        recover_compaction,
    )

    shard_dir = str(tmp_path / "edges")
    _write_shards(spark, shard_dir, 6, lambda b: [(b, b + 1)])
    before = {
        (r["doc_a"], r["doc_b"])
        for r in spark.read.parquet(shard_dir).select("doc_a", "doc_b").collect()
    }
    # simulate the crash state: stage the fold of ids 0..4 + manifest,
    # sources still on disk
    fold = [0, 1, 2, 3, 4]
    src = spark.read.option("basePath", shard_dir).parquet(
        *[f"{shard_dir}/batch_id={b}" for b in fold]
    )
    src.select("doc_a", "doc_b").write.mode("overwrite").parquet(
        f"{shard_dir}/_compact_tmp"
    )
    with open(f"{shard_dir}/_compact_manifest.json", "w") as fh:
        _json.dump({"target": 4, "fold": fold}, fh)
    assert recover_compaction(shard_dir) is True
    assert batch_shard_ids(shard_dir) == [4, 5]
    after = {
        (r["doc_a"], r["doc_b"])
        for r in spark.read.parquet(shard_dir).select("doc_a", "doc_b").collect()
    }
    assert after == before
    assert not os.path.exists(f"{shard_dir}/_compact_manifest.json")
    # nothing left to recover
    assert recover_compaction(shard_dir) is False


def test_recovery_clears_leftover_sources_after_publish(spark, tmp_path):
    """Crash after the rename published the fold but before the leftover
    source dirs were deleted: readers see duplicates (absorbed by
    set-merge), and recovery removes them without touching the
    published target."""
    import json as _json

    from client_data_ingester_spark.streaming.compaction import (
        recover_compaction,
    )

    shard_dir = str(tmp_path / "edges")
    _write_shards(spark, shard_dir, 6, lambda b: [(b, b + 1)])
    before = {
        (r["doc_a"], r["doc_b"])
        for r in spark.read.parquet(shard_dir).select("doc_a", "doc_b").collect()
    }
    # simulate: fold of 0..4 already renamed into batch_id=4, but
    # sources 0..3 were never deleted and the manifest remains
    fold = [0, 1, 2, 3, 4]
    src = spark.read.option("basePath", shard_dir).parquet(
        *[f"{shard_dir}/batch_id={b}" for b in fold]
    )
    folded = src.select("doc_a", "doc_b").localCheckpoint()
    import shutil as _sh

    _sh.rmtree(f"{shard_dir}/batch_id=4")
    folded.write.mode("overwrite").parquet(f"{shard_dir}/batch_id=4")
    with open(f"{shard_dir}/_compact_manifest.json", "w") as fh:
        _json.dump({"target": 4, "fold": fold}, fh)
    # duplicate window: rows from 0..3 exist twice right now
    assert recover_compaction(shard_dir) is True
    assert batch_shard_ids(shard_dir) == [4, 5]
    after = {
        (r["doc_a"], r["doc_b"])
        for r in spark.read.parquet(shard_dir).select("doc_a", "doc_b").collect()
    }
    assert after == before


# ---------------------------------------------------------------------------
# Committer seam (VERDICT r11 ask #2): the same crash-injection contracts
# must hold under BOTH publish protocols — POSIX atomic rename and the
# object-store-shaped pointer-file committer (DELETE + per-object COPY,
# no rename anywhere).
# ---------------------------------------------------------------------------

import pytest

from client_data_ingester_spark.tables.committer import (
    PointerFileCommitter,
    PosixCommitter,
)

COMMITTERS = [PosixCommitter, PointerFileCommitter]


@pytest.mark.parametrize("committer_cls", COMMITTERS)
def test_compaction_roundtrip_under_both_committers(
    spark, tmp_path, committer_cls
):
    """Happy-path fold is value-identical and dir-bounded under either
    publish protocol."""
    shard_dir = str(tmp_path / "edges")
    _write_shards(spark, shard_dir, 8, lambda b: [(b, b + 1), (b, b + 2)])
    before = {
        (r["doc_a"], r["doc_b"])
        for r in spark.read.parquet(shard_dir).collect()
    }
    out = compact_batch_shards(
        spark, shard_dir, keep_last=1, min_shards=4,
        committer=committer_cls(),
    )
    assert out == 6
    assert batch_shard_ids(shard_dir) == [6, 7]
    after = {
        (r["doc_a"], r["doc_b"])
        for r in spark.read.parquet(shard_dir).collect()
    }
    assert after == before
    assert not os.path.exists(f"{shard_dir}/_compact_tmp")
    assert not os.path.exists(f"{shard_dir}/_compact_manifest.json")


@pytest.mark.parametrize("committer_cls", COMMITTERS)
def test_recovery_completes_interrupted_publish_both_committers(
    spark, tmp_path, committer_cls
):
    """Crash after the manifest publish, before sources were deleted:
    recovery finishes the install with zero row loss — under both
    protocols."""
    from client_data_ingester_spark.streaming.compaction import (
        recover_compaction,
    )

    shard_dir = str(tmp_path / "edges")
    _write_shards(spark, shard_dir, 6, lambda b: [(b, b + 1)])
    before = {
        (r["doc_a"], r["doc_b"])
        for r in spark.read.parquet(shard_dir).collect()
    }
    fold = [0, 1, 2, 3, 4]
    src = spark.read.option("basePath", shard_dir).parquet(
        *[f"{shard_dir}/batch_id={b}" for b in fold]
    )
    src.select("doc_a", "doc_b").write.mode("overwrite").parquet(
        f"{shard_dir}/_compact_tmp"
    )
    c = committer_cls()
    c.put_atomic(
        f"{shard_dir}/_compact_manifest.json",
        json.dumps({"target": 4, "fold": fold}).encode(),
    )
    assert recover_compaction(shard_dir, c) is True
    assert batch_shard_ids(shard_dir) == [4, 5]
    after = {
        (r["doc_a"], r["doc_b"])
        for r in spark.read.parquet(shard_dir).collect()
    }
    assert after == before
    assert recover_compaction(shard_dir, c) is False


@pytest.mark.parametrize("committer_cls", COMMITTERS)
def test_recovery_replays_crash_mid_install(spark, tmp_path, committer_cls):
    """Crash DURING the install itself (target half-written, staged fold
    still complete): recovery must replay the install idempotently.
    This is the window the pointer-file committer's per-object COPY
    widens relative to an atomic rename — the staged ``_SUCCESS``
    branch has to repair it under both protocols."""
    from client_data_ingester_spark.streaming.compaction import (
        recover_compaction,
    )

    shard_dir = str(tmp_path / "edges")
    _write_shards(spark, shard_dir, 6, lambda b: [(b, b + 1)])
    before = {
        (r["doc_a"], r["doc_b"])
        for r in spark.read.parquet(shard_dir).collect()
    }
    fold = [0, 1, 2, 3, 4]
    src = spark.read.option("basePath", shard_dir).parquet(
        *[f"{shard_dir}/batch_id={b}" for b in fold]
    )
    src.select("doc_a", "doc_b").write.mode("overwrite").parquet(
        f"{shard_dir}/_compact_tmp"
    )
    c = committer_cls()
    c.put_atomic(
        f"{shard_dir}/_compact_manifest.json",
        json.dumps({"target": 4, "fold": fold}).encode(),
    )
    # simulate: sources deleted, then the install died half-way —
    # target dir holds a partial copy (one data file missing)
    import shutil as _sh

    for b in fold[:-1]:
        _sh.rmtree(f"{shard_dir}/batch_id={b}")
    tgt = f"{shard_dir}/batch_id=4"
    _sh.rmtree(tgt)
    os.makedirs(tgt)
    staged_files = sorted(os.listdir(f"{shard_dir}/_compact_tmp"))
    copied = [f for f in staged_files if f.endswith(".parquet")][:1]
    for f in copied:
        _sh.copyfile(f"{shard_dir}/_compact_tmp/{f}", f"{tgt}/{f}")
    assert recover_compaction(shard_dir, c) is True
    assert batch_shard_ids(shard_dir) == [4, 5]
    after = {
        (r["doc_a"], r["doc_b"])
        for r in spark.read.parquet(shard_dir).collect()
    }
    assert after == before


def test_recovery_discards_truncated_manifest(spark, tmp_path):
    """ADVICE r11: a truncated manifest (pre-atomic-write leftover) with
    intact sources must be discarded — not raise JSONDecodeError forever
    and permanently block compaction."""
    from client_data_ingester_spark.streaming.compaction import (
        recover_compaction,
    )

    shard_dir = str(tmp_path / "edges")
    _write_shards(spark, shard_dir, 6, lambda b: [(b, b + 1)])
    before = {
        (r["doc_a"], r["doc_b"])
        for r in spark.read.parquet(shard_dir).collect()
    }
    with open(f"{shard_dir}/_compact_manifest.json", "w") as fh:
        fh.write('{"target": 4, "fo')  # torn mid-write
    assert recover_compaction(shard_dir) is True
    assert not os.path.exists(f"{shard_dir}/_compact_manifest.json")
    # sources intact; a fresh compaction proceeds normally
    out = compact_batch_shards(spark, shard_dir, keep_last=1, min_shards=4)
    assert out == 4
    after = {
        (r["doc_a"], r["doc_b"])
        for r in spark.read.parquet(shard_dir).collect()
    }
    assert after == before


def test_compaction_races_live_stream(spark, tmp_path):
    """Compaction under a LIVE writer (r11 verdict ask #6): fold twice
    while the foreachBatch stream is still appending shards, then assert
    the end state equals an uncompacted run. Safe by design — the fold
    never touches the newest ``keep_last`` dirs, the only replay
    candidates — but the listing/fold/install window had never actually
    raced a running writer before this test."""
    from client_data_ingester_spark.streaming.dedup_stream import (
        compact_output,
        start_dedup_stream_to_parquet,
    )

    src = tmp_path / "src"
    src.mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    ts = "2024-01-01T10:{:02d}:00.000Z"

    def _docs(path, docs):
        _write_docs(path, docs)

    q = start_dedup_stream_to_parquet(
        spark, str(src), ckpt, out, reader_options={"maxFilesPerTrigger": 1}
    )
    compactions = 0
    try:
        for b in range(12):
            _docs(
                src / f"b{b}.json",
                [{"doc_id": b, "ts": ts.format(b % 60), "text": f"text {b}"}],
            )
            if b in (5, 9):
                # let the writer get ahead, then compact MID-FLIGHT
                q.processAllAvailable()
                if compact_output(spark, out, keep_last=2, min_shards=3):
                    compactions += 1
        q.processAllAvailable()
    finally:
        q.stop()
    assert compactions == 2
    # dir count bounded: two folds collapsed the settled prefixes while
    # the stream kept appending above them
    assert len(batch_shard_ids(out)) < 12
    got = {
        (r["doc_id"], r["text"])
        for r in spark.read.parquet(out).select("doc_id", "text").collect()
    }
    assert got == {(b, f"text {b}") for b in range(12)}
    # no staging/manifest residue survived the races
    assert not os.path.exists(f"{out}/_compact_tmp")
    assert not os.path.exists(f"{out}/_compact_manifest.json")


class _InjectedCrash(RuntimeError):
    pass


def _crashing_committer(inner, crash_after):
    """Delegate every committer call to ``inner`` but raise after the
    first ``crash_after`` calls succeed — a systematic crash injector
    that hits EVERY call boundary of the publish protocol, not just
    hand-picked points."""
    from client_data_ingester_spark.tables.committer import Committer

    class Crashing(Committer):
        consistent_list = True  # delegates to a consistent inner store

        def __init__(self):
            self.calls = 0

        def _guard(self):
            self.calls += 1
            if self.calls > crash_after:
                raise _InjectedCrash(f"injected after {crash_after}")

    def _wrap(name):
        def m(self, *a, **kw):
            self._guard()
            return getattr(inner, name)(*a, **kw)
        return m

    for name in (
        "put_if_absent", "put_atomic", "get", "delete",
        "list_prefix", "publish_pointer", "read_current", "install_dir",
        "cleanup_staged", "delete_dir",
    ):
        setattr(Crashing, name, _wrap(name))
    return Crashing()


@pytest.mark.parametrize(
    "committer_cls", [PosixCommitter, PointerFileCommitter]
)
def test_crash_sweep_every_protocol_boundary(spark, tmp_path, committer_cls):
    """Sweep a crash across EVERY committer-call boundary of
    compact_batch_shards (manifest publish, each source deletion, the
    install, staging cleanup, manifest removal — plus the recovery
    reads), under BOTH commit protocols. After each crash: (a) no row
    may be lost — the union of live shards and the staged fold still
    holds every row; (b) a plain re-run (which recovers first) must
    converge to the exact no-crash end state."""
    expected = {(b, b + 1) for b in range(8)}

    def visible_rows(shard_dir):
        rows = set()
        ids = batch_shard_ids(shard_dir)
        if ids:
            df = spark.read.parquet(
                *[f"{shard_dir}/batch_id={b}" for b in ids]
            )
            rows |= {(r["doc_a"], r["doc_b"]) for r in df.collect()}
        tmp = os.path.join(shard_dir, "_compact_tmp")
        if os.path.exists(os.path.join(tmp, "_SUCCESS")):
            df = spark.read.parquet(tmp)
            rows |= {(r["doc_a"], r["doc_b"]) for r in df.collect()}
        return rows

    crash_points = 0
    k = 0
    while True:
        shard_dir = str(tmp_path / f"sweep_{committer_cls.__name__}_{k}")
        _write_shards(spark, shard_dir, 8, lambda b: [(b, b + 1)])
        try:
            compact_batch_shards(
                spark, shard_dir, keep_last=1, min_shards=2,
                committer=_crashing_committer(committer_cls(), k),
            )
            completed = True
        except _InjectedCrash:
            completed = False
            crash_points += 1
        # (a) crash state never loses a row (staged ∪ shards ⊇ all)
        assert visible_rows(shard_dir) >= expected, f"rows lost at k={k}"
        # (b) recovery + refold converges to the no-crash end state
        compact_batch_shards(
            spark, shard_dir, keep_last=1, min_shards=2,
            committer=committer_cls(),
        )
        assert visible_rows(shard_dir) == expected, f"diverged at k={k}"
        ids = batch_shard_ids(shard_dir)
        assert len(ids) <= 2, f"dirs not bounded at k={k}: {ids}"
        assert not os.path.exists(
            os.path.join(shard_dir, "_compact_manifest.json")
        )
        if completed:
            break
        k += 1
    # the sweep must have actually exercised the protocol's interior
    assert crash_points >= 6, crash_points


def test_recovery_discards_key_incomplete_manifest(spark, tmp_path):
    """ADVICE r12: a VALID-JSON manifest missing 'target' or 'fold' must
    take the same discard branch as a truncated one — raising KeyError
    would permanently wedge compaction (recover runs at the start of
    every compact call). Like the truncated case, such a manifest can
    only predate any source deletion, so sources are intact."""
    from client_data_ingester_spark.streaming.compaction import (
        recover_compaction,
    )

    shard_dir = str(tmp_path / "edges")
    _write_shards(spark, shard_dir, 6, lambda b: [(b, b + 1)])
    before = {
        (r["doc_a"], r["doc_b"])
        for r in spark.read.parquet(shard_dir).collect()
    }
    for bad in ('{"target": 4}', '{"fold": [0, 1]}', '[1, 2]', '"x"'):
        with open(f"{shard_dir}/_compact_manifest.json", "w") as fh:
            fh.write(bad)
        assert recover_compaction(shard_dir) is True
        assert not os.path.exists(f"{shard_dir}/_compact_manifest.json")
    # sources intact; a fresh compaction proceeds normally
    out = compact_batch_shards(spark, shard_dir, keep_last=1, min_shards=4)
    assert out == 4
    after = {
        (r["doc_a"], r["doc_b"])
        for r in spark.read.parquet(shard_dir).collect()
    }
    assert after == before


def _visible_edge_set(spark, shard_dir):
    """What a gated merge-on-read consumer sees right now (the
    merged_edges read shape: complete shards only, race-tolerant)."""
    from client_data_ingester_spark.streaming.compaction import (
        read_complete_shards,
    )

    df = read_complete_shards(spark, shard_dir)
    if df is None:
        return set()
    return {(r["doc_a"], r["doc_b"]) for r in df.select("doc_a", "doc_b").collect()}


def _dir_rows(spark, path):
    return {
        (r["doc_a"], r["doc_b"])
        for r in spark.read.parquet(path).select("doc_a", "doc_b").collect()
    }


def test_reader_never_sees_torn_pointer_install(spark, tmp_path,
                                                monkeypatch):
    """r12 verdict ask #2: the PointerFileCommitter install window.
    DELETE+COPY exposes a partial target dir to a lister — the reader
    gate (complete_shard_paths skips dirs without _SUCCESS) must make
    every observable state either pre-install, post-install, or the
    documented folded-rows-missing window. Crash the install after
    every possible number of copied objects and assert, at each crash
    point, that (a) the consumer view is legal and (b) the target dir,
    whenever it IS complete, holds exactly its old content or exactly
    the full fold — never a strict subset."""
    import shutil as _sh

    from client_data_ingester_spark.tables import committer as cm

    FULL = {(b, b + 1) for b in range(6)}
    TAIL = {(5, 6)}  # keep_last=1 leaves shard 5 unfolded
    OLD_TARGET = {(4, 5)}
    FOLD = {(b, b + 1) for b in range(5)}

    real_copy = _sh.copyfile
    k = 0
    while True:
        shard_dir = str(tmp_path / f"race_{k}")
        _write_shards(spark, shard_dir, 6, lambda b: [(b, b + 1)])
        state = {"copies": 0}

        def crashing_copy(src, dst, k=k, state=state):
            if state["copies"] >= k:
                raise _InjectedCrash(f"copy #{state['copies']}")
            state["copies"] += 1
            return real_copy(src, dst)

        monkeypatch.setattr(cm.shutil, "copyfile", crashing_copy)
        try:
            compact_batch_shards(
                spark, shard_dir, keep_last=1, min_shards=2,
                committer=PointerFileCommitter(),
            )
            completed = True
        except _InjectedCrash:
            completed = False
        finally:
            monkeypatch.setattr(cm.shutil, "copyfile", real_copy)

        # (a) the consumer view in the crash state is a LEGAL set:
        # somewhere between "folded rows missing" and the full corpus,
        # never rows that exist in no version of the artifact
        seen = _visible_edge_set(spark, shard_dir)
        assert TAIL <= seen <= FULL, (k, seen)
        # (b) a COMPLETE target dir is never a torn fold
        target = f"{shard_dir}/batch_id=4"
        if os.path.exists(os.path.join(target, "_SUCCESS")):
            content = _dir_rows(spark, target)
            assert content in (OLD_TARGET, FOLD), (k, content)
        # recovery converges to the post-install state
        compact_batch_shards(
            spark, shard_dir, keep_last=1, min_shards=2,
            committer=PointerFileCommitter(),
        )
        assert _visible_edge_set(spark, shard_dir) == FULL, k
        assert _dir_rows(spark, target) == FOLD, k
        if completed:
            break
        k += 1
    assert k >= 2, k  # the sweep actually got inside the copy loop


@pytest.mark.parametrize("committer_cls", COMMITTERS)
def test_reader_races_live_compaction(spark, tmp_path, committer_cls):
    """A reader thread hammering the gated read while a compaction runs
    (both committers): every observed set must be legal — between the
    folded-missing window and the full set — and the end state exact."""
    import threading

    shard_dir = str(tmp_path / f"live_{committer_cls.__name__}")
    _write_shards(spark, shard_dir, 8, lambda b: [(b, b + 1)])
    FULL = {(b, b + 1) for b in range(8)}
    TAIL = {(7, 8)}
    observed = []
    stop = threading.Event()

    def reader():
        while not stop.is_set():
            observed.append(_visible_edge_set(spark, shard_dir))

    th = threading.Thread(target=reader)
    th.start()
    try:
        compact_batch_shards(
            spark, shard_dir, keep_last=1, min_shards=2,
            committer=committer_cls(),
        )
    finally:
        stop.set()
        th.join()
    assert observed, "reader never ran"
    for s in observed:
        assert TAIL <= s <= FULL, s
    assert _visible_edge_set(spark, shard_dir) == FULL


def test_missing_path_predicate_covers_all_spark_error_forms():
    """r13 ADVICE: the LIST→ANALYZE retry must recognize a vanished path
    in every form Spark emits it — errorClass attribute (3.4+), the
    class name in the message, and the legacy 'Path does not exist'
    text — and must NOT swallow unrelated analysis errors."""
    from client_data_ingester_spark.streaming.compaction import (
        _is_missing_path_error,
    )

    class _ErrWithClass(Exception):
        def __init__(self, msg, klass):
            super().__init__(msg)
            self._k = klass

        def getErrorClass(self):
            return self._k

    assert _is_missing_path_error(
        _ErrWithClass("[PATH_NOT_FOUND] Path does not exist: file:/x",
                      "PATH_NOT_FOUND")
    )
    # error class only (message localized/reworded)
    assert _is_missing_path_error(_ErrWithClass("gone", "PATH_NOT_FOUND"))

    # Spark 4 spelling: getCondition, no getErrorClass at all
    class _ErrWithCondition(Exception):
        def getCondition(self):
            return "PATH_NOT_FOUND"

    assert _is_missing_path_error(_ErrWithCondition("gone"))
    # legacy pre-error-class message, getErrorClass absent entirely
    assert _is_missing_path_error(
        Exception("Path does not exist: file:/tmp/shards/batch_id=3")
    )
    # getErrorClass returning None must not break the message fallback
    assert _is_missing_path_error(
        _ErrWithClass("[PATH_NOT_FOUND] nope", None)
    )
    # unrelated analysis errors re-raise
    assert not _is_missing_path_error(
        _ErrWithClass("[UNRESOLVED_COLUMN] no such column", "UNRESOLVED_COLUMN")
    )
    assert not _is_missing_path_error(Exception("schema mismatch"))


def test_missing_path_predicate_covers_footer_job_failures():
    """schema=None inference reads footers in a Spark job BEFORE the
    scan's ignoreMissingFiles exists — a mid-race deletion surfaces as
    Py4JJavaError/SparkException with FileNotFoundException buried in
    the Java stack text (observed from the racing-reader adversary).
    The retry predicate must catch that form and still re-raise
    unrelated job failures."""
    from client_data_ingester_spark.streaming.compaction import (
        _is_missing_path_error,
    )

    java_stack = (
        "An error occurred while calling o1.parquet.\n"
        ": org.apache.spark.SparkException: Job aborted due to stage "
        "failure: ... Caused by: java.io.FileNotFoundException: File "
        "file:/tmp/shards/batch_id=3/part-0.parquet does not exist"
    )
    assert _is_missing_path_error(Exception(java_stack))
    assert not _is_missing_path_error(
        Exception("Job aborted: java.lang.OutOfMemoryError: heap")
    )
