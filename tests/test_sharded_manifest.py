"""Sharded manifest layout: Iceberg-shaped manifest list + per-group
manifest files (the tenant-cardinality seam PLANS.md's round-12 tenant
measurements point at).

The single-blob manifest is O(clients) bytes REWRITTEN PER COMMIT — fine
to ~10k tenants (measured: 299 KB / 4.2 ms parse), pathological at 1M
(~30 MB per single-tenant ingest). The sharded layout hashes each
partition value into one of ``manifest_groups`` group files and a commit
rewrites only the groups it touches plus a small version file (the
manifest list), so write amplification is O(clients/groups + groups).
Retention GC becomes an O(commit) deletion-ledger walk instead of a
root listing; shared data dirs (multi-partition commits) are reclaimed
by the explicit ``vacuum()`` maintenance call — the same
commit-path/maintenance split Iceberg draws with remove_orphan_files.
"""

import json
import os

import pytest

from client_data_ingester_spark.schemas import CLIENT_PRODUCTS_SCHEMA
from client_data_ingester_spark.tables import SnapshotTable
from client_data_ingester_spark.tables.committer import (
    PointerFileCommitter,
    PosixCommitter,
)
from client_data_ingester_spark.tables.snapshot import (
    _GROUP_PREFIX,
    _MANIFEST,
    SnapshotConflictError,
)

COMMITTERS = [PosixCommitter, PointerFileCommitter]


def _df(spark, client_id, skus):
    rows = [
        (i + 1, client_id, sku, None, None, None, None, None, True,
         None, None, None)
        for i, sku in enumerate(skus)
    ]
    return spark.createDataFrame(rows, CLIENT_PRODUCTS_SCHEMA)


def _skus(df):
    return sorted(r["sku"] for r in df.select("sku").collect())


def _sharded(tmp_path, committer_cls=PosixCommitter, **kw):
    kw.setdefault("manifest_groups", 8)
    return SnapshotTable(
        str(tmp_path / "t"), CLIENT_PRODUCTS_SCHEMA,
        committer=committer_cls(), manifest_layout="sharded", **kw,
    )


def _group_files(root):
    return sorted(n for n in os.listdir(root) if n.startswith(_GROUP_PREFIX))


def _data_dirs(root):
    return sorted(
        n for n in os.listdir(root)
        if os.path.isdir(os.path.join(root, n))
    )


@pytest.mark.parametrize("committer_cls", COMMITTERS)
def test_roundtrip_time_travel_and_pruned_read(spark, tmp_path, committer_cls):
    t = _sharded(tmp_path, committer_cls)
    t.overwrite_partitions(_df(spark, 1, ["A", "B"]), [1])
    t.overwrite_partitions(_df(spark, 2, ["C"]), [2])
    t.overwrite_partitions(_df(spark, 1, ["A2"]), [1])
    assert t.current_manifest().version == 3
    assert _skus(t.read(spark)) == ["A2", "C"]
    assert _skus(t.read(spark, version=2)) == ["A", "B", "C"]
    # partition-scoped read resolves through ONE group file
    assert _skus(t.read(spark, partition_value=2)) == ["C"]
    assert _skus(t.read(spark, partition_value=1)) == ["A2"]


def test_commit_rewrites_only_touched_groups(spark, tmp_path):
    """The write-amplification contract: a single-tenant commit writes
    one new group file + one version file; every other group's sha rides
    forward untouched."""
    t = _sharded(tmp_path, manifest_groups=16)
    # spread tenants over several groups
    for cid in range(1, 9):
        t.overwrite_partitions(_df(spark, cid, [f"S{cid}"]), [cid])
    doc_before = t.current_doc()
    groups_before = dict(doc_before.groups)
    t.overwrite_partitions(_df(spark, 3, ["S3b"]), [3])
    doc_after = t.current_doc()
    gid = t._group_of("3")
    changed = {
        g for g in set(groups_before) | set(doc_after.groups)
        if groups_before.get(g) != doc_after.groups.get(g)
    }
    assert changed == {str(gid)}
    # and the version file itself is small: group shas + props, not
    # a partitions blob
    payload = json.loads(
        t.committer.get(t._manifest_path(doc_after.version)).decode()
    )
    assert "partitions" not in payload
    assert payload["layout"] == "sharded"


def test_version_file_bytes_sublinear_in_tenant_count(spark, tmp_path):
    """The headline bound: metadata bytes written per single-tenant
    commit must NOT grow linearly with total tenant count (the single
    layout's defect). Seed N tenants in one overwrite_all, then measure
    the one-tenant commit's new-file bytes at N=60 vs N=240: the
    version file is O(groups) and the touched group file O(N/groups),
    so the total must grow far slower than the 4x tenant growth."""
    import pyspark.sql.functions as F

    sizes = {}
    for n in (60, 240):
        t = SnapshotTable(
            str(tmp_path / f"t{n}"), CLIENT_PRODUCTS_SCHEMA,
            manifest_layout="sharded", manifest_groups=8,
        )
        cols = []
        for f in CLIENT_PRODUCTS_SCHEMA.fields:
            if f.name == "id":
                cols.append(F.col("id").cast(f.dataType).alias("id"))
            elif f.name == "client_id":
                cols.append((F.col("id") + 1).cast(f.dataType).alias(f.name))
            elif f.name == "sku":
                cols.append(F.concat(F.lit("S"), F.col("id")).alias("sku"))
            else:
                cols.append(F.lit(None).cast(f.dataType).alias(f.name))
        seed = spark.range(n).select(*cols)
        t.overwrite_all(seed)
        before = {
            n_: os.path.getsize(os.path.join(t.root, n_))
            for n_ in os.listdir(t.root)
            if not os.path.isdir(os.path.join(t.root, n_))
        }
        t.overwrite_partitions(_df(spark, 1, ["X"]), [1])
        after = {
            n_: os.path.getsize(os.path.join(t.root, n_))
            for n_ in os.listdir(t.root)
            if not os.path.isdir(os.path.join(t.root, n_))
        }
        sizes[n] = sum(
            sz for n_, sz in after.items()
            if n_ not in before or before[n_] != sz
        )
    # 4x tenants -> metadata write grows, but by the group-file share
    # (4x/8 groups) + a constant version file: well under 2x total
    assert sizes[240] < 2 * sizes[60], sizes


def test_ledger_gc_reclaims_single_owner_dirs(spark, tmp_path):
    """Displaced single-owner dirs die via the deletion ledger the
    moment the horizon reaches the displacing version — no root
    listing; old version files and freed group files go with them."""
    t = _sharded(tmp_path, keep_versions=2)
    for i in range(6):
        t.overwrite_partitions(_df(spark, 1, [f"S{i}"]), [1])
    assert t.current_manifest().version == 6
    # horizon = 4: dirs displaced at versions <= 4 are gone; the
    # retained window (v4..v6 readable, v5/v6 dirs + v4's surviving
    # dir) stays intact
    dirs = _data_dirs(t.root)
    assert len(dirs) == 3, dirs  # v4, v5, v6 incarnations of tenant 1
    assert _skus(t.read(spark)) == ["S5"]
    assert _skus(t.read(spark, version=5)) == ["S4"]
    assert t._manifest_at(2) is None
    # freed group files are reclaimed too: only shas referenced by the
    # retained versions remain
    live = set()
    for v in (4, 5, 6):
        doc = t._doc_at(v)
        for gid, sha in doc.groups.items():
            live.add(os.path.basename(t._group_path(int(gid), sha)))
    assert set(_group_files(t.root)) == live


def test_shared_dirs_survive_ledger_and_fall_to_vacuum(spark, tmp_path):
    """A multi-partition commit's dir is referenced by several tenants:
    displacing ONE of them must not ledger-delete the dir (the others
    still read it); vacuum() reclaims it only once every reference is
    past retention."""
    t = _sharded(tmp_path, keep_versions=1)
    both = _df(spark, 1, ["A"]).union(_df(spark, 2, ["B"]))
    t.overwrite_partitions(both, [1, 2])  # one dir, two partitions
    shared_dir = t.current_doc().partitions_for("1")[0]
    t.overwrite_partitions(_df(spark, 1, ["A2"]), [1])
    # push tenant 1's displacement past the horizon
    t.overwrite_partitions(_df(spark, 1, ["A3"]), [1])
    t.overwrite_partitions(_df(spark, 1, ["A4"]), [1])
    # tenant 2 still reads the shared dir
    assert os.path.isdir(os.path.join(t.root, shared_dir))
    assert _skus(t.read(spark, partition_value=2)) == ["B"]
    stats = t.vacuum()
    # still referenced by tenant 2 -> vacuum keeps it
    assert os.path.isdir(os.path.join(t.root, shared_dir))
    assert _skus(t.read(spark, partition_value=2)) == ["B"]
    # displace tenant 2 too and age it out; now vacuum reclaims
    t.overwrite_partitions(_df(spark, 2, ["B2"]), [2])
    t.overwrite_partitions(_df(spark, 2, ["B3"]), [2])
    stats = t.vacuum()
    assert not os.path.isdir(os.path.join(t.root, shared_dir))
    assert stats["dirs"] >= 1
    assert _skus(t.read(spark)) == ["A4", "B3"]


def test_layout_migration_single_to_sharded_and_back(spark, tmp_path):
    """Version files are self-describing: constructing the table with
    the other layout migrates it at the next commit, and reads spanning
    mixed-layout versions resolve each version by what it wrote."""
    root = str(tmp_path / "t")
    single = SnapshotTable(root, CLIENT_PRODUCTS_SCHEMA)
    single.overwrite_partitions(_df(spark, 1, ["A"]), [1])
    single.overwrite_partitions(_df(spark, 2, ["B"]), [2])
    sharded = SnapshotTable(
        root, CLIENT_PRODUCTS_SCHEMA, manifest_layout="sharded",
        manifest_groups=8,
    )
    # reads the single-layout head fine
    assert _skus(sharded.read(spark)) == ["A", "B"]
    # next commit migrates: tenant 2's dirs carry into group files
    sharded.overwrite_partitions(_df(spark, 1, ["A2"]), [1])
    assert sharded.current_doc().layout == "sharded"
    assert _skus(sharded.read(spark)) == ["A2", "B"]
    assert _skus(sharded.read(spark, partition_value=2)) == ["B"]
    # time travel across the layout boundary
    assert _skus(sharded.read(spark, version=2)) == ["A", "B"]
    # and back: a single-layout writer on the sharded table
    single2 = SnapshotTable(root, CLIENT_PRODUCTS_SCHEMA)
    single2.overwrite_partitions(_df(spark, 2, ["B2"]), [2])
    assert single2.current_doc().layout == "single"
    assert _skus(single2.read(spark)) == ["A2", "B2"]


def test_conflict_detection_under_sharded(spark, tmp_path):
    t = _sharded(tmp_path)
    t.overwrite_partitions(_df(spark, 1, ["A"]), [1])
    v1 = t.current_doc().version
    t.overwrite_partitions(_df(spark, 1, ["A2"]), [1])
    with pytest.raises(SnapshotConflictError):
        t.overwrite_partitions(
            _df(spark, 1, ["A3"]), [1], expected_version=v1
        )
    # an unrelated tenant's commit does NOT conflict a stale-version
    # writer whose own partitions are unchanged
    t.overwrite_partitions(
        _df(spark, 2, ["B"]), [2],
        expected_version=t.current_doc().version,
    )


def test_group_assignment_is_md5_stable(tmp_path):
    """The value->group mapping must be engine- and session-stable
    (md5, the package convention) — a drifting hash would orphan every
    partition from its group file."""
    t = _sharded(tmp_path, manifest_groups=16)
    assert t._group_of("1") == 8
    assert t._group_of("tenant-42") == 6


def test_full_ingest_path_on_sharded_table(spark, tmp_path):
    """The reference-parity ingest service (validate -> LWW fold ->
    full-outer merge -> id mint -> report, with the optimistic-
    concurrency version/max_id guards) composes with the sharded layout
    unchanged: the service reads version/props through the group-lazy
    doc and publishes through the same commit point."""
    import csv as _csv
    import io

    from client_data_ingester_spark.ingestion import (
        ParserConfig,
        ingest_data,
    )

    cfg = ParserConfig(
        "csv",
        {
            "sku": ("sku", "text"),
            "title": ("title", "text"),
            "active": ("active", "boolean"),
        },
    )

    def _csv_bytes(rows):
        buf = io.StringIO()
        w = _csv.DictWriter(buf, fieldnames=["sku", "title", "active"])
        w.writeheader()
        for r in rows:
            w.writerow(r)
        return buf.getvalue().encode()

    t = _sharded(tmp_path)
    rep = ingest_data(
        spark, t,
        _csv_bytes([
            {"sku": "A", "title": "one", "active": "1"},
            {"sku": "B", "title": "two", "active": "1"},
        ]),
        cfg, client_id=1,
    )
    assert rep.success, rep.message
    rep2 = ingest_data(
        spark, t,
        _csv_bytes([{"sku": "A", "title": "one v2", "active": "0"}]),
        cfg, client_id=1,
    )
    assert rep2.success, rep2.message
    got = {
        r["sku"]: r.asDict()
        for r in t.read(spark, partition_value=1).collect()
    }
    assert set(got) == {"A", "B"}
    assert got["A"]["title"] == "one v2"
    assert got["A"]["active"] is False
    assert got["B"]["title"] == "two"
    # ids minted across commits stay unique; max_id rode the doc props
    assert got["A"]["id"] != got["B"]["id"]
    assert int(t.current_doc().props["max_id"]) >= 2
    assert t.current_doc().layout == "sharded"


def test_recover_unwedges_crashed_pointer(spark, tmp_path):
    """Crash between the commit point and the POSIX pointer publish:
    version N exists, pointer says N-1. recover() re-points the head
    explicitly — and since r13 the publish path ALSO self-heals: the
    version collision re-derives the head and the commit-rebase loop
    retries against it in the same call, so the very first publish
    lands instead of conflicting until a manual recover()."""
    t = SnapshotTable(str(tmp_path / "t"), CLIENT_PRODUCTS_SCHEMA)
    t.overwrite_partitions(_df(spark, 1, ["A"]), [1])
    t.overwrite_partitions(_df(spark, 1, ["B"]), [1])
    # simulate the crash: hand-commit v3 without publishing the pointer
    m = t.current_manifest()
    m.version = 3
    assert t.committer.put_if_absent(
        t._manifest_path(3), m.to_json().encode()
    )
    assert t.current_doc().version == 2  # wedged: pointer still at 2
    # explicit repair path still works on an idle table
    assert t.recover() == 3
    assert t.current_doc().version == 3
    t.overwrite_partitions(_df(spark, 1, ["C"]), [1])
    assert t.current_doc().version == 4
    assert _skus(t.read(spark)) == ["C"]
    # and the IN-BAND repair: wedge again, then publish without recover()
    m = t.current_manifest()
    m.version = 5
    assert t.committer.put_if_absent(
        t._manifest_path(5), m.to_json().encode()
    )
    assert t.current_doc().version == 4  # wedged again
    t.overwrite_partitions(_df(spark, 1, ["D"]), [1])  # heals + commits
    assert t.current_doc().version == 6
    assert _skus(t.read(spark)) == ["D"]


@pytest.mark.parametrize("layout", ["single", "sharded"])
def test_full_read_excludes_stale_rows_in_shared_dirs(
    spark, tmp_path, layout
):
    """The shared-dir staleness bug (found by the randomized oracle
    below, present in BOTH layouts): a multi-partition commit writes one
    dir for several tenants; overwriting ONE of them later leaves its
    old rows inside the dir the others still reference, and a full-table
    read returned them alongside the new rows. The version's stale map
    now anti-filters exactly those (value, dir) combinations; tenant
    reads and time travel stay exact."""
    t = SnapshotTable(
        str(tmp_path / "t"), CLIENT_PRODUCTS_SCHEMA,
        manifest_layout=layout, manifest_groups=8,
    )
    both = _df(spark, 1, ["A1"]).union(_df(spark, 2, ["B1"]))
    t.overwrite_partitions(both, [1, 2])  # one shared dir
    t.overwrite_partitions(_df(spark, 1, ["A2"]), [1])
    # full read must NOT resurrect tenant 1's superseded A1 row
    assert _skus(t.read(spark)) == ["A2", "B1"]
    # tenant reads exact on both sides
    assert _skus(t.read(spark, partition_value=1)) == ["A2"]
    assert _skus(t.read(spark, partition_value=2)) == ["B1"]
    # time travel to the shared version still sees the original rows
    assert _skus(t.read(spark, version=1)) == ["A1", "B1"]
    # a second displacement accumulates; the other tenant's view holds
    t.overwrite_partitions(_df(spark, 2, ["B2"]), [2])
    assert _skus(t.read(spark)) == ["A2", "B2"]
    assert _skus(t.read(spark, version=2)) == ["A2", "B1"]


def test_stale_filter_is_null_safe(spark, tmp_path):
    """A NULL partition key inside a degraded shared dir must survive
    the stale anti-filter (bare ~isin() is NULL for NULL inputs and
    would silently drop the row from full reads). The products schema
    forbids NULL client_id, so this uses a generic nullable-key table."""
    import pyspark.sql.types as T

    schema = T.StructType(
        [
            T.StructField("k", T.LongType(), True),
            T.StructField("sku", T.StringType(), True),
        ]
    )

    def mk(rows):
        return spark.createDataFrame(rows, schema)

    t = SnapshotTable(
        str(tmp_path / "t"), schema, partition_col="k"
    )
    both = mk([(None, "NULLSKU"), (2, "B1")])
    t.overwrite_partitions(both, [None, 2])  # shared dir, one NULL key
    t.overwrite_partitions(mk([(2, "B2")]), [2])
    # tenant 2's B1 is stale; the NULL-key row must remain visible
    assert _skus(t.read(spark)) == ["B2", "NULLSKU"]
    # and a stale 'None' partition is itself filtered correctly
    t2 = SnapshotTable(
        str(tmp_path / "t2"), schema, partition_col="k"
    )
    t2.overwrite_partitions(both, [None, 2])
    t2.overwrite_partitions(mk([(None, "NULLSKU2")]), [None])
    assert _skus(t2.read(spark)) == ["B1", "NULLSKU2"]


def test_randomized_op_sequence_matches_python_oracle(spark, tmp_path):
    """Seeded randomized sequence over the sharded table — single- and
    multi-tenant overwrites, full replaces, compactions, vacuums —
    checked after every op against a pure-Python model: head reads,
    tenant-scoped reads, and time travel across the whole retention
    window. This is the machine check on the ledger-GC invariants the
    design argues by hand (single-owner vs shared dir ownership,
    freed-sha safety, horizon timing): a dir deleted one version too
    early, or a group file freed while an older retained version still
    references it, surfaces as a read mismatch or a missing-file raise
    somewhere in the sweep."""
    import random

    rng = random.Random(42)
    t = _sharded(tmp_path, keep_versions=2, manifest_groups=4)
    model: dict[str, list[str]] = {}  # tenant -> skus at head
    history: dict[int, dict[str, list[str]]] = {0: {}}

    def commit(values, skus_per_value):
        df = None
        for v, skus in zip(values, skus_per_value):
            part = _df(spark, int(v), skus)
            df = part if df is None else df.union(part)
            model[v] = list(skus)
        t.overwrite_partitions(df, [int(v) for v in values])
        history[t.current_doc().version] = {
            k: list(vs) for k, vs in model.items()
        }

    tenants = [str(i) for i in range(1, 7)]
    for step in range(24):
        op = rng.random()
        if op < 0.55:
            v = rng.choice(tenants)
            commit([v], [[f"{v}-s{step}-{j}" for j in range(rng.randint(1, 2))]])
        elif op < 0.75:
            vs = rng.sample(tenants, rng.randint(2, 3))
            commit(vs, [[f"{v}-m{step}"] for v in vs])
        elif op < 0.85 and model:
            # full replace: two tenants survive, everyone else dropped
            keep = rng.sample(tenants, 2)
            df = _df(spark, int(keep[0]), [f"{keep[0]}-r{step}"]).union(
                _df(spark, int(keep[1]), [f"{keep[1]}-r{step}"])
            )
            t.overwrite_all(df)
            model.clear()
            model[keep[0]] = [f"{keep[0]}-r{step}"]
            model[keep[1]] = [f"{keep[1]}-r{step}"]
            history[t.current_doc().version] = {
                k: list(vs) for k, vs in model.items()
            }
        elif op < 0.95 and model:
            v = rng.choice(sorted(model))
            t.compact(spark, int(v), target_files=1)
            history[t.current_doc().version] = {
                k: list(vs) for k, vs in model.items()
            }
        else:
            t.vacuum()

        # head read == model
        expect = sorted(s for vs in model.values() for s in vs)
        assert _skus(t.read(spark)) == expect, f"step {step} head diverged"
        # tenant-scoped read == model
        v = rng.choice(tenants)
        assert _skus(t.read(spark, partition_value=int(v))) == sorted(
            model.get(v, [])
        ), f"step {step} tenant {v} diverged"
        # time travel: every version inside the retention window must
        # reproduce its historical model exactly
        head = t.current_doc().version
        for tv in range(max(1, head - t.keep_versions), head + 1):
            if tv not in history:
                continue
            hist = sorted(
                s for vs in history[tv].values() for s in vs
            )
            assert _skus(t.read(spark, version=tv)) == hist, (
                f"step {step} time travel v{tv} diverged"
            )
    # closing sweep: vacuum must not disturb any retained read
    t.vacuum()
    assert _skus(t.read(spark)) == sorted(
        s for vs in model.values() for s in vs
    )


def test_streaming_ingest_on_sharded_pointer_table(spark, tmp_path):
    """The object-store-shaped 1M-tenant configuration in one piece:
    Structured-Streaming ingest (epoch-transactional foreachBatch merge)
    onto a SHARDED-manifest table committed through the
    POINTER-FILE protocol — the exact stack a cloud deployment runs."""
    from client_data_ingester_spark.ingestion.mapping import ParserConfig
    from client_data_ingester_spark.streaming import start_ingest_stream

    cfg = ParserConfig(
        "csv",
        {
            "sku": ("sku", "text"),
            "title": ("title", "text"),
            "active": ("active", "boolean"),
        },
    )
    t = SnapshotTable(
        str(tmp_path / "t"), CLIENT_PRODUCTS_SCHEMA,
        committer=PointerFileCommitter(),
        manifest_layout="sharded", manifest_groups=8,
    )
    landing = tmp_path / "landing"
    landing.mkdir()
    (landing / "f1.csv").write_text(
        "sku,title,active\nS1,First,1\nS2,Second,1\n"
    )
    q = start_ingest_stream(
        spark, t, str(landing), str(tmp_path / "ckpt"), cfg,
        client_id=1, source_columns=["sku", "title", "active"],
    )
    q.awaitTermination(120)
    assert _skus(t.read(spark, partition_value=1)) == ["S1", "S2"]
    (landing / "f2.csv").write_text(
        "sku,title,active\nS1,Updated,0\nS3,Third,1\n"
    )
    q2 = start_ingest_stream(
        spark, t, str(landing), str(tmp_path / "ckpt"), cfg,
        client_id=1, source_columns=["sku", "title", "active"],
    )
    q2.awaitTermination(120)
    got = {
        r["sku"]: r.asDict()
        for r in t.read(spark, partition_value=1).collect()
    }
    assert set(got) == {"S1", "S2", "S3"}
    assert got["S1"]["title"] == "Updated"
    assert got["S1"]["active"] is False
    assert t.current_doc().layout == "sharded"
    # head resolution survives losing the advisory pointer entirely
    os.remove(os.path.join(t.root, _MANIFEST))
    assert _skus(t.read(spark, partition_value=1)) == ["S1", "S2", "S3"]


class _InjectedCrash(RuntimeError):
    pass


def _crashing_committer(inner, crash_after):
    """Delegate to ``inner`` but raise after ``crash_after`` successful
    calls — sweeps a crash across every boundary of the snapshot commit
    protocol (conditional put, pointer publish, GC reads/deletes)."""
    from client_data_ingester_spark.tables.committer import Committer

    class Crashing(Committer):
        consistent_list = True  # delegates to a consistent inner store

        def __init__(self):
            self.calls = 0

        def _guard(self):
            self.calls += 1
            if self.calls > crash_after:
                raise _InjectedCrash(f"after {crash_after}")

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


@pytest.mark.parametrize("committer_cls", COMMITTERS)
@pytest.mark.parametrize("layout", ["single", "sharded"])
def test_publish_crash_sweep_converges(spark, tmp_path, committer_cls, layout):
    """Sweep a crash across every committer-call boundary of a snapshot
    commit (group writes, the conditional-put commit point, pointer
    publish, ledger/sweep GC), under both protocols and both layouts.
    After each crash: recover() + a retried commit must land the write
    exactly once, with reads (head, tenant, retained time travel)
    consistent. This drives recover() through the real wedge (POSIX
    crash between commit point and pointer publish) rather than the
    hand-built simulation above."""
    k = 0
    crash_points = 0
    while True:
        root = str(tmp_path / f"sweep_{layout}_{committer_cls.__name__}_{k}")
        t = SnapshotTable(
            root, CLIENT_PRODUCTS_SCHEMA, committer=committer_cls(),
            manifest_layout=layout, manifest_groups=4, keep_versions=2,
        )
        # settled history so GC boundaries are inside the sweep
        for i in range(4):
            t.overwrite_partitions(_df(spark, 1, [f"S{i}"]), [1])
        t.overwrite_partitions(_df(spark, 2, ["T0"]), [2])
        base_version = t.current_doc().version
        crasher = SnapshotTable(
            root, CLIENT_PRODUCTS_SCHEMA,
            committer=_crashing_committer(committer_cls(), k),
            manifest_layout=layout, manifest_groups=4, keep_versions=2,
        )
        try:
            crasher.overwrite_partitions(_df(spark, 1, ["NEW"]), [1])
            completed = True
        except _InjectedCrash:
            completed = False
            crash_points += 1
        # repair: clear the crashed writer's lock, re-point the head,
        # then retry the commit (idempotent if it already landed)
        lock = os.path.join(root, _MANIFEST + ".lock")
        if os.path.exists(lock):
            os.remove(lock)
        t.recover()
        if _skus(t.read(spark, partition_value=1)) != ["NEW"]:
            t.overwrite_partitions(_df(spark, 1, ["NEW"]), [1])
        assert _skus(t.read(spark, partition_value=1)) == ["NEW"], f"k={k}"
        assert _skus(t.read(spark, partition_value=2)) == ["T0"], f"k={k}"
        assert _skus(t.read(spark)) == ["NEW", "T0"], f"k={k}"
        # retained time travel still resolves
        head = t.current_doc().version
        assert head >= base_version + 1
        for v in range(max(1, head - t.keep_versions), head + 1):
            t.read(spark, version=v).collect()
        if completed:
            break
        k += 1
    assert crash_points >= 3, crash_points


def test_vacuum_preserves_commit_above_stale_pointer(spark, tmp_path):
    """vacuum() before recover(): the committed-but-unpointed version's
    manifest, group files, and data dirs are live, not garbage."""
    t = _sharded(tmp_path)
    t.overwrite_partitions(_df(spark, 1, ["A"]), [1])
    # stage a real v2 commit, then roll the pointer back to simulate
    # the crash-before-pointer-publish state
    t.overwrite_partitions(_df(spark, 1, ["B"]), [1])
    t.committer.publish_pointer(
        t._manifest_path(), t._manifest_path(1)
    )
    assert t.current_doc().version == 1
    t.vacuum()
    assert t.recover() == 2
    assert _skus(t.read(spark)) == ["B"]


def test_group_shas_are_version_salted(spark, tmp_path):
    """ADVICE r12: group files were content-addressed per gid but not
    per version — a later commit reproducing a group's exact prior
    content reused the old sha, which an intermediate version's
    freed_groups ledger would delete when the horizon reached it,
    deleting the LIVE file. The sha is now salted with the writing
    version, so identical content at different versions gets distinct
    files and a freed sha can never be a later rewrite's live file."""
    t = _sharded(tmp_path)
    content = {"parts": {"7": ["d1"]}, "shared": []}
    s1 = t._write_group(3, content, version=1)
    s2 = t._write_group(3, content, version=2)
    assert s1 != s2
    # the hazard end-to-end in miniature: v2's ledger frees v1's sha;
    # deleting it must not touch the v2 rewrite's file
    t.committer.delete(t._group_path(3, s1))
    assert t.committer.get(t._group_path(3, s2)) is not None
    # and within one version the write stays idempotent (replay-safe)
    assert t._write_group(3, content, version=2) == s2


def test_stale_filter_handles_literal_none_string_key(spark, tmp_path):
    """ADVICE r12: writes key partitions via str(value), so for a STRING
    partition column NULL and the literal "None" are ONE partition.
    The stale anti-filter only dropped NULL rows — a literal-"None"
    tenant's superseded rows in a shared dir leaked into full reads
    forever. Both spellings must now be filtered together."""
    import pyspark.sql.types as T

    schema = T.StructType(
        [
            T.StructField("k", T.StringType(), True),
            T.StructField("sku", T.StringType(), True),
        ]
    )

    def mk(rows):
        return spark.createDataFrame(rows, schema)

    for layout in ("single", "sharded"):
        t = SnapshotTable(
            str(tmp_path / f"t_{layout}"), schema, partition_col="k",
            manifest_layout=layout, manifest_groups=8,
        )
        # one shared dir holding the literal-"None" tenant, a NULL-key
        # row (same partition under the str() convention), and tenant x
        both = mk([("None", "LIT1"), (None, "NUL1"), ("x", "X1")])
        t.overwrite_partitions(both, ["None", "x"])
        # overwrite the "None" partition: BOTH old spellings are stale
        t.overwrite_partitions(mk([("None", "LIT2")]), ["None"])
        assert _skus(t.read(spark)) == ["LIT2", "X1"], layout
        # tenant x untouched; "None" tenant reads its new row only
        assert _skus(t.read(spark, partition_value="x")) == ["X1"], layout
        assert _skus(t.read(spark, partition_value="None")) == [
            "LIT2"
        ], layout
        # time travel still sees the original shared version intact
        assert _skus(t.read(spark, version=1)) == [
            "LIT1", "NUL1", "X1",
        ], layout


def test_reshard_preserves_all_reads_and_frees_old_groups(spark, tmp_path):
    """r12 verdict ask #5: reshard() rewrites the group files under a
    new count in one commit with no data movement. Full/tenant/time-
    travel reads are identical across it, later commits adopt the new
    count, and the old group files fall to the freed_groups ledger."""
    t = _sharded(tmp_path, keep_versions=2)  # 8 groups
    both = _df(spark, 1, ["A1"]).union(_df(spark, 2, ["B1"]))
    t.overwrite_partitions(both, [1, 2])      # v1: shared dir
    t.overwrite_partitions(_df(spark, 1, ["A2"]), [1])  # v2: stale entry
    before_full = _skus(t.read(spark))
    before_v1 = _skus(t.read(spark, version=1))
    old_shas = {
        os.path.basename(t._group_path(int(g), sha))
        for g, sha in t.current_doc().groups.items()
    }

    t.reshard(32)  # v3
    doc = t.current_doc()
    assert doc.version == 3
    assert doc.n_groups == 32
    assert _skus(t.read(spark)) == before_full
    assert _skus(t.read(spark, partition_value=1)) == ["A2"]
    assert _skus(t.read(spark, partition_value=2)) == ["B1"]
    # time travel across the reshard resolves under the OLD count
    assert _skus(t.read(spark, version=1)) == before_v1
    assert _skus(t.read(spark, version=2)) == before_full
    # later commits adopt the new count
    t.overwrite_partitions(_df(spark, 1, ["A3"]), [1])  # v4
    assert t.current_doc().n_groups == 32
    assert _skus(t.read(spark, partition_value=1)) == ["A3"]
    # drive the horizon past the reshard commit: the pre-reshard
    # (8-group) files ride its freed_groups ledger and are reclaimed
    for i in range(4):
        t.overwrite_partitions(_df(spark, 9, [f"Z{i}"]), [9])  # v5..v8
    assert t.current_doc().version - t.keep_versions > 3
    on_disk = set(_group_files(t.root))
    assert not (old_shas & on_disk), old_shas & on_disk
    live = {
        os.path.basename(t._group_path(int(g), sha))
        for g, sha in t.current_doc().groups.items()
    }
    assert live <= on_disk
    assert _skus(t.read(spark, partition_value=1)) == ["A3"]


def test_reshard_from_single_layout(spark, tmp_path):
    """reshard() on a single-blob table is a layout migration under the
    requested count."""
    t = SnapshotTable(
        str(tmp_path / "t"), CLIENT_PRODUCTS_SCHEMA,
        manifest_layout="single",
    )
    t.overwrite_partitions(_df(spark, 1, ["A"]), [1])
    t.overwrite_partitions(_df(spark, 2, ["B"]), [2])
    t.reshard(16)
    doc = t.current_doc()
    assert doc.layout == "sharded" and doc.n_groups == 16
    assert _skus(t.read(spark)) == ["A", "B"]
    assert _skus(t.read(spark, partition_value=2)) == ["B"]


def test_constructor_group_count_mismatch_is_harmless(spark, tmp_path):
    """A handle constructed with a DIFFERENT manifest_groups than the
    table on disk must still resolve every tenant: resolution and
    commits adopt each version's recorded n_groups, never the
    constructor's (pre-fix, tenant reads under a foreign modulus came
    back empty and a commit would scatter groups)."""
    t8 = _sharded(tmp_path)  # 8 groups
    for cid in range(1, 9):
        t8.overwrite_partitions(_df(spark, cid, [f"S{cid}"]), [cid])
    t64 = SnapshotTable(
        str(tmp_path / "t"), CLIENT_PRODUCTS_SCHEMA,
        manifest_layout="sharded", manifest_groups=64,
    )
    for cid in range(1, 9):
        assert _skus(t64.read(spark, partition_value=cid)) == [f"S{cid}"]
    # a commit through the mismatched handle stays in the 8-group world
    t64.overwrite_partitions(_df(spark, 3, ["S3b"]), [3])
    assert t64.current_doc().n_groups == 8
    assert _skus(t64.read(spark, partition_value=3)) == ["S3b"]
    assert _skus(t8.read(spark, partition_value=3)) == ["S3b"]


def test_recommended_manifest_groups_anchors():
    r = SnapshotTable.recommended_manifest_groups
    assert r(0) == 16
    assert r(100) == 16     # clamped floor
    assert r(1000) == 32
    assert r(100_000) == 256
    assert r(1_000_000) == 1024
    assert r(10**12) == 65536  # clamped ceiling
    # monotone over the interesting range
    vals = [r(n) for n in (10, 100, 1000, 10**4, 10**5, 10**6, 10**7)]
    assert vals == sorted(vals)


def test_randomized_sequence_with_mid_reshard_matches_oracle(spark, tmp_path):
    """The randomized op-sequence harness with a reshard() injected
    mid-sequence: every read the oracle can answer stays exact across
    the regrouping (same harness family as
    test_randomized_op_sequence_matches_python_oracle)."""
    import random

    rng = random.Random(20260816)
    t = _sharded(tmp_path)  # 8 groups
    oracle: dict[str, list[str]] = {}
    step = 0
    for step in range(24):
        if step == 8:
            t.reshard(32)
        elif step == 16:
            t.reshard(4)
        cids = rng.sample(range(1, 7), rng.choice([1, 1, 1, 2, 3]))
        skus = {cid: [f"s{step}-{cid}-{i}" for i in range(rng.randint(1, 3))]
                for cid in cids}
        df = None
        for cid in cids:
            part = _df(spark, cid, skus[cid])
            df = part if df is None else df.union(part)
            oracle[str(cid)] = sorted(skus[cid])
        t.overwrite_partitions(df, cids)
        # full read equals the oracle's union at every step
        want = sorted(s for ss in oracle.values() for s in ss)
        assert _skus(t.read(spark)) == want, step
        probe = rng.choice(list(oracle))
        assert _skus(t.read(spark, partition_value=int(probe))) == oracle[
            probe
        ], (step, probe)
