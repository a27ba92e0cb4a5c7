"""SnapshotTable behind the storage-commit seam (VERDICT r11 ask #2).

The POSIX protocol (O_EXCL version files + fsync-before-replace pointer
swap) cannot run on S3/GCS — no atomic rename exists there. The
``PointerFileCommitter`` reformulates the publish using only primitives
object stores actually have (conditional PUT, atomic whole-object PUT,
LIST/GET/DELETE/COPY): the conditional put of the versioned manifest is
the commit point, and the head is DERIVED by listing version files —
nothing is ever renamed. These tests pin that the full table contract
(ingest round-trip, time travel, conflict detection, GC, crash between
commit point and pointer publication) holds under BOTH implementations.
"""

import os

import pytest

from client_data_ingester_spark.schemas import CLIENT_PRODUCTS_SCHEMA
from client_data_ingester_spark.tables import SnapshotTable
from client_data_ingester_spark.tables.committer import (
    PointerFileCommitter,
    PosixCommitter,
)
from client_data_ingester_spark.tables.snapshot import (
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


@pytest.mark.parametrize("committer_cls", COMMITTERS)
def test_roundtrip_and_time_travel(spark, tmp_path, committer_cls):
    t = SnapshotTable(
        str(tmp_path / "t"), CLIENT_PRODUCTS_SCHEMA,
        committer=committer_cls(),
    )
    t.overwrite_partitions(_df(spark, 1, ["A", "B"]), [1])
    t.overwrite_partitions(_df(spark, 2, ["C"]), [2])
    t.overwrite_partitions(_df(spark, 1, ["A2"]), [1])
    assert t.current_manifest().version == 3
    assert _skus(t.read(spark)) == ["A2", "C"]
    # time travel to v2: client 1 still has its first incarnation
    assert _skus(t.read(spark, version=2)) == ["A", "B", "C"]
    # partition-scoped read resolves only that tenant's dirs
    assert _skus(t.read(spark, partition_value=2)) == ["C"]


@pytest.mark.parametrize("committer_cls", COMMITTERS)
def test_version_collision_detected(spark, tmp_path, committer_cls):
    t = SnapshotTable(
        str(tmp_path / "t"), CLIENT_PRODUCTS_SCHEMA,
        committer=committer_cls(),
    )
    t.overwrite_partitions(_df(spark, 1, ["A"]), [1])
    # a racing writer published v2 behind our back (conditional-put
    # collision — the commit point must fail loudly, not clobber).
    # NB: capture the payload BEFORE open() truncates the v2 file into
    # existence — the pointer committer derives the head by LISTing.
    payload = t.current_manifest().to_json()
    with open(os.path.join(t.root, f"{_MANIFEST}.v2"), "w") as f:
        f.write(payload)
    with pytest.raises(SnapshotConflictError):
        t._publish(
            type(t.current_manifest())(version=2, partitions={}, props={})
        )


def test_pointer_committer_resolves_head_without_pointer(spark, tmp_path):
    """Crash between the commit point (conditional put of the versioned
    manifest) and the pointer publication: the pointer-file committer
    derives the head from LIST, so the committed version is immediately
    visible with NO pointer file at all."""
    c = PointerFileCommitter()
    t = SnapshotTable(
        str(tmp_path / "t"), CLIENT_PRODUCTS_SCHEMA, committer=c
    )
    t.overwrite_partitions(_df(spark, 1, ["A"]), [1])
    t.overwrite_partitions(_df(spark, 1, ["B"]), [1])
    # simulate the crash: delete the advisory pointer entirely
    os.remove(os.path.join(t.root, _MANIFEST))
    assert t.current_manifest().version == 2
    assert _skus(t.read(spark)) == ["B"]
    # and a STALE pointer (written by a slow loser) is equally ignored
    with open(os.path.join(t.root, _MANIFEST), "w") as f:
        f.write(t._manifest_at(1).to_json())
    assert t.current_manifest().version == 2


@pytest.mark.parametrize("committer_cls", COMMITTERS)
def test_put_if_absent_is_atomic_with_payload(tmp_path, committer_cls,
                                              monkeypatch):
    """The commit point must expose the version object complete or not
    at all (a real conditional PUT is atomic whole-object). Before the
    link-commit fix, O_EXCL created an EMPTY version file first and
    wrote the payload after — a concurrent LIST+GET ``read_current``
    could parse a torn manifest. Pin: a put that dies mid-payload
    leaves NOTHING visible at the final path, head resolution still
    returns the prior version, and a clean retry wins."""
    from client_data_ingester_spark.tables import committer as cm

    c = committer_cls()
    prefix = str(tmp_path / "m")
    assert c.put_if_absent(prefix + ".v1", b'{"version": 1}')

    real_stage = cm._stage_payload

    def torn_stage(tmp, payload, durable):
        real_stage(tmp, payload[: len(payload) // 2], durable)
        raise OSError("simulated crash mid-payload")

    monkeypatch.setattr(cm, "_stage_payload", torn_stage)
    with pytest.raises(OSError):
        c.put_if_absent(prefix + ".v2", b'{"version": 2}')
    assert not os.path.exists(prefix + ".v2")
    # head resolution (pointer impl LISTs; posix impl reads the pointer)
    # never sees a torn v2 — and no staging litter is left behind
    assert c.read_current(prefix + ".ptr", prefix) in (
        None, b'{"version": 1}'
    )
    assert not [n for n in os.listdir(tmp_path) if ".put." in n]
    monkeypatch.setattr(cm, "_stage_payload", real_stage)
    assert c.put_if_absent(prefix + ".v2", b'{"version": 2}')
    # and the loser of a genuine collision still observes False
    assert not c.put_if_absent(prefix + ".v2", b"other")
    with open(prefix + ".v2", "rb") as f:
        assert f.read() == b'{"version": 2}'


def test_pointer_install_dir_copies_nested_prefixes(tmp_path):
    """Object stores have no directories — a partitioned staged layout
    is just nested key prefixes, and install must COPY all of them
    (shutil.copyfile on a flat listing raised IsADirectoryError)."""
    c = PointerFileCommitter()
    staged = tmp_path / "stage"
    (staged / "part=a").mkdir(parents=True)
    (staged / "f1.parquet").write_bytes(b"x")
    (staged / "part=a" / "f2.parquet").write_bytes(b"y")
    (staged / "_SUCCESS").write_bytes(b"")
    target = tmp_path / "t"
    target.mkdir()
    (target / "stale.parquet").write_bytes(b"z")
    c.install_dir(str(staged), str(target))
    assert (target / "f1.parquet").read_bytes() == b"x"
    assert (target / "part=a" / "f2.parquet").read_bytes() == b"y"
    assert not (target / "stale.parquet").exists()
    assert (target / "_SUCCESS").exists()
    # replay-idempotent while the staged _SUCCESS remains
    c.install_dir(str(staged), str(target))
    assert (target / "part=a" / "f2.parquet").read_bytes() == b"y"


@pytest.mark.parametrize("committer_cls", COMMITTERS)
def test_gc_keeps_head_readable(spark, tmp_path, committer_cls):
    t = SnapshotTable(
        str(tmp_path / "t"), CLIENT_PRODUCTS_SCHEMA,
        keep_versions=2, committer=committer_cls(),
    )
    for i in range(6):
        t.overwrite_partitions(_df(spark, 1, [f"S{i}"]), [1])
    assert t.current_manifest().version == 6
    assert _skus(t.read(spark)) == ["S5"]
    # GC'd versions are gone; retained window still time-travels
    assert t._manifest_at(2) is None
    assert _skus(t.read(spark, version=5)) == ["S4"]


def test_posix_publish_self_heals_wedged_pointer(spark, tmp_path,
                                                 monkeypatch):
    """ADVICE r12: under the POSIX committer a crash BETWEEN the commit
    point (versioned manifest created) and the pointer publish left the
    pointer at N-1; every later publish recomputed N, lost the
    conditional put, and raised SnapshotConflictError until recover()
    was run manually. The collision path now re-derives the head and
    re-points before surfacing the conflict, so one ordinary retry
    self-heals."""
    c = PosixCommitter()
    t = SnapshotTable(
        str(tmp_path / "t"), CLIENT_PRODUCTS_SCHEMA, committer=c
    )
    t.overwrite_partitions(_df(spark, 1, ["A"]), [1])

    real_publish = PosixCommitter.publish_pointer
    calls = {"n": 0}

    def crash_once(self, pointer_path, versioned_path):
        calls["n"] += 1
        if calls["n"] == 1:
            raise OSError("simulated crash after the commit point")
        return real_publish(self, pointer_path, versioned_path)

    monkeypatch.setattr(PosixCommitter, "publish_pointer", crash_once)
    with pytest.raises(OSError):
        t.overwrite_partitions(_df(spark, 1, ["B"]), [1])
    # v2 is committed but the pointer still says v1 (the wedged state)
    assert os.path.exists(os.path.join(t.root, f"{_MANIFEST}.v2"))
    assert t.current_manifest().version == 1

    # the next publish heals in-band: the v2 collision re-points the
    # head, and the commit-rebase loop retries against it in the SAME
    # call — no SnapshotConflictError surfaces, no manual recover()
    t.overwrite_partitions(_df(spark, 1, ["C"]), [1])
    assert t.current_manifest().version == 3
    assert _skus(t.read(spark)) == ["C"]
    # the crashed-but-committed v2 still time-travels
    assert _skus(t.read(spark, version=2)) == ["B"]
