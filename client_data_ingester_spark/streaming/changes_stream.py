"""Incremental change-feed publishing + streaming consumption ([EXT]) —
the CDC twin of ``tables/changes.changes_between``: instead of a consumer
re-diffing two full versions on a schedule, each newly-published snapshot
version is diffed ONCE against its predecessor (manifest partition diff —
O(changed partitions), never O(table)) and appended to a versioned feed
directory that any number of downstream jobs tail as a standard file
stream.

Same persisted-artifact pattern as ``decontam_stream``: the expensive step
(the version diff) is write-time work keyed by version; consumers only
read.

Crash-safety: each version's rows land in their own ``version=N`` dir,
the cursor advances only AFTER the write, and a completed dir (Spark's
_SUCCESS marker) is never rewritten on replay — so a tailing file-stream
consumer sees each version's part files once. A crash MID-write leaves an
uncommitted dir that IS rewritten (new part filenames): consumers needing
exactly-once dedup on (version, key). A feed dir where some version never
flagged a change stays readable through the explicit feed schema.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..tables.changes import changes_between
from ..tables.snapshot import SnapshotTable

_STATE = "_cdc_state.json"


def feed_schema(table: SnapshotTable, key_cols: list[str]) -> T.StructType:
    """Schema of the published feed rows (``version`` is the partition
    dir): key columns, change_type, old_row/new_row structs of the
    non-key columns."""
    key_fields = [f for f in table.schema.fields if f.name in key_cols]
    non_key = T.StructType(
        [f for f in table.schema.fields if f.name not in key_cols]
    )
    return T.StructType(
        [
            *key_fields,
            T.StructField("change_type", T.StringType()),
            T.StructField("old_row", non_key),
            T.StructField("new_row", non_key),
            T.StructField("version", T.IntegerType()),
        ]
    )


class ChangeFeedPublisher:
    """Emit each snapshot version's diff vs its predecessor into
    ``feed_dir/version=N`` — incrementally, one manifest diff per new
    version, however often :meth:`poll` runs."""

    def __init__(
        self,
        spark: SparkSession,
        table: SnapshotTable,
        key_cols: list[str],
        feed_dir: str,
    ) -> None:
        self.spark = spark
        self.table = table
        self.key_cols = list(key_cols)
        self.feed_dir = feed_dir
        os.makedirs(feed_dir, exist_ok=True)

    def _state_path(self) -> str:
        return os.path.join(self.feed_dir, _STATE)

    def last_published(self) -> int:
        try:
            with open(self._state_path()) as f:
                return int(json.load(f)["last_version"])
        except (OSError, ValueError, KeyError):
            return 0

    def _advance(self, version: int) -> None:
        tmp = self._state_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"last_version": version}, f)
        os.replace(tmp, self._state_path())

    def seed(self, version: int | None = None) -> int:
        """Initialize (or re-initialize) the feed cursor at ``version``
        (default: the table's current version) WITHOUT emitting anything.
        Use when starting a feed on a mature table whose early versions
        are past the GC horizon, or to recover after :meth:`poll` raised
        a horizon error — downstream consumers must full-resync from the
        snapshot itself in that case, since the skipped diffs are gone."""
        if version is None:
            version = self.table.current_doc().version
        self._advance(version)
        return version

    def prune(self, keep_versions: int = 10) -> list[int]:
        """Retention bound for the feed directory: delete ``version=N``
        dirs with N ≤ cursor − keep_versions, so the feed holds at most
        ``keep_versions`` fully-published version dirs no matter how many
        versions have ever been emitted (read-side listing stays O(keep),
        not O(table history)).

        Contract: only versions strictly below the publish cursor are
        eligible (an uncommitted dir is never touched), and pruning is
        for versions every tailing consumer has already processed — a
        file-stream source that has SEEN a file tolerates its deletion
        (Spark's file source tracks seen files by name), but a consumer
        starting fresh after a prune must :meth:`seed` from the snapshot
        itself, exactly like one that lagged past the GC horizon.
        Returns the pruned version numbers."""
        import shutil

        horizon = self.last_published() - keep_versions
        pruned = []
        for d in os.listdir(self.feed_dir):
            if not d.startswith("version="):
                continue
            try:
                v = int(d.split("=", 1)[1])
            except ValueError:
                continue
            if v <= horizon:
                shutil.rmtree(
                    os.path.join(self.feed_dir, d), ignore_errors=True
                )
                pruned.append(v)
        return sorted(pruned)

    def poll(self) -> list[int]:
        """Publish every not-yet-emitted version; returns the versions
        emitted this call. Crash-safe: the state file advances only after
        a version's dir is fully written, and a version dir that already
        carries Spark's _SUCCESS commit marker is skipped on replay (the
        write completed; only the cursor advance was lost) so a tailing
        file-stream consumer is not fed duplicate part files. The only
        remaining at-least-once window is a crash MID-write — the rewrite
        then produces new part filenames, so consumers that must be
        exactly-once should dedup on (version, key).

        Raises RuntimeError when the feed has lagged past the snapshot GC
        horizon (a predecessor manifest is gone): the missing diffs are
        unrecoverable, so the publisher refuses to skip silently — call
        :meth:`seed` and have consumers full-resync."""
        current = self.table.current_doc().version
        emitted = []
        for v in range(self.last_published() + 1, current + 1):
            out_dir = os.path.join(self.feed_dir, f"version={v}")
            if not os.path.exists(os.path.join(out_dir, "_SUCCESS")):
                # completed dirs replay for free; only an actual re-diff
                # needs both manifests, so the horizon check sits INSIDE
                # the rewrite branch — a lost cursor on a fully-published
                # feed must not demand a resync
                missing = next(
                    (
                        w
                        for w in (v - 1, v)
                        if w > 0 and self.table._manifest_at(w) is None
                    ),
                    None,
                )
                if missing is not None:
                    raise RuntimeError(
                        f"change feed lagged past the GC horizon: version "
                        f"{missing} is no longer available (keep_versions="
                        f"{self.table.keep_versions}). The missing diffs "
                        "are unrecoverable — seed() the feed at the "
                        "current version and full-resync downstream "
                        "consumers."
                    )
                feed = changes_between(
                    self.spark, self.table, self.key_cols, v - 1, v
                )
                feed.write.mode("overwrite").parquet(out_dir)
            self._advance(v)
            emitted.append(v)
        return emitted


def read_change_feed_stream(
    spark: SparkSession,
    table: SnapshotTable,
    key_cols: list[str],
    feed_dir: str,
) -> DataFrame:
    """Tail the published feed as a Structured Streaming source — each
    newly-published ``version=N`` dir arrives as a micro-batch. Explicit
    schema (a version with zero changes writes an empty dir; inference
    would fail there)."""
    return (
        spark.readStream.schema(feed_schema(table, key_cols))
        .option("basePath", feed_dir)
        .parquet(feed_dir + "/version=*")
    )
