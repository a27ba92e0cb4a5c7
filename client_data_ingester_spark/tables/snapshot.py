"""Versioned-snapshot parquet tables with atomic manifest swap.

Replaces the reference's Postgres transactionality (single ``db.commit()`` per
ingested file, B/ingestion/service.py:108) in a pure-parquet world. Design
goals, in order:

1. **Atomicity**: a writer stages new parquet directories, then atomically
   swaps a manifest pointer (`os.replace`). A crash before the swap leaves the
   old manifest — readers never see a partial ingest (SURVEY §1.5 / §4.2.4).
2. **No full-table rewrite per ingest**: the manifest maps partition key
   (``client_id``) → data directories, Iceberg-manifest-style. Ingesting one
   client's file writes only that client's new directory and re-points the
   manifest; other clients' files are referenced untouched. At 100 TB with
   thousands of tenants this is the difference between an O(file) and an
   O(table) write.
3. **Partition pruning**: a tenant-scoped read resolves only that tenant's
   directories from the manifest — file-level pruning before Spark even plans
   the scan (the manifest is the coarse index; parquet row-group stats do the
   rest).
4. **Concurrent-reader safety**: old versions are kept for ``keep_versions``
   generations before GC, so an in-flight reader of manifest N survives a
   writer publishing N+1.

This is a deliberately small, crash-safe subset of what Delta/Iceberg provide
(those jars aren't in this image — SURVEY §4.1 "Transactionality").
Writer serialization (the reference serializes per-tenant writes through
Postgres row locks) is enforced two ways:

- a per-table lock file (``_MANIFEST.lock``, O_CREAT|O_EXCL) is held across
  read-manifest → stage data → publish in ``overwrite_partitions`` /
  ``overwrite_all``, so two in-process writers can't interleave and both
  publish version N+1 (the lost-update race);
- ``_publish`` independently creates the versioned manifest with O_EXCL and
  raises ``SnapshotConflictError`` if that version already exists — a
  belt-and-braces guard against writers that bypass the lock (e.g. a crashed
  writer's stale lock being removed manually).
"""

from __future__ import annotations

import contextlib
import json
import os
import shutil
import time
import uuid
from dataclasses import dataclass, field
from typing import Iterable, Mapping

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .committer import Committer, PosixCommitter

_MANIFEST = "_MANIFEST"


class SnapshotConflictError(RuntimeError):
    """A concurrent writer raced this one (lock timeout or version collision)."""


@dataclass
class Manifest:
    version: int
    # partition value (as string) -> list of data dir names (relative to root)
    partitions: dict[str, list[str]] = field(default_factory=dict)
    # table-level metadata carried across versions (e.g. max assigned
    # surrogate id — avoids a full-table max() scan per ingest)
    props: dict = field(default_factory=dict)

    def to_json(self) -> str:
        return json.dumps(
            {
                "version": self.version,
                "partitions": self.partitions,
                "props": self.props,
            }
        )

    @classmethod
    def from_json(cls, payload: str) -> "Manifest":
        obj = json.loads(payload)
        return cls(
            version=obj["version"],
            partitions=obj["partitions"],
            props=obj.get("props", {}),
        )


class SnapshotTable:
    def __init__(
        self,
        root: str,
        schema: T.StructType,
        partition_col: str = "client_id",
        keep_versions: int = 3,
        committer: Committer | None = None,
    ):
        if partition_col not in schema.fieldNames():
            # fail at construction, not at the first write's unresolved-
            # column AnalysisException (e.g. a users/clients table left on
            # the default partition_col='client_id' absent from its schema)
            raise ValueError(
                f"partition_col {partition_col!r} is not a column of the "
                f"table schema {schema.fieldNames()}"
            )
        self.root = root
        self.schema = schema
        self.partition_col = partition_col
        self.keep_versions = keep_versions
        # storage-commit seam: POSIX rename protocol by default;
        # PointerFileCommitter for object-store-shaped backends (no
        # rename anywhere — the head manifest is derived by LISTing the
        # conditional-put version files)
        self.committer = committer or PosixCommitter()
        os.makedirs(root, exist_ok=True)

    # ---- manifest plumbing -------------------------------------------------

    def _manifest_path(self, version: int | None = None) -> str:
        if version is None:
            return os.path.join(self.root, _MANIFEST)
        return os.path.join(self.root, f"{_MANIFEST}.v{version}")

    def current_manifest(self) -> Manifest:
        payload = self.committer.read_current(
            self._manifest_path(), os.path.join(self.root, _MANIFEST)
        )
        if payload is None:
            return Manifest(version=0, partitions={})
        return Manifest.from_json(payload.decode())

    def _manifest_at(self, version: int) -> Manifest | None:
        """The manifest as of ``version`` (None if GC'd past the horizon)."""
        if version == 0:
            return Manifest(version=0, partitions={})
        payload = self.committer.get(self._manifest_path(version))
        if payload is None:
            return None
        return Manifest.from_json(payload.decode())

    @contextlib.contextmanager
    def _write_lock(self, timeout: float = 60.0, poll: float = 0.05):
        """Per-table writer lock (O_CREAT|O_EXCL lock file).

        Held across read-manifest → stage-data → publish so concurrent
        writers serialize instead of both publishing version N+1 and silently
        losing one writer's partitions (the lost-update race)."""
        path = os.path.join(self.root, _MANIFEST + ".lock")
        deadline = time.monotonic() + timeout
        while True:
            try:
                fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                break
            except FileExistsError:
                if time.monotonic() >= deadline:
                    raise SnapshotConflictError(
                        f"writer lock {path} held past {timeout}s; another "
                        "writer is active (or crashed — remove the lock file "
                        "after confirming no writer is running)"
                    ) from None
                time.sleep(poll)
        try:
            os.write(fd, str(os.getpid()).encode())
            os.close(fd)
            yield
        finally:
            with contextlib.suppress(FileNotFoundError):
                os.unlink(path)

    def _publish(self, manifest: Manifest) -> None:
        """Atomically swap the manifest pointer (POSIX rename).

        The versioned manifest is created with O_EXCL: if this exact version
        was already published by a racing writer, fail loudly instead of
        overwriting its commit (and later GC-ing its data directories)."""
        versioned = self._manifest_path(manifest.version)
        # the conditional put IS the commit point: at most one writer
        # wins this version (POSIX: O_CREAT|O_EXCL; object store:
        # If-None-Match / if-generation-match 0)
        if not self.committer.put_if_absent(
            versioned, manifest.to_json().encode()
        ):
            raise SnapshotConflictError(
                f"manifest version {manifest.version} already published — "
                "a concurrent writer won this commit; re-read and retry"
            )
        # pointer publication AFTER the commit point is advisory: the
        # POSIX impl fsyncs the copy before os.replace (power loss must
        # not journal the rename without the data blocks); the
        # pointer-file impl derives the head from LIST and treats the
        # pointer as a cache
        self.committer.publish_pointer(self._manifest_path(), versioned)
        self._gc(manifest)

    def _gc(self, latest: Manifest) -> None:
        """Drop manifests/data dirs older than keep_versions generations."""
        horizon = latest.version - self.keep_versions
        if horizon <= 0:
            return
        live_dirs: set[str] = set()
        versions_kept = range(max(1, horizon), latest.version + 1)
        for v in versions_kept:
            payload = self.committer.get(self._manifest_path(v))
            if payload is not None:
                m = Manifest.from_json(payload.decode())
                for dirs in m.partitions.values():
                    live_dirs.update(dirs)
        for name in os.listdir(self.root):
            full = os.path.join(self.root, name)
            if name.startswith(_MANIFEST):
                suffix = name[len(_MANIFEST) :]
                if suffix.startswith(".v") and suffix[2:].isdigit():
                    if int(suffix[2:]) < horizon:
                        os.unlink(full)
            elif os.path.isdir(full) and name not in live_dirs:
                shutil.rmtree(full, ignore_errors=True)

    # ---- read --------------------------------------------------------------

    def read(
        self,
        spark: SparkSession,
        partition_value: object | None = None,
        version: int | None = None,
    ) -> DataFrame:
        """Read the current snapshot; tenant-scoped reads prune at the
        manifest level (only that tenant's directories are scanned).

        ``version`` time-travels to an older snapshot (within the
        ``keep_versions`` retention horizon — the same property that makes
        in-flight readers safe across a publish makes historical reads
        free: the manifest for version N still names N's directories).

        Additive schema evolution: constructing the table with a WIDENED
        schema (new nullable columns appended) reads every version — the
        explicit-schema parquet read resolves columns by name, so files
        written before the widening fill the new columns with NULL, time
        travel included; reading under a narrower schema prunes the extra
        columns (contract pinned by tests/test_schema_evolution.py)."""
        if version is not None:
            payload = self.committer.get(self._manifest_path(version))
            if payload is None:
                raise ValueError(
                    f"version {version} is not available (GC horizon is "
                    f"{self.keep_versions} versions)"
                )
            manifest = Manifest.from_json(payload.decode())
        else:
            manifest = self.current_manifest()
        if partition_value is not None:
            dirs = manifest.partitions.get(str(partition_value), [])
        else:
            dirs = sorted({d for ds in manifest.partitions.values() for d in ds})
        if not dirs:
            return spark.createDataFrame([], schema=self.schema)
        paths = [os.path.join(self.root, d) for d in dirs]
        df = spark.read.schema(self.schema).parquet(*paths)
        if partition_value is not None:
            # Dir-level pruning already happened; keep the predicate for
            # parquet row-group stats + correctness if dirs are shared.
            df = df.filter(F.col(self.partition_col) == F.lit(partition_value))
        return df

    # ---- write -------------------------------------------------------------

    def overwrite_partitions(
        self,
        df: DataFrame,
        partition_values: Iterable[object],
        props: Mapping[str, object] | None = None,
        expected_version: int | None = None,
        expected_max_id: int | None = None,
    ) -> Manifest:
        """Replace the listed partitions with ``df``'s rows, atomically.

        ``df`` must contain only rows belonging to ``partition_values``.
        Other partitions are carried forward by reference (no rewrite).

        Optimistic concurrency: callers that computed ``df`` as a MERGE
        against a snapshot read pass the manifest version they read
        (``expected_version``). Under the write lock, if any of the written
        partitions' directory entries changed since that version, the merge
        was computed from stale data and publishing it would silently drop
        the racing writer's rows — ``SnapshotConflictError`` is raised
        instead and the caller re-reads + re-merges (the reference gets this
        serialization for free from Postgres row locks). ``expected_max_id``
        guards the id ledger the same way: a caller that minted surrogate
        ids above the max_id it read conflicts if ANY writer (any tenant)
        advanced max_id since — otherwise two concurrent ingests could both
        assign ids from the same base and collide across tenants.
        """
        values = [str(v) for v in partition_values]
        with self._write_lock():
            manifest = self.current_manifest()
            if expected_version is not None and manifest.version != expected_version:
                expected = self._manifest_at(expected_version)
                if expected is None or any(
                    manifest.partitions.get(v) != expected.partitions.get(v)
                    for v in values
                ):
                    raise SnapshotConflictError(
                        f"partition(s) {values} changed since version "
                        f"{expected_version} (now {manifest.version}); "
                        "re-read and retry the merge"
                    )
            if (
                expected_max_id is not None
                and int(manifest.props.get("max_id", 0)) != expected_max_id
            ):
                raise SnapshotConflictError(
                    f"max_id advanced from {expected_max_id} to "
                    f"{manifest.props.get('max_id', 0)} since the merge was "
                    "computed; re-read and retry (surrogate ids would collide)"
                )
            new_version = manifest.version + 1
            dir_name = f"v{new_version:06d}-{uuid.uuid4().hex[:8]}"
            out = os.path.join(self.root, dir_name)
            try:
                (
                    df.select(
                        *[
                            F.col(f.name).cast(f.dataType)
                            for f in self.schema.fields
                        ]
                    )
                    .write.mode("overwrite")
                    .parquet(out)
                )
                new_partitions = dict(manifest.partitions)
                for v in values:
                    new_partitions[v] = [dir_name]
                new_props = dict(manifest.props)
                if props:
                    new_props.update(props)
                if any(f.name == "id" for f in self.schema.fields):
                    # max_id must come from the DATA, not the caller's row
                    # count: insert ids are id_base + row-index + 1 and the
                    # row index is sparse (monotonically_increasing_id puts
                    # partition p's rows at p·2^33+n), so assigned ids can
                    # exceed any count-derived bound — trusting the caller
                    # here let a later ingest re-assign live ids. One
                    # column, one partition's parquet: a cheap stats read.
                    max_id = (
                        df.sparkSession.read.schema(self.schema)
                        .parquet(out)
                        .agg(F.max("id"))
                        .first()[0]
                    )
                    if max_id is not None:
                        new_props["max_id"] = max(
                            int(max_id), int(new_props.get("max_id", 0))
                        )
                self._publish(
                    Manifest(
                        version=new_version,
                        partitions=new_partitions,
                        props=new_props,
                    )
                )
            except BaseException:
                # the staged dir is not referenced by any manifest yet —
                # remove it so conflict/retry loops don't leak disk
                shutil.rmtree(out, ignore_errors=True)
                raise
        return self.current_manifest()

    def compact(
        self,
        spark: SparkSession,
        partition_value: object,
        target_files: int = 1,
    ) -> Manifest:
        """Rewrite one partition's data into ``target_files`` parquet files.

        Every ingest writes the merged partition with the session's shuffle
        parallelism, so a hot tenant accumulates ~shuffle.partitions small
        files per ingest generation. Compaction is data-identical maintenance:
        read the current partition, coalesce (narrow — no shuffle), publish as
        a new version through the same locked/atomic path as any write.
        Readers of the old version are unaffected (keep_versions retention).

        The read is PINNED to the manifest version observed at entry and the
        publish carries that version as ``expected_version`` — an ingest that
        lands between the read and the publish makes the publish conflict
        (instead of silently rolling the partition back to pre-ingest data),
        and the compaction retries against the new version. Compaction mints
        no ids, so it does not guard max_id.
        """
        for _ in range(5):
            manifest = self.current_manifest()
            df = self.read(
                spark,
                partition_value,
                version=manifest.version if manifest.version else None,
            ).coalesce(max(1, target_files))
            try:
                return self.overwrite_partitions(
                    df, [partition_value], expected_version=manifest.version
                )
            except SnapshotConflictError:
                continue
        raise SnapshotConflictError(
            f"compact({partition_value!r}) lost the publish race 5 times; "
            "a writer is continuously updating this partition"
        )

    def overwrite_all(
        self, df: DataFrame, expected_version: int | None = None
    ) -> Manifest:
        """Full-table replace (tests/bootstrap and the auth layer's tiny
        tables — never the ingest path).

        ``expected_version`` is the read-modify-write guard: callers that
        derived ``df`` from a snapshot read pass the version they read, and
        a publish that landed in between raises ``SnapshotConflictError``
        instead of silently dropping the racer's rows (the caller re-reads
        and retries — see AuthService._rmw)."""
        with self._write_lock():
            manifest = self.current_manifest()
            if (
                expected_version is not None
                and manifest.version != expected_version
            ):
                raise SnapshotConflictError(
                    f"table advanced to v{manifest.version} since the "
                    f"caller read v{expected_version}; re-read and retry"
                )
            new_version = manifest.version + 1
            dir_name = f"v{new_version:06d}-{uuid.uuid4().hex[:8]}"
            out = os.path.join(self.root, dir_name)
            try:
                (
                    df.select(
                        *[
                            F.col(f.name).cast(f.dataType)
                            for f in self.schema.fields
                        ]
                    )
                    .write.mode("overwrite")
                    .parquet(out)
                )
                spark = df.sparkSession
                written = spark.read.schema(self.schema).parquet(out)
                agg = written.agg(
                    F.collect_set(self.partition_col).alias("vals"),
                    F.max("id").alias("max_id"),
                ).first()
                vals = [str(v) for v in (agg["vals"] or [])]
                props = dict(manifest.props)
                if "id" in written.columns and agg["max_id"] is not None:
                    props["max_id"] = max(
                        int(agg["max_id"]), int(props.get("max_id", 0))
                    )
                self._publish(
                    Manifest(
                        version=new_version,
                        partitions={v: [dir_name] for v in vals},
                        props=props,
                    )
                )
            except BaseException:
                shutil.rmtree(out, ignore_errors=True)
                raise
        return self.current_manifest()
