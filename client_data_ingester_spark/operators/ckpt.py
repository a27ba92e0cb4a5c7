"""Materialization seam for iterative operators (VERDICT r11 ask #3).

The large-star/small-star contraction (``dedup.duplicate_clusters``)
and the verified spanning-edge generator (``similarity.
embedding_dup_edges``) must truncate lineage between rounds — otherwise
round N's plan embeds rounds 1..N-1 and Catalyst analysis time grows
with the round count. Two ways to truncate, with different failure
semantics:

- ``localCheckpoint`` (default): blocks live on the executors that
  computed them. Free on local[N]; on a real cluster an executor loss
  mid-contraction FAILS THE JOB — Spark cannot rebuild local-checkpoint
  blocks (no lineage, no replica). Fine for interactive/retryable work.
- ``checkpoint`` (``reliable=True``): blocks are written to the
  SparkContext checkpoint directory (HDFS/object store on a cluster) —
  executor loss recovers by re-reading, which is the semantics a
  1000-executor contraction over 100 TB of edges needs. Costs one extra
  write+read of the per-round relation; callers opt in via the
  ``reliable=`` parameter threaded through the public operators, after
  pointing ``ensure_checkpoint_dir`` (or ``sc.setCheckpointDir``) at a
  durable path.

``eager=False`` is the round-loop fast path: the checkpoint materializes
as a side effect of the NEXT action over the relation (the convergence
checksum), folding what used to be two scheduled jobs per round —
materialize, then aggregate — into one. At toy scale the contraction is
pure scheduler overhead (~0.25 s/job), so halving the job count halves
the measured cost without touching the algorithm; at 100 TB the rounds
are shuffle-bound and the fold is neutral.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def pin(df: DataFrame, reliable: bool = False, eager: bool = True) -> DataFrame:
    """Truncate lineage: reliable checkpoint (cluster-recoverable) or
    local checkpoint (executor-local, the local-mode default)."""
    if reliable:
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)


def ensure_checkpoint_dir(spark: SparkSession, path: str) -> None:
    """Point the session at a durable checkpoint directory (idempotent).
    On a cluster this must be shared storage (HDFS / object store) —
    an executor-local path defeats the recovery the reliable mode buys."""
    sc = spark.sparkContext
    if sc.getCheckpointDir() is None or sc.getCheckpointDir() != path:
        sc.setCheckpointDir(path)
