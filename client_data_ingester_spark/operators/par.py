"""Scan-parallelism fan-out for expression-heavy kernels.

Local parquet drops are single-row-group files, so a scan yields ONE
input split however many cores the session has — and every narrow stage
chained onto it (tokenize + explode + md5, image decode in mapInPandas,
per-row regex) runs single-task until the first exchange. ``fan_out``
round-robins the relation to ``defaultParallelism`` partitions ONLY
when the source has fewer splits than cores, so the per-row kernel runs
at full width.

Scale-adaptive by construction: at any real corpus size the scan
already has >= cores splits and the branch never fires (zero added
shuffles at 100 TB — same contract as the identical branch
``operators/profile._profile_portable`` has carried since r14). Apply
it ONLY in front of kernels whose per-row cost dominates the shuffle of
their (narrow) input; a cheap explode+count gets SLOWER with an extra
exchange (measured: word count 0.38 s -> 1.27 s fanned, while the
md5-heavy CMS register fold on the same rows went 1.58 s -> 0.74 s).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame) -> DataFrame:
    """Round-robin ``df`` to ``defaultParallelism`` partitions iff the
    source currently has fewer — a no-op at scale, a 32x kernel-width
    fix on single-split local files. Row-content is untouched, so every
    deterministic operator downstream is value-identical either way."""
    sc = df.sparkSession.sparkContext
    n = sc.defaultParallelism
    if df.rdd.getNumPartitions() < n:
        return df.repartition(n)
    return df
