"""Reliable-checkpoint mode for the iterative contraction (r11 ask #3).

``localCheckpoint`` blocks die with their executor — on a cluster an
executor loss mid-contraction fails the job unrecoverably. The
``reliable=`` option swaps them for SparkContext-checkpoint-dir blocks.
These tests pin (1) value equivalence of both modes and of the folded
``check_every`` convergence cadence, and (2) that reliable mode really
writes into the checkpoint directory.
"""

import os

import pytest

from client_data_ingester_spark.operators import dedup
from client_data_ingester_spark.operators.ckpt import ensure_checkpoint_dir
from client_data_ingester_spark.operators.dedup import duplicate_clusters


@pytest.fixture(autouse=True)
def _force_distributed_contraction(monkeypatch):
    # this file pins the DISTRIBUTED contraction's reliable= seam; the
    # size-gated driver-side fast path (which never checkpoints) would
    # make every assertion here vacuous at these toy edge counts
    monkeypatch.setattr(dedup, "LOCAL_SOLVE_MAX_EDGES", 0)


def _pairs(spark):
    # two chained components (1-2-3-4, 10-11) + an isolated self-dup pair
    rows = [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 20)]
    return spark.createDataFrame(rows, "doc_a long, doc_b long")


def _labels(df):
    return {(r["doc_id"], r["cluster_id"]) for r in df.collect()}


def test_reliable_contraction_matches_local(spark, tmp_path):
    ensure_checkpoint_dir(spark, str(tmp_path / "ckpt"))
    base = _labels(duplicate_clusters(_pairs(spark)))
    rel = _labels(duplicate_clusters(_pairs(spark), reliable=True))
    assert rel == base
    assert base == {
        (1, 1), (2, 1), (3, 1), (4, 1),
        (10, 10), (11, 10), (20, 20), (21, 20),
    }
    # the reliable blocks actually landed in the checkpoint dir
    ckpt_files = []
    for root, _dirs, files in os.walk(str(tmp_path / "ckpt")):
        ckpt_files += files
    assert ckpt_files, "reliable mode wrote nothing to the checkpoint dir"


@pytest.mark.parametrize("check_every", [1, 3])
def test_check_every_cadence_is_value_neutral(spark, check_every):
    base = _labels(duplicate_clusters(_pairs(spark)))
    alt = _labels(duplicate_clusters(_pairs(spark), check_every=check_every))
    assert alt == base


def test_long_chain_still_converges(spark):
    # 40-node chain: O(log n) rounds with the folded check cadence
    rows = [(i, i + 1) for i in range(40)]
    out = _labels(
        duplicate_clusters(
            spark.createDataFrame(rows, "doc_a long, doc_b long")
        )
    )
    assert out == {(i, 0) for i in range(41)}


def test_embedding_dup_clusters_reliable_matches(spark, tmp_path):
    import numpy as np

    ensure_checkpoint_dir(spark, str(tmp_path / "ckpt"))
    from client_data_ingester_spark.operators.similarity import (
        embedding_dup_clusters,
    )

    rng = np.random.RandomState(7)
    base_vecs = rng.randn(6, 8)
    rows = []
    vid = 0
    for v in base_vecs:
        v = v / np.linalg.norm(v)
        for _ in range(3):  # 3 exact clones per base → 6 clusters of 3
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    corpus = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    kw = dict(threshold=0.99, bits=4, bands=2, dim=8)
    base = {
        (r["vec_id"], r["cluster_id"])
        for r in embedding_dup_clusters(corpus, **kw).collect()
    }
    rel = {
        (r["vec_id"], r["cluster_id"])
        for r in embedding_dup_clusters(corpus, reliable=True, **kw).collect()
    }
    assert rel == base
    assert len(base) == 18  # every vector labeled


def test_warm_start_reliable_matches_local(spark, tmp_path):
    """r12 verdict ask #4: the warm-start remap pin is now routed
    through the same reliable= seam as the contraction rounds."""
    from client_data_ingester_spark.operators.dedup import (
        warm_start_clusters,
    )

    ensure_checkpoint_dir(spark, str(tmp_path / "ckpt"))
    old = duplicate_clusters(_pairs(spark))
    new_edges = spark.createDataFrame(
        [(4, 10), (30, 31)], "doc_a long, doc_b long"
    )  # merges 1-..-4 with 10-11; adds a brand-new component
    base = _labels(warm_start_clusters(old, new_edges))
    rel = _labels(warm_start_clusters(old, new_edges, reliable=True))
    assert rel == base
    assert base == {
        (1, 1), (2, 1), (3, 1), (4, 1), (10, 1), (11, 1),
        (20, 20), (21, 20), (30, 30), (31, 30),
    }


def test_refresh_cluster_index_reliable_matches(spark, tmp_path):
    """refresh_cluster_index(reliable=True) lands the identical artifact
    through the durable-checkpoint path."""
    from client_data_ingester_spark.streaming.cluster_stream import (
        refresh_cluster_index,
    )

    ensure_checkpoint_dir(spark, str(tmp_path / "ckpt"))

    def run(tag, reliable):
        state = str(tmp_path / f"state_{tag}")
        idx = str(tmp_path / f"idx_{tag}")
        for b, rows in enumerate([[(1, 2), (2, 3)], [(3, 4), (8, 9)]]):
            spark.createDataFrame(
                rows, "doc_a long, doc_b long"
            ).write.mode("overwrite").parquet(
                f"{state}/edges/batch_id={b}"
            )
            refresh_cluster_index(spark, state, idx, reliable=reliable)
        return {
            (r["doc_id"], r["cluster_id"])
            for r in spark.read.parquet(idx).collect()
        }

    base = run("local", False)
    rel = run("rel", True)
    assert rel == base
    assert base == {(1, 1), (2, 1), (3, 1), (4, 1), (8, 8), (9, 8)}
