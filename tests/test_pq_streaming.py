"""Streaming PQ encode: embedding arrivals encoded against the static
codebooks, bit-identical to a batch re-encode, exactly-once per shard."""

import json

from pyspark.sql import functions as F

from client_data_ingester_spark.operators.similarity import (
    pq_encode,
    pq_model,
)
from client_data_ingester_spark.streaming.pq_stream import (
    read_codes,
    start_pq_encode_stream,
)


def _vec(i, dim=8):
    # deterministic pseudo-embedding in [-1, 1]
    return [(((31 * i + 7 * d) % 200) - 100) / 100.0 for d in range(dim)]


def _write_vecs(path, ids):
    with open(path, "w") as f:
        for i in ids:
            f.write(
                json.dumps(
                    {
                        "vec_id": i,
                        "ts": "2024-01-01T10:00:00.000Z",
                        "embedding": _vec(i),
                    }
                )
                + "\n"
            )


def _train(spark):
    rows = [(i, _vec(i)) for i in range(12)]
    corpus = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )
    _, books = pq_model(corpus, dim=8, m=2, k=3, n_iter=2)
    return corpus, books


def test_streamed_codes_match_batch_encode(spark, tmp_path):
    corpus, books = _train(spark)
    src = tmp_path / "vecs"
    src.mkdir()
    codes_dir = str(tmp_path / "codes")
    # poll-before-first-commit returns an empty typed relation
    assert read_codes(spark, codes_dir).count() == 0
    _write_vecs(src / "b1.json", [20, 21, 22])
    q = start_pq_encode_stream(
        spark, str(src), str(tmp_path / "ckpt"), codes_dir, books,
        dim=8, m=2, query_name="pq_t1",
    )
    try:
        q.processAllAvailable()
        _write_vecs(src / "b2.json", [23, 24])
        q.processAllAvailable()
    finally:
        q.stop()
    streamed = {
        (r.vec_id, r.sub): (r.code, r.dist_sq)
        for r in read_codes(spark, codes_dir).collect()
    }
    arrivals = spark.createDataFrame(
        [(i, _vec(i)) for i in range(20, 25)],
        "vec_id long, embedding array<float>",
    )
    batch = {
        (r.vec_id, r.sub): (r.code, r.dist_sq)
        for r in pq_encode(arrivals, books, dim=8, m=2).collect()
    }
    assert streamed == batch
    assert len(streamed) == 5 * 2  # one code per (vector, subspace)


def test_pq_encode_reproduces_training_codes(spark):
    """Encoding the training corpus against its own codebooks must
    reproduce the model's persisted codes bit-for-bit."""
    corpus, books = _train(spark)
    codes, _ = pq_model(corpus, dim=8, m=2, k=3, n_iter=2)
    want = {(r.vec_id, r.sub): r.code for r in codes.collect()}
    got = {
        (r.vec_id, r.sub): r.code
        for r in pq_encode(corpus, books, dim=8, m=2).collect()
    }
    assert got == want
