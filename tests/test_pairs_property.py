"""Property test: in_bucket_pairs (the banded-LSH pair-expansion idiom
shared by minhash and random-hyperplane blocking) against a brute-force
itertools oracle over RANDOM bucket assignments.

The named tests pin hand-picked bucket shapes; hypothesis closes the gap
to arbitrary topology — ids in many buckets at once, singleton buckets,
one giant bucket, duplicate (band, key, id) rows. The oracle is three
lines of itertools.combinations, so a disagreement localizes the bug to
the array expansion."""

import itertools

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

assignments = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),   # band
        st.integers(min_value=0, max_value=4),   # key
        st.integers(min_value=0, max_value=12),  # id
    ),
    min_size=1,
    max_size=40,
)


def _oracle_pairs(rows):
    buckets = {}
    for band, key, i in rows:
        buckets.setdefault((band, key), set()).add(i)
    out = set()
    for ids in buckets.values():
        out |= set(itertools.combinations(sorted(ids), 2))
    return out


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(assignments)
def test_in_bucket_pairs_match_bruteforce(spark, rows):
    from client_data_ingester_spark.operators.dedup import in_bucket_pairs

    keyed = spark.createDataFrame(
        [(int(b), str(k), int(i)) for b, k, i in rows],
        "band int, key string, doc_id long",
    )
    got = {
        (r["doc_a"], r["doc_b"])
        for r in in_bucket_pairs(keyed, "doc_id", "doc_a", "doc_b").collect()
    }
    want = _oracle_pairs(rows)
    assert got == want
    # ordered-pair invariant: a < b always, so no (b, a) mirror survives
    assert all(a < b for a, b in got)


# min-band emission requires every id to appear in EVERY band (the
# full-corpus band-key table shape); generate exactly that topology.
full_coverage = st.lists(
    st.lists(
        st.integers(min_value=0, max_value=3),  # key of band b, per id
        min_size=3,
        max_size=3,  # 3 bands
    ),
    min_size=2,
    max_size=14,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(full_coverage)
def test_min_band_pairs_match_distinct_expansion(spark, key_rows):
    """min_band=True must produce EXACTLY the distinct pair set of the
    default expansion — same pairs, each emitted exactly once (the whole
    point: the dedup DISTINCT becomes unnecessary, it doesn't become
    approximate)."""
    from client_data_ingester_spark.operators.dedup import in_bucket_pairs

    rows = [
        (band, str(key), i)
        for i, keys in enumerate(key_rows)
        for band, key in enumerate(keys)
    ]
    keyed = spark.createDataFrame(
        rows, "band int, key string, doc_id long"
    )
    emitted = [
        (r["doc_a"], r["doc_b"])
        for r in in_bucket_pairs(
            keyed, "doc_id", "doc_a", "doc_b", min_band=True
        ).collect()
    ]
    want = _oracle_pairs(rows)
    assert set(emitted) == want
    # exactly-once: no pair appears twice (no distinct needed downstream)
    assert len(emitted) == len(set(emitted))
    assert all(a < b for a, b in emitted)
