"""Property test: duplicate_clusters (distributed large-star/small-star
contraction) against a serial union-find oracle over RANDOM graphs.

The named CC tests pin hand-picked shapes (chains, stars, merges across
batches); hypothesis closes the gap between those and arbitrary topology —
self-loops, parallel/duplicate edges, many small components next to one
big one, ids arriving in any order. The oracle is ~15 lines of textbook
union-find, so a disagreement localizes the bug to the contraction."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F


def _uf_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]  # path halving
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


edge_lists = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=24),
        st.integers(min_value=0, max_value=24),
    ),
    min_size=1,
    max_size=40,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edge_lists)
def test_clusters_match_union_find(spark, edges):
    from client_data_ingester_spark.operators.dedup import duplicate_clusters

    pairs = spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges], "doc_a long, doc_b long"
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in duplicate_clusters(pairs).collect()
    }
    oracle = _uf_components(edges)
    # contract: every doc on a non-self-loop edge is labeled with its
    # component's MINIMUM id; pure self-loop nodes are not "duplicates"
    # and don't appear
    expect = {
        x: r
        for x, r in oracle.items()
        if any(a != b and x in (a, b) for a, b in edges)
    }
    assert got == expect


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edge_lists, st.integers(min_value=0, max_value=40))
def test_warm_start_equals_cold_recompute(spark, edges, split_at):
    """Property: warm_start_clusters(labels(old), new) == labels(old ∪ new)
    for ANY split of a random edge list — chained merges across the split,
    brand-new components in the delta, delta edges internal to old
    clusters, empty halves. This is the exact-equivalence contract the
    warm-started streaming refresh relies on."""
    from client_data_ingester_spark.operators.dedup import (
        duplicate_clusters,
        warm_start_clusters,
    )

    split_at = min(split_at, len(edges))
    old_e, new_e = edges[:split_at], edges[split_at:]

    def df_of(es):
        return spark.createDataFrame(
            [(int(a), int(b)) for a, b in es] or [], "doc_a long, doc_b long"
        )

    old_labels = duplicate_clusters(df_of(old_e))
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in warm_start_clusters(old_labels, df_of(new_e)).collect()
    }
    expect = {
        r["doc_id"]: r["cluster_id"]
        for r in duplicate_clusters(df_of(edges)).collect()
    }
    assert got == expect


# -- star-edge (spanning) emission equivalence ------------------------------
# The clustering path feeds duplicate_clusters with O(bucket) spanning
# edges instead of the Θ(bucket²) pair expansion; these properties pin the
# CC-equivalence that substitution relies on, for arbitrary bucket
# topology (unverified exact-key buckets) and arbitrary small corpora
# (verified cosine pipeline with failed-hub re-expansion).

keyed_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=15),  # id
        st.integers(min_value=0, max_value=2),   # band
        st.integers(min_value=0, max_value=4),   # key
    ),
    min_size=1,
    max_size=40,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(keyed_rows)
def test_star_edges_span_same_components(spark, rows):
    """in_bucket_star_edges must span EXACTLY the components of
    in_bucket_pairs for any bucket topology — duplicate (bucket, id)
    rows, overlapping buckets chaining components, singleton buckets."""
    from client_data_ingester_spark.operators.dedup import (
        in_bucket_pairs,
        in_bucket_star_edges,
        incremental_lsh_star_edges,
    )

    keyed = spark.createDataFrame(
        [(int(i), int(b), int(k)) for i, b, k in rows],
        "doc_id long, band int, key long",
    )
    pairs = in_bucket_pairs(keyed, "doc_id", "doc_a", "doc_b").collect()
    stars = in_bucket_star_edges(keyed, "doc_id", "doc_a", "doc_b").collect()
    assert _uf_components(
        [(r["doc_a"], r["doc_b"]) for r in pairs]
    ) == _uf_components([(r["doc_a"], r["doc_b"]) for r in stars])


vec_corpora = st.lists(
    st.lists(
        st.sampled_from([-1.0, -0.5, 0.25, 1.0]), min_size=4, max_size=4
    ),
    min_size=2,
    max_size=10,
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(vec_corpora, st.sampled_from([0.2, 0.6, 0.95]))
def test_embedding_dup_edges_components_match_pairs(spark, vecs, threshold):
    """The VERIFIED spanning-edge recipe (hub edges + failed-hub
    re-expansion) must produce identical connected components to the
    full verified pair list, at every threshold regime: lax (hubs pass),
    strict (hubs fail, re-expansion carries), and mixed."""
    from client_data_ingester_spark.operators import similarity as S

    corpus = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    kw = dict(threshold=threshold, bits=4, bands=3, dim=4)
    pairs = S.embedding_near_duplicates(corpus, **kw).collect()
    edges = S.embedding_dup_edges(corpus, **kw).collect()
    assert _uf_components(
        [(r["id_a"], r["id_b"]) for r in pairs]
    ) == _uf_components([(r["id_a"], r["id_b"]) for r in edges])


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(keyed_rows, st.integers(min_value=1, max_value=4))
def test_incremental_star_edges_span_same_components(spark, rows, n_batches):
    """The streaming edge emission (per-batch in-batch stars + ONE cross
    anchor per new-doc bucket) must span the same components as the full
    pair expansion over the whole corpus — for ANY batch split of any
    bucket topology. This pins the arrival-order induction the stream
    relies on: every indexed bucket member connected into its bucket's
    component when IT arrived, so a new doc needs only one anchor."""
    from client_data_ingester_spark.operators.dedup import (
        in_bucket_pairs,
        in_bucket_star_edges,
        incremental_lsh_star_edges,
    )

    # drop duplicate (id, band, key) rows; assign each doc id to ONE
    # batch (its first appearance), as a real doc stream would
    rows = list(dict.fromkeys(rows))
    ids = sorted({i for i, _, _ in rows})
    batch_of = {i: idx % n_batches for idx, i in enumerate(ids)}

    def kdf(rs):
        return spark.createDataFrame(
            [(int(i), int(b), int(k)) for i, b, k in rs] or [],
            "doc_id long, band int, key long",
        )

    edges = []
    for bi in range(n_batches):
        batch_rows = [r for r in rows if batch_of[r[0]] == bi]
        if not batch_rows:
            continue
        earlier = [r for r in rows if batch_of[r[0]] < bi]
        keys = kdf(batch_rows)
        within = in_bucket_star_edges(keys, "doc_id", "doc_a", "doc_b")
        edges += [(r["doc_a"], r["doc_b"]) for r in within.collect()]
        if earlier:
            # cross anchors via the PRODUCTION function — a regression
            # in its join condition or least/greatest canonicalization
            # fails here, not only in the slower e2e stream test
            cross = incremental_lsh_star_edges(
                None, kdf(earlier), band_keys=keys
            )
            edges += [
                (r["doc_a"], r["doc_b"]) for r in cross.collect()
            ]
    full = in_bucket_pairs(kdf(rows), "doc_id", "doc_a", "doc_b").collect()
    assert _uf_components(edges) == _uf_components(
        [(r["doc_a"], r["doc_b"]) for r in full]
    )


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=40),
            st.integers(min_value=0, max_value=40),
        ),
        max_size=120,
    )
)
@settings(deadline=None, max_examples=60)
def test_check_correctness_union_find_oracle_matches_bfs(pairs):
    """The scaled-gate oracle override (tools/check_correctness.py
    _union_find_clusters) must label exactly like the recursive-CTE
    closure it replaces: min node id per connected component, one row
    per node appearing in >= 1 pair. Pinned against an independent BFS
    closure so the override can adjudicate sf0.5 with the same standard
    as the SQL (r13 verdict ask #1)."""
    import duckdb

    from tools.check_correctness import _union_find_clusters

    pairs = [(a, b) for a, b in pairs if a != b]
    con = duckdb.connect()
    if pairs:
        values = ", ".join(
            f"({min(a, b)}, {max(a, b)})" for a, b in pairs
        )
        sql = (
            "SELECT DISTINCT * FROM (VALUES "
            + values
            + ") AS t(id_a, id_b)"
        )
    else:
        sql = "SELECT 1 AS id_a, 2 AS id_b WHERE FALSE"
    rows, cols = _union_find_clusters(con, sql)
    assert cols == ["vec_id", "cluster_id"]
    # independent BFS closure
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    expected = {}
    seen = set()
    for start in adj:
        if start in seen:
            continue
        comp, frontier = {start}, [start]
        while frontier:
            nxt = []
            for u in frontier:
                for v in adj[u]:
                    if v not in comp:
                        comp.add(v)
                        nxt.append(v)
            frontier = nxt
        seen |= comp
        label = min(comp)
        for u in comp:
            expected[u] = label
    assert dict(rows) == expected
    assert len(rows) == len(expected)
