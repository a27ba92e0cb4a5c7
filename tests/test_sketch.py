"""HLL sketch operator ([EXT], operators/sketch.py): the properties that make
it useful at 100 TB — registers merge associatively (per-slice state tables
combine to the exact whole-corpus answer), the estimate is deterministic,
and the plan aggregates in two map-side-partial stages."""

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from client_data_ingester_spark.operators import sketch as K


def _vals(spark, n, tag_mod=3):
    return spark.range(0, n).select(
        F.col("id").alias("v"),
        (F.col("id") % tag_mod).cast("string").alias("tag"),
        (F.col("id") % 2).alias("slice"),
    )


def test_registers_merge_associatively(spark):
    """max-merging register tables built on disjoint slices gives the exact
    same registers — and therefore the exact same estimate — as one pass
    over the whole. This is the property that lets per-day register tables
    answer whole-corpus distinct queries without re-reading raw data."""
    df = _vals(spark, 5000)
    whole = K.hll_registers(df, "v").collect()
    merged = (
        K.hll_registers(df.filter(F.col("slice") == 0), "v")
        .unionAll(K.hll_registers(df.filter(F.col("slice") == 1), "v"))
        .groupBy("bucket")
        .agg(F.max("r").alias("r"))
        .collect()
    )
    assert sorted((r["bucket"], r["r"]) for r in whole) == sorted(
        (r["bucket"], r["r"]) for r in merged
    )


def test_estimate_accuracy_and_determinism(spark):
    df = _vals(spark, 5000)
    row = K.hll_distinct(df, "v").collect()[0]
    # m=64 → ~13% standard error; this is a fixed dataset + fixed hash, so
    # the value is deterministic — pin the tolerance loosely and rerun for
    # exact repeatability
    assert abs(row["est_distinct"] - 5000) / 5000 < 0.30
    again = K.hll_distinct(df, "v").collect()[0]
    assert again["est_distinct"] == row["est_distinct"]
    assert again["s_int"] == row["s_int"]


def test_small_range_linear_counting_branch(spark):
    """A tiny group must take the linear-counting branch (raw HLL is badly
    biased below 2.5m) and land essentially on the exact count."""
    df = _vals(spark, 10)
    row = K.hll_distinct(df, "v").collect()[0]
    assert row["n_used"] <= 10
    assert abs(row["est_distinct"] - 10) <= 2


def test_grouped_sketch_matches_per_group_build(spark):
    df = _vals(spark, 3000)
    grouped = {
        r["tag"]: (r["s_int"], r["est_distinct"])
        for r in K.hll_distinct(df, "v", ["tag"]).collect()
    }
    assert set(grouped) == {"0", "1", "2"}
    for tag in grouped:
        solo = K.hll_distinct(
            df.filter(F.col("tag") == tag), "v"
        ).collect()[0]
        assert (solo["s_int"], solo["est_distinct"]) == grouped[tag]


def test_register_build_is_one_shuffle_two_stage_agg(spark):
    """The register fold must shuffle once (on group+bucket) with a map-side
    partial max — at 100 TB the shuffle carries ≤ m rows per group per
    task, never the raw values."""
    regs = K.hll_registers(_vals(spark, 1000), "v", ["tag"])
    buf = io.StringIO()
    with redirect_stdout(buf):
        regs.explain("formatted")
    # formatted explain prints each node in the tree AND a detail section;
    # count only the tree (text up to the first blank line)
    tree = buf.getvalue().split("== Physical Plan ==")[1].split("\n\n")[0]
    assert tree.count("Exchange") == 1
    assert tree.count("HashAggregate") == 2  # partial + final


def test_cms_overestimates_never_underestimates(spark):
    """CMS point estimates are one-sided: collisions only inflate, so
    est >= exact for every key — the property that makes the sketch safe
    for heavy-hitter screening (no false negatives above the threshold)."""
    df = spark.range(0, 20_000).select(
        # zipf-ish: low keys occur many times, tail keys once
        (F.col("id") % 50).alias("k")
    )
    regs = K.cms_registers(df, "k")
    probes = df.select("k").distinct()
    est = {
        r["k"]: r["est_count"]
        for r in K.cms_estimate(regs, probes, "k").collect()
    }
    exact = {r["k"]: r["count"] for r in df.groupBy("k").count().collect()}
    assert set(est) == set(exact)
    assert all(est[k] >= exact[k] for k in exact)


def test_cms_registers_merge_by_sum(spark):
    df = spark.range(0, 8_000).select(
        (F.col("id") % 100).alias("k"), (F.col("id") % 2).alias("slice")
    )
    whole = K.cms_registers(df, "k").collect()
    merged = (
        K.cms_registers(df.filter(F.col("slice") == 0), "k")
        .unionAll(K.cms_registers(df.filter(F.col("slice") == 1), "k"))
        .groupBy("r", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
        .collect()
    )
    assert sorted((r["r"], r["bucket"], r["cnt"]) for r in whole) == sorted(
        (r["r"], r["bucket"], r["cnt"]) for r in merged
    )


def test_cms_state_is_bounded(spark):
    """However large the input, the register table is at most depth×width
    rows — the reason the probe join is always broadcast-safe."""
    df = spark.range(0, 50_000).select(F.col("id").alias("k"))  # all unique
    n = K.cms_registers(df, "k").count()
    assert n <= K.CMS_DEPTH * K.CMS_WIDTH


def test_hist_quantiles_accuracy_and_merge(spark):
    """Histogram registers SUM-merge across slices, and quantile estimates
    land within one bin width of the exact rank statistic."""
    df = spark.range(0, 10_000).select(
        (F.col("id") % 1000).cast("double").alias("v"),
        (F.col("id") % 2).alias("slice"),
    )
    lo, hi, nb = 0.0, 1000.0, 100  # bin width 10
    whole = K.hist_registers(df, "v", lo, hi, nb).collect()
    merged = (
        K.hist_registers(df.filter(F.col("slice") == 0), "v", lo, hi, nb)
        .unionAll(
            K.hist_registers(df.filter(F.col("slice") == 1), "v", lo, hi, nb)
        )
        .groupBy("bin")
        .agg(F.sum("cnt").alias("cnt"))
        .collect()
    )
    assert sorted((r["bin"], r["cnt"]) for r in whole) == sorted(
        (r["bin"], r["cnt"]) for r in merged
    )

    regs = K.hist_registers(df, "v", lo, hi, nb)
    est = {
        r["q"]: r["est_value"]
        for r in K.hist_quantiles(regs, [0.5, 0.9, 0.99], lo, hi, nb).collect()
    }
    # uniform 0..999 → true p50≈500, p90≈900, p99≈990; bin width 10
    assert abs(est[0.5] - 500) <= 10
    assert abs(est[0.9] - 900) <= 10
    assert abs(est[0.99] - 990) <= 10
    # out-of-domain values clamp into edge bins instead of disappearing
    spiked = df.unionAll(
        spark.range(0, 1).select(
            F.lit(10_000.0).alias("v"), F.lit(0).cast("long").alias("slice")
        )
    )
    top = K.hist_registers(spiked, "v", lo, hi, nb).filter(
        F.col("bin") == nb - 1
    )
    base_top = K.hist_registers(df, "v", lo, hi, nb).filter(
        F.col("bin") == nb - 1
    )
    assert top.collect()[0]["cnt"] == base_top.collect()[0]["cnt"] + 1


def test_bloom_screen_is_one_sided_superset_of_exact(spark):
    """Every shingle truly shared with the eval split MUST hit the bloom
    (no false negatives — zero-hit docs are proven clean); bloom hits are
    allowed to exceed the exact count (false positives), never undercut."""
    from client_data_ingester_spark.operators.corpus import (
        contamination_check,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    bloom = {
        r["doc_id"]: (r["n_shingles"], r["n_bloom_hits"], r["dropped"])
        for r in K.bloom_decontaminate(docs).collect()
    }
    # exact contamination of the TRAIN split = contamination_check with
    # the splits swapped (train_pct inverted semantics): recompute exactly
    # with a direct join
    from client_data_ingester_spark.operators.corpus import hash_split
    from client_data_ingester_spark.operators.dedup import exploded_shingles

    split = hash_split(docs).select("doc_id", "split")
    sh = exploded_shingles(docs, "text", 3).join(split, "doc_id")
    ev_sh = sh.filter(F.col("split") == "eval").select("sh").distinct()
    exact = {
        r["doc_id"]: r["n_exact"]
        for r in (
            sh.filter(F.col("split") == "train")
            .join(ev_sh.withColumn("_hit", F.lit(1)), "sh", "left")
            .groupBy("doc_id")
            .agg(F.sum(F.coalesce(F.col("_hit"), F.lit(0))).alias("n_exact"))
            .collect()
        )
    }
    assert set(bloom) == set(exact)
    for doc_id, n_exact in exact.items():
        n_sh, n_hits, dropped = bloom[doc_id]
        assert n_hits >= n_exact, doc_id  # one-sided
        assert n_hits <= n_sh
        if n_exact > 0:
            assert dropped  # truly contaminated docs always flagged


def test_contaminated_spans_islands(spark):
    """Consecutive bloom-hit shingle positions must merge into one span;
    gaps split spans; zero-hit docs emit nothing."""
    from pyspark.sql import functions as F

    from client_data_ingester_spark.operators.dedup import exploded_shingles
    from client_data_ingester_spark.operators.sketch import (
        bloom_registers,
        contaminated_spans,
    )

    eval_docs = spark.createDataFrame(
        [(100, "alpha beta gamma delta")], ["doc_id", "text"]
    )
    train = spark.createDataFrame(
        [
            # "alpha beta gamma delta" shingles at pos 0-1; then noise;
            # then the same overlap again later -> two islands
            (1, "alpha beta gamma delta xx yy zz qq alpha beta gamma delta"),
            (2, "totally unrelated words only here"),
        ],
        ["doc_id", "text"],
    )
    bits = bloom_registers(exploded_shingles(eval_docs), "sh")
    rows = contaminated_spans(train, bits).collect()
    assert {r.doc_id for r in rows} == {1}
    spans = [(r.start_pos, r.end_pos, r.n_shingles) for r in rows]
    assert len(spans) == 2
    assert spans[0][0] == 0 and spans[0][1] >= 1
    assert spans[1][0] > spans[0][1] + 1  # separated by a gap
    for s, e, n in spans:
        assert n == e - s + 1  # contiguous island


def test_cms_word_error_is_one_sided(spark):
    """CMS can only OVERestimate — every probe's estimate must be >= the
    exact count (the property the calibration report relies on)."""
    import importlib

    m = importlib.import_module("__spark_entry__")
    rows = m.queries()["sketch_cms_word_error"](
        spark, str(__import__("conftest").SF_DIR)
    ).collect()
    assert len(rows) == 20
    for r in rows:
        assert r.overestimate >= 0
        assert r.est_count == r.exact_count + r.overestimate


def test_hll_ignores_nulls(spark):
    """COUNT(DISTINCT x) semantics: nulls are not values. Without the
    null filter, a null hashes to a phantom (bucket=NULL, r=NULL) register
    that inflates n_used / shrinks zeros and skews the estimate."""
    clean = _vals(spark, 500)
    dirty = clean.unionAll(
        spark.range(0, 3).select(
            F.lit(None).cast("long").alias("v"),
            F.lit("x").alias("tag"),
            F.lit(0).cast("long").alias("slice"),
        )
    )
    assert (
        K.hll_distinct(dirty, "v").collect()
        == K.hll_distinct(clean, "v").collect()
    )


def test_hll_overlap_union_equals_value_level_union(spark):
    """The register-level merge inside hll_overlap must equal building one
    sketch over the concatenated values (max of per-side maxes == max over
    the union) — EXACT equality of est_union, the mergeability pin."""
    a = spark.range(0, 800).select(F.col("id").alias("v"))
    b = spark.range(500, 1300).select(F.col("id").alias("v"))
    row = K.hll_overlap(a, b, "v", p=10).first()
    direct = K.hll_distinct(a.union(b), "v", p=10).first()
    assert row["est_union"] == direct["est_distinct"]
    # and the per-side estimates are exactly the standalone sketches
    assert row["est_a"] == K.hll_distinct(a, "v", p=10).first()["est_distinct"]
    assert row["est_b"] == K.hll_distinct(b, "v", p=10).first()["est_distinct"]


def test_hll_overlap_inclusion_exclusion_accuracy(spark):
    """Exact |A∩B|=300 on |A|=|B|=800 at p=10 (~3.2% per estimate):
    inclusion-exclusion adds the absolute errors, so the overlap must land
    within a generous but meaningful band, and jaccard must be the
    floor-rendered overlap/union quotient."""
    a = spark.range(0, 800).select(F.col("id").alias("v"))
    b = spark.range(500, 1300).select(F.col("id").alias("v"))
    row = K.hll_overlap(a, b, "v", p=10).first()
    assert 150 <= row["est_overlap"] <= 450  # exact 300
    assert 1000 <= row["est_union"] <= 1600  # exact 1300
    import math

    assert row["jaccard_est"] == (
        math.floor(row["est_overlap"] / row["est_union"] * 10000 + 0.5)
        / 10000
    )


def test_hll_overlap_disjoint_clamps_at_zero(spark):
    """Near-disjoint cohorts can push a+b-u negative from estimate noise;
    the overlap (and so jaccard) must clamp at 0, never go negative."""
    a = spark.range(0, 500).select(F.col("id").alias("v"))
    b = spark.range(10_000, 10_500).select(F.col("id").alias("v"))
    row = K.hll_overlap(a, b, "v", p=10).first()
    assert row["est_overlap"] >= 0.0
    assert 0.0 <= row["jaccard_est"] <= 0.1


def test_hll_overlap_served_off_persisted_registers(spark, tmp_path):
    """The deployment shape: both cohorts' registers are PERSISTED state
    (parquet here; the streaming maintainer in production) and the overlap
    is computed from them alone — numbers identical to the raw-value form."""
    a = spark.range(0, 700).select(F.col("id").alias("v"))
    b = spark.range(400, 1100).select(F.col("id").alias("v"))
    pa, pb = str(tmp_path / "regs_a"), str(tmp_path / "regs_b")
    K.hll_registers(a, "v", p=10).write.parquet(pa)
    K.hll_registers(b, "v", p=10).write.parquet(pb)
    from_regs = K.hll_overlap_from_registers(
        spark.read.parquet(pa), spark.read.parquet(pb), p=10
    ).first()
    from_raw = K.hll_overlap(a, b, "v", p=10).first()
    assert from_regs.asDict() == from_raw.asDict()


def test_hll_overlap_empty_cohorts_degenerate_guard(spark):
    """Degenerate inputs must yield 0.0s, never NULLs: an empty cohort has
    no registers at all (its scope row is ABSENT, not zero), and with both
    sides empty est_union is 0 — the jaccard quotient must be guarded, and
    the DuckDB oracle must render the identical row (NULL-division
    semantics are exactly where engines drift)."""
    import duckdb

    empty = spark.range(0).select(F.col("id").alias("v"))
    some = spark.range(0, 300).select(F.col("id").alias("v"))

    both = K.hll_overlap(empty, empty, "v", p=10).first().asDict()
    assert both == {
        "est_a": 0.0, "est_b": 0.0, "est_union": 0.0,
        "est_overlap": 0.0, "jaccard_est": 0.0,
    }

    one = K.hll_overlap(empty, some, "v", p=10).first().asDict()
    assert one["est_a"] == 0.0
    assert one["est_b"] == one["est_union"] > 0
    assert one["est_overlap"] == 0.0 and one["jaccard_est"] == 0.0

    con = duckdb.connect()
    sql_both = K.hll_overlap_oracle_sql(
        "SELECT CAST(1 AS BIGINT) AS v WHERE FALSE",
        "SELECT CAST(1 AS BIGINT) AS v WHERE FALSE",
        "v", p=10,
    )
    cols = ["est_a", "est_b", "est_union", "est_overlap", "jaccard_est"]
    assert dict(zip(cols, con.sql(sql_both).fetchone())) == both
    sql_one = K.hll_overlap_oracle_sql(
        "SELECT CAST(1 AS BIGINT) AS v WHERE FALSE",
        "SELECT range AS v FROM range(0, 300)",
        "v", p=10,
    )
    assert dict(zip(cols, con.sql(sql_one).fetchone())) == one


def test_overlap_p_for_error_sizing_rules():
    """Variance sizing, bias-window skip, clamping, and input validation
    — the artifact canary (test_scaling_canaries) checks these against
    measurement; this pins the arithmetic itself."""
    import pytest

    # variance regime: tighter target -> more registers, monotonically
    ps = [
        K.overlap_p_for_error(t, 1e9, 1e7) for t in (0.5, 0.25, 0.1, 0.05)
    ]
    assert ps == sorted(ps) and ps[-1] == 18  # big-cohort picks clamp
    # bias window: a variance-m inside (union/8, union/2) bumps to LC zone
    #   cohort 50k, overlap 25k, target 0.5 -> m_needed ~ 277 (dense, keep)
    assert K.overlap_p_for_error(0.5, 50_000, 25_000) == 9
    #   cohort 50k, overlap 5k, target 0.25 -> m_needed ~ 27,700, inside
    #   (12.5k, 50k) -> bumped to union/2 = 50k -> p=16
    assert K.overlap_p_for_error(0.25, 50_000, 5_000) == 16
    with pytest.raises(ValueError):
        K.overlap_p_for_error(0.0, 10, 1)
    with pytest.raises(ValueError):
        K.overlap_p_for_error(0.1, 10, -1)


def test_reservoir_merge_equals_union_build(spark):
    """Mergeability pin: bottom-k over (A ∪ B) == re-bottom-k of the two
    sides' register tables — exact row equality, the property that lets
    per-slice persisted reservoirs combine into any window."""
    a = spark.range(0, 900).select(F.col("id").alias("v"))
    b = spark.range(600, 1500).select(F.col("id").alias("v"))
    direct = K.reservoir_registers(a.union(b), "v", k=32).collect()
    merged = K.reservoir_merge(
        K.reservoir_registers(a, "v", k=32),
        K.reservoir_registers(b, "v", k=32),
        k=32,
    ).collect()
    assert sorted(map(tuple, merged)) == sorted(map(tuple, direct))
    assert len(direct) == 32


def test_reservoir_is_distinct_value_sample_and_deterministic(spark):
    """Duplicates collapse (distinct-value semantics) and the kept set is
    a pure function of the value set — rerun- and partitioning-stable."""
    vals = spark.range(0, 500).select((F.col("id") % 100).alias("v"))
    r1 = K.reservoir_registers(vals, "v", k=16).collect()
    r2 = K.reservoir_registers(
        vals.repartition(7), "v", k=16
    ).collect()
    assert sorted(map(tuple, r1)) == sorted(map(tuple, r2))
    kept = {r["v"] for r in r1}
    assert len(kept) == 16 and all(0 <= v < 100 for v in kept)


def test_kmv_estimate_accuracy_and_exact_small_groups(spark):
    """KMV off the registers: ~1/sqrt(k-2) relative error when filled
    (k=64 -> assert within 3 sigma ~ 40%), EXACT count when the group
    never filled its reservoir."""
    big = spark.range(0, 5000).select(F.col("id").alias("v"))
    row = K.kmv_distinct_from_registers(
        K.reservoir_registers(big, "v", k=64), k=64
    ).first()
    assert row["n_kept"] == 64
    assert 3000 <= row["est_distinct"] <= 7000  # exact 5000
    small = spark.range(0, 40).select(F.col("id").alias("v"))
    row2 = K.kmv_distinct_from_registers(
        K.reservoir_registers(small, "v", k=64), k=64
    ).first()
    assert row2["n_kept"] == 40 and row2["est_distinct"] == 40.0


def test_reservoir_oracle_sql_matches_spark(spark):
    """Cross-engine pin: DuckDB recomputes the identical registers AND
    estimate from the same md5 recipe."""
    import duckdb

    df = spark.range(0, 800).select(
        (F.col("id") % 2).cast("string").alias("g"),
        F.col("id").alias("v"),
    )
    regs = K.reservoir_registers(df, "v", k=16, group_cols=["g"])
    est = K.kmv_distinct_from_registers(regs, k=16, group_cols=["g"])
    got = sorted(
        (r["g"], r["pos"], r["v"], r["hk"], r["n_kept"], r["est_distinct"])
        for r in regs.join(est, "g").collect()
    )
    sql = K.reservoir_oracle_sql(
        "(SELECT CAST(range % 2 AS VARCHAR) AS g, range AS v "
        "FROM range(0, 800))",
        "v",
        k=16,
        group_cols=["g"],
    )
    want = sorted(map(tuple, duckdb.sql(sql).fetchall()))
    assert got == want
