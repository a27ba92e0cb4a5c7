"""Deterministic synthetic-testdata generator for SCALING runs.

The driver ships read-only testdata at sf{0.001,0.01,0.1}; measuring real
per-query scaling exponents (VERDICT r9 ask #1) needs points above sf0.1,
so this generates the same tables (same schemas, same value domains, same
row-count ratios — see TESTDATA.md) at arbitrary scale factors under a
repo-local scratch dir. Distribution SHAPES match the driver data (uniform
keys, same categorical domains, same text vocab style); exact values don't
— these inputs feed wall-time slope fits, not the DuckDB value oracle.

Determinism: every value derives from xxhash64(salt, id) — independent of
partitioning, task order, and retries (no rand()). Generation is pure
Spark expressions end-to-end: no driver-side loops, no UDFs, so a 10x sf
costs 10x executor time and nothing else.

Usage: python tools/gen_testdata.py <out_dir> <sf> [<sf> ...]
       e.g. python tools/gen_testdata.py /root/repo/scaledata 0.5 1
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from client_data_ingester_spark.session import get_spark  # noqa: E402

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
P_TYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
P_ADJ = ["small", "red", "blue", "hot", "green", "large", "dim", "plated"]
P_NOUN = ["ring", "widget", "bolt", "gear", "gizmo", "cog", "tube", "panel"]
EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]
LANGS = [("en", 44), ("zh", 15), ("de", 14), ("fr", 13), ("es", 14)]
VOCAB = (
    "key agg row scan slow fast table value part a the hash merge join "
    "filter window spark order data column small line customer query "
    "batch shuffle plan index probe build"
).split()


def _u(salt: str, *cols) -> F.Column:
    """Deterministic uniform [0, 1) from (salt, cols)."""
    h = F.xxhash64(F.lit(salt), *cols)
    return (F.pmod(h, F.lit(1_000_000_007)).cast("double")) / 1_000_000_007.0


def _pick(salt: str, id_col, values: list[str]) -> F.Column:
    arr = F.array(*[F.lit(v) for v in values])
    return F.element_at(
        arr, (F.pmod(F.xxhash64(F.lit(salt), id_col), F.lit(len(values))) + 1)
        .cast("int")
    )


def _weighted(salt: str, id_col, pairs: list[tuple[str, int]]) -> F.Column:
    u = _u(salt, id_col) * sum(w for _, w in pairs)
    expr, acc = None, 0
    for val, w in pairs:
        acc += w
        cond = u < acc
        expr = F.when(cond, F.lit(val)) if expr is None else expr.when(cond, F.lit(val))
    return expr.otherwise(F.lit(pairs[-1][0]))


def _r2(c: F.Column) -> F.Column:
    return (F.floor(c * 100 + F.lit(0.5)) / 100.0).cast("double")


# planted-pair geometry: every PLANT_EVERY-th id (id % PLANT_EVERY == 1)
# is a calibrated clone of id-1 at one of PLANT_COS cosines. Targets sit
# OFF the 0.95 eval-bin edge (a pair planted at exactly 0.95 straddles
# the truth bin under float32 storage rounding) while covering the
# 0.92–0.995 design range; 0.92 lands in the 0.9 bin only.
PLANT_EVERY = 25
PLANT_COS = [0.92, 0.96, 0.98, 0.995]


def planted_embeddings(
    spark: SparkSession, n: int, dim: int = 64, extra_cols: dict | None = None
) -> DataFrame:
    """(vec_id, embedding[, extras]): the label-structured synthetic
    corpus with every ``PLANT_EVERY``-th vector replaced by a calibrated
    near-duplicate of its predecessor at a known target cosine.

    Construction (pure Spark expressions, deterministic, no UDFs): for a
    clone c of base b with target t, take the base's double-precision
    vector v, a hash-random direction r, Gram-Schmidt
    u = r − (r·v / v·v)·v (orthogonal to v), and emit
    w = t·v + sqrt(1−t²)·(|v|/|u|)·u — then cos(v, w) = t exactly in
    real arithmetic (float32 storage perturbs it by ~1e-6, far inside
    the 0.005 gap to the nearest eval bin edge). Ground truth is
    recoverable from ids alone: (b, b+1, t(b+1)) via ``planted_truth``.
    """
    dims = F.sequence(F.lit(1), F.lit(dim))
    did = F.col("id")

    def base_vec(idc):
        lbl = F.pmod(F.xxhash64(F.lit("el"), idc), F.lit(10)).cast("int")
        return F.transform(
            dims,
            lambda i: F.cos((lbl + 1) * i.cast("double") / 4.0) * 0.2
            + (_u("en", idc, i) - 0.5) * 0.2,
        )

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    is_clone = (F.pmod(did, F.lit(PLANT_EVERY)) == 1) & (did >= 1)
    t = F.element_at(
        F.array(*[F.lit(c) for c in PLANT_COS]),
        (F.pmod(F.xxhash64(F.lit("pt"), did), F.lit(len(PLANT_COS))) + 1)
        .cast("int"),
    )
    df = (
        spark.range(n)
        .withColumn("_v", base_vec(F.when(is_clone, did - 1).otherwise(did)))
        .withColumn(
            "_r", F.transform(dims, lambda i: _u("ec", did, i) - 0.5)
        )
        .withColumn("_rv", dot(F.col("_r"), F.col("_v")))
        .withColumn("_vv", dot(F.col("_v"), F.col("_v")))
        .withColumn(
            "_u",
            F.zip_with(
                F.col("_r"),
                F.col("_v"),
                lambda r, v: r - (F.col("_rv") / F.col("_vv")) * v,
            ),
        )
        .withColumn(
            "_scale",
            F.sqrt(1 - t * t)
            * F.sqrt(F.col("_vv"))
            / F.sqrt(F.greatest(dot(F.col("_u"), F.col("_u")), F.lit(1e-30))),
        )
    )
    emb = F.when(
        is_clone,
        F.zip_with(
            F.col("_v"),
            F.col("_u"),
            lambda v, u: (t * v + F.col("_scale") * u).cast("float"),
        ),
    ).otherwise(F.transform(F.col("_v"), lambda v: v.cast("float")))
    extras = [
        expr.alias(name) for name, expr in (extra_cols or {}).items()
    ]
    return df.select(did.alias("vec_id"), emb.alias("embedding"), *extras)


def planted_truth(spark: SparkSession, n: int) -> DataFrame:
    """(id_a, id_b, target_cos) for every planted clone pair in a
    ``planted_embeddings(n)`` corpus — ground truth from ids alone."""
    return (
        spark.range(n)
        .where((F.pmod(F.col("id"), F.lit(PLANT_EVERY)) == 1) & (F.col("id") >= 1))
        .select(
            (F.col("id") - 1).alias("id_a"),
            F.col("id").alias("id_b"),
            F.element_at(
                F.array(*[F.lit(c) for c in PLANT_COS]),
                (F.pmod(F.xxhash64(F.lit("pt"), F.col("id")), F.lit(len(PLANT_COS))) + 1)
                .cast("int"),
            ).alias("target_cos"),
        )
    )


def gen_tables(spark: SparkSession, sf: float) -> dict[str, DataFrame]:
    n_cust = max(int(15_000_000 * sf) // 100, 10)
    n_supp = max(int(1_000_000 * sf) // 100, 4)
    n_part = max(int(20_000_000 * sf) // 100, 20)
    n_ord = max(int(150_000_000 * sf) // 100, 50)
    n_events = max(int(100_000_000 * sf) // 100, 50)
    n_docs = max(int(5_000_000 * sf) // 100, 20)
    n_users = max(int(1_500_000 * sf) // 100, 5)

    region = spark.createDataFrame(
        [(i, n) for i, n in enumerate(REGIONS)], "r_regionkey int, r_name string"
    )
    nation = spark.createDataFrame(
        [(i, f"NATION_{i}", i % 5) for i in range(25)],
        "n_nationkey int, n_name string, n_regionkey int",
    )
    customer = spark.range(n_cust).select(
        F.col("id").cast("int").alias("c_custkey"),
        F.format_string("Customer#%09d", F.col("id")).alias("c_name"),
        F.pmod(F.xxhash64(F.lit("cn"), "id"), F.lit(25)).cast("int").alias("c_nationkey"),
        _r2(_u("cb", F.col("id")) * 11000 - 1000).alias("c_acctbal"),
        _pick("cs", F.col("id"), SEGMENTS).alias("c_mktsegment"),
    )
    supplier = spark.range(n_supp).select(
        F.col("id").cast("int").alias("s_suppkey"),
        F.format_string("Supplier#%09d", F.col("id")).alias("s_name"),
        F.pmod(F.xxhash64(F.lit("sn"), "id"), F.lit(25)).cast("int").alias("s_nationkey"),
        _r2(_u("sb", F.col("id")) * 11000 - 1000).alias("s_acctbal"),
    )
    part = spark.range(n_part).select(
        F.col("id").cast("int").alias("p_partkey"),
        F.concat(
            _pick("pa", F.col("id"), P_ADJ), F.lit(" "),
            _pick("pn", F.col("id"), P_NOUN),
        ).alias("p_name"),
        F.concat(
            F.lit("Brand#"),
            (F.pmod(F.xxhash64(F.lit("pb"), "id"), F.lit(25)) + 1).cast("string"),
        ).alias("p_brand"),
        _pick("pt", F.col("id"), P_TYPES).alias("p_type"),
        (F.pmod(F.xxhash64(F.lit("ps"), "id"), F.lit(50)) + 1).cast("int").alias("p_size"),
        _r2(F.lit(900.0) + _u("pp", F.col("id")) * 100).alias("p_retailprice"),
    )
    day0 = F.to_timestamp(F.lit("1995-01-01"))
    orders = spark.range(n_ord).select(
        F.col("id").alias("o_orderkey"),
        F.pmod(F.xxhash64(F.lit("oc"), "id"), F.lit(n_cust)).cast("int").alias("o_custkey"),
        _pick("os", F.col("id"), ["O", "F", "P"]).alias("o_orderstatus"),
        _r2(_u("op", F.col("id")) * 500000 + 900).alias("o_totalprice"),
        (day0 + F.make_interval(days=F.pmod(F.xxhash64(F.lit("od"), "id"), F.lit(2404)).cast("int"))).alias("o_orderdate"),
        _pick("opri", F.col("id"), PRIORITIES).alias("o_orderpriority"),
    )
    # lineitems per order: VARIABLE 1..12 with a small heavy tail (the
    # driver data's shape: 1-13 items, mean ~3.7, qty sums reaching past
    # the q18 sum(l_quantity) > 300 threshold for ~0.3% of orders). The
    # r15 generator emitted exactly 4 items per order — max possible sum
    # 4×50 = 200, so q18's scaled rows were 0 at EVERY generated sf and
    # its sf0.5/sf1 measurements proved nothing (r15 verdict defect #2's
    # sibling; tests/test_scaling_canaries.py asserts non-vacuity now).
    def _ho(salt: str) -> F.Column:
        return F.xxhash64(F.lit(salt), F.col("id"))

    n_li = (
        F.lit(1)
        + F.pmod(_ho("ln1"), F.lit(3))
        + F.pmod(_ho("ln2"), F.lit(3))
        + F.when(
            F.pmod(_ho("ln3"), F.lit(20)) == 0, F.pmod(_ho("ln4"), F.lit(8))
        ).otherwise(F.lit(0))
    ).cast("int")
    li_base = spark.range(n_ord).select(
        F.col("id").alias("l_orderkey"),
        F.explode(F.sequence(F.lit(1), n_li)).alias("l_linenumber"),
    )

    def _hl(salt: str) -> F.Column:
        return F.xxhash64(
            F.lit(salt), F.col("l_orderkey"), F.col("l_linenumber")
        )

    lineitem = li_base.select(
        "l_orderkey",
        F.pmod(_hl("lp"), F.lit(n_part)).cast("int").alias("l_partkey"),
        F.pmod(_hl("ls"), F.lit(n_supp)).cast("int").alias("l_suppkey"),
        F.col("l_linenumber").cast("int").alias("l_linenumber"),
        (F.pmod(_hl("lq"), F.lit(50)) + 1).cast("double").alias("l_quantity"),
        _r2(
            _u("le", F.col("l_orderkey"), F.col("l_linenumber")) * 90000
            + 900
        ).alias("l_extendedprice"),
        (F.pmod(_hl("ld"), F.lit(11)).cast("double") / 100.0).alias("l_discount"),
        (F.pmod(_hl("lt"), F.lit(9)).cast("double") / 100.0).alias("l_tax"),
        _pick("lr", _hl("lrh"), ["A", "N", "R"]).alias("l_returnflag"),
        _pick("ll", _hl("llh"), ["O", "F"]).alias("l_linestatus"),
        (day0 + F.make_interval(days=F.pmod(_hl("lsd"), F.lit(2404)).cast("int"))).alias("l_shipdate"),
    )
    # events: FIXED 30-DAY span at any sf (arrival DENSITY scales, the
    # calendar keeps its shape) — matching the driver testdata, whose
    # events span 2024-01-01 → 2024-01-30 at EVERY sf. The r15 generator
    # used a ~4.6-day span, which made every day-span-sensitive query
    # (shape search with a 7-day pattern, weekly retention triangle,
    # 7-day funnel windows) VACUOUSLY empty at sf0.5/sf1 — a scaled gate
    # that proved nothing (r15 verdict defect #2). tests/
    # test_scaling_canaries.py now asserts non-vacuity per scored entry.
    span_us = 30 * 86_400 * 1_000_000
    ev0 = F.to_timestamp(F.lit("2024-01-01 00:00:00"))
    events = spark.range(n_events).select(
        F.col("id").alias("event_id"),
        (
            ev0
            + F.make_interval(
                secs=(
                    (F.col("id") * F.lit(span_us / 1_000_000.0)) / n_events
                    + _u("ej", F.col("id")) * 5.0
                )
            )
        ).alias("ts"),
        F.pmod(F.xxhash64(F.lit("eu"), "id"), F.lit(n_users)).cast("int").alias("user_id"),
        _weighted("et", F.col("id"), [("click", 30), ("view", 40), ("purchase", 10), ("signup", 5), ("error", 15)]).alias("event_type"),
        _r2(_u("ev", F.col("id")) * 490 + 0.01).alias("value"),
        F.format_string('{"k": %d}', F.pmod(F.xxhash64(F.lit("ek"), "id"), F.lit(100))).alias("props"),
    )
    vocab_arr = F.array(*[F.lit(w) for w in VOCAB])

    def words_of(idc):
        n_words = (
            F.pmod(F.xxhash64(F.lit("dw"), idc), F.lit(90)) + 8
        ).cast("int")
        return F.transform(
            F.sequence(F.lit(1), n_words),
            lambda i: F.element_at(
                vocab_arr,
                (
                    F.pmod(
                        F.xxhash64(F.lit("dt"), idc, i), F.lit(len(VOCAB))
                    )
                    + 1
                ).cast("int"),
            ),
        )

    # planted TEXT near-duplicates (same cadence as the embedding plants):
    # every PLANT_EVERY-th doc is its predecessor's text with ONE word
    # substituted at a hash-chosen position — shingle Jaccard ≥ ~0.85 for
    # the ≥30-word docs, which is what the near-dup family (minhash/LSH,
    # ngram-jaccard, simhash, containment) detects. Without them the
    # random-vocab corpus has NO high-overlap pairs above sf0.1, so the
    # scaled rows for those entries collapsed to 0 — a measurement that
    # proved nothing (r15 verdict defect #2's sibling). Ground truth is
    # recoverable from ids alone: (b, b+1) for b % PLANT_EVERY == 0.
    did = F.col("id")
    is_text_clone = (F.pmod(did, F.lit(PLANT_EVERY)) == 1) & (did >= 1)
    base_words = words_of(did - 1)
    swap_pos = F.pmod(F.xxhash64(F.lit("dswp"), did), F.size(base_words))
    clone_words = F.transform(
        base_words,
        lambda w, i: F.when(
            i == swap_pos,
            F.element_at(
                vocab_arr,
                (
                    F.pmod(F.xxhash64(F.lit("dswv"), did), F.lit(len(VOCAB)))
                    + 1
                ).cast("int"),
            ),
        ).otherwise(w),
    )
    words = F.when(is_text_clone, clone_words).otherwise(words_of(did))
    documents = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.array_join(words, " ").alias("text"),
        _weighted("dl", F.col("id"), LANGS).alias("lang"),
        F.concat(F.lit("src"), F.pmod(F.xxhash64(F.lit("dsrc"), "id"), F.lit(20)).cast("string")).alias("source"),
    ).withColumn("n_chars", F.length("text").cast("int"))
    # embeddings: label-structured so IVF/k-means/LSH have real cluster
    # geometry (label-dependent low-frequency component + hash noise),
    # plus PLANTED near-duplicate pairs at controlled cosines so recall
    # at the ≥0.95 design point is MEASURED, not model-extrapolated
    # (round-10 RECALL_RP.json had truth_pairs=0 at cos ≥ 0.95 — the
    # natural corpus has no sub-identical pairs that similar)
    label = F.pmod(F.xxhash64(F.lit("el"), "id"), F.lit(10)).cast("int")
    embeddings = planted_embeddings(spark, n_docs, extra_cols={"label": label})
    return {
        "region": region,
        "nation": nation,
        "customer": customer,
        "supplier": supplier,
        "part": part,
        "orders": orders,
        "lineitem": lineitem,
        "events": events,
        "documents": documents,
        "embeddings": embeddings,
    }


def main() -> None:
    out_root, sfs = sys.argv[1], [float(s) for s in sys.argv[2:]]
    spark = get_spark("gen-testdata", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    for sf in sfs:
        sf_name = f"sf{sf:g}"
        out = os.path.join(out_root, sf_name)
        for name, df in gen_tables(spark, sf).items():
            df.write.mode("overwrite").parquet(os.path.join(out, f"{name}.parquet"))
            print(f"{sf_name}/{name}: written", flush=True)
    print("done")


if __name__ == "__main__":
    main()
