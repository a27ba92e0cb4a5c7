"""Data-quality audits ([EXT]): the dbt-style tests a lake runs at scale.

Two families:
- arithmetic integrity: recompute a derived column from its source rows
  in EXACT decimal and classify agreement (the TPC-H
  ``o_totalprice == SUM(extprice * (1-disc) * (1+tax))`` identity);
- referential integrity: orphan counts per FK relation via left-anti
  joins (no row multiplication; shuffle on the key only).

Both emit AUDIT REPORTS, not assertions — a 100 TB lake wants the
mismatch counts on a dashboard, not a job failure on the first bad row.
All arithmetic is exact DECIMAL (never float), so match/mismatch
classification is engine-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PRICE = "decimal(12,2)"
_RATE = "decimal(4,2)"


def orders_totalprice_audit(
    orders: DataFrame, lineitem: DataFrame
) -> DataFrame:
    """Per order status: does the stored ``o_totalprice`` equal the
    exact-decimal recomputation ``SUM(l_extendedprice * (1 - l_discount)
    * (1 + l_tax))`` over the order's lineitems? Orders with no
    lineitems are classified separately (``n_childless``) — NULL never
    silently counts as a match or mismatch.

    Shape: one partial-aggregated shuffle on ``l_orderkey`` folds the
    fact side to per-order sums BEFORE the join (the fact table never
    joins raw), then one equi-join and a status-sized aggregate.
    Arithmetic rides the int64 units fast path (see
    relational._units): every money column is a clean 2-decimal double,
    so the recomputation is cents x (100-disc_cents) x (100+tax_cents)
    — an exact e6-scaled integer per row (≤ 10^11, far inside int64) —
    and the equality test scales the stored cents by 10^4 to meet it.
    Value-identical to the (12,2) x (4,2) decimal products this
    replaces, without their per-row double→decimal casts."""
    _u = lambda c: F.floor(  # noqa: E731
        F.col(c).cast("double") * 100 + F.lit(0.5)
    ).cast("long")
    recomputed = lineitem.groupBy("l_orderkey").agg(
        F.sum(
            (
                _u("l_extendedprice")
                * (F.lit(100) - _u("l_discount"))
                * (F.lit(100) + _u("l_tax"))
            ).cast("decimal(28,0)")
        ).alias("_s"),
        # the child count disambiguates the two NULL-sum cases: a left-
        # join miss (no lineitems -> childless) vs lineitems whose money
        # columns are all NULL (SUM over NULLs is NULL -> that's dirty
        # data, a mismatch — exactly what the audit exists to surface)
        F.count(F.lit(1)).alias("_n_li"),
    )
    joined = orders.select(
        "o_orderkey",
        "o_orderstatus",
        (_u("o_totalprice") * F.lit(10000)).cast("decimal(28,0)").alias(
            "_stored"
        ),
    ).join(recomputed, F.col("o_orderkey") == F.col("l_orderkey"), "left")
    cls = (
        F.when(F.col("_n_li").isNull(), F.lit("childless"))
        .when(F.col("_s").isNull(), F.lit("mismatch"))
        .when(F.col("_stored") == F.col("_s"), F.lit("match"))
        .otherwise(F.lit("mismatch"))
    )
    return (
        joined.select("o_orderstatus", cls.alias("_c"))
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.when(F.col("_c") == "match", 1).otherwise(0))
            .cast("long").alias("n_match"),
            F.sum(F.when(F.col("_c") == "mismatch", 1).otherwise(0))
            .cast("long").alias("n_mismatch"),
            F.sum(F.when(F.col("_c") == "childless", 1).otherwise(0))
            .cast("long").alias("n_childless"),
        )
    )


# (relation label, child table, child FK col, parent table, parent PK col)
FK_RELATIONS = [
    ("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("customer->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation->region", "nation", "n_regionkey", "region", "r_regionkey"),
]


def referential_integrity_audit(
    tables: "dict[str, DataFrame]",
) -> DataFrame:
    """Orphan counts for every declared FK relation: one row per
    relation with the child row count and how many child rows reference
    a missing parent. NULL FKs count as orphans: a fact row that cannot
    be attributed is exactly what the audit exists to surface.

    Scale shape: ONE scan per child table — all of a child's FK
    relations ride the same pass as chained left joins (lineitem's three
    FKs = one lineitem scan, not three), then a single aggregate counts
    rows once and null-parent hits per relation, exploded back into
    per-relation report rows. Joins stay key-only projections so every
    shuffle carries two columns; small parents broadcast via AQE.
    Parents are assumed PK-unique (definitional for a primary key — a
    duplicate parent would multiply child rows and distort every count;
    auditing PK uniqueness itself is a one-line groupBy/HAVING check)."""
    by_child: "dict[str, list]" = {}
    for label, child, fk, parent, pk in FK_RELATIONS:
        by_child.setdefault(child, []).append((label, fk, parent, pk))
    reports = []
    for child, rels in by_child.items():
        j = tables[child].select(
            *[
                F.col(fk).alias(f"_fk{i}")
                for i, (_, fk, _, _) in enumerate(rels)
            ]
        )
        for i, (_, _, parent, pk) in enumerate(rels):
            p = tables[parent].select(F.col(pk).alias(f"_pk{i}"))
            j = j.join(p, F.col(f"_fk{i}") == F.col(f"_pk{i}"), "left")
        agg = j.agg(
            F.count(F.lit(1)).alias("_n"),
            *[
                F.sum(
                    F.when(F.col(f"_pk{i}").isNull(), 1).otherwise(0)
                ).alias(f"_o{i}")
                for i in range(len(rels))
            ],
        )
        pairs = F.array(
            *[
                F.struct(
                    F.lit(label).alias("relation"),
                    F.col(f"_o{i}").cast("long").alias("n_orphans"),
                )
                for i, (label, _, _, _) in enumerate(rels)
            ]
        )
        reports.append(
            agg.select(
                F.col("_n").cast("long").alias("n_child"),
                F.explode(pairs).alias("_r"),
            ).select(
                F.col("_r.relation").alias("relation"),
                "n_child",
                F.col("_r.n_orphans").alias("n_orphans"),
            )
        )
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out


# (table, pk column) — the uniqueness contracts the FK audit relies on
PK_CONTRACTS = [
    ("orders", "o_orderkey"),
    ("part", "p_partkey"),
    ("supplier", "s_suppkey"),
    ("customer", "c_custkey"),
    ("nation", "n_nationkey"),
    ("region", "r_regionkey"),
]


def pk_uniqueness_audit(tables: "dict[str, DataFrame]") -> DataFrame:
    """Per declared PK: row count, distinct-key count, and how many keys
    are duplicated — the uniqueness contract
    :func:`referential_integrity_audit` assumes, audited instead of
    trusted. One partial-aggregated groupBy per table (the key fold),
    then a 3-number aggregate; no joins."""
    reports = []
    for table, pk in PK_CONTRACTS:
        per_key = tables[table].groupBy(F.col(pk).alias("_k")).agg(
            F.count(F.lit(1)).alias("_c")
        )
        reports.append(
            per_key.agg(
                F.lit(f"{table}.{pk}").alias("pk"),
                F.sum("_c").cast("long").alias("n_rows"),
                F.count(F.lit(1)).cast("long").alias("n_distinct"),
                F.sum(F.when(F.col("_c") > 1, 1).otherwise(0))
                .cast("long").alias("n_dup_keys"),
            )
        )
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out


# (rule name, SQL condition) — the condition strings parse identically
# in Spark SQL and DuckDB, so the operator (via F.expr) and the oracle
# audit the SAME rule set from one list
LINEITEM_DOMAIN_RULES = [
    ("quantity_positive", "l_quantity > 0"),
    ("extendedprice_positive", "l_extendedprice > 0"),
    ("discount_in_unit_range", "l_discount >= 0 AND l_discount <= 1"),
    ("tax_in_unit_range", "l_tax >= 0 AND l_tax <= 1"),
    ("shipdate_in_era", "l_shipdate >= DATE '1992-01-01'"),
    ("returnflag_in_domain", "l_returnflag IN ('A', 'N', 'R')"),
    ("linestatus_in_domain", "l_linestatus IN ('O', 'F')"),
]


def lineitem_domain_audit(lineitem: DataFrame) -> DataFrame:
    """Expectation checks over the fact table's value domains — the
    great-expectations shape: one row per rule with its violation count.
    ALL rules ride ONE scan (a single aggregate of conditional sums);
    NULLs violate every range rule (an unknowable value cannot satisfy
    a domain contract)."""
    rules = LINEITEM_DOMAIN_RULES
    agg = lineitem.agg(
        F.count(F.lit(1)).alias("_n"),
        *[
            F.sum(
                F.when(F.coalesce(F.expr(cond), F.lit(False)), 0)
                .otherwise(1)
            ).alias(f"_v{i}")
            for i, (_, cond) in enumerate(rules)
        ],
    )
    pairs = F.array(
        *[
            F.struct(
                F.lit(name).alias("rule"),
                F.col(f"_v{i}").cast("long").alias("n_violations"),
            )
            for i, (name, _) in enumerate(rules)
        ]
    )
    return agg.select(
        F.col("_n").cast("long").alias("n_rows"),
        F.explode(pairs).alias("_r"),
    ).select(
        F.col("_r.rule").alias("rule"),
        "n_rows",
        F.col("_r.n_violations").alias("n_violations"),
    )
