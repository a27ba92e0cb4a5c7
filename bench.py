"""Benchmark runner (driver contract).

Runs the headline queries from ``__spark_entry__.queries()`` at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:
``{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}``.

Each query is forced with .count() (full plan executes; no driver-side
result transfer skew). A warmup query absorbs JVM/codegen startup so the
numbers measure the plans, not the JIT.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry  # noqa: E402
from client_data_ingester_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "q1_pricing_summary",
    "q3_top_unshipped",
    "q4_order_priority",
    "q5_regional_revenue",
    "topk_parts_per_brand",
    "orders_window_funcs",
    "balance_quantiles",
    "parts_above_brand_avg",
    "date_string_funcs",
    "products_search_rank",
    "upsert_snapshot",
    "full_update_deactivation",
    "dedup_exact",
    "dedup_lsh_candidates",
    "dedup_simhash",
    "text_quality",
    "text_langid",
    "doc_fingerprints",
    "embedding_cosine_topk",
    "embedding_near_duplicates",
    "events_window_agg",
    "events_sessionize",
    "asof_join_last_event",
    "range_join_follows",
    "multimodal_features",
    "text_repetition",
    "corpus_boilerplate",
    "corpus_contamination",
    "tfidf_top_terms",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    spark = get_spark("bench", cpus=cpus)
    qs = entry.queries()

    # warmup: JVM + codegen + parquet footer caches
    qs["q1_pricing_summary"](spark, sf_dir).count()

    per_query: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        fn = qs[name]
        t0 = time.time()
        try:
            fn(spark, sf_dir).count()
        except Exception as e:  # a broken query must not lose the whole run
            print(f"bench: {name} failed: {e}", file=sys.stderr)
            per_query[name] = -1.0
            continue
        dt = round(time.time() - t0, 3)
        per_query[name] = dt
        total += dt
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": round(total, 3),
                "unit": "sec",
                "queries": per_query,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
