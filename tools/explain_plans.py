"""Plan-quality inspection (SURVEY §4 / the 100 TB design bar).

Prints the formatted physical plan for selected queries and greps for the
properties we require:
- parquet scans carry PushedFilters + pruned ReadSchema,
- dimension joins are BroadcastHashJoin,
- global top-k rides TakeOrderedAndProject,
- no CartesianProduct outside the intentional broadcast cross joins.

Usage: python tools/explain_plans.py [sf_dir] [query ...]
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402
from client_data_ingester_spark.session import get_spark  # noqa: E402

DEFAULT = [
    "q1_pricing_summary",
    "q3_top_unshipped",
    "q5_regional_revenue",
    "q17_small_quantity_revenue",
    "q19_disjunctive_revenue",
    "topk_parts_per_brand",
    "products_search_rank",
    "upsert_snapshot",
    "dedup_lsh_candidates",
    "dedup_chunk_spans",
    "semantic_dedup_pairs",
    "embedding_cosine_topk",
    "asof_join_last_event",
    "range_join_follows",
    "profile_lineitem_approx",
    "events_zone_map_scan",
    "skew_salted_join_revenue",
    "pipeline_curate_and_pack",
    "similarity_pq_topk",
    "similarity_ivfpq_topk",
    "docs_nb_langid",
    "docs_gopher_rules",
    "docs_quality_curriculum",
    "corpus_shard_manifest",
    "multimodal_avi_frames",
    "dq_referential_integrity",
    "dq_lineitem_domains",
    "corpus_split_drift",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or DEFAULT
    spark = get_spark("explain", cpus=8)
    qs = entry.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        print(f"{'=' * 20} {name} {'=' * 20}")
        print(plan)
        # per-scan count, not all-or-nothing: nearly every multi-join plan
        # has at least one legitimately filterless dimension scan, which
        # would make a boolean flag read False even when the predicate the
        # tool exists to verify IS pushed
        pushed = plan.count("PushedFilters: [") - plan.count(
            "PushedFilters: []"
        )
        scans = plan.count("PushedFilters: [")
        checks = {
            "PushedFilters": f"{pushed}/{scans} scans",
            "BroadcastHashJoin": "BroadcastHashJoin" in plan,
            "TakeOrdered": "TakeOrderedAndProject" in plan,
            "WholeStageCodegen": "codegen id" in plan,
            "CartesianProduct!": "CartesianProduct" in plan,
            "BroadcastNestedLoop": "BroadcastNestedLoopJoin" in plan,
        }
        print(f"--- summary {name}: "
              + ", ".join(f"{k}={v}" for k, v in checks.items()))
        print()


if __name__ == "__main__":
    main()
