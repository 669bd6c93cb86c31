"""Regenerate docs/PLANS.md: formatted physical plans of the
flagship queries (scan pushdown / broadcast / partial-agg evidence).

Usage: python tools/capture_plans.py [sf_dir]
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FLAGSHIPS = [
    "pricing_summary",
    "clean_products",
    "monthly_price_rollup",
    "star_join",
    "scd2_two_day",
    "minhash_lsh_pairs",
    "embedding_topk",
    "tpch_q8_market_share",
    "tpch_q17_small_quantity",
    "event_type_pivot",
    "hll_distinct_users",
    "merge_cdc_customers",
    "zorder_tiles",
    "dpp_partitioned_join",
    "quantile_sketch_prices",
    "cms_join_size",
    "semantic_dedup",
    "repetition_rules",
    "chunk_documents",
    "entity_resolution",
    "bitmap_distinct_users",
    "equi_depth_histogram",
    "table_checksum",
    "mad_outliers",
    "bloom_join_prefilter",
    "hll_set_ops",
    "dau_wau_mau",
    "table_diff",
    "winsorized_mean",
    "market_basket",
    "chunk_dedup_ratio",
    "incremental_join_view",
    "session_window_agg",
    "rfm_segmentation",
    "cohort_ltv",
    "hashed_features",
    "tpch_q2_min_cost_supplier",
    "tpch_q21_suppliers_kept_waiting",
    "prefix_filter_jaccard_join",
    "part_triangle_enumeration",
    "link_prediction_common_neighbors",
    "equi_depth_histogram_sketch",
    "forward_fill_series",
    "jpeg_image_features",
    # round 13: maintenance planning + native lakehouse reads —
    # the plans must show partitioned windows (no global sort),
    # JVM-only bit arithmetic, and pushdown below the log replay
    "optimize_compaction_plan",
    "zorder_clustering",
    "delta_native_roundtrip",
    "mp3_stream_scan",
    "h264_stream_scan",
    "l_diversity_report",
    # round-11: the queries rewritten off partition-less windows —
    # four global top-k (TakeOrderedAndProject) plus the prefix-max
    # (pareto_frontier) and histogram-percentile (conversion_latency)
    # conversions to the __pid two-stage idiom (round-10 verdict
    # item 1 and its round-11 extension)
    "pq_adc_topk",
    "ivf_pq_topk",
    "vocabulary_topk",
    "bm25_ranked_search",
    "pareto_frontier",
    "conversion_latency",
]

HEADER = """# Captured physical plans (sf0.001)

Evidence that the engine's plans carry the scale properties claimed
in README.md: parquet pushdown + pruned ReadSchema, broadcast dims,
map-side partial aggregation, hash-shuffles on compact keys.
Regenerate with `python tools/capture_plans.py`.
"""


def main() -> None:
    from datawarehouseproject_spark.session import get_spark
    from datawarehouseproject_spark.plans.registry import queries

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("plans")
    spark.sparkContext.setLogLevel("ERROR")
    fns = queries()
    out = [HEADER]
    for name in FLAGSHIPS:
        df = fns[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        keep = []
        for line in buf.getvalue().splitlines():
            s = line.strip()
            if s.startswith(("*", "+", "-")) or "PushedFilters" in s or "ReadSchema" in s:
                keep.append(line[:140])
            if len(keep) > 60:
                break
        out.append(f"## {name}\n\n```\n" + "\n".join(keep) + "\n```\n")
    os.makedirs("docs", exist_ok=True)
    with open("docs/PLANS.md", "w") as f:
        f.write("\n".join(out))
    print("docs/PLANS.md written")


if __name__ == "__main__":
    main()
