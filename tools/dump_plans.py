"""Dump `explain("formatted")` for declared queries into a directory.

Usage: python tools/dump_plans.py OUTDIR SUFFIX [query ...]

Writes OUTDIR/<query>_<SUFFIX>.txt for each named query (default: the
bench.py sweep list). Used to produce the plans/r06/*_before.txt /
*_after.txt evidence files.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BENCH_QUERIES = [
    "kg_triples_agg", "kg_top_entities_by_degree", "kg_reassembly",
    "agg_pricing_summary", "join_customer_orders", "window_events",
    "similarity_topk", "dedup_minhash_lsh", "text_quality",
    "asof_purchase_click", "event_sessions", "pack_bins", "decontamination",
    "kg_entity_rank", "kg_triangle_stats", "kg_link_prediction",
    "tfidf_similar_docs", "semantic_dedup", "quality_classifier",
    "interval_join_clicks", "ann_pq_topk", "kg_closeness", "sample_mixture",
    "dup_span_removal", "kg_two_hop", "image_dup_pairs", "conv_stats",
    "conv_prefix_dups", "kg_degree_histogram", "kg_walk_cooccurrence",
    "kg_ontology", "kg_integrity_report", "kg_bfs_distances", "kg_ktruss",
    "kg_node2vec_walks", "kg_component_sizes", "kg_neighborhood_function",
    "ngram_repetition", "sft_render", "sft_packed_spans", "embedding_sq8",
    "zorder_events",
]


def main() -> None:
    outdir = sys.argv[1]
    suffix = sys.argv[2]
    names = sys.argv[3:] or BENCH_QUERIES
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(outdir, exist_ok=True)

    import __spark_entry__ as E
    from graphrag_litex_spark.session import get_spark

    spark = get_spark(app_name="dump_plans", extra_conf={"spark.ui.showConsoleProgress": "false"})
    qs = E.queries()
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as ex:  # noqa: BLE001
            text = f"EXPLAIN FAILED: {ex}\n"
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(text)
        print(f"wrote {name}_{suffix}.txt ({len(text)} bytes)")


if __name__ == "__main__":
    main()
