"""spark-submit entry point: publish a built graph as bucketed warehouse tables.

Usage:
    spark-submit --py-files dist/graphrag_litex_spark.zip jobs/publish_warehouse.py \
        --graph /data/kg --prefix kg --buckets 4096 [--location /data/warehouse]

Reads the stage tables a build run wrote (jobs/build_graph.py) and saves the
id-keyed collections as bucketed catalog tables (sinks/warehouse.py) so
post-build joins — nodes x edges/triples, the D1/D2 shape — run shuffle-free.
``--buckets`` is warehouse-wide (co-location requires agreement); size it to
cluster parallelism.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description="Publish a KG as bucketed warehouse tables")
    p.add_argument("--graph", required=True, help="stage-table directory from build_graph")
    p.add_argument("--prefix", default="kg", help="table identifier prefix")
    p.add_argument("--buckets", type=int, default=64)
    p.add_argument("--location", default=None, help="external-table root (optional)")
    p.add_argument(
        "--analyze",
        action="store_true",
        help="also ANALYZE the published tables (CBO row/size + join-key column stats)",
    )
    p.add_argument(
        "--verify",
        action="store_true",
        help="after publishing, attest each catalog table's content checksum "
        "against its source stage; exit nonzero on any mismatch",
    )
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    if spark is None:
        try:
            spark = SparkSession.builder.appName("kgx_publish_warehouse").getOrCreate()
        except Exception:
            from graphrag_litex_spark.session import get_spark

            spark = get_spark("kgx_publish_warehouse")

    from graphrag_litex_spark.sinks.warehouse import save_graph_tables
    from graphrag_litex_spark.sources.tables import open_graph

    graph = open_graph(spark, args.graph)
    written = save_graph_tables(
        graph,
        prefix=args.prefix,
        buckets=args.buckets,
        location=args.location,
        analyze=args.analyze,
    )
    for name, ident in sorted(written.items()):
        print(f"table {ident}: published ({name})")
    if args.verify:
        import json

        from graphrag_litex_spark.sinks.warehouse import verify_publish

        rep = verify_publish(spark, graph, written)
        print(json.dumps({"verify": rep}))
        if not rep:
            # all() over an empty report would pass vacuously — attesting
            # nothing is a failure, not a success
            print("publish verification FAILED: no tables to verify", file=sys.stderr)
            return 1
        if not all(v["identical"] for v in rep.values()):
            print("publish verification FAILED", file=sys.stderr)
            return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
