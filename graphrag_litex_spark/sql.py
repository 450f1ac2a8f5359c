"""SQL surface: register the graph's stage tables as temp views.

The reference exposes its graph as Python dicts/dataclasses; the Spark-native
equivalent is tables you can `spark.sql` over (SURVEY.md §1: "a set of
DataFrames/Iceberg tables, not an object; graph ops are joins").

    from graphrag_litex_spark.sql import register_graph_views
    register_graph_views(spark, kg_dir_or_results, prefix="kg_")
    spark.sql("SELECT subj, pred, obj FROM kg_triples WHERE strength > 0.8")
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def register_graph_views(
    spark: SparkSession,
    graph: str | dict[str, DataFrame],
    prefix: str = "kg_",
) -> list[str]:
    """Register every stage table as ``{prefix}{name}``; returns the names.

    ``graph`` is either the dict returned by ``run_pipeline`` or an output
    directory (reopened via sources.tables.open_graph).
    """
    if isinstance(graph, str):
        from graphrag_litex_spark.sources.tables import open_graph

        graph = open_graph(spark, graph)
    names = []
    for name, df in graph.items():
        view = f"{prefix}{name}"
        df.createOrReplaceTempView(view)
        names.append(view)
    return names
