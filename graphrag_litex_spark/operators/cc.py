"""E3: connected components as an iterative hash-join min-label propagation.

Canonicalization must be order-independent (the reference's greedy resolver
is not — /root/reference/extraction/entity_resolver.py:39-54, SURVEY.md Q5):
the transitive closure of the similarity relation is exactly connected
components. No GraphX/GraphFrames: a pure DataFrame loop —

    label(v) := min(label(v), min over neighbors u of label(u))

iterated to fixpoint over the symmetrized edge list. Each round is one
shuffle (join) + one partial/final hash aggregation; lineage is truncated
per round with localCheckpoint so plans stay O(1) deep; convergence is
detected by counting changed labels (an AQE-coalesced count, not a
collect of data). Diameter of linking components is tiny (name-variant
clusters), so rounds ≈ 2-3; the loop is still correct for arbitrary graphs
and bounded by max_iter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphrag_litex_spark.operators.iterutils import (
    hard_checkpoint,
    loop_shuffle_partitions,
    release,
)


def _cc_driver_local(
    vertices: DataFrame, edges: DataFrame, id_col: str, src_col: str, dst_col: str
) -> DataFrame:
    """Small-graph physical strategy: collect, union-find, broadcast back.

    Same adaptive stance as Catalyst's broadcast-vs-shuffle join choice: the
    label graph is ALREADY reduced (distinct names, not mentions), so when it
    fits on the driver a union-find beats dozens of tiny shuffle jobs by ~3x
    wall. Produces byte-identical output to the distributed loop (label =
    component minimum) — asserted in tests/test_cc.py.
    """
    ids = [r[0] for r in vertices.select(id_col).collect()]
    pairs = [(r[0], r[1]) for r in edges.select(src_col, dst_col).collect()]
    parent: dict = {v: v for v in ids}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for a, b in pairs:
        if a not in parent:
            parent[a] = a
        if b not in parent:
            parent[b] = b
        ra, rb = find(a), find(b)
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    comp: dict = {}
    for v in ids:
        comp.setdefault(find(v), []).append(v)
    rows = [(v, min(members)) for members in comp.values() for v in members]
    spark = vertices.sparkSession
    return spark.createDataFrame(rows, schema=f"{id_col} string, label string")


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    id_col: str = "norm_name",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 25,
    driver_threshold: int = 100_000,
) -> DataFrame:
    """-> (id_col, label) where label = component minimum of ``id_col``.

    ``vertices``: one column ``id_col`` (distinct ids).
    ``edges``: (src_col, dst_col) pairs; symmetrized internally.

    Adaptive: state (vertices + similarity edges) below ``driver_threshold``
    rows runs the driver-local union-find (identical output); larger graphs
    run the distributed min-label loop. At 10^12 turns the distinct-name
    graph is the one that matters and the loop is the path taken.
    """
    sym = hard_checkpoint(
        edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
        .union(edges.select(F.col(dst_col).alias("u"), F.col(src_col).alias("v")))
        .distinct()
    )
    labels = hard_checkpoint(
        vertices.select(F.col(id_col).alias("u"), F.col(id_col).alias("label"))
    )
    n_state = labels.count() + sym.count()
    if n_state <= driver_threshold:
        out = _cc_driver_local(labels.select("u"), sym, "u", "u", "v").withColumnRenamed(
            "u", id_col
        )
        release(sym)
        release(labels)
        return out
    # with-block + finally: a mid-loop Spark exception must not leave the
    # session's shuffle-partition count overridden or leak checkpoint RDDs.
    try:
        with loop_shuffle_partitions(vertices.sparkSession, n_state):
            for _ in range(max_iter):
                # Neighbor label messages: for edge (u,v), v receives u's label.
                msgs = sym.join(labels, "u").select(F.col("v").alias("u"), "label")
                new_labels = hard_checkpoint(
                    labels.unionByName(msgs).groupBy("u").agg(F.min("label").alias("label"))
                )
                changed = (
                    new_labels.alias("n")
                    .join(labels.alias("o"), "u")
                    .where(F.col("n.label") != F.col("o.label"))
                    .limit(1)
                    .count()
                )
                # Release the superseded checkpoint immediately — waiting for
                # Python GC + ContextCleaner lets cached RDDs pile up.
                release(labels)
                labels = new_labels
                if changed == 0:
                    break
    finally:
        release(sym)
    return labels.select(F.col("u").alias(id_col), "label")
