"""Graph integrity audit: the invariants a KG build must satisfy.

The reference validates edge endpoints at insert time
(indexing/simple_graph_builder.py:96-97 drops relationships whose endpoints
were never extracted); a distributed pipeline enforces the same invariants
by construction (inner joins through the canon map) — which means a bug
shows up not as an exception but as silently wrong data. This operator is
the post-build audit a pipeline owner schedules after every build: each
invariant is counted, and every count is expected to be zero (or reported
as a size metric).

Checks (one row each, ``(check: string, value: bigint)``):

- ``nodes_total`` / ``edges_total``            — build size metrics
- ``dangling_endpoints``  — edge src/dst with no node row (must be 0)
- ``orphan_nodes``        — nodes that appear in no edge (size metric;
                            legitimate — single-mention entities)
- ``self_loops``          — edges with src == dst (size metric)
- ``duplicate_edge_keys`` — (src, dst) groups with >1 merged edge (must be 0:
                            merge is keyed on the pair)
- ``canon_targets_missing``   — canon_map.canonical with no node (must be 0)
- ``canon_non_idempotent``    — canonical names whose own normalization maps
                                to a DIFFERENT canonical (must be 0: the
                                canon map must be a projection, norm∘canon ∘
                                norm = norm∘canon)

Scale: every check is one aggregate over an already-partitioned stage
table; the endpoint/orphan checks share a single distinct-endpoints scan,
and all joins are on the warehouse bucket keys (left_anti compiles to a
broadcast or Exchange-free SortMergeJoin). Output is O(#checks) rows —
union of scalar aggregates, trivially collectable into a dashboard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .normalize_ops import norm_name_col


def _scalar(df: DataFrame, check: str) -> DataFrame:
    return df.select(F.lit(check).alias("check"), F.col("value").cast("long"))


def graph_integrity_report(
    nodes: DataFrame,
    edges: DataFrame,
    canon_map: DataFrame,
    node_key: str = "canonical_name",
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Audit a built KG; see module docstring for the check catalogue.

    ``nodes`` needs ``node_key``; ``edges`` needs ``src_col``/``dst_col``
    (canonical names, same domain as ``node_key``); ``canon_map`` needs
    ``(norm_name, canonical)``.
    """
    names = nodes.select(F.col(node_key).alias("name"))
    # One distinct-endpoint scan feeds both the dangling and orphan checks.
    endpoints = (
        edges.select(F.col(src_col).alias("name"))
        .unionAll(edges.select(F.col(dst_col).alias("name")))
        .distinct()
    )

    checks = [
        _scalar(nodes.agg(F.count(F.lit(1)).alias("value")), "nodes_total"),
        _scalar(edges.agg(F.count(F.lit(1)).alias("value")), "edges_total"),
        _scalar(
            endpoints.join(names, "name", "left_anti").agg(
                F.count(F.lit(1)).alias("value")
            ),
            "dangling_endpoints",
        ),
        _scalar(
            names.join(endpoints, "name", "left_anti").agg(
                F.count(F.lit(1)).alias("value")
            ),
            "orphan_nodes",
        ),
        _scalar(
            edges.where(F.col(src_col) == F.col(dst_col)).agg(
                F.count(F.lit(1)).alias("value")
            ),
            "self_loops",
        ),
        _scalar(
            edges.groupBy(src_col, dst_col)
            .agg(F.count(F.lit(1)).alias("n"))
            .where(F.col("n") > 1)
            .agg(F.count(F.lit(1)).alias("value")),
            "duplicate_edge_keys",
        ),
        _scalar(
            canon_map.select(F.col("canonical").alias("name"))
            .distinct()
            .join(names, "name", "left_anti")
            .agg(F.count(F.lit(1)).alias("value")),
            "canon_targets_missing",
        ),
        _scalar(
            # norm(canonical) must map back to the same canonical: join the
            # distinct canonical set against the map on the normalized name
            # and count disagreements. Inner join: a canonical whose norm is
            # absent from the map entirely is caught above, not here.
            canon_map.select("canonical")
            .distinct()
            .withColumn("norm_name", norm_name_col("canonical"))
            .join(
                canon_map.select(
                    "norm_name", F.col("canonical").alias("mapped")
                ),
                "norm_name",
            )
            .where(F.col("mapped") != F.col("canonical"))
            .agg(F.count(F.lit(1)).alias("value")),
            "canon_non_idempotent",
        ),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out
