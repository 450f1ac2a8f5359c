"""Schema (ontology) induction over the built KG.

The reference pipeline extracts a free-form ``type`` per entity mention
(reference ``extraction/entity_extractor.py`` item schema) but never rolls
the types up; at corpus scale the induced type system IS the graph's schema:
which (subject_type, predicate, object_type) signatures exist, how often,
and with what entity spread. A pipeline owner reads this table to spot
extractor drift (a new predicate appearing between implausible types) and a
consumer reads it as the de-facto ontology before writing queries.

Execution shape: the node-type map is entity-cardinality (same class as the
canon map — broadcast when small, AQE shuffle join when not); the triple set
is grouped to distinct (subj, pred, obj) first so multi-observation edges
count once; the final aggregate's key space is bounded by
|types|^2 x |predicates| — tiny at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def predicate_signatures(
    triples: DataFrame,
    node_types: DataFrame,
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
    name_col: str = "name",
    type_col: str = "type",
) -> DataFrame:
    """-> (subj_type, pred, obj_type, n_triples, n_subjects, n_objects).

    ``node_types`` maps entity name -> published type (the nodes table's
    own ``type`` column — min mention type per canonical, merge.py E1).
    Triples whose endpoint is missing from the map are dropped (the
    pipeline guarantees none are, integrity check ``dangling_endpoints``).
    """
    t = (
        triples.select(
            F.col(subj_col).alias("subj"),
            F.col(pred_col).alias("pred"),
            F.col(obj_col).alias("obj"),
        )
        .distinct()
    )
    ty = node_types.select(
        F.col(name_col).alias("__name"), F.col(type_col).alias("__type")
    )
    st = ty.select(
        F.col("__name").alias("subj"), F.col("__type").alias("subj_type")
    )
    ot = ty.select(
        F.col("__name").alias("obj"), F.col("__type").alias("obj_type")
    )
    return (
        t.join(st, "subj")
        .join(ot, "obj")
        .groupBy("subj_type", "pred", "obj_type")
        .agg(
            F.count(F.lit(1)).alias("n_triples"),
            F.countDistinct("subj").alias("n_subjects"),
            F.countDistinct("obj").alias("n_objects"),
        )
    )


def type_cooccurrence(
    triples: DataFrame,
    node_types: DataFrame,
    subj_col: str = "subj",
    obj_col: str = "obj",
    name_col: str = "name",
    type_col: str = "type",
) -> DataFrame:
    """-> (type_a, type_b, n_edges): undirected type-pair edge counts
    (type_a <= type_b), the coarse "which kinds of things relate at all"
    view of :func:`predicate_signatures` — the first chart on a KG
    dashboard. Same join/agg shape, predicate collapsed."""
    sig = predicate_signatures(
        triples,
        node_types,
        subj_col=subj_col,
        obj_col=obj_col,
        name_col=name_col,
        type_col=type_col,
    )
    return (
        sig.select(
            F.least("subj_type", "obj_type").alias("type_a"),
            F.greatest("subj_type", "obj_type").alias("type_b"),
            "n_triples",
        )
        .groupBy("type_a", "type_b")
        .agg(F.sum("n_triples").alias("n_edges"))
    )
