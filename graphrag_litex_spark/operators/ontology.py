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


def filter_by_signature_support(
    triples: DataFrame,
    node_types: DataFrame,
    min_support: int = 2,
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
    name_col: str = "name",
    type_col: str = "type",
) -> DataFrame:
    """Schema-based noise gate: keep triples whose induced
    (subj_type, pred, obj_type) signature is attested by at least
    ``min_support`` DISTINCT triples corpus-wide — the standard open-IE
    cleanup that drops one-off extractor hallucinations (a predicate
    appearing once between implausible types) while keeping everything the
    corpus repeatedly asserts. Returns the kept triples with their
    signature columns attached (subj_type, obj_type, sig_support).

    Execution: :func:`predicate_signatures` (two entity-cardinality AQE
    joins + a types²x-preds-bounded agg) then ONE broadcast-sized join
    back — the signature table is tiny at any corpus size, so the gate
    costs a map-side hash join over the triples, no extra shuffle of the
    corpus.
    """
    sig = predicate_signatures(
        triples,
        node_types,
        subj_col=subj_col,
        pred_col=pred_col,
        obj_col=obj_col,
        name_col=name_col,
        type_col=type_col,
    ).select(
        "subj_type",
        F.col("pred").alias("__pred"),
        "obj_type",
        F.col("n_triples").alias("sig_support"),
    )
    ty = node_types.select(
        F.col(name_col).alias("__name"), F.col(type_col).alias("__type")
    )
    st = ty.select(F.col("__name").alias(subj_col), F.col("__type").alias("subj_type"))
    ot = ty.select(F.col("__name").alias(obj_col), F.col("__type").alias("obj_type"))
    typed = triples.join(st, subj_col).join(ot, obj_col)
    kept = typed.join(
        F.broadcast(sig.where(F.col("sig_support") >= min_support)),
        (F.col(pred_col) == F.col("__pred"))
        & (typed["subj_type"] == sig["subj_type"])
        & (typed["obj_type"] == sig["obj_type"]),
    )
    return kept.select(
        *[typed[c] for c in triples.columns],
        typed["subj_type"],
        typed["obj_type"],
        F.col("sig_support"),
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


def metapath_counts(
    triples: DataFrame,
    node_types: DataFrame,
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
    name_col: str = "name",
    type_col: str = "type",
    max_mid_degree: int | None = None,
) -> DataFrame:
    """Two-hop METAPATH rollup: how often each typed path shape
    (subj_type)-[pred1]->(mid_type)-[pred2]->(obj_type) occurs in the graph
    — the heterogeneous-network schema statistic (metapath2vec / PathSim
    lineage) a KG consumer reads before choosing guided walks or join
    templates.

    -> (subj_type, pred1, mid_type, pred2, obj_type, n_paths) over DISTINCT
    (subj, pred, obj) triples (schema-level, not sighting-level);
    back-and-forth pairs (subj == obj) are excluded, matching kg_two_hop.

    Scale: path instances are enumerated at the MID vertex (one self-join
    of the distinct triple set on the hop key), so a hub mid costs
    in-degree x out-degree rows — ``max_mid_degree`` drops mids whose
    in- or out-degree exceeds the cap before the join (same valve
    rationale as link_prediction's wedge centers: hub metapaths are
    degenerate signal). The three type joins are entity-cardinality (AQE
    broadcasts); the final agg keyspace is bounded by |types|^3 x |preds|^2.
    """
    t = (
        triples.select(
            F.col(subj_col).alias("subj"),
            F.col(pred_col).alias("pred"),
            F.col(obj_col).alias("obj"),
        )
        .distinct()
    )
    if max_mid_degree is not None:
        out_deg = t.groupBy(F.col("subj").alias("mid")).agg(
            F.count(F.lit(1)).alias("n_out")
        )
        in_deg = t.groupBy(F.col("obj").alias("mid")).agg(
            F.count(F.lit(1)).alias("n_in")
        )
        ok = (
            out_deg.join(in_deg, "mid")
            .where(
                (F.col("n_out") <= max_mid_degree)
                & (F.col("n_in") <= max_mid_degree)
            )
            .select("mid")
        )
    else:
        ok = None
    a = t.select(
        F.col("subj"), F.col("pred").alias("pred1"), F.col("obj").alias("mid")
    )
    b = t.select(
        F.col("subj").alias("mid"), F.col("pred").alias("pred2"), F.col("obj")
    )
    if ok is not None:
        a = a.join(ok, "mid", "left_semi")
        b = b.join(ok, "mid", "left_semi")
    paths = a.join(b, "mid").where(F.col("subj") != F.col("obj"))
    ty = node_types.select(
        F.col(name_col).alias("__name"), F.col(type_col).alias("__type")
    )
    return (
        paths.join(
            ty.select(F.col("__name").alias("subj"), F.col("__type").alias("subj_type")),
            "subj",
        )
        .join(
            ty.select(F.col("__name").alias("mid"), F.col("__type").alias("mid_type")),
            "mid",
        )
        .join(
            ty.select(F.col("__name").alias("obj"), F.col("__type").alias("obj_type")),
            "obj",
        )
        .groupBy("subj_type", "pred1", "mid_type", "pred2", "obj_type")
        .agg(F.count(F.lit(1)).alias("n_paths"))
    )
