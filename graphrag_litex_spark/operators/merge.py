"""E1/E2/E4/E7: dedup-merge aggregations (the reference's upsert loops as
order-free hash aggregations).

Reference semantics replicated (SURVEY.md §1.3):
  * Entity merge (models/knowledge_graph.py:25-45 + models/entity.py:40-64):
    identity = case-insensitive name (here: canonical id after linking);
    longer description wins; instances/claims unioned.
  * Relationship merge (models/knowledge_graph.py:47-68 +
    models/relationship.py:35-57): identity = ordered (src, dst); longer
    description wins; strength averaged (order-free avg over the group, see
    SURVEY.md §1.3 note on the reference's pairwise running average).
  * Claim merge (models/knowledge_graph.py:70-101): identity =
    case-insensitive content; entity_ids/instances unioned.
  * Provenance union (models/entity.py:55-57 etc.): set-union of
    (source_id, chunk_id) structs = array_distinct(flatten(collect_list)).

Ties on description length are broken lexicographically (the reference is
insertion-order-dependent there; we need determinism) via a sortable
``lpad(length)||description`` key that works identically in Spark and
DuckDB (arg_max), keeping the oracle contract exact.

Skew: hot entities (a few names in >10% of turns, FIXTURES.md §1) make the
groupBy keys skewed. Spark's hash aggregate already does map-side partial
aggregation; for the reduce side the ``salted=True`` path pre-aggregates on
(key, salt) before the final per-key merge, bounding any single reducer's
input to ~1/salt_partitions of a hot key's data (SURVEY.md §4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _desc_key(col: str = "description") -> F.Column:
    return F.concat(F.lpad(F.length(col).cast("string"), 6, "0"), F.col(col))


def _salt(col: str, buckets: int) -> F.Column:
    return F.pmod(F.xxhash64(F.col(col)), F.lit(buckets))


def merge_nodes(
    mentions: DataFrame,
    salted: bool = True,
    salt_buckets: int = 16,
    max_instances: int | None = 10_000,
) -> DataFrame:
    """S7 nodes from canonicalized mentions.

    Input columns: entity_id, canonical, norm_name, name, type, description,
    source_id, chunk_id. Output: one row per canonical entity (E1).

    ``n_instances`` is always EXACT; the stored ``instances`` array is
    capped at ``max_instances`` (sorted prefix) — hot entities at corpus
    scale would otherwise carry O(corpus) provenance arrays in one row (the
    full per-mention provenance remains queryable in the mentions stage
    table). ``max_instances=None`` keeps everything (reference semantics,
    models/entity.py:55-57).
    """
    cap = lambda c: F.slice(c, 1, max_instances) if max_instances else c  # noqa: E731
    base = mentions.withColumn("instance", F.struct("source_id", "chunk_id"))
    if salted:
        partial = (
            base.withColumn("_salt", _salt("chunk_id", salt_buckets))
            .groupBy("entity_id", "canonical", "_salt")
            .agg(
                F.min(F.when(F.col("norm_name") == F.col("canonical"), F.col("name"))).alias(
                    "name"
                ),
                F.min("type").alias("type"),
                F.max_by("description", _desc_key()).alias("description"),
                F.collect_set("instance").alias("instances"),
                F.count(F.lit(1)).alias("n_mentions"),
            )
            # Cap each bucket's stored sample BEFORE the final shuffle: a
            # hot entity with millions of mentions would otherwise ship its
            # entire provenance set through the reduce even though only
            # max_instances survive the final select. n_in_bucket records
            # the true distinct count first, keeping n_instances exact
            # (buckets are globally disjoint — see the final-agg comment).
            .withColumn("n_in_bucket", F.size("instances"))
            .withColumn("instances", cap(F.col("instances")))
        )
        final = partial.groupBy("entity_id", "canonical").agg(
            # partial "name" is min over canonical-form mentions in the salt
            # bucket (NULL when absent); min() skips NULLs on the final pass.
            F.min("name").alias("name"),
            F.min("type").alias("type"),
            F.max_by("description", _desc_key()).alias("description"),
            # salt = hash(chunk_id), so a given (source_id, chunk_id) instance
            # lands in exactly one salt bucket: the partial collect_sets are
            # globally disjoint — exact distinct count by summing bucket set
            # sizes, and flatten needs NO final distinct (an array_distinct
            # over struct arrays is O(n²) and dominated the whole pipeline
            # on hot entities before this was removed). The stored sample is
            # capped WITHOUT sorting: array_sort over 100k+-element struct
            # arrays for hot keys tripled the stage cost; instances are set
            # semantics, sample order unspecified (counts stay exact).
            F.sum("n_in_bucket").alias("n_instances"),
            cap(F.flatten(F.collect_list("instances"))).alias("instances"),
            F.sum("n_mentions").alias("n_mentions"),
        )
    else:
        final = base.groupBy("entity_id", "canonical").agg(
            F.min(F.when(F.col("norm_name") == F.col("canonical"), F.col("name"))).alias("name"),
            F.min("type").alias("type"),
            F.max_by("description", _desc_key()).alias("description"),
            F.collect_set("instance").alias("instances"),
            F.count(F.lit(1)).alias("n_mentions"),
        )
        final = (
            final.withColumn("n_instances", F.size("instances"))
            .withColumn("instances", cap(F.array_sort("instances")))
        )
    return final.select(
        "entity_id",
        F.col("canonical").alias("canonical_name"),
        "name",
        "type",
        "description",
        "instances",
        F.col("n_instances").cast("long").alias("n_instances"),
        "n_mentions",
    )


def merge_edges(
    canon_edges: DataFrame,
    min_strength: float = 0.5,
    salted: bool = True,
    salt_buckets: int = 16,
    max_instances: int | None = 10_000,
) -> DataFrame:
    """S8 edges: strength filter BEFORE merge (reference applies the filter
    at insert time, indexing/simple_graph_builder.py:83-86), then pair-merge
    (E2): avg strength, longest pred, provenance union.

    Input columns: src_id, dst_id, src, dst, pred, strength, source_id,
    chunk_id.
    """
    cap = lambda c: F.slice(c, 1, max_instances) if max_instances else c  # noqa: E731
    base = canon_edges.where(F.col("strength") >= min_strength).withColumn(
        "instance", F.struct("source_id", "chunk_id")
    )
    if salted:
        partial = (
            base.withColumn("_salt", _salt("chunk_id", salt_buckets))
            .groupBy("src_id", "dst_id", "src", "dst", "_salt")
            .agg(
                F.max_by("pred", _desc_key("pred")).alias("pred"),
                F.sum("strength").alias("_s_sum"),
                F.count(F.lit(1)).alias("_s_cnt"),
                F.collect_set("instance").alias("instances"),
            )
            # Cap BEFORE the final shuffle (same as merge_nodes): a hot edge
            # would otherwise ship its full provenance set through the
            # reduce; n_in_bucket keeps n_instances exact (buckets disjoint
            # by salt = hash(chunk_id)).
            .withColumn("n_in_bucket", F.size("instances"))
            .withColumn("instances", cap(F.col("instances")))
        )
        final = partial.groupBy("src_id", "dst_id", "src", "dst").agg(
            F.max_by("pred", _desc_key("pred")).alias("pred"),
            (F.sum("_s_sum") / F.sum("_s_cnt")).alias("strength"),
            # disjoint-by-salt: exact distinct count + no final distinct or
            # sort needed (see merge_nodes).
            F.sum("n_in_bucket").alias("n_instances"),
            cap(F.flatten(F.collect_list("instances"))).alias("instances"),
            F.sum("_s_cnt").alias("n_obs"),
        )
    else:
        final = base.groupBy("src_id", "dst_id", "src", "dst").agg(
            F.max_by("pred", _desc_key("pred")).alias("pred"),
            F.avg("strength").alias("strength"),
            F.collect_set("instance").alias("instances"),
            F.count(F.lit(1)).alias("n_obs"),
        )
        final = (
            final.withColumn("n_instances", F.size("instances"))
            .withColumn("instances", cap(F.array_sort("instances")))
        )
    return final.select(
        "src_id",
        "dst_id",
        "src",
        "dst",
        "pred",
        "strength",
        "instances",
        F.col("n_instances").cast("long").alias("n_instances"),
        "n_obs",
    )


def merge_claims(canon_claims: DataFrame) -> DataFrame:
    """S9 claims: case-insensitive content dedup (E4).

    Input columns: content, entity_ids array<string>, source_id, chunk_id.
    """
    return (
        canon_claims.withColumn("instance", F.struct("source_id", "chunk_id"))
        .groupBy(F.lower(F.col("content")).alias("content_key"))
        .agg(
            F.min("content").alias("content"),
            F.array_sort(F.array_distinct(F.flatten(F.collect_list("entity_ids")))).alias(
                "entity_ids"
            ),
            F.array_sort(F.collect_set("instance")).alias("instances"),
            F.count(F.lit(1)).alias("n_obs"),
        )
        .withColumn("claim_id", F.sha2(F.col("content_key"), 256).substr(1, 32))
        .select("claim_id", "content", "entity_ids", "instances", "n_obs")
    )
