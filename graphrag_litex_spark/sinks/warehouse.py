"""Bucketed warehouse materialization of the knowledge graph (A2 at scale).

The stage tables the pipeline writes are plain parquet directories — right
for checkpoint/resume, but every downstream id-keyed join (nodes x edges,
nodes x triples, nodes x claims: the D1/D2 shape users run constantly
against a built graph) must shuffle the fact table on its join key first.
At 100 TB the edges/triples tables are the corpus-proportional ones, and
that shuffle IS the query cost.

``save_graph_tables`` writes the graph's id-keyed collections as BUCKETED
managed tables (``bucketBy`` on the id each table is joined on, same bucket
count everywhere), so the warehouse is pre-co-located: a join between any
two of them on the bucketed keys compiles to a SortMergeJoin with NO
Exchange on either side (asserted in tests/test_warehouse.py against the
physical plan). Catalyst reads the bucketing metadata from the session
catalog — Hive-style parquet tables in the sandbox; with an Iceberg
catalog configured the same calls go through
``spark.sql.catalog.*`` unchanged (Iceberg bucket-partition transforms
replace Hive bucketing; this module keeps the DataFrame-level contract).

Bucket keys (one hash family, so any pair co-locates):
  nodes     -> entity_id        (primary key)
  edges     -> src_id           (the probe side of D1)
  triples   -> src_id
  mentions  -> entity_id        (mention provenance lookups)
  canon_map -> entity_id

Claims join through an ARRAY of entity ids, which buckets cannot
co-locate — so publishing "claims" ALSO derives and publishes an exploded
``claim_entities (claim_id, entity_id)`` bridge table bucketed on
entity_id: the claims->nodes join runs Exchange-free through the bridge
(two bucketed SortMergeJoins), instead of exploding the array at query
time and shuffling the result. Other non-id tables (chunks, communities,
community_stats, summaries, claims itself) are saved unbucketed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BUCKET_KEYS = {
    "nodes": "entity_id",
    "edges": "src_id",
    "triples": "src_id",
    "mentions": "entity_id",
    "canon_map": "entity_id",
    "claim_entities": "entity_id",
}


def _catalog_bucket_count(spark: SparkSession, ident: str) -> int | None:
    """Bucket count of an existing catalog table (None if absent/unbucketed)."""
    if not spark.catalog.tableExists(ident):
        return None
    for r in spark.sql(f"DESCRIBE EXTENDED {ident}").collect():
        if r.col_name == "Num Buckets":
            return int(r.data_type)
    return None


def analyze_tables(
    spark: SparkSession, idents: dict[str, str] | list[str]
) -> None:
    """Compute catalog statistics for published tables: table-level
    (row count / size) plus column stats on each bucketed table's join
    key. These feed the cost-based optimizer — join reordering and
    static broadcast decisions read catalog stats, and while AQE fixes
    broadcast choices at runtime from shuffle sizes, the INITIAL plan
    (join order, bucketed-scan vs shuffle choice) is still CBO's call.
    One metadata scan per table; run it once per publish, not per query.
    """
    items = idents.items() if isinstance(idents, dict) else [(None, i) for i in idents]
    for name, ident in items:
        spark.sql(f"ANALYZE TABLE {ident} COMPUTE STATISTICS")
        key = BUCKET_KEYS.get(name or "")
        # Same guard as the writer: a collection may be legitimately saved
        # without its nominal bucket key (then unbucketed) — analyzing a
        # missing column would abort the publish after tables were written.
        if key is not None and key in spark.table(ident).columns:
            spark.sql(f"ANALYZE TABLE {ident} COMPUTE STATISTICS FOR COLUMNS {key}")


def verify_publish(
    spark: SparkSession, graph: dict[str, DataFrame], idents: dict[str, str]
) -> dict[str, dict]:
    """Publish-fidelity attestation: for every published collection that
    has a source frame in ``graph``, compare the canonical content
    checksum (plans.pipeline.frame_checksum — order-, partitioning-, and
    provenance-array-order-free) of the CATALOG table against its source.
    Returns {name: {source, published, identical}}; a False anywhere means
    the warehouse does not faithfully reflect the build it was published
    from (torn write, concurrent mutation, wrong prefix). Cost: one scan
    per side per table — run it after a publish, not per query."""
    from graphrag_litex_spark.plans.pipeline import frame_checksum

    out: dict[str, dict] = {}
    for name, ident in idents.items():
        src = graph.get(name)
        if src is None:
            continue  # derived at publish time (e.g. claim_entities)
        a = frame_checksum(src)
        b = frame_checksum(spark.table(ident))
        out[name] = {
            "source": a,
            "published": b,
            "identical": a == b,
        }
    return out


def save_graph_tables(
    graph: dict[str, DataFrame],
    prefix: str = "kg",
    buckets: int = 64,
    mode: str = "overwrite",
    location: str | None = None,
    analyze: bool = False,
) -> dict[str, str]:
    """Persist graph collections as catalog tables, bucketing the id-keyed
    ones; returns {collection: table_identifier}.

    ``buckets`` is the warehouse-wide bucket count — co-location requires
    every table in a join to agree on it, so it is fixed per warehouse, not
    per table. Size it to cluster parallelism at build time (e.g. 4096 on
    a 1000-executor cluster); local tests use small counts.

    ``location`` (optional) roots each table at ``<location>/<identifier>``
    (external tables — bucketing metadata still lives in the catalog);
    without it tables are managed under ``spark.sql.warehouse.dir``, which
    is a static conf fixed at session start.

    ``analyze``: also compute catalog stats (:func:`analyze_tables`) —
    one extra scan per table at publish time, so it is opt-in.
    """
    import os

    graph = dict(graph)
    if not graph:
        return {}
    # Claims bridge: explode the entity_ids array once at publish time so
    # claim->entity joins are bucket-co-located (see module docstring).
    if "claims" in graph and "claim_entities" not in graph:
        graph["claim_entities"] = graph["claims"].select(
            "claim_id", F.explode("entity_ids").alias("entity_id")
        )

    # Warehouse-wide co-location guard: a bucketed table under this prefix
    # that is NOT being republished in this call must already agree on the
    # bucket count — silently publishing a subset at a different count
    # would break the Exchange-free invariant against the untouched tables.
    spark = next(iter(graph.values())).sparkSession
    for name in BUCKET_KEYS.keys() - graph.keys():
        existing = _catalog_bucket_count(spark, f"{prefix}_{name}")
        if existing is not None and existing != buckets:
            raise ValueError(
                f"bucket-count mismatch: existing table {prefix}_{name} has "
                f"{existing} buckets, this publish requests {buckets}; "
                "republish all bucketed tables together or reuse the count"
            )

    written: dict[str, str] = {}
    for name, df in graph.items():
        ident = f"{prefix}_{name}"
        writer = df.write.mode(mode).format("parquet")
        if location is not None:
            writer = writer.option("path", os.path.join(location, ident))
        key = BUCKET_KEYS.get(name)
        if key is not None and key in df.columns:
            writer = writer.bucketBy(buckets, key).sortBy(key)
        writer.saveAsTable(ident)
        written[name] = ident
    if analyze:
        analyze_tables(spark, written)
    return written


def publish_transcripts(
    transcripts: DataFrame,
    ident: str = "kg_transcripts",
    buckets: int = 64,
    mode: str = "overwrite",
    location: str | None = None,
) -> str:
    """Publish the transcripts CORPUS as a conv_id-bucketed catalog table
    (sorted by (conv_id, turn_idx) within buckets).

    Every per-conversation operator — reassembly windows, chunking's
    co-location repartition, transcript analytics (conversation_stats /
    conversation_integrity), the ingest gate — requires rows clustered on
    conv_id, and against a plain parquet directory each one pays a
    corpus-sized Exchange for it. A bucketed scan reports
    HashPartitioning(conv_id), so those plans drop the Exchange entirely
    (asserted in tests/test_warehouse.py): at 10^12 turns that shuffle is
    the single largest non-extraction cost. The pipeline consumes the
    table via its ``table:<ident>`` input form (Iceberg-snapshot-keyed
    resume when a real catalog is configured; Iceberg's bucket partition
    transform replaces Hive bucketing there).
    """
    import os

    writer = (
        transcripts.write.mode(mode)
        .format("parquet")
        .bucketBy(buckets, "conv_id")
        .sortBy("conv_id", "turn_idx")
    )
    if location is not None:
        writer = writer.option("path", os.path.join(location, ident))
    writer.saveAsTable(ident)
    return ident


def open_warehouse_graph(
    spark: SparkSession, prefix: str = "kg", tables: list[str] | None = None
) -> dict[str, DataFrame]:
    """Re-open a warehouse written by ``save_graph_tables``. Bucketing
    metadata comes from the catalog, so joins between the returned frames
    on their bucket keys plan without an Exchange."""
    from graphrag_litex_spark.sources.tables import KG_TABLES

    out: dict[str, DataFrame] = {}
    for name in tables or KG_TABLES:
        ident = f"{prefix}_{name}"
        if spark.catalog.tableExists(ident):
            out[name] = spark.table(ident)
    return out
