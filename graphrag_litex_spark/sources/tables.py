"""Source/sink adapters (SURVEY.md §2 A rows).

The reference reads a directory of text files into a dict
(/root/reference/graphrag_lite_x.py:130-148) and persists the graph as one
JSON blob (models/knowledge_graph.py:188-229). Spark-native equivalents:

  * transcripts source — parquet (or any Spark table/format) with the
    BASELINE input_hint schema; validated on read;
  * text-directory source — `spark.read.format("text")` with
    ``wholetext`` per file + input_file_name provenance (A1 parity for
    users migrating from the reference's document folders);
  * KG sink/source — one parquet (or Iceberg, when a catalog is
    configured) table per collection instead of a JSON blob (A2/A3);
    the pipeline's stage materialization IS the sink; these helpers
    re-open a previously built graph.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

KG_TABLES = [
    "chunks",
    "mentions",
    "canon_map",
    "nodes",
    "edges",
    "triples",
    "claims",
    "claim_entities",
    "communities",
    "community_stats",
    "summaries",
    "summary_embeddings",
]


TABLE_PREFIX = "table:"


def load_input(spark: SparkSession, source: str) -> DataFrame:
    """Resolve an input reference: ``table:<identifier>`` reads a catalog
    table (Iceberg/Hive/temp view — the BASELINE input is an Iceberg
    transcripts table; the sandbox has no Iceberg runtime, so this path is
    exercised with temp views and works unchanged once
    ``spark.sql.catalog.*`` points at an Iceberg catalog); anything else is
    a parquet path."""
    if source.startswith(TABLE_PREFIX):
        return spark.read.table(source[len(TABLE_PREFIX):])
    return spark.read.parquet(source)


def input_fingerprint(spark: SparkSession, source: str) -> str | None:
    """Change token for checkpoint manifests. For an Iceberg table this is
    the current snapshot id (resume invalidates when the table advances);
    for other catalog tables None (caller falls back to identifier-only);
    parquet paths are fingerprinted by the caller from file stats."""
    if not source.startswith(TABLE_PREFIX):
        return None
    ident = source[len(TABLE_PREFIX):]
    try:
        # Only Iceberg tables expose the .snapshots metadata table; check the
        # provider first so temp views / hive tables don't trigger (and log)
        # an analysis error on the probe.
        desc = spark.sql(f"DESCRIBE TABLE EXTENDED {ident}").collect()
        provider = next((r[1] for r in desc if r[0] == "Provider"), "") or ""
        if "iceberg" not in provider.lower():
            return None
        row = spark.sql(
            f"SELECT snapshot_id FROM {ident}.snapshots "
            "ORDER BY committed_at DESC LIMIT 1"
        ).collect()
        return f"iceberg-snapshot:{row[0][0]}" if row else "iceberg-empty"
    except Exception:
        return None


def read_transcripts(spark: SparkSession, source: str) -> DataFrame:
    """Read + schema-validate a transcripts table (parquet path or
    ``table:<identifier>``)."""
    df = load_input(spark, source)
    missing = {f.name for f in TRANSCRIPT_SCHEMA} - set(df.columns)
    if missing:
        raise ValueError(f"transcripts table missing columns: {sorted(missing)}")
    return df.select(
        F.col("conv_id").cast("string"),
        F.col("turn_idx").cast("int"),
        F.col("role").cast("string"),
        F.col("text").cast("string"),
        F.col("tool").cast("string"),
        F.col("ts").cast("timestamp"),
    )


def read_text_documents(spark: SparkSession, directory: str) -> DataFrame:
    """A1: directory of text files -> (doc_id, text) — one row per file,
    whole file as one string (reference reads .txt/.md/... into
    {filename: content})."""
    return (
        spark.read.format("text")
        .option("wholetext", "true")
        .load(directory)
        .select(
            F.input_file_name().alias("doc_id"),
            F.col("value").alias("text"),
        )
    )


def documents_as_transcripts(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Adapt a documents table to the transcripts schema (one document ==
    one single-turn conversation) so the KG pipeline can ingest plain
    document corpora exactly like the reference does."""
    return docs.select(
        F.col(id_col).cast("string").alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        F.col(text_col).cast("string").alias("text"),
        F.lit(None).cast("string").alias("tool"),
        F.lit(None).cast("timestamp").alias("ts"),
    )


def open_graph(spark: SparkSession, kg_dir: str) -> dict[str, DataFrame]:
    """A3: re-open a previously built graph's stage tables."""
    out = {}
    for name in KG_TABLES:
        path = os.path.join(kg_dir, name)
        if os.path.exists(path):
            out[name] = spark.read.parquet(path)
    return out
