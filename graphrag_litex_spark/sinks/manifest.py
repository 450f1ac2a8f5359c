"""Shared integrity-manifest helper for JSONL exporters.

Both shard exporters (jobs/export_shards.py, jobs/export_graph.py) publish
the same loader-side contract: a ``_manifest.json`` next to the shard files
listing per-file byte length + sha256, hashed as a DISTRIBUTED job
(binaryFile source + ``F.sha2`` — each executor hashes its own files; shard
files are ~MBs so whole-file rows are fine), with only the
file-count-sized result reaching the driver. Underscore prefix: Spark /
Hadoop readers skip ``_``-prefixed files (like ``_SUCCESS``), so reading
the shard dir as JSONL never ingests the manifest.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def hash_export_files(spark: SparkSession, out_dir: str, pattern: str = "part-*") -> list[dict]:
    """Distributed per-file (file, bytes, sha256) for an export directory,
    sorted by file name."""
    rows = (
        spark.read.format("binaryFile")
        .load(os.path.join(out_dir, pattern))
        .select(
            F.element_at(F.split("path", "/"), -1).alias("file"),
            F.col("length").alias("bytes"),
            F.sha2("content", 256).alias("sha256"),
        )
        .orderBy("file")
        .collect()
    )
    return [
        {"file": r["file"], "bytes": r["bytes"], "sha256": r["sha256"]} for r in rows
    ]


def write_manifest(spark: SparkSession, out_dir: str, extra: dict | None = None) -> list[dict]:
    """Hash the shard files under ``out_dir`` and write ``_manifest.json``
    there ({**extra, "files": [...]}); returns the file entries."""
    files = hash_export_files(spark, out_dir)
    with open(os.path.join(out_dir, "_manifest.json"), "w") as fh:
        json.dump({**(extra or {}), "files": files}, fh, indent=1)
    return files
