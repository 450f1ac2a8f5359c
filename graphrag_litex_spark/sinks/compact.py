"""Small-file compaction for parquet datasets.

The silent killer of 100 TB warehouses is not data volume but FILE COUNT:
every incremental append, streaming micro-batch, or high-parallelism
stage write (this repo's own `append_dedup_index`, `KGPipeline
.append_transcripts`, `foreachBatch` KG ingest) adds one file per task,
and a few thousand appends later every scan pays a footer-read and task
per tiny file. Compaction rewrites a dataset into ~``target_mb`` files:
one `coalesce` (narrow — no shuffle; partitions are concatenated, never
redistributed) and one write.

Safe-swap stance: the rewrite targets a NEW directory (the same
write-then-reopen pattern as the pipeline's stage tables); atomically
promoting it over the old path is the catalog layer's job (Iceberg
rewrite_data_files does exactly this dance), not a filesystem rename this
utility could only fake on a local FS.
"""

from __future__ import annotations

import glob
import math
import os


def compact_parquet(
    spark,
    path: str,
    out_path: str,
    target_mb: int = 256,
) -> dict:
    """Rewrite the parquet dataset at ``path`` into ``out_path`` with
    ~``target_mb``-sized files. Returns accounting
    (files_in/bytes_in/files_out/rows) — the report a compaction job logs.
    """
    files_in = [
        f
        for f in glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
        if os.path.isfile(f)
    ]
    if not files_in:
        raise ValueError(f"no parquet files under {path!r}")
    bytes_in = sum(os.path.getsize(f) for f in files_in)
    n_out = max(1, math.ceil(bytes_in / (target_mb * 1024 * 1024)))
    df = spark.read.parquet(path)
    # coalesce, not repartition: concatenating partitions needs no shuffle,
    # and compaction doesn't care about row placement — only file count.
    df.coalesce(n_out).write.mode("overwrite").parquet(out_path)
    out_files = [
        f
        for f in glob.glob(os.path.join(out_path, "**", "*.parquet"), recursive=True)
        if os.path.isfile(f)
    ]
    return {
        "files_in": len(files_in),
        "bytes_in": bytes_in,
        "files_out": len(out_files),
        "bytes_out": sum(os.path.getsize(f) for f in out_files),
        "rows": spark.read.parquet(out_path).count(),
        "target_mb": target_mb,
    }
