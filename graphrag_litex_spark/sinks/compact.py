"""Small-file compaction for parquet datasets.

The silent killer of 100 TB warehouses is not data volume but FILE COUNT:
every incremental append, streaming micro-batch, or high-parallelism
stage write (this repo's own `append_dedup_index`, `KGPipeline
.append_transcripts`, `foreachBatch` KG ingest) adds one file per task,
and a few thousand appends later every scan pays a footer-read and task
per tiny file. Compaction rewrites a dataset into ~``target_mb`` files:
one `coalesce` (narrow — no shuffle; partitions are concatenated, never
redistributed) and one write. Hive-partitioned datasets instead shuffle
once on their partition columns and re-apply ``partitionBy`` so the
layout (and downstream partition pruning) survives the rewrite.

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


def _partition_columns(path: str, files_in: list) -> list:
    """Hive partition columns of the dataset at ``path``, in directory
    order, inferred from the files' relative paths (``key=value`` path
    segments). Every file must agree on the same column sequence —
    anything else is not a layout this utility can faithfully rewrite."""
    layouts = set()
    for f in files_in:
        rel = os.path.relpath(os.path.dirname(f), path)
        segs = [] if rel == "." else rel.split(os.sep)
        layouts.add(tuple(s.split("=", 1)[0] for s in segs if "=" in s))
    if len(layouts) > 1:
        raise ValueError(
            f"inconsistent hive partition layouts under {path!r}: "
            f"{sorted(layouts)}"
        )
    return list(layouts.pop()) if layouts else []


def compact_parquet(
    spark,
    path: str,
    out_path: str,
    target_mb: int = 256,
) -> dict:
    """Rewrite the parquet dataset at ``path`` into ``out_path`` with
    ~``target_mb``-sized files. Hive-partitioned inputs (key=value dirs —
    e.g. the dedup index's ``bands/`` dir, partitioned by band) keep their
    layout: partition columns are detected from the directory structure
    and re-applied on write, so downstream partition pruning survives
    compaction. Returns accounting (files_in/bytes_in/files_out/rows) —
    the report a compaction job logs.
    """
    files_in = [
        f
        for f in glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
        if os.path.isfile(f)
    ]
    if not files_in:
        raise ValueError(f"no parquet files under {path!r}")
    part_cols = _partition_columns(path, files_in)
    bytes_in = sum(os.path.getsize(f) for f in files_in)
    n_out = max(1, math.ceil(bytes_in / (target_mb * 1024 * 1024)))
    df = spark.read.parquet(path)
    if part_cols:
        # Partitioned rewrite: co-locate each partition's rows so the write
        # emits ~1 file per (output-partition × hive-dir) instead of every
        # task fanning out one file per hive dir it happens to hold rows
        # for. This is a shuffle — unavoidable if the rewrite is to honor
        # both the file-count target and the directory layout.
        df.repartition(n_out, *part_cols).write.mode("overwrite").partitionBy(
            *part_cols
        ).parquet(out_path)
    else:
        # coalesce, not repartition: concatenating partitions needs no
        # shuffle, and unpartitioned compaction doesn't care about row
        # placement — only file count.
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
