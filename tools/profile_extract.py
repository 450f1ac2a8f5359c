"""Decompose the extraction hot path to find the non-scaling component.

Times, at a given core count (CPU-pinned externally via taskset):
  scan      : parquet scan + count (JVM only)
  arrow     : scan -> mapInPandas passthrough-count (Arrow roundtrip, no extract)
  extract   : full extract_items (Arrow + Python extractor + item build)

Usage: taskset -c 0-(N-1) python3 tools/profile_extract.py <sf> <cores>
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from graphrag_litex_spark import datagen
from graphrag_litex_spark.operators.extraction import extract_items
from graphrag_litex_spark.session import get_spark


def main() -> None:
    sf = float(sys.argv[1])
    cores = int(sys.argv[2])
    paths = datagen.ensure_corpus(sf)
    spark = get_spark(app_name="profile_extract", cores=cores,
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    tr = spark.read.parquet(paths["transcripts"])
    n_parts = tr.rdd.getNumPartitions()

    chunks = tr.select(
        "conv_id", "turn_idx",
        F.concat_ws("_", "conv_id", "turn_idx").alias("chunk_id"), "text")

    # warm page cache + JIT
    tr.count()

    t0 = time.time()
    n = tr.count()
    scan_sec = time.time() - t0

    def passthrough(it):
        for pdf in it:
            yield pd.DataFrame({"n": [len(pdf)]})

    t0 = time.time()
    chunks.mapInPandas(passthrough, T.StructType([T.StructField("n", T.LongType())])) \
        .agg(F.sum("n")).collect()
    arrow_sec = time.time() - t0

    t0 = time.time()
    n_items = extract_items(chunks).count()
    extract_sec = time.time() - t0

    print("RESULT " + json.dumps({
        "cores": cores, "sf": sf, "n_turns": n, "n_parts": n_parts,
        "scan_sec": round(scan_sec, 2), "arrow_sec": round(arrow_sec, 2),
        "extract_sec": round(extract_sec, 2), "n_items": n_items,
    }))


if __name__ == "__main__":
    main()
