"""Validate scaling fixes: warm Python workers + even fine input splits.

Usage: taskset -c 0-(N-1) python3 tools/profile_extract2.py <sf> <cores>
"""
from __future__ import annotations

import json
import os
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
    tdir = paths["transcripts"]
    total = sum(
        os.path.getsize(os.path.join(tdir, f)) for f in os.listdir(tdir)
    )
    split = max(4 * 1024 * 1024, total // (cores * 4))
    spark = get_spark(app_name="profile_extract2", cores=cores,
                      extra_conf={
                          "spark.ui.showConsoleProgress": "false",
                          "spark.sql.files.maxPartitionBytes": str(split),
                          "spark.sql.files.openCostInBytes": "0",
                      })
    tr = spark.read.parquet(tdir)
    n_parts = tr.rdd.getNumPartitions()

    chunks = tr.select(
        "conv_id", "turn_idx",
        F.concat_ws("_", "conv_id", "turn_idx").alias("chunk_id"), "text")

    # Warm page cache, JIT, and Python workers (steady-state throughput:
    # at 10^12-turn scale worker startup amortizes to zero).
    def passthrough(it):
        for pdf in it:
            yield pd.DataFrame({"n": [len(pdf)]})

    sch = T.StructType([T.StructField("n", T.LongType())])
    spark.range(0, cores * 4, 1, cores * 4).mapInPandas(
        lambda it: (pd.DataFrame({"n": [len(p)]}) for p in it), sch).count()
    tr.count()

    t0 = time.time()
    chunks.mapInPandas(passthrough, sch).agg(F.sum("n")).collect()
    arrow_sec = time.time() - t0

    t0 = time.time()
    n_items = extract_items(chunks).count()
    extract_sec = time.time() - t0

    print("RESULT " + json.dumps({
        "cores": cores, "sf": sf, "n_parts": n_parts,
        "arrow_sec": round(arrow_sec, 2),
        "extract_sec": round(extract_sec, 2), "n_items": n_items,
    }))


if __name__ == "__main__":
    main()
