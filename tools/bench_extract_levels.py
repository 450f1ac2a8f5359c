"""Extraction-segment-only scaling sweep (more reps, probe-bracketed).

The full study (bench_scaling.py) runs the extraction segment twice per
level; on a host whose deliverable CPU varies minute-to-minute that can
land both reps in a degraded window. This tool reruns ONLY the extraction
segment at the requested levels with more in-JVM reps, bracketing each
level with the pure-CPU probe, so a clean window can be caught and the
best rep reported per level.

Usage: python3 tools/bench_extract_levels.py [sf] [reps] [levels,comma-sep]
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.bench_scaling import PROBE_SNIPPET, _run_pinned  # noqa: E402

EXTRACT_SNIPPET = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
import pandas as pd
from pyspark.sql import types as T
from graphrag_litex_spark import datagen
from graphrag_litex_spark.operators.extraction import extract_items
from graphrag_litex_spark.session import get_spark
sf = {sf}
cores = {cores}
paths = datagen.ensure_corpus(sf)
spark = get_spark(app_name="extract_scaling", cores=cores,
                  extra_conf={{"spark.ui.showConsoleProgress": "false"}})
tr = spark.read.parquet(paths["transcripts"])
sch = T.StructType([T.StructField("n", T.LongType())])
spark.range(0, cores * 4, 1, cores * 4).mapInPandas(
    lambda it: (pd.DataFrame({{"n": [len(p)]}}) for p in it), sch).count()
chunks = tr.select("conv_id", "turn_idx", "text").repartition(cores * 5).cache()
n_turns = chunks.count()
secs = []
for _ in range({reps}):
    t0 = time.time()
    extract_items(chunks).count()
    secs.append(round(time.time() - t0, 2))
print("RESULT " + json.dumps({{"cores": cores, "n_turns": n_turns,
      "secs": secs, "best_sec": min(secs),
      "best_turns_per_sec": round(n_turns / min(secs), 2)}}))
"""


def main() -> None:
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 10.0
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    levels = (
        [int(x) for x in sys.argv[3].split(",")] if len(sys.argv) > 3 else [4, 8, 16, 32]
    )
    out = {"sf": sf, "reps": reps, "levels": {}}
    for n in levels:
        pre = _run_pinned(PROBE_SNIPPET.format(cores=n), n)["probe_sec"]
        res = _run_pinned(EXTRACT_SNIPPET.format(repo=REPO, sf=sf, cores=n, reps=reps), n)
        post = _run_pinned(PROBE_SNIPPET.format(cores=n), n)["probe_sec"]
        res["probe_pre"], res["probe_post"] = pre, post
        out["levels"][n] = res
        print(json.dumps({n: res}), flush=True)
    print("FINAL " + json.dumps(out))


if __name__ == "__main__":
    main()
