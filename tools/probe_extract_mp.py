"""No-Spark falsification probe: the ACTUAL extractor (extract_turn_flat)
over in-memory synthetic turns via multiprocessing, taskset-pinned.
If this flat-lines 8->32 like the Spark extraction segment does, the
ceiling is the host (memory bandwidth / hypervisor), not the engine."""
import json, multiprocessing as mp, sys, time

sys.path.insert(0, "/root/repo")

TEXTS = None

def _init():
    global TEXTS
    import pandas as pd
    # deterministic sample of real sf0.1 turn texts, replicated
    df = pd.read_parquet("/root/repo/data/gen/sf0.1/transcripts/")
    global TEXTS
    TEXTS = df["text"].head(20000).tolist()

def work(seed):
    from graphrag_litex_spark.functions.extract import extract_turn_flat
    n = 0
    for t in TEXTS:
        r = extract_turn_flat(t or "")
        if r is not None:
            n += len(r[0])
    return n

if __name__ == "__main__":
    cores = int(sys.argv[1])
    with mp.Pool(cores, initializer=_init) as p:
        p.map(work, range(cores))  # warm
        best = None
        for _ in range(2):
            t0 = time.time()
            p.map(work, range(64))  # fixed total work: 64 * 20k turns
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
    print(json.dumps({"cores": cores, "sec": round(best, 3),
                      "turns_per_sec": round(64 * 20000 / best)}))
