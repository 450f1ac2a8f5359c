"""Source-reputation units: hand-checkable aggregates + the semi-join gate."""

import pandas as pd

from graphrag_litex_spark.operators.sampling import (
    filter_by_source_reputation,
    source_reputation,
)

# Source A: two decent English sentences; source B: two junk docs.
DOCS = [
    (1, "The quick brown fox jumps over the lazy dog and it was a good day.", "a"),
    (2, "It is a truth universally acknowledged that a single man wants a wife.", "a"),
    (3, "!!!???;;;", "b"),
    (4, "ZZZZ!!!! ????", "b"),
]


def _docs(spark):
    return spark.createDataFrame(pd.DataFrame(DOCS, columns=["doc_id", "text", "source"]))


def test_source_reputation_aggregates(spark):
    rows = {r["source"]: r for r in source_reputation(_docs(spark)).collect()}
    assert rows["a"]["n_docs"] == 2 and rows["b"]["n_docs"] == 2
    assert rows["a"]["avg_quality"] > rows["b"]["avg_quality"]
    assert rows["b"]["n_low"] == 2 and rows["b"]["low_frac"] == 1.0
    assert rows["a"]["n_low"] == 0 and rows["a"]["low_frac"] == 0.0


def test_source_reputation_exact_avg(spark):
    # avg_quality must equal the micro-quantized mean of the per-doc scores.
    from graphrag_litex_spark.operators.text_analysis import quality_features

    per_doc = {
        r["doc_id"]: r["quality_score"]
        for r in quality_features(_docs(spark)).select("doc_id", "quality_score").collect()
    }
    micros = [int(per_doc[i] * 1e6 + 0.5) for i in (1, 2)]
    want = round(sum(micros) / 2 / 1e6, 6)
    got = {r["source"]: r["avg_quality"] for r in source_reputation(_docs(spark)).collect()}
    assert got["a"] == want


def test_filter_by_source_reputation_gates_whole_source(spark):
    kept = filter_by_source_reputation(_docs(spark), min_avg_quality=0.4)
    assert sorted(r["doc_id"] for r in kept.collect()) == [1, 2]
    # Bar nobody clears -> empty; bar everybody clears -> all docs.
    assert filter_by_source_reputation(_docs(spark), min_avg_quality=1.01).count() == 0
    assert filter_by_source_reputation(_docs(spark), min_avg_quality=0.0).count() == 4
