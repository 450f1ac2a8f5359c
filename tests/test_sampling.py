"""Unit tests for deterministic sampling, profiling, and sequence packing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphrag_litex_spark.operators.sampling import (
    corpus_profile,
    deterministic_sample,
    pack_greedy,
    pack_stats,
    stratified_sample,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, "en" if i % 3 else "de", "word " * (i % 7 + 1)) for i in range(400)]
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def _ids(df):
    return sorted(r["doc_id"] for r in df.select("doc_id").collect())


def test_sample_partitioning_invariant(docs):
    a = _ids(deterministic_sample(docs.repartition(1), 0.3))
    b = _ids(deterministic_sample(docs.repartition(13), 0.3))
    assert a == b and 0 < len(a) < 400


def test_sample_rates_nested_and_bounds(docs):
    small = set(_ids(deterministic_sample(docs, 0.1)))
    big = set(_ids(deterministic_sample(docs, 0.4)))
    assert small <= big  # raising the rate only ADDS documents
    assert len(_ids(deterministic_sample(docs, 1.0))) == 400
    assert len(_ids(deterministic_sample(docs, 0.0))) == 0
    # rate roughly honored (md5 is uniform; 400 docs, loose band)
    assert 0.25 <= len(big) / 400 <= 0.55


def test_stratified_rates(docs):
    out = stratified_sample(
        docs, rates={"de": 1.0, "en": 0.2}, strata_col="lang", default_rate=0.0
    )
    got = out.groupBy("lang").count().collect()
    by_lang = {r["lang"]: r["count"] for r in got}
    n_de = docs.where("lang = 'de'").count()
    assert by_lang["de"] == n_de  # rate 1.0 keeps every row, even key 'ffffff'
    assert 0 < by_lang.get("en", 0) < 400 - n_de
    # the en subset is exactly deterministic_sample at the same rate
    en_strat = set(_ids(out.where("lang = 'en'")))
    en_flat = set(_ids(deterministic_sample(docs.where("lang = 'en'"), 0.2)))
    assert en_strat == en_flat


def test_pack_greedy_accounting(spark):
    # shard-local packing: every doc assigned once; a bin never exceeds
    # budget by more than its last (overflowing) document
    rows = [(i, "w " * 10) for i in range(100)]  # 10 tokens each
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    packed = pack_greedy(docs, budget=25)
    assert packed.count() == 100
    assert packed.select("doc_id").distinct().count() == 100
    stats = pack_stats(packed, budget=25).collect()
    for r in stats:
        # exclusive-prefix rule: bin total < budget + one doc (10 tokens)
        assert r["total_tokens"] < 25 + 10
    # deterministic: repartitioned input packs identically
    again = pack_greedy(docs.repartition(7), budget=25)
    a = sorted(map(tuple, packed.collect()))
    b = sorted(map(tuple, again.collect()))
    assert a == b


def test_pack_bins_fill(spark):
    rows = [(1, "a " * 30), (2, "b " * 30)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    stats = pack_stats(pack_greedy(docs, budget=100), budget=100).collect()
    assert sum(r["n_docs"] for r in stats) == 2
    for r in stats:
        assert r["fill_ratio"] == pytest.approx(r["total_tokens"] / 100.0)


def test_corpus_profile_values(spark):
    rows = [(1, "en", "a b c"), (2, "en", "a b c d e"), (3, "de", "x")]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = {r["grp"]: r for r in corpus_profile(docs).collect()}
    assert got["en"]["n_docs"] == 2 and got["en"]["total_tokens"] == 8
    assert got["en"]["median_tokens"] == pytest.approx(4.0)  # interpolated (3+5)/2
    assert got["de"]["median_tokens"] == pytest.approx(1.0)


def test_corpus_profile_approx_valve(spark):
    rows = [(i, "en", "w " * (i % 50 + 1)) for i in range(300)]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    exact = {r["grp"]: r for r in corpus_profile(docs).collect()}
    approx = {r["grp"]: r for r in corpus_profile(docs, approx=True).collect()}
    assert approx["en"]["n_docs"] == exact["en"]["n_docs"]
    assert abs(approx["en"]["median_tokens"] - exact["en"]["median_tokens"]) <= 1.0
    assert abs(approx["en"]["p95_tokens"] - exact["en"]["p95_tokens"]) <= 2.0


def test_pack_shard_width_parameter(spark):
    """Raising shard_hex_digits widens parallelism without losing docs and
    keeps the accounting invariant (no bin exceeds budget + one doc)."""
    rows = [(i, "w " * 10) for i in range(200)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    packed = pack_greedy(docs, budget=40, shard_hex_digits=2)  # 256-way
    assert packed.count() == 200
    shards = {r["bin_id"].split("_")[0] for r in packed.collect()}
    assert all(len(s) == 2 for s in shards) and len(shards) > 50
    for r in pack_stats(packed, budget=40).collect():
        assert r["total_tokens"] < 40 + 10


def test_assign_splits_stable_under_growth(spark):
    from graphrag_litex_spark.operators.sampling import assign_splits

    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    small = spark.createDataFrame([(i,) for i in range(200)], "doc_id long")
    big = spark.createDataFrame([(i,) for i in range(400)], "doc_id long")
    s_small = {r["doc_id"]: r["split"] for r in assign_splits(small, w).collect()}
    s_big = {r["doc_id"]: r["split"] for r in assign_splits(big, w).collect()}
    # growing the corpus never reassigns an existing document
    assert all(s_big[i] == s_small[i] for i in s_small)
    counts = {}
    for v in s_big.values():
        counts[v] = counts.get(v, 0) + 1
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]
    assert set(counts) == {"train", "val", "test"}
    with pytest.raises(ValueError):
        assign_splits(small, {"a": 0.5, "b": 0.3})


def test_sample_mixture_budget_semantics(spark):
    """Per-source greedy prefix: cumulative tokens never exceed the budget,
    zero-budget sources vanish, unlisted sources vanish, and the kept set
    is NESTED as budgets grow."""
    import pandas as pd

    from graphrag_litex_spark.operators.sampling import sample_mixture_by_tokens

    rows = [(i, f"s{i % 3}", 10) for i in range(30)]  # 3 sources x 10 docs x 10 tokens
    docs = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "source", "n_tokens"])
    )
    out = sample_mixture_by_tokens(docs, {"s0": 35, "s1": 0}).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r)
    assert set(by_src) == {"s0"}  # s1 budget 0, s2 unlisted
    assert len(by_src["s0"]) == 3  # 3 docs x 10 tokens = 30 <= 35; a 4th would hit 40
    assert max(r["cum_tokens"] for r in by_src["s0"]) == 30

    small = {r["doc_id"] for r in sample_mixture_by_tokens(docs, {"s0": 35}).collect()}
    big = {r["doc_id"] for r in sample_mixture_by_tokens(docs, {"s0": 75}).collect()}
    assert small < big  # nested: raising the budget only adds documents


def test_sample_mixture_first_doc_over_budget(spark):
    import pandas as pd

    from graphrag_litex_spark.operators.sampling import sample_mixture_by_tokens

    docs = spark.createDataFrame(
        pd.DataFrame([(1, "s", 100)], columns=["doc_id", "source", "n_tokens"])
    )
    assert sample_mixture_by_tokens(docs, {"s": 50}).count() == 0


def test_cluster_balanced_sample_caps_and_nests(spark):
    from graphrag_litex_spark.operators.sampling import cluster_balanced_sample

    # Two well-separated clusters: ids 0-9 on axis 0, ids 10-19 on axis 1.
    rows = [(i, [1.0, 0.0, 0.0, 0.0] if i < 10 else [0.0, 1.0, 0.0, 0.0]) for i in range(20)]
    emb = spark.createDataFrame(rows, "doc_id long, embedding array<double>")
    docs = emb.select("doc_id")
    kept3 = sorted(r["doc_id"] for r in cluster_balanced_sample(docs, emb, 3, n_clusters=2).collect())
    assert len(kept3) == 6
    assert sum(1 for d in kept3 if d < 10) == 3 and sum(1 for d in kept3 if d >= 10) == 3
    # Nested: raising the per-cluster budget only ADDS documents.
    kept5 = {r["doc_id"] for r in cluster_balanced_sample(docs, emb, 5, n_clusters=2).collect()}
    assert set(kept3) <= kept5 and len(kept5) == 10
    # Docs without an embedding row are dropped.
    extra = docs.union(spark.createDataFrame([(99,)], "doc_id long"))
    kept = {r["doc_id"] for r in cluster_balanced_sample(extra, emb, 100, n_clusters=2).collect()}
    assert 99 not in kept and len(kept) == 20
