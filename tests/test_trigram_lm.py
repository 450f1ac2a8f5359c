"""Char-trigram LM scoring units: hand-computed counts, novelty fractions,
log-probs, and the external-model path."""

import math

import pandas as pd

from graphrag_litex_spark.operators.text_analysis import (
    char_ngram_occurrences,
    ngram_model,
    trigram_logprob,
    trigram_novelty,
)

# norm_text_col lowercases; all-alnum strings pass through unchanged.
DOCS = [(1, "aaaa"), (2, "aaab"), (3, "xyzq"), (4, "ab")]  # d4 too short


def _docs(spark):
    return spark.createDataFrame(pd.DataFrame(DOCS, columns=["doc_id", "text"]))


def test_occurrences_and_model(spark):
    occ = char_ngram_occurrences(_docs(spark))
    rows = sorted((r["doc_id"], r["gram"]) for r in occ.collect())
    assert rows == [(1, "aaa"), (1, "aaa"), (2, "aaa"), (2, "aab"), (3, "xyz"), (3, "yzq")]
    m = {r["gram"]: r["corpus_n"] for r in ngram_model(occ).collect()}
    assert m == {"aaa": 3, "aab": 1, "xyz": 1, "yzq": 1}


def test_trigram_novelty_hand_computed(spark):
    # threshold 2: aab/xyz/yzq (count 1) rare; aaa (count 3) common.
    out = {r["doc_id"]: r for r in trigram_novelty(_docs(spark), rare_threshold=2).collect()}
    assert set(out) == {1, 2, 3}  # d4 (len<3) excluded
    assert (out[1]["n_grams"], out[1]["n_rare"], out[1]["rare_frac"]) == (2, 0, 0.0)
    assert (out[2]["n_rare"], out[2]["rare_frac"]) == (1, 0.5)
    assert (out[3]["n_rare"], out[3]["rare_frac"]) == (2, 1.0)


def test_trigram_novelty_external_model(spark):
    # Reference model knows only 'aaa': every other gram is rare (count 0).
    model = spark.createDataFrame(pd.DataFrame({"gram": ["aaa"], "corpus_n": [100]}))
    out = {r["doc_id"]: r for r in trigram_novelty(_docs(spark), rare_threshold=2, model=model).collect()}
    assert out[1]["rare_frac"] == 0.0
    assert out[3]["rare_frac"] == 1.0


def test_trigram_logprob_hand_computed(spark):
    # total = 6; d1: both occurrences ln((3+1)/(6+1)).
    out = {r["doc_id"]: r for r in trigram_logprob(_docs(spark)).collect()}
    assert abs(out[1]["mean_logprob"] - round(math.log(4 / 7), 6)) < 1e-9
    # d2: (ln(4/7) + ln(2/7)) / 2
    assert abs(out[2]["mean_logprob"] - round((math.log(4 / 7) + math.log(2 / 7)) / 2, 6)) < 1e-6


def test_novelty_empty_and_null_text(spark):
    docs = spark.createDataFrame(
        pd.DataFrame([(1, None), (2, ""), (3, "ab")], columns=["doc_id", "text"])
    )
    assert trigram_novelty(docs).count() == 0
