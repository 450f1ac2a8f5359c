"""TF-IDF units: hand-computed postings, weights, and pair cosines."""

import math

import pandas as pd

from graphrag_litex_spark.operators.tfidf import (
    doc_terms,
    similar_docs,
    term_df,
    tfidf_weights,
)

DOCS = [
    (1, "Apple banana APPLE!"),
    (2, "apple banana cherry"),
    (3, "cherry date"),
    (4, "unique words only here"),
]


def _docs_df(spark):
    return spark.createDataFrame(pd.DataFrame(DOCS, columns=["doc_id", "text"]))


def test_doc_terms_normalizes_and_counts(spark):
    rows = {(r["doc_id"], r["term"]): r["tf"] for r in doc_terms(_docs_df(spark)).collect()}
    assert rows[(1, "apple")] == 2  # case-folded, punctuation stripped
    assert rows[(1, "banana")] == 1
    assert rows[(3, "date")] == 1


def test_tfidf_weights_ln_formula(spark):
    terms = doc_terms(_docs_df(spark))
    w = {
        (r["doc_id"], r["term"]): r["weight"]
        for r in tfidf_weights(terms, n_docs=4).collect()
    }
    assert abs(w[(1, "apple")] - 2 * math.log(4 / 2)) < 1e-12
    assert abs(w[(3, "date")] - 1 * math.log(4 / 1)) < 1e-12


def test_similar_docs_hand_computed(spark):
    # min_df=2 keeps apple/banana/cherry (df=2 each); d4 vanishes.
    # norms: d1=2^2+1=5, d2=3, d3=1.
    # (d1,d2): 2*1+1*1=3 -> 3/sqrt(15); (d2,d3): 1 -> 1/sqrt(3); no (d1,d3).
    out = {(r["doc_a"], r["doc_b"]): r for r in similar_docs(_docs_df(spark)).collect()}
    assert set(out) == {(1, 2), (2, 3)}
    assert out[(1, 2)]["dot"] == 3
    assert out[(1, 2)]["cosine"] == round(3 / math.sqrt(15), 6)
    assert out[(2, 3)]["cosine"] == round(1 / math.sqrt(3), 6)


def test_similar_docs_max_df_valve(spark):
    # max_df=1 drops every shared term -> no candidate pairs at all.
    assert similar_docs(_docs_df(spark), max_df=1).count() == 0


def test_term_df(spark):
    dfs = {r["term"]: r["df"] for r in term_df(doc_terms(_docs_df(spark))).collect()}
    assert dfs["apple"] == 2 and dfs["cherry"] == 2 and dfs["date"] == 1


def test_similar_docs_empty_and_null_text(spark):
    docs = spark.createDataFrame(
        pd.DataFrame([(1, None), (2, ""), (3, "   ")], columns=["doc_id", "text"])
    )
    assert similar_docs(docs).count() == 0
