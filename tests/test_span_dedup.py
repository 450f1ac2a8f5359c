"""Duplicate-span (ExactSubstr-style) stats and removal.

Hand-computed fixtures plus a random-corpus differential vs the pure-Python
golden (oracle_docops.span_stats_golden / span_removal_golden — the same
implementations the driver's DuckDB oracle reads)."""

import pytest
from pyspark.sql import functions as F

from graphrag_litex_spark.operators.span_dedup import (
    duplicate_span_stats,
    remove_duplicate_spans,
)

K = 4

ROWS = [
    (1, "w x y z a b c d tail one here"),  # shares "a b c d" run (first: pos 5)
    (2, "lead two a b c d more stuff"),
    (3, "a b c d"),  # exactly the shared window
    (4, None),
    (5, "   \t "),
    (6, "too short"),
    (7, "self rep self rep self rep self rep self rep"),  # intra-doc repeat
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(ROWS, "doc_id int, text string")


def test_stats_hand_computed(spark, docs):
    got = {
        r["doc_id"]: r.asDict()
        for r in duplicate_span_stats(docs, k=K).collect()
    }
    # doc 3: its single window is duplicated (appears in docs 1, 2, 3).
    assert got[3] == {
        "doc_id": 3,
        "n_tok": 4,
        "n_windows": 1,
        "n_dup_windows": 1,
        "dup_tokens": 4,
        "dup_token_frac": 1.0,
    }
    # docs 1 and 2: one duplicated window of 4 tokens each.
    assert got[1]["n_dup_windows"] == 1 and got[1]["dup_tokens"] == 4
    assert got[2]["n_dup_windows"] == 1 and got[2]["dup_tokens"] == 4
    # doc 7: "self rep self rep ..." — EVERY window repeats intra-doc
    # ((self,rep,self,rep) at 1/3/5/7, (rep,self,rep,self) at 2/4/6); the
    # overlapping windows must be UNION-counted (10 tokens, not 7 * 4).
    assert got[7]["n_dup_windows"] == 7 and got[7]["dup_tokens"] == 10
    assert got[7]["dup_token_frac"] == 1.0
    # null / whitespace-only / short docs: zero windows, zero exposure.
    for d in (4, 5, 6):
        assert got[d]["n_windows"] == 0 and got[d]["dup_tokens"] == 0
        assert got[d]["dup_token_frac"] == 0.0


def test_removal_keeps_globally_first_occurrence(spark, docs):
    got = {r["doc_id"]: r.asDict() for r in remove_duplicate_spans(docs, k=K).collect()}
    # Keeper of "a b c d" is (doc 1, pos 5) — min (doc_id, pos).
    assert got[1]["text"] == "w x y z a b c d tail one here"
    assert got[2]["text"] == "lead two more stuff" and got[2]["removed_tokens"] == 4
    assert got[3]["text"] == "" and got[3]["removed_tokens"] == 4
    # Intra-doc repeats: the first window stays, the overlapping-merged rest
    # goes. Windows at pos 3,5,7 merge to [3,10]; keeper [1,4] overlaps the
    # merged cut only beyond token 2, so "self rep" survives.
    assert got[7]["text"] == "self rep" and got[7]["removed_tokens"] == 8
    # Untouched docs round-trip with whitespace normalized.
    assert got[6]["text"] == "too short" and got[6]["removed_tokens"] == 0
    assert got[4]["text"] == "" and got[5]["text"] == ""


def test_removal_is_idempotent_and_conserves_tokens(spark, docs):
    once = remove_duplicate_spans(docs, k=K)
    # Token conservation: kept + removed == original token count.
    orig = {
        r["doc_id"]: r["n"]
        for r in docs.select(
            "doc_id",
            F.size(F.filter(F.split(F.coalesce("text", F.lit("")), r"\s+"), lambda x: x != "")).alias("n"),
        ).collect()
    }
    for r in once.collect():
        assert r["n_tok"] + r["removed_tokens"] == orig[r["doc_id"]]
    # A second pass finds nothing new to remove at the same k *across docs*
    # (each duplicated window now has exactly one surviving copy).
    twice = remove_duplicate_spans(once, k=K)
    assert twice.agg(F.sum("removed_tokens")).first()[0] == 0


def test_max_occurrences_valve(spark):
    # A boilerplate window repeated in EVERY doc is left in place when its
    # occurrence count exceeds the cap; rarer duplicates are still excised.
    rows = [(i, f"head {i} LEGAL NOTICE ALL RIGHTS RESERVED tail {i}") for i in range(10)]
    rows += [(100, "rare pair a b c d x"), (101, "rare pair a b c d y")]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = {r["doc_id"]: r.asDict() for r in remove_duplicate_spans(df, k=5, max_occurrences=5).collect()}
    assert out[3]["removed_tokens"] == 0  # boilerplate (10 occurrences) spared
    # Doc 101's two shared windows merge to tokens [1,6]: "rare pair a b c d"
    # cut, the distinct tail "y" kept.
    assert out[101]["text"] == "y" and out[101]["removed_tokens"] == 6
    assert out[100]["removed_tokens"] == 0


def test_separator_byte_in_text_cannot_alias_windows(spark):
    """Raw 0x1f (the window-hash separator) embedded in text is split away
    at tokenization, so two docs whose tokens would CONCATENATE identically
    under the old scheme (["x7\\x1fy","z"] vs ["x7","y\\x1fz"]) hash as the
    same token sequence — and a doc whose 0x1f-stripped tokens differ can
    never collide with one that merely contains the byte."""
    rows = [
        (1, "p q x7\x1fy z tail-one extra pad here"),
        (2, "p q x7 y\x1fz tail-two extra pad here"),
        (3, "p q x7y z tail-three extra pad here"),  # no separator: distinct token
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    stats = {r["doc_id"]: r.asDict() for r in duplicate_span_stats(df, k=4).collect()}
    # Docs 1 and 2 tokenize identically (p q x7 y z ...differs later): the
    # shared 5-token prefix duplicates its k=4 windows; doc 3's "x7y" token
    # keeps it clear of both.
    assert stats[1]["n_dup_windows"] == 2 and stats[2]["n_dup_windows"] == 2
    assert stats[3]["n_dup_windows"] == 0
    # And the golden agrees bit-for-bit on separator-bearing text.
    from graphrag_litex_spark.oracle_docops import span_stats_golden

    ids = [r[0] for r in rows]
    texts = [r[1] for r in rows]
    cols = ["doc_id", "n_tok", "n_windows", "n_dup_windows", "dup_tokens", "dup_token_frac"]
    want = sorted(tuple(row[c] for c in cols) for row in span_stats_golden(ids, texts, k=4).to_pylist())
    got = sorted(tuple(r[c] for c in cols) for r in duplicate_span_stats(df, k=4).collect())
    assert got == want


def test_differential_vs_pure_python_golden(spark):
    import random

    import pyarrow as pa

    from graphrag_litex_spark.oracle_docops import span_removal_golden, span_stats_golden

    rng = random.Random(7)
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]
    ids, texts = [], []
    for i in range(60):
        n = rng.randint(0, 25)
        toks = [rng.choice(vocab) for _ in range(n)]
        texts.append(" ".join(toks) if n else rng.choice(["", "  ", None]) or None)
        ids.append(i)
    df = spark.createDataFrame(list(zip(ids, texts)), "doc_id long, text string")

    def tbl(df, cols):
        return sorted(tuple(r[c] for c in cols) for r in df.collect())

    cols = ["doc_id", "n_tok", "n_windows", "n_dup_windows", "dup_tokens", "dup_token_frac"]
    want = sorted(tuple(row[c] for c in cols) for row in span_stats_golden(ids, texts, k=3).to_pylist())
    assert tbl(duplicate_span_stats(df, k=3), cols) == want

    cols2 = ["doc_id", "text", "n_tok", "removed_tokens"]
    want2 = sorted(
        tuple(row[c] for c in cols2) for row in span_removal_golden(ids, texts, k=3).to_pylist()
    )
    assert tbl(remove_duplicate_spans(df, k=3), cols2) == want2
