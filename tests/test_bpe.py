"""Byte-level BPE: training determinism, encoding losslessness, the
Spark==pure differential, JVM/Python pretokenizer parity, and merged-token
windows (reference text_chunker.py window semantics in true subword units).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphrag_litex_spark.functions.bpe import (
    encode_text,
    make_encoder,
    train_bpe,
)
from graphrag_litex_spark.operators.bpe_ops import (
    _pretokenize,
    bpe_tokenize,
    chunk_documents_bpe,
    chunk_windows_bpe,
    pretoken_counts,
    train_bpe_merges,
)

TEXTS = [
    "the cat sat on the mat, the cat sat again",
    "deep learning is learning deeply",
    "naïve café résumé — déjà vu",
    "",
    "aaaa aaaa aaaa bbbb",
    "tool_call(name='search', args={'q': 1})",
    # Unicode whitespace: NBSP / line-sep / ideographic space / vertical tab.
    # `\s` means different sets under Java, RE2, and Python `regex`, so the
    # pattern uses an explicit ASCII class — these rows pin the parity.
    "price:\u00a0 100 and\u2028more\u3000text",  # NBSP / LSEP / ideographic
    "vertical\x0btab and\ttab",
]


def test_train_hand_computed():
    # "aa" appears 4x, "ab" 0x: with words {"aaaa": 3}, first merge must be
    # ("a","a") (count 3 words * 3 adjacent pairs = 9), then ("aa","aa").
    merges = train_bpe([("aaaa", 3)], 2)
    assert merges == [("a", "a"), ("aa", "aa")]
    enc = make_encoder(merges)
    assert enc("aaaa") == ("aaaa",)
    assert enc("aaa") == ("aa", "a")
    assert enc("ab") == ("a", "b")


def test_train_tie_break_deterministic():
    # "ab" and "cd" both count 1 -> lexicographically smallest pair wins.
    merges = train_bpe([("ab", 1), ("cd", 1)], 1)
    assert merges == [("a", "b")]


def test_training_is_deterministic():
    counts = [(t, i + 1) for i, t in enumerate(sorted(set(" ".join(TEXTS).split())))]
    assert train_bpe(counts, 50) == train_bpe(list(counts), 50)


def test_encoding_lossless_bytes():
    counts = {}
    for t in TEXTS:
        for tok in _pretokenize(t):
            counts[tok] = counts.get(tok, 0) + 1
    merges = train_bpe(sorted(counts.items()), 64)
    enc = make_encoder(merges)
    for t in TEXTS:
        toks = encode_text(t, enc, _pretokenize)
        assert "".join(toks).encode("latin-1") == t.encode("utf-8")


def test_merges_reduce_token_count():
    corpus = "the cat sat on the mat " * 50
    counts = {}
    for tok in _pretokenize(corpus):
        counts[tok] = counts.get(tok, 0) + 1
    merged = encode_text(
        corpus, make_encoder(train_bpe(sorted(counts.items()), 64)), _pretokenize
    )
    unmerged = encode_text(corpus, make_encoder([]), _pretokenize)
    assert len(merged) < len(unmerged)
    # frequent words collapse to single tokens (leading space included).
    assert " the" in merged


def test_jvm_pretokenizer_matches_python(spark):
    """regexp_extract_all (Java regex) and the regex module agree on the
    pretoken stream — the invariant pretoken_counts relies on."""
    df = spark.createDataFrame([(t,) for t in TEXTS], ["text"])
    from graphrag_litex_spark.operators.text_analysis import BPE_PRETOKEN_RE

    df_jvm = df.select(
        F.regexp_extract_all("text", F.lit(BPE_PRETOKEN_RE), 0).alias("toks"),
        "text",
    )
    jvm = {r["text"]: r["toks"] for r in df_jvm.collect()}
    for t in TEXTS:
        assert jvm[t] == _pretokenize(t), repr(t)
        # losslessness: pretokens partition the text exactly
        assert "".join(jvm[t]) == t


def test_spark_tokenize_matches_pure(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(TEXTS)], ["i", "text"])
    merges = train_bpe_merges(df, n_merges=64)
    enc = make_encoder(merges)
    got = {
        r["i"]: (r["bpe_tokens"], r["bpe_tokens_count"])
        for r in bpe_tokenize(df, merges).collect()
    }
    for i, t in enumerate(TEXTS):
        want = encode_text(t, enc, _pretokenize)
        assert got[i] == (want, len(want)), f"row {i}"


def test_pretoken_counts_values(spark):
    df = spark.createDataFrame([("a b a",), ("a b",)], ["text"])
    got = {r["pretoken"]: r["count"] for r in pretoken_counts(df).collect()}
    # "a b a" -> ["a", " b", " a"]; "a b" -> ["a", " b"]
    assert got == {"a": 2, " b": 2, " a": 1}


def test_chunk_windows_bpe_semantics():
    merges = train_bpe([("word", 100), (" word", 100)], 8)
    enc = make_encoder(merges)
    assert enc("word") == ("word",) and enc(" word") == (" word",)
    text = " ".join(["word"] * 10)  # 10 single-token words -> 10 tokens
    # fits in one window -> original text verbatim
    assert chunk_windows_bpe(text, enc, chunk_size=10, overlap=4) == [text]
    # window 6 / overlap 2 over 10 tokens: [0:6], [4:10] — tail emitted (Q1)
    chunks = chunk_windows_bpe(text, enc, chunk_size=6, overlap=2)
    assert len(chunks) == 2
    # overlap clamp: overlap 5 of size 6 clamps to 3
    assert chunk_windows_bpe(text, enc, chunk_size=6, overlap=5) == chunk_windows_bpe(
        text, enc, chunk_size=6, overlap=3
    )
    # zero-overlap windows concatenate back to the exact original text
    assert "".join(chunk_windows_bpe(text, enc, chunk_size=3, overlap=0)) == text
    assert chunk_windows_bpe("", enc) == []


def test_chunk_documents_bpe(spark):
    docs = spark.createDataFrame(
        [("d1", "x " * 400), ("d2", "y")], ["doc_id", "text"]
    )
    merges: list = []
    out = chunk_documents_bpe(
        docs, merges, chunk_size=300, overlap=50
    ).collect()
    by_doc: dict = {}
    for r in out:
        by_doc.setdefault(r["source_id"], []).append(r)
    # 400 words -> 800 tokens ("x" + " x"*399 => tokens: "x", then 399 " x")
    # chunk ids are {source_id}_{n}
    assert [r["chunk_id"] for r in by_doc["d1"][:2]] == ["d1_0", "d1_1"]
    assert len(by_doc["d2"]) == 1 and by_doc["d2"][0]["text"] == "y"


@pytest.mark.parametrize("boundary_text", ["héllo wörld çafé " * 200])
def test_multibyte_boundary_never_crashes(boundary_text):
    counts = {}
    for tok in _pretokenize(boundary_text):
        counts[tok] = counts.get(tok, 0) + 1
    enc = make_encoder(train_bpe(sorted(counts.items()), 32))
    for size in (3, 5, 7):
        chunks = chunk_windows_bpe(boundary_text, enc, chunk_size=size, overlap=1)
        assert all(isinstance(c, str) for c in chunks)
