"""B1 token-window chunker: boundary semantics (reference
extraction/text_chunker.py:54-115 with the SURVEY Q1 tail fix)."""

import pandas as pd

from graphrag_litex_spark.operators.chunking import (
    chunk_documents_windowed,
    chunk_windows,
    chunked_documents_as_transcripts,
)


def toks(n):
    return " ".join(f"t{i}" for i in range(n))


def test_empty_and_single_chunk():
    assert chunk_windows("") == []
    assert chunk_windows("   ") == []
    assert chunk_windows("a b c", chunk_size=5, overlap=2) == ["a b c"]
    # exactly chunk_size -> one chunk
    assert chunk_windows(toks(5), chunk_size=5, overlap=2) == [toks(5)]


def test_overlap_clamped_to_half_size():
    # overlap 100 with size 10 clamps to 5 (text_chunker.py:63): step = 5
    out = chunk_windows(toks(20), chunk_size=10, overlap=100)
    assert out[0].split()[0] == "t0" and out[1].split()[0] == "t5"


def test_q1_tail_is_emitted():
    # reference quirk: size 600/overlap 100 over 1500 tokens dropped tokens
    # 1100-1500; scaled down (size 6, overlap 1, 15 tokens): windows at
    # 0,5,10 — the FIXED chunker emits the final partial window.
    out = chunk_windows(toks(15), chunk_size=6, overlap=1)
    covered = {t for c in out for t in c.split()}
    assert covered == set(toks(15).split())
    assert out[-1] == "t10 t11 t12 t13 t14"


def test_every_token_covered_and_window_shape():
    n, size, ov = 1500, 600, 100
    out = chunk_windows(toks(n), chunk_size=size, overlap=ov)
    step = size - ov
    assert [c.split()[0] for c in out] == [f"t{i*step}" for i in range(len(out))]
    assert all(len(c.split()) <= size for c in out)
    covered = {t for c in out for t in c.split()}
    assert len(covered) == n
    # consecutive windows overlap by exactly `ov` (except possibly the tail)
    first, second = out[0].split(), out[1].split()
    assert first[-ov:] == second[:ov]


def test_exact_multiple_boundary():
    # n - size divisible by step: last window ends exactly at n, no extra
    out = chunk_windows(toks(16), chunk_size=6, overlap=1)  # step 5: 0,5,10
    assert len(out) == 3
    assert out[-1].split()[-1] == "t15"


def test_spark_windowed_chunking(spark):
    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": [toks(15), "short doc", ""],
            }
        )
    )
    rows = chunk_documents_windowed(
        docs, chunk_size=6, overlap=1
    ).orderBy("source_id", "n").collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["source_id"], []).append(r)
    assert [r["text"] for r in by_doc["1"]] == chunk_windows(toks(15), 6, 1)
    assert [r["chunk_id"] for r in by_doc["1"]] == ["1_0", "1_1", "1_2"]
    assert [r["text"] for r in by_doc["2"]] == ["short doc"]
    assert "3" not in by_doc  # empty doc -> no chunks (text_chunker.py:86-88)


def test_chunked_ingest_shape(spark):
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [7], "text": [toks(15)]})
    )
    tr = chunked_documents_as_transcripts(docs, chunk_size=6, overlap=1)
    assert tr.columns == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    got = tr.orderBy("turn_idx").collect()
    assert [r["turn_idx"] for r in got] == [0, 1, 2]
    assert got[0]["conv_id"] == "7"
