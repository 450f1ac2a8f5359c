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


# ---- property-based invariants of the pure chunking kernel (hypothesis) ----

from hypothesis import given, settings
from hypothesis import strategies as st

from graphrag_litex_spark.operators.chunking import chunk_windows

_words = st.lists(st.text(alphabet="abcXYZ09", min_size=1, max_size=8), min_size=0, max_size=400)
_sizes = st.integers(min_value=2, max_value=50)
_overlaps = st.integers(min_value=0, max_value=60)


@given(_words, _sizes, _overlaps)
@settings(max_examples=300, deadline=None)
def test_chunks_reconstruct_token_stream(words, size, overlap):
    """Q1-fix invariant: chunk 0 + each later chunk minus its overlap prefix
    reproduces the token stream exactly — every token covered, none twice
    beyond the declared overlap."""
    text = " ".join(words)
    chunks = chunk_windows(text, size, overlap)
    toks = text.split()
    if not toks:
        assert chunks == []
        return
    eff = min(overlap, size // 2)
    rebuilt = []
    for i, ch in enumerate(chunks):
        ctoks = ch.split(" ") if ch else []
        rebuilt.extend(ctoks if i == 0 else ctoks[eff:])
    assert rebuilt == toks


@given(_words, _sizes, _overlaps)
@settings(max_examples=300, deadline=None)
def test_chunk_sizes_and_ids_are_window_shaped(words, size, overlap):
    text = " ".join(words)
    toks = text.split()
    chunks = chunk_windows(text, size, overlap)
    if len(toks) <= size:
        assert chunks == ([" ".join(toks)] if toks else [])
        return
    lens = [len(c.split(" ")) for c in chunks]
    # All full windows except possibly the final partial one.
    assert all(n == size for n in lens[:-1])
    assert 1 <= lens[-1] <= size
    # Window count formula: ceil((n - size) / step) + 1.
    eff = min(overlap, size // 2)
    step = size - eff
    n = len(toks)
    assert len(chunks) == -(-(n - size) // step) + 1


@given(_words, _sizes)
@settings(max_examples=100, deadline=None)
def test_overlap_clamp_matches_half_size(words, size):
    """overlap > size/2 behaves exactly like overlap = size // 2
    (reference text_chunker.py:63)."""
    text = " ".join(words)
    assert chunk_windows(text, size, size) == chunk_windows(text, size, size // 2)


def test_document_corpus_through_full_pipeline(spark, tmp_path):
    """The document-ingestion path end to end: a multi-page document corpus
    chunks into bounded windows and flows through extraction, linking, and
    graph materialization (the first workflow a document-corpus user runs)."""
    from graphrag_litex_spark.plans.pipeline import run_pipeline

    body = (
        "Alice Johnson works at Acme Corp. Acme Corp acquired SkyBeam. "
        "Bob Stone uses QuantumDB. Alice Johnson met Bob Stone. "
    ) * 12  # long enough for several 20-token windows
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "text": [body, "Acme Corp partners with Globex."]})
    )
    tr = chunked_documents_as_transcripts(docs, chunk_size=20, overlap=5)
    src = str(tmp_path / "doc_transcripts")
    tr.write.parquet(src)
    res = run_pipeline(spark, src, str(tmp_path / "kg"), resume=False, until="claims")
    chunks = res["chunks"].collect()
    # chunk grain: every chunk is a bounded window, ids are doc-positional
    assert all(len(r["text"].split()) <= 20 for r in chunks)
    assert {r["chunk_id"] for r in chunks if r["conv_id"] == "2"} == {"2_0"}
    assert res["nodes"].count() > 0 and res["triples"].count() > 0
    names = {r["canonical_name"] for r in res["nodes"].collect()}
    assert "acme corp" in names and "alice johnson" in names


def test_bpe_pretokenizer_chunks_reconstruct_exact_spans(spark):
    """BPE-pretoken windows with joiner '' cover the original text exactly:
    concatenating non-overlap window steps reproduces the document."""
    from graphrag_litex_spark.operators.chunking import (
        bpe_pretokenizer,
        chunk_windows,
    )

    tok = bpe_pretokenizer()
    text = "Dr. O'Neil's  report (v2.1) covers 42 topics — naïve café units."
    toks = tok(text)
    assert "".join(toks) == text  # lossless tokenization
    chunks = chunk_windows(text, chunk_size=5, overlap=2, tokenizer=tok, joiner="")
    assert len(chunks) > 1
    # every chunk is a contiguous substring of the original
    for c in chunks:
        assert c in text
    # non-overlap reconstruction: first chunk + each next chunk minus its
    # 2-token overlap prefix (window starts advance by step = 5 - 2 = 3)
    rebuilt = chunks[0]
    for c, start in zip(chunks[1:], range(3, len(toks), 3)):
        overlap_prefix = "".join(toks[start : start + 2])
        rebuilt += c[len(overlap_prefix):]
    assert rebuilt == text


def test_bpe_chunker_spark_matches_kernel(spark):
    import pandas as pd

    from graphrag_litex_spark.operators.chunking import (
        bpe_pretokenizer,
        chunk_documents_windowed,
        chunk_windows,
    )

    docs = [
        (1, "Short one."),
        (2, "A much longer document, with punctuation! " * 6),
        (3, ""),
    ]
    df = spark.createDataFrame(pd.DataFrame(docs, columns=["doc_id", "text"]))
    got = {
        (r["source_id"], r["n"]): r["text"]
        for r in chunk_documents_windowed(
            df, chunk_size=8, overlap=3, tokenizer=bpe_pretokenizer(), joiner=""
        ).collect()
    }
    tok = bpe_pretokenizer()
    want = {
        (str(i), n): c
        for i, t in docs
        for n, c in enumerate(chunk_windows(t, 8, 3, tok, ""))
    }
    assert got == want
    assert not any(k[0] == "3" for k in got)  # empty doc -> no chunks
