"""Query path (C7/G1/G2/J1) + sources + CLI entry."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from graphrag_litex_spark.functions.normalize import hash_embed


@pytest.fixture(scope="module")
def summaries(spark):
    rows = [
        (0, "c1", "Acme Corp", "Community about acme corp acquisitions.", 8.0,
         [{"summary": "acme corp acquired globex inc", "explanation": "x"}],
         "Acme Corp Community about acme corp acquisitions. acme corp acquired globex inc"),
        (0, "c2", "QuantumDB", "Community about quantumdb usage.", 5.0,
         [{"summary": "alice johnson uses quantumdb", "explanation": "y"}],
         "QuantumDB Community about quantumdb usage. alice johnson uses quantumdb"),
        (1, "c3", "Other", "Unrelated level-1 community.", 2.0, [],
         "Other Unrelated level-1 community."),
    ]
    return spark.createDataFrame(
        pd.DataFrame(
            rows,
            columns=["level", "community_id", "title", "summary", "rating", "findings", "full_text"],
        )
    )


def test_hash_embed_deterministic_and_normalized():
    a = hash_embed("acme corp acquired globex")
    b = hash_embed("acme corp acquired globex")
    assert a == b
    norm = sum(v * v for v in a) ** 0.5
    assert abs(norm - 1.0) < 1e-9
    assert hash_embed("") == [0.0] * 64


def test_select_top_k_level_filter(summaries):
    from graphrag_litex_spark.querying.answer import embed_summaries, select_top_k

    emb = embed_summaries(summaries)
    top = select_top_k(emb, "who acquired acme corp", level=0, k=10).collect()
    assert all(r["level"] == 0 for r in top)
    # The acme community must outrank the quantumdb one for an acme question.
    assert top[0]["community_id"] == "c1"
    assert top[0]["score"] >= top[-1]["score"]


def test_answer_question_shape(summaries):
    from graphrag_litex_spark.querying.answer import answer_question

    ans = answer_question(summaries, "who acquired acme corp", level=0, k=5)
    assert "acme corp acquired globex inc" in ans["answer"]
    assert ans["topics"][0]["topic"] == "Acme Corp"
    assert ans["used_communities"][0] == "c1"
    # helpfulness sorted descending
    hs = [t["helpfulness"] for t in ans["topics"]]
    assert hs == sorted(hs, reverse=True)


def test_documents_as_transcripts_adapter(spark):
    from graphrag_litex_spark.sources.tables import documents_as_transcripts, read_transcripts

    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [10, 11], "text": ["Acme Corp acquired Globex Inc.", "x"]})
    )
    tr = documents_as_transcripts(docs)
    assert tr.columns == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    assert tr.count() == 2


def test_read_transcripts_validates_schema(spark, corpus_sf0001, tmp_path):
    from graphrag_litex_spark.sources.tables import read_transcripts

    df = read_transcripts(spark, corpus_sf0001["transcripts"])
    assert df.count() > 0
    bad = df.drop("turn_idx")
    p = str(tmp_path / "bad")
    bad.write.parquet(p)
    with pytest.raises(ValueError, match="turn_idx"):
        read_transcripts(spark, p)


def test_cli_build_graph(spark, corpus_sf0001, tmp_path, capsys):
    import jobs.build_graph as job

    rc = job.main(
        [
            "--transcripts",
            corpus_sf0001["transcripts"],
            "--output",
            str(tmp_path / "kg"),
            "--until",
            "triples",
        ]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "stage triples: written" in out


def test_sql_views(spark, corpus_sf0001, tmp_path):
    from graphrag_litex_spark.plans.pipeline import run_pipeline
    from graphrag_litex_spark.sql import register_graph_views

    res = run_pipeline(spark, corpus_sf0001["transcripts"], str(tmp_path / "kg"),
                       resume=True, until="triples")
    names = register_graph_views(spark, res)
    assert "kg_triples" in names
    rows = spark.sql(
        "SELECT subj, count(*) AS n FROM kg_triples GROUP BY subj ORDER BY n DESC LIMIT 3"
    ).collect()
    assert len(rows) == 3 and rows[0]["n"] >= rows[-1]["n"]


def test_table_identifier_ingestion(spark, corpus_sf0001, tmp_path):
    """table:<identifier> input path — catalog-table (Iceberg-shaped)
    ingestion exercised via a temp view; the full pipeline runs from it."""
    from graphrag_litex_spark.plans.pipeline import run_pipeline
    from graphrag_litex_spark.sources.tables import read_transcripts

    spark.read.parquet(corpus_sf0001["transcripts"]).createOrReplaceTempView(
        "transcripts_v"
    )
    df = read_transcripts(spark, "table:transcripts_v")
    assert df.columns[:2] == ["conv_id", "turn_idx"]
    res = run_pipeline(
        spark, "table:transcripts_v", str(tmp_path / "kg_tbl"), resume=False,
        until="canon_map",
    )
    assert res["canon_map"].count() == 60


def test_batch_select_equals_single(summaries):
    """select_top_k_batch == N independent select_top_k calls (D7 batch)."""
    from graphrag_litex_spark.querying.answer import (
        embed_summaries,
        select_top_k,
        select_top_k_batch,
    )

    emb = embed_summaries(summaries)
    questions = ["who acquired acme corp", "who uses quantumdb", "unrelated topic words"]
    batch = select_top_k_batch(emb, questions, level=0, k=2).collect()
    got = {}
    for r in batch:
        got.setdefault(r["question_id"], []).append((r["community_id"], r["score"]))
    for i, q in enumerate(questions):
        single = [
            (r["community_id"], r["score"])
            for r in select_top_k(emb, q, level=0, k=2).collect()
        ]
        assert got.get(i, []) == single, q


def test_answer_questions_batch_equals_single(summaries):
    """answer_questions (one Spark pass) == answer_question per question,
    for alphanumeric questions (tokenizations agree)."""
    from graphrag_litex_spark.querying.answer import answer_question, answer_questions

    questions = ["who acquired acme corp", "who uses quantumdb"]
    batch = answer_questions(summaries, questions, level=0, k=2)
    singles = [answer_question(summaries, q, level=0, k=2) for q in questions]
    assert batch == singles
    assert batch[0]["used_communities"] and batch[0]["answer"]


def test_precomputed_summary_embeddings_skip_embed_udf(
    spark, summaries, tmp_path, monkeypatch
):
    """Query serving must not re-run the embedding UDF per question: with a
    precomputed summary_embeddings frame the plan is UDF-free and
    embed_summaries is never called."""
    from graphrag_litex_spark.querying import answer as A

    emb_path = str(tmp_path / "summary_embeddings")
    A.embed_summaries(summaries).write.parquet(emb_path)
    emb = spark.read.parquet(emb_path)

    # retrieval plan over the materialized table contains no Python eval
    plan = (
        A.select_top_k(emb, "who acquired acme corp", level=0, k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan

    want = A.answer_question(summaries, "who acquired acme corp", level=0, k=5)

    def boom(*a, **k):
        raise AssertionError("embed_summaries must not run with precomputed table")

    monkeypatch.setattr(A, "embed_summaries", boom)
    got = A.answer_question(
        None, "who acquired acme corp", level=0, k=5, summary_embeddings=emb
    )
    assert got == want
    got_batch = A.answer_questions(
        None, ["who acquired acme corp"], level=0, k=5, summary_embeddings=emb
    )
    assert got_batch[0]["used_communities"] == want["used_communities"]


def test_pipeline_materializes_summary_embeddings(pipeline_sf0001):
    emb = pipeline_sf0001["summary_embeddings"]
    assert "embedding" in emb.columns and emb.count() > 0
    row = emb.select("embedding").first()
    assert len(row["embedding"]) == 64


def test_rerank_by_overlap_default_and_slot(spark):
    """Default scorer: hand-computed token-set Jaccard micro-units with
    deterministic tie-break; scorer_udf slot replaces the score column."""
    import pandas as pd
    from pyspark.sql import functions as F

    from graphrag_litex_spark.querying.answer import rerank_by_overlap

    rows = [
        ("c1", "Acme Corp was ACQUIRED!", 0.9),   # toks {acme,corp,was,acquired}
        ("c2", "weather is nice", 0.8),           # no overlap
        ("c3", "who acquired acme corp", 0.7),    # exact token set
        ("c4", "", 0.6),                          # empty text
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["chunk_id", "text", "chunk_score"])
    )
    q = "who acquired acme corp"
    got = {
        r["chunk_id"]: (r["rerank_micro"], r["rerank_rnk"])
        for r in rerank_by_overlap(df, q, k=4).collect()
    }
    # c3: 4/4 -> 1_000_000; c1: {acme,corp,acquired} inter=3 union=5 -> 600_000
    # c2: 0/7 -> 0; c4: union=4 (question only) inter=0 -> 0; tie c2<c4 by id
    assert got["c3"] == (1_000_000, 1)
    assert got["c1"] == (3 * 1_000_000 // 5, 2)
    assert got["c2"] == (0, 3)
    assert got["c4"] == (0, 4)

    # cross-encoder slot: any text->double UDF takes over scoring
    fake = F.pandas_udf(lambda s: s.str.len().astype("float64"), "double")
    top = rerank_by_overlap(df, q, k=1, scorer_udf=fake).collect()[0]
    assert top["chunk_id"] == "c1"  # longest text wins under the fake scorer
