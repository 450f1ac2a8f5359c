"""LLM summarizer / answerer slots (VERDICT r2 missing #1): fake clients
swapped through both hooks; deterministic defaults unchanged elsewhere."""

import json

import pandas as pd
import pytest
from pyspark.sql import functions as F

from graphrag_litex_spark.functions.llm_extract import (
    LLMExtractorClient,
    ScriptedTransport,
)
from graphrag_litex_spark.functions.llm_generate import (
    coerce_map_answer,
    coerce_summary,
    make_llm_answerer,
    make_llm_summarizer,
)


def _client(transport):
    return LLMExtractorClient(transport, sleep_fn=lambda s: None)


# ---- pure coercion units --------------------------------------------------


def test_coerce_summary_valid_and_clamped():
    got = coerce_summary(
        {
            "title": "T",
            "summary": "S",
            "rating": 42,  # clamped to 10
            "findings": [
                {"summary": "f1", "explanation": "e1"},
                {"not_summary": "dropped"},
            ],
        },
        "c9",
        5,
    )
    assert got == {
        "title": "T",
        "summary": "S",
        "rating": 10.0,
        "findings": [{"summary": "f1", "explanation": "e1"}],
    }


def test_coerce_summary_fallback_shape():
    got = coerce_summary({"error": "Failed to parse response as JSON"}, "c3", 7)
    assert got["title"] == "Community c3"
    assert "7 entities" in got["summary"]
    assert got["rating"] == 5.0
    assert got["findings"][0]["summary"] == "Error in summarization"


def test_coerce_map_answer():
    assert coerce_map_answer({"answer": "A", "helpfulness": 101}) == {
        "answer": "A",
        "helpfulness": 100.0,
    }
    assert coerce_map_answer({"error": "x"}) == {"answer": "", "helpfulness": 0.0}
    assert coerce_map_answer({"helpfulness": "bad"})["helpfulness"] == 0.0


# ---- summarizer through the Spark slot ------------------------------------


@pytest.fixture()
def tiny_graph(spark):
    nodes = spark.createDataFrame(
        pd.DataFrame(
            {"entity_id": ["a", "b", "c", "d"], "name": ["A", "B", "C", "D"]}
        )
    )
    edges = spark.createDataFrame(
        pd.DataFrame(
            [
                ("a", "b", "A", "B", "knows", 0.9, 2),
                ("b", "c", "B", "C", "knows", 0.8, 1),
                ("a", "c", "A", "C", "likes", 0.7, 1),
            ],
            columns=["src_id", "dst_id", "src", "dst", "pred", "strength", "n_obs"],
        )
    )
    return nodes, edges


def test_llm_summarizer_slot(spark, tiny_graph):
    from graphrag_litex_spark.operators import communities as C

    nodes, edges = tiny_graph
    comms = C.detect_communities(nodes, edges, levels=1, min_size=2, lpa_iters=4)
    stats = C.community_stats(comms, edges)

    resp = json.dumps(
        {
            "title": "LLM Title",
            "summary": "LLM Summary",
            "rating": 8.5,
            "findings": [{"summary": "FS", "explanation": "FE"}],
        }
    )
    summarizer = make_llm_summarizer(_client(ScriptedTransport([resp] * 8)))
    out = C.summarize_communities(
        comms, stats, nodes, edges, summarizer=summarizer
    ).collect()
    assert len(out) >= 1
    for r in out:
        assert r["title"] == "LLM Title"
        assert r["rating"] == 8.5
        assert r["findings"][0]["summary"] == "FS"
        assert r["full_text"].startswith("LLM Title LLM Summary FS")
        # stats columns stay column-computed
        assert r["size"] >= 2

    # Failing transport -> per-community structured fallback, no task failure.
    fb = make_llm_summarizer(_client(ScriptedTransport(["fail"] * 40)))
    out_fb = C.summarize_communities(
        comms, stats, nodes, edges, summarizer=fb
    ).collect()
    for r in out_fb:
        assert r["title"].startswith("Community ")
        assert r["rating"] == 5.0


# ---- answerer through the query path --------------------------------------


def routing_transport(map_resp: str, reduce_resp: str, fail_reduce: bool = False):
    """Content-routed fake: map prompts and the reduce prompt get different
    canned responses. A closure (not a test-module class) so cloudpickle
    ships it BY VALUE into the pandas UDF — executors can't import the test
    module."""

    def post(payload: dict) -> str:
        if "PARTIAL ANSWERS" in payload["prompt"]:
            if fail_reduce:
                raise ConnectionError("reduce down")
            return reduce_resp
        return map_resp

    return post


def _summaries_df(spark):
    rows = [
        (0, "c1", "T1", "about acme corp acquisitions", 5.0),
        (0, "c2", "T2", "unrelated botany report", 3.0),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(
            rows, columns=["level", "community_id", "title", "full_text", "rating"]
        )
    )
    return df.withColumn("findings", F.array())


def test_llm_answerer_slot(spark):
    from graphrag_litex_spark.querying.answer import answer_question

    t = routing_transport(
        json.dumps({"answer": "partial", "helpfulness": 60}),
        json.dumps({"answer": "THE FINAL ANSWER"}),
    )
    got = answer_question(
        _summaries_df(spark),
        "who acquired acme corp",
        k=2,
        answerer=make_llm_answerer(_client(t)),
    )
    assert got["answer"] == "THE FINAL ANSWER"
    assert len(got["topics"]) == 2
    assert all(t_["description"] == "partial" for t_ in got["topics"])


def test_llm_answerer_empty_maps_yield_no_answer_envelope(spark):
    from graphrag_litex_spark.querying.answer import NO_ANSWER, answer_question

    t = routing_transport(
        json.dumps({"answer": "", "helpfulness": 0}),
        json.dumps({"answer": "never called"}),
    )
    got = answer_question(
        _summaries_df(spark),
        "anything",
        k=2,
        answerer=make_llm_answerer(_client(t)),
    )
    assert got["answer"] == NO_ANSWER
    assert got["topics"] == []


def test_llm_answerer_reduce_failure_degrades_to_concat(spark):
    from graphrag_litex_spark.querying.answer import answer_question

    t = routing_transport(
        json.dumps({"answer": "partial", "helpfulness": 60}), "", fail_reduce=True
    )
    got = answer_question(
        _summaries_df(spark),
        "who acquired acme corp",
        k=2,
        answerer=make_llm_answerer(_client(t)),
    )
    assert got["answer"] == "partial partial"  # helpfulness-ordered concat
