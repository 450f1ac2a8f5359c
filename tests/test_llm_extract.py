"""LLM extractor slot: JSON repair, parse retry, transport backoff
(reference utils/llm_client.py:70-155 semantics) against a fake flaky
server — no Spark needed."""

import json

import pytest

from graphrag_litex_spark.functions.llm_extract import (
    EMPTY_EXTRACTION,
    JSON_SUFFIX,
    RETRY_PREFIX,
    LLMExtractorClient,
    make_llm_extractor,
    repair_json,
)

GOOD = json.dumps(
    {
        "entities": [{"name": "Acme Corp", "type": "ORGANIZATION", "description": "d"}],
        "relationships": [
            {"source": "Acme Corp", "target": "Bob", "description": "works at", "strength": 0.9}
        ],
        "claims": [{"content": "Acme Corp won an award", "entities": ["Acme Corp"]}],
    }
)


class FlakyServer:
    """post_fn with scripted behavior per call."""

    def __init__(self, script):
        self.script = list(script)  # 'fail' | response text
        self.calls = []
        self.sleeps = []

    def post(self, payload):
        self.calls.append(payload)
        action = self.script.pop(0)
        if action == "fail":
            raise ConnectionError("boom")
        return action

    def client(self, **kw):
        kw.setdefault("sleep_fn", self.sleeps.append)
        return LLMExtractorClient(self.post, **kw)


def test_repair_json_slices_first_to_last_brace():
    assert repair_json('noise {"a": 1} trailing') == {"a": 1}
    assert repair_json('pre {"a": {"b": 2}} post') == {"a": {"b": 2}}
    with pytest.raises(json.JSONDecodeError):
        repair_json("no braces at all")


def test_transport_retry_with_backoff():
    srv = FlakyServer(["fail", "fail", GOOD])
    out = srv.client().extract_json("extract this")
    assert out["entities"][0]["name"] == "Acme Corp"
    assert len(srv.calls) == 3
    assert srv.sleeps == [1.0, 2.0]  # expo base 2


def test_transport_gives_up_after_max_tries():
    srv = FlakyServer(["fail"] * 5)
    with pytest.raises(ConnectionError):
        srv.client().extract_json("x")
    assert len(srv.calls) == 5
    assert srv.sleeps == [1.0, 2.0, 4.0, 8.0]


def test_parse_retry_with_simplified_prompt():
    srv = FlakyServer(["this is not json", "wrapped " + GOOD + " output"])
    out = srv.client().extract_json("extract this")
    assert out["claims"][0]["content"] == "Acme Corp won an award"
    # first call: JSON-only suffix; second: simplified retry at temp 0
    assert srv.calls[0]["prompt"].endswith(JSON_SUFFIX)
    assert srv.calls[1]["prompt"].startswith(RETRY_PREFIX)
    assert srv.calls[1]["temperature"] == 0.0


def test_error_envelope_after_double_parse_failure():
    srv = FlakyServer(["garbage", "more garbage " + "x" * 600])
    out = srv.client().extract_json("x")
    assert out["error"] == "Failed to parse response as JSON"
    assert out["raw_response"].endswith("...")
    assert len(out["raw_response"]) == 503  # 500 + '...'


def test_extractor_coercion_and_fallback():
    srv = FlakyServer(
        [
            GOOD,
            json.dumps({"entities": [{"no_name": 1}], "relationships": [{"source": "A", "target": "B", "strength": "5"}]}),
            "garbage",
            "garbage",
        ]
    )
    ex = make_llm_extractor(srv.client())
    good = ex("some text")
    assert good["entities"][0]["type"] == "ORGANIZATION"
    assert good["relationships"][0]["strength"] == 0.9
    weird = ex("other text")
    assert weird["entities"] == []  # nameless entity dropped
    assert weird["relationships"][0]["strength"] == 1.0  # "5" clamped to [0,1]
    failed = ex("third text")
    assert failed == EMPTY_EXTRACTION  # error envelope -> empty (C2 fallback)
    assert ex("") == EMPTY_EXTRACTION


def test_plugs_into_extract_items(spark):
    """The LLM slot drives the same Arrow batch path as the default."""
    import pandas as pd

    from graphrag_litex_spark.functions.llm_extract import ScriptedTransport
    from graphrag_litex_spark.operators.extraction import extract_items

    # importable transport: the extractor closure ships to executors
    # (default time.sleep backoff: one scripted failure costs 1s)
    ex = make_llm_extractor(LLMExtractorClient(ScriptedTransport(["fail", GOOD])))
    chunks = spark.createDataFrame(
        pd.DataFrame({"conv_id": ["c1"], "turn_idx": [0], "text": ["anything"]})
    )
    rows = extract_items(chunks, extractor=ex).collect()
    kinds = sorted(r["kind"] for r in rows)
    assert kinds == ["c", "e", "r"]
    e_row = next(r for r in rows if r["kind"] == "e")
    assert e_row["f1"] == "Acme Corp" and e_row["source_id"] == "c1"
