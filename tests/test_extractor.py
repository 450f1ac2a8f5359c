"""Unit tests for the deterministic extractor (C1/C4 semantics)."""

from graphrag_litex_spark.functions.extract import extract_turn


def test_triple_sentence():
    res = extract_turn("Alice Johnson works at Acme Corp.")
    names = {e["name"] for e in res["entities"]}
    assert names == {"Alice Johnson", "Acme Corp"}
    assert res["relationships"] == [
        {
            "source": "Alice Johnson",
            "target": "Acme Corp",
            "description": "works at",
            "strength": 0.9,
        }
    ]


def test_entity_types():
    res = extract_turn("Alice Johnson uses QuantumDB. Acme Corp located in Gotham City.")
    types = {e["name"]: e["type"] for e in res["entities"]}
    assert types["Alice Johnson"] == "PERSON"
    assert types["QuantumDB"] == "PRODUCT"
    assert types["Acme Corp"] == "ORGANIZATION"
    assert types["Gotham City"] == "LOCATION"


def test_same_sentence_constraint():
    # Entities in different sentences never form a relationship
    # (stricter than the reference's same-chunk rule, SURVEY Q7).
    res = extract_turn("Alice Johnson was discussed. Acme Corp was discussed.")
    assert res["relationships"] == []
    assert len(res["entities"]) == 2


def test_unknown_predicate_no_relationship():
    res = extract_turn("Alice Johnson admires Acme Corp.")
    assert res["relationships"] == []
    assert len(res["entities"]) == 2


def test_trailing_words_ignored():
    res = extract_turn("Acme Corp acquired Globex Inc for an undisclosed sum.")
    assert res["relationships"][0]["description"] == "acquired"
    assert res["relationships"][0]["strength"] == 0.95


def test_claim_extraction():
    res = extract_turn("Acme Corp reported strong quarterly results.")
    assert res["claims"] == [
        {
            "content": "Acme Corp reported strong quarterly results",
            "entities": ["Acme Corp"],
        }
    ]
    assert res["relationships"] == []


def test_low_strength_predicates_extracted():
    # Filtering happens downstream (graph build), not at extraction
    # (reference: simple_graph_builder.py:83-86 filters at insert).
    res = extract_turn("Alice Johnson visited Gotham City.")
    assert res["relationships"][0]["strength"] == 0.4


def test_filler_only():
    res = extract_turn("the quarterly report was reviewed and approved.")
    assert res == {"entities": [], "relationships": [], "claims": []}
    assert extract_turn("") == {"entities": [], "relationships": [], "claims": []}


def test_description_is_sentence():
    res = extract_turn("Alice Johnson works at Acme Corp.")
    assert all(e["description"] == "Alice Johnson works at Acme Corp" for e in res["entities"])


def test_diacritic_and_case_variants_detected():
    res = extract_turn("Ácme Corp partners with ACME-CORP.")
    assert {e["name"] for e in res["entities"]} == {"Ácme Corp", "ACME-CORP"}
    assert res["relationships"][0]["description"] == "partners with"


def test_multi_sentence_multiple_triples():
    res = extract_turn(
        "Acme Corp acquired Globex Inc. Bob Smithers leads Initech Ltd earlier this year."
    )
    assert len(res["relationships"]) == 2
    preds = {r["description"] for r in res["relationships"]}
    assert preds == {"acquired", "leads"}


def test_fast_path_equivalent_to_token_loop():
    """The regex-run fast path (extract_turn) must produce IDENTICAL output
    to the original token-loop formulation on corpus + adversarial text."""
    from graphrag_litex_spark import datagen
    from graphrag_litex_spark.functions.extract import _extract_turn_ref, extract_turn

    texts = [r["text"] for c in range(300) for r in datagen.generate_conversation(c)]
    texts += [
        "", "x3Acme works at Globex", "ÁcmeCorp acquired Ün-ïted Ltd",
        "ß lower But Acme-Corp's Q3", "A", "A B C", "a b c", "3M works at IBM",
        "Acme, Bob & Carol visited Gotham City!", "Øystein Ågård works at Æther Labs",
        "þorn Þorn lower þ upper Þ", "Trailing Acme",
        "Acme...   multiple   spaces Bob", "O'Brien & Sons-Ltd leads D'Arcy",
        "Acme works at Acme", "123 Numbers 456 Acme 789",
    ]
    for t in texts:
        assert extract_turn(t) == _extract_turn_ref(t)


def test_extract_turn_flat_matches_dict_shape():
    from graphrag_litex_spark.functions.extract import extract_turn, extract_turn_flat

    text = "Alice Johnson works at Acme Corp. Acme Corp won an industry award."
    flat = extract_turn_flat(text)
    d = extract_turn(text)
    assert [e["name"] for e in d["entities"]] == [e[0] for e in flat[0]]
    assert [(r["source"], r["target"], r["description"], r["strength"]) for r in d["relationships"]] == flat[1]
    assert [(c["content"], c["entities"]) for c in d["claims"]] == flat[2]
    assert extract_turn_flat("") is None
    assert extract_turn_flat("no capitals here at all.") is None
