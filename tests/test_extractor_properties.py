"""Property-based equivalence: the regex-run fast path == the token-loop
reference extractor on ARBITRARY text (hypothesis), and the flat form is a
lossless factoring of the dict form. This is the correctness backstop for
the hot-path rewrite — the corpus tests only cover corpus-shaped text."""

from hypothesis import given, settings
from hypothesis import strategies as st

from graphrag_litex_spark.functions.extract import (
    _extract_turn_ref,
    extract_turn,
    extract_turn_flat,
)

# Alphabet mixes: token chars (incl. Latin-1 upper/lower), separators,
# sentence punctuation, digits, apostrophes/hyphens — adversarial for the
# run regex's boundary handling.
_ALPHABET = (
    "AZazÀÖØÞßàöøÿ09'&- .!?,\t\n;:() 日ä"
)

text_strategy = st.text(alphabet=_ALPHABET, min_size=0, max_size=300)


@given(text_strategy)
@settings(max_examples=500, deadline=None)
def test_fast_path_equals_reference_on_arbitrary_text(text):
    assert extract_turn(text) == _extract_turn_ref(text)


@given(text_strategy)
@settings(max_examples=200, deadline=None)
def test_flat_form_is_lossless(text):
    d = extract_turn(text)
    flat = extract_turn_flat(text)
    if flat is None:
        assert d == {"entities": [], "relationships": [], "claims": []}
        return
    ents, rels, clms = flat
    assert [(e["name"], e["type"], e["description"]) for e in d["entities"]] == ents
    assert [
        (r["source"], r["target"], r["description"], r["strength"])
        for r in d["relationships"]
    ] == rels
    assert [(c["content"], c["entities"]) for c in d["claims"]] == clms
