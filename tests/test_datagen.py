"""Corpus determinism + schema (BASELINE input_hint shape, FIXTURES.md §1)."""

import pyarrow.parquet as pq

from graphrag_litex_spark import datagen


def test_conversation_generation_is_pure():
    a = datagen.generate_conversation(7)
    b = datagen.generate_conversation(7)
    assert a == b
    c = datagen.generate_conversation(8)
    assert c != a


def test_schema_matches_input_hint(corpus_sf0001):
    import glob
    import os

    first = sorted(glob.glob(os.path.join(corpus_sf0001["transcripts"], "*.parquet")))[0]
    schema = pq.read_schema(first)
    fields = {f.name: str(f.type) for f in schema}
    assert fields == {
        "conv_id": "string",
        "turn_idx": "int32",
        "role": "string",
        "text": "string",
        "tool": "string",
        "ts": "timestamp[us, tz=UTC]",
    }


def test_turn_idx_dense_and_unique(corpus_sf0001):
    t = pq.read_table(corpus_sf0001["transcripts"]).to_pandas()
    for conv_id, grp in t.groupby("conv_id"):
        idx = sorted(grp["turn_idx"])
        assert idx == list(range(len(idx))), conv_id
        assert 8 <= len(idx) <= 64


def test_rows_are_shuffled(corpus_sf0001):
    t = pq.read_table(corpus_sf0001["transcripts"]).to_pandas()
    # If rows were emitted in generation order this would be sorted.
    assert not t["conv_id"].is_monotonic_increasing


def test_ts_monotonic_within_conversation(corpus_sf0001):
    t = pq.read_table(corpus_sf0001["transcripts"]).to_pandas()
    for conv_id, grp in t.groupby("conv_id"):
        g = grp.sort_values("turn_idx")
        assert g["ts"].is_monotonic_increasing, conv_id


def test_hot_entities_present(corpus_sf0001):
    """A few hot entities appear in >10% of turns (skew clause)."""
    t = pq.read_table(corpus_sf0001["transcripts"]).to_pandas()
    share = t["text"].str.lower().str.contains("acme").mean()
    assert share > 0.10
