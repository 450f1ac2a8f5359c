"""H2 normalization parity: the JVM column expression must match the pure
Python NFKD normalizer (reference semantics, entity_resolver.py:14-20)."""

import pandas as pd
from pyspark.sql import functions as F

from graphrag_litex_spark.functions.normalize import (
    blocking_key,
    char_ngrams,
    jaccard,
    name_similarity,
    normalize_name,
)
from graphrag_litex_spark.operators.normalize_ops import char_ngrams_col, norm_name_col

CASES = [
    "Acme Corp",
    "ACME-CORP",
    "Ácme corp",
    "Dunder Mifflin Incorporated",
    "FlúxCapacitor",
    "  spaced   out  ",
    "123 Numbers & Symbols!!",
    "Ünïcödé Nâmé",
    "ÀÉÎÕÜ test",
    "plain",
    "",
]


def test_python_normalizer_reference_semantics():
    assert normalize_name("Acme Corp") == "acme corp"
    assert normalize_name("ACME-CORP") == "acme corp"
    assert normalize_name("Ácme corp") == "acme corp"
    assert normalize_name("  A  B  ") == "a b"
    assert normalize_name("Café-Bar!") == "cafe bar"


def test_sql_normalizer_matches_python(spark):
    df = spark.createDataFrame(pd.DataFrame({"name": CASES}))
    got = {
        r["name"]: r["norm"]
        for r in df.withColumn("norm", norm_name_col("name")).collect()
    }
    for c in CASES:
        assert got[c] == normalize_name(c), c


def test_sql_normalizer_matches_python_on_latin1_sweep(spark):
    # Every Latin-1 + Latin-Extended-A char embedded in a name.
    names = [f"X{chr(cp)}y Corp" for cp in range(0xC0, 0x180)]
    df = spark.createDataFrame(pd.DataFrame({"name": names}))
    got = {r["name"]: r["norm"] for r in df.withColumn("norm", norm_name_col("name")).collect()}
    mismatches = [n for n in names if got[n] != normalize_name(n)]
    # NFKD-indecomposable chars (æ ð ø þ đ ħ ...) are documented divergences
    # (Python deletes them, SQL treats them as a token break); everything
    # decomposable must match exactly.
    for n in names:
        if got[n] != normalize_name(n):
            import unicodedata

            ch = n[1]
            folded = unicodedata.normalize("NFKD", ch).encode("ascii", "ignore").decode()
            # Allowed divergences: chars that don't fold 1:1 to ASCII —
            # indecomposables (æ ð ø þ), multi-char expansions (Ĳ -> ij),
            # multi-codepoint lowercases ('İ' -> 'i' + dot).
            assert len(folded) != 1 or len(ch.lower()) != 1, (
                f"1:1-foldable char {ch!r} diverged: {got[n]!r}"
            )
    assert len(mismatches) < 30  # only the documented tail


def test_sql_ngrams_match_python(spark):
    vals = ["acme corp", "ab", "", "x", "hello world"]
    df = spark.createDataFrame(pd.DataFrame({"n": [v for v in vals if v]}))
    rows = df.withColumn("g", char_ngrams_col("n")).collect()
    for r in rows:
        assert set(r["g"]) == char_ngrams(r["n"]), r["n"]


def test_similarity_thresholds():
    # Variant pairs that MUST link.
    assert name_similarity("acme corp", "acme corporation") >= 0.40
    assert name_similarity("hooli inc", "hooli incorporated") >= 0.40
    assert name_similarity("initech ltd", "initech limited") >= 0.40
    # Distinct same-block names that must NOT link.
    assert name_similarity("acme corp", "acme labs") < 0.40
    # Different blocks are never compared, but sanity-check scores anyway.
    assert name_similarity("stark industries", "wonka industries") < 0.52


def test_blocking_key():
    assert blocking_key("acme corp") == "acme"
    assert blocking_key("plain") == "plain"
    assert blocking_key("") == ""
    assert jaccard(set(), set()) == 1.0
