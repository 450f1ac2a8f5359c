"""Corpus-curation job (jobs/curate.py): the filter -> exact-dedup ->
near-dedup composition over the toolbox operators, with report accounting
checked against hand-planted duplicates."""

from __future__ import annotations

import json

import pytest

BASE = (
    "the quick brown fox jumps over the lazy dog while the other animals "
    "watch from the field and the sun is high in the clear blue sky today"
)


@pytest.fixture(scope="module")
def raw_docs(spark):
    rows = [
        ("a", BASE),
        # near-duplicate of a: one word changed -> high shingle Jaccard
        ("b", BASE.replace("blue sky", "grey sky")),
        # normalized-exact duplicate of a (case + punctuation + whitespace)
        ("c", "The  quick BROWN fox, jumps over the lazy dog while the "
              "other animals watch from the field and the sun is high in "
              "the clear blue sky today!"),
        # distinct keeper-worthy document
        ("d", "completely different content about spark pipelines and the "
              "aggregation of token statistics across many distributed "
              "partitions with careful shuffle management in the engine"),
        # low quality: punctuation soup, filtered by min_quality
        ("e", "!!! ??? !!! ??? !!!"),
        # German: filtered by the lang allowlist
        ("f", "der hund und die katze sind nicht mit dem vogel zu sehen "
              "und das ist ein gutes beispiel den satz zu verlaengern"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_curate_end_to_end(spark, raw_docs):
    from jobs.curate import curate

    curated, report = curate(
        spark,
        raw_docs,
        langs=["en"],
        min_quality=0.3,
        min_tokens=5,
        jaccard_threshold=0.6,
    )
    kept = sorted(r["doc_id"] for r in curated.select("doc_id").collect())
    # e fails quality, f fails lang; c collapses into a (exact), b into a (near)
    assert kept == ["a", "d"]
    assert report["docs_in"] == 6
    assert report["docs_after_filter"] == 4  # a b c d
    assert report["exact_dups_removed"] == 1  # c
    assert report["near_dups_removed"] == 1  # b
    assert report["docs_out"] == 2
    assert report["tokens_in"] > report["tokens_after_filter"]
    # annotation columns survive for downstream stratified sampling
    assert {"lang_pred", "quality_score", "n_tokens"} <= set(curated.columns)


def test_curate_no_near_dedup_valve(spark, raw_docs):
    from jobs.curate import curate

    curated, report = curate(
        spark, raw_docs, langs=["en"], min_quality=0.3, near_dedup=False
    )
    kept = sorted(r["doc_id"] for r in curated.select("doc_id").collect())
    assert kept == ["a", "b", "d"]  # near-dup b survives, exact-dup c does not
    assert report["near_dups_removed"] == 0


def test_curate_scrub_stages(spark):
    """Boilerplate strip + PII redaction + repetition gate, end to end."""
    from jobs.curate import curate

    footer = "Subscribe to our newsletter for more updates and offers."
    rows = [
        ("a", "the quick brown fox jumps over the lazy dog in the field "
              f"and that is the whole story of the day. {footer}"),
        ("b", "a different document with plenty of distinct words that "
              f"should pass every quality filter in the stack here. {footer}"),
        ("c", "contact me at alice@example.com or call 555-123-4567 for "
              f"the details of the plan we discussed earlier today. {footer}"),
        # repetition bomb: one word dominates -> Gopher gate drops it
        ("r", "spam " * 40 + "and a few other words here"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    curated, report = curate(
        spark,
        docs,
        near_dedup=False,
        boilerplate_min_frac=0.5,
        pii_redact=True,
        max_top_word_frac=0.5,
    )
    kept = {r["doc_id"]: r["text"] for r in curated.select("doc_id", "text").collect()}
    assert sorted(kept) == ["a", "b", "c"]  # r dropped by the repetition gate
    assert report["boilerplate_segments"] == 1
    for t in kept.values():
        assert "Subscribe to our newsletter" not in t
    assert "<EMAIL>" in kept["c"] and "<PHONE>" in kept["c"]
    assert report["pii_docs"] == 1 and report["pii_redactions"] == 2
    assert report["filters"]["max_top_word_frac"] == 0.5


def test_curate_cli(spark, raw_docs, tmp_path):
    from jobs import curate as job

    src = str(tmp_path / "docs")
    out = str(tmp_path / "curated")
    raw_docs.write.parquet(src)
    rc = job.main(
        ["--docs", src, "--out", out, "--langs", "en", "--min-quality", "0.3"]
    )
    assert rc == 0
    with open(f"{out}/report.json") as fh:
        report = json.load(fh)
    assert report["docs_out"] == 2
    assert 0 < report["tokens_out"] <= report["tokens_after_filter"]
    docs = spark.read.parquet(f"{out}/documents")
    assert docs.count() == 2


def test_curate_holdout_decontamination(spark):
    """--holdout: candidate docs that leak the eval corpus are dropped."""
    from jobs.curate import curate

    leaked = ("the held out benchmark question about distributed joins and "
              "its exact answer text that must never be trained on")
    rows = [
        ("clean", "a perfectly ordinary training document with plenty of "
                  "distinct words about data pipelines and storage formats"),
        ("leak", leaked + " plus a tiny bit of extra text"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    holdout = spark.createDataFrame([("h1", leaked)], ["doc_id", "text"])
    curated, report = curate(
        spark, docs, near_dedup=False, holdout=holdout, max_contamination=0.2
    )
    kept = {r["doc_id"] for r in curated.select("doc_id").collect()}
    assert kept == {"clean"}
    assert report["contaminated_removed"] == 1


def test_curate_source_and_novelty_gates(spark):
    """Domain-reputation gate drops a whole junk source; the LM-novelty
    gate drops a gibberish doc from a good source."""
    from jobs.curate import curate

    good = (
        "the quick brown fox jumps over the lazy dog and that is the "
        "whole story of the day with many common words in it"
    )
    rows = [
        ("1", good + " one", "siteA"),
        ("2", good + " two", "siteA"),
        # gibberish: unique trigram soup, but from the good source
        ("3", "qzv xkw jqp zzf vvq wqx kkz pzv qqw xxj zqk vpw", "siteA"),
        # junk source: both docs score terribly -> whole source gated
        ("4", "!!!???;;;", "siteB"),
        ("5", "ZZZZ!!!! ????", "siteB"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    curated, report = curate(
        spark,
        docs,
        near_dedup=False,
        min_source_quality=0.3,
        max_trigram_novelty=0.8,
        trigram_rare_threshold=2,
    )
    kept = sorted(r["doc_id"] for r in curated.select("doc_id").collect())
    assert kept == ["1", "2"]
    assert report["low_reputation_sources"] == 1
    assert report["novelty_removed"] == 1


def test_curate_model_quality_gate(spark, raw_docs):
    """The fastText-style classifier gate: with an adversarial weight table
    that assigns every bucket -1, every doc scores logit -1 and a cutoff of
    0 removes them all; with +1 weights nothing is removed — and the report
    carries the per-stage count."""
    from pyspark.sql import functions as F

    from jobs.curate import curate

    all_neg = spark.range(1 << 10).select(
        F.col("id").alias("bucket"), F.lit(-1).cast("long").alias("weight")
    )
    curated, report = curate(
        spark,
        raw_docs,
        min_model_logit=0.0,
        model_weights=all_neg,
        model_buckets=1 << 10,
        near_dedup=False,
    )
    assert curated.count() == 0 and report["model_filtered"] == 6

    all_pos = all_neg.withColumn("weight", F.lit(1).cast("long"))
    curated, report = curate(
        spark,
        raw_docs,
        min_model_logit=0.0,
        model_weights=all_pos,
        model_buckets=1 << 10,
        near_dedup=False,
    )
    assert report["model_filtered"] == 0 and curated.count() > 0


def test_curate_semantic_dedup_catches_paraphrases(spark):
    """Two docs with DISJOINT surface forms (lexical dedup can't see them)
    but identical precomputed embeddings: the SemDeDup stage removes one,
    and near_dups_removed stays 0 (the accounting is not conflated)."""
    from jobs.curate import curate

    rows = [
        ("p1", "the cat sat on the mat in the little red house", [1.0, 0.0, 0.0, 0.0]),
        ("p2", "ein kleines rotes haus mit einer katze auf der matte", [1.0, 0.0, 0.0, 0.0]),
        ("q", "completely unrelated text about distributed query engines", [0.0, 1.0, 0.0, 0.0]),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "emb"])
    curated, report = curate(
        spark,
        docs,
        semantic_dedup_threshold=0.99,
        semantic_clusters=2,
        embedding_col="emb",
    )
    kept = sorted(r["doc_id"] for r in curated.select("doc_id").collect())
    assert len(kept) == 2 and "q" in kept and report["semantic_dups_removed"] == 1
    assert report["near_dups_removed"] == 0


def test_curate_mixture_budgets(spark):
    """--mixture: per-source token budgets after dedup; unlisted sources
    dropped, report carries the accounting."""
    import pandas as pd

    from jobs.curate import curate

    rows = []
    for i in range(6):
        rows.append((f"w{i}", "web", f"unique web document number {i} with plenty of words here"))
    for i in range(6):
        rows.append((f"c{i}", "code", f"unique code document number {i} with plenty of words here"))
    docs = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "source", "text"]))
    curated, report = curate(
        spark, docs, near_dedup=False, mixture_budgets={"web": 20}
    )
    out = curated.select("doc_id", "source", "n_tokens").collect()
    assert all(r["source"] == "web" for r in out)
    assert sum(r["n_tokens"] for r in out) <= 20
    assert report["mixture_removed"] == 12 - len(out)
    assert report["mixture_budgets"] == {"web": 20}


def test_curate_span_dedup_stage(spark):
    """--remove-dup-spans: a verbatim passage shared by two otherwise-
    distinct docs is excised from the non-keeper; token accounting and the
    emptied-doc gate hold."""
    from jobs.curate import curate

    passage = "the shared boilerplate passage that appears verbatim in two documents here"
    rows = [
        ("p1", f"unique intro alpha beta gamma delta. {passage}"),
        ("p2", f"{passage} entirely different tail words epsilon zeta eta theta"),
        ("p3", "independent document content with no duplicated spans anywhere "
               "at all in the corpus to be found"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    curated, report = curate(
        spark,
        docs,
        min_quality=0.0,
        min_tokens=1,
        near_dedup=False,
        remove_dup_spans_k=6,
    )
    out = {r["doc_id"]: r["text"] for r in curated.select("doc_id", "text").collect()}
    assert passage in out["p1"]  # keeper: global min (doc_id, pos) lands in p1
    assert passage not in out["p2"]
    assert "epsilon zeta eta theta" in out["p2"]
    assert out["p3"].startswith("independent document")
    assert report["span_tokens_removed"] >= 11
    assert report["span_emptied_docs"] == 0
    assert report["dup_span_k"] == 6
    # n_tokens recomputed from the rewritten text
    toks = {r["doc_id"]: r["n_tokens"] for r in curated.select("doc_id", "n_tokens").collect()}
    assert toks["p2"] == 8


def test_curate_cluster_balance(spark):
    """--cluster-balance: at most N docs survive per embedding cluster,
    chosen deterministically; report records the removals."""
    from jobs.curate import curate

    rows = [
        (i, f"document {i} about alpha topic " + " ".join(f"w{i}_{j}" for j in range(10)))
        for i in range(12)
    ]
    emb = [[1.0, 0.0] if i < 6 else [0.0, 1.0] for i in range(12)]
    docs = spark.createDataFrame(
        [(i, t, e) for (i, t), e in zip(rows, emb)],
        "doc_id long, text string, emb array<double>",
    )
    curated, report = curate(
        spark,
        docs,
        min_quality=0.0,
        min_tokens=1,
        near_dedup=False,
        cluster_balance=2,
        cluster_balance_clusters=2,
        embedding_col="emb",
    )
    kept = sorted(r["doc_id"] for r in curated.select("doc_id").collect())
    assert len(kept) == 4
    assert sum(1 for d in kept if d < 6) == 2 and sum(1 for d in kept if d >= 6) == 2
    assert report["cluster_balance"] == 2
    assert report["cluster_balance_removed"] == 8


def test_curate_dup_span_gate(spark):
    """--max-dup-span-frac: a doc stitched almost entirely from another
    doc's content is dropped; originals survive."""
    from jobs.curate import curate

    body = " ".join(f"original sentence word{j} content" for j in range(8))
    rows = [
        ("orig", body + " plus unique trailing analysis of the topic here"),
        ("stitch", body),  # ~100% duplicated-span exposure
        ("fresh", "entirely new words " + " ".join(f"tok{j}" for j in range(30))),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    # orig's exposure is 32 shared / 40 tokens = 0.80; the 0.85 cap keeps
    # it with margin while the fully-stitched doc (1.0) is gated.
    curated, report = curate(
        spark, docs, min_quality=0.0, near_dedup=False, max_dup_span_frac=0.85
    )
    kept = sorted(r["doc_id"] for r in curated.select("doc_id").collect())
    assert kept == ["fresh", "orig"]
    assert report["dup_span_gated"] == 1


def test_curate_dup_ngram_gate(spark):
    """The Gopher n-gram gate catches looped PHRASES the single-word gate
    misses (every word individually under the top-word cap)."""
    from jobs.curate import curate

    loop = "one two three four five " * 10  # repeated 5-gram, each word 1/5
    rows = [
        ("a", "a perfectly ordinary document with plenty of distinct words "
              "covering several different topics in a natural way today"),
        ("r", loop + "tail"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    curated, report = curate(
        spark, docs, near_dedup=False, max_dup_5gram_frac=0.5,
        max_top_word_frac=0.5,
    )
    kept = sorted(r["doc_id"] for r in curated.select("doc_id").collect())
    assert kept == ["a"]
    assert report["filters"]["max_dup_5gram_frac"] == 0.5
    # without the n-gram gate the looped doc survives the word gate
    survived, _ = curate(
        spark, docs, near_dedup=False, max_top_word_frac=0.5,
    )
    assert sorted(r["doc_id"] for r in survived.select("doc_id").collect()) == [
        "a", "r",
    ]
