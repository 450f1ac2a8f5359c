"""Packed training-shard export (jobs/export_shards.py)."""

from __future__ import annotations

import json

import pytest


@pytest.fixture(scope="module")
def curated(spark):
    rows = [(i, " ".join(f"w{i}t{j}" for j in range(i % 9 + 1))) for i in range(120)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_export_conserves_corpus(spark, curated, tmp_path):
    from jobs.export_shards import export_shards

    out = str(tmp_path / "shards")
    report = export_shards(curated, out, budget=20, separator="\n\n", shard_files=4)
    assert report["n_docs"] == 120
    assert report["n_bins"] > 10 and 0 < report["mean_fill"] <= 2.0

    shards = spark.read.json(out)
    assert shards.count() == report["n_bins"]
    # reconstruct: every document appears exactly ONCE across all shards
    texts = []
    for r in shards.select("text").collect():
        texts.extend(r["text"].split("\n\n"))
    want = sorted(r["text"] for r in curated.collect())
    assert sorted(texts) == want
    # token accounting: sum over shards == whitespace tokens of the corpus
    assert report["n_tokens"] == sum(len(t.split()) for t in want)


def test_export_cli(spark, curated, tmp_path):
    from jobs import export_shards as job

    src = str(tmp_path / "docs")
    out = str(tmp_path / "out")
    curated.write.parquet(src)
    rc = job.main(["--docs", src, "--out", out, "--budget", "50"])
    assert rc == 0
    assert spark.read.json(out).count() > 0


def test_export_deterministic(spark, curated, tmp_path):
    """Same input, different partitioning -> byte-identical shard records."""
    from jobs.export_shards import export_shards

    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    export_shards(curated.repartition(1), a, budget=30)
    export_shards(curated.repartition(13), b, budget=30)
    ra = sorted(map(tuple, spark.read.json(a).select("bin_id", "text").collect()))
    rb = sorted(map(tuple, spark.read.json(b).select("bin_id", "text").collect()))
    assert ra == rb


def test_curate_sample_rate(spark):
    """curate(sample_rate=...) downsamples deterministically after dedup."""
    from jobs.curate import curate

    rows = [(i, f"document number {i} with a few extra words for quality") for i in range(200)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    full, rep_full = curate(spark, docs, near_dedup=False)
    sampled, rep = curate(spark, docs, near_dedup=False, sample_rate=0.3)
    assert rep["sample_rate"] == 0.3
    ids_full = {r["doc_id"] for r in full.select("doc_id").collect()}
    ids = {r["doc_id"] for r in sampled.select("doc_id").collect()}
    assert ids < ids_full and 0 < len(ids) < len(ids_full)
    assert rep["docs_out"] == len(ids)
    # dedup accounting unaffected by the sample
    assert rep["near_dups_removed"] == rep_full["near_dups_removed"] == 0
    _ = json  # keep import used


def test_shard_manifest_integrity(spark, tmp_path):
    import hashlib
    import json
    import os

    from jobs.export_shards import export_shards

    docs = spark.createDataFrame(
        [(i, f"doc {i} " + " ".join(f"w{j}" for j in range(20))) for i in range(50)],
        "doc_id long, text string",
    )
    out = str(tmp_path / "shards")
    report = export_shards(docs, out, budget=64, shard_files=4)
    manifest = json.load(open(os.path.join(out, "_manifest.json")))
    assert report["n_files"] == len(manifest["files"]) > 0
    # every listed file exists with the recorded size AND digest
    for entry in manifest["files"]:
        p = os.path.join(out, entry["file"])
        data = open(p, "rb").read()
        assert len(data) == entry["bytes"]
        assert hashlib.sha256(data).hexdigest() == entry["sha256"]
    # the manifest itself is invisible to a JSONL read of the shard dir
    assert spark.read.json(out).count() == report["n_bins"]
