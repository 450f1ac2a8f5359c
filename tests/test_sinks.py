"""A6 eval CSV sink (reference evaluation/evaluate_graphrag.py:181-205)."""

import csv

import pandas as pd

from graphrag_litex_spark.sinks.eval_csv import EVAL_COLUMNS, write_eval_csv


def test_eval_csv_single_file_fixed_header(spark, tmp_path):
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "question": ["q1", "q2"],
                "criterion": ["comprehensiveness", "diversity"],
                "winner": ["system1", "system2"],
                "winning_system": ["GraphRAGLiteX", "VectorRAG"],
                "system1": ["GraphRAGLiteX", "GraphRAGLiteX"],
                "score1": [90, 60],
                "system2": ["VectorRAG", "VectorRAG"],
                "score2": [75, 80],
                "reasoning": ["line one\nline two", "single"],
            }
        )
    )
    out = str(tmp_path / "eval.csv")
    write_eval_csv(df, out)
    with open(out, newline="") as f:
        rows = list(csv.reader(f))
    assert rows[0] == EVAL_COLUMNS
    assert len(rows) == 3
    by_q = {r[0]: r for r in rows[1:]}
    assert by_q["q1"][8] == "line one line two"  # newlines flattened like the ref


def test_eval_csv_missing_columns_filled(spark, tmp_path):
    df = spark.createDataFrame(
        pd.DataFrame({"question": ["q"], "criterion": ["directness"]})
    )
    out = str(tmp_path / "eval2.csv")
    write_eval_csv(df, out)
    with open(out, newline="") as f:
        rows = list(csv.reader(f))
    assert rows[0] == EVAL_COLUMNS
    assert rows[1][0] == "q" and rows[1][2] == ""


def test_evaluation_lifecycle(spark, corpus_sf0001, tmp_path):
    """SURVEY §3.3 end-to-end: GraphRAG vs VectorRAG answers judged per
    question x criterion, tallied, written as the reference-shaped CSV —
    deterministic across runs."""
    import csv

    from jobs.evaluate import CRITERIA, run_evaluation

    questions = ["who acquired acme corp", "who uses quantumdb"]
    out = str(tmp_path / "eval.csv")
    res = run_evaluation(
        spark,
        corpus_sf0001["transcripts"],
        str(tmp_path / "kg"),
        questions,
        out,
    )
    with open(out) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == len(questions) * len(CRITERIA)
    assert set(r["criterion"] for r in rows) == set(CRITERIA)
    assert all(r["winning_system"] in ("GraphRAG-LiteX-Spark", "VectorRAG", "tie") for r in rows)
    assert sum(res["tally"].values()) == len(rows)
    # Determinism: a second run (pipeline resumes) produces identical rows.
    res2 = run_evaluation(
        spark, corpus_sf0001["transcripts"], str(tmp_path / "kg"), questions,
        str(tmp_path / "eval2.csv"),
    )
    with open(str(tmp_path / "eval2.csv")) as f:
        assert list(csv.DictReader(f)) == rows
    assert res2["tally"] == res["tally"]


def test_ntriples_export_escaping_and_write(spark, tmp_path):
    from graphrag_litex_spark.sinks.rdf import kg_to_ntriples, write_ntriples

    nodes = spark.createDataFrame(
        [("e1", 'acme "corp" inc'), ("e2", "back\\slash co"), ("e3", "multi\nline\tco")],
        "entity_id string, canonical_name string",
    )
    edges = spark.createDataFrame(
        [("e1", "e2", "Partners With!")],
        "src_id string, dst_id string, pred string",
    )
    lines = sorted(r["line"] for r in kg_to_ntriples(nodes, edges).collect())
    assert '<urn:kg:entity:e1> <urn:kg:label> "acme \\"corp\\" inc" .' in lines
    assert '<urn:kg:entity:e2> <urn:kg:label> "back\\\\slash co" .' in lines
    assert "<urn:kg:entity:e1> <urn:kg:pred:partners_with_> <urn:kg:entity:e2> ." in lines
    # control chars are escaped, never emitted raw (a raw newline would
    # split the record and corrupt the line-based .nt file)
    assert '<urn:kg:entity:e3> <urn:kg:label> "multi\\nline\\tco" .' in lines
    assert all("\n" not in ln and "\t" not in ln for ln in lines)
    out = str(tmp_path / "nt")
    write_ntriples(kg_to_ntriples(nodes, edges), out)
    import glob

    text = "".join(open(p).read() for p in glob.glob(out + "/part-*"))
    assert sorted(text.strip().split("\n")) == lines


def test_compact_parquet_reduces_file_count(spark, tmp_path):
    from graphrag_litex_spark.sinks.compact import compact_parquet

    src = str(tmp_path / "many")
    out = str(tmp_path / "few")
    spark.range(10_000).repartition(40).write.parquet(src)
    report = compact_parquet(spark, src, out, target_mb=256)
    assert report["files_in"] >= 40
    assert report["files_out"] == 1  # tiny dataset -> one target-sized file
    assert report["rows"] == 10_000
    # content identical, not just counted
    a = {r["id"] for r in spark.read.parquet(src).collect()}
    b = {r["id"] for r in spark.read.parquet(out).collect()}
    assert a == b
    import pytest as _pytest

    with _pytest.raises(ValueError):
        compact_parquet(spark, str(tmp_path / "missing"), out)


def test_compact_parquet_preserves_hive_partitions(spark, tmp_path):
    """Compacting a hive-partitioned dataset (the dedup index's bands/ dir
    shape) must keep the key=value layout so partition pruning survives."""
    import glob as _glob
    import os as _os

    from pyspark.sql import functions as F

    from graphrag_litex_spark.sinks.compact import compact_parquet

    src = str(tmp_path / "bands_many")
    out = str(tmp_path / "bands_few")
    df = spark.range(2_000).select(
        "id", (F.col("id") % 4).alias("band"), F.xxhash64("id").alias("bucket")
    )
    df.repartition(16).write.partitionBy("band").parquet(src)
    report = compact_parquet(spark, src, out, target_mb=256)
    assert report["rows"] == 2_000
    # Layout preserved: one key=value dir per band, files under them only.
    band_dirs = sorted(
        _os.path.basename(d) for d in _glob.glob(_os.path.join(out, "band=*"))
    )
    assert band_dirs == ["band=0", "band=1", "band=2", "band=3"]
    flat = [
        f for f in _glob.glob(_os.path.join(out, "*.parquet")) if _os.path.isfile(f)
    ]
    assert not flat, "partition layout flattened by compaction"
    assert report["files_out"] <= report["files_in"]
    # Pruning works against the compacted copy: a band filter reads only
    # that band's directory (PartitionFilters, not a post-scan filter).
    pruned = spark.read.parquet(out).where(F.col("band") == 2)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "band" in plan.split("PartitionFilters")[1][:120]
    # Content identical, partition column round-trips with its value.
    a = sorted((r["id"], r["band"]) for r in spark.read.parquet(src).collect())
    b = sorted((r["id"], r["band"]) for r in spark.read.parquet(out).collect())
    assert a == b


def test_preference_pairs_export(spark, corpus_sf0001, tmp_path):
    """Judged answers export as DPO pairs: majority-vote winner becomes
    'chosen', ties emit nothing, margins are net criterion wins."""
    from jobs.evaluate import CRITERIA, preference_pairs, run_evaluation

    questions = ["who acquired acme corp", "who uses quantumdb"]
    pairs_path = str(tmp_path / "pairs")
    res = run_evaluation(
        spark,
        corpus_sf0001["transcripts"],
        str(tmp_path / "kg"),
        questions,
        str(tmp_path / "eval.csv"),
        pairs_path=pairs_path,
    )
    pairs = spark.read.parquet(pairs_path).collect()
    assert res["preference_pairs"] == len(pairs)
    for p in pairs:
        assert p["chosen"] != p["rejected"]
        assert 1 <= p["margin"] <= p["n_criteria"] == len(CRITERIA)
        assert p["question"] in questions
    # unit: a tie emits no pair; a sweep emits chosen=winner with full margin
    evals = [
        {"question": "q1", "winner": 1},
        {"question": "q1", "winner": 1},
        {"question": "q1", "winner": 1},
        {"question": "q1", "winner": 1},
        {"question": "q2", "winner": 1},
        {"question": "q2", "winner": 2},
        {"question": "q2", "winner": 0},
        {"question": "q2", "winner": 0},
    ]
    a = [{"answer": "A1"}, {"answer": "A2"}]
    b = [{"answer": "B1"}, {"answer": "B2"}]
    got = preference_pairs(spark, ["q1", "q2"], a, b, evals).collect()
    assert len(got) == 1  # q2 tied 1-1 -> dropped
    assert got[0]["question"] == "q1" and got[0]["chosen"] == "A1"
    assert got[0]["rejected"] == "B1" and got[0]["margin"] == 4
