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
