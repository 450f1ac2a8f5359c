"""A6: evaluation CSV sink (reference evaluation/evaluate_graphrag.py:181-205).

The reference writes judge rows to one CSV with a fixed header via the csv
module. Here the same artifact from a DataFrame: a header-stable single-file
CSV (an eval report is a human artifact — small by construction — so
coalesce(1) is deliberate, not a scale bug; newlines in reasoning flattened
like the reference's ``.replace("\\n", " ")``).
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EVAL_COLUMNS = [
    "question",
    "criterion",
    "winner",
    "winning_system",
    "system1",
    "score1",
    "system2",
    "score2",
    "reasoning",
]


def write_eval_csv(evaluations: DataFrame, output_path: str) -> str:
    """Write the evaluation table to ONE csv file at ``output_path``.

    Missing columns are filled with nulls so partial eval tables still
    produce the reference's fixed header.
    """
    cols = [
        (F.col(c) if c in evaluations.columns else F.lit(None)).cast("string").alias(c)
        for c in EVAL_COLUMNS
    ]
    out = evaluations.select(*cols).withColumn(
        "reasoning", F.regexp_replace(F.coalesce("reasoning", F.lit("")), r"\s*\n\s*", " ")
    )
    tmp = output_path + "._spark_tmp"
    (
        out.coalesce(1)
        .write.mode("overwrite")
        .option("header", "true")
        .option("quoteAll", "false")
        .csv(tmp)
    )
    part = glob.glob(os.path.join(tmp, "part-*.csv"))[0]
    os.makedirs(os.path.dirname(output_path) or ".", exist_ok=True)
    shutil.move(part, output_path)
    shutil.rmtree(tmp)
    return output_path
