"""Snapshot diff: what changed in the graph between two builds.

An incremental KG pipeline (plans/pipeline.py `append_transcripts`, reference
resume semantics indexing/checkpoint_manager.py) rebuilds the merged edge set
as the corpus grows; the operator a pipeline owner actually runs afterwards
is "diff this build against the last one" — which edges appeared, which
disappeared, which changed weight — both as a QA gate (an append should only
ever add/strengthen) and as the change-feed a downstream consumer (search
index, embedding trainer) ingests instead of the full graph.

Shape: one full-outer join on the snapshot key. At 100 TB both sides are the
merged edge table (entity-pair grain, orders of magnitude smaller than the
triple/observation grain); against the published warehouse both sides are
bucketed on the join key (sinks/warehouse.py) so the diff compiles to a
SortMergeJoin with NO Exchange. Compare columns are checked null-safe
(`eqNullSafe`), so a null-vs-value change is 'changed', not 'stable'.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare: list[str] | None = None,
    old_suffix: str = "_old",
    new_suffix: str = "_new",
) -> DataFrame:
    """Full-outer diff of two snapshots of the same logical table.

    Returns one row per key present in either side with
    ``status in ('added','removed','changed','stable')`` plus every
    ``compare`` column twice (``<col>_old`` / ``<col>_new``). 'changed'
    means the key exists on both sides and at least one compare column
    differs (null-safe); with ``compare=[]`` both-sides rows are 'stable'.

    Both inputs must carry ``keys + compare`` columns. The join is a plain
    equi-join on ``keys`` — broadcastable when one snapshot is small,
    Exchange-free when both sides are bucketed on the key.
    """
    if compare is None:
        compare = [c for c in old.columns if c not in keys and c in new.columns]
    missing = [c for c in keys + compare if c not in old.columns or c not in new.columns]
    if missing:
        raise ValueError(f"columns missing from a snapshot side: {missing}")

    # Tag presence with a literal instead of testing key nullness: a null
    # key value on one side must not masquerade as absence.
    o = old.select(
        *keys,
        F.lit(True).alias("__in_old"),
        *[F.col(c).alias(f"{c}{old_suffix}") for c in compare],
    )
    n = new.select(
        *keys,
        F.lit(True).alias("__in_new"),
        *[F.col(c).alias(f"{c}{new_suffix}") for c in compare],
    )
    j = o.join(n, keys, "full_outer")

    same: Column = F.lit(True)
    for c in compare:
        same = same & F.col(f"{c}{old_suffix}").eqNullSafe(F.col(f"{c}{new_suffix}"))

    status = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(same, F.lit("stable"))
        .otherwise(F.lit("changed"))
    )
    out_cols = (
        [F.col(k) for k in keys]
        + [status.alias("status")]
        + [F.col(f"{c}{s}") for c in compare for s in (old_suffix, new_suffix)]
    )
    return j.select(*out_cols)
