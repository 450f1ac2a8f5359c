"""D6: entity-linking candidate generation + similarity scoring.

The reference resolves entities with a greedy O(n²) sequential scan over
MiniLM embeddings (cosine > 0.85, /root/reference/extraction/
entity_resolver.py:25-56) — order-dependent and undistributable. Here
(SURVEY.md D6/E3) linking is:

  1. distinct normalized names            (tiny vs. mentions: one row per
                                           unique surface form, not per use)
  2. blocking-key self-join               (equi-join on first token — Catalyst
                                           shuffle/broadcast hash join; only
                                           same-block pairs are scored, never
                                           all-pairs)
  3. char-3-gram Jaccard >= SIM_THRESHOLD (pure column expressions, codegen'd)
  4. connected components                 (operators/cc.py)

Scale notes: the candidate join is quadratic *within a block*; blocks are
first-token groups, so a pathological block (everything named "the ...")
degrades. Mitigations available at 100 TB: add a second blocking key
(length bucket or minhash band) and union the candidate sets; cap block
size with a frequency filter. The self-join condition ``a.name < b.name``
halves the pair count and the AQE skew-join splits oversized blocks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphrag_litex_spark.functions.normalize import SIM_THRESHOLD
from graphrag_litex_spark.operators.normalize_ops import (
    char_ngrams_col,
    jaccard_col,
    norm_name_col,
)


def distinct_norm_names(mentions: DataFrame, name_col: str = "name") -> DataFrame:
    """Distinct normalized names observed in mentions -> (norm_name)."""
    return (
        mentions.select(norm_name_col(name_col).alias("norm_name"))
        .where(F.col("norm_name") != "")
        .distinct()
    )


def candidate_pairs(
    names: DataFrame,
    threshold: float = SIM_THRESHOLD,
    max_block_size: int | None = None,
) -> DataFrame:
    """Similarity edges (a, b, sim) between distinct normalized names.

    Blocking key = first token (functions.normalize.blocking_key); scoring =
    char-3-gram Jaccard (functions.normalize.name_similarity) — both
    replicated as Catalyst expressions so the single-process oracle and this
    distributed version produce identical edges.

    ``max_block_size`` is the pathological-block valve at 100 TB: a block
    whose name count exceeds it (everything starting with "the ...") is
    REFINED by a second blocking key (second token, else name length) so the
    quadratic stays within sub-blocks. Opt-in because refinement drops
    cross-sub-block pairs inside the giant block (documented recall
    tradeoff); default None keeps exact first-token semantics, identical to
    the single-process oracle. Tested with an adversarial boilerplate corpus
    in tests/test_toolbox.py.
    """
    keyed = names.select(
        F.col("norm_name"),
        F.split_part(F.col("norm_name"), F.lit(" "), F.lit(1)).alias("block"),
        char_ngrams_col("norm_name").alias("grams"),
    )
    if max_block_size is not None:
        big = (
            keyed.groupBy("block")
            .agg(F.count(F.lit(1)).alias("_bs"))
            .where(F.col("_bs") > max_block_size)
            .select("block", F.lit(True).alias("_big"))
        )
        sub = F.coalesce(
            F.nullif(F.split_part(F.col("norm_name"), F.lit(" "), F.lit(2)), F.lit("")),
            F.length("norm_name").cast("string"),
        )
        keyed = keyed.join(F.broadcast(big), "block", "left").select(
            "norm_name",
            F.when(F.col("_big").isNotNull(), F.concat_ws(" ", "block", sub))
            .otherwise(F.col("block"))
            .alias("block"),
            "grams",
        )
    a = keyed.alias("a")
    b = keyed.alias("b")
    return (
        a.join(
            b,
            (F.col("a.block") == F.col("b.block"))
            & (F.col("a.norm_name") < F.col("b.norm_name")),
        )
        .select(
            F.col("a.norm_name").alias("src"),
            F.col("b.norm_name").alias("dst"),
            jaccard_col(F.col("a.grams"), F.col("b.grams")).alias("sim"),
        )
        .where(F.col("sim") >= threshold)
    )
