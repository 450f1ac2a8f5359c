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


def _block_keyed(
    names: DataFrame, feature: F.Column, max_block_size: int | None
) -> DataFrame:
    """(norm_name, block, feat): first-token blocking shared by both scorers.

    ``max_block_size`` is the pathological-block valve at 100 TB: a block
    whose name count exceeds it (everything starting with "the ...") is
    REFINED by a second blocking key (second token, else name length) so the
    quadratic stays within sub-blocks. Opt-in because refinement drops
    cross-sub-block pairs inside the giant block (documented recall
    tradeoff); default None keeps exact first-token semantics, identical to
    the single-process oracle. Tested with an adversarial boilerplate corpus
    in tests/test_scale_valves.py.
    """
    keyed = names.select(
        F.col("norm_name"),
        F.split_part(F.col("norm_name"), F.lit(" "), F.lit(1)).alias("block"),
        feature.alias("feat"),
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
            "feat",
        )
    return keyed


def _scored_pairs(keyed: DataFrame, sim: F.Column, threshold: float) -> DataFrame:
    """Self-join within blocks, ordered pairs, scored, thresholded."""
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
            sim.alias("sim"),
        )
        .where(F.col("sim") >= threshold)
    )


def candidate_pairs(
    names: DataFrame,
    threshold: float = SIM_THRESHOLD,
    max_block_size: int | None = None,
) -> DataFrame:
    """Similarity edges (src, dst, sim) between distinct normalized names.

    Blocking key = first token (functions.normalize.blocking_key); scoring =
    char-3-gram Jaccard (functions.normalize.name_similarity) — both
    replicated as Catalyst expressions so the single-process oracle and this
    distributed version produce identical edges.
    """
    keyed = _block_keyed(names, char_ngrams_col("norm_name"), max_block_size)
    return _scored_pairs(
        keyed, jaccard_col(F.col("a.feat"), F.col("b.feat")), threshold
    )


def embedding_candidate_pairs(
    names: DataFrame,
    threshold: float = 0.85,
    embed_udf=None,
    dim: int = 64,
    max_block_size: int | None = None,
) -> DataFrame:
    """Reference-shaped scorer: cosine of NAME EMBEDDINGS within blocks.

    This is the exact scoring semantics of the reference's resolver —
    embed each normalized name, link when cosine > 0.85
    (/root/reference/extraction/entity_resolver.py:32-42 and the threshold
    at :10-12) — restructured from its greedy O(n²) sequential scan into
    blocking + pair scoring + (downstream) connected components, so it is
    order-independent and distributable.

    ``embed_udf`` is the pluggable C7 slot: any Arrow-batched pandas UDF
    ``string -> array<double>`` (default: the deterministic hashing
    featurizer; production: a sentence-transformer UDF loaded once per
    executor). The embedding is computed ONCE per distinct normalized name —
    the names table is tiny relative to the mention stream — and pairs are
    scored JVM-side (``cosine_col``), so the Python cost is O(unique names),
    never O(pairs). Drop-in replacement for :func:`candidate_pairs` upstream
    of ``connected_components``.

    Note: the default hashing featurizer's cosine measures TOKEN overlap, so
    at the reference's 0.85 threshold it links only near-identical token
    sets (reorderings, subset-of-3 extensions). For the reference's fuzzy
    suffix-expansion behavior ("acme corp" ~ "acme corporation",
    MiniLM-driven) pass ``prefix_ngram_embed_udf()`` — a deterministic
    prefix-decayed char-ngram embedder whose cosine lands suffix expansions
    above 0.85 and unrelated tokens near 0.5 (tests/test_cc.py); production
    plugs a real sentence-transformer UDF into the same slot.
    """
    from graphrag_litex_spark.operators.similarity import cosine_col

    if embed_udf is None:
        from graphrag_litex_spark.querying.answer import make_embed_udf

        embed_udf = make_embed_udf(dim)
    keyed = _block_keyed(names, embed_udf(F.col("norm_name")), max_block_size)
    return _scored_pairs(
        keyed, F.round(cosine_col(F.col("a.feat"), F.col("b.feat")), 6), threshold
    )


_EMBEDDER_REGISTRY: dict[str, object] = {}


def register_link_embedder(name: str, factory) -> None:
    """Register a production C7 embedder under ``name`` so it is selectable
    from PipelineConfig(link_embedder=name) with ZERO pipeline code changes.

    ``factory`` is a zero-arg callable returning an Arrow-batched pandas UDF
    ``string -> array<double>`` (e.g. wrapping a sentence-transformer whose
    model loads once per executor inside the UDF closure). The NAME — not
    the callable — is what enters the pipeline config, so checkpoint
    fingerprints stay JSON-hashable and a resumed run re-resolves the same
    registered embedder."""
    _EMBEDDER_REGISTRY[name] = factory


def resolve_link_embedder(name: str):
    """Embedder-name -> UDF for embedding_candidate_pairs (None = the
    default hashing featurizer). Registry first, then built-ins."""
    if name in _EMBEDDER_REGISTRY:
        return _EMBEDDER_REGISTRY[name]()
    if name == "prefix_ngram":
        return prefix_ngram_embed_udf()
    if name == "hash":
        return None
    raise ValueError(
        f"unknown link_embedder {name!r}: register it with "
        "register_link_embedder(name, factory) or use 'hash'/'prefix_ngram'"
    )


def prefix_ngram_embed_udf(dim: int = 64):
    """C7 slot: Arrow-batched UDF over functions.normalize.prefix_ngram_embed
    — the deterministic stand-in that reproduces the reference resolver's
    suffix-expansion linking at its 0.85 cosine threshold."""
    from pyspark.sql import types as T

    from graphrag_litex_spark.functions.normalize import prefix_ngram_embed

    def _batch(s):  # no hints: explicit returnType form (pd imported lazily)
        return s.map(lambda t: prefix_ngram_embed(t or "", dim))

    return F.pandas_udf(_batch, T.ArrayType(T.DoubleType()))
