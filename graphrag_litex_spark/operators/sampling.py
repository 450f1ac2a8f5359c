"""Corpus sampling, profiling, and sequence packing for training-data
pipelines.

Sampling here is DETERMINISTIC and engine-portable: membership is a pure
function of the row id (an md5-hex-prefix threshold), not of a seeded RNG,
so a re-run, a resume, a different partitioning, or a different engine
(the DuckDB oracle) selects the identical subset. That reproducibility is
the property a 100 TB corpus build actually needs — `df.sample()`'s
seeded-per-partition randomness changes membership whenever the partition
layout changes.

All operators are pure column expressions or windows; no UDFs, no driver
loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from graphrag_litex_spark.operators.text_analysis import token_count_col

# Number of hex digits of the md5 used as the sampling key: 6 digits gives
# rate granularity of 1/16^6 ~= 6e-8, plenty for corpus work.
_HEX_DIGITS = 6
_HEX_SPACE = 16**_HEX_DIGITS


def _hex_threshold(rate: float) -> str:
    """Hex-string threshold such that `md5_prefix < threshold` keeps ~rate.
    rate>=1 returns "g", which is lexicographically above every hex string
    (hex digits are 0-9a-f), so the compare keeps everything — no
    special-case branch needed in CASE chains."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0,1], got {rate}")
    if rate >= 1.0:
        return "g"
    return format(int(rate * _HEX_SPACE), f"0{_HEX_DIGITS}x")


def sample_key_col(id_col: str = "doc_id"):
    """The sampling key: first hex digits of md5(id-as-string). Uniform on
    [0, 16^6) and identical in every engine that has md5 (lowercase hex
    both in Spark and DuckDB), so `key < hex(rate * 16^6)` — a plain
    string compare of equal-length hex strings — IS the sample."""
    return F.substring(F.md5(F.col(id_col).cast("string")), 1, _HEX_DIGITS)


def deterministic_sample(
    docs: DataFrame, rate: float, id_col: str = "doc_id"
) -> DataFrame:
    """Keep ~``rate`` of rows, membership a pure function of the id.
    Map-only (filter fused into the scan); repartition/resume/engine
    invariant. rate=1.0 keeps everything exactly."""
    if rate >= 1.0:
        return docs
    return docs.where(sample_key_col(id_col) < F.lit(_hex_threshold(rate)))


def stratified_sample(
    docs: DataFrame,
    rates: dict[str, float],
    strata_col: str,
    id_col: str = "doc_id",
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. downweight one language):
    ``rates`` maps stratum value -> keep rate; unlisted strata use
    ``default_rate``. Same md5 key as `deterministic_sample`, so the keep
    sets of different rates for the same stratum are NESTED (raising a rate
    only adds documents) — the property needed for reproducible corpus
    mixture ablations."""
    thr = F.lit(_hex_threshold(default_rate))
    for value, rate in rates.items():
        thr = F.when(F.col(strata_col) == value, F.lit(_hex_threshold(rate))).otherwise(thr)
    return docs.where(sample_key_col(id_col) < thr)


def assign_splits(
    docs: DataFrame, weights: dict[str, float], id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic train/val/test assignment: the md5 key falls into
    cumulative hex ranges sized by ``weights`` (which must sum to ~1).
    Adds a ``split`` column; a document's split never changes when the
    corpus grows or repartitions — the property that keeps eval sets stable
    across corpus versions. Map-only."""
    total = sum(weights.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"weights must sum to 1, got {total}")
    key = sample_key_col(id_col)
    bounds = []
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name]
        bounds.append((name, _hex_threshold(acc)))
    expr = F.lit(names[-1])  # last split takes the remainder (incl. 'ffffff')
    for name, thr in reversed(bounds):
        expr = F.when(key < F.lit(thr), F.lit(name)).otherwise(expr)
    return docs.withColumn("split", expr)


def corpus_profile(
    docs: DataFrame, group_col: str = "lang", text_col: str = "text", approx: bool = False
) -> DataFrame:
    """Per-group size/shape profile: n_docs, total_tokens, mean/median/p95
    token counts (exact interpolated percentiles — both Spark `percentile`
    and DuckDB `quantile_cont` use linear interpolation, so the oracle is
    value-exact). ``approx=True`` is the 100 TB valve: the exact form
    buffers every value of a group on one reducer, `approx_percentile` is a
    fixed-size mergeable sketch with map-side partials (±0.1% accuracy
    here)."""
    toks = token_count_col(text_col)
    pct = (
        "approx_percentile(n_tokens, {q}, 1000)" if approx else "percentile(n_tokens, {q})"
    )
    return (
        docs.select(F.col(group_col).alias("grp"), toks.alias("n_tokens"))
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.round(F.avg("n_tokens"), 6).alias("mean_tokens"),
            F.round(F.expr(pct.format(q=0.5)), 6).alias("median_tokens"),
            F.round(F.expr(pct.format(q=0.95)), 6).alias("p95_tokens"),
        )
    )


def pack_greedy(
    docs: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_count=None,
    shard_hex_digits: int = 1,
) -> DataFrame:
    """Greedy sequence packing: assign whole documents, in deterministic id
    order, to bins of ~``budget`` tokens (the standard pretraining step
    that packs documents into fixed context windows). A document lands in
    the bin its EXCLUSIVE prefix sum falls in, so bins can overflow by at
    most one document (streaming-pack semantics; no document is split).

    -> (doc_id, n_tokens, bin_id) with bin_id = "<shard>_<local bin>".

    Scale: a single global order-by would serialize the corpus through one
    reducer, so packing is SHARDED — rows hash (md5 hex prefix,
    16^shard_hex_digits shards, engine-portable for the oracle) into
    independent streams, each packed by its own window. Shards pack in
    parallel and each emits near-full bins; size ``shard_hex_digits`` to
    the cluster (1 -> 16-way for tests, 3 -> 4096-way at 100 TB) — the
    per-shard window is the only shuffle either way.
    """
    from graphrag_litex_spark.operators.iterutils import scale_out

    docs = scale_out(docs, id_col)
    toks = token_count(text_col) if token_count else token_count_col(text_col)
    shard = F.substring(F.md5(F.col(id_col).cast("string")), 1, shard_hex_digits)
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        toks.cast("long").alias("n_tokens"),
        shard.alias("_shard"),
    )
    w = (
        Window.partitionBy("_shard")
        .orderBy(F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    local_bin = F.floor((cum - F.col("n_tokens")) / F.lit(budget))
    return base.select(
        "doc_id",
        "n_tokens",
        F.concat_ws("_", "_shard", local_bin.cast("string")).alias("bin_id"),
    )


def pack_stats(packed: DataFrame, budget: int) -> DataFrame:
    """Per-bin fill accounting over `pack_greedy` output: (bin_id, n_docs,
    total_tokens, fill_ratio). One hash agg on bin_id."""
    return packed.groupBy("bin_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.round(F.sum("n_tokens") / F.lit(float(budget)), 6).alias("fill_ratio"),
    )


def source_reputation(
    docs: DataFrame,
    group_col: str = "source",
    low_cutoff: float = 0.5,
) -> DataFrame:
    """Domain/source-level reputation (the RefinedWeb/C4 'URL-level
    filtering' unit of decision): aggregate the per-doc composite
    quality_score by source.

    -> (source, n_docs, avg_quality, n_low, low_frac) where n_low counts
    docs with quality_score < low_cutoff.

    Determinism: quality_score is an exactly-evaluated per-row double
    (text_analysis.quality_features); it is quantized to integer
    micro-units (floor(x*1e6 + 0.5), the engine-portable double->int) so
    the per-source SUM is exact integer arithmetic — immune to FP
    accumulation order across partitions/engines — and avg_quality is two
    exactly-rounded divisions. ONE hash aggregation; scales as groupBy.
    """
    from graphrag_litex_spark.operators.text_analysis import quality_features

    q = quality_features(docs)
    micros = F.floor(F.col("quality_score") * 1e6 + 0.5)
    return (
        q.groupBy(F.col(group_col).alias("source"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(micros).alias("_sum_micro"),
            F.sum(
                F.when(F.col("quality_score") < low_cutoff, 1).otherwise(0)
            ).alias("n_low"),
        )
        .select(
            "source",
            "n_docs",
            F.round(F.col("_sum_micro") / F.col("n_docs") / 1e6, 6).alias("avg_quality"),
            "n_low",
            F.round(F.col("n_low") / F.col("n_docs"), 6).alias("low_frac"),
        )
    )


def filter_by_source_reputation(
    docs: DataFrame,
    group_col: str = "source",
    min_avg_quality: float = 0.4,
    low_cutoff: float = 0.5,
) -> DataFrame:
    """Keep only docs whose SOURCE clears the reputation bar — the
    domain-level gate applied before (cheaper than) per-doc filtering at
    web scale. Good-source set is source-cardinality-sized (weeks of crawl
    have ~10^6-10^7 domains — broadcastable; left_semi lets AQE choose)."""
    good = source_reputation(docs, group_col, low_cutoff).where(
        F.col("avg_quality") >= min_avg_quality
    ).select("source")
    return docs.join(
        good.withColumnRenamed("source", group_col), group_col, "left_semi"
    )


def sample_mixture_by_tokens(
    docs: DataFrame,
    budgets: dict[str, int],
    source_col: str = "source",
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
) -> DataFrame:
    """Token-budgeted mixture sampling — the "data mixing" step of a
    pretraining pipeline (Pile/LLaMA-style source weighting realized as
    absolute per-source token budgets): for each source in ``budgets``,
    keep the deterministic-random prefix of its documents whose CUMULATIVE
    ``token_col`` stays within the budget; sources not in ``budgets`` are
    dropped (an explicit mixture is a whitelist).

    Order within a source is (md5-key, id) — the same key as
    `deterministic_sample` — so the kept set is a pure function of the ids:
    re-runs, repartitionings, and engines agree, and RAISING a budget only
    ADDS documents (nested mixtures, comparable ablations). A document is
    kept iff the running total INCLUDING it is <= budget (greedy prefix; a
    first document larger than the whole budget is dropped).

    Plan: one window (partitionBy source, orderBy key) carrying an integer
    running sum — a single hash shuffle on the source key. Skew note: one
    giant source serializes through one task's window; at that scale apply
    the time-bucket carry trick from `temporal.asof_join` (bucket by key
    prefix, one boundary row per bucket) — budgets are per-source, so the
    prefix-sum composes. Adds ``cum_tokens`` for audit.
    """
    from graphrag_litex_spark.operators.iterutils import scale_out

    docs = scale_out(docs, id_col)
    spark = docs.sparkSession
    budget_rows = [(str(k), int(v)) for k, v in sorted(budgets.items())]
    bdf = F.broadcast(
        spark.createDataFrame(budget_rows, f"{source_col} string, _budget long")
    )
    w = (
        Window.partitionBy(source_col)
        .orderBy(sample_key_col(id_col).asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        docs.join(bdf, source_col)
        .withColumn("cum_tokens", F.sum(token_col).over(w))
        .where(F.col("cum_tokens") <= F.col("_budget"))
        .drop("_budget")
    )


def cluster_balanced_sample(
    docs: DataFrame,
    embeddings: DataFrame,
    per_cluster: int,
    n_clusters: int = 64,
    id_col: str = "doc_id",
    vec_col: str = "embedding",
    centroids: list | None = None,
) -> DataFrame:
    """Cluster-balanced downsampling: at most ``per_cluster`` docs kept per
    embedding cluster, chosen by the deterministic md5 sample order — the
    diversity-preserving alternative to uniform sampling (uniform keeps the
    corpus's mode clusters at full weight; balancing caps each semantic
    region, the standard recipe after SemDeDup). Assignment is the IVF
    coarse quantizer (codegen argmax-cosine, no join); the per-cluster
    top-N is one window over the cluster key. Deterministic and NESTED:
    raising ``per_cluster`` only adds documents (the md5 order is a pure
    function of the id), so budget ablations stay comparable.

    ``embeddings``: (id_col, vec_col) — precomputed at corpus scale (embed
    once, reuse), or the C7 slot's output. Docs without an embedding row
    are DROPPED (they have no cluster evidence)."""
    from pyspark.sql import Window

    from graphrag_litex_spark.operators.similarity import ivf_assign, ivf_centroids

    emb = embeddings.select(F.col(id_col).alias("_cb_id"), F.col(vec_col).alias("_cb_vec"))
    cents = centroids if centroids is not None else ivf_centroids(
        emb, n_clusters, "_cb_id", "_cb_vec"
    )
    if not cents:
        return docs.limit(0)
    assigned = ivf_assign(emb, cents, vec_col="_cb_vec", out_col="_cb_cid")
    rn = F.row_number().over(
        Window.partitionBy("_cb_cid").orderBy(
            sample_key_col("_cb_id").asc(), F.col("_cb_id").asc()
        )
    )
    keep = (
        assigned.withColumn("_cb_rn", rn)
        .where(F.col("_cb_rn") <= per_cluster)
        .select(F.col("_cb_id").alias(id_col))
    )
    return docs.join(keep, id_col)
