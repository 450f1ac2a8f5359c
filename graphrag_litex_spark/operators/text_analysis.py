"""Text analysis for corpus curation: language-ID, quality scoring, token
counting, document fingerprinting. All pure column expressions (JVM-side),
designed to be oracle-checkable in DuckDB with identical SQL semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphrag_litex_spark.operators.dedup import norm_text_col

# Tiny per-language stopword sets for the n-gram/stopword heuristic.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "was", "for", "with", "that"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den"],
    "fr": ["le", "la", "les", "et", "est", "pas", "pour", "dans", "une", "que"],
    "es": ["el", "la", "los", "y", "es", "no", "por", "para", "una", "que"],
}


def tokens_col(text_col="text"):
    return F.split(norm_text_col(text_col), " ")


def token_count_col(text_col="text"):
    # Bind the normalized string ONCE via a 1-element transform: referenced
    # directly in both the empty-check and the split, the (expensive) regex
    # normalization is evaluated twice per row — measured 2x the whole
    # expression's cost on the packing/mixture hot paths.
    t = norm_text_col(text_col)
    return F.element_at(
        F.transform(
            F.array(t),
            lambda s: F.when(s == "", F.lit(0)).otherwise(F.size(F.split(s, " "))),
        ),
        1,
    )


# GPT-2-style BPE pretokenizer pattern, lookahead-free so the SAME string
# compiles identically under Java regex (Spark) and RE2 (DuckDB) — the
# original's trailing-space lookahead `\s+(?!\S)` is dropped; greedy
# whitespace runs give the same match COUNT. Whitespace is an EXPLICIT
# ASCII class, not `\s`: `\s` means three different sets across the
# engines that run this pattern (Java: ASCII+VT; RE2: ASCII minus VT;
# Python `regex`: full Unicode), so NBSP/U+2028-bearing text would
# tokenize differently between the JVM trainer and the Python encoder.
# With the explicit class, Unicode whitespace consistently falls to the
# `[^...]` punctuation branch in every engine. Counts pretokens (the units
# BPE merges operate within), the standard cheap token-count proxy when
# the merge table isn't shipped to executors.
_WS = r" \t\n\x0B\f\r"
BPE_PRETOKEN_RE = (
    r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^" + _WS + r"\p{L}\p{N}]+|[" + _WS + r"]+"
)


def bpe_token_count_col(text_col="text"):
    """BPE-ish token count: one codegen'd regexp_count, no UDF."""
    return F.coalesce(
        F.regexp_count(F.col(text_col), F.lit(BPE_PRETOKEN_RE)), F.lit(0)
    )


def stopword_hits_col(text_col, lang: str):
    words = STOPWORDS[lang]
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(tokens_col(text_col), lambda t: F.array_contains(arr, t)))


def language_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds ``lang_pred``: argmax over per-language stopword hit counts
    (ties broken by language code order); 'und' when no hits."""
    hits = [stopword_hits_col(text_col, lang).alias(f"_h_{lang}") for lang in STOPWORDS]
    out = docs.select("*", *hits)
    best = F.greatest(*[F.col(f"_h_{lang}") for lang in STOPWORDS])
    pred = F.lit("und")
    for lang in reversed(list(STOPWORDS)):  # earlier langs win ties
        pred = F.when(
            (F.col(f"_h_{lang}") == best) & (best > 0), F.lit(lang)
        ).otherwise(pred)
    return out.withColumn("lang_pred", pred).drop(*[f"_h_{lang}" for lang in STOPWORDS])


def quality_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds deterministic quality-scoring features + a composite score:

    n_chars, n_tokens, mean_token_len, punct_ratio, upper_ratio,
    stopword_ratio (en), quality_score in [0, 1].
    """
    raw = F.col(text_col)
    n_chars = F.length(raw)
    n_tokens = token_count_col(text_col)
    punct = F.length(F.regexp_replace(raw, r"[^.,;:!?]", ""))
    upper = F.length(F.regexp_replace(raw, r"[^A-Z]", ""))
    sw = stopword_hits_col(text_col, "en")
    mean_tok = F.when(n_tokens > 0, F.length(norm_text_col(text_col)) / n_tokens).otherwise(
        F.lit(0.0)
    )
    punct_ratio = F.when(n_chars > 0, punct / n_chars).otherwise(F.lit(0.0))
    upper_ratio = F.when(n_chars > 0, upper / n_chars).otherwise(F.lit(0.0))
    sw_ratio = F.when(n_tokens > 0, sw / n_tokens).otherwise(F.lit(0.0))
    score = (
        F.least(n_tokens / 100.0, F.lit(1.0)) * 0.4
        + F.least(sw_ratio * 5.0, F.lit(1.0)) * 0.3
        + (1.0 - F.least(punct_ratio * 10.0, F.lit(1.0))) * 0.2
        + (1.0 - F.least(upper_ratio * 5.0, F.lit(1.0))) * 0.1
    )
    return (
        docs.withColumn("n_tokens", n_tokens)
        .withColumn("mean_token_len", F.round(mean_tok, 6))
        .withColumn("punct_ratio", F.round(punct_ratio, 6))
        .withColumn("upper_ratio", F.round(upper_ratio, 6))
        .withColumn("stopword_ratio", F.round(sw_ratio, 6))
        .withColumn("quality_score", F.round(score, 6))
    )


def fingerprint(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Stable document fingerprints: md5 of raw and of normalized text."""
    return docs.select(
        F.col(id_col),
        F.md5(F.col(text_col)).alias("fp_raw"),
        F.md5(norm_text_col(text_col)).alias("fp_norm"),
    )


def winnow_fingerprints(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    window: int = 4,
) -> DataFrame:
    """Winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03):
    hash every character k-gram of the normalized text, keep the MINIMUM
    hash of each window of ``window`` consecutive k-grams, distinct. Local
    edits perturb only nearby windows, so near-duplicate documents share
    most fingerprints — the classic rolling-hash fingerprint for
    plagiarism/near-dup detection.

    Columnar-engine note: the textbook Rabin-Karp ROLLING recurrence is a
    scalar-CPU optimization; under whole-stage codegen each k-gram hashes
    independently (xxhash64 over a substring — one fused projection), which
    vectorizes better and needs no stateful UDF. Shape: explode positions ->
    substring+hash projection -> one window-min per position -> distinct.
    Everything JVM-side; a pure-Python golden replicates it bit-for-bit via
    the XXH64 replica (oracle_docops.winnow_golden).

    -> (id, fp) rows, one per distinct selected hash (fp = signed int64).
    """
    from pyspark.sql import Window

    base = docs.select(F.col(id_col).alias("id"), norm_text_col(text_col).alias("norm")).where(
        F.col("norm") != ""
    )
    # Shuffle DOC rows, not gram rows: hash-partitioning by id BEFORE the
    # explode satisfies the window's required distribution (explode/project
    # preserve partitioning, so EnsureRequirements inserts no exchange over
    # the ~n_chars-per-doc gram stream — asserted in tools/explain_plans.py).
    n_part = max(docs.sparkSession.sparkContext.defaultParallelism * 2, 8)
    base = base.repartition(n_part, "id")
    npos = F.greatest(F.length("norm") - k + 1, F.lit(1))
    grams = base.select(
        "id",
        npos.alias("n_pos"),
        F.explode(F.sequence(F.lit(1), npos)).alias("pos"),
        F.expr(f"xxhash64(substring(norm, pos, {k}))").alias("h"),
    )
    w = Window.partitionBy("id").orderBy("pos").rowsBetween(0, window - 1)
    # Full windows only (winnowing's window count = n_pos - window + 1,
    # floored at one window when the doc is shorter than window k-grams).
    return (
        grams.withColumn("fp", F.min("h").over(w))
        .where(F.col("pos") <= F.greatest(F.col("n_pos") - window + 1, F.lit(1)))
        .select("id", "fp")
        .distinct()
    )


def char_ngram_occurrences(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """-> (doc_id, gram) — one row per character n-gram OCCURRENCE of the
    normalized text (docs shorter than n grams excluded). Same explode ->
    substring projection as winnowing: JVM-side, no UDF."""
    base = docs.select(
        F.col(id_col).alias("doc_id"), norm_text_col(text_col).alias("t")
    ).where(F.length("t") >= n)
    return base.select(
        "doc_id",
        F.explode(F.sequence(F.lit(1), F.length("t") - (n - 1))).alias("pos"),
        F.expr(f"substring(t, pos, {n})").alias("gram"),
    ).drop("pos")


def ngram_model(occurrences: DataFrame) -> DataFrame:
    """-> (gram, corpus_n) character-n-gram counts. The model's domain is
    BOUNDED by the normalized charset ([a-z0-9 ] -> <= 37^n rows, ~50k for
    trigrams) REGARDLESS of corpus size — so at 100 TB this is one
    map-side-combined aggregation down to a table that always fits a
    broadcast, the inverse of the canon-map situation (which is
    corpus-proportional and must NOT be force-broadcast)."""
    return occurrences.groupBy("gram").agg(F.count(F.lit(1)).alias("corpus_n"))


def trigram_novelty(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    rare_threshold: int = 10,
    model: DataFrame | None = None,
) -> DataFrame:
    """CCNet-style LM quality signal, exact-arithmetic form: the fraction
    of a document's character-trigram occurrences that are RARE in the
    model corpus (count < rare_threshold). High novelty = gibberish,
    encoding damage, or genuinely out-of-domain text — the same triage the
    CCNet/RefinedWeb LM-perplexity filter performs, realized with integer
    counts so the score is one exactly-rounded division
    (engine/partitioning-deterministic; the ln-based `trigram_logprob` is
    the floating-point API outside the cross-engine contract).

    ``model``: score against a DIFFERENT reference corpus's
    `ngram_model` (the real CCNet shape — e.g. target-domain text);
    default scores against the input corpus itself. Grams absent from the
    model count as rare (count 0 < threshold).

    -> (doc_id, n_grams, n_rare, rare_frac). One corpus aggregation for the
    model (bounded output, see ngram_model) + one broadcast join back over
    the occurrence stream + one per-doc aggregation.
    """
    occ = char_ngram_occurrences(docs, id_col, text_col, n=3)
    m = ngram_model(occ) if model is None else model
    joined = occ.join(F.broadcast(m), "gram", "left")
    return (
        joined.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(
                F.when(F.coalesce("corpus_n", F.lit(0)) < rare_threshold, 1).otherwise(0)
            ).alias("n_rare"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_rare",
            F.round(F.col("n_rare") / F.col("n_grams"), 6).alias("rare_frac"),
        )
    )


def trigram_logprob(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    model: DataFrame | None = None,
) -> DataFrame:
    """Per-doc mean log-probability under the unigram-of-trigrams model:
    mean over occurrences of ln(corpus_n / total_grams), add-one smoothed
    for grams missing from the model. The conventional LM-filter score for
    model consumers; ln() keeps it outside the cross-engine value contract
    (libm last-bit divergence — `trigram_novelty` is the oracled twin).

    -> (doc_id, n_grams, mean_logprob)."""
    occ = char_ngram_occurrences(docs, id_col, text_col, n=3)
    m = ngram_model(occ) if model is None else model
    total = m.agg(F.sum("corpus_n")).first()[0] or 1
    joined = occ.join(F.broadcast(m), "gram", "left")
    lp = F.log((F.coalesce("corpus_n", F.lit(0)) + 1.0) / F.lit(float(total + 1)))
    return (
        joined.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.round(F.avg(lp), 6).alias("mean_logprob"),
        )
    )


# ---- fastText-style hashed-ngram quality classifier (inference) ----------
#
# The model-based quality filter every modern curation pipeline runs after
# the heuristic gates (fastText langid/quality in CCNet, the Wikipedia-ref
# classifier in GPT-3/LLaMA): a LINEAR model over hashed bag-of-ngram
# features. This is the INFERENCE operator — weights arrive as data (one
# row per hash bucket), exactly how a model trained offline (fastText,
# sklearn, torch) ships to the cluster. Weights are INTEGER-QUANTIZED
# (standard int8/int16 deployment practice), which also makes the score an
# exact integer ratio — one exactly-rounded division, engine- and
# partitioning-deterministic like trigram_novelty above.
#
# Plan shape / 100 TB scale: featurization is pure codegen (normalize →
# split → zip_with bigrams → explode); the model join is a BROADCAST by
# construction — the weight table is bounded by n_buckets (2^18 default,
# ~MBs) no matter how large the corpus — and the per-doc agg is one hash
# shuffle on doc_id. Zero Python anywhere.


def hashed_ngram_features(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1 << 18,
    bigrams: bool = True,
) -> DataFrame:
    """-> (doc_id, bucket, n): hashed token-unigram (+bigram) counts.

    Tokens = the shared cross-engine normalization (lower/punct-fold)
    split on spaces; bigrams are built array-side with ``zip_with`` over
    two slices (no posexplode/window pass); bucket =
    ``pmod(xxhash64(feature), n_buckets)`` — reproducible bit-for-bit by
    the pure-Python XXH64 and by any offline trainer that hashes the same
    way (fastText's own hashing trick, different hash function).
    """
    from graphrag_litex_spark.operators.iterutils import scale_out

    # Tokenize in a SELECT BELOW the explode: inlined into the generator,
    # the split(regex-normalize) chain is re-evaluated for every reference
    # (size + two slices + concat), and the one-file scan case runs it all
    # on one core — measured 8.6s vs 2.0s over 50k docs at local[32].
    base = scale_out(docs, id_col).select(
        F.col(id_col).alias("doc_id"), F.split(norm_text_col(text_col), " ").alias("_toks")
    )
    feats = F.col("_toks")
    if bigrams:
        n = F.size("_toks")
        bi = F.zip_with(
            F.slice("_toks", 1, n - 1),
            F.slice("_toks", 2, n - 1),
            lambda x, y: F.concat(x, F.lit(" "), y),
        )
        feats = F.concat("_toks", bi)
    return (
        base.select("doc_id", F.explode(feats).alias("feature"))
        .groupBy("doc_id", F.pmod(F.xxhash64("feature"), F.lit(n_buckets)).alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def hash_weights(spark, n_buckets: int = 1 << 18, scale: int = 1000):
    """Deterministic stand-in weight table (bucket, weight) — integer
    weights in [-scale, scale] derived from xxhash64(bucket), the slot a
    real trained+quantized model drops into (same schema, zero code
    changes). Bounded by n_buckets ⇒ always broadcastable."""
    return spark.range(n_buckets).select(
        F.col("id").alias("bucket"),
        (F.pmod(F.xxhash64("id"), F.lit(2 * scale + 1)) - scale).alias("weight"),
    )


def quality_classifier_scores(
    docs: DataFrame,
    weights: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1 << 18,
    bigrams: bool = True,
    bias: int = 0,
    cutoff: float = 0.0,
) -> DataFrame:
    """Linear-model document scoring -> (doc_id, n_feats, logit_sum, logit, keep).

    ``logit_sum`` = bias + Σ count(feature)·weight(bucket(feature)) (exact
    integer); ``logit`` = logit_sum / n_feats rounded to 6 places (the
    mean-pooled linear score, fastText's hidden layer with 1-d bucket
    embeddings); ``keep`` = logit >= cutoff. Apply sigmoid downstream if a
    probability is needed — it is monotone, so the KEEP decision is
    identical, and keeping exp() out keeps the contract engine-exact.

    Missing buckets (feature hashed to a bucket absent from the weight
    table) contribute 0 — a sparse quantized model can ship only its
    non-zero rows.
    """
    feats = hashed_ngram_features(docs, id_col, text_col, n_buckets, bigrams)
    joined = feats.join(F.broadcast(weights), "bucket", "left")
    return (
        joined.groupBy("doc_id")
        .agg(
            F.sum("n").alias("n_feats"),
            (
                F.lit(bias) + F.sum(F.col("n") * F.coalesce("weight", F.lit(0)))
            ).alias("logit_sum"),
        )
        .select(
            "doc_id",
            "n_feats",
            "logit_sum",
            F.round(F.col("logit_sum") / F.col("n_feats"), 6).alias("logit"),
            (F.col("logit_sum") / F.col("n_feats") >= F.lit(cutoff)).alias("keep"),
        )
    )
