"""Deduplication toolbox for large-scale corpus curation.

Beyond the reference's entity/claim dedup (E1/E4), a 100 TB training-data
pipeline needs document-level dedup. All variants below are pure DataFrame
ops (JVM-side; no Python on the hot path):

  * exact          — hash-groupBy on the raw text (md5)
  * normalized     — hash-groupBy on whitespace/case/punct-normalized text
  * minhash + LSH  — word-shingle -> k minhashes (xxhash64 with per-seed
                     salt) -> bands -> bucket join -> candidate pairs;
                     the scalable near-dup path (candidates verified with
                     exact Jaccard, all in one plan)
  * simhash        — 64-bit bitwise-majority signature over token hashes;
                     near-dups = equal signatures (or equal bands of it)
  * embedding cosine — near-dup pairs above a cosine threshold (brute
                     within a blocking key; see similarity.py for ANN)

Scale notes: exact/normalized dedup are single-shuffle groupBys with
map-side partial agg. MinHash-LSH is the designed 100 TB path: the only
quadratic step is within an LSH bucket, whose expected size is O(1) for
well-chosen (bands, rows); everything else is hash-partitioned. Skewed
buckets (boilerplate shingles) are handled by AQE skew-join + an optional
bucket-size cap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_NORM_RE = r"[^a-z0-9 ]+"


def norm_text_col(col="text"):
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.regexp_replace(F.lower(c), _NORM_RE, " "), r"\s+", " "))


def exact_duplicates(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Groups of byte-identical documents -> (text_hash, n_docs, doc_ids)."""
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("text_hash"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min(id_col).alias("representative_id"),
            F.array_sort(F.collect_list(id_col)).alias("doc_ids"),
        )
        .where(F.col("n_docs") > 1)
    )


def normalized_duplicates(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Near-exact dup groups under case/punct/whitespace normalization."""
    return (
        docs.groupBy(F.md5(norm_text_col(text_col)).alias("norm_hash"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min(id_col).alias("representative_id"),
        )
        .where(F.col("n_docs") > 1)
    )


def word_shingles(text_col="text", k: int = 3):
    """Distinct k-word shingles of a text column (array<string>), JVM-side."""
    toks = F.split(norm_text_col(text_col), " ")
    n = F.size(toks)
    shingle_at = lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k))  # noqa: E731
    return F.when(n < k, F.array(F.concat_ws(" ", toks))).otherwise(
        F.array_distinct(
            F.transform(F.sequence(F.lit(0), n - k), lambda i: shingle_at(i))
        )
    )


def minhash_signature(shingles_col, num_hashes: int = 32):
    """k minhash values: min over shingles of xxhash64(shingle, seed).

    Column expression only — `aggregate` over the shingle array per hash
    seed; codegen'd, no UDF.
    """
    return F.array(
        *[
            F.array_min(
                F.transform(
                    shingles_col, lambda s, i=i: F.xxhash64(s, F.lit(i))
                )
            ).alias(f"mh_{i}")
            for i in range(num_hashes)
        ]
    )


def minhash_lsh_candidates(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    jaccard_threshold: float = 0.6,
) -> DataFrame:
    """Near-duplicate pairs via MinHash+LSH, verified by exact Jaccard.

    -> (id_a, id_b, jaccard) with id_a < id_b, jaccard >= threshold.
    """
    rows_per_band = num_hashes // bands
    base = docs.select(
        F.col(id_col).alias("id"),
        word_shingles(text_col, shingle_k).alias("shingles"),
    ).withColumn("sig", minhash_signature(F.col("shingles"), num_hashes))

    banded = base.select(
        "id",
        "shingles",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.concat_ws(
                                ",",
                                *[
                                    F.col("sig")[b * rows_per_band + r].cast("string")
                                    for r in range(rows_per_band)
                                ],
                            )
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "shingles", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))

    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.shingles").alias("sh_a"),
            F.col("b.shingles").alias("sh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return (
        cand.withColumn("jaccard", F.when(union == 0, F.lit(1.0)).otherwise(inter / union))
        .where(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    threshold: float = 0.5,
    block_col: str | None = None,
) -> DataFrame:
    """All-pairs n-gram Jaccard >= threshold (optionally within a block).

    Brute-force baseline for the LSH path; quadratic — use only at test
    scale or within a strong blocking key.
    """
    base = docs.select(
        F.col(id_col).alias("id"),
        *( [F.col(block_col).alias("block")] if block_col else [F.lit(1).alias("block")] ),
        word_shingles(text_col, shingle_k).alias("shingles"),
    )
    a, b = base.alias("a"), base.alias("b")
    inter = F.size(F.array_intersect(F.col("a.shingles"), F.col("b.shingles")))
    union = F.size(F.array_union(F.col("a.shingles"), F.col("b.shingles")))
    return (
        a.join(b, (F.col("a.block") == F.col("b.block")) & (F.col("a.id") < F.col("b.id")))
        .withColumn("jaccard", F.when(union == 0, F.lit(1.0)).otherwise(inter / union))
        .where(F.col("jaccard") >= threshold)
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round("jaccard", 6).alias("jaccard"),
        )
    )


def simhash_signature(text_col="text", bits: int = 32):
    """Bitwise-majority simhash over token hashes (column expression).

    For each bit position, count tokens whose hash has the bit set; bit in
    the signature = 1 iff count > n_tokens/2.
    """
    toks = F.split(norm_text_col(text_col), " ")
    hashes = F.transform(toks, lambda t: F.xxhash64(t))
    n = F.size(toks)

    def bit(i: int):
        mask = F.lit(1 << i).cast("long")
        cnt = F.size(F.filter(hashes, lambda h: h.bitwiseAND(mask) != F.lit(0)))
        return (cnt * 2 > n).cast("long") * F.lit(1 << i).cast("long")

    sig = bit(0)
    for i in range(1, bits):
        sig = sig + bit(i)
    return sig


def simhash_duplicates(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 32
) -> DataFrame:
    """Groups of documents with identical simhash signatures."""
    return (
        docs.select(F.col(id_col).alias("id"), simhash_signature(text_col, bits).alias("simhash"))
        .groupBy("simhash")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.array_sort(F.collect_list("id")).alias("doc_ids"))
        .where(F.col("n_docs") > 1)
    )


def embedding_cosine_pairs(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = "label",
    threshold: float = 0.95,
) -> DataFrame:
    """Near-dup pairs by embedding cosine within a blocking key.

    Brute force within block; the ANN/LSH scale path is similarity.py.
    """
    from graphrag_litex_spark.operators.similarity import cosine_col

    base = embeddings.select(
        F.col(id_col).alias("id"),
        *( [F.col(block_col).alias("block")] if block_col else [F.lit(1).alias("block")] ),
        F.col(vec_col).alias("vec"),
    )
    a, b = base.alias("a"), base.alias("b")
    return (
        a.join(b, (F.col("a.block") == F.col("b.block")) & (F.col("a.id") < F.col("b.id")))
        .withColumn("cosine", F.round(cosine_col(F.col("a.vec"), F.col("b.vec")), 6))
        .where(F.col("cosine") >= threshold)
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"), "cosine")
    )
