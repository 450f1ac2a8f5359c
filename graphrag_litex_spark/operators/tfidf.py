"""TF-IDF document vectors and sparse all-pairs document similarity — the
"find documents about the same thing" primitive a training-data curation
pipeline runs for topic-targeted sampling, retrieval-based filtering, and
near-topic dedup triage (complementing the surface-form near-dup family in
operators/dedup.py).

Everything is relational: tokenize → (doc, term, tf) postings → df counts →
weight/score — no UDFs anywhere, whole-stage codegen end to end.

Scale notes (100 TB):
- The pair stage is a self-join of the postings list on `term`; its cost is
  sum_t df(t)^2. `max_df` is the mandatory valve — it drops the head of the
  Zipf curve (stop-ish terms), which carries ~all of the quadratic cost and
  ~none of the signal. With max_df = D the fan-out is bounded by |vocab|*D^2
  regardless of corpus size, and the hot shuffle carries (doc_id, tf) pairs
  only. min_df=2 prunes hapax terms (they cannot form a pair).
- Postings, df, norms are each ONE hash aggregation; pairs is one shuffle
  join + one aggregation. No driver state, no collect.
- Cosine determinism: `similar_docs` keeps tf counts as integers through
  the dot product and the norms (exact bigint sums, immune to FP reorder),
  so the final score is ONE exactly-rounded double expression —
  bit-identical on any partitioning and any engine. `tfidf_weights`
  (real ln-idf weights) is the floating-point API for model consumers; its
  ln() lives outside the cross-engine contract because libm rounding of ln
  may differ in the last bit across engines (documented divergence; the
  contract query uses the integer-exact scorer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphrag_litex_spark.operators.dedup import norm_text_col


def doc_terms(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """-> (doc_id, term, tf) postings over normalized whitespace tokens
    (same normalization as the dedup family: lower, strip non-alnum,
    collapse whitespace)."""
    from graphrag_litex_spark.operators.iterutils import scale_out

    # One normalization pass per row: explode first and drop the empty
    # term AFTER (an empty normalized doc explodes to exactly one ""
    # token; non-empty norms never produce one) — the doc-level
    # ``where(norm != "")`` form evaluated the regex normalization twice
    # per row, and on a one-file corpus ran it all on one core.
    toks = F.split(norm_text_col(text_col), " ")
    return (
        scale_out(docs, id_col)
        .select(F.col(id_col).alias("doc_id"), F.explode(toks).alias("term"))
        .where(F.col("term") != "")
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def term_df(terms: DataFrame) -> DataFrame:
    """-> (term, df) document frequencies over a postings frame."""
    return terms.groupBy("term").agg(F.count(F.lit(1)).alias("df"))


def tfidf_weights(
    terms: DataFrame, n_docs: int, min_df: int = 1, max_df: int | None = None
) -> DataFrame:
    """-> (doc_id, term, tf, df, weight) with weight = tf * ln(n_docs/df),
    df-bounded to [min_df, max_df]. The standard TF-IDF vectorization for
    downstream model consumers (not part of the cross-engine contract —
    see module docstring)."""
    df_tbl = term_df(terms).where(F.col("df") >= min_df)
    if max_df is not None:
        df_tbl = df_tbl.where(F.col("df") <= max_df)
    return terms.join(df_tbl, "term").select(
        "doc_id",
        "term",
        "tf",
        "df",
        (F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df"))).alias("weight"),
    )


def similar_docs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 2,
    max_df: int | None = None,
) -> DataFrame:
    """Sparse all-pairs cosine over df-filtered tf vectors.

    -> (doc_a, doc_b, dot, cosine) for every pair sharing >= 1 kept term,
    doc_a < doc_b. The idf step is realized as the [min_df, max_df]
    vocabulary filter (which is also the quadratic-cost valve); tf stays
    integer so dot and the norms are EXACT — cosine is a single
    exactly-rounded double op, engine- and partitioning-deterministic.
    """
    terms = doc_terms(docs, id_col, text_col)
    df_tbl = term_df(terms).where(F.col("df") >= min_df)
    if max_df is not None:
        df_tbl = df_tbl.where(F.col("df") <= max_df)
    kept = terms.join(df_tbl.select("term"), "term")
    norms = kept.groupBy("doc_id").agg(F.sum(F.col("tf") * F.col("tf")).alias("n2"))
    a = kept.select(F.col("doc_id").alias("doc_a"), "term", F.col("tf").alias("tf_a"))
    b = kept.select(F.col("doc_id").alias("doc_b"), "term", F.col("tf").alias("tf_b"))
    dots = (
        a.join(b, "term")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.sum(F.col("tf_a") * F.col("tf_b")).alias("dot"))
    )
    na = norms.select(F.col("doc_id").alias("doc_a"), F.col("n2").alias("n2_a"))
    nb = norms.select(F.col("doc_id").alias("doc_b"), F.col("n2").alias("n2_b"))
    return (
        dots.join(na, "doc_a")
        .join(nb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "dot",
            # Cast each norm BEFORE multiplying: the double product is
            # exactly rounded (deterministic) and cannot overflow the way a
            # bigint product of two huge norms could.
            F.round(
                F.col("dot")
                / F.sqrt(F.col("n2_a").cast("double") * F.col("n2_b").cast("double")),
                6,
            ).alias("cosine"),
        )
    )
