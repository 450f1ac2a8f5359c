"""Cross-document duplicate-SPAN detection and removal (ExactSubstr-style).

Doc-level dedup (exact / MinHash / SimHash, operators/dedup.py) misses the
dominant failure mode of web corpora: long byte-identical passages embedded
in otherwise-distinct documents (licence blocks, navigation chrome, quoted
chain mail, syndicated paragraphs). Lee et al. 2022 ("Deduplicating
Training Data Makes Language Models Better", ACL) remove every repeated
substring of >= 50 tokens, keeping one occurrence corpus-wide; this module
is that operator re-expressed relationally at token-window granularity:

  1. tokenize each doc on whitespace (output text is single-space
     normalized — the one documented divergence from byte-exact ExactSubstr,
     which needs suffix arrays; windowed hashing is the standard
     distributed approximation),
  2. hash every window of ``k`` consecutive tokens (one fused
     ``xxhash64(array_join(slice(...)))`` projection — JVM-side, no UDF),
  3. one corpus-wide groupBy(hash) counts occurrences and elects the
     KEEPER occurrence (global min (doc_id, pos) — deterministic under any
     partitioning),
  4. non-keeper occurrences of repeated windows become remove-intervals;
     a per-doc sweep (running-max window) merges overlaps, and the kept
     complement segments are re-joined from the token array — all
     whole-stage-codegen expressions.

Scale notes (100 TB): the occurrence table has ~one row per corpus token —
the same order as the shingle stream MinHash already processes; the single
hash-shuffle is the algorithm's cost floor and combines map-side (count +
min). Boilerplate mega-hashes (df in the millions) are the classic skew
key: ``max_occurrences`` drops them from REMOVAL (matching ExactSubstr
deployments, which excise boilerplate with dedicated filters instead of
excising chrome from every page — see operators/scrub.strip_boilerplate)
while still reporting them in stats; AQE skew-join splitting covers the
moderate tail. Spans per doc are bounded by doc length, so every per-doc
window/aggregate is partition-local after one repartition(id).

Reference parity: the reference repo has no span dedup (its corpus is
conversational); this is a build-prompt training-data-toolbox requirement.
Golden: oracle_docops.span_dedup_golden replicates steps 1-4 bit-for-bit
in pure Python via the XXH64 replica.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# ASCII unit separator (0x1f) between tokens inside a window hash. Java's
# ASCII ``\s`` class does NOT include 0x1f, so tokenization treats it as a
# separator EXPLICITLY (split class below includes \x1f): tokens can then
# never contain SEP, and distinct token sequences can never collide by
# concatenation (["ab","c"] vs ["a","bc"], or adversarial embedded 0x1f
# like ["x\x1fy","z"] vs ["x","y\x1fz"]). Spelled chr(31) in the SQL
# expression to dodge string-literal escape dialects.
SEP = "\x1f"


def _tokenized(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, toks array<string>, n_tok) — whitespace tokens of the raw text
    (exact-substring semantics: NO lowercasing/punctuation folding; empty /
    null / all-whitespace docs yield n_tok = 0). Split on Java
    ``[\\s\\x1f]+`` with empty fragments filtered, so leading/trailing/odd
    whitespace can never mint "" tokens and no token can contain the 0x1f
    window-hash separator (the golden replicates Java's ASCII ``\\s``
    class + 0x1f, oracle_docops.span goldens)."""
    toks = F.filter(F.split(F.col(text_col), r"[\s\x1f]+"), lambda x: x != "")
    toks = F.coalesce(toks, F.array().cast("array<string>"))
    return docs.select(
        F.col(id_col).alias("id"),
        toks.alias("toks"),
    ).withColumn("n_tok", F.size("toks"))


def _window_occurrences(tok: DataFrame, k: int) -> DataFrame:
    """One row per k-token window occurrence: (id, pos, h). pos is 1-based
    token index of the window start; docs with fewer than k tokens emit no
    windows (too short to contain a duplicated span of length k)."""
    spark = tok.sparkSession
    n_part = max(spark.sparkContext.defaultParallelism * 2, 8)
    # Hash-partition DOC rows before the explode: the per-doc windows later
    # (sweep merge, segment rebuild) then need no further exchange.
    base = tok.where(F.col("n_tok") >= k).repartition(n_part, "id")
    return base.select(
        "id",
        F.explode(F.sequence(F.lit(1), F.col("n_tok") - k + 1)).alias("pos"),
        F.xxhash64(F.expr(f"array_join(slice(toks, pos, {k}), chr(31))")).alias("h"),
    )


def duplicate_span_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
) -> DataFrame:
    """Per-doc exposure to corpus-duplicated spans ->
    (doc_id, n_tok, n_windows, n_dup_windows, dup_tokens, dup_token_frac).

    A window is "duplicated" when its k-token hash occurs more than once
    corpus-wide (across docs OR repeated within one doc). ``dup_tokens``
    counts tokens covered by the union of duplicated windows (overlapping
    windows merged by a running-max sweep, so a 100-token verbatim passage
    counts ~100, not 93 * k). The fraction is the Gopher/ExactSubstr-style
    "fraction of text that is duplicated elsewhere" curation signal.
    """
    tok = _tokenized(docs, id_col, text_col)
    occ = _window_occurrences(tok, k)
    counts = occ.groupBy("h").agg(F.count(F.lit(1)).alias("n_occ"))
    dup = (
        occ.join(counts.where(F.col("n_occ") > 1), "h", "inner")
        .select("id", "pos", (F.col("pos") + k - 1).alias("end"))
    )
    w = Window.partitionBy("id").orderBy("pos")
    prev_max = F.max("end").over(w.rowsBetween(Window.unboundedPreceding, -1))
    covered = dup.select(
        "id",
        F.greatest(
            F.lit(0),
            F.col("end") - F.greatest(F.col("pos") - 1, F.coalesce(prev_max, F.lit(0))),
        ).alias("cov"),
    )
    per_doc = covered.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_dup_windows"), F.sum("cov").alias("dup_tokens")
    )
    return (
        tok.join(per_doc, "id", "left")
        .select(
            F.col("id").alias("doc_id"),
            "n_tok",
            F.greatest(F.col("n_tok") - k + 1, F.lit(0)).alias("n_windows"),
            F.coalesce("n_dup_windows", F.lit(0)).cast("long").alias("n_dup_windows"),
            F.coalesce("dup_tokens", F.lit(0)).cast("long").alias("dup_tokens"),
        )
        .withColumn(
            "dup_token_frac",
            F.when(F.col("n_tok") > 0, F.col("dup_tokens") / F.col("n_tok")).otherwise(
                F.lit(0.0)
            ),
        )
    )


def remove_duplicate_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    max_occurrences: int | None = None,
) -> DataFrame:
    """ExactSubstr-style span excision -> (doc_id, text, n_tok,
    removed_tokens): every occurrence of a corpus-repeated k-token window is
    removed EXCEPT the keeper — the globally-first occurrence under
    (doc_id, pos) ordering — so exactly one copy of each duplicated passage
    survives the corpus (Lee et al. 2022 §3; keeper choice is theirs up to
    tie order, and is a pure function of the data: partitioning/resume
    invariant).

    Overlapping remove-windows merge before excision, so a long verbatim
    passage is cut as ONE span; the kept remainder is re-joined with single
    spaces (tokenization is whitespace-normalizing, see module docstring).
    ``max_occurrences``: windows repeated more than this many times
    (boilerplate chrome) are LEFT IN PLACE rather than excised from
    millions of docs — they are a filtering problem (strip_boilerplate),
    not a dedup problem, and they are exactly the join keys that would skew
    the shuffle. None = no cap.
    """
    tok = _tokenized(docs, id_col, text_col)
    occ = _window_occurrences(tok, k)
    # Keeper election folded into the SAME aggregate as the count: one
    # map-side-combined shuffle on h.
    agg = occ.groupBy("h").agg(
        F.count(F.lit(1)).alias("n_occ"),
        F.min(F.struct("id", "pos")).alias("keeper"),
    )
    dup = agg.where(F.col("n_occ") > 1)
    if max_occurrences is not None:
        dup = dup.where(F.col("n_occ") <= max_occurrences)
    rm = (
        occ.join(dup, "h", "inner")
        .where(~((F.col("id") == F.col("keeper.id")) & (F.col("pos") == F.col("keeper.pos"))))
        .select("id", F.col("pos").alias("s"), (F.col("pos") + k - 1).alias("e"))
    )
    # Merge overlapping/adjacent remove-intervals: new group whenever this
    # interval starts past the running max end + 1.
    w = Window.partitionBy("id").orderBy("s")
    prev_max = F.max("e").over(w.rowsBetween(Window.unboundedPreceding, -1))
    grouped = rm.withColumn(
        "gid",
        F.sum(
            F.when(F.col("s") > F.coalesce(prev_max, F.lit(0)) + 1, 1).otherwise(0)
        ).over(w),
    )
    merged = grouped.groupBy("id", "gid").agg(F.min("s").alias("rs"), F.max("e").alias("re"))
    # Kept complement segments: the gap before each remove-interval plus the
    # tail after the last one; segments collected per doc as (start, len)
    # structs — array_sort orders by start (first struct field).
    w2 = Window.partitionBy("id").orderBy("rs")
    prev_re = F.coalesce(F.lag("re").over(w2), F.lit(0))
    gaps = merged.select(
        "id",
        F.struct((prev_re + 1).alias("gs"), (F.col("rs") - prev_re - 1).alias("glen")).alias(
            "seg"
        ),
        F.col("re").alias("re"),
        F.row_number().over(w2.orderBy(F.col("rs").desc())).alias("rn_desc"),
    )
    head_segs = gaps.select("id", "seg")
    tail_segs = gaps.where(F.col("rn_desc") == 1).select(
        "id",
        F.struct(
            (F.col("re") + 1).alias("gs"), F.lit(None).cast("int").alias("glen")
        ).alias("seg"),
    )
    segs = (
        head_segs.unionByName(tail_segs)
        .groupBy("id")
        .agg(F.array_sort(F.collect_list("seg")).alias("segs"))
    )
    kept = (
        tok.join(segs, "id", "left")
        .withColumn(
            "kept_toks",
            F.when(
                F.col("segs").isNull(), F.col("toks")  # no removals in this doc
            ).otherwise(
                F.flatten(
                    F.expr(
                        "transform(segs, x -> slice(toks, x.gs, "
                        "coalesce(x.glen, greatest(n_tok - x.gs + 1, 0))))"
                    )
                )
            ),
        )
    )
    return kept.select(
        F.col("id").alias("doc_id"),
        F.array_join("kept_toks", " ").alias("text"),
        F.size("kept_toks").alias("n_tok"),
        (F.col("n_tok") - F.size("kept_toks")).cast("long").alias("removed_tokens"),
    )
