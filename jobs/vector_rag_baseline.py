"""J5: VectorRAG baseline (reference baselines/vector_rag.py:10-58).

The reference's baseline is: chunk all documents -> embed chunks -> for each
question, cosine top-k chunks -> context prompt -> one LLM answer. Here the
same pipeline as a Spark job over a documents table: the B1 token-window
chunker, the engine's deterministic hashing embedder standing in for MiniLM
(same slot, querying/answer.py), brute-force top-k (TakeOrderedAndProject),
and a deterministic context-concatenation "answer" standing in for the LLM
call — every stage pluggable with the real models.

Run: python3 jobs/vector_rag_baseline.py [sf_dir] [question...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphrag_litex_spark.operators.chunking import chunk_documents_windowed
from graphrag_litex_spark.operators.similarity import brute_force_topk
from graphrag_litex_spark.querying.answer import EMBED_DIM, make_embed_udf


def embed_chunks(chunks: DataFrame, dim: int = EMBED_DIM) -> DataFrame:
    """Chunk embedding table (reference: model.encode over all chunks)."""
    return chunks.withColumn("embedding", make_embed_udf(dim)(F.col("text")))


def vector_rag_topk(
    chunk_embeddings: DataFrame, question: str, k: int = 5, dim: int = EMBED_DIM
) -> DataFrame:
    """Top-k chunks for a question by embedding cosine -> (chunk_id, text,
    cosine); the retrieval half of the baseline (vector_rag.py:33-40)."""
    from graphrag_litex_spark.functions.normalize import hash_embed

    qv = hash_embed(question, dim)
    ranked = brute_force_topk(
        chunk_embeddings, qv, k=k, id_col="chunk_id", vec_col="embedding"
    )
    return ranked.join(
        chunk_embeddings.select("chunk_id", "text"), "chunk_id"
    ).orderBy(F.col("cosine").desc(), F.col("chunk_id").asc())


def answer_with_context(topk_rows: list, question: str) -> dict:
    """Deterministic 'answer': the reference feeds the joined context to one
    LLM call (vector_rag.py:42-53); the sandbox substitution returns the
    context verbatim with provenance."""
    context = "\n\n".join(r["text"] for r in topk_rows)
    return {
        "question": question,
        "answer": context,
        "used_chunks": [r["chunk_id"] for r in topk_rows],
    }


def run_vector_rag(
    spark: SparkSession,
    documents: DataFrame,
    questions: list[str],
    top_k: int = 5,
    chunk_size: int = 600,
    overlap: int = 100,
) -> list[dict]:
    chunks = chunk_documents_windowed(documents, chunk_size=chunk_size, overlap=overlap)
    emb = embed_chunks(chunks)
    emb.persist()  # scored once per question, like the reference's one encode pass
    try:
        return [
            answer_with_context(vector_rag_topk(emb, q, k=top_k).collect(), q)
            for q in questions
        ]
    finally:
        emb.unpersist()


def main() -> None:
    from graphrag_litex_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    questions = sys.argv[2:] or ["what is this corpus about"]
    spark = get_spark(app_name="vector_rag_baseline")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    for ans in run_vector_rag(spark, docs, questions):
        print(ans["question"], "->", ans["used_chunks"])


if __name__ == "__main__":
    main()
