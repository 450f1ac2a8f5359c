"""graphrag_litex_spark — a PySpark-native knowledge-graph construction engine.

A from-scratch reimplementation of the query/data-processing capabilities of
the GraphRAG-LiteX reference (see SURVEY.md), re-expressed Spark-first:

* per-turn (subj, pred, obj) triple extraction over transcript tables via
  Arrow-batched pandas UDFs (zero per-row Python on the hot path),
* entity linking via blocking-key candidate generation + similarity scoring,
* connected-components canonicalization as iterative hash-join label
  propagation (pure DataFrame loop, no GraphX),
* graph materialization into nodes/edges/claims parquet tables with
  checkpoint-resumable stage boundaries,
* label-propagation community detection + stats, deterministic summarizer,
  and a map/reduce query path,
* a training-data toolbox (dedup, similarity search, text analysis,
  multimodal plumbing) for large-scale corpus curation.

All semantics are documented against the reference at /root/reference with
file:line citations; the implementation is new code designed for Spark's
execution model (Catalyst, AQE, broadcast joins, salted aggregation).
"""

__version__ = "0.1.0"
