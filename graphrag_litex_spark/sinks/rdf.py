"""RDF N-Triples export of the knowledge graph.

The reference materializes its graph as JSON collections
(/root/reference indexing sink); downstream graph consumers (triple
stores, SPARQL engines, graph viz) speak N-Triples. This sink renders the
nodes/edges stage tables to the line-based N-Triples grammar with pure
column expressions — at 100 TB the export is a map-only projection + text
write, no shuffle, embarrassingly parallel.

Determinism contract (oracle-checked by the ``kg_ntriples`` query):
- entity IRIs reuse the pipeline's deterministic ids
  (``<urn:kg:entity:{entity_id}>``, functions/normalize.entity_id),
- predicate IRIs are lowercase ``[a-z0-9]``-slugs
  (``<urn:kg:pred:partners_with>``),
- node labels are quoted literals with backslash/quote escaping per the
  N-Triples spec.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _escaped(col):
    # N-Triples literal escaping: backslash first, then quote and the
    # control characters the grammar forbids raw inside a literal
    # (newline / CR / tab) — a raw newline would split the record across
    # lines and break every line-based .nt loader.
    out = F.regexp_replace(F.regexp_replace(col, r"\\", r"\\\\"), '"', r'\\"')
    out = F.regexp_replace(out, "\n", r"\\n")
    out = F.regexp_replace(out, "\r", r"\\r")
    return F.regexp_replace(out, "\t", r"\\t")


def _pred_slug(col):
    return F.regexp_replace(F.lower(col), "[^a-z0-9]+", "_")


def kg_to_ntriples(nodes: DataFrame, edges: DataFrame, base: str = "urn:kg") -> DataFrame:
    """-> one-column frame ``line`` with a label triple per node and a
    relation triple per merged edge."""
    labels = nodes.select(
        F.concat(
            F.lit(f"<{base}:entity:"),
            F.col("entity_id"),
            F.lit(f"> <{base}:label> \""),
            _escaped(F.col("canonical_name")),
            F.lit('" .'),
        ).alias("line")
    )
    rels = edges.select(
        F.concat(
            F.lit(f"<{base}:entity:"),
            F.col("src_id"),
            F.lit(f"> <{base}:pred:"),
            _pred_slug(F.col("pred")),
            F.lit(f"> <{base}:entity:"),
            F.col("dst_id"),
            F.lit("> ."),
        ).alias("line")
    )
    return labels.unionByName(rels)


def write_ntriples(lines: DataFrame, path: str) -> None:
    """Write the line frame as .nt text part-files (map-only, one file per
    partition — the layout a bulk triple-store loader ingests in parallel)."""
    lines.write.mode("overwrite").text(path)
