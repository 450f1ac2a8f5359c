"""Bucketed warehouse: co-located joins with no Exchange (sinks/warehouse.py).

The point of bucketing is the physical plan, so the assertions here are on
`.explain` output: a join between two bucketed tables on their bucket keys
must contain NO shuffle (Exchange) on either side, while the same join over
plain parquet shuffles both sides.
"""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def warehouse(spark, pipeline_sf0001, tmp_path_factory):
    from graphrag_litex_spark.sinks.warehouse import save_graph_tables

    wh = str(tmp_path_factory.mktemp("warehouse"))
    graph = {
        k: pipeline_sf0001[k]
        for k in ("nodes", "edges", "triples", "summaries", "claims")
    }
    idents = save_graph_tables(graph, prefix="whtest", buckets=8, location=wh)
    yield idents
    for ident in idents.values():
        spark.sql(f"DROP TABLE IF EXISTS {ident}")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark, warehouse):
    nodes = spark.table(warehouse["nodes"])
    edges = spark.table(warehouse["edges"])
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # Force a non-broadcast join so the shuffle question is real.
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = edges.join(nodes, edges.src_id == nodes.entity_id).select(
            "src_id", "dst_id", "canonical_name"
        )
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_unbucketed_join_shuffles(spark, pipeline_sf0001):
    nodes, edges = pipeline_sf0001["nodes"], pipeline_sf0001["edges"]
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan = _plan(edges.join(nodes, edges.src_id == nodes.entity_id))
        assert "Exchange" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_roundtrip_values_and_buckets(spark, warehouse, pipeline_sf0001):
    from graphrag_litex_spark.sinks.warehouse import open_warehouse_graph

    graph = open_warehouse_graph(spark, prefix="whtest")
    assert set(graph) >= {"nodes", "edges", "triples", "summaries"}
    assert graph["nodes"].count() == pipeline_sf0001["nodes"].count()
    assert graph["edges"].count() == pipeline_sf0001["edges"].count()
    # Bucket spec survives the catalog round-trip (assert the exact rows,
    # not substring-anywhere: '8' appears in paths/stats/timestamps too).
    ddl = {r.col_name: r.data_type for r in
           spark.sql(f"DESCRIBE EXTENDED {warehouse['nodes']}").collect()}
    assert ddl.get("Num Buckets") == "8"
    assert "entity_id" in ddl.get("Bucket Columns", "")
    # Unbucketed table also round-trips.
    assert graph["summaries"].count() == pipeline_sf0001["summaries"].count()


def test_claim_entities_bridge_join_no_exchange(spark, warehouse, pipeline_sf0001):
    """Publishing claims derives a (claim_id, entity_id) bridge bucketed on
    entity_id: the claims->nodes join runs with NO Exchange on either side."""
    assert "claim_entities" in warehouse
    bridge = spark.table(warehouse["claim_entities"])
    nodes = spark.table(warehouse["nodes"])
    # one row per (claim, entity) pair; values match the exploded array
    want = {
        (r["claim_id"], e)
        for r in pipeline_sf0001["claims"].collect()
        for e in r["entity_ids"]
    }
    got = {(r["claim_id"], r["entity_id"]) for r in bridge.collect()}
    assert got == want and len(got) > 0
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = bridge.join(nodes, "entity_id").select(
            "claim_id", "entity_id", "canonical_name"
        )
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucket_count_mismatch_rejected(spark, warehouse, pipeline_sf0001, tmp_path):
    """Republishing a subset at a different bucket count must fail loudly —
    it would silently break co-location against the untouched tables."""
    from graphrag_litex_spark.sinks.warehouse import save_graph_tables

    with pytest.raises(ValueError, match="bucket-count mismatch"):
        save_graph_tables(
            {"nodes": pipeline_sf0001["nodes"]},
            prefix="whtest",
            buckets=16,
            location=str(tmp_path / "wh16"),
        )
    # same count is fine (overwrite republish of a subset)
    save_graph_tables(
        {"nodes": pipeline_sf0001["nodes"]},
        prefix="whtest",
        buckets=8,
        location=str(tmp_path / "wh8"),
    )


def test_cli_publish_warehouse(spark, corpus_sf0001, tmp_path, capsys):
    """jobs/publish_warehouse.py over a real build output directory."""
    import jobs.build_graph as build
    import jobs.publish_warehouse as publish

    kg_dir = str(tmp_path / "kg")
    assert build.main(["--transcripts", corpus_sf0001["transcripts"],
                       "--output", kg_dir, "--until", "edges"]) == 0
    rc = publish.main(["--graph", kg_dir, "--prefix", "whcli", "--buckets", "4",
                       "--location", str(tmp_path / "wh")])
    assert rc == 0
    out = capsys.readouterr().out
    assert "table whcli_nodes: published" in out
    assert "table whcli_edges: published" in out
    try:
        nodes, edges = spark.table("whcli_nodes"), spark.table("whcli_edges")
        assert nodes.count() > 0
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plan = _plan(edges.join(nodes, edges.src_id == nodes.entity_id))
            assert "Exchange" not in plan
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    finally:
        for t in ("nodes", "edges", "triples", "mentions", "canon_map", "chunks",
                  "claims", "communities", "community_stats", "summaries"):
            spark.sql(f"DROP TABLE IF EXISTS whcli_{t}")


def test_analyze_publish_records_catalog_stats(spark, pipeline_sf0001, tmp_path):
    from graphrag_litex_spark.sinks.warehouse import save_graph_tables

    idents = save_graph_tables(
        {"nodes": pipeline_sf0001["nodes"]},
        prefix="whstats",
        buckets=8,
        location=str(tmp_path),
        analyze=True,
    )
    try:
        ident = idents["nodes"]
        stats = {
            r.col_name: r.data_type
            for r in spark.sql(f"DESCRIBE EXTENDED {ident}").collect()
        }
        # table-level stats (size + row count) land in the catalog...
        assert "Statistics" in stats
        n = pipeline_sf0001["nodes"].count()
        assert f"{n} rows" in stats["Statistics"]
        # ...and the bucket key carries column stats (distinct-count etc.)
        col = spark.sql(
            f"DESCRIBE EXTENDED {ident} entity_id"
        ).collect()
        got = {r.info_name: r.info_value for r in col}
        assert got.get("distinct_count") not in (None, "NULL")
    finally:
        for i in idents.values():
            spark.sql(f"DROP TABLE IF EXISTS {i}")


def test_verify_publish_attests_fidelity(spark, warehouse, pipeline_sf0001):
    from graphrag_litex_spark.sinks.warehouse import verify_publish

    graph = {
        k: pipeline_sf0001[k]
        for k in ("nodes", "edges", "triples", "summaries", "claims")
    }
    rep = verify_publish(spark, graph, warehouse)
    assert rep and all(v["identical"] for v in rep.values())
    # fidelity check actually discriminates: verify against the WRONG
    # source frame and it must fail
    bad = dict(graph)
    bad["nodes"] = graph["nodes"].limit(5)
    rep2 = verify_publish(spark, bad, {"nodes": warehouse["nodes"]})
    assert rep2["nodes"]["identical"] is False


def test_analyze_tolerates_missing_bucket_key(spark, pipeline_sf0001, tmp_path):
    from graphrag_litex_spark.sinks.warehouse import save_graph_tables

    # nodes without its nominal bucket key saves unbucketed; analyze must
    # not abort the publish on the missing column
    idents = save_graph_tables(
        {"nodes": pipeline_sf0001["nodes"].drop("entity_id")},
        prefix="whnokey",
        buckets=8,
        location=str(tmp_path),
        analyze=True,
    )
    try:
        stats = {
            r.col_name: r.data_type
            for r in spark.sql(f"DESCRIBE EXTENDED {idents['nodes']}").collect()
        }
        assert "Statistics" in stats  # table-level stats still computed
    finally:
        for i in idents.values():
            spark.sql(f"DROP TABLE IF EXISTS {i}")


def test_empty_graph_is_noop(spark):
    from graphrag_litex_spark.sinks.warehouse import save_graph_tables

    assert save_graph_tables({}, prefix="whempty", buckets=8) == {}


def test_two_hop_self_join_shuffles_one_side_only(spark, warehouse):
    """Edges bucket on src_id, so a two-hop self-join (a.dst_id ==
    b.src_id) reads the hop (probe) side Exchange-free and shuffles ONLY
    the dst_id side — exactly one Exchange in the plan, not two."""
    edges = spark.table(warehouse["edges"])
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        a, b = edges.alias("a"), edges.alias("b")
        from pyspark.sql import functions as F

        joined = a.join(b, F.col("a.dst_id") == F.col("b.src_id")).select(
            F.col("a.src_id"), F.col("b.dst_id")
        )
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        assert plan.count("Exchange") == 1, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_transcripts_conv_ops_no_exchange(
    spark, corpus_sf0001, tmp_path_factory
):
    """publish_transcripts buckets the corpus on conv_id: every
    conv_id-clustered operator (transcript stats, integrity, reassembly
    windows) then plans with ZERO Exchange, while the same ops over the
    plain parquet directory shuffle once. Values identical either way."""
    from pyspark.sql import functions as F

    from graphrag_litex_spark.operators.transcripts import (
        conversation_integrity,
        conversation_stats,
    )
    from graphrag_litex_spark.sinks.warehouse import publish_transcripts

    wh = str(tmp_path_factory.mktemp("tr_wh"))
    plain = spark.read.parquet(corpus_sf0001["transcripts"])
    ident = publish_transcripts(plain, ident="whtr_transcripts", buckets=4, location=wh)
    try:
        bucketed = spark.table(ident)
        for op in (conversation_stats, conversation_integrity):
            assert _plan(op(bucketed)).count("Exchange") == 0, op.__name__
            assert _plan(op(plain)).count("Exchange") == 1, op.__name__
        # Reassembly window: ordered collect per conversation, no shuffle.
        from pyspark.sql import Window

        w = Window.partitionBy("conv_id").orderBy("turn_idx")
        reasm = bucketed.withColumn("rn", F.row_number().over(w))
        assert _plan(reasm).count("Exchange") == 0
        # Same values as the plain-parquet path (bucketing is layout only).
        a = {r["conv_id"]: r["n_turns"] for r in conversation_stats(bucketed).collect()}
        b = {r["conv_id"]: r["n_turns"] for r in conversation_stats(plain).collect()}
        assert a == b
        # And the pipeline ingests the catalog table via its table: form.
        from graphrag_litex_spark.plans.pipeline import run_pipeline

        out = str(tmp_path_factory.mktemp("tr_wh_kg"))
        res = run_pipeline(spark, f"table:{ident}", out, resume=False, until="chunks")
        assert res["chunks"].count() == plain.count()
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {ident}")
