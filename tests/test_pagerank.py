"""PageRank operator: differential vs the pure-Python golden + invariants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphrag_litex_spark.operators.pagerank import pagerank
from graphrag_litex_spark.oracle_graph import pagerank_golden


def _spark_ranks(spark, pairs, **kw):
    df = spark.createDataFrame(pairs, "src string, dst string")
    return {r["vertex"]: r["rank"] for r in pagerank(df, **kw).collect()}


def test_path_graph_matches_golden(spark):
    pairs = [("a", "b"), ("b", "c")]
    got = _spark_ranks(spark, pairs)
    want = pagerank_golden({("a", "b"), ("b", "c")})
    assert got.keys() == want.keys()
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-12)
    # symmetry of the path: endpoints equal, middle highest
    assert got["a"] == pytest.approx(got["c"], abs=1e-12)
    assert got["b"] > got["a"]


def test_mass_conserved_and_simple_graph(spark):
    # multi-edges, reversed duplicates, and self-loops must collapse
    pairs = [("a", "b"), ("b", "a"), ("a", "b"), ("a", "a"), ("b", "c"), ("c", "d")]
    got = _spark_ranks(spark, pairs)
    assert len(got) == 4
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    want = pagerank_golden({("a", "b"), ("b", "c"), ("c", "d")})
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-12)


def test_star_graph_hub_dominates(spark):
    pairs = [("hub", f"leaf{i}") for i in range(5)]
    got = _spark_ranks(spark, pairs)
    assert got["hub"] == max(got.values())
    leaves = [v for k, v in got.items() if k != "hub"]
    assert max(leaves) == pytest.approx(min(leaves), abs=1e-12)


def test_partitioning_invariant(spark):
    pairs = [(f"v{i}", f"v{(i * 7) % 23}") for i in range(60)]
    df = spark.createDataFrame(pairs, "src string, dst string")
    a = {r["vertex"]: r["rank"] for r in pagerank(df.repartition(1), iters=5).collect()}
    b = {r["vertex"]: r["rank"] for r in pagerank(df.repartition(11), iters=5).collect()}
    assert a.keys() == b.keys()
    for v in a:
        assert a[v] == pytest.approx(b[v], abs=1e-12)


def test_empty_graph(spark):
    df = spark.createDataFrame([], "src string, dst string")
    assert pagerank(df).count() == 0
    df2 = spark.createDataFrame([("a", "a")], "src string, dst string")
    assert pagerank(df2).count() == 0  # only a self-loop -> empty simple graph


def test_personalized_pagerank_matches_golden(spark):
    pairs = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("x", "y")]
    df = spark.createDataFrame(pairs, "src string, dst string")
    got = {r["vertex"]: r["rank"] for r in pagerank(df, seeds=["a"]).collect()}
    want = pagerank_golden({tuple(p) for p in pairs}, seeds=["a"])
    assert got.keys() == want.keys()
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-12)
    # mass localizes around the seed; the disconnected component gets ~0
    assert got["a"] > got["e"] and got["x"] == pytest.approx(0.0, abs=1e-9)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_personalized_pagerank_no_seeds_in_graph(spark):
    df = spark.createDataFrame([("a", "b")], "src string, dst string")
    assert pagerank(df, seeds=["zzz"]).count() == 0
    assert pagerank(df, seeds=[]).count() == 0


def test_local_search_end_to_end(spark):
    """Question entities seed the walk; neighbors of the seeds outrank the
    rest of the graph."""
    from graphrag_litex_spark.querying.answer import local_search

    canon = spark.createDataFrame(
        [("acme corp", "acme corp"), ("globex", "globex")],
        "norm_name string, canonical string",
    )
    edges = spark.createDataFrame(
        [("acme corp", "alice"), ("alice", "bob"), ("globex", "carol"), ("carol", "dave")],
        "src string, dst string",
    )
    out = local_search({"canon_map": canon, "edges": edges}, "Who acquired ACME Corp?", k=3)
    rows = out.collect()
    names = [r["name"] for r in rows]
    assert names[0] == "acme corp" and "alice" in names[:2]
    # the seed's component outranks the disconnected one (score 0 there)
    assert set(names) == {"acme corp", "alice", "bob"}
    assert all(r["score"] > 0 for r in rows)


def test_local_search_context(spark):
    """Chunks mentioning more / higher-ranked seed-proximate entities
    outrank chunks mentioning fewer."""
    from graphrag_litex_spark.querying.answer import local_search_context

    canon = spark.createDataFrame(
        [("acme corp", "acme corp"), ("alice", "alice"), ("bob", "bob")],
        "norm_name string, canonical string",
    )
    edges = spark.createDataFrame(
        [("acme corp", "alice"), ("alice", "bob")], "src string, dst string"
    )
    mentions = spark.createDataFrame(
        [
            ("c1", "acme corp"), ("c1", "alice"),   # two top entities
            ("c2", "bob"),                           # one, lower-ranked
            ("c2", "bob"),                           # duplicate mention: counted once
        ],
        "chunk_id string, norm_name string",
    )
    kg = {"canon_map": canon, "edges": edges, "mentions": mentions}
    rows = local_search_context(kg, "tell me about ACME corp", k_chunks=5).collect()
    got = {r["chunk_id"]: (r["chunk_score"], r["n_entities"]) for r in rows}
    assert got["c1"][1] == 2 and got["c2"][1] == 1
    assert got["c1"][0] > got["c2"][0]


def test_driver_local_matches_distributed(spark):
    """The adaptive valve (tiny graph -> driver-local power iteration) must
    agree with the distributed hash-join loop far inside the 1e-6 rounding
    the contract publishes — same stance as cc.py's identity test."""
    pairs = [(f"v{i}", f"v{(i * 7) % 23}") for i in range(60)]
    df = spark.createDataFrame(pairs, "src string, dst string")
    local = {r["vertex"]: r["rank"] for r in pagerank(df).collect()}
    dist = {
        r["vertex"]: r["rank"]
        for r in pagerank(df, driver_threshold=0).collect()
    }
    assert local.keys() == dist.keys()
    for v in local:
        assert local[v] == pytest.approx(dist[v], abs=1e-12)


def test_driver_local_matches_distributed_personalized(spark):
    """Same identity for personalized PageRank with DataFrame seeds — the
    DRIFT-search shape — including a seed absent from the graph."""
    pairs = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"), ("x", "y")]
    df = spark.createDataFrame(pairs, "src string, dst string")
    sdf = spark.createDataFrame([("a",), ("c",), ("zz",)], "vertex string")
    local = {r["vertex"]: r["rank"] for r in pagerank(df, seeds=sdf).collect()}
    dist = {
        r["vertex"]: r["rank"]
        for r in pagerank(df, seeds=sdf, driver_threshold=0).collect()
    }
    assert local.keys() == dist.keys() and local
    for v in local:
        assert local[v] == pytest.approx(dist[v], abs=1e-12)


def test_distributed_path_empty_and_no_seed(spark):
    """The distributed loop's empty/seedless exits stay reachable when the
    valve is off."""
    df = spark.createDataFrame([("a", "a")], "src string, dst string")
    assert pagerank(df, driver_threshold=0).count() == 0
    df2 = spark.createDataFrame([("a", "b")], "src string, dst string")
    assert pagerank(df2, seeds=["zzz"], driver_threshold=0).count() == 0


def test_pagerank_dataframe_seeds_identical_to_list(spark):
    """DataFrame-supplied seeds (the DRIFT path) must produce bit-identical
    ranks to the list path, including seeds absent from the graph."""
    import pandas as pd

    from graphrag_litex_spark.operators.pagerank import pagerank

    edges = spark.createDataFrame(
        pd.DataFrame(
            [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"), ("x", "y")],
            columns=["src", "dst"],
        )
    )
    seeds = ["a", "c", "zz-not-in-graph"]
    by_list = {r["vertex"]: r["rank"] for r in pagerank(edges, seeds=seeds).collect()}
    sdf = spark.createDataFrame(pd.DataFrame({"vertex": seeds}))
    by_df = {r["vertex"]: r["rank"] for r in pagerank(edges, seeds=sdf).collect()}
    assert by_list == by_df
    assert by_list  # non-empty: real seeds exist
