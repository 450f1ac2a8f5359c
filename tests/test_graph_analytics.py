"""Graph analytics units: hand-computed triangles / clustering / link
prediction / k-core on small fixtures, cross-checked where cheap against a
brute-force pure-Python computation on a random graph."""

import itertools
import random

import pandas as pd
import pytest
from pyspark.sql import functions as F

from graphrag_litex_spark.operators.graph_analytics import (
    k_core,
    link_prediction,
    triangle_counts,
    undirected_simple,
)


def _edges_df(spark, pairs):
    return spark.createDataFrame(pd.DataFrame(pairs, columns=["src", "dst"]))


# K4 plus a pendant: every K4 vertex is in C(3,2)=3 triangles; the pendant
# in none. Clustering: K4 vertices adjacent to the pendant have degree 4.
K4_PLUS = [
    ("a", "b"), ("a", "c"), ("a", "d"),
    ("b", "c"), ("b", "d"), ("c", "d"),
    ("a", "p"),
]


def test_triangles_k4_plus_pendant(spark):
    rows = {r["vertex"]: r for r in triangle_counts(_edges_df(spark, K4_PLUS)).collect()}
    assert rows["a"]["n_triangles"] == 3 and rows["a"]["degree"] == 4
    for v in "bcd":
        assert rows[v]["n_triangles"] == 3 and rows[v]["degree"] == 3
        assert rows[v]["clustering"] == 1.0
    assert rows["p"]["n_triangles"] == 0 and rows["p"]["clustering"] == 0.0
    # a: 3 triangles among deg-4 neighborhood -> 2*3/(4*3) = 0.5
    assert rows["a"]["clustering"] == 0.5


def test_triangles_ignore_direction_dupes_loops(spark):
    # Same triangle asserted with reversed dupes + a self loop.
    e = [("a", "b"), ("b", "a"), ("b", "c"), ("c", "a"), ("a", "a")]
    rows = {r["vertex"]: r["n_triangles"] for r in triangle_counts(_edges_df(spark, e)).collect()}
    assert rows == {"a": 1, "b": 1, "c": 1}


def _py_triangles(pairs):
    und = {tuple(sorted(p)) for p in pairs if p[0] != p[1]}
    adj = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    t = dict.fromkeys(adj, 0)
    for u, v, w in itertools.combinations(sorted(adj), 3):
        if v in adj[u] and w in adj[u] and w in adj[v]:
            t[u] += 1
            t[v] += 1
            t[w] += 1
    return t, adj


def test_triangles_random_graph_vs_bruteforce(spark):
    rng = random.Random(7)
    verts = [f"v{i}" for i in range(30)]
    pairs = [(rng.choice(verts), rng.choice(verts)) for _ in range(120)]
    want, adj = _py_triangles(pairs)
    got = {r["vertex"]: r["n_triangles"] for r in triangle_counts(_edges_df(spark, pairs)).collect()}
    assert got == want
    assert set(got) == set(adj)


def test_link_prediction_square(spark):
    # Square a-b-c-d-a: the two diagonals (a,c) and (b,d) each share 2
    # neighbors; jaccard = 2/(2+2-2) = 1.0. No other non-edges exist.
    e = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")]
    rows = {(r["a"], r["b"]): r for r in link_prediction(_edges_df(spark, e)).collect()}
    assert set(rows) == {("a", "c"), ("b", "d")}
    assert rows[("a", "c")]["common"] == 2
    assert rows[("a", "c")]["jaccard"] == 1.0


def test_link_prediction_excludes_existing_edges(spark):
    # Triangle: every pair is already an edge -> no predictions.
    e = [("a", "b"), ("b", "c"), ("c", "a")]
    assert link_prediction(_edges_df(spark, e)).count() == 0


def test_link_prediction_center_degree_valve(spark):
    # Star center h connects x,y; valve below h's degree drops the only
    # wedge center, so no candidates survive.
    e = [("h", "x"), ("h", "y")]
    assert link_prediction(_edges_df(spark, e)).count() == 1
    assert link_prediction(_edges_df(spark, e), max_center_degree=1).count() == 0


def _py_kcore(pairs, k):
    und = {tuple(sorted(p)) for p in pairs if p[0] != p[1]}
    adj = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    changed = True
    while changed:
        changed = False
        for v in list(adj):
            if len(adj[v]) < k:
                for n in adj.pop(v):
                    adj[n].discard(v)
                changed = True
    return {v: len(ns) for v, ns in adj.items()}


def test_kcore_peels_tail_chain(spark):
    # Triangle with a tail a-x-y: 2-core = the triangle (peeling y exposes
    # x, peeling x exposes nothing more).
    e = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "x"), ("x", "y")]
    rows = {r["vertex"]: r["core_degree"] for r in k_core(_edges_df(spark, e), 2).collect()}
    assert rows == {"a": 2, "b": 2, "c": 2}


def test_kcore_empty_when_k_too_high(spark):
    e = [("a", "b"), ("b", "c")]
    out = k_core(_edges_df(spark, e), 3)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["vertex", "core_degree"]


def test_kcore_random_graph_vs_bruteforce(spark):
    rng = random.Random(11)
    verts = [f"v{i}" for i in range(40)]
    pairs = [(rng.choice(verts), rng.choice(verts)) for _ in range(100)]
    for k in (2, 3):
        want = _py_kcore(pairs, k)
        got = {r["vertex"]: r["core_degree"] for r in k_core(_edges_df(spark, pairs), k).collect()}
        assert got == want


def test_undirected_simple_dedupes(spark):
    e = [("b", "a"), ("a", "b"), ("a", "a")]
    assert [tuple(r) for r in undirected_simple(_edges_df(spark, e)).collect()] == [("a", "b")]
