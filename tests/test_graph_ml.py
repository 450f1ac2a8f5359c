"""Units for snapshot_diff, graph_integrity_report, and the graph-ML
training-data generators (negative_samples, random_walks).

The md5-driven generators are compared against bit-exact pure-Python
replicas (hashlib.md5 over the same '|'-joined strings) — the same
differential style as the dedup/fingerprint goldens.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from graphrag_litex_spark.operators.graph_ml import (
    negative_samples,
    random_walks,
    walk_cooccurrence,
)
from graphrag_litex_spark.operators.integrity import graph_integrity_report
from graphrag_litex_spark.operators.snapshots import snapshot_diff


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


# ---------------------------------------------------------------- snapshot


def test_snapshot_diff_statuses(spark):
    old = spark.createDataFrame(
        [("a", "b", 1.0), ("a", "c", 2.0), ("x", "y", 3.0), ("n", "n2", None)],
        "src string, dst string, w double",
    )
    new = spark.createDataFrame(
        [("a", "b", 1.0), ("a", "c", 9.0), ("p", "q", 4.0), ("n", "n2", None)],
        "src string, dst string, w double",
    )
    out = {
        (r["src"], r["dst"]): (r["status"], r["w_old"], r["w_new"])
        for r in snapshot_diff(old, new, ["src", "dst"], ["w"]).collect()
    }
    assert out[("a", "b")] == ("stable", 1.0, 1.0)
    assert out[("a", "c")] == ("changed", 2.0, 9.0)
    assert out[("x", "y")] == ("removed", 3.0, None)
    assert out[("p", "q")] == ("added", None, 4.0)
    # null == null is stable (eqNullSafe), not changed
    assert out[("n", "n2")] == ("stable", None, None)


def test_snapshot_diff_null_vs_value_is_changed(spark):
    old = spark.createDataFrame([("k", None)], "k string, v string")
    new = spark.createDataFrame([("k", "x")], "k string, v string")
    [r] = snapshot_diff(old, new, ["k"], ["v"]).collect()
    assert r["status"] == "changed"


def test_snapshot_diff_missing_column_raises(spark):
    old = spark.createDataFrame([("k", 1)], "k string, v int")
    new = spark.createDataFrame([("k",)], "k string")
    try:
        snapshot_diff(old, new, ["k"], ["v"])
        raise AssertionError("expected ValueError")
    except ValueError as ex:
        assert "v" in str(ex)


# ---------------------------------------------------------------- integrity


def _report(spark, nodes, edges, canon):
    n = spark.createDataFrame(nodes, "canonical_name string")
    e = spark.createDataFrame(edges, "src string, dst string")
    c = spark.createDataFrame(canon, "norm_name string, canonical string")
    return {
        r["check"]: r["value"]
        for r in graph_integrity_report(n, e, c).collect()
    }


def test_integrity_clean_graph(spark):
    rep = _report(
        spark,
        [("Alpha",), ("Beta",), ("Gamma",)],
        [("Alpha", "Beta")],
        [("alpha", "Alpha"), ("beta", "Beta"), ("gamma", "Gamma")],
    )
    assert rep["nodes_total"] == 3
    assert rep["edges_total"] == 1
    assert rep["dangling_endpoints"] == 0
    assert rep["orphan_nodes"] == 1  # Gamma has no edge
    assert rep["self_loops"] == 0
    assert rep["duplicate_edge_keys"] == 0
    assert rep["canon_targets_missing"] == 0
    assert rep["canon_non_idempotent"] == 0


def test_integrity_planted_violations(spark):
    rep = _report(
        spark,
        [("Alpha",), ("Beta",)],
        # Ghost endpoint, a self loop, and a duplicated (src, dst) key.
        [("Alpha", "Ghost"), ("Alpha", "Alpha"), ("Alpha", "Beta"), ("Alpha", "Beta")],
        # Zed's canon target has no node; "Alpha" normalizes to "alpha"
        # which maps to Beta -> non-idempotent.
        [("alpha", "Alpha"), ("zed", "Zed"), ("alpha", "Beta")],
    )
    assert rep["dangling_endpoints"] == 1  # Ghost
    assert rep["self_loops"] == 1
    assert rep["duplicate_edge_keys"] == 1
    assert rep["canon_targets_missing"] == 1  # Zed has no node row
    # Alpha's norm maps (also) to Beta; Beta's norm row is absent (inner
    # join -> not counted here); Zed's norm maps to Zed only.
    assert rep["canon_non_idempotent"] == 1


# ----------------------------------------------------------------- negatives


TRIPLES = [
    ("Alpha", "uses", "Tooling"),
    ("Alpha", "uses", "Beta"),
    ("Beta", "calls", "Gamma"),
    ("Gamma", "uses", "Alpha"),
]
ENTITIES = ["Alpha", "Beta", "Gamma", "Delta", "Tooling", "Omega"]


def _negatives_golden(triples, entities, k, pool_size, seed=""):
    pool = sorted(set(entities), key=lambda e: (_md5(f"{seed}|{e}"), e))[:pool_size]
    true = set(triples)
    out = []
    for s, p in sorted({(s, p) for s, p, _ in triples}):
        cands = [
            c for c in pool if c != s and (s, p, c) not in true
        ]
        cands.sort(key=lambda c: (_md5(f"{seed}|{s}|{p}|{c}"), c))
        out += [(s, p, c, i + 1) for i, c in enumerate(cands[:k])]
    return sorted(out)


def test_negative_samples_matches_golden(spark):
    t = spark.createDataFrame(TRIPLES, "subj string, pred string, obj string")
    e = spark.createDataFrame([(x,) for x in ENTITIES], "name string")
    got = sorted(
        tuple(r) for r in negative_samples(t, e, k=3, pool_size=4).collect()
    )
    assert got == _negatives_golden(TRIPLES, ENTITIES, k=3, pool_size=4)


def test_negative_samples_never_true_or_reflexive(spark):
    t = spark.createDataFrame(TRIPLES, "subj string, pred string, obj string")
    e = spark.createDataFrame([(x,) for x in ENTITIES], "name string")
    rows = negative_samples(t, e, k=10, pool_size=100).collect()
    true = set(TRIPLES)
    for r in rows:
        assert (r["subj"], r["pred"], r["neg_obj"]) not in true
        assert r["neg_obj"] != r["subj"]
        assert 1 <= r["rank"] <= 10


def _negatives_subj_golden(triples, entities, k, pool_size, seed=""):
    pool = sorted(set(entities), key=lambda e: (_md5(f"{seed}|{e}"), e))[:pool_size]
    true = set(triples)
    out = []
    for p, o in sorted({(p, o) for _, p, o in triples}):
        cands = [c for c in pool if c != o and (c, p, o) not in true]
        cands.sort(key=lambda c: (_md5(f"{seed}|{o}|{p}|{c}"), c))
        out += [(c, p, o, i + 1) for i, c in enumerate(cands[:k])]
    return sorted(out)


def test_negative_samples_subject_corruption(spark):
    t = spark.createDataFrame(TRIPLES, "subj string, pred string, obj string")
    e = spark.createDataFrame([(x,) for x in ENTITIES], "name string")
    got = sorted(
        tuple(r)
        for r in negative_samples(t, e, k=3, pool_size=4, corrupt="subj").collect()
    )
    assert got == _negatives_subj_golden(TRIPLES, ENTITIES, k=3, pool_size=4)
    true = set(TRIPLES)
    for s, p, o, rank in got:
        assert (s, p, o) not in true and s != o and 1 <= rank <= 3
    try:
        negative_samples(t, e, corrupt="both")
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_negative_samples_seed_changes_picks(spark):
    t = spark.createDataFrame(TRIPLES, "subj string, pred string, obj string")
    e = spark.createDataFrame([(x,) for x in ENTITIES], "name string")
    a = sorted(tuple(r) for r in negative_samples(t, e, k=2, pool_size=3).collect())
    b = sorted(
        tuple(r)
        for r in negative_samples(t, e, k=2, pool_size=3, seed="s1").collect()
    )
    assert a == _negatives_golden(TRIPLES, ENTITIES, 2, 3)
    assert b == _negatives_golden(TRIPLES, ENTITIES, 2, 3, seed="s1")
    assert a != b


# --------------------------------------------------------------------- walks


EDGES = [
    ("a", "b"),
    ("b", "c"),
    ("c", "d"),
    ("d", "a"),
    ("b", "d"),
    ("e", "e"),  # self loop: dropped; e never walks
]


def _walks_golden(edges, length, walks_per_node, seed=""):
    adj: dict[str, set[str]] = {}
    for s, d in edges:
        if s == d:
            continue
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    out = []
    for start in sorted(adj):
        for w in range(walks_per_node):
            cur, path = start, [start]
            for step in range(1, length + 1):
                cur = min(
                    adj[cur],
                    key=lambda nb: (_md5(f"{seed}|{start}|{w}|{step}|{nb}"), nb),
                )
                path.append(cur)
            out.append((start, w, " -> ".join(path), cur))
    return sorted(out)


def test_random_walks_matches_golden(spark):
    e = spark.createDataFrame(EDGES, "src string, dst string")
    walks = random_walks(e, length=5, walks_per_node=2, checkpoint_every=2)
    got = sorted(
        tuple(r)
        for r in walks.select("start", "walk_idx", "path", "end_node").collect()
    )
    assert got == _walks_golden(EDGES, 5, 2)
    # the lossless array agrees with its rendered path
    for r in walks.collect():
        assert " -> ".join(r["nodes"]) == r["path"]
    # full length: every path has length+1 nodes; self-loop node absent
    assert all(p.count(" -> ") == 5 for _, _, p, _ in got)
    assert not any(s == "e" for s, _, _, _ in got)


def test_random_walks_forced_path(spark):
    # Path graph a-b: from a every step must bounce to b and back.
    e = spark.createDataFrame([("a", "b")], "src string, dst string")
    rows = {r["start"]: r["path"] for r in random_walks(e, length=3).collect()}
    assert rows == {"a": "a -> b -> a -> b", "b": "b -> a -> b -> a"}


def test_random_walks_seeded_divergence(spark):
    e = spark.createDataFrame(EDGES, "src string, dst string")
    a = sorted(
        tuple(r)
        for r in random_walks(e, length=4, seed="x")
        .select("start", "walk_idx", "path", "end_node")
        .collect()
    )
    assert a == _walks_golden(EDGES, 4, 1, seed="x")


# ------------------------------------------------------------- cooccurrence


def _cooc_golden(paths, window):
    from collections import Counter

    c: Counter = Counter()
    for p in paths:
        toks = p.split(" -> ")
        for i in range(len(toks) - 1):
            for j in range(i + 1, min(i + window, len(toks) - 1) + 1):
                a, b = sorted((toks[i], toks[j]))
                if a != b:
                    c[(a, b)] += 1
    return sorted((a, b, n) for (a, b), n in c.items())


def test_walk_cooccurrence_hand_computed(spark):
    w = spark.createDataFrame(
        [("a -> b -> c -> d",), ("x -> y",)], "path string"
    )
    got = sorted(
        tuple(r) for r in walk_cooccurrence(w, window=2).collect()
    )
    assert got == [
        ("a", "b", 1),
        ("a", "c", 1),
        ("b", "c", 1),
        ("b", "d", 1),
        ("c", "d", 1),
        ("x", "y", 1),
    ]


def test_walk_cooccurrence_revisits_and_window(spark):
    # Revisit a->b->a: (a,b) twice within window 1; self-pair (a,a) at
    # distance 2 must be DROPPED at window 2.
    w = spark.createDataFrame([("a -> b -> a",)], "path string")
    got1 = sorted(tuple(r) for r in walk_cooccurrence(w, window=1).collect())
    got2 = sorted(tuple(r) for r in walk_cooccurrence(w, window=2).collect())
    assert got1 == [("a", "b", 2)]
    assert got2 == [("a", "b", 2)]  # (a,a) dropped


def test_walk_cooccurrence_matches_golden_on_real_walks(spark):
    e = spark.createDataFrame(EDGES, "src string, dst string")
    walks = random_walks(e, length=5, walks_per_node=2)
    paths = [r["path"] for r in walks.collect()]
    got = sorted(
        tuple(r) for r in walk_cooccurrence(walks, window=3).collect()
    )
    assert got == _cooc_golden(paths, 3)


def test_walks_per_node_zero_raises(spark):
    e = spark.createDataFrame([("a", "b")], "src string, dst string")
    try:
        random_walks(e, length=2, walks_per_node=0)
        raise AssertionError("expected ValueError")
    except ValueError as ex:
        assert "walks_per_node" in str(ex)


def test_walk_cooccurrence_separator_in_node_names(spark):
    # A node literally named 'a -> b' must not be split into phantom
    # nodes: the lossless array column wins over the rendered path.
    e = spark.createDataFrame(
        [("a -> b", "c"), ("c", "d")], "src string, dst string"
    )
    walks = random_walks(e, length=2, walks_per_node=1)
    got = sorted(
        tuple(r) for r in walk_cooccurrence(walks, window=2).collect()
    )
    names = {n for a, b, _ in got for n in (a, b)}
    assert "a -> b" in names and "a" not in names and "b" not in names


def test_walk_cooccurrence_degenerate_rows(spark):
    # Single-node paths produce nothing (and must not trip the descending-
    # sequence trap); empty frame stays typed.
    w = spark.createDataFrame([("solo",), ("a -> b",)], "path string")
    got = sorted(tuple(r) for r in walk_cooccurrence(w, window=4).collect())
    assert got == [("a", "b", 1)]


def test_ppmi_matches_math_log(spark):
    import math

    from graphrag_litex_spark.operators.graph_ml import ppmi_weights

    rows = [("a", "b", 4), ("a", "c", 1), ("c", "d", 1)]
    cooc = spark.createDataFrame(rows, "node_a string, node_b string, n_cooc long")
    t = sum(n for _, _, n in rows)
    m: dict[str, int] = {}
    for x, y, n in rows:
        m[x] = m.get(x, 0) + n
        m[y] = m.get(y, 0) + n
    got = {(r["node_a"], r["node_b"]): r for r in ppmi_weights(cooc).collect()}
    assert len(got) == 3
    for x, y, n in rows:
        want = max(0.0, math.log(n * t / (m[x] * m[y])))
        assert abs(got[(x, y)]["ppmi"] - want) < 1e-12
        assert got[(x, y)]["n_cooc"] == n
    # the exclusive rare pair (c,d) is more informative than the hub pair
    assert got[("c", "d")]["ppmi"] > got[("a", "b")]["ppmi"] > 0.0


def test_ppmi_negative_pmi_clamped_to_zero(spark):
    import math

    from graphrag_litex_spark.operators.graph_ml import ppmi_weights

    rows = [("a", "b", 8), ("a", "c", 1), ("b", "c", 1)]
    # raw PMI of (a, b) is negative (8*10 / (9*9) < 1) -> must clamp to 0
    assert math.log(8 * 10 / (9 * 9)) < 0
    cooc = spark.createDataFrame(rows, "node_a string, node_b string, n_cooc long")
    got = {(r["node_a"], r["node_b"]): r["ppmi"] for r in ppmi_weights(cooc).collect()}
    assert got[("a", "b")] == 0.0
    assert all(v >= 0.0 for v in got.values())


# ----------------------------------------------------------------- ontology


def test_predicate_signatures_hand_computed(spark):
    from graphrag_litex_spark.operators.ontology import predicate_signatures

    t = spark.createDataFrame(
        [
            ("Alpha", "uses", "Tool1"),
            ("Alpha", "uses", "Tool1"),  # duplicate observation: counts once
            ("Alpha", "uses", "Tool2"),
            ("Beta", "uses", "Tool1"),
            ("Alpha", "calls", "Beta"),
            ("Alpha", "uses", "Ghost"),  # endpoint without a type: dropped
        ],
        "subj string, pred string, obj string",
    )
    ty = spark.createDataFrame(
        [("Alpha", "person"), ("Beta", "person"), ("Tool1", "tool"), ("Tool2", "tool")],
        "name string, type string",
    )
    got = {
        (r["subj_type"], r["pred"], r["obj_type"]): (
            r["n_triples"],
            r["n_subjects"],
            r["n_objects"],
        )
        for r in predicate_signatures(t, ty).collect()
    }
    assert got == {
        ("person", "uses", "tool"): (3, 2, 2),
        ("person", "calls", "person"): (1, 1, 1),
    }


def test_filter_by_signature_support(spark):
    from graphrag_litex_spark.operators.ontology import filter_by_signature_support

    t = spark.createDataFrame(
        [
            ("A", "uses", "T1"),
            ("A", "uses", "T1"),  # duplicate observation: one DISTINCT triple
            ("B", "uses", "T2"),
            ("A", "ate", "T1"),  # singleton signature: dropped at min_support=2
            ("A", "uses", "Ghost"),  # untyped endpoint: dropped
        ],
        "subj string, pred string, obj string",
    )
    ty = spark.createDataFrame(
        [("A", "person"), ("B", "person"), ("T1", "tool"), ("T2", "tool")],
        "name string, type string",
    )
    kept = filter_by_signature_support(t, ty, min_support=2).collect()
    # both observations of (A,uses,T1) survive, plus (B,uses,T2): the
    # person-uses-tool signature has support 2 (distinct triples)
    assert sorted((r["subj"], r["pred"], r["obj"]) for r in kept) == [
        ("A", "uses", "T1"),
        ("A", "uses", "T1"),
        ("B", "uses", "T2"),
    ]
    assert all(r["sig_support"] == 2 for r in kept)
    assert all(
        (r["subj_type"], r["obj_type"]) == ("person", "tool") for r in kept
    )
    # min_support=1 keeps the singleton signature too (but never Ghost)
    k1 = filter_by_signature_support(t, ty, min_support=1).collect()
    assert ("A", "ate", "T1") in {(r["subj"], r["pred"], r["obj"]) for r in k1}
    assert "Ghost" not in {r["obj"] for r in k1}


def test_type_cooccurrence_symmetric_collapse(spark):
    from graphrag_litex_spark.operators.ontology import type_cooccurrence

    t = spark.createDataFrame(
        [("A", "p", "T"), ("T2", "q", "B")],
        "subj string, pred string, obj string",
    )
    ty = spark.createDataFrame(
        [("A", "person"), ("B", "person"), ("T", "tool"), ("T2", "tool")],
        "name string, type string",
    )
    got = sorted(tuple(r) for r in type_cooccurrence(t, ty).collect())
    # person->tool and tool->person collapse to one undirected pair
    assert got == [("person", "tool", 2)]


# ---------------------------------------------------------------- node2vec


def _node2vec_golden(edges, length, walks_per_node, wr, wc, wf, seed=""):
    """Pure-Python replica of the replica-argmin biased walk: every
    candidate gets w md5 draws (replica 0..w-1); argmin over all draws."""
    adj: dict[str, set[str]] = {}
    for s, d in edges:
        if s == d:
            continue
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    out = []
    for start in sorted(adj):
        for w in range(walks_per_node):
            prev, cur, path = None, start, [start]
            for step in range(1, length + 1):
                best = None
                for nb in sorted(adj[cur]):
                    if step == 1:
                        weight = 1
                    elif nb == prev:
                        weight = wr
                    elif nb in adj[prev]:
                        weight = wc
                    else:
                        weight = wf
                    for r in range(weight):
                        key = _md5(f"{seed}|{start}|{w}|{step}|{nb}|{r}")
                        if best is None or key < best[0]:
                            best = (key, nb)
                prev, cur = cur, best[1]
                path.append(cur)
            out.append((start, w, " -> ".join(path), cur))
    return sorted(out)


def test_node2vec_walks_match_golden(spark):
    from graphrag_litex_spark.operators.graph_ml import node2vec_walks

    e = spark.createDataFrame(EDGES, "src string, dst string")
    for wr, wc, wf in ((1, 2, 4), (3, 1, 1), (1, 1, 1)):
        walks = node2vec_walks(
            e, length=5, walks_per_node=2,
            w_return=wr, w_common=wc, w_far=wf, checkpoint_every=2,
        )
        got = sorted(
            tuple(r)
            for r in walks.select("start", "walk_idx", "path", "end_node").collect()
        )
        assert got == _node2vec_golden(EDGES, 5, 2, wr, wc, wf)


def test_node2vec_forced_path_and_validation(spark):
    import pytest as _pytest

    from graphrag_litex_spark.operators.graph_ml import node2vec_walks

    # Path graph a-b: biased or not, the only move is the bounce.
    e = spark.createDataFrame([("a", "b")], "src string, dst string")
    rows = {r["start"]: r["path"] for r in node2vec_walks(e, length=3).collect()}
    assert rows == {"a": "a -> b -> a -> b", "b": "b -> a -> b -> a"}
    with _pytest.raises(ValueError):
        node2vec_walks(e, length=3, w_return=0)


def test_node2vec_weights_shift_distribution(spark):
    from graphrag_litex_spark.operators.graph_ml import node2vec_walks

    # Star: center x with 8 leaves. From a leaf every walk's step 2 is at x
    # with prev = the leaf; step-2 candidates are the 8 leaves (return = the
    # start leaf, the other 7 are "far": leaves are never adjacent). With
    # w_return >> w_far most walks bounce home; with w_far >> w_return most
    # leave. Deterministic given the fixture, and the EXPECTED fractions
    # (wr/(wr+7*wf)) make the direction unambiguous.
    leaves = [f"l{i}" for i in range(8)]
    e = spark.createDataFrame([("x", lf) for lf in leaves], "src string, dst string")

    def frac_returned(wr, wf):
        walks = node2vec_walks(
            e, length=2, walks_per_node=4, w_return=wr, w_common=1, w_far=wf
        )
        rows = [r for r in walks.collect() if r["start"] != "x"]
        back = sum(1 for r in rows if r["nodes"][2] == r["start"])
        return back / len(rows)

    assert frac_returned(40, 1) > 0.6   # E = 40/47 ≈ 0.85
    assert frac_returned(1, 40) < 0.4   # E = 1/281 ≈ 0.004


# ---------------------------------------------------------------- metapaths


def test_metapath_counts_hand_computed(spark):
    from graphrag_litex_spark.operators.ontology import metapath_counts

    # person-[runs]->org-[makes]->tool twice (two people, same org/tool
    # chain tail differs): A runs O makes T ; B runs O makes T2.
    triples = spark.createDataFrame(
        [
            ("A", "runs", "O"),
            ("B", "runs", "O"),
            ("O", "makes", "T"),
            ("O", "makes", "T2"),
            ("A", "runs", "O"),  # duplicate sighting: distinct'd away
        ],
        "subj string, pred string, obj string",
    )
    types = spark.createDataFrame(
        [("A", "person"), ("B", "person"), ("O", "org"), ("T", "tool"), ("T2", "tool")],
        "name string, type string",
    )
    rows = {
        (r["subj_type"], r["pred1"], r["mid_type"], r["pred2"], r["obj_type"]): r["n_paths"]
        for r in metapath_counts(triples, types).collect()
    }
    # 2 subjects x 2 objects through O = 4 instances of the same shape
    assert rows == {("person", "runs", "org", "makes", "tool"): 4}


def test_metapath_counts_excludes_backtrack_and_applies_valve(spark):
    from graphrag_litex_spark.operators.ontology import metapath_counts

    # A->B->A is a backtrack (subj == obj): excluded.
    triples = spark.createDataFrame(
        [("A", "p", "B"), ("B", "q", "A"), ("B", "q", "C")],
        "subj string, pred string, obj string",
    )
    types = spark.createDataFrame(
        [("A", "x"), ("B", "y"), ("C", "z")], "name string, type string"
    )
    rows = metapath_counts(triples, types).collect()
    assert {(r["subj_type"], r["obj_type"]) for r in rows} == {("x", "z")}
    # valve: B has out-degree 2; capping at 1 removes every path through it
    assert metapath_counts(triples, types, max_mid_degree=1).count() == 0


def test_walks_driver_local_matches_distributed(spark):
    import itertools
    import random

    import pandas as pd

    from graphrag_litex_spark.operators.graph_ml import node2vec_walks, random_walks

    rng = random.Random(23)
    verts = [f"n{i}" for i in range(12)]
    pairs = [
        (a, b) for a, b in itertools.combinations(verts, 2) if rng.random() < 0.35
    ]
    e = spark.createDataFrame(pd.DataFrame(pairs, columns=["src", "dst"]))

    def rows(df):
        return sorted(
            (r["start"], r["walk_idx"], tuple(r["nodes"]), r["path"], r["end_node"])
            for r in df.collect()
        )

    local = rows(random_walks(e, length=4, walks_per_node=2, seed="s"))
    dist = rows(
        random_walks(e, length=4, walks_per_node=2, seed="s", driver_threshold=0)
    )
    assert local == dist and local

    local2 = rows(node2vec_walks(e, length=3, walks_per_node=2, seed="q"))
    dist2 = rows(
        node2vec_walks(e, length=3, walks_per_node=2, seed="q", driver_threshold=0)
    )
    assert local2 == dist2 and local2
