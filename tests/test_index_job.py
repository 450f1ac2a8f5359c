"""Persisted IVF-PQ index job (jobs/index_embeddings.py)."""

from __future__ import annotations

import json
import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from graphrag_litex_spark.operators import similarity as S


@pytest.fixture(scope="module")
def emb_df(spark):
    import numpy as np

    rng = np.random.RandomState(7)
    rows = [(i, [float(x) for x in rng.randn(16)]) for i in range(1, 201)]
    return rows, spark.createDataFrame(
        pd.DataFrame(rows, columns=["vec_id", "embedding"])
    )


@pytest.fixture(scope="module")
def built_index(spark, emb_df, tmp_path_factory):
    from jobs.index_embeddings import build_index

    rows, df = emb_df
    out = str(tmp_path_factory.mktemp("ivfpq"))
    meta = build_index(spark, df, out, n_centroids=4, m=4, ksub=8)
    return out, meta, rows, df


def test_index_layout_and_meta(spark, built_index):
    out, meta, rows, df = built_index
    codes = spark.read.parquet(os.path.join(out, "codes"))
    assert codes.count() == len(rows)
    assert set(codes.columns) == {"vec_id", "_cid", "code"}
    assert len(meta["centroids"]) == 4 and len(meta["codebooks"]) == 4
    # every vector's list id is within range; lists are non-trivial
    cids = {r["_cid"] for r in codes.select("_cid").distinct().collect()}
    assert cids <= {0, 1, 2, 3} and len(cids) >= 2


def test_query_probe_all_equals_flat_pq(spark, built_index):
    """nprobe == n_centroids touches every list -> identical to the flat
    PQ/ADC path over the same codebooks."""
    from jobs.index_embeddings import query_index

    out, meta, rows, df = built_index
    q = rows[0][1]
    got = query_index(spark, out, q, k=10, nprobe=4).collect()
    flat = S.pq_adc_topk(
        S.pq_encode(df, meta["codebooks"]), q, meta["codebooks"], k=10
    ).collect()
    assert [(r["vec_id"], r["adist"]) for r in got] == [
        (r["vec_id"], r["adist"]) for r in flat
    ]


def test_query_scan_is_partition_pruned(spark, built_index):
    """The whole point of the layout: an nprobe query must prune the
    non-probed lists at the SCAN (PartitionFilters), not filter after."""
    from jobs.index_embeddings import query_index

    out, meta, rows, df = built_index
    q = rows[0][1]
    plan = (
        query_index(spark, out, q, k=5, nprobe=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters" in plan and "_cid" in plan


def test_rerank_restores_exact_order(spark, built_index):
    """Two-stage refinement: with a wide-enough candidate pool the
    re-ranked top-1 equals the exact brute-force top-1."""
    from jobs.index_embeddings import query_index

    out, meta, rows, df = built_index
    q = rows[5][1]
    got = query_index(spark, out, q, k=5, nprobe=4, rerank=50, embeddings=df).collect()
    brute = S.brute_force_topk(df, q, k=1).collect()
    assert got[0]["vec_id"] == brute[0]["vec_id"]
    assert abs(got[0]["cosine"] - brute[0]["cosine"]) < 1e-9
    # exact-cosine ordering, descending
    cos = [r["cosine"] for r in got]
    assert cos == sorted(cos, reverse=True)


def test_index_cli_roundtrip(spark, emb_df, tmp_path, capsys):
    from jobs.index_embeddings import main

    rows, df = emb_df
    src = str(tmp_path / "emb")
    df.write.parquet(src)
    out = str(tmp_path / "idx")
    assert main(["build", "--embeddings", src, "--out", out,
                 "--centroids", "4", "--m", "4", "--ksub", "8"]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["indexed"] == len(rows)
    assert main(["query", "--index", out, "--embeddings", src,
                 "--vec-id", "1", "--k", "3", "--nprobe", "4"]) == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(res) == 3 and res[0]["vec_id"] == 1  # self is its own NN (adist 0 bucket)


@pytest.fixture(scope="module")
def appended_index(spark, emb_df, tmp_path_factory):
    """Index built on the first half, second half added with FROZEN
    quantizers (FAISS add() semantics)."""
    from jobs.index_embeddings import append_index, build_index

    rows, df = emb_df
    out = str(tmp_path_factory.mktemp("ivfpq_app"))
    meta = build_index(spark, df.where("vec_id <= 100"), out,
                       n_centroids=4, m=4, ksub=8)
    append_index(spark, df.where("vec_id > 100"), out)
    return out, meta, rows, df


def test_append_equals_union_encode(spark, appended_index):
    """build(half) + append(half) must equal encoding the UNION with the
    frozen half-trained quantizers — probe-all query vs the flat PQ path
    over the same codebooks, byte-equal."""
    from jobs.index_embeddings import query_index

    out, meta, rows, df = appended_index
    codes = spark.read.parquet(os.path.join(out, "codes"))
    assert codes.count() == len(rows)
    for q in (rows[0][1], rows[150][1]):
        got = query_index(spark, out, q, k=10, nprobe=4).collect()
        flat = S.pq_adc_topk(
            S.pq_encode(df, meta["codebooks"]), q, meta["codebooks"], k=10
        ).collect()
        assert [(r["vec_id"], r["adist"]) for r in got] == [
            (r["vec_id"], r["adist"]) for r in flat
        ]


def test_append_retry_is_idempotent_at_query(spark, appended_index, emb_df):
    """A crash-retried append leaves duplicate code rows; query output is
    unchanged (probed-partition dedup on id)."""
    from jobs.index_embeddings import append_index, query_index

    out, meta, rows, df = appended_index
    q = rows[150][1]
    before = [(r["vec_id"], r["adist"])
              for r in query_index(spark, out, q, k=10, nprobe=4).collect()]
    append_index(spark, df.where("vec_id > 100"), out)  # the "retry"
    codes = spark.read.parquet(os.path.join(out, "codes"))
    assert codes.count() > len(rows)  # duplicates really are on disk
    after = [(r["vec_id"], r["adist"])
             for r in query_index(spark, out, q, k=10, nprobe=4).collect()]
    assert before == after


def test_appended_vector_found_with_rerank(spark, appended_index):
    """A vector that entered via append is retrievable as its own nearest
    neighbor once the exact-cosine rerank orders the ADC candidates."""
    from jobs.index_embeddings import query_index

    out, meta, rows, df = appended_index
    vec_id, q = rows[180]
    got = query_index(spark, out, q, k=5, nprobe=4, rerank=20,
                      embeddings=df).collect()
    assert got[0]["vec_id"] == vec_id and got[0]["cosine"] == 1.0


@pytest.fixture(scope="module")
def pca_index(spark, emb_df, tmp_path_factory):
    """Index built with the FAISS-style PCA pre-transform (16 -> 8 dims,
    whitened): quantizers trained/encoded in projected space, model in
    meta.json."""
    from jobs.index_embeddings import build_index

    rows, df = emb_df
    out = str(tmp_path_factory.mktemp("ivfpq_pca"))
    meta = build_index(
        spark, df, out, n_centroids=4, m=4, ksub=8, pca_k=8, whiten=True
    )
    return out, meta, rows, df


def test_pca_index_meta_and_projected_space(spark, pca_index):
    out, meta, rows, df = pca_index
    with open(os.path.join(out, "meta.json")) as fh:
        disk = json.load(fh)
    assert disk["pca"]["whiten"] is True
    assert len(disk["pca"]["components"]) == 8
    assert all(len(c) == 16 for c in disk["pca"]["components"])
    # Quantizers live in the 8-dim projected space, not the raw 16.
    assert all(len(c) == 8 for c in disk["centroids"])


def test_pca_query_self_retrieves_with_rerank(spark, pca_index):
    from jobs.index_embeddings import query_index

    out, meta, rows, df = pca_index
    qid, qvec = rows[5]
    got = query_index(
        spark, out, qvec, k=5, nprobe=4, rerank=20, embeddings=df
    ).collect()
    assert got[0]["vec_id"] == qid and got[0]["cosine"] == 1.0


def test_pca_append_projects_through_frozen_model(spark, pca_index, tmp_path_factory):
    """Appended vectors must encode through the persisted PCA model: an
    appended raw vector self-retrieves, and its codes row has the same
    _cid the frozen model+quantizers assign."""
    import shutil

    from jobs.index_embeddings import append_index, query_index

    out, meta, rows, df = pca_index
    idx = str(tmp_path_factory.mktemp("ivfpq_pca_app"))
    shutil.rmtree(idx)
    shutil.copytree(out, idx)
    import numpy as np

    rng = np.random.RandomState(99)
    new_rows = [(1000 + i, [float(x) for x in rng.randn(16)]) for i in range(5)]
    new_df = spark.createDataFrame(
        pd.DataFrame(new_rows, columns=["vec_id", "embedding"])
    )
    append_index(spark, new_df, idx)
    union = df.unionByName(new_df)
    qid, qvec = new_rows[2]
    got = query_index(
        spark, idx, qvec, k=5, nprobe=4, rerank=30, embeddings=union
    ).collect()
    assert got[0]["vec_id"] == qid and got[0]["cosine"] == 1.0
