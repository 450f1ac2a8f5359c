"""jobs/diff_graphs.py: attestation-first build comparison + edge change
feed. Identical builds prove identical from checksums alone; a deletion
shows up as removed edges."""

from __future__ import annotations

import json
import os
import shutil

from jobs.diff_graphs import diff_graphs, main as diff_main


def _first_conv(res):
    return (
        res["triples"].select("conv_id").distinct().orderBy("conv_id").limit(1).collect()[0]["conv_id"]
    )


def test_diff_identical_and_after_forget(spark, corpus_sf0001, tmp_path_factory, capsys):
    from graphrag_litex_spark.plans.pipeline import KGPipeline, run_pipeline

    d = tmp_path_factory.mktemp("diffg")
    old = str(d / "old")
    res = run_pipeline(spark, corpus_sf0001["transcripts"], old, resume=False, until="claims")

    # identical copy: every stage attested identical, zero edge-level work
    same = str(d / "same")
    shutil.copytree(old, same)
    rep = diff_graphs(spark, old, same, stages=["nodes", "edges", "triples"], structural=True)
    assert all(v["identical"] for v in rep["stages"].values())
    assert rep["edges"]["removed"] == 0 == rep["edges"]["added"] == rep["edges"]["changed"]
    assert rep["edges"]["stable"] == res["edges"].count()
    # byte-identical edges short-circuit the structural pass
    assert rep["structure"]["role_equivalent"] is True
    assert "wl_fingerprint_old" not in rep["structure"]

    # forget one conversation in a copy -> edges removed/changed, none added
    new = str(d / "new")
    shutil.copytree(old, new)
    os.unlink(os.path.join(new, "_BUILD_LOCK")) if os.path.exists(
        os.path.join(new, "_BUILD_LOCK")
    ) else None
    pipe = KGPipeline(spark, corpus_sf0001["transcripts"], new)
    assert pipe.forget_conversations([_first_conv(res)]) == 1
    pipe.run(resume=True, until="claims")

    rep2 = diff_graphs(spark, old, new, structural=True)
    assert not rep2["stages"]["edges"]["identical"]
    assert rep2["edges"]["added"] == 0
    assert rep2["edges"]["removed"] + rep2["edges"]["changed"] > 0
    assert rep2["edges"]["stable"] < res["edges"].count()
    # This forget only RE-WEIGHTS edges (the conversation's pairs are all
    # attested elsewhere): the edge-level diff reports changed rows, while
    # the structural pass correctly reports the graph SHAPE untouched —
    # exactly the nominal-vs-structural distinction the pass exists for.
    # (Shape sensitivity is unit-tested on the operator:
    # test_wl_structure_fingerprint_rename_invariant_and_change_sensitive.)
    assert rep2["edges"]["removed"] == 0 and rep2["edges"]["changed"] > 0
    assert rep2["structure"]["role_equivalent"] is True
    assert (
        rep2["structure"]["wl_fingerprint_old"]
        == rep2["structure"]["wl_fingerprint_new"]
    )

    # CLI face prints the same JSON
    rc = diff_main(["--old", old, "--new", same, "--stages", "edges"])
    assert rc == 0
    printed = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert printed["stages"]["edges"]["identical"]


def test_diff_never_trusts_stale_stages(spark, corpus_sf0001, tmp_path_factory):
    """A forget WITHOUT its rebuild leaves downstream stages stale: their
    bytes still match the old build, but the diff must refuse to call them
    identical (they hold data the new build no longer trusts)."""
    from graphrag_litex_spark.plans.pipeline import KGPipeline, run_pipeline

    d = tmp_path_factory.mktemp("diffstale")
    old = str(d / "old")
    res = run_pipeline(spark, corpus_sf0001["transcripts"], old, resume=False, until="claims")
    new = str(d / "new")
    shutil.copytree(old, new)
    pipe = KGPipeline(spark, corpus_sf0001["transcripts"], new)
    assert pipe.forget_conversations([_first_conv(res)]) == 1
    # NO pipe.run(): edges/_SUCCESS on disk still holds pre-forget data

    rep = diff_graphs(spark, old, new, stages=["edges"])
    e = rep["stages"]["edges"]
    assert e["stale"] is True and e["identical"] is False
    assert rep.get("edges", {}).get("stale") is True  # change feed flagged too
