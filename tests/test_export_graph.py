"""jobs/export_graph.py: the built KG as JSONL shards + integrity manifest.

Checks row conservation per table, manifest/file agreement (names, bytes,
sha256 recomputed locally), shard-key stability (same row -> same file
across two exports), and the CLI round trip.
"""

from __future__ import annotations

import glob
import hashlib
import json
import os

from jobs.export_graph import export_graph, main as export_main


def _read_jsonl_dir(tdir: str) -> list[dict]:
    rows = []
    for f in sorted(glob.glob(os.path.join(tdir, "part-*"))):
        with open(f) as fh:
            rows += [json.loads(line) for line in fh if line.strip()]
    return rows


def test_export_graph_conserves_rows_and_manifest(pipeline_sf0001, tmp_path):
    out = str(tmp_path / "export")
    report = export_graph(
        pipeline_sf0001, out, tables=("nodes", "edges", "canon_map"), shard_files=4
    )
    for name in ("nodes", "edges", "canon_map"):
        tdir = os.path.join(out, name)
        rows = _read_jsonl_dir(tdir)
        assert report[name]["rows"] == pipeline_sf0001[name].count() == len(rows)
        with open(os.path.join(tdir, "_manifest.json")) as fh:
            man = json.load(fh)
        assert man["table"] == name
        files = {e["file"]: e for e in man["files"]}
        on_disk = sorted(
            os.path.basename(p) for p in glob.glob(os.path.join(tdir, "part-*"))
        )
        assert sorted(files) == on_disk
        for fname, entry in files.items():
            blob = open(os.path.join(tdir, fname), "rb").read()
            assert entry["bytes"] == len(blob)
            assert entry["sha256"] == hashlib.sha256(blob).hexdigest()
    # nodes round-trip a representative column faithfully
    exported_names = {r["canonical_name"] for r in _read_jsonl_dir(os.path.join(out, "nodes"))}
    want = {r["canonical_name"] for r in pipeline_sf0001["nodes"].collect()}
    assert exported_names == want


def test_export_graph_shard_assignment_is_stable(pipeline_sf0001, tmp_path):
    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    export_graph(pipeline_sf0001, a, tables=("nodes",), shard_files=4)
    export_graph(pipeline_sf0001, b, tables=("nodes",), shard_files=4)

    def by_file(root):
        out = {}
        for f in sorted(glob.glob(os.path.join(root, "nodes", "part-*"))):
            # part file names carry nondeterministic job UUIDs; the stable
            # identity is the partition index prefix (part-00003-...)
            idx = os.path.basename(f).split("-")[1]
            with open(f) as fh:
                out[idx] = sorted(
                    json.loads(line)["canonical_name"] for line in fh if line.strip()
                )
        return out

    assert by_file(a) == by_file(b)


def test_export_graph_no_matching_tables_writes_empty_report(pipeline_sf0001, tmp_path):
    out = str(tmp_path / "none")
    report = export_graph(pipeline_sf0001, out, tables=("not_a_stage",))
    assert report == {}
    assert json.load(open(os.path.join(out, "report.json"))) == {}


def test_export_graph_cli_round_trip(pipeline_sf0001, tmp_path, capsys):
    # the fixture's out_dir holds the stage parquet the CLI re-opens
    kg_dir = os.path.dirname(
        pipeline_sf0001["nodes"].inputFiles()[0].replace("file:", "")
    )
    kg_root = os.path.dirname(kg_dir)
    out = str(tmp_path / "cli_export")
    rc = export_main(
        ["--kg", kg_root, "--out", out, "--tables", "nodes,edges,nope", "--shard-files", "2"]
    )
    assert rc == 0
    printed = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert printed["nodes"]["rows"] == pipeline_sf0001["nodes"].count()
    assert os.path.exists(os.path.join(out, "report.json"))
    assert "nope" not in printed
