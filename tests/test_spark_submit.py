"""North-rule deployment smoke: the pipeline runs via spark-submit --py-files.

The job script is copied into an empty temp directory and launched with ONLY
the dist zip on --py-files, so the engine package can resolve only from the
archive — exactly the cluster deployment story (reference CLI analog
graphrag_lite_x.py:151-182). A subprocess spark-submit costs one JVM start
(~40 s), so this is a single end-to-end assertion, not a matrix.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spark_submit() -> str | None:
    exe = shutil.which("spark-submit")
    if exe:
        return exe
    try:
        import pyspark

        cand = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
        if os.path.exists(cand):
            return cand
    except Exception:
        pass
    return None


@pytest.mark.slow
def test_spark_submit_pyfiles_end_to_end(tmp_path):
    submit = _spark_submit()
    if submit is None:
        pytest.skip("spark-submit not available")
    sys.path.insert(0, REPO)
    from graphrag_litex_spark import datagen
    from tools.package_pyfiles import build_zip

    transcripts = datagen.ensure_corpus(0.001)["transcripts"]

    zip_path = build_zip(str(tmp_path / "dist" / "graphrag_litex_spark.zip"))
    # Copy the job script out of the repo so its repo-root sys.path insert
    # points at an empty directory: imports MUST come from the --py-files zip.
    job = tmp_path / "jobs" / "build_graph.py"
    job.parent.mkdir()
    shutil.copy(os.path.join(REPO, "jobs", "build_graph.py"), job)

    out_dir = tmp_path / "kg_out"
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    proc = subprocess.run(
        [
            submit,
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            str(job),
            "--transcripts", transcripts,
            "--output", str(out_dir),
            "--until", "edges",
        ],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "stage nodes: written" in proc.stdout
    assert "stage edges: written" in proc.stdout
    nodes = [f for f in os.listdir(out_dir / "nodes") if f.endswith(".parquet")]
    assert nodes, "nodes stage produced no parquet files"
