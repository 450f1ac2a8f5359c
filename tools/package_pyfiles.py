"""Build the --py-files archive for cluster submission.

Produces dist/graphrag_litex_spark.zip containing the engine package, suitable
for `spark-submit --py-files dist/graphrag_litex_spark.zip jobs/build_graph.py`
(the north rule's deployment mode; reference CLI analog graphrag_lite_x.py:151).

The archive is deterministic: entries are sorted and timestamps zeroed, so the
same tree always produces a byte-identical zip (reproducible deploys — the
manifest fingerprint of a run can be tied to the code artifact that ran it).
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PACKAGE = "graphrag_litex_spark"


def build_zip(out_path: str | None = None) -> str:
    out_path = out_path or os.path.join(REPO, "dist", PACKAGE + ".zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    entries = []
    pkg_root = os.path.join(REPO, PACKAGE)
    for dirpath, dirnames, filenames in os.walk(pkg_root):
        dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
        for fn in sorted(filenames):
            if not fn.endswith(".py"):
                continue
            full = os.path.join(dirpath, fn)
            arc = os.path.relpath(full, REPO)
            entries.append((full, arc))
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for full, arc in entries:
            with open(full, "rb") as fh:
                data = fh.read()
            info = zipfile.ZipInfo(arc, date_time=(1980, 1, 1, 0, 0, 0))
            info.external_attr = 0o644 << 16
            zf.writestr(info, data, zipfile.ZIP_DEFLATED)
    return out_path


if __name__ == "__main__":
    print(build_zip())
