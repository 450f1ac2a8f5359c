"""Z-order clustering: hand-computed Morton keys, null/degenerate
envelopes, and a footer-level proof that the layout actually narrows
per-file min-max ranges on BOTH z-columns (the data-skipping mechanism)."""

import glob
import os

import pytest
from pyspark.sql import functions as F

from graphrag_litex_spark.operators.zorder import write_zordered, zorder_key


def test_zorder_key_hand_computed(spark):
    """bits=2 over cols in [0,3]: bucket == value, x bits land on even
    positions, y bits on odd -> interleave(3,1)=0b0111=7, (2,3)=0b1110=14,
    (0,0)=0, (3,3)=15."""
    df = spark.createDataFrame(
        [(3, 1), (2, 3), (0, 0), (3, 3)], "x long, y long"
    )
    got = {
        (r["x"], r["y"]): r["zkey"]
        for r in zorder_key(df, ["x", "y"], bits=2).collect()
    }
    assert got[(3, 1)] == 0b0111
    assert got[(2, 3)] == 0b1110
    assert got[(0, 0)] == 0
    assert got[(3, 3)] == 0b1111


def test_zorder_null_and_degenerate_bucket_zero(spark):
    df = spark.createDataFrame(
        [(None, 5.0), (2, 5.0), (7, 5.0)], "x long, c double"
    )
    got = {r["x"]: r["zkey"] for r in zorder_key(df, ["x", "c"], bits=4).collect()}
    # c is constant (span 0) -> contributes 0 everywhere; null x -> bucket 0.
    assert got[None] == 0
    assert got[2] < got[7]  # monotone on the only varying column


def test_zorder_errors(spark):
    df = spark.createDataFrame([(1, 2)], "x long, y long")
    with pytest.raises(ValueError):
        zorder_key(df, [])
    with pytest.raises(ValueError):
        zorder_key(df, ["x", "y"], bits=32)


def test_write_zordered_narrows_file_ranges(spark, tmp_path):
    """vs a ts-sorted write: z-ordering (ts, user_id) must shrink the mean
    per-file user_id min-max width (ts-sorted files span ~the full user
    domain) while keeping ts ranges far from full-width — the stats parquet
    pruning feeds on. Timestamp column exercises the epoch-micros path."""
    import pyarrow.parquet as pq

    ev = (
        spark.read.parquet("/root/testdata/sf0.01/events.parquet")
        .select("event_id", "ts", "user_id")
    )
    lo, hi = ev.agg(F.min("user_id"), F.max("user_id")).first()
    domain = hi - lo
    naive_dir = str(tmp_path / "naive")
    z_dir = str(tmp_path / "zord")
    (
        ev.repartitionByRange(8, "ts")
        .sortWithinPartitions("ts")
        .write.mode("overwrite")
        .parquet(naive_dir)
    )
    write_zordered(ev, z_dir, ["ts", "user_id"], n_files=8)

    def mean_width(path, col):
        widths = []
        for f in glob.glob(os.path.join(path, "*.parquet")):
            md = pq.ParquetFile(f).metadata
            idx = md.schema.names.index(col)
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                widths.append(
                    (st.max - st.min).total_seconds()
                    if col == "ts"
                    else st.max - st.min
                )
        return sum(widths) / len(widths)

    naive_u = mean_width(naive_dir, "user_id")
    z_u = mean_width(z_dir, "user_id")
    assert naive_u > 0.8 * domain  # ts-sorted files span the user domain
    assert z_u < 0.5 * naive_u  # z-order at least halves it
    # And ts clustering survives: 8 files ~ 3 top key bits, of which ts
    # owns >= 1, so each file covers at most ~60% of the span instead of
    # the 100% a user-sorted layout would give — BOTH dims prune.
    t0, t1 = ev.agg(F.min("ts"), F.max("ts")).first()
    z_t = mean_width(z_dir, "ts")
    assert z_t < 0.7 * (t1 - t0).total_seconds()
    # Same rows, layout only.
    back = spark.read.parquet(z_dir)
    assert back.count() == ev.count()
    assert back.agg(F.sum("event_id")).first()[0] == ev.agg(F.sum("event_id")).first()[0]


def test_layout_job_cli_zorder_report(spark, tmp_path, capsys):
    """jobs/layout.py zorder: rows preserved and the report's measured
    width_share drops on user_id (the clustering win is reported, not
    assumed)."""
    import json as _json

    from jobs.layout import main

    src = str(tmp_path / "src")
    out = str(tmp_path / "zout")
    (
        spark.read.parquet("/root/testdata/sf0.01/events.parquet")
        .select("event_id", "ts", "user_id")
        .repartitionByRange(8, "ts")
        .sortWithinPartitions("ts")
        .write.mode("overwrite")
        .parquet(src)
    )
    rc = main(["zorder", "--in", src, "--out", out, "--by", "ts,user_id",
               "--files", "8"])
    assert rc == 0
    rep = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["rows"] == 10000
    assert rep["width_share_before"]["user_id"] > 0.8
    assert rep["width_share_after"]["user_id"] < 0.5
    assert rep["width_share_after"]["ts"] < 0.8


def test_layout_job_cli_compact_report(spark, tmp_path, capsys):
    import json as _json

    from jobs.layout import main

    src = str(tmp_path / "many")
    out = str(tmp_path / "few")
    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    ev.repartition(24).write.mode("overwrite").parquet(src)
    rc = main(["compact", "--in", src, "--out", out, "--target-mb", "256"])
    assert rc == 0
    rep = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["files_in"] == 24 and rep["files_out"] < 24
    assert spark.read.parquet(out).count() == ev.count()
