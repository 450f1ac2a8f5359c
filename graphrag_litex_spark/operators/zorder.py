"""Z-order (Morton) clustering for multi-column data skipping.

Parquet scans prune with per-file / per-row-group min-max statistics, but a
table sorted on ONE column only skips for predicates on that column; a
second dimension's values scatter across every file and its min-max ranges
are useless. Z-ordering interleaves the bits of several columns'
rank-normalized values into one integer key and sorts the write on it, so
every file covers a small HYPER-RECTANGLE of the combined space — selective
predicates on ANY of the z-columns (or several at once) skip most files.
This is the Delta Lake ``OPTIMIZE ZORDER BY`` / Iceberg sort-order idiom,
here as a plain operator any writer can use. The reference has no storage
layout at all (in-memory dicts); at 10^12 turns, layout IS the query
optimizer for the time×user style probes the events/transcripts tables get.

Plan shape: one tiny min/max aggregate per z-column (a single combined agg
job, broadcast-sized result), then the key is ONE whole-stage-codegen
expression (shift/and/or bit terms — no UDF), and the write is Spark's
standard ``repartitionByRange(key).sortWithinPartitions(key)`` — exactly
one range shuffle, the same cost as any sorted write.

Determinism: the key is a pure integer function of (value, min, max,
bits), exact in ANSI SQL (the contract oracle builds the identical bit
expression), and parallelism-invariant. Nulls map to bucket 0 (they sort
first — the same choice Delta makes: NULLS FIRST keeps them clustered).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(col: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Rank-normalize ``col`` into [0, 2^bits) by linear min-max scaling —
    floor semantics, degenerate (min == max) ranges and nulls -> 0."""
    n_buckets = (1 << bits) - 1
    span = hi - lo
    scaled = F.floor((col.cast("double") - lo) / span * F.lit(float(n_buckets)))
    clamped = F.least(F.greatest(scaled, F.lit(0)), F.lit(n_buckets))
    return F.when(
        col.isNull() | span.isNull() | (span <= 0), F.lit(0)
    ).otherwise(clamped).cast("long")


def zorder_key(
    df: DataFrame,
    cols: list[str],
    bits: int = 16,
    out_col: str = "zkey",
) -> DataFrame:
    """Adds ``out_col``: the Morton interleave of ``cols`` (numeric or
    timestamp — timestamps bucket on epoch micros), ``bits`` bits per
    column, lowest-order bits interleaved first. len(cols) * bits must fit
    a signed long (<= 62). The min/max normalization constants come from
    ONE aggregate over the frame (at a 100 TB table, sample or supply
    domain bounds upstream and slice the frame per batch — the constants
    only steer clustering quality, never correctness)."""
    if not cols:
        raise ValueError("zorder_key needs at least one column")
    if len(cols) * bits > 62:
        raise ValueError(f"{len(cols)} cols x {bits} bits exceeds a signed long")

    def numeric(c: str) -> Column:
        col = F.col(c)
        t = dict(df.dtypes)[c]
        if t.startswith("timestamp"):  # timestamp and timestamp_ntz alike
            # NTZ -> timestamp is wall-clock under the session's pinned UTC
            # timezone (session.py), so the bucketing is deterministic.
            return F.unix_micros(col.cast("timestamp")).cast("double")
        return col.cast("double")

    bounds = df.agg(
        *[F.min(numeric(c)).alias(f"_lo_{i}") for i, c in enumerate(cols)],
        *[F.max(numeric(c)).alias(f"_hi_{i}") for i, c in enumerate(cols)],
    ).first()
    key = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        b = _bucket(
            numeric(c),
            F.lit(bounds[f"_lo_{i}"]).cast("double"),
            F.lit(bounds[f"_hi_{i}"]).cast("double"),
            bits,
        )
        for bit in range(bits):
            key = key.bitwiseOR(
                F.shiftleft(
                    F.shiftright(b, bit).bitwiseAND(F.lit(1)),
                    bit * len(cols) + i,
                )
            )
    return df.withColumn(out_col, key)


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 32,
    bits: int = 16,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet clustered on the z-curve of ``cols``: ONE
    range shuffle on the key, sorted within partitions so row groups carry
    tight min-max stats on every z-column, key dropped from the output
    (layout is not schema). ``n_files`` targets file count — at scale size
    it from bytes/128MB."""
    keyed = zorder_key(df, cols, bits=bits)
    (
        keyed.repartitionByRange(n_files, "zkey")
        .sortWithinPartitions("zkey")
        .drop("zkey")
        .write.mode(mode)
        .parquet(path)
    )


def layout_quality(path: str, cols: list[str]) -> dict:
    """Footer-level layout audit -> {col: mean_width_share} over every
    row group of the parquet dataset at ``path``: mean (rowgroup min-max
    width) / (global domain width) per column — the quantity parquet
    pruning actually feeds on (a share near 1.0 means predicates on that
    column skip nothing; z-ordering drives every z-column's share down).
    Driver-side metadata reads only (footers, never data pages); numeric
    and timestamp columns."""
    import glob as _glob
    import os as _os

    import pyarrow.parquet as _pq

    spans: dict[str, list] = {c: [] for c in cols}
    lo: dict[str, object] = {}
    hi: dict[str, object] = {}
    files = (
        [path]
        if _os.path.isfile(path)
        else sorted(
            _glob.glob(_os.path.join(path, "**", "*.parquet"), recursive=True)
        )
    )
    if not files:
        raise ValueError(f"no parquet files under {path!r}")
    for f in files:
        md = _pq.ParquetFile(f).metadata
        names = md.schema.names
        for c in cols:
            idx = names.index(c)
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                if st is None or st.min is None:
                    continue
                spans[c].append((st.min, st.max))
                lo[c] = st.min if c not in lo else min(lo[c], st.min)
                hi[c] = st.max if c not in hi else max(hi[c], st.max)

    def _num(v):
        return v.timestamp() if hasattr(v, "timestamp") else float(v)

    out = {}
    for c in cols:
        # No row group carried min/max stats for this column (e.g. an
        # all-null column): nothing to measure — report 0.0, don't index
        # the never-populated lo/hi maps.
        if not spans[c]:
            out[c] = 0.0
            continue
        dom = _num(hi[c]) - _num(lo[c])
        if dom <= 0:
            out[c] = 0.0
            continue
        widths = [(_num(b) - _num(a)) / dom for a, b in spans[c]]
        out[c] = round(sum(widths) / len(widths), 6)
    return out
