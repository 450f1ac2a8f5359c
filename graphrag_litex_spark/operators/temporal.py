"""Temporal operators: distributed as-of join and gap-based sessionization.

Spark has no native AS OF join (DuckDB/Pandas do); the standard distributed
formulation used here is the UNION + last-non-null WINDOW trick:

    union(left tagged 1, right tagged 0)
      -> window partitionBy(key) orderBy(ts, tag)
      -> last(right payload, ignorenulls) over (unbounded preceding .. current)
      -> keep left rows

which costs exactly ONE shuffle on the join key (same as any keyed join) and
never materializes a range product — the naive `l JOIN r ON l.key = r.key AND
r.ts <= l.ts` explodes to O(|l| x |r|) per key before the per-row max, which
is the difference between running and not running at 100 TB. Skew note: one
window per key serializes a hot key within a task; for a pathological key,
pre-split by time-bucket with a carry-in boundary row (same valve family as
operators/merge.py salting). Not needed at any tested scale.

No reference analog (the reference is a KG builder); this is part of the
training-data toolbox (event-log feature joins, session construction).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def ts_micros(col) -> Column:
    """Epoch microseconds of a timestamp column. Parquet TIMESTAMP columns
    load as TIMESTAMP_NTZ (isAdjustedToUTC=false), which `unix_micros`
    rejects; the cast reinterprets the wall-clock value in the session time
    zone (pinned to UTC in session.get_spark), matching DuckDB's
    `epoch_us(ts)` on the same naive value."""
    c = col if isinstance(col, Column) else F.col(col)
    return F.unix_micros(c.cast("timestamp"))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    direction: str = "backward",
    tolerance_us: int | None = None,
    suffix: str = "_r",
    time_bucket_minutes: float | None = None,
) -> DataFrame:
    """For each left row, attach the single right row with the same ``on``
    key and the largest ``right_ts`` <= ``left_ts`` (direction="backward";
    "forward" mirrors to smallest right_ts >= left_ts). Left-outer
    semantics: unmatched left rows keep nulls. Equal timestamps match
    (>= / <=), same as DuckDB's ASOF JOIN.

    ``right_cols`` are the right payload columns to carry (default: all but
    the key); they come back suffixed. ``tolerance_us``: if set, matches
    farther than this many microseconds are nulled out.

    ``time_bucket_minutes`` is the HOT-KEY valve (backward only): by
    default one window per key serializes a hot key within a single task;
    with a bucket span the window partitions by (key, time-bucket) — a hot
    key splits across as many tasks as it spans buckets — and correctness
    across bucket boundaries is restored by injecting one CARRY row per
    (key, bucket): the latest right row from any earlier bucket, computed
    as a cumulative max over the per-bucket-latest aggregate (rows
    proportional to buckets, not events). Results are asserted identical
    to the unbucketed plan in tests.

    Determinism: if the right side has duplicate (key, ts) pairs the winner
    is unspecified (as in DuckDB) — dedupe first if exact reproducibility
    across engines is needed.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    if time_bucket_minutes is not None and direction != "backward":
        raise ValueError("time_bucket_minutes currently supports direction='backward'")
    if right_cols is None:
        right_cols = [c for c in right.columns if c != on]

    # One unified ts axis (epoch micros, so synthetic carry rows can sit at
    # exact bucket starts); tag orders right rows before left at equal ts so
    # equal-ts right rows are visible to the window frame of the left row.
    payload = F.struct(
        F.col(right_ts).alias("__rts"), *[F.col(c).alias(c) for c in right_cols]
    )
    null_lefts = [
        F.lit(None).cast(t.dataType).alias(f"__l_{t.name}") for t in left.schema
    ]
    r = right.select(
        F.col(on).alias("__k"),
        ts_micros(right_ts).alias("__ts"),
        F.lit(0).alias("__tag"),
        payload.alias("__r"),
        *null_lefts,
    )
    l = left.select(
        F.col(on).alias("__k"),
        ts_micros(left_ts).alias("__ts"),
        F.lit(1).alias("__tag"),
        F.lit(None).cast(r.schema["__r"].dataType).alias("__r"),
        *[F.col(c).alias(f"__l_{c}") for c in left.columns],
    )

    if time_bucket_minutes is None:
        both = l.unionByName(r)
        part = ["__k"]
    else:
        span = int(time_bucket_minutes * 60_000_000)
        l = l.withColumn("__b", F.floor(F.col("__ts") / span))
        r = r.withColumn("__b", F.floor(F.col("__ts") / span))
        # Latest right per (key, bucket) -> cumulative max over STRICTLY
        # earlier buckets along the (key, bucket) spine of BOTH sides (a
        # left-only bucket still needs the carry from the nearest earlier
        # right bucket). Rows here are O(#buckets), not O(#events).
        last_rb = r.groupBy("__k", "__b").agg(
            F.max(F.struct(F.col("__ts"), F.col("__r"))).alias("__lastr")
        )
        spine = l.select("__k", "__b").unionByName(r.select("__k", "__b")).distinct()
        wk = (
            Window.partitionBy("__k")
            .orderBy(F.col("__b").asc())
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        carry = (
            spine.where(F.col("__b").isNotNull())
            .join(last_rb, ["__k", "__b"], "left")
            .withColumn("__carry", F.max("__lastr").over(wk))
            .where(F.col("__carry").isNotNull())
        )
        carry_rows = carry.select(
            F.col("__k"),
            (F.col("__b") * span).alias("__ts"),  # bucket start: sorts first
            F.lit(-1).alias("__tag"),  # ...and before an equal-ts right row
            F.col("__carry.__r").alias("__r"),
            *null_lefts,
            F.col("__b"),
        )
        both = l.unionByName(r).unionByName(carry_rows)
        part = ["__k", "__b"]

    if direction == "backward":
        w = (
            Window.partitionBy(*part)
            .orderBy(F.col("__ts").asc(), F.col("__tag").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    else:
        # forward: right rows AFTER (or at) the left ts; tag desc puts the
        # right row after the left one at equal ts when scanning backward.
        w = (
            Window.partitionBy(*part)
            .orderBy(F.col("__ts").desc(), F.col("__tag").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    matched = F.last("__r", ignorenulls=True).over(w)

    out = both.withColumn("__m", matched).where(F.col("__tag") == 1)

    if tolerance_us is not None:
        diff = F.abs(F.col("__ts") - ts_micros(F.col("__m.__rts")))
        out = out.withColumn(
            "__m", F.when(diff <= F.lit(tolerance_us), F.col("__m"))
        )

    cols = [F.col(f"__l_{c}").alias(c) for c in left.columns]
    cols += [F.col(f"__m.{c}").alias(f"{c}{suffix}") for c in right_cols]
    cols.append(F.col("__m.__rts").alias(f"{right_ts}{suffix}"))
    return out.select(*cols)


def sessionize(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: float = 30.0,
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the gap from the
    previous event of the same key exceeds ``gap_minutes``. Adds
    ``session_idx`` (1-based per key) to every event row. One shuffle
    (window on key); the per-key cumulative sum is the canonical
    sessionization plan in every SQL engine, so a DuckDB oracle can run the
    identical window query.

    ``order_tiebreak``: extra ordering column for full determinism when a
    key can have duplicate timestamps (session boundaries are tie-order
    invariant — a zero gap never opens a session — but lag() itself isn't).
    """
    order = [F.col(ts_col).asc()]
    if order_tiebreak:
        order.append(F.col(order_tiebreak).asc())
    w = Window.partitionBy(key_col).orderBy(*order)
    gap_us = int(gap_minutes * 60_000_000)
    prev = F.lag(ts_micros(ts_col)).over(w)
    new_session = F.when(
        prev.isNull() | ((ts_micros(ts_col) - prev) > gap_us), 1
    ).otherwise(0)
    run = Window.partitionBy(key_col).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return events.withColumn("session_idx", F.sum(new_session).over(run))


def session_stats_native(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: float = 30.0,
    value_col: str | None = None,
) -> DataFrame:
    """`session_stats` built on Spark's NATIVE `session_window` aggregate
    (one hash agg with session merging inside the exec — no window sort),
    for pipelines that also run the streaming form: the same expression
    works under `readStream` with a watermark, where the lag/cumsum
    formulation cannot (no ordered windows over unbounded streams).

    Boundary semantics match `sessionize` exactly: an event extends the
    session when its gap from the previous event is <= gap (strictly
    greater opens a new one). session_window is half-open — an event at
    exactly last+gap starts a NEW session — so the native gap is widened
    by one microsecond to make `==` inclusive like the lag/cumsum form;
    asserted equivalent in tests. Emits (key, session_start, session_end,
    n_events[, total_value]) with session_end = last EVENT ts.
    """
    gap = f"{int(gap_minutes * 60_000_000) + 1} microseconds"
    aggs = [
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    ]
    if value_col:
        aggs.append(F.round(F.sum(value_col), 6).alias("total_value"))
    return (
        events.groupBy(key_col, F.session_window(F.col(ts_col), gap))
        .agg(*aggs)
        .drop("session_window")
    )


def session_stats(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: float = 30.0,
    value_col: str | None = None,
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Per-session aggregate view: (key, session_idx, session_start,
    session_end, n_events[, total_value]). Two stages over one keyed
    shuffle: the window above reuses its hash partitioning for the groupBy
    (same key prefix), so EnsureRequirements inserts no second exchange."""
    s = sessionize(events, key_col, ts_col, gap_minutes, order_tiebreak)
    aggs = [
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    ]
    if value_col:
        aggs.append(F.round(F.sum(value_col), 6).alias("total_value"))
    return s.groupBy(key_col, "session_idx").agg(*aggs)


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str | None = None,
    point_ts: str = "ts",
    start_ts: str = "start",
    end_ts: str = "end",
    bucket_minutes: float = 60.0,
    how: str = "inner",
) -> DataFrame:
    """Range (interval-containment) join: each ``points`` row matched to
    every ``intervals`` row with ``start <= ts < end`` (and, when ``on`` is
    given, the same equi key) — the canonical Spark scale trap done right.

    The naive predicate join compiles to BroadcastNestedLoopJoin (or a
    per-key range PRODUCT filtered after the fact): O(|points| x
    |intervals|) comparisons, dead at 100 TB. This operator instead
    time-buckets both sides and joins on the bucket: a point lives in
    exactly ONE ``bucket_minutes`` granule, an interval is EXPLODED to the
    granules it overlaps (``F.sequence`` — JVM-side, no Python), so the
    equi-join on (key?, bucket) touches only temporally-plausible pairs and
    each true pair is produced exactly once (the point's single granule).
    Cost: one hash shuffle per side + interval fan-out of
    ceil(span/bucket) rows — pick ``bucket_minutes`` near the MEDIAN
    interval span so fan-out stays O(1) per interval (the knob is the skew
    valve; a pathological months-long interval fans out linearly and is the
    signal to raise the bucket). This is the same granule trick Spark's own
    range-join hints (Databricks) and Flink interval joins use internally.

    ``how="left"`` keeps unmatched points with null interval payload.
    Timestamps compare half-open [start, end) — DuckDB-parity:
    ``p.ts >= i.start AND p.ts < i.end``.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    bucket_us = int(bucket_minutes * 60_000_000)
    p_us = ts_micros(F.col(point_ts))
    s_us = ts_micros(F.col(start_ts))
    e_us = ts_micros(F.col(end_ts))

    p = points.withColumn("_bucket", F.floor(p_us / F.lit(bucket_us)))
    # end is exclusive: a zero-length or bucket-aligned end never spills
    # into the next granule ((end_us - 1) // bucket); empty intervals
    # (end <= start) produce no granules and thus no matches.
    iv = (
        intervals.withColumn(
            "_buckets",
            F.when(
                e_us > s_us,
                F.sequence(
                    F.floor(s_us / F.lit(bucket_us)),
                    F.floor((e_us - F.lit(1)) / F.lit(bucket_us)),
                ),
            ).otherwise(F.array().cast("array<bigint>")),
        )
        .withColumn("_bucket", F.explode("_buckets"))
        .drop("_buckets")
    )
    keys = ["_bucket"] + ([on] if on else [])
    joined = p.join(iv, keys, how)
    # coalesce: a left-join row with NO bucket match has null interval
    # timestamps — that row must read as "no hit", not null.
    contain = F.coalesce(
        (F.col(point_ts).cast("timestamp") >= F.col(start_ts).cast("timestamp"))
        & (F.col(point_ts).cast("timestamp") < F.col(end_ts).cast("timestamp")),
        F.lit(False),
    )
    if how == "inner":
        return joined.where(contain).drop("_bucket")
    # left: null out non-containing matches, keep exactly one row for
    # points with no true match (dedupe the bucket-only hits).
    iv_payload = [c for c in intervals.columns if c != on]
    nulled = joined.select(
        *[c for c in points.columns],
        *[
            F.when(contain, F.col(c)).alias(c)
            for c in iv_payload
        ],
        contain.alias("_hit"),
    )
    pk = [c for c in points.columns]
    from pyspark.sql import Window as _W

    w = _W.partitionBy(*pk)
    return (
        nulled.withColumn("_any", F.max(F.col("_hit").cast("int")).over(w))
        .where(F.col("_hit") | (F.col("_any") == 0))
        .withColumn(
            "_rn",
            F.row_number().over(w.orderBy(F.col("_hit").desc(), *[F.col(c) for c in iv_payload])),
        )
        .where(F.col("_hit") | (F.col("_rn") == 1))
        .drop("_hit", "_any", "_rn")
    )


def decayed_edge_strength(
    sightings: DataFrame,
    half_life_sec: int,
    as_of_epoch: int | None = None,
    src_col: str = "subj",
    dst_col: str = "obj",
    ts_col: str = "es",
    max_halvings: int = 19,
) -> DataFrame:
    """Recency-weighted relationship strength: each sighting contributes
    ``1e6`` micro-units HALVED once per elapsed ``half_life_sec`` — the KG
    consumer's "recent attestations matter more" edge weight, without the
    floating-point exp() that no two engines round identically.

    The halving is an INTEGER right-shift (``shiftright(1000000,
    halvings)``), so the per-edge sum is order-free and engine/partitioning
    exact — the same out-of-contract-FP discipline as ra_micro/harmonic60.
    ``max_halvings`` floors ancient sightings at shift 19 (contribution 1,
    never negative-shift UB); a true exp-decay consumer multiplies the
    micro-units by its own kernel driver-side.

    ``sightings``: one row per observation with (src_col, dst_col, ts_col
    = epoch seconds). ``as_of_epoch`` anchors "now" (default: corpus max,
    one 1-row agg broadcast into the projection). One equi-agg total; at
    10^12 turns this is the same single-shuffle shape as the edge merge.
    -> (src, dst, decayed_micro, n_obs, last_seen).
    """
    if as_of_epoch is None:
        row = sightings.agg(F.max(ts_col).alias("m")).collect()[0]
        as_of_epoch = int(row["m"]) if row["m"] is not None else 0
    # Integer `div`, not float-divide-then-floor: the elapsed/half-life
    # quotient must be the same exact integer the SQL oracle's `//`
    # computes (a double division can round across the boundary).
    halvings = F.least(
        F.expr(
            f"(cast({as_of_epoch} as bigint) - cast({ts_col} as bigint))"
            f" div cast({int(half_life_sec)} as bigint)"
        ),
        F.lit(max_halvings).cast("bigint"),
    ).cast("int")
    return (
        sightings.where(F.col(ts_col) <= as_of_epoch)
        .withColumn("h", F.greatest(halvings, F.lit(0)))
        .withColumn("w", F.expr("shiftright(1000000, h)"))
        .groupBy(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .agg(
            F.sum("w").cast("long").alias("decayed_micro"),
            F.count(F.lit(1)).cast("long").alias("n_obs"),
            F.max(ts_col).cast("long").alias("last_seen"),
        )
    )
