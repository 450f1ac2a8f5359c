"""Unit tests for the as-of join and sessionization operators."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from graphrag_litex_spark.operators.temporal import (
    asof_join,
    session_stats,
    session_stats_native,
    sessionize,
)


def _ts(minute, second=0):
    return dt.datetime(2024, 1, 1, 10, minute, second)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", _ts(10)),  # matches r@10:05
            (2, "u1", _ts(3)),   # before any right row -> null
            (3, "u2", _ts(20)),  # equal ts match (>= semantics)
            (4, "u3", _ts(30)),  # no right rows for u3 -> null
        ],
        "lid int, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("u1", _ts(5), 100),
            ("u1", _ts(10, 1), 101),  # just after left lid=1 -> not matched
            ("u2", _ts(20), 200),
        ],
        "k string, ts timestamp, v int",
    )
    return left, right


def test_asof_backward(frames):
    left, right = frames
    out = asof_join(left, right, on="k", right_cols=["v"])
    got = {r["lid"]: (r["v_r"], r["ts_r"]) for r in out.collect()}
    assert got[1] == (100, _ts(5))
    assert got[2] == (None, None)
    assert got[3] == (200, _ts(20))  # equal timestamps match
    assert got[4] == (None, None)
    assert out.count() == 4  # left-outer: every left row survives


def test_asof_forward(frames):
    left, right = frames
    out = asof_join(left, right, on="k", right_cols=["v"], direction="forward")
    got = {r["lid"]: r["v_r"] for r in out.collect()}
    assert got[1] == 101  # next right at-or-after 10:10 is 10:10:01
    assert got[2] == 100  # 10:03 -> first right at 10:05
    assert got[3] == 200  # equal ts matches forward too
    assert got[4] is None


def test_asof_tolerance(frames):
    left, right = frames
    out = asof_join(left, right, on="k", right_cols=["v"], tolerance_us=60_000_000)
    got = {r["lid"]: r["v_r"] for r in out.collect()}
    # lid=1 is 5min from its match -> nulled by a 1-minute tolerance
    assert got[1] is None
    assert got[3] == 200  # 0us away, survives


def test_asof_single_shuffle_no_cartesian(frames):
    left, right = frames
    plan = asof_join(left, right, on="k", right_cols=["v"])._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    # one hash-partitioning exchange on the key, nothing else
    assert plan.count("Exchange hashpartitioning") == 1


def test_sessionize_boundaries(spark):
    rows = [
        ("u", 1, _ts(0)),
        ("u", 2, _ts(30)),        # gap == 30min exactly -> SAME session (strict >)
        ("u", 3, _ts(30, 1)),     # 1s -> same
        ("u", 4, dt.datetime(2024, 1, 1, 11, 0, 2)),  # 30min+1s -> NEW session
        ("v", 5, _ts(0)),         # other key independent
    ]
    df = spark.createDataFrame(rows, "k string, eid int, ts timestamp")
    out = sessionize(df, key_col="k", ts_col="ts", gap_minutes=30.0, order_tiebreak="eid")
    got = {r["eid"]: r["session_idx"] for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 2, 5: 1}


def test_session_stats(spark):
    rows = [
        ("u", 1, _ts(0), 1.10),
        ("u", 2, _ts(5), 2.20),
        ("u", 3, dt.datetime(2024, 1, 1, 12, 0), 4.00),
    ]
    df = spark.createDataFrame(rows, "k string, eid int, ts timestamp, value double")
    out = session_stats(
        df, key_col="k", ts_col="ts", gap_minutes=30.0, value_col="value", order_tiebreak="eid"
    ).orderBy("session_idx")
    res = out.collect()
    assert [r["n_events"] for r in res] == [2, 1]
    assert res[0]["session_start"] == _ts(0) and res[0]["session_end"] == _ts(5)
    assert abs(res[0]["total_value"] - 3.30) < 1e-9
    # the groupBy reuses the window's hash partitioning: exactly one exchange
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") <= 2  # window + (AQE final sort may add one)


def test_native_session_window_equivalence(spark):
    """Spark's session_window aggregate == the lag/cumsum sessionizer on
    the full events table INCLUDING the exact-gap boundary."""
    import datetime as dt

    rows = [
        ("u", _ts(0), 1.0),
        ("u", _ts(30), 1.0),                          # == gap -> same session
        ("u", dt.datetime(2024, 1, 1, 11, 0, 1), 1.0),  # > gap -> new
        ("v", _ts(7), 2.0),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, value double")
    a = sorted(
        map(
            tuple,
            session_stats(df, "k", "ts", 30.0, value_col="value")
            .select("k", "session_start", "session_end", "n_events", "total_value")
            .collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            session_stats_native(df, "k", "ts", 30.0, value_col="value")
            .select("k", "session_start", "session_end", "n_events", "total_value")
            .collect(),
        )
    )
    assert a == b


def test_native_session_window_on_events_table(spark):
    """Equivalence on real data: the driver events table at sf0.001."""
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    a = sorted(
        map(
            tuple,
            session_stats(ev, "user_id", "ts", 360.0, order_tiebreak="event_id")
            .select("user_id", "session_start", "session_end", "n_events")
            .collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            session_stats_native(ev, "user_id", "ts", 360.0)
            .select("user_id", "session_start", "session_end", "n_events")
            .collect(),
        )
    )
    assert a == b and len(a) > 50


def test_null_ts_contract(spark):
    """Null timestamps don't crash: a null-ts left row survives the as-of
    join unmatched; sessionize gives it its own session boundary."""
    import datetime as dt

    ev = spark.createDataFrame(
        [(1, "u", None), (2, "u", dt.datetime(2024, 1, 1))],
        "eid int, k string, ts timestamp",
    )
    out = {r["eid"]: r["eid_r"] for r in
           asof_join(ev, ev.where("eid = 2"), on="k", right_cols=["eid"]).collect()}
    assert out == {1: None, 2: 2}
    s = {r["eid"]: r["session_idx"] for r in sessionize(ev, "k", "ts", 30.0).collect()}
    assert s[1] == 1 and s[2] == 2


def test_asof_bucketed_equals_unbucketed(spark):
    """The hot-key valve (time-bucketed window + carry rows) returns the
    EXACT same result as the single-window plan, including matches that
    cross bucket boundaries and buckets with no right rows."""
    import random

    rnd = random.Random(7)
    base = 1_700_000_000
    left = [(i, f"k{rnd.randrange(3)}",
             dt.datetime.fromtimestamp(base + rnd.randrange(0, 86400)))
            for i in range(300)]
    right = [(1000 + i, f"k{rnd.randrange(3)}",
              dt.datetime.fromtimestamp(base + rnd.randrange(0, 86400)))
             for i in range(80)]
    ldf = spark.createDataFrame(left, "lid int, k string, ts timestamp")
    rdf = spark.createDataFrame(right, "rid int, k string, ts timestamp")
    plain = asof_join(ldf, rdf, on="k", right_cols=["rid"])
    bucketed = asof_join(ldf, rdf, on="k", right_cols=["rid"], time_bucket_minutes=60)
    a = sorted(map(tuple, plain.collect()))
    b = sorted(map(tuple, bucketed.collect()))
    assert a == b
    # tolerance composes with the valve identically
    pt = sorted(map(tuple, asof_join(ldf, rdf, on="k", right_cols=["rid"],
                                     tolerance_us=3_600_000_000).collect()))
    bt = sorted(map(tuple, asof_join(ldf, rdf, on="k", right_cols=["rid"],
                                     tolerance_us=3_600_000_000,
                                     time_bucket_minutes=60).collect()))
    assert pt == bt


def test_asof_bucketed_splits_hot_key(spark):
    """A single hot key partitions by (key, bucket) instead of one window."""
    rows = [(i, "hot", _ts(i % 60, i // 60)) for i in range(240)]
    ldf = spark.createDataFrame(rows, "lid int, k string, ts timestamp")
    rdf = spark.createDataFrame(
        [(9, "hot", _ts(0))], "rid int, k string, ts timestamp"
    )
    out = asof_join(ldf, rdf, on="k", right_cols=["rid"], time_bucket_minutes=10)
    got = out.where("rid_r = 9").count()
    assert got == 240  # every left row matched across ALL buckets via carry
    import re

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"hashpartitioning\(__k#\d+, __b#\d+", plan)


# ---- interval (range) join ------------------------------------------------


@pytest.fixture(scope="module")
def iv_frames(spark):
    points = spark.createDataFrame(
        [
            (1, "u1", _ts(10)),      # inside iv A
            (2, "u1", _ts(20)),      # == iv A end (half-open -> A excluded; B matches)
            (3, "u1", _ts(15)),      # inside A and B (overlap -> 2 rows)
            (4, "u2", _ts(10)),      # same time, other key -> iv C only
            (5, "u3", _ts(10)),      # no intervals for u3
            (6, "u1", _ts(5)),       # == iv A start (closed -> match)
        ],
        "pid int, k string, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [
            ("A", "u1", _ts(5), _ts(20)),
            ("B", "u1", _ts(12), _ts(40)),
            ("C", "u2", _ts(0), _ts(11)),
            ("D", "u1", _ts(30), _ts(30)),  # empty (end == start) -> never matches
        ],
        "iid string, k string, start timestamp, end timestamp",
    )
    return points, intervals


def _pairs(df):
    return sorted((r["pid"], r["iid"]) for r in df.collect())


def test_interval_join_containment(iv_frames):
    from graphrag_litex_spark.operators.temporal import interval_join

    points, intervals = iv_frames
    got = interval_join(points, intervals, on="k", bucket_minutes=7.0)
    assert _pairs(got) == [(1, "A"), (2, "B"), (3, "A"), (3, "B"), (4, "C"), (6, "A")]


def test_interval_join_bucket_size_invariance(iv_frames):
    """The granule width is a cost knob, never a semantics knob."""
    from graphrag_litex_spark.operators.temporal import interval_join

    points, intervals = iv_frames
    expect = _pairs(interval_join(points, intervals, on="k", bucket_minutes=7.0))
    for m in (0.5, 1, 13, 60, 24 * 60):
        assert _pairs(interval_join(points, intervals, on="k", bucket_minutes=m)) == expect


def test_interval_join_left(iv_frames):
    from graphrag_litex_spark.operators.temporal import interval_join

    points, intervals = iv_frames
    got = interval_join(points, intervals, on="k", bucket_minutes=7.0, how="left")
    rows = sorted((r["pid"], r["iid"]) for r in got.collect())
    # every point appears; unmatched ones exactly once with null interval
    assert rows == [
        (1, "A"),
        (2, "B"),
        (3, "A"),
        (3, "B"),
        (4, "C"),
        (5, None),
        (6, "A"),
    ]


def test_interval_join_no_key(spark):
    """on=None: pure containment against a global interval set."""
    from graphrag_litex_spark.operators.temporal import interval_join

    points = spark.createDataFrame([(1, _ts(10)), (2, _ts(50))], "pid int, ts timestamp")
    intervals = spark.createDataFrame(
        [("A", _ts(0), _ts(30))], "iid string, start timestamp, end timestamp"
    )
    got = interval_join(points, intervals, bucket_minutes=60.0)
    assert sorted((r["pid"], r["iid"]) for r in got.collect()) == [(1, "A")]


def test_interval_join_no_nested_loop(iv_frames):
    """The whole point: the plan must be a hash equi-join on the granule,
    never BroadcastNestedLoopJoin / CartesianProduct."""
    from graphrag_litex_spark.operators.temporal import interval_join

    points, intervals = iv_frames
    plan = (
        interval_join(points, intervals, on="k", bucket_minutes=7.0)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_decayed_edge_strength_hand_computed(spark):
    """Integer half-life halving: weights 1e6 >> halvings, exact sums."""
    import pandas as pd

    from graphrag_litex_spark.operators.temporal import decayed_edge_strength

    # as_of = 1000, half_life = 100: ages 0, 150, 250, 2500(capped), future
    rows = [
        ("a", "b", 1000),   # 0 halvings -> 1_000_000
        ("a", "b", 850),    # 1 halving  -> 500_000
        ("a", "b", 750),    # 2 halvings -> 250_000
        ("c", "d", -1500),  # 25 halvings -> capped at 19 -> 1
        ("e", "f", 1100),   # future sighting: excluded
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["subj", "obj", "es"]))
    got = {
        (r["src"], r["dst"]): (r["decayed_micro"], r["n_obs"], r["last_seen"])
        for r in decayed_edge_strength(df, 100, as_of_epoch=1000).collect()
    }
    assert got == {
        ("a", "b"): (1_750_000, 3, 1000),
        ("c", "d"): (1_000_000 >> 19, 1, -1500),
    }


def test_decayed_edge_strength_default_asof_is_corpus_max(spark):
    import pandas as pd

    from graphrag_litex_spark.operators.temporal import decayed_edge_strength

    rows = [("a", "b", 500), ("a", "b", 400)]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["subj", "obj", "es"]))
    (r,) = decayed_edge_strength(df, 100).collect()
    assert r["decayed_micro"] == 1_000_000 + 500_000  # ages 0 and 100
    assert r["last_seen"] == 500
