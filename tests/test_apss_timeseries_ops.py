"""Round-5 additions: all-pairs cosine with prefix filtering, and the
gaps-islands / interpolation / attribution time-series trio — each
checked against a brute-force or hand-computed reference."""

from __future__ import annotations

import itertools
import math
from datetime import datetime, timedelta

from pyspark.sql import functions as F

from eclipse_spark.operators.similarity import allpairs_cosine
from eclipse_spark.operators.timeseries import (
    activity_islands,
    interpolate_linear,
    last_touch_attribution,
)


def test_allpairs_cosine_matches_brute_force(spark):
    docs = [
        (1, ["a", "b", "c", "d"]),
        (2, ["a", "b", "c", "e"]),
        (3, ["a", "b", "c", "d", "e"]),
        (4, ["x", "y"]),
        (5, ["x", "y"]),
        (6, ["q"]),
        (7, ["a", "q", "x"]),
    ]
    df = spark.createDataFrame(docs, ["did", "toks"])
    for pct in (49, 81, 100):
        got = {
            (r.id_a, r.id_b, r.overlap)
            for r in allpairs_cosine(df, "did", "toks", pct).collect()
        }
        want = set()
        for (i, a), (j, b) in itertools.combinations(docs, 2):
            c = len(set(a) & set(b))
            if 100 * c * c >= pct * len(set(a)) * len(set(b)):
                want.add((i, j, c))
        assert got == want, pct


def test_allpairs_cosine_value(spark):
    df = spark.createDataFrame(
        [(1, ["a", "b", "c", "d"]), (2, ["a", "b", "c", "e"])], ["did", "toks"]
    )
    [r] = allpairs_cosine(df, "did", "toks", 49).collect()
    assert r.overlap == 3 and r.n_a == 4 and r.n_b == 4
    assert abs(r.cos_sim - round(3 / math.sqrt(16), 9)) < 1e-12


def test_activity_islands_streaks(spark):
    base = datetime(2024, 1, 1, 12, 0, 0)
    rows = []
    # user 1: days 0,1,2 then 5,6 -> islands (3, 2); user 2: day 0 only
    for d in (0, 0, 1, 2, 5, 6):
        rows.append((1, base + timedelta(days=d)))
    rows.append((2, base))
    df = spark.createDataFrame(rows, ["uid", "ts"])
    out = {r.key: r for r in activity_islands(df, "uid", "ts").collect()}
    assert out[1].n_islands == 2
    assert out[1].longest_streak == 3
    assert out[1].active_days == 5
    assert out[2].n_islands == 1 and out[2].longest_streak == 1


def test_interpolate_linear_fills_gaps(spark):
    t0 = datetime(2024, 1, 1, 0, 0, 0)
    df = spark.createDataFrame(
        [(t0, 10.0), (t0 + timedelta(hours=3), 40.0), (t0 + timedelta(hours=4), 0.0)],
        ["t", "v"],
    )
    out = {r.t: (r.v, r.filled) for r in interpolate_linear(df, "t", "v").collect()}
    assert len(out) == 5
    assert out[t0] == (10.0, False)
    assert out[t0 + timedelta(hours=1)] == (20.0, True)
    assert out[t0 + timedelta(hours=2)] == (30.0, True)
    assert out[t0 + timedelta(hours=3)] == (40.0, False)
    assert out[t0 + timedelta(hours=4)] == (0.0, False)


def test_interpolate_linear_partitions_independent(spark):
    t0 = datetime(2024, 1, 1, 0, 0, 0)
    df = spark.createDataFrame(
        [("a", t0, 0.0), ("a", t0 + timedelta(hours=2), 2.0), ("b", t0, 5.0)],
        ["g", "t", "v"],
    )
    out = interpolate_linear(df, "t", "v", partition_by=["g"]).collect()
    a = sorted([r for r in out if r.g == "a"], key=lambda r: r.t)
    b = [r for r in out if r.g == "b"]
    assert [r.v for r in a] == [0.0, 1.0, 2.0]
    assert len(b) == 1 and b[0].v == 5.0


def test_last_touch_attribution_basic(spark):
    t0 = datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        # user 1: click then purchase 1h later -> click credited
        (1, t0, "click", 0.0),
        (1, t0 + timedelta(hours=1), "purchase", 10.0),
        # user 2: view long ago (10 days) -> (direct)
        (2, t0, "view", 0.0),
        (2, t0 + timedelta(days=10), "purchase", 20.0),
        # user 3: view then a LATER click -> click wins (last touch)
        (3, t0, "view", 0.0),
        (3, t0 + timedelta(hours=1), "click", 0.0),
        (3, t0 + timedelta(hours=2), "purchase", 30.0),
        # user 4: purchase with no touches at all
        (4, t0, "purchase", 40.0),
        # noise event type is ignored as a touch
        (1, t0 + timedelta(minutes=30), "error", 99.0),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_type", "value"])
    out = {r.channel: r for r in last_touch_attribution(df).collect()}
    assert out["click"].n_conversions == 2
    assert out["click"].revenue == 40.0
    assert out["(direct)"].n_conversions == 2
    assert out["(direct)"].revenue == 60.0
    assert "view" not in out


def test_entry_exit_bounce_semantics(spark, sf_smoke):
    """Totals must tie out: entries == exits == total sessions, and a
    bounce counts toward both its entry and exit type."""
    import sys

    sys.path.insert(0, "/root/repo")
    from __spark_entry__ import queries

    rows = queries()["entry_exit"](spark, sf_smoke).collect()
    assert sum(r.n_entries for r in rows) == sum(r.n_exits for r in rows)
    assert all(r.n_bounces <= r.n_entries for r in rows)
    assert sum(r.n_entries for r in rows) > 0


def test_order_lifecycle_sane(spark, sf_smoke):
    import sys

    sys.path.insert(0, "/root/repo")
    from __spark_entry__ import queries

    rows = queries()["order_lifecycle"](spark, sf_smoke).collect()
    assert rows
    for r in rows:
        assert r.p50_days_first_ship <= r.p50_days_complete
        assert r.p90_days_complete <= r.max_days_complete
