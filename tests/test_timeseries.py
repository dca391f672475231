"""Unit tests for the time-series operators."""

from __future__ import annotations

import pytest

from eclipse_spark.operators import timeseries as ts


def test_ewma_head_renormalizes_and_weights_decay(spark):
    df = spark.createDataFrame(
        [(1, 1, 10.0), (1, 2, 20.0), (1, 3, 30.0)], "u bigint, t bigint, value double"
    )
    got = {
        r.t: r.ewma
        for r in ts.ewma(df, ["u"], ["t"], "value", alpha=0.5, window=8).collect()
    }
    assert got[1] == 10.0  # head row: renormalized over itself only
    # t=2: (0.5*20 + 0.25*10) / 0.75 = 12.5/0.75
    assert got[2] == pytest.approx(12.5 / 0.75, abs=1e-9)
    # t=3: (0.5*30 + 0.25*20 + 0.125*10) / 0.875
    assert got[3] == pytest.approx(21.25 / 0.875, abs=1e-9)


def test_ewma_partitions_are_independent(spark):
    df = spark.createDataFrame(
        [(1, 1, 100.0), (2, 2, 4.0)], "u bigint, t bigint, value double"
    )
    got = {r.u: r.ewma for r in ts.ewma(df, ["u"], ["t"]).collect()}
    assert got == {1: 100.0, 2: 4.0}  # no leakage across users


def test_session_paths_gap_and_truncation(spark):
    rows = []
    # user 1: two sessions: [a,b] then (gap) [a,b]; user 2: 7 events ->
    # path truncates to first 5
    rows += [(1, 0, "a"), (1, 10, "b"), (1, 10000, "a"), (1, 10010, "b")]
    rows += [(2, 0, "x")] + [(2, 10 * i, "y") for i in range(1, 7)]
    df = spark.createDataFrame(
        rows, "user_id bigint, sec bigint, event_type string"
    ).selectExpr(
        "user_id",
        "timestamp '2024-01-01 00:00:00' + make_interval(0,0,0,0,0,0,sec) AS ts",
        "event_type",
        "sec AS event_id",
    )
    got = {r.path: (r.n_sessions, r.rank) for r in ts.session_paths(df).collect()}
    assert got["a>b"] == (2, 1)
    assert got["x>y>y>y>y"] == (1, 2)  # truncated at 5 events


def test_equidepth_histogram_balanced_counts(spark):
    df = spark.createDataFrame([(float(i), i) for i in range(100)], "v double, k bigint")
    out = ts.equidepth_histogram(df, "v", buckets=4, tiebreak=["k"]).collect()
    assert sorted(r.n_rows for r in out) == [25, 25, 25, 25]
    b = {r.bucket: (r.min_val, r.max_val) for r in out}
    assert b[1] == (0.0, 24.0) and b[4] == (75.0, 99.0)


def test_mad_outliers_robust_to_single_spike(spark):
    from pyspark.sql import functions as F

    rows = [("a", float(v)) for v in [1, 2, 3, 4, 5, 6, 7, 8, 9]] + [("a", 1000.0)]
    df = spark.createDataFrame(rows, "g string, value double")
    r = ts.mad_outliers(df, "g", "value", k=3.0).collect()[0]
    assert r.med == 5.5  # the spike cannot move the median much
    assert r.n_outliers == 1  # and is itself the only exceedance


def test_rolling_corr_known_series(spark):
    # y = 2x on a 5-point series -> corr exactly 1.0 once n >= 2;
    # anti-correlated tail flips the sign
    rows = [(i, float(i), float(2 * i)) for i in range(5)]
    df = spark.createDataFrame(rows, "t bigint, x double, y double")
    out = {r.t: (r.n_obs, r.corr) for r in ts.rolling_corr(df, "t", "x", "y", window=3).collect()}
    assert out[0] == (1, None)  # single point: undefined
    assert out[2] == (3, 1.0) and out[4] == (3, 1.0)
    # constant x -> zero variance -> NULL, never NaN
    df2 = spark.createDataFrame(
        [(i, 5.0, float(i)) for i in range(4)], "t bigint, x double, y double"
    )
    assert all(
        r.corr is None for r in ts.rolling_corr(df2, "t", "x", "y", window=3).collect()
    )


def test_time_weighted_avg_holding_semantics(spark):
    """A value held 9x longer weighs 9x: series 10 (90s) -> 100 (10s)
    -> end marker gives twa = (10*90 + 100*10) / 100 = 19."""
    from datetime import datetime, timedelta

    from eclipse_spark.operators.timeseries import time_weighted_avg

    t0 = datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [
            ("a", t0, 10.0),
            ("a", t0 + timedelta(seconds=90), 100.0),
            ("a", t0 + timedelta(seconds=100), 0.0),  # terminal marker
            ("b", t0, 5.0),                            # single obs -> drops
        ],
        ["k", "ts", "v"],
    )
    out = {r.k: r for r in time_weighted_avg(df, "k", "ts", "v").collect()}
    assert out["a"].n_intervals == 2 and out["a"].total_seconds == 100
    assert out["a"].twa == 19.0
    assert "b" not in out


def test_ohlc_bars_deterministic_ties(spark):
    """Open/close must break same-timestamp ties on the row id — the
    partition-order trap of bare first/last; high/low/volume exact."""
    from datetime import datetime

    from eclipse_spark.operators.timeseries import ohlc_bars

    t0 = datetime(2024, 1, 1, 10, 5)
    t1 = datetime(2024, 1, 1, 10, 40)
    rows = [
        # same ts for ids 1/2: open must pick id 1; close ties ids 3/4 -> 4
        (1, "x", t0, 10.0),
        (2, "x", t0, 99.0),
        (3, "x", t1, 7.0),
        (4, "x", t1, 20.0),
        (5, "y", t0, 5.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, event_type string, ts timestamp, value double"
    )
    got = {r.event_type: r for r in ohlc_bars(df).collect()}
    x = got["x"]
    assert (x.open, x.high, x.low, x.close) == (10.0, 99.0, 7.0, 20.0)
    assert x.n_ticks == 4 and x.volume == 136.0
    assert got["y"].open == got["y"].close == 5.0
    # repartitioning must not change any bar (mergeable min_by/max_by)
    a = sorted(map(tuple, ohlc_bars(df.repartition(7)).collect()))
    assert a == sorted(map(tuple, ohlc_bars(df).collect()))


def test_vwap_bars_hand_computed(spark):
    from datetime import datetime

    from eclipse_spark.operators.timeseries import vwap_bars

    rows = [
        ("A", datetime(2024, 1, 1, 0, 30), 10.0, 2.0),
        ("A", datetime(2024, 1, 1, 1, 15), 20.0, 1.0),
        ("A", datetime(2024, 1, 2, 0, 0), 100.0, 4.0),  # next day bar
        ("B", datetime(2024, 1, 1, 0, 5), 5.0, 10.0),
    ]
    df = spark.createDataFrame(rows, ["k", "ts", "p", "q"])
    out = {
        (r["k"], str(r["bar_start"])): (r["n_trades"], r["total_qty"],
                                        r["notional"], r["vwap"])
        for r in vwap_bars(df, "k", "ts", "p", "q", bucket="1 day").collect()
    }
    assert out[("A", "2024-01-01 00:00:00")] == (2, 3.0, 40.0, 40.0 / 3.0)
    assert out[("A", "2024-01-02 00:00:00")] == (1, 4.0, 400.0, 100.0)
    assert out[("B", "2024-01-01 00:00:00")] == (1, 10.0, 50.0, 5.0)


def test_max_drawdown_hand_computed(spark):
    from datetime import datetime

    from eclipse_spark.operators.timeseries import max_drawdown

    t0 = datetime(2024, 1, 1)
    rows = [
        # equity path: 10, 30, 15, 35, 5  -> peak path 10,30,30,35,35
        # drawdowns:    0,  0, 15,  0, 30 -> mdd 30, final 5, peak 35
        (1, t0.replace(hour=1), 1, 10.0),
        (1, t0.replace(hour=2), 2, 20.0),
        (1, t0.replace(hour=3), 3, -15.0),
        (1, t0.replace(hour=4), 4, 20.0),
        (1, t0.replace(hour=5), 5, -30.0),
        # user 2: monotone up -> zero drawdown
        (2, t0.replace(hour=1), 6, 1.0),
        (2, t0.replace(hour=2), 7, 2.0),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_id", "value"])
    got = {r["user_id"]: r for r in max_drawdown(df).collect()}
    assert got[1]["n_events"] == 5
    assert got[1]["final_equity"] == 5.0
    assert got[1]["peak_equity"] == 35.0
    assert got[1]["max_drawdown"] == 30.0
    assert got[2]["max_drawdown"] == 0.0 and got[2]["final_equity"] == 3.0


def test_max_drawdown_tie_order_on_equal_ts(spark):
    """Equal timestamps break on event_id, so the final-equity pick and
    the running order are deterministic."""
    from datetime import datetime

    from eclipse_spark.operators.timeseries import max_drawdown

    t = datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(1, t, 2, -5.0), (1, t, 1, 10.0)], ["user_id", "ts", "event_id", "value"]
    )
    r = max_drawdown(df).collect()[0]
    # order is (id 1: +10) then (id 2: -5): final 5, peak 10, mdd 5
    assert (r["final_equity"], r["peak_equity"], r["max_drawdown"]) == (5.0, 10.0, 5.0)
