"""Winsorize, exact KS statistic, and exact rolling distinct —
hand-computed references including the empty-step grid case."""

from __future__ import annotations

from datetime import datetime, timedelta

from eclipse_spark.operators.profile import ks_statistic
from eclipse_spark.operators.timeseries import rolling_distinct, winsorize


def test_winsorize_clips_both_sides(spark):
    rows = [("g", float(v)) for v in range(1, 11)]  # 1..10
    df = spark.createDataFrame(rows, ["grp", "v"])
    out = winsorize(df, "v", partition_by=["grp"], lower=0.1, upper=0.9).collect()
    # exact interpolated p10 = 1.9, p90 = 9.1
    assert all(abs(r.lo_bound - 1.9) < 1e-12 for r in out)
    assert all(abs(r.hi_bound - 9.1) < 1e-12 for r in out)
    clipped = sorted(r.value_w for r in out)
    assert clipped[0] == 1.9 and clipped[-1] == 9.1
    assert clipped[1:-1] == [float(v) for v in range(2, 10)]


def test_ks_statistic_known_value(spark):
    # X = {1,2,3,4}, Y = {3,4,5,6}: D = max gap = 0.5 at v in [2,3)
    rows = [(float(v), "x") for v in (1, 2, 3, 4)] + [
        (float(v), "y") for v in (3, 4, 5, 6)
    ]
    df = spark.createDataFrame(rows, ["v", "tag"])
    [r] = ks_statistic(df, "v", "tag", "x", "y").collect()
    assert r.n_x == 4 and r.n_y == 4
    assert r.d_num == 8  # |2*4 - 0*4| = 8 at v=2
    assert r.d_stat == 0.5


def test_ks_statistic_identical_is_zero(spark):
    rows = [(float(v), t) for v in (1, 2, 3) for t in ("x", "y")]
    df = spark.createDataFrame(rows, ["v", "tag"])
    [r] = ks_statistic(df, "v", "tag", "x", "y").collect()
    assert r.d_num == 0 and r.d_stat == 0.0


def test_rolling_distinct_with_empty_steps(spark):
    t0 = datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (t0, 1), (t0, 2),                      # hour 0: {1,2}
        # hour 1: empty
        (t0 + timedelta(hours=2), 2),          # hour 2: {2}
        (t0 + timedelta(hours=3), 3),          # hour 3: {3}
    ]
    df = spark.createDataFrame(rows, ["ts", "uid"])
    out = {r.t: r for r in rolling_distinct(df, "ts", "uid", window=2).collect()}
    assert len(out) == 4  # dense grid includes the empty hour
    assert out[t0].step_distinct == 2 and out[t0].rolling_distinct == 2
    h1 = t0 + timedelta(hours=1)
    assert out[h1].step_distinct == 0 and out[h1].rolling_distinct == 2
    h2 = t0 + timedelta(hours=2)
    # trailing 2 hours of h2 = {hour1 (empty), hour2 {2}} -> 1, NOT
    # {hour0, hour2} (the observed-rows trap)
    assert out[h2].rolling_distinct == 1
    h3 = t0 + timedelta(hours=3)
    assert out[h3].rolling_distinct == 2  # {2, 3}


def test_quantile_normalize_known_mapping(spark):
    from eclipse_spark.operators.timeseries import quantile_normalize

    # group a = {0, 10}, group b = {100, 110}: pooled = {0,10,100,110}
    # rank-0 of each group -> pooled p=0 -> 0; rank-1 -> pooled max 110
    df = spark.createDataFrame(
        [("a", 0.0), ("a", 10.0), ("b", 100.0), ("b", 110.0)], ["g", "v"]
    )
    out = {(r.g, r.v): r.value_qn for r in quantile_normalize(df, "g", "v").collect()}
    assert out[("a", 0.0)] == 0.0 and out[("b", 100.0)] == 0.0
    assert out[("a", 10.0)] == 110.0 and out[("b", 110.0)] == 110.0


def test_quantile_normalize_identity_on_single_group(spark):
    from eclipse_spark.operators.timeseries import quantile_normalize

    vals = [3.0, 1.0, 7.0, 5.0]
    df = spark.createDataFrame([("g", v) for v in vals], ["g", "v"])
    out = {r.v: r.value_qn for r in quantile_normalize(df, "g", "v").collect()}
    # one group == pooled distribution: the map is the identity
    assert out == {v: v for v in vals}


def test_quantile_normalize_preserves_within_group_order(spark):
    from eclipse_spark.operators.timeseries import quantile_normalize

    df = spark.createDataFrame(
        [("a", float(v)) for v in (5, 1, 9)] + [("b", float(v)) for v in (100, 50)],
        ["g", "v"],
    )
    rows = quantile_normalize(df, "g", "v").collect()
    for gname in ("a", "b"):
        grp = sorted((r.v, r.value_qn) for r in rows if r.g == gname)
        qns = [q for _, q in grp]
        assert qns == sorted(qns)  # monotone mapping


def test_transition_matrix_counts_and_probs(spark):
    from datetime import datetime, timedelta

    from eclipse_spark.operators.timeseries import transition_matrix

    t0 = datetime(2024, 1, 1)
    rows = [
        (1, t0 + timedelta(minutes=m), s, m)
        for m, s in enumerate(["a", "b", "a", "b", "c"])
    ] + [(2, t0, "a", 100), (2, t0 + timedelta(minutes=1), "b", 101)]
    df = spark.createDataFrame(rows, ["uid", "ts", "state", "eid"])
    out = {
        (r.from_state, r.to_state): (r.n, r.p)
        for r in transition_matrix(df, "uid", "ts", "state", ["eid"]).collect()
    }
    # a->b x3 (users 1,1,2), b->a x1, b->c x1
    assert out[("a", "b")] == (3, 1.0)
    assert out[("b", "a")] == (1, 0.5)
    assert out[("b", "c")] == (1, 0.5)
    assert len(out) == 3


def test_gini_known_values(spark):
    from eclipse_spark.operators.timeseries import gini_coefficient

    # perfectly equal -> 0; maximal concentration -> (n-1)/n
    rows = [("eq", 5.0)] * 4 + [("max", 0.0)] * 3 + [("max", 10.0)]
    df = spark.createDataFrame(rows, ["g", "v"])
    out = {r.g: r for r in gini_coefficient(df, "g", "v").collect()}
    assert out["eq"].gini == 0.0
    assert abs(out["max"].gini - 0.75) < 1e-12  # (n-1)/n with n=4
    assert out["max"].total == 10.0
