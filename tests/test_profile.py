"""Unit tests for the data-quality profiling operator (the
oracle-parity replica covers the driver queries; these cover the
module surface: null handling, approx mode, constraint edge cases)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from eclipse_spark.operators import profile as prof


@pytest.fixture(scope="module")
def toy(spark):
    return spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", None), (3, None, 2.5), (3, "b", 0.5)],
        "k bigint, s string, x double",
    )


def test_profile_counts_nulls_and_distinct(toy):
    rows = {r.col_name: r for r in prof.profile(toy).collect()}
    assert rows["k"].n_rows == 4
    assert rows["k"].n_nulls == 0
    assert rows["k"].n_distinct == 3
    assert rows["s"].n_nulls == 1
    assert rows["s"].completeness == 0.75
    assert rows["s"].min_str == "a" and rows["s"].max_str == "b"
    assert rows["s"].min_num is None
    assert rows["x"].min_num == 0.5 and rows["x"].max_num == 2.5
    assert rows["x"].max_str is None


def test_profile_single_pass_one_shuffle_family(toy):
    # the whole profile is one aggregate: no join or window exchange
    # beyond the Expand-backed distinct rewrite's agg exchanges
    plan = prof.profile(toy)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan


def test_profile_approx_mode(toy):
    rows = {r.col_name: r for r in prof.profile(toy, exact_distinct=False).collect()}
    # HLL at 4 rows is exact in practice, but only assert the bound
    assert 1 <= rows["k"].n_distinct <= 4


def test_constraints_verdicts(toy):
    out = prof.check_constraints(
        toy,
        {
            "k_unique": F.count_distinct("k") == F.count("k"),
            "x_nonneg": F.min("x") >= F.lit(0.0),
            "s_complete": F.count("s") == F.count(F.lit(1)),
        },
    )
    got = {r.check_name: r.passed for r in out.collect()}
    assert got == {"k_unique": False, "x_nonneg": True, "s_complete": False}


def test_constraints_empty_raises(toy):
    with pytest.raises(ValueError):
        prof.check_constraints(toy, {})


def test_profile_by_segments_expose_hidden_gaps(spark):
    df = spark.createDataFrame(
        [("s1", "x"), ("s1", "y"), ("s2", None), ("s2", None)],
        "src string, v string",
    )
    rows = {
        (r.src, r.col_name): r for r in prof.profile_by(df, "src").collect()
    }
    assert rows[("s1", "v")].completeness == 1.0
    assert rows[("s2", "v")].completeness == 0.0  # invisible in a global profile
    assert rows[("s2", "v")].n_rows == 2


def test_auc_roc_hand_computed_with_ties(spark):
    """AUC = P(s_pos > s_neg) + 0.5 P(equal), verified against the
    brute-force pair count; the integer auc_num2 audit holds."""
    from eclipse_spark.operators.profile import auc_roc

    rows = [(0.1, 0), (0.2, 0), (0.2, 1), (0.3, 1), (0.3, 0), (0.9, 1)]
    df = spark.createDataFrame(rows, ["score", "label"])
    r = auc_roc(df, "score", "label").collect()[0]
    # brute force over 3x3 pairs: wins + 0.5*ties
    pos = [0.2, 0.3, 0.9]; neg = [0.1, 0.2, 0.3]
    num2 = sum(2 if p > n else (1 if p == n else 0) for p in pos for n in neg)
    assert (r["n_pos"], r["n_neg"]) == (3, 3)
    assert r["auc_num2"] == num2
    assert r["auc"] == num2 / (2 * 9)

    # perfect separation and labels outside {0,1} excluded
    rows2 = [(1.0, 1), (2.0, 1), (0.1, 0), (0.5, 2)]
    r2 = auc_roc(spark.createDataFrame(rows2, ["score", "label"]),
                 "score", "label").collect()[0]
    assert (r2["n_pos"], r2["n_neg"], r2["auc"]) == (2, 1, 1.0)


def test_auc_roc_grouped_matches_ungrouped_slices(spark):
    from eclipse_spark.operators.profile import auc_roc

    rows = [("a", 0.1, 0), ("a", 0.9, 1), ("b", 0.5, 1), ("b", 0.6, 0),
            ("b", 0.7, 1)]
    df = spark.createDataFrame(rows, ["g", "score", "label"])
    grouped = {r["g"]: r["auc"] for r in
               auc_roc(df, "score", "label", group_col="g").collect()}
    for g in ("a", "b"):
        solo = auc_roc(df.filter(df.g == g), "score", "label").collect()[0]
        assert grouped[g] == solo["auc"]
    assert grouped["a"] == 1.0 and grouped["b"] == 0.5
