"""Bloom-filter join pruning (operators/bloom.py).

The contract under test: bloom_semi_join is row-identical to a plain
semi-join (no false negatives, exact re-join drops false positives),
while the filter alone prunes most non-matching rows at a bounded
false-positive rate.
"""

import pytest
from pyspark.sql import functions as F

from eclipse_spark.operators.bloom import (
    bloom_filter_build,
    bloom_might_contain,
    bloom_semi_join,
)


def _same(a, b) -> bool:
    return a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_bloom_semi_join_exact_int_keys(spark):
    """Integer keys, nulls on both sides, duplicate small-side keys:
    result == plain semi-join row-for-row (incl. big-side dup rows)."""
    big = spark.range(0, 50000).selectExpr(
        "id", "CASE WHEN id % 100 = 99 THEN NULL ELSE id % 997 END AS k"
    )
    small = spark.createDataFrame(
        [(i,) for i in range(0, 997, 13)] * 2 + [(None,)], "k: bigint"
    )
    got = bloom_semi_join(big, small, "k")
    exp = big.join(
        small.where("k IS NOT NULL").distinct(), "k", "semi"
    )
    assert exp.count() > 0
    assert _same(got, exp)


def test_bloom_semi_join_exact_string_keys_cross_names(spark):
    """String keys under differing column names (big_key != small_key),
    including a small-side key absent from big."""
    big = spark.range(0, 20000).selectExpr(
        "id", "concat('u', id % 500) AS user_key"
    )
    small = spark.createDataFrame(
        [("u7",), ("u13",), ("u499",), ("absent",)], "uk: string"
    )
    got = bloom_semi_join(big, small, "user_key", "uk")
    exp = big.join(
        small.selectExpr("uk AS user_key").distinct(), "user_key", "semi"
    )
    assert exp.count() == 3 * 40
    assert _same(got, exp)


def test_bloom_no_false_negatives_and_fp_bound(spark):
    """Every true member passes the raw filter (zero false negatives —
    the Bloom invariant the exactness proof rests on); non-members
    pass at well under the ~0.8%-at-defaults design rate (5% asserted
    for slack)."""
    keys = spark.range(0, 2000).selectExpr("id * 7 AS k")
    meta = bloom_filter_build(keys, "k").collect()[0]
    assert meta["m_bits"] % 64 == 0
    assert len(meta["words"]) == meta["m_bits"] // 64
    words = F.lit(list(meta["words"]))

    members = spark.range(0, 2000).selectExpr("id * 7 AS k")
    probe = members.where(
        bloom_might_contain(F.col("k"), meta["m_bits"], meta["n_hashes"], words)
    )
    assert probe.count() == 2000  # no false negatives, ever

    non_members = spark.range(0, 20000).selectExpr("id * 7 + 1 AS k")
    fp = non_members.where(
        bloom_might_contain(F.col("k"), meta["m_bits"], meta["n_hashes"], words)
    )
    assert fp.count() / 20000 < 0.05


def test_bloom_empty_and_degenerate_small_side(spark):
    """Empty or all-NULL small side -> empty result, no crash; the
    m=64 floor keeps the bitmap well-formed."""
    big = spark.range(0, 1000).selectExpr("id", "id % 10 AS k")
    empty = spark.createDataFrame([], "k: bigint")
    assert bloom_semi_join(big, empty, "k").count() == 0
    nulls = spark.createDataFrame([(None,), (None,)], "k: bigint")
    assert bloom_semi_join(big, nulls, "k").count() == 0


def test_bloom_pruning_actually_prunes(spark):
    """The reason the operator exists: with a selective key set, the
    raw filter kills the overwhelming majority of big-side rows before
    any exchange (asserted <2% survivors at 0.5% true selectivity)."""
    big = spark.range(0, 100000).selectExpr("id % 1000 AS k")
    small = spark.createDataFrame([(1,), (2,), (3,), (4,), (5,)], "k: bigint")
    meta = bloom_filter_build(small, "k").collect()[0]
    surv = big.where(
        bloom_might_contain(
            F.col("k"),
            meta["m_bits"],
            meta["n_hashes"],
            F.lit(list(meta["words"])),
        )
    )
    n = surv.count()
    assert n >= 500  # the 5 true keys' rows all survive
    assert n < 2000  # and almost nothing else does
