"""Misra-Gries heavy hitters: superset guarantee, exactness of the
verified output, partition robustness."""

from __future__ import annotations

from pyspark.sql import functions as F

from eclipse_spark.operators.sketch import (
    heavy_hitters_exact,
    misra_gries_candidates,
)


def _skewed(spark, n_hot=3, hot=500, n_cold=400, cold=2):
    rows = []
    for h in range(n_hot):
        rows += [(f"hot{h}",)] * hot
    for c in range(n_cold):
        rows += [(f"cold{c}",)] * cold
    return spark.createDataFrame(rows, ["tok"])


def test_mg_candidates_superset_and_bounded(spark):
    df = _skewed(spark).repartition(8)
    k = 10
    summ = misra_gries_candidates(df, "tok", k=k).collect()
    items = {r.item for r in summ if r.item is not None}
    # every true heavy item (freq 500 of 2300 ~ 22% >> 1/(k+1)) present
    assert {"hot0", "hot1", "hot2"} <= items
    # bounded output: <= k items + 1 count row per partition
    assert len(summ) <= 8 * (k + 1)
    # the null rows carry the exact stream size
    total = sum(r.weight for r in summ if r.item is None)
    assert total == df.count()


def test_heavy_hitters_exact_matches_group_by(spark):
    df = _skewed(spark)
    frac = 0.1  # hot items are ~21.7% each; cold are ~0.09%
    got = {r.item: r.freq for r in heavy_hitters_exact(df, "tok", frac).collect()}
    n = df.count()
    exp = {
        r.tok: r.c
        for r in df.groupBy("tok")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") >= int(n * frac))
        .collect()
    }
    assert got == exp == {"hot0": 500, "hot1": 500, "hot2": 500}


def test_heavy_hitters_partition_invariant(spark):
    df = _skewed(spark)
    a = sorted(
        map(tuple, heavy_hitters_exact(df.repartition(2), "tok", 0.1).collect())
    )
    b = sorted(
        map(tuple, heavy_hitters_exact(df.repartition(17), "tok", 0.1).collect())
    )
    assert a == b and a
