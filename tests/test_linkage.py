"""Fuzzy record linkage (operators/linkage.py): deletion-neighborhood
blocking must have exact recall vs a brute-force Levenshtein scan, for
both k=1 and k=2, including repeated-character strings where deletion
variants collide."""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from eclipse_spark.operators.linkage import deletion_variants, fuzzy_self_join


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


WORDS = [
    "ring", "rang", "rings", "wring", "king", "kin", "bolt", "boat",
    "bbolt", "aaaa", "aaab", "abba", "baba", "", "a", "ab",
]


def test_deletion_variants_counts(spark):
    df = spark.createDataFrame([("abc",)], ["s"])
    v1 = {r.variant for r in deletion_variants(df, "s", k=1).collect()}
    assert v1 == {"abc", "bc", "ac", "ab"}
    v2 = {r.variant for r in deletion_variants(df, "s", k=2).collect()}
    assert v2 == {"abc", "bc", "ac", "ab", "a", "b", "c"}


@pytest.mark.parametrize("k", [1, 2])
def test_fuzzy_self_join_matches_brute_force(spark, k):
    df = spark.createDataFrame(
        [(i, w) for i, w in enumerate(WORDS)], ["wid", "word"]
    )
    got = {
        (r.id_a, r.id_b, r.distance)
        for r in fuzzy_self_join(df, "word", "wid", k=k).collect()
    }
    want = set()
    for (i, a), (j, b) in itertools.combinations(enumerate(WORDS), 2):
        d = _lev(a, b)
        if 0 < d <= k:
            want.add((i, j, d))
    assert got == want


def test_fuzzy_join_excludes_exact_equals(spark):
    df = spark.createDataFrame([(1, "same"), (2, "same"), (3, "samey")], ["wid", "word"])
    rows = fuzzy_self_join(df, "word", "wid", k=1).collect()
    assert {(r.id_a, r.id_b) for r in rows} == {(1, 3), (2, 3)}
    assert all(r.distance == 1 for r in rows)


def test_fuzzy_join_k_must_be_small(spark):
    df = spark.createDataFrame([(1, "x")], ["wid", "word"])
    with pytest.raises(ValueError):
        deletion_variants(df, "word", k=3)
