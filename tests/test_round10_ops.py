"""Round-10 operator tests: the general interval-overlap join
(bucketed-explode range join), Count-Min sketch merge (incremental
maintenance), the 128-bit dHash wide bands (covered further in
test_round10_fixes.py), and the delta-degree k_core."""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F


# -- interval_join ------------------------------------------------------


def _brute(rows_l, rows_r):
    return {
        (i, j)
        for i, (k1, s1, e1) in enumerate(rows_l)
        for j, (k2, s2, e2) in enumerate(rows_r)
        if k1 == k2 and s1 <= e2 and s2 <= e1
    }


def _run_ij(spark, rows_l, rows_r, width):
    from eclipse_spark.operators.relational import interval_join

    L = spark.createDataFrame(
        [(k, s, e, i) for i, (k, s, e) in enumerate(rows_l)],
        "k int, ls long, le long, lid int",
    )
    R = spark.createDataFrame(
        [(k, s, e, j) for j, (k, s, e) in enumerate(rows_r)],
        "k int, rs long, re long, rid int",
    )
    out = interval_join(L, R, ["k"], "ls", "le", "rs", "re", width)
    return {(r.lid, r.rid) for r in out.collect()}


def test_interval_join_matches_brute_force(spark):
    rows_l = [(i % 3, (i * 37) % 1000, (i * 37) % 1000 + (i % 7) * 13) for i in range(200)]
    rows_r = [(j % 3, (j * 53) % 1000, (j * 53) % 1000 + (j % 5) * 29) for j in range(80)]
    bf = _brute(rows_l, rows_r)
    assert bf  # non-vacuous
    for width in (1, 7, 50, 1000, 10_000):
        assert _run_ij(spark, rows_l, rows_r, width) == bf, f"width={width}"


def test_interval_join_no_duplicate_pairs(spark):
    """A pair sharing many buckets must be emitted exactly once (the
    overlap-start attribution, not a distinct)."""
    from eclipse_spark.operators.relational import interval_join

    L = spark.createDataFrame([(0, 0, 1000, 0)], "k int, ls long, le long, lid int")
    R = spark.createDataFrame([(0, 10, 990, 0)], "k int, rs long, re long, rid int")
    out = interval_join(L, R, ["k"], "ls", "le", "rs", "re", 10)
    assert out.count() == 1


def test_interval_join_boundaries(spark):
    """Closed-interval semantics: touching endpoints overlap; disjoint
    by 1 does not. Negative coordinates and bucket-edge starts too."""
    rows_l = [(0, 100, 200), (0, -50, -10), (0, 300, 300)]
    rows_r = [(0, 200, 250), (0, -10, 0), (0, 201, 299), (0, 300, 300)]
    bf = _brute(rows_l, rows_r)
    assert (0, 0) in bf and (1, 1) in bf and (2, 3) in bf and (0, 2) not in bf
    assert _run_ij(spark, rows_l, rows_r, 64) == bf


def test_interval_join_inverted_and_null_intervals(spark):
    """Ill-formed inputs keep engine == theta-join semantics: an
    INVERTED interval (start > end) matches exactly the pairs the
    closed-overlap predicate admits (the descending bucket sequence
    covers the same endpoint range, and the overlap-start bucket is
    provably inside both sides' ranges), and a NULL bound drops the row
    on both sides (NULL comparisons admit nothing; NULL sequence
    explodes to nothing)."""
    rows_l = [(0, 25, 5), (0, 5, 1), (0, 100, 200)]
    rows_r = [(0, 0, 30), (0, 2, 6), (0, 150, 160), (0, 26, 40)]
    bf = _brute(rows_l, rows_r)
    assert (0, 0) in bf and (0, 3) not in bf  # inverted still theta-matched
    assert _run_ij(spark, rows_l, rows_r, 10) == bf

    from eclipse_spark.operators.relational import interval_join

    L = spark.createDataFrame(
        [(0, None, 10, 0), (0, 5, None, 1), (0, 1, 10, 2)],
        "k int, ls long, le long, lid int",
    )
    R = spark.createDataFrame([(0, 0, 100, 0)], "k int, rs long, re long, rid int")
    got = {
        (r.lid, r.rid)
        for r in interval_join(L, R, ["k"], "ls", "le", "rs", "re", 16).collect()
    }
    assert got == {(2, 0)}  # NULL-bounded rows silently admit nothing


def test_interval_join_fanout_guard(spark):
    from eclipse_spark.operators.relational import interval_join

    L = spark.createDataFrame(
        [(0, 0, 10_000_000, 0)], "k int, ls long, le long, lid int"
    )
    R = spark.createDataFrame([(0, 5, 6, 0)], "k int, rs long, re long, rid int")
    with pytest.raises(Exception, match="spans more than"):
        interval_join(L, R, ["k"], "ls", "le", "rs", "re", 10, max_fanout=100).collect()
    with pytest.raises(ValueError, match="bucket_width"):
        interval_join(L, R, ["k"], "ls", "le", "rs", "re", 0)
    with pytest.raises(ValueError, match="_bkt"):
        interval_join(
            L.withColumnRenamed("lid", "_bkt"), R, ["k"], "ls", "le", "rs", "re", 10
        )


def test_interval_join_collision_suffix(spark):
    from eclipse_spark.operators.relational import interval_join

    L = spark.createDataFrame([(0, 1, 5, 10)], "k int, s long, e long, pay int")
    R = spark.createDataFrame([(0, 4, 9, 20)], "k int, s long, e long, pay int")
    out = interval_join(L, R, ["k"], "s", "e", "s_r", "e_r", 4)
    row = out.collect()[0]
    assert row["pay"] == 10 and row["pay_r"] == 20
    assert row["s"] == 1 and row["s_r"] == 4


# -- count_min_merge ----------------------------------------------------


def test_cms_merge_equals_rebuild(spark):
    """base ⊕ delta must be BIT-IDENTICAL to the full-stream build —
    every (d, bucket, cnt) row, not just the estimates."""
    from eclipse_spark.operators.sketch import count_min_build, count_min_merge

    full = spark.range(0, 3000).select(
        (F.col("id") % 257).cast("string").alias("item"), F.col("id")
    )
    base = count_min_build(full.filter(F.col("id") % 3 != 0), "item", 128, 3)
    delta = count_min_build(full.filter(F.col("id") % 3 == 0), "item", 128, 3)
    merged = {
        (r.d, r.bucket): r.cnt for r in count_min_merge(base, delta).collect()
    }
    rebuilt = {
        (r.d, r.bucket): r.cnt
        for r in count_min_build(full, "item", 128, 3).collect()
    }
    assert merged == rebuilt


def test_cms_merge_multiway_and_validation(spark):
    from eclipse_spark.operators.sketch import count_min_build, count_min_merge

    full = spark.range(0, 900).select((F.col("id") % 50).cast("string").alias("item"), "id")
    parts = [
        count_min_build(full.filter(F.col("id") % 3 == i), "item", 64, 2)
        for i in range(3)
    ]
    merged = {(r.d, r.bucket): r.cnt for r in count_min_merge(*parts).collect()}
    rebuilt = {
        (r.d, r.bucket): r.cnt for r in count_min_build(full, "item", 64, 2).collect()
    }
    assert merged == rebuilt
    with pytest.raises(ValueError, match="no sketches"):
        count_min_merge()


# -- delta-degree k_core ------------------------------------------------


def _bf_kcore(edges, k):
    """Reference peel on plain dicts."""
    adj: dict = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    changed = True
    while changed:
        changed = False
        for n in [n for n, nb in adj.items() if len(nb) < k]:
            for m in adj.pop(n):
                adj[m].discard(n)
            changed = True
    return {n: len(nb) for n, nb in adj.items()}


def test_kcore_matches_reference_peel(spark):
    from eclipse_spark.operators.graph import k_core

    edges = [(i % 40, (i * 7 + 3) % 40) for i in range(300)]
    df = spark.createDataFrame(edges, "a long, b long")
    for k in (2, 4, 6, 9):
        got = {r.node: r.degree for r in k_core(df, k).collect()}
        assert got == _bf_kcore(edges, k), f"k={k}"


def test_kcore_stats_and_no_leaked_persist(spark):
    from eclipse_spark.operators.graph import k_core

    edges = [(i % 60, (i * 11 + 5) % 60) for i in range(500)]
    df = spark.createDataFrame(edges, "a long, b long")
    jsc = spark.sparkContext._jsc
    before = {r.id() for r in jsc.getPersistentRDDs().values()}
    stats = {}
    out = k_core(df, 5, stats_out=stats).collect()
    after = {r.id() for r in jsc.getPersistentRDDs().values()}
    assert stats["rounds"] >= 1 and stats["n_dead_total"] >= 0
    # decrement mass == degree mass the survivors lost, >= 0 always
    assert stats["decrement_rows_total"] >= 0
    # the edge cache (persist) must be released; what MAY remain are
    # at most two localCheckpoint blocks awaiting the async
    # ContextCleaner (the returned frame's own checkpoint + the last
    # intermediate) — a real cache leak would add one block per call
    assert len(after - before) <= 2, f"k_core leaked {after - before}"
    ref = _bf_kcore(edges, 5)
    assert {r.node: r.degree for r in out} == ref


def test_media_curation_pipeline_invariants(spark, sf_smoke):
    """End-to-end composition sanity beyond the oracle hash: every
    planted duplicate whose original passed quality must be DROPPED
    (larger id of a hamming-0 pair), no width group keeps more than it
    saw, and quality never exceeds the image count."""
    import importlib

    em = importlib.import_module("__spark_entry__")
    rows = em.queries()["media_curation_pipeline"](spark, sf_smoke).collect()
    assert rows
    tot_images = sum(r.n_images for r in rows)
    tot_quality = sum(r.n_quality for r in rows)
    tot_kept = sum(r.n_kept for r in rows)
    assert tot_kept <= tot_quality <= tot_images
    # planted copies = every 10th original; a planted copy passes
    # quality iff its original does (same pixels) and then always
    # drops (its original holds the smaller id of a hamming-0 pair) —
    # so kept <= quality - (quality planted copies), i.e. strictly
    # fewer keeps than quality rows whenever any planted copy passed
    n_docs = tot_images * 10 // 11  # originals; planted = n/10
    assert tot_images == n_docs + n_docs // 10
    assert tot_kept < tot_quality  # at least one planted dup dropped
    for r in rows:
        assert r.n_kept <= r.n_quality <= r.n_images
        if r.n_kept > 0:
            assert 0.48 <= r.kept_mean_all <= 1.0


def test_kcore_empty_and_full_core(spark):
    from eclipse_spark.operators.graph import k_core

    # triangle: 2-core is everything, 3-core empty
    df = spark.createDataFrame([(1, 2), (2, 3), (1, 3)], "a long, b long")
    assert {r.node for r in k_core(df, 2).collect()} == {1, 2, 3}
    assert k_core(df, 3).count() == 0
