"""Round-9 additions: count-min sketch, skew audit, dHash image
near-dup, zero-copy table branch."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# -- count-min sketch ---------------------------------------------------


def _stream(spark):
    rows = [("a",)] * 500 + [("b",)] * 120 + [(f"t{i}",) for i in range(400)]
    return spark.createDataFrame(rows, ["tok"]).repartition(8)


def test_cms_never_undercounts_and_bounds_overcount(spark):
    from eclipse_spark.operators.sketch import (
        count_min_build,
        count_min_estimate,
    )

    df = _stream(spark)
    sk = count_min_build(df, "tok", width=256, depth=4)
    exact = {r["tok"]: r["c"] for r in df.groupBy("tok").agg(F.count("*").alias("c")).collect()}
    probes = df.select("tok").distinct()
    est = {
        r["item"]: r["cms_est"]
        for r in count_min_estimate(sk, probes, "tok", width=256, depth=4).collect()
    }
    n = sum(exact.values())
    for tok, c in exact.items():
        assert est[tok] >= c, f"CMS undercounted {tok}"
        # e*N bound with e = 2/width; generous 4x slack for tiny width
        assert est[tok] <= c + 4 * (2 * n // 256 + 1)


def test_cms_deterministic_and_mergeable(spark):
    from eclipse_spark.operators.sketch import (
        count_min_build,
        count_min_estimate,
    )

    df = _stream(spark)
    a = df.filter(F.col("tok") < "m")
    b = df.filter(~(F.col("tok") < "m"))
    whole = count_min_build(df, "tok", width=128, depth=3)
    merged = (
        count_min_build(a, "tok", width=128, depth=3)
        .unionByName(count_min_build(b, "tok", width=128, depth=3))
        .groupBy("d", "bucket")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )
    key = lambda rows: sorted(map(tuple, rows))
    assert key(whole.collect()) == key(merged.collect())
    # absent item: estimate is collision noise only, never negative
    ghost = spark.createDataFrame([("zzz-never-seen",)], ["tok"])
    e = count_min_estimate(whole, ghost, "tok", width=128, depth=3).collect()[0]
    assert 0 <= e["cms_est"] < 200


# -- skew audit ---------------------------------------------------------


def test_skew_audit_exact_values(spark):
    from eclipse_spark.operators.skew import skew_audit

    rows = [("hot",)] * 900 + [(f"k{i}",) for i in range(99)] + [(None,)] * 1
    df = spark.createDataFrame(rows, ["k"]).repartition(8)
    out = skew_audit(df, "k", top_n=3).collect()
    assert out[0]["key"] == "hot" and out[0]["cnt"] == 900
    assert out[0]["total_rows"] == 1000 and out[0]["n_keys"] == 101
    assert out[0]["share_ppm"] == 900 * 1_000_000 // 1000
    assert out[0]["skew_x"] == 900 * 101 // 1000
    # null key is a real group and sorts into the tail ties by key
    assert len(out) == 3 and all(r["cnt"] >= 1 for r in out)


def test_skew_audit_null_hot_key(spark):
    from eclipse_spark.operators.skew import skew_audit

    rows = [(None,)] * 50 + [("x",)] * 5
    df = spark.createDataFrame(rows, "k string")
    out = skew_audit(df, "k", top_n=1).collect()
    assert out[0]["key"] is None and out[0]["cnt"] == 50


# -- dHash image near-dup -----------------------------------------------


def _dhash_py(payload: bytes):
    import numpy as np

    from eclipse_spark.operators.multimodal import bmp_decode

    w0, h0, arr = bmp_decode(payload)
    ys = (np.arange(8) * h0) // 8
    xs = (np.arange(9) * w0) // 9
    small = arr[ys][:, xs].astype(np.int64)
    luma = (299 * small[:, :, 0] + 587 * small[:, :, 1] + 114 * small[:, :, 2]) // 1000
    bits = (luma[:, 1:] > luma[:, :-1]).astype(np.int64)
    pos = (np.arange(8)[:, None] % 2) * 8 + np.arange(8)[None, :]
    vals = bits << pos
    return tuple(int(vals[2 * t : 2 * t + 2].sum()) for t in range(4))


def test_dhash_matches_reference_and_pairs_complete(spark):
    """dhash_bands equals the pure-python reference per image, and
    dhash_near_pairs returns EXACTLY the brute-force hamming<=3 pairs
    (pigeonhole completeness + verify exactness)."""
    from eclipse_spark.operators import multimodal

    ids = spark.range(0, 60).select(F.col("id"))
    bmps = multimodal.encode_pattern_bmp(ids, id_col="id")
    # plant exact duplicates: same bytes, shifted id
    dup = bmps.filter(F.col("id") % 10 == 0).select(
        (F.col("id") + 1000).alias("id"), "bytes"
    )
    corpus = bmps.unionByName(dup)
    hs = multimodal.dhash_bands(corpus, id_col="id", bytes_col="bytes")
    got_h = {r["id"]: (r["b0"], r["b1"], r["b2"], r["b3"]) for r in hs.collect()}
    raw = {r["id"]: bytes(r["bytes"]) for r in corpus.collect()}
    ref_h = {i: _dhash_py(b) for i, b in raw.items()}
    assert got_h == ref_h

    def ham(a, b):
        return sum(bin(x ^ y).count("1") for x, y in zip(a, b))

    exp = {
        (i, j, ham(ref_h[i], ref_h[j]))
        for i in ref_h
        for j in ref_h
        if i < j and ham(ref_h[i], ref_h[j]) <= 3
    }
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in multimodal.dhash_near_pairs(hs, max_hamming=3).collect()
    }
    assert got == exp
    # the planted exact dups are all in there at hamming 0
    assert all((i, i + 1000, 0) in got for i in range(0, 60, 10))


def test_dhash_near_pairs_rejects_unguaranteed_threshold(spark):
    from eclipse_spark.operators import multimodal

    hs = spark.createDataFrame([(1, 0, 0, 0, 0)], ["id", "b0", "b1", "b2", "b3"])
    with pytest.raises(ValueError):
        multimodal.dhash_near_pairs(hs, max_hamming=4)


# -- zero-copy table branch ----------------------------------------------


def test_branch_is_independent_and_zero_copy(spark, tmp_path):
    import os

    from eclipse_spark.storage import Catalog

    cat = Catalog(spark, str(tmp_path / "cat"))
    base = spark.range(0, 100).select(F.col("id"), (F.col("id") * 2).alias("v"))
    cat.put("t", base)
    cat.branch("t", "t2")
    assert sorted(cat.ls()) == ["t", "t2"]
    # zero-copy: branch files are hard links (same inode), not copies
    src_files = {
        f: os.stat(os.path.join(cat.path_of("t"), f)).st_ino
        for f in os.listdir(cat.path_of("t"))
        if f.endswith(".parquet")
    }
    dst_files = {
        f: os.stat(os.path.join(cat.path_of("t2"), f)).st_ino
        for f in os.listdir(cat.path_of("t2"))
        if f.endswith(".parquet")
    }
    assert src_files == dst_files and src_files
    # mutate the branch: source must not move
    cat.merge("t2", spark.createDataFrame([(5, 999)], ["id", "v"]), on=["id"])
    assert cat.get("t").filter("id = 5").collect()[0]["v"] == 10
    assert cat.get("t2").filter("id = 5").collect()[0]["v"] == 999
    assert cat.get("t").count() == cat.get("t2").count() == 100
    # dropping the branch leaves the source readable
    cat.rm("t2")
    assert cat.get("t").count() == 100


def test_branch_refuses_collisions(spark, tmp_path):
    from eclipse_spark.storage import Catalog

    cat = Catalog(spark, str(tmp_path / "cat2"))
    cat.put("a", spark.range(3))
    with pytest.raises(FileNotFoundError):
        cat.branch("missing", "b")
    with pytest.raises(ValueError):
        cat.branch("a", "a")


# -- CMS join-size estimate ----------------------------------------------


def test_cms_join_size_never_undercounts(spark):
    from eclipse_spark.operators.sketch import (
        count_min_build,
        count_min_join_size,
    )

    a = spark.createDataFrame(
        [(i % 50,) for i in range(2000)], "k int"
    )
    b = spark.createDataFrame(
        [(i % 80,) for i in range(1600)], "k int"
    )
    exact = a.join(b, "k").count()
    for width in (64, 1024):
        sa = count_min_build(a, "k", width=width, depth=4)
        sb = count_min_build(b, "k", width=width, depth=4)
        est = count_min_join_size(sa, sb).collect()[0]["join_size_est"]
        assert est >= exact
        # wide sketch: collisions still occur (birthday: ~130 keys into
        # 1024 buckets), but the min-over-depth estimate stays tight
        if width == 1024:
            assert est <= exact * 1.1
    # disjoint key spaces -> small collision-only estimate, never negative
    c = spark.createDataFrame([(i + 10_000,) for i in range(100)], "k int")
    sc_ = count_min_build(c, "k", width=1024, depth=4)
    sa = count_min_build(a, "k", width=1024, depth=4)
    est0 = count_min_join_size(sa, sc_).collect()[0]["join_size_est"]
    assert 0 <= est0 < exact


# -- KMV set algebra -------------------------------------------------------


def test_kmv_set_cardinalities_exact_regime(spark):
    """Groups smaller than k: every estimate collapses to the exact
    set cardinality (bottom-k merge is lossless)."""
    from pyspark.sql import functions as F

    from eclipse_spark.operators.sketch import (
        kmv_set_cardinalities,
        kmv_sketch,
    )

    rows_a = [("g", i) for i in range(100)]
    rows_b = [("g", i) for i in range(60, 200)]
    a = spark.createDataFrame(rows_a, ["j", "v"])
    b = spark.createDataFrame(rows_b, ["j", "v"])
    sa = kmv_sketch(a, ["j"], "v", k=512)
    sb = kmv_sketch(b, ["j"], "v", k=512)
    r = kmv_set_cardinalities(sa, sb, ["j"], k=512).collect()[0]
    assert r["est_a"] == 100.0 and r["est_b"] == 140.0
    assert r["est_union"] == 200.0
    assert r["est_intersection"] == 40.0
    assert r["est_only_a"] == 60.0 and r["est_only_b"] == 100.0


def test_kmv_set_cardinalities_estimate_regime(spark):
    """Groups larger than k: estimates land within the sketch's rsd
    (~1/sqrt(k)) of truth."""
    from eclipse_spark.operators.sketch import (
        kmv_set_cardinalities,
        kmv_sketch,
    )

    n = 20_000
    rows_a = [("g", i) for i in range(n)]
    rows_b = [("g", i) for i in range(n // 2, n + n // 2)]
    a = spark.createDataFrame(rows_a, ["j", "v"]).repartition(8)
    b = spark.createDataFrame(rows_b, ["j", "v"]).repartition(8)
    k = 512
    sa = kmv_sketch(a, ["j"], "v", k=k)
    sb = kmv_sketch(b, ["j"], "v", k=k)
    r = kmv_set_cardinalities(sa, sb, ["j"], k=k).collect()[0]
    tol = 5.0 / (k ** 0.5)  # ~5 standard errors
    assert abs(r["est_a"] - n) / n < tol
    assert abs(r["est_b"] - n) / n < tol
    assert abs(r["est_union"] - 1.5 * n) / (1.5 * n) < tol
    assert abs(r["est_intersection"] - 0.5 * n) / (0.5 * n) < 3 * tol
    assert abs(r["est_only_a"] - 0.5 * n) / (0.5 * n) < 3 * tol


# -- mergeable uniform-sample quantile rollup ------------------------------


def test_sample_sketch_exact_regime_and_merge(spark):
    from eclipse_spark.operators.sketch import sample_quantiles, sample_sketch

    rows = [("g", i, float(i)) for i in range(100)]
    df = spark.createDataFrame(rows, ["grp", "rid", "val"]).repartition(8)
    sk = sample_sketch(df, ["grp"], "val", "rid", k=512)
    r = sk.collect()[0]
    assert r["n"] == 100 and len(r["smp"]) == 100
    q = sample_quantiles(sk, ["grp"], [0.0, 0.5, 1.0]).collect()[0]
    # n <= k: exact order statistics at rank floor(p*(n-1))
    assert q["q_0"] == 0.0 and q["q_5"] == 49.0 and q["q_1_0"] == 99.0

    # mergeability: sketch(A u B) == merge of shard sketches
    a = df.filter(F.col("rid") < 50)
    b = df.filter(F.col("rid") >= 50)
    sa = sample_sketch(a, ["grp"], "val", "rid", k=16)
    sb = sample_sketch(b, ["grp"], "val", "rid", k=16)
    merged = (
        sa.unionByName(sb)
        .groupBy("grp")
        .agg(
            F.sum("n").cast("long").alias("n"),
            F.slice(
                F.array_sort(F.flatten(F.collect_list("smp"))), 1, 16
            ).alias("smp"),
        )
    )
    whole = sample_sketch(df, ["grp"], "val", "rid", k=16)
    mw = whole.collect()[0]
    mm = merged.collect()[0]
    assert mw["n"] == mm["n"] == 100
    assert [tuple(x) for x in mw["smp"]] == [tuple(x) for x in mm["smp"]]


def test_sample_quantiles_estimate_regime(spark):
    """n >> k: sample quantiles land within a few rank-standard-errors
    of truth on a uniform value distribution."""
    from eclipse_spark.operators.sketch import sample_quantiles, sample_sketch

    n, k = 50_000, 512
    df = spark.range(0, n).select(
        F.lit("g").alias("grp"),
        F.col("id").alias("rid"),
        F.col("id").cast("double").alias("val"),
    ).repartition(8)
    sk = sample_sketch(df, ["grp"], "val", "rid", k=k)
    q = sample_quantiles(sk, ["grp"], [0.25, 0.5, 0.95]).collect()[0]
    assert q["n"] == n
    for p, col in [(0.25, "q_25"), (0.5, "q_5"), (0.95, "q_95")]:
        tol = 5 * (p * (1 - p) / k) ** 0.5  # 5 rank-standard-errors
        assert abs(q[col] / (n - 1) - p) < tol, (p, q[col])


# -- branch promote --------------------------------------------------------


def test_branch_promote_fast_forward(spark, tmp_path):
    from eclipse_spark.storage import Catalog

    cat = Catalog(spark, str(tmp_path / "catp"), retain_versions=2)
    cat.put("t", spark.createDataFrame([(1, "a")], ["id", "v"]))
    cat.branch("t", "exp")
    cat.merge("exp", spark.createDataFrame([(1, "b")], ["id", "v"]), on=["id"])
    v_before = cat.info("t").version
    cat.promote("exp", "t")
    assert cat.get("t").collect()[0]["v"] == "b"
    assert cat.info("t").version == v_before + 1
    # retention: pre-promote copy is one restore away
    cat.restore("t", v_before)
    assert cat.get("t").collect()[0]["v"] == "a"
    import pytest as _pt

    with _pt.raises(FileNotFoundError):
        cat.promote("missing", "t")
