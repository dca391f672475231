"""Round-9 regression tests: the ADVICE r8 findings (bloom dtype
coercion, heavy-hitter IN-list fallback, get_many version pinning,
reader-derived compact partitioning, ungrouped AUC two-pass) and the
VERDICT r8 tasks (vectorized sketch partials — covered by the existing
exactness tests — distributed SemDeDup seeding, k-truss delta peel)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


# -- ADVICE r8 #1: bloom_semi_join key dtype coercion ------------------


def test_bloom_semi_join_mixed_key_dtypes(spark):
    """xxhash64 is dtype-sensitive; before the fix an int-vs-bigint key
    pair produced false NEGATIVES (silently dropped matches). Both a
    numeric widening and a string/int mismatch must now equal the plain
    semi-join."""
    from eclipse_spark.operators.bloom import bloom_semi_join

    big = spark.range(0, 2000).select(F.col("id").cast("long").alias("k"), (F.col("id") * 2).alias("pay"))
    small_int = spark.createDataFrame(
        [(i,) for i in range(0, 2000, 7)], "k int"
    )
    got = sorted(r["k"] for r in bloom_semi_join(big, small_int, "k").collect())
    exp = sorted(range(0, 2000, 7))
    assert got == exp

    small_str = spark.createDataFrame(
        [(str(i),) for i in range(0, 2000, 13)] + [("not-a-number",)],
        "k string",
    )
    got2 = sorted(r["k"] for r in bloom_semi_join(big, small_str, "k").collect())
    assert got2 == sorted(range(0, 2000, 13))


def test_bloom_semi_join_same_dtype_unchanged(spark):
    from eclipse_spark.operators.bloom import bloom_semi_join

    big = spark.range(0, 500).select(F.col("id").alias("k"))
    small = spark.range(0, 500, 9).select(F.col("id").alias("k"))
    assert bloom_semi_join(big, small, "k").count() == len(range(0, 500, 9))


# -- ADVICE r8 #2: heavy_hitters_exact broadcast fallback --------------


def test_heavy_hitters_many_candidates_uses_semi_join(spark):
    """A small threshold on a many-partition stream yields a candidate
    set far past the 4096 IN-list bound; the broadcast semi-join path
    must return the identical exact answer."""
    from eclipse_spark.operators.sketch import heavy_hitters_exact

    rows = [(f"hot{h}",) for h in range(3) for _ in range(400)]
    rows += [(f"cold{c}",) for c in range(6000)]
    df = spark.createDataFrame(rows, ["tok"]).repartition(16)
    # threshold_frac small -> k = 2/frac = 4000; 16 partitions -> the
    # candidate union can reach tens of thousands
    got = {
        r.item: r.freq
        for r in heavy_hitters_exact(df, "tok", 1.0 / 2000).collect()
    }
    n = df.count()
    exp = {
        r.tok: r.c
        for r in df.groupBy("tok")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") >= max(int(n / 2000), 1))
        .collect()
    }
    assert got == exp
    assert {"hot0", "hot1", "hot2"} <= set(got)


# -- ADVICE r8 #3: get_many returns version-pinned reads ---------------


def test_get_many_pins_versions_across_later_commits(spark, tmp_path):
    """With retention on, the DataFrames get_many returns must keep
    reading the snapshot they pinned even when a commit lands BETWEEN
    plan and action (the old live-path reads re-tore the vector)."""
    from eclipse_spark.storage import Catalog

    cat = Catalog(spark, str(tmp_path / "cat"), retain_versions=2)
    cat.put("t", spark.createDataFrame([(1, "v1")], ["id", "tag"]))
    dfs = cat.get_many(["t"])
    # a commit lands after get_many returned but before the action
    cat.put("t", spark.createDataFrame([(2, "v2")], ["id", "tag"]))
    rows = dfs["t"].collect()
    assert [(r["id"], r["tag"]) for r in rows] == [(1, "v1")]
    # live read sees the new version
    assert cat.get("t").collect()[0]["tag"] == "v2"


def test_get_many_retention_off_still_plan_time_consistent(spark, tmp_path):
    from eclipse_spark.storage import Catalog

    cat = Catalog(spark, str(tmp_path / "cat0"))
    cat.put("a", spark.createDataFrame([(1,)], ["x"]))
    dfs = cat.get_many(["a"])
    assert dfs["a"].collect()[0]["x"] == 1


# -- ADVICE r8 #4: compact derives partition cols from the reader ------


def test_compact_partition_cols_from_reader(spark, tmp_path):
    """Partition columns come from schema difference (table schema vs
    one leaf file's footer), not directory-name walking; a two-level
    hive layout round-trips and the data is row-identical."""
    from eclipse_spark.storage import Catalog

    cat = Catalog(spark, str(tmp_path / "catp"))
    df = spark.range(0, 400).select(
        (F.col("id") % 4).alias("p"),
        ((F.col("id") / 4).cast("int") % 2).alias("q"),
        F.col("id").alias("v"),
    )
    cat.put("t", df.repartition(8), partition_by=["p", "q"])
    before, after = cat.compact("t", target_file_mb=64)
    assert after <= before
    got = cat.get("t")
    assert got.count() == 400
    assert {"p", "q"} <= set(got.columns)
    # partition pruning still works: one (p,q) cell has 50 rows
    assert got.filter((F.col("p") == 1) & (F.col("q") == 1)).count() == 50


# -- ADVICE r8 #5: ungrouped AUC avoids the global window --------------


def test_auc_roc_ungrouped_matches_exact(spark):
    """group_col=None now cumulates negatives with the range-partitioned
    two-pass (dense_index pattern); values must equal the rank-formula
    AUC computed directly."""
    from eclipse_spark.operators.profile import auc_roc

    rng = np.random.RandomState(7)
    scores = np.round(rng.normal(size=3000), 3)
    labels = (rng.uniform(size=3000) < 1 / (1 + np.exp(-scores))).astype(int)
    df = spark.createDataFrame(
        [(float(s), int(y)) for s, y in zip(scores, labels)],
        "score double, y int",
    ).repartition(16)
    row = auc_roc(df, "score", "y").collect()[0]

    pos = np.sort(scores[labels == 1])
    neg = np.sort(scores[labels == 0])
    gt = sum(np.searchsorted(neg, s, side="left") for s in pos)
    eq = sum(
        np.searchsorted(neg, s, side="right") - np.searchsorted(neg, s, side="left")
        for s in pos
    )
    assert row["n_pos"] == len(pos) and row["n_neg"] == len(neg)
    assert row["auc_num2"] == 2 * gt + eq
    assert abs(row["auc"] - (gt + 0.5 * eq) / (len(pos) * len(neg))) < 1e-12


def test_auc_roc_ungrouped_plan_has_no_unpartitioned_window(spark):
    """The distinct-score cumulative must not run in a single-partition
    window over the score stream (only the P-row offset table may)."""
    from eclipse_spark.operators.profile import _auc_roc_build

    df = spark.range(0, 1000).select(
        (F.col("id") % 97).cast("double").alias("s"), (F.col("id") % 2).alias("y")
    )
    # the lazy builder exposes the plan (auc_roc itself materializes the
    # one-row result to release its persist — ADVICE r9 lifecycle fix)
    res, ranged = _auc_roc_build(df, "s", "y")
    plan = res._jdf.queryExecution().executedPlan().toString()
    if ranged is not None:
        ranged.unpersist()
    # the per-score cumulative window is partitioned by _pid; the only
    # SinglePartition exchange allowed feeds the P-row offset window
    import re

    wins = re.findall(r"Window \[[^\]]*windowspecdefinition\(([^,)]*)", plan)
    assert any("_pid" in w for w in wins)


# -- VERDICT r8 task 3: distributed SemDeDup seeding -------------------


def test_semdedup_scaled_sorted_id_corpus_no_collapse(spark):
    """Seeds no longer come from the first n_cells ids, so a corpus
    whose id order is correlated with cluster structure (all of cluster
    0 first, then cluster 1, ...) must not trip the collapse guard, and
    planted exact duplicates must still drop."""
    from eclipse_spark.operators.dedup import semantic_dedup_scaled

    rng = np.random.RandomState(3)
    centers = rng.normal(size=(4, 16)) * 10.0
    rows = []
    vid = 0
    for c in range(4):  # ids strictly grouped by cluster — adversarial
        for _ in range(512):
            v = centers[c] + rng.normal(size=16) * 1.0
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    # planted exact duplicates of every 100th vector (cosine exactly
    # 1.0; distinct cluster members stay ~0.98 — margin-separated)
    planted = [(100000 + i, rows[i][1]) for i in range(0, vid, 100)]
    df = spark.createDataFrame(rows + planted, "vec_id long, embedding array<double>")
    out = semantic_dedup_scaled(
        df, threshold=0.9999, target_cell_size=512, n_iter=2
    )
    res = {r["vec_id"]: r["kept"] for r in out.collect()}
    assert len(res) == vid + len(planted)
    # each planted duplicate pair loses exactly its larger id
    for pid, _ in planted:
        assert res[pid] == 0, "planted exact duplicate must drop"
        assert res[pid - 100000] == 1, "original must survive"


# -- VERDICT r8 task 4: k-truss delta peel smoke ------------------------


def test_k_truss_delta_multi_round_cascade(spark):
    """A chain of triangles where deleting one edge cascades through
    several delta rounds; fixpoint + supports must match the
    textbook answer."""
    from eclipse_spark.operators.graph import k_truss

    # two 4-cliques sharing an edge, plus a pendant triangle hanging
    # off one clique via a single shared edge
    def clique(nodes):
        return [
            (a, b) for i, a in enumerate(nodes) for b in nodes[i + 1 :]
        ]

    edges = set(clique([1, 2, 3, 4]) + clique([3, 4, 5, 6]) + [(5, 7), (6, 7)])
    df = spark.createDataFrame(sorted(edges), ["a", "b"])
    got = {(r["a"], r["b"]): r["support"] for r in k_truss(df, 4).collect()}
    # python reference peel
    live = set(edges)
    while True:
        sup = {}
        nodes = set()
        for a, b in live:
            nodes |= {a, b}
        nbr = {n: set() for n in nodes}
        for a, b in live:
            nbr[a].add(b)
            nbr[b].add(a)
        for a, b in live:
            sup[(a, b)] = len(nbr[a] & nbr[b])
        dead = {e for e, s in sup.items() if s < 2}
        if not dead:
            break
        live -= dead
    assert got == {e: s for e, s in sup.items()} if live else got == {}
