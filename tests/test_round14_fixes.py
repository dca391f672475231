"""Round-14 fixes (the three ADVICE r13 findings + VERDICT r13 task 7).

- ADVICE r13 (multimodal.py:1428): video_near_pairs_shifted returned a
  persist()'d frame nobody unpersisted — a CacheManager entry leaked per
  invocation. The operator now returns the lazy plan UN-persisted;
  callers that run multiple actions own their caching.
- ADVICE r13 (multimodal.py:1023): dhash_pairs_against_index[_stream]
  trusted the stored index's band semantics; an index built with a
  different band count joined cleanly on (tbl, bkey) and silently
  produced wrong hamming. Both now assert the exact expected column set
  at entry and fail loudly.
- ADVICE r13 (__spark_entry__.py:8467): _R13_WINDOW held 51 keys while
  the driver gate checks 50, silently excluding data_profile; the r14
  window is asserted to hold exactly 50 registry keys, led by the r14
  additions.
- VERDICT r13 task 7: dhash_refresh_to_table is the production write
  path for the media refresh (the registry demo's bounded collect is
  documented as demo-only).
"""

from __future__ import annotations

import os
import sys
import tempfile

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from eclipse_spark.operators import multimodal as mm


def _persisted_count(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def test_video_shifted_leaves_no_persisted_rdd(spark):
    """Invoking + fully materializing video_near_pairs_shifted must not
    add a CacheManager entry that outlives the call (ADVICE r13: the
    r13 lazy-tail persist() was never unpersisted by any caller)."""
    ids = spark.range(24).select((F.col("id") * 20).alias("id"))
    hs = mm.video_dhash_bands(mm.encode_textured_video(ids))
    before = _persisted_count(spark)
    out = mm.video_near_pairs_shifted(
        hs, min_frames=2, max_shift=1, max_pairs=10_000_000
    )
    out.count()
    out.count()  # a second action must also be legal (recompute, lazy)
    # <= not ==: in a long shared session the ContextCleaner may
    # asynchronously unpersist UNRELATED dropped RDDs from earlier
    # tests during this window, legitimately shrinking the count; the
    # leak under test is GROWTH (the r13 persist added one entry per
    # invocation, so two invocations would show before+2 here)
    assert _persisted_count(spark) <= before, (
        "video_near_pairs_shifted leaked a persisted RDD across its "
        "own materialization"
    )


def test_index_join_rejects_mismatched_band_count(spark):
    """An index built with 8 bands must be refused by a 4-band refresh
    join instead of silently joining with wrong band semantics
    (ADVICE r13)."""
    imgs = mm.encode_textured_bmp(spark.range(30).select("id"))
    hs4 = mm.dhash_bands(imgs)  # b0..b3
    # Simulate an 8-band index: the wide-hash family's banded table has
    # extra band columns riding along.
    wide = mm._dhash_banded(hs4, 4, composed=False)
    wide8 = wide.withColumn("b4", F.col("b0")).withColumn(
        "b5", F.col("b1")
    ).withColumn("b6", F.col("b2")).withColumn("b7", F.col("b3"))
    with pytest.raises(ValueError, match="schema mismatch"):
        mm.dhash_pairs_against_index(hs4, wide8, max_hamming=3, n_bands=4)
    with pytest.raises(ValueError, match="schema mismatch"):
        mm.dhash_pairs_against_index_stream(
            hs4, wide8, max_hamming=3, n_bands=4
        )
    # A missing band column (index built narrower) must also fail.
    narrow = wide.drop("b3")
    with pytest.raises(ValueError, match="schema mismatch"):
        mm.dhash_pairs_against_index(hs4, narrow, max_hamming=2, n_bands=4)


def test_index_join_accepts_correct_schema(spark):
    """The assertion must not reject a correctly-built index, and the
    index join must still equal the direct new-x-ref join."""
    imgs = mm.encode_textured_bmp(spark.range(40).select("id"))
    ref = mm.dhash_bands(imgs.filter(F.col("id") % 2 == 0))
    new = mm.dhash_bands(
        imgs.filter(F.col("id") % 2 == 1).unionByName(
            imgs.filter(F.col("id") % 4 == 0).select(
                (F.col("id") + 1000).alias("id"), "bytes"
            )
        )
    )
    idx = mm._dhash_banded(ref, 4, composed=False)
    got = {
        (r["id_new"], r["id_ref"], r["hamming"])
        for r in mm.dhash_pairs_against_index(new, idx).collect()
    }
    want = {
        (r["id_new"], r["id_ref"], r["hamming"])
        for r in mm.dhash_pairs_against(new, ref).collect()
    }
    assert got == want and got, "index join diverged from direct join"


def test_dhash_refresh_to_table_writes_pairs(spark):
    """VERDICT r13 task 7: the production path writes the flagged-pair
    set to a catalog table; the read-back equals the direct join."""
    from eclipse_spark.storage import Catalog

    imgs = mm.encode_textured_bmp(spark.range(40).select("id"))
    ref = mm.dhash_bands(imgs.filter(F.col("id") % 2 == 0))
    new = mm.dhash_bands(
        imgs.filter(F.col("id") % 4 == 0).select(
            (F.col("id") + 1000).alias("id"), "bytes"
        )
    )
    with tempfile.TemporaryDirectory(prefix="eclipse_r14_refresh_") as d:
        cat = Catalog(spark, os.path.join(d, "cat"))
        try:
            mm.dhash_index_ref(cat, ref, table="r14_ref_idx")
            mm.dhash_refresh_to_table(
                cat, new, "r14_ref_idx", out_table="r14_refresh_pairs"
            )
            got = {
                (r["id_new"], r["id_ref"], r["hamming"])
                for r in cat.get("r14_refresh_pairs").collect()
            }
            want = {
                (r["id_new"], r["id_ref"], r["hamming"])
                for r in mm.dhash_pairs_against(new, ref).collect()
            }
            assert got == want and got
        finally:
            spark.sql("DROP TABLE IF EXISTS r14_ref_idx")


def test_ivf_refresh_equals_rebuild_and_keeps_recall(spark, sf_smoke):
    """VERDICT r13 task 6: (a) refresh == one-pass assignment of the
    MERGED corpus against the SAME stored centroids (deterministic
    argmax, so incremental append and monolithic assignment agree
    bit-for-bit), (b) probing all cells of the refreshed index
    reproduces brute force on the merged corpus (partition
    completeness survives the append), (c) the approximate tier keeps
    ann_ivf_recall's >= 0.35 mean-recall@10 bound."""
    from eclipse_spark.operators import similarity as sim
    from eclipse_spark.storage import Catalog

    emb = spark.read.parquet(os.path.join(sf_smoke, "embeddings.parquet"))
    ref = emb.filter(F.col("vec_id") % 4 != 0)
    new = emb.filter(F.col("vec_id") % 4 == 0)
    qs = emb.filter(F.col("vec_id") < 5)
    with tempfile.TemporaryDirectory(prefix="eclipse_r14_ivf_") as d:
        cat = Catalog(spark, os.path.join(d, "cat"))
        sim.ivf_index(cat, ref, table="ivf_a", n_cells=16)
        sim.ivf_refresh(cat, new, table="ivf_a")
        refreshed = {
            (r["match_id"], r["cell"])
            for r in cat.get("ivf_a_postings").select("match_id", "cell").collect()
        }
        monolithic = {
            (r["match_id"], r["cell"])
            for r in sim.ivf_assign(
                emb.select(F.col("vec_id").alias("match_id"), F.col("embedding").alias("cv")),
                cat.get("ivf_a_centroids"),
            ).select("match_id", "cell").collect()
        }
        assert refreshed == monolithic, (
            "incremental append diverged from one-pass assignment "
            "against the same stored centroids"
        )
        n_total = emb.count()
        assert len(refreshed) == n_total, "a vector was lost or duplicated"

        post = cat.get("ivf_a_postings")
        cents = cat.get("ivf_a_centroids")
        exact = sim.ivf_topk_stored(qs, post, cents, k=10, n_probe=16)
        truth = sim.brute_force_topk(qs, emb, k=10)
        got = {(r["query_id"], r["match_id"], r["rank"]) for r in exact.collect()}
        want = {(r["query_id"], r["match_id"], r["rank"]) for r in truth.collect()}
        assert got == want, "all-cell probe over refreshed index != brute force"

        approx = sim.ivf_topk_stored(qs, post, cents, k=10, n_probe=4)
        hits = (
            truth.select("query_id", "match_id")
            .join(
                approx.select("query_id", "match_id"),
                on=["query_id", "match_id"],
                how="left_semi",
            )
            .count()
        )
        assert hits / len(want) >= 0.35, (
            f"mean recall@10 {hits / len(want):.2f} below the 0.35 bound"
        )


def test_ivf_refresh_does_not_read_existing_postings(spark, sf_smoke):
    """The O(batch) contract: a refresh must never scan the stored
    posting files. Corrupt every existing posting file after the build
    — the refresh must still succeed (it only reads centroids + the
    new batch); a full read of the table afterwards fails, proving the
    corruption was real."""
    import glob as _glob

    from eclipse_spark.operators import similarity as sim
    from eclipse_spark.storage import Catalog

    emb = spark.read.parquet(os.path.join(sf_smoke, "embeddings.parquet"))
    ref = emb.filter(F.col("vec_id") % 4 != 0)
    new = emb.filter(F.col("vec_id") % 4 == 0)
    with tempfile.TemporaryDirectory(prefix="eclipse_r14_ivf_ob_") as d:
        cat = Catalog(spark, os.path.join(d, "cat"))
        postings_tbl, _ = sim.ivf_index(cat, ref, table="ivf_ob", n_cells=16)
        pdir = cat.path_of(postings_tbl)
        victims = _glob.glob(os.path.join(pdir, "**", "*.parquet"), recursive=True)
        assert victims, "no posting files written"
        for v in victims:
            with open(v, "wb") as fh:
                fh.write(b"not parquet")
        sim.ivf_refresh(cat, new, table="ivf_ob")  # must not touch them
        with pytest.raises(Exception):
            cat.get(postings_tbl).count()


def test_ivf_refresh_stream_batch_parity(spark, sf_smoke):
    """The streaming face drained over a finite source must leave the
    index bit-identical to one monolithic batch refresh of the same
    rows — a dropped or double-applied micro-batch breaks the posting
    multiset equality."""
    from eclipse_spark.operators import similarity as sim
    from eclipse_spark.storage import Catalog
    from eclipse_spark.streaming import windows as sw

    emb_path = os.path.join(sf_smoke, "embeddings.parquet")
    emb = spark.read.parquet(emb_path)
    ref = emb.filter(F.col("vec_id") % 4 != 0)
    new = emb.filter(F.col("vec_id") % 4 == 0)
    with tempfile.TemporaryDirectory(prefix="eclipse_r14_ivfs_") as d:
        cat = Catalog(spark, os.path.join(d, "cat"))
        sim.ivf_index(cat, ref, table="s_a", n_cells=16)
        sim.ivf_index(cat, ref, table="s_b", n_cells=16)
        stream = sw.stream_from_parquet(
            spark, os.path.join(sf_smoke, "embeddings.*"), emb.schema
        ).filter(F.col("vec_id") % 4 == 0)
        sim.ivf_refresh_stream(
            cat, stream, table="s_a", checkpoint=os.path.join(d, "ckpt")
        )
        sim.ivf_refresh(cat, new, table="s_b")
        drained = sorted(
            (r["match_id"], r["cell"])
            for r in cat.get("s_a_postings").select("match_id", "cell").collect()
        )
        batch = sorted(
            (r["match_id"], r["cell"])
            for r in cat.get("s_b_postings").select("match_id", "cell").collect()
        )
        assert drained == batch and len(drained) == emb.count(), (
            "drained stream index diverged from the monolithic batch refresh"
        )


def test_ivf_cell_stats_accounts_every_vector(spark, sf_smoke):
    """The rebuild-scheduling audit: counts per cell must sum to the
    corpus, shares to ~1.0 — and the stats must reflect a refresh
    append (the monitoring signal a drifting index emits)."""
    from eclipse_spark.operators import similarity as sim
    from eclipse_spark.storage import Catalog

    emb = spark.read.parquet(os.path.join(sf_smoke, "embeddings.parquet"))
    ref = emb.filter(F.col("vec_id") % 4 != 0)
    new = emb.filter(F.col("vec_id") % 4 == 0)
    with tempfile.TemporaryDirectory(prefix="eclipse_r14_stats_") as d:
        cat = Catalog(spark, os.path.join(d, "cat"))
        sim.ivf_index(cat, ref, table="stats_ck", n_cells=16)
        before = {
            r["cell"]: r["n_vectors"]
            for r in sim.ivf_cell_stats(cat.get("stats_ck_postings")).collect()
        }
        assert sum(before.values()) == ref.count()
        sim.ivf_refresh(cat, new, table="stats_ck")
        stats = sim.ivf_cell_stats(cat.get("stats_ck_postings")).collect()
        after = {r["cell"]: r["n_vectors"] for r in stats}
        assert sum(after.values()) == emb.count()
        assert abs(sum(r["share"] for r in stats) - 1.0) < 1e-3
        assert all(after[c] >= n for c, n in before.items())


def test_ivf_stored_probe_prunes_partitions(spark, sf_smoke):
    """The probe's join on the posting table's partition column must
    reach the parquet scan as DYNAMIC PARTITION PRUNING — only the
    probed cells' files are read (the claim ivf_topk_stored's
    docstring makes; at 100 TB this is the difference between scanning
    n_probe/n_cells of the corpus and all of it). Regression: someone
    un-partitions the posting table or breaks the equi-join shape and
    the pruning subquery vanishes from the plan."""
    from eclipse_spark.operators import similarity as sim
    from eclipse_spark.storage import Catalog

    emb = spark.read.parquet(os.path.join(sf_smoke, "embeddings.parquet"))
    with tempfile.TemporaryDirectory(prefix="eclipse_r14_dpp_") as d:
        cat = Catalog(spark, os.path.join(d, "cat"))
        sim.ivf_index(cat, emb, table="dpp_ck", n_cells=16)
        out = sim.ivf_topk_stored(
            emb.filter(F.col("vec_id") < 5),
            cat.get("dpp_ck_postings"),
            cat.get("dpp_ck_centroids"),
            k=10,
            n_probe=4,
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "dynamicpruning" in plan.lower(), (
            "posting scan lost its dynamic partition-pruning filter"
        )


def test_write_partitioned_rejects_layout_mismatch(spark):
    """Appending with a different partition spec than the on-disk
    layout must fail loudly, not interleave incompatible layouts."""
    from eclipse_spark.storage import Catalog

    with tempfile.TemporaryDirectory(prefix="eclipse_r14_wp_") as d:
        cat = Catalog(spark, os.path.join(d, "cat"))
        df = spark.range(10).select(
            F.col("id"), (F.col("id") % 3).alias("cell"), (F.col("id") % 2).alias("other")
        )
        cat.put("t", df, partition_by=["cell"])
        with pytest.raises(ValueError, match="partitioned"):
            cat.write_partitioned("t", df, ["other"])
        cat.write_partitioned("t", df, ["cell"])  # matching spec appends
        assert cat.get("t").count() == 20


def test_r14_window_is_exactly_50_registry_keys():
    """The driver gate checks the FIRST 50 queries() keys; the window
    literal must hold exactly 50 existing registry keys with no
    duplicates (ADVICE r13: _R13_WINDOW held 51, silently dropping
    data_profile from the gate while counting it as refreshed)."""
    import __spark_entry__ as entrymod

    win = entrymod._R14_WINDOW
    assert len(win) == 50, f"window has {len(win)} keys, driver checks 50"
    assert len(set(win)) == 50, "window contains duplicates"
    reg = entrymod.queries()
    missing = [k for k in win if k not in reg]
    assert not missing, f"window names unknown registry keys: {missing}"
    # r15: the gate lead rotated to _R15_WINDOW (which retains 25 of
    # these keys for the round-over-round overlap — VERDICT r14 item
    # 2); the r14 literal stays pinned above so the overlap contract
    # in test_round15_fixes can be checked against it.


def test_apss_positional_filter_preserves_verified_output(spark):
    """r14 optimization: the PPJoin positional bound prunes candidate
    matches before the distinct/verify, but the VERIFIED pair set must
    be bit-identical to the unfiltered prefix-filter path — the bound
    only removes pairs that cannot pass the exact verify."""
    from eclipse_spark.operators.similarity import (
        _apss_candidate_pairs,
        allpairs_cosine,
        allpairs_jaccard,
    )

    rows = [
        (1, ["a", "b", "c", "d", "e"]),
        (2, ["a", "b", "c", "d", "f"]),
        (3, ["a", "b", "c", "d", "e"]),
        (4, ["x", "y", "z", "a", "b"]),
        (5, ["x", "y", "z", "w", "v"]),
        (6, ["q"]),
        (7, ["q", "a"]),
        (8, ["m", "n", "o", "p", "a", "b", "c"]),
    ]
    df = spark.createDataFrame(rows, ["did", "toks"])
    for op, pct in ((allpairs_jaccard, 60), (allpairs_cosine, 49)):
        got = sorted(
            tuple(r) for r in op(df, "did", "toks", pct).collect()
        )
        # reference: same verify over the UNFILTERED candidate set
        toks, cand = _apss_candidate_pairs(df, "did", "toks", pct, bound=None)
        arrays = toks.groupBy("_id").agg(
            F.sort_array(F.collect_list("tok")).alias("arr")
        )
        v = (
            cand.join(
                arrays.select(F.col("_id").alias("id_a"), F.col("arr").alias("arr_a")),
                "id_a",
            )
            .join(
                arrays.select(F.col("_id").alias("id_b"), F.col("arr").alias("arr_b")),
                "id_b",
            )
            .withColumn("overlap", F.size(F.array_intersect("arr_a", "arr_b")))
        )
        if op is allpairs_jaccard:
            v = v.filter(
                F.lit(100) * F.col("overlap")
                >= F.lit(pct) * (F.col("n_a") + F.col("n_b") - F.col("overlap"))
            ).withColumn(
                "sim",
                F.round(
                    F.col("overlap")
                    / (F.col("n_a") + F.col("n_b") - F.col("overlap")).cast("double"),
                    9,
                ),
            )
        else:
            v = v.filter(
                F.lit(100) * F.col("overlap") * F.col("overlap")
                >= F.lit(pct) * F.col("n_a") * F.col("n_b")
            ).withColumn(
                "sim",
                F.round(
                    F.col("overlap")
                    / F.sqrt(F.col("n_a").cast("double") * F.col("n_b")),
                    9,
                ),
            )
        want = sorted(
            tuple(r)
            for r in v.select(
                "id_a",
                "id_b",
                F.col("overlap").cast("long"),
                F.col("n_a").cast("long"),
                F.col("n_b").cast("long"),
                "sim",
            ).collect()
        )
        assert got == want, f"{op.__name__}: positional filter changed the verified set"
        toks.unpersist()
