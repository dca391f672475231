"""Round-13 fixes.

- VERDICT r12 task 7: video_near_pairs_shifted's tail is LAZY now —
  construction fires no join job (only the volume audit's collect when
  max_pairs is set), so composing the operator inside a larger lazy
  plan no longer runs a hidden eager localCheckpoint job.
- ADVICE r12 (multimodal.py:996): dhash_pairs_against releases its
  persisted hash frames on EVERY exit path (guard trip, audit failure),
  not just the success path.
- ADVICE r12 (__spark_entry__.py:7671): q_cross_modal_curation removes
  its per-invocation semcache tempdir — repeated bench/driver runs no
  longer accumulate materialized parquet cache dirs.
"""

from __future__ import annotations

import glob
import os
import sys
import tempfile

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from eclipse_spark.operators import multimodal as mm


def _persisted_count(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def test_video_shifted_construction_is_lazy(spark):
    """max_pairs=None: ZERO jobs at construction. With the guard: only
    the audit's jobs run at construction; the banded join itself fires
    at the first action (VERDICT r12 task 7 — the eager
    localCheckpoint tail is gone)."""
    sc = spark.sparkContext
    st = sc.statusTracker()
    ids = spark.range(24).select((F.col("id") * 20).alias("id"))
    hs = mm.video_dhash_bands(mm.encode_textured_video(ids)).persist()
    hs.count()

    sc.setJobGroup("r13_construct_nolimit", "lazy-construction check")
    out0 = mm.video_near_pairs_shifted(
        hs, min_frames=2, max_shift=1, max_pairs=None
    )
    sc.setJobGroup("r13_idle", "")
    assert len(st.getJobIdsForGroup("r13_construct_nolimit")) == 0, (
        "unguarded construction must not fire any job"
    )

    # reference: how many jobs does the audit alone cost?
    base = hs.select("id", "frame_idx", "b0", "b1", "b2", "b3")
    sc.setJobGroup("r13_audit_ref", "audit job count")
    mm.video_shifted_candidate_volume(base, 4, 1)
    audit_jobs = len(st.getJobIdsForGroup("r13_audit_ref"))

    sc.setJobGroup("r13_construct_guarded", "audit-only construction")
    out = mm.video_near_pairs_shifted(
        hs, min_frames=2, max_shift=1, max_pairs=10_000_000
    )
    jobs_construct = len(st.getJobIdsForGroup("r13_construct_guarded"))
    sc.setJobGroup("r13_action", "join runs here")
    n = out.count()
    jobs_action = len(st.getJobIdsForGroup("r13_action"))
    sc.setJobGroup("r13_done", "")

    assert jobs_construct <= audit_jobs, (
        f"guarded construction fired {jobs_construct} jobs but the "
        f"audit alone costs {audit_jobs} — an eager join job leaked "
        f"back into construction"
    )
    assert jobs_action >= 1, "the join must execute at action time"
    assert n == out0.count(), "guarded and unguarded results must agree"
    out.unpersist()
    hs.unpersist()


def test_dhash_pairs_against_unpersists_on_guard_trip(spark):
    """A tripped volume guard must not leak the persisted new/ref hash
    frames (ADVICE r12: the audit/checkpoint error paths leaked)."""
    imgs = mm.encode_textured_bmp(spark.range(40).select("id"))
    hs = mm.dhash_bands(imgs)
    before = _persisted_count(spark)
    with pytest.raises(ValueError, match="candidate pairs"):
        mm.dhash_pairs_against(hs, hs, max_pairs=0)
    # <= not ==: the ContextCleaner may asynchronously unpersist
    # UNRELATED dropped RDDs from earlier tests during this window
    # (r14 lesson); the leak under test is GROWTH
    assert _persisted_count(spark) <= before, (
        "guard trip leaked persisted hash frames"
    )


def test_video_shifted_unpersists_on_guard_trip(spark):
    ids = spark.range(20).select((F.col("id") * 20).alias("id"))
    hs = mm.video_dhash_bands(mm.encode_textured_video(ids))
    before = _persisted_count(spark)
    with pytest.raises(ValueError, match="candidate rows"):
        mm.video_near_pairs_shifted(hs, max_shift=1, max_pairs=0)
    # <= not == — see test_dhash_pairs_against_unpersists_on_guard_trip
    assert _persisted_count(spark) <= before, (
        "guard trip leaked the persisted base frame"
    )


def test_cross_modal_curation_cleans_its_cache_dir(spark, sf_smoke):
    """q_cross_modal_curation must leave no eclipse_xmodal_* tempdir
    behind (ADVICE r12: dirs accumulated across runs)."""
    import __spark_entry__ as entrymod

    pat = os.path.join(tempfile.gettempdir(), "eclipse_xmodal_*")
    before = set(glob.glob(pat))
    out = entrymod.q_cross_modal_curation(spark, sf_smoke)
    assert out.count() == 3
    leaked = set(glob.glob(pat)) - before
    assert not leaked, f"leaked cache dirs: {sorted(leaked)}"


def test_cross_modal_incremental_semantics(spark, sf_smoke):
    """r13 capability row: every planted cross-set duplicate must flag
    in every modality, the gate prefix must be computed once (interior
    hit per follower, full-plan miss everywhere), and the tempdir must
    not leak."""
    import __spark_entry__ as entrymod

    pat = os.path.join(tempfile.gettempdir(), "eclipse_xinc_*")
    before = set(glob.glob(pat))
    rows = {
        r["modality"]: r
        for r in entrymod.q_cross_modal_incremental(spark, sf_smoke).collect()
    }
    assert set(rows) == {"text", "image", "audio"}
    n_plant = 33  # sf0.001: gated ref survivors with doc_id % 8 == 1
    for m, r in rows.items():
        assert r["n_new"] == 84 + n_plant
        assert r["n_ref"] == 233
        # every plant is byte/content-identical to its ref original,
        # so at least the plants flag; nothing kept exceeds the corpus
        assert r["n_flagged"] >= n_plant, f"{m}: plants missed"
        assert r["n_kept"] == r["n_new"] - r["n_flagged"]
        assert r["full_hit"] == 0, f"{m}: app-keyed full plan must miss"
    assert rows["text"]["prefix_hits"] == 0
    assert rows["image"]["prefix_hits"] == 1, "image must reuse the gate"
    assert rows["audio"]["prefix_hits"] == 1, "audio must reuse the gate"
    leaked = set(glob.glob(pat)) - before
    assert not leaked, f"leaked cache dirs: {sorted(leaked)}"


def test_media_index_refresh_matches_direct_and_skips_ref_decode(
    spark, sf_smoke, tmp_path
):
    """r13 capability: the stored-index refresh must (a) reproduce the
    direct dhash_pairs_against result exactly, (b) serve the ref side
    from the bucketed parquet index — no Arrow decode stage on the ref
    branch and a bucketed scan in the plan."""
    from eclipse_spark.storage import Catalog

    docs = spark.read.parquet(
        os.path.join(sf_smoke, "documents.parquet")
    ).selectExpr("doc_id AS id")
    ref_ids = docs.filter(F.col("id") % 4 != 0)
    new_ids = docs.filter(F.col("id") % 4 == 0)
    ref_imgs = mm.encode_textured_bmp(ref_ids)
    new_imgs = mm.encode_textured_bmp(new_ids).unionByName(
        ref_imgs.filter(F.col("id") % 8 == 1).select(
            (F.col("id") + 100000).alias("id"), "bytes"
        )
    )
    direct = mm.dhash_pairs_against(
        mm.dhash_bands(new_imgs), mm.dhash_bands(ref_imgs), max_hamming=3
    )
    cat = Catalog(spark, str(tmp_path / "cat"))
    table = "dhash_ref_index_test"
    try:
        mm.dhash_index_ref(cat, mm.dhash_bands(ref_imgs), table=table)
        refresh = mm.dhash_pairs_against_index(
            mm.dhash_bands(new_imgs), cat.get_table(table), max_hamming=3
        )
        assert sorted(map(tuple, refresh.collect())) == sorted(
            map(tuple, direct.collect())
        )
        # plan shape: ref branch is a bucketed parquet scan, and the
        # refresh plan carries strictly fewer Arrow stages than the
        # direct plan (only the NEW side decodes)
        lazy = mm.dhash_pairs_against_index(
            mm.dhash_bands(new_imgs), cat.get_table(table),
            max_hamming=3, max_pairs=None,
        )
        plan = lazy._jdf.queryExecution().executedPlan().toString()
        direct_lazy = mm.dhash_pairs_against(
            mm.dhash_bands(new_imgs), mm.dhash_bands(ref_imgs),
            max_hamming=3, max_pairs=None,
        )
        dplan = direct_lazy._jdf.queryExecution().executedPlan().toString()
        n_arrow = plan.count("MapInPandas") + plan.count("ArrowEval")
        n_arrow_direct = dplan.count("MapInPandas") + dplan.count("ArrowEval")
        assert n_arrow < n_arrow_direct, (
            f"index plan has {n_arrow} Arrow stages vs direct "
            f"{n_arrow_direct} — the ref side is being re-decoded"
        )
        assert "Bucketed: true" in plan or "SelectedBucketsCount" in plan, (
            "the index side must be a bucketed scan"
        )
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_stream_media_refresh_batch_parity(spark, sf_smoke):
    """The stream-static refresh must equal the batch new x ref join
    bit-for-bit on a finite source (same corpora as
    media_incremental_dedup's plant scheme, modulo the +100000 rekey)."""
    import __spark_entry__ as entrymod

    streamed = sorted(
        map(tuple, entrymod.q_stream_media_refresh(spark, sf_smoke).collect())
    )
    docs = spark.read.parquet(
        os.path.join(sf_smoke, "documents.parquet")
    ).selectExpr("doc_id AS id")
    ref_imgs = mm.encode_textured_bmp(docs.filter(F.col("id") % 4 != 0))
    new_imgs = mm.encode_textured_bmp(
        docs.filter(F.col("id") % 4 == 0)
    ).unionByName(
        ref_imgs.filter(F.col("id") % 8 == 1).select(
            (F.col("id") + 100000).alias("id"), "bytes"
        )
    )
    batch = sorted(
        map(
            tuple,
            mm.dhash_pairs_against(
                mm.dhash_bands(new_imgs), mm.dhash_bands(ref_imgs),
                max_hamming=3,
            ).collect(),
        )
    )
    assert streamed == batch
    assert len(streamed) > 0


def test_stream_refresh_state_is_near_pairs_only(spark, sf_smoke):
    """The stream-static refresh's ONLY stateful operator is the
    min-hamming rollup, and its state rows equal the near-pair count —
    not the candidate volume, not the stream length."""
    from eclipse_spark.storage import Catalog
    from eclipse_spark.streaming import windows as stream_windows

    docs_path = os.path.join(sf_smoke, "documents.parquet")
    raw_schema = spark.read.parquet(docs_path).schema
    ref_ids = (
        spark.read.parquet(docs_path)
        .selectExpr("doc_id AS id")
        .filter(F.col("id") % 4 != 0)
    )
    cat = Catalog(spark, tempfile.mkdtemp(prefix="eclipse_state_idx_"))
    table = "dhash_state_ref_index"
    try:
        mm.dhash_index_ref(
            cat, mm.dhash_bands(mm.encode_textured_bmp(ref_ids)),
            table=table,
        )
        new_ids = (
            stream_windows.stream_from_parquet(
                spark, os.path.join(sf_smoke, "documents.*"), raw_schema
            )
            .filter(F.col("doc_id") % 4 == 0)
            .selectExpr("doc_id AS id")
        )
        pairs = mm.dhash_pairs_against_index_stream(
            mm.dhash_bands(mm.encode_textured_bmp(new_ids)),
            cat.get_table(table),
            max_hamming=3,
        )
        q = (
            pairs.writeStream.outputMode("complete")
            .format("memory")
            .queryName("state_probe_refresh")
            .start()
        )
        q.processAllAvailable()
        progress = q.lastProgress
        q.stop()
        n_pairs = spark.table("state_probe_refresh").count()
        ops = progress["stateOperators"]
        assert len(ops) == 1, f"expected ONE stateful op, got {len(ops)}"
        assert ops[0]["numRowsTotal"] == n_pairs, (
            f"state rows {ops[0]['numRowsTotal']} != near pairs {n_pairs}"
        )
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_dhash_index_ref_serves_audio_fingerprints(spark, tmp_path):
    """One index shape serves both modalities: an AUDIO fingerprint
    index stored via dhash_index_ref must reproduce the direct
    new x ref join over tone WAVs exactly."""
    from eclipse_spark.storage import Catalog

    ids = spark.range(80).select("id")
    ref_wavs = mm.encode_tone_wav(ids.filter(F.col("id") % 4 != 0))
    new_wavs = mm.encode_tone_wav(
        ids.filter(F.col("id") % 4 == 0)
    ).unionByName(
        ref_wavs.filter(F.col("id") % 8 == 1).select(
            (F.col("id") + 100000).alias("id"), "bytes"
        )
    )
    direct = mm.dhash_pairs_against(
        mm.audio_fingerprint_bands(new_wavs),
        mm.audio_fingerprint_bands(ref_wavs),
        max_hamming=3,
    )
    cat = Catalog(spark, str(tmp_path / "cat"))
    table = "audio_ref_index_test"
    try:
        mm.dhash_index_ref(
            cat, mm.audio_fingerprint_bands(ref_wavs), table=table
        )
        refresh = mm.dhash_pairs_against_index(
            mm.audio_fingerprint_bands(new_wavs),
            cat.get_table(table),
            max_hamming=3,
        )
        got = sorted(map(tuple, refresh.collect()))
        want = sorted(map(tuple, direct.collect()))
        assert got == want
        assert any(a - b == 100000 for a, b, _ in got), (
            "planted cross-set duplicates must flag"
        )
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_semantic_dedup_against_flags_plants_and_guards(spark, sf_smoke):
    """The embedding tier of the incremental family: every planted
    scaled copy (cos 1.0 vs its ref original) must flag with
    n_dups >= 1; originals-only new vectors keep; a tripped guard
    releases the persisted assignments."""
    from eclipse_spark.operators import dedup

    emb = spark.read.parquet(os.path.join(sf_smoke, "embeddings.parquet"))
    e = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    ref = e.filter(F.col("vec_id") % 4 != 0)
    new = e.filter(F.col("vec_id") % 4 == 0).unionByName(
        ref.filter(F.col("vec_id") % 8 == 1).select(
            (F.col("vec_id") + 100000).alias("vec_id"),
            F.transform("embedding", lambda x: x * F.lit(1.1)).alias(
                "embedding"
            ),
        )
    )
    cents = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cell"), F.col("embedding").alias("centroid")
    )
    out = dedup.semantic_dedup_against(new, ref, cents, threshold=0.95)
    rows = {r["vec_id"]: r for r in out.collect()}
    plants = [v for v in rows if v >= 100000]
    assert plants, "corpus must contain planted copies"
    for v in plants:
        assert rows[v]["kept"] == 0 and rows[v]["n_dups"] >= 1, (
            f"plant {v} must flag against its ref original"
        )
    n_new_total = new.count()
    assert len(rows) == n_new_total, "one row per NEW vector exactly"
    assert all(
        (r["kept"] == 1) == (r["n_dups"] == 0) for r in rows.values()
    )
    before = _persisted_count(spark)
    with pytest.raises(RuntimeError, match="pair count"):
        dedup.semantic_dedup_against(new, ref, cents, max_pairs=1)
    # <= not == — async ContextCleaner shrinkage, see the r14 note above
    assert _persisted_count(spark) <= before, "guard trip leaked persists"


def test_semantic_scaled_cross_equals_exact_tier(spark, sf_smoke):
    """The GEMM kernel tier of incremental SemDeDup must reproduce the
    exact tier bit-for-bit on the margin-separated planted corpora
    (organic ~0.49 vs planted 1.0), and its guard must release the
    persisted assignment on a trip."""
    from eclipse_spark.operators import dedup

    emb = spark.read.parquet(os.path.join(sf_smoke, "embeddings.parquet"))
    e = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    ref = e.filter(F.col("vec_id") % 4 != 0)
    new = e.filter(F.col("vec_id") % 4 == 0).unionByName(
        ref.filter(F.col("vec_id") % 8 == 1).select(
            (F.col("vec_id") + 100000).alias("vec_id"),
            F.transform("embedding", lambda x: x * F.lit(1.1)).alias(
                "embedding"
            ),
        )
    )
    cents = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cell"), F.col("embedding").alias("centroid")
    )
    exact = sorted(
        map(
            tuple,
            dedup.semantic_dedup_against(
                new, ref, cents, threshold=0.95
            ).collect(),
        )
    )
    scaled = sorted(
        map(
            tuple,
            dedup.semantic_dedup_against_scaled(
                new, ref, cents, threshold=0.95
            ).collect(),
        )
    )
    assert scaled == exact
    before = _persisted_count(spark)
    with pytest.raises(RuntimeError, match="pair count"):
        dedup.semantic_dedup_against_scaled(new, ref, cents, max_pairs=1)
    # <= not == — async ContextCleaner shrinkage, see the r14 note above
    assert _persisted_count(spark) <= before, "guard trip leaked persists"
