"""Round-12 fixes.

- VERDICT r11 task 5: the semcache TWO KEY REGIMES nuance — the
  fingerprint+snapshot-version key must MISS after a version bump
  exactly where a stable name key HITS (the staleness `lineage_audit`
  measures is a property of name keys only).
- ADVICE r11 (multimodal.py:929): audio_fingerprint_bands' n_frames is
  a real knob now — other frame counts derive the band width; invalid
  counts fail loudly; the default is bit-identical to the 65-frame
  contract every prior oracle pinned.
- ADVICE r11 (multimodal.py:672): encode_textured_video rejects
  per-row frame counts < 1 instead of emitting a degenerate container.
"""

from __future__ import annotations

import os
import sys
import tempfile

import numpy as np
import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_fingerprint_key_misses_where_name_key_hits(spark, sf_smoke):
    """After a version bump, the op-DAG fingerprint key (scan leaf
    embeds the snapshot version) MISSES — stale results unreachable —
    while the name key HITS and keeps serving the old build (the
    identity-stable regime lineage_audit audits)."""
    from eclipse_spark.plans.dag import PlanNode
    from eclipse_spark.semcache import SemanticCache
    from eclipse_spark.storage import Catalog

    cat = Catalog(spark, tempfile.mkdtemp(prefix="eclipse_regimes_"))
    cache = SemanticCache(spark, tempfile.mkdtemp(prefix="eclipse_regimes_sc_"))
    orders = spark.read.parquet(os.path.join(sf_smoke, "orders.parquet"))
    cat.put("reg_orders", orders.filter(F.col("o_orderkey") % 3 == 0))

    def app():
        return (
            cat.get("reg_orders")
            .groupBy((F.col("o_custkey") % 10).alias("bucket"))
            .agg(F.count("*").cast("long").alias("n"))
        )

    def fp_key():
        ver = cat.info("reg_orders").version
        return (
            PlanNode.leaf("scan", table="reg_orders", version=ver)
            .child("agg", by="bucket")
            .fingerprint()
        )

    res_name, hit0 = cache.get_or_compute("regimes_app", app)
    res_fp, fhit0 = cache.get_or_compute(fp_key(), app)
    assert not hit0 and not fhit0
    n_v1 = res_name.count()

    cat.merge(
        "reg_orders",
        orders.filter(F.col("o_orderkey") % 5 == 0),
        on=["o_orderkey"],
    )

    res_name2, hit1 = cache.get_or_compute("regimes_app", app)
    assert hit1, "name key must survive the version bump (identity-stable)"
    assert res_name2.count() == n_v1, "name hit serves the v1 build"
    res_fp2, fhit1 = cache.get_or_compute(fp_key(), app)
    assert not fhit1, "fingerprint key must MISS after the version bump"
    assert res_fp2.agg(F.sum("n")).collect()[0][0] == cat.get(
        "reg_orders"
    ).count(), "fingerprint miss recomputes against the current version"


def test_audio_fingerprint_n_frames_knob(spark):
    """n_frames=33 yields 8-bit bands with the same gradient rule
    (every band < 2^8), n_frames=65 stays the pinned 64-bit contract,
    and counts that don't give 4 equal bands in [4,16] bits raise."""
    from eclipse_spark.operators import multimodal as mm

    ids = spark.range(20).select(F.col("id"))
    wavs = mm.encode_tone_wav(ids, id_col="id")

    full = {r["id"]: (r["b0"], r["b1"], r["b2"], r["b3"])
            for r in mm.audio_fingerprint_bands(wavs).collect()}
    short = {r["id"]: (r["b0"], r["b1"], r["b2"], r["b3"])
             for r in mm.audio_fingerprint_bands(wavs, n_frames=33).collect()}
    assert set(full) == set(short) == set(range(20))
    assert all(0 <= b < 65536 for bs in full.values() for b in bs)
    assert all(0 <= b < 256 for bs in short.values() for b in bs)
    # first 8 delta bits agree between the two widths (same energies,
    # same rule — only the packing differs)
    for i in short:
        assert short[i][0] == full[i][0] % 256

    for bad in (0, 1, 64, 66, 200):
        with pytest.raises(ValueError, match="n_frames"):
            mm.audio_fingerprint_bands(wavs, n_frames=bad).collect()


def test_encode_textured_video_rejects_empty(spark):
    """A per-row frame count < 1 fails loudly instead of emitting a
    zero-frame EBMV container that contributes no hash rows."""
    from eclipse_spark.operators import multimodal as mm

    bad = spark.range(3).select(
        "id", F.when(F.col("id") == 1, 0).otherwise(4).alias("nf")
    )
    with pytest.raises(Exception, match="frames"):
        mm.encode_textured_video(bad, id_col="id", frames_col="nf").collect()
    good = spark.range(3).select("id", F.lit(2).alias("nf"))
    out = mm.encode_textured_video(good, id_col="id", frames_col="nf")
    assert out.count() == 3


def test_video_shifted_catches_head_trim(spark):
    """A head-trimmed re-cut is invisible to strict frame_idx
    alignment but must surface at shift 1 with the surviving frames
    close (and the shifted operator must still find exact copies at
    shift 0)."""
    from eclipse_spark.operators import multimodal as mm

    ids = spark.range(40).select((F.col("id") * 20).alias("id"))
    full = mm.encode_textured_video(ids)  # id%20==0 -> 3 frames each
    trimmed = mm.trim_video_head(full, n=1).select(
        (F.col("id") + 300000).alias("id"), "bytes"
    )
    exact = full.select((F.col("id") + 100000).alias("id"), "bytes")
    hs = mm.video_dhash_bands(
        full.unionByName(trimmed).unionByName(exact)
    )
    strict = {(r["id_a"], r["id_b"])
              for r in mm.video_near_pairs(hs, min_frames=2).collect()}
    shifted = {(r["id_a"], r["id_b"]): (r["shift"], r["n_close"])
               for r in mm.video_near_pairs_shifted(
                   hs, min_frames=2, max_shift=2).collect()}
    for base in range(0, 800, 20):
        assert (base, base + 300000) not in strict
        assert shifted[(base, base + 300000)] == (1, 2)
        assert shifted[(base, base + 100000)][0] == 0
        assert shifted[(base, base + 100000)][1] == 3


def test_trim_video_head_validates(spark):
    from eclipse_spark.operators import multimodal as mm

    ids = spark.range(3).select((F.col("id") * 5).alias("id"))
    vids = mm.encode_textured_video(ids)  # 3 frames each (id%5==0)
    with pytest.raises(Exception, match="leave none"):
        mm.trim_video_head(vids, n=3).collect()
    with pytest.raises(ValueError, match=">= 1"):
        mm.trim_video_head(vids, n=0)
    out = mm.trim_video_head(vids, n=2).collect()
    assert all(mm.video_frame_count(bytes(r["bytes"])) == 1 for r in out)


def test_fingerprint_bucket_rollup_batch_equals_banded(spark):
    """The streaming-compatible rollup must bucket BIT-IDENTICALLY to
    the batch banded family: every (band, bkey) group of size >= 2 in
    the rollup is exactly a bucket the batch _dhash_banded explode
    produces, with the same membership counts."""
    from eclipse_spark.operators import multimodal as mm

    ids = spark.range(60).select("id")
    wavs = mm.encode_tone_wav(ids)
    corpus = wavs.unionByName(
        wavs.filter(F.col("id") % 10 == 0).select(
            (F.col("id") + 100000).alias("id"), "bytes"
        )
    )
    fp = mm.audio_fingerprint_bands(corpus).persist()
    roll = {(r["band"], r["bkey"]): (r["rep_id"], r["n_clips"])
            for r in mm.fingerprint_bucket_rollup(fp).collect()}
    banded = (
        mm._dhash_banded(fp, 4, composed=False)
        .groupBy("tbl", "bkey")
        .agg(F.min("id").alias("rep"), F.count("*").alias("n"))
        .collect()
    )
    assert roll == {(r["tbl"], r["bkey"]): (r["rep"], r["n"])
                    for r in banded}
    fp.unpersist()


def test_video_bucket_rollup_batch_equals_banded(spark):
    """The streaming-compatible video rollup must bucket
    BIT-IDENTICALLY to the batch temporal-aligned banded explode
    (_video_banded), with the same membership counts per
    (frame_idx, band, bkey) bucket."""
    from eclipse_spark.operators import multimodal as mm

    ids = spark.range(40).select("id")
    vids = mm.encode_textured_video(ids)
    corpus = vids.unionByName(
        vids.filter(F.col("id") % 10 == 0).select(
            (F.col("id") + 100000).alias("id"), "bytes"
        )
    )
    hs = mm.video_dhash_bands(corpus).persist()
    roll = {(r["frame_idx"], r["band"], r["bkey"]):
            (r["rep_id"], r["n_videos"])
            for r in mm.video_bucket_rollup(hs).collect()}
    banded = (
        mm._video_banded(hs, 4)
        .groupBy("frame_idx", "tbl", "bkey")
        .agg(F.min("id").alias("rep"), F.count("*").alias("n"))
        .collect()
    )
    assert roll == {(r["frame_idx"], r["tbl"], r["bkey"]):
                    (r["rep"], r["n"]) for r in banded}
    # every planted video co-buckets with its original at every frame
    for (g, band, bkey), (rep, n) in roll.items():
        if n >= 2:
            assert rep < 100000
    hs.unpersist()


def test_audio_shifted_catches_head_trim(spark):
    """A head-trimmed re-take (one hop = 128 samples removed by real
    RIFF surgery) scrambles the whole-clip fingerprint but must
    surface at shift 1 through the windowed fingerprints — the same
    offset-enumerated engine the video path uses."""
    from eclipse_spark.operators import multimodal as mm

    ids = spark.range(30).select((F.col("id") * 20).alias("id"))
    wavs = mm.encode_tone_wav(ids, base_samples=2080, mod=509)
    trimmed = mm.trim_wav_head(wavs, n_samples=128).select(
        (F.col("id") + 300000).alias("id"), "bytes"
    )
    exact = wavs.select((F.col("id") + 100000).alias("id"), "bytes")
    hs = mm.audio_window_bands(
        wavs.unionByName(trimmed).unionByName(exact)
    )
    strict = {(r["id_a"], r["id_b"])
              for r in mm.video_near_pairs(hs, min_frames=2).collect()}
    shifted = {(r["id_a"], r["id_b"]): (r["shift"], r["n_close"])
               for r in mm.video_near_pairs_shifted(
                   hs, min_frames=2, max_shift=2).collect()}
    for base in range(0, 600, 20):
        assert (base, base + 300000) not in strict
        sh, n = shifted[(base, base + 300000)]
        assert sh == 1 and n >= 2
        assert shifted[(base, base + 100000)][0] == 0
    # and the WHOLE-CLIP fingerprint really is scrambled by the trim:
    # original vs trimmed clip disagree in many gradient bits
    fp_o = {r["id"]: (r["b0"], r["b1"], r["b2"], r["b3"])
            for r in mm.audio_fingerprint_bands(wavs).collect()}
    fp_t = {r["id"] - 300000: (r["b0"], r["b1"], r["b2"], r["b3"])
            for r in mm.audio_fingerprint_bands(trimmed).collect()}
    diff = sum(
        bin(a ^ b).count("1")
        for i in fp_o
        for a, b in zip(fp_o[i], fp_t[i])
    ) / len(fp_o)
    assert diff > 10, f"trim should scramble the whole-clip hash, {diff}"


def test_trim_wav_head_validates(spark):
    from eclipse_spark.operators import multimodal as mm

    wavs = mm.encode_tone_wav(spark.range(3).select("id"))
    with pytest.raises(ValueError, match=">= 1"):
        mm.trim_wav_head(wavs, n_samples=0)
    with pytest.raises(Exception, match="leave none"):
        mm.trim_wav_head(wavs, n_samples=10000).collect()
    out = mm.trim_wav_head(wavs, n_samples=16).collect()
    from eclipse_spark.operators.multimodal import wav_decode
    for r in out:
        _rate, s = wav_decode(bytes(r["bytes"]))
        assert len(s) >= 1024


def test_media_incremental_flags_only_cross_set(spark):
    """dhash_pairs_against joins new x ref only: every planted copy
    flags against its ref original, and no pair has both ids from the
    same side."""
    from eclipse_spark.operators import multimodal as mm

    ids = spark.range(120).select("id")
    ref = mm.encode_textured_bmp(ids.filter(F.col("id") % 4 != 0))
    new = mm.encode_textured_bmp(
        ids.filter(F.col("id") % 4 == 0)
    ).unionByName(
        ref.filter(F.col("id") % 8 == 1).select(
            (F.col("id") + 100000).alias("id"), "bytes"
        )
    )
    pairs = mm.dhash_pairs_against(
        mm.dhash_bands(new), mm.dhash_bands(ref), max_hamming=3
    ).collect()
    got = {(r["id_new"], r["id_ref"]): r["hamming"] for r in pairs}
    for i in range(1, 120, 8):  # id % 8 == 1 plants
        assert got[(i + 100000, i)] == 0, f"plant {i} must flag"
    ref_ids = set(range(120)) - set(range(0, 120, 4))
    for (idn, idr) in got:
        assert idr in ref_ids
        assert idn % 4 == 0 or (idn - 100000) in ref_ids
