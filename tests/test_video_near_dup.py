"""Round-11 video near-dup: per-frame perceptual dHash + temporal
alignment (eclipse_spark.operators.multimodal.video_dhash_bands +
video_near_pairs) — the third modality through the banded near-dup
engine. The container walk is real EBMV parsing and every frame is a
real BMP decode; the aligned-join recall is pigeonhole-exact per
frame."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from eclipse_spark.operators import multimodal as mm


def _ref_frame_hash(vid: int, g: int) -> list[int]:
    """Numpy replay of encode_textured_video frame g + the 9x8 dHash
    band recipe — no Spark, no codec."""
    w, h = 8 + vid % 9, 8 + vid % 7
    e = vid + 131 * g
    xs = np.arange(w)[None, :, None]
    ys = np.arange(h)[:, None, None]
    cs = np.arange(3)[None, None, :]
    v = (
        xs * ys * (e % 17 + 3)
        + 5 * xs * (e % 11 + 1)
        + 3 * ys * (e % 7 + 1)
        + 11 * cs
        + e
    ) % 256
    arr = v.astype(np.int64)
    yy = (np.arange(8) * h) // 8
    xx = (np.arange(9) * w) // 9
    small = arr[yy][:, xx]
    luma = (
        299 * small[:, :, 0] + 587 * small[:, :, 1] + 114 * small[:, :, 2]
    ) // 1000
    bits = (luma[:, 1:] > luma[:, :-1]).astype(np.int64)
    pos = (np.arange(8)[:, None] % 2) * 8 + np.arange(8)[None, :]
    vals = bits << pos
    return [int(vals[2 * t : 2 * t + 2].sum()) for t in range(4)]


def test_video_frame_hashes_bit_exact(spark):
    """Container walk + per-frame decode + hash equals the numpy spec
    for every (video, frame)."""
    ids = spark.range(0, 25).select(F.col("id"))
    hs = mm.video_dhash_bands(mm.encode_textured_video(ids)).collect()
    by_key = {(r["id"], r["frame_idx"]): [r["b0"], r["b1"], r["b2"], r["b3"]]
              for r in hs}
    assert len(by_key) == sum(3 + d % 5 for d in range(25))
    for (vid, g), bands in by_key.items():
        assert bands == _ref_frame_hash(vid, g), f"video {vid} frame {g}"


def test_video_planted_and_truncated_recall(spark):
    """Exact copies align on all F frames at hamming 0; truncated
    copies (last frame dropped) align on F-1 — and the truncated-vs-
    exact plant pair surfaces too. min_frames=2 keeps all three
    classes."""
    ids = spark.range(0, 40).select(F.col("id"))
    full = mm.encode_textured_video(ids)
    planted = full.filter(F.col("id") % 10 == 0).select(
        (F.col("id") + 100000).alias("id"), "bytes"
    )
    trunc_src = ids.filter(F.col("id") % 20 == 0).select(
        "id", (F.lit(2) + F.col("id") % 5).cast("int").alias("nf")
    )
    trunc = mm.encode_textured_video(trunc_src, frames_col="nf").select(
        (F.col("id") + 200000).alias("id"), "bytes"
    )
    hs = mm.video_dhash_bands(
        full.unionByName(planted).unionByName(trunc)
    )
    pairs = {(r["id_a"], r["id_b"]): (r["n_close"], r["sum_hamming"])
             for r in mm.video_near_pairs(hs, min_frames=2).collect()}
    for d in range(0, 40, 10):
        F_d = 3 + d % 5
        assert pairs[(d, d + 100000)] == (F_d, 0)
    for d in range(0, 40, 20):
        F_d = 3 + d % 5
        assert pairs[(d, d + 200000)] == (F_d - 1, 0)
        assert pairs[(d + 100000, d + 200000)] == (F_d - 1, 0)


def test_video_guard_fires_on_clones(spark):
    """All-identical videos cohabit every aligned band bucket — the
    pre-join audit must refuse before scheduling the join."""
    one = mm.encode_textured_video(
        spark.range(0, 1).select(F.col("id"))
    ).select("bytes")
    clones = spark.range(0, 80).crossJoin(one).select("id", "bytes")
    hs = mm.video_dhash_bands(clones)
    with pytest.raises(ValueError, match="candidate pairs > max_pairs"):
        mm.video_near_pairs(hs, max_pairs=500)


def test_video_container_errors_loud(spark):
    """A corrupted container fails loudly inside the decode stage —
    never a silent empty fingerprint."""
    df = spark.createDataFrame(
        [(1, bytearray(b"NOTV\x00\x00\x00\x00"))], "id long, bytes binary"
    )
    with pytest.raises(Exception, match="EBMV"):
        mm.video_dhash_bands(df).collect()
