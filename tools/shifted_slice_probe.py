"""Round-13 (VERDICT r12 task 4) + round-14 (VERDICT r13 task 4): an
EXECUTED sf10 datapoint for the SHIFTED temporal near-dup join, via the
(frame_class, shift) shard the offset enumeration already provides —
for VIDEO (r13) and, because `audio_window_bands` is schema-compatible
with `video_dhash_bands` by design, for the shifted-AUDIO window-band
table with the SAME code (``--modality audio``, r14).

The sf10 shifted join (video: 55,789,580,724 scheduled candidate rows
at max_shift=2; audio: 41.0e9) is deliberately not run monolithically
single-node; its natural shards are (g, k) classes — a-side frames of
class g joined to b-side frames of class g-k (`multimodal.py`
video_near_pairs_shifted: the join key is ``a.frame_idx ==
b.frame_idx + k`` AND the band bucket, so fixing (g, k) selects
EXACTLY that class' share of the scheduled volume; the classes
partition the join and a cluster runs them as independent jobs). This
probe computes the exact per-(g, k) volume matrix from the banded
bucket histogram, executes the LARGEST k != 0 class end-to-end (the
worst independent job), and prices the standing volume-only row with
the directly measured shifted-verify rate. Emits one JSON row merged
into bench_scaling.json as ``media_{video,audio}_shifted_sliced``."""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from tools import scale_probe as sp  # noqa: E402
from eclipse_spark.operators import multimodal as mm  # noqa: E402

MAX_SHIFT = 2
MAX_HAMMING = 3


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--modality", choices=("video", "audio"), default="video"
    )
    args = ap.parse_args()
    big10 = os.path.join(REPO, "benchdata", "sf10")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("eclipse_spark_shifted_slice_probe")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.sql.files.maxPartitionBytes", "16m")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.perf_counter()
    if args.modality == "video":
        hs = sp._video_shifted_hashes(spark, big10)
    else:
        hs = sp._audio_shifted_hashes(spark, big10)
    base = hs.select(
        "id", "frame_idx", "b0", "b1", "b2", "b3"
    ).persist()
    n_hash_rows = base.count()
    decode_sec = round(time.perf_counter() - t0, 3)

    banded = mm._video_banded(base, 4)
    counts = (
        banded.groupBy("frame_idx", "tbl", "bkey")
        .agg(F.count("*").alias("n"))
    )
    # exact (g, k) volume matrix: scheduled rows of a-class g x
    # b-class g-k per shared bucket, k in [-MAX_SHIFT, MAX_SHIFT]
    vols = {
        (int(r["g"]), int(r["k"])): int(r["vol"])
        for r in counts.alias("x")
        .join(counts.alias("y"), on=["tbl", "bkey"])
        .filter(
            F.abs(F.col("x.frame_idx") - F.col("y.frame_idx")) <= MAX_SHIFT
        )
        .groupBy(
            F.col("x.frame_idx").alias("g"),
            (F.col("x.frame_idx") - F.col("y.frame_idx")).alias("k"),
        )
        .agg(F.sum(F.col("x.n") * F.col("y.n")).cast("long").alias("vol"))
        .collect()
    }
    total_vol = sum(vols.values())
    g, k = max((gk for gk in vols if gk[1] != 0), key=lambda gk: vols[gk])
    vol = vols[(g, k)]

    # execute the chosen class end-to-end: the operator's own
    # candidate join + Hamming verify, restricted to (g, k)
    # (multimodal.py video_near_pairs_shifted lines: a.frame_idx ==
    # b.frame_idx + k, band-bucket equality, a.id < b.id, fham <=
    # max_hamming, distinct) — the video-level best-shift rollup is a
    # downstream group-by over the tiny survivor set
    a = banded.filter(F.col("frame_idx") == g).alias("a")
    b = banded.filter(F.col("frame_idx") == g - k).alias("b")
    ham = None
    for t in range(4):
        term = F.bit_count(
            F.col(f"a.b{t}").bitwiseXOR(F.col(f"b.b{t}")).cast("long")
        )
        ham = term if ham is None else ham + term
    t0 = time.perf_counter()
    try:
        n_pairs = (
            a.join(b, on=["tbl", "bkey"])
            .filter(F.col("a.id") < F.col("b.id"))
            .select(
                F.col("a.id").alias("id_a"),
                F.col("b.id").alias("id_b"),
                ham.cast("long").alias("fham"),
            )
            .filter(F.col("fham") <= MAX_HAMMING)
            .distinct()
            .count()
        )
    finally:
        wall = round(time.perf_counter() - t0, 3)
        base.unpersist()
    ns_per_cand = wall / vol * 1e9

    row = {
        "n_hash_rows": n_hash_rows,
        "decode_sec": decode_sec,
        "n_candidates_sf10": total_vol,
        "executed_class": {"frame_class": g, "shift": k},
        "slice_volume": vol,
        "slice_wall_sec": wall,
        "slice_n_near_frame_pairs": n_pairs,
        "ns_per_candidate": round(ns_per_cand, 3),
        "extrapolated_full_join_sec": round(total_vol * ns_per_cand / 1e9, 1),
        "note": (
            "(frame_class, shift) shards partition the shifted join "
            "exactly; the LARGEST k != 0 class executed to completion "
            "single-node, so the volume-only row is now priced by a "
            "directly measured shifted-verify rate (a cluster runs "
            "the classes as independent jobs)"
        ),
    }
    path = os.path.join(REPO, "bench_scaling.json")
    with open(path) as fh:
        payload = json.load(fh)
    tier = payload.setdefault("sf10", {}).setdefault("queries", {})
    tier[f"media_{args.modality}_shifted_sliced"] = row
    with open(path, "w") as fh:
        json.dump(payload, fh, indent=1, sort_keys=True)
    print(json.dumps(row))
    spark.stop()


if __name__ == "__main__":
    main()
