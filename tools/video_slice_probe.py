"""Round-12 (VERDICT r11 task 3): an EXECUTED sf10 datapoint for the
video near-dup join, via the frame_idx shard the temporal alignment
already provides.

The full sf10 aligned join (6,994,454,908 candidates) is deliberately
not scheduled single-node; this probe runs the join's natural slices
instead. Because the bucket key is (frame_idx, tbl, bkey), filtering
the hash table to one frame class yields EXACTLY that class' share of
the candidate volume — the slices partition the join, so
sum(slice walls) at fixed per-candidate cost IS the full join's
verify cost, and a cluster runs the slices as independent jobs (the
sizing formula SCALE.md records).

Protocol: decode once (video_dhash_bands over the derived sf10 corpus
— linear, timed separately), persist the slim hash frame, then per
frame class: exact slice volume (audit query) + timed slice join
(min_frames=1 — a single class can contribute at most one aligned
frame per pair; this measures the join+verify kernel, the video-level
min_frames rollup is a downstream group-by whose input is the tiny
survivor set). Emits one JSON row merged into bench_scaling.json as
``media_video_near_dup_sliced``."""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from tools import scale_probe as sp  # noqa: E402
from eclipse_spark.operators import multimodal as mm  # noqa: E402


def main(classes: list[int]) -> None:
    big10 = os.path.join(REPO, "benchdata", "sf10")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("eclipse_spark_video_slice_probe")
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
    hs = mm.video_dhash_bands(sp._video_corpus(spark, big10)).persist()
    n_hash_rows = hs.count()
    decode_sec = round(time.perf_counter() - t0, 3)

    per_class = {
        int(r["frame_idx"]): int(r["vol"])
        for r in mm._video_banded(hs, 4)
        .groupBy("frame_idx", "tbl", "bkey")
        .agg(F.count("*").alias("_n"))
        .groupBy("frame_idx")
        .agg(
            F.sum(F.col("_n") * (F.col("_n") - 1) / 2)
            .cast("long")
            .alias("vol")
        )
        .collect()
    }
    total_vol = sum(per_class.values())

    slices = {}
    for g in classes:
        vol = per_class.get(g, 0)
        if vol == 0:
            print(f"frame class {g}: zero candidate volume in corpus, skipped")
            continue
        sl = hs.filter(F.col("frame_idx") == g)
        t0 = time.perf_counter()
        out = mm.video_near_pairs(
            sl, max_hamming=3, min_frames=1, max_pairs=None
        )
        n_pairs = out.count()
        wall = round(time.perf_counter() - t0, 3)
        slices[str(g)] = {
            "volume": vol,
            "wall_sec": wall,
            "n_near_pairs": n_pairs,
            "ns_per_candidate": round(wall / vol * 1e9, 3),
        }
    hs.unpersist()

    meas_vol = sum(s["volume"] for s in slices.values())
    meas_wall = sum(s["wall_sec"] for s in slices.values())
    if meas_vol == 0:
        print("no slice with non-zero volume ran; nothing to record")
        spark.stop()
        return
    ns_per_cand = meas_wall / meas_vol * 1e9
    row = {
        "n_hash_rows": n_hash_rows,
        "decode_sec": decode_sec,
        "per_class_volume": {str(k): v for k, v in sorted(per_class.items())},
        "n_candidates_sf10": total_vol,
        "slices": slices,
        "ns_per_candidate": round(ns_per_cand, 3),
        "extrapolated_full_join_sec": round(total_vol * ns_per_cand / 1e9, 1),
        "note": (
            "frame_idx shards partition the aligned join exactly; "
            "slices ran to completion single-node and the full-join "
            "estimate is decode_sec + sum over classes of "
            "volume * ns_per_candidate (cluster runs classes as "
            "independent jobs)"
        ),
    }
    path = os.path.join(REPO, "bench_scaling.json")
    with open(path) as fh:
        payload = json.load(fh)
    tier = payload.setdefault("sf10", {}).setdefault("queries", {})
    prior = tier.get("media_video_near_dup_sliced")
    if prior and prior.get("slices"):
        # merge: keep previously-executed classes, recompute aggregates
        merged = {**prior["slices"], **row["slices"]}
        row["slices"] = merged
        meas_vol = sum(s["volume"] for s in merged.values())
        meas_wall = sum(s["wall_sec"] for s in merged.values())
        ns = meas_wall / meas_vol * 1e9
        row["ns_per_candidate"] = round(ns, 3)
        row["extrapolated_full_join_sec"] = round(
            row["n_candidates_sf10"] * ns / 1e9, 1
        )
    tier["media_video_near_dup_sliced"] = row
    with open(path, "w") as fh:
        json.dump(payload, fh, indent=1, sort_keys=True)
    print(json.dumps(row))
    spark.stop()


if __name__ == "__main__":
    main([int(a) for a in sys.argv[1:]] or [5, 3])
