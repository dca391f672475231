"""Round-12 second-decade rows for the round's additions: cold sf1 →
cold sf10 for the two streaming dedups (expected scan-linear; state
bounded by keyspace), and the cross-modality curation run, whose sf10
outcome is a DESIGNED guard trip (the survivor-subset banded joins
cross the default 20M budget in the second decade) — recorded with
the raised message, the deep-tier protocol."""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.chdir(REPO)

from pyspark.sql import SparkSession  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402


def main() -> None:
    big = os.path.join(REPO, "benchdata", "sf1")
    big10 = os.path.join(REPO, "benchdata", "sf10")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("eclipse_spark_r12_sf10")
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
    qs = entrymod.queries()
    path = os.path.join(REPO, "bench_scaling.json")
    with open(path) as fh:
        payload = json.load(fh)
    tier = payload.setdefault("sf10", {}).setdefault("queries", {})

    def cold(name, sf_dir):
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        wall = round(time.perf_counter() - t0, 3)
        spark.catalog.clearCache()
        return wall

    for name in ["stream_audio_dedup", "stream_video_dedup",
                 "cross_modal_curation"]:
        t1 = cold(name, big)
        try:
            t10 = cold(name, big10)
            tier[name] = {
                "sf1_sec": t1,
                "sf10_sec": t10,
                "ratio": round(t10 / t1 if t1 > 0 else float("inf"), 2),
                "runs": 1,
            }
            print(f"{name}: {t1:.2f} -> {t10:.2f} "
                  f"ratio {tier[name]['ratio']}", flush=True)
        except Exception as exc:
            tier[name] = {
                "sf1_sec": t1,
                "sf10_sec": None,
                "guarded": str(exc)[:300],
            }
            print(f"{name}: GUARDED — {str(exc)[:150]}", flush=True)
        spark.catalog.clearCache()
    with open(path, "w") as fh:
        json.dump(payload, fh, indent=1, sort_keys=True)
    spark.stop()


if __name__ == "__main__":
    main()
