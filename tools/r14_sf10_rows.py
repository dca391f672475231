"""Round-14 second-decade rows (VERDICT r13 tasks 2 + 3): cold sf1 →
cold sf10 raised-budget completions for the two guard trips that still
lacked executed levers —

- ``media_index_refresh_raised``: the batch media refresh pair
  guard-trips at sf10 with a measured 772.8M candidates (HALF the
  already-executed audio hatch's 1.63e9); this row runs the full
  stored-index refresh — index build + new-batch hash + index join —
  to completion with an explicit raised budget, so the batch number a
  batch-pipeline operator would quote exists next to the streaming
  face's 89.0 s completion.
- ``cross_modal_incremental_raised``: the three-modality incremental
  refresh guard-trips at a measured 953M total cross-set candidates;
  this row executes the whole composition (shared gated prefix under
  one semcache + three modality new x ref joins) at max_pairs=4e9,
  mirroring ``cross_modal_curation_raised``.

Each row records the default-budget guard trip alongside (the DESIGNED
refusal stands as admission control; the hatch prices it)."""

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

RAISED = 4_000_000_000


def main() -> None:
    big = os.path.join(REPO, "benchdata", "sf1")
    big10 = os.path.join(REPO, "benchdata", "sf10")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("eclipse_spark_r14_sf10")
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
    path = os.path.join(REPO, "bench_scaling.json")
    with open(path) as fh:
        payload = json.load(fh)
    tier = payload.setdefault("sf10", {}).setdefault("queries", {})

    probes = {
        "media_index_refresh_raised": lambda s, sf:
            entrymod.q_media_index_refresh(s, sf, max_pairs=RAISED),
        "cross_modal_incremental_raised": lambda s, sf:
            entrymod.q_cross_modal_incremental(s, sf, max_pairs=RAISED),
    }

    def cold(fn, sf_dir):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        wall = round(time.perf_counter() - t0, 3)
        spark.catalog.clearCache()
        return wall

    for name, fn in probes.items():
        t1 = cold(fn, big)
        try:
            t10 = cold(fn, big10)
            tier[name] = {
                "sf1_sec": t1,
                "sf10_sec": t10,
                "ratio": round(t10 / t1 if t1 > 0 else float("inf"), 2),
                "runs": 1,
                "max_pairs": RAISED,
            }
            print(f"{name}: {t1:.2f} -> {t10:.2f} "
                  f"ratio {tier[name]['ratio']}", flush=True)
        except Exception as exc:
            tier[name] = {
                "sf1_sec": t1,
                "sf10_sec": None,
                "guarded": str(exc)[:300],
                "max_pairs": RAISED,
            }
            print(f"{name}: GUARDED — {str(exc)[:150]}", flush=True)
        spark.catalog.clearCache()
    with open(path, "w") as fh:
        json.dump(payload, fh, indent=1, sort_keys=True)
    spark.stop()


if __name__ == "__main__":
    main()
