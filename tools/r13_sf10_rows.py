"""Round-13 second-decade rows (VERDICT r12 task 5 + the r13
addition): cold sf1 → cold sf10 for

- ``cross_modal_curation_raised``: the composition's explicit-budget
  escape hatch (the media_dhash_wide_raised discipline) — the default
  budget's sf10 guard trip is the DESIGNED refusal (measured 1.02e9
  within-survivor image candidates); this row executes the whole
  three-modality run to completion with max_pairs=4e9 so the refusal
  point has a measured completion wall behind it, like the image
  (685.5M/17.7 s) and audio (1.63e9/12.5 s) hatches.
- ``cross_modal_incremental``: the r13 addition's standing second
  decade (expected: guard trip at sf10 with the measured cross-set
  count — the media_incremental_dedup shape — recorded by the except
  branch).
"""

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
        .appName("eclipse_spark_r13_sf10")
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

    probes = {
        "cross_modal_curation_raised": lambda s, sf:
            entrymod.q_cross_modal_curation(s, sf, max_pairs=4_000_000_000),
        "cross_modal_incremental": qs["cross_modal_incremental"],
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
