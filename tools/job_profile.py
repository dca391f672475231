"""Job-count profiler (optimization r14, guide §1/§7): for each named
query, run it twice under the bench session config and report, per
phase (construction vs noop execution), the WALL and the NUMBER OF
SPARK JOBS the phase submitted (status-tracker job-id delta). A query
whose wall is dominated by `njobs x host per-job overhead` is
latency-bound, not data-bound — the optimization lever is fewer
actions/barriers, not shuffle bytes. Writes tools/job_profile.json.

Usage: python tools/job_profile.py q1 q2 ...
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402


def main(names: list[str]) -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("job_profile")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.sql.files.maxPartitionBytes", "16m")
        .config("spark.scheduler.mode", "FAIR")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()
    jsc = spark.sparkContext._jsc.sc()

    def _njobs() -> int:
        # total jobs submitted so far (status store job list)
        return jsc.statusStore().jobsList(None).size()

    out: dict[str, dict] = {}
    for name in names:
        fn = queries[name]
        rec: dict[str, float | int] = {}
        for tag in ("1", "2"):
            j0 = _njobs()
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            j1 = _njobs()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            j2 = _njobs()
            rec[f"build{tag}"] = round(t1 - t0, 3)
            rec[f"exec{tag}"] = round(t2 - t1, 3)
            rec[f"build{tag}_jobs"] = j1 - j0
            rec[f"exec{tag}_jobs"] = j2 - j1
        out[name] = rec
        spark.catalog.clearCache()
        print(name, json.dumps(rec), flush=True)

    with open(os.path.join(REPO, "tools", "job_profile.json"), "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
