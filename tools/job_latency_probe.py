"""Decompose the ~140 ms per-job fixed cost (optimization r15).

The task census showed per-job latency nearly independent of task
count (1 task: 140 ms, 32 tasks: 142 ms) — so the suite wall at sf0.1
is ~= job_count x per_job_cost. This probe isolates what the per-job
cost is made of:

  same_plan:   spark.range(1).count() in a loop — pure job scheduling
               (plan analysis cached? no — count() re-executes the
               same logical plan; catalyst re-runs but codegen cache
               hits)
  fresh_plan:  spark.range(1 + i).count() — + catalyst on a new plan
  rdd_job:     sc.parallelize([1]).count() — DAGScheduler only, no SQL
  noop_write:  range(1).write noop — the bench's action shape
  agg_job:     range(100).groupBy().sum() — one exchange (AQE stage)

each median-of-15, under the bench session config; then the same with
scheduler.mode=FIFO and with AQE off, in fresh processes.

Usage: python tools/job_latency_probe.py [variant]
  variant in {fair (default), fifo, noaqe}
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(variant: str) -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from pyspark.sql import SparkSession

    b = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"job_latency_{variant}")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled",
                "false" if variant == "noaqe" else "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config(
            "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
            "true",
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.sql.files.maxPartitionBytes", "16m")
        .config("spark.scheduler.mode",
                "FIFO" if variant == "fifo" else "FAIR")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    def med(fn, n=15):
        walls = []
        for i in range(n):
            t0 = time.perf_counter()
            fn(i)
            walls.append((time.perf_counter() - t0) * 1000)
        return round(statistics.median(walls), 1)

    # warm the JVM/codegen paths
    for _ in range(3):
        spark.range(1).count()
        sc.parallelize([1]).count()

    out = {"variant": variant, "cpus": cpus}
    out["rdd_job"] = med(lambda i: sc.parallelize([1]).count())
    df_same = spark.range(1)
    out["same_df_count"] = med(lambda i: df_same.count())
    out["fresh_plan_count"] = med(lambda i: spark.range(1 + i).count())
    out["noop_write"] = med(
        lambda i: spark.range(1 + i)
        .write.format("noop").mode("overwrite").save()
    )
    out["agg_1exchange"] = med(
        lambda i: spark.range(100 + i).groupBy().sum("id").collect()
    )
    out["agg_groupby_key"] = med(
        lambda i: spark.range(100 + i).groupBy("id").count().collect()
    )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "fair")
