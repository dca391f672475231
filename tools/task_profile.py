"""Suite-wide task/stage/job census (optimization r15, guide §1/§2.2).

The r14 driver ground truth showed NEGATIVE scaling (8 cores beat 32:
177.8 s vs 236.9 s for the same suite), which means the suite is
dominated by fixed per-job/per-task orchestration, not compute. This
probe quantifies exactly that: for every headline query it runs the
bench's warm+timed shape once and records, from the status store,

  jobs:    submitted job count
  stages:  completed stage count
  tasks:   total task count across those stages

so the suite-wide totals (sum of tasks x per-task launch cost, sum of
jobs x per-job latency) can be compared against the wall. Also probes
the per-job latency as a function of task count (1/8/32/128 tasks on
local[32]) and whether AQE actually coalesces a tiny groupBy under the
bench session config.

Usage: python tools/task_profile.py [query ...]   (default: full HEADLINE)
Writes tools/task_profile.json.
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
import bench  # noqa: E402


def main(names: list[str]) -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("task_profile")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # mirror the r15 bench/session config (AQE on cached plans)
        .config(
            "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
            os.environ.get("TASK_PROFILE_CACHED_AQE", "true"),
        )
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

    tracker = spark.sparkContext.statusTracker()

    def njobs_now() -> int:
        return jsc.statusStore().jobsList(None).size()

    def span_counts(j0_ids: set[int]) -> tuple[int, int, int]:
        """jobs/stages/tasks submitted since the captured job-id set."""
        jobs = jsc.statusStore().jobsList(None)
        it = jobs.iterator()
        new_jobs = []
        while it.hasNext():
            j = it.next()
            if j.jobId() not in j0_ids:
                new_jobs.append(j.jobId())
        nstages = 0
        ntasks = 0
        seen: set[int] = set()
        for jid in new_jobs:
            info = tracker.getJobInfo(jid)
            if info is None:
                continue
            for sid in info.stageIds:
                if sid in seen:
                    continue
                seen.add(sid)
                si = tracker.getStageInfo(sid)
                if si is not None:
                    nstages += 1
                    ntasks += si.numTasks
        return len(new_jobs), nstages, ntasks

    def job_ids_now() -> set[int]:
        jobs = jsc.statusStore().jobsList(None)
        it = jobs.iterator()
        out = set()
        while it.hasNext():
            out.add(it.next().jobId())
        return out

    out: dict[str, dict] = {}

    # --- per-job latency vs task count --------------------------------
    lat: dict[str, float] = {}
    for ntask in (1, 8, 32, 128):
        for _ in range(3):
            spark.range(ntask).repartition(ntask).count()
        runs = []
        for _ in range(15):
            t0 = time.perf_counter()
            spark.range(ntask).repartition(ntask).count()
            runs.append((time.perf_counter() - t0) * 1000)
        runs.sort()
        lat[str(ntask)] = round(runs[7], 1)
    out["_job_latency_ms_by_taskcount"] = lat

    # --- does AQE coalesce a tiny groupBy? ----------------------------
    df = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    agg = df.groupBy("o_custkey").count()
    agg.write.format("noop").mode("overwrite").save()
    ids0 = job_ids_now()
    agg.write.format("noop").mode("overwrite").save()
    j, s, tk = span_counts(ids0)
    out["_tiny_groupby"] = {"jobs": j, "stages": s, "tasks": tk}

    # --- per-query censuses -------------------------------------------
    for name in names:
        fn = queries[name]
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        except Exception as exc:
            out[name] = {"error": repr(exc)}
            continue
        spark.catalog.clearCache()
        ids0 = job_ids_now()
        w0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - w0
        j, s, tk = span_counts(ids0)
        out[name] = {
            "wall": round(wall, 3),
            "jobs": j,
            "stages": s,
            "tasks": tk,
        }
        spark.catalog.clearCache()
        print(name, json.dumps(out[name]), flush=True)

    tot_j = sum(v.get("jobs", 0) for v in out.values() if isinstance(v, dict))
    tot_t = sum(v.get("tasks", 0) for v in out.values() if isinstance(v, dict))
    tot_w = sum(v.get("wall", 0) for v in out.values() if isinstance(v, dict))
    out["_totals"] = {"jobs": tot_j, "tasks": tot_t, "wall": round(tot_w, 1)}
    with open(os.path.join(REPO, "tools", "task_profile.json"), "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print(json.dumps(out["_totals"]))
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:] or list(bench.HEADLINE))
