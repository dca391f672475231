"""Per-job dump for one query (optimization r14, guide §1/§7): run the
query once under the bench session config, then list every Spark job it
submitted with wall duration and stage info — the direct evidence for
"this query is job-count-bound" and for which loop phase owns the jobs.

Usage: python tools/job_dump.py <query> [out.json]
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


def main(name: str, out_path: str | None) -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("job_dump")
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
    fn = entrymod.queries()[name]
    t0 = time.perf_counter()
    df = fn(spark, sf_dir)
    t1 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    t2 = time.perf_counter()

    store = spark.sparkContext._jsc.sc().statusStore()
    jobs = store.jobsList(None)
    rows = []
    for i in range(jobs.size()):
        j = jobs.apply(i)
        sub = j.submissionTime()
        comp = j.completionTime()
        dur = None
        if sub.isDefined() and comp.isDefined():
            dur = (comp.get().getTime() - sub.get().getTime()) / 1000.0
        rows.append(
            {
                "id": j.jobId(),
                "dur_s": dur,
                "n_tasks": j.numTasks(),
                "n_stages": j.stageIds().size(),
                "name": (j.name() or "")[:120],
            }
        )
    rows.sort(key=lambda r: r["id"])
    total = sum(r["dur_s"] or 0 for r in rows)
    summary = {
        "query": name,
        "build_s": round(t1 - t0, 3),
        "exec_s": round(t2 - t1, 3),
        "n_jobs": len(rows),
        "sum_job_dur_s": round(total, 3),
        "jobs": rows,
    }
    print(json.dumps({k: summary[k] for k in
                      ("query", "build_s", "exec_s", "n_jobs",
                       "sum_job_dur_s")}))
    for r in rows:
        print(f"  job {r['id']:4d}  {r['dur_s'] if r['dur_s'] is not None else -1:7.3f}s"
              f"  tasks={r['n_tasks']:4d} stages={r['n_stages']}  {r['name']}")
    if out_path:
        with open(out_path, "w") as fh:
            json.dump(summary, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2] if len(sys.argv) > 2 else None)
