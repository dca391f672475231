"""Isolated many-job throughput probe (VERDICT r10 task 1).

bench.py measures the 1/4/16/64-concurrent word-count sweep AFTER the
full 156-query headline suite in the SAME JVM; round 10's 64-job point
regressed 8.70 s -> 14.39 s (repeat-run consistent) with single-job
word_count simultaneously getting FASTER, so the suspect is suite-state
contamination (accumulated JVM/GC/codegen-cache state, FAIR-pool
metadata from ~470 prior jobs) or plain host load — not the scheduler
path itself. This tool answers that question the only clean way: a
FRESH process that runs NOTHING but the sweep, with the exact bench.py
session config, so its numbers are the scheduler's own cost.

Protocol: one untimed warm word-count (codegen + parquet footers),
then for N in 1, 4, 16, 64: `runs` timed submissions of N identical
word-count jobs via eclipse_spark.session.run_concurrent (one FAIR
pool per thread — the reference's multi-client admission analogue,
BASELINE.md row 4). Prints one JSON line; bench.py's numbers can then
be read as "sweep cost + suite contamination" against this baseline.

Run: python tools/many_job_probe.py [runs_per_point]
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
from eclipse_spark.session import run_concurrent  # noqa: E402


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("eclipse_spark_many_job_probe")
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
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    wc = entrymod.queries()["word_count"]

    def _one_job() -> None:
        wc(spark, sf_dir).write.format("noop").mode("overwrite").save()

    _one_job()  # warm
    sweep: dict[str, dict] = {}
    for n in (1, 4, 16, 64):
        times: list[float] = []
        for _ in range(runs):
            t0 = time.perf_counter()
            run_concurrent(spark, [_one_job] * n)
            times.append(round(time.perf_counter() - t0, 3))
        sweep[str(n)] = {"min": min(times), "runs": times}
        print(f"n={n}: min {min(times):.2f}s  runs {times}", flush=True)
    print(json.dumps({"isolated_many_job": sweep, "sf_dir": sf_dir,
                      "cpus": cpus}))
    spark.stop()


if __name__ == "__main__":
    main()
