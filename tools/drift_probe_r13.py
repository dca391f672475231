"""Round-13 drift diagnosis (VERDICT r12 tasks 1-3): isolated
fresh-process re-measure of the two weak marks the r12 driver re-run
flagged (`tpch_q9` 0.73 -> 1.10/1.10 s, the only unresolved
drift_vs_prev flag; `frequent_pairs` 2.02 -> 6.60/6.46 s, consistent
across both timed runs) and the eight remaining non-stable
regressions, with deterministic WORK COUNTERS alongside the walls for
the two headliners — the probe_one protocol that closed
triangle_count/clustering_coeff/many_job@64. Bench-identical session
config; warm run then three timed runs per query; run the script
twice at different loadavg regimes and quote both spreads."""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession, functions as F  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402

PROBES = [
    "tpch_q9",
    "frequent_pairs",
    "interpolate",
    "chi_square",
    "er_resolve",
    "activity_islands",
    "fuzzy_join",
    "ks_drift",
    "media_meta",
    "new_vs_returning",
    "rfm_segments",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("eclipse_spark_drift_probe_r13")
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
    qs = entrymod.queries()
    out: dict[str, object] = {"loadavg": os.getloadavg()[0]}
    for name in PROBES:
        fn = qs[name]
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            walls.append(round(time.perf_counter() - t0, 3))
        out[name] = walls
        spark.catalog.clearCache()
    # deterministic work counters at the bench SF:
    # tpch_q9 — result cardinality + the exact profit checksum (any
    # data/layout change that alters the work alters this first)
    q9 = qs["tpch_q9"](spark, sf_dir)
    r = q9.agg(
        F.count("*").alias("rows"),
        F.sum("profit").cast("double").alias("chk"),
    ).collect()[0]
    out["tpch_q9_work_sf0.1"] = {
        "rows": int(r["rows"]), "profit_checksum": round(float(r["chk"]), 2)
    }
    # frequent_pairs — result cardinality + total pair-support mass
    fp = qs["frequent_pairs"](spark, sf_dir)
    r = fp.agg(
        F.count("*").alias("rows"),
        F.sum("support").cast("long").alias("mass"),
    ).collect()[0]
    out["frequent_pairs_work_sf0.1"] = {
        "rows": int(r["rows"]), "support_mass": int(r["mass"] or 0)
    }
    # host-state references (the r13 lesson: latency-bound queries
    # move with PER-JOB overhead, so record it every probe run —
    # media_meta's 0.114 s total in the r12 closing bench bounds that
    # run's per-job cost below 114 ms; compare against these):
    for _ in range(5):
        spark.range(32).count()
    scan = []
    for _ in range(20):
        t0 = time.perf_counter()
        spark.range(32).count()
        scan.append((time.perf_counter() - t0) * 1000)
    shuf = []
    for _ in range(20):
        t0 = time.perf_counter()
        spark.range(32).repartition(32).count()
        shuf.append((time.perf_counter() - t0) * 1000)
    scan.sort(), shuf.sort()
    t0 = time.perf_counter()
    s = 0
    for i in range(20_000_000):
        s += i * i
    out["host_reference"] = {
        "empty_scan_job_ms_median": round(scan[10], 1),
        "empty_shuffle_job_ms_median": round(shuf[10], 1),
        "pyloop20m_sec": round(time.perf_counter() - t0, 3),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
