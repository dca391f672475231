"""Round-12 drift diagnosis: isolated fresh-process re-measure of the
three queries the r11 driver bench flagged (`bench_full.json`
drift_vs_prev: triangle_count 2.89 -> 6.80/8.57 s; non-stable:
chunking 0.267 -> 0.475, rolling_corr 0.396 -> 0.886), with the
triangle WORK COUNTER alongside the walls — the probe_one protocol
that closed many_job@64 and clustering_coeff. Bench-identical session
config; warm run then three timed runs per query."""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("eclipse_spark_drift_probe")
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
    for name in ["triangle_count", "chunking", "rolling_corr"]:
        fn = qs[name]
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            walls.append(round(time.perf_counter() - t0, 3))
        out[name] = walls
        spark.catalog.clearCache()
    # deterministic triangle work counter at the bench SF: the exact
    # (n_nodes, n_edges, n_triangles) row of the graph the query builds
    row = qs["triangle_count"](spark, sf_dir).collect()[0]
    out["triangle_work_sf0.1"] = {
        k: int(row[k] or 0) for k in ("n_nodes", "n_edges", "n_triangles")
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
