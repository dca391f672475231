"""Optimization-round phase profiler (round 14): for each named query,
split the bench-visible wall time into its phases —

  build1:  fn(spark, sf_dir)       plan construction, incl. any eager
                                   jobs an operator runs (volume audits,
                                   localCheckpoints, whole composite
                                   bodies, streamed streams)
  exec1:   first noop write        the lazy remainder, cold
  build2/exec2: second full pass   the steady-state the bench's
                                   min-of-N actually reports

This is the "decide whether the time is construction or execution"
step of guide §1 measured per query, using the same session config as
bench.py so numbers line up. Writes tools/opt_phase.json.

Usage: python tools/opt_measure.py q1 q2 ...   (default: top suite)
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

DEFAULT = [
    "media_video_shifted", "ktruss", "media_audio_shifted",
    "stream_near_dedup", "apss_jaccard", "kcore",
    "cross_modal_incremental", "apss_cosine", "minhash_estimate",
    "media_curation_pipeline", "cc_star", "stream_video_dedup",
    "cross_modal_curation", "media_audio_pipeline",
    "media_video_near_dup", "triangle_count", "lineage_audit",
    "media_dhash_wide", "stream_audio_dedup", "lsh_s_curve",
]


def main(names: list[str]) -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("opt_measure")
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

    out: dict[str, dict] = {}
    for name in names:
        fn = queries[name]
        spark.sparkContext.setJobDescription(f"opt_measure:{name}")
        rec: dict[str, float] = {}
        for tag in ("1", "2"):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            rec[f"build{tag}"] = round(t1 - t0, 3)
            rec[f"exec{tag}"] = round(t2 - t1, 3)
        rec["total2"] = round(rec["build2"] + rec["exec2"], 3)
        out[name] = rec
        spark.catalog.clearCache()
        print(name, json.dumps(rec), flush=True)

    with open(os.path.join(REPO, "tools", "opt_phase.json"), "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:] or DEFAULT)
