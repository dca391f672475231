"""Adjacent same-host A/B for the r14 fan-out change: run the media
family once with `_fan_out` stubbed to identity (the pre-change
single-partition shape) and once real, each in a FRESH process with the
bench session config, interleaved A,B,A,B so a host-regime drift hits
both arms equally. Prints per-query min-of-2 walls for each arm.

Usage: python tools/ab_fanout.py            (driver)
       python tools/ab_fanout.py --arm off|on q1 q2 ...   (child)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

QUERIES = [
    "media_dhash", "media_dhash_wide", "media_video_near_dup",
    "media_video_shifted", "media_audio_pipeline", "media_audio_shifted",
    "media_curation_pipeline", "media_incremental_dedup",
    "media_audio_fingerprint", "cross_modal_curation",
    "cross_modal_incremental", "stream_near_dedup",
    "stream_audio_dedup", "stream_video_dedup",
]


def child(arm: str, names: list[str]) -> None:
    from pyspark.sql import SparkSession

    from eclipse_spark.operators import multimodal as mm

    if arm == "off":
        mm._fan_out = lambda df, weight="heavy": df  # pre-change shape

    import __spark_entry__ as entrymod

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"ab_fanout_{arm}")
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
    out = {}
    for name in names:
        walls = []
        for _ in range(2):
            t0 = time.perf_counter()
            df = queries[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            walls.append(round(time.perf_counter() - t0, 3))
        out[name] = min(walls)
        spark.catalog.clearCache()
    print("RESULT " + json.dumps(out), flush=True)
    spark.stop()


def run_arm(arm: str, names: list[str]) -> dict:
    p = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--arm", arm] + names,
        capture_output=True, text=True, cwd=REPO,
    )
    for line in p.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    print(p.stdout[-2000:], p.stderr[-2000:])
    raise RuntimeError(f"arm {arm} failed")


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--arm":
        child(sys.argv[2], sys.argv[3:])
        return
    names = sys.argv[1:] or QUERIES
    rounds = []
    for i in range(2):  # A,B,A,B interleave
        for arm in ("off", "on"):
            t0 = time.time()
            res = run_arm(arm, names)
            rounds.append((arm, res))
            print(f"pass{i} arm={arm} suite={round(sum(res.values()), 1)}s "
                  f"({round(time.time() - t0)}s incl boot)", flush=True)
    best: dict[str, dict[str, float]] = {}
    for arm, res in rounds:
        for k, v in res.items():
            d = best.setdefault(k, {})
            d[arm] = min(d.get(arm, 1e9), v)
    print(f"{'query':28s} {'off':>7s} {'on':>7s}  ratio")
    tot_off = tot_on = 0.0
    for k in names:
        off, on = best[k]["off"], best[k]["on"]
        tot_off += off
        tot_on += on
        print(f"{k:28s} {off:7.2f} {on:7.2f}  {on / off:5.2f}")
    print(f"{'TOTAL':28s} {tot_off:7.2f} {tot_on:7.2f}  "
          f"{tot_on / tot_off:5.2f}")
    with open(os.path.join(REPO, "tools", "ab_fanout.json"), "w") as fh:
        json.dump({k: best[k] for k in names}, fh, indent=1, sort_keys=True)


if __name__ == "__main__":
    main()
