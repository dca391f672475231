"""Run ONE scale-probe row and merge it into bench_scaling.json —
for adding a row to the standing artifact without re-paying the full
~90-minute probe (the full run remains the authority whenever the
registry changes shape; this runner reuses scale_probe's own probe
functions, session config, and single-cold-run deep-tier protocol so
the merged row is protocol-identical).

Usage: python tools/probe_one.py <name> [first]
where <name> is a probe entry known to tools/scale_probe.py. With
``first`` the row measures the FIRST decade (sf0.1 -> benchdata/sf1,
merged into the top-level queries map, cold single runs + work
counts at both scales); otherwise the second decade
(sf1 -> benchdata/sf10, merged into the sf10 tier).
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
from tools import scale_probe as sp  # noqa: E402


def main(name: str, tier: str = "sf10") -> None:
    small = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    big = os.path.join(REPO, "benchdata", "sf1")
    big10 = os.path.join(REPO, "benchdata", "sf10")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("eclipse_spark_probe_one")
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
    if name == "media_audio_fingerprint_raised":
        fn = sp._audio_fp_raised_probe
    elif name == "media_dhash_wide_raised":
        fn = sp._dhash_wide_raised_probe
    else:
        fn = sp.PROBE_FN_OVERRIDES.get(name) or entrymod.queries()[name]

    def cold(sf_dir: str) -> float:
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        spark.catalog.clearCache()
        return wall

    path = os.path.join(REPO, "bench_scaling.json")
    with open(path) as fh:
        payload = json.load(fh)
    if tier == "first":
        t0, t1 = cold(small), cold(big)
        row = {
            "sf0.1_sec": round(t0, 3),
            "sf1_sec": round(t1, 3),
            "ratio": round(t1 / t0 if t0 > 0 else float("inf"), 2),
            "runs": 1,
        }
        if name in sp.WORK_COUNTS:
            wc = sp.WORK_COUNTS[name]
            n0, n1 = wc(spark, small), wc(spark, big)
            row["n_candidates_sf0.1"] = n0
            row["n_candidates_sf1"] = n1
            row["work_ratio"] = round(n1 / n0 if n0 else float("inf"), 2)
        payload["queries"][name] = row
    else:
        t1 = cold(big)
        try:
            t10 = cold(big10)
            row = {
                "sf1_sec": round(t1, 3),
                "sf10_sec": round(t10, 3),
                "ratio": round(t10 / t1 if t1 > 0 else float("inf"), 2),
                "runs": 1,
            }
        except Exception as exc:
            # designed guard trips are recorded rows, not crashes —
            # the deep-tier protocol's except branch
            row = {
                "sf1_sec": round(t1, 3),
                "sf10_sec": None,
                "guarded": str(exc)[:300],
            }
        if name in sp.WORK_COUNTS:
            row["n_candidates_sf10"] = sp.WORK_COUNTS[name](spark, big10)
        payload.setdefault("sf10", {}).setdefault("queries", {})[name] = row
    with open(path, "w") as fh:
        json.dump(payload, fh, indent=1, sort_keys=True)
    print(json.dumps({name: row}))
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2] if len(sys.argv) > 2 else "sf10")
