"""Adjacent same-host A/B between two git commits (optimization r14):
arm A = a worktree checked out at the BEFORE commit, arm B = this repo
(HEAD). Each pass runs every query twice in a fresh process per arm
(bench session config, warm+timed like the bench), interleaved
A,B,A,B so host-regime drift hits both arms equally; reports per-query
min across passes of the warm (second) build+exec wall.

Usage: python tools/ab_commits.py <before_commit> q1 q2 ...
       python tools/ab_commits.py --child <repo_dir> q1 q2 ...
Writes tools/ab_commits.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def child(repo_dir: str, names: list[str]) -> None:
    sys.path.insert(0, repo_dir)
    os.chdir(repo_dir)
    import time

    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("ab_commits")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # r15: mirror the shipped bench/session config (cached-plan AQE)
        .config(
            "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
            "true",
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
    out = {}
    for name in names:
        fn = queries[name]
        walls = []
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            walls.append(round(time.perf_counter() - t0, 3))
        out[name] = walls[1]  # warm pass
        spark.catalog.clearCache()
    print("CHILD_JSON:" + json.dumps(out), flush=True)
    spark.stop()


def main() -> None:
    if sys.argv[1] == "--child":
        child(sys.argv[2], sys.argv[3:])
        return
    before = sys.argv[1]
    names = sys.argv[2:]
    wt = "/tmp/ab_before_wt"
    if not os.path.isdir(wt):
        subprocess.run(["git", "worktree", "add", "--detach", wt, before],
                       cwd=REPO, check=True)
    results: dict[str, dict[str, list[float]]] = {
        n: {"before": [], "after": []} for n in names
    }
    for pass_i in range(2):
        for arm, repo_dir in (("before", wt), ("after", REPO)):
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child",
                 repo_dir, *names],
                capture_output=True, text=True, env=os.environ,
            )
            line = [ln for ln in p.stdout.splitlines()
                    if ln.startswith("CHILD_JSON:")]
            if not line:
                print(f"pass {pass_i} arm {arm} FAILED:\n{p.stdout[-2000:]}"
                      f"\n{p.stderr[-2000:]}", file=sys.stderr)
                continue
            d = json.loads(line[0][len("CHILD_JSON:"):])
            for n, v in d.items():
                results[n][arm].append(v)
            print(f"pass {pass_i} {arm}: {d}", flush=True)
    summary = {
        n: {
            "before_min": min(v["before"]) if v["before"] else None,
            "after_min": min(v["after"]) if v["after"] else None,
            "before_runs": v["before"],
            "after_runs": v["after"],
        }
        for n, v in results.items()
    }
    with open(os.path.join(REPO, "tools", "ab_commits.json"), "w") as fh:
        json.dump(summary, fh, indent=1, sort_keys=True)
    for n, s in summary.items():
        print(f"{n}: before {s['before_min']} -> after {s['after_min']}")


if __name__ == "__main__":
    main()
