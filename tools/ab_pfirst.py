"""Interleaved same-code A/B: spark.sql.adaptive.coalescePartitions.
parallelismFirst true (default) vs false (size-derived post-shuffle
partitioning, AQE targets the 64 MB advisory). Optimization r15,
VERDICT item 1 (negative scaling: near-empty post-shuffle tasks scale
with the core count under parallelismFirst=true)."""
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def child(pfirst, names):
    sys.path.insert(0, REPO)
    os.chdir(REPO)
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
                pfirst)
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
                "true")
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
    qs = entrymod.queries()
    out = {}
    for name in names:
        fn = qs[name]
        walls = []
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            walls.append(round(time.perf_counter() - t0, 3))
        out[name] = walls[1]
        spark.catalog.clearCache()
    print("CHILD_JSON:" + json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    if sys.argv[1] == "--child":
        child(sys.argv[2], sys.argv[3:])
        sys.exit()
    names = sys.argv[1:]
    res = {n: {"true": [], "false": []} for n in names}
    for p in range(2):
        for arm in ("true", "false"):
            pr = subprocess.run(
                [sys.executable, __file__, "--child", arm, *names],
                capture_output=True, text=True,
            )
            line = [l for l in pr.stdout.splitlines()
                    if l.startswith("CHILD_JSON:")]
            if not line:
                print(f"pass{p} pfirst={arm} FAILED {pr.stderr[-1500:]}")
                continue
            d = json.loads(line[0][11:])
            for n, v in d.items():
                res[n][arm].append(v)
            print(f"pass{p} pfirst={arm}: {d}", flush=True)
    for n in names:
        a = min(res[n]["true"]) if res[n]["true"] else None
        b = min(res[n]["false"]) if res[n]["false"] else None
        print(n, "pfirst_true", a, "-> pfirst_false", b)
    json.dump(res, open(os.path.join(REPO, "tools", "ab_pfirst.json"), "w"),
              indent=1)
