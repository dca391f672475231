"""Probe: how wide do the victim operators' persisted frames
materialize with the cached-plan AQE flag on vs off, and what join
strategy consumes them? (optimization r15, §flag-victims)

Usage: TASK_PROFILE_CACHED_AQE=true|false python tools/cache_width_probe.py <query> ...
Prints, per query: wall, per-job (job id, #tasks) census, and for every
InMemoryTableScan in the executed plan the cached RDD partition count.
"""

from __future__ import annotations

import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.chdir(REPO)

from pyspark.sql import SparkSession  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402


def main(names: list[str]) -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    flag = os.environ.get("TASK_PROFILE_CACHED_AQE", "true")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("cache_width_probe")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config(
            "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", flag
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
    qs = entrymod.queries()
    st = spark.sparkContext.statusTracker()
    print(f"flag={flag} cpus={cpus}")
    for name in names:
        jvm_pre = set(st.getJobIdsForGroup(None) or [])
        spark.sparkContext.setJobGroup(name, name)
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        wall = time.time() - t0
        jobs = [j for j in (st.getJobIdsForGroup(name) or [])]
        census = []
        for j in sorted(jobs):
            info = st.getJobInfo(j)
            if info is None:
                continue
            ntasks = 0
            for s in info.stageIds:
                si = st.getStageInfo(s)
                if si is not None:
                    ntasks += si.numTasks
            census.append((j, ntasks))
        # cached widths: every live cached RDD's partition count
        jsc = spark.sparkContext._jsc.sc()
        cached = []
        it = jsc.getPersistentRDDs()
        # scala Map -> iterate via java iterator
        jit = it.iterator()
        while jit.hasNext():
            kv = jit.next()
            rdd = kv._2()
            cached.append((kv._1(), rdd.getNumPartitions(), rdd.name()))
        plan = df._jdf.queryExecution().executedPlan().toString()
        joins = re.findall(r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|BroadcastNestedLoopJoin|CartesianProduct)", plan)
        from collections import Counter
        print(f"{name}: wall={wall:.2f}s jobs={len(census)} "
              f"tasks={sum(t for _, t in census)}")
        print(f"  per-job tasks: {[t for _, t in census]}")
        print(f"  joins: {dict(Counter(joins))}")
        for rid, nparts, rname in cached:
            print(f"  cachedRDD id={rid} parts={nparts} name={rname!r}")
        spark.catalog.clearCache()
        spark.sparkContext.setJobGroup("", "")
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:] or ["semdedup"])
