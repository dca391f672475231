"""Interleaved same-code A/B: canChangeCachedPlanOutputPartitioning on vs off."""
import json, os, subprocess, sys, time

REPO="/root/repo"
def child(flag, names):
    sys.path.insert(0, REPO); os.chdir(REPO)
    from pyspark.sql import SparkSession
    import __spark_entry__ as entrymod
    sf_dir="/root/testdata/sf0.1"
    spark=(SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions","32")
        .config("spark.sql.adaptive.enabled","true")
        .config("spark.sql.adaptive.coalescePartitions.enabled","true")
        .config("spark.sql.adaptive.skewJoin.enabled","true")
        .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",flag)
        .config("spark.sql.session.timeZone","UTC")
        .config("spark.driver.memory","48g")
        .config("spark.sql.files.maxPartitionBytes","16m")
        .config("spark.scheduler.mode","FAIR")
        .config("spark.ui.enabled","false")
        .config("spark.ui.showConsoleProgress","false")
        .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    qs=entrymod.queries(); out={}
    for name in names:
        fn=qs[name]; walls=[]
        for _ in range(2):
            t0=time.perf_counter()
            fn(spark,sf_dir).write.format("noop").mode("overwrite").save()
            walls.append(round(time.perf_counter()-t0,3))
        out[name]=walls[1]
        spark.catalog.clearCache()
    print("CHILD_JSON:"+json.dumps(out),flush=True)
    spark.stop()

if __name__=="__main__":
    if sys.argv[1]=="--child":
        child(sys.argv[2], sys.argv[3:]); sys.exit()
    names=sys.argv[1:]
    res={n:{"false":[],"true":[]} for n in names}
    for p in range(2):
        for arm in ("false","true"):
            pr=subprocess.run([sys.executable,__file__,"--child",arm,*names],
                capture_output=True,text=True)
            line=[l for l in pr.stdout.splitlines() if l.startswith("CHILD_JSON:")]
            if not line:
                print(f"pass{p} {arm} FAILED {pr.stderr[-1500:]}"); continue
            d=json.loads(line[0][11:])
            for n,v in d.items(): res[n][arm].append(v)
            print(f"pass{p} {arm}: {d}",flush=True)
    for n in names:
        fo=min(res[n]["false"]); tr=min(res[n]["true"]); print(n, "flag_false", fo, "-> flag_true", tr)
    json.dump(res, open("/tmp/ab_flag.json","w"), indent=1)
