"""Driver-style single-query oracle check: python tools/check_one.py
<name> [<name> ...] [--sf SF_DIR] — runs the registry query on Spark and its oracle on
DuckDB at sf0.01 (default), canonicalizes both frames (columns sorted
by name, floats to 6 digits, NULL -> ""), and diffs."""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.chdir(REPO)

import duckdb  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402


def canon(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if "float" in str(df[c].dtype):
            df[c] = df[c].round(6)
        df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main(names, sf="/root/testdata/sf0.01"):
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        # r15: mirror the engine/bench session (AQE on cached plans)
        # so the oracle check runs the shipped physical plans
        .config(
            "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
            "true",
        )
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    rc = 0
    for name in names:
        s = canon(qs[name](spark, sf).toPandas())
        if name not in osql:
            print(f"{name}: rows-only (no oracle) spark_rows={len(s)}")
            continue
        d = canon(con.sql(osql[name]).df())
        ok = list(s.columns) == list(d.columns) and len(s) == len(d) and s.equals(d)
        print(f"{name}: spark={len(s)} oracle={len(d)} "
              f"{'MATCH' if ok else 'MISMATCH'}")
        if not ok:
            rc = 1
            print("spark cols:", list(s.columns))
            print("oracle cols:", list(d.columns))
            both = s.merge(d, how="outer", indicator=True)
            diff = both[both["_merge"] != "both"]
            print(diff.head(20).to_string())
    spark.stop()
    sys.exit(rc)


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser(
        description="Oracle-check one or more registry queries."
    )
    ap.add_argument("names", nargs="+", help="registry query names")
    ap.add_argument("--sf", default="/root/testdata/sf0.01",
                    help="scale-factor directory of parquet tables")
    ns = ap.parse_args()
    main(ns.names, ns.sf)
