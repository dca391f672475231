"""Catalog (mrput/mrcat/mrls/mrrm/Owrite analogues, SURVEY §2.1)."""

from __future__ import annotations

from eclipse_spark.storage import Catalog, load_tables


def test_put_get_ls_rm(spark, sf_smoke, tmp_path):
    cat = Catalog(spark, str(tmp_path))
    df = spark.read.parquet(f"{sf_smoke}/region.parquet")
    cat.put("region", df)
    assert cat.ls() == ["region"]
    assert cat.get("region").count() == df.count()
    assert cat.rm("region") is True
    assert cat.ls() == []
    assert cat.rm("region") is False


def test_write_appends(spark, sf_smoke, tmp_path):
    cat = Catalog(spark, str(tmp_path))
    df = spark.read.parquet(f"{sf_smoke}/region.parquet")
    cat.put("t", df)
    n = df.count()
    cat.write("t", df)  # Owrite-append
    assert cat.get("t").count() == 2 * n


def test_version_bumps(spark, sf_smoke, tmp_path):
    cat = Catalog(spark, str(tmp_path))
    df = spark.read.parquet(f"{sf_smoke}/region.parquet")
    cat.put("t", df)
    v1 = cat.info("t").version
    cat.write("t", df)
    assert cat.info("t").version == v1 + 1


def test_load_tables(spark, sf_smoke):
    t = load_tables(spark, sf_smoke, ["region", "nation"])
    assert set(t) == {"region", "nation"}


def test_compact_and_sorted_layout(spark, tmp_path):
    import pyspark.sql.functions as F

    cat = Catalog(spark, str(tmp_path / "cat2"))
    df = spark.range(0, 1000).withColumnRenamed("id", "k")
    cat.put("t", df.repartition(16))
    assert cat.get("t").rdd.getNumPartitions() >= 8
    cat.compact("t", 2)
    assert cat.get("t").rdd.getNumPartitions() <= 2
    assert cat.get("t").count() == 1000

    cat.put_sorted("t_sorted", df, sort_by=["k"], partitions=4)
    got = cat.get("t_sorted")
    assert got.count() == 1000
    # range-partitioned + sorted: every file holds one contiguous range
    part = got.withColumn("_p", F.spark_partition_id()).groupBy("_p").agg(
        (F.max("k") - F.min("k") + 1 == F.count("*")).alias("contig")
    )
    assert all(r["contig"] for r in part.collect())


def test_merge_upsert_and_delete(spark, tmp_path):
    import pyspark.sql.functions as F

    cat = Catalog(spark, str(tmp_path / "cat3"))
    base = spark.range(0, 10).select(
        F.col("id").alias("k"), (F.col("id") * 100).alias("v")
    )
    cat.put("m", base)
    v0 = cat.info("m").version

    # upsert: k 0-4 replaced with v = -1, k 100-102 inserted
    upd = (
        spark.range(0, 5)
        .select(F.col("id").alias("k"), F.lit(-1).cast("long").alias("v"))
        .unionByName(
            spark.range(100, 103).select(
                F.col("id").alias("k"), F.lit(7).cast("long").alias("v")
            )
        )
    )
    cat.merge("m", upd, on=["k"])
    got = {r["k"]: r["v"] for r in cat.get("m").collect()}
    assert len(got) == 13
    assert all(got[k] == -1 for k in range(5))
    assert all(got[k] == k * 100 for k in range(5, 10))
    assert all(got[k] == 7 for k in (100, 101, 102))
    assert cat.info("m").version == v0 + 1

    # delete_matched: drop the inserted keys
    dels = spark.range(100, 103).select(F.col("id").alias("k"), F.lit(0).alias("v"))
    cat.merge("m", dels, on=["k"], delete_matched=True)
    assert sorted(r["k"] for r in cat.get("m").collect()) == list(range(10))
    # no stray tmp/old dirs survive the swap
    leftovers = [f for f in (tmp_path / "cat3").iterdir()
                 if f.name.endswith((".tmp", ".old"))]
    assert leftovers == []


def test_zorder_layout_clusters_both_columns(spark, tmp_path):
    """Z-order files must cover tight ranges of BOTH dimensions, where
    a single-key sorted layout only clusters its leading key. Metric:
    mean per-file (max-min)/global-span per column, from parquet
    footer stats via pyarrow — the same stats scans prune on."""
    import glob

    import pyarrow.parquet as pq
    import pyspark.sql.functions as F

    cat = Catalog(spark, str(tmp_path / "catz"))
    n = 1 << 14
    df = spark.range(n).select(
        (F.col("id") % 128).alias("x"),
        (F.floor(F.col("id") / 128)).alias("y"),
    )

    def spans(path, col_idx):
        fracs = []
        for f in glob.glob(f"{path}/part-*.parquet"):
            md = pq.ParquetFile(f).metadata
            mn = min(md.row_group(i).column(col_idx).statistics.min
                     for i in range(md.num_row_groups))
            mx = max(md.row_group(i).column(col_idx).statistics.max
                     for i in range(md.num_row_groups))
            fracs.append((mx - mn) / 127.0)
        return sum(fracs) / len(fracs)

    pz = cat.put_zorder("z", df, ["x", "y"], partitions=16)
    ps = cat.put_sorted("s", df, sort_by=["x"], partitions=16)

    # z-order: both dims clustered (each file sees a fraction of each)
    assert spans(pz, 0) < 0.6 and spans(pz, 1) < 0.6, (spans(pz, 0), spans(pz, 1))
    # leading-key sort: x tight but y spans ~everything per file
    assert spans(ps, 0) < 0.2
    assert spans(ps, 1) > 0.9
    assert cat.get("z").count() == n
