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


# -- time travel ------------------------------------------------------

def test_time_travel_snapshots_and_restore(spark, tmp_path):
    from eclipse_spark.storage import Catalog

    cat = Catalog(spark, str(tmp_path / "tt"), retain_versions=2)
    df1 = spark.range(3).withColumnRenamed("id", "x")
    df2 = spark.range(5).withColumnRenamed("id", "x")
    df3 = spark.range(7).withColumnRenamed("id", "x")

    cat.put("t", df1)                       # current v1
    assert cat.history("t") == []
    cat.put("t", df2)                       # current v2, snapshot v1
    cat.put("t", df3)                       # current v3, snapshots v1,v2
    assert cat.history("t") == [1, 2]
    assert cat.get("t").count() == 7
    assert cat.get("t", version=1).count() == 3
    assert cat.get("t", version=2).count() == 5

    # retention budget: a fourth write prunes v1
    cat.put("t", df1)
    assert cat.history("t") == [2, 3]

    # rollback is itself a versioned write
    v_before = cat.info("t").version
    cat.restore("t", version=2)
    assert cat.get("t").count() == 5
    assert cat.info("t").version == v_before + 1

    # snapshots are invisible to ls(); rm removes them
    assert cat.ls() == ["t"]
    assert cat.rm("t")
    assert cat.history("t") == []
    assert cat.ls() == []


def test_time_travel_off_keeps_old_behavior(spark, tmp_path):
    from eclipse_spark.storage import Catalog

    cat = Catalog(spark, str(tmp_path / "plain"))
    cat.put("t", spark.range(3))
    cat.put("t", spark.range(5))
    assert cat.history("t") == []
    import pytest as _pytest
    with _pytest.raises(FileNotFoundError):
        cat.get("t", version=1)


def test_time_travel_merge_retires_snapshot(spark, tmp_path):
    from pyspark.sql import functions as F

    from eclipse_spark.storage import Catalog

    cat = Catalog(spark, str(tmp_path / "m"), retain_versions=1)
    base = spark.range(4).select(F.col("id").alias("k"), F.lit("old").alias("v"))
    cat.put("t", base)
    upd = spark.createDataFrame([(1, "new"), (9, "new")], ["k", "v"])
    cat.merge("t", upd, on=["k"])
    cur = {(r["k"], r["v"]) for r in cat.get("t").collect()}
    assert cur == {(0, "old"), (2, "old"), (3, "old"), (1, "new"), (9, "new")}
    snap = {(r["k"], r["v"]) for r in cat.get("t", version=1).collect()}
    assert snap == {(0, "old"), (1, "old"), (2, "old"), (3, "old")}


def test_table_diff_classifies_null_transitions(spark, tmp_path):
    from eclipse_spark.storage import Catalog, table_diff

    old = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "c"), (4, "d")], "k bigint, v string"
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None), (5, "e")], "k bigint, v string"
    )
    got = {
        (r.change_type, r.k): r.v for r in table_diff(old, new, ["k"]).collect()
    }
    # 1 unchanged (no row); 2: NULL->value update; 3: value->NULL update;
    # 4 deleted; 5 inserted
    assert got == {
        ("update_preimage", 2): None,
        ("update_postimage", 2): "b",
        ("update_preimage", 3): "c",
        ("update_postimage", 3): None,
        ("delete", 4): "d",
        ("insert", 5): "e",
    }

    cat = Catalog(spark, str(tmp_path / "cdc"), retain_versions=2)
    cat.put("t", old)
    cat.put("t", new)
    assert cat.diff("t", from_version=1, on=["k"]).count() == 6
    import pytest as _pytest

    with _pytest.raises(ValueError):
        cat.diff("t", from_version=1, on=[])


def test_table_diff_schema_mismatch_raises(spark):
    from eclipse_spark.storage import table_diff
    import pytest as _pytest

    a = spark.createDataFrame([(1, "x")], "k bigint, v string")
    b = spark.createDataFrame([(1, 2.0)], "k bigint, w double")
    with _pytest.raises(ValueError):
        table_diff(a, b, ["k"])


def test_vacuum_prunes_old_snapshots(spark, tmp_path):
    from eclipse_spark.storage import Catalog

    cat = Catalog(spark, str(tmp_path / "vac"), retain_versions=5)
    df = spark.range(3)
    for _ in range(4):
        cat.put("t", df)
    assert cat.history("t") == [1, 2, 3]
    assert cat.vacuum("t", keep=1) == 2  # drop v1, v2
    assert cat.history("t") == [3]
    assert cat.get("t", version=3).count() == 3  # survivor still readable
    assert cat.vacuum(keep=0) == 1  # all-tables, drop everything retained
    assert cat.history("t") == []


def test_get_evolved_merges_widened_schema(spark, tmp_path):
    from eclipse_spark.storage import Catalog

    cat = Catalog(spark, str(tmp_path / "cat"))
    v1 = spark.createDataFrame([(1, "a")], ["k", "s"])
    v2 = spark.createDataFrame([(2, "b", 9.5)], ["k", "s", "x"])
    cat.write("t", v1)
    cat.write("t", v2)
    rows = {r.k: r for r in cat.get_evolved("t").collect()}
    assert set(cat.get_evolved("t").columns) == {"k", "s", "x"}
    assert rows[1].x is None and rows[2].x == 9.5


def test_put_many_atomic_publish_and_roll_forward(spark, tmp_path):
    """Multi-table commit: both tables land with bumped versions and
    the journal clears; a crash AFTER the journal write (simulated:
    tmps + journal on disk, renames never ran) is rolled forward by
    the next session — both tables publish, versions match the
    journal; a crash BEFORE the journal (tmps only) changes nothing."""
    import json
    import os

    from eclipse_spark.storage import Catalog

    root = str(tmp_path / "cat")
    cat = Catalog(spark, root, retain_versions=1)
    cat.put("fact", spark.range(5).withColumnRenamed("id", "v"))
    v0 = cat.info("fact").version

    # happy path: fact + dim publish together
    cat.put_many(
        {
            "fact": spark.range(10).withColumnRenamed("id", "v"),
            "dim": spark.range(3).withColumnRenamed("id", "k"),
        }
    )
    assert cat.get("fact").count() == 10 and cat.get("dim").count() == 3
    assert cat.info("fact").version == v0 + 1
    assert not os.path.exists(cat._journal_path())

    # crash AFTER the commit point: stage tmps + journal by hand
    for name, n in (("fact", 20), ("dim", 7)):
        spark.range(n).write.mode("overwrite").parquet(
            cat.path_of(name) + ".tmp"
        )
    staged = {
        "fact": cat.info("fact").version + 1,
        "dim": cat.info("dim").version + 1,
    }
    with open(cat._journal_path(), "w") as fh:
        json.dump(staged, fh)
    cat2 = Catalog(spark, root, retain_versions=1)  # next session
    assert cat2.get("fact").count() == 20 and cat2.get("dim").count() == 7
    assert cat2.info("fact").version == staged["fact"]
    assert cat2.info("dim").version == staged["dim"]
    assert not os.path.exists(cat2._journal_path())

    # crash BEFORE the commit point: a stale tmp alone must not publish
    spark.range(99).write.mode("overwrite").parquet(
        cat2.path_of("fact") + ".tmp"
    )
    cat3 = Catalog(spark, root, retain_versions=1)
    assert cat3.get("fact").count() == 20  # unchanged
    assert cat3.info("fact").version == staged["fact"]


def test_put_many_retention_off_overwrites_existing(spark, tmp_path):
    """ADVICE r7 (medium): with retain_versions=0 (the default),
    _retire_current no-ops, and the final rename used to hit an
    existing non-empty parquet directory (ENOTEMPTY) — AFTER the
    journal commit point, so every subsequent Catalog.__init__
    re-raised during recover_pending and the catalog root became
    unopenable. The park-aside swap must make both put_many and
    put(marker=...) succeed on existing tables with retention off,
    and leave no .old/.tmp garbage behind."""
    import os

    from eclipse_spark.storage import Catalog

    root = str(tmp_path / "cat")
    cat = Catalog(spark, root)  # retain_versions=0
    cat.put("fact", spark.range(5).withColumnRenamed("id", "v"))
    cat.put("dim", spark.range(2).withColumnRenamed("id", "k"))

    cat.put_many(
        {
            "fact": spark.range(10).withColumnRenamed("id", "v"),
            "dim": spark.range(3).withColumnRenamed("id", "k"),
        }
    )
    assert cat.get("fact").count() == 10 and cat.get("dim").count() == 3

    # put with a marker on an existing table takes the same staged path
    cat.put("fact", spark.range(7).withColumnRenamed("id", "v"),
            marker={"batch": 1})
    assert cat.get("fact").count() == 7
    assert cat.read_marker("fact") == {"batch": 1}

    leftovers = [f for f in os.listdir(root)
                 if f.endswith(".old") or f.endswith(".tmp")]
    assert leftovers == []
    # and the catalog stays openable
    cat2 = Catalog(spark, root)
    assert cat2.get("fact").count() == 7


def test_get_many_snapshot_across_put_many(spark, tmp_path):
    """VERDICT r7 task 6: a reader that lands mid-_apply_journal (the
    journal exists, one table already renamed in, the other still
    staged) must see all-old or all-new — get_many rolls the decided
    commit forward and returns the all-new vector. Without a pending
    commit it returns the current vector unchanged."""
    import json
    import os

    from eclipse_spark.storage import Catalog

    root = str(tmp_path / "cat")
    cat = Catalog(spark, root, retain_versions=1)
    cat.put_many(
        {
            "fact": spark.range(10).withColumnRenamed("id", "v"),
            "dim": spark.range(3).withColumnRenamed("id", "k"),
        }
    )

    # quiescent read: current versions
    dfs = cat.get_many(["fact", "dim"])
    assert dfs["fact"].count() == 10 and dfs["dim"].count() == 3

    # simulate a reader arriving mid-commit: stage both tmps, write the
    # journal (= commit point), then rename ONLY fact in by hand — the
    # exact mixed-version window put_many documents.
    for name, n in (("fact", 20), ("dim", 7)):
        spark.range(n).write.mode("overwrite").parquet(
            cat.path_of(name) + ".tmp"
        )
    staged = {
        "fact": cat.info("fact").version + 1,
        "dim": cat.info("dim").version + 1,
    }
    with open(cat._journal_path(), "w") as fh:
        json.dump(staged, fh)
    cat._replace_current("fact", cat.path_of("fact") + ".tmp")  # partial apply

    dfs = cat.get_many(["fact", "dim"])  # must NOT see fact=20/dim=3
    assert dfs["fact"].count() == 20 and dfs["dim"].count() == 7
    assert not os.path.exists(cat._journal_path())
    assert cat.info("fact").version == staged["fact"]
    assert cat.info("dim").version == staged["dim"]


def test_recover_restores_old_park_aside(spark, tmp_path):
    """Crash inside _replace_current's retention-off window (current
    parked at .old, staged rename never ran): recover() restores the
    parked copy; the stale .old next to a LIVE current is swept by
    recover_pending on the next session."""
    import os
    import shutil

    from eclipse_spark.storage import Catalog

    root = str(tmp_path / "cat")
    cat = Catalog(spark, root)
    cat.put("t", spark.range(5).withColumnRenamed("id", "v"))
    # simulate the crash: park current aside, no staged data renamed in
    os.rename(cat.path_of("t"), cat.path_of("t") + ".old")
    assert not cat.exists("t")
    assert cat.recover("t") is True
    assert cat.get("t").count() == 5

    # stale .old NEXT TO a live current is garbage -> swept on init
    shutil.copytree(cat.path_of("t"), cat.path_of("t") + ".old")
    cat2 = Catalog(spark, root)
    assert not os.path.exists(cat2.path_of("t") + ".old")
    assert cat2.get("t").count() == 5


def test_compact_rewrites_small_files(spark, tmp_path):
    """48-way fragmented table compacts to ceil(bytes/target)=1 file;
    content is row-identical, the version bumps (a compaction is a
    visible write), and with retention on the pre-compaction layout
    survives as a readable snapshot."""
    import glob

    cat = Catalog(spark, str(tmp_path / "cat"), retain_versions=1)
    df = spark.range(0, 5000).selectExpr("id", "id % 7 AS grp")
    cat.put("t", df.repartition(12))
    before, after = cat.compact("t", target_file_mb=64)
    assert before == 12 and after == 1
    assert len(glob.glob(str(tmp_path / "cat" / "t.parquet" / "*.parquet"))) == 1
    assert cat.info("t").version == 2
    got = sorted(r["id"] for r in cat.get("t").collect())
    assert got == list(range(5000))
    # pre-compaction snapshot: same rows, old 12-file layout
    snap = cat.get("t", version=1)
    assert snap.count() == 5000
    assert (
        len(glob.glob(str(tmp_path / "cat" / "t.parquet.v1" / "*.parquet")))
        == 12
    )


def test_compact_preserves_hive_partitions(spark, tmp_path):
    """A hive-partitioned table keeps its partitionBy layout through
    compaction: partition directories survive, per-partition file
    count drops to the coalesce target, rows round-trip."""
    import glob
    import os

    cat = Catalog(spark, str(tmp_path / "cat"))
    df = spark.range(0, 3000).selectExpr("id", "CAST(id % 3 AS INT) AS p")
    cat.put("t", df.repartition(8), partition_by=["p"])
    root = tmp_path / "cat" / "t.parquet"
    assert len(glob.glob(str(root / "p=1" / "*.parquet"))) == 8
    before, after = cat.compact("t", target_file_mb=64)
    assert before == 24 and after == 3  # one file per partition value
    assert sorted(
        d for d in os.listdir(root) if d.startswith("p=")
    ) == ["p=0", "p=1", "p=2"]
    assert len(glob.glob(str(root / "p=1" / "*.parquet"))) == 1
    got = cat.get("t")
    assert got.count() == 3000
    assert sorted(r["p"] for r in got.select("p").distinct().collect()) == [
        0, 1, 2,
    ]


def test_compact_carries_commit_marker(spark, tmp_path):
    """The _commit.json marker committed with the data survives a
    compaction — idempotent sinks keyed on it must not mistake the
    layout rewrite for a replayed or missing batch."""
    cat = Catalog(spark, str(tmp_path / "cat"))
    df = spark.range(0, 100).selectExpr("id")
    cat.put("t", df.repartition(4), marker={"batch_id": 7})
    cat.compact("t", target_file_mb=64)
    assert cat.read_marker("t") == {"batch_id": 7}
    assert cat.get("t").count() == 100
