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
