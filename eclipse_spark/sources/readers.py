"""Source / sink connectors (SURVEY §2.1 S5-S7).

Eclipse supports three storage backends behind the same MR API — DHT
(``src/mapreduce/dht/``), NFS (``src/mapreduce/nfs/mapreduce.hh``), and
HDFS (``src/mapreduce/hdfs/mapreduce.hh``). Spark reads any
Hadoop-compatible FS natively, so the backend dimension collapses to
the path scheme; what remains is the *format* dimension, wrapped here
with scale-safe defaults (explicit schemas — never inferSchema a
100 TB CSV; parquet as the default interchange).

Formats needing jars absent from this container (delta/iceberg/kafka)
are gated behind import-try and raise a clear error.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_FORMATS = ("parquet", "orc", "json", "csv", "text", "binaryFile", "xml")


def read_any(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: str | None = None,
    **options: str,
) -> DataFrame:
    if fmt not in _FORMATS:
        return _read_extension(spark, path, fmt, **options)
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    elif fmt in ("json", "csv"):
        # schema-on-read without a schema means a full inference scan;
        # allow it but only via explicit opt-in
        if options.pop("allow_infer", "false") != "true":
            raise ValueError(
                f"{fmt} needs an explicit schema at scale; pass schema=... "
                "or allow_infer='true' for exploratory reads"
            )
        reader = reader.option("inferSchema", "true")
    if fmt == "csv":
        reader = reader.option("header", options.pop("header", "true"))
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.format(fmt).load(path)


def _read_extension(spark: SparkSession, path: str, fmt: str, **options: str) -> DataFrame:
    """Formats that need extra jars (delta, iceberg, kafka, jdbc)."""
    try:
        reader = spark.read.format(fmt)
        for k, v in options.items():
            reader = reader.option(k, v)
        return reader.load(path)
    except Exception as e:  # pragma: no cover - depends on classpath
        raise NotImplementedError(
            f"format {fmt!r} requires jars not present in this container: {e}"
        ) from e


def write_any(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    **options: str,
) -> None:
    writer = df.write.mode(mode).format(fmt)
    if fmt == "csv":
        # mirror read_any's header default — an asymmetric default eats
        # the first data row on round-trip
        writer = writer.option("header", options.pop("header", "true"))
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save(path)
