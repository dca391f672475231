"""Physical-layout utilities shared by operators."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, target: int | None = None) -> DataFrame:
    """Repartition up when the input has fewer splits than cores.

    A CPU-heavy operator (shingling, hashing, decode) over a
    small-file table otherwise runs on one task no matter how many
    cores exist — parquet splitting is bounded by row groups, so a
    single-row-group file is one split. The row shuffle this adds is
    cheap relative to the per-row compute it parallelizes; at real
    scale (many input splits) this is a no-op."""
    sc = df.sparkSession.sparkContext
    target = target or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
