"""Hypertable-style time-bucketed rollups (continuous-aggregate
analogue): materialize a fine-grained bucketed aggregate once, answer
coarser-grained queries by re-aggregating the rollup instead of the
raw table.

The point at 100 TB: the raw events table is scanned ONCE at rollup
build (or incrementally via the streaming merge sink); every dashboard
query after that reads the rollup, which is smaller by the
bucket-compression factor (raw-rows / (groups x buckets)). Only
mergeable measures are allowed (sum / count / min / max — avg is
derived as sum/count at read time), which is exactly the constraint
TimescaleDB/Druid place on their rollups, and the same partial-agg
algebra Spark itself uses map-side.

The reference has no time-series surface (north-star extension, not
parity); the build/read split mirrors its Icache materialize-then-
reread discipline (SURVEY §2.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: measure-name suffix -> (build agg, merge agg) pairs; avg intentionally
#: absent — derive it from sum/count at read time.
_MERGEABLE = ("sum", "count", "min", "max")


def _bucket(ts_col: str, minutes: int):
    return F.timestamp_seconds(
        (F.unix_timestamp(F.col(ts_col)) / (minutes * 60)).cast("long")
        * (minutes * 60)
    )


def build_rollup(
    df: DataFrame,
    ts_col: str,
    bucket_minutes: int,
    group_cols: list[str],
    measures: dict[str, tuple[str, str]],
) -> DataFrame:
    """One pass over the raw table -> (bucket, groups, measures).

    ``measures`` maps output column -> (agg, source column); agg in
    sum/count/min/max. Sums accumulate in decimal for cross-engine
    exactness and stay decimal in the rollup so re-aggregation stays
    exact; surface them as double after :func:`read_rollup`.
    """
    aggs = []
    for out, (fn, src) in measures.items():
        if fn not in _MERGEABLE:
            raise ValueError(f"{fn} is not mergeable; use sum/count/min/max")
        if fn == "sum":
            aggs.append(F.sum(F.col(src).cast("decimal(28,6)")).alias(out))
        elif fn == "count":
            aggs.append(F.count(F.col(src) if src != "*" else F.lit(1)).alias(out))
        else:
            aggs.append(getattr(F, fn)(F.col(src)).alias(out))
    return (
        df.withColumn("_bucket", _bucket(ts_col, bucket_minutes))
        .groupBy("_bucket", *group_cols)
        .agg(*aggs)
    )


def read_rollup(
    rollup: DataFrame,
    bucket_minutes: int,
    group_cols: list[str],
    measures: dict[str, tuple[str, str]],
) -> DataFrame:
    """Answer a coarser-bucket query from the rollup: re-bucket the
    fine buckets and merge measures (sum+sum, count via sum, min/max
    idempotent). ``bucket_minutes`` must be a multiple of the build
    granularity for bucket edges to align."""
    merged = []
    for out, (fn, _src) in measures.items():
        if fn in ("sum", "count"):
            merged.append(F.sum(out).alias(out))
        else:
            merged.append(getattr(F, fn)(out).alias(out))
    return (
        rollup.withColumn("_bucket", _bucket("_bucket", bucket_minutes))
        .groupBy("_bucket", *group_cols)
        .agg(*merged)
    )
