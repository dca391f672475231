"""Scalar function layer (SURVEY §2.6 'Scalar function library').

Eclipse has no scalar functions — record parsing is user C++ inside
map (``src/mapreduce/dht/mapreduce.hh:905-929`` hands back raw lines).
Our engine's scalar surface is ``pyspark.sql.functions`` itself; this
module only adds the composites the function library lacks. Everything
here is a Column-in/Column-out pure expression (codegen-able).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "ieee_divide",
    "safe_div",
    "json_get",
    "date_bucket",
    "decimal_sum_ready",
    "clamp",
    "murmur_bucket",
]


def safe_div(num: Column, den: Column) -> Column:
    """NULL-on-zero division (ANSI-safe)."""
    return F.when(den != 0, num / den)


ieee_divide = safe_div


def json_get(col: Column, path: str) -> Column:
    """Extract a field from a JSON string column (events.props)."""
    return F.get_json_object(col, f"$.{path}")


def date_bucket(ts: Column, unit: str = "hour") -> Column:
    """Truncate a timestamp to a bucket boundary (oracle-parity with
    duckdb's date_trunc)."""
    return F.date_trunc(unit, ts)


def decimal_sum_ready(col: Column, precision: int = 18, scale: int = 2) -> Column:
    """Cast a double money column to decimal before summation so
    results are exact and engine-independent (floating-point sums
    differ across engines by addition order)."""
    return col.cast(f"decimal({precision},{scale})")


def clamp(col: Column, lo: float, hi: float) -> Column:
    return F.least(F.greatest(col, F.lit(lo)), F.lit(hi))


def murmur_bucket(col: Column, buckets: int) -> Column:
    """Stable hash bucket in [0, buckets) — partitioning/bucketing
    helper (the engine-visible analogue of Eclipse's h(key)%N
    placement, ``src/common/hash.cc``)."""
    return F.pmod(F.hash(col), F.lit(buckets))
