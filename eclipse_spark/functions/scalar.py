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
    "portable_hash60",
    "rot60",
    "portable_seeded_hashes",
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


# -- engine-portable hashing ------------------------------------------
#
# xxhash64 is the production hash (fastest JVM path) but no other SQL
# engine can recompute it, which makes signature pipelines built on it
# unverifiable by an external oracle. These helpers derive 60-bit
# hashes from md5 — every engine has md5 — so a whole MinHash/SimHash/
# fingerprint pipeline becomes bit-for-bit reproducible in e.g. DuckDB
# (parse substr(md5(s), 1, 15) as hex). 60 bits (15 hex chars), not
# 64, so the value is always a POSITIVE bigint and shift/mask algebra
# needs no sign care in any engine. md5 costs ~5x xxhash64, so the
# production operator defaults stay on xxhash64 and the portable
# variants are opt-in (`portable=True`), used by the driver-verified
# queries.


def portable_hash60(md5hex: Column, part: int = 0) -> Column:
    """60-bit positive bigint from an md5 HEX column: hex chars 1-15
    (part=0) or 16-30 (part=1). Callers hoist ``F.md5(x)`` into one
    projection and derive both parts from it."""
    return F.conv(F.substring(md5hex, 1 + 15 * part, 15), 16, 10).cast("bigint")


def rot60(col: Column, i: int) -> Column:
    """Rotate a 60-bit positive value left by ``i`` (mod 60). Mask
    BEFORE shifting so no intermediate exceeds 63 bits — the same
    expression is then legal (and identical) in engines that error on
    bigint overflow instead of wrapping."""
    i = i % 60
    if i == 0:
        return col
    mask = (1 << (60 - i)) - 1
    return F.shiftleft(col.bitwiseAND(F.lit(mask)), i).bitwiseOR(
        F.shiftright(col, 60 - i)
    )


def portable_seeded_hashes(v: Column, u: Column, n: int) -> list[Column]:
    """A family of ``n`` 60-bit hashes from ONE md5 evaluation:
    h_i = v XOR rot60(u, i), with (v, u) the two 60-bit halves of the
    digest. One md5 per input (not n), so a 32-hash MinHash pays one
    digest per shingle; the rotation mixing keeps the family
    pairwise-decorrelated enough for min-sketches (md5 avalanche), and
    the whole family is pure bit algebra any engine reproduces."""
    return [v.bitwiseXOR(rot60(u, i)) for i in range(n)]
