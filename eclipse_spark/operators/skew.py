"""Skew-mitigation helpers — the engine-level analogue of EM-KDE.

Eclipse rebalances skew at the *scheduler*: a decayed kernel-density
histogram of key access frequency moves node boundaries every 5 s so
each node gets an equal query share (``src/orthrus/histogram.hh:173-273``,
``src/master/dht/master.cc:1189-1211``). Spark's AQE covers the join /
aggregation cases at runtime; what AQE cannot fix is a single
pathological hot key inside ``groupBy().applyInPandas`` (one Arrow
group = one task). These helpers cover that gap with the classic
salt + two-phase pattern.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salt(
    df: DataFrame,
    key_col: str | Sequence[str] | None = None,
    buckets: int = 32,
    salt_col: str = "_salt",
) -> DataFrame:
    """Append a deterministic per-row salt in [0, buckets): the hot key
    fans out over ``buckets`` reducers. The salt hashes the *non-key*
    columns (the row discriminator) — rows of the same hot key must land
    in different buckets, so hashing the key itself would be useless,
    and hashing key+value couples the salt to the key's value columns.
    Deterministic (monotonically_increasing_id is NOT) so retries and
    cache fingerprints stay stable."""
    keys = [key_col] if isinstance(key_col, str) else list(key_col or [])
    disc = [c for c in df.columns if c not in keys] or list(df.columns)
    return df.withColumn(
        salt_col, F.pmod(F.xxhash64(*[F.col(c) for c in disc]), F.lit(buckets)).cast("int")
    )


def two_phase_agg(
    df: DataFrame,
    keys: Sequence[str],
    partial_aggs: Sequence[Column],
    final_aggs: Sequence[Column],
    buckets: int = 32,
    salt_col: str = "_salt",
) -> DataFrame:
    """Skew-proof aggregation: phase 1 aggregates on (keys + salt) —
    the hot key splits across ``buckets`` tasks; phase 2 merges the
    partials on keys alone, now at most ``buckets`` rows per key.

    ``partial_aggs`` aliases must produce the columns ``final_aggs``
    consume, e.g. partial ``sum(x) as x_part`` -> final
    ``sum(x_part) as sum_x``."""
    salted = salt(df, keys, buckets, salt_col)
    partial = salted.groupBy(*keys, salt_col).agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*final_aggs)


def skew_join_salted(
    big: DataFrame,
    small: DataFrame,
    key: str,
    buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Salted join for a skewed big side against a non-broadcastable
    small side: big rows get a random-ish salt, small rows are
    replicated ``buckets`` times, join key becomes (key, salt).
    Prefer AQE's skew-join first; this is the manual fallback."""
    b = salt(big, key, buckets)
    s = small.crossJoin(
        F.broadcast(
            small.sparkSession.range(buckets).select(F.col("id").cast("int").alias("_salt"))
        )
    )
    out = b.join(s, on=[key, "_salt"], how=how)
    return out.drop("_salt")
