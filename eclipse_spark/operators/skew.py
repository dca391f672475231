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


def skew_audit(
    df: DataFrame,
    key_col: str,
    top_n: int = 10,
) -> DataFrame:
    """Join/aggregation-key skew DIAGNOSIS — the measurement half of
    this module's mitigation tools (the operational question before
    any salt/two-phase decision is "is this key skewed, and by how
    much"): one row per top-``top_n`` heaviest key with

    - ``cnt``: the key's row count,
    - ``share_ppm``: floor(1e6 * cnt / total_rows) — its share of the
      stream in parts-per-million (integer, engine-exact),
    - ``skew_x``: floor(cnt * n_keys / total_rows) — how many times an
      AVERAGE key's volume this key carries (the direct salting
      multiplier: a key at skew_x=40 wants ~40-way fan-out),

    plus the stream-level denominators (total_rows, n_keys) on every
    row so the report is self-contained. NULL keys count as a real
    group (NULL is the classic accidental hot key). Deterministic
    order: cnt DESC, key ASC.

    Scale shape: ONE map-side-combinable count aggregate over the key,
    one 1-row total aggregate joined by literal-free crossJoin of a
    broadcast single row, and a top-n via ORDER BY cnt LIMIT n (Spark
    TakeOrderedAndProject — per-partition heaps, never a global
    sort). The per-key table is the only shuffle and it is exactly the
    shuffle the audited join would pay, minus the payload.
    """
    per_key = df.groupBy(
        F.col(key_col).cast("string").alias("key")
    ).agg(F.count("*").cast("long").alias("cnt"))
    totals = per_key.agg(
        F.sum("cnt").cast("long").alias("total_rows"),
        F.count("*").cast("long").alias("n_keys"),
    )
    top = per_key.orderBy(F.desc("cnt"), F.asc_nulls_first("key")).limit(top_n)
    # integer `div` on BIGINT is exact floor division in both engines
    # (double-division + cast can round up across an integer boundary)
    return top.crossJoin(F.broadcast(totals)).select(
        "key",
        "cnt",
        F.expr("(cnt * CAST(1000000 AS BIGINT)) div total_rows")
        .cast("long")
        .alias("share_ppm"),
        F.expr("(cnt * n_keys) div total_rows").cast("long").alias("skew_x"),
        "total_rows",
        "n_keys",
    )


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
