"""Incremental materialized-view maintenance over the change feed.

The reason a versioned store keeps a change feed (storage.table_diff /
Catalog.diff) is so downstream aggregates never rescan the base: a
SUM/COUNT materialized view is refreshed from the DELTA alone —
``O(|changes|)`` work instead of ``O(|base|)``, the difference between
minutes and a full 100 TB pass on every ingest batch.

The algebra is the classic IVM rule for self-maintainable aggregates:
every change-feed row carries a sign (+1 for insert/update_postimage,
-1 for delete/update_preimage), the signed rows aggregate per group
into a delta vector (count delta, sum deltas), and the refresh is one
keyed full-outer merge: ``new = old + delta``, dropping groups whose
count reaches zero. COUNT and SUM are self-maintainable; MIN/MAX are
not (a delete can require rescanning the group) — callers needing
them keep the per-group rescan path or a monoid sketch.

All measure arithmetic accumulates in DECIMAL, so a view refreshed
incrementally is BIT-EXACT equal to one recomputed from scratch —
that equality is this module's oracle check, and it is the property
that makes incremental refresh trustworthy at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "aggregate_view",
    "incremental_refresh",
    "aggregate_view_minmax",
    "incremental_refresh_minmax",
    "join_aggregate_view",
    "incremental_refresh_join",
]

_NEG = ("delete", "update_preimage")


def aggregate_view(
    df: DataFrame, keys: list[str], sum_cols: dict[str, str], count_col: str = "n_rows"
) -> DataFrame:
    """The full-recompute form of the maintained view: per-``keys``
    row count plus decimal sums. ``sum_cols`` maps source column ->
    output measure name. (Kept next to the refresh so both sides of
    the equivalence share one definition.)"""
    aggs = [F.count("*").cast("long").alias(count_col)]
    for src, out in sum_cols.items():
        aggs.append(F.sum(F.col(src).cast("decimal(18,2)")).alias(out))
    return df.groupBy(*keys).agg(*aggs)


def incremental_refresh(
    mv: DataFrame,
    changes: DataFrame,
    keys: list[str],
    sum_cols: dict[str, str],
    count_col: str = "n_rows",
) -> DataFrame:
    """Refresh a :func:`aggregate_view` materialization from a change
    feed (``storage.table_diff`` output: ``change_type`` +
    the base table's columns) WITHOUT touching the base table.

    Plan shape: one aggregate over the (small) change batch, one
    keyed full-outer merge against the view — both shuffles are sized
    by |changes| + |view|, never |base|. Groups born in this batch
    appear via the outer side; groups whose count hits zero are
    dropped (exactly what recompute would produce)."""
    sign = F.when(F.col("change_type").isin(*_NEG), F.lit(-1)).otherwise(F.lit(1))
    d_aggs = [F.sum(sign).alias("_dn")]
    for src, out in sum_cols.items():
        d_aggs.append(
            F.sum(sign.cast("decimal(18,2)") * F.col(src).cast("decimal(18,2)")).alias(
                f"_d_{out}"
            )
        )
    delta = changes.groupBy(*keys).agg(*d_aggs)
    merged = mv.join(delta, on=keys, how="full_outer")
    n_new = F.coalesce(F.col(count_col), F.lit(0)) + F.coalesce(F.col("_dn"), F.lit(0))
    out_cols = [F.col(k) for k in keys] + [n_new.cast("long").alias(count_col)]
    for out in sum_cols.values():
        zero = F.lit(0).cast("decimal(18,2)")
        out_cols.append(
            (
                F.coalesce(F.col(out), zero) + F.coalesce(F.col(f"_d_{out}"), zero)
            ).alias(out)
        )
    return merged.select(*out_cols).filter(F.col(count_col) > 0)


def aggregate_view_minmax(
    df: DataFrame, keys: list[str], value_col: str, count_col: str = "n_rows"
) -> DataFrame:
    """Recompute form of the MIN/MAX view: per-group count + min + max
    of ``value_col`` (no arithmetic touches the stored values, so the
    extremes are exact in any engine)."""
    return df.groupBy(*keys).agg(
        F.count("*").cast("long").alias(count_col),
        F.min(value_col).alias("min_val"),
        F.max(value_col).alias("max_val"),
    )


def incremental_refresh_minmax(
    mv: DataFrame,
    changes: DataFrame,
    base_new: DataFrame,
    keys: list[str],
    value_col: str,
    count_col: str = "n_rows",
) -> DataFrame:
    """Refresh a MIN/MAX view from the change feed with TARGETED GROUP
    RESCAN — the standard answer to min/max not being
    self-maintainable (a delete may remove the very row holding the
    extreme, and no delta algebra can recover the runner-up).

    Split rule: groups whose batch contains only inserts /
    update_postimages stay delta-only (``least/greatest`` of old
    extreme and batch extreme — monoid merge); groups with ANY delete
    or update_preimage rescan FROM THE NEW BASE, but only those
    groups — ``base_new`` is semi-joined to the affected keys before
    its aggregate, so with the base partitioned or bucketed on the
    keys the rescan reads a sliver, not 100 TB. Groups reaching count
    zero drop; groups born in the batch arrive via the outer merge.
    The refreshed view is row-for-row equal to
    :func:`aggregate_view_minmax` over the new base (the oracle)."""
    sign = F.when(F.col("change_type").isin(*_NEG), F.lit(-1)).otherwise(F.lit(1))
    pos_val = F.when(~F.col("change_type").isin(*_NEG), F.col(value_col))
    delta = changes.groupBy(*keys).agg(
        F.sum(sign).alias("_dn"),
        F.min(pos_val).alias("_ins_min"),
        F.max(pos_val).alias("_ins_max"),
        F.max(
            F.when(F.col("change_type").isin(*_NEG), F.lit(1)).otherwise(F.lit(0))
        ).alias("_has_neg"),
    )
    merged = mv.join(delta, on=keys, how="full_outer")
    n_new = F.coalesce(F.col(count_col), F.lit(0)) + F.coalesce(F.col("_dn"), F.lit(0))
    alive = merged.filter(n_new > 0)
    safe = alive.filter(F.coalesce(F.col("_has_neg"), F.lit(0)) == 0).select(
        *keys,
        n_new.cast("long").alias(count_col),
        F.least(
            F.coalesce(F.col("min_val"), F.col("_ins_min")),
            F.coalesce(F.col("_ins_min"), F.col("min_val")),
        ).alias("min_val"),
        F.greatest(
            F.coalesce(F.col("max_val"), F.col("_ins_max")),
            F.coalesce(F.col("_ins_max"), F.col("max_val")),
        ).alias("max_val"),
    )
    rescan_keys = alive.filter(F.col("_has_neg") == 1).select(*keys)
    rescanned = aggregate_view_minmax(
        base_new.join(rescan_keys, on=keys, how="left_semi"),
        keys,
        value_col,
        count_col,
    )
    return safe.unionByName(rescanned)


def join_aggregate_view(
    a: DataFrame,
    b: DataFrame,
    on: list[str],
    keys: list[str],
    sum_col: str,
    total_col: str = "total",
    count_col: str = "n_rows",
) -> DataFrame:
    """Recompute form of the JOIN view: ``A JOIN B USING (on)`` rolled
    up per ``keys`` (count + decimal sum of ``sum_col``) — the
    fact-join-dim rollup every warehouse maintains. Group keys may come
    from EITHER side (grouping by a dim attribute is the interesting
    case: a dim update moves fact rows across groups)."""
    j = a.join(b, on=on)
    return j.groupBy(*keys).agg(
        F.count("*").cast("long").alias(count_col),
        F.sum(F.col(sum_col).cast("decimal(18,2)")).alias(total_col),
    )


def incremental_refresh_join(
    mv: DataFrame,
    changes_a: DataFrame,
    changes_b: DataFrame,
    a_old: DataFrame,
    b_old: DataFrame,
    on: list[str],
    keys: list[str],
    sum_col: str,
    total_col: str = "total",
    count_col: str = "n_rows",
) -> DataFrame:
    """Refresh a :func:`join_aggregate_view` from BOTH sides' change
    feeds without re-joining the bases — the classic signed delta rule
    for joins:

        Δ(A ⋈ B) = ΔA ⋈ B_old  +  A_old ⋈ ΔB  +  ΔA ⋈ ΔB

    with pair sign = product of row signs (+1 insert/postimage, -1
    delete/preimage). The three terms' signed (count, sum)
    contributions aggregate per group and merge into the view exactly
    like the single-table rule — so dim updates that MOVE fact rows
    across groups net out correctly (preimage pairs leave the old
    group, postimage pairs enter the new), and the refreshed view is
    bit-exact equal to recomputing over the new snapshots (the oracle
    property; decimal arithmetic throughout).

    Scale shape: each base appears only semi-joined to the OTHER
    side's delta join-keys before its join — with bases partitioned or
    bucketed on the join key the old-side reads are slivers sized by
    the batch, never the base; every shuffle is |Δ|-sized except the
    final |view|-keyed merge."""
    sign_a = F.when(F.col("_sa_ct").isin(*_NEG), F.lit(-1)).otherwise(F.lit(1))
    sign_b = F.when(F.col("_sb_ct").isin(*_NEG), F.lit(-1)).otherwise(F.lit(1))
    ca = changes_a.withColumnRenamed("change_type", "_sa_ct")
    cb = changes_b.withColumnRenamed("change_type", "_sb_ct")
    # old sides restricted to join keys the deltas actually touch
    b_for_da = b_old.join(ca.select(*on).distinct(), on=on, how="left_semi")
    a_for_db = a_old.join(cb.select(*on).distinct(), on=on, how="left_semi")
    d1 = ca.join(b_for_da, on=on).withColumn("_sgn", sign_a)
    d2 = a_for_db.join(cb, on=on).withColumn("_sgn", sign_b)
    d3 = ca.join(cb, on=on).withColumn("_sgn", sign_a * sign_b)
    cols = [*on, *[k for k in keys if k not in on], sum_col, "_sgn"]
    pairs = (
        d1.select(*cols).unionByName(d2.select(*cols)).unionByName(d3.select(*cols))
    )
    delta = pairs.groupBy(*keys).agg(
        F.sum("_sgn").alias("_dn"),
        F.sum(
            F.col("_sgn").cast("decimal(18,2)") * F.col(sum_col).cast("decimal(18,2)")
        ).alias("_dt"),
    )
    merged = mv.join(delta, on=keys, how="full_outer")
    n_new = F.coalesce(F.col(count_col), F.lit(0)) + F.coalesce(F.col("_dn"), F.lit(0))
    zero = F.lit(0).cast("decimal(18,2)")
    return merged.select(
        *keys,
        n_new.cast("long").alias(count_col),
        (
            F.coalesce(F.col(total_col), zero)
            + F.coalesce(F.col("_dt").cast("decimal(18,2)"), zero)
        ).alias(total_col),
    ).filter(F.col(count_col) > 0)
