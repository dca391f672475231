"""Relational capability layer (SURVEY §2.6).

Eclipse has no relational operators — its users hand-write reduce-side
joins, sorts, and distincts as C++ map/reduce (SURVEY §2.6 notes the
classic patterns on ``mapreduce.hh:812,944``). Our engine exposes them
as thin, scale-disciplined wrappers over the DataFrame API so Catalyst
owns pushdown/pruning/reordering, with join-strategy hygiene baked in:

- ``join(..., broadcast_right=True)`` forces the broadcast-hash path
  for dimension tables (no shuffle of the fact side);
- ``top_k_per_group`` uses a window + rank, never a driver-side sort;
- set ops / distinct / cube / rollup are direct passthroughs.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

JOIN_TYPES = {
    "inner",
    "left",
    "right",
    "full",
    "left_semi",
    "left_anti",
    "cross",
}


def join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str] | Column,
    how: str = "inner",
    broadcast_right: bool = False,
) -> DataFrame:
    """All join flavors. ``broadcast_right`` pins the small-dim
    broadcast-hash strategy (fact table never shuffles)."""
    if how not in JOIN_TYPES:
        raise ValueError(f"unsupported join type {how!r}; one of {sorted(JOIN_TYPES)}")
    r = F.broadcast(right) if broadcast_right else right
    return left.join(r, on=on, how=how)


def union_all(*dfs: DataFrame) -> DataFrame:
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out


def intersect(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.intersect(b)


def intersect_all(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.intersectAll(b)


def except_all(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.exceptAll(b)


def except_distinct(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.subtract(b)


def distinct(df: DataFrame, subset: Sequence[str] | None = None) -> DataFrame:
    return df.dropDuplicates(list(subset)) if subset else df.distinct()


def rollup(df: DataFrame, keys: Sequence[str], aggs: Sequence[Column]) -> DataFrame:
    return df.rollup(*keys).agg(*aggs)


def cube(df: DataFrame, keys: Sequence[str], aggs: Sequence[Column]) -> DataFrame:
    return df.cube(*keys).agg(*aggs)


def order_by(df: DataFrame, *cols: Column | str) -> DataFrame:
    """Global sort — range-partitioned shuffle; at 100 TB prefer
    ``top_k`` / ``top_k_per_group`` over full sorts."""
    return df.orderBy(*cols)


def top_k(df: DataFrame, k: int, *order: Column | str) -> DataFrame:
    """Global top-k: per-partition local limit, then a single-partition
    merge of k rows per partition — Spark's sort+limit does exactly
    this (TakeOrderedAndProject), no full global sort."""
    return df.orderBy(*order).limit(k)


def top_k_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order: Sequence[Column],
    k: int,
    rank_col: str = "rk",
) -> DataFrame:
    """Top-k per group via window rank — one shuffle on the group key,
    no cross-group data movement."""
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )


def pivot(
    df: DataFrame,
    group_cols: Sequence[str],
    pivot_col: str,
    values: Sequence[str],
    agg: Column,
) -> DataFrame:
    """Pivot with an explicit value list (never let Spark run the
    distinct-scan job to discover values at 100 TB)."""
    return df.groupBy(*group_cols).pivot(pivot_col, list(values)).agg(agg)


def unpivot(
    df: DataFrame,
    id_cols: Sequence[str],
    value_cols: Sequence[str],
    var_name: str = "variable",
    value_name: str = "value",
) -> DataFrame:
    n = len(value_cols)
    stack_expr = ", ".join(f"'{c}', `{c}`" for c in value_cols)
    return df.selectExpr(
        *id_cols, f"stack({n}, {stack_expr}) as (`{var_name}`, `{value_name}`)"
    )


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum sampling: keep a row iff
    md5(key) mod 100 < rate[stratum]*100. Unlike ``sampleBy`` this is
    reproducible across engines, runs, and partitionings (no RNG
    state), and a narrow codegen projection — no shuffle, no driver
    involvement, so it holds at any scale. md5 (not xxhash64) because
    every engine agrees on it, making sampled outputs auditable
    outside Spark."""
    bucket = (
        F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 100
    )
    rate_pct = None
    for value, rate in rates.items():
        pct = F.lit(int(round(rate * 100)))
        rate_pct = (
            F.when(F.col(strata_col) == value, pct)
            if rate_pct is None
            else rate_pct.when(F.col(strata_col) == value, pct)
        )
    rate_pct = (
        rate_pct.otherwise(F.lit(int(round(default_rate * 100))))
        if rate_pct is not None
        else F.lit(int(round(default_rate * 100)))
    )
    return df.filter(bucket < rate_pct)


def scd2(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    attr_cols: Sequence[str],
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Slowly-changing-dimension type-2 history: collapse consecutive
    runs of identical ``attr_cols`` values per key (ordered by
    ``ts_col`` then ``tiebreak_cols``) into validity intervals
    ``[valid_from, valid_to)``, ``valid_to`` NULL on the current row.

    One shuffle total: the change-flag lag rides a partitionBy(key)
    window, the run-start filter preserves that partitioning, and the
    valid_to lead re-sorts within the same partitions with no new
    exchange."""
    order = [F.col(ts_col), *[F.col(c) for c in tiebreak_cols]]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    changed = F.row_number().over(w) == 1
    for a in attr_cols:
        changed = changed | ~F.lag(F.col(a)).over(w).eqNullSafe(F.col(a))
    starts = df.withColumn("_chg", changed).filter(F.col("_chg"))
    return starts.select(
        *key_cols,
        *attr_cols,
        F.col(ts_col).alias("valid_from"),
        F.lead(F.col(ts_col)).over(
            Window.partitionBy(*key_cols).orderBy(*order)
        ).alias("valid_to"),
    )


def deterministic_group_sample(
    df: DataFrame,
    group_cols: Sequence[str],
    key_col: str,
    k: int,
    rank_col: str = "sample_rank",
    salt_buckets: int = 32,
) -> DataFrame:
    """Per-group deterministic pseudo-uniform sample: rank rows inside
    each group by (md5(key), key) and keep the k smallest. md5 of the
    stringified key is an engine-portable uniform order, so the same
    rows are selected on any engine and any partitioning — unlike
    ``df.sample``/rand(), whose output depends on partition layout and
    so can never be oracle-checked or reproduced across runs.

    Two-phase for low-cardinality groups: a single window partitioned
    by the group key caps parallelism at #groups and funnels every
    group's full row set through one reducer — fatal when a group has
    billions of rows. Phase 1 ranks within (group, salt) — salt =
    hash(key) mod salt_buckets, so #groups x salt_buckets parallel
    partitions, each emitting at most k survivors. Phase 2 re-ranks
    the <= k * salt_buckets survivors per group; the k smallest of the
    per-salt k-smallest are exactly the global k smallest, so the
    result is IDENTICAL to the one-window form (and to the SQL
    oracle), while the final window's input is bounded regardless of
    group size.
    """
    order_key = F.md5(F.col(key_col).cast("string"))
    salt = F.pmod(F.xxhash64(F.col(key_col)), F.lit(salt_buckets))
    w1 = Window.partitionBy(*group_cols, "_salt").orderBy(order_key, F.col(key_col))
    survivors = (
        df.withColumn("_salt", salt)
        .withColumn("_r1", F.row_number().over(w1))
        .where(F.col("_r1") <= k)
        .drop("_r1")
    )
    w2 = Window.partitionBy(*group_cols).orderBy(order_key, F.col(key_col))
    return (
        survivors.withColumn(rank_col, F.row_number().over(w2))
        .where(F.col(rank_col) <= k)
        .drop("_salt")
    )


def dataset_split(
    df: DataFrame,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    split_col: str = "split",
    resolution: int = 1 << 20,
) -> DataFrame:
    """Deterministic train/val/test assignment — the dataset-split step
    of every training pipeline, as a pure map-side projection: each row
    lands in the bucket whose cumulative hash-range contains
    hash60(id) % resolution. No shuffle, no rand() (reproducible across
    runs, engines, and partitionings — adding or removing OTHER rows
    never moves an existing row's split, unlike percent_rank schemes).
    ``fractions`` must be non-empty and sum to 1 (within 1e-6 — the
    last range is then closed exactly at ``resolution`` so every
    residue maps to exactly one split); anything else raises rather
    than silently inflating the final split."""
    from pyspark.sql import functions as F

    from eclipse_spark.functions.scalar import portable_hash60

    if not fractions:
        raise ValueError("dataset_split: fractions must be a non-empty mapping")
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-6:
        raise ValueError(
            f"dataset_split: fractions must sum to 1 (got {total!r}); "
            "rescale them explicitly rather than relying on silent inflation"
        )
    bounds = []
    acc = 0.0
    for name, frac in fractions.items():
        acc += frac
        bounds.append((name, int(acc * resolution)))
    bounds[-1] = (bounds[-1][0], resolution)  # close the last range exactly
    h = F.pmod(portable_hash60(F.md5(F.col(id_col).cast("string")), 0), F.lit(resolution))
    expr = None
    for name, ub in bounds:
        cond = h < F.lit(ub)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    return df.withColumn(split_col, expr)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_payload: Sequence[str] = (),
    direction: str = "backward",
) -> DataFrame:
    """Generalized as-of join (pandas ``merge_asof`` semantics as a
    library operator): for each left row, the right row whose
    timestamp is the latest at-or-before (``backward``), the earliest
    at-or-after (``forward``), or the closest in either direction
    (``nearest``, ties to backward). Emits the left columns plus
    ``asof_ts`` and the requested ``right_payload`` columns.

    Scale shape: ONE key-partitioned window sort over the union of
    both sides — no per-row subquery, no range-explosion join; both
    direction frames reuse the same sort, so 'nearest' costs the same
    single shuffle as either direction. The matched row rides as a
    (ts, payload...) struct under min/max — the struct's leading
    timestamp makes extreme-by-ts selection a plain min/max, and the
    probe/build ordering at equal timestamps keeps both directions
    INCLUSIVE of exact-match rows."""
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction {direction!r}")
    keys = list(on)
    payload = list(right_payload)
    lcols = [c for c in left.columns]
    rstruct = F.struct(
        F.col(right_ts).alias("_t"), *[F.col(c).alias(c) for c in payload]
    )
    build = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("_evt"),
        F.lit(0).alias("_probe"),
        rstruct.alias("_r"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}") for c in lcols],
    )
    probe = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias("_evt"),
        F.lit(1).alias("_probe"),
        F.lit(None).cast(build.schema["_r"].dataType).alias("_r"),
        *[F.col(c).alias(f"_l_{c}") for c in lcols],
    )
    merged = build.unionByName(probe)
    # backward: build rows sort BEFORE probes at equal ts (inclusive);
    # forward: probes sort before builds (inclusive on the other side)
    w_back = (
        Window.partitionBy(*keys)
        .orderBy(F.asc("_evt"), F.asc("_probe"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_fwd = (
        Window.partitionBy(*keys)
        .orderBy(F.asc("_evt"), F.desc("_probe"))
        .rowsBetween(0, Window.unboundedFollowing)
    )
    if direction == "backward":
        matched = F.max("_r").over(w_back)
    elif direction == "forward":
        matched = F.min("_r").over(w_fwd)
    else:
        b, f = F.max("_r").over(w_back), F.min("_r").over(w_fwd)
        # microsecond-precision distances (timestamp->double keeps the
        # fraction; unix_timestamp would truncate to seconds and
        # resolve sub-second ties differently from the oracle)
        db = F.col("_evt").cast("double") - b["_t"].cast("double")
        df_ = f["_t"].cast("double") - F.col("_evt").cast("double")
        matched = (
            F.when(b.isNull(), f)
            .when(f.isNull(), b)
            .when(df_ < db, f)
            .otherwise(b)  # ties -> backward
        )
    out = merged.withColumn("_m", matched).filter(F.col("_probe") == 1)
    return out.select(
        *[F.col(f"_l_{c}").alias(c) for c in lcols],
        F.col("_m._t").alias("asof_ts"),
        *[F.col(f"_m.{c}").alias(f"asof_{c}") for c in payload],
    )


def temporal_join(
    facts: DataFrame,
    dim: DataFrame,
    key_cols: Sequence[str],
    fact_ts_col: str,
    attr_cols: Sequence[str],
    valid_from_col: str = "valid_from",
    valid_to_col: str = "valid_to",
) -> DataFrame:
    """Point-in-time (temporal) join: annotate each fact row with the
    dimension attributes in effect at the fact's timestamp, against an
    SCD2-style interval history ``[valid_from, valid_to)`` (NULL
    valid_to = current) — the warehouse lookup every fact table owes
    its dimensions ("what was this user's status WHEN they bought").

    NOT a range join: because SCD2 intervals tile each key's timeline,
    the containment lookup reduces to an as-of pick — union interval
    STARTS with facts, one (key)-partitioned window sort, each fact
    takes the last preceding start (ties: starts sort before facts at
    the same instant, so a change taking effect at t applies to facts
    at t). A fact landing after its picked interval's ``valid_to``
    (i.e. before the first interval, or in a gap of a non-tiling
    history) gets NULL attrs rather than a stale row. One shuffle
    end-to-end vs the bucketed-explode range join the general
    non-tiling case needs (operators/skew.py's range query shape)."""
    keys = list(key_cols)
    attrs = list(attr_cols)
    d = dim.select(
        *keys,
        F.col(valid_from_col).alias("_t"),
        F.lit(0).alias("_kind"),
        F.struct(
            *[F.col(a).alias(a) for a in attrs],
            F.col(valid_to_col).alias("_vto"),
        ).alias("_dim"),
    )
    f = facts.select(
        *keys,
        F.col(fact_ts_col).alias("_t"),
        F.lit(1).alias("_kind"),
        F.lit(None).cast(d.schema["_dim"].dataType).alias("_dim"),
        F.struct(*[F.col(c) for c in facts.columns]).alias("_fact"),
    )
    u = d.withColumn("_fact", F.lit(None).cast(f.schema["_fact"].dataType)).unionByName(
        f
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy("_t", "_kind")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    picked = (
        u.withColumn("_eff", F.last("_dim", ignorenulls=True).over(w))
        .filter(F.col("_kind") == 1)
        .withColumn(
            "_ok",
            F.col("_eff").isNotNull()
            & (F.col("_eff._vto").isNull() | (F.col("_t") < F.col("_eff._vto"))),
        )
    )
    return picked.select(
        "_fact.*",
        *[
            F.when(F.col("_ok"), F.col(f"_eff.{a}")).alias(f"dim_{a}")
            for a in attrs
        ],
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bucket_width: int,
    max_fanout: int = 4096,
) -> DataFrame:
    """General interval-OVERLAP join (range join): all (left, right)
    row pairs sharing the equi-keys ``on`` whose CLOSED numeric
    intervals ``[l_start, l_end]`` and ``[r_start, r_end]`` overlap
    (``l_start <= r_end AND r_start <= l_end``) — the non-tiling case
    :func:`temporal_join` explicitly does not cover (arbitrary,
    overlapping validity windows: maintenance windows x sessions,
    promo periods x shipments, ad flights x impressions).

    Scale shape — bucketed-explode equi-join, never a theta/cross
    join: each interval explodes to the width-``bucket_width`` buckets
    it touches (``sequence(start div W, end div W)``), the two sides
    equi-join on (keys..., bucket) — a plain hash-shuffle join
    Catalyst/AQE can plan, skew-handle and broadcast — and the true
    overlap predicate filters the bucket-collision candidates. A pair
    overlapping many shared buckets is emitted ONCE with zero
    dedup shuffle: the pair is attributed to exactly the bucket
    containing the overlap's START (``greatest(l_start, r_start)``),
    which both rows provably touch. Interval columns must be integral
    (cast timestamps with ``.cast("long")`` first).

    ``bucket_width`` is the scale lever: fanout per row is
    ``(len div W) + 1``, bucket population is what the join shuffles —
    pick W near the TYPICAL interval length so fanout stays O(1)
    while buckets stay selective. A row longer than ``max_fanout``
    buckets fails the job LOUDLY at run time (plan-embedded check —
    the unbounded explode a mis-picked W would silently launch is the
    scale-killer this guards; the semantic_dedup budget discipline).
    Right-side columns colliding with left names surface with an
    ``_r`` suffix."""
    if bucket_width <= 0:
        raise ValueError(f"bucket_width must be positive, got {bucket_width}")
    if "_bkt" in left.columns or "_bkt" in right.columns:
        raise ValueError(
            "interval_join reserves the column name '_bkt' for its "
            "bucket key; rename the input column"
        )
    keys = list(on)
    lcols = [c for c in left.columns]
    rename = {c: c + "_r" for c in right.columns if c in lcols and c not in keys}
    r = right
    for old, new in rename.items():
        r = r.withColumnRenamed(old, new)
    rs, re = rename.get(r_start, r_start), rename.get(r_end, r_end)

    def buckets(start: str, end: str) -> Column:
        n = (
            F.floor(F.col(end) / bucket_width)
            - F.floor(F.col(start) / bucket_width)
            + 1
        )
        seq = F.sequence(
            F.floor(F.col(start) / bucket_width),
            F.floor(F.col(end) / bucket_width),
        )
        # loud plan-embedded fanout guard: raise_error's NullType
        # coerces to the sequence's array<bigint> inside the when
        return F.when(n <= max_fanout, seq).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        "interval_join: a row spans more than "
                        f"{max_fanout} buckets of width {bucket_width} "
                        "(interval ["
                    ),
                    F.col(start),
                    F.lit(", "),
                    F.col(end),
                    F.lit(
                        "]) — raise bucket_width toward the typical "
                        "interval length or raise max_fanout"
                    ),
                )
            ).cast("array<bigint>")
        )

    le = left.withColumn("_bkt", F.explode(buckets(l_start, l_end)))
    re_ = r.withColumn("_bkt", F.explode(buckets(rs, re)))
    joined = le.join(re_, [*keys, "_bkt"])
    attributed = joined.filter(
        (F.col(l_start) <= F.col(re))
        & (F.col(rs) <= F.col(l_end))
        & (
            F.col("_bkt")
            == F.floor(F.greatest(F.col(l_start), F.col(rs)) / bucket_width)
        )
    )
    return attributed.drop("_bkt")


def dense_index(
    df: DataFrame,
    order_cols: Sequence[str],
    out_col: str = "idx",
    num_partitions: int | None = None,
) -> DataFrame:
    """Contiguous global index 0..n-1 by ``order_cols`` order WITHOUT a
    single-partition global sort — the scalable zipWithIndex: range
    partitioning puts each partition's keys strictly before the
    next's, a P-row offset table (per-partition counts, cumulative
    over the tiny partition-id window) broadcasts back, and
    row_number runs WITHIN each partition in parallel. The classic
    two-pass dense-ranking shape: at 100 TB the heaviest step is the
    range shuffle, never a one-executor sort.

    ``order_cols`` must be a total order (include a unique tiebreak) —
    equal keys land in one range partition, so the assignment is
    well-defined, and the resulting index is INVARIANT to how the
    sampler happens to place partition boundaries. This is the
    at-scale replacement for the global-window indexing documented as
    a bottleneck in text.negative_samples / equidepth_histogram.

    The ranged DataFrame feeds TWO subtrees (the per-pid offset table
    and the final row_number join), and its ``_pid`` values depend on
    the range sampler's boundary draw — so it is lazily ``persist()``ed
    to pin ONE materialization of the range shuffle. Without it,
    correctness would rest on Catalyst exchange reuse: if the two
    executions re-sampled different boundaries (reuse disabled, AQE
    re-plan, executor-loss recompute), offsets would join against
    mismatched _pid values and indices would duplicate/skip. Same
    multi-consumer discipline as graph.clustering_coefficient."""
    cols = [F.col(c) for c in order_cols]
    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = (
        df.repartitionByRange(parts, *cols)
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    counts = ranged.groupBy("_pid").agg(F.count("*").alias("_n"))
    woff = Window.orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, -1
    )  # P rows only — the tiny table is the single-partition window
    offsets = counts.withColumn(
        "_off", F.coalesce(F.sum("_n").over(woff), F.lit(0))
    ).select("_pid", "_off")
    win = Window.partitionBy("_pid").orderBy(*cols)
    return (
        ranged.join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, (F.row_number().over(win) - 1 + F.col("_off")).cast("long"))
        .drop("_pid", "_off")
    )


def serpentine_shards(
    df: DataFrame,
    weight_col: str,
    n_shards: int,
    tiebreak: Sequence[str],
    out_col: str = "shard",
) -> DataFrame:
    """Weight-balanced shard assignment for training-data export:
    rank rows by ``weight_col`` DESC (ties broken by ``tiebreak``),
    then deal them out serpentine (boustrophedon): with
    ``r = rank % (2*n_shards)``, shard = ``r`` on the forward pass and
    ``2*n_shards - 1 - r`` on the return pass. Heavy rows spread
    first and each shard's k-th pick alternates big/small, so shard
    weight totals track each other closely — the deterministic,
    fully-parallel stand-in for first-fit-decreasing bin packing
    (which is a sequential fold no shared-nothing engine should run).
    The export step every tokenized-corpus writer needs: N balanced
    output files with no shard hot-spotting the downstream loader.

    Scale shape: the global rank comes from :func:`dense_index` (range
    partition + broadcast offsets — NO single-partition sort); the
    serpentine map is row-local codegen. Adds ``out_col`` (long).
    Total order required: ``tiebreak`` must make (weight, *tiebreak)
    unique, same contract as dense_index."""
    neg = "_negw"
    ranked = dense_index(
        df.withColumn(neg, -F.col(weight_col)),
        [neg, *tiebreak],
        out_col="_rk",
    )
    period = 2 * n_shards
    r = F.col("_rk") % period
    return ranked.withColumn(
        out_col,
        F.when(r < n_shards, r).otherwise(period - 1 - r).cast("long"),
    ).drop(neg, "_rk")


def pps_systematic_sample(
    df: DataFrame,
    weight_col: str,
    n_samples: int,
    order_cols: Sequence[str],
    weight_scale: int = 100,
) -> DataFrame:
    """Probability-proportional-to-size SYSTEMATIC sampling, exactly
    and deterministically: scale weights to integers (default cents),
    lay items on the cumulative-weight line in ``order_cols`` order,
    and select every item whose interval contains a grid point
    ``k*W/n`` (k = 1..n) — the survey-statistics PPS design, with the
    grid-point count per item computed as
    ``floor(cw*n/W) - floor(cw_prev*n/W)`` in pure integer division
    (no float, no rand(); same corpus + order -> same sample in any
    engine, and items heavier than the stride win multiple hits,
    exactly as PPS prescribes). Output: the selected rows plus
    ``weight_scaled`` and ``n_hits`` (>= 1); hit counts sum to n.

    Plan: one decimal-exact cumulative window over the total order
    (at 100 TB lift it to the two-pass per-partition-offset shape of
    :func:`dense_index`) + a broadcast 1-row total. Integer headroom:
    ``W * n`` must fit a long (~9e18); lift to decimal(38,0) beyond."""
    cols = [F.col(c) for c in order_cols]
    w_int = F.round(
        F.col(weight_col).cast("decimal(18,2)") * F.lit(weight_scale)
    ).cast("long")
    base = df.withColumn("weight_scaled", w_int)
    tot = base.agg(F.sum("weight_scaled").alias("_W"))
    win = Window.orderBy(*cols).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = base.withColumn("_cw", F.sum("weight_scaled").over(win)).crossJoin(
        F.broadcast(tot)
    )
    n = F.lit(int(n_samples))
    hits = F.expr(f"_cw * {int(n_samples)} div _W") - F.expr(
        f"(_cw - weight_scaled) * {int(n_samples)} div _W"
    )
    _ = n
    return (
        cum.withColumn("n_hits", hits.cast("long"))
        .filter(F.col("n_hits") >= 1)
        .drop("_cw", "_W")
    )
