"""Time-series feature operators over event streams.

The reference has no time-series surface (events are lines to map
over); these are the standard feature/exploration steps an analytics
engine owes an events table: exponentially-weighted smoothing, session
path mining, and equi-depth value histograms. All three are pure
DataFrame plans; determinism follows the repo's oracle discipline
(decimal term sums, explicit tie-breaks, no engine-streaming
aggregates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "ewma",
    "session_paths",
    "equidepth_histogram",
    "mad_outliers",
    "rolling_corr",
    "activity_islands",
    "interpolate_linear",
    "last_touch_attribution",
    "winsorize",
    "rolling_distinct",
    "quantile_normalize",
    "transition_matrix",
    "gini_coefficient",
    "time_weighted_avg",
    "ohlc_bars",
    "vwap_bars",
    "max_drawdown",
]


def ewma(
    df: DataFrame,
    partition_by: list[str],
    order_by: list[str],
    value_col: str = "value",
    alpha: float = 0.5,
    window: int = 8,
) -> DataFrame:
    """Exponentially-weighted moving average over a BOUNDED history of
    ``window`` rows: ``ewma_t = sum_i w_i x_{t-i} / sum_i w_i`` with
    ``w_i = alpha (1-alpha)^i`` over the present lags (heads of a
    partition renormalize over the lags that exist, so the first row's
    ewma is its own value).

    The unbounded recursive EWMA is a sequential fold — the one shape
    a shared-nothing engine cannot parallelize without a prefix-scan;
    bounding the history at ``window`` rows keeps >99.6% of the mass
    at alpha=0.5 and turns the operator into ``window`` lag columns
    over ONE partitioned sort — embarrassingly parallel at any scale.
    Each weighted term rounds to ``window + 2`` digits and accumulates
    in decimal, so the result is partition-order- and engine-exact:
    at alpha=0.5 the weights are exact binary fractions with at most
    ``window`` decimal digits, so a 2-decimal value times any weight
    is exactly representable at that width and the rounding can never
    land on a half-way case where engines' HALF_UP/HALF_EVEN modes
    diverge (rounding at fewer digits does hit those boundaries —
    measured 1.23% divergence vs DuckDB at 9 digits with window=8).
    Adds an ``ewma`` column."""
    digits = window + 2
    dec = f"decimal({digits + 10},{digits})"
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    num = F.lit(0).cast(dec)
    den = F.lit(0).cast(dec)
    for i in range(window):
        wi = alpha * (1 - alpha) ** i
        xi = F.col(value_col) if i == 0 else F.lag(value_col, i).over(w)
        num = num + F.when(
            xi.isNotNull(),
            F.round(xi * F.lit(wi), digits).cast(dec),
        ).otherwise(F.lit(0).cast(dec))
        den = den + F.when(
            xi.isNotNull(), F.lit(wi).cast(dec)
        ).otherwise(F.lit(0).cast(dec))
    return df.withColumn(
        "ewma", (num.cast("double") / den.cast("double"))
    )


def session_paths(
    df: DataFrame,
    gap_seconds: int = 1800,
    max_len: int = 5,
    k: int = 20,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Top-``k`` session journey paths: sessionize on a ``gap_seconds``
    inactivity gap, render each session's first ``max_len`` event
    types as a ``a>b>c`` path, count sessions per path, rank.
    The product-analytics 'user flows' query.

    Scale shape: one (user)-keyed window sort for sessionization, one
    (user, session) aggregate whose ordered path assembly is a
    row-local ``array_sort(collect_list(struct(ts, id, type)))`` —
    bounded by session length, never a second window — and one
    path-keyed count; the final top-k lowers to TakeOrdered. Ordering
    ties break (ts, event_id), so paths are engine-exact.
    Returns (path, n_sessions, rank)."""
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    new_sess = F.when(
        F.lag(ts_col).over(w).isNull()
        | (
            F.unix_timestamp(F.col(ts_col))
            - F.unix_timestamp(F.lag(ts_col).over(w))
            > gap_seconds
        ),
        1,
    ).otherwise(0)
    sessed = df.withColumn("_new", new_sess).withColumn(
        "_sess",
        F.sum("_new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    paths = sessed.groupBy(user_col, "_sess").agg(
        F.concat_ws(
            ">",
            F.slice(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.col(ts_col).alias("t"),
                                F.col(id_col).alias("i"),
                                F.col(type_col).alias("e"),
                            )
                        )
                    ),
                    lambda s: s.e,
                ),
                1,
                max_len,
            ),
        ).alias("path")
    )
    counted = paths.groupBy("path").agg(F.count("*").alias("n_sessions"))
    top = counted.orderBy(F.desc("n_sessions"), F.asc("path")).limit(k)
    wr = Window.orderBy(F.desc("n_sessions"), F.asc("path"))
    return top.withColumn("rank", F.row_number().over(wr))


def equidepth_histogram(
    df: DataFrame,
    col: str,
    buckets: int = 8,
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Exact equi-depth histogram: ``buckets`` bins with (near-)equal
    row counts, each reporting its min/max/count — the value-skew
    profile an optimizer or quality gate reads (equi-WIDTH histograms
    collapse under heavy tails; equi-depth puts the resolution where
    the data is).

    Exactness requires a global rank (ntile over one totally-ordered
    window) — fine up to the ~10^8-row profile inputs this is meant
    for, but a deliberately single-partition sort, NOT a 100 TB shape;
    at full scale feed ``approx_quantile`` boundaries to a map-side
    bucketizer instead and accept the sketch error. Ties in ``col``
    break on ``tiebreak`` so bucket membership is engine-exact.
    Returns (bucket, n_rows, min_val, max_val)."""
    order = [F.asc(col)] + [F.asc(c) for c in (tiebreak or [])]
    w = Window.orderBy(*order)
    return (
        df.withColumn("bucket", F.ntile(buckets).over(w))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_rows"),
            F.min(col).alias("min_val"),
            F.max(col).alias("max_val"),
        )
    )


def mad_outliers(
    df: DataFrame,
    group_col: str,
    value_col: str = "value",
    k: float = 3.0,
) -> DataFrame:
    """Robust per-group outlier stats: median, median-absolute-
    deviation, and the count of points with ``|x - median| > k*MAD``
    — the heavy-tail-safe alternative to z-scores (one wild point
    inflates a stddev and hides itself; it cannot move a median).

    Scale shape: two grouped exact-percentile aggregates (full sort
    per group — at 100 TB swap ``percentile`` for the mergeable
    ``approx_percentile`` sketch, same plan otherwise) with the tiny
    per-group stats table broadcast back both times. All comparisons
    are deterministic IEEE on identically-computed doubles.
    Returns (group, med, mad, n_outliers)."""
    med = df.groupBy(group_col).agg(
        F.expr(f"percentile({value_col}, 0.5)").alias("med")
    )
    dev = df.join(F.broadcast(med), group_col).withColumn(
        "_dev", F.abs(F.col(value_col) - F.col("med"))
    )
    stats = dev.groupBy(group_col).agg(
        F.min("med").alias("med"),
        F.expr("percentile(_dev, 0.5)").alias("mad"),
    )
    outl = (
        dev.join(F.broadcast(stats.select(group_col, "mad")), group_col)
        .filter(F.col("_dev") > F.lit(k) * F.col("mad"))
        .groupBy(group_col)
        .agg(F.count("*").alias("_n_out"))
    )
    return stats.join(outl, on=group_col, how="left").select(
        group_col,
        "med",
        "mad",
        F.coalesce("_n_out", F.lit(0)).cast("long").alias("n_outliers"),
    )


def rolling_corr(
    df: DataFrame,
    time_col: str,
    x_col: str,
    y_col: str,
    window: int = 24,
    partition_by: list[str] | None = None,
) -> DataFrame:
    """Rolling Pearson correlation between two aligned series over a
    trailing ``window``-row frame — the co-movement diagnostic of a
    metrics pipeline (do purchases track clicks this day?). Computed
    from the five windowed moment sums (n, Σx, Σy, Σxy, Σx², Σy²)
    with every product accumulated in DECIMAL, so unlike the engines'
    streaming ``corr`` aggregate the result is partition-order- and
    engine-exact; the final formula runs in IEEE double and rounds to
    9. Frames with undefined correlation (zero variance, n < 2) yield
    NULL rather than NaN. One window sort; the moment sums share the
    frame. Adds ``n_obs`` and ``corr`` columns."""
    part = partition_by or []
    w = (
        Window.partitionBy(*part)
        .orderBy(time_col)
        .rowsBetween(-(window - 1), Window.currentRow)
    )
    dx = F.col(x_col).cast("decimal(18,2)")
    dy = F.col(y_col).cast("decimal(18,2)")
    n = F.count(F.lit(1)).over(w)
    sx = F.sum(dx).over(w)
    sy = F.sum(dy).over(w)
    sxy = F.sum(dx * dy).over(w)
    sxx = F.sum(dx * dx).over(w)
    syy = F.sum(dy * dy).over(w)
    nn = n.cast("double")
    cov = nn * sxy.cast("double") - sx.cast("double") * sy.cast("double")
    vx = nn * sxx.cast("double") - sx.cast("double") * sx.cast("double")
    vy = nn * syy.cast("double") - sy.cast("double") * sy.cast("double")
    corr = F.when(
        (n >= 2) & (vx > 0) & (vy > 0),
        F.round(cov / F.sqrt(vx * vy), 9),
    )
    return df.withColumn("n_obs", n.cast("long")).withColumn("corr", corr)


def activity_islands(
    df: DataFrame,
    key_col: str,
    day_col: str,
) -> DataFrame:
    """Gaps-and-islands: collapse each key's set of active DAYS into
    maximal runs of consecutive days and report, per key, the number
    of islands, the longest streak, and total active days — the
    engagement-streak primitive of product analytics (and a shape SQL
    engines canonically solve with the row_number-difference trick,
    which is exactly what this emits so the plan is two window sorts
    on the same key partition, no self-join).

    ``day - row_number`` is constant within a run of consecutive days
    (both advance by 1), so grouping on that anchor identifies the
    island; everything after the distinct-day dedup is per-key window
    arithmetic + one aggregate. Scale: one (key) shuffle carries only
    (key, date) pairs."""
    days = df.select(
        F.col(key_col).alias("key"), F.col(day_col).cast("date").alias("day")
    ).distinct()
    w = Window.partitionBy("key").orderBy("day")
    anchored = days.withColumn(
        "anchor", F.date_sub(F.col("day"), F.row_number().over(w))
    )
    islands = anchored.groupBy("key", "anchor").agg(
        F.count("*").alias("len"),
        F.min("day").alias("island_start"),
        F.max("day").alias("island_end"),
    )
    return islands.groupBy("key").agg(
        F.count("*").cast("long").alias("n_islands"),
        F.max("len").cast("long").alias("longest_streak"),
        F.sum("len").cast("long").alias("active_days"),
        F.min("island_start").alias("first_day"),
        F.max("island_end").alias("last_day"),
    )


def interpolate_linear(
    df: DataFrame,
    time_col: str,
    value_col: str,
    step_seconds: int = 3600,
    partition_by: list[str] | None = None,
) -> DataFrame:
    """Fill a sparse regular time series onto its full grid with
    LINEAR interpolation between the surrounding observed points —
    the gap-repair step before any rolling/seasonal computation
    (sensor dropouts, hours with no events). Emits one row per grid
    step between each partition's min and max observed time:
    ``value`` (observed or interpolated), ``filled`` flag.

    Plan shape: per-partition min/max aggregate -> ``sequence()``
    explode builds the grid WITHOUT a driver loop or a range join ->
    left join observations on the grid instant -> two IGNORE-NULLS
    window passes (last known before, first known after) give the
    bracketing points as (ts, value) structs -> pure arithmetic. Both
    window passes reuse one (partition, time) sort order. The grid
    explode is the only row inflation: max_gap/step rows per gap,
    generated executor-side.

    Interpolation arithmetic runs in IEEE double with one final
    round-9 — identical expression order in any engine; boundary
    rows outside the observed range stay NULL."""
    part = partition_by or []
    obs = df.select(
        *part,
        F.col(time_col).cast("timestamp").alias("t"),
        F.col(value_col).cast("double").alias("v"),
    )
    span = obs.groupBy(*part).agg(F.min("t").alias("t0"), F.max("t").alias("t1"))
    grid = span.select(
        *part,
        F.explode(
            F.sequence(
                F.col("t0"),
                F.col("t1"),
                F.expr(f"INTERVAL {int(step_seconds)} SECONDS"),
            )
        ).alias("t"),
    )
    joined = grid.join(obs, on=[*part, "t"], how="left")
    w = Window.partitionBy(*part).orderBy("t")
    wb = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wf = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    point = F.when(F.col("v").isNotNull(), F.struct(F.col("t"), F.col("v")))
    prev = F.last(point, ignorenulls=True).over(wb)
    nxt = F.first(point, ignorenulls=True).over(wf)
    frac = (
        F.unix_timestamp(F.col("t")) - F.unix_timestamp(prev["t"])
    ).cast("double") / (
        F.unix_timestamp(nxt["t"]) - F.unix_timestamp(prev["t"])
    ).cast("double")
    interp = F.when(F.col("v").isNotNull(), F.col("v")).otherwise(
        F.when(
            prev.isNotNull() & nxt.isNotNull(),
            F.round(prev["v"] + (nxt["v"] - prev["v"]) * frac, 9),
        )
    )
    return joined.select(
        *part,
        F.col("t").alias(time_col),
        interp.alias(value_col),
        F.col("v").isNull().alias("filled"),
    )


def last_touch_attribution(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
    conversion: str = "purchase",
    touch_types: tuple[str, ...] = ("click", "view", "signup"),
    lookback_hours: float = 168,
) -> DataFrame:
    """Marketing-style LAST-TOUCH attribution: credit each conversion
    event's value to the most recent qualifying touch event by the
    same user within ``lookback_hours``; conversions with no touch in
    the window fall into the ``(direct)`` channel. Output: revenue and
    conversion counts per attributed channel.

    This is a point-in-time join (the as-of family) expressed as ONE
    window pass instead of a join: union touches and conversions are
    already interleaved per user in time order, so ``last(touch,
    ignorenulls)`` over (user) ORDER BY (ts, tiebreak) finds the
    preceding touch without shuffling the two sides separately —
    one (user) shuffle total, then a small channel aggregate.
    Value sums accumulate in decimal (engine-exact)."""
    typed = events.select(
        F.col(user_col).alias("u"),
        F.col(ts_col).cast("timestamp").alias("t"),
        F.col(type_col).alias("et"),
        F.col(value_col).alias("val"),
    )
    # touches sort BEFORE a conversion at the same instant (kind 0 < 1)
    kinded = typed.withColumn(
        "kind", F.when(F.col("et") == conversion, F.lit(1)).otherwise(F.lit(0))
    ).filter(F.col("et").isin(conversion, *touch_types))
    w = (
        Window.partitionBy("u")
        .orderBy("t", "kind", "et")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.when(
        F.col("kind") == 0, F.struct(F.col("t").alias("tt"), F.col("et").alias("ch"))
    )
    attributed = (
        kinded.withColumn("prev_touch", F.last(touch, ignorenulls=True).over(w))
        .filter(F.col("kind") == 1)
        .withColumn(
            "channel",
            F.when(
                F.col("prev_touch").isNotNull()
                & (
                    F.col("t").cast("long") - F.col("prev_touch.tt").cast("long")
                    # int() AFTER the multiply: a fractional-hour
                    # lookback must not truncate to zero hours
                    <= F.lit(int(lookback_hours * 3600))
                ),
                F.col("prev_touch.ch"),
            ).otherwise(F.lit("(direct)")),
        )
    )
    return attributed.groupBy("channel").agg(
        F.count("*").cast("long").alias("n_conversions"),
        F.sum(F.col("val").cast("decimal(18,2)")).cast("double").alias("revenue"),
    )


def winsorize(
    df: DataFrame,
    value_col: str,
    partition_by: list[str] | None = None,
    lower: float = 0.05,
    upper: float = 0.95,
) -> DataFrame:
    """Winsorize: clip ``value_col`` into its per-group exact
    interpolated [lower, upper] percentile band — the robust-scaling
    step before any mean/variance-based feature (one wild sensor value
    stops dominating a z-score without dropping the row). Adds
    ``lo_bound``/``hi_bound``/``value_w`` columns.

    Exact percentiles (Spark ``percentile`` == DuckDB
    ``quantile_cont``) in a per-group aggregate, broadcast back, then
    a codegen clip — the clipped value is either the stored value
    (exact) or the bound (computed once per group). At 100 TB the
    per-group aggregate's full sort is the cost; swap in
    approx_percentile for the sketch path when groups are huge."""
    part = partition_by or []
    pct = F.expr(f"percentile({value_col}, array({lower}, {upper}))")
    bounds = (
        df.groupBy(*part).agg(pct[0].alias("lo_bound"), pct[1].alias("hi_bound"))
        if part
        else df.agg(pct[0].alias("lo_bound"), pct[1].alias("hi_bound"))
    )
    joined = (
        df.join(F.broadcast(bounds), on=part)
        if part
        else df.crossJoin(F.broadcast(bounds))
    )
    clipped = F.least(
        F.greatest(F.col(value_col).cast("double"), F.col("lo_bound")),
        F.col("hi_bound"),
    )
    return joined.withColumn("value_w", clipped)


def rolling_distinct(
    df: DataFrame,
    time_col: str,
    key_col: str,
    window: int = 24,
    step: str = "hour",
) -> DataFrame:
    """EXACT distinct-key count over a trailing window of ``window``
    time steps (e.g. 24h rolling distinct users per hour) — the
    engagement metric HLL sketches usually approximate, computed
    exactly: per-step distinct key arrays, then one ordered window
    whose frame flattens and re-distincts the last ``window`` arrays
    in codegen (``flatten`` + ``array_distinct`` — no Python, no
    shuffle beyond the per-step aggregate + one global window over
    #steps rows).

    Scale envelope: rows after the first aggregate = #time-steps; each
    carries that step's distinct-key array, and a frame holds at most
    ``window`` of them in memory at once — exact is affordable while
    (per-step distinct keys x window) fits an executor (e.g. 1M keys
    x 24h). Beyond that, the HLL partial-merge path
    (approx_count_distinct over the same frame) is the documented
    fallback; this operator is the exact tier."""
    step_iv = {"hour": "INTERVAL 1 HOUR", "day": "INTERVAL 1 DAY"}[step]
    per_step = (
        df.select(
            F.date_trunc(step, F.col(time_col).cast("timestamp")).alias("t"),
            F.col(key_col).alias("k"),
        )
        .groupBy("t")
        .agg(F.collect_set("k").alias("keys"), F.count_distinct("k").alias("step_distinct"))
    )
    # dense step grid: a ROWS frame over observed steps would silently
    # widen across empty steps (last 24 OBSERVED hours != last 24
    # hours); materializing every step keeps frame = wall-clock window
    span = per_step.agg(F.min("t").alias("t0"), F.max("t").alias("t1"))
    grid = span.select(
        F.explode(F.sequence(F.col("t0"), F.col("t1"), F.expr(step_iv))).alias("t")
    )
    # no coalesce on `keys`: collect_list skips NULL entries, so empty
    # steps simply contribute nothing to the flattened frame
    dense = grid.join(per_step, "t", "left").select(
        "t",
        "keys",
        F.coalesce(F.col("step_distinct"), F.lit(0)).alias("step_distinct"),
    )
    w = Window.orderBy("t").rowsBetween(-(window - 1), Window.currentRow)
    return dense.select(
        "t",
        F.col("step_distinct").cast("long").alias("step_distinct"),
        F.size(F.array_distinct(F.flatten(F.collect_list("keys").over(w))))
        .cast("long")
        .alias("rolling_distinct"),
    )


def quantile_normalize(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Quantile normalization across groups: each group's value
    distribution is mapped onto the POOLED distribution (every value
    is replaced by the pooled quantile at its within-group rank) — the
    batch-effect correction of mixed-source corpora (one source's
    systematically inflated scores stop dominating a global threshold,
    while within-source ordering is preserved exactly).

    Exact and engine-deterministic: within-group position p =
    (rank-1)/(n_g-1) maps to pooled index 1 + p*(N-1); the bracketing
    pooled order statistics come from TWO integer row_number joins
    (floor and ceil index), and the final linear interpolation is one
    fixed-order IEEE expression rounded at 9. Rank ties break on the
    full sort order of (value, tiebreak implicit by row_number over
    value) so both engines agree. Plan: one (group) window, one global
    pooled sort (the inherent total-order cost — pre-bin at 100 TB),
    two integer equi-joins. Singleton groups map to the pooled
    minimum (p = 0 by convention). Adds ``value_qn``."""
    g = df.select(F.col(group_col).alias("_g"), F.col(value_col).alias("_v"))
    wg = Window.partitionBy("_g").orderBy("_v")
    ranked = g.withColumn("_r", F.row_number().over(wg)).withColumn(
        "_ng", F.count("*").over(Window.partitionBy("_g"))
    )
    pooled = (
        g.select("_v")
        .withColumn("_pr", F.row_number().over(Window.orderBy("_v")))
    )
    n_pool = pooled.agg(F.count("*").alias("_np"))
    # pooled index arithmetic kept integer: scaled position in 1e6ths
    # avoids float index math entirely — pos = 1 + (r-1)*(N-1)/(ng-1)
    # computed as integer floor + exact fractional remainder
    with_pos = ranked.crossJoin(F.broadcast(n_pool)).select(
        "_g",
        "_v",
        "_r",
        "_ng",
        "_np",
        F.when(F.col("_ng") > 1,
               (F.col("_r") - 1) * (F.col("_np") - 1)).otherwise(F.lit(0)).alias("_num"),
        F.when(F.col("_ng") > 1, F.col("_ng") - 1).otherwise(F.lit(1)).alias("_den"),
    ).select(
        "_g",
        "_v",
        (F.lit(1) + F.expr("_num div _den")).alias("_lo_idx"),
        F.expr("_num % _den").alias("_rem"),
        "_den",
    )
    lo = pooled.select(F.col("_pr").alias("_lo_idx"), F.col("_v").alias("_lo_v"))
    hi = pooled.select(F.col("_pr").alias("_hi_idx"), F.col("_v").alias("_hi_v"))
    out = (
        with_pos.withColumn(
            "_hi_idx",
            F.when(F.col("_rem") > 0, F.col("_lo_idx") + 1).otherwise(F.col("_lo_idx")),
        )
        .join(lo, "_lo_idx")
        .join(hi, "_hi_idx")
        .withColumn(
            "value_qn",
            F.round(
                F.col("_lo_v")
                + (F.col("_hi_v") - F.col("_lo_v"))
                * (F.col("_rem").cast("double") / F.col("_den").cast("double")),
                9,
            ),
        )
    )
    return out.select(
        F.col("_g").alias(group_col),
        F.col("_v").alias(value_col),
        "value_qn",
    )


def transition_matrix(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    state_col: str,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """First-order Markov transition counts and probabilities between
    consecutive states per key (the user-journey transition matrix:
    "after a view, how often does a purchase follow?"). One
    key-partitioned window sort for the lag, one (from, to) count,
    one broadcast-joined row total; the probability is a single
    integer-ratio division rounded at 9. Ties in ``ts_col`` break on
    ``tiebreak_cols`` so the chain is engine-deterministic.
    Returns (from_state, to_state, n, p)."""
    order = [F.col(ts_col)] + [F.col(c) for c in (tiebreak_cols or [])]
    w = Window.partitionBy(key_col).orderBy(*order)
    pairs = (
        df.withColumn("_prev", F.lag(state_col).over(w))
        .filter(F.col("_prev").isNotNull())
        .select(F.col("_prev").alias("from_state"), F.col(state_col).alias("to_state"))
    )
    counts = pairs.groupBy("from_state", "to_state").agg(F.count("*").alias("n"))
    totals = counts.groupBy("from_state").agg(F.sum("n").alias("row_total"))
    return (
        counts.join(F.broadcast(totals), "from_state")
        .select(
            "from_state",
            "to_state",
            F.col("n").cast("long").alias("n"),
            F.round(
                F.col("n").cast("double") / F.col("row_total").cast("double"), 9
            ).alias("p"),
        )
    )


def gini_coefficient(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Exact per-group Gini coefficient of a non-negative value
    distribution — the inequality screen of corpus accounting (is 90%
    of revenue / token mass concentrated in 1% of users/docs?). Uses
    the rank formulation ``G = 2*sum(i*x_i)/(n*sum(x)) - (n+1)/n``
    over ascending-sorted values: one (group)-partitioned window sort
    for the rank, decimal-exact moment sums (sum x, sum i*x), and a
    single fixed-order float expression rounded at 9 — the engines
    agree to the last digit. Ties order arbitrarily WITHIN an equal
    value, which cannot change either sum (equal x share any rank
    permutation's total). Returns (group, n, total, gini); n < 2 or
    zero total yield NULL gini."""
    ranked = df.select(
        F.col(group_col).alias("_g"), F.col(value_col).alias("_v")
    ).withColumn("_i", F.row_number().over(Window.partitionBy("_g").orderBy("_v")))
    g = ranked.groupBy("_g").agg(
        F.count("*").alias("n"),
        F.sum(F.col("_v").cast("decimal(18,2)")).alias("sx"),
        F.sum(F.col("_i") * F.col("_v").cast("decimal(18,2)")).alias("six"),
    )
    nn = F.col("n").cast("double")
    gini = F.when(
        (F.col("n") >= 2) & (F.col("sx").cast("double") > 0),
        F.round(
            F.lit(2.0) * F.col("six").cast("double")
            / (nn * F.col("sx").cast("double"))
            - (nn + F.lit(1.0)) / nn,
            9,
        ),
    )
    return g.select(
        F.col("_g").alias(group_col),
        F.col("n").cast("long").alias("n"),
        F.col("sx").cast("double").alias("total"),
        gini.alias("gini"),
    )


def time_weighted_avg(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
) -> DataFrame:
    """Time-weighted average over irregular observations: each value
    holds until the next observation, so the mean is
    ``sum(v_i * dt_i) / sum(dt_i)`` — the correct summary for sampled
    state (a sensor reading 99% of the time at 10 and briefly at 1000
    should NOT average like equal-weight points). Per key: one window
    lead for the holding interval (integer seconds), decimal-exact
    weighted sums, one final division. The last observation of a key
    has no interval and drops out (standard left-closed convention).
    Returns (key, n_intervals, total_seconds, twa)."""
    w = Window.partitionBy(key_col).orderBy(ts_col)
    iv = (
        df.select(
            F.col(key_col).alias("_k"),
            F.col(ts_col).cast("timestamp").alias("_t"),
            F.col(value_col).cast("decimal(18,2)").alias("_v"),
        )
        .withColumn("_next", F.lead("_t").over(Window.partitionBy("_k").orderBy("_t")))
        .filter(F.col("_next").isNotNull())
        .withColumn(
            "_dt", (F.col("_next").cast("long") - F.col("_t").cast("long"))
        )
    )
    _ = w
    g = iv.groupBy("_k").agg(
        F.count("*").cast("long").alias("n_intervals"),
        F.sum("_dt").cast("long").alias("total_seconds"),
        F.sum(F.col("_v") * F.col("_dt")).alias("_wsum"),
    )
    return g.select(
        F.col("_k").alias(key_col),
        "n_intervals",
        "total_seconds",
        F.when(
            F.col("total_seconds") > 0,
            F.round(
                F.col("_wsum").cast("double") / F.col("total_seconds").cast("double"),
                9,
            ),
        ).alias("twa"),
    )


def ohlc_bars(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    bucket: str = "1 hour",
) -> DataFrame:
    """Downsample a tick stream into OHLC bars per (key, time bucket) —
    open/high/low/close plus count and decimal volume, the classic
    resample that turns 10^12 raw ticks into chartable bars. Open and
    close use ``min_by``/``max_by`` keyed on a (ts, id) struct, so ties
    at the same timestamp break on the row id deterministically in any
    engine (a bare first/last over an unordered aggregate would be
    partition-order-dependent — silently nondeterministic at scale).

    Scale shape: ONE map-side-combined aggregate on (key, bucket);
    min_by/max_by are mergeable (each partial keeps its best struct),
    so this is a single shuffle sized by the bar count, never the tick
    count. Returns (key, bar_start, open, high, low, close, n_ticks,
    volume as double)."""
    order = F.struct(F.col(ts_col), F.col(id_col))
    v = F.col(value_col)
    return (
        df.groupBy(
            F.col(key_col),
            F.window(F.col(ts_col), bucket).start.alias("bar_start"),
        )
        .agg(
            F.min_by(v, order).alias("open"),
            F.max(v).alias("high"),
            F.min(v).alias("low"),
            F.max_by(v, order).alias("close"),
            F.count("*").cast("long").alias("n_ticks"),
            F.sum(v.cast("decimal(28,6)")).alias("volume"),
        )
        .select(
            key_col,
            "bar_start",
            "open",
            "high",
            "low",
            "close",
            "n_ticks",
            F.col("volume").cast("double").alias("volume"),
        )
    )


def vwap_bars(
    df: DataFrame,
    key_col: str = "l_partkey",
    ts_col: str = "l_shipdate",
    price_col: str = "l_extendedprice",
    qty_col: str = "l_quantity",
    bucket: str = "7 days",
) -> DataFrame:
    """Volume-weighted average price per (key, time bucket) — the
    weighted companion to :func:`ohlc_bars` (plain OHLC ignores trade
    size; execution-quality and fair-value analyses need the
    volume-weighted mean). vwap = sum(price*qty) / sum(qty), with both
    sums accumulated in decimal so the per-bar totals are order-free
    exact in any engine; the final ratio is one double division of two
    exactly-agreed values.

    Scale shape: identical to ohlc_bars — ONE map-side-combined
    aggregate on (key, bucket); sums are mergeable partials, so the
    single shuffle is sized by the bar count, never the tick count.
    Returns (key, bar_start, n_trades, total_qty, notional, vwap)."""
    pv = F.col(price_col).cast("decimal(18,2)") * F.col(qty_col).cast(
        "decimal(18,2)"
    )
    return (
        df.groupBy(
            F.col(key_col),
            F.window(F.col(ts_col), bucket).start.alias("bar_start"),
        )
        .agg(
            F.count("*").cast("long").alias("n_trades"),
            F.sum(F.col(qty_col).cast("decimal(18,2)")).alias("_q"),
            F.sum(pv).alias("_pv"),
        )
        .select(
            key_col,
            "bar_start",
            "n_trades",
            F.col("_q").cast("double").alias("total_qty"),
            F.col("_pv").cast("double").alias("notional"),
            (F.col("_pv").cast("double") / F.col("_q").cast("double")).alias(
                "vwap"
            ),
        )
    )


def max_drawdown(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    val_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Maximum drawdown of each key's cumulative value series: running
    equity = cumulative sum of ``val_col`` in (ts, id) order, running
    peak = cumulative max of equity, drawdown = peak - equity; report
    each key's worst (largest) drawdown with its final equity — the
    classic risk statistic, and the canonical nested-cumulative window
    pattern (a cummax OVER a cumsum).

    Determinism: increments accumulate in decimal(18,6), so the
    running sums are exact and order-free-agreed across engines; the
    (ts, id) ordering pins tie order under equal timestamps. Scale
    shape: ONE key-partitioned sort window computes both cumulatives
    back-to-back (same partitioning, no second shuffle), then one
    map-side-combined per-key aggregate. Returns (key, n_events,
    final_equity, peak_equity, max_drawdown as doubles)."""
    w = (
        Window.partitionBy("_k")
        .orderBy("_t", "_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    base = df.select(
        F.col(key_col).alias("_k"),
        F.col(ts_col).alias("_t"),
        F.col(id_col).alias("_id"),
        F.col(val_col).cast("decimal(18,6)").alias("_v"),
    )
    curve = base.withColumn("_eq", F.sum("_v").over(w)).withColumn(
        "_peak", F.max("_eq").over(w)
    )
    return (
        curve.groupBy("_k")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.max_by("_eq", F.struct("_t", "_id")).alias("_final"),
            F.max("_peak").alias("_maxpeak"),
            F.max(F.col("_peak") - F.col("_eq")).alias("_mdd"),
        )
        .select(
            F.col("_k").alias(key_col),
            "n_events",
            F.col("_final").cast("double").alias("final_equity"),
            F.col("_maxpeak").cast("double").alias("peak_equity"),
            F.col("_mdd").cast("double").alias("max_drawdown"),
        )
    )
