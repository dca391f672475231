"""Bloom-filter join pruning — shuffle-volume reduction for
selective joins.

At 100 TB the dominant cost of ``fact JOIN dim ON key`` with a
selective dim side is not the join itself but shuffling every fact row
to its key's reducer only to drop most of them there. The standard fix
is to push a compact, no-false-negative membership filter on the dim
keys INTO the fact scan, so non-matching rows die before the exchange.
Spark's optimizer injects such a filter on its own in narrow cases
(``spark.sql.optimizer.runtime.bloomFilter.enabled``, and
``bloom_filter_agg`` exists as an internal expression), but it is not
exposed as a public function and only fires under size heuristics —
this module is the explicit, composable form.

Everything stays JVM-side and built-in: the k hash probes are
``xxhash64(key, seed_i)`` reduced mod m, the m-bit array is built as
``ceil(m/64)`` long words with one ``bit_or`` aggregate (only
``k * |dim|`` int rows shuffle — never the fact table), densified
against a ``spark.range`` of word indexes, and embedded as ONE array
literal in the fact-side filter — the same shape as Spark's injected
runtime filter, riding the per-stage task-binary broadcast. Probes are
pure bitwise expressions inside whole-stage codegen.

Semantics are EXACT: a Bloom filter has no false negatives, and
:func:`bloom_semi_join` re-joins the pruned survivors against the real
key set, so false positives only cost shuffle rows, never wrong
output. The result equals a plain semi-join — which is exactly what
the SQL oracle checks.

Reference capability analogue: Eclipse ships every map output through
the DHT regardless of downstream selectivity (src/mapreduce/dht paths);
this operator is the Spark-first upgrade — declare the join, prune the
exchange.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bloom_filter_build(
    keys: DataFrame,
    key_col: str,
    bits_per_key: int = 10,
    n_hashes: int = 6,
) -> DataFrame:
    """Build a Bloom filter over ``keys[key_col]`` as a ONE-ROW
    DataFrame ``(m_bits, n_hashes, words: array<long>)``; collect the
    row and hand ``F.lit(list(words))`` to :func:`bloom_might_contain`
    on any probe side.

    m is sized eagerly from a distinct-count of the key set (one cheap
    aggregate at build time — same trade as triangle_count's
    size-aware broadcast estimate): ``m = max(64, n_keys *
    bits_per_key)`` rounded up to a word multiple, giving a false
    positive rate of about ``0.6185 ** bits_per_key`` (~0.8% at the
    default 10 bits/key, 6 hashes). NULL keys are excluded — they
    never match a join anyway.

    Scale shape: ``n_hashes * |keys|`` (word_idx, bit) int pairs
    shuffle into a ``bit_or`` per word, the dense word array comes
    from a left join against ``spark.range(n_words)`` (no window, no
    driver loop), and one ``array_agg`` over the sorted (idx, word)
    structs yields the single-row bitmap. The filter itself is
    ``n_words * 8`` bytes — ~12 MB per 10M keys — the thing that CAN
    sit on every executor when the key set itself is too big to
    broadcast as a join side (a 10M-key hash relation with payload is
    GBs; its Bloom image is not).
    """
    k = keys.select(F.col(key_col).alias("_k")).where(
        F.col("_k").isNotNull()
    ).distinct()
    n_keys = k.count()
    m_bits = max(64, n_keys * bits_per_key)
    m_bits += (-m_bits) % 64
    n_words = m_bits // 64
    pos = k.select(
        F.explode(
            F.array(
                *[
                    F.pmod(F.xxhash64(F.col("_k"), F.lit(i)), F.lit(m_bits))
                    for i in range(n_hashes)
                ]
            )
        ).alias("_pos")
    )
    words = pos.select(
        (F.col("_pos") / 64).cast("long").alias("_w"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(_pos % 64 AS INT))").alias(
            "_m"
        ),
    ).groupBy("_w").agg(F.bit_or("_m").alias("_mask"))
    dense = (
        keys.sparkSession.range(n_words)
        .withColumnRenamed("id", "_w")
        .join(words, "_w", "left")
        .select("_w", F.coalesce("_mask", F.lit(0).cast("long")).alias("_mask"))
    )
    return dense.agg(
        F.lit(m_bits).alias("m_bits"),
        F.lit(n_hashes).alias("n_hashes"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("_w", "_mask"))),
            lambda s: s["_mask"],
        ).alias("words"),
    )


def bloom_might_contain(
    probe: Column, m_bits: int, n_hashes: int, words: Column
) -> Column:
    """The probe predicate: AND over the k seeded-hash bit tests
    against the ``words`` array<long>. Pure bitwise built-ins — lives
    inside whole-stage codegen on the scan side. Pass the bitmap as a
    LITERAL array column (``F.lit(words_list)``) so the predicate is a
    plain Filter that predicate-pushdown pins onto the probe side's
    scan branch — attaching the bitmap as a one-row crossJoin instead
    lets the join reorderer float the whole prune ABOVE the very
    exchange it exists to shrink (observed: Catalyst rebuilt
    ``prune -> semi-join`` as ``semi-join -> prune``). The literal is
    one ArrayType node, and Spark broadcasts the task binary per
    stage, so plan shipping costs the same as an explicit broadcast.
    ``m_bits``/``n_hashes`` are plan-time ints (they sized the filter
    at build time and must match it)."""
    cond = F.lit(True)
    for i in range(n_hashes):
        p = F.pmod(F.xxhash64(probe, F.lit(i)), F.lit(m_bits))
        # cast the word to long explicitly: a literal list of small
        # masks infers array<int>, and getbit range-checks positions
        # against the input width (rejects >= 32 on int words)
        word = F.element_at(
            words, ((p / 64).cast("long") + 1).cast("int")
        ).cast("long")
        cond = cond & (F.getbit(word, (p % 64).cast("int")) == 1)
    return cond


def bloom_semi_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str | None = None,
    bits_per_key: int = 10,
    n_hashes: int = 6,
) -> DataFrame:
    """``big`` rows whose key appears in ``small`` — a semi-join whose
    exchange carries only the Bloom SURVIVORS of the big side instead
    of every row: build the filter over the small side's distinct
    keys, broadcast it, prune big inside its scan stage, THEN run the
    exact semi-join on what is left. False positives (≈0.8% at
    defaults) are dropped by the exact join; false negatives cannot
    occur, so the result is row-identical to ``big SEMI JOIN small``
    at any scale — the only thing the filter changes is how many rows
    reach the shuffle. NULL big-side keys are dropped (semi-join
    semantics: NULL never matches).

    When the small side is ALSO broadcast-able as a join relation,
    Catalyst's broadcast semi-join already avoids the exchange and
    this operator adds nothing; its regime is the middle ground — a
    key set of millions (too big for a hash-relation broadcast, tiny
    as a bitmap) probing a fact table of billions.

    Key dtypes: ``xxhash64`` hashes the BITS of its input type (int 5
    and bigint 5 hash differently), so build and probe MUST hash the
    same type or the filter yields false NEGATIVES (ADVICE r8). On a
    dtype mismatch the small side's keys are ``try_cast`` to the big
    side's type — build, probe, AND the exact semi-join all run in the
    big key's domain (a small-side key that can't represent in it
    becomes NULL, i.e. can never match, which is exactly the ANSI
    equality outcome for an unrepresentable literal).
    """
    small_key = small_key or big_key
    big_t = dict(big.dtypes)[big_key]
    small_t = dict(small.dtypes)[small_key]
    skey = F.col(small_key)
    if small_t != big_t:
        skey = skey.try_cast(big_t)
    keyset = (
        small.select(skey.alias(big_key))
        .where(F.col(big_key).isNotNull())
        .distinct()
    )
    # the bitmap collects to the driver ONCE (n_words longs — bounded
    # by bits_per_key, never by the fact side) and embeds as a literal
    # so the probe is a plain pushdown-able Filter; see
    # bloom_might_contain for why a one-row crossJoin attach is unsafe
    meta = bloom_filter_build(
        keyset, big_key, bits_per_key, n_hashes
    ).collect()[0]
    pruned = big.where(F.col(big_key).isNotNull()).where(
        bloom_might_contain(
            F.col(big_key),
            meta["m_bits"],
            meta["n_hashes"],
            F.lit(list(meta["words"])),
        )
    )
    return pruned.join(keyset, big_key, "semi")
