"""Record linkage / fuzzy matching over short string keys.

The reference's algebra stops at exact keys (its join surface is
equality on emitted k/v pairs, src/mapreduce/dht/mapreduce.hh:29-50);
an entity-resolution pass over a 100 TB corpus needs approximate keys:
"are these two names/titles/URLs the same thing, give or take a typo".
The classic scalable shape is blocking + verify:

  1. candidate generation via the k-DELETION NEIGHBORHOOD (FastSS,
     Bocek et al. 2007): two strings within Levenshtein distance k
     always share a common subsequence reachable from BOTH by at most
     k single-character deletions (take an optimal <=k-op edit script
     and delete, on each side, the characters the script touches).
     Exploding every string into its <=k-deletion variants and joining
     on the variant therefore has GUARANTEED recall — never all-pairs,
     never a missed pair;
  2. exact verify: ``levenshtein(a, b) <= k`` on the candidate pairs
     only (integer edit distance, identical in Spark and DuckDB, so
     the whole operator is engine-exact).

Scale shape: a string of length L yields 1 + L + L(L-1)/2 variants at
k=2 — O(L^k) rows, which is why this operator is for SHORT keys
(names, titles, normalized URLs; L <~ 64), where the explode is a few
dozen rows per record and the variant join is an equi-join Catalyst
shuffles on a single hashed key. The quadratic blow-up inside one
bucket only happens if many records share a variant — i.e. when they
genuinely are near-duplicates, which is the output. Verification cost
is |candidates|, not |corpus|^2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["deletion_variants", "fuzzy_self_join", "resolve_entities"]


def deletion_variants(df: DataFrame, key_col: str, k: int = 1) -> DataFrame:
    """Explode each row into its <=k-deletion variants of ``key_col``
    (the string itself, every 1-deletion, ..., every k-deletion; all
    distinct per row). Pure codegen: positions come from
    ``sequence()``, deletions from slice concatenation — no Python in
    the path. Returns the input columns plus ``variant``."""
    if k < 1 or k > 2:
        raise ValueError(f"deletion_variants: k must be 1 or 2 (got {k})")
    s = F.col(key_col)
    # one-deletion at position i (1-based): prefix up to i-1 + suffix from i+1
    del1 = F.transform(
        F.sequence(F.lit(1), F.length(s)),
        lambda i: F.concat(s.substr(F.lit(1), i - 1), s.substr(i + 1, F.length(s))),
    )
    variants = F.array_union(F.array(s), del1)
    if k == 2:
        # two deletions = delete position j from each 1-deletion; dedupe
        # with array_distinct (different (i,j) often collide on repeats)
        del2 = F.flatten(
            F.transform(
                del1,
                lambda v: F.transform(
                    F.sequence(F.lit(1), F.length(v)),
                    lambda j: F.concat(v.substr(F.lit(1), j - 1),
                                       v.substr(j + 1, F.length(v))),
                ),
            )
        )
        variants = F.array_union(variants, del2)
    return df.withColumn("variant", F.explode(F.array_distinct(variants)))


def fuzzy_self_join(
    df: DataFrame,
    key_col: str,
    id_col: str,
    k: int = 1,
) -> DataFrame:
    """All pairs of rows whose ``key_col`` strings are within
    Levenshtein distance ``k`` (excluding exact-equal keys — those are
    exact dedup's job, operators/dedup.py). Deletion-neighborhood
    candidates + exact levenshtein verify; output one row per
    ``(id_a, id_b)`` with ``id_a < id_b``: ``key_a, key_b, distance``.

    The variant join keys on the variant STRING itself rather than a
    hash: variants of short keys are short, and keeping the text makes
    the join self-verifying (no collision re-check). At 100 TB, hash
    the variant with portable_hash60 to shrink shuffle width — the
    verify step already re-checks the real strings either way."""
    v = deletion_variants(
        df.select(F.col(id_col).alias("_id"), F.col(key_col).alias("_key")),
        "_key",
        k=k,
    )
    a = v.select(F.col("_id").alias("id_a"), F.col("_key").alias("key_a"), "variant")
    b = v.select(F.col("_id").alias("id_b"), F.col("_key").alias("key_b"), "variant")
    pairs = (
        a.join(b, on="variant")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "key_a", "key_b")
        .distinct()
    )
    return (
        pairs.withColumn("distance", F.levenshtein(F.col("key_a"), F.col("key_b")))
        .filter((F.col("distance") <= F.lit(k)) & (F.col("distance") > 0))
        .select("id_a", "id_b", "key_a", "key_b", "distance")
    )


def resolve_entities(
    df: DataFrame,
    key_col: str,
    id_col: str,
    k: int = 1,
) -> DataFrame:
    """End-to-end entity resolution over short string keys: fuzzy
    candidate pairs (:func:`fuzzy_self_join`, exact-recall deletion
    blocking) -> transitive closure into entity clusters
    (operators/dedup.connected_components, min-label propagation) ->
    canonical representative per entity (the member with the smallest
    id). One row per input record: ``entity_id`` (smallest member id
    in the cluster; singletons are their own entity) and
    ``canonical_key`` (the canonical member's string).

    This is the composition a production dedup/linkage pipeline runs —
    pairwise similarity alone over-merges nothing but also resolves
    nothing: a~b and b~c must land a, b, c in ONE entity even when
    a~c fails the pairwise test (typo chains). Scale shape inherits
    its parts: linear blocking explode, diameter-bounded label
    propagation (typo chains are shallow), one broadcast-backed
    canonical join."""
    from eclipse_spark.operators.dedup import connected_components

    base = df.select(F.col(id_col).alias("_id"), F.col(key_col).alias("_key"))
    edges = fuzzy_self_join(base, "_key", "_id", k=k).select("id_a", "id_b")
    cc = connected_components(edges)  # (node, component) for non-singletons
    resolved = base.join(
        cc.withColumnRenamed("node", "_id"), on="_id", how="left"
    ).withColumn("entity_id", F.coalesce(F.col("component"), F.col("_id")))
    canon = (
        resolved.groupBy("entity_id")
        .agg(F.min(F.struct(F.col("_id"), F.col("_key"))).alias("_c"))
        .select("entity_id", F.col("_c._key").alias("canonical_key"))
    )
    return resolved.join(canon, "entity_id").select(
        F.col("_id").alias(id_col),
        F.col("_key").alias(key_col),
        "entity_id",
        "canonical_key",
    )
