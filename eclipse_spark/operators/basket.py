"""Market-basket co-occurrence mining (frequent item pairs + lift).

The association-rule primitive of retail/behavior analytics: which
items appear together in a basket more often than chance. This is
also the 2-itemset round of Apriori, and the reason it scales is the
APRIORI PRUNE: a pair can only reach ``min_support`` if BOTH items do
(support is anti-monotone), so the corpus is semi-joined down to
frequent items BEFORE the quadratic-per-basket pair explode. At
100 TB the pair join shuffles only (basket, frequent-item) rows on the
basket key, and giant baskets (the skew hazard — one 10k-item basket
makes 50M pairs) are dropped with an explicit, logged-in-plan cap
rather than silently OOMing an executor; the standard upgrade beyond
pairs is the same loop k times (k-itemsets), each round re-pruned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["frequent_pairs"]


def frequent_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 3,
    max_basket_items: int = 1000,
) -> DataFrame:
    """All item pairs co-occurring in at least ``min_support`` baskets,
    with support counts and lift. One row per (item_a < item_b):
    ``support`` (co-occurrence count), ``support_a``/``support_b``
    (item basket counts), ``lift`` = support*n_baskets /
    (support_a*support_b), round-9.

    Plan: distinct (basket, item) -> item-support aggregate ->
    semi-join to frequent items (Apriori prune) -> per-basket size cap
    -> self-join on basket with item_a < item_b -> pair aggregate ->
    broadcast-joined item supports. Lift's numerator/denominator stay
    integer until one double division, so the value is engine-exact
    under round-9."""
    bi = df.select(
        F.col(basket_col).alias("basket"), F.col(item_col).alias("item")
    ).distinct()
    # lift's n_baskets constant stays a lazy 1-row broadcast (no eager
    # driver count; construction runs no job)
    nb = bi.agg(F.count_distinct("basket").alias("n_baskets"))
    isup = bi.groupBy("item").agg(F.count("*").alias("support_i"))
    frequent = isup.filter(F.col("support_i") >= min_support)
    pruned = bi.join(frequent.select("item"), "item", "left_semi")
    capped = (
        pruned.withColumn("_n", F.count("*").over(Window.partitionBy("basket")))
        .filter(F.col("_n") <= max_basket_items)
        .drop("_n")
    )
    a = capped.select("basket", F.col("item").alias("item_a"))
    b = capped.select("basket", F.col("item").alias("item_b"))
    pairs = (
        a.join(b, "basket")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count("*").alias("support"))
        .filter(F.col("support") >= min_support)
    )
    sa = frequent.select(
        F.col("item").alias("item_a"), F.col("support_i").alias("support_a")
    )
    sb = frequent.select(
        F.col("item").alias("item_b"), F.col("support_i").alias("support_b")
    )
    return (
        pairs.join(F.broadcast(sa), "item_a")
        .join(F.broadcast(sb), "item_b")
        .crossJoin(F.broadcast(nb))
        .select(
            "item_a",
            "item_b",
            F.col("support").cast("long").alias("support"),
            F.col("support_a").cast("long").alias("support_a"),
            F.col("support_b").cast("long").alias("support_b"),
            F.round(
                (F.col("support") * F.col("n_baskets")).cast("double")
                / (F.col("support_a") * F.col("support_b")).cast("double"),
                9,
            ).alias("lift"),
        )
    )
