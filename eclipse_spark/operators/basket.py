"""Market-basket co-occurrence mining (frequent item pairs + lift).

The association-rule primitive of retail/behavior analytics: which
items appear together in a basket more often than chance. This is
also the 2-itemset round of Apriori, and the reason it scales is the
APRIORI PRUNE: a pair can only reach ``min_support`` if BOTH items do
(support is anti-monotone), so the corpus is semi-joined down to
frequent items BEFORE the quadratic-per-basket pair explode. At
100 TB the pair join shuffles only (basket, frequent-item) rows on the
basket key, and giant baskets (the skew hazard — one 10k-item basket
makes 50M pairs) are excluded from the whole analysis by an explicit,
in-plan cap rather than silently OOMing an executor; the standard
upgrade beyond pairs is the same loop k times (k-itemsets), each
round re-pruned.
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

    Baskets with more than ``max_basket_items`` distinct items are
    EXCLUDED FROM THE ANALYSIS ENTIRELY, up front: supports,
    ``n_baskets``, and pair counts all come from the same capped
    corpus, so lift stays internally consistent when the cap fires
    (round-5 version capped only the pair-explode side, making lift's
    numerator and denominator disagree about the corpus). Callers who
    need the drop surfaced can diff ``count_distinct(basket)`` against
    the returned analysis or set ``max_basket_items`` high.

    Plan: distinct (basket, item) -> per-basket size window -> cap
    filter -> item-support aggregate -> semi-join to frequent items
    (Apriori prune) -> self-join on basket with item_a < item_b ->
    pair aggregate -> broadcast-joined item supports. Lift's
    numerator/denominator stay integer until one double division, so
    the value is engine-exact under round-9."""
    bi0 = df.select(
        F.col(basket_col).alias("basket"), F.col(item_col).alias("item")
    ).distinct()
    bi = (
        bi0.withColumn("_n", F.count("*").over(Window.partitionBy("basket")))
        .filter(F.col("_n") <= max_basket_items)
        .drop("_n")
    )
    # lift's n_baskets constant stays a lazy 1-row broadcast (no eager
    # driver count; construction runs no job)
    nb = bi.agg(F.count_distinct("basket").alias("n_baskets"))
    isup = bi.groupBy("item").agg(F.count("*").alias("support_i"))
    frequent = isup.filter(F.col("support_i") >= min_support)
    pruned = bi.join(frequent.select("item"), "item", "left_semi")
    a = pruned.select("basket", F.col("item").alias("item_a"))
    b = pruned.select("basket", F.col("item").alias("item_b"))
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
