"""Graph operators on DataFrames — iterative link analysis without a
graph library.

The reference's MapReduce API is the classic substrate for iterative
graph jobs (chained MAP->REDUCE rounds over edge lists); here each
round is a declarative join+agg the optimizer can plan, and the loop
lives on the driver while every per-round data structure (edges,
degrees, ranks) stays distributed. Connected components (the other
iterative graph op) lives in :mod:`eclipse_spark.operators.dedup`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    n_iter: int = 2,
    damping: float = 0.85,
    teleport: float = 0.15,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """PageRank over a directed edge list, simplified-damping variant
    (rank = (1-d) + d * sum(in-contribs); no dangling-mass
    redistribution — the standard MapReduce-example semantics).

    Scale shape per iteration: contribs = edges ⋈ ranks on src (one
    key shuffle; ranks is the smaller side and re-shuffles on the same
    key each round), then one (dst) shuffle for the sum. Out-degrees
    are computed once and persisted. Nothing collects to the driver;
    the loop only chains plans. For hash-exact cross-engine parity the
    per-node contribution sum accumulates in decimal(28,15) and
    surfaces as double — every other arithmetic step is deterministic
    per-row IEEE. Returns (node, pr).
    """
    # The edge list is referenced once for the node set, once for the
    # degrees, and once per iteration — persist it so an upstream
    # subtree (joins/distinct building the edges) materializes exactly
    # once instead of per reference. At cluster scale this is the
    # difference between one pass over the source tables and n_iter+2.
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).persist()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    outdeg = e.groupBy("src").agg(F.count("*").alias("deg")).persist()
    ranks = nodes.withColumn("pr", F.lit(1.0))
    for _ in range(n_iter):
        contribs = (
            e.join(ranks.withColumnRenamed("node", "src"), on="src")
            .join(outdeg, on="src")
            .select(F.col("dst"), (F.col("pr") / F.col("deg")).alias("contrib"))
        )
        summed = contribs.groupBy("dst").agg(
            F.sum(F.col("contrib").cast("decimal(28,15)")).alias("_s")
        )
        ranks = nodes.join(summed, nodes.node == summed.dst, "left").select(
            "node",
            # teleport is a separate literal, NOT computed as
            # 1 - damping: binary 1.0-0.85 != parsed "0.15", and an
            # external SQL oracle writes the parsed literal
            (
                F.lit(teleport)
                + F.lit(damping)
                * F.coalesce(F.col("_s").cast("double"), F.lit(0.0))
            ).alias("pr"),
        )
    return ranks
