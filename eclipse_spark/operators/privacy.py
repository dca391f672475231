"""Privacy-risk auditing for dataset release.

A training-data pipeline that exports user-derived tables owes a
re-identification check before release: rows whose quasi-identifier
combination (the columns an attacker can link from the outside —
region, segment, coarse age, ...) is shared by fewer than ``k`` people
are linkable, and groups whose sensitive value barely varies leak that
value even when the group is large (the homogeneity attack l-diversity
guards against). This module implements both audits as single-pass
grouped aggregates — the Spark-native counterpart of the PII *content*
scrubbing in :mod:`eclipse_spark.operators.text` (``scrub_pii`` removes
identifiers from text; this measures identifiability of the rows
themselves).

The reference engine has no privacy surface; this extends the
LLM-data-pipeline operator family (SURVEY §2 additions) the same way
dedup/decontamination do: public, well-defined semantics (Sweeney's
k-anonymity; Machanavajjhala's distinct-l-diversity), deterministic
output, plain SQL oracle.

Scale shape: ONE map-side-combinable aggregate over the
quasi-identifier key (count + exact distinct of the sensitive column —
the distinct runs as Spark's standard two-phase partial/final plan);
no window, no join, no driver collect. At 100 TB the QI-group
cardinality is orders of magnitude below the row count, so the shuffle
carries group summaries, not rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["k_anonymity_audit", "reidentification_summary"]


def k_anonymity_audit(
    df: DataFrame,
    qi_cols: list[str],
    sensitive_col: str,
    k: int = 10,
    l: int = 2,
) -> DataFrame:
    """Per-quasi-identifier-group privacy audit: group rows on
    ``qi_cols`` and report each group's size, the number of DISTINCT
    sensitive values it contains, and the two verdicts — a group is
    ``k_anonymous`` when at least ``k`` rows share its QI combination
    and ``l_diverse`` when its sensitive attribute takes at least
    ``l`` distinct values (distinct-l-diversity). A release gate keeps
    only rows from groups passing both, or generalizes/suppresses the
    rest.

    NULL handling: a NULL sensitive value counts as no value
    (count(distinct) semantics in any engine); NULL QI values form
    their own group, like GROUP BY. Returns
    (*qi_cols, group_size, n_sensitive, k_anonymous, l_diverse) with
    integer verdict flags (0/1) so the output hashes identically in
    any engine."""
    return (
        df.groupBy(*qi_cols)
        .agg(
            F.count("*").cast("long").alias("group_size"),
            F.count_distinct(F.col(sensitive_col)).cast("long").alias(
                "n_sensitive"
            ),
        )
        .select(
            *qi_cols,
            "group_size",
            "n_sensitive",
            F.when(F.col("group_size") >= k, F.lit(1))
            .otherwise(F.lit(0))
            .alias("k_anonymous"),
            F.when(F.col("n_sensitive") >= l, F.lit(1))
            .otherwise(F.lit(0))
            .alias("l_diverse"),
        )
    )


def reidentification_summary(
    df: DataFrame,
    qi_cols: list[str],
    sensitive_col: str,
    k: int = 10,
    l: int = 2,
) -> DataFrame:
    """One-row release-gate summary over :func:`k_anonymity_audit`:
    how many rows sit in sub-``k`` groups (linkable), how many in
    non-``l``-diverse groups (homogeneity-leaky), total groups/rows,
    and the unique-row count (group_size == 1 — the rows an attacker
    links with certainty). The number every data-release review asks
    for first; the per-group audit is the drill-down."""
    audit = k_anonymity_audit(df, qi_cols, sensitive_col, k=k, l=l)
    return audit.agg(
        F.count("*").cast("long").alias("n_groups"),
        F.sum("group_size").cast("long").alias("n_rows"),
        F.sum(F.when(F.col("k_anonymous") == 0, F.col("group_size")).otherwise(0))
        .cast("long")
        .alias("rows_below_k"),
        F.sum(F.when(F.col("l_diverse") == 0, F.col("group_size")).otherwise(0))
        .cast("long")
        .alias("rows_below_l"),
        F.sum(F.when(F.col("group_size") == 1, 1).otherwise(0))
        .cast("long")
        .alias("unique_rows"),
    )
