"""Operator library: the relational capability layer (SURVEY §2.6) plus
the north-star LLM-data-pipeline operators (dedup, similarity search,
text analysis, multimodal columns) and scale helpers (skew salting,
two-phase aggregation)."""

from eclipse_spark.operators import (  # noqa: F401
    basket,
    dedup,
    graph,
    ivm,
    linkage,
    multimodal,
    profile,
    relational,
    search,
    similarity,
    skew,
    text,
    timeseries,
)
