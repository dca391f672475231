"""The reference's canonical workloads (SURVEY §2.5) as declarative,
scale-ready DataFrame plans.

Eclipse ships these as hand-written C++ map/reduce binaries (shapes
defined by ``doc/CourseReport'14/report.tex`` §Applications); here each
is a pure ``pyspark.sql.functions`` plan — no Python in the hot path,
whole-stage codegen end-to-end, partial aggregation map-side (the
shuffle carries (token, partial_count), not raw tokens).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from eclipse_spark.util import ensure_parallelism

# Tokenization contract shared by word count / inverted index and their
# DuckDB oracles: lowercase, split on whitespace runs, drop empties.
# (Eclipse's record model is raw lines; tokenization was user C++.)


def tokens_col(text: Column) -> Column:
    return F.split(F.lower(F.trim(text)), r"\s+")


def word_count(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """word -> occurrence count across the corpus."""
    return (
        ensure_parallelism(docs.select(text_col))
        .select(F.explode(tokens_col(F.col(text_col))).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


def inverted_index(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """word -> sorted distinct posting list of document ids.

    The posting list is emitted as a comma-joined string (deterministic,
    oracle-comparable); `postings_n` carries the list length. distinct
    before the groupBy keeps the shuffle narrow (token,doc) pairs."""
    tok = (
        ensure_parallelism(docs.select(id_col, text_col))
        .select(
            F.col(id_col).alias("doc_id"),
            F.explode(tokens_col(F.col(text_col))).alias("word"),
        )
        .filter(F.col("word") != "")
        .distinct()
    )
    return tok.groupBy("word").agg(
        F.array_join(F.sort_array(F.collect_list(F.col("doc_id").cast("string"))), ",").alias(
            "postings"
        ),
        F.count("*").alias("postings_n"),
    )


def aggregation(df: DataFrame, num_cols: list[str] | None = None) -> DataFrame:
    """Per-column sums over a numeric table (the reference's 441 MB
    'Aggregation' workload): one row, one sum per numeric column.
    Single map-side-combinable aggregate, no groupBy shuffle width."""
    if num_cols is None:
        num_cols = [
            f.name
            for f in df.schema.fields
            if f.dataType.typeName() in ("integer", "long", "double", "float", "decimal")
        ]
    return df.agg(
        *[F.sum(F.col(c).cast("double")).alias(f"sum_{c}") for c in num_cols]
    )


def grouped_aggregation(
    df: DataFrame, keys: list[str], num_cols: list[str]
) -> DataFrame:
    """Grouped variant (TPC-H Q1 shape; FIXTURES F2 golden)."""
    return df.groupBy(*keys).agg(
        *[F.sum(F.col(c).cast("double")).alias(f"sum_{c}") for c in num_cols]
    )
