"""Full-text ranked retrieval over a document table — BM25, the
standard lexical ranking function (Lucene/Elasticsearch semantics),
as a declarative plan over the same corpus the dedup/quality
operators run on.

Scale shape: the only corpus-sized work is tokenization + the
per-document length count (word-count shuffle shape); every
query-dependent structure (term frequencies, document frequencies,
IDF) is filtered to the query's terms BEFORE any aggregation, so the
scoring join moves rows proportional to |matching docs|, not corpus
size. The per-term statistics table is query-terms-sized and
broadcasts.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from eclipse_spark.operators.text import tokens


def bm25_topk(
    df: DataFrame,
    query_terms: Sequence[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k documents by BM25 against a bag of query terms (Lucene's
    non-negative IDF variant: ln(1 + (N - df + 0.5)/(df + 0.5))).

    Engine-exact determinism: each per-term score contribution rounds
    to 9 digits and accumulates in decimal, ranking ties break on the
    doc id — so the exact same k documents in the same order come
    back on any engine or partitioning (see the repo's oracle-parity
    rules). Returns (id_col, score, rank).
    """
    toks = df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("_t"))
    doclen = toks.groupBy(id_col).agg(F.count("*").alias("_dl"))
    # avgdl from exact integer sum / count — the engines' avg() uses
    # streaming accumulation whose order differs across partitions.
    n_docs = doclen.agg(
        F.count("*").alias("_n"),
        (F.sum("_dl").cast("double") / F.count("*")).alias("_avgdl"),
    )
    qterms = [t.lower() for t in query_terms]
    tf = (
        toks.filter(F.col("_t").isin(qterms))
        .groupBy(id_col, "_t")
        .agg(F.count("*").alias("_tf"))
    )
    dfreq = tf.groupBy("_t").agg(F.count("*").alias("_df"))
    idf = dfreq.crossJoin(F.broadcast(n_docs)).select(
        "_t",
        F.log(
            F.lit(1.0)
            + (F.col("_n") - F.col("_df") + F.lit(0.5)) / (F.col("_df") + F.lit(0.5))
        ).alias("_idf"),
        "_avgdl",
    )
    scored = (
        tf.join(F.broadcast(idf), "_t")
        .join(doclen, id_col)
        .withColumn(
            "_term_score",
            F.round(
                F.col("_idf")
                * (
                    F.col("_tf")
                    / (
                        F.col("_tf")
                        + F.lit(k1)
                        * (F.lit(1 - b) + F.lit(b) * F.col("_dl") / F.col("_avgdl"))
                    )
                ),
                9,
            ).cast("decimal(16,9)"),
        )
        .groupBy(id_col)
        .agg(F.sum("_term_score").cast("double").alias("score"))
    )
    # orderBy+limit lowers to TakeOrderedAndProject — a distributed
    # partial top-k (each partition keeps k, the driver merges k) —
    # instead of a single-partition global window sort; the ranking
    # window then runs over k rows only.
    top = scored.orderBy(F.desc("score"), F.asc(id_col)).limit(k)
    w = Window.orderBy(F.desc("score"), F.asc(id_col))
    return top.withColumn("rank", F.row_number().over(w))


def tfidf_top_terms(
    df: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_digits: int = 6,
) -> DataFrame:
    """Per-document top-k terms by TF-IDF (tf * ln(N/df)) — the
    classic keyword-extraction / feature-selection step of a text
    pipeline, and the document-side counterpart of :func:`bm25_topk`'s
    query-side scoring.

    Scale shape: one tokenize+explode pass, one (doc, term) partial-
    agg shuffle for tf, one term-keyed agg for df; the corpus count N
    is a 1-row aggregate cross-joined in (never collected). The tf-df
    join shuffles on the term key — vocabulary-sized, not corpus-
    sized, and never broadcast (a 100 TB corpus's vocabulary can be
    GBs). Scores round to ``round_digits`` and ties break on the term
    string, so the same k terms come back on any engine/partitioning.

    Returns (id_col, term, tf, score, rank)."""
    toks = df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term"))
    tf = toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("_df"))
    n = df.agg(F.count("*").alias("_n"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "score",
            F.round(F.col("tf") * F.log(F.col("_n") / F.col("_df")), round_digits),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "tf", "score", "rank")
    )


def phrase_search(
    df: DataFrame,
    phrase: Sequence[str],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact phrase match via a positional inverted index — the IR
    primitive BM25's bag-of-words scoring can't express: build
    (term, doc, position) postings, keep only the phrase's terms, and
    intersect postings with a fixed position offset per term (term i
    must sit at start + i).

    Scale shape: the postings table is filtered to the phrase's terms
    BEFORE any shuffle (an isin filter at scan time), so the joins
    move |postings of phrase terms| rows, not the corpus; each of the
    ``len(phrase) - 1`` intersections is an equi-join on
    (doc, aligned position) — co-partitioned after the first shuffle.
    Returns (doc_id, start_pos), one row per occurrence."""
    terms = [t.lower() for t in phrase]
    if not terms:
        raise ValueError("phrase_search: empty phrase")
    post = (
        df.select(
            F.col(id_col), F.posexplode(tokens(F.col(text_col))).alias("_pos", "_t")
        )
        .filter(F.col("_t").isin(terms))
    )
    out = (
        post.filter(F.col("_t") == terms[0])
        .select(F.col(id_col), F.col("_pos").alias("start_pos"))
    )
    for i, t in enumerate(terms[1:], start=1):
        nxt = post.filter(F.col("_t") == t).select(
            F.col(id_col), (F.col("_pos") - i).alias("start_pos")
        )
        out = out.join(nxt, on=[id_col, "start_pos"], how="left_semi")
    return out.select(F.col(id_col), F.col("start_pos").cast("int").alias("start_pos"))
