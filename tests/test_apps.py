"""Canonical-app goldens (SURVEY §5): word count / inverted index /
aggregation checked against independent Python-stdlib computations on
the same fixture rows — the reference's three benchmark workloads."""

from __future__ import annotations

import collections

from pyspark.sql import functions as F

from eclipse_spark import apps


def _docs_rows(spark, sf_smoke):
    df = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    return [(r["doc_id"], r["text"]) for r in df.collect()], df


def test_word_count_golden(spark, sf_smoke):
    rows, df = _docs_rows(spark, sf_smoke)
    expected = collections.Counter()
    for _id, text in rows:
        expected.update(t for t in text.lower().strip().split() if t)
    got = {r["word"]: r["cnt"] for r in apps.word_count(df).collect()}
    assert got == dict(expected)


def test_inverted_index_golden(spark, sf_smoke):
    rows, df = _docs_rows(spark, sf_smoke)
    postings: dict[str, set] = collections.defaultdict(set)
    for doc_id, text in rows:
        for t in set(text.lower().strip().split()):
            if t:
                postings[t].add(str(doc_id))
    expected = {w: ",".join(sorted(ids)) for w, ids in postings.items()}
    got = {r["word"]: r["postings"] for r in apps.inverted_index(df).collect()}
    assert got == expected


def test_aggregation_golden(spark, sf_smoke):
    df = spark.read.parquet(f"{sf_smoke}/lineitem.parquet")
    pdf = df.select("l_quantity", "l_linenumber").toPandas()
    out = apps.aggregation(df, ["l_quantity", "l_linenumber"]).collect()[0]
    assert out["sum_l_quantity"] == float(pdf["l_quantity"].sum())
    assert out["sum_l_linenumber"] == float(pdf["l_linenumber"].sum())


def test_grouped_aggregation(spark, sf_smoke):
    df = spark.read.parquet(f"{sf_smoke}/lineitem.parquet")
    out = apps.grouped_aggregation(df, ["l_returnflag"], ["l_quantity"])
    got = {r["l_returnflag"]: r["sum_l_quantity"] for r in out.collect()}
    pdf = df.groupBy("l_returnflag").agg(F.sum("l_quantity").alias("s")).collect()
    expected = {r["l_returnflag"]: r["s"] for r in pdf}
    assert set(got) == set(expected)
    for k in got:
        assert abs(got[k] - expected[k]) < 1e-6
