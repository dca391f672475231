"""Text-curation operator units: PII scrubbing and repetition
filters (north-star pre-training ops)."""

from __future__ import annotations

from pyspark.sql import functions as F

def test_scrub_pii_masks_each_class(spark):
    from eclipse_spark.operators.text import scrub_pii

    df = spark.createDataFrame(
        [("a@b.com, +1 (415) 555-0199, 10.0.0.1, acct 98765432101234",)],
        ["text"],
    )
    [row] = df.select(scrub_pii(F.col("text")).alias("s")).collect()
    s = row["s"]
    for tag in ("<EMAIL>", "<PHONE>", "<IP>", "<NUMBER>"):
        assert tag in s, s
    assert "@" not in s and "415" not in s and "10.0.0.1" not in s


def test_repetition_stats_exact_fractions(spark):
    from eclipse_spark.operators.text import repetition_stats

    df = spark.createDataFrame(
        [(1, "aaa\nbbb\naaa"), (2, "xxx\nyyy"), (3, "zz\n\n  \nzz\nzz")],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: (r["n_lines"], r["dup_line_frac"], r["dup_char_frac"])
           for r in repetition_stats(df).collect()}
    assert got[1] == (3, 2 / 3, 2 / 3)       # aaa twice of three lines
    assert got[2] == (2, 0.0, 0.0)
    assert got[3] == (3, 1.0, 1.0)           # zz x3, blanks dropped
