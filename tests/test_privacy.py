"""k-anonymity / l-diversity release auditing (operators/privacy.py)."""

from __future__ import annotations

from eclipse_spark.operators.privacy import (
    k_anonymity_audit,
    reidentification_summary,
)


def _toy(spark):
    # QI (city, seg): group A=3 rows diverse, B=2 rows homogeneous,
    # C=1 unique row
    rows = [
        ("x", "m", 10.0), ("x", "m", 20.0), ("x", "m", 30.0),   # A
        ("x", "f", 5.0), ("x", "f", 5.0),                        # B
        ("y", "m", 7.0),                                         # C
    ]
    return spark.createDataFrame(rows, ["city", "seg", "val"])


def test_k_anonymity_audit_flags(spark):
    got = {
        (r["city"], r["seg"]): (r["group_size"], r["n_sensitive"],
                                r["k_anonymous"], r["l_diverse"])
        for r in k_anonymity_audit(
            _toy(spark), ["city", "seg"], "val", k=2, l=2
        ).collect()
    }
    assert got[("x", "m")] == (3, 3, 1, 1)
    assert got[("x", "f")] == (2, 1, 1, 0)   # big enough, not diverse
    assert got[("y", "m")] == (1, 1, 0, 0)   # unique row


def test_k_anonymity_null_handling(spark):
    rows = [("x", None, 1.0), ("x", None, None), (None, "m", 2.0)]
    df = spark.createDataFrame(rows, "city string, seg string, val double")
    got = {
        (r["city"], r["seg"]): (r["group_size"], r["n_sensitive"])
        for r in k_anonymity_audit(df, ["city", "seg"], "val").collect()
    }
    # NULL QI values group like GROUP BY; NULL sensitive not counted
    assert got[("x", None)] == (2, 1)
    assert got[(None, "m")] == (1, 1)


def test_reidentification_summary_rollup(spark):
    r = reidentification_summary(
        _toy(spark), ["city", "seg"], "val", k=2, l=2
    ).collect()[0]
    assert r["n_groups"] == 3 and r["n_rows"] == 6
    assert r["rows_below_k"] == 1      # group C
    assert r["rows_below_l"] == 3      # groups B (2) + C (1)
    assert r["unique_rows"] == 1
