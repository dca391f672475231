"""Incremental view maintenance: refresh-from-changes must equal
full recompute through group birth, group death, and updates."""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import functions as F

from eclipse_spark.operators.ivm import aggregate_view, incremental_refresh
from eclipse_spark.storage import table_diff


def _mv_rows(df):
    return {
        r.g: (r.n_rows, Decimal(str(r.revenue))) for r in df.collect()
    }


def test_refresh_equals_recompute(spark):
    v1 = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 20.0), (3, "b", 5.0), (4, "c", 1.0)],
        ["k", "g", "v"],
    )
    v2 = spark.createDataFrame(
        [
            (1, "a", 10.0),      # unchanged
            (2, "a", 25.0),      # updated value
            (4, "d", 1.0),       # moved groups c -> d (c dies, d is born)
            (5, "b", 7.0),       # insert
            # 3 deleted
        ],
        ["k", "g", "v"],
    )
    mv1 = aggregate_view(v1, ["g"], {"v": "revenue"})
    changes = table_diff(v1, v2, on=["k"])
    refreshed = incremental_refresh(mv1, changes, ["g"], {"v": "revenue"})
    want = _mv_rows(aggregate_view(v2, ["g"], {"v": "revenue"}))
    got = _mv_rows(refreshed)
    assert got == want
    assert "c" not in got           # group death dropped, not zero-row
    assert got["d"] == (1, Decimal("1.0"))  # group birth via outer side


def test_refresh_empty_changes_is_identity(spark):
    v1 = spark.createDataFrame([(1, "a", 3.0)], ["k", "g", "v"])
    mv1 = aggregate_view(v1, ["g"], {"v": "revenue"})
    changes = table_diff(v1, v1, on=["k"])
    assert changes.count() == 0
    got = _mv_rows(incremental_refresh(mv1, changes, ["g"], {"v": "revenue"}))
    assert got == _mv_rows(mv1)


def test_refresh_update_only_touches_sum_not_count(spark):
    v1 = spark.createDataFrame([(1, "a", 3.0), (2, "a", 4.0)], ["k", "g", "v"])
    v2 = spark.createDataFrame([(1, "a", 3.5), (2, "a", 4.0)], ["k", "g", "v"])
    mv1 = aggregate_view(v1, ["g"], {"v": "revenue"})
    got = _mv_rows(
        incremental_refresh(mv1, table_diff(v1, v2, on=["k"]), ["g"], {"v": "revenue"})
    )
    assert got == {"a": (2, Decimal("7.5"))}
