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


def test_minmax_refresh_equals_recompute(spark):
    from eclipse_spark.operators.ivm import (
        aggregate_view_minmax,
        incremental_refresh_minmax,
    )

    v1 = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 20.0), (3, "b", 5.0), (4, "c", 1.0)],
        ["k", "g", "v"],
    )
    v2 = spark.createDataFrame(
        [
            (1, "a", 10.0),   # unchanged
            # 2 deleted: group a's MAX row is gone -> must rescan
            (3, "b", 5.0),
            (5, "b", 9.0),    # insert: delta-only greatest() path
            (6, "d", 2.0),    # group birth
            # 4 deleted: group c dies entirely
        ],
        ["k", "g", "v"],
    )
    mv = aggregate_view_minmax(v1, ["g"], "v")
    got = {
        r.g: (r.n_rows, r.min_val, r.max_val)
        for r in incremental_refresh_minmax(
            mv, table_diff(v1, v2, on=["k"]), v2, ["g"], "v"
        ).collect()
    }
    want = {
        r.g: (r.n_rows, r.min_val, r.max_val)
        for r in aggregate_view_minmax(v2, ["g"], "v").collect()
    }
    assert got == want
    assert got["a"] == (1, 10.0, 10.0)  # rescan recovered the runner-up
    assert got["b"] == (2, 5.0, 9.0)    # insert-only group merged, no rescan
    assert "c" not in got and got["d"] == (1, 2.0, 2.0)


def test_minmax_refresh_untouched_groups_not_rescanned(spark):
    """Groups with no changes at all must pass through the outer merge
    unchanged (plan-level: they never reach the rescan semi-join)."""
    from eclipse_spark.operators.ivm import (
        aggregate_view_minmax,
        incremental_refresh_minmax,
    )

    v1 = spark.createDataFrame(
        [(1, "a", 3.0), (2, "b", 4.0)], ["k", "g", "v"]
    )
    v2 = spark.createDataFrame(
        [(1, "a", 3.0), (2, "b", 4.0), (3, "b", 1.0)], ["k", "g", "v"]
    )
    out = {
        r.g: (r.n_rows, r.min_val, r.max_val)
        for r in incremental_refresh_minmax(
            aggregate_view_minmax(v1, ["g"], "v"),
            table_diff(v1, v2, on=["k"]),
            v2,
            ["g"],
            "v",
        ).collect()
    }
    assert out == {"a": (1, 3.0, 3.0), "b": (2, 1.0, 4.0)}


def test_incremental_refresh_join_matches_recompute(spark):
    """Signed join-delta rule: fact inserts/deletes/updates AND a dim
    update that moves every matching fact across groups must all net
    out to exactly the recompute over the new snapshots — including a
    group born this batch and a group dying this batch."""
    from eclipse_spark.operators.ivm import (
        incremental_refresh_join,
        join_aggregate_view,
    )
    from eclipse_spark.storage import table_diff

    a_old = spark.createDataFrame(
        [(1, 10, 5.0), (2, 10, 7.0), (3, 20, 11.0), (4, 30, 1.0)],
        "fid long, jk long, amt double",
    )
    b_old = spark.createDataFrame(
        [(10, "x"), (20, "y"), (30, "z")], "jk long, grp string"
    )
    # facts: insert fid 5 (new jk 40), delete fid 4 (kills group z),
    # update fid 1's amount
    a_new = spark.createDataFrame(
        [(1, 10, 6.5), (2, 10, 7.0), (3, 20, 11.0), (5, 40, 9.0)],
        "fid long, jk long, amt double",
    )
    # dims: move jk 10 from group x to y, add jk 40 (group w is born)
    b_new = spark.createDataFrame(
        [(10, "y"), (20, "y"), (30, "z"), (40, "w")], "jk long, grp string"
    )
    kw = dict(on=["jk"], keys=["grp"], sum_col="amt")
    mv = join_aggregate_view(a_old, b_old, **kw)
    got = incremental_refresh_join(
        mv,
        table_diff(a_old, a_new, on=["fid"]),
        table_diff(b_old, b_new, on=["jk"]),
        a_old,
        b_old,
        **kw,
    )
    exp = join_aggregate_view(a_new, b_new, **kw)
    g = {(r.grp): (r.n_rows, str(r.total)) for r in got.collect()}
    e = {(r.grp): (r.n_rows, str(r.total)) for r in exp.collect()}
    assert g == e
    assert "z" not in g and "w" in g        # death and birth both exact
    assert g["y"] == (3, "24.50")           # moved facts + update netted
