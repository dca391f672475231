"""Market-basket pairs, entity resolution, and the fixed-point
chi-square — each against a hand-computed or scipy-style reference."""

from __future__ import annotations

import itertools
import math

from pyspark.sql import functions as F

from eclipse_spark.operators.basket import frequent_pairs
from eclipse_spark.operators.linkage import resolve_entities
from eclipse_spark.operators.profile import chi_square


def test_frequent_pairs_counts_and_lift(spark):
    baskets = {
        1: ["a", "b", "c"],
        2: ["a", "b"],
        3: ["a", "b", "d"],
        4: ["c", "d"],
        5: ["a", "c"],
    }
    rows = [(b, i) for b, items in baskets.items() for i in items]
    df = spark.createDataFrame(rows, ["bid", "item"])
    out = {(r.item_a, r.item_b): r for r in frequent_pairs(df, "bid", "item", 2).collect()}
    # pair supports: ab=3, ac=2, bc=1, ad=1, bd=1, cd=1
    assert set(out) == {("a", "b"), ("a", "c")}
    ab = out[("a", "b")]
    assert ab.support == 3 and ab.support_a == 4 and ab.support_b == 3
    assert abs(ab.lift - round(3 * 5 / (4 * 3), 9)) < 1e-12
    ac = out[("a", "c")]
    assert ac.support == 2 and ac.support_b == 3
    assert abs(ac.lift - round(2 * 5 / (4 * 3), 9)) < 1e-12


def test_frequent_pairs_basket_cap_drops_megabasket(spark):
    # mega-basket 1 holds six items that are all individually frequent
    # (each also occurs in its own small basket), so the Apriori prune
    # keeps them and only the post-prune size cap can drop the basket
    rows = [(1, f"i{k}") for k in range(6)]
    rows += [(10 + k, f"i{k}") for k in range(6)]
    rows += [(20, "a"), (20, "b"), (21, "a"), (21, "b")]
    df = spark.createDataFrame(rows, ["bid", "item"])
    out = frequent_pairs(df, "bid", "item", min_support=2, max_basket_items=5).collect()
    # all i*-pairs co-occur only inside the capped mega-basket -> gone;
    # the a-b pair from two small baskets survives
    assert {(r.item_a, r.item_b, r.support) for r in out} == {("a", "b", 2)}
    uncapped = frequent_pairs(df, "bid", "item", min_support=1).collect()
    assert len(uncapped) == 15 + 1


def test_frequent_pairs_cap_keeps_lift_consistent(spark):
    """When the cap fires, supports / n_baskets / pair counts must all
    describe the same (capped) corpus — lift recomputed from the row's
    own columns over the capped basket count must equal the reported
    lift (the round-5 version mixed capped pair counts with uncapped
    marginals)."""
    # mega-basket 99 shares items with the small baskets, so uncapped
    # marginals would differ from capped ones
    rows = [(99, f"i{k}") for k in range(4)] + [(99, "a"), (99, "b")]
    rows += [(1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "a"), (3, "i0")]
    df = spark.createDataFrame(rows, ["bid", "item"])
    out = frequent_pairs(
        df, "bid", "item", min_support=2, max_basket_items=4
    ).collect()
    # capped corpus = baskets 1,2,3 (3 baskets); a:3 b:2 i0:1
    n_capped = 3
    for r in out:
        assert abs(
            r.lift
            - round(r.support * n_capped / (r.support_a * r.support_b), 9)
        ) < 1e-12
    ab = {(r.item_a, r.item_b): r for r in out}[("a", "b")]
    assert ab.support == 2 and ab.support_a == 3 and ab.support_b == 2


def test_resolve_entities_typo_chain(spark):
    # chain: ring ~ rang ~ rung (pairwise ring~rung lev=2 > k=1) must
    # still land in ONE entity; isolated word stays a singleton
    df = spark.createDataFrame(
        [(10, "ring"), (20, "rang"), (30, "rung"), (40, "zzz")],
        ["rid", "word"],
    )
    out = {r.rid: r for r in resolve_entities(df, "word", "rid", k=1).collect()}
    assert out[10].entity_id == out[20].entity_id == out[30].entity_id == 10
    assert out[10].canonical_key == "ring"
    assert out[40].entity_id == 40 and out[40].canonical_key == "zzz"


def test_chi_square_against_reference(spark):
    # 2x2 with known chi2: [[10, 20], [30, 40]]
    rows = (
        [("x", "u")] * 10 + [("x", "v")] * 20 + [("y", "u")] * 30 + [("y", "v")] * 40
    )
    df = spark.createDataFrame(rows, ["a", "b"])
    [r] = chi_square(df, "a", "b").collect()
    # reference value computed exactly: n=100
    obs = {("x", "u"): 10, ("x", "v"): 20, ("y", "u"): 30, ("y", "v"): 40}
    ra = {"x": 30, "y": 70}
    rb = {"u": 40, "v": 60}
    expected = sum(
        (obs[(a, b)] - ra[a] * rb[b] / 100) ** 2 / (ra[a] * rb[b] / 100)
        for a, b in obs
    )
    assert r.dof == 1 and r.n == 100 and r.n_a == 2 and r.n_b == 2
    assert abs(r.chi2 - expected) < 1e-8  # fixed-point truncation < 4e-9
    assert r.chi2_scaled == math.floor(r.chi2 * 1e9 + 0.5) or abs(
        r.chi2_scaled / 1e9 - expected
    ) < 1e-8


def test_chi_square_bigint_overflow_regime(spark):
    """Regime where the round-5 BIGINT arithmetic silently wrapped:
    n = 120k with concentrated marginals makes (o*n - ca*cb)^2 ~ 1.4e20
    >> 2^63. The decimal(38,0) path must return the exact statistic."""
    from fractions import Fraction

    counts = {
        ("x", "u"): 110_000,
        ("x", "v"): 4_000,
        ("y", "u"): 5_000,
        ("y", "v"): 1_000,
    }
    df = spark.range(120_000).select(
        F.when(F.col("id") < 114_000, "x").otherwise("y").alias("a"),
        F.when(
            (F.col("id") < 110_000)
            | ((F.col("id") >= 114_000) & (F.col("id") < 119_000)),
            "u",
        )
        .otherwise("v")
        .alias("b"),
    )
    [r] = chi_square(df, "a", "b").collect()
    n = sum(counts.values())
    ra = {"x": 114_000, "y": 6_000}
    rb = {"u": 115_000, "v": 5_000}
    exact = sum(
        (o - Fraction(ra[a] * rb[b], n)) ** 2 / Fraction(ra[a] * rb[b], n)
        for (a, b), o in counts.items()
    )
    assert abs(r.chi2 - float(exact)) < 1e-6
    assert r.chi2 > 0 and r.n == n


def test_chi_square_absent_cells_fold_in(spark):
    # (x,v) never occurs: absent cell must still contribute its e
    rows = [("x", "u")] * 5 + [("y", "u")] * 5 + [("y", "v")] * 10
    df = spark.createDataFrame(rows, ["a", "b"])
    [r] = chi_square(df, "a", "b").collect()
    obs = {("x", "u"): 5, ("x", "v"): 0, ("y", "u"): 5, ("y", "v"): 10}
    ra = {"x": 5, "y": 15}
    rb = {"u": 10, "v": 10}
    expected = sum(
        (obs[(a, b)] - ra[a] * rb[b] / 20) ** 2 / (ra[a] * rb[b] / 20)
        for a in ra
        for b in rb
    )
    assert abs(r.chi2 - expected) < 1e-8


def test_chi_square_independent_is_zero(spark):
    rows = [(a, b) for a, b in itertools.product("pq", "st") for _ in range(7)]
    df = spark.createDataFrame(rows, ["a", "b"])
    [r] = chi_square(df, "a", "b").collect()
    assert r.chi2 == 0.0 and r.chi2_scaled == 0


def test_linear_fit_exact_line(spark):
    from eclipse_spark.operators.profile import linear_fit

    # y = 2x + 1 exactly -> slope 2, intercept 1, r2 = 1
    df = spark.createDataFrame(
        [("g", float(x), 2.0 * x + 1.0) for x in range(10)], ["grp", "x", "y"]
    )
    [r] = linear_fit(df, ["grp"], "x", "y").collect()
    assert r.slope == 2.0 and r.intercept == 1.0 and r.r2 == 1.0


def test_linear_fit_degenerate_null(spark):
    from eclipse_spark.operators.profile import linear_fit

    df = spark.createDataFrame(
        [("g", 5.0, 1.0), ("g", 5.0, 2.0), ("h", 1.0, 1.0)], ["grp", "x", "y"]
    )
    out = {r.grp: r for r in linear_fit(df, ["grp"], "x", "y").collect()}
    assert out["g"].slope is None  # zero x-variance
    assert out["h"].slope is None  # n < 2


def test_clustering_coefficient_known_graph(spark):
    from eclipse_spark.operators.graph import clustering_coefficient

    # triangle 1-2-3 plus pendant 3-4: coeff(1)=coeff(2)=1,
    # coeff(3)=1/3 (deg 3, one closed of three wedges), coeff(4)=NULL
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4)], ["a", "b"]
    )
    out = {r.node: r for r in clustering_coefficient(edges).collect()}
    assert out[1].coeff == 1.0 and out[1].n_triangles == 1
    assert out[2].coeff == 1.0
    assert out[3].degree == 3 and out[3].n_triangles == 1
    assert abs(out[3].coeff - round(1 / 3, 9)) < 1e-12
    assert out[4].coeff is None and out[4].n_triangles == 0
