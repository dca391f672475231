"""MapReduce pipeline surface (SURVEY §2.2): emit / reduce-by-key /
group-reduce contracts, fingerprint stability, parallelism knob."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from eclipse_spark.pipeline import Pipeline
from eclipse_spark.plans.dag import PlanNode, fingerprint_fn


def _orders(spark, sf_smoke) -> Pipeline:
    return Pipeline.from_parquet(spark, f"{sf_smoke}/orders.parquet", app="t")


def test_emit_kv_columns(spark, sf_smoke):
    kv = _orders(spark, sf_smoke).emit_kv(
        key=F.col("o_orderstatus"), value=F.col("o_orderkey")
    )
    df = kv.to_df()
    assert df.columns == ["key", "value"]
    assert dict(df.dtypes) == {"key": "string", "value": "string"}


def test_emit_kv_fn_multi_emit(spark, sf_smoke):
    docs = Pipeline.from_parquet(spark, f"{sf_smoke}/documents.parquet", app="wc")

    def tokenize(pdf: pd.DataFrame) -> pd.DataFrame:
        toks = pdf["text"].str.lower().str.split().explode().dropna()
        return pd.DataFrame({"key": toks, "value": "1"})

    out = docs.emit_kv(fn=tokenize).count_by_key().to_df()
    # cross-check against the pure-SQL word count
    from eclipse_spark import apps

    expected = {
        r["word"]: r["cnt"]
        for r in apps.word_count(
            spark.read.parquet(f"{sf_smoke}/documents.parquet")
        ).collect()
    }
    got = {r["key"]: int(r["value"]) for r in out.collect()}
    assert got == expected


def test_group_reduce_arbitrary_fn(spark, sf_smoke):
    out = (
        _orders(spark, sf_smoke)
        .emit_kv(key=F.col("o_orderstatus"), value=F.col("o_totalprice"))
        .group_reduce(lambda key, values: [f"{key}:{len(values)}"])
        .to_df()
        .collect()
    )
    orders = spark.read.parquet(f"{sf_smoke}/orders.parquet")
    expected = {
        r["o_orderstatus"]: r["n"]
        for r in orders.groupBy("o_orderstatus").agg(F.count("*").alias("n")).collect()
    }
    got = {r["key"]: r["out"] for r in out}
    assert got == {k: f"{k}:{v}" for k, v in expected.items()}


def test_group_reduce_sorted_values(spark):
    df = spark.createDataFrame(
        [("a", "3"), ("a", "1"), ("a", "2"), ("b", "9")], ["key", "value"]
    )
    p = Pipeline.from_df(spark, df, label="kv", app="t")
    out = p.group_reduce(lambda k, vs: [",".join(vs)], sort_values=True).to_df()
    got = {r["key"]: r["out"] for r in out.collect()}
    assert got == {"a": "1,2,3", "b": "9"}


def test_parallelism_knob(spark, sf_smoke):
    p = _orders(spark, sf_smoke).parallelism(7)
    assert p.to_df().rdd.getNumPartitions() == 7


def test_fingerprint_changes_with_plan(spark, sf_smoke):
    base = _orders(spark, sf_smoke)
    a = base.emit_kv(key=F.col("o_orderstatus"), value=F.lit(1))
    b = base.emit_kv(key=F.col("o_orderpriority"), value=F.lit(1))
    assert a.fingerprint() != b.fingerprint()
    assert a.fingerprint() == base.emit_kv(
        key=F.col("o_orderstatus"), value=F.lit(1)
    ).fingerprint()


def test_fingerprint_fn_sensitivity():
    f1 = lambda x: x + 1  # noqa: E731
    f2 = lambda x: x + 2  # noqa: E731
    f1b = lambda x: x + 1  # noqa: E731
    assert fingerprint_fn(f1) != fingerprint_fn(f2)
    assert fingerprint_fn(f1) == fingerprint_fn(f1b)


def test_fingerprint_fn_sees_closure_values():
    # Two parameterized UDFs differing ONLY in the captured value must
    # not collide — a collision makes the semantic cache serve silently
    # wrong results (ADVICE r1, medium).
    def make(k):
        return lambda x: x + k

    assert fingerprint_fn(make(2)) != fingerprint_fn(make(3))
    assert fingerprint_fn(make(2)) == fingerprint_fn(make(2))


def test_fingerprint_fn_sees_defaults_and_partials():
    import functools

    def g1(x, k=2):
        return x + k

    def g2(x, k=3):
        return x + k

    # identical bytecode, different default value
    assert fingerprint_fn(g1) != fingerprint_fn(g2)

    base = lambda x, k: x + k  # noqa: E731
    assert fingerprint_fn(functools.partial(base, k=2)) != fingerprint_fn(
        functools.partial(base, k=3)
    )
    assert fingerprint_fn(functools.partial(base, k=2)) == fingerprint_fn(
        functools.partial(base, k=2)
    )


def test_fingerprint_fn_nested_code_stable():
    # Nested lambdas used to be repr()'d, embedding memory addresses —
    # two structurally identical outer functions (fresh inner code
    # objects each call) must fingerprint identically.
    def outer_a():
        inner = lambda y: y * 2  # noqa: E731
        return inner

    src = "def outer_b():\n    inner = lambda y: y * 2\n    return inner\n"
    ns: dict = {}
    exec(compile(src, "<t>", "exec"), ns)
    f_a = outer_a
    f_b = ns["outer_b"]
    assert fingerprint_fn(f_a) == fingerprint_fn(f_b)


def test_plan_node_fingerprint_structure():
    a = PlanNode.leaf("scan", table="t", version=1)
    b = PlanNode.leaf("scan", table="t", version=2)
    assert a.fingerprint() != b.fingerprint()
    assert a.child("filter", cond="x>1").fingerprint() != a.fingerprint()
