"""The MapReduce pipeline surface (SURVEY §2.2 D1-D7) re-expressed on
DataFrames.

Eclipse's entire user API is four calls inside a C++ binary
(``src/mapreduce/dht/mapreduce.hh:29-50``):

- ``set_mapper(fn)`` + ``get_nextrecord()`` loop   -> :meth:`Pipeline.map_records`
- ``write_keyvalue(k, v)``                          -> :meth:`Pipeline.emit_kv`
- ``set_reducer(fn)`` + ``get_nextvalue()`` loop    -> :meth:`Pipeline.group_reduce`
  (associative fast path: :meth:`Pipeline.reduce_by_key`)
- ``write_output(rec)``                             -> :meth:`Pipeline.write`
- ``set_nummapper/set_numreducer`` (``mapreduce.hh:1087-1095``)
                                                    -> :meth:`Pipeline.parallelism`
- ``enable_Icache()`` (``mapreduce.hh:1102-1105``)  -> :meth:`Pipeline.cached`

Execution-model mapping: Eclipse's map-time hash routing of pairs to
``h(key)%N`` (``src/file_distributor/idistributor.hh:85-125``) IS a
shuffle write; its iwriter/ireader sorted-spill machinery
(``iwriter.hh``/``ireader.hh``) IS Tungsten sort-based shuffle; its
MAP->REDUCE barrier (``master.cc:783-855``) IS a stage boundary. None
of that is reimplemented — we declare the plan and let Spark execute.

Value-ordering contract matches the reference: grouped values arrive
in no guaranteed order (Eclipse merges spill blocks by key only,
SURVEY §3.3); pass ``sort_values=True`` for the explicitly-ordered
variant.

Scale notes: ``emit_kv``/``group_reduce`` with Python callables use
Arrow-batched pandas execution (``mapInPandas``/``applyInPandas``),
never row-at-a-time UDFs. Column-expression fast paths stay entirely
JVM-side. ``reduce_by_key`` gets map-side partial aggregation for
free from ``groupBy().agg()``.
"""

from __future__ import annotations

from typing import Any, Callable, Iterable, Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from eclipse_spark.plans.dag import PlanNode, fingerprint_fn
from eclipse_spark.semcache import SemanticCache
from eclipse_spark.storage import Catalog

KV_SCHEMA = "key string, value string"


class Pipeline:
    """A fluent op chain: each method extends both the DataFrame plan
    and the engine op-DAG (for semantic-cache fingerprinting)."""

    def __init__(
        self,
        spark: SparkSession,
        df: DataFrame,
        dag: PlanNode,
        app: str = "app",
        cache: SemanticCache | None = None,
    ):
        self.spark = spark
        self.df = df
        self.dag = dag
        self.app = app
        self._cache = cache

    # -- constructors ---------------------------------------------------
    @classmethod
    def from_table(cls, catalog: Catalog, name: str, app: str = "app") -> "Pipeline":
        info = catalog.info(name)
        dag = PlanNode.leaf("scan", table=name, version=info.version)
        return cls(catalog.spark, catalog.get(name), dag, app=app)

    @classmethod
    def from_parquet(cls, spark: SparkSession, path: str, app: str = "app") -> "Pipeline":
        import os

        mtime = os.path.getmtime(path) if os.path.exists(path) else 0
        dag = PlanNode.leaf("scan", path=path, mtime=mtime)
        return cls(spark, spark.read.parquet(path), dag, app=app)

    @classmethod
    def from_df(cls, spark: SparkSession, df: DataFrame, label: str, app: str = "app") -> "Pipeline":
        return cls(spark, df, PlanNode.leaf("df", label=label), app=app)

    def _next(self, df: DataFrame, op: str, **params: Any) -> "Pipeline":
        return Pipeline(self.spark, df, self.dag.child(op, **params), self.app, self._cache)

    # -- map phase ------------------------------------------------------
    def map_records(self, fn: Callable[[pd.DataFrame], pd.DataFrame], schema: str) -> "Pipeline":
        """D1 Map with arbitrary per-batch logic (Arrow-vectorized).

        ``fn`` receives/returns pandas DataFrames; ``schema`` is the
        output DDL. This is the escape hatch preserving Eclipse's
        "mapper is arbitrary user code" semantics."""

        def _runner(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                out = fn(pdf)
                if out is not None and len(out):
                    yield out

        return self._next(
            self.df.mapInPandas(_runner, schema=schema),
            "map_records",
            fn=fingerprint_fn(fn),
            schema=schema,
        )

    def select(self, *cols: str | Column) -> "Pipeline":
        """D1 fast path: projection stays JVM-side (column pruning
        reaches the parquet scan)."""
        return self._next(self.df.select(*cols), "select", cols=_cols_key(cols))

    def filter(self, cond: str | Column) -> "Pipeline":
        """D1 fast path: predicate stays JVM-side (pushdown)."""
        return self._next(self.df.filter(cond), "filter", cond=str(cond))

    def with_column(self, name: str, col: Column) -> "Pipeline":
        return self._next(self.df.withColumn(name, col), "with_column", name=name, col=str(col))

    # -- emit (shuffle write) ------------------------------------------
    def emit_kv(
        self,
        key: Column | None = None,
        value: Column | None = None,
        fn: Callable[[pd.DataFrame], pd.DataFrame] | None = None,
    ) -> "Pipeline":
        """D2 ``write_keyvalue``: produce the (key, value) string pair
        stream. Column-expression form is pure JVM; ``fn`` form takes a
        pandas batch and returns a 2-col (key, value) frame for
        flatMap-style multi-emit (e.g. tokenization)."""
        if fn is not None:
            def _runner(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
                for pdf in batches:
                    out = fn(pdf)
                    if out is not None and len(out):
                        yield out[["key", "value"]].astype(str)

            return self._next(
                self.df.mapInPandas(_runner, schema=KV_SCHEMA),
                "emit_kv",
                fn=fingerprint_fn(fn),
            )
        assert key is not None
        value = value if value is not None else F.lit("1")
        out = self.df.select(
            key.cast("string").alias("key"), value.cast("string").alias("value")
        )
        return self._next(out, "emit_kv", key=str(key), value=str(value))

    # -- reduce phase ---------------------------------------------------
    def reduce_by_key(self, agg: Column, alias: str = "value") -> "Pipeline":
        """D5 associative fast path: per-key aggregate with map-side
        combine (the scalable default — use this, not group_reduce,
        when the reduce fn is associative)."""
        out = self.df.groupBy("key").agg(agg.alias(alias))
        return self._next(out, "reduce_by_key", agg=str(agg), alias=alias)

    def count_by_key(self) -> "Pipeline":
        return self.reduce_by_key(F.count("*"), alias="value")

    def group_reduce(
        self,
        fn: Callable[[str, list[str]], Iterable[str]],
        sort_values: bool = False,
    ) -> "Pipeline":
        """D3+D4+D5: arbitrary per-key reduce. ``fn(key, values)``
        yields output records (strings), exactly the
        ``get_nextvalue()``/``write_output()`` loop contract.

        Values are unordered unless ``sort_values`` (SURVEY §3.3).
        Executed with ``applyInPandas`` — one Arrow batch per key
        group; skewed hot keys are AQE's problem at the shuffle and the
        salting helper's (operators/skew.py) above it."""

        def _reduce(pdf: pd.DataFrame) -> pd.DataFrame:
            key = str(pdf["key"].iloc[0])
            values = pdf["value"].astype(str).tolist()
            if sort_values:
                values.sort()
            return pd.DataFrame({"key": key, "out": list(fn(key, values))})

        out = self.df.groupBy("key").applyInPandas(_reduce, schema="key string, out string")
        return self._next(
            out, "group_reduce", fn=fingerprint_fn(fn), sort_values=sort_values
        )

    # -- knobs ----------------------------------------------------------
    def parallelism(self, n: int, *cols: str) -> "Pipeline":
        """D7 ``set_nummapper``/``set_numreducer``: explicit partition
        count (advisory in Eclipse too — ``master.cc:750-753``)."""
        df = self.df.repartition(n, *cols) if cols else self.df.repartition(n)
        return self._next(df, "parallelism", n=n, cols=",".join(cols))

    # -- caching (Orthrus) ---------------------------------------------
    def cached(self, cache: SemanticCache) -> "Pipeline":
        """``enable_Icache()``: attach the semantic cache; ``run()``
        will consult/populate it."""
        return Pipeline(self.spark, self.df, self.dag, self.app, cache)

    def fingerprint(self) -> str:
        return PlanNode.merge("app", (self.dag,), app=self.app).fingerprint()

    # -- actions --------------------------------------------------------
    def run(self) -> tuple[DataFrame, bool]:
        """Materialize through the semantic cache if attached.
        Returns (result, was_cache_hit) — the map-skip analogue
        (``mapreduce.hh:861-884``) generalized to whole plans."""
        if self._cache is None:
            return self.df, False
        return self._cache.get_or_compute(self.fingerprint(), lambda: self.df)

    def write(self, catalog: Catalog, name: str) -> str:
        """``write_output`` -> Owrite-append to a named table."""
        df, _ = self.run()
        return catalog.write(name, df)

    def to_df(self) -> DataFrame:
        return self.df


def _cols_key(cols: tuple) -> str:
    return ",".join(str(c) for c in cols)
