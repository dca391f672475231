"""Local replica of the driver's correctness gate: every queries()
entry with an oracle_sql() runs on Spark AND DuckDB at sf0.01; row
count, schema shape, and exact values must match (order-insensitive,
columns sorted by name) — stricter than the driver's hash compare, so
passing here predicts CORRECTNESS green."""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

ORACLES = entrymod.oracle_sql()
QUERIES = entrymod.queries()


def _duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif pd.api.types.is_datetime64_any_dtype(s):
            df[c] = pd.to_datetime(s).astype("datetime64[us]")
        elif s.dtype == object:
            df[c] = s.astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, sf_correct, name):
    q = QUERIES[name]
    spark_pdf = _normalize(q(spark, sf_correct).toPandas())
    con = _duck(sf_correct)
    duck_pdf = _normalize(con.sql(ORACLES[name]).df())
    con.close()

    # vacuity guard: an oracle that returns ZERO rows makes the whole
    # compare pass trivially (caught live: the first lsh_s_curve corpus
    # had no shingle overlap at all — 0 == 0 green, checking nothing).
    # Every registered oracle is required to produce evidence.
    assert len(duck_pdf) > 0, f"{name}: oracle returned no rows — vacuous check"
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: row count {len(spark_pdf)} != {len(duck_pdf)}"
    )
    assert list(spark_pdf.columns) == list(duck_pdf.columns), (
        f"{name}: columns {list(spark_pdf.columns)} != {list(duck_pdf.columns)}"
    )
    pd.testing.assert_frame_equal(
        spark_pdf, duck_pdf, check_dtype=False, check_exact=True, obj=name
    )


def test_all_queries_run(spark, sf_smoke):
    """Queries without an oracle still must run and return a schema."""
    no_oracle = set(QUERIES) - set(ORACLES)
    for name in sorted(no_oracle):
        df = QUERIES[name](spark, sf_smoke)
        assert df.columns, name
        assert df.count() >= 0, name


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0


def test_registry_contract():
    """Registry invariants the driver depends on: every window entry
    (first 50) is oracle-backed, oracle keys are a subset of query
    keys, and names are unique and stable-formatted."""
    names = list(QUERIES)
    assert len(names) == len(set(names))
    assert set(ORACLES) <= set(QUERIES)
    window = names[:50]
    missing = [n for n in window if n not in ORACLES]
    assert not missing, f"window entries without oracles: {missing}"
    assert all(n.replace("_", "").isalnum() for n in names)
