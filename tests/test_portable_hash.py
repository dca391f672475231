"""Cross-engine pins for the portable-hash layer.

Three contracts keep the driver's hash-checked oracles honest:

1. ``portable_hash60`` (Spark md5+conv) == DuckDB's hex-parse of the
   same md5 substring == Python's ``int(md5hex[:15], 16)``.
2. ``rot60``/``portable_seeded_hashes`` bit algebra matches the DuckDB
   mirror expressions used in ``__spark_entry__``'s oracle builders.
3. The pure-Python XXH64 replica in ``__spark_entry__`` matches
   Spark's ``xxhash64`` over INT chains — the basis for inlining
   sign-sketch hyperplane weights as oracle literals.
"""

import hashlib
import os
import sys

import duckdb
import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from eclipse_spark.functions.scalar import (
    portable_hash60,
    portable_seeded_hashes,
    rot60,
)

WORDS = ["hello", "", "a", "the quick brown fox", "ünïcode-ish", "x" * 300]


def _py_hash60(s: str, part: int = 0) -> int:
    h = hashlib.md5(s.encode("utf-8")).hexdigest()
    return int(h[15 * part : 15 * part + 15], 16)


def test_portable_hash60_three_engines(spark):
    from __spark_entry__ import _sql_hex15

    df = spark.createDataFrame([(w,) for w in WORDS], ["s"])
    got = (
        df.select("s", F.md5("s").alias("m"))
        .select(
            "s",
            portable_hash60(F.col("m"), 0).alias("v"),
            portable_hash60(F.col("m"), 1).alias("u"),
        )
        .collect()
    )
    con = duckdb.connect()
    for r in got:
        assert r["v"] == _py_hash60(r["s"], 0)
        assert r["u"] == _py_hash60(r["s"], 1)
        dv, du = con.sql(
            f"SELECT {_sql_hex15('md5(?)', 0)} AS v, {_sql_hex15('md5(?)', 1)} AS u",
            params=[r["s"], r["s"]],
        ).fetchone()
        assert (dv, du) == (r["v"], r["u"])


def test_rot60_family_matches_duckdb(spark):
    from __spark_entry__ import _sql_rot60

    vals = [0, 1, (1 << 60) - 1, 0x123456789ABCDEF, 0xFEDCBA987654321]
    df = spark.createDataFrame([(v, u) for v in vals[:2] for u in vals], ["v", "u"])
    n = 8
    fam = portable_seeded_hashes(F.col("v"), F.col("u"), n)
    rows = df.select(
        "v", "u", *[h.alias(f"h{i}") for i, h in enumerate(fam)]
    ).collect()
    con = duckdb.connect()
    for r in rows:
        exprs = ", ".join(
            f"xor({r['v']}, {_sql_rot60(str(r['u']), i)}) AS h{i}" for i in range(n)
        )
        dd = con.sql(f"SELECT {exprs}").fetchone()
        for i in range(n):
            assert dd[i] == r[f"h{i}"], (r["v"], r["u"], i)


def test_xxh64_replica_matches_spark(spark):
    from __spark_entry__ import _spark_xxhash64_ints

    cases = [(p, d, s) for p in (0, 1, 11) for d in (0, 63, 1000) for s in (7, 42)]
    cols = [
        F.xxhash64(F.lit(p), F.lit(d), F.lit(s)).alias(f"x{i}")
        for i, (p, d, s) in enumerate(cases)
    ]
    row = spark.range(1).select(*cols).collect()[0]
    for i, (p, d, s) in enumerate(cases):
        assert row[f"x{i}"] == _spark_xxhash64_ints([p, d, s]), (p, d, s)


def test_plane_weights_match_sign_sketch(spark, sf_smoke):
    """The inlined oracle weights reproduce sign_sketch_df's buckets."""
    from __spark_entry__ import _emb_dim, _plane_weight, _sql_sign_bucket

    from eclipse_spark.operators.similarity import sign_sketch_df

    emb = spark.read.parquet(os.path.join(sf_smoke, "embeddings.parquet")).limit(50)
    sk = {
        r["id"]: r["bucket"]
        for r in sign_sketch_df(emb, "vec_id", "embedding", 6, 7, "id", "v").collect()
    }
    con = duckdb.connect()
    bucket = _sql_sign_bucket("embedding", 6, 7, _emb_dim())
    dd = con.sql(
        f"SELECT vec_id, {bucket} AS b FROM "
        f"(SELECT * FROM '{os.path.join(sf_smoke, 'embeddings.parquet')}' LIMIT 50)"
    ).fetchall()
    assert len(dd) == len(sk)
    for vid, b in dd:
        assert sk[vid] == b, vid
    # and the weight fn itself is the documented formula
    assert -1.0 <= _plane_weight(0, 0, 7) < 1.0
