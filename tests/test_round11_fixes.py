"""Round-11 fixes and additions.

- ADVICE r10 (dedup.py:1536): Lloyd-mean centroid collect must be
  cell-ordered or argmax tie-breaks flip run-to-run.
- VERDICT r10 task 1: run_concurrent bounded admission (the 64-thread
  GIL/py4j contention floor) — semantics preserved, cap honored.
- VERDICT r10 task 8: minhash_bucket_rollup (streaming-compatible
  per-row signature) must bucket BIT-IDENTICALLY to the batch
  portable family, and the streaming query must co-bucket every
  planted duplicate with its original in all bands.
- lineage_audit staleness/hit semantics.
"""

from __future__ import annotations

import os
import sys
import threading
import time

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_semdedup_scaled_assignments_deterministic(spark, sf_smoke):
    """Two runs over the same input must produce identical keep sets
    (ADVICE r10: the un-ordered Lloyd partial collect let argmax tie
    points flip cells run-to-run; the driver-side sort restores the
    pre-refactor determinism)."""
    from eclipse_spark.operators.dedup import semantic_dedup_scaled

    emb = spark.read.parquet(os.path.join(sf_smoke, "embeddings.parquet"))
    allv = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )

    def run():
        out = semantic_dedup_scaled(
            allv, threshold=0.95, target_cell_size=16, n_iter=2
        )
        return sorted(r["vec_id"] for r in out.select("vec_id").collect())

    assert run() == run()


def test_run_concurrent_order_and_cap():
    """Results come back in submission order and in-flight concurrency
    never exceeds the explicit max_workers cap."""
    from eclipse_spark.session import run_concurrent
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    live = 0
    peak = 0
    lock = threading.Lock()

    def mk(i):
        def thunk():
            nonlocal live, peak
            with lock:
                live += 1
                peak = max(peak, live)
            time.sleep(0.02)
            with lock:
                live -= 1
            return i

        return thunk

    got = run_concurrent(spark, [mk(i) for i in range(24)], max_workers=4)
    assert got == list(range(24))
    assert peak <= 4
    # default cap: still returns everything in order
    got = run_concurrent(spark, [mk(i) for i in range(8)])
    assert got == list(range(8))


def test_minhash_bucket_rollup_matches_batch_family(spark, sf_smoke):
    """The per-row HOF signature path (streaming formulation) must
    bucket bit-identically to the batch explode+groupBy portable
    family — same (band, bh, rep_id, n_docs) rollup."""
    from eclipse_spark.operators.dedup import (
        _minhash_banded,
        minhash_bucket_rollup,
        minhash_signatures_df,
    )

    docs = spark.read.parquet(
        os.path.join(sf_smoke, "documents.parquet")
    ).select("doc_id", "text")
    batch_sig = minhash_signatures_df(
        docs, num_hashes=16, shingle_k=5, portable=True
    )
    batch = (
        _minhash_banded(batch_sig, 16, 4, portable=True)
        .groupBy("band", "bh")
        .agg(
            F.min("id").alias("rep_id"),
            F.count("*").cast("long").alias("n_docs"),
        )
    )
    stream_form = minhash_bucket_rollup(
        docs, num_hashes=16, bands=4, shingle_k=5
    )
    a = {tuple(r) for r in batch.collect()}
    b = {tuple(r) for r in stream_form.collect()}
    assert a == b and len(a) > 0


def test_minhash_bucket_rollup_planted_cobucket(spark, sf_smoke):
    """A planted whitespace-mutated copy has the identical shingle set,
    hence identical signature, hence shares ALL 4 band buckets with
    its original — and the min-id representative is the original."""
    from eclipse_spark.operators.dedup import minhash_bucket_rollup

    docs = spark.read.parquet(
        os.path.join(sf_smoke, "documents.parquet")
    ).select("doc_id", "text")
    planted = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.regexp_replace("text", " ", "  ").alias("text"),
    )
    n_planted = planted.count()
    rollup = minhash_bucket_rollup(
        docs.unionByName(planted), num_hashes=16, bands=4, shingle_k=5
    )
    # every planted id contributes 4 band rows, all in buckets whose
    # representative is < 100000 (its original has the smaller id)
    dup_buckets = rollup.filter(
        (F.col("n_docs") >= 2) & (F.col("rep_id") < 100000)
    )
    assert dup_buckets.count() >= 4  # at least one dup class per band
    # recall: no bucket's representative is a planted id unless the
    # bucket holds ONLY planted ids (impossible here: originals exist)
    assert (
        rollup.filter(
            (F.col("rep_id") >= 100000) & (F.col("n_docs") >= 2)
        ).count()
        == 0
        or n_planted == 0
    )


def test_stream_near_dedup_equals_batch(spark, sf_smoke):
    """The drained complete-mode streaming rollup equals the batch
    rollup over the same corpus (order-independent aggregates)."""
    import __spark_entry__ as em
    from eclipse_spark.operators.dedup import minhash_bucket_rollup

    streamed = em.q_stream_near_dedup(spark, sf_smoke)
    docs = spark.read.parquet(
        os.path.join(sf_smoke, "documents.parquet")
    ).select("doc_id", "text")
    planted = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.regexp_replace("text", " ", "  ").alias("text"),
    )
    batch = minhash_bucket_rollup(
        docs.unionByName(planted), num_hashes=16, bands=4, shingle_k=5
    ).filter(F.col("n_docs") >= 2)
    assert {tuple(r) for r in streamed.collect()} == {
        tuple(r) for r in batch.collect()
    }


def test_lineage_audit_semantics(spark, sf_smoke):
    """Staleness and hit accounting: app_a was built at v1 (stale once
    the table advanced, served 1 cache hit); app_b was built at the
    current version (fresh, 0 hits); three table versions retained."""
    import __spark_entry__ as em

    rows = {
        (r["kind"], r["name"], r["version"]): r
        for r in em.q_lineage_audit(spark, sf_smoke).collect()
    }
    assert len(rows) == 5
    a = rows[("cache", "lineage_app_a", 1)]
    assert a["stale"] == 1 and a["n_hits"] == 1
    b = rows[("cache", "lineage_app_b", 3)]
    assert b["stale"] == 0 and b["n_hits"] == 0
    v = [rows[("table", "lin_orders", i)]["n_rows"] for i in (1, 2, 3)]
    assert v[0] < v[1] <= v[2]  # upserts only ever add keys here
