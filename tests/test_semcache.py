"""Semantic cache (Orthrus-equivalent) semantics per FIXTURES F6:
hit on identical (app, input) re-run, byte-identical output, miss
after input version change, LRU eviction under budget."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from eclipse_spark.pipeline import Pipeline
from eclipse_spark.semcache import SemanticCache
from eclipse_spark.storage import Catalog


def _wc_pipeline(cat: Catalog, cache: SemanticCache) -> Pipeline:
    return (
        Pipeline.from_table(cat, "docs", app="wc")
        .emit_kv(
            fn=lambda pdf: pd.DataFrame(
                {"key": pdf["text"].str.lower().str.split().explode().dropna(), "value": "1"}
            )
        )
        .count_by_key()
        .cached(cache)
    )


def test_hit_and_identical_output(spark, sf_smoke, tmp_path):
    cat = Catalog(spark, str(tmp_path / "tables"))
    cat.put("docs", spark.read.parquet(f"{sf_smoke}/documents.parquet"))
    cache = SemanticCache(spark, str(tmp_path / "cache"))

    df1, hit1 = _wc_pipeline(cat, cache).run()
    rows1 = sorted((r["key"], r["value"]) for r in df1.collect())
    df2, hit2 = _wc_pipeline(cat, cache).run()
    rows2 = sorted((r["key"], r["value"]) for r in df2.collect())

    assert (hit1, hit2) == (False, True)
    assert rows1 == rows2
    assert cache.stats.hits == 1 and cache.stats.misses == 1


def test_miss_after_input_change(spark, sf_smoke, tmp_path):
    cat = Catalog(spark, str(tmp_path / "tables"))
    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    cat.put("docs", docs)
    cache = SemanticCache(spark, str(tmp_path / "cache"))

    _, hit1 = _wc_pipeline(cat, cache).run()
    cat.put("docs", docs.limit(10))  # version bump = new snapshot
    _, hit2 = _wc_pipeline(cat, cache).run()
    assert (hit1, hit2) == (False, False)


def test_lru_eviction(spark, tmp_path):
    cache = SemanticCache(spark, str(tmp_path / "cache"), budget_bytes=1)
    df = spark.range(10)
    cache.materialize("fp_a", df)
    cache.materialize("fp_b", df)
    # budget of 1 byte: materializing b must evict a (a is LRU tail)
    assert cache.lookup("fp_a") is None
    assert cache.stats.evictions >= 1


def test_lookup_pins_against_eviction(spark, tmp_path):
    # ADVICE r1: a DataFrame returned by lookup() is a lazy read over
    # the cache path; later eviction must not delete its files before
    # the caller executes the plan.
    cache = SemanticCache(spark, str(tmp_path / "cache"), budget_bytes=1)
    cache.materialize("fp_a", spark.range(10))
    held = cache.lookup("fp_a")  # pins fp_a for the session
    cache.materialize("fp_b", spark.range(10))  # over budget -> wants to evict a
    assert held.count() == 10  # plan still executes
    cache.unpin("fp_a")
    cache.materialize("fp_c", spark.range(10))
    assert cache.lookup("fp_a") is None  # evictable again after unpin


def test_invalidate(spark, tmp_path):
    cache = SemanticCache(spark, str(tmp_path / "cache"))
    cache.materialize("fp_x", spark.range(5))
    assert cache.lookup("fp_x") is not None
    cache.invalidate("fp_x")
    assert cache.lookup("fp_x") is None


def test_two_sessions_share_root_without_losing_registrations(spark, tmp_path):
    """VERDICT r5 task 4: hits must not rewrite the manifest (the old
    write-and-rename was last-writer-wins and could drop a concurrent
    session's fresh registration). Two SemanticCache instances on one
    root: each registers its own entry, each hammers hits on its own —
    a fresh third instance must see BOTH."""
    root = str(tmp_path / "shared")
    a = SemanticCache(spark, root)
    b = SemanticCache(spark, root)
    a.materialize("fp_a", spark.range(3))
    b.materialize("fp_b", spark.range(4))  # b merges: must not drop fp_a
    # hits on stale in-memory views must not clobber the other session
    for _ in range(3):
        assert a.lookup("fp_a") is not None
        assert b.lookup("fp_b") is not None
    # a's view predates fp_b's registration; a structural write from a
    # (a third entry) must still preserve fp_b via the merge
    a.materialize("fp_c", spark.range(5))
    fresh = SemanticCache(spark, root)
    assert fresh.lookup("fp_a") is not None
    assert fresh.lookup("fp_b") is not None
    assert fresh.lookup("fp_c") is not None
    assert fresh.stats.misses == 0


def test_cross_session_hit_after_peer_registration(spark, tmp_path):
    """A session constructed BEFORE a peer registered an entry must
    still hit on it (manifest reloaded when the parquet exists but the
    in-memory view doesn't know it)."""
    root = str(tmp_path / "shared2")
    early = SemanticCache(spark, root)
    late = SemanticCache(spark, root)
    late.materialize("fp_z", spark.range(7))
    got = early.lookup("fp_z")
    assert got is not None and got.count() == 7
    assert early.stats.hits == 1
