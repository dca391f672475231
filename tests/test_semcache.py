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


# -- cross-query SUBPLAN reuse (VERDICT r6 task 6) ----------------------


def _traced_tokenizer(trace_dir: str):
    """Expensive-stage stand-in whose executions are observable: every
    Arrow batch it processes drops a marker file, so tests can assert
    the stage was SKIPPED (no new markers) when served from the cache.
    One shared fn object => one bytecode+closure fingerprint across
    pipelines, which is what makes their prefixes identical."""

    def fn(pdf):
        import os
        import uuid

        os.makedirs(trace_dir, exist_ok=True)
        with open(os.path.join(trace_dir, uuid.uuid4().hex), "w") as fh:
            fh.write("x")
        return pd.DataFrame(
            {
                "key": pdf["text"].str.lower().str.split().explode().dropna(),
                "value": "1",
            }
        )

    return fn


def _n_traces(trace_dir: str) -> int:
    import os

    return len(os.listdir(trace_dir)) if os.path.exists(trace_dir) else 0


def test_staged_prefix_reused_by_different_pipeline(spark, sf_smoke, tmp_path):
    """Pipeline B (different app, different tail) must serve pipeline
    A's staged tokenize prefix from the cache on B's COLD run: the
    traced stage executes zero new batches for B, the interior hit is
    counted, and B's result equals its uncached recompute."""
    cat = Catalog(spark, str(tmp_path / "tables"))
    cat.put("docs", spark.read.parquet(f"{sf_smoke}/documents.parquet"))
    cache = SemanticCache(spark, str(tmp_path / "cache"))
    trace = str(tmp_path / "trace")
    tok = _traced_tokenizer(trace)

    a = (
        Pipeline.from_table(cat, "docs", app="curate")
        .emit_kv(fn=tok)
        .stage()
        .count_by_key()
        .cached(cache)
    )
    _, hit_a = a.run()
    assert hit_a is False
    t_after_a = _n_traces(trace)
    assert t_after_a > 0

    def _b_pipeline():
        return (
            Pipeline.from_table(cat, "docs", app="filter")
            .emit_kv(fn=tok)
            .reduce_by_key(F.count("*"), alias="n")
        )

    hits_before = cache.stats.hits
    df_b, hit_b = _b_pipeline().cached(cache).run()
    rows_b = sorted((r["key"], r["n"]) for r in df_b.collect())
    assert hit_b is False  # different full plan: B is a cold run...
    assert cache.stats.hits == hits_before + 1  # ...served A's interior
    assert _n_traces(trace) == t_after_a  # tokenize stage NOT re-executed
    rows_ref = sorted(
        (r["key"], r["n"]) for r in _b_pipeline().to_df().collect()
    )
    assert rows_b == rows_ref


def test_unstaged_recurring_prefix_auto_promotes(spark, sf_smoke, tmp_path):
    """No stage() anywhere: run A records the shared prefix (sighting
    1, nothing materialized), run B's second sighting promotes it (B
    still computes it, and writes it through), run C serves it — C's
    traced stage executes zero new batches."""
    cat = Catalog(spark, str(tmp_path / "tables"))
    cat.put("docs", spark.read.parquet(f"{sf_smoke}/documents.parquet"))
    cache = SemanticCache(spark, str(tmp_path / "cache"))
    trace = str(tmp_path / "trace")
    tok = _traced_tokenizer(trace)

    def _pipe(app: str, tail):
        return tail(
            Pipeline.from_table(cat, "docs", app=app).emit_kv(fn=tok)
        ).cached(cache)

    _pipe("a1", lambda p: p.count_by_key()).run()
    t1 = _n_traces(trace)
    assert t1 > 0

    _pipe("a2", lambda p: p.reduce_by_key(F.count("*"), alias="n")).run()
    t2 = _n_traces(trace)
    assert t2 > t1  # B is the promoting run: it still computes the stage

    _pipe("a3", lambda p: p.reduce_by_key(F.max("value"), alias="m")).run()
    assert _n_traces(trace) == t2  # C serves the promoted prefix


def test_subplan_reuse_invalidated_by_input_mutation(spark, sf_smoke, tmp_path):
    """The interior key covers the input snapshot version: mutating the
    table after A's staged run must force B to RECOMPUTE (no stale
    interior hit) and B's result must reflect the mutated input."""
    cat = Catalog(spark, str(tmp_path / "tables"))
    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    cat.put("docs", docs)
    cache = SemanticCache(spark, str(tmp_path / "cache"))
    trace = str(tmp_path / "trace")
    tok = _traced_tokenizer(trace)

    (
        Pipeline.from_table(cat, "docs", app="curate")
        .emit_kv(fn=tok)
        .stage()
        .count_by_key()
        .cached(cache)
        .run()
    )
    t1 = _n_traces(trace)

    cat.put("docs", docs.limit(7))  # version bump: new input snapshot
    df_b, hit_b = (
        Pipeline.from_table(cat, "docs", app="filter")
        .emit_kv(fn=tok)
        .reduce_by_key(F.count("*"), alias="n")
        .cached(cache)
        .run()
    )
    assert hit_b is False
    assert _n_traces(trace) > t1  # stage re-executed on the new snapshot
    total = df_b.agg(F.sum("n")).collect()[0][0]
    exp = (
        cat.get("docs")
        .select(F.explode(F.split(F.lower("text"), r"\s+")).alias("t"))
        .filter(F.col("t") != "")
        .count()
    )
    assert total == exp
