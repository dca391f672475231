"""Physical-plan hygiene gates — the 100 TB posture checks.

Correctness tests prove results; these prove the *plans* are the ones
we'd want on a 1000-executor cluster: filters reach the parquet scan,
small dims broadcast, windows/aggs reuse a single shuffle, and scans
prune to the referenced columns.
"""

from __future__ import annotations

import contextlib
import io
import re
import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod

QUERIES = entrymod.queries()


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _n_exchanges(plan: str) -> int:
    # count shuffle exchanges only (not BroadcastExchange)
    return len(re.findall(r"\n\(\d+\) Exchange", plan))


def test_q6_pushdown_and_pruning(spark, sf_smoke):
    plan = _plan(QUERIES["tpch_q6"](spark, sf_smoke))
    assert "PushedFilters" in plan and "l_shipdate" in plan.split("PushedFilters")[1].split("\n")[0]
    read_schema = plan.split("ReadSchema")[1].split("\n")[0]
    assert "l_returnflag" not in read_schema, "scan reads columns the query never touches"


def test_broadcast_joins_used(spark, sf_smoke):
    for name in ("join_orders_customer", "tpch_q5", "tpch_q3", "tpch_q10"):
        plan = _plan(QUERIES[name](spark, sf_smoke))
        assert "BroadcastHashJoin" in plan, f"{name}: dim join did not broadcast"


def test_single_shuffle_window_ops(spark, sf_smoke):
    # asof: union + one partition-by-key window => exactly 1 shuffle
    assert _n_exchanges(_plan(QUERIES["asof_join"](spark, sf_smoke))) == 1
    # running window: one partition-by-key shuffle
    assert _n_exchanges(_plan(QUERIES["window_running"](spark, sf_smoke))) == 1
    # sessionize: lag + cumsum + groupBy all ride the user_id shuffle
    assert _n_exchanges(_plan(QUERIES["events_sessionize"](spark, sf_smoke))) == 1


def test_partial_aggregation_before_shuffle(spark, sf_smoke):
    plan = _plan(QUERIES["tpch_q1"](spark, sf_smoke))
    assert plan.count("HashAggregate") >= 2, "no map-side partial aggregation"
    assert _n_exchanges(plan) == 1


def test_scalar_subquery_decorrelated(spark, sf_smoke):
    # window-decorrelated plan: no per-row subplan, bounded shuffles
    plan = _plan(QUERIES["scalar_subquery"](spark, sf_smoke))
    assert "Subquery" not in plan
    assert _n_exchanges(plan) <= 2


def test_semi_join_for_exists(spark, sf_smoke):
    plan = _plan(QUERIES["exists_subquery"](spark, sf_smoke))
    assert "LeftSemi" in plan


def test_partition_pruning_on_partitioned_table(spark, sf_smoke, tmp_path):
    """Hive-style partition layout written via Catalog.put(partition_by)
    prunes at the scan: a partition-key filter must appear as a
    PartitionFilter, not a post-scan Filter over all partitions."""
    from eclipse_spark.storage import Catalog

    cat = Catalog(spark, str(tmp_path))
    orders = spark.read.parquet(f"{sf_smoke}/orders.parquet")
    cat.put("p_orders", orders, partition_by=["o_orderstatus"])
    import pyspark.sql.functions as F

    df = cat.get("p_orders").filter(F.col("o_orderstatus") == "F").select("o_orderkey")
    plan = _plan(df)
    assert "PartitionFilters" in plan
    pf = plan.split("PartitionFilters")[1].split("\n")[0]
    assert "o_orderstatus" in pf, "partition-key predicate did not prune"


def test_bucketed_join_is_shuffle_free(spark, sf_smoke, tmp_path):
    """Two tables bucketed on the join key => sort-merge join with zero
    shuffle exchanges (SURVEY §4: the bucketBy co-location story)."""
    from eclipse_spark.storage import Catalog

    cat = Catalog(spark, str(tmp_path))
    orders = spark.read.parquet(f"{sf_smoke}/orders.parquet")
    customer = spark.read.parquet(f"{sf_smoke}/customer.parquet")
    cat.put_bucketed("b_orders", orders, ["o_custkey"], buckets=4)
    cat.put_bucketed(
        "b_customer", customer.withColumnRenamed("c_custkey", "o_custkey"),
        ["o_custkey"], buckets=4,
    )
    j = cat.get_table("b_orders").hint("merge").join(
        cat.get_table("b_customer"), on="o_custkey"
    )
    plan = _plan(j)
    assert "SortMergeJoin" in plan
    assert _n_exchanges(plan) == 0, "co-bucketed join should not shuffle"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")


def test_bucketed_layout_reused_across_workloads(spark, sf_smoke, tmp_path):
    """EM-KDE affinity analogue (SURVEY §2.2 D9): Eclipse's scheduler
    keeps repeatedly-accessed keys on the same node; here the shuffle
    is paid ONCE at put_bucketed write time and every subsequent
    same-key workload — an aggregation now, a different-shape join
    later — reads the persisted layout with zero shuffle exchanges."""
    from pyspark.sql import functions as F

    from eclipse_spark.storage import Catalog

    cat = Catalog(spark, str(tmp_path))
    orders = spark.read.parquet(f"{sf_smoke}/orders.parquet")
    cat.put_bucketed("aff_orders", orders, ["o_custkey"], buckets=4)

    # workload 1: per-key aggregation — bucketing satisfies the
    # required distribution, no Exchange
    agg = cat.get_table("aff_orders").groupBy("o_custkey").agg(F.count("*").alias("n"))
    assert _n_exchanges(_plan(agg)) == 0, "bucketed agg should not shuffle"

    # workload 2 (repeat run, different shape): self-join on the same
    # key — still zero shuffles, both sides reuse the layout
    a = cat.get_table("aff_orders").select("o_custkey", "o_totalprice")
    b = cat.get_table("aff_orders").select("o_custkey", "o_orderstatus")
    j = a.hint("merge").join(b, on="o_custkey")
    plan = _plan(j)
    assert "SortMergeJoin" in plan
    assert _n_exchanges(plan) == 0, "repeat same-key workload should reuse layout"
    spark.sql("DROP TABLE IF EXISTS aff_orders")


def test_aqe_splits_skewed_join_partition(spark):
    """D9 runtime skew handling (SURVEY §2.2): Eclipse's EM-KDE moves
    hot-key boundaries between nodes; Spark's equivalent is AQE's
    OptimizeSkewedJoin, which re-splits an oversized shuffle partition
    across tasks at runtime. Gate: a 90%-one-key join executes with the
    join node marked skew=true and MORE tasks reading the join than the
    static partition count would give (the hot partition was split)."""
    import pyspark.sql.functions as F

    tuned = {
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "10KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {}
    for k, v in tuned.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    try:
        left = (
            spark.range(1_000_000)
            .withColumn(
                "key",
                F.when(F.col("id") % 10 < 9, F.lit(0)).otherwise(F.col("id") % 100),
            )
            .withColumn("pay", F.sha2(F.col("id").cast("string"), 256))
        )
        right = (
            spark.range(100)
            .withColumnRenamed("id", "key")
            .withColumn("rv", F.col("key") * 2)
        )
        res = left.join(right, "key").groupBy().agg(F.count("*").alias("n"))
        [row] = res.collect()
        assert row["n"] == 1_000_000  # inner join keeps every left row
        plan = res._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, "AQE did not split the skewed partition"
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_runtime_bloom_filter_prunes_probe_side(spark, sf_smoke):
    """Runtime filtering: a selective dimension filter must inject a
    bloom filter onto the fact-side scan (bloom_filter_agg on the
    build side / might_contain on the probe side) when broadcast is
    off — at 100 TB this is what keeps a shuffle join from scanning
    rows that can never match."""
    import pyspark.sql.functions as F

    tuned = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10GB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {}
    for k, v in tuned.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    try:
        li = spark.read.parquet(f"{sf_smoke}/lineitem.parquet")
        orders = spark.read.parquet(f"{sf_smoke}/orders.parquet").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderstatus")
            .agg(F.count("*").alias("n"))
        )
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter_agg" in plan, "no runtime bloom filter injected"
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_explain_summary_counts(spark, sf_smoke):
    from eclipse_spark.admin import explain_summary

    df = QUERIES["tpch_q5"](spark, sf_smoke)
    s = explain_summary(df)
    assert s.n_broadcasts >= 2          # dims broadcast
    assert s.n_scans >= 5
    assert s.scans_with_pushdown >= 1   # date/region filters reach scans
    assert s.wholestage_codegen is None  # AQE plan not final yet
    assert not s.has_python_udf

    df.collect()                        # finalize the adaptive plan
    assert explain_summary(df).wholestage_codegen is True

    p = explain_summary(QUERIES["pandas_udf_tokens"](spark, sf_smoke))
    assert p.has_python_udf
    assert p.n_shuffles == 0            # scalar projection, no exchange


def test_chunking_is_zero_shuffle(spark, sf_smoke):
    """Context-window chunking must be row-local: no Exchange anywhere
    (it runs at scan speed at 100 TB or it's wrong)."""
    from eclipse_spark.admin import explain_summary

    s = explain_summary(QUERIES["chunking"](spark, sf_smoke))
    assert s.n_shuffles == 0
    assert not s.has_python_udf


def test_triangle_count_size_aware_join_choice(spark, sf_smoke):
    """The adjacency-join strategy must be size-aware: a small graph's
    |V|-row adjacency broadcasts (measured 2.9s vs 22s sort-merge at
    sf0.1), but when the estimate exceeds the broadcast budget the
    SAME call must fall back to a partitioned join — |V| rows of
    O(sqrt(m)) arrays cannot sit in every executor at 100 TB."""
    from eclipse_spark.operators.graph import cooccurrence_edges, triangle_count

    li = spark.read.parquet(f"{sf_smoke}/lineitem.parquet")
    edges = cooccurrence_edges(li, "l_orderkey", "l_partkey")
    def adjacency_broadcasts(df) -> int:
        # the adjacency joins key on _u/_v; cooccurrence_edges' inner
        # self-join on the (small) group id may legitimately broadcast
        plan = df._jdf.queryExecution().executedPlan().toString()
        return sum(
            1
            for line in plan.splitlines()
            if "BroadcastHashJoin" in line and ("_u#" in line or "_v#" in line)
        )

    small = triangle_count(edges)  # sf0.001 adjacency fits the budget
    assert adjacency_broadcasts(small) == 2
    big = triangle_count(edges, broadcast_limit_bytes=0)  # over-budget
    assert adjacency_broadcasts(big) == 0
    # same answer on both paths
    assert small.collect() == big.collect()


def test_decontaminate_corpus_agg_after_filter(spark, sf_smoke):
    """The per-doc hit count must aggregate the post-join (matched)
    rows, and the benchmark side must broadcast — the corpus explode
    is then filtered map-side with no corpus-sized shuffle."""
    from eclipse_spark.admin import explain_summary

    s = explain_summary(QUERIES["decontaminate"](spark, sf_smoke))
    assert s.n_broadcasts >= 1
    # exactly two shuffles: the benchmark-side gram distinct (benchmark-
    # sized, tiny) and the per-doc aggregation of MATCHED grams — the
    # corpus-side explode itself must never shuffle
    assert s.n_shuffles <= 2


def test_quality_classifier_single_shuffle_broadcast_model(spark, sf_smoke):
    """The model table must broadcast and the only shuffle is the
    per-doc score aggregate — the op runs at scan speed at 100 TB."""
    from eclipse_spark.admin import explain_summary

    s = explain_summary(QUERIES["quality_classifier"](spark, sf_smoke))
    assert s.n_shuffles == 1
    assert s.n_broadcasts >= 1
    assert not s.has_python_udf


def test_span_dedup_bounded_shuffles_no_udf(spark, sf_smoke):
    """Corpus-level span dedup: count + rebuild are the only shuffles
    (the count join may broadcast locally under AQE — it is not
    engine-pinned, so at scale it degrades to a partitioned join)."""
    from eclipse_spark.admin import explain_summary

    s = explain_summary(QUERIES["span_dedup"](spark, sf_smoke))
    assert s.n_shuffles <= 3
    assert not s.has_python_udf


def test_mixture_sample_broadcast_thresholds(spark, sf_smoke):
    """All shuffles are tiny aggregates (totals/K/summary); the
    corpus-side keep filter joins only against broadcast thresholds."""
    from eclipse_spark.admin import explain_summary

    s = explain_summary(QUERIES["mixture_sample"](spark, sf_smoke))
    assert s.n_shuffles <= 4
    assert s.n_broadcasts >= 1
    assert not s.has_python_udf


def test_minhash_index_refresh_skips_ref_signatures(spark, sf_smoke, tmp_path):
    """The index-backed refresh dedup (minhash_dedup_against_index)
    must read the REF side's candidates from the stored bucketed
    artifact: the physical plan scans the index table and computes
    shingle/minhash signatures for ONE side only (the new batch) —
    at 100 TB the whole point is never re-shingling the reference
    corpus on a refresh run. The direct (uncached) operator computes
    signatures for both sides; the delta proves the index is used."""
    from pyspark.sql import functions as F

    from eclipse_spark.operators.dedup import (
        minhash_dedup_against,
        minhash_dedup_against_index,
        minhash_index_ref,
    )
    from eclipse_spark.storage import Catalog

    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet").select(
        "doc_id", "text"
    )
    ref = docs.filter(F.col("doc_id") < 100)
    new = docs.filter(F.col("doc_id") >= 100)
    cat = Catalog(spark, str(tmp_path))
    try:
        minhash_index_ref(cat, ref, table="mh_ref_idx_plan")
        cached_plan = _plan(
            minhash_dedup_against_index(new, cat.get_table("mh_ref_idx_plan"), ref)
        )
        direct_plan = _plan(minhash_dedup_against(new, ref))
    finally:
        spark.sql("DROP TABLE IF EXISTS mh_ref_idx_plan")
    # the index table is scanned...
    assert "mh_ref_idx_plan" in cached_plan
    # ...and strictly fewer corpus-parquet scans remain than in the
    # direct two-sided computation (measured 4 vs 7 at sf0.001: the
    # ref-side signature pipeline's scans are replaced by the index)
    assert cached_plan.count("documents.parquet") < direct_plan.count(
        "documents.parquet"
    ), "index-backed plan should not recompute ref-side signatures"


def test_profile_is_single_aggregate_pass(spark, sf_smoke):
    """data_profile: every statistic rides ONE agg — no joins, one
    scan; the distinct counts go through the Expand rewrite, not
    separate jobs."""
    plan = _plan(QUERIES["data_profile"](spark, sf_smoke))
    assert "Join" not in plan
    assert len(re.findall(r"\n\(\d+\) Scan parquet", plan)) == 1
    assert "Expand" in plan  # the multi-DISTINCT rewrite


def test_table_diff_is_one_join_no_window(spark, sf_smoke):
    """table_diff: one full-outer join, row-local classification —
    no window pass, no second join over the snapshots."""
    from eclipse_spark.storage import table_diff

    old = spark.read.parquet(f"{sf_smoke}/orders.parquet")
    new = old.filter("o_orderkey % 2 = 0")
    plan = _plan(table_diff(old, new, ["o_orderkey"]))
    n_joins = len(re.findall(r"\n\(\d+\) (?:SortMergeJoin|ShuffledHashJoin)", plan))
    assert n_joins == 1
    assert "Window" not in plan


def test_pq_encode_broadcasts_codebook(spark, sf_smoke):
    """pq_encode: the codebook side is always a broadcast — the
    explode output must never shuffle-join against it."""
    plan = _plan(QUERIES["pq_encode"](spark, sf_smoke))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_phrase_search_pushes_term_filter_to_scan(spark, sf_smoke):
    """phrase_search: the isin(term) filter must run before the joins
    (postings are term-filtered pre-shuffle). The filter sits on
    exploded tokens (post-scan), so assert it's below the join by
    checking no join input is an unfiltered explode."""
    plan = _plan(QUERIES["phrase_search"](spark, sf_smoke))
    # both join inputs derive from the filtered postings: the word
    # literals appear in Filter nodes, and the join count matches
    # len(phrase) - 1
    n_joins = len(re.findall(r"\n\(\d+\) (?:SortMergeJoin|BroadcastHashJoin)", plan))
    assert n_joins == 1
    assert "table" in plan and "hash" in plan


def test_ewma_single_window_sort(spark, sf_smoke):
    """ewma: all lag columns share ONE window spec — exactly one
    shuffle (the partition-by sort), no matter the history width."""
    plan = _plan(QUERIES["ewma"](spark, sf_smoke))
    assert _n_exchanges(plan) == 1
    assert len(re.findall(r"\n\(\d+\) Window", plan)) == 1


def test_random_projection_single_shuffle(spark, sf_smoke):
    """random_projection: explode + flat terms + one partial-agg
    shuffle; the projected width never adds stages."""
    plan = _plan(QUERIES["random_projection"](spark, sf_smoke))
    assert _n_exchanges(plan) == 1
    assert "Join" not in plan


def test_pq_index_query_never_reencodes_corpus(spark, sf_smoke, tmp_path):
    """pq_adc_topk over stored artifacts: the only vector explode in
    the plan is the QUERY batch's own (one Generate); the corpus side
    is a plain scan of the persisted code table — the raw embeddings
    are never re-read or re-encoded at query time."""
    from pyspark.sql import functions as F

    from eclipse_spark.operators import similarity as sim
    from eclipse_spark.storage import Catalog

    emb = spark.read.parquet(f"{sf_smoke}/embeddings.parquet")
    cat = Catalog(spark, str(tmp_path / "pq"))
    codes_t, cb_t = sim.pq_index(cat, emb, m=8, ksub=16)
    enc = cat.get(codes_t).select(
        F.col("vec_id").alias("match_id"), "subspace", "code"
    )
    top = sim.pq_adc_topk(
        emb.filter(F.col("vec_id") < 2), enc, cat.get(cb_t), k=5, m=8
    )
    plan = _plan(top)
    assert len(re.findall(r"\n\(\d+\) Generate", plan)) == 1
    # result matches the self-contained pq_topk end-to-end
    direct = sim.pq_topk(emb.filter(F.col("vec_id") < 2), emb, k=5, m=8, ksub=16)
    assert sorted(map(tuple, top.collect())) == sorted(map(tuple, direct.collect()))


def test_collapse_lines_zero_shuffles(spark, sf_smoke):
    """The repetition cleaner is a pure map stage — any Exchange in
    its plan means the row-local formulation regressed."""
    plan = _plan(QUERIES["collapse_lines"](spark, sf_smoke))
    assert _n_exchanges(plan) == 0
    assert "pythonUDF" not in plan and "BatchEvalPython" not in plan


def test_attribution_single_user_shuffle(spark, sf_smoke):
    """Last-touch attribution = ONE user-keyed window shuffle + the
    channel aggregate's exchange; a third would mean the two event
    sides got shuffled separately (the join formulation it avoids)."""
    plan = _plan(QUERIES["attribution"](spark, sf_smoke))
    assert _n_exchanges(plan) <= 2


def test_fuzzy_join_no_cartesian(spark, sf_smoke):
    plan = _plan(QUERIES["fuzzy_join"](spark, sf_smoke))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_frequent_pairs_prunes_before_pair_join(spark, sf_smoke):
    """Apriori order: the item-support semi-join must sit below the
    basket self-join, so infrequent items never enter the quadratic
    stage (grep: a LeftSemi join exists and no cartesian shape)."""
    plan = _plan(QUERIES["frequent_pairs"](spark, sf_smoke))
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan


def test_mv_refresh_never_rescans_base_table(spark, sf_smoke):
    """The refresh plan reads orders for the v1 view and the change
    feed — but the refreshed view itself must come from the MERGE of
    view + delta (one full-outer join), not a fresh v2 aggregate:
    the join and its outer coalesce are the O(|changes|) contract."""
    plan = _plan(QUERIES["mv_refresh"](spark, sf_smoke))
    assert "FullOuter" in plan.replace(" ", "")


def test_chi_square_no_float_udf_and_three_aggs(spark, sf_smoke):
    plan = _plan(QUERIES["chi_square"](spark, sf_smoke))
    assert "BatchEvalPython" not in plan
    # obs + two marginals + n: at least three aggregate subtrees
    assert plan.count("HashAggregate") >= 6  # partial+final per agg


def test_rolling_distinct_one_ordered_window(spark, sf_smoke):
    plan = _plan(QUERIES["rolling_distinct"](spark, sf_smoke))
    # per-step agg + grid join + one global window; no python
    assert "BatchEvalPython" not in plan
    assert plan.count("Window") >= 1


def test_negative_sampling_single_index_join(spark, sf_smoke):
    plan = _plan(QUERIES["negative_sampling"](spark, sf_smoke))
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_curation_pipeline_broadcasts_benchmark_grams(spark, sf_smoke):
    """The decontamination stage must broadcast the (small) benchmark
    gram table — a shuffle join there moves corpus-scale gram rows."""
    plan = _plan(QUERIES["curation_pipeline"](spark, sf_smoke))
    assert "BroadcastExchange" in plan
    assert "BatchEvalPython" not in plan


def test_gopher_rules_zero_shuffle(spark, sf_smoke):
    """Rule verdicts are a pure projection: no Exchange, no UDF, one
    scan reading only (doc_id, text)."""
    plan = _plan(QUERIES["gopher_rules"](spark, sf_smoke))
    assert _n_exchanges(plan) == 0
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    read_schema = plan.split("ReadSchema")[1].split("\n")[0]
    assert "lang" not in read_schema and "source" not in read_schema


def test_feature_hash_single_shuffle(spark, sf_smoke):
    """Hashing-trick featurization: token explode + ONE map-side
    combined (id, bucket) count — no joins, no broadcast, no UDF."""
    plan = _plan(QUERIES["feature_hash"](spark, sf_smoke))
    assert _n_exchanges(plan) == 1
    assert "HashAggregate" in plan and plan.count("HashAggregate") >= 2
    assert "Join" not in plan


def test_ohlc_bars_single_shuffle_partial_agg(spark, sf_smoke):
    """Tick-to-bar must be ONE map-side-combined aggregate: a single
    Exchange sized by the bar count, partial HashAggregates before it,
    no window sort over the tick stream."""
    plan = _plan(QUERIES["ohlc_bars"](spark, sf_smoke))
    assert _n_exchanges(plan) == 1
    # struct-keyed min_by lowers to SortAggregate; what matters is the
    # partial/final pair straddling the single exchange
    assert "partial_min_by" in plan and plan.count("SortAggregate") >= 2
    assert "Window" not in plan


def test_vwap_bars_single_shuffle_partial_agg(spark, sf_smoke):
    """VWAP bars share ohlc_bars' contract: ONE map-side-combined
    aggregate — a single Exchange sized by bar count, partial/final
    HashAggregates straddling it, no window over the tick stream."""
    plan = _plan(QUERIES["vwap_bars"](spark, sf_smoke))
    assert _n_exchanges(plan) == 1
    assert plan.count("HashAggregate") >= 2
    assert "Window" not in plan and "Join" not in plan


def test_max_drawdown_one_shuffle_window_agg_colocated(spark, sf_smoke):
    """The nested cummax-over-cumsum windows and the final per-key
    aggregate are all keyed on user_id — they must share ONE exchange
    (a second shuffle would mean the agg failed to reuse the window's
    partitioning)."""
    plan = _plan(QUERIES["max_drawdown"](spark, sf_smoke))
    assert _n_exchanges(plan) == 1
    assert "Window" in plan
    assert "BatchEvalPython" not in plan


def test_auc_roc_distinct_score_preagg_before_window(spark, sf_smoke):
    """The ordered cumulative pass must run over DISTINCT (segment,
    score) rows, never the raw stream: the per-score aggregate comes
    first (its partial/final pair), then one segment-partitioned
    window, then the final rollup reusing the partitioning — 2
    exchanges total, no join, no python."""
    plan = _plan(QUERIES["auc_roc"](spark, sf_smoke))
    assert _n_exchanges(plan) == 2
    assert "Window" in plan and "Join" not in plan
    assert "BatchEvalPython" not in plan


def test_k_anonymity_pure_grouped_aggregate(spark, sf_smoke):
    """The audit is one grouped count + exact distinct (Spark's
    two-phase distinct plan): no join, no window, no python, and the
    scan reads only the three columns involved."""
    plan = _plan(QUERIES["k_anonymity"](spark, sf_smoke))
    assert _n_exchanges(plan) <= 2
    assert "Join" not in plan and "Window" not in plan
    assert "BatchEvalPython" not in plan
    read_schema = plan.split("ReadSchema")[1].split("\n")[0]
    assert "c_name" not in read_schema


def test_shard_balance_distributed_rank_no_global_sort(spark, sf_smoke):
    """Serpentine sharding must rank via dense_index's two-pass shape:
    a RANGE exchange (not a single-partition global sort of the data),
    the tiny per-partition offset table broadcast back, and no
    cartesian/python anywhere."""
    plan = _plan(QUERIES["shard_balance"](spark, sf_smoke))
    assert "rangepartitioning" in plan.lower()
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    assert _n_exchanges(plan) <= 5


def test_bloom_prune_join_filter_below_exchange(spark, sf_smoke):
    """Bloom pruning must fire INSIDE the big side's scan stage: the
    getbit probe conjunction is a literal-bitmap Filter that predicate
    pushdown pins onto the fact scan branch, BELOW the semi-join — so
    at scale only survivors reach the exchange. Checked under
    autoBroadcastJoinThreshold=-1 (the 100 TB regime where the key set
    does NOT broadcast; at smoke scale Catalyst would just broadcast
    the semi-join and the filter's position would be untestable). No
    python, no cross/nested-loop join anywhere (the former one-row
    crossJoin attach let the join reorderer float the prune above the
    exchange it exists to shrink)."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(QUERIES["bloom_prune_join"](spark, sf_smoke))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "getbit" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # tree prints parents above children: the fact-side getbit Filter
    # must appear AFTER (deeper than) the semi join node
    tree = plan.split("\n\n")[0]
    semi_at = tree.find("LeftSemi")
    getbit_at = tree.find("getbit")
    # the Filter node itself sits in the detail section; in the tree,
    # assert the semi join exists and a shuffle Exchange feeds it from
    # the fact branch while getbit appears in the plan details
    assert semi_at != -1
    det_getbit = plan.find("getbit")
    assert det_getbit != -1
    # the getbit filter's node id must be <= the fact-side Exchange's
    # node id (ids are assigned bottom-up within a branch, so a
    # smaller id = deeper = before the shuffle)
    import re as _re

    filt_ids = [
        int(m.group(1))
        for m in _re.finditer(r"\((\d+)\) Filter", plan)
        if "getbit" in plan[m.end():m.end() + 2000]
    ]
    exch_ids = [
        int(m.group(1)) for m in _re.finditer(r"\((\d+)\) Exchange", plan)
    ]
    assert filt_ids and exch_ids
    assert min(filt_ids) < min(exch_ids), (
        "bloom getbit Filter must sit below every shuffle Exchange"
    )


def test_hll_rollup_mapside_sketch_partials(spark, sf_smoke):
    """The mergeable-sketch rollup must be two map-side-combined
    aggregate stages: partial ObjectHashAggregates BEFORE each of the
    two Exchanges (the shuffle carries sketches, never value rows) —
    no join, window, or python in the rollup path."""
    from pyspark.sql import functions as F

    from eclipse_spark.operators.sketch import hll_rollup

    ev = QUERIES["events_resample"].__globals__["_events"](spark, sf_smoke)
    plan = _plan(
        hll_rollup(
            ev.withColumn("day", F.to_date("ts")),
            ["event_type"],
            ["day"],
            "user_id",
        )
    )
    assert _n_exchanges(plan) == 2
    assert plan.count("ObjectHashAggregate") >= 4  # partial+final x2
    assert "Join" not in plan and "Window" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_semantic_decontaminate_corpus_never_shuffles_unfiltered(
    spark, sf_smoke
):
    """The eval suite broadcasts and the corpus streams ONCE through
    the fused cosine filter — the only shuffle carries flagged
    survivors (the Exchange sits above the BroadcastNestedLoopJoin,
    never below it), no python anywhere."""
    plan = _plan(QUERIES["semantic_decontaminate"](spark, sf_smoke))
    assert "BroadcastNestedLoopJoin" in plan
    assert _n_exchanges(plan) == 1
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    tree = plan.split("\n\n")[0]
    exch = tree.find("Exchange")
    bnlj = tree.find("BroadcastNestedLoopJoin")
    assert exch != -1 and bnlj != -1 and exch < bnlj, (
        "survivor shuffle must sit ABOVE the broadcast filter join"
    )


def test_kmv_sketch_stream_never_shuffles(spark, sf_smoke):
    """The KMV build's only Exchange is the <= k*n_partitions partial
    merge: the Arrow bottom-k stage (in-heap dedup — no upstream
    distinct) sits BELOW it, so the value stream itself never crosses
    a shuffle."""
    from eclipse_spark.operators.sketch import kmv_sketch

    ev = QUERIES["events_resample"].__globals__["_events"](spark, sf_smoke)
    plan = _plan(kmv_sketch(ev, ["event_type"], "user_id", k=64))
    assert _n_exchanges(plan) == 1
    tree = plan.split("\n\n")[0]
    exch = tree.find("Exchange")
    arrow = max(tree.find("MapInPandas"), tree.find("ArrowEval"))
    assert exch != -1 and arrow != -1 and arrow > exch, (
        "the Arrow bottom-k stage must sit below the merge Exchange"
    )


def test_video_shifted_join_no_cartesian(spark):
    """The shift-enumerated banded join must stay an equi-join on
    (frame_idx/join_idx, tbl, bkey) — never a cartesian/BNL product —
    and only slim hash rows reach the shuffle (no binary column)."""
    from pyspark.sql import functions as F

    from eclipse_spark.operators import multimodal as mm

    ids = spark.range(30).select((F.col("id") * 20).alias("id"))
    full = mm.encode_textured_video(ids)
    trimmed = mm.trim_video_head(full, n=1).select(
        (F.col("id") + 300000).alias("id"), "bytes"
    )
    hs = mm.video_dhash_bands(full.unionByName(trimmed))
    out = mm.video_near_pairs_shifted(
        hs, min_frames=2, max_shift=2, max_pairs=None
    )
    plan = _plan(out)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "bytes" not in plan.split("Exchange")[-1][:400], (
        "payload bytes must not ride the pair shuffle"
    )


def test_fingerprint_bucket_rollup_single_aggregation(spark):
    """The streaming-compatible rollup is ONE aggregation (map-side
    partial + final around a single shuffle) — the shape Structured
    Streaming's single-stateful-op budget requires."""
    from pyspark.sql import functions as F

    from eclipse_spark.operators import multimodal as mm

    wavs = mm.encode_tone_wav(spark.range(20).select("id"))
    roll = mm.fingerprint_bucket_rollup(mm.audio_fingerprint_bands(wavs))
    plan = _plan(roll)
    # one KEY shuffle: the r14 kernel fan-out adds a round-robin
    # repartition exchange below the encode kernel, which is stateless
    # and does not consume the streaming single-aggregation budget —
    # only hash-partitioned exchanges mark aggregations/joins
    n_key = len(re.findall(r"Arguments: hashpartitioning", plan))
    assert n_key == 1, "rollup must be a single key shuffle"
    assert plan.count("HashAggregate") >= 2, "no map-side partial agg"


def test_video_pair_tails_single_postjoin_exchange(spark):
    """r14 optimization: the video pair operators' post-join tails
    cluster ONCE by (id_a, id_b) — the per-frame dedup, the pair-level
    rollup, and (shifted) the best-shift window all reuse that single
    exchange instead of shuffling the survivors 2-3 more times. With
    the tiny fixture the banded join broadcasts, so the repartition is
    the plan's ONLY hash exchange."""
    from eclipse_spark.operators import multimodal as mm

    vids = mm.encode_pattern_video(spark.range(12).select("id"))
    hs = mm.video_dhash_bands(vids)
    for op in (
        lambda h: mm.video_near_pairs(h, max_pairs=None),
        lambda h: mm.video_near_pairs_shifted(h, max_pairs=None),
    ):
        plan = _plan(op(hs))
        n_key = len(re.findall(r"Arguments: hashpartitioning", plan))
        assert n_key == 1, f"expected 1 key exchange, saw {n_key}"
        assert "hashpartitioning(id_a" in plan
