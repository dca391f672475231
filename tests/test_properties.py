"""Property-based invariants (hypothesis) for the dedup/text/skew
operators — semantic guarantees that hold for ALL inputs, not just the
fixtures: idempotence, containment, representative-choice, and
salted-vs-plain aggregation identity."""

from __future__ import annotations

import sys

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from eclipse_spark.operators import dedup, skew, text

WORDS = ["the", "cat", "sat", "on", "a", "mat", "dog", "ran", "far", "Xy"]
texts = st.lists(
    st.lists(st.sampled_from(WORDS), min_size=0, max_size=8).map(" ".join),
    min_size=1,
    max_size=12,
)

SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _docs(spark, docs: list[str]):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], ["doc_id", "text"]
    )


@SETTINGS
@given(docs=texts)
def test_exact_dedup_invariants(spark, docs):
    df = _docs(spark, docs)
    out = dedup.exact_dedup(df)
    kept = sorted(r["doc_id"] for r in out.collect())
    # containment + no duplicates kept
    assert set(kept) <= set(range(len(docs)))
    norm = lambda t: " ".join(t.lower().split())
    groups: dict[str, list[int]] = {}
    for i, t in enumerate(docs):
        groups.setdefault(norm(t), []).append(i)
    # exactly one representative per normalized-text group, and it is the min id
    assert kept == sorted(min(g) for g in groups.values())
    # idempotence
    again = sorted(r["doc_id"] for r in dedup.exact_dedup(out).collect())
    assert again == kept


@SETTINGS
@given(docs=texts)
def test_minhash_whitespace_invariance(spark, docs):
    """Signatures are invariant under whitespace renormalization (the
    same normalization contract the exact path uses)."""
    df = _docs(spark, docs)
    noisy = df.withColumn("text", F.regexp_replace("text", " ", "   "))
    a = {r["id"]: tuple(r[h] for h in r.asDict() if h != "id")
         for r in dedup.minhash_signatures_df(df, num_hashes=4).collect()}
    b = {r["id"]: tuple(r[h] for h in r.asDict() if h != "id")
         for r in dedup.minhash_signatures_df(noisy, num_hashes=4).collect()}
    assert a == b


@SETTINGS
@given(docs=texts)
def test_token_count_matches_python(spark, docs):
    df = _docs(spark, docs)
    got = {r["doc_id"]: r["n"] for r in df.select(
        "doc_id", text.token_count(F.col("text")).alias("n")).collect()}
    want = {i: len(t.split()) for i, t in enumerate(docs)}
    assert got == want


@SETTINGS
@given(docs=texts)
def test_simhash_multitable_recall_property(spark, docs):
    """Multi-table SimHash candidates EQUAL the brute-force
    {hamming <= max_hamming} pair set for any corpus: superset by the
    pigeonhole band argument (hamming <= tables-1 leaves one band
    untouched), subset by the verify filter."""
    df = _docs(spark, docs)
    sigs = {r["id"]: r["sig"] for r in dedup.simhash_signatures_df(df).collect()}
    ids = sorted(sigs)
    truth = {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin((sigs[a] ^ sigs[b]) & ((1 << 64) - 1)).count("1") <= 3
    }
    got = {(r["id_a"], r["id_b"]) for r in dedup.simhash_candidates(df).collect()}
    assert got == truth


@SETTINGS
@given(
    vs=st.lists(
        st.lists(
            st.floats(-1e6, 1e6, allow_nan=False, allow_infinity=False, width=32),
            min_size=0,
            max_size=6,
        ),
        min_size=1,
        max_size=8,
    )
)
def test_sign_sketch_codegen_equals_spec(spark, vs):
    """The codegen sign_sketch_df is bucket-identical to the HOF spec
    for arbitrary vectors (including empty ones)."""
    from eclipse_spark.operators import similarity

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vs)], "vec_id long, embedding array<double>"
    )
    spec = {
        r["vec_id"]: r["b"]
        for r in df.select(
            "vec_id", similarity.sign_sketch(F.col("embedding"), 6, 7).alias("b")
        ).collect()
    }
    fast = {
        r["id"]: r["bucket"]
        for r in similarity.sign_sketch_df(df, "vec_id", "embedding", 6, 7).collect()
    }
    assert fast == spec


@SETTINGS
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 12)),
        min_size=1,
        max_size=25,
    )
)
def test_connected_components_equals_union_find(spark, edges):
    """Min-label propagation reaches the union-find fixpoint for any
    graph (self-loops and parallel edges included)."""
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    got = {r["node"]: r["component"] for r in dedup.connected_components(df).collect()}
    nodes = {n for e in edges for n in e}
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    assert got == {n: find(n) for n in nodes}


@SETTINGS
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 3), st.integers(-100, 100)),
        min_size=1,
        max_size=30,
    )
)
def test_two_phase_agg_equals_plain(spark, rows):
    """Salted two-phase aggregation is result-identical to the plain
    aggregate for any input (the EM-KDE-equivalent safety property)."""
    df = spark.createDataFrame(rows, ["k", "v"])
    plain = {
        (r["k"]): (r["n"], r["s"])
        for r in df.groupBy("k").agg(
            F.count("*").alias("n"), F.sum("v").alias("s")).collect()
    }
    salted = {
        (r["k"]): (r["n"], r["s"])
        for r in skew.two_phase_agg(
            df,
            keys=["k"],
            partial_aggs=[F.count("*").alias("pn"), F.sum("v").alias("ps")],
            final_aggs=[F.sum("pn").alias("n"), F.sum("ps").alias("s")],
            buckets=4,
        ).collect()
    }
    assert salted == plain


def test_pagerank_matches_hand_computation(spark):
    """Directed triangle a->b->c->a plus chord a->c, one iteration,
    against hand-computed simplified-damping PageRank."""
    from eclipse_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c")], ["src", "dst"]
    )
    got = {r["node"]: r["pr"] for r in pagerank(edges, n_iter=1).collect()}
    # outdeg: a=2, b=1, c=1; contribs: b <- a/2, c <- a/2 + b, a <- c
    exp = {
        "a": 0.15 + 0.85 * 1.0,
        "b": 0.15 + 0.85 * 0.5,
        "c": 0.15 + 0.85 * (0.5 + 1.0),
    }
    assert got.keys() == exp.keys()
    for k in exp:
        assert abs(got[k] - exp[k]) < 1e-12, (k, got[k], exp[k])


def test_pagerank_rank_conservation(spark):
    """With no dangling nodes every unit of rank is redistributed:
    sum(pr) stays n*(teleport + damping*mean) = n for a closed regular
    graph. Ring graph of 20 nodes: every rank must stay exactly 1."""
    from eclipse_spark.operators.graph import pagerank

    n = 20
    edges = spark.createDataFrame(
        [(str(i), str((i + 1) % n)) for i in range(n)], ["src", "dst"]
    )
    got = [r["pr"] for r in pagerank(edges, n_iter=3).collect()]
    assert len(got) == n
    for v in got:
        assert abs(v - 1.0) < 1e-12


def test_stratified_sample_rates_and_determinism(spark, sf_correct):
    """Sampled fraction per stratum lands near its configured rate, the
    sample is stable across runs, and strata with rate 0 vanish."""
    from eclipse_spark.operators.relational import stratified_sample

    orders = spark.read.parquet(f"{sf_correct}/orders.parquet")
    rates = {"F": 0.30, "O": 0.10}
    s = stratified_sample(orders, "o_orderkey", "o_orderstatus", rates)
    got = {r["o_orderstatus"]: r["n"] for r in
           s.groupBy("o_orderstatus").agg(F.count("*").alias("n")).collect()}
    tot = {r["o_orderstatus"]: r["n"] for r in
           orders.groupBy("o_orderstatus").agg(F.count("*").alias("n")).collect()}
    assert "P" not in got  # default_rate=0 drops unlisted strata
    for k, rate in rates.items():
        frac = got[k] / tot[k]
        assert abs(frac - rate) < 0.03, (k, frac)
    # determinism: same filter twice => identical keys
    a = sorted(r["o_orderkey"] for r in s.select("o_orderkey").collect())
    b = sorted(r["o_orderkey"] for r in
               stratified_sample(orders, "o_orderkey", "o_orderstatus", rates)
               .select("o_orderkey").collect())
    assert a == b


def test_approx_quantiles_error_bound(spark, sf_correct):
    """approx_percentile at accuracy 10000 must land within 1% relative
    error of the exact interpolated percentile on sf0.01."""
    li = spark.read.parquet(f"{sf_correct}/lineitem.parquet")
    exact = li.agg(
        F.expr("percentile(l_quantity, array(0.25, 0.5, 0.75))").alias("e")
    ).collect()[0]["e"]
    approx = li.agg(
        F.expr("approx_percentile(l_quantity, array(0.25, 0.5, 0.75), 10000)")
        .alias("a")
    ).collect()[0]["a"]
    for e, a in zip(exact, approx):
        assert abs(a - e) <= 0.01 * max(abs(e), 1.0), (e, a)


def test_rollup_reaggregation_equals_direct(spark, sf_correct):
    """Merging an hourly rollup to 2-hour buckets must equal the direct
    2-hour aggregate of raw rows, and non-mergeable measures are
    rejected at build time."""
    import pytest

    from eclipse_spark import rollup as R
    from __spark_entry__ import _events, _utc

    _utc(spark)
    ev = _events(spark, sf_correct)
    measures = {"n": ("count", "*"), "mx": ("max", "value")}
    hourly = R.build_rollup(ev, "ts", 60, ["event_type"], measures)
    from_rollup = {
        (r["_bucket"], r["event_type"]): (r["n"], r["mx"])
        for r in R.read_rollup(hourly, 120, ["event_type"], measures).collect()
    }
    direct = {
        (r["_bucket"], r["event_type"]): (r["n"], r["mx"])
        for r in R.build_rollup(ev, "ts", 120, ["event_type"], measures).collect()
    }
    assert from_rollup == direct

    with pytest.raises(ValueError):
        R.build_rollup(ev, "ts", 60, [], {"a": ("avg", "value")})


@SETTINGS
@given(docs=texts)
def test_span_dedup_reconstruction_invariants(spark, docs):
    """For any corpus: (1) with an unreachable min_occurrences nothing
    is removed and each doc rebuilds to exactly its token join;
    (2) with min_occurrences=1 every span is removed and every doc
    rebuilds to ''; (3) span counts match ceil(len/span) always."""
    import math

    df = _docs(spark, docs)
    span = 3

    keep_all = {r["doc_id"]: r for r in text.span_dedup(df, span_tokens=span, min_occurrences=10**9).collect()}
    drop_all = {r["doc_id"]: r for r in text.span_dedup(df, span_tokens=span, min_occurrences=1).collect()}
    for i, t in enumerate(docs):
        toks = [w for w in t.lower().strip().split() if w]
        n_sp = math.ceil(len(toks) / span)
        assert keep_all[i]["n_spans"] == n_sp
        assert keep_all[i]["n_spans_removed"] == 0
        assert keep_all[i]["text"] == " ".join(toks)
        assert drop_all[i]["text"] == ""
        assert drop_all[i]["n_spans_removed"] == n_sp


@SETTINGS
@given(docs=texts)
def test_dataset_split_partitions_every_row(spark, docs):
    """Splits are a partition: every row gets exactly one label, and
    re-running yields identical assignments."""
    from eclipse_spark.operators.relational import dataset_split

    df = _docs(spark, docs)
    fr = {"train": 0.5, "val": 0.25, "test": 0.25}
    a = {r["doc_id"]: r["split"] for r in dataset_split(df, fr).collect()}
    b = {r["doc_id"]: r["split"] for r in dataset_split(df, fr).collect()}
    assert a == b
    assert set(a.values()) <= {"train", "val", "test"}
    assert len(a) == len(docs)


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30),
            st.one_of(st.none(), st.integers(min_value=0, max_value=3)),
        ),
        max_size=20,
    ),
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30),
            st.one_of(st.none(), st.integers(min_value=0, max_value=3)),
        ),
        max_size=20,
    ),
)
@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_table_diff_changefeed_reconstructs_new(spark, old_rows, new_rows):
    """Applying the change feed to the old snapshot must reconstruct
    the new snapshot exactly: new == (old - deletes - update_pre)
    + inserts + update_post. Holds for every keyed table including
    NULL-valued transitions."""
    from eclipse_spark.storage import table_diff

    def dedupe(rows):  # one row per key (keyed-table precondition)
        return list({k: (k, v) for k, v in rows}.values())

    old_rows, new_rows = dedupe(old_rows), dedupe(new_rows)
    old = spark.createDataFrame(old_rows or [(99999, None)], "k bigint, v bigint")
    new = spark.createDataFrame(new_rows or [(99998, None)], "k bigint, v bigint")
    changes = table_diff(old, new, ["k"]).collect()
    state = {k: v for k, v in old.collect()}
    # removals first, additions second (the feed itself is unordered)
    for c in changes:
        if c.change_type in ("delete", "update_preimage"):
            assert state.pop(c.k) == c.v
    for c in changes:
        if c.change_type in ("insert", "update_postimage"):
            assert c.k not in state
            state[c.k] = c.v
    assert state == {k: v for k, v in new.collect()}


@given(
    st.lists(st.integers(min_value=0, max_value=100), min_size=1, max_size=12),
    st.lists(st.integers(min_value=0, max_value=100), max_size=12),
)
@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_asof_directions_match_bruteforce(spark, left_secs, right_secs):
    """asof_join(backward/forward/nearest) equals a brute-force Python
    reference on random second offsets (single key, ties to backward
    at equal distance)."""
    from eclipse_spark.operators import relational

    base = "2024-01-01 00:00:"
    left = spark.createDataFrame(
        [(i, 1, f"2024-01-01 00:{s // 60:02d}:{s % 60:02d}")
         for i, s in enumerate(left_secs)],
        "id bigint, k bigint, ts string",
    ).selectExpr("id", "k", "CAST(ts AS TIMESTAMP) AS ts")
    right = spark.createDataFrame(
        [(1, f"2024-01-01 00:{s // 60:02d}:{s % 60:02d}", float(s))
         for s in sorted(set(right_secs))],
        "k bigint, ts string, value double",
    ).selectExpr("k", "CAST(ts AS TIMESTAMP) AS ts", "value")
    rs = sorted(set(right_secs))

    def ref(direction, s):
        back = max((r for r in rs if r <= s), default=None)
        fwd = min((r for r in rs if r >= s), default=None)
        if direction == "backward":
            return back
        if direction == "forward":
            return fwd
        if back is None or fwd is None:
            return back if fwd is None else fwd
        return fwd if (fwd - s) < (s - back) else back

    for direction in ("backward", "forward", "nearest"):
        got = {
            r.id: r.asof_value
            for r in relational.asof_join(
                left, right, on=["k"], right_payload=["value"],
                direction=direction,
            ).collect()
        }
        for i, s in enumerate(left_secs):
            want = ref(direction, s)
            want_v = float(want) if want is not None else None
            assert got[i] == want_v, (direction, s, got[i], want_v)


short_words = st.lists(
    st.text(alphabet="abc", min_size=0, max_size=5), min_size=1, max_size=10
)


@SETTINGS
@given(words=short_words, k=st.sampled_from([1, 2]))
def test_fuzzy_join_equals_bruteforce(spark, words, k):
    """Deletion-neighborhood blocking has EXACT recall: the candidate
    join + verify must equal the all-pairs Levenshtein scan for any
    input, including repeats and empty strings."""
    import itertools

    from eclipse_spark.operators.linkage import fuzzy_self_join

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    df = spark.createDataFrame(list(enumerate(words)), ["wid", "w"])
    got = {
        (r.id_a, r.id_b, r.distance)
        for r in fuzzy_self_join(df, "w", "wid", k=k).collect()
    }
    want = {
        (i, j, lev(a, b))
        for (i, a), (j, b) in itertools.combinations(enumerate(words), 2)
        if 0 < lev(a, b) <= k
    }
    assert got == want


@SETTINGS
@given(
    docs=st.lists(
        st.sets(st.sampled_from(list("abcdefgh")), min_size=1, max_size=6),
        min_size=2,
        max_size=8,
    ),
    pct=st.sampled_from([25, 49, 81]),
)
def test_allpairs_cosine_equals_bruteforce(spark, docs, pct):
    """Prefix filtering must lose NOTHING: candidates + exact verify
    equal the quadratic scan at any threshold."""
    import itertools

    from eclipse_spark.operators.similarity import allpairs_cosine

    df = spark.createDataFrame(
        [(i, sorted(s)) for i, s in enumerate(docs)], ["did", "toks"]
    )
    got = {
        (r.id_a, r.id_b, r.overlap)
        for r in allpairs_cosine(df, "did", "toks", pct).collect()
    }
    want = set()
    for (i, a), (j, b) in itertools.combinations(enumerate(docs), 2):
        c = len(a & b)
        if 100 * c * c >= pct * len(a) * len(b):
            want.add((i, j, c))
    assert got == want


@SETTINGS
@given(
    v1=st.lists(
        st.tuples(
            st.integers(0, 9), st.sampled_from("pq"), st.integers(0, 50)
        ),
        min_size=0,
        max_size=8,
        unique_by=lambda t: t[0],
    ),
    v2=st.lists(
        st.tuples(
            st.integers(0, 9), st.sampled_from("pq"), st.integers(0, 50)
        ),
        min_size=0,
        max_size=8,
        unique_by=lambda t: t[0],
    ),
)
def test_ivm_refresh_equals_recompute(spark, v1, v2):
    """Incremental refresh from the change feed equals a from-scratch
    recompute for ANY pair of keyed snapshots (insert/delete/update/
    group birth/group death all arise from random pairs)."""
    from decimal import Decimal

    from eclipse_spark.operators.ivm import aggregate_view, incremental_refresh
    from eclipse_spark.storage import table_diff

    schema = "k int, g string, v double"
    d1 = spark.createDataFrame(
        [(k, g, float(v)) for k, g, v in v1], schema
    )
    d2 = spark.createDataFrame(
        [(k, g, float(v)) for k, g, v in v2], schema
    )
    mv = aggregate_view(d1, ["g"], {"v": "s"})
    refreshed = incremental_refresh(
        mv, table_diff(d1, d2, on=["k"]), ["g"], {"v": "s"}
    )
    def canon(df):
        return {
            r.g: (r.n_rows, Decimal(str(r.s))) for r in df.collect()
        }
    assert canon(refreshed) == canon(aggregate_view(d2, ["g"], {"v": "s"}))


@SETTINGS
@given(
    xs=st.lists(st.integers(0, 20), min_size=1, max_size=12),
    ys=st.lists(st.integers(0, 20), min_size=1, max_size=12),
)
def test_ks_statistic_equals_bruteforce(spark, xs, ys):
    from fractions import Fraction

    from eclipse_spark.operators.profile import ks_statistic

    rows = [(float(v), "x") for v in xs] + [(float(v), "y") for v in ys]
    df = spark.createDataFrame(rows, ["v", "tag"])
    [r] = ks_statistic(df, "v", "tag", "x", "y").collect()
    pts = sorted(set(xs) | set(ys))
    want = max(
        abs(
            Fraction(sum(1 for v in xs if v <= t), len(xs))
            - Fraction(sum(1 for v in ys if v <= t), len(ys))
        )
        for t in pts
    )
    assert Fraction(r.d_num, r.n_x * r.n_y) == want


@SETTINGS
@given(
    dim_starts=st.lists(
        st.tuples(st.integers(0, 1), st.integers(0, 20), st.sampled_from("xyz")),
        min_size=0,
        max_size=6,
        unique_by=lambda t: (t[0], t[1]),
    ),
    fact_ts=st.lists(
        st.tuples(st.integers(0, 1), st.integers(0, 20)),
        min_size=1,
        max_size=8,
    ),
)
def test_temporal_join_equals_interval_lookup(spark, dim_starts, fact_ts):
    """The as-of window formulation must equal the direct interval
    containment lookup for any tiling SCD2 history."""
    from datetime import datetime, timedelta

    from eclipse_spark.operators.relational import temporal_join

    base = datetime(2024, 1, 1)
    t = lambda s: base + timedelta(hours=s)
    # build a tiling history per key from the distinct starts
    per_key: dict[int, list[tuple[int, str]]] = {}
    for k, s, a in sorted(dim_starts):
        per_key.setdefault(k, []).append((s, a))
    dim_rows = []
    for k, runs in per_key.items():
        for i, (s, a) in enumerate(runs):
            vto = t(runs[i + 1][0]) if i + 1 < len(runs) else None
            dim_rows.append((k, a, t(s), vto))
    facts = [(i, k, t(s)) for i, (k, s) in enumerate(fact_ts)]
    from pyspark.sql.types import (
        IntegerType, StringType, StructField, StructType, TimestampType,
    )

    dim_schema = StructType([
        StructField("uid", IntegerType()), StructField("attr", StringType()),
        StructField("valid_from", TimestampType()),
        StructField("valid_to", TimestampType()),
    ])
    dim = spark.createDataFrame(dim_rows, dim_schema)
    fdf = spark.createDataFrame(facts, ["fid", "uid", "ts"])
    got = {
        r.fid: r.dim_attr
        for r in temporal_join(fdf, dim, ["uid"], "ts", ["attr"]).collect()
    }
    want = {}
    for fid, k, ts in facts:
        hit = None
        for kk, a, vf, vto in dim_rows:
            if kk == k and vf <= ts and (vto is None or ts < vto):
                hit = a
        want[fid] = hit
    assert got == want


@SETTINGS
@given(
    baskets=st.lists(
        st.tuples(st.integers(0, 5), st.sampled_from("pqrs")),
        min_size=0,
        max_size=20,
    ),
    min_sup=st.sampled_from([1, 2, 3]),
)
def test_frequent_pairs_equals_bruteforce(spark, baskets, min_sup):
    import itertools
    from collections import Counter
    from fractions import Fraction

    from eclipse_spark.operators.basket import frequent_pairs

    if not baskets:
        return
    df = spark.createDataFrame(baskets, ["bid", "item"])
    got = {
        (r.item_a, r.item_b): (r.support, r.support_a, r.support_b)
        for r in frequent_pairs(df, "bid", "item", min_sup).collect()
    }
    by_basket: dict[int, set] = {}
    for b, i in baskets:
        by_basket.setdefault(b, set()).add(i)
    isup = Counter(i for items in by_basket.values() for i in items)
    psup = Counter()
    for items in by_basket.values():
        for a, b in itertools.combinations(sorted(items), 2):
            psup[(a, b)] += 1
    want = {
        p: (c, isup[p[0]], isup[p[1]])
        for p, c in psup.items()
        if c >= min_sup
    }
    assert got == want


@SETTINGS
@given(
    rows=st.lists(
        st.tuples(st.sampled_from("xy"), st.sampled_from("uvw")),
        min_size=1,
        max_size=30,
    )
)
def test_chi_square_matches_float_reference(spark, rows):
    from collections import Counter

    from eclipse_spark.operators.profile import chi_square

    df = spark.createDataFrame(rows, ["a", "b"])
    [r] = chi_square(df, "a", "b").collect()
    obs = Counter(rows)
    ra = Counter(a for a, _ in rows)
    rb = Counter(b for _, b in rows)
    n = len(rows)
    expected = sum(
        (obs.get((a, b), 0) - ra[a] * rb[b] / n) ** 2 / (ra[a] * rb[b] / n)
        for a in ra
        for b in rb
    )
    # fixed-point truncation bias < n_cells * 1e-9
    assert abs(r.chi2 - expected) < len(ra) * len(rb) * 1e-8
    assert r.n == n and r.n_a == len(ra) and r.n_b == len(rb)


@SETTINGS
@given(
    events=st.lists(
        st.tuples(
            st.integers(0, 2),                  # user
            st.integers(0, 400),                # seconds offset
            st.sampled_from(["click", "view", "purchase", "error"]),
        ),
        min_size=1,
        max_size=20,
    )
)
def test_attribution_equals_bruteforce(spark, events):
    from collections import defaultdict
    from datetime import datetime, timedelta
    from decimal import Decimal

    from eclipse_spark.operators.timeseries import last_touch_attribution

    base = datetime(2024, 1, 1)
    rows = [
        (u, base + timedelta(seconds=s), et, float(10 + i))
        for i, (u, s, et) in enumerate(events)
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_type", "value"])
    got = {
        r.channel: (r.n_conversions, Decimal(str(r.revenue)))
        for r in last_touch_attribution(
            df, touch_types=("click", "view"), lookback_hours=1 / 30
        ).collect()  # 120-second lookback
    }
    want_n: dict[str, int] = defaultdict(int)
    want_v: dict[str, Decimal] = defaultdict(Decimal)
    for u, ts, et, val in rows:
        if et != "purchase":
            continue
        touches = [
            (t2, e2)
            for u2, t2, e2, _ in rows
            if u2 == u and e2 in ("click", "view") and (t2, 0, e2) < (ts, 1, "")
        ]
        touches.sort()
        ch = "(direct)"
        if touches and int(ts.timestamp()) - int(touches[-1][0].timestamp()) <= 120:
            ch = touches[-1][1]
        want_n[ch] += 1
        want_v[ch] += Decimal(str(val))
    assert got == {c: (want_n[c], want_v[c]) for c in want_n}


@SETTINGS
@given(
    weights=st.lists(st.integers(0, 500), min_size=1, max_size=12),
    n=st.sampled_from([1, 5, 10]),
)
def test_pps_sample_hits_sum_to_n(spark, weights, n):
    """PPS systematic sampling: hit counts sum to exactly n whenever
    any weight is positive; zero-weight rows never win; an item with
    share s gets floor/ceil(s*n) hits (systematic spacing)."""
    from fractions import Fraction

    from eclipse_spark.operators.relational import pps_systematic_sample

    if sum(weights) == 0:
        return
    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(weights)], ["k", "w"]
    )
    out = {r.k: r.n_hits for r in pps_systematic_sample(df, "w", n, ["k"]).collect()}
    assert sum(out.values()) == n
    total = sum(weights)
    for k, v in enumerate(weights):
        hits = out.get(k, 0)
        share = Fraction(v, total) * n
        assert share.__floor__() <= hits <= -((-share).__floor__())
        if v == 0:
            assert hits == 0


@SETTINGS
@given(rows=st.lists(st.tuples(st.integers(0, 30), st.integers(0, 7)),
                     min_size=1, max_size=20))
def test_dense_index_equals_row_number(spark, rows):
    """The two-pass range-partitioned index must equal a plain global
    row_number over the same total order, for any input."""
    from eclipse_spark.operators.relational import dense_index

    data = [(i, a, b) for i, (a, b) in enumerate(rows)]
    df = spark.createDataFrame(data, ["uid", "a", "b"])
    got = {
        r.uid: r.idx
        for r in dense_index(df, ["a", "b", "uid"], num_partitions=3).collect()
    }
    want = {
        uid: rank
        for rank, (a, b, uid) in enumerate(
            sorted((a, b, uid) for uid, a, b in data)
        )
    }
    assert got == want


# -- join-view IVM: refresh == recompute for ALL change batches ---------

_jk = st.integers(min_value=0, max_value=4)
_amt = st.integers(min_value=-20, max_value=99)
_facts = st.dictionaries(           # fid -> (jk, amt); dict = unique PKs
    st.integers(min_value=0, max_value=14), st.tuples(_jk, _amt),
    min_size=0, max_size=10,
)
_dims = st.dictionaries(            # jk -> grp
    _jk, st.sampled_from(["x", "y", "z"]), min_size=0, max_size=5,
)


@given(a_old=_facts, a_new=_facts, b_old=_dims, b_new=_dims)
@SETTINGS
def test_join_ivm_refresh_equals_recompute(spark, a_old, a_new, b_old, b_new):
    """For ANY old/new snapshot pair on both sides (inserts, deletes,
    updates, group moves, key churn), the signed delta rule must land
    exactly on the recompute — including empty sides and views."""
    from eclipse_spark.operators.ivm import (
        incremental_refresh_join,
        join_aggregate_view,
    )
    from eclipse_spark.storage import table_diff

    def fdf(d):
        rows = [(fid, jk, float(amt)) for fid, (jk, amt) in sorted(d.items())]
        return spark.createDataFrame(rows, "fid long, jk long, amt double") \
            if rows else spark.createDataFrame([], "fid long, jk long, amt double")

    def ddf(d):
        rows = sorted(d.items())
        return spark.createDataFrame(rows, "jk long, grp string") \
            if rows else spark.createDataFrame([], "jk long, grp string")

    A1, A2, B1, B2 = fdf(a_old), fdf(a_new), ddf(b_old), ddf(b_new)
    kw = dict(on=["jk"], keys=["grp"], sum_col="amt")
    got = incremental_refresh_join(
        join_aggregate_view(A1, B1, **kw),
        table_diff(A1, A2, on=["fid"]),
        table_diff(B1, B2, on=["jk"]),
        A1, B1, **kw,
    )
    g = {r.grp: (r.n_rows, str(r.total)) for r in got.collect()}
    e = {
        r.grp: (r.n_rows, str(r.total))
        for r in join_aggregate_view(A2, B2, **kw).collect()
    }
    assert g == e


# -- ExactSubstr keep-first: independent reference implementation -------


def _ref_exactsubstr(rows, k, min_occ=2):
    """30-line independent reimplementation of the keep-first
    overlapping substring-dedup semantics (tuple windows, global
    first-occurrence election, loser-coverage minus winner-coverage
    removal) — NOT a replay of the Spark plan, so structural bugs in
    either side disagree."""
    toks = {
        i: [t for t in txt.lower().strip().split() if t] for i, txt in rows
    }
    occ = {}
    for i in sorted(toks):
        ts = toks[i]
        for s in range(max(len(ts) - k + 1, 0)):
            occ.setdefault(tuple(ts[s : s + k]), []).append((i, s))
    loser, winner = {}, {}
    for positions in occ.values():
        if len(positions) < min_occ:
            continue
        positions.sort()
        wi, ws = positions[0]
        winner.setdefault(wi, set()).update(range(ws, ws + k))
        for i, s in positions[1:]:
            loser.setdefault(i, set()).update(range(s, s + k))
    out = {}
    for i, ts in toks.items():
        rm = loser.get(i, set()) - winner.get(i, set())
        kept = [t for j, t in enumerate(ts) if j not in rm]
        out[i] = (" ".join(kept), len(ts), len(ts) - len(kept))
    return out


_small_texts = st.lists(
    st.lists(st.sampled_from(["a", "b", "c", "d"]), min_size=0, max_size=12).map(
        " ".join
    ),
    min_size=1,
    max_size=8,
)


@given(docs=_small_texts)
@SETTINGS
def test_exact_substring_dedup_matches_reference(spark, docs):
    """For ANY corpus over a tiny alphabet (dense overlapping repeats,
    periodic runs, empty docs), the Spark operator must equal the
    independent reference — keep-first with winner protection."""
    rows = list(enumerate(docs))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r.doc_id: (r.text, r.n_tokens, r.n_tokens_removed)
        for r in text.exact_substring_dedup(df, k=3).collect()
    }
    assert got == _ref_exactsubstr(rows, k=3)


@SETTINGS
@given(
    pairs=st.sets(
        st.tuples(st.integers(0, 25), st.integers(0, 25)).filter(
            lambda t: t[0] != t[1]
        ),
        min_size=1,
        max_size=60,
    ),
    k=st.sampled_from([2, 3, 4]),
)
def test_coreness_consistent_with_k_core(spark, pairs, k):
    """Cross-operator invariant: the k-core's node set equals exactly
    {v : coreness(v) >= k} — the two decompositions must agree on
    every random graph, or one of the fixpoints is wrong."""
    from eclipse_spark.operators.graph import coreness, k_core

    edges = spark.createDataFrame(sorted(pairs), ["a", "b"])
    cores = {r["node"]: r["core"] for r in coreness(edges).collect()}
    in_core = {r["node"] for r in k_core(edges, k).collect()}
    assert in_core == {v for v, c in cores.items() if c >= k}


@SETTINGS
@given(
    members=st.sets(st.integers(-10**9, 10**9), min_size=1, max_size=200),
    extra=st.sets(st.integers(-10**9, 10**9), min_size=0, max_size=200),
)
def test_bloom_semi_join_equals_plain_semi_join(spark, members, extra):
    """The exactness contract on arbitrary int keys: bloom_semi_join
    == plain semi-join (no false negatives ever, false positives
    always re-checked), including keys far outside the member set."""
    from eclipse_spark.operators.bloom import bloom_semi_join

    big = spark.createDataFrame(
        [(v,) for v in sorted(members | extra)], "k: bigint"
    )
    small = spark.createDataFrame([(v,) for v in sorted(members)], "k: bigint")
    got = sorted(r["k"] for r in bloom_semi_join(big, small, "k").collect())
    assert got == sorted(members)


@SETTINGS
@given(
    docs=st.lists(
        st.sets(st.integers(0, 15), min_size=1, max_size=8),
        min_size=2,
        max_size=12,
    ),
    pct=st.sampled_from([50, 70, 90]),
)
def test_allpairs_jaccard_equals_bruteforce(spark, docs, pct):
    """Prefix-filtered exact Jaccard join == brute-force all pairs at
    the integer threshold, on arbitrary small token sets (the recall
    proof exercised across prefix boundaries and ties)."""
    from eclipse_spark.operators.similarity import allpairs_jaccard

    rows = [(i, sorted(f"t{x}" for x in s)) for i, s in enumerate(docs)]
    got = {
        (r["id_a"], r["id_b"]): (r["overlap"], r["n_a"], r["n_b"])
        for r in allpairs_jaccard(
            spark.createDataFrame(rows, ["id", "toks"]), "id", "toks", pct
        ).collect()
    }
    exp = {}
    for i in range(len(docs)):
        for j in range(i + 1, len(docs)):
            a, b = set(docs[i]), set(docs[j])
            c = len(a & b)
            if 100 * c >= pct * (len(a) + len(b) - c):
                exp[(i, j)] = (c, len(a), len(b))
    assert got == exp


# -- round-9 sketch properties -------------------------------------------

streams = st.lists(st.sampled_from(WORDS), min_size=1, max_size=60)


@SETTINGS
@given(toks=streams)
def test_cms_never_undercounts_property(spark, toks):
    """For ANY stream, every item's CMS estimate >= its exact count
    (tiny width forces collisions, so the property is exercised, not
    vacuous), and the estimate never exceeds exact + stream length
    (trivial upper bound: all collisions)."""
    from collections import Counter

    from eclipse_spark.operators.sketch import (
        count_min_build,
        count_min_estimate,
    )

    df = spark.createDataFrame([(t,) for t in toks], ["tok"]).repartition(3)
    sk = count_min_build(df, "tok", width=4, depth=2)
    est = {
        r["item"]: r["cms_est"]
        for r in count_min_estimate(
            sk, df.select("tok").distinct(), "tok", width=4, depth=2
        ).collect()
    }
    exact = Counter(toks)
    for item, c in exact.items():
        assert c <= est[item] <= len(toks)


@SETTINGS
@given(
    a=st.sets(st.integers(0, 80), min_size=1, max_size=40),
    b=st.sets(st.integers(0, 80), min_size=1, max_size=40),
)
def test_kmv_set_algebra_exact_regime_property(spark, a, b):
    """Sets smaller than k: the full KMV algebra is EXACT for any pair
    of sets (bottom-k merge losslessness)."""
    from eclipse_spark.operators.sketch import (
        kmv_set_cardinalities,
        kmv_sketch,
    )

    da = spark.createDataFrame([("g", v) for v in a], ["j", "v"])
    db = spark.createDataFrame([("g", v) for v in b], ["j", "v"])
    sa = kmv_sketch(da, ["j"], "v", k=256)
    sb = kmv_sketch(db, ["j"], "v", k=256)
    r = kmv_set_cardinalities(sa, sb, ["j"], k=256).collect()[0]
    assert r["est_a"] == float(len(a))
    assert r["est_b"] == float(len(b))
    assert r["est_union"] == float(len(a | b))
    assert r["est_intersection"] == float(len(a & b))
    assert r["est_only_a"] == float(len(a - b))
    assert r["est_only_b"] == float(len(b - a))


@SETTINGS
@given(
    hs=st.lists(
        st.tuples(
            st.integers(0, 65535),
            st.integers(0, 65535),
            st.integers(0, 65535),
            st.integers(0, 65535),
        ),
        min_size=2,
        max_size=14,
        unique=True,
    )
)
def test_dhash_banding_complete_on_arbitrary_hashes(spark, hs):
    """dhash_near_pairs equals brute-force Hamming<=3 for ARBITRARY
    band vectors, not just codec-produced ones — the pigeonhole
    guarantee is a property of the banding, not the corpus."""
    from eclipse_spark.operators import multimodal

    df = spark.createDataFrame(
        [(i, *b) for i, b in enumerate(hs)],
        ["id", "b0", "b1", "b2", "b3"],
    )
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in multimodal.dhash_near_pairs(df, max_hamming=3).collect()
    }

    def ham(a, b):
        return sum(bin(x ^ y).count("1") for x, y in zip(a, b))

    exp = {
        (i, j, ham(hs[i], hs[j]))
        for i in range(len(hs))
        for j in range(i + 1, len(hs))
        if ham(hs[i], hs[j]) <= 3
    }
    assert got == exp


@SETTINGS
@given(docs=texts)
def test_skew_audit_partition_invariant(spark, docs):
    """skew_audit's report is identical under any partitioning — the
    integer floor divisions and (cnt DESC, key ASC) order leave no
    room for layout effects."""
    toks = [w for d in docs for w in d.split()] or ["x"]
    df = spark.createDataFrame([(t,) for t in toks], ["k"])
    a = sorted(map(tuple, skew.skew_audit(df.repartition(2), "k", 5).collect()))
    b = sorted(map(tuple, skew.skew_audit(df.repartition(13), "k", 5).collect()))
    assert a == b and a


# -- round-10 operators -------------------------------------------------

_iv = st.tuples(
    st.integers(min_value=0, max_value=2),      # key
    st.integers(min_value=-50, max_value=950),  # start
    st.integers(min_value=0, max_value=400),    # length
)


@SETTINGS
@given(
    ls=st.lists(_iv, min_size=1, max_size=25),
    rs=st.lists(_iv, min_size=1, max_size=12),
    width=st.sampled_from([1, 13, 100, 5000]),
)
def test_interval_join_equals_theta_join(spark, ls, rs, width):
    """For ALL keyed interval sets and bucket widths, the
    bucketed-explode join equals the closed-overlap theta join —
    exactly-once per pair (attribution, not dedup)."""
    from eclipse_spark.operators.relational import interval_join

    rows_l = [(k, s, s + n) for k, s, n in ls]
    rows_r = [(k, s, s + n) for k, s, n in rs]
    L = spark.createDataFrame(
        [(k, s, e, i) for i, (k, s, e) in enumerate(rows_l)],
        "k int, ls long, le long, lid int",
    )
    R = spark.createDataFrame(
        [(k, s, e, j) for j, (k, s, e) in enumerate(rows_r)],
        "k int, rs long, re long, rid int",
    )
    out = interval_join(L, R, ["k"], "ls", "le", "rs", "re", width).collect()
    got = sorted((r.lid, r.rid) for r in out)
    assert len(got) == len(set(got)), "pair emitted more than once"
    bf = sorted(
        (i, j)
        for i, (k1, s1, e1) in enumerate(rows_l)
        for j, (k2, s2, e2) in enumerate(rows_r)
        if k1 == k2 and s1 <= e2 and s2 <= e1
    )
    assert got == bf


@SETTINGS
@given(
    items=st.lists(
        st.integers(min_value=0, max_value=40), min_size=1, max_size=120
    ),
    splits=st.integers(min_value=2, max_value=4),
    width=st.sampled_from([16, 64]),
)
def test_count_min_merge_equals_rebuild(spark, items, splits, width):
    """For ALL streams and split arities, merging per-part CMS builds
    is counter-for-counter identical to building over the whole stream
    (the incremental-maintenance invariant cms_refresh relies on)."""
    from eclipse_spark.operators.sketch import count_min_build, count_min_merge

    df = spark.createDataFrame(
        [(i, str(v)) for i, v in enumerate(items)], "i long, item string"
    )
    parts = [
        count_min_build(df.filter(F.col("i") % splits == p), "item", width, 2)
        for p in range(splits)
    ]
    merged = {
        (r.d, r.bucket): r.cnt for r in count_min_merge(*parts).collect()
    }
    rebuilt = {
        (r.d, r.bucket): r.cnt
        for r in count_min_build(df, "item", width, 2).collect()
    }
    assert merged == rebuilt
