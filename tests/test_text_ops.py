"""Text-curation operator units: PII scrubbing and repetition
filters (north-star pre-training ops)."""

from __future__ import annotations

from pyspark.sql import functions as F

def test_scrub_pii_masks_each_class(spark):
    from eclipse_spark.operators.text import scrub_pii

    df = spark.createDataFrame(
        [("a@b.com, +1 (415) 555-0199, 10.0.0.1, acct 98765432101234",)],
        ["text"],
    )
    [row] = df.select(scrub_pii(F.col("text")).alias("s")).collect()
    s = row["s"]
    for tag in ("<EMAIL>", "<PHONE>", "<IP>", "<NUMBER>"):
        assert tag in s, s
    assert "@" not in s and "415" not in s and "10.0.0.1" not in s


def test_repetition_stats_exact_fractions(spark):
    from eclipse_spark.operators.text import repetition_stats

    df = spark.createDataFrame(
        [(1, "aaa\nbbb\naaa"), (2, "xxx\nyyy"), (3, "zz\n\n  \nzz\nzz")],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: (r["n_lines"], r["dup_line_frac"], r["dup_char_frac"])
           for r in repetition_stats(df).collect()}
    assert got[1] == (3, 2 / 3, 2 / 3)       # aaa twice of three lines
    assert got[2] == (2, 0.0, 0.0)
    assert got[3] == (3, 1.0, 1.0)           # zz x3, blanks dropped


def test_chunk_tokens_boundaries_and_overlap(spark):
    from eclipse_spark.operators.text import chunk_tokens

    words = " ".join(f"w{i}" for i in range(10))  # 10 tokens
    docs = spark.createDataFrame(
        [(1, words), (2, "a b c")], ["doc_id", "text"]
    )
    got = {
        (r["doc_id"], r["chunk_id"]): (r["chunk_text"], r["n_tokens"])
        for r in chunk_tokens(docs, window=4, stride=3).collect()
    }
    # doc 1: starts 0,3,6,9 -> ceil((10-4)/3)=2 -> 1+2=3 starts? No:
    # extra=6, ceil(6/3)=2, so 3 chunks: [0:4),[3:7),[6:10)
    assert got[(1, 0)] == ("w0 w1 w2 w3", 4)
    assert got[(1, 1)] == ("w3 w4 w5 w6", 4)
    assert got[(1, 2)] == ("w6 w7 w8 w9", 4)
    assert (1, 3) not in got
    # doc 2 shorter than window: single short chunk
    assert got[(2, 0)] == ("a b c", 3)


def test_bpe_train_two_rounds_known_corpus(spark):
    from eclipse_spark.operators.text import bpe_train

    # vocab: "aa" (freq 2), "ab" (freq 1). Round 1: pair "a a" has
    # weighted count 2, "a b" has 1 -> merge "a a". Round 2: only
    # "a b" remains -> merge it.
    docs = spark.createDataFrame([(1, "aa aa ab")], ["doc_id", "text"])
    got = {r["word"]: (r["freq"], r["syms"]) for r in bpe_train(docs, 2).collect()}
    assert got == {"aa": (2, "aa"), "ab": (1, "ab")}


def test_bpe_merge_greedy_left_to_right(spark):
    from pyspark.sql import functions as F

    from eclipse_spark.operators.text import bpe_train

    # "aaa" (freq 3) dominates: round 1 merges "a a" -> aaa = [aa, a]
    # (greedy LTR, the merged symbol can't chain in the same pass).
    docs = spark.createDataFrame([(1, "aaa aaa aaa zq")], ["doc_id", "text"])
    got = {r["word"]: r["syms"] for r in bpe_train(docs, 1).collect()}
    assert got["aaa"] == "aa a"
    assert got["zq"] == "z q"


def test_sequence_pack_invariants(spark, sf_smoke):
    from eclipse_spark.operators.text import sequence_pack

    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    rows = sequence_pack(docs, budget=256, buckets=4).collect()
    assert len(rows) == docs.count()          # every doc packed once
    assert all(0 <= r["bin_offset"] < 256 for r in rows)
    assert all(0 <= r["bucket"] < 4 for r in rows)
    # within a (bucket, bin), offsets are distinct starts
    seen = {}
    for r in rows:
        key = (r["bucket"], r["bin_id"], r["bin_offset"])
        assert key not in seen
        seen[key] = r["doc_id"]
    # repartitioning must not change the packing (determinism)
    rows2 = sequence_pack(docs.repartition(13), budget=256, buckets=4).collect()
    assert {(r["doc_id"], r["bucket"], r["bin_id"], r["bin_offset"]) for r in rows} == \
           {(r["doc_id"], r["bucket"], r["bin_id"], r["bin_offset"]) for r in rows2}


def test_token_entropy_bounds(spark):
    import math

    from eclipse_spark.operators.text import token_entropy

    docs = spark.createDataFrame(
        [(1, "spam spam spam spam"), (2, "one two three four")],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r for r in token_entropy(docs).collect()}
    assert got[1]["entropy"] == 0.0                      # no diversity
    assert abs(got[2]["entropy"] - 2.0) < 1e-6           # log2(4) uniform
    assert got[2]["n_distinct"] == 4


def test_bm25_ranks_relevance(spark):
    from eclipse_spark.operators.search import bm25_topk

    docs = spark.createDataFrame(
        [
            (1, "spark spark spark data"),         # heavy on both terms
            (2, "spark unrelated filler words"),   # one term once
            (3, "nothing relevant here at all"),   # no terms -> absent
            (4, "data data spark"),                # both terms, short doc
        ],
        ["doc_id", "text"],
    )
    rows = bm25_topk(docs, ["spark", "data"], k=10).collect()
    ranked = [r["doc_id"] for r in sorted(rows, key=lambda r: r["rank"])]
    assert 3 not in ranked               # zero-match docs don't appear
    assert set(ranked) == {1, 2, 4}
    assert ranked[-1] == 2               # single weak match ranks last
    # top-k must lower to TakeOrdered, not a global window sort
    plan = bm25_topk(docs, ["spark"], k=5)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_span_dedup_removes_planted_boilerplate(spark):
    """A span planted in 3 docs must vanish from ALL of them; unique
    spans survive; a doc that is pure boilerplate becomes ''."""
    from eclipse_spark.operators.text import span_dedup

    boiler = "x " * 9 + "x"  # exactly one 10-token span
    rows = [
        (1, boiler + " alpha beta gamma delta one two three four five six"),
        (2, boiler + " uniq2 only here words that differ from others aa bb"),
        (3, boiler),  # pure boilerplate
        (4, "totally different content with its own ten tokens here now"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in span_dedup(df, span_tokens=10).collect()}
    assert out[3]["text"] == "" and out[3]["n_spans_removed"] == 1
    assert "x x" not in out[1]["text"] and out[1]["text"].startswith("alpha")
    assert out[2]["n_spans"] == 2 and out[2]["n_spans_removed"] == 1
    assert out[4]["n_spans_removed"] == 0 and out[4]["n_spans"] == 1


def test_span_dedup_portable_matches_default(spark, sf_smoke):
    """Hash choice must not change semantics, only oracle-ability."""
    from eclipse_spark.operators.text import span_dedup

    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    a = span_dedup(docs, portable=False).orderBy("doc_id").collect()
    b = span_dedup(docs, portable=True).orderBy("doc_id").collect()
    assert a == b


def test_exact_substring_dedup_keep_first_overlapping(spark):
    """Lee-et-al ExactSubstr semantics: the globally FIRST occurrence
    of a repeated k-window survives; later occurrences are cut at ANY
    alignment; short and empty docs pass through."""
    from eclipse_spark.operators.text import exact_substring_dedup

    shared = "a b c d e f g h i j"  # 10 tokens = one k=10 window
    rows = [
        (1, shared + " unique one two"),
        (2, "xx yy " + shared + " zz"),  # repeat mid-doc, offset 2
        (3, "totally different text here"),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in exact_substring_dedup(df, k=10).collect()}
    assert out[1].n_tokens_removed == 0
    assert out[1].text == shared + " unique one two"
    assert out[2].text == "xx yy zz" and out[2].n_tokens_removed == 10
    assert out[3].n_tokens_removed == 0
    assert out[4].text == "" and out[4].n_tokens == 0


def test_exact_substring_dedup_winner_protected_periodic(spark):
    """Overlapping duplicate windows (periodic text, repeat period < k)
    must NOT cut tokens inside the elected first occurrence: the winner
    window's token range is protected from loser coverage.  'a'*12 with
    k=10 has identical windows at starts 1/2/3 — the winner (start 1)
    keeps its full 10 tokens; only the loser-only tail (tokens 11, 12)
    is cut.  A second doc repeating the same content is cut entirely
    (no winner window lives there)."""
    from eclipse_spark.operators.text import exact_substring_dedup

    rows = [(5, " ".join(["a"] * 12)), (6, " ".join(["a"] * 11))]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in exact_substring_dedup(df, k=10).collect()}
    assert out[5].text == " ".join(["a"] * 10)
    assert out[5].n_tokens_removed == 2
    assert out[6].text == "" and out[6].n_tokens_removed == 11


def test_exact_substring_dedup_portable_matches_default(spark, sf_smoke):
    from eclipse_spark.operators.text import exact_substring_dedup

    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    a = exact_substring_dedup(docs, portable=False).orderBy("doc_id").collect()
    b = exact_substring_dedup(docs, portable=True).orderBy("doc_id").collect()
    assert a == b


def test_mixture_sample_respects_weights_and_budget(spark, sf_smoke):
    """No source may exceed its keep threshold's implied share; the
    binding source (min tokens/weight) keeps everything (frac=1)."""
    from eclipse_spark.operators.text import mixture_sample, tokens
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    weights = {"src0": 0.4, "src1": 0.3, "src2": 0.2, "src3": 0.1}
    out = {r["source"]: r for r in mixture_sample(docs, weights).collect()}
    assert set(out) == set(weights)
    res = 1 << 20
    totals = {
        r["source"]: r["t"]
        for r in docs.filter(F.col("source").isin(*weights))
        .groupBy("source")
        .agg(F.sum(F.size(tokens(F.col("text")))).alias("t"))
        .collect()
    }
    k = min(totals[s] / w for s, w in weights.items())
    binding = min(weights, key=lambda s: totals[s] / weights[s])
    assert out[binding]["threshold"] == res  # frac = 1.0 -> keeps all
    for s, w in weights.items():
        import math

        expect_thr = math.floor(min(1.0, w * k / totals[s]) * res)
        assert out[s]["threshold"] == expect_thr
        assert out[s]["n_docs"] <= 25  # never upsampled


def test_hashed_ngram_score_known_weights(spark):
    """Score must equal the sum of the weights of the doc's bigram
    buckets — verified by computing buckets independently."""
    from eclipse_spark.functions.scalar import portable_hash60
    from eclipse_spark.operators.text import hashed_ngram_score
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha alpha"), (3, "solo")],
        ["doc_id", "text"],
    )
    buckets = 64
    weights = spark.range(buckets).select(
        F.col("id").alias("bucket"), (F.col("id") * 0.25).alias("weight")
    )
    out = {
        r["doc_id"]: r
        for r in hashed_ngram_score(
            docs, weights, n=2, buckets=buckets, portable=True
        ).collect()
    }
    grams = {1: ["alpha beta", "beta gamma"], 2: ["alpha alpha"], 3: ["solo"]}
    bk = {
        r["g"]: r["b"]
        for r in spark.createDataFrame(
            [(g,) for gs in grams.values() for g in gs], ["g"]
        )
        .select("g", F.pmod(portable_hash60(F.md5("g"), 0), F.lit(buckets)).alias("b"))
        .collect()
    }
    for d, gs in grams.items():
        assert out[d]["n_grams"] == len(gs)
        assert abs(out[d]["score"] - sum(bk[g] * 0.25 for g in gs)) < 1e-9


def test_bpe_encode_applies_vocab_and_oov_fallback(spark):
    """Known vocab: tokens present in the vocab take their trained
    symbol sequence; OOV tokens fall back to character symbols; docs
    reassemble in token order."""
    from eclipse_spark.operators.text import bpe_encode

    docs = spark.createDataFrame(
        [(1, "low lower new"), (2, ""), (3, "low low")],
        ["doc_id", "text"],
    )
    vocab = spark.createDataFrame(
        [("low", "lo w"), ("lower", "lo w e r")], ["word", "syms"]
    )
    out = {r["doc_id"]: r for r in bpe_encode(docs, vocab).collect()}
    assert out[1]["encoded"] == "lo w lo w e r n e w"  # 'new' is OOV
    assert out[1]["n_tokens"] == 3 and out[1]["n_syms"] == 9
    assert out[2]["encoded"] == "" and out[2]["n_tokens"] == 0
    assert out[3]["encoded"] == "lo w lo w" and out[3]["n_syms"] == 4


def test_mixture_sample_rows_matches_summary(spark, sf_smoke):
    """The rows surface and the audit summary share one threshold
    derivation: per-source row counts must agree exactly, and only
    weighted sources may appear."""
    from pyspark.sql import functions as F

    from eclipse_spark.operators.text import mixture_sample, mixture_sample_rows

    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    weights = {"src0": 0.4, "src1": 0.3, "src2": 0.2, "src3": 0.1}
    summary = {r["source"]: r["n_docs"] for r in mixture_sample(docs, weights).collect()}
    rows = mixture_sample_rows(docs, weights)
    assert rows.columns == docs.columns  # full original rows, not a projection
    got = {
        r["source"]: r["n"]
        for r in rows.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert got == summary


def test_tfidf_top_terms_ranks_rare_terms(spark):
    """Corpus-wide terms get zero idf; document-specific terms rank
    first. Every document still yields k rows when it has terms."""
    from eclipse_spark.operators.search import tfidf_top_terms

    df = spark.createDataFrame(
        [(1, "common rare common"), (2, "common unique"), (3, "common common")],
        ["doc_id", "text"],
    )
    got = {
        (r["doc_id"], r["rank"]): (r["term"], r["score"])
        for r in tfidf_top_terms(df, k=1).collect()
    }
    assert got[(1, 1)][0] == "rare" and got[(2, 1)][0] == "unique"
    assert got[(3, 1)] == ("common", 0.0)  # only zero-idf terms available


def test_select_canonical_keeps_best_per_cluster(spark):
    """Highest score wins a cluster, ties break to the smallest id,
    unclustered docs are singleton keeps."""
    from eclipse_spark.operators.dedup import select_canonical

    comps = spark.createDataFrame([(1, 1), (2, 1), (5, 5), (6, 5)], ["node", "component"])
    scored = spark.createDataFrame(
        [(1, 10), (2, 30), (5, 7), (6, 7), (9, 1)], ["doc_id", "score"]
    )
    got = {
        r["doc_id"]: (r["component"], r["kept"])
        for r in select_canonical(scored, comps, "score").collect()
    }
    assert got == {1: (1, 0), 2: (1, 1), 5: (5, 1), 6: (5, 0), 9: (9, 1)}


def test_gopher_rules_flags(spark):
    """Rule verdicts on constructed docs: a healthy doc passes all
    four; a short doc fails word count; a doc of 1-char words fails
    mean length; a digit-word doc fails the alpha fraction; a doc with
    one stop-word fails the stop rule; empty text fails everything."""
    from eclipse_spark.operators.text import gopher_rules

    healthy = " ".join(["the", "for"] + ["table"] * 60)
    short = "the for table"
    thin = " ".join(["the", "for"] + ["a"] * 60)        # mean len < 3
    digits = " ".join(["the", "for"] + ["12345"] * 60)  # alpha frac low
    onestop = " ".join(["the"] + ["table"] * 60)
    rows = [(1, healthy), (2, short), (3, thin), (4, digits),
            (5, onestop), (6, "")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: r for r in gopher_rules(df).collect()}
    assert got[1].pass_gopher == 1
    assert (got[2].r_wordcount, got[2].pass_gopher) == (0, 0)
    assert (got[3].r_meanlen, got[3].pass_gopher) == (0, 0)
    assert (got[4].r_alpha, got[4].pass_gopher) == (0, 0)
    assert (got[5].r_stop, got[5].pass_gopher) == (0, 0)
    assert got[6].n_tokens == 0 and got[6].pass_gopher == 0


def test_feature_hash_sparse_counts(spark):
    """Bucket ids are hash-stable, counts sum to the token count, and
    the portable tier equals itself across two runs (determinism) and
    distributes across buckets."""
    from eclipse_spark.operators.text import feature_hash, tokens
    from pyspark.sql import functions as F

    rows = [(1, "alpha beta alpha gamma"), (2, "beta beta delta")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = feature_hash(df, n_buckets=16, portable=True)
    per_doc = {r.doc_id: r.s for r in
               out.groupBy("doc_id").agg(F.sum("n").alias("s")).collect()}
    assert per_doc == {1: 4, 2: 3}
    a = sorted(map(tuple, out.collect()))
    b = sorted(map(tuple, feature_hash(df, n_buckets=16, portable=True).collect()))
    assert a == b
    assert all(0 <= r[1] < 16 for r in a)
    # same token -> same bucket across docs: 'beta' rows agree
    xs = feature_hash(
        spark.createDataFrame([(9, "beta")], ["doc_id", "text"]),
        n_buckets=16, portable=True,
    ).collect()
    beta_bucket = xs[0].bucket
    assert any(r[1] == beta_bucket for r in a)
