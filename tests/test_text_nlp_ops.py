"""Unit tests for the round-5 text/NLP operators (oracle-parity covers
the driver queries; these pin the semantics on hand-built corpora)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from eclipse_spark.operators import text
from eclipse_spark.operators.dedup import containment_pairs
from eclipse_spark.operators.search import phrase_search
from eclipse_spark.operators.similarity import random_projection


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "new york is big and new york is old"),
        (2, "the city of new york hosts the expo"),
        (3, "big data and old data"),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_pmi_ranks_true_collocation_first(corpus):
    out = text.pmi_bigrams(corpus, min_count=3, k=5).collect()
    assert out[0].w1 == "new" and out[0].w2 == "york" and out[0].rank == 1
    assert out[0].n_pair == 3


def test_skipgram_pairs_symmetric_counts(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id bigint, text string")
    got = {
        (r.center, r.context): r.n_pairs
        for r in text.skipgram_pairs(df, window=2, min_count=1).collect()
    }
    # pairs: (a,b),(b,c) at d=1; (a,c) at d=2; mirrored
    assert got == {
        ("a", "b"): 1, ("b", "a"): 1, ("b", "c"): 1, ("c", "b"): 1,
        ("a", "c"): 1, ("c", "a"): 1,
    }


def test_normalize_text_strips_and_collapses(spark):
    df = spark.createDataFrame(
        [(1, "  Hello,   WORLD!!  it's\t42  ")], "doc_id bigint, text string"
    )
    r = text.normalize_text(df).collect()[0]
    assert r.norm_text == "hello world its 42"
    assert r.n_chars_norm == len("hello world its 42")
    assert r.n_chars_raw > r.n_chars_norm


def test_phrase_search_positions_and_arity(spark):
    df = spark.createDataFrame(
        [(1, "x table hash y table hash table"), (2, "table only hash apart")],
        "doc_id bigint, text string",
    )
    got = sorted(
        (r.doc_id, r.start_pos)
        for r in phrase_search(df, ["table", "hash"]).collect()
    )
    assert got == [(1, 1), (1, 4)]
    three = phrase_search(df, ["y", "table", "hash"]).collect()
    assert [(r.doc_id, r.start_pos) for r in three] == [(1, 3)]
    with pytest.raises(ValueError):
        phrase_search(df, [])


def test_containment_is_asymmetric(spark):
    base = "one two three four five six seven eight nine ten"
    df = spark.createDataFrame(
        [(1, base), (2, "one two three four five")],
        "doc_id bigint, text string",
    )
    got = {
        (r.id_a, r.id_b): r.containment
        for r in containment_pairs(df, n=3, threshold=0.0).collect()
    }
    # all of doc2's shingles appear in doc1 -> containment(2 in 1) = 1.0
    assert got[(2, 1)] == 1.0
    assert got[(1, 2)] < 0.5  # but doc1 is NOT contained in doc2


def test_random_projection_shape_and_determinism(spark, sf_smoke):
    emb = spark.read.parquet(f"{sf_smoke}/embeddings.parquet").limit(20)
    a = random_projection(emb, out_dim=4, seed=11).collect()
    b = random_projection(emb, out_dim=4, seed=11).collect()
    assert len(a) == 20 * 4
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    c = random_projection(emb, out_dim=4, seed=12).collect()
    assert sorted(map(tuple, a)) != sorted(map(tuple, c))


def test_bigram_logprob_prefers_ordered_text(spark):
    # same unigram bag, different order: the repeated ordered corpus
    # makes "a b" transitions likely; the scrambled doc scores lower
    rows = [(i, "a b c d") for i in range(1, 9)] + [(9, "d b a c")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r.doc_id: r for r in text.bigram_logprob(df, k=0.5).collect()}
    assert got[1].n_trans == 3
    assert got[1].avg_logprob > got[9].avg_logprob
    # short-doc handling: a 1-token doc yields 0 transitions, NULL score
    one = spark.createDataFrame([(1, "solo")], "doc_id bigint, text string")
    r = text.bigram_logprob(one).collect()[0]
    assert r.n_trans == 0 and r.avg_logprob is None


def test_containment_on_candidates_matches_allpairs_on_recalled(spark):
    from eclipse_spark.operators import dedup

    base = "one two three four five six seven eight nine ten"
    # the 9-of-10-token excerpt keeps Jaccard ~0.875 so the banded
    # MinHash (8 bands x 4 rows) recalls the pair deterministically
    df = spark.createDataFrame(
        [(1, base), (2, "one two three four five six seven eight nine")],
        "doc_id bigint, text string",
    )
    cands = dedup.minhash_lsh_candidates(
        df, num_hashes=32, bands=8, shingle_k=3, portable=True
    )
    got = {
        (r.id_a, r.id_b): r.containment
        for r in dedup.containment_on_candidates(
            df, cands, n=3, threshold=0.0
        ).collect()
    }
    allp = {
        (r.id_a, r.id_b): r.containment
        for r in dedup.containment_pairs(df, n=3, threshold=0.0).collect()
    }
    assert got  # the high-overlap pair is recalled
    for pair, c in got.items():
        assert allp[pair] == c  # verify agrees with the exact baseline
    assert got[(2, 1)] == 1.0 and got[(1, 2)] < 1.0


def test_collapse_repeated_lines_exact(spark):
    from eclipse_spark.operators.text import collapse_repeated_lines

    df = spark.createDataFrame(
        [(1, "a\na\nb\na\nc\nc\nc"), (2, "solo"), (3, "")],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in collapse_repeated_lines(df).collect()}
    assert out[1].text == "a\nb\na\nc"  # non-consecutive repeat of 'a' kept
    assert (out[1].n_lines_in, out[1].n_lines_out, out[1].n_removed) == (7, 4, 3)
    assert out[2].text == "solo" and out[2].n_removed == 0
    assert out[3].n_removed == 0


def test_negative_samples_deterministic_and_valid(spark):
    from eclipse_spark.operators.text import negative_samples

    df = spark.createDataFrame([(i,) for i in range(10, 20)], ["doc_id"])
    a = negative_samples(df, "doc_id", k=3, seed=1).collect()
    b = negative_samples(df, "doc_id", k=3, seed=1).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # reproducible
    assert len(a) == 10 * 3
    for r in a:
        assert r.neg != r.anchor          # never self
        assert 10 <= r.neg < 20           # a real corpus member
    # different seed -> different draws (overwhelmingly)
    c = negative_samples(df, "doc_id", k=3, seed=2).collect()
    assert sorted(map(tuple, a)) != sorted(map(tuple, c))
