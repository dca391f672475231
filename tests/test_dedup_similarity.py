"""Dedup + similarity operators on planted fixtures (FIXTURES F7):
exact dups, near-dups with small edits, planted nearest neighbors."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from eclipse_spark.operators import dedup, similarity


@pytest.fixture(scope="module")
def planted_docs(spark):
    random.seed(42)
    vocab = [f"w{i}" for i in range(200)]
    base = [" ".join(random.choices(vocab, k=40)) for _ in range(50)]
    rows = []
    did = 0
    for i, text in enumerate(base):
        rows.append((did, text, i)); did += 1
    # exact duplicates of first 5
    for i in range(5):
        rows.append((did, base[i], i)); did += 1
    # near duplicates of next 5 (edit one word)
    for i in range(5, 10):
        toks = base[i].split(); toks[3] = "EDITED"
        rows.append((did, " ".join(toks), i)); did += 1
    return spark.createDataFrame(rows, ["doc_id", "text", "group"])


def test_exact_dedup_drops_exact_only(planted_docs):
    kept = dedup.exact_dedup(planted_docs)
    assert kept.count() == 60 - 5  # 5 exact dups removed
    groups = dedup.exact_dup_groups(planted_docs)
    assert groups.count() == 5
    assert all(r["n_dups"] == 2 for r in groups.collect())


def test_minhash_finds_near_dups(planted_docs):
    cands = dedup.minhash_lsh_candidates(planted_docs, num_hashes=32, bands=16)
    pairs = {(r["id_a"], r["id_b"]) for r in cands.collect()}
    # every exact pair (i, 50+i) i<5 and near pair (i, 55+i-5) must be caught
    for i in range(5):
        assert (i, 50 + i) in pairs, f"exact dup pair {i} missed"
    for i in range(5, 10):
        assert (i, 50 + i) in pairs, f"near dup pair {i} missed"


def test_minhash_dedup_end_to_end(planted_docs):
    kept = dedup.minhash_dedup(planted_docs, num_hashes=32, bands=16, threshold=0.5)
    ids = {r["doc_id"] for r in kept.collect()}
    # all duplicate ids (50..59) removed, originals retained
    assert ids.issuperset(set(range(0, 50))) or len(ids) == 50
    assert not ids.intersection(set(range(50, 60)))


def test_simhash_close_on_near_dups(planted_docs):
    sig = planted_docs.select(
        "doc_id",
        dedup.simhash_signature(F.col("text"), shingle_k=5).alias("sig"),
    )
    sigs = {r["doc_id"]: r["sig"] for r in sig.collect()}
    for i in range(5):  # exact dups: identical signature
        assert sigs[i] == sigs[50 + i]
    for i in range(5, 10):  # near dups: small hamming distance
        ham = bin((sigs[i] ^ sigs[50 + i]) & ((1 << 64) - 1)).count("1")
        assert ham <= 16, f"near dup {i} hamming {ham}"


def test_simhash_candidates_exact_recall(planted_docs):
    """Multi-table SimHash is exact for hamming <= tables-1: candidates
    must EQUAL the brute-force all-pairs {hamming <= max_hamming} set —
    superset by the pigeonhole band argument, subset by the verify."""
    sigs = {
        r["id"]: r["sig"]
        for r in dedup.simhash_signatures_df(planted_docs).collect()
    }
    ids = sorted(sigs)
    truth = {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin((sigs[a] ^ sigs[b]) & ((1 << 64) - 1)).count("1") <= 3
    }
    assert truth, "fixture must contain at least one near-dup pair"
    cands = dedup.simhash_candidates(planted_docs, tables=4, band_bits=16, max_hamming=3)
    got = {(r["id_a"], r["id_b"]) for r in cands.collect()}
    assert got == truth


def test_simhash_candidates_bounded_fanout(planted_docs):
    """The hamming verify bounds the emitted pair set: every returned
    pair is a real near-dup, never a within-bucket explosion."""
    out = dedup.simhash_candidates(planted_docs, max_hamming=3).collect()
    assert all(r["hamming"] <= 3 for r in out)
    n_docs = planted_docs.count()
    assert len(out) < n_docs  # pairs stay linear-ish, not quadratic


def _uf_components(edges, nodes):
    """Reference union-find: node -> min id of its component."""
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
    return {n: find(n) for n in nodes}


def test_connected_components_chain_and_cycle(spark):
    """A 10-node path (diameter 9: exercises multi-round propagation),
    a triangle, and an isolated pair — labels must match union-find."""
    edges = [(i, i + 1) for i in range(9)] + [(20, 21), (21, 22), (22, 20), (30, 31)]
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    got = {r["node"]: r["component"] for r in dedup.connected_components(df).collect()}
    nodes = {n for e in edges for n in e}
    assert got == _uf_components(edges, nodes)


def test_connected_components_star_matches_union_find(spark):
    """Large-star/small-star must produce the identical (node, min-id
    component) map as union-find — including a diameter-99 chain that
    min-label propagation cannot finish inside its default budget."""
    import random as _random

    cases = [
        [(1, 2)],
        [(i, i + 1) for i in range(1, 100)],  # diameter 99
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 10)],
    ]
    _random.seed(5)
    cases.append(
        list(
            {
                (min(a, b), max(a, b))
                for a, b in (
                    (_random.randint(1, 200), _random.randint(1, 200))
                    for _ in range(180)
                )
                if a != b
            }
        )
    )
    for edges in cases:
        df = spark.createDataFrame(edges, ["id_a", "id_b"])
        got = {
            r["node"]: r["component"]
            for r in dedup.connected_components_star(df).collect()
        }
        nodes = {n for e in edges for n in e}
        assert got == _uf_components(edges, nodes)


def test_connected_components_raises_past_diameter_budget(spark):
    """Silent partial propagation is banned: a diameter-29 chain at
    max_iter=20 must raise (pointing at the star variant), never
    return wrong clusters."""
    import pytest as _pytest

    df = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 30)], ["id_a", "id_b"]
    )
    with _pytest.raises(RuntimeError, match="connected_components_star"):
        dedup.connected_components(df, max_iter=20).collect()


def test_connected_components_star_raises_past_budget(spark):
    """Same no-silent-partial contract as the min-label variant: a
    chain whose diameter exceeds the halving reach of max_iter=1 must
    raise, never return a partially-contracted (inconsistent) map —
    and the same graph converges cleanly at the default budget."""
    import pytest as _pytest

    edges = [(i, i + 1) for i in range(1, 30)]
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    with _pytest.raises(RuntimeError, match="no checksum fixpoint"):
        dedup.connected_components_star(df, max_iter=1).collect()
    got = {
        r["node"]: r["component"]
        for r in dedup.connected_components_star(df).collect()
    }
    assert set(got.values()) == {1}


def test_near_dedup_cc_collapses_chains(spark):
    """Transitive chain a~b, b~c (a never directly paired with c) must
    leave exactly one survivor — the pairwise-drop shape can't express
    this without the component step."""
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(6)], ["doc_id", "text"]
    )
    pairs = spark.createDataFrame([(0, 1), (1, 2), (4, 5)], ["id_a", "id_b"])
    kept = sorted(r["doc_id"] for r in dedup.near_dedup_cc(docs, pairs).collect())
    assert kept == [0, 3, 4]


@pytest.fixture(scope="module")
def planted_vectors(spark):
    random.seed(7)
    dim = 16
    rows = []
    for i in range(100):
        v = [random.gauss(0, 1) for _ in range(dim)]
        n = math.sqrt(sum(x * x for x in v))
        rows.append((i, [x / n for x in v]))
    # plant near neighbors: vec 100+i ~= vec i (tiny noise)
    for i in range(5):
        v = [x + random.gauss(0, 0.01) for x in rows[i][1]]
        n = math.sqrt(sum(x * x for x in v))
        rows.append((100 + i, [x / n for x in v]))
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_brute_force_topk_finds_planted(planted_vectors):
    queries = planted_vectors.filter(F.col("vec_id") < 5)
    out = similarity.brute_force_topk(queries, planted_vectors, k=1)
    top1 = {r["query_id"]: r["match_id"] for r in out.collect()}
    assert top1 == {i: 100 + i for i in range(5)}


def test_lsh_topk_recall_on_planted(planted_vectors):
    queries = planted_vectors.filter(F.col("vec_id") < 5)
    out = similarity.lsh_topk(queries, planted_vectors, k=1, planes=4)
    top1 = {r["query_id"]: r["match_id"] for r in out.collect()}
    # sign-sketch buckets: a planted near-identical vector lands in the
    # same bucket with overwhelming probability at 4 planes
    hits = sum(1 for i in range(5) if top1.get(i) == 100 + i)
    assert hits >= 4


def test_ivf_topk_finds_planted(planted_vectors):
    """A near-identical planted neighbor shares the query's Voronoi
    cell by construction, so IVF top-1 must find it even at low
    n_probe."""
    queries = planted_vectors.filter(F.col("vec_id") < 5)
    out = similarity.ivf_topk(queries, planted_vectors, k=1, n_cells=8, n_probe=2)
    top1 = {r["query_id"]: r["match_id"] for r in out.collect()}
    hits = sum(1 for i in range(5) if top1.get(i) == 100 + i)
    assert hits >= 4


def test_ivf_topk_recall_vs_brute_force(planted_vectors):
    """Recall@5 against the exact baseline must beat the probed-cell
    fraction by a wide margin (probing nearest-by-centroid cells is
    better than random cells even on unclustered data)."""
    queries = planted_vectors.filter(F.col("vec_id") < 10)
    exact = similarity.brute_force_topk(queries, planted_vectors, k=5)
    approx = similarity.ivf_topk(queries, planted_vectors, k=5, n_cells=8, n_probe=4)
    truth = {(r["query_id"], r["match_id"]) for r in exact.collect()}
    got = {(r["query_id"], r["match_id"]) for r in approx.collect()}
    recall = len(truth & got) / len(truth)
    assert recall >= 0.5, f"recall {recall}"


def test_sign_sketch_df_matches_hof_spec(planted_vectors):
    """The codegen sign_sketch_df must produce bucket-identical sketches
    to the interpreted HOF spec (sign_sketch) — same hash, same weight
    formula, same empty-vector convention."""
    for planes, seed in [(4, 7), (12, 7), (10, 3)]:
        spec = planted_vectors.select(
            F.col("vec_id").alias("id"),
            similarity.sign_sketch(F.col("embedding"), planes, seed).alias("bucket"),
        )
        fast = similarity.sign_sketch_df(
            planted_vectors, "vec_id", "embedding", planes, seed
        ).select("id", "bucket")
        a = {r["id"]: r["bucket"] for r in spec.collect()}
        b = {r["id"]: r["bucket"] for r in fast.collect()}
        assert a == b, f"sketch mismatch at planes={planes} seed={seed}"


def test_sign_sketch_df_handles_empty_vector(spark):
    df = spark.createDataFrame([(1, [0.5, -0.25]), (2, [])], "vec_id long, embedding array<double>")
    out = {r["id"]: r["bucket"] for r in
           similarity.sign_sketch_df(df, "vec_id", "embedding", planes=4).collect()}
    assert set(out) == {1, 2}
    # empty vec: the HOF fold's projection is NULL -> every bit 0
    assert out[2] == 0


def test_embedding_near_dup_pairs(planted_vectors):
    out = dedup.embedding_near_dup(
        planted_vectors, threshold=0.98, planes=4
    )
    pairs = {(r["id_a"], r["id_b"]) for r in out.collect()}
    found = sum(1 for i in range(5) if (i, 100 + i) in pairs)
    assert found >= 4


def test_semantic_dedup_drops_within_cell_only(spark):
    """Near-dup pairs in DIFFERENT cells must both survive (SemDeDup
    compares within a cluster only); within-cell near-dups drop the
    larger id; assignment goes to the nearest centroid."""
    from eclipse_spark.operators.dedup import semantic_dedup

    cents = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0])], ["cell", "centroid"]
    )
    emb = spark.createDataFrame(
        [
            (10, [1.0, 0.1, 0.0]),   # cell 0
            (11, [2.0, 0.2, 0.0]),   # cell 0, cosine 1.0 with 10 -> dropped
            (12, [0.1, 1.0, 0.0]),   # cell 1, cosine ~0.55 with 10: survives
            (13, [0.2, 2.0, 0.0]),   # cell 1, cosine 1.0 with 12 -> dropped
        ],
        ["vec_id", "embedding"],
    )
    got = {r["vec_id"]: (r["cell"], r["kept"]) for r in
           semantic_dedup(emb, cents, threshold=0.95).collect()}
    assert got == {10: (0, 1), 11: (0, 0), 12: (1, 1), 13: (1, 0)}


def test_semantic_dedup_pair_budget_guard(spark):
    """Cells outgrowing the centroid count is the one way SemDeDup
    goes quadratic (measured superlinear in the 100x scaling probe at
    pinned k): the pair-count audit must RAISE before launching the
    join, name the remedy, and stay silent under the budget or when
    disabled."""
    import pytest as _pytest

    from eclipse_spark.operators.dedup import semantic_dedup

    cents = spark.createDataFrame([(0, [1.0, 0.0])], ["cell", "centroid"])
    emb = spark.createDataFrame(
        [(i, [1.0, float(i) / 100]) for i in range(40)],
        ["vec_id", "embedding"],
    )
    # 40 vectors, 1 cell -> 780 pairs > budget 100
    with _pytest.raises(RuntimeError, match="n_cells"):
        semantic_dedup(emb, cents, max_pairs=100)
    assert semantic_dedup(emb, cents, max_pairs=1000).count() == 40
    assert semantic_dedup(emb, cents, max_pairs=None).count() == 40


def test_semantic_dedup_autoscale_converges_where_pinned_k_refuses(spark):
    """VERDICT r7 task 4: the guard's remedy is wired in — the same
    corpus + budget that makes pinned-k semantic_dedup RAISE completes
    under semantic_dedup_autoscale, because n_cells scales with N and
    cell sizes (hence the pair audit) stay bounded. Dedup semantics
    survive the scaling: a planted exact copy still drops."""
    import pytest as _pytest

    from eclipse_spark.operators.dedup import (
        semantic_dedup,
        semantic_dedup_autoscale,
    )

    # 60 well-spread vectors + 1 planted copy of id 7 (cosine 1.0)
    base = [(i, [1.0, float(i) * 7 % 61]) for i in range(60)]
    emb = spark.createDataFrame(
        base + [(1000, [2.0, 2.0 * (7 * 7 % 61)])], ["vec_id", "embedding"]
    )
    one_cell = spark.createDataFrame([(0, [1.0, 0.0])], ["cell", "centroid"])
    with _pytest.raises(RuntimeError, match="n_cells"):
        semantic_dedup(emb, one_cell, max_pairs=300)  # 61*60/2 = 1830 pairs

    out = semantic_dedup_autoscale(
        emb, target_cell_size=8, n_iter=1, max_pairs=300
    )
    rows = {r["vec_id"]: r["kept"] for r in out.collect()}
    assert len(rows) == 61
    assert rows[7] == 1 and rows[1000] == 0  # copy dropped, original kept


def test_minhash_dedup_against_drops_only_cross_dups(spark):
    """Planted near-copies of ref docs drop from the new batch; docs
    that only duplicate OTHER NEW docs survive (this operator checks
    against the reference corpus only — in-batch dedup is
    minhash_dedup's job)."""
    from pyspark.sql import functions as F

    from eclipse_spark.operators.dedup import minhash_dedup_against

    base = "the quick brown fox jumps over the lazy dog again and again tonight"
    ref = spark.createDataFrame(
        [(i, f"{base} ref variant {i} " + "filler words " * 5) for i in range(5)],
        ["doc_id", "text"],
    )
    new = spark.createDataFrame(
        [
            # near-copy of ref doc 2 (whitespace-perturbed) -> must drop
            (100, (base + " ref variant 2 " + "filler words " * 5).replace(" ", "  ")),
            # two identical NEW docs, unrelated to ref -> both survive
            (101, "completely different content about engines and parquet files"),
            (102, "completely different content about engines and parquet files"),
            # unique doc -> survives
            (103, "another unique document with its own words entirely"),
        ],
        ["doc_id", "text"],
    )
    kept = {
        r["doc_id"]
        for r in minhash_dedup_against(new, ref, threshold=0.8).collect()
    }
    assert kept == {101, 102, 103}


def test_dataset_split_deterministic_and_membership_stable(spark, sf_smoke):
    """Every row gets exactly one split; assignments never move when
    other rows are added/removed (hash-range, not rank-based)."""
    from pyspark.sql import functions as F

    from eclipse_spark.operators.relational import dataset_split

    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    full = {r["doc_id"]: r["split"] for r in dataset_split(docs, fr).collect()}
    assert set(full.values()) <= {"train", "val", "test"}
    n = len(full)
    assert sum(1 for v in full.values() if v == "train") > 0.6 * n
    # membership stability: same ids keep their split on a subset
    sub = {
        r["doc_id"]: r["split"]
        for r in dataset_split(docs.filter(F.col("doc_id") % 2 == 0), fr).collect()
    }
    assert all(full[k] == v for k, v in sub.items())


def test_minhash_index_matches_direct_refresh(spark, tmp_path):
    """The index-backed refresh (precomputed bucketed ref signatures,
    dedup.minhash_index_ref + minhash_dedup_against_index) must keep
    exactly the rows the direct minhash_dedup_against keeps — the
    stored artifact changes the execution path, never the answer."""
    from pyspark.sql import functions as F

    from eclipse_spark.operators.dedup import (
        minhash_dedup_against,
        minhash_dedup_against_index,
        minhash_index_ref,
    )
    from eclipse_spark.storage import Catalog

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    ref = docs.filter(F.col("doc_id") < 100)
    new = docs.filter(F.col("doc_id") >= 100).unionByName(
        ref.filter(F.col("doc_id") % 7 == 0).select(
            (F.col("doc_id") + 100000).alias("doc_id"),
            F.regexp_replace("text", " ", "  ").alias("text"),
        )
    )
    direct = {r["doc_id"] for r in minhash_dedup_against(new, ref).collect()}
    cat = Catalog(spark, str(tmp_path))
    try:
        minhash_index_ref(cat, ref, table="mh_ref_idx_test")
        indexed = {
            r["doc_id"]
            for r in minhash_dedup_against_index(
                new, cat.get_table("mh_ref_idx_test"), ref
            ).collect()
        }
    finally:
        spark.sql("DROP TABLE IF EXISTS mh_ref_idx_test")
    assert indexed == direct
    # planted near-copies must actually have dropped (non-degenerate)
    assert direct < {r["doc_id"] for r in new.select("doc_id").collect()}


def test_pq_encode_shape_and_self_codes(spark, sf_smoke):
    from pyspark.sql import functions as F
    from eclipse_spark.operators import similarity as sim

    emb = spark.read.parquet(f"{sf_smoke}/embeddings.parquet")
    n = emb.count()
    enc = sim.pq_encode(emb, m=8, ksub=16)
    rows = enc.collect()
    assert len(rows) == n * 8  # one code per (vector, subspace)
    assert all(0 <= r.code < 16 for r in rows)
    # seed vectors ARE the codebook: they encode to themselves at dist 0
    seeds = [r for r in rows if r.vec_id < 16]
    assert seeds and all(r.code == r.vec_id and r.dist == 0.0 for r in seeds)


def test_pq_refinement_reduces_distortion(spark, sf_smoke):
    from pyspark.sql import functions as F
    from eclipse_spark.operators import similarity as sim

    emb = spark.read.parquet(f"{sf_smoke}/embeddings.parquet")
    d0 = (
        sim.pq_encode(emb, sim.pq_codebook(emb, n_iter=0))
        .agg(F.avg("dist"))
        .first()[0]
    )
    d1 = (
        sim.pq_encode(emb, sim.pq_codebook(emb, n_iter=1))
        .agg(F.avg("dist"))
        .first()[0]
    )
    assert d1 < d0  # one Lloyd round must not increase distortion


def test_pq_topk_plan_broadcasts_lookup_tables(spark, sf_smoke):
    from pyspark.sql import functions as F
    from eclipse_spark.operators import similarity as sim

    emb = spark.read.parquet(f"{sf_smoke}/embeddings.parquet")
    top = sim.pq_topk(emb.filter(F.col("vec_id") < 2), emb, k=5)
    plan = top._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # codebook + distance table sides
    got = top.collect()
    assert {r.query_id for r in got} == {0, 1}
    assert all(1 <= r.rank <= 5 for r in got)


def test_label_separability_well_separated_clusters(spark):
    """Two tight, distant clusters: separation >> 1, nearest labels
    point at each other, intra spread tiny."""
    from eclipse_spark.operators.similarity import label_separability

    rows = []
    for i, base in ((0, 0.0), (1, 100.0)):
        for j in range(4):
            rows.append((i * 10 + j, [base + j * 0.1, base], i))
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    out = {r.label: r for r in label_separability(df).collect()}
    assert out[0].nearest_label == 1 and out[1].nearest_label == 0
    assert out[0].n_vecs == 4
    assert out[0].separation > 100
    assert abs(out[0].inter_dist - out[1].inter_dist) < 1e-9  # symmetric


def test_label_separability_identical_centroids(spark):
    """Coincident clusters: inter distance 0, separation 0."""
    from eclipse_spark.operators.similarity import label_separability

    rows = [(i, [float(i % 2), 0.0], lab) for lab in (0, 1) for i in range(4)]
    df = spark.createDataFrame(
        [(lab * 10 + i, v, lab) for i, v, lab in rows], ["vec_id", "embedding", "label"]
    )
    out = {r.label: r for r in label_separability(df).collect()}
    assert out[0].inter_dist == 0.0 and out[0].separation == 0.0


def test_multiprobe_recall_at_least_single_probe(spark, sf_smoke):
    """Hamming-1 probing can only ADD candidates: every single-probe
    result pair appears in the multiprobe candidate set, and recall vs
    brute force is >= the single-probe tier's."""
    from eclipse_spark.operators.similarity import (
        brute_force_topk,
        lsh_topk,
        lsh_topk_multiprobe,
    )

    emb = spark.read.parquet(f"{sf_smoke}/embeddings.parquet")
    qs = emb.filter("vec_id < 5")
    truth = {
        (r.query_id, r.match_id)
        for r in brute_force_topk(qs, emb, k=10).collect()
    }
    single = {(r.query_id, r.match_id) for r in lsh_topk(qs, emb, k=10, planes=6).collect()}
    multi = {
        (r.query_id, r.match_id)
        for r in lsh_topk_multiprobe(qs, emb, k=10, planes=6).collect()
    }
    assert len(multi & truth) >= len(single & truth)


def test_lsh_recall_curve_shape(spark, sf_correct):
    """The measured curve must behave like an S-curve for 8x4 banding
    (threshold ~(1/8)^(1/4) ~ 0.59): no capture well below threshold,
    full capture well above, and every count consistent."""
    import sys

    sys.path.insert(0, "/root/repo")
    from __spark_entry__ import queries

    rows = {r.bin: r for r in queries()["lsh_s_curve"](spark, sf_correct).collect()}
    assert rows, "variant corpus must produce overlapping pairs"
    for b, r in rows.items():
        # J = 1 pairs clamp into the top decile: bins are 0..9, never 10
        assert 0 <= b <= 9
        assert 0 <= r.n_candidates <= r.n_pairs
        assert abs(r.capture_rate - round(r.n_candidates / r.n_pairs, 9)) < 1e-12
    low = [r for b, r in rows.items() if b <= 1]
    high = [r for b, r in rows.items() if b >= 8]
    if low:
        assert sum(r.n_candidates for r in low) == 0
    if high:
        assert all(r.capture_rate == 1.0 for r in high)


def test_int8_quantize_invariants(spark):
    """Per-dim min quantizes to 0, max to the top level (inclusive),
    codes are monotone in the value, constant dims code to 0, and
    dequantization error is bounded by one level's width."""
    from eclipse_spark.operators.similarity import int8_quantize

    vecs = [
        (1, [0.0, -1.0, 5.0]),
        (2, [0.5, 0.0, 5.0]),
        (3, [1.0, 3.0, 5.0]),
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    out = {r.vec_id: list(r.codes) for r in int8_quantize(df).collect()}
    # dim0 range [0,1]: 0 -> 0, 0.5 -> 127 (floor), 1 -> 255
    assert [out[1][0], out[2][0], out[3][0]] == [0, 127, 255]
    # dim1 range [-1,3]: -1 -> 0, 0 -> 63, 3 -> 255
    assert [out[1][1], out[2][1], out[3][1]] == [0, 63, 255]
    # dim2 constant: all 0
    assert [out[k][2] for k in (1, 2, 3)] == [0, 0, 0]
    # dequantize error bound: |v - (min + code*(max-min)/255)| <= range/255
    for vid, vec in vecs:
        code = out[vid][1]
        deq = -1.0 + code * 4.0 / 255
        assert abs(vec[1] - deq) <= 4.0 / 255 + 1e-12


def test_int8_topk_recall_vs_exact(spark, sf_smoke):
    """Searching the 4x-compressed codes must retain most of the exact
    float top-10 (quantization at 1/255-per-dim resolution is a mild
    perturbation), and self-match must rank first."""
    from eclipse_spark.operators.similarity import (
        brute_force_topk,
        int8_topk,
    )

    emb = spark.read.parquet(f"{sf_smoke}/embeddings.parquet")
    qs = emb.filter("vec_id < 5")
    exact = {
        (r.query_id, r.match_id)
        for r in brute_force_topk(qs, emb, k=10).collect()
    }
    coded = int8_topk(qs, emb, k=10).collect()
    got = {(r.query_id, r.match_id) for r in coded}
    assert len(got & exact) >= 0.6 * len(exact)
    firsts = {r.query_id: r.match_id for r in coded if r.rank == 1}
    assert all(q == m for q, m in firsts.items())


def test_lsh_recall_curve_exact_dup_folds_into_top_decile(spark):
    """A Jaccard-1.0 pair (identical text) must land in bin n_bins-1,
    not an out-of-range 11th bucket (ADVICE r5: floor(n_bins * J) at
    J = 1 spilled to bin == n_bins)."""
    from eclipse_spark.operators.dedup import lsh_recall_curve

    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    df = spark.createDataFrame(
        [(1, text), (2, text)], ["doc_id", "text"]
    )
    rows = lsh_recall_curve(df, portable=True).collect()
    assert [r.bin for r in rows] == [9]
    assert rows[0].n_pairs == 1


def test_semantic_dedup_scaled_matches_exact_tier(spark):
    """The Arrow/numpy kernel tier must reproduce the exact tier's
    (id, cell, kept) verdicts on a margin-separated corpus — same
    centroids injected, same threshold, same tie rule."""
    import random

    from eclipse_spark.operators.dedup import (
        semantic_dedup,
        semantic_dedup_scaled,
    )

    rnd = random.Random(23)
    base = [
        (i, [rnd.uniform(-1, 1) for _ in range(8)]) for i in range(80)
    ]
    # planted scaled copies (cosine 1.0) every 10th vector
    planted = [
        (1000 + i, [2.0 * x for x in v]) for i, v in base if i % 10 == 0
    ]
    emb = spark.createDataFrame(base + planted, ["vec_id", "embedding"])
    cents = spark.createDataFrame(
        [(j, base[j][1]) for j in range(6)], ["cell", "centroid"]
    )
    exact = {
        r["vec_id"]: (r["cell"], r["kept"])
        for r in semantic_dedup(
            emb, cents, threshold=0.95, max_pairs=None
        ).collect()
    }
    scaled = {
        r["vec_id"]: (r["cell"], r["kept"])
        for r in semantic_dedup_scaled(
            emb, threshold=0.95, centroids=cents
        ).collect()
    }
    assert scaled == exact
    assert sum(1 for _, k in exact.values() if k == 0) == len(planted)


def test_semantic_dedup_scaled_autoscale_path_and_guard(spark):
    import pytest as _pytest

    from eclipse_spark.operators.dedup import semantic_dedup_scaled

    emb = spark.createDataFrame(
        [(i, [1.0, float(i * 13 % 97)]) for i in range(90)]
        + [(500, [3.0, 3.0 * (5 * 13 % 97)])],  # copy of id 5
        ["vec_id", "embedding"],
    )
    out = semantic_dedup_scaled(emb, target_cell_size=16, n_iter=1)
    rows = {r["vec_id"]: r["kept"] for r in out.collect()}
    assert len(rows) == 91 and rows[5] == 1 and rows[500] == 0

    # degenerate collapse: every vector identical -> one giant cell
    flat = spark.createDataFrame(
        [(i, [1.0, 0.0]) for i in range(64)], ["vec_id", "embedding"]
    )
    with _pytest.raises(RuntimeError, match="max_cell_factor"):
        semantic_dedup_scaled(flat, target_cell_size=2, n_iter=0,
                              max_cell_factor=4)


def test_minhash_shared_sig_param_matches_recompute(spark, sf_smoke):
    """r14: minhash_lsh_candidates / minhash_estimate_pairs accept a
    precomputed signature table (one md5-per-shingle pass shared by
    both consumers instead of once per reference); results must be
    identical to the recompute path."""
    from eclipse_spark.operators import dedup

    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    sig = dedup.minhash_signatures_df(
        docs, num_hashes=16, shingle_k=3, portable=True
    ).localCheckpoint(eager=False)
    base_c = dedup.minhash_lsh_candidates(
        docs, num_hashes=16, bands=4, shingle_k=3, portable=True
    )
    shared_c = dedup.minhash_lsh_candidates(
        docs, num_hashes=16, bands=4, shingle_k=3, portable=True, sig=sig
    )
    assert sorted(map(tuple, base_c.collect())) == sorted(
        map(tuple, shared_c.collect())
    )
    base_e = dedup.minhash_estimate_pairs(
        docs, base_c, num_hashes=16, shingle_k=3, portable=True
    )
    shared_e = dedup.minhash_estimate_pairs(
        docs, shared_c, num_hashes=16, shingle_k=3, portable=True, sig=sig
    )
    assert sorted(map(tuple, base_e.collect())) == sorted(
        map(tuple, shared_e.collect())
    )
