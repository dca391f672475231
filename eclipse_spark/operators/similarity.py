"""Similarity search over embedding columns (north-star).

Two tiers, as the task demands:

- :func:`brute_force_topk` — exact cosine top-k. The pairwise score is
  a broadcast-nested-loop / cross join with the k-cut done by a window
  rank — correct baseline and the oracle for the approximate tier.
  Fine when one side is small (queries); at 100 TB corpus x many
  queries use the LSH tier.
- :func:`lsh_topk` — random-hyperplane sign-sketch buckets (IVF-style
  candidate lists): vectors only compare within matching buckets
  (multi-probe = compare on Hamming-near buckets), turning the
  quadratic scan into a bucket-keyed shuffle join.

All vector math is higher-order built-ins (``zip_with`` +
``aggregate``) — JVM codegen, no Python, no MLlib model state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))


def cosine_sim(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def sign_sketch(vec: Column, planes: int = 12, seed: int = 7) -> Column:
    """Random-hyperplane sign sketch packed into a long. Plane p's
    weight for dimension d is a deterministic pseudo-random value in
    [-1, 1) derived from xxhash64(p, d, seed) — reproducible across
    runs and engines, no stored model.

    NOTE: this HOF formulation runs *interpreted* (planes x dims lambda
    evals per row) — it is kept as the executable spec; the hot paths
    (:func:`lsh_topk`, ``dedup.embedding_near_dup``) use the codegen
    :func:`sign_sketch_df`, whose bucket-equivalence to this definition
    is pinned by ``tests/test_dedup_similarity.py``."""
    def plane_bit(p: int) -> Column:
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.sequence(F.lit(0), F.size(vec) - 1),
                lambda x, d: x
                * (
                    F.pmod(F.xxhash64(F.lit(p), d, F.lit(seed)), F.lit(1000))
                    .cast("double")
                    / 500.0
                    - 1.0
                ),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        return F.when(proj >= 0, F.lit(1).cast("bigint")).otherwise(F.lit(0).cast("bigint"))

    out = F.lit(0).cast("bigint")
    for p in range(planes):
        out = out.bitwiseOR(F.shiftleft(plane_bit(p), p))
    return out


def sign_sketch_df(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    planes: int = 12,
    seed: int = 7,
    id_alias: str = "id",
    vec_alias: str = "v",
    bucket_col: str = "bucket",
) -> DataFrame:
    """(id, vec, bucket) with the same sign sketch as :func:`sign_sketch`
    but via the codegen path: posexplode the vector, project all
    ``planes`` weighted terms in one flat select (xxhash64 outside any
    lambda — whole-stage codegen), then one map-side-combined
    HashAggregate of ``planes`` sums per id. The HOF formulation runs
    interpreted with per-element lambda re-eval (measured on SimHash:
    141 s HOF vs 2.5 s explode at sf0.1); this is the same fix.

    The vector rides the aggregate as ``first()`` so no second scan or
    join-back is needed; the shuffle per doc is (id, vec, ``planes``
    doubles) after partial aggregation."""
    ex = df.select(
        F.col(id_col).alias(id_alias),
        F.col(vec_col).alias(vec_alias),
        F.posexplode_outer(F.col(vec_col)).alias("_d", "_x"),
    )
    # weight(p, d) must match sign_sketch exactly: pmod(xxhash64(p, d,
    # seed), 1000)/500 - 1, with p/d/seed all IntegerType.
    terms = ex.select(
        id_alias,
        vec_alias,
        F.col("_x").isNull().cast("int").alias("_xnull"),
        *[
            (
                F.col("_x").cast("double")
                * (
                    F.pmod(F.xxhash64(F.lit(p), F.col("_d"), F.lit(seed)), F.lit(1000))
                    .cast("double")
                    / 500.0
                    - 1.0
                )
            ).alias(f"_t{p}")
            for p in range(planes)
        ],
    )
    sums = terms.groupBy(id_alias).agg(
        F.first(vec_alias).alias(vec_alias),
        # the HOF fold propagates null: an empty vector or any null
        # element nulls the whole projection -> bit 0. SQL sum() skips
        # nulls instead, so track null presence explicitly.
        F.max("_xnull").alias("_hasnull"),
        *[F.sum(f"_t{p}").alias(f"_s{p}") for p in range(planes)],
    )
    bucket = F.lit(0).cast("bigint")
    for p in range(planes):
        bit = (
            F.when((F.col("_hasnull") == 0) & (F.col(f"_s{p}") >= 0), F.lit(1))
            .otherwise(F.lit(0))
            .cast("bigint")
        )
        bucket = bucket.bitwiseOR(F.shiftleft(bit, p))
    return sums.select(id_alias, vec_alias, bucket.alias(bucket_col))


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    q_id: str = "vec_id",
    q_vec: str = "embedding",
    c_id: str = "vec_id",
    c_vec: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k per query. Queries are broadcast (the small
    side); the corpus streams through once. Output:
    (query_id, match_id, cosine, rank)."""
    q = queries.select(F.col(q_id).alias("query_id"), F.col(q_vec).alias("qv"))
    c = corpus.select(F.col(c_id).alias("match_id"), F.col(c_vec).alias("cv"))
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("match_id"))
        .select(
            "query_id",
            "match_id",
            cosine_sim(F.col("qv"), F.col("cv")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("match_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    planes: int = 10,
    seed: int = 7,
    q_id: str = "vec_id",
    q_vec: str = "embedding",
    c_id: str = "vec_id",
    c_vec: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates share the sign-sketch bucket; a
    window rank cuts k per query. Recall tunes with ``planes`` (fewer
    planes = bigger buckets = higher recall, more compute). The scale
    path: the corpus-side join key is the bucket, so the shuffle is
    bucket-partitioned, never all-pairs."""
    q = sign_sketch_df(queries, q_id, q_vec, planes, seed, "query_id", "qv")
    c = sign_sketch_df(corpus, c_id, c_vec, planes, seed, "match_id", "cv")
    scored = (
        q.join(c, on="bucket")
        .filter(F.col("query_id") != F.col("match_id"))
        .select("query_id", "match_id", cosine_sim(F.col("qv"), F.col("cv")).alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("match_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def pq_codebook(
    corpus: DataFrame,
    m: int = 8,
    ksub: int = 16,
    n_iter: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Product-quantization codebooks: the vector space splits into
    ``m`` subspaces of ``dim/m`` contiguous positions; each subspace
    gets ``ksub`` centroids. Seeds are the first ``ksub`` ids'
    subvectors (deterministic, no sampling — same discipline as
    :func:`kmeans_iterate`); ``n_iter`` Lloyd rounds refine them
    (assignment by squared-L2 with round-9 decimal sums, means in
    decimal), all m subspaces training in ONE DataFrame per round —
    the subspace id is just another grouping key, so adding subspaces
    adds no stages. Returns ``(subspace, code, pos, c_val)``.
    """
    ex = _subvectors(corpus, m, id_col, vec_col)
    cb = ex.filter(F.col("_vid") < ksub).select(
        F.col("subspace"),
        F.col("_vid").alias("code"),
        F.col("pos"),
        F.col("x").alias("c_val"),
    )
    for _ in range(n_iter):
        assigned = _pq_assign(ex, cb).select("_vid", "subspace", "code")
        cb = (
            ex.join(assigned, on=["_vid", "subspace"])
            .groupBy("subspace", "code", "pos")
            .agg(
                (
                    F.sum(F.col("x").cast("decimal(18,9)")).cast("double")
                    / F.count("*")
                ).alias("c_val")
            )
        )
    return cb


def _subvectors(
    corpus: DataFrame, m: int, id_col: str, vec_col: str
) -> DataFrame:
    """(_vid, subspace, pos, x): positional explode of each vector into
    ``m`` contiguous subspace blocks — pure codegen, one pass. The
    subspace width derives from each row's own vector length, so no
    dimension needs declaring (mixed lengths would simply land in
    different (subspace, pos) keys and never cross-compare).

    The slim (id, vec) rows fan out of a single-row-group scan before
    the explode (r14, guide §2.5): the explode and every downstream
    map-side stage (codebook joins, distance terms) otherwise run on
    one task; filters on the id column still push through the
    repartition, so codebook seed slices stay scan-pruned."""
    from eclipse_spark.util import ensure_parallelism

    ex = ensure_parallelism(
        corpus.select(F.col(id_col), F.col(vec_col))
    ).select(
        F.col(id_col).alias("_vid"),
        (F.size(F.col(vec_col)) / m).cast("int").alias("_sub"),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("_d", "x"),
    )
    return ex.select(
        "_vid",
        (F.col("_d") / F.col("_sub")).cast("int").alias("subspace"),
        F.pmod(F.col("_d"), F.col("_sub")).cast("int").alias("pos"),
        "x",
    )


def _pq_assign(ex: DataFrame, cb: DataFrame) -> DataFrame:
    """Nearest-code assignment per (vector, subspace): join the
    exploded subvectors to the broadcast codebook on (subspace, pos),
    partial-agg the round-9 decimal term sums to (vector, subspace,
    code) distances, argmin with ties to the smaller code id. The
    codebook is m*ksub*subdim rows — always broadcastable."""
    terms = ex.join(F.broadcast(cb), on=["subspace", "pos"]).select(
        "_vid",
        "subspace",
        "code",
        F.round((F.col("x") - F.col("c_val")) * (F.col("x") - F.col("c_val")), 9)
        .cast("decimal(18,9)")
        .alias("_t"),
    )
    dists = terms.groupBy("_vid", "subspace", "code").agg(
        F.sum("_t").alias("_dist")
    )
    w = Window.partitionBy("_vid", "subspace").orderBy(
        F.asc("_dist"), F.asc("code")
    )
    return (
        dists.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select(
            "_vid", "subspace", "code", F.col("_dist").cast("double").alias("dist")
        )
    )


def pq_encode(
    corpus: DataFrame,
    codebook: DataFrame | None = None,
    m: int = 8,
    ksub: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ encoding: each vector compresses to ``m`` code ids (one per
    subspace, nearest codebook centroid by squared L2, ties to the
    smaller code). Returns long-format ``(vec_id, subspace, code,
    dist)`` — the layout the ADC scan joins on, and 4 bytes/subspace
    instead of ``subdim`` floats (a 64-dim float vector becomes 8
    codes: 32x smaller, which is the point at 100 TB — the compressed
    corpus fits where the raw one cannot).

    Scale shape: one positional explode, one BROADCAST join against
    the m*ksub*subdim codebook, and one map-side-combined partial agg
    to (vector, subspace, code) — rows entering the shuffle are
    m*ksub per vector regardless of dimension. All distance terms are
    round-9 decimal, so codes are engine-exact and the whole encode
    (not just its row count) is oracle-checkable.
    """
    if codebook is None:
        codebook = pq_codebook(corpus, m=m, ksub=ksub, id_col=id_col, vec_col=vec_col)
    ex = _subvectors(corpus, m, id_col, vec_col)
    return _pq_assign(ex, codebook).select(
        F.col("_vid").alias(id_col), "subspace", "code", "dist"
    )


def pq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    m: int = 8,
    ksub: int = 16,
    q_id: str = "vec_id",
    q_vec: str = "embedding",
    c_id: str = "vec_id",
    c_vec: str = "embedding",
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over the PQ-compressed corpus:
    each query precomputes its distance to every codebook centroid
    (an m*ksub lookup table per query — tiny, broadcast), then a
    candidate's approximate distance is the SUM of m table lookups on
    its codes. The corpus is touched only through its codes — the
    scan reads m smallints per vector, never the raw floats, which is
    how a 100 TB embedding corpus ANN-scans from a ~3 TB compressed
    artifact.

    Every step is deterministic (decimal partial distances, ties to
    smaller code/id), so unlike IVF the *approximate* result is still
    exactly reproducible by an external oracle. Returns (query_id,
    match_id, adc_dist, rank)."""
    cb = pq_codebook(corpus, m=m, ksub=ksub, id_col=c_id, vec_col=c_vec)
    enc = pq_encode(corpus, cb, m=m, id_col=c_id, vec_col=c_vec).select(
        F.col(c_id).alias("match_id"), "subspace", "code"
    )
    return pq_adc_topk(queries, enc, cb, k=k, m=m, q_id=q_id, q_vec=q_vec)


def pq_adc_topk(
    queries: DataFrame,
    enc: DataFrame,
    cb: DataFrame,
    k: int = 10,
    m: int = 8,
    q_id: str = "vec_id",
    q_vec: str = "embedding",
) -> DataFrame:
    """The ADC scan itself, against an ALREADY-ENCODED corpus
    (``enc``: (match_id, subspace, code)) and its codebook — the
    steady-state shape once :func:`pq_index` has persisted both: a
    query batch builds its broadcast distance table and ranks over
    the compressed codes without ever touching (or re-encoding) the
    raw vectors."""
    qex = _subvectors(
        queries.select(F.col(q_id).alias("query_id"), F.col(q_vec)),
        m,
        "query_id",
        q_vec,
    )
    dtab = (
        qex.join(F.broadcast(cb), on=["subspace", "pos"])
        .select(
            F.col("_vid").alias("query_id"),
            "subspace",
            "code",
            F.round(
                (F.col("x") - F.col("c_val")) * (F.col("x") - F.col("c_val")), 9
            )
            .cast("decimal(18,9)")
            .alias("_t"),
        )
        .groupBy("query_id", "subspace", "code")
        .agg(F.sum("_t").alias("_pd"))
    )
    adc = (
        enc.join(F.broadcast(dtab), on=["subspace", "code"])
        .filter(F.col("query_id") != F.col("match_id"))
        .groupBy("query_id", "match_id")
        .agg(F.sum("_pd").cast("double").alias("adc_dist"))
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("adc_dist"), F.asc("match_id"))
    return adc.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def pq_index(
    catalog,
    corpus: DataFrame,
    table: str = "pq_index",
    m: int = 8,
    ksub: int = 16,
    n_iter: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[str, str]:
    """Persist the PQ artifacts once — codebook (m*ksub*subdim rows)
    and code table (m rows of 2 small ints per vector) — as Catalog
    tables, so every later query batch is a :func:`pq_adc_topk` over
    the stored codes: the 100 TB corpus's floats are read exactly once
    at index-build time. Returns the (codes_table, codebook_table)
    names."""
    cb = pq_codebook(
        corpus, m=m, ksub=ksub, n_iter=n_iter, id_col=id_col, vec_col=vec_col
    )
    catalog.put(f"{table}_codebook", cb)
    cb_stored = catalog.get(f"{table}_codebook")
    enc = pq_encode(corpus, cb_stored, m=m, id_col=id_col, vec_col=vec_col)
    catalog.put(f"{table}_codes", enc.select(id_col, "subspace", "code"))
    return f"{table}_codes", f"{table}_codebook"


def kmeans_iterate(
    emb: DataFrame,
    n_cells: int = 8,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Full Lloyd's k-means for ``n_iter`` iterations — the iterative-
    algorithm pattern on DataFrames. Seeds are the first ``n_cells``
    ids (deterministic, no sampling); each iteration is (1) broadcast
    nearest-centroid assignment against the tiny centroid table,
    (2) per-cell elementwise mean via posexplode + one (cell, pos)
    shuffle, (3) centroid-array reassembly with an ordered collect_list
    over n_cells*dim rows (tiny). Centroids are persisted per iteration
    and never leave the cluster; per-iteration cost is two narrow
    stages regardless of corpus size.

    Means accumulate in decimal (engine-exact) and surface as double;
    embeddings are cast to double upfront so every engine computes the
    same cosines. Returns the final (cell, pos, c_val, n_members)."""
    e = emb.select(
        F.col(id_col).alias("vid"), F.col(vec_col).cast("array<double>").alias("v")
    )
    cents = e.filter(F.col("vid") < n_cells).select(
        F.col("vid").alias("cell"), F.col("v").alias("centroid")
    )
    means = None
    for _ in range(n_iter):
        wa = Window.partitionBy("vid").orderBy(F.desc("_sim"), F.asc("cell"))
        assigned = (
            e.crossJoin(F.broadcast(cents))
            .withColumn("_sim", cosine_sim(F.col("v"), F.col("centroid")))
            .withColumn("_rk", F.row_number().over(wa))
            .filter(F.col("_rk") == 1)
            .select("cell", "v")
        )
        ex = assigned.select("cell", F.posexplode("v").alias("pos", "x"))
        means = ex.groupBy("cell", F.col("pos").cast("long").alias("pos")).agg(
            (
                F.sum(F.col("x").cast("decimal(18,9)")).cast("double") / F.count("*")
            ).alias("c_val"),
            F.count("*").alias("n_members"),
        )
        cents = (
            means.groupBy("cell")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "c_val"))),
                    lambda s: s.c_val,
                ).alias("centroid")
            )
            .persist()
        )
    return means


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    seed: int = 7,
    q_id: str = "vec_id",
    q_vec: str = "embedding",
    c_id: str = "vec_id",
    c_vec: str = "embedding",
) -> DataFrame:
    """IVF-style ANN: partition the corpus into ``n_cells`` Voronoi
    cells around deterministically-sampled centroid vectors; queries
    exact-score only their ``n_probe`` nearest cells. Recall/compute
    trades with n_probe/n_cells (n_probe == n_cells degenerates to
    exact search).

    Scale shape: centroids are picked one-per-hash-bucket with a
    row_number over *bucket-partitioned* windows — no global sort, no
    driver collect, no stored model. Cell assignment and probing are
    broadcast nested-loop joins against the (tiny) centroid set; the
    candidate join shuffles on the cell id, never all-pairs."""
    c = corpus.select(F.col(c_id).alias("match_id"), F.col(c_vec).alias("cv"))
    hcell = F.pmod(F.xxhash64("match_id", F.lit(seed)), F.lit(n_cells))
    wc = Window.partitionBy("_hcell").orderBy(F.xxhash64("match_id", F.lit(seed + 1)))
    cents = (
        c.withColumn("_hcell", hcell)
        .withColumn("_rn", F.row_number().over(wc))
        .filter(F.col("_rn") == 1)
        .select(F.col("_hcell").alias("cell"), F.col("cv").alias("centroid"))
        .persist()  # the centroid table is built once and read by both
        # the assignment pass and the probe pass (n_cells rows — tiny)
    )
    wa = Window.partitionBy("match_id").orderBy(F.desc("_sim"), F.asc("cell"))
    assigned = (
        c.crossJoin(F.broadcast(cents))
        .withColumn("_sim", cosine_sim(F.col("cv"), F.col("centroid")))
        .withColumn("_rk", F.row_number().over(wa))
        .filter(F.col("_rk") == 1)
        .select("match_id", "cv", "cell")
    )
    q = queries.select(F.col(q_id).alias("query_id"), F.col(q_vec).alias("qv"))
    wp = Window.partitionBy("query_id").orderBy(F.desc("_sim"), F.asc("cell"))
    probes = (
        q.crossJoin(F.broadcast(cents))
        .withColumn("_sim", cosine_sim(F.col("qv"), F.col("centroid")))
        .withColumn("_rk", F.row_number().over(wp))
        .filter(F.col("_rk") <= n_probe)
        .select("query_id", "qv", "cell")
    )
    scored = (
        probes.join(assigned, on="cell")
        .filter(F.col("query_id") != F.col("match_id"))
        .select("query_id", "match_id", cosine_sim(F.col("qv"), F.col("cv")).alias("cosine"))
    )
    wr = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("match_id"))
    return scored.withColumn("rank", F.row_number().over(wr)).filter(F.col("rank") <= k)


def ivf_assign(vectors: DataFrame, centroids: DataFrame) -> DataFrame:
    """Nearest-centroid Voronoi assignment — the shared kernel of
    :func:`ivf_index` (build) and :func:`ivf_refresh` (incremental
    append): one broadcast nested-loop join of the vectors against the
    (tiny, n_cells-row) centroid table, deterministic argmax (max
    cosine, ties to the smaller cell — the exact tie-break
    :func:`ivf_topk` uses, so stored and in-flight assignment agree
    bit-for-bit). Input ``(match_id, cv)`` x ``(cell, centroid)``;
    output ``(match_id, cv, cell)`` — every vector in exactly one
    cell, the partition-completeness invariant the n_probe = n_cells
    oracle checks."""
    wa = Window.partitionBy("match_id").orderBy(F.desc("_sim"), F.asc("cell"))
    return (
        vectors.crossJoin(F.broadcast(centroids))
        .withColumn("_sim", cosine_sim(F.col("cv"), F.col("centroid")))
        .withColumn("_rk", F.row_number().over(wa))
        .filter(F.col("_rk") == 1)
        .select("match_id", "cv", "cell")
    )


def ivf_index(
    catalog,
    corpus: DataFrame,
    table: str = "ivf_index",
    n_cells: int = 16,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[str, str]:
    """Persist an IVF index ONCE — the search-side analogue of
    `multimodal.dhash_index_ref` (VERDICT r13 task 6): the centroid
    table (n_cells rows, hash-picked exactly as :func:`ivf_topk` does
    — no global sort, no driver collect) and the posting table
    ``(match_id, cv, cell)``, hive-PARTITIONED on ``cell`` so a probe
    pass scans only its n_probe cells' files (partition pruning — at
    100 TB a 4-of-16-cell probe reads a quarter of the corpus, and a
    finer n_cells reads proportionally less). Every later query batch
    is :func:`ivf_topk_stored` over the stored tables, and every later
    ingest batch is :func:`ivf_refresh` — the corpus floats are read
    once at build time and never re-clustered. Returns the
    (postings_table, centroids_table) names. Ref analogue: Eclipse
    persists map output at its DHT home node so reruns skip the map
    phase (``src/file_distributor/fileserver.hh:354-359``)."""
    c = corpus.select(F.col(id_col).alias("match_id"), F.col(vec_col).alias("cv"))
    hcell = F.pmod(F.xxhash64("match_id", F.lit(seed)), F.lit(n_cells))
    wc = Window.partitionBy("_hcell").orderBy(
        F.xxhash64("match_id", F.lit(seed + 1))
    )
    cents = (
        c.withColumn("_hcell", hcell)
        .withColumn("_rn", F.row_number().over(wc))
        .filter(F.col("_rn") == 1)
        .select(
            F.col("_hcell").cast("long").alias("cell"),
            F.col("cv").alias("centroid"),
        )
    )
    catalog.put(f"{table}_centroids", cents)
    stored = catalog.get(f"{table}_centroids")
    catalog.put(
        f"{table}_postings", ivf_assign(c, stored), partition_by=["cell"]
    )
    return f"{table}_postings", f"{table}_centroids"


def ivf_refresh(
    catalog,
    new_vectors: DataFrame,
    table: str = "ivf_index",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """INCREMENTAL IVF index refresh — add a batch of vectors to the
    STORED index WITHOUT re-clustering (VERDICT r13 task 6: the
    search-side analogue of the stored-index media refresh, the run a
    training-data pipeline does daily): read the stored centroids
    (n_cells rows — broadcast), Voronoi-assign ONLY the new batch
    (:func:`ivf_assign`, O(batch x n_cells) work), and APPEND the new
    postings into the partitioned posting table's cell directories.
    The existing postings are never read, never rewritten, never even
    listed beyond the directory append — a 100 TB posting table costs
    a refresh nothing but its own batch. Because assignment against
    the same centroids is deterministic, the refreshed index is
    bit-identical to assigning the MERGED corpus against those stored
    centroids in one monolithic pass (NOT to a fresh
    :func:`ivf_index` over the merged corpus, which hash-picks new
    centroids), so probing all cells afterwards still reproduces
    brute-force top-k exactly (the `ann_ivf_refresh` oracle). Centroids drift as
    the corpus grows — re-run :func:`ivf_index` when
    :func:`ivf_cell_stats` shows cell-size skew degrading probe
    selectivity; that is a scheduled rebuild, not a per-batch cost."""
    cents = catalog.get(f"{table}_centroids")
    v = new_vectors.select(
        F.col(id_col).alias("match_id"), F.col(vec_col).alias("cv")
    )
    return catalog.write_partitioned(
        f"{table}_postings", ivf_assign(v, cents), ["cell"]
    )


def ivf_refresh_stream(
    catalog,
    new_vectors_stream: DataFrame,
    table: str = "ivf_index",
    checkpoint: str | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """STREAMING face of :func:`ivf_refresh` — continuous vector
    ingest into the stored IVF index, completing the batch+stream
    symmetry every other refresh tier already has (`stream_media
    refresh` for fingerprints, the IVM sinks for rollups): each
    micro-batch runs the BATCH refresh verbatim inside
    ``foreachBatch`` — broadcast assignment against the stored
    centroids (static, read per batch, never in state) and the
    O(batch) partitioned append — so a drained finite stream leaves
    the index bit-identical to one monolithic :func:`ivf_refresh` of
    the same rows (the batch-parity test), and the all-cell probe
    over it still reproduces brute force on the merged corpus (the
    `ann_ivf_refresh_stream` oracle). The per-vector argmax window
    is legal here because foreachBatch hands over a plain batch
    DataFrame; nothing is stateful stream-side, so state is ZERO —
    the index directory is the state. Delivery is AT-LEAST-ONCE per
    micro-batch: a replayed batch re-appends its postings (parquet
    append is not idempotent), so production pairs the sink with a
    checkpoint (pass ``checkpoint``) and, if the source can replay
    beyond it, either dedups postings on (match_id) at rebuild time
    or keys replay detection on a batch-id marker the way the IVM
    sink does (`storage.put` markers). Drains synchronously over a
    finite source (processAllAvailable) like the other local stream
    demos; production omits the drain and lets the trigger cadence
    own append sizes."""
    def _append(batch_df: DataFrame, _bid: int) -> None:
        ivf_refresh(
            catalog, batch_df, table=table, id_col=id_col, vec_col=vec_col
        )

    w = new_vectors_stream.writeStream.foreachBatch(_append)
    if checkpoint is not None:
        w = w.option("checkpointLocation", checkpoint)
    q = w.start()
    q.processAllAvailable()
    q.stop()
    return q


def ivf_cell_stats(postings: DataFrame) -> DataFrame:
    """Cell-occupancy audit over a stored IVF posting table — the
    rebuild-scheduling signal :func:`ivf_refresh`'s docstring names:
    centroids drift as batches append, and the observable symptom is
    cell-size skew (a bloated cell degrades probe selectivity toward a
    scan; an empty cell wastes a probe). One map-side-combined count
    per cell plus its share of the corpus — O(n_cells) output, one
    shuffle, nothing collected; schedule a :func:`ivf_index` rebuild
    when ``max_share`` drifts far above 1/n_cells. Emits
    ``(cell, n_vectors, share)``."""
    tot = postings.count()
    return (
        postings.groupBy("cell")
        .agg(F.count("*").cast("long").alias("n_vectors"))
        .withColumn(
            "share",
            F.round(F.col("n_vectors") / F.lit(max(tot, 1)), 6),
        )
    )


def ivf_topk_stored(
    queries: DataFrame,
    postings: DataFrame,
    centroids: DataFrame,
    k: int = 10,
    n_probe: int = 4,
    q_id: str = "vec_id",
    q_vec: str = "embedding",
) -> DataFrame:
    """The probe pass of :func:`ivf_topk` against STORED index tables
    — the steady-state query shape once :func:`ivf_index` /
    :func:`ivf_refresh` maintain the artifacts: queries pick their
    n_probe nearest cells from the broadcast centroid table, the
    posting scan prunes to exactly those cells' partitions (the
    ``cell IN (...)`` equi-join reaches the hive-partitioned parquet
    scan as partition pruning), and the within-cell exact cosine +
    per-query top-k window are :func:`ivf_topk`'s kernel verbatim.
    n_probe = n_cells reproduces brute force exactly (partition
    completeness); smaller n_probe trades recall for scan fraction."""
    q = queries.select(F.col(q_id).alias("query_id"), F.col(q_vec).alias("qv"))
    wp = Window.partitionBy("query_id").orderBy(F.desc("_sim"), F.asc("cell"))
    probes = (
        q.crossJoin(F.broadcast(centroids))
        .withColumn("_sim", cosine_sim(F.col("qv"), F.col("centroid")))
        .withColumn("_rk", F.row_number().over(wp))
        .filter(F.col("_rk") <= n_probe)
        .select("query_id", "qv", "cell")
    )
    scored = (
        probes.join(postings, on="cell")
        .filter(F.col("query_id") != F.col("match_id"))
        .select(
            "query_id",
            "match_id",
            cosine_sim(F.col("qv"), F.col("cv")).alias("cosine"),
        )
    )
    wr = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("match_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= k)
    )


def int8_quantize(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    levels: int = 255,
) -> DataFrame:
    """Per-dimension INT8 (0..``levels``) min-max quantization of an
    embedding corpus — the standard 4x vector-compression stage ahead
    of similarity search (a 100 TB float32 corpus re-scans from a
    ~25 TB int8 artifact; recall loss is the per-dim resolution,
    1/255 of the dim's range). Returns ``(id_col, codes
    array<bigint>, n_dims)`` plus nothing float: the per-dim scale
    table needed for dequantize is re-derivable from the same
    aggregate.

    ENGINE-EXACT BY CONSTRUCTION: float codes via
    ``floor((v - min) * levels / (max - min))`` would flip at IEEE
    boundaries between engines. Instead each value takes the
    float -> double -> decimal(18,9) hop (exact, see
    embedding_centroids) and then scales to an exact BIGINT
    ``i = v9 * 1e9``; per-dim min/max aggregate over the integers, and
    the code is pure integer floor division
    ``(i - imin) * levels div (imax - imin)`` — identical in any
    engine, no float anywhere after the hop. Constant dimensions
    (imax = imin) quantize to 0. The max value lands exactly on code
    ``levels`` (the inclusive top level).

    Scale shape: one positional explode, one (dim)-keyed aggregate
    whose result is dim-count rows (broadcast back), one map-side
    reassembly aggregate keyed on the vector id. Nothing corpus-sized
    is ever broadcast or collected."""
    from eclipse_spark.util import ensure_parallelism

    # fan the slim (id, vec) rows out of the single-row-group scan
    # before the positional explode, and share the exploded view via a
    # LAZY localCheckpoint: it feeds BOTH the per-dim range aggregate
    # and the code projection, and Spark re-executes the explode per
    # reference otherwise (r14, guide §2.5/§2.4). localCheckpoint
    # rather than persist (r15, VERDICT r14 item 4): the operator has
    # no post-action hook to unpersist, so a persist() here leaked one
    # CacheManager entry per invocation for the session lifetime;
    # checkpoint blocks free on RDD GC instead. Same executor-loss
    # caveat as every other lazy checkpoint in this module.
    ex = (
        ensure_parallelism(corpus.select(F.col(id_col), F.col(vec_col)))
        .select(
            F.col(id_col).alias("_vid"),
            F.posexplode(vec_col).alias("pos", "_x"),
        )
        .withColumn(
            "_i",
            F.expr(
                "CAST(CAST(CAST(_x AS DOUBLE) AS DECIMAL(18,9)) "
                "* 1000000000 AS BIGINT)"
            ),
        )
        .localCheckpoint(eager=False)
    )
    rng = ex.groupBy("pos").agg(
        F.min("_i").alias("_lo"), F.max("_i").alias("_hi")
    )
    # the scaled numerator accumulates in DECIMAL(38,0): (_i - _lo) can
    # reach ~2e18 and * levels would overflow int64 for |value| beyond
    # ~3.6e7 (wraparound with ANSI off, error with ANSI on); the decimal
    # product is exact at any representable magnitude and `div` on a
    # non-negative decimal numerator floors identically in any engine
    coded = ex.join(F.broadcast(rng), "pos").withColumn(
        "code",
        F.when(F.col("_hi") == F.col("_lo"), F.lit(0).cast("long")).otherwise(
            F.expr(
                f"(CAST(_i AS DECIMAL(38,0)) - _lo) * {int(levels)} "
                "div (_hi - _lo)"
            )
        ),
    )
    return (
        coded.groupBy("_vid")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "code"))),
                lambda s: s["code"],
            ).alias("codes"),
            F.count("*").cast("long").alias("n_dims"),
        )
        .select(F.col("_vid").alias(id_col), "codes", "n_dims")
    )


def int8_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    q_id: str = "vec_id",
    c_id: str = "vec_id",
    vec_col: str = "embedding",
    levels: int = 255,
) -> DataFrame:
    """Top-k cosine search over an int8-compressed view of the corpus:
    SYMMETRIC global-scale quantization ``code = floor((i + S) * 127 /
    S) - 127`` in [-127, 127] with S = max|value| over the corpus —
    codes stay LINEAR in the values (one global scale, no per-dim
    affine shifts), so cosine over codes tracks cosine over floats up
    to the 1/127 resolution. (The per-dim min-max scheme of
    :func:`int8_quantize` is the better STORAGE quantizer — tighter
    per-dim resolution for dequantize — but its per-dim offsets
    destroy dot-product structure, so search uses the symmetric
    scheme; measured: min-max codes gave 6% recall@10 vs the float
    baseline, symmetric gives the quantizer-resolution-limited
    recall.) Ranking key = dot / sqrt(candidate code norm) — the
    query norm is constant per query — computed as ONE IEEE
    division+sqrt on exact BIGINTs (codes and their products are pure
    integer arithmetic on non-negative-shifted operands, floor-div
    identical in any engine), ties to the smaller match id: the
    approximate result is itself deterministic and fully
    oracle-checkable, like pq_topk's ADC tier one notch simpler and
    4x-compressed instead of 32x. All-zero code vectors are dropped
    (no direction to rank). Returns (query_id, match_id, rank, dot).

    Scale shape: corpus codes live in long format (id, pos, code) —
    the compressed scan; query codes broadcast; one (pos)-keyed
    broadcast join, one map-side-combined (query, candidate) sum, one
    per-query top-k window."""
    _ = levels  # fixed 127-level symmetric grid (see docstring)
    hop = (
        "CAST(CAST(CAST(_x AS DOUBLE) AS DECIMAL(18,9)) "
        "* 1000000000 AS BIGINT)"
    )
    from eclipse_spark.util import ensure_parallelism

    # fan the slim corpus out of the single-row-group scan and share
    # the exploded/coded views via LAZY localCheckpoints: the
    # explode+decimal hop otherwise re-executes once per reference
    # (scale, norms, dots = 3x) on one task (r14, guide §2.5/§2.4).
    # localCheckpoint, not persist (r15, VERDICT r14 item 4): persist()
    # with no unpersist leaked one CacheManager entry per view per
    # invocation; checkpoint blocks free on RDD GC.
    ex_c = (
        ensure_parallelism(corpus.select(F.col(c_id), F.col(vec_col)))
        .select(
            F.col(c_id).alias("_cid"), F.posexplode(vec_col).alias("pos", "_x")
        )
        .withColumn("_i", F.expr(hop))
        .localCheckpoint(eager=False)
    )
    scale = ex_c.agg(F.max(F.abs("_i")).alias("_s"))

    def _code(col: str) -> Column:
        # non-negative-shifted floor division (Spark div truncates
        # toward zero on negatives; DuckDB // floors — shifting by S
        # keeps the operand non-negative so both agree), then clamp
        # for query values outside the corpus range; the shifted
        # product runs in DECIMAL(38,0) so (|i| + S) * 127 cannot
        # overflow int64 at large value magnitudes (it would beyond
        # |value| ~ 7e7) — exact at any representable magnitude
        raw = F.expr(
            f"(CAST({col} AS DECIMAL(38,0)) + _s) * 127 div _s - 127"
        )
        return F.when(F.col("_s") == 0, F.lit(0).cast("long")).otherwise(
            F.greatest(
                F.lit(-127).cast("long"),
                F.least(F.lit(127).cast("long"), raw),
            )
        )

    coded_c = (
        ex_c.crossJoin(F.broadcast(scale))
        .withColumn("_cc", _code("_i"))
        .localCheckpoint(eager=False)
    )
    norms = coded_c.groupBy("_cid").agg(
        F.sum(F.col("_cc") * F.col("_cc")).alias("_nc")
    )
    ex_q = queries.select(
        F.col(q_id).alias("_qid"), F.posexplode(vec_col).alias("pos", "_x")
    ).withColumn("_i", F.expr(hop))
    coded_q = ex_q.crossJoin(F.broadcast(scale)).withColumn("_qc", _code("_i"))
    dots = (
        coded_c.join(
            F.broadcast(coded_q.select("_qid", "pos", "_qc")), "pos"
        )
        .groupBy("_qid", "_cid")
        .agg(F.sum(F.col("_qc") * F.col("_cc")).alias("dot"))
        .join(norms, "_cid")
        .filter(F.col("_nc") > 0)
        .withColumn(
            "_score",
            F.col("dot").cast("double") / F.sqrt(F.col("_nc").cast("double")),
        )
    )
    w = Window.partitionBy("_qid").orderBy(
        F.col("_score").desc(), F.col("_cid")
    )
    return (
        dots.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("_qid").alias("query_id"),
            F.col("_cid").alias("match_id"),
            F.col("rank").cast("long").alias("rank"),
            F.col("dot").cast("long").alias("dot"),
        )
    )


def random_projection(
    df: DataFrame,
    out_dim: int = 16,
    seed: int = 11,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Johnson-Lindenstrauss random projection to ``out_dim``
    dimensions — the cheap-dimensionality-reduction step ahead of
    clustering / ANN when raw embeddings are too wide. The projection
    matrix is never stored: weight(j, d) is a deterministic
    pseudo-random value in [-1, 1) derived from
    ``xxhash64(j, d, seed)`` (the same model-free discipline as
    :func:`sign_sketch_df`, whose codegen explode shape this reuses —
    the HOF formulation was measured ~10x slower there).

    Scale shape: one positional explode, ``out_dim`` weighted terms
    in a flat codegen projection, one map-side-combined aggregate of
    per-id sums — shuffle rows are (id, out_dim doubles). Terms are
    round-9 decimal so every projected value is partition-order- and
    engine-exact. Returns long-format (id, proj_pos, value)."""
    ex = df.select(
        F.col(id_col).alias("_vid"),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("_d", "_x"),
    )
    terms = ex.select(
        "_vid",
        *[
            F.round(
                F.col("_x")
                * (
                    F.pmod(
                        F.xxhash64(F.lit(j), F.col("_d"), F.lit(seed)), F.lit(1000)
                    ).cast("double")
                    / 500.0
                    - 1.0
                ),
                9,
            )
            .cast("decimal(18,9)")
            .alias(f"_t{j}")
            for j in range(out_dim)
        ],
    )
    sums = terms.groupBy("_vid").agg(
        *[F.sum(f"_t{j}").cast("double").alias(f"_s{j}") for j in range(out_dim)]
    )
    entries = F.array(
        *[
            F.struct(
                F.lit(j).cast("int").alias("proj_pos"), F.col(f"_s{j}").alias("value")
            )
            for j in range(out_dim)
        ]
    )
    return sums.select(
        F.col("_vid").alias(id_col), F.explode(entries).alias("_e")
    ).select(id_col, "_e.proj_pos", "_e.value")


def _apss_candidate_pairs(docs, id_col, tokens_col, threshold_sq_pct, bound=None):
    """Shared candidate construction for the APSS tier: returns the
    lazily-persisted distinct (doc, token) table and the prefix-filter
    candidate pair set (id_a < id_b, n_a, n_b). Factored out so the
    scaling probe can COUNT candidates (work, not just wall-time)
    through the identical plan the verify stage consumes.

    ``bound`` adds the PPJoin POSITIONAL filter (r14 optimization):
    for a prefix match at ranks (p_a, p_b) the overlap is bounded by
    ``min(p_a-1, p_b-1) + 1 + min(n_a-p_a, n_b-p_b)`` — shared tokens
    strictly before the match have rank < p in BOTH docs (the rank is
    the same global (df, tok) order restricted to each doc), shared
    tokens after it rank > p in both, plus the match itself. Every
    match of a truly qualifying pair has bound >= its true overlap c,
    and both qualifying tests are monotone in c, so dropping matches
    whose OWN bound already fails the test at c = bound cannot drop a
    qualifying pair — recall is preserved exactly; the exact verify
    keeps precision exact as before. ``bound="jaccard"`` applies
    ``100*ub >= pct*(n_a+n_b-ub)`` (threshold_sq_pct = t*100),
    ``bound="cosine"`` applies ``100*ub^2 >= pct*n_a*n_b``
    (threshold_sq_pct = t^2*100). ``None`` keeps the pure
    prefix-filter set (the scale probe's work counter — an upper
    bound on what the verify tier consumes)."""
    # the exploded token table feeds four consumers (sizes, document
    # frequencies, the ranked prefix, and the verify arrays); persist()
    # LAZILY so the tokenize+explode runs once — plan-level reuse via
    # InMemoryRelation, lineage kept (lost executors recompute), and no
    # job runs until the caller acts (same discipline as dedup.py)
    toks = docs.select(
        F.col(id_col).alias("_id"), F.explode(F.array_distinct(F.col(tokens_col))).alias("tok")
    ).distinct().persist()
    dfreq = toks.groupBy("tok").agg(F.count("*").alias("df"))
    # global rarity order; rank + doc size in ONE (_id)-keyed window
    # pass (r14: n = count over the same partition — value-equal to
    # the former groupBy+join because ranked is row-for-row toks —
    # one exchange instead of an aggregate plus a join)
    ranked = (
        toks.join(dfreq, "tok")
        .withColumn(
            "pos",
            F.row_number().over(
                Window.partitionBy("_id").orderBy(F.asc("df"), F.asc("tok"))
            ),
        )
        .withColumn("n", F.count("*").over(Window.partitionBy("_id")))
    )
    # prefix length: n - ceil(pct*n/100) + 1, all-integer.
    # localCheckpoint LAZILY (r14, same finding as minhash_estimate):
    # Spark performs no common-subexpression elimination across the
    # self-join, so without it the dfreq aggregate + join + window
    # pipeline executes once PER SIDE (and once more per verify-array
    # side); the first action materializes the slim (id, tok, n, pos)
    # table once and all consumers scan it.
    prefix = ranked.filter(
        F.col("pos")
        <= F.col("n") - F.ceil(F.col("n") * F.lit(threshold_sq_pct) / F.lit(100)) + 1
    ).select("_id", "tok", "n", "pos").localCheckpoint(eager=False)
    a = prefix.select(
        F.col("_id").alias("id_a"), "tok", F.col("n").alias("n_a"), F.col("pos").alias("p_a")
    )
    b = prefix.select(
        F.col("_id").alias("id_b"), "tok", F.col("n").alias("n_b"), F.col("pos").alias("p_b")
    )
    matched = a.join(b, "tok").filter(F.col("id_a") < F.col("id_b"))
    if bound is not None:
        # per-match overlap upper bound (docstring proof); filtering
        # BEFORE the distinct prunes the candidate shuffle and the
        # verify join without touching recall
        ub = (
            F.least(F.col("p_a") - 1, F.col("p_b") - 1)
            + F.lit(1)
            + F.least(F.col("n_a") - F.col("p_a"), F.col("n_b") - F.col("p_b"))
        )
        if bound == "jaccard":
            keep = F.lit(100) * ub >= F.lit(threshold_sq_pct) * (
                F.col("n_a") + F.col("n_b") - ub
            )
        elif bound == "cosine":
            keep = F.lit(100) * ub * ub >= F.lit(threshold_sq_pct) * F.col(
                "n_a"
            ) * F.col("n_b")
        else:
            raise ValueError(f"unknown positional bound {bound!r}")
        matched = matched.filter(keep)
    cand = matched.select("id_a", "id_b", "n_a", "n_b").distinct()
    return toks, cand


def allpairs_cosine_candidates(
    docs: DataFrame,
    id_col: str,
    tokens_col: str,
    threshold_sq_pct: int = 81,
) -> DataFrame:
    """The APSS prefix-filter CANDIDATE set, before the exact verify —
    the work-audit tier: the scaling probe counts these per scale so a
    flat wall-time ratio provably means "the plan scales" rather than
    "the synthetic corpus degenerated" (VERDICT r7 task 2). Identical
    construction to :func:`allpairs_cosine` (shared helper)."""
    _, cand = _apss_candidate_pairs(docs, id_col, tokens_col, threshold_sq_pct)
    return cand


def allpairs_cosine(
    docs: DataFrame,
    id_col: str,
    tokens_col: str,
    threshold_sq_pct: int = 81,
) -> DataFrame:
    """All-pairs set-cosine similarity self-join with PREFIX FILTERING
    (Bayardo/Chaudhuri APSS) — "find every pair of documents whose
    binary token-set cosine >= t" without the quadratic all-pairs scan.

    ``threshold_sq_pct`` is ``t^2 * 100`` as an INTEGER (81 -> t=0.9),
    so the qualifying test ``100*c^2 >= pct*n*m`` (c = |A∩B|,
    n = |A|, m = |B|) is pure integer arithmetic — engine-exact, no
    float threshold boundary.

    Pruning logic: order tokens by ascending global document frequency
    (rarest first; ties by token). For cosine >= t, any qualifying
    pair must share a token inside BOTH docs' prefixes of length
    ``n - ceil(t^2 * n) + 1``: if all common tokens sat past A's
    prefix, c <= ceil(t^2*n)-1 < t^2*n, while sim >= t forces
    m >= t^2*n and hence c >= t*sqrt(nm) >= t^2*n — contradiction.
    So joining prefix tokens against prefix tokens has guaranteed
    recall, and the exact verify (array_intersect on the full sorted
    token arrays) makes precision exact too.

    Scale shape: one df aggregate, one rank-ordered prefix slice, one
    equi-join on (rare) prefix tokens — candidate volume tracks how
    many pairs share a RARE token, not corpus^2 — then a verify join
    that moves token arrays only for candidate ids. On a pathological
    corpus where every doc shares rare tokens the candidate set
    degrades toward all-pairs (data property, not plan property);
    the MinHash/SimHash tier (operators/dedup.py) is the probabilistic
    fallback there. Output: id_a < id_b, overlap, n_a, n_b,
    cos_sim (round-9)."""
    toks, cand = _apss_candidate_pairs(
        docs, id_col, tokens_col, threshold_sq_pct, bound="cosine"
    )
    # exact verify: full sorted token arrays only for candidate ids;
    # checkpointed lazily so the collect_list aggregate runs once, not
    # once per join side (r14 — no cross-subtree CSE)
    arrays = (
        toks.groupBy("_id")
        .agg(F.sort_array(F.collect_list("tok")).alias("arr"))
        .localCheckpoint(eager=False)
    )
    verified = (
        cand.join(arrays.select(F.col("_id").alias("id_a"), F.col("arr").alias("arr_a")), "id_a")
        .join(arrays.select(F.col("_id").alias("id_b"), F.col("arr").alias("arr_b")), "id_b")
        .withColumn("overlap", F.size(F.array_intersect("arr_a", "arr_b")))
        .filter(
            F.lit(100) * F.col("overlap") * F.col("overlap")
            >= F.lit(threshold_sq_pct) * F.col("n_a") * F.col("n_b")
        )
    )
    return verified.select(
        "id_a",
        "id_b",
        F.col("overlap").cast("long").alias("overlap"),
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.round(
            F.col("overlap") / F.sqrt(F.col("n_a").cast("double") * F.col("n_b")), 9
        ).alias("cos_sim"),
    )


def label_separability(
    df: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Embedding-space class-separability audit: per label, the mean
    member distance to its own centroid (intra) vs the distance to the
    NEAREST other centroid (inter), and their ratio — the go/no-go
    check on an embedding table before trusting it for clustering /
    dedup / retrieval ("are the classes actually separated, or is the
    space mush?"). ratio > 1 means the nearest foreign centroid sits
    beyond the class's own spread.

    Exactness discipline: centroid means use the float -> double ->
    decimal(18,9) hop (see the centroids query — the direct
    float->decimal cast rounds differently across engines); every
    squared term is round-9 decimal-accumulated so per-vector and
    per-pair distances are partition-order- and engine-exact; the two
    final divisions are single fixed-order float ops.

    Scale shape: one (label, pos) centroid aggregate; members join
    their OWN label's centroid on (label, pos) — at L labels and D
    dims the centroid table is L*D rows, broadcast; the pairwise
    centroid matrix is L^2 rows (labels are few — this is a
    class-level audit, not ANN). No driver collect, no UDF."""
    ex = df.select(
        F.col(id_col).alias("_vid"),
        F.col(label_col).alias("_l"),
        F.posexplode(F.col(vec_col)).alias("_p", "_x"),
    )
    cent = ex.groupBy("_l", "_p").agg(
        (
            F.sum(F.col("_x").cast("double").cast("decimal(18,9)")).cast("double")
            / F.count("*")
        ).alias("_c")
    )
    # pairwise centroid distances, both directions for the per-label min
    ca = cent.select(F.col("_l").alias("la"), "_p", F.col("_c").alias("cva"))
    cb = cent.select(F.col("_l").alias("lb"), "_p", F.col("_c").alias("cvb"))
    pair = (
        ca.join(cb, "_p")
        .filter(F.col("la") != F.col("lb"))
        .withColumn(
            "_t",
            F.round((F.col("cva") - F.col("cvb")) * (F.col("cva") - F.col("cvb")), 9)
            .cast("decimal(28,9)"),
        )
        .groupBy("la", "lb")
        .agg(F.round(F.sqrt(F.sum("_t").cast("double")), 9).alias("dist"))
    )
    wnear = Window.partitionBy("la").orderBy(F.asc("dist"), F.asc("lb"))
    nearest = (
        pair.withColumn("_rn", F.row_number().over(wnear))
        .filter(F.col("_rn") == 1)
        .select(
            F.col("la").alias("_l"),
            F.col("lb").alias("nearest_label"),
            F.col("dist").alias("inter_dist"),
        )
    )
    member = (
        ex.join(F.broadcast(cent), ["_l", "_p"])
        .withColumn(
            "_t",
            F.round(
                (F.col("_x").cast("double") - F.col("_c"))
                * (F.col("_x").cast("double") - F.col("_c")),
                9,
            ).cast("decimal(28,9)"),
        )
        .groupBy("_vid", "_l")
        .agg(F.round(F.sqrt(F.sum("_t").cast("double")), 9).alias("_d"))
    )
    intra = member.groupBy("_l").agg(
        F.count("*").cast("long").alias("n_vecs"),
        (
            F.sum(F.col("_d").cast("decimal(28,9)")).cast("double") / F.count("*")
        ).alias("intra_mean"),
    )
    return intra.join(nearest, "_l").select(
        F.col("_l").alias(label_col),
        "n_vecs",
        F.round(F.col("intra_mean"), 9).alias("intra_mean"),
        "nearest_label",
        "inter_dist",
        F.when(
            F.col("intra_mean") > 0,
            F.round(F.col("inter_dist") / F.col("intra_mean"), 9),
        ).alias("separation"),
    )


def lsh_topk_multiprobe(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    planes: int = 10,
    seed: int = 7,
    q_id: str = "vec_id",
    q_vec: str = "embedding",
    c_id: str = "vec_id",
    c_vec: str = "embedding",
) -> DataFrame:
    """Multi-probe LSH top-k: besides its own sign-sketch bucket, each
    QUERY probes every Hamming-1 neighbor bucket (flip one of
    ``planes`` bits) — the standard recall upgrade that costs
    ``planes`` extra lookups per query instead of halving ``planes``
    (which would double every bucket's size corpus-wide). The probe
    explode happens on the small query side only; the corpus is
    sketched once and joined on the bucket key exactly as the
    single-probe tier. Candidates dedupe on (query, match) before the
    cosine rank. Deterministic end-to-end (the sketch is the portable
    codegen one), so the full SQL oracle replays it."""
    q = sign_sketch_df(queries, q_id, q_vec, planes, seed, "query_id", "qv")
    probes = q.select(
        "query_id",
        "qv",
        F.explode(
            F.array(
                F.col("bucket"),
                *[F.col("bucket").bitwiseXOR(F.lit(1 << p)) for p in range(planes)],
            )
        ).alias("bucket"),
    )
    c = sign_sketch_df(corpus, c_id, c_vec, planes, seed, "match_id", "cv")
    cand = (
        probes.join(c, on="bucket")
        .filter(F.col("query_id") != F.col("match_id"))
        .dropDuplicates(["query_id", "match_id"])
    )
    scored = cand.select(
        "query_id", "match_id", cosine_sim(F.col("qv"), F.col("cv")).alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("match_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def allpairs_jaccard(
    docs: DataFrame,
    id_col: str,
    tokens_col: str,
    threshold_pct: int = 80,
) -> DataFrame:
    """All-pairs set-JACCARD similarity self-join with prefix filtering
    (PPJoin-family pruning; Xiao/Wang/Lin/Yu) — the EXACT tier behind
    the MinHash estimate: every pair with ``J = |A∩B| / |A∪B| >=
    threshold_pct/100``, no quadratic scan, no probabilistic miss.

    ``threshold_pct`` is ``t * 100`` as an INTEGER, so the qualifying
    test ``100 * c >= pct * (n + m - c)`` is pure integer arithmetic —
    engine-exact, no float threshold boundary.

    Pruning logic (same df-ordered prefix machinery as
    :func:`allpairs_cosine`, different bound): with tokens ranked by
    ascending document frequency, a qualifying pair must share a token
    inside BOTH prefixes of length ``n - ceil(t*n) + 1``. Proof: if
    every common token sat past A's prefix, c <= ceil(t*n) - 1 < t*n;
    but J >= t gives c(1+t) >= t(n+m) and m >= c, so
    c >= t(n+m)/(1+t) >= t(n + t*n)/(1+t) = t*n — contradiction.
    (Cosine passes t²·100 to the shared helper because its bound
    involves c² ; Jaccard's is linear in c, hence t·100.)

    Scale shape identical to the cosine tier: candidate volume tracks
    rare-token co-occurrence, verify moves token arrays only for
    candidate ids. Output: id_a < id_b, overlap, n_a, n_b,
    jaccard (round-9 of the exact integer ratio).
    """
    toks, cand = _apss_candidate_pairs(
        docs, id_col, tokens_col, threshold_pct, bound="jaccard"
    )
    # lazily-checkpointed verify arrays: one collect_list aggregate
    # shared by both join sides (r14 — no cross-subtree CSE)
    arrays = (
        toks.groupBy("_id")
        .agg(F.sort_array(F.collect_list("tok")).alias("arr"))
        .localCheckpoint(eager=False)
    )
    verified = (
        cand.join(
            arrays.select(F.col("_id").alias("id_a"), F.col("arr").alias("arr_a")),
            "id_a",
        )
        .join(
            arrays.select(F.col("_id").alias("id_b"), F.col("arr").alias("arr_b")),
            "id_b",
        )
        .withColumn("overlap", F.size(F.array_intersect("arr_a", "arr_b")))
        .filter(
            F.lit(100) * F.col("overlap")
            >= F.lit(threshold_pct)
            * (F.col("n_a") + F.col("n_b") - F.col("overlap"))
        )
    )
    return verified.select(
        "id_a",
        "id_b",
        F.col("overlap").cast("long").alias("overlap"),
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.round(
            F.col("overlap")
            / (F.col("n_a") + F.col("n_b") - F.col("overlap")).cast("double"),
            9,
        ).alias("jaccard"),
    )
