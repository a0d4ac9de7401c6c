"""Similarity search over an embedding column (array<float>).

The read-path analog of the reference's filtered vector search
(raptor/qdrant_search_docker/api_document_search_with_cache.py:157-237) and
batch similarity query (api_insert.py:130-143), embedding-free on the engine
side: vectors are just data.

* cosine_col        — exact cosine via zip_with + aggregate (JVM-side)
* brute_force_topk  — baseline exact k-NN: broadcast the query set, score
                      every row, window top-k. Correct at any scale where the
                      QUERY side is small (the common case).
* lsh_bucket_col / ann_topk — random-hyperplane LSH bucketing as the scale
  path: candidates share a bucket (multi-probe via several independent
  bucket families), exact re-scoring inside buckets.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dot_col(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_col(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v)
    )


def cosine_col(a: Column, b: Column) -> Column:
    return dot_col(a, b) / (norm_col(a) * norm_col(b))


def _pseudo_plane(i: int, dim: int) -> list[float]:
    """Deterministic pseudo-random hyperplane: unit-ish vector whose
    components are derived from a hash of (i, j) — content-derived, no RNG
    state, identical on every executor."""
    import hashlib

    vals = []
    for j in range(dim):
        h = int.from_bytes(
            hashlib.sha256(f"plane:{i}:{j}".encode()).digest()[:8], "big"
        )
        vals.append((h / 2**63) - 1.0)
    n = math.sqrt(sum(v * v for v in vals)) or 1.0
    return [v / n for v in vals]


def lsh_bucket_col(vec: Column, n_planes: int = 8, dim: int = 64, family: int = 0) -> Column:
    """Bucket id = sign-bit string of projections onto n_planes fixed planes."""
    bits = []
    for i in range(n_planes):
        plane = F.array(*[F.lit(v) for v in _pseudo_plane(i + 1000 * family, dim)])
        bits.append(F.when(dot_col(vec, plane) >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def _partition_topk(scored: DataFrame, k: int) -> DataFrame:
    """Map-side partial top-k: keep the best k rows per qid WITHIN each input
    partition (Arrow-batched, narrow — no shuffle), so the global top-k
    window downstream shuffles ≤ k·|queries|·P rows instead of the full
    |corpus|·|queries| scored set. Exact: a row outside its partition's
    per-qid top-k cannot be in the global top-k (same (cosine desc, id asc)
    order on both sides; the cosine values themselves were computed JVM-side
    and cross Arrow as unchanged float64). Rows whose cosine is null/NaN
    (degenerate zero-norm vectors) are never pruned — Spark orders NaN
    greatest but NULL last under desc, and pandas cannot tell them apart, so
    keeping all of them is the only order-preserving choice; they are
    assumed rare."""
    import pandas as pd

    schema = scored.schema

    def gen(batches):
        carry: pd.DataFrame | None = None
        for pdf in batches:
            cur = pdf if carry is None else pd.concat([carry, pdf], ignore_index=True)
            bad = cur["cosine"].isna()
            top = (
                cur[~bad]
                .sort_values(["qid", "cosine", "id"], ascending=[True, False, True])
                .groupby("qid", sort=False)
                .head(k)
            )
            carry = pd.concat([cur[bad], top], ignore_index=True)
        if carry is not None:
            yield carry

    return scored.mapInPandas(gen, schema=schema)


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    corpus_id: str = "id",
    query_id: str = "qid",
    vec: str = "vec",
    local_prune: bool = True,
) -> DataFrame:
    """(qid, id, cosine, rank) exact top-k per query. The query side is
    broadcast and the corpus is scanned once; scoring is map-side JVM
    (zip_with/aggregate). The global top-k window would otherwise shuffle
    every scored row — |corpus|·|queries| narrow rows — so by default a
    per-partition partial top-k (``_partition_topk``, Arrow-batched, no
    shuffle) first cuts the window's input to ≤ k·|queries| rows per
    partition; the window then only ranks ≤ k·|queries|·P survivors.
    ``local_prune=False`` keeps the single-window plan (parity-gated in
    tests/test_dedup_similarity.py)."""
    q = F.broadcast(queries.select(F.col(query_id).alias("qid"), F.col(vec).alias("qvec")))
    scored = corpus.select(F.col(corpus_id).alias("id"), F.col(vec).alias("cvec")).join(q)
    scored = scored.select(
        "qid", "id", cosine_col(F.col("cvec"), F.col("qvec")).alias("cosine")
    )
    if local_prune:
        scored = _partition_topk(scored, k)
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def hard_negatives(
    corpus: DataFrame,
    queries: DataFrame,
    k_skip: int = 5,
    k_take: int = 10,
    corpus_id: str = "id",
    query_id: str = "qid",
    vec: str = "vec",
) -> DataFrame:
    """Contrastive hard-negative mining: for each query vector, the corpus
    rows ranked (k_skip, k_skip+k_take] by exact cosine — just below the
    presumed positives (rank ≤ k_skip, which includes the query itself when
    it is in the corpus), far above random draws. This band is the standard
    negative pool for training retrieval/embedding models (the training-data
    twin of the reference's similarity read path, api_insert.py:130-143).

    Same scale shape as brute_force_topk: queries broadcast, corpus scanned
    once, only (k_skip+k_take)·|queries| rows survive past the window."""
    return brute_force_topk(
        corpus, queries, k_skip + k_take, corpus_id, query_id, vec
    ).filter(F.col("rank") > k_skip)


def _scored_cells(vec: Column, centroids: list[tuple[int, list[float]]]) -> Column:
    """array<struct<d, cid>> of dot(vec, centroid) per centroid, sorted so
    element 0 is the best cell (ties → larger cid). The centroid table is
    ONE literal array-of-structs and the dot product appears ONCE inside a
    transform lambda — building a separate zip_with/aggregate tree per
    centroid made Catalyst analysis + codegen the dominant cost of every
    Lloyd iteration (measured ~6 s/iteration at n_cells=8, dim=64; ~10×
    the actual 2000-row scan)."""
    cmat = F.array(
        *[
            F.struct(
                F.lit(cid).alias("cid"),
                F.array(*[F.lit(float(x)) for x in cv]).alias("c"),
            )
            for cid, cv in centroids
        ]
    )
    scored = F.transform(
        cmat, lambda s: F.struct(dot_col(vec, s.c).alias("d"), s.cid.alias("cid"))
    )
    return F.reverse(F.array_sort(scored))


def _nearest_cells(vec: Column, centroids: list[tuple[int, list[float]]], n: int) -> Column:
    """array<int> of the n centroid ids with highest dot(vec, centroid).
    Centroids are pre-normalized, so dot-argmax ≡ cosine-argmax; the whole
    expression is JVM-side over a broadcast-literal centroid table."""
    return F.slice(_scored_cells(vec, centroids), 1, n).cid


def ivf_centroids(
    corpus: DataFrame,
    n_cells: int,
    corpus_id: str = "id",
    vec: str = "vec",
    kmeans_iters: int = 1,
    seed_order: str = "hash",
) -> list[tuple[int, list[float]]]:
    """Deterministic IVF codebook: seed with the n_cells corpus vectors of
    smallest xxhash64(id) (content-derived, partition-order-free), then run
    ``kmeans_iters`` distributed Lloyd steps (assign → per-cell element-wise
    mean via posexplode/groupBy — never collects a cell to one machine).
    Returns normalized centroids; only n_cells × dim floats ever reach the
    driver.

    ``seed_order="id"`` seeds with the n_cells lowest ids instead of the
    hash order — same algorithm, but replicable by engines without Spark's
    xxhash64 (the SQL-oracle path for cluster-assignment verification)."""
    ordering = (
        [F.col("id")]
        if seed_order == "id"
        else [F.xxhash64(F.col("id").cast("string")), F.col("id")]
    )
    seeds = (
        corpus.select(F.col(corpus_id).alias("id"), F.col(vec).alias("v"))
        .orderBy(*ordering)
        .limit(n_cells)
        .collect()
    )

    def _norm(v: list[float]) -> list[float]:
        n = math.sqrt(sum(x * x for x in v)) or 1.0
        return [x / n for x in v]

    cents = [(i, _norm(list(r.v))) for i, r in enumerate(seeds)]
    for _ in range(kmeans_iters):
        assigned = corpus.select(
            F.col(vec).alias("v"),
            _nearest_cells(F.col(vec), cents, 1)[0].alias("cell"),
        )
        means = (
            assigned.select("cell", F.posexplode("v").alias("pos", "x"))
            .groupBy("cell", "pos")
            .agg(F.avg("x").alias("m"))
            .groupBy("cell")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s.m,
                ).alias("mv")
            )
            .collect()
        )
        # cells that captured no vectors keep their previous centroid
        new = dict((r.cell, _norm(list(r.mv))) for r in means)
        cents = [(cid, new.get(cid, cv)) for cid, cv in cents]
    return cents


def kmeans_clusters(
    corpus: DataFrame,
    n_cells: int,
    corpus_id: str = "id",
    vec: str = "vec",
    iters: int = 1,
    seed_order: str = "hash",
    keep_vec: bool = False,
) -> DataFrame:
    """(id, cell, cosine[, v]) — deterministic Lloyd's k-means assignment
    over an embedding column (the SemDeDup-style semantic-clustering
    primitive; the IVF codebook's standalone face). Scale shape: the
    codebook is n_cells × dim broadcast literals; assignment is one
    map-only pass, so the whole operator is ``iters + 1`` corpus scans, a
    per-(cell, pos) mean shuffle per iteration, and zero data shuffled at
    assignment time. ``keep_vec`` carries the vector through the map-only
    assignment so downstream within-cell work needs no join back to the
    corpus (assignment is a projection — joining it back on id would pay a
    full shuffle of both sides for nothing).

    Ties in the argmax resolve to the LARGER cell id (array_sort + reverse),
    which SQL oracles mirror as ORDER BY dot DESC, cell DESC."""
    cents = ivf_centroids(
        corpus, n_cells, corpus_id, vec, kmeans_iters=iters, seed_order=seed_order
    )
    v = F.col(vec)
    best = _scored_cells(v, cents)[0]
    return corpus.select(
        F.col(corpus_id).alias("id"),
        best["cid"].alias("cell"),
        # centroids are unit vectors, so cosine = dot / |v|
        (best["d"] / norm_col(v)).alias("cosine"),
        *([v.alias("v")] if keep_vec else []),
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    corpus_id: str = "id",
    query_id: str = "qid",
    vec: str = "vec",
    n_cells: int = 16,
    n_probe: int = 4,
    kmeans_iters: int = 1,
) -> DataFrame:
    """IVF approximate top-k: partition the corpus into n_cells Voronoi cells
    around a learned codebook; each query exactly re-scores only the rows of
    its n_probe nearest cells. At scale the cell id is a write-time partition
    column, so a probe is a partition-pruned scan touching n_probe/n_cells
    of the data — the inverted-file pattern (≙ the reference's per-collection
    Qdrant search, api_insert.py:100-106)."""
    cents = ivf_centroids(corpus, n_cells, corpus_id, vec, kmeans_iters)
    cells = corpus.select(
        F.col(corpus_id).alias("id"),
        F.col(vec).alias("cvec"),
        _nearest_cells(F.col(vec), cents, 1)[0].alias("cell"),
    )
    probes = queries.select(
        F.col(query_id).alias("qid"),
        F.col(vec).alias("qvec"),
        F.explode(_nearest_cells(F.col(vec), cents, n_probe)).alias("cell"),
    )
    scored = cells.join(F.broadcast(probes), "cell").select(
        "qid", "id", cosine_col("cvec", "qvec").alias("cosine")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ivf_write_index(
    corpus: DataFrame,
    out_dir: str,
    n_cells: int = 16,
    corpus_id: str = "id",
    vec: str = "vec",
    kmeans_iters: int = 1,
) -> list[tuple[int, list[float]]]:
    """Write-time IVF index: assign every corpus vector its nearest cell and
    persist the corpus PARTITIONED BY cell. Returns the codebook the probe
    side needs. This is the durable form of ivf_topk's claim — at scale the
    cell is a physical partition column, so a probe scans n_probe/n_cells of
    the files (PartitionFilters), the inverted-file pattern (≙ one Qdrant
    collection per type, api_insert.py:100-106)."""
    cents = ivf_centroids(corpus, n_cells, corpus_id, vec, kmeans_iters)
    cells = corpus.select(
        F.col(corpus_id).alias("id"),
        F.col(vec).alias("vec"),
        _nearest_cells(F.col(vec), cents, 1)[0].alias("cell"),
    )
    # cluster rows by cell before the partitioned write: one task owns each
    # cell dir instead of every task writing every dir
    cells.repartition(F.col("cell")).write.mode("overwrite").partitionBy(
        "cell"
    ).parquet(out_dir)
    return cents


def ivf_probe_index(
    spark,
    index_dir: str,
    centroids: list[tuple[int, list[float]]],
    queries: DataFrame,
    k: int,
    query_id: str = "qid",
    vec: str = "vec",
    n_probe: int = 4,
) -> DataFrame:
    """Probe a written IVF index: each query exactly re-scores only its
    n_probe nearest cells, and the union of probed cell ids (≤ n_cells ints —
    a justified driver collect) is pushed as a partition filter so the scan
    never opens the other cells' files."""
    probes = queries.select(
        F.col(query_id).alias("qid"),
        F.col(vec).alias("qvec"),
        F.explode(_nearest_cells(F.col(vec), centroids, n_probe)).alias("cell"),
    )
    probed_cells = sorted(
        r.cell for r in probes.select("cell").distinct().collect()
    )
    idx = spark.read.parquet(index_dir).filter(F.col("cell").isin(probed_cells))
    scored = idx.join(F.broadcast(probes), "cell").select(
        "qid", "id", cosine_col("vec", "qvec").alias("cosine")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    corpus_id: str = "id",
    query_id: str = "qid",
    vec: str = "vec",
    n_planes: int = 6,
    n_families: int = 4,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: candidates = corpus rows sharing an LSH bucket with
    the query in ANY of ``n_families`` independent plane families (multi-probe
    recall boost), exact cosine re-scoring + top-k window on candidates only.

    At scale the corpus side is bucketed once (write-time partitioning), and
    each query touches only its buckets — the IVF pattern.
    """
    fams = []
    for fam in range(n_families):
        cb = corpus.select(
            F.col(corpus_id).alias("id"),
            F.col(vec).alias("cvec"),
            lsh_bucket_col(F.col(vec), n_planes, dim, family=fam).alias("bucket"),
            F.lit(fam).alias("family"),
        )
        qb = queries.select(
            F.col(query_id).alias("qid"),
            F.col(vec).alias("qvec"),
            lsh_bucket_col(F.col(vec), n_planes, dim, family=fam).alias("bucket"),
            F.lit(fam).alias("family"),
        )
        fams.append((cb, qb))
    cands = None
    for cb, qb in fams:
        c = cb.join(F.broadcast(qb), ["bucket", "family"]).select("qid", "id", "cvec", "qvec")
        cands = c if cands is None else cands.unionByName(c)
    cands = cands.dropDuplicates(["qid", "id"])
    scored = cands.select("qid", "id", cosine_col("cvec", "qvec").alias("cosine"))
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    corpus_id: str = "id",
    query_id: str = "qid",
    vec: str = "vec",
    n_cells: int = 16,
    n_probe: int = 4,
    m_sub: int = 4,
    k_codes: int = 16,
    dim: int = 64,
    kmeans_iters: int = 1,
    pq_iters: int = 1,
    rerank: int = 0,
) -> DataFrame:
    """IVF-PQ approximate top-k (Jégou et al.'s IVFADC — the standard
    billion-scale ANN layout): a coarse IVF codebook routes each vector to a
    Voronoi cell, the RESIDUAL (vector − cell centroid) is product-quantized
    to ``m_sub`` codes, and a query scores candidates in its ``n_probe``
    nearest cells by Asymmetric Distance Computation — one table lookup per
    subspace into a per-(query, cell) LUT of exact query-residual-to-centroid
    distances — never touching the raw corpus vectors. Returns
    (qid, id, adc, rank) with rank ascending by approximate squared L2;
    ``rerank=R`` (R ≥ k) re-scores the top-R ADC candidates per query with
    exact cosine against the raw vectors and returns (qid, id, cosine, rank).

    The composition of this module's two halves (ivf_topk's partition
    pruning + pq_quantize's codebook compression), ≙ the reference's Qdrant
    ANN read path (api_document_search_with_cache.py:157-237) at the scale
    where raw-vector scans stop being affordable.

    Scale shape: the codes table is m_sub small ints + a cell id per vector
    (bytes, not dim floats) and at scale is written PARTITIONED BY cell
    (ivf_write_index's pattern) so a probe is a partition-pruned scan of
    n_probe/n_cells of it; LUTs are built with ONE literal-codebook
    expression on the (tiny, broadcast) probe side — k_codes × m_sub floats
    per probe row; scoring is map-side zip_with lookups on the cell
    equi-join; the only corpus-wide shuffles are codebook training
    ((cell, pos) means — sub_dim-wide rows) and the final ≤ |probes|·|cell|
    candidate window. Raw vectors are joined back only for the ≤ R·|queries|
    re-rank survivors. Everything is deterministic: lowest-hash IVF seeds,
    lowest-id PQ seeds, fixed Lloyd rounds."""
    sub_len = dim // m_sub
    assert sub_len * m_sub == dim, "dim must divide evenly into m_sub subspaces"
    cents = ivf_centroids(corpus, n_cells, corpus_id, vec, kmeans_iters)
    # literal centroid matrix indexed by cell id (+1 for element_at)
    cmat = F.array(
        *[F.array(*[F.lit(float(x)) for x in cv]) for _, cv in cents]
    )
    vecd = F.col(vec).cast("array<double>")
    resid = corpus.select(
        F.col(corpus_id).alias("id"),
        _nearest_cells(F.col(vec), cents, 1)[0].alias("cell"),
        vecd.alias("v_raw"),
    ).select(
        "id",
        "cell",
        "v_raw",
        F.zip_with(
            "v_raw", F.element_at(cmat, F.col("cell") + 1), lambda x, c: x - c
        ).alias("res"),
    )
    resid = resid.persist()  # m_sub training passes + coding read it
    books: list[list[tuple[int, list[float]]]] = []
    for m in range(m_sub):
        df_m = resid.select(
            "id", F.slice("res", m * sub_len + 1, sub_len).alias("v")
        )
        books.append(_l2_centroids(df_m, k_codes, pq_iters))
    code_cols = []
    for m, book in enumerate(books):
        sub = F.slice("res", m * sub_len + 1, sub_len)
        code_cols.append(_l2_scored_codes(sub, book)[0]["cid"])
    coded = resid.select("id", "cell", F.array(*code_cols).alias("codes"))

    # probe side: n_probe cells per query, per-(qid, cell) residual LUTs
    bmats = [
        F.array(*[F.array(*[F.lit(float(x)) for x in cv]) for _, cv in book])
        for book in books
    ]
    qvecd = F.col(vec).cast("array<double>")
    probes = queries.select(
        F.col(query_id).alias("qid"),
        qvecd.alias("qv"),
        F.explode(_nearest_cells(F.col(vec), cents, n_probe)).alias("cell"),
    ).select(
        "qid",
        "cell",
        "qv",
        F.zip_with(
            "qv", F.element_at(cmat, F.col("cell") + 1), lambda x, c: x - c
        ).alias("qres"),
    )
    def _lut_over(bmat, qsub):
        # one-arg closure: a default-arg lambda would become Spark's
        # (element, index) two-arg form and shadow qsub with the index
        return F.transform(
            bmat,
            lambda c: F.aggregate(
                F.zip_with(qsub, c, lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda acc, d: acc + d,
            ),
        )

    luts = [
        _lut_over(bmat, F.slice("qres", m * sub_len + 1, sub_len))
        for m, bmat in enumerate(bmats)
    ]
    probes = probes.select("qid", "cell", F.array(*luts).alias("lut"))

    scored = coded.join(F.broadcast(probes), "cell").select(
        "qid",
        "id",
        F.aggregate(
            F.zip_with(
                "codes", "lut", lambda c, row: F.element_at(row, c + 1)
            ),
            F.lit(0.0),
            lambda acc, d: acc + d,
        ).alias("adc"),
    )
    w = Window.partitionBy("qid").orderBy(F.asc("adc"), F.asc("id"))
    topped = scored.withColumn("rank", F.row_number().over(w))
    if not rerank:
        return topped.filter(F.col("rank") <= k)
    cand = topped.filter(F.col("rank") <= max(rerank, k)).select("qid", "id")
    raw = resid.select("id", "v_raw")
    qraw = F.broadcast(
        queries.select(F.col(query_id).alias("qid"), qvecd.alias("qv"))
    )
    exact = (
        cand.join(raw, "id")
        .join(qraw, "qid")
        .select("qid", "id", cosine_col(F.col("v_raw"), F.col("qv")).alias("cosine"))
    )
    w2 = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("id"))
    return exact.withColumn("rank", F.row_number().over(w2)).filter(
        F.col("rank") <= k
    )


def ivfpq_write_index(
    corpus: DataFrame,
    out_dir: str,
    corpus_id: str = "id",
    vec: str = "vec",
    n_cells: int = 16,
    m_sub: int = 4,
    k_codes: int = 16,
    dim: int = 64,
    kmeans_iters: int = 1,
    pq_iters: int = 1,
) -> dict:
    """Durable IVFADC layout: train the coarse + residual-PQ codebooks and
    persist ONLY (id, codes) PARTITIONED BY cell — m_sub small ints per
    vector instead of dim floats, the compression that makes a
    billion-vector index fit. Returns {"centroids": ..., "books": ...}
    (dim × (1 + k_codes) floats total — the probe side's whole state).
    A probe then reads n_probe/n_cells of the files (PartitionFilters,
    pinned in tests/test_plans.py like ivf_write_index) and scores codes
    by LUT lookups without ever touching raw vectors."""
    sub_len = dim // m_sub
    cents = ivf_centroids(corpus, n_cells, corpus_id, vec, kmeans_iters)
    cmat = F.array(*[F.array(*[F.lit(float(x)) for x in cv]) for _, cv in cents])
    vecd = F.col(vec).cast("array<double>")
    resid = (
        corpus.select(
            F.col(corpus_id).alias("id"),
            _nearest_cells(F.col(vec), cents, 1)[0].alias("cell"),
            vecd.alias("v_raw"),
        )
        .select(
            "id",
            "cell",
            F.zip_with(
                "v_raw", F.element_at(cmat, F.col("cell") + 1), lambda x, c: x - c
            ).alias("res"),
        )
        .persist()
    )
    books = [
        _l2_centroids(
            resid.select("id", F.slice("res", m * sub_len + 1, sub_len).alias("v")),
            k_codes,
            pq_iters,
        )
        for m in range(m_sub)
    ]
    code_cols = [
        _l2_scored_codes(F.slice("res", m * sub_len + 1, sub_len), book)[0]["cid"]
        for m, book in enumerate(books)
    ]
    coded = resid.select("id", "cell", F.array(*code_cols).alias("codes"))
    coded.repartition(F.col("cell")).write.mode("overwrite").partitionBy(
        "cell"
    ).parquet(out_dir)
    resid.unpersist()
    return {"centroids": cents, "books": books}


def semdedup_prune(
    corpus: DataFrame,
    n_cells: int,
    threshold: float,
    corpus_id: str = "id",
    vec: str = "vec",
    iters: int = 1,
    seed_order: str = "hash",
) -> DataFrame:
    """(id, cell, max_sim, pruned) — SemDeDup-style semantic pruning
    (Abbas et al. 2023): cluster the embedding space with k-means, then
    inside each cell mark every vector whose cosine to a LOWER-id cell-mate
    exceeds ``threshold`` as pruned (keep-lowest-id representative — the
    paper prunes one vector of each near-dup pair; lowest-id is the
    deterministic tiebreak). ``max_sim`` is that max cosine (-1.0 when the vector has no
    lower-id cell-mate), so the full pairwise computation is verifiable
    even when few rows cross the threshold.

    Scale shape: never all-pairs — the self-join is an equi-join on the
    cell id, so cost is sum over cells of |cell|^2; pick ``n_cells``
    proportional to corpus size (the paper's regime) to bound cells.
    Vectors shuffle once per join side; AQE skew-split handles a hot cell.
    """
    base = (
        kmeans_clusters(
            corpus, n_cells, corpus_id, vec,
            iters=iters, seed_order=seed_order, keep_vec=True,
        )
        .select("id", "cell", "v")
        .persist()  # self-joins of unpersisted frames recompute both sides
    )
    a, b = base.alias("a"), base.alias("b")
    best = (
        a.join(b, (F.col("a.cell") == F.col("b.cell")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("b.id").alias("id"))
        .agg(F.max(cosine_col(F.col("a.v"), F.col("b.v"))).alias("max_sim"))
    )
    return (
        base.join(best, "id", "left")
        .select(
            "id",
            "cell",
            F.coalesce(F.round("max_sim", 4), F.lit(-1.0)).alias("max_sim"),
            F.when(F.col("max_sim") >= threshold, F.lit(1))
            .otherwise(F.lit(0))
            .alias("pruned"),
        )
    )


def label_centroid_audit(
    df: DataFrame, id_col: str, vec_col: str, label_col: str
) -> DataFrame:
    """Per-label embedding-space separation audit (the silhouette idea on
    centroids): for every vector, squared L2 distance to its OWN label's
    centroid (a) and to the NEAREST other label's centroid (b), rolled up
    per label as (label, n_vecs, avg_intra, avg_nearest_other, mean_sil)
    with sil = (b - a) / max(a, b) on the distances. Labels whose mean_sil
    hugs 0 (or goes negative) are the mislabeled / collapsed clusters a
    labeling pipeline should re-examine — the embedding-QA twin of
    `semdedup_prune`'s within-cell view.

    Scale shape: centroids are one posexplode + groupBy over (label, dim) —
    L×d rows out, map-side combined — then collapsed back to L array rows
    and CROSS-JOINED BROADCAST onto the corpus (L small by contract, like
    the IVF codebook). Each corpus row computes its L distances in one
    zip_with/aggregate pass; the only corpus-sized shuffle is the final
    per-label rollup. The corpus is scanned once."""
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(label_col).alias("label"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    cent = (
        base.select("label", F.posexplode("v").alias("i", "x"))
        .groupBy("label", "i")
        .agg(F.avg("x").alias("c"))
        .groupBy("label")
        .agg(
            F.array_sort(F.collect_list(F.struct("i", "c"))).alias("ic"),
        )
        .select(
            F.col("label").alias("clabel"),
            F.transform("ic", lambda s: s["c"]).alias("cv"),
        )
    )
    d2 = (
        base.crossJoin(F.broadcast(cent))
        .select(
            "id",
            "label",
            "clabel",
            F.aggregate(
                F.zip_with("v", "cv", lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("d2"),
        )
    )
    per_vec = d2.groupBy("id", "label").agg(
        F.max(F.when(F.col("clabel") == F.col("label"), F.col("d2"))).alias("a"),
        F.min(F.when(F.col("clabel") != F.col("label"), F.col("d2"))).alias("b"),
    )
    return (
        per_vec.select(
            "label",
            "a",
            "b",
            ((F.col("b") - F.col("a")) / F.greatest("a", "b")).alias("sil"),
        )
        .groupBy("label")
        .agg(
            F.count("*").alias("n_vecs"),
            F.avg(F.sqrt("a")).alias("avg_intra"),
            F.avg(F.sqrt("b")).alias("avg_nearest_other"),
            F.avg("sil").alias("mean_sil"),
        )
    )


def pca_power_scores(
    df,
    id_col: str,
    vec_col: str,
    n_iter: int = 12,
    passthrough: tuple[str, ...] = (),
):
    """Top-principal-component projection of an embedding column: one
    distributed pass accumulates the second-moment matrix, the tiny d×d
    eigenproblem is solved on the driver by power iteration (v0 = e0,
    ``n_iter`` rounds), and the unit eigenvector is broadcast back for a
    map-only centered-projection pass. Returns (id, *passthrough, pc1) —
    the 1-D corpus layout SemDeDup-style pruning, drift monitoring, or
    embedding-space visualization reads first.

    Scale shape (the MLlib RowMatrix gram design): each Arrow batch
    contributes one numpy ``m.T @ m`` partial — d(d+1)/2-ish values per
    PARTITION, not per row — reduced by a map-side-combined groupBy sum;
    the driver collects exactly d² + d + 1 numbers (bounded, like the IVF
    codebook), and the corpus is scanned twice (moments, projection) with
    no corpus-sized shuffle anywhere. Power iteration is deterministic:
    float64, fixed v0, fixed round count — replayable in SQL (the
    embedding_pca oracle unrolls the same 12 matvec/normalize rounds as
    materialized CTEs).
    """
    import numpy as np
    import pandas as pd

    base = df.select(
        F.col(id_col).alias("id"),
        *[F.col(c) for c in passthrough],
        F.col(vec_col).cast("array<double>").alias("v"),
    )

    def _moments(batches):
        sxx = None
        sx = None
        n = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = np.array(pdf["v"].tolist(), dtype=np.float64)
            if sxx is None:
                d = m.shape[1]
                sxx = np.zeros((d, d))
                sx = np.zeros(d)
            sxx += m.T @ m
            sx += m.sum(axis=0)
            n += m.shape[0]
        if sxx is None:
            return
        d = sxx.shape[0]
        i_idx, j_idx = np.meshgrid(np.arange(d), np.arange(d), indexing="ij")
        yield pd.DataFrame(
            {
                "i": np.concatenate([i_idx.ravel(), np.arange(d), [-1]]),
                "j": np.concatenate([j_idx.ravel(), np.full(d, -1), [-1]]),
                "s": np.concatenate([sxx.ravel(), sx, [float(n)]]),
            }
        )

    parts = (
        base.select("v")
        .mapInPandas(_moments, "i int, j int, s double")
        .groupBy("i", "j")
        .agg(F.sum("s").alias("s"))
        .collect()
    )
    n = next(r.s for r in parts if r.i == -1 and r.j == -1)
    d = max(r.i for r in parts) + 1
    mu = np.zeros(d)
    cov = np.zeros((d, d))
    for r in parts:
        if r.i >= 0 and r.j == -1:
            mu[r.i] = r.s / n
        elif r.i >= 0 and r.j >= 0:
            cov[r.i, r.j] = r.s / n
    cov -= np.outer(mu, mu)
    v = np.zeros(d)
    v[0] = 1.0
    for _ in range(n_iter):
        v = cov @ v
        v = v / np.linalg.norm(v)

    mu_lit = F.array(*[F.lit(float(x)) for x in mu])
    v_lit = F.array(*[F.lit(float(x)) for x in v])
    return base.select(
        "id",
        *passthrough,
        F.aggregate(
            F.zip_with(
                F.zip_with(F.col("v"), mu_lit, lambda x, m: x - m),
                v_lit,
                lambda x, w: x * w,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("pc1"),
    )


def centroid_similarity(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    label_col: str,
) -> DataFrame:
    """(label_a, label_b, n_a, n_b, cos): pairwise cosine similarity
    between label centroids — the full confusability matrix refining
    label_centroid_audit's nearest-other summary (which label PAIRS are
    near-duplicates of each other in embedding space; candidates for
    merging or for targeted hard-negative mining).

    Scale shape: one posexplode shuffle to (label, dim) means — the only
    corpus-sized pass; centroids are L×d rows, norms L rows, and the
    pair join is dim-keyed over those tiny tables (output C(L,2))."""
    v = df.select(
        F.col(label_col).alias("label"),
        F.posexplode(F.col(vec_col)).alias("i", "x"),
    )
    cent = v.groupBy("label", "i").agg(
        F.avg(F.col("x").cast("double")).alias("c")
    )
    sizes = df.groupBy(F.col(label_col).alias("label")).agg(
        F.count("*").alias("n_vecs")
    )
    norms = cent.groupBy("label").agg(
        F.sqrt(F.sum(F.col("c") * F.col("c"))).alias("nrm")
    )
    a = cent.select(
        F.col("label").alias("la"), "i", F.col("c").alias("ca")
    )
    b = cent.select(
        F.col("label").alias("lb"), "i", F.col("c").alias("cb")
    )
    dots = (
        a.join(b, "i")
        .filter(F.col("la") < F.col("lb"))
        .groupBy("la", "lb")
        .agg(F.sum(F.col("ca") * F.col("cb")).alias("dot"))
    )
    return (
        dots.join(
            F.broadcast(norms.select(F.col("label").alias("la"), F.col("nrm").alias("nrm_a"))),
            "la",
        )
        .join(
            F.broadcast(norms.select(F.col("label").alias("lb"), F.col("nrm").alias("nrm_b"))),
            "lb",
        )
        .join(
            F.broadcast(sizes.select(F.col("label").alias("la"), F.col("n_vecs").alias("n_a"))),
            "la",
        )
        .join(
            F.broadcast(sizes.select(F.col("label").alias("lb"), F.col("n_vecs").alias("n_b"))),
            "lb",
        )
        .select(
            F.col("la").alias("label_a"),
            F.col("lb").alias("label_b"),
            "n_a",
            "n_b",
            (F.col("dot") / (F.col("nrm_a") * F.col("nrm_b"))).alias("cos"),
        )
    )


def _l2_scored_codes(
    vec: Column, centroids: list[tuple[int, list[float]]]
) -> Column:
    """array<struct<e, cid>> of squared-L2 distance per centroid, sorted so
    element 0 is the nearest code (ties → SMALLER cid; SQL oracles mirror
    as ORDER BY err ASC, code ASC). Same single-literal-matrix shape as
    _scored_cells — one transform lambda, not a per-centroid expression
    tree (that made Catalyst analysis the dominant Lloyd cost)."""
    cmat = F.array(
        *[
            F.struct(
                F.lit(cid).alias("cid"),
                F.array(*[F.lit(float(x)) for x in cv]).alias("c"),
            )
            for cid, cv in centroids
        ]
    )
    scored = F.transform(
        cmat,
        lambda s: F.struct(
            F.aggregate(
                F.zip_with(vec, s.c, lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ).alias("e"),
            s.cid.alias("cid"),
        ),
    )
    return F.array_sort(scored)


def _l2_centroids(
    df: DataFrame, k: int, iters: int
) -> list[tuple[int, list[float]]]:
    """Deterministic unnormalized Lloyd's codebook on (id, v): seed with the
    k lowest-id vectors (the SQL-replicable seed order), then ``iters``
    distributed assign → per-(code, pos) mean steps. Only k × sub_dim
    floats reach the driver; empty codes keep their previous centroid."""
    seeds = df.orderBy("id").limit(k).collect()
    cents = [(i, [float(x) for x in r.v]) for i, r in enumerate(seeds)]
    for _ in range(iters):
        best = _l2_scored_codes(F.col("v"), cents)[0]
        assigned = df.select("v", best["cid"].alias("cell"))
        means = (
            assigned.select("cell", F.posexplode("v").alias("pos", "x"))
            .groupBy("cell", "pos")
            .agg(F.avg("x").alias("m"))
            .groupBy("cell")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s.m,
                ).alias("mv")
            )
            .collect()
        )
        new = {r.cell: [float(x) for x in r.mv] for r in means}
        cents = [(cid, new.get(cid, cv)) for cid, cv in cents]
    return cents


def pq_quantize(
    corpus: DataFrame,
    id_col: str = "id",
    vec_col: str = "vec",
    m_sub: int = 4,
    k: int = 4,
    iters: int = 1,
    dim: int = 64,
) -> DataFrame:
    """Product quantization (Jégou et al.): split each vector into ``m_sub``
    contiguous subvectors, train an independent k-centroid L2 codebook per
    subspace (deterministic lowest-id seeds + Lloyd steps), and emit each
    vector's code tuple plus its total squared reconstruction error — the
    compressed-vector representation ANN indexes store instead of raw
    floats (k^m_sub virtual cells from m_sub tiny codebooks; here 4^4 = 256
    cells from 16 centroids of 16 floats).

    Complements the scalar int8 path (curation.embedding_quantize): PQ is
    the codebook-compression face — m_sub bytes per vector instead of dim.

    Scale shape: training collects only m_sub × k × (dim/m_sub) floats =
    dim × k total; final coding is ONE map-only pass with every codebook
    inlined as literals (no joins, no shuffle at assignment time)."""
    sub_len = dim // m_sub
    vecd = F.col(vec_col).cast("array<double>")
    books: list[list[tuple[int, list[float]]]] = []
    for m in range(m_sub):
        df_m = corpus.select(
            F.col(id_col).alias("id"),
            F.slice(vecd, m * sub_len + 1, sub_len).alias("v"),
        )
        books.append(_l2_centroids(df_m, k, iters))
    cols = [F.col(id_col).alias("id")]
    err_total = None
    for m, cents in enumerate(books):
        sub = F.slice(vecd, m * sub_len + 1, sub_len)
        best = _l2_scored_codes(sub, cents)[0]
        cols.append(best["cid"].alias(f"code_{m}"))
        err_total = best["e"] if err_total is None else err_total + best["e"]
    return corpus.select(*cols, err_total.alias("recon_err"))


def kmeans_silhouette(
    corpus: DataFrame,
    n_cells: int,
    corpus_id: str = "id",
    vec: str = "vec",
    iters: int = 1,
    seed_order: str = "hash",
) -> DataFrame:
    """Per-cell simplified (centroid-based) silhouette of the
    kmeans_clusters partitioning — the O(n·k) clustering-quality audit
    (full silhouette is O(n²) pairwise and cannot ship at corpus scale;
    the centroid form is the standard large-n substitute, e.g. sklearn's
    simplified_silhouette). For each vector: a = cosine distance to its
    own (nearest) centroid, b = distance to the second-nearest, s =
    (b−a)/max(a,b) ∈ [0,1]; per-cell mean/min summarize cohesion vs
    separation margin. Same broadcast-codebook shape as assignment: one
    map-only pass over the corpus, then a k-row groupBy — zero extra
    shuffles beyond the cell key. The max(a,b)=0 degenerate (vector ==
    centroid in a 1-cell tie) is guarded in the expression itself (ANSI
    rule), not by a downstream filter."""
    cents = ivf_centroids(
        corpus, n_cells, corpus_id, vec, kmeans_iters=iters,
        seed_order=seed_order,
    )
    v = F.col(vec)
    scored = _scored_cells(v, cents)
    best, second = scored[0], scored[1]
    a = F.lit(1.0) - best["d"] / norm_col(v)
    b = F.lit(1.0) - second["d"] / norm_col(v)
    sil = F.when(
        F.greatest(a, b) > 0, (b - a) / F.greatest(a, b)
    ).otherwise(F.lit(0.0))
    return (
        corpus.select(best["cid"].alias("cell"), sil.alias("sil"))
        .groupBy("cell")
        .agg(
            F.count("*").alias("n_vecs"),
            F.round(F.avg("sil"), 4).alias("mean_sil"),
            F.round(F.min("sil"), 4).alias("min_sil"),
        )
        .orderBy("cell")
    )


def kcenter_exemplars(
    corpus: DataFrame, k: int, corpus_id: str = "id", vec: str = "vec"
) -> DataFrame:
    """Greedy k-center (farthest-point-first) exemplar selection over an
    embedding column — the classic 2-approximation coreset picker
    (Gonzalez '85) that diversity-prunes training data: each round
    selects the point FARTHEST (cosine distance) from everything chosen
    so far. Seeded at the lowest id; each round's argmax is decided on
    round-6 distances with an id tie-break, and the winning row is
    broadcast back as a 1-row crossJoin (the bpe_merge_rounds discipline)
    so the whole k-round plan stays declarative — no collect. Per round:
    one map-only distance pass over the corpus (chosen set = broadcast
    literals-by-join) + a top-1 TakeOrdered; nothing ever shuffles the
    vectors. Returns (sel_round, id, min_dist) for the k exemplars,
    min_dist = distance to the previously chosen set at selection time
    (the k-center covering radius curve, decreasing)."""
    e = corpus.select(F.col(corpus_id).alias("id"), F.col(vec).alias("v"))
    first = e.orderBy("id").limit(1)
    chosen = [first]
    rows = [
        first.select(
            F.lit(1).cast("long").alias("sel_round"),
            "id",
            F.lit(0.0).alias("min_dist"),
        )
    ]
    for r in range(2, k + 1):
        scored = e
        dists = []
        for i, c in enumerate(chosen):
            scored = scored.crossJoin(
                F.broadcast(c.select(F.col("v").alias(f"_cv{i}")))
            )
            dists.append(
                F.lit(1.0) - cosine_col(F.col("v"), F.col(f"_cv{i}"))
            )
        md = dists[0] if len(dists) == 1 else F.least(*dists)
        scored = scored.select("id", "v", F.round(md, 6).alias("md"))
        best = scored.orderBy(F.col("md").desc(), F.col("id").asc()).limit(1)
        chosen.append(best)
        rows.append(
            best.select(
                F.lit(r).cast("long").alias("sel_round"),
                "id",
                F.col("md").alias("min_dist"),
            )
        )
    out = rows[0]
    for x in rows[1:]:
        out = out.unionByName(x)
    return out


def knn_label_agreement(
    emb: DataFrame,
    id_col: str = "id",
    vec_col: str = "vec",
    label_col: str = "label",
    k: int = 10,
) -> DataFrame:
    """Per-label kNN agreement — the confident-learning-style label-noise
    screen over an embedded, labeled corpus: for each vector, what
    fraction of its k nearest neighbors (exact cosine, self excluded)
    carries the same label? A label whose members' neighborhoods
    disagree is noisy, mis-split, or semantically overlapping with
    another — the audit run before anyone trains a classifier head or
    stratifies a split on that label. Output one row per label:
    (label, n_docs, n_agree, mean_agree) with n_agree = Σ per-doc
    same-label neighbor counts (exact integers; mean_agree =
    n_agree/(k·n_docs) is the single division, round 6).

    Shape: the labeled corpus is broadcast as the query side and scored
    map-side (zip_with/aggregate dot products, JVM-only) against itself;
    self-pairs are excluded BEFORE ranking (an exact-duplicate twin with
    a smaller id would otherwise displace the self row and silently eat
    a neighbor slot); ranks come from per-query windows (|corpus|-sized
    partitions). The stated contract is the brute-force one — quadratic
    scoring, the audit's exact baseline; at corpus scale swap the scored
    set for ANN/IVF candidates (operators/similarity.ann_topk) and keep
    the agreement aggregation unchanged."""
    q = F.broadcast(
        emb.select(
            F.col(id_col).alias("qid"),
            F.col(vec_col).alias("qvec"),
            F.col(label_col).alias("qlabel"),
        )
    )
    scored = (
        emb.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).alias("cvec"),
            F.col(label_col).alias("clabel"),
        )
        .join(q)
        .filter(F.col("id") != F.col("qid"))
        .select(
            "qid",
            "qlabel",
            "id",
            "clabel",
            cosine_col(F.col("cvec"), F.col("qvec")).alias("cos"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("id"))
    top = scored.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= k
    )
    per_doc = top.groupBy("qid", "qlabel").agg(
        F.sum((F.col("clabel") == F.col("qlabel")).cast("int"))
        .cast("long")
        .alias("agree")
    )
    return per_doc.groupBy(F.col("qlabel").alias(label_col)).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("agree").cast("long").alias("n_agree"),
        F.round(
            F.sum("agree") / (F.lit(k) * F.count("*")).cast("double"), 6
        ).alias("mean_agree"),
    )


def mips_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    corpus_id: str = "id",
    query_id: str = "qid",
    vec: str = "vec",
) -> DataFrame:
    """(qid, id, dot, rank) exact maximum-inner-product top-k — the
    un-normalized face of brute_force_topk (recommendation scoring,
    learned-embedding retrieval where magnitude IS signal; at scale,
    norm-augmentation maps MIPS onto the cosine ANN paths: append
    sqrt(M²−‖x‖²) and search cosine). Vectors are cast to DOUBLE before
    the zip_with product so each partial product is the same IEEE double
    on both engines (float32 inputs would round products engine-side
    before the fold — the cross-engine seam the cosine paths never hit
    because both engines see identical float inputs); the left fold from
    0.0 matches DuckDB's list_reduce from its first element exactly
    because 0.0 + p₁ ≡ p₁.

    The query side is broadcast; per-qid windows rank the scored corpus
    (contract: the query side is small — the ANN/IVF routes are the
    large-query path, as with brute_force_topk)."""
    q = F.broadcast(
        queries.select(
            F.col(query_id).alias("qid"),
            F.col(vec).cast("array<double>").alias("qvec"),
        )
    )
    scored = corpus.select(
        F.col(corpus_id).alias("id"),
        F.col(vec).cast("array<double>").alias("cvec"),
    ).join(q).select(
        "qid", "id", dot_col(F.col("cvec"), F.col("qvec")).alias("dot")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("dot"), F.asc("id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )
