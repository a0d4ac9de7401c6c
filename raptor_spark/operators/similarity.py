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


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    corpus_id: str = "id",
    query_id: str = "qid",
    vec: str = "vec",
) -> DataFrame:
    """(qid, id, cosine, rank) exact top-k per query. The query side is
    broadcast — the corpus is scanned once, no shuffle of the corpus beyond
    the final per-query top-k window (tiny: k·|queries| rows after scoring).
    """
    q = F.broadcast(queries.select(F.col(query_id).alias("qid"), F.col(vec).alias("qvec")))
    scored = corpus.select(F.col(corpus_id).alias("id"), F.col(vec).alias("cvec")).join(q)
    scored = scored.select(
        "qid", "id", cosine_col(F.col("cvec"), F.col("qvec")).alias("cosine")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


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
