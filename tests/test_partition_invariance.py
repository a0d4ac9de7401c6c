"""Partition-invariance gates (SURVEY.md §7.4 risk 3): every content-derived
operator must produce the SAME result regardless of physical partitioning —
1 partition vs 16 vs a shuffled row order. This is the property that makes
results reproducible on a 1000-executor cluster where partitioning is never
under the caller's control."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from raptor_spark.operators.dedup import (
    exact_dedup,
    hamming_near_pairs,
    minhash_lsh_pairs,
    simhash,
)
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def docs(spark):
    # unpersist on teardown: the cache manager substitutes ANY later scan of
    # the same parquet path with InMemoryTableScan, breaking the pushdown
    # plan assertions in test_plans.py
    df = spark.read.parquet(f"{SF_DIR}/documents.parquet").persist()
    yield df
    df.unpersist()


def _layouts(df):
    return [
        df.coalesce(1),
        df.repartition(16),
        df.orderBy(F.desc("doc_id")).repartition(7, "source"),
    ]


def test_minhash_pairs_partition_invariant(spark, docs):
    results = []
    for d in _layouts(docs):
        pairs = minhash_lsh_pairs(
            d, "doc_id", "text", n_hashes=32, n_bands=16, shingle_n=2,
            jaccard_threshold=0.5,
        )
        results.append({(r.a, r.b, round(r.jaccard, 9)) for r in pairs.collect()})
    assert results[0] == results[1] == results[2]
    assert results[0], "no pairs — invariance is vacuous"


def test_simhash_partition_invariant(spark, docs):
    results = []
    for d in _layouts(docs):
        fp = simhash(d, "doc_id", "text")
        results.append({(r.id, r.simhash) for r in fp.collect()})
    assert results[0] == results[1] == results[2]


def test_hamming_pairs_partition_invariant(spark, docs):
    base = simhash(docs, "doc_id", "text").persist()
    layouts = [
        base.coalesce(1),
        base.repartition(16),
        base.orderBy(F.desc("id")).repartition(7, "simhash"),
    ]
    results = []
    for d in layouts:
        results.append(
            {(r.a, r.b, r.hamming)
             for r in hamming_near_pairs(d, max_distance=3).collect()}
        )
    base.unpersist()
    assert results[0] == results[1] == results[2]
    assert results[0]


def test_exact_dedup_partition_invariant(spark, docs):
    results = []
    for d in _layouts(docs):
        results.append(
            {(r.hash, r.keep_id, r.n_dups)
             for r in exact_dedup(d, "doc_id", "text").collect()}
        )
    assert results[0] == results[1] == results[2]


def test_bloom_and_novelty_partition_invariant(spark, docs):
    """Bloom flags, novelty fractions, quantile thresholds, and PSI scores
    are pure content functions — identical under any layout."""
    from raptor_spark.operators.curation import (
        bloom_build,
        bloom_contamination,
        quantile_gate,
        shingle_novelty,
    )
    from raptor_spark.operators.profile import psi_drift

    flags, novel, gate, psi = [], [], [], []
    for d in _layouts(docs):
        ev = d.filter(F.col("doc_id") % 50 == 0)
        tr = d.filter(F.col("doc_id") % 50 != 0)
        bloom = bloom_build(ev, "text")
        flags.append(
            {(r.id, r.n_flagged)
             for r in bloom_contamination(tr, bloom, "doc_id", "text").collect()}
        )
        novel.append(
            {(r.id, r.n_shingles, r.n_novel)
             for r in shingle_novelty(d, "doc_id", "text").collect()}
        )
        gate.append(
            {(r.lang, r.doc_id)
             for r in quantile_gate(d, "lang", "n_chars").select("lang", "doc_id").collect()}
        )
        psi.append(
            {(r.source, round(r.psi, 9))
             for r in psi_drift(d, "source", "n_chars", "src0").collect()}
        )
    for results in (flags, novel, gate, psi):
        assert results[0] == results[1] == results[2]
        assert results[0], "empty result — invariance is vacuous"


def test_lm_perplexity_and_keep_best_partition_invariant(spark, docs):
    """LM perplexity (rounded output — the per-doc log-prob mean is summed
    in partition order, so the 4-dp rounding is the contract surface) and
    the keep-best representative choice are layout-independent."""
    from raptor_spark.operators.curation import lm_perplexity
    from raptor_spark.operators.dedup import (
        cluster_representatives,
        near_dup_clusters,
        ngram_jaccard_pairs,
    )

    ppl, kept = [], []
    for d in _layouts(docs):
        ppl.append(
            {(r.id, r.n_bigrams, r.ppl)
             for r in lm_perplexity(d, "doc_id", "text").collect()}
        )
        sub = d.filter(F.col("doc_id") < 150)
        clusters = near_dup_clusters(
            ngram_jaccard_pairs(sub, "doc_id", "text", n=1, threshold=0.8)
        )
        scored = sub.select(
            F.col("doc_id").alias("id"),
            F.length("text").cast("long").alias("score"),
        )
        kept.append(
            {(r.cluster, r.kept_id, r.n_members)
             for r in cluster_representatives(scored, clusters).collect()}
        )
    for results in (ppl, kept):
        assert results[0] == results[1] == results[2]
        assert results[0], "empty result — invariance is vacuous"


def test_order_sensitive_session_ops_partition_invariant(spark):
    """The order-RECURSIVE operators added this round (EWMA fold, Markov
    transitions, label propagation, Bellman-Ford) must not leak physical
    row order: every layout yields identical output because each op pins a
    total order (sort keys with tiebreaks) or is pure aggregation."""
    import random

    from raptor_spark.operators.graph import label_propagation, sssp
    from raptor_spark.operators.profile import transition_counts
    from raptor_spark.operators.relational import ewma_by_key

    rng = random.Random(3)
    ev = spark.createDataFrame(
        [
            (i % 17, float(rng.randrange(100)), i, "s" + str(rng.randrange(4)),
             rng.random())
            for i in range(400)
        ],
        "u long, t double, eid long, s string, v double",
    ).persist()
    pairs = spark.createDataFrame(
        [(rng.randrange(30), rng.randrange(30), rng.random()) for _ in range(60)],
        "a long, b long, w double",
    ).filter(F.col("a") != F.col("b")).persist()
    src = spark.createDataFrame([(0,), (7,)], "id long")

    for df, op, key in [
        (ev, lambda d: ewma_by_key(d, ["u"], ["t", "eid"], "v", 0.3),
         lambda r: (r.u, r.n, round(r.ewma, 12))),
        (ev, lambda d: transition_counts(d, ["u"], ["t", "eid"], "s"),
         lambda r: (r.from_state, r.to_state, r.n, round(r.p, 12))),
        (pairs, lambda d: label_propagation(d, n_iter=4),
         lambda r: (r.id, r.community)),
        (pairs, lambda d: sssp(d, src, n_rounds=6),
         lambda r: (r.id, round(r.dist, 12))),
    ]:
        outs = []
        for layout in (df.coalesce(1), df.repartition(13)):
            outs.append({key(r) for r in op(layout).collect()})
        assert outs[0] == outs[1]
        assert outs[0], "empty result — invariance is vacuous"
    ev.unpersist()
    pairs.unpersist()


def test_zipf_fit_partition_invariant(spark, docs):
    from raptor_spark.operators.ranking import zipf_fit

    results = []
    for d in _layouts(docs):
        r = zipf_fit(d, "text").collect()[0]
        results.append(
            (r.n_terms, r.n_tokens, round(r.slope, 6), round(r.intercept, 6),
             round(r.r2, 6))
        )
    assert results[0] == results[1] == results[2]


def test_bpe_train_partition_invariant(spark, docs):
    from raptor_spark.operators.text import bpe_train

    results = []
    for d in _layouts(docs):
        rows = bpe_train(d, "text", n_merges=4).orderBy("rank").collect()
        results.append([tuple(r) for r in rows])
    # integer counts end-to-end: exact equality, no rounding needed
    assert results[0] == results[1] == results[2]
    assert len(results[0]) == 4


def test_pca_scores_partition_invariant(spark):
    from raptor_spark.operators.similarity import pca_power_scores

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    results = []
    for d in (emb.coalesce(1), emb.repartition(16),
              emb.orderBy(F.desc("vec_id")).repartition(7, "label")):
        rows = pca_power_scores(d, "vec_id", "embedding").collect()
        # FP sums vary with partition boundaries at ~1e-12; the query rounds
        # to 4 decimals — gate at 6 to leave two orders of headroom
        results.append({(r.id, round(r.pc1, 6)) for r in rows})
    assert results[0] == results[1] == results[2]


def test_label_centroid_audit_partition_invariant(spark):
    from raptor_spark.operators.similarity import label_centroid_audit

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    results = []
    for d in (emb.coalesce(1), emb.repartition(16)):
        rows = label_centroid_audit(d, "vec_id", "embedding", "label").collect()
        results.append(
            {(r.label, r.n_vecs, round(r.avg_intra, 6), round(r.mean_sil, 6))
             for r in rows}
        )
    assert results[0] == results[1]


def test_span_and_mlm_masking_partition_invariant(spark, docs):
    from raptor_spark.operators.text import mlm_masking, span_corruption

    small = docs.filter(F.col("doc_id") < 60).select("doc_id", "text")
    base_span = {
        (r.id, r.input_text, r.target_text)
        for r in span_corruption(small.coalesce(1), "doc_id", "text").collect()
    }
    base_mlm = {
        (r.id, r.masked_text, r.labels_text)
        for r in mlm_masking(small.coalesce(1), "doc_id", "text").collect()
    }
    for layout in (small.repartition(16), small.orderBy(F.desc("doc_id")).repartition(7)):
        got_span = {
            (r.id, r.input_text, r.target_text)
            for r in span_corruption(layout, "doc_id", "text").collect()
        }
        got_mlm = {
            (r.id, r.masked_text, r.labels_text)
            for r in mlm_masking(layout, "doc_id", "text").collect()
        }
        assert got_span == base_span
        assert got_mlm == base_mlm


def test_kendall_and_quantile_norm_partition_invariant(spark):
    import random

    from raptor_spark.operators.profile import kendall_tau, quantile_normalize

    rng = random.Random(41)
    rows = [(f"g{i % 3}", i, rng.randrange(50), rng.randrange(50)) for i in range(300)]
    df = spark.createDataFrame(rows, "g string, id long, x long, y long")
    base_tau = {
        tuple(r) for r in kendall_tau(df.coalesce(1), ["g"], "x", "y").collect()
    }
    base_qn = {
        tuple(r) for r in quantile_normalize(df.coalesce(1), ["g"], "id", "x").collect()
    }
    for layout in (df.repartition(16), df.orderBy(F.desc("id")).repartition(5, "g")):
        assert {tuple(r) for r in kendall_tau(layout, ["g"], "x", "y").collect()} == base_tau
        assert {tuple(r) for r in quantile_normalize(layout, ["g"], "id", "x").collect()} == base_qn
