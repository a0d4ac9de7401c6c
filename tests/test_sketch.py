"""Error gates for the sketch aggregates (operators/sketch.py): approximate
answers must stay within published error bounds of exact answers on the
driver testdata — the correctness contract an approximate operator can make."""

from __future__ import annotations

import pyspark.sql.functions as F

from raptor_spark.operators.sketch import approx_distinct, approx_quantiles, hll_rollup
from tests.conftest import SF_DIR


def test_hll_rollup_within_2pct_of_exact(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = {
        r.lang: r.approx_distinct
        for r in hll_rollup(docs, ["lang", "source"], ["lang"], "doc_id").collect()
    }
    exact = {
        r.lang: r.n
        for r in docs.groupBy("lang")
        .agg(F.countDistinct("doc_id").alias("n"))
        .collect()
    }
    assert set(got) == set(exact)
    for lang, n in exact.items():
        assert abs(got[lang] - n) <= max(0.02 * n, 1), (lang, got[lang], n)


def test_hll_union_consistent_with_flat_sketch(spark):
    """Rolling fine sketches up by union must estimate the same cardinality
    as sketching the coarse group directly (mergeability)."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    via_union = {
        r.lang: r.approx_distinct
        for r in hll_rollup(docs, ["lang", "source"], ["lang"], "doc_id").collect()
    }
    direct = {
        r.lang: r.approx_distinct
        for r in hll_rollup(docs, ["lang"], ["lang"], "doc_id").collect()
    }
    assert via_union == direct


def test_approx_distinct_within_rsd(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    got = {
        r.event_type: r.approx_distinct
        for r in approx_distinct(ev, ["event_type"], "user_id", rsd=0.02).collect()
    }
    exact = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for et, n in exact.items():
        assert abs(got[et] - n) <= max(0.05 * n, 2), (et, got[et], n)


def test_approx_quantiles_rank_error(spark):
    """percentile_approx returns an actual element whose rank must be within
    1% of the requested quantile's rank per group."""
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    probs = [0.5, 0.9, 0.99]
    out = {
        r.event_type: (r.q_0_5, r.q_0_9, r.q_0_99)
        for r in approx_quantiles(ev, ["event_type"], "value", probs).collect()
    }
    vals: dict[str, list[float]] = {}
    for r in ev.select("event_type", "value").collect():
        vals.setdefault(r.event_type, []).append(r.value)
    for et, qs in out.items():
        xs = sorted(vals[et])
        n = len(xs)
        for p, q in zip(probs, qs):
            lo = sum(1 for x in xs if x < q)
            hi = sum(1 for x in xs if x <= q)
            # requested rank must fall within the value's rank span ±1%
            assert lo / n - 0.01 <= p <= hi / n + 0.01, (et, p, q, lo / n, hi / n)


def test_cms_never_underestimates_and_bounds_overestimate(spark):
    """Count-min guarantees: est ≥ exact for every key; overestimate ≤ εN
    with ε = e/width (deterministic on fixed data — the fixture vocabulary
    is far below the bucket count, so collisions are rare and bounded)."""
    import math

    import pyspark.sql.functions as F

    from raptor_spark.operators.sketch import cms_build, cms_estimate
    from raptor_spark.operators.text import words_col
    from tests.conftest import SF_DIR

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    terms = docs.select(F.explode(words_col(F.col("text"))).alias("term"))
    exact = {r.term: r.n for r in terms.groupBy("term").agg(F.count("*").alias("n")).collect()}
    n_total = sum(exact.values())
    sk = cms_build(terms, "term", depth=4, width=1024)
    est = {
        r.key: r.est
        for r in cms_estimate(sk, terms.distinct(), "term", depth=4, width=1024).collect()
    }
    assert set(est) == set(exact)
    eps_n = math.e / 1024 * n_total
    for t, n in exact.items():
        assert est[t] >= n, t
        assert est[t] - n <= eps_n, (t, est[t], n)
    # the estimated top-10 is the exact top-10 on this fixture
    top_est = sorted(est, key=lambda t: (-est[t], t))[:10]
    top_exact = sorted(exact, key=lambda t: (-exact[t], t))[:10]
    assert top_est == top_exact


def test_cms_partial_sketches_merge_by_addition(spark):
    """sketch(A ∪ B) == bucket-wise sum of sketch(A) and sketch(B) — the
    mergeability that lets per-day sketches roll up without raw rows."""
    import pyspark.sql.functions as F

    from raptor_spark.operators.sketch import cms_build

    df = spark.createDataFrame(
        [(i, f"k{i % 7}") for i in range(200)], "i long, key string"
    )
    a, b = df.filter(F.col("i") < 90), df.filter(F.col("i") >= 90)
    whole = {(r.row, r.bucket): r.cnt for r in cms_build(df, "key").collect()}
    pa = {(r.row, r.bucket): r.cnt for r in cms_build(a, "key").collect()}
    pb = {(r.row, r.bucket): r.cnt for r in cms_build(b, "key").collect()}
    merged = {k: pa.get(k, 0) + pb.get(k, 0) for k in set(pa) | set(pb)}
    assert merged == whole


def test_cms_bounds_under_forced_collisions(spark):
    """width 64 ≪ key cardinality forces real collisions: the hard
    never-underestimate guarantee must hold for EVERY key, and the εN
    overestimate cap (ε = e/width) for the usual 1−(1/e)^depth fraction —
    deterministic per seed since the hashes are content-derived."""
    import math
    import random
    from collections import Counter

    import pyspark.sql.functions as F

    from raptor_spark.operators.sketch import cms_build, cms_estimate

    rng = random.Random(3)
    keys = [f"k{min(int(rng.paretovariate(1.2)), 400)}" for _ in range(4000)]
    exact = Counter(keys)
    df = spark.createDataFrame([(k,) for k in keys], "key string")
    sk = cms_build(df, "key", depth=4, width=64)
    est = {
        r.key: r.est
        for r in cms_estimate(sk, df.distinct(), "key", depth=4, width=64).collect()
    }
    assert set(est) == set(exact)
    assert all(est[k] >= exact[k] for k in exact)  # hard guarantee, every key
    eps_n = math.e / 64 * len(keys)
    within = sum(1 for k in exact if est[k] - exact[k] <= eps_n)
    assert within / len(exact) >= 0.95, within / len(exact)
