"""Result-cache gates: identical queries hit (across DataFrame objects),
different queries key apart, TTL expiry recomputes, in-flight dedup computes
once — the reference's sha256-keyed read-path cache (cache_manager.py:204-297)."""

from __future__ import annotations

import threading

import pyspark.sql.functions as F

from raptor_spark.cache import QueryCache, plan_key
from tests.conftest import SF_DIR


def _q(spark, lo=100):
    return (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .filter(F.col("o_totalprice") > lo)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
    )


def test_same_query_same_key_different_query_different_key(spark):
    assert plan_key(_q(spark)) == plan_key(_q(spark))
    assert plan_key(_q(spark)) != plan_key(_q(spark, lo=200))


def test_string_literals_with_hash_digits_do_not_collide(spark):
    """Regression: a text normalization that strips #\\d+ (expression ids)
    also eats that pattern inside string LITERALS, colliding distinct
    queries into one cache entry — the canonicalized-plan key must not."""
    df = spark.read.parquet(f"{SF_DIR}/orders.parquet")

    def q(lit):
        return df.filter(F.col("o_orderpriority") == lit).select("o_orderkey")

    assert plan_key(q("a#1")) != plan_key(q("a#2"))
    assert plan_key(q("a#1")) == plan_key(q("a#1"))


def test_hit_skips_recompute_and_matches(spark, tmp_path):
    cache = QueryCache(spark, str(tmp_path / "qc"))
    first = cache.get_or_compute(_q(spark)).collect()
    again = cache.get_or_compute(_q(spark)).collect()
    assert (cache.misses, cache.hits) == (1, 1)
    assert sorted(map(tuple, first)) == sorted(map(tuple, again))
    # a different query is its own entry
    cache.get_or_compute(_q(spark, lo=200))
    assert cache.misses == 2


def test_ttl_zero_always_recomputes(spark, tmp_path):
    cache = QueryCache(spark, str(tmp_path / "qc"), ttl_s=0.0)
    cache.get_or_compute(_q(spark))
    cache.get_or_compute(_q(spark))
    assert cache.misses == 2 and cache.hits == 0


def test_inflight_dedup_computes_once(spark, tmp_path):
    cache = QueryCache(spark, str(tmp_path / "qc"))
    results = []

    def run():
        results.append(cache.get_or_compute(_q(spark)).count())

    threads = [threading.Thread(target=run) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert cache.misses == 1 and cache.hits == 3
    assert len(set(results)) == 1


def test_invalidate(spark, tmp_path):
    cache = QueryCache(spark, str(tmp_path / "qc"))
    cache.get_or_compute(_q(spark))
    cache.invalidate(_q(spark))
    cache.get_or_compute(_q(spark))
    assert cache.misses == 2


def test_hit_scaled_ttl_keeps_hot_entries(spark, tmp_path):
    """Effective TTL = ttl * (hits*mult + 1) (the reference's popularity-
    scaled expiry): with recorded hits an aged entry stays fresh; past the
    scaled horizon (or with mult = 0) it recomputes. Ages are injected into
    the marker so the test is immune to wall-clock noise."""
    import json
    import time

    from raptor_spark.cache import QueryCache, plan_key

    df = spark.range(5).selectExpr("id", "id * 3 AS v")
    key = plan_key(df)

    def _age(cache, seconds, hits):
        meta = {"key": key, "committed_at": time.time() - seconds, "hits": hits}
        with open(cache._marker(key), "w") as f:
            json.dump(meta, f)

    hot = QueryCache(spark, str(tmp_path / "hot"), ttl_s=3.0, hit_ttl_mult=4.0)
    hot.get_or_compute(df).count()            # miss, commit
    _age(hot, 5.0, hits=1)                    # older than base 3, < 3*(1*4+1)=15
    hot.get_or_compute(df).count()
    assert (hot.misses, hot.hits) == (1, 1)
    _age(hot, 20.0, hits=1)                   # beyond the scaled horizon
    hot.get_or_compute(df).count()
    assert hot.misses == 2

    cold = QueryCache(spark, str(tmp_path / "cold"), ttl_s=3.0, hit_ttl_mult=0.0)
    cold.get_or_compute(df).count()
    _age(cold, 5.0, hits=1)                   # mult=0: hits don't extend
    cold.get_or_compute(df).count()
    assert (cold.misses, cold.hits) == (2, 0)
