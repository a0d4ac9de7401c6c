"""Query-result cache: skip recompute on an identical query.

The reference fronts its search read path with a sha256-keyed result cache
with TTL expiry and in-flight request dedup (raptor/qdrant_search_docker/
cache_manager.py:204-297: key = hash of the normalized query payload, Redis
GET before compute, per-key asyncio lock so concurrent identical queries
compute once). Spark-side equivalent:

* the cache key is the sha256 of the query's CANONICALIZED analyzed logical
  plan — Catalyst's own normalization maps session-local expression ids to
  deterministic ones, so two DataFrames describing the same computation
  over the same inputs key identically across sessions, and any change to
  filters, projections, literals, or input paths changes the key;
* a hit reads the materialized parquet (write-then-commit manifest, same
  discipline as the Catalog); a miss computes, materializes, commits;
* TTL: entries older than ``ttl_s`` recompute (the reference's Redis
  EXPIRE), scaled by per-entry popularity when ``hit_ttl_mult`` > 0:
  effective TTL = ``ttl_s · (entry_hits · hit_ttl_mult + 1)`` — the
  reference's hit-count-scaled expiry (cache_manager.py:204-234), so hot
  queries stay cached longer and cold ones age out on the base TTL;
* in-flight dedup: a per-key ``threading.Lock`` so concurrent identical
  queries on one driver compute once (the asyncio-lock analog; across
  drivers the write-then-commit rename keeps racers consistent — last
  commit wins, both correct).

This is a DRIVER-side read-path optimization: the cached artifact is a
plain parquet dir, so hits are distributed scans with full pushdown, and
nothing here touches executor code.
"""

from __future__ import annotations

import hashlib
import json
import os
import threading
import time

from pyspark.sql import DataFrame, SparkSession

def plan_key(df: DataFrame) -> str:
    """sha256 of the CANONICALIZED analyzed logical plan. Catalyst's
    ``canonicalized`` normalizes session-local expression ids itself, so
    the key is stable across sessions WITHOUT text munging — a regex strip
    of ``#\\d+`` would also eat that pattern inside string literals and
    collide distinct queries (``= 'a#1'`` vs ``= 'a#2'``) into one cache
    entry, silently serving the wrong result. Input parquet paths stay in
    the plan — a query over different data is a different key."""
    plan = (
        df._jdf.queryExecution().analyzed().canonicalized().toString()  # type: ignore[operator]
    )
    return hashlib.sha256(plan.encode()).hexdigest()


class QueryCache:
    def __init__(
        self,
        spark: SparkSession,
        root: str,
        ttl_s: float | None = None,
        hit_ttl_mult: float = 0.0,
    ):
        self.spark = spark
        self.root = root
        self.ttl_s = ttl_s
        self.hit_ttl_mult = hit_ttl_mult
        self.hits = 0
        self.misses = 0
        self._locks: dict[str, threading.Lock] = {}
        self._locks_guard = threading.Lock()
        os.makedirs(root, exist_ok=True)

    def _lock_for(self, key: str) -> threading.Lock:
        with self._locks_guard:
            return self._locks.setdefault(key, threading.Lock())

    def _marker(self, key: str) -> str:
        return os.path.join(self.root, f"{key}.json")

    def _data(self, key: str) -> str:
        return os.path.join(self.root, key)

    def _meta(self, key: str) -> dict | None:
        try:
            with open(self._marker(key)) as f:
                return json.load(f)
        except FileNotFoundError:
            return None

    def _write_meta(self, key: str, meta: dict) -> None:
        tmp = self._marker(key) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, self._marker(key))

    def _fresh(self, meta: dict | None) -> bool:
        if meta is None:
            return False
        if self.ttl_s is None:
            return True
        effective = self.ttl_s * (
            meta.get("hits", 0) * self.hit_ttl_mult + 1.0
        )
        return (time.time() - meta["committed_at"]) <= effective

    def get_or_compute(self, df: DataFrame) -> DataFrame:
        """Return a DataFrame equivalent to ``df``, reading the materialized
        result when a fresh cache entry exists, computing and committing it
        otherwise. Concurrent identical calls compute once."""
        key = plan_key(df)
        with self._lock_for(key):
            meta = self._meta(key)
            if self._fresh(meta):
                self.hits += 1
                meta["hits"] = meta.get("hits", 0) + 1
                self._write_meta(key, meta)
                return self.spark.read.parquet(self._data(key))
            self.misses += 1
            df.write.mode("overwrite").parquet(self._data(key))
            self._write_meta(
                key, {"key": key, "committed_at": time.time(), "hits": 0}
            )
            return self.spark.read.parquet(self._data(key))

    def invalidate(self, df: DataFrame | None = None) -> None:
        """Drop one entry (by query) or the whole cache."""
        import shutil

        if df is None:
            shutil.rmtree(self.root, ignore_errors=True)
            os.makedirs(self.root, exist_ok=True)
            return
        key = plan_key(df)
        with self._lock_for(key):
            shutil.rmtree(self._data(key), ignore_errors=True)
            try:
                os.remove(self._marker(key))
            except FileNotFoundError:
                pass
