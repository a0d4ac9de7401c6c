"""Sketch aggregates — the mergeable-summary layer a 100 TB pipeline needs.

The reference keeps exact per-collection counts in MySQL (api_insert.py
grouped insert counts) and has no approximate layer; at 10^12 rows exact
distinct counts / quantiles per dimension are a full shuffle of the key
domain, so the scale path is sketches whose partial states MERGE:

* hll_rollup         — Datasketches HLL per fine group, re-aggregated to a
                       coarse group by sketch UNION (never re-touching raw
                       rows) — same partial-reuse shape as
                       relational.rollup_time_hierarchy.
* approx_distinct    — approx_count_distinct (HyperLogLog++), map-side
                       combinable.
* approx_quantiles   — percentile_approx (KLL-like), map-side combinable.

Accuracy is engine-specific, so these carry no DuckDB oracle; the pytest
gate bounds relative error against exact answers on the driver testdata
(tests/test_sketch.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def approx_distinct(
    df: DataFrame, keys: list[str], col: str, rsd: float = 0.02
) -> DataFrame:
    """(keys, approx_distinct): HyperLogLog++ distinct estimate per group —
    one map-side-combinable shuffle regardless of key cardinality."""
    return df.groupBy(*keys).agg(
        F.approx_count_distinct(col, rsd).alias("approx_distinct")
    )


def hll_rollup(
    df: DataFrame,
    fine_keys: list[str],
    coarse_keys: list[str],
    col: str,
    lg_k: int = 14,
) -> DataFrame:
    """Distinct-count rollup via mergeable HLL sketches: build one sketch per
    fine group, then UNION the fine sketches up to the coarse grouping —
    the raw rows are scanned once; the coarse level aggregates only
    len(fine_groups) sketch blobs. Returns the coarse estimates.

    ``coarse_keys`` must be a prefix/subset of ``fine_keys``.
    """
    fine = df.groupBy(*fine_keys).agg(
        F.hll_sketch_agg(col, F.lit(lg_k)).alias("sk")
    )
    return (
        fine.groupBy(*coarse_keys)
        .agg(F.hll_union_agg("sk").alias("sk"))
        .select(
            *coarse_keys,
            F.hll_sketch_estimate("sk").alias("approx_distinct"),
        )
    )


def approx_quantiles(
    df: DataFrame,
    keys: list[str],
    col: str,
    probs: list[float] = (0.5, 0.9, 0.99),
    accuracy: int = 10000,
) -> DataFrame:
    """(keys, q_<p>...): per-group approximate quantiles in ONE pass /
    shuffle (vs one full sort per group exact) — the adaptive-threshold
    pattern (scene_detection.py:137-144) at a scale where exact
    ``percentile`` would sort the world."""
    arr = F.percentile_approx(
        col, F.array(*[F.lit(p) for p in probs]), F.lit(accuracy)
    )
    out = df.groupBy(*keys).agg(arr.alias("_q"))
    return out.select(
        *keys,
        *[
            F.col("_q")[i].alias(f"q_{str(p).replace('.', '_')}")
            for i, p in enumerate(probs)
        ],
    )


def _cms_probe_col(key, depth: int, width: int):
    """array<struct<row,bucket>>: the depth (row, bucket) coordinates of a
    key — bucket_r = xxhash64(key, seed=r) % width, pure column exprs."""
    return F.array(
        *[
            F.struct(
                F.lit(r).alias("row"),
                F.pmod(F.xxhash64(key, F.lit(r)), F.lit(width)).alias("bucket"),
            )
            for r in range(depth)
        ]
    )


def cms_build(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """(row, bucket, cnt): count-min sketch of a key stream — ``depth``
    independent hash rows (xxhash64 seeded by row index) × ``width``
    buckets. ONE scan + one map-side-combinable shuffle bounded by
    depth×width rows, whatever the key cardinality — the heavy-hitter
    summary a 10^12-row stream can afford where exact per-key counts
    cannot. Partial sketches MERGE by bucket-wise addition (same property
    the groupBy already exploits), so per-day sketches roll up to a month
    without re-touching raw rows."""
    return (
        df.select(F.explode(_cms_probe_col(F.col(key_col), depth, width)).alias("p"))
        .groupBy(F.col("p.row").alias("row"), F.col("p.bucket").alias("bucket"))
        .agg(F.count("*").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    keys_df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """(key, est): count-min point estimates for candidate keys — min over
    the key's depth buckets; never underestimates, overestimates by at
    most εN (ε ≈ e/width) with prob. 1−(1/2)^depth. The sketch is
    depth×width rows (broadcast-sized at any corpus scale); probes join it
    on (row, bucket) — the candidate set stays key-cardinality-sized and
    the raw stream is never re-read."""
    probes = keys_df.select(
        F.col(key_col).alias("key"),
        F.explode(_cms_probe_col(F.col(key_col), depth, width)).alias("p"),
    ).select("key", F.col("p.row").alias("row"), F.col("p.bucket").alias("bucket"))
    return (
        probes.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .fillna(0, subset=["cnt"])
        .groupBy("key")
        .agg(F.min("cnt").alias("est"))
    )
