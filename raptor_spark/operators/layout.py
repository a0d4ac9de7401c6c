"""Multi-dimensional data layout: Z-order (Morton) clustering keys and the
file-skipping audit that proves why they matter.

Reference parity: the reference's payload-index creation pins a sort order
per collection so range lookups touch few segments
(qdrant_search_docker/indexer/payload_index.py — single-column order). At
100 TB a SINGLE sort column only prunes predicates on that column; a box
predicate on (customer, date) scans every file once the data is laid out
by customer alone. Interleaving the bits of both columns (Morton / Z-order
— the Delta Lake ``OPTIMIZE ZORDER BY`` idea) bounds BOTH min/max ranges
per file, so the same per-file stats prune both dimensions.

Scale path: the layout write is ``df.repartitionByRange(N, morton_key)``
followed by a parquet write — range boundaries come from Spark's sampled
range partitioner (no global sort of payload rows), and parquet's
footer min/max stats per file are the zone map. The audit here replays the
layout deterministically (row_number over the key, exact integer bucket
assignment) on a bounded slice so the bucket stats are reproducible
cross-engine; everything is integer arithmetic end-to-end — no floats,
no sampling — so the DuckDB oracle replays it bit-for-bit.

All bit-twiddling uses the classic 16→32-bit magic-number spread
(x | x<<8) & 0x00FF00FF … so both engines run four shift/mask steps per
axis instead of a 16-step loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (shift, mask) steps spreading a 16-bit int so its bits occupy the even
# positions of a 32-bit int. Shared with the oracle-SQL generator in
# __spark_entry__.py — one source of truth for both engines.
SPREAD_STEPS = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)


def _spread16(col: Column) -> Column:
    out = col
    for shift, mask in SPREAD_STEPS:
        out = (out.bitwiseOR(F.shiftleft(out, shift))).bitwiseAND(F.lit(mask))
    return out


def scale_to_u16(col: Column, lo: Column, hi: Column) -> Column:
    """Exact integer rescale of ``col`` from [lo, hi] onto [0, 65535]:
    ((v - lo) * 65535) DIV (hi - lo). Computed as (num - pmod(num, den))
    / den so the division is exact (numerator divisible by denominator —
    the double quotient is the true integer, no floor-edge risk). Integer
    in, integer out — both engines produce identical keys."""
    num = ((col - lo) * F.lit(65535)).cast("long")
    den = (hi - lo).cast("long")
    return F.when(den <= 0, F.lit(0).cast("long")).otherwise(
        ((num - F.pmod(num, den)) / den).cast("long")
    )


def morton_key(x16: Column, y16: Column) -> Column:
    """Interleave two 16-bit integer columns into one 32-bit Morton key
    (x in even bit positions, y in odd)."""
    return _spread16(x16).bitwiseOR(F.shiftleft(_spread16(y16), 1))


def layout_buckets(
    df: DataFrame,
    key: Column,
    id_col: str,
    n_buckets: int,
) -> DataFrame:
    """Assign each row to its layout bucket under a total order by
    ``(key, id_col)`` — bucket b = ((rn-1) * n_buckets) DIV n, the exact
    integer form of "n_buckets equal files", deterministic under ties.

    The global window is the AUDIT's replay of what the write path does
    with ``repartitionByRange`` + per-file stats; it exists so the bucket
    boundaries are bit-reproducible against the SQL oracle, and is meant
    for bounded audit slices (the production write never ranks globally).
    """
    from pyspark.sql import Window

    n = df.count()
    w = Window.orderBy(key.asc(), F.col(id_col).asc())
    num = ((F.row_number().over(w) - F.lit(1)) * F.lit(n_buckets)).cast("long")
    den = F.lit(n).cast("long")
    return df.withColumn(
        "bucket", ((num - F.pmod(num, den)) / den).cast("long")
    )


def write_bucketed_table(
    df: DataFrame,
    name: str,
    path: str,
    n_buckets: int,
    keys: list[str],
    sort_keys: list[str] | None = None,
) -> DataFrame:
    """Persist ``df`` as a hash-BUCKETED (and per-bucket sorted) parquet
    table registered in the session catalog, and return the re-read frame.

    Why it exists: two tables bucketed by the same key with the same bucket
    count join WITHOUT either side shuffling — the scan's output
    partitioning already satisfies the join's distribution requirement —
    and a groupBy on the bucket key aggregates exchange-free too
    (tests/test_plans.py pins both: zero Exchange operators in the physical
    plan). At 100 TB this is the difference between re-shuffling the big
    fact table on EVERY join of a recurring pipeline and paying the
    layout's single shuffle once at write time — the co-located-join twin
    of ivf_write_index's partition pruning. ≙ the reference's per-collection
    payload-index layout (qdrant_search_docker/indexer/payload_index.py),
    generalized to any equi-join key.

    The frame is repartitioned onto the bucket key with exactly
    ``n_buckets`` partitions first: Spark's repartition hash and its bucket
    hash are the same Murmur3-pmod, so each task owns exactly one bucket
    and each bucket lands in ONE file — the layout under which readers can
    also trust the per-bucket ``sort_keys`` order."""
    spark = df.sparkSession
    w = (
        df.repartition(n_buckets, *[F.col(k) for k in keys])
        .write.mode("overwrite")
        .format("parquet")
        .option("path", path)
        .bucketBy(n_buckets, *keys)
    )
    if sort_keys:
        w = w.sortBy(*sort_keys)
    w.saveAsTable(name)
    return spark.table(name)


def skipping_audit(
    bucketed: DataFrame,
    layout_name: str,
    x_col: str,
    y_col: str,
    x_lo: int,
    x_hi: int,
    y_lo: int,
    y_hi: int,
) -> DataFrame:
    """Zone-map pruning audit for one layout: per-bucket min/max of both
    axes (what a parquet footer would store), then — for the given box
    predicate — how many buckets survive pruning and how many rows those
    buckets force the scan to read vs. the rows that actually match.

    Returns one row: (layout, n_buckets, buckets_hit, rows_scanned,
    rows_matching). Lower rows_scanned at equal rows_matching = better
    layout. Pure integer aggregation — exact on both engines.
    """
    x, y = F.col(x_col), F.col(y_col)
    match = (
        (x >= F.lit(x_lo)) & (x <= F.lit(x_hi)) & (y >= F.lit(y_lo)) & (y <= F.lit(y_hi))
    )
    per_bucket = bucketed.groupBy("bucket").agg(
        F.min(x).alias("x_min"),
        F.max(x).alias("x_max"),
        F.min(y).alias("y_min"),
        F.max(y).alias("y_max"),
        F.count("*").alias("n_rows"),
        F.sum(match.cast("long")).alias("n_match"),
    )
    hit = (
        (F.col("x_min") <= F.lit(x_hi))
        & (F.col("x_max") >= F.lit(x_lo))
        & (F.col("y_min") <= F.lit(y_hi))
        & (F.col("y_max") >= F.lit(y_lo))
    )
    return per_bucket.agg(
        F.lit(layout_name).alias("layout"),
        F.count("*").alias("n_buckets"),
        F.sum(hit.cast("long")).alias("buckets_hit"),
        F.sum(F.when(hit, F.col("n_rows")).otherwise(F.lit(0))).alias("rows_scanned"),
        F.sum("n_match").alias("rows_matching"),
    )
