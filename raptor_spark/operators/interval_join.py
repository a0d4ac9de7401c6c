"""Interval/range joins — the reference's most interesting relational content,
hand-rolled there as O(n·m) nested loops over in-memory lists (SURVEY.md §2.3).

* interval_overlap_argmax_join — ASR×diarization speaker assignment:
  for each left segment pick the right segment with MAX time overlap
  (svc/audio_orchestrator_service/kafka_handler.py:60-62 overlap formula,
  :106-117 argmax; duplicate impl svc/audio_analysis_service/result_merger.py:22-96).
* interval_semi_label_join — labels of all right windows overlapping a left
  segment above a probability threshold, set-deduped
  (kafka_handler.py:64-86).

Scale strategy: a raw range join is a cartesian-per-key plan, fine when one
side is small/broadcastable. For two big sides use ``bucketize`` first: bin
both sides by fixed time buckets (explode intervals to the buckets they touch,
equi-join on bucket, dedup) — turns the theta-join into an equi-join that
shuffles on bucket id, the same trick the extractor uses for line-span
containment.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def overlap_col(s1: Column, e1: Column, s2: Column, e2: Column) -> Column:
    """max(0, min(e1,e2) - max(s1,s2)) — the reference's time_overlap lambda
    (kafka_handler.py:60-62), as a codegen-friendly column expression."""
    return F.greatest(F.least(e1, e2) - F.greatest(s1, s2), F.lit(0.0))


def interval_overlap_argmax_join(
    left: DataFrame,
    right: DataFrame,
    left_keys: list[str],
    left_id: str,
    right_payload: list[str],
    l_start: str = "start",
    l_end: str = "end",
    r_start: str = "start",
    r_end: str = "end",
    broadcast_right: bool = False,
    bucket_width: float | None = None,
) -> DataFrame:
    """For each left row, attach the right row with maximum interval overlap
    (ties broken by right start then payload for determinism); left rows with
    no overlapping right row keep nulls (left-outer, ≙ the reference's
    speaker='' default, result_merger.py:111-142).

    With ``bucket_width``, both sides are exploded onto fixed time buckets
    and the join runs as an equi-join on (keys, bucket) + range residual —
    the big×big scale path: without it the range join is a per-key
    cartesian before the argmax, and one hot key at 100× corpus size pins
    its entire expansion on a single task. Bucket duplicates (a pair meeting
    in several buckets) are identical rows; the argmax row_number collapses
    them, so the result is unchanged (parity: tests/test_skew.py). Pick
    ``bucket_width`` ≈ the typical interval length: each interval then
    lands in ≤ 2-3 buckets (bounded row inflation) while each bucket pairs
    only time-adjacent rows."""
    if bucket_width is not None and not broadcast_right:
        lt = bucketize(left, l_start, l_end, bucket_width, out="_bk").alias("l")
        rt = bucketize(right, r_start, r_end, bucket_width, out="_bk").alias("r")
        cond = F.col("l._bk") == F.col("r._bk")
    else:
        lt, rt = left.alias("l"), right.alias("r")
        if broadcast_right:
            rt = F.broadcast(rt)
        cond = F.lit(True)
    cond = cond & (F.col(f"l.{l_start}") < F.col(f"r.{r_end}")) & (
        F.col(f"r.{r_start}") < F.col(f"l.{l_end}")
    )
    for k in left_keys:
        cond = cond & (F.col(f"l.{k}") == F.col(f"r.{k}"))
    # overlap is NULL when the right side is absent — greatest/least SKIP
    # null arguments (Spark and DuckDB both), so the raw formula silently
    # evaluates to the left interval's own length on null-extended rows;
    # harmless on a direct left join (every engine agrees) but fatal on the
    # bucketized path, where a matched left row ALSO carries null-extended
    # duplicates from its other buckets that would out-rank a partial match
    ov = F.when(
        F.col(f"r.{r_start}").isNotNull(),
        overlap_col(
            F.col(f"l.{l_start}"), F.col(f"l.{l_end}"),
            F.col(f"r.{r_start}"), F.col(f"r.{r_end}"),
        ),
    )
    joined = lt.join(rt, cond, "left").select(
        "l.*",
        *[F.col(f"r.{c}").alias(c) for c in right_payload],
        ov.alias("overlap"),
    )
    if bucket_width is not None and not broadcast_right:
        joined = joined.drop("_bk")
    w = (
        Window.partitionBy(F.col(left_id))
        .orderBy(
            F.desc_nulls_last("overlap"),
            *[F.asc(c) for c in right_payload],
        )
    )
    return (
        joined.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def interval_semi_label_join(
    left: DataFrame,
    right: DataFrame,
    left_keys: list[str],
    left_id: str,
    label_col: str,
    prob_col: str,
    threshold: float,
    l_start: str = "start",
    l_end: str = "end",
    r_start: str = "start",
    r_end: str = "end",
    bucket_width: float | None = None,
) -> DataFrame:
    """Set-deduped labels of all right windows overlapping each left segment
    with probability above threshold (kafka_handler.py:64-86): range join →
    filter → collect_set, returned sorted for determinism.

    ``bucket_width`` enables the same bucketized equi-join scale path as
    interval_overlap_argmax_join; bucket duplicates are absorbed by the
    collect_set dedup."""
    if bucket_width is not None:
        lt = bucketize(left, l_start, l_end, bucket_width, out="_bk").alias("l")
        rt = bucketize(right, r_start, r_end, bucket_width, out="_bk").alias("r")
        cond = F.col("l._bk") == F.col("r._bk")
    else:
        lt, rt = left.alias("l"), right.alias("r")
        cond = F.lit(True)
    cond = cond & (F.col(f"l.{l_start}") < F.col(f"r.{r_end}")) & (
        F.col(f"r.{r_start}") < F.col(f"l.{l_end}")
    )
    for k in left_keys:
        cond = cond & (F.col(f"l.{k}") == F.col(f"r.{k}"))
    return (
        lt.join(rt, cond, "inner")
        .filter(F.col(f"r.{prob_col}") > threshold)
        .groupBy(F.col(f"l.{left_id}").alias(left_id))
        .agg(
            F.array_sort(F.collect_set(F.col(f"r.{label_col}"))).alias("labels")
        )
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    l_ts: str,
    r_ts: str,
    right_payload: list[str],
    tolerance: float | None = None,
) -> DataFrame:
    """As-of (backward) join: attach to each left row the LAST right row with
    ``r_ts <= l_ts`` per key — the point-in-time lookup the reference does as
    latest-version-before-date (asset_management/database.py:146-182's
    ORDER BY DESC LIMIT 1, generalized to per-event time).

    Scale shape: NOT a range join (which is per-key cartesian before the
    argmax). Union both sides tagged by origin, ONE shuffle/sort of the
    combined stream on (keys), then ``last(payload, ignoreNulls)`` over the
    running window carries each right value forward to the left rows it
    covers (plus one small agg shuffle of the right side alone for the
    per-(keys, ts) dedup). O(n log n) per key partition, no candidate
    blow-up, AQE-skew-splittable.

    Right rows sharing (keys, ts) are deterministically reduced to the one
    with max payload tuple before the union. With ``tolerance``, matches
    older than ``l_ts - tolerance`` are nulled out (the join stays left-outer).
    """
    payload = [f"_r_{c}" for c in right_payload]
    r = right.select(
        *keys,
        F.col(r_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.struct(
            F.col(r_ts).alias("_matched_ts"),
            *[F.col(c).alias(p) for c, p in zip(right_payload, payload)],
        ).alias("_pl"),
    )
    # one right row per (keys, ts): deterministic argmax on the payload struct
    r = r.groupBy(*keys, "_ts", "_side").agg(F.max("_pl").alias("_pl"))
    l_cols = left.columns
    lt = left.select(
        "*",
        F.col(l_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_pl"].dataType).alias("_pl"),
    )
    merged = lt.unionByName(r.select(
        *keys, "_ts", "_side", "_pl",
        *[F.lit(None).cast(lt.schema[c].dataType).alias(c)
          for c in l_cols if c not in keys],
    ))
    w = (
        Window.partitionBy(*keys)
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        merged.withColumn("_carry", F.last("_pl", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
    )
    if tolerance is not None:
        out = out.withColumn(
            "_carry",
            F.when(
                F.col("_carry._matched_ts") >= F.col("_ts") - F.lit(tolerance),
                F.col("_carry"),
            ),
        )
    return out.select(
        *l_cols,
        F.col("_carry._matched_ts").alias("matched_ts"),
        *[F.col(f"_carry.{p}").alias(c) for c, p in zip(right_payload, payload)],
    )


def bucketize(
    df: DataFrame, start: str, end: str, bucket_width: float, out: str = "bucket"
) -> DataFrame:
    """Explode each interval onto every fixed-width bucket it touches —
    equi-join enabler for big×big range joins. Caller dedups matches after
    the bucket join (same pair can meet in several buckets)."""
    return df.withColumn(
        out,
        F.explode(
            F.sequence(
                F.floor(F.col(start) / bucket_width),
                F.floor(F.col(end) / bucket_width),
            )
        ),
    )
