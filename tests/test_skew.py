"""Salted-join semantics: identical to the plain equi-join, while spreading
each hot key across n_salts shuffle sub-keys (north_rule skew handling)."""

from __future__ import annotations

import pyspark.sql.functions as F

from raptor_spark.operators.skew import salt_col, salted_join


def test_salted_join_equals_plain_join(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    dim = ev.select("event_type").distinct().withColumn(
        "w", F.length("event_type").cast("double")
    )
    plain = ev.join(dim, "event_type").select("event_id", "w")
    salted = salted_join(ev, dim, on=["event_type"], n_salts=16).select("event_id", "w")
    assert plain.count() == salted.count()
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0


def test_salt_spreads_hot_key(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    hot = ev.filter(F.col("event_type") == "click")
    n = hot.select(
        salt_col([c for c in ev.columns if c != "event_type"], 16).alias("s")
    ).select(F.countDistinct("s")).first()[0]
    assert n == 16  # every salt bucket populated → hot key fans out 16-way


def test_salted_left_join_keeps_unmatched(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    dim = (
        ev.select("event_type").distinct()
        .filter(F.col("event_type") != "click")
        .withColumn("w", F.lit(1.0))
    )
    out = salted_join(ev, dim, on=["event_type"], n_salts=8, how="left")
    assert out.count() == ev.count()
    assert out.filter(F.col("w").isNull()).count() == ev.filter(
        F.col("event_type") == "click"
    ).count()


def test_bucketized_range_join_equals_direct(spark):
    """bucketize turns the theta range join into an equi-join on bucket id;
    after pair-dedup the result must equal the direct range join (the
    big x big scale path for interval joins, interval_join.py docstring)."""
    import pyspark.sql.functions as F
    from raptor_spark.operators.interval_join import bucketize, overlap_col

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ts = F.col("ts").cast("timestamp").cast("double")
    left = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("lid"), "user_id",
        ts.alias("start"), (ts + 600.0).alias("end"),
    )
    right = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("rid"), "user_id",
        ts.alias("start"), (ts + 600.0).alias("end"),
    )

    direct = (
        left.alias("l").join(
            right.alias("r"),
            (F.col("l.user_id") == F.col("r.user_id"))
            & (F.col("l.start") < F.col("r.end"))
            & (F.col("r.start") < F.col("l.end")),
        ).select("lid", "rid")
    )

    width = 900.0
    lb = bucketize(left, "start", "end", width)
    rb = bucketize(right, "start", "end", width)
    bucketed = (
        lb.alias("l").join(
            rb.alias("r"),
            (F.col("l.user_id") == F.col("r.user_id"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.start") < F.col("r.end"))
            & (F.col("r.start") < F.col("l.end")),
        ).select("lid", "rid").distinct()
    )

    d = {(r.lid, r.rid) for r in direct.collect()}
    b = {(r.lid, r.rid) for r in bucketed.collect()}
    assert d == b and len(d) > 0
