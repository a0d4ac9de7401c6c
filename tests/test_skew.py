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
