"""Semantic gates for the gaps-and-islands value-run operator and SCD-2
change-log compaction (operators/relational.value_runs / scd2_compact) on
hand-checkable fixtures, including the tie case that forced run_seq: adjacent
runs starting on the same day-resolution timestamp."""

from __future__ import annotations

import pyspark.sql.functions as F

from raptor_spark.operators.relational import scd2_compact, value_runs


def _log(spark, rows):
    return spark.createDataFrame(rows, "k long, t double, seq long, v string")


def test_value_runs_basic(spark):
    df = _log(
        spark,
        [
            (1, 1.0, 1, "a"),
            (1, 2.0, 2, "a"),
            (1, 3.0, 3, "b"),
            (1, 4.0, 4, "a"),
            (2, 1.0, 5, "x"),
        ],
    )
    runs = value_runs(df, ["k"], "t", "v", tiebreak=["seq"])
    got = sorted(
        (r.k, r.run_seq, r.v, r.run_start, r.run_end, r.run_len)
        for r in runs.collect()
    )
    assert got == [
        (1, 1, "a", 1.0, 2.0, 2),
        (1, 2, "b", 3.0, 3.0, 1),
        (1, 3, "a", 4.0, 4.0, 1),
        (2, 1, "x", 1.0, 1.0, 1),
    ]


def test_value_runs_tied_timestamps_use_tiebreak(spark):
    # same t for every row: runs are defined purely by seq order
    df = _log(
        spark,
        [(1, 5.0, 1, "a"), (1, 5.0, 2, "b"), (1, 5.0, 3, "b"), (1, 5.0, 4, "a")],
    )
    runs = value_runs(df, ["k"], "t", "v", tiebreak=["seq"])
    got = sorted((r.run_seq, r.v, r.run_len) for r in runs.collect())
    assert got == [(1, "a", 1), (2, "b", 2), (3, "a", 1)]


def test_scd2_compact_half_open_intervals(spark):
    df = _log(
        spark,
        [
            (1, 1.0, 1, "P"),
            (1, 2.0, 2, "P"),
            (1, 4.0, 3, "O"),
            (1, 9.0, 4, "F"),
        ],
    )
    out = scd2_compact(df, ["k"], "t", "v", tiebreak=["seq"])
    got = sorted(
        (r.v, r.valid_from, r.valid_to, r.n_rows) for r in out.collect()
    )
    assert got == [("F", 9.0, None, 1), ("O", 4.0, 9.0, 1), ("P", 1.0, 4.0, 2)]


def test_scd2_compact_same_day_version_flips_stay_ordered(spark):
    # three versions all starting at t=1.0 — valid_to must chain by sequence
    # position, not by (ambiguous) start timestamp
    df = _log(
        spark,
        [(1, 1.0, 1, "P"), (1, 1.0, 2, "O"), (1, 1.0, 3, "P"), (1, 2.0, 4, "P")],
    )
    out = scd2_compact(df, ["k"], "t", "v", tiebreak=["seq"])
    # runs: P(seq1), O(seq2), P(seq3..4)
    chain = {(r.v, r.valid_from, r.valid_to, r.n_rows) for r in out.collect()}
    assert chain == {("P", 1.0, 1.0, 1), ("O", 1.0, 1.0, 1), ("P", 1.0, None, 2)}


def test_value_runs_single_exchange_plan(spark):
    # both windows and the groupBy share the (k)-prefixed keys: Catalyst
    # should plan ONE exchange for the whole operator
    df = _log(spark, [(1, float(i), i, "ab"[i % 2]) for i in range(20)])
    runs = value_runs(df, ["k"], "t", "v", tiebreak=["seq"])
    plan = runs._jdf.queryExecution().executedPlan().toString()
    n_exchanges = plan.count("Exchange")
    assert n_exchanges <= 2, plan
