"""Catalog versioning gates: keyed merge (idempotent upsert), snapshot
history / time travel, bounded retention — the lakeFS version_id + Qdrant
keyed-upsert semantics the reference relies on (object_store.py:208-269,
api_insert.py:88-171)."""

from __future__ import annotations

import pyspark.sql.functions as F

from raptor_spark.catalog import Catalog


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_merge_is_keyed_upsert_and_idempotent(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path))
    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], ["id", "v"]
    )
    cat.write("t", base)

    batch = spark.createDataFrame([(2, "B"), (4, "d")], ["id", "v"])
    cat.merge("t", batch, key=["id"])
    want = [(1, "a"), (2, "B"), (3, "c"), (4, "d")]
    assert _rows(cat.read("t")) == want

    # double-run: same logical table (the reference's idempotent upsert)
    cat.merge("t", batch, key=["id"])
    assert _rows(cat.read("t")) == want


def test_merge_on_missing_table_creates_it(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path))
    df = spark.createDataFrame([(1, "x")], ["id", "v"])
    cat.merge("fresh", df, key=["id"])
    assert _rows(cat.read("fresh")) == [(1, "x")]


def test_snapshot_time_travel(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path))
    v1 = spark.range(5).withColumn("tag", F.lit("v1"))
    v2 = spark.range(7).withColumn("tag", F.lit("v2"))
    m1 = cat.write("t", v1)
    m2 = cat.write("t", v2)
    assert (m1["snapshot_id"], m2["snapshot_id"]) == (0, 1)
    assert m2["parent_snapshot_id"] == 0
    # current = v2; pinned read of snapshot 0 still sees v1 after the commit
    assert cat.read("t").count() == 7
    assert cat.read("t", snapshot=0).count() == 5
    assert [m["snapshot_id"] for m in cat.snapshots("t")] == [0, 1]


def test_retention_prunes_old_snapshots(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path), keep_snapshots=2)
    for i in range(4):
        cat.write("t", spark.range(i + 1))
    ids = [m["snapshot_id"] for m in cat.snapshots("t")]
    assert ids == [2, 3]
    assert cat.read("t").count() == 4
    assert cat.read("t", snapshot=2).count() == 3


def test_compact_preserves_rows_and_shrinks_files(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path))
    df = spark.range(1000).repartition(16).withColumn("k", F.col("id") % 3)
    cat.write("t", df)
    for _ in range(3):  # simulate append churn → many small files
        cat.append("t", spark.range(50).withColumn("k", F.col("id") % 3))
    before_rows = _rows(cat.read("t"))
    before_files = len(cat.data_files("t"))
    m = cat.compact("t")
    assert _rows(cat.read("t")) == before_rows
    assert len(cat.data_files("t")) < before_files
    # previous (uncompacted) snapshot still time-travelable
    assert _rows(cat.read("t", snapshot=m["parent_snapshot_id"])) == before_rows


def test_compact_partitioned_one_file_per_dir(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path))
    df = spark.range(300).repartition(12).withColumn("k", (F.col("id") % 4).cast("int"))
    cat.write("t", df, partition_by=["k"])
    cat.compact("t")
    files = cat.data_files("t")
    import os
    per_dir: dict[str, int] = {}
    for f in files:
        per_dir[os.path.dirname(f)] = per_dir.get(os.path.dirname(f), 0) + 1
    assert per_dir and all(n == 1 for n in per_dir.values())
    assert cat.read("t").count() == 300


def test_append_then_write_preserves_history(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path))
    cat.append("log", spark.range(3))
    cat.append("log", spark.range(2))
    assert cat.read("log").count() == 5  # event-log append, same snapshot
    cat.write("log", spark.range(1))
    assert cat.read("log").count() == 1
    assert cat.read("log", snapshot=0).count() == 5


def test_diff_snapshots_reports_insert_delete_update(spark, tmp_path):
    from raptor_spark.catalog import Catalog, diff_snapshots

    cat = Catalog(spark, str(tmp_path), keep_snapshots=3)
    v1 = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], ["k", "s", "v"]
    )
    cat.write("t", v1)
    s1 = cat.manifest("t")["snapshot_id"]
    v2 = spark.createDataFrame(
        [(2, "b", 20), (3, "c", 99), (4, "d", 40)], ["k", "s", "v"]
    )
    cat.write("t", v2)

    got = {
        r["k"]: r["op"]
        for r in diff_snapshots(cat, "t", ["k"], old_snapshot=s1).collect()
    }
    assert got == {1: "delete", 3: "update", 4: "insert"}


def test_diff_snapshots_identical_is_empty(spark, tmp_path):
    from raptor_spark.catalog import Catalog, diff_snapshots

    cat = Catalog(spark, str(tmp_path), keep_snapshots=3)
    df = spark.createDataFrame([(1, "a"), (2, None)], ["k", "s"])
    cat.write("t", df)
    s1 = cat.manifest("t")["snapshot_id"]
    cat.write("t", spark.createDataFrame([(2, None), (1, "a")], ["k", "s"]))
    assert diff_snapshots(cat, "t", ["k"], old_snapshot=s1).count() == 0
