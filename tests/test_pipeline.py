"""Gate (d) from FIXTURES.md §4: checkpoint-restart equivalence, lineage."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from raptor_spark.pipeline import STAGES, Pipeline


@pytest.fixture(scope="module")
def run_dir(tmp_path_factory):
    return str(tmp_path_factory.mktemp("kg_out"))


@pytest.fixture(scope="module")
def first_run(spark, files_df, run_dir):
    out = Pipeline(spark, run_dir).run(files_df)
    return {
        "nodes": sorted(map(tuple, out["nodes"].collect())),
        "edges": sorted(map(tuple, out["edges"].collect())),
    }


@pytest.mark.parametrize("kill_after", ["extracted", "components", "linked", "nodes"])
def test_resume_after_stage_kill_is_equivalent(
    spark, files_df, run_dir, first_run, kill_after
):
    p = Pipeline(spark, run_dir)
    idx = STAGES.index(kill_after)
    for stage in STAGES[idx + 1 :]:
        p.catalog.drop(stage)
    out = p.run(files_df, resume=True)
    assert sorted(map(tuple, out["nodes"].collect())) == first_run["nodes"]
    assert sorted(map(tuple, out["edges"].collect())) == first_run["edges"]


def test_lineage_rows_written(spark, files_df, run_dir, first_run):
    lineage = Pipeline(spark, run_dir).catalog.read("lineage")
    stages = {r.stage for r in lineage.select("stage").distinct().collect()}
    assert set(STAGES) <= stages
    assert lineage.filter(F.col("status") != "complete").count() == 0
    # roll-ups are identical for every run over the same corpus
    per_stage = (
        lineage.groupBy("stage", "partition_id")
        .agg(F.countDistinct("input_sha256_rollup").alias("n"))
        .filter(F.col("n") > 1)
    )
    assert per_stage.count() == 0


def test_nodes_edges_shapes(spark, run_dir, first_run):
    cat = Pipeline(spark, run_dir).catalog
    nodes, edges = cat.read("nodes"), cat.read("edges")
    assert {r.kind for r in nodes.select("kind").distinct().collect()} == {
        "repo", "file", "module", "symbol", "concept",
    }
    # referential integrity: every edge endpoint is a node
    ids = nodes.select(F.col("id"))
    dangling = (
        edges.select(F.col("src").alias("id"))
        .union(edges.select(F.col("dst").alias("id")))
        .join(ids, "id", "left_anti")
    )
    assert dangling.count() == 0
    # partition columns present for pruning
    assert {"lang", "repo_bucket"} <= set(nodes.columns)
