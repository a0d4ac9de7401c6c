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


def test_incremental_run_equals_full_run(
    spark, corpus_rows, files_df, run_dir, first_run, tmp_path_factory
):
    """v2 corpus = v1 minus 20 files, 10 modified, 20 new. An incremental
    run against v1's output must (a) extract ONLY the 30 changed/new files,
    (b) produce byte-identical extracted/nodes/edges to a from-scratch run
    on v2 — the checksum short-circuit as a correctness-preserving
    optimization."""
    from raptor_spark.schemas import FILES_SCHEMA

    v2 = [dict(r) for r in corpus_rows[:-20]]
    for r in v2[:10]:
        r["content"] = (r["content"] or "") + "\n# touched in v2\n"
    for i in range(20):
        v2.append(
            {
                "repo": "orgv2/newrepo",
                "path": f"src/new_mod_{i}.py",
                "commit": "f" * 8,
                "lang": "python",
                "content": f"import os\n\ndef brand_new_fn_{i}(x):\n    return os.path.join(x, '{i}')\n",
            }
        )
    v2_df = spark.createDataFrame(v2, schema=FILES_SCHEMA).repartition(8).persist()

    full_dir = str(tmp_path_factory.mktemp("kg_v2_full"))
    inc_dir = str(tmp_path_factory.mktemp("kg_v2_inc"))
    full = Pipeline(spark, full_dir).run(v2_df)
    p_inc = Pipeline(spark, inc_dir)
    inc = p_inc.run(v2_df, incremental_from=run_dir)

    assert p_inc.incremental_stats["files_extracted"] == 30
    assert p_inc.incremental_stats["files_total"] == len(v2)
    for table in ("extracted", "nodes", "edges"):
        a, b = full[table], inc[table]
        assert a.count() == b.count(), table
        assert a.exceptAll(b).count() == 0, table
        assert b.exceptAll(a).count() == 0, table
    v2_df.unpersist()


def test_incremental_lang_change_reextracts(spark, tmp_path_factory):
    """lang is part of the reuse key: a file whose lang metadata changes with
    content and path unchanged must re-extract, or the incremental run keeps
    stale-lang triples and diverges from a from-scratch run."""
    from raptor_spark.catalog import Catalog
    from raptor_spark.extract import extract_triples
    from raptor_spark.schemas import FILES_SCHEMA

    v1 = [
        {"repo": "o/r", "path": "a.py", "commit": "c" * 8, "lang": "python",
         "content": "import os\n\ndef f(arg):\n    return arg\n"},
        {"repo": "o/r", "path": "b.py", "commit": "c" * 8, "lang": "python",
         "content": "def g(arg):\n    return arg\n"},
    ]
    f1 = spark.createDataFrame(v1, schema=FILES_SCHEMA)
    prev = str(tmp_path_factory.mktemp("prev"))
    Catalog(spark, prev).write("extracted", extract_triples(f1))

    v2 = [dict(r) for r in v1]
    v2[0]["lang"] = "js"  # metadata-only change
    f2 = spark.createDataFrame(v2, schema=FILES_SCHEMA)
    p = Pipeline(spark, str(tmp_path_factory.mktemp("inc")))
    inc = p.incremental_triples(f2, prev)
    full = extract_triples(f2)
    assert p.incremental_stats["files_extracted"] == 1
    assert inc.exceptAll(full).count() == 0
    assert full.exceptAll(inc).count() == 0


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


def test_failed_stage_preserves_completed_lineage(
    spark, files_df, tmp_path_factory, monkeypatch
):
    """A stage failure must still flush the COMPLETED stages' stashed
    lineage rows (the batched flush's crash-path contract)."""
    import raptor_spark.pipeline as pl

    out_dir = str(tmp_path_factory.mktemp("kg_fail"))

    def boom(triples, **kwargs):
        raise RuntimeError("injected link failure")

    monkeypatch.setattr(pl, "link_edges", boom)
    p = Pipeline(spark, out_dir)
    with pytest.raises(RuntimeError, match="injected link failure"):
        p.run(files_df)
    lineage = p.catalog.read("lineage")
    stages = {r.stage for r in lineage.select("stage").distinct().collect()}
    assert stages == {"extracted"}
