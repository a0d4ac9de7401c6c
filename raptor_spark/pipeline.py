"""Stage driver with checkpoint-restart.

The reference resumes work from a Redis-held per-request step machine
({step: analysis → summary → save → complete},
svc/document_orchestrator_service/kafka_handler.py:186-204, 276-431). Here the
same resumability comes from stage-boundary table commits: each stage writes
its output table + lineage rows, and ``run(..., resume=True)`` skips any stage
whose output manifest is already committed AND whose recorded input roll-up
still matches the current input (so a changed corpus invalidates downstream
checkpoints instead of silently reusing them).

Stages:
  extracted  — triples (extract.extract_triples)
  components — (name, component) from LSH link + connected components
  linked     — triples + canonical columns
  nodes / edges — final graph, partitioned (lang, repo_bucket)

Run:  python -m raptor_spark.pipeline --input <files.parquet> --output <dir>
      [--resume] [--master local[8]]
"""

from __future__ import annotations

import argparse
import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from raptor_spark.catalog import Catalog
from raptor_spark.cc import connected_components
from raptor_spark.extract import extract_triples
from raptor_spark.lineage import StageTimer, input_rollup, new_run_id, stage_lineage
from raptor_spark.link import apply_linking, canonical_mapping, link_edges
from raptor_spark.materialize import build_edges, build_nodes
from raptor_spark.schemas import FILES_SCHEMA

STAGES = ("extracted", "components", "linked", "nodes", "edges")


def _corpus_fingerprint(rollup: DataFrame) -> str:
    """Global order-insensitive fingerprint of the input corpus (sha256 of
    sorted per-bucket roll-ups) — the cross-stage validity key."""
    rows = rollup.select("input_sha256_rollup").collect()
    import hashlib

    h = hashlib.sha256()
    for r in sorted(x.input_sha256_rollup for x in rows):
        h.update(r.encode())
    return h.hexdigest()


class Pipeline:
    def __init__(self, spark: SparkSession, output_dir: str):
        self.spark = spark
        self.catalog = Catalog(spark, output_dir)
        self.run_id = new_run_id()

    def _stage_valid(self, stage: str, fingerprint: str, resume: bool) -> bool:
        if not resume or not self.catalog.exists(stage):
            return False
        return self.catalog.manifest(stage).get("input_fingerprint") == fingerprint

    def _commit(
        self,
        stage: str,
        df: DataFrame,
        files: DataFrame,
        fingerprint: str,
        timer: StageTimer,
        partition_by: list[str] | None = None,
        lineage_triples: DataFrame | None = None,
        cluster_for_write: bool = False,
    ) -> DataFrame:
        if cluster_for_write and partition_by:
            # final graph tables: hash-cluster rows by the partition columns
            # so each output directory is written by one task instead of
            # every task writing every directory (64 tasks × 64 dirs of
            # ~20-row files measured 18s of commit churn on the edges stage).
            # NOT done for the big pred-partitioned triple tables — there the
            # extra full shuffle costs more than the committer saves.
            df = df.repartition(*[F.col(c) for c in partition_by])
        self.catalog.write(
            stage, df, partition_by=partition_by, meta={"input_fingerprint": fingerprint}
        )
        out = self.catalog.read(stage)
        self.catalog.append(
            "lineage",
            stage_lineage(
                self.run_id, stage, files, lineage_triples, timer.ms(),
                rollup=self._rollup,
            ),
        )
        return out

    def run(self, files: DataFrame, resume: bool = False) -> dict[str, DataFrame]:
        files = files.persist()
        # one content pass feeds the fingerprint AND every stage's lineage
        self._rollup = input_rollup(files).persist()
        fingerprint = _corpus_fingerprint(self._rollup)

        # -- stage 1: extract ------------------------------------------------
        if self._stage_valid("extracted", fingerprint, resume):
            triples = self.catalog.read("extracted")
        else:
            t = StageTimer()
            triples = self._commit(
                "extracted",
                extract_triples(files),
                files,
                fingerprint,
                t,
                partition_by=["pred"],
                lineage_triples=None,
            )
            # lineage wants triple counts: re-append with counts now available
        triples = triples.persist()

        # -- stage 2a: components ---------------------------------------------
        if self._stage_valid("components", fingerprint, resume):
            comps = self.catalog.read("components")
        else:
            t = StageTimer()
            comps = self._commit(
                "components",
                connected_components(link_edges(triples)),
                files,
                fingerprint,
                t,
            )

        # -- stage 2b: linked -------------------------------------------------
        if self._stage_valid("linked", fingerprint, resume):
            linked = self.catalog.read("linked")
        else:
            t = StageTimer()
            mapping = canonical_mapping(triples, comps)
            linked = self._commit(
                "linked",
                apply_linking(triples, mapping),
                files,
                fingerprint,
                t,
                partition_by=["pred"],
                lineage_triples=triples,
            )
        linked = linked.persist()

        # -- stage 3: nodes / edges -------------------------------------------
        if self._stage_valid("nodes", fingerprint, resume):
            nodes = self.catalog.read("nodes")
        else:
            t = StageTimer()
            nodes = self._commit(
                "nodes",
                build_nodes(linked),
                files,
                fingerprint,
                t,
                partition_by=["lang", "repo_bucket"],
                lineage_triples=linked,
                cluster_for_write=True,
            )
        if self._stage_valid("edges", fingerprint, resume):
            edges = self.catalog.read("edges")
        else:
            t = StageTimer()
            edges = self._commit(
                "edges",
                build_edges(linked),
                files,
                fingerprint,
                t,
                partition_by=["lang", "repo_bucket"],
                lineage_triples=linked,
                cluster_for_write=True,
            )
        files.unpersist()
        self._rollup.unpersist()
        return {
            "extracted": triples,
            "components": comps,
            "linked": linked,
            "nodes": nodes,
            "edges": edges,
        }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="parquet path of the files table")
    ap.add_argument("--output", required=True)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--master", default=None)
    ap.add_argument("--synth", type=int, default=0, help="generate N synthetic files instead of reading --input")
    args = ap.parse_args()

    from raptor_spark.session import build_session

    spark = build_session("raptor_spark.pipeline", master=args.master)
    if args.synth:
        from raptor_spark.synth import generate_corpus

        files = spark.createDataFrame(generate_corpus(args.synth), schema=FILES_SCHEMA)
        files = files.repartition(max(32, args.synth // 512))
    else:
        files = spark.read.parquet(args.input)
    out = Pipeline(spark, args.output).run(files, resume=args.resume)
    counts = {k: v.count() for k, v in out.items()}
    print(json.dumps(counts))
    spark.stop()


if __name__ == "__main__":
    main()
