"""Stage 4: materialize the graph as partitioned nodes/edges tables.

Analog of the reference's Qdrant upsert sink (api_insert.py:88-171: group by
payload.type → one collection per kind → upsert) re-expressed relationally:
one UNION'd nodes table with a ``kind`` column, one edges table, both
partitioned by ``(lang, repo_bucket)`` — the partition columns play the role
of Qdrant's keyword payload indexes
(api_document_search_with_cache.py:95-120).

Node identity is content-derived (sha2 of kind:canonical) — never
monotonically_increasing_id — so materialization is deterministic under any
partitioning (SURVEY.md §7.4 risk 3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from raptor_spark.functions import node_id_col, repo_bucket_col
from raptor_spark.tokenize import (
    PRED_CALLS,
    PRED_CONCEPT,
    PRED_CONTAINS,
    PRED_DEFINES,
    PRED_IMPORTS,
)

# pred → (subj node kind, obj node kind)
_PRED_KINDS = {
    PRED_CONTAINS: ("repo", "file"),
    PRED_IMPORTS: ("file", "module"),
    PRED_DEFINES: ("file", "symbol"),
    PRED_CALLS: ("symbol", "symbol"),
    PRED_CONCEPT: ("file", "concept"),
}


def _endpoint_canonicals(linked: DataFrame) -> DataFrame:
    """Explode linked triples into (kind, canonical, lang, repo) node mentions.

    Canonical strings per kind:
      repo    → repo name
      file    → "repo:path"
      module  → imported module string
      symbol  → linked canonical (subj_canonical/obj_canonical)
      concept → concept name
    """
    t = linked
    subj_canon = F.when(
        t.pred == PRED_CONTAINS, t.repo
    ).when(
        t.pred == PRED_CALLS, F.coalesce(t.subj_canonical, t.subj)
    ).otherwise(F.concat_ws(":", t.repo, t.path))
    obj_canon = (
        F.when(t.pred == PRED_CONTAINS, F.concat_ws(":", t.repo, t.path))
        .when(t.pred.isin(PRED_DEFINES, PRED_CALLS), F.coalesce(t.obj_canonical, t.obj))
        .otherwise(t.obj)
    )
    kind_map = F.create_map(
        *[x for p, (sk, ok) in _PRED_KINDS.items() for x in (F.lit(p), F.lit(f"{sk}|{ok}"))]
    )
    kinds = F.split(kind_map[t.pred], r"\|")
    exploded = t.select(
        F.explode(
            F.array(
                F.struct(
                    kinds.getItem(0).alias("kind"), subj_canon.alias("canonical")
                ),
                F.struct(kinds.getItem(1).alias("kind"), obj_canon.alias("canonical")),
            )
        ).alias("m"),
        "lang",
        "repo",
    ).select("m.kind", "m.canonical", "lang", "repo")
    return exploded


def build_nodes(linked: DataFrame) -> DataFrame:
    """nodes(id, kind, canonical, lang, repo_bucket, n_mentions)."""
    mentions = _endpoint_canonicals(linked.filter(F.col("pred").isin(*_PRED_KINDS)))
    return (
        mentions.groupBy("kind", "canonical")
        .agg(F.count("*").alias("n_mentions"), F.min("lang").alias("lang"))
        .select(
            node_id_col(F.col("kind"), F.col("canonical")).alias("id"),
            "kind",
            "canonical",
            "lang",
            repo_bucket_col("canonical").alias("repo_bucket"),
            F.col("n_mentions").cast("long"),
        )
    )


def build_edges(linked: DataFrame) -> DataFrame:
    """edges(src, dst, pred, lang, repo_bucket, weight) — weight = number of
    mention rows collapsing onto the canonical (src, dst, pred)."""
    t = linked.filter(F.col("pred").isin(*_PRED_KINDS))
    subj_canon = F.when(
        t.pred == PRED_CONTAINS, t.repo
    ).when(
        t.pred == PRED_CALLS, F.coalesce(t.subj_canonical, t.subj)
    ).otherwise(F.concat_ws(":", t.repo, t.path))
    obj_canon = (
        F.when(t.pred == PRED_CONTAINS, F.concat_ws(":", t.repo, t.path))
        .when(t.pred.isin(PRED_DEFINES, PRED_CALLS), F.coalesce(t.obj_canonical, t.obj))
        .otherwise(t.obj)
    )
    kind_map = F.create_map(
        *[x for p, (sk, ok) in _PRED_KINDS.items() for x in (F.lit(p), F.lit(f"{sk}|{ok}"))]
    )
    kinds = F.split(kind_map[t.pred], r"\|")
    pairs = t.select(
        node_id_col(kinds.getItem(0), subj_canon).alias("src"),
        node_id_col(kinds.getItem(1), obj_canon).alias("dst"),
        "pred",
        "lang",
    )
    return (
        pairs.groupBy("src", "dst", "pred")
        .agg(F.count("*").alias("weight"), F.min("lang").alias("lang"))
        .select(
            "src",
            "dst",
            "pred",
            "lang",
            repo_bucket_col("src").alias("repo_bucket"),
            F.col("weight").cast("long"),
        )
    )
