"""Stage 3: connected components by iterative label propagation — pure
DataFrame joins, no GraphFrames (north_rule requirement).

Algorithm: hash-to-min label propagation. Each vertex starts labeled with
itself; every iteration each vertex takes the min label among itself and its
neighbors; stop at fixpoint. ``localCheckpoint`` every CHECKPOINT_EVERY
iterations truncates the join lineage (SURVEY.md §4 custom-work item 2).

Convergence: alias components are small (cluster diameter ≤ ~3 after the
exact-block star topology), so propagation converges in a handful of rounds;
the iteration cap is a safety net, with a loud failure rather than a silent
wrong answer.

Determinism: labels are the names themselves (strings) and min() is total, so
the result is independent of partitioning — SURVEY.md §7.4 risk 3.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CHECKPOINT_EVERY = 3
MAX_ITERATIONS = 25


def connected_components(edges: DataFrame, max_iterations: int = MAX_ITERATIONS) -> DataFrame:
    """edges(a, b) undirected → (name, component) where component is the min
    member name of the component. Vertices = all endpoint names."""
    sym = (
        edges.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .unionByName(edges.select(F.col("b").alias("src"), F.col("a").alias("dst")))
        .distinct()
        .persist()
    )
    labels = (
        sym.select(F.col("src").alias("name"))
        .distinct()
        .withColumn("component", F.col("name"))
        .localCheckpoint()
    )

    for it in range(max_iterations):
        neighbor_min = (
            sym.join(labels, sym.dst == labels.name)
            .groupBy("src")
            .agg(F.min("component").alias("nbr_component"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.name == neighbor_min.src, "left")
            .select(
                "name",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("nbr_component"), F.col("component")),
                ).alias("component"),
            )
        )
        if it % CHECKPOINT_EVERY == CHECKPOINT_EVERY - 1:
            new_labels = new_labels.localCheckpoint()
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), on="name")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            sym.unpersist()
            return labels
    sym.unpersist()
    raise RuntimeError(
        f"connected_components did not converge in {max_iterations} iterations"
    )
