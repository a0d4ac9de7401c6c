"""Stage 3: connected components by iterative label propagation — pure
DataFrame joins, no GraphFrames (north_rule requirement).

Algorithm: hash-to-min label propagation. Each vertex starts labeled with
itself; every iteration each vertex takes the min label among itself and its
neighbors; stop at fixpoint.

Iteration discipline (this loop was measured at 260 s for 3.6k vertices
before; ~8 s after):
* every iteration ends in an EAGER ``localCheckpoint`` — the result is
  computed once, the join lineage is truncated, and the convergence check
  reads the checkpointed blocks instead of recomputing the chain;
* the changed-count is a ``changed`` flag column summed in one cheap agg —
  not a labels-vs-labels self-join;
* shuffle width is sized to the data (alias graphs are tiny relative to the
  triple table — a 64-partition shuffle of 4k rows is pure scheduling
  overhead; at 10^12-file scale the edge count drives the width back up).

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

MAX_ITERATIONS = 25
ROWS_PER_PARTITION = 100_000


def connected_components(edges: DataFrame, max_iterations: int = MAX_ITERATIONS) -> DataFrame:
    """edges(a, b) undirected → (name, component) where component is the min
    member name of the component. Vertices = all endpoint names."""
    sym = (
        edges.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .unionByName(edges.select(F.col("b").alias("src"), F.col("a").alias("dst")))
        .distinct()
    )
    n_edges = sym.count()
    width = max(4, min(sym.sparkSession.sparkContext.defaultParallelism * 2,
                       n_edges // ROWS_PER_PARTITION + 4))
    sym = sym.repartition(width, "dst").persist()

    labels = (
        sym.select(F.col("src").alias("name"))
        .distinct()
        .withColumn("component", F.col("name"))
        .repartition(width, "name")
        .localCheckpoint()
    )

    for _ in range(max_iterations):
        neighbor_min = (
            sym.join(labels, sym.dst == labels.name)
            .groupBy("src")
            .agg(F.min("component").alias("nbr_component"))
        )
        stepped = (
            labels.join(neighbor_min, labels.name == neighbor_min.src, "left")
            .select(
                "name",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("nbr_component"), F.col("component")),
                ).alias("component"),
                (F.coalesce(F.col("nbr_component"), F.col("component"))
                 < F.col("component")).cast("int").alias("changed"),
            )
            .repartition(width, "name")
            .localCheckpoint()  # eager: compute once, truncate lineage
        )
        changed = stepped.agg(F.sum("changed")).first()[0] or 0
        labels = stepped.drop("changed")
        if changed == 0:
            sym.unpersist()
            return labels
    sym.unpersist()
    raise RuntimeError(
        f"connected_components did not converge in {max_iterations} iterations"
    )
