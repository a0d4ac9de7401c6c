"""Stage 3: connected components by iterative label propagation — pure
DataFrame joins, no GraphFrames (north_rule requirement).

Algorithm: hash-to-min label propagation WITH pointer jumping after a cheap
prefix. Each vertex starts labeled with itself; every round each vertex
takes the min label among itself and its neighbors (one union + groupBy
shuffle). The first ``JUMP_AFTER`` rounds stop there — one eager
materialization per round; from then on labels are additionally path-halved
by following ``component → component(component)`` (one join + a second
materialization), so convergence stays O(log diameter) on long chains
while the common case pays nothing extra. The alias graph is near-clique
(LSH blocking makes dense clusters, diameter ≲ 4): jumping from round 1
never saved a round there but doubled per-round cost — A/B on the 10k-file
bench graph measured 4.6 s hybrid vs 8.0 s always-jump at identical round
counts and digests, while a 2000-node path still converges in 14 rounds
(propagation alone would need 2000 and trip the iteration cap).

Iteration discipline (an early naive loop measured 260 s for 3.6k vertices):
* every round ends in an EAGER ``localCheckpoint`` — the result is computed
  once, the join lineage is truncated, and both sides of the jump join read
  checkpointed blocks (a self-join of unpersisted frames recomputes the
  lineage twice);
* fixpoint detection is one cheap agg — bit_xor of xxhash64(name, component)
  stable across a round — not a labels-vs-labels join;
* labels are monotone non-increasing under both steps, so the hash is stable
  exactly at the fixpoint;
* no explicit repartition between rounds — groupBy/join already hash-shuffle
  on the keys and AQE coalesces the tiny alias-graph partitions (an explicit
  width repartition added one full shuffle per step, A/B-measured ~25%
  slower with identical output).

The iteration cap is a safety net, with a loud failure rather than a silent
wrong answer.

Determinism: labels are the names themselves (strings) and min() is total, so
the result is independent of partitioning — SURVEY.md §7.4 risk 3.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_ITERATIONS = 25
JUMP_AFTER = 4  # plain min-propagation rounds before pointer jumping kicks in
DRIVER_CC_MAX_EDGES = 4_000_000  # ≤ this many distinct directed edges →
# driver union-find instead of the distributed loop. The alias graph's name
# dimension is orders of magnitude smaller than the corpus, so small-to-mid
# corpora produce edge sets where every distributed round (2 jobs each,
# ~8-14 rounds) is pure fixed overhead — the same size-gated reasoning as
# broadcast-join selection, using the sizing count the loop already pays
# for. Measured THREE times on REAL alias graphs, interleaved A/B in one
# session each time: 541k directed edges (1M-file corpus) driver 9.2 s vs
# loop 35.4 s; 1.11M (2M files) driver 15.8 s vs loop 34.9-37.9 s;
# 2.42M (4M files) driver 28.6-33.4 s vs loop 92.0-95.4 s — identical
# output every time. Driver time is linear (~12.5 s per 1M directed
# rows); the loop is NOT flat past ~1M (each pointer-jumping round's work
# grows with the graph: 35 s at 1.1M → 93 s at 2.4M), so the loop never
# catches up in this regime and the binding constraint is driver MEMORY,
# not time: 4M name-pair rows collect in ~240 MB raw (union-find dicts
# ~1-2 GB — fits the default 8g driver with headroom; the loop remains
# the correct path for truly graph-shaped inputs beyond it). Parity
# between the two paths is pinned in tests/test_graph_ops.py.
# The 4M constant assumes that 8g driver: _driver_cc_edge_cap scales it
# linearly down (500k edges/GiB) when spark.driver.memory is configured
# smaller, so a 2g driver never collects an edge set sized for 8g.

_EDGES_PER_GIB = DRIVER_CC_MAX_EDGES // 8  # the measured 8g sizing above


def _parse_memory_gib(mem: str) -> float:
    """'8g' / '4096m' / '2048k'-style JVM size string → GiB. Bare numbers
    are MiB: spark.driver.memory is declared bytesConf(ByteUnit.MiB), so
    'spark.driver.memory=4096' means 4 GiB — treating it as bytes would
    yield a ~0 edge cap and silently disable the driver fast path."""
    m = mem.strip().lower()
    units = {"k": 1 / (1024**2), "m": 1 / 1024, "g": 1.0, "t": 1024.0}
    if m and m[-1] in units:
        return float(m[:-1]) * units[m[-1]]
    return float(m) / 1024


def _driver_cc_edge_cap(spark) -> int:
    """DRIVER_CC_MAX_EDGES scaled by the session's configured driver
    memory: the 4M-edge gate was sized against the 8g default, so a
    smaller driver gets a proportionally smaller cap (and anything
    unparseable falls back to Spark's 1g default — conservative)."""
    try:
        mem = spark.conf.get("spark.driver.memory", "1g")
        gib = _parse_memory_gib(mem)
    except Exception:
        gib = 1.0
    return min(DRIVER_CC_MAX_EDGES, max(0, int(gib * _EDGES_PER_GIB)))


def _driver_union_find(sym: DataFrame) -> DataFrame:
    """Union-find over a collected symmetric edge set; labels = min member
    (union-by-min keeps every root the minimum of its set, so root == the
    distributed loop's min-label fixpoint). Same output schema and values
    as the loop.

    Edge transfer rides Arrow BOTH ways (toPandas in, a pandas frame out
    through createDataFrame's Arrow path) instead of row-object
    collect/createDataFrame — serial driver time the r5 linkskew N→4N
    gate surfaced as an Amdahl constant. A/B at a 1.1M-directed-edge
    string graph (the 2M-file alias-graph size): collect 4.2 s →
    toPandas 0.8 s, row-list output 3.3 s → pandas output 2.8 s, the
    union-find loop itself 1.2 s — ~4 s serial saved per invocation,
    identical output (parity-pinned in tests/test_graph_ops.py)."""
    import pandas as pd

    from pyspark.sql.types import StructField, StructType

    pdf = sym.toPandas()
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for a, b in zip(pdf["src"].to_numpy(), pdf["dst"].to_numpy()):
        if a not in parent:
            parent[a] = a
        if b not in parent:
            parent[b] = b
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo

    dt = sym.schema["src"].dataType
    schema = StructType(
        [StructField("name", dt, False), StructField("component", dt, False)]
    )
    names = sorted(parent)
    out = pd.DataFrame(
        {"name": names, "component": [find(v) for v in names]}
    )
    return sym.sparkSession.createDataFrame(out, schema)


def connected_components(
    edges: DataFrame,
    max_iterations: int = MAX_ITERATIONS,
    driver_cc_max_edges: int | None = None,
) -> DataFrame:
    """edges(a, b) undirected → (name, component) where component is the min
    member name of the component. Vertices = all endpoint names.

    ``driver_cc_max_edges=None`` (default) sizes the driver fast-path gate
    from the session's spark.driver.memory (_driver_cc_edge_cap); pass an
    explicit value to pin it."""
    if driver_cc_max_edges is None:
        driver_cc_max_edges = _driver_cc_edge_cap(edges.sparkSession)
    # both directions in ONE pass over edges: a union of two selects scans
    # the (typically unpersisted, expensive) edge lineage twice — at 100k
    # files that recomputed the whole LSH linking stage a second time
    sym = (
        edges.select(
            F.explode(
                F.array(
                    F.struct(F.col("a").alias("src"), F.col("b").alias("dst")),
                    F.struct(F.col("b").alias("src"), F.col("a").alias("dst")),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
        .distinct()
    )
    # persist BEFORE the sizing count: the count otherwise computes the full
    # (typically expensive, unpersisted) edge lineage once, and filling the
    # cache afterwards computes it a second time — measured 2× the whole
    # linking stage at 100k files
    sym = sym.persist()
    n_sym = sym.count()  # materialize before the loop references it every round
    if n_sym <= driver_cc_max_edges:
        out = _driver_union_find(sym)
        sym.unpersist()
        return out

    labels = (
        sym.select(F.col("src").alias("name"))
        .distinct()
        .withColumn("component", F.col("name"))
        .localCheckpoint()
    )

    from pyspark.sql import Observation

    prev_hash = None
    for i in range(max_iterations):
        # propagate: min label among self and neighbors — ONE shuffle
        # (union + groupBy), not join-then-left-join
        contrib = sym.join(labels, sym.dst == labels.name).select(
            F.col("src").alias("name"), "component"
        )
        stepped = (
            contrib.unionByName(labels)
            .groupBy("name")
            .agg(F.min("component").alias("component"))
        )
        if i < JUMP_AFTER:
            result = stepped
        else:
            # pointer jump (path halving): component ← component(component);
            # every label is a vertex name, so the left join always
            # resolves. The self-join input is materialized first
            # (persist-before-self-join pitfall).
            stepped = stepped.localCheckpoint()
            jmap = stepped.select(
                F.col("name").alias("jn"), F.col("component").alias("jc")
            )
            result = stepped.join(
                jmap, stepped.component == jmap.jn, "left"
            ).select("name", F.coalesce("jc", "component").alias("component"))
        # bit_xor: order-insensitive, overflow-free under ANSI (sum
        # overflows). Two independently-seeded digests: a single 64-bit xor
        # digest colliding across consecutive non-identical label sets
        # (~2^-64) would terminate early with a silently wrong assignment;
        # the pair squares that to ~2^-128. The digests ride the round's
        # OWN materialization job via Observation (metrics fire on the
        # eager localCheckpoint), so a round pays ONE job, not a
        # materialize + a separate fixpoint agg — at cluster scale the
        # per-round scheduler latency is the serial Amdahl term the N→4N
        # gate measures (r3 VERDICT #2 decomposition).
        obs = Observation(f"cc_digest_{i}")
        labels = result.observe(
            obs,
            F.expr("bit_xor(xxhash64(name, component))").alias("h1"),
            F.expr("bit_xor(xxhash64(name, component, 1))").alias("h2"),
        ).localCheckpoint()
        got = obs.get
        h = (got["h1"], got["h2"])
        if h == prev_hash:
            sym.unpersist()
            return labels
        prev_hash = h
    sym.unpersist()
    raise RuntimeError(
        f"connected_components did not converge in {max_iterations} iterations"
    )


def merge_components(
    labels: DataFrame, new_edges: DataFrame, max_iterations: int = MAX_ITERATIONS
) -> DataFrame:
    """Incrementally fold new edges into an existing (name, component)
    labeling WITHOUT revisiting the old edge set.

    The old labeling is itself a spanning edge set — every vertex connected
    to its component representative — with exactly the old graph's
    components, so CC over (label-edges ∪ new_edges) equals CC over
    (old_edges ∪ new_edges). That identity is what makes checkpoint-restart
    linking viable at 10^12 files: an incremental batch touches |V| label
    rows plus the new batch's edges, never the full historical edge set
    (which at that scale lives only as the materialized components table).
    Singleton vertices survive as (name, name) self-edges.

    Parity with the from-scratch run is gated in
    tests/test_cc.py::merge_components_equals_full_recompute.
    """
    star = labels.select(F.col("name").alias("a"), F.col("component").alias("b"))
    return connected_components(
        star.unionByName(new_edges.select("a", "b")), max_iterations
    )
