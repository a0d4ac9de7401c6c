"""Graph analytics over an undirected edge list (a, b) — the read-side
companions of the KG the pipeline materializes (degree profiles, triangle /
clustering statistics, 2-hop candidate counts). Pure DataFrame joins, no
GraphFrames (north_rule), same discipline as raptor_spark.cc.

Scale notes (these shapes survive a 10^12-edge graph):

* ``degrees`` is one groupBy over the symmetrized edges.
* ``triangle_stats`` uses the degree-ordered node-iterator join: every
  undirected edge is directed from its LOWER-degree endpoint to the higher
  (ties by id), wedges are enumerated by self-joining the directed list on
  its source, and each wedge is closed by one hash join against the
  directed edge set. Orienting by degree bounds each source's fan-out by
  O(sqrt(E)) — the classic fix that keeps a head vertex (a 'main' symbol
  hub) from generating deg² wedge candidates on one task.
* ``two_hop_counts`` counts distinct friend-of-friend candidates per
  vertex (the blocking fan-out of entity linking): symmetric edges
  self-joined once, minus self and direct neighbors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def symmetrize(edges: DataFrame) -> DataFrame:
    """(a, b) undirected, any orientation/dup mix → distinct (src, dst) both
    directions, self-loops dropped. One pass over the input (explode of a
    2-struct array, same trick as cc.connected_components)."""
    return (
        edges.filter(F.col("a") != F.col("b"))
        .select(
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


def degrees(edges: DataFrame) -> DataFrame:
    """(id, degree): distinct-neighbor degree per vertex."""
    return (
        symmetrize(edges)
        .groupBy(F.col("src").alias("id"))
        .agg(F.count("*").alias("degree"))
    )


def triangle_stats(edges: DataFrame) -> DataFrame:
    """One row: (n_nodes, n_edges, n_wedges, n_triangles, clustering) where
    clustering = 3·triangles / wedges (global clustering coefficient,
    0.0 when the graph has no wedges).

    Wedge enumeration joins the degree-ordered directed edges on their
    source; each candidate (b < c by the degree order) closes iff (b→c) is
    itself a directed edge. Every triangle is counted exactly once — at its
    minimum-degree vertex."""
    sym = symmetrize(edges).persist()
    deg = sym.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("degree"))

    # orient each undirected edge low→high by (degree, id); carrying the
    # rank as a struct makes the comparison one expression
    ranked = sym.join(deg.withColumnRenamed("id", "src"), "src").select(
        "src",
        "dst",
        F.struct(
            F.col("degree").alias("d"), F.col("src").cast("string").alias("i")
        ).alias("rk_src"),
    )
    dst_rank = deg.select(
        F.col("id").alias("dst"),
        F.struct(
            F.col("degree").alias("d"), F.col("id").cast("string").alias("i")
        ).alias("rk_dst"),
    )
    directed = (
        ranked.join(dst_rank, "dst")
        .filter(F.col("rk_src") < F.col("rk_dst"))
        .select("src", "dst", "rk_dst")
    ).persist()

    e1 = directed.select(F.col("src").alias("a"), F.col("dst").alias("b"), F.col("rk_dst").alias("rk_b"))
    e2 = directed.select(F.col("src").alias("a"), F.col("dst").alias("c"), F.col("rk_dst").alias("rk_c"))
    wedges = e1.join(e2, "a").filter(F.col("rk_b") < F.col("rk_c"))
    closing = directed.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    n_triangles = wedges.join(closing, ["b", "c"], "left_semi").count()

    n_nodes = deg.count()
    n_edges_x2, n_wedges = sym.count(), (
        deg.select(
            F.sum(F.col("degree") * (F.col("degree") - 1) / 2).alias("w")
        ).first()[0]
    )
    sym.unpersist()
    directed.unpersist()
    spark = edges.sparkSession
    n_wedges = int(n_wedges or 0)
    clustering = (3.0 * n_triangles / n_wedges) if n_wedges else 0.0
    return spark.createDataFrame(
        [(n_nodes, n_edges_x2 // 2, n_wedges, n_triangles, round(clustering, 6))],
        "n_nodes long, n_edges long, n_wedges long, n_triangles long, clustering double",
    )


def bfs_levels(
    edges: DataFrame, sources: DataFrame, max_levels: int = 100
) -> DataFrame:
    """(id, level): minimum hop distance from the source set over the
    undirected graph; vertices unreachable within ``max_levels`` are absent.
    The seed-expansion primitive of KG neighborhood queries (and the
    multi-source variant is crawl-frontier scheduling).

    Level-synchronous frontier expansion: each round is one equi-join of the
    CURRENT frontier (only the newly discovered vertices, not the whole
    visited set) against the symmetrized edge list, plus one anti-join
    against visited — both shuffles carry (id) or (id, level) rows only,
    never payloads. ``localCheckpoint`` per round truncates the otherwise
    linearly growing lineage (same discipline as cc.connected_components);
    the edge list is persisted once and reused by every round. Rounds =
    graph diameter from the sources, the BFS lower bound.
    """
    from pyspark.sql import Observation

    sym = symmetrize(edges).persist()
    visited = (
        sources.select("id").distinct().withColumn("level", F.lit(0)).localCheckpoint()
    )
    frontier = visited.select("id")
    level = 0
    while level < max_levels:
        level += 1
        # the frontier-size fixpoint check rides the round's own
        # materialization job via Observation (metrics fire on the eager
        # localCheckpoint) instead of a separate isEmpty job — one job per
        # BFS level, the per-round scheduler-latency cut of the N→4N
        # decomposition (same fold as cc.connected_components)
        obs = Observation(f"bfs_frontier_{level}")
        nxt = (
            frontier.join(sym, frontier["id"] == sym["src"])
            .select(F.col("dst").alias("id"))
            .distinct()
            .join(visited.select("id"), "id", "left_anti")
            .withColumn("level", F.lit(level))
            .observe(obs, F.count(F.lit(1)).alias("n"))
            .localCheckpoint()
        )
        if obs.get["n"] == 0:
            break
        visited = visited.unionByName(nxt).localCheckpoint()
        frontier = nxt.select("id")
    sym.unpersist()
    return visited


def pagerank(
    edges: DataFrame,
    n_iter: int = 5,
    damping: float = 0.85,
    init_ranks: DataFrame | None = None,
    checkpoint_every: int = 1,
) -> DataFrame:
    """(id, rank): fixed-iteration PageRank over the SYMMETRIZED edge list —
    the hub-importance score of the canonicalized symbol graph. On a
    symmetric graph every vertex has out-degree ≥ 1, so there is no dangling
    mass and a fixed-K oracle can replay the arithmetic exactly.

    Each iteration is one shuffle: ranks (re-keyed by vertex) hash-join the
    edge list on src, contributions partial-aggregate into the dst groupBy
    (map-side combine keeps the shuffle at vertex cardinality, not edge
    cardinality). The edge list is repartitioned by the join key once and
    persisted, so every iteration reuses its layout instead of re-shuffling
    the (much larger) edge side; ranks are localCheckpointed per iteration
    to keep the plan flat at any K.

    ``init_ranks`` (id, rank) warm-starts the iteration from a previous
    run's output — the checkpoint-restart path for iterative graph jobs
    (north_rule resumability, ≙ incremental_clusters for CC): after an
    edge delta, resume from the stored ranks instead of uniform and
    converge in a fraction of the rounds. Vertices absent from init_ranks
    (new since the checkpoint) start at the uniform 1/n; stale vertices
    (no longer in the graph) are dropped.
    """
    # out-degree via a window over the ONE symmetrize pass — the previous
    # form (sym.join(sym.groupBy(...))) was a self-join of the unpersisted
    # symmetrize output, so the explode+distinct lineage executed TWICE per
    # call (the persist-before-self-join pitfall); the window's partitionBy
    # also leaves links hash-partitioned by the per-round join key, so no
    # separate repartition pass is needed. Same (src, dst, odeg) rows.
    links = (
        symmetrize(edges)
        .withColumn(
            "odeg", F.count("*").over(Window.partitionBy("src"))
        )
        .persist()
    )
    n = links.select("src").distinct().count()
    ranks = (
        links.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("rank", F.lit(1.0 / n))
    )
    if init_ranks is not None:
        ranks = (
            ranks.join(
                init_ranks.select("id", F.col("rank").alias("__init")),
                "id",
                "left",
            )
            .select("id", F.coalesce("__init", "rank").alias("rank"))
            .localCheckpoint()
        )
    for it in range(n_iter):
        contribs = links.join(ranks, links["src"] == ranks["id"]).select(
            F.col("dst").alias("id"), (F.col("rank") / F.col("odeg")).alias("c")
        )
        ranks = contribs.groupBy("id").agg(F.sum("c").alias("in_sum")).select(
            "id",
            (F.lit((1.0 - damping) / n) + F.lit(damping) * F.col("in_sum")).alias(
                "rank"
            ),
        )
        # checkpoint_every=1 (default) keeps the plan flat at any K — the
        # arbitrary-K contract — and is also the FAST setting: an
        # interleaved A/B (5 rounds, 116k-edge doc-word graph, local[8])
        # measured lazy composition (0) at 3.8-4.2 s vs 2.2-2.9 s
        # checkpointed — the deep 5-round plan costs more in optimizer +
        # stage-recompute than the per-round job it saves. Values are
        # identical either way (diff count 0); the knob exists for
        # experiments, not as a recommended setting.
        if checkpoint_every and (it + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint()
    links.unpersist()
    return ranks


def personalized_pagerank(
    edges: DataFrame,
    seeds: DataFrame,
    n_iter: int = 5,
    damping: float = 0.85,
) -> DataFrame:
    """(id, rank): fixed-iteration PERSONALIZED PageRank over the
    symmetrized edge list — relevance RELATIVE TO A SEED SET rather than
    global importance: the teleport mass lands uniformly on ``seeds``
    (a DataFrame with an ``id`` column) instead of on every vertex, so
    ranks decay with random-walk distance from the seeds. The KG read
    path this serves: "entities most related to THIS document / THIS
    symbol family" (seed = its cluster), the seed-expansion sibling of
    ``pagerank``'s global hub score.

    Seeds are intersected with the graph's vertex set first (an absent
    seed would hold reset mass forever without propagating — and the
    exact-replay oracle enumerates seeds from the edge list). Per round:
    the same contribs join + vertex groupBy as ``pagerank``, then a
    full-outer join against the seed-sized reset frame (full outer keeps
    never-reached seeds alive; Spark runs it as a shuffled join — the
    broadcast hint below is advisory and correctly ignored there), so
    the output domain is exactly {seeds} ∪ {vertices reached so far} —
    the growing BFS ball, identical on both engines. With
    seeds = ALL vertices the recurrence degenerates to ``pagerank``
    exactly (pytest-gated equivalence)."""
    # window-based out-degree over ONE symmetrize pass — same fix as
    # pagerank (the join form recomputed the unpersisted symmetrize twice)
    links = (
        symmetrize(edges)
        .withColumn(
            "odeg", F.count("*").over(Window.partitionBy("src"))
        )
        .persist()
    )
    vertices = links.select(F.col("src").alias("id")).distinct()
    seed_ids = seeds.select("id").distinct().join(vertices, "id", "semi")
    n_seeds = seed_ids.count()
    reset = F.broadcast(
        seed_ids.withColumn("reset", F.lit(1.0 / n_seeds)).localCheckpoint()
    )
    ranks = reset.select("id", F.col("reset").alias("rank"))
    for _ in range(n_iter):
        contribs = links.join(ranks, links["src"] == ranks["id"]).select(
            F.col("dst").alias("id"), (F.col("rank") / F.col("odeg")).alias("c")
        )
        in_sums = contribs.groupBy("id").agg(F.sum("c").alias("in_sum"))
        ranks = (
            in_sums.join(reset, "id", "full_outer")
            .select(
                "id",
                (
                    F.lit(1.0 - damping) * F.coalesce("reset", F.lit(0.0))
                    + F.lit(damping) * F.coalesce("in_sum", F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    links.unpersist()
    return ranks


def hits(edges: DataFrame, n_iter: int = 4) -> DataFrame:
    """(id, hub, auth): fixed-iteration HITS (Kleinberg) over the DIRECTED
    edge list (a → b) — here the id-ordered near-dup orientation, so a hub
    is an "original" pointing at many later duplicates and an authority is
    a document many originals point at. Complements ``pagerank`` (which
    runs on the symmetrized graph) with the directed-importance view the
    reference's entity-ranking read path exposes.

    Per iteration: auth = Σ hub over in-edges, L1-normalized; then
    hub = Σ auth over out-edges, L1-normalized. Each half-step is one
    hash join (edges re-keyed once, persisted) plus a vertex-cardinality
    groupBy with map-side combine; the normalizing total is a 1-row
    aggregate cross-joined back (broadcast — never a driver collect).
    Scores are localCheckpointed per half-step so the plan stays flat at
    any K, same discipline as ``pagerank``. Vertices with no in-edges
    (resp. out-edges) have auth = 0 (resp. hub = 0) by coalesce at the
    end — the fixed-K unrolled oracle replays the identical arithmetic.
    """
    if n_iter < 1:
        raise ValueError("hits needs n_iter >= 1 (auth/hub undefined at 0)")
    e = (
        edges.filter(F.col("a") != F.col("b"))
        .select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .distinct()
        .repartition("src")
        .persist()
    )
    nodes = (
        e.select(F.col("src").alias("id"))
        .union(e.select("dst"))
        .distinct()
        .persist()
    )

    def _l1_normalize(scores: DataFrame, col: str) -> DataFrame:
        tot = scores.agg(F.sum(col).alias("__tot"))
        return (
            scores.crossJoin(F.broadcast(tot))
            .select("id", (F.col(col) / F.col("__tot")).alias(col))
            .localCheckpoint()
        )

    hub = nodes.withColumn("hub", F.lit(1.0))
    auth = None
    for _ in range(n_iter):
        auth = _l1_normalize(
            e.join(hub, e["src"] == hub["id"])
            .groupBy("dst")
            .agg(F.sum("hub").alias("auth"))
            .select(F.col("dst").alias("id"), "auth"),
            "auth",
        )
        hub = _l1_normalize(
            e.join(auth, e["dst"] == auth["id"])
            .groupBy("src")
            .agg(F.sum("auth").alias("hub"))
            .select(F.col("src").alias("id"), "hub"),
            "hub",
        )
    out = (
        nodes.join(hub, "id", "left")
        .join(auth, "id", "left")
        .select(
            "id",
            F.coalesce("hub", F.lit(0.0)).alias("hub"),
            F.coalesce("auth", F.lit(0.0)).alias("auth"),
        )
        .localCheckpoint()
    )
    e.unpersist()
    nodes.unpersist()
    return out


def two_hop_counts(edges: DataFrame) -> DataFrame:
    """(id, n_two_hop): distinct vertices exactly two hops away (reachable
    via a neighbor, not self, not already a direct neighbor)."""
    sym = symmetrize(edges).persist()
    hop2 = (
        sym.select(F.col("src").alias("id"), F.col("dst").alias("mid"))
        .join(sym.select(F.col("src").alias("mid"), F.col("dst").alias("far")), "mid")
        .filter(F.col("id") != F.col("far"))
        .select("id", "far")
        .distinct()
    )
    direct = sym.select(F.col("src").alias("id"), F.col("dst").alias("far"))
    out = (
        hop2.join(direct, ["id", "far"], "left_anti")
        .groupBy("id")
        .agg(F.count("*").alias("n_two_hop"))
    )
    # materialize before unpersisting the shared base
    out = out.localCheckpoint()
    sym.unpersist()
    return out


def adamic_adar(
    edges: DataFrame,
    max_hub_degree: int | None = None,
) -> DataFrame:
    """(a, b, common_neighbors, aa_score): link prediction over the
    undirected graph — for every NON-adjacent pair with at least one common
    neighbor, the Adamic-Adar index Σ_z 1/ln(degree(z)) over the common
    neighbors z (Adamic & Adar 2003). The canonical "which entities are
    probably the same / should be linked next" score for a KG under
    construction: high-AA non-edges are the linker's review queue.
    Every common neighbor has degree ≥ 2 by construction, so ln(degree) is
    never zero.

    Scale shape: candidate pairs come from ONE self-equi-join of the
    adjacency list on the wedge center z — never an all-pairs product —
    then one groupBy on the pair and an anti-join back to the edge set.
    Cost is Σ_z degree(z)², the standard wedge bound; ``max_hub_degree``
    drops super-hub centers (a hub's 1/ln(d) weight is near-zero while its
    d² wedge fan-out dominates the job — the same head-symbol guard as
    SURVEY.md §7.4), making the bound Σ min(d, cap)² at a quantified,
    documented recall cost. AQE skew-join splits any remaining hot z."""
    sym = symmetrize(edges).persist()
    deg = sym.groupBy(F.col("src").alias("z")).agg(F.count("*").alias("degree"))
    if max_hub_degree is not None:
        deg = deg.filter(F.col("degree") <= max_hub_degree)
    nbr = sym.select(F.col("src").alias("z"), F.col("dst").alias("x"))
    # degree-1 centers can't form a pair (their only wedge is (x, x), which
    # the l.x < r.x filter drops) but their 1/ln(1) row STILL EVALUATES in
    # this projection under ANSI mode — guard the division, not the output
    wedges = (
        nbr.join(deg, "z")
        .select(
            "z",
            "x",
            F.when(
                F.col("degree") >= 2, F.lit(1.0) / F.log("degree")
            ).alias("w"),
        )
    )
    l, r = wedges.alias("l"), wedges.alias("r")
    pairs = (
        l.join(r, "z")
        .filter(F.col("l.x") < F.col("r.x"))
        .groupBy(F.col("l.x").alias("a"), F.col("r.x").alias("b"))
        .agg(
            F.count("*").alias("common_neighbors"),
            F.sum(F.col("l.w")).alias("aa_score"),
        )
    )
    return pairs.join(
        sym.select(F.col("src").alias("a"), F.col("dst").alias("b")),
        ["a", "b"],
        "left_anti",
    )


def label_propagation(edges: DataFrame, n_iter: int = 5) -> DataFrame:
    """(id, community): fixed-iteration SYNCHRONOUS label propagation over
    the symmetrized edge list — community detection for the canonicalized
    entity graph (the coarse-grained companion of cc.connected_components:
    CC separates disconnected duplicate groups, LPA splits a connected hub
    into densely-linked neighborhoods). Deterministic by construction:
    every vertex starts labeled with its own id, and each round adopts the
    most frequent label among its NEIGHBORS, ties broken by the smallest
    label — so a fixed-K SQL oracle replays the rounds exactly (same
    unrolled-CTE discipline as pagerank).

    Each round is one equi-join of the label table against the edge list
    (keyed dst) plus two partial-aggregated groupBys — the label shuffle is
    vertex-sized, never edge-sized; the argmax is a single min(struct)
    aggregate (no window, no second sort). The edge list is repartitioned
    by the join key once and persisted; labels localCheckpoint per round to
    keep the plan flat at any K.
    """
    sym = symmetrize(edges)
    links = sym.repartition("dst").persist()
    labels = (
        links.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
    )
    for _ in range(n_iter):
        counts = (
            links.join(labels, links["dst"] == labels["id"])
            .groupBy(links["src"].alias("v"), "label")
            .agg(F.count("*").alias("c"))
        )
        labels = (
            counts.groupBy("v")
            .agg(
                F.min(
                    F.struct((-F.col("c")).alias("nc"), F.col("label").alias("l"))
                ).alias("m")
            )
            .select(F.col("v").alias("id"), F.col("m.l").alias("label"))
            .localCheckpoint()
        )
    links.unpersist()
    return labels.withColumnRenamed("label", "community")


def modularity(edges: DataFrame, communities: DataFrame) -> DataFrame:
    """One row (n_edges, n_communities, intra_edges, modularity): Newman
    modularity Q of a community assignment over the undirected simple graph
    — the "did the community split actually find dense neighborhoods" audit
    that closes the loop on label_propagation (a split can always be
    *produced*; Q says whether it beats the degree-preserving random
    baseline — Q ≈ 0 means the communities are no denser than chance,
    negative means anti-communities).

    Q = Σ_c [ e_c/m − (d_c/2m)² ] is computed as ONE exact BIGINT numerator
    over one BIGINT denominator — 4m·Σe_c − Σd_c² over 4m² — with a single
    IEEE division at the end, so the number replays bit-for-bit on any
    engine (the cross-engine exactness rule: decide in integers, divide
    once). The whole audit is two vertex-sized aggregates plus one
    pair-community equi-join; nothing here is edge²-shaped.

    ``communities`` is any (id, community) frame — label_propagation output,
    cc components, or an external assignment. m and vertex degrees are
    properties of the GRAPH (standard Newman Q), so uncovered vertices
    still count in m and in their neighbors' degrees; they just contribute
    no degree mass or intra edges to any community.
    """
    sym = symmetrize(edges)
    pairs = sym.filter(F.col("src") < F.col("dst"))
    m_df = pairs.agg(F.count("*").cast("long").alias("m"))
    lab = communities.select("id", "community")
    deg = sym.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("deg"))
    d_c = (
        deg.join(lab, "id")
        .groupBy("community")
        .agg(F.sum("deg").cast("long").alias("d_c"))
    )
    e_c = (
        pairs.join(
            lab.select(F.col("id").alias("src"), F.col("community").alias("ca")),
            "src",
        )
        .join(
            lab.select(F.col("id").alias("dst"), F.col("community").alias("cb")),
            "dst",
        )
        .filter(F.col("ca") == F.col("cb"))
        .groupBy(F.col("ca").alias("community"))
        .agg(F.count("*").alias("e_c"))
    )
    per_comm = d_c.join(e_c, "community", "left").select(
        "d_c", F.coalesce("e_c", F.lit(0)).alias("e_c")
    )
    # broadcast 1-row m onto the 1-row community rollup (no real shuffle)
    tot = per_comm.agg(
        F.count("*").alias("n_communities"),
        F.sum("e_c").cast("long").alias("intra_edges"),
        F.sum(F.col("d_c") * F.col("d_c")).cast("long").alias("sd2"),
    ).crossJoin(F.broadcast(m_df))
    num = 4 * F.col("m") * F.col("intra_edges") - F.col("sd2")
    den = 4 * F.col("m") * F.col("m")
    return tot.select(
        F.col("m").alias("n_edges"),
        "n_communities",
        "intra_edges",
        F.when(
            F.col("m") > 0, num.cast("double") / den.cast("double")
        ).alias("modularity"),
    )


def kcore(edges: DataFrame, k: int = 2, n_rounds: int = 8) -> DataFrame:
    """(id, core_degree): vertices surviving ``n_rounds`` of k-core peeling
    (each round drops vertices whose degree WITHIN the surviving set is
    < k), with their within-core degree — the KG noise-entity pruning pass
    (a symbol mentioned once from one file carries no graph signal; the
    2-core is the smallest subgraph where every entity is multiply
    corroborated).

    The peeling operator is monotone (survivor sets only shrink), so a
    round that removes nothing is a fixpoint and the loop exits early —
    identical output to running all rounds, which is what the fixed-R
    unrolled SQL oracle does. Each round: two left-semi joins of the edge
    list against the (vertex-sized) survivor set + one partial-aggregated
    degree count. Survivor counts are exact set-equality proxies because
    survivors ⊆ alive each round.
    """
    sym = symmetrize(edges).persist()
    alive = sym.select(F.col("src").alias("id")).distinct().localCheckpoint()
    n_alive = alive.count()
    for _ in range(n_rounds):
        survivors = (
            sym.join(alive.select(F.col("id").alias("src")), "src", "left_semi")
            .join(alive.select(F.col("id").alias("dst")), "dst", "left_semi")
            .groupBy("src")
            .agg(F.count("*").alias("d"))
            .filter(F.col("d") >= k)
            .select(F.col("src").alias("id"))
            .localCheckpoint()
        )
        n_next = survivors.count()
        alive = survivors
        if n_next == n_alive:
            break
        n_alive = n_next
    out = (
        sym.join(alive.select(F.col("id").alias("src")), "src", "left_semi")
        .join(alive.select(F.col("id").alias("dst")), "dst", "left_semi")
        .groupBy(F.col("src").alias("id"))
        .agg(F.count("*").alias("core_degree"))
        .localCheckpoint()
    )
    sym.unpersist()
    return out


def sssp(
    edges: DataFrame,
    sources: DataFrame,
    n_rounds: int = 10,
    weight_col: str = "w",
) -> DataFrame:
    """(id, dist): ``n_rounds``-round Bellman-Ford over the symmetrized
    WEIGHTED edge list (a, b, w) from a source vertex set — exact shortest
    distances over paths of at most ``n_rounds`` edges, which IS the spec
    (run rounds ≥ diameter for full SSSP; a fixed-K oracle unrolls the same
    relaxations). The weighted twin of bfs_levels: hop counts become
    dissimilarity distances, the KG proximity score between entities.

    Each round is one equi-join of the current distance table (vertex-sized,
    (id, dist) rows only) against the persisted edge list plus one
    min-groupBy with map-side combine. Distances accumulate one edge per
    round — the same left-to-right float association on every engine, so
    the arithmetic replays bit-for-bit. Parallel duplicate edges are
    min-merged up front.
    """
    sym = (
        edges.filter(F.col("a") != F.col("b"))
        .select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("a").alias("src"),
                        F.col("b").alias("dst"),
                        F.col(weight_col).alias("w"),
                    ),
                    F.struct(
                        F.col("b").alias("src"),
                        F.col("a").alias("dst"),
                        F.col(weight_col).alias("w"),
                    ),
                )
            ).alias("e")
        )
        .select("e.*")
        .groupBy("src", "dst")
        .agg(F.min("w").alias("w"))
        .repartition("src")
        .persist()
    )
    dist = sources.select("id").distinct().withColumn("dist", F.lit(0.0))
    for _ in range(n_rounds):
        cand = dist.join(sym, dist["id"] == sym["src"]).select(
            F.col("dst").alias("id"), (F.col("dist") + F.col("w")).alias("dist")
        )
        dist = (
            dist.unionByName(cand)
            .groupBy("id")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint()
        )
    sym.unpersist()
    return dist


def assortativity(edges: DataFrame) -> DataFrame:
    """One row (n_edges, r): degree assortativity — the Pearson correlation
    between the endpoint degrees of every directed edge of the symmetrized
    graph (Newman 2002). r > 0 = hubs attach to hubs (celebrity cores,
    template families), r < 0 = hub-and-spoke mixing; for an entity graph
    under construction a strongly negative r is the signature of head-alias
    over-linking (every node glued to one hub).

    Cross-engine exactness: every sum (Σdx, Σdx², Σdxdy, m) is INTEGER —
    degrees are counts — so both engines reach the final division with
    bit-identical operands (CLAUDE.md's integer-decision rule); the single
    double division + IEEE sqrt then round identically. The variance terms
    are cast to double BEFORE the product (two ~1e10 int64s would overflow
    multiplied as integers). r is NULL for degree-regular graphs (zero
    variance).

    Scale shape: one degree groupBy + two vertex-keyed equi-joins to tag
    edge endpoints, then a single global aggregate — no all-pairs anywhere."""
    sym = symmetrize(edges)
    deg = sym.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("d"))
    ends = (
        sym.join(deg.select(F.col("id").alias("src"), F.col("d").alias("dx")), "src")
        .join(deg.select(F.col("id").alias("dst"), F.col("d").alias("dy")), "dst")
    )
    a = ends.agg(
        F.count("*").alias("m"),
        F.sum("dx").alias("sx"),
        F.sum("dy").alias("sy"),
        F.sum(F.col("dx") * F.col("dx")).alias("sxx"),
        F.sum(F.col("dy") * F.col("dy")).alias("syy"),
        F.sum(F.col("dx") * F.col("dy")).alias("sxy"),
    )
    num = (F.col("m") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    vx = (F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    vy = (F.col("m") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    return a.select(
        F.col("m").alias("n_edges"),
        F.when(
            (vx > 0) & (vy > 0), num / (F.sqrt(vx) * F.sqrt(vy))
        ).alias("r"),
    )


def dag_layers(edges: DataFrame, n_rounds: int = 10) -> DataFrame:
    """(id, layer): longest-path depth of every vertex in a DAG after
    ``n_rounds`` of synchronous relaxation — layer 0 = no incoming edge,
    layer k = 1 + max over in-neighbors. Takes (a, b) edges ORIENTED a → b
    (any orientation that cannot cycle, e.g. low-id → high-id); exact for
    DAGs of depth ≤ n_rounds, capped-at-n_rounds otherwise (fixed-round
    semantics, like sssp — the oracle unrolls the same rounds). This is the
    topological WAVE number: vertices in the same layer have no path
    between them, so a build/ingest scheduler can process each layer as one
    parallel batch — the dependency-depth audit of a KG import DAG.

    Scale shape per round: one equi-join of the vertex-sized (id, layer)
    table against the persisted edge list + one max-groupBy with map-side
    combine; layers are small ints, never wide payloads. localCheckpoint
    caps the growing lineage exactly as pagerank/sssp do."""
    e = edges.filter(F.col("a") != F.col("b")).select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    ).distinct().repartition("src").persist()
    verts = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    layer = verts.withColumn("layer", F.lit(0))
    for _ in range(n_rounds):
        cand = layer.join(e, layer["id"] == e["src"]).select(
            F.col("dst").alias("id"), (F.col("layer") + F.lit(1)).alias("layer")
        )
        layer = (
            layer.unionByName(cand)
            .groupBy("id")
            .agg(F.max("layer").alias("layer"))
            .localCheckpoint()
        )
    e.unpersist()
    return layer


def cooccurrence_edges(
    df: DataFrame,
    id_col: str,
    text_col: str,
    vocab_size: int = 40,
    min_docs: int = 5,
    checkpoint: bool = True,
) -> DataFrame:
    """Term co-occurrence edge construction over a document corpus — the
    text-side analogue of the KG edge builder (the reference links entities
    that appear in the same object; here the edge (a, b, n_docs) counts
    documents where both vocabulary terms occur). Vocabulary is pruned to
    the top ``vocab_size`` terms by document frequency (ties by term), so
    the classic co-occurrence blow-up is bounded by construction.

    Scale shape: the (doc, term) incidence is filtered by a BROADCAST join
    against the tiny vocab before the pair expansion, so each doc expands to
    at most C(vocab_size, 2) pairs regardless of corpus size; the self-join
    is an equi-join on doc id over the persisted incidence (never recompute
    the lineage twice, never all-pairs on terms). Two shuffles total: one on
    doc id for the pair join, one on (a, b) for the count."""
    from raptor_spark.operators.text import words_col

    terms = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(words_col(F.col(text_col)))).alias("term"),
    )
    vocab = (
        terms.groupBy("term")
        .agg(F.count("*").alias("df"))
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(vocab_size)
        .select("term")
    )
    inc = terms.join(F.broadcast(vocab), "term").persist()
    pairs = (
        inc.select("id", F.col("term").alias("a"))
        .join(inc.select("id", F.col("term").alias("b")), "id")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
    )
    if not checkpoint:
        # lazy plan for inspection/composition; caller owns inc's lifetime
        return pairs
    out = pairs.localCheckpoint()
    inc.unpersist()
    return out


def local_clustering(edges: DataFrame) -> DataFrame:
    """(id, degree, n_tri, lcc): per-node triangle counts and local
    clustering coefficient lcc = 2·n_tri / (degree·(degree−1)) — the
    node-level refinement of triangle_stats' one global number (which
    cluster cores are dense vs which nodes are pure bridges). lcc = 0 for
    degree < 2 nodes.

    Same hub-safe enumeration as triangle_stats: edges oriented low→high
    by (degree, id) bound the wedge fan-out at O(√E) per source and count
    each triangle ONCE — then each triangle is exploded to its three
    members (map-side, ×3) and rolled up per node, so the per-node counts
    cost one extra node-keyed shuffle over the triangle set (triangles,
    not wedges — the closed subset only)."""
    sym = symmetrize(edges).persist()
    deg = sym.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("degree"))

    ranked = sym.join(deg.withColumnRenamed("id", "src"), "src").select(
        "src",
        "dst",
        F.struct(
            F.col("degree").alias("d"), F.col("src").cast("string").alias("i")
        ).alias("rk_src"),
    )
    dst_rank = deg.select(
        F.col("id").alias("dst"),
        F.struct(
            F.col("degree").alias("d"), F.col("id").cast("string").alias("i")
        ).alias("rk_dst"),
    )
    directed = (
        ranked.join(dst_rank, "dst")
        .filter(F.col("rk_src") < F.col("rk_dst"))
        .select("src", "dst", "rk_dst")
    ).persist()

    e1 = directed.select(
        F.col("src").alias("a"), F.col("dst").alias("b"), F.col("rk_dst").alias("rk_b")
    )
    e2 = directed.select(
        F.col("src").alias("a"), F.col("dst").alias("c"), F.col("rk_dst").alias("rk_c")
    )
    wedges = e1.join(e2, "a").filter(F.col("rk_b") < F.col("rk_c"))
    closing = directed.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    triangles = wedges.join(closing, ["b", "c"], "left_semi")
    per_node = (
        triangles.select(
            F.explode(F.array(F.col("a"), F.col("b"), F.col("c"))).alias("id")
        )
        .groupBy("id")
        .agg(F.count("*").alias("n_tri"))
    )
    out = (
        deg.join(per_node, "id", "left")
        .select(
            "id",
            "degree",
            F.coalesce("n_tri", F.lit(0)).cast("long").alias("n_tri"),
            F.when(
                F.col("degree") >= 2,
                2.0
                * F.coalesce("n_tri", F.lit(0))
                / (F.col("degree") * (F.col("degree") - 1)).cast("double"),
            )
            .otherwise(F.lit(0.0))
            .alias("lcc"),
        )
    )
    return out


def deterministic_walks(
    edges: DataFrame,
    walk_len: int = 4,
) -> DataFrame:
    """(walk_id, step, node): one fixed-length random walk per vertex over
    the symmetrized edge list — the DeepWalk/node2vec sampling stage that
    turns a graph into a training corpus (walks feed a skip-gram embedder
    exactly like sentences do). Long format: step 0 is the start vertex.

    Determinism contract (CLAUDE.md: content-derived only, no rand()):
    the next hop is the argmin of an integer LCG key
    ``(1103515245*dst + 12345*step + 31*walk_id) % 2147483647`` over the
    current vertex's neighbors, ties to the smaller dst — pure BIGINT
    arithmetic both engines compute bit-identically (a seeded-rand()
    chooser would be engine-private; xxhash64 has no DuckDB twin). The
    walk never dies: on a symmetrized graph every vertex keeps degree
    >= 1.

    Scale shape: the edge list is repartitioned by src once and
    persisted; each of the K steps is one equi-join on the current
    vertex plus a walk-keyed min(struct) aggregate (map-side combined,
    walk-cardinality shuffle). K is small and fixed — the frontier stays
    at |V| rows forever, unlike BFS whose frontier grows."""
    sym = symmetrize(edges)
    links = sym.repartition("src").persist()
    cur = links.select(F.col("src").alias("walk_id")).distinct().select(
        "walk_id", F.col("walk_id").alias("node")
    )
    out = cur.select("walk_id", F.lit(0).alias("step"), "node")
    for step in range(1, walk_len + 1):
        key = (
            F.lit(1103515245) * F.col("dst")
            + F.lit(12345) * F.lit(step)
            + F.lit(31) * F.col("walk_id")
        ) % F.lit(2147483647)
        cur = (
            cur.join(links, cur["node"] == links["src"])
            .groupBy("walk_id")
            .agg(F.min(F.struct(key.alias("k"), F.col("dst"))).alias("m"))
            .select("walk_id", F.col("m.dst").alias("node"))
            .localCheckpoint()
        )
        out = out.unionByName(
            cur.select("walk_id", F.lit(step).alias("step"), "node")
        )
    links.unpersist()
    return out


def minimum_spanning_forest(
    edges: DataFrame, weight_col: str = "w", max_rounds: int = 20
) -> DataFrame:
    """(a, b, w) edge rows of the minimum spanning forest — Boruvka's
    algorithm, the one MST formulation that is shuffle-parallel (Kruskal
    needs a global sequential union-find scan; Prim grows one frontier).
    The KG use: single-linkage clustering over near-dup distances — the MSF
    plus a cut threshold IS hierarchical clustering's dendrogram, and the
    forest is the cheapest certificate connecting every entity cluster
    (reference analog: the ANN-dedup insert path's "connect to nearest
    existing neighbor" decision, api_insert.py:130-165, made globally
    consistent).

    Determinism: edges are compared under the TOTAL order
    (w, least(a,b), greatest(a,b)). A total order makes the MSF unique
    (tie-broken Boruvka = tie-broken Kruskal — pytest replays 20 random
    graphs against a pure-Python Kruskal), so output is independent of
    partitioning and engine. Parallel duplicate edges min-merge up front.

    Per Boruvka round (≤ ⌈log2 V⌉ rounds — components at least halve):

    * label every surviving edge with its endpoints' components — two
      vertex-sized equi-joins against the (id, comp) map;
    * each component selects its minimum cross-component edge under the
      total order — one window argmax over component-keyed rows (the
      classic per-key argmin, never an all-pairs form);
    * selected edges join the forest; components merge by chosen-neighbor
      pointer jumping run TO FIXPOINT — the chosen-edge functional graph
      has non-increasing edge order along any chain, so its only cycles
      are mutual 2-cycles, broken toward the smaller component id; each
      jump squares the pointer depth (comp-sized self-joins, geometric
      convergence), and partial contraction is never allowed to leak into
      the next round's edge selection (a partially-merged label would
      re-select an intra-cluster edge and break the forest property).

    Every round localCheckpoints the (id, comp) map and the accumulated
    forest to cut lineage, the same discipline as cc/pagerank. At
    10^12-edge scale each round is 2 edge-sized hash joins + 1 window +
    O(log V) comp-sized self-joins; the edge list itself is never
    re-shuffled (it stays partitioned by its join key)."""
    und = (
        edges.filter(F.col("a") != F.col("b"))
        .select(
            F.least("a", "b").alias("u"),
            F.greatest("a", "b").alias("v"),
            F.col(weight_col).alias("w"),
        )
        .groupBy("u", "v")
        .agg(F.min("w").alias("w"))
        .persist()
    )
    comp = (
        und.select(F.col("u").alias("id"))
        .unionByName(und.select(F.col("v").alias("id")))
        .distinct()
        .withColumn("comp", F.col("id"))
        .localCheckpoint()
    )
    spark = edges.sparkSession
    forest = spark.createDataFrame(
        [], und.schema
    ).select(F.col("u").alias("a"), F.col("v").alias("b"), "w")
    for _ in range(max_rounds):
        lab = (
            und.join(
                comp.select(F.col("id").alias("u"), F.col("comp").alias("cu")),
                "u",
            )
            .join(
                comp.select(F.col("id").alias("v"), F.col("comp").alias("cv")),
                "v",
            )
            .filter(F.col("cu") != F.col("cv"))
            .persist()
        )
        if lab.isEmpty():
            lab.unpersist()
            break
        cand = lab.select(
            F.col("cu").alias("comp"), "u", "v", "w", F.col("cv").alias("other")
        ).unionByName(
            lab.select(
                F.col("cv").alias("comp"), "u", "v", "w",
                F.col("cu").alias("other"),
            )
        )
        pick = (
            cand.withColumn(
                "rn",
                F.row_number().over(
                    Window.partitionBy("comp").orderBy("w", "u", "v")
                ),
            )
            .filter(F.col("rn") == 1)
            .drop("rn")
            .localCheckpoint()
        )
        lab.unpersist()
        forest = forest.unionByName(
            pick.select(
                F.col("u").alias("a"), F.col("v").alias("b"), "w"
            ).distinct()
        ).localCheckpoint()
        # chosen-neighbor pointer map; mutual 2-cycles root at the smaller id
        p = pick.select("comp", F.col("other").alias("p"))
        mutual = p.alias("x").join(
            p.alias("y"),
            (F.col("x.p") == F.col("y.comp")) & (F.col("y.p") == F.col("x.comp")),
            "left_semi",
        )
        p = (
            p.join(
                mutual.select(F.col("comp").alias("mc")),
                p["comp"] == F.col("mc"),
                "left",
            )
            .select(
                "comp",
                F.when(
                    F.col("mc").isNotNull() & (F.col("comp") < F.col("p")),
                    F.col("comp"),
                )
                .otherwise(F.col("p"))
                .alias("p"),
            )
            .localCheckpoint()
        )
        while True:
            p2 = (
                p.alias("x")
                .join(
                    p.alias("y").withColumnRenamed("comp", "c2"),
                    F.col("x.p") == F.col("c2"),
                    "left",
                )
                .select(
                    F.col("x.comp").alias("comp"),
                    F.coalesce(F.col("y.p"), F.col("x.p")).alias("p"),
                )
                .localCheckpoint()
            )
            moved = (
                p2.alias("n")
                .join(p.alias("o"), F.col("n.comp") == F.col("o.comp"))
                .filter(F.col("n.p") != F.col("o.p"))
                .isEmpty()
            )
            p = p2
            if moved:
                break
        comp = (
            comp.join(
                p.withColumnRenamed("comp", "c").withColumnRenamed("p", "root"),
                comp["comp"] == F.col("c"),
                "left",
            )
            .select("id", F.coalesce("root", "comp").alias("comp"))
            .localCheckpoint()
        )
    und.unpersist()
    return forest


def transitive_closure(edges: DataFrame, max_doublings: int = 10) -> DataFrame:
    """(src, dst) rows of the PROPER reachability relation src →+ dst over
    a DAG — the subsumption closure a KG type hierarchy answers "is-a"
    queries from (reference analog: the taxonomy walk behind concept
    tagging's parent rollup, api_search.py:201-240, materialized instead
    of re-walked per query).

    Log-doubling, the Spark-shaped formulation: R₁ = E, R_{2k} = R_k ∪
    (R_k ∘ R_k), so depth-D reachability needs ⌈log₂ D⌉ self-joins rather
    than D one-hop iterations — each round is ONE equi-join of the closure
    against itself on the midpoint vertex plus a distinct, and the loop
    exits at the fixpoint (count stops growing), so the result is exact
    for any depth ≤ 2^max_doublings. localCheckpoint per round cuts the
    doubled lineage exactly as cc/pagerank do.

    Scale contract: the OUTPUT is the closure itself — Σ|ancestor set|
    rows. For the tree-like ontologies this models that is O(depth × V)
    (bounded, small); for dense DAGs it is inherently quadratic in
    component size, which no algorithm avoids — cap upstream (the KG
    pipeline's component census exists for exactly that audit). Cycles in
    the input would make the closure reflexive and the fixpoint still
    converges (reachability is finite); the DAG contract just keeps
    src ≠ dst meaningful."""
    r = (
        edges.filter(F.col("a") != F.col("b"))
        .select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .distinct()
        .localCheckpoint()
    )
    n = r.count()
    for _ in range(max_doublings):
        step = (
            r.alias("x")
            .join(
                r.alias("y").withColumnRenamed("src", "mid"),
                F.col("x.dst") == F.col("mid"),
            )
            .select(F.col("x.src").alias("src"), F.col("y.dst").alias("dst"))
        )
        r = (
            r.unionByName(step)
            .filter(F.col("src") != F.col("dst"))
            .distinct()
            .localCheckpoint()
        )
        n2 = r.count()
        if n2 == n:
            break
        n = n2
    return r


def landmark_distances(
    edges: DataFrame, landmarks: DataFrame, max_hops: int = 4
) -> DataFrame:
    """(lm, id, dist): exact hop distance from every landmark to every
    vertex within ``max_hops``, the landmark/distance-sketch table of
    web-graph systems (Das Sarma et al., WSDM'10): at query time
    d(u,v) ≈ min_lm d(u,lm)+d(lm,v) — an all-pairs oracle from |L|
    BFS frontiers instead of |V|.

    Same level-synchronous discipline as bfs_levels but keyed by
    (vertex, landmark): each round joins only the NEWLY discovered
    (id, lm) frontier against the symmetrized edges, anti-joins the
    visited set, and localCheckpoints to truncate lineage. All shuffles
    carry (id, lm[, dist]) integer rows; distances are integers end to
    end, so the oracle replay is exact. Rounds = max_hops (bounded by
    design: sketches truncate the frontier, not the graph)."""
    sym = symmetrize(edges).persist()
    visited = (
        landmarks.select("id")
        .distinct()
        .select(F.col("id"), F.col("id").alias("lm"))
        .withColumn("dist", F.lit(0))
        .localCheckpoint()
    )
    frontier = visited.select("id", "lm")
    for hop in range(1, max_hops + 1):
        nxt = (
            frontier.join(sym, frontier["id"] == sym["src"])
            .select(F.col("dst").alias("id"), "lm")
            .distinct()
            .join(visited.select("id", "lm"), ["id", "lm"], "left_anti")
            .withColumn("dist", F.lit(hop))
            .localCheckpoint()
        )
        if nxt.isEmpty():
            break
        visited = visited.unionByName(nxt).localCheckpoint()
        frontier = nxt.select("id", "lm")
    sym.unpersist()
    return visited


def label_spreading(
    edges: DataFrame, seeds: DataFrame, n_iter: int = 5
) -> DataFrame:
    """(id, score): semi-supervised label spreading (Zhu/Ghahramani
    harmonic propagation) over the symmetrized graph — seeds carry a
    clamped binary label score (0.0/1.0), every other vertex starts at
    0.5 and repeatedly takes the MEAN of its neighbors' scores; after
    ``n_iter`` rounds the score is a soft class posterior that decays
    with graph distance from the seed classes. This is the
    classification face of the graph family (pagerank = importance,
    ppr = seed relevance, lpa = unsupervised communities; this =
    label transfer from a labeled seed set — how a KG propagates a
    trusted quality/spam mark through near-dup structure).

    Per round: one edges⋈scores join + one vertex-keyed avg + a
    seed-clamp left join (seed frame broadcast), localCheckpoint to
    truncate lineage — the same per-round shape and cost as pagerank.
    Seeds absent from the graph are dropped (semi-join), so the score
    domain is exactly the graph's vertex set on both engines."""
    links = symmetrize(edges).persist()
    vertices = links.select(F.col("src").alias("id")).distinct()
    seedf = F.broadcast(
        seeds.select("id", F.col("label").cast("double").alias("seed_score"))
        .distinct()
        .join(vertices, "id", "semi")
        .localCheckpoint()
    )
    scores = vertices.join(seedf, "id", "left").select(
        "id", F.coalesce("seed_score", F.lit(0.5)).alias("score")
    ).localCheckpoint()
    for _ in range(n_iter):
        nbr = (
            links.join(scores, links["src"] == scores["id"])
            .groupBy(F.col("dst").alias("id"))
            .agg(F.avg("score").alias("nbr_avg"))
        )
        scores = nbr.join(seedf, "id", "left").select(
            "id", F.coalesce("seed_score", "nbr_avg").alias("score")
        ).localCheckpoint()
    links.unpersist()
    return scores


def ktruss_edges(
    edges: DataFrame, k: int = 3, max_rounds: int = 6
) -> DataFrame:
    """(a, b): the k-truss of the graph — the maximal subgraph where
    every edge sits in ≥ k−2 triangles WITHIN the subgraph, the
    edge-cohesion core that k-core (vertex degrees) cannot see: a hub
    joined by degree-1 spokes survives a 2-core but has no truss. The
    standard community-core primitive for KG cluster hardening
    (Cohen '08).

    Peeling loop: per round, per-edge support = |N(a) ∩ N(b)| inside the
    surviving edge set via two adjacency equi-joins on the wedge vertex,
    then drop edges below k−2 and repeat — removal cascades, so the loop
    runs to fixpoint (early-exits when a round removes nothing;
    ``max_rounds`` bounds the unrolled oracle replay, and the fixpoint
    is reached well inside it on near-dup graphs — extra rounds are
    no-ops). All joins shuffle (int, int) rows; localCheckpoint per
    round truncates lineage; counts are integers, so the oracle replay
    is exact."""
    cur = (
        edges.select(F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint()
    )
    for _ in range(max_rounds):
        adj = cur.select(F.col("a").alias("u"), F.col("b").alias("w")).unionByName(
            cur.select(F.col("b").alias("u"), F.col("a").alias("w"))
        )
        sup = (
            cur.join(
                adj.select(F.col("u").alias("a"), F.col("w").alias("wa")),
                "a",
            )
            .join(
                adj.select(F.col("u").alias("b"), F.col("w").alias("wb")),
                "b",
            )
            .filter(F.col("wa") == F.col("wb"))
            .groupBy("a", "b")
            .agg(F.count("*").alias("support"))
        )
        nxt = (
            cur.join(sup, ["a", "b"], "left")
            .filter(F.coalesce(F.col("support"), F.lit(0)) >= k - 2)
            .select("a", "b")
            .localCheckpoint()
        )
        if nxt.count() == cur.count():
            cur = nxt
            break
        cur = nxt
    return cur


def link_training_pairs(
    edges: DataFrame, neg_consts: tuple[tuple[int, int], ...] = ((31, 17), (61, 43))
) -> DataFrame:
    """(a, b, label): link-prediction training pairs — every positive
    edge (label 1) plus deterministic negative samples (label 0) drawn
    by integer congruential mixing instead of rand(), the repo's
    determinism rule (content-derived only, so the oracle replays every
    sample bit-for-bit and an incremental rebuild emits identical
    training data). For each positive (a,b) and each (p,q) in
    ``neg_consts``: candidate = vertex at dense rank
    (rank(a)·p + rank(b)·q) mod |V|; kept iff it isn't a, isn't b, and
    (min,max) isn't an actual edge (anti-join) — the standard corrupt-
    one-endpoint negative sampler of KG-embedding training (TransE et
    al.), ~|consts| negatives per positive before collisions.

    The dense vertex index comes from relational.global_ranks (per-
    range-partition row_numbers + broadcast offsets — no single-
    partition exchange at ANY |V|, the r3 watch item; ranks depend only
    on the id total order, so the oracle replay is unchanged).
    Everything else is equi-joins and integer arithmetic."""
    from raptor_spark.operators.relational import global_ranks

    pos = (
        edges.select(
            F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    verts = (
        pos.select(F.col("a").alias("id"))
        .unionByName(pos.select(F.col("b").alias("id")))
        .distinct()
    )
    n_v = verts.agg(F.count("*").alias("n_v"))
    idx = global_ranks(verts, ["id"]).select(
        "id", (F.col("r") - 1).alias("rk")
    )
    ranked = (
        pos.join(idx.select(F.col("id").alias("a"), F.col("rk").alias("ra")), "a")
        .join(idx.select(F.col("id").alias("b"), F.col("rk").alias("rb")), "b")
        .crossJoin(F.broadcast(n_v))
    )
    negs = None
    for p, q in neg_consts:
        cand = ranked.select(
            "a",
            "b",
            ((F.col("ra") * p + F.col("rb") * q) % F.col("n_v")).alias("rc"),
        ).join(
            idx.select(F.col("rk").alias("rc"), F.col("id").alias("c")), "rc"
        )
        pair = cand.filter(
            (F.col("c") != F.col("a")) & (F.col("c") != F.col("b"))
        ).select(
            F.least("a", "c").alias("a"), F.greatest("a", "c").alias("b")
        )
        negs = pair if negs is None else negs.unionByName(pair)
    negs = (
        negs.distinct()
        .join(pos, ["a", "b"], "left_anti")
        .withColumn("label", F.lit(0))
    )
    return pos.withColumn("label", F.lit(1)).unionByName(negs)


MIS_PRIORITY_MOD = 1_000_000_007
MIS_PRIORITY_MULT = 2_654_435_761


def _mis_priority(col):
    """Deterministic vertex priority: (id mod p) · c mod p with p prime —
    a permutation of Z_p, so distinct ids below p never tie (content-derived
    determinism rule: no rand(), the oracle replays every priority in the
    same BIGINT arithmetic; products stay < p·c ≈ 2.7e18 < 2^63 under ANSI
    mode). Ties from ids ≥ p wrapping are still broken by id in the
    comparison, so the output is well-defined for any id domain."""
    return (col % MIS_PRIORITY_MOD) * MIS_PRIORITY_MULT % MIS_PRIORITY_MOD


def maximal_independent_set(edges: DataFrame, max_rounds: int = 8) -> DataFrame:
    """(id, round): a maximal independent set of the undirected graph —
    the classic parallel primitive behind symbol-table anchor selection
    (pick one canonical representative per neighborhood such that no two
    picked entities are near-dups of each other; every unpicked entity has
    a picked neighbor to attach to).

    Greedy MIS under a deterministic priority permutation (Blelloch/
    Fineman/Shun's parallel greedy MIS — Luby's algorithm with the random
    draws replaced by a fixed hash permutation, the repo's determinism
    rule): each round selects every still-alive vertex that is a LOCAL
    MINIMUM of (priority, id) among its alive neighbors (isolated alive
    vertices select trivially), then removes the selected set and its
    neighborhood. Local minima under a permutation are an independent set
    by construction, and every removed vertex is selected-or-adjacent-to-
    selected, so when the alive set empties the result is maximal. Random-
    permutation greedy MIS completes in O(log n) rounds w.h.p.; the round
    cap keeps the loop equal to the oracle's fixed unroll (an empty alive
    set makes further rounds no-ops, so early exit is output-identical).

    Per round: one edge×alive double semi-equi-join + one distinct on the
    dominated-vertex set + two anti-joins — all shuffles are on vertex
    ids, nothing ever materializes a neighborhood list, and the alive
    frame shrinks geometrically. localCheckpoint per round truncates the
    iterative lineage (same discipline as kcore/pagerank)."""
    sym = symmetrize(edges).persist()
    alive = (
        sym.select(F.col("src").alias("id"))
        .distinct()
        .select("id", _mis_priority(F.col("id")).alias("pr"))
        .localCheckpoint()
    )
    # Start from an empty frame with the output schema (id type inherited
    # from the edge ids) so an empty graph returns an empty DataFrame, not
    # None (ADVICE r3: callers chaining .select()/.orderBy() crashed).
    picked = alive.select("id", F.lit(0).cast("int").alias("round")).limit(0)
    for rnd in range(1, max_rounds + 1):
        if alive.isEmpty():
            break
        # vertices with an alive (priority, id)-smaller neighbor: dominated
        dominated = (
            sym.join(
                alive.select(F.col("id").alias("src"), F.col("pr").alias("ps")),
                "src",
            )
            .join(
                alive.select(F.col("id").alias("dst"), F.col("pr").alias("pd")),
                "dst",
            )
            .filter(
                (F.col("pd") < F.col("ps"))
                | ((F.col("pd") == F.col("ps")) & (F.col("dst") < F.col("src")))
            )
            .select(F.col("src").alias("id"))
            .distinct()
        )
        sel = alive.join(dominated, "id", "left_anti").select(
            "id", F.lit(rnd).alias("round")
        ).localCheckpoint()
        picked = picked.unionByName(sel)
        nbrs = (
            sym.join(
                sel.select(F.col("id").alias("src")), "src", "left_semi"
            )
            .select(F.col("dst").alias("id"))
            .distinct()
        )
        alive = (
            alive.join(sel.select("id"), "id", "left_anti")
            .join(nbrs, "id", "left_anti")
            .localCheckpoint()
        )
    else:
        # Loop hit the cap without draining: the result is independent but
        # only guaranteed MAXIMAL if the loop converged (ADVICE r3).
        if not alive.isEmpty():
            import logging

            logging.getLogger(__name__).warning(
                "maximal_independent_set: %d rounds exhausted with alive "
                "vertices remaining; result is independent but not maximal",
                max_rounds,
            )
    sym.unpersist()
    return picked


def greedy_coloring(edges: DataFrame, max_rounds: int = 12) -> DataFrame:
    """(id, color): a proper vertex coloring by Jones-Plassmann rounds
    under the same deterministic priority permutation as
    maximal_independent_set — the conflict-scheduling primitive (color
    classes are independent sets, so every class can be processed
    concurrently with no two near-dup docs in the same batch: write-
    partitioning for idempotent catalog merges, embarrassingly-parallel
    re-extraction waves).

    Each round the still-uncolored vertices that are local
    (priority, id)-minima among their UNCOLORED neighbors take
    color = round and retire — unlike MIS, their neighbors stay for
    later rounds. Adjacent vertices can never retire in the same round
    (one dominates the other), so same-color ⇒ non-adjacent: proper by
    construction. Under a random permutation the expected round count is
    O(log n / log log n)-ish on bounded-degree graphs; the cap keeps the
    loop equal to the oracle's fixed unroll (empty alive ⇒ no-op rounds),
    and a vertex still alive at the cap is simply absent — callers treat
    missing as overflow (none at the query's graph size, pinned by the
    oracle row count).

    Same per-round shape as MIS: edge×alive double semi-join, distinct
    dominated set, one anti-join; alive shrinks every round (each
    round's minima are nonempty on any finite nonempty alive set)."""
    sym = symmetrize(edges).persist()
    alive = (
        sym.select(F.col("src").alias("id"))
        .distinct()
        .select("id", _mis_priority(F.col("id")).alias("pr"))
        .localCheckpoint()
    )
    # Empty-graph-safe init, same rationale as maximal_independent_set.
    colored = alive.select("id", F.lit(0).cast("int").alias("color")).limit(0)
    for rnd in range(1, max_rounds + 1):
        if alive.isEmpty():
            break
        dominated = (
            sym.join(
                alive.select(F.col("id").alias("src"), F.col("pr").alias("ps")),
                "src",
            )
            .join(
                alive.select(F.col("id").alias("dst"), F.col("pr").alias("pd")),
                "dst",
            )
            .filter(
                (F.col("pd") < F.col("ps"))
                | ((F.col("pd") == F.col("ps")) & (F.col("dst") < F.col("src")))
            )
            .select(F.col("src").alias("id"))
            .distinct()
        )
        sel = alive.join(dominated, "id", "left_anti").select(
            "id", F.lit(rnd).alias("color")
        ).localCheckpoint()
        colored = colored.unionByName(sel)
        alive = alive.join(sel.select("id"), "id", "left_anti").localCheckpoint()
    sym.unpersist()
    return colored


def diameter_double_sweep(edges: DataFrame, max_rounds: int = 20) -> DataFrame:
    """One row (start, mid, far, diameter_lb): the classic double-sweep
    diameter lower bound — BFS from a deterministic start vertex (the
    smallest id in the LARGEST connected component's BFS tree is
    unnecessary; we sweep from min(id) of the whole graph), take the
    farthest vertex (ties to smallest id), BFS again from there, and
    report the farthest distance reached. On real graphs the double
    sweep is usually exact or within 1 of the true diameter (Magnien/
    Latapy/Habib) at the cost of TWO BFS instead of all-pairs — the only
    diameter estimate that survives a 10^12-edge graph. Covers only the
    start vertex's component (its own contract — run per component for
    a census; component_census already audits sizes).

    Both sweeps are the level-synchronous bfs_levels frontier (one
    edge-keyed join + vertex groupBy per level, localCheckpoint lineage
    truncation); argmax vertices are decided on (level desc, id asc) via
    a 1-row TakeOrdered, never a global window."""
    sym = symmetrize(edges).persist()
    start_row = sym.select(F.min("src").alias("id")).collect()[0]
    if start_row.id is None:
        sym.unpersist()
        return edges.sparkSession.createDataFrame(
            [], "start long, mid long, far long, diameter_lb int"
        )
    start = int(start_row.id)
    spark = edges.sparkSession

    def _sweep(src_id):
        lv = bfs_levels(
            sym.select(F.col("src").alias("a"), F.col("dst").alias("b")),
            spark.createDataFrame([(src_id,)], "id long"),
            max_levels=max_rounds,
        )
        far = lv.orderBy(F.desc("level"), F.asc("id")).limit(1).collect()[0]
        return int(far.id), int(far.level)

    mid, _ = _sweep(start)
    far, diam = _sweep(mid)
    sym.unpersist()
    return spark.createDataFrame(
        [(start, mid, far, diam)], "start long, mid long, far long, diameter_lb int"
    )


def harmonic_centrality(
    edges: DataFrame, landmarks: DataFrame, max_hops: int = 4
) -> DataFrame:
    """(id, n_reached, harmonic_x12, harmonic): landmark-approximated
    harmonic centrality — C_H(v) = Σ_landmarks 1/d(lm, v) over the
    landmarks that reach v within ``max_hops`` (Boldi/Vigna's centrality
    of choice for disconnected web graphs: unreachable pairs contribute
    0 instead of breaking the mean, and the landmark sample replaces the
    all-sources sum — the only form that survives 10^12 edges).

    Exactness discipline: 1/d is NOT summed in floating point (a
    Σ(1/3)-style sum is association-order sensitive cross-engine) —
    the sum is carried as the exact integer Σ LCM(1..max_hops)/d
    (harmonic_x12 for the default max_hops=4, d ∈ {1,2,3,4} →
    {12,6,4,3}) and divided ONCE for display. Self-distances (d=0,
    the landmark itself) are excluded per the definition. One groupBy
    over the landmark_distances sketch table."""
    import math

    lcm = math.lcm(*range(1, max_hops + 1))
    dists = landmark_distances(edges, landmarks, max_hops=max_hops)
    per = (
        dists.filter(F.col("dist") > 0)
        .groupBy("id")
        .agg(
            F.count("*").cast("long").alias("n_reached"),
            F.sum(F.floor(F.lit(lcm) / F.col("dist")).cast("long"))
            .cast("long")
            .alias("harmonic_x12"),
        )
    )
    return per.select(
        "id",
        "n_reached",
        "harmonic_x12",
        F.round(F.col("harmonic_x12") / F.lit(float(lcm)), 6).alias("harmonic"),
    )


def hub_robustness(
    edges: DataFrame, removals: tuple[int, ...] = (0, 3, 6)
) -> DataFrame:
    """(k_removed, n_vertices, n_components, largest_cc): targeted-attack
    robustness of the graph — recompute connected components after
    deleting the top-k-degree hubs (ties by smaller id first) for each k
    in ``removals``. Scale-free graphs (KG symbol graphs, near-dup
    graphs with template heads) shatter under hub removal while random
    graphs barely notice (Albert/Jeong/Barabási); a corpus whose
    near-dup structure collapses at k=3 is held together by a template,
    not by genuine duplication — the structural twin of the
    component_census size audit.

    Per k: one TakeOrdered top-k of the degree table (never a global
    sort), two broadcast anti-joins to drop hub endpoints, then the
    shared cc.connected_components pointer-jumping loop. The hub list is
    a k-row broadcast; everything else is the CC machinery's own
    shapes."""
    from raptor_spark.cc import connected_components

    sym = symmetrize(edges).persist()
    deg = sym.groupBy(F.col("src").alias("id")).agg(
        F.count("*").alias("degree")
    ).localCheckpoint()
    spark = edges.sparkSession
    out_rows = None
    for k in removals:
        hubs = (
            deg.orderBy(F.desc("degree"), F.asc("id")).limit(k).select("id")
            if k > 0
            else spark.createDataFrame([], "id long")
        )
        kept = (
            sym.join(
                F.broadcast(hubs.select(F.col("id").alias("src"))),
                "src",
                "left_anti",
            )
            .join(
                F.broadcast(hubs.select(F.col("id").alias("dst"))),
                "dst",
                "left_anti",
            )
            .filter(F.col("src") < F.col("dst"))
            .select(F.col("src").alias("a"), F.col("dst").alias("b"))
        )
        comp = connected_components(kept)
        stats = comp.groupBy("component").agg(F.count("*").alias("sz")).agg(
            F.count("*").cast("long").alias("n_components"),
            F.coalesce(F.max("sz"), F.lit(0)).cast("long").alias("largest_cc"),
            F.coalesce(F.sum("sz"), F.lit(0)).cast("long").alias("n_vertices"),
        ).select(
            F.lit(k).alias("k_removed"), "n_vertices", "n_components",
            "largest_cc",
        )
        out_rows = stats if out_rows is None else out_rows.unionByName(stats)
    result = out_rows.localCheckpoint()
    sym.unpersist()
    return result


def local_bridges(edges: DataFrame) -> DataFrame:
    """(a, b): the local bridges of the undirected graph — edges whose
    endpoints share NO other common neighbor (span > 2, Granovetter's
    weak ties): remove one and its endpoints' shortest reconnection is
    ≥ 3 hops. In the near-dup graph these are the edges that alone
    stitch two otherwise-unrelated duplicate groups — exactly the
    edges a chaining audit inspects first (and the complement of
    ktruss_edges, whose every edge closes a triangle: k-truss ∩
    local-bridges = ∅ by definition, pinned in pytest).

    One wedge join: an edge (a, b) is a bridge iff no vertex w is a
    neighbor of both — left-anti join of the edge list against the
    triangle-closing wedge set (same degree-bounded shapes as
    triangle_stats)."""
    sym = symmetrize(edges).persist()
    und = sym.filter(F.col("src") < F.col("dst")).select(
        F.col("src").alias("a"), F.col("dst").alias("b")
    )
    closed = (
        sym.select(F.col("src").alias("a"), F.col("dst").alias("w"))
        .join(sym.select(F.col("src").alias("b"), F.col("dst").alias("w")), "w")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    out = und.join(closed, ["a", "b"], "left_anti").localCheckpoint()
    sym.unpersist()
    return out
