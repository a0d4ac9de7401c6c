"""Window / top-k / grouping operators mapped from the reference (SURVEY.md
§2.4-2.6): latest-version lookup, top-k by score, set-dedup aggregates,
fixed-size grouping, greedy budget grouping, hierarchical roll-up, adaptive
thresholds.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def latest_per_key(df: DataFrame, keys: list[str], order: list[Column]) -> DataFrame:
    """Latest-version lookup: ``ORDER BY ... DESC LIMIT 1`` per key
    (asset_management/database.py:146-182). Ties must be broken by a unique
    column in ``order`` for determinism."""
    w = Window.partitionBy(*keys).orderBy(*order)
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


def topk_per_group(
    df: DataFrame, keys: list[str], order: list[Column], k: int, rank_name: str = "rank"
) -> DataFrame:
    """Per-group top-k (≙ np.argsort(probs)[::-1][:k],
    svc/audio_classifier_service/processors/classifier.py:66-75)."""
    w = Window.partitionBy(*keys).orderBy(*order)
    return df.withColumn(rank_name, F.row_number().over(w)).filter(F.col(rank_name) <= k)


def budget_groups(
    df: DataFrame,
    partition: list[str],
    order: list[Column],
    weight: Column,
    budget: float,
    out: str = "group_id",
) -> DataFrame:
    """Cumulative-budget grouping: running sum of ``weight`` in ``order`` →
    ``group = floor((cumsum - weight) / budget)`` — the window-function form of
    the reference's greedy token packing (txt_processor.py:55-101, batch
    splitting audio_summary.py:44-65). Subtracting the current weight makes a
    row that crosses the boundary START the next group, matching greedy
    packing for weights ≤ budget."""
    w = Window.partitionBy(*partition).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = F.sum(weight).over(w)
    return df.withColumn(out, F.floor((cum - weight) / F.lit(budget)).cast("int"))


def hierarchical_rollup(
    df: DataFrame,
    text_col: str,
    order_col: str,
    group_size: int,
    reducer: Callable[[Column], Column] | None = None,
    max_rows: int = 1,
    first_group_size: int | None = None,
) -> DataFrame:
    """The 'RAPTOR tree': iteratively reduce rows in groups of ``group_size``
    until ≤ ``max_rows`` remain (document_summary.py:251-267 layer calc,
    319-366 loop; L1 groups of 5 then groups of 4 — pass
    ``first_group_size=5, group_size=4`` for the exact reference shape).

    ``reducer`` maps collect_list(text) → merged text; default concatenates,
    the deterministic stand-in for the reference's LLM summarize call (⚠
    operator, SURVEY.md §2.8). Each level is one groupBy shuffle over data
    that shrinks by group_size× per level → log_k(n) levels total.
    """
    if reducer is None:
        reducer = lambda c: F.concat_ws(" | ", c)  # noqa: E731
    level = 0
    # persist each level before counting it: the loop's count AND the next
    # level's aggregation both consume the frame, and without persistence
    # each level re-executes its ENTIRE unpersisted ancestry — at depth k
    # that rescans the raw input k times (invisible at fixture size, raw-scan
    # dominated at 10^9 rows × log levels)
    cur = df.select(F.col(order_col).alias("idx"), F.col(text_col).alias("text")).persist()
    n = cur.count()
    size = first_group_size or group_size
    while n > max_rows:
        nxt = (
            cur.withColumn("g", F.floor(F.col("idx") / size))
            .groupBy("g")
            .agg(reducer(F.array_sort(F.collect_list(F.struct("idx", "text"))).text).alias("text"))
            .select(F.col("g").alias("idx"), "text")
        ).persist()
        n = nxt.count()
        cur.unpersist()
        cur = nxt
        level += 1
        size = group_size
        if level > 40:
            raise RuntimeError("rollup did not converge")
    out = cur.withColumn("levels", F.lit(level))
    # the final frame stays persisted until the caller's action completes;
    # it is ≤ max_rows rows, so the pinned memory is negligible
    return out


def session_ids(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    gap_s: float = 1800.0,
) -> DataFrame:
    """``df`` + a ``_session`` column: per-key session index by the
    gaps-and-islands rule (new session when the gap to the previous event
    exceeds gap_s). Session MEMBERSHIP is stable under timestamp ties —
    tied rows all get gap 0 and land in the same island — so downstream
    keys built from (_session, key) are deterministic. One per-key window
    pass (the shared builder of sessionize and session-scoped analytics
    like session_type_lift)."""
    w = Window.partitionBy(*keys).orderBy(ts_col)
    gap = F.col(ts_col) - F.lag(ts_col).over(w)
    new_session = F.when(gap.isNull() | (gap > gap_s), 1).otherwise(0)
    return df.withColumn(
        "_session",
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )


def sessionize(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    gap_s: float = 1800.0,
) -> DataFrame:
    """Gaps-and-islands sessionization: consecutive events per key belong to
    one session while inter-event gap ≤ gap_s. Batch twin of the stateful
    streaming operator (raptor_spark.streaming.sessionize_stream); one
    window pass + one groupBy."""
    with_id = session_ids(df, keys, ts_col, gap_s)
    return (
        with_id.groupBy(*keys, "_session")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count("*").alias("n_events"),
        )
        .drop("_session")
    )


def value_runs(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    value_col: str,
    tiebreak: list[str] = (),
) -> DataFrame:
    """Gaps-and-islands VALUE runs: maximal stretches of consecutive rows
    (ordered by ``ts_col`` then ``tiebreak`` within each key) that share the
    same ``value_col``. Output: (keys, value_col, run_start, run_end,
    run_len, run_seq) where run_seq is the run's 1-based position in the
    key's sequence — the deterministic ordering handle even when ``ts_col``
    has ties across adjacent runs (day-resolution change logs). The
    row_number-difference trick — two window passes over ONE
    partitioning of the data plus the final groupBy; no joins, and the
    second window re-uses the first's sort (same partition keys, value
    appended), so Spark plans a single exchange."""
    order = [F.asc(ts_col), *[F.asc(c) for c in tiebreak]]
    w_all = Window.partitionBy(*keys).orderBy(*order)
    w_val = Window.partitionBy(*keys, value_col).orderBy(*order)
    runs = df.withColumn("_rn", F.row_number().over(w_all)).withColumn(
        "_run", F.col("_rn") - F.row_number().over(w_val)
    )
    grouped = runs.groupBy(*keys, value_col, "_run").agg(
        F.min(ts_col).alias("run_start"),
        F.max(ts_col).alias("run_end"),
        F.count("*").alias("run_len"),
        F.min("_rn").alias("_first_rn"),
    )
    w_seq = Window.partitionBy(*keys).orderBy("_first_rn")
    return grouped.withColumn("run_seq", F.row_number().over(w_seq)).drop(
        "_run", "_first_rn"
    )


def scd2_compact(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    attr_col: str,
    tiebreak: list[str] = (),
) -> DataFrame:
    """Collapse an append-only change log into SCD-2 validity intervals:
    consecutive rows with the same ``attr_col`` merge into one version row
    (keys, attr, valid_from, valid_to, n_rows) with half-open validity —
    ``valid_to`` is the start of the NEXT version, NULL for the current one.
    The lakeFS latest-version/history shape (object_store.py:208-269)
    generalized to any attribute. One window pass over the (already tiny)
    run table on top of value_runs' single exchange."""
    runs = value_runs(df, keys, ts_col, attr_col, tiebreak)
    # order versions by run_seq, not run_start: a day-resolution change log
    # can start two adjacent versions on the same timestamp
    w = Window.partitionBy(*keys).orderBy("run_seq")
    return runs.select(
        *keys,
        F.col(attr_col),
        F.col("run_start").alias("valid_from"),
        F.lead("run_start").over(w).alias("valid_to"),
        F.col("run_len").alias("n_rows"),
    )


def grouped_array_mean(
    df: DataFrame, keys: list[str], array_col: str
) -> DataFrame:
    """Element-wise mean of an array column per group — the windowed
    527-class probability mean of the reference's audio classifier
    (processors/classifier.py:107-131: np.mean(frames, axis=0) per 30s
    window), distributed: posexplode → (keys, pos) partial-agg avg →
    re-assemble ordered. Two shuffles, both on scalar rows; never collects
    an array axis to one machine, so the array dimension and the group
    count both scale."""
    ex = df.select(*keys, F.posexplode(array_col).alias("pos", "v"))
    per_pos = ex.groupBy(*keys, "pos").agg(F.avg("v").alias("avg_v"))
    return (
        per_pos.groupBy(*keys)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "avg_v"))),
                lambda s: s.avg_v,
            ).alias("mean_array")
        )
    )


def rollup_time_hierarchy(
    df: DataFrame,
    ts_col: str,
    keys: list[str],
    value_col: str,
    grains: list[str] = ("minute", "hour", "day"),
) -> DataFrame:
    """Hypertable-style multi-granularity rollup: (grain, bucket, keys,
    n, sum_v, min_v, max_v, avg_v) for each grain in the hierarchy.

    Scale shape: the raw table is scanned ONCE at the finest grain; every
    coarser grain re-aggregates the finer grain's partials (sum-of-sums,
    count-of-counts) — the continuous-aggregate trick. Each level's input is
    the previous level's output (orders of magnitude smaller), so the cost
    after level 1 is negligible and no grain re-shuffles raw rows.
    """
    finest = grains[0]
    cur = (
        df.groupBy(
            F.date_trunc(finest, F.col(ts_col)).alias("bucket"), *keys
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(value_col).alias("sum_v"),
            F.min(value_col).alias("min_v"),
            F.max(value_col).alias("max_v"),
        )
    )
    levels = [cur.withColumn("grain", F.lit(finest))]
    for g in grains[1:]:
        cur = (
            cur.groupBy(F.date_trunc(g, F.col("bucket")).alias("bucket"), *keys)
            .agg(
                F.sum("n").alias("n"),
                F.sum("sum_v").alias("sum_v"),
                F.min("min_v").alias("min_v"),
                F.max("max_v").alias("max_v"),
            )
        )
        levels.append(cur.withColumn("grain", F.lit(g)))
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return out.withColumn("avg_v", F.col("sum_v") / F.col("n"))


def ewma_by_key(
    df: DataFrame,
    keys: list[str],
    order_cols: list[str],
    value_col: str,
    alpha: float,
) -> DataFrame:
    """(keys..., n, ewma): final exponentially-weighted moving average of
    each key's time-ordered value sequence — s_i = α·x_i + (1−α)·s_{i-1}
    with s_1 = x_1, the classic level estimate for per-entity drift
    tracking. An EWMA is inherently order-recursive (no closed-form window
    frame without overflow-prone power weights), so this uses the
    collect-and-fold shape: one groupBy shuffle carrying (key, order,
    value) rows, then a JVM-side higher-order fold over the sorted array —
    no UDF, no second shuffle. Assumes per-key history fits one task (the
    sessionize contract); the fold is a LEFT fold, the same association
    DuckDB's list_reduce replays bit-for-bit.
    """
    seq = F.array_sort(
        F.collect_list(
            F.struct(
                *[F.col(c).alias(f"o{i}") for i, c in enumerate(order_cols)],
                F.col(value_col).alias("v"),
            )
        )
    )
    g = df.groupBy(*keys).agg(seq.alias("seq"), F.count("*").alias("n"))
    g = g.select(
        *keys, "n", F.transform("seq", lambda s: s["v"]).alias("vals")
    )
    rest = F.slice(F.col("vals"), F.lit(2), F.greatest(F.size("vals") - 1, F.lit(0)))
    fold = F.aggregate(
        rest,
        F.element_at("vals", 1),
        lambda acc, x: F.lit(alpha) * x + F.lit(1.0 - alpha) * acc,
    )
    return g.select(*keys, "n", fold.alias("ewma"))


def table_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """(keys..., change, old/new compare values): keyed snapshot diff
    between two versions of a table — ``change`` ∈ {insert, delete,
    update}; unchanged rows are dropped. The CDC primitive of incremental
    materialization: its output is exactly what Catalog.merge consumes,
    and it is the read-side inverse of the catalog's snapshot history (≙
    diffing two lakeFS commits, object_store.py:208-269).

    One full-outer equi-join on the key (co-partitioned shuffle both
    sides, AQE-skew-splittable); presence is tracked by literal marker
    columns (key columns coalesce across sides, so null-keyed inputs never
    masquerade as inserts), and updates are detected with null-safe
    equality over the compared columns only — the payloads never join, so
    wide tables diff at key+compared-column width."""
    om = old.select(
        *[F.col(k) for k in keys],
        F.lit(1).alias("__old"),
        *[F.col(c).alias(f"old_{c}") for c in compare_cols],
    )
    nm = new.select(
        *[F.col(k) for k in keys],
        F.lit(1).alias("__new"),
        *[F.col(c).alias(f"new_{c}") for c in compare_cols],
    )
    j = om.join(nm, keys, "full_outer")
    # empty compare_cols = presence-only diff (insert/delete, never update)
    differs = F.lit(False)
    for c in compare_cols:
        d = ~F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
        differs = differs | d
    change = (
        F.when(F.col("__old").isNull(), F.lit("insert"))
        .when(F.col("__new").isNull(), F.lit("delete"))
        .when(differs, F.lit("update"))
    )
    return (
        j.withColumn("change", change)
        .filter(F.col("change").isNotNull())
        .drop("__old", "__new")
    )


def adaptive_threshold(
    df: DataFrame, col: str, quantile: float = 0.5, sigma_mult: float = 0.5
) -> float:
    """Adaptive cutoff = quantile + sigma_mult·stddev, the scene-detection
    thresholding pattern (svc/video_scene_detection_service/
    scene_detection.py:137-144: median + 0.5σ). Uses exact percentile —
    swap to percentile_approx for very large inputs."""
    row = df.select(
        F.expr(f"percentile({col}, {quantile})").alias("q"),
        F.stddev_pop(col).alias("s"),
    ).first()
    return float(row.q) + sigma_mult * float(row.s or 0.0)


def cohort_retention(
    df: DataFrame, user_col: str, ts_col: str
) -> DataFrame:
    """Classic cohort-retention matrix: users are cohorted by their first
    active day; for each (cohort_day, day_offset) report how many cohort
    members were active and the retained fraction. The product-analytics
    read path every event warehouse serves (the events-table counterpart
    of the reference's per-user query history, SURVEY.md §2.4).

    Scale shape: one distinct over (user, day) — the only corpus-sized
    shuffle; the first-day table is user-sized and the cohort-size table
    cohort-sized (both broadcastable); the final aggregate is matrix-sized.
    Retained fraction is rounded so the 4-dp value is the contract."""
    act = df.select(
        F.col(user_col).alias("user"), F.to_date(ts_col).alias("day")
    ).distinct()
    first = act.groupBy("user").agg(F.min("day").alias("cohort_day"))
    sizes = first.groupBy("cohort_day").agg(
        F.countDistinct("user").alias("cohort_n")
    )
    ret = (
        act.join(first, "user")
        .groupBy(
            "cohort_day",
            F.datediff("day", "cohort_day").alias("day_offset"),
        )
        .agg(F.countDistinct("user").alias("n_active"))
    )
    return ret.join(F.broadcast(sizes), "cohort_day").select(
        F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
        F.col("day_offset").cast("long").alias("day_offset"),
        F.col("n_active").cast("long").alias("n_active"),
        F.col("cohort_n").cast("long").alias("cohort_n"),
        F.round(F.col("n_active") / F.col("cohort_n"), 4).alias("retention"),
    )


def basket_lift(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 3,
) -> DataFrame:
    """Association-rule lift over unordered item pairs within a basket:
    lift(a,b) = P(a,b) / (P(a)·P(b)) with probabilities over baskets —
    the market-basket co-occurrence audit (which item pairs travel
    together more than independence predicts), the relational twin of
    bigram PMI.

    Scale shape: one basket-keyed shuffle collapses the fact table to
    per-basket distinct item SETS (collect_set dedups presence); the
    unordered-pair explosion is map-side over those small arrays (fan-out
    bounded by basket size squared, ~4 items/basket here); the pair
    aggregation and the item marginals are item-dimension-sized and
    broadcast back. Nothing basket-count-sized is ever joined to itself.
    """
    sets = (
        df.groupBy(F.col(basket_col).alias("basket"))
        .agg(F.sort_array(F.collect_set(F.col(item_col))).alias("items"))
        .persist()
    )
    # two-arg transform lambda receives (element, 0-based index); slice is
    # 1-based, so i+2 starts just past the current element -> a < b pairs
    pairs = sets.select(
        F.explode(
            F.flatten(
                F.transform(
                    "items",
                    lambda x, i: F.transform(
                        F.slice(F.col("items"), i + 2, F.size("items")),
                        lambda y: F.struct(x.alias("a"), y.alias("b")),
                    ),
                )
            )
        ).alias("pr")
    ).select("pr.a", "pr.b")
    co = pairs.groupBy("a", "b").agg(F.count("*").alias("n_co"))
    marg = (
        sets.select(F.explode("items").alias("item"))
        .groupBy("item")
        .agg(F.count("*").alias("n_item"))
    )
    tot = sets.agg(F.count("*").alias("n_baskets"))
    return (
        co.filter(F.col("n_co") >= min_support)
        .join(
            F.broadcast(marg.select(F.col("item").alias("a"), F.col("n_item").alias("n_a"))),
            "a",
        )
        .join(
            F.broadcast(marg.select(F.col("item").alias("b"), F.col("n_item").alias("n_b"))),
            "b",
        )
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("a").alias("item_a"),
            F.col("b").alias("item_b"),
            "n_co",
            "n_a",
            "n_b",
            "n_baskets",
            (
                F.col("n_co") * F.col("n_baskets").cast("double")
                / (F.col("n_a") * F.col("n_b"))
            ).alias("lift"),
        )
    )


def rfm_segments(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    amount_col: str,
    n_tiles: int = 5,
) -> DataFrame:
    """RFM customer segmentation rolled up to segment cells: score each
    entity 1..n_tiles on Recency (latest activity), Frequency (event
    count), and Monetary (amount sum) via ntile, then count entities and
    average spend per (r, f, m) cell — the classic behavioral-cohort
    audit (555 = best customers, 111 = churned low-value).

    Determinism: ntile assignment within ties depends on row order, so
    every ntile orders by (value, entity id) — a total order any engine
    replays identically (ANSI ntile: equal buckets, remainder to the
    leading ones). The monetary sum is floating point whose tail bits
    depend on partial-aggregation order, so its ntile orders by the
    EXACT integer-cents key round(m·100) — engines then sort identical
    values. (Assumes 2-decimal amounts; pass a pre-scaled integer column
    otherwise.)

    Scale shape: one entity-keyed shuffle builds the per-entity RFM
    table (entity-dimension-sized); the three ntile windows are global
    single-partition windows BY DESIGN over that table — fine at the
    dimension tier; for billion-entity scale swap ntile for
    percentile-cut joins; the output is ≤ n_tiles³ cells."""
    from pyspark.sql.window import Window

    per = df.groupBy(F.col(key_col).alias("k")).agg(
        F.max(F.col(ts_col)).alias("r_val"),
        F.count("*").alias("f_val"),
        F.sum(F.col(amount_col)).alias("m_val"),
    )
    scored = (
        per.withColumn(
            "r_score",
            F.ntile(n_tiles).over(Window.orderBy(F.col("r_val"), F.col("k"))),
        )
        .withColumn(
            "f_score",
            F.ntile(n_tiles).over(Window.orderBy(F.col("f_val"), F.col("k"))),
        )
        .withColumn(
            "m_score",
            F.ntile(n_tiles).over(
                Window.orderBy(
                    F.round(F.col("m_val") * 100, 0).cast("long"), F.col("k")
                )
            ),
        )
    )
    return scored.groupBy("r_score", "f_score", "m_score").agg(
        F.count("*").alias("n_entities"),
        F.avg("m_val").alias("avg_monetary"),
    )


def pareto_frontier(
    df: DataFrame,
    x_col: str,
    y_col: str,
    id_col: str,
) -> DataFrame:
    """2-D skyline (Pareto frontier): rows not dominated on (minimize x,
    maximize y). Row A dominates B iff x_A <= x_B AND y_A >= y_B with at
    least one strict; equal (x, y) pairs do not dominate each other, so
    exact duplicates both survive. Inputs should be exact integers (cents,
    days) so the two-window rule replays bit-for-bit in SQL.

    The sweep rule per row: dominated iff max(y) over STRICTLY smaller x
    >= y, or max(y) over x <= current > y — two RANGE-frame window maxes
    over one sort by x.

    Scale shape: two-phase. Phase 1 prunes locally per partition after a
    repartitionByRange on x (dominance is transitive, so any row dominated
    within ANY subset is dominated globally — local pruning is sound and
    typically leaves O(skyline) survivors per partition). Phase 2 runs the
    exact rule over survivors in one small global window. The result is
    partition-count invariant; only the survivor set between phases
    varies."""
    from pyspark.sql import Window

    x, y = F.col(x_col), F.col(y_col)

    def keep_rule(w_base: Window) -> Column:
        strictly_less = w_base.rangeBetween(Window.unboundedPreceding, -1)
        up_to = w_base.rangeBetween(Window.unboundedPreceding, 0)
        m1 = F.max(y).over(strictly_less)
        m2 = F.max(y).over(up_to)
        return (m1.isNull() | (m1 < y)) & (m2 <= y)

    local = df.repartitionByRange(x).withColumn("_pid", F.spark_partition_id())
    survivors = (
        local.withColumn(
            "_keep", keep_rule(Window.partitionBy("_pid").orderBy(x))
        )
        .filter("_keep")
        .drop("_pid", "_keep")
    )
    # survivors are skyline-sized: the exact global pass coalesces them
    return (
        survivors.coalesce(1)
        .withColumn("_keep", keep_rule(Window.orderBy(x)))
        .filter("_keep")
        .select(id_col, x_col, y_col)
    )


def bloom_semi_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    m_bits: int = 1 << 20,
    k: int = 3,
) -> DataFrame:
    """Semi-join ``big`` to ``small`` on ``key`` with a Bloom pre-filter —
    the classic runtime-filter join (what Spark's AQE runtime filters and
    every warehouse's bloom-join do, made explicit as an operator): a
    ≤ m/63-row bitmap built from the small side's distinct keys is
    broadcast and probed MAP-SIDE on the big side, so the expensive
    shuffle of the big relation carries only rows that (probably) have a
    partner — at a 1e-5-ish false-positive rate the shuffle shrinks to
    the true match set, the difference between shipping 100 TB and
    shipping the answer. The exact semi-join then runs on the survivors,
    removing false positives — output ≡ ``big.join(small, key,
    "left_semi")`` exactly (the oracle's plain semi-join), the bloom pass
    costs only CPU.

    Reuses the decontamination bitmap machinery (curation.bloom_build's
    word-packed layout, md5 positions — byte-reproducible in SQL)."""
    from raptor_spark.operators.curation import (
        BLOOM_WORD_BITS,
        _bloom_pos,
        bloom_from_keys,
    )

    bitmap = bloom_from_keys(small, key, m_bits=m_bits, k=k).localCheckpoint()
    probe = big.withColumn("__s", F.col(key).cast("string"))
    hits = []
    for i in range(1, k + 1):
        probe = probe.withColumn(f"__p{i}", _bloom_pos(F.col("__s"), i, m_bits))
        side = bitmap.select(
            F.col("word_idx").alias(f"__w{i}"), F.col("word").alias(f"__wd{i}")
        )
        probe = probe.join(
            F.broadcast(side),
            F.expr(f"__p{i} div {BLOOM_WORD_BITS}") == F.col(f"__w{i}"),
            "left",
        )
        hits.append(
            F.coalesce(
                F.expr(
                    f"(shiftright(__wd{i}, CAST(__p{i} % {BLOOM_WORD_BITS} AS INT))"
                    " & 1L) = 1L"
                ),
                F.lit(False),
            )
        )
    flagged = hits[0]
    for h in hits[1:]:
        flagged = flagged & h
    pruned = probe.filter(flagged).select(*big.columns)
    return pruned.join(
        small.select(key).distinct(), key, "left_semi"
    )


def global_ranks(df: DataFrame, order_cols: list[str], n_parts: int = 32) -> DataFrame:
    """Dense 1-based global ranks under the total order ``order_cols``
    WITHOUT a single-partition window: repartitionByRange on the order
    columns, per-partition row_numbers in parallel, one |partitions|-row
    count collect, broadcast offsets composed back on. Ranks depend only
    on the total order (the caller supplies a tie-free column list),
    never on where range boundaries land — partition-count invariant.
    The global-sort primitive shared by sorted-neighborhood blocking and
    quantile normalization."""
    from pyspark.sql.window import Window

    part = df.repartitionByRange(n_parts, *order_cols).withColumn(
        "__pid", F.spark_partition_id()
    )
    local = part.withColumn(
        "__lr",
        F.row_number().over(Window.partitionBy("__pid").orderBy(*order_cols)),
    ).localCheckpoint()
    counts = sorted(
        (r["__pid"], r["c"])
        for r in local.groupBy("__pid").agg(F.count("*").alias("c")).collect()
    )
    offsets, acc = [], 0
    for pid, c in counts:
        offsets.append((pid, acc))
        acc += c
    spark = df.sparkSession
    off_df = F.broadcast(
        spark.createDataFrame(offsets, "__pid int, __off long")
    )
    return (
        local.join(off_df, "__pid")
        .withColumn("r", F.col("__off") + F.col("__lr"))
        .drop("__pid", "__lr", "__off")
    )


def incremental_agg_merge(
    prev: DataFrame, delta: DataFrame, keys: list[str], sum_cols: list[str]
) -> DataFrame:
    """Incremental view maintenance for additive aggregates: merge a
    previously MATERIALIZED per-key aggregate with a new delta batch's
    aggregate — full-outer join on the keys, each sum column
    coalesce(prev, 0) + coalesce(delta, 0). For any additive measure
    (counts, sums, integer-cents revenue) the merge is EXACTLY the
    recompute over base ∪ delta, so a 100 TB aggregate never re-reads
    its history: the stored table absorbs each micro-batch at delta
    cost (the aggregate-level face of the pipeline's checkpoint-restart
    and the catalog's keyed MERGE — and what streaming's
    stream_merge_to_catalog does per trigger, exposed as a batch
    operator).

    Shape: one key-hash shuffle of two ALREADY-AGGREGATED (key-sized)
    tables — the corpus itself is only touched by the delta's own
    aggregation."""
    d = delta.select(
        *keys, *[F.col(c).alias(f"__d_{c}") for c in sum_cols]
    )
    merged = prev.join(d, keys, "full_outer")
    return merged.select(
        *keys,
        *[
            (
                F.coalesce(F.col(c), F.lit(0))
                + F.coalesce(F.col(f"__d_{c}"), F.lit(0))
            ).cast("long").alias(c)
            for c in sum_cols
        ],
    )


def touch_attribution(
    df: DataFrame,
    user_col: str,
    id_col: str,
    ts_col: str,
    type_col: str,
    conv_type: str,
    window_s: int = 600,
    max_touches: int = 5,
) -> DataFrame:
    """Multi-touch conversion attribution — for every conversion event,
    credit the ≤ ``max_touches`` most recent preceding events of OTHER
    types within ``window_s`` seconds, under the three standard models at
    once: last-touch (all credit to the nearest), first-touch (all to
    the earliest in the capped window), linear (equal shares). Linear
    shares are carried as the exact integer 60/n per touch
    (LCM(1..5) = 60 — no 1/3-style FP credit ever sums), so every
    output column is BIGINT. Output per touch type:
    (type, n_touches, last_credit, first_credit, linear_credit_x60).

    Shape: one user-key equi-join (the time predicate filters inside the
    per-user join group — bounded by per-user activity, the sessionize
    contract), one per-conversion window for recency ranks."""
    from pyspark.sql.window import Window

    ts = F.col(ts_col).cast("timestamp").cast("double")
    base = df.select(
        F.col(user_col).alias("u"),
        F.col(id_col).alias("eid"),
        F.col(type_col).alias("etype"),
        ts.alias("t"),
    )
    conv = base.filter(F.col("etype") == conv_type).select(
        F.col("u"), F.col("eid").alias("cid"), F.col("t").alias("ct")
    )
    touch = base.filter(F.col("etype") != conv_type)
    joined = touch.join(conv, "u").filter(
        (F.col("t") < F.col("ct")) & (F.col("t") >= F.col("ct") - window_s)
    )
    w = Window.partitionBy("cid").orderBy(F.desc("t"), F.desc("eid"))
    ranked = joined.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= max_touches
    )
    nw = Window.partitionBy("cid")
    marked = ranked.withColumn("n", F.max("rn").over(nw))
    lcm = 60
    return (
        marked.groupBy(F.col("etype").alias(type_col))
        .agg(
            F.count("*").cast("long").alias("n_touches"),
            F.sum((F.col("rn") == 1).cast("int")).cast("long").alias("last_credit"),
            F.sum((F.col("rn") == F.col("n")).cast("int")).cast("long").alias("first_credit"),
            F.sum(F.floor(F.lit(lcm) / F.col("n")).cast("long")).cast("long").alias("linear_credit_x60"),
        )
    )
