"""Dataset-profiling and event-analytics operators.

* ``profile_columns`` — one-pass per-column profile (nulls, distincts,
  min/max rendered as strings) in long format: the data-quality audit a
  100 TB ingest runs before anything else. One aggregate job for ALL
  columns (a per-column loop of jobs is the driver-side anti-pattern);
  distincts are exact here — swap count_distinct for approx_count_distinct
  at the billion-row tier if ±2% is acceptable.
* ``grouped_numeric_stats`` — per-group dispersion + association stats
  (stddev/variance/skew proxy via Pearson corr of value against time).
* ``funnel_stages`` — ordered multi-step funnel (view → click → purchase)
  per user: earliest timestamp of each step that respects the order of the
  previous one, then per-user furthest-stage. Three groupBy passes on the
  user key (one per step), each a partial-aggregated shuffle — never a
  window over the whole event history and never a driver-side loop.

The reference keeps per-stage processing stats in MySQL
(database.py:146-182 status rollups); these generalize that audit surface
to arbitrary tables.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """(column, n_rows, n_nulls, n_distinct, min_s, max_s) per column, in
    ONE aggregate pass; min/max cast to string so heterogeneous column
    types share a schema (the long-format profile table)."""
    aggs = [F.count("*").alias("n_rows")]
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
            F.count_distinct(F.col(c)).alias(f"{c}__distinct"),
            F.min(F.col(c)).cast("string").alias(f"{c}__min"),
            F.max(F.col(c)).cast("string").alias(f"{c}__max"),
        ]
    wide = df.agg(*aggs)
    rows = [
        F.struct(
            F.lit(c).alias("column"),
            F.col("n_rows").alias("n_rows"),
            F.col(f"{c}__nulls").alias("n_nulls"),
            F.col(f"{c}__distinct").alias("n_distinct"),
            F.col(f"{c}__min").alias("min_s"),
            F.col(f"{c}__max").alias("max_s"),
        )
        for c in cols
    ]
    return wide.select(F.explode(F.array(*rows)).alias("p")).select("p.*")


def grouped_numeric_stats(
    df: DataFrame, keys: list[str], value_col: str, t_col: str
) -> DataFrame:
    """Per-group (n, mean, stddev_samp, var_samp, corr(value, t)) — the
    distribution fingerprint used to detect drift between ingest batches."""
    return df.groupBy(*keys).agg(
        F.count("*").alias("n"),
        F.avg(value_col).alias("mean"),
        F.stddev_samp(value_col).alias("stddev"),
        F.var_samp(value_col).alias("variance"),
        F.corr(value_col, t_col).alias("corr_t"),
    )


def funnel_stages(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
    within_s: float | None = None,
) -> DataFrame:
    """(user, stage) where stage = number of funnel steps completed IN ORDER
    (step i counts only if it happens at-or-after the earliest qualifying
    step i-1 — and, when ``within_s`` is set, no later than within_s seconds
    after it: the conversion window). Users with zero step-0 events are
    absent (stage would be 0).

    Each step is: filter to the step's events, join the per-user frontier
    timestamp (result of the previous step — always ≤ |users| rows), take
    min ts ≥ frontier. The frontier is an equi-join on the user key (AQE
    broadcasts it while it fits; at a 10^9-user tier it degrades to a
    co-partitioned shuffle join, never a window over full event history);
    the event side is scanned once per step with the type filter pushed
    down to the source."""
    ev = df.select(
        F.col(user_col).alias("u"),
        F.col(ts_col).alias("t"),
        F.col(type_col).alias("et"),
    )
    frontier = (
        ev.filter(F.col("et") == steps[0]).groupBy("u").agg(F.min("t").alias("ft"))
    )
    stages = [frontier.select("u", F.lit(1).alias("stage"), "ft")]
    for i, step in enumerate(steps[1:], start=2):
        prev = stages[-1].select("u", "ft")
        cond = F.col("t") >= F.col("ft")
        if within_s is not None:
            cond = cond & (F.col("t") <= F.col("ft") + within_s)
        nxt = (
            ev.filter(F.col("et") == step)
            .join(prev, "u")
            .filter(cond)
            .groupBy("u")
            .agg(F.min("t").alias("ft"))
            .select("u", F.lit(i).alias("stage"), "ft")
        )
        stages.append(nxt)
    all_stages = reduce(lambda a, b: a.unionByName(b), stages)
    return (
        all_stages.groupBy("u")
        .agg(F.max("stage").alias("stage"))
        .select(F.col("u").alias(user_col), "stage")
    )


def transition_counts(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    state_col: str,
) -> DataFrame:
    """(from_state, to_state, n, p): first-order Markov transition table of
    consecutive states within each key's ordered sequence — the behavioral
    companion of funnel_stages (the funnel checks ONE prescribed path; the
    transition matrix measures every observed one). ``p`` is the row-
    normalized probability n / Σ n over from_state.

    One window pass keyed by the entity (lead over the per-key ordering —
    exactly one shuffle of (key, order, state) rows), one partial-aggregated
    groupBy on the pair, and a broadcast-sized row-normalizer join (the
    state alphabet is tiny by assumption; the per-key window never sees the
    alphabet, so a hot state does not skew the shuffle). Order columns must
    include a tiebreaker for deterministic sequences."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    pairs = (
        df.select(
            F.col(state_col).alias("from_state"),
            F.lead(state_col).over(w).alias("to_state"),
        )
        .filter(F.col("to_state").isNotNull())
        .groupBy("from_state", "to_state")
        .agg(F.count("*").alias("n"))
    )
    totals = pairs.groupBy("from_state").agg(F.sum("n").alias("row_n"))
    return pairs.join(F.broadcast(totals), "from_state").select(
        "from_state",
        "to_state",
        "n",
        (F.col("n") / F.col("row_n")).alias("p"),
    )


def value_histogram(
    df: DataFrame, value_col: str, lo: float, hi: float, n_bins: int
) -> DataFrame:
    """(bin, lo_edge, hi_edge, n): fixed-range equi-width histogram of a
    numeric column; values outside [lo, hi) clamp into the edge bins so the
    bin count is exactly ``n_bins`` regardless of outliers (the profiling
    sibling of psi_drift's decile grid, for a KNOWN range). Empty bins are
    absent.

    Bin assignment is a map-side floor expression feeding one partial-
    aggregated groupBy — a histogram over 100 TB is one shuffle of at most
    n_bins rows per task."""
    width = (hi - lo) / n_bins
    raw = F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width)).cast("int")
    b = F.least(F.greatest(raw, F.lit(0)), F.lit(n_bins - 1))
    return (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(b.alias("bin"))
        .agg(F.count("*").alias("n"))
        .select(
            "bin",
            F.round(F.lit(lo) + F.col("bin") * F.lit(width), 6).alias("lo_edge"),
            F.round(F.lit(lo) + (F.col("bin") + 1) * F.lit(width), 6).alias("hi_edge"),
            "n",
        )
    )


def grouped_trend(
    df: DataFrame, keys: list[str], t_col: str, value_col: str
) -> DataFrame:
    """(keys..., n, slope, intercept, r2): per-group ordinary-least-squares
    trend of value against time — the drift DIRECTION estimate on top of
    grouped_numeric_stats' dispersion (corr says whether values move with
    time; the slope says how fast, in value units per time unit).

    One partial-aggregated groupBy using the built-in regression aggregates
    (regr_slope/regr_intercept/regr_r2 are single-pass moment sums —
    mergeable partials, so the shuffle carries one row per group)."""
    return df.groupBy(*keys).agg(
        F.count("*").alias("n"),
        F.regr_slope(F.col(value_col), F.col(t_col)).alias("slope"),
        F.regr_intercept(F.col(value_col), F.col(t_col)).alias("intercept"),
        F.regr_r2(F.col(value_col), F.col(t_col)).alias("r2"),
    )


def mad_outliers(
    df: DataFrame, keys: list[str], value_col: str, k: float = 3.0
) -> DataFrame:
    """Rows whose value sits more than ``k`` median-absolute-deviations
    from their group median, with the robust score (x − med) / mad — the
    resistant twin of the z-score filter (a contaminated group inflates its
    own stddev and hides its outliers; the median/MAD pair doesn't move).
    Groups whose MAD is zero flag nothing (every deviation is 'infinite';
    degenerate constant-valued groups shouldn't explode the output).

    Two exact-percentile aggregates (group-count-sized, broadcast back onto
    the stream — the fact side never shuffles); swap percentile for
    percentile_approx at the tier where exact group sort memory hurts."""
    med = df.groupBy(*keys).agg(
        F.expr(f"percentile({value_col}, 0.5)").alias("__med")
    )
    j = df.join(F.broadcast(med), keys)
    mad = j.groupBy(*keys).agg(
        F.expr(f"percentile(abs({value_col} - __med), 0.5)").alias("__mad")
    )
    scored = j.join(F.broadcast(mad), keys).withColumn(
        "robust_z", (F.col(value_col) - F.col("__med")) / F.col("__mad")
    )
    return (
        scored.filter((F.col("__mad") > 0) & (F.abs(F.col("robust_z")) > k))
        .withColumnRenamed("__med", "med")
        .withColumnRenamed("__mad", "mad")
    )


def chi2_independence(
    df: DataFrame, col_a: str, col_b: str
) -> DataFrame:
    """One row (chi2, dof, n): Pearson chi-square statistic for
    independence of two categorical columns — the distribution-shift test
    between a slice key and any second factor (psi_drift scores ONE
    numeric column against a reference slice; this asks whether two
    factors are associated at all).

    One groupBy over the pair (alphabet-sized result), margins re-derived
    from the pair counts (never a second pass over the input), expected
    counts via two broadcast joins of alphabet-sized tables, one final
    single-row aggregate. The input crosses the shuffle once, as counts."""
    pairs = (
        df.select(F.col(col_a).alias("a"), F.col(col_b).alias("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("o"))
        .persist()
    )
    ra = pairs.groupBy("a").agg(F.sum("o").alias("row_n"))
    cb = pairs.groupBy("b").agg(F.sum("o").alias("col_n"))
    tot = pairs.select(F.sum("o").alias("n"))
    scored = (
        pairs.join(F.broadcast(ra), "a")
        .join(F.broadcast(cb), "b")
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "e", F.col("row_n") * F.col("col_n") / F.col("n")
        )
        # (o-e)*(o-e), not **2: Column.__pow__ compiles to Math.pow (1-ulp
        # tolerance) while the oracle multiplies — keep both engines on the
        # exact same multiply
        .withColumn(
            "contrib",
            (F.col("o") - F.col("e")) * (F.col("o") - F.col("e")) / F.col("e"),
        )
    )
    out = scored.agg(
        F.sum("contrib").alias("chi2"),
        (
            (F.count_distinct("a") - 1) * (F.count_distinct("b") - 1)
        ).alias("dof"),
        F.first("n").alias("n"),
    ).localCheckpoint()
    pairs.unpersist()
    return out


def twap_by_key(
    df: DataFrame,
    keys: list[str],
    order_cols: list[str],
    t_col: str,
    value_col: str,
) -> DataFrame:
    """(keys..., n_intervals, twap): TIME-weighted average of each key's
    value series — each observation weighted by how long it was current
    (duration to the next sample), the correct mean for irregularly
    sampled series where the plain average over-weights bursts. The final
    observation has no duration and drops out; keys with a single sample
    are absent. ``order_cols`` must pin a total order (tiebreak beyond the
    timestamp) or tied samples would pair nondeterministically.

    One lead-window pass over the per-key ordering (one shuffle of (key,
    t, value) rows), then a partial-aggregated weighted mean per key."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(*keys).orderBy(*order_cols)
    dt = F.lead(t_col).over(w) - F.col(t_col)
    seg = df.select(*keys, F.col(value_col).alias("v"), dt.alias("dt")).filter(
        F.col("dt").isNotNull()
    )
    return seg.groupBy(*keys).agg(
        F.count("*").alias("n_intervals"),
        (F.sum(F.col("v") * F.col("dt")) / F.sum("dt")).alias("twap"),
    )


def benford_audit(df: DataFrame, value_col: str) -> DataFrame:
    """(digit, n, observed_p, expected_p, deviation): first-significant-
    digit distribution of a positive numeric column against Benford's law
    (expected_p = log10(1 + 1/d)) — the classic fabricated-data /
    unit-mixing audit for financial-style columns. Rows with value ≤ 0 are
    excluded (Benford applies to positive magnitudes).

    The first digit is extracted arithmetically (value / 10^floor(log10 v)
    — no string round-trip), feeding one 9-row groupBy; totals join back
    as a 1-row broadcast. The mantissa is re-normalized into [1, 10)
    before the floor: libm and java.lang.Math may disagree by 1 ulp on
    log10 AT power-of-ten inputs (floor k = j vs j−1), and the correction
    maps both branches to the same digit."""
    v = F.col(value_col)
    m0 = v / F.pow(F.lit(10.0), F.floor(F.log10(v)))
    m = (
        F.when(m0 < 1.0, m0 * 10.0)
        .when(m0 >= 10.0, m0 / 10.0)
        .otherwise(m0)
    )
    counts = (
        df.filter(v > 0)
        .groupBy(F.floor(m).cast("int").alias("digit"))
        .agg(F.count("*").alias("n"))
    )
    tot = counts.select(F.sum("n").alias("total"))
    expected = F.log10(1.0 + 1.0 / F.col("digit"))
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "digit",
            "n",
            (F.col("n") / F.col("total")).alias("observed_p"),
            expected.alias("expected_p"),
            (F.col("n") / F.col("total") - expected).alias("deviation"),
        )
    )


def join_fanout_audit(
    left: DataFrame, right: DataFrame, left_key: str, right_key: str
) -> DataFrame:
    """One row (n_left, n_right, n_left_keys, n_right_keys, max_left_dup,
    max_right_dup, est_join_rows): pre-join cardinality audit — the check
    that catches a fan-out explosion or a hot key BEFORE the join runs
    (est_join_rows = Σ over matched keys of left_dup·right_dup, the exact
    inner-join output size). At 100 TB this costs two key-column
    aggregations instead of an OOM'd shuffle.

    Both sides aggregate to key-cardinality tables (the payloads never
    move); the estimate is one equi-join of those two count tables."""
    lc = left.groupBy(F.col(left_key).alias("k")).agg(
        F.count("*").alias("ln")
    )
    rc = right.groupBy(F.col(right_key).alias("k")).agg(
        F.count("*").alias("rn")
    )
    est = lc.join(rc, "k").select(
        F.sum(F.col("ln") * F.col("rn")).alias("est_join_rows")
    )
    summary = lc.agg(
        F.sum("ln").alias("n_left"),
        F.count("*").alias("n_left_keys"),
        F.max("ln").alias("max_left_dup"),
    ).crossJoin(
        rc.agg(
            F.sum("rn").alias("n_right"),
            F.count("*").alias("n_right_keys"),
            F.max("rn").alias("max_right_dup"),
        )
    )
    return summary.crossJoin(F.broadcast(est)).select(
        "n_left", "n_right", "n_left_keys", "n_right_keys",
        "max_left_dup", "max_right_dup",
        F.coalesce("est_join_rows", F.lit(0)).alias("est_join_rows"),
    )


def gini_concentration(
    df: DataFrame, key_cols: list[str], value_col: str
) -> DataFrame:
    """One row (n, total, gini): Gini coefficient of ``value_col`` summed
    per key — the concentration audit (how unequal is revenue across
    customers / bytes across sources; a corpus where one source owns half
    the tokens has a mixing problem before any quality filter runs).
    G = 2·Σ(i·xᵢ)/(n·Σx) − (n+1)/n over the ascending-sorted per-key
    totals, the exact discrete formula.

    One groupBy to key-cardinality totals, then a rank window over that
    (key-count-sized, NOT corpus-sized — the global sort touches one row
    per key), then a single-row aggregate."""
    from pyspark.sql.window import Window

    totals = df.groupBy(*key_cols).agg(F.sum(value_col).alias("x"))
    w = Window.orderBy("x", *key_cols)
    ranked = totals.select(
        "x", F.row_number().over(w).cast("double").alias("i")
    )
    return ranked.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("total"),
        (
            2.0 * F.sum(F.col("i") * F.col("x")) / (F.count("*") * F.sum("x"))
            - (F.count("*") + 1.0) / F.count("*")
        ).alias("gini"),
    )


def allocate_budget(
    df: DataFrame, key_cols: list[str], budget: int
) -> DataFrame:
    """(keys..., n_rows, quota): apportion an integer ``budget`` across
    groups proportionally to their row counts with the largest-remainder
    (Hamilton) method — quotas sum EXACTLY to the budget, unlike naive
    rounding (the off-by-a-few that breaks 'sample exactly N documents
    across sources'). Deterministic: remainder ties break by key order.

    One groupBy to group-cardinality counts, one rank window over the
    fractional remainders (group-count-sized), no second pass over the
    input."""
    from pyspark.sql.window import Window

    counts = df.groupBy(*key_cols).agg(F.count("*").alias("n_rows"))
    tot = counts.select(F.sum("n_rows").alias("total"))
    shared = counts.crossJoin(F.broadcast(tot)).select(
        *key_cols,
        "n_rows",
        (F.col("n_rows") * F.lit(float(budget)) / F.col("total")).alias("share"),
    )
    base = shared.withColumn("floor_q", F.floor("share").cast("long"))
    w = Window.orderBy(
        F.desc(F.col("share") - F.col("floor_q")), *key_cols
    )
    # the leftover rides an UNPARTITIONED window sum — fine here because
    # the frame is the group-count-sized table, never the input (and it
    # avoids a second pass over base's lineage for a separate aggregate)
    w_all = Window.partitionBy(F.lit(1))
    ranked = base.select(
        *key_cols,
        "n_rows",
        "floor_q",
        F.row_number().over(w).alias("rk"),
        (F.lit(budget) - F.sum("floor_q").over(w_all)).alias("rem"),
    )
    return ranked.select(
        *key_cols,
        "n_rows",
        (
            F.col("floor_q")
            + F.when(F.col("rk") <= F.col("rem"), 1).otherwise(0)
        ).alias("quota"),
    )


def fk_orphans(
    pairs: list[tuple[str, DataFrame, str, DataFrame, str]],
) -> DataFrame:
    """Referential-integrity audit over a star schema: for each
    ``(name, child_df, child_key, parent_df, parent_key)`` relationship,
    count child rows whose key has no parent — the FK check a 100 TB ingest
    runs as an acceptance gate (≙ the reference's insert-time existence
    checks against MySQL lineage, database.py:146-182).

    Scale shape: one LEFT ANTI equi-join per relationship; parent key sets
    are distinct-projected first so the join's build side is the key
    column, not the dimension payload — for dimension-sized parents Spark
    broadcasts it, for fact-sized parents AQE falls back to a shuffled
    anti-join on the key. Output one row per relationship (tiny)."""
    outs = []
    for name, child, ck, parent, pk in pairs:
        keys = parent.select(F.col(pk).alias(ck)).distinct()
        orphans = child.select(ck).join(keys, ck, "left_anti")
        outs.append(
            child.select(F.count("*").alias("n_child"))
            .crossJoin(orphans.select(F.count("*").alias("n_orphans")))
            .select(F.lit(name).alias("relation"), "n_child", "n_orphans")
        )
    return reduce(lambda a, b: a.unionByName(b), outs)


def psi_drift(
    df: DataFrame,
    key_col: str,
    value_col: str,
    ref_value: str,
    n_buckets: int = 10,
) -> DataFrame:
    """Population Stability Index of ``value_col``'s distribution per
    ``key_col`` slice against the ``ref_value`` slice — the drift monitor a
    continuously-ingesting corpus runs per source/day (PSI < 0.1 stable,
    > 0.25 actionable). Buckets are the reference slice's deciles, so the
    reference's own PSI is exactly 0 and every slice is scored on the SAME
    grid.

    Scale shape: the cut points are one n_buckets-1 element row (broadcast
    to every probe row — never a per-row subquery); bucket assignment is a
    JVM-side array filter; the only shuffles are the (key, bucket) count
    and the per-key roll-up. Zero-count buckets are materialized from an
    exploded sequence (a missing bucket must still contribute to the sum)
    and Laplace-smoothed (+0.5) so the log term is always finite.
    """
    probs = ", ".join(str(i / n_buckets) for i in range(1, n_buckets))
    cuts = (
        df.filter(F.col(key_col) == ref_value)
        .agg(F.expr(f"percentile({value_col}, array({probs}))").alias("cuts"))
    )
    bucketed = (
        df.join(F.broadcast(cuts))
        .select(
            F.col(key_col).alias("k"),
            F.size(
                F.filter("cuts", lambda c: c <= F.col(value_col))
            ).alias("bucket"),
        )
        .groupBy("k", "bucket")
        .agg(F.count("*").alias("cnt"))
    )
    keys = df.select(F.col(key_col).alias("k")).distinct()
    grid = keys.crossJoin(
        df.sparkSession.range(1)
        .select(F.explode(F.sequence(F.lit(0), F.lit(n_buckets - 1))).alias("bucket"))
    )
    filled = (
        grid.join(bucketed, ["k", "bucket"], "left")
        .select("k", "bucket", F.coalesce("cnt", F.lit(0)).alias("cnt"))
    )
    tot = filled.groupBy("k").agg(F.sum("cnt").alias("n_docs"))
    p = filled.join(F.broadcast(tot), "k").select(
        "k",
        "bucket",
        "n_docs",
        ((F.col("cnt") + 0.5) / (F.col("n_docs") + 0.5 * n_buckets)).alias("p"),
    )
    ref = p.filter(F.col("k") == ref_value).select(
        "bucket", F.col("p").alias("p_ref")
    )
    return (
        p.join(F.broadcast(ref), "bucket")
        .groupBy("k", "n_docs")
        .agg(
            F.round(
                F.sum((F.col("p") - F.col("p_ref")) * F.log(F.col("p") / F.col("p_ref"))),
                4,
            ).alias("psi")
        )
        .select(F.col("k").alias(key_col), F.col("n_docs").cast("long").alias("n_docs"), "psi")
    )


def interarrival_burstiness(
    df: DataFrame,
    key_cols: list[str],
    slice_col: str,
    ts_col: str,
    order_tiebreak: str,
) -> DataFrame:
    """Goh–Barabási burstiness of inter-arrival times per ``slice_col``:
    B = (σ − μ) / (σ + μ) over the gaps between consecutive events of the
    same ``key_cols`` stream — B ≈ −1 periodic, 0 Poisson, → 1 bursty.
    The stream-health audit that catches replayed/botted event sources a
    mean-rate monitor can't (same rate, different clumping).

    Scale shape: one (key, slice)-partitioned window computes the lag
    gaps (the only corpus-sized shuffle); the roll-up is slice-dimension
    sized. Gaps are exact integer microseconds; only the final moments
    are floating point. Ties in ``ts_col`` are broken by
    ``order_tiebreak``, but gap MULTISETS are tie-order invariant (they
    are differences of the sorted timestamp sequence), so the output is
    deterministic either way."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(*key_cols, "slice").orderBy(
        F.col("t"), F.col(order_tiebreak)
    )
    gaps = (
        df.select(
            F.col(slice_col).alias("slice"),
            *[F.col(c) for c in key_cols],
            F.unix_micros(F.col(ts_col).cast("timestamp")).alias("t"),
            F.col(order_tiebreak),
        )
        .withColumn("gap", F.col("t") - F.lag("t").over(w))
        .filter(F.col("gap").isNotNull())
    )
    mu = F.col("mean_gap_us")
    sd = F.col("sd_gap_us")
    return (
        gaps.groupBy("slice")
        .agg(
            F.count("*").alias("n_gaps"),
            F.avg("gap").alias("mean_gap_us"),
            F.stddev_pop("gap").alias("sd_gap_us"),
        )
        .select(
            "slice",
            "n_gaps",
            (mu / 1e6).alias("mean_gap_s"),
            (sd / mu).alias("cv"),
            ((sd - mu) / (sd + mu)).alias("burstiness"),
        )
    )


def daily_count_series(
    df: DataFrame,
    slice_col: str,
    ts_col: str,
) -> DataFrame:
    """(slice, d, c): zero-filled daily event counts per slice over the
    GLOBAL [min_day, max_day] window — the shared rate-series builder of
    cusum_changepoint and acf_daily (an empty day IS a rate observation).
    One corpus shuffle to (slice, day) counts; the grid is slice-dim ×
    window-days."""
    ev = df.select(
        F.col(slice_col).alias("slice"),
        F.date_trunc("day", F.col(ts_col).cast("timestamp")).cast("date").alias("d"),
    )
    counts = ev.groupBy("slice", "d").agg(F.count("*").alias("c"))
    bounds = ev.agg(F.min("d").alias("min_d"), F.max("d").alias("max_d"))
    grid = (
        ev.select("slice")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "slice",
            F.explode(F.sequence(F.col("min_d"), F.col("max_d"))).alias("d"),
        )
    )
    return grid.join(counts, ["slice", "d"], "left").select(
        "slice", "d", F.coalesce("c", F.lit(0)).cast("long").alias("c")
    )


def cusum_changepoint(
    df: DataFrame,
    slice_col: str,
    ts_col: str,
) -> DataFrame:
    """CUSUM change-point detection on the daily event-rate series per
    ``slice_col``: the bucket i maximizing |S_i|, S_i = Σ_{j≤i}(x_j − x̄),
    is the most likely single change point of the rate (Page's statistic
    over counts). The level-shift audit a trend fit (value_trends) and a
    dispersion monitor both miss.

    Engine-portable by construction: the argmax compares
    T_i = n·cum_i − i·total — exact BIGINT arithmetic, no floating-point
    cumulative sums — so the chosen change point is identical on any
    engine; only the reported magnitudes are doubles. Candidates are
    restricted to i < n (a change after the last bucket is not a change).

    Scale shape: one corpus shuffle to (slice, day) counts; the day grid
    is slice-dim × window-days (zero-filled — an empty day IS a rate
    observation); the cumulative window and argmax run over that tiny
    series table."""
    from pyspark.sql.window import Window

    filled = daily_count_series(df, slice_col, ts_col)
    per = filled.groupBy("slice").agg(
        F.count("*").alias("n"),
        F.sum("c").alias("total"),
        F.stddev_pop("c").alias("sd"),
    )
    w = Window.partitionBy("slice").orderBy("d")
    series = (
        filled.join(F.broadcast(per), "slice")
        .withColumn("i", F.row_number().over(w))
        .withColumn("cum", F.sum("c").over(w))
        .withColumn("t_stat", F.col("n") * F.col("cum") - F.col("i") * F.col("total"))
    )
    pick = Window.partitionBy("slice").orderBy(
        F.abs(F.col("t_stat")).desc(), F.col("d").asc()
    )
    cp = (
        series.filter(F.col("i") < F.col("n"))
        .withColumn("rk", F.row_number().over(pick))
        .filter(F.col("rk") == 1)
    )
    mean_before = F.col("cum") / F.col("i")
    mean_after = (F.col("total") - F.col("cum")) / (F.col("n") - F.col("i"))
    return cp.select(
        F.col("slice"),
        F.col("n").alias("n_days"),
        F.col("d").alias("cp_day"),
        (F.abs(F.col("t_stat")) / F.col("n")).alias("max_cusum"),
        F.when(
            F.col("sd") > 0,
            F.abs(F.col("t_stat"))
            / (F.col("n") * F.col("sd") * F.sqrt(F.col("n"))),
        )
        .otherwise(F.lit(0.0))
        .alias("stat"),
        mean_before.alias("mean_before"),
        mean_after.alias("mean_after"),
        (mean_after - mean_before).alias("shift"),
    )


def ks_drift(
    df: DataFrame,
    slice_col: str,
    value_col: str,
) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov statistic of each slice's
    ``value_col`` distribution against the REST of the corpus:
    D_s = sup_v |F_s(v) − F_rest(v)| — the distribution-free drift audit
    (psi_drift needs a designated reference slice and a bucket grid; KS
    needs neither and is exact).

    Engine-portable by construction: with integer cumulative counts,
    D's numerator t(v) = |n_rest·cum_s(v) − n_s·cum_rest(v)| is exact
    BIGINT, so the sup location (earliest v on ties) is identical on any
    engine; D and the scaled statistic are doubles derived after the
    argmax.

    Scale shape: one corpus shuffle to (slice, value) counts; the
    evaluation grid is slices × distinct values (both sides' step points
    — a slice must be evaluated at every corpus step, including values it
    never takes); cumulative windows and the argmax run over that
    grid-sized table, never the corpus. Contract: the value domain must
    be modest (discrete/integer-ish — e.g. lengths, counts, scores);
    quantize continuous values first or the step grid itself becomes
    corpus-sized (the global cumulative over distinct values is a
    single-partition window by design — it is value-domain-sized)."""
    from pyspark.sql.window import Window

    base = df.select(
        F.col(slice_col).alias("s"), F.col(value_col).alias("v")
    )
    cv = base.groupBy("s", "v").agg(F.count("*").alias("c"))
    gv = cv.groupBy("v").agg(F.sum("c").alias("cg"))
    grid = cv.select("s").distinct().crossJoin(gv.select("v"))
    filled = grid.join(cv, ["s", "v"], "left").select(
        "s", "v", F.coalesce("c", F.lit(0)).cast("long").alias("c")
    )
    ws = Window.partitionBy("s").orderBy("v")
    wg = Window.orderBy("v")
    cum_g = gv.select("v", F.sum("cg").over(wg).alias("cum_g"))
    tot = cv.groupBy("s").agg(F.sum("c").alias("n_s"))
    big_n = cv.agg(F.sum("c").alias("n_all"))
    scored = (
        filled.withColumn("cum_s", F.sum("c").over(ws))
        .join(cum_g, "v")
        .join(F.broadcast(tot), "s")
        .crossJoin(F.broadcast(big_n))
        .withColumn("n_r", F.col("n_all") - F.col("n_s"))
        .withColumn("cum_r", F.col("cum_g") - F.col("cum_s"))
        .withColumn(
            "t",
            F.abs(
                F.col("n_r") * F.col("cum_s") - F.col("n_s") * F.col("cum_r")
            ),
        )
    )
    pick = Window.partitionBy("s").orderBy(F.col("t").desc(), F.col("v").asc())
    cp = scored.withColumn("rk", F.row_number().over(pick)).filter(
        F.col("rk") == 1
    )
    d = F.col("t") / (F.col("n_s").cast("double") * F.col("n_r"))
    return cp.select(
        F.col("s").alias("slice"),
        F.col("n_s"),
        F.col("n_r"),
        F.col("v").alias("at_value"),
        d.alias("ks_d"),
        (
            d
            * F.sqrt(
                F.col("n_s")
                * F.col("n_r")
                / (F.col("n_s") + F.col("n_r")).cast("double")
            )
        ).alias("ks_scaled"),
    )


def acf_daily(
    df: DataFrame,
    slice_col: str,
    ts_col: str,
    max_lag: int = 7,
) -> DataFrame:
    """(slice, lag, n_days, acf): autocorrelation of the zero-filled daily
    event-rate series per slice at lags 1..max_lag — the periodicity
    audit (a weekly-cadence source spikes at lag 7) complementing
    cusum_changepoint (level shifts) and interarrival_burstiness
    (clumping).

    Engine-portable by construction: with x̄ = T/n,
      acf(L)·den = Σ_{i>L} (n·x_i − T)(n·x_{i−L} − T),
      den        = Σ_i    (n·x_i − T)²,
    both exact BIGINT sums (the n² scaling cancels), so the only
    floating-point op is the final division. den = 0 (constant series)
    reports acf = 0.

    Scale shape: the series table is slice-dim × window-days; the lag
    columns are one per-slice ordered window pass and the roll-up is
    slice-dimension sized."""
    from pyspark.sql.window import Window

    filled = daily_count_series(df, slice_col, ts_col)
    per = filled.groupBy("slice").agg(
        F.count("*").alias("n"), F.sum("c").alias("total")
    )
    w = Window.partitionBy("slice").orderBy("d")
    series = filled.join(F.broadcast(per), "slice")
    for lag in range(1, max_lag + 1):
        series = series.withColumn(f"lag{lag}", F.lag("c", lag).over(w))
    dev = F.col("n") * F.col("c") - F.col("total")
    aggs = [
        F.count("*").alias("n_days"),
        F.sum(dev * dev).alias("den"),
    ]
    for lag in range(1, max_lag + 1):
        lag_dev = F.col("n") * F.col(f"lag{lag}") - F.col("total")
        aggs.append(
            F.sum(
                F.when(F.col(f"lag{lag}").isNotNull(), dev * lag_dev).otherwise(
                    F.lit(0)
                )
            ).alias(f"num{lag}")
        )
    agg = series.groupBy("slice").agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(lag).alias("lag"),
                F.col(f"num{lag}").alias("num"),
            )
            for lag in range(1, max_lag + 1)
        ]
    )
    return agg.select(
        "slice", "n_days", "den", F.explode(rows).alias("r")
    ).select(
        "slice",
        F.col("r.lag").alias("lag"),
        "n_days",
        F.when(
            F.col("den") > 0, F.col("r.num") / F.col("den").cast("double")
        )
        .otherwise(F.lit(0.0))
        .alias("acf"),
    )


def fd_strength(
    df: DataFrame,
    lhs_col: str,
    rhs_col: str,
) -> DataFrame:
    """One row: how close ``lhs_col → rhs_col`` is to a functional
    dependency: strength = Σ_lhs max_rhs n(lhs, rhs) / N — the share of
    rows kept by the majority mapping (1.0 = exact FD; the Tane/Metanome
    g₃-style approximate-FD measure). The schema-discovery audit that
    tells a pipeline which columns are derivable vs genuinely
    independent.

    Scale shape: one (lhs, rhs)-keyed corpus shuffle, then a lhs-keyed
    re-aggregation of that pair-dimension table; all counters exact
    BIGINT, one double ratio at the end."""
    pairs = (
        df.groupBy(F.col(lhs_col).alias("lhs"), F.col(rhs_col).alias("rhs"))
        .agg(F.count("*").alias("n"))
    )
    per_lhs = pairs.groupBy("lhs").agg(
        F.max("n").alias("max_n"), F.sum("n").alias("tot_n"),
        F.count("*").alias("n_rhs"),
    )
    return per_lhs.agg(
        F.sum("tot_n").alias("n_rows"),
        F.count("*").alias("n_lhs"),
        F.sum("n_rhs").alias("n_pairs"),
        (F.sum("max_n") / F.sum("tot_n").cast("double")).alias("strength"),
    )


def markov_entropy(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    state_col: str,
) -> DataFrame:
    """One row: entropy rate of the first-order Markov chain of
    ``state_col`` transitions (transition_counts' summary statistic):
    H = −Σ_s π(s) Σ_t p(t|s)·log2 p(t|s) with π the empirical
    from-state mass, plus max_entropy = log2(n_states) and
    predictability = 1 − H/Hmax — one number for "how scriptable is this
    event stream" (bot/replay streams ≈ 1, uniform noise ≈ 0).

    Scale shape: inherits transition_counts' one corpus-keyed window
    shuffle; the entropy reduction runs over the state-alphabet-squared
    table. H = −(1/N)·Σ n_st·log2(n_st/row_n): pure counts inside the
    log, one double sum at the end."""
    tc = transition_counts(df, key_cols, order_cols, state_col)
    return tc.agg(
        F.sum("n").alias("n_transitions"),
        F.count_distinct("from_state").alias("n_states"),
        (
            -F.sum(F.col("n") * F.log2(F.col("p")))
            / F.sum("n").cast("double")
        ).alias("entropy_bits"),
    ).select(
        "n_transitions",
        "n_states",
        "entropy_bits",
        F.log2(F.col("n_states").cast("double")).alias("max_entropy_bits"),
        F.when(
            F.col("n_states") > 1,
            1.0
            - F.col("entropy_bits") / F.log2(F.col("n_states").cast("double")),
        )
        .otherwise(F.lit(1.0))
        .alias("predictability"),
    )


def composition_diversity(
    df: DataFrame,
    group_col: str,
    part_col: str,
) -> DataFrame:
    """Per-group composition diversity over ``part_col`` shares: Shannon
    entropy (bits), Simpson concentration Σp², and the effective number
    of parts exp₂(H) — "how many sources is this language REALLY drawn
    from" (a lang fed 99% by one source has effective count ≈ 1 no
    matter how many nominal sources appear). The training-mix audit
    behind temperature sampling decisions.

    Scale shape: one (group, part)-keyed corpus shuffle; everything else
    re-aggregates that composition-dimension table. Counts exact BIGINT;
    the entropy/Simpson sums are doubles over exact integer ratios."""
    c = df.groupBy(
        F.col(group_col).alias("grp"), F.col(part_col).alias("part")
    ).agg(F.count("*").alias("n"))
    tot = c.groupBy("grp").agg(
        F.sum("n").alias("tot"), F.count("*").alias("n_parts")
    )
    j = c.join(tot, "grp").withColumn(
        "p", F.col("n") / F.col("tot").cast("double")
    )
    return j.groupBy("grp", "tot", "n_parts").agg(
        (-F.sum(F.col("p") * F.log2(F.col("p")))).alias("entropy_bits"),
        F.sum(F.col("p") * F.col("p")).alias("simpson"),
    ).select(
        F.col("grp"),
        F.col("tot").alias("n_rows"),
        "n_parts",
        "entropy_bits",
        "simpson",
        F.pow(F.lit(2.0), F.col("entropy_bits")).alias("effective_parts"),
    )


def spearman_by_slice(
    df: DataFrame,
    slice_col: str,
    x_col: str,
    y_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """(slice, n, spearman): rank correlation of ``y_col`` against
    ``x_col`` per slice — the outlier-robust twin of value_trends' OLS
    slope (a single spike can flip a Pearson trend; it moves one rank
    here). Ranks are row_numbers with a deterministic ``tiebreak_col``,
    so ranks are distinct integers and the classic no-ties identity
    ρ = 1 − 6·Σd² / (n·(n²−1)) is EXACT integer arithmetic until the
    final division (for continuous data the tie-broken variant differs
    from tie-averaged Spearman negligibly; for heavily tied columns use
    a contingency measure instead).

    Scale shape: two rank windows over the same slice partitioning (one
    shuffle — the second window reuses the exchange), then a slice-dim
    aggregation of exact BIGINT d²."""
    from pyspark.sql.window import Window

    base = df.select(
        F.col(slice_col).alias("slice"),
        F.col(x_col).alias("x"),
        F.col(y_col).alias("y"),
        F.col(tiebreak_col).alias("tb"),
    )
    wx = Window.partitionBy("slice").orderBy(F.col("x"), F.col("tb"))
    wy = Window.partitionBy("slice").orderBy(F.col("y"), F.col("tb"))
    ranked = base.select(
        "slice",
        F.row_number().over(wx).alias("rx"),
        F.row_number().over(wy).alias("ry"),
    )
    d = (F.col("rx") - F.col("ry")).cast("long")
    agg = ranked.groupBy("slice").agg(
        F.count("*").alias("n"), F.sum(d * d).alias("sum_d2")
    )
    return agg.select(
        "slice",
        "n",
        F.when(
            F.col("n") > 1,
            1.0
            - 6.0
            * F.col("sum_d2")
            / (F.col("n") * (F.col("n") * F.col("n") - 1)).cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("spearman"),
    )


def measure_consistency(
    parent: DataFrame,
    child_rollup: DataFrame,
    key_col: str,
    group_col: str,
    parent_val: str,
    child_val: str,
    tol: float = 0.05,
) -> DataFrame:
    """Cross-table measure-consistency audit: does a parent table's
    denormalized measure match the rollup of its child rows? Per
    ``group_col``: row count, how many parents fall within ``tol``
    relative agreement, the median parent/child ratio, and the mean
    log10 ratio (symmetric for over/under-statement). The denormalized-
    aggregate drift check (order header total vs line rollup, account
    balance vs ledger sum) that key-level FK audits (fk_orphans) can't
    see.

    Scale shape: the child rollup is one key-keyed shuffle (done by the
    caller — it knows the measure expression); the join is key-keyed;
    the summary is group-dimension sized."""
    j = parent.select(
        F.col(key_col).alias("k"),
        F.col(group_col).alias("grp"),
        F.col(parent_val).alias("pv"),
    ).join(
        child_rollup.select(F.col(key_col).alias("k"), F.col(child_val).alias("cv")),
        "k",
    )
    ratio = F.col("pv") / F.col("cv")
    return (
        j.select("grp", ratio.alias("ratio"))
        .groupBy("grp")
        .agg(
            F.count("*").alias("n_keys"),
            F.sum(
                (
                    (F.col("ratio") >= 1.0 - tol) & (F.col("ratio") <= 1.0 + tol)
                ).cast("long")
            ).alias("n_consistent"),
            F.expr("percentile(ratio, 0.5)").alias("median_ratio"),
            F.avg(F.log10("ratio")).alias("mean_log10_ratio"),
        )
    )


def km_survival(
    subjects: DataFrame,
    duration_col: str = "duration",
    event_col: str = "is_event",
) -> DataFrame:
    """Kaplan-Meier survival table with right censoring: one subject row in
    (integer duration, event flag 1=observed / 0=censored) yields, per
    distinct duration t, the risk set n_risk (subjects still under
    observation at t), events d_events, censorings c_censored, the hazard
    d/n, and the product-limit survival estimate
    S(t) = prod_{s<=t} (1 - d_s/n_s).

    Determinism: durations and counts are exact integers; hazard is one
    exact-int-to-double division; the survival product is computed as
    exp(cumsum(ln((n-d)/n))) over the per-duration table — both engines
    feed libm the identical doubles, and round(6) absorbs ulp drift. A
    duration where the risk set empties (n == d) pins survival to exactly
    0.0 from that row on (no ln(0)).

    Scale shape: one groupBy(duration) shuffle of the subject table; every
    window below runs on the per-duration aggregate (<= max duration rows),
    never on subjects. Subjects themselves are typically the output of a
    groupBy(user) — the caller owns that shuffle."""
    from pyspark.sql import Window

    ev = F.col(event_col).cast("long")
    day = subjects.groupBy(F.col(duration_col).alias("t_day")).agg(
        F.sum(ev).alias("d_events"),
        F.sum(F.lit(1) - ev).alias("c_censored"),
    )
    full = Window.orderBy("t_day").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    before = Window.orderBy("t_day").rowsBetween(Window.unboundedPreceding, -1)
    upto = Window.orderBy("t_day").rowsBetween(Window.unboundedPreceding, 0)
    k = day.withColumn(
        "n_risk",
        F.sum(F.col("d_events") + F.col("c_censored")).over(full)
        - F.coalesce(
            F.sum(F.col("d_events") + F.col("c_censored")).over(before), F.lit(0)
        ),
    )
    ln_term = F.when(
        F.col("n_risk") > F.col("d_events"),
        F.log(
            (F.col("n_risk") - F.col("d_events")).cast("double") / F.col("n_risk")
        ),
    ).otherwise(F.lit(0.0))
    hit_zero = F.max(
        (F.col("n_risk") <= F.col("d_events")).cast("int")
    ).over(upto)
    return k.select(
        "t_day",
        "n_risk",
        "d_events",
        "c_censored",
        F.round(F.col("d_events").cast("double") / F.col("n_risk"), 6).alias(
            "hazard"
        ),
        F.round(
            F.when(hit_zero == 1, F.lit(0.0)).otherwise(
                F.exp(F.sum(ln_term).over(upto))
            ),
            6,
        ).alias("survival"),
    )


def signal_auc(
    df: DataFrame,
    score_col: str,
    label_col: str,
) -> DataFrame:
    """ROC AUC of an INTEGER-valued score predicting a binary label, by the
    rank-sum (Mann-Whitney U) identity with exact tie handling — the
    curation-signal evaluation step: before a quality/length/perplexity
    gate ships, measure how well the signal actually separates the class
    it claims to predict. AUC = P(score_pos > score_neg) + P(equal)/2.

    Exactness contract (CLAUDE.md cross-engine rule): ranks, tie midpoints
    and the U numerator stay in BIGINT end to end — average tie rank is
    kept DOUBLED (2*cum_before + cnt + 1, always integer), so
    2*R_pos - n_pos*(n_pos+1) is one exact integer and the only float op
    is the final division. A double cumulative rank sum would flip tail
    bits across engines; this never rounds until the last step.

    Scale shape: one groupBy(score) shuffle (partial-aggregated), then the
    window + final aggregate run over DISTINCT SCORES only — bounded by
    the score's cardinality, not the row count.
    """
    from pyspark.sql import Window

    g = df.groupBy(F.col(score_col).alias("score")).agg(
        F.count("*").alias("cnt"),
        F.sum(F.col(label_col).cast("long")).alias("pos"),
    )
    w = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, -1)
    ranked = g.withColumn(
        "cum_before", F.coalesce(F.sum("cnt").over(w), F.lit(0))
    )
    agg = ranked.agg(
        F.sum(
            F.col("pos") * (2 * F.col("cum_before") + F.col("cnt") + 1)
        ).alias("two_r_pos"),
        F.sum("pos").alias("n_pos"),
        F.sum("cnt").alias("n"),
    )
    n_pos, n = F.col("n_pos"), F.col("n")
    n_neg = n - n_pos
    u2 = F.col("two_r_pos") - n_pos * (n_pos + 1)  # = 2 * U, exact BIGINT
    return agg.select(
        n_pos.alias("n_pos"),
        n_neg.alias("n_neg"),
        F.round(u2.cast("double") / (2 * n_pos * n_neg).cast("double"), 6).alias(
            "auc"
        ),
    )


def cohen_kappa(
    df: DataFrame,
    rule_a_col: str,
    rule_b_col: str,
) -> DataFrame:
    """Cohen's kappa chance-corrected agreement between two binary
    labeling rules — the filter-governance audit: when two quality gates
    (or an old and a re-tuned rule) are supposed to capture the same
    notion, raw percent-agreement overstates it whenever the base rates
    are skewed; kappa is the standard correction.

    kappa = (po - pe) / (1 - pe) is computed as ONE exact integer
    rational: (n*(n00+n11) - (a1*b1 + a0*b0)) / (n*n - (a1*b1 + a0*b0)),
    divided once at the end — no intermediate proportions, so both
    engines see identical arithmetic. One single-row aggregate job."""
    a = F.col(rule_a_col).cast("long")
    b = F.col(rule_b_col).cast("long")
    agg = df.agg(
        F.count("*").alias("n"),
        F.sum(a).alias("a1"),
        F.sum(b).alias("b1"),
        F.sum(a * b).alias("n11"),
        F.sum((1 - a) * (1 - b)).alias("n00"),
    )
    n = F.col("n")
    chance = F.col("a1") * F.col("b1") + (n - F.col("a1")) * (n - F.col("b1"))
    num = n * (F.col("n00") + F.col("n11")) - chance
    den = n * n - chance
    return agg.select(
        "n",
        F.col("n11").alias("n_both"),
        F.col("n00").alias("n_neither"),
        (F.col("a1") - F.col("n11")).alias("n_a_only"),
        (F.col("b1") - F.col("n11")).alias("n_b_only"),
        F.round(
            F.col("n11").cast("double") * 2
            / (F.col("a1") + F.col("b1")).cast("double"),
            6,
        ).alias("dice_overlap"),
        F.round(num.cast("double") / den.cast("double"), 6).alias("kappa"),
    )


def t_closeness_audit(
    df: DataFrame,
    class_cols: list[str],
    sensitive_col: str,
    t_num: int,
    t_den: int,
) -> DataFrame:
    """t-closeness privacy audit: for each equivalence class (the rows
    sharing ``class_cols``), the Earth Mover's Distance between the
    class's ``sensitive_col`` distribution and the table's global one,
    flagged when it exceeds t = t_num/t_den. For a categorical attribute
    under equal ground distance the EMD is the total-variation distance
    0.5·Σ_v|p_v − q_v| (Li et al., ICDE'07), which this computes exactly:
    numer_c = Σ_v |N·cnt_cv − n_c·cnt_v| is pure BIGINT, and the verdict
    is numer_c·t_den > 2·t_num·n_c·N — no floating point can flip a class
    across engines (CLAUDE.md integer-exactness rule); only the reported
    max_tvd performs a division.

    Completes the k-anonymity / l-diversity / t-closeness ladder over the
    reference's privacy screen (reference checks k only).

    Scale: one class-keyed shuffle each for the class totals and the
    class×value cells; the global value distribution (|domain(v)| rows)
    and the 1-row N are broadcast, so the (classes × values) completion
    domain — needed because a value ABSENT from a class still contributes
    |0 − n_c·cnt_v| — is built broadcast-side and never reshuffles the
    fact table. Returns a single audit row."""
    base = df.select(*class_cols, sensitive_col)
    classes = base.groupBy(*class_cols).agg(F.count("*").alias("n_c"))
    cells = base.groupBy(*class_cols, sensitive_col).agg(
        F.count("*").alias("cnt_cv")
    )
    gdist = base.groupBy(sensitive_col).agg(F.count("*").alias("cnt_v"))
    total = base.agg(F.count("*").alias("n_total"))
    per_class = (
        classes.crossJoin(F.broadcast(gdist))
        .crossJoin(F.broadcast(total))
        .join(cells, [*class_cols, sensitive_col], "left")
        .groupBy(*class_cols, "n_c", "n_total")
        .agg(
            F.sum(
                F.abs(
                    F.col("n_total") * F.coalesce(F.col("cnt_cv"), F.lit(0))
                    - F.col("n_c") * F.col("cnt_v")
                )
            ).alias("numer")
        )
    )
    viol = (
        F.col("numer") * t_den
        > 2 * t_num * F.col("n_c") * F.col("n_total")
    )
    return per_class.agg(
        F.count("*").alias("n_classes"),
        F.sum(viol.cast("long")).alias("n_violating"),
        F.sum(F.when(viol, F.col("n_c")).otherwise(0)).alias("rows_at_risk"),
        F.round(
            F.max(
                F.col("numer").cast("double")
                / (F.lit(2) * F.col("n_c") * F.col("n_total"))
            ),
            6,
        ).alias("max_tvd"),
    )


def frequent_sequences(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    state_col: str,
    k: int = 3,
    sup_num: int = 3,
    sup_den: int = 4,
) -> DataFrame:
    """Contiguous sequential-pattern mining (the GSP/PrefixSpan family
    restricted to gap-0 patterns): every length-``k`` run of
    ``state_col`` within a key's ``order_cols``-ordered stream, counted
    by occurrences AND by distinct-key support, keeping patterns whose
    support is at least sup_num/sup_den of the most supported pattern.
    The relative-min-support verdict is decided as
    sup_den·n_keys > sup_num·max_support in pure integers.

    Scale: one window shuffle on the key (the k−1 lead()s share a single
    sort), one pattern-keyed groupBy (map-side combinable — the pattern
    space is |states|^k, not row count), and the max-support row is a
    broadcast 1-row crossJoin. No collect, no floating point."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    steps = [F.col(state_col)] + [
        F.lead(state_col, i).over(w) for i in range(1, k)
    ]
    seqs = df.select(
        *key_cols, F.concat_ws(">", *steps).alias("seq"), steps[-1].alias("_last")
    ).filter(F.col("_last").isNotNull())
    census = seqs.groupBy("seq").agg(
        F.count("*").alias("n_occurrences"),
        F.count_distinct(*[F.col(c) for c in key_cols]).alias("n_keys"),
    )
    top = census.agg(F.max("n_keys").alias("_max_sup"))
    return (
        census.crossJoin(F.broadcast(top))
        .filter(
            F.col("n_keys") * sup_den > F.lit(sup_num) * F.col("_max_sup")
        )
        .select("seq", "n_keys", "n_occurrences")
        .orderBy(F.col("n_keys").desc(), "seq")
    )


def calibration_buckets(
    df: DataFrame,
    score_cents_col: str,
    outcome_col: str,
    n_buckets: int = 10,
) -> DataFrame:
    """Reliability-diagram / expected-calibration-error audit of an
    integer-cents probability score (0..100) against a boolean outcome —
    the standard screen for whether a model's confidence means anything
    before its scores gate a data pipeline. Per bucket b =
    min(floor(score·n_buckets/100), n_buckets−1) — the clamp keeps a
    perfect score=100 in the top bin: event count, positive count, mean
    confidence, empirical accuracy, and the calibration gap in EXACT
    integer cents: gap_scaled = |100·n_pos − Σscore| (the ECE numerator;
    |acc_b − conf_b| = gap_scaled/(100·n_b), and ECE =
    Σ_b gap_scaled_b/(100·N)) — so which bucket is worst, and by how
    much, is decided with no floating point. One map-side-combinable
    groupBy over ≤ n_buckets keys; conf/acc divide only for display
    (round 6)."""
    s = F.col(score_cents_col)
    base = df.filter(s.isNotNull()).select(
        F.least(
            F.floor(s * n_buckets / F.lit(100)), F.lit(n_buckets - 1)
        ).cast("long").alias("bucket"),
        s.cast("long").alias("s"),
        F.col(outcome_col).cast("long").alias("o"),
    )
    return (
        base.groupBy("bucket")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("o").alias("n_pos"),
            F.sum("s").alias("sum_score"),
        )
        .select(
            "bucket",
            "n_events",
            "n_pos",
            F.round(
                F.col("sum_score").cast("double")
                / (F.lit(100) * F.col("n_events")),
                6,
            ).alias("conf"),
            F.round(
                F.col("n_pos").cast("double") / F.col("n_events"), 6
            ).alias("acc"),
            F.abs(100 * F.col("n_pos") - F.col("sum_score")).alias(
                "gap_scaled"
            ),
        )
        .orderBy("bucket")
    )


def wasserstein_1d(
    df: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """Per-group 1-D Wasserstein (earth-mover) distance to the GLOBAL
    distribution of an integer-valued column — the drift metric that
    (unlike PSI/KS, which this family already has) weights HOW FAR mass
    moved, not just whether bins differ. W1 = ∫|F_g(x) − F_global(x)|dx,
    computed exactly on the discrete support: w1_scaled =
    Σ_support |N·cum_g(v) − n_g·cum_global(v)|·(next_v − v) in pure
    BIGINT (zero float until the final display division, round 6).

    Shape: the support table is |distinct values| (not corpus rows) —
    its global-CDF window runs single-partition by design, like the
    pareto_parts exact pass; the per-group CDF is a (group)-partitioned
    window over the broadcast group×support completion domain, so the
    fact table shuffles once for cell counts and never again. At
    extreme N the BIGINT product N·cum needs value bucketing first
    (support compaction); at audit scales it is exact as-is."""
    from pyspark.sql.window import Window

    base = df.select(
        F.col(group_col).alias("g"), F.col(value_col).cast("long").alias("v")
    )
    gcnt = base.groupBy("v").agg(F.count("*").alias("c_g"))
    wv = Window.orderBy("v")
    support = gcnt.select(
        "v",
        F.sum("c_g")
        .over(wv.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("cum_g"),
        (F.lead("v").over(wv) - F.col("v")).alias("gap"),
    )
    totals = base.groupBy("g").agg(F.count("*").alias("n_g"))
    n_total = base.agg(F.count("*").alias("n_total"))
    scnt = base.groupBy("g", "v").agg(F.count("*").alias("c_s"))
    wg = (
        Window.partitionBy("g")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    j = (
        totals.crossJoin(F.broadcast(support))
        .join(scnt, ["g", "v"], "left")
        .withColumn(
            "cum_s", F.sum(F.coalesce(F.col("c_s"), F.lit(0))).over(wg)
        )
        .crossJoin(F.broadcast(n_total))
    )
    per = (
        j.filter(F.col("gap").isNotNull())
        .groupBy("g", "n_g", "n_total")
        .agg(
            F.sum(
                F.abs(
                    F.col("n_total") * F.col("cum_s")
                    - F.col("n_g") * F.col("cum_g")
                )
                * F.col("gap")
            ).alias("w1_scaled")
        )
    )
    return per.select(
        F.col("g").alias(group_col),
        F.col("n_g").alias("n_rows"),
        "w1_scaled",
        F.round(
            F.col("w1_scaled").cast("double")
            / (F.col("n_g") * F.col("n_total")),
            6,
        ).alias("w1"),
    ).orderBy(group_col)


def conformal_coverage(
    cal: DataFrame,
    test: DataFrame,
    score_col: str,
    cov_num: int = 9,
    cov_den: int = 10,
) -> DataFrame:
    """Split-conformal calibration audit: the conformal threshold is the
    k-th smallest calibration score with k = ⌈(n_cal+1)·cov⌉ (Vovk's
    finite-sample quantile correction), and the audit reports the
    empirical coverage P(test score ≤ threshold) — which conformal
    theory guarantees ≥ cov up to 1/n_cal if cal/test are exchangeable,
    so a material shortfall IS a drift alarm. Exactness: k is computed
    in pure integer arithmetic (⌈a/b⌉ = (a+b−1)//b), and the k-th order
    statistic is selected by a cumulative count over the DISTINCT-value
    support table (invariant under tie order, no global sort of fact
    rows — the wasserstein_1d support discipline); coverage counts are
    integers, dividing only for display (round 6).

    Scale: one groupBy per side for value counts, a |support|-sized
    single-partition window, a 1-row broadcast threshold join."""
    from pyspark.sql.window import Window

    s = F.col(score_col)
    cal_cnt = cal.select(s.alias("v")).groupBy("v").agg(
        F.count("*").alias("c")
    )
    n_cal = cal.agg(F.count("*").alias("n_cal"))
    wv = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = cal_cnt.select("v", F.sum("c").over(wv).alias("cum"))
    k = F.floor(
        (F.lit(cov_num) * (F.col("n_cal") + 1) + (cov_den - 1)) / cov_den
    ).cast("long")
    thr = (
        cum.crossJoin(F.broadcast(n_cal))
        .withColumn("k_rank", k)
        .filter(F.col("cum") >= F.col("k_rank"))
        .orderBy("v")
        .limit(1)
        .select("n_cal", "k_rank", F.col("v").alias("threshold"))
    )
    covered = (
        test.select(s.alias("tv"))
        .crossJoin(F.broadcast(thr))
        .agg(
            F.first("n_cal").alias("n_cal"),
            F.first("k_rank").alias("k_rank"),
            F.first("threshold").alias("thr_raw"),
            F.count("*").alias("n_test"),
            F.sum((F.col("tv") <= F.col("threshold")).cast("long")).alias(
                "n_covered"
            ),
        )
    )
    return covered.select(
        "n_cal",
        "n_test",
        "k_rank",
        F.round("thr_raw", 6).alias("threshold"),
        "n_covered",
        F.round(
            F.col("n_covered").cast("double") / F.col("n_test"), 6
        ).alias("coverage"),
    )


def theil_sen_slopes(
    df: DataFrame, key_cols: list[str], x_col: str, y_col: str
) -> DataFrame:
    """Per-key Theil-Sen robust trend: the MEDIAN of all pairwise slopes
    (y_j−y_i)/(x_j−x_i) — the classic 29%-breakdown-point alternative to
    the OLS slope (grouped_trend / value_trends), immune to the outliers
    that drag a least-squares fit. Pairs with x_j == x_i are excluded in
    the join condition itself (no 0-division reaches evaluation — ANSI
    rule). The median is an order statistic of the slope multiset:
    row_number over (slope, then both ids for total order) picks the two
    middle ranks and averages them — tie-stable because equal slopes are
    interchangeable by VALUE, and every arithmetic step (difference,
    division, half-sum) is the same IEEE op on both engines.

    Scale contract: the pair set is per-key quadratic — callers bound the
    per-key cardinality (event streams per user are ~constant; for heavy
    keys, pre-sample). One key shuffle for the self-join, one for the
    rank window."""
    from pyspark.sql.window import Window

    base = df.select(
        *key_cols, F.col(x_col).alias("x"), F.col(y_col).alias("y")
    )
    a = base
    b = base.select(
        *[F.col(c).alias(f"{c}_b") for c in key_cols],
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
    )
    cond = [F.col(k) == F.col(f"{k}_b") for k in key_cols]
    pairs = a.join(
        b, cond + [F.col("x") < F.col("xb")]
    ).select(
        *key_cols,
        ((F.col("yb") - F.col("y")) / (F.col("xb") - F.col("x"))).alias(
            "slope"
        ),
    )
    w = Window.partitionBy(*key_cols).orderBy("slope")
    cnt = Window.partitionBy(*key_cols)
    ranked = pairs.select(
        *key_cols,
        "slope",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(cnt).alias("n_pairs"),
    )
    # ranks (n+1)//2 and n//2+1 coincide for odd n — avg of the one or
    # two middle slopes is the median either way
    lo = F.floor((F.col("n_pairs") + 1) / 2)
    hi = F.floor(F.col("n_pairs") / 2) + 1
    mid = ranked.filter((F.col("rn") == lo) | (F.col("rn") == hi))
    return (
        mid.groupBy(*key_cols)
        .agg(
            F.first("n_pairs").alias("n_pairs"),
            (F.round(F.avg("slope"), 6) + 0.0).alias("theilsen_slope"),
        )
        .orderBy(*key_cols)
    )


def runs_test(
    df: DataFrame, group_col: str, order_col: str, value_col: str
) -> DataFrame:
    """Per-group Wald-Wolfowitz runs test: is the sequence of
    above/below-median values random in ``order_col`` order, or does it
    clump (batch effects, sorted dumps, template streaks — orderings
    that break the i.i.d. assumption every sampler downstream makes)?
    Exactness discipline: the above/below verdict is decided as
    2·v vs m1+m2 where m1, m2 are the two middle VALUES (BIGINT order
    statistics, tie-order invariant) — no double median ever enters a
    comparison; exact-median ties are dropped per the classic test; run
    and sign counts are integers. Only the z-score divides (same IEEE
    ops, round 6, +0.0 against −0; NULL when a group is one-sided so
    the variance degenerates).

    Shape: one group shuffle; two group windows (value order for the
    order statistics, stream order for the lag) over group-sized
    partitions."""
    from pyspark.sql.window import Window

    base = df.select(
        F.col(group_col).alias("g"),
        F.col(order_col).alias("o"),
        F.col(value_col).cast("long").alias("v"),
    )
    wv = Window.partitionBy("g").orderBy("v", "o")
    cnt = Window.partitionBy("g")
    ranked = base.select(
        "g", "o", "v",
        F.row_number().over(wv).alias("rn"),
        F.count("*").over(cnt).alias("n"),
    )
    lo = F.floor((F.col("n") + 1) / 2)
    hi = F.floor(F.col("n") / 2) + 1
    msum = ranked.groupBy("g").agg(
        (
            F.sum(F.when(F.col("rn") == lo, F.col("v")).otherwise(0))
            + F.sum(F.when(F.col("rn") == hi, F.col("v")).otherwise(0))
        ).alias("m2sum")
    )
    signed = (
        base.join(msum, "g")
        .filter(F.col("v") * 2 != F.col("m2sum"))
        .withColumn("s", (F.col("v") * 2 > F.col("m2sum")).cast("int"))
    )
    wo = Window.partitionBy("g").orderBy("o")
    runs = signed.withColumn(
        "chg",
        F.when(
            F.lag("s").over(wo).isNull()
            | (F.lag("s").over(wo) == F.col("s")),
            0,
        ).otherwise(1),
    )
    per = runs.groupBy("g").agg(
        F.sum("s").cast("long").alias("n_above"),
        F.sum(1 - F.col("s")).cast("long").alias("n_below"),
        (F.sum("chg") + 1).cast("long").alias("n_runs"),
    )
    n1, n2 = F.col("n_above"), F.col("n_below")
    n = n1 + n2
    e = 1 + (2.0 * n1 * n2) / n
    v = (
        (2.0 * n1 * n2) * (2.0 * n1 * n2 - n)
        / (n * n * (n - 1))
    )
    z = F.when(
        (n1 > 0) & (n2 > 0) & (2 * n1 * n2 > n),
        (F.col("n_runs") - e) / F.sqrt(v),
    )
    return per.select(
        F.col("g").alias(group_col),
        "n_above",
        "n_below",
        "n_runs",
        (F.round(z, 6) + 0.0).alias("z"),
    ).orderBy(group_col)


def mann_kendall(
    df: DataFrame, group_cols: list[str], order_col: str, value_col: str
) -> DataFrame:
    """Per-group Mann-Kendall monotonic-trend test — the non-parametric
    companion to theil_sen_slopes (same robustness rationale, but as a
    significance TEST): S = Σ_{i<j} sign(y_j − y_i) over the
    ``order_col``-ordered series, with the classic tie-corrected variance
    Var(S) = [n(n−1)(2n+5) − Σ_t t(t−1)(2t+5)] / 18 and the ±1
    continuity-corrected z. A |z| ≫ 0 series drifts monotonically — the
    drift alarm that needs no distributional assumption and no slope
    units.

    Exactness discipline (cross-engine): values are BIGINT, every sign is
    a CASE on integer comparisons (never signum → double), S / n / the
    tie term / the variance NUMERATOR are all exact integers (n ≤ ~10⁶
    keeps n·(n−1)·(2n+5) < 2^63 — far above any per-key series this
    engine groups); only the final z divides, rounded and −0-repaired.
    Var = 0 (all values tied, or n < 2) yields NULL z.

    Caller contract: (group, order) pairs are unique (pre-aggregate the
    series — the day-sum query shape); the per-key pair set is quadratic
    like theil_sen_slopes, bounded by the series length. One key shuffle
    for the self-join, map-side-combinable aggs for S and the tie term.
    """
    base = df.select(
        *group_cols,
        F.col(order_col).cast("long").alias("o"),
        F.col(value_col).cast("long").alias("y"),
    ).localCheckpoint()
    b = base.select(
        *[F.col(c).alias(f"{c}_b") for c in group_cols],
        F.col("o").alias("ob"),
        F.col("y").alias("yb"),
    )
    cond = [F.col(k) == F.col(f"{k}_b") for k in group_cols]
    sgn = (
        F.when(F.col("yb") > F.col("y"), 1)
        .when(F.col("yb") < F.col("y"), -1)
        .otherwise(0)
    )
    s_stat = (
        base.join(b, cond + [F.col("o") < F.col("ob")])
        .groupBy(*group_cols)
        .agg(F.sum(sgn).cast("long").alias("s_stat"))
    )
    n_per = base.groupBy(*group_cols).agg(F.count("*").cast("long").alias("n"))
    ties = (
        base.groupBy(*group_cols, "y")
        .agg(F.count("*").cast("long").alias("t"))
        .groupBy(*group_cols)
        .agg(
            F.sum(
                F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
            ).cast("long").alias("tie_term")
        )
    )
    per = n_per.join(ties, group_cols).join(s_stat, group_cols, "left")
    n = F.col("n")
    var_num = (n * (n - 1) * (2 * n + 5) - F.col("tie_term")).cast("long")
    s = F.coalesce(F.col("s_stat"), F.lit(0)).cast("long")
    z = F.when(
        var_num > 0,
        F.when(s > 0, (s - 1) / F.sqrt(var_num / 18.0))
        .when(s < 0, (s + 1) / F.sqrt(var_num / 18.0))
        .otherwise(F.lit(0.0)),
    )
    return per.select(
        *group_cols,
        n.alias("n"),
        s.alias("s_stat"),
        var_num.alias("var_num"),
        (F.round(z, 6) + 0.0).alias("z"),
    )


def cross_correlation(
    x_df: DataFrame, y_df: DataFrame, max_lag: int = 3
) -> DataFrame:
    """Lagged Pearson cross-correlation between two integer time series —
    does series y lead or lag series x? For each lag ℓ ∈ [−max_lag,
    +max_lag], correlate x_t with y_{t+ℓ} over the days both exist
    (inner join on the shifted key; missing buckets are missing, not
    zero-filled). The lead-lag companion of the single-series event_acf:
    a peak at ℓ > 0 means x moves first (error bursts precede purchase
    dips, ingest spikes precede dedup-queue growth).

    Inputs: (o, v) frames with a unique integer bucket key ``o`` (the
    caller pre-aggregates — day grids, the mann_kendall contract).
    Exactness: all five moment sums and n stay BIGINT (values are cast
    long; products bounded by |series|·max(v)² — the caller's bucket
    aggregation keeps v near corpus scale, documented like
    assortativity); r computes in ONE double expression at the end,
    x·x written as products (never pow), zero variance → NULL, round 6,
    −0 repaired. Shape: 2·max_lag+1 hash equi-joins of two bucket-sized
    frames + a map-side-combinable 1-row agg per lag."""
    x = x_df.select(F.col("o").cast("long").alias("o"), F.col("v").cast("long").alias("x"))
    y = y_df.select(F.col("o").cast("long").alias("o"), F.col("v").cast("long").alias("y"))
    x = x.localCheckpoint()
    y = y.localCheckpoint()
    out = None
    for lag in range(-max_lag, max_lag + 1):
        shifted = y.select((F.col("o") - lag).alias("o"), "y")
        joined = x.join(shifted, "o").select(
            F.lit(lag).alias("lag"), "x", "y"
        )
        agg = joined.groupBy("lag").agg(
            F.count("*").cast("long").alias("n"),
            F.sum("x").cast("long").alias("sx"),
            F.sum("y").cast("long").alias("sy"),
            F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
            F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
            F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
        )
        out = agg if out is None else out.unionByName(agg)
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    vx = n * sxx - sx * sx
    vy = n * syy - sy * sy
    r = F.when(
        (vx > 0) & (vy > 0),
        (n * sxy - sx * sy)
        / F.sqrt(vx.cast("double") * vy.cast("double")),
    )
    return out.select(
        "lag", "n", (F.round(r, 6) + 0.0).alias("r")
    )


def kendall_tau(
    df: DataFrame, group_cols: list[str], x_col: str, y_col: str
) -> DataFrame:
    """Per-group Kendall tau-b rank correlation between two integer
    columns — the pair-concordance completion of the rank-correlation
    family (value_spearman ranks then correlates; mann_kendall is tau of
    value vs TIME; this is tau between two measures, tie-corrected).

    The pair space is never enumerated row-by-row: rows collapse to
    distinct (x, y) value combos with multiplicities in one shuffle, and
    pairs are counted BETWEEN combos (weight m_a·m_b, each unordered
    combo pair visited once via the lexicographic (x, y) order) plus
    both-tied pairs WITHIN combos (m·(m−1)/2) — so the self-join is
    |distinct combos|², not |rows|², and every bucket (concordant,
    discordant, x-tie-only, y-tie-only, both-tied) is an exact BIGINT.
    tau_b = (C − D)/√((C+D+Tx)·(C+D+Ty)) is the single double
    expression (legs cast to double BEFORE the product — their BIGINT
    product could overflow at large n, the doubles cannot); NULL when a
    leg is 0 (a constant column has no rank signal — in-expression
    guard per the ANSI rule).

    Caller contract: integer inputs (pre-scale currency to cents);
    per-key distinct-combo sets bounded (value collapsing does the
    bounding on discrete measures — the l_quantity/l_extendedprice
    shape collapses 60k rows to ~?k combos)."""
    cnt = df.groupBy(
        *group_cols,
        F.col(x_col).cast("long").alias("x"),
        F.col(y_col).cast("long").alias("y"),
    ).agg(F.count("*").cast("long").alias("m")).localCheckpoint()
    b = cnt.select(
        *[F.col(c).alias(f"{c}_b") for c in group_cols],
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
        F.col("m").alias("mb"),
    )
    cond = [F.col(k) == F.col(f"{k}_b") for k in group_cols]
    lex = (F.col("x") < F.col("xb")) | (
        (F.col("x") == F.col("xb")) & (F.col("y") < F.col("yb"))
    )
    pairs = cnt.join(b, cond + [lex])
    cy = F.when(F.col("yb") > F.col("y"), 1).when(
        F.col("yb") < F.col("y"), -1
    ).otherwise(0)
    w = F.col("m") * F.col("mb")
    cross = pairs.select(
        *group_cols,
        w.alias("w"),
        (F.col("x") != F.col("xb")).cast("int").alias("xd"),
        cy.alias("cy"),
    ).groupBy(*group_cols).agg(
        F.sum(F.when((F.col("xd") == 1) & (F.col("cy") == 1), F.col("w")).otherwise(0)).cast("long").alias("concordant"),
        F.sum(F.when((F.col("xd") == 1) & (F.col("cy") == -1), F.col("w")).otherwise(0)).cast("long").alias("discordant"),
        F.sum(F.when((F.col("xd") == 0) & (F.col("cy") != 0), F.col("w")).otherwise(0)).cast("long").alias("tx"),
        F.sum(F.when((F.col("xd") == 1) & (F.col("cy") == 0), F.col("w")).otherwise(0)).cast("long").alias("ty"),
    )
    within = cnt.groupBy(*group_cols).agg(
        # m·(m−1) is even; the shiftright halving stays in BIGINT (a /2
        # would detour through double)
        F.shiftright(
            F.sum(F.col("m") * (F.col("m") - 1)).cast("long"), 1
        ).alias("txy"),
        F.sum("m").cast("long").alias("n"),
    )
    agg = within.join(cross, group_cols, "left").na.fill(
        {"concordant": 0, "discordant": 0, "tx": 0, "ty": 0}
    )
    c, d = F.col("concordant"), F.col("discordant")
    leg_a = (c + d + F.col("tx")).cast("double")
    leg_b = (c + d + F.col("ty")).cast("double")
    tau = F.when(
        (c + d + F.col("tx") > 0) & (c + d + F.col("ty") > 0),
        (c - d) / F.sqrt(leg_a * leg_b),
    )
    return agg.select(
        *group_cols,
        "n",
        "concordant",
        "discordant",
        "tx",
        "ty",
        "txy",
        (F.round(tau, 6) + 0.0).alias("tau_b"),
    )


def trimmed_stats(
    df: DataFrame, group_cols: list[str], value_col: str, trim_pct: int = 10
) -> DataFrame:
    """Per-group trimmed and winsorized means — the bounded-influence
    completion of the robust family (MAD flags outliers, Theil-Sen
    survives them in slopes; these SUMMARIZE despite them): drop
    (trimmed) or clamp to the cut values (winsorized) the lowest and
    highest ⌊n·p/100⌋ observations. Input is cast to BIGINT (pre-scale
    currency to cents); every sum stays integer — trimming by
    row_number over value is tie-assignment-arbitrary but SUM-invariant
    (rows past the cut with equal values contribute equal amounts
    whichever copies were cut), and the winsorized clamp values are rank
    statistics (value-deterministic even when row assignment isn't).
    The two means divide once each, round 6.

    Shape: one group shuffle, two windows sharing the (value) sort over
    group-sized partitions, one map-side-combinable final agg."""
    from pyspark.sql.window import Window

    base = df.select(
        *group_cols, F.col(value_col).cast("long").alias("v")
    )
    w = Window.partitionBy(*group_cols).orderBy("v")
    cnt = Window.partitionBy(*group_cols)
    ranked = base.select(
        *group_cols,
        "v",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(cnt).alias("n"),
    )
    k = F.floor(F.col("n") * trim_pct / 100).cast("long")
    marked = ranked.select(
        *group_cols,
        "v",
        "n",
        k.alias("k"),
        (F.col("rn") > k).alias("above_lo"),
        (F.col("rn") <= F.col("n") - k).alias("below_hi"),
        (F.col("rn") == k + 1).alias("is_lo_cut"),
        (F.col("rn") == F.col("n") - k).alias("is_hi_cut"),
    )
    agg = marked.groupBy(*group_cols).agg(
        F.first("n").cast("long").alias("n"),
        F.first("k").cast("long").alias("n_trimmed_each"),
        F.sum(
            F.when(F.col("above_lo") & F.col("below_hi"), F.col("v")).otherwise(0)
        ).cast("long").alias("trim_sum"),
        F.max(F.when(F.col("is_lo_cut"), F.col("v"))).alias("lo_cut"),
        F.max(F.when(F.col("is_hi_cut"), F.col("v"))).alias("hi_cut"),
    )
    n, kk = F.col("n"), F.col("n_trimmed_each")
    trim_n = n - 2 * kk
    win_sum = F.col("trim_sum") + kk * F.col("lo_cut") + kk * F.col("hi_cut")
    return agg.select(
        *group_cols,
        "n",
        "n_trimmed_each",
        F.col("lo_cut"),
        F.col("hi_cut"),
        F.when(trim_n > 0, F.round(F.col("trim_sum") / trim_n.cast("double"), 6))
        .alias("trimmed_mean"),
        F.when(n > 0, F.round(win_sum / n.cast("double"), 6))
        .alias("winsorized_mean"),
    )


def quantile_normalize(
    df: DataFrame, group_cols: list[str], id_col: str, value_col: str
) -> DataFrame:
    """Quantile normalization across groups — map each group's value
    distribution onto the POOLED distribution (the bioinformatics
    batch-effect corrector, here the cross-source score equalizer: after
    it, every source's quality/length scores are comparable by rank, so
    a per-source quality threshold stops privileging verbose sources).
    The i-th smallest of a group's n_g values maps to the pooled order
    statistic at rank ⌈(2i−1)·N / (2·n_g)⌉ — the midpoint quantile rule
    in PURE integer arithmetic (⌈a/b⌉ = (a+b−1)//b, every quantity
    BIGINT); the normalized value is itself a pooled order statistic
    (value-deterministic whatever the tie assignment), so the operator
    emits NO floating point at all.

    Shape: per-group ranks from group windows; POOLED ranks from the
    shared distributed global_ranks (no single-partition window); one
    equi-join on the target rank."""
    from pyspark.sql.window import Window

    from raptor_spark.operators.relational import global_ranks

    base = df.select(
        *group_cols,
        F.col(id_col).alias("id"),
        F.col(value_col).cast("long").alias("v"),
    )
    wg = Window.partitionBy(*group_cols).orderBy("v", "id")
    cg = Window.partitionBy(*group_cols)
    per = base.select(
        *group_cols,
        "id",
        "v",
        F.row_number().over(wg).cast("long").alias("i"),
        F.count("*").over(cg).cast("long").alias("n_g"),
    )
    pooled = global_ranks(
        base.select(F.col("id").alias("pid"), F.col("v").alias("pv")),
        ["pv", "pid"],
    ).select(F.col("r").alias("tr"), F.col("pv").alias("norm_v"))
    n_total = base.count()
    # ⌈a/b⌉ via the SQL `div` integer division — never a double detour
    with_target = (
        per.withColumn("__a", (2 * F.col("i") - 1) * F.lit(n_total))
        .withColumn("__b", 2 * F.col("n_g"))
        .withColumn("tr", F.expr("(__a + __b - 1) div __b").cast("long"))
        .drop("__a", "__b")
    )
    return with_target.join(pooled, "tr").select(
        *group_cols, "id", "v", F.col("norm_v")
    )


def brier_score(
    df: DataFrame, group_cols: list[str], prob_cents_col: str, outcome_col: str
) -> DataFrame:
    """Per-group Brier score + skill — the proper-scoring-rule companion
    of the reliability-diagram/ECE audit (ECE checks calibration in
    buckets; Brier is the strictly proper score a forecaster cannot
    game, and its skill form compares against always-predict-base-rate):
    BS = mean((p − y)²) over integer-cent probabilities, carried as the
    exact BIGINT Σ(k − 100·y)² and divided once by 10⁴·n;
    BS_ref = ȳ(1−ȳ) (climatology), skill = 1 − BS/BS_ref. Every
    comparison-bearing quantity is integer; the three displayed doubles
    are single expressions with legs cast to double before any product
    that could overflow BIGINT at corpus scale. Skill is NULL when the
    group is one-sided (BS_ref = 0 — no base-rate to beat).

    Shape: one map-side-combinable group agg — |groups| rows out."""
    base = df.select(
        *group_cols,
        F.col(prob_cents_col).cast("long").alias("k"),
        F.col(outcome_col).cast("int").alias("y"),
    )
    d = F.col("k") - 100 * F.col("y")
    agg = base.groupBy(*group_cols).agg(
        F.count("*").cast("long").alias("n"),
        F.sum("y").cast("long").alias("n_pos"),
        F.sum(d * d).cast("long").alias("sq_err_sum"),
    )
    n, npos = F.col("n"), F.col("n_pos")
    brier = F.col("sq_err_sum") / (n * 10000).cast("double")
    ref = (npos.cast("double") * (n - npos).cast("double")) / (
        n.cast("double") * n.cast("double")
    )
    skill = F.when((npos > 0) & (npos < n), 1.0 - brier / ref)
    return agg.select(
        *group_cols,
        "n",
        "n_pos",
        "sq_err_sum",
        F.round(brier, 6).alias("brier"),
        (F.round(skill, 6) + 0.0).alias("brier_skill"),
    )


def weekday_seasonality(
    df: DataFrame, ts_col: str, value_col: str
) -> DataFrame:
    """Day-of-week seasonal profile of an event stream — per weekday:
    number of distinct active days, exact integer-cents volume, and the
    seasonal index (that weekday's per-day mean ÷ the all-days per-day
    mean). The calendar face of the drift family (time_rollup buckets,
    event_acf lags; this one answers "is Monday structurally heavier?",
    the load-shaping/staffing read). Weekday = ((epoch_day + 4) mod 7)
    (1970-01-01 was a Thursday; 0 = Sunday) — pure integer, identical
    cross-engine. Sums stay BIGINT; the index is ONE double expression
    from four exact integers (dow_cents·total_days)/(dow_days·total
    cents legs cast to double first), round 6.

    Shape: day pre-aggregation (one shuffle), 7-row dow aggregation,
    1-row totals broadcast back by cross join (the t_closeness
    pattern)."""
    day = F.floor(F.col(ts_col).cast("timestamp").cast("double") / 86400.0).cast(
        "long"
    )
    cents = F.floor(F.col(value_col) * 100).cast("long")
    daily = df.select(day.alias("d"), cents.alias("c")).groupBy("d").agg(
        F.sum("c").alias("dc")
    )
    dows = daily.select(
        ((F.col("d") + 4) % 7).alias("dow"), F.col("dc")
    ).groupBy("dow").agg(
        F.count("*").cast("long").alias("n_days"),
        F.sum("dc").cast("long").alias("cents"),
    )
    totals = dows.agg(
        F.sum("n_days").cast("long").alias("t_days"),
        F.sum("cents").cast("long").alias("t_cents"),
    )
    joined = dows.crossJoin(F.broadcast(totals))
    idx = (
        F.col("cents").cast("double") * F.col("t_days").cast("double")
    ) / (F.col("n_days").cast("double") * F.col("t_cents").cast("double"))
    return joined.select(
        "dow",
        "n_days",
        "cents",
        F.when(
            (F.col("n_days") > 0) & (F.col("t_cents") != 0), F.round(idx, 6)
        ).alias("seasonal_index"),
    )


def gap_percentiles(
    df: DataFrame, group_cols: list[str], ts_col: str, order_tiebreak: str
) -> DataFrame:
    """Per-group inter-arrival latency percentiles — p50/p90/p99 of the
    millisecond gaps between consecutive events, as EXACT rank-selected
    order statistics (the SLA-report view beside event_burstiness's
    moment ratios: moments say "bursty", percentiles say "1% of waits
    exceed 4 minutes"). Gaps are floor(Δepoch·1000) BIGINTs (the same
    IEEE multiply+floor on both engines — never a float sum); each
    percentile is the value at rank ⌈p·n/100⌉ (nearest-rank
    definition), picked by a cumulative count over the distinct-gap
    support — tie-order invariant, no global fact sort (the
    wasserstein/conformal discipline).

    Shape: one group window for the lag, a distinct-gap groupBy, and a
    support-sized cumulative window per group."""
    from pyspark.sql.window import Window

    ts = F.col(ts_col).cast("timestamp").cast("double")
    gaps = (
        df.select(*group_cols, ts.alias("t"), F.col(order_tiebreak).alias("o"))
        .withColumn("prev", F.lag("t").over(
            Window.partitionBy(*group_cols).orderBy("t", "o")
        ))
        .filter(F.col("prev").isNotNull())
        .select(
            *group_cols,
            F.floor((F.col("t") - F.col("prev")) * 1000).cast("long").alias("__gap"),
        )
    )
    support = gaps.groupBy(*group_cols, "__gap").agg(
        F.count("*").cast("long").alias("c")
    )
    cum = support.select(
        *group_cols,
        "__gap",
        F.sum("c").over(
            Window.partitionBy(*group_cols)
            .orderBy("__gap")
            .rowsBetween(Window.unboundedPreceding, 0)
        ).cast("long").alias("cum"),
        F.sum("c").over(Window.partitionBy(*group_cols)).cast("long").alias("n"),
    )

    def pick(p):
        target = F.expr(f"CAST(({p} * n + 99) div 100 AS BIGINT)")
        return F.min(F.when(F.col("cum") >= target, F.col("__gap")))

    return cum.groupBy(*group_cols).agg(
        F.first("n").alias("n_gaps"),
        pick(50).alias("p50_ms"),
        pick(90).alias("p90_ms"),
        pick(99).alias("p99_ms"),
    )
