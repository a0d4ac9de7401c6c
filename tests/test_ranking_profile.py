"""Semantic gates for operators/ranking.py (BM25 / term stats / PMI) and
operators/profile.py (profiles, grouped stats, funnels) on corpora small
enough to verify by hand or against pure-Python recomputation."""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest

from raptor_spark.operators.profile import (
    funnel_stages,
    grouped_numeric_stats,
    profile_columns,
)
from raptor_spark.operators.ranking import (
    bigram_pmi,
    bm25_topk,
    doc_terms,
    term_stats,
)

CORPUS = [
    (0, "spark shuffle join join"),
    (1, "spark scan"),
    (2, "filter scan scan scan"),
    (3, "join"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string")


def test_doc_terms_tf_and_dl(docs):
    rows = {(r.id, r.term): (r.tf, r.dl) for r in doc_terms(docs, "doc_id", "text").collect()}
    assert rows[(0, "join")] == (2, 4)
    assert rows[(2, "scan")] == (3, 4)
    assert rows[(1, "spark")] == (1, 2)


def test_term_stats_df_cf_idf(docs):
    rows = {r.term: r for r in term_stats(docs, "doc_id", "text").collect()}
    assert (rows["join"].df, rows["join"].cf) == (2, 3)
    assert (rows["scan"].df, rows["scan"].cf) == (2, 4)
    # BM25+ idf with N=4, df=2: ln((4-2+0.5)/(2+0.5)+1) = ln(2)
    assert abs(rows["join"].idf - math.log(2.0)) < 1e-12


def test_bm25_ranks_exact_scores(docs):
    # hand-compute for the query {join}: df=2, N=4, avgdl=11/4
    out = {r.id: r.score for r in
           bm25_topk(docs, "doc_id", "text", ["join"], k=4).collect()}
    idf = math.log((4 - 2 + 0.5) / (2 + 0.5) + 1.0)
    k1, b, avgdl = 1.2, 0.75, 11 / 4

    def score(tf, dl):
        return idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))

    assert set(out) == {0, 3}
    assert abs(out[0] - score(2, 4)) < 1e-12
    assert abs(out[3] - score(1, 1)) < 1e-12
    # at b=0.75 the one-word doc's length normalization beats doc 0's tf=2
    assert out[3] > out[0]


def test_bigram_pmi_exact(spark):
    # 'a b' appears 2× among 4 bigrams; unigram counts a=3, b=2 of 6 words
    df = spark.createDataFrame(
        [(0, "a b c"), (1, "a b a")], "doc_id long, text string"
    )
    rows = {(r.w1, r.w2): (r.n_ab, r.pmi) for r in bigram_pmi(df, "text", min_count=2).collect()}
    assert set(rows) == {("a", "b")}
    n_ab, pmi = rows[("a", "b")]
    assert n_ab == 2
    assert abs(pmi - math.log((2 / 4) / ((3 / 6) * (2 / 6)))) < 1e-12


def test_profile_columns_nulls_distincts(spark):
    df = spark.createDataFrame(
        [(1, "x"), (2, None), (2, "y"), (None, "y")], "k int, s string"
    )
    p = {r.column: r for r in profile_columns(df, ["k", "s"]).collect()}
    assert p["k"].n_rows == 4 and p["k"].n_nulls == 1 and p["k"].n_distinct == 2
    assert p["k"].min_s == "1" and p["k"].max_s == "2"
    assert p["s"].n_nulls == 1 and p["s"].n_distinct == 2
    assert p["s"].min_s == "x" and p["s"].max_s == "y"


def test_grouped_numeric_stats_matches_python(spark):
    import statistics

    vals = [(i % 2, float(v), float(i)) for i, v in enumerate([3, 7, 1, 9, 4, 6, 2, 8])]
    df = spark.createDataFrame(vals, "g int, v double, t double")
    out = {r.g: r for r in grouped_numeric_stats(df, ["g"], "v", "t").collect()}
    for g in (0, 1):
        series = [v for gg, v, _ in vals if gg == g]
        assert out[g].n == len(series)
        assert abs(out[g].mean - statistics.fmean(series)) < 1e-9
        assert abs(out[g].stddev - statistics.stdev(series)) < 1e-9


def test_funnel_order_and_window(spark):
    rows = [
        # u1 completes all three in order within the window
        (1, 0.0, "view"), (1, 5.0, "click"), (1, 9.0, "purchase"),
        # u2: click BEFORE first view → stuck at stage 1
        (2, 10.0, "click"), (2, 20.0, "view"),
        # u3: purchase before click → stage 2 only
        (3, 0.0, "view"), (3, 1.0, "purchase"), (3, 2.0, "click"),
        # u4: click outside the 10s window → stage 1
        (4, 0.0, "view"), (4, 100.0, "click"),
        # u5 never views → absent
        (5, 0.0, "click"), (5, 1.0, "purchase"),
    ]
    df = spark.createDataFrame(rows, "u long, t double, et string")
    out = {r.u: r.stage for r in
           funnel_stages(df, "u", "t", "et", ["view", "click", "purchase"],
                         within_s=10.0).collect()}
    assert out == {1: 3, 2: 1, 3: 2, 4: 1}


def test_funnel_frontier_is_earliest_qualifying(spark):
    # the SECOND click (after view) is the frontier, not the pre-view one
    rows = [
        (1, 0.0, "view"), (1, -5.0, "click"), (1, 3.0, "click"),
        (1, 4.0, "purchase"),
    ]
    df = spark.createDataFrame(rows, "u long, t double, et string")
    out = {r.u: r.stage for r in
           funnel_stages(df, "u", "t", "et", ["view", "click", "purchase"],
                         within_s=10.0).collect()}
    assert out == {1: 3}


def test_fk_orphans_counts_known_orphans(spark):
    """Orphan counts per relationship on a hand-built child/parent pair,
    including a restricted-parent audit."""
    import pyspark.sql.functions as F

    from raptor_spark.operators.profile import fk_orphans

    child = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 11), (4, 99)], "id long, fk long"
    )
    parent = spark.createDataFrame([(10, "a"), (11, "b")], "pk long, grp string")
    out = {
        r["relation"]: (r["n_child"], r["n_orphans"])
        for r in fk_orphans(
            [
                ("full", child, "fk", parent, "pk"),
                ("only-a", child, "fk", parent.filter(F.col("grp") == "a"), "pk"),
            ]
        ).collect()
    }
    assert out == {"full": (4, 1), "only-a": (4, 2)}


def test_transition_counts_hand_sequence(spark):
    """Two users with hand-written sequences: a->b->a->c and b->b. Pair
    counts and row-normalized probabilities are exact."""
    from raptor_spark.operators.profile import transition_counts

    ev = spark.createDataFrame(
        [
            (1, 1.0, 10, "a"), (1, 2.0, 11, "b"), (1, 3.0, 12, "a"),
            (1, 4.0, 13, "c"), (2, 1.0, 20, "b"), (2, 2.0, 21, "b"),
        ],
        "u long, t double, eid long, s string",
    )
    got = {
        (r.from_state, r.to_state): (r.n, r.p)
        for r in transition_counts(ev, ["u"], ["t", "eid"], "s").collect()
    }
    assert got == {
        ("a", "b"): (1, 0.5),
        ("a", "c"): (1, 0.5),
        ("b", "a"): (1, 0.5),
        ("b", "b"): (1, 0.5),
    }


def test_transition_counts_tiebreak_orders_equal_timestamps(spark):
    """Equal timestamps fall back to the id tiebreak, so the sequence (and
    its transitions) is deterministic."""
    from raptor_spark.operators.profile import transition_counts

    ev = spark.createDataFrame(
        [(1, 1.0, 2, "x"), (1, 1.0, 1, "y")], "u long, t double, eid long, s string"
    )
    got = {
        (r.from_state, r.to_state): r.n
        for r in transition_counts(ev, ["u"], ["t", "eid"], "s").collect()
    }
    assert got == {("y", "x"): 1}


def test_value_histogram_clamps_and_counts(spark):
    from raptor_spark.operators.profile import value_histogram

    df = spark.createDataFrame(
        [(-5.0,), (0.0,), (9.99,), (10.0,), (25.0,), (99.0,), (250.0,), (None,)],
        "v double",
    )
    got = {
        r.bin: (r.lo_edge, r.hi_edge, r.n)
        for r in value_histogram(df, "v", 0.0, 100.0, 10).collect()
    }
    # -5 clamps into bin 0; 250 clamps into bin 9; 10.0 lands in bin 1
    # (half-open bins); None is dropped
    assert got == {
        0: (0.0, 10.0, 3),
        1: (10.0, 20.0, 1),
        2: (20.0, 30.0, 1),
        9: (90.0, 100.0, 2),
    }


def test_table_diff_classifies_all_three_changes(spark):
    from raptor_spark.operators.relational import table_diff

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", None)],
        "k long, s string, v double",
    )
    new = spark.createDataFrame(
        [(2, "b", 25.0), (3, "c", None), (4, "d", 40.0)],
        "k long, s string, v double",
    )
    got = {r.k: r.change for r in table_diff(old, new, ["k"], ["s", "v"]).collect()}
    # key 3 is identical (null-safe compare on the null v) -> absent
    assert got == {1: "delete", 2: "update", 4: "insert"}


def test_table_diff_carries_old_and_new_values(spark):
    from raptor_spark.operators.relational import table_diff

    old = spark.createDataFrame([(1, 10.0)], "k long, v double")
    new = spark.createDataFrame([(1, 11.0)], "k long, v double")
    r = table_diff(old, new, ["k"], ["v"]).collect()[0]
    assert (r.k, r.change, r.old_v, r.new_v) == (1, "update", 10.0, 11.0)


def test_ewma_by_key_matches_python_fold(spark):
    from raptor_spark.operators.relational import ewma_by_key

    rows = [
        (1, 1.0, 10, 4.0), (1, 2.0, 11, 8.0), (1, 3.0, 12, 1.0),
        (2, 1.0, 20, 5.0),                       # single event: ewma = x1
        (3, 1.0, 31, 2.0), (3, 1.0, 30, 6.0),    # tied t -> id tiebreak
    ]
    df = spark.createDataFrame(rows, "u long, t double, eid long, v double")
    got = {r.u: (r.n, r.ewma) for r in ewma_by_key(df, ["u"], ["t", "eid"], "v", 0.3).collect()}

    def fold(vals, a=0.3):
        acc = vals[0]
        for x in vals[1:]:
            acc = a * x + (1.0 - a) * acc
        return acc

    assert got[1] == (3, fold([4.0, 8.0, 1.0]))
    assert got[2] == (1, 5.0)
    assert got[3] == (2, fold([6.0, 2.0]))


def test_mad_outliers_resistant_to_contamination(spark):
    """A group where one extreme point inflates the stddev enough to hide
    itself from a 3-sigma z-filter is still flagged by median/MAD; a
    constant-valued group (MAD = 0) flags nothing."""
    from raptor_spark.operators.profile import mad_outliers

    base = [(i, "g", 10.0 + (i % 3) * 0.5) for i in range(20)]
    rows = base + [(99, "g", 1000.0)] + [(200 + i, "const", 5.0) for i in range(5)]
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")

    # z-score check: the spike IS within 3 sample stddevs (it dragged the
    # stddev up itself) — the scenario the robust filter exists for
    import statistics

    vals = [r[2] for r in rows if r[1] == "g"]
    mu, sd = statistics.mean(vals), statistics.stdev(vals)
    assert abs(1000.0 - mu) / sd < 5  # spike dominates sd; classic masking

    got = mad_outliers(df, ["event_type"], "value", k=3.0).collect()
    assert {(r.event_id, r.event_type) for r in got} == {(99, "g")}
    r = got[0]
    assert r.med == 10.5 and r.mad == 0.5
    assert r.robust_z == (1000.0 - 10.5) / 0.5


def test_grouped_trend_matches_numpy_ols(spark):
    from raptor_spark.operators.profile import grouped_trend

    rows = [("a", float(t), 2.0 * t + 1.0 + ((-1) ** t) * 0.5) for t in range(10)]
    rows += [("b", float(t), 7.0) for t in range(5)]  # flat: slope 0, r2 nan/0
    df = spark.createDataFrame(rows, "g string, t double, v double")
    got = {r.g: r for r in grouped_trend(df, ["g"], "t", "v").collect()}

    import numpy as np

    t = np.array([r[1] for r in rows if r[0] == "a"])
    v = np.array([r[2] for r in rows if r[0] == "a"])
    slope, intercept = np.polyfit(t, v, 1)
    ss_res = float(np.sum((v - (slope * t + intercept)) ** 2))
    ss_tot = float(np.sum((v - v.mean()) ** 2))
    assert abs(got["a"].slope - slope) < 1e-9
    assert abs(got["a"].intercept - intercept) < 1e-9
    assert abs(got["a"].r2 - (1.0 - ss_res / ss_tot)) < 1e-9
    assert got["b"].slope == 0.0


def test_chi2_independence_matches_scipy_formula(spark):
    """Hand contingency table: chi2/dof equal the direct formula (and a
    perfectly independent table scores ~0)."""
    from raptor_spark.operators.profile import chi2_independence

    rows = [("x", 0)] * 30 + [("x", 1)] * 10 + [("y", 0)] * 10 + [("y", 1)] * 30
    df = spark.createDataFrame(rows, "a string, b int")
    r = chi2_independence(df, "a", "b").collect()[0]
    # margins: x=40, y=40, b0=40, b1=40, n=80 -> every e=20; each cell
    # deviates by 10 -> chi2 = 4 * 100/20 = 20, dof = 1
    assert (round(r.chi2, 9), r.dof, r.n) == (20.0, 1, 80)

    indep = [("x", 0)] * 20 + [("x", 1)] * 20 + [("y", 0)] * 10 + [("y", 1)] * 10
    r2 = chi2_independence(
        spark.createDataFrame(indep, "a string, b int"), "a", "b"
    ).collect()[0]
    assert abs(r2.chi2) < 1e-12


def test_twap_weights_by_duration(spark):
    """Value 10 held for 9s then value 100 for 1s -> twap 19; the final
    sample has no duration and drops; single-sample keys are absent."""
    from raptor_spark.operators.profile import twap_by_key

    rows = [
        (1, 0.0, 10, 10.0), (1, 9.0, 11, 100.0), (1, 10.0, 12, 0.0),
        (2, 5.0, 20, 42.0),  # single sample -> absent
    ]
    df = spark.createDataFrame(rows, "u long, t double, eid long, v double")
    got = {
        r.u: (r.n_intervals, r.twap)
        for r in twap_by_key(df, ["u"], ["t", "eid"], "t", "v").collect()
    }
    assert got == {1: (2, (10.0 * 9 + 100.0 * 1) / 10)}


def test_benford_audit_digit_extraction_and_expected(spark):
    """Digits extracted across magnitudes (0.02 -> 2, 999.0 -> 9, exact
    powers of ten -> 1), zero/negative rows excluded, expected_p follows
    log10(1 + 1/d)."""
    import math

    from raptor_spark.operators.profile import benford_audit

    df = spark.createDataFrame(
        [(0.02,), (2.5,), (30.0,), (999.0,), (1.0,), (10.0,), (100.0,),
         (0.001,), (-5.0,), (0.0,)],
        "v double",
    )
    got = {r.digit: r for r in benford_audit(df, "v").collect()}
    assert {d: r.n for d, r in got.items()} == {1: 4, 2: 2, 3: 1, 9: 1}
    for d, r in got.items():
        assert abs(r.expected_p - math.log10(1 + 1 / d)) < 1e-12
        assert abs(r.observed_p - r.n / 8) < 1e-12


def test_table_diff_presence_only(spark):
    """Empty compare_cols = presence-only diff: inserts/deletes classified,
    never updates."""
    from raptor_spark.operators.relational import table_diff

    old = spark.createDataFrame([(1,), (2,)], "k long")
    new = spark.createDataFrame([(2,), (3,)], "k long")
    got = {r.k: r.change for r in table_diff(old, new, ["k"], []).collect()}
    assert got == {1: "delete", 3: "insert"}


def test_gini_known_distributions(spark):
    """Equal values -> 0; total concentration in one key -> (n-1)/n; a
    hand case matches the direct python formula."""
    from raptor_spark.operators.profile import gini_concentration

    eq = spark.createDataFrame([(i, 10.0) for i in range(5)], "k long, v double")
    assert abs(gini_concentration(eq, ["k"], "v").collect()[0].gini) < 1e-12

    conc = spark.createDataFrame(
        [(0, 100.0)] + [(i, 0.0) for i in range(1, 5)], "k long, v double"
    )
    g = gini_concentration(conc, ["k"], "v").collect()[0].gini
    assert abs(g - 4 / 5) < 1e-12

    vals = [3.0, 7.0, 1.0, 9.0]
    df = spark.createDataFrame(list(enumerate(vals)), "k long, v double")
    xs = sorted(vals)
    n = len(xs)
    want = 2 * sum((i + 1) * x for i, x in enumerate(xs)) / (n * sum(xs)) - (n + 1) / n
    got = gini_concentration(df, ["k"], "v").collect()[0].gini
    assert abs(got - want) < 1e-12


def test_allocate_budget_sums_exactly_and_is_proportional(spark):
    from raptor_spark.operators.profile import allocate_budget

    rows = [("a",)] * 7 + [("b",)] * 7 + [("c",)] * 6
    df = spark.createDataFrame(rows, "g string")
    got = {r.g: r.quota for r in allocate_budget(df, ["g"], budget=10).collect()}
    # shares: a=3.5, b=3.5, c=3.0 -> floors 3/3/3, remainder 1 goes to the
    # largest fractional part with key tiebreak -> a
    assert got == {"a": 4, "b": 3, "c": 3}
    assert sum(got.values()) == 10

    # naive rounding would give 4+4+3 = 11; apportionment never drifts
    got2 = {r.g: r.quota for r in allocate_budget(df, ["g"], budget=97).collect()}
    assert sum(got2.values()) == 97


def test_char_pair_counts_exact(spark):
    """["ab ab cd", "abc"] → wf {ab:2, cd:1, abc:1}; pairs ab:2+1, bc:1,
    cd:1 (the abc word contributes ab and bc once each at word-count 1)."""
    from raptor_spark.operators.text import char_pair_counts

    df = spark.createDataFrame(
        [(0, "ab ab cd"), (1, "abc")], "doc_id long, text string"
    )
    got = {r.pair: r.n_occ for r in char_pair_counts(df, "text").collect()}
    assert got == {"ab": 3, "bc": 1, "cd": 1}


def test_char_pair_counts_repeated_pair_within_word(spark):
    """'aaa' yields the 'aa' pair twice per occurrence of the word."""
    from raptor_spark.operators.text import char_pair_counts

    df = spark.createDataFrame([(0, "aaa aaa")], "doc_id long, text string")
    got = {r.pair: r.n_occ for r in char_pair_counts(df, "text").collect()}
    assert got == {"aa": 4}


def test_rrf_fuse_exact_scores(spark):
    """Two lists: doc 10 is rank 1 in both (1/61 + 1/61); doc 20 only in
    list A at rank 2 (1/62); doc 30 only in list B at rank 2."""
    from raptor_spark.operators.ranking import rrf_fuse

    a = spark.createDataFrame([(10, 1), (20, 2)], "id long, rank int")
    b = spark.createDataFrame([(10, 1), (30, 2)], "id long, rank int")
    got = {r.id: (r.rrf, r.n_lists) for r in rrf_fuse([a, b], k=60).collect()}
    assert got[10] == (1.0 / 61 + 1.0 / 61, 2)
    assert got[20] == (1.0 / 62, 1)
    assert got[30] == (1.0 / 62, 1)


def test_km_survival_textbook_fixture(spark):
    # Hand-computed product-limit estimate on the classic 6-subject fixture
    # (durations, event flag): censored subjects leave the risk set without
    # an event; the final duration empties the risk set -> survival pinned 0.
    from raptor_spark.operators.profile import km_survival

    subjects = spark.createDataFrame(
        [(1, 1), (2, 1), (2, 0), (3, 1), (4, 0), (5, 1)],
        ["duration", "is_event"],
    )
    rows = {r["t_day"]: r for r in km_survival(subjects).collect()}
    assert rows[1]["n_risk"] == 6 and rows[1]["d_events"] == 1
    assert abs(rows[1]["survival"] - 5 / 6) < 1e-6
    assert rows[2]["n_risk"] == 5 and rows[2]["c_censored"] == 1
    assert abs(rows[2]["survival"] - (5 / 6) * (4 / 5)) < 1e-6
    assert rows[3]["n_risk"] == 3
    assert abs(rows[3]["survival"] - (2 / 3) * (2 / 3)) < 1e-6
    # censoring-only day: hazard 0, survival carries through unchanged
    assert rows[4]["d_events"] == 0 and rows[4]["hazard"] == 0.0
    assert abs(rows[4]["survival"] - rows[3]["survival"]) < 1e-9
    # risk set empties: hazard 1, survival exactly 0
    assert rows[5]["n_risk"] == 1 and rows[5]["hazard"] == 1.0
    assert rows[5]["survival"] == 0.0


def test_sparse_more_like_this_planted_neighbors(spark):
    # Two documents sharing rare terms must pick each other as rank-1;
    # the stop-term (in every doc) must contribute nothing: with max_df
    # pruning it, the unrelated doc pair has NO shared term -> no pair row.
    from raptor_spark.operators.ranking import sparse_more_like_this

    docs = spark.createDataFrame(
        [
            (1, "the zebra quagga zebra"),
            (2, "the zebra quagga"),
            (3, "the xylophone marimba"),
            (4, "the xylophone marimba marimba"),
            (5, "the onlyword"),
        ],
        ["doc_id", "text"],
    )
    got = {
        (r["id"], r["rk"]): r["neighbor"]
        for r in sparse_more_like_this(docs, "doc_id", "text", k=2, max_df=4).collect()
    }
    assert got[(1, 1)] == 2 and got[(2, 1)] == 1
    assert got[(3, 1)] == 4 and got[(4, 1)] == 3
    # doc 5 shares only the pruned stop-term: no neighbors at all
    assert not any(i == 5 for (i, _) in got)
    # cross-cluster pairs share nothing after pruning either
    assert (1, 2) not in got and (3, 2) not in got


def test_signal_auc_hand_fixture(spark):
    # scores: pos at {3, 2}, neg at {1, 2, 2}. Pairs: 2*3=6.
    # pos=3 beats all 3 negs; pos=2 beats neg=1, ties the two neg=2s.
    # AUC = (3 + 1 + 0.5 + 0.5) / 6 = 5/6.
    from raptor_spark.operators.profile import signal_auc

    df = spark.createDataFrame(
        [(3, 1), (2, 1), (1, 0), (2, 0), (2, 0)], ["score", "label"]
    )
    row = signal_auc(df, "score", "label").collect()[0]
    assert (row["n_pos"], row["n_neg"]) == (2, 3)
    assert abs(row["auc"] - 5 / 6) < 1e-6


def test_signal_auc_perfect_and_inverted(spark):
    from raptor_spark.operators.profile import signal_auc

    perfect = spark.createDataFrame(
        [(10, 1), (11, 1), (1, 0), (2, 0)], ["score", "label"]
    )
    assert signal_auc(perfect, "score", "label").collect()[0]["auc"] == 1.0
    inverted = spark.createDataFrame(
        [(1, 1), (2, 1), (10, 0), (11, 0)], ["score", "label"]
    )
    assert signal_auc(inverted, "score", "label").collect()[0]["auc"] == 0.0


def test_cohen_kappa_hand_fixture(spark):
    # Classic 2x2: n=100, n11=40, n00=30, a-only=20, b-only=10.
    # po=0.70, a1=60, b1=50, pe=(60*50 + 40*50)/10000=0.50 -> kappa=0.4.
    from raptor_spark.operators.profile import cohen_kappa

    rows = (
        [(1, 1)] * 40 + [(0, 0)] * 30 + [(1, 0)] * 20 + [(0, 1)] * 10
    )
    df = spark.createDataFrame(rows, ["a", "b"])
    got = cohen_kappa(df, "a", "b").collect()[0]
    assert got["n"] == 100 and got["n_both"] == 40 and got["n_neither"] == 30
    assert got["n_a_only"] == 20 and got["n_b_only"] == 10
    assert abs(got["kappa"] - 0.4) < 1e-9
    assert abs(got["dice_overlap"] - 80 / 110) < 1e-6


def test_ndcg_hand_computed(spark):
    # 4 docs, system ranks by s desc: d1(rel2), d2(rel0), d3(rel3), d4(rel1)
    # DCG@5 = 3/log2(2) + 0/log2(3) + 7/log2(4) + 1/log2(5)
    # ideal order rel desc: 7/1 + 3/log2(3) + 1/log2(4) + 0
    import math

    from raptor_spark.operators.ranking import ndcg_at_k

    df = spark.createDataFrame(
        [(1, 2, 9.0), (2, 0, 8.0), (3, 3, 7.0), (4, 1, 6.0)],
        "id long, rel int, s double",
    )
    rows = {r.k: r for r in ndcg_at_k(df, score_col="s", ks=(2, 5)).collect()}
    dcg5 = 3.0 + 0.0 / math.log2(3) + 7.0 / 2.0 + 1.0 / math.log2(5)
    idcg5 = 7.0 + 3.0 / math.log2(3) + 1.0 / 2.0
    assert abs(rows[5].dcg - dcg5) < 1e-9
    assert abs(rows[5].idcg - idcg5) < 1e-9
    assert abs(rows[5].ndcg - dcg5 / idcg5) < 1e-9
    # @2: system prefix d1,d2 → 3.0; ideal prefix d3,d1 → 7 + 3/log2(3)
    assert abs(rows[2].dcg - 3.0) < 1e-9
    assert abs(rows[2].idcg - (7.0 + 3.0 / math.log2(3))) < 1e-9


def test_ndcg_perfect_ranking_is_one(spark):
    from raptor_spark.operators.ranking import ndcg_at_k

    df = spark.createDataFrame(
        [(i, 10 - i, float(100 - i)) for i in range(1, 8)],
        "id long, rel int, s double",
    )
    for r in ndcg_at_k(df, score_col="s", ks=(3, 5)).collect():
        assert abs(r.ndcg - 1.0) < 1e-12


def test_ndcg_plan_uses_bounded_topk(spark):
    # the prefixes must come from TakeOrderedAndProject (per-partition
    # bounded priority queues), never a global window over the scored set
    from raptor_spark.operators.ranking import ndcg_at_k

    df = spark.createDataFrame(
        [(i, i % 4, float(i % 97)) for i in range(500)],
        "id long, rel int, s double",
    )
    plan = ndcg_at_k(df, score_col="s")._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_rank_eval_binary_hand_fixture(spark):
    from raptor_spark.operators.ranking import rank_eval_binary

    # q1 ranking by score desc: ids 1(hit) 2 3(hit) 4 -> rr=1,
    # ap = (1/1 + 2/3)/2 = 0.833333
    # q2: hits at ranks 2 and 4 -> rr=0.5, ap=(1/2+2/4)/2=0.5
    # q3: no hits -> rr=0, ap=0, first_hit NULL
    rows = [
        ("q1", 1, 40, 1), ("q1", 2, 30, 0), ("q1", 3, 20, 1), ("q1", 4, 10, 0),
        ("q2", 1, 40, 0), ("q2", 2, 30, 1), ("q2", 3, 20, 0), ("q2", 4, 10, 1),
        ("q3", 1, 40, 0), ("q3", 2, 30, 0),
    ]
    df = spark.createDataFrame(rows, "q string, id long, s long, rel int")
    out = {r.q: r for r in rank_eval_binary(df, "q", "rel", "s", "id", k=10).collect()}
    assert out["q1"].first_hit_rank == 1 and out["q1"].rr == 1.0
    assert out["q1"].ap == pytest.approx(5 / 6, abs=1e-6)
    assert out["q2"].first_hit_rank == 2 and out["q2"].rr == 0.5
    assert out["q2"].ap == pytest.approx(0.5, abs=1e-9)
    assert out["q3"].first_hit_rank is None
    assert (out["q3"].rr, out["q3"].ap) == (0.0, 0.0)
    assert out["q3"].n_rel == 0


def test_rank_eval_binary_k_cutoff_and_tie_break(spark):
    from raptor_spark.operators.ranking import rank_eval_binary

    # equal scores tie-break by id asc: hit at id 2 ranks SECOND;
    # with k=1 the hit falls outside the prefix -> rr=0, ap=0, but n_rel
    # still counts it (denominator min(n_rel, k) = 1)
    rows = [("q", 1, 10, 0), ("q", 2, 10, 1)]
    df = spark.createDataFrame(rows, "q string, id long, s long, rel int")
    r = rank_eval_binary(df, "q", "rel", "s", "id", k=1).collect()[0]
    assert r.first_hit_rank is None and r.rr == 0.0 and r.ap == 0.0
    assert r.n_rel == 1
    r2 = rank_eval_binary(df, "q", "rel", "s", "id", k=2).collect()[0]
    assert r2.first_hit_rank == 2 and r2.rr == 0.5
    assert r2.ap == pytest.approx(0.5, abs=1e-9)


def test_vocab_coverage_hand_corpus(spark):
    from raptor_spark.operators.text import vocab_coverage

    # frequencies: a=4, b=3, c=2, d=1 (total 10); rank order a,b,c,d
    df = spark.createDataFrame(
        [(1, "a a b c"), (2, "a b d"), (3, "a b c")], "id long, text string"
    )
    out = {r.vocab_size: r for r in vocab_coverage(df, "text", cutoffs=(1, 2, 3, 4, 9)).collect()}
    assert out[1].covered_tokens == 4 and out[1].oov_rate == 0.6
    assert out[2].covered_tokens == 7 and out[2].oov_rate == pytest.approx(0.3)
    assert out[3].covered_tokens == 9
    assert out[4].covered_tokens == 10 and out[4].oov_rate == 0.0
    # cutoff past the vocab end covers everything
    assert out[9].covered_tokens == 10 and out[9].total_tokens == 10


def test_vocab_coverage_tie_break_by_word(spark):
    from raptor_spark.operators.text import vocab_coverage

    # all freq 1: rank by word asc -> k=2 covers exactly 2 tokens
    df = spark.createDataFrame([(1, "z m a q")], "id long, text string")
    out = {r.vocab_size: r for r in vocab_coverage(df, "text", cutoffs=(2,)).collect()}
    assert out[2].covered_tokens == 2


def test_span_corruption_reconstruction_invariant(spark):
    from raptor_spark.operators.text import span_corruption

    docs = [
        (7, "the quick brown fox jumps over the lazy dog again and again"),
        (13, "pack my box with five dozen liquor jugs right now"),
        (42, "a b c d e f g h i j k l m n o p q r s t u v w x y z"),
        (99, "one"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r.id: r for r in span_corruption(df, "doc_id", "text").collect()}
    for did, text in docs:
        r = out[did]
        orig = text.lower().split()
        # splice each sentinel's span from the target back into the input
        spans = {}
        cur = None
        for tok in r.target_text.split():
            if tok.startswith("<X_"):
                cur = tok
                spans[cur] = []
            else:
                spans[cur].append(tok)
        rebuilt = []
        for tok in r.input_text.split():
            if tok.startswith("<X_"):
                rebuilt.extend(spans[tok])
            else:
                rebuilt.append(tok)
        assert rebuilt == orig, did
        assert r.n_masked == sum(len(v) for v in spans.values())
        assert r.n_spans == len(spans)
        # sentinels are sequentially numbered from 1 in input order
        sents = [t for t in r.input_text.split() if t.startswith("<X_")]
        assert sents == [f"<X_{i+1}>" for i in range(len(sents))]


def test_span_corruption_is_deterministic_and_masks_something(spark):
    from raptor_spark.operators.text import span_corruption

    df = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta eta theta " * 6) for i in range(30)],
        "doc_id long, text string",
    )
    a = {(r.id, r.input_text, r.target_text) for r in span_corruption(df, "doc_id", "text").collect()}
    b = {(r.id, r.input_text, r.target_text) for r in span_corruption(df, "doc_id", "text").collect()}
    assert a == b
    total_masked = sum(r.n_masked for r in span_corruption(df, "doc_id", "text").collect())
    assert total_masked > 0


def test_causal_lm_windows_python_replay(spark):
    from raptor_spark.operators.text import causal_lm_windows

    docs = [
        (3, "a b c d e f g h i j k l m"),
        (4, "one two three"),          # too short: no windows
        (5, "t0 t1 t2 t3 t4 t5 t6 t7 t8"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r.id, r.pos): (r.context_text, r.target)
        for r in causal_lm_windows(df, "doc_id", "text", context=4, stride=2).collect()
    }
    expect = {}
    for did, text in docs:
        ws = text.lower().split()
        for p in range(4, len(ws), 2):
            expect[(did, p)] = (" ".join(ws[p - 4:p]), ws[p])
    assert got == expect


def test_mlm_masking_invariants(spark):
    from raptor_spark.operators.text import mlm_masking

    df = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4)
         for i in range(20)],
        "doc_id long, text string",
    )
    rows = mlm_masking(df, "doc_id", "text").collect()
    assert sum(r.n_selected for r in rows) > 0
    for r in rows:
        orig = df.filter(F.col("doc_id") == r.id).collect()[0].text.lower().split()
        masked = r.masked_text.split()
        # same length, labels count selected positions, actions partition
        assert len(masked) == len(orig)
        assert len(r.labels_text.split()) == r.n_selected
        assert r.n_selected == r.n_masked + r.n_replaced + r.n_kept
        # non-selected positions unchanged; [MASK] count matches
        assert masked.count("[MASK]") == r.n_masked
    a = {(r.id, r.masked_text) for r in rows}
    b = {(r.id, r.masked_text) for r in mlm_masking(df, "doc_id", "text").collect()}
    assert a == b


def test_span_and_mlm_survive_xxhash64_ids(spark):
    """ADVICE r3 (high): raw 64-bit hash ids (the BENCH/scaling_job.py
    --mode mask workload uses xxhash64 doc ids) overflowed the *131/*61
    congruential mixes under Spark 4 ANSI mode, and negative ids gave
    negative residues selecting ~50% of positions instead of the
    documented ~5%/15%. Both operators now reduce the id with
    pmod(id, 1000003) before mixing; this pins (a) no ARITHMETIC_OVERFLOW
    on int64-extreme ids, (b) the documented sampling rate for negative
    ids, (c) an exact Python replay of the selection rule."""
    from raptor_spark.operators.text import mlm_masking, span_corruption

    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 40
    ids = [9223372036854775807, -9223372036854775808, -5, 123456789012345678]
    df = spark.createDataFrame(
        [(i, text) for i in ids], "doc_id long, text string"
    )
    n = len(text.split())

    span_rows = {r.id: r for r in span_corruption(df, "doc_id", "text").collect()}
    mlm_rows = {r.id: r for r in mlm_masking(df, "doc_id", "text").collect()}
    assert set(span_rows) == set(ids) and set(mlm_rows) == set(ids)
    for i in ids:
        rid = i % 1000003  # Python % == pmod for a positive modulus
        expect_starts = [p for p in range(n) if (rid * 131 + p * 31) % 97 < 5]
        # documented rate: ~span_len * 5/97 of positions; a negative-residue
        # bug would push this past 40%
        assert 0 < span_rows[i].n_masked <= 3 * len(expect_starts)
        assert span_rows[i].n_masked / n < 0.35, i
        expect_sel = [p for p in range(n) if (rid * 61 + p * 53) % 100 < 15]
        assert mlm_rows[i].n_selected == len(expect_sel), i
        assert len(mlm_rows[i].masked_text.split()) == n


def test_brier_score_hand_fixture(spark):
    from raptor_spark.operators.profile import brier_score

    # perfect forecaster: p=100 when y=1, p=0 when y=0 -> brier 0, skill 1
    # always-50: brier 0.25; skill 0 when base rate is 0.5
    rows = (
        [("perf", 100, 1)] * 3 + [("perf", 0, 0)] * 3
        + [("half", 50, 1)] * 2 + [("half", 50, 0)] * 2
        + [("onesided", 70, 1)] * 4
    )
    df = spark.createDataFrame(rows, "g string, k int, y int")
    out = {r.g: r for r in brier_score(df, ["g"], "k", "y").collect()}
    assert out["perf"].brier == 0.0 and out["perf"].brier_skill == 1.0
    assert out["half"].brier == 0.25 and out["half"].brier_skill == 0.0
    assert out["onesided"].brier_skill is None
    assert out["onesided"].brier == pytest.approx(0.09, abs=1e-9)


def test_mips_topk_magnitude_beats_direction(spark):
    from raptor_spark.operators.similarity import mips_topk

    # q = [1, 0]; candidate 1 aligned but short, candidate 2 slightly
    # off-axis but LONG: inner product prefers 2, cosine would prefer 1
    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [10.0, 3.0]), (3, [0.0, 1.0])],
        "id long, vec array<double>",
    )
    q = spark.createDataFrame([(0, [1.0, 0.0])], "qid long, vec array<double>")
    out = mips_topk(corpus, q, k=3).orderBy("rank").collect()
    assert [r.id for r in out] == [2, 1, 3]
    assert out[0].dot == 10.0


def test_item_item_topk_hand_baskets(spark):
    from raptor_spark.operators.ranking import item_item_topk
    import math

    # items: A in baskets {1,2,3,4}; B in {1,2,3}; C in {4}; D in {5}
    rows = [(1, "A"), (1, "B"), (2, "A"), (2, "B"), (3, "A"), (3, "B"),
            (4, "A"), (4, "C"), (5, "D")]
    df = spark.createDataFrame(rows, "b long, i string")
    out = {(r.i, r.j): r for r in item_item_topk(df, "b", "i", k=3, min_co=1).collect()}
    # cos(A,B) = 3 / sqrt(4*3)
    assert out[("A", "B")].cos == pytest.approx(3 / math.sqrt(12), abs=1e-9)
    assert out[("B", "A")].co == 3
    # C pairs only with A; D pairs with nothing (absent)
    assert out[("C", "A")].co == 1
    assert all(i != "D" and j != "D" for i, j in out)
    # min_co pruning removes the A-C pair
    out2 = {(r.i, r.j) for r in item_item_topk(df, "b", "i", k=3, min_co=2).collect()}
    assert out2 == {("A", "B"), ("B", "A")}
