"""Semantic gates for the corpus-audit operators added in round 3:
ranking.zipf_fit (rank-frequency OLS vs numpy recomputation),
dedup.minhash_signature_md5 / minhash_calibration (hashlib replay +
duplicate-pair exactness), similarity.label_centroid_audit (planted
separated vs collapsed label geometry), similarity.pca_power_scores
(numpy-eigh parity on a planted anisotropic cloud), text.bpe_train
(pure-python BPE reference parity incl. overlap and tie cases)."""

from __future__ import annotations

import hashlib
import math

import pytest

import numpy as np

from raptor_spark.operators.dedup import (
    minhash_calibration,
    minhash_signature_md5,
)
from raptor_spark.operators.ranking import zipf_fit
from raptor_spark.operators.similarity import label_centroid_audit


def test_zipf_fit_matches_numpy_ols(spark):
    docs = spark.createDataFrame(
        [
            (0, "a a a a b b c"),
            (1, "a a b d"),
            (2, "a c d e"),
        ],
        ["doc_id", "text"],
    )
    row = zipf_fit(docs, "text").collect()[0]
    # counts: a=7 b=3 c=2 d=2 e=1 → ranks by (count desc, term asc)
    counts = {"a": 7, "b": 3, "c": 2, "d": 2, "e": 1}
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    x = np.log(np.arange(1, len(ranked) + 1, dtype=float))
    y = np.log(np.array([c for _, c in ranked], dtype=float))
    slope, intercept = np.polyfit(x, y, 1)
    r2 = np.corrcoef(x, y)[0, 1] ** 2
    assert row.n_terms == 5 and row.n_tokens == 15
    assert math.isclose(row.slope, slope, abs_tol=1e-9)
    assert math.isclose(row.intercept, intercept, abs_tol=1e-9)
    assert math.isclose(row.r2, r2, abs_tol=1e-9)
    assert row.slope < 0  # frequency falls with rank


def _mh_py(words: set[str], j: int) -> int:
    return min(
        int(hashlib.md5(f"{w}#mh{j}".encode()).hexdigest()[:8], 16) for w in words
    )


def test_minhash_signature_matches_hashlib(spark):
    docs = spark.createDataFrame(
        [(0, "spark join shuffle"), (1, "join scan")], ["doc_id", "text"]
    )
    rows = {
        r.id: r
        for r in minhash_signature_md5(
            docs, "doc_id", "text", n=1, n_hashes=4
        ).collect()
    }
    for did, words in [(0, {"spark", "join", "shuffle"}), (1, {"join", "scan"})]:
        for j in range(1, 5):
            assert rows[did][f"mh{j}"] == _mh_py(words, j), (did, j)


def test_minhash_calibration_exact_on_duplicates(spark):
    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta"),
            (1, "alpha beta gamma delta"),  # exact dup of 0
            (2, "alpha beta gamma zeta"),  # J = 3/5 with 0 and 1
        ],
        ["doc_id", "text"],
    )
    out = {
        (r.a, r.b): r
        for r in minhash_calibration(
            docs, "doc_id", "text", n=1, threshold=0.5, n_hashes=16
        ).collect()
    }
    dup = out[(0, 1)]
    assert dup.j_exact == 1.0 and dup.j_est == 1.0 and dup.abs_err == 0.0
    near = out[(0, 2)]
    assert math.isclose(near.j_exact, 0.6, abs_tol=1e-12)
    # the estimate is a fraction of 16 matching lanes, inside [0, 1]
    assert 0.0 <= near.j_est <= 1.0
    assert math.isclose(near.abs_err, abs(near.j_exact - near.j_est), abs_tol=1e-12)


def test_label_centroid_audit_planted_geometry(spark):
    rng = np.random.default_rng(7)
    rows = []
    vid = 0
    # label 0 and label 1: tight, far-apart clusters → sil near 1
    for label, center in [(0, 0.0), (1, 100.0)]:
        for _ in range(20):
            v = (center + rng.normal(0, 0.1, 8)).tolist()
            rows.append((vid, [float(x) for x in v], label))
            vid += 1
    # labels 2 and 3: the SAME point cloud split in two → collapsed, sil ≈ 0
    for label in (2, 3):
        for _ in range(20):
            v = (50.0 + rng.normal(0, 0.1, 8)).tolist()
            rows.append((vid, [float(x) for x in v], label))
            vid += 1
    emb = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    out = {
        r.label: r
        for r in label_centroid_audit(emb, "vec_id", "embedding", "label").collect()
    }
    assert all(out[l].n_vecs == 20 for l in range(4))
    assert out[0].mean_sil > 0.9 and out[1].mean_sil > 0.9
    assert out[2].mean_sil < 0.3 and out[3].mean_sil < 0.3
    # separated labels: nearest-other centroid is far vs intra spread
    assert out[0].avg_nearest_other > 10 * out[0].avg_intra
    # collapsed labels: the other centroid is about as close as one's own
    assert out[2].avg_nearest_other < 2 * out[2].avg_intra


def test_pca_power_scores_matches_numpy_eig(spark):
    from raptor_spark.operators.similarity import pca_power_scores

    rng = np.random.default_rng(11)
    # anisotropic cloud: variance 25 along a fixed direction, 0.01 elsewhere
    d = 6
    direction = np.ones(d) / math.sqrt(d)
    data = (
        rng.normal(0, 5, (80, 1)) * direction
        + rng.normal(0, 0.1, (80, d))
        + 3.0  # nonzero mean: centering must matter
    )
    rows = [(i, [float(x) for x in data[i]]) for i in range(80)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    got = {
        r.id: r.pc1
        for r in pca_power_scores(df, "vec_id", "embedding", n_iter=30).collect()
    }
    mu = data.mean(axis=0)
    cov = np.cov(data, rowvar=False, bias=True)
    evals, evecs = np.linalg.eigh(cov)
    top = evecs[:, -1]
    want = (data - mu) @ top
    gv = np.array([got[i] for i in range(80)])
    # power iteration's sign is fixed by v0=e0; compare up to global sign
    sign = 1.0 if abs(gv[0] - want[0]) < abs(gv[0] + want[0]) else -1.0
    assert np.allclose(gv, sign * want, atol=1e-6)
    # the projection captures nearly all the variance
    assert gv.var() > 0.95 * np.trace(cov)


def _bpe_py(word_counts: dict[str, int], n_merges: int):
    vocab = {w: (list(w), c) for w, c in word_counts.items()}
    merges = []
    for rank in range(1, n_merges + 1):
        counts: dict[tuple[str, str], int] = {}
        for toks, c in vocab.values():
            for i in range(len(toks) - 1):
                counts[(toks[i], toks[i + 1])] = (
                    counts.get((toks[i], toks[i + 1]), 0) + c
                )
        if not counts:
            break
        (l, r), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, l, r, l + r, c))
        for w, (toks, wc) in vocab.items():
            out: list[str] = []
            for x in toks:
                if out and out[-1] == l and x == r:
                    out[-1] = l + r
                else:
                    out.append(x)
            vocab[w] = (out, wc)
    return merges


def test_bpe_train_matches_python_reference(spark):
    from collections import Counter

    from raptor_spark.operators.text import bpe_train

    texts = [
        (0, "low lower lowest low low"),
        (1, "new newer newest new"),
        (2, "aaaa aaaa baaa"),  # overlapping-pair greedy semantics
        (3, "xy xz"),  # tie broken lexicographically
    ]
    wc = Counter(w for _, t in texts for w in t.split())
    want = _bpe_py(dict(wc), 10)
    docs = spark.createDataFrame(texts, ["doc_id", "text"])
    got = [
        (r.rank, r.left, r.right, r.merged, r.pair_count)
        for r in bpe_train(docs, "text", n_merges=10).orderBy("rank").collect()
    ]
    assert got == want
    # greedy left-to-right on "aaaa" with (a,a): [aa, aa], not [aa, a, a]+[a, aa]
    aa = [m for m in want if m[3] == "aa"]
    assert aa, "fixture must exercise the overlap case"


def test_bpe_compression_matches_python_reference(spark):
    from collections import Counter

    from raptor_spark.operators.text import bpe_compression

    texts = [
        (0, "low lower lowest low low", "a"),
        (1, "new newer newest new", "a"),
        (2, "zq xv qzx vxq", "b"),  # OOD slice: merges won't help it
    ]
    docs = spark.createDataFrame(texts, ["doc_id", "text", "src"])
    wc = Counter(w for _, t, _ in texts for w in t.split())
    merges = _bpe_py(dict(wc), 6)
    # apply the merges to every word with the same greedy fold
    vocab = {w: list(w) for w in wc}
    for _, l, r, m, _ in merges:
        for w, toks in vocab.items():
            out: list[str] = []
            for x in toks:
                if out and out[-1] == l and x == r:
                    out[-1] = m
                else:
                    out.append(x)
            vocab[w] = out
    want = {}
    for s in ("a", "b"):
        ws = [w for _, t, src in texts if src == s for w in t.split()]
        n_words = len(ws)
        n_chars = sum(len(w) for w in ws)
        n_tokens = sum(len(vocab[w]) for w in ws)
        want[s] = (n_words, n_chars, n_tokens)
    got = {
        r.slice: r
        for r in bpe_compression(docs, "text", "src", n_merges=6).collect()
    }
    for s in ("a", "b"):
        assert (got[s].n_words, got[s].n_chars, got[s].n_tokens) == want[s], s
        assert math.isclose(
            got[s].tokens_per_word, want[s][2] / want[s][0], abs_tol=1e-12
        )
        assert math.isclose(
            got[s].compression, want[s][2] / want[s][1], abs_tol=1e-12
        )
    # the in-distribution slice compresses; the OOD slice barely does
    assert got["a"].compression < 0.7
    assert got["b"].compression > 0.9


def test_term_keyness_planted_distinctive_vocab(spark):
    from raptor_spark.operators.ranking import term_keyness

    # slice "med" over-uses "patient"; slice "law" over-uses "court";
    # "the" is common everywhere (high count, G2 ~ 0, filtered by the
    # overrepresentation test or ranked below the planted terms)
    rows = []
    for i in range(20):
        rows.append((i, "the patient felt the dose " + ("patient " * 3), "med"))
    for i in range(20, 40):
        rows.append((i, "the court ruled the case " + ("court " * 3), "law"))
    docs = spark.createDataFrame(rows, ["doc_id", "text", "src"])
    out = term_keyness(docs, "text", "src", top_n=3, min_count=5).collect()
    top = {r.slice: r.term for r in out if r.rk == 1}
    assert top == {"med": "patient", "law": "court"}
    # G2 manual check for ("med", "patient"): a=80, t=80, n1=160, N=320
    med_patient = [r for r in out if r.slice == "med" and r.term == "patient"][0]
    a, t, n1, big_n = 80, 80, 160, 320
    b, n2 = t - a, big_n - n1
    e1 = n1 * t / big_n
    g2 = 2.0 * (a * math.log(a / e1))  # b == 0 branch contributes 0
    assert med_patient.a == a and med_patient.t == t
    assert math.isclose(med_patient.g2, g2, rel_tol=1e-12)
    # "the" appears in both slices at equal rate: never overrepresented
    assert not [r for r in out if r.term == "the"]


def test_term_keyness_partition_invariance(spark):
    from raptor_spark.operators.ranking import term_keyness

    rows = [
        (i, f"alpha beta w{i % 7} w{i % 3} gamma" + " zeta" * (i % 4), f"s{i % 3}")
        for i in range(60)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "src"])
    a = term_keyness(docs, "text", "src", top_n=4, min_count=3)
    b = term_keyness(
        docs.repartition(13, "doc_id"), "text", "src", top_n=4, min_count=3
    )
    ka = sorted((r.slice, r.rk, r.term, r.a, r.t) for r in a.collect())
    kb = sorted((r.slice, r.rk, r.term, r.a, r.t) for r in b.collect())
    assert ka == kb


def test_vocab_divergence_planted_geometry(spark):
    from raptor_spark.operators.ranking import vocab_divergence

    # "a" and "b" share the exact same unigram distribution -> JSD ~ 0;
    # "c" is vocabulary-disjoint from both -> JSD exactly 1 (base 2)
    rows = []
    for i in range(10):
        rows.append((i, "red green green blue", "a"))
        rows.append((100 + i, "green blue red green", "b"))
        rows.append((200 + i, "cyan magenta magenta yellow", "c"))
    docs = spark.createDataFrame(rows, ["doc_id", "text", "src"])
    out = {
        (r.source_a, r.source_b): r
        for r in vocab_divergence(docs, "text", "src").collect()
    }
    assert set(out) == {("a", "b"), ("a", "c"), ("b", "c")}
    ab = out[("a", "b")]
    assert ab.n_tokens_a == 40 and ab.n_tokens_b == 40
    assert ab.common_terms == 3
    assert abs(ab.jsd) < 1e-12
    # disjoint-vocabulary pairs must still appear (grid from slice totals,
    # not the common-term join) with exactly jsd = 1
    for pair in (("a", "c"), ("b", "c")):
        r = out[pair]
        assert r.common_terms == 0
        assert math.isclose(r.jsd, 1.0, rel_tol=1e-12)


def test_vocab_divergence_partition_invariance(spark):
    from raptor_spark.operators.ranking import vocab_divergence

    rows = [
        (i, f"w{i % 11} w{i % 5} alpha beta" + " gamma" * (i % 3), f"s{i % 4}")
        for i in range(80)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "src"])
    a = vocab_divergence(docs, "text", "src")
    b = vocab_divergence(docs.repartition(13, "doc_id"), "text", "src")
    ka = sorted(
        (r.source_a, r.source_b, r.n_tokens_a, r.n_tokens_b, r.common_terms,
         round(r.jsd, 10))
        for r in a.collect()
    )
    kb = sorted(
        (r.source_a, r.source_b, r.n_tokens_a, r.n_tokens_b, r.common_terms,
         round(r.jsd, 10))
        for r in b.collect()
    )
    assert ka == kb


def test_basket_lift_manual_counts(spark):
    from raptor_spark.operators.relational import basket_lift

    rows = []
    for b in range(4):
        rows += [(b, "x"), (b, "y"), (b, "x")]  # dup x: presence, not count
    for b in (4, 5):
        rows += [(b, "x"), (b, "z")]
    for b in (6, 7):
        rows += [(b, "y")]
    for b in (8, 9):
        rows += [(b, "z")]
    facts = spark.createDataFrame(rows, ["basket", "item"])
    out = {
        (r.item_a, r.item_b): r
        for r in basket_lift(facts, "basket", "item", min_support=2).collect()
    }
    # n_x=6, n_y=6, n_z=4, N=10; co(x,y)=4, co(x,z)=2, co(y,z)=0
    assert set(out) == {("x", "y"), ("x", "z")}
    xy = out[("x", "y")]
    assert (xy.n_co, xy.n_a, xy.n_b, xy.n_baskets) == (4, 6, 6, 10)
    assert math.isclose(xy.lift, 4 * 10 / 36.0, rel_tol=1e-12)
    xz = out[("x", "z")]
    assert (xz.n_co, xz.n_a, xz.n_b) == (2, 6, 4)
    assert math.isclose(xz.lift, 2 * 10 / 24.0, rel_tol=1e-12)


def test_basket_lift_partition_invariance(spark):
    from raptor_spark.operators.relational import basket_lift

    rows = [(i % 17, f"it{(i * 7) % 6}") for i in range(200)]
    facts = spark.createDataFrame(rows, ["basket", "item"])
    a = basket_lift(facts, "basket", "item", min_support=2)
    b = basket_lift(facts.repartition(13, "item"), "basket", "item", min_support=2)
    key = lambda r: (r.item_a, r.item_b, r.n_co, r.n_a, r.n_b, r.n_baskets, round(r.lift, 10))
    assert sorted(map(key, a.collect())) == sorted(map(key, b.collect()))


def test_interarrival_burstiness_planted_geometry(spark):
    from datetime import datetime, timedelta

    from raptor_spark.operators.profile import interarrival_burstiness

    t0 = datetime(2024, 1, 1)
    rows = []
    eid = 0
    # periodic: every 10 s exactly -> sigma = 0, B = -1, cv = 0
    for i in range(11):
        rows.append((eid, t0 + timedelta(seconds=10 * i), 1, "periodic"))
        eid += 1
    # bursty: gaps [1]*9 + [91] -> mu = 10 s, sigma = 27 s, B = 17/37
    t = t0
    rows.append((eid, t, 2, "bursty")); eid += 1
    for g in [1] * 9 + [91]:
        t = t + timedelta(seconds=g)
        rows.append((eid, t, 2, "bursty"))
        eid += 1
    # a second periodic user shifted by 3 s: gaps must NOT cross users
    for i in range(5):
        rows.append((eid, t0 + timedelta(seconds=3 + 10 * i), 3, "periodic"))
        eid += 1
    ev = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "event_type"])
    out = {
        r.slice: r
        for r in interarrival_burstiness(
            ev, ["user_id"], "event_type", "ts", "event_id"
        ).collect()
    }
    per = out["periodic"]
    assert per.n_gaps == 10 + 4  # per-stream gaps only
    assert math.isclose(per.cv, 0.0, abs_tol=1e-12)
    assert math.isclose(per.burstiness, -1.0, rel_tol=1e-12)
    assert math.isclose(per.mean_gap_s, 10.0, rel_tol=1e-12)
    bur = out["bursty"]
    assert bur.n_gaps == 10
    assert math.isclose(bur.mean_gap_s, 10.0, rel_tol=1e-12)
    assert math.isclose(bur.burstiness, 17.0 / 37.0, rel_tol=1e-12)
    assert math.isclose(bur.cv, 2.7, rel_tol=1e-12)


def test_interarrival_burstiness_partition_invariance(spark):
    from datetime import datetime, timedelta

    from raptor_spark.operators.profile import interarrival_burstiness

    t0 = datetime(2024, 1, 1)
    rows = [
        (i, t0 + timedelta(seconds=(i * 37) % 1000), i % 7, f"t{i % 3}")
        for i in range(300)
    ]
    ev = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "event_type"])
    a = interarrival_burstiness(ev, ["user_id"], "event_type", "ts", "event_id")
    b = interarrival_burstiness(
        ev.repartition(13, "event_id"), ["user_id"], "event_type", "ts", "event_id"
    )
    key = lambda r: (r.slice, r.n_gaps, round(r.mean_gap_s, 8), round(r.cv, 8),
                     round(r.burstiness, 8))
    assert sorted(map(key, a.collect())) == sorted(map(key, b.collect()))


def test_cusum_changepoint_planted_step(spark):
    from datetime import datetime, timedelta

    from raptor_spark.operators.profile import cusum_changepoint

    d0 = datetime(2024, 3, 1, 12, 0, 0)
    rows = []
    eid = 0
    # "step": 3/day on days 0-9, 9/day on days 10-19 -> cp after day index 9,
    # |S| peak 30, mean_before 3, mean_after 9
    for day in range(20):
        for k in range(3 if day < 10 else 9):
            rows.append((eid, d0 + timedelta(days=day, minutes=k), "step"))
            eid += 1
    # "flat": exactly 4/day -> sd = 0, stat = 0, t_stat = 0 everywhere,
    # tie broken to the earliest day
    for day in range(20):
        for k in range(4):
            rows.append((eid, d0 + timedelta(days=day, minutes=k), "flat"))
            eid += 1
    # "gappy": 2/day except day 7 has none -> the zero-filled grid must
    # count day 7 as an observation (n_days = 20, cp lands at day 7 area)
    for day in range(20):
        if day == 7:
            continue
        for k in range(2):
            rows.append((eid, d0 + timedelta(days=day, minutes=k), "gappy"))
            eid += 1
    ev = spark.createDataFrame(rows, ["event_id", "ts", "event_type"])
    out = {r.slice: r for r in cusum_changepoint(ev, "event_type", "ts").collect()}
    assert set(out) == {"step", "flat", "gappy"}
    assert all(out[k].n_days == 20 for k in out)

    st = out["step"]
    assert st.cp_day.day == 10  # March 10 = last low-rate day (index 9)
    assert math.isclose(st.max_cusum, 30.0, rel_tol=1e-12)
    assert math.isclose(st.mean_before, 3.0, rel_tol=1e-12)
    assert math.isclose(st.mean_after, 9.0, rel_tol=1e-12)
    assert math.isclose(st.shift, 6.0, rel_tol=1e-12)
    assert math.isclose(st.stat, 30.0 / (3.0 * math.sqrt(20)), rel_tol=1e-12)

    fl = out["flat"]
    assert fl.cp_day.day == 1 and fl.max_cusum == 0.0 and fl.stat == 0.0

    gp = out["gappy"]
    assert gp.n_days == 20  # zero-filled day 7 counted


def test_cusum_changepoint_partition_invariance(spark):
    from datetime import datetime, timedelta

    from raptor_spark.operators.profile import cusum_changepoint

    d0 = datetime(2024, 3, 1)
    rows = [
        (i, d0 + timedelta(days=(i * 13) % 25, seconds=i), f"t{i % 3}")
        for i in range(400)
    ]
    ev = spark.createDataFrame(rows, ["event_id", "ts", "event_type"])
    a = cusum_changepoint(ev, "event_type", "ts")
    b = cusum_changepoint(ev.repartition(17, "event_id"), "event_type", "ts")
    key = lambda r: (r.slice, r.n_days, r.cp_day, round(r.max_cusum, 8),
                     round(r.stat, 8), round(r.shift, 8))
    assert sorted(map(key, a.collect())) == sorted(map(key, b.collect()))


def _ks_py(vals: dict[str, list[int]]):
    out = {}
    for s, xs in vals.items():
        rest = [v for k, vv in vals.items() if k != s for v in vv]
        grid = sorted(set(v for vv in vals.values() for v in vv))
        n_s, n_r = len(xs), len(rest)
        best = None
        for v in grid:
            t = abs(n_r * sum(1 for x in xs if x <= v)
                    - n_s * sum(1 for x in rest if x <= v))
            if best is None or t > best[0]:
                best = (t, v)
        t, v = best
        out[s] = (n_s, n_r, v, t / (n_s * n_r))
    return out


def test_ks_drift_matches_bruteforce(spark):
    from raptor_spark.operators.profile import ks_drift

    vals = {
        "a": [(i * 7) % 10 + 1 for i in range(30)],
        "b": [(i * 3) % 12 + 5 for i in range(40)],
        "c": [(i * 5) % 6 + 2 for i in range(25)],
    }
    rows = [
        (i, s, v)
        for i, (s, v) in enumerate(
            (s, v) for s, vv in sorted(vals.items()) for v in vv
        )
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "source", "n_chars"])
    got = {r.slice: r for r in ks_drift(docs, "source", "n_chars").collect()}
    want = _ks_py(vals)
    for s, (n_s, n_r, v, d) in want.items():
        r = got[s]
        assert (r.n_s, r.n_r) == (n_s, n_r), s
        assert r.at_value == v, s
        assert math.isclose(r.ks_d, d, rel_tol=1e-12), s


def test_ks_drift_disjoint_ranges_hit_d1(spark):
    from raptor_spark.operators.profile import ks_drift

    # a: 1..10, b: 11..20 -> fully separated, D = 1 at v = 10 for both
    rows = [(i, "a", i + 1) for i in range(10)]
    rows += [(100 + i, "b", 11 + i) for i in range(10)]
    docs = spark.createDataFrame(rows, ["doc_id", "source", "n_chars"])
    out = {r.slice: r for r in ks_drift(docs, "source", "n_chars").collect()}
    for s in ("a", "b"):
        assert math.isclose(out[s].ks_d, 1.0, rel_tol=1e-12)
        assert out[s].at_value == 10
    assert math.isclose(
        out["a"].ks_scaled, math.sqrt(100 / 20.0), rel_tol=1e-12
    )


def test_ks_drift_partition_invariance(spark):
    from raptor_spark.operators.profile import ks_drift

    rows = [(i, f"s{i % 4}", (i * 11) % 30) for i in range(200)]
    docs = spark.createDataFrame(rows, ["doc_id", "source", "n_chars"])
    a = ks_drift(docs, "source", "n_chars")
    b = ks_drift(docs.repartition(13, "doc_id"), "source", "n_chars")
    key = lambda r: (r.slice, r.n_s, r.n_r, r.at_value, round(r.ks_d, 10))
    assert sorted(map(key, a.collect())) == sorted(map(key, b.collect()))


def test_lexical_diversity_manual_counts(spark):
    from raptor_spark.operators.ranking import lexical_diversity

    docs = spark.createDataFrame(
        [
            (0, "a a a b b c", "rich"),     # + doc 1: tokens 10
            (1, "d e f g", "rich"),         # types 7, hapax c d e f g = 5
            (2, "x x x x x", "boiler"),     # tokens 10, types 2, hapax 0
            (3, "x x x y y", "boiler"),
        ],
        ["doc_id", "text", "src"],
    )
    out = {r.slice: r for r in lexical_diversity(docs, "text", "src").collect()}
    rich = out["rich"]
    assert (rich.n_tokens, rich.n_types, rich.n_hapax) == (10, 7, 5)
    assert math.isclose(rich.ttr, 0.7, rel_tol=1e-12)
    assert math.isclose(rich.hapax_ratio, 5 / 7, rel_tol=1e-12)
    assert math.isclose(rich.guiraud, 7 / math.sqrt(10), rel_tol=1e-12)
    boiler = out["boiler"]
    assert (boiler.n_tokens, boiler.n_types, boiler.n_hapax) == (10, 2, 0)
    assert boiler.ttr < rich.ttr and boiler.hapax_ratio < rich.hapax_ratio


def _winnow_py(text: str, k: int = 3, w: int = 4) -> set[int]:
    ws = [x for x in text.lower().strip().split() if x]
    if len(ws) < k:
        return set()
    hs = [
        int(hashlib.md5(" ".join(ws[i : i + k]).encode()).hexdigest()[:8], 16)
        for i in range(len(ws) - k + 1)
    ]
    n_win = max(1, len(hs) - w + 1)
    return {min(hs[i : i + w]) for i in range(n_win)}


def test_winnow_fingerprints_match_hashlib_replay(spark):
    from raptor_spark.operators.dedup import winnow_fingerprints

    texts = [
        (0, "the quick brown fox jumps over the lazy dog tonight"),
        (1, "tiny doc"),                       # < k words -> no fingerprints
        (2, "one two three"),                  # exactly k -> single hash, min of all
        (3, "alpha beta gamma delta epsilon"),
    ]
    docs = spark.createDataFrame(texts, ["doc_id", "text"])
    got: dict[int, set[int]] = {}
    for r in winnow_fingerprints(docs, "doc_id", "text", k=3, w=4).collect():
        got.setdefault(r.id, set()).add(r.fp)
    for did, t in texts:
        want = _winnow_py(t)
        assert got.get(did, set()) == want, did


def test_winnow_pairs_guarantee_and_cap(spark):
    from raptor_spark.operators.dedup import winnow_pairs

    shared = "zebra yak xylo wombat viper unicorn"  # 6 words = w + k - 1
    rows = [
        (0, f"aa bb cc {shared} dd ee ff"),
        (1, f"gg hh ii jj {shared} kk ll"),
        (2, "mm nn oo pp qq rr ss tt uu vv"),  # unrelated
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        (r.a, r.b): r
        for r in winnow_pairs(
            docs, "doc_id", "text", k=3, w=4, max_df=20, min_shared=1
        ).collect()
    }
    # the winnowing guarantee: a shared >= w+k-1 word run MUST produce at
    # least one common fingerprint
    assert (0, 1) in out
    assert not any(2 in p for p in out)
    r = out[(0, 1)]
    assert r.n_shared >= 1
    assert math.isclose(
        r.overlap, r.n_shared / min(r.n_fp_a, r.n_fp_b), rel_tol=1e-12
    )
    # stop-fingerprint cap: with max_df=1 nothing is eligible -> no pairs
    capped = winnow_pairs(
        docs, "doc_id", "text", k=3, w=4, max_df=1, min_shared=1
    ).collect()
    assert capped == []


def test_winnow_pairs_partition_invariance(spark):
    from raptor_spark.operators.dedup import winnow_pairs

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (i, base if i % 5 == 0 else f"{base.split()[i % 9]} w{i} x{i*7%13} y z q r s t u")
        for i in range(40)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    a = winnow_pairs(docs, "doc_id", "text", min_shared=1)
    b = winnow_pairs(docs.repartition(7, "doc_id"), "doc_id", "text", min_shared=1)
    key = lambda r: (r.a, r.b, r.n_shared, r.n_fp_a, r.n_fp_b)
    assert sorted(map(key, a.collect())) == sorted(map(key, b.collect()))


def test_lsh_blocking_audit_planted(spark):
    from raptor_spark.operators.dedup import lsh_blocking_audit

    # exact duplicates agree on every lane -> every band -> always
    # candidates: with ONLY exact-dup true pairs, recall must be 1.0
    rows = [
        (0, "alpha beta gamma delta epsilon"),
        (1, "alpha beta gamma delta epsilon"),  # dup of 0
        (2, "zeta eta theta iota kappa"),
        (3, "zeta eta theta iota kappa"),       # dup of 2
        (4, "one two three four five"),         # unrelated
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    r = lsh_blocking_audit(
        docs, "doc_id", "text", n=1, threshold=0.9, n_hashes=16, bands=4
    ).collect()[0]
    assert r.n_docs == 5
    assert r.n_exact == 2  # (0,1), (2,3)
    assert r.n_hit == 2 and math.isclose(r.recall, 1.0, rel_tol=1e-12)
    assert r.n_cand >= 2
    assert r.n_hit <= min(r.n_exact, r.n_cand)
    assert math.isclose(r.precision, r.n_hit / r.n_cand, rel_tol=1e-12)
    assert math.isclose(
        r.reduction_ratio, 1.0 - r.n_cand / 10.0, rel_tol=1e-12
    )


def test_lsh_blocking_audit_empty_truth(spark):
    from raptor_spark.operators.dedup import lsh_blocking_audit

    docs = spark.createDataFrame(
        [(0, "aa bb cc"), (1, "dd ee ff"), (2, "gg hh ii")],
        ["doc_id", "text"],
    )
    r = lsh_blocking_audit(
        docs, "doc_id", "text", n=1, threshold=0.9, n_hashes=16, bands=4
    ).collect()[0]
    assert r.n_exact == 0
    assert r.recall == 1.0  # vacuous truth -> perfect completeness


def test_rfm_segments_planted_scores(spark):
    from datetime import datetime, timedelta

    from raptor_spark.operators.relational import rfm_segments

    t0 = datetime(2024, 1, 1)
    rows = []
    # customer c has c orders, latest at t0 + c days, each worth 10*c:
    # recency/frequency/monetary orders all agree -> customer c gets
    # score c on every dimension (5 customers, 5 tiles)
    for c in range(1, 6):
        for j in range(c):
            rows.append((c, t0 + timedelta(days=c - (0 if j == 0 else 1)), 10.0 * c))
    orders = spark.createDataFrame(rows, ["cust", "ts", "amount"])
    out = rfm_segments(orders, "cust", "ts", "amount", n_tiles=5).collect()
    cells = {(r.r_score, r.f_score, r.m_score): r for r in out}
    assert set(cells) == {(c, c, c) for c in range(1, 6)}
    for c in range(1, 6):
        r = cells[(c, c, c)]
        assert r.n_entities == 1
        assert math.isclose(r.avg_monetary, 10.0 * c * c, rel_tol=1e-12)


def test_rfm_segments_ansi_ntile_remainder(spark):
    from datetime import datetime, timedelta

    from raptor_spark.operators.relational import rfm_segments

    t0 = datetime(2024, 1, 1)
    # 6 identical entities into 5 tiles: ANSI ntile puts the remainder row
    # in the FIRST bucket -> tile sizes [2,1,1,1,1]; ties broken by key
    rows = [(c, t0, 5.0) for c in range(1, 7)]
    orders = spark.createDataFrame(rows, ["cust", "ts", "amount"])
    out = rfm_segments(orders, "cust", "ts", "amount", n_tiles=5).collect()
    sizes = sorted(
        (r.r_score, r.n_entities) for r in out
    )
    by_score: dict[int, int] = {}
    for s, n in sizes:
        by_score[s] = by_score.get(s, 0) + n
    assert by_score == {1: 2, 2: 1, 3: 1, 4: 1, 5: 1}


def test_acf_daily_planted_period3(spark):
    from datetime import datetime, timedelta

    from raptor_spark.operators.profile import acf_daily

    d0 = datetime(2024, 5, 1, 8, 0, 0)
    # period-3 rate: counts cycle 1, 1, 7 across 21 days
    cycle = [1, 1, 7]
    counts = [cycle[i % 3] for i in range(21)]
    rows = []
    eid = 0
    for day, cnt in enumerate(counts):
        for j in range(cnt):
            rows.append((eid, d0 + timedelta(days=day, minutes=j), "cyc"))
            eid += 1
    ev = spark.createDataFrame(rows, ["event_id", "ts", "event_type"])
    got = {r.lag: r.acf for r in acf_daily(ev, "event_type", "ts", max_lag=7).collect()}

    x = np.array(counts, dtype=float)
    mu = x.mean()
    den = ((x - mu) ** 2).sum()
    want = {
        L: float(((x[L:] - mu) * (x[:-L] - mu)).sum() / den) for L in range(1, 8)
    }
    for L in range(1, 8):
        assert math.isclose(got[L], want[L], rel_tol=1e-12), L
    # the period shows: lag 3 and 6 strongly positive, lag 1 negative
    assert got[3] > 0.7 and got[6] > 0.5 and got[1] < 0


def test_acf_daily_constant_series_zero(spark):
    from datetime import datetime, timedelta

    from raptor_spark.operators.profile import acf_daily

    d0 = datetime(2024, 5, 1)
    rows = [(i, d0 + timedelta(days=i % 10, hours=1), "flat") for i in range(30)]
    ev = spark.createDataFrame(rows, ["event_id", "ts", "event_type"])
    out = acf_daily(ev, "event_type", "ts", max_lag=7).collect()
    assert len(out) == 7 and all(r.acf == 0.0 for r in out)


def test_fd_strength_planted(spark):
    from raptor_spark.operators.profile import fd_strength

    rows = []
    # a -> b exact FD: a=x always maps to 1, a=y always to 2
    for i in range(10):
        rows.append((i, "x", 1))
    for i in range(10, 16):
        rows.append((i, "y", 2))
    df = spark.createDataFrame(rows, ["rid", "a", "b"])
    r = fd_strength(df, "a", "b").collect()[0]
    assert (r.n_rows, r.n_lhs, r.n_pairs) == (16, 2, 2)
    assert math.isclose(r.strength, 1.0, rel_tol=1e-12)

    # violated: a=x maps 7 rows -> 1 and 3 rows -> 2; a=y exact
    rows2 = [(i, "x", 1) for i in range(7)] + [(i, "x", 2) for i in range(7, 10)]
    rows2 += [(i, "y", 3) for i in range(10, 14)]
    df2 = spark.createDataFrame(rows2, ["rid", "a", "b"])
    r2 = fd_strength(df2, "a", "b").collect()[0]
    assert (r2.n_rows, r2.n_lhs, r2.n_pairs) == (14, 2, 3)
    assert math.isclose(r2.strength, (7 + 4) / 14.0, rel_tol=1e-12)


def test_markov_entropy_planted_chains(spark):
    from datetime import datetime, timedelta

    from raptor_spark.operators.profile import markov_entropy

    t0 = datetime(2024, 6, 1)
    # user 1: deterministic cycle a->b->c->a... -> H = 0, predictability 1
    seq = ["a", "b", "c"] * 5
    rows = [(i, t0 + timedelta(seconds=i), 1, s) for i, s in enumerate(seq)]
    ev = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "event_type"])
    r = markov_entropy(ev, ["user_id"], ["ts", "event_id"], "event_type").collect()[0]
    assert r.n_transitions == 14 and r.n_states == 3
    assert math.isclose(r.entropy_bits, 0.0, abs_tol=1e-12)
    assert math.isclose(r.predictability, 1.0, rel_tol=1e-12)

    # mixed: transitions a->a x2, a->b x2 (H(a)=1 bit), b->a x3 (H(b)=0)
    seq2 = ["a", "a", "b", "a", "b", "a", "a", "b", "a"]
    # transitions: aa, ab, ba, ab, ba, aa, ab... recompute from pairs below
    rows2 = [(i, t0 + timedelta(seconds=i), 7, s) for i, s in enumerate(seq2)]
    ev2 = spark.createDataFrame(rows2, ["event_id", "ts", "user_id", "event_type"])
    r2 = markov_entropy(ev2, ["user_id"], ["ts", "event_id"], "event_type").collect()[0]
    pairs = list(zip(seq2, seq2[1:]))
    from collections import Counter

    c = Counter(pairs)
    n = sum(c.values())
    row = Counter(a for a, _ in pairs)
    h = -sum(k * math.log2(k / row[a]) for (a, _), k in c.items()) / n
    assert r2.n_transitions == n
    assert math.isclose(r2.entropy_bits, h, rel_tol=1e-12)
    assert math.isclose(r2.predictability, 1 - h / 1.0, rel_tol=1e-12)


def test_composition_diversity_planted(spark):
    from raptor_spark.operators.profile import composition_diversity

    rows = []
    # "uniform": 4 parts x 5 rows -> H = 2 bits, effective 4, simpson 0.25
    for p in range(4):
        for i in range(5):
            rows.append((len(rows), "uniform", f"p{p}"))
    # "skewed": 99% one part -> effective count near 1
    for i in range(99):
        rows.append((len(rows), "skewed", "big"))
    rows.append((len(rows), "skewed", "tiny"))
    df = spark.createDataFrame(rows, ["rid", "grp", "part"])
    out = {r.grp: r for r in composition_diversity(df, "grp", "part").collect()}
    u = out["uniform"]
    assert (u.n_rows, u.n_parts) == (20, 4)
    assert math.isclose(u.entropy_bits, 2.0, rel_tol=1e-12)
    assert math.isclose(u.effective_parts, 4.0, rel_tol=1e-12)
    assert math.isclose(u.simpson, 0.25, rel_tol=1e-12)
    s = out["skewed"]
    h = -(0.99 * math.log2(0.99) + 0.01 * math.log2(0.01))
    assert math.isclose(s.entropy_bits, h, rel_tol=1e-12)
    assert s.effective_parts < 1.1 and s.n_parts == 2


def test_heaps_fit_matches_numpy_ols(spark):
    from raptor_spark.operators.ranking import heaps_fit

    texts = [
        (0, "a b c a"),
        (1, "a d e"),
        (2, "f f g a b"),
        (3, "h i"),
        (4, "a b c"),  # no new terms: V flat while N grows
    ]
    docs = spark.createDataFrame(texts, ["doc_id", "text"])
    r = heaps_fit(docs, "doc_id", "text").collect()[0]

    # python replay of the cumulative curve
    seen: set[str] = set()
    n = v = 0
    xs, ys = [], []
    n_tokens = n_types = 0
    for _, t in sorted(texts):
        ws = t.split()
        n += len(ws)
        for wd in ws:
            if wd not in seen:
                seen.add(wd)
        v = len(seen)
        if n > 0 and v > 0:
            xs.append(math.log(n))
            ys.append(math.log(v))
        n_tokens, n_types = n, v
    x = np.array(xs)
    y = np.array(ys)
    beta = np.cov(x, y, bias=True)[0, 1] / x.var()
    intercept = y.mean() - beta * x.mean()
    r2 = np.corrcoef(x, y)[0, 1] ** 2
    assert (r.n_points, r.n_tokens, r.n_types) == (len(xs), n_tokens, n_types)
    assert math.isclose(r.beta, beta, abs_tol=1e-9)
    assert math.isclose(r.intercept, intercept, abs_tol=1e-9)
    assert math.isclose(r.r2, r2, abs_tol=1e-9)
    assert 0 < r.beta < 1  # sublinear vocabulary growth


def test_session_type_lift_respects_session_boundaries(spark):
    from raptor_spark.operators.relational import basket_lift, session_ids

    # user 1: session A = {x, y} at t=0..60; session B = {x, z} 2h later.
    # (y, z) never share a session -> must not appear even at min_support 1.
    rows = [
        (1, 0.0, "x"), (1, 60.0, "y"),
        (1, 7800.0, "x"), (1, 7860.0, "z"),
        (2, 0.0, "x"), (2, 30.0, "y"),
    ]
    ev = spark.createDataFrame(rows, ["user_id", "ts_sec", "event_type"])
    sess = session_ids(ev, ["user_id"], "ts_sec", gap_s=1800.0)
    import pyspark.sql.functions as SF

    facts = sess.select(
        SF.concat_ws("#", SF.col("user_id"), SF.col("_session")).alias("sk"),
        "event_type",
    )
    out = {
        (r.item_a, r.item_b): r
        for r in basket_lift(facts, "sk", "event_type", min_support=1).collect()
    }
    assert ("y", "z") not in out and ("x", "x") not in out
    xy = out[("x", "y")]
    # 3 sessions total; x in 3, y in 2, z in 1; co(x,y)=2, co(x,z)=1
    assert (xy.n_co, xy.n_a, xy.n_b, xy.n_baskets) == (2, 3, 2, 3)
    assert math.isclose(xy.lift, 2 * 3 / 6.0, rel_tol=1e-12)
    xz = out[("x", "z")]
    assert (xz.n_co, xz.n_a, xz.n_b) == (1, 3, 1)


def test_weighted_jaccard_separates_repetition(spark):
    from raptor_spark.operators.dedup import weighted_jaccard_pairs

    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta"),
            (1, "alpha beta gamma delta"),          # exact dup: both = 1
            (2, "alpha alpha alpha alpha beta gamma delta"),  # same vocab,
            # heavy repetition: set-J(0,2) = 1, weighted-J < 1
        ],
        ["doc_id", "text"],
    )
    out = {
        (r.a, r.b): r
        for r in weighted_jaccard_pairs(docs, "doc_id", "text", 0.9).collect()
    }
    dup = out[(0, 1)]
    assert math.isclose(dup.j_set, 1.0, rel_tol=1e-12)
    assert math.isclose(dup.j_weighted, 1.0, rel_tol=1e-12)
    rep = out[(0, 2)]
    assert math.isclose(rep.j_set, 1.0, rel_tol=1e-12)
    # smin = min over common: alpha 1, beta 1, gamma 1, delta 1 = 4;
    # totals 4 and 7 -> jw = 4 / (4 + 7 - 4) = 4/7
    assert math.isclose(rep.j_weighted, 4 / 7.0, rel_tol=1e-12)
    assert rep.j_weighted < dup.j_weighted


def test_centroid_similarity_planted_geometry(spark):
    from raptor_spark.operators.similarity import centroid_similarity

    rng = np.random.default_rng(3)
    rows, vid = [], 0
    # labels 0/1: same direction (cos ~ 1); label 2: orthogonal (cos ~ 0)
    base = np.array([1.0, 0, 0, 0])
    orth = np.array([0, 1.0, 0, 0])
    for label, d in ((0, base), (1, base), (2, orth)):
        for _ in range(15):
            v = 5.0 * d + rng.normal(0, 0.01, 4)
            rows.append((vid, [float(x) for x in v], label))
            vid += 1
    emb = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    out = {
        (r.label_a, r.label_b): r
        for r in centroid_similarity(emb, "vec_id", "embedding", "label").collect()
    }
    assert set(out) == {(0, 1), (0, 2), (1, 2)}
    assert all(r.n_a == 15 and r.n_b == 15 for r in out.values())
    assert out[(0, 1)].cos > 0.999
    assert abs(out[(0, 2)].cos) < 0.02 and abs(out[(1, 2)].cos) < 0.02

    # numpy parity on one pair
    m0 = np.array([r[1] for r in rows if r[2] == 0]).mean(axis=0)
    m2 = np.array([r[1] for r in rows if r[2] == 2]).mean(axis=0)
    want = float(m0 @ m2 / (np.linalg.norm(m0) * np.linalg.norm(m2)))
    assert math.isclose(out[(0, 2)].cos, want, abs_tol=1e-9)


def test_spearman_by_slice_planted(spark):
    from datetime import datetime, timedelta

    from raptor_spark.operators.profile import spearman_by_slice

    t0 = datetime(2024, 7, 1)
    rows = []
    # "up": strictly increasing -> rho = 1; "down": reversed -> rho = -1;
    # "spiked": monotone except one huge outlier -> rho stays near 1
    # (the robustness property vs an OLS slope)
    for i in range(20):
        rows.append((i, t0 + timedelta(minutes=i), "up", float(i)))
        rows.append((100 + i, t0 + timedelta(minutes=i), "down", float(-i)))
        v = 1e9 if i == 10 else float(i)
        rows.append((200 + i, t0 + timedelta(minutes=i), "spiked", v))
    ev = spark.createDataFrame(rows, ["event_id", "ts", "event_type", "value"])
    out = {
        r.slice: r
        for r in spearman_by_slice(ev, "event_type", "ts", "value", "event_id").collect()
    }
    assert math.isclose(out["up"].spearman, 1.0, rel_tol=1e-12)
    assert math.isclose(out["down"].spearman, -1.0, rel_tol=1e-12)
    # outlier moves the spiked series' rho only slightly: exact value is
    # 1 - 6*sum(d^2)/(n(n^2-1)) with ranks shifted by one position from
    # index 10 onward -> python replay
    xs = list(range(20))
    ys = [1e9 if i == 10 else float(i) for i in xs]
    ry = {i: r + 1 for r, i in enumerate(sorted(range(20), key=lambda i: (ys[i], i)))}
    d2 = sum((i + 1 - ry[i]) ** 2 for i in range(20))
    want = 1 - 6 * d2 / (20 * (400 - 1))
    assert math.isclose(out["spiked"].spearman, want, rel_tol=1e-12)
    assert out["spiked"].spearman > 0.85


def test_measure_consistency_planted(spark):
    from raptor_spark.operators.profile import measure_consistency

    parent = spark.createDataFrame(
        [
            (1, "g1", 100.0),   # child rollup 100 -> consistent
            (2, "g1", 100.0),   # child rollup 50  -> ratio 2
            (3, "g2", 10.0),    # child rollup 100 -> ratio 0.1
            (4, "g2", 103.0),   # child rollup 100 -> within 5%
        ],
        ["k", "grp", "pv"],
    )
    child = spark.createDataFrame(
        [(1, 100.0), (2, 50.0), (3, 100.0), (4, 100.0)], ["k", "cv"]
    )
    out = {
        r.grp: r
        for r in measure_consistency(
            parent, child, "k", "grp", "pv", "cv", tol=0.05
        ).collect()
    }
    g1 = out["g1"]
    assert (g1.n_keys, g1.n_consistent) == (2, 1)
    assert math.isclose(g1.median_ratio, 1.5, rel_tol=1e-12)  # (1+2)/2
    assert math.isclose(
        g1.mean_log10_ratio, (0 + math.log10(2)) / 2, rel_tol=1e-12
    )
    g2 = out["g2"]
    assert (g2.n_keys, g2.n_consistent) == (2, 1)
    assert math.isclose(g2.median_ratio, (0.1 + 1.03) / 2, rel_tol=1e-12)


def test_window_pmi_manual_counts(spark):
    from raptor_spark.operators.ranking import window_pmi

    # "x z y": (x,z) and (x,y) and (y,z) all within window 3 of one doc;
    # repeated docs push counts over min_count
    docs = spark.createDataFrame(
        [(i, "x z y") for i in range(6)], ["doc_id", "text"]
    )
    out = {
        (r.w1, r.w2): r
        for r in window_pmi(docs, "text", window=3, min_count=5).collect()
    }
    # per doc pairs: (x,z), (x,y), (y,z) canonicalized -> each n_ab = 6
    assert set(out) == {("x", "z"), ("x", "y"), ("y", "z")}
    n_words, n_pairs = 18, 18  # 3 words/doc, 3 pairs/doc, 6 docs
    for pair, r in out.items():
        assert r.n_ab == 6 and r.n_a == 6 and r.n_b == 6
        want = math.log((6 / n_pairs) / ((6 / n_words) * (6 / n_words)))
        assert math.isclose(r.pmi, want, rel_tol=1e-12), pair


def test_window_pmi_catches_split_collocation(spark):
    from raptor_spark.operators.ranking import window_pmi

    # "strong black coffee": (strong, coffee) at distance 2 is invisible
    # to adjacent bigrams but inside window 3
    docs = spark.createDataFrame(
        [(i, f"strong black coffee filler{i % 7} mild") for i in range(10)],
        ["doc_id", "text"],
    )
    out = window_pmi(docs, "text", window=3, min_count=5)
    pairs = {(r.w1, r.w2) for r in out.collect()}
    assert ("coffee", "strong") in pairs


def test_burrows_delta_planted_styles(spark):
    from raptor_spark.operators.ranking import burrows_delta

    rows = []
    rid = 0
    # styles A and A2: heavy "the/of"; style B: heavy "a/to".
    # Content words differ between A and A2 but are below top_m rank by
    # count, so delta(A, A2) << delta(A, B).
    for src, fws, content in (
        ("a1", "the of the of the of", "astronomy"),
        ("a2", "the of the of the of", "botany"),
        ("b1", "a to a to a to", "astronomy"),
    ):
        for i in range(10):
            rows.append((rid, f"{fws} {content}{i}", src))
            rid += 1
    docs = spark.createDataFrame(rows, ["doc_id", "text", "src"])
    out = {
        (r.source_a, r.source_b): r
        for r in burrows_delta(docs, "text", "src", top_m=4).collect()
    }
    assert set(out) == {("a1", "a2"), ("a1", "b1"), ("a2", "b1")}
    assert all(r.n_words == 4 for r in out.values())
    # top 4 words are the function words the/of/a/to; a1 and a2 share
    # identical function-word profiles -> delta 0
    assert math.isclose(out[("a1", "a2")].delta, 0.0, abs_tol=1e-9)
    assert out[("a1", "b1")].delta > 1.0
    assert out[("a2", "b1")].delta > 1.0


def test_morton_key_interleaves_bits(spark):
    # Interleave is checked against the pure-python bit loop on edge and
    # random-ish values (including the 16-bit extremes).
    from raptor_spark.operators.layout import morton_key

    import pyspark.sql.functions as F

    vals = [(0, 0), (1, 0), (0, 1), (65535, 0), (0, 65535), (65535, 65535),
            (0b1010101010101010, 0b0101010101010101), (12345, 54321)]
    df = spark.createDataFrame(vals, ["x", "y"])
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.withColumn("z", morton_key(F.col("x"), F.col("y"))).collect()
    }

    def py_morton(x, y):
        z = 0
        for i in range(16):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    for x, y in vals:
        assert got[(x, y)] == py_morton(x, y)


def test_zorder_beats_linear_on_box_predicate(spark):
    # Planted 64x64 grid: a box predicate over both axes must scan fewer
    # rows under the z-order layout than under the single-column layout,
    # and both layouts must agree on the matching-row count.
    from raptor_spark.operators.layout import (
        layout_buckets,
        morton_key,
        scale_to_u16,
        skipping_audit,
    )

    import pyspark.sql.functions as F

    rows = [(i, i % 64, i // 64) for i in range(4096)]
    df = spark.createDataFrame(rows, ["id", "xi", "yi"])
    ext = df.agg(
        F.min("xi").alias("xlo"), F.max("xi").alias("xhi"),
        F.min("yi").alias("ylo"), F.max("yi").alias("yhi"),
    )
    scaled = (
        df.crossJoin(F.broadcast(ext))
        .select(
            "id",
            scale_to_u16(F.col("xi"), F.col("xlo"), F.col("xhi")).alias("x16"),
            scale_to_u16(F.col("yi"), F.col("ylo"), F.col("yhi")).alias("y16"),
        )
        .withColumn("z", morton_key(F.col("x16"), F.col("y16")))
        .persist()
    )
    box = (0, 16383, 16384, 32767)  # quarter x quarter of the u16 space
    lin = layout_buckets(scaled, F.col("x16"), "id", 16)
    zo = layout_buckets(scaled, F.col("z"), "id", 16)
    a = skipping_audit(lin, "linear", "x16", "y16", *box).collect()[0]
    b = skipping_audit(zo, "zorder", "x16", "y16", *box).collect()[0]
    assert a["rows_matching"] == b["rows_matching"] > 0
    assert b["rows_scanned"] < a["rows_scanned"]
    assert b["buckets_hit"] < a["buckets_hit"]
    # zone-map scan is sound: it reads at least every matching row
    assert b["rows_scanned"] >= b["rows_matching"]
    scaled.unpersist()


def test_term_contexts_boundaries(spark):
    """Mentions at the very start/end of a document get truncated (empty)
    contexts, not padding or nulls; interior mentions get exactly
    ``window`` words each side; every mention row is emitted (one per
    occurrence, 1-based positions)."""
    from raptor_spark.operators.text import term_contexts

    rows = [
        (1, "spark a b c spark d e"),
        (2, "x y z spark"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        (r.id, r.pos): (r.left_ctx, r.right_ctx)
        for r in term_contexts(df, "doc_id", "text", ["spark"], window=3).collect()
    }
    assert out == {
        (1, 1): ("", "a b c"),
        (1, 5): ("a b c", "d e"),
        (2, 4): ("x y z", ""),
    }


def test_t_closeness_manual_tvd(spark):
    """Hand-computed fixture: N=10, global A=6/B=4.
    class en  (A3,B1): numer=|30-24|+|10-16|=12, tvd=12/80=0.15  -> ok
    class fr  (A1,B3): numer=|10-24|+|30-16|=28, tvd=28/80=0.35  -> viol
    class de  (A2)   : numer=|20-12|+|0-8|  =16, tvd=16/40=0.40  -> viol
    at t=0.3; absent value B in class de must still contribute |0-n_c*cnt_v|."""
    from raptor_spark.operators.profile import t_closeness_audit

    rows = (
        [("en", "A")] * 3 + [("en", "B")]
        + [("fr", "A")] + [("fr", "B")] * 3
        + [("de", "A")] * 2
    )
    df = spark.createDataFrame(rows, "lang string, source string")
    out = t_closeness_audit(df, ["lang"], "source", t_num=3, t_den=10).collect()[0]
    assert out.n_classes == 3
    assert out.n_violating == 2
    assert out.rows_at_risk == 6
    assert abs(out.max_tvd - 0.4) < 1e-12


def test_t_closeness_uniform_table_never_violates(spark):
    """Every class mirrors the global distribution exactly -> all numer=0,
    zero violations even at t=1/1000."""
    from raptor_spark.operators.profile import t_closeness_audit

    rows = [(lang, s) for lang in ("en", "fr", "de") for s in ("A", "B", "C")]
    df = spark.createDataFrame(rows, "lang string, source string")
    out = t_closeness_audit(df, ["lang"], "source", t_num=1, t_den=1000).collect()[0]
    assert out.n_violating == 0
    assert out.rows_at_risk == 0
    assert out.max_tvd == 0.0


def test_bpe_merge_rounds_hand_corpus(spark):
    """Corpus {the×3, cat, hat}: r1 pairs th:3 he:3 ca:1 at:2 ha:1 — tie
    th/he broken lexicographically to (h,e); r2 must merge t+<he> (the
    sentinel-expansion path); r3 falls back to (a,t). symbols_after
    tracks 12 -> 9 -> 7."""
    from raptor_spark.operators.text import bpe_merge_rounds

    df = spark.createDataFrame([("the the cat",), ("the hat",)], "text string")
    out = [tuple(r) for r in bpe_merge_rounds(df, "text", 3).collect()]
    assert out == [
        (1, "h", "e", 3, 12),
        (2, "t", "he", 3, 9),
        (3, "a", "t", 2, 7),
    ]


def test_bpe_merge_rounds_single_char_words_ignored(spark):
    """Length-1 words contribute no pairs (the descending-F.sequence guard)
    but still count in symbols_after."""
    from raptor_spark.operators.text import bpe_merge_rounds

    df = spark.createDataFrame([("a a a bb",)], "text string")
    out = [tuple(r) for r in bpe_merge_rounds(df, "text", 1).collect()]
    assert out == [(1, "b", "b", 1, 4)]


def test_fellegi_sunter_census_boundaries(spark):
    """Decision boundaries are integer-exact: score == upper is a link,
    score == lower is a nonlink (possible requires strictly between);
    pattern census groups identical patterns."""
    from raptor_spark.operators.dedup import fellegi_sunter_census

    rows = [
        (True, True),    # 10 + 5 = 15  -> link (upper=15)
        (True, True),
        (True, False),   # 10 - 5 = 5   -> possible
        (False, True),   # -10 + 5 = -5 -> nonlink
        (False, False),  # -15          -> nonlink
    ]
    df = spark.createDataFrame(rows, "f1 boolean, f2 boolean")
    out = [tuple(r) for r in fellegi_sunter_census(
        df, [("f1", 10, -10), ("f2", 5, -5)], upper=15, lower=-5
    ).collect()]
    assert out == [
        ("11", 15, "link", 2),
        ("10", 5, "possible", 1),
        ("01", -5, "nonlink", 1),
        ("00", -15, "nonlink", 1),
    ]


def test_frequent_sequences_planted(spark):
    """Users A=[x,y,z,x,y,z], B=[x,y,z]: trigram x>y>z has support 2 /
    3 occurrences; every other trigram has support 1 and must be pruned
    by the relative min-support 4·nu > 3·max_sup (max_sup=2)."""
    from raptor_spark.operators.profile import frequent_sequences

    rows = [("A", i, t) for i, t in enumerate(["x", "y", "z", "x", "y", "z"])]
    rows += [("B", i, t) for i, t in enumerate(["x", "y", "z"])]
    df = spark.createDataFrame(rows, "u string, pos long, t string")
    out = [tuple(r) for r in frequent_sequences(
        df, ["u"], ["pos"], "t", k=3, sup_num=3, sup_den=4
    ).collect()]
    assert out == [("x>y>z", 2, 3)]


def test_kmeans_silhouette_separated_clusters(spark):
    """Two orthogonal bundles -> every vector's own-centroid distance is
    tiny vs the cross-centroid distance, so mean silhouette ~ 1."""
    from raptor_spark.operators.similarity import kmeans_silhouette

    rows = [(0, [1.0, 0.01]), (1, [1.0, -0.01]), (2, [0.99, 0.0]),
            (3, [0.01, 1.0]), (4, [-0.01, 1.0]), (5, [0.0, 0.99])]
    df = spark.createDataFrame(rows, "id long, vec array<double>")
    out = kmeans_silhouette(df, 2, corpus_id="id", vec="vec",
                            iters=2, seed_order="id").collect()
    assert len(out) == 2
    assert sum(r.n_vecs for r in out) == 6
    for r in out:
        assert r.mean_sil > 0.9, out
        assert r.min_sil > 0.9, out


def test_kmeans_silhouette_degenerate_identical_vectors(spark):
    """All-identical corpus: both centroids coincide, max(a,b)=0 -> the
    in-expression guard yields silhouette 0, not DIVIDE_BY_ZERO/NaN."""
    from raptor_spark.operators.similarity import kmeans_silhouette

    df = spark.createDataFrame([(i, [1.0, 1.0]) for i in range(4)],
                               "id long, vec array<double>")
    out = kmeans_silhouette(df, 2, corpus_id="id", vec="vec",
                            iters=1, seed_order="id").collect()
    assert sum(r.n_vecs for r in out) == 4
    for r in out:
        assert r.mean_sil == 0.0 and r.min_sil == 0.0, out


def test_calibration_buckets_hand_counts(spark):
    """scores {5:+,5:-} -> bucket 0: conf .05, acc .5, gap |100-10|=90;
    score 95:+ -> bucket 9 gap |100-95|=5; score 100 clamps to bucket 9."""
    from raptor_spark.operators.profile import calibration_buckets

    rows = [(5, True), (5, False), (95, True), (100, True)]
    df = spark.createDataFrame(rows, "s long, o boolean")
    out = [tuple(r) for r in calibration_buckets(df, "s", "o", 10).collect()]
    assert out == [
        (0, 2, 1, 0.05, 0.5, 90),
        (9, 2, 2, 0.975, 1.0, 5),
    ]


def test_calibration_buckets_perfectly_calibrated(spark):
    """A bucket whose positive rate equals its mean confidence has
    gap_scaled == 0 exactly."""
    from raptor_spark.operators.profile import calibration_buckets

    rows = [(50, True), (50, False)]  # conf .5, acc .5
    df = spark.createDataFrame(rows, "s long, o boolean")
    out = [tuple(r) for r in calibration_buckets(df, "s", "o", 10).collect()]
    assert out == [(5, 2, 1, 0.5, 0.5, 0)]


def test_zipf_audit_exact_power_law(spark):
    """Frequencies 96/48/32 = 96/r: ln f = ln 96 − ln r exactly, so the
    OLS fit must return slope −1, R² 1 (at round-6)."""
    from raptor_spark.operators.text import zipf_audit

    text = " ".join(["aa"] * 96 + ["bb"] * 48 + ["cc"] * 32)
    df = spark.createDataFrame([("s1", text)], "src string, text string")
    out = [tuple(r) for r in zipf_audit(df, "text", "src", top_r=50).collect()]
    assert out == [("s1", 3, -1.0, 1.0)]


def test_zipf_audit_degenerate_variance(spark):
    """Uniform frequencies -> zero y-variance -> slope 0 (not −0), R² 0;
    a single word -> zero x-variance -> NULL slope, R² 0."""
    from raptor_spark.operators.text import zipf_audit

    df = spark.createDataFrame(
        [("u", "aa bb cc"), ("one", "zz zz zz")], "src string, text string"
    )
    out = {r.src: r for r in zipf_audit(df, "text", "src", top_r=50).collect()}
    assert out["u"].zipf_slope == 0.0 and str(out["u"].zipf_slope) == "0.0"
    assert out["u"].r2 == 0.0
    assert out["one"].zipf_slope is None and out["one"].r2 == 0.0


def test_kcenter_exemplars_planted_geometry(spark):
    """Seed = lowest id (0, pointing +x). The farthest point in cosine
    distance is its antipode (id 3, −x; dist 2), then ±y (dist 1 to both
    chosen; id tie-break picks 1 before 4)."""
    from raptor_spark.operators.similarity import kcenter_exemplars

    rows = [
        (0, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [0.7, 0.7]),
        (3, [-1.0, 0.0]), (4, [0.0, -1.0]),
    ]
    df = spark.createDataFrame(rows, "id long, vec array<double>")
    out = [tuple(r) for r in kcenter_exemplars(df, 4, "id", "vec").collect()]
    out.sort()
    assert [(r[0], r[1]) for r in out] == [(1, 0), (2, 3), (3, 1), (4, 4)]
    assert out[1][2] == 2.0  # antipode distance
    assert out[2][2] == 1.0 and out[3][2] == 1.0  # orthogonal to both


def test_wasserstein_1d_hand_masses(spark):
    """g1={0,0}, g2={10,10}, g3={0,10}; global is half-half at 0/10.
    W1(point mass, half-half over a 10-wide gap) = 5 exactly; the
    matching group g3 must be 0. All decided in the BIGINT w1_scaled."""
    from raptor_spark.operators.profile import wasserstein_1d

    rows = [("g1", 0), ("g1", 0), ("g2", 10), ("g2", 10),
            ("g3", 0), ("g3", 10)]
    df = spark.createDataFrame(rows, "g string, v long")
    out = [tuple(r) for r in wasserstein_1d(df, "g", "v").collect()]
    assert out == [
        ("g1", 2, 60, 5.0),
        ("g2", 2, 60, 5.0),
        ("g3", 2, 0, 0.0),
    ]


def test_conformal_coverage_exact_rank(spark):
    """cal = 1..9: k = ceil(10*0.9) = 9 -> threshold = 9th smallest = 9;
    test {5, 9, 9.5} covers 2/3. Duplicated calibration values must not
    shift the order statistic (tie-order invariance of the support cum)."""
    from raptor_spark.operators.profile import conformal_coverage

    cal = spark.createDataFrame([(float(i),) for i in range(1, 10)], "value double")
    test = spark.createDataFrame([(5.0,), (9.0,), (9.5,)], "value double")
    out = tuple(conformal_coverage(cal, test, "value").collect()[0])
    assert out == (9, 3, 9, 9.0, 2, 0.666667)

    cal_dup = spark.createDataFrame(
        [(float(i),) for i in range(1, 10) for _ in (0, 1)], "value double"
    )  # n=18, k = ceil(19*.9) = 18 -> still 9.0 (max)
    out2 = tuple(conformal_coverage(cal_dup, test, "value").collect()[0])
    assert out2 == (18, 3, 18, 9.0, 2, 0.666667)


def test_theil_sen_robust_to_outlier(spark):
    """y = 2x on x=0..4 with y(4) smashed to 1000: OLS slope would blow
    past 200, the pairwise-slope median stays exactly 2. Even-count
    median averages the two middle slopes."""
    from raptor_spark.operators.profile import theil_sen_slopes

    rows = [("u", 0.0, 0.0), ("u", 1.0, 2.0), ("u", 2.0, 4.0),
            ("u", 3.0, 6.0), ("u", 4.0, 1000.0)]
    df = spark.createDataFrame(rows, "k string, x double, y double")
    out = tuple(theil_sen_slopes(df, ["k"], "x", "y").collect()[0])
    assert out == ("u", 10, 2.0)

    even = spark.createDataFrame(
        [("v", 0.0, 0.0), ("v", 1.0, 1.0), ("v", 2.0, 4.0)],
        "k string, x double, y double",
    )  # slopes {1, 2, 3} -> median 2; drop one point -> even case
    out2 = tuple(theil_sen_slopes(even, ["k"], "x", "y").collect()[0])
    assert out2 == ("v", 3, 2.0)


def test_theil_sen_equal_x_pairs_excluded(spark):
    """Duplicate x never reaches the division: two points at x=1 plus one
    at x=2 -> only the two cross-pairs count."""
    from raptor_spark.operators.profile import theil_sen_slopes

    df = spark.createDataFrame(
        [("w", 1.0, 0.0), ("w", 1.0, 10.0), ("w", 2.0, 5.0)],
        "k string, x double, y double",
    )
    out = tuple(theil_sen_slopes(df, ["k"], "x", "y").collect()[0])
    assert out == ("w", 2, 0.0)  # slopes {5, -5} -> median 0


def test_cdc_chunks_insertion_robust(spark):
    """The CDC property: prepending text to a doc must leave the chunk
    hashes BEYOND the first content boundary intact (fixed-width spans
    would shift every window). Also: a doc with no boundary is exactly
    one whole-doc chunk."""
    from raptor_spark.operators.dedup import content_defined_chunks

    base_text = " ".join(f"w{(i * 7) % 97}x{i}" for i in range(200))
    df = spark.createDataFrame(
        [(1, base_text), (2, "PREFIX INSERTED " + base_text)],
        "doc_id long, text string",
    )
    ch = content_defined_chunks(df, "doc_id", "text").collect()
    h1 = {r.chunk_md5 for r in ch if r.doc == 1}
    h2 = {r.chunk_md5 for r in ch if r.doc == 2}
    shared = h1 & h2
    # everything after the first boundary of doc 1 must survive
    assert len(shared) >= len(h1) - 1, (len(h1), len(h2), len(shared))
    assert len(h1) > 1  # the fixture text actually produces boundaries

    tiny = spark.createDataFrame([(3, "abc")], "doc_id long, text string")
    t = content_defined_chunks(tiny, "doc_id", "text").collect()
    assert len(t) == 1 and t[0].chunk_start == 1 and t[0].chunk_len == 3


def test_cdc_chunks_cover_exactly(spark):
    """Chunks of a doc tile it exactly: starts/lengths are contiguous
    from 1 to len+1 with no gaps or overlaps."""
    from raptor_spark.operators.dedup import content_defined_chunks

    text = "pack my box with five dozen liquor jugs " * 10
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    ch = sorted(
        content_defined_chunks(df, "doc_id", "text").collect(),
        key=lambda r: r.chunk_start,
    )
    pos = 1
    for r in ch:
        assert r.chunk_start == pos
        pos += r.chunk_len
    assert pos == len(text) + 1


def test_runs_test_extremes(spark):
    """Perfectly alternating sequence -> maximum runs (n), positive z;
    perfectly sorted halves -> 2 runs, strongly negative z; a one-sided
    group (all equal -> all ties dropped... use strictly above) -> NULL z."""
    from raptor_spark.operators.profile import runs_test

    alt = [("alt", i, 10 if i % 2 == 0 else 20) for i in range(12)]
    srt = [("srt", i, 10 if i < 6 else 20) for i in range(12)]
    one = [("one", i, 5) for i in range(4)]  # every value ties the median
    df = spark.createDataFrame(alt + srt + one, "g string, o long, v long")
    out = {r.g: r for r in runs_test(df, "g", "o", "v").collect()}
    assert out["alt"].n_runs == 12 and out["alt"].z > 3
    assert out["srt"].n_runs == 2 and out["srt"].z < -3
    assert out["alt"].n_above == 6 and out["alt"].n_below == 6
    assert "one" not in out or out["one"].z is None


def test_mann_kendall_monotone_and_python_replay(spark):
    from raptor_spark.operators.profile import mann_kendall

    # strictly increasing: S = n(n-1)/2, z > 0; strictly decreasing mirrors;
    # constant: var_num = 0 -> z NULL
    rows = (
        [("up", i, 10 + i) for i in range(8)]
        + [("down", i, 50 - 3 * i) for i in range(8)]
        + [("flat", i, 7) for i in range(8)]
        + [("mix", i, v) for i, v in enumerate([3, 1, 4, 1, 5, 9, 2, 6])]
    )
    df = spark.createDataFrame(rows, "g string, o long, y long")
    out = {r.g: r for r in mann_kendall(df, ["g"], "o", "y").collect()}
    assert out["up"].s_stat == 28 and out["up"].z > 0
    assert out["down"].s_stat == -28 and out["down"].z < 0
    assert out["flat"].var_num == 0 and out["flat"].z is None

    # python replay incl. tie-corrected variance and continuity correction
    def mk(ys):
        n = len(ys)
        s = sum(
            (ys[j] > ys[i]) - (ys[j] < ys[i])
            for i in range(n) for j in range(i + 1, n)
        )
        from collections import Counter
        tie = sum(t * (t - 1) * (2 * t + 5) for t in Counter(ys).values())
        vn = n * (n - 1) * (2 * n + 5) - tie
        if vn <= 0:
            return s, vn, None
        import math
        z = 0.0 if s == 0 else (s - (1 if s > 0 else -1)) / math.sqrt(vn / 18.0)
        return s, vn, round(z, 6) + 0.0
    for g, ys in [("up", [10 + i for i in range(8)]),
                  ("mix", [3, 1, 4, 1, 5, 9, 2, 6])]:
        s, vn, z = mk(ys)
        assert (out[g].s_stat, out[g].var_num) == (s, vn)
        assert out[g].z == pytest.approx(z, abs=1e-9)


def test_mann_kendall_single_point_group(spark):
    from raptor_spark.operators.profile import mann_kendall

    df = spark.createDataFrame([("solo", 1, 5)], "g string, o long, y long")
    r = mann_kendall(df, ["g"], "o", "y").collect()[0]
    assert (r.n, r.s_stat, r.var_num, r.z) == (1, 0, 0, None)


def test_cross_correlation_shifted_series_peak(spark):
    from raptor_spark.operators.profile import cross_correlation

    # y is x shifted forward by 2 buckets: the r=1 peak must land at lag +2
    # (x_t == y_{t+2}), other aligned lags correlate weakly or not at all
    xs = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8]
    x = spark.createDataFrame(
        [(i, v) for i, v in enumerate(xs)], "o long, v long"
    )
    y = spark.createDataFrame(
        [(i + 2, v) for i, v in enumerate(xs)], "o long, v long"
    )
    out = {r.lag: r for r in cross_correlation(x, y, max_lag=3).collect()}
    assert out[2].r == 1.0
    assert out[2].n == len(xs)
    assert all(
        out[l].r is None or out[l].r < 1.0 for l in out if l != 2
    )


def test_cross_correlation_matches_python_pearson(spark):
    from raptor_spark.operators.profile import cross_correlation
    import math
    import random

    rng = random.Random(3)
    xs = [rng.randrange(100) for _ in range(30)]
    ys = [rng.randrange(100) for _ in range(30)]
    x = spark.createDataFrame(list(enumerate(xs)), "o long, v long")
    y = spark.createDataFrame(list(enumerate(ys)), "o long, v long")
    out = {r.lag: r.r for r in cross_correlation(x, y, max_lag=2).collect()}
    for lag in range(-2, 3):
        pairs = [
            (xs[t], ys[t + lag])
            for t in range(30)
            if 0 <= t + lag < 30
        ]
        n = len(pairs)
        sx = sum(p[0] for p in pairs); sy = sum(p[1] for p in pairs)
        sxy = sum(a * b for a, b in pairs)
        sxx = sum(a * a for a, _ in pairs); syy = sum(b * b for _, b in pairs)
        r = (n * sxy - sx * sy) / math.sqrt(
            float(n * sxx - sx * sx) * float(n * syy - sy * sy)
        )
        assert out[lag] == pytest.approx(round(r, 6), abs=1e-9)


def test_cross_correlation_zero_variance_null(spark):
    from raptor_spark.operators.profile import cross_correlation

    x = spark.createDataFrame([(i, 5) for i in range(6)], "o long, v long")
    y = spark.createDataFrame([(i, i) for i in range(6)], "o long, v long")
    out = cross_correlation(x, y, max_lag=0).collect()
    assert len(out) == 1 and out[0].r is None


def test_kendall_tau_matches_scipy_free_python_reference(spark):
    from raptor_spark.operators.profile import kendall_tau
    import math
    import random

    rng = random.Random(23)
    rows = [("g", rng.randrange(8), rng.randrange(8)) for _ in range(60)]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    r = kendall_tau(df, ["g"], "x", "y").collect()[0]
    xs = [x for _, x, _ in rows]; ys = [y for _, _, y in rows]
    C = D = TX = TY = TXY = 0
    n = len(rows)
    for i in range(n):
        for j in range(i + 1, n):
            dx = (xs[j] > xs[i]) - (xs[j] < xs[i])
            dy = (ys[j] > ys[i]) - (ys[j] < ys[i])
            if dx and dy:
                if dx == dy: C += 1
                else: D += 1
            elif dx and not dy: TY += 1
            elif dy and not dx: TX += 1
            else: TXY += 1
    assert (r.concordant, r.discordant, r.tx, r.ty, r.txy) == (C, D, TX, TY, TXY)
    assert r.n == n
    tau = (C - D) / math.sqrt(float(C + D + TX) * float(C + D + TY))
    assert r.tau_b == pytest.approx(round(tau, 6) + 0.0, abs=1e-9)


def test_kendall_tau_perfect_and_constant(spark):
    from raptor_spark.operators.profile import kendall_tau

    inc = [("inc", i, i * 2) for i in range(10)]
    dec = [("dec", i, 100 - i) for i in range(10)]
    const = [("const", i, 7) for i in range(10)]
    df = spark.createDataFrame(inc + dec + const, "g string, x long, y long")
    out = {r.g: r for r in kendall_tau(df, ["g"], "x", "y").collect()}
    assert out["inc"].tau_b == 1.0
    assert out["dec"].tau_b == -1.0
    assert out["const"].tau_b is None  # y constant: no rank signal
    assert out["const"].ty == 45 and out["const"].concordant == 0


def test_trimmed_stats_hand_fixture(spark):
    from raptor_spark.operators.profile import trimmed_stats

    # 10 values incl. smashed outliers; 10% trim -> k=1 each side
    vals = [1000, 5, 7, 9, 11, 13, 15, 17, 19, -50]
    df = spark.createDataFrame([("g", v) for v in vals], "g string, v long")
    r = trimmed_stats(df, ["g"], "v", trim_pct=10).collect()[0]
    inner = sorted(vals)[1:-1]
    assert r.n == 10 and r.n_trimmed_each == 1
    assert r.lo_cut == inner[0] and r.hi_cut == inner[-1]
    assert r.trimmed_mean == pytest.approx(sum(inner) / 8, abs=1e-6)
    wins = sorted(vals)
    wins[0], wins[-1] = inner[0], inner[-1]
    assert r.winsorized_mean == pytest.approx(sum(wins) / 10, abs=1e-6)
    # outliers bent neither mean
    assert r.trimmed_mean < 20 and r.winsorized_mean < 20


def test_trimmed_stats_ties_at_cut_are_sum_invariant(spark):
    from raptor_spark.operators.profile import trimmed_stats

    # cut lands inside a tie run: whichever copies are cut, sums agree
    vals = [3, 3, 3, 3, 3, 9, 9, 9, 9, 9]
    df = spark.createDataFrame(
        [("g", v) for v in vals], "g string, v long"
    ).repartition(7)
    r = trimmed_stats(df, ["g"], "v", trim_pct=20).collect()[0]
    assert r.n_trimmed_each == 2
    assert r.trimmed_mean == pytest.approx((3 * 3 + 9 * 3) / 6, abs=1e-9)
    assert r.winsorized_mean == pytest.approx(6.0, abs=1e-9)


def test_quantile_normalize_identical_distributions_are_fixpoint(spark):
    from raptor_spark.operators.profile import quantile_normalize

    # two groups with the SAME values: pooled distribution has each value
    # twice; each group's i-th value maps back to (approximately) itself
    rows = [("a", i, v) for i, v in enumerate([10, 20, 30, 40])]
    rows += [("b", 10 + i, v) for i, v in enumerate([10, 20, 30, 40])]
    df = spark.createDataFrame(rows, "g string, id long, v long")
    out = quantile_normalize(df, ["g"], "id", "v").collect()
    assert all(r.norm_v == r.v for r in out)


def test_quantile_normalize_matches_python_midpoint_rule(spark):
    from raptor_spark.operators.profile import quantile_normalize
    import random

    rng = random.Random(31)
    rows = []
    rid = 0
    for g, n in (("a", 17), ("b", 29), ("c", 8)):
        for _ in range(n):
            rows.append((g, rid, rng.randrange(1000)))
            rid += 1
    df = spark.createDataFrame(rows, "g string, id long, v long")
    out = {(r.g, r.id): r.norm_v for r in quantile_normalize(df, ["g"], "id", "v").collect()}
    pooled = sorted((v, i) for _, i, v in rows)
    N = len(rows)
    by_g = {}
    for g, i, v in rows:
        by_g.setdefault(g, []).append((v, i))
    expect = {}
    for g, vals in by_g.items():
        vals.sort()
        n_g = len(vals)
        for idx, (v, i) in enumerate(vals, start=1):
            tr = -(-((2 * idx - 1) * N) // (2 * n_g))
            expect[(g, i)] = pooled[tr - 1][0]
    assert out == expect


def test_weekday_seasonality_planted_heavy_day(spark):
    from raptor_spark.operators.profile import weekday_seasonality
    import datetime as dt

    # 1970-01-01 is Thursday -> dow (epoch_day+4)%7: Thu=4... check via
    # planted data: 4 weeks where Sunday carries 10x the value
    rows = []
    start = dt.datetime(2024, 1, 7)  # a Sunday
    for w in range(4):
        for d in range(7):
            ts = start + dt.timedelta(days=7 * w + d)
            v = 100.0 if d == 0 else 10.0
            rows.append((ts, v))
    df = spark.createDataFrame(rows, "ts timestamp, value double")
    out = {r.dow: r for r in weekday_seasonality(df, "ts", "value").collect()}
    assert len(out) == 7 and all(r.n_days == 4 for r in out.values())
    # Sunday's index: per-day mean 100 vs overall mean (100+60)/7 per day
    assert out[0].cents == 4 * 10000
    expected_idx = 100.0 / ((100 + 6 * 10) / 7)
    assert out[0].seasonal_index == pytest.approx(expected_idx, abs=1e-6)
    # the other six days share the same lower index
    others = {round(r.seasonal_index, 6) for d, r in out.items() if d != 0}
    assert len(others) == 1
