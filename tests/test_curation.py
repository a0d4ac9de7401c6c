"""Curation-operator gates: deterministic sampling slices are disjoint and
exhaustive, PII redaction actually fires on crafted PII (cross-engine regex
dialect check vs DuckDB), int8 quantization meets its error bound."""

from __future__ import annotations

import duckdb
import pyspark.sql.functions as F
import pytest

from raptor_spark.operators.curation import (
    EMAIL_RE,
    HEXKEY_RE,
    IPV4_RE,
    dequantize_col,
    deterministic_sample,
    md5_bucket_col,
    pii_counts_col,
    quantize_embedding_cols,
    redact_pii_col,
)
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def docs(spark):
    # unpersist on teardown: the cache manager substitutes ANY later scan of
    # the same parquet path with InMemoryTableScan, breaking the pushdown
    # plan assertions in test_plans.py
    df = spark.read.parquet(f"{SF_DIR}/documents.parquet").persist()
    yield df
    df.unpersist()


def test_sample_slices_disjoint_and_exhaustive(spark, docs):
    k = 5
    total = docs.count()
    ids = []
    for r in range(k):
        part = deterministic_sample(docs, "text", k, residue=r)
        ids.append({x.doc_id for x in part.select("doc_id").collect()})
    assert sum(len(s) for s in ids) == total  # exhaustive
    for i in range(k):
        for j in range(i + 1, k):
            assert not (ids[i] & ids[j])  # disjoint
    # deterministic: same slice on recompute
    again = {
        x.doc_id for x in deterministic_sample(docs, "text", k, 0).select("doc_id").collect()
    }
    assert again == ids[0] and len(again) > 0


def test_redaction_fires_and_matches_duckdb(spark):
    """Crafted PII strings: the Spark (Java regex) and DuckDB (RE2)
    redactions must agree byte-for-byte — the dialect risk the fixture's
    digit-free text can't exercise."""
    rows = [
        (0, "reach me at alice.smith+x@sub.example.co.uk today"),
        (1, "server 192.168.001.1 and 10.0.0.7 rebooted"),
        (2, "leaked deadbeefdeadbeefdeadbeefdeadbeef01 token"),
        (3, "mixed bob@x.io on 8.8.8.8 key 0123456789abcdef0123456789abcdef"),
        (4, "nothing sensitive here"),
    ]
    df = spark.createDataFrame(rows, ["id", "t"])
    got = {
        (r.id, r.n, r.red)
        for r in df.select(
            "id",
            pii_counts_col(F.col("t")).alias("n"),
            redact_pii_col(F.col("t")).alias("red"),
        ).collect()
    }
    con = duckdb.connect()
    want = set()
    for i, t in rows:
        n = con.execute(
            "SELECT len(regexp_extract_all($1, $2)) + len(regexp_extract_all($1, $3))"
            " + len(regexp_extract_all($1, $4))",
            [t, EMAIL_RE, IPV4_RE, HEXKEY_RE],
        ).fetchone()[0]
        red = con.execute(
            "SELECT regexp_replace(regexp_replace(regexp_replace($1, $2, '<EMAIL>', 'g'),"
            " $3, '<IP>', 'g'), $4, '<KEY>', 'g')",
            [t, EMAIL_RE, IPV4_RE, HEXKEY_RE],
        ).fetchone()[0]
        want.add((i, n, red))
    assert got == want
    assert sum(n for _, n, _ in got) >= 6  # non-vacuous


def test_quantization_error_bound_and_roundtrip(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    scale, q = quantize_embedding_cols(F.col("embedding"))
    staged = emb.select("vec_id", F.col("embedding").alias("v"),
                        scale.alias("s"), q.alias("q"))
    checked = staged.select(
        "vec_id",
        F.array_max(
            F.zip_with(F.col("v"), dequantize_col(F.col("q"), F.col("s")),
                       lambda a, b: F.abs(a - b))
        ).alias("err"),
        (F.col("s") / 254.0 + 1e-9).alias("bound"),
        F.array_max(F.transform("q", lambda x: F.abs(x))).alias("qmax"),
    )
    assert checked.filter(F.col("err") > F.col("bound")).count() == 0
    assert checked.filter(F.col("qmax") > 127).count() == 0
    # scale row is representable: at least one |code| == 127 when scale > 0
    assert checked.filter((F.col("qmax") < 127) & (F.col("err") > 0)).count() == 0


def test_ngram_contamination_flags_known_overlap(spark):
    from raptor_spark.operators.curation import ngram_contamination

    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "entirely different words about spark shuffles"),
            (3, "quick brown fox appears here too"),
        ],
        ["doc_id", "text"],
    )
    ev = spark.createDataFrame(
        [(100, "watch the quick brown fox run")], ["doc_id", "text"]
    )
    got = {
        (r.id, r.n_shared)
        for r in ngram_contamination(train, ev, "doc_id", "text", n=3).collect()
    }
    # docs 1 and 3 share 'the quick brown'/'quick brown fox'; doc 2 is clean
    assert got == {(1, 2), (3, 1)}


def test_md5_bucket_matches_duckdb(spark, docs):
    got = {
        (r.doc_id, r.b)
        for r in docs.filter(F.col("doc_id") < 50)
        .select("doc_id", md5_bucket_col(F.col("text")).alias("b"))
        .collect()
    }
    con = duckdb.connect()
    con.execute(f"CREATE VIEW d AS SELECT * FROM '{SF_DIR}/documents.parquet'")
    want = set(
        con.execute(
            "SELECT doc_id, CAST(('0x' || substr(md5(text), 1, 4))::INTEGER AS BIGINT)"
            " FROM d WHERE doc_id < 50"
        ).fetchall()
    )
    assert got == want and len(got) == 50


def test_shard_corpus_matches_python_recomputation(spark):
    """Every doc lands in exactly one shard; payload sha256 / n_chars equal
    a pure-Python recomputation of the contract (md5-bucket routing,
    id-ordered concat) — the byte-exact shard-writer spec."""
    import hashlib

    from raptor_spark.operators.curation import shard_corpus

    rows = [(i, f"doc {i} body " * (1 + i % 3)) for i in range(37)]
    df = spark.createDataFrame(rows, "id long, text string")
    out = {
        r["shard"]: r
        for r in shard_corpus(df, "id", "text", n_shards=4).collect()
    }

    shards: dict[int, list[tuple[int, str]]] = {}
    for i, text in rows:
        b = int(hashlib.md5(text.encode()).hexdigest()[:4], 16) % 4
        shards.setdefault(b, []).append((i, text))
    assert sum(r["n_docs"] for r in out.values()) == len(rows)
    for b, members in shards.items():
        members.sort()
        payload = "\n".join(t for _, t in members)
        assert out[b]["n_docs"] == len(members)
        assert out[b]["n_chars"] == len(payload)
        assert out[b]["payload_sha256"] == hashlib.sha256(payload.encode()).hexdigest()


def test_temperature_mix_flattens_and_normalizes(spark):
    """α < 1 upsamples the tail (p_temp > p_raw for the smallest group),
    Σp_temp = 1, Σexpected = budget, and α = 1 is exactly proportional."""
    from raptor_spark.operators.curation import temperature_mix

    rows = [("big", i) for i in range(90)] + [("small", i) for i in range(10)]
    df = spark.createDataFrame(rows, "k string, i long")

    out = {r["key"]: r for r in temperature_mix(df, "k", alpha=0.3, budget=1000).collect()}
    assert out["small"]["p_temp"] > out["small"]["p_raw"]
    assert out["big"]["p_temp"] < out["big"]["p_raw"]
    assert abs(sum(r["p_temp"] for r in out.values()) - 1.0) < 1e-12
    assert abs(sum(r["expected_docs"] for r in out.values()) - 1000.0) < 1e-9

    prop = {r["key"]: r for r in temperature_mix(df, "k", alpha=1.0, budget=1000).collect()}
    assert abs(prop["small"]["p_temp"] - 0.1) < 1e-12
    assert abs(prop["big"]["expected_docs"] - 900.0) < 1e-9


def test_cap_per_key_keeps_best_k(spark):
    """kept=True is exactly the top-k rows per key under the priority
    ordering (longest first, ties by id)."""
    from raptor_spark.operators.curation import cap_per_key

    rows = [
        ("s1", 1, 100), ("s1", 2, 300), ("s1", 3, 300), ("s1", 4, 50),
        ("s2", 5, 10),
    ]
    df = spark.createDataFrame(rows, "source string, id long, n int")
    out = cap_per_key(df, "source", [F.desc("n"), F.asc("id")], k=2)
    kept = {r["id"] for r in out.filter("kept").collect()}
    assert kept == {2, 3, 5}


def test_weighted_sample_matches_python_recomputation(spark):
    """The E-S top-k is bit-reproducible: ids, weights, and keys equal a
    pure-Python recomputation from the same content hashes."""
    import hashlib

    from raptor_spark.operators.curation import weighted_sample_topk

    rows = [(i, f"text number {i}", float(10 + (i * 7) % 50)) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, text string, w double")
    got = [
        (r["id"], r["w"], r["es_key"])
        for r in weighted_sample_topk(df, "id", "text", F.col("w"), k=15).collect()
    ]

    def key(text: str, w: float) -> float:
        u = (int(hashlib.md5(text.encode()).hexdigest()[:4], 16) % 65536 + 1.0) / 65536.0
        return u ** (1.0 / w)

    want = sorted(
        ((i, w, key(t, w)) for i, t, w in rows),
        key=lambda x: (-x[2], x[0]),
    )[:15]
    assert [(i, w) for i, w, _ in got] == [(i, w) for i, w, _ in want]
    for (_, _, a), (_, _, b) in zip(got, want):
        assert abs(a - b) < 1e-12


def test_bloom_contamination_superset_of_exact(spark):
    """Bloom membership has NO false negatives: every (id, shingle) the
    exact join flags is flagged by the filter too, so per-doc n_flagged >=
    n_shared; and the false-positive overshoot is tiny at the default
    (m=2^20, k=3) sizing."""
    from raptor_spark.operators.curation import (
        bloom_build,
        bloom_contamination,
        ngram_contamination,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    ev = docs.filter(F.col("doc_id") % 50 == 0)
    tr = docs.filter(F.col("doc_id") % 50 != 0)

    exact = {
        r["id"]: r["n_shared"]
        for r in ngram_contamination(tr, ev, "doc_id", "text", n=3).collect()
    }
    bloom = bloom_build(ev, "text", n=3)
    got = {
        r["id"]: r["n_flagged"]
        for r in bloom_contamination(bloom=bloom, train=tr, id_col="doc_id",
                                     text_col="text", n=3).collect()
    }

    assert set(exact) <= set(got)
    for i, n in exact.items():
        assert got[i] >= n, (i, got[i], n)
    overshoot = sum(got.values()) - sum(exact.values())
    assert overshoot <= max(2, len(exact) // 20), overshoot


def test_bloom_bitmap_is_mergeable_and_bounded(spark):
    """Building over two disjoint halves and bit_or-merging the bitmaps
    equals building over the union (the shard-merge path); words stay in
    the non-negative 63-bit domain so the oracle's 1<<bit never overflows."""
    from raptor_spark.operators.curation import bloom_build

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").filter(
        F.col("doc_id") % 50 == 0
    )
    a = bloom_build(docs.filter(F.col("doc_id") % 100 == 0), "text")
    b = bloom_build(docs.filter(F.col("doc_id") % 100 != 0), "text")
    merged = (
        a.unionByName(b)
        .groupBy("word_idx")
        .agg(F.bit_or("word").alias("word"))
    )
    full = bloom_build(docs, "text")
    m = {r["word_idx"]: r["word"] for r in merged.collect()}
    f = {r["word_idx"]: r["word"] for r in full.collect()}
    assert m == f
    assert all(w >= 0 for w in f.values())


def test_shingle_novelty_conserves_first_contributions(spark):
    """Sum of n_novel over docs == number of distinct shingles in the
    corpus (each shingle is 'novel' exactly once), and the lowest-id doc
    is fully novel."""
    from raptor_spark.operators.dedup import word_shingles_col
    from raptor_spark.operators.curation import shingle_novelty

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(200)
    out = shingle_novelty(docs, "doc_id", "text", n=3).collect()
    total_novel = sum(r["n_novel"] for r in out)
    n_distinct = (
        docs.select(F.explode(word_shingles_col(F.col("text"), 3)).alias("s"))
        .select("s").distinct().count()
    )
    assert total_novel == n_distinct
    first = min(out, key=lambda r: r["id"])
    assert first["n_novel"] == first["n_shingles"] and first["novelty"] == 1.0


def test_quantile_gate_keeps_top_three_quartiles(spark):
    """Survivors are exactly the rows >= their group's interpolated p25,
    and every survivor carries a threshold it satisfies."""
    from raptor_spark.operators.curation import quantile_gate

    rows = [("a", i) for i in [10, 20, 30, 40, 50]] + [("b", i) for i in [1, 2, 3, 4]]
    df = spark.createDataFrame(rows, "k string, v long")
    out = quantile_gate(df, "k", "v", q=0.25).collect()
    # p25(a) = 20 (exact order stat), p25(b) = 1.75 (interpolated)
    kept = sorted((r["k"], r["v"]) for r in out)
    assert kept == [("a", 20), ("a", 30), ("a", 40), ("a", 50),
                    ("b", 2), ("b", 3), ("b", 4)]
    assert all(r["v"] >= r["q_thr"] for r in out)


def test_leakage_safe_split_never_straddles_clusters(spark):
    """Every member of a near-dup cluster gets the SAME split (the leakage
    guard), singletons get their own deterministic assignment, all three
    splits are populated on the fixture, and the assignment equals
    split_assignment_col over the cluster id."""
    from raptor_spark.operators.curation import leakage_safe_split
    from raptor_spark.operators.dedup import near_dup_clusters, ngram_jaccard_pairs

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").filter(
        F.col("doc_id") < 150
    )
    pairs = ngram_jaccard_pairs(docs, "doc_id", "text", n=1, threshold=0.8)
    clusters = near_dup_clusters(pairs).persist()
    base = docs.select(F.col("doc_id").alias("id"))
    out = leakage_safe_split(base, clusters).collect()
    clusters.unpersist()

    by_cluster: dict[int, set[str]] = {}
    for r in out:
        by_cluster.setdefault(r["cluster"], set()).add(r["split"])
    multi = [c for c, members in by_cluster.items()
             if len([r for r in out if r["cluster"] == c]) > 1]
    assert multi, "no multi-member clusters on the fixture; guard is vacuous"
    for c in multi:
        assert len(by_cluster[c]) == 1, f"cluster {c} straddles splits"
    assert {r["split"] for r in out} == {"train", "val", "test"}


def test_sliding_chunks_cover_and_overlap(spark):
    """Every word of the doc appears in at least one chunk in order, chunk 0
    is exactly the first ``size`` words, consecutive chunks overlap by
    size - stride words, and a short doc yields one whole-doc chunk."""
    from raptor_spark.operators.text import sliding_chunks

    long_words = [f"w{i}" for i in range(50)]
    df = spark.createDataFrame(
        [(1, " ".join(long_words)), (2, "just five little words here")],
        "id long, text string",
    )
    out = sliding_chunks(df, "id", "text", size=16, stride=8)
    rows = {(r["id"], r["chunk_idx"]): r for r in out.collect()}
    # doc 1: 50 words -> ceil((50-16)/8)+1 = 6 chunks
    d1 = sorted(k[1] for k in rows if k[0] == 1)
    assert d1 == [0, 1, 2, 3, 4, 5]
    assert rows[(1, 0)]["chunk_text"].split() == long_words[:16]
    for c in d1:
        got = rows[(1, c)]["chunk_text"].split()
        assert got == long_words[c * 8 : c * 8 + 16]
    # reconstruction: union of chunk words covers the doc exactly in order
    covered = sorted({w for c in d1 for w in rows[(1, c)]["chunk_text"].split()},
                     key=lambda w: int(w[1:]))
    assert covered == long_words
    # doc 2: single whole-doc chunk
    assert rows[(2, 0)]["chunk_text"] == "just five little words here"
    assert rows[(2, 0)]["n_tokens"] == 5
    assert len([k for k in rows if k[0] == 2]) == 1


def test_lm_perplexity_matches_python_recomputation(spark):
    """ppl on a tiny hand corpus equals a pure-Python recomputation of the
    add-alpha bigram model, and a repeated/templated doc scores LOWER
    perplexity than a one-off-word doc (the CCNet filter direction)."""
    import math
    from collections import Counter

    from raptor_spark.operators.curation import lm_perplexity

    texts = {
        1: "the cat sat on the mat",
        2: "the cat sat on the mat",
        3: "zebra quark vortex nimbus ember",
        4: "the dog sat on the rug",
    }
    df = spark.createDataFrame(list(texts.items()), "id long, text string")
    out = {r["id"]: r for r in lm_perplexity(df, "id", "text").collect()}

    # pure-Python model
    alpha = 0.5
    doc_words = {i: t.split() for i, t in texts.items()}
    bgc: Counter = Counter()
    for ws in doc_words.values():
        bgc.update(zip(ws, ws[1:]))
    ctx: Counter = Counter()
    for (w1, _), n in bgc.items():
        ctx[w1] += n
    vocab = len({w for ws in doc_words.values() for w in ws})
    for i, ws in doc_words.items():
        bgs = list(zip(ws, ws[1:]))
        nll = -sum(
            math.log((bgc[b] + alpha) / (ctx[b[0]] + alpha * vocab)) for b in bgs
        ) / len(bgs)
        assert out[i]["n_bigrams"] == len(bgs)
        assert out[i]["ppl"] == pytest.approx(round(math.exp(nll), 4), abs=1e-4)
    assert out[1]["ppl"] < out[3]["ppl"]  # templated beats noise


def test_psi_drift_zero_on_reference_and_orders_shift(spark):
    """The reference slice scores exactly 0 on its own grid; an identically
    distributed slice scores near 0; a location-shifted slice scores
    strictly higher."""
    from raptor_spark.operators.profile import psi_drift

    rows = (
        [("ref", float(i % 100)) for i in range(1000)]
        + [("same", float((i * 7) % 100)) for i in range(1000)]
        + [("shift", 100.0 + float(i % 100)) for i in range(1000)]
    )
    df = spark.createDataFrame(rows, "k string, v double")
    got = {r["k"]: r["psi"] for r in psi_drift(df, "k", "v", "ref").collect()}
    assert got["ref"] == 0.0
    assert got["same"] < 0.05
    assert got["shift"] > 1.0
    assert got["shift"] > got["same"]


@pytest.mark.parametrize("seed,size,stride", [(1, 16, 8), (2, 7, 3), (3, 5, 5)])
def test_sliding_chunks_randomized_parity(spark, seed, size, stride):
    """For ANY doc length (including n < size, n == size, n % stride edges)
    the Spark chunker must equal a pure-Python reference chunker."""
    import random

    from raptor_spark.operators.text import sliding_chunks

    rng = random.Random(seed)
    docs = []
    for i in range(60):
        n = rng.choice([0, 1, size - 1, size, size + 1, rng.randint(2, 80)])
        docs.append((i, " ".join(f"t{i}x{j}" for j in range(n))))
    df = spark.createDataFrame(docs, "id long, text string")
    got = sorted(
        (r["id"], r["chunk_idx"], r["n_tokens"], r["chunk_text"])
        for r in sliding_chunks(df, "id", "text", size=size, stride=stride).collect()
    )

    want = []
    for i, text in docs:
        ws = text.split()
        n = len(ws)
        n_chunks = 1 if n <= size else -((n - size) // -stride) + 1
        for c in range(n_chunks):
            cw = ws[c * stride : c * stride + size]
            want.append((i, c, len(cw), " ".join(cw)))
    assert got == sorted(want)


def test_weighted_sample_per_group_caps_and_matches_global_on_one_group(spark):
    """Each group yields at most k rows; on a single-group input the
    selection equals the global sampler's top-k (same keys)."""
    from raptor_spark.operators.curation import (
        weighted_sample_per_group,
        weighted_sample_topk,
    )
    import pyspark.sql.functions as F

    docs = spark.createDataFrame(
        [(i, "g" + str(i % 4), f"text body {i} " * (i + 1)) for i in range(40)],
        "doc_id long, grp string, text string",
    ).withColumn("w", (F.length("text")).cast("double"))

    per = weighted_sample_per_group(docs, "doc_id", "text", ["grp"], F.col("w"), k=3)
    rows = per.collect()
    from collections import Counter

    by_grp = Counter(r.grp for r in rows)
    assert set(by_grp.values()) == {3}
    assert all(1 <= r.rk <= 3 for r in rows)

    one = docs.filter(F.col("grp") == "g0")
    got_per = {
        r.id for r in weighted_sample_per_group(
            one, "doc_id", "text", ["grp"], F.col("w"), k=3
        ).collect()
    }
    got_glob = {
        r.id for r in weighted_sample_topk(one, "doc_id", "text", F.col("w"), k=3).collect()
    }
    assert got_per == got_glob


def test_join_fanout_audit_estimate_is_exact(spark):
    from raptor_spark.operators.profile import join_fanout_audit

    left = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c"), (3, "d")], "k long, x string"
    )
    right = spark.createDataFrame(
        [(1, "p"), (2, "q"), (2, "r"), (2, "s"), (9, "t")], "k long, y string"
    )
    r = join_fanout_audit(left, right, "k", "k").collect()[0]
    assert (r.n_left, r.n_right, r.n_left_keys, r.n_right_keys) == (4, 5, 3, 3)
    assert (r.max_left_dup, r.max_right_dup) == (2, 3)
    actual = left.join(right, "k").count()
    assert r.est_join_rows == actual == 5  # key1: 2*1, key2: 1*3

    # disjoint keys -> zero estimate, not null
    r2 = join_fanout_audit(
        left, spark.createDataFrame([(7, "z")], "k long, y string"), "k", "k"
    ).collect()[0]
    assert r2.est_join_rows == 0


def test_compression_quality_matches_python_zlib(spark):
    """The Spark ratios equal in-process zlib exactly (same level), the
    repetitive/garbled/empty classes land on the right side of keep, and
    the plan is Arrow-vectorized (MapInPandas, no row-at-a-time Python)."""
    import zlib

    from raptor_spark.operators.text import compression_quality

    rows = [
        (1, "aa " * 3000),                                   # template spam
        (2, "The quick brown fox runs. Nearby, a dog naps; "
            "rivers bend east toward old stone bridges today." * 1),
        (3, None),                                           # null text
        (4, "x"),                                            # 1 byte
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.id: r for r in compression_quality(df, "doc_id", "text").collect()}

    for i, t in rows:
        b = t.encode() if t else b""
        nb, nc = len(b), len(zlib.compress(b, 6))
        assert got[i].n_bytes == nb
        assert got[i].n_compressed == nc
        assert got[i].ratio == (nc / nb if nb else 1.0)
    assert not got[1].keep      # repetitive -> ratio below lo
    assert got[2].keep
    assert not got[3].keep      # empty -> ratio 1.0 > hi
    assert not got[4].keep      # 1 byte inflates past hi

    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        compression_quality(df, "doc_id", "text").explain()
    plan = buf.getvalue()
    assert "MapInPandas" in plan
    assert "BatchEvalPython" not in plan


def test_boilerplate_shingles_planted(spark):
    """A 3-gram planted in every doc of one source tops that source's
    report with ratio 1.0; a source with disjoint docs has no shingle with
    df > 1."""
    from raptor_spark.operators.curation import boilerplate_shingles

    rows = [
        (i, f"foo bar baz u{i} v{i}", "s1") for i in range(4)
    ] + [
        (10, "p q r s", "s2"),
        (11, "t u v w", "s2"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = boilerplate_shingles(df, "doc_id", "text", "source", n=3, top=2)
    got = {(r.group, r.shingle): (r.df, r.n_docs, r.ratio) for r in out.collect()}
    assert got[("s1", "foo bar baz")] == (4, 4, 1.0)
    # every other s1 shingle is per-doc unique → df 1
    assert all(v[0] == 1 for k, v in got.items() if k != ("s1", "foo bar baz"))
    assert all(v[1] == 2 for k, v in got.items() if k[0] == "s2")


def test_boilerplate_shingles_prune_parity(spark):
    """The salted two-phase top-k must equal a naive single-window ranking
    on a corpus wide enough that the salt cells actually split the work."""
    import random

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from raptor_spark.operators.curation import boilerplate_shingles
    from raptor_spark.operators.dedup import word_shingles_col

    rng = random.Random(13)
    vocab = [f"w{i}" for i in range(30)]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(12)), f"s{i % 3}")
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {
        (r.group, r.shingle): (r.df, r.n_docs, r.ratio)
        for r in boilerplate_shingles(df, "doc_id", "text", "source", top=7).collect()
    }
    # naive reference: single window over the full per-source shingle table
    sh = df.select(
        F.col("source").alias("group"),
        F.explode(word_shingles_col(F.col("text"), 3)).alias("shingle"),
    )
    dfreq = sh.groupBy("group", "shingle").agg(F.count("*").alias("df"))
    w = Window.partitionBy("group").orderBy(F.desc("df"), F.asc("shingle"))
    nd = df.groupBy(F.col("source").alias("group")).agg(F.count("*").alias("n_docs"))
    naive = {
        (r.group, r.shingle): (r.df, r.n_docs, r.ratio)
        for r in dfreq.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 7)
        .join(nd, "group")
        .select(
            "group", "shingle", "df", "n_docs",
            F.round(F.col("df") * 1.0 / F.col("n_docs"), 6).alias("ratio"),
        )
        .collect()
    }
    assert got == naive


def test_epoch_order_python_replay_and_epoch_variation(spark):
    """The manifest equals a pure-Python md5 replay; different epochs give
    different within-shard orders while shard membership stays fixed."""
    import hashlib

    from raptor_spark.operators.curation import epoch_order

    rows = [(i, f"doc {i} body text") for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def py_manifest(epoch):
        shards = {}
        for i, text in rows:
            shard = int(hashlib.md5(text.encode()).hexdigest()[:4], 16) % 4
            key = hashlib.md5(f"{i}:{epoch}".encode()).hexdigest()
            shards.setdefault(shard, []).append((key, i))
        out = {}
        for shard, xs in shards.items():
            ids = [str(i) for _, i in sorted(xs)]
            out[shard] = (
                len(ids),
                hashlib.sha256(",".join(ids).encode()).hexdigest(),
                ",".join(ids[:3]),
            )
        return out

    for epoch in (1, 2):
        got = {
            r.shard: (r.n_docs, r.order_sha256, r.head_ids)
            for r in epoch_order(df, "doc_id", "text", epoch=epoch, n_shards=4).collect()
        }
        assert got == py_manifest(epoch), epoch
    # the two epochs really are different permutations of the same shards
    e1, e2 = py_manifest(1), py_manifest(2)
    assert {s: v[0] for s, v in e1.items()} == {s: v[0] for s, v in e2.items()}
    assert any(e1[s][1] != e2[s][1] for s in e1)


def test_dsir_importance_planted_domain_signal(spark):
    """Planted-geometry gate: docs drawn from the target vocabulary must
    out-score docs from a disjoint background vocabulary, and a held-out
    target-vocab doc NOT in the target slice still scores high (that is the
    whole point of importance resampling — the score is a property of the
    content, not of the label)."""
    from raptor_spark.operators.curation import dsir_importance
    from pyspark.sql import functions as F

    target_words = ["theorem", "lemma", "proof", "corollary", "axiom"]
    noise_words = ["car", "engine", "wheel", "brake", "road"]
    rows = []
    # 20 labeled target docs, 40 background docs, 1 held-out target-like doc
    for i in range(20):
        rows.append((i, " ".join(target_words[(i + j) % 5] for j in range(30)), "target"))
    for i in range(20, 60):
        rows.append((i, " ".join(noise_words[(i + j) % 5] for j in range(30)), "web"))
    rows.append((99, " ".join(target_words[j % 5] for j in range(30)), "web"))
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {
        r.id: r.dsir_logratio
        for r in dsir_importance(
            df, "doc_id", "text", target_pred=F.col("source") == "target"
        ).collect()
    }
    assert len(out) == 61
    target_scores = [out[i] for i in range(20)]
    noise_scores = [out[i] for i in range(20, 60)]
    assert min(target_scores) > max(noise_scores)
    # label-free generalization: the held-out doc scores with the targets
    assert out[99] > max(noise_scores)


def test_word_entropy_closed_form(spark):
    """Uniform doc: H = ln(k); single repeated word: H = 0, TTR = 1/n."""
    import math

    from raptor_spark.operators.text import word_entropy

    df = spark.createDataFrame(
        [
            (1, "a b c d"),          # 4 distinct, uniform -> ln(4)
            (2, "x x x x x"),        # 1 distinct -> 0
            (3, "a a b"),            # H = ln(3) - (2 ln 2)/3
        ],
        "doc_id long, text string",
    )
    got = {r.id: r for r in word_entropy(df, "doc_id", "text").collect()}
    assert got[1].entropy == round(math.log(4), 4) and got[1].ttr == 1.0
    assert got[2].entropy == 0.0 and got[2].ttr == 0.2
    assert got[3].entropy == round(math.log(3) - 2 * math.log(2) / 3, 4)
    assert (got[3].n_words, got[3].n_distinct) == (3, 2)


def test_source_containment_directed_asymmetry(spark):
    from raptor_spark.operators.curation import source_containment_matrix

    # B contains ALL of A's trigram material plus extra of its own:
    # containment(A->B) = 1.0, containment(B->A) < 1.0
    rows = [
        ("A", 1, "one two three four"),
        ("B", 2, "one two three four five six seven eight"),
        ("C", 3, "nine ten eleven twelve"),
    ]
    df = spark.createDataFrame(rows, "source string, doc_id long, text string")
    out = {
        (r.source_a, r.source_b): r
        for r in source_containment_matrix(df, "source", "text", n=3).collect()
    }
    assert out[("A", "B")].containment == 1.0
    assert out[("B", "A")].containment < 1.0
    # A: trigrams of a 4-word doc = 2; all shared with B
    assert out[("A", "B")].n_a == 2 and out[("A", "B")].n_shared == 2
    # disjoint C never appears against A
    assert ("A", "C") not in out and ("C", "A") not in out
