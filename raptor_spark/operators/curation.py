"""Dataset-curation operators for training-data pipelines.

The reference curates at insert time (dedup + payload filters,
qdrant_search_docker/api_insert.py:130-165); a 100 TB corpus pipeline needs
three more curation primitives, all pure column expressions here:

* deterministic_sample — content-hash bucket sampling: keep rows whose
  md5(text) bucket lands in the selected residue class. Deterministic under
  any partitioning (never ``rand()``), reproducible across engines, and a
  stratum column can simply be part of the downstream groupBy — the
  standard way big corpus pipelines carve held-out slices.
* redact_pii — chained regex redaction (emails, IPv4, ≥32-hex-char
  secrets) with placeholder tokens. Patterns are RE2-safe (no lookbehind)
  so the same regexes run on Spark (Java regex) and DuckDB (RE2).
* quantize_embedding_cols — symmetric int8 per-vector quantization
  (scale = max |v|, q = floor(127·v/scale + 0.5) clamped) — the storage
  form a 100 TB vector corpus actually ships. All arithmetic is plain
  IEEE double expressions evaluated in the same shape on both engines, so
  the quantized codes are bit-reproducible; reconstruction error is
  bounded by scale/254 + |v|·ulp and asserted in tests.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
HEXKEY_RE = r"\b[0-9a-fA-F]{32,}\b"


def md5_bucket_col(c: Column, n_buckets: int = 65536) -> Column:
    """Deterministic 0..n_buckets-1 bucket from the first 4 hex chars of
    md5 — the same value is trivially reproducible in any SQL engine."""
    return F.conv(F.substring(F.md5(c), 1, 4), 16, 10).cast("long") % n_buckets


def deterministic_sample(
    df: DataFrame, text_col: str, k: int, residue: int = 0
) -> DataFrame:
    """Keep ~1/k of rows: those whose content-hash bucket ≡ residue (mod k).
    Disjoint residues give disjoint, exhaustive slices (train/held-out)."""
    return df.filter(md5_bucket_col(F.col(text_col)) % k == residue)


def split_assignment_col(
    c: Column, fractions: tuple[int, ...] = (8, 1, 1), names: tuple[str, ...] = ("train", "val", "test")
) -> Column:
    """Deterministic stratified train/val/test assignment from the content
    hash: bucket % Σfractions falls into consecutive residue bands. Like
    deterministic_sample, never rand() — the same row lands in the same
    split on every engine, every run, any partitioning."""
    total = sum(fractions)
    b = md5_bucket_col(c) % total
    out = F.lit(None).cast("string")
    hi = 0
    branches = []
    for frac, name in zip(fractions, names):
        hi += frac
        branches.append((hi, name))
    expr = F.when(b < branches[0][0], branches[0][1])
    for hi, name in branches[1:]:
        expr = expr.when(b < hi, name)
    return expr


def leakage_safe_split(
    docs: DataFrame,
    clusters: DataFrame,
    id_col: str = "id",
    fractions: tuple[int, ...] = (8, 1, 1),
    names: tuple[str, ...] = ("train", "val", "test"),
) -> DataFrame:
    """Dedup-aware train/val/test assignment: the split key is the near-dup
    CLUSTER id (own id for singletons), so every member of a duplicate
    group lands in the same split — the guard against eval contamination
    through near-duplicates (Lee et al. 2022 §6.2: duplicated text leaks
    across naive splits). Assignment reuses split_assignment_col over the
    cluster id rendered as a string — content-derived, never rand(), so
    the same doc lands in the same split on every engine and every run.

    Scale shape: ``clusters`` is pair-derived (tiny vs the corpus) so the
    left join broadcasts; the split itself is a map-only expression."""
    lab = docs.join(clusters, id_col, "left").withColumn(
        "cluster", F.coalesce(F.col("cluster"), F.col(id_col))
    )
    return lab.withColumn(
        "split",
        split_assignment_col(F.col("cluster").cast("string"), fractions, names),
    )


def redact_pii_col(c: Column) -> Column:
    """Emails → <EMAIL>, IPv4 → <IP>, long hex tokens → <KEY>, applied in
    that fixed order (a redacted placeholder can never re-match a later
    pattern)."""
    out = F.regexp_replace(c, EMAIL_RE, "<EMAIL>")
    out = F.regexp_replace(out, IPV4_RE, "<IP>")
    return F.regexp_replace(out, HEXKEY_RE, "<KEY>")


def pii_counts_col(c: Column) -> Column:
    """Total email+ip+hexkey match count (pre-redaction audit metric)."""
    return (
        F.regexp_count(c, F.lit(EMAIL_RE))
        + F.regexp_count(c, F.lit(IPV4_RE))
        + F.regexp_count(c, F.lit(HEXKEY_RE))
    )


def quantize_embedding_cols(vec: Column) -> tuple[Column, Column]:
    """(scale, q): symmetric int8 codes. floor(x + 0.5) — not round() — so
    both engines share one rounding rule; codes clamp to [-127, 127]."""
    scale = F.array_max(F.transform(vec, lambda x: F.abs(x)))
    safe = F.when(scale == 0.0, F.lit(1.0)).otherwise(scale)
    q = F.transform(
        vec,
        lambda x: F.greatest(
            F.lit(-127),
            F.least(F.lit(127), F.floor(F.lit(127.0) * x / safe + F.lit(0.5))),
        ).cast("int"),
    )
    return scale, q


def dequantize_col(q: Column, scale: Column) -> Column:
    return F.transform(q, lambda x: x.cast("double") * scale / F.lit(127.0))


def shard_corpus(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_shards: int = 8,
    sep: str = "\n",
) -> DataFrame:
    """Deterministic training-shard manifest: route every doc to a shard by
    content-hash bucket (never ``rand()`` — the same doc lands in the same
    shard on any engine / partitioning), concatenate each shard's docs in id
    order, and fingerprint the payload. Output per shard: ``(shard, n_docs,
    n_chars, payload_sha256)``.

    Scale shape: ONE shuffle keyed by shard. At 100 TB the concat step is a
    ``repartition(shard).sortWithinPartitions(id)`` streaming file write;
    the ordered in-memory concat here is the *verifiable contract* — the
    sha256 pins byte-exact payload order, which is what a resumable shard
    writer must reproduce (≙ the reference's deterministic insert batching,
    qdrant_search_docker/api_insert.py:88-171). n_chars comes from the agg
    (Σ|text| + separators), not from re-materializing the payload."""
    rows = df.select(
        (md5_bucket_col(F.col(text_col)) % n_shards).alias("shard"),
        F.col(id_col).alias("id"),
        F.col(text_col).alias("text"),
    )
    packed = rows.groupBy("shard").agg(
        F.array_sort(F.collect_list(F.struct("id", "text"))).alias("xs"),
        F.count("*").alias("n_docs"),
        F.sum(F.length("text")).alias("sum_chars"),
    )
    return packed.select(
        "shard",
        "n_docs",
        (F.col("sum_chars") + (F.col("n_docs") - 1) * len(sep)).alias("n_chars"),
        F.sha2(
            F.array_join(F.transform("xs", lambda s: s["text"]), sep), 256
        ).alias("payload_sha256"),
    )


def epoch_order(
    df: DataFrame,
    id_col: str,
    text_col: str,
    epoch: int,
    n_shards: int = 8,
) -> DataFrame:
    """(shard, n_docs, order_sha256, head_ids): deterministic per-EPOCH
    training-order manifest — every epoch is a different, reproducible
    pseudo-random permutation (key = md5(id || ':' || epoch)), while shard
    assignment stays content-stable across epochs (a worker always owns the
    same documents; only their visit order reshuffles). No ``rand()``: the
    same (corpus, epoch) pair yields the same order on any engine, the
    property a resumable training job needs to skip to mid-epoch.

    Scale shape: ONE shuffle keyed by shard; at 100 TB the order is applied
    as ``repartition(shard).sortWithinPartitions(key)`` on the write path —
    the ordered digest here is the *verifiable contract* that writer must
    reproduce (same argument as shard_corpus's payload sha256)."""
    key = F.md5(
        F.concat_ws(":", F.col(id_col).cast("string"), F.lit(str(epoch)))
    )
    rows = df.select(
        (md5_bucket_col(F.col(text_col)) % n_shards).alias("shard"),
        F.col(id_col).cast("long").alias("id"),
        key.alias("k"),
    )
    packed = rows.groupBy("shard").agg(
        F.array_sort(F.collect_list(F.struct("k", "id"))).alias("xs"),
        F.count("*").alias("n_docs"),
    )
    ordered = F.transform("xs", lambda s: s["id"].cast("string"))
    return packed.select(
        "shard",
        "n_docs",
        F.sha2(F.array_join(ordered, ","), 256).alias("order_sha256"),
        F.array_join(F.slice(ordered, 1, 3), ",").alias("head_ids"),
    )


def temperature_mix(
    df: DataFrame, key_col: str, alpha: float = 0.3, budget: int = 1000
) -> DataFrame:
    """Temperature-flattened multinomial mixing weights per group — the
    multilingual-LM data-balancing rule p_k ∝ (n_k / N)^α (α < 1 upsamples
    the tail, α = 1 is proportional). Output per key: raw share, flattened
    share, and the expected doc count for a ``budget``-doc epoch.

    Scale shape: one partial-aggregated groupBy to per-key counts (tiny —
    vocabulary of keys), then two broadcast cross-joins for the N and Z
    normalizers. Nothing after the first agg touches corpus-sized data, and
    there is no single-partition window."""
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count("*").alias("n_docs")
    )
    n_total = counts.agg(F.sum("n_docs").alias("n_total"))
    raw = counts.crossJoin(F.broadcast(n_total)).withColumn(
        "p_raw", F.col("n_docs") / F.col("n_total")
    )
    raw = raw.withColumn("w", F.pow(F.col("p_raw"), F.lit(alpha)))
    z = raw.agg(F.sum("w").alias("z"))
    return raw.crossJoin(F.broadcast(z)).select(
        "key",
        "n_docs",
        "p_raw",
        (F.col("w") / F.col("z")).alias("p_temp"),
        (F.lit(float(budget)) * F.col("w") / F.col("z")).alias("expected_docs"),
    )


def cap_per_key(
    df: DataFrame,
    key_col: str,
    order_cols: list,
    k: int,
) -> DataFrame:
    """Per-key quota capping (the per-domain cap of web-corpus curation:
    keep at most ``k`` docs per source, best-first). ``order_cols`` is the
    keep-priority ordering; ties MUST be broken by a unique column for
    determinism. Adds a boolean ``kept`` column.

    Scale shape: one shuffle keyed by ``key_col`` for the row_number window.
    A hot domain makes the key skewed — the window is rank-only (no payload
    agg), so the skewed partition streams; if the cap is small relative to
    the skew, pre-filtering with a capped groupBy count is the next step."""
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(*order_cols)
    return df.withColumn("kept", F.row_number().over(w) <= k)


def ngram_contamination(
    train: DataFrame,
    eval_set: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
) -> DataFrame:
    """(id, n_shared) for every training doc sharing ≥ 1 word n-gram with
    ANY eval doc — benchmark decontamination, the cross-set twin of near-dup
    detection: a training corpus must not contain evaluation text.

    Scale shape: both sides explode to distinct n-gram shingles and meet in
    ONE equi-join on the shingle; the eval side is the distinct shingle set
    of a benchmark (small vs a 100 TB corpus — Spark broadcasts it; at worst
    it is a shuffled equi-join, never all-pairs). ``n_shared`` counts the
    distinct colliding shingles per training doc, so downstream policy can
    threshold (drop / flag) instead of hard-deleting on a single collision.
    """
    from raptor_spark.operators.dedup import word_shingles_col

    tr = train.select(
        F.col(id_col).alias("id"),
        F.explode(word_shingles_col(F.col(text_col), n)).alias("s"),
    )
    ev = eval_set.select(
        F.explode(word_shingles_col(F.col(text_col), n)).alias("s")
    ).distinct()
    return (
        tr.join(ev, "s")
        .groupBy("id")
        .agg(F.count_distinct("s").alias("n_shared"))
    )


def boilerplate_shingles(
    df: DataFrame,
    id_col: str,
    text_col: str,
    group_col: str,
    n: int = 3,
    top: int = 5,
) -> DataFrame:
    """(group, shingle, df, n_docs, ratio): per-source boilerplate-candidate
    report — the top word n-gram shingles by document frequency WITHIN each
    source, with the fraction of that source's documents containing them
    (C4/RefinedWeb-style repeated-content discovery: headers, footers,
    navigation chrome show up as shingles with ratio near 1 inside one
    source; a cleaning pipeline reviews/strips them per source).

    Scale shape: docs explode to DISTINCT shingles per doc (so count(*) IS
    document frequency), one shuffle on (group, shingle); the per-source
    doc counts are a group-cardinality broadcast. The top-k is TWO-PHASE:
    a group-only window would put a source's ENTIRE shingle vocabulary
    (billions of rows at corpus scale) on one task, so a partial top-k per
    (group, salt=xxhash64(shingle)%64) prunes first — content-derived
    salt, 64-way spread — and the final per-group window ranks ≤ 64·top
    survivors. Output is identical to the single-window form (the order
    (df desc, shingle asc) is total, so each salt cell's top-k is a
    superset filter of the global top-k). Integer-count ordering with
    shingle tiebreak keeps the cutoff deterministic across engines."""
    from pyspark.sql.window import Window

    from raptor_spark.operators.dedup import word_shingles_col

    sh = df.select(
        F.col(group_col).alias("group"),
        F.explode(word_shingles_col(F.col(text_col), n)).alias("shingle"),
    )
    dfreq = sh.groupBy("group", "shingle").agg(F.count("*").alias("df"))
    nd = df.groupBy(F.col(group_col).alias("group")).agg(
        F.count("*").alias("n_docs")
    )
    order = (F.desc("df"), F.asc("shingle"))
    pre = Window.partitionBy("group", "__salt").orderBy(*order)
    pruned = (
        dfreq.withColumn("__salt", F.pmod(F.xxhash64("shingle"), F.lit(64)))
        .withColumn("__prn", F.row_number().over(pre))
        .filter(F.col("__prn") <= top)
        .drop("__salt", "__prn")
    )
    w = Window.partitionBy("group").orderBy(*order)
    return (
        pruned.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= top)
        .drop("rn")
        .join(F.broadcast(nd), "group")
        .select(
            "group",
            "shingle",
            "df",
            "n_docs",
            F.round(F.col("df") * 1.0 / F.col("n_docs"), 6).alias("ratio"),
        )
    )


def weighted_sample_topk(
    df: DataFrame,
    id_col: str,
    text_col: str,
    weight: Column,
    k: int,
) -> DataFrame:
    """Deterministic weighted sampling without replacement
    (Efraimidis–Spirakis A-ES): each row draws u ∈ (0, 1] from its CONTENT
    hash (never ``rand()``), keys on u^(1/w), and the global top-k by key
    is an exact weighted sample — rows with twice the weight are twice as
    likely to survive, yet the selection is bit-reproducible across
    engines, runs, and partitionings.

    Scale shape: the key is a pure column expression; top-k is a
    TakeOrderedAndProject (per-partition heap + driver merge of k·P rows),
    never a full sort. Adds ``es_key``; ties broken by id downstream."""
    u = (md5_bucket_col(F.col(text_col)) + 1.0) / 65536.0
    key = F.pow(u, 1.0 / weight)
    return (
        df.select(F.col(id_col).alias("id"), weight.alias("w"), key.alias("es_key"))
        .orderBy(F.desc("es_key"), F.asc("id"))
        .limit(k)
    )


def weighted_sample_per_group(
    df: DataFrame,
    id_col: str,
    text_col: str,
    group_cols: list[str],
    weight: Column,
    k: int,
) -> DataFrame:
    """Per-group Efraimidis–Spirakis weighted sampling without replacement:
    the top-k by u^(1/w) WITHIN each group — the balanced-selection form of
    weighted_sample_topk (a global top-k lets one over-weighted source
    swamp the sample; this caps every group at k, the per-source quota of
    a curriculum mix). Same content-hash u, so it is bit-reproducible
    across engines, runs, and partitionings.

    Scale shape: one window rank per group key (a single shuffle on the
    group columns); no global sort. Returns (group..., id, w, es_key,
    rk ≤ k)."""
    from pyspark.sql.window import Window

    u = (md5_bucket_col(F.col(text_col)) + 1.0) / 65536.0
    key = F.pow(u, 1.0 / weight)
    w = Window.partitionBy(*group_cols).orderBy(
        F.desc("es_key"), F.asc("id")
    )
    return (
        df.select(
            *group_cols,
            F.col(id_col).alias("id"),
            weight.alias("w"),
            key.alias("es_key"),
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
    )


# -- Bloom-filter membership (the sketch scale path of decontamination) ----
#
# ngram_contamination joins the training corpus against the eval set's
# DISTINCT shingles — exact, but the eval side must be shipped (broadcast or
# shuffled) as full shingle STRINGS. The Bloom form compresses the eval set
# to a fixed-size bitmap (m bits ≈ 128 KiB at m=2^20) that any number of
# downstream jobs can reuse: the reference's insert-time "have I seen this
# content" check (qdrant_search_docker/api_insert.py:130-165) at corpus
# scale. Words are 63-bit (not 64) so ``1 << bit`` never overflows a signed
# BIGINT in either engine — DuckDB raises on 1::BIGINT << 63, and the oracle
# must replay the exact same bitmap.

BLOOM_WORD_BITS = 63


def _bloom_pos(s: Column, i: int, m_bits: int) -> Column:
    """i-th Bloom position of shingle ``s``: the first 5 hex chars (20 bits)
    of md5(s || '#bf<i>'), mod m — reproducible byte-for-byte in SQL."""
    h = F.md5(F.concat(s, F.lit(f"#bf{i}")))
    return F.conv(F.substring(h, 1, 5), 16, 10).cast("long") % m_bits


def bloom_build(
    df: DataFrame, text_col: str, n: int = 3, m_bits: int = 1 << 20, k: int = 3
) -> DataFrame:
    """Build a Bloom bitmap over the word n-gram shingles of ``df`` as
    (word_idx, word) rows: word_idx = pos // 63, word = OR of 1 << (pos % 63).

    Scale shape: one shuffle (distinct shingles), one map-side-combining
    bit_or aggregation; the output is ≤ m/63 rows (~16 k at m=2^20)
    regardless of input size — mergeable across corpus shards by a further
    bit_or, and always broadcastable to the probe side."""
    from raptor_spark.operators.dedup import word_shingles_col

    sh = df.select(
        F.explode(word_shingles_col(F.col(text_col), n)).alias("s")
    ).distinct()
    pos = sh.select(
        F.explode(
            F.array(*[_bloom_pos(F.col("s"), i, m_bits) for i in range(1, k + 1)])
        ).alias("pos")
    )
    return (
        pos.select(
            F.expr(f"pos div {BLOOM_WORD_BITS}").alias("word_idx"),
            F.expr(f"shiftleft(1L, CAST(pos % {BLOOM_WORD_BITS} AS INT))").alias("w1"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("w1").alias("word"))
    )


def bloom_contamination(
    train: DataFrame,
    bloom: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    m_bits: int = 1 << 20,
    k: int = 3,
) -> DataFrame:
    """(id, n_flagged) per training doc: how many of its distinct shingles
    the Bloom filter claims are in the eval set (all k probe bits set).
    Same output contract as ngram_contamination, with a false-positive rate
    of (set_bits/m)^k (~1e-5 per shingle at the defaults) instead of an
    exact join — the trade a 100 TB corpus makes to avoid re-shipping the
    benchmark shingle set to every probe job.

    Scale shape: the k probe positions stay COLUMNS of the shingle row —
    never exploded — so the probe is k broadcast-hash lookups followed by
    an in-row AND, all in one map stage; the shingle strings never shuffle
    (an earlier explode + groupBy(id, shingle) formulation shuffled every
    probe row and measured 0.30 N→4N scaling efficiency; this shape is
    map-only until the final per-doc count). word_shingles_col already
    dedups shingles within a doc, so counting flagged rows per id equals
    counting flagged distinct shingles. The bitmap is localCheckpointed
    once (≤ m/63 rows) so the k broadcast builds don't re-run its
    aggregation lineage."""
    from raptor_spark.operators.dedup import word_shingles_col

    bitmap = bloom.localCheckpoint()
    probe = train.select(
        F.col(id_col).alias("id"),
        F.explode(word_shingles_col(F.col(text_col), n)).alias("s"),
    )
    hits = []
    for i in range(1, k + 1):
        probe = probe.withColumn(f"_p{i}", _bloom_pos(F.col("s"), i, m_bits))
        side = bitmap.select(
            F.col("word_idx").alias(f"_w{i}"), F.col("word").alias(f"_wd{i}")
        )
        probe = probe.join(
            F.broadcast(side),
            F.expr(f"_p{i} div {BLOOM_WORD_BITS}") == F.col(f"_w{i}"),
            "left",
        )
        hits.append(
            F.coalesce(
                F.expr(
                    f"(shiftright(_wd{i}, CAST(_p{i} % {BLOOM_WORD_BITS} AS INT))"
                    " & 1L) = 1L"
                ),
                F.lit(False),
            )
        )
    flagged = hits[0]
    for h in hits[1:]:
        flagged = flagged & h
    return (
        probe.select("id", flagged.alias("flagged"))
        .groupBy("id")
        .agg(F.sum(F.col("flagged").cast("long")).alias("n_flagged"))
        .filter(F.col("n_flagged") > 0)
    )


def shingle_novelty(
    df: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """Per-doc novelty: of the doc's distinct word n-grams, how many does it
    contribute FIRST (by ascending id)? Corpus pipelines score marginal
    value this way — "new token fraction" — to order ingestion and drop
    docs whose content is already covered (the deduped-token-count idea of
    Lee et al. 2022 §4, applied at doc granularity).

    Scale shape: one groupBy shingle (min id — map-side combinable), one
    equi-join back on the shingle to label novelty, one per-doc count.
    Never all-pairs; the shingle strings shuffle once."""
    from raptor_spark.operators.dedup import word_shingles_col

    sh = df.select(
        F.col(id_col).alias("id"),
        F.explode(word_shingles_col(F.col(text_col), n)).alias("s"),
    )
    first = sh.groupBy("s").agg(F.min("id").alias("first_id"))
    return (
        sh.join(first, "s")
        .groupBy("id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum((F.col("first_id") == F.col("id")).cast("long")).alias("n_novel"),
        )
        .withColumn(
            "novelty",
            F.round(F.col("n_novel") / F.col("n_shingles"), 4),
        )
    )


def lm_perplexity(
    df: DataFrame,
    id_col: str,
    text_col: str,
    alpha: float = 0.5,
    broadcast_counts: bool = True,
) -> DataFrame:
    """CCNet-style LM quality scoring (Wenzek et al. 2020): perplexity of
    each document under an add-alpha-smoothed bigram model trained on the
    corpus itself — the classic "does this read like the reference corpus"
    curation filter (low ppl = fluent/boilerplate, high ppl = noise), the
    statistical stand-in for the reference's model-based relevance scoring
    (qdrant_search_docker/api_document_search_with_cache.py:157-237).

    p(w2|w1) = (c(w1,w2) + alpha) / (c(w1·) + alpha·V) with c over corpus
    bigram counts, c(w1·) the bigram-context total derived FROM the bigram
    counts (no second corpus aggregation), and V the unigram vocabulary.
    ppl(doc) = exp(-mean ln p over the doc's bigrams, with multiplicity).
    Docs with < 2 words have no bigrams and drop out (score undefined).

    Scale shape: one explode+groupBy for bigram counts (map-side
    combinable), context totals re-aggregated from that vocabulary-sized
    table (not from the corpus), scoring is the bigram explode joined to
    the two count tables + one per-doc aggregate. With
    ``broadcast_counts`` (default) the count tables are broadcast, so
    scoring is MAP-ONLY over the corpus — measured in on the N-vs-4N
    gate: the sort-merge form sorts the exploded corpus twice and scored
    ~0.75 scaling efficiency, the broadcast form ~0.92-1.03 (one serial
    driver collect bounded by vocabulary size, which grows ~N^0.5-0.7 by
    Heaps' law — still broadcastable when the corpus is 100×). Set it
    False only when the vocabulary itself outgrows executor memory; the
    shuffle joins it falls back to stay correct, just sort-bound."""
    from raptor_spark.functions import bind_col
    from raptor_spark.operators.text import words_col

    def _bigrams(w: Column) -> Column:
        return F.when(
            F.size(w) >= 2,
            F.transform(
                F.sequence(F.lit(0), F.size(w) - 2),
                lambda i: F.concat_ws(
                    "\x01", F.element_at(w, i + 1), F.element_at(w, i + 2)
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))

    doc_bg = df.select(
        F.col(id_col).alias("id"),
        F.explode(bind_col(words_col(F.col(text_col)), _bigrams)).alias("bg"),
    )
    bg_counts = doc_bg.groupBy("bg").agg(F.count("*").alias("n_ab"))
    ctx = (
        bg_counts.select(
            F.split_part(F.col("bg"), F.lit("\x01"), F.lit(1)).alias("w1"), "n_ab"
        )
        .groupBy("w1")
        .agg(F.sum("n_ab").alias("n_ctx"))
    )
    vocab = df.select(
        F.explode(words_col(F.col(text_col))).alias("w")
    ).agg(F.countDistinct("w").alias("v"))
    if broadcast_counts:
        bg_counts, ctx = F.broadcast(bg_counts), F.broadcast(ctx)
    scored = (
        doc_bg.join(bg_counts, "bg")
        .withColumn("w1", F.split_part(F.col("bg"), F.lit("\x01"), F.lit(1)))
        .join(ctx, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "id",
            F.log(
                (F.col("n_ab") + F.lit(alpha))
                / (F.col("n_ctx") + F.lit(alpha) * F.col("v"))
            ).alias("lp"),
        )
    )
    return scored.groupBy("id").agg(
        F.count("*").alias("n_bigrams"),
        F.round(F.exp(-F.avg("lp")), 4).alias("ppl"),
    )


def quantile_gate(
    df: DataFrame, key_col: str, value_col: str, q: float = 0.25
) -> DataFrame:
    """Keep the rows at/above their group's exact q-quantile of
    ``value_col`` (threshold attached as ``q_thr``) — distribution-based
    quality gating ("drop the bottom quartile per language"), the
    per-group twin of a global score cutoff. Exact linear-interpolation
    percentile; swap in approx_percentile at the >10^9-rows-per-group tier
    (operators/sketch.py) — same shape, bounded error.

    Scale shape: one per-group aggregate (rows: #groups — always
    broadcastable) + one broadcast equi-join; the fact side never
    shuffles."""
    thr = df.groupBy(key_col).agg(
        F.expr(f"percentile({value_col}, {q})").alias("q_thr")
    )
    return df.join(F.broadcast(thr), key_col).filter(
        F.col(value_col) >= F.col("q_thr")
    )


def dsir_importance(
    df: DataFrame,
    id_col: str,
    text_col: str,
    target_pred: Column,
    n_buckets: int = 1024,
    alpha: float = 1.0,
) -> DataFrame:
    """DSIR-style data-selection importance weights (Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling"):
    hashed n-gram features (word unigrams + bigrams → md5 buckets), two
    add-alpha-smoothed categorical distributions — the TARGET slice
    (rows where ``target_pred``) vs the RAW corpus — and per-document
    log-importance ln p_target(feature)/p_raw(feature) averaged over the
    document's features. High scores = "looks like the target domain";
    resample/filter the raw corpus on them. This is the statistical
    stand-in for the reference's model-scored relevance routing
    (qdrant_search_docker/api_document_search_with_cache.py:157-237).

    Scale shape: one explode+groupBy over hashed features (map-side
    combinable, key space capped at ``n_buckets`` — NOT vocabulary-sized,
    the whole point of feature hashing), totals folded in via a broadcast
    1-row frame, and scoring is the feature explode joined to the
    BROADCAST bucket table (≤ n_buckets rows) — map-only over the corpus,
    same proven shape as ``lm_perplexity(broadcast_counts=True)`` (0.92+
    N-vs-4N scaling). Every value is reproducible cross-engine: md5
    bucketing, integer counts, IEEE double ln of (int+α)/(int+α) ratios.
    """
    from raptor_spark.functions import bind_col
    from raptor_spark.operators.text import words_col

    def _features(w: Column) -> Column:
        bigrams = F.when(
            F.size(w) >= 2,
            F.transform(
                F.sequence(F.lit(0), F.size(w) - 2),
                lambda i: F.concat_ws(
                    "\x01", F.element_at(w, i + 1), F.element_at(w, i + 2)
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))
        return F.concat(w, bigrams)

    feats = df.select(
        F.col(id_col).alias("id"),
        target_pred.cast("int").alias("is_target"),
        F.explode(bind_col(words_col(F.col(text_col)), _features)).alias("feat"),
    ).withColumn("bucket", md5_bucket_col(F.col("feat"), n_buckets))
    counts = feats.groupBy("bucket").agg(
        F.sum("is_target").alias("n_t"), F.count("*").alias("n_r")
    )
    totals = counts.agg(
        F.sum("n_t").alias("tot_t"), F.sum("n_r").alias("tot_r")
    )
    scored = (
        feats.select("id", "bucket")
        .join(F.broadcast(counts), "bucket")
        .crossJoin(F.broadcast(totals))
        .select(
            "id",
            (
                F.log(
                    (F.col("n_t") + F.lit(alpha))
                    / (F.col("tot_t") + F.lit(alpha) * F.lit(n_buckets))
                )
                - F.log(
                    (F.col("n_r") + F.lit(alpha))
                    / (F.col("tot_r") + F.lit(alpha) * F.lit(n_buckets))
                )
            ).alias("lr"),
        )
    )
    return scored.groupBy("id").agg(
        F.count("*").alias("n_features"),
        # sign-crossing after round: +0.0 normalizes -0.0 (both engines)
        (F.round(F.avg("lr"), 4) + F.lit(0.0)).alias("dsir_logratio"),
    )


def bloom_from_keys(
    df: DataFrame, key: str, m_bits: int = 1 << 20, k: int = 3
) -> DataFrame:
    """Bloom bitmap over a KEY column (the join-pruning face of
    bloom_build's shingle bitmap): distinct keys stringified, k md5
    positions each, word-packed (word_idx, word) rows — ≤ m/63 rows
    whatever the key cardinality, mergeable by bit_or, always
    broadcastable."""
    keys = df.select(F.col(key).cast("string").alias("s")).distinct()
    pos = keys.select(
        F.explode(
            F.array(*[_bloom_pos(F.col("s"), i, m_bits) for i in range(1, k + 1)])
        ).alias("pos")
    )
    return (
        pos.select(
            F.expr(f"pos div {BLOOM_WORD_BITS}").alias("word_idx"),
            F.expr(f"shiftleft(1L, CAST(pos % {BLOOM_WORD_BITS} AS INT))").alias("w1"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("w1").alias("word"))
    )


def source_containment_matrix(
    df: DataFrame, source_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """Directed source-level containment — for every ordered source pair
    (a, b): what fraction of a's DISTINCT word n-gram shingles also
    appear in b? The corpus-level view the doc-pair dup matrix
    (cross_source_dups) cannot give: a mirror site shows as containment
    ≈ 1 in both directions, a quote-heavy source contains its upstream
    asymmetrically — the direction tells who copies whom. Counts are
    exact BIGINTs (distinct-shingle set sizes and intersections); the
    fraction is the single division.

    Shape: the corpus collapses to distinct (source, shingle) in one
    shuffle (shingle-vocabulary bounded, the Bloom/novelty discipline);
    the intersection is one shingle-keyed self-join producing
    |sources|² cells at most; set sizes broadcast back."""
    from raptor_spark.operators.dedup import word_shingles_col

    sh = (
        df.select(
            F.col(source_col).alias("src"),
            F.explode(word_shingles_col(F.col(text_col), n)).alias("s"),
        )
        .distinct()
        .localCheckpoint()
    )
    sizes = sh.groupBy("src").agg(F.count("*").cast("long").alias("n_shingles"))
    inter = (
        sh.join(sh.select(F.col("src").alias("src_b"), "s"), "s")
        .filter(F.col("src") != F.col("src_b"))
        .groupBy(F.col("src").alias("source_a"), F.col("src_b").alias("source_b"))
        .agg(F.count("*").cast("long").alias("n_shared"))
    )
    return (
        inter.join(
            F.broadcast(sizes.select(F.col("src").alias("source_a"),
                                     F.col("n_shingles").alias("n_a"))),
            "source_a",
        )
        .select(
            "source_a",
            "source_b",
            "n_shared",
            F.col("n_a"),
            F.round(F.col("n_shared") / F.col("n_a").cast("double"), 6).alias(
                "containment"
            ),
        )
    )
