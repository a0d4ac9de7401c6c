"""Lexical ranked retrieval over a document corpus: inverted-index term
statistics, BM25 top-k search, and bigram-PMI collocation mining — the
embedding-free read path the north_star prescribes (lexical scoring in
place of the reference's vector search, ≙ the filtered ranked search of
qdrant_search_docker/api_document_search_with_cache.py:157-237).

All three operators share one scale shape: tokenize with a pure column
expression (no UDF), explode to (doc, term) rows, and aggregate — one
shuffle keyed by term (document-frequency side) or by doc (score side).
The query-term list is a literal array (broadcast by construction), so
BM25 scoring never shuffles the corpus on anything but doc_id.

At 100 TB the (doc, term) explosion is the dominated cost; it is a
map-side transform feeding a partial-aggregated groupBy, so it never
materializes the exploded set. df/idf statistics are tiny (vocabulary
scale) and broadcast back onto the per-doc side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from raptor_spark.operators.text import words_col


def doc_terms(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, term, tf, dl): per-document term frequencies plus document
    length in words — the posting-list building block."""
    # split once per row: project the word array to an attribute first, so
    # the dl projection and the generator both read it instead of inlining
    # the regex split twice
    ws = df.select(F.col(id_col).alias("id"), words_col(F.col(text_col)).alias("ws"))
    words = ws.select("id", F.size("ws").alias("dl"), F.explode("ws").alias("term"))
    return words.groupBy("id", "term").agg(
        F.count("*").alias("tf"), F.first("dl").alias("dl")
    )


def term_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Inverted-index statistics: (term, df, cf, idf) — document frequency,
    collection frequency, and the BM25+ idf ln((N - df + 0.5)/(df + 0.5) + 1)
    (always positive, unlike the classic idf for df > N/2).

    One shuffle on term; N rides along as a scalar subquery-free literal by
    cross-joining a 1-row count (Spark broadcasts it)."""
    terms = df.select(
        F.col(id_col).alias("id"),
        F.explode(words_col(F.col(text_col))).alias("term"),
    )
    n_docs = df.select(F.count("*").alias("n_docs"))
    stats = terms.groupBy("term").agg(
        F.count_distinct("id").alias("df"), F.count("*").alias("cf")
    )
    return stats.crossJoin(F.broadcast(n_docs)).select(
        "term",
        "df",
        "cf",
        F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0).alias(
            "idf"
        ),
    )


def bm25_topk(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k: int | None = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 top-k over the corpus for one bag-of-words query:
    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)).

    Plan: per-doc tf for the query terms only (the term filter lands before
    the groupBy, so the exploded set shrinks to matching terms), df/avgdl as
    two tiny broadcast aggregates, score as one more per-doc agg. Terms are
    a literal array — nothing about the query touches the shuffle key."""
    q = [t.lower() for t in query_terms]
    tf = doc_terms(df, id_col, text_col).filter(F.col("term").isin(q))
    corpus_stats = df.select(
        F.count("*").alias("n_docs"),
        F.avg(F.size(words_col(F.col(text_col)))).alias("avgdl"),
    )
    dfreq = tf.groupBy("term").agg(F.count_distinct("id").alias("df"))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(corpus_stats))
        .withColumn(
            "idf",
            F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0),
        )
        .withColumn(
            "contrib",
            F.col("idf")
            * (F.col("tf") * (k1 + 1))
            / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))),
        )
    )
    per_doc = scored.groupBy("id").agg(
        F.sum("contrib").alias("score"), F.count("*").alias("n_matched")
    )
    if k is None:
        # full scored set, no cutoff — callers that re-rank downstream
        # (e.g. rrf_fuse). NOTE: never emulate this with a huge k — a
        # TakeOrderedAndProject allocates its bounded priority queue at
        # capacity k up front (measured: k=10^9 OOMs the executor heap).
        return per_doc
    return per_doc.orderBy(F.desc("score"), F.asc("id")).limit(k)


def rrf_fuse(
    rankings: list[DataFrame], k: int = 60
) -> DataFrame:
    """(id, rrf, n_lists): reciprocal-rank fusion of N ranked lists —
    the standard hybrid-retrieval combiner (lexical BM25 ⊕ dense/prior
    rankings): rrf(d) = Σ_lists 1 / (k + rank_list(d)), documents absent
    from a list contribute nothing for it.

    Each input must be (id, rank) with rank already assigned 1..n by a
    DETERMINISTIC order (rounded score desc, id asc — the caller owns the
    tie discipline so the fusion replays across engines). The fusion
    itself is one union + one groupBy on id: the lists are top-K cutoffs
    (tiny vs the corpus), so this never touches corpus scale."""
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranked list")
    scored = None
    for r in rankings:
        part = r.select(
            "id", (F.lit(1.0) / (F.lit(float(k)) + F.col("rank"))).alias("c")
        )
        scored = part if scored is None else scored.unionByName(part)
    return scored.groupBy("id").agg(
        F.sum("c").alias("rrf"), F.count("*").alias("n_lists")
    )


def bigram_pmi(
    df: DataFrame, text_col: str, min_count: int = 5, top_n: int | None = None
) -> DataFrame:
    """Adjacent-word collocations by pointwise mutual information:
    pmi(a,b) = ln( p(a,b) / (p(a)·p(b)) ) with p over the bigram/unigram
    totals of the whole corpus. Only bigrams with count ≥ min_count.

    Two aggregations (bigram counts, unigram counts) off one bound word
    array per row; unigram counts join back twice — both sides are
    vocabulary-sized (small vs the corpus; broadcast-eligible under AQE)."""
    from raptor_spark.functions import bind_col

    def _bigrams(w: Column) -> Column:
        return F.when(
            F.size(w) >= 2,
            F.transform(
                F.sequence(F.lit(0), F.size(w) - 2),
                lambda i: F.concat_ws("\x01", F.element_at(w, i + 1), F.element_at(w, i + 2)),
            ),
        ).otherwise(F.array().cast("array<string>"))

    # NOT persisted: the three consumers below re-run scan+split (cheap,
    # column-pruned) — pinning a tokenized copy of a 100 TB corpus in
    # storage would be the real cost. A pipeline that reuses postings
    # should materialize doc_terms() as a stage table instead.
    words = df.select(words_col(F.col(text_col)).alias("ws"))
    bigrams = (
        words.select(F.explode(bind_col(F.col("ws"), _bigrams)).alias("bg"))
        .groupBy("bg")
        .agg(F.count("*").alias("n_ab"))
        .filter(F.col("n_ab") >= min_count)
        .select(
            F.split_part(F.col("bg"), F.lit("\x01"), F.lit(1)).alias("w1"),
            F.split_part(F.col("bg"), F.lit("\x01"), F.lit(2)).alias("w2"),
            "n_ab",
        )
    )
    unigrams = (
        words.select(F.explode("ws").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("n_w"))
    )
    totals = words.select(
        F.sum(F.size("ws")).alias("n_words"),
        F.sum(F.greatest(F.size("ws") - 1, F.lit(0))).alias("n_bigrams"),
    )
    u1 = unigrams.select(F.col("w").alias("w1"), F.col("n_w").alias("n_a"))
    u2 = unigrams.select(F.col("w").alias("w2"), F.col("n_w").alias("n_b"))
    out = (
        bigrams.join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(totals))
        .select(
            "w1",
            "w2",
            "n_ab",
            F.log(
                (F.col("n_ab") / F.col("n_bigrams"))
                / ((F.col("n_a") / F.col("n_words")) * (F.col("n_b") / F.col("n_words")))
            ).alias("pmi"),
        )
    )
    if top_n is not None:
        out = out.orderBy(F.desc("pmi"), "w1", "w2").limit(top_n)
    return out


def zipf_fit(df: DataFrame, text_col: str) -> DataFrame:
    """Corpus rank-frequency power-law fit (Zipf's law): OLS of ln(count)
    on ln(rank) over the whole-vocabulary term histogram, returning one row
    (n_terms, n_tokens, slope, intercept, r2). A healthy natural-language
    corpus fits ln c ≈ intercept - s·ln r with s near 1 and r2 high;
    machine-generated or template-flooded corpora bend the curve — the
    classic one-glance corpus-health audit next to `word_entropy`'s
    per-document view.

    Scale shape: one shuffle builds the term histogram (map-side combined);
    the rank window then runs over VOCABULARY rows only, which Heaps' law
    keeps sublinear in corpus size (~O(N^0.5) types for N tokens), and the
    OLS is a single scalar aggregation of that. The corpus itself is
    scanned once and never re-shuffled."""
    counts = (
        df.select(F.explode(words_col(F.col(text_col))).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("c"))
    )
    ranked = counts.select(
        F.row_number()
        .over(Window.orderBy(F.desc("c"), F.asc("term")))
        .alias("r"),
        "c",
    ).select(
        F.log(F.col("r").cast("double")).alias("x"),
        F.log(F.col("c").cast("double")).alias("y"),
        "c",
    )
    corr = F.corr("x", "y")
    return ranked.agg(
        F.count("*").alias("n_terms"),
        F.sum("c").alias("n_tokens"),
        (F.covar_pop("x", "y") / F.var_pop("x")).alias("slope"),
        (F.avg("y") - F.covar_pop("x", "y") / F.var_pop("x") * F.avg("x")).alias(
            "intercept"
        ),
        (corr * corr).alias("r2"),
    )


def term_keyness(
    df: DataFrame,
    text_col: str,
    slice_col: str,
    top_n: int = 10,
    min_count: int = 5,
) -> DataFrame:
    """Distinctive terms per slice by log-likelihood keyness (Dunning's G²,
    the corpus-linguistics standard): for each (slice, term), compare the
    term's in-slice count ``a`` against its rest-of-corpus count ``b``
    under the null that the term is slice-independent; keep the ``top_n``
    OVERREPRESENTED terms (a·n2 > b·n1 — exact integer test) per slice.
    The "what vocabulary makes this source different" audit that TF-IDF
    (per-document) and PMI (per-bigram) don't answer.

    Scale shape: one corpus shuffle to (slice, term) counts; term totals
    and slice totals are re-aggregations of THAT table (vocabulary- and
    slice-sized, broadcast-eligible under AQE) joined back; the G² scalar
    math is map-only and the final top-k window partitions by slice over
    vocabulary-sized rows."""
    terms = df.select(
        F.col(slice_col).alias("slice"),
        F.explode(words_col(F.col(text_col))).alias("term"),
    )
    a = terms.groupBy("slice", "term").agg(F.count("*").alias("a"))
    tot = a.groupBy("term").agg(F.sum("a").alias("t"))
    n1 = a.groupBy("slice").agg(F.sum("a").alias("n1"))
    big_n = a.agg(F.sum("a").alias("N"))
    j = (
        a.join(tot, "term")
        .join(F.broadcast(n1), "slice")
        .crossJoin(F.broadcast(big_n))
        .filter(F.col("t") >= min_count)
        .withColumn("b", F.col("t") - F.col("a"))
        .withColumn("n2", F.col("N") - F.col("n1"))
        # overrepresented in this slice only (exact integer comparison)
        .filter(F.col("a") * F.col("n2") > F.col("b") * F.col("n1"))
    )
    e1 = F.col("n1").cast("double") * F.col("t") / F.col("N")
    e2 = F.col("n2").cast("double") * F.col("t") / F.col("N")
    g2 = 2.0 * (
        F.col("a") * F.log(F.col("a") / e1)
        + F.when(
            F.col("b") > 0, F.col("b") * F.log(F.col("b") / e2)
        ).otherwise(F.lit(0.0))
    )
    w = Window.partitionBy("slice").orderBy(
        F.desc("g2"), F.asc("term")
    )
    return (
        j.withColumn("g2", g2)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= top_n)
        .select("slice", "rk", "term", "a", "t", "g2")
    )


def vocab_divergence(
    df: DataFrame,
    text_col: str,
    slice_col: str,
) -> DataFrame:
    """Pairwise Jensen-Shannon divergence (base 2, so 0 = identical and
    1 = disjoint) between the unigram distributions of every pair of
    slices — the "which sources are interchangeable vs genuinely
    different" audit that complements psi_drift (numeric, vs one
    reference slice) and term_keyness (per-term, not whole-distribution).

    Sparse-exact decomposition: with M = (P+Q)/2,
      KL(P||M) = sum_{common} p*ln(2p/(p+q)) + ln2 * (1 - sum_{common} p)
    because every P-only term contributes p*ln(p/(p/2)) = p*ln2 — so only
    the INTERSECTION of the two vocabularies is ever joined; the disjoint
    mass enters through the common-probability sums.

    Scale shape: one corpus shuffle to (slice, term) counts; the pair join
    is a vocabulary-keyed self-join whose per-term fan-out is bounded by
    the number of slices (sources are few — the output is C(S,2) rows);
    nothing corpus-sized crosses it."""
    a = (
        df.select(
            F.col(slice_col).alias("s"),
            F.explode(words_col(F.col(text_col))).alias("term"),
        )
        .groupBy("s", "term")
        .agg(F.count("*").alias("c"))
    )
    # four consumers (n1, both sides of the term self-join via p, and the
    # grid through n1) — unpersisted, each would re-run the corpus
    # explode+count; persisted, the corpus is scanned exactly once and
    # everything downstream re-aggregates the vocabulary-sized table
    a = a.persist()
    n1 = a.groupBy("s").agg(F.sum("c").alias("n"))
    p = a.join(F.broadcast(n1), "s").select(
        "s", "term", "n", (F.col("c") / F.col("n")).alias("p")
    )
    x, y = p.alias("x"), p.alias("y")
    pairs = x.join(
        y,
        (F.col("x.term") == F.col("y.term")) & (F.col("x.s") < F.col("y.s")),
    ).select(
        F.col("x.s").alias("sa"),
        F.col("y.s").alias("sb"),
        F.col("x.n").alias("na"),
        F.col("y.n").alias("nb"),
        F.col("x.p").alias("p"),
        F.col("y.p").alias("q"),
    )
    ln2 = 0.6931471805599453
    agg = pairs.groupBy("sa", "sb").agg(
        F.count("*").alias("common_terms"),
        F.sum(F.col("p") * F.log(2.0 * F.col("p") / (F.col("p") + F.col("q")))).alias("klp"),
        F.sum(F.col("q") * F.log(2.0 * F.col("q") / (F.col("p") + F.col("q")))).alias("klq"),
        F.sum("p").alias("cpx"),
        F.sum("q").alias("cpy"),
    )
    # the pair GRID comes from the slice totals (slice-count-sized), not the
    # common-term join: a fully vocabulary-disjoint pair must still report
    # jsd = 1, not silently vanish from the audit
    ga, gb = n1.alias("ga"), n1.alias("gb")
    grid = ga.join(gb, F.col("ga.s") < F.col("gb.s")).select(
        F.col("ga.s").alias("sa"),
        F.col("gb.s").alias("sb"),
        F.col("ga.n").alias("na"),
        F.col("gb.n").alias("nb"),
    )
    filled = grid.join(agg, ["sa", "sb"], "left").select(
        "sa",
        "sb",
        "na",
        "nb",
        F.coalesce("common_terms", F.lit(0)).alias("common_terms"),
        F.coalesce("klp", F.lit(0.0)).alias("klp"),
        F.coalesce("klq", F.lit(0.0)).alias("klq"),
        F.coalesce("cpx", F.lit(0.0)).alias("cpx"),
        F.coalesce("cpy", F.lit(0.0)).alias("cpy"),
    )
    jsd_nats = 0.5 * (F.col("klp") + ln2 * (1.0 - F.col("cpx"))) + 0.5 * (
        F.col("klq") + ln2 * (1.0 - F.col("cpy"))
    )
    return filled.select(
        F.col("sa").alias("source_a"),
        F.col("sb").alias("source_b"),
        F.col("na").alias("n_tokens_a"),
        F.col("nb").alias("n_tokens_b"),
        F.col("common_terms"),
        (jsd_nats / ln2).alias("jsd"),
    )


def lexical_diversity(
    df: DataFrame,
    text_col: str,
    slice_col: str,
) -> DataFrame:
    """Per-slice lexical-diversity profile: token count, type (distinct
    term) count, type-token ratio, hapax-legomena share of the
    vocabulary, and Guiraud's index (types/√tokens — the
    length-compensated TTR). Low TTR + low hapax share = template/boiler
    text; the vocabulary-size twin of zipf_fit's shape audit.

    Scale shape: one corpus shuffle to (slice, term) counts; everything
    else is a slice-dimension re-aggregation of that vocabulary-sized
    table."""
    a = (
        df.select(
            F.col(slice_col).alias("slice"),
            F.explode(words_col(F.col(text_col))).alias("term"),
        )
        .groupBy("slice", "term")
        .agg(F.count("*").alias("c"))
    )
    return a.groupBy("slice").agg(
        F.sum("c").alias("n_tokens"),
        F.count("*").alias("n_types"),
        F.sum((F.col("c") == 1).cast("long")).alias("n_hapax"),
        (F.count("*") / F.sum("c")).alias("ttr"),
        (F.sum((F.col("c") == 1).cast("long")) / F.count("*")).alias("hapax_ratio"),
        (F.count("*") / F.sqrt(F.sum("c"))).alias("guiraud"),
    )


def heaps_fit(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Heaps'-law vocabulary-growth fit: OLS of ln(V) on ln(N) over the
    cumulative (tokens seen, distinct types seen) curve in ingestion
    order (ascending ``id_col``), returning one row (n_points, n_tokens,
    n_types, beta, intercept, r2). Natural text grows V ≈ k·N^β with
    β ≈ 0.4–0.6; template floods and de-duplicated corpora bend it — the
    ingestion-order twin of zipf_fit's rank-frequency audit.

    The cumulative distinct count V(i) comes from the first-occurrence
    trick: V(i) = #terms whose MIN containing doc ≤ i — one term-keyed
    shuffle, no distinct-counting window. The growth curve itself is a
    doc-dimension global-order window (fine at the dimension tier;
    at 10⁹ docs evaluate at K sampled boundaries instead — the OLS only
    needs points, not every prefix)."""
    d1 = df.select(F.col(id_col).alias("id"), words_col(F.col(text_col)).alias("ws"))
    docs = d1.select("id", F.size("ws").alias("dl"))
    first = (
        d1.select("id", F.explode(F.array_distinct("ws")).alias("term"))
        .groupBy("term")
        .agg(F.min("id").alias("fd"))
    )
    new_terms = first.groupBy(F.col("fd").alias("id")).agg(
        F.count("*").alias("nt")
    )
    w = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, 0)
    series = (
        docs.join(new_terms, "id", "left")
        .select("id", "dl", F.coalesce("nt", F.lit(0)).cast("long").alias("nt"))
        .withColumn("n_cum", F.sum("dl").over(w))
        .withColumn("v_cum", F.sum("nt").over(w))
        .filter((F.col("n_cum") > 0) & (F.col("v_cum") > 0))
        .select(
            "n_cum",
            "v_cum",
            F.log(F.col("n_cum").cast("double")).alias("x"),
            F.log(F.col("v_cum").cast("double")).alias("y"),
        )
    )
    corr = F.corr("x", "y")
    slope = F.covar_pop("x", "y") / F.var_pop("x")
    return series.agg(
        F.count("*").alias("n_points"),
        F.max("n_cum").alias("n_tokens"),
        F.max("v_cum").alias("n_types"),
        slope.alias("beta"),
        (F.avg("y") - slope * F.avg("x")).alias("intercept"),
        (corr * corr).alias("r2"),
    )


def window_pmi(
    df: DataFrame,
    text_col: str,
    window: int = 3,
    min_count: int = 5,
) -> DataFrame:
    """Skip-gram window collocations: PMI of unordered word pairs
    co-occurring within ``window`` positions (the word2vec-style context
    window) — catches "non-adjacent but bound" pairs that bigram_pmi's
    adjacency misses (verb…object, split collocations). Pairs are
    canonicalized (least, greatest); pmi = ln( (n_ab/N_pairs) /
    ((n_a/N_w)·(n_b/N_w)) ).

    Scale shape: pair generation is map-side (a bound transform over
    start offsets × a ≤window-element slice, same discipline as
    shingling — no UDF, never materialized outside the partial-aggregated
    groupBy); unigram counts and the two totals are vocabulary-sized and
    broadcast back."""
    from raptor_spark.functions import bind_col

    def _pairs(ws: Column) -> Column:
        return F.flatten(
            F.transform(
                ws,
                lambda x, i: F.transform(
                    F.slice(ws, i + 2, window),
                    lambda y: F.concat_ws(
                        "\x01", F.least(x, y), F.greatest(x, y)
                    ),
                ),
            )
        )

    words = df.select(words_col(F.col(text_col)).alias("ws"))
    pairs = (
        words.select(F.explode(bind_col(F.col("ws"), _pairs)).alias("pr"))
        .groupBy("pr")
        .agg(F.count("*").alias("n_ab"))
        .filter(F.col("n_ab") >= min_count)
        .select(
            F.split_part(F.col("pr"), F.lit("\x01"), F.lit(1)).alias("w1"),
            F.split_part(F.col("pr"), F.lit("\x01"), F.lit(2)).alias("w2"),
            "n_ab",
        )
    )
    unigrams = (
        words.select(F.explode("ws").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("n_w"))
    )
    # per doc of length L: sum over positions of min(window, remaining)
    n_pairs_doc = F.aggregate(
        F.transform(
            F.col("ws"),
            lambda x, i: F.least(F.lit(window), F.size("ws") - i - 1),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    totals = words.select(
        F.sum(F.size("ws")).alias("n_words"),
        F.sum(n_pairs_doc).alias("n_pairs"),
    )
    u1 = unigrams.select(F.col("w").alias("w1"), F.col("n_w").alias("n_a"))
    u2 = unigrams.select(F.col("w").alias("w2"), F.col("n_w").alias("n_b"))
    return (
        pairs.join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(totals))
        .select(
            "w1",
            "w2",
            "n_ab",
            "n_a",
            "n_b",
            F.log(
                (F.col("n_ab") / F.col("n_pairs"))
                / (
                    (F.col("n_a") / F.col("n_words"))
                    * (F.col("n_b") / F.col("n_words"))
                )
            ).alias("pmi"),
        )
    )


def burrows_delta(
    df: DataFrame,
    text_col: str,
    slice_col: str,
    top_m: int = 30,
) -> DataFrame:
    """Burrows' Delta stylometric distance between every pair of slices:
    z-score each slice's relative frequency of the corpus's ``top_m``
    most frequent words (function words — the style carriers), then
    Delta(a,b) = mean |z_a − z_b| over those words. The classic
    authorship/stylometry measure: LOW delta = same "voice" (template or
    single generator behind two sources) even when content vocabulary
    (JSD) differs.

    Scale shape: one corpus shuffle to (slice, term) counts; the top-m
    word list, the slices × top-m frequency grid (zero-filled — an
    absent function word IS a style signal), the per-word cross-slice
    moments, and the pair join are all tiny (S·m rows)."""
    a = (
        df.select(
            F.col(slice_col).alias("s"),
            F.explode(words_col(F.col(text_col))).alias("term"),
        )
        .groupBy("s", "term")
        .agg(F.count("*").alias("c"))
        .persist()
    )
    n1 = a.groupBy("s").agg(F.sum("c").alias("n"))
    top = (
        a.groupBy("term")
        .agg(F.sum("c").alias("t"))
        .orderBy(F.desc("t"), F.asc("term"))
        .limit(top_m)
        .select("term")
    )
    grid = n1.crossJoin(F.broadcast(top))
    f = (
        grid.join(a, ["s", "term"], "left")
        .select(
            "s",
            "term",
            (F.coalesce("c", F.lit(0)) / F.col("n").cast("double")).alias("f"),
        )
    )
    stats = f.groupBy("term").agg(
        F.avg("f").alias("mu"), F.stddev_pop("f").alias("sd")
    )
    z = f.join(F.broadcast(stats), "term").select(
        "s",
        "term",
        F.when(F.col("sd") > 0, (F.col("f") - F.col("mu")) / F.col("sd"))
        .otherwise(F.lit(0.0))
        .alias("z"),
    )
    za = z.select(F.col("s").alias("sa"), "term", F.col("z").alias("z_a"))
    zb = z.select(F.col("s").alias("sb"), "term", F.col("z").alias("z_b"))
    return (
        za.join(zb, "term")
        .filter(F.col("sa") < F.col("sb"))
        .groupBy("sa", "sb")
        .agg(
            F.count("*").alias("n_words"),
            F.avg(F.abs(F.col("z_a") - F.col("z_b"))).alias("delta"),
        )
        .select(
            F.col("sa").alias("source_a"),
            F.col("sb").alias("source_b"),
            "n_words",
            "delta",
        )
    )


def sparse_more_like_this(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    max_df: int = 30,
) -> DataFrame:
    """Top-k most-similar documents per document by tf-idf cosine computed
    THROUGH the inverted index — the sparse-vector "more like this" read
    path: the dot product is a posting-list self-join on term (never a
    dense vector, never all-pairs on docs), the IR-side sibling of the
    embedding ANN family.

    ``max_df`` drops stop-terms from the index before the self-join — the
    standard MLT pruning, and the scale guard: a term in f docs expands to
    C(f, 2) pairs, so the join fan-out is bounded by C(max_df, 2) per term
    regardless of corpus size. Weights use the BM25+ idf (term_stats), so
    every pruned posting keeps a positive weight.

    Ranking windows order by the ROUNDED cosine (6 dp) with id tie-breaks,
    so both engines rank identical values identically."""
    from pyspark.sql import Window

    posts = doc_terms(df, id_col, text_col)
    stats = term_stats(df, id_col, text_col).filter(F.col("df") <= max_df)
    w = (
        posts.join(F.broadcast(stats.select("term", "idf")), "term")
        .select("id", "term", (F.col("tf") * F.col("idf")).alias("w"))
        .persist()
    )
    norms = w.groupBy("id").agg(
        F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm")
    )
    dots = (
        w.alias("x")
        .join(w.alias("y"), "term")
        .filter(F.col("x.id") < F.col("y.id"))
        .groupBy(F.col("x.id").alias("a"), F.col("y.id").alias("b"))
        .agg(F.sum(F.col("x.w") * F.col("y.w")).alias("dot"))
    )
    sym = dots.unionByName(
        dots.select(
            F.col("b").alias("a"), F.col("a").alias("b"), "dot"
        )
    )
    cos = (
        sym.join(
            norms.select(F.col("id").alias("a"), F.col("nrm").alias("na")), "a"
        )
        .join(norms.select(F.col("id").alias("b"), F.col("nrm").alias("nb")), "b")
        .select(
            "a",
            "b",
            F.round(F.col("dot") / (F.col("na") * F.col("nb")), 6).alias("cos"),
        )
    )
    wnd = Window.partitionBy("a").orderBy(F.desc("cos"), F.asc("b"))
    return (
        cos.withColumn("rk", F.row_number().over(wnd))
        .filter(F.col("rk") <= k)
        .select(F.col("a").alias("id"), F.col("b").alias("neighbor"), "cos", "rk")
    )


def ndcg_at_k(
    scored: DataFrame,
    rel_col: str = "rel",
    score_col: str = "score",
    id_col: str = "id",
    ks: tuple[int, ...] = (5, 10, 20),
) -> DataFrame:
    """(k, dcg, idcg, ndcg) retrieval-quality rows: NDCG@k of the system
    ranking (score_col desc, id asc — callers pass a PRE-ROUNDED score so
    the rank order is rounding-stable across engines) against integer
    relevance grades in rel_col. The graded twin of the binary ROC-AUC
    audit (reference analog: the search read path's ranked output,
    api_document_search_with_cache.py:157-237, scored against labels).

    Exactness discipline: gains 2^rel − 1 are computed with an integer
    shift (never pow — the Math.pow 1-ulp pitfall), position discounts are
    the only float op (gain / log2(rank+1)), and both rankings tie-break
    on id, so the ranked PREFIX is engine-independent and the sum has
    ≤ max(ks) terms.

    Scale shape: the two top-max(ks) prefixes come from orderBy().limit()
    — TakeOrderedAndProject, a per-partition bounded priority queue merged
    on the driver, NEVER a global single-partition window over the scored
    set. The window that assigns ranks runs over ≤ max(ks) rows."""
    kmax = max(ks)
    spark = scored.sparkSession
    ks_df = spark.createDataFrame([(int(k),) for k in sorted(ks)], "k int")
    gain = (
        F.expr(f"shiftleft(CAST(1 AS BIGINT), {rel_col})") - F.lit(1)
    ).cast("double")

    def _prefix_dcg(order_cols: list, out_name: str) -> DataFrame:
        top = scored.orderBy(*order_cols).limit(kmax)
        w = Window.orderBy(*order_cols)
        ranked = top.select(
            gain.alias("g"), F.row_number().over(w).alias("r")
        )
        return (
            ranked.crossJoin(F.broadcast(ks_df))
            .filter(F.col("r") <= F.col("k"))
            .groupBy("k")
            .agg(
                F.sum(
                    F.col("g") / F.log2(F.col("r").cast("double") + F.lit(1.0))
                ).alias(out_name)
            )
        )
    dcg = _prefix_dcg([F.desc(score_col), F.asc(id_col)], "dcg")
    idcg = _prefix_dcg([F.desc(rel_col), F.asc(id_col)], "idcg")
    return (
        dcg.join(idcg, "k")
        .select(
            "k", "dcg", "idcg",
            F.when(F.col("idcg") > 0, F.col("dcg") / F.col("idcg"))
            .otherwise(F.lit(0.0))
            .alias("ndcg"),
        )
        .orderBy("k")
    )


def rank_eval_binary(
    scored: DataFrame,
    query_col: str,
    rel_col: str,
    score_col: str,
    id_col: str,
    k: int = 20,
) -> DataFrame:
    """Per-query binary retrieval metrics — MRR and AP@k, the binary
    companions of the graded ndcg_at_k (together they are the standard
    search-eval triad): for each query, rank candidates by
    (score desc, id asc — pass a PRE-ROUNDED or integer score so the
    prefix is engine-stable), then
      first_hit_rank = rank of the first relevant candidate in the top-k
                       (NULL if none),
      rr             = 1/first_hit_rank (0.0 if no hit — the MRR term),
      ap             = Σ_{hits at rank r ≤ k} (hits≤r)/r ÷ min(n_rel, k)
                       (0.0 when the query has no relevant candidates).

    Exactness: ranks and hit counts are integers from a per-query window
    (partition size = that query's candidate set — the caller bounds it);
    rr/ap are ≤ k-term double sums rounded to 6 (the dcg discipline).
    One query-key shuffle; n_rel is a map-side-combinable count joined
    back on the query key."""
    base = scored.select(
        F.col(query_col).alias("q"),
        F.col(id_col).alias("id"),
        F.col(score_col).alias("s"),
        (F.col(rel_col) > 0).cast("int").alias("hit"),
    )
    n_rel = base.groupBy("q").agg(F.sum("hit").cast("long").alias("n_rel"))
    w = Window.partitionBy("q").orderBy(F.desc("s"), F.asc("id"))
    ranked = base.select(
        "q", "hit", F.row_number().over(w).alias("r")
    ).filter(F.col("r") <= k)
    wc = Window.partitionBy("q").orderBy("r")
    cum = ranked.withColumn("ch", F.sum("hit").over(wc))
    per = cum.groupBy("q").agg(
        F.min(F.when(F.col("hit") == 1, F.col("r"))).alias("first_hit_rank"),
        F.sum(
            F.when(F.col("hit") == 1, F.col("ch") / F.col("r")).otherwise(0.0)
        ).alias("ap_num"),
    )
    out = n_rel.join(per, "q", "left")
    denom = F.least(F.col("n_rel"), F.lit(k).cast("long"))
    return out.select(
        F.col("q").alias(query_col),
        "n_rel",
        "first_hit_rank",
        F.round(
            F.coalesce(1.0 / F.col("first_hit_rank"), F.lit(0.0)), 6
        ).alias("rr"),
        F.round(
            F.when(denom > 0, F.coalesce(F.col("ap_num"), F.lit(0.0)) / denom)
            .otherwise(F.lit(0.0)),
            6,
        ).alias("ap"),
    )


def item_item_topk(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    k: int = 3,
    min_co: int = 2,
) -> DataFrame:
    """Item-item collaborative filtering — per item, the top-k most
    similar items by binary cosine over co-purchase baskets:
    cos(a, b) = co(a,b)/√(n_a·n_b) with co = baskets containing both
    and n_x = baskets containing x. The actual recommender read beside
    basket_lift's association test (lift asks "is this pair surprising";
    this asks "what do I put in the carousel"). All counts exact BIGINT
    from distinct (basket, item) rows; the cosine is one division (the
    n_a·n_b product computed in double — BIGINT would overflow at
    web-scale basket counts); ranks decided on the identical unrounded
    double, ties by item id.

    Shape: one distinct shuffle, one basket-keyed self-join (per-basket
    fan-out bounded by basket size, AQE skew-split for hot baskets),
    min_co pruning before the per-item top-k windows."""
    bi = df.select(
        F.col(basket_col).alias("b"), F.col(item_col).alias("i")
    ).distinct().localCheckpoint()
    n = bi.groupBy("i").agg(F.count("*").cast("long").alias("n"))
    co = (
        bi.join(bi.select(F.col("b"), F.col("i").alias("j")), "b")
        .filter(F.col("i") < F.col("j"))
        .groupBy("i", "j")
        .agg(F.count("*").cast("long").alias("co"))
        .filter(F.col("co") >= min_co)
    )
    sym = co.unionByName(
        co.select(F.col("j").alias("i"), F.col("i").alias("j"), "co")
    )
    scored = (
        sym.join(n.select(F.col("i"), F.col("n").alias("n_i")), "i")
        .join(n.select(F.col("i").alias("j"), F.col("n").alias("n_j")), "j")
        .select(
            "i",
            "j",
            "co",
            (
                F.col("co")
                / F.sqrt(F.col("n_i").cast("double") * F.col("n_j").cast("double"))
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("i").orderBy(F.desc("cos"), F.asc("j"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )
