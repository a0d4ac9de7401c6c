"""Text-analysis operators for training-data pipelines: language id, quality
scoring, token counting, document fingerprinting — all pure column
expressions (whole-stage-codegen friendly; no UDF in any hot path).

These generalize the reference's per-chunk text bookkeeping: char_count /
element_types enrichment (document_analysis.py:171-184), token estimation by
regex (document_summary.py:20-27: CJK chars ×1.5 + words ×1.3), and the
confidence-threshold label filters (SURVEY.md §2.2).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from raptor_spark.functions import bind_col

# Tiny per-language stopword lexicons for the n-gram/stopword-vote heuristic.
STOPWORDS = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "for", "with", "a"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "von"),
    "fr": ("le", "la", "les", "et", "est", "pas", "pour", "que", "une", "dans"),
    "es": ("el", "la", "los", "y", "es", "no", "por", "que", "una", "en"),
}


def words_col(text: Column) -> Column:
    return F.filter(F.split(F.lower(F.trim(text)), r"\s+"), lambda w: w != "")


def token_count_col(text: Column) -> Column:
    """Whitespace token count + a CJK adjustment — the reference's estimator
    (document_summary.py:20-27): CJK chars count ×1.5, latin words ×1.3."""
    cjk = F.length(F.regexp_replace(text, r"[^一-鿿]", ""))
    words = F.size(words_col(text))
    return F.ceil(cjk * 1.5 + words * 1.3).cast("long")


def bpe_ish_token_count_col(text: Column) -> Column:
    """Sub-word-ish count: splits on whitespace AND punctuation AND
    camel-case boundaries — a deterministic BPE stand-in."""
    s = F.regexp_replace(text, r"([a-z])([A-Z])", r"$1 $2")
    s = F.regexp_replace(s, r"[^\w\s]+", " ")
    return F.size(F.filter(F.split(F.lower(s), r"\s+"), lambda w: w != "")).cast("long")


def char_pair_counts(df: DataFrame, text_col: str) -> DataFrame:
    """(pair, n_occ): corpus-wide adjacent-character-pair frequencies
    weighted by word frequency — the candidate table of the FIRST BPE merge
    step (tokenizer vocabulary induction over a training corpus). Highest
    n_occ = the pair a BPE trainer would merge first.

    Scale shape: the corpus collapses to its word-frequency table first
    (vocabulary-sized — orders of magnitude smaller than the token stream),
    and the quadratic-ish pair expansion runs over that small table, not
    the corpus: one corpus shuffle (word counts) + one vocabulary-sized
    shuffle (pair counts). Pairs are substrings, built by a JVM-side
    transform over start offsets — no UDF."""
    wf = (
        df.select(F.explode(words_col(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c"))
        .filter(F.length("w") >= 2)
    )
    pairs = wf.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("w") - 1),
                lambda i: F.col("w").substr(i, F.lit(2)),
            )
        ).alias("pair"),
        "c",
    )
    return pairs.groupBy("pair").agg(F.sum("c").alias("n_occ"))


def stopword_ratio_col(text: Column, lang: str = "en") -> Column:
    stops = F.array(*[F.lit(s) for s in STOPWORDS[lang]])
    # bind the split array once per row (HOF lambdas get no CSE)
    return bind_col(
        words_col(text),
        lambda w: F.size(F.filter(w, lambda x: F.array_contains(stops, x)))
        / F.greatest(F.size(w), F.lit(1)),
    )


def quality_score_col(text: Column) -> Column:
    """Composite [0,1] quality score: length band + punctuation sanity +
    mean word length band + non-alpha ratio. Deterministic, lexicon-free."""
    n_chars = F.length(text)
    w = words_col(text)
    n_words = F.greatest(F.size(w), F.lit(1))
    mean_wl = n_chars / n_words
    punct = F.length(F.regexp_replace(text, r"[^\.,;:!?]", ""))
    punct_ratio = punct / F.greatest(n_chars, F.lit(1))
    non_alnum = F.length(F.regexp_replace(text, r"[\w\s]", ""))
    non_alnum_ratio = non_alnum / F.greatest(n_chars, F.lit(1))
    len_band = F.when((n_chars >= 20) & (n_chars <= 100000), 1.0).otherwise(0.3)
    wl_band = F.when((mean_wl >= 3.0) & (mean_wl <= 12.0), 1.0).otherwise(0.4)
    punct_band = F.when(punct_ratio <= 0.2, 1.0).otherwise(0.5)
    sym_band = F.when(non_alnum_ratio <= 0.3, 1.0).otherwise(0.2)
    return F.round((len_band + wl_band + punct_band + sym_band) / 4.0, 6)


def langid_scores(df: DataFrame, text_col: str) -> DataFrame:
    """Stopword-vote language id: per language, hits per word; predicted =
    argmax (ties → lexicographic). Adds ``lang_pred`` and per-lang scores.

    All per-language scores are computed from ONE bound word array per row
    (a withColumn per language inlined the regex split into every score)."""

    def _counter(arr: Column):
        return lambda x: F.array_contains(arr, x)

    def _scores(w: Column) -> Column:
        n = F.greatest(F.size(w), F.lit(1))
        return F.struct(
            *[
                (
                    F.size(
                        F.filter(w, _counter(F.array(*[F.lit(s) for s in stops])))
                    )
                    / n
                ).alias(f"score_{lang}")
                for lang, stops in STOPWORDS.items()
            ]
        )

    out = df.withColumn("_scores", bind_col(words_col(F.col(text_col)), _scores))
    for lang in STOPWORDS:
        out = out.withColumn(f"score_{lang}", F.col(f"_scores.score_{lang}"))
    out = out.drop("_scores")
    best = F.greatest(*[F.col(f"score_{lang}") for lang in STOPWORDS])
    pred = F.lit(None).cast("string")
    for lang in sorted(STOPWORDS):  # first lexicographic winner takes ties
        pred = F.coalesce(pred, F.when(F.col(f"score_{lang}") == best, F.lit(lang)))
    return out.withColumn("lang_pred", F.when(best > 0, pred).otherwise(F.lit("und")))


def chunk_by_token_budget(
    df: DataFrame,
    id_col: str,
    text_col: str,
    budget: int = 100,
    sentence_regex: str = r"[.!?]+\s+",
) -> DataFrame:
    """The reference's greedy token-budget chunker (txt_processor.py:55-127)
    as a pure DataFrame op: split text into sentences, pack consecutive
    sentences into chunks whose cumulative word count stays ≤ budget (an
    oversize sentence gets its own chunk), return one row per chunk with its
    text re-assembled in order.

    Plan shape: posexplode → window cumsum within the document → group-id by
    floor((cumsum - size)/budget) (same trick as relational.budget_groups) →
    groupBy(doc, chunk) with an order-preserving sorted-struct concat. One
    shuffle on (id, chunk); whole-stage codegen throughout.
    """
    from pyspark.sql.window import Window

    sent = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.col(text_col), sentence_regex)).alias("pos", "sentence"),
    ).filter(F.trim(F.col("sentence")) != "")
    sent = sent.withColumn("n_tokens", F.size(words_col(F.col("sentence"))))
    w = (
        Window.partitionBy("id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sent = sent.withColumn(
        "chunk_id",
        F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens")) / budget).cast("int"),
    )
    return (
        sent.groupBy("id", "chunk_id")
        .agg(
            F.count("*").alias("n_sentences"),
            F.sum("n_tokens").alias("chunk_tokens"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "sentence"))),
                    lambda s: s.sentence,
                ),
                " ",
            ).alias("chunk_text"),
        )
    )


def sliding_chunks(
    df: DataFrame, id_col: str, text_col: str, size: int = 128, stride: int = 64
) -> DataFrame:
    """Overlapping fixed-stride token windows — the context-packing
    complement of chunk_by_token_budget (which packs disjoint
    sentence-aligned chunks): chunk c covers words [c·stride, c·stride+size),
    so with stride < size every token lands in ~size/stride chunks. This is
    how LLM training pipelines window long documents into model contexts
    and how RAG indexes overlap chunks to avoid boundary-split answers.

    Map-only: the word array is bound once per row, chunk starts come from
    one computed index sequence, each chunk is an array slice — no shuffle,
    no UDF; a 100 TB corpus chunks at scan speed."""
    from raptor_spark.functions import bind_col

    def build(w: Column) -> Column:
        n = F.size(w)
        n_chunks = F.when(n <= size, F.lit(1)).otherwise(
            F.ceil((n - size) / F.lit(float(stride))).cast("int") + 1
        )
        return F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda c: F.struct(
                c.alias("chunk_idx"),
                F.slice(w, c * stride + 1, size).alias("cw"),
            ),
        )

    chunks = df.select(
        F.col(id_col).alias("id"),
        F.explode(bind_col(words_col(F.col(text_col)), build)).alias("ch"),
    )
    return chunks.select(
        "id",
        F.col("ch.chunk_idx").alias("chunk_idx"),
        F.size("ch.cw").cast("long").alias("n_tokens"),
        F.array_join("ch.cw", " ").alias("chunk_text"),
    )


def term_contexts(
    df: DataFrame,
    id_col: str,
    text_col: str,
    terms: list[str],
    window: int = 3,
) -> DataFrame:
    """(id, pos, left_ctx, term, right_ctx): keyword-in-context concordance
    — one row per mention of a watched term, with the ``window`` words on
    each side as the evidence a reviewer (or a downstream tagger) reads.
    The mention-detection face of the reference's per-object concept
    tagging (content_understanding_service), batched: the term list is a
    tiny literal IN-filter, so Catalyst folds it into the scan side.

    Scale shape: one posexplode of the word array (the corpus's token
    count — the same explode every postings/TF-IDF op pays), the IN filter
    prunes before anything wide survives, and the context slices are
    per-row array ops; no join, no shuffle beyond the explode."""
    base = df.select(
        F.col(id_col).alias("id"), words_col(F.col(text_col)).alias("ws")
    )
    ex = base.select("id", "ws", F.posexplode("ws").alias("p", "term"))
    hit = ex.filter(F.col("term").isin(list(terms)))
    i = F.col("p") + 1  # 1-based word index
    start = F.greatest(F.lit(1), i - window)
    return hit.select(
        "id",
        i.cast("long").alias("pos"),
        F.array_join(F.slice("ws", start, i - start), " ").alias("left_ctx"),
        "term",
        F.array_join(F.slice("ws", i + 1, F.lit(window)), " ").alias("right_ctx"),
    )


def clean_cell_col(text: Column) -> Column:
    """Cell text cleaning (office_processor.py:382-389): collapse whitespace,
    escape pipe — pure regexp_replace chain."""
    return F.regexp_replace(
        F.regexp_replace(F.trim(text), r"\s+", " "), r"\|", r"\\|"
    )


def markdown_table_col(headers: Column, rows: Column) -> Column:
    """Markdown table render (csv_xlsx_processor.py:310-348): headers +
    ``---`` separator + escaped cells; null cells → ``-``. headers:
    array<string>, rows: array<array<string>>."""
    def fmt_row(cells: Column) -> Column:
        return F.concat(
            F.lit("| "),
            F.array_join(
                F.transform(cells, lambda c: clean_cell_col(F.coalesce(c, F.lit("-")))),
                " | ",
            ),
            F.lit(" |"),
        )

    sep = F.concat(
        F.lit("|"),
        F.array_join(F.transform(headers, lambda _: F.lit(" --- ")), "|"),
        F.lit("|"),
    )
    body = F.array_join(F.transform(rows, fmt_row), "\n")
    return F.concat_ws("\n", fmt_row(headers), sep, body)


def fingerprint_col(text: Column, n_grams: int = 4) -> Column:
    """Document fingerprint: xxhash64 of the winnowed shingle min — a cheap
    rolling-hash fingerprint (content-derived, stable across partitions)."""
    def _shingles(w: Column) -> Column:
        return F.when(
            F.size(w) >= n_grams,
            F.transform(
                F.sequence(F.lit(0), F.size(w) - n_grams),
                lambda i: F.xxhash64(F.concat_ws(" ", F.slice(w, i + 1, n_grams))),
            ),
        ).otherwise(F.array(F.xxhash64(F.concat_ws(" ", w))))

    # bind: inlining the split into the per-position slice re-ran the regex
    # split O(n_words) times per row
    return F.array_min(bind_col(words_col(text), _shingles))


def ngrams_col(text: Column, n: int = 2) -> Column:
    """ALL word n-grams (with multiplicity) as array<string> — the counting
    twin of dedup.word_shingles_col's distinct set. Pure column exprs; the
    split-word array is bound once per row (HOF lambdas get no CSE)."""

    def build(w: Column) -> Column:
        def gram_at(i: Column) -> Column:
            return F.concat_ws(
                " ", *[F.element_at(w, i + F.lit(k + 1)) for k in range(n)]
            )

        return F.when(
            F.size(w) >= n,
            F.transform(F.sequence(F.lit(0), F.size(w) - n), gram_at),
        ).otherwise(F.array(F.concat_ws(" ", w)))

    return bind_col(words_col(text), build)


def repetition_stats(
    df: DataFrame, id_col: str, text_col: str, n: int = 2, max_dup_frac: float = 0.2
) -> DataFrame:
    """Gopher-style intra-document repetition audit: the duplicate fraction
    of word n-grams per document, plus the keep/drop verdict at
    ``max_dup_frac`` (documents dominated by repeated phrases are template
    boilerplate, not content — the classic pretraining-corpus quality rule).

    Map-only: two narrow projections, no shuffle, no UDF; the n-gram array
    lives only inside the row's projection. The verdict compares the
    ROUNDED fraction so engine-identical rounding decides the boundary."""
    g = ngrams_col(F.col(text_col), n)
    tmp = df.select(F.col(id_col).alias("id"), g.alias("_g"))
    out = tmp.select(
        "id",
        F.size("_g").alias("n_ngrams"),
        F.size(F.array_distinct("_g")).alias("n_distinct"),
    )
    dup = F.round(1.0 - F.col("n_distinct") / F.col("n_ngrams"), 6)
    return out.withColumn("dup_frac", dup).withColumn(
        "keep", (F.col("dup_frac") <= max_dup_frac).cast("int")
    )


def compression_quality(
    df: DataFrame,
    id_col: str,
    text_col: str,
    lo: float = 0.30,
    hi: float = 0.95,
    level: int = 6,
) -> DataFrame:
    """(id, n_bytes, n_compressed, ratio, keep): zlib compression ratio as
    a text-quality signal (the CCNet/Gopher-family filter the pure column
    expressions can't express): boilerplate/template spam compresses far
    below ``lo``, garbled or binary-ish text barely compresses (above
    ``hi``), and natural prose sits between. keep = lo ≤ ratio ≤ hi;
    empty/null text gets ratio 1.0 (kept only if hi ≥ 1).

    This is the repo's one deliberate Python-path curation operator —
    zlib has no SQL equivalent — so it follows the extraction discipline:
    Arrow-batched ``mapInPandas`` (never row-at-a-time), executor-local
    import, only (id, text) crosses into Python, and the output is
    column-pruned to the five scalars. Deterministic for a fixed zlib
    level, so the pytest gate recomputes it in-process and compares
    exactly (rows-only at the driver: DuckDB has no zlib)."""
    import pandas as pd

    out_schema = (
        "id long, n_bytes long, n_compressed long, ratio double, keep boolean"
    )

    def fn(batches):
        import zlib

        for pdf in batches:
            raw = [
                t.encode("utf-8") if isinstance(t, str) else b""
                for t in pdf[text_col]
            ]
            nb = [len(x) for x in raw]
            nc = [len(zlib.compress(x, level)) for x in raw]
            ratio = [c / n if n else 1.0 for c, n in zip(nc, nb)]
            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    "n_bytes": nb,
                    "n_compressed": nc,
                    "ratio": ratio,
                    "keep": [lo <= r <= hi for r in ratio],
                }
            )

    return df.select(id_col, text_col).mapInPandas(fn, out_schema)


def word_entropy(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document unigram Shannon entropy + type-token ratio — the
    Gopher-style repetition/diversity quality signals (Rae et al. 2021
    §A1.1: low word entropy = template/boilerplate, high = diverse prose;
    the reference's model-based quality scoring replaced by its classic
    statistical core). H = ln(n) - (Σ c·ln c)/n over per-doc word counts c
    (identical algebra on both engines — no p·ln p division per term, so
    the only float ops are ln of INTEGER counts and one fused sum).

    Scale shape: explode → ONE (id, word) hash aggregate (map-side
    combinable; keys bounded by Σ per-doc distinct words) → ONE id
    aggregate. No joins, no broadcast, two shuffles on content-derived
    keys; partition-count invariant."""
    wc = (
        df.select(F.col(id_col).alias("id"), F.explode(words_col(F.col(text_col))).alias("w"))
        .groupBy("id", "w")
        .agg(F.count("*").alias("c"))
    )
    return wc.groupBy("id").agg(
        F.sum("c").cast("long").alias("n_words"),
        F.count("*").cast("long").alias("n_distinct"),
        F.round(
            F.log(F.sum("c")) - F.sum(F.col("c") * F.log("c")) / F.sum("c"), 4
        ).alias("entropy"),
        F.round(F.count("*") / F.sum("c"), 4).alias("ttr"),
    )


def bpe_train(
    df: DataFrame, text_col: str, n_merges: int = 8, return_vocab: bool = False
) -> DataFrame | tuple[DataFrame, DataFrame]:
    """Classic BPE merge training (Sennrich et al. 2016) over the corpus:
    start from characters within words, repeat ``n_merges`` times: count
    adjacent symbol pairs weighted by word frequency, merge the most
    frequent pair (ties: lexicographic) greedily left-to-right everywhere.
    Returns the merge table (rank, left, right, merged, pair_count) — the
    tokenizer-training artifact an LLM data pipeline derives from its own
    corpus before token-budget accounting. With ``return_vocab=True`` also
    returns the post-merge vocabulary (w, wc, toks) — the applied tokenizer
    (a word's token count after training is ``size(toks)``), which
    `bpe_compression` joins back onto per-slice word counts.

    Scale shape: ONE corpus-sized shuffle builds the word-frequency table;
    every merge round then runs on the VOCABULARY (Heaps-sublinear in
    corpus size) — an explode/sum pair count, a 1-row driver collect of
    the argmax (count desc, pair asc), and a map-only greedy fold
    (F.aggregate) applying the merge. Each round's table is persisted so
    round k+1 doesn't re-fold rounds 1..k; integer counts end-to-end, so
    results are bit-exact on any engine."""
    vocab = (
        df.select(F.explode(words_col(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("wc"))
        .select(
            "w",
            "wc",
            F.expr(
                "transform(sequence(1, length(w)), i -> substring(w, i, 1))"
            ).alias("toks"),
        )
        .persist()
    )

    merges = []
    cur = vocab
    spark = df.sparkSession
    for rank in range(1, n_merges + 1):
        pairs = (
            cur.select(
                "wc",
                F.explode(
                    F.when(
                        F.size("toks") >= 2,
                        F.expr(
                            "transform(sequence(1, size(toks) - 1),"
                            " i -> struct(toks[i - 1] AS l, toks[i] AS r))"
                        ),
                    ).otherwise(F.expr("array()"))
                ).alias("p"),
            )
            .groupBy("p")
            .agg(F.sum("wc").alias("c"))
            .orderBy(F.desc("c"), F.asc("p.l"), F.asc("p.r"))
        )
        top = pairs.first()
        if top is None:
            break
        left, right, cnt = top.p.l, top.p.r, top.c
        merged = left + right
        merges.append((rank, left, right, merged, int(cnt)))
        nxt = cur.select(
            "w",
            "wc",
            F.aggregate(
                "toks",
                F.array().cast("array<string>"),
                lambda acc, x: F.when(
                    (F.size(acc) > 0)
                    & (F.element_at(acc, -1) == F.lit(left))
                    & (x == F.lit(right)),
                    F.concat(
                        F.slice(acc, F.lit(1), F.size(acc) - 1),
                        F.array(F.lit(merged)),
                    ),
                ).otherwise(F.concat(acc, F.array(x))),
            ).alias("toks"),
        ).persist()
        nxt.count()  # materialize before unpersisting the parent
        cur.unpersist()
        cur = nxt
    merges_df = spark.createDataFrame(
        merges, "rank int, left string, right string, merged string, pair_count bigint"
    )
    if return_vocab:
        # truncate the 8-round fold lineage so the vocab stays computable
        # (and cheap) after its cache is released
        final = cur.localCheckpoint(eager=True)
        cur.unpersist()
        return merges_df, final
    cur.unpersist()
    return merges_df


def bpe_compression(
    df: DataFrame, text_col: str, slice_col: str, n_merges: int = 8
) -> DataFrame:
    """Apply the corpus-trained BPE merges back to the corpus and report
    per-slice tokenizer efficiency: (slice, n_words, n_chars, n_tokens,
    tokens_per_word, compression = n_tokens / n_chars). A slice whose
    compression stays near 1 is text the tokenizer barely helps —
    out-of-distribution vs the training corpus (the practical signal for
    "this source needs its own vocab / is garbage").

    Scale shape: merges train globally (`bpe_train`, vocab-sized rounds);
    the apply is ONE corpus shuffle to (slice, word) counts, then a
    vocabulary-sized join against the post-merge vocab — per-word token
    counts ride the join; the corpus itself is never refolded."""
    merges, vocab = bpe_train(df, text_col, n_merges, return_vocab=True)
    per_slice = (
        df.select(
            F.col(slice_col).alias("slice"),
            F.explode(words_col(F.col(text_col))).alias("w"),
        )
        .groupBy("slice", "w")
        .agg(F.count("*").alias("wc"))
    )
    joined = per_slice.join(
        vocab.select("w", F.size("toks").alias("n_toks")), "w"
    )
    out = joined.groupBy("slice").agg(
        F.sum("wc").alias("n_words"),
        F.sum(F.col("wc") * F.length("w")).alias("n_chars"),
        F.sum(F.col("wc") * F.col("n_toks")).alias("n_tokens"),
        (F.sum(F.col("wc") * F.col("n_toks")) / F.sum("wc")).alias(
            "tokens_per_word"
        ),
        (
            F.sum(F.col("wc") * F.col("n_toks"))
            / F.sum(F.col("wc") * F.length("w"))
        ).alias("compression"),
    )
    return out


def greedy_bigram_generate(
    df: DataFrame,
    group_col: str,
    text_col: str,
    steps: int = 8,
) -> DataFrame:
    """Deterministic greedy decoding from the corpus bigram model — the
    generation face of curation.lm_perplexity's scoring: per group, seed
    with the group's most frequent unigram, then repeatedly emit
    argmax_c count(prev, ·) for ``steps`` steps (ties break to the
    lexicographically smallest token on BOTH engines, counts are exact
    integers, so an unrolled SQL oracle replays the walk exactly).
    Immediate self-repetition (w → w) is excluded — the standard no-repeat
    decode constraint; without it greedy walks collapse onto one-token
    loops. A group whose walk hits a token with no observed continuation
    simply stops early. Output: (source, step, token), step 0 = the seed.

    Scale shape: the bigram count table is the only corpus-sized artifact
    (one explode + map-side-combinable groupBy, persisted once); each of
    the ``steps`` generation joins BROADCASTS the current frontier (one
    row per group) against it, so decoding costs ``steps`` map-only
    passes over the count table and no corpus re-scan."""
    from pyspark.sql import Window

    toks = df.select(
        F.col(group_col).alias("grp"), words_col(F.col(text_col)).alias("ws")
    )
    uni = (
        toks.select("grp", F.explode("ws").alias("w"))
        .groupBy("grp", "w")
        .agg(F.count("*").alias("c"))
    )
    big = (
        toks.filter(F.size("ws") >= 2)
        .select(
            "grp",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size("ws") - 2),
                    lambda i: F.struct(
                        F.element_at(F.col("ws"), i + 1).alias("w1"),
                        F.element_at(F.col("ws"), i + 2).alias("w2"),
                    ),
                )
            ).alias("bg"),
        )
        .select("grp", "bg.w1", "bg.w2")
        .groupBy("grp", "w1", "w2")
        .agg(F.count("*").alias("c"))
        .persist()
    )
    w_seed = Window.partitionBy("grp").orderBy(F.desc("c"), F.asc("w"))
    seed = (
        uni.withColumn("rn", F.row_number().over(w_seed))
        .filter(F.col("rn") == 1)
        .select("grp", F.col("w").alias("token"), F.lit(0).alias("step"))
    )
    w_next = Window.partitionBy("grp").orderBy(F.desc("c"), F.asc("w2"))
    frames = [seed]
    cur = seed
    for i in range(1, steps + 1):
        cur = (
            big.join(
                F.broadcast(cur.select("grp", F.col("token").alias("w1"))),
                ["grp", "w1"],
            )
            .filter(F.col("w2") != F.col("w1"))
            .withColumn("rn", F.row_number().over(w_next))
            .filter(F.col("rn") == 1)
            .select("grp", F.col("w2").alias("token"), F.lit(i).alias("step"))
        )
        frames.append(cur)
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out.select(F.col("grp").alias("source"), "step", "token")


# Sentinel alphabet for bpe_merge_rounds: one single-char symbol per merge
# round, outside [a-z] so it can never collide with corpus characters.
_BPE_SENTINELS = "¡¢£¤¥¦§¨"


def bpe_merge_rounds(
    df: DataFrame, text_col: str, n_rounds: int = 3
) -> DataFrame:
    """First ``n_rounds`` iterations of byte-pair-encoding tokenizer
    training (Sennrich et al., ACL'16) as a pure DataFrame computation —
    the merge-table construction that real BPE trainers run over a web
    corpus before the vocab ships.

    The classic scale trick: the corpus collapses to a (word, freq) table
    first (one corpus-scale shuffle; the vocabulary is Heaps-law-bounded),
    and every merge round then runs over that vocabulary table only. A
    merged symbol is re-encoded as a single sentinel character from
    ``_BPE_SENTINELS`` — so "adjacent symbol pair" stays ``substring(w, i,
    2)`` and applying a merge stays ``replace(w, pair, sentinel)``, whose
    left-to-right non-overlapping semantics are exactly BPE's greedy merge
    (and identical in Spark and DuckDB, which is what makes the oracle
    replay bit-exact). The argmax merge per round is decided on integer
    counts with a lexicographic tie-break — no floating point anywhere.
    The best-pair row is broadcast back (1-row crossJoin), never
    collected, so the whole n-round plan stays declarative.

    Returns one row per round: (round, sym1, sym2, cnt, symbols_after)
    where sym1/sym2 are the merged pair expanded back to raw characters
    and symbols_after = Σ freq·|symbols(w)| tracks corpus compression.
    """
    if n_rounds > len(_BPE_SENTINELS):
        raise ValueError("n_rounds exceeds the sentinel alphabet")
    words = (
        df.select(F.explode(words_col(F.col(text_col))).alias("w"))
        .filter(F.col("w").rlike("^[a-z]+$"))
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
        .persist()
    )
    wf = words
    bests: list[DataFrame] = []
    rows: list[DataFrame] = []
    for r in range(n_rounds):
        pairs = (
            wf.filter(F.length("w") >= 2)
            .select(
                "freq",
                "w",
                F.explode(
                    F.sequence(F.lit(1), F.length("w") - 1)
                ).alias("i"),
            )
            .select(
                "freq",
                F.substring(F.col("w"), F.col("i"), F.lit(2)).alias("pair"),
            )
            .groupBy("pair")
            .agg(F.sum("freq").alias("cnt"))
        )
        best = pairs.orderBy(F.col("cnt").desc(), F.col("pair").asc()).limit(1)
        bests.append(best)
        wf = (
            wf.crossJoin(
                F.broadcast(best.select(F.col("pair").alias("_mp")))
            )
            .withColumn(
                "w",
                F.replace(F.col("w"), F.col("_mp"), F.lit(_BPE_SENTINELS[r])),
            )
            .drop("_mp")
        )
        after = wf.agg(
            F.sum(F.col("freq") * F.length("w")).alias("symbols_after")
        )
        rows.append(
            best.crossJoin(after).select(
                F.lit(r + 1).cast("long").alias("round"),
                "pair",
                "cnt",
                "symbols_after",
            )
        )
    out = rows[0]
    for x in rows[1:]:
        out = out.unionByName(x)
    # Expand sentinel-encoded pairs back to raw characters, bottom-up:
    # exp_r is sentinel-free, so replacement order across rounds is moot.
    for r, b in enumerate(bests):
        out = out.crossJoin(
            F.broadcast(b.select(F.col("pair").alias(f"_p{r + 1}")))
        )
    exps: list[Column] = []
    for r in range(n_rounds):
        e = F.col(f"_p{r + 1}")
        for k in range(r):
            e = F.replace(e, F.lit(_BPE_SENTINELS[k]), exps[k])
        exps.append(e)

    def _expand_char(c: Column) -> Column:
        out_c = c
        for k in range(n_rounds):
            out_c = F.when(c == _BPE_SENTINELS[k], exps[k]).otherwise(out_c)
        return out_c

    return out.select(
        "round",
        _expand_char(F.substring(F.col("pair"), 1, 1)).alias("sym1"),
        _expand_char(F.substring(F.col("pair"), 2, 1)).alias("sym2"),
        "cnt",
        "symbols_after",
    ).orderBy("round")


def zipf_audit(
    df: DataFrame, text_col: str, group_col: str, top_r: int = 50
) -> DataFrame:
    """Zipf rank-frequency audit per group: OLS fit of ln(freq) on
    ln(rank) over each group's ``top_r`` most frequent words — natural
    text tracks slope ≈ −1, and a source whose slope or R² breaks from
    the corpus band is machine-generated, boilerplate-flooded, or
    template spam (a standard pretraining-corpus screen). Ranking is
    deterministic (freq DESC, word ASC) so both engines pick identical
    rank→word assignments; the regression runs on the moment sums
    (Σx, Σy, Σxx, Σyy, Σxy with x·x, never pow — CLAUDE.md), guarded
    in-expression for degenerate variance. Shape: one (group, word)
    shuffle, a per-group top-r window over word-frequency rows (not the
    corpus), then a group-keyed 1-row-per-group agg."""
    from pyspark.sql.window import Window

    freq = (
        df.select(F.col(group_col).alias("g"),
                  F.explode(words_col(F.col(text_col))).alias("w"))
        .filter(F.col("w").rlike("^[a-z]+$"))
        .groupBy("g", "w")
        .agg(F.count("*").alias("f"))
    )
    win = Window.partitionBy("g").orderBy(F.col("f").desc(), F.col("w").asc())
    ranked = (
        freq.withColumn("r", F.row_number().over(win))
        .filter(F.col("r") <= top_r)
        .select(
            "g",
            F.log(F.col("r").cast("double")).alias("x"),
            F.log(F.col("f").cast("double")).alias("y"),
        )
    )
    m = ranked.groupBy("g").agg(
        F.count("*").cast("double").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    sxx_c = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    syy_c = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    sxy_c = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    slope = F.when(sxx_c > 0, sxy_c / sxx_c)
    r2 = F.when(
        (sxx_c > 0) & (syy_c > 0), (sxy_c * sxy_c) / (sxx_c * syy_c)
    ).otherwise(F.lit(0.0))
    return m.select(
        F.col("g").alias(group_col),
        F.col("n").cast("long").alias("n_ranks"),
        (F.round(slope, 6) + 0.0).alias("zipf_slope"),
        F.round(r2, 6).alias("r2"),
    ).orderBy(group_col)


def vocab_coverage(
    df: DataFrame, text_col: str, cutoffs: tuple[int, ...] = (500, 1000, 2000, 4000, 8000)
) -> DataFrame:
    """Token-coverage curve for vocabulary sizing — for each candidate
    vocab size k, what fraction of all corpus token OCCURRENCES would be
    in-vocabulary if the vocab were the k most frequent words? The
    companion to heaps_fit (which sizes the vocab's GROWTH) and the BPE
    trainer (which spends its merge budget by exactly this curve): the
    audit that answers "is 8k types enough, or does OOV still eat 5% of
    the stream?". Output (vocab_size, covered_tokens, total_tokens,
    oov_rate) — counts exact BIGINT, oov_rate = 1 − covered/total the
    single division (round 6).

    Shape: the corpus collapses to the Heaps-bounded (word, freq) table
    in ONE shuffle (the BPE discipline); ranking + the cumulative sum
    run on the vocab table only (freq DESC, word ASC — deterministic,
    ASCII collation identical cross-engine); cutoffs broadcast."""
    from pyspark.sql.window import Window

    words = (
        df.select(
            F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("w")
        )
        .filter(F.col("w") != "")
    )
    freq = words.groupBy("w").agg(F.count("*").cast("long").alias("c"))
    ranked = freq.select(
        "c",
        F.row_number().over(Window.orderBy(F.desc("c"), F.asc("w"))).alias("rk"),
    )
    cum = ranked.select(
        "rk",
        F.sum("c")
        .over(Window.orderBy("rk").rowsBetween(Window.unboundedPreceding, 0))
        .cast("long")
        .alias("cum"),
    ).localCheckpoint()
    total = cum.agg(F.max("cum").cast("long").alias("total"))
    spark = df.sparkSession
    cut = spark.createDataFrame([(int(c),) for c in sorted(cutoffs)], "vocab_size int")
    covered = (
        cum.join(F.broadcast(cut), F.col("rk") <= F.col("vocab_size"))
        .groupBy("vocab_size")
        .agg(F.max("cum").cast("long").alias("covered_tokens"))
    )
    return (
        covered.crossJoin(F.broadcast(total))
        .select(
            "vocab_size",
            "covered_tokens",
            F.col("total").alias("total_tokens"),
            F.round(
                1.0 - F.col("covered_tokens") / F.col("total").cast("double"), 6
            ).alias("oov_rate"),
        )
    )


def span_corruption(
    df: DataFrame,
    id_col: str,
    text_col: str,
    span_len: int = 3,
    start_mod: int = 97,
    start_thresh: int = 5,
) -> DataFrame:
    """T5-style span-corruption training pairs, deterministically: mask
    ~span_len·(start_thresh/start_mod) of each document's token stream in
    multi-token spans, emit (input_text with one sentinel per span,
    target_text = sentinel + the masked tokens) — the seq2seq
    pretraining objective (Raffel et al.) as a corpus operator. Span
    starts are drawn by integer congruential mixing over (doc, position)
    instead of rand() (the repo determinism rule: the oracle replays
    every mask decision, and an incremental rebuild emits byte-identical
    training data); adjacent/overlapping starts merge into longer spans
    exactly as T5's span sampling does.

    Shape: one posexplode shuffle to (doc, pos, token) rows; mask /
    run-id assignment are three per-doc windows sharing the same
    (doc, pos) sort (span membership = max(start_flag) over the last
    span_len positions, run starts by lag, sentinel index by running
    sum); the rebuild is one ordered-struct collect per doc (the
    text_chunks positional-concat pattern). Everything is integer
    arithmetic + string concat — JVM-side end to end."""
    from pyspark.sql.window import Window

    toks = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(
            F.filter(
                F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
                lambda x: x != "",
            )
        ).alias("pos", "w"),
    )
    # Reduce the doc id with pmod BEFORE mixing: a raw 64-bit id (e.g.
    # xxhash64) times 131 overflows under Spark 4 ANSI mode, and a negative
    # id would give negative residues (selecting far more than
    # start_thresh/start_mod of positions). pmod(id, 1000003) is the
    # identity on the small non-negative fixture ids, so oracle outputs are
    # unchanged; the DuckDB oracle applies the same reduction.
    rid = F.pmod(F.col("id"), F.lit(1000003))
    start = (
        (rid * 131 + F.col("pos") * 31) % start_mod < start_thresh
    ).cast("int")
    wdoc = Window.partitionBy("id").orderBy("pos")
    flagged = toks.select("id", "pos", "w", start.alias("sf"))
    masked = flagged.withColumn(
        "m",
        F.max("sf").over(wdoc.rowsBetween(-(span_len - 1), 0)),
    )
    runs = masked.withColumn(
        "rs",
        F.when(
            (F.col("m") == 1)
            & (F.coalesce(F.lag("m").over(wdoc), F.lit(0)) == 0),
            1,
        ).otherwise(0),
    ).withColumn("k", F.sum("rs").over(wdoc))
    sentinel = F.concat(F.lit("<X_"), F.col("k"), F.lit(">"))
    pieces = runs.select(
        "id",
        "pos",
        "m",
        "rs",
        F.when(F.col("m") == 0, F.col("w"))
        .when(F.col("rs") == 1, sentinel)
        .otherwise(F.lit("")).alias("in_piece"),
        F.when(F.col("rs") == 1, F.concat(sentinel, F.lit(" "), F.col("w")))
        .when(F.col("m") == 1, F.col("w"))
        .otherwise(F.lit("")).alias("tg_piece"),
    )

    def _joined(col):
        return F.array_join(
            F.transform(
                F.filter(
                    F.array_sort(
                        F.collect_list(F.struct("pos", F.col(col).alias("p")))
                    ),
                    lambda s: s["p"] != "",
                ),
                lambda s: s["p"],
            ),
            " ",
        )

    return pieces.groupBy("id").agg(
        _joined("in_piece").alias("input_text"),
        _joined("tg_piece").alias("target_text"),
        F.sum("rs").cast("long").alias("n_spans"),
        F.sum("m").cast("long").alias("n_masked"),
    )


def causal_lm_windows(
    df: DataFrame, id_col: str, text_col: str, context: int = 8, stride: int = 4
) -> DataFrame:
    """Causal-LM training windows — the GPT-objective face of the
    pretraining-data family (span_corruption is the T5 face, mlm_masking
    the BERT face): every ``stride`` positions past the first ``context``
    tokens, emit (context window, next token) — the (x, y) pairs of
    next-token prediction with a fixed context length. Output:
    (id, pos, context_text, target) where pos is the 0-based position of
    the TARGET token.

    Shape: no per-token explode — windows are sliced from the token
    ARRAY (one row per emitted window via an exploded stride sequence,
    then two O(context) slices); a doc emits ⌈(n−context)/stride⌉
    windows, so output volume is corpus/stride — the operator the
    packing/sharding family feeds. `F.sequence` guarded for n ≤ context
    (a negative-end sequence DESCENDS rather than emptying — repo
    pitfall)."""
    ws = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"), lambda x: x != ""
    )
    base = df.select(F.col(id_col).alias("id"), ws.alias("ws")).filter(
        F.size("ws") > context
    )
    pos = base.select(
        "id",
        "ws",
        F.explode(
            F.sequence(F.lit(context), F.size("ws") - 1, F.lit(stride))
        ).alias("pos"),
    )
    return pos.select(
        "id",
        F.col("pos").cast("long").alias("pos"),
        F.array_join(
            F.slice(F.col("ws"), F.col("pos") - context + 1, context), " "
        ).alias("context_text"),
        F.element_at(F.col("ws"), F.col("pos") + 1).alias("target"),
    )


def mlm_masking(
    df: DataFrame,
    id_col: str,
    text_col: str,
    select_pct: int = 15,
    mask_token: str = "[MASK]",
) -> DataFrame:
    """BERT-style masked-LM corpus preparation, deterministically: select
    ~select_pct% of token positions by integer congruential mixing, then
    apply the classic 80/10/10 rule — 80% become ``mask_token``, 10% are
    replaced by another corpus token (drawn from the doc's own stream at
    an LCG offset — deterministic stand-in for a corpus-uniform draw,
    documented simplification), 10% stay unchanged (but are still
    predicted). Output per doc: (id, masked_text, labels_text = the
    original tokens at selected positions in order, n_selected, n_masked,
    n_replaced, n_kept). No rand() anywhere — the oracle replays every
    decision and incremental rebuilds are byte-identical (the repo
    determinism rule).

    Shape: one posexplode shuffle, per-row integer decisions, one
    positional-concat rebuild per doc (same skeleton as
    span_corruption, minus the run windows — single-token masking needs
    no lag/run machinery)."""
    from pyspark.sql.window import Window

    toks = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(
            F.filter(
                F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
                lambda x: x != "",
            )
        ).alias("pos", "w"),
    ).localCheckpoint()  # feeds both the mask decisions AND the
    # replacement-token lookup self-join (persist-before-self-join pitfall)
    n_w = Window.partitionBy("id")
    # Same id reduction as span_corruption: pmod keeps 64-bit / negative
    # hash ids from overflowing the *61/*43 mixes under ANSI mode or
    # yielding negative residues (which would select ~50% of positions
    # instead of select_pct%). Identity for the small fixture ids.
    rid = F.pmod(F.col("id"), F.lit(1000003))
    sel = ((rid * 61 + F.col("pos") * 53) % 100) < select_pct
    action = (rid * 43 + F.col("pos") * 29) % 10
    rep_pos = (
        (rid + F.col("pos") * 7) % F.count("*").over(n_w)
    ).cast("int")
    flagged = toks.select(
        "id", "pos", "w", sel.cast("int").alias("s"), action.alias("act"),
        rep_pos.alias("rp"),
    )
    rep = flagged.join(
        toks.select(
            F.col("id").alias("id"),
            F.col("pos").alias("rp"),
            F.col("w").alias("rw"),
        ),
        ["id", "rp"],
        "left",
    )
    piece = (
        F.when(F.col("s") == 0, F.col("w"))
        .when(F.col("act") < 8, F.lit(mask_token))
        .when(F.col("act") == 8, F.coalesce(F.col("rw"), F.col("w")))
        .otherwise(F.col("w"))
    )
    marked = rep.select(
        "id", "pos", "w", "s",
        piece.alias("piece"),
        F.when(F.col("s") == 1, F.col("w")).alias("label"),
        (F.col("s") == 1).cast("int").alias("is_sel"),
        ((F.col("s") == 1) & (F.col("act") < 8)).cast("int").alias("is_mask"),
        ((F.col("s") == 1) & (F.col("act") == 8)).cast("int").alias("is_rep"),
        ((F.col("s") == 1) & (F.col("act") == 9)).cast("int").alias("is_keep"),
    )

    def _ordered(col):
        return F.array_join(
            F.transform(
                F.filter(
                    F.array_sort(
                        F.collect_list(F.struct("pos", F.col(col).alias("p")))
                    ),
                    lambda st: st["p"].isNotNull(),
                ),
                lambda st: st["p"],
            ),
            " ",
        )

    return marked.groupBy("id").agg(
        _ordered("piece").alias("masked_text"),
        _ordered("label").alias("labels_text"),
        F.sum("is_sel").cast("long").alias("n_selected"),
        F.sum("is_mask").cast("long").alias("n_masked"),
        F.sum("is_rep").cast("long").alias("n_replaced"),
        F.sum("is_keep").cast("long").alias("n_kept"),
    )
