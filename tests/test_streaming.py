"""Structured Streaming parity: the SAME extraction/aggregation code must
produce batch-identical results through readStream + availableNow (the
streaming face of checkpoint-restart, SURVEY.md §1.2 / streaming module)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from raptor_spark.streaming import (
    read_file_stream,
    run_available_now,
    streaming_triple_extract,
    windowed_event_counts,
)
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def corpus_path(spark, files_df, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("stream_in") / "files")
    files_df.write.mode("overwrite").parquet(p)
    return p


def test_streaming_extract_matches_batch(spark, files_df, corpus_path, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("stream_out") / "triples")
    ckpt = str(tmp_path_factory.mktemp("stream_out") / "ckpt")
    stream = streaming_triple_extract(read_file_stream(spark, corpus_path))
    assert stream.isStreaming
    run_available_now(stream, out, ckpt)

    from raptor_spark.extract import extract_triples

    got = spark.read.parquet(out)
    batch = extract_triples(files_df)
    key = ["subj", "pred", "obj", "repo", "path", "line"]
    assert got.count() == batch.count()
    assert got.select(*key).exceptAll(batch.select(*key)).count() == 0
    assert batch.select(*key).exceptAll(got.select(*key)).count() == 0

    # restart with the same checkpoint: no new data → no duplicate output
    run_available_now(
        streaming_triple_extract(read_file_stream(spark, corpus_path)), out, ckpt
    )
    assert spark.read.parquet(out).count() == batch.count()


def test_windowed_event_counts_matches_batch(spark, tmp_path_factory):
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    in_dir = str(tmp_path_factory.mktemp("ev_in") / "events")
    events.write.mode("overwrite").parquet(in_dir)
    out = str(tmp_path_factory.mktemp("ev_out") / "agg")
    ckpt = str(tmp_path_factory.mktemp("ev_out") / "ckpt")

    stream = spark.readStream.schema(events.schema).parquet(in_dir)
    run_available_now(windowed_event_counts(stream), out, ckpt)
    got = spark.read.parquet(out)

    batch = (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "sum_value")
    )
    # watermarked append emits only windows closed by the final watermark;
    # everything emitted must agree exactly with the batch aggregation
    assert got.count() > 0
    joined = got.join(
        batch.withColumnRenamed("n", "bn").withColumnRenamed("sum_value", "bs"),
        ["window_start", "event_type"],
        "left",
    )
    assert joined.filter(F.col("bn").isNull()).count() == 0
    assert joined.filter((F.col("n") != F.col("bn"))).count() == 0


def test_streaming_dedup_one_row_per_hash(spark, files_df, corpus_path, tmp_path_factory):
    """Streaming sha256 dedup must emit exactly one row per distinct content
    (the corpus has planted exact dups)."""
    from raptor_spark.streaming import streaming_exact_dedup

    out = str(tmp_path_factory.mktemp("dedup") / "out")
    ckpt = str(tmp_path_factory.mktemp("dedup") / "ckpt")
    stream = streaming_exact_dedup(read_file_stream(spark, corpus_path), "content")
    run_available_now(stream, out, ckpt)
    got = spark.read.parquet(out)
    n_distinct = files_df.select(F.sha2("content", 256)).distinct().count()
    assert n_distinct < files_df.count()  # fixture really has dups
    assert got.count() == n_distinct
    assert got.select("_sha").distinct().count() == n_distinct


def test_stream_stream_join_matches_batch(spark, tmp_path_factory):
    """Watermarked stream-stream interval join must equal the batch join with
    the same time-bound condition (state-expiring joins lose nothing within
    the watermark on a drained availableNow run)."""
    from raptor_spark.streaming import stream_stream_interval_join

    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    in_dir = str(tmp_path_factory.mktemp("ssj") / "events")
    events.write.mode("overwrite").parquet(in_dir)
    out = str(tmp_path_factory.mktemp("ssj") / "out")
    ckpt = str(tmp_path_factory.mktemp("ssj") / "ckpt")

    def side(df, etype, prefix):
        return df.filter(F.col("event_type") == etype).select(
            F.col("event_id").alias(f"{prefix}_id"),
            "user_id",
            F.col("ts").alias(f"{prefix}_ts"),
        )

    ls = side(spark.readStream.schema(events.schema).parquet(in_dir), "error", "l")
    rs = side(spark.readStream.schema(events.schema).parquet(in_dir), "purchase", "r")
    joined = stream_stream_interval_join(
        ls, rs, "user_id", bound_s=600.0, l_ts="l_ts", r_ts="r_ts"
    ).select("l_id", "r_id", "user_id")
    run_available_now(joined, out, ckpt)
    got = spark.read.parquet(out)

    lb, rb = side(events, "error", "l"), side(events, "purchase", "r")
    lt = F.col("l_ts").cast("timestamp").cast("double")
    rt = F.col("r_ts").cast("timestamp").cast("double")
    batch = (
        lb.withColumn("_l", lt)
        .join(rb.withColumn("_r", rt), "user_id")
        .filter((F.col("_r") >= F.col("_l") - 600.0) & (F.col("_r") <= F.col("_l") + 600.0))
        .select("l_id", "r_id", "user_id")
    )
    assert got.count() == batch.count()
    assert got.exceptAll(batch).count() == 0
    assert batch.exceptAll(got).count() == 0


def test_stream_stream_join_fractional_bound(spark, tmp_path_factory):
    """bound_s below one second must not truncate to zero: two events 400 ms
    apart match at bound_s=0.5 and don't at bound_s=0.3 (the int(bound_s)
    regression dropped every non-exact-tie match for fractional bounds)."""
    from raptor_spark.streaming import stream_stream_interval_join

    rows = [
        (1, "u1", "2024-01-01 00:00:00.000"),
        (2, "u1", "2024-01-01 00:00:00.400"),
    ]
    base = spark.createDataFrame(rows, ["event_id", "user_id", "ts"]).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    in_dir = str(tmp_path_factory.mktemp("frac") / "events")
    base.write.mode("overwrite").parquet(in_dir)

    def run(bound):
        out = str(tmp_path_factory.mktemp("frac") / f"out{int(bound*1000)}")
        ckpt = str(tmp_path_factory.mktemp("frac") / f"ck{int(bound*1000)}")
        s = spark.readStream.schema(base.schema).parquet(in_dir)
        ls = s.filter(F.col("event_id") == 1).select(
            F.col("event_id").alias("l_id"), "user_id", F.col("ts").alias("l_ts")
        )
        rs = s.filter(F.col("event_id") == 2).select(
            F.col("event_id").alias("r_id"), "user_id", F.col("ts").alias("r_ts")
        )
        j = stream_stream_interval_join(
            ls, rs, "user_id", bound_s=bound, l_ts="l_ts", r_ts="r_ts"
        ).select("l_id", "r_id")
        run_available_now(j, out, ckpt)
        return spark.read.parquet(out).count()

    assert run(0.5) == 1
    assert run(0.3) == 0


def test_stateful_sessionize_matches_batch_closed_sessions(spark, tmp_path_factory):
    """applyInPandasWithState sessionization: every emitted session must be
    exactly one of the batch gaps-and-islands sessions; a checkpoint restart
    with no new data emits nothing more."""
    from raptor_spark.operators.relational import sessionize
    from raptor_spark.streaming import sessionize_stream

    events = spark.read.parquet(f"{SF_DIR}/events.parquet").withColumn(
        "ts_sec", F.col("ts").cast("timestamp").cast("double")
    )
    # two time-ordered files → two microbatches (maxFilesPerTrigger=1), so
    # batch 2's watermark fires batch-1 session timeouts
    cut = events.approxQuantile("ts_sec", [0.5], 0.01)[0]
    in_dir = str(tmp_path_factory.mktemp("sess") / "in")
    events.filter(F.col("ts_sec") <= cut).coalesce(1).write.parquet(f"{in_dir}/p=1")
    events.filter(F.col("ts_sec") > cut).coalesce(1).write.parquet(f"{in_dir}/p=2")

    out = str(tmp_path_factory.mktemp("sess") / "out")
    ckpt = str(tmp_path_factory.mktemp("sess") / "ckpt")
    stream_in = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(in_dir)
    )
    GAP = 1800.0
    q = (
        sessionize_stream(stream_in, "user_id", "ts", gap_s=GAP)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.read.parquet(out)
    n_emitted = got.count()
    assert n_emitted > 0

    golden = sessionize(events, ["user_id"], "ts_sec", gap_s=GAP)
    gset = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in golden.collect()
    }
    emitted = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in got.collect()
    }
    assert len(emitted) == n_emitted  # no duplicate emissions
    assert emitted <= gset, sorted(emitted - gset)[:3]

    # restart on the same checkpoint: nothing new to emit
    q2 = (
        sessionize_stream(
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", "1")
            .option("recursiveFileLookup", "true")
            .parquet(in_dir),
            "user_id", "ts", gap_s=GAP,
        )
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination()
    assert spark.read.parquet(out).count() == n_emitted


def test_sliding_windowed_counts_match_batch(spark, tmp_path_factory):
    """Sliding windows (10 min every 5) through the streaming operator must
    agree with the batch F.window sliding aggregation on every window the
    watermark closed."""
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    in_dir = str(tmp_path_factory.mktemp("sl_in") / "events")
    events.write.mode("overwrite").parquet(in_dir)
    out = str(tmp_path_factory.mktemp("sl_out") / "agg")
    ckpt = str(tmp_path_factory.mktemp("sl_out") / "ckpt")

    stream = spark.readStream.schema(events.schema).parquet(in_dir)
    run_available_now(
        windowed_event_counts(stream, window="10 minutes", slide="5 minutes"),
        out, ckpt,
    )
    got = spark.read.parquet(out)
    batch = (
        events.groupBy(
            F.window("ts", "10 minutes", "5 minutes").alias("w"), "event_type"
        )
        .agg(F.count("*").alias("bn"))
        .select(F.col("w.start").alias("window_start"), "event_type", "bn")
    )
    assert got.count() > 0
    joined = got.join(batch, ["window_start", "event_type"], "left")
    assert joined.filter(F.col("bn").isNull()).count() == 0
    assert joined.filter(F.col("n") != F.col("bn")).count() == 0


def test_streaming_outliers_match_batch(spark, tmp_path_factory):
    """Stream-static z-score filter: static stats frame joined into the
    stream must flag exactly the batch outlier set (map-only, no state)."""
    from raptor_spark.streaming import streaming_outliers

    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    in_dir = str(tmp_path_factory.mktemp("oz_in") / "events")
    events.write.mode("overwrite").parquet(in_dir)
    out = str(tmp_path_factory.mktemp("oz_out") / "rows")
    ckpt = str(tmp_path_factory.mktemp("oz_out") / "ckpt")

    stats = events.groupBy("event_type").agg(
        F.avg("value").alias("mu"), F.stddev_samp("value").alias("sigma")
    )
    stream = spark.readStream.schema(events.schema).parquet(in_dir)
    run_available_now(streaming_outliers(stream, stats), out, ckpt)
    got = spark.read.parquet(out)

    batch_ids = {
        r.event_id
        for r in events.join(stats, "event_type")
        .filter(F.abs((F.col("value") - F.col("mu")) / F.col("sigma")) > 2.5)
        .collect()
    }
    assert batch_ids, "fixture must contain outliers"
    assert {r.event_id for r in got.collect()} == batch_ids


def test_streaming_decontaminate_matches_batch(spark, tmp_path_factory):
    """Streamed Bloom decontamination (two micro-batch files, availableNow)
    produces a catalog table row-identical to the batch operator over the
    same corpus, and replaying the input is idempotent."""
    from raptor_spark.catalog import Catalog
    from raptor_spark.operators.curation import bloom_build, bloom_contamination
    from raptor_spark.streaming import streaming_decontaminate

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    ev = docs.filter(F.col("doc_id") % 50 == 0)
    tr = docs.filter(F.col("doc_id") % 50 != 0)
    bloom = bloom_build(ev, "text", n=3)
    want = {
        (r.id, r.n_flagged)
        for r in bloom_contamination(tr, bloom, "doc_id", "text", n=3).collect()
    }
    assert want, "fixture produced no flagged docs; parity is vacuous"

    in_dir = str(tmp_path_factory.mktemp("bd_in") / "docs")
    # two files -> at least two micro-batches under maxFilesPerTrigger=1
    tr.filter(F.col("doc_id") % 2 == 0).coalesce(1).write.mode(
        "overwrite"
    ).parquet(in_dir)
    tr.filter(F.col("doc_id") % 2 == 1).coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)
    cat = Catalog(spark, str(tmp_path_factory.mktemp("bd_cat")))

    def drain(ck):
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(in_dir)
        )
        streaming_decontaminate(stream, bloom, cat, "flagged", ck)

    drain(str(tmp_path_factory.mktemp("bd_ck") / "a"))
    got = {(r.id, r.n_flagged) for r in cat.read("flagged").collect()}
    assert got == want

    # replay with a fresh checkpoint (at-least-once duplicate) — unchanged
    drain(str(tmp_path_factory.mktemp("bd_ck") / "b"))
    again = {(r.id, r.n_flagged) for r in cat.read("flagged").collect()}
    assert again == want


def test_stream_merge_to_catalog_idempotent(spark, tmp_path_factory):
    """foreachBatch keyed merge: replaying the SAME input through a fresh
    checkpoint must leave the table unchanged (upsert-by-key), and changed
    rows must update in place."""
    from raptor_spark.catalog import Catalog
    from raptor_spark.streaming import stream_merge_to_catalog

    events = spark.read.parquet(f"{SF_DIR}/events.parquet").limit(200)
    in_dir = str(tmp_path_factory.mktemp("mg_in") / "events")
    events.coalesce(1).write.mode("overwrite").parquet(in_dir)
    cat = Catalog(spark, str(tmp_path_factory.mktemp("mg_cat")))

    def drain(ck):
        stream = spark.readStream.schema(events.schema).parquet(in_dir)
        stream_merge_to_catalog(stream, cat, "ev", ["event_id"], ck)

    drain(str(tmp_path_factory.mktemp("mg_ck") / "a"))
    first = {(r.event_id, r.value) for r in cat.read("ev").collect()}
    assert len(first) == events.count()

    # replay with a FRESH checkpoint (simulated at-least-once duplicate)
    drain(str(tmp_path_factory.mktemp("mg_ck") / "b"))
    again = {(r.event_id, r.value) for r in cat.read("ev").collect()}
    assert again == first

    # changed subset updates in place
    changed = events.limit(50).withColumn("value", F.col("value") + 1000.0)
    changed.coalesce(1).write.mode("overwrite").parquet(in_dir)
    drain(str(tmp_path_factory.mktemp("mg_ck") / "c"))
    final = cat.read("ev")
    assert final.count() == events.count()
    assert final.filter(F.col("value") > 1000.0).count() >= 40


def test_transition_stream_matches_batch_lead_pairs(spark, tmp_path_factory):
    """The streaming transition emitter over two time-ordered microbatches
    equals the batch lead() pair set exactly, and a checkpoint restart
    emits nothing new (the cross-batch frontier lives in state)."""
    from raptor_spark.streaming import transition_stream

    events = spark.read.parquet(f"{SF_DIR}/events.parquet").withColumn(
        "ts_sec", F.col("ts").cast("timestamp").cast("double")
    )
    cut = events.approxQuantile("ts_sec", [0.5], 0.01)[0]
    in_dir = str(tmp_path_factory.mktemp("trans") / "in")
    events.filter(F.col("ts_sec") <= cut).coalesce(1).write.parquet(f"{in_dir}/p=1")
    events.filter(F.col("ts_sec") > cut).coalesce(1).write.parquet(f"{in_dir}/p=2")

    out = str(tmp_path_factory.mktemp("trans") / "out")
    ckpt = str(tmp_path_factory.mktemp("trans") / "ckpt")

    def _run():
        q = (
            transition_stream(
                spark.readStream.schema(events.schema)
                .option("maxFilesPerTrigger", "1")
                .option("recursiveFileLookup", "true")
                .parquet(in_dir)
            )
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    _run()
    got = spark.read.parquet(out)

    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts_sec", "event_id")
    golden = (
        events.select(
            "user_id",
            F.col("event_type").alias("from_state"),
            F.lead("event_type").over(w).alias("to_state"),
            F.lead("ts_sec").over(w).alias("t"),
        )
        .filter(F.col("to_state").isNotNull())
    )
    gset = {(r.user_id, r.from_state, r.to_state, r.t) for r in golden.collect()}
    eset = {(r.user_id, r.from_state, r.to_state, r.t) for r in got.collect()}
    assert got.count() == len(eset)  # no duplicate emissions
    assert eset == gset

    # restart on the same checkpoint: no new input -> no new pairs
    _run()
    assert spark.read.parquet(out).count() == len(gset)


def test_streaming_cms_matches_batch_sketch(spark, tmp_path_factory):
    """The streaming count-min sketch (bounded-state streaming aggregation,
    complete mode) must equal the batch cms_build bucket-for-bucket after
    draining, and its state never exceeds depth×width rows."""
    from raptor_spark.catalog import Catalog
    from raptor_spark.operators.sketch import cms_build
    from raptor_spark.operators.text import words_col
    from raptor_spark.streaming import streaming_cms

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(300)
    terms = docs.select(F.explode(words_col(F.col("text"))).alias("term"))
    in_dir = str(tmp_path_factory.mktemp("cms_in") / "terms")
    # several files → several micro-batch inputs under availableNow
    terms.repartition(4).write.mode("overwrite").parquet(in_dir)
    cat = Catalog(spark, str(tmp_path_factory.mktemp("cms_cat")))

    stream = (
        spark.readStream.schema(terms.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(in_dir)
    )
    streaming_cms(
        stream, "term", cat, "sk",
        str(tmp_path_factory.mktemp("cms_ck") / "a"), depth=4, width=256,
    )
    got = {(r.row, r.bucket): r.cnt for r in cat.read("sk").collect()}
    want = {
        (r.row, r.bucket): r.cnt
        for r in cms_build(terms, "term", depth=4, width=256).collect()
    }
    assert got == want
    assert len(got) <= 4 * 256


def test_streaming_conformal_coverage_matches_batch(spark, tmp_path_factory):
    """Stream-static conformal drift alarm: per-window coverage against a
    batch-computed threshold must equal the batch windowed aggregation
    exactly (stream-static broadcast join + watermarked tumbling window,
    no custom state)."""
    from raptor_spark.operators.profile import conformal_coverage
    from raptor_spark.streaming import streaming_conformal_coverage

    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    cal = events.filter(F.col("event_id") % 2 == 0)
    test = events.filter(F.col("event_id") % 2 == 1)
    thr = conformal_coverage(cal, test, "value").select("threshold")

    in_dir = str(tmp_path_factory.mktemp("cc_in") / "events")
    test.write.mode("overwrite").parquet(in_dir)
    out = str(tmp_path_factory.mktemp("cc_out") / "rows")
    ckpt = str(tmp_path_factory.mktemp("cc_out") / "ckpt")
    stream = spark.readStream.schema(test.schema).parquet(in_dir)
    run_available_now(streaming_conformal_coverage(stream, thr), out, ckpt)
    got = {
        (r.win_start, r.n_events, r.n_covered, r.coverage)
        for r in spark.read.parquet(out).collect()
    }

    batch = {
        (r.win_start, r.n_events, r.n_covered, r.coverage)
        for r in test.withColumn("ts", F.col("ts").cast("timestamp"))
        .join(F.broadcast(thr))
        .groupBy(F.window(F.col("ts"), "1 hour"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum((F.col("value") <= F.col("threshold")).cast("long")).alias(
                "n_covered"
            ),
        )
        .select(
            F.col("window.start").alias("win_start"),
            "n_events",
            "n_covered",
            F.round(
                F.col("n_covered").cast("double") / F.col("n_events"), 6
            ).alias("coverage"),
        )
        .collect()
    }
    assert len(batch) > 3, "fixture must span multiple windows"
    # watermarked append emits only windows closed by the final watermark:
    # everything emitted must agree exactly with the batch aggregation,
    # and only trailing open windows may be withheld
    assert len(got) >= len(batch) - 3 and got, (len(got), len(batch))
    assert got <= batch
