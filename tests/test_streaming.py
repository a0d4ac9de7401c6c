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
