from __future__ import annotations

import pytest

from raptor_spark.schemas import FILES_SCHEMA
from raptor_spark.session import build_session
from raptor_spark.synth import generate_corpus


@pytest.fixture(scope="session")
def spark():
    s = build_session("raptor_spark.tests", master="local[8]", shuffle_partitions=16)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus_rows():
    return generate_corpus(300)


@pytest.fixture(scope="session")
def files_df(spark, corpus_rows):
    return spark.createDataFrame(corpus_rows, schema=FILES_SCHEMA).repartition(16).persist()


@pytest.fixture(scope="session")
def triples_df(files_df):
    from raptor_spark.extract import extract_triples

    return extract_triples(files_df).persist()


SF_DIR = "/root/testdata/sf0.001"
