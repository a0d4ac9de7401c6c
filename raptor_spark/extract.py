"""Stage 1: triple extraction via Arrow-batched ``mapInPandas``.

Spark-first analog of the reference's per-filetype processor dispatch
(svc/document_analysis_service/document_analysis.py:51-78) + chunk enrichment
(:171-184): content is touched ONLY here, inside a vectorized pandas UDF; all
downstream stages are pure DataFrame ops.

Error semantics follow the reference's skip-and-log convention
(``{"error": ...}`` return, processors/csv_xlsx_processor.py:189-203): a file
whose extraction raises yields a single quarantine triple with
``pred='extract-error'`` instead of failing the task — poison rows never kill
the job (≙ dead-letter queue, kafka_handler.py:495-503).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from raptor_spark.schemas import TRIPLES_SCHEMA
from raptor_spark.tokenize import extract_file, sha256_hex

PRED_ERROR = "extract-error"

_COLS = ["subj", "pred", "obj", "repo", "path", "line", "score", "lang", "sha256"]


def _extract_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out: list[tuple] = []
        for repo, path, lang, content in zip(
            pdf["repo"], pdf["path"], pdf["lang"], pdf["content"]
        ):
            sha = sha256_hex(content if content is not None else "")
            try:
                for subj, pred, obj, r, p, line, score in extract_file(
                    repo, path, lang, content
                ):
                    out.append((subj, pred, obj, r, p, line, score, lang, sha))
            except Exception as e:  # quarantine, never fail the task
                out.append(
                    (f"{repo}:{path}", PRED_ERROR, str(e)[:200], repo, path, 0, 0.0, lang, sha)
                )
        yield pd.DataFrame(out, columns=_COLS)


def extract_triples(files: DataFrame) -> DataFrame:
    """files(repo, path, commit, lang, content) → triples (TRIPLES_SCHEMA).

    The plan is a single narrow map stage — no shuffle — so it scales linearly
    with input splits; Arrow batch size is capped session-wide
    (``spark.sql.execution.arrow.maxRecordsPerBatch``) to bound memory on
    multi-MB content rows.
    """
    return files.select("repo", "path", "lang", "content").mapInPandas(
        _extract_batches, schema=TRIPLES_SCHEMA
    )


def filter_unprocessed(files: DataFrame, processed: DataFrame) -> DataFrame:
    """Incremental-run change detection: keep only files whose content hash has
    not been processed before (left anti-join on sha256) — the analog of the
    reference's checksum short-circuit (asset_management/database.py:583-592 +
    client.py:157-206 'commit: no changes' reuse).

    ``processed`` must have a ``sha256`` column (e.g. the previous run's
    triples table). The hash is computed JVM-side with ``sha2`` — bitwise
    identical to the Python ``hashlib`` value for utf-8 content (tested).
    """
    with_sha = files.withColumn(
        "sha256", F.sha2(F.coalesce(F.col("content"), F.lit("")), 256)
    )
    return with_sha.join(
        processed.select("sha256").distinct(), on="sha256", how="left_anti"
    ).drop("sha256")
