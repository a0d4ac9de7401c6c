"""Sources/sinks (SURVEY.md §2.1).

The reference reads assets from lakeFS/SeaweedFS by (asset_path, version_id)
and sinks to Qdrant + MySQL; here the source is a table scan and the sinks are
the Catalog tables. This module holds the small readers the test harness and
queries use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TESTDATA_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TESTDATA_TABLES}


def read_csv_validated(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """Permissive CSV read with corrupt-row capture — the Spark-native form of
    the reference's arity validation over the first 1000 rows
    (processors/csv_xlsx_processor.py:49-81): bad rows land in
    ``_corrupt_record`` instead of failing the scan."""
    r = spark.read.option("header", "true").option("mode", "PERMISSIVE").option(
        "columnNameOfCorruptRecord", "_corrupt_record"
    )
    if schema is not None:
        r = r.schema(schema)
    else:
        r = r.option("inferSchema", "true")
    return r.csv(path)


# Decode ladder order matters: gbk/big5 are tried before cp1252 because
# cp1252 decodes almost any byte string (only 5 undefined bytes) and would
# otherwise mis-claim CJK text; cp1252 is the terminal catch-all for western
# bytes. A UTF-8 BOM is dispatched explicitly (utf-8-sig also decodes
# BOM-less utf-8, so putting it in the ladder would mislabel plain utf-8).
DECODE_ENCODINGS = ("utf-8", "gbk", "big5", "cp1252")
_UTF8_BOM = b"\xef\xbb\xbf"


def decode_bytes_col(col):
    """struct<text, encoding> from a binary column via a strict decode
    ladder (``DECODE_ENCODINGS``) — the reference's multi-encoding read
    fallback (svc/document_analysis_service/processors/txt_processor.py:
    138-151: try utf-8 → gbk → big5 → cp1252, first strict success wins),
    as one Arrow-batched pandas UDF. Bytes no ladder entry decodes fall
    back to utf-8 with replacement characters, tagged ``utf-8?replace`` so
    downstream quality filters can drop them. NULL bytes → NULL struct
    fields."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    # no type hints on purpose: `from __future__ import annotations` turns
    # them into strings pyspark's hint resolver rejects for the
    # Series→DataFrame (struct-returning) scalar form; hint-less defaults
    # to SCALAR, which is exactly that form
    @pandas_udf("struct<text: string, encoding: string>")
    def _decode(s):
        texts: list[str | None] = []
        encs: list[str | None] = []
        for raw in s:
            if raw is None:
                texts.append(None)
                encs.append(None)
                continue
            b = bytes(raw)
            if b.startswith(_UTF8_BOM):
                try:
                    texts.append(b.decode("utf-8-sig"))
                    encs.append("utf-8-sig")
                    continue
                except UnicodeDecodeError:
                    pass
            for enc in DECODE_ENCODINGS:
                try:
                    texts.append(b.decode(enc))
                    encs.append(enc)
                    break
                except (UnicodeDecodeError, ValueError):
                    continue
            else:
                texts.append(b.decode("utf-8", errors="replace"))
                encs.append("utf-8?replace")
        return pd.DataFrame({"text": texts, "encoding": encs})

    return _decode(col)


def file_type_dispatch(
    df: DataFrame, path_col: str = "path", content_col: str | None = None
) -> DataFrame:
    """Extension → lang routing as a pure CASE expression, with an optional
    content-sniff fallback (≙ the reference's TWO-signal MIME detection —
    extension + content bytes — normalized to one type,
    asset_management/utils.py:135-198 + document_analysis.py:51-59).

    With ``content_col``, a file whose extension is unknown (or missing) is
    classified from its leading bytes: shebang interpreter, ``package``/
    ``func`` (go), ``import``/``def``/``class`` (python), ``function``/
    ``const``/``require(`` (js). Extension wins when both signals fire —
    same precedence as the reference. All column expressions, no UDF."""
    ext = F.lower(F.element_at(F.split(F.col(path_col), r"\."), -1))
    by_ext = (
        F.when(ext == "py", "python")
        .when(ext.isin("js", "jsx", "ts", "tsx"), "js")
        .when(ext == "go", "go")
        .otherwise("other")
    )
    if content_col is None:
        return df.withColumn("lang_detected", by_ext)
    head = F.substring(F.col(content_col), 1, 512)
    shebang = F.regexp_extract(head, r"^#!\S*/(?:env\s+)?(\w+)", 1)
    by_content = (
        F.when(shebang.isin("python", "python3"), "python")
        .when(shebang.isin("node", "nodejs"), "js")
        .when(head.rlike(r"(?m)^package\s+\w+") & head.rlike(r"(?m)^func\s"), "go")
        .when(head.rlike(r"(?m)^(import\s|from\s+\w+\s+import\s|def\s|class\s)"), "python")
        .when(
            head.rlike(r"(?m)^(function\s|const\s|let\s|export\s)")
            | head.contains("require("),
            "js",
        )
        .otherwise("other")
    )
    return df.withColumn(
        "lang_detected", F.when(by_ext != "other", by_ext).otherwise(by_content)
    )
