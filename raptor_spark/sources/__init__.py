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
