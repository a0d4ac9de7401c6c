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


def file_type_dispatch(df: DataFrame, path_col: str = "path") -> DataFrame:
    """Extension → lang routing as a pure CASE expression (≙ MIME sniff +
    processor dispatch, asset_management/utils.py:135-198 +
    document_analysis.py:51-59)."""
    ext = F.lower(F.element_at(F.split(F.col(path_col), r"\."), -1))
    lang = (
        F.when(ext == "py", "python")
        .when(ext.isin("js", "jsx", "ts", "tsx"), "js")
        .when(ext == "go", "go")
        .otherwise("other")
    )
    return df.withColumn("lang_detected", lang)
