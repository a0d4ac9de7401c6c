"""Table IO behind one thin interface: Iceberg when available, parquet +
manifest fallback otherwise (SURVEY.md §7.0 / §7.4 risk 4).

Iceberg gives commits / branches / time-travel natively (≙ the reference's
lakeFS versioned asset store, raptor/asset_management/object_store.py:208-269);
the fallback emulates the parts the pipeline needs: atomic "commit" via a
manifest JSON written last, snapshot listing, and stage-completion markers for
checkpoint-restart.
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


class Catalog:
    """Parquet-backed catalog with manifest 'commits'.

    Layout: ``{root}/{table}/data/*.parquet`` + ``{root}/{table}/manifest.json``.
    A table 'exists' iff the manifest does; the manifest is written after the
    data (write-then-commit, ≙ lakeFS upload+commit returning
    (key, version_id, checksum), object_store.py:208-269).
    """

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _dir(self, table: str) -> str:
        return os.path.join(self.root, table)

    def _manifest_path(self, table: str) -> str:
        return os.path.join(self._dir(table), "manifest.json")

    def exists(self, table: str) -> bool:
        return os.path.exists(self._manifest_path(table))

    def write(
        self,
        table: str,
        df: DataFrame,
        partition_by: list[str] | None = None,
        meta: dict | None = None,
    ) -> dict:
        """Overwrite-write the table, then commit the manifest atomically."""
        d = self._dir(table)
        data = os.path.join(d, "data")
        if os.path.exists(d):
            shutil.rmtree(d)
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(data)
        manifest = {
            "table": table,
            "committed_at": time.time(),
            "partition_by": partition_by or [],
            "schema": df.schema.json(),
            **(meta or {}),
        }
        tmp = self._manifest_path(table) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, self._manifest_path(table))
        return manifest

    def append(self, table: str, df: DataFrame, partition_by: list[str] | None = None) -> None:
        data = os.path.join(self._dir(table), "data")
        w = df.write.mode("append")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(data)
        if not self.exists(table):
            with open(self._manifest_path(table), "w") as f:
                json.dump({"table": table, "committed_at": time.time()}, f)

    def read(self, table: str) -> DataFrame:
        if not self.exists(table):
            raise FileNotFoundError(f"table not committed: {table}")
        return self.spark.read.parquet(os.path.join(self._dir(table), "data"))

    def manifest(self, table: str) -> dict:
        with open(self._manifest_path(table)) as f:
            return json.load(f)

    def drop(self, table: str) -> None:
        d = self._dir(table)
        if os.path.exists(d):
            shutil.rmtree(d)
