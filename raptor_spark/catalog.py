"""Table IO behind one thin interface: Iceberg when available, parquet +
manifest fallback otherwise (SURVEY.md §7.0 / §7.4 risk 4).

Iceberg gives commits / branches / time-travel natively (≙ the reference's
lakeFS versioned asset store, raptor/asset_management/object_store.py:208-269);
the fallback emulates the parts the pipeline needs:

* atomic "commit" via a manifest JSON written last (write-then-commit, the
  lakeFS upload+commit returning (key, version_id, checksum));
* snapshot history + time travel: every ``write`` creates ``data-<n>`` +
  ``manifest-<n>.json`` and swaps the ``manifest.json`` pointer, so
  ``read(table, snapshot=n-1)`` still sees the previous commit (≙ lakeFS
  version_id pinning, object_store.py:208-269, database.py:146-182);
* keyed ``merge`` — idempotent upsert-by-key as copy-on-write into a new
  snapshot (≙ the reference's Qdrant insert keyed by id,
  qdrant_search_docker/api_insert.py:88-171; Iceberg MERGE INTO when jars
  are present).

Retention is bounded (``keep_snapshots``) so re-running a pipeline does not
grow the output dir without limit.
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
    """Parquet-backed catalog with manifest 'commits' and snapshot history.

    Layout: ``{root}/{table}/data-<n>/*.parquet`` + ``manifest-<n>.json`` per
    snapshot, plus ``manifest.json`` — the current-snapshot pointer, replaced
    atomically LAST so a crashed write never becomes current. A table
    'exists' iff ``manifest.json`` does. Legacy tables (bare ``data/`` dir,
    no snapshot_id) remain readable as snapshot 0.
    """

    def __init__(self, spark: SparkSession, root: str, keep_snapshots: int = 3):
        self.spark = spark
        self.root = root
        self.keep_snapshots = max(1, keep_snapshots)
        os.makedirs(root, exist_ok=True)

    def _dir(self, table: str) -> str:
        return os.path.join(self.root, table)

    def _manifest_path(self, table: str, snapshot: int | None = None) -> str:
        name = "manifest.json" if snapshot is None else f"manifest-{snapshot}.json"
        return os.path.join(self._dir(table), name)

    def exists(self, table: str) -> bool:
        return os.path.exists(self._manifest_path(table))

    def manifest(self, table: str, snapshot: int | None = None) -> dict:
        with open(self._manifest_path(table, snapshot)) as f:
            return json.load(f)

    def snapshots(self, table: str) -> list[dict]:
        """All retained snapshot manifests, oldest first."""
        d = self._dir(table)
        if not os.path.isdir(d):
            return []
        out = []
        for name in os.listdir(d):
            if name.startswith("manifest-") and name.endswith(".json"):
                with open(os.path.join(d, name)) as f:
                    out.append(json.load(f))
        return sorted(out, key=lambda m: m.get("snapshot_id", 0))

    def _data_dir(self, table: str, snapshot: int | None = None) -> str:
        m = self.manifest(table, snapshot)
        return os.path.join(self._dir(table), m.get("data_dir", "data"))

    def write(
        self,
        table: str,
        df: DataFrame,
        partition_by: list[str] | None = None,
        meta: dict | None = None,
    ) -> dict:
        """Commit the DataFrame as a NEW snapshot of the table and make it
        current. Previous snapshots stay readable via ``read(table, n)``
        until pruned by the retention policy."""
        d = self._dir(table)
        os.makedirs(d, exist_ok=True)
        prev = self.manifest(table) if self.exists(table) else None
        sid = (prev.get("snapshot_id", 0) + 1) if prev else 0
        data = os.path.join(d, f"data-{sid}")
        if os.path.exists(data):  # crashed uncommitted attempt
            shutil.rmtree(data)
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(data)
        manifest = {
            "table": table,
            "snapshot_id": sid,
            "data_dir": f"data-{sid}",
            "parent_snapshot_id": prev.get("snapshot_id") if prev else None,
            "committed_at": time.time(),
            "partition_by": partition_by or [],
            "schema": df.schema.json(),
            **(meta or {}),
        }
        with open(self._manifest_path(table, sid), "w") as f:
            json.dump(manifest, f)
        tmp = self._manifest_path(table) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, self._manifest_path(table))
        self._prune(table, current=sid)
        return manifest

    def _prune(self, table: str, current: int) -> None:
        keep = {
            m["snapshot_id"]
            for m in self.snapshots(table)[-self.keep_snapshots:]
        } | {current}
        for m in self.snapshots(table):
            sid = m["snapshot_id"]
            if sid not in keep:
                shutil.rmtree(
                    os.path.join(self._dir(table), m.get("data_dir", "data")),
                    ignore_errors=True,
                )
                os.remove(self._manifest_path(table, sid))

    def append(self, table: str, df: DataFrame, partition_by: list[str] | None = None) -> None:
        """Append into the CURRENT snapshot in place (event-log tables like
        lineage — not a new commit; use ``write``/``merge`` for versioned
        tables)."""
        if self.exists(table):
            data = self._data_dir(table)
        else:
            data = os.path.join(self._dir(table), "data-0")
        w = df.write.mode("append")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(data)
        if not self.exists(table):
            os.makedirs(self._dir(table), exist_ok=True)
            manifest = {
                "table": table,
                "snapshot_id": 0,
                "data_dir": "data-0",
                "committed_at": time.time(),
            }
            with open(self._manifest_path(table, 0), "w") as f:
                json.dump(manifest, f)
            with open(self._manifest_path(table), "w") as f:
                json.dump(manifest, f)

    def merge(
        self,
        table: str,
        df: DataFrame,
        key: list[str],
        meta: dict | None = None,
    ) -> dict:
        """Idempotent upsert-by-key: rows of ``df`` replace current rows with
        the same key; unmatched current rows are carried over. Copy-on-write
        into a new snapshot — re-running the same merge yields the same
        logical table (the reference's keyed Qdrant upsert,
        api_insert.py:88-171). The anti-join side is the incoming batch,
        typically small → Spark broadcasts it; the full-table rewrite is the
        same cost Iceberg/Delta copy-on-write MERGE pays.

        Caller contract: the batch must be key-unique — duplicate-keyed
        batch rows all land in the table (same as Iceberg MERGE, which
        errors on multiple matches; dedupe with a window argmax first if
        the source can repeat keys)."""
        if not self.exists(table):
            return self.write(table, df, meta=meta)
        cur = self.read(table)
        partition_by = self.manifest(table).get("partition_by") or None
        merged = cur.join(df.select(*key).distinct(), on=key, how="left_anti").unionByName(
            df.select(*cur.columns)
        )
        return self.write(table, merged, partition_by=partition_by, meta=meta)

    def compact(self, table: str, target_files_per_partition: int = 1) -> dict:
        """Rewrite the current snapshot with bin-packed files — the
        small-files maintenance op (Iceberg rewrite_data_files). Appends and
        many-task writes accumulate tiny parquet files whose per-file open
        cost dominates scans at scale; compaction coalesces each partition
        to ``target_files_per_partition`` and commits the result as a new
        snapshot, so the pre-compaction data stays time-travelable until
        retention prunes it. Row content is unchanged (asserted in tests)."""
        cur = self.read(table)
        partition_by = self.manifest(table).get("partition_by") or None
        if partition_by:
            from pyspark.sql import functions as F

            # hash-cluster by the partition columns: each partition value
            # lands in exactly one task → one file per dir, written in
            # parallel across dirs (no single-task coalesce bottleneck)
            packed = cur.repartition(*[F.col(c) for c in partition_by])
        else:
            packed = cur.coalesce(max(1, target_files_per_partition))
        return self.write(table, packed, partition_by=partition_by)

    def data_files(self, table: str, snapshot: int | None = None) -> list[str]:
        """Parquet data files of a snapshot (maintenance introspection)."""
        out = []
        for root, _dirs, names in os.walk(self._data_dir(table, snapshot)):
            out.extend(
                os.path.join(root, n) for n in names if n.endswith(".parquet")
            )
        return sorted(out)

    def read(self, table: str, snapshot: int | None = None) -> DataFrame:
        """Current table, or a retained snapshot pinned by id (time travel)."""
        if not self.exists(table):
            raise FileNotFoundError(f"table not committed: {table}")
        return self.spark.read.parquet(self._data_dir(table, snapshot))

    def drop(self, table: str) -> None:
        d = self._dir(table)
        if os.path.exists(d):
            shutil.rmtree(d)


def diff_snapshots(
    catalog: Catalog,
    table: str,
    key_cols: list[str],
    old_snapshot: int | None,
    new_snapshot: int | None = None,
) -> DataFrame:
    """Change-data-capture between two retained snapshots of a table: one
    row per changed key with op in {insert, delete, update} — the
    read-side completion of the keyed ``Catalog.merge`` upsert (what
    changed between the commit I processed last and now), the lakeFS
    two-commit diff analog.

    update detection hashes ALL non-key columns (sha2 of a null-tagged
    concat) on each side, so the diff needs only (key, row_hash) from both
    snapshots — a full outer join on key-sized rows, never a wide-payload
    shuffle; payloads stay in the parquet files they live in."""
    from pyspark.sql import functions as F

    def keyed(df: DataFrame) -> DataFrame:
        payload = [c for c in df.columns if c not in key_cols]
        tagged = [
            F.coalesce(F.col(c).cast("string"), F.lit("\x00null"))
            for c in sorted(payload)
        ]
        return df.select(
            *key_cols,
            F.sha2(F.concat_ws("\x01", *tagged), 256).alias("_row_hash"),
        )

    old = keyed(catalog.read(table, old_snapshot)).alias("o")
    new = keyed(catalog.read(table, new_snapshot)).alias("n")
    cond = [F.col(f"o.{k}").eqNullSafe(F.col(f"n.{k}")) for k in key_cols]
    j = old.join(new, cond, "full_outer")
    op = (
        F.when(F.col("o._row_hash").isNull(), F.lit("insert"))
        .when(F.col("n._row_hash").isNull(), F.lit("delete"))
        .when(F.col("o._row_hash") != F.col("n._row_hash"), F.lit("update"))
    )
    keys = [
        F.coalesce(F.col(f"n.{k}"), F.col(f"o.{k}")).alias(k) for k in key_cols
    ]
    return j.select(*keys, op.alias("op")).filter(F.col("op").isNotNull())
