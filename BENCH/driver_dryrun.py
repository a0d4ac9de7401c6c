"""Replicate the driver's correctness gate ahead of time: run every
__spark_entry__ queries() entry at the driver's sf (default sf0.01), compare
oracle-backed ones against DuckDB with the driver's column-sorted value
hash, and smoke the rows-only ones. One line per query; exit 1 on any
mismatch.

Usage: python BENCH/driver_dryrun.py [sf_dir] [query_name ...]
(query names restrict the run to that subset — fast iteration on new
entries; the full gate is the no-args form)
"""

from __future__ import annotations

import hashlib
import math
import sys

import duckdb

sys.path.insert(0, ".")

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def _norm(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6g}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def _vhash(rows, cols) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x01".join(_norm(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\x02")
    return h.hexdigest()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    import __spark_entry__ as entry_mod
    from raptor_spark.session import build_session

    spark = build_session("driver_dryrun")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    subset = set(sys.argv[2:])
    if subset:
        unknown = subset - set(queries)
        if unknown:
            sys.exit(f"unknown queries: {sorted(unknown)}")
        queries = {k: v for k, v in queries.items() if k in subset}
    fails: list[str] = []
    for name in sorted(queries):
        try:
            sdf = queries[name](spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            if name in oracles:
                res = con.execute(oracles[name])
                dcols = [d[0] for d in res.description]
                drows = res.fetchall()
                ok = (
                    sorted(scols) == sorted(dcols)
                    and len(srows) == len(drows)
                    and _vhash(srows, scols) == _vhash(drows, dcols)
                )
                print(("OK  " if ok else "FAIL"), name, len(srows), flush=True)
                if not ok:
                    fails.append(name)
            else:
                print("OK  (rows-only)", name, len(srows), flush=True)
        except Exception as e:  # noqa: BLE001 — report and continue
            print("ERR ", name, str(e)[:160], flush=True)
            fails.append(name)

    n = entry_mod.entry(spark).count()
    print("entry rows:", n, flush=True)
    print("FAILS:", fails)
    spark.stop()
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
