"""Local emulation of the driver's correctness gate: run each contract query
in Spark AND its DuckDB oracle at a given sf dir, compare row count, column
names, and exact (order-insensitive) values.

Usage: python scripts/check_contract.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return float(v)
    if hasattr(v, "as_integer_ratio") and not isinstance(v, (int, float)):
        return float(v)  # Decimal
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    return v

def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out, key=repr)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from elastic_indexer4s_spark import driver_contract as dc

    spark = (SparkSession.builder.master("local[8]")
             .appName("contract-check")
             .config("spark.sql.shuffle.partitions", "16")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "false")
             .config("spark.ui.showConsoleProgress", "false")
             .config("spark.driver.memory", "8g")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    failures = []
    for name, fn in dc.QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            sdf = fn(spark, sf_dir)
            scols = list(sdf.columns)
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name:24s} spark error: {e}")
            continue
        sql = dc.ORACLES.get(name)
        if sql is None:
            status = "ROWS-ONLY"
            print(f"{status:9s} {name:24s} rows={len(srows)} "
                  f"({time.monotonic()-t0:.1f}s)")
            if len(srows) == 0 and name != "engine_bm25_wand":
                failures.append(name)
            continue
        try:
            res = con.execute(sql)
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name:24s} duckdb error: {e}")
            continue
        sc, sv = norm_rows(scols, srows)
        oc, ov = norm_rows(ocols, orows)
        dt = time.monotonic() - t0
        if sc != oc:
            failures.append(name)
            print(f"FAIL  {name:24s} columns differ: spark={sc} duckdb={oc}")
        elif len(sv) != len(ov):
            failures.append(name)
            print(f"FAIL  {name:24s} rowcount spark={len(sv)} duckdb={len(ov)}")
        elif sv != ov:
            failures.append(name)
            diffs = [(a, b) for a, b in zip(sv, ov) if a != b][:3]
            print(f"FAIL  {name:24s} values differ; first diffs: {diffs}")
        else:
            print(f"OK    {name:24s} rows={len(sv)} ({dt:.1f}s)")

    print(f"\n{'ALL OK' if not failures else 'FAILURES: ' + ', '.join(failures)}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
