"""Local stand-in for the driver's correctness gate: run every
__spark_entry__.queries() entry and its oracle_sql() twin at sf0.01,
compare row count + column names + order-insensitive value multiset.

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    import datetime
    import math

    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, list):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def fingerprint(rows: list[dict]) -> str:
    import hashlib

    lines = sorted(
        "|".join(f"{k}={norm_cell(v)}" for k, v in sorted(r.items())) for r in rows
    )
    return hashlib.md5("\n".join(lines).encode()).hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("oracle-check")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "6g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entry.queries()
    oracles = entry.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir)
        srows = [r.asDict() for r in sdf.collect()]
        if name not in oracles:
            print(f"  {name:28s} rows-only: {len(srows)} rows")
            continue
        ocols = None
        rel = con.sql(oracles[name])
        ocols = rel.columns
        orows = [dict(zip(ocols, row)) for row in rel.fetchall()]
        ok_count = len(srows) == len(orows)
        ok_schema = sorted(sdf.columns) == sorted(ocols)
        fp_s, fp_o = fingerprint(srows), fingerprint(orows)
        ok_hash = fp_s == fp_o
        status = "OK " if (ok_count and ok_schema and ok_hash) else "FAIL"
        schema_msg = "ok" if ok_schema else f"{sorted(sdf.columns)}!={sorted(ocols)}"
        hash_msg = "ok" if ok_hash else f"{fp_s[:8]}!={fp_o[:8]}"
        print(
            f"  {name:28s} {status} rows {len(srows)}/{len(orows)} "
            f"schema={schema_msg} hash={hash_msg}"
        )
        if status == "FAIL":
            failures.append(name)
            # show first differing rows for debugging
            s_set = {tuple(sorted((k, norm_cell(v)) for k, v in r.items())) for r in srows}
            o_set = {tuple(sorted((k, norm_cell(v)) for k, v in r.items())) for r in orows}
            for label, diff in (("spark-only", s_set - o_set), ("oracle-only", o_set - s_set)):
                for row in list(diff)[:3]:
                    print(f"      {label}: {dict(row)}")
    spark.stop()
    print("FAILURES:", failures if failures else "none")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
