"""Bucketed-layout helpers: the 100-TB shuffle-elimination story.

At 10^12 rows the dominant cost of exact dedup, uniqueness and referential
checks is the shuffle on the key. Spark's bucketed tables fix the physical
layout at WRITE time (hash(key) % n_buckets files per partition), so every
later groupBy/join on that key reads co-located data and Catalyst drops the
Exchange entirely — verified by plan-shape tests (tests/test_bucketing.py
asserts zero Exchange nodes).

This is the parquet/warehouse analog of the Iceberg layout SURVEY.md §6
prescribes (bucket transforms on content_key / custkey); the API here is
engine-side so a real deployment only swaps the catalog.

Sizing guidance (100 TB): n_buckets ≈ table_bytes / (target 256 MB per
bucket file per partition-write); buckets must be a multiple of the
downstream parallelism to avoid stragglers. Both sides of a co-located
join must share n_buckets and key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def drop_table_and_location(spark: SparkSession, table: str) -> None:
    """Idempotent managed-table cleanup: a non-Hive catalog is
    in-memory, so a fresh session can find the managed-table LOCATION
    on disk without the table being in the catalog — overwrite then
    fails with LOCATION_ALREADY_EXISTS. Drop both the catalog entry
    and any orphaned location."""
    import shutil
    from pathlib import Path

    spark.sql(f"DROP TABLE IF EXISTS {table}")
    wh = Path(spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
              .removeprefix("file:"))
    parts = [p.lower() for p in table.split(".")]
    # db-qualified names live under <warehouse>/<db>.db/<table>
    loc = wh / parts[-1] if len(parts) == 1 else wh / f"{parts[-2]}.db" / parts[-1]
    shutil.rmtree(loc, ignore_errors=True)


def write_bucketed(df: DataFrame, table: str, key: str, n_buckets: int,
                   sort: bool = True) -> None:
    """Persist as a bucketed (optionally bucket-sorted) managed table.
    Sorting within buckets additionally enables exchange-AND-sort-free
    sort-merge joins."""
    spark = df.sparkSession
    drop_table_and_location(spark, table)
    w = df.write.mode("overwrite").bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def bucketed_group_count(spark: SparkSession, table: str, key: str) -> DataFrame:
    """groupBy(key).count() over a bucketed table: partial aggregation is
    already final per bucket — the plan has NO Exchange."""
    return spark.table(table).groupBy(key).agg(F.count(F.lit(1)).alias("cnt"))


def bucketed_exact_duplicate_groups(spark: SparkSession, table: str,
                                    key_col: str, content_col: str = "content_key",
                                    min_count: int = 2) -> DataFrame:
    """Exact-dup groups over a table bucketed by content_col: same contract
    as functions.dedup.exact_duplicate_groups but with the groupBy shuffle
    eliminated by layout."""
    return (
        spark.table(table)
        .groupBy(content_col)
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.min(key_col).alias("keep_id"))
        .filter(F.col("n_docs") >= min_count)
    )


def bucketed_referential_violations(spark: SparkSession, child_table: str,
                                    child_key: str, parent_table: str,
                                    parent_key: str) -> DataFrame:
    """Orphan rows via left_anti over two co-bucketed tables: with matching
    bucket spec on both sides the sort-merge anti-join runs without any
    Exchange (each task joins bucket i against bucket i)."""
    child = spark.table(child_table)
    parent = spark.table(parent_table).select(parent_key)
    return child.join(
        parent, on=child[child_key] == parent[parent_key], how="left_anti"
    )
