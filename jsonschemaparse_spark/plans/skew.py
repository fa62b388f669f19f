"""Skew handling (north rule: "partitioning / shuffle / skew handled
explicitly"; SURVEY.md §7.3-5).

Web data is Zipfian in host/lang: a vanilla repartition(lang) puts ~40% of
a Common-Crawl-scale table in one partition. Tools here:

- salted_repartition: spreads heavy keys across S salt buckets.
- salted_group_count: two-stage aggregation (salted partial -> final) for
  skewed groupBy keys; result identical to a plain groupBy.
- skew_report: per-key share diagnostics so pipelines can *decide* to salt.

AQE (spark.sql.adaptive.skewJoin.enabled) already splits skewed JOIN
partitions at runtime; explicit salting remains necessary for groupBy-heavy
flows and for deterministic partition-size bounds when writing.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "_jsp_salt"


def _salt(buckets: int) -> Column:
    # deterministic salt: a key-hash salt would collide for identical keys
    # (defeating the point); use a per-row uniform draw seeded via
    # monotonically_increasing_id (stable within a run)
    return (F.abs(F.xxhash64(F.monotonically_increasing_id())) % buckets).cast("int")


def salted_repartition(df: DataFrame, keys: Sequence[str] | str, buckets: int = 16) -> DataFrame:
    """repartition(key, salt): heavy keys split across `buckets` partitions.
    Downstream per-key operations must re-combine (see salted_group_count)."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    salted = df.withColumn(SALT_COL, _salt(buckets))
    return salted.repartition(*[F.col(k) for k in keys], F.col(SALT_COL))


def salted_group_count(df: DataFrame, keys: Sequence[str] | str, buckets: int = 16) -> DataFrame:
    """Exact groupBy(keys).count() via salted two-stage aggregation:
    stage 1 aggregates (key, salt) partials — at most `buckets` rows per
    hot key per shuffle — stage 2 sums partials. Identical result to the
    direct groupBy; bounded partition sizes under arbitrary key skew.

    (Spark's own partial aggregation covers most cases; explicit salting
    matters when the *reduce* side of a hot key still overflows a task,
    e.g. count-distinct-style aggregations carrying state per key.)"""
    keys = [keys] if isinstance(keys, str) else list(keys)
    stage1 = (
        df.withColumn(SALT_COL, _salt(buckets))
        .groupBy(*keys, SALT_COL)
        .agg(F.count(F.lit(1)).alias("_partial"))
    )
    return stage1.groupBy(*keys).agg(F.sum("_partial").alias("cnt"))


def skew_report(df: DataFrame, key: str, top: int = 10) -> DataFrame:
    """(key, cnt, share) for the heaviest keys — drives the decision to
    salt. One partial-agg pass."""
    total = df.count()
    return (
        df.groupBy(F.col(key).alias("key"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("share", F.round(F.col("cnt") / F.lit(total), 4))
        .orderBy(F.desc("cnt"))
        .limit(top)
    )
