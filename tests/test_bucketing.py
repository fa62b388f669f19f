"""Plan-shape proof that bucketed layout eliminates the key shuffle
(plans/bucketing.py — the 100-TB design for exact dedup / referential).

Each test asserts BOTH the result (against a plain-DataFrame recompute)
and the physical plan (zero Exchange nodes when reading bucketed tables).
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from jsonschemaparse_spark.plans.bucketing import (
    bucketed_exact_duplicate_groups,
    bucketed_group_count,
    bucketed_referential_violations,
    write_bucketed,
)


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    docs = spark.range(0, 1000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 100).cast("string").alias("content_key"),
    )
    write_bucketed(docs, "jsp_test_docs_b", "content_key", 4)

    orders = spark.range(0, 500).select(
        F.col("id").alias("o_orderkey"),
        (F.col("id") % 120).alias("o_custkey"),
    )
    customer = spark.range(0, 100).select(F.col("id").alias("c_custkey"))
    write_bucketed(orders, "jsp_test_orders_b", "o_custkey", 4)
    write_bucketed(
        customer.withColumn("o_custkey", F.col("c_custkey")),
        "jsp_test_customer_b", "o_custkey", 4,
    )
    yield
    for t in ("jsp_test_docs_b", "jsp_test_orders_b", "jsp_test_customer_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bucketed_group_count_no_exchange(spark, bucketed_tables):
    out = bucketed_group_count(spark, "jsp_test_docs_b", "content_key")
    plan = _plan(out)
    assert "Exchange" not in plan, plan
    rows = {r["content_key"]: r["cnt"] for r in out.collect()}
    assert len(rows) == 100 and all(c == 10 for c in rows.values())


def test_bucketed_exact_dup_groups_no_exchange(spark, bucketed_tables):
    out = bucketed_exact_duplicate_groups(
        spark, "jsp_test_docs_b", "doc_id", "content_key")
    plan = _plan(out)
    assert "Exchange" not in plan, plan
    rows = out.collect()
    assert len(rows) == 100
    for r in rows:
        assert r["n_docs"] == 10
        # keep_id is the min doc_id of the group = the content_key value
        assert r["keep_id"] == int(r["content_key"])


def test_bucketed_referential_no_exchange(spark, bucketed_tables):
    # At test scale the planner rightly broadcasts the tiny parent; the
    # bucketed layout matters in the 100-TB case where the parent is far
    # beyond broadcast, so disable broadcast to get the at-scale
    # sort-merge shape and assert the co-located join needs NO Exchange
    # (and, with sortBy at write time, no Sort either).
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out = bucketed_referential_violations(
            spark, "jsp_test_orders_b", "o_custkey",
            "jsp_test_customer_b", "o_custkey")
        plan = _plan(out)
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan, plan
        got = {r["o_orderkey"] for r in out.collect()}
        # orphans: o_custkey in [100, 120) — custkeys only cover [0, 100)
        expect = {i for i in range(500) if i % 120 >= 100}
        assert got == expect
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
