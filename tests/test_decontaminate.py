"""Benchmark decontamination (functions/decontaminate): 13-gram
exact-overlap semantics, the no-short-doc-fallback rule, NULL handling,
min_overlap thresholds, and the broadcast-only plan shape."""

import pytest

from pyspark.sql import functions as F

from jsonschemaparse_spark.functions.decontaminate import (
    CONTAMINATED_COL,
    contaminated_ids,
    contamination_flags,
    decontaminate,
    word_ngrams,
)

W13 = "a b c d e f g h i j k l m"          # exactly 13 words
W12 = "a b c d e f g h i j k l"            # 12 words — no 13-gram


def _train(spark):
    rows = [
        (1, W13 + " tail words here"),          # contains the eval 13-gram
        (2, "x " + W13),                        # same gram, shifted window
        (3, W12 + " zz"),                       # 13 words but last differs
        (4, W12),                               # short: no 13-gram at all
        (5, None),                              # NULL text
        (6, "totally unrelated text " * 5),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _evalset(spark):
    return spark.createDataFrame([(W13,)], "text string")


def test_word_ngrams_windows(spark):
    df = spark.createDataFrame([(W13 + " n",)], "text string")
    out = df.select(word_ngrams(F.col("text"), 13).alias("g")).head()["g"]
    assert out == [W13, "b c d e f g h i j k l m n"]


def test_word_ngrams_short_and_null(spark):
    df = spark.createDataFrame([(W12,), (None,), ("",), ("  ",)], "text string")
    rows = df.select(word_ngrams(F.col("text"), 13).alias("g")).collect()
    assert all(r["g"] == [] for r in rows)


def test_flags_exact_13gram_overlap_only(spark):
    got = {
        r["doc_id"]: r[CONTAMINATED_COL]
        for r in contamination_flags(
            _train(spark), _evalset(spark), "doc_id").collect()
    }
    assert got == {1: True, 2: True, 3: False, 4: False, 5: False, 6: False}


def test_decontaminate_removes_flagged(spark):
    kept = decontaminate(_train(spark), _evalset(spark), "doc_id")
    assert sorted(r["doc_id"] for r in kept.collect()) == [3, 4, 5, 6]
    assert kept.columns == _train(spark).columns


def test_min_overlap_counts_distinct_grams(spark):
    # doc 1 shares 2 distinct 13-grams with the eval set; doc 2 shares 1
    ev = spark.createDataFrame([(W13 + " tail",)], "text string")
    ids = lambda k: sorted(
        r["doc_id"]
        for r in contaminated_ids(
            _train(spark), ev, "doc_id", min_overlap=k).collect())
    assert ids(1) == [1, 2]
    assert ids(2) == [1]


def test_empty_eval_set_flags_nothing(spark):
    ev = spark.createDataFrame([], "text string")
    out = contamination_flags(_train(spark), ev, "doc_id")
    assert out.where(CONTAMINATED_COL).count() == 0
    assert out.count() == 6


def test_plan_broadcast_only_no_corpus_shuffle(spark):
    """The corpus side must never sort-merge: both the gram match and the
    flag join-back are broadcast hash joins, so the only Exchange in the
    plan carries matched ids (O(contaminated)), never the corpus."""
    plan = contamination_flags(
        _train(spark), _evalset(spark), "doc_id")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 2
