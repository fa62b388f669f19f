"""TF-IDF + top-k keywords (functions/tfidf.py): hand-computed
smooth-idf pins, min_df pruning, deterministic tie-break, NULL
convention, and the broadcast-join plan pin."""

import math

import pytest
from pyspark.sql import functions as F

from jsonschemaparse_spark.functions.tfidf import term_counts, tf_idf, top_keywords


def _corpus(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")


def test_hand_computed_tfidf(spark):
    df = _corpus(spark, ["a a b", "b c", "c"])
    rows = {(r["doc_id"], r["token"]): r for r in tf_idf(df).collect()}
    # N=3; df(a)=1, df(b)=2, df(c)=2
    assert rows[(0, "a")]["tf"] == 2 and rows[(0, "a")]["df"] == 1
    assert rows[(0, "a")]["tfidf"] == round(2 * (math.log(4 / 2) + 1), 6)
    assert rows[(0, "b")]["tfidf"] == round(1 * (math.log(4 / 3) + 1), 6)
    assert rows[(1, "c")]["tfidf"] == rows[(2, "c")]["tfidf"]
    assert len(rows) == 5


def test_min_df_prunes_before_join(spark):
    df = _corpus(spark, ["a a b", "b c", "c"])
    toks = {r["token"] for r in tf_idf(df, min_df=2).collect()}
    assert toks == {"b", "c"}


def test_top_keywords_tiebreak_and_k(spark):
    # doc 0: 'x' and 'y' tie exactly (same tf, same df) -> token asc
    df = _corpus(spark, ["x y", "x y z"])
    out = top_keywords(df, k=2)
    d0 = [(r["rank"], r["token"]) for r in
          out.filter(F.col("doc_id") == 0).orderBy("rank").collect()]
    assert d0 == [(1, "x"), (2, "y")]
    # k truncates: doc 1 has 3 terms but only 2 rows
    assert out.filter(F.col("doc_id") == 1).count() == 2


def test_top_keywords_prefers_rare_terms(spark):
    # 'rare' appears once in one doc; 'common' in every doc
    df = _corpus(spark, ["common rare", "common", "common"])
    top = top_keywords(df, k=1).filter(F.col("doc_id") == 0).first()
    assert top["token"] == "rare"


def test_null_and_empty_docs_emit_nothing(spark):
    df = spark.createDataFrame(
        [(0, None), (1, ""), (2, "a")], "doc_id long, text string")
    out = tf_idf(df)
    assert {r["doc_id"] for r in out.collect()} == {2}


def test_term_counts_normalizes_like_dedup(spark):
    df = _corpus(spark, ["  The   THE the  "])
    rows = term_counts(df).collect()
    assert len(rows) == 1 and rows[0]["token"] == "the" and rows[0]["tf"] == 3


def test_plan_broadcasts_df_table(spark, documents):
    out = tf_idf(documents.limit(50))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
