"""Bigram LM perplexity (functions/lm.py): hand-computed smoothing,
OOV backoff, short-doc NULL convention, cap accounting, and the
broadcast plan shape."""

import math

import pytest
from pyspark.sql import functions as F

from jsonschemaparse_spark.functions.lm import lm_perplexity, train_bigram_lm


@pytest.fixture(scope="module")
def lm(spark):
    train = spark.createDataFrame(
        [(1, "a b a b"), (2, "a c")], "doc_id long, text string")
    return train_bigram_lm(train, alpha=0.5, id_col="doc_id")


def _score(spark, lm_, text):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return lm_perplexity(df, lm_, "doc_id").collect()[0]


def test_counts_and_vocab(lm):
    bg = {(r["w1"], r["w2"]): r["n"] for r in lm.bigrams.collect()}
    assert bg == {("a", "b"): 2, ("b", "a"): 1, ("a", "c"): 1}
    ug = {r["w1"]: r["n"] for r in lm.unigrams.collect()}
    assert ug == {"a": 3, "b": 1}          # histories, not raw tokens
    assert lm.vocab_size == 3 and lm.n_dropped == 0


def test_hand_computed_seen_bigram(spark, lm):
    # P(b|a) = (2 + 0.5) / (3 + 0.5*3) = 2.5/4.5
    r = _score(spark, lm, "a b")
    assert r["n_bigrams"] == 1
    assert r["log2_ppl"] == pytest.approx(-math.log2(2.5 / 4.5))
    assert r["perplexity"] == pytest.approx(4.5 / 2.5)


def test_unseen_bigram_and_history_backoff(spark, lm):
    # (b, c) unseen with seen history b: (0+0.5)/(1+1.5) = 0.2
    r = _score(spark, lm, "b c")
    assert r["log2_ppl"] == pytest.approx(-math.log2(0.5 / 2.5))
    # fully-OOV history z: (0+0.5)/(0+1.5) = 1/3 = 1/V
    r = _score(spark, lm, "z z")
    assert r["log2_ppl"] == pytest.approx(-math.log2(1.0 / 3.0))


def test_mean_over_positions(spark, lm):
    # 'a b a': bigrams (a,b) then (b,a); mean of the two -log2 probs
    pa = 2.5 / 4.5
    pb = (1 + 0.5) / (1 + 1.5)
    r = _score(spark, lm, "a b a")
    assert r["n_bigrams"] == 2
    assert r["log2_ppl"] == pytest.approx(
        (-math.log2(pa) - math.log2(pb)) / 2)


def test_short_and_null_docs_score_null(spark, lm):
    df = spark.createDataFrame(
        [(1, "solo"), (2, ""), (3, None)], "doc_id long, text string")
    rows = {r["doc_id"]: r for r in lm_perplexity(df, lm, "doc_id").collect()}
    for i in (1, 2, 3):
        assert rows[i]["n_bigrams"] == 0
        assert rows[i]["log2_ppl"] is None
        assert rows[i]["perplexity"] is None


def test_in_distribution_beats_garbage(spark, lm):
    good = _score(spark, lm, "a b a b a c")["perplexity"]
    bad = _score(spark, lm, "q r s t u v")["perplexity"]
    assert good < bad


def test_max_bigrams_cap_reported_and_scores_as_unseen(spark):
    train = spark.createDataFrame(
        [(1, "a b a b a c")], "doc_id long, text string")
    capped = train_bigram_lm(train, alpha=0.5, id_col="doc_id",
                             max_bigrams=1)
    # (a,b):2 kept; (b,a):1, (a,c):1 dropped
    assert capped.n_dropped == 2
    assert capped.bigrams.count() == 1
    r = _score(spark, capped, "a c")
    # (a,c) now scores as unseen: (0+0.5)/(3+1.5)
    assert r["log2_ppl"] == pytest.approx(-math.log2(0.5 / 4.5))


def test_plan_broadcasts_model(spark, lm):
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    plan = lm_perplexity(df, lm, "doc_id") \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 2
    assert "EvalPython" not in plan


def test_lm_buckets_thresholds_path(spark, lm):
    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "b c"), (3, "z z"), (4, "solo")],
        "doc_id long, text string")
    scored = lm_perplexity(df, lm, "doc_id")
    from jsonschemaparse_spark.functions.lm import lm_buckets

    vals = {r["doc_id"]: r["log2_ppl"] for r in scored.collect()}
    # cut exactly between the sorted finite scores
    s = sorted(v for v in vals.values() if v is not None)
    thr = [(s[0] + s[1]) / 2, (s[1] + s[2]) / 2]
    out = {r["doc_id"]: r["lm_bucket"]
           for r in lm_buckets(scored, thresholds=thr).collect()}
    ranked = sorted((v, k) for k, v in vals.items() if v is not None)
    assert out[ranked[0][1]] == 0
    assert out[ranked[1][1]] == 1
    assert out[ranked[2][1]] == 2
    assert out[4] is None                     # unscoreable: no bucket


def test_lm_buckets_approx_path_monotonic(spark, lm):
    rows = [(i, " ".join(["a b"] * (i % 7 + 1)) + (" z" * (i % 5)))
            for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    scored = lm_perplexity(df, lm, "doc_id")
    from jsonschemaparse_spark.functions.lm import lm_buckets

    out = lm_buckets(scored).collect()
    got = [(r["log2_ppl"], r["lm_bucket"]) for r in out
           if r["log2_ppl"] is not None]
    got.sort()
    buckets = [b for _, b in got]
    assert buckets == sorted(buckets)          # monotonic in score
    assert set(buckets) == {0, 1, 2}
