"""Incremental snapshot dedup (functions/snapshot.py): Bloom routing is
an optimization only — the result is always exact anti-join semantics."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR

from jsonschemaparse_spark.functions import snapshot
from jsonschemaparse_spark.functions.dedup import content_key


@pytest.fixture(scope="module")
def corpus(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    # web corpora always contain NULL-text and empty rows — synthesize them
    extra = spark.createDataFrame(
        [(9000001, None, "xx", "synth", 0), (9000002, "", "xx", "synth", 0)],
        schema=docs.schema,
    )
    return docs.unionByName(extra)


def _ids(df):
    return sorted(r["doc_id"] for r in df.select("doc_id").collect())


def test_bloom_equals_exact(spark, corpus):
    seen = corpus.filter(F.col("doc_id") % 2 == 0)
    new = corpus.filter(F.col("doc_id") % 3 == 0)
    bloom = snapshot.incremental_dedup(new, seen)
    exact = snapshot.incremental_dedup(new, seen, mode="exact")
    assert bloom.columns == new.columns
    assert _ids(bloom) == _ids(exact)
    # sanity: the overlap (doc_id % 6 == 0 shares the exact text) was dropped
    surv = set(_ids(bloom))
    overlap = {r["doc_id"] for r in new.filter(F.col("doc_id") % 6 == 0)
               .select("doc_id").collect()}
    assert not (surv & overlap)


def test_prefilter_seen_equivalent(spark, corpus):
    seen = corpus.filter(F.col("doc_id") % 2 == 0)
    new = corpus.filter(F.col("doc_id") % 3 == 0)
    a = snapshot.incremental_dedup(new, seen, prefilter_seen=True)
    b = snapshot.incremental_dedup(new, seen, mode="exact")
    assert _ids(a) == _ids(b)


def test_no_false_negatives_jvm_vs_numpy(spark, corpus):
    """The JVM bit_or build and the numpy probe must hit identical bits:
    probing the exact key set the Bloom was built from yields ZERO
    negatives (a single disagreeing bit would leak a seen row through)."""
    keys = corpus.select(content_key(F.col("text")).alias("_ik"))
    bloom = snapshot.build_key_bloom(keys, "_ik", fpp=0.001)
    probed = keys.withColumn(
        "hit", snapshot.bloom_probe_column(spark, bloom, F.col("_ik")))
    n_miss = probed.filter(~F.col("hit")).count()
    assert n_miss == 0


def test_null_text_keys_like_empty(spark, corpus):
    """KEYING convention (dedup.py): NULL text == '' — a NULL-text new row
    is a dup of an empty-text seen row and must be dropped."""
    seen = corpus.filter(F.col("doc_id") == 9000002)  # text = ''
    new = corpus.filter(F.col("doc_id") == 9000001)   # text = NULL
    for mode in ("bloom", "exact"):
        assert snapshot.incremental_dedup(new, seen, mode=mode).count() == 0


def test_empty_seen_passes_everything(spark, corpus):
    seen = corpus.filter(F.lit(False))
    new = corpus.filter(F.col("doc_id") % 3 == 0)
    out = snapshot.incremental_dedup(new, seen, expected_items=1)
    assert _ids(out) == _ids(new)


def test_bloom_parameters_shape():
    m, k = snapshot.bloom_parameters(1000, fpp=0.01)
    assert m % 64 == 0 and m >= 9000 and 1 <= k <= 16
    # cap respected, k recomputed against the capped m
    m2, k2 = snapshot.bloom_parameters(10**12, fpp=0.01, max_bits=1 << 20)
    assert m2 == 1 << 20 and k2 == 1


def test_stats_funnel(spark, corpus):
    seen = corpus.filter(F.col("doc_id") % 2 == 0)
    new = corpus.filter(F.col("doc_id") % 3 == 0)
    st = snapshot.incremental_dedup_stats(new, seen)
    assert st["n_new"] == new.count()
    assert st["n_bloom_negative"] + st["n_bloom_positive"] == st["n_new"]
    assert st["n_false_positive"] == st["n_bloom_positive"] - st["n_true_dup"]
    # no false negatives: every true dup must have tested positive
    seen_keys = seen.select(content_key(F.col("text")).alias("_ik")).distinct()
    true_dups = (
        new.select(content_key(F.col("text")).alias("_ik"))
        .join(seen_keys, on="_ik", how="left_semi").count()
    )
    assert st["n_true_dup"] == true_dups
    assert 0.0 <= st["fp_rate"] < 0.1


def test_might_contain_numpy_bounds():
    """Probe math stays in-range for the extreme int64 hash values."""
    bloom = snapshot.KeyBloom(
        n_bits=128, n_hashes=3, words=np.zeros(2, dtype=np.int64))
    h = np.array([np.iinfo(np.int64).min, -1, 0, np.iinfo(np.int64).max],
                 dtype=np.int64)
    out = bloom.might_contain(h, h[::-1].copy())
    assert out.dtype == bool and not out.any()  # empty bitmap: all negative


def test_bloom_save_load_reuse(spark, corpus, tmp_path):
    """The snapshot-artifact shape: build once, persist, reuse per batch.
    The reusable bitmap is keyed on probe_key (normalized text), the
    contract incremental_dedup(bloom=...) documents."""
    seen = corpus.filter(F.col("doc_id") % 2 == 0)
    new = corpus.filter(F.col("doc_id") % 3 == 0)
    keys = seen.select(snapshot.probe_key(F.col("text")).alias("_pk"))
    bloom = snapshot.build_key_bloom(keys, "_pk")
    p = str(tmp_path / "seen.bloom")
    snapshot.save_bloom(bloom, p)
    loaded = snapshot.load_bloom(p)
    assert loaded.n_bits == bloom.n_bits and loaded.n_hashes == bloom.n_hashes
    assert (loaded.words == bloom.words).all()
    out = snapshot.incremental_dedup(new, seen, bloom=loaded)
    ref = snapshot.incremental_dedup(new, seen, mode="exact")
    assert _ids(out) == _ids(ref)


def test_no_inferred_probe_on_seen_side(spark, corpus):
    """InferFiltersFromConstraints must NOT copy the (always-true) probe
    filter onto the snapshot side: the plan carries exactly two
    ArrowEvalPython nodes — one per batch branch of the union — and the
    seen side stays a plain scan->project->join (the probe is keyed on a
    strict subexpression of the join key precisely to pin this)."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")  # single
    # source: the union-fixture corpus would double the probe count by
    # legitimately pushing it into each union branch
    seen = docs.filter(F.col("doc_id") % 2 == 0)
    new = docs.filter(F.col("doc_id") % 3 == 0)
    out = snapshot.incremental_dedup(new, seen)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("ArrowEvalPython") == 2, plan


def test_mismatched_bloom_rejected(spark, corpus):
    """A prebuilt Bloom keyed on the WRONG expression (here: the md5 join
    key instead of probe_key) would silently leak dups through the
    negative branch — the runtime sample guard must catch it."""
    seen = corpus.filter(F.col("doc_id") % 2 == 0)
    new = corpus.filter(F.col("doc_id") % 3 == 0)
    wrong = snapshot.build_key_bloom(
        seen.select(content_key(F.col("text")).alias("_ik")), "_ik")
    with pytest.raises(ValueError, match="probe_key"):
        snapshot.incremental_dedup(new, seen, bloom=wrong).count()


def test_bloom_no_false_negatives_property(spark):
    """Property: for arbitrary unicode keys (astral chars, quotes,
    whitespace runs, empties), building over A and probing A yields all
    positives. Run as one batched Spark round-trip per example set to
    keep it fast; hypothesis drives the key corpus."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(max_examples=10, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(st.lists(st.text(min_size=0, max_size=40), min_size=1,
                    max_size=30))
    def check(keys):
        df = spark.createDataFrame([(k,) for k in keys], "t: string")
        pk = snapshot.probe_key(F.col("t"))
        bloom = snapshot.build_key_bloom(df.select(pk.alias("_pk")), "_pk",
                                         expected_items=len(keys))
        miss = (df.withColumn("hit",
                              snapshot.bloom_probe_column(spark, bloom, pk))
                .filter(~F.col("hit")).count())
        assert miss == 0

    check()


def test_bad_mode_raises(spark, corpus):
    with pytest.raises(ValueError):
        snapshot.incremental_dedup(corpus, corpus, mode="nope")
