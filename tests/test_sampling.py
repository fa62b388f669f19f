"""Deterministic hash sampling (functions/sampling): rate accuracy,
partition-layout invariance (the reason this exists instead of
df.sample), stratified mixture rates, split stability, and the DuckDB
md5 differential."""

import duckdb
import pytest

from pyspark.sql import functions as F

from jsonschemaparse_spark.functions.sampling import (
    deterministic_sample,
    hash_keep,
    sample_oracle_sql,
    stratified_sample,
    threshold_hex,
    train_test_split,
)


def test_threshold_hex_edges():
    assert threshold_hex(0.0) == "00000000"
    assert threshold_hex(-3.0) == "00000000"
    assert threshold_hex(1.0) is None
    assert threshold_hex(0.5) == "80000000"


def test_rate_accuracy(spark, documents):
    n = documents.count()
    for frac in (0.1, 0.5, 0.9):
        kept = deterministic_sample(documents, frac, "doc_id").count()
        assert abs(kept / n - frac) < 0.08, (frac, kept, n)
    assert deterministic_sample(documents, 0.0, "doc_id").count() == 0
    assert deterministic_sample(documents, 1.0, "doc_id").count() == n


def test_partition_layout_invariance(spark, documents):
    """The kept ROW SET (not just the count) is identical across
    partition layouts — the property Spark's RNG samplers lack and the
    100-TB rebuild requires."""
    base = {r["doc_id"] for r in
            deterministic_sample(documents, 0.3, "doc_id")
            .select("doc_id").collect()}
    for layout in (documents.repartition(37),
                   documents.coalesce(1),
                   documents.repartition(8, "lang")):
        got = {r["doc_id"] for r in
               deterministic_sample(layout, 0.3, "doc_id")
               .select("doc_id").collect()}
        assert got == base


def test_seed_changes_sample(spark, documents):
    a = {r["doc_id"] for r in deterministic_sample(
        documents, 0.3, "doc_id", seed=0).select("doc_id").collect()}
    b = {r["doc_id"] for r in deterministic_sample(
        documents, 0.3, "doc_id", seed=1).select("doc_id").collect()}
    assert a != b and abs(len(a) - len(b)) < 0.2 * max(len(a), 1)


def test_stratified_rates(spark, documents):
    fractions = {"en": 0.9, "de": 0.25}
    out = stratified_sample(documents, fractions, "lang", "doc_id")
    got = {r["lang"]: r["n"] for r in
           out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    totals = {r["lang"]: r["n"] for r in
              documents.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    for lang, frac in fractions.items():
        assert abs(got.get(lang, 0) / totals[lang] - frac) < 0.12, lang
    # unlisted strata take default_fraction=0.0
    assert set(got) <= set(fractions)


def test_stratified_keep_all_and_default(spark):
    df = spark.createDataFrame(
        [(i, ["a", "b", None][i % 3]) for i in range(300)],
        "k long, s string")
    out = stratified_sample(df, {"a": 1.0}, "s", "k",
                            default_fraction=0.5)
    got = {r["s"]: r["n"] for r in
           out.groupBy("s").agg(F.count("*").alias("n")).collect()}
    assert got["a"] == 100          # keep-all sentinel keeps every row
    assert 25 <= got.get("b", 0) <= 75
    assert 25 <= got.get(None, 0) <= 75  # NULL stratum -> default rate


def test_train_test_split_stable_and_disjoint(spark, documents):
    s1 = train_test_split(documents, "doc_id", 0.2)
    s2 = train_test_split(documents.repartition(13), "doc_id", 0.2)
    m1 = {r["doc_id"]: r["split"] for r in s1.select("doc_id", "split").collect()}
    m2 = {r["doc_id"]: r["split"] for r in s2.select("doc_id", "split").collect()}
    assert m1 == m2
    n_test = sum(1 for v in m1.values() if v == "test")
    assert abs(n_test / len(m1) - 0.2) < 0.08


def test_null_key_hashes_like_empty(spark):
    df = spark.createDataFrame([(None,), ("",), ("x",)], "k string")
    out = df.select("k", hash_keep(F.col("k"), 0.5, 7).alias("keep")).collect()
    by_k = {r["k"]: r["keep"] for r in out}
    assert by_k[None] == by_k[""]  # keying convention: NULL == ''


def test_duckdb_differential(spark, documents):
    """Spark's kept id set == DuckDB's for the same (fraction, seed) —
    md5 hex + ASCII string compare are engine-identical."""
    pred = sample_oracle_sql("doc_id", 0.37, seed=5)
    oracle = {
        r[0] for r in duckdb.sql(
            "SELECT doc_id FROM '/root/testdata/sf0.001/documents.parquet' "
            f"WHERE {pred}").fetchall()
    }
    got = {r["doc_id"] for r in deterministic_sample(
        documents, 0.37, "doc_id", seed=5).select("doc_id").collect()}
    assert got == oracle and got


def test_narrow_plan_no_shuffle(spark, documents):
    plan = (stratified_sample(documents, {"en": 0.9, "de": 0.2}, "lang",
                              "doc_id")
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan and "Python" not in plan


def test_temperature_rates_flatten_and_cap(spark):
    from jsonschemaparse_spark.functions.sampling import temperature_rates

    rows = ([("big", i) for i in range(900)]
            + [("small", i) for i in range(100)])
    df = spark.createDataFrame(rows, "src string, k long")
    rates = temperature_rates(df, "src", alpha=0.5, target_fraction=0.5)
    # alpha=0.5 shares: sqrt(900)=30, sqrt(100)=10 -> 3:1 of 500 target
    # big: 375/900, small: 125/100 -> capped at 1.0
    assert rates["small"] == 1.0
    assert abs(rates["big"] - 375.0 / 900.0) < 1e-12
    # alpha=1 reproduces the natural distribution (uniform rate)
    r1 = temperature_rates(df, "src", alpha=1.0, target_fraction=0.5)
    assert abs(r1["big"] - 0.5) < 1e-12 and abs(r1["small"] - 0.5) < 1e-12


def test_temperature_mixture_kept_set_deterministic(spark, documents):
    from jsonschemaparse_spark.functions.sampling import temperature_mixture

    a = temperature_mixture(documents, "lang", "doc_id", alpha=0.5,
                            target_fraction=0.3)
    b = temperature_mixture(documents.repartition(17), "lang", "doc_id",
                            alpha=0.5, target_fraction=0.3)
    ka = {r["doc_id"] for r in a.select("doc_id").collect()}
    kb = {r["doc_id"] for r in b.select("doc_id").collect()}
    assert ka == kb and len(ka) > 0


def test_temperature_mixture_hits_target_and_flattens(spark, documents):
    from pyspark.sql import functions as F
    from jsonschemaparse_spark.functions.sampling import temperature_mixture

    n = documents.count()
    kept = temperature_mixture(documents, "lang", "doc_id", alpha=0.25,
                               target_fraction=0.4)
    k = kept.count()
    assert abs(k - 0.4 * n) < 0.05 * n
    # flattening: the dominant lang's kept share < its natural share
    nat = documents.groupBy("lang").count().orderBy(F.desc("count")).first()
    kept_dom = kept.filter(F.col("lang") == nat["lang"]).count()
    assert kept_dom / k < nat["count"] / n


def test_temperature_rates_empty_and_null_strata(spark):
    from jsonschemaparse_spark.functions.sampling import (
        temperature_mixture,
        temperature_rates,
    )

    empty = spark.createDataFrame([], "src string, k long")
    assert temperature_rates(empty, "src", target_fraction=0.5) == {}
    nulls = spark.createDataFrame(
        [(None, 1), ("a", 2), ("a", 3)], "src string, k long")
    # NULL strata excluded from rates and dropped by the filter
    out = temperature_mixture(nulls, "src", "k", target_fraction=1.0)
    assert {r["src"] for r in out.collect()} == {"a"}


def test_group_samples_deterministic_and_bounded(spark, documents):
    from pyspark.sql import functions as F
    from jsonschemaparse_spark.functions.sampling import group_samples

    a = group_samples(documents, "lang", "doc_id", k=3)
    b = group_samples(documents.repartition(11), "lang", "doc_id", k=3)
    sa = {(r["lang"], r["sample_rank"], r["doc_id"]) for r in
          a.select("lang", "sample_rank", "doc_id").collect()}
    sb = {(r["lang"], r["sample_rank"], r["doc_id"]) for r in
          b.select("lang", "sample_rank", "doc_id").collect()}
    assert sa == sb
    per = a.groupBy("lang").count().collect()
    assert all(r["count"] <= 3 for r in per) and len(per) >= 2
    # schema preserved + rank column appended
    assert set(a.columns) == set(documents.columns) | {"sample_rank"}


def test_group_samples_prefix_stable_under_prethinning(spark, documents):
    """The documented composition: pre-thinning with the SAME keyed hash
    keeps the same final top-k whenever >= k rows per stratum survive
    (hash-order prefixes are stable under hash-threshold filtering)."""
    from jsonschemaparse_spark.functions.sampling import (
        deterministic_sample,
        group_samples,
    )

    full = {(r["lang"], r["doc_id"]) for r in
            group_samples(documents, "lang", "doc_id", k=2)
            .select("lang", "doc_id").collect()}
    thin = {(r["lang"], r["doc_id"]) for r in
            group_samples(deterministic_sample(documents, 0.5, "doc_id"),
                          "lang", "doc_id", k=2)
            .select("lang", "doc_id").collect()}
    assert full == thin
