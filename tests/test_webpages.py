"""F1 webpages synthesis: determinism, anomaly seeding, byte-identity (T5)."""

import pytest

from pyspark.sql import functions as F

from jsonschemaparse_spark.sources import (
    LANGS,
    charset_violations,
    extract_text,
    synthesize_webpages,
)

N = 2000


@pytest.fixture(scope="module")
def pages(spark):
    df = synthesize_webpages(spark, N, partitions=8)
    df.cache().count()
    yield df
    df.unpersist()


def test_shape_matches_input_hint(pages):
    assert [(f.name, f.dataType.simpleString()) for f in pages.schema.fields] == [
        ("url", "string"),
        ("warc_ts", "timestamp"),
        ("html", "binary"),
        ("text", "string"),
        ("lang", "string"),
    ]
    assert pages.count() == N


def test_deterministic_across_parallelism(spark, pages):
    """Same content at different partition counts — the local stand-in for
    'same result at N and 4N executors'."""
    other = synthesize_webpages(spark, N, partitions=2)
    a = {r["url"]: (r["text"], r["lang"]) for r in pages.collect()}
    b = {r["url"]: (r["text"], r["lang"]) for r in other.collect()}
    assert a == b


def test_anomaly_seeding(pages):
    langs = {r["lang"] for r in pages.select("lang").distinct().collect()}
    assert "xx" in langs and langs - {"xx"} <= set(LANGS)
    n_bad_lang = pages.filter(F.col("lang") == "xx").count()
    assert 0 < n_bad_lang < N * 0.05
    n_empty = pages.filter(F.col("text") == "").count()
    assert 0 < n_empty < N * 0.02


def test_host_skew_is_zipfian(pages):
    top = (
        pages.withColumn("host", F.regexp_extract("url", r"https://(host\d+)", 1))
        .groupBy("host").count().orderBy(F.desc("count")).limit(1).collect()[0]
    )
    # heaviest host should hold far more than the uniform share
    assert top["count"] > 5 * (N / 1000)


def test_extraction_byte_identity(pages):
    """BASELINE.md contract: extracted text byte-identical per url for all
    valid-UTF-8 pages; invalid-UTF-8 pages yield charset violations."""
    ext = extract_text(pages)
    mismatched = ext.filter(
        F.col("extracted_text").isNotNull()
        & (F.encode("extracted_text", "UTF-8") != F.encode("text", "UTF-8"))
    ).count()
    assert mismatched == 0

    bad = charset_violations(ext)
    n_bad = bad.count()
    assert 0 < n_bad < N * 0.02
    assert bad.columns == ["url", "constraint_id", "path", "keyword", "expected", "actual", "message"]
    assert {r["keyword"] for r in bad.collect()} == {"charset"}


def test_non_bmp_round_trip(pages):
    """The dragon 🐲 (parse.js surrogate tests) must survive html round-trip."""
    ext = extract_text(pages.filter(F.col("text").contains("\U0001F432")))
    decodable = ext.filter(F.col("extracted_text").isNotNull())
    assert decodable.count() > 0
    ok = decodable.filter(F.col("extracted_text") == F.col("text")).count()
    assert ok == decodable.count()


def test_flagship_rules_on_webpages(pages):
    from jsonschemaparse_spark.plans import validate_dataframe

    rules = {
        "type": "object",
        "required": ["url", "warc_ts", "text", "lang"],
        "properties": {
            "url": {"type": "string", "pattern": "^https?://", "maxLength": 2048},
            "text": {"type": "string", "minLength": 1},
            "lang": {"enum": LANGS},
        },
    }
    res = validate_dataframe(pages, rules, key_cols=["url"])
    s = res.summary()
    assert s["n_rows"] == N and s["n_failed_rows"] > 0
    kws = {r["keyword"] for r in res.violations().select("keyword").distinct().collect()}
    assert kws == {"enum", "minLength"}
