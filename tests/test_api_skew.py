"""api.py parity surface + skew utilities."""

import pytest

from pyspark.sql import functions as F

from jsonschemaparse_spark.api import (
    ParseSyntaxError,
    ParseValidationError,
    annotation_table,
    parse,
    parse_info,
)
from jsonschemaparse_spark import compile_rules


def test_parse_strict_returns_value():
    assert parse('{"a": [1, 2.5, "x"]}') == {"a": [1, 2.5, "x"]}
    assert parse("1", {"type": "number"}) == 1


def test_parse_strict_raises_first_error():
    with pytest.raises(ParseValidationError) as ei:
        parse('"too long string"', {"maxLength": 3})
    assert ei.value.keyword == "maxLength"
    assert str(ei.value) == "String too long"


def test_parse_syntax_error_raises():
    with pytest.raises(ParseSyntaxError):
        parse("{broken")
    with pytest.raises(ParseSyntaxError):
        parse_info("{broken")


def test_parse_info_never_raises_on_violations():
    # test/parseInfo.test.js:33-37 semantics
    info = parse_info("true", {"type": "string"})
    assert not info.valid and info.value is True
    assert info.errors[0].keyword == "type"


def test_parse_bytes_utf8():
    assert parse('"\U0001F432"'.encode("utf-8"), {"maxLength": 1}) == "\U0001F432"
    with pytest.raises(ParseSyntaxError):
        parse(b'"\xff\xfe"')


def test_parse_required_on_scalar_valid():
    # reference test/validate.test.js:167 — keywords are type-scoped
    assert parse("1", {"required": ["a"]}) == 1


def test_annotation_table():
    cs = compile_rules(
        {"title": "Root", "properties": {"a": {"description": "leaf a"}},
         "allOf": [{"title": "branch"}]}
    )
    rows = annotation_table(cs)
    got = {(r["keyword"], r["value"]) for r in rows}
    assert got == {("title", "Root"), ("description", "leaf a"), ("title", "branch")}


# ---------------- skew ------------------------------------------------------
def test_salted_group_count_matches_plain(spark):
    from jsonschemaparse_spark.plans.skew import salted_group_count

    from jsonschemaparse_spark.sources import synthesize_webpages

    pages = synthesize_webpages(spark, 3000, partitions=6)
    plain = {r["lang"]: r["cnt"] for r in
             pages.groupBy("lang").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    salted = {r["lang"]: r["cnt"] for r in salted_group_count(pages, "lang", 8).collect()}
    assert salted == plain


def test_skew_report(spark):
    from jsonschemaparse_spark.plans.skew import skew_report
    from jsonschemaparse_spark.sources import synthesize_webpages

    pages = synthesize_webpages(spark, 3000, partitions=6)
    rep = skew_report(pages, "lang", top=3).collect()
    assert rep[0]["key"] == "en"  # Zipf head
    assert rep[0]["share"] > 0.3


def test_salted_repartition_spreads_hot_key(spark):
    from jsonschemaparse_spark.plans.skew import salted_repartition
    from jsonschemaparse_spark.sources import synthesize_webpages

    pages = synthesize_webpages(spark, 3000, partitions=6)
    from jsonschemaparse_spark.plans.skew import SALT_COL, _salt

    hot = pages.filter(F.col("lang") == "en")
    # logical spread: the hot key splits across many salt buckets. (The
    # PHYSICAL partition count at this tiny scale is AQE's call — it
    # correctly coalesces kilobyte partitions back into one; at real scale
    # the buckets stay separate because each exceeds the advisory size.)
    n_salts = (
        hot.withColumn(SALT_COL, _salt(8)).select(SALT_COL).distinct().count()
    )
    assert n_salts == 8
    salted_repartition(hot, "lang", buckets=8).count()  # plan executes


def test_iter_events_sequence():
    from jsonschemaparse_spark.api import iter_events

    events = list(iter_events({"a": [1, "x"], "b": None}))
    assert events == [
        ("startObject",),
        ("key", "a"), ("startArray",), ("number", 1), ("string", "x"), ("endArray",),
        ("key", "b"), ("null",),
        ("endObject",),
        ("end",),
    ]
    assert list(iter_events(True)) == [("boolean", True), ("end",)]


def test_instance_info_tree():
    from jsonschemaparse_spark.api import instance_info

    info = instance_info({"a": [1, 2], "b": "x"})
    assert info.type == "object"
    assert info.properties["a"].type == "array"
    assert [i.native for i in info.properties["a"].items] == [1, 2]
    assert info.keys["b"].type == "string"
    assert info.map is info.properties
