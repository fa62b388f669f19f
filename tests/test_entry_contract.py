"""Driver-contract sanity: entry/queries/oracle_sql shape + new kernels."""

import pytest

from pyspark.sql import functions as F

import __spark_entry__ as entry
from jsonschemaparse_spark.plans import VALID_COL, validate_dataframe


def test_single_oracle_definition():
    # Guard against the r4 mis-merge: a dead duplicate oracle_sql() block
    # shadowed by last-definition-wins would silently swallow future edits.
    import pathlib

    source = pathlib.Path(entry.__file__).read_text()
    assert source.count("def oracle_sql") == 1
    assert source.count("def queries") == 1
    assert source.count("def entry") == 1


def test_contract_shape():
    qs = entry.queries()
    oracles = entry.oracle_sql()
    assert set(oracles) <= set(qs), "oracle for unknown query"
    assert len(qs) >= 20
    # the weak (rows-only) set is intentional and small
    rows_only = set(qs) - set(oracles)
    # r5: ann_ivf_partial gained a golden-snapshot oracle — every query is
    # now oracled (rows_only must be empty).
    assert rows_only == set()


def test_entry_smoke(spark):
    df = entry.entry(spark)
    rows = df.collect()
    assert df.columns == [
        "doc_id", "constraint_id", "path", "keyword", "expected", "actual", "message"
    ]
    assert len(rows) >= 0


def test_structural_enum_column_path(spark):
    df = spark.createDataFrame(
        [(1, {"a": 1}), (2, {"a": 9})], "id int, o struct<a:int>"
    )
    rules = {"properties": {"o": {"enum": [{"a": 1}, {"a": 2}]}}}
    res = validate_dataframe(df, rules, key_cols=["id"], fallback="never")
    got = {r["id"]: r[VALID_COL] for r in res.annotated.collect()}
    assert got == {1: True, 2: False}
    # scalar-only enum can never match a container
    res2 = validate_dataframe(
        df, {"properties": {"o": {"enum": [1, 2]}}}, key_cols=["id"], fallback="never"
    )
    assert all(not r[VALID_COL] for r in res2.annotated.collect())
    # python path agrees
    from jsonschemaparse_spark import validate_instance

    assert validate_instance(rules["properties"]["o"], {"a": 1})[0]
    assert not validate_instance(rules["properties"]["o"], {"a": 9})[0]
    assert not validate_instance({"enum": [1, 2]}, {"a": 1})[0]


def test_violation_cap(spark):
    df = spark.createDataFrame([(1, "", "xx", -5)], ["id", "text", "lang", "n"])
    rules = {
        "required": ["missing1", "missing2"],
        "properties": {
            "text": {"minLength": 1},
            "lang": {"enum": ["en"]},
            "n": {"minimum": 0},
        },
    }
    full = validate_dataframe(df, rules, key_cols=["id"])
    # 3 per-property rows + TWO `required` rows (reference emits both the
    # endObject count, schema.js:810, and the missing-key list,
    # schema.js:1322-1324)
    assert full.violations().count() == 5
    req = sorted((r["message"], r["expected"], r["actual"])
                 for r in full.violations().collect() if r["keyword"] == "required")
    assert req == [("Required properties missing", '["missing1", "missing2"]', None),
                   ("Required property missing", "0", "2")]
    capped = validate_dataframe(df, rules, key_cols=["id"], max_violations_per_row=2)
    row = capped.annotated.collect()[0]
    assert len(row["_jsp_violations"]) == 2
    assert row["_jsp_violations_truncated"] is True
    assert row[VALID_COL] is False  # verdict unaffected by the cap
