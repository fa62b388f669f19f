"""Constraint suggestion (functions/suggest.py): profile -> suggest ->
compile -> validate round-trips with zero violations."""

import json

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR

from jsonschemaparse_spark.functions.suggest import (
    constraints_to_schema,
    suggest_constraints,
)
from jsonschemaparse_spark.plans.validator import validate_dataframe


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_suggestions_shape_and_values(spark, docs):
    sug = suggest_constraints(docs)
    rows = {(r["column"], r["keyword"]): r["value"] for r in sug.collect()}
    assert rows[("doc_id", "type")] == "integer"
    assert rows[("text", "type")] == "string"
    # exact integral bounds
    lo, hi = docs.agg(F.min("doc_id"), F.max("doc_id")).first()
    assert rows[("doc_id", "minimum")] == str(lo)
    assert rows[("doc_id", "maximum")] == str(hi)
    # lang is low-cardinality -> enum, sorted JSON array
    enum = json.loads(rows[("lang", "enum")])
    assert enum == sorted(enum) and len(enum) <= 16
    actual = {r[0] for r in docs.select("lang").distinct().collect() if r[0]}
    assert set(enum) == actual
    # high-cardinality string gets length bounds but NO enum
    assert ("text", "enum") not in rows
    assert int(rows[("text", "maxLength")]) >= int(rows[("text", "minLength")])
    # uniqueness: the key column is exactly unique; lang is not
    assert rows.get(("doc_id", "unique")) == "true"
    assert ("lang", "unique") not in rows


def test_required_only_when_no_nulls(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None)], "id: long, name: string")
    rows = {(r["column"], r["keyword"]) for r in
            suggest_constraints(df).collect()}
    assert ("id", "required") in rows
    assert ("name", "required") not in rows


def test_no_float_minmax(spark):
    df = spark.createDataFrame([(1, 0.5), (2, 1.5)], "id: long, score: double")
    rows = {(r["column"], r["keyword"]): r["value"] for r in
            suggest_constraints(df).collect()}
    assert rows[("score", "type")] == "number"
    assert ("score", "minimum") not in rows and ("score", "maximum") not in rows


def test_enum_guard_bounds_collect(spark):
    """A column whose true cardinality exceeds the threshold gets no enum
    even if it slips past the HLL gate."""
    df = spark.createDataFrame([(i, f"v{i}") for i in range(25)],
                               "id: long, tag: string")
    rows = {(r["column"], r["keyword"]) for r in
            suggest_constraints(df, enum_max_distinct=4).collect()}
    assert ("tag", "enum") not in rows


def test_empty_table_emits_only_type_rows(spark):
    """Review pin: on an empty table every data-dependent aggregate is
    None, so only the static type rows come out — no required, no
    bounds, no enum (the oracle twin guards with count(*) > 0)."""
    df = spark.createDataFrame([], "id: long, name: string")
    rows = {(r["column"], r["keyword"]) for r in
            suggest_constraints(df).collect()}
    assert rows == {("id", "type"), ("name", "type")}


def test_all_null_string_column(spark):
    """All-NULL string column: type row only (no length bounds, no enum,
    no required)."""
    df = spark.createDataFrame([(1, None), (2, None)],
                               "id: long, name: string")
    rows = {(r["column"], r["keyword"]) for r in
            suggest_constraints(df).collect()}
    assert ("name", "enum") not in rows
    assert ("name", "minLength") not in rows
    assert ("name", "required") not in rows
    assert ("name", "type") in rows


def test_enum_escaping_matches_duckdb_to_json(spark):
    """Enum values with quotes/backslashes/non-ASCII must encode exactly
    like DuckDB's to_json (the oracle twin): json.dumps with
    ensure_ascii=False."""
    import duckdb

    vals = ['a"b', "back\\slash", "café", "plain"]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)],
                               "id: long, tag: string")
    rows = {(r["column"], r["keyword"]): r["value"] for r in
            suggest_constraints(df).collect()}
    got = rows[("tag", "enum")]
    want = duckdb.sql(
        "SELECT '[' || string_agg(to_json(v), ', ' ORDER BY v) || ']' "
        "FROM (SELECT unnest(?) AS v)", params=[vals]).fetchone()[0]
    assert got == want


def test_unique_requires_no_nulls_and_exact(spark):
    """Deequ isUnique semantics: a NULL disqualifies; a single dup
    disqualifies; the emitted column feeds uniqueness_violations (zero
    violations by construction)."""
    from jsonschemaparse_spark.functions.integrity import uniqueness_violations

    df = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 10), (3, None, 30)],
        "id: long, name: string, v: long")
    rows = {(r["column"], r["keyword"]) for r in
            suggest_constraints(df).collect()}
    assert ("id", "unique") in rows
    assert ("name", "unique") not in rows   # has a NULL
    assert ("v", "unique") not in rows      # has a dup
    assert uniqueness_violations(df, "id").count() == 0


def test_roundtrip_zero_violations(spark, docs):
    """The engine must accept its own suggestion: every row of the profiled
    table validates clean against the suggested schema."""
    schema = constraints_to_schema(suggest_constraints(docs))
    assert schema["type"] == "object"
    assert "doc_id" in schema.get("x-unique-columns", [])
    res = validate_dataframe(docs, schema, key_cols=["doc_id"])
    n_bad = res.annotated.filter(~F.col("_jsp_valid")).count()
    assert n_bad == 0


def test_roundtrip_catches_drift(spark, docs):
    """...and the suggestion is tight: shifting a value outside the
    profiled bounds is flagged by the same schema."""
    schema = constraints_to_schema(suggest_constraints(docs))
    hi = int(schema["properties"]["n_chars"]["maximum"])
    drifted = docs.withColumn(
        "n_chars",
        F.when(F.col("doc_id") == 0, F.lit(hi + 1)).otherwise(F.col("n_chars")))
    res = validate_dataframe(drifted, schema, key_cols=["doc_id"])
    assert res.annotated.filter(~F.col("_jsp_valid")).count() == 1
