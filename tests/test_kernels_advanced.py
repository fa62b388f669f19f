"""Advanced Column-kernel coverage: unevaluatedProperties, propertyNames,
$recursiveRef, typed JSON fast path, bignum precision."""

import pytest

from pyspark.sql import functions as F

from jsonschemaparse_spark.plans import (
    VALID_COL,
    validate_dataframe,
    validate_json_typed,
)


def test_unevaluated_properties_struct(spark):
    df = spark.createDataFrame(
        [(1, {"a": 1, "b": "zz"}), (2, {"a": 1, "b": "x"})],
        "id int, o struct<a:int, b:string>",
    )
    rules = {
        "properties": {
            "o": {
                "properties": {"a": {"type": "integer"}},
                "unevaluatedProperties": {"maxLength": 1},
            }
        }
    }
    res = validate_dataframe(df, rules, key_cols=["id"], fallback="never")
    got = {r["id"]: r[VALID_COL] for r in res.annotated.collect()}
    assert got == {1: False, 2: True}
    v = res.violations().collect()
    assert v[0]["path"] == "/o/b" and v[0]["keyword"] == "maxLength"


def test_unevaluated_properties_allof_union(spark):
    """Keys evaluated by allOf branches are NOT unevaluated (schema.js:1373)."""
    df = spark.createDataFrame(
        [(1, {"a": 1, "b": "long-string"})], "id int, o struct<a:int, b:string>"
    )
    rules = {
        "properties": {
            "o": {
                "allOf": [{"properties": {"b": {}}}],
                "properties": {"a": {}},
                "unevaluatedProperties": False,
            }
        }
    }
    res = validate_dataframe(df, rules, key_cols=["id"], fallback="never")
    assert res.annotated.collect()[0][VALID_COL] is True


def test_property_names_struct_static(spark):
    df = spark.createDataFrame(
        [(1, {"ok": 1, "toolongname": 2}), (2, {"ok": 3, "toolongname": None})],
        "id int, o struct<ok:int, toolongname:int>",
    )
    rules = {"properties": {"o": {"propertyNames": {"maxLength": 5}}}}
    res = validate_dataframe(df, rules, key_cols=["id"], fallback="never")
    got = {r["id"]: r[VALID_COL] for r in res.annotated.collect()}
    # row 2's offending field is NULL => property absent => no violation
    assert got == {1: False, 2: True}


def test_recursive_ref_column_path(spark):
    """$recursiveRef under an anchored property subschema resolves to the
    DOCUMENT ROOT (fragment-stripped base — schema.js:1066, 1125-1127), so
    child={"v":-1} is valid (root only constrains "o") while a nested "o"
    re-enters the constrained subschema. Verdicts captured by executing the
    reference under node (r3: replaced the pre-fix expectation that
    recursion targeted the anchored subschema itself)."""
    df = spark.createDataFrame(
        [(1, {"v": 5, "child": {"v": -1, "o": None}}),
         (2, {"v": -2, "child": None}),
         (3, {"v": 5, "child": {"v": None, "o": {"v": -1}}})],
        "id int, o struct<v:int, child:struct<v:int, o:struct<v:int>>>",
    )
    rules = {
        "properties": {
            "o": {
                "$recursiveAnchor": True,
                "properties": {
                    "v": {"minimum": 0},
                    "child": {"$recursiveRef": "#"},
                },
            }
        }
    }
    res = validate_dataframe(df, rules, key_cols=["id"])
    got = {r["id"]: r["_jsp_valid"] for r in res.annotated.collect()}
    assert got == {1: True, 2: False, 3: False}
    v = {(r["id"], r["path"], r["keyword"]) for r in res.violations().collect()}
    assert (2, "/o/v", "minimum") in v
    assert (3, "/o/child/o/v", "minimum") in v


def test_validate_json_typed_fast_path(spark):
    df = spark.createDataFrame(
        [(1, '{"k": 5}'), (2, '{"k": 99}'), (3, "{oops"), (4, None)],
        ["id", "props"],
    )
    rules = {"type": "object", "properties": {"k": {"minimum": 0, "maximum": 50}}}
    res = validate_json_typed(df, "props", rules, "struct<k:int>", key_cols=["id"])
    got = {r["id"]: r[VALID_COL] for r in res.annotated.collect()}
    assert got == {1: True, 2: False, 3: False, 4: True}
    kw = {r["id"]: r["keyword"] for r in res.violations().collect()}
    assert kw == {2: "maximum", 3: "syntax"}
    # plan check: no Python eval stage
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        res.annotated.explain("formatted")
    assert "EvalPython" not in buf.getvalue()


def test_bignum_long_precision(spark):
    """2^53+1 must not collapse to double: long comparisons stay exact."""
    big = (1 << 53) + 1
    df = spark.createDataFrame([(1, big), (2, big - 1)], "id int, n long")
    rules = {"properties": {"n": {"maximum": big - 1}}}
    res = validate_dataframe(df, rules, key_cols=["id"], fallback="never")
    got = {r["id"]: r[VALID_COL] for r in res.annotated.collect()}
    assert got == {1: False, 2: True}


def test_dependent_required(spark):
    df = spark.createDataFrame(
        [(1, {"cc": "visa", "addr": "x"}), (2, {"cc": "visa", "addr": None}),
         (3, {"cc": None, "addr": None})],
        "id int, o struct<cc:string, addr:string>",
    )
    rules = {"properties": {"o": {"dependentRequired": {"cc": ["addr"]}}}}
    res = validate_dataframe(df, rules, key_cols=["id"], fallback="never")
    got = {r["id"]: r[VALID_COL] for r in res.annotated.collect()}
    assert got == {1: True, 2: False, 3: True}
    # python path agrees
    from jsonschemaparse_spark import validate_instance

    assert validate_instance(rules["properties"]["o"], {"cc": "v", "addr": "x"},
                             extensions=True)[0]
    assert not validate_instance(rules["properties"]["o"], {"cc": "v"},
                                 extensions=True)[0]
    assert validate_instance(rules["properties"]["o"], {}, extensions=True)[0]


def test_dependent_schemas(spark):
    df = spark.createDataFrame(
        [(1, {"cc": "visa", "bill": 10}), (2, {"cc": "visa", "bill": -5}),
         (3, {"cc": None, "bill": -5})],
        "id int, o struct<cc:string, bill:int>",
    )
    rules = {"properties": {"o": {"dependentSchemas": {
        "cc": {"properties": {"bill": {"minimum": 0}}}}}}}
    res = validate_dataframe(df, rules, key_cols=["id"], fallback="never")
    got = {r["id"]: r[VALID_COL] for r in res.annotated.collect()}
    assert got == {1: True, 2: False, 3: True}
    from jsonschemaparse_spark import validate_instance

    sub = rules["properties"]["o"]
    assert not validate_instance(sub, {"cc": "v", "bill": -1}, extensions=True)[0]
    assert validate_instance(sub, {"bill": -1}, extensions=True)[0]


def test_schema_inference_for_typed_json(spark):
    from jsonschemaparse_spark.plans.json_validator import schema_for_rules

    rules = {
        "type": "object",
        "properties": {
            "k": {"type": "integer"},
            "name": {"type": "string"},
            "score": {"type": "number"},
            "ok": {"type": "boolean"},
            "tags": {"type": "array", "items": {"type": "string"}},
            "nested": {"type": "object", "properties": {"x": {"type": "integer"}}},
        },
    }
    schema = schema_for_rules(rules)
    assert schema.simpleString() == (
        "struct<k:bigint,name:string,score:double,ok:boolean,"
        "tags:array<string>,nested:struct<x:bigint>>"
    )
    # end-to-end with inferred schema (no hand-written struct)
    df = spark.createDataFrame(
        [(1, '{"k": 5, "nested": {"x": -1}}'), (2, '{"k": "bad"}')], ["id", "props"]
    )
    res = validate_json_typed(
        df, "props",
        {"type": "object", "properties": {"k": {"type": "integer", "minimum": 0},
                                          "nested": {"properties": {"x": {"minimum": 0}}}}},
        key_cols=["id"],
    )
    v = {(r["id"], r["path"]): r["keyword"] for r in res.violations().collect()}
    assert v[(1, "/nested/x")] == "minimum"
