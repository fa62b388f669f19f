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


# =========================================================================
# moved from test_round2_fixes.py (round-fix regression pins, split by
# topic per VERDICT r5 #8)
# =========================================================================
import pytest  # noqa: E402,F811,F401
from pyspark.sql import functions as F  # noqa: E402,F811,F401
from jsonschemaparse_spark.plans import VALID_COL, validate_dataframe  # noqa: E402,F811,F401
from jsonschemaparse_spark.plans.kernels import rlike_pattern  # noqa: E402,F811,F401

def test_rlike_pattern_translation():
    assert rlike_pattern("a$") == "a\\z"
    assert rlike_pattern("^a$|b$") == "^a\\z|b\\z"
    # escaped \$ and [$] are literal in both dialects: untouched
    assert rlike_pattern(r"a\$") == r"a\$"
    assert rlike_pattern("a[$]b") == "a[$]b"
    assert rlike_pattern("plain") == "plain"


def test_pattern_dollar_rejects_trailing_newline(spark):
    """ECMAScript /a$/ rejects 'a\\n'; Java '$' would accept before a final
    line terminator — the fast path must match the reference (schema.js:884)."""
    df = spark.createDataFrame([(1, "a"), (2, "a\n")], "id int, s string")
    rules = {"properties": {"s": {"type": "string", "pattern": "a$"}}}
    res = validate_dataframe(df, rules, key_cols=["id"], fallback="never")
    got = {r["id"]: r[VALID_COL] for r in res.annotated.collect()}
    assert got == {1: True, 2: False}


_ANYOF_RULES = {
    "properties": {
        "o": {
            "anyOf": [
                {"properties": {"b": {"type": "string"}}, "required": ["b"]},
                {"properties": {"c": {"type": "integer"}}, "required": ["c"]},
            ],
            "properties": {"a": {"type": "integer"}},
            "unevaluatedProperties": False,
        }
    }
}


def test_unevaluated_properties_anyof_union_struct(spark):
    """Keys evaluated by a PASSING anyOf branch are not unevaluated; keys of
    a FAILING branch stay unevaluated (schema.js:1387-1393 + 1395-1403)."""
    df = spark.createDataFrame(
        [
            (1, {"a": 1, "b": "x", "c": None}),   # branch 1 passes -> b evaluated
            (2, {"a": 1, "b": None, "c": 7}),     # branch 2 passes -> c evaluated
        ],
        "id int, o struct<a:int, b:string, c:int>",
    )
    res = validate_dataframe(df, _ANYOF_RULES, key_cols=["id"], fallback="never")
    got = {r["id"]: r[VALID_COL] for r in res.annotated.collect()}
    assert got == {1: True, 2: True}


def test_unevaluated_properties_anyof_failing_branch_struct(spark):
    """b present but its branch FAILS (b not a string? can't in struct) —
    instead: b present while only branch 2 passes => b is unevaluated."""
    df = spark.createDataFrame(
        # b="way-too-long" makes branch 1 pass too; instead break branch 1 by
        # omitting b and presenting an extra evaluated-by-nothing key d
        [(1, {"a": 1, "b": "x", "c": 7, "d": "extra"})],
        "id int, o struct<a:int, b:string, c:int, d:string>",
    )
    res = validate_dataframe(df, _ANYOF_RULES, key_cols=["id"], fallback="never")
    row = res.annotated.collect()[0]
    assert row[VALID_COL] is False  # d evaluated by no branch
    paths = {r["path"] for r in res.violations().collect()}
    assert "/o/d" in paths


def test_unevaluated_properties_if_then_union_struct(spark):
    rules = {
        "properties": {
            "o": {
                "if": {"required": ["a"]},
                "then": {"properties": {"b": {"type": "string"}}},
                "else": {"properties": {"c": {"type": "integer"}}},
                "properties": {"a": {"type": "integer"}},
                "unevaluatedProperties": False,
            }
        }
    }
    df = spark.createDataFrame(
        [
            (1, {"a": 1, "b": "x", "c": None}),  # if passes -> then evaluates b
            (2, {"a": 1, "b": None, "c": 9}),    # if passes -> c NOT evaluated
            (3, {"a": None, "b": None, "c": 9}), # if fails -> else evaluates c
        ],
        "id int, o struct<a:int, b:string, c:int>",
    )
    res = validate_dataframe(df, rules, key_cols=["id"], fallback="never")
    got = {r["id"]: r[VALID_COL] for r in res.annotated.collect()}
    assert got == {1: True, 2: False, 3: True}


def test_unevaluated_items_struct_column(spark):
    rules = {
        "properties": {
            "a": {
                "items": [{"type": "integer"}],
                "unevaluatedItems": {"maximum": 10},
            }
        }
    }
    df = spark.createDataFrame(
        [(1, [1]), (2, [1, 5]), (3, [1, 50])], "id int, a array<int>"
    )
    res = validate_dataframe(df, rules, key_cols=["id"], fallback="never")
    got = {r["id"]: r[VALID_COL] for r in res.annotated.collect()}
    assert got == {1: True, 2: True, 3: False}
    v = res.violations().collect()
    assert v[0]["path"] == "/a/1" and v[0]["keyword"] == "maximum"


def test_unevaluated_items_branch_union_column(spark):
    rules = {
        "properties": {
            "a": {
                "anyOf": [{"items": {"maximum": 100}}],
                "unevaluatedItems": False,
            }
        }
    }
    df = spark.createDataFrame(
        [(1, [1, 2]), (2, [1, 500])], "id int, a array<int>"
    )
    res = validate_dataframe(df, rules, key_cols=["id"], fallback="never")
    got = {r["id"]: r[VALID_COL] for r in res.annotated.collect()}
    assert got == {1: True, 2: False}


def test_then_branch_donates_only_when_passing(spark):
    """if passes but then FAILS -> then's keys stay unevaluated on the
    Column path, matching the evaluator (finding #6)."""
    rules = {
        "properties": {
            "o": {
                "if": {"properties": {"a": {"type": "integer"}}, "required": ["a"]},
                "then": {"properties": {"b": {"type": "string", "minLength": 5}},
                         "required": ["b"]},
                "properties": {"a": {}},
                "unevaluatedProperties": False,
            }
        }
    }
    df = spark.createDataFrame(
        [(1, {"a": 1, "b": "long-enough"}),  # then passes -> b evaluated
         (2, {"a": 1, "b": "x"})],           # then FAILS -> b unevaluated too
        "id int, o struct<a:int, b:string>",
    )
    res = validate_dataframe(df, rules, key_cols=["id"], fallback="never")
    got = {r["id"]: r[VALID_COL] for r in res.annotated.collect()}
    assert got == {1: True, 2: False}
    # evaluator agrees
    from jsonschemaparse_spark import validate_instance
    ok1, _ = validate_instance(rules["properties"]["o"], {"a": 1, "b": "long-enough"}, extensions=True)
    ok2, e2 = validate_instance(rules["properties"]["o"], {"a": 1, "b": "x"}, extensions=True)
    assert ok1 and not ok2
    # and BOTH the then failure and the unevaluated violation are reported
    kws = {e.keyword for e in e2}
    assert "minLength" in kws


# =========================================================================
# moved from test_round3_fixes.py (round-fix regression pins, split by
# topic per VERDICT r5 #8)
# =========================================================================
import pytest  # noqa: E402,F811,F401
from pyspark.sql import functions as F  # noqa: E402,F811,F401
import random  # noqa: E402,F811,F401
from jsonschemaparse_spark import validate_instance  # noqa: E402,F811,F401
from jsonschemaparse_spark.schema.evaluate import Evaluator  # noqa: E402,F811,F401
from jsonschemaparse_spark.schema.compiler import compile_rules  # noqa: E402,F811,F401

_NESTED_ANYOF = {
    "properties": {
        "o": {
            "type": "object",
            "anyOf": [{"anyOf": [{"properties": {"x": {"type": "integer"}}}]}],
            "unevaluatedProperties": {"type": "string"},
        }
    }
}


def test_unevaluated_nested_anyof_struct(spark):
    df = spark.createDataFrame(
        [(1, {"x": 5})],
        "id int, o struct<x:int>",
    )
    res = validate_dataframe(df, _NESTED_ANYOF, key_cols=["id"], fallback="never")
    row = res.annotated.collect()[0]
    assert row[VALID_COL] is True, [r for r in res.violations().collect()]


def test_unevaluated_nested_anyof_evaluator_agrees():
    cs = compile_rules(_NESTED_ANYOF)
    errors, _ = Evaluator(extensions=True).validate(cs, {"o": {"x": 5}})
    assert not errors


def test_unevaluated_nested_if_then_struct(spark):
    """then nested inside an anyOf branch donates only when the inner
    conditional actually covers the key on that row."""
    rules = {
        "properties": {
            "o": {
                "type": "object",
                "anyOf": [
                    {
                        "if": {"required": ["flag"]},
                        "then": {"properties": {"x": {"type": "integer"}}},
                    }
                ],
                "properties": {"flag": {"type": "boolean"}},
                "unevaluatedProperties": False,
            }
        }
    }
    df = spark.createDataFrame(
        [
            (1, {"flag": True, "x": 5}),    # if passes -> then evaluates x
            (2, {"flag": None, "x": 5}),    # if fails -> x unevaluated
        ],
        "id int, o struct<flag:boolean, x:int>",
    )
    res = validate_dataframe(df, rules, key_cols=["id"], fallback="never")
    got = {r["id"]: r[VALID_COL] for r in res.annotated.collect()}
    # evaluator cross-check
    ev = Evaluator(extensions=True)
    cs = compile_rules(rules)
    e1, _ = ev.validate(cs, {"o": {"flag": True, "x": 5}})
    e2, _ = ev.validate(cs, {"o": {"x": 5}})
    assert (not e1, not e2) == (got[1], got[2])
    assert got == {1: True, 2: False}


def test_unevaluated_deeply_nested_conditionals_differential(spark):
    """Randomized 2-level conditional nests: Column path verdict must match
    the Python evaluator row-for-row."""
    rnd = random.Random(99)
    inner_opts = [
        {"properties": {"x": {"type": "integer"}}},
        {"properties": {"x": {"type": "integer", "minimum": 10}}},
        {"properties": {"y": {"type": "string"}}},
    ]
    for trial in range(8):
        inner = rnd.choice(inner_opts)
        wrap = rnd.choice(["anyOf", "oneOf", "allOf"])
        outer = rnd.choice(["anyOf", "oneOf"])
        rules = {
            "properties": {
                "o": {
                    "type": "object",
                    outer: [{wrap: [inner]}],
                    "unevaluatedProperties": False,
                }
            }
        }
        rows = [
            (1, {"x": 5, "y": None}),
            (2, {"x": 50, "y": None}),
            (3, {"x": None, "y": "s"}),
            (4, {"x": 5, "y": "s"}),
        ]
        df = spark.createDataFrame(rows, "id int, o struct<x:int, y:string>")
        res = validate_dataframe(df, rules, key_cols=["id"], fallback="never")
        got = {r["id"]: r[VALID_COL] for r in res.annotated.collect()}
        ev = Evaluator(extensions=True)
        cs = compile_rules(rules)
        for rid, o in rows:
            val = {k: v for k, v in o.items() if v is not None}
            errs, _ = ev.validate(cs, {"o": val})
            assert got[rid] == (not errs), (
                f"trial={trial} rules={json.dumps(rules)} row={rid} "
                f"column={got[rid]} evaluator={not errs}"
            )

