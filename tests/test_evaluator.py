"""T1 keyword parity + T2 report parity for the pure-Python evaluator
(the kernel shipped inside Arrow batches)."""

import pytest

from jsonschemaparse_spark import compile_rules, validate_instance
from jsonschemaparse_spark.schema.evaluate import Evaluator

from cases_2019_09 import CASES, REPORT_CASES


def _case_params():
    for group in CASES:
        for t in group["tests"]:
            yield pytest.param(
                group["schema"], t["data"], t["valid"],
                id=f"{group['description']} :: {t['description']}",
            )


@pytest.mark.parametrize("schema,data,valid", list(_case_params()))
def test_suite_case(schema, data, valid):
    ok, errors = validate_instance(schema, data)
    assert ok is valid, f"errors={[e.message for e in errors]}"


@pytest.mark.parametrize(
    "schema,data,keyword,message",
    REPORT_CASES,
    ids=[f"{c[2]}:{c[3][:30]}" for c in REPORT_CASES],
)
def test_report_parity(schema, data, keyword, message):
    ok, errors = validate_instance(schema, data)
    assert not ok
    assert any(e.keyword == keyword and e.message == message for e in errors), [
        (e.keyword, e.message) for e in errors
    ]


def test_violation_paths():
    rules = {"properties": {"a": {"items": {"type": "integer"}}}}
    ok, errors = validate_instance(rules, {"a": [1, "x", 2.5]})
    assert not ok
    assert sorted(e.path for e in errors) == ["/a/1", "/a/2"]


def test_required_passes_on_non_objects():
    # SURVEY.md §4.3-4; reference test/validate.test.js:167
    ok, _ = validate_instance({"required": ["a"]}, 1)
    assert ok


def test_annotations_only_on_valid_instances():
    ev = Evaluator(annotations=True)
    cs = compile_rules({"title": "T", "type": "string"})
    errs, anns = ev.validate(cs, "hello")
    assert not errs and [a.value for a in anns] == ["T"]
    errs, anns = ev.validate(cs, 42)
    assert errs and anns == []


def test_extension_contains():
    ok, _ = validate_instance({"contains": {"minimum": 5}}, [1, 2], extensions=True)
    assert not ok
    ok, _ = validate_instance({"contains": {"minimum": 5}}, [1, 9], extensions=True)
    assert ok
    # reference parity mode: contains declared but not enforced (schema.js:449)
    ok, _ = validate_instance({"contains": {"minimum": 5}}, [1, 2], extensions=False)
    assert ok


def test_extension_unique_items():
    ok, _ = validate_instance({"uniqueItems": True}, [1, 2, 1], extensions=True)
    assert not ok
    ok, _ = validate_instance({"uniqueItems": True}, [1, 2, 3], extensions=True)
    assert ok
    # 1 and 1.0 are the same JSON number; 1 and true are not
    ok, _ = validate_instance({"uniqueItems": True}, [1, 1.0], extensions=True)
    assert not ok
    ok, _ = validate_instance({"uniqueItems": True}, [1, True], extensions=True)
    assert ok


def test_extension_property_names():
    ok, _ = validate_instance({"propertyNames": {"maxLength": 2}}, {"ab": 1}, extensions=True)
    assert ok
    ok, _ = validate_instance({"propertyNames": {"maxLength": 2}}, {"abc": 1}, extensions=True)
    assert not ok


def test_recursive_ref_depth_guard():
    rules = {"$ref": "#"}  # infinite self-reference on any instance
    with pytest.raises(RecursionError):
        validate_instance(rules, {"a": 1})


def test_const_object_same_length_different_keys():
    """Reference-executed semantics (r3 correction): the reference's
    constRemain missing-key branch (schema.js:1360, 'FIXME is this right?')
    is DEAD CODE — constRemain is never assigned — so a same-key-count
    object with disjoint keys VALIDATES. Verdicts below captured by running
    the reference under node (scripts/reference_differential.py caught the
    old, stricter expectation diverging)."""
    ok, _ = validate_instance({"const": {"a": 1}}, {"b": 1})
    assert ok  # count matches, 'b' unconstrained, dead constRemain
    ok, _ = validate_instance({"const": {"a": 1, "c": 2}}, {"a": 1, "b": 2})
    assert ok  # count 2==2, 'a' matches, 'b' unconstrained
    ok, _ = validate_instance({"const": {"a": 1}}, {"a": 1})
    assert ok
    ok, _ = validate_instance({"const": {"a": 1}}, {"a": 2})
    assert not ok  # present key mismatch still fails
    ok, _ = validate_instance({"const": {"a": 1}}, {"a": 1, "b": 2})
    assert not ok  # count mismatch still fails
    # flows through structural enum members too (each enum container value
    # is a {const: v} subschema — same dead-constRemain semantics)
    ok, _ = validate_instance({"enum": [{"a": 1}]}, {"c": 3})
    assert ok
    ok, _ = validate_instance({"enum": [{"a": 1}]}, {"a": 2})
    assert not ok


# =========================================================================
# moved from test_round2_fixes.py (round-fix regression pins, split by
# topic per VERDICT r5 #8)
# =========================================================================
import pytest  # noqa: E402,F811,F401
from pyspark.sql import functions as F  # noqa: E402,F811,F401
from jsonschemaparse_spark.schema.compiler import compile_rules  # noqa: E402,F811,F401
from jsonschemaparse_spark.schema.evaluate import Evaluator  # noqa: E402,F811,F401

def _eval_errors(rules, value):
    cs = compile_rules(rules)
    errors, _ = Evaluator(extensions=True).validate(cs, value)
    return errors


def test_evaluator_anyof_union():
    rules = {
        "anyOf": [
            {"properties": {"b": {"type": "string"}}, "required": ["b"]},
            {"properties": {"c": {"type": "integer"}}, "required": ["c"]},
        ],
        "properties": {"a": {"type": "integer"}},
        "unevaluatedProperties": False,
    }
    assert _eval_errors(rules, {"a": 1, "b": "x"}) == []
    assert _eval_errors(rules, {"a": 1, "c": 3}) == []
    # b belongs to a FAILING branch (branch 1 requires b:string; b is an int
    # so branch 1 fails) => b is unevaluated
    errs = _eval_errors(rules, {"a": 1, "b": 5, "c": 3})
    assert any(e.keyword == "unevaluatedProperties" or "/b" in e.path for e in errs)


def test_evaluator_if_then_else_union():
    rules = {
        "if": {"properties": {"a": {"const": 1}}, "required": ["a"]},
        "then": {"properties": {"b": {}}},
        "else": {"properties": {"c": {}}},
        "unevaluatedProperties": False,
    }
    # if passes: if donates a, then donates b
    assert _eval_errors(rules, {"a": 1, "b": 2}) == []
    # if passes but c is evaluated by neither if nor then
    assert _eval_errors(rules, {"a": 1, "c": 3}) != []
    # if fails (no a): else donates c; a failed branch donates nothing
    assert _eval_errors(rules, {"c": 1}) == []
    assert _eval_errors(rules, {"b": 1}) != []


def test_evaluator_self_ref_unevaluated_depth_guard():
    """Self-referential $ref + unevaluatedProperties must fail with the
    clean depth error, not an unguarded Python RecursionError (ADVICE low #2)."""
    rules = {
        "$id": "https://x/root",
        "$ref": "#",
        "unevaluatedProperties": False,
    }
    cs = compile_rules(rules)
    with pytest.raises(RecursionError, match="depth"):
        Evaluator(extensions=True).validate(cs, {"k": 1})


def test_unevaluated_items_evaluator():
    rules = {
        "items": [{"type": "integer"}],
        "unevaluatedItems": {"maximum": 10},
    }
    assert _eval_errors(rules, [1]) == []
    assert _eval_errors(rules, [1, 5]) == []
    errs = _eval_errors(rules, [1, 50])
    assert errs and errs[0].path == "/1" and errs[0].keyword == "maximum"
    # additionalItems evaluates the tail -> unevaluatedItems vacuous
    rules2 = dict(rules, additionalItems={})
    assert _eval_errors(rules2, [1, 50]) == []


def test_unevaluated_items_branch_union_evaluator():
    rules = {
        "anyOf": [
            {"items": {"type": "integer"}},   # passes only for all-int arrays
        ],
        "unevaluatedItems": False,
    }
    assert _eval_errors(rules, [1, 2]) == []       # branch passes -> evaluated
    assert _eval_errors(rules, ["x"]) != []        # branch fails -> unevaluated


def test_evaluator_dollar_anchor_parity():
    """'$' must mean end-of-string on the PYTHON path too (finding #3)."""
    errs_nl = _eval_errors({"type": "string", "pattern": "a$"}, "a\n")
    errs_ok = _eval_errors({"type": "string", "pattern": "a$"}, "a")
    assert errs_nl and not errs_ok

