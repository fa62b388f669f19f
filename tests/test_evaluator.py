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
