"""M0 tests: rule compiler normalization contract.

Mirrors /root/reference/test/Schema.test.js's compile-time validation cases
(malformed keywords throw at construction) — re-derived, not copied.
"""

import pickle

import pytest

from jsonschemaparse_spark import CompiledSchema, SchemaError, SchemaRegistry, compile_rules


def test_boolean_schema_true_allows_everything():
    cs = compile_rules(True)
    assert cs.allow_object and cs.allow_array and cs.allow_string
    assert cs.allow_number and cs.allow_boolean and cs.allow_null


def test_boolean_schema_false_rejects_everything():
    cs = compile_rules(False)
    assert cs.allowed_types == []


def test_type_string_normalization():
    cs = compile_rules({"type": "integer"})
    assert cs.allow_number is True
    assert cs.allow_fraction is False
    assert cs.allowed_types == ["number"]


def test_type_list_normalization_order():
    # allowedTypes order fixed by schema.js:336-342
    cs = compile_rules({"type": ["null", "string", "array"]})
    assert cs.allowed_types == ["array", "string", "null"]


@pytest.mark.parametrize(
    "bad",
    [
        {"type": "foo"},
        {"type": ["foo"]},
        {"type": 12},
        {"required": "nope"},
        {"required": [1]},
        {"minLength": "1"},
        {"maxLength": -1},
        {"minimum": "0"},
        {"multipleOf": 0},
        {"multipleOf": -2},
        {"pattern": 42},
        {"enum": "abc"},
        {"allOf": {}},
        {"anyOf": 1},
        {"oneOf": "x"},
        {"not": []},
        {"properties": []},
        {"patternProperties": 7},
        {"if": 3},
        {"then": []},
        {"else": "x"},
        {"minItems": 1.5},
        {"maxProperties": -3},
    ],
)
def test_malformed_keyword_raises_schema_error(bad):
    with pytest.raises(SchemaError):
        compile_rules(bad)


def test_not_a_schema_raises():
    with pytest.raises(SchemaError):
        compile_rules([1, 2])
    with pytest.raises(SchemaError):
        compile_rules("x")


def test_unknown_keywords_collected_not_rejected():
    cs = compile_rules({"frobnicate": 1, "type": "string"})
    assert cs.unknown == {"frobnicate": 1}


def test_enum_literal_structural_split():
    cs = compile_rules({"enum": [1, "a", True, None, {"k": 1}, [2]]})
    assert len(cs.enum_literals) == 4
    assert len(cs.enum_schemas) == 2


def test_const_object_decomposition():
    cs = compile_rules({"const": {"a": 1, "b": "x"}})
    assert cs.const_type == "object"
    assert cs.const_length == 2
    assert set(cs.const_properties) == {"a", "b"}


def test_registry_ref_resolution_by_pointer():
    cs = compile_rules({"$defs": {"a": {"type": "integer"}}, "$ref": "#/$defs/a"})
    target = cs.resolve_ref()
    assert target.allow_number is True and target.allow_string is False


def test_registry_anchor_resolution():
    cs = compile_rules(
        {"$id": "https://ex.test/r", "$defs": {"A": {"$anchor": "aa", "type": "null"}},
         "$ref": "#aa"}
    )
    assert cs.resolve_ref().allow_null is True


def test_registry_duplicate_definition_raises():
    reg = SchemaRegistry()
    reg.import_schema("vnd.x:", {"type": "string"})
    with pytest.raises(SchemaError):
        reg.import_schema("vnd.x:", {"type": "number"})


def test_registry_import_idempotent_same_document():
    reg = SchemaRegistry()
    doc = {"type": "string"}
    reg.import_schema("vnd.x:", doc)
    reg.import_schema("vnd.x:", doc)  # same raw object: no error


def test_compiled_schema_is_picklable_for_broadcast():
    cs = compile_rules(
        {"$defs": {"a": {"type": "integer"}}, "properties": {"n": {"$ref": "#/$defs/a"}},
         "patternProperties": {"^x": {"minimum": 0}}, "required": ["n"]}
    )
    blob = pickle.dumps(cs)
    cs2 = pickle.loads(blob)
    assert cs2.required == ("n",)  # declaration-order tuple since r3
    assert cs2.properties["n"].resolve_ref().allow_number


def test_illegal_id_characters():
    with pytest.raises(SchemaError):
        CompiledSchema("bad id:", {})


# =========================================================================
# moved from test_round5_fixes.py (round-fix regression pins, split by
# topic per VERDICT r5 #8)
# =========================================================================
import pytest  # noqa: E402,F811,F401
from pyspark.sql import functions as F  # noqa: E402,F811,F401

def test_import_schema_snapshot_identity():
    from jsonschemaparse_spark.schema.compiler import SchemaRegistry

    reg = SchemaRegistry()
    schema = {"type": "object", "properties": {"a": {"type": "string"}}}
    first = reg.import_schema("http://example.com/s", schema)
    # caller mutates AFTER import: the registry's snapshot must not move
    schema["properties"]["b"] = {"type": "number"}
    import copy

    pristine = {"type": "object", "properties": {"a": {"type": "string"}}}
    again = reg.import_schema("http://example.com/s", copy.deepcopy(pristine))
    assert again is first
    # and the mutated object now genuinely differs -> rejected
    import pytest as _pytest

    with _pytest.raises(Exception, match="already defined"):
        reg.import_schema("http://example.com/s", schema)

