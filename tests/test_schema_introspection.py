"""Schema introspection + schema-document rejection parity (r4):
test/Schema.test.js's surface — subschemas/allSubschemas, references/
allReferences, unknown, and compile-time rejection of malformed schema
documents (differential vs node)."""

from __future__ import annotations

import shutil
from pathlib import Path

import pytest

node_available = shutil.which("node") is not None and Path("/root/reference").exists()


def test_subschemas_reference_unit():
    """The reference's own Schema#subschemas/allSubschemas assertions."""
    from jsonschemaparse_spark import SchemaRegistry

    s = SchemaRegistry().import_schema("http://example.com/schema.json", {
        "properties": {"id": {"type": "array",
                              "items": {"type": "string", "minimum": 0}}},
    })
    assert len(s.subschemas) == 1
    assert s.subschemas[0].allowed_types == ["array"]
    assert len(s.all_subschemas) == 2
    assert [c.allowed_types for c in s.all_subschemas] == [["array"], ["string"]]


def test_references_reference_unit():
    """The reference's own Schema#references/allReferences assertions."""
    from jsonschemaparse_spark import SchemaRegistry

    s = SchemaRegistry().import_schema("http://example.com/schema.json", {
        "$ref": "#root",
        "properties": {"id": {"type": "array", "items": {"$ref": "#item"}}},
        "$defs": {"root": {"$anchor": "root", "minProperties": 1},
                  "items": {"$anchor": "items", "type": "string", "minimum": 0}},
    })
    assert s.references == ["http://example.com/schema.json#root"]
    assert s.all_references == ["http://example.com/schema.json#root",
                                "http://example.com/schema.json#item"]


def test_unknown_reference_unit():
    from jsonschemaparse_spark import SchemaRegistry

    s = SchemaRegistry().import_schema("http://example.com/schema.json",
                                       {"type": "string", "foo": "baz"})
    assert list(s.unknown) == ["foo"]


def test_explicit_null_keyword_values_rejected():
    """The reference's throw set for explicit null (probed under node)."""
    from jsonschemaparse_spark import SchemaRegistry
    from jsonschemaparse_spark.errors import SchemaError

    for kw in ("allOf", "anyOf", "oneOf", "not", "required",
               "patternProperties", "additionalProperties",
               "unevaluatedProperties", "items",
               "pattern", "if", "then", "else"):
        with pytest.raises(SchemaError):
            SchemaRegistry().import_schema("http://x/", {kw: None})
    # the reference TOLERATES null here (silently ignored) — so do we
    for kw in ("properties", "additionalItems"):
        SchemaRegistry().import_schema("http://x/", {kw: None})


@pytest.mark.skipif(not node_available, reason="node or reference unavailable")
@pytest.mark.parametrize("seed", [1, 2])
def test_schema_error_differential(seed):
    """Malformed schema documents through node `new Schema` vs
    compile_rules: accept/reject parity, with the two documented classes
    counted (engine_stricter for typo'd $id/$anchor/$defs the reference's
    typeof-guards silently ignore; ref_defs_bug for schema.js:643's
    copy-paste bug that makes `definitions` unusable upstream)."""
    from scripts.schema_error_differential import (
        compare,
        generate_docs,
        run_engine,
        run_reference,
    )

    docs = generate_docs(seed)
    counters: dict = {}
    mism = compare(docs, run_reference(docs), run_engine(docs), counters)
    assert mism == [], mism[:5]
    assert counters.get("ref_defs_bug", 0) >= 1
