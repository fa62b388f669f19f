"""Embedded JSON-Schema draft-2019-09 keyword-parity corpus (T1, SURVEY.md §5.2).

Self-written, spec-derived cases in the official suite shape
(FIXTURES.md §F3) covering exactly the keyword files the reference enables
(/root/reference/test/schema-suite.test.js:23-66). Each group:
{"description", "schema", "tests": [{"description", "data", "valid"}]}.
"""

CASES = [
    # ---- type -----------------------------------------------------------
    {"description": "integer type matches integers", "schema": {"type": "integer"}, "tests": [
        {"description": "an integer is an integer", "data": 1, "valid": True},
        {"description": "a float is not an integer", "data": 1.1, "valid": False},
        {"description": "a float with zero fraction is an integer", "data": 1.0, "valid": True},
        {"description": "a string is not an integer", "data": "foo", "valid": False},
        {"description": "an object is not an integer", "data": {}, "valid": False},
        {"description": "an array is not an integer", "data": [], "valid": False},
        {"description": "a boolean is not an integer", "data": True, "valid": False},
        {"description": "null is not an integer", "data": None, "valid": False},
    ]},
    {"description": "number type matches numbers", "schema": {"type": "number"}, "tests": [
        {"description": "an integer is a number", "data": 1, "valid": True},
        {"description": "a float is a number", "data": 1.1, "valid": True},
        {"description": "a string is not a number", "data": "foo", "valid": False},
        {"description": "a boolean is not a number", "data": True, "valid": False},
    ]},
    {"description": "string type matches strings", "schema": {"type": "string"}, "tests": [
        {"description": "a string is a string", "data": "foo", "valid": True},
        {"description": "an empty string is a string", "data": "", "valid": True},
        {"description": "a number is not a string", "data": 1, "valid": False},
        {"description": "null is not a string", "data": None, "valid": False},
    ]},
    {"description": "object type matches objects", "schema": {"type": "object"}, "tests": [
        {"description": "an object is an object", "data": {}, "valid": True},
        {"description": "an array is not an object", "data": [], "valid": False},
        {"description": "null is not an object", "data": None, "valid": False},
    ]},
    {"description": "array type matches arrays", "schema": {"type": "array"}, "tests": [
        {"description": "an array is an array", "data": [1, 2], "valid": True},
        {"description": "an object is not an array", "data": {}, "valid": False},
        {"description": "a string is not an array", "data": "foo", "valid": False},
    ]},
    {"description": "boolean type matches booleans", "schema": {"type": "boolean"}, "tests": [
        {"description": "true is a boolean", "data": True, "valid": True},
        {"description": "false is a boolean", "data": False, "valid": True},
        {"description": "zero is not a boolean", "data": 0, "valid": False},
        {"description": "one is not a boolean", "data": 1, "valid": False},
    ]},
    {"description": "null type matches only null", "schema": {"type": "null"}, "tests": [
        {"description": "null is null", "data": None, "valid": True},
        {"description": "zero is not null", "data": 0, "valid": False},
        {"description": "false is not null", "data": False, "valid": False},
        {"description": "empty string is not null", "data": "", "valid": False},
    ]},
    {"description": "multiple types", "schema": {"type": ["integer", "string"]}, "tests": [
        {"description": "an integer is valid", "data": 1, "valid": True},
        {"description": "a string is valid", "data": "foo", "valid": True},
        {"description": "a float is invalid", "data": 1.1, "valid": False},
        {"description": "an object is invalid", "data": {}, "valid": False},
    ]},
    # ---- minimum / maximum / exclusives / multipleOf ---------------------
    {"description": "minimum validation", "schema": {"minimum": 1.1}, "tests": [
        {"description": "above the minimum is valid", "data": 2.6, "valid": True},
        {"description": "boundary point is valid", "data": 1.1, "valid": True},
        {"description": "below the minimum is invalid", "data": 0.6, "valid": False},
        {"description": "ignores non-numbers", "data": "x", "valid": True},
    ]},
    {"description": "maximum validation", "schema": {"maximum": 3.0}, "tests": [
        {"description": "below the maximum is valid", "data": 2.6, "valid": True},
        {"description": "boundary point is valid", "data": 3.0, "valid": True},
        {"description": "above the maximum is invalid", "data": 3.5, "valid": False},
        {"description": "ignores non-numbers", "data": "x", "valid": True},
    ]},
    {"description": "exclusiveMinimum validation", "schema": {"exclusiveMinimum": 1.1}, "tests": [
        {"description": "above is valid", "data": 1.2, "valid": True},
        {"description": "boundary point is invalid", "data": 1.1, "valid": False},
        {"description": "below is invalid", "data": 0.6, "valid": False},
        {"description": "ignores non-numbers", "data": "x", "valid": True},
    ]},
    {"description": "exclusiveMaximum validation", "schema": {"exclusiveMaximum": 3.0}, "tests": [
        {"description": "below is valid", "data": 2.2, "valid": True},
        {"description": "boundary point is invalid", "data": 3.0, "valid": False},
        {"description": "above is invalid", "data": 3.5, "valid": False},
        {"description": "ignores non-numbers", "data": "x", "valid": True},
    ]},
    {"description": "by int", "schema": {"multipleOf": 2}, "tests": [
        {"description": "int by int", "data": 10, "valid": True},
        {"description": "int by int fail", "data": 7, "valid": False},
        {"description": "ignores non-numbers", "data": "foo", "valid": True},
    ]},
    {"description": "by number", "schema": {"multipleOf": 1.5}, "tests": [
        {"description": "zero is multiple of anything", "data": 0, "valid": True},
        {"description": "4.5 is multiple of 1.5", "data": 4.5, "valid": True},
        {"description": "35 is not multiple of 1.5", "data": 35, "valid": False},
    ]},
    {"description": "by small number", "schema": {"multipleOf": 0.0001}, "tests": [
        {"description": "0.0075 is multiple of 0.0001", "data": 0.0075, "valid": True},
        {"description": "0.00751 is not multiple of 0.0001", "data": 0.00751, "valid": False},
    ]},
    # ---- minLength / maxLength (code points!) ----------------------------
    {"description": "maxLength validation", "schema": {"maxLength": 2}, "tests": [
        {"description": "shorter is valid", "data": "f", "valid": True},
        {"description": "exact length is valid", "data": "fo", "valid": True},
        {"description": "too long is invalid", "data": "foo", "valid": False},
        {"description": "ignores non-strings", "data": 100, "valid": True},
        {"description": "two graphemes is long enough", "data": "\U0001F432\U0001F409", "valid": True},
    ]},
    {"description": "minLength validation", "schema": {"minLength": 2}, "tests": [
        {"description": "longer is valid", "data": "foo", "valid": True},
        {"description": "exact length is valid", "data": "fo", "valid": True},
        {"description": "too short is invalid", "data": "f", "valid": False},
        {"description": "ignores non-strings", "data": 1, "valid": True},
        {"description": "one supplementary codepoint is not long enough", "data": "\U0001F432", "valid": False},
    ]},
    {"description": "maxLength 1 with non-BMP char", "schema": {"maxLength": 1}, "tests": [
        {"description": "dragon fits in one code point", "data": "\U0001F432", "valid": True},
    ]},
    # ---- pattern (search semantics) ---------------------------------------
    {"description": "pattern validation", "schema": {"pattern": "^a*$"}, "tests": [
        {"description": "matching pattern is valid", "data": "aaa", "valid": True},
        {"description": "non-matching is invalid", "data": "abc", "valid": False},
        {"description": "ignores non-strings", "data": True, "valid": True},
    ]},
    {"description": "pattern is not anchored", "schema": {"pattern": "a+"}, "tests": [
        {"description": "matches a substring", "data": "xxaayy", "valid": True},
        {"description": "no substring match is invalid", "data": "xxyy", "valid": False},
    ]},
    {"description": "non-BMP pattern", "schema": {"pattern": "^\U0001F432*$"}, "tests": [
        {"description": "matches empty", "data": "", "valid": True},
        {"description": "matches two dragons", "data": "\U0001F432\U0001F432", "valid": True},
        {"description": "does not match other chars", "data": "\U0001F432x", "valid": False},
    ]},
    # ---- enum / const ------------------------------------------------------
    {"description": "simple enum validation", "schema": {"enum": [1, 2, 3]}, "tests": [
        {"description": "one of the enum is valid", "data": 1, "valid": True},
        {"description": "something else is invalid", "data": 4, "valid": False},
    ]},
    {"description": "heterogeneous enum", "schema": {"enum": [6, "foo", [], True, {"foo": 12}]}, "tests": [
        {"description": "one of the enum is valid", "data": [], "valid": True},
        {"description": "something else is invalid", "data": None, "valid": False},
        {"description": "objects are deep compared", "data": {"foo": False}, "valid": False},
        {"description": "valid object matches", "data": {"foo": 12}, "valid": True},
        {"description": "extra properties in object is invalid", "data": {"foo": 12, "bar": 13}, "valid": False},
    ]},
    {"description": "enum with 0 does not match false", "schema": {"enum": [0]}, "tests": [
        {"description": "integer zero is valid", "data": 0, "valid": True},
        {"description": "float zero is valid", "data": 0.0, "valid": True},
        {"description": "false is invalid", "data": False, "valid": False},
    ]},
    {"description": "enum with 1 does not match true", "schema": {"enum": [1]}, "tests": [
        {"description": "integer one is valid", "data": 1, "valid": True},
        {"description": "true is invalid", "data": True, "valid": False},
    ]},
    {"description": "nul characters in strings", "schema": {"enum": ["hello\x00there"]}, "tests": [
        {"description": "match string with nul", "data": "hello\x00there", "valid": True},
        {"description": "do not match string lacking nul", "data": "hellothere", "valid": False},
    ]},
    {"description": "const validation", "schema": {"const": 2}, "tests": [
        {"description": "same value is valid", "data": 2, "valid": True},
        {"description": "another value is invalid", "data": 5, "valid": False},
        {"description": "another type is invalid", "data": "a", "valid": False},
    ]},
    {"description": "const with object", "schema": {"const": {"foo": "bar", "baz": "bax"}}, "tests": [
        {"description": "same object is valid", "data": {"foo": "bar", "baz": "bax"}, "valid": True},
        {"description": "same object with different property order is valid", "data": {"baz": "bax", "foo": "bar"}, "valid": True},
        {"description": "another object is invalid", "data": {"foo": "bar"}, "valid": False},
        {"description": "another type is invalid", "data": [1, 2], "valid": False},
    ]},
    {"description": "const with array", "schema": {"const": [{"foo": "bar"}]}, "tests": [
        {"description": "same array is valid", "data": [{"foo": "bar"}], "valid": True},
        {"description": "another array item is invalid", "data": [2], "valid": False},
        {"description": "array with additional items is invalid", "data": [1, 2, 3], "valid": False},
    ]},
    {"description": "const with null", "schema": {"const": None}, "tests": [
        {"description": "null is valid", "data": None, "valid": True},
        {"description": "not null is invalid", "data": 0, "valid": False},
    ]},
    {"description": "const with false does not match 0", "schema": {"const": False}, "tests": [
        {"description": "false is valid", "data": False, "valid": True},
        {"description": "integer zero is invalid", "data": 0, "valid": False},
    ]},
    {"description": "const with 1 does not match true", "schema": {"const": 1}, "tests": [
        {"description": "one is valid", "data": 1, "valid": True},
        {"description": "true is invalid", "data": True, "valid": False},
        {"description": "1.0 is valid", "data": 1.0, "valid": True},
    ]},
    # ---- required / properties / patternProperties / additionalProperties --
    {"description": "required validation", "schema": {"properties": {"foo": {}, "bar": {}}, "required": ["foo"]}, "tests": [
        {"description": "present required property is valid", "data": {"foo": 1}, "valid": True},
        {"description": "non-present required property is invalid", "data": {"bar": 1}, "valid": False},
        {"description": "ignores arrays", "data": [], "valid": True},
        {"description": "ignores strings", "data": "", "valid": True},
        {"description": "ignores other non-objects", "data": 12, "valid": True},
    ]},
    {"description": "required with empty array", "schema": {"required": []}, "tests": [
        {"description": "property not required", "data": {}, "valid": True},
    ]},
    {"description": "object properties validation", "schema": {"properties": {"foo": {"type": "integer"}, "bar": {"type": "string"}}}, "tests": [
        {"description": "both properties present and valid", "data": {"foo": 1, "bar": "baz"}, "valid": True},
        {"description": "one property invalid", "data": {"foo": 1, "bar": {}}, "valid": False},
        {"description": "both properties invalid", "data": {"foo": [], "bar": {}}, "valid": False},
        {"description": "doesn't invalidate other properties", "data": {"quux": []}, "valid": True},
        {"description": "ignores arrays", "data": [], "valid": True},
    ]},
    {"description": "properties, patternProperties, additionalProperties interaction",
     "schema": {"properties": {"foo": {"type": "array", "maxItems": 3}, "bar": {"type": "array"}},
                "patternProperties": {"f.o": {"minItems": 2}},
                "additionalProperties": {"type": "integer"}},
     "tests": [
        {"description": "property validates property", "data": {"foo": [1, 2]}, "valid": True},
        {"description": "property invalidates property", "data": {"foo": [1, 2, 3, 4]}, "valid": False},
        {"description": "patternProperty invalidates property", "data": {"foo": []}, "valid": False},
        {"description": "patternProperty validates nonproperty", "data": {"fxo": [1, 2]}, "valid": True},
        {"description": "patternProperty invalidates nonproperty", "data": {"fxo": []}, "valid": False},
        {"description": "additionalProperty ignores property", "data": {"bar": []}, "valid": True},
        {"description": "additionalProperty validates others", "data": {"quux": 3}, "valid": True},
        {"description": "additionalProperty invalidates others", "data": {"quux": "foo"}, "valid": False},
    ]},
    {"description": "additionalProperties being false does not allow other properties",
     "schema": {"properties": {"foo": {}, "bar": {}}, "patternProperties": {"^v": {}}, "additionalProperties": False},
     "tests": [
        {"description": "no additional properties is valid", "data": {"foo": 1}, "valid": True},
        {"description": "an additional property is invalid", "data": {"foo": 1, "bar": 2, "quux": "boom"}, "valid": False},
        {"description": "ignores arrays", "data": [1, 2, 3], "valid": True},
        {"description": "patternProperties are not additional", "data": {"foo": 1, "vroom": 2}, "valid": True},
    ]},
    {"description": "patternProperties validates properties matching a regex",
     "schema": {"patternProperties": {"f.*o": {"type": "integer"}}},
     "tests": [
        {"description": "a single valid match is valid", "data": {"foo": 1}, "valid": True},
        {"description": "multiple valid matches is valid", "data": {"foo": 1, "foooooo": 2}, "valid": True},
        {"description": "a single invalid match is invalid", "data": {"foo": "bar", "fother": {}}, "valid": False},
        {"description": "ignores non-objects", "data": 12, "valid": True},
    ]},
    {"description": "minProperties validation", "schema": {"minProperties": 1}, "tests": [
        {"description": "longer is valid", "data": {"foo": 1, "bar": 2}, "valid": True},
        {"description": "exact length is valid", "data": {"foo": 1}, "valid": True},
        {"description": "too short is invalid", "data": {}, "valid": False},
        {"description": "ignores arrays", "data": [], "valid": True},
    ]},
    {"description": "maxProperties validation", "schema": {"maxProperties": 2}, "tests": [
        {"description": "shorter is valid", "data": {"foo": 1}, "valid": True},
        {"description": "exact length is valid", "data": {"foo": 1, "bar": 2}, "valid": True},
        {"description": "too long is invalid", "data": {"foo": 1, "bar": 2, "baz": 3}, "valid": False},
        {"description": "ignores non-objects", "data": "foobar", "valid": True},
    ]},
    # ---- items / additionalItems / minItems / maxItems ---------------------
    {"description": "a schema given for items", "schema": {"items": {"type": "integer"}}, "tests": [
        {"description": "valid items", "data": [1, 2, 3], "valid": True},
        {"description": "wrong type of items", "data": [1, "x"], "valid": False},
        {"description": "ignores non-arrays", "data": {"foo": "bar"}, "valid": True},
    ]},
    {"description": "an array of schemas for items",
     "schema": {"items": [{"type": "integer"}, {"type": "string"}]},
     "tests": [
        {"description": "correct types", "data": [1, "foo"], "valid": True},
        {"description": "wrong types", "data": ["foo", 1], "valid": False},
        {"description": "incomplete array of items", "data": [1], "valid": True},
        {"description": "array with additional items", "data": [1, "foo", True], "valid": True},
        {"description": "empty array", "data": [], "valid": True},
    ]},
    {"description": "additionalItems as schema",
     "schema": {"items": [{}], "additionalItems": {"type": "integer"}},
     "tests": [
        {"description": "additional items match schema", "data": [None, 2, 3, 4], "valid": True},
        {"description": "additional items do not match schema", "data": [None, 2, 3, "foo"], "valid": False},
    ]},
    {"description": "additionalItems as false without items", "schema": {"additionalItems": False}, "tests": [
        {"description": "items defaults to empty schema so everything is valid", "data": [1, 2, 3, 4, 5], "valid": True},
        {"description": "ignores non-arrays", "data": {"foo": "bar"}, "valid": True},
    ]},
    {"description": "array of items with no additionalItems permitted",
     "schema": {"items": [{}, {}, {}], "additionalItems": False},
     "tests": [
        {"description": "empty array", "data": [], "valid": True},
        {"description": "fewer number of items present (1)", "data": [1], "valid": True},
        {"description": "equal number of items present", "data": [1, 2, 3], "valid": True},
        {"description": "additional items are not permitted", "data": [1, 2, 3, 4], "valid": False},
    ]},
    {"description": "minItems validation", "schema": {"minItems": 1}, "tests": [
        {"description": "longer is valid", "data": [1, 2], "valid": True},
        {"description": "exact length is valid", "data": [1], "valid": True},
        {"description": "too short is invalid", "data": [], "valid": False},
        {"description": "ignores non-arrays", "data": "", "valid": True},
    ]},
    {"description": "maxItems validation", "schema": {"maxItems": 2}, "tests": [
        {"description": "shorter is valid", "data": [1], "valid": True},
        {"description": "exact length is valid", "data": [1, 2], "valid": True},
        {"description": "too long is invalid", "data": [1, 2, 3], "valid": False},
        {"description": "ignores non-arrays", "data": "foobar", "valid": True},
    ]},
    # ---- boolean schemas ----------------------------------------------------
    {"description": "boolean schema true", "schema": True, "tests": [
        {"description": "number is valid", "data": 1, "valid": True},
        {"description": "string is valid", "data": "foo", "valid": True},
        {"description": "null is valid", "data": None, "valid": True},
        {"description": "object is valid", "data": {"foo": "bar"}, "valid": True},
    ]},
    {"description": "boolean schema false", "schema": False, "tests": [
        {"description": "number is invalid", "data": 1, "valid": False},
        {"description": "string is invalid", "data": "foo", "valid": False},
        {"description": "null is invalid", "data": None, "valid": False},
        {"description": "empty object is invalid", "data": {}, "valid": False},
    ]},
    # ---- allOf / anyOf / oneOf / not ---------------------------------------
    {"description": "allOf",
     "schema": {"allOf": [{"properties": {"bar": {"type": "integer"}}, "required": ["bar"]},
                           {"properties": {"foo": {"type": "string"}}, "required": ["foo"]}]},
     "tests": [
        {"description": "allOf", "data": {"foo": "baz", "bar": 2}, "valid": True},
        {"description": "mismatch second", "data": {"foo": "baz"}, "valid": False},
        {"description": "mismatch first", "data": {"bar": 2}, "valid": False},
        {"description": "wrong type", "data": {"foo": "baz", "bar": "quux"}, "valid": False},
    ]},
    {"description": "allOf with base schema",
     "schema": {"properties": {"bar": {"type": "integer"}}, "required": ["bar"],
                "allOf": [{"properties": {"foo": {"type": "string"}}, "required": ["foo"]},
                           {"properties": {"baz": {"type": "null"}}, "required": ["baz"]}]},
     "tests": [
        {"description": "valid", "data": {"foo": "quux", "bar": 2, "baz": None}, "valid": True},
        {"description": "mismatch base schema", "data": {"foo": "quux", "baz": None}, "valid": False},
        {"description": "mismatch both", "data": {"bar": 2}, "valid": False},
    ]},
    {"description": "anyOf", "schema": {"anyOf": [{"type": "integer"}, {"minimum": 2}]}, "tests": [
        {"description": "first anyOf valid", "data": 1, "valid": True},
        {"description": "second anyOf valid", "data": 2.5, "valid": True},
        {"description": "both anyOf valid", "data": 3, "valid": True},
        {"description": "neither anyOf valid", "data": 1.5, "valid": False},
    ]},
    {"description": "anyOf with base schema",
     "schema": {"type": "string", "anyOf": [{"maxLength": 2}, {"minLength": 4}]},
     "tests": [
        {"description": "mismatch base schema", "data": 3, "valid": False},
        {"description": "one anyOf valid", "data": "foobar", "valid": True},
        {"description": "both anyOf invalid", "data": "foo", "valid": False},
    ]},
    {"description": "oneOf", "schema": {"oneOf": [{"type": "integer"}, {"minimum": 2}]}, "tests": [
        {"description": "first oneOf valid", "data": 1, "valid": True},
        {"description": "second oneOf valid", "data": 2.5, "valid": True},
        {"description": "both oneOf valid", "data": 3, "valid": False},
        {"description": "neither oneOf valid", "data": 1.5, "valid": False},
    ]},
    {"description": "not", "schema": {"not": {"type": "integer"}}, "tests": [
        {"description": "allowed", "data": "foo", "valid": True},
        {"description": "disallowed", "data": 1, "valid": False},
    ]},
    {"description": "not multiple types", "schema": {"not": {"type": ["integer", "boolean"]}}, "tests": [
        {"description": "valid", "data": "foo", "valid": True},
        {"description": "mismatch", "data": 1, "valid": False},
        {"description": "other mismatch", "data": True, "valid": False},
    ]},
    # ---- if / then / else ---------------------------------------------------
    {"description": "ignore if without then or else", "schema": {"if": {"const": 0}}, "tests": [
        {"description": "valid when valid against lone if", "data": 0, "valid": True},
        {"description": "valid when invalid against lone if", "data": "hello", "valid": True},
    ]},
    {"description": "ignore then without if", "schema": {"then": {"const": 0}}, "tests": [
        {"description": "valid when valid against lone then", "data": 0, "valid": True},
        {"description": "valid when invalid against lone then", "data": "hello", "valid": True},
    ]},
    {"description": "if and then without else",
     "schema": {"if": {"exclusiveMaximum": 0}, "then": {"minimum": -10}},
     "tests": [
        {"description": "valid through then", "data": -1, "valid": True},
        {"description": "invalid through then", "data": -100, "valid": False},
        {"description": "valid when if test fails", "data": 3, "valid": True},
    ]},
    {"description": "if and else without then",
     "schema": {"if": {"exclusiveMaximum": 0}, "else": {"multipleOf": 2}},
     "tests": [
        {"description": "valid when if test passes", "data": -1, "valid": True},
        {"description": "valid through else", "data": 4, "valid": True},
        {"description": "invalid through else", "data": 3, "valid": False},
    ]},
    {"description": "validate against correct branch, then vs else",
     "schema": {"if": {"exclusiveMaximum": 0}, "then": {"minimum": -10}, "else": {"multipleOf": 2}},
     "tests": [
        {"description": "valid through then", "data": -1, "valid": True},
        {"description": "invalid through then", "data": -100, "valid": False},
        {"description": "valid through else", "data": 4, "valid": True},
        {"description": "invalid through else", "data": 3, "valid": False},
    ]},
    # ---- $ref / $defs / $anchor --------------------------------------------
    {"description": "root pointer ref",
     "schema": {"properties": {"foo": {"$ref": "#"}}, "additionalProperties": False},
     "tests": [
        {"description": "match", "data": {"foo": False}, "valid": True},
        {"description": "recursive match", "data": {"foo": {"foo": False}}, "valid": True},
        {"description": "mismatch", "data": {"bar": False}, "valid": False},
        {"description": "recursive mismatch", "data": {"foo": {"bar": False}}, "valid": False},
    ]},
    {"description": "relative pointer ref to object",
     "schema": {"properties": {"foo": {"type": "integer"}, "bar": {"$ref": "#/properties/foo"}}},
     "tests": [
        {"description": "match", "data": {"bar": 3}, "valid": True},
        {"description": "mismatch", "data": {"bar": True}, "valid": False},
    ]},
    {"description": "ref to $defs",
     "schema": {"$defs": {"positiveInteger": {"type": "integer", "minimum": 1}},
                "properties": {"n": {"$ref": "#/$defs/positiveInteger"}}},
     "tests": [
        {"description": "match", "data": {"n": 5}, "valid": True},
        {"description": "mismatch type", "data": {"n": "5"}, "valid": False},
        {"description": "mismatch minimum", "data": {"n": 0}, "valid": False},
    ]},
    {"description": "ref by $anchor",
     "schema": {"$id": "https://example.test/root", "$defs": {"A": {"$anchor": "foo", "type": "integer"}},
                "properties": {"x": {"$ref": "#foo"}}},
     "tests": [
        {"description": "match", "data": {"x": 1}, "valid": True},
        {"description": "mismatch", "data": {"x": "a"}, "valid": False},
    ]},
    {"description": "nested refs",
     "schema": {"$defs": {"a": {"type": "integer"}, "b": {"$ref": "#/$defs/a"}, "c": {"$ref": "#/$defs/b"}},
                "$ref": "#/$defs/c"},
     "tests": [
        {"description": "nested ref valid", "data": 5, "valid": True},
        {"description": "nested ref invalid", "data": "a", "valid": False},
    ]},
    # ---- default (no validation effect) --------------------------------------
    {"description": "invalid type for default",
     "schema": {"properties": {"foo": {"type": "integer", "default": []}}},
     "tests": [
        {"description": "valid when property is specified", "data": {"foo": 13}, "valid": True},
        {"description": "still valid when the invalid default is used", "data": {}, "valid": True},
    ]},
    # ---- format (parsed, never enforced — parity) -----------------------------
    {"description": "format is annotation only", "schema": {"format": "email"}, "tests": [
        {"description": "invalid email string is valid (format not enforced)", "data": "2962", "valid": True},
    ]},
    # ---- bignum ----------------------------------------------------------------
    {"description": "integer comparison with big numbers", "schema": {"maximum": 18446744073709551615}, "tests": [
        {"description": "comparison works for high numbers", "data": 18446744073709551600, "valid": True},
    ]},
    {"description": "minimum with big negative numbers", "schema": {"minimum": -18446744073709551615}, "tests": [
        {"description": "comparison works for very negative numbers", "data": -18446744073709551600, "valid": True},
        {"description": "smaller than minimum is invalid", "data": -2e308 if False else -1.7976931348623157e308, "valid": False},
    ]},
]

CASES += [
    # ---- combinator nesting ------------------------------------------------
    {"description": "nested allOf", "schema": {"allOf": [{"allOf": [{"type": "null"}]}]}, "tests": [
        {"description": "null is valid", "data": None, "valid": True},
        {"description": "anything non-null is invalid", "data": 123, "valid": False},
    ]},
    {"description": "allOf combined with anyOf, oneOf",
     "schema": {"allOf": [{"multipleOf": 2}], "anyOf": [{"multipleOf": 3}],
                "oneOf": [{"multipleOf": 5}]},
     "tests": [
        {"description": "allOf: false, anyOf: false, oneOf: false", "data": 1, "valid": False},
        {"description": "allOf: true, anyOf: false, oneOf: false", "data": 2, "valid": False},
        {"description": "allOf: false, anyOf: true, oneOf: false", "data": 3, "valid": False},
        {"description": "allOf: true, anyOf: true, oneOf: false", "data": 6, "valid": False},
        {"description": "allOf: true, anyOf: false, oneOf: true", "data": 10, "valid": False},
        {"description": "allOf: true, anyOf: true, oneOf: true", "data": 30, "valid": True},
    ]},
    {"description": "oneOf with required",
     "schema": {"type": "object",
                "oneOf": [{"required": ["foo", "bar"]}, {"required": ["foo", "baz"]}]},
     "tests": [
        {"description": "both valid is invalid", "data": {"foo": 1, "bar": 2, "baz": 3}, "valid": False},
        {"description": "first valid", "data": {"foo": 1, "bar": 2}, "valid": True},
        {"description": "second valid", "data": {"foo": 1, "baz": 3}, "valid": True},
        {"description": "neither", "data": {"foo": 1}, "valid": False},
    ]},
    {"description": "not with boolean schema true", "schema": {"not": True}, "tests": [
        {"description": "any value is invalid", "data": "foo", "valid": False},
    ]},
    {"description": "not with boolean schema false", "schema": {"not": False}, "tests": [
        {"description": "any value is valid", "data": "foo", "valid": True},
    ]},
    {"description": "collect annotations inside a 'not'",
     "schema": {"not": {"anyOf": [{"type": "string"}, {"type": "number"}]}},
     "tests": [
        {"description": "object is valid", "data": {}, "valid": True},
        {"description": "number is invalid", "data": 1, "valid": False},
    ]},
    # ---- if/then/else inside allOf -----------------------------------------
    {"description": "if appears at the end when serialized (keyword processing sequence)",
     "schema": {"then": {"const": "yes"}, "else": {"const": "other"},
                "if": {"maxLength": 4}},
     "tests": [
        {"description": "yes redirects to then and passes", "data": "yes", "valid": True},
        {"description": "other redirects to else and passes", "data": "other", "valid": True},
        {"description": "no redirects to then and fails", "data": "no", "valid": False},
        {"description": "invalid redirects to else and fails", "data": "invalid", "valid": False},
    ]},
    # ---- $ref shenanigans ----------------------------------------------------
    {"description": "$ref prevents a sibling $id from changing the base uri",
     "schema": {"$id": "https://site.test/base",
                "$defs": {"x": {"type": "integer"}},
                "properties": {"a": {"$ref": "#/$defs/x"}}},
     "tests": [
        {"description": "match", "data": {"a": 1}, "valid": True},
        {"description": "mismatch", "data": {"a": "x"}, "valid": False},
    ]},
    {"description": "refs with quote in pointer",
     "schema": {"$defs": {"a~b": {"type": "integer"}},
                "properties": {"x": {"$ref": "#/$defs/a~0b"}}},
     "tests": [
        {"description": "pointer ~0 unescape", "data": {"x": 3}, "valid": True},
        {"description": "pointer mismatch", "data": {"x": "s"}, "valid": False},
    ]},
    {"description": "ref into combinator branch",
     "schema": {"if": {"type": "integer"}, "then": True,
                "properties": {"b": {"$ref": "#/if"}}},
     "tests": [
        {"description": "valid through ref", "data": {"b": 2}, "valid": True},
        {"description": "invalid through ref", "data": {"b": "x"}, "valid": False},
    ]},
    # ---- enum/const edge semantics --------------------------------------------
    {"description": "enum with -0", "schema": {"enum": [-0.0]}, "tests": [
        {"description": "0 matches -0 (SameValueZero)", "data": 0, "valid": True},
        {"description": "0.0 matches", "data": 0.0, "valid": True},
    ]},
    {"description": "const with -0", "schema": {"const": -0.0}, "tests": [
        {"description": "0 equals -0", "data": 0, "valid": True},
    ]},
    {"description": "const nested 1 vs true", "schema": {"const": [1]}, "tests": [
        {"description": "[1] matches", "data": [1], "valid": True},
        {"description": "[true] does not", "data": [True], "valid": False},
    ]},
    {"description": "enum with escaped characters", "schema": {"enum": ["foo\nbar", "foo\rbar"]}, "tests": [
        {"description": "member 1", "data": "foo\nbar", "valid": True},
        {"description": "member 2", "data": "foo\rbar", "valid": True},
        {"description": "another string", "data": "abc", "valid": False},
    ]},
    # ---- properties edge cases --------------------------------------------------
    {"description": "properties with escaped characters",
     "schema": {"properties": {"foo\nbar": {"type": "number"}, "foo\"bar": {"type": "number"}}},
     "tests": [
        {"description": "valid", "data": {"foo\nbar": 1, "foo\"bar": 2}, "valid": True},
        {"description": "invalid", "data": {"foo\nbar": "x"}, "valid": False},
    ]},
    {"description": "properties with boolean schema",
     "schema": {"properties": {"foo": True, "bar": False}},
     "tests": [
        {"description": "no property present is valid", "data": {}, "valid": True},
        {"description": "only 'true' property present is valid", "data": {"foo": 1}, "valid": True},
        {"description": "'false' property present is invalid", "data": {"bar": 1}, "valid": False},
    ]},
    {"description": "items with boolean schema false", "schema": {"items": False}, "tests": [
        {"description": "any non-empty array is invalid", "data": [1], "valid": False},
        {"description": "empty array is valid", "data": [], "valid": True},
    ]},
    {"description": "maxProperties 0 means empty object",
     "schema": {"maxProperties": 0},
     "tests": [
        {"description": "no properties is valid", "data": {}, "valid": True},
        {"description": "one property is invalid", "data": {"a": 1}, "valid": False},
    ]},
    # ---- pattern edge -------------------------------------------------------------
    {"description": "pattern with special characters", "schema": {"pattern": "a\\.b"}, "tests": [
        {"description": "literal dot matches", "data": "xa.by", "valid": True},
        {"description": "other char does not", "data": "xaxby", "valid": False},
    ]},
    {"description": "patternProperties with non-anchored regex",
     "schema": {"patternProperties": {"a": {"type": "integer"}}},
     "tests": [
        {"description": "key containing a anywhere is routed", "data": {"xax": 1}, "valid": True},
        {"description": "routed key with wrong type", "data": {"xax": "s"}, "valid": False},
        {"description": "unrouted key ignored", "data": {"xxx": "s"}, "valid": True},
    ]},
]

CASES += [
    {"description": "const object with same length but different keys",
     "schema": {"const": {"a": 1}},
     "tests": [
        {"description": "matching object", "data": {"a": 1}, "valid": True},
        # r3 correction (node-executed reference): constRemain is dead code
        # (schema.js:1360 'FIXME'), so disjoint same-count keys VALIDATE
        {"description": "same size, different key", "data": {"b": 1}, "valid": True},
        {"description": "same size, wrong value", "data": {"a": 2}, "valid": False},
    ]},
    {"description": "nested items",
     "schema": {"items": {"items": {"type": "integer"}}},
     "tests": [
        {"description": "valid nested array", "data": [[1, 2], [3]], "valid": True},
        {"description": "wrong inner type", "data": [[1, "x"]], "valid": False},
        {"description": "outer non-array items ignored? no — items applies", "data": [1], "valid": True},
    ]},
    {"description": "items with object schemas",
     "schema": {"items": {"properties": {"k": {"type": "integer"}}, "required": ["k"]}},
     "tests": [
        {"description": "all items valid", "data": [{"k": 1}, {"k": 2}], "valid": True},
        {"description": "one item missing k", "data": [{"k": 1}, {}], "valid": False},
        {"description": "one item wrong type", "data": [{"k": "s"}], "valid": False},
    ]},
    {"description": "anchor inside $defs with nested ref",
     "schema": {"$id": "https://ex.test/nest",
                "$defs": {"node": {"$anchor": "node",
                                    "properties": {"v": {"type": "integer"},
                                                    "next": {"$ref": "#node"}}}},
                "$ref": "#node"},
     "tests": [
        {"description": "linked list valid", "data": {"v": 1, "next": {"v": 2}}, "valid": True},
        {"description": "deep mismatch", "data": {"v": 1, "next": {"v": "x"}}, "valid": False},
    ]},
    {"description": "allOf with two refs",
     "schema": {"$defs": {"a": {"minimum": 0}, "b": {"maximum": 10}},
                "allOf": [{"$ref": "#/$defs/a"}, {"$ref": "#/$defs/b"}]},
     "tests": [
        {"description": "in range", "data": 5, "valid": True},
        {"description": "below", "data": -1, "valid": False},
        {"description": "above", "data": 11, "valid": False},
    ]},
    {"description": "exclusive bounds as floats on integers",
     "schema": {"exclusiveMinimum": 0.5, "exclusiveMaximum": 3.5},
     "tests": [
        {"description": "1 is inside", "data": 1, "valid": True},
        {"description": "0 is outside", "data": 0, "valid": False},
        {"description": "4 is outside", "data": 4, "valid": False},
    ]},
    {"description": "empty required with other constraints",
     "schema": {"required": [], "minProperties": 0},
     "tests": [
        {"description": "empty object", "data": {}, "valid": True},
    ]},
    {"description": "oneOf with empty branch list is unsatisfiable",
     "schema": {"oneOf": []},
     "tests": [
        # finish() filters [] -> 0 valid != 1 -> error (schema.js:1379-1385)
        {"description": "nothing passes", "data": 1, "valid": False},
    ]},
    {"description": "anyOf with empty branch list is unsatisfiable",
     "schema": {"anyOf": []},
     "tests": [
        {"description": "nothing passes", "data": "x", "valid": False},
    ]},
]

# Violation keyword/message assertions mirroring
# /root/reference/test/validate.test.js (T2 report parity).
REPORT_CASES = [
    # (schema, data, expected keyword, expected message)
    ({"type": "string"}, 1, "type", "Unexpected number: Expected string"),
    ({"type": ["string", "number"]}, True, "type", "Unexpected boolean: Expected one of string, number"),
    ({"type": []}, 1, "type", "Unexpected number: No value allowed"),
    ({"minLength": 2}, "a", "minLength", "String too short"),
    ({"maxLength": 1}, "ab", "maxLength", "String too long"),
    ({"pattern": "^a"}, "b", "pattern", "String does not match /^a/"),
    ({"minimum": 2}, 1, "minimum", "Number under/equal to minimum"),
    ({"maximum": 2}, 3, "maximum", "Number under/equal to maximum"),
    ({"exclusiveMinimum": 2}, 2, "exclusiveMinimum", "Number under minimum"),
    ({"exclusiveMaximum": 2}, 2, "exclusiveMaximum", "Number under maximum"),
    ({"multipleOf": 2}, 3, "multipleOf", "Number not multiple of"),
    ({"type": "integer"}, 1.5, "type", "Expected an integer"),
    ({"minProperties": 1}, {}, "minProperties", "Too few properties"),
    ({"maxProperties": 0}, {"a": 1}, "maxProperties", "Too many properties"),
    ({"required": ["a"]}, {}, "required", "Required property missing"),
    ({"minItems": 1}, [], "minItems", "Too few items"),
    ({"maxItems": 0}, [1], "maxItems", "Too many items"),
    ({"enum": ["a"]}, "b", "enum", "String does not match one of the enumerated values"),
    ({"enum": [1]}, 2, "enum", "Number does not match one of the enumerated values"),
    ({"enum": [True]}, False, "enum", "Boolean does not match one of the enumerated values"),
    ({"enum": ["a"]}, None, "enum", "Null does not match one of the enumerated values"),
    ({"const": "a"}, "b", "const", "String does not match constant"),
    ({"const": 1}, 2, "const", "const number mismatch"),
    ({"const": True}, False, "const", "const mismatch"),
    ({"not": {"type": "integer"}}, 1, "not", 'Expected "not" to fail'),
    ({"oneOf": [{"type": "integer"}, {"minimum": 2}]}, 3, "oneOf",
     'Expected "oneOf" to have exactly one matching schema'),
    ({"anyOf": [{"type": "integer"}, {"minimum": 2}]}, 1.5, "anyOf",
     'Expected "anyOf" to have at least one matching schema'),
    # allOf surfaces the child's keyword, not allOf (validate.test.js:42-44);
    # `integer` normalizes to allowedTypes ['number'] (schema.js:313, 336-343)
    ({"allOf": [{"type": "integer"}]}, "x", "type", "Unexpected string: Expected number"),
    # container const/enum reductions (schema.js:797-804, 833-838, 813-820)
    ({"const": {"a": 1, "b": 2}}, {"a": 1}, "const", "Incorrect number of properties"),
    ({"const": [1, 2]}, [1], "const", "Incorrect number of items"),
    ({"enum": [[1]]}, [2], "enum", 'Expected "enum" to have one matching value'),
    # r3 corrections (node-executed reference): same-key-count objects with
    # disjoint keys VALIDATE against object const/enum — constRemain
    # (schema.js:1360 'FIXME') is dead code. The two removed cases here
    # ({"enum":[{"a":1}]} vs {"b":2}; {"const":{"a":1}} vs {"b":1}) were
    # authored from reading that branch and contradicted the executable;
    # their valid-verdict replacements live in
    # test_evaluator.test_const_object_same_length_different_keys.
]
