"""Reference position parity: ValidationError.position /
Annotation.position (test/ValidationError.test.js:19-20,
test/Annotation.test.js:18-24) and SchemaRegistry import semantics
(test/SchemaRegistry.test.js), r4."""

from __future__ import annotations

import shutil
from pathlib import Path

import pytest

node_available = shutil.which("node") is not None and Path("/root/reference").exists()


def test_validation_error_position_reference_unit():
    """The reference's own ValidationError.test.js assertions."""
    from jsonschemaparse_spark.api import parse_info

    p = parse_info("{}", {"type": "string"})
    assert len(p.errors) == 1
    err = p.errors[0]
    assert err.message == "Unexpected object: Expected string"
    assert err.position == {"line": 0, "column": 0}


def test_annotation_position_reference_unit():
    """The reference's own Annotation.test.js assertions."""
    from jsonschemaparse_spark.api import parse_info

    p = parse_info("{}", {"title": "Some Title",
                          "description": "A longer description of how the value works."})
    assert len(p.annotations) == 2
    assert p.annotations[0].value == "Some Title"
    assert p.annotations[0].position == {"line": 0, "column": 0}
    assert p.annotations[1].position == {"line": 0, "column": 0}


def test_position_anchors_pinned():
    """Anchor classes pinned by direct reference probe: root before
    whitespace, property values at their colon, array items at the first
    value char; UTF-16 units; lines>0 column convention."""
    from jsonschemaparse_spark.api import parse_info

    cases = [
        ('{"a": 5}', {"properties": {"a": {"type": "string"}}}, [("/a", 0, 4)]),
        ('{"a" : 5}', {"properties": {"a": {"type": "string"}}}, [("/a", 0, 5)]),
        ('{\n  "a": 5\n}', {"properties": {"a": {"type": "string"}}}, [("/a", 1, 6)]),
        ('[1,  5]', {"items": {"type": "string"}},
         [("/0", 0, 1), ("/1", 0, 5)]),
        (' 5', {"type": "string"}, [("", 0, 0)]),
        ('{"a": {"b": 7}}',
         {"properties": {"a": {"properties": {"b": {"type": "string"}}}}},
         [("/a/b", 0, 10)]),
        ('{"\U0001F432": 5}', {"additionalProperties": {"type": "string"}},
         [("/\U0001F432", 0, 5)]),  # astral key: colon at UTF-16 unit 5
    ]
    for text, schema, expected in cases:
        info = parse_info(text, schema)
        got = sorted((e.path, e.position["line"], e.position["column"])
                     for e in info.errors)
        assert got == sorted(expected), (text, got)


def test_stream_parser_positions_across_chunks():
    """Positions survive arbitrary chunk boundaries (byte-resume)."""
    from jsonschemaparse_spark.api import StreamParser

    text = '{\n  "a": 5\n}'
    sp = StreamParser(schema={"properties": {"a": {"type": "string"}}})
    for ch in text:  # one char per write
        sp.write(ch)
    r = sp.end()
    assert [(e.path, e.position) for e in r.errors] == [
        ("/a", {"line": 1, "column": 6})
    ]


def test_table_scope_records_have_no_position(spark):
    """Table rows have no text positions — the field stays None and out
    of as_row() (violations DataFrame schema unchanged)."""
    from jsonschemaparse_spark.plans import validate_dataframe

    df = spark.createDataFrame([(1, "x")], "id long, s string")
    res = validate_dataframe(df, {"properties": {"s": {"minLength": 5}}},
                             key_cols=["id"])
    row = res.violations().first()
    assert "position" not in row.asDict()


@pytest.mark.skipif(not node_available, reason="node or reference unavailable")
@pytest.mark.parametrize("seed", [1, 2])
def test_position_differential(seed):
    from scripts.position_differential import compare, run_engine, run_reference
    from scripts.reference_differential import generate_groups

    groups = generate_groups(100, seed)
    ref = run_reference(groups)
    mism = compare(groups, ref, run_engine(groups, ref))
    assert mism == [], mism[:3]


# ---------------------------------------------------------------------------
# SchemaRegistry parity (test/SchemaRegistry.test.js)
# ---------------------------------------------------------------------------
def test_registry_import_idempotent():
    from jsonschemaparse_spark import SchemaRegistry

    reg = SchemaRegistry()
    a1 = reg.import_schema("http://localhost/a.json", {})
    a2 = reg.import_schema("http://localhost/a.json", {})
    assert a1 is a2  # same instance, like the reference
    with pytest.raises(Exception, match="already defined"):
        reg.import_schema("http://localhost/a.json", {"type": "string"})


def test_registry_get_unresolved():
    from jsonschemaparse_spark import SchemaRegistry

    reg = SchemaRegistry()
    reg.import_schema("http://localhost/a.json",
                      {"additionalProperties": {"$ref": "b.json"}})
    assert "http://localhost/b.json" in reg.get_unresolved()
    assert "http://localhost/b.json" in reg.seen
    reg.import_schema("http://localhost/b.json", {"type": "string"})
    assert "http://localhost/b.json" not in reg.get_unresolved()
    assert "http://localhost/b.json" in reg.seen


# ---------------------------------------------------------------------------
# reference options-dict form (test/parse.test.js 'parse(text, options)')
# ---------------------------------------------------------------------------
def test_parse_options_dict_form():
    from jsonschemaparse_spark.api import ParseValidationError, parse, parse_info

    assert parse('""', {"schema": {"type": "string"}}) == ""
    with pytest.raises(ParseValidationError):
        parse("{}", {"schema": {"type": "string"}})
    # bare dicts remain schemas (documented convenience divergence)
    assert parse('""', {"type": "string"}) == ""
    # options carry the policy family through
    info = parse_info('{"n": 12345678901234567890123}',
                      {"schema": {}, "bigNumber": "error"})
    assert [e.keyword for e in info.errors] == ["bigNumber"]
    # reviver via options (reference parse.js:77-97)
    doubled = parse('{"a": 1}', {
        "schema": {},
        "reviver": lambda k, v: v * 2
        if isinstance(v, int) and not isinstance(v, bool) else v,
    })
    assert doubled == {"a": 2}


def test_validate_json_positions_table(spark):
    """Table-scope positioned report matches the api-level positions for
    the same documents (which are node-differential-verified), including
    the syntax-error position row."""
    from jsonschemaparse_spark.api import parse_info
    from jsonschemaparse_spark.plans.json_validator import validate_json_positions

    docs = [
        (1, '{"a": 5}'), (2, '{\n  "a": 5\n}'), (3, '{"a": "ok"}'),
        (4, '[1, tru'), (5, None), (6, '{"a": [1, 2]}'),
    ]
    rules = {"properties": {"a": {"type": "string"}}}
    df = spark.createDataFrame(docs, "id long, doc string")
    got = {
        (r["id"], r["path"], r["keyword"]): (r["line"], r["column"])
        for r in validate_json_positions(df, "doc", rules, key_cols=["id"]).collect()
    }
    assert got[(1, "/a", "type")] == (0, 4)
    assert got[(2, "/a", "type")] == (1, 6)
    assert got[(6, "/a", "type")] == (0, 4)
    assert got[(4, "", "syntax")] == (0, 7)  # the SyntaxError position
    assert not any(k[0] in (3, 5) for k in got)
    # api-level agreement per doc
    for i, doc in docs:
        if doc is None or i == 4:
            continue
        info = parse_info(doc, rules)
        api_rows = {(i, e.path, e.keyword):
                    (e.position["line"], e.position["column"])
                    for e in info.errors}
        for k, v in api_rows.items():
            assert got[k] == v


def test_registry_boolean_and_id_divergent_idempotence():
    """r4 second-review fixes: boolean schemas and $id-divergent schemas
    re-import idempotently (import maps key by the IMPORT URI with the
    ORIGINAL object, not the canonicalized resolved-$id form)."""
    from jsonschemaparse_spark import SchemaRegistry

    reg = SchemaRegistry()
    b1 = reg.import_schema("http://x/bool.json", True)
    assert reg.import_schema("http://x/bool.json", True) is b1
    f1 = reg.import_schema("http://x/f.json", False)
    assert reg.import_schema("http://x/f.json", False) is f1
    s1 = reg.import_schema("http://x/a.json",
                           {"$id": "http://x/b.json", "type": "string"})
    assert reg.import_schema(
        "http://x/a.json", {"$id": "http://x/b.json", "type": "string"}) is s1


def test_parse_options_resource_caps():
    """r4 second-review fix: the options form carries the reference's
    parser resource caps (parse.js:146-150) through ResourceLimits."""
    from jsonschemaparse_spark.api import parse
    from jsonschemaparse_spark.errors import ResourceLimitError

    with pytest.raises(ResourceLimitError):
        parse("[1,2,3,4]", {"schema": {}, "maxItems": 2})
    with pytest.raises(ResourceLimitError):
        parse('{"a":1,"b":2}', {"schema": {}, "maxProperties": 1})
    with pytest.raises(ResourceLimitError):
        parse('"abcdef"', {"schema": {}, "maxStringLength": 3})
    assert parse("[1,2]", {"schema": {}, "maxItems": 2}) == [1, 2]


def test_position_collision_first_writer_wins():
    """Unescaped paths collide when a key contains '/' (the reference
    emits the ambiguous path too); the map keeps the FIRST value's
    anchor, so the shallow a/b property reports its own colon."""
    from jsonschemaparse_spark.api import parse_info

    info = parse_info('{"a/b": 5, "a": {"b": 6}}',
                      {"properties": {"a/b": {"type": "string"}}})
    assert [(e.path, e.position) for e in info.errors] == [
        ("/a/b", {"line": 0, "column": 6})
    ]


def test_json_positions_table_keeps_scanner_message(spark):
    """Parser-disagreement docs in the table kernel keep the real scanner
    message (not the fabricated 'syntax' placeholder)."""
    from jsonschemaparse_spark.plans.json_validator import validate_json_positions

    df = spark.createDataFrame([(1, "NaN")], "id long, doc string")
    row = validate_json_positions(df, "doc", {"type": "number"},
                                  key_cols=["id"]).first()
    assert row["keyword"] == "syntax"
    assert "Unexpected" in row["message"]  # loads_strict's NaN rejection text


def test_positions_chunk_split_invariant():
    """The anchor map must be identical no matter how the input is split
    across write() calls (hypothesis-style sweep over chunk sizes 1-7,
    matching the incremental suite's byte-replay contract)."""
    from jsonschemaparse_spark.schema.incremental import IncrementalJSONParser

    texts = [
        '{"a": 5, "b": [1, {"c": 2}], "d": "x"}',
        '{\n "k": [\n  1,\n  {"z": [true, null]}\n ]\n}',
        '[ {"\U0001F432": 1}, "s", [2, 3] ]',
        '{"a/b": 5, "a": {"b": 6}}',
    ]
    for text in texts:
        whole = IncrementalJSONParser(track_positions=True)
        whole.write(text)
        whole.end()
        for size in range(1, 8):
            p = IncrementalJSONParser(track_positions=True)
            for i in range(0, len(text), size):
                p.write(text[i:i + size])
            p.end()
            assert p.positions == whole.positions, (text, size)


def test_parse_charset_option():
    """charset gate pinned by executing the reference: checked for BYTE
    input only; ASCII rejects high bytes; 'string' rejects byte input;
    unknown charsets reject byte input and are ignored for strings."""
    from jsonschemaparse_spark.api import ParseSyntaxError, parse

    with pytest.raises(ParseSyntaxError, match="high-byte"):
        parse(b'"a\xc3\xa9"', {"schema": None, "charset": "ASCII"})
    assert parse(b'"a"', {"schema": None, "charset": "ASCII"}) == "a"
    assert parse(b'"a\xc3\xa9"', {"schema": None, "charset": "UTF-8"}) == "aé"
    assert parse("[1]", {"schema": None, "charset": "bogus"}) == [1]
    with pytest.raises(ParseSyntaxError, match="to be a string"):
        parse(b"[1]", {"schema": None, "charset": "string"})
    with pytest.raises(ParseSyntaxError, match="Unknown"):
        parse(b"[1]", {"schema": None, "charset": "bogus"})


def test_stream_parser_bignumber_policies():
    """StreamParser({bigNumber}/{niceNumber}/{maxNumberLength}) — policies
    apply per complete number token across arbitrary chunk splits;
    'error' surfaces as ResourceLimitError (the reference's throw)."""
    from jsonschemaparse_spark.api import StreamParser
    from jsonschemaparse_spark.errors import ResourceLimitError

    sp = StreamParser(big_number="error")
    sp.write("123456789012345678")
    with pytest.raises(ResourceLimitError, match="too precise"):
        sp.write("90123")
        sp.end()

    sp = StreamParser(big_number="json")
    sp.write('{"n": 123456789012345678')
    sp.write("90123}")
    assert sp.end().value == {"n": "12345678901234567890123"}

    sp = StreamParser(max_number_length=5)
    with pytest.raises(ResourceLimitError, match="maxNumberLength"):
        sp.write("123456 ")
        sp.end()

    sp = StreamParser(big_number="error")
    sp.write("42")
    assert sp.end().value == 42  # representable: no policy fire


def test_stream_parser_strict_limits():
    """strict_limits=True enforces parser caps DURING the parse with the
    reference's messages/throw (parse.js:146-150; probed under node:
    'String too long', 'Too many items in array', 'Too many properties in
    object'); the default keeps limit violations as end() rows. A giant
    string aborts near its cap — memory stays O(cap) on hostile input."""
    from jsonschemaparse_spark.api import StreamParser
    from jsonschemaparse_spark.errors import ResourceLimitError
    from jsonschemaparse_spark.schema.evaluate import ResourceLimits

    def strict(text, **lim):
        sp = StreamParser(limits=ResourceLimits(**lim), strict_limits=True)
        for i in range(0, len(text), 3):
            sp.write(text[i:i + 3])
        return sp.end()

    with pytest.raises(ResourceLimitError, match="String too long"):
        strict('"abcdefgh"', max_string_length=4)
    with pytest.raises(ResourceLimitError, match="String too long"):
        strict('{"abcdef": 1}', max_key_length=3)
    with pytest.raises(ResourceLimitError, match="Too many items"):
        strict("[1,2,3,4]", max_items=2)
    with pytest.raises(ResourceLimitError, match="Too many properties"):
        strict('{"a":1,"b":2,"c":3}', max_properties=2)
    assert strict('"ab"', max_string_length=4).value == "ab"

    # hostile unbounded string aborts before buffering it all
    sp = StreamParser(limits=ResourceLimits(max_string_length=10),
                      strict_limits=True)
    with pytest.raises(ResourceLimitError):
        # never closed; the raw-scan bound fires at 12*cap+12 (the escape
        # bound: an escaped astral char is 12 raw chars per code point)
        sp.write('"' + "x" * 200)
    # within-cap escape-heavy content is ACCEPTED regardless of lexical
    # form (r4 third-review #2: the old 6x bound threw on this)
    sp = StreamParser(limits=ResourceLimits(max_string_length=10),
                      strict_limits=True)
    sp.write('"' + "\\ud83d\\udc32" * 10 + '"')
    assert len(sp.end().value) == 10  # ten astral chars, within cap

    # default: reported as rows at end(), not thrown (table contract)
    sp = StreamParser(limits=ResourceLimits(max_string_length=4))
    sp.write('"abcdefgh"')
    info = sp.end()
    assert [e.message for e in info.errors] == ["String too long"]


def test_stream_parser_interoperable_and_charset():
    """StreamParser({interoperable}) rejects duplicate keys at INSERT time
    and unpaired surrogates per string token (I-JSON, RFC 7493), and
    defaults bigNumber to 'error' like loads_relaxed;
    StreamParser({charset}) gates byte chunks with the reference's
    messages. Plain mode keeps lone surrogates accepted (reference
    parity)."""
    from jsonschemaparse_spark.api import ParseSyntaxError, StreamParser
    from jsonschemaparse_spark.errors import ResourceLimitError

    def run(chunks, **kw):
        sp = StreamParser(**kw)
        for c in chunks:
            sp.write(c)
        return sp.end().value

    with pytest.raises(ParseSyntaxError, match="Duplicate object keys"):
        run(['{"a":1,', '"a":2}'], interoperable=True)
    assert run(['{"a":1,"b":2}'], interoperable=True) == {"a": 1, "b": 2}
    with pytest.raises(ResourceLimitError, match="too precise"):
        run(["123456789012345678901"], interoperable=True)
    with pytest.raises(ParseSyntaxError, match="Unpaired high surrogate"):
        run(['"\\ud800"'], interoperable=True)
    assert run(['"\\ud800"']) == "\ud800"  # plain mode: reference parity

    with pytest.raises(ParseSyntaxError, match="high-byte"):
        run([b'"a\xc3\xa9"'], charset="ASCII")
    assert run([b'"a"'], charset="ASCII") == "a"
    with pytest.raises(ParseSyntaxError, match="to be a string"):
        run([b"[1]"], charset="string")


def test_stream_parser_options_dict_and_ordering():
    """r4 third-review fixes: StreamParser accepts the reference
    options-dict form (#1); validation sees the RAW value with the reviver
    applied only to .value (#3); parse_info honors the options reviver
    (#5); end() is idempotent (#7)."""
    import math

    from jsonschemaparse_spark.api import StreamParser, parse, parse_info
    from jsonschemaparse_spark.errors import ResourceLimitError

    # options-dict form: schema + bigNumber honored (was silently a schema)
    sp = StreamParser({"schema": {"type": "integer"}, "bigNumber": "error"})
    sp.write('"not an int"')
    assert [e.keyword for e in sp.end().errors] == ["type"]
    sp = StreamParser({"schema": None, "bigNumber": "error"})
    with pytest.raises(ResourceLimitError):
        sp.write("123456789012345678901")
        sp.end()
    sp = StreamParser({"schema": None, "maxItems": 2})
    sp.write("[1,2,3]")
    assert [e.keyword for e in sp.end().errors] == ["resourceLimit"]

    # reviver ordering: validation sees the raw value on BOTH surfaces
    rev = lambda k, v: "str" if isinstance(v, int) and not isinstance(v, bool) else v  # noqa: E731
    schema = {"properties": {"a": {"type": "integer"}}}
    assert parse('{"a": 1}', {"schema": schema, "reviver": rev}) == {"a": "str"}
    sp = StreamParser({"schema": schema, "reviver": rev})
    sp.write('{"a": 1}')
    info = sp.end()
    assert info.errors == [] and info.value == {"a": "str"}

    # parse_info options reviver applies to the returned value
    pi = parse_info('{"a": 1}', {"schema": schema, "reviver": rev})
    assert pi.value == {"a": "str"} and pi.errors == []

    # end() idempotence: no double-revive
    sp = StreamParser(reviver=lambda k, v: v + 1 if isinstance(v, int)
                      and not isinstance(v, bool) else v)
    sp.write("[1]")
    assert sp.end().value == [2]
    assert sp.end().value == [2]

    # positions policy: syntax mode attaches nothing on either surface
    from jsonschemaparse_spark.schema.relaxed_json import SyntaxOptions

    opt = SyntaxOptions(trailing_comma=True)
    sp = StreamParser(schema={"type": "object"}, syntax=opt)
    sp.write("[1,]")
    assert all(e.position is None for e in sp.end().errors)
    pi = parse_info("[1,]", {"type": "object"}, syntax=opt)
    assert all(e.position is None for e in pi.errors)
    # interoperable: positions attach on BOTH surfaces now
    pi = parse_info('{"a": 1}', {"type": "array"}, interoperable=False)
    pi2 = parse_info('{"a": 1}', {"type": "array"}, interoperable=True,
                     big_number="default")
    assert pi.errors[0].position == pi2.errors[0].position == \
        {"line": 0, "column": 0}


# =========================================================================
# moved from test_round4_fixes.py (round-fix regression pins, split by
# topic per VERDICT r5 #8)
# =========================================================================
import pytest  # noqa: E402,F811,F401
from pyspark.sql import functions as F  # noqa: E402,F811,F401

def test_positioned_error_keeps_original_message_on_disagreement():
    """r4 review finding #6: if the FSM ever accepts what the C scanner
    rejected, the original message must survive."""
    from jsonschemaparse_spark.api import _positioned_syntax_error

    err = _positioned_syntax_error("42", ValueError("scanner said no"))
    assert "scanner said no" in str(err)
    assert err.position is None


# =========================================================================
# moved from test_round5_fixes.py (round-fix regression pins, split by
# topic per VERDICT r5 #8)
# =========================================================================
import pytest  # noqa: E402,F811,F401
from pyspark.sql import functions as F  # noqa: E402,F811,F401

def test_positions_on_standard_json_column_rows(spark):
    from jsonschemaparse_spark.plans.json_validator import validate_json_column

    df = spark.createDataFrame(
        [
            (1, '{"k": 99}'),        # maximum violation at the value
            (2, '{"k": 5}'),         # clean
            (3, '{"k": '),           # syntax error
            (4, None),               # null doc -> no rows
        ],
        "id long, doc string",
    )
    rules = {"properties": {"k": {"maximum": 50}}}
    res = validate_json_column(df, "doc", rules, key_cols=["id"], positions=True)
    ann = {r["id"]: r for r in res.annotated.collect()}
    # violation structs carry line/column inline
    v1 = ann[1]["_jsp_violations"][0]
    assert v1["keyword"] == "maximum"
    # reference convention: property value anchors at its colon-side value
    # start -> line 0, the value's position in '{"k": 99}'
    assert (v1["line"], v1["column"]) == (0, 4)
    assert ann[2]["_jsp_violations"] == []
    v3 = ann[3]["_jsp_violations"][0]
    assert v3["keyword"] == "syntax"
    assert v3["line"] is not None and v3["column"] is not None
    # .violations() surfaces them as report columns
    rep = res.violations()
    assert rep.columns == [
        "id", "constraint_id", "path", "keyword", "expected", "actual",
        "message", "line", "column",
    ]
    rows = {r["id"]: r for r in rep.collect()}
    assert (rows[1]["line"], rows[1]["column"]) == (0, 4)
    assert 4 not in rows


def test_positions_engine_guards(spark):
    from jsonschemaparse_spark.plans.json_validator import validate_json_column

    df = spark.createDataFrame([(1, "{}")], "id long, doc string")
    with pytest.raises(ValueError, match="typed"):
        validate_json_column(df, "doc", {}, key_cols=["id"],
                             engine="typed", positions=True)
    with pytest.raises(ValueError, match="strict"):
        validate_json_column(df, "doc", {}, key_cols=["id"],
                             big_number="string", positions=True)


def test_positions_wrapper_parity_with_legacy_surface(spark):
    """validate_json_positions (now a wrapper) produces the same rows as
    calling the unified path directly."""
    from jsonschemaparse_spark.plans.json_validator import (
        validate_json_column,
        validate_json_positions,
    )

    df = spark.createDataFrame(
        [(i, '{"n": %d}' % (i * 30)) for i in range(5)] + [(9, '[1,')],
        "id long, doc string",
    )
    rules = {"properties": {"n": {"maximum": 50}}}
    legacy = sorted(
        tuple(r) for r in validate_json_positions(df, "doc", rules,
                                                  key_cols=["id"]).collect()
    )
    unified = sorted(
        tuple(r) for r in validate_json_column(
            df, "doc", rules, key_cols=["id"], positions=True
        ).violations().collect()
    )
    assert legacy == unified and len(legacy) == 4

