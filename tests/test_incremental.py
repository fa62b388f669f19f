"""Byte-at-a-time incremental parse (reference StreamParser contract,
parse.js:318-326 + test/syntax-suite.test.js:43-56): the whole F7 syntax
corpus replays one byte per write() and must agree with the one-shot
verdicts; values, events and validation results match the whole-doc path.
"""

import json

import pytest

from jsonschemaparse_spark.api import ParseSyntaxError, StreamParser, iter_events
from jsonschemaparse_spark.schema.strict_json import loads_strict

from test_syntax_corpus import CASES


@pytest.mark.parametrize("case_id,payload,well_formed",
                         CASES, ids=[c[0] for c in CASES])
def test_byte_at_a_time_matches_oneshot(case_id, payload, well_formed):
    data = payload.encode("utf-8", errors="surrogatepass")
    sp = StreamParser()
    try:
        for i in range(len(data)):
            sp.write(data[i:i + 1])  # one BYTE per write: splits UTF-8 too
        value = sp.end().value
        ok = True
    except ParseSyntaxError:
        ok = False
    assert ok == well_formed, case_id
    if well_formed:
        assert value == loads_strict(payload)


@pytest.mark.parametrize("chunk_size", [1, 2, 3, 7])
def test_chunked_events_match_iter_events(chunk_size):
    doc = '{"a": [1, 2.5, true, false, null, "x\\n"], "b": {"c": []}}'
    events = []
    sp = StreamParser()
    for name in ("startObject", "endObject", "startArray", "endArray",
                 "key", "string", "number", "boolean", "null", "end"):
        sp.on(name, lambda *a, _n=name: events.append((_n, *a)))
    for i in range(0, len(doc), chunk_size):
        sp.write(doc[i:i + chunk_size])
    info = sp.end()
    assert info.value == json.loads(doc)
    assert events == list(iter_events(info.value))


def test_split_multibyte_utf8():
    doc = '"é中\U0001F432"'.encode("utf-8")
    sp = StreamParser()
    for i in range(len(doc)):
        sp.write(doc[i:i + 1])
    assert sp.end().value == "é中\U0001F432"


def test_stream_validation_errors_accumulate():
    """Validation errors are RETURNED, not raised (parseInfo contract);
    syntax errors still raise."""
    schema = {"type": "object", "required": ["k"],
              "properties": {"k": {"type": "integer", "minimum": 10}}}
    sp = StreamParser(schema)
    sp.write('{"k": ')
    sp.write("3}")
    info = sp.end()
    assert not info.valid
    assert info.errors[0].keyword == "minimum"

    ok = StreamParser(schema)
    ok.write('{"k": 1')
    ok.write("1}")
    assert ok.end().valid


def test_stream_number_boundary():
    """A number split across chunks must not terminate early: '12' + '3'
    is 123, not 12 followed by garbage."""
    sp = StreamParser()
    sp.write("12")
    sp.write("3")
    assert sp.end().value == 123

    sp2 = StreamParser()
    sp2.write("1e")
    sp2.write("2")
    assert sp2.end().value == 100.0


def test_stream_literal_boundary():
    sp = StreamParser()
    for ch in "[tru":
        sp.write(ch)
    sp.write("e, nul")
    sp.write("l]")
    assert sp.end().value == [True, None]


def test_write_after_end_and_trailing_garbage():
    sp = StreamParser()
    sp.write("{}")
    sp.end()
    with pytest.raises(ParseSyntaxError):
        StreamParser().write("{} x")
    with pytest.raises(ParseSyntaxError):
        s = StreamParser()
        s.write("[1")
        s.end()


# =========================================================================
# moved from test_round5_fixes.py (round-fix regression pins, split by
# topic per VERDICT r5 #8)
# =========================================================================
import pytest  # noqa: E402,F811,F401
from pyspark.sql import functions as F  # noqa: E402,F811,F401

def test_chunked_long_string_linear_scan():
    import json
    import time

    from jsonschemaparse_spark.api import StreamParser

    body = "abcdefgh" * 131072  # ~1 MB
    doc = json.dumps({"s": body})
    p = StreamParser({})
    t0 = time.perf_counter()
    for off in range(0, len(doc), 1024):
        p.write(doc[off : off + 1024])
    p.end()
    dt = time.perf_counter() - t0
    assert p.value["s"] == body
    # measured ~0.2 s with the resume pointer; the former from-the-top
    # rescan was ~500M char steps (tens of seconds). Generous CI bound:
    assert dt < 5.0


def test_chunked_string_resume_mid_escape():
    """Resume state across writes that split escapes: the backslash is
    re-scanned (bounded), the value decodes exactly."""
    import json

    from jsonschemaparse_spark.api import StreamParser

    doc = '{"s": "a\\u0041b\\nc", "t": "x"}'
    for size in (1, 2, 3, 5):
        p = StreamParser({})
        for off in range(0, len(doc), size):
            p.write(doc[off : off + size])
        p.end()
        assert p.value == json.loads(doc)


def test_stream_parser_line_number_characters():
    from jsonschemaparse_spark.api import StreamParser

    sp = StreamParser()
    sp.write('{"a": 1}\n')
    info = sp.end()
    assert (info.lineNumber, info.characters) == (1, 9)
    sp = StreamParser()
    sp.write('"\U0001F432"')
    assert sp.end().characters == 4  # UTF-16 units


def test_stream_parser_counts_source_in_syntax_mode():
    """Relaxed dialects transcode before the tokenizer; lineNumber and
    characters must still count the SOURCE text, like parse_info
    (second review #2)."""
    from jsonschemaparse_spark.api import StreamParser, parse_info
    from jsonschemaparse_spark.schema.relaxed_json import SyntaxOptions

    syn = SyntaxOptions(hash_comment=True)
    text = "# hello comment\n[1, 2]\n"
    pi = parse_info(text, syntax=syn)
    sp = StreamParser(syntax=syn)
    sp.write(text)
    info = sp.end()
    assert (info.lineNumber, info.characters) \
        == (pi.lineNumber, pi.characters) == (2, 23)

