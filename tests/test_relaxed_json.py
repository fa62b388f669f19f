"""Relaxed-syntax options + bigNumber policies (reference README parity)."""

import math

import pytest

from jsonschemaparse_spark.schema.relaxed_json import (
    BigNumberError,
    SyntaxOptions,
    loads_relaxed,
)
from jsonschemaparse_spark.schema.strict_json import StrictSyntaxError


def test_comments():
    o = SyntaxOptions(line_comment=True, hash_comment=True, block_comment=True)
    assert loads_relaxed('{"a": 1 // tail\n, "b": 2}', o) == {"a": 1, "b": 2}
    assert loads_relaxed('# top\n[1, 2]', o) == [1, 2]
    assert loads_relaxed('[1, /* mid */ 2]', o) == [1, 2]
    with pytest.raises(ValueError):
        loads_relaxed('[1, // nope\n 2]')  # options off -> rejected


def test_nested_comments():
    o = SyntaxOptions(nested_comment=True)
    assert loads_relaxed('[1 /* a /* b */ c */ , 2]', o) == [1, 2]


def test_trailing_comma_and_unquoted_keys():
    o = SyntaxOptions(trailing_comma=True, unquoted_keys=True)
    assert loads_relaxed('{a: 1, b: [1, 2,],}', o) == {"a": 1, "b": [1, 2]}
    with pytest.raises(ValueError):
        loads_relaxed("{a: 1}", SyntaxOptions(trailing_comma=True))


def test_single_quote_strings():
    o = SyntaxOptions(single_quote=True)
    assert loads_relaxed("['a', 'say \"hi\"']", o) == ["a", 'say "hi"']


def test_numeric_relaxations():
    o = SyntaxOptions(plus=True, bare_decimal=True, hexadecimal=True)
    assert loads_relaxed("[+1, .5, 2., 0x1F]", o) == [1, 0.5, 2.0, 31]
    with pytest.raises(ValueError):
        loads_relaxed("+1")


def test_inf_nan_options():
    o = SyntaxOptions(inf=True, nan=True)
    got = loads_relaxed("[Infinity, -Infinity, NaN]", o)
    assert got[0] == math.inf and got[1] == -math.inf and math.isnan(got[2])
    with pytest.raises(ValueError):
        loads_relaxed("[NaN]")


def test_utf32_escapes():
    o = SyntaxOptions(utf32=True)
    assert loads_relaxed('"\\U0001F432"', o) == "\U0001F432"
    assert loads_relaxed('"\\u{1F432}"', o) == "\U0001F432"


def test_escape_lf():
    o = SyntaxOptions(escape_lf=True)
    assert loads_relaxed('"a\\\nb"', o) == "ab"


# ---------------- bigNumber ---------------------------------------------------
# 2^64-1: 20 digits, NOT representable in float64 (2^64 itself would be
# exact — powers of two are never "big")
BIG = "18446744073709551615"
NICE = "42"


def test_big_number_default_keeps_exact_int():
    assert loads_relaxed(BIG) == 18446744073709551615


def test_big_number_float64_matches_js():
    v = loads_relaxed(BIG, big_number="float64")
    assert isinstance(v, float) and v == float(BIG)


def test_big_number_error():
    with pytest.raises(BigNumberError):
        loads_relaxed(BIG, big_number="error")
    assert loads_relaxed(NICE, big_number="error") == 42  # nice numbers pass


def test_big_number_json_and_string():
    assert loads_relaxed(BIG, big_number="json") == BIG
    assert loads_relaxed("1.23456789012345678e2", big_number="string") == (
        "123.456789012345678"
    )


def test_big_number_intstr():
    assert loads_relaxed("123456789012345678.75", big_number="intstr") == (
        "123456789012345678"
    )


def test_big_number_fraction():
    assert loads_relaxed("123456789012345678.75", big_number="fraction") == [
        12345678901234567875, 100
    ]
    whole, num, den = loads_relaxed(
        "123456789012345678.75", big_number="properfraction"
    )
    assert whole == 123456789012345678 and num == 75 and den == 100


def test_max_number_length():
    with pytest.raises(BigNumberError):
        loads_relaxed("1" * 30, max_number_length=20, big_number="json")


def test_interoperable_ijson():
    with pytest.raises(StrictSyntaxError):
        loads_relaxed('{"a": 1, "a": 2}', interoperable=True)
    with pytest.raises(BigNumberError):
        loads_relaxed(BIG, interoperable=True)
    assert loads_relaxed('{"a": 1}', interoperable=True) == {"a": 1}


# ---------------------------------------------------------------------------
# r4: incremental transcoder — StreamParser(syntax=...) relaxed dialects
# ---------------------------------------------------------------------------
def _all_opts():
    return SyntaxOptions(
        line_comment=True, hash_comment=True, block_comment=True,
        nested_comment=True, unquoted_keys=True, trailing_comma=True,
        single_quote=True, escape_lf=True, utf32=True, hexadecimal=True,
        bare_decimal=True, inf=True, nan=True, plus=True,
    )


RELAXED_CORPUS = [
    '{a: 1, b: [2, 3,], /* c /* nested */ */ d: "x\\u{1F432}" }',
    "# hash\n[Infinity, -Infinity, NaN, 5., .25, +7, 0x1F]",
    "{'q': 'sin\\'gle'} // tail\n",
    '"a\\\n b"',
    "[.5, 5., -0.5e3, 0xFF, +.25]",
    "{x$_1: '\\U0001F432', y: [true, null,],}",
]


def test_incremental_transcoder_chunk_invariant():
    """feed()/finish() over every chunking 1-7 yields the same VALUE as
    the one-shot loads_relaxed (whitespace emission may differ — strict
    parser neutral)."""
    import json as _json

    from jsonschemaparse_spark.schema.relaxed_json import (
        IncrementalTranscoder,
        loads_relaxed,
        transcode,
    )

    opt = _all_opts()
    for text in RELAXED_CORPUS:
        want = _json.dumps(loads_relaxed(text, syntax=opt), sort_keys=True)
        for size in range(1, 8):
            tr = IncrementalTranscoder(opt)
            out = []
            for i in range(0, len(text), size):
                out.append(tr.feed(text[i:i + size]))
            out.append(tr.finish())
            got = _json.loads("".join(out))
            assert _json.dumps(got, sort_keys=True) == want, (text, size)
        # and the emitted text matches one-shot transcode modulo whitespace
        tr = IncrementalTranscoder(opt)
        whole = tr.feed(text) + tr.finish()
        assert whole.replace(" ", "") == transcode(text, opt).replace(" ", "")


def test_stream_parser_syntax_option():
    """StreamParser(syntax=...): the reference's relaxed-dialect option
    family on the incremental surface — byte-at-a-time replay, bytes
    input through the UTF-8 decoder, Infinity/-Infinity/NaN literals."""
    import json as _json
    import math

    from jsonschemaparse_spark.api import StreamParser
    from jsonschemaparse_spark.schema.relaxed_json import loads_relaxed

    opt = _all_opts()
    for text in RELAXED_CORPUS:
        want = loads_relaxed(text, syntax=opt)
        sp = StreamParser(syntax=opt)
        for ch in text:  # one char per write
            sp.write(ch)
        got = sp.end().value
        assert _json.dumps(got, sort_keys=True) == _json.dumps(want, sort_keys=True), text
    # bytes, one byte per write (multi-byte UTF-8 split across writes)
    raw = "{k: 'é\U0001F432', n: .5,} // c\n".encode()
    sp = StreamParser(syntax=opt)
    for i in range(len(raw)):
        sp.write(raw[i:i + 1])
    assert sp.end().value == {"k": "é\U0001F432", "n": 0.5}
    # nonfinite across chunk splits
    sp = StreamParser(syntax=opt)
    sp.write("[-Inf")
    sp.write("inity, Na")
    sp.write("N]")
    v = sp.end().value
    assert v[0] == float("-inf") and math.isnan(v[1])
    # validation composes with the relaxed dialect
    sp = StreamParser(schema={"type": "object"}, syntax=opt)
    sp.write("[1,]")
    info = sp.end()
    assert [e.keyword for e in info.errors] == ["type"]


def test_incremental_transcoder_fuzz():
    """Fixed-seed fuzz: random dialect soup through every chunking must
    agree with the one-shot on accept/reject and (modulo whitespace) on
    output. The r4 authoring sweep ran 1600x3x2; this pins a 200-text
    batch in CI."""
    import random

    from jsonschemaparse_spark.schema.relaxed_json import (
        IncrementalTranscoder,
        transcode,
    )

    opt = _all_opts()
    rnd = random.Random(99)
    chars = list('{}[],:"\'\\/#*+-.0123456789abxXeEu nt\n\t_$') + [
        "true", "false", "null", "Infinity", "NaN", "//", "/*", "*/",
        "\\u{1F4}", "0x1F", "\\'", '"s"', "'q'",
    ]
    for _ in range(200):
        t = "".join(rnd.choice(chars) for _ in range(rnd.randint(1, 40)))
        try:
            want, err = transcode(t, opt), None
        except Exception:
            want, err = None, True
        for size in (1, 3, 7):
            tr = IncrementalTranscoder(opt)
            try:
                out = []
                for i in range(0, len(t), size):
                    out.append(tr.feed(t[i:i + size]))
                out.append(tr.finish())
                got, gerr = "".join(out), None
            except Exception:
                got, gerr = None, True
            assert (err is None) == (gerr is None), (t, size)
            if err is None:
                assert got.replace(" ", "") == want.replace(" ", ""), (t, size)
