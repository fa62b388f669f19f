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
