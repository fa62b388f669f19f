"""Strict JSON loading with reference-parser parity (SURVEY.md §2.1, F7).

Python's json.loads is laxer than the reference FSM (parse.js:342-1081) in
one way that matters for the JSONTestSuite-style corpus: it accepts NaN /
Infinity / -Infinity literals — the FSM only dispatches on {,[,t,f,n,",-,0-9
(parse.js:391-455), so those are syntax errors. `loads_strict` closes the
gap. Used by api.parse/parse_info and the Arrow JSON kernel so table-scope
syntax verdicts match the reference.

Lone UTF-16 surrogate escapes ("\\ud800") are ACCEPTED: the r4 executed-
reference differential showed lib.parse accepts every \\u-escape surrogate
form (lone high, lone low, swapped, doubled) — JS strings are WTF-16 and
the surrogate verification at parse.js:361-371 runs on the CHARSET-DECODE
byte path (UTF-16 input buffers), not on escapes. Earlier rounds rejected
them here based on reading that code; execution corrected the pin
(JSONTestSuite classes these i_, implementation-defined).
"""

from __future__ import annotations

import json
from typing import Any


class StrictSyntaxError(ValueError):
    pass


def _reject_constant(name: str) -> Any:
    raise StrictSyntaxError(f"Unexpected token: {name}")


def _check_surrogates(value: Any) -> None:
    """Reject unpaired UTF-16 surrogates. NOT part of the strict path (the
    executed reference accepts lone \\u-escape surrogates — module
    docstring); used by loads_relaxed(interoperable=True) for RFC 7493
    §2.1, which does forbid them."""
    if isinstance(value, str):
        prev_high = False
        for ch in value:
            code = ord(ch)
            if 0xD800 <= code <= 0xDBFF:
                if prev_high:
                    raise StrictSyntaxError("Unpaired high surrogate")
                prev_high = True
            elif 0xDC00 <= code <= 0xDFFF:
                if not prev_high:
                    raise StrictSyntaxError("Unpaired low surrogate")
                prev_high = False
            else:
                if prev_high:
                    raise StrictSyntaxError("Unpaired high surrogate")
                prev_high = False
        if prev_high:
            raise StrictSyntaxError("Unpaired high surrogate")
    elif isinstance(value, dict):
        for k, v in value.items():
            _check_surrogates(k)
            _check_surrogates(v)
    elif isinstance(value, list):
        for v in value:
            _check_surrogates(v)




def loads_strict(text: str | bytes) -> Any:
    """json.loads with NaN/Infinity rejected (lone surrogate escapes are
    accepted — see module docstring). Raises StrictSyntaxError/ValueError
    on malformed input."""
    return json.loads(text, parse_constant=_reject_constant)
