"""Strict JSON loading with reference-parser parity (SURVEY.md §2.1, F7).

Python's json.loads is laxer than the reference FSM (parse.js:342-1081) in
two ways that matter for the JSONTestSuite-style corpus:

1. it accepts NaN / Infinity / -Infinity literals — the FSM only dispatches
   on {,[,t,f,n,",-,0-9 (parse.js:391-455), so those are syntax errors;
2. it accepts lone UTF-16 surrogate escapes ("\\ud800") — the FSM verifies
   surrogate pairs (parse.js:361-371) and rejects unpaired halves.

`loads_strict` closes both gaps. Used by api.parse/parse_info and the Arrow
JSON kernel so table-scope syntax verdicts match the reference.
"""

from __future__ import annotations

import json
from typing import Any


class StrictSyntaxError(ValueError):
    pass


def _reject_constant(name: str) -> Any:
    raise StrictSyntaxError(f"Unexpected token: {name}")


def _check_surrogates(value: Any) -> None:
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
    """json.loads with NaN/Infinity rejected and surrogate-pair verification.
    Raises StrictSyntaxError/ValueError on malformed input."""
    value = json.loads(text, parse_constant=_reject_constant)
    _check_surrogates(value)
    return value
