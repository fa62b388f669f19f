"""Relaxed-syntax JSON options + bigNumber policies (reference README
options: syntax* family, bigNumber, interoperable — README.md:100-137).

Design: a single token-aware transcoder rewrites the relaxed dialect into
strict JSON (strings handled with a real scanner, not regexes), then the
strict loader parses with policy hooks. This keeps one trusted parser while
supporting the reference's full option surface:

syntax options: line/hash/block/nested comments, trailing commas, unquoted
keys, single quotes, leading +, bare decimals, hexadecimal ints,
Infinity/NaN, escaped linefeeds, \\U / \\u{...} UTF-32 escapes.

bigNumber policies (applied to numbers that lose precision in an IEEE
double — README.md:128-137): default | float64 | error | json | string |
intstr | fraction | properfraction.

interoperable (RFC 7493 I-JSON subset): rejects duplicate keys and
precision-lossy numbers.
"""

from __future__ import annotations

import json
import math
from dataclasses import dataclass
from decimal import Decimal
from typing import Any

from .strict_json import StrictSyntaxError, _check_surrogates


@dataclass(frozen=True)
class SyntaxOptions:
    line_comment: bool = False       # syntaxLineComment: // ...
    hash_comment: bool = False       # syntaxHashComment: # ...
    block_comment: bool = False      # syntaxBlockComment: /* ... */
    nested_comment: bool = False     # syntaxNestedComment (implies block)
    unquoted_keys: bool = False      # syntaxUnquotedKeys
    trailing_comma: bool = False     # syntaxTrailingComma
    single_quote: bool = False       # syntaxSingleQuote
    escape_lf: bool = False          # syntaxEscapeLF
    utf32: bool = False              # syntaxUTF32: \Uxxxxxxxx, \u{...}
    hexadecimal: bool = False        # syntaxHexadecimal: 0x1F
    bare_decimal: bool = False       # syntaxBareDecimal: .5 / 5.
    inf: bool = False                # syntaxInf
    nan: bool = False                # syntaxNaN
    plus: bool = False               # syntaxPlus: +1


class BigNumberError(ValueError):
    """bigNumber: 'error' policy hit (a validation error in the reference)."""


def _is_ident_char(c: str, first: bool) -> bool:
    return c.isalpha() or c in "_$" or (not first and c.isdigit())


def _escape_cp(cp: int) -> str:
    if cp <= 0xFFFF:
        return "\\u%04x" % cp
    cp -= 0x10000
    return "\\u%04x\\u%04x" % (0xD800 + (cp >> 10), 0xDC00 + (cp & 0x3FF))


def transcode(text: str, opt: SyntaxOptions) -> str:
    """Rewrite the relaxed dialect into strict JSON (one shot). Delegates
    to IncrementalTranscoder so there is exactly ONE copy of the dialect
    state machine (r4 review #9 — a bare-decimal fix had to be made twice
    before this)."""
    tr = IncrementalTranscoder(opt)
    return tr.feed(text) + tr.finish()


# ---------------------------------------------------------------------------
# bigNumber policies
# ---------------------------------------------------------------------------
def _is_lossy(raw: str) -> bool:
    try:
        return Decimal(raw) != Decimal(repr(float(raw))) if "e" in raw.lower() or "." in raw \
            else int(raw) != int(float(raw))
    except (ValueError, OverflowError):
        return True


def _fraction(raw: str) -> tuple[int, int]:
    d = Decimal(raw)
    sign, digits, exp = d.as_tuple()
    num = int("".join(map(str, digits))) * (-1 if sign else 1)
    if exp >= 0:
        return num * (10 ** exp), 1
    return num, 10 ** (-exp)


def make_number_hooks(big_number: str = "default", max_number_length: int | None = None,
                      nice_number: str = "default"):
    """(parse_int, parse_float) implementing the bigNumber policy table.
    nice_number applies the same policies to numbers that ARE exactly
    representable (reference README.md:113 `niceNumber`)."""

    def handle(raw: str, is_int: bool):
        if max_number_length is not None and len(raw) > max_number_length:
            # upstream emits "String too long" here (shared string-cap code
            # path) and its own test TODO says it should be "Number too
            # long" (test/parse.test.js:192-206); we implement the intended
            # message, still matching the upstream /too long/ assertion
            raise BigNumberError("Number too long (maxNumberLength)")
        lossy = _is_lossy(raw)
        if not lossy and nice_number != "default":
            if nice_number == "float64":
                return float(raw)
            if nice_number == "json":
                return raw
            if nice_number == "string":
                return format(Decimal(raw), "f")
            if nice_number == "fraction":
                return list(_fraction(raw))
            raise ValueError(f"Unknown niceNumber policy: {nice_number}")
        if not lossy or big_number == "default":
            # default: ints stay exact Python ints (Spark LongType-friendly;
            # strictly more precise than the reference's JSON.parse default)
            return int(raw) if is_int else float(raw)
        if big_number == "float64":
            return float(raw)  # the reference's `default` (JSON.parse)
        if big_number == "error":
            # the reference's exact string (parse.js:1183 ResourceLimitError)
            raise BigNumberError("Number too precise")
        if big_number == "json":
            return raw
        if big_number == "string":
            d = Decimal(raw)
            s = format(d, "f")
            if max_number_length is not None and len(s) > max_number_length:
                raise BigNumberError("Number too long (maxNumberLength)")
            return s
        if big_number == "intstr":
            return str(int(Decimal(raw)))
        if big_number == "fraction":
            return list(_fraction(raw))
        if big_number == "properfraction":
            num, den = _fraction(raw)
            # exact truncation toward zero (float division would round)
            whole = abs(num) // den * (-1 if num < 0 else 1)
            return [whole, num - whole * den, den]
        raise ValueError(f"Unknown bigNumber policy: {big_number}")

    return (lambda s: handle(s, True)), (lambda s: handle(s, False))


def loads_relaxed(
    text: str | bytes,
    syntax: SyntaxOptions | None = None,
    big_number: str = "default",
    max_number_length: int | None = None,
    interoperable: bool = False,
    nice_number: str = "default",
) -> Any:
    """Full-option loader: relaxed syntax -> strict JSON -> policy parse."""
    if isinstance(text, (bytes, bytearray)):
        text = bytes(text).decode("utf-8", errors="strict")
    opt = syntax or SyntaxOptions()
    stricted = transcode(text, opt)
    if interoperable:
        big_number = "error" if big_number == "default" else big_number

        def pairs_hook(pairs):
            keys = [k for k, _ in pairs]
            if len(keys) != len(set(keys)):
                raise StrictSyntaxError("Duplicate object keys (I-JSON)")
            return dict(pairs)
    else:
        pairs_hook = None

    parse_int, parse_float = make_number_hooks(big_number, max_number_length, nice_number)

    def constant(name):
        if name in ("Infinity", "-Infinity") and opt.inf:
            return float(name)
        if name == "NaN" and opt.nan:
            return math.nan
        raise StrictSyntaxError(f"Unexpected token: {name}")

    value = json.loads(
        stricted,
        parse_int=parse_int,
        parse_float=parse_float,
        parse_constant=constant,
        object_pairs_hook=pairs_hook,
    )
    if interoperable:
        # RFC 7493 §2.1: I-JSON MUST NOT contain unpaired surrogates. The
        # plain strict path ACCEPTS them (executed-reference parity, r4 —
        # see strict_json docstring); only the I-JSON subset rejects.
        _check_surrogates(value)
    return value


class IncrementalTranscoder:
    """Chunk-resumable twin of transcode() (r4): feed(chunk) returns the
    strict-JSON rewrite of every construct that is COMPLETE in the buffer
    so far; constructs that may extend into the next chunk (open strings,
    comments, number/word tails, lookahead-dependent ',', '+', '0x', '.')
    stay in the carry until more input or finish(). Emitted whitespace may
    differ from the one-shot (runs are not collapsed across chunk
    boundaries) — semantically neutral to the strict parser; VALUES are
    chunking-invariant (tests replay byte-at-a-time vs loads_relaxed).

    Powers StreamParser(syntax=...) — the reference's syntax* option
    family on the incremental surface."""

    def __init__(self, opt: SyntaxOptions):
        self.opt = opt
        self._buf = ""
        self._stack: list[str] = []
        self._expect_key = False

    def feed(self, chunk: str) -> str:
        self._buf += chunk
        return self._drain(eof=False)

    def finish(self) -> str:
        return self._drain(eof=True)

    # ------------------------------------------------------------------
    def _drain(self, eof: bool) -> str:  # noqa: C901 (mirror of transcode)
        opt = self.opt
        out: list[str] = []
        buf = self._buf
        i, n = 0, len(buf)
        WAIT = object()

        def skip_ws_comments(j: int):
            """End index of the ws/comment run from j, WAIT if it may
            continue, or raises at eof on an unterminated comment."""
            while j < n:
                c = buf[j]
                if c in " \t\r\n":
                    j += 1
                elif opt.hash_comment and c == "#":
                    k = buf.find("\n", j)
                    if k < 0:
                        if not eof:
                            return WAIT
                        return n
                    j = k
                elif (opt.line_comment or opt.block_comment or opt.nested_comment) \
                        and c == "/":
                    if j + 1 >= n:
                        return WAIT if not eof else j
                    if opt.line_comment and buf[j + 1] == "/":
                        k = buf.find("\n", j)
                        if k < 0:
                            if not eof:
                                return WAIT
                            return n
                        j = k
                    elif (opt.block_comment or opt.nested_comment) and buf[j + 1] == "*":
                        depth = 1
                        k = j + 2
                        while k < n and depth:
                            if opt.nested_comment and buf[k:k + 2] == "/*":
                                depth += 1
                                k += 2
                            elif buf[k:k + 2] == "*/":
                                depth -= 1
                                k += 2
                            else:
                                k += 1
                        if depth:
                            if not eof:
                                return WAIT
                            raise StrictSyntaxError("Unterminated comment")
                        j = k
                    else:
                        return j
                else:
                    return j
            return j

        def read_string(j: int, quote: str):
            """(strict_string, end_index) or WAIT; raises only at eof."""
            piece = ['"']
            j += 1
            while j < n:
                c = buf[j]
                if c == "\\":
                    if j + 1 >= n:
                        if not eof:
                            return WAIT
                        raise StrictSyntaxError("Unterminated escape")
                    nxt = buf[j + 1]
                    if opt.escape_lf and nxt == "\n":
                        j += 2
                        continue
                    if opt.utf32 and nxt == "U":
                        if j + 9 >= n and not eof:
                            return WAIT
                        if j + 9 < n:
                            piece.append(_escape_cp(int(buf[j + 2:j + 10], 16)))
                            j += 10
                            continue
                        piece.append(c + nxt)
                        j += 2
                        continue
                    if opt.utf32 and nxt == "u":
                        if j + 2 >= n and not eof:
                            return WAIT
                        if j + 2 < n and buf[j + 2] == "{":
                            end = buf.find("}", j + 3)
                            if end < 0:
                                if not eof:
                                    return WAIT
                                raise StrictSyntaxError("Unterminated escape")
                            piece.append(_escape_cp(int(buf[j + 3:end], 16)))
                            j = end + 1
                            continue
                    if quote == "'" and nxt == "'":
                        piece.append("'")
                        j += 2
                        continue
                    piece.append(c + nxt)
                    j += 2
                    continue
                if c == quote:
                    piece.append('"')
                    return "".join(piece), j + 1
                if c == '"' and quote == "'":
                    piece.append('\\"')
                    j += 1
                    continue
                piece.append(c)
                j += 1
            if not eof:
                return WAIT
            raise StrictSyntaxError("Unterminated string")

        while i < n:
            j = skip_ws_comments(i)
            if j is WAIT:
                break
            if j > i:
                out.append(" ")
                i = j
                continue
            c = buf[i]
            if c == '"' or (opt.single_quote and c == "'"):
                r = read_string(i, c)
                if r is WAIT:
                    break
                s, i = r
                out.append(s)
                continue
            if c in "{[":
                self._stack.append(c)
                self._expect_key = c == "{"
                out.append(c)
                i += 1
                continue
            if c in "}]":
                if self._stack:
                    self._stack.pop()
                self._expect_key = bool(self._stack) and self._stack[-1] == "{"
                out.append(c)
                i += 1
                continue
            if c == ",":
                if opt.trailing_comma:
                    k = skip_ws_comments(i + 1)
                    if k is WAIT or (k >= n and not eof):
                        break  # lookahead may span chunks
                    if k < n and buf[k] in "}]":
                        i += 1  # drop the trailing comma
                        continue
                self._expect_key = bool(self._stack) and self._stack[-1] == "{"
                out.append(c)
                i += 1
                continue
            if c == ":":
                self._expect_key = False
                out.append(c)
                i += 1
                continue
            if opt.plus and c == "+":
                if i + 1 >= n and not eof:
                    break
                if i + 1 < n and (buf[i + 1].isdigit() or buf[i + 1] == "."):
                    i += 1  # drop leading plus
                    continue
                out.append(c)
                i += 1
                continue
            if opt.hexadecimal and c == "0":
                if i + 1 >= n and not eof:
                    break
                if i + 1 < n and buf[i + 1] in "xX":
                    j = i + 2
                    while j < n and buf[j] in "0123456789abcdefABCDEF":
                        j += 1
                    if j >= n and not eof:
                        break
                    out.append(str(int(buf[i + 2:j], 16)))
                    i = j
                    continue
                # plain number starting with 0: falls through below
            if opt.bare_decimal and c == ".":
                if i + 1 >= n and not eof:
                    break
                if i + 1 < n and buf[i + 1].isdigit():
                    out.append("0.")
                    i += 1
                    continue
                out.append(c)
                i += 1
                continue
            if c.isdigit() or c == "-":
                j = i + (1 if c == "-" else 0)
                if j >= n and not eof:
                    break
                if opt.bare_decimal and j < n and buf[j] == ".":
                    out.append(buf[i:j] + "0.")  # '-.5' -> '-0.5' (review #4)
                    i = j + 1
                    continue
                while j < n and (buf[j].isdigit() or buf[j] in ".eE+-"):
                    j += 1
                if j >= n and not eof:
                    break
                tok = buf[i:j]
                if opt.bare_decimal and tok.endswith("."):
                    tok += "0"
                out.append(tok)
                i = j
                continue
            if _is_ident_char(c, True):
                j = i
                while j < n and _is_ident_char(buf[j], j == i):
                    j += 1
                if j >= n and not eof:
                    break
                word = buf[i:j]
                if word in ("true", "false", "null"):
                    out.append(word)
                elif word == "Infinity" and opt.inf:
                    out.append("Infinity")
                elif word == "NaN" and opt.nan:
                    out.append("NaN")
                elif opt.unquoted_keys and self._stack and self._stack[-1] == "{" \
                        and self._expect_key:
                    out.append(json.dumps(word))
                else:
                    out.append(word)  # strict parser will reject
                i = j
                continue
            out.append(c)
            i += 1

        self._buf = buf[i:]
        return "".join(out)
