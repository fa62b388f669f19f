"""Chunk-resumable strict JSON parsing (reference StreamParser contract).

The reference accepts arbitrarily-split input — its syntax suite replays
every document one byte per write to prove FSM state survives chunk
boundaries (test/syntax-suite.test.js:43-56; parse.js:318-326). This module
provides the same contract with an ORIGINAL design: instead of a
char-at-a-time FSM, an incremental TOKENIZER drains complete tokens from a
carry buffer and leaves partial tokens (split strings, numbers, literals,
multi-byte UTF-8 sequences) for the next write:

- bytes input decodes through codecs' incremental UTF-8 decoder, which owns
  the continuation-byte state the reference tracks by hand
  (parse.js:1051-1078);
- a complete STRING token is revalidated by loads_strict (escape +
  surrogate-pair semantics identical to the one-shot path);
- NUMBER/LITERAL tokens are complete only when a delimiter arrives (or at
  eof), exactly the boundary case byte-replay exercises;
- structure is a pushdown: (container stack, expect-state) — memory is
  O(nesting depth + longest token), matching the reference's layer stack.

Events (startObject/key/.../end) fire as tokens complete, so SAX consumers
see the same stream as api.iter_events over the whole document.
"""

from __future__ import annotations

import codecs
import json
from typing import Any, Callable, Optional

from .strict_json import loads_strict

_WS = " \t\n\r"
_NUMCHARS = set("0123456789+-.eE")
_LITERALS = {"true": True, "false": False, "null": None}


def _u16len(s: str) -> int:
    """Length in UTF-16 code units — the reference's charno unit (JS
    strings; astral chars count 2). Pinned by executing the reference:
    '\"🐲\" ,' errors at column 5, the code-UNIT offset of the comma."""
    return len(s) + sum(1 for c in s if ord(c) > 0xFFFF)


def _scan_number(raw: str) -> tuple[str, int]:
    """Char-level JSON-number FSM (the reference's NUMBER1-8,
    parse.js number states). Returns one of:

    - ('complete', len): all of raw is a valid number;
    - ('split', i):      raw[:i] is a complete number and raw[i] cannot
                         extend it (maximal munch — '01' splits at 1);
    - ('char', i):       raw[i] is invalid mid-number ('1..5' at 2);
    - ('end', len):      raw is a valid-but-incomplete prefix ('1.', '-').
    """
    # states: 0 start, 1 after '-', 2 int-zero, 3 int-digits, 4 after '.',
    # 5 frac-digits, 6 after e/E, 7 after exp sign, 8 exp-digits
    accepting = {2, 3, 5, 8}
    st = 0
    for i, c in enumerate(raw):
        if st == 0:
            st = 1 if c == "-" else (2 if c == "0" else 3)
            # (outer loop only dispatches on '-' and digits)
            continue
        if st == 1:
            if c == "0":
                st = 2
            elif c.isdigit():
                st = 3
            else:
                return ("char", i)
        elif st == 2:
            if c == ".":
                st = 4
            elif c in "eE":
                st = 6
            else:
                return ("split", i)
        elif st == 3:
            if c.isdigit():
                pass
            elif c == ".":
                st = 4
            elif c in "eE":
                st = 6
            else:
                return ("split", i)
        elif st == 4:
            if c.isdigit():
                st = 5
            else:
                return ("char", i)
        elif st == 5:
            if c.isdigit():
                pass
            elif c in "eE":
                st = 6
            else:
                return ("split", i)
        elif st == 6:
            if c in "+-":
                st = 7
            elif c.isdigit():
                st = 8
            else:
                return ("char", i)
        elif st == 7:
            if c.isdigit():
                st = 8
            else:
                return ("char", i)
        elif st == 8:
            if not c.isdigit():
                return ("split", i)
    return ("complete" if st in accepting else "end", len(raw))


class IncrementalSyntaxError(ValueError):
    """Syntax error carrying BOTH position conventions:

    - line/column: this engine's historical 1-based convention;
    - position: {'line', 'column'} in the REFERENCE's convention
      (SyntaxError.position, parse.js/test/SyntaxError.test.js:12-15) —
      0-based line; column = offending-char offset within the line, where
      the reference counts the newline itself as column 0 of the NEXT
      line, so columns on lines > 0 are effectively 1-based (verified by
      executing the reference, r4 syntax-position differential).
    """

    def __init__(self, message: str, line: int, column: int,
                 ref_line: int | None = None, ref_column: int | None = None):
        super().__init__(f"{message} at line {line} column {column}")
        self.message = message
        self.line = line
        self.column = column
        self.position = (
            {"line": ref_line, "column": ref_column}
            if ref_line is not None else None
        )


class IncrementalJSONParser:
    """Strict JSON parser accepting arbitrarily-split str/bytes chunks.

    write(chunk) any number of times, then end() -> the native value.
    Register SAX callbacks with on(name, fn). Raises IncrementalSyntaxError
    with 1-based line/column on malformed input.
    """

    def __init__(self, max_depth: int = 512, track_positions: bool = False,
                 number_hooks=None, limits=None, interoperable: bool = False,
                 allow_inf: bool = False, allow_nan: bool = False):
        self._decoder = codecs.getincrementaldecoder("utf-8")(errors="strict")
        # positions map is opt-in (r4 review: SAX/error-path users were
        # paying an O(values * depth) dict they never read)
        self._track_positions = track_positions
        # (parse_int, parse_float) pair — relaxed_json.make_number_hooks —
        # applied per complete NUMBER token so StreamParser carries the
        # reference's bigNumber/niceNumber policies incrementally
        # (StreamParser({bigNumber}) option rows). BigNumberError
        # propagates to the caller.
        self._number_hooks = number_hooks
        # RFC 7493 I-JSON: reject duplicate object keys at insert time and
        # unpaired surrogates per string token (loads_relaxed's one-shot
        # twin, incremental)
        self._interoperable = interoperable
        # extra literal words for the relaxed dialects (syntaxInf/syntaxNaN
        # via the incremental transcoder): Infinity / -Infinity / NaN
        self._literals = dict(_LITERALS)
        if allow_inf:
            self._literals["Infinity"] = float("inf")
        if allow_nan:
            self._literals["NaN"] = float("nan")
        self._allow_inf = allow_inf
        # optional ResourceLimits-like object enforced DURING the parse
        # (reference parse.js:146-150 caps, which THROW ResourceLimitError
        # mid-stream): strings/keys abort near their cap instead of
        # buffering unbounded tokens, containers abort at size — memory
        # stays O(cap), the point of parser caps on unbounded streams.
        self._limits = limits
        self._buf = ""
        self._pos = 0              # consumed offset within _buf
        self._line = 1
        self._column = 1
        # reference-convention tracking: absolute chars consumed, absolute
        # index of the last consumed '\n' (None on line 0), 0-based line
        self._abs = 0
        self._last_nl_abs: Optional[int] = None
        self._ref_line = 0
        self._stack: list[tuple] = []   # ('O', dict, pending_key) | ('A', list)
        # incomplete-string scan resume point (ADVICE r4: a long string
        # delivered in many chunks must not rescan from the opening quote
        # on every write). (token_start, next_scan_index); valid while the
        # token is pending — _pos cannot move and _buf only appends until
        # the string completes, so absolute indices stay stable.
        self._str_resume: Optional[tuple[int, int]] = None
        # reference-position map for every parsed VALUE (track_positions
        # only), keyed by the same path strings the evaluator emits
        # (''/a/0...). Anchors pinned by executing the reference (r4):
        # root at (0,0) BEFORE any whitespace; property values at their
        # COLON; array items at the first value character. Used by
        # parse_info/StreamParser to attach ValidationError.position /
        # Annotation.position. Paths are UNESCAPED like the reference's
        # (a key containing '/' yields the same string as a nested path —
        # the reference emits the ambiguous path too, but carries each
        # layer's own position; this map keeps the FIRST value's anchor
        # per path string, so later same-string values are best-effort).
        self.positions: dict[str, tuple[int, int]] = {"": (0, 0)}
        self._container_paths: list[str] = []
        self._expect = "value"          # value|key|key_or_close|colon|after
        self._root: Any = None
        self._have_root = False
        self._ended = False
        self._max_depth = max_depth
        self._handlers: dict[str, list[Callable]] = {}

    # ------------------------------------------------------------------
    def on(self, name: str, fn: Callable) -> "IncrementalJSONParser":
        self._handlers.setdefault(name, []).append(fn)
        return self

    def _emit(self, name: str, *args) -> None:
        for fn in self._handlers.get(name, ()):
            fn(*args)

    def _ref_pos(self, k: int) -> tuple[int, int]:
        """Reference-convention (line, column) of the char at in-buffer
        index k (k >= self._pos; k == len(buf) addresses end-of-input).
        Column rule, pinned by executing the reference: on line 0 the
        column is the absolute offset; after a newline the '\\n' itself
        counts as column 0 of the next line, so column = offset - index
        of the last '\\n'."""
        seg = self._buf[self._pos:k]
        absk = self._abs + _u16len(seg)  # offsets in UTF-16 units (_u16len)
        nl = seg.count("\n")
        line = self._ref_line + nl
        if nl:
            last_nl = self._abs + _u16len(seg[:seg.rfind("\n")])
        else:
            last_nl = self._last_nl_abs
        if last_nl is None:
            return line, absk
        return line, absk - last_nl

    def _err(self, message: str, at: Optional[int] = None,
             col_plus: int = 0) -> IncrementalSyntaxError:
        """Error anchored at in-buffer index `at` (default: the consume
        pointer). col_plus encodes the reference's EOF-in-plain-string
        off-by-one (see _take_string)."""
        rl, rc = self._ref_pos(self._pos if at is None else at)
        rc += col_plus
        # legacy 1-based convention at the same char: reference columns on
        # lines > 0 are already 1-based (the \n-is-column-0 rule)
        legacy_col = rc + 1 if rl == 0 else rc
        return IncrementalSyntaxError(message, rl + 1, legacy_col, rl, rc)

    def _err_char(self, at: int, detail: str = "") -> IncrementalSyntaxError:
        """'Unexpected "<c>"' at the offending char — the reference's
        message head (JSON.stringify quoting: \\n, \\t, \\u0001...)."""
        ch = self._buf[at] if at < len(self._buf) else ""
        # ensure_ascii=False matches JS JSON.stringify: non-ASCII chars stay
        # raw while control chars escape identically (backslash-n, u-hex)
        return self._err(
            f"Unexpected {json.dumps(ch, ensure_ascii=False)}{detail}", at=at
        )

    def _err_eof(self, at: Optional[int] = None,
                 col_plus: int = 0) -> IncrementalSyntaxError:
        return self._err("Unexpected end of document",
                         at=len(self._buf) if at is None else at,
                         col_plus=col_plus)

    # ------------------------------------------------------------------
    def write(self, chunk: str | bytes) -> None:
        if self._ended:
            raise self._err("Write after end")
        if isinstance(chunk, (bytes, bytearray)):
            try:
                text = self._decoder.decode(bytes(chunk))
            except UnicodeDecodeError as e:
                raise self._err(f"Invalid UTF-8: {e.reason}") from None
        else:
            text = chunk
        if text:
            self._buf += text
            self._drain(eof=False)

    def end(self) -> Any:
        if self._ended:
            return self._root
        try:
            tail = self._decoder.decode(b"", final=True)
        except UnicodeDecodeError:
            raise self._err("Truncated UTF-8 sequence") from None
        if tail:
            self._buf += tail
        self._drain(eof=True)
        if not self._have_root or self._stack or self._expect != "after":
            raise self._err_eof()
        self._ended = True
        self._emit("end")  # arity matches api.iter_events
        return self._root

    # ------------------------------------------------------------------
    def _advance(self, n: int) -> None:
        """Consume n chars from the buffer, updating line/column."""
        seg = self._buf[self._pos:self._pos + n]
        nl = seg.count("\n")
        if nl:
            self._line += nl
            self._column = n - seg.rfind("\n")
            self._ref_line += nl
            self._last_nl_abs = self._abs + _u16len(seg[:seg.rfind("\n")])
        else:
            self._column += n
        self._abs += _u16len(seg)
        self._pos += n
        if self._pos > 65536:  # keep the carry buffer bounded
            self._buf = self._buf[self._pos:]
            self._pos = 0

    def _drain(self, eof: bool) -> None:
        while True:
            buf, pos = self._buf, self._pos
            n = len(buf)
            # skip whitespace
            while pos < n and buf[pos] in _WS:
                self._advance(1)
                buf, pos = self._buf, self._pos
                n = len(buf)
            if pos >= n:
                return
            ch = buf[pos]

            if self._expect in ("key", "key_or_close"):
                if ch == "}" and self._expect == "key_or_close":
                    self._advance(1)
                    self._close_container("O")
                    continue
                if ch != '"':
                    raise self._err_char(pos, " (expected a key)")
                tok = self._take_string(eof, is_key=True)
                if tok is None:
                    return
                if self._interoperable and tok in self._stack[-1][1]:
                    raise self._err("Duplicate object keys (I-JSON)")
                self._stack[-1] = ("O", self._stack[-1][1], tok)
                self._emit("key", tok)
                self._expect = "colon"
                continue

            if self._expect == "colon":
                if ch != ":":
                    raise self._err_char(pos, " (expected ':')")
                if self._track_positions:
                    # property-value anchor = the colon (reference layer
                    # push); setdefault = first-writer-wins on ambiguous
                    # unescaped paths (see self.positions)
                    key = self._stack[-1][2]
                    self.positions.setdefault(
                        f"{self._container_paths[-1]}/{key}", self._ref_pos(pos))
                self._advance(1)
                self._expect = "value"
                continue

            if self._expect == "after":
                top = self._stack[-1] if self._stack else None
                if top is None:
                    raise self._err_char(pos, " after document")
                if ch == ",":
                    self._advance(1)
                    self._expect = "key" if top[0] == "O" else "value"
                    continue
                if ch == "}" and top[0] == "O":
                    self._advance(1)
                    self._close_container("O")
                    continue
                if ch == "]" and top[0] == "A":
                    self._advance(1)
                    self._close_container("A")
                    continue
                raise self._err_char(pos)

            # expect == 'value'
            # array-item anchor = the first value character (root and
            # property values were anchored earlier)
            if (self._track_positions and self._stack
                    and self._stack[-1][0] == "A" and ch != "]"):
                idx = len(self._stack[-1][1])
                self.positions.setdefault(
                    f"{self._container_paths[-1]}/{idx}", self._ref_pos(pos))
            if ch == "{":
                if len(self._stack) >= self._max_depth:
                    raise self._err("Nesting too deep")
                self._container_paths.append(self._value_path())
                self._advance(1)
                self._stack.append(("O", {}, None))
                self._emit("startObject")
                self._expect = "key_or_close"
                continue
            if ch == "[":
                if len(self._stack) >= self._max_depth:
                    raise self._err("Nesting too deep")
                self._container_paths.append(self._value_path())
                self._advance(1)
                self._stack.append(("A", []))
                self._emit("startArray")
                self._expect = "value"
                continue
            if ch == "]" and self._stack and self._stack[-1][0] == "A" \
                    and not self._stack[-1][1]:
                self._advance(1)  # empty array: '[' then ']'
                self._close_container("A")
                continue
            if ch == '"':
                tok = self._take_string(eof)
                if tok is None:
                    return
                self._emit("string", tok)
                self._finish_value(tok)
                continue
            if ch in "tfn" or (ch in "IN" and any(
                    w[0] == ch for w in self._literals)):
                val = self._take_literal(eof)
                if val is _PENDING:
                    return
                if isinstance(val, bool):
                    self._emit("boolean", val)
                else:
                    self._emit("null")  # arity matches api.iter_events
                self._finish_value(val)
                continue
            if ch == "-" or ch.isdigit():
                val = self._take_number(eof)
                if val is _PENDING:
                    return
                self._emit("number", val)
                self._finish_value(val)
                continue
            raise self._err_char(pos)

    # ------------------------------------------------------------------
    def _limit_err(self, message: str):
        from ..errors import ResourceLimitError

        raise ResourceLimitError(message)

    def _string_cap(self, is_key: bool):
        if self._limits is None:
            return None
        cap = (getattr(self._limits, "max_key_length", None) if is_key
               else getattr(self._limits, "max_string_length", None))
        return cap

    def _take_string(self, eof: bool, is_key: bool = False) -> Optional[str]:
        """Return the decoded string if its closing quote is buffered,
        else None (wait for more input). Bad escapes / bad \\u hex /
        control chars error AT THE OFFENDING CHAR (reference STRING2-6
        anchoring); decode of a clean token goes through loads_strict."""
        buf, start = self._buf, self._pos
        # resume where the previous write() stopped scanning this same
        # pending token: each chunk is scanned once, O(L) total. Restarting
        # at a backslash re-checks at most one escape (<= 5 chars).
        if self._str_resume is not None and self._str_resume[0] == start:
            i = self._str_resume[1]
        else:
            i = start + 1
        n = len(buf)
        cap = self._string_cap(is_key)
        mid_escape = False  # at buffer end: inside \x / \uXXXX (STRING2-6)?
        while i < n:
            if cap is not None and (i - start - 1) > 12 * cap + 12:
                # raw scan length bounds decoded length (an escaped astral
                # char is 12 raw chars for ONE code point — review #2 fixed
                # the 6x bound that threw on within-cap escape-heavy
                # strings): definitely over the cap — abort BEFORE
                # buffering more (reference message, ResourceLimitError).
                # Exactness is still len(val) at the closing quote.
                self._limit_err("String too long")
            c = buf[i]
            if c == "\\":
                j = i + 1
                if j >= n:
                    mid_escape = True
                    break
                e = buf[j]
                if e == "u":
                    k = j + 1
                    hex_end = min(k + 4, n)
                    for h in range(k, hex_end):
                        if buf[h] not in "0123456789abcdefABCDEF":
                            raise self._err_char(h, " (bad \\u escape)")
                    if hex_end - k < 4:
                        mid_escape = True
                        break
                    i = hex_end
                    continue
                if e not in '"\\/bfnrt':
                    raise self._err_char(j, " (bad escape)")
                i = j + 1
                continue
            if c == '"':
                self._str_resume = None
                raw = buf[start:i + 1]
                try:
                    val = loads_strict(raw)
                except ValueError as e:
                    raise self._err(f"Bad string: {e}", at=start) from None
                if cap is not None and len(val) > cap:
                    self._limit_err("String too long")
                if self._interoperable:
                    from .strict_json import _check_surrogates

                    try:
                        _check_surrogates(val)
                    except ValueError as e:
                        raise self._err(str(e), at=start) from None
                self._advance(i + 1 - start)
                return val
            if ord(c) < 0x20:
                raise self._err_char(i)  # raw control char (STRING1 reject)
            i += 1
        if eof:
            # Reference EOF-in-string columns (r4 position differential):
            # plain STRING1 reports end-of-doc column PLUS ONE once at
            # least one string char (or complete escape) was consumed — a
            # bare '"' reports the plain column, as do the mid-escape
            # states (STRING2-6).
            plus = 0 if (mid_escape or i == start + 1) else 1
            raise self._err_eof(col_plus=plus)
        self._str_resume = (start, i)
        return None

    def _take_literal(self, eof: bool):
        """Per-char literal match so the error lands on the first char
        that breaks the word (reference TRUE1..NULL4 states: 'tru ' errors
        on the space at offset 3, not the token start)."""
        buf, start = self._buf, self._pos
        first = {w[0]: w for w in self._literals}
        lit = first[buf[start]]
        rest = buf[start:start + len(lit)]
        for j in range(min(len(rest), len(lit))):
            if rest[j] != lit[j]:
                raise self._err_char(start + j)
        if len(rest) == len(lit):
            self._advance(len(lit))
            return self._literals[lit]
        if eof:
            raise self._err_eof()  # 'nul' -> end-of-doc at offset 3
        return _PENDING  # proper prefix: could complete in the next chunk

    def _take_number(self, eof: bool):
        """Number via the reference's char-level FSM so errors anchor on
        the offending char and maximal-munch matches:

        - '01'  -> the number 0 ends at the '0'; the '1' is reprocessed by
          the outer loop (reference: VOID/ARRAY3 'Unexpected \"1\"');
        - '1..' -> error at the second '.' (NUMBER4 state);
        - '1.'  at eof -> 'Unexpected end of document' at the doc end."""
        buf, start = self._buf, self._pos
        i = start
        n = len(buf)
        while i < n and buf[i] in _NUMCHARS:
            i += 1
        if i == n and not eof:
            return _PENDING  # the number may continue in the next chunk
        raw = buf[start:i]
        if self._allow_inf and raw == "-" and buf[start + 1:start + 2] == "I":
            # relaxed dialect: -Infinity (the transcoder passes the word
            # through; strict mode never reaches here — 'I' is junk there)
            word = buf[start + 1:start + 9]
            if "Infinity".startswith(word) and len(word) < 8:
                if eof:
                    raise self._err_eof()
                return _PENDING
            if word == "Infinity":
                self._advance(9)
                return float("-inf")
            raise self._err_char(start + 1)
        status, idx = _scan_number(raw)
        if status == "complete":
            self._advance(len(raw))
            return self._parse_number(raw)
        if status == "split":
            # raw[:idx] is a complete number; leave raw[idx:] unconsumed
            # for the outer loop (which produces the reference's
            # state-after-value error on it)
            val = self._parse_number(raw[:idx])
            self._advance(idx)
            return val
        if status == "char":
            raise self._err_char(start + idx)
        # status == 'end': raw is a valid but incomplete prefix
        if start + len(raw) >= n and eof:
            raise self._err_eof()
        raise self._err_char(start + len(raw))  # terminator broke the number

    # ------------------------------------------------------------------
    def _parse_number(self, raw: str):
        if self._number_hooks is None:
            return json.loads(raw)
        parse_int, parse_float = self._number_hooks
        return parse_int(raw) if raw.lstrip("-").isdigit() else parse_float(raw)

    def _attach(self, value: Any) -> None:
        if not self._stack:
            if self._have_root:
                raise self._err("Multiple root values")
            self._root = value
            self._have_root = True
            return
        top = self._stack[-1]
        if top[0] == "A":
            top[1].append(value)
            if self._limits is not None:
                cap = getattr(self._limits, "max_items", None)
                if cap is not None and len(top[1]) > cap:
                    self._limit_err("Too many items in array")
        else:
            if top[2] is None:
                raise self._err("Value without a key")
            top[1][top[2]] = value
            if self._limits is not None:
                cap = getattr(self._limits, "max_properties", None)
                if cap is not None and len(top[1]) > cap:
                    self._limit_err("Too many properties in object")

    def _finish_value(self, value: Any) -> None:
        self._attach(value)
        self._expect = "after"

    def _value_path(self) -> str:
        """Path of the value ABOUT to be consumed (container open hooks)."""
        if not self._stack:
            return ""
        top = self._stack[-1]
        if top[0] == "O":
            return f"{self._container_paths[-1]}/{top[2]}"
        return f"{self._container_paths[-1]}/{len(top[1])}"

    def _close_container(self, kind: str) -> None:
        if not self._stack or self._stack[-1][0] != kind:
            raise self._err("Mismatched container close")
        top = self._stack.pop()
        self._container_paths.pop()
        self._emit("endObject" if kind == "O" else "endArray")
        self._attach(top[1])
        self._expect = "after"


_PENDING = object()
