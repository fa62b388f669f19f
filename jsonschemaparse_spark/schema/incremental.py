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


class IncrementalSyntaxError(ValueError):
    def __init__(self, message: str, line: int, column: int):
        super().__init__(f"{message} at line {line} column {column}")
        self.message = message
        self.line = line
        self.column = column


class IncrementalJSONParser:
    """Strict JSON parser accepting arbitrarily-split str/bytes chunks.

    write(chunk) any number of times, then end() -> the native value.
    Register SAX callbacks with on(name, fn). Raises IncrementalSyntaxError
    with 1-based line/column on malformed input.
    """

    def __init__(self, max_depth: int = 512):
        self._decoder = codecs.getincrementaldecoder("utf-8")(errors="strict")
        self._buf = ""
        self._pos = 0              # consumed offset within _buf
        self._line = 1
        self._column = 1
        self._stack: list[tuple] = []   # ('O', dict, pending_key) | ('A', list)
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

    def _err(self, message: str) -> IncrementalSyntaxError:
        return IncrementalSyntaxError(message, self._line, self._column)

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
            raise self._err("Unexpected end of document")
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
        else:
            self._column += n
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
                    raise self._err(f"Unexpected token: {ch!r} (expected a key)")
                tok = self._take_string(eof)
                if tok is None:
                    return
                self._stack[-1] = ("O", self._stack[-1][1], tok)
                self._emit("key", tok)
                self._expect = "colon"
                continue

            if self._expect == "colon":
                if ch != ":":
                    raise self._err(f"Unexpected token: {ch!r} (expected ':')")
                self._advance(1)
                self._expect = "value"
                continue

            if self._expect == "after":
                top = self._stack[-1] if self._stack else None
                if top is None:
                    raise self._err(f"Unexpected token after document: {ch!r}")
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
                raise self._err(f"Unexpected token: {ch!r}")

            # expect == 'value'
            if ch == "{":
                if len(self._stack) >= self._max_depth:
                    raise self._err("Nesting too deep")
                self._advance(1)
                self._stack.append(("O", {}, None))
                self._emit("startObject")
                self._expect = "key_or_close"
                continue
            if ch == "[":
                if len(self._stack) >= self._max_depth:
                    raise self._err("Nesting too deep")
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
            if ch in "tfn":
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
            raise self._err(f"Unexpected token: {ch!r}")

    # ------------------------------------------------------------------
    def _take_string(self, eof: bool) -> Optional[str]:
        """Return the decoded string if its closing quote is buffered,
        else None (wait for more input). Escape/surrogate validation via
        loads_strict on the raw token."""
        buf, start = self._buf, self._pos
        i = start + 1
        n = len(buf)
        while i < n:
            c = buf[i]
            if c == "\\":
                i += 2  # skip escaped char (may run past end -> incomplete)
                continue
            if c == '"':
                raw = buf[start:i + 1]
                try:
                    val = loads_strict(raw)
                except ValueError as e:
                    raise self._err(f"Bad string: {e}") from None
                self._advance(i + 1 - start)
                return val
            i += 1
        if eof:
            raise self._err("Unexpected end of string")
        return None

    def _take_literal(self, eof: bool):
        buf, start = self._buf, self._pos
        rest = buf[start:start + 5]
        for lit, val in _LITERALS.items():
            if rest.startswith(lit):
                self._advance(len(lit))
                return val
            if not eof and lit.startswith(rest):
                return _PENDING  # could complete in the next chunk
        raise self._err(f"Unexpected token: {rest[:1]!r}")

    def _take_number(self, eof: bool):
        buf, start = self._buf, self._pos
        i = start
        n = len(buf)
        while i < n and buf[i] in _NUMCHARS:
            i += 1
        if i == n and not eof:
            return _PENDING  # the number may continue in the next chunk
        raw = buf[start:i]
        try:
            val = json.loads(raw)
        except ValueError:
            raise self._err(f"Bad number: {raw!r}") from None
        if not isinstance(val, (int, float)) or isinstance(val, bool):
            raise self._err(f"Bad number: {raw!r}")
        self._advance(i - start)
        return val

    # ------------------------------------------------------------------
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
        else:
            if top[2] is None:
                raise self._err("Value without a key")
            top[1][top[2]] = value

    def _finish_value(self, value: Any) -> None:
        self._attach(value)
        self._expect = "after"

    def _close_container(self, kind: str) -> None:
        if not self._stack or self._stack[-1][0] != kind:
            raise self._err("Mismatched container close")
        top = self._stack.pop()
        self._emit("endObject" if kind == "O" else "endArray")
        self._attach(top[1])
        self._expect = "after"


_PENDING = object()
