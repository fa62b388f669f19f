"""Syntax-level differential: this engine's strict parser vs the reference
tokenizer executed under node.

Random valid JSON texts (json.dumps of random values, with/without
whitespace variations) plus seeded MUTATIONS (truncation, character
insertion/deletion/replacement, concatenation) run through:
  - reference: lib.parse(text) — throws SyntaxError on bad input
  - engine:    api.parse(text) — raises on bad input
comparing accept/reject AND, for accepted texts, the parsed value
(json-normalized), AND — r4 (VERDICT r3 #2) — for rejected texts the
SyntaxError's (line, column) in the reference's err.position convention
plus the message HEAD ('Unexpected "x"' / 'Unexpected end of document';
the tail differs by design — the reference appends FSM state names and
expected-sets, we append our own context).

Positions count UTF-16 code units on both sides (r4: the engine's
_ref_pos tracks code units, matching the reference's JS charno — astral
chars count 2; the generator emits astral content to exercise this).

Documented reference bug class (found by this differential, classified
not masked): `utf16_high` surrogate state goes STALE when a string's
astral char is consumed by the string fast path without its low
surrogate passing the per-unit check (parse.js:361-371 vs the bulk
string capture) — a LATER high surrogate is then falsely rejected with
'expecting one of: UTF-16-low-surrogate' (executed pin:
`["🐲", "🐲"]` rejected at the second string while `["a🐲b", "c🐲d"]`
and `["🐲"]` parse fine). We accept all well-formed astral content;
rejections carrying that expecting-set are counted as
`ref_surrogate_bug`, not mismatches. Separately, the reference quotes
the lone HIGH surrogate in messages ('Unexpected "\\ud83d"', JS
char-at-a-time); engine heads quoting the full astral char are
normalized to the high unit for comparison.

Run:  python scripts/syntax_differential.py [n_texts] [seed]
"""

from __future__ import annotations

import json
import random
import shutil
import subprocess
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

REFERENCE = Path("/root/reference")

NODE_HARNESS = r"""
const lib = require('/root/reference/index.js');
const texts = JSON.parse(require('fs').readFileSync(0, 'utf8'));
const out = [];
for (const t of texts) {
  try {
    const v = lib.parse(t);
    // JSON.stringify collapses Infinity/NaN to null on the wire; both
    // engines legitimately produce Infinity for overflowing literals
    // (double semantics), so ship a sentinel instead
    const enc = JSON.parse(JSON.stringify(v === undefined ? null : v,
      (k, x) => (typeof x === 'number' && !isFinite(x))
        ? '__nonfinite__' + String(x) : x));
    out.push({ok: true, value: enc});
  } catch (e) {
    if (e.position && typeof e.position.line === 'number') {
      out.push({ok: false, line: e.position.line, column: e.position.column,
                msg: String(e.message)});
    } else {
      out.push({ok: false});
    }
  }
}
console.log(JSON.stringify(out));
"""


def _rand_value(rnd: random.Random, depth: int = 0):
    if depth >= 3 or rnd.random() < 0.4:
        return rnd.choice([
            None, True, False, 0, -1, 42, 3.14, -0.5, 1e10, 1e-7, 123456789012345,
            "", "a", "hello world", "é中文", "line\nbreak", "\U0001F432", "a\U0001F432b",
            'quote"inside', "back\\slash", "tab\there", "",
        ])
    if rnd.random() < 0.5:
        return [_rand_value(rnd, depth + 1) for _ in range(rnd.randint(0, 3))]
    return {f"k{i}": _rand_value(rnd, depth + 1) for i in range(rnd.randint(0, 3))}


def _mutate_text(rnd: random.Random, text: str) -> str:
    op = rnd.random()
    if op < 0.2 and len(text) > 1:
        cut = rnd.randrange(1, len(text))
        return text[:cut]  # truncation
    if op < 0.4:
        pos = rnd.randrange(len(text) + 1)
        ch = rnd.choice(list('{}[],:"\\truefalsn0123456789.eE+- \t\n\x00x') + ["\U0001F432"])
        return text[:pos] + ch + text[pos:]
    if op < 0.6 and text:
        pos = rnd.randrange(len(text))
        return text[:pos] + text[pos + 1:]  # deletion
    if op < 0.8 and text:
        pos = rnd.randrange(len(text))
        ch = rnd.choice(list('{}[],:"09te '))
        return text[:pos] + ch + text[pos + 1:]
    return text + rnd.choice([" ", "]", "}", ",", "1", '"', "null"])  # tail junk


def generate_texts(n: int, seed: int) -> list[str]:
    rnd = random.Random(seed)
    texts = []
    for _ in range(n):
        v = _rand_value(rnd)
        t = json.dumps(
            v,
            ensure_ascii=rnd.random() < 0.5,
            separators=((", ", ": ") if rnd.random() < 0.5 else (",", ":")),
        )
        if rnd.random() < 0.3:
            t = f"  {t}\n"
        texts.append(t)
        for _ in range(2):
            texts.append(_mutate_text(rnd, t))
    return texts


def run_reference(texts: list[str]) -> list:
    with tempfile.NamedTemporaryFile("w", suffix=".js", delete=False) as f:
        f.write(NODE_HARNESS)
        harness = f.name
    try:
        p = subprocess.run(["node", harness], input=json.dumps(texts).encode(),
                           capture_output=True, timeout=300)
        if p.returncode != 0:
            raise RuntimeError(f"node harness failed: {p.stderr[:500]}")
        return json.loads(p.stdout)
    finally:
        Path(harness).unlink(missing_ok=True)


def run_engine(texts: list[str]) -> list:
    from jsonschemaparse_spark.api import ParseSyntaxError, parse

    out = []
    for t in texts:
        try:
            v = parse(t)
            out.append({"ok": True, "value": v})
        except ParseSyntaxError as e:
            rec = {"ok": False, "msg": str(e)}
            if getattr(e, "position", None) is not None:
                rec["line"] = e.position["line"]
                rec["column"] = e.position["column"]
            out.append(rec)
        except Exception:
            out.append({"ok": False})
    return out


def _msg_head(msg: str) -> str | None:
    """'Unexpected "<c>"' / 'Unexpected end of document' — the shared
    message prefix both engines emit before their own context. An astral
    quoted char is normalized to its lone HIGH surrogate, the reference's
    JS char-at-a-time quoting."""
    import re as _re

    if msg.startswith("Unexpected end of document"):
        return "Unexpected end of document"
    m = _re.match(r'Unexpected "(?:[^"\\]|\\.)*"', msg)
    if m is None:
        return None
    head = m.group(0)
    quoted = json.loads(head[len("Unexpected "):])
    if len(quoted) == 1 and ord(quoted) > 0xFFFF:
        hi = chr(0xD800 + ((ord(quoted) - 0x10000) >> 10))
        return "Unexpected " + json.dumps(hi)
    return head


def _norm_num(v):
    """JS has a single number type (double) and the node harness ships
    values back as JSON, so 1e-0 arrives as 1 while Python parses it as
    1.0 — numerically identical. Normalize integral floats (incl. -0.0)
    to ints before comparing; within double range this is lossless."""
    if isinstance(v, bool):
        return v
    if isinstance(v, float) and (v != v or v in (float("inf"), float("-inf"))):
        return "__nonfinite__" + ("NaN" if v != v else
                                  ("Infinity" if v > 0 else "-Infinity"))
    if isinstance(v, int) and abs(v) > 2**53:
        # documented divergence (relaxed_json.py bigNumber 'default'): the
        # engine keeps big ints EXACT where the reference collapses to
        # double; compare at double precision — the tokenizer-level claim.
        # big_number='float64' opts into exact reference behavior.
        return float(v)
    if isinstance(v, float) and abs(v) < 2**53 and v == int(v):
        return int(v)
    if isinstance(v, list):
        return [_norm_num(x) for x in v]
    if isinstance(v, dict):
        return {k: _norm_num(x) for k, x in v.items()}
    return v


def _norm(v):
    return json.dumps(_norm_num(v), sort_keys=True)


def compare(texts, ref, eng, counters: dict | None = None) -> list[dict]:
    mismatches = []
    for t, r, e in zip(texts, ref, eng):
        if not r["ok"] and "UTF-16-low-surrogate" in r.get("msg", ""):
            # stale utf16_high false rejection (module docstring): the
            # reference errors where well-formed astral content follows a
            # string whose pair straddled its fast-path boundary. Counted,
            # never silently dropped.
            if counters is not None:
                counters["ref_surrogate_bug"] = counters.get("ref_surrogate_bug", 0) + 1
            continue
        if r["ok"] != e["ok"]:
            mismatches.append({"text": t, "reference_ok": r["ok"],
                               "engine_ok": e["ok"]})
        elif r["ok"] and _norm(r["value"]) != _norm(e["value"]):
            mismatches.append({"text": t, "reference_value": r["value"],
                               "engine_value": e["value"]})
        elif not r["ok"] and "line" in r:
            # both reject with a positioned reference error: (line, column)
            # must match exactly; message heads must agree when extractable
            if (e.get("line"), e.get("column")) != (r["line"], r["column"]):
                mismatches.append({
                    "text": t, "kind": "position",
                    "reference": (r["line"], r["column"], r["msg"][:60]),
                    "engine": (e.get("line"), e.get("column"),
                               e.get("msg", "")[:60]),
                })
            else:
                rh, eh = _msg_head(r["msg"]), _msg_head(e.get("msg", ""))
                if rh is not None and rh != eh:
                    mismatches.append({
                        "text": t, "kind": "message-head",
                        "reference": r["msg"][:80], "engine": e.get("msg", "")[:80],
                    })
    return mismatches


def main() -> None:
    if shutil.which("node") is None or not REFERENCE.exists():
        print(json.dumps({"skipped": "node or /root/reference unavailable"}))
        return
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    texts = generate_texts(n, seed)
    counters: dict = {}
    mism = compare(texts, run_reference(texts), run_engine(texts), counters)
    print(json.dumps({
        "n_texts": len(texts), "seed": seed, "mismatches": len(mism),
        "counters": counters,
        "detail": mism[:10],
    }, indent=1, default=str))


if __name__ == "__main__":
    main()
