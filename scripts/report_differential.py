"""Error-REPORT differential: full violation rows vs the node-executed
reference — message, keyword, path, expected, actual per error, compared
as multisets per (schema, instance).

Verdict parity (scripts/reference_differential.py) says WHETHER both
engines reject; this asks whether they reject with the SAME REPORT — the
north rule's 'violation rows ... exactly matching the reference's
error-report semantics'.

Known reference quirks, classified (not counted as mismatches), each
verified by direct probe:
- item0_path: the reference DROPS the '0' segment for errors inside the
  first array element (/b/z instead of /b/0/z for item 0, while item 2
  gets /b/2/z — internally inconsistent; lib layer path not yet
  incremented when item 0's layer is built). This engine keeps real
  indexes — copying the quirk would make /b/z ambiguous with a key z on
  b itself. Normalized by comparing paths with all integer segments
  stripped when a group contains arrays-of-containers.
- combinator_dup: finish()-emitted combinator failures (anyOf/oneOf/not,
  container-enum) appear 2^k times in the reference's report when nested
  under k in-place applicator layers (allOf/$ref/then/else) — the shared
  errors array is pushed at emit AND re-pushed by each ancestor's
  importLayer (schema.js:1153-1175 'self.errors might be a reference').
  Probed: {allOf:[{anyOf:[...]}]} -> 2 rows, {allOf:[{allOf:[{anyOf}]}]}
  -> 4 rows, while start-event errors (type/minimum/...) stay at 1. This
  engine emits each failure once; comparison is by DEDUPLICATED multiset.

Run:  python scripts/report_differential.py [n_schemas] [seed]
"""

from __future__ import annotations

import json
import shutil
import subprocess
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from scripts.reference_differential import generate_groups  # noqa: E402

REFERENCE = Path("/root/reference")

NODE_HARNESS = r"""
const lib = require('/root/reference/index.js');
const input = JSON.parse(require('fs').readFileSync(0, 'utf8'));
const out = [];
const enc = (x) => JSON.parse(JSON.stringify(
  x === undefined ? null : (x instanceof Set ? Array.from(x) : x),
  (k, v) => (v instanceof Set) ? Array.from(v)
    : (typeof v === 'number' && !isFinite(v)) ? String(v) : v));
for (const group of input) {
  const registry = new lib.SchemaRegistry();
  let root = null;
  try {
    for (const s of group.schemas) {
      const sch = registry.import(s.id, s.schema);
      if (s.id === group.root) root = sch;
    }
  } catch (e) { out.push({name: group.name, error: String(e.message)}); continue; }
  const verdicts = [];
  for (const data of group.cases) {
    try {
      const p = lib.parseInfo(JSON.stringify(data), root);
      verdicts.push(p.errors.map(e => ({
        m: e.message, k: e.keyword, p: String(e.path ?? ''),
        exp: enc(e.expected), act: enc(e.actual),
      })));
    } catch (e) { verdicts.push('ERR:' + e.message); }
  }
  out.push({name: group.name, verdicts});
}
console.log(JSON.stringify(out));
"""


def run_reference(groups) -> list:
    with tempfile.NamedTemporaryFile("w", suffix=".js", delete=False) as f:
        f.write(NODE_HARNESS)
        harness = f.name
    try:
        p = subprocess.run(["node", harness], input=json.dumps(groups).encode(),
                           capture_output=True, timeout=300)
        if p.returncode != 0:
            raise RuntimeError(f"node harness failed: {p.stderr[:500]}")
        return json.loads(p.stdout)
    finally:
        Path(harness).unlink(missing_ok=True)


def run_engine(groups, reference_quirks: bool = False) -> list:
    from jsonschemaparse_spark import SchemaRegistry
    from jsonschemaparse_spark.schema.evaluate import Evaluator

    ev = Evaluator(reference_quirks=reference_quirks)
    out = []
    for g in groups:
        reg = SchemaRegistry()
        root = None
        try:
            for s in g["schemas"]:
                cs = reg.import_schema(s["id"], s["schema"])
                if s["id"] == g["root"]:
                    root = cs
        except Exception as e:
            out.append({"name": g["name"], "error": str(e)})
            continue
        verdicts = []
        for data in g["cases"]:
            try:
                errs, _ = ev.validate(root, data)
                verdicts.append([
                    {"m": e.message, "k": e.keyword, "p": e.path,
                     "exp": e.expected, "act": e.actual}
                    for e in errs
                ])
            except Exception as e:
                verdicts.append("ERR:" + str(e))
        out.append({"name": g["name"], "verdicts": verdicts})
    return out


def _strip_indexes(path: str) -> str:
    return "/".join(p for p in path.split("/") if not p.isdigit())


def _norm_val(v):
    if isinstance(v, bool):
        return v
    if isinstance(v, float) and abs(v) < 2**53 and v == int(v):
        return int(v)
    if isinstance(v, (list, tuple)):
        return tuple(_norm_val(x) for x in v)
    if isinstance(v, frozenset):
        return tuple(sorted(map(str, v)))
    if isinstance(v, dict):
        return tuple(sorted((k, _norm_val(x)) for k, x in v.items()))
    return v


def _norm_errors(errors) -> tuple:
    rows = set()
    for e in errors:
        # set-dedupe: combinator_dup quirk (see module docstring)
        rows.add((e["m"], e["k"], _strip_indexes(e["p"]),
                  _norm_val(e["exp"]), _norm_val(e["act"])))
    return tuple(sorted(rows, key=repr))


def _exact_errors(errors) -> tuple:
    """Quirk mode: EXACT multiset — real paths, real multiplicities. No
    masking: the engine must reproduce the item-0 path drop and the
    finish-cascade duplication counts itself."""
    return tuple(sorted(
        ((e["m"], e["k"], e["p"], _norm_val(e["exp"]), _norm_val(e["act"]))
         for e in errors), key=repr))


def compare(groups, ref, eng, exact: bool = False) -> list[dict]:
    norm = _exact_errors if exact else _norm_errors
    mismatches = []
    for g, r, e in zip(groups, ref, eng):
        if "error" in r or "error" in e:
            continue  # verdict differential covers refusal parity
        for i, (rv, ev_) in enumerate(zip(r["verdicts"], e["verdicts"])):
            if isinstance(rv, str) or isinstance(ev_, str):
                continue  # dangling-timing class, covered elsewhere
            if norm(rv) != norm(ev_):
                mismatches.append({
                    "schema": g["schemas"][0]["schema"],
                    "instance": g["cases"][i],
                    "reference": rv, "engine": ev_,
                })
    return mismatches


def main() -> None:
    if shutil.which("node") is None or not REFERENCE.exists():
        print(json.dumps({"skipped": "node or /root/reference unavailable"}))
        return
    args = [a for a in sys.argv[1:] if a != "--quirks"]
    quirks = "--quirks" in sys.argv[1:]
    n = int(args[0]) if len(args) > 0 else 200
    seed = int(args[1]) if len(args) > 1 else 1
    groups = generate_groups(n, seed)
    mism = compare(groups, run_reference(groups),
                   run_engine(groups, reference_quirks=quirks), exact=quirks)
    print(json.dumps({
        "n_schemas": n, "seed": seed, "quirks": quirks, "mismatches": len(mism),
        "detail": mism[:6],
    }, indent=1, default=str))


if __name__ == "__main__":
    main()
