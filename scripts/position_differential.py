"""Error-POSITION differential vs the node-executed reference: the same
(schema, instance-TEXT) pairs through lib.parseInfo and this engine's
parse-position machinery, comparing each violation row's
ValidationError.position {line, column} (and annotation positions when
present).

Anchor semantics under test (pinned by direct probe, r4):
- root value anchors at (0,0) before any leading whitespace;
- property values anchor at their COLON (the reference pushes the value
  layer on colon consumption);
- array items anchor at the first character of the value;
- columns count UTF-16 code units; lines>0 columns carry the reference's
  newline-is-column-0 convention.

The instance text is serialized by NODE (JSON.stringify) and shipped back
so both engines parse byte-identical documents. Paths are compared with
integer segments stripped (the documented item-0 drop quirk); positions
are compared exactly.

Run:  python scripts/position_differential.py [n_schemas] [seed]
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
from scripts.report_differential import _strip_indexes  # noqa: E402

REFERENCE = Path("/root/reference")

NODE_HARNESS = r"""
const lib = require('/root/reference/index.js');
const input = JSON.parse(require('fs').readFileSync(0, 'utf8'));
const out = [];
for (const group of input) {
  const registry = new lib.SchemaRegistry();
  let root = null;
  try {
    for (const s of group.schemas) {
      const sch = registry.import(s.id, s.schema);
      if (s.id === group.root) root = sch;
    }
  } catch (e) { out.push({error: String(e.message)}); continue; }
  const verdicts = [];
  for (const data of group.cases) {
    const text = JSON.stringify(data);
    try {
      const p = lib.parseInfo(text, {schema: root});
      verdicts.push({text: text, rows: p.errors.map(e =>
        [e.keyword, e.path, e.position ? e.position.line : null,
         e.position ? e.position.column : null])});
    } catch (e) { verdicts.push({text: text, err: String(e.message)}); }
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


def run_engine(groups, ref) -> list:
    """Validate the NODE-serialized texts so positions address identical
    bytes on both sides."""
    from jsonschemaparse_spark import SchemaRegistry
    from jsonschemaparse_spark.api import _attach_positions
    from jsonschemaparse_spark.schema.evaluate import Evaluator
    from jsonschemaparse_spark.schema.strict_json import loads_strict

    ev = Evaluator()
    out = []
    for g, r in zip(groups, ref):
        if "error" in r:
            out.append({"error": r["error"]})
            continue
        reg = SchemaRegistry()
        root = None
        try:
            for s in g["schemas"]:
                cs = reg.import_schema(s["id"], s["schema"])
                if s["id"] == g["root"]:
                    root = cs
        except Exception as e:
            out.append({"error": str(e)})
            continue
        verdicts = []
        for rv in r["verdicts"]:
            text = rv["text"]
            try:
                errs, _ = ev.validate(root, loads_strict(text))
                errs, _ = _attach_positions(text, errs, [])
                verdicts.append({"rows": [
                    [e.keyword, e.path,
                     e.position["line"] if e.position else None,
                     e.position["column"] if e.position else None]
                    for e in errs
                ]})
            except Exception as e:
                verdicts.append({"err": str(e)})
        out.append({"verdicts": verdicts})
    return out


def _norm(rows) -> tuple:
    # SET-dedupe: the combinator-duplication quirk is the report
    # differential's subject (masked there, reproduced exactly under
    # --quirks); THIS differential's claim is per-row POSITION parity
    return tuple(sorted(
        {(k, _strip_indexes(p), line, col) for k, p, line, col in rows}
    ))


def compare(groups, ref, eng) -> list[dict]:
    mismatches = []
    for g, r, e in zip(groups, ref, eng):
        if "error" in r or "error" in e:
            continue
        for rv, ev_ in zip(r["verdicts"], e["verdicts"]):
            if "err" in rv:
                continue  # reference refusal: timing covered elsewhere
            if "err" in ev_:
                # an ENGINE crash on a doc the reference handled is a
                # finding, not a skip (r4 review: recall on the feature
                # under test)
                mismatches.append({"text": rv.get("text"),
                                   "engine_error": ev_["err"]})
                continue
            if _norm(rv["rows"]) != _norm(ev_["rows"]):
                mismatches.append({
                    "schema": g["schemas"][0]["schema"],
                    "text": rv["text"],
                    "reference": rv["rows"], "engine": ev_["rows"],
                })
    return mismatches


def main() -> None:
    if shutil.which("node") is None or not REFERENCE.exists():
        print(json.dumps({"skipped": "node or /root/reference unavailable"}))
        return
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    groups = generate_groups(n, seed)
    ref = run_reference(groups)
    mism = compare(groups, ref, run_engine(groups, ref))
    print(json.dumps({
        "n_schemas": n, "seed": seed, "mismatches": len(mism),
        "detail": mism[:6],
    }, indent=1, default=str))


if __name__ == "__main__":
    main()
