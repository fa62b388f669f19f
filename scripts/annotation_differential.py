"""Annotation differential: title/description annotation rows vs the
node-executed reference.

The reference emits an Annotation(value, keyword, path, schemaId) for
every annotated schema that successfully applied at an instance location,
only on zero-error instances (schema.js:1411). This engine's
Evaluator(annotations=True) implements the same contract; here the SAME
(schema, instance) pairs run through both and the (value, keyword, path)
multisets are compared (schemaId is excluded: the reference's has a
double-# join quirk, e.g. 'http://a/1##/properties/a', and ids are an
internal naming scheme on both sides).

Run:  python scripts/annotation_differential.py [n_schemas] [seed]
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

from scripts.reference_differential import (  # noqa: E402
    _instance_for,
    _rand_schema,
)

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
  } catch (e) { out.push({name: group.name, error: String(e.message)}); continue; }
  const verdicts = [];
  for (const data of group.cases) {
    const text = JSON.stringify(data);
    try {
      const p = lib.parseInfo(text, root);
      verdicts.push({
        text: text,
        valid: p.errors.length === 0,
        anns: (p.annotations || []).map(a => ({
          v: a.value, k: a.keyword, p: String(a.path ?? ''),
          l: a.position ? a.position.line : null,
          c: a.position ? a.position.column : null})),
      });
    } catch (e) { verdicts.push('ERR:' + e.message); }
  }
  out.push({name: group.name, verdicts});
}
console.log(JSON.stringify(out));
"""


def _sprinkle_annotations(rnd: random.Random, schema):
    """Add title/description keywords through the schema tree in place."""
    if not isinstance(schema, dict):
        return schema
    if rnd.random() < 0.5:
        schema["title"] = f"T{rnd.randint(0, 99)}"
    if rnd.random() < 0.3:
        schema["description"] = f"D{rnd.randint(0, 99)}"
    for v in schema.values():
        if isinstance(v, dict):
            _sprinkle_annotations(rnd, v)
        elif isinstance(v, list):
            for x in v:
                if isinstance(x, dict):
                    _sprinkle_annotations(rnd, x)
    return schema


def generate_groups(n_schemas: int, seed: int, cases_per_schema: int = 5):
    rnd = random.Random(seed)
    groups = []
    for i in range(n_schemas):
        schema = _sprinkle_annotations(rnd, _rand_schema(rnd))
        sid = f"http://anndiff.local/{seed}/{i}"
        groups.append({
            "name": f"g{i}", "root": sid,
            "schemas": [{"id": sid, "schema": schema}],
            # near-valid instances: annotations only flow on VALID docs
            "cases": [_instance_for(rnd, schema) for _ in range(cases_per_schema)],
        })
    return groups


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


def run_engine(groups, ref=None) -> list:
    """When the reference output is provided, validate the NODE-serialized
    text and attach annotation POSITIONS (r4) so the comparison covers
    Annotation.position too."""
    from jsonschemaparse_spark import SchemaRegistry
    from jsonschemaparse_spark.api import _attach_positions
    from jsonschemaparse_spark.schema.evaluate import Evaluator

    ev = Evaluator(annotations=True)
    out = []
    for gi, g in enumerate(groups):
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
        for ci, data in enumerate(g["cases"]):
            try:
                errs, anns = ev.validate(root, data)
                text = None
                if ref is not None and "error" not in ref[gi]:
                    rv = ref[gi]["verdicts"][ci]
                    if isinstance(rv, dict):
                        text = rv.get("text")
                if text is not None and anns:
                    errs, anns = _attach_positions(text, errs, anns)
                verdicts.append({
                    "valid": not errs,
                    "anns": [{"v": a.value, "k": a.keyword, "p": a.path,
                              "l": a.position["line"] if a.position else None,
                              "c": a.position["column"] if a.position else None}
                             for a in anns],
                })
            except Exception as e:
                verdicts.append("ERR:" + str(e))
        out.append({"name": g["name"], "verdicts": verdicts})
    return out


def _norm(anns) -> tuple:
    # integer path segments stripped: the reference's item-0 layer path
    # omits the '0' segment (same quirk as in its error paths — see
    # scripts/report_differential.py item0_path); set-dedupe because the
    # stripping can merge per-item rows
    def strip(p):
        return "/".join(x for x in p.split("/") if not x.isdigit())

    return tuple(sorted(
        {(a["v"], a["k"], strip(a["p"]), a.get("l"), a.get("c")) for a in anns},
        key=repr))


def compare(groups, ref, eng) -> list[dict]:
    mismatches = []
    for g, r, e in zip(groups, ref, eng):
        if "error" in r or "error" in e:
            continue
        for i, (rv, ev_) in enumerate(zip(r["verdicts"], e["verdicts"])):
            if isinstance(rv, str) or isinstance(ev_, str):
                continue
            if rv["valid"] != ev_["valid"]:
                continue  # verdict differential's jurisdiction
            if not rv["valid"]:
                continue  # both agree invalid -> both must emit none
            if _norm(rv["anns"]) != _norm(ev_["anns"]):
                mismatches.append({
                    "schema": g["schemas"][0]["schema"],
                    "instance": g["cases"][i],
                    "reference": rv["anns"], "engine": ev_["anns"],
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
