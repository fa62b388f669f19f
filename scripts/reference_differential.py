"""Randomized verdict differential: THIS engine's evaluator vs the actual
reference implementation executed under node.

Generates seeded random (schema, instance) pairs over the keyword families
both engines implement (types, numeric ranges, string lengths/pattern,
enum/const, required/properties, items/min/maxItems, combinators,
if/then/else, $ref), feeds the SAME pairs to:
  - the reference: lib.parseInfo via a generated node harness, and
  - this engine:   schema.evaluate.Evaluator,
and reports any verdict disagreement. Zero mismatches is the parity claim;
tests/test_reference_differential.py pins a fixed-seed batch in CI.

Run:  python scripts/reference_differential.py [n_schemas] [seed]
Requires node + /root/reference (skipped gracefully if absent).
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
    try {
      const p = lib.parseInfo(JSON.stringify(data), root);
      verdicts.push(p.errors.length === 0);
    } catch (e) { verdicts.push('ERR:' + e.message); }
  }
  out.push({name: group.name, verdicts});
}
console.log(JSON.stringify(out));
"""


def _rand_scalar(rnd: random.Random):
    return rnd.choice([
        None, True, False, 0, 1, -3, 7, 42, 2.5, -0.5, "", "a", "hello",
        "xyz", "42", [1, 2], {"k": 1},
    ])


def _rand_schema(rnd: random.Random, depth: int = 0) -> dict:
    opts = ["type", "range", "length", "enum", "const", "object", "array",
            "typelist", "propcount", "tuple", "patternprops", "boolsub"]
    if depth < 2:
        opts += ["allOf", "anyOf", "oneOf", "not", "ifthen"]
    if depth == 0:
        # $defs + "#/$defs/d" only at the document root — nested $defs make
        # the root-relative pointer dangling, which both engines reject
        # (with different timing, see compare()); keeping the generator to
        # resolvable refs makes the differential probe semantics, not
        # error timing
        opts.append("nest")
    kind = rnd.choice(opts)
    if kind == "type":
        return {"type": rnd.choice(
            ["string", "integer", "number", "boolean", "object", "array", "null"])}
    if kind == "typelist":
        n = rnd.randint(1, 3)
        return {"type": rnd.sample(
            ["string", "integer", "number", "boolean", "object", "array", "null"],
            k=n)}
    if kind == "propcount":
        s = {"minProperties": rnd.randint(0, 2)}
        if rnd.random() < 0.6:
            s["maxProperties"] = rnd.randint(1, 4)
        return s
    if kind == "tuple":
        s = {"items": [_rand_schema(rnd, depth + 1)
                       for _ in range(rnd.randint(1, 3))]}
        if rnd.random() < 0.6:
            s["additionalItems"] = rnd.choice(
                [False, True, {"type": "integer"}, {"type": "string"}])
        return s
    if kind == "patternprops":
        s = {"patternProperties": {
            rnd.choice(["^a", "^[kv]$", "n"]): _rand_schema(rnd, depth + 1)}}
        if rnd.random() < 0.5:
            s["properties"] = {"k": _rand_schema(rnd, depth + 1)}
        if rnd.random() < 0.4:
            s["additionalProperties"] = rnd.choice(
                [False, {"type": "integer"}])
        return s
    if kind == "boolsub":
        # boolean schemas in subschema positions
        return rnd.choice([
            {"properties": {"k": rnd.choice([True, False])}},
            {"items": rnd.choice([True, False])},
            {"not": rnd.choice([True, False])},
            {"anyOf": [rnd.choice([True, False]), _rand_schema(rnd, depth + 1)]},
        ])
    if kind == "range":
        lo = rnd.randint(-5, 5)
        s = {"minimum": lo} if rnd.random() < 0.7 else {"exclusiveMinimum": lo}
        if rnd.random() < 0.6:
            s["maximum"] = lo + rnd.randint(0, 10)
        if rnd.random() < 0.3:
            s["multipleOf"] = rnd.choice([1, 2, 0.5, 3])
        return s
    if kind == "length":
        s = {}
        if rnd.random() < 0.8:
            s["minLength"] = rnd.randint(0, 4)
        if rnd.random() < 0.6:
            s["maxLength"] = rnd.randint(2, 8)
        if rnd.random() < 0.3:
            s["pattern"] = rnd.choice(["^a", "b$", "ll", "^[0-9]+$"])
        return s
    if kind == "enum":
        vals = rnd.sample([1, 2, "a", "b", True, None, 2.5], k=rnd.randint(1, 4))
        return {"enum": vals}
    if kind == "const":
        return {"const": _rand_scalar(rnd)}
    if kind == "object":
        props = {}
        for name in rnd.sample(["k", "v", "name", "n"], k=rnd.randint(1, 3)):
            props[name] = _rand_schema(rnd, depth + 1)
        s = {"properties": props}
        if rnd.random() < 0.5:
            s["required"] = rnd.sample(list(props), k=rnd.randint(1, len(props)))
        if rnd.random() < 0.3:
            s["additionalProperties"] = rnd.choice(
                [False, {"type": "string"}, {"type": "integer"}])
        return s
    if kind == "array":
        s = {"items": _rand_schema(rnd, depth + 1)}
        if rnd.random() < 0.5:
            s["minItems"] = rnd.randint(0, 2)
        if rnd.random() < 0.3:
            s["maxItems"] = rnd.randint(1, 4)
        return s
    if kind == "allOf":
        return {"allOf": [_rand_schema(rnd, depth + 1)
                          for _ in range(rnd.randint(1, 2))]}
    if kind == "anyOf":
        return {"anyOf": [_rand_schema(rnd, depth + 1)
                          for _ in range(rnd.randint(1, 3))]}
    if kind == "oneOf":
        return {"oneOf": [_rand_schema(rnd, depth + 1)
                          for _ in range(rnd.randint(1, 3))]}
    if kind == "not":
        return {"not": _rand_schema(rnd, depth + 1)}
    if kind == "ifthen":
        s = {"if": _rand_schema(rnd, depth + 1)}
        if rnd.random() < 0.8:
            s["then"] = _rand_schema(rnd, depth + 1)
        if rnd.random() < 0.5:
            s["else"] = _rand_schema(rnd, depth + 1)
        return s
    # nest: wrap in properties + $ref via $defs
    inner = _rand_schema(rnd, depth + 1)
    return {"$defs": {"d": inner},
            "properties": {"k": {"$ref": "#/$defs/d"}}}


def _rand_instance(rnd: random.Random, depth: int = 0):
    kind = rnd.random()
    if depth >= 2 or kind < 0.55:
        return _rand_scalar(rnd)
    if kind < 0.8:
        return {name: _rand_instance(rnd, depth + 1)
                for name in rnd.sample(["k", "v", "name", "n", "x"],
                                       k=rnd.randint(0, 3))}
    return [_rand_instance(rnd, depth + 1) for _ in range(rnd.randint(0, 3))]


def _instance_for(rnd: random.Random, schema, depth: int = 0):
    """Schema-aware instance: aims NEAR validity so deep branches get
    exercised (pure random instances mostly die at the type check)."""
    if not isinstance(schema, dict) or depth > 3:
        return _rand_scalar(rnd)
    if "const" in schema:
        return schema["const"]
    if "enum" in schema and schema["enum"]:
        return rnd.choice(schema["enum"])
    t = schema.get("type")
    if isinstance(t, list):
        t = rnd.choice(t)
    if t is None:
        for kw, ty in (("properties", "object"), ("required", "object"),
                       ("items", "array"), ("minimum", "number"),
                       ("minLength", "string"), ("pattern", "string"),
                       ("minProperties", "object"), ("minItems", "array")):
            if kw in schema:
                t = ty
                break
    if t in ("integer", "number"):
        lo = schema.get("minimum", schema.get("exclusiveMinimum", 0))
        v = lo + rnd.randint(0, 3)
        return v if t == "integer" else v + rnd.choice([0, 0.5])
    if t == "string":
        n = schema.get("minLength", rnd.randint(0, 4))
        base = rnd.choice(["a", "b", "l", "0", "x"]) * max(n, 1)
        return base[: schema.get("maxLength", len(base))]
    if t == "boolean":
        return rnd.choice([True, False])
    if t == "null":
        return None
    if t == "array":
        items = schema.get("items")
        if isinstance(items, list):
            return [_instance_for(rnd, s, depth + 1) for s in items]
        n = schema.get("minItems", rnd.randint(0, 2))
        return [_instance_for(rnd, items if items is not None else {},
                              depth + 1) for _ in range(max(n, 1))]
    if t == "object":
        props = schema.get("properties", {})
        keys = set(schema.get("required", [])) | set(
            rnd.sample(list(props), k=rnd.randint(0, len(props)))
            if props else [])
        return {k: _instance_for(rnd, props.get(k, {}), depth + 1)
                for k in keys}
    # combinators: follow a random branch
    for kw in ("allOf", "anyOf", "oneOf"):
        if schema.get(kw):
            return _instance_for(rnd, rnd.choice(schema[kw]), depth + 1)
    if "then" in schema:
        return _instance_for(rnd, schema["then"], depth + 1)
    return _rand_scalar(rnd)


def _mutate(rnd: random.Random, value):
    """One random structural/value mutation — turns near-valid into
    near-miss instances."""
    if isinstance(value, dict) and value:
        v = dict(value)
        k = rnd.choice(list(v))
        op = rnd.random()
        if op < 0.4:
            v[k] = _rand_scalar(rnd)
        elif op < 0.7:
            del v[k]
        else:
            v["zz"] = _rand_scalar(rnd)
        return v
    if isinstance(value, list):
        v = list(value)
        if v and rnd.random() < 0.5:
            v[rnd.randrange(len(v))] = _rand_scalar(rnd)
        else:
            v.append(_rand_scalar(rnd))
        return v
    return _rand_scalar(rnd)


def generate_groups(n_schemas: int, seed: int, cases_per_schema: int = 6):
    rnd = random.Random(seed)
    groups = []
    for i in range(n_schemas):
        schema = _rand_schema(rnd)
        sid = f"http://diff.local/{seed}/{i}"
        cases = [_rand_instance(rnd) for _ in range(cases_per_schema // 3)]
        # schema-aware near-valid + mutated near-miss instances
        while len(cases) < cases_per_schema:
            inst = _instance_for(rnd, schema)
            cases.append(inst)
            if len(cases) < cases_per_schema:
                cases.append(_mutate(rnd, inst))
        groups.append({
            "name": f"g{i}", "root": sid,
            "schemas": [{"id": sid, "schema": schema}],
            "cases": cases,
        })
    return groups


def run_reference(groups) -> list:
    with tempfile.NamedTemporaryFile("w", suffix=".js", delete=False) as f:
        f.write(NODE_HARNESS)
        harness = f.name
    try:
        p = subprocess.run(
            ["node", harness], input=json.dumps(groups).encode(),
            capture_output=True, timeout=300)
        if p.returncode != 0:
            raise RuntimeError(f"node harness failed: {p.stderr[:500]}")
        return json.loads(p.stdout)
    finally:
        Path(harness).unlink(missing_ok=True)


def run_engine(groups) -> list:
    from jsonschemaparse_spark import SchemaRegistry
    from jsonschemaparse_spark.schema.evaluate import Evaluator

    ev = Evaluator()
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
                verdicts.append(len(errs) == 0)
            except Exception as e:
                verdicts.append("ERR:" + str(e))
        out.append({"name": g["name"], "verdicts": verdicts})
    return out


def compare(groups, ref, eng) -> tuple[list[dict], int]:
    """Returns (true mismatches, dangling_timing count).

    dangling_timing: the schema contains a dangling $ref — the reference
    rejects lazily (only instances that construct the offending layer:
    schema.js initProperty / ValidateLayer), this engine rejects eagerly
    for every instance (Evaluator._check_ref_closure, by design — see its
    docstring). Both reject the schema; only WHICH instances surface the
    config error differs, so these are counted separately, not as parity
    failures."""
    mismatches = []
    dangling_timing = 0
    for g, r, e in zip(groups, ref, eng):
        if "error" in r or "error" in e:
            if ("error" in r) != ("error" in e):
                mismatches.append({"group": g, "ref": r, "engine": e,
                                   "kind": "compile"})
            continue
        ref_dangles = any("Could not resolve" in str(v) for v in r["verdicts"])
        eng_dangles = any("Could not resolve" in str(v) for v in e["verdicts"])
        for i, (rv, ev_) in enumerate(zip(r["verdicts"], e["verdicts"])):
            rv_b = rv if isinstance(rv, bool) else None
            ev_b = ev_ if isinstance(ev_, bool) else None
            if rv_b != ev_b:
                if (ref_dangles or eng_dangles) and (rv_b is None or ev_b is None):
                    dangling_timing += 1
                    continue
                mismatches.append({
                    "schema": g["schemas"][0]["schema"],
                    "instance": g["cases"][i],
                    "reference": rv, "engine": ev_, "kind": "verdict",
                })
    return mismatches, dangling_timing


def main() -> None:
    if shutil.which("node") is None or not REFERENCE.exists():
        print(json.dumps({"skipped": "node or /root/reference unavailable"}))
        return
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    groups = generate_groups(n, seed)
    ref = run_reference(groups)
    eng = run_engine(groups)
    mism, dangling = compare(groups, ref, eng)
    print(json.dumps({
        "n_schemas": n, "seed": seed,
        "n_cases": sum(len(g["cases"]) for g in groups),
        "mismatches": len(mism),
        "dangling_ref_timing_cases": dangling,
        "detail": mism[:10],
    }, indent=1, default=str))


if __name__ == "__main__":
    main()
