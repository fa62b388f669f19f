"""SCHEMA-COMPILE rejection differential: malformed schema DOCUMENTS
through node `new Schema(id, doc)` vs this engine's compile_rules,
comparing accept/reject (test/Schema.test.js's subject — every keyword
has wrong-typed variants the reference rejects at construction).

Run:  python scripts/schema_error_differential.py [seed]
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
const docs = JSON.parse(require('fs').readFileSync(0, 'utf8'));
const out = [];
for (const d of docs) {
  try { new lib.Schema('http://example.com/schema.json', d); out.push(true); }
  catch (e) { out.push(String(e.message).slice(0, 80)); }
}
console.log(JSON.stringify(out));
"""

BAD_VALUES = [True, 1, -1, 0.5, "x", [], [1], {}, {"k": 1}, None]

KEYWORDS = [
    "allOf", "anyOf", "oneOf", "not", "type", "required", "properties",
    "patternProperties", "additionalProperties", "unevaluatedProperties",
    "minProperties", "maxProperties", "items", "additionalItems",
    "minItems", "maxItems", "minLength", "maxLength", "pattern",
    "minimum", "maximum", "exclusiveMinimum", "exclusiveMaximum",
    "multipleOf", "enum", "if", "then", "else", "$defs", "definitions",
    "$anchor", "$id", "$ref", "$recursiveRef", "const", "title",
    "description",
]


def generate_docs(seed: int) -> list:
    rnd = random.Random(seed)
    docs: list = []
    for kw in KEYWORDS:
        for v in BAD_VALUES:
            docs.append({kw: v})
    # composites: a valid keyword next to a malformed one
    for _ in range(80):
        kw = rnd.choice(KEYWORDS)
        docs.append({"type": "string", kw: rnd.choice(BAD_VALUES)})
    # valid controls
    docs += [{"type": "string"}, {"minimum": 0}, {"items": {"type": "integer"}},
             {"properties": {"a": {}}}, True, False, {}]
    return docs


def run_reference(docs) -> list:
    with tempfile.NamedTemporaryFile("w", suffix=".js", delete=False) as f:
        f.write(NODE_HARNESS)
        harness = f.name
    try:
        p = subprocess.run(["node", harness], input=json.dumps(docs).encode(),
                           capture_output=True, timeout=300)
        if p.returncode != 0:
            raise RuntimeError(f"node harness failed: {p.stderr[:400]}")
        return json.loads(p.stdout)
    finally:
        Path(harness).unlink(missing_ok=True)


def run_engine(docs) -> list:
    from jsonschemaparse_spark import SchemaRegistry

    out = []
    for d in docs:
        try:
            SchemaRegistry().import_schema("http://example.com/schema.json", d)
            out.append(True)
        except Exception as e:  # noqa: BLE001
            out.append(str(e)[:80])
    return out


# keywords whose wrong-typed values the reference SILENTLY IGNORES (its
# scan is guarded by typeof checks with no else-throw) but this engine
# rejects — deliberate strictness, documented not copied: a typo'd $id or
# $anchor is an authoring error worth failing at submit, and standalone
# additionalItems is dead weight the reference never reads
ENGINE_STRICTER = {"$anchor", "$defs", "$id", "$recursiveRef", "additionalItems"}


def _classify(doc, r, e, counters) -> bool:
    """True if this row is a DOCUMENTED divergence class (counted)."""
    kws = set(doc) if isinstance(doc, dict) else set()
    if e is not True and r is True and kws & ENGINE_STRICTER:
        counters["engine_stricter"] = counters.get("engine_stricter", 0) + 1
        return True
    if (r is not True and e is True and "definitions" in kws
            and isinstance(doc.get("definitions"), dict)
            and not isinstance(doc.get("$defs"), dict)):
        # schema.js:643 copy-paste bug: the $defs else-branch re-checks
        # schema.definitions, so ANY definitions without an object $defs
        # throws — 'definitions' is unusable upstream; we implement the
        # intended draft-04 semantics
        counters["ref_defs_bug"] = counters.get("ref_defs_bug", 0) + 1
        return True
    return False


def compare(docs, ref, eng, counters: dict | None = None) -> list[dict]:
    counters = counters if counters is not None else {}
    mism = []
    for d, r, e in zip(docs, ref, eng):
        if (r is True) != (e is True):
            if _classify(d, r, e, counters):
                continue
            mism.append({"doc": d, "reference": r, "engine": e})
    return mism


def main() -> None:
    if shutil.which("node") is None or not REFERENCE.exists():
        print(json.dumps({"skipped": "node or /root/reference unavailable"}))
        return
    seed = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    docs = generate_docs(seed)
    counters: dict = {}
    mism = compare(docs, run_reference(docs), run_engine(docs), counters)
    print(json.dumps({"n_docs": len(docs), "seed": seed,
                      "mismatches": len(mism), "counters": counters,
                      "detail": mism[:20]},
                     indent=1, default=str))


if __name__ == "__main__":
    main()
