"""Rule compiler: JSON-Schema-style dict -> CompiledSchema trie.

Re-implements the *normalization contract* of the reference's ``Schema``
constructor (/root/reference/lib/schema.js:227-741) and ``SchemaRegistry``
(schema.js:32-207) as plain picklable Python dataclass-ish objects, so the
compiled trie can be broadcast to Spark executors once and evaluated either

* vectorized, as Catalyst ``Column`` expressions (plans/kernels.py), or
* per-document inside Arrow batches (schema/evaluate.py via mapInPandas).

Design differences from the reference (deliberate, Spark-first):
- compile happens once on the driver; no laziness except $ref targets
  (resolved through the registry at evaluate time, cycle-safe);
- boolean schemas canonicalized exactly like schema.js:234-240
  (false -> {"type": []}, true -> {});
- keywords the reference leaves unsupported — ``contains`` (schema.js:449),
  ``propertyNames`` (schema.js:709), ``uniqueItems`` (schema.js:714) — ARE
  compiled here; evaluation gates them behind ``extensions=True``.
"""

from __future__ import annotations

import json
import re
from typing import Any, Optional
from urllib.parse import urljoin

from ..errors import SchemaError

TYPE_VALUES = ("number", "integer", "string", "boolean", "null", "object", "array")

# Keywords the reference knows about (schema.js:666-726 `known` table);
# anything else lands in `unknown` rather than erroring.
KNOWN_KEYWORDS = frozenset(
    [
        "$schema", "$vocabulary", "$id", "$anchor", "$ref", "$recursiveRef",
        "$recursiveAnchor", "$comment", "$defs", "definitions", "title",
        "description", "default", "deprecated", "readOnly", "writeOnly",
        "examples", "type", "enum", "const", "multipleOf", "maximum",
        "exclusiveMaximum", "minimum", "exclusiveMinimum", "maxLength",
        "minLength", "pattern", "additionalItems", "items", "maxItems",
        "minItems", "uniqueItems", "contains", "maxContains", "minContains",
        "maxProperties", "minProperties", "required", "properties",
        "patternProperties", "additionalProperties", "propertyNames",
        "unevaluatedItems", "unevaluatedProperties", "dependentSchemas",
        "dependentRequired", "if", "then", "else", "allOf", "anyOf", "oneOf",
        "not", "format", "contentEncoding", "contentMediaType",
        "contentSchema", "links", "extends", "dependencies", "disallow",
    ]
)


def _is_schema(s: Any) -> bool:
    """schema.js:12-14: object (non-array) or boolean."""
    return isinstance(s, bool) or isinstance(s, dict)


def _canonicalize(schema: Any) -> dict:
    """Boolean-schema canonicalization (schema.js:234-240)."""
    if schema is True:
        return {}
    if schema is False:
        return {"type": []}
    if not isinstance(schema, dict):
        raise SchemaError("Expected a valid schema (object or boolean)")
    return schema


def enum_key(v: Any):
    """Hashable identity key with JS SameValueZero semantics:
    1 === 1.0, but true !== 1 and '1' !== 1 (SURVEY.md §4.3-3)."""
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, (int, float)):
        return ("n", float(v))
    if isinstance(v, str):
        return ("s", v)
    if v is None:
        return ("z",)
    return ("o", repr(v))


class SchemaRegistry:
    """URI -> CompiledSchema map with $id/$anchor registration and $ref
    resolution incl. JSON-pointer fragments (schema.js:32-207)."""

    def __init__(self) -> None:
        self.schemas: dict[str, "CompiledSchema"] = {}
        self.sources: dict[str, Any] = {}
        # every base URI referenced by a $ref/$recursiveRef seen during
        # compilation — getUnresolved()'s input (schema.js seen set)
        self.seen: set[str] = set()
        # import-level maps keyed by the IMPORT URI with the ORIGINAL
        # schema object (r4 review: sources[] is keyed by the resolved $id
        # and holds the canonicalized form, so booleans and $id-divergent
        # schemas failed the idempotent-re-import contract)
        self._import_sources: dict[str, Any] = {}
        self._imports: dict[str, "CompiledSchema"] = {}

    def import_schema(self, uri: str, schema: Any) -> "CompiledSchema":
        if not isinstance(uri, str) or ":" not in uri:
            raise SchemaError("`base` must be a URI string")
        if not _is_schema(schema):
            raise SchemaError("Expected a schema (object or boolean)")
        key = uri[:-1] if uri.endswith("#") else uri
        if key in self._import_sources:
            # reference import idempotence (schema.js:64-76): an identical
            # re-import returns the PREVIOUS instance; a different
            # definition under the same URI is an error. Identity is the
            # serialized ORIGINAL form, like JSON.stringify — booleans and
            # $id-divergent schemas included. The stored side is a
            # SNAPSHOT taken at import time (ADVICE r4: storing the live
            # object let a caller's later mutation corrupt the check).
            if self._import_sources[key] != json.dumps(schema):
                raise SchemaError("Schema already defined: <" + key + ">")
            return self._imports[key]
        compiled = CompiledSchema(uri, schema, self)
        self._import_sources[key] = json.dumps(schema)
        self._imports[key] = compiled
        return compiled

    def get_unresolved(self) -> list[str]:
        """Base URIs referenced by some $ref but never imported —
        registry.getUnresolved() (schema.js:219-223). Lets callers reject
        incomplete registries at submit time (the eager twin of
        Evaluator._check_ref_closure)."""
        return sorted(
            u for u in self.seen
            if u not in self.sources and u not in self.schemas
            and u not in self._import_sources
        )

    def register(self, uri: str, compiled: "CompiledSchema") -> None:
        uri = uri.rstrip("#") if uri.endswith("#") else uri
        old = self.schemas.get(uri)
        if old is not None and old.raw is not compiled.raw:
            raise SchemaError("Schema already defined: <" + uri + ">")
        self.schemas[uri] = compiled

    def lookup(self, uri: str) -> "CompiledSchema":
        if not isinstance(uri, str):
            raise SchemaError("`id` must be a string")
        uri = uri[:-1] if uri.endswith("#") else uri
        hit = self.schemas.get(uri)
        if hit is not None:
            return hit
        # JSON-pointer fragment descent against a registered source document
        # (schema.js:183-205).
        base, _, frag = uri.partition("#")
        src = self.sources.get(base)
        if src is not None and frag.startswith("/"):
            node = src
            for part in frag.split("/")[1:]:
                part = part.replace("~1", "/").replace("~0", "~")
                if isinstance(node, list):
                    node = node[int(part)]
                elif isinstance(node, dict) and part in node:
                    node = node[part]
                else:
                    raise SchemaError("Could not resolve schema <" + uri + ">")
            compiled = CompiledSchema(uri, node, self)
            self.schemas[uri] = compiled
            return compiled
        raise SchemaError("Could not resolve schema " + repr(uri))


def _resolve_uri(base: str, ref: str) -> str:
    if ref.startswith("#"):
        return base.split("#", 1)[0] + ref
    return urljoin(base, ref)


class CompiledSchema:
    """Normalized constraint set for one schema node.

    Field-for-field analog of the reference Schema's normalized fields
    (allow*, required Set, patternPropertiesRegExp, enumLiterals/enumSchemas,
    const* — schema.js:306-741), picklable for Spark broadcast.
    """

    def __init__(self, id: str, schema: Any, registry: Optional[SchemaRegistry] = None):
        if not isinstance(id, str):
            raise SchemaError("Expected `id` to be a string")
        if ">" in id or " " in id:
            raise SchemaError("Illegal character in `id`: " + id)
        if not _is_schema(schema):
            raise SchemaError("Expected a valid schema (object or boolean)")
        raw = _canonicalize(schema)
        self.raw = raw
        self.registry = registry if registry is not None else SchemaRegistry()

        # --- $id / $anchor (schema.js:107-115) ---
        if "$id" in raw:
            if not isinstance(raw["$id"], str):
                raise SchemaError("Expected `$id` to be a string")
            id = _resolve_uri(id, raw["$id"])
        self.id = id
        self.registry.register(id, self)
        if self.id.split("#", 1)[0] and "#" not in self.id:
            self.registry.sources.setdefault(self.id, raw)
        if "$anchor" in raw:
            if not isinstance(raw["$anchor"], str):
                raise SchemaError("Expected `$anchor` to be a string")
            self.registry.register(
                _resolve_uri(self.id, "#" + raw["$anchor"]), self
            )
        self.recursive_anchor = raw.get("$recursiveAnchor") is True

        sub = self._sub  # shorthand

        # --- combinators (schema.js:272-302) ---
        self.all_of = self._sublist(raw, "allOf", 'Expected "allOf" to be an array of schemas')
        self.any_of = self._sublist(raw, "anyOf", 'Expected "anyOf" to be an array of schemas')
        self.one_of = self._sublist(raw, "oneOf", 'Expected "oneOf" to be an array of schemas')
        # empty anyOf/oneOf are PRESENT and unsatisfiable in the reference
        # (finish() filters an empty branch list -> 0 valid -> error,
        # schema.js:1379-1393); track presence separately from the lists
        self.has_any_of = "anyOf" in raw
        self.has_one_of = "oneOf" in raw
        if "not" in raw:
            if not _is_schema(raw["not"]):
                raise SchemaError('Expected "not" to be a schema')
            self.not_ = sub(raw["not"], "not")
        else:
            self.not_ = None

        # --- type (schema.js:306-343) ---
        t = raw.get("type")
        if t is None and "type" not in raw:
            allow = dict.fromkeys(
                ("number", "fraction", "string", "boolean", "null", "object", "array"),
                True,
            )
        elif isinstance(t, str):
            if t not in TYPE_VALUES:
                raise SchemaError('Unknown "type" value: ' + repr(t))
            allow = {
                "number": t in ("number", "integer"),
                "fraction": t == "number",
                "string": t == "string",
                "boolean": t == "boolean",
                "null": t == "null",
                "object": t == "object",
                "array": t == "array",
            }
        elif isinstance(t, list):
            for v in t:
                if v not in TYPE_VALUES:
                    raise SchemaError('Unknown "type" value: ' + repr(v))
            allow = {
                "number": "number" in t or "integer" in t,
                "fraction": "number" in t,
                "string": "string" in t,
                "boolean": "boolean" in t,
                "null": "null" in t,
                "object": "object" in t,
                "array": "array" in t,
            }
        else:
            raise SchemaError('Unexpected value for "type" keyword (expected string or array)')
        self.allow_number = allow["number"]
        self.allow_fraction = allow["fraction"]
        self.allow_string = allow["string"]
        self.allow_boolean = allow["boolean"]
        self.allow_null = allow["null"]
        self.allow_object = allow["object"]
        self.allow_array = allow["array"]
        # exact order of schema.js:336-342
        self.allowed_types = [
            name
            for name, ok in (
                ("array", self.allow_array),
                ("object", self.allow_object),
                ("string", self.allow_string),
                ("number", self.allow_number),
                ("boolean", self.allow_boolean),
                ("null", self.allow_null),
            )
            if ok
        ]

        # --- object keywords ---
        req = raw.get("required")
        if req is not None:
            if not isinstance(req, list):
                raise SchemaError('Expected array for "required"')
            for k in req:
                if not isinstance(k, str):
                    raise SchemaError('Expected "required" to be an array of strings')
            # order-preserving dedupe: the reference stores required in a
            # Set built in DECLARATION order (schema.js:807) and reports
            # missing keys in that order (Array.from, schema.js:1323)
            self.required: Optional[tuple] = tuple(dict.fromkeys(req))
        else:
            self.required = None

        props = raw.get("properties")
        if props is not None:
            if not isinstance(props, dict):
                raise SchemaError('Expected "properties" to be an object')
            self.properties = {k: sub(v, "properties/" + k) for k, v in props.items()}
        else:
            self.properties = {}

        pprops = raw.get("patternProperties")
        self.pattern_properties: list[tuple[str, Any, CompiledSchema]] = []
        if pprops is not None:
            if not isinstance(pprops, dict):
                raise SchemaError('Expected "patternProperties" to be an object')
            for p, v in pprops.items():
                self.pattern_properties.append(
                    (p, _compile_regex(p), sub(v, "patternProperties/" + p))
                )

        ap = raw.get("additionalProperties")
        if ap is not None:
            if not _is_schema(ap):
                raise SchemaError('Expected "additionalProperties" to be a schema')
            self.additional_properties: Optional[CompiledSchema] = sub(ap, "additionalProperties")
        else:
            self.additional_properties = None

        up = raw.get("unevaluatedProperties")
        self.unevaluated_properties = sub(up, "unevaluatedProperties") if up is not None else None

        ui = raw.get("unevaluatedItems")  # items twin of the evaluated-set
        self.unevaluated_items = sub(ui, "unevaluatedItems") if ui is not None else None

        pn = raw.get("propertyNames")  # extension: unsupported in reference (schema.js:709)
        self.property_names = sub(pn, "propertyNames") if pn is not None else None

        # extensions: in the reference's known table but disabled in its
        # suite run (test/schema-suite.test.js:33-34)
        dr = raw.get("dependentRequired")
        self.dependent_required: dict[str, list[str]] = {}
        if dr is not None:
            if not isinstance(dr, dict):
                raise SchemaError('Expected "dependentRequired" to be an object')
            for key, reqs in dr.items():
                if not isinstance(reqs, list) or any(not isinstance(r, str) for r in reqs):
                    raise SchemaError('Expected "dependentRequired" values to be arrays of strings')
                self.dependent_required[key] = list(reqs)
        ds = raw.get("dependentSchemas")
        self.dependent_schemas: dict[str, CompiledSchema] = {}
        if ds is not None:
            if not isinstance(ds, dict):
                raise SchemaError('Expected "dependentSchemas" to be an object')
            for key, s in ds.items():
                if not _is_schema(s):
                    raise SchemaError('Expected "dependentSchemas" values to be schemas')
                self.dependent_schemas[key] = sub(s, "dependentSchemas/" + key)

        self.min_properties = _num_kw(raw, "minProperties")
        self.max_properties = _num_kw(raw, "maxProperties")

        # --- array keywords (schema.js:415-449) ---
        items = raw.get("items")
        self.items_tuple: Optional[list[CompiledSchema]] = None
        self.items_all: Optional[CompiledSchema] = None
        if isinstance(items, list):
            self.items_tuple = [sub(s, f"items/{i}") for i, s in enumerate(items)]
        elif items is not None:
            if not _is_schema(items):
                raise SchemaError('Expected "items" to be a schema or array of schemas')
            self.items_all = sub(items, "items")
        ai = raw.get("additionalItems")
        self.additional_items = sub(ai, "additionalItems") if ai is not None else None
        self.min_items = _num_kw(raw, "minItems")
        self.max_items = _num_kw(raw, "maxItems")
        cont = raw.get("contains")  # extension (reference declares, never checks)
        self.contains = sub(cont, "contains") if cont is not None else None
        self.min_contains = _num_kw(raw, "minContains")
        self.max_contains = _num_kw(raw, "maxContains")
        self.unique_items = raw.get("uniqueItems") is True  # extension

        # --- string keywords (schema.js:454-481) ---
        self.min_length = _num_kw(raw, "minLength")
        self.max_length = _num_kw(raw, "maxLength")
        pat = raw.get("pattern")
        if pat is not None:
            if not isinstance(pat, str):
                raise SchemaError('Expected "pattern" to be a string')
            self.pattern: Optional[str] = pat
            self.pattern_regex = _compile_regex(pat)
        else:
            self.pattern = None
            self.pattern_regex = None
        self.format = raw.get("format")  # parsed, never enforced (parity)

        # --- numeric keywords (schema.js:486-531) ---
        self.maximum = _num_kw(raw, "maximum", float_ok=True)
        self.minimum = _num_kw(raw, "minimum", float_ok=True)
        self.exclusive_maximum = _num_kw(raw, "exclusiveMaximum", float_ok=True)
        self.exclusive_minimum = _num_kw(raw, "exclusiveMinimum", float_ok=True)
        self.multiple_of = _num_kw(raw, "multipleOf", float_ok=True)
        if self.multiple_of is not None and self.multiple_of <= 0:
            raise SchemaError('Expected "multipleOf" to be a positive number')

        # --- enum (schema.js:535-550) ---
        self.enum_literals: Optional[set] = None
        self.enum_schemas: Optional[list[CompiledSchema]] = None
        ev = raw.get("enum")
        if ev is not None or "enum" in raw:
            if not isinstance(ev, list):
                raise SchemaError("enum must be an array")
            self.enum_literals = set()
            self.enum_schemas = []
            self.enum_values = ev
            # scalar subset in declaration order: the reference reports
            # enumLiterals (the scalar Set, containers excluded) as the
            # error's expected value (schema.js:540-545, 889/947/969/986)
            self.enum_scalars: list = []
            for i, v in enumerate(ev):
                if isinstance(v, (str, bool)) or v is None or isinstance(v, (int, float)):
                    if enum_key(v) not in self.enum_literals:
                        self.enum_scalars.append(v)
                    self.enum_literals.add(enum_key(v))
                else:
                    self.enum_schemas.append(sub({"const": v}, f"enum/{i}"))

        # --- const (schema.js:553-586) ---
        self.const_type: Optional[str] = None
        self.const_value: Any = None
        self.has_const = "const" in raw
        self.const_length: Optional[int] = None
        self.const_properties: Optional[dict[str, CompiledSchema]] = None
        self.const_items: Optional[list[CompiledSchema]] = None
        if self.has_const:
            cv = raw["const"]
            self.const_value = cv
            if isinstance(cv, list):
                self.const_type = "array"
                self.const_length = len(cv)
                self.const_items = [sub({"const": item}, f"const/{i}") for i, item in enumerate(cv)]
            elif isinstance(cv, bool):
                self.const_type = "boolean"
            elif isinstance(cv, dict):
                self.const_type = "object"
                self.const_length = len(cv)
                self.const_properties = {k: sub({"const": v}, "const/" + k) for k, v in cv.items()}
            elif isinstance(cv, str):
                self.const_type = "string"
                self.const_length = len(cv)
            elif isinstance(cv, (int, float)):
                self.const_type = "number"
            elif cv is None:
                self.const_type = "null"

        # --- if/then/else (schema.js:589-606) ---
        for kw in ("if", "then", "else"):
            v = raw.get(kw)
            if v is not None and not _is_schema(v):
                raise SchemaError("`%s` must be a schema`" % kw)
        self.if_ = sub(raw["if"], "if") if _is_schema(raw.get("if")) else None
        self.then_ = sub(raw["then"], "then") if _is_schema(raw.get("then")) else None
        self.else_ = sub(raw["else"], "else") if _is_schema(raw.get("else")) else None

        # --- $ref / $recursiveRef (schema.js:609-631) ---
        self.ref: Optional[str] = None
        if "$ref" in raw:
            if not isinstance(raw["$ref"], str):
                raise SchemaError("Expected `$ref` to be a string")
            self.ref = _resolve_uri(self.id, raw["$ref"])
            registry.seen.add(self.ref.partition("#")[0] or self.id.partition("#")[0])
        self.recursive_ref: Optional[str] = None
        if "$recursiveRef" in raw:
            if raw["$recursiveRef"] != "#":
                raise SchemaError('Expected "$recursiveRef" to be "#"')
            self.recursive_ref = self.id.split("#", 1)[0]

        # --- $defs / definitions: registry entries (schema.js:634-645);
        # kept for the Schema#subschemas introspection surface too ---
        self.defs_schemas: list = []
        for defs_kw in ("$defs", "definitions"):
            if defs_kw in raw:
                d = raw[defs_kw]
                if not isinstance(d, dict):
                    # explicit null / wrong type rejected ('definitions'
                    # itself is UNUSABLE in the reference — schema.js:643
                    # re-checks schema.definitions in the $defs else-branch,
                    # a copy-paste bug that throws for ANY definitions
                    # without an object $defs; we implement the intended
                    # draft-04 semantics, documented not copied)
                    raise SchemaError('Expected "%s" to be an object' % defs_kw)
                for k, v in d.items():
                    self.defs_schemas.append(sub(v, f"{defs_kw}/{k}"))

        # --- annotations ---
        self.title = raw.get("title")
        self.description = raw.get("description")
        self.default = raw.get("default")

        # --- explicit-null keyword values are INVALID schema documents
        # (r4 schema-error differential vs node: the reference rejects
        # null for every structural keyword; raw.get() used to treat it
        # as absent) ---
        # exactly the reference's throw set (probed): properties/
        # additionalItems/not tolerate null there, these do not
        for _kw in ("allOf", "anyOf", "oneOf", "required",
                    "patternProperties", "additionalProperties",
                    "unevaluatedProperties", "items",
                    "pattern", "if", "then", "else"):
            if _kw in raw and raw[_kw] is None:
                raise SchemaError(
                    'Expected "%s" to be a schema or keyword value, got null'
                    % _kw)

        # --- unknown keyword collection (schema.js:666-726) ---
        self.unknown = {k: v for k, v in raw.items() if k not in KNOWN_KEYWORDS}

    # helpers -------------------------------------------------------------
    @property
    def subschemas(self) -> list:
        """Direct child schema nodes in the reference's scan order
        (Schema#subschemas — schema.js:261-269 addSubschema sites: allOf,
        anyOf, oneOf, not, properties, patternProperties, additional/
        unevaluatedProperties, items, additionalItems, if/then/else,
        definitions/$defs). Boolean-schema positions are excluded like
        the reference (it canonicalizes before scanning)."""
        out: list = []
        out.extend(self.all_of)
        out.extend(self.any_of)
        out.extend(self.one_of)
        if self.not_ is not None:
            out.append(self.not_)
        out.extend(self.properties.values())
        out.extend(p for _, _, p in self.pattern_properties)
        out.append(self.additional_properties)
        out.append(self.unevaluated_properties)
        if self.items_tuple is not None:
            out.extend(self.items_tuple)
        elif self.items_all is not None:
            out.append(self.items_all)
        out.append(self.additional_items)
        out.append(self.if_)
        out.append(self.then_)
        out.append(self.else_)
        out.extend(getattr(self, "defs_schemas", []))
        return [c for c in out if isinstance(c, CompiledSchema)]

    @property
    def all_subschemas(self) -> list:
        """Transitive subschemas, depth-first like Schema#allSubschemas
        (each child followed by its own allSubschemas)."""
        out: list = []
        for c in self.subschemas:
            out.append(c)
            out.extend(c.all_subschemas)
        return out

    @property
    def references(self) -> list:
        """Absolute $ref URIs at THIS node (Schema#references)."""
        return [self.ref] if self.ref is not None else []

    @property
    def all_references(self) -> list:
        """Transitive $ref URIs, first-seen order, deduplicated
        (Schema#allReferences, schema.js:728-738)."""
        out = list(self.references)
        for c in self.all_subschemas:
            for r in c.references:
                if r not in out:
                    out.append(r)
        return out

    def _sub(self, schema: Any, path: str) -> "CompiledSchema":
        from urllib.parse import quote

        frag = "#" if "#" not in self.id else ""
        # derived ids must stay legal URIs even when property names carry
        # spaces/'>' etc. — percent-encode the path segments (the illegal-
        # character guard is for USER-supplied $ids, schema.js:248-250)
        sub_id = self.id + frag + "/" + quote(path, safe="/$")
        return CompiledSchema(sub_id, schema, self.registry)

    def _sublist(self, raw: dict, kw: str, msg: str) -> list["CompiledSchema"]:
        v = raw.get(kw)
        if v is None:
            return []
        if not isinstance(v, list):
            raise SchemaError(msg)
        for s in v:
            if not _is_schema(s):
                raise SchemaError(msg)
        return [self._sub(s, f"{kw}/{i}") for i, s in enumerate(v)]

    def resolve_ref(self) -> "CompiledSchema":
        assert self.ref is not None
        return self.registry.lookup(self.ref)

    def recursive_anchor_root(self) -> "CompiledSchema":
        """The dynamic base this $recursiveAnchor establishes. The reference
        stores the anchored schema's id and later uriResolve(base, '#')
        strips any fragment (schema.js:1066, 1125-1127), so an anchored
        SUBSCHEMA without its own $id donates its enclosing resource ROOT
        as the recursion target — not itself. Falls back to self when the
        fragmentless id isn't registered (anonymous root schemas)."""
        base = self.id.split("#", 1)[0]
        try:
            return self.registry.lookup(base)
        except SchemaError:
            return self

    def __repr__(self) -> str:  # pragma: no cover
        return f"CompiledSchema(<{self.id}>)"

    # Default pickling carries the whole object graph (registry dicts give
    # pickle-memo cycle handling; re.Pattern objects pickle via copyreg), so
    # the compiled trie can be broadcast / captured in UDF closures as-is.


def _num_kw(raw: dict, kw: str, float_ok: bool = False) -> Optional[float]:
    if kw not in raw:
        return None
    v = raw.get(kw)
    if isinstance(v, bool) or not isinstance(v, (int, float)):
        raise SchemaError('Expected "%s" to be a number' % kw)
    if not float_ok and (v != int(v) or v < 0):
        raise SchemaError('Expected "%s" to be a non-negative integer' % kw)
    return v


_ECMA_ONLY = re.compile(r"\\[pP]\{|\(\?<[=!]|\\u\{")


def _compile_regex(pattern: str):
    """ECMAScript-flavored pattern -> Python re (SURVEY.md §4.3-1).

    Python `re` is the closest dialect available on executors; constructs it
    can't take are translated minimally (\\u{...} -> \\x{...} form, \\p{...}
    passes through via the `regex` module if installed, else best effort).
    """
    translated = pattern
    # ECMAScript \uXXXX is supported by Python via \uXXXX already.
    # \u{XXXXX} (u-flag form) -> \UXXXXXXXX
    def _u_brace(m: "re.Match[str]") -> str:
        return "\\U%08x" % int(m.group(1), 16)

    translated = re.sub(r"\\u\{([0-9a-fA-F]+)\}", _u_brace, translated)
    # ECMAScript '$' (no m-flag) matches ONLY at end of string; Python's '$'
    # also matches before a final newline. Rewrite unescaped '$' outside
    # character classes to '\Z' (Python's end-of-string-only anchor) — the
    # same parity fix the JVM path applies via rlike_pattern ('$' -> '\z').
    out: list[str] = []
    in_class = esc = False
    for ch in translated:
        if esc:
            out.append(ch)
            esc = False
        elif ch == "\\":
            out.append(ch)
            esc = True
        elif in_class:
            out.append(ch)
            in_class = ch != "]"
        elif ch == "[":
            out.append(ch)
            in_class = True
        elif ch == "$":
            out.append("\\Z")
        else:
            out.append(ch)
    translated = "".join(out)
    # ECMAScript allows unescaped '/' and some constructs map 1:1.
    try:
        return re.compile(translated)
    except re.error:
        # \p{...} property classes etc.: the third-party `regex` module
        # implements them with Unicode semantics close to ECMAScript-u
        try:
            import regex as regex_mod

            return regex_mod.compile(translated)
        except Exception as e:  # noqa: BLE001
            raise SchemaError(f"Unsupported pattern {pattern!r}: {e}") from e


def compile_rules(
    rules: Any, base: str = "vnd.rules:", registry: Optional[SchemaRegistry] = None
) -> CompiledSchema:
    """Public entry point: dict/bool -> CompiledSchema.

    Analog of ``new Schema('vnd.schema:', schema)`` at parse.js:155-163.
    """
    if registry is None:
        registry = SchemaRegistry()
    return registry.import_schema(base, rules)
