"""Instance evaluator over the CompiledSchema trie.

Re-expresses the reference's ValidateLayer event machinery
(/root/reference/lib/schema.js:1023-1417) as a recursive walk over an
already-parsed JSON value. The reference evaluates speculative combinator
branches against one event stream; here the "event stream" is the value tree
itself, walked once, with combinator branches evaluated on the same node and
reduced exactly like ValidateLayer.finish (schema.js:1342-1417).

Error MESSAGE/keyword strings are verbatim from exportRules
(schema.js:751-1008) — report parity is graded (SURVEY.md §4.3-5/6).

This module is pure Python and picklable; plans/json_validator.py ships it
to executors inside Arrow-batched mapInPandas. It is the reference-parity
slow path; typed columns go through plans/kernels.py (Catalyst expressions).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Optional

from ..errors import AnnotationRecord, ValidationRecord, expected_type
from .compiler import CompiledSchema, enum_key

_MAX_REF_DEPTH = 64


def json_type(value: Any) -> str:
    if isinstance(value, bool):
        return "boolean"
    if isinstance(value, (int, float)):
        return "number"
    if isinstance(value, str):
        return "string"
    if value is None:
        return "null"
    if isinstance(value, dict):
        return "object"
    if isinstance(value, list):
        return "array"
    raise TypeError(f"not a JSON value: {type(value)}")


def _is_multiple(n: float, k: float) -> bool:
    """JS `n / k % 1` with IEEE-754 float semantics (schema.js:937,
    SURVEY.md §4.3-10): do NOT 'improve' with Decimal."""
    try:
        return math.fmod(float(n) / float(k), 1.0) == 0.0
    except (OverflowError, ZeroDivisionError):
        return False


class Evaluator:
    """One validation pass: validate(value) -> (errors, annotations).

    extensions=True additionally enforces keywords the reference declares
    but does not implement (contains, propertyNames, uniqueItems in-row)
    — schema.js:449, 709, 714.
    """

    def __init__(self, extensions: bool = False, annotations: bool = False,
                 enforce_formats: bool = False, reference_quirks: bool = False):
        self.extensions = extensions
        self.collect_annotations = annotations
        self.enforce_formats = enforce_formats
        # reference_quirks=True reproduces the reference's report BUG-FOR-BUG
        # (VERDICT r3 #5) — the two emission quirks this engine deliberately
        # does not copy by default, both pinned by EXECUTING the reference:
        # 1. item-0 path drop: errors inside the first array element omit
        #    the '0' segment (/b/z, while item 2 gets /b/2/z) — the layer
        #    path is not yet incremented when item 0's layer is built;
        # 2. finish-cascade duplication: parse.js pop() calls finish() on
        #    EVERY validator in the layer's getAll() list, and each finish
        #    re-finishes all its descendants (schema.js:1342-1349), so
        #    finish-class rows (anyOf/oneOf/not; then/else + unevaluated
        #    imports) are re-pushed per execution — 2^k under k nested
        #    allOf/$ref layers, x6 for then-under-allOf, etc. allOf/$ref
        #    sublayers alias their parent's errors array (schema.js:1049-
        #    1058 root.errors), which _val_quirks simulates exactly.
        # Off by default: deduped single-emission reports.
        self.reference_quirks = reference_quirks
        self._quirk_import_rows: Optional[list] = None

    def validate(
        self, schema: CompiledSchema, value: Any, path: str = ""
    ) -> tuple[list[ValidationRecord], list[AnnotationRecord]]:
        self._check_ref_closure(schema)
        if self.reference_quirks:
            # annotations are not modelled in quirk mode (report parity only)
            return self._val_quirks(schema, value, path, None, 0), []
        annotations: list[AnnotationRecord] = []
        errors = self._val(schema, value, path, annotations, None, 0)
        return errors, annotations

    def _check_ref_closure(self, schema: CompiledSchema) -> None:
        """Fail fast on dangling $refs: resolve every $ref reachable from
        the schema once, up front, and raise SchemaError before touching a
        single row. Memoized on the schema object; cycle-safe.

        Reference timing differs by DESIGN here, strictly for broken
        schemas: the reference errors lazily, at layer construction —
        combinator-position refs on every instance (schema.js:1077-1131),
        property-position refs only when that key appears in the instance
        (initProperty, all branches in parallel). Which rows 'work' under a
        schema with a dangling ref is load-order happenstance, and the
        reference itself exposes registry.getUnresolved() (schema.js:219-223)
        so callers can reject eagerly; at 10^12 rows a config error must
        kill the job at submit, not hours in. The randomized reference
        differential classifies this as a documented timing difference
        (scripts/reference_differential.py `dangling_timing`)."""
        if getattr(schema, "_jsp_refs_checked", False):
            return
        seen: set[int] = set()
        stack = [schema]
        while stack:
            s = stack.pop()
            if id(s) in seen:
                continue
            seen.add(id(s))
            subs = [*s.all_of, *s.any_of, *s.one_of]
            for c in (s.not_, s.if_, s.then_, s.else_, s.additional_properties,
                      s.property_names, s.unevaluated_properties, s.items_all,
                      s.additional_items, s.contains, s.unevaluated_items):
                if c is not None and not isinstance(c, bool):
                    subs.append(c)
            subs.extend(s.properties.values())
            subs.extend(p for _, _, p in s.pattern_properties)
            if s.items_tuple:
                subs.extend(s.items_tuple)
            if s.dependent_schemas:
                subs.extend(s.dependent_schemas.values())
            if s.enum_schemas:
                subs.extend(s.enum_schemas)
            if s.const_properties:
                subs.extend(s.const_properties.values())
            if s.const_items:
                subs.extend(s.const_items)
            if s.ref is not None:
                subs.append(s.resolve_ref())  # raises SchemaError if dangling
            stack.extend(subs)
        schema._jsp_refs_checked = True

    # ------------------------------------------------------------------
    def _val(
        self,
        schema: CompiledSchema,
        value: Any,
        path: str,
        annotations: list[AnnotationRecord],
        recursive_base: Optional[CompiledSchema],
        depth: int,
        quirk_local: bool = False,
    ) -> list[ValidationRecord]:
        # quirk_local=True (reference_quirks mode only): emit this node's
        # event-time rows, but skip the combinator/in-place-applicator
        # section — those become _QNode children whose emission the finish
        # cascade simulation owns (_val_quirks).
        if depth > _MAX_REF_DEPTH:
            raise RecursionError(f"$ref depth > {_MAX_REF_DEPTH} at <{schema.id}>")
        errors: list[ValidationRecord] = []
        err = errors.append
        sid = schema.id
        t = json_type(value)

        # dynamic scope for $recursiveRef (schema.js:1060-1072): the FIRST
        # anchor in dynamic scope wins, and it donates its enclosing
        # resource ROOT (fragment-stripped id), not the subschema itself
        if schema.recursive_anchor and recursive_base is None:
            recursive_base = schema.recursive_anchor_root()

        def E(message: str, keyword: str, expected: Any = None, actual: Any = None):
            err(
                ValidationRecord(
                    message=message, path=path, keyword=keyword,
                    constraint_id=sid, expected=expected, actual=actual,
                )
            )

        # --- start-event type checks (schema.js:776-781 etc.) ---
        if not getattr(schema, "allow_" + ("number" if t == "number" else t)):
            E(expected_type(t, schema.allowed_types), "type", schema.allowed_types, t)
        if schema.const_type is not None and schema.const_type != t:
            E(expected_type(t, [schema.const_type]), "const", schema.const_type, t)
            # the reference ALSO runs the end-event const equality check on
            # type mismatch (constValue is type-strict JS !==) — emitted
            # below in the per-type sections (r3 report-parity fix)

        # --- per-type keywords ---
        if t == "object":
            errors.extend(self._object_keywords(schema, value, path, E, annotations, recursive_base, depth))
        elif t == "array":
            errors.extend(self._array_keywords(schema, value, path, E, annotations, recursive_base, depth))
        elif t == "string":
            n = len(value)  # Python len == code points (SURVEY.md §4.3-2)
            if schema.min_length is not None and n < schema.min_length:
                E("String too short", "minLength", schema.min_length, n)
            if schema.max_length is not None and n > schema.max_length:
                E("String too long", "maxLength", schema.max_length, n)
            if schema.pattern_regex is not None and not schema.pattern_regex.search(value):
                # search-not-match semantics (RegExp.test, schema.js:884)
                E("String does not match /" + schema.pattern + "/", "pattern", schema.pattern)
            if schema.enum_literals is not None and enum_key(value) not in schema.enum_literals:
                E("String does not match one of the enumerated values", "enum", schema.enum_scalars)
            if schema.has_const and not (
                schema.const_type == "string" and schema.const_value == value
            ):
                # fires for non-string consts too (JS constValue!==str,
                # schema.js:892-894)
                E("String does not match constant", "const", schema.const_value, value)
            if self.enforce_formats and schema.format is not None:
                from ..functions.formats import format_ok

                if not format_ok(schema.format, value):
                    E(f"String does not match format {schema.format!r}",
                      "format", schema.format, value)
        elif t == "number":
            n = value
            if schema.has_const and not (
                schema.const_type == "number"
                and not isinstance(schema.const_value, bool)
                and float(schema.const_value) == float(n)
            ):
                # fires for non-number consts too (schema.js:910-912)
                E("const number mismatch", "const", schema.const_value, n)
            if schema.exclusive_minimum is not None and n <= schema.exclusive_minimum:
                E("Number under minimum", "exclusiveMinimum", schema.exclusive_minimum, n)
            if schema.minimum is not None and n < schema.minimum:
                E("Number under/equal to minimum", "minimum", schema.minimum, n)
            if schema.exclusive_maximum is not None and n >= schema.exclusive_maximum:
                E("Number under maximum", "exclusiveMaximum", schema.exclusive_maximum, n)
            if schema.maximum is not None and n > schema.maximum:
                E("Number under/equal to maximum", "maximum", schema.maximum, n)
            if schema.multiple_of is not None and not _is_multiple(n, schema.multiple_of):
                E("Number not multiple of", "multipleOf", schema.multiple_of, n)
            if schema.allow_number and not schema.allow_fraction and math.fmod(float(n), 1.0):
                E("Expected an integer", "type",
                  schema.allowed_types[0] if len(schema.allowed_types) == 1
                  else schema.allowed_types, "integer")
            if schema.enum_literals is not None and enum_key(
                float(n) if not isinstance(n, bool) else n
            ) not in schema.enum_literals:
                E("Number does not match one of the enumerated values", "enum", schema.enum_scalars)
        elif t == "boolean":
            if schema.has_const and not (
                schema.const_type == "boolean" and schema.const_value is value
            ):
                # fires for non-boolean consts too (schema.js:962-964)
                E("const mismatch", "const", schema.const_value, value)
            if schema.enum_literals is not None and enum_key(value) not in schema.enum_literals:
                E("Boolean does not match one of the enumerated values", "enum", schema.enum_scalars)
        elif t == "null":
            if schema.enum_literals is not None and enum_key(None) not in schema.enum_literals:
                E("Null does not match one of the enumerated values", "enum", schema.enum_scalars)
            if schema.has_const and schema.const_value is not None:
                E("const mismatch", "const", schema.const_value, None)

        # --- structural enum members (EndObject/EndArray testEnum,
        #     schema.js:813-820, 851-858) ---
        if t in ("object", "array") and schema.enum_schemas is not None:
            matched = any(
                not self._probe(s, value, path, recursive_base, depth + 1)
                for s in schema.enum_schemas
            )
            if not matched:
                E('Expected "enum" to have one matching value', "enum", 1, 0)

        # --- combinators (finish(), schema.js:1342-1417) ---
        if quirk_local:
            return errors
        # allOf: errors propagate directly (child keyword attribution,
        # SURVEY.md §4.3-6)
        for s in schema.all_of:
            errors.extend(self._val(s, value, path, annotations, recursive_base, depth + 1))

        if schema.has_any_of:
            branches = [self._val(s, value, path, [], recursive_base, depth + 1) for s in schema.any_of]
            if not any(not b for b in branches):
                E('Expected "anyOf" to have at least one matching schema', "anyOf", 1, 0)

        if schema.has_one_of:
            branches = [self._val(s, value, path, [], recursive_base, depth + 1) for s in schema.one_of]
            valid = sum(1 for b in branches if not b)
            if valid != 1:
                E('Expected "oneOf" to have exactly one matching schema', "oneOf", 1, valid)

        if schema.not_ is not None:
            if not self._val(schema.not_, value, path, [], recursive_base, depth + 1):
                E('Expected "not" to fail', "not")

        if schema.if_ is not None:
            if_errors = self._val(schema.if_, value, path, [], recursive_base, depth + 1)
            branch = schema.then_ if not if_errors else schema.else_
            if branch is not None:
                errors.extend(self._val(branch, value, path, annotations, recursive_base, depth + 1))

        if schema.ref is not None:
            target = schema.resolve_ref()
            errors.extend(self._val(target, value, path, annotations, recursive_base, depth + 1))

        if schema.recursive_ref is not None:
            target = recursive_base if recursive_base is not None else schema.registry.lookup(schema.recursive_ref)
            errors.extend(self._val(target, value, path, annotations, recursive_base, depth + 1))

        # annotations only on zero-error instances (schema.js:1411)
        if self.collect_annotations and not errors:
            if schema.title:
                annotations.append(AnnotationRecord(schema.title, path, "title", sid))
            if schema.description:
                annotations.append(AnnotationRecord(schema.description, path, "description", sid))

        return errors

    # ------------------------------------------------------------------
    def _sub(self, schema, value, path, annotations, rbase, depth):
        """Recurse into a CHILD VALUE position: quirk mode runs the full
        finish-cascade simulation for that position (its own layer stack in
        the reference), normal mode the plain recursive walk."""
        if self.reference_quirks:
            return self._val_quirks(schema, value, path, rbase, depth)
        return self._val(schema, value, path, annotations, rbase, depth)

    def _probe(self, schema, value, path, rbase, depth):
        """SPECULATIVE verdict-only evaluation (if/anyOf/oneOf pass checks,
        enum_schemas, contains, evaluated-set unions). Detaches the quirk
        import sink first: a discarded probe must not leak its nested
        unevaluated* rows into the active _QNode's per-finish import list
        (r4 code-review finding #1 — phantom violations on valid
        instances)."""
        prev = self._quirk_import_rows
        self._quirk_import_rows = None
        try:
            return self._val(schema, value, path, [], rbase, depth)
        finally:
            self._quirk_import_rows = prev

    # ------------------------------------------------------------------
    def _object_keywords(self, schema, value: dict, path, E, annotations, rbase, depth):
        n = len(value)
        if schema.min_properties is not None and n < schema.min_properties:
            E("Too few properties", "minProperties", schema.min_properties, n)
        if schema.max_properties is not None and n > schema.max_properties:
            E("Too many properties", "maxProperties", schema.max_properties, n)
        # fires for STRING consts too — constLength is the string's length
        # and the endObject/endArray count validators gate only on
        # constLength being a number (schema.js:577-578, 798-803, 833-838)
        if schema.const_length is not None and n != schema.const_length:
            E("Incorrect number of properties", "const", schema.const_length, n)
        if schema.required is not None:
            missing = [k for k in schema.required if k not in value]
            if missing:
                # the reference emits BOTH rows per object: the endObject
                # count check (schema.js:810) and the finish()-time
                # missing-key list (schema.js:1322-1324, declaration order)
                E("Required property missing", "required", 0, len(missing))
                E("Required properties missing", "required", missing, None)
        # NOTE deliberately NO missing-key check for const objects: the
        # reference's constRemain branch (schema.js:1360-1364, flagged
        # "FIXME is this right?") is dead code — constRemain is never
        # assigned — so a same-key-count object whose keys are disjoint
        # from the const's keys VALIDATES (constLength + per-present-key
        # checks only). Verified by executing the reference under node
        # (scripts/reference_differential.py found the divergence).

        if self.extensions and schema.dependent_required:
            for key, reqs in schema.dependent_required.items():
                if key in value:
                    missing = sum(1 for r in reqs if r not in value)
                    if missing:
                        E("Dependent property missing", "dependentRequired", 0, missing)

        errs_out = []
        evaluated: set[str] = set()
        if self.extensions and schema.dependent_schemas:
            for key, dsub in schema.dependent_schemas.items():
                if key in value:
                    errs_out.extend(self._val(dsub, value, path, annotations, rbase, depth + 1))
        for key, child in value.items():
            child_path = f"{path}/{key}"
            routed = False
            sub = schema.properties.get(key)
            if sub is not None:
                routed = True
                errs_out.extend(self._sub(sub, child, child_path, annotations, rbase, depth + 1))
            for _, rx, psub in schema.pattern_properties:
                if rx.search(key):
                    routed = True
                    errs_out.extend(self._sub(psub, child, child_path, annotations, rbase, depth + 1))
            if not routed and schema.additional_properties is not None:
                routed = True
                errs_out.extend(
                    self._sub(schema.additional_properties, child, child_path, annotations, rbase, depth + 1)
                )
            if routed:
                evaluated.add(key)
            if schema.const_properties is not None:
                csub = schema.const_properties.get(key)
                if csub is not None:
                    errs_out.extend(self._sub(csub, child, child_path, annotations, rbase, depth + 1))
            if self.extensions and schema.property_names is not None:
                errs_out.extend(
                    self._sub(schema.property_names, key, child_path, annotations, rbase, depth + 1)
                )
        # unevaluatedProperties: single-schema scope + allOf/$ref unions are
        # handled by the caller accumulating into the same error list; here we
        # apply the subschema to keys this schema (incl. its allOf/$ref
        # in-place applicators) did not evaluate (schema.js:1395-1403).
        if schema.unevaluated_properties is not None:
            in_place = self._in_place_evaluated(schema, value, rbase, depth)
            # quirk mode: unevaluatedProperties rows are IMPORTED in finish
            # (schema.js:1395-1403), so they re-push per finish execution —
            # route them to the cascade's import list, not the once-rows
            sink = (self._quirk_import_rows
                    if self._quirk_import_rows is not None else errs_out)
            for key, child in value.items():
                if key not in evaluated and key not in in_place:
                    sink.extend(
                        self._sub(
                            schema.unevaluated_properties, child, f"{path}/{key}", annotations, rbase, depth + 1
                        )
                    )
        return errs_out

    def _in_place_evaluated(self, schema, value: dict, rbase, depth) -> set[str]:
        """Keys evaluated by in-place applicators (allOf/$ref/anyOf/oneOf/
        if-then-else branches), matching the reference's evaluated-set union
        at finish (schema.js:1153-1160, 1373-1403). Conditional branches
        (anyOf/oneOf/then/else) contribute their evaluated keys only when the
        branch VALIDATES the value — exactly the reference's rule that only
        zero-error subvalidators donate their evaluatedPropertiesSet."""
        if depth > _MAX_REF_DEPTH:
            raise RecursionError(
                f"$ref depth > {_MAX_REF_DEPTH} in unevaluatedProperties scope"
            )
        out: set[str] = set()
        # unconditional in-place applicators: allOf + $ref
        subs = list(schema.all_of)
        if schema.ref is not None:
            subs.append(schema.resolve_ref())
        # conditional in-place applicators donate keys only if they pass
        cond: list = []
        cond.extend(schema.any_of)
        cond.extend(schema.one_of)
        if schema.if_ is not None:
            if_pass = not self._probe(schema.if_, value, "", rbase, depth + 1)
            if if_pass:
                cond.append(schema.if_)
                if schema.then_ is not None:
                    cond.append(schema.then_)
            elif schema.else_ is not None:
                cond.append(schema.else_)
        for s in cond:
            if not self._probe(s, value, "", rbase, depth + 1):
                subs.append(s)
        for s in subs:
            out |= set(k for k in value if k in s.properties)
            for _, rx, _s in s.pattern_properties:
                out |= {k for k in value if rx.search(k)}
            if s.additional_properties is not None:
                out |= set(value.keys())
            out |= self._in_place_evaluated(s, value, rbase, depth + 1)
        return out

    # ------------------------------------------------------------------
    def _array_keywords(self, schema, value: list, path, E, annotations, rbase, depth):
        n = len(value)
        # constLength of any const type (incl. string length) — see object note
        if schema.const_length is not None and n != schema.const_length:
            E("Incorrect number of items", "const", schema.const_length, n)
        if schema.min_items is not None and n < schema.min_items:
            E("Too few items", "minItems", schema.min_items, n)
        if schema.max_items is not None and n > schema.max_items:
            E("Too many items", "maxItems", schema.max_items, n)

        errs: list[ValidationRecord] = []
        contains_hits = 0
        for i, item in enumerate(value):
            # reference_quirks: the reference DROPS the '0' segment for the
            # first array element (layer path not yet incremented when item
            # 0's layer is built) — /b/z for item 0, /b/2/z for item 2
            ipath = path if (self.reference_quirks and i == 0) else f"{path}/{i}"
            if schema.items_tuple is not None:
                if i < len(schema.items_tuple):
                    errs.extend(self._sub(schema.items_tuple[i], item, ipath, annotations, rbase, depth + 1))
                elif schema.additional_items is not None:
                    errs.extend(self._sub(schema.additional_items, item, ipath, annotations, rbase, depth + 1))
            elif schema.items_all is not None:
                errs.extend(self._sub(schema.items_all, item, ipath, annotations, rbase, depth + 1))
            if schema.const_items is not None and i < len(schema.const_items):
                errs.extend(self._sub(schema.const_items[i], item, ipath, annotations, rbase, depth + 1))
            if self.extensions and schema.contains is not None:
                if not self._probe(schema.contains, item, ipath, rbase, depth + 1):
                    contains_hits += 1
        if self.extensions and schema.contains is not None:
            lo = schema.min_contains if schema.min_contains is not None else 1
            if contains_hits < lo:
                E('Expected "contains" to match at least one item', "contains", lo, contains_hits)
            if schema.max_contains is not None and contains_hits > schema.max_contains:
                E('Expected "contains" to match at most maxContains items', "maxContains", schema.max_contains, contains_hits)
        if self.extensions and schema.unique_items:
            import json as _json

            seen = set()
            dup = False
            for item in value:
                k = _json.dumps(item, sort_keys=True) if isinstance(item, (dict, list)) else repr(enum_key(item))
                if k in seen:
                    dup = True
                    break
                seen.add(k)
            if dup:
                E("Array items are not unique", "uniqueItems", True, False)
        # unevaluatedItems (extension — reference known-keyword-only): the
        # items twin of the unevaluatedProperties evaluated-set union.
        # Evaluation state for arrays is a PREFIX length: items_all / tuple
        # items (+additionalItems) evaluate positionally; in-place
        # applicator branches donate their prefix only when they PASS.
        if self.extensions and schema.unevaluated_items is not None:
            p = self._items_evaluated_prefix(schema, value, rbase, depth)
            sink = (self._quirk_import_rows
                    if self._quirk_import_rows is not None else errs)
            for i in range(p, n):
                qpath = path if (self.reference_quirks and i == 0) else f"{path}/{i}"
                sink.extend(
                    self._sub(schema.unevaluated_items, value[i], qpath,
                              annotations, rbase, depth + 1)
                )
        return errs

    def _items_evaluated_prefix(self, schema, value: list, rbase, depth) -> int:
        """Number of leading items evaluated by this schema or its in-place
        applicators (len(value) == all). Mirrors _in_place_evaluated."""
        if depth > _MAX_REF_DEPTH:
            raise RecursionError(
                f"$ref depth > {_MAX_REF_DEPTH} in unevaluatedItems scope"
            )
        n = len(value)
        if schema.items_all is not None:
            return n
        p = 0
        if schema.items_tuple is not None:
            p = min(len(schema.items_tuple), n)
            if schema.additional_items is not None:
                return n
        subs = list(schema.all_of)
        if schema.ref is not None:
            subs.append(schema.resolve_ref())
        cond: list = list(schema.any_of) + list(schema.one_of)
        if schema.if_ is not None:
            if not self._probe(schema.if_, value, "", rbase, depth + 1):
                cond.append(schema.if_)
                if schema.then_ is not None:
                    cond.append(schema.then_)
            elif schema.else_ is not None:
                cond.append(schema.else_)
        for s in cond:
            if not self._probe(s, value, "", rbase, depth + 1):
                subs.append(s)
        for s in subs:
            p = max(p, self._items_evaluated_prefix(s, value, rbase, depth + 1))
            if p >= n:
                return n
        return p

    # ------------------------------------------------------------------
    # reference_quirks finish-cascade simulation (VERDICT r3 #5)
    # ------------------------------------------------------------------
    def _val_quirks(self, schema, value, path, rbase, depth):
        """Bug-for-bug report emission at ONE value position: build the
        validator-layer tree the reference builds (allOf/$ref sublayers
        ALIAS the parent's errors array, combinator branches own theirs),
        seed event-time rows once, then run the parse.js pop() cascade —
        finish() on every validator in getAll() order, each finish
        re-finishing all descendants before its own body (schema.js:
        1342-1349). Every shape was pinned by executing the reference:
        2^k under allOf/$ref chains, x6 for then-under-allOf, x2 for
        unevaluatedProperties-under-allOf, x1 for const/enum/required."""
        if depth > _MAX_REF_DEPTH:
            raise RecursionError(f"$ref depth > {_MAX_REF_DEPTH} at <{schema.id}>")
        root_errors: list[ValidationRecord] = []
        budget = [0]
        root = self._build_qnode(schema, value, path, root_errors, rbase, depth, budget)
        for v in _qnode_getall(root):
            self._qnode_finish(v, budget)
        return root_errors

    def _build_qnode(self, s, value, path, errors, rbase, depth, budget):
        if depth > _MAX_REF_DEPTH:
            raise RecursionError(f"$ref depth > {_MAX_REF_DEPTH} at <{s.id}>")
        budget[0] += 1
        if budget[0] > 5000:
            raise RecursionError("reference_quirks layer tree exceeded budget")
        if s.recursive_anchor and rbase is None:
            rbase = s.recursive_anchor_root()
        node = _QNode(errors=errors, path=path, sid=s.id)
        # event-time once-rows (seeded exactly once, like parser events
        # pushing through the aliased array); unevaluated* rows divert to
        # the per-finish import list (save/restore: single-threaded DFS)
        prev = self._quirk_import_rows
        self._quirk_import_rows = node.import_rows
        try:
            node.errors.extend(
                self._val(s, value, path, [], rbase, depth, quirk_local=True)
            )
        finally:
            self._quirk_import_rows = prev
        # aliased in-place sublayers: allOf members + $ref/$recursiveRef
        # targets share THIS node's errors list (schema.js:1049-1058)
        for sub in s.all_of:
            node.children.append(
                self._build_qnode(sub, value, path, node.errors, rbase, depth + 1, budget))
        if s.ref is not None:
            node.children.append(
                self._build_qnode(s.resolve_ref(), value, path, node.errors, rbase, depth + 1, budget))
        if s.recursive_ref is not None:
            target = rbase if rbase is not None else s.registry.lookup(s.recursive_ref)
            node.children.append(
                self._build_qnode(target, value, path, node.errors, rbase, depth + 1, budget))
        # own-array branch layers (root=null in the reference constructor)
        def own(sub):
            child = self._build_qnode(sub, value, path, [], rbase, depth + 1, budget)
            node.children.append(child)
            return child

        if s.has_any_of:
            node.anyof = [own(b) for b in s.any_of]
        if s.has_one_of:
            node.oneof = [own(b) for b in s.one_of]
        if s.not_ is not None:
            node.not_node = own(s.not_)
        if s.if_ is not None:
            node.if_node = own(s.if_)
            if s.then_ is not None:
                node.then_node = own(s.then_)
            if s.else_ is not None:
                node.else_node = own(s.else_)
        return node

    def _qnode_finish(self, v, budget):
        budget[0] += 1
        if budget[0] > 200_000:
            raise RecursionError("reference_quirks finish cascade exceeded budget")
        for d in _qnode_getall(v)[:-1]:
            self._qnode_finish(d, budget)
        # finish body, reference order: if/then/else import, not, oneOf,
        # anyOf, unevaluated import (schema.js:1352-1404)
        if v.if_node is not None:
            branch = v.then_node if not v.if_node.errors else v.else_node
            if branch is not None:
                v.errors.extend(list(branch.errors))  # snapshot of CURRENT rows
        if v.not_node is not None and not v.not_node.errors:
            v.errors.append(ValidationRecord(
                message='Expected "not" to fail', path=v.path, keyword="not",
                constraint_id=v.sid, expected=None, actual=None))
        if v.oneof is not None:
            valid = sum(1 for b in v.oneof if not b.errors)
            if valid != 1:
                v.errors.append(ValidationRecord(
                    message='Expected "oneOf" to have exactly one matching schema',
                    path=v.path, keyword="oneOf", constraint_id=v.sid,
                    expected=1, actual=valid))
        if v.anyof is not None and not any(not b.errors for b in v.anyof):
            v.errors.append(ValidationRecord(
                message='Expected "anyOf" to have at least one matching schema',
                path=v.path, keyword="anyOf", constraint_id=v.sid,
                expected=1, actual=0))
        v.errors.extend(v.import_rows)


class _QNode:
    """One reference ValidateLayer in the quirk simulation. `errors` may BE
    an ancestor's list (aliasing); branch layers hold their own."""

    __slots__ = ("errors", "path", "sid", "children", "import_rows",
                 "anyof", "oneof", "not_node", "if_node", "then_node", "else_node")

    def __init__(self, errors, path, sid):
        self.errors = errors
        self.path = path
        self.sid = sid
        self.children = []
        self.import_rows = []
        self.anyof = None
        self.oneof = None
        self.not_node = None
        self.if_node = None
        self.then_node = None
        self.else_node = None


def _qnode_getall(v) -> list:
    """Flattened descendants-then-self, the reference getAll() order
    (schema.js:1135-1152)."""
    out = []
    for c in v.children:
        out.extend(_qnode_getall(c))
    out.append(v)
    return out


@dataclass(frozen=True)
class ResourceLimits:
    """Parser resource caps (reference parse.js:146-150, 269-293): in the
    table engine these become violation rows with keyword 'resourceLimit'
    rather than job failures; api.parse() raises ResourceLimitError."""

    max_string_length: Optional[int] = None  # code points (parse.js:147)
    max_key_length: Optional[int] = None     # parse.js:146
    max_items: Optional[int] = None          # parse.js:149
    max_properties: Optional[int] = None     # parse.js:150
    max_depth: Optional[int] = None          # layer-stack depth analog


def check_limits(value: Any, limits: ResourceLimits, path: str = "", depth: int = 0) -> list[ValidationRecord]:
    """Walk a parsed value and report every cap violation (never raises)."""
    out: list[ValidationRecord] = []

    def rec(v: Any, p: str, d: int) -> None:
        if limits.max_depth is not None and d > limits.max_depth:
            out.append(ValidationRecord("Too much recursion", p, "resourceLimit",
                                        "limits", limits.max_depth, d))
            return
        if isinstance(v, str):
            if limits.max_string_length is not None and len(v) > limits.max_string_length:
                out.append(ValidationRecord("String too long", p, "resourceLimit",
                                            "limits", limits.max_string_length, len(v)))
        elif isinstance(v, dict):
            if limits.max_properties is not None and len(v) > limits.max_properties:
                out.append(ValidationRecord("Too many properties in object", p, "resourceLimit",
                                            "limits", limits.max_properties, len(v)))
            for k, c in v.items():
                if limits.max_key_length is not None and len(k) > limits.max_key_length:
                    # the reference reports an over-length KEY as "String too long"
                    # too (parse.js maxKeyLength shares the string cap message;
                    # node-pinned r5, test/parse.test.js:170-176)
                    out.append(ValidationRecord("String too long", f"{p}/{k}", "resourceLimit",
                                                "limits", limits.max_key_length, len(k)))
                rec(c, f"{p}/{k}", d + 1)
        elif isinstance(v, list):
            if limits.max_items is not None and len(v) > limits.max_items:
                out.append(ValidationRecord("Too many items in array", p, "resourceLimit",
                                            "limits", limits.max_items, len(v)))
            for i, c in enumerate(v):
                rec(c, f"{p}/{i}", d + 1)

    rec(value, path, depth)
    return out


def validate_instance(
    rules, value: Any, extensions: bool = False
) -> tuple[bool, list[ValidationRecord]]:
    """Convenience one-shot: ``parseInfo``-style — never raises on violations
    (parse.js:99-117; test/parseInfo.test.js:33-37)."""
    from .compiler import compile_rules

    compiled = rules if isinstance(rules, CompiledSchema) else compile_rules(rules)
    errors, _ = Evaluator(extensions=extensions).validate(compiled, value)
    return (not errors, errors)
