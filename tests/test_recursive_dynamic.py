"""$recursiveRef dynamic scope through combinator nests and resource hops
(VERDICT r2 #7 — closes the one 'partial' SURVEY-§2 row).

The reference resolves $recursiveRef against the FIRST $recursiveAnchor in
dynamic scope, and the base it stores is the anchored schema's id with the
fragment stripped at resolution time (uriResolve(base, '#') —
/root/reference/lib/schema.js:1060-1072, 1124-1131). Consequence: an
anchored SUBSCHEMA without its own $id donates its enclosing resource ROOT
as the recursion target, not itself.

The reference disables the official suite's recursiveRef.json (its vendor
suite isn't even checked in), so these cases were authored here and the
EXPECTED verdicts captured by executing the reference directly under node
(lib.parseInfo via a SchemaRegistry with every resource imported). Each
case is a (schemas, root, instance, expected_valid) tuple.
"""

from __future__ import annotations

import pytest

from jsonschemaparse_spark import SchemaRegistry
from jsonschemaparse_spark.schema.evaluate import Evaluator

# (name, schemas {id: raw}, root id, [(instance, reference_verdict)])
GROUPS = [
    (
        "no_anchor_like_ref",
        {"http://t/1/schema": {
            "properties": {"foo": {"$recursiveRef": "#"}},
            "additionalProperties": False}},
        "http://t/1/schema",
        [({"foo": False}, True),
         ({"foo": {"foo": False}}, True),
         ({"bar": False}, False),
         ({"foo": {"bar": False}}, False)],
    ),
    (
        "outer_and_inner_anchored_outer_wins",
        {"http://t/2/extended": {
            "$recursiveAnchor": True,
            "properties": {"name": {"type": "string"}},
            "$ref": "http://t/2/tree"},
         "http://t/2/tree": {
            "$recursiveAnchor": True,
            "type": "object",
            "properties": {"children": {"type": "array",
                                        "items": {"$recursiveRef": "#"}}}}},
        "http://t/2/extended",
        [({"children": [{"name": "x", "children": []}]}, True),
         ({"children": [{"name": 1, "children": []}]}, False)],
    ),
    (
        "no_outer_anchor_recursion_stays_inner",
        {"http://t/3/extended": {
            "properties": {"name": {"type": "string"}},
            "$ref": "http://t/3/tree"},
         "http://t/3/tree": {
            "$recursiveAnchor": True,
            "type": "object",
            "properties": {"children": {"type": "array",
                                        "items": {"$recursiveRef": "#"}}}}},
        "http://t/3/extended",
        [({"children": [{"name": 1, "children": []}]}, True),
         ({"children": [{"children": "bad"}]}, False)],
    ),
    (
        "anchored_subschema_donates_resource_root",
        {"http://t/6/schema": {
            "type": "object",
            "properties": {"inner": {
                "$recursiveAnchor": True,
                "type": "object",
                "properties": {"next": {"$recursiveRef": "#"}}}}}},
        "http://t/6/schema",
        # next -> resource ROOT (where 'next' is unconstrained), NOT the
        # anchored inner subschema — the discriminating case
        [({"inner": {"next": {"next": "str"}}}, True),
         ({"inner": {"next": {"inner": "str"}}}, False),
         ({"inner": {"next": 42}}, False),
         ({"inner": {"next": {"inner": {}}}}, True)],
    ),
    (
        "anyof_nest_picks_dynamic_outer_base",
        {"http://t/5/outer": {
            "$recursiveAnchor": True,
            "properties": {"tag": {"type": "string"}},
            "anyOf": [{"$ref": "http://t/5/list"}]},
         "http://t/5/list": {
            "$recursiveAnchor": True,
            "type": "object",
            "properties": {"items": {"type": "array",
                                     "items": {"$recursiveRef": "#"}}}}},
        "http://t/5/outer",
        [({"items": [{"tag": "ok", "items": []}]}, True),
         ({"items": [{"tag": 7, "items": []}]}, False)],
    ),
    (
        "two_resource_hop_outer_base_survives_middle",
        {"http://t/7/outer": {
            "$recursiveAnchor": True,
            "properties": {"extra": {"type": "integer"}},
            "$ref": "http://t/7/mid"},
         "http://t/7/mid": {
            "properties": {"hop": {"$ref": "http://t/7/leaf"}}},
         "http://t/7/leaf": {
            "$recursiveAnchor": True,
            "type": "object",
            "properties": {"again": {"$recursiveRef": "#"}}}},
        "http://t/7/outer",
        [({"hop": {"again": {"extra": "notint"}}}, False),
         ({"hop": {"again": {"extra": 3}}}, True),
         ({"hop": {"again": {"hop": 5}}}, False)],
    ),
]


def _compile(schemas: dict, root_id: str):
    reg = SchemaRegistry()
    root = None
    for sid, raw in schemas.items():
        cs = reg.import_schema(sid, raw)
        if sid == root_id:
            root = cs
    assert root is not None
    return root


@pytest.mark.parametrize("name,schemas,root_id,cases",
                         GROUPS, ids=[g[0] for g in GROUPS])
def test_evaluator_matches_reference(name, schemas, root_id, cases):
    ev = Evaluator()
    root = _compile(schemas, root_id)
    for instance, expected in cases:
        errs, _ = ev.validate(root, instance)
        assert (len(errs) == 0) == expected, (
            f"{name}: {instance!r} expected valid={expected}, "
            f"errors={[e.message for e in errs]}"
        )


def test_column_path_matches_or_falls_back(spark):
    """Column-path gate: on a concrete struct type, the compiled kernels
    either agree with the evaluator's reference-verified verdict or raise
    ExpressionFallback — never silently diverge. Uses the discriminating
    resource-root group on a 2-level struct."""
    from pyspark.sql import functions as F

    from jsonschemaparse_spark.plans import validate_dataframe
    from jsonschemaparse_spark.plans.kernels import ExpressionFallback

    schemas = GROUPS[3][1]
    root = _compile(schemas, "http://t/6/schema")

    df = spark.createDataFrame(
        [(1, ({"next": None, "oops": None},)),
         (2, ({"next": None, "oops": "str"},))],
        "row_id int, inner struct<sub: struct<next: string, oops: string>>",
    ).select("row_id", F.col("inner.sub").alias("inner"))

    ev = Evaluator()
    try:
        res = validate_dataframe(df.select("row_id", "inner"), root,
                                 key_cols=["row_id"], fallback="never")
        got = {r["row_id"]: r["_jsp_valid"] for r in res.annotated.collect()}
    except ExpressionFallback:
        return  # honest refusal is acceptable; divergence is not
    for rid, inner in [(1, {"next": None, "oops": None}),
                       (2, {"next": None, "oops": "str"})]:
        value = {"inner": {k: v for k, v in inner.items() if v is not None}}
        errs, _ = ev.validate(root, value)
        assert got[rid] == (len(errs) == 0), f"row {rid} diverged"
