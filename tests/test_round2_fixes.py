"""Round-2 regression tests: ADVICE fixes + VERDICT next-round items.

Covers: rlike '$' end-of-input parity, unevaluatedProperties evaluated-set
union across anyOf/oneOf/if-then-else (schema.js:1373-1403) on BOTH engine
paths, checkpoint helper-column corruption, empty-violations schema, and the
$ref depth guard in the unevaluated scope.
"""

import pytest

from pyspark.sql import functions as F

from jsonschemaparse_spark.plans import VALID_COL, validate_dataframe
from jsonschemaparse_spark.plans.kernels import rlike_pattern
from jsonschemaparse_spark.schema.compiler import compile_rules
from jsonschemaparse_spark.schema.evaluate import Evaluator


# ---------------------------------------------------------------------------
# rlike '$' parity (ADVICE low #1)
# ---------------------------------------------------------------------------
def test_rlike_pattern_translation():
    assert rlike_pattern("a$") == "a\\z"
    assert rlike_pattern("^a$|b$") == "^a\\z|b\\z"
    # escaped \$ and [$] are literal in both dialects: untouched
    assert rlike_pattern(r"a\$") == r"a\$"
    assert rlike_pattern("a[$]b") == "a[$]b"
    assert rlike_pattern("plain") == "plain"


def test_pattern_dollar_rejects_trailing_newline(spark):
    """ECMAScript /a$/ rejects 'a\\n'; Java '$' would accept before a final
    line terminator — the fast path must match the reference (schema.js:884)."""
    df = spark.createDataFrame([(1, "a"), (2, "a\n")], "id int, s string")
    rules = {"properties": {"s": {"type": "string", "pattern": "a$"}}}
    res = validate_dataframe(df, rules, key_cols=["id"], fallback="never")
    got = {r["id"]: r[VALID_COL] for r in res.annotated.collect()}
    assert got == {1: True, 2: False}


# ---------------------------------------------------------------------------
# unevaluatedProperties branch union (VERDICT #6) — expression path
# ---------------------------------------------------------------------------
_ANYOF_RULES = {
    "properties": {
        "o": {
            "anyOf": [
                {"properties": {"b": {"type": "string"}}, "required": ["b"]},
                {"properties": {"c": {"type": "integer"}}, "required": ["c"]},
            ],
            "properties": {"a": {"type": "integer"}},
            "unevaluatedProperties": False,
        }
    }
}


def test_unevaluated_properties_anyof_union_struct(spark):
    """Keys evaluated by a PASSING anyOf branch are not unevaluated; keys of
    a FAILING branch stay unevaluated (schema.js:1387-1393 + 1395-1403)."""
    df = spark.createDataFrame(
        [
            (1, {"a": 1, "b": "x", "c": None}),   # branch 1 passes -> b evaluated
            (2, {"a": 1, "b": None, "c": 7}),     # branch 2 passes -> c evaluated
        ],
        "id int, o struct<a:int, b:string, c:int>",
    )
    res = validate_dataframe(df, _ANYOF_RULES, key_cols=["id"], fallback="never")
    got = {r["id"]: r[VALID_COL] for r in res.annotated.collect()}
    assert got == {1: True, 2: True}


def test_unevaluated_properties_anyof_failing_branch_struct(spark):
    """b present but its branch FAILS (b not a string? can't in struct) —
    instead: b present while only branch 2 passes => b is unevaluated."""
    df = spark.createDataFrame(
        # b="way-too-long" makes branch 1 pass too; instead break branch 1 by
        # omitting b and presenting an extra evaluated-by-nothing key d
        [(1, {"a": 1, "b": "x", "c": 7, "d": "extra"})],
        "id int, o struct<a:int, b:string, c:int, d:string>",
    )
    res = validate_dataframe(df, _ANYOF_RULES, key_cols=["id"], fallback="never")
    row = res.annotated.collect()[0]
    assert row[VALID_COL] is False  # d evaluated by no branch
    paths = {r["path"] for r in res.violations().collect()}
    assert "/o/d" in paths


def test_unevaluated_properties_if_then_union_struct(spark):
    rules = {
        "properties": {
            "o": {
                "if": {"required": ["a"]},
                "then": {"properties": {"b": {"type": "string"}}},
                "else": {"properties": {"c": {"type": "integer"}}},
                "properties": {"a": {"type": "integer"}},
                "unevaluatedProperties": False,
            }
        }
    }
    df = spark.createDataFrame(
        [
            (1, {"a": 1, "b": "x", "c": None}),  # if passes -> then evaluates b
            (2, {"a": 1, "b": None, "c": 9}),    # if passes -> c NOT evaluated
            (3, {"a": None, "b": None, "c": 9}), # if fails -> else evaluates c
        ],
        "id int, o struct<a:int, b:string, c:int>",
    )
    res = validate_dataframe(df, rules, key_cols=["id"], fallback="never")
    got = {r["id"]: r[VALID_COL] for r in res.annotated.collect()}
    assert got == {1: True, 2: False, 3: True}


# ---------------------------------------------------------------------------
# unevaluatedProperties branch union — Arrow/evaluator path
# ---------------------------------------------------------------------------
def _eval_errors(rules, value):
    cs = compile_rules(rules)
    errors, _ = Evaluator(extensions=True).validate(cs, value)
    return errors


def test_evaluator_anyof_union():
    rules = {
        "anyOf": [
            {"properties": {"b": {"type": "string"}}, "required": ["b"]},
            {"properties": {"c": {"type": "integer"}}, "required": ["c"]},
        ],
        "properties": {"a": {"type": "integer"}},
        "unevaluatedProperties": False,
    }
    assert _eval_errors(rules, {"a": 1, "b": "x"}) == []
    assert _eval_errors(rules, {"a": 1, "c": 3}) == []
    # b belongs to a FAILING branch (branch 1 requires b:string; b is an int
    # so branch 1 fails) => b is unevaluated
    errs = _eval_errors(rules, {"a": 1, "b": 5, "c": 3})
    assert any(e.keyword == "unevaluatedProperties" or "/b" in e.path for e in errs)


def test_evaluator_if_then_else_union():
    rules = {
        "if": {"properties": {"a": {"const": 1}}, "required": ["a"]},
        "then": {"properties": {"b": {}}},
        "else": {"properties": {"c": {}}},
        "unevaluatedProperties": False,
    }
    # if passes: if donates a, then donates b
    assert _eval_errors(rules, {"a": 1, "b": 2}) == []
    # if passes but c is evaluated by neither if nor then
    assert _eval_errors(rules, {"a": 1, "c": 3}) != []
    # if fails (no a): else donates c; a failed branch donates nothing
    assert _eval_errors(rules, {"c": 1}) == []
    assert _eval_errors(rules, {"b": 1}) != []


def test_evaluator_self_ref_unevaluated_depth_guard():
    """Self-referential $ref + unevaluatedProperties must fail with the
    clean depth error, not an unguarded Python RecursionError (ADVICE low #2)."""
    rules = {
        "$id": "https://x/root",
        "$ref": "#",
        "unevaluatedProperties": False,
    }
    cs = compile_rules(rules)
    with pytest.raises(RecursionError, match="depth"):
        Evaluator(extensions=True).validate(cs, {"k": 1})


# ---------------------------------------------------------------------------
# checkpoint fixes (ADVICE high + medium #2)
# ---------------------------------------------------------------------------
def test_checkpoint_no_helper_column_corruption(spark, tmp_path):
    """A root schema with additionalProperties must not see the internal
    _jsp_file column as a property of the row object."""
    from jsonschemaparse_spark.plans.checkpoint import run_with_checkpoint

    inp = str(tmp_path / "in")
    spark.createDataFrame(
        [("u1", "hello"), ("u2", "world")], "url string, text string"
    ).repartition(2).write.parquet(inp)

    rules = {
        "properties": {
            "url": {"type": "string"},
            "text": {"type": "string", "minLength": 1},
        },
        "additionalProperties": False,
        "required": ["url"],
    }
    state = str(tmp_path / "state")
    run = run_with_checkpoint(spark, inp, rules, state, key_cols=["url"])
    verdicts = run.verdicts.collect()
    assert sum(r["n_failed_rows"] for r in verdicts) == 0
    assert run.violations.count() == 0

    # resume: nothing fresh; violations frame must carry the FULL schema
    run2 = run_with_checkpoint(spark, inp, rules, state, key_cols=["url"])
    assert run2.n_files_skipped == run2.n_files_total
    assert run2.violations.columns == [
        "url", "constraint_id", "path", "keyword", "expected", "actual", "message"
    ]
    assert run2.violations.count() == 0


# ---------------------------------------------------------------------------
# JSON auto-routing (VERDICT #2): hybrid JVM path with exact report parity
# ---------------------------------------------------------------------------
def test_typed_route_gate():
    from pyspark.sql import types as T
    from jsonschemaparse_spark.plans.json_validator import _typed_route_schema

    safe = {"type": "object", "required": ["k"],
            "properties": {"k": {"type": "integer", "minimum": 0}}}
    route = _typed_route_schema(compile_rules(safe))
    assert isinstance(route, T.StructType)
    assert isinstance(route["k"].dataType, T.DoubleType)  # 1.0 is a valid integer

    for unsafe in (
        {"properties": {"k": {"type": "integer"}}},             # no root type
        {"type": "object", "properties": {"k": {"type": "string"}}},  # string coercion
        {"type": "object", "properties": {"k": {"minimum": 0}}},      # untyped leaf
        {"type": "object", "additionalProperties": False,
         "properties": {"k": {"type": "integer"}}},             # unknown-key observer
        {"type": "object", "required": ["z"],
         "properties": {"k": {"type": "integer"}}},             # required outside struct
        {"type": "object", "properties": {"k": {"type": "integer"}},
         "anyOf": [{"required": ["k"]}]},                       # combinator
    ):
        assert _typed_route_schema(compile_rules(unsafe)) is None, unsafe


def test_hybrid_report_parity_vs_arrow(spark):
    """The auto (hybrid) path must emit the SAME violation rows as the
    Arrow evaluator path — including 'type' (not 'syntax') for coercion
    failures and exact messages."""
    from jsonschemaparse_spark.plans import validate_json_column

    rules = {"type": "object", "required": ["k"],
             "properties": {"k": {"type": "integer", "minimum": 0, "maximum": 50},
                            "tags": {"type": "array", "minItems": 1}}}
    docs = [
        (1, '{"k": 1}'),
        (2, '{"k": "no"}'),        # type mismatch -> keyword 'type'
        (3, "{broken"),            # syntax
        (4, None),
        (5, '{"k": -3}'),          # minimum
        (6, '{"k": 1.0}'),         # 1.0 IS a valid integer (suite semantics)
        (7, '{"k": 1.5}'),         # fraction -> invalid
        (8, '{"k": 1, "tags": []}'),
        (9, '{"k": 99, "extra": true}'),  # extra key ignored; maximum fires
        (10, '[1,2]'),             # root type mismatch
    ]
    df = spark.createDataFrame(docs, ["id", "props"])

    def rows(engine):
        res = validate_json_column(df, "props", rules, key_cols=["id"], engine=engine)
        got = {r["id"]: r["_jsp_valid"] for r in res.annotated.collect()}
        v = sorted(
            (r["id"], r["path"], r["keyword"], r["message"])
            for r in res.violations().collect()
        )
        return got, v

    arrow = rows("arrow")
    auto = rows("auto")
    assert auto[0] == arrow[0] == {1: True, 2: False, 3: False, 4: True, 5: False,
                                   6: True, 7: False, 8: False, 9: False, 10: False}
    assert auto[1] == arrow[1]


# ---------------------------------------------------------------------------
# VERDICT #5/#7/#8: simhash zero-Python, chi2 determinism, AQE broadcast
# ---------------------------------------------------------------------------
def test_simhash_is_pure_expression(spark):
    """simhash must stay inside whole-stage codegen: no Python evaluation
    node in the plan (the r1 kernel was a per-row mapInPandas loop)."""
    from jsonschemaparse_spark.functions.dedup import simhash

    df = spark.createDataFrame([(1, "hello world"), (2, None)], ["doc_id", "text"])
    sh = simhash(df, "doc_id")
    plan = sh._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "ArrowEval" not in plan
    got = {r["doc_id"]: r["simhash"] for r in sh.collect()}
    assert got[2] == 0  # null text -> empty token set -> 0
    assert got[1] != 0


def test_chi2_truncation_deterministic(spark):
    """Above max_categories the truncation picks top-N by count
    deterministically and flags DriftResult.truncated."""
    from jsonschemaparse_spark.functions.integrity import chi2_drift

    rows = [(f"cat{i:03d}", ) for i in range(40) for _ in range(i + 1)]
    df = spark.createDataFrame(rows, ["lang"]).repartition(8)
    r1 = chi2_drift(df, df, "lang", max_categories=10)
    r2 = chi2_drift(df, df, "lang", max_categories=10)
    assert r1.truncated and r2.truncated
    assert r1.statistic == r2.statistic
    full = chi2_drift(df, df, "lang")
    assert not full.truncated


def test_referential_default_no_count_job(spark):
    """broadcast_parent=None must not run a driver-side count(): the plan is
    built lazily and still answers correctly (AQE decides the strategy)."""
    from jsonschemaparse_spark.functions.integrity import referential_violations

    child = spark.createDataFrame([(1, 10), (2, 99)], ["id", "fk"])
    parent = spark.createDataFrame([(10,), (20,)], ["pk"])
    # building the plan must not trigger a job; sanity-check results only
    bad = referential_violations(child, "fk", parent, "pk")
    assert [r["id"] for r in bad.collect()] == [2]


# ---------------------------------------------------------------------------
# VERDICT #4: banded multi-table embedding LSH
# ---------------------------------------------------------------------------
def _noisy_corpus(spark, n=30, dim=16, noise=0.12):
    """base vectors + perturbed clones (cosine ~0.97-0.995), deterministic."""
    import math
    import random

    rng = random.Random(7)
    rows = []
    for i in range(n):
        v = [rng.gauss(0, 1) for _ in range(dim)]
        nv = math.sqrt(sum(x * x for x in v))
        v = [x / nv for x in v]
        d = [rng.gauss(0, 1) for _ in range(dim)]
        nd = math.sqrt(sum(x * x for x in d))
        w = [x + noise * y / nd for x, y in zip(v, d)]
        rows.append((i, v))
        rows.append((i + 100000, w))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_embedding_multi_table_recall(spark):
    """Multi-table banding must recover noisy near-dup pairs a single table
    misses (recall 1-(1-p^b)^T vs p^b)."""
    from jsonschemaparse_spark.functions.similarity import embedding_near_duplicates

    corpus = _noisy_corpus(spark)
    true_pairs = {(i, i + 100000) for i in range(30)}

    def found(n_tables):
        pairs = embedding_near_duplicates(
            corpus, threshold=0.95, n_planes=12, n_tables=n_tables, dim=16)
        return {(r["id_a"], r["id_b"]) for r in pairs.collect()} & true_pairs

    single = found(1)
    multi = found(4)
    assert single <= multi
    assert len(multi) >= 27  # >=90% recall on the noisy pairs
    assert len(multi) > len(single)  # the extra tables actually pay


def test_embedding_bucket_cap_bounds_candidates(spark):
    """A degenerate hot bucket (identical vectors) is skipped under
    max_bucket_size and surfaced by embedding_bucket_overflow."""
    from jsonschemaparse_spark.functions.similarity import (
        embedding_bucket_overflow,
        embedding_near_duplicates,
    )

    vec = [1.0] * 8
    corpus = spark.createDataFrame(
        [(i, vec) for i in range(100)], "vec_id long, embedding array<double>"
    )
    uncapped = embedding_near_duplicates(corpus, threshold=0.99, dim=8)
    assert uncapped.count() == 100 * 99 // 2
    capped = embedding_near_duplicates(corpus, threshold=0.99, dim=8,
                                       max_bucket_size=10)
    assert capped.count() == 0
    over = embedding_bucket_overflow(corpus, max_bucket_size=10, dim=8).collect()
    assert len(over) >= 1 and all(r["n_rows"] == 100 for r in over)


# ---------------------------------------------------------------------------
# unevaluatedItems (items twin of the evaluated-set union)
# ---------------------------------------------------------------------------
def test_unevaluated_items_evaluator():
    rules = {
        "items": [{"type": "integer"}],
        "unevaluatedItems": {"maximum": 10},
    }
    assert _eval_errors(rules, [1]) == []
    assert _eval_errors(rules, [1, 5]) == []
    errs = _eval_errors(rules, [1, 50])
    assert errs and errs[0].path == "/1" and errs[0].keyword == "maximum"
    # additionalItems evaluates the tail -> unevaluatedItems vacuous
    rules2 = dict(rules, additionalItems={})
    assert _eval_errors(rules2, [1, 50]) == []


def test_unevaluated_items_branch_union_evaluator():
    rules = {
        "anyOf": [
            {"items": {"type": "integer"}},   # passes only for all-int arrays
        ],
        "unevaluatedItems": False,
    }
    assert _eval_errors(rules, [1, 2]) == []       # branch passes -> evaluated
    assert _eval_errors(rules, ["x"]) != []        # branch fails -> unevaluated


def test_unevaluated_items_struct_column(spark):
    rules = {
        "properties": {
            "a": {
                "items": [{"type": "integer"}],
                "unevaluatedItems": {"maximum": 10},
            }
        }
    }
    df = spark.createDataFrame(
        [(1, [1]), (2, [1, 5]), (3, [1, 50])], "id int, a array<int>"
    )
    res = validate_dataframe(df, rules, key_cols=["id"], fallback="never")
    got = {r["id"]: r[VALID_COL] for r in res.annotated.collect()}
    assert got == {1: True, 2: True, 3: False}
    v = res.violations().collect()
    assert v[0]["path"] == "/a/1" and v[0]["keyword"] == "maximum"


def test_unevaluated_items_branch_union_column(spark):
    rules = {
        "properties": {
            "a": {
                "anyOf": [{"items": {"maximum": 100}}],
                "unevaluatedItems": False,
            }
        }
    }
    df = spark.createDataFrame(
        [(1, [1, 2]), (2, [1, 500])], "id int, a array<int>"
    )
    res = validate_dataframe(df, rules, key_cols=["id"], fallback="never")
    got = {r["id"]: r[VALID_COL] for r in res.annotated.collect()}
    assert got == {1: True, 2: False}


def test_brute_force_topk_pandas_kernel(spark):
    """numpy-matmul kernel returns the same top-k as the expression fold."""
    from jsonschemaparse_spark.functions.similarity import brute_force_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter(F.col("vec_id") == 0).first()["embedding"]
    a = [r["vec_id"] for r in brute_force_topk(emb, q, k=10, kernel="expr").collect()]
    b = [r["vec_id"] for r in brute_force_topk(emb, q, k=10, kernel="pandas").collect()]
    assert a == b and a[0] == 0


def test_lsh_topk_multi_probe_recall(spark):
    """Multi-table probing recovers at least as much of the exact top-k as
    a single table (recall 1-(1-p^b)^T)."""
    from jsonschemaparse_spark.functions.similarity import brute_force_topk, lsh_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter(F.col("vec_id") == 0).first()["embedding"]
    exact = {r["vec_id"] for r in brute_force_topk(emb, q, k=10).collect()}
    one = {r["vec_id"] for r in lsh_topk(emb, q, k=10, n_planes=2).collect()}
    multi = {r["vec_id"] for r in lsh_topk(emb, q, k=10, n_planes=2, n_tables=4).collect()}
    assert 0 in one and 0 in multi  # the query vector is its own bucket-mate
    assert len(multi & exact) >= len(one & exact)
    assert len(multi & exact) >= 5


# ---------------------------------------------------------------------------
# review findings (round-2 self-review)
# ---------------------------------------------------------------------------
def test_hybrid_explicit_null_matches_arrow(spark):
    """JSON null is NOT an absent property: the routed path must agree with
    the evaluator on explicit-null fields (review finding #1)."""
    from jsonschemaparse_spark.plans import validate_json_column

    rules = {"type": "object",
             "properties": {"k": {"type": "integer", "minimum": 0},
                            "a": {"type": "array", "items": {"type": "integer"}}}}
    df = spark.createDataFrame(
        [(1, '{"k": 1}'), (2, '{"k": null}'), (3, '{}'),
         (4, '{"a": [1, null]}'), (5, '{"a": null}')],
        ["id", "props"],
    )
    def verdicts(engine):
        res = validate_json_column(df, "props", rules, key_cols=["id"], engine=engine)
        return {r["id"]: r["_jsp_valid"] for r in res.annotated.collect()}
    arrow = verdicts("arrow")
    auto = verdicts("auto")
    assert arrow == auto == {1: True, 2: False, 3: True, 4: False, 5: False}


def test_route_gate_rejects_unsafe_shapes():
    from pyspark.sql import types as T
    from jsonschemaparse_spark.plans.json_validator import _typed_route_schema

    # integer hidden in a 6-type list is NOT unconstrained (finding #5)
    six = {"type": "object", "properties": {
        "a": {"type": ["integer", "string", "boolean", "null", "object", "array"]}}}
    assert _typed_route_schema(compile_rules(six)) is None
    # uniqueItems/contains over unconstrained (raw-text) items (finding #2)
    uniq = {"type": "object", "properties": {
        "a": {"type": "array", "items": {}, "uniqueItems": True}}}
    assert _typed_route_schema(compile_rules(uniq)) is None
    # nested objects need recursive null detection -> not routed (finding #1)
    nested = {"type": "object", "properties": {
        "o": {"type": "object", "properties": {"k": {"type": "integer"}}}}}
    assert _typed_route_schema(compile_rules(nested)) is None
    # flat numeric shape still routes
    ok = {"type": "object", "properties": {"k": {"type": "integer"}}}
    assert isinstance(_typed_route_schema(compile_rules(ok)), T.StructType)


def test_evaluator_dollar_anchor_parity():
    """'$' must mean end-of-string on the PYTHON path too (finding #3)."""
    errs_nl = _eval_errors({"type": "string", "pattern": "a$"}, "a\n")
    errs_ok = _eval_errors({"type": "string", "pattern": "a$"}, "a")
    assert errs_nl and not errs_ok


def test_then_branch_donates_only_when_passing(spark):
    """if passes but then FAILS -> then's keys stay unevaluated on the
    Column path, matching the evaluator (finding #6)."""
    rules = {
        "properties": {
            "o": {
                "if": {"properties": {"a": {"type": "integer"}}, "required": ["a"]},
                "then": {"properties": {"b": {"type": "string", "minLength": 5}},
                         "required": ["b"]},
                "properties": {"a": {}},
                "unevaluatedProperties": False,
            }
        }
    }
    df = spark.createDataFrame(
        [(1, {"a": 1, "b": "long-enough"}),  # then passes -> b evaluated
         (2, {"a": 1, "b": "x"})],           # then FAILS -> b unevaluated too
        "id int, o struct<a:int, b:string>",
    )
    res = validate_dataframe(df, rules, key_cols=["id"], fallback="never")
    got = {r["id"]: r[VALID_COL] for r in res.annotated.collect()}
    assert got == {1: True, 2: False}
    # evaluator agrees
    from jsonschemaparse_spark import validate_instance
    ok1, _ = validate_instance(rules["properties"]["o"], {"a": 1, "b": "long-enough"}, extensions=True)
    ok2, e2 = validate_instance(rules["properties"]["o"], {"a": 1, "b": "x"}, extensions=True)
    assert ok1 and not ok2
    # and BOTH the then failure and the unevaluated violation are reported
    kws = {e.keyword for e in e2}
    assert "minLength" in kws


def test_checkpoint_survives_arrow_fallback(spark, tmp_path):
    """Rules that force the whole-row Arrow fallback must still checkpoint
    per REAL file (finding #4: input_file_name above an exchange is '')."""
    from jsonschemaparse_spark.plans.checkpoint import run_with_checkpoint

    inp = str(tmp_path / "in")
    spark.createDataFrame(
        [(f"u{i}", "look" * (i % 3)) for i in range(20)], "url string, text string"
    ).repartition(3).write.parquet(inp)
    # ECMAScript-only regex at the ROOT patternProperties -> whole-row fallback
    rules = {"patternProperties": {"\\p{L}+": {}},
             "properties": {"text": {"type": "string"}}}
    state = str(tmp_path / "state")
    run1 = run_with_checkpoint(spark, inp, rules, state, key_cols=["url"])
    files = {r["file"] for r in run1.verdicts.collect()}
    assert run1.n_files_skipped == 0 and "" not in files and len(files) >= 3
    run2 = run_with_checkpoint(spark, inp, rules, state, key_cols=["url"])
    assert run2.n_files_skipped == run2.n_files_total


def test_pandas_cosine_null_and_ragged_vectors(spark):
    from jsonschemaparse_spark.functions.similarity import brute_force_topk

    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, None), (3, [1.0, 0.0, 5.0]), (4, [0.5, 0.0])],
        "vec_id long, embedding array<double>",
    )
    top = brute_force_topk(df, [1.0, 0.0], k=4, kernel="pandas").collect()
    scores = {r["vec_id"]: r["score"] for r in top}
    assert scores[1] == 1.0 and scores[4] == 1.0
    assert scores[2] is None and scores[3] is None  # null/ragged -> NULL score


def test_multimodal_resize_plumbing(spark):
    """Aspect-preserving resize targets computed expression-side; the Arrow
    pass rewrites meta dims (pixel resample is the stubbed codec)."""
    from jsonschemaparse_spark.multimodal import resize_images, resize_plan, synthesize_media

    media = synthesize_media(spark, 40)
    planned = resize_plan(media, max_w=100, max_h=100)
    for r in planned.select("meta.width", "meta.height",
                            "target_width", "target_height").collect():
        assert 1 <= r["target_width"] <= 100 and 1 <= r["target_height"] <= 100
        if r["width"] <= 100 and r["height"] <= 100:
            assert (r["target_width"], r["target_height"]) == (r["width"], r["height"])
    resized = resize_images(media, max_w=100, max_h=100)
    rows = resized.select("meta.width", "meta.height").collect()
    assert all(r["width"] <= 100 and r["height"] <= 100 for r in rows)
    assert resized.count() == 40


def test_ivf_topk(spark):
    """IVF probe finds the exact nearest neighbours when their list is
    probed; n_probe == n_lists degenerates to exact top-k."""
    from jsonschemaparse_spark.functions.similarity import (
        brute_force_topk,
        ivf_index,
        ivf_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter(F.col("vec_id") == 0).first()["embedding"]
    exact = [r["vec_id"] for r in brute_force_topk(emb, q, k=10).collect()]
    index = ivf_index(emb, n_lists=8)
    # full probe == exact
    full = [r["vec_id"] for r in
            ivf_topk(emb, q, k=10, n_lists=8, n_probe=8, index=index).collect()]
    assert full == exact
    # partial probe: the query's own list is always probed -> vec 0 found,
    # and a reasonable share of the true top-k survives
    part = {r["vec_id"] for r in
            ivf_topk(emb, q, k=10, n_lists=8, n_probe=3, index=index).collect()}
    assert 0 in part
    assert len(part & set(exact)) >= 4
