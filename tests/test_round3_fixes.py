"""Round-3 regression tests for the ADVICE r2 findings: hybrid routing of
required + unconstrained + explicit null (high), nested-conditional
evaluated-set donation (medium), violation-cap coverage of per-column
fallback rows and engine-parameter validation (low)."""

import json
import random

import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from jsonschemaparse_spark import compile_rules, validate_instance
from jsonschemaparse_spark.plans import VALID_COL, validate_dataframe
from jsonschemaparse_spark.plans import validate_json_column
from jsonschemaparse_spark.schema.evaluate import Evaluator


# ---------------------------------------------------------------------------
# ADVICE high: explicit JSON null on a REQUIRED key whose subschema is {}
# must route to the Python evaluator (the Column required check would fire
# where the evaluator accepts).
# ---------------------------------------------------------------------------
def test_hybrid_required_unconstrained_explicit_null(spark):
    rules = {
        "type": "object",
        "properties": {"a": {}, "b": {"type": "integer"}},
        "required": ["a"],
    }
    df = spark.createDataFrame(
        [
            (1, '{"a": null, "b": 2}'),   # a present (null) -> required OK
            (2, '{"b": 2}'),               # a absent -> required fires
            (3, '{"a": 1, "b": 2}'),       # a present -> OK
            (4, '{"a": null, "b": "x"}'),  # a OK but b wrong type
        ],
        ["id", "props"],
    )

    def verdicts(engine):
        res = validate_json_column(df, "props", rules, key_cols=["id"], engine=engine)
        return {r["id"]: r[VALID_COL] for r in res.annotated.collect()}

    arrow = verdicts("arrow")
    auto = verdicts("auto")
    assert arrow == {1: True, 2: False, 3: True, 4: False}
    assert auto == arrow


def test_hybrid_required_unconstrained_differential_random(spark):
    """Randomized docs over the exact ADVICE shape: required keys with {}
    subschemas mixed with typed ones; every verdict must match arrow."""
    rules = {
        "type": "object",
        "properties": {"a": {}, "b": {"type": "integer"}, "c": {}},
        "required": ["a", "c"],
    }
    rnd = random.Random(20260816)
    docs = []
    for i in range(60):
        obj = {}
        for k in ("a", "b", "c"):
            r = rnd.random()
            if r < 0.3:
                continue
            obj[k] = rnd.choice([None, 1, "s", True, [1], {"x": 1}, 2.5])
        docs.append((i, json.dumps(obj)))
    df = spark.createDataFrame(docs, ["id", "props"])

    def verdicts(engine):
        res = validate_json_column(df, "props", rules, key_cols=["id"], engine=engine)
        return {r["id"]: r[VALID_COL] for r in res.annotated.collect()}

    assert verdicts("auto") == verdicts("arrow")


# ---------------------------------------------------------------------------
# ADVICE medium: a conditional nested inside a passing conditional branch
# donates its evaluated keys too (mirrors the evaluator's recursive union).
# ---------------------------------------------------------------------------
_NESTED_ANYOF = {
    "properties": {
        "o": {
            "type": "object",
            "anyOf": [{"anyOf": [{"properties": {"x": {"type": "integer"}}}]}],
            "unevaluatedProperties": {"type": "string"},
        }
    }
}


def test_unevaluated_nested_anyof_struct(spark):
    df = spark.createDataFrame(
        [(1, {"x": 5})],
        "id int, o struct<x:int>",
    )
    res = validate_dataframe(df, _NESTED_ANYOF, key_cols=["id"], fallback="never")
    row = res.annotated.collect()[0]
    assert row[VALID_COL] is True, [r for r in res.violations().collect()]


def test_unevaluated_nested_anyof_evaluator_agrees():
    cs = compile_rules(_NESTED_ANYOF)
    errors, _ = Evaluator(extensions=True).validate(cs, {"o": {"x": 5}})
    assert not errors


def test_unevaluated_nested_if_then_struct(spark):
    """then nested inside an anyOf branch donates only when the inner
    conditional actually covers the key on that row."""
    rules = {
        "properties": {
            "o": {
                "type": "object",
                "anyOf": [
                    {
                        "if": {"required": ["flag"]},
                        "then": {"properties": {"x": {"type": "integer"}}},
                    }
                ],
                "properties": {"flag": {"type": "boolean"}},
                "unevaluatedProperties": False,
            }
        }
    }
    df = spark.createDataFrame(
        [
            (1, {"flag": True, "x": 5}),    # if passes -> then evaluates x
            (2, {"flag": None, "x": 5}),    # if fails -> x unevaluated
        ],
        "id int, o struct<flag:boolean, x:int>",
    )
    res = validate_dataframe(df, rules, key_cols=["id"], fallback="never")
    got = {r["id"]: r[VALID_COL] for r in res.annotated.collect()}
    # evaluator cross-check
    ev = Evaluator(extensions=True)
    cs = compile_rules(rules)
    e1, _ = ev.validate(cs, {"o": {"flag": True, "x": 5}})
    e2, _ = ev.validate(cs, {"o": {"x": 5}})
    assert (not e1, not e2) == (got[1], got[2])
    assert got == {1: True, 2: False}


def test_unevaluated_deeply_nested_conditionals_differential(spark):
    """Randomized 2-level conditional nests: Column path verdict must match
    the Python evaluator row-for-row."""
    rnd = random.Random(99)
    inner_opts = [
        {"properties": {"x": {"type": "integer"}}},
        {"properties": {"x": {"type": "integer", "minimum": 10}}},
        {"properties": {"y": {"type": "string"}}},
    ]
    for trial in range(8):
        inner = rnd.choice(inner_opts)
        wrap = rnd.choice(["anyOf", "oneOf", "allOf"])
        outer = rnd.choice(["anyOf", "oneOf"])
        rules = {
            "properties": {
                "o": {
                    "type": "object",
                    outer: [{wrap: [inner]}],
                    "unevaluatedProperties": False,
                }
            }
        }
        rows = [
            (1, {"x": 5, "y": None}),
            (2, {"x": 50, "y": None}),
            (3, {"x": None, "y": "s"}),
            (4, {"x": 5, "y": "s"}),
        ]
        df = spark.createDataFrame(rows, "id int, o struct<x:int, y:string>")
        res = validate_dataframe(df, rules, key_cols=["id"], fallback="never")
        got = {r["id"]: r[VALID_COL] for r in res.annotated.collect()}
        ev = Evaluator(extensions=True)
        cs = compile_rules(rules)
        for rid, o in rows:
            val = {k: v for k, v in o.items() if v is not None}
            errs, _ = ev.validate(cs, {"o": val})
            assert got[rid] == (not errs), (
                f"trial={trial} rules={json.dumps(rules)} row={rid} "
                f"column={got[rid]} evaluator={not errs}"
            )


# ---------------------------------------------------------------------------
# ADVICE low: engine validation + merged violation cap
# ---------------------------------------------------------------------------
def test_engine_param_validated(spark):
    df = spark.createDataFrame([(1, "{}")], ["id", "props"])
    with pytest.raises(ValueError, match="engine"):
        validate_json_column(df, "props", {"type": "object"}, engine="hybrid")


def test_violation_cap_includes_fallback_rows(spark):
    """max_violations_per_row bounds the MERGED report, not just the
    expression-path rows: a per-column Arrow fallback cannot exceed the
    remaining budget, and overflow sets the truncation flag."""
    rules = {
        "properties": {
            # lookbehind is ECMAScript-divergent -> per-column Python fallback
            "s": {"type": "string", "pattern": "(?<=a)b", "minLength": 10,
                  "maxLength": 0, "enum": ["zzz"]},
            "n": {"type": "integer", "minimum": 100, "multipleOf": 7},
        }
    }
    df = spark.createDataFrame([(1, "b", 3)], ["id", "s", "n"])
    res = validate_dataframe(df, rules, key_cols=["id"], max_violations_per_row=2)
    row = res.annotated.collect()[0]
    n_compact = len(row["_jsp_violations"])
    n_py = len(row["_jsp_violations_py"])
    assert n_compact + n_py <= 2, (n_compact, n_py)
    assert row["_jsp_violations_truncated"] is True
    # and without a cap the same row reports more than 2 total
    res_full = validate_dataframe(df, rules, key_cols=["id"])
    assert len(res_full.violations().collect()) > 2


# ---------------------------------------------------------------------------
# VERDICT r2 #3: language ID must detect all 10 corpus languages.
# The driver testdata's documents.text is synthetic English-vocab for every
# lang label (verified: identical 31-word vocabulary per label), so agreement
# with that column cannot measure detection; this fixture holds real
# sentences per language instead.
# ---------------------------------------------------------------------------
_LANG_SENTENCES = {
    "en": [
        "the cat and the dog were in the house that was built for it",
        "it is clear that the results of the study were good for everyone",
        "this is the best way to learn and it was fun for all of us",
    ],
    "de": [
        "der Hund und die Katze sind nicht mit dem Auto auf der Strasse",
        "das ist ein gutes Buch und es ist nicht zu schwer zu lesen",
        "die Kinder spielen mit einem Ball auf der Wiese und sind froh",
    ],
    "fr": [
        "le chat et le chien sont dans la maison pour les enfants",
        "ce n'est pas une bonne idee et il est tard dans la nuit",
        "les resultats sont bons et une solution est possible pour tous",
    ],
    "es": [
        "el perro y el gato estan en la casa de los vecinos",
        "es una buena idea que los estudiantes estudien para el examen",
        "los resultados son buenos y es por eso que estamos con ellos",
    ],
    "it": [
        "il gatto che vive nella casa non e una minaccia per nessuno",
        "sono contento del lavoro che una persona per bene sa fare",
        "non e facile ma il risultato che otteniamo e una vittoria",
    ],
    "pt": [
        "o gato que mora na casa nao e uma ameaca para os vizinhos",
        "os resultados do estudo sao bons para quem trabalha com dados",
        "nao e facil mas o resultado que temos e uma grande vitoria",
    ],
    "nl": [
        "de kat en de hond zijn niet in het huis van de buren",
        "het is een goed idee dat de studenten op tijd komen",
        "de resultaten zijn goed en dat is niet te ontkennen",
    ],
    "ru": [
        "кошка и собака живут в доме у соседей",
        "это очень хорошая книга для всех студентов",
        "результаты исследования очень хорошие",
    ],
    "zh": [
        "这是一个关于数据处理的文档",
        "我们的研究结果非常好",
        "学生们在图书馆里认真学习",
    ],
    "ja": [
        "これはデータ処理についての文書です",
        "私たちの研究結果はとても良かったです",
        "学生たちは図書館で勉強しています",
    ],
}


def test_hybrid_flagged_observation(spark):
    """VERDICT r2 stretch #9: the hybrid path observes how many rows were
    routed to the Python rescue UDF in the same action — zero extra jobs.
    jsp_flagged == 0 licenses engine='typed' on checkpoint/resume reruns."""
    from pyspark.sql import functions as F

    from jsonschemaparse_spark.plans import validate_json_column

    rules = {"type": "object",
             "properties": {"k": {"type": "integer", "minimum": 0}}}

    clean = spark.createDataFrame([(i, '{"k": %d}' % i) for i in range(10)],
                                  ["id", "props"])
    res = validate_json_column(clean, "props", rules, key_cols=["id"],
                               engine="auto")
    assert res.flagged_observation is not None
    assert res.annotated.filter(~F.col("_jsp_valid")).count() == 0
    m = res.flagged_observation.get
    assert m["jsp_flagged"] == 0 and m["jsp_rows"] == 10

    dirty = spark.createDataFrame(
        [(1, '{"k": 1}'), (2, "{not json"), (3, '{"k": -4}')], ["id", "props"])
    res2 = validate_json_column(dirty, "props", rules, key_cols=["id"],
                                engine="auto")
    got = {r["id"]: r["_jsp_valid"] for r in res2.annotated.collect()}
    assert got == {1: True, 2: False, 3: False}
    m2 = res2.flagged_observation.get
    assert m2["jsp_flagged"] == 1 and m2["jsp_rows"] == 3  # only the corrupt row


def test_lang_id_detects_all_ten_languages(spark):
    from jsonschemaparse_spark.functions.text import detect_language

    rows = []
    i = 0
    for lang, sents in _LANG_SENTENCES.items():
        for s in sents:
            rows.append((i, lang, s))
            i += 1
    df = spark.createDataFrame(rows, ["id", "lang", "text"])
    got = detect_language(df).collect()
    per_lang_hits = {}
    n_ok = 0
    for r in got:
        ok = r["lang_pred"] == r["lang"]
        n_ok += ok
        per_lang_hits.setdefault(r["lang"], []).append(r["lang_pred"])
    acc = n_ok / len(got)
    assert acc > 0.9, per_lang_hits
    # every language detected at least once (no script left behind)
    for lang, preds in per_lang_hits.items():
        assert lang in preds, (lang, preds)


def test_lang_id_script_priority(spark):
    """Kana beats Han (ja mixes both); scripts beat stopwords only when
    they dominate the Latin letter count."""
    from jsonschemaparse_spark.functions.text import detect_language

    df = spark.createDataFrame(
        [
            (1, "これは漢字交じり"),   # kana+han -> ja
            (2, "纯汉字文档"),                      # han only -> zh
            (3, "the data pipeline 中 one hanzi"),                  # latin dominates -> en
            (4, ""),                                                      # empty -> und
        ],
        ["id", "text"],
    )
    got = {r["id"]: r["lang_pred"] for r in detect_language(df).collect()}
    assert got == {1: "ja", 2: "zh", 3: "en", 4: "und"}
