"""MapType columns = JSON objects with dynamic keys (SURVEY.md §1.2 row:
patternProperties/additionalProperties -> MapType + map HOFs)."""

import pytest

from pyspark.sql import functions as F

from jsonschemaparse_spark.plans import VALID_COL, validate_dataframe


@pytest.fixture(scope="module")
def mdf(spark):
    return spark.createDataFrame(
        [
            (1, {"alpha": 5, "beta": 7}),
            (2, {"alpha": -3}),
            (3, {}),
            (4, {"x1": 2, "x2": 4, "x3": 6, "junk": 1}),
        ],
        "id int, m map<string,int>",
    )


def _valids(res):
    return {r["id"]: r[VALID_COL] for r in res.annotated.collect()}


def test_map_required_and_counts(spark, mdf):
    rules = {"properties": {"m": {"required": ["alpha"], "minProperties": 1,
                                  "maxProperties": 3}}}
    res = validate_dataframe(mdf, rules, key_cols=["id"], fallback="never")
    assert _valids(res) == {1: True, 2: True, 3: False, 4: False}
    kws = {(r["id"], r["keyword"]) for r in res.violations().collect()}
    assert (3, "required") in kws and (3, "minProperties") in kws
    assert (4, "required") in kws and (4, "maxProperties") in kws


def test_map_properties_routing(spark, mdf):
    rules = {"properties": {"m": {"properties": {"alpha": {"minimum": 0}}}}}
    res = validate_dataframe(mdf, rules, key_cols=["id"], fallback="never")
    assert _valids(res) == {1: True, 2: False, 3: True, 4: True}
    v = res.violations().collect()
    assert v[0]["path"] == "/m/alpha" and v[0]["keyword"] == "minimum"


def test_map_pattern_and_additional(spark, mdf):
    rules = {"properties": {"m": {
        "patternProperties": {"^x": {"multipleOf": 2}},
        "additionalProperties": {"minimum": 0},
    }}}
    res = validate_dataframe(mdf, rules, key_cols=["id"], fallback="never")
    # row2: alpha=-3 is additional (no ^x match) and < 0 -> invalid
    # row4: x1/x2/x3 all even, junk=1 >= 0 -> valid
    assert _valids(res) == {1: True, 2: False, 3: True, 4: True}


def test_map_property_names(spark, mdf):
    rules = {"properties": {"m": {"propertyNames": {"maxLength": 4}}}}
    res = validate_dataframe(mdf, rules, key_cols=["id"], fallback="never")
    # 'alpha' (5 chars) fails; x1/x2/x3/junk all <= 4
    assert _valids(res) == {1: False, 2: False, 3: True, 4: True}


def test_map_dependent_required(spark, mdf):
    rules = {"properties": {"m": {"dependentRequired": {"alpha": ["beta"]}}}}
    res = validate_dataframe(mdf, rules, key_cols=["id"], fallback="never")
    assert _valids(res) == {1: True, 2: False, 3: True, 4: True}


def test_map_agrees_with_evaluator(spark, mdf):
    from jsonschemaparse_spark import validate_instance

    rules_m = {
        "required": ["alpha"], "minProperties": 1, "maxProperties": 3,
        "properties": {"alpha": {"minimum": 0}},
        "patternProperties": {"^x": {"multipleOf": 2}},
    }
    res = validate_dataframe(
        mdf, {"properties": {"m": rules_m}}, key_cols=["id"], fallback="never"
    )
    got = _valids(res)
    for r in mdf.collect():
        want, _ = validate_instance(rules_m, dict(r["m"]), extensions=True)
        assert got[r["id"]] == want, (r["id"], dict(r["m"]))
