"""F7 syntax-negative corpus (FIXTURES.md §F7): JSONTestSuite-style y_/n_
cases modeled on the reference's enabled behaviors
(/root/reference/test/syntax-suite.test.js, test/parse.test.js:16-39).
Self-written, spec-derived — not copied from the vendored suite.
"""

import pytest

from jsonschemaparse_spark.api import ParseSyntaxError, parse_info

# (case_id, payload, well_formed)
CASES = [
    # y_: must parse
    ("y_zero", "0", True),
    ("y_neg_zero", "-0", True),
    ("y_int", "123", True),
    ("y_neg_int", "-123", True),
    ("y_frac", "1.5", True),
    ("y_exp", "1e3", True),
    ("y_exp_plus", "1E+2", True),
    ("y_exp_neg", "-0.1e-2", True),
    ("y_string", '"abc"', True),
    ("y_escapes", '"a\\n\\t\\"\\\\\\/\\b\\f\\r"', True),
    ("y_unicode_escape", '"\\u0041"', True),
    ("y_surrogate_pair", '"\\ud83d\\ude00"', True),
    ("y_empty_obj", "{}", True),
    ("y_empty_arr", "[]", True),
    ("y_nested", '{"a": [{"b": [null, true, false]}]}', True),
    ("y_ws", '  {  "a" :  1  }  ', True),
    ("y_unicode_raw", '"é中\U0001F432"', True),
    ("y_empty_string", '""', True),
    ("y_deep", "[" * 20 + "1" + "]" * 20, True),
    # n_: must be rejected
    ("n_truncated_obj", '{"a": 1', False),
    ("n_truncated_arr", "[1, 2", False),
    ("n_truncated_str", '"abc', False),
    ("n_bare_word", "nope", False),
    ("n_single_quote", "'abc'", False),
    ("n_trailing_comma_arr", "[1,]", False),
    ("n_trailing_comma_obj", '{"a": 1,}', False),
    ("n_leading_plus", "+1", False),
    ("n_leading_zero", "012", False),
    ("n_bare_decimal", ".5", False),
    ("n_trailing_decimal", "1.", False),
    ("n_exp_no_digits", "1e", False),
    ("n_nan", "NaN", False),
    ("n_infinity", "Infinity", False),
    ("n_neg_infinity", "-Infinity", False),
    ("n_unquoted_key", "{a: 1}", False),
    ("n_bad_escape", '"\\x41"', False),
    # lone \u-escape surrogates: ACCEPTED — verified by executing the
    # reference (r4): JS strings are WTF-16 and parse.js:361-371's pair
    # verification runs on charset decode, not escapes. JSONTestSuite
    # classes these i_ (implementation-defined); we follow the reference.
    ("i_lone_high_surrogate", '"\\ud800"', True),
    ("i_lone_low_surrogate", '"\\udc00"', True),
    ("i_swapped_surrogates", '"\\ude00\\ud83d"', True),
    ("n_control_char", '"a\x01b"', False),
    ("n_two_values", "1 2", False),
    ("n_empty", "", False),
    ("n_comma_only", ",", False),
    ("n_colon_in_array", '["a": 1]', False),
    ("n_double_comma", "[1,,2]", False),
]


@pytest.mark.parametrize("case_id,payload,ok", CASES, ids=[c[0] for c in CASES])
def test_syntax_case(case_id, payload, ok):
    if ok:
        parse_info(payload)  # must not raise
    else:
        with pytest.raises(ParseSyntaxError):
            parse_info(payload)


def test_syntax_corpus_through_spark(spark):
    """Engine classifies well-formedness per row without failing the job —
    violation row with keyword 'syntax' (FIXTURES.md §F7)."""
    from pyspark.sql import functions as F

    from jsonschemaparse_spark.plans import validate_json_column

    df = spark.createDataFrame(
        [(cid, payload, ok) for cid, payload, ok in CASES],
        "case_id string, doc string, well_formed boolean",
    )
    res = validate_json_column(df, "doc", True, key_cols=["case_id", "well_formed"])
    rows = res.annotated.collect()
    for r in rows:
        if r["well_formed"]:
            assert r["_jsp_valid"], r["case_id"]
        else:
            assert not r["_jsp_valid"], r["case_id"]
    kws = {r["keyword"] for r in res.violations().collect()}
    assert kws == {"syntax"}
