"""Unicode canonicalization (functions/normalize.py).

Pins: NFC parity with unicodedata (including the DuckDB-twin case
corpus), ASCII/already-NFC fast paths are value-transparent,
idempotence, the documented step order, NULL-preserve convention, and
the one-ArrowEvalPython / one-fused-Project plan shape.
"""

import unicodedata

import pytest
from pyspark.sql import functions as F

from jsonschemaparse_spark.functions.normalize import (
    CONTROL_RE,
    normalize_text,
    unicode_normalize,
)

# The pinned corpus: every shape the DuckDB oracle twin must agree on.
NFC_CASES = [
    "café",          # decomposed acute -> composed
    "é",              # already composed
    "Å",             # A + ring -> Å
    "ﬁsh",            # ligature fi (NFC-invariant; NFKC would split)
    "①",              # circled one (NFC-invariant)
    "ｆｕｌｌ",  # fullwidth (NFC-invariant)
    "à̖b",      # multiple combining marks, canonical ordering
    "ḍ̇",       # dot-below + dot-above ordering
    "ascii only",
    "",
    " nb sp",
    "ß",              # sharp s
    "İ",              # dotted capital I
    "ééé",
]


def test_nfc_matches_unicodedata(spark):
    df = spark.createDataFrame([(i, c) for i, c in enumerate(NFC_CASES)],
                               "i long, text string")
    rows = df.select("i", unicode_normalize(F.col("text")).alias("n")) \
             .collect()
    got = {r["i"]: r["n"] for r in rows}
    for i, c in enumerate(NFC_CASES):
        assert got[i] == unicodedata.normalize("NFC", c), repr(c)


@pytest.mark.parametrize("form", ["NFD", "NFKC", "NFKD"])
def test_other_forms_match_unicodedata(spark, form):
    df = spark.createDataFrame([(i, c) for i, c in enumerate(NFC_CASES)],
                               "i long, text string")
    rows = df.select("i", unicode_normalize(F.col("text"), form).alias("n")) \
             .collect()
    got = {r["i"]: r["n"] for r in rows}
    for i, c in enumerate(NFC_CASES):
        assert got[i] == unicodedata.normalize(form, c), (form, repr(c))


def test_bad_form_raises(spark):
    with pytest.raises(ValueError):
        unicode_normalize(F.col("text"), "NFX")


def test_normalize_text_full_chain(spark):
    raw = "Café\r\nline2\rline3 x\x07y\x0bz  a\t\tb"
    df = spark.createDataFrame([(1, raw)], "doc_id long, text string")
    out = normalize_text(df, collapse_whitespace=True).collect()[0]["text"]
    assert out == "Café\nline2\nline3 xyz a b"
    # Idempotent: a second pass is the identity.
    df2 = spark.createDataFrame([(1, out)], "doc_id long, text string")
    out2 = normalize_text(df2, collapse_whitespace=True).collect()[0]["text"]
    assert out2 == out


def test_normalize_text_defaults_keep_tabs_and_runs(spark):
    df = spark.createDataFrame([(1, "a\t\tb  c")], "doc_id long, text string")
    assert normalize_text(df).collect()[0]["text"] == "a\t\tb  c"


def test_step_order_control_blocks_composition(spark):
    # Documented edge: NFC runs FIRST, so a control byte between base
    # and combining mark blocks composition even after the control is
    # stripped (module docstring pins this order as the contract).
    df = spark.createDataFrame([(1, "e\x01́")], "doc_id long, text string")
    assert normalize_text(df).collect()[0]["text"] == "é"


def test_null_preserved_and_output_col(spark):
    df = spark.createDataFrame([(1, None), (2, "ok")],
                               "doc_id long, text string")
    rows = {r["doc_id"]: r["t2"]
            for r in normalize_text(df, output_col="t2").collect()}
    assert rows[1] is None and rows[2] == "ok"


def test_form_none_is_pure_jvm(spark):
    df = spark.createDataFrame([(1, "a\r\nb c\x00d")],
                               "doc_id long, text string")
    out = normalize_text(df, form=None)
    assert out.collect()[0]["text"] == "a\nb cd"
    assert "ArrowEvalPython" not in out._jdf.queryExecution().executedPlan() \
        .toString()


def test_plan_one_arrow_node_one_fused_project(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    out = normalize_text(df, collapse_whitespace=True)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") == 1
    # The JVM cleanup chain collapses into a single Project above the
    # Arrow node (CollapseProject) — N options must not mean N Projects.
    assert plan.count("Project") <= 2


def test_duckdb_oracle_twin_agrees():
    # The exact expression oracle_sql() uses, replayed over the pinned
    # corpus: nfc_normalize + the portable regex chain must equal the
    # Python-side semantics character for character.
    duckdb = pytest.importorskip("duckdb")
    for c in NFC_CASES + ["a\r\nb\rc", "x\x07y\x7fz", "t t"]:
        got = duckdb.sql(
            "SELECT regexp_replace(replace(regexp_replace("
            "nfc_normalize(?), '\\r\\n?', chr(10), 'g'), chr(160), ' '), "
            "'[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]', '', 'g')",
            params=[c]).fetchone()[0]
        import re
        want = unicodedata.normalize("NFC", c)
        want = re.sub(r"\r\n?", "\n", want).replace(" ", " ")
        want = re.sub(CONTROL_RE, "", want)
        assert got == want, repr(c)
