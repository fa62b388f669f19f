"""Within-document duplicate-line removal (functions/dedup.py
dedupe_lines_within_doc): keep-first verbatim, trim-keyed matching,
blank lines never keyed, byte-identity round-trip, NULL convention."""

from pyspark.sql import functions as F

from jsonschemaparse_spark.functions.dedup import dedupe_lines_within_doc


def _collect(df, col="text"):
    return {r["doc_id"]: r[col] for r in df.collect()}


def test_keep_first_verbatim_trim_keyed(spark):
    text = "Share this\nbody one\n  Share this  \nbody two\nShare this"
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = _collect(dedupe_lines_within_doc(df, "doc_id"))
    # first occurrence survives VERBATIM; later trim-equal repeats drop
    assert got[1] == "Share this\nbody one\nbody two"


def test_blank_lines_always_kept(spark):
    text = "para one\n\npara two\n\npara one"
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = _collect(dedupe_lines_within_doc(df, "doc_id"))
    assert got[1] == "para one\n\npara two\n"


def test_cross_doc_repeats_untouched(spark):
    # the WITHIN-doc rule: the same line in two different docs survives
    # in both (cross-doc is strip_boilerplate_lines' job)
    df = spark.createDataFrame(
        [(1, "shared line\nunique a"), (2, "shared line\nunique b")],
        "doc_id long, text string")
    got = _collect(dedupe_lines_within_doc(df, "doc_id"))
    assert got == {1: "shared line\nunique a", 2: "shared line\nunique b"}


def test_no_repeats_round_trips_byte_identically(spark):
    weird = "  indented\n\ttabbed\n\ntrailing  \n"
    df = spark.createDataFrame([(1, weird), (2, None), (3, "")],
                               "doc_id long, text string")
    got = _collect(dedupe_lines_within_doc(df, "doc_id"))
    assert got[1] == weird
    assert got[2] is None
    assert got[3] == ""


def test_output_col_and_no_python(spark):
    df = spark.createDataFrame([(1, "a\na")], "doc_id long, text string")
    out = dedupe_lines_within_doc(df, "doc_id", out_col="clean")
    row = out.collect()[0]
    assert (row["text"], row["clean"]) == ("a\na", "a")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_null_id_doc_passes_through_untouched(spark):
    # r6 review finding #2: the rebuild join is an equality join, so a
    # NULL-id doc never matches — it must pass through, not wipe to ''
    from jsonschemaparse_spark.functions.dedup import (
        remove_duplicate_spans,
        strip_boilerplate_lines,
    )

    df = spark.createDataFrame(
        [(None, "a\na\nkeep me"), (1, "b\nb")],
        "doc_id long, text string")
    got = {r["doc_id"]: r["text"]
           for r in dedupe_lines_within_doc(df, "doc_id").collect()}
    assert got[None] == "a\na\nkeep me"
    assert got[1] == "b"
    # same convention across the rebuild family
    df2 = spark.createDataFrame(
        [(None, "hot\nown"), (1, "hot\nx"), (2, "hot\ny")],
        "doc_id long, text string")
    got2 = {r["doc_id"]: r["text"]
            for r in strip_boilerplate_lines(df2, "doc_id").collect()}
    assert got2[None] == "hot\nown"
    assert got2[1] == "x" and got2[2] == "y"
    span = ("First sentence here. Second sentence too. Third one closes. "
            "Tail unique SENTINEL.")
    df3 = spark.createDataFrame(
        [(None, span)], "doc_id long, text string")
    got3 = remove_duplicate_spans(df3, "doc_id").collect()[0]["text"]
    assert got3 == span
