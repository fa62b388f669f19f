"""r4 closing edge-case sweep: degenerate inputs through the table engine
and the new pipeline ops — empty frames, all-null columns, empty strings,
single-row tables. Cheap insurance that the 100-TB paths don't assume
non-degenerate partitions."""

import pytest

from pyspark.sql import functions as F


def test_validate_empty_dataframe(spark):
    from jsonschemaparse_spark.plans import validate_dataframe

    df = spark.createDataFrame([], "doc_id long, text string")
    res = validate_dataframe(df, {"required": ["text"]}, key_cols=["doc_id"])
    assert res.violations().count() == 0
    assert res.verdicts().count() == 0
    assert res.summary()["pass"] is True


def test_validate_all_null_column(spark):
    from jsonschemaparse_spark.plans import validate_dataframe

    df = spark.createDataFrame([(1, None), (2, None)], "id long, s string")
    res = validate_dataframe(
        df, {"required": ["s"], "properties": {"s": {"minLength": 3}}},
        key_cols=["id"])
    rows = res.violations().collect()
    # NULL column == absent property: required fires, minLength vacuous
    assert {r["keyword"] for r in rows} == {"required"}
    assert res.annotated.filter(F.col("_jsp_valid")).count() == 0


def test_pipeline_ops_on_empty_and_degenerate(spark):
    from jsonschemaparse_spark.functions.dedup import (
        duplicate_line_groups,
        exact_duplicate_groups,
        minhash_near_duplicates,
        strip_boilerplate_lines,
    )
    from jsonschemaparse_spark.functions.text import (
        detect_language,
        gopher_quality_flags,
    )
    from jsonschemaparse_spark.functions.web import url_duplicate_groups

    empty = spark.createDataFrame([], "doc_id long, text string")
    assert exact_duplicate_groups(empty, "doc_id").count() == 0
    assert duplicate_line_groups(empty, "doc_id").count() == 0
    assert gopher_quality_flags(empty).count() == 0
    assert minhash_near_duplicates(empty, "doc_id").count() == 0
    assert strip_boilerplate_lines(empty, "doc_id").count() == 0

    degenerate = spark.createDataFrame(
        [(1, ""), (2, None), (3, " \n \n ")], "doc_id long, text string")
    gq = {r["doc_id"]: r for r in gopher_quality_flags(degenerate).collect()}
    assert all(gq[i]["n_words"] == 0 and gq[i]["gopher_keep"] is False
               for i in (1, 2, 3))
    assert detect_language(degenerate).count() == 3
    assert duplicate_line_groups(degenerate, "doc_id").count() == 0
    stripped = {r["doc_id"]: r["text"]
                for r in strip_boilerplate_lines(degenerate, "doc_id").collect()}
    # NULL-text convention (r6, tests/test_null_conventions.py): rewriting
    # ops PRESERVE NULL rather than coalescing to "".
    assert stripped[2] is None

    urls_empty = spark.createDataFrame([], "doc_id long, url string")
    assert url_duplicate_groups(urls_empty, "doc_id").count() == 0


def test_single_row_everything(spark):
    from jsonschemaparse_spark.functions.dedup import minhash_near_duplicates
    from jsonschemaparse_spark.functions.similarity import brute_force_topk
    from jsonschemaparse_spark.plans import validate_dataframe

    one = spark.createDataFrame([(1, "solo words here")], "doc_id long, text string")
    assert minhash_near_duplicates(one, "doc_id").count() == 0
    res = validate_dataframe(one, {"properties": {"text": {"minLength": 1}}},
                             key_cols=["doc_id"])
    assert res.summary()["pass"] is True
    emb = spark.createDataFrame([(1, [1.0, 0.0])], "vec_id long, embedding array<double>")
    top = brute_force_topk(emb, [1.0, 0.0], k=5).collect()
    assert [r["vec_id"] for r in top] == [1]


def test_json_paths_on_empty(spark):
    from jsonschemaparse_spark.plans import validate_json_column
    from jsonschemaparse_spark.plans.json_validator import validate_json_positions

    empty = spark.createDataFrame([], "id long, doc string")
    rules = {"properties": {"k": {"type": "integer"}}}
    res = validate_json_column(empty, "doc", rules, key_cols=["id"])
    assert res.violations().count() == 0
    assert validate_json_positions(empty, "doc", rules, key_cols=["id"]).count() == 0
