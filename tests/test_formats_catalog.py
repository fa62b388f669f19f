"""Format-enforcement extension + snapshot catalog + observe metrics."""

import pytest

from pyspark.sql import functions as F


def test_format_vacuous_by_default():
    from jsonschemaparse_spark import validate_instance

    ok, _ = validate_instance({"format": "email"}, "not-an-email")
    assert ok  # reference parity: parsed, never enforced


@pytest.mark.parametrize(
    "fmt,good,bad",
    [
        ("date-time", "2026-08-16T10:30:00Z", "2026-08-16 10:30"),
        ("date", "2026-08-16", "16/08/2026"),
        ("email", "a.b@example.com", "nope"),
        ("ipv4", "192.168.0.1", "999.1.1.1"),
        ("uri", "https://example.com/x", "no scheme here"),
        ("uuid", "123e4567-e89b-12d3-a456-426614174000", "123"),
        ("hostname", "example.com", "-bad-.com"),
        ("json-pointer", "/a/b~1c", "a/b"),
    ],
)
def test_format_enforced_python(fmt, good, bad):
    from jsonschemaparse_spark import compile_rules
    from jsonschemaparse_spark.schema.evaluate import Evaluator

    ev = Evaluator(enforce_formats=True)
    cs = compile_rules({"format": fmt})
    assert not ev.validate(cs, good)[0]
    errs = ev.validate(cs, bad)[0]
    assert errs and errs[0].keyword == "format"


def test_format_enforced_column_path(spark):
    from jsonschemaparse_spark.plans.kernels import ColumnCompiler
    from jsonschemaparse_spark.plans.validator import validate_dataframe
    from jsonschemaparse_spark import compile_rules

    df = spark.createDataFrame(
        [(1, "a@b.com"), (2, "nope")], ["id", "contact"]
    )
    cs = compile_rules({"properties": {"contact": {"format": "email"}}})
    compiler = ColumnCompiler(enforce_formats=True)
    valid, viols = compiler.compile_value(
        cs, F.struct(*[F.col(c) for c in df.columns]), df.schema, F.lit("")
    )
    got = {r["id"]: r["v"] for r in df.select("id", valid.alias("v")).collect()}
    assert got == {1: True, 2: False}

    # python and column paths agree on the same rows
    from jsonschemaparse_spark.schema.evaluate import Evaluator

    ev = Evaluator(enforce_formats=True)
    for r in df.collect():
        errs, _ = ev.validate(cs, {"id": r["id"], "contact": r["contact"]})
        assert (not errs) == got[r["id"]]


def test_catalog_snapshot_fallback(spark, tmp_path):
    from jsonschemaparse_spark.sources.catalog import (
        iceberg_available,
        read_table,
        write_snapshot,
    )

    root = str(tmp_path / "tbl")
    df1 = spark.range(5).withColumn("v", F.lit("a"))
    df2 = spark.range(9).withColumn("v", F.lit("b"))
    write_snapshot(df1, root, "s1")
    write_snapshot(df2, root, "s2")

    assert iceberg_available(spark) in (True, False)  # no jars in sandbox
    assert read_table(spark, root, "s1").count() == 5
    assert read_table(spark, root, "s2").count() == 9
    with pytest.raises(FileNotFoundError):
        read_table(spark, root, "s3")

    # drift across snapshots via the catalog (north-rule wording)
    from jsonschemaparse_spark.functions.integrity import chi2_drift

    res = chi2_drift(read_table(spark, root, "s1"), read_table(spark, root, "s2"), "v")
    assert res.drifted  # disjoint category sets

    # referential integrity ACROSS snapshots (north-rule wording): FK rows
    # present in snapshot s2 whose parents were removed by snapshot s1's
    # state — the same composition Iceberg time travel gives via
    # snapshot-id pinned reads
    from jsonschemaparse_spark.functions.integrity import referential_violations

    child = read_table(spark, root, "s2").withColumnRenamed("id", "fk")
    parent = read_table(spark, root, "s1")
    orphans = referential_violations(child, "fk", parent, "id")
    assert sorted(r["fk"] for r in orphans.collect()) == [5, 6, 7, 8]


def test_observe_metrics_single_action(spark):
    from jsonschemaparse_spark.plans import validate_dataframe

    df = spark.createDataFrame([(1, "en"), (2, "xx"), (3, "en")], ["id", "lang"])
    res = validate_dataframe(df, {"properties": {"lang": {"enum": ["en"]}}}, key_cols=["id"])
    observed, obs = res.observed()
    observed.write.format("noop").mode("overwrite").save()  # ONE action
    got = obs.get
    assert got["n_rows"] == 3 and got["n_failed_rows"] == 1 and got["n_violations"] == 1
