"""M7 checkpoint/resume + M8 streaming tests."""

import pytest

from pyspark.sql import functions as F

RULES = {
    "type": "object",
    "required": ["url", "text", "lang"],
    "properties": {
        "text": {"type": "string", "minLength": 1},
        "lang": {"enum": ["en", "de", "fr", "es", "zh", "ja", "ru", "pt", "it", "nl"]},
    },
}


@pytest.fixture(scope="module")
def pages_dir(spark, tmp_path_factory):
    from jsonschemaparse_spark.sources import synthesize_webpages

    d = str(tmp_path_factory.mktemp("pages"))
    synthesize_webpages(spark, 3000, partitions=6).write.mode("overwrite").parquet(d)
    return d


def test_checkpoint_resume(spark, pages_dir, tmp_path_factory):
    from jsonschemaparse_spark.plans.checkpoint import run_with_checkpoint

    state = str(tmp_path_factory.mktemp("state"))

    first = run_with_checkpoint(spark, pages_dir, RULES, state, key_cols=["url"])
    assert first.n_files_skipped == 0
    assert first.n_files_total >= 6
    total_rows = sum(r["n_rows"] for r in first.verdicts.collect())
    assert total_rows == 3000
    base_failed = sum(r["n_failed_rows"] for r in first.verdicts.collect())

    # resume: everything already done -> zero work, identical verdicts
    second = run_with_checkpoint(spark, pages_dir, RULES, state, key_cols=["url"])
    assert second.n_files_skipped == second.n_files_total
    assert second.violations.count() == 0
    assert sum(r["n_rows"] for r in second.verdicts.collect()) == 3000
    assert sum(r["n_failed_rows"] for r in second.verdicts.collect()) == base_failed

    # different snapshot id -> full re-run (lineage is per snapshot)
    third = run_with_checkpoint(spark, pages_dir, RULES, state, snapshot_id="snap1", key_cols=["url"])
    assert third.n_files_skipped == 0


def test_checkpoint_partial_resume(spark, pages_dir, tmp_path_factory):
    """Kill-and-rerun: with only half the state present, the rerun touches
    only the missing files and final verdicts match a fresh full run."""
    from jsonschemaparse_spark.plans.checkpoint import run_with_checkpoint

    full_state = str(tmp_path_factory.mktemp("state_full"))
    full = run_with_checkpoint(spark, pages_dir, RULES, full_state, key_cols=["url"])
    full_metrics = {r["file"]: r["n_rows"] for r in full.verdicts.collect()}

    # simulate a crash: state contains only half the files
    half_state = str(tmp_path_factory.mktemp("state_half"))
    keep = sorted(full_metrics)[: len(full_metrics) // 2]
    (
        spark.read.parquet(f"{full_state}/metrics")
        .filter(F.col("file").isin(keep))
        .write.mode("overwrite")
        .parquet(f"{half_state}/metrics")
    )
    resumed = run_with_checkpoint(spark, pages_dir, RULES, half_state, key_cols=["url"])
    assert resumed.n_files_skipped == len(keep)
    got = {r["file"]: r["n_rows"] for r in resumed.verdicts.collect()}
    assert got == full_metrics


def test_streaming_validation(spark, pages_dir, tmp_path_factory):
    """availableNow file stream through the same kernels + windowed rollup."""
    from jsonschemaparse_spark.streaming import validate_stream, windowed_verdicts

    schema = spark.read.parquet(pages_dir).schema
    stream = spark.readStream.schema(schema).parquet(pages_dir)
    assert stream.isStreaming

    annotated = validate_stream(stream, RULES)
    verd = windowed_verdicts(annotated, ts_col="warc_ts", window="10 minutes",
                             watermark="2 hours")
    q = (
        verd.writeStream.format("memory")
        .queryName("verdicts_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from verdicts_stream").collect()
    assert rows, "no windows emitted"
    # batch pass over the same data must agree on totals
    batch_total = spark.read.parquet(pages_dir).count()
    stream_total = sum(r["n_rows"] for r in rows)
    assert stream_total == batch_total
    # the same rule evaluation: per-window failures sum to the batch count
    from jsonschemaparse_spark.plans import validate_dataframe

    batch_failed = validate_dataframe(
        spark.read.parquet(pages_dir), RULES, key_cols=["url"]
    ).summary()["n_failed_rows"]
    assert sum(r["n_failed_rows"] for r in rows) == batch_failed


def test_foreach_batch_sink(spark, pages_dir):
    from jsonschemaparse_spark.streaming import foreach_batch_sink

    schema = spark.read.parquet(pages_dir).schema
    stream = spark.readStream.schema(schema).parquet(pages_dir)
    seen = {}

    def on_batch(violations, verdicts, batch_id):
        seen["violations"] = violations.count()
        seen["rows"] = sum(r["n_rows"] for r in verdicts.collect())

    q = (
        stream.writeStream.foreachBatch(
            foreach_batch_sink(RULES, on_batch, key_cols=["url"])
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert seen["rows"] == 3000
    assert seen["violations"] > 0


def test_streaming_dedup(spark, tmp_path_factory):
    """dropDuplicatesWithinWatermark stream agrees with batch dropDuplicates
    when all duplicates fall inside the watermark horizon."""
    from jsonschemaparse_spark.sources import synthesize_webpages
    from jsonschemaparse_spark.streaming import streaming_dedup

    d = str(tmp_path_factory.mktemp("dup_pages"))
    base = synthesize_webpages(spark, 500, partitions=2)
    base.unionByName(base).write.mode("overwrite").parquet(d)  # every url twice

    schema = spark.read.parquet(d).schema
    stream = spark.readStream.schema(schema).parquet(d)
    deduped = streaming_dedup(stream, "url", ts_col="warc_ts", watermark="1 hour")
    q = (
        deduped.writeStream.format("memory").queryName("dedup_sink")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.sql("select count(*) n, count(distinct url) d from dedup_sink").first()
    assert got["n"] == 500 and got["d"] == 500


def test_stateful_validation_monitor(spark, pages_dir):
    """applyInPandasWithState accumulates per-key totals across
    micro-batches; final per-key totals equal the batch groupBy."""
    from jsonschemaparse_spark.streaming import (
        stateful_validation_monitor,
        validate_stream,
    )

    schema = spark.read.parquet(pages_dir).schema
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", "2").parquet(pages_dir)
    annotated = validate_stream(stream, RULES)
    monitored = stateful_validation_monitor(annotated, "lang", threshold=0.99)
    q = (
        monitored.writeStream.format("memory").queryName("monitor_sink")
        .outputMode("update").trigger(availableNow=True).start()
    )
    q.awaitTermination(180)

    # last emission per key = cumulative totals = batch ground truth
    got = {
        r["lang"]: (r["n_rows"], r["n_failed"])
        for r in spark.sql(
            "select lang, max(n_rows) n_rows, max(n_failed) n_failed "
            "from monitor_sink group by lang"
        ).collect()
    }
    from jsonschemaparse_spark.plans import validate_dataframe

    batch = validate_dataframe(spark.read.parquet(pages_dir), RULES, key_cols=["url"])
    truth = {
        r["lang"]: (r["n"], r["f"])
        for r in batch.annotated.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum(F.when(F.col("_jsp_valid"), 0).otherwise(1)).alias("f"))
        .collect()
    }
    assert got == truth


# ---------------------------------------------------------------------------
# r4 stretch (VERDICT r3 #9): JSON checkpoint + the SOUND typed-skip e2e
# ---------------------------------------------------------------------------
JSON_RULES = {
    "type": "object",
    "required": ["k"],
    "properties": {"k": {"type": "integer", "maximum": 30}},
}


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _verdict_map(run):
    return {
        r["file"].rsplit("/", 1)[-1]: (r["n_rows"], r["n_failed_rows"],
                                       r["n_violations"], r["pass"])
        for r in run.verdicts.collect()
    }


def test_json_checkpoint_kill_rerun_and_typed_skip(spark, tmp_path_factory):
    from jsonschemaparse_spark.plans.checkpoint import run_json_with_checkpoint

    data = str(tmp_path_factory.mktemp("json_data"))
    state = str(tmp_path_factory.mktemp("json_state"))

    # batch 1: all docs parse cleanly; ids > 30 violate maximum (violations
    # WITHOUT any row hitting the rescue UDF -> the run is provably clean)
    spark.createDataFrame(
        [(i, '{"k": %d}' % i) for i in range(50)], "id long, doc string"
    ).coalesce(1).write.mode("append").parquet(data)

    r1 = run_json_with_checkpoint(spark, data, "doc", JSON_RULES, state)
    assert (r1.n_files_total, r1.n_files_skipped, r1.engine_used) == (1, 0, "auto")
    assert all(r["clean_typed_ok"] for r in r1.verdicts.collect())
    # the hybrid first pass carries the Python rescue stage in-plan
    assert "Python" in _plan(r1.violations)
    v1 = _verdict_map(r1)

    # "kill" after batch 1's state landed; new data arrives
    spark.createDataFrame(
        [(100 + i, '{"k": %d}' % i) for i in range(40)], "id long, doc string"
    ).coalesce(1).write.mode("append").parquet(data)

    r2 = run_json_with_checkpoint(spark, data, "doc", JSON_RULES, state)
    assert (r2.n_files_total, r2.n_files_skipped) == (2, 1)
    v2 = _verdict_map(r2)
    assert set(v1) < set(v2) and all(v2[f] == v1[f] for f in v1)

    # identical results vs a from-scratch run over the same inputs
    fresh_state = str(tmp_path_factory.mktemp("json_state_fresh"))
    rf = run_json_with_checkpoint(spark, data, "doc", JSON_RULES, fresh_state)
    assert _verdict_map(rf) == v2
    assert rf.violations.count() == (
        spark.read.parquet(f"{state}/violations").count()
    )  # resumed runs accumulated exactly the fresh run's violation rows

    # reprocess: every file proved clean -> UDF-free typed plan end-to-end
    r3 = run_json_with_checkpoint(
        spark, data, "doc", JSON_RULES, state, reprocess=True
    )
    assert (r3.engine_used, r3.n_files_typed) == ("typed", 2)
    assert "Python" not in _plan(r3.violations)  # the skipped stage, absent
    assert _verdict_map(r3) == v2  # identical verdicts, rows, violations


def test_json_checkpoint_flagged_files_stay_on_auto(spark, tmp_path_factory):
    """A run with rows routed to the rescue UDF (type-mismatch docs) must
    NOT be marked clean; reprocess keeps those files on the full engine."""
    from jsonschemaparse_spark.plans.checkpoint import run_json_with_checkpoint

    data = str(tmp_path_factory.mktemp("json_dirty"))
    state = str(tmp_path_factory.mktemp("json_dirty_state"))
    spark.createDataFrame(
        [(1, '{"k": 5}'), (2, '{"k": "not-an-int"}'), (3, '{"k": 60}')],
        "id long, doc string",
    ).coalesce(1).write.mode("append").parquet(data)

    r1 = run_json_with_checkpoint(spark, data, "doc", JSON_RULES, state)
    assert not any(r["clean_typed_ok"] for r in r1.verdicts.collect())
    v1 = _verdict_map(r1)

    r2 = run_json_with_checkpoint(
        spark, data, "doc", JSON_RULES, state, reprocess=True
    )
    assert (r2.engine_used, r2.n_files_typed) == ("auto", 0)
    assert _verdict_map(r2) == v1


def test_json_checkpoint_per_file_graduation_and_no_dup(spark, tmp_path_factory):
    """r4 review fixes #3/#5: a clean file in the same batch as a dirty
    file still graduates to the typed skip (per-file flag aggregation, not
    the run-wide observation), and reprocess SUPERSEDES the snapshot's
    persisted violations instead of appending duplicates."""
    from jsonschemaparse_spark.plans.checkpoint import run_json_with_checkpoint

    data = str(tmp_path_factory.mktemp("json_mixed"))
    state = str(tmp_path_factory.mktemp("json_mixed_state"))
    # file 1: clean-parsing docs (some violate maximum -> violations only)
    spark.createDataFrame(
        [(i, '{"k": %d}' % i) for i in range(40)], "id long, doc string"
    ).coalesce(1).write.mode("append").parquet(data)
    # file 2: contains a type-mismatch doc -> flagged rows
    spark.createDataFrame(
        [(100, '{"k": 1}'), (101, '{"k": "zzz"}')], "id long, doc string"
    ).coalesce(1).write.mode("append").parquet(data)

    r1 = run_json_with_checkpoint(spark, data, "doc", JSON_RULES, state)
    by_file = {r["file"]: r["clean_typed_ok"] for r in r1.verdicts.collect()}
    assert sorted(by_file.values()) == [False, True]  # one graduates, one not
    v1 = _verdict_map(r1)
    n_persisted_1 = spark.read.parquet(f"{state}/violations").count()

    # reprocess: ONE file on the typed plan, the dirty one stays on auto
    r2 = run_json_with_checkpoint(
        spark, data, "doc", JSON_RULES, state, reprocess=True
    )
    assert (r2.engine_used, r2.n_files_typed) == ("mixed", 1)
    assert _verdict_map(r2) == v1
    # supersede, not append: the durable violations store did not grow
    assert spark.read.parquet(f"{state}/violations").count() == n_persisted_1

    # a second reprocess is idempotent too
    r3 = run_json_with_checkpoint(
        spark, data, "doc", JSON_RULES, state, reprocess=True
    )
    assert _verdict_map(r3) == v1
    assert spark.read.parquet(f"{state}/violations").count() == n_persisted_1


def test_validate_json_stream(spark, tmp_path_factory):
    """Streaming JSON validation (typed + arrow engines) agrees with the
    batch hybrid pass on verdict totals; the typed plan is a pure
    projection (composes with availableNow file streams)."""
    from jsonschemaparse_spark.plans.json_validator import validate_json_column
    from jsonschemaparse_spark.streaming import validate_json_stream

    d = str(tmp_path_factory.mktemp("json_stream"))
    spark.createDataFrame(
        [(i, '{"k": %d}' % (i % 70)) for i in range(400)]
        + [(1000, '{"k": "bad"}'), (1001, None)],
        "id long, doc string",
    ).write.mode("overwrite").parquet(d)
    batch = spark.read.parquet(d)
    expected_failed = (
        validate_json_column(batch, "doc", JSON_RULES, key_cols=["id"])
        .annotated.filter("NOT _jsp_valid").count()
    )

    schema = batch.schema
    for engine in ("typed", "arrow"):
        stream = spark.readStream.schema(schema).parquet(d)
        ann = validate_json_stream(stream, "doc", JSON_RULES,
                                   key_cols=["id"], engine=engine)
        assert ann.isStreaming
        name = f"json_stream_{engine}"
        q = (ann.writeStream.format("memory").queryName(name)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(120)
        got = spark.sql(
            f"select count(*) n, sum(case when _jsp_valid then 0 else 1 end) f "
            f"from {name}").first()
        assert got["n"] == 402
        assert got["f"] == expected_failed, engine


# =========================================================================
# moved from test_round2_fixes.py (round-fix regression pins, split by
# topic per VERDICT r5 #8)
# =========================================================================
import pytest  # noqa: E402,F811,F401
from pyspark.sql import functions as F  # noqa: E402,F811,F401
from jsonschemaparse_spark.plans import VALID_COL  # noqa: E402,F811,F401

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


# =========================================================================
# moved from test_round5_fixes.py (round-fix regression pins, split by
# topic per VERDICT r5 #8)
# =========================================================================
import pytest  # noqa: E402,F811,F401
from pyspark.sql import functions as F  # noqa: E402,F811,F401

def test_checkpoint_empty_input_no_state(spark, tmp_path):
    from jsonschemaparse_spark.plans.checkpoint import (
        run_json_with_checkpoint,
        run_with_checkpoint,
    )

    empty_in = str(tmp_path / "empty_in")
    spark.createDataFrame([], "id long, doc string") \
        .coalesce(1).write.parquet(empty_in)
    # parquet dir with a zero-row file still yields 0 distinct input files
    run = run_json_with_checkpoint(
        spark, empty_in, "doc", {"properties": {}},
        state_dir=str(tmp_path / "state_a"), key_cols=["id"],
    )
    assert run.verdicts.count() == 0
    assert run.n_files_total <= 1 and run.engine_used in ("none", "auto")

    run2 = run_with_checkpoint(
        spark, empty_in, {"properties": {}},
        state_dir=str(tmp_path / "state_b"), key_cols=["id"],
    )
    assert run2.verdicts.count() == 0


def test_checkpoint_verdicts_column_order_consistent(spark, tmp_path):
    """Fresh-state empty verdicts and existing-state reads expose the same
    column ORDER (review #8)."""
    from jsonschemaparse_spark.plans.checkpoint import run_with_checkpoint

    empty_in = str(tmp_path / "in")
    spark.createDataFrame([], "id long, text string").coalesce(1) \
        .write.parquet(empty_in)
    fresh = run_with_checkpoint(
        spark, empty_in, {"properties": {}},
        state_dir=str(tmp_path / "st"), key_cols=["id"])
    data_in = str(tmp_path / "in2")
    spark.createDataFrame([(1, "x")], "id long, text string").coalesce(1) \
        .write.parquet(data_in)
    real = run_with_checkpoint(
        spark, data_in, {"properties": {}},
        state_dir=str(tmp_path / "st2"), key_cols=["id"])
    assert fresh.verdicts.columns == real.verdicts.columns

