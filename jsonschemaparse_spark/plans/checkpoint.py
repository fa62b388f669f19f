"""Checkpoint/resume with per-unit lineage + metrics (north rule M7).

The resumable unit is the INPUT FILE (parquet split): the sandbox stand-in
for an Iceberg snapshot's file manifest. A state table under `state_dir`
records (snapshot_id, file) -> metrics for every completed unit; re-runs
skip completed units and only validate new ones, then verdicts are the union
of stored + fresh metrics. This is the distributed analog of the reference's
`done` promise / incremental writes (parse.js:224-233, 318-326): progress is
durable at unit granularity, and a killed run resumes where it left off.

On Iceberg the same design keys on (snapshot_id, manifest file); here the
snapshot_id is a caller-supplied label (e.g. the input dir's mtime hash).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .validator import VALID_COL, VIOLATIONS_COL, validate_dataframe

_FILE_COL = "_jsp_file"


@dataclass
class CheckpointedRun:
    verdicts: DataFrame      # one row per input file (completed or fresh)
    violations: DataFrame    # violations from files processed THIS run
    n_files_total: int
    n_files_skipped: int


def _metrics_path(state_dir: str) -> str:
    return os.path.join(state_dir, "metrics")


def _violations_path(state_dir: str) -> str:
    return os.path.join(state_dir, "violations")


def _read_verdicts(spark, metrics_path: str, snapshot_id: str,
                   schema: str) -> DataFrame:
    """This snapshot's per-file metric rows — or an empty frame with the
    same schema when the metrics store was never written (zero input
    files on a fresh state dir; the bare read would raise
    AnalysisException, ADVICE r4)."""
    if os.path.exists(metrics_path):
        return spark.read.parquet(metrics_path).filter(
            F.col("snapshot_id") == snapshot_id
        )
    return spark.createDataFrame([], schema)


def run_with_checkpoint(
    spark: SparkSession,
    input_path: str,
    rules,
    state_dir: str,
    snapshot_id: str = "snap0",
    key_cols=None,
) -> CheckpointedRun:
    """Validate `input_path` (parquet), resuming from `state_dir`.

    Per-file metrics: (snapshot_id, file, n_rows, n_failed_rows,
    n_violations, pass). Files already recorded for this snapshot_id are
    pruned from the scan (file-list pushdown: the skipped files are never
    opened — check the plan's file listing)."""
    df = spark.read.parquet(input_path)
    all_files = [
        r["f"] for r in df.select(F.input_file_name().alias("f")).distinct().collect()
    ]

    done: set[str] = set()
    metrics_path = _metrics_path(state_dir)
    have_state = os.path.exists(metrics_path)
    if have_state:
        prior = spark.read.parquet(metrics_path).filter(F.col("snapshot_id") == snapshot_id)
        done = {r["file"] for r in prior.select("file").distinct().collect()}

    todo = [f for f in all_files if f not in done]

    if todo:
        fresh_df = spark.read.parquet(*todo)
        # Capture the file AT SCAN TIME: input_file_name() evaluated above a
        # later exchange (the Arrow fallback path repartitions) returns ''.
        # The _jsp_ prefix keeps the helper column OUT of the validated row
        # object (validate_dataframe excludes internal columns), and passing
        # it as a KEY column threads it through every engine path (Column,
        # per-column fallback, whole-row Arrow) to the annotated output.
        keys = list(key_cols) if key_cols else [fresh_df.columns[0]]
        res = validate_dataframe(
            fresh_df.withColumn(_FILE_COL, F.input_file_name()),
            rules, key_cols=keys + [_FILE_COL],
        )
        fresh_metrics = (
            res.annotated.groupBy(F.col(_FILE_COL).alias("file"))
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.when(F.col(VALID_COL), 0).otherwise(1)).alias("n_failed_rows"),
                F.sum(res._n_viols()).alias("n_violations"),
            )
            .withColumn("pass", F.col("n_failed_rows") == 0)
            .withColumn("snapshot_id", F.lit(snapshot_id))
        )
        fresh_metrics.write.mode("append").parquet(metrics_path)
        violations = res.violations().drop(_FILE_COL)
        violations.write.mode("append").parquet(_violations_path(state_dir))
    else:
        # Nothing fresh: return an EMPTY frame with the real violations
        # schema (key cols + 6 report fields) so downstream appends/unions
        # don't produce a schema-mismatched parquet dir.
        keys = list(key_cols) if key_cols else [df.columns[0]]
        from pyspark.sql.types import StructType
        fields = [df.schema[k] for k in keys]
        schema = StructType(fields).add("constraint_id", "string") \
            .add("path", "string").add("keyword", "string") \
            .add("expected", "string").add("actual", "string") \
            .add("message", "string")
        violations = spark.createDataFrame([], schema)

    verdicts = _read_verdicts(
        spark, metrics_path, snapshot_id,
        # column ORDER matches the written parquet layout (groupBy cols,
        # aggs, then the two withColumns — r5 review #8: a fresh-state
        # empty frame must not reorder vs an existing-state read)
        "file string, n_rows long, n_failed_rows long, n_violations long, "
        "pass boolean, snapshot_id string",
    )
    return CheckpointedRun(
        verdicts=verdicts,
        violations=violations,
        n_files_total=len(all_files),
        n_files_skipped=len(all_files) - len(todo),
    )


@dataclass
class CheckpointedJsonRun:
    verdicts: DataFrame      # one row per input file (completed or fresh)
    violations: DataFrame    # violations from files processed THIS run
    n_files_total: int
    n_files_skipped: int
    n_files_typed: int       # files revalidated on the UDF-free typed plan
    engine_used: str         # 'auto' | 'typed' | 'mixed' | 'none'


def run_json_with_checkpoint(
    spark: SparkSession,
    input_path: str,
    json_col: str,
    rules,
    state_dir: str,
    snapshot_id: str = "snap0",
    key_cols=None,
    reprocess: bool = False,
) -> CheckpointedJsonRun:
    """JSON-column checkpointed validation with the SOUND typed-skip
    (VERDICT r2/r3 stretch, end-to-end): every run records, PER FILE,
    whether any of that file's rows was routed to the Python rescue UDF —
    the hybrid path's needs_py flag surfaced as a column
    (validate_json_column(keep_flag_col=...)), aggregated in the same
    per-file pass as the metrics (r4 review finding #5: the run-wide
    Observation would let one dirty file block every clean file's
    graduation). On `reprocess=True`, files whose prior run recorded zero
    flagged rows are revalidated with engine='typed' on the exact struct
    the hybrid routed through: identical results BY CONSTRUCTION (zero
    flagged rows means the JVM from_json verdicts were never overridden)
    and the plan carries no Python stage (plan-asserted in
    tests/test_streaming_checkpoint.py). Files with flagged rows, or
    whose run used the Arrow path (flag column is all-True there), stay
    on engine='auto'.

    State (both snapshot-keyed so reprocess can supersede):
    - metrics:    (snapshot_id, file, n_rows, n_failed_rows, n_violations,
                   pass, clean_typed_ok)
    - violations: report rows + (snapshot_id, file)
    Reprocess rewrites replace this snapshot's rows via write-to-temp-
    then-swap — never an in-lineage overwrite of the parquet being read
    (r4 review finding #4: the self-overwrite hazard). Lineage/skip
    semantics match run_with_checkpoint (file-granular, pruned scans)."""
    from .json_validator import validate_json_column

    FLAG = "_jsp_rescue_flag"
    df = spark.read.parquet(input_path)
    all_files = [
        r["f"] for r in df.select(F.input_file_name().alias("f")).distinct().collect()
    ]

    metrics_path = _metrics_path(state_dir)
    violations_path = _violations_path(state_dir)
    prior_rows = []
    if os.path.exists(metrics_path):
        prior_rows = (
            spark.read.parquet(metrics_path)
            .filter(F.col("snapshot_id") == snapshot_id)
            .collect()
        )
    done = {r["file"] for r in prior_rows}
    clean_ok = {r["file"] for r in prior_rows if r["clean_typed_ok"]}

    if reprocess:
        typed_files = [f for f in all_files if f in clean_ok]
        auto_files = [f for f in all_files if f not in clean_ok]
        skipped = 0
    else:
        typed_files = []
        auto_files = [f for f in all_files if f not in done]
        skipped = len(all_files) - len(auto_files)

    keys = list(key_cols) if key_cols else [df.columns[0]]
    all_violations = []
    fresh_metrics_rows = []
    n_typed = 0

    def _run(files, engine):
        part = spark.read.parquet(*files).withColumn(_FILE_COL, F.input_file_name())
        if engine == "typed":
            # revalidate on the EXACT struct the hybrid routed through, so
            # the identical-results guarantee is schema-for-schema, not
            # merely equivalent-by-inference
            from ..schema.compiler import compile_rules
            from .json_validator import _typed_route_schema, validate_json_typed

            cs = rules if not isinstance(rules, dict) else compile_rules(rules)
            res = validate_json_typed(
                part, json_col, cs, _typed_route_schema(cs),
                key_cols=keys + [_FILE_COL], extensions=False,
            )
            res.annotated = res.annotated.withColumn(FLAG, F.lit(False))
        else:
            res = validate_json_column(
                part, json_col, rules, key_cols=keys + [_FILE_COL],
                engine=engine, keep_flag_col=FLAG,
            )
        per_file = (
            res.annotated.groupBy(F.col(_FILE_COL).alias("file"))
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.when(F.col(VALID_COL), 0).otherwise(1)).alias("n_failed_rows"),
                F.sum(res._n_viols()).alias("n_violations"),
                F.sum(F.col(FLAG).cast("long")).alias("n_flagged"),
            )
            .withColumn("pass", F.col("n_failed_rows") == 0)
            .collect()  # one tiny row per file
        )
        for r in per_file:
            fresh_metrics_rows.append(
                (snapshot_id, r["file"], r["n_rows"], r["n_failed_rows"],
                 r["n_violations"], r["pass"], (r["n_flagged"] or 0) == 0)
            )
        all_violations.append(
            res.violations()
            .withColumnRenamed(_FILE_COL, "file")
            .withColumn("snapshot_id", F.lit(snapshot_id))
        )
        return res

    if auto_files:
        _run(auto_files, "auto")
    if typed_files:
        _run(typed_files, "typed")
        n_typed = len(typed_files)

    # persist fresh state; reprocess REPLACES this snapshot's rows
    def _swap_write(frame: DataFrame, path: str) -> None:
        """Materialize to a sibling temp dir, then swap directories — the
        frame may READ `path`, so an in-place overwrite would delete its
        own source mid-computation (cache eviction / lost-executor replay
        recomputes from the deleted files)."""
        import shutil
        import uuid

        tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
        frame.write.mode("overwrite").parquet(tmp)
        if os.path.exists(path):
            shutil.rmtree(path)
        os.rename(tmp, path)

    if fresh_metrics_rows:
        fresh = spark.createDataFrame(
            fresh_metrics_rows,
            "snapshot_id string, file string, n_rows long, n_failed_rows long, "
            "n_violations long, pass boolean, clean_typed_ok boolean",
        )
        if reprocess and os.path.exists(metrics_path):
            keep = spark.read.parquet(metrics_path).filter(
                F.col("snapshot_id") != snapshot_id
            )
            _swap_write(keep.unionByName(fresh), metrics_path)
        else:
            fresh.write.mode("append").parquet(metrics_path)

    if all_violations:
        fresh_viols = all_violations[0]
        for v in all_violations[1:]:
            fresh_viols = fresh_viols.unionByName(v)
        if reprocess and os.path.exists(violations_path):
            # supersede, don't append: re-running the same files would
            # otherwise duplicate their rows in the durable store (r4
            # review finding #3)
            keep = spark.read.parquet(violations_path).filter(
                F.col("snapshot_id") != snapshot_id
            )
            _swap_write(keep.unionByName(fresh_viols), violations_path)
        else:
            fresh_viols.write.mode("append").parquet(violations_path)
        violations = fresh_viols.drop("snapshot_id", "file")
    else:
        from pyspark.sql.types import StructType

        schema = StructType([df.schema[k] for k in keys]) \
            .add("constraint_id", "string").add("path", "string") \
            .add("keyword", "string").add("expected", "string") \
            .add("actual", "string").add("message", "string")
        violations = spark.createDataFrame([], schema)

    verdicts = _read_verdicts(
        spark, metrics_path, snapshot_id,
        "snapshot_id string, file string, n_rows long, n_failed_rows long, "
        "n_violations long, pass boolean, clean_typed_ok boolean",
    )
    engine_used = (
        "mixed" if (auto_files and typed_files)
        else "typed" if typed_files else "auto" if auto_files else "none"
    )
    return CheckpointedJsonRun(
        verdicts=verdicts,
        violations=violations,
        n_files_total=len(all_files),
        n_files_skipped=skipped,
        n_files_typed=n_typed,
        engine_used=engine_used,
    )
