"""Cluster job entry point (spark-submit --py-files target).

spark-submit --py-files dist/jsonschemaparse_spark.zip \
    scripts/run_validation_job.py \
    --input  <parquet/iceberg path of webpages>          \
    --rules  <rules.json path (ruleset document)>        \
    --output <report dir>                                \
    [--state <checkpoint state dir>] [--snapshot <id>]   \
    [--key-cols url]

Writes: <output>/violations (parquet), <output>/verdicts (parquet),
        <output>/summary.json. With --state, runs resumable per-file
        checkpointing instead of a flat pass.

No master/config hardcoding: all sizing comes from spark-submit flags, so
the SAME artifact runs at N and 4N executors (north-rule deployment shape).
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--rules", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--state", default=None)
    ap.add_argument("--snapshot", default="snap0")
    ap.add_argument("--key-cols", default="url")
    ap.add_argument("--tables", default=None,
                    help="JSON map name->path for referential/drift reference tables")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("jsonschemaparse-spark-validate").getOrCreate()

    from jsonschemaparse_spark.engine import compile_rule_suite, run_rule_suite
    from jsonschemaparse_spark.plans.checkpoint import run_with_checkpoint

    with open(args.rules) as fh:
        ruleset = json.load(fh)
    # plain JSON-Schema docs are accepted as {"schema": ...}
    if not (set(ruleset) <= {"schema", "unique", "referential", "drift"}):
        ruleset = {"schema": ruleset}
    suite = compile_rule_suite(ruleset)
    key_cols = args.key_cols.split(",")

    if args.state and suite.schema is not None:
        run = run_with_checkpoint(
            spark, args.input, suite.schema, args.state,
            snapshot_id=args.snapshot, key_cols=key_cols,
        )
        run.violations.write.mode("append").parquet(f"{args.output}/violations")
        run.verdicts.write.mode("overwrite").parquet(f"{args.output}/verdicts")
        summary = {
            "n_files_total": run.n_files_total,
            "n_files_skipped": run.n_files_skipped,
        }
    else:
        df = spark.read.parquet(args.input)
        tables = {}
        if args.tables:
            tables = {k: spark.read.parquet(v)
                      for k, v in json.loads(args.tables).items()}
        report = run_rule_suite(df, suite, tables=tables, key_cols=key_cols)
        if report.row_result is not None:
            report.row_result.violations().write.mode("overwrite").parquet(
                f"{args.output}/violations"
            )
            report.row_result.verdicts().write.mode("overwrite").parquet(
                f"{args.output}/verdicts"
            )
        summary = report.summary()

    # Overwrite semantics: the documented resume workflow re-invokes with the
    # same --output; RDD saveAsTextFile would throw FileAlreadyExistsException.
    spark.createDataFrame([(json.dumps(summary),)], "value string") \
        .coalesce(1).write.mode("overwrite").text(f"{args.output}/summary.json")
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
