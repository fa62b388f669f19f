"""Table-scope validation pass: DataFrame + rules -> verdicts/violations.

The Spark re-expression of the reference's parse-and-validate single pass
(parse.js:342-1081 + schema.js:1023-1417): ONE narrow projection computes a
`valid` boolean and a `violations` array per row; violation rows explode from
that array; per-partition verdicts aggregate it. No shuffle is required for
validation itself — verdicts use a partition-local aggregation
(spark_partition_id groupBy is map-side only because the grouping key IS the
partition id).

Row-as-object semantics: the root schema's `properties` route to table
COLUMNS (SURVEY.md §1.2); a NULL column value is an absent property.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..schema.compiler import CompiledSchema, compile_rules
from .kernels import (
    VIOLATION_ARRAY,
    ColumnCompiler,
    ExpressionFallback,
)

VALID_COL = "_jsp_valid"
VIOLATIONS_COL = "_jsp_violations"
PARTITION_COL = "_jsp_partition_id"


def _compiled(rules) -> CompiledSchema:
    return rules if isinstance(rules, CompiledSchema) else compile_rules(rules)


@dataclass
class ValidationResult:
    """Outputs of one validation pass (SURVEY.md §7.0 diagram).

    Two per-row violation encodings exist:
    - compact (expression path): array<struct<rule_id,path,actual>> + a
      static rule table — keeps large rule sets inside whole-stage codegen;
      violations() reconstructs the full report via a broadcast join.
    - full (Arrow path): the 6-field structs are built in Python where
      codegen size is irrelevant.
    """

    annotated: DataFrame  # input columns + _jsp_valid + _jsp_violations
    key_cols: list[str]
    compiled: Optional[CompiledSchema] = None
    rule_table: Optional[list[dict]] = None  # set => compact encoding

    def annotations(self) -> DataFrame:
        """(key..., constraint_id, keyword, value) — title/description
        annotations for PASSING rows only (schema.js:1411 contract). The
        static annotation table is tiny and broadcast; rows are filtered by
        the already-computed valid flag — no re-validation."""
        from ..api import annotation_table

        if self.compiled is None:
            raise ValueError("annotations() needs the compiled schema")
        spark = self.annotated.sparkSession
        static = spark.createDataFrame(
            annotation_table(self.compiled) or [],
            "constraint_id string, keyword string, value string",
        )
        passing = self.annotated.filter(F.col(VALID_COL)).select(*self.key_cols)
        return passing.crossJoin(F.broadcast(static))

    def violations(self) -> DataFrame:
        """(key..., constraint_id, path, keyword, expected, actual, message)
        — the reference's errors[] sink as a DataFrame (error.js:21-37).

        Compact encoding: explode (tiny structs) then broadcast-join the
        rule table (hundreds of rows) to attach static metadata. Only
        violating rows reach the join — at web scale that's the trickle,
        not the stream."""
        v = F.explode(F.col(VIOLATIONS_COL)).alias("v")
        if self.rule_table is not None:
            from .kernels import RULE_TABLE_SCHEMA

            spark = self.annotated.sparkSession
            rules_df = spark.createDataFrame(self.rule_table or [], RULE_TABLE_SCHEMA)
            exploded = self.annotated.select(*self.key_cols, v).select(
                *self.key_cols,
                F.col("v.rule_id").alias("rule_id"),
                F.col("v.path").alias("path"),
                F.col("v.actual").alias("actual"),
            )
            return exploded.join(F.broadcast(rules_df), "rule_id").select(
                *self.key_cols,
                "constraint_id", "path", "keyword", "expected", "actual", "message",
            )
        return self.annotated.select(*self.key_cols, v).select(
            *self.key_cols,
            F.col("v.constraint_id").alias("constraint_id"),
            F.col("v.path").alias("path"),
            F.col("v.keyword").alias("keyword"),
            F.col("v.expected").alias("expected"),
            F.col("v.actual").alias("actual"),
            F.col("v.message").alias("message"),
        )

    def verdicts(self) -> DataFrame:
        """Per-partition pass/fail (north rule). Partition-local agg: the
        grouping key is spark_partition_id, so AQE keeps this map-side."""
        return (
            self.annotated.select(
                F.spark_partition_id().alias(PARTITION_COL),
                F.col(VALID_COL),
                F.size(F.col(VIOLATIONS_COL)).alias("_n_viol"),
            )
            .groupBy(PARTITION_COL)
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.when(F.col(VALID_COL), 0).otherwise(1)).alias("n_failed_rows"),
                F.sum("_n_viol").alias("n_violations"),
            )
            .withColumn("pass", F.col("n_failed_rows") == 0)
        )

    def observed(self, name: str = "jsp_metrics"):
        """Attach Spark observe() metrics so row/violation counts come back
        with the SAME action that writes the output — the 100-TB way to get
        verdict totals without a second scan. Returns (df, fetch) where
        `fetch(query_or_none)` reads the observation after an action."""
        from pyspark.sql import Observation

        obs = Observation(name)
        df = self.annotated.observe(
            obs,
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.when(F.col(VALID_COL), 0).otherwise(1)).alias("n_failed_rows"),
            F.sum(F.size(F.col(VIOLATIONS_COL))).alias("n_violations"),
        )
        return df, obs

    def summary(self) -> dict:
        row = self.annotated.select(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.when(F.col(VALID_COL), 0).otherwise(1)).alias("n_failed_rows"),
            F.sum(F.size(F.col(VIOLATIONS_COL))).alias("n_violations"),
        ).first()
        return {
            "n_rows": row["n_rows"],
            "n_failed_rows": row["n_failed_rows"] or 0,
            "n_violations": row["n_violations"] or 0,
            "pass": (row["n_failed_rows"] or 0) == 0,
        }


def validate_dataframe(
    df: DataFrame,
    rules,
    key_cols: Optional[Sequence[str]] = None,
    extensions: bool = True,
    fallback: str = "auto",
    max_violations_per_row: Optional[int] = None,
) -> ValidationResult:
    """Single-pass table validation.

    The whole row is treated as one JSON object (columns = properties) and
    compiled to Column expressions. Catalyst's SimplifyExtractValueOps
    collapses ``struct(cols...).field`` back to the bare column, so wrapping
    the row in a struct costs nothing physically — check .explain().

    fallback: 'auto' routes ExpressionFallback subtrees through the
    Arrow-batched Python evaluator (whole-row JSON); 'never' raises.
    """
    cs = _compiled(rules)
    if key_cols is None:
        key_cols = [df.columns[0]]
    key_cols = list(key_cols)

    row_struct = F.struct(*[F.col(c) for c in df.columns])
    compiler = ColumnCompiler(extensions=extensions)
    try:
        from .kernels import COMPACT_ARRAY

        valid, viols = compiler.compile_value(cs, row_struct, df.schema, F.lit(""))
        viols = F.coalesce(viols, F.array().cast(COMPACT_ARRAY))
        cols = {VALID_COL: F.coalesce(valid, F.lit(True))}
        if max_violations_per_row is not None:
            # explicit cap with a truncation marker — no silent loss
            # (SURVEY.md §7.1 M6: violations capped, truncation flagged)
            cols["_jsp_violations_truncated"] = F.size(viols) > max_violations_per_row
            cols[VIOLATIONS_COL] = F.slice(viols, 1, max_violations_per_row)
        else:
            cols[VIOLATIONS_COL] = viols
        annotated = df.withColumns(cols)
        return ValidationResult(
            annotated=annotated, key_cols=key_cols, compiled=cs,
            rule_table=compiler.rule_table,
        )
    except ExpressionFallback:
        if fallback == "never":
            raise
        from .json_validator import validate_json_rows

        return validate_json_rows(df, cs, key_cols=key_cols, extensions=extensions)


def strict_first_error(result: ValidationResult):
    """``parse()``-style strict mode (parse.js:76-97): return the first
    violation if any. Catalyst CollectLimit early-exits the scan — the
    distributed analog of the reference's throw-on-first-error."""
    rows = result.violations().limit(1).collect()
    return rows[0] if rows else None
