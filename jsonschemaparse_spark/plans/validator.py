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

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schema.compiler import CompiledSchema, compile_rules
from .kernels import (
    VIOLATION_ARRAY,
    ColumnCompiler,
    ExpressionFallback,
)

VALID_COL = "_jsp_valid"
VIOLATIONS_COL = "_jsp_violations"
PARTITION_COL = "_jsp_partition_id"

# columns with this prefix are engine internals, never row properties
INTERNAL_PREFIX = "_jsp_"


def data_columns(df: DataFrame) -> list[str]:
    """The columns that form the validated row object — internal helper
    columns (checkpoint's _jsp_file, prior annotations) are excluded so
    they never trip additionalProperties/maxProperties at the root."""
    return [c for c in df.columns if not c.startswith(INTERNAL_PREFIX)]


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
    # per-column fallback (VERDICT r1 stretch #9): full-encoding violations
    # from Arrow-evaluated columns live in this extra array column; verdict
    # and report methods merge both encodings
    py_viols_col: Optional[str] = None
    # hybrid path (VERDICT r2 stretch #9): Observation whose metrics report
    # how many rows were routed to the Python rescue UDF in the SAME action
    # that consumed `annotated` (zero extra jobs). After a FULL-SCAN action
    # (count/collect/write — NOT first()/limit()/show(), which observe only
    # the rows actually scanned), jsp_flagged == 0 with jsp_rows == the
    # table's row count proves the corpus was fully JVM-validated —
    # checkpoint/resume reruns over the same data may then use
    # engine='typed' and skip the UDF stage (identical results by
    # construction when nothing is flagged).
    flagged_observation: Optional[object] = None

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
        not the stream. Per-column-fallback violations (full encoding)
        union in at the end."""
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
                F.col("v.exp").alias("_dyn_expected"),
            )
            out = exploded.join(F.broadcast(rules_df), "rule_id").select(
                *self.key_cols,
                "constraint_id", "path", "keyword",
                # dynamic per-row expected (required's missing-key list)
                # overrides the rule table's static value
                F.coalesce(F.col("_dyn_expected"), F.col("expected")).alias("expected"),
                "actual", "message",
            )
        else:
            # positioned results (validate_json_column(positions=True))
            # carry line/column in the struct — surface them as columns
            vfields = {
                f.name
                for f in self.annotated.schema[VIOLATIONS_COL]
                .dataType.elementType.fields
            }
            pos_cols = (
                [F.col("v.line").alias("line"), F.col("v.column").alias("column")]
                if "line" in vfields else []
            )
            out = self.annotated.select(*self.key_cols, v).select(
                *self.key_cols,
                F.col("v.constraint_id").alias("constraint_id"),
                F.col("v.path").alias("path"),
                F.col("v.keyword").alias("keyword"),
                F.col("v.expected").alias("expected"),
                F.col("v.actual").alias("actual"),
                F.col("v.message").alias("message"),
                *pos_cols,
            )
        if self.py_viols_col is not None:
            pv = F.explode(F.col(self.py_viols_col)).alias("v")
            out = out.unionByName(
                self.annotated.select(*self.key_cols, pv).select(
                    *self.key_cols,
                    F.col("v.constraint_id").alias("constraint_id"),
                    F.col("v.path").alias("path"),
                    F.col("v.keyword").alias("keyword"),
                    F.col("v.expected").alias("expected"),
                    F.col("v.actual").alias("actual"),
                    F.col("v.message").alias("message"),
                )
            )
        return out

    def _n_viols(self) -> Column:
        n = F.size(F.col(VIOLATIONS_COL))
        if self.py_viols_col is not None:
            n = n + F.size(F.col(self.py_viols_col))
        return n

    def verdicts(self) -> DataFrame:
        """Per-partition pass/fail (north rule). Partition-local agg: the
        grouping key is spark_partition_id, so AQE keeps this map-side."""
        return (
            self.annotated.select(
                F.spark_partition_id().alias(PARTITION_COL),
                F.col(VALID_COL),
                self._n_viols().alias("_n_viol"),
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
            F.sum(self._n_viols()).alias("n_violations"),
        )
        return df, obs

    def summary(self) -> dict:
        row = self.annotated.select(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.when(F.col(VALID_COL), 0).otherwise(1)).alias("n_failed_rows"),
            F.sum(self._n_viols()).alias("n_violations"),
        ).first()
        return {
            "n_rows": row["n_rows"],
            "n_failed_rows": row["n_failed_rows"] or 0,
            "n_violations": row["n_violations"] or 0,
            "pass": (row["n_failed_rows"] or 0) == 0,
        }


PY_VIOLS_COL = "_jsp_violations_py"


def _column_fallback_udf(sub, nm: str, extensions: bool, big_number: str = "default"):
    """Arrow-batched pandas UDF evaluating ONE column's subschema in Python.
    Input is to_json(struct(col)) — Arrow ships just that column; null
    fields are omitted by to_json, matching absent-property semantics.
    Returns struct<valid boolean, v array<full violation>>.

    big_number != 'default' parses the doc with the relaxed loader so a
    decimal column's full-precision to_json digits hit the same policy
    table as api.parse (json.loads would silently collapse them to
    binary64 before the evaluator ever saw the loss)."""
    import json as _json

    from pyspark.sql import types as T

    from ..schema.evaluate import Evaluator
    from ..schema.relaxed_json import BigNumberError, loads_relaxed
    from .kernels import VIOLATION_ARRAY

    out_type = T.StructType([
        T.StructField("valid", T.BooleanType(), False),
        T.StructField("v", VIOLATION_ARRAY, False),
    ])

    @F.pandas_udf(out_type)
    def check(docs: pd.Series) -> pd.DataFrame:
        ev = Evaluator(extensions=extensions)
        valids, viols = [], []
        for doc in docs.to_numpy():
            try:
                if doc is None:
                    obj = {}
                elif big_number != "default":
                    obj = loads_relaxed(doc, big_number=big_number)
                else:
                    obj = _json.loads(doc)
            except BigNumberError as e:
                valids.append(False)
                viols.append([{
                    "constraint_id": sub.id, "path": f"/{nm}",
                    "keyword": "bigNumber", "expected": None,
                    "actual": None, "message": str(e),
                }])
                continue
            if nm not in obj:  # NULL column => absent property => vacuous
                valids.append(True)
                viols.append([])
                continue
            errors, _ = ev.validate(sub, obj[nm], path=f"/{nm}")
            valids.append(not errors)
            viols.append([e.as_row() for e in errors])
        return pd.DataFrame({"valid": valids, "v": viols})

    return check


def validate_dataframe(
    df: DataFrame,
    rules,
    key_cols: Optional[Sequence[str]] = None,
    extensions: bool = True,
    fallback: str = "auto",
    max_violations_per_row: Optional[int] = None,
    big_number: str = "default",
) -> ValidationResult:
    """Single-pass table validation.

    The whole row is treated as one JSON object (columns = properties) and
    compiled to Column expressions. Catalyst's SimplifyExtractValueOps
    collapses ``struct(cols...).field`` back to the bare column, so wrapping
    the row in a struct costs nothing physically — check .explain().

    fallback: 'auto' first tries PER-COLUMN fallback — a table column whose
    subschema needs the Python evaluator (ECMAScript-only regex, dynamic
    shapes) runs in an Arrow pandas UDF over THAT column only, while every
    other column stays in whole-stage codegen; only root-level constructs
    the compiler can't express at all fall back to the whole-row Arrow
    path. 'never' raises instead.
    """
    cs = _compiled(rules)
    if key_cols is None:
        key_cols = [df.columns[0]]
    key_cols = list(key_cols)

    # r7 note: deliberately NO _ensure_parallelism here — the validation
    # projection is whole-stage codegen (not interpreted), so the
    # spreading shuffle costs more than it saves on small inputs
    # (paired A/B at sf0.1: 0.64 s with vs 0.49 s without; at sf1.0 the
    # guard bought only ~0.1 s). The interpreted paths (json_typed,
    # Arrow json, gates, classifier, ...) keep their guards.
    data_cols = data_columns(df)
    data_schema = T.StructType([df.schema[c] for c in data_cols])
    row_struct = F.struct(*[F.col(c) for c in data_cols])
    compiler = ColumnCompiler(
        extensions=extensions, collect_field_fallbacks=(fallback != "never"),
        big_number=big_number,
    )
    try:
        from .kernels import COMPACT_ARRAY

        valid, viols = compiler.compile_value(cs, row_struct, data_schema, F.lit(""))
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
        py_viols_col = None
        if compiler.field_fallbacks:
            # per-column Arrow evaluation: one UDF column per offending
            # table column, materialized once (no double UDF eval), then
            # merged into the verdict
            tmp_cols = []
            for i, (nm, sub) in enumerate(compiler.field_fallbacks):
                tmp = f"_jsp_py_{i}"
                annotated = annotated.withColumn(
                    tmp,
                    _column_fallback_udf(sub, nm, extensions, big_number)(
                        F.to_json(F.struct(F.col(nm)))
                    ),
                )
                tmp_cols.append(tmp)
            new_valid = F.col(VALID_COL)
            for t in tmp_cols:
                new_valid = new_valid & F.col(t).getField("valid")
            pieces = [F.col(t).getField("v") for t in tmp_cols]
            py_viols = pieces[0] if len(pieces) == 1 else F.concat(*pieces)
            annotated = (
                annotated.withColumn(VALID_COL, new_valid)
                .withColumn(PY_VIOLS_COL, py_viols)
                .drop(*tmp_cols)
            )
            if max_violations_per_row is not None:
                # the cap applies to the MERGED report: per-column fallback
                # violations get whatever budget the expression-path rows
                # left over (ADVICE r2 low: py_viols were uncapped)
                budget = F.greatest(
                    F.lit(0),
                    F.lit(max_violations_per_row) - F.size(F.col(VIOLATIONS_COL)),
                )
                annotated = annotated.withColumn(
                    "_jsp_violations_truncated",
                    F.col("_jsp_violations_truncated")
                    | F.coalesce(F.size(F.col(PY_VIOLS_COL)) > budget, F.lit(False)),
                ).withColumn(
                    PY_VIOLS_COL, F.slice(F.col(PY_VIOLS_COL), F.lit(1), budget)
                )
            py_viols_col = PY_VIOLS_COL
        return ValidationResult(
            annotated=annotated, key_cols=key_cols, compiled=cs,
            rule_table=compiler.rule_table, py_viols_col=py_viols_col,
        )
    except ExpressionFallback:
        if fallback == "never":
            raise
        from .json_validator import validate_json_rows

        return validate_json_rows(df, cs, key_cols=key_cols, extensions=extensions,
                                  big_number=big_number)


def strict_first_error(result: ValidationResult):
    """``parse()``-style strict mode (parse.js:76-97): return the first
    violation if any. Catalyst CollectLimit early-exits the scan — the
    distributed analog of the reference's throw-on-first-error."""
    rows = result.violations().limit(1).collect()
    return rows[0] if rows else None
