"""Arrow-batched JSON validation kernels (the general path).

For payloads whose structure is dynamic — a JSON-string column like
``events.props``, or schema constructs not expressible as Column algebra —
we ship the compiled trie to executors ONCE (Spark broadcasts task closures)
and evaluate per document inside ``mapInPandas`` Arrow batches: the batch is
the chunk, mirroring the reference's StreamParser block writes
(parse.js:318-326) at record-batch granularity. No per-row Python UDF calls —
one Python invocation per Arrow batch (input_hint: "no per-row Python").

Malformed JSON does not fail the job: it yields a violation row with
keyword='syntax' (FIXTURES.md §F7), matching parseInfo's never-throw-on-
invalid contract (test/parseInfo.test.js:33-37) while still *reporting*
syntax errors.
"""

from __future__ import annotations

import json
from typing import Iterator, Optional, Sequence

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schema.compiler import CompiledSchema, compile_rules
from ..schema.evaluate import Evaluator
from ..schema.strict_json import loads_strict
from .kernels import VIOLATION_ARRAY
from .validator import VALID_COL, VIOLATIONS_COL, ValidationResult


def _out_schema(df: DataFrame, key_cols: Sequence[str]) -> T.StructType:
    fields = [df.schema[c] for c in key_cols]
    fields.append(T.StructField(VALID_COL, T.BooleanType(), False))
    fields.append(T.StructField(VIOLATIONS_COL, VIOLATION_ARRAY, False))
    return T.StructType(fields)


def _records(errors) -> list[dict]:
    return [e.as_row() for e in errors]


def _ensure_parallelism(df: DataFrame) -> DataFrame:
    """Repartition only when the plan has fewer partitions than cores —
    real multi-split inputs pass through shuffle-free."""
    target = df.sparkSession.sparkContext.defaultParallelism
    try:
        current = df.rdd.getNumPartitions()
    except Exception:  # noqa: BLE001
        return df
    return df.repartition(target) if current < max(target // 2, 2) else df


def validate_json_column(
    df: DataFrame,
    json_col: str,
    rules,
    key_cols: Optional[Sequence[str]] = None,
    extensions: bool = False,
    limits=None,
    syntax=None,
    big_number: str = "default",
    interoperable: bool = False,
) -> ValidationResult:
    """Validate a JSON-string column against rules, Arrow batch at a time.

    Returns key cols + _jsp_valid + _jsp_violations. extensions=False gives
    strict reference parity (contains/propertyNames/uniqueItems vacuous).
    limits: optional ResourceLimits -> extra 'resourceLimit' violation rows
    (parser caps of parse.js:146-150, table-scope semantics).
    syntax/big_number/interoperable: the reference's StreamParser option
    families (README.md:100-137) — relaxed dialects and bigNumber policies
    apply per document inside the Arrow batch.
    """
    from ..schema.evaluate import check_limits
    from ..schema.relaxed_json import BigNumberError, loads_relaxed

    relaxed = syntax is not None or big_number != "default" or interoperable

    cs = rules if isinstance(rules, CompiledSchema) else compile_rules(rules)
    if key_cols is None:
        key_cols = [df.columns[0]]
    key_cols = list(key_cols)
    out_schema = _out_schema(df, key_cols)
    narrowed = df.select(*key_cols, json_col)
    # Arrow kernels are CPU-bound per batch: if the input has fewer splits
    # than cores (single parquet file), spread it so every core validates
    narrowed = _ensure_parallelism(narrowed)
    evaluator = Evaluator(extensions=extensions)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # cs/evaluator arrive via the pickled task closure — one deserialize
        # per task, shared across all its Arrow batches.
        for pdf in batches:
            valids: list[bool] = []
            viols: list[list[dict]] = []
            for doc in pdf[json_col]:
                if doc is None:
                    valids.append(True)
                    viols.append([])
                    continue
                try:
                    if relaxed:
                        value = loads_relaxed(
                            doc, syntax=syntax, big_number=big_number,
                            interoperable=interoperable,
                        )
                    else:
                        value = loads_strict(doc)
                except BigNumberError as e:
                    valids.append(False)
                    viols.append(
                        [
                            {
                                "constraint_id": cs.id,
                                "path": "",
                                "keyword": "bigNumber",
                                "expected": None,
                                "actual": None,
                                "message": str(e),
                            }
                        ]
                    )
                    continue
                except (ValueError, TypeError) as e:
                    valids.append(False)
                    viols.append(
                        [
                            {
                                "constraint_id": cs.id,
                                "path": "",
                                "keyword": "syntax",
                                "expected": None,
                                "actual": None,
                                "message": f"Syntax error: {e}",
                            }
                        ]
                    )
                    continue
                errors, _ = evaluator.validate(cs, value)
                if limits is not None:
                    errors = errors + check_limits(value, limits)
                valids.append(not errors)
                viols.append(_records(errors))
            out = pdf[key_cols].copy()
            out[VALID_COL] = valids
            out[VIOLATIONS_COL] = viols
            yield out

    annotated = narrowed.mapInPandas(run, schema=out_schema)
    return ValidationResult(annotated=annotated, key_cols=key_cols)


def schema_for_rules(rules, default=T.StringType()) -> T.DataType:
    """Infer the Spark read schema implied by a rule document, so the
    from_json fast path needs no hand-written struct. Mapping follows
    SURVEY.md §1.2 (integer->long, number->double, object->struct from
    `properties`, array->array of items). Unconstrained shapes fall back
    to `default` (string)."""
    from ..schema.compiler import CompiledSchema
    from .validator import _compiled

    cs: CompiledSchema = _compiled(rules)

    def infer(node: CompiledSchema, depth: int = 0) -> T.DataType:
        if depth > 12:
            return default
        if node.ref is not None:
            return infer(node.resolve_ref(), depth + 1)
        allowed = node.allowed_types
        if node.properties or (len(allowed) == 1 and allowed[0] == "object"):
            fields = [
                T.StructField(name, infer(sub, depth + 1), True)
                for name, sub in node.properties.items()
            ]
            return T.StructType(fields) if fields else T.MapType(T.StringType(), default)
        if node.items_all is not None or (len(allowed) == 1 and allowed[0] == "array"):
            elem = infer(node.items_all, depth + 1) if node.items_all is not None else default
            return T.ArrayType(elem, True)
        if len(allowed) == 1:
            t = allowed[0]
            if t == "string":
                return T.StringType()
            if t == "boolean":
                return T.BooleanType()
            if t == "number":
                return T.LongType() if not node.allow_fraction else T.DoubleType()
        # no explicit type: infer from the keyword family present
        has_numeric = any(
            v is not None
            for v in (node.minimum, node.maximum, node.exclusive_minimum,
                      node.exclusive_maximum, node.multiple_of)
        )
        has_string = node.min_length is not None or node.max_length is not None \
            or node.pattern is not None
        if has_numeric and not has_string:
            return T.DoubleType()
        return default

    return infer(cs)


def validate_json_typed(
    df: DataFrame,
    json_col: str,
    rules,
    spark_schema=None,
    key_cols: Optional[Sequence[str]] = None,
    extensions: bool = True,
) -> ValidationResult:
    """FAST JSON path for payloads with a KNOWN shape: from_json (Spark's
    Jackson parser — the JVM replacement for the reference's byte FSM,
    SURVEY.md §2.1 'block scanner' row) decodes to a typed struct, then the
    regular Column kernels validate it — zero Python, one projection.

    Use validate_json_column (Arrow/Python) only when the shape is dynamic.
    Corrupt JSON yields a NULL struct -> reported as a 'syntax' violation.
    """
    from .kernels import COMPACT_ARRAY, ColumnCompiler
    from .validator import _compiled

    cs = _compiled(rules)
    if key_cols is None:
        key_cols = [df.columns[0]]
    key_cols = list(key_cols)
    if spark_schema is None:
        spark_schema = schema_for_rules(cs)  # inferred from the rules
    if isinstance(spark_schema, str):
        spark_schema = T._parse_datatype_string(spark_schema)
    # PERMISSIVE from_json yields an all-null struct for corrupt input; the
    # corrupt-record side channel makes malformed docs detectable without
    # FAILFAST (never fail the job — parseInfo contract)
    parse_schema = T.StructType(
        list(spark_schema.fields) + [T.StructField("_jsp_corrupt", T.StringType(), True)]
    )
    parsed = F.from_json(
        F.col(json_col), parse_schema,
        {"columnNameOfCorruptRecord": "_jsp_corrupt"},
    )
    compiler = ColumnCompiler(extensions=extensions)
    # compile against the ORIGINAL schema: _jsp_corrupt is not a property
    valid, viols = compiler.compile_value(cs, parsed, spark_schema, F.lit(""))
    syntax_bad = F.col(json_col).isNotNull() & (
        parsed.isNull() | parsed.getField("_jsp_corrupt").isNotNull()
    )
    syntax_rule = compiler.register_rule(
        cs.id, "syntax", None, "Syntax error: malformed JSON"
    )
    syntax_piece = F.struct(
        F.lit(syntax_rule).alias("rule_id"),
        F.lit("").alias("path"),
        F.col(json_col).cast("string").alias("actual"),
    )
    annotated = df.select(
        *key_cols,
        F.when(syntax_bad, F.lit(False)).otherwise(F.coalesce(valid, F.lit(True))).alias(VALID_COL),
        F.when(syntax_bad, F.array(syntax_piece))
        .otherwise(F.coalesce(viols, F.array().cast(COMPACT_ARRAY)))
        .alias(VIOLATIONS_COL),
    )
    return ValidationResult(
        annotated=annotated, key_cols=key_cols, compiled=cs,
        rule_table=compiler.rule_table,
    )


def validate_json_rows(
    df: DataFrame,
    rules,
    key_cols: Optional[Sequence[str]] = None,
    extensions: bool = False,
) -> ValidationResult:
    """Whole-row fallback: serialize each row to a JSON object (JVM-side
    to_json — cheap, columnar) and validate with the Python evaluator.
    Used when ColumnCompiler raises ExpressionFallback."""
    if key_cols is None:
        key_cols = [df.columns[0]]
    key_cols = list(key_cols)
    with_doc = df.select(
        *key_cols, F.to_json(F.struct(*[F.col(c) for c in df.columns])).alias("_jsp_doc")
    )
    return validate_json_column(with_doc, "_jsp_doc", rules, key_cols=key_cols, extensions=extensions)
