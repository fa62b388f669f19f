"""Constraint suggestion: profile a table and propose the JSON-Schema
rules it currently satisfies (Deequ-style), closing the engine's loop —
profile -> suggest -> compile -> validate.

The reference consumes a hand-written schema (lib/schema.js); at
10^12-row table scope nobody hand-writes per-column bounds, so the
engine proposes them from one profiling pass and the caller curates.
Every suggested rule round-trips through schema/compiler.py: validating
the profiled table against its own suggestion yields zero violations
(pinned in tests/test_suggest.py).

Scale notes (100 TB):
- Phase 1 is ONE aggregation job over the scan: counts, null counts,
  min/max, length bounds, approx-distinct — all partial-agg combinable
  map-side, one row reaches the driver.
- Phase 2 (enum values) runs only for columns whose HLL estimate is
  already under the threshold: a distinct() on such a column shuffles
  at most ~threshold values per partition after the map-side combine,
  and the limit(threshold+1) guard bounds the driver collect even if
  the estimate was off.
- Double/float min-max suggestions are intentionally NOT emitted:
  binary64 -> decimal string formatting differs across engines
  (Double.toString shortest-repr), so a suggested bound could exclude
  the very value it was derived from after a round-trip through JSON.
  Integer bounds and code-point length bounds are representation-exact.
"""

from __future__ import annotations

import json
from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_INTEGRAL = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
_FRACTIONAL = (T.FloatType, T.DoubleType, T.DecimalType)


def _json_type(dt: T.DataType) -> str | None:
    if isinstance(dt, T.BooleanType):
        return "boolean"
    if isinstance(dt, _INTEGRAL):
        return "integer"
    if isinstance(dt, _FRACTIONAL):
        return "number"
    if isinstance(dt, T.StringType):
        return "string"
    return None


def suggest_constraints(
    df: DataFrame,
    columns: Optional[Sequence[str]] = None,
    enum_max_distinct: int = 16,
    rsd: float = 0.05,
    check_uniqueness: bool = True,
) -> DataFrame:
    """Long-format suggestion table: (column, keyword, value), value
    always a string (JSON-encoded where the keyword takes JSON).

    Emitted per column where applicable: type, required (zero nulls),
    minimum/maximum (integral only — see module docstring), minLength/
    maxLength (strings, code points), enum (strings whose exact distinct
    set fits enum_max_distinct, JSON array sorted ascending), unique
    (Deequ isUnique analog: zero nulls AND exact distinct == row count,
    verified exactly — the HLL estimate only nominates candidates, with
    3*rsd headroom like integrity.uniqueness_check, so the exact
    distinct shuffle runs only for columns that are plausibly unique).
    'unique' feeds integrity.uniqueness_violations, not the row-level
    schema (it is a table-scope constraint).
    """
    spark = df.sparkSession
    cols = list(columns) if columns is not None else df.columns
    dtypes = {f.name: f.dataType for f in df.schema.fields}

    aggs: list = [F.count(F.lit(1)).alias("_total")]
    for c in cols:
        jt = _json_type(dtypes[c])
        if jt is None:
            continue
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"{c}__nulls"))
        if jt == "integer":
            aggs.append(F.min(c).alias(f"{c}__min"))
            aggs.append(F.max(c).alias(f"{c}__max"))
            aggs.append(F.approx_count_distinct(c, rsd).alias(f"{c}__distinct"))
        elif jt == "string":
            aggs.append(F.min(F.length(c)).alias(f"{c}__minlen"))
            aggs.append(F.max(F.length(c)).alias(f"{c}__maxlen"))
            aggs.append(F.approx_count_distinct(c, rsd).alias(f"{c}__distinct"))
    row = df.agg(*aggs).first().asDict()

    out: list[tuple[str, str, str]] = []
    for c in cols:
        jt = _json_type(dtypes[c])
        if jt is None:
            continue
        out.append((c, "type", jt))
        if row[f"{c}__nulls"] == 0:
            out.append((c, "required", "true"))
        if jt == "integer" and row[f"{c}__min"] is not None:
            out.append((c, "minimum", str(row[f"{c}__min"])))
            out.append((c, "maximum", str(row[f"{c}__max"])))
        elif jt == "string" and row[f"{c}__minlen"] is not None:
            out.append((c, "minLength", str(row[f"{c}__minlen"])))
            out.append((c, "maxLength", str(row[f"{c}__maxlen"])))
            # HLL gate with headroom for its error band; the limit()
            # guard below keeps the collect bounded even if HLL was off
            if row[f"{c}__distinct"] <= 2 * enum_max_distinct:
                vals = [
                    r[0]
                    for r in df.select(c).filter(F.col(c).isNotNull())
                    .distinct().limit(enum_max_distinct + 1).collect()
                ]
                if len(vals) <= enum_max_distinct:
                    # ensure_ascii=False: keep non-ASCII raw so the value
                    # string matches DuckDB's to_json encoding (quotes,
                    # backslashes and control chars escape identically)
                    out.append((
                        c, "enum",
                        "[" + ", ".join(json.dumps(v, ensure_ascii=False)
                                        for v in sorted(vals)) + "]",
                    ))

    if check_uniqueness and row["_total"]:
        total = row["_total"]
        candidates = [
            c for c in cols
            if _json_type(dtypes[c]) in ("integer", "string")
            and row[f"{c}__nulls"] == 0
            and row[f"{c}__distinct"] >= total * (1 - 3 * rsd)
        ]
        if candidates:
            exact = df.agg(*[
                F.countDistinct(c).alias(c) for c in candidates]).first()
            for c in candidates:
                if exact[c] == total:
                    out.append((c, "unique", "true"))

    schema = T.StructType([
        T.StructField("column", T.StringType(), False),
        T.StructField("keyword", T.StringType(), False),
        T.StructField("value", T.StringType(), False),
    ])
    return spark.createDataFrame(out, schema)


def constraints_to_schema(suggestions: DataFrame | list) -> dict:
    """Assemble the suggestion rows into a JSON-Schema dict consumable
    by schema/compiler.py (and by the reference's Schema class — the
    emitted keywords are all core draft keywords). 'unique' rows are
    table-scope, so they land in the documented 'x-unique-columns'
    extension (feed each to integrity.uniqueness_violations), not in
    properties."""
    rows = (
        suggestions.collect()
        if isinstance(suggestions, DataFrame) else list(suggestions)
    )
    props: dict = {}
    required: list[str] = []
    unique: list[str] = []
    for r in rows:
        c, kw, val = r[0], r[1], r[2]
        p = props.setdefault(c, {})
        if kw == "required":
            required.append(c)
        elif kw == "unique":
            unique.append(c)
        elif kw == "type":
            p["type"] = val
        elif kw in ("minimum", "maximum", "minLength", "maxLength"):
            p[kw] = int(val)
        elif kw == "enum":
            p["enum"] = json.loads(val)
    out: dict = {"type": "object", "properties": props}
    if required:
        out["required"] = sorted(required)
    if unique:
        out["x-unique-columns"] = sorted(unique)
    return out
