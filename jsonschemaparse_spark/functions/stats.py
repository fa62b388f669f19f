"""Per-column stats & sketches (SURVEY.md §2.11 "per-column stats" row).

One hash-aggregation pass over the table computes, per column:
count / nulls / min / max / avg, HLL distinct (approx_count_distinct),
and GK-sketch quantiles (approx_percentile) for numerics. Spark's partial +
final aggregation gives the treeAggregate-style two-level merge for free —
partials combine map-side, one tiny reduce. This is the scalable analog of
the reference's per-layer length counters (parse.js:253).

Heavy hitters: exact top-k (`groupBy.count.orderBy.limit` — partial agg +
single shuffle of distinct keys only) plus a count-min sketch alternative in
mapInPandas partials for cardinalities where even the distinct-key shuffle
is too big.
"""

from __future__ import annotations

from typing import Iterator, Optional, Sequence

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
            T.FloatType, T.DoubleType, T.DecimalType)


def column_profile(
    df: DataFrame,
    columns: Optional[Sequence[str]] = None,
    quantiles: Sequence[float] = (0.25, 0.5, 0.75, 0.95),
    rsd: float = 0.05,
) -> DataFrame:
    """Long-format stats table: one row per column.

    (column, count, n_null, approx_distinct, min, max, avg, quantiles)
    min/max/avg/quantiles are null for non-numeric, min/max cast to string
    for orderable non-numerics. Single aggregation job.
    """
    spark = df.sparkSession
    cols = list(columns) if columns is not None else df.columns
    dtypes = {f.name: f.dataType for f in df.schema.fields}

    aggs: list = [F.count(F.lit(1)).alias("_total")]
    for c in cols:
        dt = dtypes[c]
        aggs.append(F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"{c}__nulls"))
        if isinstance(dt, (T.ArrayType, T.MapType, T.StructType, T.BinaryType)):
            continue
        aggs.append(F.approx_count_distinct(c, rsd).alias(f"{c}__distinct"))
        aggs.append(F.min(c).cast("string").alias(f"{c}__min"))
        aggs.append(F.max(c).cast("string").alias(f"{c}__max"))
        if isinstance(dt, _NUMERIC):
            aggs.append(F.avg(F.col(c).cast("double")).alias(f"{c}__avg"))
            aggs.append(
                F.percentile_approx(
                    F.col(c).cast("double"), list(quantiles), 10000
                ).alias(f"{c}__quantiles")
            )
    row = df.agg(*aggs).first().asDict()

    out = []
    for c in cols:
        out.append(
            {
                "column": c,
                "count": row["_total"],
                "n_null": row.get(f"{c}__nulls"),
                "approx_distinct": row.get(f"{c}__distinct"),
                "min": row.get(f"{c}__min"),
                "max": row.get(f"{c}__max"),
                "avg": row.get(f"{c}__avg"),
                "quantiles": row.get(f"{c}__quantiles"),
            }
        )
    schema = T.StructType(
        [
            T.StructField("column", T.StringType()),
            T.StructField("count", T.LongType()),
            T.StructField("n_null", T.LongType()),
            T.StructField("approx_distinct", T.LongType()),
            T.StructField("min", T.StringType()),
            T.StructField("max", T.StringType()),
            T.StructField("avg", T.DoubleType()),
            T.StructField("quantiles", T.ArrayType(T.DoubleType())),
        ]
    )
    return spark.createDataFrame(out, schema)


def value_histogram(
    df: DataFrame, column: str, n_bins: int = 32,
    bounds: "tuple[float, float] | None" = None,
) -> DataFrame:
    """Equal-width histogram table: (bucket, lo, hi, n) with every
    bucket present (zero-count bins included — a dashboard consumer
    should not have to outer-join a bin spine). The bucket formula is
    integrity._bucket_expr — the same spelled-out IEEE op order the
    KS drift test uses, so an external SQL engine reproduces the table
    bit-for-bit. One min/max agg (skipped when `bounds` is passed — the
    re-run/production path, same contract as ks_drift) + one
    map-side-combined count agg whose shuffle is n_bins rows per task.
    NULLs and NaNs are excluded (they have no bin; column_profile's
    null_count reports them)."""
    from .integrity import _bucket_expr

    x = F.col(column).cast("double")
    if bounds is None:
        # NaN sorts ABOVE every double in Spark aggregates — max() over
        # a column containing NaN returns NaN and poisons every bin
        # edge; bound over the binnable rows only
        b = df.filter(x.isNotNull() & ~F.isnan(x)).agg(
            F.min(x).alias("lo"), F.max(x).alias("hi")).first()
        lo, hi = b["lo"], b["hi"]
        if lo is None:
            # all-null/all-NaN column: emit a numeric 0..1 spine with
            # zero counts everywhere (NOT NULL edges — a dashboard
            # consumer gets a well-formed empty histogram)
            lo, hi = 0.0, 1.0
    else:
        lo, hi = bounds
    lo, hi = float(lo), float(hi)
    if lo == hi:
        hi = lo + 1.0
    counts = (
        df.filter(x.isNotNull() & ~F.isnan(x))
        .filter((x >= lo) & (x <= hi))
        .groupBy(_bucket_expr(x, lo, hi, n_bins).alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    width = (hi - lo) / n_bins
    spine = df.sparkSession.range(n_bins).select(
        F.col("id").cast("long").alias("bucket"))
    return (
        spine.join(counts, "bucket", "left")
        .select(
            "bucket",
            F.round(F.lit(lo) + F.col("bucket") * F.lit(width), 6).alias("lo"),
            F.round(F.lit(lo) + (F.col("bucket") + 1) * F.lit(width), 6)
            .alias("hi"),
            F.coalesce("n", F.lit(0)).cast("long").alias("n"),
        )
    )


def top_k(df: DataFrame, column: str, k: int = 20) -> DataFrame:
    """Exact heavy hitters. Partial aggregation combines map-side, so the
    shuffle carries one row per distinct key per partition, not per input
    row; TakeOrderedAndProject avoids a global sort."""
    return (
        df.groupBy(F.col(column).alias("value"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc_nulls_last("value"))
        .limit(k)
    )


# ---------------------------------------------------------------------------
# count-min sketch: mapInPandas partials, driver merge (treeAggregate shape)
# ---------------------------------------------------------------------------
_CMS_PRIME = (1 << 61) - 1


def _cms_rows(depth: int, width: int, seed: int = 42):
    rnd = []
    x = seed
    for _ in range(depth):
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        a = (x % (_CMS_PRIME - 1)) + 1
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        b = x % _CMS_PRIME
        rnd.append((a, b))
    return rnd


def count_min_sketch(
    df: DataFrame, column: str, depth: int = 5, width: int = 2048
) -> "CountMinSketch":
    """Distributed CMS: one partial sketch per Arrow batch inside
    mapInPandas, merged on the driver (sketches are depth×width ints —
    kilobytes — so the driver merge is the 'final' of a treeAggregate)."""
    import numpy as np

    params = _cms_rows(depth, width)

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        table = np.zeros((depth, width), dtype=np.int64)
        n = 0
        for pdf in batches:
            vals = pdf[column].dropna().astype(str)
            n += len(vals)
            # deterministic across executor processes (builtin hash() is
            # PYTHONHASHSEED-randomized and MUST NOT be used here)
            h = (pd.util.hash_array(vals.to_numpy(dtype=object)) & 0x7FFFFFFFFFFFFFFF).astype(object)
            for d, (a, b) in enumerate(params):
                idx = ((h * a + b) % _CMS_PRIME % width).astype(np.int64)
                np.add.at(table[d], idx, 1)
        yield pd.DataFrame({"sketch": [table.flatten().tolist()], "n": [n]})

    rows = df.select(column).mapInPandas(
        partials, schema="sketch array<long>, n long"
    ).collect()
    merged = np.zeros(depth * width, dtype=np.int64)
    total = 0
    for r in rows:
        if r["sketch"]:
            merged += np.array(r["sketch"], dtype=np.int64)
        total += r["n"]
    return CountMinSketch(merged.reshape(depth, width), params, width, total)


class CountMinSketch:
    def __init__(self, table, params, width: int, total: int):
        self.table = table
        self.params = params
        self.width = width
        self.total = total

    def estimate(self, value) -> int:
        import numpy as np

        h = int(pd.util.hash_array(np.array([str(value)], dtype=object))[0]) & 0x7FFFFFFFFFFFFFFF
        est = None
        for d, (a, b) in enumerate(self.params):
            idx = (h * a + b) % _CMS_PRIME % self.width
            v = int(self.table[d][idx])
            est = v if est is None else min(est, v)
        return est or 0
