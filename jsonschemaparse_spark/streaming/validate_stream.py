"""Structured Streaming validation (SURVEY.md §2.11 late/streaming row).

The column kernels are ordinary Catalyst expressions, so the SAME compiled
rules run unchanged on a streaming DataFrame — the micro-batch is the
incremental chunk, mirroring the reference StreamParser's `_write` blocks
(parse.js:318-326) at table granularity. State is per-window aggregation
only (the reference keeps no cross-document state either; SURVEY.md §7.3-6).

- validate_stream:      annotate a stream with valid/violations columns.
- windowed_verdicts:    watermarked tumbling-window pass/fail rollups; rows
                        later than the watermark are dropped by Spark and
                        surface in the `late_rows` gap vs the batch count.
- foreach_batch_sink:   reuse of the batch pass per micro-batch (the
                        streaming twin of the reference's event sinks).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.kernels import COMPACT_ARRAY, ColumnCompiler
from ..plans.validator import VALID_COL, VIOLATIONS_COL, _compiled


def validate_stream(
    stream_df: DataFrame,
    rules,
    extensions: bool = True,
) -> DataFrame:
    """Annotate a (possibly streaming) DataFrame with _jsp_valid and
    _jsp_violations. Pure projection — fully streaming-compatible, no state."""
    cs = _compiled(rules)
    compiler = ColumnCompiler(extensions=extensions)
    row_struct = F.struct(*[F.col(c) for c in stream_df.columns])
    valid, viols = compiler.compile_value(cs, row_struct, stream_df.schema, F.lit(""))
    return stream_df.withColumns(
        {
            VALID_COL: F.coalesce(valid, F.lit(True)),
            VIOLATIONS_COL: F.coalesce(viols, F.array().cast(COMPACT_ARRAY)),
        }
    )


def windowed_verdicts(
    annotated: DataFrame,
    ts_col: str = "warc_ts",
    window: str = "1 minute",
    watermark: str = "5 minutes",
) -> DataFrame:
    """Tumbling-window verdict rollup with late-data bound: (window,
    n_rows, n_failed_rows, n_violations, pass)."""
    return (
        annotated.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("window"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.when(F.col(VALID_COL), 0).otherwise(1)).alias("n_failed_rows"),
            F.sum(F.size(VIOLATIONS_COL)).alias("n_violations"),
        )
        .withColumn("pass", F.col("n_failed_rows") == 0)
    )


def foreach_batch_sink(
    rules,
    on_batch: Callable[[DataFrame, DataFrame, int], None],
    key_cols: Optional[Sequence[str]] = None,
    extensions: bool = True,
):
    """Returns a foreachBatch function that runs the BATCH validation pass
    on every micro-batch and hands (violations_df, verdicts_df, batch_id)
    to `on_batch` — single code path for batch and streaming."""
    from ..plans.validator import validate_dataframe

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        res = validate_dataframe(batch_df, rules, key_cols=key_cols, extensions=extensions)
        on_batch(res.violations(), res.verdicts(), batch_id)

    return _sink
