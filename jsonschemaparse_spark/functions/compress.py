"""Compression-ratio quality signal (the Gopher-era 'compressibility'
filter: machine-generated / template / repeated text compresses far
better than natural prose, so deflate ratio is a cheap one-number
repetitiveness detector that catches what token-level heuristics miss).

The reference (awwright/jsonschemaparse, a single-document JSON
validator) has no counterpart; this sits in the repo's
LLM-training-data tier next to the Gopher repetition fractions
(functions/text.py) — those measure EXACT n-gram repeats, this
measures total redundancy including near-repeats and low-entropy
structure.

Scale shape: pure map — an Arrow-batched pandas UDF running zlib over
each text's UTF-8 bytes, zero shuffle, composable into the same corpus
scan as the other gates. zlib at level 6 streams ~50-150 MB/s/core;
at 100 TB this is the same cost class as the regex gates.

Oracle note: deflate output length is NOT SQL-expressible, so this
operator is pinned by pytest against the zlib reference values
(hand-checked monotonicity: repeated text ratio << prose ratio <<
random-ish hex) rather than by a DuckDB driver twin — the documented
exception class (custom non-SQL ops), kept OUT of the driver contract
so the 100%-exact-oracle property of queries() is preserved.

Determinism: zlib's output for a fixed (input, level, strategy) is
deterministic for a given zlib build; the RATIO is further robust —
tests pin band membership, not exact byte counts, so a zlib upgrade
cannot silently flip gate decisions pinned here.

NULL convention: metric op over keyed rows — NULL text scores NULL
(ratio of nothing is undefined, the lm_perplexity convention); empty
text also scores NULL (zlib emits a constant 8-byte header whose
"ratio" is meaningless)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def compression_ratio(
    df: DataFrame, text_col: str = "text",
    out_col: str = "compression_ratio", *, level: int = 6,
) -> DataFrame:
    """Adds `out_col` = len(zlib(text_utf8, level)) / len(text_utf8) as
    double (lower = more redundant). Pure Arrow map, zero shuffle."""
    import pandas as pd

    @F.pandas_udf("double")
    def _ratio(texts):  # pd.Series -> pd.Series
        import zlib

        out = []
        for t in texts:
            if t is None or t == "":
                out.append(None)
                continue
            raw = t.encode("utf-8")
            out.append(len(zlib.compress(raw, level)) / len(raw))
        return pd.Series(out, dtype="float64")

    return df.withColumn(out_col, _ratio(F.col(text_col)))


def compressibility_gate(
    df: DataFrame, text_col: str = "text", *,
    min_ratio: float = 0.25, level: int = 6,
    out_col: str = "compress_keep",
) -> DataFrame:
    """Boolean keep flag: drop documents that deflate below `min_ratio`
    (extreme redundancy — boilerplate farms, generated spam). Docs that
    cannot be scored (NULL/empty) ABSTAIN (keep True), matching the
    lm gate's convention: compressibility cannot judge them, the
    length gates are the short-doc filter."""
    scored = compression_ratio(df, text_col, "_jsp_cr", level=level)
    return scored.withColumn(
        out_col,
        F.col("_jsp_cr").isNull() | (F.col("_jsp_cr") >= min_ratio),
    ).drop("_jsp_cr")
