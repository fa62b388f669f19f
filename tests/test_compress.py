"""Compression-ratio quality signal (functions/compress.py): zlib
reference parity, band monotonicity, NULL/empty abstention, gate
semantics, zero-shuffle plan pin."""

import zlib

import pytest
from pyspark.sql import functions as F

from jsonschemaparse_spark.functions.compress import (
    compressibility_gate,
    compression_ratio,
)

PROSE = ("The quick brown fox jumps over the lazy dog while seventeen "
         "curious magpies watch from a crooked fence nearby. ") * 3
REPEAT = "spam " * 200
MIXED = "abc123 " + "x" * 50 + " def456"


def _corpus(spark):
    return spark.createDataFrame(
        [(0, PROSE), (1, REPEAT), (2, MIXED), (3, None), (4, "")],
        "doc_id long, text string")


def test_matches_zlib_reference_exactly(spark):
    rows = {r["doc_id"]: r["compression_ratio"] for r in
            compression_ratio(_corpus(spark)).collect()}
    for i, t in [(0, PROSE), (1, REPEAT), (2, MIXED)]:
        raw = t.encode("utf-8")
        assert rows[i] == len(zlib.compress(raw, 6)) / len(raw)
    assert rows[3] is None and rows[4] is None


def test_band_monotonicity(spark):
    rows = {r["doc_id"]: r["compression_ratio"] for r in
            compression_ratio(_corpus(spark)).collect()}
    # repeated text compresses far better than prose
    assert rows[1] < 0.1 < rows[0]


def test_gate_drops_redundant_keeps_prose_abstains_unscoreable(spark):
    out = compressibility_gate(_corpus(spark), min_ratio=0.25)
    got = {r["doc_id"]: r["compress_keep"] for r in out.collect()}
    assert got[0] is True and got[1] is False
    assert got[3] is True and got[4] is True  # abstain
    # helper column does not leak
    assert "_jsp_cr" not in out.columns


def test_level_parameter_forwarded(spark):
    df = _corpus(spark).filter(F.col("doc_id") == 0)
    r9 = compression_ratio(df, level=9).first()["compression_ratio"]
    raw = PROSE.encode("utf-8")
    assert r9 == len(zlib.compress(raw, 9)) / len(raw)


def test_zero_shuffle_one_arrow(spark, documents):
    out = compression_ratio(documents)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert plan.count("ArrowEvalPython") == 1
