"""Document chunking (functions/chunking.py): fixed token windows with
overlap; reconstruction and coverage invariants."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR

from jsonschemaparse_spark.functions.chunking import chunk_documents, chunk_stats
from jsonschemaparse_spark.functions.text import token_count


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_non_overlapping_chunks_reconstruct(spark, docs):
    """overlap=0: concatenating a doc's chunks in order reproduces the
    whitespace-normalized text, and token counts sum to token_count."""
    chunks = chunk_documents(docs, "doc_id", chunk_tokens=16)
    rebuilt = (
        chunks.groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(
                        F.struct("chunk_id", "chunk_text"))),
                    lambda s: s["chunk_text"]), " ").alias("re"),
            F.sum("n_tokens").alias("tok"))
    )
    ref = docs.select(
        "doc_id",
        F.array_join(F.split(F.trim("text"), r"\s+"), " ").alias("norm"),
        token_count(F.col("text")).cast("long").alias("n"))
    joined = rebuilt.join(ref, "doc_id")
    bad = joined.filter(
        (F.col("re") != F.col("norm")) | (F.col("tok") != F.col("n"))).count()
    assert bad == 0
    # every non-empty doc is covered
    n_nonempty = docs.filter(token_count(F.col("text")) > 0).count()
    assert rebuilt.count() == n_nonempty


def test_overlap_windows(spark):
    df = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(10)))], "id: long, text: string")
    out = chunk_documents(df, "id", chunk_tokens=4, overlap=1).collect()
    rows = sorted((r["chunk_id"], r["chunk_text"], r["n_tokens"]) for r in out)
    # stride 3: starts 0,3,6 cover all 10 tokens; no start-9 tail (its
    # only tokens are already covered)
    assert rows == [
        (0, "w0 w1 w2 w3", 4),
        (1, "w3 w4 w5 w6", 4),
        (2, "w6 w7 w8 w9", 4),
    ]


def test_short_doc_single_chunk(spark):
    df = spark.createDataFrame([(1, "a b")], "id: long, text: string")
    out = chunk_documents(df, "id", chunk_tokens=128, overlap=32).collect()
    assert len(out) == 1 and out[0]["n_tokens"] == 2


def test_empty_and_null_emit_nothing(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, None), (3, "   "), (4, "one")], "id: long, text: string")
    out = chunk_documents(df, "id", chunk_tokens=4)
    assert [r["id"] for r in out.collect()] == [4]


def test_bad_overlap_raises(spark, docs):
    with pytest.raises(ValueError):
        chunk_documents(docs, "doc_id", chunk_tokens=8, overlap=8)


def test_chunk_stats(spark):
    df = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(10)))], "id: long, text: string")
    st = chunk_stats(chunk_documents(df, "id", chunk_tokens=4), "id").first()
    assert (st["n_chunks"], st["total_tokens"], st["last_tokens"]) == (3, 10, 2)


def test_split_not_recomputed_per_chunk(spark, docs):
    """The generator binds the token array once per row: the optimized
    plan contains exactly ONE split() of the text column (a second one
    would mean CollapseProject pushed a projection above the Generate —
    the r5 per-exploded-row recompute pitfall)."""
    out = chunk_documents(docs, "doc_id", chunk_tokens=16)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("split(trim(text") == 1, plan
