"""Similarity search over embedding columns (array<float>).

- brute_force_topk: exact cosine top-k. Dot products via zip_with +
  aggregate (JVM HOFs, no Python); TakeOrderedAndProject for the top-k —
  no global sort, no shuffle of the corpus.
- lsh_topk: random-hyperplane LSH buckets as the scale path — the corpus is
  scanned once to bucket; queries probe only matching buckets.
- embedding_near_duplicates: cosine >= threshold pairs within LSH buckets
  (near-dup detection for embedding-deduped training corpora).

Hyperplanes are deterministic (seeded) so results are reproducible across
runs and cluster sizes.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    d = norm(a) * norm(b)
    return F.when(d > 0, dot(a, b) / d).otherwise(F.lit(0.0))


def brute_force_topk(
    corpus: DataFrame,
    query: Sequence[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, score) of the k nearest corpus vectors to `query` by cosine.
    One narrow projection + TakeOrderedAndProject (limit k per partition,
    merge on driver) — scales linearly in corpus size, constant memory."""
    q = F.array(*[F.lit(float(x)) for x in query])
    qc = F.col(vec_col).cast("array<double>")
    score = cosine(qc, q)
    return (
        corpus.select(F.col(id_col), F.round(score, 6).alias("score"))
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-gaussian hyperplanes (Box-Muller over an LCG)."""
    import math

    x = seed or 1
    out = []

    def nxt() -> float:
        nonlocal x
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        return (x >> 11) / float(1 << 52)

    for _ in range(n_planes):
        plane = []
        for _ in range(dim):
            u1 = max(nxt(), 1e-12)
            u2 = nxt()
            plane.append(math.sqrt(-2.0 * math.log(u1)) * math.cos(2 * math.pi * u2))
        out.append(plane)
    return out


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-pattern bucket id from random hyperplanes: bit b = (v·p_b > 0)."""
    bucket = F.lit(0).cast("long")
    for b, plane in enumerate(planes):
        p = F.array(*[F.lit(float(x)) for x in plane])
        bit = F.when(dot(vec.cast("array<double>"), p) > 0, F.lit(1)).otherwise(F.lit(0))
        bucket = bucket + (bit.cast("long") * F.lit(1 << b))
    return bucket


def with_lsh_bucket(
    corpus: DataFrame,
    dim: int,
    n_planes: int = 8,
    vec_col: str = "embedding",
    out_col: str = "lsh_bucket",
    seed: int = 42,
) -> DataFrame:
    return corpus.withColumn(out_col, lsh_bucket(F.col(vec_col), _hyperplanes(dim, n_planes, seed)))


def lsh_topk(
    corpus: DataFrame,
    query: Sequence[float],
    k: int = 10,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: score only the query's LSH bucket. At scale the
    bucketed corpus is written partitioned by bucket id -> partition pruning
    turns the probe into a fraction-of-corpus scan."""
    planes = _hyperplanes(len(query), n_planes, seed)
    qbucket = 0
    for b, plane in enumerate(planes):
        if sum(float(x) * float(y) for x, y in zip(query, plane)) > 0:
            qbucket |= 1 << b
    bucketed = with_lsh_bucket(corpus, len(query), n_planes, vec_col, seed=seed)
    return brute_force_topk(
        bucketed.filter(F.col("lsh_bucket") == qbucket), query, k, id_col, vec_col
    )


def embedding_near_duplicates(
    corpus: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 12,
    dim: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """(id_a, id_b, cosine) pairs with cosine >= threshold, candidate-
    restricted to identical LSH buckets (high-threshold near-dups collide
    with high probability; increase n_planes for precision, add multiple
    tables for recall)."""
    if dim is None:
        first = corpus.select(F.size(F.col(vec_col)).alias("d")).first()
        dim = first["d"]
    bucketed = with_lsh_bucket(corpus, dim, n_planes, vec_col, seed=seed)
    l = bucketed.select(F.col("lsh_bucket"), F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
    r = bucketed.select(F.col("lsh_bucket"), F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"))
    return (
        l.join(r, "lsh_bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.round(cosine(F.col("_va"), F.col("_vb")), 6).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
        .distinct()
    )
