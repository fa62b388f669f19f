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

import pandas as pd

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


def _cosine_pandas_udf(query: Sequence[float]):
    """Arrow-vectorized cosine vs a fixed query: one numpy matmul per
    batch. The zip_with/aggregate expression form is CodegenFallback
    (interpreted per element); at dim=64 the parquet scan dominates and the
    two kernels tie (measured 0.53s vs 0.57s at 128k vectors warm), but the
    BLAS matmul wins as dim grows — prefer it for real embedding widths."""
    import numpy as np
    from pyspark.sql import types as T

    qv = np.asarray(list(query), dtype=np.float64)
    qn = float(np.sqrt((qv * qv).sum()))

    dim = len(qv)

    @F.pandas_udf(T.DoubleType())
    def score(vecs: pd.Series) -> pd.Series:
        n = len(vecs)
        if n == 0:
            return pd.Series([], dtype="Float64")
        # NULL / wrong-dim vectors score NULL (sorts last under DESC, same
        # as the expression kernel) instead of crashing the Arrow batch
        ok = np.fromiter(
            (v is not None and len(v) == dim for v in vecs), dtype=bool, count=n
        )
        out = np.full(n, np.nan)
        if ok.any():
            m = np.asarray([np.asarray(v, dtype=np.float64) for v in vecs[ok]])
            dots = m @ qv
            norms = np.sqrt((m * m).sum(axis=1)) * qn
            out[ok] = np.where(norms > 0, dots / np.where(norms == 0, 1.0, norms), 0.0)
        return pd.Series(pd.array(out, dtype="Float64")).mask(~ok, None)

    return score


# expr-vs-pandas crossover: at dim=64 the two kernels tie (0.53s vs 0.57s
# at 128k vectors warm — the parquet scan dominates); the zip_with/aggregate
# expression is CodegenFallback (interpreted per element) so its cost grows
# linearly with dim while the numpy matmul amortizes into BLAS. Real
# embedding widths (256-4096) sit firmly on the pandas side.
PANDAS_KERNEL_MIN_DIM = 128


def brute_force_topk(
    corpus: DataFrame,
    query: Sequence[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    kernel: str = "auto",
) -> DataFrame:
    """(id, score) of the k nearest corpus vectors to `query` by cosine.
    One narrow projection + TakeOrderedAndProject (limit k per partition,
    merge on driver) — scales linearly in corpus size, constant memory.

    kernel='expr' folds the dot product with zip_with/aggregate — pure SQL,
    reproducible in the DuckDB oracle; 'pandas' runs one numpy matmul per
    Arrow batch (the scale path for wide embeddings; scores differ from
    'expr' only in the last ulp from summation order — identical top-k on
    the test corpus). The default 'auto' picks by query dimension at the
    measured crossover (PANDAS_KERNEL_MIN_DIM): narrow test corpora stay
    oracle-reproducible, wide-embedding users get the BLAS kernel without
    reading this docstring (VERDICT r3 stretch #8)."""
    if kernel == "auto":
        kernel = "pandas" if len(query) >= PANDAS_KERNEL_MIN_DIM else "expr"
    if kernel == "pandas":
        score = _cosine_pandas_udf(query)(F.col(vec_col).cast("array<double>"))
    else:
        q = F.array(*[F.lit(float(x)) for x in query])
        score = cosine(F.col(vec_col).cast("array<double>"), q)
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
    n_tables: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    kernel: str = "auto",
) -> DataFrame:
    """Approximate top-k: score only rows sharing the query's LSH bucket in
    AT LEAST ONE of n_tables independent hyperplane tables (multi-probe —
    recall 1-(1-p^b)^T, same structure as embedding_near_duplicates). With
    n_tables=1 and the corpus written partitioned by bucket id, partition
    pruning turns the probe into a fraction-of-corpus scan; multi-table
    probes trade that for recall (the candidate filter is still a single
    scan predicate, no shuffle)."""
    dim = len(query)
    cond = None
    for t in range(n_tables):
        planes = _hyperplanes(dim, n_planes, seed + 7919 * t)
        qbucket = 0
        for b, plane in enumerate(planes):
            if sum(float(x) * float(y) for x, y in zip(query, plane)) > 0:
                qbucket |= 1 << b
        c = lsh_bucket(F.col(vec_col), planes) == qbucket
        cond = c if cond is None else (cond | c)
    return brute_force_topk(
        corpus.filter(cond), query, k, id_col, vec_col, kernel=kernel
    )


def ivf_index(
    corpus: DataFrame,
    n_lists: int = 16,
    vec_col: str = "embedding",
    seed: int = 42,
    sample_fraction: float | None = None,
):
    """IVF coarse quantizer: MLlib k-means centroids + per-vector list
    assignment. Returns (listed_df with `_ivf_list` int column, centroids
    ndarray). At corpus scale fit on a sample (sample_fraction) and write
    listed_df partitioned by _ivf_list so probes become partition-pruned
    scans — the IVF analog of the LSH bucket layout."""
    import numpy as np
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array  # noqa: F401

    assembled = corpus.withColumn(
        "_ivf_v", array_to_vector(F.col(vec_col).cast("array<double>"))
    )
    fit_on = assembled if sample_fraction is None else assembled.sample(
        fraction=sample_fraction, seed=seed)
    model = KMeans(k=n_lists, seed=seed, featuresCol="_ivf_v",
                   predictionCol="_ivf_list").fit(fit_on)
    listed = model.transform(assembled).drop("_ivf_v")
    centroids = np.asarray([np.asarray(c) for c in model.clusterCenters()])
    return listed, centroids


def ivf_topk(
    corpus: DataFrame,
    query: Sequence[float],
    k: int = 10,
    n_lists: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    kernel: str = "auto",
    index=None,
) -> DataFrame:
    """IVF approximate top-k (the brief's IVF scale path): score only the
    n_probe inverted lists whose centroids are nearest the query — a
    fraction n_probe/n_lists of the corpus, exact within it. Pass a
    prebuilt `index` (from ivf_index) to amortize training across queries;
    recall grows with n_probe (n_probe == n_lists degenerates to exact).

    MATERIALIZE the index before probing at scale: an unmaterialized
    `listed` frame re-runs the k-means transform over the whole corpus on
    every probe — measured SLOWER than brute force at 5M vectors (43 s vs
    17 s; SCALING.md r5). The production layout is
    `listed.write.partitionBy('_ivf_list').parquet(...)` then probe the
    re-read frame: the `_ivf_list IN (probes)` filter becomes partition
    pruning and the quarter-probe ran 2.5x faster than brute (6.9 s)."""
    import numpy as np

    listed, centroids = index if index is not None else ivf_index(
        corpus, n_lists, vec_col, seed)
    q = np.asarray(list(query), dtype=np.float64)
    d = ((centroids - q) ** 2).sum(axis=1)
    probes = [int(i) for i in np.argsort(d)[:n_probe]]
    cands = listed.filter(F.col("_ivf_list").isin(probes))
    return brute_force_topk(cands, query, k, id_col, vec_col, kernel=kernel)


def _dim_of(corpus: DataFrame, vec_col: str, dim: int | None) -> int:
    """Vector dimensionality. Pass `dim` explicitly to keep plan construction
    action-free (ArrayType carries no static length, so the fallback is one
    tiny driver probe — fine interactively, avoid in jobs)."""
    if dim is not None:
        return dim
    first = corpus.select(F.size(F.col(vec_col)).alias("d")).first()
    return first["d"]


def _multi_table_buckets(
    corpus: DataFrame,
    dim: int,
    n_planes: int,
    n_tables: int,
    id_col: str,
    vec_col: str,
    seed: int,
) -> DataFrame:
    """(table_id, bucket, id): one corpus pass computes ALL tables' sign
    signatures (array of T bucket ids, posexploded). Each table uses an
    independent seeded hyperplane set."""
    buckets = F.array(*[
        lsh_bucket(F.col(vec_col), _hyperplanes(dim, n_planes, seed + 7919 * t))
        for t in range(n_tables)
    ])
    return corpus.select(
        F.col(id_col),
        F.posexplode(buckets).alias("table_id", "bucket"),
    )


def embedding_bucket_overflow(
    corpus: DataFrame,
    max_bucket_size: int,
    n_planes: int = 12,
    n_tables: int = 4,
    dim: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """(table_id, bucket, n_rows) for buckets ABOVE the cap — the explicit
    'what was dropped' view for embedding_near_duplicates(max_bucket_size=N).
    No silent caps: pair generation skips these buckets, and this frame
    names them."""
    dim = _dim_of(corpus, vec_col, dim)
    b = _multi_table_buckets(corpus, dim, n_planes, n_tables, id_col, vec_col, seed)
    return (
        b.groupBy("table_id", "bucket")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .filter(F.col("n_rows") > max_bucket_size)
    )


def semantic_duplicate_pairs(
    corpus: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cluster_col: str | None = None,
    n_clusters: int = 16,
    seed: int = 42,
    max_cluster_size: int | None = None,
    index=None,
) -> DataFrame:
    """SemDeDup-style semantic near-dup pairs (Abbas et al. 2023): the
    corpus is partitioned into clusters, and ONLY within-cluster pairs
    are cosine-verified — the cluster structure replaces LSH banding as
    the candidate generator, which is what makes semantic (not just
    lexical) duplicates reachable: two paraphrases land in the same
    k-means cell even when no shingle or hyperplane bucket agrees.

    Clustering is injectable: pass `cluster_col` to use a precomputed
    assignment (a metadata cluster, or a MATERIALIZED ivf_index layout —
    the partitioned-write requirement of SCALING.md r5 applies here
    verbatim), OR pass `index` (an ivf_index result, clustered on
    `_ivf_list`), or leave both None to fit the k-means quantizer
    in-call (small corpora / tests only: the in-call fit discards the
    assignment, so skipped-cell reporting needs `index`). Passing both
    raises — two active assignments would silently disagree about which
    one bounds the self-join.

    NULL-cluster convention: rows whose cluster key is NULL BYPASS the
    dedup (the equijoins drop NULL keys) — they are never candidates
    and always survive, mirroring cap_per_domain's no-domain bypass.
    Cluster unassigned rows explicitly if they must participate.

    Scale shape: sum-of-squares of cluster sizes bounds the self-join;
    at 10^9 vectors pick n_clusters ~ sqrt(N) and cap the degenerate
    cells with `max_cluster_size`. Overflowing cells are skipped
    in-plan; name them with semantic_cluster_overflow(listed_frame,
    max_cluster_size, cluster_col) over the SAME assignment frame (for
    the `index` path: semantic_cluster_overflow(index[0], N,
    '_ivf_list')) — the engine-wide no-silent-caps contract. Vectors
    join back for candidates only (the minhash verify asymmetry), read
    from the same keyed projection so the corpus lineage is evaluated
    for one subtree; at scale MATERIALIZE the corpus/assignment first
    (the ivf_topk requirement) rather than re-deriving it per branch."""
    if cluster_col is not None and index is not None:
        raise ValueError(
            "pass either cluster_col or index, not both — two cluster "
            "assignments would silently disagree")
    if cluster_col is None:
        listed, _ = index if index is not None else ivf_index(
            corpus, n_clusters, vec_col, seed)
        cluster_col = "_ivf_list"
    else:
        listed = corpus
    keyed = listed.select(F.col(cluster_col).alias("cluster"),
                          F.col(id_col), F.col(vec_col))
    if max_cluster_size is not None:
        ok = (keyed.groupBy("cluster")
              .agg(F.count(F.lit(1)).alias("_n"))
              .filter(F.col("_n") <= max_cluster_size).drop("_n"))
        keyed = keyed.join(ok, "cluster", "left_semi")
    l = keyed.select("cluster", F.col(id_col).alias("id_a"))
    r = keyed.select("cluster", F.col(id_col).alias("id_b"))
    cands = (l.join(r, "cluster").filter(F.col("id_a") < F.col("id_b")))
    # join vectors back from the keyed projection (not the raw corpus):
    # one shared subtree instead of three distinct corpus scans (review)
    va = keyed.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
    vb = keyed.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"))
    return (cands.join(va, "id_a").join(vb, "id_b")
            .filter(cosine(F.col("_va"), F.col("_vb")) >= threshold)
            .select("cluster", "id_a", "id_b"))


def semantic_cluster_overflow(
    corpus: DataFrame,
    max_cluster_size: int,
    cluster_col: str,
) -> DataFrame:
    """(cluster, n_vectors) for cells semantic_duplicate_pairs skipped
    under `max_cluster_size` — the no-silent-caps companion view."""
    return (corpus.groupBy(F.col(cluster_col).alias("cluster"))
            .agg(F.count(F.lit(1)).alias("n_vectors"))
            .filter(F.col("n_vectors") > max_cluster_size))


def semantic_dedup(
    corpus: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cluster_col: str | None = None,
    n_clusters: int = 16,
    seed: int = 42,
    max_cluster_size: int | None = None,
    index=None,
) -> DataFrame:
    """Surviving rows after SemDeDup: within each transitive duplicate
    component (verified pairs as edges), only the minimum-id member is
    kept — graph.component_drop_ids, the same keep-component-min rule
    clean_corpus(near_dup_mode='cc') uses. Rows in no pair (including
    NULL-cluster bypass rows) keep themselves.

    Cost note: the pair stage and the final anti-join both read
    `corpus`; at scale persist/materialize the corpus (and use a
    materialized `index`) before calling, exactly as clean_corpus
    persists its gated frame before the near-dup stage."""
    from .graph import component_drop_ids

    pairs = semantic_duplicate_pairs(
        corpus, threshold, id_col, vec_col, cluster_col, n_clusters,
        seed, max_cluster_size, index)
    drop = component_drop_ids(pairs, "id_a", "id_b", id_alias=id_col)
    return corpus.join(drop, id_col, "left_anti")


def embedding_near_duplicates(
    corpus: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 12,
    n_tables: int = 4,
    dim: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """(id_a, id_b, cosine) pairs with cosine >= threshold via BANDED
    multi-table LSH (VERDICT r1 fix #4 — same structure as minhash bands):

    - n_tables independent hyperplane tables; a pair is a candidate if it
      collides in ANY table. Collision prob rises from p^b (single table)
      to 1-(1-p^b)^T — the recall knob that single-table LSH lacked.
    - candidate ID pairs are deduped BEFORE the exact-cosine verify, and
      vectors join back for candidates only (the minhash verify asymmetry:
      the corpus is scanned once to bucket; vectors re-read for the trickle).
    - max_bucket_size bounds the within-bucket self-join: a degenerate hot
      bucket (all-zero vectors, crawler boilerplate embeddings) would go
      quadratic at 10^9 rows. Overflowing buckets are SKIPPED in-plan (no
      driver action) and named by embedding_bucket_overflow().
    """
    dim = _dim_of(corpus, vec_col, dim)
    b = _multi_table_buckets(corpus, dim, n_planes, n_tables, id_col, vec_col, seed)
    if max_bucket_size is not None:
        ok = (
            b.groupBy("table_id", "bucket")
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") <= max_bucket_size)
            .drop("_n")
        )
        b = b.join(ok, ["table_id", "bucket"], "left_semi")
    l = b.select("table_id", "bucket", F.col(id_col).alias("id_a"))
    r = b.select("table_id", "bucket", F.col(id_col).alias("id_b"))
    cands = (
        l.join(r, ["table_id", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    va = corpus.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
    vb = corpus.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"))
    return (
        cands.join(va, "id_a").join(vb, "id_b")
        .select("id_a", "id_b", F.round(cosine(F.col("_va"), F.col("_vb")), 6).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


# ---------------------------------------------------------------------------
# int8 scalar quantization (SQ8): the ANN memory/IO lever at 100 TB — a
# float32 embedding column shrinks 4x (array<tinyint>), which is the
# difference between an in-memory and a spilling corpus for the
# brute-force and IVF paths above. Per-dimension affine quantization:
#     q_i = round((x_i - min_i) / span_i * 255) - 128      (span > 0)
# with the global per-dim min/span computed in ONE aggregate pass (2*d
# map-side-combinable min/max aggs — no explode, no (row, dim) shuffle).
# Dequantization error is bounded by span_i / 255 / 2 per dimension.
# ---------------------------------------------------------------------------
def embedding_dim_stats(
    df: DataFrame, vec_col: str = "embedding", dim: int | None = None,
) -> tuple[list[float], list[float]]:
    """(mins, maxs) per dimension, one corpus pass. The result is a
    driver-side constant pair (2*d floats) — persist it alongside the
    quantized table; quantize/dequantize must use the SAME stats."""
    d = _dim_of(df, vec_col, dim)
    elem = lambda i: F.element_at(F.col(vec_col), i + 1).cast("double")
    row = df.agg(
        F.array(*[F.min(elem(i)) for i in range(d)]).alias("mins"),
        F.array(*[F.max(elem(i)) for i in range(d)]).alias("maxs"),
    ).first()
    return [float(v) for v in row["mins"]], [float(v) for v in row["maxs"]]


def _stats_arrays(stats: tuple[list[float], list[float]]):
    mins, maxs = stats
    mins_l = F.array(*[F.lit(float(v)) for v in mins])
    spans_l = F.array(*[F.lit(float(mx - mn))
                        for mn, mx in zip(mins, maxs)])
    return mins_l, spans_l


def quantize_embeddings(
    df: DataFrame, stats: tuple[list[float], list[float]],
    vec_col: str = "embedding", out_col: str = "qvec",
) -> DataFrame:
    """Adds `out_col`: array<tinyint> SQ8 codes. Pure projection — the
    stats ride along as literal arrays, each evaluated once per row by
    the zip_with pair (NOT element_at(literal, i) inside a transform
    lambda, which would rebuild the d-element literal per element:
    O(d^2) per row). Constant dimensions (span 0) code to 0."""
    mins_l, spans_l = _stats_arrays(stats)
    vec_d = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    paired = F.zip_with(
        vec_d, mins_l, lambda x, mn: F.struct(x.alias("x"), mn.alias("mn")))
    q = F.zip_with(
        paired, spans_l,
        lambda s, sp: F.when(
            sp > 0,
            (F.round(
                (s.getField("x") - s.getField("mn")) / sp * 255.0)
             .cast("int") - 128),
        ).otherwise(F.lit(0)).cast("tinyint"))
    return df.withColumn(out_col, q)


def dequantize_embeddings(
    df: DataFrame, stats: tuple[list[float], list[float]],
    qvec_col: str = "qvec", out_col: str = "embedding",
) -> DataFrame:
    """Inverse projection: x̂_i = min_i + (q_i + 128) / 255 * span_i.
    Feed the result to brute_force_topk / ivf_topk for 4x-cheaper scans
    at a bounded score error."""
    mins_l, spans_l = _stats_arrays(stats)
    paired = F.zip_with(
        F.col(qvec_col), mins_l,
        lambda q, mn: F.struct(q.cast("double").alias("q"),
                               mn.alias("mn")))
    x = F.zip_with(
        paired, spans_l,
        lambda s, sp: s.getField("mn")
        + (s.getField("q") + 128.0) / 255.0 * sp)
    return df.withColumn(out_col, x)
