"""Connected components over an edge list — the transitive-clustering
primitive behind near-duplicate dedup (the MinHash-LSH literature's
cluster-then-keep-one recipe, e.g. the C4/Gopher dedup lineage).

Algorithm: iterative min-label propagation. Every node starts labeled
with itself; each round, a node's label becomes the min of its own and
its neighbors' labels; convergence in O(component diameter) rounds.
Near-dup clusters are shallow (dup rings around a template page), so
the loop terminates in a handful of rounds; `max_iters` bounds the
degenerate path-graph worst case.

Scale shape: each round is one join edges->labels + one groupBy(node)
min — both shuffles keyed by node id (high-cardinality, no skew beyond
the graph's own degree skew, which the min-agg's map-side combine
absorbs). Labels are localCheckpoint'ed every round to truncate the
iterative lineage (without it, round k replays rounds 1..k-1 — the
classic iterative-Spark trap). The convergence check rides the SAME
job that materializes the new labels (an `.observe()` accumulator —
no second pass). For graphs with billions of edges, swap in the
large-star/small-star variant (Kiveris et al. 2014); the fixture sizes
here (near-dup victim sets, small relative to the corpus) do not need
it, and the API would not change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iters: int = 25,
) -> DataFrame:
    """(node, label) for every node in `edges`, where label is the
    MINIMUM node id of the node's connected component — deterministic
    and parallelism-independent. Nodes with no edges are absent (they
    are their own singleton components; callers treat missing as
    keep).

    Raises RuntimeError if max_iters rounds do not converge (a
    component with diameter > max_iters — raise the bound or switch to
    a star-contraction variant)."""
    und = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).union(
        edges.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst"))
    )
    # materialize the edge list once: every round re-reads it, and the
    # upstream pipeline (e.g. the minhash verify) must not re-run per
    # round. localCheckpoint truncates lineage AND caches the blocks.
    und = und.localCheckpoint(eager=False)
    labels = und.select(F.col("src").alias("node")).distinct() \
        .withColumn("label", F.col("node"))
    # max_iters + 1 loop iterations: convergence is only OBSERVED on the
    # quiescent round after the last propagating one, so a component whose
    # propagation takes exactly max_iters rounds needs one extra pass to
    # read changed==0 (ADVICE r6 — diameter-3 path with max_iters=3 used
    # to raise despite having converged).
    for _ in range(max_iters + 1):
        neigh = (
            und.join(labels, und["dst"] == labels["node"])
            .groupBy("src").agg(F.min("label").alias("_nl"))
        )
        obs = Observation()
        new_labels = (
            labels.join(neigh, labels["node"] == neigh["src"], "left")
            .select(
                F.col("node"),
                F.least(F.col("label"), F.coalesce(F.col("_nl"), F.col("label"))
                        ).alias("label"),
                (F.col("_nl") < F.col("label")).alias("_changed"),
            )
            .observe(obs, F.coalesce(
                F.sum(F.when(F.col("_changed"), 1)), F.lit(0)).alias("changed"))
            .drop("_changed")
        )
        new_labels = new_labels.localCheckpoint(eager=True)
        labels = new_labels
        if obs.get["changed"] == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iters} rounds; "
        "raise max_iters (component diameter exceeds it)")


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    *,
    n_iters: int = 10,
    damping: float = 0.85,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list — the domain-
    authority signal web curation recipes weight sampling by (an
    authority-ish prior next to the per-domain caps in functions/web).
    Returns (node, rank) for every node appearing as src or dst after
    exactly `n_iters` power-iteration rounds from the uniform 1/N
    start: rank = (1-d)/N + d * (sum of in-neighbor rank/out_degree +
    dangling mass/N). Ranks sum to 1 every round (dangling nodes'
    mass is redistributed uniformly — the standard stochastic fix).

    FIXED iteration count on purpose: the result is a deterministic
    function of (edges, n_iters, damping) up to float summation order,
    so a SQL twin can replay the same rounds and a 6dp rounding absorbs
    the reduction-order ulps (the lm_perplexity convention). A
    tolerance-based stop would make the round count data-dependent and
    the twin unreproducible.

    Scale shape: per round, one join ranks->edges + one groupBy(dst)
    sum — both shuffles keyed by node id, map-side combined; the
    out-degree table is computed ONCE and localCheckpoint'ed with the
    edge list; ranks are localCheckpoint'ed eagerly every round (the
    connected_components lineage-truncation lesson); the dangling-mass
    scalar rides an `.observe()` on the SAME job that materializes the
    new ranks — no extra pass per round."""
    e = edges.select(F.col(src_col).alias("src"),
                     F.col(dst_col).alias("dst"))
    e = e.localCheckpoint(eager=False)
    nodes = (e.select(F.col("src").alias("node"))
             .union(e.select(F.col("dst").alias("node")))
             .distinct().localCheckpoint(eager=True))
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    outdeg = (e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
              .localCheckpoint(eager=True))
    # r7: the edges->out-degree join is loop-INVARIANT — materialize it
    # once instead of rebuilding the broadcast relation every round
    # (measured 2.31 s -> 2.04 s for 4 rounds at 100k edges; ranks are
    # 6dp-round-identical — the per-dst sum still reduces the same
    # (src, rank/deg) multiset)
    ed = e.join(outdeg, "src").localCheckpoint(eager=True)
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    d = float(damping)
    dangling_mass = 0.0  # round 0: computed from the uniform start below
    first = True
    for _ in range(n_iters):
        contrib = (
            ed.join(ranks.withColumnRenamed("node", "src"), "src")
            .groupBy("dst")
            .agg(F.sum(F.col("rank") / F.col("deg")).alias("_in"))
        )
        if first:
            # dangling mass of the CURRENT ranks (nodes with no
            # out-edges): one small anti-join agg, only needed once —
            # later rounds read it from the previous job's observation
            row = (ranks.join(outdeg.withColumnRenamed("src", "node"),
                              "node", "left_anti")
                   .agg(F.coalesce(F.sum("rank"), F.lit(0.0))).first())
            dangling_mass = float(row[0])
            first = False
        base = (1.0 - d) / n + d * dangling_mass / n
        # dangling mass for the NEXT round rides the same job
        obs = Observation()
        new_ranks = (
            nodes.join(contrib, nodes["node"] == contrib["dst"], "left")
            .join(outdeg.withColumnRenamed("src", "node")
                  .withColumnRenamed("deg", "_deg"), "node", "left")
            .select(
                "node", F.col("_deg"),
                (F.lit(base)
                 + F.lit(d) * F.coalesce(F.col("_in"), F.lit(0.0))
                 ).alias("rank"),
            )
            .observe(obs, F.coalesce(
                F.sum(F.when(F.col("_deg").isNull(), F.col("rank"))),
                F.lit(0.0)).alias("dangling"))
            .drop("_deg")
        )
        new_ranks = new_ranks.localCheckpoint(eager=True)
        ranks = new_ranks
        dangling_mass = float(obs.get["dangling"])
    return ranks


def component_drop_ids(
    edges: DataFrame,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    id_alias: str = "node",
    max_iters: int = 25,
) -> DataFrame:
    """One-column frame of ids to DROP under keep-component-min
    semantics: every member of each connected component except its
    minimum-id node. The single definition of the 'label == node means
    keep' invariant — clean_corpus(near_dup_mode='cc') and
    semantic_dedup both anti-join against this (review: the invariant
    was previously encoded at both call sites independently)."""
    labels = connected_components(edges, src_col, dst_col, max_iters)
    return (labels.filter(F.col("node") != F.col("label"))
            .select(F.col("node").alias(id_alias)))
