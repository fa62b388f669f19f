"""The canonical web-corpus cleaning recipe as ONE composition.

A user of C4/Gopher-style pipelines runs the same stage order every time:
exact dedup -> quality gates -> (optional) boilerplate strip -> (optional)
span dedup -> (optional) near-dup removal. clean_corpus wires the existing
operators in that order over a single lineage; only the stages that need
cross-doc state (dedup tiers, line/span removal) introduce their
documented shuffles.

r6 execution shape: the Gopher + C4 gates run as text.quality_flags —
ONE Project over ONE scan emitting every metric and both keeps (the
unfused chain built two Project/Filter pipelines that each re-built the
token/line arrays). Exact dedup is the linear groupBy-min(struct) form
(one full-row shuffle with map-side combine). The funnel counts come
from `.observe()` accumulators attached along the lineage, so ONE job
materializes the cleaned frame AND its stage-by-stage survivor counts.

Scale notes: every stage here is one of the audited operators (PLANS.md
§4/§11); the composition adds NO new shuffle shapes.

Near-dup removal modes (`near_dup_mode`):
  'greedy' (default) — every document that appears as the id_b of ANY
    verified pair (a < b) is dropped. In a chain a~b~c with a!~c that
    drops BOTH b and c (each is some pair's b); survivors are exactly
    the docs never named second in a pair. Deterministic, one anti-join,
    SQL-reproducible without recursion.
  'cc' (r6) — transitive connected-components clustering (the C4/Gopher
    dedup-literature semantics): verified pairs are edges, each
    component keeps exactly its minimum-id member. Runs
    graph.connected_components (iterative min-label propagation, bounded
    passes). A chain a~b~c keeps only a under BOTH modes; they differ on
    shapes like (1,3),(2,3): greedy keeps {1, 2} (only 3 is ever an
    id_b), cc collapses the whole component to {1}.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from .classifier import quality_score
from .dedup import (
    content_key,
    exact_dedup_linear,
    minhash_near_duplicates,
    remove_duplicate_spans,
)
from .graph import component_drop_ids
from .pii import redact_text
from .text import _c4_flag_columns, _gopher_flag_columns, quality_flags


@dataclass
class CleanCorpusResult:
    cleaned: DataFrame            # surviving rows of the input schema
    stages: list[str]             # stage names in applied order
    # the FIRST persisted intermediate (near-dup input, or the mixture
    # stage's pre-rates frame when near-dup is off), exposed so callers
    # can release it (r5 ADVICE: unpersisting `cleaned` does NOT
    # release a cache on an upstream frame). None when no stage
    # persisted. `caches` holds EVERY persisted intermediate (near-dup
    # AND mixture can each persist one); unpersist() releases them all.
    cached: "DataFrame | None" = None
    caches: "list[DataFrame]" = field(default_factory=list)
    # stage-name -> Observation; populated when observe_funnel=True.
    # Metrics become readable (obs.get) after the first action on
    # `cleaned` — the funnel rides the SAME job, no re-count.
    funnel: "dict[str, Observation]" = field(default_factory=dict)

    def funnel_counts(self, materialize: bool = False) -> dict[str, int]:
        """Merge every funnel observation into one {metric: value} dict.
        Call AFTER materializing `cleaned` — obs.get blocks FOREVER on a
        query that never ran. If no action has run yet (or you are not
        sure), pass materialize=True: it drives `cleaned` through the
        no-op writer first (full execution, nothing collected), which is
        also the one-job production shape when only the counts are
        wanted."""
        if materialize:
            self.cleaned.write.format("noop").mode("overwrite").save()
        out: dict[str, int] = {}
        for obs in self.funnel.values():
            out.update(obs.get)
        return out

    def unpersist(self) -> None:
        for c in (self.caches or
                  ([self.cached] if self.cached is not None else [])):
            c.unpersist()


def clean_corpus(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    badwords: "list[str] | None" = None,
    gopher: bool = True,
    c4: bool = True,
    span_dedup: bool = False,
    near_dup_threshold: "float | None" = None,
    near_dup_mode: str = "greedy",
    char_fraction_max_items: int = 10_000,
    observe_funnel: bool = False,
    pii_redact: bool = False,
    classifier_threshold: "float | None" = None,
    classifier_weights: "dict[str, float] | None" = None,
    classifier_seed: int = 0,
    seen_df: "DataFrame | None" = None,
    snapshot_bloom=None,
    snapshot_mode: str = "bloom",
    normalize: bool = False,
    normalize_kw: "dict | None" = None,
    lm=None,
    lm_max_log2_ppl: "float | None" = None,
    compress_min_ratio: "float | None" = None,
    mixture_strata: "str | None" = None,
    mixture_target_fraction: "float | None" = None,
    mixture_alpha: float = 0.5,
    mixture_seed: int = 0,
) -> CleanCorpusResult:
    """Apply the canonical cleaning stages in order; returns the surviving
    rows (original columns only), the stages applied, the persisted
    intermediate (if any), and — with observe_funnel=True — the funnel
    observations.

    Stages (each optional except exact dedup, the universal first step):
      -1. normalize   (normalize=True) unicode canonicalization
                      (functions/normalize.py NFC + cleanup chain;
                      normalize_kw forwards options). Runs before
                      EVERYTHING — byte-different but canonically-equal
                      docs must collapse to one content key, and the
                      snapshot probe must see the same canonical form
                      the snapshot was keyed with. Rewriting stage: no
                      rows dropped, no counter
      0. snapshot     (seen_df set) incremental re-crawl cleaning: drop
                      rows whose content key already exists in the prior
                      snapshot (functions/snapshot.py — Bloom-routed by
                      default; pass snapshot_bloom=load_bloom(...) to
                      reuse the published bitmap, snapshot_mode='exact'
                      for snapshots too big to Bloom-broadcast). Runs
                      FIRST so no downstream stage pays for re-crawls
      1. exact        exact_dedup_linear — collapse identical docs
                      (min id kept; one full-row shuffle)
      2+3. gates      quality_flags — Gopher base gate and/or C4 gate
                      (+ injectable badwords) fused into ONE projection,
                      ONE filter
      3b. classifier  model-based gate (classifier_threshold set): keep
                      docs whose functions/classifier quality_score
                      exceeds the threshold (explicit weights dict or
                      the deterministic stand-in). Runs right after the
                      heuristic gates — the CCNet/GPT-3 recipe order —
                      and, like them, is a zero-shuffle projection that
                      stacks into the same corpus scan
      3c. lm          perplexity gate (lm + lm_max_log2_ppl set): keep
                      docs whose functions/lm.py bigram log2-perplexity
                      is <= the threshold — the CCNet order, generative
                      signal after the discriminative classifier. The
                      gate ABSTAINS on unscoreable (<2-token) docs.
                      Batch-only (per-doc agg), unlike the stateless
                      projection gates
      3d. compress    compressibility gate (compress_min_ratio set):
                      drop docs whose zlib deflate ratio falls below
                      the floor (extreme redundancy — boilerplate
                      farms, generated spam; functions/compress.py).
                      A stateless Arrow projection like the heuristic
                      gates (streaming-prefix-safe); abstains on
                      NULL/empty text
      4. span_dedup   remove_duplicate_spans (C4 3-sentence rule) — text
                      REWRITTEN, then re-gated docs are NOT re-filtered
                      (C4 order: span dedup happens after the doc gates)
      5. near_dup     minhash pairs at `near_dup_threshold`, dropped per
                      `near_dup_mode` ('greedy' pair rule or 'cc'
                      connected components — module docstring)
      6. pii_redact   functions/pii.redact_text over the SURVIVORS (the
                      Dolma order: filter -> dedup -> scrub; scrubbing
                      last means the regex chain runs only on kept docs).
                      Rewriting stage: NULL text stays NULL, no rows
                      dropped, no new shuffle (one more projection)
      7. mixture      (mixture_strata + mixture_target_fraction set)
                      temperature-weighted corpus assembly LAST — rates
                      from sampling.temperature_rates over the CLEANED
                      survivors (the mix you ship is the mix of what
                      survived cleaning, not of the raw crawl), applied
                      as the deterministic hash filter keyed on id_col.
                      Batch-only: deriving rates runs one group-count
                      job over the survivors (the frame is persisted
                      first so the prefix computes once); composition
                      identity clean_corpus(mixture...) ==
                      temperature_mixture(clean_corpus(...)) is pinned

    observe_funnel: attaches `.observe()` accumulators (n_input,
    n_after_snapshot when seen_df is set,
    n_after_exact, n_after_gopher / n_after_c4 / n_after_classifier as
    applicable, the
    minhash bucket-overflow counters when near-dup is on, n_pii_docs
    when pii_redact is on, and n_after_mixture when the mixture stage
    is on) so the first
    action on `cleaned` also yields the funnel — the production shape:
    one pass over the corpus, counts for free. Read them via
    result.funnel_counts(). The overflow counters surface what the LSH
    bucket cap dropped (no silent caps at the composition level)."""
    if near_dup_mode not in ("greedy", "cc"):
        raise ValueError(
            f"near_dup_mode must be 'greedy' or 'cc', got {near_dup_mode!r}")
    cols = df.columns
    funnel: dict[str, Observation] = {}
    out = df
    if observe_funnel:
        obs_in = Observation()
        funnel["input"] = obs_in
        out = out.observe(obs_in, F.count(F.lit(1)).alias("n_input"))
    stages = []
    if normalize:
        from .normalize import normalize_text

        # the stage exists to canonicalize the column every later stage
        # KEYS ON; redirecting the output elsewhere would silently turn
        # it into a no-op (r6 review finding #1)
        if normalize_kw and "output_col" in normalize_kw:
            raise ValueError(
                "clean_corpus normalize stage must rewrite text_col in "
                "place; output_col is not allowed in normalize_kw")
        stages.append("normalize")
        out = normalize_text(out, text_col=text_col, **(normalize_kw or {}))
    if seen_df is not None:
        # stage 0 (incremental re-crawl cleaning): drop rows whose
        # content already exists in the prior snapshot BEFORE any
        # in-batch work — functions/snapshot.py Bloom routing, or the
        # plain anti-join for snapshots too big to Bloom-broadcast
        from .snapshot import incremental_dedup

        stages.append("snapshot")
        out = incremental_dedup(out, seen_df, text_col=text_col,
                                mode=snapshot_mode, bloom=snapshot_bloom)
        if observe_funnel:
            obs_s = Observation()
            funnel["snapshot"] = obs_s
            out = out.observe(
                obs_s, F.count(F.lit(1)).alias("n_after_snapshot"))
    stages.append("exact")
    out = exact_dedup_linear(out, id_col, text_col)
    gate_kw: dict = {}
    if gopher or c4:
        if observe_funnel:
            obs_g = Observation()
            funnel["gates"] = obs_g
            metrics = [F.count(F.lit(1)).alias("n_after_exact")]
            if gopher:
                metrics.append(
                    F.coalesce(F.sum(F.when(F.col("gopher_keep"), 1)),
                               F.lit(0)).alias("n_after_gopher"))
            metrics.append(
                F.coalesce(F.sum(F.when(F.col("quality_keep"), 1)),
                           F.lit(0)).alias(
                    "n_after_c4" if c4 else "n_after_gates"))
        if gopher:
            stages.append("gopher")
        if c4:
            stages.append("c4")
        flagged = quality_flags(
            out, text_col, gopher=gopher, c4=c4, badwords=badwords,
            char_fraction_max_items=char_fraction_max_items)
        if observe_funnel:
            flagged = flagged.observe(obs_g, *metrics)
        out = flagged.filter(F.col("quality_keep")).select(*cols)
    elif observe_funnel:
        obs_g = Observation()
        funnel["gates"] = obs_g
        out = out.observe(obs_g, F.count(F.lit(1)).alias("n_after_exact"))
    if classifier_threshold is not None:
        stages.append("classifier")
        scored = out.withColumn(
            "_jsp_cls", quality_score(F.col(text_col), classifier_weights,
                                      classifier_seed))
        if observe_funnel:
            obs_c = Observation()
            funnel["classifier"] = obs_c
            scored = scored.observe(obs_c, F.coalesce(
                F.sum(F.when(F.col("_jsp_cls") > classifier_threshold, 1)),
                F.lit(0)).alias("n_after_classifier"))
        out = scored.filter(
            F.col("_jsp_cls") > classifier_threshold).select(*cols)
    if lm_max_log2_ppl is not None:
        if lm is None:
            raise ValueError("lm_max_log2_ppl requires lm (a BigramLM)")
        from .lm import lm_perplexity

        stages.append("lm")
        ppl = lm_perplexity(out, lm, id_col, text_col)
        # gate ABSTAINS on unscoreable docs (< 2 tokens -> NULL score):
        # perplexity cannot judge them; the heuristic gates are the
        # short-doc filter. Batch-only stage (per-doc agg; not part of
        # the streaming stateless prefix).
        keep = F.col("log2_ppl").isNull() | \
            (F.col("log2_ppl") <= lm_max_log2_ppl)
        if observe_funnel:
            obs_l = Observation()
            funnel["lm"] = obs_l
            ppl = ppl.observe(obs_l, F.coalesce(
                F.sum(F.when(keep, 1)), F.lit(0)).alias("n_after_lm"))
        out = ppl.filter(keep).select(*cols)
    if compress_min_ratio is not None:
        from .compress import compressibility_gate

        stages.append("compress")
        gated = compressibility_gate(out, text_col,
                                     min_ratio=compress_min_ratio,
                                     out_col="_jsp_ck")
        if observe_funnel:
            obs_z = Observation()
            funnel["compress"] = obs_z
            gated = gated.observe(obs_z, F.coalesce(
                F.sum(F.when(F.col("_jsp_ck"), 1)),
                F.lit(0)).alias("n_after_compress"))
        out = gated.filter(F.col("_jsp_ck")).select(*cols)
    if span_dedup:
        stages.append("span_dedup")
        out = remove_duplicate_spans(out, id_col, text_col).select(*cols)
    caches: list[DataFrame] = []
    if near_dup_threshold is not None:
        stages.append("near_dup")
        # the pair stage reads `out` three times (signature scan, text
        # hydration, final anti-join left side); persist the gated frame
        # so the upstream dedup shuffle + gate projections compute once
        # (r5 third review #2). Lazy — materializes with the first
        # downstream action; release it via result.unpersist() (r5
        # ADVICE: it is exposed as result.cached because unpersisting
        # the RETURNED frame would not release this intermediate).
        out = out.persist()
        caches.append(out)
        overflow_obs = None
        if observe_funnel:
            overflow_obs = Observation()
            funnel["near_dup_overflow"] = overflow_obs
        pairs = minhash_near_duplicates(
            out, id_col, text_col, threshold=near_dup_threshold,
            overflow_observation=overflow_obs)
        if near_dup_mode == "greedy":
            drop = pairs.select(F.col("id_b").alias(id_col)).distinct()
        else:
            # keep each component's min-id member; every other drops
            drop = component_drop_ids(pairs, "id_a", "id_b", id_alias=id_col)
        out = out.join(drop, id_col, "left_anti")
    if pii_redact:
        stages.append("pii_redact")
        red = out.withColumn("_jsp_red", redact_text(F.col(text_col)))
        if observe_funnel:
            obs_p = Observation()
            funnel["pii"] = obs_p
            # NULL text: redact_text propagates NULL, the != compare is
            # NULL -> the when() skips it — NULL docs never count as PII
            red = red.observe(obs_p, F.coalesce(
                F.sum(F.when(F.col("_jsp_red") != F.col(text_col), 1)),
                F.lit(0)).alias("n_pii_docs"))
        out = red.withColumn(text_col, F.col("_jsp_red")).select(*cols)
    if mixture_target_fraction is not None:
        if mixture_strata is None:
            raise ValueError(
                "mixture_target_fraction requires mixture_strata")
        from .sampling import temperature_mixture

        stages.append("mixture")
        # rate derivation is an ACTION over the cleaned survivors;
        # persist the CURRENT frame so the rates job and the final
        # filter share one computation. This must happen even when
        # near-dup already persisted upstream — that cache covers only
        # the near-dup INPUT, and the expensive pair-gen/verify/
        # anti-join after it would otherwise run twice (r6 second
        # review #3).
        out = out.persist()
        caches.append(out)
        out = temperature_mixture(
            out, mixture_strata, id_col, alpha=mixture_alpha,
            target_fraction=mixture_target_fraction, seed=mixture_seed)
        if observe_funnel:
            obs_m = Observation()
            funnel["mixture"] = obs_m
            out = out.observe(
                obs_m, F.count(F.lit(1)).alias("n_after_mixture"))
    return CleanCorpusResult(cleaned=out, stages=stages,
                             cached=caches[0] if caches else None,
                             caches=caches, funnel=funnel)


def clean_corpus_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    badwords: "list[str] | None" = None,
) -> DataFrame:
    """One row of per-stage survivor counts for the exact->gopher->c4
    pipeline — the auditable funnel a cleaning run reports, from ONE
    aggregation job (r6; previously four separate count() actions that
    each recomputed the lineage prefix).

    Shape: one groupBy(content_key) with min(struct(id, text)) + a group
    count collapses exact dedup AND the input count into the same
    shuffle; the fused gate columns evaluate on each surviving key's
    kept text inside the final single-row aggregation. At 100 TB this is
    one corpus scan, one dedup shuffle, one 1-row agg — the funnel costs
    nothing beyond the dedup itself. (For the funnel of a run that also
    PRODUCES the cleaned frame, use clean_corpus(observe_funnel=True) —
    same counts, rides the cleaning job.)"""
    keyed = df.select(
        content_key(F.col(text_col)).alias("_ck"),
        F.struct(F.col(id_col).alias("i"), F.col(text_col).alias("t")).alias("_r"),
    )
    groups = keyed.groupBy("_ck").agg(
        F.min("_r").alias("_keep"), F.count(F.lit(1)).alias("_n"))
    kept_text = F.col("_keep.t")
    _, gkeep = _gopher_flag_columns(kept_text)
    _, ckeep = _c4_flag_columns(kept_text, badwords)
    return groups.agg(
        F.coalesce(F.sum("_n"), F.lit(0)).cast("long").alias("n_input"),
        F.count(F.lit(1)).cast("long").alias("n_after_exact"),
        F.coalesce(F.sum(F.when(gkeep, 1)), F.lit(0)).cast("long")
        .alias("n_after_gopher"),
        F.coalesce(F.sum(F.when(gkeep & ckeep, 1)), F.lit(0)).cast("long")
        .alias("n_after_c4"),
    )
