"""The canonical web-corpus cleaning recipe as ONE composition.

A user of C4/Gopher-style pipelines runs the same stage order every time:
exact dedup -> quality gates -> (optional) boilerplate strip -> (optional)
span dedup -> (optional) near-dup removal. clean_corpus wires the existing
operators in that order over a single lineage — Catalyst shares the scan
across the stage predicates; only the stages that need cross-doc state
(dedup tiers, line/span removal) introduce their documented shuffles.

Scale notes: every stage here is one of the audited operators (PLANS.md
§4/§11); the composition adds NO new shuffle shapes. Near-dup removal is
the standard greedy pair rule — every document that appears as the id_b
of ANY verified pair (a < b) is dropped. In a chain a~b~c with a!~c that
drops BOTH b and c (each is some pair's b); survivors are exactly the
docs never named second in a pair. Deterministic and SQL-reproducible;
it is NOT transitive-closure clustering (which would also keep only a,
but via an iterative connected-components pass this engine avoids).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import exact_dedup, minhash_near_duplicates, remove_duplicate_spans
from .text import c4_quality_flags, gopher_quality_flags


@dataclass
class CleanCorpusResult:
    cleaned: DataFrame            # surviving rows of the input schema
    stages: list[str]             # stage names in applied order


def clean_corpus(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    badwords: "list[str] | None" = None,
    gopher: bool = True,
    c4: bool = True,
    span_dedup: bool = False,
    near_dup_threshold: "float | None" = None,
    char_fraction_max_items: int = 10_000,
) -> CleanCorpusResult:
    """Apply the canonical cleaning stages in order; returns the surviving
    rows (original columns only) and the list of stages applied.

    Stages (each optional except exact dedup, the universal first step):
      1. exact        exact_dedup — collapse identical docs (min id kept)
      2. gopher       gopher_quality_flags base gate (one projection)
      3. c4           c4_quality_flags gate (+ injectable badwords)
      4. span_dedup   remove_duplicate_spans (C4 3-sentence rule) — text
                      REWRITTEN, then re-gated docs are NOT re-filtered
                      (C4 order: span dedup happens after the doc gates)
      5. near_dup     minhash pairs at `near_dup_threshold`; for every
                      verified (a < b) pair, b is dropped (greedy rule)
    """
    cols = df.columns
    stages = ["exact"]
    out = exact_dedup(df, id_col, text_col)
    if gopher:
        stages.append("gopher")
        out = (
            gopher_quality_flags(out, text_col,
                                 char_fraction_max_items=char_fraction_max_items)
            .filter(F.col("gopher_keep"))
            .select(*cols)
        )
    if c4:
        stages.append("c4")
        out = (
            c4_quality_flags(out, text_col, badwords=badwords)
            .filter(F.col("c4_keep"))
            .select(*cols)
        )
    if span_dedup:
        stages.append("span_dedup")
        out = remove_duplicate_spans(out, id_col, text_col).select(*cols)
    if near_dup_threshold is not None:
        stages.append("near_dup")
        # the pair stage reads `out` three times (signature scan, text
        # hydration, final anti-join left side); persist the gated frame
        # so the upstream dedup shuffle + gate projections compute once
        # (r5 third review #2). Lazy — materializes with the first
        # downstream action; callers may .unpersist() the result.
        out = out.persist()
        pairs = minhash_near_duplicates(
            out, id_col, text_col, threshold=near_dup_threshold)
        drop = pairs.select(F.col("id_b").alias(id_col)).distinct()
        out = out.join(drop, id_col, "left_anti")
    return CleanCorpusResult(cleaned=out, stages=stages)


def clean_corpus_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    badwords: "list[str] | None" = None,
) -> DataFrame:
    """One row of per-stage survivor counts for the exact->gopher->c4
    pipeline — the auditable funnel a cleaning run reports. Each count is
    a separate aggregation over the shared lineage (the driver-query /
    oracle surface; production runs would .observe() the cleaned frame
    instead of re-counting)."""
    n_input = df.count()
    deduped = exact_dedup(df, id_col, text_col)
    n_exact = deduped.count()
    gophered = gopher_quality_flags(deduped, text_col).filter(
        F.col("gopher_keep"))
    n_gopher = gophered.count()
    c4ed = c4_quality_flags(gophered, text_col, badwords=badwords).filter(
        F.col("c4_keep"))
    n_c4 = c4ed.count()
    spark = df.sparkSession
    return spark.createDataFrame(
        [(n_input, n_exact, n_gopher, n_c4)],
        "n_input long, n_after_exact long, n_after_gopher long, n_after_c4 long",
    )
