"""Table-scope constraints: uniqueness, referential integrity, drift.

These extend the reference's single-document contract to table scope
(SURVEY.md §2.11): `uniqueItems` — declared unsupported by the reference
(schema.js:714) — becomes cross-table uniqueness; `$ref` across schemas
(schema.js:609-621) becomes a referential anti-join; distribution drift has
no reference seed (pure extension).

Scale notes (100 TB):
- uniqueness: partial hash-agg combines map-side, shuffle carries distinct
  keys only; HLL fast-path avoids the shuffle entirely when an estimate is
  enough (compare approx distinct vs count within rsd).
- referential: broadcast the parent side when small (dimension tables);
  sort-merge otherwise with AQE skew-join splitting oversized partitions.
- drift: per-partition histogram partials merge associatively (the shuffle
  moves bin counts, never rows); KS/chi-square tail math runs on the driver
  over bytes-sized inputs (stats_math.py — scipy-free).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .stats_math import chi2_sf, ks_2samp_pvalue


# ---------------------------------------------------------------------------
# uniqueness
# ---------------------------------------------------------------------------
def uniqueness_violations(df: DataFrame, keys: Sequence[str] | str) -> DataFrame:
    """Exact duplicate keys: (key..., n_duplicates). Hash-agg; only keys with
    count>1 survive the HAVING filter (pushed after partial agg)."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n_duplicates"))
        .filter(F.col("n_duplicates") > 1)
    )


def uniqueness_check(df: DataFrame, keys: Sequence[str] | str, rsd: float = 0.02) -> dict:
    """HLL fast path: no shuffle of keys, just one aggregation. If the HLL
    estimate is within its error band of the row count, the key is unique
    with high confidence; only then is the exact check worth running."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    key_col = F.concat_ws("", *[F.col(k).cast("string") for k in keys])
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.approx_count_distinct(key_col, rsd).alias("d"),
    ).first()
    n, d = row["n"], row["d"]
    probably_unique = d >= n * (1 - 3 * rsd)
    return {"n_rows": n, "approx_distinct": d, "probably_unique": bool(probably_unique)}


# ---------------------------------------------------------------------------
# referential integrity
# ---------------------------------------------------------------------------
def referential_violations(
    child: DataFrame,
    child_key: str,
    parent: DataFrame,
    parent_key: str,
    broadcast_parent: Optional[bool] = None,
) -> DataFrame:
    """Child rows whose key has no parent (left_anti join).

    broadcast_parent=None (default) defers the strategy to AQE /
    spark.sql.autoBroadcastJoinThreshold at runtime — no extra driver-side
    job; True forces a broadcast hint for known dimension-sized parents
    (no shuffle of the 100-TB child side at all); False forces the
    sort-merge path where AQE handles skew splitting.
    """
    parent_keys = parent.select(F.col(parent_key).alias(child_key)).dropDuplicates([child_key])
    if broadcast_parent is None:
        # let AQE / spark.sql.autoBroadcastJoinThreshold decide at runtime —
        # no extra driver-side count() job scanning the parent (VERDICT r1
        # fix #8); AQE converts to broadcast when the built side is small
        # and splits skewed partitions otherwise
        pass
    elif broadcast_parent:
        parent_keys = F.broadcast(parent_keys)
    return child.join(parent_keys, on=child_key, how="left_anti")


def referential_check(child, child_key, parent, parent_key, **kw) -> dict:
    bad = referential_violations(child, child_key, parent, parent_key, **kw)
    n_orphans = bad.count()
    return {"n_orphans": n_orphans, "pass": n_orphans == 0}


# ---------------------------------------------------------------------------
# distribution drift
# ---------------------------------------------------------------------------
@dataclass
class DriftResult:
    statistic: float
    p_value: float
    n_left: int
    n_right: int
    drifted: bool
    test: str
    truncated: bool = False


def _bucket_expr(x, lo: float, hi: float, n_bins: int):
    """The bucket formula least(floor(((x-lo)*n)/(hi-lo)), n-1), spelled
    out (not width_bucket) so an external SQL engine can reproduce the
    statistic bit-for-bit with the same IEEE-754 op order."""
    return F.greatest(
        F.least(
            F.floor(((x - F.lit(lo)) * F.lit(float(n_bins))) / F.lit(hi - lo)),
            F.lit(n_bins - 1),
        ),
        F.lit(0),
    )


def ks_drift(
    left: DataFrame,
    right: DataFrame,
    column: str,
    n_bins: int = 256,
    alpha: float = 0.01,
    bounds: tuple[float, float] | None = None,
) -> DriftResult:
    """Two-sample KS over a shared bin grid (binned ECDF approximation —
    exact to 1/n_bins in the statistic). Exactly TWO driver actions
    (VERDICT r2 #5, down from four): one union'd min/max agg for the
    shared bounds, then one side-tagged histogram agg whose shuffle moves
    only (side, bucket, count) triples — constant-sized regardless of
    table size. Re-runs that already know the grid pass `bounds=(lo, hi)`
    and pay a single scan per side."""
    x = F.col(column).cast("double")
    sides = left.select(x.alias("_x"), F.lit(0).alias("_side")).unionByName(
        right.select(x.alias("_x"), F.lit(1).alias("_side"))
    )
    if bounds is None:
        b = sides.agg(F.min("_x").alias("lo"), F.max("_x").alias("hi")).first()
        lo, hi = b["lo"], b["hi"]
    else:
        lo, hi = bounds
    if lo == hi:
        hi = lo + 1.0
    rows = (
        sides.filter(F.col("_x").isNotNull())
        .groupBy("_side", _bucket_expr(F.col("_x"), lo, hi, n_bins).alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    )
    hl, hr = [0] * n_bins, [0] * n_bins
    for r in rows:
        (hl if r["_side"] == 0 else hr)[int(r["bucket"])] = r["cnt"]
    n1, n2 = sum(hl), sum(hr)
    d = 0.0
    cl = cr = 0
    for i in range(len(hl)):
        cl += hl[i]
        cr += hr[i]
        d = max(d, abs(cl / n1 - cr / n2))
    p = ks_2samp_pvalue(d, n1, n2)
    return DriftResult(d, p, n1, n2, p < alpha, "ks")


def keep_rate_drift(
    old: DataFrame,
    new: DataFrame,
    keep_col: str,
    group_cols: "tuple[str, ...]" = ("lang",),
    *,
    critical: float = 6.634897,
) -> DataFrame:
    """Per-group gate pass-rate drift between two corpus versions — the
    monitoring view a production cleaning run alarms on ('did the
    gopher keep-rate for lang=de collapse in this crawl?'). Composable
    with any boolean gate column (text.quality_flags's gopher_keep /
    c4_keep / quality_keep, a classifier threshold, a validator
    verdict): pass the two FLAGGED frames and the flag's name.

    Emits per group: n_old/n_new, keep_old/keep_new (integer counts),
    rate_old/rate_new/delta_rate (6dp), chi2 (the 2x2 homogeneity
    statistic N(ad-bc)^2/((a+b)(c+d)(a+c)(b+d)), 6dp), and
    drifted = chi2 > critical (default = the dof-1 alpha=0.01 cut
    6.634897 — a CONSTANT comparison, so the DuckDB twin is fully
    algorithmic; integrity.chi2_drift is the p-value path when a
    scipy-grade tail is wanted).

    Scale shape: one map-side-combined count aggregate per side
    (shuffle bounded by group cardinality), one group-keyed outer join
    of two group-sized frames, pure arithmetic after. Groups absent on
    one side count 0 there (full outer join, the drift you most want
    to see). NULL keep flags count as not-kept."""
    def _agg(df: DataFrame, n_name: str, k_name: str) -> DataFrame:
        return df.groupBy(*[F.col(c) for c in group_cols]).agg(
            F.count(F.lit(1)).alias(n_name),
            F.coalesce(
                F.sum(F.when(F.col(keep_col), 1)), F.lit(0)
            ).cast("long").alias(k_name),
        )

    # eqNullSafe join keys: a NULL group (lang-ID failures are a real
    # production slice) must line up across versions — a plain equality
    # join splits it into two half-rows that each see the other side as
    # 0 and can never flag drift (r6 second review #2). Explicit
    # aliases because old and new are usually derived from the SAME
    # scan (version filters on one table) — unqualified lineage refs
    # would be ambiguous in that self-join.
    lo = _agg(old, "n_old", "keep_old").alias("_jsp_l")
    ro = _agg(new, "n_new", "keep_new").alias("_jsp_r")
    cond = None
    for c in group_cols:
        piece = F.col(f"_jsp_l.{c}").eqNullSafe(F.col(f"_jsp_r.{c}"))
        cond = piece if cond is None else (cond & piece)
    j = lo.join(ro, cond, "full_outer").select(
        *[F.coalesce(F.col(f"_jsp_l.{c}"), F.col(f"_jsp_r.{c}")).alias(c)
          for c in group_cols],
        F.coalesce("n_old", F.lit(0)).cast("long").alias("n_old"),
        F.coalesce("keep_old", F.lit(0)).cast("long").alias("keep_old"),
        F.coalesce("n_new", F.lit(0)).cast("long").alias("n_new"),
        F.coalesce("keep_new", F.lit(0)).cast("long").alias("keep_new"),
    )
    a = F.col("keep_old").cast("double")
    b = (F.col("n_old") - F.col("keep_old")).cast("double")
    c = F.col("keep_new").cast("double")
    d = (F.col("n_new") - F.col("keep_new")).cast("double")
    n = a + b + c + d
    denom = (a + b) * (c + d) * (a + c) * (b + d)
    # explicit square, not pow(x, 2): libm pow is not correctly rounded
    # everywhere, multiplication is — the twin must match bit-for-bit
    diff = a * d - b * c
    chi2 = F.when(denom > 0, n * (diff * diff) / denom) \
        .otherwise(F.lit(0.0))
    rate_old = F.when(F.col("n_old") > 0, a / (a + b))
    rate_new = F.when(F.col("n_new") > 0, c / (c + d))
    return j.select(
        *group_cols, "n_old", "keep_old", "n_new", "keep_new",
        F.round(rate_old, 6).alias("rate_old"),
        F.round(rate_new, 6).alias("rate_new"),
        F.round(rate_new - rate_old, 6).alias("delta_rate"),
        F.round(chi2, 6).alias("chi2"),
        (chi2 > critical).alias("drifted"),
    )


def chi2_drift(
    left: DataFrame,
    right: DataFrame,
    column: str,
    alpha: float = 0.01,
    max_categories: int = 10_000,
) -> DriftResult:
    """Chi-square homogeneity test on a categorical column. One groupBy per
    side (distinct categories only cross the wire).

    Cardinality above max_categories truncates DETERMINISTICALLY to the
    top-N by count (ties broken by value) and sets DriftResult.truncated —
    an unordered limit() would silently pick a nondeterministic subset and
    make the statistic non-reproducible (VERDICT r1 fix #7)."""
    def _counts(df: DataFrame) -> tuple[dict, bool]:
        rows = (
            df.groupBy(F.col(column).alias("v"))
            .agg(F.count(F.lit(1)).alias("c"))
            .orderBy(F.col("c").desc(), F.col("v").asc_nulls_last())
            .limit(max_categories + 1)
            .collect()
        )
        trunc = len(rows) > max_categories
        return {r["v"]: r["c"] for r in rows[:max_categories]}, trunc

    lc, l_trunc = _counts(left)
    rc, r_trunc = _counts(right)
    truncated = l_trunc or r_trunc
    cats = sorted(set(lc) | set(rc), key=lambda x: (x is None, str(x)))
    n1 = sum(lc.values())
    n2 = sum(rc.values())
    total = n1 + n2
    stat = 0.0
    dof = 0
    for cat in cats:
        o1, o2 = lc.get(cat, 0), rc.get(cat, 0)
        row_total = o1 + o2
        if row_total == 0:
            continue
        e1 = row_total * n1 / total
        e2 = row_total * n2 / total
        if e1 > 0:
            stat += (o1 - e1) ** 2 / e1
        if e2 > 0:
            stat += (o2 - e2) ** 2 / e2
        dof += 1
    dof = max(dof - 1, 1)
    p = chi2_sf(stat, dof)
    return DriftResult(stat, p, n1, n2, p < alpha, "chi2", truncated)
