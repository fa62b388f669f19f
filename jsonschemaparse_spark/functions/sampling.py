"""Deterministic hash-based sampling: Bernoulli, stratified mixture
weighting, and train/test splits for corpus assembly (the Pile / ROOTS
recipe — per-source/per-language mixture rates applied while reading).

The reference (a single-document JSON validator) has no counterpart;
this belongs to the repo's LLM-training-data tier.

Why hash-based and not `df.sample`/`sampleBy`: Spark's samplers draw
from a per-partition RNG stream, so the kept set changes whenever the
partitioning changes (repartition, AQE coalesce, different cluster
width). A 100-TB corpus build needs the SAME kept set on every re-run,
any cluster size, any partition layout — so the keep decision is a pure
function of the row key: keep iff the first 8 hex chars of
md5(key ':' seed) fall below a threshold derived from the fraction.
Uniformity comes from md5; determinism is absolute; the operator is a
narrow codegen'd Filter — no shuffle, no RNG state, and it composes
into the same corpus scan as the gates (one-scan rule).

The hex-string comparison trick: md5 emits fixed-width lowercase hex,
and '0'..'9' < 'a'..'f' in ASCII, so LEXICOGRAPHIC order on the first
8 chars equals numeric order on the top 32 bits — a plain string `<`
that evaluates identically in Spark and the DuckDB oracle (both expose
md5 with identical output; no base-16 integer parsing needed on either
side).

NULL convention: the sample key is a KEYING use — NULL keys hash like
'' (one stable decision), mirroring exact dedup's content key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def threshold_hex(fraction: float) -> str | None:
    """8-hex-char keep threshold for `fraction`; None means keep-all
    (fraction >= 1). keep iff substr(md5,1,8) < threshold — fraction 0
    yields '00000000', below which no hex string sorts."""
    if fraction >= 1.0:
        return None
    f = max(0.0, fraction)
    return format(int(f * (1 << 32)), "08x")


def _hash8(key: Column, seed: int) -> Column:
    key = F.coalesce(key.cast("string"), F.lit(""))
    return F.substring(F.md5(F.concat(key, F.lit(f":{seed}"))), 1, 8)


def hash_keep(key: Column, fraction: float, seed: int = 0) -> Column:
    """Boolean keep decision — deterministic in (key, seed, fraction)
    only; independent of partitioning, ordering, and cluster size."""
    t = threshold_hex(fraction)
    if t is None:
        return F.lit(True)
    return _hash8(key, seed) < F.lit(t)


def deterministic_sample(df: DataFrame, fraction: float, key_col: str,
                         seed: int = 0) -> DataFrame:
    """Bernoulli(fraction) sample keyed on `key_col`. Narrow filter;
    re-running at any parallelism keeps the identical row set."""
    return df.filter(hash_keep(F.col(key_col), fraction, seed))


def stratified_sample(df: DataFrame, fractions: dict[str, float],
                      strata_col: str, key_col: str, seed: int = 0,
                      default_fraction: float = 0.0) -> DataFrame:
    """Per-stratum Bernoulli rates (mixture weighting): each row keeps
    with `fractions[stratum]`, falling back to `default_fraction` for
    unlisted strata. The per-row threshold is a small CASE chain over
    the broadcast-sized fractions dict — still one narrow Filter, no
    shuffle, no per-stratum pass. NULL strata take the default."""
    # keep-all strata get a sentinel above every hex string
    # ('~' > 'f' in ASCII) so the single `<` compare stays uniform.
    expr = F.lit(threshold_hex(default_fraction) or "ffffffff~")
    for value, fraction in sorted(fractions.items()):
        t = threshold_hex(fraction)
        expr = F.when(F.col(strata_col) == value,
                      F.lit(t if t is not None else "ffffffff~")) \
                .otherwise(expr)
    return df.filter(_hash8(F.col(key_col), seed) < expr)


def train_test_split(df: DataFrame, key_col: str, test_fraction: float,
                     seed: int = 0, out_col: str = "split") -> DataFrame:
    """df + a 'train'/'test' column — the same decision for a given key
    on every run and every cluster, so eval membership never drifts
    between corpus rebuilds."""
    return df.withColumn(
        out_col,
        F.when(hash_keep(F.col(key_col), test_fraction, seed),
               F.lit("test")).otherwise(F.lit("train")))


def temperature_rates(df: DataFrame, strata_col: str, *,
                      alpha: float = 0.5,
                      target_fraction: float) -> dict[str, float]:
    """Temperature-based mixture rates (the T5/mT5/LLaMA multi-source
    recipe): source s gets sampling share proportional to n_s^alpha —
    alpha < 1 flattens the natural distribution so giant sources stop
    drowning small ones. Returns {stratum: keep_rate} such that the
    expected kept total is `target_fraction` of the corpus and kept
    counts are proportional to n_s^alpha (capped at 1.0: this engine
    samples WITHOUT replacement; true upsampling of tiny sources is a
    repetition decision for the training loader, not the corpus build
    — rates that hit the cap leave the surplus in the other sources'
    expected shares undistributed, reported by the caller comparing
    sum(rate*n) to target).

    One stratum-bounded group-count job; everything else is driver
    arithmetic. Determinism contract (what makes the DuckDB twin exact
    at alpha=0.5): counts are exact integers; sqrt is IEEE
    correctly-rounded; the weight sum folds in sorted-stratum order;
    each subsequent op (mul/div/min/trunc) is exactly rounded — so the
    derived thresholds are bit-identical across engines. Other alpha
    values use pow(), which is NOT correctly-rounded on every libm —
    fine for production, but pin oracles at alpha=0.5."""
    rows = df.groupBy(strata_col).count().collect()
    counts = sorted((r[strata_col], int(r["count"])) for r in rows
                    if r[strata_col] is not None)
    n_total = sum(n for _, n in counts)
    if n_total == 0:
        return {}
    target = target_fraction * float(n_total)

    # alpha == 0.5 MUST use sqrt, not pow: sqrt is IEEE
    # correctly-rounded everywhere, pow(x, 0.5) is not on every libm —
    # and the bit-identical-twin contract depends on it (r6 review)
    if alpha == 0.5:
        import math

        def _w(n: int) -> float:
            return math.sqrt(float(n))
    else:
        def _w(n: int) -> float:
            return float(n) ** alpha

    wsum = 0.0
    for _, n in counts:  # left fold in sorted order — mirrored in SQL
        wsum += _w(n)
    rates: dict[str, float] = {}
    for s, n in counts:
        share = _w(n) / wsum
        rates[s] = min(1.0, target * share / float(n))
    return rates


def temperature_mixture(df: DataFrame, strata_col: str, key_col: str, *,
                        alpha: float = 0.5, target_fraction: float,
                        seed: int = 0) -> DataFrame:
    """Deterministic temperature-weighted corpus sample: rates from
    `temperature_rates`, applied as the usual single narrow hash
    Filter (stratified_sample). Unlisted/NULL strata drop."""
    rates = temperature_rates(df, strata_col, alpha=alpha,
                              target_fraction=target_fraction)
    return stratified_sample(df, rates, strata_col, key_col, seed=seed)


def group_samples(df: DataFrame, strata_col: str, key_col: str, *,
                  k: int = 10, seed: int = 0) -> DataFrame:
    """Deterministic per-group inspection sample (the corpus-QA view:
    'show me k docs from every (lang, source) slice'): df + `sample_rank`
    (1..k) for the k rows per stratum with the smallest md5(key:seed) —
    a uniform draw that is a pure function of (key, seed), so the same
    rows come back on every run, every cluster size, every layout (the
    module's hash-sampling contract, extended to per-group top-k).

    PRECONDITION: key_col must be unique per row (the table's key —
    the same requirement pack_sequences imposes). Rows sharing a key
    (or multiple NULL keys, which all hash like '') produce EQUAL
    ordering tuples, and row_number breaks that tie by arrival order —
    layout-dependent, which silently voids the determinism contract
    for exactly those rows (r6 second review #6).

    Cost shape: one window per stratum (rank over the group's rows).
    For corpus-scale strata, pre-thin first — the composition
    group_samples(deterministic_sample(df, f, key), ...) keeps the SAME
    final rows whenever f retains >= k rows per stratum, because
    hash-order prefixes are stable under hash-threshold filtering (both
    order by the same md5)."""
    from pyspark.sql import Window

    h = _hash8(F.col(key_col), seed)
    w = Window.partitionBy(strata_col).orderBy(
        h.asc(), F.col(key_col).asc())
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= k)
        .withColumn("sample_rank", F.col("sample_rank").cast("int"))
    )


def sample_oracle_sql(key_expr: str, fraction: float, seed: int = 0) -> str:
    """DuckDB boolean twin of hash_keep — built from the same threshold
    so engine and oracle cannot drift."""
    t = threshold_hex(fraction)
    if t is None:
        return "TRUE"
    return (f"substr(md5(coalesce(CAST({key_expr} AS VARCHAR), '') "
            f"|| ':{seed}'), 1, 8) < '{t}'")
