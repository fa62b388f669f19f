"""Model-based quality scoring: a hashed linear (fastText-style)
classifier evaluated entirely JVM-side.

Production webtext curation (the CCNet / GPT-3 / LLaMA recipes) filters
documents with a linear model over hashed token features — the model is
tiny, the corpus is 100 TB, so the engine-side problem is evaluating
`score = sigmoid(mean_w(tokens))` inside the corpus scan with no Python
and no shuffle. That plumbing is what this module ships:

 * tokens come from the engine's standard whitespace split (the same
   convention as text.token_count / the Gopher gate);
 * each token maps to a weight, either (a) a caller-supplied explicit
   weight table (broadcast map literal — real models are < 10 MB of
   vocab) or (b) the deterministic hashed stand-in below;
 * score is an `aggregate` HOF over the token array — one codegen'd
   projection, zero Python, zero shuffle, composable into the same
   single corpus scan as the quality gates (one-scan rule).

The hashed stand-in weight is `top32(md5(token ':' seed)) / 2^32 - 0.5`
— uniform on [-0.5, 0.5), a pure function of the token text, and
expressible identically in DuckDB (`CAST('0x'||substr(md5(..),1,8) AS
BIGINT)`), so the oracle exercises the REAL evaluation path end-to-end.
Swapping in trained fastText weights is a weights-dict argument, not a
code change; training itself is out of engine scope (the reference —
a JSON validator, awwright/jsonschemaparse — has no counterpart; this
module belongs to the repo's LLM-training-data tier).

NULL convention: gates/scoring treat NULL text as empty (score 0.0,
n_tokens 0) — the engine-wide rule pinned in tests/test_null_conventions.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TWO_32 = float(1 << 32)


def _tokens(text: Column) -> Column:
    t = F.lower(F.coalesce(text, F.lit("")))
    return F.filter(F.split(t, r"\s+"), lambda w: w != F.lit(""))


def hashed_token_weight(token: Column, seed: int = 0) -> Column:
    """Deterministic stand-in weight in [-0.5, 0.5): the top 32 bits of
    md5(token ':' seed), scaled. `conv` parses the 8 hex chars JVM-side;
    the DuckDB twin is a '0x' string cast (classifier_weight_sql)."""
    h = F.substring(F.md5(F.concat(token, F.lit(f":{seed}"))), 1, 8)
    return F.conv(h, 16, 10).cast("bigint") / F.lit(TWO_32) - F.lit(0.5)


def classifier_weight_sql(token_expr: str, seed: int = 0) -> str:
    """DuckDB twin of hashed_token_weight, built from the same constants
    so engine and oracle cannot drift."""
    return (f"(CAST('0x' || substr(md5({token_expr} || ':{seed}'), 1, 8) "
            f"AS BIGINT) / {TWO_32:.1f} - 0.5)")


def quality_score(text: Column, weights: dict[str, float] | None = None,
                  seed: int = 0) -> Column:
    """Mean token weight of `text` (0.0 for empty/NULL docs). With a
    `weights` dict, unknown tokens contribute 0.0 (the fastText
    convention for OOV with no subword buckets); without one, every
    token gets its hashed stand-in weight."""
    toks = _tokens(text)
    if weights is None:
        w = lambda t: hashed_token_weight(t, seed)  # noqa: E731
    else:
        table = F.create_map(
            *[F.lit(x) for kv in sorted(weights.items()) for x in kv])
        w = lambda t: F.coalesce(F.element_at(table, t), F.lit(0.0))  # noqa: E731
    total = F.aggregate(toks, F.lit(0.0), lambda acc, t: acc + w(t))
    return F.when(F.size(toks) > 0, total / F.size(toks)).otherwise(F.lit(0.0))


def classify_quality(df: DataFrame, text_col: str = "text",
                     weights: dict[str, float] | None = None,
                     threshold: float = 0.0, seed: int = 0,
                     score_col: str = "quality_score",
                     keep_col: str = "classifier_keep") -> DataFrame:
    """df + (score, keep) columns — one projection over the text column;
    `keep` is `score > threshold`. The GPT-3 recipe keeps a stochastic
    fringe below the threshold (np.random.pareto); the deterministic
    engine equivalent is composing this with
    sampling.deterministic_sample over the rejected stratum."""
    s = quality_score(F.col(text_col), weights, seed)
    return (df.withColumn(score_col, s)
            .withColumn(keep_col, F.col(score_col) > F.lit(threshold)))
