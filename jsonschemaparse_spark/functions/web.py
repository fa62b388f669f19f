"""URL canonicalization + URL-level dedup (crawl-pipeline staples).

The same page is crawled under fragment/tracking-parameter/case variants;
document dedup by canonical URL removes the cheapest duplicate class
before any content hashing. Pure Column expressions (regexp steps kept
simple and POSIX-portable so the DuckDB oracle reproduces them)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tracking parameters stripped by canonical_url (the usual suspects)
TRACKING_PARAMS = r"(utm_[a-z]+|fbclid|gclid|msclkid|ref_src)"


def canonical_url(url: Column) -> Column:
    """Canonical form: scheme and HOST lowercased (userinfo preserved —
    case-significant per RFC 3986), default :80/:443 ports dropped,
    fragment dropped, tracking params dropped with proper [?&] anchoring,
    dangling '?' trimmed. Path/query case is significant and preserved.

    Tracking removal is three anchored passes (r4 fourth-review #1/#5 —
    the earlier unanchored pattern mangled params merely CONTAINING a
    tracking name and could delete path segments):
      1. '&param=v' anywhere in the query (global; adjacent params fall in
         one pass since matches don't overlap);
      2. leading '?param=v&' -> '?' (tracking first, more params follow);
      3. leading '?param=v' at end -> '' (tracking was the only param).
    Documented limitation: a literal '&param=' sequence in the PATH of a
    URL with no query would also match pass 1 — RE2 (the oracle engine)
    has no lookbehind to scope passes to after '?', and such paths are
    effectively tracking anyway."""
    u = F.trim(url)
    scheme = F.lower(F.regexp_extract(u, r"^([a-zA-Z][a-zA-Z0-9+.-]*://)", 1))
    userinfo = F.regexp_extract(u, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#@]*@)", 1)
    hostport = F.lower(F.regexp_extract(
        u, r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/?#]*)", 1))
    rest = F.regexp_replace(u, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*", "")
    u = F.concat(scheme, userinfo, hostport, rest)
    u = F.regexp_replace(u, r"#.*$", "")                     # fragment
    # default ports: capture the delimiter instead of a lookahead so the
    # DuckDB oracle (RE2: no lookahead) reproduces the same rewrite
    u = F.regexp_replace(u, r"^(https://(?:[^/?#@]*@)?[^/?#:]*):443($|[/?])", r"$1$2")
    u = F.regexp_replace(u, r"^(http://(?:[^/?#@]*@)?[^/?#:]*):80($|[/?])", r"$1$2")
    u = F.regexp_replace(u, r"&" + TRACKING_PARAMS + r"=[^&#]*", "")
    u = F.regexp_replace(u, r"\?" + TRACKING_PARAMS + r"=[^&#]*&", "?")
    u = F.regexp_replace(u, r"\?" + TRACKING_PARAMS + r"=[^&#]*$", "")
    u = F.regexp_replace(u, r"\?$", "")                     # dangling ?
    return u


def with_canonical_url(df: DataFrame, url_col: str = "url",
                       out_col: str = "canonical_url") -> DataFrame:
    return df.withColumn(out_col, canonical_url(F.col(url_col)))


def url_duplicate_groups(df: DataFrame, id_col: str,
                         url_col: str = "url") -> DataFrame:
    """(canonical_url, n_docs, doc_ids) groups with >1 member — exact
    dedup on the canonical form (hash groupBy, map-side combinable)."""
    return (
        df.select(F.col(id_col), canonical_url(F.col(url_col)).alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(F.countDistinct(id_col).alias("n_docs"),
             F.sort_array(F.collect_set(id_col)).alias("doc_ids"))
        .filter(F.col("n_docs") > 1)
    )
