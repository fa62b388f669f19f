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
    """Canonical form: lowercase scheme+host, default :80/:443 ports
    dropped, fragment dropped, tracking params dropped, dangling '?'/'&'
    trimmed, trailing slash on a bare host-path kept as-is (path case is
    significant and preserved)."""
    u = F.trim(url)
    # lowercase scheme://host[:port] (group 1), keep the rest as-is
    u = F.concat(
        F.lower(F.regexp_extract(u, r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)", 1)),
        F.regexp_replace(u, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*", ""),
    )
    u = F.regexp_replace(u, r"#.*$", "")                     # fragment
    # default ports: capture the delimiter instead of a lookahead so the
    # DuckDB oracle (RE2: no lookahead) reproduces the same rewrite
    u = F.regexp_replace(u, r"^(https://[^/?#:]*):443($|[/?])", r"$1$2")
    u = F.regexp_replace(u, r"^(http://[^/?#:]*):80($|[/?])", r"$1$2")
    u = F.regexp_replace(u, TRACKING_PARAMS + r"=[^&#]*&", "")   # mid-query
    u = F.regexp_replace(u, r"[?&]" + TRACKING_PARAMS + r"=[^&#]*$", "")
    u = F.regexp_replace(u, r"\?" + TRACKING_PARAMS + r"=[^&#]*&", "?")
    u = F.regexp_replace(u, r"[?&]$", "")                    # dangling ? / &
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
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.sort_array(F.collect_list(id_col)).alias("doc_ids"))
        .filter(F.col("n_docs") > 1)
    )
