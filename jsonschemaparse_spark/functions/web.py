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


# second-level suffixes under which the registered domain is THREE labels
# (example.co.uk). A deliberately small heuristic list, not the full
# public-suffix list: the crawl-pipeline uses of registered_domain
# (per-domain stats, spam-domain filters) only need hosts of the same
# site to agree with each other, which a stable heuristic guarantees.
SECOND_LEVEL_SUFFIXES = ("ac", "co", "com", "edu", "gov", "net", "org")

# both patterns are RE2-portable and shared verbatim with the DuckDB
# oracle twins (no lookarounds; non-capturing groups only)
DOMAIN_RE = (
    r"([^.]+\.(?:" + "|".join(SECOND_LEVEL_SUFFIXES) + r")\.[a-z][a-z]"
    r"|[^.]+\.[^.]+)$"
)
HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]*)"


def host_of(url: Column) -> Column:
    """Lowercased host (no userinfo, no port) of an absolute URL."""
    return F.lower(F.regexp_extract(F.trim(url), HOST_RE, 1))


def registered_domain(url: Column) -> Column:
    """Registered (site-owner) domain of a URL: the last two host labels,
    or the last three when the second-level label is a well-known suffix
    under a two-letter ccTLD (example.co.uk -> example.co.uk, not co.uk).
    Dotless hosts (localhost, bare IPv6) fall back to the host itself.
    Single anchored alternation, RE2-portable (no lookarounds) so the
    DuckDB oracle evaluates the identical expression. Documented
    limitation: IPv4 hosts yield their last two octets — callers that
    crawl by IP should filter on `host_of` instead."""
    host = host_of(url)
    dom = F.regexp_extract(host, DOMAIN_RE, 1)
    return F.when(dom == "", host).otherwise(dom)


def domain_stats(df: DataFrame, url_col: str = "url",
                 size_col: str | None = None,
                 approx_hosts: bool = False) -> DataFrame:
    """Per-registered-domain corpus profile: (domain, n_docs, n_hosts
    [, total_size]) — the aggregation behind URL/domain-level curation
    (spam-domain discovery, per-domain caps a la RefinedWeb).

    Cost shape (review-corrected): counts and sums partial-combine
    map-side to one row per (domain, map partition). The host count is
    EXACT countDistinct by default — its two-stage plan shuffles one row
    per distinct (domain, host) pair, so a megasite with millions of
    hosts ships millions of narrow key rows. At crawl scale pass
    approx_hosts=True: the HLL sketch (approx_count_distinct) really is
    one combined row per (domain, map partition), bounding the shuffle
    regardless of host skew. Exact stays the default because it is the
    oracle-reproducible form (DuckDB count(DISTINCT ...))."""
    d = df.select(registered_domain(F.col(url_col)).alias("domain"),
                  host_of(F.col(url_col)).alias("host"),
                  *([F.col(size_col)] if size_col else []))
    n_hosts = (F.approx_count_distinct("host") if approx_hosts
               else F.countDistinct("host"))
    aggs = [F.count(F.lit(1)).alias("n_docs"), n_hosts.alias("n_hosts")]
    if size_col:
        aggs.append(F.sum(size_col).alias("total_size"))
    return d.groupBy("domain").agg(*aggs)


def filter_domains(df: DataFrame, blocklist: DataFrame | list[str],
                   url_col: str = "url") -> DataFrame:
    """Drop rows whose registered domain appears in `blocklist` (a list
    or a 1-column DataFrame). Broadcast anti-join: blocklists are
    dim-table sized (UT1 ~4M rows ~ 100 MB), so the corpus never
    shuffles; a list argument becomes an `isin` filter, which codegen
    compiles to a hash-set probe in the scan stage."""
    dom = registered_domain(F.col(url_col))
    if isinstance(blocklist, list):
        # NULL-safe: a NULL url yields a NULL domain; bare ~isin() would
        # evaluate NULL and silently drop the row, diverging from the
        # anti-join branch (where a NULL key never matches, so the row
        # survives). Both branches keep NULL-domain rows.
        return df.filter(~F.coalesce(dom.isin(blocklist), F.lit(False)))
    bl = blocklist.toDF("_jsp_blocked_domain").dropDuplicates()
    return (df.withColumn("_jsp_domain", dom)
            .join(F.broadcast(bl),
                  F.col("_jsp_domain") == F.col("_jsp_blocked_domain"),
                  "left_anti")
            .drop("_jsp_domain"))


def cap_per_domain(df: DataFrame, max_docs: int, key_col: str,
                   url_col: str = "url", seed: int = 0) -> DataFrame:
    """Keep at most `max_docs` documents per registered domain — the
    per-domain cap crawl curation applies so template-heavy megasites
    cannot dominate the corpus (the RefinedWeb recipe).

    Survivors are chosen by DETERMINISTIC hash rank over the row key
    (md5(key:seed), key as tiebreak), not arrival/partition order: the
    kept set is a pure function of the data — same rows on every re-run,
    every cluster size, every layout (the sampling.py determinism
    contract, extended to a per-group top-N).

    Rows with NO extractable domain (NULL or relative/malformed URLs)
    BYPASS the cap: they are not a megasite, and collapsing them into
    one pseudo-domain would both cap away arbitrary amounts of valid
    data and manufacture a single giant window partition (review
    finding). Each such row gets its own partition key, so it neither
    sorts with others nor gets filtered.

    Shape: one Window partitioned by the domain key (parallel across
    domains; each domain sorts only its own rows). Skew note: a domain
    with D docs sorts D rows in one task — for crawl-scale hot domains
    (D ~ 10^8) pre-thin first with a deterministic_sample at a fraction
    that bounds D, then apply the exact cap; both stages keep the
    determinism contract, so the composition does too."""
    from pyspark.sql import Window

    from .sampling import _hash8

    dom = registered_domain(F.col(url_col))
    # '\x00' cannot appear in a registered domain, so the per-row bypass
    # key cannot collide with a real domain group
    part = F.when((dom.isNull()) | (dom == ""),
                  F.concat(F.lit("\x00"), F.col(key_col).cast("string"))
                  ).otherwise(dom)
    w = Window.partitionBy("_jsp_domain").orderBy("_jsp_rank", key_col)
    return (df.withColumn("_jsp_domain", part)
            .withColumn("_jsp_rank", _hash8(F.col(key_col), seed))
            .withColumn("_jsp_rn", F.row_number().over(w))
            .filter(F.col("_jsp_rn") <= max_docs)
            .drop("_jsp_domain", "_jsp_rank", "_jsp_rn"))


def latest_capture(df: DataFrame, url_col: str = "url",
                   ts_col: str = "warc_ts", id_col: str | None = None) -> DataFrame:
    """Keep the newest capture of each URL — the re-crawl dedup every
    Common-Crawl-style corpus runs before content dedup (the same page
    is fetched in many snapshots; only the latest version should enter
    the pipeline). Ties on the timestamp break by the largest `id_col`
    (or arbitrarily-but-deterministically by the remaining columns when
    no id is given), so the survivor set is a pure function of the data.

    Shape: ONE hash aggregate — max(struct(ts, id, payload)) groups by
    the URL key with map-side partial combine, so each map partition
    sends at most one candidate row per URL; no window (a window over
    `partition by url order by ts` would sort every partition), no
    join-back (the payload rides inside the struct). Shuffle volume is
    bounded by the number of distinct URLs, not the number of captures."""
    cols = [c for c in df.columns if c not in (url_col,)]
    ordered = [ts_col] + ([id_col] if id_col else []) \
        + [c for c in cols if c != ts_col and c != id_col]
    winner = (df.groupBy(url_col)
              .agg(F.max(F.struct(*ordered)).alias("_jsp_w")))
    return winner.select(
        url_col, *[F.col(f"_jsp_w.{c}").alias(c) for c in cols])
