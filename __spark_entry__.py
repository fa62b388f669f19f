"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)    — flagship validation pass on sf0.001 documents.
queries()       — one entry per implemented operator (SURVEY.md §2 + §2.11
                  extensions + training-data ops).
oracle_sql()    — DuckDB-equivalent ANSI SQL for every SQL-expressible query.
                  Omitted keys (webpages/simhash/drift/CMS) rely on
                  engine-specific hashing or binned statistics and get the
                  driver's rows-only check.

Column names are aliased identically on both sides; floats are rounded on
both sides before comparison.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jsonschemaparse_spark.functions.dedup import (
    content_key,
    exact_duplicate_groups,
    minhash_near_duplicates,
    minhash_signature,
    simhash,
)
from jsonschemaparse_spark.functions.integrity import (
    ks_drift,
    referential_violations,
    uniqueness_violations,
)
from jsonschemaparse_spark.functions.similarity import brute_force_topk, cosine
from jsonschemaparse_spark.functions.stats import top_k
from jsonschemaparse_spark.functions.text import (
    STOPWORDS,
    TOKEN_RE,
    bpe_token_count,
    detect_language,
    fingerprint,
    token_count,
)
from jsonschemaparse_spark.plans import validate_dataframe, validate_json_column
from jsonschemaparse_spark.sources import synthesize_webpages

LANGS = ["en", "de", "fr", "es", "zh", "ja", "ru", "pt", "it", "nl"]

# Flagship ruleset over the shipped documents table (FIXTURES.md §F2 analog).
DOC_RULES = {
    "$id": "https://fixtures.local/webpage",
    "type": "object",
    "required": ["doc_id", "text", "lang"],
    "properties": {
        "doc_id": {"type": "integer", "minimum": 0},
        "text": {"type": "string", "minLength": 1, "maxLength": 10000},
        "lang": {"enum": LANGS},
        "source": {"type": "string", "pattern": "^src"},
        "n_chars": {"type": "integer", "minimum": 0, "maximum": 500},
    },
}

WEBPAGE_RULES = {
    "type": "object",
    "required": ["url", "warc_ts", "text", "lang"],
    "properties": {
        "url": {"type": "string", "pattern": "^https?://", "maxLength": 2048},
        "text": {"type": "string", "minLength": 1},
        "lang": {"enum": LANGS},
    },
}


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: single-pass validation of sf0.001 documents -> violations."""
    df = _docs(spark, "/root/testdata/sf0.001")
    res = validate_dataframe(df, DOC_RULES, key_cols=["doc_id"])
    return res.violations()


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------
def q_validate_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    res = validate_dataframe(_docs(spark, sf_dir), DOC_RULES, key_cols=["doc_id"])
    return res.violations().select(
        "doc_id", "path", "keyword", "expected", "actual", "message"
    )


def q_verdict_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    res = validate_dataframe(_docs(spark, sf_dir), DOC_RULES, key_cols=["doc_id"])
    # _n_viols() merges the compact-encoding array with any per-column
    # Arrow-fallback array, so this query stays correct even if DOC_RULES
    # ever routes a column to the Python rescue path (VERDICT r3 #7).
    return res.annotated.select(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("_jsp_valid"), 0).otherwise(1)).cast("long").alias("n_failed_rows"),
        F.sum(res._n_viols()).cast("long").alias("n_violations"),
    )


def q_stats_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _docs(spark, sf_dir).select(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("text").isNull(), 1).otherwise(0)).cast("long").alias("n_null_text"),
        F.min("n_chars").alias("min_n_chars"),
        F.max("n_chars").alias("max_n_chars"),
        F.round(F.avg("n_chars"), 6).alias("avg_n_chars"),
        F.countDistinct("lang").alias("n_langs"),
    )


def q_topk_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    return top_k(_docs(spark, sf_dir), "lang", 5)


def q_uniqueness_events_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return uniqueness_violations(ev, "user_id")


def q_referential_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet").filter(
        F.col("c_custkey") % 3 != 0
    )
    bad = referential_violations(orders, "o_custkey", customer, "c_custkey")
    return bad.select("o_orderkey", "o_custkey")


def _docs_with_clones(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = _docs(spark, sf_dir)
    clones = base.filter(F.col("doc_id") < 50).withColumn(
        "doc_id", F.col("doc_id") + 1000000
    )
    return base.unionByName(clones)


def q_exact_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    return exact_duplicate_groups(_docs_with_clones(spark, sf_dir), "doc_id").select(
        "content_key", "n_docs"
    )


def q_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _docs(spark, sf_dir).filter(F.col("doc_id") < 100)
    sig = minhash_signature(F.col("text"), num_hashes=2, k=3)
    return df.select(
        "doc_id",
        F.element_at(sig, 1).alias("mh0"),
        F.element_at(sig, 2).alias("mh1"),
    )


def q_minhash_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = _docs(spark, sf_dir).filter(F.col("doc_id") < 50)
    clones = base.withColumn("doc_id", F.col("doc_id") + 1000000)
    corpus = base.unionByName(clones)
    return minhash_near_duplicates(corpus, "doc_id", threshold=1.0).select(
        "id_a", "id_b", "jaccard"
    )


def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _docs(spark, sf_dir)
    return df.select(
        "doc_id",
        token_count(F.col("text")).cast("long").alias("ws_tokens"),
        bpe_token_count(F.col("text")).cast("long").alias("bpe_tokens"),
    )


def q_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jsonschemaparse_spark.functions.text import quality_features

    q = quality_features(_docs(spark, sf_dir))
    return q.select(
        "doc_id",
        F.col("n_tokens"),
        F.round("alpha_ratio", 4).alias("alpha_ratio"),
        F.round("punct_ratio", 4).alias("punct_ratio"),
        F.round("stopword_ratio", 4).alias("stopword_ratio"),
        F.round("quality_score", 4).alias("quality_score"),
    )


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return detect_language(_docs(spark, sf_dir)).select("doc_id", "lang_pred")


def q_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _docs(spark, sf_dir).select(
        "doc_id", fingerprint(F.col("text")).alias("fingerprint")
    )


def q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").first()["embedding"]
    top = brute_force_topk(emb, qvec, k=10)
    return top.select("vec_id", F.round("score", 4).alias("score"))


def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF path probed at n_probe == n_lists: provably identical to the
    exact top-k, so the brute-force SQL oracle verifies the whole IVF
    plumbing (k-means listing, probe selection, per-list scoring)."""
    from jsonschemaparse_spark.functions.similarity import ivf_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").first()["embedding"]
    top = ivf_topk(emb, qvec, k=10, n_lists=8, n_probe=8)
    return top.select("vec_id", F.round("score", 4).alias("score"))


def q_ann_ivf_partial(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF at PARTIAL probe (n_probe = n_lists/2) — the genuinely
    approximate shape. The seeded k-means listing is deterministic and
    parallelism-independent on the shipped corpus (snapshot-pinned in
    tests/test_round4_fixes.py), so the sf0.01 result is a fixed row set:
    oracle_sql ships it as a golden VALUES table (VERDICT r4 #2). Recall
    floors grade the approximation quality itself."""
    from jsonschemaparse_spark.functions.similarity import ivf_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").first()["embedding"]
    top = ivf_topk(emb, qvec, k=10, n_lists=8, n_probe=4)
    return top.select("vec_id", F.round("score", 4).alias("score"))


def q_embedding_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    base = emb.filter(F.col("vec_id") < 50)
    clones = base.withColumn("vec_id", F.col("vec_id") + 100000)
    corpus = base.unionByName(clones)
    from jsonschemaparse_spark.functions.similarity import embedding_near_duplicates

    pairs = embedding_near_duplicates(corpus, threshold=0.999, n_planes=8)
    return pairs.select("id_a", "id_b")


def q_lineitem_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


EVENT_PROPS_RULES = {
    "type": "object",
    "required": ["k"],
    "properties": {"k": {"type": "integer", "minimum": 0, "maximum": 50}},
}


def q_events_json_validation(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    res = validate_json_column(ev, "props", EVENT_PROPS_RULES, key_cols=["event_id"])
    return res.annotated.select("event_id", F.col("_jsp_valid").alias("valid"))


def q_json_positions_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positioned violation rows (r4): the reference's
    ValidationError.position surfaced at table scope. The events corpus is
    single-shape ('{"k": N}'), so the DuckDB oracle reproduces the anchor
    arithmetic exactly: property values anchor at their COLON (index 4),
    line 0."""
    from jsonschemaparse_spark.plans.json_validator import validate_json_positions

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = validate_json_positions(ev, "props", EVENT_PROPS_RULES, key_cols=["event_id"])
    return out.select("event_id", "path", "keyword", "expected", "actual",
                      "message", "line", F.col("column").alias("col"))


def _multiline_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic multi-line corpus for the line-level ops: the shipped
    documents are single-line, so each query builds the SAME text in Spark
    and in the DuckDB oracle (shared header, duplicated snippet lines,
    bullet/ellipsis tail, per-doc-id-mod footer)."""
    d = _docs(spark, sf_dir).filter(F.col("doc_id") < 300)
    t2 = F.concat(
        F.lit("SHARED HEADER LINE\n"),
        F.col("text"),
        F.lit("\n"), F.substring("text", 1, 30),
        F.lit("\n"), F.substring("text", 1, 30),
        F.lit("\n- item one\n- item two\nTrailing line...\nFOOTER "),
        (F.col("doc_id") % 3).cast("string"),
    )
    return d.select("doc_id", t2.alias("text"))


def q_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher quality rules (Rae et al. 2021 A1.1) over a constructed
    multi-line corpus — the FULL set including the top-2/3/4-gram char
    fractions (r5); every metric is reproduced arithmetically by the
    DuckDB oracle."""
    from jsonschemaparse_spark.functions.text import gopher_quality_full

    out = gopher_quality_full(_multiline_docs(spark, sf_dir))
    return out.select(
        "doc_id", "n_words", "mean_word_length", "symbol_word_ratio",
        "bullet_line_fraction", "ellipsis_line_fraction",
        "alpha_word_fraction", "duplicate_line_fraction",
        "duplicate_paragraph_fraction", "duplicate_line_char_fraction",
        "duplicate_paragraph_char_fraction", "gopher_keep",
        "top_2gram_char_fraction", "top_3gram_char_fraction",
        "top_4gram_char_fraction",
        "dup_5gram_char_fraction", "dup_6gram_char_fraction",
        "dup_7gram_char_fraction", "dup_8gram_char_fraction",
        "dup_9gram_char_fraction", "dup_10gram_char_fraction",
        "gopher_keep_full",
    )


def q_c4_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 cleaning signals (Raffel et al. 2020 §2.2) over the constructed
    multi-line corpus — sentence counts, code/lorem smells, terminal-punct
    line fraction, keep verdict; all SQL-reproducible. r5: exercises the
    bad-words policy hook with a tiny deterministic lexicon (one token
    entry that never fires + one phrase entry hitting doc_id%3==2)."""
    from jsonschemaparse_spark.functions.text import c4_quality_flags

    out = c4_quality_flags(_multiline_docs(spark, sf_dir),
                           badwords=["zzzunusedtoken", "footer 2"])
    return out.select(
        "doc_id", "n_sentences", "has_lorem_ipsum", "has_curly_brace",
        "terminal_punct_line_fraction", "has_bad_word", "c4_keep",
    )


def q_quality_fused(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r6: the FUSED cleaning gate (functions/text.quality_flags) — every
    Gopher A1.1 base metric, every C4 signal (+ badwords), both keeps and
    the combined quality_keep, all emitted from ONE projection over ONE
    scan (plan-asserted single-Project in tests/test_functions.py). The
    oracle is the gopher base CTE + the c4 expressions merged — values
    must be bit-identical to the unfused gates."""
    from jsonschemaparse_spark.functions.text import quality_flags

    out = quality_flags(_multiline_docs(spark, sf_dir),
                        badwords=["zzzunusedtoken", "footer 2"])
    return out.select(
        "doc_id", "n_words", "mean_word_length", "symbol_word_ratio",
        "bullet_line_fraction", "ellipsis_line_fraction",
        "alpha_word_fraction", "duplicate_line_fraction",
        "duplicate_paragraph_fraction", "duplicate_line_char_fraction",
        "duplicate_paragraph_char_fraction", "char_fraction_truncated",
        "gopher_keep", "n_sentences", "has_lorem_ipsum", "has_curly_brace",
        "terminal_punct_line_fraction", "has_bad_word", "c4_keep",
        "quality_keep",
    )


def q_cc_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r6: connected components (functions/graph.connected_components,
    iterative min-label propagation) over a deterministic edge list built
    from document ids — consecutive-id chains merged by long-range edges,
    so labels only come out right if transitive closure actually
    propagates across merged chains. Oracle: DuckDB recursive CTE
    computing each node's minimum reachable id."""
    from jsonschemaparse_spark.functions.graph import connected_components

    d = _docs(spark, sf_dir).filter(F.col("doc_id") < 60).select("doc_id")
    step = d.filter(F.col("doc_id") % 5 < 3).select(
        F.col("doc_id").alias("id_a"), (F.col("doc_id") + 1).alias("id_b"))
    cross = d.filter(F.col("doc_id") % 11 == 0).select(
        F.col("doc_id").alias("id_a"), (F.col("doc_id") + 7).alias("id_b"))
    edges = step.unionByName(cross)
    return connected_components(edges)


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r6: benchmark decontamination (functions/decontaminate — the
    GPT-3/Gopher 13-gram exact-overlap recipe). Eval set = the first 20
    normalized words of every doc_id%40==0 document; every training doc
    sharing a full 13-gram window with that set is flagged. Scale shape:
    eval n-gram set broadcast, corpus explode feeds a broadcast hash
    join, only matched ids shuffle. Oracle: DuckDB twin with the same
    tokenize/window expressions."""
    from jsonschemaparse_spark.functions.decontaminate import (
        contamination_flags,
        word_ngrams,
    )

    docs = _docs(spark, sf_dir)
    words = F.filter(
        F.split(F.regexp_replace(F.lower(F.trim("text")), r"\s+", " "), " "),
        lambda w: w != F.lit(""),
    )
    evalset = docs.where(F.col("doc_id") % 40 == 0).select(
        F.array_join(F.slice(words, 1, 20), " ").alias("text"))
    flagged = contamination_flags(docs, evalset, "doc_id", n=13)
    # stable, hashable projection: id + flag + the doc's own 13-gram count
    return flagged.select(
        "doc_id",
        F.col("contaminated"),
        F.size(word_ngrams(F.col("text"), 13)).cast("long").alias("n_ngrams"),
    )


def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r6: PII detection + redaction (functions/pii — the Dolma-style
    pre-training scrub). The shipped corpus carries no PII, so both
    engines synthesize the SAME PII-bearing text per doc (email + phone
    + IP + SSN woven around the real text), then count and redact it.
    One codegen Project over one scan (plan-asserted in tests/test_pii);
    oracle replays the identical patterns under RE2."""
    from jsonschemaparse_spark.functions.pii import pii_counts, redact_text

    d = _docs(spark, sf_dir)
    t = F.concat(
        F.lit("Contact user"), F.col("doc_id").cast("string"),
        F.lit("@example.com or +1 "),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit("-555-0199 from 10.2."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".7 id 123-45-6789. "),
        F.coalesce(F.col("text"), F.lit("")),
    )
    counts = pii_counts(t)
    return d.select(
        "doc_id",
        *[c.cast("long").alias(name) for name, c in counts.items()],
        redact_text(t).alias("redacted"),
    )


def q_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r6: deterministic stratified mixture sampling (functions/sampling
    — Pile/ROOTS per-language rates). Hash-keyed Bernoulli: the kept id
    set is a pure function of (doc_id, seed), invariant to partition
    layout and cluster width (tests/test_sampling pins the row-set
    invariance). Narrow Filter, zero shuffle; oracle replays the same
    md5 + hex-string threshold compare."""
    from jsonschemaparse_spark.functions.sampling import stratified_sample

    d = _docs(spark, sf_dir)
    out = stratified_sample(
        d, MIXTURE_FRACTIONS, "lang", "doc_id", seed=11,
        default_fraction=0.15)
    return out.select("doc_id", "lang", "source")


# per-language mixture rates for q_mixture_sample (en-heavy, zh held out
# to the default rate so the default path is exercised by the oracle)
MIXTURE_FRACTIONS = {"en": 0.9, "de": 0.5, "fr": 0.25, "es": 1.0}


def _sentence_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic sentence-structured corpus for the C4 span ops: the
    shipped documents carry no sentence punctuation, so build the SAME text
    in Spark and DuckDB — a 3-sentence intro shared by all docs, a unique
    per-doc body sentence, and a 3-sentence tail shared within doc_id%3."""
    d = _docs(spark, sf_dir).filter(F.col("doc_id") < 300)
    k = (F.col("doc_id") % 3).cast("string")
    t2 = F.concat(
        F.lit("Shared intro sentence. Common second point. Common third point."),
        F.lit(" Unique body "), F.col("doc_id").cast("string"),
        F.lit(" says something."),
        F.lit(" Tail variant "), k, F.lit(" one."),
        F.lit(" Tail variant "), k, F.lit(" two."),
        F.lit(" Tail variant "), k, F.lit(" three."),
    )
    return d.select("doc_id", t2.alias("text"))


def q_c4_span_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 three-sentence-span duplicate groups over the constructed corpus:
    the all-docs intro span plus one tail span per doc_id%3 variant."""
    from jsonschemaparse_spark.functions.dedup import duplicate_span_groups

    return duplicate_span_groups(_sentence_docs(spark, sf_dir), "doc_id")


def q_c4_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 span REMOVAL (keep-first): rebuilt text per doc after deleting
    every non-first occurrence of each duplicated 3-sentence span; the
    DuckDB oracle re-runs the whole algorithm (window rank + anti join +
    ordered string_agg), not a hand-derived expectation."""
    from jsonschemaparse_spark.functions.dedup import remove_duplicate_spans

    out = remove_duplicate_spans(_sentence_docs(spark, sf_dir), "doc_id")
    return out.select("doc_id", "text")


def q_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed cleaning funnel (functions/pipeline.clean_corpus_stats):
    exact dedup -> Gopher base gate -> C4 gate (+ badwords) over a corpus
    built to exercise every stage — multi-line body (dup-line metrics),
    a 3-sentence tail (C4 sentence rule), 50 exact clones, and a
    doc_id%3-keyed phrase the badwords lexicon hits."""
    from jsonschemaparse_spark.functions.pipeline import clean_corpus_stats

    d = _multiline_docs(spark, sf_dir)
    t2 = F.concat(
        F.col("text"),
        F.lit("\nFirst closing sentence. Second closing point. Third final line."),
    )
    base = d.select("doc_id", t2.alias("text"))
    clones = base.filter(F.col("doc_id") < 50).select(
        (F.col("doc_id") + 10_000).alias("doc_id"), "text")
    corpus = base.unionByName(clones)
    return clean_corpus_stats(corpus, badwords=["zzzunusedtoken", "footer 2"])


def q_duplicate_line_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document line dedup (boilerplate detection): lines appearing
    in >= 50 distinct docs of the constructed corpus."""
    from jsonschemaparse_spark.functions.dedup import duplicate_line_groups

    out = duplicate_line_groups(_multiline_docs(spark, sf_dir), "doc_id",
                                min_docs=50)
    return out.select("line", F.col("n_docs").cast("long").alias("n_docs"),
                      F.col("n_occurrences").cast("long").alias("n_occurrences"))


def q_canonical_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization over deterministic crawl-variant URLs: four
    variants per page id collapse to one canonical form."""
    from jsonschemaparse_spark.functions.web import canonical_url

    d = _docs(spark, sf_dir).filter(F.col("doc_id") < 200)
    page = (F.col("doc_id") / 4).cast("long").cast("string")
    url = (
        F.when(F.col("doc_id") % 4 == 0,
               F.concat(F.lit("HTTPS://Example.COM:443/p/"), page,
                        F.lit("?utm_source=x&id="), page, F.lit("#frag")))
        .when(F.col("doc_id") % 4 == 1,
              F.concat(F.lit("https://example.com/p/"), page,
                       F.lit("?id="), page))
        .when(F.col("doc_id") % 4 == 2,
              F.concat(F.lit("http://Site.org:80/q/"), page,
                       F.lit("?gclid=zz&x=1")))
        .otherwise(F.concat(F.lit("http://site.org/q/"), page, F.lit("?x=1")))
    )
    return d.select("doc_id", canonical_url(url).alias("canonical_url"))


def q_ks_drift_nchars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binned two-sample KS statistic; the bucket arithmetic in _bucket_expr is
    spelled out so the DuckDB oracle reproduces it bit-for-bit (the
    `drifted` p-value verdict stays in DriftResult, exercised by pytest —
    the incomplete-gamma/Kolmogorov tails aren't SQL)."""
    docs = _docs(spark, sf_dir)
    shifted = docs.withColumn("n_chars", F.col("n_chars") + 100)
    r = ks_drift(docs, shifted, "n_chars")
    return spark.createDataFrame(
        [(round(r.statistic, 6), r.n_left, r.n_right)],
        "statistic double, n_left long, n_right long",
    )


# per-sf snapshot paths so a run at one scale can never clobber the
# snapshot another scale's oracle is about to read (review r3 finding);
# oracle_sql() pins the sf0.01 path — the driver's correctness gate scale
WEBPAGES_ORACLE_PATH = "/tmp/jsp_oracle_webpages_sf{sf}"


def q_webpages_flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    sf = 0.01 if "0.01" in sf_dir else (0.1 if "0.1" in sf_dir else 0.001)
    n = int(50000 * sf / 0.01)
    pages = synthesize_webpages(spark, n)
    # materialize the synthesized input so the DuckDB oracle aggregates the
    # SAME rows (VERDICT r2 #2: flips the last rows-only row to hash-match);
    # html is dropped — it is unconstrained by WEBPAGE_RULES and its seeded
    # invalid-UTF-8 tails are exercised by the charset tests instead
    path = WEBPAGES_ORACLE_PATH.format(sf=sf)
    pages.drop("html").write.mode("overwrite").parquet(path)
    pages = spark.read.parquet(path)
    res = validate_dataframe(pages, WEBPAGE_RULES, key_cols=["url"])
    return res.annotated.select(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("_jsp_valid"), 0).otherwise(1)).cast("long").alias("n_failed_rows"),
        F.sum(F.size("_jsp_violations")).cast("long").alias("n_violations"),
    )


def q_simhash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _docs(spark, sf_dir).filter(F.col("doc_id") < 50)
    return simhash(df, "doc_id")


def q_salted_lang_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe two-stage aggregation must equal the plain groupBy."""
    from jsonschemaparse_spark.plans.skew import salted_group_count

    return salted_group_count(_docs(spark, sf_dir), "lang", buckets=8).select(
        "lang", F.col("cnt").cast("long").alias("cnt")
    )


def q_exact_dedup_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Surviving doc_ids after exact dedup of the cloned corpus."""
    from jsonschemaparse_spark.functions.dedup import exact_dedup

    return exact_dedup(_docs_with_clones(spark, sf_dir), "doc_id").select("doc_id")


def q_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jsonschemaparse_spark.functions.dedup import ngram_jaccard_pairs

    base = _docs(spark, sf_dir).filter(F.col("doc_id") < 30)
    clones = base.withColumn("doc_id", F.col("doc_id") + 1000000)
    return ngram_jaccard_pairs(base.unionByName(clones), "doc_id", threshold=0.5)


def q_events_json_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same contract as events_json_validation via the from_json fast path
    (zero Python) — same oracle SQL."""
    from jsonschemaparse_spark.plans import validate_json_typed

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    res = validate_json_typed(ev, "props", EVENT_PROPS_RULES, "struct<k:long>",
                              key_cols=["event_id"])
    return res.annotated.select("event_id", F.col("_jsp_valid").alias("valid"))


def q_chi2_drift_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square homogeneity statistic (en relabeled zz on the right side).
    Statistic verified against DuckDB; the p-value verdict stays in
    DriftResult (pytest-covered)."""
    from jsonschemaparse_spark.functions.integrity import chi2_drift

    docs = _docs(spark, sf_dir)
    skewed = docs.withColumn(
        "lang", F.when(F.col("lang") == "en", "zz").otherwise(F.col("lang"))
    )
    r = chi2_drift(docs, skewed, "lang")
    return spark.createDataFrame(
        [(round(r.statistic, 4), r.n_left, r.n_right)],
        "statistic double, n_left long, n_right long",
    )


MEDIA_N = 300  # fixed, sf-independent: dims are arithmetic in media_id


def q_media_resize_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real image-codec path end-to-end (VERDICT r2 #4): synthesize actual
    24-bit BMPs (dims arithmetic in media_id), aspect-preserving resize to
    a 16x16 box through decode->nn-resample->re-encode (pure numpy, Arrow
    batches), then read the dims back out of the RE-ENCODED BYTES.
    The oracle recomputes the expected dims from media_id arithmetic alone
    (double-precision scale math matches IEEE-for-IEEE), so a hash-match
    proves the bytes really were resized."""
    from jsonschemaparse_spark.multimodal import (
        decoded_dims,
        resize_images,
        synthesize_bmp_media,
    )

    media = synthesize_bmp_media(spark, MEDIA_N)
    resized = resize_images(media, max_w=16, max_h=16, use_codec=True)
    return decoded_dims(resized)


def q_audio_resample_ms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio twin of media_resize_dims: real PCM16 WAVs decoded, resampled
    16k->8k, re-encoded; durations read back from the re-encoded bytes.
    Oracle is pure arithmetic: out_ms = (media_id % 50 + 1) * 10."""
    from jsonschemaparse_spark.multimodal import (
        decoded_duration_ms,
        resample_audio,
        synthesize_wav_media,
    )

    media = synthesize_wav_media(spark, MEDIA_N)
    return decoded_duration_ms(resample_audio(media, target_rate=8000))


def q_bucketed_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exchange-free exact-dup groups over a bucketed layout (the 100-TB
    shuffle-elimination design, plans/bucketing.py): 1000 synthetic docs
    bucketed by content_key (id % 100) at write time; the groupBy then
    aggregates without any Exchange (plan-asserted in tests/test_bucketing).
    Oracle recomputes the groups arithmetically."""
    from jsonschemaparse_spark.plans.bucketing import (
        bucketed_exact_duplicate_groups,
        write_bucketed,
    )

    docs = spark.range(0, 1000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 100).cast("string").alias("content_key"),
    )
    write_bucketed(docs, "jsp_oracle_docs_bucketed", "content_key", 4)
    out = bucketed_exact_duplicate_groups(
        spark, "jsp_oracle_docs_bucketed", "doc_id")
    return out.select("content_key", F.col("n_docs").cast("long").alias("n_docs"),
                      F.col("keep_id").cast("long").alias("keep_id"))


def _crawl_url(id_col: Column) -> Column:
    """Deterministic crawl-style URLs over a handful of registered
    domains (incl. co.uk two-level-suffix cases and multi-host domains)
    — shared by the domain_stats and latest_capture queries."""
    host = (
        F.when(id_col % 6 == 0, F.lit("www.example.co.uk"))
        .when(id_col % 6 == 1, F.lit("news.example.co.uk"))
        .when(id_col % 6 == 2,
              F.concat(F.lit("a"), (id_col % 10).cast("string"), F.lit(".shop.com")))
        .when(id_col % 6 == 3, F.lit("blog.site.org"))
        .when(id_col % 6 == 4, F.lit("site.org"))
        .otherwise(
            F.concat(F.lit("cdn"), (id_col % 7).cast("string"), F.lit(".media.net")))
    )
    return F.concat(F.lit("https://"), host, F.lit("/p/"),
                    (id_col % 500).cast("string"))


def _crawl_url_sql(id_expr: str) -> str:
    """DuckDB twin of _crawl_url (same modulus arithmetic, same hosts)."""
    return f"""('https://' || (CASE CAST({id_expr} % 6 AS INTEGER)
  WHEN 0 THEN 'www.example.co.uk'
  WHEN 1 THEN 'news.example.co.uk'
  WHEN 2 THEN 'a' || CAST({id_expr} % 10 AS VARCHAR) || '.shop.com'
  WHEN 3 THEN 'blog.site.org'
  WHEN 4 THEN 'site.org'
  ELSE 'cdn' || CAST({id_expr} % 7 AS VARCHAR) || '.media.net' END)
 || '/p/' || CAST({id_expr} % 500 AS VARCHAR))"""


def q_domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-registered-domain corpus profile over deterministic crawl
    URLs: doc counts, distinct hosts, total chars."""
    from jsonschemaparse_spark.functions.web import domain_stats

    d = _docs(spark, sf_dir).withColumn("url", _crawl_url(F.col("doc_id")))
    out = domain_stats(d, size_col="n_chars")
    return out.select("domain", F.col("n_docs").cast("long").alias("n_docs"),
                      F.col("n_hosts").cast("long").alias("n_hosts"),
                      F.col("total_size").cast("long").alias("total_size"))


def q_latest_capture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-crawl dedup: keep the newest capture per URL (ties on ts break
    by event_id). One struct-max hash aggregate, no window, no join-back."""
    from jsonschemaparse_spark.functions.web import latest_capture

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    caps = ev.select(_crawl_url(F.col("event_id")).alias("url"),
                     "ts", "event_id", "event_type")
    out = latest_capture(caps, url_col="url", ts_col="ts", id_col="event_id")
    return out.select("url", "ts", "event_id", "event_type")


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-export sequence packing: global token offsets via the
    two-stage block prefix sum (no single-partition window), chunked
    into 128-token sequences."""
    from jsonschemaparse_spark.functions.packing import pack_sequences
    from jsonschemaparse_spark.functions.text import token_count

    d = _docs(spark, sf_dir).select(
        "doc_id", token_count(F.col("text")).alias("n_tokens"))
    out = pack_sequences(d, "doc_id", "n_tokens", seq_len=128, n_blocks=16)
    return out.select("doc_id", F.col("n_tokens").cast("long").alias("n_tokens"),
                      "start_token", "seq_first", "seq_last")


def q_incremental_new_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental snapshot dedup: the doc_id%3 "new crawl batch" against
    the doc_id%2 "prior snapshot". Bloom-routed, exact anti-join result
    (functions/snapshot.py) — the oracle is the plain NOT EXISTS twin."""
    from jsonschemaparse_spark.functions.snapshot import incremental_dedup

    docs = _docs(spark, sf_dir)
    seen = docs.filter(F.col("doc_id") % 2 == 0)
    new = docs.filter(F.col("doc_id") % 3 == 0)
    out = incremental_dedup(new, seen)
    return out.select("doc_id", "lang")


def q_suggest_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style constraint suggestion over documents: one profiling
    aggregation -> (column, keyword, value) rows (functions/suggest.py).
    The DuckDB twin recomputes every data-dependent row with the same
    emission conditions (HAVING twins the engine's guards)."""
    from jsonschemaparse_spark.functions.suggest import suggest_constraints

    return suggest_constraints(_docs(spark, sf_dir))


def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-window chunking for training/RAG export: 32-token windows,
    8-token overlap (functions/chunking.py) — trailing windows emitted
    only when they carry uncovered tokens."""
    from jsonschemaparse_spark.functions.chunking import chunk_documents

    return chunk_documents(_docs(spark, sf_dir), "doc_id",
                           chunk_tokens=32, overlap=8)


def q_vocabulary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary (tokenizer-training prerequisite): top-200
    tokens by frequency, deterministic tie-break (n desc, token asc)."""
    from jsonschemaparse_spark.functions.text import vocabulary

    return vocabulary(_docs(spark, sf_dir), size=200)


def q_semantic_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup candidate generation with an injected cluster column:
    within-cluster exact-cosine pairs >= 0.98 (the kmeans path is pinned
    by pytest + the deterministic IVF snapshot; the oracle reproduces
    the injectable-cluster plumbing exactly)."""
    from jsonschemaparse_spark.functions.similarity import (
        semantic_duplicate_pairs,
    )

    base = spark.read.parquet(f"{sf_dir}/embeddings.parquet") \
        .filter(F.col("vec_id") < 300)
    # duplicates = cloned vectors (cosine exactly 1.0 in both engines);
    # the natural within-label pairs top out at cosine 0.41, so every
    # emitted pair is a clone pair found THROUGH the cluster structure
    emb = base.unionByName(
        base.withColumn("vec_id", F.col("vec_id") + 100000))
    out = semantic_duplicate_pairs(emb, threshold=0.98, cluster_col="label")
    return out.select(F.col("cluster").cast("long").alias("cluster"),
                      "id_a", "id_b")


def q_domain_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain cap (RefinedWeb recipe): at most 25 docs per registered
    domain, chosen by deterministic md5 rank over doc_id."""
    from jsonschemaparse_spark.functions.web import cap_per_domain

    d = _docs(spark, sf_dir).withColumn("url", _crawl_url(F.col("doc_id")))
    out = cap_per_domain(d, max_docs=25, key_col="doc_id", seed=7)
    return out.select("doc_id")


def q_classifier_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed linear quality classifier (fastText-style plumbing with the
    deterministic stand-in weights): per-doc mean token weight + keep."""
    from jsonschemaparse_spark.functions.classifier import classify_quality

    out = classify_quality(_docs(spark, sf_dir), threshold=0.01)
    return out.select("doc_id",
                      F.round("quality_score", 6).alias("quality_score"),
                      "classifier_keep")


def q_normalize_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode canonicalization (functions/normalize.py): NFC + newline/
    NBSP/control cleanup. The corpus text is ASCII at test SF, so the
    query appends deterministic suffixes per doc_id residue (decomposed
    accent / CRLF+NBSP / control bytes) to exercise every step; the
    oracle twins NFC via DuckDB's nfc_normalize (character-identical to
    unicodedata, pinned in tests/test_normalize.py)."""
    from jsonschemaparse_spark.functions.normalize import normalize_text

    d = _docs(spark, sf_dir)
    raw = F.concat(
        F.coalesce(F.col("text"), F.lit("")),
        F.when(F.col("doc_id") % 3 == 0, F.lit(" Cafe\u0301"))
         .when(F.col("doc_id") % 3 == 1, F.lit("\r\nline\u00a0x"))
         .otherwise(F.lit("\x07bell\x7f")))
    out = normalize_text(d.select("doc_id", raw.alias("text")))
    return out.select("doc_id", F.col("text").alias("text_norm"))


def q_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring dedup (Lee et al. 2022 ExactSubstr, windowed):
    every non-first occurrence of a duplicated 8-token window is deleted;
    touched docs are rebuilt as the kept token stream, untouched docs
    pass through byte-identical (functions/dedup.py)."""
    from jsonschemaparse_spark.functions.dedup import (
        remove_duplicate_substrings,
    )

    out = remove_duplicate_substrings(_docs(spark, sf_dir), "doc_id",
                                      min_tokens=8, out_col="text_dedup")
    return out.select("doc_id", "text_dedup")


def q_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Victim-interval inspection view for exact substring dedup: merged
    half-open token intervals per doc (in-plan aggregate interval merge,
    no Python)."""
    from jsonschemaparse_spark.functions.dedup import (
        duplicate_substring_spans,
    )

    return duplicate_substring_spans(_docs(spark, sf_dir), "doc_id",
                                     min_tokens=8)


def q_within_doc_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITHIN-document duplicate-line removal (RefinedWeb in-doc rule):
    keep-first verbatim, trim-keyed, blanks never keyed. The corpus has
    no in-doc repeats at test SF, so the query appends a deterministic
    repeated-line block (same concat in the oracle)."""
    from jsonschemaparse_spark.functions.dedup import dedupe_lines_within_doc

    d = _docs(spark, sf_dir)
    t = F.concat_ws(
        "\n", F.col("text"), F.lit("Share this post"),
        F.concat(F.lit("Unique middle "), F.col("doc_id").cast("string")),
        F.lit("  Share this post  "), F.lit("Tail line"))
    out = dedupe_lines_within_doc(
        d.select("doc_id", t.alias("text")), "doc_id", out_col="text_clean")
    return out.select("doc_id", "text_clean")


def q_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style bigram-LM perplexity: train on the corpus, score each
    doc (mean -log2 P(w2|w1), add-0.5 smoothing). Scores rounded so
    engine log/ulp differences cannot flip the value hash
    (functions/lm.py)."""
    from jsonschemaparse_spark.functions.lm import (
        lm_perplexity,
        train_bigram_lm,
    )

    d = _docs(spark, sf_dir)
    lm = train_bigram_lm(d, id_col="doc_id")
    out = lm_perplexity(d, lm, "doc_id")
    return out.select("doc_id", "n_bigrams",
                      F.round("log2_ppl", 6).alias("log2_ppl"))


def q_lm_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet head/middle/tail stratification over the LM scores with
    FIXED cut points (the production thresholds= path — CCNet computes
    cut points once on a sample, every shard applies constants; the
    in-call percentile_approx path is approx-by-design and pinned in
    pytest instead)."""
    from jsonschemaparse_spark.functions.lm import (
        lm_buckets,
        lm_perplexity,
        train_bigram_lm,
    )

    d = _docs(spark, sf_dir)
    lm = train_bigram_lm(d, id_col="doc_id")
    scored = lm_perplexity(d, lm, "doc_id")
    out = lm_buckets(scored, thresholds=[7.0, 8.0])
    return out.select("doc_id", F.col("lm_bucket").cast("int").alias("lm_bucket"))


def q_quantized_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQ8 embedding quantization: per-dim affine int8 codes from global
    min/span stats (one aggregate pass, pure-projection encode). EXACT
    integer oracle — IEEE +,-,*,/ are exactly rounded so both engines
    compute bit-identical doubles, and round-half-away-from-zero matches
    (functions/similarity.py)."""
    from jsonschemaparse_spark.functions.similarity import (
        embedding_dim_stats,
        quantize_embeddings,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet") \
        .select("vec_id", "embedding")
    stats = embedding_dim_stats(emb)
    return quantize_embeddings(emb, stats).select(
        "vec_id", F.col("qvec").cast("array<int>").alias("qvec"))


def q_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(lang, source) corpus quality report: gate pass rates + size
    stats from one fused-gate scan (functions/text.py quality_report).
    Integer-derived aggregates only, so the twin is exact."""
    from jsonschemaparse_spark.functions.text import quality_report

    return quality_report(_docs(spark, sf_dir))


def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-iteration PageRank (functions/graph.py) over a
    deterministic link graph derived from documents (each doc links to
    (id*7+3)%500 and to its id%10 hub). 8 power-iteration rounds from
    the uniform start; the twin unrolls the same rounds as chained
    CTEs; 6dp rounding absorbs reduction-order ulps."""
    from jsonschemaparse_spark.functions.graph import pagerank

    d = _docs(spark, sf_dir).filter(F.col("doc_id") < 500)
    edges = d.select(
        F.col("doc_id").alias("src"),
        ((F.col("doc_id") * 7 + 3) % 500).alias("dst"),
    ).unionByName(d.select(
        F.col("doc_id").alias("src"),
        (F.col("doc_id") % 10).alias("dst"),
    ))
    pr = pagerank(edges, n_iters=8)
    return pr.select("node", F.round("rank", 6).alias("rank"))


def q_script_fractions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Script-mix fractions over a constructed mixed-script corpus (the
    shipped docs are ASCII): vowels transliterated to Cyrillic for
    doc_id%3==1 and to CJK for %3==2 via translate() — identical
    single-char codepoint mapping on both engines."""
    from jsonschemaparse_spark.functions.text import script_fractions

    d = _docs(spark, sf_dir).filter(F.col("doc_id") < 300)
    mixed = d.withColumn(
        "text",
        F.when(F.col("doc_id") % 3 == 1,
               F.translate(F.col("text"), "aeiou", "аеіоу"))
        .when(F.col("doc_id") % 3 == 2,
              F.translate(F.col("text"), "aeiou", "一二三四五"))
        .otherwise(F.col("text")),
    )
    out = script_fractions(mixed)
    return out.select("doc_id", "latin_frac", "cyrillic_frac",
                      "cjk_frac", "arabic_frac", "digit_frac")


def q_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-width histogram over n_chars (stats.value_histogram): the
    KS-drift bucket formula reused as a user-facing table, zero-count
    bins included via the bin spine."""
    from jsonschemaparse_spark.functions.stats import value_histogram

    return value_histogram(_docs(spark, sf_dir), "n_chars", n_bins=32)


def q_keep_rate_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-lang gate pass-rate drift between two corpus versions
    (integrity.keep_rate_drift): old = n_chars >= 300, new = every
    third doc removed and a tighter n_chars >= 350 gate — deterministic
    rate shifts per lang; 2x2 chi2 vs the constant alpha=0.01 cut, all
    arithmetic exact-integer-derived so the twin matches bit-for-bit."""
    from jsonschemaparse_spark.functions.integrity import keep_rate_drift

    d = _docs(spark, sf_dir)
    old = d.withColumn("keep", F.col("n_chars") >= 300)
    new = d.filter(F.col("doc_id") % 3 != 0).withColumn(
        "keep", F.col("n_chars") >= 350)
    return keep_rate_drift(old, new, "keep", ("lang",))


def _paragraph_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic paragraph corpus (the shipped documents are
    single-line): shared intro (hot in every doc), the unique body, a
    25-char body prefix (collides across docs only when prefixes
    genuinely repeat — the twin computes the same), and one of two
    footers (each hot in ~half the docs)."""
    d = _docs(spark, sf_dir).filter(F.col("doc_id") < 300)
    t = F.concat(
        F.lit("shared intro paragraph\n\n"),
        F.col("text"),
        F.lit("\n\n"), F.substring("text", 1, 25),
        F.lit("\n\n"),
        F.when(F.col("doc_id") % 2 == 0, F.lit("footer alpha"))
        .otherwise(F.lit("footer beta")),
    )
    return d.select("doc_id", t.alias("text"))


def q_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-unit cross-doc dedup: strip paragraphs appearing in >= 2
    distinct docs, canonical '\\n\\n' rebuild (functions/dedup.py
    strip_duplicate_paragraphs)."""
    from jsonschemaparse_spark.functions.dedup import (
        strip_duplicate_paragraphs,
    )

    return strip_duplicate_paragraphs(
        _paragraph_docs(spark, sf_dir), "doc_id").select("doc_id", "text")


def q_ngram_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric shingle containment (quote/partial-copy detection):
    clone fragments of real docs so small-in-big pairs exist, then find
    every pair where either direction >= 0.9. Same shingle-keyed
    co-occurrence core as the Jaccard tier."""
    from jsonschemaparse_spark.functions.dedup import ngram_containment_pairs

    d = _docs(spark, sf_dir).filter(F.col("doc_id") < 200)
    frags = (
        d.filter(F.col("doc_id") < 40)
        .select((F.col("doc_id") + 100000).alias("doc_id"),
                F.array_join(F.slice(F.split(F.col("text"), r"\s+"), 1, 12),
                             " ").alias("text"))
    )
    corpus = d.select("doc_id", "text").unionByName(frags)
    return ngram_containment_pairs(corpus, "doc_id", threshold=0.9)


def q_group_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-lang inspection sample: 3 docs per lang by
    md5(doc_id:0) hash order — the same rows on every run/layout."""
    from jsonschemaparse_spark.functions.sampling import group_samples

    return group_samples(_docs(spark, sf_dir), "lang", "doc_id", k=3) \
        .select("lang", "sample_rank", "doc_id")


def q_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-weighted mixture sample (alpha=0.5, the T5 recipe):
    rates n_s^0.5-proportional from one group-count job, applied as the
    deterministic hash filter. The twin re-derives the rates in SQL —
    exact because every step (integer counts, sqrt, sorted-order fold,
    mul/div/min/trunc) is bit-identical across engines at alpha=0.5
    (functions/sampling.py temperature_rates)."""
    from jsonschemaparse_spark.functions.sampling import temperature_mixture

    d = _docs(spark, sf_dir)
    return temperature_mixture(
        d, "lang", "doc_id", alpha=0.5, target_fraction=0.35,
    ).select("doc_id", "lang")


def q_index_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional inverted index (functions/index.py): postings row for
    one term — (doc, positions, n). Build is one tokenize pass with the
    token array generator-bound; positions are array_sort-pinned so the
    index is parallelism-independent."""
    from jsonschemaparse_spark.functions.index import (
        build_inverted_index,
        search_term,
    )

    idx = build_inverted_index(_docs(spark, sf_dir))
    return search_term(idx, "customer").select(
        "doc", F.col("positions").cast("array<int>").alias("positions"),
        F.col("n").cast("int").alias("n"))


def q_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-phrase positional merge over the inverted index: anchor on
    the first term, shift-intersect each later term's positions —
    per-doc arrays, pure codegen, no text rescan."""
    from jsonschemaparse_spark.functions.index import (
        build_inverted_index,
        search_phrase,
    )

    idx = build_inverted_index(_docs(spark, sf_dir))
    return search_phrase(idx, "fast key")


def q_doc_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc top-3 TF-IDF keywords (functions/tfidf.py): one token
    explode feeds both the (doc, token) counts and the vocab-bounded df
    table (broadcast back); sklearn smooth idf; 6dp rounding = the
    oracle-exact boundary for the single ln(). Deterministic tie-break
    (tfidf desc, token asc) on both engines."""
    from jsonschemaparse_spark.functions.tfidf import top_keywords

    return top_keywords(_docs(spark, sf_dir), k=3, min_df=2)


def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer training (functions/tokenizer.py): one word_counts
    corpus scan + the driver-side indexed merge loop. Exact integer
    counts + deterministic tie-breaks make the merge table a fixed,
    parallelism-independent artifact of the corpus (pinned local[8] ==
    local[32] in tests/test_tokenizer.py), so the oracle ships it as a
    golden VALUES table — the ann_ivf_partial convention (training is
    iterative, not SQL-expressible)."""
    from jsonschemaparse_spark.functions.tokenizer import train_bpe

    m = train_bpe(_docs(spark, sf_dir), n_merges=40, min_count=2)
    return m.merges_df(spark).select(
        "rank",
        F.col("left").alias("left_sym"),
        F.col("right").alias("right_sym"),
    )


def q_bpe_tokens_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """bpe_encode over a pinned doc subset with the sf-trained model:
    (doc_id, bpe_text, n_bpe). Encoding is a pure zero-shuffle map
    (plan-pinned in tests); the golden rows double as a decode check —
    replace('</w>', ' ') of bpe_text round-trips the normalized text
    (pinned corpus-wide in tests/test_tokenizer.py)."""
    from jsonschemaparse_spark.functions.tokenizer import bpe_encode, train_bpe

    d = _docs(spark, sf_dir)
    m = train_bpe(d, n_merges=40, min_count=2)
    enc = bpe_encode(d.filter(F.col("doc_id") < 8), m)
    return enc.select(
        "doc_id",
        F.concat_ws(" ", "bpe_tokens").alias("bpe_text"),
        F.size("bpe_tokens").alias("n_bpe"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "validate_documents": q_validate_documents,
        "verdict_documents": q_verdict_documents,
        "stats_documents": q_stats_documents,
        "topk_lang": q_topk_lang,
        "uniqueness_events_user": q_uniqueness_events_user,
        "referential_orphans": q_referential_orphans,
        "exact_dup_groups": q_exact_dup_groups,
        "minhash_signatures": q_minhash_signatures,
        "minhash_dup_pairs": q_minhash_dup_pairs,
        "token_stats": q_token_stats,
        "quality": q_quality,
        "lang_id": q_lang_id,
        "fingerprints": q_fingerprints,
        "ann_topk": q_ann_topk,
        "ann_ivf_topk": q_ann_ivf_topk,
        "ann_ivf_partial": q_ann_ivf_partial,
        "embedding_dup_pairs": q_embedding_dup_pairs,
        "lineitem_pricing": q_lineitem_pricing,
        "events_json_validation": q_events_json_validation,
        "json_positions_events": q_json_positions_events,
        "gopher_quality": q_gopher_quality,
        "duplicate_line_groups": q_duplicate_line_groups,
        "c4_span_groups": q_c4_span_groups,
        "clean_corpus": q_clean_corpus,
        "c4_span_dedup": q_c4_span_dedup,
        "c4_quality": q_c4_quality,
        "quality_fused": q_quality_fused,
        "cc_labels": q_cc_labels,
        "decontaminate": q_decontaminate,
        "pii_scrub": q_pii_scrub,
        "mixture_sample": q_mixture_sample,
        "canonical_urls": q_canonical_urls,
        "ks_drift_nchars": q_ks_drift_nchars,
        "webpages_flagship": q_webpages_flagship,
        "simhash_sample": q_simhash_sample,
        "salted_lang_counts": q_salted_lang_counts,
        "exact_dedup_keep": q_exact_dedup_keep,
        "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
        "events_json_typed": q_events_json_typed,
        "chi2_drift_lang": q_chi2_drift_lang,
        "media_resize_dims": q_media_resize_dims,
        "audio_resample_ms": q_audio_resample_ms,
        "bucketed_dup_groups": q_bucketed_dup_groups,
        "domain_stats": q_domain_stats,
        "latest_capture": q_latest_capture,
        "classifier_scores": q_classifier_scores,
        "pack_sequences": q_pack_sequences,
        "domain_capped": q_domain_capped,
        "semantic_dup_pairs": q_semantic_dup_pairs,
        "incremental_new_docs": q_incremental_new_docs,
        "suggest_constraints": q_suggest_constraints,
        "chunk_documents": q_chunk_documents,
        "vocabulary": q_vocabulary,
        "normalize_text": q_normalize_text,
        "substring_dedup": q_substring_dedup,
        "substring_spans": q_substring_spans,
        "within_doc_line_dedup": q_within_doc_line_dedup,
        "lm_perplexity": q_lm_perplexity,
        "lm_buckets": q_lm_buckets,
        "quantized_embeddings": q_quantized_embeddings,
        "quality_report": q_quality_report,
        "bpe_merges": q_bpe_merges,
        "bpe_tokens_sample": q_bpe_tokens_sample,
        "doc_keywords": q_doc_keywords,
        "index_postings": q_index_postings,
        "phrase_search": q_phrase_search,
        "temperature_mixture": q_temperature_mixture,
        "ngram_containment": q_ngram_containment,
        "group_samples": q_group_samples,
        "paragraph_dedup": q_paragraph_dedup,
        "keep_rate_drift": q_keep_rate_drift,
        "value_histogram": q_value_histogram,
        "script_fractions": q_script_fractions,
        "pagerank": q_pagerank,
    }


# ---------------------------------------------------------------------------
# oracle SQL (DuckDB dialect, same table names, same column aliases)
# ---------------------------------------------------------------------------
_ENUM_EXPECTED = __import__("json").dumps(LANGS)  # kernels stringify expected via _show/json.dumps — keep in sync

_NORM = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"
_WORDS = f"string_split({_NORM}, ' ')"
_SHINGLES = (
    f"list_distinct(CASE WHEN len({_WORDS}) >= 3 THEN "
    f"list_transform(generate_series(1, len({_WORDS}) - 2), "
    f"i -> concat_ws(' ', {_WORDS}[i], {_WORDS}[i+1], {_WORDS}[i+2])) "
    f"ELSE [array_to_string({_WORDS}, ' ')] END)"
)


def _mh(perm: int) -> str:
    from jsonschemaparse_spark.functions.dedup import MINHASH_P, _MINHASH_A, _MINHASH_B

    a, b, p = _MINHASH_A[perm], _MINHASH_B[perm], MINHASH_P
    h = f"(('0x' || substr(md5(s), 1, 12))::BIGINT % {p})"
    return f"list_min(list_transform({_SHINGLES}, s -> ({a} * {h} + {b}) % {p}))"


_STOP_EN = r"\b(" + "|".join(STOPWORDS["en"]) + r")\b"


def _lang_score(lang: str) -> str:
    pat = r"\b(" + "|".join(STOPWORDS[lang]) + r")\b"
    return f"len(regexp_extract_all(lower(text), '{pat}'))"


def oracle_sql() -> dict[str, str]:
    # pii_scrub / mixture_sample twins are BUILT from the engine's own
    # pattern/threshold constants so oracle and engine cannot drift
    from jsonschemaparse_spark.functions.classifier import classifier_weight_sql
    from jsonschemaparse_spark.functions.pii import pii_oracle_sql
    from jsonschemaparse_spark.functions.sampling import threshold_hex
    from jsonschemaparse_spark.functions.web import DOMAIN_RE as _WEB_DOMAIN_RE
    from jsonschemaparse_spark.functions.web import HOST_RE as _WEB_HOST_RE

    pii_counts_sql, pii_redacted_sql = pii_oracle_sql("t")
    # script fractions: the twin's char classes come from the ENGINE's
    # SCRIPT_RANGES constants (bracket ranges with literal codepoint
    # endpoints parse identically under Java regex and RE2)
    from jsonschemaparse_spark.functions.text import SCRIPT_RANGES as _SR

    _script_frac_cols = ",\n".join(
        f"  round(CASE WHEN total > 0 THEN len(regexp_extract_all(text, "
        f"'{pat}')) * 1.0 / total ELSE 0.0 END, 6) AS {name}_frac"
        for name, pat in _SR.items())
    # pagerank: 8 unrolled power-iteration CTE rounds (a recursive CTE
    # cannot aggregate in its recursive member); arithmetic written in
    # the ENGINE's exact op order — note (1.0 - 0.85), not 0.15: the
    # engine computes base from Python's 1.0-d, which is
    # 0.15000000000000002 in IEEE
    _pr_iters, _pr_d = 8, "0.85"
    _pr_parts = [
        """edges AS (
  SELECT doc_id AS src, (doc_id * 7 + 3) % 500 AS dst
  FROM documents WHERE doc_id < 500
  UNION ALL
  SELECT doc_id, doc_id % 10 FROM documents WHERE doc_id < 500
),
nodes AS (
  SELECT DISTINCT node FROM (
    SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges)
),
nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
outdeg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
r0 AS (SELECT node, (SELECT 1.0 / n FROM nn) AS rank FROM nodes)"""]
    for _k in range(1, _pr_iters + 1):
        _pr_parts.append(f"""d{_k} AS (
  SELECT coalesce(sum(rank), 0.0) AS m FROM r{_k - 1}
  WHERE node NOT IN (SELECT src FROM outdeg)
),
c{_k} AS (
  SELECT e.dst AS node, sum(r.rank / o.deg) AS s
  FROM edges e JOIN outdeg o ON e.src = o.src
  JOIN r{_k - 1} r ON r.node = e.src
  GROUP BY e.dst
),
r{_k} AS (
  SELECT n.node,
         (((1.0 - {_pr_d}) / nn.n) + (({_pr_d} * d{_k}.m) / nn.n))
         + {_pr_d} * coalesce(c.s, 0.0) AS rank
  FROM nodes n LEFT JOIN c{_k} c ON n.node = c.node, nn, d{_k}
)""")
    _pagerank_sql = ("WITH " + ",\n".join(_pr_parts)
                     + f"\nSELECT node, round(rank, 6) AS rank FROM r{_pr_iters}\n")

    _script_fractions_sql = (
        "\nWITH m AS (\n"
        "  SELECT doc_id,\n"
        "         CASE WHEN doc_id % 3 = 1 THEN translate(text, 'aeiou', 'аеіоу')\n"
        "              WHEN doc_id % 3 = 2 THEN translate(text, 'aeiou', '一二三四五')\n"
        "              ELSE text END AS text\n"
        "  FROM documents WHERE doc_id < 300\n"
        "),\n"
        "t AS (\n"
        "  SELECT doc_id, text,\n"
        "         length(regexp_replace(text, '\\s+', '', 'g')) AS total\n"
        "  FROM m\n"
        ")\n"
        "SELECT doc_id,\n" + _script_frac_cols + "\nFROM t\n")
    mix_case = " ".join(
        f"WHEN '{lang}' THEN '{threshold_hex(frac) or 'ffffffff~'}'"
        for lang, frac in sorted(MIXTURE_FRACTIONS.items()))
    viol = f"""
WITH v AS (
  SELECT doc_id, '/text' AS path, 'minLength' AS keyword, '1' AS expected,
         CAST(length(text) AS VARCHAR) AS actual, 'String too short' AS message
    FROM documents WHERE text IS NOT NULL AND length(text) < 1
  UNION ALL
  SELECT doc_id, '/text', 'maxLength', '10000', CAST(length(text) AS VARCHAR),
         'String too long'
    FROM documents WHERE text IS NOT NULL AND length(text) > 10000
  UNION ALL
  SELECT doc_id, '/lang', 'enum', '{_ENUM_EXPECTED.replace("'", "''")}',
         CAST(lang AS VARCHAR),
         'String does not match one of the enumerated values'
    FROM documents WHERE lang IS NOT NULL AND lang NOT IN ({", ".join("'" + l + "'" for l in LANGS)})
  UNION ALL
  SELECT doc_id, '/source', 'pattern', '"^src"', CAST(source AS VARCHAR),
         'String does not match /^src/'
    FROM documents WHERE source IS NOT NULL AND NOT regexp_matches(source, '^src')
  UNION ALL
  SELECT doc_id, '/doc_id', 'minimum', '0', CAST(doc_id AS VARCHAR),
         'Number under/equal to minimum'
    FROM documents WHERE doc_id IS NOT NULL AND doc_id < 0
  UNION ALL
  SELECT doc_id, '/n_chars', 'minimum', '0', CAST(n_chars AS VARCHAR),
         'Number under/equal to minimum'
    FROM documents WHERE n_chars IS NOT NULL AND n_chars < 0
  UNION ALL
  SELECT doc_id, '/n_chars', 'maximum', '500', CAST(n_chars AS VARCHAR),
         'Number under/equal to maximum'
    FROM documents WHERE n_chars IS NOT NULL AND n_chars > 500
  UNION ALL
  SELECT doc_id, '', 'required', '0',
         CAST((CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END)
            + (CASE WHEN text IS NULL THEN 1 ELSE 0 END)
            + (CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS VARCHAR),
         'Required property missing'
    FROM documents WHERE doc_id IS NULL OR text IS NULL OR lang IS NULL
  UNION ALL
  SELECT doc_id, '', 'required',
         '[' || concat_ws(', ',
           CASE WHEN doc_id IS NULL THEN '"doc_id"' END,
           CASE WHEN text IS NULL THEN '"text"' END,
           CASE WHEN lang IS NULL THEN '"lang"' END) || ']',
         NULL, 'Required properties missing'
    FROM documents WHERE doc_id IS NULL OR text IS NULL OR lang IS NULL
)
SELECT * FROM v
"""
    verdict = """
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN bad > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_failed_rows,
       CAST(sum(bad) AS BIGINT) AS n_violations
FROM (
  SELECT (CASE WHEN text IS NOT NULL AND length(text) < 1 THEN 1 ELSE 0 END)
       + (CASE WHEN text IS NOT NULL AND length(text) > 10000 THEN 1 ELSE 0 END)
       + (CASE WHEN lang IS NOT NULL AND lang NOT IN ({langs}) THEN 1 ELSE 0 END)
       + (CASE WHEN source IS NOT NULL AND NOT regexp_matches(source, '^src') THEN 1 ELSE 0 END)
       + (CASE WHEN doc_id IS NOT NULL AND doc_id < 0 THEN 1 ELSE 0 END)
       + (CASE WHEN n_chars IS NOT NULL AND n_chars < 0 THEN 1 ELSE 0 END)
       + (CASE WHEN n_chars IS NOT NULL AND n_chars > 500 THEN 1 ELSE 0 END)
       + (CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END)
       + (CASE WHEN text IS NULL THEN 1 ELSE 0 END)
       + (CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS bad
  FROM documents
)
""".format(langs=", ".join("'" + l + "'" for l in LANGS))

    webpages_flagship = """
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN bad > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_failed_rows,
       CAST(sum(bad) AS BIGINT) AS n_violations
FROM (
  SELECT (CASE WHEN url IS NULL OR warc_ts IS NULL OR text IS NULL
                    OR lang IS NULL THEN 2 ELSE 0 END)
       + (CASE WHEN url IS NOT NULL AND NOT regexp_matches(url, '^https?://') THEN 1 ELSE 0 END)
       + (CASE WHEN url IS NOT NULL AND length(url) > 2048 THEN 1 ELSE 0 END)
       + (CASE WHEN text IS NOT NULL AND length(text) < 1 THEN 1 ELSE 0 END)
       + (CASE WHEN lang IS NOT NULL AND lang NOT IN ({langs}) THEN 1 ELSE 0 END) AS bad
  FROM read_parquet('{path}/*.parquet')
)
""".format(langs=", ".join("'" + l + "'" for l in LANGS),
           # pinned to sf0.01 — the scale the driver's correctness gate
           # runs at; each scale's query writes its own snapshot
           path=WEBPAGES_ORACLE_PATH.format(sf=0.01))

    return {
        "validate_documents": viol,
        "verdict_documents": verdict,
        "webpages_flagship": webpages_flagship,
        "stats_documents": """
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_text,
       min(n_chars) AS min_n_chars,
       max(n_chars) AS max_n_chars,
       round(avg(n_chars), 6) AS avg_n_chars,
       CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
FROM documents
""",
        "topk_lang": """
SELECT lang AS value, CAST(count(*) AS BIGINT) AS cnt
FROM documents GROUP BY lang
ORDER BY cnt DESC, value ASC LIMIT 5
""",
        "uniqueness_events_user": """
SELECT user_id, CAST(count(*) AS BIGINT) AS n_duplicates
FROM events GROUP BY user_id HAVING count(*) > 1
""",
        "referential_orphans": """
SELECT o.o_orderkey, o.o_custkey
FROM orders o
WHERE NOT EXISTS (
  SELECT 1 FROM customer c
  WHERE c.c_custkey % 3 <> 0 AND c.c_custkey = o.o_custkey
)
""",
        "exact_dup_groups": f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text FROM documents WHERE doc_id < 50
)
SELECT md5({_NORM}) AS content_key, CAST(count(*) AS BIGINT) AS n_docs
FROM corpus GROUP BY 1 HAVING count(*) > 1
""",
        "minhash_signatures": f"""
SELECT doc_id, {_mh(0)} AS mh0, {_mh(1)} AS mh1
FROM documents WHERE doc_id < 100
""",
        "minhash_dup_pairs": f"""
WITH corpus AS (
  SELECT doc_id, {_SHINGLES} AS sh FROM documents WHERE doc_id < 50
  UNION ALL
  SELECT doc_id + 1000000, {_SHINGLES} FROM documents WHERE doc_id < 50
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
             / len(list_distinct(list_concat(a.sh, b.sh))), 6) AS jaccard
FROM corpus a JOIN corpus b ON a.doc_id < b.doc_id
WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
      / len(list_distinct(list_concat(a.sh, b.sh))) >= 1.0
""",
        "token_stats": f"""
SELECT doc_id,
       CAST(CASE WHEN length(trim(text)) = 0 THEN 0
            ELSE len(string_split_regex(trim(text), '\\s+')) END AS BIGINT) AS ws_tokens,
       CAST(len(regexp_extract_all(text, '{TOKEN_RE}')) AS BIGINT) AS bpe_tokens
FROM documents
""",
        "quality": f"""
WITH q AS (
  SELECT doc_id,
         length(text) AS n_chars,
         CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_tokens,
         len(regexp_extract_all(text, '[A-Za-z]')) AS n_alpha,
         len(regexp_extract_all(text, '[^\\w\\s]')) AS n_punct,
         len(regexp_extract_all(lower(text), '{_STOP_EN}')) AS n_stop
  FROM documents
)
SELECT doc_id,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       round(CASE WHEN n_chars > 0 THEN CAST(n_alpha AS DOUBLE)/n_chars ELSE 0 END, 4) AS alpha_ratio,
       round(CASE WHEN n_chars > 0 THEN CAST(n_punct AS DOUBLE)/n_chars ELSE 0 END, 4) AS punct_ratio,
       round(CASE WHEN n_tokens > 0 THEN CAST(n_stop AS DOUBLE)/n_tokens ELSE 0 END, 4) AS stopword_ratio,
       round(
         (CASE WHEN n_chars BETWEEN 50 AND 100000 THEN 0.25 ELSE 0 END)
         + least((CASE WHEN n_chars > 0 THEN CAST(n_alpha AS DOUBLE)/n_chars ELSE 0 END) * 0.5, 0.25)
         + (CASE WHEN (CASE WHEN n_chars > 0 THEN CAST(n_punct AS DOUBLE)/n_chars ELSE 0 END) < 0.2 THEN 0.25 ELSE 0 END)
         + least((CASE WHEN n_tokens > 0 THEN CAST(n_stop AS DOUBLE)/n_tokens ELSE 0 END) * 2.5, 0.25)
       , 4) AS quality_score
FROM q
""",
        "lang_id": f"""
SELECT doc_id,
       CASE
         WHEN kana > 0 AND kana + han > lat THEN 'ja'
         WHEN han > lat THEN 'zh'
         WHEN cyr > lat THEN 'ru'
         WHEN best.score > 0 THEN best.lang
         ELSE 'und'
       END AS lang_pred
FROM (
  SELECT doc_id,
         len(regexp_extract_all(text, '[\\p{{Hiragana}}\\p{{Katakana}}]')) AS kana,
         len(regexp_extract_all(text, '\\p{{Han}}')) AS han,
         len(regexp_extract_all(text, '\\p{{Cyrillic}}')) AS cyr,
         len(regexp_extract_all(text, '[A-Za-z]')) AS lat,
         list_max([
           {", ".join(f"struct_pack(score := {_lang_score(lang)}, lang := '{lang}')" for lang in sorted(STOPWORDS))}
         ]) AS best
  FROM documents
)
""",
        "fingerprints": f"""
SELECT doc_id,
       CAST(('0x' || substr(md5({_NORM}), 1, 15)) AS BIGINT) AS fingerprint
FROM documents
""",
        "ann_topk": """
SELECT e.vec_id,
       round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                    CAST(q.embedding AS DOUBLE[])), 4) AS score
FROM embeddings e,
     (SELECT embedding FROM embeddings WHERE vec_id = 0) q
ORDER BY score DESC, e.vec_id ASC
LIMIT 10
""",
        "ann_ivf_topk": """
SELECT e.vec_id,
       round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                    CAST(q.embedding AS DOUBLE[])), 4) AS score
FROM embeddings e,
     (SELECT embedding FROM embeddings WHERE vec_id = 0) q
ORDER BY score DESC, e.vec_id ASC
LIMIT 10
""",
        # Golden snapshot, NOT a SQL re-derivation: the partial-probe result
        # depends on the seeded k-means listing, which is deterministic and
        # parallelism-independent on the shipped sf0.01 corpus (pinned under
        # local[8] and local[32]; see tests/test_round4_fixes.py snapshot
        # test). These are the exact (vec_id, round(score,4)) rows the engine
        # produces at n_lists=8, n_probe=4 — a hard oracle per VERDICT r4 #2.
        "ann_ivf_partial": """
SELECT CAST(vec_id AS BIGINT) AS vec_id, CAST(score AS DOUBLE) AS score
FROM (VALUES (0, 1.0), (365, 0.37), (423, 0.2969), (7, 0.2928),
             (190, 0.2818), (464, 0.2766), (388, 0.2763), (483, 0.2567),
             (498, 0.2507), (257, 0.2481)) AS t(vec_id, score)
""",
        "embedding_dup_pairs": """
WITH corpus AS (
  SELECT vec_id, embedding FROM embeddings WHERE vec_id < 50
  UNION ALL
  SELECT vec_id + 100000, embedding FROM embeddings WHERE vec_id < 50
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b
FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                             CAST(b.embedding AS DOUBLE[])) >= 0.999
""",
        "lineitem_pricing": """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(avg(l_discount), 6) AS avg_disc,
       CAST(count(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= DATE '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
        "events_json_validation": """
SELECT event_id,
       (props IS NULL) OR (
         json_valid(props)
         AND json_type(props::JSON) = 'OBJECT'
         AND json_type(props::JSON, '$.k') IN ('UBIGINT', 'BIGINT')
         AND CAST(json_extract(props, '$.k') AS BIGINT) BETWEEN 0 AND 50
       ) AS valid
FROM events
""",
        "json_positions_events": """
SELECT event_id,
       '/k' AS path,
       'maximum' AS keyword,
       '50' AS expected,
       CAST(CAST(json_extract(props, '$.k') AS BIGINT) AS VARCHAR) AS actual,
       'Number under/equal to maximum' AS message,
       0 AS line,
       4 AS col
FROM events
WHERE props IS NOT NULL
  AND CAST(json_extract(props, '$.k') AS BIGINT) > 50
""",
        "gopher_quality": r"""
WITH m AS (
  SELECT doc_id,
         'SHARED HEADER LINE' || chr(10) || text || chr(10) ||
         substr(text, 1, 30) || chr(10) || substr(text, 1, 30) || chr(10) ||
         '- item one' || chr(10) || '- item two' || chr(10) ||
         'Trailing line...' || chr(10) || 'FOOTER ' || CAST(doc_id % 3 AS VARCHAR) AS text
  FROM documents WHERE doc_id < 300
),
feats AS (
  -- coalesce mirrors gopher_quality_flags' NULL handling: a NULL document
  -- scores 0 everywhere and gopher_keep=false on BOTH engines (the raw
  -- concat in m propagates NULL exactly like Spark's F.concat)
  SELECT doc_id, coalesce(text, '') AS text,
    list_filter(regexp_split_to_array(coalesce(text, ''), '\s+'), w -> w <> '') AS words,
    list_filter(string_split(coalesce(text, ''), chr(10)), l -> trim(l) <> '') AS lines,
    list_filter(regexp_split_to_array(coalesce(text, ''), '\n\n+'), p -> trim(p) <> '') AS paras
  FROM m
),
r AS (
  SELECT doc_id,
    len(words) AS n_words,
    ROUND(CASE WHEN len(words) > 0 THEN list_aggregate(list_transform(words, w -> length(w)), 'sum') * 1.0 / len(words) ELSE 0 END, 6) AS mean_word_length,
    ROUND(CASE WHEN len(words) > 0 THEN ((length(text) - length(replace(text, '#', ''))) + len(regexp_extract_all(text, '\.\.\.|…'))) * 1.0 / len(words) ELSE 0 END, 6) AS symbol_word_ratio,
    ROUND(CASE WHEN len(lines) > 0 THEN len(list_filter(lines, l -> regexp_matches(trim(l), '^[-*•]'))) * 1.0 / len(lines) ELSE 0 END, 6) AS bullet_line_fraction,
    ROUND(CASE WHEN len(lines) > 0 THEN len(list_filter(lines, l -> regexp_matches(trim(l), '(\.\.\.|…)$'))) * 1.0 / len(lines) ELSE 0 END, 6) AS ellipsis_line_fraction,
    ROUND(CASE WHEN len(words) > 0 THEN len(list_filter(words, w -> regexp_matches(w, '[A-Za-z]'))) * 1.0 / len(words) ELSE 0 END, 6) AS alpha_word_fraction,
    ROUND(CASE WHEN len(lines) > 0 THEN (len(lines) - len(list_distinct(lines))) * 1.0 / len(lines) ELSE 0 END, 6) AS duplicate_line_fraction,
    ROUND(CASE WHEN len(paras) > 0 THEN (len(paras) - len(list_distinct(paras))) * 1.0 / len(paras) ELSE 0 END, 6) AS duplicate_paragraph_fraction,
    ROUND(CASE WHEN list_aggregate(list_transform(lines, x -> length(x)), 'sum') > 0
          THEN list_aggregate(list_transform(lines, x -> CASE WHEN len(list_filter(lines, y -> y = x)) > 1 THEN length(x) ELSE 0 END), 'sum') * 1.0
               / list_aggregate(list_transform(lines, x -> length(x)), 'sum')
          ELSE 0 END, 6) AS duplicate_line_char_fraction,
    ROUND(CASE WHEN list_aggregate(list_transform(paras, x -> length(x)), 'sum') > 0
          THEN list_aggregate(list_transform(paras, x -> CASE WHEN len(list_filter(paras, y -> y = x)) > 1 THEN length(x) ELSE 0 END), 'sum') * 1.0
               / list_aggregate(list_transform(paras, x -> length(x)), 'sum')
          ELSE 0 END, 6) AS duplicate_paragraph_char_fraction
  FROM feats
),
-- r5: top-n-gram char fractions (same conventions as
-- gopher_top_ngram_fractions: space-joined word n-grams, denominator =
-- length of the space-rejoined words, tie-break count DESC then gram DESC)
wtc AS (
  SELECT doc_id, words, length(array_to_string(words, ' ')) AS tc FROM feats
),
gr AS (
  SELECT doc_id, tc, n,
    CASE WHEN len(words) >= n THEN
      list_transform(generate_series(1, len(words) - n + 1),
                     i -> array_to_string(words[i:i+n-1], ' '))
    ELSE [] END AS gs
  FROM wtc CROSS JOIN (SELECT unnest([2, 3, 4]) AS n) ns
),
cnts AS (
  SELECT doc_id, tc, n, gram, COUNT(*) AS cnt
  FROM (SELECT doc_id, tc, n, unnest(gs) AS gram FROM gr) x
  GROUP BY doc_id, tc, n, gram
),
tops AS (
  SELECT doc_id, n, ROUND(cnt * length(gram) * 1.0 / tc, 6) AS frac
  FROM (SELECT *, row_number() OVER (PARTITION BY doc_id, n
                                     ORDER BY cnt DESC, gram DESC) AS rn
        FROM cnts) t
  WHERE rn = 1 AND tc > 0
),
ng AS (
  SELECT r.doc_id,
         coalesce(MAX(CASE WHEN n = 2 THEN frac END), 0.0) AS top_2gram_char_fraction,
         coalesce(MAX(CASE WHEN n = 3 THEN frac END), 0.0) AS top_3gram_char_fraction,
         coalesce(MAX(CASE WHEN n = 4 THEN frac END), 0.0) AS top_4gram_char_fraction
  FROM r LEFT JOIN tops ON r.doc_id = tops.doc_id
  GROUP BY r.doc_id
),
-- r5: duplicated-n-gram char fractions (exact coverage: a word counts
-- once no matter how many duplicated n-grams span it)
dgr AS (
  SELECT doc_id, n,
    CASE WHEN len(words) >= n THEN
      list_transform(generate_series(1, len(words) - n + 1),
                     i -> {'pos': i, 'gram': array_to_string(words[i:i+n-1], ' ')})
    ELSE [] END AS gs
  FROM wtc CROSS JOIN (SELECT unnest([5, 6, 7, 8, 9, 10]) AS n) dn
),
docc AS (
  SELECT doc_id, n, g.pos AS pos, g.gram AS gram
  FROM (SELECT doc_id, n, unnest(gs) AS g FROM dgr) x
),
dups AS (
  SELECT doc_id, n, gram FROM docc
  GROUP BY doc_id, n, gram HAVING COUNT(*) >= 2
),
cov AS (
  SELECT DISTINCT d.doc_id, d.n, d.pos + t.o AS widx
  FROM docc d JOIN dups USING (doc_id, n, gram),
       unnest(generate_series(0, d.n - 1)) AS t(o)
),
wl AS (
  SELECT doc_id, i AS widx, length(words[i]) AS wlen
  FROM wtc, unnest(generate_series(1, len(words))) AS t(i)
),
tw AS (
  SELECT doc_id,
         coalesce(list_aggregate(list_transform(words, w -> length(w)), 'sum'), 0) AS total_w
  FROM wtc
),
covn AS (
  SELECT c.doc_id, c.n, SUM(w.wlen) AS covd
  FROM cov c JOIN wl w USING (doc_id, widx)
  GROUP BY c.doc_id, c.n
),
dng AS (
  SELECT r.doc_id,
    coalesce(ROUND(MAX(CASE WHEN n = 5 THEN covd END) * 1.0 / NULLIF(tw.total_w, 0), 6), 0.0) AS dup_5gram_char_fraction,
    coalesce(ROUND(MAX(CASE WHEN n = 6 THEN covd END) * 1.0 / NULLIF(tw.total_w, 0), 6), 0.0) AS dup_6gram_char_fraction,
    coalesce(ROUND(MAX(CASE WHEN n = 7 THEN covd END) * 1.0 / NULLIF(tw.total_w, 0), 6), 0.0) AS dup_7gram_char_fraction,
    coalesce(ROUND(MAX(CASE WHEN n = 8 THEN covd END) * 1.0 / NULLIF(tw.total_w, 0), 6), 0.0) AS dup_8gram_char_fraction,
    coalesce(ROUND(MAX(CASE WHEN n = 9 THEN covd END) * 1.0 / NULLIF(tw.total_w, 0), 6), 0.0) AS dup_9gram_char_fraction,
    coalesce(ROUND(MAX(CASE WHEN n = 10 THEN covd END) * 1.0 / NULLIF(tw.total_w, 0), 6), 0.0) AS dup_10gram_char_fraction
  FROM r JOIN tw ON r.doc_id = tw.doc_id
       LEFT JOIN covn ON r.doc_id = covn.doc_id
  GROUP BY r.doc_id, tw.total_w
)
SELECT r.*,
  (n_words >= 50 AND n_words <= 100000
   AND mean_word_length >= 3 AND mean_word_length <= 10
   AND symbol_word_ratio <= 0.1
   AND bullet_line_fraction <= 0.9
   AND ellipsis_line_fraction <= 0.3
   AND alpha_word_fraction >= 0.8
   AND duplicate_line_fraction <= 0.3
   AND duplicate_paragraph_fraction <= 0.3
   AND duplicate_line_char_fraction <= 0.2
   AND duplicate_paragraph_char_fraction <= 0.2) AS gopher_keep,
  ng.top_2gram_char_fraction, ng.top_3gram_char_fraction,
  ng.top_4gram_char_fraction,
  dng.dup_5gram_char_fraction, dng.dup_6gram_char_fraction,
  dng.dup_7gram_char_fraction, dng.dup_8gram_char_fraction,
  dng.dup_9gram_char_fraction, dng.dup_10gram_char_fraction,
  ((n_words >= 50 AND n_words <= 100000
   AND mean_word_length >= 3 AND mean_word_length <= 10
   AND symbol_word_ratio <= 0.1
   AND bullet_line_fraction <= 0.9
   AND ellipsis_line_fraction <= 0.3
   AND alpha_word_fraction >= 0.8
   AND duplicate_line_fraction <= 0.3
   AND duplicate_paragraph_fraction <= 0.3
   AND duplicate_line_char_fraction <= 0.2
   AND duplicate_paragraph_char_fraction <= 0.2)
   AND ng.top_2gram_char_fraction <= 0.20
   AND ng.top_3gram_char_fraction <= 0.18
   AND ng.top_4gram_char_fraction <= 0.16
   AND dng.dup_5gram_char_fraction <= 0.15
   AND dng.dup_6gram_char_fraction <= 0.14
   AND dng.dup_7gram_char_fraction <= 0.13
   AND dng.dup_8gram_char_fraction <= 0.12
   AND dng.dup_9gram_char_fraction <= 0.11
   AND dng.dup_10gram_char_fraction <= 0.10) AS gopher_keep_full
FROM r JOIN ng ON r.doc_id = ng.doc_id JOIN dng ON r.doc_id = dng.doc_id
""",
        "c4_quality": r"""
WITH m AS (
  SELECT doc_id,
         'SHARED HEADER LINE' || chr(10) || text || chr(10) ||
         substr(text, 1, 30) || chr(10) || substr(text, 1, 30) || chr(10) ||
         '- item one' || chr(10) || '- item two' || chr(10) ||
         'Trailing line...' || chr(10) || 'FOOTER ' || CAST(doc_id % 3 AS VARCHAR) AS text
  FROM documents WHERE doc_id < 300
),
f AS (
  SELECT doc_id, coalesce(text, '') AS text,
    list_filter(string_split(coalesce(text, ''), chr(10)), l -> trim(l) <> '') AS lines
  FROM m
)
SELECT doc_id,
  len(list_filter(regexp_split_to_array(text, '[.!?]'), s -> trim(s) <> '')) AS n_sentences,
  contains(lower(text), 'lorem ipsum') AS has_lorem_ipsum,
  contains(text, '{') AS has_curly_brace,
  ROUND(CASE WHEN len(lines) > 0
        THEN len(list_filter(lines, l -> regexp_matches(trim(l), '[.!?\"]$'))) * 1.0 / len(lines)
        ELSE 0 END, 6) AS terminal_punct_line_fraction,
  (list_has_any(list_filter(regexp_split_to_array(lower(text), '\s+'), w -> w <> ''),
                ['zzzunusedtoken'])
   OR contains(lower(text), 'footer 2')) AS has_bad_word,
  (len(list_filter(regexp_split_to_array(text, '[.!?]'), s -> trim(s) <> '')) >= 3
   AND NOT contains(lower(text), 'lorem ipsum')
   AND NOT contains(text, '{')
   AND NOT (list_has_any(list_filter(regexp_split_to_array(lower(text), '\s+'), w -> w <> ''),
                         ['zzzunusedtoken'])
            OR contains(lower(text), 'footer 2'))) AS c4_keep
FROM f
""",
        "quality_fused": r"""
WITH m AS (
  SELECT doc_id,
         'SHARED HEADER LINE' || chr(10) || text || chr(10) ||
         substr(text, 1, 30) || chr(10) || substr(text, 1, 30) || chr(10) ||
         '- item one' || chr(10) || '- item two' || chr(10) ||
         'Trailing line...' || chr(10) || 'FOOTER ' || CAST(doc_id % 3 AS VARCHAR) AS text
  FROM documents WHERE doc_id < 300
),
feats AS (
  SELECT doc_id, coalesce(text, '') AS text,
    list_filter(regexp_split_to_array(coalesce(text, ''), '\s+'), w -> w <> '') AS words,
    list_filter(string_split(coalesce(text, ''), chr(10)), l -> trim(l) <> '') AS lines,
    list_filter(regexp_split_to_array(coalesce(text, ''), '\n\n+'), p -> trim(p) <> '') AS paras
  FROM m
),
r AS (
  SELECT doc_id,
    len(words) AS n_words,
    ROUND(CASE WHEN len(words) > 0 THEN list_aggregate(list_transform(words, w -> length(w)), 'sum') * 1.0 / len(words) ELSE 0 END, 6) AS mean_word_length,
    ROUND(CASE WHEN len(words) > 0 THEN ((length(text) - length(replace(text, '#', ''))) + len(regexp_extract_all(text, '\.\.\.|…'))) * 1.0 / len(words) ELSE 0 END, 6) AS symbol_word_ratio,
    ROUND(CASE WHEN len(lines) > 0 THEN len(list_filter(lines, l -> regexp_matches(trim(l), '^[-*•]'))) * 1.0 / len(lines) ELSE 0 END, 6) AS bullet_line_fraction,
    ROUND(CASE WHEN len(lines) > 0 THEN len(list_filter(lines, l -> regexp_matches(trim(l), '(\.\.\.|…)$'))) * 1.0 / len(lines) ELSE 0 END, 6) AS ellipsis_line_fraction,
    ROUND(CASE WHEN len(words) > 0 THEN len(list_filter(words, w -> regexp_matches(w, '[A-Za-z]'))) * 1.0 / len(words) ELSE 0 END, 6) AS alpha_word_fraction,
    ROUND(CASE WHEN len(lines) > 0 THEN (len(lines) - len(list_distinct(lines))) * 1.0 / len(lines) ELSE 0 END, 6) AS duplicate_line_fraction,
    ROUND(CASE WHEN len(paras) > 0 THEN (len(paras) - len(list_distinct(paras))) * 1.0 / len(paras) ELSE 0 END, 6) AS duplicate_paragraph_fraction,
    ROUND(CASE WHEN list_aggregate(list_transform(lines, x -> length(x)), 'sum') > 0
          THEN list_aggregate(list_transform(lines, x -> CASE WHEN len(list_filter(lines, y -> y = x)) > 1 THEN length(x) ELSE 0 END), 'sum') * 1.0
               / list_aggregate(list_transform(lines, x -> length(x)), 'sum')
          ELSE 0 END, 6) AS duplicate_line_char_fraction,
    ROUND(CASE WHEN list_aggregate(list_transform(paras, x -> length(x)), 'sum') > 0
          THEN list_aggregate(list_transform(paras, x -> CASE WHEN len(list_filter(paras, y -> y = x)) > 1 THEN length(x) ELSE 0 END), 'sum') * 1.0
               / list_aggregate(list_transform(paras, x -> length(x)), 'sum')
          ELSE 0 END, 6) AS duplicate_paragraph_char_fraction,
    (len(lines) > 10000 OR len(paras) > 10000) AS char_fraction_truncated,
    len(list_filter(regexp_split_to_array(text, '[.!?]'), s -> trim(s) <> '')) AS n_sentences,
    contains(lower(text), 'lorem ipsum') AS has_lorem_ipsum,
    contains(text, '{') AS has_curly_brace,
    ROUND(CASE WHEN len(lines) > 0
          THEN len(list_filter(lines, l -> regexp_matches(trim(l), '[.!?\"]$'))) * 1.0 / len(lines)
          ELSE 0 END, 6) AS terminal_punct_line_fraction,
    (list_has_any(list_filter(regexp_split_to_array(lower(text), '\s+'), w -> w <> ''),
                  ['zzzunusedtoken'])
     OR contains(lower(text), 'footer 2')) AS has_bad_word
  FROM feats
)
SELECT doc_id, n_words, mean_word_length, symbol_word_ratio,
  bullet_line_fraction, ellipsis_line_fraction, alpha_word_fraction,
  duplicate_line_fraction, duplicate_paragraph_fraction,
  duplicate_line_char_fraction, duplicate_paragraph_char_fraction,
  char_fraction_truncated,
  (n_words >= 50 AND n_words <= 100000
   AND mean_word_length >= 3 AND mean_word_length <= 10
   AND symbol_word_ratio <= 0.1
   AND bullet_line_fraction <= 0.9
   AND ellipsis_line_fraction <= 0.3
   AND alpha_word_fraction >= 0.8
   AND duplicate_line_fraction <= 0.3
   AND duplicate_paragraph_fraction <= 0.3
   AND duplicate_line_char_fraction <= 0.2
   AND duplicate_paragraph_char_fraction <= 0.2) AS gopher_keep,
  n_sentences, has_lorem_ipsum, has_curly_brace,
  terminal_punct_line_fraction, has_bad_word,
  (n_sentences >= 3 AND NOT has_lorem_ipsum AND NOT has_curly_brace
   AND NOT has_bad_word) AS c4_keep,
  ((n_words >= 50 AND n_words <= 100000
    AND mean_word_length >= 3 AND mean_word_length <= 10
    AND symbol_word_ratio <= 0.1
    AND bullet_line_fraction <= 0.9
    AND ellipsis_line_fraction <= 0.3
    AND alpha_word_fraction >= 0.8
    AND duplicate_line_fraction <= 0.3
    AND duplicate_paragraph_fraction <= 0.3
    AND duplicate_line_char_fraction <= 0.2
    AND duplicate_paragraph_char_fraction <= 0.2)
   AND (n_sentences >= 3 AND NOT has_lorem_ipsum AND NOT has_curly_brace
        AND NOT has_bad_word)) AS quality_keep
FROM r
""",
        "cc_labels": r"""
WITH RECURSIVE ids AS (
  SELECT doc_id FROM documents WHERE doc_id < 60
),
e AS (
  SELECT doc_id AS a, doc_id + 1 AS b FROM ids WHERE doc_id % 5 < 3
  UNION ALL
  SELECT doc_id AS a, doc_id + 7 AS b FROM ids WHERE doc_id % 11 = 0
),
und AS (
  SELECT a, b FROM e UNION SELECT b AS a, a AS b FROM e
),
nodes AS (SELECT DISTINCT a AS node FROM und),
r(node, anc) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT u.a, r.anc FROM und u JOIN r ON r.node = u.b
)
SELECT node, MIN(anc) AS label FROM r GROUP BY node
""",
        "decontaminate": f"""
WITH W AS (
  SELECT doc_id,
         list_filter(string_split({_NORM}, ' '), w -> w <> '') AS words
  FROM documents
),
evalw AS (
  SELECT words[1:20] AS words FROM W WHERE doc_id % 40 = 0
),
eg AS (
  SELECT DISTINCT t.g AS ngram
  FROM evalw, UNNEST(CASE WHEN len(words) >= 13 THEN
       list_transform(generate_series(1, len(words) - 12),
                      i -> array_to_string(words[i:i+12], ' '))
       ELSE CAST([] AS VARCHAR[]) END) AS t(g)
),
tg AS (
  SELECT doc_id, t.g AS ngram
  FROM W, UNNEST(CASE WHEN len(words) >= 13 THEN
       list_transform(generate_series(1, len(words) - 12),
                      i -> array_to_string(words[i:i+12], ' '))
       ELSE CAST([] AS VARCHAR[]) END) AS t(g)
),
hits AS (SELECT DISTINCT tg.doc_id FROM tg JOIN eg USING (ngram))
SELECT W.doc_id,
       (hits.doc_id IS NOT NULL) AS contaminated,
       CAST(CASE WHEN len(W.words) >= 13 THEN len(list_distinct(
              list_transform(generate_series(1, len(W.words) - 12),
                             i -> array_to_string(W.words[i:i+12], ' '))))
            ELSE 0 END AS BIGINT) AS n_ngrams
FROM W LEFT JOIN hits ON W.doc_id = hits.doc_id
""",
        "pii_scrub": f"""
WITH p AS (
  SELECT doc_id,
         'Contact user' || CAST(doc_id AS VARCHAR) || '@example.com or +1 ' ||
         lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
         '-555-0199 from 10.2.' || CAST(doc_id % 256 AS VARCHAR) ||
         '.7 id 123-45-6789. ' || coalesce(text, '') AS t
  FROM documents
)
SELECT doc_id, {pii_counts_sql}, {pii_redacted_sql} AS redacted FROM p
""",
        "mixture_sample": f"""
SELECT doc_id, lang, source FROM documents
WHERE substr(md5(coalesce(CAST(doc_id AS VARCHAR), '') || ':11'), 1, 8) <
      CASE lang {mix_case}
           ELSE '{threshold_hex(0.15)}' END
""",
        "duplicate_line_groups": r"""
WITH m AS (
  SELECT doc_id,
         'SHARED HEADER LINE' || chr(10) || text || chr(10) ||
         substr(text, 1, 30) || chr(10) || substr(text, 1, 30) || chr(10) ||
         '- item one' || chr(10) || '- item two' || chr(10) ||
         'Trailing line...' || chr(10) || 'FOOTER ' || CAST(doc_id % 3 AS VARCHAR) AS text
  FROM documents WHERE doc_id < 300
),
l AS (
  SELECT m.doc_id, trim(t.x) AS line
  FROM m, unnest(string_split(m.text, chr(10))) AS t(x)
)
SELECT line, COUNT(DISTINCT doc_id) AS n_docs, COUNT(*) AS n_occurrences
FROM l WHERE line <> ''
GROUP BY line HAVING COUNT(DISTINCT doc_id) >= 50
""",
        "clean_corpus": r"""
WITH mm AS (
  SELECT doc_id,
         'SHARED HEADER LINE' || chr(10) || text || chr(10) ||
         substr(text, 1, 30) || chr(10) || substr(text, 1, 30) || chr(10) ||
         '- item one' || chr(10) || '- item two' || chr(10) ||
         'Trailing line...' || chr(10) || 'FOOTER ' || CAST(doc_id % 3 AS VARCHAR) ||
         chr(10) || 'First closing sentence. Second closing point. Third final line.' AS text
  FROM documents WHERE doc_id < 300
),
corpus AS (
  SELECT doc_id, text FROM mm
  UNION ALL
  SELECT doc_id + 10000, text FROM mm WHERE doc_id < 50
),
-- stage 1: exact dedup on normalized text, min id kept
keyed AS (
  SELECT doc_id, text,
         regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS nt
  FROM corpus
),
dedup AS (
  SELECT k.doc_id, k.text FROM keyed k
  JOIN (SELECT nt, MIN(doc_id) AS keep FROM keyed GROUP BY nt) m
    ON k.nt = m.nt AND k.doc_id = m.keep
),
-- stage 2: Gopher base gate (same metric fragments as the gopher oracle)
gfeat AS (
  SELECT doc_id, text,
    list_filter(regexp_split_to_array(coalesce(text, ''), '\s+'), w -> w <> '') AS words,
    list_filter(string_split(coalesce(text, ''), chr(10)), l -> trim(l) <> '') AS lines,
    list_filter(regexp_split_to_array(coalesce(text, ''), '\n\n+'), p -> trim(p) <> '') AS paras
  FROM dedup
),
gk AS (
  SELECT doc_id, text,
    (len(words) >= 50 AND len(words) <= 100000
     AND (list_aggregate(list_transform(words, w -> length(w)), 'sum') * 1.0 / len(words)) >= 3
     AND (list_aggregate(list_transform(words, w -> length(w)), 'sum') * 1.0 / len(words)) <= 10
     AND (((length(text) - length(replace(text, '#', ''))) + len(regexp_extract_all(text, '\.\.\.|…'))) * 1.0 / len(words)) <= 0.1
     AND (len(list_filter(lines, l -> regexp_matches(trim(l), '^[-*•]'))) * 1.0 / len(lines)) <= 0.9
     AND (len(list_filter(lines, l -> regexp_matches(trim(l), '(\.\.\.|…)$'))) * 1.0 / len(lines)) <= 0.3
     AND (len(list_filter(words, w -> regexp_matches(w, '[A-Za-z]'))) * 1.0 / len(words)) >= 0.8
     AND ((len(lines) - len(list_distinct(lines))) * 1.0 / len(lines)) <= 0.3
     AND ((len(paras) - len(list_distinct(paras))) * 1.0 / len(paras)) <= 0.3
     AND (list_aggregate(list_transform(lines, x -> CASE WHEN len(list_filter(lines, y -> y = x)) > 1 THEN length(x) ELSE 0 END), 'sum') * 1.0
          / list_aggregate(list_transform(lines, x -> length(x)), 'sum')) <= 0.2
     AND (list_aggregate(list_transform(paras, x -> CASE WHEN len(list_filter(paras, y -> y = x)) > 1 THEN length(x) ELSE 0 END), 'sum') * 1.0
          / list_aggregate(list_transform(paras, x -> length(x)), 'sum')) <= 0.2
    ) AS keep
  FROM gfeat
),
gsurv AS (SELECT doc_id, text FROM gk WHERE keep),
-- stage 3: C4 gate + badwords (phrase 'footer 2'; token never fires)
ck AS (
  SELECT doc_id,
    (len(list_filter(regexp_split_to_array(text, '[.!?]'), s -> trim(s) <> '')) >= 3
     AND NOT contains(lower(text), 'lorem ipsum')
     AND NOT contains(text, '{')
     AND NOT (list_has_any(list_filter(regexp_split_to_array(lower(text), '\s+'), w -> w <> ''),
                           ['zzzunusedtoken'])
              OR contains(lower(text), 'footer 2'))) AS keep
  FROM gsurv
)
SELECT (SELECT COUNT(*) FROM corpus) AS n_input,
       (SELECT COUNT(*) FROM dedup) AS n_after_exact,
       (SELECT COUNT(*) FROM gsurv) AS n_after_gopher,
       (SELECT COUNT(*) FROM ck WHERE keep) AS n_after_c4
""",
        "c4_span_groups": r"""
WITH m AS (
  SELECT doc_id,
    'Shared intro sentence. Common second point. Common third point.' ||
    ' Unique body ' || CAST(doc_id AS VARCHAR) || ' says something.' ||
    ' Tail variant ' || CAST(doc_id % 3 AS VARCHAR) || ' one.' ||
    ' Tail variant ' || CAST(doc_id % 3 AS VARCHAR) || ' two.' ||
    ' Tail variant ' || CAST(doc_id % 3 AS VARCHAR) || ' three.' AS text
  FROM documents WHERE doc_id < 300
),
nc AS (
  SELECT doc_id,
    list_transform(regexp_extract_all(text, '[^.!?]*[.!?]+|[^.!?]+$'),
                   c -> regexp_replace(lower(trim(c)), '\s+', ' ', 'g')) AS n
  FROM m
),
spl AS (
  SELECT doc_id,
    CASE WHEN len(n) >= 3 THEN
      list_transform(generate_series(1, len(n) - 2),
                     i -> array_to_string(n[i:i+2], ' '))
    ELSE [] END AS spans
  FROM nc
),
sp AS (
  SELECT doc_id, i AS pos, spans[i] AS span
  FROM spl, unnest(generate_series(1, len(spans))) AS t(i)
)
SELECT span, COUNT(DISTINCT doc_id) AS n_docs, COUNT(*) AS n_occurrences
FROM sp GROUP BY span HAVING COUNT(*) >= 2
""",
        "c4_span_dedup": r"""
WITH m AS (
  SELECT doc_id,
    'Shared intro sentence. Common second point. Common third point.' ||
    ' Unique body ' || CAST(doc_id AS VARCHAR) || ' says something.' ||
    ' Tail variant ' || CAST(doc_id % 3 AS VARCHAR) || ' one.' ||
    ' Tail variant ' || CAST(doc_id % 3 AS VARCHAR) || ' two.' ||
    ' Tail variant ' || CAST(doc_id % 3 AS VARCHAR) || ' three.' AS text
  FROM documents WHERE doc_id < 300
),
ch AS (
  SELECT doc_id, regexp_extract_all(text, '[^.!?]*[.!?]+|[^.!?]+$') AS chunks
  FROM m
),
spl AS (
  SELECT doc_id,
    CASE WHEN len(chunks) >= 3 THEN
      list_transform(generate_series(1, len(chunks) - 2),
        i -> array_to_string(
               list_transform(chunks[i:i+2],
                              c -> regexp_replace(lower(trim(c)), '\s+', ' ', 'g')),
               ' '))
    ELSE [] END AS spans
  FROM ch
),
sp AS (
  SELECT doc_id, i AS pos, spans[i] AS span
  FROM spl, unnest(generate_series(1, len(spans))) AS t(i)
),
d AS (SELECT span FROM sp GROUP BY span HAVING COUNT(*) >= 2),
ranked AS (
  SELECT sp.doc_id, sp.pos,
         row_number() OVER (PARTITION BY sp.span ORDER BY sp.doc_id, sp.pos) AS rn
  FROM sp JOIN d USING (span)
),
victims AS (
  SELECT DISTINCT doc_id, pos + o AS idx
  FROM ranked, unnest([0, 1, 2]) AS t(o) WHERE rn > 1
),
chl AS (
  SELECT doc_id, i AS idx, chunks[i] AS chunk
  FROM ch, unnest(generate_series(1, len(chunks))) AS t(i)
),
kept AS (SELECT * FROM chl ANTI JOIN victims USING (doc_id, idx)),
rebuilt AS (
  SELECT doc_id, string_agg(chunk, '' ORDER BY idx) AS text FROM kept GROUP BY doc_id
)
SELECT m.doc_id, coalesce(rebuilt.text, '') AS text
FROM m LEFT JOIN rebuilt USING (doc_id)
""",
        "canonical_urls": r"""
WITH u AS (
  SELECT doc_id,
    CASE doc_id % 4
      WHEN 0 THEN 'HTTPS://Example.COM:443/p/' || p || '?utm_source=x&id=' || p || '#frag'
      WHEN 1 THEN 'https://example.com/p/' || p || '?id=' || p
      WHEN 2 THEN 'http://Site.org:80/q/' || p || '?gclid=zz&x=1'
      ELSE 'http://site.org/q/' || p || '?x=1'
    END AS url
  FROM (SELECT doc_id, CAST(doc_id // 4 AS VARCHAR) AS p
        FROM documents WHERE doc_id < 200)
),
c1 AS (SELECT doc_id,
  lower(regexp_extract(trim(url), '^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)', 1)) ||
  regexp_replace(trim(url), '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*', '') AS u FROM u),
c2 AS (SELECT doc_id, regexp_replace(u, '#.*$', '') AS u FROM c1),
c3 AS (SELECT doc_id, regexp_replace(u, '^(https://[^/?#:]*):443($|[/?])', '\1\2') AS u FROM c2),
c4 AS (SELECT doc_id, regexp_replace(u, '^(http://[^/?#:]*):80($|[/?])', '\1\2') AS u FROM c3),
c5 AS (SELECT doc_id, regexp_replace(u, '(utm_[a-z]+|fbclid|gclid|msclkid|ref_src)=[^&#]*&', '', 'g') AS u FROM c4),
c6 AS (SELECT doc_id, regexp_replace(u, '[?&](utm_[a-z]+|fbclid|gclid|msclkid|ref_src)=[^&#]*$', '', 'g') AS u FROM c5),
c7 AS (SELECT doc_id, regexp_replace(u, '\?(utm_[a-z]+|fbclid|gclid|msclkid|ref_src)=[^&#]*&', '?', 'g') AS u FROM c6)
SELECT doc_id, regexp_replace(u, '[?&]$', '') AS canonical_url FROM c7
""",
        "events_json_typed": """
SELECT event_id,
       (props IS NULL) OR (
         json_valid(props)
         AND json_type(props::JSON) = 'OBJECT'
         AND json_type(props::JSON, '$.k') IN ('UBIGINT', 'BIGINT')
         AND CAST(json_extract(props, '$.k') AS BIGINT) BETWEEN 0 AND 50
       ) AS valid
FROM events
""",
        "salted_lang_counts": """
SELECT lang, CAST(count(*) AS BIGINT) AS cnt FROM documents GROUP BY lang
""",
        "exact_dedup_keep": f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text FROM documents WHERE doc_id < 50
), keyed AS (
  SELECT doc_id, md5({_NORM}) AS ck FROM corpus
)
SELECT doc_id FROM keyed
WHERE doc_id = (SELECT min(k2.doc_id) FROM keyed k2 WHERE k2.ck = keyed.ck)
""",
        "ngram_jaccard_pairs": f"""
WITH corpus AS (
  SELECT doc_id, {_SHINGLES} AS sh FROM documents WHERE doc_id < 30
  UNION ALL
  SELECT doc_id + 1000000, {_SHINGLES} FROM documents WHERE doc_id < 30
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
             / len(list_distinct(list_concat(a.sh, b.sh))), 6) AS jaccard
FROM corpus a JOIN corpus b ON a.doc_id < b.doc_id
WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
      / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5
""",
        # simhash: portable md5-60bit token hashes -> per-bit votes -> packed
        # sign long; mirrors functions/dedup.py simhash_expr exactly
        "simhash_sample": """
WITH d AS (
  SELECT doc_id,
         regexp_replace(lower(trim(coalesce(text, ''))), '\\s+', ' ', 'g') AS t
  FROM documents WHERE doc_id < 50
),
toks AS (SELECT doc_id, unnest(string_split(t, ' ')) AS tok FROM d),
h AS (
  SELECT doc_id, CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) AS th
  FROM toks WHERE tok <> ''
),
bits AS (
  SELECT doc_id, b.b,
         sum(CASE WHEN ((th >> b.b) & 1) = 1 THEN 1 ELSE -1 END) AS vote
  FROM h CROSS JOIN (SELECT unnest(range(60)) AS b) b
  GROUP BY doc_id, b.b
),
packed AS (
  SELECT doc_id,
         sum(CASE WHEN vote > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS simhash
  FROM bits GROUP BY doc_id
)
SELECT d.doc_id, CAST(coalesce(p.simhash, 0) AS BIGINT) AS simhash
FROM d LEFT JOIN packed p USING (doc_id)
""",
        # binned two-sample KS: identical bucket arithmetic to integrity._bucket_expr
        # (least/greatest/floor with the same IEEE-754 op order)
        "ks_drift_nchars": """
WITH ln AS (SELECT CAST(n_chars AS DOUBLE) AS x FROM documents WHERE n_chars IS NOT NULL),
     rn AS (SELECT CAST(n_chars + 100 AS DOUBLE) AS x FROM documents WHERE n_chars IS NOT NULL),
     bounds AS (
       SELECT least((SELECT min(x) FROM ln), (SELECT min(x) FROM rn)) AS lo,
              greatest((SELECT max(x) FROM ln), (SELECT max(x) FROM rn)) AS hi
     ),
     lb AS (SELECT greatest(least(floor(((x - lo) * 256.0) / (hi - lo)), 255), 0) AS b,
                   count(*) AS c
            FROM ln, bounds GROUP BY 1),
     rb AS (SELECT greatest(least(floor(((x - lo) * 256.0) / (hi - lo)), 255), 0) AS b,
                   count(*) AS c
            FROM rn, bounds GROUP BY 1),
     grid AS (SELECT CAST(unnest(range(256)) AS DOUBLE) AS b),
     cum AS (
       SELECT g.b,
              sum(coalesce(lb.c, 0)) OVER (ORDER BY g.b) AS cl,
              sum(coalesce(rb.c, 0)) OVER (ORDER BY g.b) AS cr
       FROM grid g LEFT JOIN lb ON lb.b = g.b LEFT JOIN rb ON rb.b = g.b
     ),
     tot AS (SELECT (SELECT count(*) FROM ln) AS n1, (SELECT count(*) FROM rn) AS n2)
SELECT round(max(abs(CAST(cl AS DOUBLE) / n1 - CAST(cr AS DOUBLE) / n2)), 6) AS statistic,
       CAST(n1 AS BIGINT) AS n_left, CAST(n2 AS BIGINT) AS n_right
FROM cum, tot GROUP BY n1, n2
""",
        # chi-square homogeneity: full outer join of per-side category counts
        "chi2_drift_lang": """
WITH lc AS (SELECT lang AS v, count(*) AS c FROM documents GROUP BY 1),
     rc AS (SELECT CASE WHEN lang = 'en' THEN 'zz' ELSE lang END AS v, count(*) AS c
            FROM documents GROUP BY 1),
     cats AS (
       SELECT coalesce(lc.v, rc.v) AS v,
              CAST(coalesce(lc.c, 0) AS DOUBLE) AS o1,
              CAST(coalesce(rc.c, 0) AS DOUBLE) AS o2
       FROM lc FULL OUTER JOIN rc ON lc.v = rc.v
     ),
     tot AS (SELECT sum(o1) AS n1, sum(o2) AS n2, sum(o1) + sum(o2) AS t FROM cats)
SELECT round(sum(
         CASE WHEN (o1 + o2) > 0 THEN
           pow(o1 - (o1 + o2) * n1 / t, 2) / ((o1 + o2) * n1 / t)
           + pow(o2 - (o1 + o2) * n2 / t, 2) / ((o1 + o2) * n2 / t)
         ELSE 0 END), 4) AS statistic,
       CAST(n1 AS BIGINT) AS n_left, CAST(n2 AS BIGINT) AS n_right
FROM cats, tot GROUP BY n1, n2
""",
        # expected resize dims recomputed arithmetically from media_id —
        # the Spark side reads them from the re-encoded BMP bytes
        "media_resize_dims": f"""
WITH ids AS (SELECT range AS media_id FROM range(0, {MEDIA_N})),
     dims AS (SELECT media_id,
                     CAST(media_id % 61 + 4 AS DOUBLE) AS w,
                     CAST(media_id % 37 + 4 AS DOUBLE) AS h
              FROM ids),
     s AS (SELECT media_id, w, h, least(16.0 / w, 16.0 / h, 1.0) AS sc FROM dims)
SELECT media_id,
       CAST(greatest(floor(w * sc), 1) AS INT) AS out_w,
       CAST(greatest(floor(h * sc), 1) AS INT) AS out_h
FROM s
""",
        # 16k->8k nearest-neighbor resample halves (id%50+1)*160 samples
        # exactly; duration_ms of the re-encoded WAV is then (id%50+1)*10
        "audio_resample_ms": f"""
SELECT range AS media_id, CAST((range % 50 + 1) * 10 AS BIGINT) AS out_ms
FROM range(0, {MEDIA_N})
""",
        # 1000 ids, content_key = id % 100 -> 100 groups of 10; keep_id is
        # the min doc_id of the group == the key value itself
        "bucketed_dup_groups": """
SELECT CAST(range AS VARCHAR) AS content_key,
       CAST(10 AS BIGINT) AS n_docs,
       range AS keep_id
FROM range(0, 100)
""",
        # host/domain twins interpolate the ENGINE'S regex constants
        # (web.HOST_RE / web.DOMAIN_RE) so oracle and engine cannot drift
        "domain_stats": f"""
WITH d AS (SELECT doc_id, n_chars, {_crawl_url_sql('doc_id')} AS url FROM documents),
h AS (SELECT doc_id, n_chars,
             lower(regexp_extract(trim(url), '{_WEB_HOST_RE}', 1)) AS host FROM d),
r AS (SELECT doc_id, n_chars, host,
             CASE WHEN regexp_extract(host, '{_WEB_DOMAIN_RE}', 1) = '' THEN host
                  ELSE regexp_extract(host, '{_WEB_DOMAIN_RE}', 1) END AS domain
      FROM h)
SELECT domain, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT host) AS BIGINT) AS n_hosts,
       CAST(sum(n_chars) AS BIGINT) AS total_size
FROM r GROUP BY domain
""",
        "latest_capture": f"""
WITH caps AS (
  SELECT {_crawl_url_sql('event_id')} AS url, ts, event_id, event_type
  FROM events
)
SELECT url, ts, event_id, event_type FROM caps
QUALIFY row_number() OVER (PARTITION BY url ORDER BY ts DESC, event_id DESC) = 1
""",
        # weight twin built from the engine's classifier_weight_sql —
        # same md5/top-32-bit constants on both sides
        "classifier_scores": f"""
WITH d AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(coalesce(text, '')), '\\s+'),
                     w -> w <> '') AS toks
  FROM documents
), s AS (
  SELECT doc_id,
         CASE WHEN len(toks) > 0
              THEN list_sum(list_transform(toks, t -> {classifier_weight_sql('t')}))
                   / len(toks)
              ELSE 0.0 END AS score
  FROM d
)
SELECT doc_id, round(score, 6) AS quality_score,
       score > 0.01 AS classifier_keep
FROM s
""",
        "semantic_dup_pairs": """
WITH corpus AS (
  SELECT CAST(label AS BIGINT) AS cluster, vec_id, embedding
  FROM embeddings WHERE vec_id < 300
  UNION ALL
  SELECT CAST(label AS BIGINT), vec_id + 100000, embedding
  FROM embeddings WHERE vec_id < 300
)
SELECT a.cluster, a.vec_id AS id_a, b.vec_id AS id_b
FROM corpus a JOIN corpus b
  ON a.cluster = b.cluster AND a.vec_id < b.vec_id
WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                             CAST(b.embedding AS DOUBLE[])) >= 0.98
""",
        # rank twin reuses the engine's md5-hex ordering (sampling.py
        # convention: lexicographic hex == numeric top-32-bit order)
        "domain_capped": f"""
WITH d AS (SELECT doc_id, {_crawl_url_sql('doc_id')} AS url FROM documents),
h AS (SELECT doc_id,
             lower(regexp_extract(trim(url), '{_WEB_HOST_RE}', 1)) AS host FROM d),
r AS (SELECT doc_id, host,
             CASE WHEN regexp_extract(host, '{_WEB_DOMAIN_RE}', 1) = '' THEN host
                  ELSE regexp_extract(host, '{_WEB_DOMAIN_RE}', 1) END AS domain
      FROM h)
SELECT doc_id FROM r
QUALIFY row_number() OVER (
  PARTITION BY domain
  ORDER BY substr(md5(CAST(doc_id AS VARCHAR) || ':7'), 1, 8), doc_id) <= 25
""",
        # exclusive running sum over doc_id order == the engine's
        # two-stage block prefix sum (result invariance is the contract)
        "pack_sequences": """
WITH d AS (
  SELECT doc_id,
         CAST(CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(string_split_regex(trim(text), '\\s+')) END AS BIGINT) AS n_tokens
  FROM documents
), c AS (
  SELECT doc_id, n_tokens,
         greatest(coalesce(n_tokens, 0), 0) AS cnt,
         coalesce(sum(greatest(coalesce(n_tokens, 0), 0))
            OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
            0) AS start
  FROM d
)
SELECT doc_id, n_tokens, CAST(start AS BIGINT) AS start_token,
       CAST(start // 128 AS BIGINT) AS seq_first,
       CAST(CASE WHEN cnt > 0 THEN (start + cnt - 1) // 128
            ELSE start // 128 END AS BIGINT) AS seq_last
FROM c
""",
        # Bloom routing is invisible to semantics: the twin is the plain
        # anti-join on the md5 content key (NULL keys like '', the
        # pinned KEYING convention — coalesce INSIDE the md5)
        "incremental_new_docs": f"""
WITH seen AS (
  SELECT md5(coalesce({_NORM}, '')) AS k
  FROM documents WHERE doc_id % 2 = 0
),
new_batch AS (
  SELECT doc_id, lang, md5(coalesce({_NORM}, '')) AS k
  FROM documents WHERE doc_id % 3 = 0
)
SELECT doc_id, lang FROM new_batch n
WHERE NOT EXISTS (SELECT 1 FROM seen s WHERE s.k = n.k)
""",
        # static type rows restate the parquet schema; data-dependent rows
        # recompute the engine's aggregates with HAVING as emission guard
        # (count(*) > 0 twins the engine's None-on-empty aggregates; enum:
        # 1..16 exact-distinct, to_json == json.dumps(ensure_ascii=False))
        "suggest_constraints": """
SELECT 'doc_id' AS column, 'type' AS keyword, 'integer' AS value
UNION ALL SELECT 'text', 'type', 'string'
UNION ALL SELECT 'lang', 'type', 'string'
UNION ALL SELECT 'source', 'type', 'string'
UNION ALL SELECT 'n_chars', 'type', 'integer'
UNION ALL SELECT 'doc_id', 'required', 'true' FROM documents
  HAVING count(*) > 0 AND count(*) FILTER (doc_id IS NULL) = 0
UNION ALL SELECT 'text', 'required', 'true' FROM documents
  HAVING count(*) > 0 AND count(*) FILTER (text IS NULL) = 0
UNION ALL SELECT 'lang', 'required', 'true' FROM documents
  HAVING count(*) > 0 AND count(*) FILTER (lang IS NULL) = 0
UNION ALL SELECT 'source', 'required', 'true' FROM documents
  HAVING count(*) > 0 AND count(*) FILTER (source IS NULL) = 0
UNION ALL SELECT 'n_chars', 'required', 'true' FROM documents
  HAVING count(*) > 0 AND count(*) FILTER (n_chars IS NULL) = 0
UNION ALL SELECT 'doc_id', 'minimum', CAST(min(doc_id) AS VARCHAR)
  FROM documents HAVING min(doc_id) IS NOT NULL
UNION ALL SELECT 'doc_id', 'maximum', CAST(max(doc_id) AS VARCHAR)
  FROM documents HAVING min(doc_id) IS NOT NULL
UNION ALL SELECT 'n_chars', 'minimum', CAST(min(n_chars) AS VARCHAR)
  FROM documents HAVING min(n_chars) IS NOT NULL
UNION ALL SELECT 'n_chars', 'maximum', CAST(max(n_chars) AS VARCHAR)
  FROM documents HAVING min(n_chars) IS NOT NULL
UNION ALL SELECT 'text', 'minLength', CAST(min(length(text)) AS VARCHAR)
  FROM documents HAVING min(length(text)) IS NOT NULL
UNION ALL SELECT 'text', 'maxLength', CAST(max(length(text)) AS VARCHAR)
  FROM documents HAVING min(length(text)) IS NOT NULL
UNION ALL SELECT 'lang', 'minLength', CAST(min(length(lang)) AS VARCHAR)
  FROM documents HAVING min(length(lang)) IS NOT NULL
UNION ALL SELECT 'lang', 'maxLength', CAST(max(length(lang)) AS VARCHAR)
  FROM documents HAVING min(length(lang)) IS NOT NULL
UNION ALL SELECT 'source', 'minLength', CAST(min(length(source)) AS VARCHAR)
  FROM documents HAVING min(length(source)) IS NOT NULL
UNION ALL SELECT 'source', 'maxLength', CAST(max(length(source)) AS VARCHAR)
  FROM documents HAVING min(length(source)) IS NOT NULL
UNION ALL SELECT 'doc_id', 'unique', 'true' FROM documents
  HAVING count(*) > 0 AND count(*) FILTER (doc_id IS NULL) = 0
     AND count(DISTINCT doc_id) = count(*)
UNION ALL SELECT 'text', 'unique', 'true' FROM documents
  HAVING count(*) > 0 AND count(*) FILTER (text IS NULL) = 0
     AND count(DISTINCT text) = count(*)
UNION ALL SELECT 'lang', 'unique', 'true' FROM documents
  HAVING count(*) > 0 AND count(*) FILTER (lang IS NULL) = 0
     AND count(DISTINCT lang) = count(*)
UNION ALL SELECT 'source', 'unique', 'true' FROM documents
  HAVING count(*) > 0 AND count(*) FILTER (source IS NULL) = 0
     AND count(DISTINCT source) = count(*)
UNION ALL SELECT 'n_chars', 'unique', 'true' FROM documents
  HAVING count(*) > 0 AND count(*) FILTER (n_chars IS NULL) = 0
     AND count(DISTINCT n_chars) = count(*)
UNION ALL SELECT 'text', 'enum',
  '[' || string_agg(to_json(v), ', ' ORDER BY v) || ']'
  FROM (SELECT DISTINCT text AS v FROM documents WHERE text IS NOT NULL)
  HAVING count(*) BETWEEN 1 AND 16
UNION ALL SELECT 'lang', 'enum',
  '[' || string_agg(to_json(v), ', ' ORDER BY v) || ']'
  FROM (SELECT DISTINCT lang AS v FROM documents WHERE lang IS NOT NULL)
  HAVING count(*) BETWEEN 1 AND 16
UNION ALL SELECT 'source', 'enum',
  '[' || string_agg(to_json(v), ', ' ORDER BY v) || ']'
  FROM (SELECT DISTINCT source AS v FROM documents WHERE source IS NOT NULL)
  HAVING count(*) BETWEEN 1 AND 16
""",
        # windows start every stride=24 tokens; trailing window only when
        # start + overlap < n (greatest(1, ceil((n-8)/24)) chunks); list
        # slice toks[a:b] is 1-based inclusive == Spark slice(toks,a,len)
        "chunk_documents": """
WITH d AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
  FROM documents WHERE text IS NOT NULL AND length(trim(text)) > 0
),
c AS (
  SELECT doc_id, toks,
         greatest(1, CAST(ceil((len(toks) - 8) / 24.0) AS BIGINT)) AS nc
  FROM d
)
SELECT doc_id,
       CAST(k AS BIGINT) AS chunk_id,
       array_to_string(toks[k*24+1 : k*24+32], ' ') AS chunk_text,
       CAST(least(32, len(toks) - k*24) AS BIGINT) AS n_tokens
FROM c, unnest(generate_series(0, nc - 1)) AS u(k)
""",
        # engine: explode tokens -> hash agg -> TakeOrdered(size) with
        # the deterministic (n desc, token asc) tie-break
        "vocabulary": """
WITH toks AS (
  SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS token
  FROM documents WHERE text IS NOT NULL
),
counts AS (
  SELECT token, CAST(count(*) AS BIGINT) AS n
  FROM toks WHERE token <> '' GROUP BY token
)
SELECT CAST(row_number() OVER (ORDER BY n DESC, token ASC) - 1 AS BIGINT)
         AS rank,
       token, n
FROM counts
ORDER BY n DESC, token ASC
LIMIT 200
""",
        # engine: unicodedata NFC (Arrow UDF) + regexp_replace chain;
        # DuckDB nfc_normalize is character-identical to unicodedata
        # (pinned in tests/test_normalize.py); suffixes replay the
        # query's deterministic per-residue concat. Step order (NFC ->
        # newlines -> NBSP -> controls) is the module contract.
        "normalize_text": """
SELECT doc_id,
       regexp_replace(
         replace(
           regexp_replace(
             nfc_normalize(
               coalesce(text, '') ||
               CASE WHEN doc_id % 3 = 0 THEN ' Cafe' || chr(769)
                    WHEN doc_id % 3 = 1
                      THEN chr(13) || chr(10) || 'line' || chr(160) || 'x'
                    ELSE chr(7) || 'bell' || chr(127) END),
             '\\r\\n?', chr(10), 'g'),
           chr(160), ' '),
         '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]', '', 'g') AS text_norm
FROM documents
""",
        # engine: window-hash groupBy + min(struct) keep-first + victim
        # coverage anti-join; twin replays keep-first as row_number over
        # (doc_id, pos) — identical order to Spark's min(struct). DuckDB
        # list slice w[i:i+7] is 1-based INCLUSIVE = Spark slice(w, i, 8).
        "substring_dedup": """
WITH toks AS (
  SELECT doc_id, text,
         list_filter(string_split_regex(coalesce(text, ''), '\\s+'),
                     t -> t <> '') AS w
  FROM documents
),
wins AS (
  SELECT doc_id, i - 1 AS pos, md5(array_to_string(w[i:i+7], ' ')) AS h
  FROM toks, unnest(generate_series(1, len(w) - 7)) AS u(i)
  WHERE len(w) >= 8
),
marked AS (
  SELECT doc_id, pos FROM (
    SELECT doc_id, pos,
           row_number() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn
    FROM wins)
  WHERE rn >= 2
),
cov AS (
  SELECT doc_id,
         list_distinct(flatten(list(generate_series(pos, pos + 7)))) AS covered
  FROM marked GROUP BY doc_id
)
SELECT t.doc_id,
  CASE WHEN t.text IS NULL THEN NULL
       WHEN c.doc_id IS NULL THEN t.text
       -- array_to_string([]) is NULL in DuckDB; a fully-victim doc
       -- rebuilds to '' (the engine's coalesce convention)
       ELSE coalesce(array_to_string(
         list_transform(
           list_filter(generate_series(0, len(t.w) - 1),
                       p -> NOT list_contains(c.covered, p)),
           p -> t.w[p + 1]),
         ' '), '')
  END AS text_dedup
FROM toks t LEFT JOIN cov c USING (doc_id)
""",
        # victim intervals via gaps-and-islands over the covered
        # positions (p - row_number() groups consecutive runs)
        "substring_spans": """
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(coalesce(text, ''), '\\s+'),
                     t -> t <> '') AS w
  FROM documents
),
wins AS (
  SELECT doc_id, i - 1 AS pos, md5(array_to_string(w[i:i+7], ' ')) AS h
  FROM toks, unnest(generate_series(1, len(w) - 7)) AS u(i)
  WHERE len(w) >= 8
),
marked AS (
  SELECT doc_id, pos FROM (
    SELECT doc_id, pos,
           row_number() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn
    FROM wins)
  WHERE rn >= 2
),
covpos AS (
  SELECT DISTINCT doc_id, unnest(generate_series(pos, pos + 7)) AS p
  FROM marked
),
isl AS (
  SELECT doc_id, p,
         p - row_number() OVER (PARTITION BY doc_id ORDER BY p) AS g
  FROM covpos
)
SELECT doc_id,
       CAST(min(p) AS BIGINT) AS start_tok,
       CAST(max(p) + 1 AS BIGINT) AS end_tok
FROM isl GROUP BY doc_id, g
""",
        # engine: trim-keyed min-pos per (doc, line) + per-doc ordered
        # rebuild; blanks never keyed. string_agg of zero rows is NULL
        # in DuckDB -> coalesce'd '' (only reachable for all-blank docs)
        "within_doc_line_dedup": """
WITH src AS (
  SELECT doc_id,
         concat_ws(chr(10), text, 'Share this post',
                   'Unique middle ' || CAST(doc_id AS VARCHAR),
                   '  Share this post  ', 'Tail line') AS t
  FROM documents
),
lines AS (
  SELECT doc_id, i - 1 AS pos, l[i] AS raw, trim(l[i]) AS key
  FROM (SELECT doc_id, string_split(coalesce(t, ''), chr(10)) AS l
        FROM src),
       unnest(generate_series(1, len(l))) AS u(i)
),
keeps AS (
  SELECT doc_id, key, min(pos) AS keep_pos
  FROM lines WHERE key <> '' GROUP BY doc_id, key
),
kept AS (
  SELECT l.doc_id, l.pos, l.raw
  FROM lines l LEFT JOIN keeps k USING (doc_id, key)
  WHERE l.key = '' OR l.pos = k.keep_pos
),
reb AS (
  SELECT doc_id, string_agg(raw, chr(10) ORDER BY pos) AS r
  FROM kept GROUP BY doc_id
)
SELECT s.doc_id,
       CASE WHEN s.t IS NULL THEN NULL ELSE coalesce(reb.r, '') END
         AS text_clean
FROM src s LEFT JOIN reb USING (doc_id)
""",
        # engine: train + score in one plan; same _NORM tokens, same
        # add-0.5 smoothing, same history counts (bigram POSITIONS).
        # round(...,6) on both sides absorbs log ulp differences.
        "lm_perplexity": """
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split(
           regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' '),
           t -> t <> '') AS w
  FROM documents
),
bg AS (
  SELECT doc_id, w[i] AS w1, w[i+1] AS w2
  FROM toks, unnest(generate_series(1, len(w) - 1)) AS u(i)
  WHERE len(w) >= 2
),
bgc AS (SELECT w1, w2, count(*) AS nbg FROM bg GROUP BY w1, w2),
ugc AS (SELECT w1, count(*) AS nw1 FROM bg GROUP BY w1),
v AS (SELECT count(DISTINCT t) AS vocab
      FROM (SELECT unnest(w) AS t FROM toks)),
scored AS (
  SELECT b.doc_id, count(*) AS n,
         avg(-log2((coalesce(bgc.nbg, 0) + 0.5)
                   / (coalesce(ugc.nw1, 0) + 0.5 * v.vocab))) AS lp
  FROM bg b LEFT JOIN bgc USING (w1, w2) LEFT JOIN ugc USING (w1), v
  GROUP BY b.doc_id
)
SELECT t.doc_id,
       CAST(coalesce(s.n, 0) AS BIGINT) AS n_bigrams,
       round(s.lp, 6) AS log2_ppl
FROM toks t LEFT JOIN scored s USING (doc_id)
""",
        # engine: same LM lineage as lm_perplexity, bucket by the same
        # FIXED cut points (<= 7.0 -> 0, <= 8.0 -> 1, else 2; NULL
        # score -> NULL bucket). Unrounded scores on both sides: a log
        # ulp difference can only flip a bucket if a score lands
        # EXACTLY on a cut point, which the fixed constants avoid.
        "lm_buckets": """
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split(
           regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' '),
           t -> t <> '') AS w
  FROM documents
),
bg AS (
  SELECT doc_id, w[i] AS w1, w[i+1] AS w2
  FROM toks, unnest(generate_series(1, len(w) - 1)) AS u(i)
  WHERE len(w) >= 2
),
bgc AS (SELECT w1, w2, count(*) AS nbg FROM bg GROUP BY w1, w2),
ugc AS (SELECT w1, count(*) AS nw1 FROM bg GROUP BY w1),
v AS (SELECT count(DISTINCT t) AS vocab
      FROM (SELECT unnest(w) AS t FROM toks)),
scored AS (
  SELECT b.doc_id,
         avg(-log2((coalesce(bgc.nbg, 0) + 0.5)
                   / (coalesce(ugc.nw1, 0) + 0.5 * v.vocab))) AS lp
  FROM bg b LEFT JOIN bgc USING (w1, w2) LEFT JOIN ugc USING (w1), v
  GROUP BY b.doc_id
)
SELECT t.doc_id,
       CASE WHEN s.lp IS NULL THEN NULL
            WHEN s.lp <= 7.0 THEN 0
            WHEN s.lp <= 8.0 THEN 1
            ELSE 2 END AS lm_bucket
FROM toks t LEFT JOIN scored s USING (doc_id)
""",
        # engine: one 2*d-agg stats pass + zip_with projection encode;
        # twin recomputes the same per-dim min/span and affine rounding
        # (IEEE arithmetic bit-identical; round half-away-from-zero in
        # both engines). Compared as array<int> for a clean hash cell.
        "quantized_embeddings": """
WITH stats AS (
  SELECT i, min(CAST(v AS DOUBLE)) AS mn, max(CAST(v AS DOUBLE)) AS mx
  FROM (SELECT unnest(embedding) AS v,
               generate_subscripts(embedding, 1) AS i
        FROM embeddings)
  GROUP BY i
),
arrs AS (
  SELECT list(mn ORDER BY i) AS mins,
         list(mx - mn ORDER BY i) AS spans
  FROM stats
)
SELECT e.vec_id,
       list_transform(
         generate_series(1, len(e.embedding)),
         i -> CASE WHEN a.spans[i] > 0
              THEN CAST(round((CAST(e.embedding[i] AS DOUBLE) - a.mins[i])
                              / a.spans[i] * 255.0) AS INTEGER) - 128
              ELSE 0 END) AS qvec
FROM embeddings e, arrs a
""",
        # engine: quality_flags fused gate over RAW text -> groupBy
        # (lang, source). Thresholds applied to UNROUNDED ratios of
        # exact integers (bit-identical across engines); only
        # integer-derived aggregates are emitted, so no float drift.
        "quality_report": r"""
WITH f AS (
  SELECT doc_id, lang, source, coalesce(text, '') AS text,
    list_filter(regexp_split_to_array(coalesce(text, ''), '\s+'), w -> w <> '') AS words,
    list_filter(string_split(coalesce(text, ''), chr(10)), l -> trim(l) <> '') AS lines,
    list_filter(regexp_split_to_array(coalesce(text, ''), '\n\n+'), p -> trim(p) <> '') AS paras
  FROM documents
),
r AS (
  SELECT doc_id, lang, source, len(words) AS n_words,
    (len(words) >= 50 AND len(words) <= 100000
     AND CASE WHEN len(words) > 0 THEN list_aggregate(list_transform(words, w -> length(w)), 'sum') * 1.0 / len(words) ELSE 0 END >= 3
     AND CASE WHEN len(words) > 0 THEN list_aggregate(list_transform(words, w -> length(w)), 'sum') * 1.0 / len(words) ELSE 0 END <= 10
     AND CASE WHEN len(words) > 0 THEN ((length(text) - length(replace(text, '#', ''))) + len(regexp_extract_all(text, '\.\.\.|…'))) * 1.0 / len(words) ELSE 0 END <= 0.1
     AND CASE WHEN len(lines) > 0 THEN len(list_filter(lines, l -> regexp_matches(trim(l), '^[-*•]'))) * 1.0 / len(lines) ELSE 0 END <= 0.9
     AND CASE WHEN len(lines) > 0 THEN len(list_filter(lines, l -> regexp_matches(trim(l), '(\.\.\.|…)$'))) * 1.0 / len(lines) ELSE 0 END <= 0.3
     AND CASE WHEN len(words) > 0 THEN len(list_filter(words, w -> regexp_matches(w, '[A-Za-z]'))) * 1.0 / len(words) ELSE 0 END >= 0.8
     AND CASE WHEN len(lines) > 0 THEN (len(lines) - len(list_distinct(lines))) * 1.0 / len(lines) ELSE 0 END <= 0.3
     AND CASE WHEN len(paras) > 0 THEN (len(paras) - len(list_distinct(paras))) * 1.0 / len(paras) ELSE 0 END <= 0.3
     AND CASE WHEN list_aggregate(list_transform(lines, x -> length(x)), 'sum') > 0
         THEN list_aggregate(list_transform(lines, x -> CASE WHEN len(list_filter(lines, y -> y = x)) > 1 THEN length(x) ELSE 0 END), 'sum') * 1.0
              / list_aggregate(list_transform(lines, x -> length(x)), 'sum')
         ELSE 0 END <= 0.2
     AND CASE WHEN list_aggregate(list_transform(paras, x -> length(x)), 'sum') > 0
         THEN list_aggregate(list_transform(paras, x -> CASE WHEN len(list_filter(paras, y -> y = x)) > 1 THEN length(x) ELSE 0 END), 'sum') * 1.0
              / list_aggregate(list_transform(paras, x -> length(x)), 'sum')
         ELSE 0 END <= 0.2) AS gopher_keep,
    (len(list_filter(regexp_split_to_array(text, '[.!?]'), s -> trim(s) <> '')) >= 3
     AND NOT contains(lower(text), 'lorem ipsum')
     AND NOT contains(text, '{')) AS c4_keep
  FROM f
)
SELECT lang, source,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(CASE WHEN gopher_keep THEN 1 ELSE 0 END) AS BIGINT) AS n_gopher_keep,
  CAST(sum(CASE WHEN c4_keep THEN 1 ELSE 0 END) AS BIGINT) AS n_c4_keep,
  CAST(sum(CASE WHEN gopher_keep AND c4_keep THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
  ROUND(avg(n_words), 6) AS avg_words
FROM r GROUP BY lang, source
""",
        "script_fractions": _script_fractions_sql,
        "pagerank": _pagerank_sql,
        # histogram: the ks_drift bucket formula (same IEEE op order),
        # zero-count bins from a generate_series spine
        "value_histogram": """
WITH b AS (
  SELECT CAST(min(n_chars) AS DOUBLE) AS lo,
         CAST(max(n_chars) AS DOUBLE) AS hi
  FROM documents
),
c AS (
  SELECT greatest(least(CAST(floor(((CAST(n_chars AS DOUBLE) - b.lo) * 32.0)
                                   / (b.hi - b.lo)) AS BIGINT), 31), 0)
           AS bucket,
         count(*) AS n
  FROM documents, b
  WHERE n_chars IS NOT NULL
    AND CAST(n_chars AS DOUBLE) >= b.lo AND CAST(n_chars AS DOUBLE) <= b.hi
  GROUP BY 1
),
spine AS (SELECT unnest(generate_series(0, 31)) AS bucket)
SELECT CAST(s.bucket AS BIGINT) AS bucket,
       round(b.lo + s.bucket * ((b.hi - b.lo) / 32.0), 6) AS lo,
       round(b.lo + (s.bucket + 1) * ((b.hi - b.lo) / 32.0), 6) AS hi,
       CAST(coalesce(c.n, 0) AS BIGINT) AS n
FROM spine s LEFT JOIN c ON s.bucket = c.bucket, b
""",
        # keep-rate drift: 2x2 chi2 N(ad-bc)^2/margins with the explicit
        # square (no pow), drift flag = constant 6.634897 compare
        "keep_rate_drift": """
WITH o AS (
  SELECT lang, count(*) AS n_old,
         sum(CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END) AS keep_old
  FROM documents GROUP BY lang
),
nn AS (
  SELECT lang, count(*) AS n_new,
         sum(CASE WHEN n_chars >= 350 THEN 1 ELSE 0 END) AS keep_new
  FROM documents WHERE doc_id % 3 <> 0 GROUP BY lang
),
j AS (
  SELECT coalesce(o.lang, nn.lang) AS lang,
         CAST(coalesce(n_old, 0) AS BIGINT) AS n_old,
         CAST(coalesce(keep_old, 0) AS BIGINT) AS keep_old,
         CAST(coalesce(n_new, 0) AS BIGINT) AS n_new,
         CAST(coalesce(keep_new, 0) AS BIGINT) AS keep_new
  FROM o FULL OUTER JOIN nn ON o.lang IS NOT DISTINCT FROM nn.lang
),
m AS (
  SELECT *,
         CAST(keep_old AS DOUBLE) AS a,
         CAST(n_old - keep_old AS DOUBLE) AS b,
         CAST(keep_new AS DOUBLE) AS c,
         CAST(n_new - keep_new AS DOUBLE) AS d
  FROM j
),
s AS (
  SELECT *,
         CASE WHEN (a+b)*(c+d)*(a+c)*(b+d) > 0
              THEN (a+b+c+d) * ((a*d - b*c) * (a*d - b*c))
                   / ((a+b)*(c+d)*(a+c)*(b+d))
              ELSE 0.0 END AS chi2_raw
  FROM m
)
SELECT lang, n_old, keep_old, n_new, keep_new,
       round(CASE WHEN n_old > 0 THEN a / (a+b) END, 6) AS rate_old,
       round(CASE WHEN n_new > 0 THEN c / (c+d) END, 6) AS rate_new,
       round((CASE WHEN n_new > 0 THEN c / (c+d) END)
             - (CASE WHEN n_old > 0 THEN a / (a+b) END), 6) AS delta_rate,
       round(chi2_raw, 6) AS chi2,
       chi2_raw > 6.634897 AS drifted
FROM s
""",
        # paragraph dedup: same constructed corpus; hot = trimmed
        # paragraphs in >= 2 distinct docs; rebuild = in-order kept
        # trimmed blocks joined by the canonical blank line
        "paragraph_dedup": """
WITH c AS (
  SELECT doc_id,
         'shared intro paragraph' || chr(10) || chr(10) || text
         || chr(10) || chr(10) || substr(text, 1, 25)
         || chr(10) || chr(10)
         || CASE WHEN doc_id % 2 = 0 THEN 'footer alpha'
                 ELSE 'footer beta' END AS text
  FROM documents WHERE doc_id < 300
),
p AS (
  SELECT doc_id,
         trim(unnest(regexp_split_to_array(text, '\\n\\n+'))) AS para
  FROM c
),
hot AS (
  SELECT para FROM p WHERE para <> ''
  GROUP BY para HAVING count(DISTINCT doc_id) >= 2
),
h AS (SELECT coalesce(list(para), []) AS hot_list FROM hot)
SELECT c.doc_id,
       array_to_string(
         list_filter(
           list_transform(regexp_split_to_array(c.text, '\\n\\n+'),
                          x -> trim(x)),
           x -> x <> '' AND NOT list_contains(h.hot_list, x)),
         chr(10) || chr(10)) AS text
FROM c, h
""",
        # containment: same corpus synthesis (first-12-raw-token
        # fragments of docs < 40 cloned at +100000), distinct-3-shingle
        # sets with the whole-text fallback (the _SHINGLES convention),
        # both directions rounded 6dp; pairs need >= 1 shared shingle
        # (threshold 0.9 subsumes it)
        "ngram_containment": f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents WHERE doc_id < 200
  UNION ALL
  SELECT doc_id + 100000,
         array_to_string(regexp_split_to_array(text, '\\s+')[1:12], ' ')
  FROM documents WHERE doc_id < 40
),
s AS (SELECT doc_id, {_SHINGLES} AS sh FROM corpus),
p AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         len(list_intersect(a.sh, b.sh)) AS inter,
         len(a.sh) AS na, len(b.sh) AS nb
  FROM s a JOIN s b ON a.doc_id < b.doc_id
)
SELECT id_a, id_b,
       round(inter * 1.0 / na, 6) AS containment_a_in_b,
       round(inter * 1.0 / nb, 6) AS containment_b_in_a
FROM p
WHERE round(inter * 1.0 / na, 6) >= 0.9
   OR round(inter * 1.0 / nb, 6) >= 0.9
""",
        # group samples: identical hash-prefix order (8 hex chars, then
        # key) on both engines
        "group_samples": """
WITH r AS (
  SELECT lang, doc_id,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY substr(md5(CAST(doc_id AS VARCHAR) || ':0'), 1, 8),
                    doc_id) AS sample_rank
  FROM documents
)
SELECT lang, CAST(sample_rank AS INTEGER) AS sample_rank, doc_id
FROM r WHERE sample_rank <= 3
""",
        # temperature mixture: rates re-derived algorithmically —
        # alpha=0.5 keeps every step exactly rounded (sqrt, sorted-order
        # left fold, mul/div/min/trunc), so the per-stratum thresholds
        # are bit-identical to the engine's threshold_hex(rate) strings.
        "temperature_mixture": """
WITH c AS (
  SELECT lang, count(*) AS n FROM documents
  WHERE lang IS NOT NULL GROUP BY lang
),
tot AS (SELECT sum(n) AS n_total FROM c),
w AS (
  SELECT list_aggregate(list(sqrt(CAST(n AS DOUBLE)) ORDER BY lang),
                        'sum') AS wsum
  FROM c
),
r AS (
  SELECT lang,
         least(1.0, (0.35 * CAST(tot.n_total AS DOUBLE))
                    * (sqrt(CAST(n AS DOUBLE)) / w.wsum)
                    / CAST(n AS DOUBLE)) AS rate
  FROM c, tot, w
)
SELECT d.doc_id, d.lang
FROM documents d JOIN r ON d.lang = r.lang
WHERE r.rate >= 1.0
   OR substr(md5(CAST(d.doc_id AS VARCHAR) || ':0'), 1, 8)
      < lpad(lower(to_hex(CAST(trunc(r.rate * 4294967296.0) AS BIGINT))), 8, '0')
""",
        # positional index twins: words are the _NORM tokens; positions
        # are 0-based token offsets (generate_series is 1-based, hence
        # the i-1). Fully algorithmic — no snapshot.
        "index_postings": f"""
WITH w AS (
  SELECT doc_id, list_filter({_WORDS}, x -> x <> '') AS words
  FROM documents
),
p AS (
  SELECT doc_id AS doc,
         list_filter(list_transform(generate_series(1, len(words)),
                                    i -> CASE WHEN words[i] = 'customer'
                                              THEN CAST(i - 1 AS INTEGER)
                                              END),
                     x -> x IS NOT NULL) AS positions
  FROM w
)
SELECT doc, positions, CAST(len(positions) AS INTEGER) AS n
FROM p WHERE len(positions) > 0
""",
        "phrase_search": f"""
WITH w AS (
  SELECT doc_id, list_filter({_WORDS}, x -> x <> '') AS words
  FROM documents
),
p AS (
  SELECT doc_id AS doc,
         list_filter(list_transform(generate_series(1, len(words) - 1),
                                    i -> CASE WHEN words[i] = 'fast'
                                               AND words[i+1] = 'key'
                                              THEN CAST(i - 1 AS INTEGER)
                                              END),
                     x -> x IS NOT NULL) AS starts
  FROM w WHERE len(words) >= 2
)
SELECT doc, CAST(len(starts) AS INTEGER) AS n_matches,
       CAST(list_min(starts) AS INTEGER) AS first_pos
FROM p WHERE len(starts) > 0
""",
        # tf = raw per-doc term count; df = docs containing the term
        # (derived from the per-doc counts, no DISTINCT); smooth idf
        # ln((1+N)/(1+df)) + 1; 6dp rounding both sides absorbs ln ulp
        # differences (the lm_perplexity convention). Rank over the
        # ROUNDED score with the token-asc tie-break on both engines.
        "doc_keywords": f"""
WITH toks AS (
  SELECT doc_id, unnest(list_filter({_WORDS}, w -> w <> '')) AS token
  FROM documents
),
tc AS (SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY 1, 2),
dfreq AS (
  SELECT token, count(*) AS df FROM tc GROUP BY 1 HAVING count(*) >= 2
),
n AS (SELECT count(*) AS n_docs FROM documents),
s AS (
  SELECT tc.doc_id, tc.token, tc.tf, dfreq.df,
         round(tc.tf * (ln((1.0 + n.n_docs) / (1.0 + dfreq.df)) + 1.0), 6)
           AS tfidf
  FROM tc JOIN dfreq USING (token), n
),
r AS (
  SELECT doc_id, token, tfidf,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY tfidf DESC, token ASC) AS rank
  FROM s
)
SELECT doc_id, CAST(rank AS INTEGER) AS rank, token, tfidf
FROM r WHERE rank <= 3
""",
        # Golden snapshots, NOT SQL re-derivations (the ann_ivf_partial
        # convention): BPE training is an iterative merge loop, but its
        # output on a fixed corpus + params is a fixed table — exact
        # integer counts, deterministic tie-breaks, parallelism-
        # independence pinned local[8] == local[32] in tests.
        "bpe_merges": """
SELECT CAST(rank AS BIGINT) AS rank, left_sym, right_sym
FROM (VALUES (0, 'e', 'r</w>'),
             (1, 'o', 'w</w>'),
             (2, 't', 'o'),
             (3, 'a', 't'),
             (4, 'l', 'u'),
             (5, 'a', 's'),
             (6, 'i', 'n'),
             (7, 'e', 'r'),
             (8, 'o', 'r'),
             (9, 'a', 'r'),
             (10, 'p', 'ar'),
             (11, 'i', 'n</w>'),
             (12, 'j', 'o'),
             (13, 'jo', 'in</w>'),
             (14, 'as', 'h</w>'),
             (15, 'h', 'ash</w>'),
             (16, 'r', 'ow</w>'),
             (17, 'at', 'c'),
             (18, 'atc', 'h</w>'),
             (19, 'b', 'atch</w>'),
             (20, 'a', 'n</w>'),
             (21, 'c', 'an</w>'),
             (22, 's', 'can</w>'),
             (23, 'c', 'o'),
             (24, 'c', 'u'),
             (25, 'co', 'lu'),
             (26, 'colu', 'm'),
             (27, 'colum', 'n</w>'),
             (28, 'cu', 's'),
             (29, 'cus', 'to'),
             (30, 'custo', 'm'),
             (31, 'custom', 'er</w>'),
             (32, 'f', 'i'),
             (33, 'fi', 'l'),
             (34, 'fil', 't'),
             (35, 'filt', 'er</w>'),
             (36, 'a', 'l'),
             (37, 'al', 'l</w>'),
             (38, 'm', 'all</w>'),
             (39, 's', 'mall</w>')) AS t(rank, left_sym, right_sym)
""",
        "bpe_tokens_sample": """
SELECT CAST(doc_id AS BIGINT) AS doc_id, bpe_text,
       CAST(n_bpe AS INTEGER) AS n_bpe
FROM (VALUES
  (0, 'k e y</w> a g g</w> row</w> scan</w> s l ow</w> f as t</w> t a b l e</w> v a lu e</w> par t</w> hash</w> v a lu e</w> t a b l e</w> par t</w> a</w> row</w> f as t</w> m er g e</w> batch</w> par t</w> v a lu e</w> f as t</w> s par k</w> a</w> a</w> t h e</w> l in e</w> s or t</w> t a b l e</w> w in d ow</w> t a b l e</w> t a b l e</w> k e y</w>', 92),
  (1, 'batch</w> w in d ow</w> s par k</w> or d er</w> d at a</w> column</w> a g g</w> join</w> small</w> l in e</w> customer</w> q u er y</w> l in e</w> v a lu e</w> a</w> t a b l e</w> customer</w> f as t</w> k e y</w> scan</w> q u er y</w> b i g</w> t a b l e</w> t a b l e</w> par t</w> a g g</w> or d er</w> scan</w> s t r e a m</w> f as t</w> or d er</w> g r o u p</w> v a lu e</w> s or t</w> column</w> q u er y</w> b i g</w> q u er y</w> v a lu e</w> customer</w> s t r e a m</w> w in d ow</w> s t r e a m</w> s or t</w> q u er y</w> l in e</w> w in d ow</w> batch</w> customer</w> join</w> m er g e</w> v a lu e</w> s par k</w> par t</w> filter</w> q u er y</w> k e y</w> scan</w> s or t</w> a</w> scan</w> s par k</w> f as t</w> s or t</w> k e y</w> a g g</w> q u er y</w> t h e</w> g r o u p</w> l in e</w> t a b l e</w> or d er</w>', 214),
  (2, 'small</w> f as t</w> s l ow</w> filter</w> v a lu e</w> small</w> v a lu e</w> t a b l e</w> t h e</w> par t</w> d at a</w> w in d ow</w> t h e</w> row</w> a</w> w in d ow</w> d at a</w> a</w> scan</w> g r o u p</w> b i g</w> v e c to r</w> t a b l e</w> f as t</w> batch</w> batch</w> a g g</w> w in d ow</w> customer</w> l in e</w> s l ow</w> t a b l e</w> filter</w> scan</w> scan</w> s l ow</w> small</w> g r o u p</w> f as t</w> column</w> scan</w> d at a</w> g r o u p</w> s par k</w> v a lu e</w>', 122),
  (3, 'w in d ow</w> m er g e</w> s par k</w> m er g e</w> batch</w> t a b l e</w> a</w> b i g</w> a</w> join</w> batch</w> t a b l e</w> w in d ow</w> b i g</w> t h e</w> join</w> l in e</w> a g g</w> small</w> s l ow</w> small</w> s t r e a m</w> customer</w> g r o u p</w> s par k</w> d at a</w> v e c to r</w>', 78),
  (4, 'd at a</w> q u er y</w> small</w> row</w> s l ow</w> row</w> d at a</w> s t r e a m</w> filter</w> small</w> s or t</w> hash</w> s t r e a m</w> batch</w> b i g</w> b i g</w> g r o u p</w> or d er</w> column</w> par t</w> t a b l e</w> s t r e a m</w> g r o u p</w> t a b l e</w> join</w> batch</w> join</w> w in d ow</w> w in d ow</w> f as t</w> a g g</w> l in e</w> or d er</w> g r o u p</w> s par k</w> w in d ow</w> par t</w> a g g</w> t h e</w> column</w> l in e</w> t h e</w> d at a</w> row</w> customer</w>', 128),
  (5, 'a g g</w> t a b l e</w> s par k</w> hash</w> s or t</w> k e y</w> v e c to r</w> f as t</w> join</w> v a lu e</w> d at a</w> a g g</w> q u er y</w> f as t</w> w in d ow</w> batch</w> filter</w> q u er y</w> t h e</w> g r o u p</w> v e c to r</w> l in e</w> a g g</w> v e c to r</w> l in e</w> hash</w> a g g</w> q u er y</w> column</w> batch</w> customer</w> l in e</w> column</w> small</w> s t r e a m</w> join</w> m er g e</w> scan</w> batch</w> s l ow</w> hash</w> d at a</w> s or t</w> column</w> l in e</w> b i g</w> g r o u p</w> s t r e a m</w> small</w> s t r e a m</w> or d er</w> small</w> k e y</w> scan</w> g r o u p</w> l in e</w>', 161),
  (6, 'a g g</w> small</w> scan</w> t a b l e</w> g r o u p</w> scan</w> or d er</w> row</w> m er g e</w> scan</w> par t</w> hash</w> scan</w> g r o u p</w> f as t</w>', 37),
  (7, 'batch</w> w in d ow</w> v e c to r</w> hash</w> f as t</w> par t</w> w in d ow</w> t h e</w> s t r e a m</w> k e y</w> column</w> batch</w> filter</w> m er g e</w> filter</w> k e y</w> par t</w> hash</w> customer</w> scan</w> l in e</w> g r o u p</w> scan</w> f as t</w> s par k</w> scan</w> v e c to r</w> or d er</w> s l ow</w> small</w> d at a</w> column</w> scan</w> filter</w> d at a</w> join</w> small</w> s l ow</w> t h e</w> join</w> s or t</w> d at a</w> v e c to r</w> row</w> customer</w> join</w> v e c to r</w> t h e</w> s l ow</w> or d er</w> a g g</w> or d er</w> m er g e</w> hash</w> d at a</w> a g g</w> l in e</w> v a lu e</w> scan</w> scan</w> s l ow</w> join</w> b i g</w> or d er</w> scan</w> customer</w> scan</w> or d er</w> t h e</w> customer</w> k e y</w> s l ow</w>', 174)) AS t(doc_id, bpe_text, n_bpe)
""",
    }
