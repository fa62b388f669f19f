"""Benchmark harness (driver contract).

Runs headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "docs_per_sec": ...}

The flagship query is the north-rule workload: single-pass schema validation
(verdicts + violations) over a synthesized Common-Crawl-style webpages table
sized to the scale factor.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def guess_sf(sf_dir: str) -> float:
    name = Path(sf_dir).name
    try:
        return float(name.replace("sf", ""))
    except ValueError:
        return 0.1


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    sf = guess_sf(SF_DIR)
    n_pages = max(int(5_000_000 * sf), 1000)  # sf0.1 -> 500k synthesized pages

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("jsonschemaparse-spark-bench")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry
    from jsonschemaparse_spark.plans import validate_dataframe
    from jsonschemaparse_spark.sources import synthesize_webpages

    timings: dict[str, float] = {}
    RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
    WARMUP = int(os.environ.get("SPARK_GRAFT_BENCH_WARMUP", "1"))

    def bench(name: str, fn) -> None:
        # Methodology (VERDICT r3 #1, adjudicated by scripts/warm_ab.py):
        # 1. One forced full GC FIRST: earlier queries' humongous
        #    allocations otherwise bleed GC pressure into later entries.
        #    (scripts/warm_ab.py adjudicated the r3 warm regression: 8
        #    interleaved paired rounds, gc-then-timed vs gc-warmup-timed,
        #    paired delta median 0.087 s ~ 0 — the forced GC does NOT
        #    penalize the timed run; the r3 1.49 s sample was JIT tiering
        #    depth + host phase, both conditions converge to ~0.98 s.)
        # 2. WARMUP untimed passes (default 1) after the GC so timed runs
        #    measure steady state — cold first samples charge C2 tiering
        #    to the engine (warm_ab round 1 read 3.0-3.9 s vs the ~1.0 s
        #    steady state; dedup_minhash read 4.3 s cold vs ~2.8 s).
        # 3. best-of-N timed runs (default 2): this host throttles in
        #    minutes-long phases (walls 2-4x apart for identical runs —
        #    NOTES.md #5); min is the phase-robust estimator VERDICT r2
        #    endorsed. Reported figures are steady-state engine cost.
        spark._jvm.System.gc()
        for _ in range(max(WARMUP, 0)):
            fn()
        walls = []
        for _ in range(max(RUNS, 1)):
            t0 = time.perf_counter()
            fn()
            walls.append(time.perf_counter() - t0)
        timings[name] = round(min(walls), 3)

    # Pre-fork the Python worker pool (one trivial Arrow batch) so per-query
    # timings measure engine cost, not the one-time worker spawn. Noted in
    # BASELINE.md: r1 numbers charged the spawn to the first Arrow query.
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _warm(s):
        return s

    spark.range(32).select(_warm("id")).collect()

    # flagship: synthesize + validate webpages (docs/sec basis)
    def flagship():
        pages = synthesize_webpages(spark, n_pages, partitions=CPUS * 2)
        res = validate_dataframe(pages, entry.WEBPAGE_RULES, key_cols=["url"])
        res.verdicts().collect()

    bench("validate_webpages", flagship)

    # warm validation-only throughput: pages materialized once, the pass
    # itself timed (the docs/sec basis comparable to SCALING.md)
    import tempfile

    pages_dir = tempfile.mkdtemp(prefix="bench_pages_")
    synthesize_webpages(spark, n_pages, partitions=CPUS * 2).write.mode(
        "overwrite"
    ).parquet(pages_dir)
    mat = spark.read.parquet(pages_dir)
    validate_dataframe(mat, entry.WEBPAGE_RULES, key_cols=["url"]).verdicts().collect()

    def flagship_warm():
        res = validate_dataframe(mat, entry.WEBPAGE_RULES, key_cols=["url"])
        res.verdicts().collect()

    bench("validate_webpages_warm", flagship_warm)

    # table validation on shipped documents
    def docs_validation():
        df = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        res = validate_dataframe(df, entry.DOC_RULES, key_cols=["doc_id"])
        res.verdicts().collect()

    bench("validate_documents", docs_validation)

    # JSON-payload validation over events.props (Arrow kernel path)
    def json_validation():
        from jsonschemaparse_spark.plans import validate_json_column

        ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
        res = validate_json_column(ev, "props", entry.EVENT_PROPS_RULES, key_cols=["event_id"])
        res.annotated.select(F.sum(F.when(F.col("_jsp_valid"), 0).otherwise(1))).collect()

    bench("validate_json_events", json_validation)

    # same payload through the from_json JVM fast path (contrast with Arrow)
    def json_typed():
        from jsonschemaparse_spark.plans import validate_json_typed

        ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
        res = validate_json_typed(ev, "props", entry.EVENT_PROPS_RULES,
                                  "struct<k:long>", key_cols=["event_id"])
        res.annotated.select(F.sum(F.when(F.col("_jsp_valid"), 0).otherwise(1))).collect()

    bench("validate_json_events_typed", json_typed)

    # dedup: minhash near-dup pipeline over documents
    def dedup():
        from jsonschemaparse_spark.functions.dedup import minhash_near_duplicates

        df = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        minhash_near_duplicates(df, "doc_id", threshold=0.8).count()

    bench("dedup_minhash", dedup)

    # same pipeline, xxhash64 shingle hashing (the at-scale configuration:
    # skips shingle-string construction; not DuckDB-reproducible, hence
    # benched but not oracled — VERDICT r2 #6)
    def dedup_fast():
        from jsonschemaparse_spark.functions.dedup import minhash_near_duplicates

        df = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        minhash_near_duplicates(df, "doc_id", threshold=0.8, hash_mode="fast").count()

    bench("dedup_minhash_fast", dedup_fast)

    # simhash fingerprints (pure Column expression since r2)
    def simhash_bench():
        from jsonschemaparse_spark.functions.dedup import simhash

        df = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        simhash(df, "doc_id").select(F.sum(F.col("simhash").bitwiseAND(F.lit(1)))).collect()

    bench("simhash_documents", simhash_bench)

    # cleaning gates: separate Gopher / C4 projections vs the r6 FUSED
    # single-projection gate — fusion buys one scan + shared-tokenization
    # CSE; expect fused ~= gopher + c4's unique work, below the sum
    # (adjudicated: scripts/gate_ab.py, fused/sum median 0.91 at sf0.1)
    def gate_gopher():
        from jsonschemaparse_spark.functions.text import gopher_quality_flags

        df = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        gopher_quality_flags(df).select(
            F.sum(F.when(F.col("gopher_keep"), 1))).collect()

    bench("gate_gopher", gate_gopher)

    def gate_c4():
        from jsonschemaparse_spark.functions.text import c4_quality_flags

        df = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        c4_quality_flags(df).select(
            F.sum(F.when(F.col("c4_keep"), 1))).collect()

    bench("gate_c4", gate_c4)

    def gate_fused():
        from jsonschemaparse_spark.functions.text import quality_flags

        df = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        quality_flags(df).select(
            F.sum(F.when(F.col("quality_keep"), 1))).collect()

    bench("gate_fused", gate_fused)

    # benchmark decontamination (r6): eval set = first-20-word prefixes of
    # 1-in-40 docs; corpus explode -> broadcast gram join -> flag join.
    def decontaminate_bench():
        from jsonschemaparse_spark.functions.decontaminate import (
            contamination_flags,
        )

        df = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        words = F.filter(
            F.split(F.regexp_replace(F.lower(F.trim("text")), r"\s+", " "), " "),
            lambda w: w != F.lit(""),
        )
        evalset = df.where(F.col("doc_id") % 40 == 0).select(
            F.array_join(F.slice(words, 1, 20), " ").alias("text"))
        contamination_flags(df, evalset, "doc_id").select(
            F.sum(F.when(F.col("contaminated"), 1))).collect()

    bench("decontaminate", decontaminate_bench)

    # PII scrub (r6): counts + typed-token redaction, one codegen Project
    # over the corpus scan (no Python, no shuffle)
    def pii_scrub_bench():
        from jsonschemaparse_spark.functions.pii import pii_flags, redact_pii

        df = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        pii_flags(redact_pii(df, out_col="red")).select(
            F.sum(F.when(F.col("has_pii"), 1))).collect()

    bench("pii_scrub", pii_scrub_bench)

    # deterministic stratified sampling (r6): narrow md5-threshold Filter —
    # the at-scale mixture-weighting path (zero shuffle)
    def mixture_sample_bench():
        from jsonschemaparse_spark.functions.sampling import stratified_sample

        df = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        stratified_sample(
            df, {"en": 0.9, "de": 0.5, "fr": 0.25, "es": 1.0}, "lang",
            "doc_id", seed=11, default_fraction=0.15).count()

    bench("mixture_sample", mixture_sample_bench)

    # hashed linear quality classifier (r6): one codegen projection over
    # the corpus scan (fastText-style plumbing, no Python, no shuffle)
    def classifier_bench():
        from jsonschemaparse_spark.functions.classifier import classify_quality

        df = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        classify_quality(df, threshold=0.01).select(
            F.sum(F.when(F.col("classifier_keep"), 1))).collect()

    bench("classifier_scores", classifier_bench)

    # sequence packing (r6): two-stage block prefix sum — tiny totals agg
    # + collect, then parallel per-block windowed cumsum (no global sort)
    def pack_bench():
        from jsonschemaparse_spark.functions.packing import pack_sequences
        from jsonschemaparse_spark.functions.text import token_count

        df = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
            "doc_id", token_count(F.col("text")).alias("n_tokens"))
        pack_sequences(df, "doc_id", "n_tokens", seq_len=2048).select(
            F.max("seq_last")).collect()

    bench("pack_sequences", pack_bench)

    # re-crawl dedup (r6): struct-max hash aggregate per URL key
    def latest_capture_bench():
        from jsonschemaparse_spark.functions.web import latest_capture

        ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
        caps = ev.select(
            F.concat(F.lit("https://h"), (F.col("event_id") % 7).cast("string"),
                     F.lit(".test/p/"),
                     (F.col("event_id") % 100000).cast("string")).alias("url"),
            "ts", "event_id", "event_type")
        # probe reads payload fields: a bare .count() lets ColumnPruning
        # strip the max(struct) aggregate and times a cheaper query
        # (review finding)
        latest_capture(caps, url_col="url", ts_col="ts",
                       id_col="event_id").select(
            F.min("ts"), F.sum("event_id")).collect()

    bench("latest_capture", latest_capture_bench)

    # incremental snapshot dedup: batch (events-derived texts) vs the
    # documents corpus as the seen snapshot, bloom-routed (r6)
    def incremental_bench():
        from jsonschemaparse_spark.functions.snapshot import incremental_dedup

        seen = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
        # batch: half re-crawls of seen texts (joined by key mod), half
        # fresh event-derived texts — realistic dup mix at events scale
        n_docs = seen.count()
        recrawl = (
            ev.filter(F.col("event_id") % 2 == 0)
            .withColumn("_k", F.col("event_id") % n_docs)
            .join(seen.select(F.col("doc_id").alias("_k"), "text"), on="_k")
            .select((F.col("event_id") + 10_000_000).alias("doc_id"), "text")
        )
        fresh = ev.filter(F.col("event_id") % 2 == 1).select(
            (F.col("event_id") + 20_000_000).alias("doc_id"),
            F.concat(F.lit("fresh "), F.col("props")).alias("text"))
        batch = recrawl.unionByName(fresh)
        incremental_dedup(batch, seen).count()

    bench("incremental_dedup", incremental_bench)

    # unicode canonicalization: ASCII fast path on 2/3 of rows (CRLF is
    # ASCII \u2014 it exercises the JVM newline step while str.isascii()
    # skips the Python normalize; r6 review: an NBSP here made EVERY
    # row take the slow path, overstating the production Python cost),
    # real decomposed suffix on the rest
    def normalize_bench():
        from jsonschemaparse_spark.functions.normalize import normalize_text

        d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        raw = F.concat(
            F.coalesce(F.col("text"), F.lit("")),
            F.when(F.col("doc_id") % 3 == 0, F.lit(" Cafe\u0301"))
             .otherwise(F.lit("\r\nplain ascii tail.")))
        out = normalize_text(d.select("doc_id", raw.alias("text")))
        out.select(F.sum(F.length("text"))).collect()

    bench("normalize_text", normalize_bench)

    # exact substring dedup (Lee et al. ExactSubstr, windowed): one
    # (doc, pos, hash) shuffle + victim join-back + touched-only rebuild
    def substring_bench():
        from jsonschemaparse_spark.functions.dedup import (
            remove_duplicate_substrings,
        )

        df = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        out = remove_duplicate_substrings(df, "doc_id", min_tokens=8)
        out.select(F.sum(F.length("text"))).collect()

    bench("substring_dedup", substring_bench)

    # bigram-LM perplexity: train once outside the timed region (the
    # production shape — the model is trained on a reference corpus,
    # broadcast, and reused), score the corpus per pass
    from jsonschemaparse_spark.functions.lm import (
        lm_perplexity,
        train_bigram_lm,
    )

    _lm_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    _lm = train_bigram_lm(_lm_docs, id_col="doc_id")

    def lm_bench():
        out = lm_perplexity(_lm_docs, _lm, "doc_id")
        out.select(F.sum("n_bigrams"), F.avg("log2_ppl")).collect()

    bench("lm_perplexity", lm_bench)

    # BPE: train once outside the timed region (model is a published
    # artifact, the lm_perplexity convention), encode the corpus per pass
    from jsonschemaparse_spark.functions.tokenizer import bpe_encode, train_bpe

    _bpe = train_bpe(_lm_docs, n_merges=200, min_count=2)

    def bpe_bench():
        out = bpe_encode(_lm_docs, _bpe)
        out.select(F.sum(F.size("bpe_tokens"))).collect()

    bench("bpe_encode", bpe_bench)

    # TF-IDF keyword extraction: explode + (doc, token) agg + broadcast
    # df join + per-doc window
    def keywords_bench():
        from jsonschemaparse_spark.functions.tfidf import top_keywords

        df = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        out = top_keywords(df, k=3, min_df=2)
        out.select(F.count(F.lit(1)), F.sum("tfidf")).collect()

    bench("doc_keywords", keywords_bench)

    # fixed-iteration PageRank over a deterministic 50k-node link graph
    def pagerank_bench():
        from jsonschemaparse_spark.functions.graph import pagerank

        d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        n = d.count()
        edges = d.select(
            F.col("doc_id").alias("src"),
            ((F.col("doc_id") * 7 + 3) % n).alias("dst"),
        ).unionByName(d.select(
            F.col("doc_id").alias("src"),
            (F.col("doc_id") % 100).alias("dst")))
        # 4 rounds in the bench: per-round cost is flat (each round is
        # the same join+agg+checkpoint), so 4 prices the per-round
        # shape without doubling the suite's wall on an 8-round run
        pr = pagerank(edges, n_iters=4)
        pr.select(F.sum("rank"), F.max("rank")).collect()

    bench("pagerank", pagerank_bench)

    # positional inverted index build (the corpus-scan-bound op; a
    # production run materializes this bucketed by token, searches are
    # then partition-pruned ms-scale lookups)
    def index_bench():
        from jsonschemaparse_spark.functions.index import build_inverted_index

        df = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        idx = build_inverted_index(df, max_postings=25000)
        idx.postings.select(F.count(F.lit(1)), F.sum("n")).collect()

    bench("inverted_index", index_bench)

    # stats profile
    def stats():
        from jsonschemaparse_spark.functions.stats import column_profile

        df = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        column_profile(df).collect()

    bench("stats_profile", stats)

    # similarity: brute-force ANN top-k
    def ann():
        from jsonschemaparse_spark.functions.similarity import brute_force_topk

        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        q = emb.filter(F.col("vec_id") == 0).first()["embedding"]
        brute_force_topk(emb, q, k=10).collect()

    bench("ann_topk", ann)

    # referential integrity anti-join
    def referential():
        from jsonschemaparse_spark.functions.integrity import referential_violations

        orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
        customer = spark.read.parquet(f"{SF_DIR}/customer.parquet")
        referential_violations(orders, "o_custkey", customer, "c_custkey").count()

    bench("referential_check", referential)

    total = round(sum(timings.values()), 3)
    docs_per_sec = round(n_pages / timings["validate_webpages"], 1)
    docs_per_sec_warm = round(n_pages / timings["validate_webpages_warm"], 1)
    print(
        json.dumps(
            {
                "metric": "validated documents/sec (single-pass schema validation over "
                          "Common-Crawl-style webpages) + headline op latencies",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "n_pages": n_pages,
                "docs_per_sec": docs_per_sec,
                "docs_per_sec_warm": docs_per_sec_warm,
                "cpus": CPUS,
                "runs_per_query": max(RUNS, 1),
                "warmup_per_query": max(WARMUP, 0),
                "estimator": ("min" if RUNS > 1 else "single")
                             + ("+warmup" if WARMUP > 0 else ""),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
