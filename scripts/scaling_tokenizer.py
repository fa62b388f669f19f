"""10x smoke for the r6 retrieval/tokenizer family — two-point scale
evidence for (a) BPE encoding and (b) inverted-index build + phrase
search.

Corpus: n docs of 40 tokens from a hash-derived vocabulary with a
zipf-ish split (half the positions from a small frequent space — the
r5 smoke-corpus lesson), plus a known two-token phrase planted in
docs where doc_id % 1000 == 7 so phrase recall is verifiable
in-measure.

Expectations verified in-measure, columnar:
  * BPE decode round-trips the normalized text for every doc (the
    byte-identity control the line/span smokes use);
  * bpe_encode is ZERO shuffle (pure map);
  * phrase search returns exactly the planted docs;
  * index build shuffle B/doc ~constant 500k -> 5M.

Run:  python scripts/scaling_tokenizer.py [n_big] [n_small]
Prints one JSON line; paste into SCALING.md.
"""

from __future__ import annotations

import json
import sys
import tempfile
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

N_BIG = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
N_SMALL = int(sys.argv[2]) if len(sys.argv) > 2 else 500_000
N_TRAIN = 100_000
TOKENS_PER_DOC = 40
CPUS = 32
PHRASE = "planted phrasemark"


def _shuffle_totals(spark) -> tuple[int, int]:
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    url = f"{ui}/api/v1/applications/{app_id}/stages"
    with urllib.request.urlopen(url, timeout=10) as r:
        stages = json.load(r)
    return (sum(s.get("shuffleReadBytes", 0) for s in stages),
            sum(s.get("shuffleWriteBytes", 0) for s in stages))


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from jsonschemaparse_spark.functions.dedup import normalized_text
    from jsonschemaparse_spark.functions.index import (
        build_inverted_index,
        search_phrase,
    )
    from jsonschemaparse_spark.functions.tokenizer import (
        bpe_decode_col,
        bpe_encode,
        train_bpe,
    )

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("scaling-tokenizer")
        .config("spark.sql.shuffle.partitions", str(CPUS * 4))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.driver.extraJavaOptions",
                "-XX:+UseParallelGC -XX:+AlwaysPreTouch")
        .config("spark.ui.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    def corpus_dir(n: int) -> str:
        ids = spark.range(0, n, 1, CPUS * 2)
        i = F.col("id")

        def tok(t: int, space: int, tag: str):
            return F.concat(
                F.lit(tag),
                (F.abs(F.xxhash64(i * TOKENS_PER_DOC + t)) % space)
                .cast("string"))

        words = [
            tok(t, 1_000, "f") if t % 2 == 0 else tok(t, 50_000, "w")
            for t in range(TOKENS_PER_DOC - 2)
        ]
        planted = F.when(i % 1000 == 7, F.lit(PHRASE)).otherwise(
            F.concat_ws(" ", tok(97, 50_000, "w"), tok(98, 50_000, "w")))
        d = tempfile.mkdtemp(prefix=f"tok_smoke_{n}_")
        ids.select(
            i.alias("doc_id"),
            F.concat_ws(" ", *(words + [planted])).alias("text"),
        ).write.mode("overwrite").parquet(d)
        return d

    # train once on a fixed slice (the published-artifact shape)
    train_path = corpus_dir(N_TRAIN)
    t0 = time.perf_counter()
    model = train_bpe(spark.read.parquet(train_path), n_merges=500,
                      min_count=2, max_words=200_000)
    train_wall = time.perf_counter() - t0
    results = {"train": {"n_docs": N_TRAIN,
                         "wall_sec": round(train_wall, 2),
                         "n_merges": len(model.merges),
                         "n_dropped_words": model.n_dropped_words}}

    for label, n in (("small", N_SMALL), ("big", N_BIG)):
        path = corpus_dir(n)
        docs = spark.read.parquet(path)

        # --- BPE encode: zero-shuffle map + in-measure round-trip ---
        rd0, wr0 = _shuffle_totals(spark)
        t0 = time.perf_counter()
        enc = bpe_encode(docs, model)
        n_rows, n_rt = enc.select(
            F.count(F.lit(1)),
            F.sum((bpe_decode_col(F.col("bpe_tokens"))
                   == F.coalesce(normalized_text(F.col("text")), F.lit(""))
                   ).cast("long")),
        ).first()
        bpe_wall = time.perf_counter() - t0
        rd1, wr1 = _shuffle_totals(spark)
        assert n_rows == n, n_rows
        assert n_rt == n, (n_rt, n)
        bpe_shuffle = wr1 - wr0
        # zero-shuffle is a CONTRACT, not a statistic (r6 review):
        # tolerate only broadcast bookkeeping
        assert bpe_shuffle < 1_000_000, bpe_shuffle

        # --- index BUILD (materialized: count+sum action over the full
        # postings — without this, Catalyst pushes the search term
        # filter below the aggregate and only the phrase's tokens are
        # ever aggregated; good for ad-hoc search, but the smoke must
        # price the build) ---
        rd0, wr0 = _shuffle_totals(spark)
        t0 = time.perf_counter()
        idx = build_inverted_index(docs)  # uncapped: no overflow stage
        n_postings, n_positions = idx.postings.select(
            F.count(F.lit(1)), F.sum("n")).first()
        idx_wall = time.perf_counter() - t0
        rd1, wr1 = _shuffle_totals(spark)
        assert n_positions == n * TOKENS_PER_DOC, n_positions

        # --- phrase search on the UN-materialized index: measures the
        # pushdown property (only the phrase's postings aggregate) ---
        t0 = time.perf_counter()
        hits = search_phrase(idx, PHRASE)
        n_hits, bad_docs = hits.select(
            F.count(F.lit(1)),
            F.sum((F.col("doc") % 1000 != 7).cast("long")),
        ).first()
        search_wall = time.perf_counter() - t0
        expected = len(range(7, n, 1000))
        assert n_hits == expected, (n_hits, expected)
        assert bad_docs == 0, bad_docs

        results[label] = {
            "n_docs": n,
            "bpe_wall_sec": round(bpe_wall, 2),
            "bpe_docs_per_sec": int(n / bpe_wall),
            "bpe_shuffle_write_bytes": int(bpe_shuffle),
            "index_wall_sec": round(idx_wall, 2),
            "index_docs_per_sec": int(n / idx_wall),
            "index_shuffle_write_bytes_per_doc":
                round((wr1 - wr0) / n, 1),
            "n_postings": int(n_postings),
            "search_wall_sec": round(search_wall, 2),
            "phrase_hits": int(n_hits),
        }
    s, b = results["small"], results["big"]
    results["bpe_per_doc_ratio_big_vs_small"] = round(
        (b["bpe_wall_sec"] / b["n_docs"]) / (s["bpe_wall_sec"] / s["n_docs"]), 3)
    results["index_per_doc_ratio_big_vs_small"] = round(
        (b["index_wall_sec"] / b["n_docs"])
        / (s["index_wall_sec"] / s["n_docs"]), 3)
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
