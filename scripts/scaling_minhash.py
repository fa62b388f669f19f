"""10x-scale smoke for the dedup tier (VERDICT r4 #8).

The flagship validation already has a 5M-page smoke (BASELINE.md r4); this
is the same exercise for minhash_near_duplicates — the (doc, H longs)
shuffle story at data scale. Two points on one JVM:

  small  500k docs (100x the 5k-doc bench corpus)
  big    5M docs   (1000x)

Corpus: deterministic hash-token text (20-199 words/doc drawn from a
100k-token space) plus 2% exact clones with shifted ids and ~0.2% empty
docs. The token-space size matters: synthesize_webpages' 34-word bench
vocabulary makes random-pair jaccard ~0.002, which at 500k docs already
mints ~2M spurious LSH candidates (quadratic — the r5 first attempt ran
for 18 min before being killed). Real web text is diverse; with a 100k
token space random-pair jaccard ~ 0 and candidates are the clones plus
the capped identical-empty-doc cluster, which is the regime the operator
is designed for. Materialized to parquet first so the measured wall is
the dedup pipeline, not synthesis. hash_mode='fast' (xxhash64) + bucket
cap — the documented at-scale configuration.

Reported per point: wall seconds, docs/sec, pairs found, and the shuffle
read/write bytes of the run's stages (Spark UI REST API), plus the
big/small per-doc ratio — ~1.0 means the pipeline scales linearly in
documents (the shuffle carries one (doc, H longs) row per doc either way).

Run:  python scripts/scaling_minhash.py [n_big] [n_small]
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
CPUS = 32
CLONE_FRAC = 0.02
UI_PORT = 4049


def _shuffle_totals() -> tuple[int, int]:
    """Sum shuffle read/write bytes over all completed stages so far."""
    base = f"http://localhost:{UI_PORT}/api/v1/applications"
    with urllib.request.urlopen(base, timeout=10) as r:
        app_id = json.load(r)[0]["id"]
    with urllib.request.urlopen(f"{base}/{app_id}/stages", timeout=10) as r:
        stages = json.load(r)
    rd = sum(s.get("shuffleReadBytes", 0) for s in stages)
    wr = sum(s.get("shuffleWriteBytes", 0) for s in stages)
    return rd, wr


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from jsonschemaparse_spark.functions.dedup import minhash_near_duplicates

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("scaling-minhash")
        .config("spark.sql.shuffle.partitions", str(CPUS * 4))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.driver.extraJavaOptions",
                "-XX:+UseParallelGC -XX:+AlwaysPreTouch")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(UI_PORT))
        .config("spark.local.dir", tempfile.gettempdir())
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    def corpus_dir(n: int) -> str:
        n_base = int(n * (1 - CLONE_FRAC))
        n_clone = n - n_base
        ids = spark.range(0, n_base, 1, CPUS * 2)
        i = F.col("id")
        n_words = (20 + F.abs(F.xxhash64(i, F.lit(3))) % 180).cast("int")
        text = F.array_join(
            F.transform(
                F.sequence(F.lit(1), n_words),
                lambda j: F.concat(
                    F.lit("w"),
                    (F.abs(F.xxhash64(i, j)) % 100_000).cast("string"),
                ),
            ),
            " ",
        )
        text = F.when(F.abs(F.xxhash64(i, F.lit(9))) % 500 == 0,
                      F.lit("")).otherwise(text)
        base = ids.select(i.alias("doc_id"), text.alias("text"))
        clones = base.filter(F.col("doc_id") < n_clone).select(
            (F.col("doc_id") + 100_000_000).alias("doc_id"), "text"
        )
        d = tempfile.mkdtemp(prefix=f"minhash_smoke_{n}_")
        base.unionByName(clones).write.mode("overwrite").parquet(d)
        return d

    results = {}
    for label, n in (("small", N_SMALL), ("big", N_BIG)):
        path = corpus_dir(n)
        docs = spark.read.parquet(path)
        rd0, wr0 = _shuffle_totals()
        t0 = time.perf_counter()
        # the at-scale configuration: xxhash64 + bucket cap (identical-doc
        # clusters — empty pages here — would otherwise go quadratic; the
        # capped buckets are named by minhash_bucket_overflow)
        pairs = minhash_near_duplicates(
            docs, "doc_id", threshold=0.8, hash_mode="fast",
            max_bucket_size=100,
        ).count()
        wall = time.perf_counter() - t0
        rd1, wr1 = _shuffle_totals()
        results[label] = {
            "n_docs": n,
            "wall_sec": round(wall, 2),
            "docs_per_sec": int(n / wall),
            "pairs_found": pairs,
            "shuffle_read_mb": round((rd1 - rd0) / 1e6, 1),
            "shuffle_write_mb": round((wr1 - wr0) / 1e6, 1),
        }

    s, b = results["small"], results["big"]
    results["per_doc_ratio_big_vs_small"] = round(
        (b["wall_sec"] / b["n_docs"]) / (s["wall_sec"] / s["n_docs"]), 3
    )
    results["shuffle_write_bytes_per_doc"] = {
        "small": round(s["shuffle_write_mb"] * 1e6 / s["n_docs"], 1),
        "big": round(b["shuffle_write_mb"] * 1e6 / b["n_docs"], 1),
    }
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
