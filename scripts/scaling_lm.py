"""10x smoke for bigram-LM perplexity scoring — two-point scale
evidence for the r6 quality-scoring family member.

Corpus: n docs of 40 tokens drawn from a ~50k-token hash-derived
vocabulary (realistic type/token ratio — the r5 smoke-corpus lesson: a
tiny vocab makes every bigram seen and the broadcast trivially small),
with 10% of docs injected as high-OOV (tokens from a disjoint hash
space) so the score separation is verifiable in-measure.

Model: trained once on a FIXED 100k-doc slice (training cost reported
separately — the production shape trains on a reference corpus, not
the scored one). Expectations verified in-measure, columnar:
  * n_bigrams == 39 for every doc;
  * every score finite (smoothing never yields NULL/inf for >=2-token
    docs);
  * mean OOV-doc perplexity > mean in-vocab perplexity.

Run:  python scripts/scaling_lm.py [n_big] [n_small]
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

    from jsonschemaparse_spark.functions.lm import (
        lm_perplexity,
        train_bigram_lm,
    )

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("scaling-lm")
        .config("spark.sql.shuffle.partitions", str(CPUS * 4))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.driver.extraJavaOptions",
                "-XX:+UseParallelGC -XX:+AlwaysPreTouch")
        .config("spark.ui.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    def corpus_dir(n: int, oov_share: bool) -> str:
        ids = spark.range(0, n, 1, CPUS * 2)
        i = F.col("id")
        # token t of doc i: hash into a ~50k-token space; zipf-ish skew
        # via a second, smaller space for half the positions (frequent
        # function-word analogs) so bigram counts vary realistically
        def tok(t: int, space: int, tag: str):
            return F.concat(
                F.lit(tag),
                (F.abs(F.xxhash64(i * TOKENS_PER_DOC + t)) % space)
                .cast("string"))
        oov = (i % 10 == 0) if oov_share else F.lit(False)
        words = [
            F.when(oov, tok(t, 50_000, "z"))
            .otherwise(tok(t, 1_000, "f") if t % 2 == 0
                       else tok(t, 50_000, "w"))
            for t in range(TOKENS_PER_DOC)
        ]
        d = tempfile.mkdtemp(prefix=f"lm_smoke_{n}_")
        ids.select(i.alias("doc_id"),
                   F.concat_ws(" ", *words).alias("text")) \
            .write.mode("overwrite").parquet(d)
        return d

    train_path = corpus_dir(N_TRAIN, oov_share=False)
    t0 = time.perf_counter()
    lm = train_bigram_lm(spark.read.parquet(train_path), id_col="doc_id")
    train_wall = time.perf_counter() - t0

    results = {
        "train": {"n_docs": N_TRAIN, "wall_sec": round(train_wall, 2),
                  "bigram_types": lm.bigrams.count(),
                  "vocab": lm.vocab_size},
    }
    for label, n in (("small", N_SMALL), ("big", N_BIG)):
        path = corpus_dir(n, oov_share=True)
        docs = spark.read.parquet(path)
        rd0, wr0 = _shuffle_totals(spark)
        t0 = time.perf_counter()
        out = lm_perplexity(docs, lm, "doc_id")
        oov = F.col("doc_id") % 10 == 0
        n_rows, n_bg_ok, n_finite, ppl_oov, ppl_in = out.select(
            F.count(F.lit(1)),
            F.sum((F.col("n_bigrams") == TOKENS_PER_DOC - 1).cast("long")),
            F.sum((~F.isnan("log2_ppl")
                   & F.col("log2_ppl").isNotNull()).cast("long")),
            F.avg(F.when(oov, F.col("log2_ppl"))),
            F.avg(F.when(~oov, F.col("log2_ppl"))),
        ).first()
        wall = time.perf_counter() - t0
        rd1, wr1 = _shuffle_totals(spark)
        assert n_rows == n, n_rows
        assert n_bg_ok == n, (n_bg_ok, n)
        assert n_finite == n, (n_finite, n)
        assert ppl_oov > ppl_in, (ppl_oov, ppl_in)
        results[label] = {
            "n_docs": n,
            "wall_sec": round(wall, 2),
            "docs_per_sec": int(n / wall),
            "shuffle_write_mb": round((wr1 - wr0) / 1e6, 1),
            "shuffle_write_bytes_per_doc": round((wr1 - wr0) / n, 1),
            "log2ppl_oov_vs_in": [round(float(ppl_oov), 3),
                                  round(float(ppl_in), 3)],
        }
    s, b = results["small"], results["big"]
    results["per_doc_ratio_big_vs_small"] = round(
        (b["wall_sec"] / b["n_docs"]) / (s["wall_sec"] / s["n_docs"]), 3)
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
