"""10x/100x smoke for the similarity tier (completing the per-family
scale-evidence story: flagship r4, dedup r5, ANN here).

Two points on one JVM over synthesized deterministic embeddings
(hash-derived, unit-ish, dim 64):

  small  500k vectors
  big    5M vectors (~2.6 GB of float arrays at dim 64)

Measured per point, after materialization to parquet:
  brute    brute_force_topk (exact; TakeOrderedAndProject — the linear
           scan whose per-vector cost must stay constant with scale)
  ivf_fit  ivf_index on a 2% sample (k-means fit + full assignment)
  ivf      ivf_topk at n_probe = n_lists/4 with the prebuilt index
           (the partition-prunable approximate path)
plus brute-vs-ivf recall@10 at the big point.

Run:  python scripts/scaling_ann.py [n_big] [n_small] [dim]
Prints one JSON line; paste into SCALING.md.
"""

from __future__ import annotations

import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

N_BIG = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
N_SMALL = int(sys.argv[2]) if len(sys.argv) > 2 else 500_000
DIM = int(sys.argv[3]) if len(sys.argv) > 3 else 64
CPUS = 32
N_LISTS = 16
N_PROBE = 4


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from jsonschemaparse_spark.functions.similarity import (
        brute_force_topk,
        ivf_index,
        ivf_topk,
    )

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("scaling-ann")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.driver.extraJavaOptions",
                "-XX:+UseParallelGC -XX:+AlwaysPreTouch")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    def corpus_dir(n: int) -> str:
        ids = spark.range(0, n, 1, CPUS * 2)
        i = F.col("id")
        # deterministic pseudo-embedding: dim hash lanes in [-1, 1]
        vec = F.array(*[
            ((F.abs(F.xxhash64(i, F.lit(d))) % 2000) / 1000.0 - 1.0)
            for d in range(DIM)
        ])
        d = tempfile.mkdtemp(prefix=f"ann_smoke_{n}_")
        ids.select(i.alias("vec_id"), vec.alias("embedding")) \
            .write.mode("overwrite").parquet(d)
        return d

    results = {}
    for label, n in (("small", N_SMALL), ("big", N_BIG)):
        path = corpus_dir(n)
        emb = spark.read.parquet(path)
        qvec = emb.filter(F.col("vec_id") == 0).first()["embedding"]

        t0 = time.perf_counter()
        exact = [r["vec_id"] for r in brute_force_topk(emb, qvec, k=10).collect()]
        brute_s = time.perf_counter() - t0

        t0 = time.perf_counter()
        listed, centroids = ivf_index(emb, n_lists=N_LISTS, sample_fraction=0.02)
        # the documented production layout (ivf_index docstring): write the
        # assignment PARTITIONED BY _ivf_list so probes become
        # partition-pruned scans — an unmaterialized index re-runs the
        # k-means transform over the full corpus on every probe (first
        # smoke attempt measured 43 s/probe at 5M that way)
        ldir = tempfile.mkdtemp(prefix=f"ann_listed_{n}_")
        listed.write.mode("overwrite").partitionBy("_ivf_list").parquet(ldir)
        listed_m = spark.read.parquet(ldir)
        fit_s = time.perf_counter() - t0

        t0 = time.perf_counter()
        approx = [r["vec_id"] for r in ivf_topk(
            emb, qvec, k=10, n_lists=N_LISTS, n_probe=N_PROBE,
            index=(listed_m, centroids)
        ).collect()]
        ivf_s = time.perf_counter() - t0

        results[label] = {
            "n_vectors": n,
            "brute_sec": round(brute_s, 2),
            "brute_vec_per_sec": int(n / brute_s),
            "ivf_fit_sec": round(fit_s, 2),
            "ivf_probe_sec": round(ivf_s, 2),
            "recall_at_10": round(len(set(exact) & set(approx)) / 10, 2),
        }
    s, b = results["small"], results["big"]
    results["brute_per_vec_ratio_big_vs_small"] = round(
        (b["brute_sec"] / b["n_vectors"]) / (s["brute_sec"] / s["n_vectors"]), 3)
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
