"""Adjudicate the r5 ann_topk bench delta (0.285 -> 0.342 s, VERDICT r5
what's-wrong #1) and the simhash wobble (NOTES r5) with the paired
interleaved protocol before touching code.

Both queries' code is untouched since their r4/r5 records (git-verified),
so the hypothesis is the documented bimodal host throttle (NOTES.md #5:
minutes-long phases with 1.2-1.6x walls). Design: one session, ROUNDS
interleaved rounds; each round samples, in order, an anchor query
(referential_check — the bench's most phase-stable entry, r3-r5 walls
0.29-0.32 s) then ann_topk then simhash_documents, each as
gc -> untimed warmup -> timed (the bench methodology). Pairing within a
round cancels phase drift: if ann/anchor and simhash/anchor RATIOS stay
flat across rounds while absolute walls move together, the record-vs-r5
delta is host phase, not regression.

Run: python scripts/phase_ab.py [rounds] -> one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def median(xs):
    xs = sorted(xs)
    n = len(xs)
    return xs[n // 2] if n % 2 else (xs[n // 2 - 1] + xs[n // 2]) / 2


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 8

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("phase-ab")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from jsonschemaparse_spark.functions.dedup import simhash
    from jsonschemaparse_spark.functions.integrity import referential_violations
    from jsonschemaparse_spark.functions.similarity import brute_force_topk

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    qvec = emb.filter(F.col("vec_id") == 0).first()["embedding"]
    docs_path = f"{SF_DIR}/documents.parquet"
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    customer = spark.read.parquet(f"{SF_DIR}/customer.parquet")

    def anchor():
        referential_violations(orders, "o_custkey", customer, "c_custkey").count()

    def ann():
        brute_force_topk(emb, qvec, k=10).collect()

    def sim():
        df = spark.read.parquet(docs_path)
        simhash(df, "doc_id").select(
            F.sum(F.col("simhash").bitwiseAND(F.lit(1)))).collect()

    def timed(fn) -> float:
        spark._jvm.System.gc()
        fn()
        t0 = time.perf_counter()
        fn()
        return time.perf_counter() - t0

    samples = {"anchor": [], "ann_topk": [], "simhash": []}
    for _ in range(rounds):
        samples["anchor"].append(round(timed(anchor), 3))
        samples["ann_topk"].append(round(timed(ann), 3))
        samples["simhash"].append(round(timed(sim), 3))

    def stats(xs):
        return {"min": min(xs), "median": round(median(xs), 3),
                "max": max(xs)}

    ratios_ann = [a / b for a, b in zip(samples["ann_topk"], samples["anchor"])]
    ratios_sim = [a / b for a, b in zip(samples["simhash"], samples["anchor"])]
    print(json.dumps({
        "rounds": rounds,
        "sf_dir": SF_DIR,
        "samples": samples,
        "ann_topk": stats(samples["ann_topk"]),
        "simhash": stats(samples["simhash"]),
        "anchor": stats(samples["anchor"]),
        "ann_over_anchor": {"min": round(min(ratios_ann), 2),
                            "median": round(median(ratios_ann), 2),
                            "max": round(max(ratios_ann), 2)},
        "simhash_over_anchor": {"min": round(min(ratios_sim), 2),
                                "median": round(median(ratios_sim), 2),
                                "max": round(max(ratios_sim), 2)},
    }))
    spark.stop()


if __name__ == "__main__":
    main()
