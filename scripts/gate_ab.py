"""Adjudicate the fused-gate claim (NOTES r6 #1: gate_fused ~= max of
the separate gates, not the sum) with the paired interleaved protocol —
a solo r6 bench sample read fused 1.21 s vs gopher 0.96 s, which would
contradict the claim if it is engine cost rather than host phase.

Design (phase_ab.py protocol): one session, ROUNDS interleaved rounds;
each round samples anchor (referential_check) then gate_gopher, gate_c4,
gate_fused, each as gc -> untimed warmup -> timed. Within-round RATIOS
(fused/gopher, fused/(gopher+c4)) cancel phase drift. Claim holds iff
median fused/gopher ~ 1 and median fused/(gopher+c4) clearly < 1.

Run: python scripts/gate_ab.py [rounds] -> one JSON line.
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
        .appName("gate-ab")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from jsonschemaparse_spark.functions.integrity import referential_violations
    from jsonschemaparse_spark.functions.text import (
        c4_quality_flags,
        gopher_quality_flags,
        quality_flags,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    customer = spark.read.parquet(f"{SF_DIR}/customer.parquet")

    probes = {
        "anchor": lambda: referential_violations(
            orders, "o_custkey", customer, "c_custkey").count(),
        "gopher": lambda: gopher_quality_flags(docs).select(
            F.sum(F.when(F.col("gopher_keep"), 1))).collect(),
        "c4": lambda: c4_quality_flags(docs).select(
            F.sum(F.when(F.col("c4_keep"), 1))).collect(),
        "fused": lambda: quality_flags(docs).select(
            F.sum(F.when(F.col("quality_keep"), 1))).collect(),
    }

    samples: dict[str, list[float]] = {k: [] for k in probes}
    for _ in range(rounds):
        for name, fn in probes.items():
            spark._jvm.System.gc()
            fn()  # untimed warmup
            t0 = time.perf_counter()
            fn()
            samples[name].append(time.perf_counter() - t0)

    meds = {k: round(median(v), 3) for k, v in samples.items()}
    ratios_fg = [f / g for f, g in zip(samples["fused"], samples["gopher"])]
    ratios_fsum = [f / (g + c) for f, g, c in
                   zip(samples["fused"], samples["gopher"], samples["c4"])]
    print(json.dumps({
        "rounds": rounds, "sf_dir": SF_DIR, "medians": meds,
        "fused_over_gopher_median": round(median(ratios_fg), 3),
        "fused_over_sum_median": round(median(ratios_fsum), 3),
        "fused_over_gopher_all": [round(r, 3) for r in ratios_fg],
        "samples": {k: [round(x, 3) for x in v] for k, v in samples.items()},
    }))
    spark.stop()


if __name__ == "__main__":
    main()
