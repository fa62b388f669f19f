"""Adjudicate the r3 validate_webpages_warm regression (0.83 -> 1.49 s,
VERDICT r3 next-round #1): interleaved paired A/B of the warm flagship
query under the two bench methodologies.

Hypothesis under test: commit 6e81968 put a forced System.gc() immediately
before each timed query. Spark's whole-stage-codegen class cache
(CodeGenerator.cache) is SOFT-VALUED; a full GC clears soft references, so
every timed run after a forced GC recompiles its generated classes inside
the measured window. If true, condition A (gc immediately before the timed
run) should sit a roughly constant ~0.3-0.7 s above condition B (gc, then
an untimed warmup pass, then the timed run) at EVERY round — a methodology
artifact, not an engine regression.

Design: one session, pages materialized once (the bench's warm setup).
ROUNDS interleaved rounds; each round samples, in order:
  A: System.gc(); timed run          (the r3 bench shape)
  B: System.gc(); untimed run; timed run   (the r4 bench shape)
Pairing within a round cancels host-phase drift (NOTES.md #5). Round 1 is
additionally JIT-cold for both; steady-state medians use rounds >= 3.

Run: python scripts/warm_ab.py [rounds] -> one JSON line.
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

    import __spark_entry__ as entry
    from jsonschemaparse_spark.plans import validate_dataframe
    from jsonschemaparse_spark.sources import synthesize_webpages

    sf = float(Path(SF_DIR).name.replace("sf", "") or 0.1)
    n_pages = max(int(5_000_000 * sf), 1000)

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("warm-ab")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import tempfile

    pages_dir = tempfile.mkdtemp(prefix="warm_ab_pages_")
    synthesize_webpages(spark, n_pages, partitions=CPUS * 2).write.mode(
        "overwrite"
    ).parquet(pages_dir)
    mat = spark.read.parquet(pages_dir)

    def run() -> float:
        t0 = time.perf_counter()
        res = validate_dataframe(mat, entry.WEBPAGE_RULES, key_cols=["url"])
        res.verdicts().collect()
        return time.perf_counter() - t0

    a_samples, b_samples = [], []
    for r in range(rounds):
        spark._jvm.System.gc()
        a_samples.append(run())            # A: gc immediately before timing
        spark._jvm.System.gc()
        run()                              # B: gc, then untimed warmup...
        b_samples.append(run())            # ...then the timed sample
        print(f"round {r + 1}: A={a_samples[-1]:.3f} B={b_samples[-1]:.3f}",
              file=sys.stderr)

    steady_a = a_samples[2:] or a_samples
    steady_b = b_samples[2:] or b_samples
    print(json.dumps({
        "rounds": rounds,
        "n_pages": n_pages,
        "a_gc_then_timed": [round(x, 3) for x in a_samples],
        "b_gc_warmup_timed": [round(x, 3) for x in b_samples],
        "a_median_steady": round(median(steady_a), 3),
        "b_median_steady": round(median(steady_b), 3),
        "paired_delta_median": round(
            median([a - b for a, b in zip(steady_a, steady_b)]), 3),
        "verdict_hint": "constant positive paired delta => gc-evicts-codegen-"
                        "cache methodology artifact; ~zero delta => r3 1.49s "
                        "was host noise",
    }))
    spark.stop()


if __name__ == "__main__":
    main()
