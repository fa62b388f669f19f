"""Interleaved paired A/B: minhash signature execution shapes (VERDICT r2 #1).

BENCH_r02 showed dedup_minhash 6.54 s -> 7.50 s in the round that moved
signatures from the per-row HOF expression to explode + codegen'd
aggregates. The host is bimodal (NOTES.md #5), so single runs prove
nothing: this harness runs the FULL minhash_near_duplicates pipeline
(signatures -> bands -> bucket join -> exact-Jaccard verify -> count)
with each shape in strictly alternating order within each round, flipping
which shape goes first every round so slow host phases hit both arms
equally. Reports per-arm medians and the median of per-round ratios.

Arms:
  agg       portable hash, explode + codegen MIN aggregates  (r2 shape)
  hof       portable hash, per-row HOF behind repartitions   (r1 shape)
  agg_fast  xxhash64 hash, explode+agg (VERDICT r2 #6: fast mode at bench
            scale — not oracle-reproducible, the at-scale configuration)
  hof_fast  xxhash64 hash, per-row HOF

Run:  python scripts/minhash_ab.py [rounds] [sf_dir]
Prints one JSON line; paste the medians into BASELINE.md / NOTES.md.
"""

from __future__ import annotations

import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

ROUNDS = int(sys.argv[1]) if len(sys.argv) > 1 else 8
SF_DIR = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
CPUS = 32


def main() -> None:
    from pyspark.sql import SparkSession

    from jsonschemaparse_spark.functions.dedup import minhash_near_duplicates

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("minhash-ab")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    docs.count()  # page-cache warm

    def run(sig_mode: str, hash_mode: str) -> float:
        t0 = time.perf_counter()
        minhash_near_duplicates(
            docs, "doc_id", threshold=0.8, hash_mode=hash_mode, sig_mode=sig_mode
        ).count()
        return time.perf_counter() - t0

    arms = {
        "agg": ("agg", "portable"),
        "hof": ("hof", "portable"),
        "agg_fast": ("agg", "fast"),
        "hof_fast": ("hof", "fast"),
    }
    # JIT/codegen warmup: one untimed pass per arm
    for sig_mode, hash_mode in arms.values():
        run(sig_mode, hash_mode)

    walls: dict[str, list[float]] = {a: [] for a in arms}
    order = list(arms)
    for rnd in range(ROUNDS):
        seq = order if rnd % 2 == 0 else order[::-1]
        for a in seq:
            walls[a].append(run(*arms[a]))
        print(
            f"round {rnd}: "
            + " ".join(f"{a}={walls[a][-1]:.2f}s" for a in order),
            file=sys.stderr,
        )

    med = {a: round(statistics.median(w), 3) for a, w in walls.items()}
    ratios = [walls["agg"][i] / walls["hof"][i] for i in range(ROUNDS)]
    ratios_fast = [walls["agg_fast"][i] / walls["hof_fast"][i] for i in range(ROUNDS)]
    print(
        json.dumps(
            {
                "rounds": ROUNDS,
                "sf_dir": SF_DIR,
                "medians_s": med,
                "all_walls_s": {a: [round(x, 3) for x in w] for a, w in walls.items()},
                "agg_vs_hof_ratio_median_portable": round(statistics.median(ratios), 3),
                "agg_vs_hof_ratio_median_fast": round(statistics.median(ratios_fast), 3),
                "fast_vs_portable_speedup_agg": round(med["agg"] / med["agg_fast"], 2)
                if med["agg_fast"]
                else None,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
