"""10x smoke for incremental snapshot dedup (functions/snapshot.py):
Bloom-routed batch-vs-snapshot dedup at two corpus sizes.

Corpus: a "seen" snapshot of N docs (unique ~25-token texts) and a new
batch of N/5 docs, half exact re-crawls of seen texts, half fresh.
Three probes per size, warmed min-of-2, shuffle deltas per timed pass:

  * build   — one-time bitmap build over the snapshot keys (the
              amortized per-snapshot-publish cost; shuffle is the
              (word, mask) agg, bounded by k*N narrow rows map-combined)
  * route   — incremental_dedup with the PREBUILT bloom (the per-batch
              operational path): expect shuffle ~ positives only — the
              batch text of definite-new rows never moves
  * exact   — mode='exact' plain anti-join: the whole batch (text
              included) plus all snapshot keys shuffle

In-measure verification: route count == exact count at both sizes, and
equals the constructed expectation (fresh half survives, re-crawl half
drops).

Run:  python scripts/scaling_snapshot.py [n_big] [n_small]
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
UI_PORT = 4049


def _shuffle_totals() -> tuple[int, int]:
    base = f"http://localhost:{UI_PORT}/api/v1/applications"
    with urllib.request.urlopen(base, timeout=10) as r:
        app_id = json.load(r)[0]["id"]
    with urllib.request.urlopen(f"{base}/{app_id}/stages", timeout=10) as r:
        stages = json.load(r)
    return (sum(s.get("shuffleReadBytes", 0) for s in stages),
            sum(s.get("shuffleWriteBytes", 0) for s in stages))


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from jsonschemaparse_spark.functions.snapshot import (
        build_key_bloom,
        incremental_dedup,
        probe_key,
    )

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("scaling-snapshot")
        .config("spark.sql.shuffle.partitions", str(CPUS * 4))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.driver.extraJavaOptions",
                "-XX:+UseParallelGC -XX:+AlwaysPreTouch")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(UI_PORT))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    def text_expr(seed):
        # ~25 hash-derived tokens from a ~100k token space (realistic
        # vocab — SCALING.md r5 smoke-corpus lesson)
        return F.concat_ws(
            " ",
            *[F.concat(F.lit(f"t{j}_"),
                       (F.abs(F.xxhash64(seed, F.lit(j))) % 100_000)
                       .cast("string"))
              for j in range(25)],
        )

    def write_corpora(n: int) -> tuple[str, str]:
        b = n // 5
        seen_dir = tempfile.mkdtemp(prefix=f"snap_seen_{n}_")
        new_dir = tempfile.mkdtemp(prefix=f"snap_new_{n}_")
        i = F.col("id")
        spark.range(0, n, 1, CPUS * 2).select(
            i.alias("doc_id"), text_expr(i).alias("text")
        ).write.mode("overwrite").parquet(seen_dir)
        # even batch rows re-crawl seen texts (content seed id/2 % n);
        # odd rows are fresh (seed outside the seen range)
        seed = F.when(i % 2 == 0, (i / 2).cast("long") % n) \
            .otherwise(i + 10 * n)
        spark.range(0, b, 1, CPUS * 2).select(
            (i + n).alias("doc_id"), text_expr(seed).alias("text")
        ).write.mode("overwrite").parquet(new_dir)
        return seen_dir, new_dir

    results: dict = {}
    for label, n in (("small", N_SMALL), ("big", N_BIG)):
        seen_dir, new_dir = write_corpora(n)
        seen = spark.read.parquet(seen_dir)
        new = spark.read.parquet(new_dir)
        b = n // 5
        # constructed truth: odd rows (fresh) survive — their hash-token
        # texts cannot collide with seen's (disjoint seed ranges)
        n_expected = b // 2

        # the reuse contract: a prebuilt bloom is keyed on probe_key
        seen_keys = seen.select(probe_key(F.col("text")).alias("_pk"))

        # --- build (one-time, per snapshot publish) ---
        spark._jvm.System.gc()
        build_key_bloom(seen_keys, "_pk", expected_items=n)  # warmup
        _, wr0 = _shuffle_totals()
        t0 = time.perf_counter()
        bloom = build_key_bloom(seen_keys, "_pk", expected_items=n)
        build_wall = time.perf_counter() - t0
        _, wr1 = _shuffle_totals()
        results[f"build_{label}"] = {
            "n_seen": n, "wall_sec": round(build_wall, 2),
            "keys_per_sec": int(n / build_wall),
            "bitmap_mb": round(bloom.n_bits / 8 / 1e6, 2),
            "k": bloom.n_hashes,
            "shuffle_write_mb": round((wr1 - wr0) / 1e6, 2),
        }

        # --- route (per-batch operational path, prebuilt bloom) ---
        # verify_bloom=False: the one-time sample guard is not part of
        # the per-batch operational path being measured
        def route_count():
            return incremental_dedup(
                new, seen, bloom=bloom, verify_bloom=False).count()

        spark._jvm.System.gc()
        route_count()
        _, wr0 = _shuffle_totals()
        walls = []
        for _ in range(2):
            t0 = time.perf_counter()
            n_route = route_count()
            walls.append(time.perf_counter() - t0)
        _, wr1 = _shuffle_totals()
        results[f"route_{label}"] = {
            "n_batch": b, "n_new_docs": n_route,
            "wall_sec": round(min(walls), 2),
            "docs_per_sec": int(b / min(walls)),
            "shuffle_write_mb": round((wr1 - wr0) / 2 / 1e6, 2),
        }

        # --- route + prefilter_seen (the full-scale config: snapshot
        # keys are ALSO bloom-prefiltered before the anti-join) ---
        def route_pf_count():
            return incremental_dedup(new, seen, bloom=bloom,
                                     prefilter_seen=True,
                                     verify_bloom=False).count()

        spark._jvm.System.gc()
        route_pf_count()
        _, wr0 = _shuffle_totals()
        walls = []
        for _ in range(2):
            t0 = time.perf_counter()
            n_route_pf = route_pf_count()
            walls.append(time.perf_counter() - t0)
        _, wr1 = _shuffle_totals()
        results[f"route_pf_{label}"] = {
            "n_batch": b, "n_new_docs": n_route_pf,
            "wall_sec": round(min(walls), 2),
            "docs_per_sec": int(b / min(walls)),
            "shuffle_write_mb": round((wr1 - wr0) / 2 / 1e6, 2),
        }

        # --- exact (the no-bloom alternative) ---
        def exact_count():
            return incremental_dedup(new, seen, mode="exact").count()

        spark._jvm.System.gc()
        exact_count()
        _, wr0 = _shuffle_totals()
        walls = []
        for _ in range(2):
            t0 = time.perf_counter()
            n_exact = exact_count()
            walls.append(time.perf_counter() - t0)
        _, wr1 = _shuffle_totals()
        results[f"exact_{label}"] = {
            "n_batch": b, "n_new_docs": n_exact,
            "wall_sec": round(min(walls), 2),
            "docs_per_sec": int(b / min(walls)),
            "shuffle_write_mb": round((wr1 - wr0) / 2 / 1e6, 2),
        }

        assert n_route == n_route_pf == n_exact == n_expected, \
            (n_route, n_route_pf, n_exact, n_expected)

    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
