"""Scaling-efficiency evidence (north rule: >=0.8 from N to 4N executors).

Sandbox stand-in for the two-cluster-size run: the identical validation job
(single-pass rules -> verdicts over the webpages table) at local[8] vs
local[32] on the SAME materialized parquet input.

Methodology (each level in its own subprocess = fresh JVM, no JIT bleed):
  1. synthesize webpages once -> parquet (shared input, page-cache warmed)
  2. per level: warmup pass, then 3 timed passes, take the best
  3. efficiency = (docs/sec@32 / docs/sec@8) / 4

Run:  python scripts/scaling_bench.py [n_pages]
Writes SCALING.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
N_PAGES = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000

_CHILD = r"""
import json, sys, time
from pyspark.sql import SparkSession
sys.path.insert(0, {repo!r})
cpus = int(sys.argv[1]); path = sys.argv[2]
spark = (SparkSession.builder.master(f"local[{{cpus}}]")
    .config("spark.sql.shuffle.partitions", str(cpus))
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.files.maxPartitionBytes", "32m")
    .config("spark.driver.memory", "20g")
    .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC -Xms20g -XX:+AlwaysPreTouch")
    .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as entry
from jsonschemaparse_spark.plans import validate_dataframe

def one_pass():
    df = spark.read.parquet(path)
    res = validate_dataframe(df, entry.WEBPAGE_RULES, key_cols=["url"])
    verd = res.verdicts().collect()
    return sum(r["n_rows"] for r in verd)

n = one_pass()  # warmup: JIT + codegen + page cache
t0 = time.perf_counter()
one_pass()
wall = time.perf_counter() - t0
print(json.dumps({{"cpus": cpus, "wall_sec": round(wall, 3), "n_rows": n,
                  "docs_per_sec": round(n / wall, 1)}}))
spark.stop()
"""


def _run_once(cpus: int, path: str) -> dict:
    script = _CHILD.format(repo=str(REPO))
    out = subprocess.run(
        [sys.executable, "-c", script, str(cpus), path],
        capture_output=True, text=True, timeout=1200,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def run_level_interleaved(path: str, rounds: int = 4) -> tuple[dict, dict]:
    """Interleave local[8]/local[32] invocations (fresh JVM each) so
    noisy-neighbor VM variance hits both levels equally; report medians."""
    import statistics

    lo_runs, hi_runs = [], []
    for _ in range(rounds):
        hi_runs.append(_run_once(32, path))
        lo_runs.append(_run_once(8, path))

    def med(runs):
        rates = sorted(r["docs_per_sec"] for r in runs)
        m = statistics.median(rates)
        return {
            "cpus": runs[0]["cpus"],
            "n_rows": runs[0]["n_rows"],
            "docs_per_sec_median": m,
            "docs_per_sec_all": rates,
            "wall_sec_all": sorted(r["wall_sec"] for r in runs),
        }

    return med(lo_runs), med(hi_runs)


def main() -> None:
    # tmpfs input: /tmp is disk-backed in the sandbox and disk I/O variance
    # drowned the signal; /dev/shm removes the storage variable entirely
    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    tmp = tempfile.mkdtemp(prefix="scaling_pages_", dir=base)
    path = os.path.join(tmp, "webpages")
    gen = subprocess.run(
        [sys.executable, "-c",
         f"""
import sys; sys.path.insert(0, {str(REPO)!r})
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[32]")
  .config("spark.ui.enabled","false").config("spark.driver.memory","24g").config("spark.driver.extraJavaOptions","-XX:+UseParallelGC").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from jsonschemaparse_spark.sources import synthesize_webpages
synthesize_webpages(spark, {N_PAGES}, partitions=64).write.mode("overwrite").parquet({path!r})
spark.stop()
"""],
        capture_output=True, text=True, timeout=1200,
    )
    assert gen.returncode == 0, gen.stderr[-2000:]

    lo, hi = run_level_interleaved(path)
    speed = hi["docs_per_sec_median"] / lo["docs_per_sec_median"]
    eff = speed / 4.0
    out = {
        "job": "single-pass rules validation -> per-partition verdicts",
        "n_pages": N_PAGES,
        "input": "materialized parquet (shared across levels)",
        "methodology": "4 interleaved fresh-JVM invocations per level, warmup "
                       "pass + timed pass each, median docs/sec",
        "local8": lo,
        "local32": hi,
        "speedup_8_to_32": round(speed, 3),
        "scaling_efficiency": round(eff, 3),
        "north_rule_target": 0.8,
        "meets_target": eff >= 0.8,
    }
    print(json.dumps(out))
    # APPEND — SCALING.md carries hand-written analysis (hardware control
    # curves etc.); never clobber it
    with open(REPO / "SCALING.md", "a") as fh:
        fh.write("\n## scaling_bench.py re-run\n\n```json\n"
                 + json.dumps(out, indent=2) + "\n```\n")


if __name__ == "__main__":
    main()
