"""Literal N-vs-4N-executors scaling evidence via Spark local-cluster mode.

`local-cluster[n, cores, mem]` launches REAL executor JVMs (separate
processes, own heaps) against an in-process master — the closest sandbox
form of the north rule's "multi-executor cluster at N and 4N executors".
Compares 2 executors x 4 cores vs 8 executors x 4 cores on the same
materialized input, interleaved, medians.

Run:  python scripts/scaling_cluster.py [n_pages]
Appends results to SCALING.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
N_PAGES = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000

_CHILD = r"""
import json, sys, time
from pyspark.sql import SparkSession
sys.path.insert(0, {repo!r})
n_exec = int(sys.argv[1]); path = sys.argv[2]
spark = (SparkSession.builder.master(f"local-cluster[{{n_exec}},4,2500]")
    .config("spark.sql.shuffle.partitions", str(4 * n_exec))
    .config("spark.sql.files.maxPartitionBytes", "16m")
    .config("spark.executor.memory", "2g")
    .config("spark.executor.extraJavaOptions", "-XX:+UseParallelGC")
    .config("spark.driver.memory", "4g")
    # local-cluster executors register with distinct hosts; without this,
    # the scheduler WAITS spark.locality.wait (3s default) per level before
    # giving a task to a "remote" executor — at 8 executors that serializes
    # into the anti-scaling r1 measured
    .config("spark.locality.wait", "0s")
    .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as entry
from jsonschemaparse_spark.plans import validate_dataframe

def one_pass():
    df = spark.read.parquet(path)
    res = validate_dataframe(df, entry.WEBPAGE_RULES, key_cols=["url"])
    return sum(r["n_rows"] for r in res.verdicts().collect())

n = one_pass()
one_pass()
t0 = time.perf_counter()
one_pass()
wall = time.perf_counter() - t0
print(json.dumps({{"executors": n_exec, "cores_total": 4 * n_exec,
                  "wall_sec": round(wall, 3), "n_rows": n,
                  "docs_per_sec": round(n / wall, 1)}}))
spark.stop()
"""


def run_once(n_exec: int, path: str) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", _CHILD.format(repo=str(REPO)), str(n_exec), path],
        capture_output=True, text=True, timeout=900,
    )
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not lines:
        raise RuntimeError(out.stderr[-1500:])
    return json.loads(lines[-1])


def main() -> None:
    import statistics

    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    tmp = tempfile.mkdtemp(prefix="cluster_pages_", dir=base)
    path = os.path.join(tmp, "webpages")
    gen = subprocess.run(
        [sys.executable, "-c",
         f"""
import sys; sys.path.insert(0, {str(REPO)!r})
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[32]")
  .config("spark.ui.enabled","false").config("spark.driver.memory","16g")
  .config("spark.driver.extraJavaOptions","-XX:+UseParallelGC").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from jsonschemaparse_spark.sources import synthesize_webpages
synthesize_webpages(spark, {N_PAGES}, partitions=64).write.mode("overwrite").parquet({path!r})
spark.stop()
"""],
        capture_output=True, text=True, timeout=900,
    )
    assert gen.returncode == 0, gen.stderr[-1500:]

    lo_runs, hi_runs = [], []
    for _ in range(3):
        hi_runs.append(run_once(8, path))
        lo_runs.append(run_once(2, path))

    def med(runs):
        rates = sorted(r["docs_per_sec"] for r in runs)
        return {"executors": runs[0]["executors"], "cores_total": runs[0]["cores_total"],
                "docs_per_sec_median": statistics.median(rates),
                "docs_per_sec_all": rates}

    lo, hi = med(lo_runs), med(hi_runs)
    speed = hi["docs_per_sec_median"] / lo["docs_per_sec_median"]
    out = {
        "mode": "local-cluster (separate executor JVMs)",
        "n_pages": N_PAGES,
        "N_executors": lo,
        "4N_executors": hi,
        "speedup_N_to_4N": round(speed, 3),
        "scaling_efficiency": round(speed / 4.0, 3),
    }
    print(json.dumps(out))
    with open(REPO / "SCALING.md", "a") as fh:
        fh.write(
            "\n## local-cluster mode (separate executor JVMs, literal N vs 4N)\n\n"
            "```json\n" + json.dumps(out, indent=2) + "\n```\n"
        )


if __name__ == "__main__":
    main()
