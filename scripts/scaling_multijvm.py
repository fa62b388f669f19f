"""Fixed-workers-per-box scaling evidence (north rule, round-2 protocol).

The r1 local[8] -> local[32] measurement conflates "more executors" with
"more threads per memory system". This protocol holds workers-per-process
constant — the quantity a real scale-out holds constant per node — and
scales the NUMBER of independent processes:

  baseline: 1 x local[8] JVM validating one shard (n pages)
  scaled:   k x local[8] JVMs, each on its OWN disjoint shard (k*n pages),
            launched concurrently, core-pinned (taskset) so each JVM owns
            8 cores the way a real node owns its socket share.

Each child warms up (JIT + codegen + page cache), signals ready, waits for
a shared GO barrier, then runs ONE timed pass — so the k timed windows
overlap exactly. Weak-scaling efficiency is then

  efficiency = aggregate_docs_per_sec(k) / (k * docs_per_sec(1))
             = median_baseline_wall / max_scaled_wall.

Run:  python scripts/scaling_multijvm.py [pages_per_shard] [k] [rounds]
Appends results to SCALING.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import subprocess
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
PAGES_PER_SHARD = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
K = int(sys.argv[2]) if len(sys.argv) > 2 else 4
ROUNDS = int(sys.argv[3]) if len(sys.argv) > 3 else 3

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, "__REPO__")
shard, barrier_dir, tag = sys.argv[1], sys.argv[2], sys.argv[3]
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.files.maxPartitionBytes", "32m")
    .config("spark.driver.memory", "8g")
    .config("spark.driver.extraJavaOptions",
            "-XX:+UseParallelGC -Xms8g -XX:+AlwaysPreTouch")
    .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as entry
from jsonschemaparse_spark.plans import validate_dataframe

def one_pass():
    df = spark.read.parquet(shard)
    res = validate_dataframe(df, entry.WEBPAGE_RULES, key_cols=["url"])
    return sum(r["n_rows"] for r in res.verdicts().collect())

n = one_pass()  # warmup
open(os.path.join(barrier_dir, f"ready_{tag}"), "w").close()
go = os.path.join(barrier_dir, "go")
while not os.path.exists(go):
    time.sleep(0.02)
t0 = time.perf_counter()
one_pass()
wall = time.perf_counter() - t0
print(json.dumps({"tag": tag, "wall_sec": round(wall, 3), "n_rows": n,
                  "docs_per_sec": round(n / wall, 1)}))
spark.stop()
"""


def _taskset_prefix(slot: int) -> list[str]:
    if shutil.which("taskset") is None:
        return []
    lo, hi = slot * 8, slot * 8 + 7
    return ["taskset", "-c", f"{lo}-{hi}"]


def _launch(slot: int, shard: str, barrier_dir: str, pin: bool) -> subprocess.Popen:
    script = _CHILD.replace("__REPO__", str(REPO))
    cmd = (_taskset_prefix(slot) if pin else []) + [
        sys.executable, "-c", script, shard, barrier_dir, str(slot)
    ]
    return subprocess.Popen(cmd, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
                            text=True)


def _run_level(shards: list[str], pin: bool) -> dict:
    """Launch len(shards) children, barrier, collect timed walls."""
    k = len(shards)
    with tempfile.TemporaryDirectory() as bdir:
        procs = [_launch(i, shards[i], bdir, pin) for i in range(k)]
        deadline = time.time() + 900
        while True:
            ready = [f for f in os.listdir(bdir) if f.startswith("ready_")]
            if len(ready) == k:
                break
            if any(p.poll() is not None for p in procs):
                raise RuntimeError("a child JVM died before the barrier")
            if time.time() >= deadline:
                # a silent GO here would let fast children run outside the
                # laggard's window and fake the overlap the protocol needs
                for p in procs:
                    p.kill()
                raise RuntimeError(f"barrier timeout: {len(ready)}/{k} ready")
            time.sleep(0.1)
        open(os.path.join(bdir, "go"), "w").close()
        outs = []
        for p in procs:
            out, _ = p.communicate(timeout=900)
            lines = [l for l in out.splitlines() if l.startswith("{")]
            if not lines:
                raise RuntimeError(f"child produced no result (pid {p.pid})")
            outs.append(json.loads(lines[-1]))
    n_total = sum(o["n_rows"] for o in outs)
    wall = max(o["wall_sec"] for o in outs)
    return {
        "jvms": k,
        "walls": [o["wall_sec"] for o in outs],
        "wall_max": wall,
        "n_rows_total": n_total,
        "agg_docs_per_sec": round(n_total / wall, 1),
    }


def main() -> None:
    # 1. materialize k disjoint shards of identical size (distinct id ranges);
    #    JSP_SHARD_DIR reuses shards across invocations (skip re-synthesis)
    keep = os.environ.get("JSP_SHARD_DIR")
    base = Path(keep) if keep else Path(tempfile.mkdtemp(prefix="jsp_shards_"))
    shards = [str(base / f"shard{i}") for i in range(K)]
    already = keep and all(os.path.exists(s) for s in shards)
    synth = r"""
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession, functions as F
spark = (SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "16g")
    .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from jsonschemaparse_spark.sources.webpages import synthesize_webpages
n = {n}
for i, shard in enumerate({shards!r}):
    pages = synthesize_webpages(spark, n, id_offset=i * n)
    pages.write.mode("overwrite").parquet(shard)
spark.stop()
"""
    if not already:
        subprocess.run(
            [sys.executable, "-c",
             synth.format(repo=str(REPO), n=PAGES_PER_SHARD, shards=shards)],
            check=True, capture_output=True, text=True,
        )

    pin = shutil.which("taskset") is not None
    baselines, scaled = [], []
    for _ in range(ROUNDS):
        scaled.append(_run_level(shards, pin))
        baselines.append(_run_level(shards[:1], pin))

    base_walls = [b["wall_max"] for b in baselines]
    scaled_walls = [s["wall_max"] for s in scaled]
    base_med = statistics.median(base_walls)
    scaled_med = statistics.median(scaled_walls)
    base_tp = PAGES_PER_SHARD / base_med
    agg_tp = K * PAGES_PER_SHARD / scaled_med
    eff = (agg_tp / (K * base_tp))
    # Paired per-round efficiency: each scaled run is immediately followed
    # by its baseline run, so the host's bimodal steal/throttle phases
    # (minutes-long on this VM) hit both sides of a pair alike and cancel.
    paired = [round(b / s, 3) for b, s in zip(base_walls, scaled_walls)]
    # Best-window: both levels at their un-throttled fast mode — isolates
    # engine behavior from host noise (the r1 SCALING.md estimator).
    best = round(min(base_walls) / min(scaled_walls), 3)
    result = {
        "protocol": "fixed-workers-per-box: k x local[8] JVMs on disjoint shards, core-pinned, barrier-synchronized timed pass",
        "pages_per_shard": PAGES_PER_SHARD,
        "k": K,
        "rounds": ROUNDS,
        "core_pinning": pin,
        "baseline_1x_local8": {
            "wall_sec_all": base_walls,
            "wall_sec_median": round(base_med, 3),
            "docs_per_sec": round(base_tp, 1),
        },
        "scaled_kx_local8": {
            "wall_sec_max_all": scaled_walls,
            "per_jvm_walls": [s["walls"] for s in scaled],
            "wall_sec_median": round(scaled_med, 3),
            "agg_docs_per_sec": round(agg_tp, 1),
        },
        "scaling_efficiency_pooled_medians": round(eff, 3),
        "scaling_efficiency_per_round_paired": paired,
        "scaling_efficiency_paired_median": round(statistics.median(paired), 3),
        "scaling_efficiency_best_window": best,
    }
    print(json.dumps(result))
    if not keep:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
