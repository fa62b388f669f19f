"""Scaling-efficiency evidence (north rule: >=0.8 from N to 4N executors).

Sandbox stand-in: the identical flagship job (synthesize + validate webpages)
at local[8] vs local[32] on the same input size. Prints a JSON line and is
recorded in BASELINE.md / SCALING.md.

Run:  python scripts/scaling_bench.py [n_pages]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

N_PAGES = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000


def run_once(cpus: int, n_pages: int) -> dict:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"scaling-{cpus}")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry
    from jsonschemaparse_spark.plans import validate_dataframe
    from jsonschemaparse_spark.sources import synthesize_webpages

    # warmup (JVM/codegen) on a small slice
    pages_w = synthesize_webpages(spark, 10_000, partitions=cpus)
    validate_dataframe(pages_w, entry.WEBPAGE_RULES, key_cols=["url"]).verdicts().collect()

    t0 = time.perf_counter()
    pages = synthesize_webpages(spark, n_pages, partitions=cpus * 2)
    res = validate_dataframe(pages, entry.WEBPAGE_RULES, key_cols=["url"])
    verd = res.verdicts().collect()
    wall = time.perf_counter() - t0
    n_rows = sum(r["n_rows"] for r in verd)
    spark.stop()
    return {"cpus": cpus, "wall_sec": round(wall, 3), "n_rows": n_rows,
            "docs_per_sec": round(n_rows / wall, 1)}


def main() -> None:
    lo = run_once(8, N_PAGES)
    hi = run_once(32, N_PAGES)
    eff = (hi["docs_per_sec"] / lo["docs_per_sec"]) / 4.0
    out = {
        "n_pages": N_PAGES,
        "local8": lo,
        "local32": hi,
        "speedup_8_to_32": round(hi["docs_per_sec"] / lo["docs_per_sec"], 3),
        "scaling_efficiency": round(eff, 3),
        "north_rule_target": 0.8,
        "meets_target": eff >= 0.8,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
