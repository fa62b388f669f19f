"""10x smoke for the line-dedup tier (strip_boilerplate_lines), completing
the per-family scale evidence: flagship r4, minhash + similarity r5.

Corpus: N multi-line docs (8 unique body lines each from a large token
space) sharing 3 boilerplate lines (header/nav/footer) that appear in
every document — the exact shape the operator exists for. Two points in
one JVM; per-doc wall and shuffle volume should stay ~constant.

Run:  python scripts/scaling_lines.py [n_big] [n_small]
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
UI_PORT = 4047


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

    from jsonschemaparse_spark.functions.dedup import strip_boilerplate_lines

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("scaling-lines")
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

    def corpus_dir(n: int) -> str:
        ids = spark.range(0, n, 1, CPUS * 2)
        i = F.col("id")
        body = F.concat_ws(
            "\n",
            *[F.concat(F.lit(f"line{j} token "),
                       (F.abs(F.xxhash64(i, F.lit(j))) % 1_000_000).cast("string"))
              for j in range(8)],
        )
        text = F.concat(
            F.lit("SITE HEADER NAVIGATION BAR\nSubscribe to our newsletter\n"),
            body,
            F.lit("\nCopyright footer all rights reserved"),
        )
        d = tempfile.mkdtemp(prefix=f"lines_smoke_{n}_")
        ids.select(i.alias("doc_id"), text.alias("text")) \
            .write.mode("overwrite").parquet(d)
        return d

    results = {}
    for label, n in (("small", N_SMALL), ("big", N_BIG)):
        path = corpus_dir(n)
        docs = spark.read.parquet(path)
        rd0, wr0 = _shuffle_totals()
        t0 = time.perf_counter()
        stripped = strip_boilerplate_lines(docs, "doc_id", min_docs=1000)
        # verify-while-measuring: every doc loses exactly the 3 hot lines
        n_rows, n_clean = stripped.select(
            F.count(F.lit(1)),
            F.sum((F.size(F.split("text", "\n")) == 8).cast("long")),
        ).first()
        wall = time.perf_counter() - t0
        rd1, wr1 = _shuffle_totals()
        assert n_rows == n and n_clean == n, (n_rows, n_clean)
        results[label] = {
            "n_docs": n,
            "wall_sec": round(wall, 2),
            "docs_per_sec": int(n / wall),
            "shuffle_write_mb": round((wr1 - wr0) / 1e6, 1),
            "shuffle_write_bytes_per_doc": round((wr1 - wr0) / n, 1),
        }
    s, b = results["small"], results["big"]
    results["per_doc_ratio_big_vs_small"] = round(
        (b["wall_sec"] / b["n_docs"]) / (s["wall_sec"] / s["n_docs"]), 3)
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
