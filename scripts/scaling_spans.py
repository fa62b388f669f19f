"""10x smoke for C4 span dedup (remove_duplicate_spans) — the one r5
operator-family member without two-point scale evidence (VERDICT r5 #6).

Corpus: 90% of docs share a 3-sentence boilerplate intro (ONE span
duplicated corpus-wide — the operator's reason to exist, and the skew
worst case: a single span key carrying ~N occurrences) followed by
unique body sentences; 10% are fully unique (byte-identity controls).
Expectations verified IN-MEASURE, columnar:
  * untouched (fully-unique) docs round-trip byte-identically;
  * every non-first intro doc loses EXACTLY the intro (length
    arithmetic);
  * the single global first occurrence keeps it.

Run:  python scripts/scaling_spans.py [n_big] [n_small]
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
UI_PORT = 4048

INTRO = "Shared intro sentence one. Common second point here. Common third point closes."


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

    from jsonschemaparse_spark.functions.dedup import remove_duplicate_spans

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("scaling-spans")
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
        # body tokens carry the row id itself: globally unique by
        # construction, so NO body span can collide across docs (a
        # hashed-token space produced a birthday-collision tail that
        # broke the exact length check at 5k docs already)
        body = F.concat_ws(
            " ",
            *[F.concat(F.lit(f"Body sentence {j} token "),
                       i.cast("string"), F.lit("."))
              for j in range(6)],
        )
        text = F.when(i % 10 != 0, F.concat(F.lit(INTRO + " "), body)) \
            .otherwise(body)
        d = tempfile.mkdtemp(prefix=f"spans_smoke_{n}_")
        ids.select(i.alias("doc_id"), text.alias("text")) \
            .write.mode("overwrite").parquet(d)
        return d

    results = {}
    for label, n in (("small", N_SMALL), ("big", N_BIG)):
        path = corpus_dir(n)
        docs = spark.read.parquet(path)
        rd0, wr0 = _shuffle_totals()
        t0 = time.perf_counter()
        out = remove_duplicate_spans(docs, "doc_id")
        # verify-while-measuring: doc 1 is the global first intro
        # occurrence (min (doc, pos)); every OTHER intro doc must lose
        # exactly the intro's three chunks = len(INTRO) chars (the
        # following separator space belongs to the NEXT chunk and
        # survives); unique docs round-trip byte-identically
        intro_doc = F.col("doc_id") % 10 != 0
        first_doc = F.col("doc_id") == 1
        expected_len = F.when(
            intro_doc & ~first_doc,
            F.length("orig") - len(INTRO)
        ).otherwise(F.length("orig"))
        joined = out.alias("o").join(
            docs.select("doc_id", F.col("text").alias("orig")), "doc_id")
        n_rows, n_len_ok, n_unique_identical = joined.select(
            F.count(F.lit(1)),
            F.sum((F.length("text") == expected_len).cast("long")),
            F.sum((~intro_doc & (F.col("text") == F.col("orig")))
                  .cast("long")),
        ).first()
        wall = time.perf_counter() - t0
        rd1, wr1 = _shuffle_totals()
        assert n_rows == n, n_rows
        assert n_len_ok == n, (n_len_ok, n)
        assert n_unique_identical == n // 10, n_unique_identical
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
