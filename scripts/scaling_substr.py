"""10x smoke for exact substring dedup (remove_duplicate_substrings) —
two-point scale evidence for the r6 family member, the scaling_spans.py
protocol one granularity down (token windows instead of sentence spans).

Corpus: 90% of docs share a 20-token boilerplate intro (ONE window hash
duplicated corpus-wide — the skew worst case: the firsts join-back key
carries ~0.9N occurrences) followed by 8 body tokens that embed the row
id (globally unique, so no body window can collide). min_tokens=20 ->
exactly one duplicated window per intro doc at pos 0.

Expectations verified IN-MEASURE, columnar:
  * unique docs round-trip byte-identically;
  * every non-first intro doc rebuilds to exactly its body
    (prefix-strip arithmetic on the original string);
  * the single global first occurrence (doc 1) keeps its intro.

Run:  python scripts/scaling_substr.py [n_big] [n_small]
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

INTRO = ("boilerplate navigation header menu about contact privacy terms "
         "subscribe newsletter follow twitter facebook linkedin rss "
         "sitemap copyright reserved login register")  # 20 tokens
K = 20


def _shuffle_totals(spark) -> tuple[int, int]:
    # read THIS session's bound UI url + app id — if the requested port
    # was taken, Spark auto-increments and a hard-coded port would read
    # some other application's totals (r6 review finding #6)
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    url = f"{ui}/api/v1/applications/{app_id}/stages"
    with urllib.request.urlopen(url, timeout=10) as r:
        stages = json.load(r)
    return (sum(s.get("shuffleReadBytes", 0) for s in stages),
            sum(s.get("shuffleWriteBytes", 0) for s in stages))


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from jsonschemaparse_spark.functions.dedup import (
        remove_duplicate_substrings,
    )

    assert len(INTRO.split()) == K

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("scaling-substr")
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
            " ",
            *[F.concat(F.lit(f"body{j}tok"), i.cast("string"))
              for j in range(8)],
        )
        text = F.when(i % 10 != 0, F.concat(F.lit(INTRO + " "), body)) \
            .otherwise(body)
        d = tempfile.mkdtemp(prefix=f"substr_smoke_{n}_")
        ids.select(i.alias("doc_id"), text.alias("text")) \
            .write.mode("overwrite").parquet(d)
        return d

    results = {}
    for label, n in (("small", N_SMALL), ("big", N_BIG)):
        path = corpus_dir(n)
        docs = spark.read.parquet(path)
        rd0, wr0 = _shuffle_totals(spark)
        t0 = time.perf_counter()
        out = remove_duplicate_substrings(docs, "doc_id", min_tokens=K)
        intro_doc = F.col("doc_id") % 10 != 0
        first_doc = F.col("doc_id") == 1
        # victims rebuild to exactly the body = the original minus the
        # intro prefix and its separator space
        expected = F.when(
            intro_doc & ~first_doc,
            F.substring(F.col("orig"), len(INTRO) + 2, 1 << 30),
        ).otherwise(F.col("orig"))
        joined = out.alias("o").join(
            docs.select("doc_id", F.col("text").alias("orig")), "doc_id")
        n_rows, n_ok, n_unique_identical = joined.select(
            F.count(F.lit(1)),
            F.sum((F.col("text") == expected).cast("long")),
            F.sum((~intro_doc & (F.col("text") == F.col("orig")))
                  .cast("long")),
        ).first()
        wall = time.perf_counter() - t0
        rd1, wr1 = _shuffle_totals(spark)
        assert n_rows == n, n_rows
        assert n_ok == n, (n_ok, n)
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
