"""10x smoke for the monitoring family — quality_report (per-group
fused-gate pass rates) and keep_rate_drift (crawl-over-crawl 2x2 chi2).

The claim under test: the monitoring views' SHUFFLE is bounded by the
group cardinality (one map-side-combined partial row per (task,
group)), not the corpus — so per-doc shuffle bytes must FALL ~10x when
the corpus grows 10x over a fixed group set.

Corpus: n docs over 24 (lang, source) groups; doc_id%7==0 rows are
gate-failing (bullet lists) so pass rates are non-trivial; the 'new'
version for drift drops every third doc and perturbs one lang's text
so exactly that lang drifts. Expectations verified in-measure:
  * quality_report emits exactly the 24 groups, total n_docs == n;
  * keep_rate_drift flags the perturbed lang and ONLY it (the
    perturbation flips a gate, not noise);
  * per-doc shuffle bytes fall ~10x at 10x docs.

Run:  python scripts/scaling_monitor.py [n_big] [n_small]
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
LANGS = ["en", "de", "fr", "es", "zh", "ru"]
SOURCES = ["crawl", "news", "wiki", "forum"]


def _shuffle_write(spark) -> int:
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    url = f"{ui}/api/v1/applications/{app_id}/stages"
    with urllib.request.urlopen(url, timeout=10) as r:
        stages = json.load(r)
    return sum(s.get("shuffleWriteBytes", 0) for s in stages)


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from jsonschemaparse_spark.functions.integrity import keep_rate_drift
    from jsonschemaparse_spark.functions.text import (
        quality_flags,
        quality_report,
    )

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("scaling-monitor")
        .config("spark.sql.shuffle.partitions", str(CPUS * 4))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.driver.extraJavaOptions",
                "-XX:+UseParallelGC -XX:+AlwaysPreTouch")
        .config("spark.ui.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    def corpus_dir(n: int) -> str:
        ids = spark.range(0, n, 1, CPUS * 2)
        i = F.col("id")
        # no repeated phrases: Gopher's duplicated-n-gram char fraction
        # rejects templated repetition (the first cut repeated a 5-gram
        # three times and every doc failed the gate)
        good = F.concat(
            F.lit("A varied opening sentence with plenty of distinct "
                  "words numbered "),
            i.cast("string"),
            F.lit(" should pass each gate comfortably. Subsequent prose "
                  "continues differently, offering fresh vocabulary and "
                  "genuine variety. Readers expect several complete "
                  "thoughts before any closing remark appears. Final "
                  "statements wrap things up politely today. Ten more "
                  "plain words are added so the fifty word floor is "
                  "cleared with a little room to spare. Good end!"),
        )
        bad = F.lit("- bullets\n- only\n- here")
        d = tempfile.mkdtemp(prefix=f"mon_smoke_{n}_")
        ids.select(
            i.alias("doc_id"),
            F.when(i % 7 == 0, bad).otherwise(good).alias("text"),
            F.element_at(F.array(*[F.lit(x) for x in LANGS]),
                         (i % 6 + 1).cast("int")).alias("lang"),
            # i%6 and i%4 share gcd 2 -> only 12 combos; divide first so
            # the two indices cycle independently (full 24 groups)
            F.element_at(F.array(*[F.lit(x) for x in SOURCES]),
                         (F.floor(i / 6) % 4 + 1).cast("int")).alias("source"),
        ).write.mode("overwrite").parquet(d)
        return d

    results = {}
    for label, n in (("small", N_SMALL), ("big", N_BIG)):
        path = corpus_dir(n)
        docs = spark.read.parquet(path)

        w0 = _shuffle_write(spark)
        t0 = time.perf_counter()
        rep = quality_report(docs).collect()
        rep_wall = time.perf_counter() - t0
        w1 = _shuffle_write(spark)
        assert len(rep) == len(LANGS) * len(SOURCES), len(rep)
        assert sum(r["n_docs"] for r in rep) == n

        # drift: new version drops every 3rd doc and breaks 'zh' docs
        old = quality_flags(docs).select("doc_id", "lang", "quality_keep")
        new_docs = docs.filter(F.col("doc_id") % 3 != 0).withColumn(
            "text",
            F.when(F.col("lang") == "zh", F.lit("- broken\n- bullets"))
            .otherwise(F.col("text")))
        new = quality_flags(new_docs).select("doc_id", "lang",
                                             "quality_keep")
        t0 = time.perf_counter()
        drift = keep_rate_drift(old, new, "quality_keep", ("lang",)) \
            .collect()
        drift_wall = time.perf_counter() - t0
        w2 = _shuffle_write(spark)
        flagged = sorted(r["lang"] for r in drift if r["drifted"])
        assert flagged == ["zh"], flagged

        results[label] = {
            "n_docs": n,
            "report_wall_sec": round(rep_wall, 2),
            "report_docs_per_sec": int(n / rep_wall),
            "report_shuffle_bytes_per_doc": round((w1 - w0) / n, 3),
            "drift_wall_sec": round(drift_wall, 2),
            "drift_shuffle_bytes_per_doc": round((w2 - w1) / n, 3),
        }
    s, b = results["small"], results["big"]
    results["report_shuffle_per_doc_ratio"] = round(
        b["report_shuffle_bytes_per_doc"]
        / max(s["report_shuffle_bytes_per_doc"], 1e-9), 3)
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
