"""10x smoke for the r6 export-tier operators (classify_quality,
pack_sequences, latest_capture), extending the per-family two-point
scale evidence (flagship r4; minhash/similarity/lines r5; spans +
scrub/sampling r6).

Corpora (all synthesized deterministically from the row id):
  * classifier: docs of 20 id-derived pseudo-words — every row computes
    20 md5 weights (the worst case: no short docs). Expect constant
    per-doc wall, ZERO shuffle (pure Project into a 1-row agg), and the
    keep-decision set on the shared id range identical at both sizes
    (the decision reads only the row's own text).
  * packing: (doc_id, n_tokens = id % 13). Expect per-doc shuffle
    ~constant (the window moves one narrow (id, count) row per doc) and
    the in-measure arithmetic invariants to hold: total_tokens ==
    sum(id % 13), last sequence == ceil(total / L) - 1.
  * latest_capture: N captures over N/10 urls, 10 rounds; survivor of
    url u is deterministically the round-9 capture. Expect shuffle
    bounded by DISTINCT URLS (B/url ~constant, B/capture shrinking) —
    the map-side struct-max combine is the claim being measured.

Run:  python scripts/scaling_pack.py [n_big] [n_small]
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
SEQ_LEN = 2048
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

    from jsonschemaparse_spark.functions.classifier import classify_quality
    from jsonschemaparse_spark.functions.packing import pack_sequences
    from jsonschemaparse_spark.functions.web import latest_capture

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("scaling-pack")
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

    def timed(probe):
        """bench methodology: GC -> untimed warmup -> min-of-2, shuffle
        deltas covering the timed passes only."""
        spark._jvm.System.gc()
        probe()
        rd0, wr0 = _shuffle_totals()
        walls, out = [], None
        for _ in range(2):
            t0 = time.perf_counter()
            out = probe()
            walls.append(time.perf_counter() - t0)
        rd1, wr1 = _shuffle_totals()
        return min(walls), (wr1 - wr0), out

    results: dict = {}
    cls_checksum: dict[str, int] = {}
    for label, n in (("small", N_SMALL), ("big", N_BIG)):
        i = F.col("id")

        # ---- classifier corpus: 20 id-derived pseudo-words per doc
        text = F.concat_ws(
            " ",
            *[F.concat(F.lit(f"w{j}x"),
                       (F.abs(F.xxhash64(i, F.lit(j))) % 50_000).cast("string"))
              for j in range(20)])
        d = tempfile.mkdtemp(prefix=f"pack_smoke_cls_{n}_")
        spark.range(0, n, 1, CPUS * 2).select(
            i.alias("doc_id"), text.alias("text")) \
            .write.mode("overwrite").parquet(d)
        docs = spark.read.parquet(d)
        scored = classify_quality(docs, threshold=0.0)

        def cls_probe():
            return scored.select(
                F.count(F.lit(1)),
                F.sum(F.col("classifier_keep").cast("long"))).first()

        wall, wr, (n_rows, n_keep) = timed(cls_probe)
        assert n_rows == n
        results[f"classifier_{label}"] = {
            "n_docs": n, "wall_sec": round(wall, 2),
            "docs_per_sec": int(n / wall), "n_keep": n_keep,
            "shuffle_write_mb": round(wr / 1e6, 2)}
        # keep-set determinism on the shared id range (decision reads
        # only the row's own text, so it cannot depend on corpus size)
        cls_checksum[label] = scored.filter(
            F.col("doc_id") < min(N_SMALL, 100_000)) \
            .select(F.sum(F.when(F.col("classifier_keep"),
                                 F.col("doc_id")).otherwise(0))).first()[0]

        # ---- packing corpus: token counts are pure id arithmetic
        counts = spark.range(0, n, 1, CPUS * 2).select(
            i.alias("doc_id"), (i % 13).alias("n_tokens"))
        packed = pack_sequences(counts, "doc_id", "n_tokens", SEQ_LEN)

        def pack_probe():
            return packed.select(
                F.count(F.lit(1)), F.sum("n_tokens"),
                F.max(F.col("start_token") + F.col("n_tokens")),
                F.max("seq_last")).first()

        wall, wr, (n_rows, total, max_end, last_seq) = timed(pack_probe)
        exp_total = 78 * (n // 13) + sum(range(n % 13))
        assert n_rows == n and total == exp_total == max_end, \
            (n_rows, total, exp_total, max_end)
        assert last_seq == (exp_total - 1) // SEQ_LEN
        results[f"pack_{label}"] = {
            "n_docs": n, "wall_sec": round(wall, 2),
            "docs_per_sec": int(n / wall),
            "shuffle_write_mb": round(wr / 1e6, 2),
            "shuffle_b_per_doc": round(wr / n, 1)}

        # ---- latest_capture corpus: 10 rounds over n//10 urls
        n_urls = n // 10
        caps = spark.range(0, n, 1, CPUS * 2).select(
            F.concat(F.lit("https://h"), ((i % n_urls) % 7).cast("string"),
                     F.lit(".test/p/"), (i % n_urls).cast("string")).alias("url"),
            (i / n_urls).cast("long").alias("warc_ts"),
            i.alias("event_id"))
        latest = latest_capture(caps, url_col="url", ts_col="warc_ts",
                                id_col="event_id")

        def cap_probe():
            return latest.select(
                F.count(F.lit(1)),
                F.min("warc_ts"), F.sum("event_id")).first()

        wall, wr, (n_out, min_ts, id_sum) = timed(cap_probe)
        # survivor of url u is capture 9*n_urls + u (the round-9 row)
        exp_sum = 9 * n_urls * n_urls + n_urls * (n_urls - 1) // 2
        assert n_out == n_urls and min_ts == 9 and id_sum == exp_sum, \
            (n_out, min_ts, id_sum, exp_sum)
        results[f"capture_{label}"] = {
            "n_captures": n, "n_urls": n_urls, "wall_sec": round(wall, 2),
            "captures_per_sec": int(n / wall),
            "shuffle_write_mb": round(wr / 1e6, 2),
            "shuffle_b_per_url": round(wr / n_urls, 1)}

    assert cls_checksum["small"] == cls_checksum["big"], cls_checksum
    for op in ("classifier", "pack", "capture"):
        s, b = results[f"{op}_small"], results[f"{op}_big"]
        per = ("docs_per_sec" if "docs_per_sec" in s else "captures_per_sec")
        results[f"{op}_per_doc_ratio_big_over_small"] = round(
            s[per] / b[per], 3)
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
