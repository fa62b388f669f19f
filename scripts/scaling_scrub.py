"""10x smoke for the r6 scrub/sampling operators (pii_flags+redact_pii,
stratified_sample), extending the per-family two-point scale evidence
(flagship r4, minhash + similarity r5, lines r5, spans r6).

Corpus: N docs whose text embeds one email, one phone, one IP, and an
SSN around unique filler (the worst case for the scrub: every doc has
matches, so redaction rewrites every row). Expectations at 10x:
  * pii: per-doc wall ~constant, shuffle EXACTLY 0 bytes (pure Project
    feeding a 1-row agg... the agg moves 32 partial rows, ~nothing);
  * sample: per-doc wall ~constant, zero shuffle, and the kept-id SAMPLE
    SET of the small corpus is a strict subset relation check: the same
    ids kept at both sizes (keys 0..N_SMALL exist in both corpora and
    the decision is per-key) — the determinism claim measured, not
    assumed, at 5M keys.

Run:  python scripts/scaling_scrub.py [n_big] [n_small]
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

    from jsonschemaparse_spark.functions.pii import pii_flags, redact_pii
    from jsonschemaparse_spark.functions.sampling import stratified_sample

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("scaling-scrub")
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
        filler = F.concat_ws(
            " ",
            *[F.concat(F.lit(f"w{j}x"),
                       (F.abs(F.xxhash64(i, F.lit(j))) % 1_000_000)
                       .cast("string"))
              for j in range(20)],
        )
        text = F.concat(
            F.lit("Contact user"), i.cast("string"),
            F.lit("@example.com or +1 555-123-4567 from 10.2."),
            (i % 256).cast("string"),
            F.lit(".7 id 123-45-6789. "), filler,
        )
        lang = F.element_at(
            F.array(F.lit("en"), F.lit("de"), F.lit("fr"), F.lit("es"),
                    F.lit("zh")),
            (i % 5 + 1).cast("int"))
        d = tempfile.mkdtemp(prefix=f"scrub_smoke_{n}_")
        ids.select(i.alias("doc_id"), text.alias("text"),
                   lang.alias("lang")) \
            .write.mode("overwrite").parquet(d)
        return d

    FR = {"en": 0.9, "de": 0.5, "fr": 0.25, "es": 1.0}
    results: dict = {}
    kept_small: set | None = None
    for label, n in (("small", N_SMALL), ("big", N_BIG)):
        path = corpus_dir(n)
        docs = spark.read.parquet(path)

        scrubbed = pii_flags(redact_pii(docs, out_col="red"))

        # verify-while-measuring: every doc has all 4 PII kinds and the
        # redaction removes every one of them from the rewritten text
        def pii_probe():
            return scrubbed.select(
                F.count(F.lit(1)),
                F.sum(((F.col("n_emails") == 1) & (F.col("n_phones") == 1)
                       & (F.col("n_ipv4") == 1) & (F.col("n_ssn_ids") == 1))
                      .cast("long")),
                F.sum((F.col("red").rlike("@example|555-123|123-45-6789"))
                      .cast("long")),
            ).first()

        # warmup + min-of-2 (bench methodology): the first cold pass on a
        # fresh corpus conflates page-cache fill + JIT tiering + the
        # host's throttle phases with engine cost — an un-warmed first
        # cut of this script read per-doc ratio 2.03 at 10x; the warmed
        # interleaved A/B adjudicated it to 0.85 (SCALING.md r6).
        spark._jvm.System.gc()
        pii_probe()
        rd0, wr0 = _shuffle_totals()
        walls = []
        for _ in range(2):
            t0 = time.perf_counter()
            n_rows, n_all4, n_left = pii_probe()
            walls.append(time.perf_counter() - t0)
        wall = min(walls)
        rd1, wr1 = _shuffle_totals()
        assert n_rows == n and n_all4 == n and n_left == 0, \
            (n_rows, n_all4, n_left)
        results[f"pii_{label}"] = {
            "n_docs": n, "wall_sec": round(wall, 2),
            "docs_per_sec": int(n / wall),
            "shuffle_write_mb": round((wr1 - wr0) / 1e6, 2),
        }
        # shuffle deltas cover the timed passes only (rd0 read after
        # warmup) — a Project has none either way

        kept = stratified_sample(docs, FR, "lang", "doc_id", seed=11,
                                 default_fraction=0.15)
        spark._jvm.System.gc()
        kept.count()
        rd0, wr0 = _shuffle_totals()
        walls = []
        for _ in range(2):
            t0 = time.perf_counter()
            n_kept = kept.count()
            walls.append(time.perf_counter() - t0)
        wall = min(walls)
        rd1, wr1 = _shuffle_totals()
        results[f"sample_{label}"] = {
            "n_docs": n, "n_kept": n_kept, "wall_sec": round(wall, 2),
            "docs_per_sec": int(n / wall),
            "shuffle_write_mb": round((wr1 - wr0) / 1e6, 2),
        }
        # determinism across corpus sizes: the kept subset of the ids
        # shared by both corpora must be IDENTICAL (sampled here to keep
        # the driver collect bounded)
        probe = kept.filter(F.col("doc_id") < 100_000) \
            .select("doc_id").collect()
        ids = {r["doc_id"] for r in probe}
        if kept_small is None:
            kept_small = ids
        else:
            assert ids == kept_small, "kept-set drift across corpus sizes"
            results["kept_set_identical_on_shared_keys"] = True

    for fam in ("pii", "sample"):
        s, b = results[f"{fam}_small"], results[f"{fam}_big"]
        results[f"{fam}_per_doc_ratio_big_vs_small"] = round(
            (b["wall_sec"] / b["n_docs"]) / (s["wall_sec"] / s["n_docs"]), 3)
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
