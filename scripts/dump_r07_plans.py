"""Dump explain('formatted') for the r7-touched declared queries into
plans/r07/<query>_<tag>.txt.

Usage: python scripts/dump_r07_plans.py <tag> [repo_root] [out_dir]
  tag       'before' (run with repo_root = an r6 checkout) or 'after'
  repo_root tree whose __spark_entry__/package to import (default: this repo)
  out_dir   default <this repo>/plans/r07
"""

from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout
from pathlib import Path

HERE = Path(__file__).resolve().parents[1]

QUERIES = [
    "substring_dedup", "substring_spans", "c4_span_dedup",
    "minhash_signatures", "minhash_dup_pairs", "ngram_jaccard_pairs",
    "ngram_containment", "gopher_quality", "c4_quality", "quality_fused",
    "classifier_scores", "pii_scrub", "normalize_text", "doc_keywords",
    "index_postings", "bpe_tokens_sample", "decontaminate",
    "events_json_typed", "validate_documents", "incremental_new_docs",
    "lm_perplexity",
]

SF = "/root/testdata/sf0.01"


def main() -> None:
    tag = sys.argv[1]
    root = Path(sys.argv[2]).resolve() if len(sys.argv) > 2 else HERE
    out_dir = Path(sys.argv[3]) if len(sys.argv) > 3 else HERE / "plans" / "r07"
    out_dir.mkdir(parents=True, exist_ok=True)
    sys.path.insert(0, str(root))

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    qs = entry.queries()
    for name in QUERIES:
        if name not in qs:
            print(f"skip {name}: not in queries()")
            continue
        try:
            df = qs[name](spark, SF)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            (out_dir / f"{name}_{tag}.txt").write_text(buf.getvalue())
            print(f"wrote {name}_{tag}.txt")
        except Exception as e:  # noqa: BLE001
            print(f"FAILED {name}: {e}")
    spark.stop()


if __name__ == "__main__":
    main()
