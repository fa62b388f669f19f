"""One paired-A/B probe: time substring_dedup / gate_fused / classifier /
dedup_minhash on the tree given as argv[1], print one JSON line."""
import json
import sys
import time

sys.path.insert(0, sys.argv[1])

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.sql.execution.arrow.pyspark.enabled", "true")
         .config("spark.driver.memory", "16g")
         .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

from jsonschemaparse_spark.functions.dedup import (
    minhash_near_duplicates, remove_duplicate_substrings)
from jsonschemaparse_spark.functions.text import quality_flags
from jsonschemaparse_spark.functions.classifier import classify_quality

docs = spark.read.parquet("/root/testdata/sf1.0/documents.parquet")
out = {}


def bench(name, fn):
    spark._jvm.System.gc()
    fn()
    walls = []
    for _ in range(2):
        t0 = time.perf_counter()
        fn()
        walls.append(time.perf_counter() - t0)
    out[name] = round(min(walls), 3)


bench("substring_dedup", lambda: remove_duplicate_substrings(
    docs, "doc_id", min_tokens=8).select(F.sum(F.length("text"))).collect())
bench("gate_fused", lambda: quality_flags(docs).select(
    F.sum(F.when(F.col("quality_keep"), 1))).collect())
bench("classifier", lambda: classify_quality(docs, threshold=0.01).select(
    F.sum(F.when(F.col("classifier_keep"), 1))).collect())
bench("dedup_minhash", lambda: minhash_near_duplicates(
    docs, "doc_id", threshold=0.8).count())
print(json.dumps({"tree": sys.argv[1], **out}), flush=True)
spark.stop()
