"""Streaming parity for the clean_corpus stateless prefix (r6, VERDICT
r5 #7): exact dedup (dropDuplicatesWithinWatermark on the content key)
+ the fused quality gate, batch == stream on the same corpus within the
watermark horizon."""

import datetime
import unicodedata

from pyspark.sql import functions as F


def _mk_batch(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, warc_ts timestamp, text string")


def test_streaming_clean_prefix_matches_batch(spark, tmp_path):
    """Two micro-batches replayed in id order: originals first, then
    clones + fresh docs. The streamed exact-dedup + fused-gate pipeline
    must keep exactly the rows the batch clean_corpus prefix keeps."""
    from jsonschemaparse_spark.functions.pipeline import clean_corpus
    from jsonschemaparse_spark.functions.text import quality_flags
    from jsonschemaparse_spark.streaming import streaming_exact_dedup

    t0 = datetime.datetime(2026, 8, 17, 12, 0, 0)
    body = ("A perfectly reasonable document sentence with many words. " * 10
            + "It closes with proper sentences. One more here. Done now!")
    batch1 = [(i, t0, body + f" Trailer {i}.") for i in range(5)]
    batch1.append((5, t0, "- bullets\n- only"))            # gopher reject
    batch2 = [(100, t0 + datetime.timedelta(minutes=1), batch1[0][2]),  # clone of 0
              (101, t0 + datetime.timedelta(minutes=1), batch1[1][2]),  # clone of 1
              (102, t0 + datetime.timedelta(minutes=1),
               "function f() { }" + body + " Ending sentence here!"),   # c4 reject
              (103, t0 + datetime.timedelta(minutes=1), body + " Fresh tail.")]

    src = str(tmp_path / "src")
    _mk_batch(spark, batch1).coalesce(1).write.mode("overwrite").parquet(src)

    def pipe(frame):
        deduped = streaming_exact_dedup(frame, watermark="2 hours")
        gated = quality_flags(deduped).filter(F.col("quality_keep"))
        return gated.select("doc_id")

    stream = spark.readStream.schema(
        "doc_id long, warc_ts timestamp, text string").parquet(src)
    q = (pipe(stream).writeStream.format("memory")
         .queryName("clean_prefix_sink").outputMode("append").start())
    try:
        q.processAllAvailable()
        _mk_batch(spark, batch2).coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
        streamed = sorted(r["doc_id"] for r in
                          spark.sql("select * from clean_prefix_sink").collect())
    finally:
        q.stop()

    res = clean_corpus(_mk_batch(spark, batch1 + batch2))
    batch_kept = sorted(r["doc_id"] for r in res.cleaned.collect())
    assert streamed == batch_kept, (streamed, batch_kept)
    # the clones and both gate rejects are gone; originals + fresh doc stay
    assert streamed == [0, 1, 2, 3, 4, 103]


def test_streaming_exact_dedup_drops_within_watermark(spark, tmp_path):
    """A duplicate arriving in a LATER micro-batch (inside the horizon)
    is dropped by state, not just within-batch dedup."""
    from jsonschemaparse_spark.streaming import streaming_exact_dedup

    t0 = datetime.datetime(2026, 8, 17, 12, 0, 0)
    src = str(tmp_path / "src2")
    _mk_batch(spark, [(1, t0, "same text"), (2, t0, "other text")]) \
        .coalesce(1).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(
        "doc_id long, warc_ts timestamp, text string").parquet(src)
    q = (streaming_exact_dedup(stream, watermark="2 hours")
         .select("doc_id").writeStream.format("memory")
         .queryName("dedup_sink").outputMode("append").start())
    try:
        q.processAllAvailable()
        _mk_batch(spark, [(9, t0 + datetime.timedelta(minutes=5), "same text")]) \
            .coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
        got = sorted(r["doc_id"] for r in
                     spark.sql("select * from dedup_sink").collect())
    finally:
        q.stop()
    assert got == [1, 2], got


# =========================================================================
# moved from test_round5_fixes.py (round-fix regression pins, split by
# topic per VERDICT r5 #8)
# =========================================================================
import pytest  # noqa: E402,F811,F401
from pyspark.sql import functions as F  # noqa: E402,F811,F401

def test_quality_gates_on_structured_streaming(spark, tmp_path):
    """gopher_quality_flags + c4_quality_flags are pure projections, so
    they run UNCHANGED on a readStream source — batch and streaming
    results agree row-for-row."""
    from pyspark.sql import functions as F

    from jsonschemaparse_spark.functions.text import (
        c4_quality_flags,
        gopher_quality_flags,
    )

    body = " ".join(f"w{i}x" for i in range(60))
    docs = [
        (1, body + ". Second sentence here. Third sentence now."),
        (2, "too short"),
        (3, body + ". Has a badphrase here. Third sentence now."),
    ]
    d = str(tmp_path / "docs")
    spark.createDataFrame(docs, "doc_id long, text string") \
        .coalesce(1).write.parquet(d)

    def gates(frame):
        out = gopher_quality_flags(frame)
        out = c4_quality_flags(out, badwords=["badphrase"])
        return out.select("doc_id", "gopher_keep", "c4_keep")

    batch = {r["doc_id"]: (r["gopher_keep"], r["c4_keep"])
             for r in gates(spark.read.parquet(d)).collect()}

    stream = spark.readStream.schema("doc_id long, text string").parquet(d)
    q = (gates(stream).writeStream.format("memory")
         .queryName("quality_sink").outputMode("append").start())
    try:
        q.processAllAvailable()
        got = {r["doc_id"]: (r["gopher_keep"], r["c4_keep"])
               for r in spark.sql("select * from quality_sink").collect()}
    finally:
        q.stop()
    assert got == batch and len(got) == 3
    assert batch[1] == (True, True)
    assert batch[2][0] is False      # gopher n_words gate
    assert batch[3][1] is False      # c4 badwords gate



def test_streaming_pii_redact_matches_batch(spark, tmp_path):
    """r6 stage 6: redact_pii is a stateless projection, so the full
    stateless prefix exact-dedup -> gates -> scrub streams with row-level
    parity (ids AND redacted bytes) against clean_corpus(pii_redact=True)."""
    from jsonschemaparse_spark.functions.pii import redact_pii
    from jsonschemaparse_spark.functions.pipeline import clean_corpus
    from jsonschemaparse_spark.functions.text import quality_flags
    from jsonschemaparse_spark.streaming import streaming_exact_dedup

    t0 = datetime.datetime(2026, 8, 17, 12, 0, 0)
    body = ("A perfectly reasonable document sentence with many words. " * 10
            + "It closes with proper sentences. One more here. Done now!")
    rows = [
        (0, t0, body + " Mail me at spam@example.org today."),
        (1, t0, body + " Call +1 555-123-4567 anytime."),
        (2, t0, body + " Nothing personal in this one."),
        (100, t0 + datetime.timedelta(minutes=1),
         body + " Mail me at spam@example.org today."),     # clone of 0
    ]
    src = str(tmp_path / "src3")
    _mk_batch(spark, rows[:3]).coalesce(1).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(
        "doc_id long, warc_ts timestamp, text string").parquet(src)
    pipe = redact_pii(
        quality_flags(streaming_exact_dedup(stream, watermark="2 hours"))
        .filter(F.col("quality_keep"))).select("doc_id", "text")
    q = (pipe.writeStream.format("memory")
         .queryName("pii_sink").outputMode("append").start())
    try:
        q.processAllAvailable()
        _mk_batch(spark, rows[3:]).coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
        streamed = sorted(
            (r["doc_id"], r["text"])
            for r in spark.sql("select * from pii_sink").collect())
    finally:
        q.stop()

    res = clean_corpus(_mk_batch(spark, rows), pii_redact=True)
    batch_kept = sorted((r["doc_id"], r["text"])
                        for r in res.cleaned.collect())
    assert streamed == batch_kept
    by_id = dict(streamed)
    assert "<EMAIL>" in by_id[0] and "<PHONE>" in by_id[1]
    assert "spam@example.org" not in by_id[0]
    assert 100 not in by_id


def test_streaming_classifier_gate_matches_batch(spark, tmp_path):
    """r6 stage 3b: the model-based gate is a stateless projection, so
    exact-dedup -> heuristic gates -> classifier streams with row-level
    parity against clean_corpus(classifier_threshold=...)."""
    from jsonschemaparse_spark.functions.classifier import quality_score
    from jsonschemaparse_spark.functions.pipeline import clean_corpus
    from jsonschemaparse_spark.functions.text import quality_flags
    from jsonschemaparse_spark.streaming import streaming_exact_dedup

    t0 = datetime.datetime(2026, 8, 17, 12, 0, 0)
    body = ("A perfectly reasonable document sentence with many words. " * 10
            + "It closes with proper sentences. One more here. Done now!")
    w = {"reasonable": 1.0, "spammy": -5.0}
    rows = [
        (0, t0, body + " Extra reasonable trailer."),
        (1, t0, body.replace("reasonable", "spammy") + " Sad trailer."),
        (100, t0 + datetime.timedelta(minutes=1),
         body + " Extra reasonable trailer."),               # clone of 0
        (101, t0 + datetime.timedelta(minutes=1), body + " Fresh tail."),
    ]
    src = str(tmp_path / "src4")
    _mk_batch(spark, rows[:2]).coalesce(1).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(
        "doc_id long, warc_ts timestamp, text string").parquet(src)
    pipe = (quality_flags(streaming_exact_dedup(stream, watermark="2 hours"))
            .filter(F.col("quality_keep"))
            .withColumn("_s", quality_score(F.col("text"), w))
            .filter(F.col("_s") > 0.01).select("doc_id"))
    q = (pipe.writeStream.format("memory")
         .queryName("cls_sink").outputMode("append").start())
    try:
        q.processAllAvailable()
        _mk_batch(spark, rows[2:]).coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
        streamed = sorted(r["doc_id"] for r in
                          spark.sql("select * from cls_sink").collect())
    finally:
        q.stop()

    res = clean_corpus(_mk_batch(spark, rows), classifier_threshold=0.01,
                       classifier_weights=w)
    batch_kept = sorted(r["doc_id"] for r in res.cleaned.collect())
    assert streamed == batch_kept
    assert streamed == [0, 101]   # spammy doc gated, clone deduped


def test_streaming_bloom_route_matches_batch(spark, tmp_path):
    """The snapshot-dedup Bloom probe is stateless, so a streaming ingest
    can route against a PUBLISHED snapshot bitmap (save_bloom artifact):
    the streamed negative branch must equal the batch bloom-negative set,
    and it never leaks a true dup (no false negatives across restarts —
    the bitmap is driver state, not stream state)."""
    import datetime

    from pyspark.sql import functions as F

    from jsonschemaparse_spark.functions.snapshot import (
        bloom_probe_column,
        build_key_bloom,
        load_bloom,
        probe_key,
        save_bloom,
    )

    t0 = datetime.datetime(2026, 8, 17, 12, 0, 0)
    seen_rows = [(i, t0, f"snapshot document number {i} body") for i in range(50)]
    seen = _mk_batch(spark, seen_rows)
    bloom = build_key_bloom(
        seen.select(probe_key(F.col("text")).alias("_pk")), "_pk")
    path = str(tmp_path / "snap.bloom")
    save_bloom(bloom, path)
    published = load_bloom(path)

    # batch 1: 5 re-crawls + 5 fresh; batch 2: 3 re-crawls + 2 fresh
    b1 = [(100 + i, t0, seen_rows[i][2]) for i in range(5)] + \
         [(200 + i, t0, f"fresh page {i} body") for i in range(5)]
    b2 = [(300 + i, t0, seen_rows[10 + i][2]) for i in range(3)] + \
         [(400 + i, t0, f"fresh later page {i} body") for i in range(2)]

    src = str(tmp_path / "stream_src")
    _mk_batch(spark, b1).coalesce(1).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(
        "doc_id long, warc_ts timestamp, text string").parquet(src)
    routed = stream.filter(
        ~bloom_probe_column(spark, published, probe_key(F.col("text"))))
    q = (routed.select("doc_id").writeStream.format("memory")
         .queryName("bloom_route_sink").outputMode("append").start())
    try:
        q.processAllAvailable()
        _mk_batch(spark, b2).coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
        streamed = sorted(r["doc_id"] for r in
                          spark.sql("select * from bloom_route_sink").collect())
    finally:
        q.stop()

    whole = _mk_batch(spark, b1 + b2)
    batch_neg = sorted(
        r["doc_id"] for r in whole.filter(
            ~bloom_probe_column(spark, published, probe_key(F.col("text"))))
        .select("doc_id").collect())
    assert streamed == batch_neg, (streamed, batch_neg)
    # no false negatives: every re-crawl id is absent from the negatives
    recrawls = {r[0] for r in b1[:5] + b2[:3]}
    assert not (set(streamed) & recrawls)


def test_streaming_normalize_stage_matches_batch(spark, tmp_path):
    """normalize_text is a stateless projection (Arrow UDF + regex
    chain), so the normalize -> exact-dedup streaming prefix is exact:
    an NFD clone arriving in a later micro-batch is dropped just as the
    batch pipeline drops it."""
    from jsonschemaparse_spark.functions.normalize import normalize_text
    from jsonschemaparse_spark.streaming import streaming_exact_dedup

    t0 = datetime.datetime(2026, 8, 17, 12, 0, 0)
    body = "A café sentence with words. " * 8 + "Proper ending here!"
    batch1 = [(0, t0, body), (1, t0, body + " Tail one.")]
    batch2 = [(100, t0 + datetime.timedelta(minutes=1),
               unicodedata.normalize("NFD", body)),        # NFD clone of 0
              (101, t0 + datetime.timedelta(minutes=1), body + " Fresh.")]

    src = str(tmp_path / "src_norm")
    _mk_batch(spark, batch1).coalesce(1).write.mode("overwrite").parquet(src)

    def pipe(frame):
        return streaming_exact_dedup(
            normalize_text(frame), watermark="2 hours").select("doc_id")

    stream = spark.readStream.schema(
        "doc_id long, warc_ts timestamp, text string").parquet(src)
    q = (pipe(stream).writeStream.format("memory")
         .queryName("norm_prefix_sink").outputMode("append").start())
    try:
        q.processAllAvailable()
        _mk_batch(spark, batch2).coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
        got = sorted(r["doc_id"] for r in
                     spark.sql("select * from norm_prefix_sink").collect())
    finally:
        q.stop()
    assert got == [0, 1, 101]


def test_streaming_bpe_encode_matches_batch(spark, tmp_path):
    """bpe_encode is a stateless Arrow projection (broadcast rank
    table), so it runs unchanged on a stream: token arrays per doc_id
    equal the batch encoding of the same corpus."""
    from jsonschemaparse_spark.functions.tokenizer import (
        BpeModel,
        bpe_encode,
    )

    t0 = datetime.datetime(2026, 8, 18, 9, 0, 0)
    model = BpeModel(merges=[("t", "h"), ("th", "e</w>"), ("e", "r</w>")])
    batch1 = [(0, t0, "the weather"), (1, t0, "other than the")]
    batch2 = [(2, t0 + datetime.timedelta(minutes=1), "ether the")]

    src = str(tmp_path / "src_bpe")
    _mk_batch(spark, batch1).coalesce(1).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(
        "doc_id long, warc_ts timestamp, text string").parquet(src)
    q = (bpe_encode(stream, model).select("doc_id", "bpe_tokens")
         .writeStream.format("memory")
         .queryName("bpe_sink").outputMode("append").start())
    try:
        q.processAllAvailable()
        _mk_batch(spark, batch2).coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
        got = {r["doc_id"]: list(r["bpe_tokens"]) for r in
               spark.sql("select * from bpe_sink").collect()}
    finally:
        q.stop()

    all_rows = _mk_batch(spark, batch1 + batch2)
    want = {r["doc_id"]: list(r["bpe_tokens"]) for r in
            bpe_encode(all_rows, model).collect()}
    assert got == want and set(got) == {0, 1, 2}


def test_streaming_compress_gate_matches_batch(spark, tmp_path):
    """The compressibility gate is a stateless Arrow projection, so it
    extends the streaming stateless prefix: streamed keep set equals
    the batch gate on the same corpus."""
    from jsonschemaparse_spark.functions.compress import compressibility_gate

    t0 = datetime.datetime(2026, 8, 18, 10, 0, 0)
    prose = "Distinct words arranged without repetition patterns here. " * 4
    batch1 = [(0, t0, prose), (1, t0, "spam " * 300)]
    batch2 = [(2, t0 + datetime.timedelta(minutes=1), prose + " More.")]

    src = str(tmp_path / "src_compress")
    _mk_batch(spark, batch1).coalesce(1).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(
        "doc_id long, warc_ts timestamp, text string").parquet(src)
    q = (compressibility_gate(stream, min_ratio=0.25)
         .filter(F.col("compress_keep")).select("doc_id")
         .writeStream.format("memory")
         .queryName("compress_sink").outputMode("append").start())
    try:
        q.processAllAvailable()
        _mk_batch(spark, batch2).coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
        got = sorted(r["doc_id"] for r in
                     spark.sql("select * from compress_sink").collect())
    finally:
        q.stop()
    want = sorted(
        r["doc_id"] for r in
        compressibility_gate(_mk_batch(spark, batch1 + batch2),
                             min_ratio=0.25)
        .filter(F.col("compress_keep")).select("doc_id").collect())
    assert got == want == [0, 2]


def test_streaming_quality_report_matches_batch(spark, tmp_path):
    """The windowed quality report's counts equal the batch
    quality_report on the same corpus, per (window, lang) — the gates
    are stateless, so only the window key is new."""
    from jsonschemaparse_spark.functions.text import quality_report
    from jsonschemaparse_spark.streaming import streaming_quality_report

    t0 = datetime.datetime(2026, 8, 18, 11, 0, 0)
    good = ("A long and varied sentence with plenty of distinct words "
            "to pass the gopher gate comfortably. " * 6
            + "It ends with several proper sentences. Another one. Done!")
    rows = [(i, t0, good + f" Marker {i}.", "en") for i in range(4)]
    rows += [(10, t0, "- bullets\n- only", "de"),
             (11, t0 + datetime.timedelta(minutes=30),
              good + " Later window.", "en")]
    df = spark.createDataFrame(
        rows, "doc_id long, warc_ts timestamp, text string, lang string")

    src = str(tmp_path / "src_qr")
    df.coalesce(1).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(
        "doc_id long, warc_ts timestamp, text string, lang string"
    ).parquet(src)
    q = (streaming_quality_report(stream, window="10 minutes",
                                  watermark="1 hour")
         .writeStream.format("memory").queryName("qr_sink")
         .outputMode("complete").start())
    try:
        q.processAllAvailable()
        got = {(r["window"]["start"].minute, r["lang"]):
               (r["n_docs"], r["n_gopher_keep"], r["n_c4_keep"], r["n_keep"])
               for r in spark.sql("select * from qr_sink").collect()}
    finally:
        q.stop()

    # two windows (t0 and t0+30min), per-lang groups
    assert got[(0, "en")] == (4, 4, 4, 4)
    assert got[(0, "de")][0] == 1 and got[(0, "de")][3] == 0
    assert got[(30, "en")] == (1, 1, 1, 1)
    # batch twin agrees on the totals per lang
    batch = {r["lang"]: (r["n_docs"], r["n_keep"]) for r in
             quality_report(df, group_cols=("lang",)).collect()}
    assert batch["en"] == (5, 5) and batch["de"] == (1, 0)


def test_streaming_quality_report_append_drops_late_rows(spark, tmp_path):
    """Append mode + watermark: a window's row is emitted once the
    watermark passes its end, and a document arriving AFTER the
    watermark has moved past its window is dropped — late data is
    bounded, the 100-TB monitoring contract."""
    from jsonschemaparse_spark.streaming import streaming_quality_report

    t0 = datetime.datetime(2026, 8, 18, 12, 0, 0)
    good = ("Plenty of distinct words fill this sentence so the gate "
            "passes without trouble. " * 6
            + "Proper sentences close it. Another. Done!")
    mk = lambda rows: spark.createDataFrame(
        rows, "doc_id long, warc_ts timestamp, text string, lang string")

    src = str(tmp_path / "src_qr_late")
    mk([(0, t0, good, "en"), (1, t0, good + " Two.", "en")]) \
        .coalesce(1).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(
        "doc_id long, warc_ts timestamp, text string, lang string"
    ).parquet(src)
    q = (streaming_quality_report(stream, window="10 minutes",
                                  watermark="10 minutes")
         .writeStream.format("memory").queryName("qr_late_sink")
         .outputMode("append").start())
    try:
        q.processAllAvailable()
        # advance event time far past t0's window + watermark
        mk([(2, t0 + datetime.timedelta(hours=2), good + " Later.", "en")]) \
            .coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
        # a LATE arrival for the long-closed t0 window: dropped
        mk([(3, t0, good + " Late.", "en")]) \
            .coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
        rows = spark.sql("select * from qr_late_sink").collect()
    finally:
        q.stop()
    emitted = {(r["window"]["start"].hour, r["window"]["start"].minute):
               r["n_docs"] for r in rows}
    # the t0 window was finalized with exactly the 2 on-time docs; the
    # late doc 3 did not reopen or recount it
    assert emitted.get((12, 0)) == 2
