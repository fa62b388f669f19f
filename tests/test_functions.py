"""Tests for stats/integrity/text/dedup/similarity/multimodal modules."""

import math

import pytest

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


# ---------------- stats -----------------------------------------------------
def test_column_profile(spark, documents):
    from jsonschemaparse_spark.functions.stats import column_profile

    prof = {r["column"]: r for r in column_profile(documents).collect()}
    assert prof["doc_id"]["count"] == documents.count()
    assert prof["doc_id"]["n_null"] == 0
    n = documents.count()
    assert abs(prof["doc_id"]["approx_distinct"] - n) <= 0.1 * n
    assert prof["n_chars"]["avg"] is not None
    assert len(prof["n_chars"]["quantiles"]) == 4


def test_top_k(spark, documents):
    from jsonschemaparse_spark.functions.stats import top_k

    rows = top_k(documents, "lang", 3).collect()
    assert rows[0]["value"] == "en"
    assert rows[0]["cnt"] >= rows[1]["cnt"] >= rows[2]["cnt"]


def test_count_min_sketch(spark, documents):
    from jsonschemaparse_spark.functions.stats import count_min_sketch

    cms = count_min_sketch(documents, "lang", depth=5, width=1024)
    exact = {r["lang"]: r["cnt"] for r in
             documents.groupBy("lang").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    for lang, cnt in exact.items():
        est = cms.estimate(lang)
        assert cnt <= est <= cnt + 0.02 * cms.total  # CMS overestimates only


# ---------------- stats math -------------------------------------------------
def test_ks_math():
    from jsonschemaparse_spark.functions.stats_math import ks_2samp_pvalue

    assert ks_2samp_pvalue(0.01, 1000, 1000) > 0.5
    assert ks_2samp_pvalue(0.5, 1000, 1000) < 1e-6


def test_chi2_math():
    from jsonschemaparse_spark.functions.stats_math import chi2_sf

    # known value: chi2 sf(3.84, 1) ≈ 0.05
    assert abs(chi2_sf(3.841, 1) - 0.05) < 0.002
    assert abs(chi2_sf(0.0, 5) - 1.0) < 1e-9
    assert chi2_sf(100.0, 3) < 1e-12


# ---------------- integrity ---------------------------------------------------
def test_uniqueness(spark, documents):
    from jsonschemaparse_spark.functions.integrity import (
        uniqueness_check,
        uniqueness_violations,
    )

    assert uniqueness_violations(documents, "doc_id").count() == 0
    chk = uniqueness_check(documents, "doc_id")
    assert chk["probably_unique"] is True

    dup = documents.union(documents.limit(5))
    assert uniqueness_violations(dup, "doc_id").count() == 5


def test_referential(spark):
    from jsonschemaparse_spark.functions.integrity import (
        referential_check,
        referential_violations,
    )

    orders = spark.read.parquet(f"{SF}/orders.parquet")
    customer = spark.read.parquet(f"{SF}/customer.parquet")
    ok = referential_check(orders, "o_custkey", customer, "c_custkey")
    assert ok["pass"] is True

    # drop some parents -> orphans appear
    some = customer.filter(F.col("c_custkey") % 2 == 0)
    bad = referential_violations(orders, "o_custkey", some, "c_custkey")
    assert bad.count() > 0


def test_referential_broadcast_plan(spark):
    """Small parent must produce a broadcast join, not a sort-merge."""
    import io
    from contextlib import redirect_stdout

    from jsonschemaparse_spark.functions.integrity import referential_violations

    orders = spark.read.parquet(f"{SF}/orders.parquet")
    customer = spark.read.parquet(f"{SF}/customer.parquet")
    bad = referential_violations(orders, "o_custkey", customer, "c_custkey")
    buf = io.StringIO()
    with redirect_stdout(buf):
        bad.explain("formatted")
    assert "BroadcastHashJoin" in buf.getvalue()


def test_ks_drift(spark, documents):
    from jsonschemaparse_spark.functions.integrity import ks_drift

    same = ks_drift(documents, documents, "n_chars")
    assert not same.drifted and same.statistic < 0.01

    shifted = documents.withColumn("n_chars", F.col("n_chars") + 200)
    diff = ks_drift(documents, shifted, "n_chars")
    assert diff.drifted and diff.p_value < 0.01


def test_ks_drift_two_jobs_and_bounds_param(spark, documents):
    """VERDICT r2 #5: the statistic costs exactly two driver actions
    (union'd bounds agg + side-tagged histogram agg); passing bounds=
    drops to one. Verified via job-group job counts, and the statistic is
    invariant to how the grid was obtained."""
    from jsonschemaparse_spark.functions.integrity import ks_drift

    shifted = documents.withColumn("n_chars", F.col("n_chars") + 200)
    sc = spark.sparkContext

    # AQE materializes each shuffle stage as its own job, hiding the
    # action count; with it off, jobs == driver actions.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        sc.setJobGroup("ksd2", "ks two-action check")
        full = ks_drift(documents, shifted, "n_chars")
        sc.setJobGroup("", "")
        assert len(sc.statusTracker().getJobIdsForGroup("ksd2")) <= 2
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")

    lo = documents.agg(F.min("n_chars")).first()[0]
    hi = shifted.agg(F.max("n_chars")).first()[0]
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        sc.setJobGroup("ksd1", "ks one-action check")
        pre = ks_drift(documents, shifted, "n_chars", bounds=(float(lo), float(hi)))
        sc.setJobGroup("", "")
        assert len(sc.statusTracker().getJobIdsForGroup("ksd1")) == 1
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert pre.statistic == full.statistic
    assert (pre.n_left, pre.n_right) == (full.n_left, full.n_right)


def test_chi2_drift(spark, documents):
    from jsonschemaparse_spark.functions.integrity import chi2_drift

    same = chi2_drift(documents, documents, "lang")
    assert not same.drifted

    skewed = documents.withColumn(
        "lang", F.when(F.col("lang") == "en", "zz").otherwise(F.col("lang"))
    )
    diff = chi2_drift(documents, skewed, "lang")
    assert diff.drifted


# ---------------- text ---------------------------------------------------------
def test_token_counts(spark):
    from jsonschemaparse_spark.functions.text import bpe_token_count, token_count

    df = spark.createDataFrame([("a b  c",), ("",), ("hi, there!",)], ["text"])
    got = df.select(
        token_count(F.col("text")).alias("ws"),
        bpe_token_count(F.col("text")).alias("bpe"),
    ).collect()
    assert [r["ws"] for r in got] == [3, 0, 2]
    assert [r["bpe"] for r in got] == [3, 0, 4]  # hi , there !


def test_quality_features(spark, documents):
    from jsonschemaparse_spark.functions.text import quality_features

    q = quality_features(documents)
    rows = q.select("quality_score", "n_tokens", "alpha_ratio").collect()
    assert all(0.0 <= r["quality_score"] <= 1.0 for r in rows)
    assert all(r["n_tokens"] > 0 for r in rows)


def test_detect_language(spark):
    from jsonschemaparse_spark.functions.text import detect_language

    df = spark.createDataFrame(
        [
            (1, "the cat is in the house and it is warm"),
            (2, "der Hund ist nicht auf der Couch und das ist gut"),
            (3, "le chat est dans la maison et il est pas content"),
            (4, "zzz qqq vvv"),
        ],
        ["id", "text"],
    )
    got = {r["id"]: r["lang_pred"] for r in detect_language(df).collect()}
    assert got[1] == "en" and got[2] == "de" and got[3] == "fr" and got[4] == "und"


def test_fingerprint_normalization(spark):
    from jsonschemaparse_spark.functions.text import with_fingerprint

    df = spark.createDataFrame(
        [(1, "Hello  World"), (2, "hello world"), (3, "different")], ["id", "text"]
    )
    got = {r["id"]: r["fingerprint"] for r in with_fingerprint(df).collect()}
    assert got[1] == got[2] != got[3]


# ---------------- dedup ---------------------------------------------------------
@pytest.fixture(scope="module")
def dup_docs(spark):
    base = spark.read.parquet(f"{SF}/documents.parquet").limit(100)
    clones = base.limit(10).withColumn("doc_id", F.col("doc_id") + 100000)
    near = (
        base.limit(5)
        .withColumn("doc_id", F.col("doc_id") + 200000)
        .withColumn("text", F.concat(F.col("text"), F.lit(" tail extra")))
    )
    df = base.union(clones).union(near)
    df.cache().count()
    return df


def test_exact_dedup(spark, dup_docs):
    from jsonschemaparse_spark.functions.dedup import exact_dedup, exact_duplicate_groups

    groups = exact_duplicate_groups(dup_docs, "doc_id")
    assert groups.count() == 10
    assert all(r["n_docs"] == 2 for r in groups.collect())

    deduped = exact_dedup(dup_docs, "doc_id")
    assert deduped.count() == dup_docs.count() - 10
    # keeps the smaller id of each clone pair
    assert deduped.filter(F.col("doc_id") >= 100000).filter(F.col("doc_id") < 200000).count() == 0


def test_minhash_near_duplicates(spark, dup_docs):
    from jsonschemaparse_spark.functions.dedup import minhash_near_duplicates

    pairs = minhash_near_duplicates(dup_docs, "doc_id", threshold=0.5)
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs.collect()}
    # all 10 exact clones must be found with jaccard 1.0
    exact_pairs = [(i, i + 100000) for i in range(10)]
    for p in exact_pairs:
        assert p in got and got[p] == 1.0
    # near-dups (appended tail) should surface too with jaccard < 1
    near = [(a, b) for (a, b) in got if b >= 200000]
    assert len(near) >= 3
    assert all(got[p] < 1.0 for p in near)


def test_simhash_near_duplicates(spark, dup_docs):
    from jsonschemaparse_spark.functions.dedup import simhash_near_duplicates

    pairs = simhash_near_duplicates(dup_docs, "doc_id", max_hamming=0)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    for i in range(10):
        assert (i, i + 100000) in got


def test_ngram_jaccard(spark, dup_docs):
    from jsonschemaparse_spark.functions.dedup import ngram_jaccard_pairs

    subset = dup_docs.filter((F.col("doc_id") < 30) | (F.col("doc_id") >= 100000))
    pairs = ngram_jaccard_pairs(subset, "doc_id", threshold=0.9)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    # every clone pair present in the subset must be found with jaccard ~1
    assert all((i, i + 100000) in got for i in range(10))


# ---------------- similarity -----------------------------------------------------
@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_brute_force_topk(spark, embeddings):
    from jsonschemaparse_spark.functions.similarity import brute_force_topk

    q = embeddings.select("embedding").first()["embedding"]
    top = brute_force_topk(embeddings, q, k=5).collect()
    assert len(top) == 5
    assert top[0]["score"] == pytest.approx(1.0, abs=1e-4)  # itself
    assert all(top[i]["score"] >= top[i + 1]["score"] for i in range(4))


def test_lsh_topk_overlaps_exact(spark, embeddings):
    from jsonschemaparse_spark.functions.similarity import brute_force_topk, lsh_topk

    q = embeddings.select("embedding").first()["embedding"]
    exact = [r["vec_id"] for r in brute_force_topk(embeddings, q, k=10).collect()]
    approx = [r["vec_id"] for r in lsh_topk(embeddings, q, k=10, n_planes=2).collect()]
    # the query vector itself (cosine 1.0) must be in its own bucket, and
    # some of the true top-k should survive the 1/4 bucket restriction;
    # synthetic embeddings are near-orthogonal so recall is inherently modest
    assert exact[0] in approx
    assert len(set(exact) & set(approx)) >= 2


def test_embedding_near_duplicates(spark, embeddings):
    from jsonschemaparse_spark.functions.similarity import embedding_near_duplicates

    base = embeddings.limit(50)
    clones = base.limit(5).withColumn("vec_id", F.col("vec_id") + 10000)
    pairs = embedding_near_duplicates(base.union(clones), threshold=0.999)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    ids = [r["vec_id"] for r in base.limit(5).collect()]
    assert all((i, i + 10000) in got for i in ids)


# ---------------- multimodal ------------------------------------------------------
def test_multimodal_plumbing(spark):
    from jsonschemaparse_spark.multimodal import (
        extract_features,
        frame_sample_plan,
        synthesize_media,
        FEATURE_DIM,
    )

    media = synthesize_media(spark, 30)
    feats = extract_features(media)
    rows = feats.select("media_id", "features").collect()
    assert all(len(r["features"]) == FEATURE_DIM for r in rows)
    assert all(abs(sum(r["features"]) - 1.0) < 1e-5 for r in rows)

    frames = frame_sample_plan(media, every_ms=10000)
    assert frames.count() > 0
    assert frames.columns == ["media_id", "frame_ts_ms"]


def test_multimodal_codec_rejects_compressed_content(spark):
    """Non-BMP bytes (synthesize_media's fake blobs) hit the PIL swap point
    and raise — the real-codec happy path lives in tests/test_codecs.py."""
    from jsonschemaparse_spark.multimodal import extract_features, synthesize_media

    media = synthesize_media(spark, 3)
    with pytest.raises(Exception):
        extract_features(media, use_codec=True).collect()


def test_minhash_fast_mode_finds_clones(spark, dup_docs):
    from jsonschemaparse_spark.functions.dedup import minhash_near_duplicates

    pairs = minhash_near_duplicates(dup_docs, "doc_id", threshold=0.5, hash_mode="fast")
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    for i in range(10):
        assert (i, i + 100000) in got


def test_reviver_and_nice_number():
    from jsonschemaparse_spark.api import parse
    from jsonschemaparse_spark.schema.relaxed_json import loads_relaxed

    doubled = parse('{"a": 1, "b": [2, 3]}',
                    lambda k, v: v * 2 if isinstance(v, int) else v)
    assert doubled == {"a": 2, "b": [4, 6]}

    assert loads_relaxed("42", nice_number="string") == "42"
    assert loads_relaxed("42", nice_number="float64") == 42.0
    assert loads_relaxed("42", nice_number="fraction") == [42, 1]


# ---------------------------------------------------------------------------
# r4: Gopher quality rules, line-level dedup, URL canonicalization
# ---------------------------------------------------------------------------
def test_gopher_quality_flags(spark):
    from jsonschemaparse_spark.functions.text import gopher_quality_flags

    good = "word " * 60 + "\nanother line of useful content here"
    listy = "\n".join("- item %d" % i for i in range(10))
    symbols = "# " * 30
    dup = "same line\n" * 10 + "unique words " * 30
    df = spark.createDataFrame(
        [(1, good), (2, listy), (3, symbols), (4, dup), (5, None)],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r.asDict()
           for r in gopher_quality_flags(df).collect()}
    assert got[1]["gopher_keep"] is True
    assert got[2]["gopher_keep"] is False  # all-bullet + too few words
    assert got[2]["bullet_line_fraction"] == 1.0
    assert got[3]["gopher_keep"] is False  # symbol ratio + no alpha
    assert got[3]["symbol_word_ratio"] == 1.0
    assert got[4]["duplicate_line_fraction"] == pytest.approx(9 / 11, abs=1e-6)
    assert got[5]["n_words"] == 0 and got[5]["gopher_keep"] is False


def test_line_dedup_and_strip(spark):
    from jsonschemaparse_spark.functions.dedup import (
        duplicate_line_groups,
        strip_boilerplate_lines,
    )

    docs = spark.createDataFrame(
        [(i, "NAV MENU\nbody %d alpha\nbody %d beta\nFOOTER" % (i, i))
         for i in range(6)],
        "doc_id long, text string",
    )
    hot = {r["line"]: (r["n_docs"], r["n_occurrences"])
           for r in duplicate_line_groups(docs, "doc_id").collect()}
    assert hot == {"NAV MENU": (6, 6), "FOOTER": (6, 6)}
    stripped = strip_boilerplate_lines(docs, "doc_id", min_docs=6)
    rows = {r["doc_id"]: r["text"] for r in stripped.collect()}
    assert rows[3] == "body 3 alpha\nbody 3 beta"  # order preserved, hot gone
    assert len(rows) == 6
    # a line repeated INSIDE one doc does not count that doc twice
    one = spark.createDataFrame(
        [(1, "x\nx\nx"), (2, "y")], "doc_id long, text string")
    assert duplicate_line_groups(one, "doc_id").count() == 0


def test_canonical_url(spark):
    from jsonschemaparse_spark.functions.web import (
        canonical_url,
        url_duplicate_groups,
    )

    urls = spark.createDataFrame(
        [
            (1, "HTTPS://Example.COM:443/Path?utm_source=a&utm_medium=b&id=5#frag"),
            (2, "https://example.com/Path?id=5"),
            (3, "http://Site.org:80/a?fbclid=zz"),
            (4, "http://site.org/a"),
            (5, "https://other.net:8443/x"),       # non-default port kept
            (6, "https://example.com/Path?id=6"),  # different query survives
        ],
        "doc_id long, url string",
    )
    got = {r["doc_id"]: r["c"] for r in
           urls.select("doc_id", canonical_url(F.col("url")).alias("c")).collect()}
    assert got[1] == got[2] == "https://example.com/Path?id=5"
    assert got[3] == got[4] == "http://site.org/a"
    assert got[5] == "https://other.net:8443/x"
    assert got[6] == "https://example.com/Path?id=6"
    groups = {r["canonical_url"]: r["doc_ids"] for r in
              url_duplicate_groups(urls, "doc_id").collect()}
    assert groups == {"https://example.com/Path?id=5": [1, 2],
                      "http://site.org/a": [3, 4]}


def test_gopher_repetition_metrics(spark):
    """Paragraph + char-fraction repetition terms (the Gopher set's
    remaining computable rows; top-n-gram fractions documented-omitted)."""
    from jsonschemaparse_spark.functions.text import gopher_quality_flags

    para = "repeated paragraph body here\n\n"
    doc = para + "unique middle words " * 30 + "\n\n" + para
    df = spark.createDataFrame([(1, doc)], "doc_id long, text string")
    r = gopher_quality_flags(df).first()
    assert r["duplicate_paragraph_fraction"] == pytest.approx(1 / 3, abs=1e-6)
    assert r["duplicate_paragraph_char_fraction"] > 0
    assert r["duplicate_line_char_fraction"] > 0  # the repeated line's chars
    # clean doc: all repetition terms zero
    clean = spark.createDataFrame(
        [(1, "one two\n\nthree four " + "filler words " * 30)],
        "doc_id long, text string")
    c = gopher_quality_flags(clean).first()
    assert c["duplicate_paragraph_fraction"] == 0.0
    assert c["duplicate_line_char_fraction"] == 0.0
    assert c["gopher_keep"] is True


def test_canonical_url_review_fixes(spark):
    """r4 fourth-review: anchored tracking removal (params CONTAINING a
    tracking name survive; path segments survive), userinfo case
    preserved, default port stripped behind userinfo, consecutive
    tracking params removed in one pass, dup groups count DISTINCT ids."""
    from jsonschemaparse_spark.functions.web import (
        canonical_url,
        url_duplicate_groups,
    )

    cases = {
        1: ("https://ex.com/p?pgclid=1&x=2", "https://ex.com/p?pgclid=1&x=2"),
        2: ("https://ex.com/ref_src=a&b/path", "https://ex.com/ref_src=a&b/path"),
        3: ("https://ex.com/p?utm_a=1&utm_b=2&x=3", "https://ex.com/p?x=3"),
        4: ("https://ex.com/p?utm_a=1&utm_b=2", "https://ex.com/p"),
        5: ("https://User@Example.com:443/x", "https://User@example.com/x"),
        6: ("https://u:p@Example.com:443/x", "https://u:p@example.com/x"),
        7: ("https://ex.com/p?x=1&gclid=z&y=2", "https://ex.com/p?x=1&y=2"),
    }
    df = spark.createDataFrame(list(cases.items()),
                               "doc_id long, pair struct<_1:string,_2:string>")
    got = {r["doc_id"]: r["c"] for r in df.select(
        "doc_id", canonical_url(F.col("pair._1")).alias("c")).collect()}
    for k, (_, want) in cases.items():
        assert got[k] == want, (k, got[k], want)

    # countDistinct: a doubly-ingested row is not a duplicate group
    dup = spark.createDataFrame(
        [(1, "http://a/x"), (1, "http://a/x"), (2, "http://b/y")],
        "doc_id long, url string")
    assert url_duplicate_groups(dup, "doc_id").count() == 0


def test_strip_boilerplate_preserves_blanks_and_doc_column(spark):
    """r4 fourth-review: kept lines emitted verbatim (blank lines and
    indentation survive -> paragraph segmentation intact), and an id
    column literally named 'doc' is not eaten by internal drops."""
    from jsonschemaparse_spark.functions.dedup import strip_boilerplate_lines

    docs = spark.createDataFrame(
        [(i, "HOT\npara one %d\n\n  para two %d\nHOT" % (i, i))
         for i in range(3)],
        "doc long, text string",
    )
    out = strip_boilerplate_lines(docs, "doc", min_docs=3)
    assert set(out.columns) == {"doc", "text"}
    assert out.filter(F.col("doc") == 1).first()["text"] == \
        "para one 1\n\n  para two 1"


def test_c4_quality_flags_and_line_filter(spark):
    from jsonschemaparse_spark.functions.text import (
        c4_line_filter,
        c4_quality_flags,
    )

    good = ("This is a first sentence with plenty of words.\n"
            "Here is a second sentence that also ends properly!\n"
            "And a third one closes the document?")
    codey = "function f() { return 1; } // three. sentences. here."
    lorem = "Lorem Ipsum dolor sit amet. More text here. And more."
    short = "Just one sentence."
    df = spark.createDataFrame(
        [(1, good), (2, codey), (3, lorem), (4, short), (5, None)],
        "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in c4_quality_flags(df).collect()}
    assert got[1]["c4_keep"] is True and got[1]["n_sentences"] == 3
    assert got[2]["c4_keep"] is False and got[2]["has_curly_brace"]
    assert got[3]["c4_keep"] is False and got[3]["has_lorem_ipsum"]
    assert got[4]["c4_keep"] is False
    assert got[5]["c4_keep"] is False and got[5]["n_sentences"] == 0
    assert got[1]["terminal_punct_line_fraction"] == 1.0

    lf = spark.createDataFrame([(1,
        "Menu\n"
        "A proper sentence with enough words right here.\n"
        "short one.\n"
        "Another good line that ends with a question mark maybe?")],
        "doc_id long, text string")
    out = c4_line_filter(lf).first()["text"]
    assert out == ("A proper sentence with enough words right here.\n"
                   "Another good line that ends with a question mark maybe?")


def test_quality_flags_fused_matches_unfused(spark):
    """r6 VERDICT #1: the fused gate's columns are bit-identical to
    chaining gopher_quality_flags + c4_quality_flags, and quality_keep is
    the AND of the two keeps."""
    from jsonschemaparse_spark.functions.text import (
        c4_quality_flags,
        gopher_quality_flags,
        quality_flags,
    )

    good = ("word " * 60).strip() + ".\nSecond sentence right here!\nThird one closes?"
    df = spark.createDataFrame(
        [(1, good),
         (2, "function f() { x; } " + "word " * 60),
         (3, "- a\n- b\n- c"),
         (4, "Lorem ipsum dolor. " + "useful words here " * 20 + ". End!"),
         (5, None),
         (6, "badtoken appears here. " + "word " * 60 + ". Closing line!")],
        "doc_id long, text string")
    bw = ["badtoken", "two word phrase"]
    fused = quality_flags(df, badwords=bw)
    unfused = c4_quality_flags(
        gopher_quality_flags(df), badwords=bw)
    f_rows = {r["doc_id"]: r.asDict() for r in fused.collect()}
    u_rows = {r["doc_id"]: r.asDict() for r in unfused.collect()}
    for i, u in u_rows.items():
        f = f_rows[i]
        for col, v in u.items():
            assert f[col] == v, (i, col, f[col], v)
        assert f["quality_keep"] == (u["gopher_keep"] and u["c4_keep"])
    # gate subsets work and keep reflects only the enabled gates
    only_g = quality_flags(df, c4=False).collect()
    for r in only_g:
        assert r["quality_keep"] == r["gopher_keep"]
        assert "c4_keep" not in r.asDict()


def test_quality_flags_single_projection_plan(spark, documents):
    """r6 VERDICT #1 'done' criterion: the fused gate over a parquet scan
    is ONE Project subtree over ONE scan — no Exchange, no Generate, no
    Python eval, and exactly one Project node in the physical plan."""
    import io
    from contextlib import redirect_stdout

    from jsonschemaparse_spark.functions.text import quality_flags

    out = quality_flags(documents, badwords=["zzz"])
    buf = io.StringIO()
    with redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "Exchange" not in plan, plan
    assert "Generate" not in plan, plan
    assert "Python" not in plan, plan
    n_projects = sum(
        1 for ln in plan.splitlines()
        if ln.strip().split(" ", 2)[1:2] == ["Project"])
    assert n_projects == 1, plan
    assert "Scan parquet" in plan
