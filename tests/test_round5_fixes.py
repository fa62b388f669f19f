"""Round-5 verdict tasks: gopher top-n-gram fractions, char-fraction cap,
C4 sentence-span dedup, golden IVF oracle."""

import pytest

from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# VERDICT r4 #3: gopher top-2..4-gram char fractions
# ---------------------------------------------------------------------------
def test_top_ngram_fractions_hand_computed(spark):
    from jsonschemaparse_spark.functions.text import gopher_top_ngram_fractions

    df = spark.createDataFrame(
        [
            (1, "the cat sat on the mat the cat sat again and again and again ok"),
            (2, "a b"),
            (3, ""),
            (4, None),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (
            r["top_2gram_char_fraction"],
            r["top_3gram_char_fraction"],
            r["top_4gram_char_fraction"],
        )
        for r in gopher_top_ngram_fractions(df).collect()
    }
    # doc 1: 14 words, rejoined length 63.
    #   top 2-gram "the cat" x2 -> 2*7/63; top 3-gram "the cat sat" x2 ->
    #   2*11/63; 4-grams all unique -> tie-break picks the lexicographically
    #   greatest, "the mat the cat" (len 15) -> 15/63.
    assert got[1] == (
        round(14 / 63, 6),
        round(22 / 63, 6),
        round(15 / 63, 6),
    )
    # doc 2: single 2-gram covers the whole text; no 3/4-grams.
    assert got[2] == (1.0, 0.0, 0.0)
    # empty / NULL -> all zeros
    assert got[3] == (0.0, 0.0, 0.0)
    assert got[4] == (0.0, 0.0, 0.0)


def test_top_ngram_overlapping_exceeds_one(spark):
    """Overlapping occurrences all count — degenerate repetition can push a
    fraction past 1.0, which is fine: the gate thresholds are <= 0.2."""
    from jsonschemaparse_spark.functions.text import gopher_top_ngram_fractions

    df = spark.createDataFrame(
        [(1, "x y x y x y x y x y x y")], "doc_id long, text string"
    )
    r = gopher_top_ngram_fractions(df).collect()[0]
    # 12 words, tc=23; "x y" x6 -> 18/23
    assert r["top_2gram_char_fraction"] == round(18 / 23, 6)
    assert r["top_4gram_char_fraction"] > 1.0


def test_gopher_quality_full_keep(spark):
    from jsonschemaparse_spark.functions.text import gopher_quality_full

    # 80 distinct words, every bigram unique -> top fractions stay tiny
    clean_words = " ".join(f"word{i}x" for i in range(80))
    repetitive = "spam eggs " * 60  # top 2-gram dominates
    df = spark.createDataFrame(
        [(1, clean_words), (2, repetitive.strip())], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in gopher_quality_full(df).collect()}
    assert rows[1]["gopher_keep_full"] == rows[1]["gopher_keep"]
    # the repetitive doc passes nothing n-gram-wise
    assert rows[2]["top_2gram_char_fraction"] > 0.2
    assert not rows[2]["gopher_keep_full"]


def test_top_ngram_plan_has_single_explode_and_combine(spark):
    """Scale shape: one Generate (explode) feeding partial/final aggregates;
    no window, no python UDF."""
    from jsonschemaparse_spark.functions.text import gopher_top_ngram_fractions

    df = spark.createDataFrame([(1, "a b c a b")], "doc_id long, text string")
    plan = gopher_top_ngram_fractions(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Generate explode") == 1
    assert "Window" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ---------------------------------------------------------------------------
# VERDICT r4 #7: O(L^2) char-fraction guard on degenerate line counts
# ---------------------------------------------------------------------------
def test_char_fraction_cap_pathological_doc(spark):
    from jsonschemaparse_spark.functions.text import gopher_quality_flags

    many = "\n".join(f"line {i}" for i in range(50_000))
    small = "one line\ntwo line"
    df = spark.createDataFrame(
        [(1, many), (2, small)], "doc_id long, text string"
    )
    rows = {
        r["doc_id"]: r
        for r in gopher_quality_flags(df, char_fraction_max_items=1000).collect()
    }
    assert rows[1]["char_fraction_truncated"] is True
    assert rows[2]["char_fraction_truncated"] is False
    # capped metrics still well-defined (all lines unique -> 0 dup chars)
    assert rows[1]["duplicate_line_char_fraction"] == 0.0
    # count-based fraction stays exact and uncapped
    assert rows[1]["duplicate_line_fraction"] == 0.0


def test_char_fraction_default_cap_no_effect_on_small_docs(spark):
    from jsonschemaparse_spark.functions.text import gopher_quality_flags

    df = spark.createDataFrame(
        [(1, "dup\ndup\nunique one\nunique two")], "doc_id long, text string"
    )
    r = gopher_quality_flags(df).collect()[0]
    assert r["char_fraction_truncated"] is False
    # 2 dup lines of 3 chars each out of 3+3+10+10 = 26
    assert r["duplicate_line_char_fraction"] == round(6 / 26, 6)


# ---------------------------------------------------------------------------
# VERDICT r4 #4: C4 three-sentence-span dedup
# ---------------------------------------------------------------------------
def test_span_groups_and_keep_first(spark):
    from jsonschemaparse_spark.functions.dedup import (
        duplicate_span_groups,
        remove_duplicate_spans,
    )

    docs = [
        (1, "Alpha one. Beta two. Gamma three. Unique tail A."),
        (2, "Intro B! Alpha one. Beta two. Gamma three. Closing B."),
        (3, "Totally unrelated. Nothing shared here. Still nothing. Bye."),
        (4, "Alpha one. Beta two. Gamma three."),
        (5, ""),
        (6, "No terminal punctuation at all"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    groups = duplicate_span_groups(df, "doc_id").collect()
    assert len(groups) == 1
    g = groups[0]
    assert g["span"] == "alpha one. beta two. gamma three."
    assert (g["n_docs"], g["n_occurrences"]) == (3, 3)

    out = {r["doc_id"]: r["text"]
           for r in remove_duplicate_spans(df, "doc_id").collect()}
    # first occurrence (doc 1, pos 0) keeps the span; later ones lose it
    assert out[1] == docs[0][1]
    assert out[2] == "Intro B! Closing B."
    assert out[4] == ""
    # untouched docs round-trip byte-identically (chunk regex tiles text)
    assert out[3] == docs[2][1]
    assert out[6] == docs[5][1]
    assert out[5] == ""


def test_span_dedup_in_document_repeat(spark):
    """C4 counts occurrences, not documents: a span repeated INSIDE one doc
    is a duplicate; the second in-doc occurrence is removed."""
    from jsonschemaparse_spark.functions.dedup import remove_duplicate_spans

    rep = "One a. Two b. Three c. Bridge x. One a. Two b. Three c."
    df = spark.createDataFrame([(1, rep)], "doc_id long, text string")
    out = remove_duplicate_spans(df, "doc_id").collect()[0]["text"]
    assert out == "One a. Two b. Three c. Bridge x."


def test_span_dedup_normalized_matching(spark):
    """Matching is on normalized sentences (case/whitespace-insensitive)
    but kept text is emitted verbatim."""
    from jsonschemaparse_spark.functions.dedup import remove_duplicate_spans

    docs = [
        (1, "Alpha one. Beta two. Gamma three."),
        (2, "ALPHA   one.  Beta two.   gamma THREE."),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["doc_id"]: r["text"]
           for r in remove_duplicate_spans(df, "doc_id").collect()}
    assert out[1] == docs[0][1]  # verbatim, not normalized
    assert out[2] == ""


def test_span_dedup_overlap_can_bite_kept_occurrence(spark):
    """Documented semantics: a sentence is removed when ANY non-first
    duplicated span covers it, even if another span's FIRST occurrence
    also covers it (sentence-marking C4 behavior)."""
    from jsonschemaparse_spark.functions.dedup import remove_duplicate_spans

    docs = [
        (1, "A a. B b. C c."),
        (2, "Zz z. A a. B b. C c."),  # span (A,B,C) dup; (Zz,A,B) unique
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["doc_id"]: r["text"]
           for r in remove_duplicate_spans(df, "doc_id").collect()}
    assert out[1] == docs[0][1]
    assert out[2] == "Zz z."


# ---------------------------------------------------------------------------
# VERDICT r4 #5: positions on the standard validate_json_column rows
# ---------------------------------------------------------------------------
def test_positions_on_standard_json_column_rows(spark):
    from jsonschemaparse_spark.plans.json_validator import validate_json_column

    df = spark.createDataFrame(
        [
            (1, '{"k": 99}'),        # maximum violation at the value
            (2, '{"k": 5}'),         # clean
            (3, '{"k": '),           # syntax error
            (4, None),               # null doc -> no rows
        ],
        "id long, doc string",
    )
    rules = {"properties": {"k": {"maximum": 50}}}
    res = validate_json_column(df, "doc", rules, key_cols=["id"], positions=True)
    ann = {r["id"]: r for r in res.annotated.collect()}
    # violation structs carry line/column inline
    v1 = ann[1]["_jsp_violations"][0]
    assert v1["keyword"] == "maximum"
    # reference convention: property value anchors at its colon-side value
    # start -> line 0, the value's position in '{"k": 99}'
    assert (v1["line"], v1["column"]) == (0, 4)
    assert ann[2]["_jsp_violations"] == []
    v3 = ann[3]["_jsp_violations"][0]
    assert v3["keyword"] == "syntax"
    assert v3["line"] is not None and v3["column"] is not None
    # .violations() surfaces them as report columns
    rep = res.violations()
    assert rep.columns == [
        "id", "constraint_id", "path", "keyword", "expected", "actual",
        "message", "line", "column",
    ]
    rows = {r["id"]: r for r in rep.collect()}
    assert (rows[1]["line"], rows[1]["column"]) == (0, 4)
    assert 4 not in rows


def test_positions_engine_guards(spark):
    from jsonschemaparse_spark.plans.json_validator import validate_json_column

    df = spark.createDataFrame([(1, "{}")], "id long, doc string")
    with pytest.raises(ValueError, match="typed"):
        validate_json_column(df, "doc", {}, key_cols=["id"],
                             engine="typed", positions=True)
    with pytest.raises(ValueError, match="strict"):
        validate_json_column(df, "doc", {}, key_cols=["id"],
                             big_number="string", positions=True)


def test_positions_wrapper_parity_with_legacy_surface(spark):
    """validate_json_positions (now a wrapper) produces the same rows as
    calling the unified path directly."""
    from jsonschemaparse_spark.plans.json_validator import (
        validate_json_column,
        validate_json_positions,
    )

    df = spark.createDataFrame(
        [(i, '{"n": %d}' % (i * 30)) for i in range(5)] + [(9, '[1,')],
        "id long, doc string",
    )
    rules = {"properties": {"n": {"maximum": 50}}}
    legacy = sorted(
        tuple(r) for r in validate_json_positions(df, "doc", rules,
                                                  key_cols=["id"]).collect()
    )
    unified = sorted(
        tuple(r) for r in validate_json_column(
            df, "doc", rules, key_cols=["id"], positions=True
        ).violations().collect()
    )
    assert legacy == unified and len(legacy) == 4


# ---------------------------------------------------------------------------
# ADVICE r4: empty-input checkpoint runs return empty verdicts, not a crash
# ---------------------------------------------------------------------------
def test_checkpoint_empty_input_no_state(spark, tmp_path):
    from jsonschemaparse_spark.plans.checkpoint import (
        run_json_with_checkpoint,
        run_with_checkpoint,
    )

    empty_in = str(tmp_path / "empty_in")
    spark.createDataFrame([], "id long, doc string") \
        .coalesce(1).write.parquet(empty_in)
    # parquet dir with a zero-row file still yields 0 distinct input files
    run = run_json_with_checkpoint(
        spark, empty_in, "doc", {"properties": {}},
        state_dir=str(tmp_path / "state_a"), key_cols=["id"],
    )
    assert run.verdicts.count() == 0
    assert run.n_files_total <= 1 and run.engine_used in ("none", "auto")

    run2 = run_with_checkpoint(
        spark, empty_in, {"properties": {}},
        state_dir=str(tmp_path / "state_b"), key_cols=["id"],
    )
    assert run2.verdicts.count() == 0


# ---------------------------------------------------------------------------
# ADVICE r4: incremental string scan is O(L) across chunks, not O(L^2)
# ---------------------------------------------------------------------------
def test_chunked_long_string_linear_scan():
    import json
    import time

    from jsonschemaparse_spark.api import StreamParser

    body = "abcdefgh" * 131072  # ~1 MB
    doc = json.dumps({"s": body})
    p = StreamParser({})
    t0 = time.perf_counter()
    for off in range(0, len(doc), 1024):
        p.write(doc[off : off + 1024])
    p.end()
    dt = time.perf_counter() - t0
    assert p.value["s"] == body
    # measured ~0.2 s with the resume pointer; the former from-the-top
    # rescan was ~500M char steps (tens of seconds). Generous CI bound:
    assert dt < 5.0


def test_chunked_string_resume_mid_escape():
    """Resume state across writes that split escapes: the backslash is
    re-scanned (bounded), the value decodes exactly."""
    import json

    from jsonschemaparse_spark.api import StreamParser

    doc = '{"s": "a\\u0041b\\nc", "t": "x"}'
    for size in (1, 2, 3, 5):
        p = StreamParser({})
        for off in range(0, len(doc), size):
            p.write(doc[off : off + size])
        p.end()
        assert p.value == json.loads(doc)


# ---------------------------------------------------------------------------
# ADVICE r4: import_schema identity is a snapshot, immune to caller mutation
# ---------------------------------------------------------------------------
def test_import_schema_snapshot_identity():
    from jsonschemaparse_spark.schema.compiler import SchemaRegistry

    reg = SchemaRegistry()
    schema = {"type": "object", "properties": {"a": {"type": "string"}}}
    first = reg.import_schema("http://example.com/s", schema)
    # caller mutates AFTER import: the registry's snapshot must not move
    schema["properties"]["b"] = {"type": "number"}
    import copy

    pristine = {"type": "object", "properties": {"a": {"type": "string"}}}
    again = reg.import_schema("http://example.com/s", copy.deepcopy(pristine))
    assert again is first
    # and the mutated object now genuinely differs -> rejected
    import pytest as _pytest

    with _pytest.raises(Exception, match="already defined"):
        reg.import_schema("http://example.com/s", schema)


# ---------------------------------------------------------------------------
# VERDICT r4 #10: bad-words policy hook on the C4 gate
# ---------------------------------------------------------------------------
def test_c4_badwords_hook(spark):
    from jsonschemaparse_spark.functions.text import c4_quality_flags

    docs = [
        (1, "Good page one. Fine page two. Clean page three."),
        (2, "Good page one. BADTOKEN in line. Clean page three."),
        (3, "Good page one. a bad phrase appears here. Clean page three."),
        (4, "Good page one. badtokenish compound untouched. Page three."),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in c4_quality_flags(
            df, badwords=["badtoken", "bad phrase"]
        ).collect()
    }
    assert not out[1]["has_bad_word"] and out[1]["c4_keep"]
    # token entries match whole lowercased words
    assert out[2]["has_bad_word"] and not out[2]["c4_keep"]
    # phrase entries match as substrings
    assert out[3]["has_bad_word"] and not out[3]["c4_keep"]
    # compound words do NOT match token entries
    assert not out[4]["has_bad_word"] and out[4]["c4_keep"]
    # no lexicon -> no has_bad_word column, verdict unchanged
    assert "has_bad_word" not in c4_quality_flags(df).columns


# ---------------------------------------------------------------------------
# r5 smoke finding: fast-mode minhash must survive sub-k-word documents
# (ANSI element_at past the array end raised on any web corpus with short
# docs; the bench corpus just never had one)
# ---------------------------------------------------------------------------
def test_fast_minhash_short_docs(spark):
    from jsonschemaparse_spark.functions.dedup import (
        minhash_near_duplicates,
        minhash_signatures_agg,
        minhash_signatures_hof,
    )

    df = spark.createDataFrame(
        [(1, ""), (2, "one"), (3, "two words"),
         (4, "three whole words here now ok"),
         (5, "three whole words here now ok"), (6, None)],
        "doc_id long, text string",
    )
    a = sorted(tuple(r) for r in
               minhash_signatures_agg(df, "doc_id", hash_mode="fast").collect())
    h = sorted(tuple(r) for r in
               minhash_signatures_hof(df, "doc_id", hash_mode="fast").collect())
    assert a == h and len(a) == 6
    pairs = minhash_near_duplicates(
        df, "doc_id", threshold=0.8, hash_mode="fast"
    ).collect()
    assert [(p["id_a"], p["id_b"]) for p in pairs] == [(4, 5)]
    # identical short texts still collide (whole-text fallback hash)
    df2 = spark.createDataFrame(
        [(1, "tiny doc"), (2, "tiny doc")], "doc_id long, text string"
    )
    sigs = {r["doc"]: r["_sig"] for r in
            minhash_signatures_agg(df2, "doc_id", hash_mode="fast").collect()}
    assert sigs[1] == sigs[2]


def test_minhash_bucket_cap_and_overflow(spark):
    """Identical-doc clusters co-hash in every band -> c^2/2 pairs; the cap
    skips those buckets in-plan and the overflow view names them."""
    from jsonschemaparse_spark.functions.dedup import (
        minhash_bucket_overflow,
        minhash_near_duplicates,
    )

    rows = [(i, "identical boilerplate page text here") for i in range(30)]
    rows += [(100, "a genuinely unique document about spark plans today"),
             (101, "a genuinely unique document about spark plans today")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    uncapped = minhash_near_duplicates(df, "doc_id", threshold=0.9).count()
    assert uncapped == 30 * 29 // 2 + 1  # quadratic cluster + the real pair
    capped = minhash_near_duplicates(
        df, "doc_id", threshold=0.9, max_bucket_size=10
    ).collect()
    assert [(r["id_a"], r["id_b"]) for r in capped] == [(100, 101)]
    over = minhash_bucket_overflow(df, "doc_id", max_bucket_size=10)
    # the identical cluster appears once per band (4 bands by default)
    assert over.count() == 4
    assert all(r["n_docs"] == 30 for r in over.collect())


# ---------------------------------------------------------------------------
# r5 code-review fixes
# ---------------------------------------------------------------------------
def test_options_routing_not_greedy_on_schema_keywords():
    """maxItems/maxProperties are real JSON-Schema keywords: a compound
    rule dict keeps full validation; an options-only dict still routes as
    the reference options form (review #1)."""
    from jsonschemaparse_spark.api import parse, parse_info
    from jsonschemaparse_spark.errors import ResourceLimitError

    r = parse_info('[1, "x", 2]',
                   {"type": "array", "items": {"type": "integer"},
                    "maxItems": 5})
    assert [e.keyword for e in r.errors] == ["type"]
    with pytest.raises(ResourceLimitError, match="Too many items in array"):
        parse('{ "a": [0,1,2,3,4] }', {"maxItems": 4})


def test_stream_parser_options_routing_matches_parse():
    """Schema-less option dicts mean the same thing on both drop-in
    surfaces (review #3); StreamParser's never-throws contract surfaces
    the cap as a resourceLimit row."""
    from jsonschemaparse_spark.api import StreamParser

    sp = StreamParser({"maxItems": 2})
    sp.write("[1,2,3]")
    info = sp.end()
    assert [e.keyword for e in info.errors] == ["resourceLimit"]
    assert "Too many items in array" in info.errors[0].message


def test_stream_parser_line_number_characters():
    from jsonschemaparse_spark.api import StreamParser

    sp = StreamParser()
    sp.write('{"a": 1}\n')
    info = sp.end()
    assert (info.lineNumber, info.characters) == (1, 9)
    sp = StreamParser()
    sp.write('"\U0001F432"')
    assert sp.end().characters == 4  # UTF-16 units


def test_nice_number_routed_through_options():
    from jsonschemaparse_spark.api import parse, parse_info

    assert parse("1.5", {"niceNumber": "string"}) == "1.5"
    assert parse_info("1.5", {"niceNumber": "string"}).value == "1.5"
    # upstream stubs accepted and ignored
    assert parse("[1]", {"maxUniqueItems": 1}) == [1]


def test_minhash_default_cap_bounds_pair_generation(spark):
    """Default max_bucket_size=500: an identical-doc cluster above the cap
    is dropped (named by the overflow view) without an opt-in (review #2:
    uncapped pair arrays are c^2/2 structs in ONE row)."""
    from jsonschemaparse_spark.functions.dedup import (
        minhash_bucket_overflow,
        minhash_near_duplicates,
    )

    rows = [(i, "identical boilerplate page text here") for i in range(510)]
    rows += [(9001, "one unique doc about spark execution plans"),
             (9002, "one unique doc about spark execution plans")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = minhash_near_duplicates(df, "doc_id", threshold=0.9).collect()
    assert [(p["id_a"], p["id_b"]) for p in pairs] == [(9001, 9002)]
    over = minhash_bucket_overflow(df, "doc_id", max_bucket_size=500)
    assert over.count() == 4 and all(r["n_docs"] == 510 for r in over.collect())


def test_checkpoint_verdicts_column_order_consistent(spark, tmp_path):
    """Fresh-state empty verdicts and existing-state reads expose the same
    column ORDER (review #8)."""
    from jsonschemaparse_spark.plans.checkpoint import run_with_checkpoint

    empty_in = str(tmp_path / "in")
    spark.createDataFrame([], "id long, text string").coalesce(1) \
        .write.parquet(empty_in)
    fresh = run_with_checkpoint(
        spark, empty_in, {"properties": {}},
        state_dir=str(tmp_path / "st"), key_cols=["id"])
    data_in = str(tmp_path / "in2")
    spark.createDataFrame([(1, "x")], "id long, text string").coalesce(1) \
        .write.parquet(data_in)
    real = run_with_checkpoint(
        spark, data_in, {"properties": {}},
        state_dir=str(tmp_path / "st2"), key_cols=["id"])
    assert fresh.verdicts.columns == real.verdicts.columns


# ---------------------------------------------------------------------------
# r5 extension: Gopher duplicated-n-gram char fractions (full A1.1 table)
# ---------------------------------------------------------------------------
def test_dup_ngram_fractions_hand_computed(spark):
    from jsonschemaparse_spark.functions.text import gopher_dup_ngram_fractions

    docs = [
        # "a b c d e" twice: covered word idx 1-5 and 7-11 (10 words,
        # chars 10) of total word chars 12 -> 10/12
        (1, "a b c d e XX a b c d e"),
        (2, "all words completely unique here today my friend ok now then"),
        (3, ""),
        (4, None),
        # a 10-word phrase repeated -> dup_10gram covers everything except
        # the bridge word (20 of 21 words)
        (5, " ".join(["p q r s t u v w x y", "BRIDGE", "p q r s t u v w x y"])),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = {r["doc_id"]: r for r in gopher_dup_ngram_fractions(df).collect()}
    assert rows[1]["dup_5gram_char_fraction"] == round(10 / 12, 6)
    assert rows[1]["dup_6gram_char_fraction"] == 0.0
    for n in (5, 6, 7, 8, 9, 10):
        assert rows[2][f"dup_{n}gram_char_fraction"] == 0.0
        assert rows[3][f"dup_{n}gram_char_fraction"] == 0.0
        assert rows[4][f"dup_{n}gram_char_fraction"] == 0.0
    # doc 5: total word chars = 20 + 6 = 26; covered for n=10: the two
    # 10-word phrases (20 chars)
    assert rows[5]["dup_10gram_char_fraction"] == round(20 / 26, 6)
    # smaller n: the repeated phrase also duplicates its sub-n-grams
    assert rows[5]["dup_5gram_char_fraction"] == round(20 / 26, 6)


def test_dup_ngram_overlap_counts_once(spark):
    """'x x x x x x' style runs: overlapping duplicated n-grams must not
    overcount — coverage is a set of word indices, fraction <= 1."""
    from jsonschemaparse_spark.functions.text import gopher_dup_ngram_fractions

    df = spark.createDataFrame(
        [(1, " ".join(["x"] * 30))], "doc_id long, text string"
    )
    r = gopher_dup_ngram_fractions(df).collect()[0]
    for n in (5, 6, 7, 8, 9, 10):
        assert r[f"dup_{n}gram_char_fraction"] == 1.0


def test_gopher_quality_full_includes_dup_thresholds(spark):
    from jsonschemaparse_spark.functions.text import gopher_quality_full

    # clean doc: 80 distinct words -> no repetition at all
    clean = " ".join(f"word{i}x" for i in range(80))
    # doc passing the base + top-n-gram gates but failing dup-5-gram:
    # a 40-word unique prefix plus a repeated 5-word phrase
    phrase = "alpha beta gamma delta epsilon"
    tricky = " ".join(f"u{i}y" for i in range(60)) + f" {phrase} " \
        + " ".join(f"v{i}z" for i in range(60)) + f" {phrase}"
    df = spark.createDataFrame(
        [(1, clean), (2, tricky)], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in gopher_quality_full(df).collect()}
    assert rows[1]["gopher_keep_full"] == rows[1]["gopher_keep"]
    assert rows[2]["dup_5gram_char_fraction"] > 0


# ---------------------------------------------------------------------------
# r5 second-review fixes
# ---------------------------------------------------------------------------
def test_explicit_schema_of_ambiguous_keys_not_resplit():
    """{'schema': {'maxItems': 3}} — an EXPLICIT schema made only of
    ambiguous keys — must stay a schema on BOTH parse and parse_info
    (second review #1: parse() used to re-route it as caps)."""
    from jsonschemaparse_spark.api import (
        ParseValidationError,
        parse,
        parse_info,
    )

    assert parse_info('{"a": [1,2,3,4]}', {"schema": {"maxItems": 3}}).errors == []
    assert parse('{"a": [1,2,3,4]}', {"schema": {"maxItems": 3}}) == {"a": [1, 2, 3, 4]}
    with pytest.raises(ParseValidationError) as ei:
        parse("[1,2,3,4]", {"schema": {"maxItems": 3}})
    assert ei.value.keyword == "maxItems"


def test_stream_parser_counts_source_in_syntax_mode():
    """Relaxed dialects transcode before the tokenizer; lineNumber and
    characters must still count the SOURCE text, like parse_info
    (second review #2)."""
    from jsonschemaparse_spark.api import StreamParser, parse_info
    from jsonschemaparse_spark.schema.relaxed_json import SyntaxOptions

    syn = SyntaxOptions(hash_comment=True)
    text = "# hello comment\n[1, 2]\n"
    pi = parse_info(text, syntax=syn)
    sp = StreamParser(syntax=syn)
    sp.write(text)
    info = sp.end()
    assert (info.lineNumber, info.characters) \
        == (pi.lineNumber, pi.characters) == (2, 23)


# ---------------------------------------------------------------------------
# r5: composed cleaning pipeline
# ---------------------------------------------------------------------------
def test_clean_corpus_stage_semantics(spark):
    from jsonschemaparse_spark.functions.pipeline import clean_corpus

    body = " ".join(f"w{i}x" for i in range(60))
    docs = [
        (1, body + ". Second sentence here. Third sentence now."),     # survives
        (2, body + ". Second sentence here. Third sentence now."),     # exact clone -> dropped
        (3, "too short"),                                              # gopher n_words
        (4, body + ". Has a badword sentence. Third one here."),       # c4 badwords
        (5, body + " no sentences at all whatsoever"),                 # c4 n_sentences
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    res = clean_corpus(df, badwords=["badword"])
    assert res.stages == ["exact", "gopher", "c4"]
    assert sorted(r["doc_id"] for r in res.cleaned.collect()) == [1]
    assert res.cleaned.columns == ["doc_id", "text"]


def test_clean_corpus_near_dup_greedy_rule(spark):
    from jsonschemaparse_spark.functions.pipeline import clean_corpus

    base = ". ".join(f"sentence number {i} talks about topic {i % 7}"
                     for i in range(20)) + "."
    near = base.replace("topic 3", "subject 3")
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, "totally different " + " ".join(
            f"q{i}z" for i in range(55)) + ". One. Two. Three.")],
        "doc_id long, text string",
    )
    res = clean_corpus(df, gopher=False, c4=False, near_dup_threshold=0.5)
    kept = sorted(r["doc_id"] for r in res.cleaned.collect())
    assert kept == [1, 3]  # (1,2) verified pair -> b=2 dropped


def test_clean_corpus_stats_matches_manual_counts(spark):
    from jsonschemaparse_spark.functions.pipeline import clean_corpus_stats

    body = " ".join(f"w{i}x" for i in range(60))
    docs = [(i, body + f". Unique tail {i} here. Third sentence now.")
            for i in range(10)]
    docs += [(100, docs[0][1])]  # one clone
    df = spark.createDataFrame(docs, "doc_id long, text string")
    row = clean_corpus_stats(df).collect()[0]
    assert (row["n_input"], row["n_after_exact"],
            row["n_after_gopher"], row["n_after_c4"]) == (11, 10, 10, 10)


# ---------------------------------------------------------------------------
# r5: quality gates are stream-safe (stateless projections)
# ---------------------------------------------------------------------------
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


def test_exact_dedup_keeps_one_null_text_row(spark):
    """NULL text keys like empty text — one survivor kept, not silent
    loss of every null row (third review #3)."""
    from jsonschemaparse_spark.functions.dedup import exact_dedup

    df = spark.createDataFrame(
        [(1, None), (2, None), (3, ""), (4, "real content here")],
        "doc_id long, text string",
    )
    kept = sorted(r["doc_id"] for r in exact_dedup(df, "doc_id").collect())
    # null and '' collapse together (both normalize to no content);
    # min id 1 survives for that group
    assert kept == [1, 4]


def test_clean_corpus_near_dup_chain_drops_all_b_sides(spark):
    """Documented greedy rule: every doc appearing as id_b of a verified
    pair drops — in a chain a~b~c, both b and c go (third review #1)."""
    from jsonschemaparse_spark.functions.pipeline import clean_corpus

    base = ". ".join(f"sentence number {i} talks about topic {i % 7}"
                     for i in range(20)) + "."
    near1 = base.replace("topic 3", "subject 3")
    near2 = near1.replace("topic 5", "matter 5")
    df = spark.createDataFrame(
        [(1, base), (2, near1), (3, near2)], "doc_id long, text string"
    )
    res = clean_corpus(df, gopher=False, c4=False, near_dup_threshold=0.5)
    kept = sorted(r["doc_id"] for r in res.cleaned.collect())
    assert kept == [1]
