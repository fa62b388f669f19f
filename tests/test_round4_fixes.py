"""Round-4 VERDICT tasks: q_verdict_documents de-trap (#7), ngram
posting-list cap (#3), IVF partial-probe grading (#6), ANN kernel
auto-routing (#8)."""

import pytest

from pyspark.sql import functions as F

from conftest import SF01_DIR


# ---------------------------------------------------------------------------
# VERDICT r3 #7: q_verdict_documents routes through ValidationResult helpers
# ---------------------------------------------------------------------------
def test_verdict_documents_merges_fallback_encoding(spark, documents):
    """The driver verdict query must count violations through _n_viols()
    so per-column Arrow-fallback rows (py_viols_col) are not dropped."""
    import __spark_entry__ as entry
    from jsonschemaparse_spark.plans import validate_dataframe

    row = entry.q_verdict_documents(spark, "/root/testdata/sf0.001").first()
    res = validate_dataframe(documents, entry.DOC_RULES, key_cols=["doc_id"])
    assert row["n_rows"] == documents.count()
    assert row["n_violations"] == res.violations().count()
    assert row["n_failed_rows"] == res.annotated.filter(~F.col("_jsp_valid")).count()


def test_verdict_query_counts_py_fallback_rows(spark):
    """Synthetic fallback: a ValidationResult whose violations live ONLY in
    the py_viols_col array still contributes to _n_viols()-based totals —
    the exact trap the old F.size(VIOLATIONS_COL) query fell into."""
    from jsonschemaparse_spark.plans.validator import ValidationResult

    viol_t = (
        "array<struct<constraint_id:string,path:string,keyword:string,"
        "expected:string,actual:string,message:string>>"
    )
    df = spark.createDataFrame(
        [(1, True, [], []), (2, False, [], [("c1", "/x", "type", "string", "1", "m")])],
        f"doc_id long, _jsp_valid boolean, _jsp_violations {viol_t}, _py {viol_t}",
    )
    res = ValidationResult(annotated=df, key_cols=["doc_id"], py_viols_col="_py")
    total = df.select(F.sum(res._n_viols()).alias("n")).first()["n"]
    assert total == 1  # F.size("_jsp_violations") alone would report 0


# ---------------------------------------------------------------------------
# VERDICT r3 #3: ngram_jaccard posting-list cap + overflow view
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def hot_shingle_docs(spark):
    # d1/d2 duplicate pair via unique shingles; d10..d15 share ONLY the hot
    # trigram "h1 h2 h3" (posting list length 6) plus a unique tail shingle
    rows = [(1, "x1 x2 x3 x4"), (2, "x1 x2 x3 x4")]
    rows += [(10 + i, f"h1 h2 h3 u{i}") for i in range(6)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_ngram_posting_overflow_names_hot_shingle(spark, hot_shingle_docs):
    from jsonschemaparse_spark.functions.dedup import ngram_posting_overflow

    over = ngram_posting_overflow(hot_shingle_docs, "doc_id", max_posting_len=4).collect()
    assert [(r["sh"], r["n_docs"]) for r in over] == [("h1 h2 h3", 6)]


def test_ngram_jaccard_cap_skips_hot_pairs(spark, hot_shingle_docs):
    from jsonschemaparse_spark.functions.dedup import ngram_jaccard_pairs

    # uncapped: the hot shingle generates all 15 pairs among d10..d15
    uncapped = ngram_jaccard_pairs(
        hot_shingle_docs, "doc_id", threshold=0.3
    ).collect()
    uncapped_pairs = {(r["id_a"], r["id_b"]) for r in uncapped}
    assert (1, 2) in uncapped_pairs
    assert len([p for p in uncapped_pairs if p[0] >= 10]) == 15

    # capped: hot-shingle-only pairs vanish; the true duplicate survives
    # with its exact score (its shingles are all below the cap)
    capped = ngram_jaccard_pairs(
        hot_shingle_docs, "doc_id", threshold=0.3, max_posting_len=4
    ).collect()
    capped_pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in capped}
    assert set(capped_pairs) == {(1, 2)}
    assert capped_pairs[(1, 2)] == 1.0


def test_ngram_jaccard_cap_is_lower_bound(spark):
    """A pair sharing both hot and cold shingles keeps its pair but reports
    a lower-bound jaccard (intersection loses the hot shingle; |A|,|B|
    stay full)."""
    from jsonschemaparse_spark.functions.dedup import ngram_jaccard_pairs

    rows = [(1, "h1 h2 h3 a b"), (2, "h1 h2 h3 a b")]
    rows += [(10 + i, f"h1 h2 h3 z{i}") for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # shingles of d1/d2: {h1 h2 h3, h2 h3 a, h3 a b} — "h1 h2 h3" is hot (7)
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(
            df, "doc_id", threshold=0.3, max_posting_len=4
        ).collect()
    }
    # true jaccard 1.0; capped intersection = 2 of 3 shingles -> 2/(3+3-2)=0.5
    assert got == {(1, 2): 0.5}


# ---------------------------------------------------------------------------
# VERDICT r3 #8: brute_force_topk kernel='auto' routes by dimension
# ---------------------------------------------------------------------------
def _plan_of(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_auto_kernel_narrow_stays_expr(spark):
    from jsonschemaparse_spark.functions.similarity import brute_force_topk

    emb = spark.read.parquet(f"{SF01_DIR}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") == 0).first()["embedding"]
    assert len(q) == 64
    auto = brute_force_topk(emb, q, k=5)
    assert "zip_with" in _plan_of(auto)  # expression kernel, oracle-reproducible
    expr = brute_force_topk(emb, q, k=5, kernel="expr")
    assert [r.asDict() for r in auto.collect()] == [r.asDict() for r in expr.collect()]


def test_auto_kernel_wide_routes_to_pandas(spark):
    from jsonschemaparse_spark.functions.similarity import (
        PANDAS_KERNEL_MIN_DIM,
        brute_force_topk,
    )

    dim = PANDAS_KERNEL_MIN_DIM
    rows = [(i, [float((i * 31 + j * 7) % 13) - 6.0 for j in range(dim)]) for i in range(40)]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = rows[3][1]
    auto = brute_force_topk(corpus, q, k=5)
    assert "zip_with" not in _plan_of(auto)  # BLAS kernel selected
    pand = brute_force_topk(corpus, q, k=5, kernel="pandas")
    assert [r.asDict() for r in auto.collect()] == [r.asDict() for r in pand.collect()]
    # and the two kernels agree on the ranking itself
    expr = brute_force_topk(corpus, q, k=5, kernel="expr")
    assert [r["vec_id"] for r in auto.collect()] == [r["vec_id"] for r in expr.collect()]


# ---------------------------------------------------------------------------
# VERDICT r3 #6: IVF graded at PARTIAL probe (not just degenerate-exact)
# ---------------------------------------------------------------------------
def _clustered_corpus(spark, n=400, dim=16, n_clusters=8, seed=7):
    """Deterministic LCG-built clustered vectors: 8 well-separated centers
    (coords in [-10,10]) with +/-0.5 jitter — the data regime IVF is
    designed for, where quarter-probe recall should be ~1."""
    x = seed

    def nxt():
        nonlocal x
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        return (x >> 11) / float(1 << 52)

    cents = [[(nxt() * 2 - 1) * 10 for _ in range(dim)] for _ in range(n_clusters)]
    rows = [
        (i, [v + (nxt() * 2 - 1) * 0.5 for v in cents[i % n_clusters]])
        for i in range(n)
    ]
    return rows


def test_ivf_partial_probe_recall_clustered(spark):
    """recall@10 >= 0.9 at n_probe = n_lists/4 on a clustered corpus
    (measured 1.0): grades the approximate path, not the degenerate
    full-probe-exact shape the oracle covers."""
    from jsonschemaparse_spark.functions.similarity import (
        brute_force_topk,
        ivf_index,
        ivf_topk,
    )

    rows = _clustered_corpus(spark)
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    index = ivf_index(corpus, n_lists=8)
    recalls = []
    for i in range(10):
        q = rows[i][1]
        exact = {r["vec_id"] for r in brute_force_topk(corpus, q, k=10, kernel="expr").collect()}
        part = {
            r["vec_id"]
            for r in ivf_topk(corpus, q, k=10, n_lists=8, n_probe=2, index=index).collect()
        }
        recalls.append(len(part & exact) / 10)
    assert sum(recalls) / len(recalls) >= 0.9


def test_ivf_partial_probe_shipped_corpus_floor(spark):
    """The shipped embeddings are UNclustered (uniform-ish), the worst case
    for IVF: half-probe recall measured 0.86 mean over 5 queries. Assert an
    honest floor, and that the query's own list is always probed (its
    nearest neighbour — itself — is never lost)."""
    from jsonschemaparse_spark.functions.similarity import (
        brute_force_topk,
        ivf_index,
        ivf_topk,
    )

    emb = spark.read.parquet(f"{SF01_DIR}/embeddings.parquet")
    index = ivf_index(emb, n_lists=8)
    qrows = emb.filter(F.col("vec_id") < 5).orderBy("vec_id").collect()
    recalls = []
    for qr in qrows:
        q = qr["embedding"]
        exact = {r["vec_id"] for r in brute_force_topk(emb, q, k=10, kernel="expr").collect()}
        got = {
            r["vec_id"]
            for r in ivf_topk(emb, q, k=10, n_lists=8, n_probe=4, index=index).collect()
        }
        assert qr["vec_id"] in got
        recalls.append(len(got & exact) / 10)
    assert sum(recalls) / len(recalls) >= 0.7


def test_ivf_assignment_deterministic_snapshot(spark):
    """Seeded k-means listing is reproducible: two index builds agree
    row-for-row, and vec_ids 0-7 match the pinned snapshot (captured under
    both local[4] and local[8] — assignment is parallelism-independent on
    this corpus)."""
    from jsonschemaparse_spark.functions.similarity import ivf_index

    emb = spark.read.parquet(f"{SF01_DIR}/embeddings.parquet")
    a1 = sorted(
        (r["vec_id"], r["_ivf_list"])
        for r in ivf_index(emb, n_lists=8)[0].select("vec_id", "_ivf_list").collect()
    )
    a2 = sorted(
        (r["vec_id"], r["_ivf_list"])
        for r in ivf_index(emb, n_lists=8)[0].select("vec_id", "_ivf_list").collect()
    )
    assert a1 == a2
    assert a1[:8] == [(0, 3), (1, 7), (2, 4), (3, 7), (4, 6), (5, 0), (6, 2), (7, 3)]


def test_ivf_partial_driver_query_shape(spark):
    """The rows-only driver query returns k rows with a stable schema."""
    import __spark_entry__ as entry

    df = entry.q_ann_ivf_partial(spark, "/root/testdata/sf0.001")
    rows = df.collect()
    assert len(rows) == 10
    assert df.columns == ["vec_id", "score"]


# ---------------------------------------------------------------------------
# VERDICT r3 #4: bigNumber policies surfaced on the Column path
# ---------------------------------------------------------------------------
BIGNUM_MSG = "Number too precise"  # parse.js:1183 ResourceLimitError string


def test_bignumber_error_decimal_column(spark):
    from decimal import Decimal

    from jsonschemaparse_spark.plans import validate_dataframe

    df = spark.createDataFrame(
        [(1, Decimal("42")), (2, Decimal("12345678901234567890123")), (3, None)],
        "id long, n decimal(38,0)",
    )
    rules = {"properties": {"n": {"type": "number"}}}
    res = validate_dataframe(df, rules, key_cols=["id"], big_number="error")
    rows = res.violations().collect()
    assert [(r["id"], r["keyword"], r["message"]) for r in rows] == [
        (2, "bigNumber", BIGNUM_MSG)
    ]
    assert rows[0]["path"] == "/n"
    got = {r["id"]: r["_jsp_valid"] for r in res.annotated.collect()}
    assert got == {1: True, 2: False, 3: True}  # NULL stays vacuous


def test_bignumber_error_long_column_exact_roundtrip(spark):
    """Lossiness = exact binary64 round-trip (relaxed_json._is_lossy rule):
    2^53 is representable, 2^53+1 and Long.MaxValue are not."""
    from jsonschemaparse_spark.plans import validate_dataframe

    df = spark.createDataFrame(
        [(1, 1 << 53), (2, (1 << 53) + 1), (3, 9223372036854775807)],
        "id long, n long",
    )
    rules = {"properties": {"n": {"type": "integer"}}}
    res = validate_dataframe(df, rules, key_cols=["id"], big_number="error")
    flagged = sorted(r["id"] for r in res.violations().collect())
    assert flagged == [2, 3]


def test_bignumber_default_unchanged(spark):
    """Policy 'default' (and absent) leaves high-precision columns alone —
    the pre-r4 behavior, and the oracle-gated queries' configuration."""
    from decimal import Decimal

    from jsonschemaparse_spark.plans import validate_dataframe

    df = spark.createDataFrame(
        [(1, Decimal("12345678901234567890123"))], "id long, n decimal(38,0)"
    )
    rules = {"properties": {"n": {"type": "number"}}}
    assert validate_dataframe(df, rules, key_cols=["id"]).violations().count() == 0
    assert (
        validate_dataframe(df, rules, key_cols=["id"], big_number="default")
        .violations().count() == 0
    )


def test_bignumber_unknown_policy_rejected(spark):
    import pytest as _pytest

    from jsonschemaparse_spark.plans import validate_dataframe

    df = spark.createDataFrame([(1, 2)], "id long, n long")
    with _pytest.raises(ValueError, match="bigNumber"):
        validate_dataframe(df, {"properties": {"n": {}}}, key_cols=["id"],
                           big_number="bogus")


def test_bignumber_error_json_path_parity(spark):
    """The SAME lossy literal through validate_json_column(big_number=
    'error') produces the same keyword + message (the parse aborts at the
    number, so the row is document-scoped there — path '' vs the Column
    path's '/n')."""
    from jsonschemaparse_spark.plans import validate_json_column

    j = spark.createDataFrame(
        [(1, '{"n": 42}'), (2, '{"n": 12345678901234567890123}')],
        "id long, doc string",
    )
    rules = {"properties": {"n": {"type": "number"}}}
    res = validate_json_column(j, "doc", rules, key_cols=["id"], big_number="error")
    rows = res.violations().collect()
    assert [(r["id"], r["keyword"], r["message"], r["path"]) for r in rows] == [
        (2, "bigNumber", BIGNUM_MSG, "")
    ]


def test_bignumber_error_differential_vs_node():
    """Executed-reference differential for the bigNumber 'error' policy:
    each literal through node StreamParser({bigNumber:'error'}) vs
    api.parse_info(big_number='error').

    Known divergence class (documented, not copied): the reference's
    plain-integer digit count does `buf.indexOf('.') ? 1 : 0` — indexOf
    returns -1 (truthy) when there is NO decimal point, so every integer
    gets one free digit and 16-digit lossy integers (e.g. 2^53+1) slip
    through (parse.js:1174-1176). Our rule is the exact binary64
    round-trip, so we flag them. Second divergence class, found by
    EXECUTING the reference: exponent-form literals crash it with a
    TypeError under any non-default bigNumber policy — parse.js:1146 does
    `value.split(/e\\+?/i)` on `value`, which was already JSON.parsed to a
    NUMBER two lines earlier (the intended receiver is `buf`). We
    implement the intended semantics (exponent > 307 or precision >= 16
    flags). The assertion: whenever the reference flags, we flag too;
    where the heuristics agree the verdicts match; crash-class literals
    get pinned intended-semantics verdicts."""
    import json
    import shutil
    import subprocess
    from pathlib import Path

    if shutil.which("node") is None or not Path("/root/reference").exists():
        pytest.skip("node or reference unavailable")

    literals = [
        "42", "-7", "0", "3.25", "-0.5",
        "9007199254740992",          # 2^53: exactly representable
        "9007199254740993",          # 2^53+1: lossy, 16 digits (quirk class)
        "12345678901234567890123",   # 23 digits: both flag
        "1.2345678901234567890123",  # long fraction: both flag
        "0.1", "0.5",
        "123456789.123456789",       # 18 digits: both flag
        "99999999999999999999",      # 20 digits: both flag
        # exponent forms: reference crash class (TypeError, parse.js:1146)
        "1e3", "2.5e-3", "1e400",
    ]
    crash_class = {"1e3", "2.5e-3", "1e400"}
    intended = {"1e3": False, "2.5e-3": False, "1e400": True}
    driver = (
        "const lib = require('/root/reference/index.js');\n"
        "const lits = JSON.parse(process.argv[1]);\n"
        "const out = [];\n"
        "for (const t of lits) {\n"
        "  try {\n"
        "    const p = new lib.StreamParser({schema: new lib.Schema('http://x/',"
        " {type:['number','integer']}), parseValue:true, bigNumber:'error'});\n"
        "    p.parse(t);\n"
        "    out.push(false);\n"
        "  } catch (e) {\n"
        "    if (e.constructor.name === 'ResourceLimitError') out.push(true);\n"
        "    else if (e.constructor.name === 'TypeError') out.push('crash');\n"
        "    else throw e;\n"
        "  }\n"
        "}\n"
        "console.log(JSON.stringify(out));\n"
    )
    ref_flags = json.loads(subprocess.run(
        ["node", "-e", driver, json.dumps(literals)],
        capture_output=True, text=True, check=True,
    ).stdout)

    from jsonschemaparse_spark.api import parse_info

    for lit, ref_flagged in zip(literals, ref_flags):
        info = parse_info(lit, {"type": ["number", "integer"]}, big_number="error")
        ours = any(e.keyword == "bigNumber" for e in info.errors)
        if lit in crash_class:
            assert ref_flagged == "crash", f"reference no longer crashes on {lit!r}"
            assert ours == intended[lit], f"intended-semantics verdict on {lit!r}"
        elif ref_flagged is True:
            assert ours, f"reference flags {lit!r}, we do not"
        elif lit == "9007199254740993":
            assert ours, "the quirk-class literal must still be flagged by our exact rule"
        else:
            assert ours == ref_flagged, f"verdict mismatch on {lit!r}"


def test_bignumber_exact_representable_longs_not_flagged(spark):
    """r4 review finding #2: 2^60 is exactly binary64-representable (and
    _is_lossy agrees) — the earlier double->decimal comparison was
    string-rounded by Spark and false-flagged it. Long.MaxValue and the
    non-representable top-edge interval still flag."""
    from jsonschemaparse_spark.plans import validate_dataframe

    rules = {"properties": {"n": {"type": "integer"}}}
    df = spark.createDataFrame(
        [(1, 1 << 60),                    # representable: 2^60
         (2, (1 << 60) + 1),              # lossy: needs 61 bits
         (3, 9223372036854774784),        # representable: 2^63 - 1024
         (4, 9223372036854775807),        # lossy: Long.MaxValue (top edge)
         (5, 9223372036854775295),        # lossy: inside (2^63-1024, 2^63)
         (6, -(1 << 61))],                # representable: -2^61
        "id long, n long",
    )
    res = validate_dataframe(df, rules, key_cols=["id"], big_number="error")
    flagged = sorted(r["id"] for r in res.violations().collect())
    assert flagged == [2, 4, 5]
    # cross-path agreement with the exact Python rule
    from jsonschemaparse_spark.schema.relaxed_json import _is_lossy

    for rid, v in [(1, 1 << 60), (2, (1 << 60) + 1), (3, 9223372036854774784),
                   (4, 9223372036854775807), (5, 9223372036854775295),
                   (6, -(1 << 61))]:
        assert _is_lossy(str(v)) == (rid in (2, 4, 5)), v


def test_bignumber_decimal_routes_to_exact_fallback(spark):
    """DecimalType under big_number='error' goes through the Arrow
    fallback (no exact in-codegen test exists — Spark double casts are
    string-rounded): 2^60 as a decimal must NOT be flagged, a 23-digit
    value must."""
    from decimal import Decimal

    from pyspark.sql import functions as F  # noqa: F811

    from jsonschemaparse_spark.plans import validate_dataframe

    rules = {"properties": {"n": {"type": "number"}}}
    df = spark.createDataFrame(
        [(1, Decimal(1 << 60)), (2, Decimal("12345678901234567890123")), (3, None)],
        "id long, n decimal(38,0)",
    )
    res = validate_dataframe(df, rules, key_cols=["id"], big_number="error")
    rows = res.violations().collect()
    assert [(r["id"], r["keyword"], r["message"]) for r in rows] == [
        (2, "bigNumber", BIGNUM_MSG)
    ]
    got = {r["id"]: r["_jsp_valid"] for r in res.annotated.collect()}
    assert got == {1: True, 2: False, 3: True}


def test_positioned_error_keeps_original_message_on_disagreement():
    """r4 review finding #6: if the FSM ever accepts what the C scanner
    rejected, the original message must survive."""
    from jsonschemaparse_spark.api import _positioned_syntax_error

    err = _positioned_syntax_error("42", ValueError("scanner said no"))
    assert "scanner said no" in str(err)
    assert err.position is None
