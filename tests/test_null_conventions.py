"""NULL-text convention, pinned across every text operator (r6, VERDICT
r5 #5 + 'what's wrong' #2).

The convention (functions/dedup.py module header):
  * KEYING operators treat NULL like '' — null-text docs join the
    empty-text exact-dup group and keep one survivor;
  * REWRITING operators preserve NULL — a NULL-text row comes out NULL,
    never silently rewritten to '';
  * METRIC gates score NULL as empty — zero counts, keep=False.
"""

import pytest

from pyspark.sql import functions as F


def _rewriters():
    from jsonschemaparse_spark.functions.dedup import (
        remove_duplicate_spans,
        strip_boilerplate_lines,
    )
    from jsonschemaparse_spark.functions.pii import redact_pii
    from jsonschemaparse_spark.functions.text import c4_line_filter

    return {
        "strip_boilerplate_lines": lambda df: strip_boilerplate_lines(
            df, "doc_id", min_docs=2),
        "remove_duplicate_spans": lambda df: remove_duplicate_spans(
            df, "doc_id"),
        "c4_line_filter": lambda df: c4_line_filter(df),
        "redact_pii": lambda df: redact_pii(df),
    }


@pytest.mark.parametrize("op", ["strip_boilerplate_lines",
                                "remove_duplicate_spans", "c4_line_filter",
                                "redact_pii"])
def test_rewriting_ops_preserve_null_text(spark, op):
    body = ("A first proper sentence with many words here.\n"
            "A second proper sentence with many words too!\n"
            "And a third full sentence closes it out nicely?")
    df = spark.createDataFrame(
        [(1, body), (2, body), (3, None), (4, "")],
        "doc_id long, text string")
    out = _rewriters()[op](df)
    rows = {r["doc_id"]: r["text"] for r in out.collect()}
    assert rows[3] is None, f"{op}: NULL text must stay NULL, got {rows[3]!r}"
    assert rows[4] is not None, f"{op}: empty text must stay non-NULL"
    assert len(rows) == 4  # no rows dropped


def test_metric_gates_score_null_as_empty(spark):
    from jsonschemaparse_spark.functions.text import quality_flags

    df = spark.createDataFrame([(1, None)], "doc_id long, text string")
    r = quality_flags(df, badwords=["x"]).first()
    assert r["n_words"] == 0 and r["n_sentences"] == 0
    assert r["gopher_keep"] is False and r["c4_keep"] is False
    assert r["quality_keep"] is False
    assert r["has_bad_word"] is False


def test_keying_ops_collapse_null_with_empty(spark):
    """r5 third review #3 semantics, now shared by BOTH exact dedup
    shapes: null and '' form one content group; min-id row survives."""
    from jsonschemaparse_spark.functions.dedup import (
        exact_dedup,
        exact_dedup_linear,
    )

    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "   "), (4, "real content here")],
        "doc_id long, text string")
    for fn in (exact_dedup, exact_dedup_linear):
        kept = sorted(r["doc_id"] for r in fn(df, "doc_id").collect())
        assert kept == [1, 4], (fn.__name__, kept)


def test_exact_dedup_linear_matches_join_form(spark, documents):
    """The r6 linear (groupBy-min-struct) shape keeps exactly the same
    rows as the join shape on a real corpus with clones."""
    from jsonschemaparse_spark.functions.dedup import (
        exact_dedup,
        exact_dedup_linear,
    )

    base = documents.limit(200)
    clones = base.filter(F.col("doc_id") < 40).withColumn(
        "doc_id", F.col("doc_id") + 1_000_000)
    corpus = base.unionByName(clones)
    a = {tuple(r) for r in exact_dedup(corpus, "doc_id").collect()}
    b = {tuple(r) for r in exact_dedup_linear(corpus, "doc_id").collect()}
    assert a == b and len(a) == 200


# =========================================================================
# moved from test_round5_fixes.py (round-fix regression pins, split by
# topic per VERDICT r5 #8)
# =========================================================================
import pytest  # noqa: E402,F811,F401
from pyspark.sql import functions as F  # noqa: E402,F811,F401

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

