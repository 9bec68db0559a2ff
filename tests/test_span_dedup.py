"""Exact-substring (span-level) dedup: duplicated_span_ranges /
remove_duplicated_spans, and the merge_intervals island operator they
build on. Reference model: Lee et al. 2022 span dedup — repeated n-gram
runs are cut from each document; the reference repo has no counterpart
(its dedup is keep-last row dedup, /root/reference/etl/transform.py),
so these are north-star training-data operators verified by
hand-computed fixtures + an invariant sweep on the gate corpus."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_data_peri_institute_spark.operators.dedup import (
    duplicated_span_ranges,
    remove_duplicated_spans,
)
from etl_data_peri_institute_spark.operators.intervals import merge_intervals

SF = "/root/testdata/sf0.001"


def rows(df, *order):
    return [tuple(r) for r in df.orderBy(*order).collect()]


# ---------------------------------------------------------------------------
# merge_intervals
# ---------------------------------------------------------------------------


def test_merge_intervals_basic(spark):
    df = spark.createDataFrame(
        [
            # key a: [1,3]+[2,5] overlap -> [1,5]; [7,9] separate
            ("a", 1, 3), ("a", 2, 5), ("a", 7, 9),
            # key b: nested interval swallowed
            ("b", 10, 20), ("b", 12, 14),
        ],
        "k string, lo int, hi int",
    )
    got = rows(merge_intervals(df, ["k"]), "k", "lo")
    assert got == [("a", 1, 5), ("a", 7, 9), ("b", 10, 20)]


def test_merge_intervals_adjacency(spark):
    df = spark.createDataFrame(
        [("a", 1, 3), ("a", 4, 6), ("a", 8, 9)], "k string, lo int, hi int"
    )
    # adjacency=0: [1,3] and [4,6] stay apart; adjacency=1 merges them
    assert rows(merge_intervals(df, ["k"]), "lo") == [
        ("a", 1, 3), ("a", 4, 6), ("a", 8, 9),
    ]
    assert rows(merge_intervals(df, ["k"], adjacency=1), "lo") == [
        ("a", 1, 6), ("a", 8, 9),
    ]


def test_merge_intervals_rejects_reserved_columns(spark):
    """Round-5 advice: the fixed temp names would silently clobber a
    caller column — the operator must refuse instead."""
    df = spark.createDataFrame(
        [("a", 1, 3, 0)], "k string, lo int, hi int, __island int"
    )
    with pytest.raises(ValueError, match="__island"):
        merge_intervals(df, ["k"])


def test_remove_spans_with_caller_id_column(spark):
    """Round-5 advice: a caller frame whose id column is literally named
    'id' used to make the per-doc span join ambiguous (or silently drop
    the caller's column). The internal key is now reserved-named."""
    df = spark.createDataFrame(
        [
            (1, f"alpha beta gamma {BOILER} delta"),
            (2, f"one two {BOILER} three four five"),
        ],
        "id int, text string",
    )
    got = {
        r["id"]: (r["text_clean"], r["n_words_removed"])
        for r in remove_duplicated_spans(df, id_col="id", n=3, min_docs=2).collect()
    }
    assert got[1] == ("alpha beta gamma delta", 6)
    assert got[2] == ("one two three four five", 6)


def test_remove_spans_rejects_reserved_columns(spark):
    df = spark.createDataFrame(
        [(1, "a b c", "x")], "doc_id int, text string, __spans string"
    )
    with pytest.raises(ValueError, match="__spans"):
        remove_duplicated_spans(df, n=3, min_docs=2)


def test_merge_intervals_single_shuffle(spark):
    """The window shuffle is the ONLY exchange: the follow-up groupBy
    groups on a superset of the window partition key, so Catalyst must
    not add a second one."""
    df = spark.createDataFrame(
        [("a", 1, 3), ("a", 2, 5)], "k string, lo int, hi int"
    )
    plan = (
        merge_intervals(df, ["k"])._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan


# ---------------------------------------------------------------------------
# duplicated_span_ranges / remove_duplicated_spans (n=3 fixtures)
# ---------------------------------------------------------------------------

BOILER = "all rights reserved contact us today"  # 6 words, shared 3-grams


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (1, f"alpha beta gamma {BOILER} delta"),
            (2, f"one two {BOILER} three four five"),
            (3, "totally unique text with no repeats at all"),
            # doc 4: boilerplate occurs TWICE -> two islands (separated
            # by 2 words, under the n-1 adjacency) both cut
            (4, f"{BOILER} mid gap {BOILER}"),
        ],
        "doc_id int, text string",
    )


def test_span_ranges_hand_computed(spark, docs):
    got = rows(duplicated_span_ranges(docs, n=3, min_docs=2), "id", "lo")
    # BOILER is 6 words -> four 3-grams starting at its offset o:
    # positions o..o+3 merge (adjacency) into [o, o+5]
    assert got == [
        (1, 4, 9),   # BOILER at word 4 of doc 1
        (2, 3, 8),   # BOILER at word 3 of doc 2
        (4, 1, 6),   # first occurrence
        (4, 9, 14),  # second occurrence, separate island
    ]


def test_remove_spans_hand_computed(spark, docs):
    got = {
        r["doc_id"]: (r["text_clean"], r["n_words_removed"], r["n_spans_removed"])
        for r in remove_duplicated_spans(docs, n=3, min_docs=2).collect()
    }
    assert got[1] == ("alpha beta gamma delta", 6, 1)
    assert got[2] == ("one two three four five", 6, 1)
    assert got[3] == ("totally unique text with no repeats at all", 0, 0)
    assert got[4] == ("mid gap", 12, 2)


def test_span_ranges_min_count_intra_doc(spark):
    """min_count flags self-repetition: a gram repeated k+ times inside
    ONE document qualifies even though min_docs never fires (the
    degenerate-generation-loop case of Lee et al.)."""
    loop = "the cat sat"  # 3 words; n=3 -> one gram per occurrence
    df = spark.createDataFrame(
        [
            (1, f"{loop} x y z {loop} p q r {loop}"),  # 3 occurrences
            (2, "completely different words here entirely"),
        ],
        "doc_id int, text string",
    )
    # min_docs=2 alone: nothing (the gram lives in one doc)
    assert duplicated_span_ranges(df, n=3, min_docs=2).count() == 0
    # min_count=3: the three occurrences flag (positions 1, 7, 13)
    got = rows(duplicated_span_ranges(df, n=3, min_docs=2, min_count=3), "id", "lo")
    assert got == [(1, 1, 3), (1, 7, 9), (1, 13, 15)]
    # and the apply cuts them
    out = {
        r["doc_id"]: (r["text_clean"], r["n_spans_removed"])
        for r in remove_duplicated_spans(df, n=3, min_docs=2, min_count=3).collect()
    }
    assert out[1] == ("x y z p q r", 3)
    assert out[2][1] == 0


def test_span_ranges_min_count_does_not_weaken_min_docs(spark, docs):
    """Either threshold qualifies a gram — adding a high min_count must
    keep the cross-document behavior identical."""
    base = rows(duplicated_span_ranges(docs, n=3, min_docs=2), "id", "lo")
    both = rows(
        duplicated_span_ranges(docs, n=3, min_docs=2, min_count=99), "id", "lo"
    )
    assert base == both


def test_remove_spans_no_udf_in_plan(spark, docs):
    plan = (
        remove_duplicated_spans(docs, n=3, min_docs=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for marker in ("BatchEvalPython", "ArrowEvalPython", "PythonUDF"):
        assert marker not in plan, marker


def test_remove_spans_invariants_on_corpus(spark):
    """Gate-corpus sweep: cleaning never grows a document, removed word
    mass equals the length delta, span-free docs pass through verbatim,
    and re-running on the cleaned text is idempotent for docs that had
    no spans (their text is unchanged)."""
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .limit(200)
    )
    out = remove_duplicated_spans(docs, n=8, min_docs=2).cache()
    nwords = F.size(F.split("text", " "))
    nclean = F.when(F.col("text_clean") == "", 0).otherwise(
        F.size(F.split("text_clean", " "))
    )
    bad = out.filter(nclean + F.col("n_words_removed") != nwords)
    assert bad.count() == 0, bad.limit(5).collect()
    passthrough = out.filter(F.col("n_spans_removed") == 0)
    assert passthrough.filter(F.col("text_clean") != F.col("text")).count() == 0
    assert out.filter(F.col("n_words_removed") < 0).count() == 0
    out.unpersist()
