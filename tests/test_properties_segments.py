"""Property-based tests for the segment-level dedup primitives
(operators/dedup.py::segment_explode / segment_occurrences) against a
plain-Python reference over random small corpora: segmentation
partitions the text exactly, keep-first picks the corpus-wide minimum
(id, chunk) per distinct segment, and the source-set pair enumeration
in d_source_overlap_matrix matches a brute-force set computation."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from etl_data_peri_institute_spark.operators.dedup import (
    segment_explode,
    segment_occurrences,
)

# session-scoped spark fixture comes from conftest

VOCAB = ["a", "b", "c"]


@st.composite
def corpus(draw):
    n_docs = draw(st.integers(1, 5))
    n = draw(st.sampled_from([2, 3, 8]))
    docs = []
    for i in range(n_docs):
        n_words = draw(st.integers(1, 12))
        words = [draw(st.sampled_from(VOCAB)) for _ in range(n_words)]
        docs.append((i, " ".join(words)))
    return docs, n


def _ref_segments(text: str, n: int) -> list[str]:
    words = text.split(" ")
    return [
        " ".join(words[i : i + n]) for i in range(0, len(words), n)
    ]


@given(corpus())
@settings(max_examples=20, deadline=None)
def test_segment_explode_partitions_text_exactly(spark, case):
    docs, n = case
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got: dict[int, dict[int, str]] = {}
    for r in segment_explode(df, n=n).collect():
        got.setdefault(r.id, {})[r.chunk] = r.segment
    for doc_id, text in docs:
        ref = _ref_segments(text, n)
        chunks = got.get(doc_id, {})
        assert sorted(chunks) == list(range(len(ref)))
        assert [chunks[i] for i in range(len(ref))] == ref
        # segments partition the text: reassembly is exact
        assert " ".join(ref) == text


@given(corpus())
@settings(max_examples=20, deadline=None)
def test_segment_occurrences_keep_first_is_corpus_min(spark, case):
    docs, n = case
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = segment_occurrences(df, n=n).collect()
    # reference: first (id, chunk) per distinct segment
    ref_first: dict[str, tuple[int, int]] = {}
    for doc_id, text in sorted(docs):
        for chunk, seg in enumerate(_ref_segments(text, n)):
            ref_first.setdefault(seg, (doc_id, chunk))
            ref_first[seg] = min(ref_first[seg], (doc_id, chunk))
    for r in rows:
        assert r.kept == (ref_first[r.segment] == (r.id, r.chunk))
    # exactly one kept occurrence per distinct segment
    kept = [r for r in rows if r.kept]
    assert len(kept) == len(ref_first)
    assert {r.segment for r in kept} == set(ref_first)


@st.composite
def sourced_corpus(draw):
    n_docs = draw(st.integers(2, 6))
    docs = []
    for i in range(n_docs):
        n_words = draw(st.integers(2, 8))
        words = [draw(st.sampled_from(VOCAB)) for _ in range(n_words)]
        src = draw(st.sampled_from(["s1", "s2", "s3"]))
        docs.append((i, " ".join(words), src))
    return docs


@given(sourced_corpus())
@settings(max_examples=15, deadline=None)
def test_overlap_matrix_matches_bruteforce_sets(spark, case):
    # function-scoped monkeypatch doesn't compose with @given; patch
    # module attributes manually and restore in finally
    import etl_data_peri_institute_spark.plans.dedup as m

    n = 2
    df = spark.createDataFrame(case, "doc_id long, text string, source string")
    orig_load, orig_n = m.load_table, m._SEG_N
    m.load_table, m._SEG_N = (lambda s, d, t: df), n
    try:
        got = {
            (r.source_a, r.source_b): (r.n_shared, r.n_a, r.n_b)
            for r in m.d_source_overlap_matrix(spark, "unused").collect()
        }
    finally:
        m.load_table, m._SEG_N = orig_load, orig_n
    # brute force distinct-segment sets per source
    sets: dict[str, set[str]] = {}
    for _, text, src in case:
        sets.setdefault(src, set()).update(_ref_segments(text, n))
    srcs = sorted(sets)
    ref = {}
    for i, a in enumerate(srcs):
        for b in srcs[i + 1 :]:
            shared = len(sets[a] & sets[b])
            if shared:
                ref[(a, b)] = (shared, len(sets[a]), len(sets[b]))
    assert got == ref
