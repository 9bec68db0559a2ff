"""Round-6 continuation batch 3: content-defined chunking (report +
insertion-robust keep-first apply) and the one-scan corpus card.
Hand fixtures pin the semantics; the gate queries carry the
cross-engine oracle checks (now domain modules, ex round6d_ext)."""

from __future__ import annotations

import hashlib
import random

from pyspark.sql import functions as F

from etl_data_peri_institute_spark.operators.dedup import (
    content_defined_chunks,
    segment_explode,
)
from etl_data_peri_institute_spark.plans import catalog

SF = "/root/testdata/sf0.001"


def _q(name):
    catalog.load_all()
    return catalog.QUERIES[name].fn


def _ref_chunks(text: str, w: int = 4) -> list[str]:
    """Plain-Python replica of content_defined_chunks on one doc."""
    words = text.split(" ")
    chunks, cur = [], []
    for pos, word in enumerate(words, start=1):
        boundary = pos == 1
        if pos > w:
            window = " ".join(words[pos - 1 - w : pos - 1])
            boundary = hashlib.md5(window.encode()).hexdigest()[0] == "0"
        if boundary and cur:
            chunks.append(" ".join(cur))
            cur = []
        cur.append(word)
    if cur:
        chunks.append(" ".join(cur))
    return chunks


def _rand_text(rng: random.Random, n: int) -> str:
    return " ".join(rng.choice("abcdefgh") + str(rng.randint(0, 30))
                    for _ in range(n))


# ---------------------------------------------------------------------------
# content_defined_chunks
# ---------------------------------------------------------------------------


def test_cdc_matches_python_reference_and_partitions_text(spark):
    rng = random.Random(7)
    docs = [(i, _rand_text(rng, rng.randint(1, 120))) for i in range(6)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got: dict[int, dict[int, str]] = {}
    for r in content_defined_chunks(df).collect():
        got.setdefault(r.id, {})[r.chunk_id] = r.chunk_text
    for doc_id, text in docs:
        ref = _ref_chunks(text)
        chunks = got[doc_id]
        assert sorted(chunks) == list(range(1, len(ref) + 1))
        assert [chunks[i] for i in range(1, len(ref) + 1)] == ref
        # chunks partition the text exactly
        assert " ".join(ref) == text


def test_cdc_boundaries_resync_after_insertion(spark):
    # THE property that motivates CDC over fixed-width segmentation:
    # insert one word at the front — CDC boundaries re-sync after the
    # edit's neighborhood, fixed segments all shift.
    rng = random.Random(42)
    base = _rand_text(rng, 400)
    edited = "INSERTED " + base
    df = spark.createDataFrame(
        [(1, base), (2, edited)], "doc_id long, text string"
    )
    by_doc: dict[int, set[str]] = {1: set(), 2: set()}
    for r in content_defined_chunks(df).collect():
        by_doc[r.id].add(r.chunk_text)
    cdc_shared = len(by_doc[1] & by_doc[2])
    assert cdc_shared / len(by_doc[1]) > 0.5  # most chunks survive the edit

    seg_by_doc: dict[int, set[str]] = {1: set(), 2: set()}
    for r in segment_explode(df, n=8).collect():
        seg_by_doc[r.id].add(r.segment)
    seg_shared = len(seg_by_doc[1] & seg_by_doc[2])
    # fixed windows shift: (almost) nothing survives; CDC strictly wins
    assert cdc_shared > 4 * max(seg_shared, 1)


def test_cdc_apply_keep_first_fixture(spark, monkeypatch):
    # two identical docs: doc 1 keeps everything, doc 2 drops every
    # chunk that also appears in doc 1 (all of them)
    rng = random.Random(3)
    text = _rand_text(rng, 100)
    df = spark.createDataFrame(
        [(1, text), (2, text)], "doc_id long, text string"
    )
    import etl_data_peri_institute_spark.plans.dedup as m

    monkeypatch.setattr(m, "load_table", lambda s, d, t: df)
    out = {r.doc_id: r for r in m.d_cdc_dedup_apply(spark, SF).collect()}
    assert out[1].text_clean == text
    assert out[1].n_chunks_dropped == 0
    assert out[2].text_clean == ""
    assert out[2].n_chunks_dropped == out[2].n_chunks == out[1].n_chunks


def test_cdc_report_gate_shapes(spark):
    rows = _q("d_cdc_chunking")(spark, SF).collect()
    assert len(rows) == 20  # one per source
    for r in rows:
        assert r.n_distinct_chunks <= r.n_chunks
        assert 0.0 <= r.dup_rate < 1.0
        assert 0 < r.avg_words_per_chunk <= r.max_words_per_chunk


# ---------------------------------------------------------------------------
# p_corpus_card
# ---------------------------------------------------------------------------


def test_corpus_card_values_match_manual(spark, monkeypatch):
    rows = [
        (1, "a b c", "en", "s1", 5),
        (2, "a b c", "en", "s1", 5),   # exact dup of doc 1
        (3, "x y", "fr", "s2", 3),
        (4, "z", "en", "s2", 1),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    import etl_data_peri_institute_spark.plans.quality_ext as m

    monkeypatch.setattr(m, "load_table", lambda s, d, t: df)
    card = {r.metric: r.value for r in m.p_corpus_card(spark, SF).collect()}
    assert card["n_docs"] == 4.0
    assert card["n_sources"] == 2.0
    assert card["n_langs"] == 2.0
    assert card["total_tokens"] == 3 + 3 + 2 + 1
    assert card["total_chars"] == 14.0
    assert card["max_doc_tokens"] == 3.0
    assert card["avg_doc_tokens"] == round(9 / 4, 4)
    assert card["p50_doc_tokens"] == 2.5  # interpolated between 2 and 3
    assert card["exact_dup_doc_rate"] == round(1 - 3 / 4, 6)


def test_corpus_card_single_scan_plan(spark):
    df = _q("p_corpus_card")(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # one corpus scan feeds every metric (the distinct counts expand
    # inside the same aggregate, not via separate scans/unions)
    assert plan.count("Scan parquet") == 1
    assert "Union" not in plan
