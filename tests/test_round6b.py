"""Round-6 continuation operators: segment-level corpus dedup
(segment_occurrences + the report/apply gate pair), boilerplate-prefix
detection, quality-score quantile normalization, and length bucketing.
Hand-computed fixtures pin the semantics; the gate queries carry the
cross-engine oracle checks (now domain modules, ex round6b_ext)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from etl_data_peri_institute_spark.operators.dedup import segment_occurrences
from etl_data_peri_institute_spark.plans import catalog

SF = "/root/testdata/sf0.001"


def rows(df, *order):
    return [tuple(r) for r in df.orderBy(*order).collect()]


# ---------------------------------------------------------------------------
# segment_occurrences
# ---------------------------------------------------------------------------


def _docs(spark, items):
    return spark.createDataFrame(items, "doc_id long, text string")


def test_segment_occurrences_keep_first(spark):
    # n=2 segments; "a b" appears in doc 1 chunk 0, doc 2 chunk 1 and
    # doc 1 chunk 2 -> only (1, 0) is kept
    df = _docs(spark, [(1, "a b x y a b"), (2, "z w a b")])
    occ = segment_occurrences(df, n=2)
    got = {(r.id, r.chunk): (r.segment, r.kept) for r in occ.collect()}
    assert got[(1, 0)] == ("a b", True)
    assert got[(1, 1)] == ("x y", True)
    assert got[(1, 2)] == ("a b", False)   # intra-doc repeat dropped
    assert got[(2, 0)] == ("z w", True)
    assert got[(2, 1)] == ("a b", False)   # cross-doc repeat dropped


def test_segment_occurrences_short_tail_segment(spark):
    # 5 tokens at n=2 -> chunks "a b", "c d", "e" (tail shorter than n)
    df = _docs(spark, [(1, "a b c d e")])
    got = rows(segment_occurrences(df, n=2).select("chunk", "segment"), "chunk")
    assert got == [(0, "a b"), (1, "c d"), (2, "e")]


def test_segment_occurrences_doc_shorter_than_n(spark):
    df = _docs(spark, [(1, "only three words")])
    got = rows(
        segment_occurrences(df, n=8).select("chunk", "segment", "kept"), "chunk"
    )
    assert got == [(0, "only three words", True)]


def test_segment_occurrences_extra_cols_ride_along(spark):
    df = spark.createDataFrame(
        [(1, "a b", "s1"), (2, "a b", "s2")],
        "doc_id long, text string, source string",
    )
    occ = segment_occurrences(df, n=2, extra_cols=("source",))
    got = {r.id: (r.source, r.kept) for r in occ.collect()}
    assert got == {1: ("s1", True), 2: ("s2", False)}


def test_segment_dedup_apply_reassembles_and_empties(spark):
    # doc 2 is entirely segments already seen in doc 1 -> text_clean ''
    df = _docs(spark, [(1, "a b c d"), (2, "a b c d"), (3, "c d e f")])
    occ = segment_occurrences(df, n=2)
    kept_struct = F.when(F.col("kept"), F.struct("chunk", "segment"))
    out = occ.groupBy("id").agg(
        F.array_join(
            F.transform(F.array_sort(F.collect_list(kept_struct)), lambda s: s["segment"]),
            " ",
        ).alias("text_clean"),
        F.sum((~F.col("kept")).cast("long")).alias("n_dropped"),
    )
    got = {r.id: (r.text_clean, r.n_dropped) for r in out.collect()}
    assert got[1] == ("a b c d", 0)
    assert got[2] == ("", 2)            # all segments were repeats
    assert got[3] == ("e f", 1)         # "c d" seen in doc 1; "e f" novel


def test_segment_dedup_words_partition_exactly_once(spark):
    """Segments partition the text: kept + dropped token counts equal the
    original token count for every doc (no double-cutting, no loss)."""
    from etl_data_peri_institute_spark.sources.tables import load_table

    docs = load_table(spark, SF, "documents").limit(200)
    occ = segment_occurrences(docs, n=8)
    per_doc = occ.groupBy("id").agg(
        F.sum(F.size(F.split("segment", " "))).alias("seg_tokens")
    )
    orig = docs.select(
        F.col("doc_id").alias("id"),
        F.size(F.split("text", " ")).alias("n_tokens"),
    )
    bad = per_doc.join(orig, "id").filter(F.col("seg_tokens") != F.col("n_tokens"))
    assert bad.count() == 0


# ---------------------------------------------------------------------------
# gate queries: hand-checked invariants on the real corpus
# ---------------------------------------------------------------------------


def test_boilerplate_prefix_report_bounds(spark):
    catalog.load_all()
    out = catalog.QUERIES["t_boilerplate_prefix_report"].fn(spark, SF).collect()
    assert len(out) == 20  # one row per source
    for r in out:
        assert 0.0 < r.prefix_share <= 1.0
        assert len(r.top_prefix.split(" ")) <= 3


def test_boilerplate_prefix_tiebreak_largest(spark):
    """Two prefixes at equal count -> the lexicographically larger wins
    (the pinned cross-engine tiebreak)."""
    df = spark.createDataFrame(
        [(1, "a a a x", "s"), (2, "b b b y", "s")],
        "doc_id long, text string, source string",
    )
    pref = df.select(
        "source",
        F.concat_ws(" ", F.slice(F.split("text", " "), 1, 3)).alias("prefix"),
    )
    cnt = pref.groupBy("source", "prefix").agg(F.count("*").alias("n"))
    top = cnt.groupBy("source").agg(F.max(F.struct(F.col("n"), F.col("prefix"))).alias("t"))
    assert top.collect()[0].t.prefix == "b b b"


def test_quantile_normalize_monotone_and_bounded(spark):
    catalog.load_all()
    out = (
        catalog.QUERIES["t_quality_quantile_normalize"]
        .fn(spark, SF)
        .collect()
    )
    scores = sorted(r.score for r in out)
    lo, hi = scores[0], scores[-1]
    by_source: dict[str, list] = {}
    for r in out:
        assert lo <= r.calibrated <= hi          # stays inside pooled range
        assert 0.0 < r.src_quantile < 1.0        # (rank-0.5)/n is open
        by_source.setdefault(r.source, []).append(r)
    for rs in by_source.values():
        rs.sort(key=lambda r: r.src_quantile)
        for a, b in zip(rs, rs[1:]):
            assert a.calibrated <= b.calibrated  # monotone within source


def test_quantile_normalize_hand_case(spark):
    """Single source == pooled distribution: the median-ranked doc of
    5 maps to p=0.5 exactly, k=5, frac=0 -> calibrated == pooled median."""
    df = spark.createDataFrame(
        [(i, "s", float(v)) for i, v in enumerate([10, 20, 30, 40, 50])],
        "doc_id long, source string, score double",
    )
    pooled = sorted([10.0, 20.0, 30.0, 40.0, 50.0])
    # replicate the plan's arithmetic for the rank-3 row
    p = (3 - 0.5) / 5            # 0.5
    k = min(math.floor(p * 10), 9)
    frac = p * 10 - k
    expected = pooled[2] + 0.0 * frac  # q[5] = median = 30 (frac 0)
    from etl_data_peri_institute_spark.plans.textops import _QN_PROBS

    qs = df.agg(F.percentile("score", F.lit(_QN_PROBS)).alias("qs")).collect()[0].qs
    assert qs[5] == 30.0 and expected == 30.0 and k == 5 and frac == 0.0


def test_length_bucketing_boundaries(spark):
    """Exactly-16 tokens -> bucket 16 (zero padding); 17 -> bucket 32."""
    t16 = " ".join(["w"] * 16)
    t17 = " ".join(["w"] * 17)
    df = spark.createDataFrame([(1, t16), (2, t17)], "doc_id long, text string")
    n_tokens = F.size(F.split("text", " ")).cast("long")
    from etl_data_peri_institute_spark.plans.curation import _BUCKETS

    bucket = F.lit(4096).cast("long")
    for b in reversed(_BUCKETS):
        bucket = F.when(n_tokens <= b, F.lit(b).cast("long")).otherwise(bucket)
    got = {r.doc_id: r.b for r in df.select("doc_id", bucket.alias("b")).collect()}
    assert got == {1: 16, 2: 32}


def test_length_bucketing_waste_conservation(spark):
    """sum_tokens + padding_tokens == n_docs * bucket per bucket row."""
    catalog.load_all()
    out = catalog.QUERIES["b_length_bucketing"].fn(spark, SF).collect()
    assert out, "bucket report empty"
    for r in out:
        assert r.sum_tokens + r.padding_tokens == r.n_docs * r.bucket
        assert 0.0 <= r.waste_pct < 1.0
