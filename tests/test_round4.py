"""Round-4 operators: blocked fuzzy join, inverted index, quality
rules, weighted sampling, winsorized stats, perplexity."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from etl_data_peri_institute_spark.operators.fuzzy import blocked_fuzzy_pairs
from etl_data_peri_institute_spark.plans import catalog

catalog.load_all()

SF = "/root/testdata/sf0.001"


def _run(spark, name: str):
    return catalog.QUERIES[name].fn(spark, SF)


# --------------------------------------------------------------------------
# blocked_fuzzy_pairs operator semantics
# --------------------------------------------------------------------------


def test_fuzzy_pairs_basic(spark):
    df = spark.createDataFrame(
        [("cold widget",), ("old widget",), ("blue rod",), ("cold widget",)],
        ["name"],
    )
    out = blocked_fuzzy_pairs(
        df, "name", block=lambda c: F.element_at(F.split(c, " "), -1), max_dist=2
    ).collect()
    assert [(r.name_a, r.name_b, r.dist) for r in out] == [
        ("cold widget", "old widget", 1)
    ]


def test_fuzzy_pairs_no_cross_block_pairs(spark):
    # same edit distance but different blocks → never compared
    df = spark.createDataFrame([("cold rod",), ("cold rim",)], ["name"])
    out = blocked_fuzzy_pairs(
        df, "name", block=lambda c: F.element_at(F.split(c, " "), -1), max_dist=3
    ).collect()
    assert out == []


def test_fuzzy_pairs_hot_block_cap(spark):
    # 4 distinct names in one block; cap at 3 drops the whole block
    rows = [(f"name{i} widget",) for i in range(4)] + [("cold rod",), ("old rod",)]
    df = spark.createDataFrame(rows, ["name"])
    out = blocked_fuzzy_pairs(
        df,
        "name",
        block=lambda c: F.element_at(F.split(c, " "), -1),
        max_dist=5,
        max_block_rows=3,
    ).collect()
    assert [(r.name_a, r.name_b) for r in out] == [("cold rod", "old rod")]


def test_fuzzy_pairs_multi_block_dedup(spark):
    # names sharing TWO blocks (both "cold" and "widget") must appear
    # once in the pair set, not once per shared block
    df = spark.createDataFrame([("cold widget",), ("cold widget x",)], ["name"])
    out = blocked_fuzzy_pairs(
        df, "name", block=lambda c: F.explode(F.split(c, " ")), max_dist=2
    ).collect()
    assert len(out) == 1


def test_fuzzy_join_no_cartesian(spark):
    plan = (
        _run(spark, "j_fuzzy_join_blocked")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# --------------------------------------------------------------------------
# gate queries: invariants beyond the oracle compare
# --------------------------------------------------------------------------


def test_gopher_rules_counts_partition(spark):
    rows = {r.rule: (r.n_pass, r.n_fail) for r in _run(spark, "t_gopher_quality_rules").collect()}
    n_docs = sum(rows["r1_word_count"])
    assert n_docs > 0
    for rule, (p, f_) in rows.items():
        assert p + f_ == n_docs, rule
    # the conjunction can't pass more than any single rule
    assert rows["r5_all_rules"][0] <= min(v[0] for k, v in rows.items() if k != "r5_all_rules")


def test_inverted_index_postings_sorted_and_bounded(spark):
    out = _run(spark, "t_inverted_index").collect()
    assert out == sorted(out, key=lambda r: r.term)
    for r in out:
        ids = [int(x) for x in r.postings_head.split(",")]
        assert ids == sorted(ids)
        assert len(ids) <= 10
        assert r.doc_freq >= len(ids) if r.doc_freq > 10 else r.doc_freq == len(ids)
        assert r.total_tf >= r.doc_freq


def test_weighted_sample_is_deterministic_and_biased_long(spark):
    a = {r.doc_id for r in _run(spark, "b_weighted_sample").collect()}
    b = {r.doc_id for r in _run(spark, "b_weighted_sample").collect()}
    assert a == b and len(a) == 200
    # length-weighted: the sampled mean length must exceed the corpus mean
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    corpus_mean = docs.agg(F.avg("n_chars")).first()[0]
    sample_mean = (
        docs.filter(F.col("doc_id").isin(list(a))).agg(F.avg("n_chars")).first()[0]
    )
    assert sample_mean > corpus_mean


def test_winsorized_stats_invariants(spark):
    for r in _run(spark, "f_winsorized_stats").collect():
        assert r.lo_cut <= r.hi_cut
        assert r.n_docs * r.lo_cut <= r.winsorized_sum <= r.n_docs * r.hi_cut


def test_doc_perplexity_bounds(spark):
    out = _run(spark, "t_doc_perplexity").collect()
    assert len(out) == 20
    for r in out:
        # surprisal is non-negative; bigram count bounded by doc length
        assert r.avg_nll_bits >= 0
        assert r.n_bigrams >= 1


@pytest.mark.parametrize(
    "name",
    ["j_fuzzy_join_blocked", "j_fuzzy_resolve_rows", "t_inverted_index"],
)
def test_round4_queries_nonempty(spark, name):
    assert _run(spark, name).count() > 0


# --------------------------------------------------------------------------
# graph operators
# --------------------------------------------------------------------------


def test_pagerank_conserves_mass_and_is_deterministic(spark):
    from etl_data_peri_institute_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("b", "c"), ("c", "b")], ["src", "dst"]
    )
    r1 = {r.id: r.rank for r in pagerank(edges, iterations=5).collect()}
    r2 = {r.id: r.rank for r in pagerank(edges, iterations=5).collect()}
    assert r1 == r2
    assert abs(sum(r1.values()) - 1.0) < 1e-9  # no dangling mass on this graph
    # b has in-links from both a and c → highest rank
    assert r1["b"] > r1["a"] and r1["b"] > r1["c"]


def test_conversion_funnel_monotone(spark):
    rows = {r.step: r.n_users for r in _run(spark, "b_conversion_funnel").collect()}
    assert rows["view"] >= rows["click_after_view"] >= rows["purchase_after_click"]
    assert rows["view"] > 0


def test_robust_outliers_integer_outputs(spark):
    for r in _run(spark, "a_robust_outliers").collect():
        assert r.n_outliers < r.n  # the rule can't flag a majority
        assert r.mad_cents_x4 >= 0 and r.med_cents_x2 > 0


def test_equidepth_histogram_depths_and_edges(spark):
    rows = _run(spark, "f_equidepth_histogram").collect()
    assert [r.bucket for r in rows] == list(range(1, 9))
    # equal depth: counts differ by at most 1; edges are non-decreasing
    counts = [r.n for r in rows]
    assert max(counts) - min(counts) <= 1
    for a, b in zip(rows, rows[1:]):
        assert a.hi <= b.lo
