"""Round-6 continuation batch 2: cross-source segment-overlap matrix,
the deterministic epoch-shuffle pin/production pair, and the iterative
k-means (Lloyd) fit. Hand-computed fixtures pin the semantics; the gate
queries carry the cross-engine oracle checks (now domain modules, ex round6c_ext)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from etl_data_peri_institute_spark.plans import catalog

SF = "/root/testdata/sf0.001"


def _q(name):
    catalog.load_all()
    return catalog.QUERIES[name].fn


# ---------------------------------------------------------------------------
# d_source_overlap_matrix
# ---------------------------------------------------------------------------


def test_source_overlap_matrix_hand_case(spark, monkeypatch):
    # n=8 token segments; docs are exactly one segment long so the
    # distinct-segment sets are easy to enumerate:
    #   src1: {A, B}   src2: {A, B, C}   src3: {Z}
    # shared(src1, src2) = 2 -> jaccard 2/3, containment 2/2 = 1.0
    # src3 overlaps nothing -> no row (inner-join semantics)
    seg = lambda ch: " ".join([ch] * 8)  # noqa: E731
    rows = [
        (1, seg("a"), "src1"),
        (2, seg("b"), "src1"),
        (3, seg("a"), "src2"),
        (4, seg("b"), "src2"),
        (5, seg("c"), "src2"),
        (6, seg("z"), "src3"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    import etl_data_peri_institute_spark.plans.dedup as m

    monkeypatch.setattr(m, "load_table", lambda s, d, t: df)
    out = [tuple(r) for r in m.d_source_overlap_matrix(spark, SF).collect()]
    assert out == [("src1", "src2", 2, 2, 3, round(2 / 3, 4), 1.0)]


def test_source_overlap_matrix_plan_no_segment_join(spark):
    # the source-set plan: pairs come from a JVM-side transform over
    # the per-segment collect_set, NOT a segment self-join — the only
    # joins left are the broadcast size attachments
    plan = _q("d_source_overlap_matrix")(spark, SF)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "collect_set" in plan
    assert "partial_collect_set" in plan  # map-side combine fires


def test_source_overlap_matrix_gate_shapes(spark):
    out = _q("d_source_overlap_matrix")(spark, SF)
    assert out.columns == [
        "source_a", "source_b", "n_shared", "n_a", "n_b",
        "jaccard", "containment",
    ]
    for r in out.collect():
        assert r.source_a < r.source_b
        assert 0 < r.n_shared <= min(r.n_a, r.n_b)
        assert 0.0 < r.jaccard <= 1.0
        assert r.jaccard <= r.containment <= 1.0


# ---------------------------------------------------------------------------
# b_epoch_shuffle / b_epoch_shuffle_production
# ---------------------------------------------------------------------------


def test_epoch_shuffle_is_permutation_per_epoch(spark):
    out = _q("b_epoch_shuffle")(spark, SF).collect()
    by_epoch = {}
    for r in out:
        by_epoch.setdefault(r.epoch, []).append((r.pos, r.doc_id))
    assert set(by_epoch) == {0, 1}
    n = len(by_epoch[0])
    for e, pairs in by_epoch.items():
        assert sorted(p for p, _ in pairs) == list(range(1, n + 1))
        assert len({d for _, d in pairs}) == n
    # epochs produce different orders (md5 decorrelates them)
    order0 = [d for _, d in sorted(by_epoch[0])]
    order1 = [d for _, d in sorted(by_epoch[1])]
    assert order0 != order1
    # and neither is the trivial sorted order
    assert order0 != sorted(order0)


def test_epoch_shuffle_production_bit_identical(spark):
    pin = {(r.epoch, r.doc_id): r.pos
           for r in _q("b_epoch_shuffle")(spark, SF).collect()}
    prod = {(r.epoch, r.doc_id): r.pos
            for r in _q("b_epoch_shuffle_production")(spark, SF).collect()}
    assert pin == prod


def test_epoch_shuffle_deterministic_across_runs(spark):
    a = [tuple(r) for r in _q("b_epoch_shuffle")(spark, SF).collect()]
    b = [tuple(r) for r in _q("b_epoch_shuffle")(spark, SF).collect()]
    assert a == b


def test_epoch_shuffle_production_plan_window_free(spark):
    plan = _q("b_epoch_shuffle_production")(spark, SF)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Window" not in plan


# ---------------------------------------------------------------------------
# e_kmeans_fit
# ---------------------------------------------------------------------------


def test_kmeans_fit_separated_clusters(spark, monkeypatch):
    # Two well-separated 2-D blobs; k is patched to 2 so the seeds
    # (vec_ids 0 and 1) start one-per-blob and Lloyd must keep them
    # there: memberships 3 / 3, every point within d2 <= 0.02 of its
    # centroid.
    rows = [
        (0, [0.0, 0.0], 0),
        (1, [10.0, 10.0], 1),
        (2, [0.1, 0.0], 0),
        (3, [0.0, 0.1], 0),
        (4, [10.1, 10.0], 1),
        (5, [10.0, 10.1], 1),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    import etl_data_peri_institute_spark.plans.ann as m

    monkeypatch.setattr(m, "load_table", lambda s, d, t: df)
    monkeypatch.setattr(m, "_KM_K", 2)
    out = {r.cid: r for r in m.e_kmeans_fit(spark, SF).collect()}
    assert set(out) == {0, 1}
    assert out[0].n_members == 3 and out[1].n_members == 3
    for r in out.values():
        assert r.max_d2 <= 0.02
    # centroid norms: blob means are ~(0.033, 0.033) and ~(10.03, 10.03)
    assert out[0].centroid_norm < 0.1
    assert math.isclose(out[1].centroid_norm, math.hypot(10.0 + 0.1 / 3,
                                                         10.0 + 0.1 / 3),
                        rel_tol=1e-3)


def test_kmeans_fit_gate_invariants(spark):
    out = _q("e_kmeans_fit")(spark, SF)
    assert out.columns == ["cid", "n_members", "avg_d2", "max_d2",
                           "centroid_norm"]
    rows = out.collect()
    emb_n = 500
    assert sum(r.n_members for r in rows) == emb_n  # every vector assigned once
    for r in rows:
        assert 0 <= r.avg_d2 <= r.max_d2
        assert r.centroid_norm > 0
