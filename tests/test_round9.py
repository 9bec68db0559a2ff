"""Round-9 gate invariants: the maintained-state lifecycle pair.

The hash oracles pin cross-engine value equality; these tests pin the
properties the lifecycle gates exist to prove — the day-2 state update
is OBSERVABLE in day-3's output (not vacuously zero) and the update
math leaves untouched state bit-identical.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_data_peri_institute_spark.plans.catalog import QUERIES, load_all
from etl_data_peri_institute_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"

load_all()


def _q(name):
    return QUERIES[name].fn


def test_lsh_band_lifecycle_invariants(spark):
    """Day-2 rows can have no day-2 partners (they probe the PRE-append
    state); day-3 rows cover exactly the % 10 = 8 slice; verdicts are
    consistent with the partner counts; and ≥1 day-3 doc is dropped
    ONLY because of the day-2 append (the state transition is live —
    the same assertion the persisted-artifact twin makes in
    tests/test_formats.py::test_lsh_band_table_two_day_lifecycle)."""
    rows = _q("d_lsh_band_lifecycle")(spark, SF).collect()
    d2 = [r for r in rows if r["day"] == "d2"]
    d3 = [r for r in rows if r["day"] == "d3"]
    assert all(r["n_day2_partners"] == 0 for r in d2)
    docs = load_table(spark, SF, "documents")
    want_d3 = {
        r["doc_id"] for r in docs.filter(F.col("doc_id") % 10 == 8).collect()
    }
    assert {r["doc_id"] for r in d3} == want_d3
    for r in rows:
        total = r["n_corpus_partners"] + r["n_day2_partners"]
        assert r["verdict"] == ("drop" if total > 0 else "keep"), r
    assert any(
        r["n_day2_partners"] > 0 and r["n_corpus_partners"] == 0 for r in d3
    ), "append must flip at least one day-3 verdict at this SF"


def test_quantizer_lifecycle_moved_is_nonvacuous(spark):
    """The day-2 fold-in must CHANGE at least one day-3 assignment at
    this SF (a zero moved column would make update-then-serve
    unobservable), every day-3 vector appears exactly once, and each
    updated list's day-2 member count is consistent with an independent
    recount of the day-2 assignment."""
    from etl_data_peri_institute_spark.operators.similarity import (
        centroid_pos_stats,
        top_centroids,
    )

    rows = _q("e_ivf_quantizer_lifecycle")(spark, SF).collect()
    emb = load_table(spark, SF, "embeddings")
    mod = F.col("vec_id") % 10
    want = {r["vec_id"] for r in emb.filter(mod == 8).collect()}
    assert {r["vec_id"] for r in rows} == want and len(rows) == len(want)
    assert sum(r["moved"] for r in rows) >= 1

    cstats = centroid_pos_stats(emb.filter(~mod.isin(7, 8)))
    cents1 = cstats.select(
        "c_label", "pos", (F.col("csum") / F.col("cnt")).alias("cval")
    )
    a2 = top_centroids(emb.filter(mod == 7), cents1, n=1)
    adds = {
        r["c_label"]: r["n"]
        for r in a2.groupBy("c_label").agg(F.count("*").alias("n")).collect()
    }
    for r in rows:
        assert r["n_day2_in_list"] == adds.get(r["list_updated"], 0), r


def test_centroid_running_update_untouched_lists_bit_identical(spark):
    """A list with NO day-2 members must come out of
    centroid_running_update with a BIT-IDENTICAL centroid
    ((csum + 0.0) / (cnt + 0) is exact in IEEE) — the update may never
    perturb state it didn't touch."""
    from etl_data_peri_institute_spark.operators.similarity import (
        centroid_pos_stats,
        centroid_running_update,
    )

    emb = load_table(spark, SF, "embeddings")
    mod = F.col("vec_id") % 10
    corpus = emb.filter(~mod.isin(7, 8))
    cstats = centroid_pos_stats(corpus)
    # assign the whole batch to ONE list so every other list is untouched
    some_label = corpus.select("label").orderBy("label").limit(1).collect()[0][0]
    batch = emb.filter(mod == 7)
    forced = batch.select(
        F.col("vec_id").alias("id"), F.lit(some_label).alias("c_label")
    )
    updated = centroid_running_update(cstats, batch, forced)
    before = {
        (r["c_label"], r["pos"]): r["csum"] / r["cnt"] for r in cstats.collect()
    }
    after = {(r["c_label"], r["pos"]): r["cval"] for r in updated.collect()}
    assert set(before) == set(after)
    n_moved = n_same = 0
    for k, v in after.items():
        if k[0] == some_label:
            n_moved += 1
            assert v != before[k] or abs(before[k]) < 1e-15
        else:
            n_same += 1
            assert v == before[k], (k, v, before[k])  # bit-identical
    assert n_moved > 0 and n_same > 0


def test_lsh_band_retraction_invariants(spark):
    """The takedown gate: verdicts must ignore retracted partners; ≥1
    day-3 doc at this SF is a 'keep' PURELY because its only partners
    were retracted (the compliance flip); and the retraction is
    observable (≥1 nonzero n_retracted_partners). Consistency: the
    retained+day2 counts must equal the lifecycle gate's day-3 counts
    restricted to non-retracted partners... checked structurally: for
    every doc, verdict == drop iff retained+day2 > 0."""
    rows = _q("d_lsh_band_retraction")(spark, SF).collect()
    assert any(r["n_retracted_partners"] > 0 for r in rows)
    assert any(
        r["n_retracted_partners"] > 0
        and r["n_retained_partners"] == 0
        and r["n_day2_partners"] == 0
        and r["verdict"] == "keep"
        for r in rows
    ), "takedown must flip at least one verdict to keep at this SF"
    for r in rows:
        total = r["n_retained_partners"] + r["n_day2_partners"]
        assert r["verdict"] == ("drop" if total > 0 else "keep"), r
    # cross-gate consistency: lifecycle's day-3 corpus partners =
    # retraction's retained + retracted (same state, different split)
    lc = {
        r["doc_id"]: r
        for r in _q("d_lsh_band_lifecycle")(spark, SF).collect()
        if r["day"] == "d3"
    }
    for r in rows:
        assert (
            lc[r["doc_id"]]["n_corpus_partners"]
            == r["n_retained_partners"] + r["n_retracted_partners"]
        ), r
        assert lc[r["doc_id"]]["n_day2_partners"] == r["n_day2_partners"], r
