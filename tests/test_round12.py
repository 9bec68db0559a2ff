"""Round-12 optimization tests.

The r12 lifecycle/retraction/staleness rewrites hinge on ONE new
operator: multi-variant centroid assignment
(operators/similarity.top_centroids_tagged / nearest_centroid_multi) —
one posexplode + one broadcast join + one window for N quantizer
variants instead of N separate top_centroids passes. These tests pin
the operator's exact equivalence to the per-variant form it replaced
(same dots, same ranks, same pivot), so the gate rewrites reduce to
"the fused pass equals the N passes", which the DuckDB oracle then
certifies end-to-end at every SF.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_data_peri_institute_spark.operators.similarity import (
    centroids_by,
    nearest_centroid_multi,
    top_centroids,
    top_centroids_tagged,
)
from etl_data_peri_institute_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _variants(spark):
    emb = load_table(spark, SF, "embeddings")
    stale = centroids_by(emb.where(F.col("vec_id") % 10 != 7), "label")
    fresh = centroids_by(emb, "label")
    return emb, [("stale", stale), ("fresh", fresh)]


def test_top_centroids_tagged_matches_per_variant(spark):
    emb, variants = _variants(spark)
    got = sorted(
        (r["variant"], r["id"], r["c_label"], r["rn"])
        for r in top_centroids_tagged(emb, variants, n=2).collect()
    )
    want = sorted(
        (name, r["id"], r["c_label"], r["rn"])
        for name, cents in variants
        for r in top_centroids(emb, cents, n=2).collect()
    )
    assert got == want and len(got) > 0


def test_nearest_centroid_multi_matches_joined_assignments(spark):
    emb, variants = _variants(spark)
    got = sorted(
        (r["id"], r["stale"], r["fresh"])
        for r in nearest_centroid_multi(emb, variants).collect()
    )
    per = {}
    for name, cents in variants:
        for r in top_centroids(emb, cents, n=1).collect():
            per.setdefault(r["id"], {})[name] = r["c_label"]
    want = sorted((i, v["stale"], v["fresh"]) for i, v in per.items())
    assert got == want and len(got) > 0
    # every id assigned under every variant (the pivot-equals-join
    # precondition the gates rely on)
    assert all(len(v) == 2 for v in per.values())
