"""Round-8 tests: invariants of the capacity-balanced IVF assignment
(the DuckDB oracle cross-check runs in tools/oracle_check.py / the
driver gate; these pin the balance semantics directly)."""

from __future__ import annotations

import math

import duckdb

from etl_data_peri_institute_spark.plans import catalog

SF = "/root/testdata/sf0.001"


def _q(name):
    catalog.load_all()
    return catalog.QUERIES[name].fn


def test_ivf_balanced_assign_invariants(spark):
    """The balance contract, checked row-by-row:
    - conservation: sum(n_final) == sum(n_primary) == N (no vector
      lost or duplicated by the spill);
    - cap bound: n_kept <= cap = ceil(N/K) for EVERY list (the point
      of the query);
    - arithmetic: n_spill_out = n_primary - n_kept,
      n_final = n_kept + n_spill_in, global spill conservation;
    - load factors are the advertised normalization."""
    rows = _q("e_ivf_balanced_assign")(spark, SF).collect()
    n_tot = duckdb.sql(
        f"SELECT count(*), count(DISTINCT label) FROM '{SF}/embeddings.parquet'"
    ).fetchone()
    n, k = n_tot
    cap = math.ceil(n / k)
    assert len(rows) == k
    assert sum(r["n_primary"] for r in rows) == n
    assert sum(r["n_final"] for r in rows) == n
    assert sum(r["n_spill_out"] for r in rows) == sum(r["n_spill_in"] for r in rows)
    for r in rows:
        assert r["n_kept"] <= cap, r
        assert r["n_spill_out"] == r["n_primary"] - r["n_kept"], r
        assert r["n_final"] == r["n_kept"] + r["n_spill_in"], r
        assert abs(r["load_before"] - round(r["n_primary"] * k / n, 4)) < 1e-9
        assert abs(r["load_after"] - round(r["n_final"] * k / n, 4)) < 1e-9
    # balancing must not be a no-op census: the synthetic corpus has at
    # least one over-cap list, so some spill actually happened
    assert any(r["n_spill_out"] > 0 for r in rows)
    # and it must reduce the worst load factor (or leave it equal when
    # spill lands on the max list — never increase the maximum KEPT load)
    assert max(r["n_kept"] for r in rows) <= max(r["n_primary"] for r in rows)


def test_compression_recall_matrix_has_ivf_pq_tier(spark):
    """Round-8 addition: the (codes, pruned) cell is recall-scored.
    The matrix must carry all four tiers for every query with hits in
    [0, 10]. (No ordering assertion between ivf_pq and pq_fitted:
    pruning a top-k search can RAISE recall@k by evicting
    ADC-closer false positives from unprobed lists — that measured
    interaction is exactly why the cell needed scoring.)"""
    rows = _q("e_compression_recall_matrix")(spark, SF).collect()
    by_method = {}
    for r in rows:
        by_method.setdefault(r["method"], {})[r["query_id"]] = r["n_hits"]
    assert set(by_method) == {"sq8", "pq_fitted", "binary", "ivf_pq"}
    assert set(by_method["ivf_pq"]) == set(by_method["pq_fitted"])
    for hits_by_q in by_method.values():
        assert len(hits_by_q) == 5
        assert all(0 <= h <= 10 for h in hits_by_q.values())
