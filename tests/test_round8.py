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


def test_ivf_balanced_recall_cost_accuracy_contract(spark):
    """The recall/cost twin's contract:
    - 2 variants x 5 queries, recall consistent with n_hits;
    - candidate sets are probed-list-bounded on both variants
      (n_cand < corpus size);
    - a balanced probe is bounded by nprobe*cap KEPT members plus
      whatever spill the probed lists RECEIVED — one-round spill does
      not re-cap receivers, so the hard bound is nprobe*cap +
      total_spilled (the kept-portion cap is the per-list guarantee
      the census pins via n_kept <= cap);
    - the dial actually moves on this corpus: the two variants'
      candidate counts differ for at least one query."""
    import math

    rows = _q("e_ivf_balanced_recall")(spark, SF).collect()
    n_c, k = duckdb.sql(
        f"SELECT (SELECT count(*) FROM '{SF}/embeddings.parquet'"
        "         WHERE vec_id >= 5),"
        f"       (SELECT count(DISTINCT label) FROM '{SF}/embeddings.parquet')"
    ).fetchone()
    cap = math.ceil(n_c / k)
    # total spilled on the full-table census is an upper bound for the
    # corpus-only one up to the 5 query vectors' own contributions
    census = _q("e_ivf_balanced_assign")(spark, SF).collect()
    total_spill = sum(r["n_spill_out"] for r in census) + 5
    by_v = {}
    for r in rows:
        by_v.setdefault(r["variant"], {})[r["query_id"]] = r
        assert abs(r["recall_at_10"] - round(r["n_hits"] / 10, 2)) < 1e-9
        assert 0 <= r["n_hits"] <= 10
        assert r["n_cand"] < n_c
    assert set(by_v) == {"balanced", "primary"}
    assert all(set(q) == set(range(5)) for q in by_v.values())
    for qid, r in by_v["balanced"].items():
        assert r["n_cand"] <= 2 * cap + total_spill, r
    assert any(
        by_v["balanced"][q]["n_cand"] != by_v["primary"][q]["n_cand"]
        for q in range(5)
    )


def test_planned_salted_join_is_invisible(spark):
    """planned_salted_join's contract: identical result to the plain
    join for every probe-preserving mode, on a frame with a genuinely
    hot key (k=1 dominates) plus unmatched rows on BOTH sides so
    left/semi/anti actually diverge from inner."""
    from etl_data_peri_institute_spark.operators.skew import planned_salted_join

    probe = spark.createDataFrame(
        [(1, i) for i in range(40)] + [(2, 100), (3, 101), (9, 102)],
        "k int, pv int",
    )
    build = spark.createDataFrame(
        [(1, "hot"), (2, "a"), (3, "b"), (8, "unmatched")], "k string, bv string"
    ).selectExpr("cast(k as int) k", "bv")
    for how in ("inner", "left", "left_semi", "left_anti"):
        got = sorted(
            tuple(r) for r in planned_salted_join(
                probe, build, key="k", rows_per_reducer=8, how=how
            ).collect()
        )
        want = sorted(tuple(r) for r in probe.join(build, "k", how).collect())
        assert got == want, how


def test_planned_salted_join_rejects_bad_args(spark):
    from etl_data_peri_institute_spark.operators.skew import planned_salted_join
    import pytest

    df = spark.range(3).selectExpr("id as k", "id as v")
    with pytest.raises(ValueError, match="supported modes"):
        planned_salted_join(df, df, key="k", rows_per_reducer=2, how="right")
    with pytest.raises(ValueError, match="rows_per_reducer"):
        planned_salted_join(df, df, key="k", rows_per_reducer=0)


def test_planned_salted_join_accepts_precomputed_factors(spark):
    """The production path: factors come from the maintained planner
    census, not an inline scan — and stay invisible even when they are
    arbitrary (a stale census must never change results, only costs)."""
    from etl_data_peri_institute_spark.operators.skew import planned_salted_join

    probe = spark.createDataFrame(
        [(1, i) for i in range(10)] + [(2, 99)], "k int, pv int"
    )
    build = spark.createDataFrame([(1, "x"), (2, "y")], "k int, bv string")
    # a MESSY census: the cold key salted, a DUPLICATE row for it (a
    # double-written append), and a non-positive factor — the operator
    # sanitizes all three (dup keys would otherwise fan out both join
    # sides; factor 0 would build an empty salt range)
    stale = spark.createDataFrame(
        [(2, 5), (2, 3), (1, 0)], "k int, __nsalt int"
    )
    got = sorted(
        tuple(r)
        for r in planned_salted_join(
            probe, build, key="k", rows_per_reducer=3, factors=stale
        ).collect()
    )
    want = sorted(tuple(r) for r in probe.join(build, "k").collect())
    assert got == want


def test_incremental_lsh_agrees_with_self_join(spark):
    """Cross-operator consistency: the incremental probe's corpus
    partners must be EXACTLY the straddling pairs of the full-corpus
    self-join gate (same shingles, same md5 MinHash config, same
    bands) — the incremental path changes the COST shape, never the
    candidate set. Also pins per-doc partner counts, not just the
    drop/keep verdicts."""
    inc = {r["doc_id"]: r for r in _q("d_incremental_lsh_dedup")(spark, SF).collect()}
    pairs = _q("d_minhash_lsh_pairs")(spark, SF).collect()
    straddle: dict[int, set[int]] = {}
    for r in pairs:
        a, b = r["doc_a"], r["doc_b"]
        if a % 10 == 7 and b % 10 != 7:
            straddle.setdefault(a, set()).add(b)
        elif b % 10 == 7 and a % 10 != 7:
            straddle.setdefault(b, set()).add(a)
    for doc_id, r in inc.items():
        want = len(straddle.get(doc_id, set()))
        assert r["n_corpus_partners"] == want, (doc_id, r, want)
        assert r["verdict"] == ("drop" if want else "keep")
    # every straddling batch doc must appear in the incremental output
    assert set(straddle) <= set(inc)


def test_embedding_incremental_agrees_with_self_join(spark):
    """Embedding tier of the incremental-vs-self-join consistency pin:
    the batch-vs-corpus VERIFIED partners must be exactly the
    straddling pairs of d_embedding_neardup (same 4x4 bands, same
    τ=0.4, same hyperplanes) — the incremental path changes cost
    shape, never the verified set."""
    inc = {
        r["vec_id"]: r
        for r in _q("d_embedding_neardup_incremental_pin")(spark, SF).collect()
    }
    pairs = _q("d_embedding_neardup")(spark, SF).collect()
    straddle: dict[int, set[int]] = {}
    for r in pairs:
        a, b = r["id_a"], r["id_b"]
        if a % 10 == 7 and b % 10 != 7:
            straddle.setdefault(a, set()).add(b)
        elif b % 10 == 7 and a % 10 != 7:
            straddle.setdefault(b, set()).add(a)
    for vec_id, r in inc.items():
        want = len(straddle.get(vec_id, set()))
        assert r["n_corpus_partners"] == want, (vec_id, r, want)
        assert r["verdict"] == ("drop" if want else "keep")
    assert set(straddle) <= set(inc)


def test_embedding_incremental_prod_twin_contract(spark):
    """The selective-band PRIMARY gate (round 9 swapped the suffixes:
    the unsuffixed name now carries the production 4x16/τ=0.9 config,
    the coarse semantic pin moved to `_pin`): same batch row set as
    the pin twin, and at 4x16/τ=0.9 on the synthetic corpus (random,
    near-orthogonal vectors) the verified set must be EMPTY — the
    production steady state this config pins. If the testdata ever
    gains true near-dups this assertion should start failing, which
    is the signal to re-pin."""
    prod = _q("d_embedding_neardup_incremental")(spark, SF).collect()
    gate = _q("d_embedding_neardup_incremental_pin")(spark, SF).collect()
    assert {r["vec_id"] for r in prod} == {r["vec_id"] for r in gate}
    assert all(r["verdict"] == "keep" and r["n_corpus_partners"] == 0 for r in prod)


def test_recall_cost_frontier_invariants(spark):
    """Round-8 continuation: the cost axis must be MEASURED and
    consistent with the recall matrix.
    - full-scan tiers (sq8, pq_fitted, binary) scan exactly N - NQ
      candidates; ivf_pq scans strictly fewer (the point of pruning);
    - code bytes match the byte-aligned layouts (dim, dim/subdim,
      packed-words x 8);
    - scan_bytes is the product, row by row;
    - n_hits agrees row-for-row with e_compression_recall_matrix
      (both reports rank from the ONE shared construction,
      plans/ann._matrix_parts — this pins that they can
      never drift apart)."""
    rows = _q("e_recall_cost_frontier")(spark, SF).collect()
    n, dim = duckdb.sql(
        f"SELECT count(*), max(len(embedding)) FROM '{SF}/embeddings.parquet'"
    ).fetchone()
    corpus = n - 5
    assert len(rows) == 4 * 5
    bytes_expected = {
        "sq8": dim,
        "pq_fitted": dim // 16,
        "binary": ((dim + 63) // 64) * 8,
        "ivf_pq": dim // 16,
    }
    for r in rows:
        assert r["code_bytes"] == bytes_expected[r["method"]], r
        assert r["scan_bytes"] == r["n_candidates"] * r["code_bytes"], r
        assert r["recall_at_10"] == round(r["n_hits"] / 10.0, 2), r
        if r["method"] == "ivf_pq":
            assert 0 < r["n_candidates"] < corpus, r
        else:
            assert r["n_candidates"] == corpus, r
    mat = {
        (m["method"], m["query_id"]): m["n_hits"]
        for m in _q("e_compression_recall_matrix")(spark, SF).collect()
    }
    assert {(r["method"], r["query_id"]): r["n_hits"] for r in rows} == mat


def test_ivf_incremental_assign_invariants(spark):
    """Round-8 continuation: incremental-assignment conservation and
    arithmetic. Every vector (batch and corpus) lands in exactly one
    list; n_after = n_corpus + n_batch per list; growth_pct is the
    advertised ratio; sim_drift equals the mean difference (up to the
    independent 1e-4 roundings of the three columns)."""
    rows = _q("e_ivf_incremental_assign")(spark, SF).collect()
    n, nb = duckdb.sql(
        f"SELECT count(*), count(*) FILTER (vec_id % 10 = 7)"
        f" FROM '{SF}/embeddings.parquet'"
    ).fetchone()
    assert sum(r["n_batch"] for r in rows) == nb
    assert sum(r["n_corpus"] for r in rows) == n - nb
    for r in rows:
        assert r["n_after"] == r["n_corpus"] + r["n_batch"], r
        if r["n_corpus"]:
            assert abs(
                r["growth_pct"] - round(r["n_batch"] * 100.0 / r["n_corpus"], 2)
            ) < 1e-9, r
        if r["corpus_mean_sim"] is not None and r["batch_mean_sim"] is not None:
            assert abs(
                r["sim_drift"]
                - (r["corpus_mean_sim"] - r["batch_mean_sim"])
            ) <= 2e-4, r


def test_ivf_staleness_recall_invariants(spark):
    """Round-8 continuation: the staleness dial's shape. Two variants
    (stale quantizer = fitted excluding the batch, fresh = refit on
    everything) x the 5-query sample; per row the candidate set bounds
    the hits, the batch share bounds the candidates, and recall is the
    advertised ratio. On this stationary corpus the fresh rows must
    not be systematically worse than stale (same distribution, the
    refit only nudges centroids) — assert total-hit parity within the
    candidate-set noise rather than exact equality."""
    rows = _q("e_ivf_staleness_recall")(spark, SF).collect()
    by_variant = {}
    for r in rows:
        assert 0 <= r["n_hits"] <= 10, r
        assert r["n_hits"] <= r["n_cand"], r
        assert 0 <= r["n_batch_cand"] <= r["n_cand"], r
        assert r["recall_at_10"] == round(r["n_hits"] / 10.0, 2), r
        by_variant.setdefault(r["variant"], []).append(r)
    assert set(by_variant) == {"stale", "fresh"}
    assert len(by_variant["stale"]) == len(by_variant["fresh"])
    # every query id appears in both variants
    assert {r["query_id"] for r in by_variant["stale"]} == {
        r["query_id"] for r in by_variant["fresh"]
    }
