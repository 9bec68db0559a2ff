"""Tests for the round-4 second-wave operators (now plans/graphs.py et al., ex round4b_ext):
brute-force numpy references for the statistics (a third engine,
independent of both Spark and the DuckDB oracle), invariant checks for
the graph/TS/vector ops, and plan-shape pins."""

from __future__ import annotations

import math

import numpy as np
import pytest

from etl_data_peri_institute_spark.plans import catalog

catalog.load_all()

SF = "/root/testdata/sf0.001"
SF_MID = "/root/testdata/sf0.01"


def _run(spark, name, sf=SF):
    return catalog.QUERIES[name].fn(spark, sf)


# ---------------------------------------------------------------------------
# Statistics vs numpy brute force (independent third engine).
# ---------------------------------------------------------------------------


def _events_numpy(sf):
    import duckdb

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT event_type, user_id, CAST(round(value*100) AS BIGINT)"
        f" FROM read_parquet('{sf}/events.parquet')"
    ).fetchall()
    con.close()
    return rows


def test_welch_ttest_matches_numpy(spark):
    rows = _events_numpy(SF)
    a = np.array([c for t, _, c in rows if t == "click"], dtype=np.float64)
    b = np.array([c for t, _, c in rows if t == "purchase"], dtype=np.float64)
    va, vb = a.var(ddof=1), b.var(ddof=1)
    se2 = va / len(a) + vb / len(b)
    t_ref = (a.mean() - b.mean()) / math.sqrt(se2)
    df_ref = se2 * se2 / (
        (va / len(a)) ** 2 / (len(a) - 1) + (vb / len(b)) ** 2 / (len(b) - 1)
    )
    row = _run(spark, "a_welch_ttest").collect()[0]
    assert row.n_a == len(a) and row.n_b == len(b)
    assert abs(row.t_stat - t_ref) < 2e-3
    assert abs(row.welch_df - df_ref) < 0.2


def test_mannwhitney_matches_numpy(spark):
    rows = _events_numpy(SF)
    vals = [(c, 1 if t == "click" else 0) for t, _, c in rows if t in ("click", "purchase")]
    arr = np.array([v for v, _ in vals], dtype=np.float64)
    grp = np.array([g for _, g in vals])
    # tie-averaged ranks, brute force
    order = arr.argsort(kind="stable")
    ranks = np.empty(len(arr), dtype=np.float64)
    sorted_vals = arr[order]
    i = 0
    while i < len(sorted_vals):
        j = i
        while j < len(sorted_vals) and sorted_vals[j] == sorted_vals[i]:
            j += 1
        ranks[order[i:j]] = (i + 1 + j) / 2.0
        i = j
    n1 = int(grp.sum())
    u_ref = ranks[grp == 1].sum() - n1 * (n1 + 1) / 2.0
    row = _run(spark, "a_mannwhitney_u").collect()[0]
    assert row.n1 == n1
    assert abs(row.u_stat - u_ref) < 0.51


def test_chi2_matches_numpy(spark):
    rows = _events_numpy(SF)
    types = sorted({t for t, _, _ in rows})
    obs = np.zeros((len(types), 4))
    for t, u, _ in rows:
        obs[types.index(t), u % 4] += 1
    row_t = obs.sum(axis=1, keepdims=True)
    col_t = obs.sum(axis=0, keepdims=True)
    exp = row_t @ col_t / obs.sum()
    chi2_ref = ((obs - exp) ** 2 / exp).sum()
    row = _run(spark, "a_chi2_independence").collect()[0]
    assert row.n == int(obs.sum())
    assert row.dof == (len(types) - 1) * 3
    assert abs(row.chi2 - chi2_ref) < 2e-3


def test_ols_trend_matches_numpy(spark):
    import duckdb

    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT event_type,
               CAST(floor((epoch(ts) - epoch(TIMESTAMP '2024-01-01'))/60) AS BIGINT),
               CAST(round(value*100) AS BIGINT)
            FROM read_parquet('{SF}/events.parquet')"""
    ).fetchall()
    con.close()
    out = {r.event_type: r for r in _run(spark, "a_ols_trend").collect()}
    for t in sorted({r[0] for r in rows}):
        x = np.array([r[1] for r in rows if r[0] == t], dtype=np.float64)
        y = np.array([r[2] for r in rows if r[0] == t], dtype=np.float64)
        slope_ref, intercept_ref = np.polyfit(x, y, 1)
        r_ref = np.corrcoef(x, y)[0, 1] ** 2
        assert abs(out[t].slope_cents_per_min - slope_ref) < 1e-4
        assert abs(out[t].intercept - intercept_ref / 100) < 0.05
        assert abs(out[t].r2 - r_ref) < 1e-3


def test_nearest_centroid_matches_numpy(spark):
    import duckdb

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT vec_id, label, embedding FROM read_parquet('{SF}/embeddings.parquet')"
    ).fetchall()
    con.close()
    labels = np.array([r[1] for r in rows])
    X = np.array([r[2] for r in rows], dtype=np.float64)
    cents = np.stack(
        [np.round(X[labels == l].mean(axis=0), 6) for l in sorted(set(labels))]
    )
    lab_ids = sorted(set(labels))
    d2 = np.round(((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2), 6)
    pred = np.array([lab_ids[i] for i in d2.argmin(axis=1)])
    ref_acc = {
        l: float((pred[labels == l] == l).mean()) for l in lab_ids
    }
    out = {r.label: r for r in _run(spark, "e_nearest_centroid_eval").collect()}
    assert set(out) == set(lab_ids)
    for l in lab_ids:
        assert abs(out[l].accuracy - ref_acc[l]) < 1e-3, l


# ---------------------------------------------------------------------------
# Invariants.
# ---------------------------------------------------------------------------


def test_cusum_changepoint_one_row_per_type(spark):
    rows = _run(spark, "ts_cusum_changepoint").collect()
    assert len(rows) == len({r.event_type for r in rows}) == 5
    # CUSUM over mean-rounded deviations telescopes to n*(mean - round(mean));
    # the peak is at least as large as any prefix, in particular nonzero
    # unless the series is constant.
    for r in rows:
        assert r.n > 0


def test_pareto_abc_partition_and_shares(spark):
    rows = {r.abc_class: r for r in _run(spark, "a_pareto_abc").collect()}
    assert set(rows) == {"A", "B", "C"}
    total_share = sum(r.revenue_share for r in rows.values())
    assert abs(total_share - 1.0) < 1e-3
    # A holds at most 80% + one part's worth; C revenue below B below A
    assert rows["A"].revenue_share <= 0.81
    assert rows["A"].revenue_cents > rows["B"].revenue_cents > rows["C"].revenue_cents


def test_association_rules_bounds(spark):
    for r in _run(spark, "g_association_rules").collect():
        assert 0 < r.support <= 1
        assert 0 < r.confidence <= 1
        assert r.lift > 0
        assert r.n_both >= 3


def test_supplier_similarity_jaccard_bounds(spark):
    for r in _run(spark, "g_supplier_similarity").collect():
        assert 0 < r.jaccard <= 1
        assert r.n_common >= 1
        assert r.supp_a < r.supp_b


def test_degree_distribution_mass_conserved(spark):
    rows = _run(spark, "g_degree_distribution").collect()
    # sum(degree * n_nodes) over each side equals the edge count of the
    # bipartite graph, so the two sides must agree.
    mass = {"customer": 0, "supplier": 0}
    for r in rows:
        mass[r.side] += r.degree * r.n_nodes
    assert mass["customer"] == mass["supplier"] > 0


def test_l_diversity_bounds(spark):
    for r in _run(spark, "p_l_diversity").collect():
        assert 1 <= r.distinct_l <= 12
        assert r.distinct_l <= r.group_size
        # entropy of a group never exceeds ln(distinct_l) (+ round-to-3 slack)
        assert r.entropy_l <= math.log(r.distinct_l) + 5e-4
        assert (r.below_l == 1) == (r.distinct_l < 4)


def test_cdc_apply_tombstones_removed(spark):
    import duckdb

    con = duckdb.connect()
    # keys whose LATEST change is a delete must be absent
    deleted = {
        r[0]
        for r in con.execute(
            f"""WITH l AS (SELECT o_custkey k, o_orderstatus s,
                 row_number() OVER (PARTITION BY o_custkey
                   ORDER BY o_orderdate DESC, o_orderkey DESC) rn
               FROM read_parquet('{SF}/orders.parquet'))
               SELECT k FROM l WHERE rn = 1 AND s = 'F'"""
        ).fetchall()
    }
    con.close()
    out_keys = {r.key for r in _run(spark, "p_cdc_apply").collect()}
    assert deleted and not (out_keys & deleted)


def test_time_to_convert_nonnegative_buckets(spark):
    rows = _run(spark, "b_time_to_convert").collect()
    assert rows and all(r.hours_bucket >= 0 and r.n_users > 0 for r in rows)


def test_ab_lift_arms_cover_all_users(spark):
    import duckdb

    con = duckdb.connect()
    n_users = con.execute(
        f"SELECT count(DISTINCT user_id) FROM read_parquet('{SF}/events.parquet')"
    ).fetchone()[0]
    con.close()
    row = _run(spark, "b_ab_lift_report").collect()[0]
    assert row.n0 + row.n1 == n_users
    assert row.c0 <= row.n0 and row.c1 <= row.n1


def test_rolling_corr_in_unit_interval(spark):
    for r in _run(spark, "ts_rolling_corr").collect():
        if r.corr_click_purchase is not None:
            assert -1.0 <= r.corr_click_purchase <= 1.0


def test_seasonal_baseline_anomalies_bounded(spark):
    for r in _run(spark, "ts_seasonal_baseline").collect():
        # Chebyshev: at most 1/4 of any distribution sits beyond 2 sigma
        # (integer rounding of sigma loosens this a touch; allow 30%)
        assert r.n_anomalies <= max(1, int(0.30 * r.n))


def test_pmi_symmetric_marginals(spark):
    rows = _run(spark, "t_cooccurrence_pmi").collect()
    assert rows
    for r in rows:
        assert r.n_xy >= 5


def test_top_keywords_ranked_and_bounded(spark):
    rows = _run(spark, "t_top_keywords_per_doc").collect()
    per_doc: dict[int, list] = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, rs in per_doc.items():
        assert len(rs) <= 3
        ranks = [r.rk for r in sorted(rs, key=lambda r: r.rk)]
        assert ranks == list(range(1, len(rs) + 1))
        scores = [r.tfidf for r in sorted(rs, key=lambda r: r.rk)]
        assert scores == sorted(scores, reverse=True)


def test_centroid_report_dispersion_ordering(spark):
    for r in _run(spark, "e_centroid_report").collect():
        assert 0 <= r.avg_dist <= r.max_dist
        assert r.n_vecs > 0 and r.centroid_norm >= 0


# ---------------------------------------------------------------------------
# Plan shape.
# ---------------------------------------------------------------------------


def test_no_cartesian_in_round4c_joins(spark):
    # the only intentional cross joins are 1-row aggregate attachments
    for name in (
        "g_supplier_similarity",
        "g_bipartite_projection",
        "g_association_rules",
        "b_time_to_convert",
    ):
        plan = _run(spark, name)._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, name


def test_seasonal_baseline_broadcasts_stats_side(spark):
    plan = (
        _run(spark, "ts_seasonal_baseline", SF_MID)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


# ---------------------------------------------------------------------------
# Wave 3/4: diagnostics, sampling, reconciliation, MMR.
# ---------------------------------------------------------------------------


def test_skew_report_ordering_and_shares(spark):
    rows = _run(spark, "a_skew_report").collect()
    assert [r.rk for r in rows] == list(range(1, len(rows) + 1))
    ns = [r.n for r in rows]
    assert ns == sorted(ns, reverse=True)
    assert sum(r.row_share for r in rows) <= 1.0
    assert all(r.x_avg >= 1.0 for r in rows[:1])  # hottest key >= average


def test_partial_agg_merge_equals_direct(spark):
    # the algebraic identity: merge(partials(x)) == agg(x)
    import duckdb

    con = duckdb.connect()
    direct = con.execute(
        f"""SELECT l_returnflag, count(*),
              sum(CAST(round(l_extendedprice*100) AS BIGINT))
            FROM read_parquet('{SF}/lineitem.parquet')
            GROUP BY 1 ORDER BY 1"""
    ).fetchall()
    con.close()
    out = {r.l_returnflag: r for r in _run(spark, "a_partial_agg_merge").collect()}
    for flag, n, s_ in direct:
        assert out[flag].n_rows == n
        assert out[flag].sum_cents == s_


def test_frequency_capping_bounds(spark):
    for r in _run(spark, "b_frequency_capping").collect():
        assert r.n_capped_users <= r.n_users
        # each capped user contributes at least one capped event
        assert r.n_capped_events >= r.n_capped_users


def test_new_vs_returning_day_one_all_new(spark):
    rows = sorted(_run(spark, "b_new_vs_returning").collect(), key=lambda r: r.day)
    assert rows[0].n_returning == 0 and rows[0].new_share == 1.0
    # every user is new exactly once: total new == distinct users
    import duckdb

    con = duckdb.connect()
    n_users = con.execute(
        f"SELECT count(DISTINCT user_id) FROM read_parquet('{SF}/events.parquet')"
    ).fetchone()[0]
    con.close()
    assert sum(r.n_new for r in rows) == n_users


def test_table_checksum_detects_mutation(spark):
    from etl_data_peri_institute_spark.plans import catalog as cat
    from pyspark.sql import functions as F

    base = {r.o_orderstatus: r.checksum for r in _run(spark, "p_table_checksum").collect()}
    # rerun over a mutated copy: one row's price changed by one cent
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    mutated = orders.withColumn(
        "o_totalprice",
        F.when(F.col("o_orderkey") == orders.select("o_orderkey").first()[0],
               F.col("o_totalprice") + 0.01).otherwise(F.col("o_totalprice")),
    )
    mutated.createOrReplaceTempView("_mut_orders")
    payload = F.concat_ws(
        "|",
        F.col("o_orderkey").cast("string"),
        F.col("o_custkey").cast("string"),
        F.round(F.col("o_totalprice") * 100).cast("long").cast("string"),
        F.col("o_orderpriority"),
    )
    rh = F.conv(F.substring(F.md5(payload), 1, 10), 16, 10).cast("long")
    mut = {
        r.o_orderstatus: r.checksum
        for r in mutated.select("o_orderstatus", rh.alias("rh"))
        .groupBy("o_orderstatus")
        .agg(F.sum("rh").alias("checksum"))
        .collect()
    }
    assert base != mut  # exactly one group's checksum moves
    assert sum(1 for k in base if base[k] != mut.get(k)) == 1


def test_reservoir_exact_k_per_group(spark):
    rows = _run(spark, "b_reservoir_per_group", SF_MID).collect()
    per_group: dict[str, int] = {}
    for r in rows:
        per_group[r.event_type] = per_group.get(r.event_type, 0) + 1
    assert set(per_group.values()) == {50}
    # determinism: second run picks the identical sample
    again = _run(spark, "b_reservoir_per_group", SF_MID).collect()
    assert sorted((r.event_type, r.event_id) for r in rows) == sorted(
        (r.event_type, r.event_id) for r in again
    )


def test_gini_in_unit_interval_and_scale_free(spark):
    row = _run(spark, "a_gini_concentration").collect()[0]
    assert 0.0 <= row.gini < 1.0
    assert row.n_customers > 0 and row.total_cents > 0


def test_mmr_first_is_most_relevant_and_diverse_after(spark):
    rows = sorted(_run(spark, "e_mmr_rerank").collect(), key=lambda r: r.rank)
    assert len(rows) == 5
    assert len({r.vec_id for r in rows}) == 5
    # rank 1 is the pure-relevance argmax: no later pick can beat it
    assert all(rows[0].relevance >= r.relevance for r in rows[1:])
    # mmr score of rank 1 equals its relevance by definition
    assert rows[0].mmr_score == rows[0].relevance


def test_volume_anomaly_flags_exceed_threshold(spark):
    for r in _run(spark, "p_volume_anomaly").collect():
        assert abs(r.deviation) > 0.3 - 1e-9
        assert r.median7 > 0


def test_pq_adc_ranks_and_self_exclusion(spark):
    rows = _run(spark, "e_pq_adc_topk").collect()
    per_q: dict[int, list] = {}
    for r in rows:
        per_q.setdefault(r.query_id, []).append(r)
    assert set(per_q) == {0, 1, 2}
    for q, rs in per_q.items():
        rs = sorted(rs, key=lambda r: r.rank)
        assert [r.rank for r in rs] == [1, 2, 3, 4, 5]
        # ADC distances are nondecreasing with rank
        d = [r.approx_d2 for r in rs]
        assert d == sorted(d)
        # queries are excluded from the database side
        assert all(r.neighbor_id >= 3 for r in rs)


def test_pq_adc_reasonable_vs_exact_knn(spark):
    # PQ is lossy, but with 10 codes per subspace the top-1 ADC neighbor
    # should land in the exact top-20% of the corpus by true distance
    # for at least 2 of 3 queries — a loose recall floor that catches
    # broken encode/LUT plumbing without flaking on quantization noise.
    import duckdb

    rows = _run(spark, "e_pq_adc_topk").collect()
    top1 = {r.query_id: r.neighbor_id for r in rows if r.rank == 1}
    con = duckdb.connect()
    ok = 0
    for q, nb in top1.items():
        better = con.execute(
            f"""WITH pos AS (
                  SELECT vec_id, i AS pos, CAST(embedding[i] AS DOUBLE) AS val
                  FROM read_parquet('{SF}/embeddings.parquet'),
                       UNNEST(range(1, len(embedding) + 1)) AS t(i)
                ),
                qv AS (SELECT pos, val FROM pos WHERE vec_id = {q}),
                d AS (
                  SELECT p.vec_id, sum((p.val - qv.val) * (p.val - qv.val)) AS d2
                  FROM pos p JOIN qv ON qv.pos = p.pos
                  WHERE p.vec_id >= 3 GROUP BY p.vec_id
                )
                SELECT count(*) FROM d
                WHERE d2 < (SELECT d2 FROM d WHERE vec_id = {nb})"""
        ).fetchone()[0]
        n_db = con.execute(
            f"SELECT count(*) - 3 FROM read_parquet('{SF}/embeddings.parquet')"
        ).fetchone()[0]
        if better <= 0.2 * n_db:
            ok += 1
    con.close()
    assert ok >= 2


def test_rolling_active_users_invariants(spark):
    rows = _run(spark, "b_rolling_active_users").collect()
    assert len(rows) == 30
    for r in rows:
        assert 1 <= r.dau <= r.wau7
        assert 0 < r.stickiness <= 1.0
    # WAU is at least the max DAU inside any trailing week
    by_day = sorted(rows, key=lambda r: r.day)
    for i in range(7, len(by_day)):
        week_dau_max = max(r.dau for r in by_day[i - 6 : i + 1])
        assert by_day[i].wau7 >= week_dau_max


def test_skewness_kurtosis_matches_scipy_formulas(spark):
    import duckdb

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT event_type, CAST(round(value) AS BIGINT)"
        f" FROM read_parquet('{SF}/events.parquet')"
    ).fetchall()
    con.close()
    out = {r.event_type: r for r in _run(spark, "a_skewness_kurtosis").collect()}
    for t in sorted({r[0] for r in rows}):
        x = np.array([r[1] for r in rows if r[0] == t], dtype=np.float64)
        m2 = ((x - x.mean()) ** 2).mean()
        m3 = ((x - x.mean()) ** 3).mean()
        m4 = ((x - x.mean()) ** 4).mean()
        assert abs(out[t].skewness - m3 / m2**1.5) < 1e-3
        assert abs(out[t].excess_kurtosis - (m4 / m2**2 - 3)) < 1e-3
        # JB is nonnegative by construction
        assert out[t].jarque_bera >= 0


def test_interval_union_matches_bruteforce(spark):
    import duckdb

    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT)
            FROM read_parquet('{SF}/events.parquet')
            WHERE event_type IN ('click', 'view')"""
    ).fetchall()
    con.close()
    ref: dict[int, list] = {}
    for u, s_ in rows:
        ref.setdefault(u, []).append((s_, s_ + 900))
    expected = {}
    for u, ivs in ref.items():
        ivs.sort()
        spans = []
        for s_, e_ in ivs:
            if spans and s_ <= spans[-1][1]:
                spans[-1][1] = max(spans[-1][1], e_)
                spans[-1][2] += 1
            else:
                spans.append([s_, e_, 1])
        expected[u] = (
            len(spans),
            sum(e_ - s_ for s_, e_, _ in spans),
            max(c for _, _, c in spans),
        )
    out = {r.user_id: r for r in _run(spark, "j_interval_union").collect()}
    assert set(out) == set(expected)
    for u, (n, tot, busiest) in expected.items():
        assert out[u].n_spans == n, u
        assert out[u].total_span_s == tot, u
        assert out[u].busiest_span_events == busiest, u


def test_token_budget_selection_near_half_tokens(spark):
    rows = _run(spark, "b_token_budget_selection", SF_MID).collect()
    total_kept = sum(r.tokens_kept for r in rows)
    assert all(0.0 <= r.keep_rate <= 1.0 for r in rows)
    assert all(r.n_kept <= r.n_docs for r in rows)
    # kept tokens land just under half the corpus (cutoff is <= 50%)
    import duckdb

    con = duckdb.connect()
    total = con.execute(
        f"SELECT sum(len(string_split(text,' '))) FROM read_parquet('{SF_MID}/documents.parquet')"
    ).fetchone()[0]
    con.close()
    assert total_kept <= 0.5 * total
    assert total_kept >= 0.45 * total


def test_interval_union_single_exchange(spark):
    import re

    df = _run(spark, "j_interval_union")
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the whole pipeline (flag window + island window + two groupBys)
    # rides ONE user-keyed shuffle
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1


def test_asof_tolerance_nulls_stale_matches(spark):
    # every carried click is within tolerance and at-or-before the error
    rows = _run(spark, "j_asof_tolerance").collect()
    assert rows
    n_matched = 0
    for r in rows:
        if r.click_ts_asof is not None:
            n_matched += 1
            delta = (r.ts - r.click_ts_asof).total_seconds()
            assert 0 <= delta <= 600
    # the tolerance actually bites: some errors have no fresh click
    assert 0 < n_matched < len(rows)


def test_zipf_fit_flags_synthetic_corpus(spark):
    # the synthetic testdata vocabulary is near-uniform, so the screen
    # must report a LOW exponent and poor fit — exactly the signature
    # that distinguishes generated filler from natural text
    row = _run(spark, "t_zipf_fit", SF_MID).collect()[0]
    assert row.n_words > 10
    assert 0.0 < row.zipf_exponent < 0.8
    assert 0.0 <= row.r2 <= 0.5


def test_pq_recall_bounds_and_coverage(spark):
    rows = _run(spark, "e_pq_recall_report").collect()
    assert {r.query_id for r in rows} == {0, 1, 2}
    for r in rows:
        assert 0 <= r.n_hits <= 5
        assert abs(r.recall_at_5 - r.n_hits / 5) < 1e-9


def test_abandonment_rate_consistent_with_time_to_convert(spark):
    rows = _run(spark, "b_abandonment_rate").collect()
    assert len(rows) == 30
    for r in rows:
        assert 0 <= r.n_abandoned <= r.n_clicks
        assert 0.0 <= r.abandonment_rate <= 1.0


def test_bitmap_active_days_mass_matches_distinct(spark):
    import duckdb

    rows = _run(spark, "a_bitmap_active_days").collect()
    con = duckdb.connect()
    n_users, n_user_days = con.execute(
        f"""SELECT count(DISTINCT user_id),
               count(DISTINCT (user_id, date_trunc('day', ts)))
            FROM read_parquet('{SF}/events.parquet')"""
    ).fetchone()
    con.close()
    assert sum(r.n_users for r in rows) == n_users
    # popcount histogram mass = total distinct (user, day) pairs
    assert sum(r.n_active_days * r.n_users for r in rows) == n_user_days
    assert all(1 <= r.n_active_days <= 30 for r in rows)


def test_burstiness_vmr_nonnegative_and_bounded_docs(spark):
    rows = _run(spark, "t_burstiness_report").collect()
    assert rows
    for r in rows:
        assert r.vmr >= 0
        assert 1 <= r.n_docs_with
        assert r.total >= 10


def test_seasonality_strength_is_anova_r2(spark):
    rows = _run(spark, "a_seasonality_strength").collect()
    assert len(rows) == 5
    for r in rows:
        assert 0.0 <= r.seasonal_strength <= 1.0


def test_mutual_information_vs_numpy(spark):
    rows = _events_numpy(SF)
    types = sorted({t for t, _, _ in rows})
    obs = np.zeros((len(types), 4))
    for t, u, _ in rows:
        obs[types.index(t), u % 4] += 1
    p = obs / obs.sum()
    px = p.sum(axis=1, keepdims=True)
    py = p.sum(axis=0, keepdims=True)
    with np.errstate(divide="ignore", invalid="ignore"):
        mi_ref = np.nansum(p * np.log(p / (px @ py)))
        hxy_ref = -np.nansum(p * np.log(p))
    row = _run(spark, "a_mutual_information").collect()[0]
    assert abs(row.mutual_information - mi_ref) < 1e-5
    assert abs(row.nmi_joint - mi_ref / hxy_ref) < 1e-5
    assert 0 <= row.nmi_joint <= 1


def test_abandonment_rate_equal_ts_purchase_covers_click(spark, tmp_path):
    # Tie fixture (round-5 advice): a purchase at EXACTLY the click's
    # timestamp must cover it (oracle semantics p.ts >= c.ts), which
    # requires the click to sort first (__side=0) at equal ts so the
    # purchase sits inside the forward frame.
    import datetime as dt

    import pandas as pd

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        # user 1: click + purchase at the SAME instant -> covered
        (1, 101, t0, "click"),
        (2, 101, t0, "purchase"),
        # user 2: click, no purchase -> abandoned
        (3, 102, t0, "click"),
        # user 3: purchase 2h later (outside the 1h window) -> abandoned
        (4, 103, t0, "click"),
        (5, 103, t0 + dt.timedelta(hours=2), "purchase"),
    ]
    pdf = pd.DataFrame(rows, columns=["event_id", "user_id", "ts", "event_type"])
    pdf.to_parquet(str(tmp_path / "events.parquet"))
    out = _run(spark, "b_abandonment_rate", str(tmp_path)).collect()
    assert len(out) == 1
    assert out[0].n_clicks == 3
    assert out[0].n_abandoned == 2
    assert abs(out[0].abandonment_rate - round(2 / 3, 4)) < 1e-9


# ---------------------------------------------------------------------------
# Hot-customer degree cap (round-5, verdict item 3).
# ---------------------------------------------------------------------------


def test_supplier_similarity_cap_bounds_pairs_and_keeps_top20(spark):
    from pyspark.sql import functions as F

    from etl_data_peri_institute_spark.plans.graphs import (
        _customer_supplier_edges,
        supplier_similarity_pairs,
    )

    cs = _customer_supplier_edges(spark, SF)
    uncapped = supplier_similarity_pairs(cs, max_customer_degree=None)
    # an aggressive absolute cap must strictly bound the candidate-pair
    # volume (per-customer degree^2 is the quadratic term)
    capped_hard = supplier_similarity_pairs(cs, max_customer_degree=3)
    n_unc = uncapped.agg(F.sum("n_common")).collect()[0][0]
    n_cap = capped_hard.agg(F.sum("n_common")).collect()[0][0]
    assert n_cap < n_unc
    # max degree on the capped edge set respects the cap
    max_cd = (
        cs.join(
            cs.groupBy("c").agg(F.count("*").alias("cd")).filter(F.col("cd") > 3),
            "c",
            "left_anti",
        )
        .groupBy("c")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    assert max_cd <= 3
    # the default float cap (fraction of supplier universe, floor 64)
    # leaves the gate-data top-20 IDENTICAL: degrees here never exceed
    # the floor, so the production default is a no-op on this graph
    capped_default = supplier_similarity_pairs(cs)  # default 0.5 / floor 64
    key = lambda df: [  # noqa: E731
        (r.supp_a, r.supp_b, r.n_common, r.jaccard, r.adamic_adar)
        for r in df.orderBy(F.desc("adamic_adar"), "supp_a", "supp_b")
        .limit(20)
        .collect()
    ]
    assert key(capped_default) == key(uncapped)


def test_supplier_similarity_pair_stage_widens_with_input(spark):
    """Round-6 spill fix pin: the customer-side pair build must run at
    ~25k edge rows per task (the 10x probe spilled 11.3 GB when the
    self-join ran off the session's 32-task exchange). On a 1M-edge
    synthetic frame the plan's c-exchange must therefore carry more
    partitions than the session default; on a small frame it must stay
    at the session floor (no extra tasks for small graphs)."""
    import re

    from pyspark.sql import functions as F

    from etl_data_peri_institute_spark.plans.graphs import (
        supplier_similarity_pairs,
    )

    shuffle_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))

    def c_exchange_parts(n_rows):
        cs = spark.range(n_rows).select(
            (F.col("id") % (n_rows // 10)).alias("c"),
            (F.col("id") % 97).alias("s"),
        )
        plan = (
            supplier_similarity_pairs(cs, max_customer_degree=None)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        parts = [
            int(m)
            for m in re.findall(r"hashpartitioning\(c#\d+L?(?:, [^)]*?)?, (\d+)\)", plan)
        ]
        assert parts, plan
        return max(parts)

    assert c_exchange_parts(1_000_000) == 1_000_000 // 25_000
    assert c_exchange_parts(10_000) == shuffle_parts
