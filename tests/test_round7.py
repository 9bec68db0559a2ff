"""Round-7 batch tests: python replicas at sf0.001 (the DuckDB oracle
cross-check runs in tools/oracle_check.py / the driver gate; these pin
the semantics against an independent in-process reimplementation)."""

from __future__ import annotations

import hashlib
import re
from collections import Counter, defaultdict

import duckdb

from etl_data_peri_institute_spark.plans import catalog

SF = "/root/testdata/sf0.001"


def _q(name):
    catalog.load_all()
    return catalog.QUERIES[name].fn


def _docs():
    return duckdb.sql(
        f"SELECT doc_id, text, source FROM '{SF}/documents.parquet'"
    ).fetchall()


def test_pii_scrub_report_matches_python_replica(spark):
    block = {"customer", "spark"}
    agg = defaultdict(lambda: [0, 0, 0])  # n_docs, block_hits, docs_with
    for _id, text, source in _docs():
        hits = sum(1 for w in text.split(" ") if w in block)
        a = agg[source]
        a[0] += 1
        a[1] += hits
        a[2] += 1 if hits else 0
    rows = {r["source"]: r for r in _q("t_pii_scrub_report")(spark, SF).collect()}
    assert set(rows) == set(agg)
    for source, (n, bh, dw) in agg.items():
        r = rows[source]
        assert (r["n_docs"], r["blocklist_hits"], r["docs_with_blockterm"]) == (n, bh, dw)
        # synthetic corpus has no digits or emails — the regex detectors
        # must report the true zero, not a false positive
        assert r["email_hits"] == r["ipv4_hits"] == r["longnum_hits"] == 0
        assert abs(r["blockterm_doc_rate"] - round(dw / n, 4)) < 1e-9


def test_pii_scrub_apply_matches_python_replica(spark):
    pat = re.compile(r"\b(customer|spark)\b")
    rows = {r["doc_id"]: r for r in _q("t_pii_scrub_apply")(spark, SF).collect()}
    for doc_id, text, _source in _docs():
        scrubbed = pat.sub("<TERM>", text)
        r = rows[doc_id]
        assert r["n_redactions"] == len(pat.findall(text))
        assert r["scrub_hash"] == hashlib.md5(scrubbed.encode()).hexdigest()
        assert r["scrub_len"] == len(scrubbed.encode())


def test_repetition_ratio_matches_python_replica(spark):
    per_source = defaultdict(list)
    for _id, text, source in _docs():
        toks = text.split(" ")
        bgs = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        if bgs:
            per_source[source].append(1.0 - len(set(bgs)) / len(bgs))
    rows = {r["source"]: r for r in _q("t_repetition_ratio")(spark, SF).collect()}
    assert set(rows) == set(per_source)
    for source, fracs in per_source.items():
        r = rows[source]
        assert r["n_docs"] == len(fracs)
        assert abs(r["avg_dup_frac"] - round(sum(fracs) / len(fracs), 4)) <= 1e-4
        assert abs(r["max_dup_frac"] - round(max(fracs), 4)) <= 1e-4
        assert r["n_docs_over_half"] == sum(f > 0.5 for f in fracs)


def test_kfold_assign_balanced_and_deterministic(spark):
    out1 = _q("b_kfold_assign")(spark, SF).collect()
    out2 = _q("b_kfold_assign")(spark, SF).collect()
    assert [tuple(r) for r in out1] == [tuple(r) for r in out2]  # no RNG
    folds = {r["fold"]: r for r in out1}
    assert set(folds) <= set(range(5))
    total = sum(r["n_docs"] for r in out1)
    docs = _docs()
    assert total == len(docs)
    # replica: fold from the md5 nibble
    want = Counter(
        (int(hashlib.md5(str(d).encode()).hexdigest()[0], 16)) % 5
        for d, _t, _s in docs
    )
    for fold, n in want.items():
        assert folds[fold]["n_docs"] == n
        assert abs(folds[fold]["doc_share"] - round(n / total, 4)) < 1e-9


def test_soft_dedup_weights_matches_python_replica(spark):
    texts = duckdb.sql(
        f"SELECT text, source FROM '{SF}/documents.parquet'"
    ).fetchall()
    sizes = Counter(t for t, _s in texts)
    agg = defaultdict(lambda: [0, 0.0, 0])
    for t, s in texts:
        agg[s][0] += 1
        agg[s][1] += 1.0 / sizes[t]
        agg[s][2] += 1 if sizes[t] > 1 else 0
    rows = {r["source"]: r for r in _q("d_soft_dedup_weights")(spark, SF).collect()}
    assert set(rows) == set(agg)
    total_eff = 0.0
    for s, (n, eff, dup) in agg.items():
        r = rows[s]
        assert r["n_docs"] == n
        assert abs(r["effective_docs"] - round(eff, 4)) <= 1e-4
        assert r["n_duplicated_docs"] == dup
        total_eff += eff
    # invariant: total effective size == number of DISTINCT texts
    assert abs(total_eff - len(sizes)) < 1e-6


def test_token_waterline_solves_budget_exactly(spark):
    rows = _q("b_token_waterline")(spark, SF).collect()
    budget = rows[0]["budget"]
    total_alloc = sum(r["allocated"] for r in rows)
    # water-filling exactness: allocations sum to the budget (within
    # rounding of the per-source 2-decimal rounding)
    assert abs(total_alloc - budget) <= 0.01 * len(rows)
    for r in rows:
        assert 0 < r["allocated"] <= r["tokens"] + 1e-9
        assert abs(r["kept_frac"] - round(r["allocated"] / r["tokens"], 4)) <= 1e-3
        # sources under the waterline are taken whole
        if r["tokens"] < r["waterline"]:
            assert r["allocated"] == r["tokens"]


def test_did_estimator_matches_python_replica(spark):
    import math

    evs = duckdb.sql(
        f"SELECT event_type, user_id, ts, value FROM '{SF}/events.parquet'"
    ).fetchall()
    cells = defaultdict(list)
    for et, uid, ts, v in evs:
        treat = int(hashlib.md5(str(uid).encode()).hexdigest()[0], 16) % 2
        post = 1 if ts.day > 15 else 0
        cells[(et, treat, post)].append(v)
    rows = {r["event_type"]: r for r in _q("b_did_estimator")(spark, SF).collect()}
    for et in rows:
        def m(t, p):
            vals = cells[(et, t, p)]
            return sum(vals) / len(vals)

        def var_over_n(t, p):
            vals = cells[(et, t, p)]
            mu = sum(vals) / len(vals)
            return (sum((x - mu) ** 2 for x in vals) / (len(vals) - 1)) / len(vals)

        did = (m(1, 1) - m(1, 0)) - (m(0, 1) - m(0, 0))
        se = math.sqrt(sum(var_over_n(t, p) for t in (0, 1) for p in (0, 1)))
        r = rows[et]
        assert abs(r["did"] - round(did, 6)) <= 1e-6
        assert abs(r["se"] - round(se, 6)) <= 1e-6
        assert abs(r["t_stat"] - round(did / se, 4)) <= 1e-3


def test_winsorized_stats_bounds(spark):
    rows = _q("a_winsorized_stats")(spark, SF).collect()
    assert rows
    for r in rows:
        # clamping can only shrink dispersion; means stay within the tails
        assert r["wins_std"] <= r["raw_std"] + 1e-9
        assert r["n_clamped"] <= r["n"]
        # ~10% of mass sits outside [p05, p95] by construction
        assert 0.02 <= r["n_clamped"] / r["n"] <= 0.2


def test_pq_codebook_census_shape(spark):
    rows = _q("e_pq_codebook")(spark, SF).collect()
    n_vecs = duckdb.sql(
        f"SELECT count(*) FROM '{SF}/embeddings.parquet'"
    ).fetchone()[0]
    by_ss = defaultdict(int)
    for r in rows:
        assert 0 <= r["ss"] < 4
        assert r["avg_d2"] >= 0
        by_ss[r["ss"]] += r["n_assigned"]
    # every vector gets exactly one code per subspace
    assert set(by_ss) == {0, 1, 2, 3}
    assert all(v == n_vecs for v in by_ss.values())


def test_pq_adc_topk_bounds_and_rank(spark):
    rows = _q("e_pq_fitted_adc_topk")(spark, SF).collect()
    assert len(rows) == 10
    assert [r["rank"] for r in rows] == list(range(1, 11))
    adc = [r["adc_d2"] for r in rows]
    assert adc == sorted(adc)
    for r in rows:
        assert r["adc_d2"] >= 0 and r["exact_d2"] >= 0


def test_seasonal_decompose_matches_python_replica(spark):
    from statistics import mean, variance

    daily = duckdb.sql(
        f"""SELECT event_type, CAST(ts AS DATE) AS d, count(*) AS n
            FROM '{SF}/events.parquet' GROUP BY 1,2 ORDER BY 1,2"""
    ).fetchall()
    series = defaultdict(list)
    for et, d, n in daily:
        series[et].append((d, n))
    rows = {(r["event_type"], r["dow"]): r for r in
            _q("ts_seasonal_decompose")(spark, SF).collect()}
    for et, pts in series.items():
        ns = [n for _d, n in pts]
        detr_by_dow, detr_all, rem_all = defaultdict(list), [], []
        for i, (d, n) in enumerate(pts):
            lo, hi = max(0, i - 3), min(len(pts), i + 4)
            detr = n - mean(ns[lo:hi])
            dow = (d.weekday() + 1) % 7  # python Mon=0 -> Sunday-start 0..6
            detr_by_dow[dow].append(detr)
            detr_all.append((dow, detr))
        seas = {dow: mean(v) for dow, v in detr_by_dow.items()}
        for dow, detr in detr_all:
            rem_all.append(detr - seas[dow])
        strength = round(max(0.0, 1 - variance(rem_all) /
                             variance([x for _dw, x in detr_all])), 4)
        for dow, s in seas.items():
            r = rows[(et, dow)]
            assert abs(r["seasonal_idx"] - round(s, 4)) <= 1e-4
            assert r["n_days"] == len(detr_by_dow[dow])
            assert abs(r["seasonal_strength"] - strength) <= 1e-4


def test_semdedup_report_matches_python_replica(spark):
    import math

    vecs = duckdb.sql(
        f"SELECT vec_id, label, embedding FROM '{SF}/embeddings.parquet'"
    ).fetchall()
    by_label = defaultdict(list)
    for vid, lab, emb in vecs:
        by_label[lab].append((vid, [float(x) for x in emb]))
    rows = {r["label"]: r for r in _q("d_semdedup_report")(spark, SF).collect()}
    assert set(rows) == set(by_label)
    for lab, members in by_label.items():
        members.sort()
        pairs = 0
        removed = set()
        for i, (ia, va) in enumerate(members):
            na = math.sqrt(sum(x * x for x in va))
            for ib, vb in members[i + 1:]:
                nb = math.sqrt(sum(x * x for x in vb))
                cos = sum(x * y for x, y in zip(va, vb)) / (na * nb)
                if cos > 0.3:
                    pairs += 1
                    removed.add(ib)
        r = rows[lab]
        assert r["n_vecs"] == len(members)
        assert r["n_dup_pairs"] == pairs
        assert r["n_removed"] == len(removed)
        assert r["n_kept"] == len(members) - len(removed)


def test_doc_entropy_filter_matches_python_replica(spark):
    import math

    agg = defaultdict(list)
    for _id, text, source in _docs():
        words = Counter(text.split(" "))
        n = sum(words.values())
        h = -sum((c / n) * math.log2(c / n) for c in words.values())
        agg[source].append(h)
    rows = {r["source"]: r for r in _q("t_doc_entropy_filter")(spark, SF).collect()}
    for source, hs in agg.items():
        r = rows[source]
        assert r["n_docs"] == len(hs)
        assert abs(r["avg_entropy"] - round(sum(hs) / len(hs), 4)) <= 1e-4
        assert abs(r["min_entropy"] - round(min(hs), 4)) <= 1e-4
        assert r["n_low_entropy"] == sum(h < 3.0 for h in hs)


def test_dedup_aware_mixture_weights_sum_to_one(spark):
    rows = _q("b_dedup_aware_mixture")(spark, SF).collect()
    assert abs(sum(r["weight"] for r in rows) - 1.0) < 1e-3
    for r in rows:
        # effective tokens never exceed raw tokens (weights discount)
        assert r["eff_tokens"] <= r["raw_tokens"] + 1e-9
        assert r["weight"] > 0


def test_ab_srm_check_no_mismatch_on_hash_assignment(spark):
    rows = _q("b_ab_srm_check")(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["n_treat"] + r["n_control"] == r["n"]
        # md5-nibble %2 on user ids: genuinely balanced -> no SRM flags
        assert r["chi2"] >= 0


def test_ivf_pq_topk_shape_and_pruning(spark):
    rows = _q("e_ivf_pq_topk")(spark, SF).collect()
    by_q = defaultdict(list)
    for r in rows:
        by_q[r["query_id"]].append(r)
    assert set(by_q) <= set(range(5))
    for q, rs in by_q.items():
        ranks = [r["rank"] for r in sorted(rs, key=lambda r: r["rank"])]
        assert ranks == list(range(1, len(rs) + 1))
        adc = [r["adc_d2"] for r in sorted(rs, key=lambda r: r["rank"])]
        assert adc == sorted(adc)
        assert all(r["neighbor_id"] != q for r in rs)


def test_ratio_metric_delta_ci_matches_python_replica(spark):
    import math
    from statistics import mean, variance

    evs = duckdb.sql(
        f"SELECT event_type, user_id, value FROM '{SF}/events.parquet'"
    ).fetchall()
    per_user = defaultdict(lambda: defaultdict(lambda: [0.0, 0]))
    for et, uid, v in evs:
        per_user[et][uid][0] += v
        per_user[et][uid][1] += 1
    rows = {r["event_type"]: r for r in
            _q("a_ratio_metric_delta_ci")(spark, SF).collect()}
    for et, users in per_user.items():
        xs = [x for x, _y in users.values()]
        ys = [float(y) for _x, y in users.values()]
        n = len(xs)
        mx, my = mean(xs), mean(ys)
        vx, vy = variance(xs), variance(ys)
        cxy = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / (n - 1)
        r0 = mx / my
        se = math.sqrt((vx - 2 * r0 * cxy + r0 * r0 * vy) / n) / my
        r = rows[et]
        assert r["n_users"] == n
        assert abs(r["ratio"] - round(r0, 6)) <= 1e-6
        assert abs(r["se"] - round(se, 6)) <= 1e-6
        assert abs(r["ci_lo"] - round(r0 - 1.96 * se, 6)) <= 1e-5
        assert abs(r["ci_hi"] - round(r0 + 1.96 * se, 6)) <= 1e-5


def test_community_modularity_invariants(spark):
    rows = _q("g_community_modularity")(spark, SF).collect()
    assert rows
    q_total = rows[0]["modularity"]
    assert all(r["modularity"] == q_total for r in rows)
    assert -1.0 <= q_total <= 1.0
    for r in rows:
        # internal edges bounded by the community's possible pairs
        assert r["internal_edges"] <= r["n_members"] * (r["n_members"] - 1) / 2
        assert r["degree_sum"] >= 2 * r["internal_edges"]
    # sizes must agree with g_label_propagation's report
    lpa = {r["label"]: r["n_members"] for r in
           _q("g_label_propagation")(spark, SF).collect()}
    for r in rows:
        if r["label"] in lpa:
            assert lpa[r["label"]] == r["n_members"]


def test_sequential_monitor_matches_python_replica(spark):
    import math

    evs = duckdb.sql(
        f"SELECT event_type, user_id, ts, value FROM '{SF}/events.parquet'"
        " ORDER BY ts, event_id"
    ).fetchall()
    days = defaultdict(lambda: defaultdict(lambda: [0, 0.0, 0.0]))
    for et, uid, ts, v in evs:
        treat = int(hashlib.md5(str(uid).encode()).hexdigest()[0], 16) % 2
        cell = days[et][(ts.date(), treat)]
        cell[0] += 1
        cell[1] += v
        cell[2] += v * v
    rows = {r["event_type"]: r for r in
            _q("b_sequential_mean_monitor")(spark, SF).collect()}
    for et, cells in days.items():
        dates = sorted({d for d, _t in cells})
        cum = {0: [0, 0.0, 0.0], 1: [0, 0.0, 0.0]}
        zs = []
        for d in dates:
            for t in (0, 1):
                c = cells.get((d, t), [0, 0.0, 0.0])
                cum[t] = [a + b for a, b in zip(cum[t], c)]
            # the monitor evaluates on days where BOTH arms logged
            # events (the cells inner join) — mirror that here
            if (d, 0) not in cells or (d, 1) not in cells:
                continue
            if cum[0][0] > 1 and cum[1][0] > 1:
                stats = {}
                for t in (0, 1):
                    n, s, ss = cum[t]
                    stats[t] = (s / n, (ss - s * s / n) / (n - 1), n)
                mt, vt, nt = stats[1]
                mc, vc, nc = stats[0]
                zs.append(round((mt - mc) / math.sqrt(vt / nt + vc / nc), 6))
        r = rows[et]
        assert r["n_days"] == len(zs)
        assert abs(r["final_z"] - round(zs[-1], 4)) <= 1e-4
        cross = next((i + 1 for i, z in enumerate(zs) if abs(z) > 2.8), 0)
        assert r["first_cross_day"] == cross
        assert r["crossed"] == (cross > 0)


def test_feature_hashing_matches_python_replica(spark):
    import math

    agg = defaultdict(list)
    for _id, text, source in _docs():
        feats = defaultdict(int)
        for w in text.split(" "):
            h = hashlib.md5(w.encode()).hexdigest()
            bucket = (int(h[0], 16) * 16 + int(h[1], 16)) % 64
            sgn = 1 if int(h[2], 16) % 2 == 0 else -1
            feats[bucket] += sgn
        l2 = math.sqrt(sum(v * v for v in feats.values()))
        nnz = sum(1 for v in feats.values() if v != 0)
        agg[source].append((l2, nnz))
    rows = {r["source"]: r for r in _q("t_feature_hashing")(spark, SF).collect()}
    for source, vals in agg.items():
        r = rows[source]
        assert r["n_docs"] == len(vals)
        assert abs(r["avg_l2"] - round(sum(v[0] for v in vals) / len(vals), 4)) <= 1e-3
        assert abs(r["avg_nnz"] - round(sum(v[1] for v in vals) / len(vals), 4)) <= 1e-3
        assert r["max_nnz"] == max(v[1] for v in vals)


def test_audio_stats_matches_python_replica(spark):
    import math

    rows = {r["doc_id"]: r for r in _q("m_audio_stats")(spark, SF).collect()}
    for doc_id, text, _source in _docs():
        b = text.encode()
        usable = len(b) // 2 * 2
        samples = [
            int.from_bytes(b[i:i + 2], "big", signed=True)
            for i in range(0, usable, 2)
        ]
        r = rows[doc_id]
        assert r["n_samples"] == len(samples)
        assert r["peak"] == max(abs(s) for s in samples)
        assert abs(r["rms"] - round(math.sqrt(
            sum(s * s for s in samples) / len(samples)), 4)) <= 1e-4
        assert abs(r["mean_amp"] - round(
            sum(samples) / len(samples), 4)) <= 1e-4


def test_frame_sample_census_matches_python_replica(spark):
    rows = {r["doc_id"]: r for r in
            _q("m_frame_sample_census")(spark, SF).collect()}
    for doc_id, text, _source in _docs():
        n_frames = len(text.encode()) // 32
        if n_frames == 0:
            assert doc_id not in rows
            continue
        r = rows[doc_id]
        assert r["n_frames"] == n_frames
        assert r["n_sampled"] == -(-n_frames // 4)  # ceil division
        assert r["frame_bytes"] == 32


def test_audio_decode_real_raises(spark):
    from etl_data_peri_institute_spark.operators.multimodal import (
        attach_binary_payload,
        decode_audio_stats,
    )
    import pytest as _pytest

    docs = spark.createDataFrame([(1, "xy")], "doc_id long, text string")
    with _pytest.raises(Exception, match="NotImplementedError|audio decode"):
        decode_audio_stats(attach_binary_payload(docs), fake=False).collect()


def test_qte_matches_python_replica(spark):
    import numpy as np

    evs = duckdb.sql(
        f"SELECT event_type, user_id, value FROM '{SF}/events.parquet'"
    ).fetchall()
    arms = defaultdict(lambda: ([], []))
    for et, uid, v in evs:
        treat = int(hashlib.md5(str(uid).encode()).hexdigest()[0], 16) % 2
        arms[et][treat].append(v)
    rows = {r["event_type"]: r for r in
            _q("a_quantile_treatment_effect")(spark, SF).collect()}
    for et, (ctrl, trt) in arms.items():
        r = rows[et]
        assert r["n"] == len(ctrl) + len(trt)
        for lv in (25, 50, 75, 90):
            want = float(np.percentile(trt, lv)) - float(np.percentile(ctrl, lv))
            assert abs(r[f"qte_p{lv}"] - round(want, 6)) <= 1e-5, (et, lv)


def test_stratified_ate_invariants(spark):
    rows = _q("b_stratified_ate")(spark, SF).collect()
    assert [r["stratum"] for r in rows] == [1, 2, 3, 4, 5]
    ate = rows[0]["ate_weighted"]
    assert all(r["ate_weighted"] == ate for r in rows)
    total = sum(r["n_stratum"] for r in rows)
    n_users = duckdb.sql(
        f"SELECT count(DISTINCT user_id) FROM '{SF}/events.parquet'"
    ).fetchone()[0]
    assert total == n_users
    # weighted ATE must equal the hand-computed combination over the
    # non-degenerate strata (a one-arm stratum carries NULL effect)
    live = [r for r in rows if r["stratum_effect"] is not None]
    assert live
    w = sum(r["n_stratum"] for r in live)
    want = sum(r["stratum_effect"] * r["n_stratum"] for r in live) / w
    assert abs(ate - round(want, 6)) <= 2e-6
    for r in live:
        assert r["stratum_se"] is None or r["stratum_se"] > 0


def test_streaming_upsert_partition_scoped_sink(spark, tmp_path):
    """Integration: a foreachBatch-style micro-batch upsert into a
    hive-partitioned ParquetStore goes through the partition-scoped
    path — untouched partitions stay byte-identical across batches
    (the idempotent streaming-sink contract + the round-7 upsert
    optimization working together)."""
    import os

    from etl_data_peri_institute_spark.sinks import ParquetStore

    store = ParquetStore(spark, str(tmp_path / "db"))
    day0 = spark.createDataFrame(
        [(1, "2024-01-01", 10.0), (2, "2024-01-02", 20.0)],
        "pk int, dt string, v double",
    )
    store.insert(day0, "t", partition_by=["dt"])
    frozen = os.path.join(store.path("t"), "dt=2024-01-01")

    def snap(d):
        out = {}
        for root, _dirs, files in os.walk(d):
            for f in files:
                p = os.path.join(root, f)
                out[p] = os.stat(p).st_mtime_ns
        return out

    before = snap(frozen)
    # three micro-batches, all touching only day 2 (replays included —
    # at-least-once semantics: batch 2 is applied twice)
    batch = spark.createDataFrame(
        [(2, "2024-01-02", 21.0), (3, "2024-01-02", 30.0)],
        "pk int, dt string, v double",
    )
    for _ in range(3):
        store.upsert(batch, "t", "pk")
    assert snap(frozen) == before  # day-1 files never touched
    rows = {r["pk"]: r["v"] for r in store.read("t").collect()}
    assert rows == {1: 10.0, 2: 21.0, 3: 30.0}


def test_binary_hamming_topk_matches_python_replica(spark):
    vecs = dict(duckdb.sql(
        f"SELECT vec_id, embedding FROM '{SF}/embeddings.parquet'"
    ).fetchall())
    signs = {vid: [1 if float(x) >= 0 else 0 for x in emb]
             for vid, emb in vecs.items()}
    rows = defaultdict(list)
    for r in _q("e_binary_hamming_topk")(spark, SF).collect():
        rows[r["query_id"]].append(r)
    for qid in range(5):
        dists = sorted(
            (sum(a != b for a, b in zip(signs[qid], signs[c])), c)
            for c in signs if c >= 5
        )[:10]
        got = sorted(rows[qid], key=lambda r: r["rank"])
        assert [(r["hamming"], r["neighbor_id"]) for r in got] == dists


def test_compression_recall_matrix_shape_and_ladder(spark):
    rows = _q("e_compression_recall_matrix")(spark, SF).collect()
    by_m = defaultdict(dict)
    for r in rows:
        assert 0 <= r["n_hits"] <= 10
        assert abs(r["recall_at_10"] - round(r["n_hits"] / 10, 2)) < 1e-9
        by_m[r["method"]][r["query_id"]] = r["n_hits"]
    # round-8 grew the ivf_pq tier (the pruned+compressed cell)
    assert set(by_m) == {"sq8", "pq_fitted", "binary", "ivf_pq"}
    assert all(set(q) == set(range(5)) for q in by_m.values())
    # int8 symmetric SQ is near-lossless at these magnitudes: it must
    # dominate the coarser tiers on average
    avg = {m: sum(v.values()) / len(v) for m, v in by_m.items()}
    assert avg["sq8"] >= avg["binary"]
    assert avg["sq8"] >= avg["pq_fitted"]


def test_covariate_balance_hash_assignment_is_balanced(spark):
    rows = _q("a_covariate_balance")(spark, SF).collect()
    assert {r["covariate"] for r in rows} == {
        "activity", "mean_value", "type_breadth"
    }
    import math

    for r in rows:
        assert r["n_treat"] > 0 and r["n_control"] > 0
        # the flag must agree with the value; magnitude itself is data
        # (at sf0.001 ~50 users/arm the SMD sampling spread is wide —
        # mean_value reads |SMD|≈1.0 there, which is exactly the
        # imbalance signal the gate exists to surface)
        if r["smd"] is not None:
            assert math.isfinite(r["smd"])
            assert r["imbalanced"] == (abs(r["smd"]) > 0.1)


def test_covariate_balance_matches_python_replica(spark):
    import math
    from statistics import mean, variance

    evs = duckdb.sql(
        f"SELECT user_id, event_type, value FROM '{SF}/events.parquet'"
    ).fetchall()
    users = defaultdict(lambda: [0, 0.0, set()])
    for uid, et, v in evs:
        u = users[uid]
        u[0] += 1
        u[1] += v
        u[2].add(et)
    cov = defaultdict(lambda: ([], []))
    for uid, (n, s, types) in users.items():
        arm = int(hashlib.md5(str(uid).encode()).hexdigest()[0], 16) % 2
        cov["activity"][arm].append(float(n))
        cov["mean_value"][arm].append(s / n)
        cov["type_breadth"][arm].append(float(len(types)))
    rows = {r["covariate"]: r for r in _q("a_covariate_balance")(spark, SF).collect()}
    for name, (ctrl, trt) in cov.items():
        r = rows[name]
        assert r["n_treat"] == len(trt) and r["n_control"] == len(ctrl)
        pooled = math.sqrt((variance(trt) + variance(ctrl)) / 2)
        if pooled == 0:
            # constant covariate in both arms (type_breadth at this SF):
            # the NULLIF guard yields NULL instead of an ANSI div error
            assert r["smd"] is None
            continue
        want = (mean(trt) - mean(ctrl)) / pooled
        assert abs(r["smd"] - round(want, 4)) <= 1e-4
