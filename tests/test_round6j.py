"""Round-6 continuation batch 9: IVF nprobe sweep, jackknife SE,
seasonal-naive anomalies. Pure-Python/NumPy replicas + invariants."""

from __future__ import annotations

import math
from collections import defaultdict

import duckdb
import numpy as np

from etl_data_peri_institute_spark.plans import catalog

SF = "/root/testdata/sf0.001"


def _q(name):
    catalog.load_all()
    return catalog.QUERIES[name].fn


# ---------------------------------------------------------------------------
# e_ivf_nprobe_sweep
# ---------------------------------------------------------------------------


def test_nprobe_sweep_matches_numpy_replica_and_curve(spark):
    rows_ = duckdb.sql(
        f"SELECT vec_id, label, embedding FROM '{SF}/embeddings.parquet' "
        "ORDER BY vec_id"
    ).fetchall()
    ids = [r[0] for r in rows_]
    labels = {r[0]: r[1] for r in rows_}
    x = np.array([r[2] for r in rows_], dtype=np.float64)
    norm = np.linalg.norm(x, axis=1)
    cents = {}
    for lab in set(labels.values()):
        members = [i for i, d in enumerate(ids) if labels[d] == lab]
        cents[lab] = x[members].mean(axis=0)

    def rank_cents(v):
        sims = {
            lab: float(v @ c) / (np.linalg.norm(v) * np.linalg.norm(c))
            for lab, c in cents.items()
        }
        return sorted(cents, key=lambda lab: (-sims[lab], lab))

    lists = defaultdict(set)
    for i, d in enumerate(ids):
        lists[rank_cents(x[i])[0]].add(d)

    queries = [d for d in ids if d < 5]
    qidx = {d: i for i, d in enumerate(ids)}

    def exact_top3(qd):
        qi = qidx[qd]
        sims = [
            (float(x[qi] @ x[j]) / (norm[qi] * norm[j]), ids[j])
            for j in range(len(ids)) if ids[j] != qd
        ]
        sims.sort(key=lambda t: (-t[0], t[1]))
        return {nid for _, nid in sims[:3]}

    truth = {(qd, nid) for qd in queries for nid in exact_top3(qd)}

    got = {r["n_probe"]: r for r in _q("e_ivf_nprobe_sweep")(spark, SF).collect()}
    assert set(got) == {1, 2, 4}
    prev_recall, prev_cand = -1.0, -1
    for p in (1, 2, 4):
        cand = set()
        for qd in queries:
            for lab in rank_cents(x[qidx[qd]])[:p]:
                cand.update((qd, nid) for nid in lists[lab] if nid != qd)
        top = set()
        for qd in queries:
            cs = sorted(
                ((float(x[qidx[qd]] @ x[qidx[nid]]) / (norm[qidx[qd]] * norm[qidx[nid]]), nid)
                 for q2, nid in cand if q2 == qd),
                key=lambda t: (-t[0], t[1]),
            )
            top.update((qd, nid) for _, nid in cs[:3])
        r = got[p]
        assert r["n_candidates"] == len(cand)
        assert r["n_truth_pairs"] == len(truth)
        assert r["n_caught"] == len(top & truth)
        # more probes: more candidates, never less recall
        assert r["n_candidates"] >= prev_cand
        assert r["recall_at_3"] >= prev_recall
        prev_cand, prev_recall = r["n_candidates"], r["recall_at_3"]


# ---------------------------------------------------------------------------
# a_jackknife_se
# ---------------------------------------------------------------------------


def test_jackknife_matches_python_replica(spark):
    rows_ = duckdb.sql(
        f"SELECT source, n_chars FROM '{SF}/documents.parquet'"
    ).fetchall()
    by_src = defaultdict(list)
    for s, n in rows_:
        by_src[s].append(n)
    nn = sum(len(v) for v in by_src.values())
    ss = float(sum(sum(v) for v in by_src.values()))
    point = ss / nn
    loo = {
        s: (ss - sum(v)) / (nn - len(v)) for s, v in by_src.items()
    }
    g = len(loo)
    mbar = sum(loo.values()) / g
    se = math.sqrt((g - 1) / g * sum((m - mbar) ** 2 for m in loo.values()))
    max_infl = max(loo, key=lambda s: (abs(loo[s] - point), ))
    # deterministic tiebreak: abs desc, then source asc
    best = sorted(loo, key=lambda s: (-abs(loo[s] - point), s))[0]
    r = _q("a_jackknife_se")(spark, SF).collect()[0]
    assert abs(r["point_mean"] - point) < 2e-4
    assert abs(r["jack_se"] - se) < 2e-4
    assert r["n_groups"] == g
    assert r["max_influence_source"] == best
    del max_infl


# ---------------------------------------------------------------------------
# ts_snaive_anomaly
# ---------------------------------------------------------------------------


def test_snaive_anomaly_matches_python_replica(spark):
    evs = duckdb.sql(
        f"SELECT event_type, CAST(ts AS DATE), value FROM '{SF}/events.parquet'"
    ).fetchall()
    daily = defaultdict(float)
    for etype, day, value in evs:
        daily[(etype, day)] += value
    series = defaultdict(list)
    for (etype, day), rev in daily.items():
        series[etype].append((day, round(rev, 2)))
    expected = []
    for etype, pts in series.items():
        pts.sort()
        resid = [
            (day, rev, pts[i - 7][1], rev - pts[i - 7][1])
            for i, (day, rev) in enumerate(pts) if i >= 7
        ]
        rs = [r for _, _, _, r in resid]
        rbar = sum(rs) / len(rs)
        sigma = math.sqrt(max(sum(r * r for r in rs) / len(rs) - rbar * rbar, 0))
        for day, rev, fc, r in resid:
            if abs(r - rbar) > 2.0 * sigma:
                expected.append((etype, day, rev, fc, round((r - rbar) / sigma, 2)))
    rows = [
        (r["event_type"], r["day"], r["rev"], r["forecast"], r["z"])
        for r in _q("ts_snaive_anomaly")(spark, SF).collect()
    ]
    assert sorted(rows) == sorted(expected)
    assert len(rows) > 0  # the synthetic stream always has >2-sigma days
