"""Round-6 continuation batch 6: Matryoshka truncation report, PCA
power iteration, freshness report, power analysis. Pure-Python/NumPy
replicas over the sf0.001 tables + structural invariants."""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import duckdb
import numpy as np

from etl_data_peri_institute_spark.plans import catalog

SF = "/root/testdata/sf0.001"


def _q(name):
    catalog.load_all()
    return catalog.QUERIES[name].fn


def _vectors() -> np.ndarray:
    rows = duckdb.sql(
        f"SELECT embedding FROM '{SF}/embeddings.parquet' ORDER BY vec_id"
    ).fetchall()
    return np.array([r[0] for r in rows], dtype=np.float64)


# ---------------------------------------------------------------------------
# e_matryoshka_truncation_report
# ---------------------------------------------------------------------------


def test_matryoshka_report_matches_numpy_replica(spark):
    x = _vectors()
    tot = (x * x).sum(axis=1)
    rows = {r["dim_prefix"]: r for r in
            _q("e_matryoshka_truncation_report")(spark, SF).collect()}
    assert set(rows) == {8, 16, 32}
    prev_cos = 0.0
    for d in (8, 16, 32):
        pre = (x[:, :d] * x[:, :d]).sum(axis=1)
        energy = pre / tot
        cos = np.sqrt(energy)
        r = rows[d]
        assert abs(r["avg_cos"] - cos.mean()) < 2e-4
        assert abs(r["min_cos"] - cos.min()) < 2e-4
        assert abs(r["avg_energy_ratio"] - energy.mean()) < 2e-4
        # more dims always preserve more geometry
        assert r["avg_cos"] >= prev_cos
        prev_cos = r["avg_cos"]


# ---------------------------------------------------------------------------
# e_pca_power_iteration
# ---------------------------------------------------------------------------


def test_pca_power_iteration_matches_numpy_replica(spark):
    x = _vectors()
    n, d = x.shape
    mu = np.round(x.mean(axis=0), 6)
    c = x - mu
    cov = np.round((c.T @ c) / n, 6)
    v = np.ones(d)
    nrm = None
    for _ in range(2):
        mv = np.round(cov @ v, 6)
        nrm = math.sqrt((mv * mv).sum())
        v = np.round(mv / nrm, 6)
    rows = _q("e_pca_power_iteration")(spark, SF).collect()
    assert len(rows) == d
    for r in rows:
        assert abs(r["loading"] - v[r["dim"] - 1]) < 2e-4
        assert abs(r["eigenvalue_est"] - nrm) < 2e-4
    # the reported vector is unit-norm (up to rounding)
    assert abs(sum(r["loading"] ** 2 for r in rows) - 1.0) < 1e-2
    # power iteration on a PSD matrix never decreases the Rayleigh
    # quotient: two rounds must beat the uniform start. (Full alignment
    # with the true PC is NOT asserted — the synthetic embeddings are
    # near-isotropic, where 2 rounds converge slowly by design.)
    got = np.array([r["loading"] for r in sorted(rows, key=lambda r: r["dim"])])
    init = np.ones(d) / math.sqrt(d)
    ray = lambda u: float(u @ cov @ u) / float(u @ u)  # noqa: E731
    assert ray(got) >= ray(init) - 1e-9


# ---------------------------------------------------------------------------
# p_freshness_report
# ---------------------------------------------------------------------------


def test_freshness_report_matches_python_replica(spark):
    evs = duckdb.sql(
        f"SELECT event_type, max(ts) FROM '{SF}/events.parquet' GROUP BY 1"
    ).fetchall()
    last = dict(evs)
    global_max = max(last.values())
    rows = {r["feed"]: r for r in _q("p_freshness_report")(spark, SF).collect()}
    assert set(rows) == set(last)
    stalest = 0.0
    for feed, ts in last.items():
        r = rows[feed]
        assert r["last_ts"] == ts
        lag_s = int(global_max.timestamp()) - int(ts.timestamp())
        assert abs(r["lag_hours"] - lag_s / 3600.0) < 2e-2
        assert r["is_stale"] == int(lag_s > 24 * 3600)
        stalest = max(stalest, r["lag_hours"])
    # the newest feed defines the clock: someone has zero lag
    assert min(r["lag_hours"] for r in rows.values()) == 0.0


# ---------------------------------------------------------------------------
# b_power_analysis
# ---------------------------------------------------------------------------


def test_power_analysis_matches_python_replica(spark):
    evs = duckdb.sql(
        f"SELECT user_id, event_type FROM '{SF}/events.parquet'"
    ).fetchall()
    npurch: Counter = Counter()
    for user_id, etype in evs:
        npurch[user_id] += int(etype == "purchase")
    arms = {"A": [0, 0], "B": [0, 0]}
    for user_id, np_ in npurch.items():
        h = hashlib.md5(str(user_id).encode()).hexdigest()
        arm = "A" if int(h[0], 16) < 8 else "B"
        arms[arm][0] += 1
        arms[arm][1] += int(np_ >= 14)
    (n_a, c_a), (n_b, _) = arms["A"], arms["B"]
    p1 = c_a / n_a
    p2 = min(p1 * 1.1, 1.0)
    r = _q("b_power_analysis")(spark, SF).collect()[0]
    assert abs(r["p_base"] - p1) < 2e-4
    assert abs(r["p_target"] - p2) < 2e-4
    assert r["n_available_per_arm"] == min(n_a, n_b)
    if p2 == p1:  # degenerate: no detectable lift
        assert r["n_required_per_arm"] is None
        assert r["powered_now"] == 0
    else:
        pbar = (p1 + p2) / 2
        n_req = math.ceil(
            (1.959964 * math.sqrt(2 * pbar * (1 - pbar))
             + 0.841621 * math.sqrt(p1 * (1 - p1) + p2 * (1 - p2))) ** 2
            / (p2 - p1) ** 2
        )
        assert r["n_required_per_arm"] == n_req
        assert r["powered_now"] == int(min(n_a, n_b) >= n_req)
