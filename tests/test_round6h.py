"""Round-6 continuation batch 7: LSH band sweep, holdout leakage,
CUPED readout, EMD drift. Pure-Python replicas over the sf0.001 tables
plus the structural invariants each operator guarantees."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

import duckdb

from etl_data_peri_institute_spark.plans import catalog

SF = "/root/testdata/sf0.001"


def _q(name):
    catalog.load_all()
    return catalog.QUERIES[name].fn


def _aug_docs() -> list[tuple[int, str, str]]:
    """Python replica of the augmented corpus (exact + 70%-truncated
    copies of doc_id < 50)."""
    rows = duckdb.sql(
        f"SELECT doc_id, source, text FROM '{SF}/documents.parquet'"
    ).fetchall()
    out = list(rows)
    for doc_id, source, text in rows:
        if doc_id < 50:
            out.append((doc_id + 1000000, source, text))
            w = text.split(" ")
            out.append(
                (doc_id + 2000000, source,
                 " ".join(w[: math.ceil(len(w) * 0.7)]))
            )
    return out


def _shingles(text: str) -> set[str]:
    w = text.split(" ")
    return {" ".join(w[i:i + 3]) for i in range(len(w) - 2)} if len(w) >= 3 else set()


def _true_pairs(docs) -> set[tuple[int, int]]:
    sh = {d: _shingles(t) for d, _, t in docs if _shingles(t)}
    inv = defaultdict(list)
    for d, s in sh.items():
        for g in s:
            inv[g].append(d)
    common: Counter = Counter()
    for ds in inv.values():
        ds.sort()
        for i, a in enumerate(ds):
            for b in ds[i + 1:]:
                common[(a, b)] += 1
    out = set()
    for (a, b), c in common.items():
        if c / (len(sh[a]) + len(sh[b]) - c) > 0.5:
            out.add((a, b))
    return out


# ---------------------------------------------------------------------------
# d_minhash_band_sweep
# ---------------------------------------------------------------------------


def test_band_sweep_matches_python_replica_and_tradeoff(spark):
    docs = _aug_docs()
    sh = {d: _shingles(t) for d, _, t in docs if _shingles(t)}
    sigs = {
        d: [min(hashlib.md5(f"{i}{g}".encode()).hexdigest() for g in s)
            for i in range(8)]
        for d, s in sh.items()
    }
    truth = _true_pairs(docs)

    def candidates(bands, rows):
        buckets = defaultdict(list)
        for d, m in sigs.items():
            for b in range(bands):
                key = (b, "".join(m[b * rows:(b + 1) * rows]))
                buckets[key].append(d)
        out = set()
        for ds in buckets.values():
            ds.sort()
            for i, a in enumerate(ds):
                for b2 in ds[i + 1:]:
                    out.add((a, b2))
        return out

    got = {(r["bands"], r["rows_per_band"]): r for r in
           _q("d_minhash_band_sweep")(spark, SF).collect()}
    assert set(got) == {(2, 4), (4, 2), (8, 1)}
    prev_recall, prev_prec = -1.0, 2.0
    for bands, rows in ((2, 4), (4, 2), (8, 1)):
        cand = candidates(bands, rows)
        r = got[(bands, rows)]
        assert r["n_candidates"] == len(cand)
        assert r["n_true_pairs"] == len(truth)
        assert r["n_hits"] == len(cand & truth)
        # more bands of fewer rows: recall up, precision down
        assert r["recall"] >= prev_recall
        assert r["lsh_precision"] <= prev_prec
        prev_recall, prev_prec = r["recall"], r["lsh_precision"]


# ---------------------------------------------------------------------------
# b_holdout_leakage_check
# ---------------------------------------------------------------------------


def test_holdout_leakage_matches_python_replica(spark):
    docs = _aug_docs()
    part = {
        d: ("train" if int(hashlib.md5(str(d).encode()).hexdigest()[0], 16) < 12
            else "test")
        for d, _, _ in docs
    }
    truth = _true_pairs(docs)
    leaked = set()
    for a, b in truth:
        if part[a] != part[b]:
            leaked.add(a if part[a] == "test" else b)
    agg = defaultdict(lambda: [0, 0])
    for d, source, _ in docs:
        if part[d] == "test":
            agg[source][0] += 1
            agg[source][1] += d in leaked
    rows = {r["source"]: r for r in
            _q("b_holdout_leakage_check")(spark, SF).collect()}
    assert set(rows) == set(agg)
    for source, (n, nl) in agg.items():
        r = rows[source]
        assert (r["n_test_docs"], r["n_leaked"]) == (n, nl)
        assert abs(r["leak_rate"] - nl / n) < 2e-4
    # the injected copies guarantee the audit finds something
    assert sum(r["n_leaked"] for r in rows.values()) > 0


# ---------------------------------------------------------------------------
# b_cuped_adjusted_ab
# ---------------------------------------------------------------------------


def test_cuped_matches_python_replica(spark):
    evs = duckdb.sql(
        f"SELECT user_id, ts, event_type FROM '{SF}/events.parquet'"
    ).fetchall()
    secs = [int(ts.timestamp()) for _, ts, _ in evs]
    mid = (min(secs) + max(secs)) // 2
    xy = defaultdict(lambda: [0, 0])
    for (user_id, ts, etype), s in zip(evs, secs):
        if s <= mid:
            xy[user_id][0] += 1
        elif etype == "purchase":
            xy[user_id][1] += 1
    xs = [v[0] for v in xy.values()]
    ys = [v[1] for v in xy.values()]
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    vx = sum(x * x for x in xs) / n - mx * mx
    vy = sum(y * y for y in ys) / n - my * my
    cxy = sum(x * y for x, y in zip(xs, ys)) / n - mx * my
    theta = cxy / vx
    r = _q("b_cuped_adjusted_ab")(spark, SF).collect()[0]
    assert abs(r["theta"] - theta) < 2e-4
    assert abs(r["var_reduction"] - (1 - (vy - cxy * cxy / vx) / vy)) < 2e-4
    arms = defaultdict(lambda: [0, 0.0, 0.0])
    for user_id, (x, y) in xy.items():
        arm = "A" if int(hashlib.md5(str(user_id).encode()).hexdigest()[0], 16) < 8 else "B"
        arms[arm][0] += 1
        arms[arm][1] += y
        arms[arm][2] += y - theta * (x - mx)
    for arm, (na, sy, sadj) in arms.items():
        lo = arm.lower()
        assert r[f"n_{lo}"] == na
        assert abs(r[f"mean_y_{lo}"] - sy / na) < 2e-4
        assert abs(r[f"mean_y_adj_{lo}"] - sadj / na) < 2e-4
    # CUPED reduces variance whenever X correlates with Y
    assert 0.0 <= r["var_reduction"] <= 1.0


# ---------------------------------------------------------------------------
# a_emd_drift
# ---------------------------------------------------------------------------


def test_emd_drift_matches_python_replica(spark):
    import datetime

    evs = duckdb.sql(
        f"SELECT event_type, ts, value FROM '{SF}/events.parquet'"
    ).fetchall()
    split = datetime.datetime(2024, 1, 15)
    per_type = defaultdict(lambda: (Counter(), Counter()))
    for etype, ts, value in evs:
        v = round(value, 2)
        per_type[etype][0 if ts < split else 1][v] += 1
    rows = {r["event_type"]: r["emd"] for r in
            _q("a_emd_drift")(spark, SF).collect()}
    for etype, (base, cur) in per_type.items():
        support = sorted(set(base) | set(cur))
        tb, tc = sum(base.values()), sum(cur.values())
        emd, fb, fc = 0.0, 0.0, 0.0
        for v, v_next in zip(support, support[1:]):
            fb += base[v] / tb
            fc += cur[v] / tc
            emd += abs(fb - fc) * (v_next - v)
        assert abs(rows[etype] - emd) < 2e-3
        assert rows[etype] >= 0
