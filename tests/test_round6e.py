"""Round-6 continuation batch 4: Bloom-membership dedup report, Markov
transitions, BPE pair stats, A/B experiment readout. Each gate query is
checked against an INDEPENDENT pure-Python replica over the sf0.001
tables (the cross-engine DuckDB oracle runs in tools/oracle_check.py
and the driver gate); invariants pin the probabilistic guarantees."""

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


def _docs():
    return duckdb.sql(
        f"SELECT doc_id, source, text FROM '{SF}/documents.parquet'"
    ).fetchall()


def _events():
    return duckdb.sql(
        f"SELECT event_id, ts, user_id, event_type FROM '{SF}/events.parquet'"
    ).fetchall()


# ---------------------------------------------------------------------------
# d_bloom_dedup_report
# ---------------------------------------------------------------------------

_M, _W = 4096, 32


def _bloom_positions(h: str) -> tuple[int, int]:
    return int(h[0:3], 16), int(h[3:6], 16)


def test_bloom_report_matches_python_replica(spark):
    corpus_keys, batch = set(), set()
    for doc_id, source, text in _docs():
        h = hashlib.md5(text.encode()).hexdigest()
        if doc_id % 3 != 0:
            corpus_keys.add(h)
        else:
            batch.add((source, h))
    bits = set()
    for h in corpus_keys:
        bits.update(_bloom_positions(h))
    agg = defaultdict(lambda: [0, 0, 0, 0])  # n, bloom, exact, fp
    for source, h in batch:
        pos = set(_bloom_positions(h))
        bloom = pos <= bits
        exact = h in corpus_keys
        row = agg[source]
        row[0] += 1
        row[1] += bloom
        row[2] += exact
        row[3] += bloom and not exact
    got = {r["source"]: r for r in
           map(lambda r: r.asDict(), _q("d_bloom_dedup_report")(spark, SF).collect())}
    assert set(got) == set(agg)
    for source, (n, bloom, exact, fp) in agg.items():
        r = got[source]
        assert (r["n_keys"], r["bloom_positive"], r["exact_dups"],
                r["false_positives"]) == (n, bloom, exact, fp)
        # Bloom never misses a true duplicate.
        assert r["exact_dups"] <= r["bloom_positive"]
        if n - exact == 0:
            assert r["fp_rate"] is None
        else:
            assert abs(r["fp_rate"] - fp / (n - exact)) < 2e-4


# ---------------------------------------------------------------------------
# b_markov_transitions
# ---------------------------------------------------------------------------


def test_markov_transitions_match_python_replica(spark):
    per_user = defaultdict(list)
    for event_id, ts, user_id, etype in _events():
        per_user[user_id].append((ts, event_id, etype))
    counts: Counter = Counter()
    for evs in per_user.values():
        evs.sort()
        for (_, _, a), (_, _, b) in zip(evs, evs[1:]):
            counts[(a, b)] += 1
    from_totals: Counter = Counter()
    for (a, _), n in counts.items():
        from_totals[a] += n
    rows = _q("b_markov_transitions")(spark, SF).collect()
    assert {(r["from_type"], r["to_type"]): r["n"] for r in rows} == dict(counts)
    by_from = defaultdict(float)
    for r in rows:
        expected = counts[(r["from_type"], r["to_type"])] / from_totals[r["from_type"]]
        assert abs(r["p"] - expected) < 2e-4
        by_from[r["from_type"]] += r["p"]
    for s in by_from.values():  # each row of the matrix is a distribution
        assert abs(s - 1.0) < 1e-2


# ---------------------------------------------------------------------------
# t_bpe_pair_stats
# ---------------------------------------------------------------------------


def test_bpe_pair_stats_match_python_replica(spark):
    pair_counts: Counter = Counter()
    for _, _, text in _docs():
        for word in text.split(" "):
            for a, b in zip(word, word[1:]):
                pair_counts[f"{a} {b}"] += 1
    expected = sorted(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    rows = _q("t_bpe_pair_stats")(spark, SF).collect()
    assert [(r["pair"], r["n"]) for r in rows] == expected


# ---------------------------------------------------------------------------
# b_ab_experiment_report
# ---------------------------------------------------------------------------


def test_ab_experiment_report_matches_python_replica(spark):
    npurch: Counter = Counter()
    for _, _, user_id, etype in _events():
        npurch[user_id] += int(etype == "purchase")
    conv = {u: int(n >= 14) for u, n in npurch.items()}
    arms = {"A": [0, 0], "B": [0, 0]}
    for user_id, c in conv.items():
        h = hashlib.md5(str(user_id).encode()).hexdigest()
        arm = "A" if int(h[0], 16) < 8 else "B"
        arms[arm][0] += 1
        arms[arm][1] += c
    (n_a, c_a), (n_b, c_b) = arms["A"], arms["B"]
    r = _q("b_ab_experiment_report")(spark, SF).collect()[0]
    assert (r["n_a"], r["conv_a"], r["n_b"], r["conv_b"]) == (n_a, c_a, n_b, c_b)
    p_a, p_b = c_a / n_a, c_b / n_b
    pooled = (c_a + c_b) / (n_a + n_b)
    assert abs(r["rate_a"] - p_a) < 2e-4
    assert abs(r["rate_b"] - p_b) < 2e-4
    var = pooled * (1 - pooled) * (1 / n_a + 1 / n_b)
    if var == 0:  # degenerate arms (all/none converted): z is NULL
        assert r["z_score"] is None
    else:
        z = (p_b - p_a) / math.sqrt(var)
        assert abs(r["z_score"] - z) < 2e-4


def test_ab_assignment_is_deterministic_across_runs(spark):
    a = _q("b_ab_experiment_report")(spark, SF).collect()[0]
    b = _q("b_ab_experiment_report")(spark, SF).collect()[0]
    assert a == b
