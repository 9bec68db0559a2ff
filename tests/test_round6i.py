"""Round-6 continuation batch 8: langid confusion matrix, seasonal-naive
backtest, dedup funnel, deterministic bootstrap. Pure-Python replicas
over the sf0.001 tables + the invariants each report guarantees."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

import duckdb

from etl_data_peri_institute_spark.plans import catalog
from tests.test_round6h import _aug_docs, _shingles

SF = "/root/testdata/sf0.001"

_MARKERS = {
    "en": ("the", "and", "of"),
    "es": ("el", "la", "de"),
    "de": ("der", "und", "die"),
    "fr": ("le", "et", "les"),
}


def _q(name):
    catalog.load_all()
    return catalog.QUERIES[name].fn


# ---------------------------------------------------------------------------
# t_langid_confusion
# ---------------------------------------------------------------------------


def test_langid_confusion_matches_python_replica(spark):
    docs = duckdb.sql(
        f"SELECT doc_id, lang, text FROM '{SF}/documents.parquet'"
    ).fetchall()
    cm: Counter = Counter()
    for _, lang, text in docs:
        words = text.split(" ")
        scores = {
            k: sum(w in m for w in words) for k, m in _MARKERS.items()
        }
        best = max(scores.values())
        if best == 0:
            pred = "und"
        else:
            pred = next(k for k in _MARKERS if scores[k] == best)
        cm[(lang, pred)] += 1
    actual_totals: Counter = Counter()
    for (lang, _), n in cm.items():
        actual_totals[lang] += n
    rows = _q("t_langid_confusion")(spark, SF).collect()
    assert {(r["actual_lang"], r["predicted_lang"]): r["n"] for r in rows} == dict(cm)
    for r in rows:
        share = cm[(r["actual_lang"], r["predicted_lang"])] / actual_totals[r["actual_lang"]]
        assert abs(r["share_of_actual"] - share) < 2e-4
    # shares per actual language sum to 1
    by_actual = defaultdict(float)
    for r in rows:
        by_actual[r["actual_lang"]] += r["share_of_actual"]
    for s in by_actual.values():
        assert abs(s - 1.0) < 1e-2


# ---------------------------------------------------------------------------
# ts_snaive_forecast_eval
# ---------------------------------------------------------------------------


def test_snaive_eval_matches_python_replica(spark):
    evs = duckdb.sql(
        f"SELECT event_type, CAST(ts AS DATE), value FROM '{SF}/events.parquet'"
    ).fetchall()
    daily = defaultdict(float)
    for etype, day, value in evs:
        daily[(etype, day)] += value
    series = defaultdict(list)
    for (etype, day), rev in daily.items():
        series[etype].append((day, round(rev, 2)))
    rows = {r["event_type"]: r for r in
            _q("ts_snaive_forecast_eval")(spark, SF).collect()}
    for etype, pts in series.items():
        pts.sort()
        scored = [
            (rev, pts[i - 7][1]) for i, (_, rev) in enumerate(pts) if i >= 7
        ]
        r = rows[etype]
        assert r["n_days_scored"] == len(scored)
        mae = sum(abs(a - f) for a, f in scored) / len(scored)
        mapes = [abs(a - f) / a for a, f in scored if a != 0]
        assert abs(r["mae"] - mae) < 2e-2
        assert abs(r["mape"] - sum(mapes) / len(mapes)) < 2e-4


# ---------------------------------------------------------------------------
# d_dedup_pipeline_funnel
# ---------------------------------------------------------------------------


def test_dedup_funnel_matches_python_replica(spark):
    docs = _aug_docs()
    by_hash = defaultdict(list)
    for d, _, t in docs:
        by_hash[hashlib.md5(t.encode()).hexdigest()].append(d)
    exact_keep = {min(ds) for ds in by_hash.values()}
    sh = {d: _shingles(t) for d, _, t in docs
          if d in exact_keep and _shingles(t)}
    inv = defaultdict(list)
    for d, s in sh.items():
        for g in s:
            inv[g].append(d)
    common: Counter = Counter()
    for ds in inv.values():
        ds = sorted(set(ds))
        for i, a in enumerate(ds):
            for b in ds[i + 1:]:
                common[(a, b)] += 1
    nd_drop = set()
    for (a, b), c in common.items():
        if c / (len(sh[a]) + len(sh[b]) - c) > 0.5:
            nd_drop.add(b)
    agg = defaultdict(lambda: [0, 0, 0])
    for d, source, _ in docs:
        agg[source][0] += 1
        if d in exact_keep:
            agg[source][1] += 1
            if d not in nd_drop:
                agg[source][2] += 1
    rows = {r["source"]: r for r in
            _q("d_dedup_pipeline_funnel")(spark, SF).collect()}
    assert set(rows) == set(agg)
    for source, (n, ne, nn) in agg.items():
        r = rows[source]
        assert (r["n_docs"], r["n_after_exact"], r["n_after_neardup"]) == (n, ne, nn)
        # funnel is monotone
        assert r["n_docs"] >= r["n_after_exact"] >= r["n_after_neardup"]
        assert abs(r["total_removal_rate"] - (1 - nn / n)) < 2e-4
    # the injected copies guarantee each stage removes something somewhere
    assert sum(r[1] for r in agg.values()) < sum(r[0] for r in agg.values())
    assert sum(r[2] for r in agg.values()) < sum(r[1] for r in agg.values())


# ---------------------------------------------------------------------------
# a_bootstrap_ci
# ---------------------------------------------------------------------------

_POIS = (0.367879, 0.735759, 0.919699, 0.981012, 0.996340)


def test_bootstrap_ci_matches_python_replica(spark):
    px = duckdb.sql(
        f"SELECT event_id, value FROM '{SF}/events.parquet' "
        "WHERE event_type = 'purchase'"
    ).fetchall()
    B = 200
    means = []
    for s in range(B):
        sw = swx = 0.0
        for event_id, value in px:
            h = hashlib.md5(f"{event_id}:{s}".encode()).hexdigest()
            u = int(h[:4], 16) / 65536.0
            w = next((i for i, p in enumerate(_POIS) if u < p), 5)
            sw += w
            swx += w * value
        means.append(swx / sw)
    means.sort()
    point = sum(v for _, v in px) / len(px)
    bm = sum(means) / B
    se = math.sqrt(sum(m * m for m in means) / B - bm * bm)
    r = _q("a_bootstrap_ci")(spark, SF).collect()[0]
    assert abs(r["point_mean"] - point) < 2e-4
    assert abs(r["boot_mean"] - bm) < 2e-4
    assert abs(r["boot_se"] - se) < 2e-4
    assert abs(r["ci_lo"] - means[4]) < 2e-4   # rank 5, 1-indexed
    assert abs(r["ci_hi"] - means[194]) < 2e-4  # rank 195
    # the CI brackets the point estimate and the bootstrap mean
    assert r["ci_lo"] <= r["boot_mean"] <= r["ci_hi"]


def test_bootstrap_is_deterministic_across_runs(spark):
    a = _q("a_bootstrap_ci")(spark, SF).collect()[0]
    b = _q("a_bootstrap_ci")(spark, SF).collect()[0]
    assert a == b
