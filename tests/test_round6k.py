"""Round-6 continuation batch 10: Theil-Sen trend, ACF report,
normalization-form dedup rates. Pure-Python replicas + invariants."""

from __future__ import annotations

import hashlib
from collections import defaultdict

import duckdb

from etl_data_peri_institute_spark.plans import catalog
from tests.test_round6h import _aug_docs

SF = "/root/testdata/sf0.001"


def _q(name):
    catalog.load_all()
    return catalog.QUERIES[name].fn


def _daily_series():
    evs = duckdb.sql(
        f"SELECT event_type, CAST(ts AS DATE), value FROM '{SF}/events.parquet'"
    ).fetchall()
    daily = defaultdict(float)
    for etype, day, value in evs:
        daily[(etype, day)] += value
    series = defaultdict(list)
    for (etype, day), rev in daily.items():
        series[etype].append((day, round(rev, 2)))
    for pts in series.values():
        pts.sort()
    return series


# ---------------------------------------------------------------------------
# a_theil_sen_trend
# ---------------------------------------------------------------------------


def test_theil_sen_matches_python_replica(spark):
    series = _daily_series()
    rows = {r["event_type"]: r for r in
            _q("a_theil_sen_trend")(spark, SF).collect()}
    for etype, pts in series.items():
        x0 = pts[0][0]
        xy = [((d - x0).days, rev) for d, rev in pts]
        slopes = sorted(
            (y2 - y1) / (x2 - x1)
            for i, (x1, y1) in enumerate(xy)
            for (x2, y2) in xy[i + 1:]
            if x2 > x1
        )
        n = len(slopes)
        med = (slopes[(n - 1) // 2] + slopes[n // 2]) / 2
        mx = sum(x for x, _ in xy) / len(xy)
        my = sum(y for _, y in xy) / len(xy)
        ols = (
            sum(x * y for x, y in xy) / len(xy) - mx * my
        ) / (sum(x * x for x, _ in xy) / len(xy) - mx * mx)
        r = rows[etype]
        assert r["n_days"] == len(xy)
        assert r["n_pairs"] == n
        assert abs(r["theil_sen_slope"] - med) < 2e-4
        assert abs(r["ols_slope"] - ols) < 2e-4


def test_theil_sen_resists_one_outlier_day(spark):
    # pure-Python property of the estimator the query implements:
    # corrupting ONE day drags OLS but barely moves Theil-Sen
    xy = [(x, 10.0 + 2.0 * x) for x in range(20)]
    xy[10] = (10, 10000.0)
    slopes = sorted(
        (y2 - y1) / (x2 - x1)
        for i, (x1, y1) in enumerate(xy)
        for (x2, y2) in xy[i + 1:]
    )
    n = len(slopes)
    med = (slopes[(n - 1) // 2] + slopes[n // 2]) / 2
    mx = sum(x for x, _ in xy) / len(xy)
    my = sum(y for _, y in xy) / len(xy)
    ols = (sum(x * y for x, y in xy) / len(xy) - mx * my) / (
        sum(x * x for x, _ in xy) / len(xy) - mx * mx
    )
    assert abs(med - 2.0) < 0.5
    assert abs(ols - 2.0) > 5  # least squares got dragged


# ---------------------------------------------------------------------------
# ts_autocorrelation_report
# ---------------------------------------------------------------------------


def test_acf_matches_python_replica(spark):
    series = _daily_series()
    rows = {(r["event_type"], r["lag"]): r for r in
            _q("ts_autocorrelation_report")(spark, SF).collect()}
    for etype, pts in series.items():
        xs = [rev for _, rev in pts]
        m = sum(xs) / len(xs)
        ssq = sum((x - m) ** 2 for x in xs)
        for k in (1, 2, 7):
            num = sum((xs[i] - m) * (xs[i - k] - m) for i in range(k, len(xs)))
            r = rows[(etype, k)]
            assert r["n_pairs"] == len(xs) - k
            assert abs(r["acf"] - num / ssq) < 2e-4
            # |ACF| is bounded by 1 (Cauchy-Schwarz over the overlap)
            assert abs(r["acf"]) <= 1.0 + 1e-9


# ---------------------------------------------------------------------------
# t_normalization_dedup_report
# ---------------------------------------------------------------------------


def test_normalization_dedup_matches_python_replica(spark):
    docs = _aug_docs()

    def h(s: str) -> str:
        return hashlib.md5(s.encode()).hexdigest()

    forms = {
        "raw": [h(t) for _, _, t in docs],
        "head20": [h(" ".join(t.split(" ")[:20])) for _, _, t in docs],
        "word_bag": [
            h(" ".join(sorted(set(t.split(" "))))) for _, _, t in docs
        ],
    }
    rows = {r["form"]: r for r in
            _q("t_normalization_dedup_report")(spark, SF).collect()}
    assert set(rows) == set(forms)
    for form, hashes in forms.items():
        r = rows[form]
        assert r["n_docs"] == len(hashes)
        assert r["n_distinct"] == len(set(hashes))
        assert abs(r["dup_rate"] - (1 - len(set(hashes)) / len(hashes))) < 2e-4
    # canonicalization only ever MERGES classes: raw is the floor
    assert rows["head20"]["dup_rate"] >= rows["raw"]["dup_rate"]
    assert rows["word_bag"]["dup_rate"] >= rows["raw"]["dup_rate"]
    # the injected truncated copies are invisible raw, visible to head20
    assert rows["head20"]["dup_rate"] > rows["raw"]["dup_rate"]
