"""Property-based tests: the as-of join against pandas' reference
implementation, and date-parse round-trips on arbitrary dates."""

from __future__ import annotations

import datetime as dt

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from etl_data_peri_institute_spark.functions.cleaning import fmt_ymd, parse_date_dayfirst
from etl_data_peri_institute_spark.operators.asof import asof_join_backward

# session-scoped spark fixture comes from conftest


@st.composite
def asof_case(draw):
    n_left = draw(st.integers(1, 8))
    n_right = draw(st.integers(0, 8))
    keys = ["a", "b"]
    left = [
        (i, draw(st.sampled_from(keys)), draw(st.integers(0, 50)))
        for i in range(n_left)
    ]
    right = [
        (draw(st.sampled_from(keys)), draw(st.integers(0, 50)), f"v{j}")
        for j in range(n_right)
    ]
    return left, right


@given(asof_case())
@settings(max_examples=15, deadline=None)
def test_asof_matches_pandas_merge_asof(spark, case):
    left_rows, right_rows = case
    left = spark.createDataFrame(left_rows, "id int, k string, t int")
    right = spark.createDataFrame(
        right_rows, "k string, rt int, val string"
    ) if right_rows else spark.createDataFrame([], "k string, rt int, val string")

    got = {
        r["id"]: r["val_asof"]
        for r in asof_join_backward(
            left, right, on="k", left_time="t", right_time="rt", value_cols=["val"]
        ).collect()
    }

    lp = pd.DataFrame(left_rows, columns=["id", "k", "t"]).sort_values("t", kind="stable")
    rp = pd.DataFrame(right_rows, columns=["k", "rt", "val"]).sort_values("rt", kind="stable")
    if len(rp):
        merged = pd.merge_asof(
            lp, rp, left_on="t", right_on="rt", by="k", direction="backward"
        )
        expected = dict(zip(merged["id"], merged["val"]))
        expected = {k: (None if pd.isna(v) else v) for k, v in expected.items()}
    else:
        expected = {r[0]: None for r in left_rows}

    # ties among right rows with identical (k, rt): merge_asof picks the
    # last occurrence; our window picks the last in (t, side) order too,
    # but both are only defined up to that tie — compare only when the
    # right side has unique (k, rt) pairs
    if len(rp) == len(rp.drop_duplicates(["k", "rt"])):
        assert got == expected


DATES = st.dates(min_value=dt.date(1990, 1, 1), max_value=dt.date(2035, 12, 28))


@given(DATES, st.sampled_from(["dd/MM/yyyy", "d/M/yyyy", "dd-MM-yyyy", "yyyy-MM-dd"]))
@settings(max_examples=20, deadline=None)
def test_dayfirst_parse_roundtrip(spark, d, fmt):
    py_fmt = {
        "dd/MM/yyyy": "%d/%m/%Y",
        "d/M/yyyy": "%-d/%-m/%Y",
        "dd-MM-yyyy": "%d-%m-%Y",
        "yyyy-MM-dd": "%Y-%m-%d",
    }[fmt]
    s = d.strftime(py_fmt)
    out = (
        spark.createDataFrame([(s,)], "v string")
        .select(fmt_ymd(parse_date_dayfirst(F.col("v"))).alias("o"))
        .first()["o"]
    )
    assert out == d.isoformat(), f"{s} ({fmt}) -> {out}"


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=3),          # user
            st.integers(min_value=0, max_value=200_000),    # epoch seconds
        ),
        min_size=1,
        max_size=40,
    )
)
@settings(max_examples=15, deadline=None)
def test_sessionize_partition_property(spark, rows):
    """Sessionization invariants for ANY event set: (1) every event is
    assigned exactly one session; (2) consecutive events within a
    session are ≤ gap apart; (3) the first events of adjacent sessions
    are > gap apart."""
    from pyspark.sql import Window as W

    gap = 14400
    df = spark.createDataFrame(
        [(u, i, float(t)) for i, (u, t) in enumerate(rows)],
        "user_id long, event_id long, sec double",
    ).select("user_id", "event_id", F.timestamp_seconds("sec").alias("ts"))

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    g = F.col("ts").cast("double") - F.lag(F.col("ts").cast("double")).over(w)
    new_s = F.when(g.isNull() | (g > gap), 1).otherwise(0)
    run = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    out = df.withColumn("session_id", F.sum(new_s).over(run)).collect()

    assert len(out) == len(rows)  # (1): total preserved
    by_user: dict = {}
    for r in sorted(out, key=lambda r: (r["user_id"], r["ts"], r["event_id"])):
        by_user.setdefault(r["user_id"], []).append(r)
    for evs in by_user.values():
        for a, b in zip(evs, evs[1:]):
            delta = (b["ts"] - a["ts"]).total_seconds()
            if b["session_id"] == a["session_id"]:
                assert delta <= gap  # (2)
            else:
                assert b["session_id"] == a["session_id"] + 1
                assert delta > gap  # (3)


@settings(max_examples=200, deadline=None)
@given(cents=st.integers(min_value=-(10**13), max_value=10**13))
def test_cents_conversion_exact_for_any_sign(cents):
    """The money discipline's core invariant: for ANY cents-exact double
    (positive or negative, up to 10^11 dollars), floor(x*100 + 0.5)
    recovers the exact integer cents — pure Python mirror of the
    identical IEEE ops Spark codegen and DuckDB perform."""
    import math

    x = cents / 100.0  # the cents-exact double as stored in parquet
    assert math.floor(x * 100 + 0.5) == cents


@st.composite
def tiny_corpus(draw):
    """Small random corpora over a tiny vocabulary so shingle overlaps
    actually occur."""
    vocab = ["a", "b", "c", "d", "e"]
    n_docs = draw(st.integers(2, 5))
    docs = []
    for i in range(n_docs):
        n_words = draw(st.integers(3, 10))
        docs.append((i, " ".join(draw(st.sampled_from(vocab)) for _ in range(n_words))))
    return docs


def _ref_shingle_sets(docs):
    out = {}
    for i, text in docs:
        w = text.split(" ")
        out[i] = {" ".join(w[k : k + 3]) for k in range(len(w) - 2)}
    return out


@settings(max_examples=10, deadline=None)
@given(tiny_corpus())
def test_containment_and_jaccard_match_set_reference(spark, docs):
    """Both exact verifiers agree with the pure-Python set computation
    on random corpora, and containment >= jaccard pairwise (the overlap
    coefficient's defining inequality)."""
    from etl_data_peri_institute_spark.operators.dedup import (
        containment_pairs,
        jaccard_pairs,
        word_shingles,
    )

    df = spark.createDataFrame(docs, "doc_id long, text string")
    sh = word_shingles(df)
    got_jac = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in jaccard_pairs(sh, min_jaccard=0.0, max_doc_freq=None).collect()
    }
    got_cont = {
        tuple(sorted((r["subset_id"], r["superset_id"]))): r["containment"]
        for r in containment_pairs(sh, min_containment=0.0, max_doc_freq=None).collect()
    }
    ref = _ref_shingle_sets(docs)
    ids = sorted(ref)
    for x in ids:
        for y in ids:
            if x >= y:
                continue
            inter = len(ref[x] & ref[y])
            if inter == 0:
                assert (x, y) not in got_jac and (x, y) not in got_cont
                continue
            jac = inter / len(ref[x] | ref[y])
            cont = inter / min(len(ref[x]), len(ref[y]))
            assert abs(got_jac[(x, y)] - jac) < 1e-9
            assert abs(got_cont[(x, y)] - cont) < 1e-9
            assert got_cont[(x, y)] >= got_jac[(x, y)] - 1e-12


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.lists(st.floats(-10, 10, allow_nan=False, width=32), min_size=3, max_size=3),
        min_size=2,
        max_size=6,
    )
)
def test_sq_codes_preserve_per_dimension_order(spark, vecs):
    """Scalar quantization is monotone per dimension: if v1[d] <= v2[d]
    then code1[d] <= code2[d] — the property that makes int8 ranking a
    faithful approximation of the float ranking."""
    from etl_data_peri_institute_spark.operators.similarity import sq_int8_codes

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id long, embedding array<float>"
    )
    codes = {r["id"]: r["codes"] for r in sq_int8_codes(df).collect()}
    floats = {i: v for i, v in enumerate(vecs)}
    for a in codes:
        for b in codes:
            for d in range(3):
                if floats[a][d] <= floats[b][d]:
                    assert codes[a][d] <= codes[b][d]


@st.composite
def nearest_case(draw):
    n_left = draw(st.integers(1, 6))
    n_right = draw(st.integers(0, 6))
    left = [(i, "k", draw(st.integers(0, 40))) for i in range(n_left)]
    # unique right timestamps so the reference is unambiguous
    rts = draw(
        st.lists(st.integers(0, 40), min_size=n_right, max_size=n_right, unique=True)
    )
    right = [("k", rt, f"v{rt}") for rt in rts]
    return left, right


@given(nearest_case())
@settings(max_examples=15, deadline=None)
def test_asof_nearest_matches_bruteforce(spark, case):
    from etl_data_peri_institute_spark.operators.asof import asof_join_nearest

    left_rows, right_rows = case
    left = spark.createDataFrame(left_rows, "id int, k string, t int")
    right = (
        spark.createDataFrame(right_rows, "k string, rt int, val string")
        if right_rows
        else spark.createDataFrame([], "k string, rt int, val string")
    )
    got = {
        r["id"]: r["val_nearest"]
        for r in asof_join_nearest(
            left, right, on="k", left_time="t", right_time="rt", value_cols=["val"]
        ).collect()
    }
    for i, _, t in left_rows:
        if not right_rows:
            assert got[i] is None
            continue
        # nearest by |delta|; ties go backward (at-or-before wins)
        best = min(right_rows, key=lambda r: (abs(r[1] - t), r[1] > t))
        assert got[i] == best[2], (t, right_rows, got[i])


@st.composite
def small_graph(draw):
    n = draw(st.integers(2, 8))
    possible = [(a, b) for a in range(n) for b in range(a + 1, n)]
    edges = draw(st.lists(st.sampled_from(possible), max_size=14, unique=True))
    return edges


@given(small_graph(), st.integers(1, 3))
@settings(max_examples=15, deadline=None)
def test_kcore_matches_python_peel(spark, edges, k):
    import collections

    from etl_data_peri_institute_spark.operators.graph import kcore_peel

    if not edges:
        return
    df = spark.createDataFrame(edges, "src int, dst int")
    got = {r["node"]: r["degree"] for r in kcore_peel(df, k=k, rounds=10).collect()}

    es = set(edges)
    while True:
        deg = collections.Counter()
        for a, b in es:
            deg[a] += 1
            deg[b] += 1
        drop = {n for n, d in deg.items() if d < k}
        if not drop:
            break
        es = {(a, b) for a, b in es if a not in drop and b not in drop}
    ref = collections.Counter()
    for a, b in es:
        ref[a] += 1
        ref[b] += 1
    assert got == dict(ref)


@given(small_graph())
@settings(max_examples=15, deadline=None)
def test_triangle_counts_match_bruteforce(spark, edges):
    from itertools import combinations

    from etl_data_peri_institute_spark.operators.graph import triangle_counts

    if not edges:
        return
    df = spark.createDataFrame(edges, "src int, dst int")
    got = {r["node"]: r["n_triangles"] for r in triangle_counts(df).collect()}

    es = set(edges)
    nodes = {x for e in edges for x in e}
    ref: dict[int, int] = {}
    for a, b, c in combinations(sorted(nodes), 3):
        if (a, b) in es and (b, c) in es and (a, c) in es:
            for x in (a, b, c):
                ref[x] = ref.get(x, 0) + 1
    assert got == ref


@given(asof_case(), st.integers(0, 20))
@settings(max_examples=15, deadline=None)
def test_asof_tolerance_matches_pandas(spark, case, tol):
    from etl_data_peri_institute_spark.operators.asof import asof_join_tolerance

    left_rows, right_rows = case
    left = spark.createDataFrame(left_rows, "id int, k string, t int")
    right = spark.createDataFrame(
        right_rows, "k string, rt int, val string"
    ) if right_rows else spark.createDataFrame([], "k string, rt int, val string")

    out = asof_join_tolerance(
        left, right, on="k", left_time="t", right_time="rt",
        value_cols=["val"], tolerance_s=tol,
    ).collect()
    got = {r["id"]: r["val_asof"] for r in out}

    lp = pd.DataFrame(left_rows, columns=["id", "k", "t"]).sort_values("t", kind="stable")
    rp = pd.DataFrame(right_rows, columns=["k", "rt", "val"]).sort_values("rt", kind="stable")
    if len(rp):
        merged = pd.merge_asof(
            lp, rp, left_on="t", right_on="rt", by="k",
            direction="backward", tolerance=tol,
        )
        expected = dict(zip(merged["id"], merged["val"]))
        expected = {k: (None if pd.isna(v) else v) for k, v in expected.items()}
    else:
        expected = {r[0]: None for r in left_rows}

    # same tie caveat as the backward test: only compare when (k, rt)
    # pairs are unique on the right
    if len(rp) == len(rp.drop_duplicates(["k", "rt"])):
        assert got == expected, (left_rows, right_rows, tol)


@st.composite
def waterline_case(draw):
    n = draw(st.integers(2, 12))
    tokens = [draw(st.integers(1, 10_000)) for _ in range(n)]
    frac = draw(st.sampled_from([0.1, 0.25, 0.5, 0.75, 0.9]))
    return tokens, frac


@given(waterline_case())
@settings(max_examples=12, deadline=None)
def test_waterline_closed_form_matches_bisection(spark, case):
    """The water-filling closed form (sorted prefix sums, j* pick) must
    agree with a brute-force bisection of f(c) = sum(min(t, c)) on
    arbitrary distributions — budget exactness and per-source
    allocations both."""
    from etl_data_peri_institute_spark.plans.curation import waterline_allocate

    tokens, frac = case
    rows = [(f"s{i:02d}", t) for i, t in enumerate(tokens)]
    tot = spark.createDataFrame(rows, "source string, t long")
    out = {r["source"]: r for r in waterline_allocate(tot, frac).collect()}

    budget = int(sum(tokens) * frac)  # floor, as the operator computes
    # bisection reference on f(c) = sum(min(t, c))
    lo, hi = 0.0, float(max(tokens))
    for _ in range(80):
        mid = (lo + hi) / 2
        if sum(min(t, mid) for t in tokens) < budget:
            lo = mid
        else:
            hi = mid
    c_ref = (lo + hi) / 2

    total_alloc = sum(r["allocated"] for r in out.values())
    assert abs(total_alloc - budget) <= 0.01 * len(tokens) + 1e-6
    for (src, t) in rows:
        r = out[src]
        assert abs(r["allocated"] - round(min(t, c_ref), 2)) <= 0.05, (
            src, t, c_ref, r["allocated"])
        assert r["budget"] == budget
