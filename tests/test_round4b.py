"""Unit tests for the driver-round-4 operators: triangle counting on a
known graph, EWMA arithmetic, bootstrap determinism, SemDeDup keeper
invariants, band-join symmetry with the exact predicate."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_triangle_counts_k4(spark):
    """Complete graph on 4 nodes: C(4,3)=4 triangles; every node sits in
    C(3,2)=3 of them. Input edges oriented low-id-first."""
    from etl_data_peri_institute_spark.operators.graph import triangle_counts

    edges = spark.createDataFrame(
        [(a, b) for a in range(4) for b in range(a + 1, 4)], "src int, dst int"
    )
    out = {r["node"]: r["n_triangles"] for r in triangle_counts(edges).collect()}
    assert out == {0: 3, 1: 3, 2: 3, 3: 3}


def test_triangle_counts_path_has_none(spark):
    from etl_data_peri_institute_spark.operators.graph import triangle_counts

    path = spark.createDataFrame([(0, 1), (1, 2), (2, 3)], "src int, dst int")
    assert triangle_counts(path).count() == 0


def test_ewma_constant_series_is_constant(spark, tmp_path):
    """EWMA of a constant series equals the constant regardless of span
    position — pins the weight normalization."""
    from etl_data_peri_institute_spark.plans.catalog import QUERIES, load_all

    load_all()
    # build a miniature events parquet with one user, constant value
    import datetime

    rows = [
        (i, datetime.datetime(2024, 1, 1, 0, i), 1, "view", 7.5, "{}")
        for i in range(12)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    d = str(tmp_path / "sf")
    df.write.parquet(f"{d}/events.parquet")
    out = QUERIES["ts_ewma"].fn(spark, d).collect()
    assert len(out) == 12
    assert all(abs(r["ewma"] - 7.5) < 1e-9 for r in out)


def test_bootstrap_ci_deterministic_across_runs(spark):
    from etl_data_peri_institute_spark.plans.catalog import QUERIES, load_all

    load_all()
    sf = "/root/testdata/sf0.001"
    r1 = QUERIES["b_bootstrap_ci"].fn(spark, sf).collect()[0]
    r2 = QUERIES["b_bootstrap_ci"].fn(spark, sf).collect()[0]
    assert r1 == r2
    assert r1["ci_low"] <= r1["ci_median"] <= r1["ci_high"]
    assert r1["n_resamples"] == 16


def test_semdedup_keeper_is_cluster_member(spark):
    from etl_data_peri_institute_spark.plans.catalog import QUERIES, load_all
    from etl_data_peri_institute_spark.sources.tables import load_table

    load_all()
    sf = "/root/testdata/sf0.001"
    out = QUERIES["d_semdedup_prune"].fn(spark, sf).collect()
    emb = {
        (r["label"], r["vec_id"])
        for r in load_table(spark, sf, "embeddings").select("label", "vec_id").collect()
    }
    for r in out:
        assert (r["label"], r["keeper_id"]) in emb
        assert 0 <= r["n_pruned"] <= r["n_members"] - 1


def test_band_join_counts_match_naive(spark, tmp_path):
    """The bucketed band join must equal the naive inequality join on a
    small fixture — including events exactly at the +/-5 min boundary."""
    import datetime

    base = datetime.datetime(2024, 1, 1, 12, 0, 0)

    def t(sec):
        return base + datetime.timedelta(seconds=sec)

    rows = [
        (0, t(0), 1, "error", 0.0, "{}"),
        (1, t(-300), 1, "click", 0.0, "{}"),   # exactly -5 min → included
        (2, t(300), 1, "click", 0.0, "{}"),    # exactly +5 min → included
        (3, t(301), 1, "click", 0.0, "{}"),    # just outside
        (4, t(100), 2, "click", 0.0, "{}"),    # other user
        (5, t(200), 1, "view", 0.0, "{}"),     # other type
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    d = str(tmp_path / "sf")
    df.write.parquet(f"{d}/events.parquet")
    from etl_data_peri_institute_spark.plans.catalog import QUERIES, load_all

    load_all()
    out = {r["event_id"]: r["n_nearby_clicks"] for r in QUERIES["j_band_join"].fn(spark, d).collect()}
    assert out == {0: 2}


def test_delete_rows_gdpr_forget(spark, tmp_path):
    """Targeted deletion: removes exactly the requested keys, preserves
    hive partition layout, returns the removed count, and is a no-op for
    absent keys/tables."""
    from etl_data_peri_institute_spark.sinks import ParquetStore

    store = ParquetStore(spark, str(tmp_path / "db"))
    df = spark.createDataFrame(
        [(u, f"2024-01-0{1 + u % 2}", u * 10) for u in range(6)],
        "user_id int, dt string, v int",
    )
    store.insert(df, "t", partition_by=["dt"])
    forget = spark.createDataFrame([(1,), (3,), (99,)], "user_id int")
    assert store.delete_rows("t", "user_id", forget) == 2
    left = {r["user_id"] for r in store.read("t").collect()}
    assert left == {0, 2, 4, 5}
    assert store._detect_partition_cols("t") == ["dt"]  # layout preserved
    # idempotent: second run removes nothing
    assert store.delete_rows("t", "user_id", forget) == 0
    assert store.delete_rows("missing", "user_id", forget) == 0


def _write_events(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    d = str(tmp_path / "sf")
    df.write.mode("overwrite").parquet(f"{d}/events.parquet")
    return d


def test_ks_drift_bounds(spark, tmp_path):
    """Identical baseline/current distributions → KS 0; disjoint → 1."""
    import datetime

    before = datetime.datetime(2024, 1, 10)
    after = datetime.datetime(2024, 1, 20)
    rows = []
    # type 'same': identical values both periods → ks 0
    for i in range(20):
        rows.append((i, before, 1, "same", float(i % 5), "{}"))
        rows.append((100 + i, after, 1, "same", float(i % 5), "{}"))
    # type 'shift': disjoint supports → ks 1
    for i in range(20):
        rows.append((200 + i, before, 1, "shift", 1.0 + (i % 3), "{}"))
        rows.append((300 + i, after, 1, "shift", 100.0 + (i % 3), "{}"))
    d = _write_events(spark, tmp_path, rows)
    from etl_data_peri_institute_spark.plans.catalog import QUERIES, load_all

    load_all()
    out = {r["event_type"]: r["ks_stat"] for r in QUERIES["a_ks_drift"].fn(spark, d).collect()}
    assert out["same"] == 0.0
    assert out["shift"] == 1.0


def test_psi_drift_zero_for_identical(spark, tmp_path):
    import datetime

    before = datetime.datetime(2024, 1, 10)
    after = datetime.datetime(2024, 1, 20)
    rows = []
    for i in range(30):
        rows.append((i, before, 1, "x", float(i * 7 % 400), "{}"))
        rows.append((100 + i, after, 1, "x", float(i * 7 % 400), "{}"))
    d = _write_events(spark, tmp_path, rows)
    from etl_data_peri_institute_spark.plans.catalog import QUERIES, load_all

    load_all()
    out = QUERIES["a_psi_drift"].fn(spark, d).collect()
    assert out[0]["psi"] == 0.0


def test_url_canonical_groups_unify_variants(spark):
    """Every dup group found must have 2-4 variants (the 4 deterministic
    spellings of one logical URL) and keeper = min doc id in group."""
    from etl_data_peri_institute_spark.plans.catalog import QUERIES, load_all

    load_all()
    out = QUERIES["t_url_canonical_dedup"].fn(spark, "/root/testdata/sf0.001").collect()
    assert out, "expected dup groups"
    for r in out:
        assert 2 <= r["n_variants"] <= 4
        assert r["canonical_url"].startswith("https://cdn")
        assert "utm" not in r["canonical_url"] and ":443" not in r["canonical_url"]


def test_kcore_fixpoint_and_invariants(spark):
    """The gate's fixed 4-round peel must have CONVERGED at the tested
    SFs (a further round removes nothing) and every survivor keeps
    degree >= k within the core."""
    from etl_data_peri_institute_spark.operators.graph import kcore_peel
    from etl_data_peri_institute_spark.plans.graphs import (
        _KCORE_K,
        _KCORE_ROUNDS,
    )
    from etl_data_peri_institute_spark.plans.catalog import QUERIES, load_all

    load_all()
    out = QUERIES["g_kcore_decomposition"].fn(spark, "/root/testdata/sf0.001").collect()
    assert out and all(r["degree"] >= _KCORE_K for r in out)

    # fixpoint: peel one MORE round over the same graph → identical core
    from pyspark.sql import functions as F
    from etl_data_peri_institute_spark.sources.tables import load_table
    from pyspark.sql import Window as W

    from etl_data_peri_institute_spark.plans.graphs import _KCORE_EDGE_FACTOR

    li = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    ps = li.select(F.col("l_partkey").alias("p"), F.col("l_suppkey").alias("s")).distinct()
    ns = ps.agg(F.count_distinct("s").alias("n"))
    a, b = ps.alias("a"), ps.alias("b")
    w = (
        a.join(b, (F.col("a.p") == F.col("b.p")) & (F.col("a.s") < F.col("b.s")))
        .groupBy(F.col("a.s").alias("s1"), F.col("b.s").alias("s2"))
        .agg(F.count("*").alias("c"))
    )
    e = (
        w.withColumn("rn", F.row_number().over(W.orderBy(F.col("c").desc(), "s1", "s2")))
        .crossJoin(F.broadcast(ns))
        .filter(F.col("rn") <= _KCORE_EDGE_FACTOR * F.col("n"))
        .select(F.col("s1").alias("src"), F.col("s2").alias("dst"))
    )
    more = kcore_peel(e, k=_KCORE_K, rounds=_KCORE_ROUNDS + 1).collect()
    assert sorted(map(tuple, more)) == sorted((r["node"], r["degree"]) for r in out)


def test_kcore_peels_tail_nodes(spark):
    """Hand graph: a K5 core with a pendant chain — the chain peels
    away, the clique survives with degree 4."""
    from etl_data_peri_institute_spark.operators.graph import kcore_peel

    k5 = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    chain = [(4, 10), (10, 11)]
    edges = spark.createDataFrame(k5 + chain, "src int, dst int")
    out = {r["node"]: r["degree"] for r in kcore_peel(edges, k=4, rounds=3).collect()}
    assert out == {0: 4, 1: 4, 2: 4, 3: 4, 4: 4}
