"""Round-6 continuation batch 13: dup-cluster size distribution, vocab
coverage curve, BH FDR, embedding QA. Pure-Python replicas + each
procedure's defining invariants."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict
from decimal import ROUND_HALF_UP, Decimal

import duckdb

from etl_data_peri_institute_spark.plans import catalog

SF = "/root/testdata/sf0.001"


def _r(x, nd=4):
    return float(
        Decimal(repr(x)).quantize(
            Decimal("0." + "0" * (nd - 1) + "1"), rounding=ROUND_HALF_UP
        )
    )


def _q(name):
    catalog.load_all()
    return catalog.QUERIES[name].fn


# ---------------------------------------------------------------------------
# d_dup_cluster_size_dist
# ---------------------------------------------------------------------------


def test_dup_cluster_size_dist_matches_python_replica(spark):
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF}/documents.parquet'"
    ).fetchall()
    texts = [t for _, t in docs]
    # replicate the round6h augmentation: exact copies of doc_id < 50,
    # 70%-truncations of doc_id < 50
    for doc_id, t in docs:
        if doc_id < 50:
            texts.append(t)
            words = t.split(" ")
            texts.append(" ".join(words[: math.ceil(len(words) * 0.7)]))
    sizes = Counter(
        Counter(
            hashlib.md5(t.encode()).hexdigest() for t in texts
        ).values()
    )
    total = len(texts)
    rows = _q("d_dup_cluster_size_dist")(spark, SF).collect()
    assert {r["cluster_size"]: r["n_clusters"] for r in rows} == dict(sizes)
    for r in rows:
        nc = sizes[r["cluster_size"]]
        assert r["n_docs"] == r["cluster_size"] * nc
        assert r["n_redundant"] == (r["cluster_size"] - 1) * nc
        assert r["doc_share"] == _r(r["n_docs"] / total)
    # accounting identities: doc counts reassemble the corpus, and
    # redundant docs equal what keep-one dedup would delete
    assert sum(r["n_docs"] for r in rows) == total
    n_clusters_total = sum(r["n_clusters"] for r in rows)
    assert sum(r["n_redundant"] for r in rows) == total - n_clusters_total
    # the augmentation guarantees multi-doc clusters exist
    assert any(r["cluster_size"] >= 2 for r in rows)


# ---------------------------------------------------------------------------
# t_vocab_coverage_curve
# ---------------------------------------------------------------------------


def test_vocab_coverage_curve_matches_python_replica(spark):
    texts = duckdb.sql(
        f"SELECT text FROM '{SF}/documents.parquet'"
    ).fetchall()
    freq = Counter()
    for (t,) in texts:
        freq.update(t.split(" "))
    ordered = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))
    total = sum(freq.values())
    rows = {r["vocab_cutoff"]: r for r in
            _q("t_vocab_coverage_curve")(spark, SF).collect()}
    assert set(rows) == {100, 1000, 10000}
    prev_cov = 0.0
    for k in (100, 1000, 10000):
        mass = sum(c for _, c in ordered[:k])
        r = rows[k]
        assert r["vocab_used"] == min(k, len(ordered))
        assert r["coverage"] == _r(mass / total)
        assert r["oov_rate"] == _r(1 - mass / total)
        # coverage is monotone in k and bounded by 1
        assert prev_cov <= r["coverage"] <= 1.0
        prev_cov = r["coverage"]


# ---------------------------------------------------------------------------
# a_bh_fdr
# ---------------------------------------------------------------------------


def test_bh_fdr_matches_python_replica(spark):
    evs = duckdb.sql(
        f"SELECT event_type, dayofweek(ts) IN (0, 6) AS we, value "
        f"FROM '{SF}/events.parquet'"
    ).fetchall()
    groups = defaultdict(lambda: defaultdict(list))
    for et, we, v in evs:
        groups[et][bool(we)].append(v)
    ps = []
    for et, arms in groups.items():
        a, b = arms[True], arms[False]
        ma, mb = sum(a) / len(a), sum(b) / len(b)
        va = sum((x - ma) ** 2 for x in a) / (len(a) - 1)
        vb = sum((x - mb) ** 2 for x in b) / (len(b) - 1)
        z = _r((ma - mb) / math.sqrt(va / len(a) + vb / len(b)), 6)
        p = _r(2 * (1 - 1 / (1 + math.exp(-1.702 * abs(z)))), 6)
        ps.append((et, _r(z, 3), p))
    ps.sort(key=lambda t: (t[2], t[0]))
    m = len(ps)
    k = max(
        (i + 1 for i, (_, _, p) in enumerate(ps)
         if p <= (i + 1) * 0.05 / m),
        default=0,
    )
    rows = _q("a_bh_fdr")(spark, SF).collect()
    assert len(rows) == m
    for i, r in enumerate(rows):
        et, zs, p = ps[i]
        assert r["event_type"] == et
        assert abs(r["z_stat"] - zs) <= 2e-3  # variance algo ulp slack
        assert abs(r["p_value"] - p) <= 2e-4
        assert r["p_rank"] == i + 1
        assert r["bh_threshold"] == _r((i + 1) * 0.05 / m, 6)
        assert r["rejected"] == (i + 1 <= k)
    # step-up property: the rejection set is a prefix of the p-ranking
    rej = [r["rejected"] for r in rows]
    assert rej == sorted(rej, reverse=True)


# ---------------------------------------------------------------------------
# e_embedding_qa_report
# ---------------------------------------------------------------------------


def test_embedding_qa_matches_python_replica(spark):
    vecs = duckdb.sql(
        f"SELECT label, embedding FROM '{SF}/embeddings.parquet'"
    ).fetchall()
    agg = defaultdict(list)
    for label, emb in vecs:
        agg[label].append(emb)
    rows = {r["label"]: r for r in
            _q("e_embedding_qa_report")(spark, SF).collect()}
    assert set(rows) == set(agg)
    for label, embs in agg.items():
        norms = [math.sqrt(sum(float(x) * float(x) for x in e))
                 for e in embs]
        r = rows[label]
        assert r["n_vecs"] == len(embs)
        assert r["n_dims_seen"] == len({len(e) for e in embs})
        assert r["dim"] == max(len(e) for e in embs)
        assert abs(r["avg_norm"] - sum(norms) / len(norms)) < 1e-3
        assert abs(r["min_norm"] - min(norms)) < 1e-3
        assert abs(r["max_norm"] - max(norms)) < 1e-3
        assert r["n_zero_vecs"] == sum(n == 0 for n in norms)
        # QA invariants the synthetic embeddings must satisfy
        assert r["n_dims_seen"] == 1
        assert r["min_norm"] <= r["avg_norm"] <= r["max_norm"]


def test_vocab_curve_distributed_rank_identical_to_window(spark):
    """The wired crossover (round 7): the distributed row-number path
    must emit EXACTLY the window path's rows — same ranks, same folds,
    same rounding."""
    window = _q("t_vocab_coverage_curve")(spark, SF).collect()
    dist = _q("t_vocab_coverage_curve_production")(spark, SF).collect()
    assert [tuple(r) for r in window] == [tuple(r) for r in dist]


def test_vocab_curve_auto_switch_threshold(spark):
    """Below the doc-count threshold the gate form plans a window rank
    (single Exchange to one partition); the production twin plans the
    range-partitioned mapInPandas row-number instead."""
    from etl_data_peri_institute_spark.plans import textops as m

    gate_plan = _q("t_vocab_coverage_curve")(spark, SF)._jdf.queryExecution().toString()
    prod_plan = _q("t_vocab_coverage_curve_production")(spark, SF)._jdf.queryExecution().toString()
    assert "row_number()" in gate_plan.lower() or "RunningWindowFunction" in gate_plan
    # the distributed path localCheckpoints (plan truncates to an
    # ExistingRDD scan carrying the partition-id/offset merge columns)
    assert "__pid" in prod_plan and "ExistingRDD" in prod_plan
    assert "row_number()" not in prod_plan.lower()
    assert m._VOCAB_DISTRIBUTED_MIN_DOCS > 1_000_000
