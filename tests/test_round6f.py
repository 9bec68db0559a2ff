"""Round-6 continuation batch 5: LPA communities, RAG chunk manifest,
session path mining, column entropy. Pure-Python replicas over the
sf0.001 tables (independent of the DuckDB oracles) + structural
invariants (chunk coverage/overlap, community partition)."""

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


# ---------------------------------------------------------------------------
# g_label_propagation
# ---------------------------------------------------------------------------


def _lpa_reference() -> Counter:
    ps = duckdb.sql(
        f"SELECT DISTINCT l_partkey, l_suppkey FROM '{SF}/lineitem.parquet'"
    ).fetchall()
    by_part = defaultdict(list)
    for p, s in ps:
        by_part[p].append(s)
    pair_w: Counter = Counter()
    for sups in by_part.values():
        sups.sort()
        for i, s1 in enumerate(sups):
            for s2 in sups[i + 1:]:
                pair_w[(s1, s2)] += 1
    top = sorted(pair_w.items(), key=lambda kv: (-kv[1], kv[0]))[:500]
    nbrs = defaultdict(list)
    for (s1, s2), _ in top:
        nbrs[s1].append(s2)
        nbrs[s2].append(s1)
    labels = {n: n for n in nbrs}
    for _ in range(2):
        new = {}
        for n, ns in nbrs.items():
            cnt: Counter = Counter(labels[u] for u in ns)
            best = max(cnt.items(), key=lambda kv: (kv[1], -kv[0]))
            # most frequent, min label on ties
            top_c = best[1]
            new[n] = min(l for l, c in cnt.items() if c == top_c)
        labels = new
    return Counter(labels.values())


def test_label_propagation_matches_python_replica(spark):
    sizes = _lpa_reference()
    expected = sorted(sizes.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    rows = _q("g_label_propagation")(spark, SF).collect()
    assert [(r["label"], r["n_members"]) for r in rows] == expected
    # communities partition the node set: sizes sum to node count
    assert sum(sizes.values()) == len(set().union(
        *[{a, b} for (a, b) in _edges_top500()]
    ))


def _edges_top500():
    ps = duckdb.sql(
        f"SELECT DISTINCT l_partkey, l_suppkey FROM '{SF}/lineitem.parquet'"
    ).fetchall()
    by_part = defaultdict(list)
    for p, s in ps:
        by_part[p].append(s)
    pair_w: Counter = Counter()
    for sups in by_part.values():
        sups.sort()
        for i, s1 in enumerate(sups):
            for s2 in sups[i + 1:]:
                pair_w[(s1, s2)] += 1
    return [e for e, _ in sorted(pair_w.items(), key=lambda kv: (-kv[1], kv[0]))[:500]]


# ---------------------------------------------------------------------------
# t_rag_chunk_manifest
# ---------------------------------------------------------------------------

_W, _STRIDE = 32, 24


def test_rag_chunks_match_python_replica_and_cover_text(spark):
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF}/documents.parquet'"
    ).fetchall()
    expected = []
    for doc_id, text in docs:
        words = text.split(" ")
        n = len(words)
        n_chunks = 1 + math.ceil(max(n - _W, 0) / _STRIDE)
        covered = set()
        for i in range(1, n_chunks + 1):
            start = 1 + (i - 1) * _STRIDE
            cw = words[start - 1 : start - 1 + _W]
            if not cw:
                continue
            covered.update(range(start, start + len(cw)))
            expected.append(
                (doc_id, i, start, len(cw),
                 hashlib.md5(" ".join(cw).encode()).hexdigest())
            )
        # every word position is inside at least one chunk
        assert covered == set(range(1, n + 1))
    rows = _q("t_rag_chunk_manifest")(spark, SF).collect()
    got = [
        (r["doc_id"], r["chunk_idx"], r["start_word"], r["n_words"], r["chunk_hash"])
        for r in rows
    ]
    assert sorted(got) == sorted(expected)


def test_rag_chunks_overlap_by_window_minus_stride(spark):
    rows = _q("t_rag_chunk_manifest")(spark, SF).collect()
    by_doc = defaultdict(list)
    for r in rows:
        by_doc[r["doc_id"]].append((r["chunk_idx"], r["start_word"], r["n_words"]))
    for chunks in by_doc.values():
        chunks.sort()
        for (_, s1, n1), (_, s2, _) in zip(chunks, chunks[1:]):
            # consecutive chunks overlap by W - stride words when full
            assert s2 - s1 == _STRIDE
            assert s1 + n1 - s2 == _W - _STRIDE or n1 < _W


# ---------------------------------------------------------------------------
# b_session_path_topk
# ---------------------------------------------------------------------------


def test_session_paths_match_python_replica(spark):
    evs = duckdb.sql(
        f"SELECT user_id, ts, event_id, event_type FROM '{SF}/events.parquet'"
    ).fetchall()
    per_user = defaultdict(list)
    for user_id, ts, event_id, etype in evs:
        per_user[user_id].append((ts, event_id, etype))
    paths: Counter = Counter()
    for seq in per_user.values():
        seq.sort()
        cur, last_ts = [], None
        for ts, _, etype in seq:
            if last_ts is not None and (ts - last_ts).total_seconds() > 14400:
                paths[">".join(cur)] += 1
                cur = []
            cur.append(etype)
            last_ts = ts
        if cur:
            paths[">".join(cur)] += 1
    expected = sorted(paths.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    rows = _q("b_session_path_topk")(spark, SF).collect()
    assert [(r["path"], r["n_sessions"]) for r in rows] == expected


# ---------------------------------------------------------------------------
# a_column_entropy_report
# ---------------------------------------------------------------------------


def test_column_entropy_matches_python_replica(spark):
    specs = {
        "events.event_type": ("events", "event_type"),
        "documents.lang": ("documents", "lang"),
        "documents.source": ("documents", "source"),
        "orders.o_orderstatus": ("orders", "o_orderstatus"),
    }
    rows = {r["column_name"]: r for r in
            _q("a_column_entropy_report")(spark, SF).collect()}
    assert set(rows) == set(specs)
    for name, (table, col) in specs.items():
        counts = Counter(
            v for (v,) in duckdb.sql(
                f"SELECT {col} FROM '{SF}/{table}.parquet'"
            ).fetchall()
        )
        n = sum(counts.values())
        h = -sum(c / n * math.log2(c / n) for c in counts.values())
        r = rows[name]
        assert r["n_distinct"] == len(counts)
        assert abs(r["entropy_bits"] - h) < 2e-4
        # entropy is bounded by log2(n_distinct)
        assert r["entropy_bits"] <= math.log2(len(counts)) + 1e-9
