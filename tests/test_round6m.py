"""Round-6 continuation batch 12: preference pairs, tokenizer
fertility, curriculum schedule. Pure-Python replicas + the defining
invariants of each construction."""

from __future__ import annotations

import math
import re
from collections import defaultdict
from decimal import ROUND_HALF_UP, Decimal

import duckdb

from etl_data_peri_institute_spark.plans import catalog

SF = "/root/testdata/sf0.001"


def _r4(x):
    """Half-up 4-digit rounding (Spark/DuckDB convention; Python's
    built-in round is half-even, which differs exactly on power-of-two
    denominators like 13/32)."""
    return float(
        Decimal(repr(x)).quantize(Decimal("0.0001"), rounding=ROUND_HALF_UP)
    )

_STOP = {"the", "a", "of", "and", "to", "in"}


def _q(name):
    catalog.load_all()
    return catalog.QUERIES[name].fn


def _docs():
    return duckdb.sql(
        f"SELECT doc_id, text, lang, source, n_chars "
        f"FROM '{SF}/documents.parquet'"
    ).fetchall()


# ---------------------------------------------------------------------------
# b_preference_pairs
# ---------------------------------------------------------------------------


def test_preference_pairs_match_python_replica(spark):
    by_source = defaultdict(list)
    for doc_id, text, lang, source, n_chars in _docs():
        words = text.split(" ")
        score = _r4(len(set(words)) / len(words))
        by_source[source].append((doc_id, score))
    expected = {}
    for source, docs in by_source.items():
        top = sorted(docs, key=lambda d: (-d[1], d[0]))
        bot = sorted(docs, key=lambda d: (d[1], -d[0]))
        for i in range(len(docs) // 2):
            expected[(source, i + 1)] = (
                top[i][0], bot[i][0], top[i][1], bot[i][1],
                _r4(top[i][1] - bot[i][1]),
            )
    rows = _q("b_preference_pairs")(spark, SF).collect()
    assert len(rows) == len(expected)
    for r in rows:
        e = expected[(r["source"], r["pair_rank"])]
        got = (r["chosen_doc"], r["rejected_doc"], r["chosen_score"],
               r["rejected_score"], r["score_gap"])
        assert got == e
        # defining invariants: gap >= 0, chosen != rejected, and gaps
        # shrink (weakly) as pair_rank grows within a source
        assert r["score_gap"] >= 0
        assert r["chosen_doc"] != r["rejected_doc"]
    by_src = defaultdict(list)
    for r in sorted(rows, key=lambda r: (r["source"], r["pair_rank"])):
        by_src[r["source"]].append(r["score_gap"])
    for gaps in by_src.values():
        assert all(a >= b - 1e-9 for a, b in zip(gaps, gaps[1:]))


# ---------------------------------------------------------------------------
# t_tokenizer_fertility
# ---------------------------------------------------------------------------


def test_tokenizer_fertility_matches_python_replica(spark):
    agg = defaultdict(lambda: [0, 0, 0, 0])  # docs, words, tokens, bytes
    for doc_id, text, lang, source, n_chars in _docs():
        a = agg[lang]
        a[0] += 1
        a[1] += len(text.split(" "))
        a[2] += len(re.findall(r"[a-z0-9]+", text))
        a[3] += n_chars
    rows = {r["lang"]: r for r in
            _q("t_tokenizer_fertility")(spark, SF).collect()}
    assert set(rows) == set(agg)
    for lang, (nd, nw, nt, nb) in agg.items():
        r = rows[lang]
        assert (r["n_docs"], r["n_words"], r["n_tokens"], r["n_bytes"]) \
            == (nd, nw, nt, nb)
        assert math.isclose(r["fertility"], round(nt / nw, 4))
        assert math.isclose(r["bytes_per_token"], round(nb / nt, 4))
        # regex tokens never exceed characters; fertility is positive
        assert 0 < r["fertility"]
        assert r["n_tokens"] <= r["n_bytes"]


# ---------------------------------------------------------------------------
# b_curriculum_schedule
# ---------------------------------------------------------------------------


def test_curriculum_schedule_matches_python_replica(spark):
    tiers = defaultdict(lambda: [0, 0])  # n_docs, tokens
    for doc_id, text, lang, source, n_chars in _docs():
        words = text.split(" ")
        n = len(words)
        awl = round(sum(len(w) for w in words) / n, 4)
        sw = round(sum(w in _STOP for w in words) / n, 4)
        dr = round(len(set(words)) / n, 4)
        tier = ((n >= 50) + (sw >= 0.02) + (dr >= 0.1)
                + (3.0 <= awl <= 10.0))
        tiers[tier][0] += 1
        tiers[tier][1] += n
    total = sum(t for _, t in tiers.values())
    expected = []
    cum = 0
    for rank, tier in enumerate(sorted(tiers, reverse=True), start=1):
        nd, tok = tiers[tier]
        cum += tok
        expected.append((rank, tier, nd, tok, cum, round(cum / total, 4)))
    rows = [
        (r["stage_rank"], r["quality_tier"], r["n_docs"],
         r["stage_tokens"], r["cum_tokens"], r["cum_token_frac"])
        for r in _q("b_curriculum_schedule")(spark, SF).collect()
    ]
    assert rows == expected
    # schedule invariants: ranks contiguous from 1, tiers strictly
    # decreasing, cumulative fraction ends at exactly 1.0
    assert [r[0] for r in rows] == list(range(1, len(rows) + 1))
    qt = [r[1] for r in rows]
    assert all(a > b for a, b in zip(qt, qt[1:]))
    assert rows[-1][5] == 1.0
