"""Unit tests for the dedup/similarity operator APIs on tiny inputs with
hand-checkable answers."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_data_peri_institute_spark.operators.components import connected_components
from etl_data_peri_institute_spark.operators.dedup import (
    exact_dedup,
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_signatures,
    word_shingles,
)
from etl_data_peri_institute_spark.operators.similarity import (
    cosine,
    knn_bruteforce,
)


def test_word_shingles(spark):
    df = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    sh = {r["sh"] for r in word_shingles(df).collect()}
    assert sh == {"a b c", "b c d"}
    # too-short docs produce no shingles
    short = spark.createDataFrame([(2, "a b")], "doc_id long, text string")
    assert word_shingles(short).count() == 0


def test_minhash_identical_docs_share_signature(spark):
    df = spark.createDataFrame(
        [(1, "x y z w v u"), (2, "x y z w v u"), (3, "p q r s t u")],
        "doc_id long, text string",
    )
    sigs = {r["id"]: tuple(r)[1:] for r in minhash_signatures(word_shingles(df)).collect()}
    assert sigs[1] == sigs[2]
    assert sigs[1] != sigs[3]


def test_lsh_pairs_identical_docs(spark):
    df = spark.createDataFrame(
        [(1, "x y z w v u"), (2, "x y z w v u"), (3, "a b c d e f")],
        "doc_id long, text string",
    )
    pairs = {
        (r["id_a"], r["id_b"])
        for r in lsh_candidate_pairs(minhash_signatures(word_shingles(df))).collect()
    }
    assert pairs == {(1, 2)}


def test_jaccard_exact_value(spark):
    # doc1: shingles {a b c, b c d}; doc2: {b c d, c d e} → J = 1/3
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "b c d e")], "doc_id long, text string"
    )
    rows = jaccard_pairs(word_shingles(df), min_jaccard=0.0).collect()
    assert len(rows) == 1
    assert abs(rows[0]["jaccard"] - 1 / 3) < 1e-9


def test_jaccard_skew_cap_drops_hot_shingle(spark):
    # 40 docs all share one planted hot shingle ("hot stop word") but are
    # otherwise disjoint; docs 1/2 also share a rare shingle. With an
    # absolute cap below 40 the hot bucket (780 pairs) is pruned before
    # the self-join: only the rare-shingle pair survives.
    rows = [(1, "hot stop word rare pair x1"), (2, "hot stop word rare pair x2")]
    rows += [(i, f"hot stop word u{i} v{i} w{i}") for i in range(3, 41)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sh = word_shingles(df)

    capped = jaccard_pairs(sh, min_jaccard=0.0, max_doc_freq=10)
    pairs = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    assert pairs == {(1, 2)}

    # uncapped: every doc pairs with every other via the hot shingle
    uncapped = jaccard_pairs(sh, min_jaccard=0.0, max_doc_freq=None)
    assert uncapped.count() == 40 * 39 // 2

    # default fractional cap never over-prunes small corpora (floor)
    floored = jaccard_pairs(sh, min_jaccard=0.0)
    assert floored.count() == 40 * 39 // 2


def test_exact_dedup_counts(spark):
    df = spark.createDataFrame(
        [(1, "same"), (2, "same"), (3, "diff")], "doc_id long, text string"
    )
    out = {r["keep_id"]: r["n_copies"] for r in exact_dedup(df).collect()}
    assert out == {1: 2, 3: 1}


def test_connected_components_two_clusters(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    comp = {r["id"]: r["component"] for r in connected_components(edges).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_connected_components_raises_when_budget_too_small(spark):
    import pytest

    # path graph 1-2-...-6: diameter 5 > 2 iterations → must not return
    # silently-wrong labels
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 6)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="iteration budget"):
        connected_components(edges, max_iterations=2)


def test_hyperplane_lsh_empty_and_explicit_dim(spark):
    from etl_data_peri_institute_spark.operators.similarity import (
        hyperplane_lsh_signatures,
    )

    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert hyperplane_lsh_signatures(empty).count() == 0

    df = spark.createDataFrame(
        [(1, [1.0, 0.0, 2.0]), (2, [1.0, 0.0, 2.0]), (3, [-1.0, 0.5, -2.0])],
        "vec_id long, embedding array<float>",
    )
    inferred = {r["id"]: r["bucket"] for r in hyperplane_lsh_signatures(df).collect()}
    explicit = {
        r["id"]: r["bucket"] for r in hyperplane_lsh_signatures(df, dim=3).collect()
    }
    assert inferred == explicit
    assert inferred[1] == inferred[2]  # identical vectors share a bucket


def test_hyperplane_lsh_empty_schema_matches_id_type(spark):
    """Empty and non-empty inputs must yield the SAME schema — a string
    doc-id corpus that happens to be empty (e.g. one partition of a
    union) would otherwise break downstream unions/joins."""
    from etl_data_peri_institute_spark.operators.similarity import (
        hyperplane_lsh_bands,
        hyperplane_lsh_signatures,
    )

    empty = spark.createDataFrame([], "vec_id string, embedding array<float>")
    nonempty = spark.createDataFrame(
        [("doc-1", [1.0, 0.0])], "vec_id string, embedding array<float>"
    )
    assert (
        hyperplane_lsh_signatures(empty).schema
        == hyperplane_lsh_signatures(nonempty).schema
    )
    assert (
        hyperplane_lsh_bands(empty, bands=2, bits_per_band=4).schema
        == hyperplane_lsh_bands(nonempty, bands=2, bits_per_band=4).schema
    )


def test_embedding_neardup_pairs(spark):
    from etl_data_peri_institute_spark.operators.similarity import (
        embedding_neardup_pairs,
    )

    # 1 and 2 identical (cos=1 → same sign pattern in every band → always
    # a candidate, always verified); 3 orthogonal-ish
    df = spark.createDataFrame(
        [
            (1, [1.0, 2.0, 3.0, 4.0]),
            (2, [1.0, 2.0, 3.0, 4.0]),
            (3, [-4.0, 3.0, -2.0, 1.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    pairs = {
        (r["id_a"], r["id_b"])
        for r in embedding_neardup_pairs(df, tau=0.95, dim=4).collect()
    }
    assert pairs == {(1, 2)}

    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert embedding_neardup_pairs(empty, dim=4).count() == 0


def test_kmeans_and_ivf_topk(spark):
    from etl_data_peri_institute_spark.operators.similarity import (
        ivf_topk,
        kmeans_lloyd,
        top_centroids,
    )

    # two well-separated direction clusters; ids chosen so the k=2
    # deterministic seeds (ids 1,2) land one in each cluster
    rows = [
        (1, [10.0, 0.0, 0.1, 0.0]),
        (2, [0.0, 10.0, 0.0, 0.1]),
        (3, [9.0, 0.2, 0.0, 0.0]),
        (4, [0.1, 8.0, 0.0, 0.0]),
        (5, [11.0, 0.0, 0.0, 0.2]),
        (6, [0.0, 12.0, 0.1, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = kmeans_lloyd(df, k=2, max_iter=3)
    assigned = {
        r["id"]: r["c_label"]
        for r in top_centroids(df, cents, 1).collect()
    }
    # x-direction docs cluster together, y-direction docs together
    assert assigned[1] == assigned[3] == assigned[5]
    assert assigned[2] == assigned[4] == assigned[6]
    assert assigned[1] != assigned[2]

    # single-probe IVF search from query 1 only sees its own list
    out = ivf_topk(df, df.filter(F.col("vec_id") == 1), cents, k=5, n_probe=1)
    neighbors = {r["neighbor_id"] for r in out.collect()}
    assert neighbors == {3, 5}
    # probing both lists recovers the full corpus
    out2 = ivf_topk(df, df.filter(F.col("vec_id") == 1), cents, k=5, n_probe=2)
    assert {r["neighbor_id"] for r in out2.collect()} == {2, 3, 4, 5, 6}


def test_cosine_and_knn(spark):
    df = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, [0.9, 0.1]),
            (2, [0.0, 1.0]),
            (3, [-1.0, 0.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    c = df.filter(F.col("vec_id") == 0).select(
        cosine(F.col("embedding"), F.array(F.lit(0.0), F.lit(1.0))).alias("c")
    ).first()["c"]
    assert abs(c) < 1e-12  # orthogonal
    out = knn_bruteforce(df, df.filter(F.col("vec_id") == 0), k=2).collect()
    ranked = [r["neighbor_id"] for r in sorted(out, key=lambda r: r["rank"])]
    assert ranked == [1, 2]  # nearest is the almost-parallel vector


def test_ivf_topk_empty_inputs(spark):
    from etl_data_peri_institute_spark.operators.similarity import (
        centroids_by,
        ivf_topk,
    )

    df = spark.createDataFrame(
        [(1, [1.0, 0.0], "a"), (2, [0.0, 1.0], "b")],
        "vec_id long, embedding array<float>, label string",
    )
    cents = centroids_by(df, "label")
    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert ivf_topk(df, empty, cents).count() == 0  # no queries
    assert ivf_topk(empty, df, cents).count() == 0  # no corpus


def test_grouped_split_is_group_atomic(spark):
    """b_grouped_split's contract is that a group (source) never spans
    two splits — the gate output is aggregated, so pin the structural
    invariant here: tagging documents individually with the same hash
    rule yields exactly one split per source, and every document is
    covered."""
    from pyspark.sql import functions as F

    from etl_data_peri_institute_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    h8 = F.conv(F.substring(F.md5(F.col("source")), 1, 2), 16, 10).cast("int")
    split = F.when(h8 < 204, "train").when(h8 < 230, "val").otherwise("test")
    tagged = docs.select("source", split.alias("split"))
    per_source = tagged.groupBy("source").agg(
        F.countDistinct("split").alias("n_splits")
    )
    assert per_source.filter(F.col("n_splits") != 1).count() == 0
    assert tagged.filter(F.col("split").isNull()).count() == 0


def test_incremental_dedup_survivors_not_in_corpus(spark):
    """Every d_incremental_dedup survivor's head fingerprint must be
    absent from the corpus slice, and survivors must be unique per
    fingerprint within the batch."""
    from pyspark.sql import functions as F

    from etl_data_peri_institute_spark.plans import catalog
    from etl_data_peri_institute_spark.sources.tables import load_table

    catalog.load_all()
    sf = "/root/testdata/sf0.01"
    out = catalog.QUERIES["d_incremental_dedup"].fn(spark, sf)
    docs = load_table(spark, sf, "documents")
    head_fp = F.md5(F.array_join(F.slice(F.split(F.col("text"), " "), 1, 8), " "))
    fp = docs.select("doc_id", head_fp.alias("h"))
    surv = out.join(fp, "doc_id")
    corpus = fp.filter(F.col("doc_id") % 10 != 7).select("h").distinct()
    assert surv.join(corpus, "h", "inner").count() == 0
    n_surv = surv.count()
    assert surv.select("h").distinct().count() == n_surv
    # the testdata genuinely exercises the drop path (50-row batch)
    assert 0 < n_surv < 50


def test_sq_int8_codes_bounds_and_identity(spark):
    from etl_data_peri_institute_spark.operators.similarity import (
        sq_int8_codes,
        sq_int8_topk,
    )

    df = spark.createDataFrame(
        [
            (1, [0.0, 1.0, -1.0]),
            (2, [0.0, 1.0, -1.0]),   # identical to 1 → identical codes
            (3, [1.0, 0.0, 1.0]),
            (4, [0.5, 0.5, 0.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    codes = {r["id"]: r["codes"] for r in sq_int8_codes(df).collect()}
    assert codes[1] == codes[2]
    assert all(len(c) == 3 for c in codes.values())
    assert all(-127 <= v <= 127 for c in codes.values() for v in c)
    # global max-abs (1.0 here) maps to ±127; zero maps to 0 (symmetric
    # encoding — no per-dim offset)
    assert codes[3][0] == 127 and codes[1][2] == -127 and codes[1][0] == 0
    # identical vectors are each other's top match by integer dot
    cdf = sq_int8_codes(df)
    top = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in sq_int8_topk(cdf, cdf.filter(F.col("id") <= 2), k=1).collect()
    }
    assert top[(1, 1)] == 2 and top[(2, 1)] == 1


def test_sq_all_zero_corpus_codes_zero(spark):
    from etl_data_peri_institute_spark.operators.similarity import sq_int8_codes

    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    codes = {r["id"]: r["codes"] for r in sq_int8_codes(df).collect()}
    # degenerate all-zero corpus: gmax == 0 → code 0, not NULL/NaN
    assert codes[1] == [0, 0] and codes[2] == [0, 0]


def test_containment_pairs_detects_near_subset(spark):
    from etl_data_peri_institute_spark.operators.dedup import (
        containment_pairs,
        word_shingles,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta"
    df = spark.createDataFrame(
        [
            (1, base),                                   # subset doc
            (2, base + " iota kappa " + "x y z " * 10),  # superset: contains all of 1's shingles
            (3, "p q r s t u v w"),                      # unrelated
        ],
        "doc_id long, text string",
    )
    rows = containment_pairs(word_shingles(df), min_containment=0.8).collect()
    assert len(rows) == 1
    r = rows[0]
    # doc 1 is the smaller set → subset side; containment is exactly 1.0
    assert (r["subset_id"], r["superset_id"]) == (1, 2)
    assert r["containment"] == 1.0
    # jaccard for the same pair is far below the containment score: the
    # asymmetric detector catches what the symmetric one misses
    from etl_data_peri_institute_spark.operators.dedup import jaccard_pairs

    jac = {(x["id_a"], x["id_b"]): x["jaccard"] for x in jaccard_pairs(
        word_shingles(df), min_jaccard=0.0).collect()}
    assert jac[(1, 2)] < 0.8


def test_containment_equal_sizes_keeps_lower_id_as_subset(spark):
    from etl_data_peri_institute_spark.operators.dedup import (
        containment_pairs,
        word_shingles,
    )

    same = "m n o p q r"
    df = spark.createDataFrame(
        [(7, same), (4, same)], "doc_id long, text string"
    )
    r = containment_pairs(word_shingles(df), min_containment=0.8).collect()[0]
    assert (r["subset_id"], r["superset_id"]) == (4, 7)


def test_sq_topk_recall_vs_exact_on_testdata(spark):
    """The int8-quantized ranking must track the exact ranking OF ITS
    OWN METRIC (inner product — SQ over raw vectors approximates MIPS)
    on the real embedding distribution: SQ top-1 agrees with the exact
    float-dot top-1 for most queries, and the exact top-1 always sits in
    the SQ top-5. The cosine top-1 (a different metric when norms vary)
    must still be recalled by the SQ top-5."""
    from etl_data_peri_institute_spark.operators.similarity import (
        knn_bruteforce,
        sq_int8_codes,
        sq_int8_topk,
    )
    from etl_data_peri_institute_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    vecs = {r["vec_id"]: r["embedding"] for r in emb.collect()}
    exact_dot1 = {}
    for q in range(20):
        best = max(
            ((nid, sum(a * b for a, b in zip(vecs[q], v))) for nid, v in vecs.items() if nid != q),
            key=lambda t: (t[1], -t[0]),
        )
        exact_dot1[q] = best[0]
    codes = sq_int8_codes(emb)
    sq = sq_int8_topk(codes, codes.filter(F.col("id") < 20), k=5).collect()
    sq5: dict = {}
    sq1 = {}
    for r in sq:
        sq5.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        if r["rank"] == 1:
            sq1[r["query_id"]] = r["neighbor_id"]
    assert set(exact_dot1) == set(sq5)
    dot_recall5 = sum(exact_dot1[q] in sq5[q] for q in exact_dot1) / len(exact_dot1)
    dot_recall1 = sum(exact_dot1[q] == sq1[q] for q in exact_dot1) / len(exact_dot1)
    assert dot_recall5 == 1.0, f"exact-dot top-1 missing from SQ top-5: {dot_recall5}"
    assert dot_recall1 >= 0.8, f"SQ top-1 vs exact-dot too low: {dot_recall1}"
    cos1 = {
        r["query_id"]: r["neighbor_id"]
        for r in knn_bruteforce(emb, emb.filter(F.col("vec_id") < 20), k=1).collect()
    }
    cos_recall5 = sum(cos1[q] in sq5[q] for q in cos1) / len(cos1)
    assert cos_recall5 == 1.0, f"cosine top-1 missing from SQ top-5: {cos_recall5}"


def test_simhash_nibble_bands_have_perfect_recall(spark):
    """Empirical pin of the pigeonhole property: for 16-bit fingerprints
    and hamming radius <= 3, at least one of the 4 nibbles must match
    exactly, so the band-proposed candidate set must CONTAIN every true
    pair found by brute-force XOR-popcount."""
    from itertools import combinations

    from etl_data_peri_institute_spark.plans.catalog import QUERIES, load_all

    load_all()
    sf = "/root/testdata/sf0.001"
    got = {
        (r[0], r[1])
        for r in QUERIES["d_simhash_hamming_pairs"].fn(spark, sf).select("doc_a", "doc_b").collect()
    }
    # brute-force truth over the same fingerprints, via the d_simhash
    # gate query itself (small at sf0.001)
    fps = {
        r["doc_id"]: r["simhash"]
        for r in QUERIES["d_simhash"].fn(spark, sf).collect()
    }
    truth = {
        (a, b)
        for a, b in combinations(sorted(fps), 2)
        if bin(fps[a] ^ fps[b]).count("1") <= 3
    }
    assert truth <= got or truth == got
