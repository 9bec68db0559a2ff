"""Embedding similarity-search operators (engine API).

Brute-force exact KNN as the baseline; centroid (IVF) coarse
quantization as the scale path. Vector math is built-in higher-order
functions (zip_with/aggregate) — JVM-side, no UDF; the explode-based
variants turn vector ops into plain aggregations for arbitrary
dimensionality.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<numeric> columns (double math)."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    na = F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    nb = F.aggregate(b, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    return dot / (F.sqrt(na) * F.sqrt(nb))


def knn_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors: broadcast the query set, one pass
    over the corpus, per-query window top-k. Output (query_id, rank,
    neighbor_id, cos_sim)."""
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__q"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__c"))
    sims = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", cosine(F.col("__q"), F.col("__c")).alias("cos_sim"))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )


def centroids_by(df: DataFrame, label_col: str, vec_col: str = "embedding") -> DataFrame:
    """Elementwise-mean centroids per label via posexplode + avg — plain
    aggregations, any dimension. Output (c_label, pos, cval)."""
    pos = df.select(
        F.col(label_col).alias("c_label"),
        F.posexplode(vec_col).alias("pos0", "valf"),
    ).select("c_label", (F.col("pos0") + 1).alias("pos"), F.col("valf").cast("double").alias("val"))
    return pos.groupBy("c_label", "pos").agg(F.avg("val").alias("cval"))


def top_centroids(
    df: DataFrame,
    cents: DataFrame,
    n: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_sim: bool = False,
) -> DataFrame:
    """Top-n nearest centroids by cosine for every vector (broadcast the
    tiny centroid table; dot products as joins+aggs). Output (id,
    c_label, rn) with rn = 1..n — plus ``cos_sim`` when ``keep_sim``
    (capacity-balanced assignment ranks list members by it). n=1 is IVF
    coarse assignment; n>1 is the multi-probe step of an IVF query."""
    pos = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(vec_col).alias("pos0", "valf"),
    ).select("id", (F.col("pos0") + 1).alias("pos"), F.col("valf").cast("double").alias("val"))
    dots = (
        pos.join(F.broadcast(cents), "pos")
        .groupBy("id", "c_label")
        .agg(
            F.sum(F.col("val") * F.col("cval")).alias("dot"),
            F.sqrt(F.sum(F.col("val") * F.col("val"))).alias("vn"),
            F.sqrt(F.sum(F.col("cval") * F.col("cval"))).alias("cn"),
        )
    )
    w = W.partitionBy("id").orderBy(F.desc(F.col("dot") / (F.col("vn") * F.col("cn"))), F.asc("c_label"))
    out = ["id", "c_label", "rn"]
    if keep_sim:
        dots = dots.withColumn("cos_sim", F.col("dot") / (F.col("vn") * F.col("cn")))
        out.append("cos_sim")
    return (
        dots.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= n)
        .select(*out)
    )


def top_centroids_tagged(
    df: DataFrame,
    variants: list[tuple[str, DataFrame]],
    n: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-n nearest centroids of every vector under SEVERAL quantizer
    variants in ONE pass: one posexplode, one broadcast join against
    the variant-tagged centroid union, one (id, variant, label)
    aggregation, one (id, variant) rank window. Output
    (variant, id, c_label, rn), rn = 1..n.

    Exactly equivalent to, for each (name, cents) in ``variants``,
    ``top_centroids(df, cents, n)`` tagged with the name and unioned
    (the lifecycle/retraction/churn/staleness replay shape, r12): per
    (id, variant, c_label) the dot/norm sums accumulate over the same
    pos-ascending row sequence as the single-variant aggregation, and
    the per-(id, variant) rank uses the identical
    (cosine DESC, c_label ASC) order. What changes is the plan: N
    posexplode scans + N aggregations + N windows collapse to one of
    each — at 100 TB that is one corpus/probe-slice scan instead of N.

    Each cents_df has (c_label, pos, cval) — the top_centroids
    contract. The tagged union is k×dim×N rows, still broadcast-sized.
    """
    tagged = None
    for name, cents in variants:
        t = cents.select(
            F.lit(name).alias("variant"), "c_label", "pos", "cval"
        )
        tagged = t if tagged is None else tagged.unionByName(t)
    pos = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(vec_col).alias("pos0", "valf"),
    ).select(
        "id",
        (F.col("pos0") + 1).alias("pos"),
        F.col("valf").cast("double").alias("val"),
    )
    dots = (
        pos.join(F.broadcast(tagged), "pos")
        .groupBy("id", "variant", "c_label")
        .agg(
            F.sum(F.col("val") * F.col("cval")).alias("dot"),
            F.sqrt(F.sum(F.col("val") * F.col("val"))).alias("vn"),
            F.sqrt(F.sum(F.col("cval") * F.col("cval"))).alias("cn"),
        )
    )
    w = W.partitionBy("id", "variant").orderBy(
        F.desc(F.col("dot") / (F.col("vn") * F.col("cn"))), F.asc("c_label")
    )
    return (
        dots.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= n)
        .select("variant", "id", "c_label", "rn")
    )


def nearest_centroid_multi(
    df: DataFrame,
    variants: list[tuple[str, DataFrame]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Nearest centroid of every vector under SEVERAL quantizer
    variants in ONE pass (:func:`top_centroids_tagged` at n=1),
    pivoted back to one row per id with a column per variant name
    holding the assigned c_label. Equivalent to N separate
    ``top_centroids(df, cents, n=1)`` passes inner-joined on id: every
    id gets exactly one label per variant (centroid frames are
    non-empty), so the pivot equals the join — minus the (N−1)
    id-joins."""
    top = top_centroids_tagged(df, variants, n=1, id_col=id_col, vec_col=vec_col)
    return top.groupBy("id").agg(
        *[
            F.max(F.when(F.col("variant") == name, F.col("c_label"))).alias(name)
            for name, _ in variants
        ]
    )


def assign_nearest_centroid(
    df: DataFrame,
    cents: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF coarse assignment: nearest centroid by cosine. Output (id,
    assigned_label). Thin wrapper over top_centroids(n=1)."""
    return top_centroids(df, cents, 1, id_col, vec_col).select(
        "id", F.col("c_label").alias("assigned_label")
    )


def exact_l2_pairs(
    emb: DataFrame,
    n_queries: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The shared evaluation-truth frame: rounded exact squared-L2 of
    every sampled query (id < n_queries, broadcast) against the rest
    of the corpus. Output (query_id, neighbor_id, d) with d rounded to
    6 decimals so tie order cannot diverge cross-engine — every recall
    report (compression ladder, balanced-probe twin) must rank from
    THIS frame, not a private reimplementation, or a precision tweak
    in one desynchronizes the reports. Sample-bounded by construction:
    n_queries × corpus rows, the standard eval protocol (at 100 TB the
    sample is what makes the exact side affordable)."""
    is_q = F.col(id_col) < n_queries
    q = emb.where(is_q).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    c = emb.where(~is_q).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv")
    )
    d = F.round(
        F.aggregate(
            F.zip_with("__qv", "__cv", lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
        6,
    )
    return c.join(F.broadcast(q)).select("query_id", "neighbor_id", d.alias("d"))


def capacity_balanced_labels(
    df: DataFrame,
    cents: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Capacity-balanced IVF assignment (FAISS balanced-k-means shape):
    every list is capped at ceil(N/K); within a list members rank by
    cosine (closest keep the list — ties broken on rounded similarity
    then id, deterministic cross-engine) and the overflow spills to its
    second-nearest centroid. One spill round. Output (id,
    primary_label, balanced_label, over) — `over` marks spilled rows.

    Scale shape: ONE top-2-centroid pass over the corpus; the spill
    target rides as lead(c_label) over the id window top_centroids
    already shuffled for (no second corpus pass); one capacity window
    per list (partitioned by c_label, never global); the 1-row N and
    K frames attach via broadcast crossJoin."""
    t2 = top_centroids(df, cents, n=2, id_col=id_col, vec_col=vec_col, keep_sim=True)
    prim = t2.withColumn(
        "spill_label", F.lead("c_label").over(W.partitionBy("id").orderBy("rn"))
    ).where(F.col("rn") == 1)
    caprank = F.row_number().over(
        W.partitionBy("c_label").orderBy(F.round("cos_sim", 6).desc(), F.asc("id"))
    )
    n = df.agg(F.count("*").alias("n_tot"))
    # countDistinct (NULL-excluding) so K matches a SQL
    # count(DISTINCT label) over the same centroid source exactly
    k = cents.agg(F.countDistinct("c_label").alias("k_lists"))
    out = (
        prim.withColumn("caprank", caprank)
        .crossJoin(F.broadcast(n))
        .crossJoin(F.broadcast(k))
        .withColumn("cap", F.ceil(F.col("n_tot") / F.col("k_lists")))
        .withColumn("over", F.col("caprank") > F.col("cap"))
    )
    return out.select(
        "id",
        F.col("c_label").alias("primary_label"),
        F.when(F.col("over"), F.col("spill_label"))
        .otherwise(F.col("c_label"))
        .alias("balanced_label"),
        "over",
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    cents: DataFrame,
    k: int = 5,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k search: corpus vectors are bucketed into
    inverted lists (nearest centroid); each query probes its n_probe
    nearest lists and exact-cosine-ranks ONLY the vectors in those
    lists. Output (query_id, rank, neighbor_id, cos_sim).

    Scale shape: centroids are tiny and broadcast; building the lists is
    one corpus pass; the candidate join shuffles on the list label, so
    per-query work is the probed lists' size, not the corpus — the
    classic IVF recall/cost dial (n_probe). Hot lists are the skew
    hazard; production balances list sizes by training centroids on a
    sample (see kmeans_lloyd). The query side is usually small enough
    that AQE broadcasts it."""
    lists = top_centroids(corpus, cents, 1, id_col, vec_col).select(
        F.col("id").alias("neighbor_id"), "c_label"
    )
    probes = top_centroids(queries, cents, n_probe, id_col, vec_col).select(
        F.col("id").alias("query_id"), "c_label"
    )
    cand = (
        probes.join(lists, "c_label")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__q"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__c"))
    sims = (
        cand.join(q, "query_id")
        .join(c, "neighbor_id")
        .select("query_id", "neighbor_id", cosine(F.col("__q"), F.col("__c")).alias("cos_sim"))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cos_sim")
    )


def kmeans_lloyd(
    df: DataFrame,
    k: int = 4,
    max_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Spherical k-means (Lloyd) centroid training for IVF: assignment
    by cosine, centroids = elementwise means. Returns the trained
    centroid table (c_label, pos, cval) — feed it to top_centroids /
    ivf_topk.

    Deterministic init: the k lowest-id vectors seed the clusters (a
    production pipeline would k-means++ a sample; determinism matters
    more here). Ranking by cosine against unnormalized mean centroids
    IS spherical k-means assignment — cosine divides by the centroid
    norm, so renormalizing the means cannot change any argmax.

    Iteration pattern (the same loop discipline as
    operators/components.py): per-round state is the k×dim centroid
    table — tiny — so it is eagerly localCheckpoint-ed each round to
    truncate lineage; the corpus itself is never checkpointed or
    collected. max_iter bounds cost; k-means converges in practice long
    before diameter-style worst cases."""
    first_k = df.orderBy(id_col).limit(k)
    labels = first_k.select(
        F.col(id_col).alias("__seed_id"),
        (F.row_number().over(W.orderBy(id_col)) - 1).alias("c_label"),
    )
    seeds = first_k.join(labels, F.col(id_col) == F.col("__seed_id")).select(
        "c_label", F.posexplode(vec_col).alias("pos0", "valf")
    )
    cents = (
        seeds.select(
            "c_label", (F.col("pos0") + 1).alias("pos"), F.col("valf").cast("double").alias("cval")
        )
        .localCheckpoint()
    )
    for _ in range(max_iter):
        assigned = top_centroids(df, cents, 1, id_col, vec_col).select(
            F.col("id"), F.col("c_label")
        )
        joined = df.join(assigned, F.col(id_col) == F.col("id")).select(
            "c_label", F.posexplode(vec_col).alias("pos0", "valf")
        )
        cents = (
            joined.select(
                "c_label",
                (F.col("pos0") + 1).alias("pos"),
                F.col("valf").cast("double").alias("val"),
            )
            .groupBy("c_label", "pos")
            .agg(F.avg("val").alias("cval"))
            .localCheckpoint()
        )
    return cents


def _hyperplane_dots(
    df: DataFrame,
    n_bits: int,
    id_col: str,
    vec_col: str,
    dim: int,
) -> DataFrame:
    """(id, dot0..dot{n_bits-1}): dot products of each vector against
    n_bits md5-derived pseudo-random hyperplanes (see
    hyperplane_lsh_signatures for why md5). One posexplode pass +
    broadcast join against the O(dim·n_bits) plane matrix."""
    spark = df.sparkSession
    pos = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(vec_col).alias("pos0", "valf"),
    ).select("id", (F.col("pos0") + 1).alias("pos"), F.col("valf").cast("double").alias("val"))
    planes = spark.range(1, dim + 1).select(
        F.col("id").cast("int").alias("pos"),
        *[
            (
                F.conv(
                    F.substring(F.md5(F.concat(F.lit(f"hp{b}_"), F.col("id").cast("string"))), 1, 4),
                    16,
                    10,
                ).cast("long")
                / 65536.0
                - 0.5
            ).alias(f"hp{b}")
            for b in range(n_bits)
        ],
    )
    return (
        pos.join(F.broadcast(planes), "pos")
        .groupBy("id")
        .agg(*[F.sum(F.col("val") * F.col(f"hp{b}")).alias(f"dot{b}") for b in range(n_bits)])
    )


def hyperplane_lsh_signatures(
    df: DataFrame,
    n_bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Random-hyperplane LSH (SimHash for vectors): sign pattern of dot
    products against n_bits pseudo-random hyperplanes → integer bucket.

    Hyperplane components are derived deterministically from md5 hex
    (component b,pos ∈ [-0.5, 0.5)) so signatures are engine-portable and
    reproducible — production swaps in a seeded Gaussian matrix, same
    plan. Vectors in the same bucket are ANN candidates; multi-probe =
    also search buckets at hamming distance 1. One narrow pass per
    vector, no pairwise work.

    Pass ``dim`` (the embedding dimension) to keep plan construction
    job-free; without it, a one-row probe infers it (and an empty input
    yields an empty result instead of a driver error).
    """
    spark = df.sparkSession
    if dim is None:
        row = df.select(F.size(vec_col).alias("d")).first()
        if row is None:  # empty input: no vectors, no buckets
            # derive the id type from the input so empty and non-empty
            # inputs yield the SAME schema (string doc ids would
            # otherwise break downstream unions only in the empty case)
            from pyspark.sql.types import LongType, StructField, StructType

            return spark.createDataFrame(
                [],
                StructType(
                    [
                        StructField("id", df.schema[id_col].dataType),
                        StructField("bucket", LongType()),
                    ]
                ),
            )
        dim = row["d"]

    # the hyperplane matrix is materialized ONCE (dim × n_bits rows, not
    # per vector row) and broadcast-joined: md5 work is O(dim·bits),
    # independent of corpus size. conv(hex,16,10) == the oracle's
    # instr-digit expansion, so signatures still match cross-engine.
    dots = _hyperplane_dots(df, n_bits, id_col, vec_col, dim)
    bucket = sum(
        (F.col(f"dot{b}") > 0).cast("long") * (1 << b) for b in range(n_bits)
    )
    return dots.select("id", bucket.alias("bucket"))


def hyperplane_lsh_bands(
    df: DataFrame,
    bands: int = 8,
    bits_per_band: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Banded random-hyperplane LSH: (id, band, bucket) — one row per
    band, bucket = the band's bits_per_band sign pattern.

    Banding trades precision for recall exactly as in MinHash LSH: a
    pair is a candidate if ANY band matches. For sign-random-projection,
    P(bit match) = 1 - θ/π, so P(candidate) = 1-(1-p^r)^b.

    Band width is the selectivity dial, and it matters enormously at
    scale: with the 8×16 defaults a random (near-orthogonal, p ≈ 0.5)
    pair collides with probability ≈ 8·2⁻¹⁶ ≈ 1e-4, so candidate volume
    stays linear-ish in corpus size, while true near-dups (cos ≥ 0.99,
    p ≈ 0.955) are caught with ≥ 0.99 probability. Few coarse bands
    (e.g. 4×4 — 16 buckets per band) approach all-pairs on any corpus
    beyond a few thousand vectors — only usable for low-τ exploratory
    runs on bounded slices.
    """
    if dim is None:
        # one probe doubles as dim inference AND empty-input check; when
        # the caller supplies dim, NO job runs at plan-build time (an
        # empty frame just flows through to an empty result)
        row = df.select(F.size(vec_col).alias("d")).first()
        if row is None:
            # id type mirrors the input (see hyperplane_lsh_signatures)
            from pyspark.sql.types import IntegerType, LongType, StructField, StructType

            return df.sparkSession.createDataFrame(
                [],
                StructType(
                    [
                        StructField("id", df.schema[id_col].dataType),
                        StructField("band", IntegerType()),
                        StructField("bucket", LongType()),
                    ]
                ),
            )
        dim = row["d"]
    n_bits = bands * bits_per_band
    spark = df.sparkSession
    # LONG-format plane table: (pos, bit, hp) — dim × n_bits rows. The
    # wide alternative (one agg column per bit) builds an O(n_bits)-wide
    # expression tree whose codegen/task-binary cost dwarfs the data at
    # 100+ bits; long format keeps every expression O(1) and pays with
    # narrow rows instead, which is the currency Spark is good at.
    # Seed string 'hp{bit}_{pos}' matches _hyperplane_dots / the oracle.
    planes = (
        spark.range(1, dim + 1)
        .select(F.col("id").cast("int").alias("pos"))
        .select("pos", F.explode(F.sequence(F.lit(0), F.lit(n_bits - 1))).alias("bit"))
        .select(
            "pos",
            "bit",
            (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.lit("hp"),
                                F.col("bit").cast("string"),
                                F.lit("_"),
                                F.col("pos").cast("string"),
                            )
                        ),
                        1,
                        4,
                    ),
                    16,
                    10,
                ).cast("long")
                / 65536.0
                - 0.5
            ).alias("hp"),
        )
    )
    pos = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(vec_col).alias("pos0", "valf"),
    ).select("id", (F.col("pos0") + 1).alias("pos"), F.col("valf").cast("double").alias("val"))
    dots = (
        pos.join(F.broadcast(planes), "pos")
        .groupBy("id", "bit")
        .agg(F.sum(F.col("val") * F.col("hp")).alias("dot"))
    )
    return (
        dots.groupBy(
            "id", (F.col("bit") / bits_per_band).cast("int").alias("band")
        )
        .agg(
            F.sum(
                (F.col("dot") > 0).cast("long")
                * F.expr(f"shiftleft(1L, int(bit % {bits_per_band}))")
            ).alias("bucket")
        )
        .select("id", "band", "bucket")
    )


def embedding_neardup_pairs(
    corpus: DataFrame,
    tau: float = 0.9,
    bands: int = 8,
    bits_per_band: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs at scale: banded hyperplane
    LSH proposes candidates (any shared (band, bucket)), exact cosine
    verifies ≥ tau. Output (id_a, id_b) — ids only, so float noise never
    reaches a hash compare.

    The O(n²) pair space is never enumerated: cost is one LSH pass over
    the corpus plus the colliding-bucket joins plus one embedding
    re-join per surviving candidate. No forced broadcasts — the
    embedding side is corpus-sized (AQE handles small inputs).

    Defaults (τ=0.9, 8 bands × 16 bits) are the production near-dup
    regime — selective bands, high threshold. Low-τ settings demand
    coarse bands for recall, and coarse bands degrade toward all-pairs
    (see hyperplane_lsh_bands); keep those to bounded corpus slices.
    """
    bb = hyperplane_lsh_bands(corpus, bands, bits_per_band, id_col, vec_col, dim)
    a, b = bb.alias("a"), bb.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    ea = corpus.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"))
    eb = corpus.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"))
    return (
        cand.join(ea, "id_a")
        .join(eb, "id_b")
        .filter(cosine(F.col("__va"), F.col("__vb")) >= tau)
        .select("id_a", "id_b")
    )


def embedding_neardup_incremental(
    batch: DataFrame,
    corpus: DataFrame,
    tau: float = 0.9,
    bands: int = 8,
    bits_per_band: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Incremental (batch-vs-corpus) embedding near-dup: the new batch's
    band table probes the corpus's band table on (band, bucket); shared
    buckets propose candidates and exact double-math cosine verifies
    ≥ tau. Output ``(id, corpus_id)`` — one row per VERIFIED (batch
    vector, corpus partner) pair, ids only.

    The incremental shape mirrors d_incremental_lsh_dedup's text tier:
    at scale the corpus band table is a MAINTAINED artifact (one LSH
    pass when a vector first lands, appended per batch, bucketed on
    (band, bucket)), so a daily run pays one LSH pass over the BATCH
    plus collision-bounded bucket joins plus one embedding re-join per
    surviving candidate — O(batch + collisions), independent of corpus
    size, where embedding_neardup_pairs re-pays the full corpus
    self-join every run.
    """
    bb = hyperplane_lsh_bands(batch, bands, bits_per_band, id_col, vec_col, dim)
    bc = hyperplane_lsh_bands(corpus, bands, bits_per_band, id_col, vec_col, dim)
    cand = (
        bb.select(F.col("id").alias("__idb"), "band", "bucket")
        .join(bc.select(F.col("id").alias("__idc"), "band", "bucket"), ["band", "bucket"])
        .select("__idb", "__idc")
        .distinct()
    )
    eb = batch.select(F.col(id_col).alias("__idb"), F.col(vec_col).alias("__vb"))
    ec = corpus.select(F.col(id_col).alias("__idc"), F.col(vec_col).alias("__vc"))
    return (
        cand.join(eb, "__idb")
        .join(ec, "__idc")
        .filter(cosine(F.col("__vb"), F.col("__vc")) >= tau)
        .select(F.col("__idb").alias("id"), F.col("__idc").alias("corpus_id"))
    )


def sq_int8_codes(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Scalar-quantize float vectors to int8 codes with SYMMETRIC
    global-scale calibration — the memory-bound ANN scale path (4×
    smaller than f32; integer dot products are SIMD-friendly and, for
    the engine's purposes, EXACTLY reproducible — no float summation
    order anywhere in the ranking).

    code(v) = round(v * 127 / gmax),  gmax = max |v| over the corpus
            ∈ [-127, 127]

    A single POSITIVE scale is what keeps the integer dot a faithful
    proxy for the float dot: qdot = (127/gmax)² · dot + O(rounding).
    The per-dimension min/max AFFINE encoding (FAISS-style SQ8, built
    for L2 distance) would inject offset cross-terms into the integer
    dot and scramble inner-product order — measured on the testdata it
    drops top-1 agreement from ≥0.8 to 0.6
    (test_sq_topk_recall_vs_exact_on_testdata pins the faithful form).

    Returns (id, codes array<int>). Calibration is one scalar max-abs
    aggregate over the corpus (broadcast back as a 1-row frame); the
    repack to arrays is one groupBy on the vector id. At 100 TB both
    shuffles are the narrow long-format frame (id, pos, code) — there
    is no per-pair work here; downstream search joins the CODE arrays,
    which is the whole point of quantizing first.
    """
    pos = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(vec_col).alias("pos", "val"),
    ).select("id", "pos", F.col("val").cast("double").alias("val"))
    stats = pos.agg(F.max(F.abs(F.col("val"))).alias("gmax"))
    code = (
        F.when(F.col("gmax") == 0, F.lit(0))
        .otherwise(F.round(F.col("val") * 127.0 / F.col("gmax")).cast("int"))
        .alias("code")
    )
    codes_long = pos.crossJoin(F.broadcast(stats)).select("id", "pos", code)
    return codes_long.groupBy("id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "code"))), lambda x: x["code"]
        ).alias("codes")
    )


def sq_int8_topk(
    corpus_codes: DataFrame,
    query_codes: DataFrame,
    k: int = 5,
) -> DataFrame:
    """Approximate top-k by integer dot product over int8 codes (both
    frames as produced by sq_int8_codes). Broadcast the query codes, one
    corpus pass, per-query window top-k — the brute-force shape but on
    4×-compressed exactly-reproducible integers. Output
    (query_id, rank, neighbor_id, dot)."""
    q = query_codes.select(F.col("id").alias("query_id"), F.col("codes").alias("__q"))
    c = corpus_codes.select(F.col("id").alias("neighbor_id"), F.col("codes").alias("__c"))
    dot = F.aggregate(
        F.zip_with("__q", "__c", lambda a, b: (a * b).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    sims = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", dot.alias("dot"))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("dot"), F.asc("neighbor_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "dot")
    )


def ivf_sq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    cents: DataFrame,
    codes: DataFrame,
    k: int = 5,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The production ANN stack, composed: IVF coarse probing bounds the
    candidate set (per-query work = probed-list size, not corpus size),
    then int8 SQ integer dots rank the candidates (4× less memory
    traffic per candidate than float re-rank, and exactly
    reproducible). ``codes`` must come from sq_int8_codes over the SAME
    corpus so query and corpus codes share one calibration — quantizing
    the query set separately would rank in a different code space.

    Output (query_id, rank, neighbor_id, dot). FAISS calls this
    IVF-SQ8; the float exact-cosine variant is ivf_topk (higher
    per-candidate cost, no quantization error — the recall/cost dial is
    n_probe there, n_probe AND code width here)."""
    lists = top_centroids(corpus, cents, 1, id_col, vec_col).select(
        F.col("id").alias("neighbor_id"), "c_label"
    )
    probes = top_centroids(queries, cents, n_probe, id_col, vec_col).select(
        F.col("id").alias("query_id"), "c_label"
    )
    cand = (
        probes.join(lists, "c_label")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    qc = codes.select(F.col("id").alias("query_id"), F.col("codes").alias("__q"))
    cc = codes.select(F.col("id").alias("neighbor_id"), F.col("codes").alias("__c"))
    dot = F.aggregate(
        F.zip_with("__q", "__c", lambda a, b: (a * b).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    sims = (
        cand.join(qc, "query_id")
        .join(cc, "neighbor_id")
        .select("query_id", "neighbor_id", dot.alias("dot"))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("dot"), F.asc("neighbor_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "dot")
    )


def centroid_pos_stats(
    df: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-(label, position) SUM and COUNT of vector components —
    ``(c_label, pos, csum, cnt)`` — the sufficient statistics of a mean
    quantizer. ``centroids_by`` is a view over this (cval = csum/cnt);
    the incremental update path needs the raw sums so an appended batch
    folds in WITHOUT re-reading the corpus (mini-batch k-means append:
    new mean = (csum_corpus + csum_batch) / (cnt_corpus + cnt_batch))."""
    pos = df.select(
        F.col(label_col).alias("c_label"),
        F.posexplode(vec_col).alias("pos0", "valf"),
    ).select(
        "c_label",
        (F.col("pos0") + 1).alias("pos"),
        F.col("valf").cast("double").alias("val"),
    )
    return pos.groupBy("c_label", "pos").agg(
        F.sum("val").alias("csum"), F.count("*").alias("cnt")
    )


def centroid_stats_update(
    corpus_stats: DataFrame,
    batch: DataFrame,
    batch_assign: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Fold an assigned ingest batch into a PERSISTED quantizer's
    sufficient statistics and return the UPDATED statistics
    ``(c_label, pos, csum, cnt)`` — the same shape
    ``centroid_pos_stats`` produced, so successive daily batches CHAIN:
    persist this output as the new quantizer state and feed it to the
    next fold-in without ever re-reading the corpus (the 'maintained
    artifact' contract; returning only the derived means would force a
    corpus recompute before the next update).

    ``corpus_stats`` is ``centroid_pos_stats`` output (at scale: a
    MAINTAINED k×dim-row artifact, trivially small); ``batch_assign``
    is ``(id, c_label)`` from ``top_centroids(n=1)``. Cost: one
    posexplode of the batch + a (c_label, pos) groupBy — O(batch·dim),
    independent of corpus size."""
    bpos = batch.select(
        F.col(id_col).alias("id"),
        F.posexplode(vec_col).alias("pos0", "valf"),
    ).select(
        "id",
        (F.col("pos0") + 1).alias("pos"),
        F.col("valf").cast("double").alias("val"),
    )
    bstats = (
        bpos.join(batch_assign.select("id", "c_label"), "id")
        .groupBy("c_label", "pos")
        .agg(F.sum("val").alias("bsum"), F.count("*").alias("bcnt"))
    )
    return corpus_stats.join(bstats, ["c_label", "pos"], "left").select(
        "c_label",
        "pos",
        (F.col("csum") + F.coalesce("bsum", F.lit(0.0))).alias("csum"),
        (F.col("cnt") + F.coalesce("bcnt", F.lit(0))).alias("cnt"),
    )


def centroid_stats_retract(
    corpus_stats: DataFrame,
    retract: DataFrame,
    retract_assign: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """DELETE side of the quantizer maintenance loop: SUBTRACT a
    retracted slice's contribution from the persisted sufficient
    statistics and return ``(c_label, pos, csum, cnt)``. Sums and
    counts subtract exactly in the integer-count dimension; the float
    sums subtract the SAME per-(label,pos) partial the slice once
    added, so a retract of rows folded in by ``centroid_stats_update``
    restores the counts exactly and the sums up to float re-association
    (documented; the gate pins the observable assignment flips, not
    bit-identity of touched centroids). A (label,pos) whose count hits
    0 is DROPPED — an emptied list has no centroid, exactly as a fresh
    ``centroid_pos_stats`` over the remaining corpus would produce.

    ``retract_assign`` is ``(id, c_label)`` — the assignment the slice
    carried when it entered the stats (at scale: read back from the
    assignment table, never recomputed, so the subtraction matches the
    addition even after later centroid drift). Cost: O(slice·dim),
    corpus-free, mirroring the append side."""
    rpos = retract.select(
        F.col(id_col).alias("id"),
        F.posexplode(vec_col).alias("pos0", "valf"),
    ).select(
        "id",
        (F.col("pos0") + 1).alias("pos"),
        F.col("valf").cast("double").alias("val"),
    )
    rstats = (
        rpos.join(retract_assign.select("id", "c_label"), "id")
        .groupBy("c_label", "pos")
        .agg(F.sum("val").alias("rsum"), F.count("*").alias("rcnt"))
    )
    return (
        corpus_stats.join(rstats, ["c_label", "pos"], "left")
        .select(
            "c_label",
            "pos",
            (F.col("csum") - F.coalesce("rsum", F.lit(0.0))).alias("csum"),
            (F.col("cnt") - F.coalesce("rcnt", F.lit(0))).alias("cnt"),
        )
        .filter(F.col("cnt") > 0)
    )


def centroid_running_update(
    corpus_stats: DataFrame,
    batch: DataFrame,
    batch_assign: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Fold an assigned ingest batch into a PERSISTED quantizer's
    sufficient statistics and return the updated centroids
    ``(c_label, pos, cval)`` — the state-transition step of the daily
    IVF maintenance loop (assign with the stale quantizer, then shift
    each touched centroid toward its new members; an untouched list's
    centroid is bit-identical to before). A derived view over
    ``centroid_stats_update`` — callers that persist the quantizer
    across days should persist THAT output (raw sums chain; means do
    not)."""
    return centroid_stats_update(
        corpus_stats, batch, batch_assign, id_col=id_col, vec_col=vec_col
    ).select(
        "c_label",
        "pos",
        (F.col("csum") / F.col("cnt")).alias("cval"),
    )
