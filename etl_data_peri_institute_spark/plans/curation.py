"""Training-data curation gates: token-budget selection, source
mixtures, epoch shuffling, k-fold assignment, curriculum schedules,
preference pairs, sampling — the selection layer between a deduped
corpus and a training run. All distributed shapes (range-exchange
cumsum, salted sampling); production twins registered under the SAME
oracle as their semantic pins.

Consolidated from the round-4..8 extension modules (round-9 layout
cleanup); each section cites its source round.
"""

from __future__ import annotations

# ===========================================================================
# section consolidated from plans/round4_ext.py (round-9 layout cleanup;
#   original registrations and docstrings preserved verbatim)
#   (module docstring carried in plans/textops.py)
# ===========================================================================

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F
from ..sources.tables import load_table
from .catalog import query

_NEG_PER_USER = 2

_NEG_CAND_PARTS = 100

@query(
    "b_negative_sampling",
    oracle=f"""
    WITH inter AS (
      SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    ),
    cand AS (
      SELECT p FROM (
        SELECT l_partkey AS p, count(*) AS n,
               row_number() OVER (ORDER BY count(*) DESC, l_partkey) AS rn
        FROM lineitem GROUP BY l_partkey
      ) WHERE rn <= {_NEG_CAND_PARTS}
    ),
    users AS (SELECT DISTINCT c FROM inter),
    negs AS (
      SELECT u.c, cd.p,
             row_number() OVER (
               PARTITION BY u.c ORDER BY md5(u.c || ':' || cd.p)
             ) AS rn
      FROM users u CROSS JOIN cand cd
      WHERE NOT EXISTS (SELECT 1 FROM inter i WHERE i.c = u.c AND i.p = cd.p)
    )
    SELECT c AS custkey, p AS neg_partkey, CAST(rn AS INT) AS neg_rank
    FROM negs WHERE rn <= {_NEG_PER_USER}
    ORDER BY custkey, neg_rank
    """,
)
def b_negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative sampling: for every customer, 2 popular
    parts they have NEVER purchased, picked by content-hash order — the
    contrastive/recommender training companion to positive interaction
    pairs. Hash-ordered (never rand()) so resampling a shard regenerates
    identical negatives, and restricted to a bounded popular-candidate
    set so negatives are hard (popularity-matched), not trivial.

    Scale shape: the candidate set is top-N (bounded, broadcast); the
    cross join is users x N BEFORE the anti-filter, i.e. linear in
    users with constant factor N — never users x all-items. The
    interaction anti-check is a co-partitioned NOT EXISTS on the
    (user, item) key; the per-user hash-order pick is a bounded window
    over <= N rows per user."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    inter = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    cand = (
        li.groupBy(F.col("l_partkey").alias("p"))
        .agg(F.count("*").alias("n"))
        .withColumn("rn", F.row_number().over(W.orderBy(F.col("n").desc(), "p")))
        .filter(F.col("rn") <= _NEG_CAND_PARTS)
        .select("p")
    )
    users = inter.select("c").distinct()
    pairs = users.crossJoin(F.broadcast(cand))
    negs = (
        pairs.join(inter, ["c", "p"], "left_anti")
        .withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("c").orderBy(
                    F.md5(F.concat(F.col("c").cast("string"), F.lit(":"), F.col("p").cast("string")))
                )
            ),
        )
        .filter(F.col("rn") <= _NEG_PER_USER)
    )
    return negs.select(
        F.col("c").alias("custkey"),
        F.col("p").alias("neg_partkey"),
        F.col("rn").cast("int").alias("neg_rank"),
    ).orderBy("custkey", "neg_rank")


# ===========================================================================
# section consolidated from plans/round4b_ext.py (round-9 layout cleanup;
#   original registrations and docstrings preserved verbatim)
#   (module docstring carried in plans/stats.py)
# ===========================================================================

_FREQ_CAP = 8

@query(
    "b_frequency_capping",
    oracle=f"""
    WITH seq AS (
      SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
             row_number() OVER (
               PARTITION BY user_id, date_trunc('day', ts)
               ORDER BY ts, event_id
             ) AS rn
      FROM events WHERE event_type = 'view'
    )
    SELECT day,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(sum(CASE WHEN rn > {_FREQ_CAP} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_capped_events,
           CAST(count(DISTINCT CASE WHEN rn > {_FREQ_CAP} THEN user_id END) AS BIGINT)
             AS n_capped_users
    FROM seq GROUP BY day
    ORDER BY day
    """,
)
def b_frequency_capping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency capping: per (user, day), 'view' events beyond the
    cap ({c}/day) are surplus — the report counts capped events and
    affected users per day, the ad-serving / notification-throttling
    primitive (enforcement = filter rn <= cap on the same plan).

    Scale shape: ONE window on the natural delivery key (user, day) —
    the same partitioning the serving system writes, so at 100 TB this
    is a partition-local sort with no second exchange; the daily
    report aggregation reuses nothing wider than the day key. The
    (ts, event_id) ordering makes WHICH events are surplus
    deterministic, not just how many.
    """.format(c=_FREQ_CAP)
    ev = load_table(spark, sf_dir, "events")
    seq = ev.filter(F.col("event_type") == "view").select(
        "user_id",
        F.date_trunc("day", "ts").cast("date").alias("day"),
        F.row_number()
        .over(
            W.partitionBy("user_id", F.date_trunc("day", "ts")).orderBy(
                "ts", "event_id"
            )
        )
        .alias("rn"),
    )
    over = F.col("rn") > _FREQ_CAP
    return (
        seq.groupBy("day")
        .agg(
            F.count_distinct("user_id").alias("n_users"),
            F.sum(over.cast("long")).alias("n_capped_events"),
            F.count_distinct(F.when(over, F.col("user_id"))).alias("n_capped_users"),
        )
        .orderBy("day")
    )

_RES_K = 50

@query(
    "b_reservoir_per_group",
    oracle=f"""
    WITH keyed AS (
      SELECT event_type, event_id,
             md5('res:' || event_id) AS hk
      FROM events
    ),
    ranked AS (
      SELECT event_type, event_id, hk,
             row_number() OVER (
               PARTITION BY event_type ORDER BY hk, event_id
             ) AS rn
      FROM keyed
    )
    SELECT event_type, rn, event_id
    FROM ranked WHERE rn <= {_RES_K}
    ORDER BY event_type, rn
    """,
)
def b_reservoir_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-SIZE uniform sample per group (k = {k} per event type),
    reservoir semantics without a reservoir: rank rows by a content
    hash within each group and keep the k smallest — every row is
    equally likely under the hash's uniformity, the choice is a pure
    function of content (b_hash_sample's determinism discipline), and
    unlike rate-based sampling (b_stratified_sample) the output size
    is EXACTLY k per group regardless of group skew — the eval-set /
    debugging-slice primitive.

    Scale shape: one group-keyed window sort. At 100 TB the
    rank-then-filter refines to a per-partition top-k (each partition
    keeps its k smallest hashes map-side — Spark's
    TakeOrderedAndProject generalized per key) so the shuffle carries
    at most k rows per (group, partition), not the group. The
    (hk, event_id) tiebreak makes the k-th seat deterministic even
    under hash collisions.
    """.format(k=_RES_K)
    ev = load_table(spark, sf_dir, "events")
    keyed = ev.select(
        "event_type",
        "event_id",
        F.md5(F.concat(F.lit("res:"), F.col("event_id").cast("string"))).alias("hk"),
    )
    ranked = keyed.withColumn(
        "rn",
        F.row_number().over(W.partitionBy("event_type").orderBy("hk", "event_id")),
    )
    return (
        ranked.filter(F.col("rn") <= _RES_K)
        .select("event_type", "rn", "event_id")
        .orderBy("event_type", "rn")
    )

_BUDGET_PCT = 50  # keep the best docs until 50% of corpus tokens

@query(
    "b_token_budget_selection",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, source,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             CAST(n_chars AS BIGINT) AS quality
      FROM documents
    ),
    ranked AS (
      SELECT doc_id, source, n_tokens,
             CAST(sum(n_tokens) OVER (
               ORDER BY quality DESC, doc_id
             ) AS BIGINT) AS cum_tokens,
             CAST(sum(n_tokens) OVER () AS BIGINT) AS total_tokens
      FROM scored
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN cum_tokens * 100 <= total_tokens * {_BUDGET_PCT}
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(sum(CASE WHEN cum_tokens * 100 <= total_tokens * {_BUDGET_PCT}
                    THEN n_tokens ELSE 0 END) AS BIGINT) AS tokens_kept,
           round(sum(CASE WHEN cum_tokens * 100 <= total_tokens * {_BUDGET_PCT}
                     THEN 1 ELSE 0 END) * 1.0 / count(*), 4) AS keep_rate
    FROM ranked
    GROUP BY source
    ORDER BY source
    """,
)
def b_token_budget_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data selection under a token budget: rank documents by quality
    (n_chars plays the scored-quality proxy; t_quality_score /
    t_importance_weights are the production scorers), keep the best
    until {p}% of corpus tokens are spent, and report the per-source
    keep rates — the final assembly step of a training-data pipeline,
    where a fixed compute budget decides how deep into each source's
    quality distribution the run reaches (the budget twin of
    b_temperature_mixture, which reweights rather than truncates).

    Scale shape: the a_pareto_abc pattern on the document dimension —
    per-doc token counts reduce first, and the global ordered cumsum
    HERE is the semantics pin; the production path is
    ``token_budget_select_production`` below (operators/cumsum.py:
    range exchange + Arrow local cumsum + broadcast offsets — no
    single-partition window), tested bit-identical. The budget
    cutoff is pure integer cross-multiplication (cum*100 <=
    total*{p}); the (quality, doc_id) tiebreak pins the marginal doc.
    The per-source report is sources-sized.
    """.format(p=_BUDGET_PCT)
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        "source",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
        F.col("n_chars").alias("quality"),
    )
    ranked = scored.select(
        "doc_id",
        "source",
        "n_tokens",
        F.sum("n_tokens")
        .over(W.orderBy(F.desc("quality"), "doc_id"))
        .alias("cum_tokens"),
        F.sum("n_tokens").over(W.partitionBy()).alias("total_tokens"),
    )
    kept = F.col("cum_tokens") * 100 <= F.col("total_tokens") * _BUDGET_PCT
    return (
        ranked.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(kept.cast("long")).alias("n_kept"),
            F.sum(F.when(kept, F.col("n_tokens")).otherwise(0)).alias("tokens_kept"),
            F.round(F.sum(kept.cast("long")) / F.count("*"), 4).alias("keep_rate"),
        )
        .orderBy("source")
    )

def token_budget_select_production(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed form of ``b_token_budget_selection`` (round-4 verdict
    item 2): the gate query's ``sum(n_tokens) OVER (ORDER BY quality
    DESC, doc_id)`` moves the whole corpus-sized frame to ONE partition;
    here the cumulative token count comes from
    ``operators.cumsum.global_running_sum`` — one range exchange on the
    order key, Arrow-batched local cumsum, partitions-sized offsets
    broadcast back — and the corpus total arrives as a driver literal
    (it falls out of the offsets), so there is NO global window of any
    kind in the plan. Output is bit-identical to the gate query (integer
    arithmetic end-to-end up to the rounded keep_rate)."""
    from ..operators.cumsum import global_running_sum

    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        "source",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
        F.col("n_chars").alias("quality"),
    )
    ranked, total_tokens = global_running_sum(
        scored,
        "n_tokens",
        [F.desc("quality"), F.asc("doc_id")],
        out_col="cum_tokens",
    )
    # the budget threshold multiplies DRIVER-side: a corpus of ~240M+
    # tokens makes lit(total) an int32 literal whose *PCT constant-fold
    # overflows under ANSI (caught by a 20M-doc scale test); Python
    # ints are unbounded, and lit() widens to long automatically
    kept = F.col("cum_tokens") * 100 <= F.lit(int(total_tokens) * _BUDGET_PCT)
    return (
        ranked.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(kept.cast("long")).alias("n_kept"),
            F.sum(F.when(kept, F.col("n_tokens")).otherwise(0)).alias("tokens_kept"),
            F.round(F.sum(kept.cast("long")) / F.count("*"), 4).alias("keep_rate"),
        )
        .orderBy("source")
    )


# ===========================================================================
# section consolidated from plans/round6_ext.py (round-9 layout cleanup;
#   original registrations and docstrings preserved verbatim)
#   (module docstring carried in plans/dedup.py)
# ===========================================================================

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F
from .catalog import ORACLES, query

query("b_token_budget_production", oracle=ORACLES["b_token_budget_selection"])(
    token_budget_select_production
)

_SRC_BUDGET_ORACLE = f"""
    WITH scored AS (
      SELECT doc_id, source,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             CAST(n_chars AS BIGINT) AS quality
      FROM documents
    ),
    ranked AS (
      SELECT source, n_tokens,
             CAST(sum(n_tokens) OVER (
               PARTITION BY source ORDER BY quality DESC, doc_id
             ) AS BIGINT) AS cum_tokens,
             CAST(sum(n_tokens) OVER (PARTITION BY source) AS BIGINT) AS total_tokens
      FROM scored
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN cum_tokens * 100 <= total_tokens * {_BUDGET_PCT}
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(sum(CASE WHEN cum_tokens * 100 <= total_tokens * {_BUDGET_PCT}
                    THEN n_tokens ELSE 0 END) AS BIGINT) AS tokens_kept,
           round(sum(CASE WHEN cum_tokens * 100 <= total_tokens * {_BUDGET_PCT}
                     THEN 1 ELSE 0 END) * 1.0 / count(*), 4) AS keep_rate
    FROM ranked
    GROUP BY source
    ORDER BY source
    """

def _scored_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        "source",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
        F.col("n_chars").alias("quality"),
    )

def _src_budget_report(ranked: DataFrame, kept) -> DataFrame:
    return (
        ranked.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(kept.cast("long")).alias("n_kept"),
            F.sum(F.when(kept, F.col("n_tokens")).otherwise(0)).alias("tokens_kept"),
            F.round(F.sum(kept.cast("long")) / F.count("*"), 4).alias("keep_rate"),
        )
        .orderBy("source")
    )

@query("b_source_token_budget", oracle=_SRC_BUDGET_ORACLE)
def b_source_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token-budget selection, WINDOW form (the semantics
    pin): within each source, keep the best-quality docs until that
    source's {p}% token budget is spent. Kept as the oracle-shaped
    per-group ordered cumsum; the scale path is
    ``b_source_token_budget_production`` below, tested
    bit-identical.""".format(p=_BUDGET_PCT)
    scored = _scored_docs(spark, sf_dir)
    w = W.partitionBy("source").orderBy(F.desc("quality"), "doc_id")
    ranked = scored.select(
        "source",
        "n_tokens",
        F.sum("n_tokens").over(w).alias("cum_tokens"),
        F.sum("n_tokens").over(W.partitionBy("source")).alias("total_tokens"),
    )
    kept = F.col("cum_tokens") * 100 <= F.col("total_tokens") * _BUDGET_PCT
    return _src_budget_report(ranked, kept)

@query("b_source_token_budget_production", oracle=_SRC_BUDGET_ORACLE)
def b_source_token_budget_production(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token budget, PRODUCTION form: grouped distributed
    running sum (``operators/cumsum.py``) — no per-group window, so a
    hot source spans many partitions instead of one task; the
    groups-sized per-source totals broadcast-join in place of the
    ``sum() OVER (PARTITION BY source)`` companion window. Long
    arithmetic end-to-end (the per-source total times {p} never folds
    in int32). Bit-identical to the window pin.""".format(p=_BUDGET_PCT)
    from ..operators.cumsum import grouped_global_running_sum

    scored = _scored_docs(spark, sf_dir)
    ranked, totals = grouped_global_running_sum(
        scored,
        "n_tokens",
        ["source"],
        [F.desc("quality"), F.asc("doc_id")],
        out_col="cum_tokens",
    )
    tot_df = spark.createDataFrame(
        [(k[0], int(v)) for k, v in sorted(totals.items())],
        "source string, total_tokens long",
    )
    ranked = ranked.join(F.broadcast(tot_df), "source")
    kept = F.col("cum_tokens") * 100 <= F.col("total_tokens") * _BUDGET_PCT
    return _src_budget_report(ranked, kept)


# ===========================================================================
# section consolidated from plans/round6b_ext.py (round-9 layout cleanup;
#   original registrations and docstrings preserved verbatim)
#   (module docstring carried in plans/textops.py)
# ===========================================================================

from pyspark.sql import DataFrame, SparkSession, functions as F

_BUCKETS = [16, 32, 64, 128, 256, 512, 1024, 2048]

def _bucket_case_sql() -> str:
    arms = " ".join(
        f"WHEN n_tokens <= {b} THEN {b}" for b in _BUCKETS
    )
    return f"CASE {arms} ELSE 4096 END"

@query(
    "b_length_bucketing",
    oracle=f"""
    WITH lens AS (
      SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents
    ),
    bucketed AS (
      SELECT n_tokens, CAST({_bucket_case_sql()} AS BIGINT) AS bucket FROM lens
    )
    SELECT bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
           CAST(sum(bucket - n_tokens) AS BIGINT) AS padding_tokens,
           round(sum(bucket - n_tokens) * 1.0 / (count(*) * bucket), 4) AS waste_pct
    FROM bucketed GROUP BY bucket ORDER BY bucket
    """,
)
def b_length_bucketing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-length bucketing report: assign each document to the
    smallest power-of-two token bucket that holds it and measure the
    padding waste of pad-to-bucket batching (the standard pre-packing
    diagnostic — compare waste_pct here against d_pack_sequences'
    first-fit packing utilization to justify the packing pass).
    Buckets are a FIXED boundary CASE chain (identical on both
    engines), not float log2 — exact at the boundaries.

    Scale shape: pure map + bounded agg (one row per bucket); partial
    aggregation makes the shuffle bucket-count-sized."""
    docs = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split("text", " ")).cast("long")
    bucket = F.lit(4096).cast("long")
    for b in reversed(_BUCKETS):
        bucket = F.when(n_tokens <= b, F.lit(b).cast("long")).otherwise(bucket)
    lens = docs.select(n_tokens.alias("n_tokens"), bucket.alias("bucket"))
    return (
        lens.groupBy("bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("sum_tokens"),
            F.sum(F.col("bucket") - F.col("n_tokens")).alias("padding_tokens"),
            F.round(
                F.sum(F.col("bucket") - F.col("n_tokens"))
                * 1.0
                / (F.count("*") * F.col("bucket")),
                4,
            ).alias("waste_pct"),
        )
        .orderBy("bucket")
    )


# ===========================================================================
# section consolidated from plans/round6c_ext.py (round-9 layout cleanup;
#   original registrations and docstrings preserved verbatim)
#   (module docstring carried in plans/ann.py)
# ===========================================================================

from ..operators.cumsum import grouped_global_row_number

_N_EPOCHS = 2

_EPOCH_SHUFFLE_ORACLE = f"""
    WITH ex AS (
      SELECT doc_id, e AS epoch,
             md5(CAST(doc_id AS VARCHAR) || ':' || CAST(e AS VARCHAR)) AS h
      FROM documents, UNNEST(range(0, {_N_EPOCHS})) AS t(e)
    )
    SELECT CAST(epoch AS BIGINT) AS epoch, doc_id,
           CAST(row_number() OVER (
                  PARTITION BY epoch ORDER BY h, doc_id
                ) AS BIGINT) AS pos
    FROM ex ORDER BY epoch, pos
"""

def _epoch_hash_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    epochs = F.array(*[F.lit(e).cast("long") for e in range(_N_EPOCHS)])
    ex = docs.select("doc_id", F.explode(epochs).alias("epoch"))
    h = F.md5(
        F.concat(
            F.col("doc_id").cast("string"),
            F.lit(":"),
            F.col("epoch").cast("string"),
        )
    )
    return ex.withColumn("h", h)

@query("b_epoch_shuffle", oracle=_EPOCH_SHUFFLE_ORACLE)
def b_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-epoch shuffle order, WINDOW PIN: every epoch
    visits each document exactly once, in a pseudo-random order that is
    reproducible across reruns and uncorrelated between epochs — the
    order key is md5(doc_id ':' epoch), the same content-hash
    determinism b_hash_sample uses (never rand(): a task retry must not
    change the schedule). This form is the oracle-semantics pin; its
    per-epoch window sends each epoch's full corpus to one task, so
    production runs b_epoch_shuffle_production (same oracle, grouped
    distributed row-number)."""
    ex = _epoch_hash_frame(spark, sf_dir)
    pos = F.row_number().over(W.partitionBy("epoch").orderBy("h", "doc_id"))
    return (
        ex.select("epoch", "doc_id", pos.cast("long").alias("pos"))
        .orderBy("epoch", "pos")
    )

@query("b_epoch_shuffle_production", oracle=_EPOCH_SHUFFLE_ORACLE)
def b_epoch_shuffle_production(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-epoch shuffle order, PRODUCTION path: the same
    schedule as b_epoch_shuffle via the grouped distributed row-number
    (operators/cumsum.py::grouped_global_row_number) — a group-aware
    range exchange on (epoch, h, doc_id), Arrow local cumsum with a
    group-reset carry, per-(partition, epoch) offsets broadcast back.
    An epoch spans MANY partitions instead of one task sorting the
    whole corpus; the driver-side state is partitions + epochs rows.
    The driver certifies bit-identity by running both twins against the
    one oracle."""
    ex = _epoch_hash_frame(spark, sf_dir)
    out, _totals = grouped_global_row_number(
        ex, ["epoch"], [F.asc("h"), F.asc("doc_id")], out_col="pos"
    )
    return (
        out.select("epoch", "doc_id", F.col("pos").cast("long").alias("pos"))
        .orderBy("epoch", "pos")
    )


# ===========================================================================
# section consolidated from plans/round6m_ext.py (round-9 layout cleanup;
#   original registrations and docstrings preserved verbatim)
#
# Round-6 continuation, batch 12: preference-pair construction,
# tokenizer fertility, and the curriculum schedule.
#
# - ``b_preference_pairs``: deterministic RLHF-style preference pairs —
#   within each source, the i-th best document (by lexical-diversity
#   score) is paired with the i-th worst, yielding (chosen, rejected)
#   rows with a positive score gap; the standard way to mine contrastive
#   training pairs from a scored corpus without human labels.
# - ``t_tokenizer_fertility``: tokens-per-word and bytes-per-token per
#   language — the tokenizer-efficiency report every multilingual
#   training pipeline runs before fixing a vocab (high fertility on a
#   language means its share of the token budget silently inflates).
# - ``b_curriculum_schedule``: quality-tier curriculum stages (highest
#   tier trains first) with per-stage document/token counts and the
#   cumulative token fraction — the schedule table a curriculum-training
#   loop consumes directly.
# ===========================================================================

@query(
    "b_preference_pairs",
    oracle="""
    WITH tokens AS (
      SELECT doc_id, source, unnest(string_split(text, ' ')) AS word
      FROM documents
    ),
    scored AS (
      SELECT doc_id, source,
             round(count(DISTINCT word) * 1.0 / count(*), 4) AS score
      FROM tokens GROUP BY doc_id, source
    ),
    ranked AS (
      SELECT doc_id, source, score,
             row_number() OVER (PARTITION BY source
                                ORDER BY score DESC, doc_id) AS rn_top,
             row_number() OVER (PARTITION BY source
                                ORDER BY score, doc_id DESC) AS rn_bot,
             count(*) OVER (PARTITION BY source) AS n
      FROM scored
    )
    SELECT t.source,
           CAST(t.rn_top AS BIGINT) AS pair_rank,
           t.doc_id AS chosen_doc,
           b.doc_id AS rejected_doc,
           t.score AS chosen_score,
           b.score AS rejected_score,
           round(t.score - b.score, 4) AS score_gap
    FROM ranked t
    JOIN ranked b ON b.source = t.source AND b.rn_bot = t.rn_top
    WHERE t.rn_top <= t.n // 2
    ORDER BY t.source, pair_rank
    """,
)
def b_preference_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic preference-pair construction: per source, rank
    documents by lexical-diversity score (distinct-word ratio, the
    same feature t_quality_score uses) and pair the i-th best with the
    i-th worst for i <= floor(n/2) — (chosen, rejected) rows whose
    score gap is non-negative by construction and widest at pair_rank
    1. Mining contrastive pairs from heuristic scores is the standard
    bootstrap for reward-model / DPO data when no human labels exist;
    both rankings tiebreak on doc_id (descending on the bottom rank so
    an odd middle element pairs with itself and is excluded by the
    floor(n/2) cut, never double-counted).

    Scale shape: one exploded-token aggregation scores every document
    map-side-combined; ONE per-source rank window orders it (the
    bottom ranking is the exact reverse of the top ranking because
    (score, doc_id) is a strict total order, so rn_bot = n+1-rn_top is
    arithmetic, not a second sort); each ranked row then explodes into
    its <=2 pair roles and one (source, pair_rank) groupBy assembles
    the pairs — a single corpus scan and no self-join (the join form
    would duplicate the whole scoring subtree). Per-source frames
    bound the window; for a source too large to sort in one partition,
    the grouped distributed row-number (operators/cumsum.py) is the
    drop-in production twin, as pinned for b_epoch_shuffle.
    """
    docs = load_table(spark, sf_dir, "documents")
    tokens = docs.select(
        "doc_id", "source", F.explode(F.split("text", " ")).alias("word")
    )
    scored = tokens.groupBy("doc_id", "source").agg(
        F.round(F.countDistinct("word") / F.count("*"), 4).alias("score")
    )
    wtop = W.partitionBy("source").orderBy(F.col("score").desc(), "doc_id")
    ranked = scored.select(
        "doc_id",
        "source",
        "score",
        F.row_number().over(wtop).alias("rn_top"),
        F.count("*").over(W.partitionBy("source")).alias("n"),
    )
    roles = ranked.select(
        "source",
        "n",
        F.explode(
            F.array(
                F.struct(
                    F.lit("c").alias("role"),
                    F.col("rn_top").alias("k"),
                    F.col("doc_id").alias("d"),
                    F.col("score").alias("s"),
                ),
                F.struct(
                    F.lit("r").alias("role"),
                    (F.col("n") + 1 - F.col("rn_top")).alias("k"),
                    F.col("doc_id").alias("d"),
                    F.col("score").alias("s"),
                ),
            )
        ).alias("p"),
    ).filter(F.col("p.k") <= F.floor(F.col("n") / 2))
    c = F.col("p.role") == "c"
    return (
        roles.groupBy("source", F.col("p.k").alias("pair_rank"))
        .agg(
            F.max(F.when(c, F.col("p.d"))).alias("chosen_doc"),
            F.max(F.when(~c, F.col("p.d"))).alias("rejected_doc"),
            F.max(F.when(c, F.col("p.s"))).alias("chosen_score"),
            F.max(F.when(~c, F.col("p.s"))).alias("rejected_score"),
        )
        .select(
            "source",
            F.col("pair_rank").cast("long").alias("pair_rank"),
            "chosen_doc",
            "rejected_doc",
            "chosen_score",
            "rejected_score",
            F.round(
                F.col("chosen_score") - F.col("rejected_score"), 4
            ).alias("score_gap"),
        )
        .orderBy("source", "pair_rank")
    )

_CURR_STOPWORDS = ("the", "a", "of", "and", "to", "in")

@query(
    "b_curriculum_schedule",
    oracle=f"""
    WITH tokens AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
    ),
    stats AS (
      SELECT doc_id,
             CAST(count(*) AS BIGINT) AS n_words,
             round(avg(length(word)), 4) AS awl,
             round(sum(CASE WHEN word IN {_CURR_STOPWORDS} THEN 1 ELSE 0
                       END) * 1.0 / count(*), 4) AS sw,
             round(count(DISTINCT word) * 1.0 / count(*), 4) AS dr
      FROM tokens GROUP BY doc_id
    ),
    tiers AS (
      SELECT n_words,
             (CASE WHEN n_words >= 50 THEN 1 ELSE 0 END)
           + (CASE WHEN sw >= 0.02 THEN 1 ELSE 0 END)
           + (CASE WHEN dr >= 0.1 THEN 1 ELSE 0 END)
           + (CASE WHEN awl >= 3.0 AND awl <= 10.0 THEN 1 ELSE 0 END)
             AS tier
      FROM stats
    ),
    stages AS (
      SELECT tier, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_words) AS BIGINT) AS stage_tokens
      FROM tiers GROUP BY tier
    )
    SELECT CAST(row_number() OVER (ORDER BY tier DESC) AS BIGINT)
             AS stage_rank,
           CAST(tier AS INT) AS quality_tier,
           n_docs, stage_tokens,
           CAST(sum(stage_tokens) OVER (ORDER BY tier DESC) AS BIGINT)
             AS cum_tokens,
           round(sum(stage_tokens) OVER (ORDER BY tier DESC) * 1.0
                 / sum(stage_tokens) OVER (), 4) AS cum_token_frac
    FROM stages
    ORDER BY stage_rank
    """,
)
def b_curriculum_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum schedule over quality tiers: documents are scored
    with the exact t_quality_score rule count (0-4 thresholds passed),
    each tier becomes a training stage — HIGHEST tier first, the
    clean-data-early curriculum — and the report carries per-stage
    document/token counts plus cumulative tokens and the cumulative
    token fraction. A training loop consumes this table directly: stage
    boundaries in tokens, and cum_token_frac says where (e.g.) the
    50%-budget point lands in quality space.

    Scale shape: one exploded-token aggregation to per-doc stats
    (map-side combined), one groupBy to the 5-row tier frame; every
    window (ranking, running sum, grand total) runs over that 5-row
    frame — the data-sized work is exactly two shuffles and nothing
    window-shaped ever sees a document row.
    """
    docs = load_table(spark, sf_dir, "documents")
    tokens = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    )
    stats = tokens.groupBy("doc_id").agg(
        F.count("*").alias("n_words"),
        F.round(F.avg(F.length("word")), 4).alias("awl"),
        F.round(
            F.sum(F.col("word").isin(*_CURR_STOPWORDS).cast("int"))
            / F.count("*"),
            4,
        ).alias("sw"),
        F.round(F.countDistinct("word") / F.count("*"), 4).alias("dr"),
    )
    tier = (
        (F.col("n_words") >= 50).cast("int")
        + (F.col("sw") >= 0.02).cast("int")
        + (F.col("dr") >= 0.1).cast("int")
        + ((F.col("awl") >= 3.0) & (F.col("awl") <= 10.0)).cast("int")
    )
    stages = (
        stats.select(tier.alias("tier"), "n_words")
        .groupBy("tier")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_words").cast("long").alias("stage_tokens"),
        )
    )
    word = W.orderBy(F.col("tier").desc())
    wcum = word.rowsBetween(W.unboundedPreceding, W.currentRow)
    wall = W.partitionBy()
    return (
        stages.select(
            F.row_number().over(word).cast("long").alias("stage_rank"),
            F.col("tier").cast("int").alias("quality_tier"),
            "n_docs",
            "stage_tokens",
            F.sum("stage_tokens").over(wcum).cast("long").alias(
                "cum_tokens"
            ),
            F.round(
                F.sum("stage_tokens").over(wcum)
                * 1.0
                / F.sum("stage_tokens").over(wall),
                4,
            ).alias("cum_token_frac"),
        )
        .orderBy("stage_rank")
    )


# ===========================================================================
# section consolidated from plans/round7_ext.py (round-9 layout cleanup;
#   original registrations and docstrings preserved verbatim)
#   (module docstring carried in plans/textops.py)
# ===========================================================================

from pyspark.sql import DataFrame, SparkSession

_KFOLDS = 5

@query(
    "b_kfold_assign",
    oracle=f"""
    WITH assigned AS (
      SELECT doc_id, source,
             len(string_split(text, ' ')) AS n_tokens,
             (instr('0123456789abcdef',
                    substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1)
               % {_KFOLDS} AS fold
      FROM documents
    )
    SELECT fold,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
           CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
           round(count(*) * 1.0 /
                 (SELECT count(*) FROM documents), 4) AS doc_share
    FROM assigned GROUP BY fold ORDER BY fold
    """,
)
def b_kfold_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash k-fold assignment (k=5) with per-fold balance
    stats — the split primitive under cross-validation and ablation
    sweeps. Fold = first md5 nibble of the doc key mod k: stable across
    engines, runs, and cluster sizes (no RNG state, no sampling
    order-dependence), so every downstream job re-derives the identical
    split from the key alone — the property that makes folds safe to
    recompute on 1000 executors instead of materializing an assignment
    table. Balance columns (doc share, token mass, source spread) are
    the audit that hash folds are size- and mixture-balanced.

    Scale shape: one scan, fold computed in codegen, one
    map-side-combined groupBy(fold) → k rows; the grand-total share
    divides by a scalar subquery both engines fold to a literal.
    """
    docs = load_table(spark, sf_dir, "documents")
    # same portable nibble-hash as b_hash_sample: first md5 hex digit
    # looked up in the hex alphabet, mod k (identical on both engines)
    fold = (
        F.expr("locate(substr(md5(cast(doc_id as string)), 1, 1), '0123456789abcdef') - 1")
        % _KFOLDS
    )
    assigned = docs.select(
        fold.alias("fold"),
        "source",
        F.size(F.split("text", " ")).alias("n_tokens"),
    )
    total = docs.count()  # parquet metadata count, one footer read
    return (
        assigned.groupBy("fold")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
            F.countDistinct("source").cast("long").alias("n_sources"),
            F.round(F.count("*") / F.lit(float(total)), 4).alias("doc_share"),
        )
        .orderBy("fold")
    )


# ===========================================================================
# section consolidated from plans/round7b_ext.py (round-9 layout cleanup;
#   original registrations and docstrings preserved verbatim)
#
# Round-7 continuation operators, batch 2: duplicate-aware weighting,
# budgeted mixing, causal readout, robust statistics.
#
# - d_soft_dedup_weights — duplicate-aware sampling weights (keep every
#   copy, weight 1/cluster-size) with per-source effective sizes
# - b_token_waterline    — uniform water-filling token allocation under a
#   corpus budget (the per-source cap solver of data-mixing recipes)
# - b_did_estimator      — difference-in-differences readout with pooled SE
# - a_winsorized_stats   — p05/p95-winsorized mean/stddev vs raw
#
# All DataFrame-API compositions with DuckDB oracles; the waterline's
# solver runs entirely in window functions over the SOURCES frame (20
# rows here, thousands at worst in production — never data-sized).
# ===========================================================================

_WATERLINE_BUDGET_FRAC = 0.5

@query(
    "b_token_waterline",
    oracle=f"""
    WITH tot AS (
      SELECT source, CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS t
      FROM documents GROUP BY source
    ),
    s AS (
      SELECT source, t,
             row_number() OVER (ORDER BY t, source) AS rn,
             sum(t) OVER (ORDER BY t, source) AS prefix,
             count(*) OVER () AS n,
             sum(t) OVER () AS grand
      FROM tot
    ),
    b AS (
      SELECT *, CAST(floor(grand * {_WATERLINE_BUDGET_FRAC}) AS BIGINT) AS budget
      FROM s
    ),
    j AS (
      SELECT *,
             coalesce(max(CASE WHEN prefix + (n - rn) * t <= budget
                               THEN rn END) OVER (), 0) AS jstar
      FROM b
    ),
    cap AS (
      SELECT *,
             (budget - coalesce(max(CASE WHEN rn = jstar THEN prefix END)
                                  OVER (), 0))
               * 1.0 / (n - jstar) AS c
      FROM j
    )
    SELECT source, t AS tokens,
           round(CASE WHEN t < c THEN t ELSE c END, 2) AS allocated,
           round((CASE WHEN t < c THEN t ELSE c END) / t, 4) AS kept_frac,
           round(c, 2) AS waterline,
           budget
    FROM cap ORDER BY source
    """,
)
def b_token_waterline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uniform water-filling token allocation: given a corpus token
    budget B (here 50 % of the total), find the per-source cap c — the
    WATERLINE — such that Σ_s min(tokens_s, c) = B, and report each
    source's allocation. This is the cap solver behind 'take small
    sources whole, cap the giants' mixing recipes (the uniform-fill
    special case of temperature mixing; b_temperature_mixture is the
    exponent family, this is the budget-exact one).

    Closed form, no iteration: sort sources by size ascending; j* = the
    largest rank whose full take still fits (prefix_j + (n−j)·t_j ≤ B);
    c = (B − prefix_{j*}) / (n − j*). Every step is a window function
    over the SOURCES frame — the corpus is touched exactly once (the
    token-count groupBy); the solver itself runs on a frame whose size
    is the number of sources (thousands at most), where a global window
    is the correct plan, not a bottleneck.
    """
    docs = load_table(spark, sf_dir, "documents")
    tot = (
        docs.select("source", F.size(F.split("text", " ")).alias("nt"))
        .groupBy("source")
        .agg(F.sum("nt").cast("long").alias("t"))
    )
    return waterline_allocate(tot, _WATERLINE_BUDGET_FRAC)

def waterline_allocate(tot: DataFrame, budget_frac: float) -> DataFrame:
    """The water-filling solver over a (source, t) totals frame —
    extracted so the closed form is property-testable on arbitrary
    distributions (tests/test_properties.py pits it against a python
    bisection reference under hypothesis)."""
    order = W.orderBy("t", "source")
    everything = W.orderBy("t", "source").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    s = tot.select(
        "source",
        "t",
        F.row_number().over(order).alias("rn"),
        F.sum("t").over(order).alias("prefix"),
        F.count("*").over(everything).alias("n"),
        F.sum("t").over(everything).alias("grand"),
    ).withColumn(
        "budget",
        F.floor(F.col("grand") * budget_frac).cast("long"),
    )
    jstar = F.coalesce(
        F.max(
            F.when(
                F.col("prefix") + (F.col("n") - F.col("rn")) * F.col("t")
                <= F.col("budget"),
                F.col("rn"),
            )
        ).over(everything),
        F.lit(0),
    )
    s = s.withColumn("jstar", jstar)
    prefix_at_j = F.coalesce(
        F.max(F.when(F.col("rn") == F.col("jstar"), F.col("prefix"))).over(
            everything
        ),
        F.lit(0),
    )
    s = s.withColumn(
        "c", (F.col("budget") - prefix_at_j) * 1.0 / (F.col("n") - F.col("jstar"))
    )
    alloc = F.least(F.col("t").cast("double"), F.col("c"))
    return s.select(
        "source",
        F.col("t").alias("tokens"),
        F.round(alloc, 2).alias("allocated"),
        F.round(alloc / F.col("t"), 4).alias("kept_frac"),
        F.round(F.col("c"), 2).alias("waterline"),
        "budget",
    ).orderBy("source")


# ===========================================================================
# section consolidated from plans/round7d_ext.py (round-9 layout cleanup;
#   original registrations and docstrings preserved verbatim)
#   (module docstring carried in plans/dedup.py)
# ===========================================================================

_MIX_TAU = 0.7

@query(
    "b_dedup_aware_mixture",
    oracle=f"""
    WITH c AS (
      SELECT source,
             len(string_split(text, ' ')) AS nt,
             count(*) OVER (PARTITION BY md5(text)) AS csz
      FROM documents
    ),
    eff AS (
      SELECT source,
             CAST(sum(nt) AS BIGINT) AS raw_tokens,
             sum(nt * 1.0 / csz) AS eff_tokens
      FROM c GROUP BY source
    )
    SELECT source, raw_tokens,
           round(eff_tokens, 2) AS eff_tokens,
           round(pow(eff_tokens, {_MIX_TAU})
                 / sum(pow(eff_tokens, {_MIX_TAU})) OVER (), 6) AS weight
    FROM eff ORDER BY source
    """,
)
def b_dedup_aware_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature mixture weights computed on EFFECTIVE token counts —
    tokens discounted by 1/duplicate-cluster-size — so a source whose
    bulk is copies doesn't buy sampling weight with them (the
    composition of d_soft_dedup_weights into b_temperature_mixture's
    τ-exponent family; τ=0.7 here, the flattening regime). Without the
    discount, crawl sources with high duplication are systematically
    oversampled relative to their unique content.

    Scale shape: one corpus pass — the content-hash window attaches
    cluster size, tokens counted in the same projection, one
    groupBy(source); the weight normalization is a window over the
    SOURCES frame (bounded). Nothing here grows super-linearly: the
    md5 window is the same single shuffle d_soft_dedup_weights costs.
    """
    docs = load_table(spark, sf_dir, "documents")
    csz = F.count("*").over(
        W.partitionBy(F.md5(F.encode(F.col("text"), "UTF-8")))
    )
    c = docs.select(
        "source",
        F.size(F.split("text", " ")).alias("nt"),
        csz.alias("csz"),
    )
    eff = c.groupBy("source").agg(
        F.sum("nt").cast("long").alias("raw_tokens"),
        F.sum(F.col("nt") * 1.0 / F.col("csz")).alias("eff_tokens"),
    )
    everything = W.orderBy("source").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    powed = F.pow(F.col("eff_tokens"), _MIX_TAU)
    return eff.select(
        "source",
        "raw_tokens",
        F.round("eff_tokens", 2).alias("eff_tokens"),
        F.round(powed / F.sum(powed).over(everything), 6).alias("weight"),
    ).orderBy("source")
