"""Round-6 continuation, batch 4: approximate-membership dedup (Bloom),
behavioral Markov transitions, tokenizer-induction pair stats, and the
A/B experiment readout.

Four more first-class operators a training-data / analytics engine
needs (north-star extensions per the build brief — the reference repo,
/root/reference/etl/transform.py, has keep-last row dedup and column
shaping only):

- ``d_bloom_dedup_report``: a DISTRIBUTED Bloom filter built over the
  corpus fingerprint set with a map-side-combined ``bit_or`` (the
  filter — not the key set — crosses the wire), probed by the daily
  batch, with exact false-positive accounting. This is the streaming /
  incremental dedup shape when the corpus distinct-key set no longer
  fits a broadcast: membership becomes a bounded bitmap instead of a
  100 TB anti-join side.
- ``b_markov_transitions``: per-user next-event transition matrix with
  row-normalized probabilities — the behavioral summary backing "what
  happens after a click?".
- ``t_bpe_pair_stats``: the first BPE merge iteration — corpus-weighted
  adjacent character-pair frequencies within words (Sennrich et al.'s
  merge-candidate scan), the tokenizer-induction primitive.
- ``b_ab_experiment_report``: deterministic hash-based variant
  assignment (never rand()) + conversion readout with pooled
  two-proportion z-score — the experimentation twin of a_welch_ttest
  for binary outcomes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..sources.tables import load_table
from .catalog import query

# --------------------------------------------------------------------------
# d_bloom_dedup_report — distributed Bloom filter + exact FP accounting
# --------------------------------------------------------------------------

# m = 4096 bits packed into 32-bit words, k = 2 hash slices of the md5
# content hash. Sized so the sf0.01 gate run shows a SMALL-but-nonzero
# false-positive column (~2% at a few hundred corpus keys — m is the
# dial: production sizes m ~ 10 bits/key for ~1% FP at k=7). Positions
# come from disjoint hex slices of ONE md5 — the standard
# several-hashes-from-one-digest trick.
_BLOOM_M = 4096
_BLOOM_WORD = 32


def _hex2_digit_sql(h: str, i: int) -> str:
    return f"(instr('0123456789abcdef', substr({h}, {i}, 1)) - 1)"


def _hex3_to_int_sql(h: str, start: int) -> str:
    """Engine-portable int value of the 3-hex-char slice at ``start``."""
    return (
        f"({_hex2_digit_sql(h, start)} * 256"
        f" + {_hex2_digit_sql(h, start + 1)} * 16"
        f" + {_hex2_digit_sql(h, start + 2)})"
    )


_BLOOM_CTES = f"""
    WITH keyed AS (
      SELECT source, doc_id, md5(text) AS h FROM documents
    ),
    corpus_pos AS (
      SELECT {_hex3_to_int_sql('h', 1)} AS pos FROM keyed WHERE doc_id % 3 <> 0
      UNION ALL
      SELECT {_hex3_to_int_sql('h', 4)} AS pos FROM keyed WHERE doc_id % 3 <> 0
    ),
    filt AS (
      SELECT pos // {_BLOOM_WORD} AS word,
             bit_or(CAST(1 AS BIGINT) << (pos % {_BLOOM_WORD})) AS bits
      FROM corpus_pos GROUP BY 1
    ),
    corpus_keys AS (
      SELECT DISTINCT h FROM keyed WHERE doc_id % 3 <> 0
    ),
    batch_keys AS (
      SELECT DISTINCT source, h,
             {_hex3_to_int_sql('h', 1)} AS p1,
             {_hex3_to_int_sql('h', 4)} AS p2
      FROM keyed WHERE doc_id % 3 = 0
    ),
    probe AS (
      SELECT b.source, b.h,
             min(coalesce((f.bits >> (t.pos % {_BLOOM_WORD})) & 1, 0)) AS all_set
      FROM batch_keys b,
           UNNEST([b.p1, b.p2]) AS t(pos)
      LEFT JOIN filt f ON f.word = t.pos // {_BLOOM_WORD}
      GROUP BY b.source, b.h
    ),
    flags AS (
      SELECT p.source,
             CAST(p.all_set AS INT) AS bloom_pos,
             CASE WHEN c.h IS NOT NULL THEN 1 ELSE 0 END AS exact_dup
      FROM probe p LEFT JOIN corpus_keys c ON c.h = p.h
    )
"""


@query(
    "d_bloom_dedup_report",
    oracle=_BLOOM_CTES
    + """
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_keys,
           CAST(sum(bloom_pos) AS BIGINT) AS bloom_positive,
           CAST(sum(exact_dup) AS BIGINT) AS exact_dups,
           CAST(sum(CASE WHEN bloom_pos = 1 AND exact_dup = 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS false_positives,
           round(sum(CASE WHEN bloom_pos = 1 AND exact_dup = 0
                          THEN 1 ELSE 0 END) * 1.0
                 / NULLIF(count(*) - sum(exact_dup), 0), 4) AS fp_rate
    FROM flags
    GROUP BY source
    ORDER BY source
    """,
)
def d_bloom_dedup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter membership dedup with exact false-positive
    accounting: the corpus slice (doc_id % 3 != 0) builds a 4096-bit /
    k=2 Bloom filter over md5 content hashes; the batch slice probes
    it, and each batch key's Bloom verdict is reconciled against exact
    membership — per source: key count, Bloom positives, exact dups,
    false positives (Bloom has no false negatives by construction; the
    driver's value-hash would catch one), and the FP rate among true
    negatives.

    Scale shape: the filter build never shuffles corpus-sized data —
    positions partial-aggregate with a map-side ``bit_or`` into at most
    m/32 = 128 (word, bits) rows per task before the exchange, and the
    probe broadcasts that bounded bitmap onto the batch. Only the DAY'S
    batch shuffles (its own distinct + the probe groupBy). The exact
    corpus-side distinct here exists purely to MEASURE the FP rate; a
    production pipeline runs the filter as the cheap first pass and
    anti-joins only Bloom-positive keys (a filter-sized fraction)
    against the corpus. When m outgrows a broadcast (10^11 keys x 10
    bits), the filter shards by key-hash prefix and the probe
    co-partitions on the same prefix — each shard stays a bitmap join.
    m=4096 is the demo dial: small enough that the sf0.01 gate run
    exercises the false-positive path (~2% FP) while staying far from
    saturation (production sizes m ~ 10 bits/key, k=7 for ~1%).
    """
    docs = load_table(spark, sf_dir, "documents")
    keyed = docs.select("source", "doc_id", F.md5("text").alias("h"))
    p1 = F.conv(F.substring("h", 1, 3), 16, 10).cast("int")
    p2 = F.conv(F.substring("h", 4, 3), 16, 10).cast("int")

    corpus = keyed.filter(F.col("doc_id") % 3 != 0)
    batch = keyed.filter(F.col("doc_id") % 3 == 0)

    corpus_pos = corpus.select(F.explode(F.array(p1, p2)).alias("pos"))
    filt = (
        corpus_pos.groupBy(
            F.floor(F.col("pos") / _BLOOM_WORD).cast("int").alias("word")
        )
        .agg(
            F.bit_or(
                F.expr(f"shiftleft(CAST(1 AS BIGINT), pos % {_BLOOM_WORD})")
            ).alias("bits")
        )
    )

    batch_keys = (
        batch.select("source", "h", p1.alias("p1"), p2.alias("p2")).distinct()
    )
    probe = (
        batch_keys.select(
            "source", "h", F.explode(F.array("p1", "p2")).alias("pos")
        )
        .join(
            F.broadcast(filt),
            F.floor(F.col("pos") / _BLOOM_WORD).cast("int") == F.col("word"),
            "left",
        )
        .select(
            "source",
            "h",
            F.coalesce(
                F.expr(f"shiftright(bits, pos % {_BLOOM_WORD}) & 1"),
                F.lit(0).cast("long"),
            ).alias("bit_set"),
        )
        .groupBy("source", "h")
        .agg(F.min("bit_set").alias("all_set"))
    )

    corpus_keys = corpus.select("h").distinct().withColumn("in_corpus", F.lit(1))
    flags = probe.join(corpus_keys, "h", "left").select(
        "source",
        F.col("all_set").cast("int").alias("bloom_pos"),
        F.coalesce("in_corpus", F.lit(0)).alias("exact_dup"),
    )
    fp = (F.col("bloom_pos") == 1).cast("int") * (
        F.col("exact_dup") == 0
    ).cast("int")
    return (
        flags.groupBy("source")
        .agg(
            F.count("*").alias("n_keys"),
            F.sum("bloom_pos").cast("long").alias("bloom_positive"),
            F.sum("exact_dup").cast("long").alias("exact_dups"),
            F.sum(fp).cast("long").alias("false_positives"),
        )
        .select(
            "source",
            "n_keys",
            "bloom_positive",
            "exact_dups",
            "false_positives",
            F.round(
                F.col("false_positives")
                * 1.0
                / F.nullif(
                    (F.col("n_keys") - F.col("exact_dups")).cast("long"),
                    F.lit(0).cast("long"),
                ),
                4,
            ).alias("fp_rate"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# b_markov_transitions — next-event transition matrix
# --------------------------------------------------------------------------


@query(
    "b_markov_transitions",
    oracle="""
    WITH seq AS (
      SELECT event_type AS from_type,
             lead(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS to_type
      FROM events
    ),
    cnt AS (
      SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
      FROM seq WHERE to_type IS NOT NULL
      GROUP BY from_type, to_type
    )
    SELECT from_type, to_type, n,
           round(n * 1.0 / sum(n) OVER (PARTITION BY from_type), 4) AS p
    FROM cnt
    ORDER BY from_type, to_type
    """,
)
def b_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over the event stream: for
    every (from, to) event-type pair, the observed next-event count per
    user timeline (ts with event_id tiebreak) and the row-normalized
    transition probability — "after a click, 24% of next actions are a
    purchase". Timeline edges (a user's last event) emit no transition.

    Scale shape: ONE data-sized shuffle — the per-user lead() window on
    user_id; the (from, to) count partial-aggregates map-side down to
    at most |types|^2 rows, and the row normalization is a window over
    that bounded matrix (|types| partitions of |types| rows), never
    over event-sized data.
    """
    ev = load_table(spark, sf_dir, "events")
    nxt = F.lead("event_type").over(
        W.partitionBy("user_id").orderBy("ts", "event_id")
    )
    cnt = (
        ev.select(F.col("event_type").alias("from_type"), nxt.alias("to_type"))
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count("*").alias("n"))
    )
    return cnt.select(
        "from_type",
        "to_type",
        "n",
        F.round(
            F.col("n") * 1.0 / F.sum("n").over(W.partitionBy("from_type")), 4
        ).alias("p"),
    ).orderBy("from_type", "to_type")


# --------------------------------------------------------------------------
# t_bpe_pair_stats — first BPE merge-candidate scan
# --------------------------------------------------------------------------

_BPE_TOP = 20


@query(
    "t_bpe_pair_stats",
    oracle=f"""
    WITH w AS (
      SELECT unnest(string_split(text, ' ')) AS word FROM documents
    ),
    wc AS (
      SELECT word, count(*) AS cnt FROM w WHERE len(word) >= 2 GROUP BY word
    ),
    pr AS (
      SELECT substr(word, i, 1) || ' ' || substr(word, i + 1, 1) AS pair, cnt
      FROM wc, UNNEST(range(1, len(word))) AS t(i)
    )
    SELECT pair, CAST(sum(cnt) AS BIGINT) AS n
    FROM pr GROUP BY pair
    ORDER BY n DESC, pair
    LIMIT {_BPE_TOP}
    """,
)
def t_bpe_pair_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First BPE merge iteration (Sennrich et al.): corpus-weighted
    adjacent character-pair frequencies within words, top {20} merge
    candidates — the scan a byte-pair-encoding tokenizer trainer runs
    every merge round (here at character granularity; subsequent rounds
    would re-run it over the merged symbol sequences).

    Scale shape: the corpus-sized explode collapses FIRST to the
    vocabulary (word, count) frame via a map-side-combined groupBy —
    pair enumeration then runs over the vocabulary, weighted by count,
    never over raw corpus positions; the pair aggregate is bounded by
    alphabet^2 and the top-k is a TakeOrderedAndProject (no global
    sort).
    """
    docs = load_table(spark, sf_dir, "documents")
    wc = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.length("word") >= 2)
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )
    pairs = F.transform(
        F.sequence(F.lit(1), F.length("word") - 1),
        lambda i: F.concat(
            F.col("word").substr(i, F.lit(1)),
            F.lit(" "),
            F.col("word").substr(i + 1, F.lit(1)),
        ),
    )
    return (
        wc.select(F.explode(pairs).alias("pair"), "cnt")
        .groupBy("pair")
        .agg(F.sum("cnt").cast("long").alias("n"))
        .orderBy(F.desc("n"), F.asc("pair"))
        .limit(_BPE_TOP)
    )


# --------------------------------------------------------------------------
# b_ab_experiment_report — hash assignment + two-proportion z readout
# --------------------------------------------------------------------------


# Conversion = "heavy purchaser" (>= {_CONV_MIN_PURCHASES} purchase
# events): the ever-purchased flag saturates at ~100% on the synthetic
# stream (every user buys eventually), which would degenerate every
# rate to 1.0 and the z to NULL; the threshold sits near the median
# purchases-per-user so both arms see mid-range rates at every SF.
_CONV_MIN_PURCHASES = 14

# Shared two-CTE prefix (also used by b_power_analysis in
# round6g_ext): per-user conversion flag, then the deterministic
# hash-nibble arm assignment.
_AB_PER_USER_CTES = f"""
    pu0 AS (
      SELECT user_id,
             CASE WHEN sum(CASE WHEN event_type = 'purchase'
                                THEN 1 ELSE 0 END) >= {_CONV_MIN_PURCHASES}
                  THEN 1 ELSE 0 END AS conv
      FROM events GROUP BY user_id
    ),
    per_user AS (
      SELECT user_id,
             CASE WHEN {_hex2_digit_sql("md5(CAST(user_id AS VARCHAR))", 1)} < 8
                  THEN 'A' ELSE 'B' END AS variant,
             conv
      FROM pu0
    )
"""


@query(
    "b_ab_experiment_report",
    oracle=f"""
    WITH {_AB_PER_USER_CTES},
    arms AS (
      SELECT variant, count(*) AS n, sum(conv) AS c
      FROM per_user GROUP BY variant
    ),
    wide AS (
      SELECT sum(CASE WHEN variant = 'A' THEN n ELSE 0 END) AS n_a,
             sum(CASE WHEN variant = 'A' THEN c ELSE 0 END) AS c_a,
             sum(CASE WHEN variant = 'B' THEN n ELSE 0 END) AS n_b,
             sum(CASE WHEN variant = 'B' THEN c ELSE 0 END) AS c_b
      FROM arms
    )
    SELECT CAST(n_a AS BIGINT) AS n_a, CAST(c_a AS BIGINT) AS conv_a,
           CAST(n_b AS BIGINT) AS n_b, CAST(c_b AS BIGINT) AS conv_b,
           round(c_a * 1.0 / NULLIF(n_a, 0), 4) AS rate_a,
           round(c_b * 1.0 / NULLIF(n_b, 0), 4) AS rate_b,
           round((c_b * 1.0 / NULLIF(n_b, 0) - c_a * 1.0 / NULLIF(n_a, 0))
                 / NULLIF(sqrt(((c_a + c_b) * 1.0 / (n_a + n_b))
                               * (1 - (c_a + c_b) * 1.0 / (n_a + n_b))
                               * (1.0 / n_a + 1.0 / n_b)), 0), 4) AS z_score
    FROM wide
    """,
)
def b_ab_experiment_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout: users are assigned to variants by the
    first nibble of md5(user_id) (deterministic content-hash
    assignment — never rand(), so reruns and task retries keep the same
    arms; the b_hash_sample discipline), conversion is "heavy
    purchaser" (>= {14} purchase events — the ever-purchased flag
    saturates at ~100% on this stream, degenerating every rate to 1.0),
    and the one-row report carries per-arm sizes,
    conversion counts/rates, and the pooled two-proportion z-score —
    the binary-outcome twin of a_welch_ttest.

    Scale shape: one user-keyed shuffle for the per-user conversion
    flag (map-side partial max), then a 2-row arm aggregate folded to
    one row by conditional sums — the z arithmetic runs on scalars.
    Degenerate arms (empty, or pooled rate 0/1 making the variance 0)
    yield NULL via NULLIF on both engines instead of a division error.
    """
    ev = load_table(spark, sf_dir, "events")
    nib = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 1), 16, 10
    ).cast("int")
    per_user = (
        ev.groupBy("user_id")
        .agg(
            (
                F.sum(
                    F.when(F.col("event_type") == "purchase", 1).otherwise(0)
                )
                >= _CONV_MIN_PURCHASES
            )
            .cast("int")
            .alias("conv")
        )
        .withColumn("variant", F.when(nib < 8, "A").otherwise("B"))
    )
    wide = per_user.agg(
        F.sum(F.when(F.col("variant") == "A", 1).otherwise(0))
        .cast("long")
        .alias("n_a"),
        F.sum(F.when(F.col("variant") == "A", F.col("conv")).otherwise(0))
        .cast("long")
        .alias("c_a"),
        F.sum(F.when(F.col("variant") == "B", 1).otherwise(0))
        .cast("long")
        .alias("n_b"),
        F.sum(F.when(F.col("variant") == "B", F.col("conv")).otherwise(0))
        .cast("long")
        .alias("c_b"),
    )
    pooled = (F.col("c_a") + F.col("c_b")) * 1.0 / (F.col("n_a") + F.col("n_b"))
    z_den = F.sqrt(
        pooled * (1 - pooled) * (1.0 / F.col("n_a") + 1.0 / F.col("n_b"))
    )
    return wide.select(
        F.col("n_a"),
        F.col("c_a").alias("conv_a"),
        F.col("n_b"),
        F.col("c_b").alias("conv_b"),
        F.round(
            F.col("c_a") * 1.0 / F.nullif(F.col("n_a"), F.lit(0).cast("long")),
            4,
        ).alias("rate_a"),
        F.round(
            F.col("c_b") * 1.0 / F.nullif(F.col("n_b"), F.lit(0).cast("long")),
            4,
        ).alias("rate_b"),
        F.round(
            (
                F.col("c_b") * 1.0
                / F.nullif(F.col("n_b"), F.lit(0).cast("long"))
                - F.col("c_a") * 1.0
                / F.nullif(F.col("n_a"), F.lit(0).cast("long"))
            )
            / F.nullif(z_den, F.lit(0.0)),
            4,
        ).alias("z_score"),
    )
