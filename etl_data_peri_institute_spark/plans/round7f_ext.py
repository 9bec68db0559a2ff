"""Round-7 continuation operators, batch 6: sequential monitoring,
hashing-trick featurization, OHLC bars.

- b_sequential_mean_monitor — always-valid-style sequential z path for
  the treat/control mean difference with a first-crossing-day report
- t_feature_hashing         — hashing-trick bag-of-words featurization
  census (the classic fixed-width featurizer for streaming ML)
(A daily OHLC variant was considered and dropped — ts_ohlc_hourly in
plans/timeseries.py already covers the OHLC downsampling shape.)

All single-scan + bounded-frame window plans with DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .catalog import query

_SEQ_BOUNDARY = 2.8  # early-stopping z boundary (rough always-valid bound)


@query(
    "b_sequential_mean_monitor",
    oracle=f"""
    WITH cells AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             (instr('0123456789abcdef',
                    substr(md5(CAST(user_id AS VARCHAR)), 1, 1)) - 1) % 2
               AS treat,
             count(*) AS n, sum(value) AS s, sum(value * value) AS ss
      FROM events GROUP BY 1, 2, 3
    ),
    cum AS (
      SELECT event_type, d, treat,
             sum(n) OVER w AS cn,
             sum(s) OVER w AS cs,
             sum(ss) OVER w AS css
      FROM cells
      WINDOW w AS (PARTITION BY event_type, treat ORDER BY d)
    ),
    wide AS (
      SELECT a.event_type, a.d,
             a.cn AS nt, a.cs / a.cn AS mt,
             (a.css - a.cs * a.cs / a.cn) / (a.cn - 1) AS vt,
             b.cn AS nc, b.cs / b.cn AS mc,
             (b.css - b.cs * b.cs / b.cn) / (b.cn - 1) AS vc
      FROM cum a JOIN cum b
        ON a.event_type = b.event_type AND a.d = b.d
       AND a.treat = 1 AND b.treat = 0
      WHERE a.cn > 1 AND b.cn > 1
    ),
    zpath AS (
      SELECT event_type, d,
             round((mt - mc) / sqrt(vt / nt + vc / nc), 6) AS z
      FROM wide
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_days,
           round(max(CASE WHEN rn_last = 1 THEN z END), 4) AS final_z,
           CAST(coalesce(min(CASE WHEN abs(z) > {_SEQ_BOUNDARY}
                                  THEN day_idx END), 0) AS BIGINT)
             AS first_cross_day,
           CAST(coalesce(min(CASE WHEN abs(z) > {_SEQ_BOUNDARY}
                                  THEN day_idx END), 0) > 0 AS BOOLEAN)
             AS crossed
    FROM (
      SELECT event_type, d, z,
             row_number() OVER (PARTITION BY event_type ORDER BY d) AS day_idx,
             row_number() OVER (PARTITION BY event_type ORDER BY d DESC)
               AS rn_last
      FROM zpath
    )
    GROUP BY event_type ORDER BY event_type
    """,
)
def b_sequential_mean_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential experiment monitoring: the cumulative Welch z for the
    treat-vs-control mean difference is recomputed after EVERY day of
    data (running sums n/Σv/Σv² per arm — the single-pass moments), and
    the report says when |z| first crossed the early-stopping boundary
    (2.8 ≈ an always-valid-inference bound; a fixed-horizon 1.96 peeked
    daily would inflate false positives — that gap is exactly why
    sequential boundaries exist). Complements the fixed-horizon
    readouts (b_ab_experiment_report, b_cuped_adjusted_ab) with the
    peeking-safe path an experimentation platform actually monitors.

    Evaluation days are those where BOTH arms logged events (the cell
    inner join) — a day with a silent arm contributes its events to the
    running moments but isn't itself a look; with balanced hash
    assignment that's every day in practice.

    Scale shape: ONE corpus groupBy to (type, day, arm) cells carrying
    additive moments; the z path and crossing scan are windows over the
    calendar-bounded cell frame. Days × types × 2 rows — never
    data-sized after the first aggregate.
    """
    ev = load_table(spark, sf_dir, "events")
    treat = (
        F.expr(
            "locate(substr(md5(cast(user_id as string)), 1, 1),"
            " '0123456789abcdef') - 1"
        )
        % 2
    )
    cells = (
        ev.select(
            "event_type",
            F.to_date("ts").alias("d"),
            treat.alias("treat"),
            "value",
        )
        .groupBy("event_type", "d", "treat")
        .agg(
            F.count("*").alias("n"),
            F.sum("value").alias("s"),
            F.sum(F.col("value") * F.col("value")).alias("ss"),
        )
    )
    w = W.partitionBy("event_type", "treat").orderBy("d")
    cum = cells.select(
        "event_type",
        "d",
        "treat",
        F.sum("n").over(w).alias("cn"),
        F.sum("s").over(w).alias("cs"),
        F.sum("ss").over(w).alias("css"),
    )
    a = cum.where(F.col("treat") == 1).alias("a")
    b = cum.where(F.col("treat") == 0).alias("b")
    var = lambda side: (  # noqa: E731 — local closed form
        (F.col(f"{side}.css") - F.col(f"{side}.cs") ** 2 / F.col(f"{side}.cn"))
        / (F.col(f"{side}.cn") - 1)
    )
    mean = lambda side: F.col(f"{side}.cs") / F.col(f"{side}.cn")  # noqa: E731
    wide = (
        a.join(b, (F.col("a.event_type") == F.col("b.event_type"))
               & (F.col("a.d") == F.col("b.d")))
        .where((F.col("a.cn") > 1) & (F.col("b.cn") > 1))
        .select(
            F.col("a.event_type").alias("event_type"),
            F.col("a.d").alias("d"),
            F.round(
                (mean("a") - mean("b"))
                / F.sqrt(var("a") / F.col("a.cn") + var("b") / F.col("b.cn")),
                6,
            ).alias("z"),
        )
    )
    wd = W.partitionBy("event_type").orderBy("d")
    wl = W.partitionBy("event_type").orderBy(F.desc("d"))
    path = wide.select(
        "event_type",
        "z",
        F.row_number().over(wd).alias("day_idx"),
        F.row_number().over(wl).alias("rn_last"),
    )
    return (
        path.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_days"),
            F.round(
                F.max(F.when(F.col("rn_last") == 1, F.col("z"))), 4
            ).alias("final_z"),
            F.coalesce(
                F.min(
                    F.when(
                        F.abs("z") > _SEQ_BOUNDARY, F.col("day_idx")
                    )
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("first_cross_day"),
            (
                F.coalesce(
                    F.min(
                        F.when(F.abs("z") > _SEQ_BOUNDARY, F.col("day_idx"))
                    ),
                    F.lit(0),
                )
                > 0
            ).alias("crossed"),
        )
        .orderBy("event_type")
    )


_FH_BUCKETS = 64


@query(
    "t_feature_hashing",
    oracle=f"""
    WITH words AS (
      SELECT doc_id, source, unnest(string_split(text, ' ')) AS w
      FROM documents
    ),
    hashed AS (
      SELECT doc_id, source,
             (instr('0123456789abcdef', substr(md5(w), 1, 1)) - 1) * 16
               + (instr('0123456789abcdef', substr(md5(w), 2, 1)) - 1)
               AS bucket_raw,
             CASE WHEN (instr('0123456789abcdef', substr(md5(w), 3, 1)) - 1)
                       % 2 = 0
                  THEN 1 ELSE -1 END AS sgn
      FROM words
    ),
    feats AS (
      SELECT doc_id, source, bucket_raw % {_FH_BUCKETS} AS bucket,
             CAST(sum(sgn) AS BIGINT) AS v
      FROM hashed GROUP BY 1, 2, 3
    ),
    per_doc AS (
      SELECT doc_id, source,
             sqrt(sum(v * v * 1.0)) AS l2,
             sum(CASE WHEN v <> 0 THEN 1 ELSE 0 END) AS nnz
      FROM feats GROUP BY 1, 2
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(avg(l2), 4) AS avg_l2,
           round(avg(nnz), 4) AS avg_nnz,
           CAST(max(nnz) AS BIGINT) AS max_nnz
    FROM per_doc GROUP BY source ORDER BY source
    """,
)
def t_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick bag-of-words featurization census: every token
    hashes to one of {_FH_BUCKETS} signed buckets (bucket = first two
    md5 nibbles mod buckets, sign = third-nibble parity — the
    Weinberger et al. signed hashing that keeps E[collision noise]=0),
    per-document features are the signed counts, and the report carries
    per-source L2-norm and sparsity profiles — the sanity check before
    shipping fixed-width features to a streaming model. No vocabulary
    is materialized anywhere: that vocabulary-freeness is the entire
    point of the hashing trick at 100 TB.

    Scale shape: explode → hash in codegen → (doc, bucket) map-side-
    combined groupBy → per-doc fold → per-source aggregate. Bucket
    count is a literal; nothing holds a dictionary, so the plan is
    identical at any corpus size.
    """
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id", "source", F.explode(F.split("text", " ")).alias("w")
    )
    nib = lambda i: (  # noqa: E731
        F.expr(
            f"locate(substr(md5(w), {i}, 1), '0123456789abcdef') - 1"
        )
    )
    hashed = words.select(
        "doc_id",
        "source",
        ((nib(1) * 16 + nib(2)) % _FH_BUCKETS).alias("bucket"),
        F.when(nib(3) % 2 == 0, F.lit(1)).otherwise(F.lit(-1)).alias("sgn"),
    )
    feats = hashed.groupBy("doc_id", "source", "bucket").agg(
        F.sum("sgn").cast("long").alias("v")
    )
    per_doc = feats.groupBy("doc_id", "source").agg(
        F.sqrt(F.sum(F.col("v") * F.col("v") * 1.0)).alias("l2"),
        F.sum((F.col("v") != 0).cast("int")).alias("nnz"),
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.round(F.avg("l2"), 4).alias("avg_l2"),
            F.round(F.avg("nnz"), 4).alias("avg_nnz"),
            F.max("nnz").cast("long").alias("max_nnz"),
        )
        .orderBy("source")
    )
