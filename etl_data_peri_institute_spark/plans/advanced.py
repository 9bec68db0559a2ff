"""Advanced operator surface: multimodal plumbing, Arrow-batched pandas
operators, approximate sketches, skew-resistant aggregation.

The pandas-UDF entries exist to exercise the engine's documented escape
hatch (SURVEY.md §2.10: nothing in the reference NEEDS a UDF; these
demonstrate the Arrow path for operators that genuinely do) — each one
is cross-validated against a pure-SQL DuckDB oracle where expressible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .catalog import query


@query(
    "m_binary_metadata",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS INT) AS n_bytes,
           md5(text) AS content_hash
    FROM documents
    ORDER BY doc_id
    """,
)
def m_binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal metadata layer: opaque binary payload + typed metadata
    (operators/multimodal.py). Payload here is the utf-8 text bytes
    standing in for image bytes; byte length and content hash compare
    exactly across engines."""
    from ..operators.multimodal import attach_binary_payload

    docs = load_table(spark, sf_dir, "documents")
    mm = attach_binary_payload(docs)
    return mm.select(
        "doc_id",
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.content_hash").alias("content_hash"),
    ).orderBy("doc_id")


@query(
    "m_multimodal_features",
    oracle="""
    SELECT doc_id,
           CAST(strlen(text) AS INTEGER) AS n_bytes,
           md5(text) AS content_hash,
           8 AS feature_dim,
           TRUE AS features_sum_ok
    FROM documents ORDER BY doc_id
    """,
)
def m_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched media feature extraction via mapInPandas (stub decode
    with the deterministic fake — operators/multimodal.py).

    Hash-oracle design (the per-byte histogram itself is not
    SQL-expressible in the oracle dialect): the EXACT columns DuckDB can
    recompute — payload byte length (``strlen`` counts utf-8 bytes, =
    Spark's ``octet_length(encode(text))``) and the payload md5 (both
    engines hash the same utf-8 bytes) — plus two PROPERTY columns the
    oracle emits as literals and Spark computes from the real feature
    vector: dimensionality (must be 8) and the histogram-normalization
    invariant (fractions sum to 1 within 1e-4 whenever n_bytes > 0). A
    decode regression flips a boolean / changes a hash and the driver
    compare goes red; the exact per-bin values stay pinned by
    tests/test_multimodal.py."""
    from ..operators.multimodal import attach_binary_payload, decode_image_features

    docs = load_table(spark, sf_dir, "documents")
    feats = decode_image_features(attach_binary_payload(docs), fake=True)
    fsum = F.aggregate("features", F.lit(0.0), lambda acc, x: acc + x)
    return feats.select(
        "doc_id",
        "n_bytes",
        "content_hash",
        F.size("features").alias("feature_dim"),
        F.when(F.col("n_bytes") > 0, F.abs(fsum - 1.0) < 1e-4)
        .otherwise(F.lit(True))
        .alias("features_sum_ok"),
    ).orderBy("doc_id")


@query(
    "u_grouped_zscore_pandas",
    oracle="""
    SELECT event_id, event_type,
           round((value - avg(value) OVER (PARTITION BY event_type))
                 / stddev_samp(value) OVER (PARTITION BY event_type), 3) AS zscore
    FROM events
    ORDER BY event_id
    """,
)
def u_grouped_zscore_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score via applyInPandas (grouped-map Arrow UDF).

    Deliberately implemented on the pandas path to exercise it — the
    DuckDB oracle recomputes the same statistic with window functions,
    cross-validating the Arrow round-trip. (A plain Spark window would
    also express this; the escape hatch is the point.)
    """
    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type", "value")

    def zscore(pdf):
        mean = pdf["value"].mean()
        std = pdf["value"].std(ddof=1)
        pdf = pdf.assign(zscore=((pdf["value"] - mean) / std).round(3))
        return pdf[["event_id", "event_type", "zscore"]]

    return (
        ev.groupBy("event_type")
        .applyInPandas(zscore, schema="event_id bigint, event_type string, zscore double")
        .orderBy("event_id")
    )


@query(
    "a_salted_skew_agg",
    oracle="""
    SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 2) AS total
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def a_salted_skew_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant two-stage aggregation (salt → partial agg → final).

    For hot grouping keys at 100 TB: stage 1 groups on (key, salt) so a
    dominant key spreads over N reducers; stage 2 folds the partials.
    Results must equal the plain groupBy — the oracle is the plain SQL.
    (AQE's skew handling covers joins; salting is the aggregation-side
    pattern.)
    """
    ev = load_table(spark, sf_dir, "events")
    n_salt = 16
    salted = ev.withColumn("__salt", (F.rand(seed=7) * n_salt).cast("int"))
    partial = salted.groupBy("event_type", "__salt").agg(
        F.count("*").alias("pn"), F.sum("value").alias("pv")
    )
    return (
        partial.groupBy("event_type")
        .agg(F.sum("pn").cast("long").alias("n"), F.round(F.sum("pv"), 2).alias("total"))
        .orderBy("event_type")
    )


@query(
    "a_approx_sketches",
    oracle="""
    SELECT l_returnflag,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           TRUE AS approx_parts_ok,
           TRUE AS approx_p50_ok,
           TRUE AS approx_p95_ok
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def a_approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate sketches: HLL++ distinct counts and approximate
    quantiles, hash-oracled as PROPERTIES (the raw estimates are
    algorithm-specific — DuckDB's sketches use different parameters, so
    value-matching them is meaningless). The oracle recomputes the EXACT
    distinct count (two-sided check: Spark emits its own exact
    countDistinct next to the sketch) and emits literal TRUE for three
    tolerance booleans Spark computes from the real estimates:

    - ``approx_parts_ok``: |HLL(rsd=0.02) − exact| ≤ 6 % of exact
      (3 standard errors; HLL++ is deterministic for fixed data, so
      this is a stable pass, not a flaky one);
    - ``approx_p50_ok`` / ``approx_p95_ok``: percentile_approx
      (accuracy 10000 ⇒ rank error ≤ n/10000) lands between the exact
      p45–p55 / p90–p99 ranks, computed with exact ``percentile``.

    A sketch regression flips a boolean → driver hash mismatch. The
    companion a_exact_percentile query pins the exact counterparts."""
    li = load_table(spark, sf_dir, "lineitem")
    pcts = F.percentile_approx("l_extendedprice", [0.5, 0.95, 0.99], 10000)
    exact = F.expr(
        "percentile(l_extendedprice, array(0.45, 0.55, 0.90, 0.99))"
    )
    agg = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("_approx"),
        F.countDistinct("l_partkey").cast("long").alias("exact_parts"),
        pcts.alias("_pcts"),
        exact.alias("_ex"),
    )
    return agg.select(
        "l_returnflag",
        "exact_parts",
        (
            F.abs(F.col("_approx") - F.col("exact_parts"))
            <= 0.06 * F.col("exact_parts")
        ).alias("approx_parts_ok"),
        F.col("_pcts")[0].between(F.col("_ex")[0], F.col("_ex")[1]).alias(
            "approx_p50_ok"
        ),
        F.col("_pcts")[1].between(F.col("_ex")[2], F.col("_ex")[3]).alias(
            "approx_p95_ok"
        ),
    ).orderBy("l_returnflag")


@query(
    "a_exact_percentile",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
           round(quantile_cont(l_extendedprice, 0.95), 4) AS p95,
           round(median(l_quantity), 4) AS med_qty
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def a_exact_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark ``percentile`` == DuckDB
    ``quantile_cont`` semantics)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(l_extendedprice, 0.95)"), 4).alias("p95"),
        F.round(F.expr("percentile(l_quantity, 0.5)"), 4).alias("med_qty"),
    ).orderBy("l_returnflag")


@query(
    "u_scalar_pandas_softsign",
    oracle="""
    SELECT event_id,
           round(value / (1 + abs(value)), 6) AS softsign
    FROM events
    ORDER BY event_id
    """,
)
def u_scalar_pandas_softsign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized scalar @pandas_udf (Series → Series) — the third Arrow
    UDF shape alongside applyInPandas (grouped map) and mapInPandas
    (iterator). Softsign x/(1+|x|) is chosen because it uses only
    IEEE-exact ops (no libm transcendentals), so the pandas result is
    bit-identical to the SQL oracle before rounding. In a real pipeline
    this slot holds a numpy/model scoring function; a plain column
    expression remains the first choice whenever one exists."""
    from pyspark.sql.functions import pandas_udf

    # no inline type hints: PEP-563 stringified annotations confuse
    # pandas_udf's signature inspection under `from __future__ import
    # annotations`; the returnType argument carries the contract
    @pandas_udf("double")
    def softsign(v):
        return (v / (1 + v.abs())).round(6)

    ev = load_table(spark, sf_dir, "events")
    return ev.select("event_id", softsign("value").alias("softsign")).orderBy("event_id")


# --------------------------------------------------------------------------
# u_udtf_chunk_documents — Python UDTF (Spark 4 table function, Arrow path)
# --------------------------------------------------------------------------

_UDTF_CHUNK_WORDS = 20


@query(
    "u_udtf_chunk_documents",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS words FROM documents
      WHERE doc_id < 50 AND len(string_split(text, ' ')) >= 1
    )
    SELECT doc_id, CAST(i - 1 AS INT) AS chunk_idx,
           md5(array_to_string(
             list_slice(words, (i - 1) * {_UDTF_CHUNK_WORDS} + 1, i * {_UDTF_CHUNK_WORDS}),
             ' ')) AS h
    FROM w, UNNEST(range(1, CAST(ceil(len(words) / {_UDTF_CHUNK_WORDS}.0) AS BIGINT) + 1)) AS t(i)
    ORDER BY doc_id, chunk_idx
    """,
)
def u_udtf_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 4 user-defined TABLE function): one input row
    → many output rows, invoked via LATERAL in SQL. The 1-to-many
    escape hatch for row-expanding logic that higher-order columns
    can't express (real tokenizers, sentence splitters, parser
    emissions); here it re-implements d_chunk_dedup's fixed-window
    chunker so the DuckDB oracle pins the UDTF's semantics exactly.

    Scale shape: UDTFs run inside the executor partition like any
    narrow op — no shuffle, no driver involvement; Arrow moves batches
    (useArrow=True), not rows. Python md5 == JVM md5 == DuckDB md5, so
    the emitted hashes are engine-portable.
    """
    import hashlib
    import math

    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx int, h string", useArrow=True)
    class ChunkDoc:
        def eval(self, text):
            words = (text or "").split(" ")
            for i in range(math.ceil(len(words) / _UDTF_CHUNK_WORDS) or 1):
                chunk = " ".join(
                    words[i * _UDTF_CHUNK_WORDS : (i + 1) * _UDTF_CHUNK_WORDS]
                )
                yield i, hashlib.md5(chunk.encode("utf-8")).hexdigest()

    spark.udtf.register("chunk_doc", ChunkDoc)
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    docs.createOrReplaceTempView("udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id, c.chunk_idx, c.h
        FROM udtf_docs d, LATERAL chunk_doc(d.text) c
        ORDER BY d.doc_id, c.chunk_idx
        """
    )


@query(
    "u_arrow_batch_stats",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           CAST(strlen(text) AS BIGINT)                 AS n_bytes_utf8
    FROM documents
    ORDER BY doc_id
    """,
)
def u_arrow_batch_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow: the leanest Python boundary — raw pyarrow
    RecordBatches in and out, no pandas materialization at all. This
    completes the Arrow escape-hatch matrix (scalar pandas UDF /
    applyInPandas / mapInPandas / UDTF / mapInArrow); for byte- and
    token-level batch work, skipping the Arrow→pandas conversion
    avoids one copy per batch and all dtype coercion.

    The work itself (token count, utf-8 byte length) is deliberately
    SQL-expressible so the DuckDB oracle cross-validates the Arrow
    round-trip with exact integers; production use is for logic that
    ISN'T (tokenizers, binary codecs) where only the plumbing shape
    matters.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def batch_stats(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        for b in batches:
            text = b.column("text")
            toks = pc.list_value_length(pc.split_pattern(text, pattern=" "))
            nbytes = pc.binary_length(text.cast(pa.binary()))
            yield pa.RecordBatch.from_arrays(
                [b.column("doc_id"), toks.cast(pa.int64()), nbytes.cast(pa.int64())],
                ["doc_id", "n_tokens", "n_bytes_utf8"],
            )

    return docs.mapInArrow(
        batch_stats, schema="doc_id long, n_tokens long, n_bytes_utf8 long"
    ).orderBy("doc_id")


# ===========================================================================
# section consolidated from plans/round7g_ext.py (round-9 layout cleanup;
#   original registrations and docstrings preserved verbatim)
#
# Round-7 continuation operators, batch 7: multimodal gates with full
# hash oracles.
#
# - m_audio_stats         — per-document PCM waveform statistics through
#   the Arrow decode path, byte-reproducible by the SQL oracle
# - m_frame_sample_census — video frame-sampling census certifying the
#   1-to-many mapInPandas row-explosion arithmetic
#
# The multimodal family previously carried 2 gate entries
# (m_binary_metadata, m_multimodal_features — the latter property-
# oracled because its histogram binning is not SQL-reachable). These two
# add HASH-EXACT oracle coverage for the audio and video plumbing: the
# corpus is ASCII (verified: strlen == length at every SF), so the
# payload's utf-8 bytes are reproducible in the oracle dialect via
# ascii(substr(...)), and the int16 frame math / frame-count arithmetic
# are exact integer expressions on both engines.
# ===========================================================================

@query(
    "m_audio_stats",
    oracle="""
    WITH samples AS (
      SELECT doc_id,
             CAST(ascii(substr(text, 2 * k - 1, 1)) * 256
                  + ascii(substr(text, 2 * k, 1)) AS BIGINT) AS v
      FROM documents,
           UNNEST(range(1, strlen(text) // 2 + 1)) AS t(k)
    ),
    moments AS (
      SELECT doc_id,
             CAST(count(*) AS BIGINT) AS n_samples,
             CAST(sum(v) AS BIGINT) AS sum_amp,
             CAST(sum(v * v) AS BIGINT) AS sum_sq,
             CAST(max(abs(v)) AS INTEGER) AS peak
      FROM samples GROUP BY doc_id
    )
    SELECT doc_id, n_samples,
           round(sqrt(sum_sq * 1.0 / n_samples), 4) AS rms,
           peak,
           round(sum_amp * 1.0 / n_samples, 4) AS mean_amp
    FROM moments ORDER BY doc_id
    """,
)
def m_audio_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio waveform pre-flight through the REAL decode plumbing:
    payload bytes → big-endian int16 PCM frames (deterministic fake
    decode; torchaudio drops into the same mapInPandas body) → sample
    count, RMS, peak, mean amplitude per document. The oracle
    reconstructs the SAME frames from the same bytes (ASCII corpus ⇒
    byte k = ascii of char k; high byte < 128 ⇒ unsigned == signed
    int16), so the driver hash certifies the Arrow decode path
    end-to-end — the first multimodal gate whose UDF output is
    value-exact against SQL, not property-checked.

    Scale shape: Arrow-batched mapInPandas at executor parallelism;
    vectorized numpy frame math per batch (no per-sample Python); the
    gate's 5 scalars per doc keep everything downstream narrow. At
    100 TB decode cost dominates and is embarrassingly parallel.
    """
    from ..operators.multimodal import attach_binary_payload, decode_audio_stats

    docs = load_table(spark, sf_dir, "documents")
    moments = decode_audio_stats(attach_binary_payload(docs), fake=True)
    # derive the float stats IN ENGINE SQL from the exact integer
    # moments — identical IEEE divide/sqrt/round on both engines
    return moments.select(
        "doc_id",
        "n_samples",
        F.round(F.sqrt(F.col("sum_sq") * 1.0 / F.col("n_samples")), 4).alias(
            "rms"
        ),
        "peak",
        F.round(F.col("sum_amp") * 1.0 / F.col("n_samples"), 4).alias(
            "mean_amp"
        ),
    ).orderBy("doc_id")

_FRAME_BYTES = 32

_EVERY_NTH = 4

@query(
    "m_frame_sample_census",
    oracle=f"""
    SELECT doc_id,
           CAST(strlen(text) // {_FRAME_BYTES} AS BIGINT) AS n_frames,
           CAST(CASE WHEN strlen(text) // {_FRAME_BYTES} = 0 THEN 0
                     ELSE (strlen(text) // {_FRAME_BYTES} + {_EVERY_NTH} - 1)
                          // {_EVERY_NTH}
                END AS BIGINT) AS n_sampled,
           CAST(CASE WHEN strlen(text) // {_FRAME_BYTES} = 0 THEN NULL
                     ELSE {_FRAME_BYTES} END AS BIGINT) AS frame_bytes
    FROM documents
    WHERE strlen(text) // {_FRAME_BYTES} > 0
    ORDER BY doc_id
    """,
)
def m_frame_sample_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling census: run the 1-to-many frame-sampling
    UDF (every {_EVERY_NTH}th fixed-width frame — the keyframe-sampling
    stand-in) and certify its row-explosion arithmetic per document:
    total frames, frames kept, frame width. The oracle computes the
    same ceil-division counts from the payload length — so the gate
    pins that the row-exploding mapInPandas shape emits EXACTLY the
    rows it should (off-by-one explosions are the classic bug in
    1-to-many UDFs), while the frame BYTES stay pinned by
    tests/test_operators.py.

    Scale shape: the sampling UDF multiplies rows by ~n_frames/nth;
    the census groupBy(doc_id) runs on the exploded frame table —
    repartition-after-explode is the documented discipline for
    per-frame downstream work (operators/multimodal.py).
    """
    from ..operators.multimodal import attach_binary_payload, sample_video_frames

    docs = load_table(spark, sf_dir, "documents")
    frames = sample_video_frames(
        attach_binary_payload(docs),
        frame_bytes=_FRAME_BYTES,
        every_nth=_EVERY_NTH,
        fake=True,
    )
    return (
        frames.groupBy("doc_id")
        .agg(
            F.max("n_frames").cast("long").alias("n_frames"),
            F.count("*").cast("long").alias("n_sampled"),
            F.max(F.octet_length("frame")).cast("long").alias("frame_bytes"),
        )
        .orderBy("doc_id")
    )
