"""Round-7 continuation operators, batch 7: multimodal gates with full
hash oracles.

- m_audio_stats         — per-document PCM waveform statistics through
  the Arrow decode path, byte-reproducible by the SQL oracle
- m_frame_sample_census — video frame-sampling census certifying the
  1-to-many mapInPandas row-explosion arithmetic

The multimodal family previously carried 2 gate entries
(m_binary_metadata, m_multimodal_features — the latter property-
oracled because its histogram binning is not SQL-reachable). These two
add HASH-EXACT oracle coverage for the audio and video plumbing: the
corpus is ASCII (verified: strlen == length at every SF), so the
payload's utf-8 bytes are reproducible in the oracle dialect via
ascii(substr(...)), and the int16 frame math / frame-count arithmetic
are exact integer expressions on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .catalog import query


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
