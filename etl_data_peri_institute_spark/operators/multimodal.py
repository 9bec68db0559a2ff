"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are ``binary`` columns with a metadata struct
(modality, format, byte length, content hash). The Spark-side design is
real and tested — schema, partitioning, Arrow-batched UDF signatures,
batch shapes — while the actual media decoding is STUBBED: the image/
audio libraries are not in this container, so ``decode_image_features``
raises ``NotImplementedError`` unless ``fake=True``, in which case a
deterministic fake decoder (byte-histogram features) stands in. Swapping
the stub for Pillow/torchaudio changes one function body, not the plan.

Scale notes: payloads stay columnar in parquet (no driver round-trip);
``mapInPandas`` streams Arrow batches so a 100 TB corpus decodes at
executor parallelism with bounded memory (batch size via
``spark.sql.execution.arrow.maxRecordsPerBatch``); feature extraction
emits fixed-width arrays, keeping downstream ANN/dedup operators
columnar.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 8

FEATURES_SCHEMA = (
    "doc_id bigint, modality string, n_bytes int, content_hash string, "
    "features array<double>"
)


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Simulate a multimodal table: payload = utf-8 bytes of the text
    column (stands in for image/audio bytes), plus the metadata struct
    every real multimodal pipeline carries."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit("image").alias("modality"),
            F.lit("raw").alias("format"),
            F.octet_length(payload).alias("n_bytes"),
            F.md5(payload).alias("content_hash"),
        ).alias("meta"),
    )


def decode_image_features(df: DataFrame, fake: bool = False) -> DataFrame:
    """payload → fixed-width feature vector via Arrow-batched mapInPandas.

    ``fake=False`` raises NotImplementedError from the executors (no
    media libs in this image). ``fake=True`` uses a deterministic
    byte-level histogram so the full pipeline (partitioning → Arrow batch
    → UDF → columnar features) is exercised end-to-end in tests.
    """

    def batches(it: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in it:
            if not fake:
                raise NotImplementedError(
                    "media decode libs not available in this image; "
                    "pass fake=True for the deterministic stand-in"
                )
            feats = []
            for buf in pdf["payload"]:
                arr = np.frombuffer(buf, dtype=np.uint8)
                hist, _ = np.histogram(arr, bins=FEATURE_DIM, range=(0, 256))
                total = max(int(hist.sum()), 1)
                feats.append([round(float(h) / total, 6) for h in hist])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": [m["modality"] for m in pdf["meta"]],
                    "n_bytes": [int(m["n_bytes"]) for m in pdf["meta"]],
                    "content_hash": [m["content_hash"] for m in pdf["meta"]],
                    "features": feats,
                }
            )

    return df.mapInPandas(batches, schema=FEATURES_SCHEMA)


RESIZED_SCHEMA = "doc_id bigint, payload binary, n_bytes int, target int"


def resize_images(df: DataFrame, target_bytes: int = 64, fake: bool = False) -> DataFrame:
    """payload → resized payload via Arrow-batched mapInPandas (1-to-1
    batch shape; binary in, binary out — the resize step of an image
    pipeline, run before feature extraction to bound decode cost).

    Real implementation = Pillow ``Image.resize`` per payload;
    ``fake=True`` stands in with a deterministic byte-downsample
    (stride-pick to ``target_bytes``) so schema/batching/binary
    round-trip are exercised. Output metadata (n_bytes) is recomputed
    from the actual resized payload, never carried over."""

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            if not fake:
                raise NotImplementedError(
                    "media decode libs not available in this image; "
                    "pass fake=True for the deterministic stand-in"
                )
            out = []
            for buf in pdf["payload"]:
                b = bytes(buf)
                stride = max(1, len(b) // target_bytes)
                out.append(b[::stride][:target_bytes])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": out,
                    "n_bytes": [len(b) for b in out],
                    "target": target_bytes,
                }
            )

    return df.mapInPandas(batches, schema=RESIZED_SCHEMA)


FRAMES_SCHEMA = "doc_id bigint, frame_idx int, frame binary, n_frames int"


def sample_video_frames(
    df: DataFrame, frame_bytes: int = 32, every_nth: int = 4, fake: bool = False
) -> DataFrame:
    """payload → one row per sampled frame via mapInPandas (1-to-many
    batch shape — the row-exploding UDF pattern). A real video pipeline
    decodes containers and keyframe-samples; the deterministic stand-in
    treats the payload as ``n_bytes // frame_bytes`` fixed-width frames
    and keeps every ``every_nth``-th.

    Scale: frame sampling multiplies row count — repartition AFTER this
    step if downstream work is per-frame, and keep ``frame`` binary
    columnar (no base64 detours)."""

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            if not fake:
                raise NotImplementedError(
                    "media decode libs not available in this image; "
                    "pass fake=True for the deterministic stand-in"
                )
            ids, idxs, frames, totals = [], [], [], []
            for doc_id, buf in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(buf)
                n_frames = max(len(b) // frame_bytes, 0)
                for i in range(0, n_frames, every_nth):
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(b[i * frame_bytes : (i + 1) * frame_bytes])
                    totals.append(n_frames)
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "frame_idx": idxs,
                    "frame": frames,
                    "n_frames": totals,
                }
            )

    return df.mapInPandas(batches, schema=FRAMES_SCHEMA)


AUDIO_SCHEMA = (
    "doc_id bigint, n_samples bigint, sum_amp bigint, sum_sq bigint, peak int"
)


def decode_audio_stats(df: DataFrame, fake: bool = False) -> DataFrame:
    """payload → per-document waveform statistics via Arrow-batched
    mapInPandas — the audio leg of the multimodal family (image =
    decode_image_features, video = sample_video_frames). A real
    implementation decodes containers (torchaudio/ffmpeg) to PCM;
    the deterministic stand-in interprets the payload as big-endian
    int16 PCM frames (trailing odd byte dropped), which keeps the full
    pipeline — schema, batch shape, vectorized frame math — real and
    makes the stats REPRODUCIBLE BY SQL over the same bytes (the gate
    query m_audio_stats carries a DuckDB oracle, unlike the image
    histogram whose binning is not SQL-reachable).

    Emits EXACT integer moments (n, Σv, Σv², peak) — additive and
    mergeable, so shard-level stats combine without precision loss, and
    the float derivations (RMS, mean) happen in engine SQL where both
    engines execute identical IEEE ops (numpy's pairwise summation
    differs from SQL's sequential sum by ~1 ulp, which a rounded float
    column would surface as a hash mismatch — integer moments make the
    cross-engine compare exact).

    Scale: same contract as the other decoders — executor-parallel
    Arrow batches, bounded memory, no driver round-trip; output is
    5 scalars per doc so downstream joins stay narrow."""

    def batches(it: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in it:
            if not fake:
                raise NotImplementedError(
                    "audio decode libs not available in this image; "
                    "pass fake=True for the deterministic stand-in"
                )
            ids, ns, s1, s2, peak = [], [], [], [], []
            for doc_id, buf in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(buf)
                usable = len(b) // 2 * 2
                samples = np.frombuffer(b[:usable], dtype=">i2").astype(np.int64)
                ids.append(doc_id)
                ns.append(len(samples))
                s1.append(int(samples.sum()) if len(samples) else 0)
                s2.append(int((samples * samples).sum()) if len(samples) else 0)
                peak.append(int(np.max(np.abs(samples))) if len(samples) else 0)
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "n_samples": ns,
                    "sum_amp": s1,
                    "sum_sq": s2,
                    "peak": peak,
                }
            )

    return df.mapInPandas(batches, schema=AUDIO_SCHEMA)
