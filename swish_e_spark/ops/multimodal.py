"""Multimodal column plumbing for training-data pipelines.

Images/audio/video travel as opaque ``binary`` columns with typed
metadata; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` kernels. The actual media codecs are NOT
available in this container, so the decode step is STUBBED: by default it
raises ``NotImplementedError``; with ``fake=True`` it produces a
deterministic fake decode so the Spark-side plumbing (schema,
partitioning, UDF signature, Arrow batch shape) is real and tested.

At 100 TB the shape that matters: media bytes stay in executor-local
Arrow batches end-to-end (no driver collect), feature rows are a
fixed-width schema (codegen-friendly), and the kernel is stateless so
AQE can split skewed partitions freely.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

MEDIA_SCHEMA = ("media_id long, kind string, payload binary, "
                "width int, height int, sample_rate int")

FEATURE_SCHEMA = ("media_id long, kind string, n_bytes long, "
                  "sha256 string, thumb_w int, thumb_h int, "
                  "feature array<float>")

THUMB = 32
N_FEATURES = 16


def synthesize_media_df(spark, n: int = 64, partitions: int = 4):
    """Deterministic fake media table (binary payload + metadata)."""
    def gen(batches):
        for pdf in batches:
            rows = []
            for mid in pdf["id"]:
                mid = int(mid)
                rng = np.random.default_rng(mid)
                kind = ("image", "audio", "video")[mid % 3]
                payload = rng.integers(0, 256, size=256 + mid % 512,
                                       dtype=np.uint8).tobytes()
                rows.append({
                    "media_id": mid, "kind": kind, "payload": payload,
                    "width": 64 + mid % 128 if kind != "audio" else 0,
                    "height": 48 + mid % 64 if kind != "audio" else 0,
                    "sample_rate": 16000 if kind == "audio" else 0,
                })
            yield pd.DataFrame(rows)

    return (spark.range(n).repartition(partitions)
            .mapInPandas(gen, schema=MEDIA_SCHEMA))


def _decode_stub(payload: bytes, kind: str, fake: bool):
    """The codec boundary. Real deployments plug PIL/ffmpeg here."""
    if not fake:
        raise NotImplementedError(
            "media codecs not available in this environment; "
            "pass fake=True for the deterministic test decode")
    # deterministic fake: pseudo-pixels from a seeded hash of the bytes
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    return rng.random((THUMB, THUMB), dtype=np.float32)


def extract_features(media_df, fake: bool = True):
    """binary payload → fixed-width feature rows (decode → resize →
    pooled features), Arrow-batched."""
    def kernel(batches):
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                payload = bytes(row.payload)
                decoded = _decode_stub(payload, row.kind, fake)
                # "resize": mean-pool the fake thumb into a feature grid
                grid = decoded.reshape(4, THUMB // 4, 4, THUMB // 4) \
                    .mean(axis=(1, 3)).ravel()[:N_FEATURES]
                out.append({
                    "media_id": row.media_id, "kind": row.kind,
                    "n_bytes": len(payload),
                    "sha256": hashlib.sha256(payload).hexdigest(),
                    "thumb_w": THUMB, "thumb_h": THUMB,
                    "feature": grid.astype(np.float32),
                })
            if out:
                yield pd.DataFrame(out)

    return media_df.mapInPandas(kernel, schema=FEATURE_SCHEMA)


def media_from_documents(spark, sf_dir: str):
    """Documents table → media table: text bytes as the opaque binary
    payload (the 100 TB shape: media is just a binary column plus typed
    metadata; here the payload is deterministic so the driver's SQL
    oracle can verify the plumbing)."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(F.array(F.lit("image"), F.lit("audio"),
                             F.lit("video")),
                     (F.col("doc_id") % 3 + 1).cast("int")).alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        F.lit(64).cast("int").alias("width"),
        F.lit(48).cast("int").alias("height"),
        F.lit(16000).cast("int").alias("sample_rate"))


def media_features_q(spark, sf_dir: str):
    """Driver-contract entry: decode→feature plumbing over the
    documents-backed media table; the SQL-checkable columns are the
    metadata the kernel computes from the payload bytes."""
    from pyspark.sql import functions as F

    feats = extract_features(media_from_documents(spark, sf_dir),
                             fake=True)
    return (feats.select(F.col("media_id"), "kind", "n_bytes", "sha256")
            .orderBy("media_id"))


def media_frame_sample_q(spark, sf_dir: str, every_n: int = 4):
    """Driver-contract entry: video frame-sample fan-out rows."""
    from pyspark.sql import functions as F

    frames = frame_sample(media_from_documents(spark, sf_dir),
                          every_n=every_n, fake=True)
    return frames.orderBy("media_id", "frame_idx")


def frame_sample(media_df, every_n: int = 4, fake: bool = True):
    """Video frame-sampling plumbing: one row per sampled frame index.
    The decode is stubbed; the fan-out schema/batching is real."""
    def kernel(batches):
        for pdf in batches:
            rows = []
            for row in pdf.itertuples(index=False):
                if row.kind != "video":
                    continue
                n_frames = max(1, len(bytes(row.payload)) // 64)
                for fi in range(0, n_frames, every_n):
                    rows.append({"media_id": row.media_id,
                                 "frame_idx": fi,
                                 "ts_ms": fi * 40})
            if rows:
                yield pd.DataFrame(rows)

    return media_df.mapInPandas(
        kernel, schema="media_id long, frame_idx int, ts_ms int")
