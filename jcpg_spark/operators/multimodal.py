"""Multimodal columns: opaque binary payloads with typed metadata.

Training-data pipelines carry images/audio/video as ``binary`` columns
next to structured metadata. This module makes the SPARK-SIDE plumbing
real — schema, deterministic synthesis, partition-friendly batch shape,
``mapInPandas`` feature extraction with Arrow-batched binaries — while the
actual codec step is STUBBED (no image/audio libraries in this container):
``decode_stub`` raises ``NotImplementedError`` by default or produces a
deterministic fake feature vector when ``fake=True``, so the pipeline
around it is fully testable.

At 100 TB: binaries dominate bytes, so the operators below never shuffle
the payload — feature extraction is map-side, metadata-only results are
projected before any wide operation, and payload-carrying tables would be
bucketed by content hash for dedup joins.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("mime", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), False),  # opaque bytes
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

_KINDS = [("image", "image/png"), ("audio", "audio/wav"), ("video", "video/mp4")]


def synth_media(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Deterministic fake media table: payload bytes derived from sha256 of
    (seed, media_id) — stable under any partitioning."""

    def gen(it):
        for pdf in it:
            rows = []
            for mid in pdf["id"].tolist():
                kind, mime = _KINDS[mid % 3]
                h = hashlib.sha256(f"{seed}:{mid}".encode()).digest()
                payload = (h * ((64 + mid % 128) // len(h) + 1))[: 64 + mid % 128]
                rows.append(
                    (
                        mid,
                        kind,
                        mime,
                        payload,
                        (mid % 32 + 1) * 16 if kind == "image" else None,
                        (mid % 18 + 1) * 16 if kind == "image" else None,
                        (mid % 300 + 1) * 100 if kind != "image" else None,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "kind", "mime", "payload", "width", "height", "duration_ms",
                ],
            )

    return spark.range(n).mapInPandas(gen, schema=MEDIA_SCHEMA)


def decode_stub(payload: bytes, kind: str, fake: bool = False) -> list[float]:
    """Codec seam. Real deployment plugs Pillow/torchaudio/ffmpeg here.

    ``fake=True`` returns a deterministic 8-dim feature from the payload
    bytes (so downstream plumbing is testable); otherwise raises, making it
    impossible to silently ship the stub.
    """
    if not fake:
        raise NotImplementedError(
            "media decoding requires codec libraries not present in this "
            "container; pass fake=True for the deterministic test stub"
        )
    h = hashlib.sha256(payload).digest()
    return [b / 255.0 for b in h[:8]]


def extract_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """Map-side feature extraction over Arrow batches of binaries.

    -> (media_id, kind, n_bytes, payload_sha256, feature: array<double>).
    The payload never crosses a shuffle; output is metadata+feature only.
    """

    def run(it):
        for pdf in it:
            feats = [decode_stub(p, k, fake=fake) for p, k in zip(pdf["payload"], pdf["kind"])]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "payload_sha256": [hashlib.sha256(p).hexdigest() for p in pdf["payload"]],
                    "feature": feats,
                }
            )

    out_schema = (
        "media_id long, kind string, n_bytes int, payload_sha256 string, feature array<double>"
    )
    return media.mapInPandas(run, schema=out_schema)


def resize_images(media: DataFrame, width: int, height: int, fake: bool = True) -> DataFrame:
    """Image resize seam: -> (media_id, mime, width, height, payload).

    The Spark-side contract is real — image-kind filter, Arrow-batched
    binaries through mapInPandas, payload-in/payload-out schema, metadata
    updated to the target dims. The pixel work is the stubbed codec step:
    ``fake=True`` produces a deterministic payload (sha256 of the original
    payload + target dims, length scaled to the new pixel count) so
    downstream plumbing (size accounting, dedup of resized assets) is
    testable; ``fake=False`` raises, like ``decode_stub``.
    """

    def run(it):
        for pdf in it:
            if not fake:
                raise NotImplementedError(
                    "image resize requires codec libraries not present in this "
                    "container; pass fake=True for the deterministic stub"
                )
            outs = []
            for p in pdf["payload"]:
                h = hashlib.sha256(p + f":{width}x{height}".encode()).digest()
                n = max(16, (width * height) // 64)
                outs.append((h * (n // len(h) + 1))[:n])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "width": width,
                    "height": height,
                    "payload": outs,
                }
            )

    return media.filter(F.col("kind") == "image").mapInPandas(
        run, schema="media_id long, mime string, width int, height int, payload binary"
    )


def sample_frames(media: DataFrame, every_ms: int = 1000, fake: bool = True) -> DataFrame:
    """Video frame sampling seam: -> (media_id, frame_idx, t_ms, frame).

    One output row per sampled timestamp (duration_ms / every_ms frames,
    computed from real metadata); the frame bytes are the stubbed decode
    (deterministic sha256 of payload+timestamp under ``fake=True``). The
    explode happens INSIDE mapInPandas so the source payload is read once
    per batch and never shuffled.
    """

    def run(it):
        for pdf in it:
            if not fake:
                raise NotImplementedError(
                    "video decoding requires codec libraries not present in this "
                    "container; pass fake=True for the deterministic stub"
                )
            mids, idxs, ts, frames = [], [], [], []
            for mid, p, dur in zip(pdf["media_id"], pdf["payload"], pdf["duration_ms"]):
                n = max(1, int(dur) // every_ms)
                for i in range(n):
                    t = i * every_ms
                    mids.append(mid)
                    idxs.append(i)
                    ts.append(t)
                    frames.append(hashlib.sha256(p + f":{t}".encode()).digest())
            yield pd.DataFrame(
                {"media_id": mids, "frame_idx": idxs, "t_ms": ts, "frame": frames}
            )

    return media.filter(F.col("kind") == "video").mapInPandas(
        run, schema="media_id long, frame_idx int, t_ms int, frame binary"
    )


def exact_dup_media(media: DataFrame) -> DataFrame:
    """Exact payload dedup by content hash (JVM-side sha2 over binary;
    no Python, no payload shuffle — only the 32-byte hash is grouped)."""
    return (
        media.select("media_id", F.sha2(F.col("payload"), 256).alias("h"))
        .groupBy("h")
        .agg(F.min("media_id").alias("canonical_media_id"), F.count("*").alias("n_dups"))
        .select("canonical_media_id", "n_dups")
    )
