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


def exact_dup_media(media: DataFrame) -> DataFrame:
    """Exact payload dedup by content hash (JVM-side sha2 over binary;
    no Python, no payload shuffle — only the 32-byte hash is grouped)."""
    return (
        media.select("media_id", F.sha2(F.col("payload"), 256).alias("h"))
        .groupBy("h")
        .agg(F.min("media_id").alias("canonical_media_id"), F.count("*").alias("n_dups"))
        .select("canonical_media_id", "n_dups")
    )
