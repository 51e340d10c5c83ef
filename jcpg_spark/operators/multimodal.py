"""Multimodal columns: opaque binary payloads with typed metadata.

Training-data pipelines carry images/audio/video as ``binary`` columns
next to structured metadata. This module makes the SPARK-SIDE plumbing
real — schema, deterministic synthesis, partition-friendly batch shape,
``mapInPandas`` feature extraction with Arrow-batched binaries.

The codec boundary is split honestly by what stdlib can do:

- **container/header decode is REAL for all three kinds**: PNG IHDR
  (width/height/bit-depth/color-type, CRC-verified), WAV RIFF
  (sample-rate/channels/bits/duration), and — since r5 — MP4 ISO-BMFF
  (``moov``/``mvhd`` timescale+duration, ``trak``/``tkhd`` 16.16
  fixed-point dimensions, version 0 and 1) parse with ``struct`` +
  ``zlib.crc32`` — no external codec libraries needed — and
  ``synth_media`` emits payloads with VALID headers/boxes so every real
  parse is exercised end-to-end;
- **pixel/sample/frame decode is STUBBED**: image raster, audio PCM, and
  video frame decoding need Pillow/torchaudio/ffmpeg, absent from this
  container, so ``resize_images(fake=False)`` / ``sample_frames(
  fake=False)`` raise ``NotImplementedError`` and ``fake=True`` keeps the
  deterministic test vector.

At 100 TB: binaries dominate bytes, so the operators below never shuffle
the payload — feature extraction is map-side, metadata-only results are
projected before any wide operation, and payload-carrying tables would be
bucketed by content hash for dedup joins.
"""

from __future__ import annotations

import hashlib
import struct
import zlib

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

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_WAV_RATE = 16_000  # synth sample rate; 1000 | rate so duration round-trips exactly


def _png_payload(filler: bytes, width: int, height: int) -> bytes:
    """Minimal PNG prefix with a VALID, CRC-checked IHDR (8-bit truecolor)
    followed by deterministic filler standing in for the IDAT stream."""
    ihdr = b"IHDR" + struct.pack(">II5B", width, height, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + struct.pack(">I", 13)
        + ihdr
        + struct.pack(">I", zlib.crc32(ihdr) & 0xFFFFFFFF)
        + filler
    )


def _wav_payload(filler: bytes, duration_ms: int) -> bytes:
    """Valid RIFF/WAVE header (16-bit mono PCM at _WAV_RATE) whose declared
    data-chunk size encodes ``duration_ms``; sample bytes are truncated to
    the filler (headers parse; PCM decode stays out of scope)."""
    channels, bits = 1, 16
    block = channels * bits // 8
    byte_rate = _WAV_RATE * block
    data_size = (duration_ms * _WAV_RATE // 1000) * block
    return (
        b"RIFF"
        + struct.pack("<I", 36 + data_size)
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, channels, _WAV_RATE, byte_rate, block, bits)
        + b"data"
        + struct.pack("<I", data_size)
        + filler[: min(data_size, len(filler))]
    )


def _mp4_box(btype: bytes, body: bytes) -> bytes:
    """One ISO BMFF box: 32-bit big-endian size (header included) + type."""
    return struct.pack(">I", 8 + len(body)) + btype + body


_MP4_TIMESCALE = 1000  # mvhd ticks per second; 1000 makes duration_ms exact


def _mp4_payload(filler: bytes, width: int, height: int, duration_ms: int) -> bytes:
    """Minimal VALID MP4: ``ftyp`` + ``moov``(``mvhd`` + ``trak``/``tkhd``)
    + ``mdat`` carrying the filler as the opaque sample data. The mvhd
    declares timescale/duration (version 0), the tkhd declares the visual
    width/height as 16.16 fixed point — exactly the fields a metadata scan
    reads; frame data stays out of scope like PNG IDAT / WAV PCM."""
    matrix = struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
    mvhd = _mp4_box(
        b"mvhd",
        struct.pack(">B3xIIII", 0, 0, 0, _MP4_TIMESCALE,
                    duration_ms * _MP4_TIMESCALE // 1000)
        + struct.pack(">iH10x", 0x00010000, 0x0100)  # rate 1.0, volume 1.0
        + matrix
        + struct.pack(">6I", 0, 0, 0, 0, 0, 0)       # pre_defined
        + struct.pack(">I", 2),                       # next_track_id
    )
    tkhd = _mp4_box(
        b"tkhd",
        struct.pack(">B3BIIII", 0, 0, 0, 7, 0, 0, 1, 0)  # flags 7: enabled
        + struct.pack(">I8x", duration_ms * _MP4_TIMESCALE // 1000)
        + struct.pack(">HHHH", 0, 0, 0, 0)            # layer/group/volume
        + matrix
        + struct.pack(">II", width << 16, height << 16),
    )
    moov = _mp4_box(b"moov", mvhd + _mp4_box(b"trak", tkhd))
    ftyp = _mp4_box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isommp42")
    return ftyp + moov + _mp4_box(b"mdat", filler)


def parse_mp4_header(payload: bytes) -> tuple[int, int, int]:
    """(width, height, duration_ms) from the MP4 ``moov`` box — a real
    stdlib box walk (mvhd for timescale/duration, first trak's tkhd for
    the 16.16 fixed-point visual dimensions), handling version 0 and 1
    field widths. Raises ``ValueError`` on anything that is not a
    well-formed ISO BMFF container with those boxes."""

    def boxes(buf: bytes, pos: int, end: int):
        while pos + 8 <= end:
            size, btype = struct.unpack(">I4s", buf[pos : pos + 8])
            if size == 1:  # 64-bit largesize
                if pos + 16 > end:
                    raise ValueError("MP4 truncated largesize box header")
                (size,) = struct.unpack(">Q", buf[pos + 8 : pos + 16])
                body = pos + 16
            elif size == 0:  # box extends to end of enclosing scope
                size = end - pos
                body = pos + 8
            else:
                body = pos + 8
            if size < body - pos or pos + size > end:
                raise ValueError("MP4 box size out of bounds")
            yield btype, body, pos + size
            pos += size

    moov = None
    for btype, body, bend in boxes(payload, 0, len(payload)):
        if btype == b"moov":
            moov = (body, bend)
            break
    if moov is None:
        raise ValueError("not an MP4: no moov box")
    duration_ms = width = height = None
    for btype, body, bend in boxes(payload, *moov):
        if btype == b"mvhd":
            # fail-as-ValueError contract (r5 ADVICE): validate the body
            # length BEFORE reading fields — a size-8 (empty-body) mvhd
            # previously raised IndexError at payload[body] and a short
            # body raised struct.error at the fixed-offset unpack.
            if body >= bend:
                raise ValueError("MP4 truncated mvhd (empty body)")
            version = payload[body]
            need = 32 if version == 1 else 20
            if bend - body < need:
                raise ValueError("MP4 truncated mvhd")
            if version == 1:
                _c, _m, timescale, duration = struct.unpack(
                    ">QQIQ", payload[body + 4 : body + 32])
            else:
                _c, _m, timescale, duration = struct.unpack(
                    ">IIII", payload[body + 4 : body + 20])
            if timescale == 0:
                raise ValueError("MP4 mvhd timescale 0")
            duration_ms = duration * 1000 // timescale
        elif btype == b"trak" and width is None:
            for t2, b2, e2 in boxes(payload, body, bend):
                if t2 == b"tkhd":
                    if b2 >= e2:
                        raise ValueError("MP4 truncated tkhd (empty body)")
                    version = payload[b2]
                    # width/height sit after version/flags(4) +
                    # creation/modification/track/reserved/duration
                    # (20 at v0, 32 at v1) + reserved(8) + layer/group/
                    # volume/reserved(8) + matrix(36) = 76 (v0) / 88 (v1)
                    off = b2 + (88 if version == 1 else 76)
                    # an in-bounds-but-short tkhd must not silently read
                    # the NEXT box's bytes as width/height
                    if off + 8 > e2:
                        raise ValueError("MP4 truncated tkhd")
                    w_fp, h_fp = struct.unpack(">II", payload[off : off + 8])
                    width, height = w_fp >> 16, h_fp >> 16
    if duration_ms is None:
        raise ValueError("MP4 moov missing mvhd")
    if width is None or height is None:
        raise ValueError("MP4 moov missing trak/tkhd dimensions")
    return width, height, duration_ms


def synth_media(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Deterministic fake media table — stable under any partitioning.
    Every payload carries a VALID container header consistent with the
    metadata columns — PNG IHDR, WAV RIFF, and (since r5) MP4
    ftyp/moov/mvhd/tkhd — so all three real header codecs below are
    exercised end-to-end; only pixel/sample/frame DATA stays synthetic."""

    def gen(it):
        for pdf in it:
            rows = []
            for mid in pdf["id"].tolist():
                kind, mime = _KINDS[mid % 3]
                h = hashlib.sha256(f"{seed}:{mid}".encode()).digest()
                filler = (h * ((64 + mid % 128) // len(h) + 1))[: 64 + mid % 128]
                width = (mid % 32 + 1) * 16 if kind != "audio" else None
                height = (mid % 18 + 1) * 16 if kind != "audio" else None
                duration = (mid % 300 + 1) * 100 if kind != "image" else None
                if kind == "image":
                    payload = _png_payload(filler, width, height)
                elif kind == "audio":
                    payload = _wav_payload(filler, duration)
                else:
                    payload = _mp4_payload(filler, width, height, duration)
                rows.append((mid, kind, mime, payload, width, height, duration))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "kind", "mime", "payload", "width", "height", "duration_ms",
                ],
            )

    return spark.range(n).mapInPandas(gen, schema=MEDIA_SCHEMA)


def parse_png_header(payload: bytes) -> tuple[int, int, int, int]:
    """(width, height, bit_depth, color_type) from a PNG IHDR — a real
    stdlib parse (signature + first-chunk check + CRC verification), no
    codec libraries involved."""
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG: bad signature")
    length, ctype = struct.unpack(">I4s", payload[8:16])
    if ctype != b"IHDR" or length != 13:
        raise ValueError("not a PNG: first chunk is not a 13-byte IHDR")
    width, height, depth, color = struct.unpack(">IIBB", payload[16:26])
    (crc,) = struct.unpack(">I", payload[29:33])
    if crc != zlib.crc32(payload[12:29]) & 0xFFFFFFFF:
        raise ValueError("PNG IHDR CRC mismatch")
    return width, height, depth, color


def parse_wav_header(payload: bytes) -> tuple[int, int, int, int]:
    """(sample_rate, channels, bits, duration_ms) from RIFF/WAVE chunks.
    Walks the chunk list for ``fmt `` and ``data``; duration comes from the
    declared data size over the byte rate (the payload may truncate the
    sample bytes — the header contract is what a 100 TB scan reads)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV: bad RIFF/WAVE header")
    pos, fmt, data_size = 12, None, None
    while pos + 8 <= len(payload) and (fmt is None or data_size is None):
        cid, size = struct.unpack("<4sI", payload[pos : pos + 8])
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", payload[pos + 8 : pos + 24])
        elif cid == b"data":
            data_size = size
        pos += 8 + size + (size & 1)
    if fmt is None or data_size is None:
        raise ValueError("WAV missing fmt/data chunk")
    _audio_format, channels, rate, byte_rate, _block, bits = fmt
    return rate, channels, bits, data_size * 1000 // byte_rate


def decode_stub(payload: bytes, kind: str, fake: bool = False) -> list[float]:
    """Codec seam. Real deployment plugs Pillow/torchaudio/ffmpeg here for
    pixel/sample-level features.

    ``fake=True`` returns a deterministic 8-dim sha-derived vector (the
    plumbing test stub, all kinds). ``fake=False`` is REAL for all three
    kinds since r5: an 8-dim feature from the stdlib-parsed container
    header (PNG IHDR / WAV RIFF / MP4 moov-mvhd-tkhd —
    parse_png_header/parse_wav_header/parse_mp4_header) plus raw byte
    statistics, each dimension normalized into [0, 1]. Only pixel/sample/
    frame DATA decode remains a seam (resize_images / sample_frames raise
    without ``fake`` — that step genuinely needs Pillow/ffmpeg).
    """
    if fake:
        h = hashlib.sha256(payload).digest()
        return [b / 255.0 for b in h[:8]]
    n = len(payload)
    mean_byte = (sum(payload) / n / 255.0) if n else 0.0
    size_dim = min(1.0, n / float(1 << 20))
    if kind == "image":
        width, height, depth, color = parse_png_header(payload)
        return [
            min(1.0, width / 65535.0),
            min(1.0, height / 65535.0),
            depth / 16.0,
            color / 6.0,
            min(1.0, width * height / 16_777_216.0),  # vs 4096x4096
            min(1.0, (width / height) / 8.0) if height else 0.0,
            size_dim,
            mean_byte,
        ]
    if kind == "audio":
        rate, channels, bits, duration_ms = parse_wav_header(payload)
        return [
            min(1.0, rate / 192_000.0),
            channels / 8.0,
            bits / 32.0,
            min(1.0, duration_ms / 3_600_000.0),  # vs 1 hour
            min(1.0, duration_ms / 60_000.0),  # vs 1 minute (finer scale)
            min(1.0, (rate * channels * bits / 8) / 1_536_000.0),  # byte rate vs 48k stereo 16-bit
            size_dim,
            mean_byte,
        ]
    if kind == "video":
        width, height, duration_ms = parse_mp4_header(payload)
        return [
            min(1.0, width / 65535.0),
            min(1.0, height / 65535.0),
            min(1.0, duration_ms / 3_600_000.0),  # vs 1 hour
            min(1.0, duration_ms / 60_000.0),  # vs 1 minute (finer scale)
            min(1.0, width * height / 16_777_216.0),  # vs 4096x4096
            min(1.0, (width / height) / 8.0) if height else 0.0,
            size_dim,
            mean_byte,
        ]
    raise ValueError(f"unknown media kind {kind!r}")


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
