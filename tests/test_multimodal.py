"""Multimodal plumbing tests: schema, determinism, stub gating, dedup."""

from __future__ import annotations

import pytest

from jcpg_spark.operators import multimodal as mm


def test_synth_media_deterministic(spark):
    a = sorted(tuple(r) for r in mm.synth_media(spark, 30).collect())
    b = sorted(tuple(r) for r in mm.synth_media(spark, 30).repartition(7).collect())
    assert a == b
    kinds = {r[1] for r in a}
    assert kinds == {"image", "audio", "video"}


def test_decode_rejects_malformed_headers():
    with pytest.raises(ValueError):
        mm.decode_stub(b"abc", "image")
    with pytest.raises(ValueError):
        mm.decode_stub(b"RIFFxxxxJUNK", "audio")
    with pytest.raises(ValueError):  # no moov box
        mm.decode_stub(b"\x00\x00\x00\x10ftypisom\x00\x00\x02\x00", "video")
    with pytest.raises(ValueError):
        mm.decode_stub(b"abc", "unknown-kind")
    # corrupt the IHDR CRC of an otherwise-valid PNG
    good = mm._png_payload(b"\x00" * 32, 64, 48)
    bad = good[:29] + b"\xff\xff\xff\xff" + good[33:]
    with pytest.raises(ValueError, match="CRC"):
        mm.parse_png_header(bad)
    # mp4 with a box whose declared size overruns the payload
    mp4 = mm._mp4_payload(b"\x00" * 16, 320, 240, 5000)
    with pytest.raises(ValueError, match="bounds"):
        mm.parse_mp4_header(mp4[:40])
    # moov present but no mvhd
    import struct

    hollow = mm._mp4_box(b"ftyp", b"isom\x00\x00\x02\x00") + mm._mp4_box(
        b"moov", mm._mp4_box(b"free", b""))
    with pytest.raises(ValueError, match="mvhd"):
        mm.parse_mp4_header(hollow)
    del struct


def test_real_header_decode_matches_metadata(spark):
    """PNG IHDR, WAV RIFF, and MP4 moov/mvhd/tkhd parses (stdlib struct/
    zlib — real, not stubbed) recover exactly the width/height/duration
    the synthesizer declared in the metadata columns, for ALL kinds."""
    rows = mm.synth_media(spark, 60).collect()
    assert {r.kind for r in rows} == {"image", "audio", "video"}
    for r in rows:
        if r.kind == "image":
            w, h, depth, color = mm.parse_png_header(r.payload)
            assert (w, h) == (r.width, r.height)
            assert (depth, color) == (8, 2)
        elif r.kind == "audio":
            rate, channels, bits, dur = mm.parse_wav_header(r.payload)
            assert dur == r.duration_ms
            assert (rate, channels, bits) == (mm._WAV_RATE, 1, 16)
        else:
            w, h, dur = mm.parse_mp4_header(r.payload)
            assert (w, h, dur) == (r.width, r.height, r.duration_ms)


def test_parse_mp4_version1_and_largesize_boxes():
    """The walker handles 64-bit mvhd/tkhd fields (version 1) and
    largesize/size-0 box encodings, not just the synthesizer's output."""
    import struct

    matrix = struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
    mvhd_v1 = mm._mp4_box(
        b"mvhd",
        struct.pack(">B3xQQIQ", 1, 0, 0, 90_000, 90_000 * 7)  # 7s at 90kHz
        + struct.pack(">iH10x", 0x00010000, 0x0100)
        + matrix + struct.pack(">6I", 0, 0, 0, 0, 0, 0) + struct.pack(">I", 2),
    )
    tkhd_v1 = mm._mp4_box(
        b"tkhd",
        struct.pack(">B3BQQI4xQ8x", 1, 0, 0, 7, 0, 0, 1, 90_000 * 7)
        + struct.pack(">HHHH", 0, 0, 0, 0) + matrix
        + struct.pack(">II", 1920 << 16, 1080 << 16),
    )
    moov = mm._mp4_box(b"moov", mvhd_v1 + mm._mp4_box(b"trak", tkhd_v1))
    # wrap moov in a largesize encoding: size=1 + 64-bit largesize
    body = moov[8:]
    large = struct.pack(">I4sQ", 1, b"moov", 16 + len(body)) + body
    ftyp = mm._mp4_box(b"ftyp", b"isom\x00\x00\x02\x00")
    assert mm.parse_mp4_header(ftyp + large) == (1920, 1080, 7000)
    # size-0 final box (extends to EOF)
    zero = struct.pack(">I4s", 0, b"moov") + body
    assert mm.parse_mp4_header(ftyp + zero) == (1920, 1080, 7000)


def test_extract_features_real_decode_all_kinds(spark):
    media = mm.synth_media(spark, 30)
    feats = mm.extract_features(media, fake=False)
    rows = feats.collect()
    assert len(rows) == media.count() > 0
    for r in rows:
        assert len(r.feature) == 8
        assert all(0.0 <= v <= 1.0 for v in r.feature)
    # header-derived features are not the sha stub: two images of different
    # dims must differ in the dim features even for equal payload length
    by_id = {r.media_id: r.feature for r in rows}
    imgs = [r for r in mm.synth_media(spark, 30).collect() if r.kind == "image"]
    a, b = imgs[0], imgs[1]
    assert (a.width, a.height) != (b.width, b.height)
    assert by_id[a.media_id][:2] != by_id[b.media_id][:2]


def test_extract_features_shape(spark):
    media = mm.synth_media(spark, 20)
    feats = mm.extract_features(media, fake=True)
    rows = feats.collect()
    assert len(rows) == 20
    for r in rows:
        assert len(r.feature) == 8
        assert all(0.0 <= v <= 1.0 for v in r.feature)
        assert len(r.payload_sha256) == 64
    # map-side only: no exchange in the plan
    plan = feats._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_resize_images_contract(spark):
    media = mm.synth_media(spark, 30)
    out = mm.resize_images(media, 64, 48, fake=True)
    rows = out.collect()
    n_images = media.filter("kind = 'image'").count()
    assert len(rows) == n_images > 0
    expected_len = max(16, (64 * 48) // 64)
    for r in rows:
        assert (r.width, r.height) == (64, 48)
        assert len(r.payload) == expected_len
    # deterministic + map-side only
    again = mm.resize_images(media, 64, 48, fake=True).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    with pytest.raises(Exception):  # fail-loud codec seam
        mm.resize_images(media, 64, 48, fake=False).collect()


def test_sample_frames_counts_follow_duration(spark):
    media = mm.synth_media(spark, 30)
    frames = mm.sample_frames(media, every_ms=1000, fake=True)
    got = frames.groupBy("media_id").count().collect()
    durs = {r.media_id: r.duration_ms for r in media.filter("kind = 'video'").collect()}
    assert {r.media_id for r in got} == set(durs)
    for r in got:
        assert r["count"] == max(1, durs[r.media_id] // 1000)
    # frame timestamps are the sampling grid
    one = frames.filter(f"media_id = {min(durs)}").orderBy("frame_idx").collect()
    assert [r.t_ms for r in one] == [i * 1000 for i in range(len(one))]


def test_exact_dup_media(spark):
    media = mm.synth_media(spark, 10)
    dupes = media.union(media.limit(4))  # duplicate 4 payloads
    out = {r.canonical_media_id: r.n_dups for r in mm.exact_dup_media(dupes).collect()}
    assert sum(out.values()) == 14
    assert sorted(v for v in out.values()) == [1] * 6 + [2] * 4


def test_parse_mp4_truncated_mvhd_tkhd_raise_valueerror():
    """Structured-truncation cases (r5 ADVICE): box framing is VALID but
    the mvhd/tkhd body is shorter than its fixed field layout — the walk
    must classify with ValueError, never IndexError/struct.error, and an
    in-bounds-but-short tkhd must not read the next box's bytes."""
    import pytest

    ftyp = mm._mp4_box(b"ftyp", b"isom\x00\x00\x02\x00")
    # size-8 mvhd: empty body
    for bad_moov in [
        mm._mp4_box(b"moov", mm._mp4_box(b"mvhd", b"")),
        # v0 mvhd body shorter than 20 bytes
        mm._mp4_box(b"moov", mm._mp4_box(b"mvhd", b"\x00" * 12)),
        # v1 mvhd body shorter than 32 bytes
        mm._mp4_box(b"moov", mm._mp4_box(b"mvhd", b"\x01" + b"\x00" * 20)),
    ]:
        with pytest.raises(ValueError):
            mm.parse_mp4_header(ftyp + bad_moov)

    good_mvhd = mm._mp4_box(
        b"mvhd",
        b"\x00\x00\x00\x00"
        + __import__("struct").pack(">IIII", 0, 0, 1000, 5000)
        + b"\x00" * 80,
    )
    for bad_tkhd in [
        mm._mp4_box(b"tkhd", b""),            # empty body
        mm._mp4_box(b"tkhd", b"\x00" * 40),   # v0 shorter than 84
        mm._mp4_box(b"tkhd", b"\x01" + b"\x00" * 90),  # v1 shorter than 96
    ]:
        # follow the short tkhd with a sibling box whose bytes a naive
        # fixed-offset read would misinterpret as width/height
        trak = mm._mp4_box(b"trak", bad_tkhd + mm._mp4_box(b"free", b"\xff" * 64))
        with pytest.raises(ValueError):
            mm.parse_mp4_header(ftyp + mm._mp4_box(b"moov", good_mvhd + trak))
