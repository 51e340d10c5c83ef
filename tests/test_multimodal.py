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


def test_decode_stub_video_raises_without_fake():
    # video is the remaining honest stub; image/audio now decode for real
    with pytest.raises(NotImplementedError):
        mm.decode_stub(b"abc", "video")


def test_decode_rejects_malformed_headers():
    with pytest.raises(ValueError):
        mm.decode_stub(b"abc", "image")
    with pytest.raises(ValueError):
        mm.decode_stub(b"RIFFxxxxJUNK", "audio")
    # corrupt the IHDR CRC of an otherwise-valid PNG
    good = mm._png_payload(b"\x00" * 32, 64, 48)
    bad = good[:29] + b"\xff\xff\xff\xff" + good[33:]
    with pytest.raises(ValueError, match="CRC"):
        mm.parse_png_header(bad)


def test_real_header_decode_matches_metadata(spark):
    """PNG IHDR and WAV RIFF parses (stdlib struct/zlib — real, not stubbed)
    recover exactly the width/height/duration the synthesizer declared in
    the metadata columns."""
    rows = mm.synth_media(spark, 60).filter("kind != 'video'").collect()
    assert rows
    for r in rows:
        if r.kind == "image":
            w, h, depth, color = mm.parse_png_header(r.payload)
            assert (w, h) == (r.width, r.height)
            assert (depth, color) == (8, 2)
        else:
            rate, channels, bits, dur = mm.parse_wav_header(r.payload)
            assert dur == r.duration_ms
            assert (rate, channels, bits) == (mm._WAV_RATE, 1, 16)


def test_extract_features_real_decode_image_audio(spark):
    media = mm.synth_media(spark, 30).filter("kind != 'video'")
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
