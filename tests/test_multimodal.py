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


def test_decode_stub_raises_without_fake():
    with pytest.raises(NotImplementedError):
        mm.decode_stub(b"abc", "image")


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


def test_exact_dup_media(spark):
    media = mm.synth_media(spark, 10)
    dupes = media.union(media.limit(4))  # duplicate 4 payloads
    out = {r.canonical_media_id: r.n_dups for r in mm.exact_dup_media(dupes).collect()}
    assert sum(out.values()) == 14
    assert sorted(v for v in out.values()) == [1] * 6 + [2] * 4
