"""Multimodal binary-column plumbing: schema, mapInPandas batches, stubs."""

import numpy as np
import pytest

from covid19_spark.operators.multimodal import (
    decode_image,
    extract_image_features,
    fake_image_features,
    frame_sample_plan,
    synthesize_media,
)


def test_fake_features_deterministic():
    a = fake_image_features(b"hello world")
    b = fake_image_features(b"hello world")
    assert np.allclose(a, b)
    assert abs(float(np.linalg.norm(a)) - 1.0) < 1e-6
    assert fake_image_features(b"").tolist() == [0.0] * 8


def test_decode_stub_raises():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")


def test_extract_features_end_to_end(spark):
    media = synthesize_media(spark, n=12)
    out = extract_image_features(media).collect()
    assert len(out) == 12
    r = {x.media_id: x for x in out}
    assert r[0].n_bytes == 128
    assert len(r[0].feature) == 8
    # deterministic across runs
    again = {x.media_id: x for x in extract_image_features(media).collect()}
    assert r[3].feature == again[3].feature


def test_frame_sample_plan(spark):
    media = synthesize_media(spark, n=12)
    frames = frame_sample_plan(media, every_ms=1000).collect()
    # only video rows fan out; media_id=5 has duration 5000 → 6 frames (0..5000)
    counts = {}
    for f in frames:
        counts[f.media_id] = counts.get(f.media_id, 0) + 1
    assert counts[5] == 6
    assert all(mid % 3 == 2 for mid in counts)  # kind == video
