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


def test_resize_images_contract(spark):
    from covid19_spark.operators.multimodal import resize_images, synthesize_media

    media = synthesize_media(spark, n=30)
    n_images = media.filter("kind = 'image'").count()
    out = resize_images(media, 16, 12).collect()
    assert len(out) == n_images
    for r in out:
        assert r.width == 16 and r.height == 12
        assert len(r.payload) == 16 * 12  # exact output sizing
    # deterministic
    again = resize_images(synthesize_media(spark, n=30), 16, 12).collect()
    assert {r.media_id: bytes(r.payload) for r in out} == {
        r.media_id: bytes(r.payload) for r in again
    }


def test_audio_features_contract(spark):
    from covid19_spark.operators.multimodal import extract_audio_features, synthesize_media

    media = synthesize_media(spark, n=30)
    n_audio = media.filter("kind = 'audio'").count()
    rows = extract_audio_features(media, n_windows=8).collect()
    assert len(rows) == n_audio
    for r in rows:
        assert r.n_windows == 8 and len(r.feature) == 8
        assert all(0.0 <= x <= 1.0 for x in r.feature)  # peak-normalized
        assert r.n_bytes > 0


def test_real_codec_paths_raise(spark):
    import pytest

    from covid19_spark.operators.multimodal import (
        extract_audio_features,
        resize_images,
        synthesize_media,
    )

    media = synthesize_media(spark, n=6)
    with pytest.raises(Exception, match="NotImplementedError|image codec"):
        resize_images(media, 8, 8, use_fake=False).collect()
    with pytest.raises(Exception, match="NotImplementedError|image codec"):
        extract_audio_features(media, use_fake=False).collect()
