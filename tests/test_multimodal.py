"""Multimodal binary-column plumbing: schema, mapInPandas batches, stubs."""

import struct

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
    # A JPEG magic followed by nothing is a TRUNCATED JPEG: the real decoder
    # (operators/jpeg.py) owns the format and must fail with its documented
    # ValueError contract, not a raw struct.error (ADVICE r04).
    with pytest.raises(ValueError, match="truncated"):
        decode_image(b"\xff\xd8\xff\xe0")
    # A truncated PNG magic (4 of 8 signature bytes) is not recognized as
    # PNG, BMP, JPEG, or GIF — falls through to the no-codec stub.
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")
    # GIF is now a REAL codec: a truncated GIF is the codec's ValueError,
    # not the stub; formats we genuinely lack still fall through.
    with pytest.raises(ValueError, match="GIF"):
        decode_image(b"GIF89a\x00\x00")
    with pytest.raises(NotImplementedError):
        decode_image(b"RIFF\x00\x00\x00\x00WEBP")


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

    # synthesize_media payloads are random bytes, not real containers: the
    # real-decode paths must fail loudly, not featurize garbage
    media = synthesize_media(spark, n=6)
    with pytest.raises(Exception, match="NotImplementedError|image codec"):
        resize_images(media, 8, 8, use_fake=False).collect()
    with pytest.raises(Exception, match="not a WAV"):
        extract_audio_features(media, use_fake=False).collect()


def test_bmp_roundtrip_exact():
    from covid19_spark.operators.multimodal import decode_bmp, encode_bmp

    rng = np.random.default_rng(11)
    for h, w in [(5, 3), (4, 4), (7, 2), (1, 1)]:  # w=3,2,1 exercise row padding
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert np.array_equal(decode_bmp(encode_bmp(img)), img)


def test_bmp_top_down_and_rejects():
    import struct

    import pytest

    from covid19_spark.operators.multimodal import decode_bmp, encode_bmp

    img = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    buf = bytearray(encode_bmp(img))
    # flip height negative -> top-down row order; rows must come out reversed
    h = struct.unpack_from("<i", buf, 22)[0]
    struct.pack_into("<i", buf, 22, -h)
    assert np.array_equal(decode_bmp(bytes(buf)), img[::-1])
    with pytest.raises(ValueError):
        decode_bmp(b"\x89PNG")
    bad = bytearray(encode_bmp(img))
    struct.pack_into("<H", bad, 28, 8)  # 8-bpp paletted
    with pytest.raises(NotImplementedError):
        decode_bmp(bytes(bad))


def test_real_decode_path_end_to_end_exact_features(spark):
    """use_fake=False exercised for real: generated BMPs decode through the
    pure-numpy reader inside mapInPandas and produce the exact features
    computed locally from the known pixel arrays."""
    from covid19_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        encode_bmp,
        image_features_from_pixels,
    )

    rng = np.random.default_rng(23)
    imgs = {i: rng.integers(0, 256, size=(6 + i, 5 + i, 3), dtype=np.uint8) for i in range(8)}
    rows = [
        (i, "image", "image/bmp", int(imgs[i].shape[1]), int(imgs[i].shape[0]), None, encode_bmp(imgs[i]))
        for i in range(8)
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r.media_id: r for r in extract_image_features(media, use_fake=False).collect()}
    assert len(out) == 8
    for i, img in imgs.items():
        expected = image_features_from_pixels(img)
        assert np.allclose(out[i].feature, expected, atol=1e-6), i
        assert out[i].n_bytes == len(encode_bmp(img))


def test_png_roundtrip_exact_all_filters():
    """encode_png/decode_png are pure-stdlib; every scanline filter type
    (None/Sub/Up/Average/Paeth) must round-trip RGB pixels exactly."""
    from covid19_spark.operators.multimodal import decode_png, encode_png

    rng = np.random.default_rng(11)
    for h, w in [(1, 1), (5, 7), (16, 9)]:
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        for ftype in range(5):
            got = decode_png(encode_png(img, filter_type=ftype))
            assert np.array_equal(got, img), (h, w, ftype)


def test_png_gray_and_rgba():
    from covid19_spark.operators.multimodal import decode_png, encode_png

    rng = np.random.default_rng(12)
    gray = rng.integers(0, 256, size=(6, 4), dtype=np.uint8)
    out = decode_png(encode_png(gray, filter_type=4))
    assert out.shape == (6, 4, 3)
    assert np.array_equal(out[:, :, 0], gray)
    assert np.array_equal(out[:, :, 1], gray)

    rgba = rng.integers(0, 256, size=(3, 5, 4), dtype=np.uint8)
    out = decode_png(encode_png(rgba, filter_type=2))
    assert np.array_equal(out, rgba[:, :, :3])


def test_png_rejects_corrupt_and_unsupported():
    import struct
    import zlib

    from covid19_spark.operators.multimodal import PNG_SIG, decode_png, encode_png

    img = np.zeros((4, 4, 3), dtype=np.uint8)
    good = bytearray(encode_png(img))
    good[40] ^= 0xFF  # flip a byte inside IDAT -> CRC mismatch
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(good))
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"BM123456")

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    # Adam7 is now DECODED (not a seam) — a correctly sized all-zero 4x4 RGB
    # interlaced stream (7 passes: 4+0+0+4+7+14+26 = 55 filtered bytes) must
    # come back as zeros, and a byte-count mismatch is corrupt data.
    interlaced = (
        PNG_SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 1))
        + chunk(b"IDAT", zlib.compress(b"\x00" * 55))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(interlaced), np.zeros((4, 4, 3), np.uint8))
    short = (
        PNG_SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 1))
        + chunk(b"IDAT", zlib.compress(b"\x00" * 52))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="length mismatch"):
        decode_png(short)
    # palette color type without its PLTE chunk -> corrupt, not unsupported
    paletted = (
        PNG_SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 8, 3, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"\x00" * 20))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="PLTE"):
        decode_png(paletted)


def test_png_real_decode_path_end_to_end(spark):
    """use_fake=False over PNG payloads: generated PNGs decode through the
    stdlib codec inside mapInPandas and featurize identically to decoding
    the same pixels locally."""
    from covid19_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        encode_png,
        extract_image_features,
        image_features_from_pixels,
    )

    rng = np.random.default_rng(21)
    imgs = {i: rng.integers(0, 256, size=(6 + i, 5 + i, 3), dtype=np.uint8) for i in range(4)}
    rows = [
        (i, "image", "image/png", int(imgs[i].shape[1]), int(imgs[i].shape[0]), None,
         encode_png(imgs[i], filter_type=i % 5))
        for i in imgs
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r.media_id: r for r in extract_image_features(media, use_fake=False).collect()}
    for i, img in imgs.items():
        expected = image_features_from_pixels(img)
        assert np.allclose(np.array(out[i].feature), expected, atol=1e-6), i


# --- full-coverage PNG variants (Adam7 / palette / sub-byte / 16-bit) -------
# Hand-assembled payloads: the repo's encode_png writes only 8-bit
# non-interlaced streams, so these build the exotic variants chunk by chunk.

def _png_chunk(typ: bytes, data: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def _make_png(w, h, depth, ctype, interlace, raw, plte=None) -> bytes:
    import struct
    import zlib

    from covid19_spark.operators.multimodal import PNG_SIG

    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, interlace)
    out = PNG_SIG + _png_chunk(b"IHDR", ihdr)
    if plte is not None:
        out += _png_chunk(b"PLTE", plte)
    return out + _png_chunk(b"IDAT", zlib.compress(raw)) + _png_chunk(b"IEND", b"")


def _adam7_scanlines(img: np.ndarray) -> bytes:
    """Filter-0 scanlines for every non-empty Adam7 pass of an 8-bit image."""
    from covid19_spark.operators.multimodal import _ADAM7

    out = b""
    for x0, y0, dx, dy in _ADAM7:
        sub = img[y0::dy, x0::dx]
        if sub.shape[0] == 0 or sub.shape[1] == 0:
            continue
        for r in range(sub.shape[0]):
            out += b"\x00" + sub[r].tobytes()
    return out


def test_png_adam7_interlaced_roundtrip():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(13, 11, 3), dtype=np.uint8)
    payload = _make_png(11, 13, 8, 2, 1, _adam7_scanlines(img))
    assert np.array_equal(decode_image(payload), img)


def test_png_adam7_tiny_image_skips_empty_passes():
    # 3x2: several of the 7 passes have zero width or height
    img = np.arange(3 * 2 * 3, dtype=np.uint8).reshape(2, 3, 3)
    payload = _make_png(3, 2, 8, 2, 1, _adam7_scanlines(img))
    assert np.array_equal(decode_image(payload), img)


def test_png_palette_4bit():
    # 2 rows x 5 cols of 4-bit indices (odd width exercises nibble padding)
    pal = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 10, 20, 30, 200, 100, 50])
    idx = [[0, 1, 2, 3, 4], [4, 3, 2, 1, 0]]
    raw = b""
    for row in idx:
        packed = bytearray([0])  # filter 0
        for i in range(0, len(row), 2):
            hi = row[i] << 4
            lo = row[i + 1] if i + 1 < len(row) else 0
            packed.append(hi | lo)
        raw += bytes(packed)
    out = decode_image(_make_png(5, 2, 4, 3, 0, raw, plte=pal))
    expect = np.array(
        [[list(pal[3 * i : 3 * i + 3]) for i in row] for row in idx], dtype=np.uint8
    ).reshape(2, 5, 3)
    assert np.array_equal(out, expect)


def test_png_gray_1bit_checkerboard():
    w, h = 10, 4
    rows = []
    for r in range(h):
        bits = [(r + c) % 2 for c in range(w)]
        packed = bytearray([0])
        for i in range(0, w, 8):
            byte = 0
            for j, b in enumerate(bits[i : i + 8]):
                byte |= b << (7 - j)
            packed.append(byte)
        rows.append(bytes(packed))
    out = decode_image(_make_png(w, h, 1, 0, 0, b"".join(rows)))
    expect = np.array(
        [[255 if (r + c) % 2 else 0 for c in range(w)] for r in range(h)],
        dtype=np.uint8,
    )
    assert np.array_equal(out, np.repeat(expect[:, :, None], 3, axis=2))


def test_png_16bit_rgb_takes_high_byte():
    img16 = np.array(
        [[[0x1234, 0xFF00, 0x00FF], [0xABCD, 0x8000, 0x7FFF]]], dtype=">u2"
    )
    raw = b"\x00" + img16.tobytes()
    out = decode_image(_make_png(2, 1, 16, 2, 0, raw))
    assert np.array_equal(
        out, np.array([[[0x12, 0xFF, 0x00], [0xAB, 0x80, 0x7F]]], dtype=np.uint8)
    )


def test_png_gray_alpha_drops_alpha():
    ga = np.array([[[10, 255], [200, 0]], [[77, 128], [0, 1]]], dtype=np.uint8)
    raw = b"".join(b"\x00" + ga[r].tobytes() for r in range(2))
    out = decode_image(_make_png(2, 2, 8, 4, 0, raw))
    assert np.array_equal(out, np.repeat(ga[:, :, :1], 3, axis=2))


def test_png_illegal_combo_and_bad_palette_raise():
    with pytest.raises(ValueError, match="depth/color-type"):
        _ = decode_image(_make_png(2, 1, 4, 2, 0, b"\x00\x00"))  # 4-bit RGB illegal
    pal = bytes([1, 2, 3])  # 1 entry but index 5 referenced
    raw = b"\x00" + bytes([5])
    with pytest.raises(ValueError, match="palette index"):
        _ = decode_image(_make_png(1, 1, 8, 3, 0, raw, plte=pal))


# --- WAV (RIFF PCM) codec ----------------------------------------------------


def test_wav_int16_roundtrip_exact():
    from covid19_spark.operators.multimodal import decode_wav, encode_wav

    rng = np.random.default_rng(5)
    mono = rng.integers(-32768, 32768, size=333, dtype=np.int16)
    out, rate = decode_wav(encode_wav(mono, 8000))
    assert rate == 8000 and out.shape == (333, 1)
    assert np.array_equal((out[:, 0] * 32768.0).astype(np.int16), mono)
    stereo = rng.integers(-32768, 32768, size=(100, 2), dtype=np.int16)
    out, rate = decode_wav(encode_wav(stereo, 44100))
    assert rate == 44100 and out.shape == (100, 2)
    assert np.array_equal((out * 32768.0).astype(np.int16), stereo)


def test_wav_other_depths_and_float():
    import struct

    from covid19_spark.operators.multimodal import decode_wav

    def wav(fmt_tag, ch, rate, bits, data):
        fmt = struct.pack("<HHIIHH", fmt_tag, ch, rate, rate * ch * bits // 8, ch * bits // 8, bits)
        body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        # a LIST chunk the parser must skip
        body += b"LIST" + struct.pack("<I", 4) + b"INFO"
        body += b"data" + struct.pack("<I", len(data)) + data
        return b"RIFF" + struct.pack("<I", len(body)) + body

    # 8-bit unsigned: 128 -> 0.0, 255 -> ~+1, 0 -> -1
    out, _ = decode_wav(wav(1, 1, 8000, 8, bytes([0, 128, 255])))
    assert np.allclose(out[:, 0], [-1.0, 0.0, 127 / 128], atol=1e-6)
    # 24-bit packed little-endian: 0x800000 is most negative
    data24 = b"\x00\x00\x80" + b"\xff\xff\x7f" + b"\x00\x00\x00"
    out, _ = decode_wav(wav(1, 1, 8000, 24, data24))
    assert np.allclose(out[:, 0], [-1.0, (2**23 - 1) / 2**23, 0.0], atol=1e-6)
    # 32-bit int
    data32 = struct.pack("<3i", -(2**31), 2**31 - 1, 0)
    out, _ = decode_wav(wav(1, 1, 8000, 32, data32))
    assert np.allclose(out[:, 0], [-1.0, (2**31 - 1) / 2**31, 0.0], atol=1e-6)
    # IEEE float32 (format 3)
    dataf = struct.pack("<3f", -0.5, 0.25, 1.0)
    out, _ = decode_wav(wav(3, 1, 8000, 32, dataf))
    assert np.allclose(out[:, 0], [-0.5, 0.25, 1.0])
    # MS ADPCM (format 2) is now REAL: a malformed block align is the
    # codec's corrupt-stream error, not the seam
    with pytest.raises(ValueError, match="MS ADPCM"):
        decode_wav(wav(2, 1, 8000, 4, b"\x00\x00"))
    # genuinely compressed formats we lack stay a seam (MP3-in-WAV)
    with pytest.raises(NotImplementedError):
        decode_wav(wav(0x55, 1, 8000, 0, b"\x00\x00"))
    # truncated chunk is corrupt
    with pytest.raises(ValueError, match="truncated"):
        decode_wav(wav(1, 1, 8000, 16, b"\x00" * 8)[:-4])


def test_audio_real_decode_end_to_end(spark):
    """use_fake=False over REAL WAV payloads: features computed in
    mapInPandas equal those computed locally from the same samples."""
    from covid19_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        audio_features_from_samples,
        decode_wav,
        encode_wav,
        extract_audio_features,
    )

    rng = np.random.default_rng(9)
    wavs = {}
    rows = []
    for i in range(6):
        t = np.arange(4000 + 500 * i)
        tone = (10000 * np.sin(2 * np.pi * (200 + 50 * i) * t / 8000)).astype(np.int16)
        payload = encode_wav(tone, 8000)
        wavs[i] = payload
        rows.append((i, "audio", "audio/wav", None, None, 500, payload))
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r.media_id: r for r in extract_audio_features(media, n_windows=8, use_fake=False).collect()}
    assert len(out) == 6
    for i, payload in wavs.items():
        expected = audio_features_from_samples(decode_wav(payload)[0], 8)
        assert np.allclose(out[i].feature, expected, atol=1e-6), i


# --- MJPEG AVI video path ----------------------------------------------------


def _mk_frames(n=8, h=24, w=32):
    frames = []
    for i in range(n):
        yy, xx = np.mgrid[0:h, 0:w]
        img = np.stack(
            [(xx * 3 + i * 20) % 256, (yy * 5) % 256, ((xx + yy) * 2 + i * 10) % 256],
            axis=2,
        ).astype(np.uint8)
        frames.append(img)
    return frames


def test_avi_roundtrip_and_sampling():
    from covid19_spark.operators.jpeg import decode_jpeg
    from covid19_spark.operators.multimodal import (
        decode_avi_frames,
        encode_mjpeg_avi,
        video_frame_features,
    )

    frames = _mk_frames(12)
    payload = encode_mjpeg_avi(frames, fps=4, quality=88)
    jpegs, fps = decode_avi_frames(payload)
    assert len(jpegs) == 12 and fps == 4.0
    for i in (0, 5, 11):  # each frame is an independently decodable JPEG
        out = decode_jpeg(jpegs[i])
        assert out.shape == frames[i].shape
        assert int(np.abs(out.astype(int) - frames[i].astype(int)).max()) <= 8
    # 12 frames @4fps = 3000 ms -> samples at 0/1000/2000/3000 = idx 0/4/8/11
    sampled = video_frame_features(payload, every_ms=1000)
    assert [(ts, idx) for ts, idx, _ in sampled] == [(0, 0), (1000, 4), (2000, 8), (3000, 11)]


def test_avi_rejects():
    import struct

    from covid19_spark.operators.multimodal import decode_avi_frames, encode_mjpeg_avi

    with pytest.raises(ValueError, match="not an AVI"):
        decode_avi_frames(b"RIFF\x04\x00\x00\x00WAVE")
    payload = bytearray(encode_mjpeg_avi(_mk_frames(2), fps=5))
    with pytest.raises(ValueError, match="truncated"):
        decode_avi_frames(bytes(payload[:100]))
    # flip the stream handler to a real codec fourcc -> explicit seam
    i = payload.find(b"vidsMJPG")
    payload[i + 4 : i + 8] = b"H264"
    with pytest.raises(NotImplementedError, match="MJPEG"):
        decode_avi_frames(bytes(payload))


def test_video_real_decode_end_to_end(spark):
    """use_fake=False over REAL MJPEG AVI payloads in mapInPandas: sampled
    frame features equal those computed locally from the same container."""
    from covid19_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        encode_mjpeg_avi,
        extract_video_frames,
        video_frame_features,
    )

    payloads = {}
    rows = []
    for i in range(4):
        n = 6 + 2 * i
        payload = encode_mjpeg_avi(_mk_frames(n), fps=4)
        payloads[i] = payload
        rows.append((i, "video", "video/avi", 32, 24, int(n * 250), payload))
    # a non-video row that must be pruned before any decode
    rows.append((99, "image", "image/bmp", 8, 8, None, b"garbage"))
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = extract_video_frames(media, every_ms=500, use_fake=False).collect()
    got = {}
    for r in out:
        got.setdefault(r.media_id, []).append((r.frame_ts_ms, r.frame_index, r.feature))
    assert set(got) == set(payloads)
    for i, payload in payloads.items():
        expected = video_frame_features(payload, every_ms=500)
        rows_i = sorted(got[i])
        assert [(ts, idx) for ts, idx, _ in rows_i] == [(ts, idx) for ts, idx, _ in expected]
        for (_, _, f_got), (_, _, f_exp) in zip(rows_i, expected):
            assert np.allclose(f_got, f_exp, atol=1e-6)


def test_video_fake_path_matches_plan_fanout(spark):
    """The fake path's row fan-out equals the declarative frame_sample_plan
    (same duration/every_ms arithmetic)."""
    from covid19_spark.operators.multimodal import extract_video_frames

    media = synthesize_media(spark, n=12)
    plan_counts = {}
    for r in frame_sample_plan(media, every_ms=1000).collect():
        plan_counts[r.media_id] = plan_counts.get(r.media_id, 0) + 1
    fake_counts = {}
    for r in extract_video_frames(media, every_ms=1000, use_fake=True).collect():
        fake_counts[r.media_id] = fake_counts.get(r.media_id, 0) + 1
    assert fake_counts == plan_counts


def test_video_every_ms_must_be_positive(spark):
    from covid19_spark.operators.multimodal import (
        extract_video_frames,
        video_frame_features,
    )

    with pytest.raises(ValueError, match="every_ms"):
        extract_video_frames(synthesize_media(spark, n=3), every_ms=0)
    with pytest.raises(ValueError, match="every_ms"):
        video_frame_features(b"RIFF", every_ms=-5)


def test_avi_video_stream_not_first():
    """An AVI that declares an audio stream BEFORE the video stream carries
    its frames in 01dc chunks — the decoder must follow the strh order, not
    assume stream 0 (r05 code-review finding)."""
    import struct

    from covid19_spark.operators.jpeg import decode_jpeg, encode_jpeg
    from covid19_spark.operators.multimodal import decode_avi_frames

    def chunk(cid, data):
        pad = b"\x00" if len(data) % 2 else b""
        return cid + struct.pack("<I", len(data)) + data + pad

    def lst(four, data):
        return chunk(b"LIST", four + data)

    frames = _mk_frames(3, 16, 16)
    payloads = [encode_jpeg(f, quality=85) for f in frames]
    avih = struct.pack("<IIIIIIIIII4I", 250000, 0, 0, 0x10, 3, 0, 2, 0, 16, 16, 0, 0, 0, 0)
    auds_strh = b"auds" + b"\x00" * 4 + struct.pack("<IHHIIIIIIiI4h", *([0] * 15))
    vids_strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIiI4h", 0, 0, 0, 0, 1, 4, 0, 3, 0, -1, 0, 0, 0, 0, 0)
    )
    strf_v = struct.pack("<IiiHH4sIiiII", 40, 16, 16, 1, 24, b"MJPG", 16 * 16 * 3, 0, 0, 0, 0)
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", auds_strh) + chunk(b"strf", b"\x00" * 16))
        + lst(b"strl", chunk(b"strh", vids_strh) + chunk(b"strf", strf_v)),
    )
    movi = lst(b"movi", b"".join(chunk(b"01dc", p) for p in payloads))
    body = b"AVI " + hdrl + movi
    avi = b"RIFF" + struct.pack("<I", len(body)) + body

    jpegs, fps = decode_avi_frames(avi)
    assert len(jpegs) == 3 and fps == 4.0
    assert decode_jpeg(jpegs[0]).shape == (16, 16, 3)


# --- perceptual dHash image near-dup ----------------------------------------


def test_dhash_invariances():
    from covid19_spark.operators.jpeg import decode_jpeg, encode_jpeg
    from covid19_spark.operators.multimodal import dhash_pixels

    rng = np.random.default_rng(3)
    base = np.repeat(
        np.repeat(rng.integers(0, 256, (6, 8, 3), dtype=np.uint8), 8, axis=0), 8, axis=1
    )

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    h = dhash_pixels(base)
    assert dhash_pixels(base) == h  # deterministic
    # survives lossy JPEG re-encoding
    assert ham(h, dhash_pixels(decode_jpeg(encode_jpeg(base, quality=80)))) <= 10
    # survives 2x upscaling
    big = np.repeat(np.repeat(base, 2, axis=0), 2, axis=1)
    assert ham(h, dhash_pixels(big)) <= 6
    # unrelated image is far
    other = np.repeat(
        np.repeat(rng.integers(0, 256, (6, 8, 3), dtype=np.uint8), 8, axis=0), 8, axis=1
    )
    assert ham(h, dhash_pixels(other)) > 15


def test_image_near_dup_finds_reencodes_distributed(spark):
    """Planted JPEG re-encodes of BMP originals must surface as candidate
    pairs via the banded Hamming probe, with no unrelated cross-pairs at
    the threshold."""
    from covid19_spark.operators.jpeg import encode_jpeg
    from covid19_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        encode_bmp,
        image_dhash,
        image_near_dup_pairs,
    )

    rng = np.random.default_rng(13)
    rows = []
    for i in range(8):
        base = rng.integers(0, 256, (6, 8, 3), dtype=np.uint8)
        img = np.repeat(np.repeat(base, 6, axis=0), 6, axis=1)
        rows.append((i, "image", "image/bmp", 48, 36, None, encode_bmp(img)))
        rows.append((100 + i, "image", "image/jpeg", 48, 36, None, encode_jpeg(img, quality=80)))
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    hashes = image_dhash(media, use_fake=False)
    pairs = {(r.doc_a, r.doc_b) for r in image_near_dup_pairs(hashes, max_hamming=10).collect()}
    for i in range(8):
        assert (i, 100 + i) in pairs, i
    # no unrelated original-original pair sneaks in
    assert not any(a < 100 and b < 100 for a, b in pairs)


# --- perceptual audio fingerprint near-dup ----------------------------------


def test_audio_fingerprint_invariances():
    from covid19_spark.operators.multimodal import (
        audio_fingerprint,
        decode_wav,
        encode_wav,
    )

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    t = np.arange(16000)
    sig = np.sin(2 * np.pi * (200 + t / 200) * t / 8000) * (
        0.5 + 0.5 * np.sin(2 * np.pi * 2 * t / 8000)
    )
    s16 = (20000 * sig).astype(np.int16)
    h = audio_fingerprint(s16.astype(np.float64))
    assert h == audio_fingerprint(s16.astype(np.float64))  # deterministic
    # gain is exactly invariant (energy comparisons survive uniform scale);
    # 8-bit requantization adds noise that the finer 8-band split feels a
    # little more — the planted-copy contract is Hamming <= 8
    assert ham(h, audio_fingerprint(0.5 * s16.astype(np.float64))) <= 2
    assert ham(h, audio_fingerprint((s16 // 256 * 256).astype(np.float64))) <= 8
    out, _ = decode_wav(encode_wav(s16, 8000))
    assert ham(h, audio_fingerprint(out * 32768.0)) <= 2
    # NOTE deliberately absent: sample-repeat "resampling" halves the
    # playback pitch — audibly different content, and the spectral bands
    # rightly move (measured Hamming ~15); pitch-preserving invariance
    # would need sample-rate-aware band edges, a codec-level concern
    # unrelated signal is far
    other = (20000 * np.sin(2 * np.pi * (900 - t / 150) * t / 8000 + 1.0)).astype(np.float64)
    assert ham(h, audio_fingerprint(other)) > 10


def test_audio_near_dup_finds_variants_distributed(spark):
    from covid19_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        audio_fingerprints,
        audio_near_dup_pairs,
        encode_wav,
    )

    rows = []
    for i in range(6):
        t = np.arange(8000)
        sig = np.sin(2 * np.pi * (150 + 40 * i + t / 150) * t / 8000) * (
            0.5 + 0.5 * np.sin(2 * np.pi * (2 + i % 3) * t / 8000)
        )
        s16 = (20000 * sig).astype(np.int16)
        rows.append((i, "audio", "audio/wav", None, None, 1000, encode_wav(s16, 8000)))
        v16 = ((s16 // 2) // 256 * 256).astype(np.int16)  # half gain + 8-bit
        rows.append((100 + i, "audio", "audio/wav", None, None, 1000, encode_wav(v16, 8000)))
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    fps = audio_fingerprints(media, use_fake=False)
    pairs = {(r.doc_a, r.doc_b) for r in audio_near_dup_pairs(fps, max_hamming=10).collect()}
    for i in range(6):
        assert (i, 100 + i) in pairs, i
    assert not any(a < 100 and b < 100 for a, b in pairs)


def test_video_near_dup_finds_reencodes_distributed(spark):
    """Quality-70 re-encodes of quality-88 MJPEG videos must pair up on
    aligned per-frame dHashes; unrelated videos must not."""
    from covid19_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        encode_mjpeg_avi,
        video_frame_hashes,
        video_near_dup_pairs,
    )

    rng = np.random.default_rng(29)
    rows = []
    for i in range(5):
        base = rng.integers(0, 256, (6, 8, 3), dtype=np.uint8)
        frames = [
            np.repeat(np.repeat(np.roll(base, k, axis=1), 4, axis=0), 4, axis=1)
            for k in range(5)
        ]
        rows.append((i, "video", "video/avi", 32, 24, 1250, encode_mjpeg_avi(frames, fps=4, quality=88)))
        rows.append((100 + i, "video", "video/avi", 32, 24, 1250, encode_mjpeg_avi(frames, fps=4, quality=70)))
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    hashes = video_frame_hashes(media, every_ms=500)
    pairs = {
        (r.doc_a, r.doc_b): r.matching_frames
        for r in video_near_dup_pairs(hashes, min_matching_frames=3).collect()
    }
    for i in range(5):
        assert (i, 100 + i) in pairs, i
        assert pairs[(i, 100 + i)] >= 3
    assert not any(a < 100 and b < 100 for (a, b) in pairs)


def test_video_decode_path_flag_recovers_cross_resolution_pairs(spark):
    """r06 ADVICE: with per-frame 'auto' path selection, a video and its
    downscaled copy straddling the DC threshold hash through DIFFERENT
    decode paths and drift apart; decode_path='full' pins one path for the
    whole corpus and the cross-resolution pair must hash close on every
    aligned frame."""
    from covid19_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        encode_mjpeg_avi,
        video_frame_hashes,
        video_near_dup_pairs,
    )

    rng = np.random.default_rng(31)
    rows = []
    base = rng.integers(0, 256, (8, 10, 3), dtype=np.uint8)
    frames = [np.roll(base, k, axis=1) for k in range(4)]
    big = [np.repeat(np.repeat(f, 8, axis=0), 8, axis=1) for f in frames]  # 64x80 → DC path
    small = [np.repeat(np.repeat(f, 4, axis=0), 4, axis=1) for f in frames]  # 32x40 → full path
    rows.append((1, "video", "video/avi", 80, 64, 1000, encode_mjpeg_avi(big, fps=4, quality=90)))
    rows.append((2, "video", "video/avi", 40, 32, 1000, encode_mjpeg_avi(small, fps=4, quality=90)))
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)

    consistent = video_frame_hashes(media, every_ms=250, decode_path="full")
    pairs = {
        (r.doc_a, r.doc_b)
        for r in video_near_dup_pairs(
            consistent, max_hamming=10, min_matching_frames=3
        ).collect()
    }
    assert (1, 2) in pairs

    # the flag is validated, and 'dc'/'full' both run end to end
    with pytest.raises(ValueError, match="decode_path"):
        video_frame_hashes(media, every_ms=250, decode_path="thumbnail")
    assert (
        video_frame_hashes(media, every_ms=250, decode_path="dc").count()
        == consistent.count()
    )


def test_dhash_rejects_nonstandard_hash_size():
    """hash_size != 8 would overflow the int64 packing (larger) or zero out
    whole sub-bands and degenerate the banded probe into a near cross join
    (smaller) — pinned as an explicit error (r05 review)."""
    from covid19_spark.operators.multimodal import dhash_pixels

    img = np.zeros((16, 16, 3), dtype=np.uint8)
    for bad in (4, 9, 16):
        with pytest.raises(ValueError, match="hash_size"):
            dhash_pixels(img, hash_size=bad)


def test_avi_headerless_minimal_file_still_decodes():
    """A minimal AVI with bare 00dc chunks and NO stream headers keeps the
    old tolerance (the frames are self-describing JPEGs); only files that
    DECLARE streams must declare a video one."""
    import struct

    from covid19_spark.operators.jpeg import encode_jpeg
    from covid19_spark.operators.multimodal import decode_avi_frames

    def chunk(cid, data):
        pad = b"\x00" if len(data) % 2 else b""
        return cid + struct.pack("<I", len(data)) + data + pad

    payloads = [encode_jpeg(f, quality=85) for f in _mk_frames(2, 16, 16)]
    movi = chunk(b"LIST", b"movi" + b"".join(chunk(b"00dc", p) for p in payloads))
    body = b"AVI " + movi
    avi = b"RIFF" + struct.pack("<I", len(body)) + body
    frames, fps = decode_avi_frames(avi)
    assert len(frames) == 2 and fps == 0.0


def test_dc_decode_pair_sets_match_full_decode():
    """The pinned equivalence behind the DC-only thumbnail-decode path
    (VERDICT r05 task #3): on the registry's video corpus shape (80x64
    frames — large enough that the 1/8-scale DC image covers the 8x9 dHash
    grid), per-frame hashes from ``decode_jpeg_dc`` and from the full
    ``decode_jpeg`` produce IDENTICAL verified near-dup pair sets at the
    registered thresholds (max_hamming=10, min_matching_frames=3, banded
    candidate keying). Driver-side replica of q_video_near_dup's join — no
    Spark session needed."""
    from collections import defaultdict

    from covid19_spark.operators.jpeg import decode_jpeg, decode_jpeg_dc
    from covid19_spark.operators.multimodal import (
        _sampled_avi_frames,
        dhash_pixels,
        encode_mjpeg_avi,
    )

    vids = {}
    for d in range(40):  # subset of the registry corpus, all planted dups
        rng = np.random.default_rng(d + 9_000_000)
        n_frames = 4 + d % 3
        base = rng.integers(0, 256, size=(8, 10, 3), dtype=np.uint8)
        frames = [
            np.repeat(np.repeat(np.roll(base, i, axis=1), 8, axis=0), 8, axis=1)
            for i in range(n_frames)
        ]
        vids[d] = encode_mjpeg_avi(frames, fps=4, quality=88)
        vids[100000 + d] = encode_mjpeg_avi(frames, fps=4, quality=70)

    def pair_set(decoder):
        by_rank = defaultdict(list)
        for mid, avi in vids.items():
            for rank, (_ts, _idx, j) in enumerate(_sampled_avi_frames(avi, 500)):
                by_rank[rank].append((mid, dhash_pixels(decoder(j))))
        agg = defaultdict(int)
        for lst in by_rank.values():
            for i in range(len(lst)):
                for j in range(i + 1, len(lst)):
                    (ida, ha), (idb, hb) = sorted((lst[i], lst[j]))
                    ham = bin((ha ^ hb) & (2**64 - 1)).count("1")
                    shares_band = any(
                        ((ha >> s) & 0xFFFF) == ((hb >> s) & 0xFFFF)
                        for s in (0, 16, 32, 48)
                    )
                    if ham <= 10 and shares_band:
                        agg[(ida, idb)] += 1
        return {k for k, n in agg.items() if n >= 3}

    full_pairs = pair_set(decode_jpeg)
    dc_pairs = pair_set(decode_jpeg_dc)
    assert full_pairs == dc_pairs
    # and the planted near-dups are actually recalled, not vacuously equal
    assert {(d, 100000 + d) for d in range(40)} <= dc_pairs


def test_small_frame_videos_fall_back_to_full_decode(spark):
    """Below 64x72 the DC image undersamples the dHash grid (measured:
    planted recall 20/40) — video_frame_hashes must use the full decode
    there. Pinned by equality with a hand-built full-decode hash."""
    from covid19_spark.operators.jpeg import decode_jpeg
    from covid19_spark.operators.multimodal import (
        _sampled_avi_frames,
        dhash_pixels,
        encode_mjpeg_avi,
        video_frame_hashes,
    )

    frames = _mk_frames(3, 24, 32)
    avi = encode_mjpeg_avi(frames, fps=4, quality=85)
    media = spark.createDataFrame(
        [(1, "video", "video/avi", 32, 24, 750, bytearray(avi))],
        "media_id long, kind string, mime string, width int, height int, "
        "duration_ms long, payload binary",
    )
    got = {
        (r.media_id, r.frame_rank): r.dhash
        for r in video_frame_hashes(media, every_ms=500).collect()
    }
    expected = {
        (1, rank): dhash_pixels(decode_jpeg(j))
        for rank, (_ts, _idx, j) in enumerate(_sampled_avi_frames(avi, 500))
    }
    assert got == expected


def test_g711_wav_decode_roundtrip_and_anchors():
    """G.711 A-law/mu-law WAV decode (formats 6/7 — previously a
    NotImplementedError seam): spec anchor values, round-trip through the
    companding encoder within the 8-bit companding error bound, and the
    full container path (encode_wav_g711 -> decode_wav)."""
    from covid19_spark.operators.multimodal import (
        _ALAW_TABLE,
        _MULAW_TABLE,
        decode_wav,
        encode_wav_g711,
        g711_encode,
    )

    # spec anchors: mu-law code 0xFF decodes to 0; 0x7F is the most negative
    # step of the same magnitude bucket; A-law code 0x55 decodes to -8/32768
    assert _MULAW_TABLE[0xFF] == 0.0
    assert _MULAW_TABLE[0x7F] == 0.0
    assert _ALAW_TABLE[0x55] * 32768.0 == -8.0
    assert _ALAW_TABLE[0xD5] * 32768.0 == 8.0
    # monotone decode within each sign: positive mu-law codes descend from
    # 0x80 (max magnitude) to 0xFF (zero)
    assert _MULAW_TABLE[0x80] == max(_MULAW_TABLE)

    t = np.arange(4000, dtype=np.float32)
    sig = (0.7 * np.sin(2 * np.pi * 440 * t / 8000)).astype(np.float32)
    for law, tol in (("mulaw", 0.002), ("alaw", 0.002)):
        codes = np.frombuffer(g711_encode(sig, law), np.uint8)
        table = _MULAW_TABLE if law == "mulaw" else _ALAW_TABLE
        # companding error bound: half the largest step around |x|<=0.7
        assert np.abs(table[codes] - sig).max() < 0.02
        # small-signal region is much tighter (logarithmic step sizes)
        quiet = 0.01 * np.sin(2 * np.pi * 200 * t / 8000).astype(np.float32)
        qcodes = np.frombuffer(g711_encode(quiet, law), np.uint8)
        assert np.abs(table[qcodes] - quiet).max() < tol

        wav = encode_wav_g711(sig, law=law, sample_rate=8000)
        decoded, rate = decode_wav(wav)
        assert rate == 8000 and decoded.shape == (4000, 1)
        assert np.abs(decoded[:, 0] - sig).max() < 0.02


def test_g711_wav_feeds_audio_features(spark):
    """A format-7 (mu-law) WAV flows through the real-decode feature
    extractor like any PCM file — the seam is genuinely closed Spark-side."""
    from covid19_spark.operators.multimodal import (
        encode_wav_g711,
        extract_audio_features,
    )

    t = np.arange(8000, dtype=np.float32)
    sig = (0.5 * np.sin(2 * np.pi * 330 * t / 8000)).astype(np.float32)
    media = spark.createDataFrame(
        [(1, "audio", "audio/wav", None, None, 1000,
          bytearray(encode_wav_g711(sig, "mulaw")))],
        "media_id long, kind string, mime string, width int, height int, "
        "duration_ms long, payload binary",
    )
    rows = extract_audio_features(media, use_fake=False).collect()
    assert len(rows) == 1
    feats = rows[0]["feature"]
    assert len(feats) == 16 and max(feats) == 1.0  # peak-normalized RMS


def test_ima_adpcm_wav_roundtrip(spark):
    """IMA/DVI ADPCM WAV (format 0x11 — previously a NotImplementedError
    seam): encode→decode round-trips a smooth signal within the 4-bit
    step-adaptive error bound, block headers resync exactly (sample 0 of
    every block is verbatim), and the payload feeds the real-decode
    feature extractor."""
    from covid19_spark.operators.multimodal import (
        decode_wav,
        encode_wav_ima_adpcm,
        extract_audio_features,
    )

    t = np.arange(4040, dtype=np.float32)
    sig16 = (12000 * np.sin(2 * np.pi * 440 * t / 8000)).astype(np.int16)
    wav = encode_wav_ima_adpcm(sig16, sample_rate=8000, block_samples=505)
    decoded, rate = decode_wav(wav)
    assert rate == 8000 and decoded.shape[1] == 1
    got = decoded[: len(sig16), 0] * 32768.0
    # block-header resync: sample 0 of each block is stored verbatim
    for b in range(0, len(sig16), 505):
        assert got[b] == float(sig16[b])
    # step-adaptive tracking: after the first block's attack the decoder
    # follows the waveform closely (bound = a few steps at this amplitude)
    err = np.abs(got[505:] - sig16[505 : len(got)].astype(np.float64))
    assert err.max() < 1500, err.max()
    assert np.sqrt((err**2).mean()) < 300

    media = spark.createDataFrame(
        [(1, "audio", "audio/wav", None, None, 505, bytearray(wav))],
        "media_id long, kind string, mime string, width int, height int, "
        "duration_ms long, payload binary",
    )
    rows = extract_audio_features(media, use_fake=False).collect()
    assert len(rows) == 1 and len(rows[0]["feature"]) == 16


def test_ima_adpcm_partial_block_roundtrips_exact_length():
    """r06 ADVICE: a signal whose length is not a multiple of block_samples
    must round-trip to EXACTLY its own length — the encoder writes a 'fact'
    chunk with the true sample count and decode_wav trims the final block's
    zero-nibble padding to it (a 100-sample input used to come back as 505
    samples)."""
    from covid19_spark.operators.multimodal import decode_wav, encode_wav_ima_adpcm

    sig16 = (1000 * np.sin(np.arange(100) / 5.0)).astype(np.int16)
    wav = encode_wav_ima_adpcm(sig16, sample_rate=8000, block_samples=505)
    assert b"fact" in wav
    decoded, rate = decode_wav(wav)
    assert decoded.shape == (100, 1)
    # trimming must not disturb the decoded values themselves
    got = decoded[:, 0] * 32768.0
    assert got[0] == float(sig16[0])
    assert np.abs(got - sig16.astype(np.float64)).max() < 1500


def test_image_dhash_uses_one_resolution_path_across_formats(spark):
    """Cross-format consistency contract: a BMP and a JPEG of the SAME
    pixels must hash within re-encode distance of each other — which
    forbids routing large JPEGs through the DC thumbnail decode (hashing
    one copy at 1/8 scale and its twin at full resolution measured
    Hamming 19 on identical content). Video frames may ride the DC path
    because they only compare against frames decoded the same way."""
    from covid19_spark.operators.jpeg import decode_jpeg, encode_jpeg
    from covid19_spark.operators.multimodal import (
        dhash_pixels,
        encode_bmp,
        image_dhash,
    )

    rng = np.random.default_rng(21)
    big = np.repeat(np.repeat(rng.integers(0, 256, (8, 10, 3), dtype=np.uint8), 8, 0), 8, 1)
    rows = [
        (1, "image", "image/jpeg", 80, 64, None, bytearray(encode_jpeg(big, quality=85))),
        (3, "image", "image/bmp", 80, 64, None, bytearray(encode_bmp(big))),
    ]
    media = spark.createDataFrame(
        rows,
        "media_id long, kind string, mime string, width int, height int, "
        "duration_ms long, payload binary",
    )
    got = {r.media_id: r.dhash for r in image_dhash(media, use_fake=False).collect()}
    assert got[1] == dhash_pixels(decode_jpeg(bytes(rows[0][6])))
    ham = bin((got[1] ^ got[3]) & (2**64 - 1)).count("1")
    assert ham <= 4, ham


def test_image_features_precision_aware():
    """A 12-bit decode (uint16) and its 8-bit counterpart of the same scene
    must produce (nearly) the same feature vector — the [0, 1] contract
    holds at any sample depth; the uint8 path stays bit-identical."""
    from covid19_spark.operators.multimodal import image_features_from_pixels

    rng = np.random.default_rng(17)
    img8 = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
    img12 = (img8.astype(np.uint16) * 16 + 8)  # same scene at 12-bit depth
    f8 = image_features_from_pixels(img8)
    f12 = image_features_from_pixels(img12.astype(np.uint16), peak=4095.0)
    # means agree to the requantization step; histograms to bucket jitter
    assert np.abs(f8[:3] - f12[:3]).max() < 0.02
    assert np.abs(f8 - f12).max() < 0.2
    # pure uint8 path unchanged (bit-identical to the pre-change formula)
    arr = img8.astype(np.float32)
    means = arr.reshape(-1, 3).mean(axis=0) / 255.0
    gray = arr.mean(axis=2).astype(np.uint8).reshape(-1)
    hist = np.histogram(gray, bins=5, range=(0, 256))[0]
    feat = np.concatenate([means, hist.astype(np.float32)])
    feat = feat / np.linalg.norm(feat)
    assert np.array_equal(f8, feat.astype(np.float32))


# --- GIF codec ---------------------------------------------------------------


def test_gif_roundtrip_exact_and_width_boundaries():
    """encode_gif/decode_gif are pure-stdlib LZW; round-trips must be exact
    across palette sizes, including a 256-color image large enough to walk
    the code width 9->12 and force a table reset."""
    from covid19_spark.operators.multimodal import decode_gif, encode_gif

    rng = np.random.default_rng(3)
    pal = np.unique(rng.integers(0, 256, (300, 3), dtype=np.uint8), axis=0)[:256]
    big = pal[rng.integers(0, len(pal), (120, 150))]
    assert np.array_equal(decode_gif(encode_gif(big)), big)
    for ncol in (2, 3, 5, 17, 64):
        cols = np.unique(rng.integers(0, 256, (ncol * 2, 3), dtype=np.uint8), axis=0)[:ncol]
        im = cols[rng.integers(0, len(cols), (31, 17))]
        assert np.array_equal(decode_gif(encode_gif(im)), im), ncol
    solid = np.full((20, 20, 3), 77, dtype=np.uint8)  # KwKwK chains
    assert np.array_equal(decode_gif(encode_gif(solid)), solid)
    with pytest.raises(ValueError, match="256"):
        encode_gif(rng.integers(0, 256, (40, 40, 3), dtype=np.uint8))


def test_gif_minimal_external_anchor():
    """The canonical hand-assembled 1x1 black-pixel GIF (the 'smallest GIF'
    byte sequence circulated with the GIF89a spec) must decode — an
    EXTERNAL conformance vector, not a round-trip of our own encoder."""
    from covid19_spark.operators.multimodal import decode_gif, decode_image

    mini = bytes(
        [0x47, 0x49, 0x46, 0x38, 0x39, 0x61, 1, 0, 1, 0, 0x80, 0, 0,
         0, 0, 0, 255, 255, 255,
         0x2C, 0, 0, 0, 0, 1, 0, 1, 0, 0x00,
         0x02, 0x02, 0x44, 0x01, 0x00, 0x3B]
    )
    out = decode_gif(mini)
    assert out.shape == (1, 1, 3) and out[0, 0].tolist() == [0, 0, 0]
    assert np.array_equal(decode_image(mini), out)  # dispatch covers GIF


def test_gif_interlaced_decode():
    """Interlace flag: rows stored in the 4-pass order must come back in
    logical order — built by encoding the pass-permuted image and flipping
    the descriptor's interlace bit."""
    from covid19_spark.operators.multimodal import decode_gif, encode_gif

    rng = np.random.default_rng(5)
    cols = np.unique(rng.integers(0, 256, (20, 3), dtype=np.uint8), axis=0)
    img = cols[rng.integers(0, len(cols), (13, 9))]
    order = np.concatenate([
        np.arange(0, 13, 8), np.arange(4, 13, 8),
        np.arange(2, 13, 4), np.arange(1, 13, 2),
    ])
    permuted = img[order]  # rows as an interlaced file stores them
    payload = bytearray(encode_gif(permuted))
    i = payload.index(0x2C)
    payload[i + 9] |= 0x40  # set interlace in the image descriptor
    assert np.array_equal(decode_gif(bytes(payload)), img)


def test_gif_animation_frames_and_transparency():
    """Multi-frame GIFs yield composited frames with delays; a transparent
    index leaves the underlying canvas visible (draw-over compositing)."""
    from covid19_spark.operators.multimodal import decode_gif_frames, encode_gif

    rng = np.random.default_rng(7)
    cols = np.unique(rng.integers(0, 256, (40, 3), dtype=np.uint8), axis=0)
    frames = [cols[rng.integers(0, len(cols), (24, 30))] for _ in range(3)]
    got = list(decode_gif_frames(encode_gif(frames, delays_ms=[100, 50, 200])))
    assert [d for d, _ in got] == [100, 50, 200]
    for (_, f), want in zip(got, frames):
        assert np.array_equal(f, want)

    # transparency: hand-mark palette index of frame 2's top-left color as
    # transparent in its graphic control; that pixel must show frame 1
    two = encode_gif([frames[0], frames[1]], delays_ms=[10, 10])
    buf = bytearray(two)
    # second graphic-control ext: find the 2nd occurrence of 21 F9 04
    first = buf.find(b"\x21\xf9\x04")
    second = buf.find(b"\x21\xf9\x04", first + 1)
    # transparent color flag + index of the frame-2 top-left pixel's color
    pal_start = 13
    depth_n = 2 << (buf[10] & 0x07)
    pal = np.frombuffer(bytes(buf[pal_start:pal_start + 3 * depth_n]), np.uint8).reshape(-1, 3)
    tl = frames[1][0, 0]
    t_idx = int(np.where((pal == tl).all(axis=1))[0][0])
    buf[second + 3] |= 0x01
    buf[second + 6] = t_idx
    composited = list(decode_gif_frames(bytes(buf)))[1][1]
    mask = (frames[1] == tl).all(axis=2)
    assert np.array_equal(composited[mask], frames[0][mask])
    assert np.array_equal(composited[~mask], frames[1][~mask])


def test_gif_disposal_applies_to_own_frame():
    """GIF89a §23: a GCE's disposal method says how its OWN image is
    disposed after display. Hand-built repro: frame 1 (full-screen red,
    disposal=2 restore-to-background) then frame 2 (1x1 green sub-rect,
    disposal=0). Before frame 2 draws, frame 1's rect must be cleared to
    the background color — the old code applied frame 2's GCE disposal (0)
    to frame 1's rect and left red everywhere."""
    import struct

    from covid19_spark.operators.multimodal import (
        _gif_lzw_encode,
        decode_gif_frames,
    )

    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", 4, 4)
    out += bytes([0x80 | 1, 0, 0])  # 4-entry GCT, background index 0
    out += bytes([0, 0, 0, 255, 0, 0, 0, 255, 0, 0, 0, 0])  # black,red,green,pad

    def gce(disposal):
        return bytes([0x21, 0xF9, 4, (disposal & 7) << 2, 0, 0, 0, 0])

    def img(ix, iy, iw, ih, idx_val):
        b = bytes([0x2C]) + struct.pack("<HHHH", ix, iy, iw, ih) + bytes([0])
        idx = np.full(iw * ih, idx_val, dtype=np.uint16)
        b += bytes([2])
        lzw = _gif_lzw_encode(idx, 2)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            b += bytes([len(chunk)]) + chunk
        return b + b"\x00"

    out += gce(2) + img(0, 0, 4, 4, 1)  # frame 1: full red, dispose-to-bg
    out += gce(0) + img(0, 0, 1, 1, 2)  # frame 2: 1x1 green, keep
    out += b"\x3b"
    frames = [f for _, f in decode_gif_frames(bytes(out))]
    assert len(frames) == 2
    assert np.array_equal(frames[0], np.tile(np.array([255, 0, 0], np.uint8), (4, 4, 1)))
    want = np.zeros((4, 4, 3), np.uint8)
    want[0, 0] = [0, 255, 0]
    assert np.array_equal(frames[1], want)

    # and the converse: disposal=0 on frame 1 must NOT clear it, even when
    # a later GCE carries disposal=2 (which disposes frame 2, not frame 1)
    out2 = bytearray(b"GIF89a")
    out2 += struct.pack("<HH", 4, 4)
    out2 += bytes([0x80 | 1, 0, 0])
    out2 += bytes([0, 0, 0, 255, 0, 0, 0, 255, 0, 0, 0, 0])
    out2 += gce(0) + img(0, 0, 4, 4, 1)
    out2 += gce(2) + img(0, 0, 1, 1, 2)
    out2 += b"\x3b"
    frames2 = [f for _, f in decode_gif_frames(bytes(out2))]
    want2 = np.tile(np.array([255, 0, 0], np.uint8), (4, 4, 1))
    want2[0, 0] = [0, 255, 0]
    assert np.array_equal(frames2[1], want2)


def test_gif_rejects_corrupt():
    from covid19_spark.operators.multimodal import decode_gif, encode_gif

    img = np.full((4, 4, 3), 10, dtype=np.uint8)
    good = encode_gif(img)
    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"GIF00a" + good[6:])
    with pytest.raises(ValueError):
        decode_gif(good[: len(good) // 2])  # truncated
    bad = bytearray(good)
    bad[-2] = 0x77  # clobber the final data sub-block terminator chain
    with pytest.raises(ValueError):
        decode_gif(bytes(bad))


def test_wav_depth_variants_decode_bit_identically():
    """encode_wav's i24/i32/f32/f64 containers of an int16 signal decode to
    the EXACT same normalized float stream as the i16 original: x<<8 over
    2^23, x<<16 over 2^31, and x/32768 in IEEE float are all exactly
    x/32768 in float32."""
    from covid19_spark.operators.multimodal import decode_wav, encode_wav

    rng = np.random.default_rng(1)
    sig = (
        12000 * np.sin(2 * np.pi * 440 * np.arange(2000) / 8000)
        + rng.integers(-500, 500, 2000)
    ).astype(np.int16)
    base, rate = decode_wav(encode_wav(sig, 8000, dtype="i16"))
    assert rate == 8000
    for dt in ("i24", "i32", "f32", "f64"):
        got, _ = decode_wav(encode_wav(sig, 8000, dtype=dt))
        assert np.array_equal(got, base), dt
    # stereo survives every depth too
    st = np.stack([sig[:100], -sig[:100]], axis=1)
    for dt in ("i16", "i24", "i32", "f32", "f64"):
        got, _ = decode_wav(encode_wav(st, 8000, dtype=dt))
        assert got.shape == (100, 2), dt
    with pytest.raises(ValueError, match="dtype"):
        encode_wav(sig, 8000, dtype="i8")


def test_ms_adpcm_full_range_input_encodes():
    """A full-swing alternating ±32767 square wave makes the mean
    |prediction error| exceed int16 range; the delta0 header field must be
    clamped to 32767 so the encode succeeds (advisor finding: struct.error
    instead of a WAV). The decode must still return the right shape with
    seeds verbatim."""
    from covid19_spark.operators.multimodal import decode_wav, encode_wav_ms_adpcm

    sig = np.tile(np.array([32767, -32768], dtype=np.int16), 500)
    wav = encode_wav_ms_adpcm(sig, sample_rate=8000, block_samples=500)
    decoded, rate = decode_wav(wav)
    assert rate == 8000 and decoded.shape == (1000, 1)
    got = decoded[:, 0] * 32768.0
    assert got[0] == float(sig[0]) and got[1] == float(sig[1])


def test_image_features_12bit_jpeg_peak_aware():
    """extract_image_features' real-decode path must normalize a 12-bit
    JPEG by its true peak (4095), not the uint16 dtype max: the features
    of a 12-bit encode and an 8-bit encode of the SAME content must be
    close (advisor finding: mean-RGB shrank ~16x and the gray histogram
    collapsed)."""
    from covid19_spark.operators.jpeg import encode_jpeg
    from covid19_spark.operators.multimodal import (
        decode_image_with_peak,
        image_features_from_pixels,
    )

    rng = np.random.default_rng(3)
    img8 = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    img12 = (img8.astype(np.uint16) << 4) | (img8.astype(np.uint16) >> 4)

    px8, peak8 = decode_image_with_peak(encode_jpeg(img8, quality=95))
    px12, peak12 = decode_image_with_peak(encode_jpeg(img12, quality=95, precision=12))
    assert peak8 == 255.0 and peak12 == 4095.0
    f8 = image_features_from_pixels(px8, peak=peak8)
    f12 = image_features_from_pixels(px12, peak=peak12)
    # same content, same normalization contract → nearly identical features
    assert float(np.dot(f8, f12)) > 0.999, (f8, f12)
    # regression guard: normalizing the 12-bit decode by the dtype max
    # produces the collapsed feature the advisor measured
    bad = image_features_from_pixels(px12)  # dtype-max fallback = 65535
    assert float(np.dot(f8, bad)) < 0.999


def test_ms_adpcm_wav_roundtrip(spark):
    """Microsoft ADPCM WAV (format 0x02 — previously behind the codec
    seam): encode→decode tracks a smooth signal (SNR > 30 dB for 4-bit
    step-adaptive coding), block seed samples are verbatim, the fmt
    extension's own coefficient table is honored, the fact chunk trims
    partial final blocks, and the payload feeds the real-decode feature
    extractor distributed."""
    import math

    from covid19_spark.operators.multimodal import (
        decode_wav,
        encode_wav_ms_adpcm,
        extract_audio_features,
    )

    t = np.arange(4000, dtype=np.float32)
    sig16 = (12000 * np.sin(2 * np.pi * 440 * t / 8000)).astype(np.int16)
    wav = encode_wav_ms_adpcm(sig16, sample_rate=8000, block_samples=500)
    decoded, rate = decode_wav(wav)
    assert rate == 8000 and decoded.shape == (4000, 1)
    got = decoded[:, 0] * 32768.0
    for b in range(0, 4000, 500):  # per-block seeds are stored verbatim
        assert got[b] == float(sig16[b]) and got[b + 1] == float(sig16[b + 1])
    err = got - sig16.astype(np.float64)
    snr = 10 * math.log10((sig16.astype(np.float64) ** 2).mean() / (err ** 2).mean())
    assert snr > 30, snr

    short = decode_wav(encode_wav_ms_adpcm(sig16[:123], block_samples=500))[0]
    assert short.shape == (123, 1)  # fact-chunk trim

    media = spark.createDataFrame(
        [(1, "audio", "audio/wav", None, None, 500, bytearray(wav))],
        "media_id long, kind string, mime string, width int, height int, "
        "duration_ms long, payload binary",
    )
    rows = extract_audio_features(media, use_fake=False).collect()
    assert len(rows) == 1 and len(rows[0]["feature"]) == 16


# --- TIFF codec ----------------------------------------------------------------


def test_tiff_roundtrip_all_compressions():
    """Baseline TIFF strips round-trip exactly under none/PackBits/LZW,
    RGB and grayscale, across strip boundaries and LZW width growth."""
    from covid19_spark.operators.multimodal import decode_tiff, encode_tiff

    rng = np.random.default_rng(1)
    for comp in ("none", "packbits", "lzw"):
        for shape in [(5, 7, 3), (16, 9, 3), (1, 1, 3), (40, 33, 3)]:
            img = rng.integers(0, 256, shape, dtype=np.uint8)
            assert np.array_equal(
                decode_tiff(encode_tiff(img, compression=comp)), img
            ), (comp, shape)
        gray = rng.integers(0, 256, (11, 6), dtype=np.uint8)
        out = decode_tiff(encode_tiff(gray, compression=comp))
        assert np.array_equal(out[:, :, 0], gray)
    big = rng.integers(0, 256, (80, 90, 3), dtype=np.uint8)  # LZW 9->12 bits
    assert np.array_equal(
        decode_tiff(encode_tiff(big, compression="lzw", rows_per_strip=40)), big
    )
    flat = np.zeros((32, 32, 3), dtype=np.uint8)
    from covid19_spark.operators.multimodal import encode_tiff as et
    assert len(et(flat, compression="packbits")) < len(et(flat, compression="none"))
    assert len(et(flat, compression="lzw")) < len(et(flat, compression="none"))


def test_tiff_big_endian_predictor_and_rejects():
    """Big-endian (MM) files decode; predictor 2 undoes horizontal
    differencing; unsupported profiles fall to the documented seam and
    corrupt structures raise ValueError."""
    import struct

    from covid19_spark.operators.multimodal import decode_image, decode_tiff, encode_tiff

    rng = np.random.default_rng(2)

    def hand_tiff(img, endian, extra_tags=()):
        e = "<" if endian == "II" else ">"
        h, w = img.shape[:2]
        raw = img.tobytes()
        tags = [(256, 3, [w]), (257, 3, [h]), (258, 3, [8, 8, 8]), (259, 3, [1]),
                (262, 3, [2]), (273, 4, None), (277, 3, [3]), (278, 3, [h]),
                (279, 4, [len(raw)])] + list(extra_tags)
        tags.sort(key=lambda x: x[0])
        n = len(tags)
        data_off = 8 + 2 + 12 * n + 4
        extra = b""
        ents = []
        for tag, typ, vals in tags:
            if tag == 273:
                vals = [data_off + 6]  # strip follows the 6-byte bits array
            fmt = {3: "H", 4: "I"}[typ]
            sz = {3: 2, 4: 4}[typ] * len(vals)
            body = struct.pack(e + str(len(vals)) + fmt, *vals)
            if sz <= 4:
                ents.append(struct.pack(e + "HHI", tag, typ, len(vals)) + body.ljust(4, b"\x00"))
            else:
                ents.append(struct.pack(e + "HHII", tag, typ, len(vals), data_off + len(extra)))
                extra += body
        magic = b"II*\x00" if endian == "II" else b"MM\x00*"
        return (magic + struct.pack(e + "I", 8) + struct.pack(e + "H", n)
                + b"".join(ents) + struct.pack(e + "I", 0) + extra + raw)

    img = rng.integers(0, 256, (4, 5, 3), dtype=np.uint8)
    assert np.array_equal(decode_tiff(hand_tiff(img, "MM")), img)
    assert np.array_equal(decode_image(hand_tiff(img, "II")), img)  # dispatch

    # predictor 2: store horizontal differences, decoder must cumsum back
    diffs = img.astype(np.int64).copy()
    diffs[:, 1:] = np.diff(img.astype(np.int64), axis=1)
    stored = (diffs % 256).astype(np.uint8)
    pred_file = hand_tiff(stored, "II", extra_tags=[(317, 3, [2])])
    assert np.array_equal(decode_tiff(pred_file), img)

    with pytest.raises(NotImplementedError, match="compression"):
        decode_tiff(hand_tiff(img, "II", extra_tags=[(259, 3, [9])]))  # JBIG
    # compressions 6 and 7 are REAL now (round 8) — but an RGB-photometric
    # (photo 2) JPEG-in-TIFF hits the ADVICE-r08 interop guard before any
    # chunk is touched (decode_jpeg would mis-color an RGB-stored scan)
    with pytest.raises(NotImplementedError, match="RGB-photometric"):
        decode_tiff(hand_tiff(img, "II", extra_tags=[(259, 3, [7])]))
    with pytest.raises(ValueError):
        decode_tiff(hand_tiff(img, "II")[:40])  # truncated IFD/strip
    with pytest.raises(ValueError, match="not a TIFF"):
        decode_tiff(b"II+\x00\x00\x00\x00\x00")


def test_permissive_decode_image_features(spark):
    """on_error='permissive': corrupt/unsupported blobs yield NULL feature +
    classified error instead of a task failure; default 'fail' mode is
    unchanged (same schema, raises on the same corpus)."""
    import pandas as pd
    import pytest

    from covid19_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        encode_bmp,
        encode_png,
        extract_image_features,
    )

    rng = np.random.default_rng(5)
    good_bmp = encode_bmp(rng.integers(0, 256, size=(4, 5, 3), dtype=np.uint8))
    good_png = encode_png(rng.integers(0, 256, size=(3, 3, 3), dtype=np.uint8))
    rows = [
        (0, "image", "image/bmp", 5, 4, None, good_bmp),
        (1, "image", "image/png", 3, 3, None, good_png),
        (2, "image", "image/png", 3, 3, None, good_png[:20]),      # truncated
        (3, "image", "application/x-junk", None, None, None, b"\x00garbage"),
        (4, "image", "image/bmp", None, None, None, None),          # null payload
    ]
    media = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)

    out = extract_image_features(media, use_fake=False, on_error="permissive")
    assert "error" in out.columns
    got = {r.media_id: r for r in out.collect()}
    assert len(got) == 5
    assert got[0].error is None and len(got[0].feature) == 8
    assert got[1].error is None and len(got[1].feature) == 8
    assert got[2].feature is None and got[2].error.startswith("corrupt:")
    assert got[3].feature is None and got[3].error.startswith("unsupported:")
    assert got[4].feature is None and got[4].error.startswith("unsupported:")

    # default mode: schema has NO error column, and the bad corpus raises
    strict = extract_image_features(media, use_fake=False)
    assert "error" not in strict.columns
    with pytest.raises(Exception, match="corrupt|PNG|unpack"):
        strict.collect()
    with pytest.raises(ValueError, match="on_error"):
        extract_image_features(media, on_error="ignore")


def test_permissive_decode_audio_and_video(spark):
    import pandas as pd

    from covid19_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        encode_mjpeg_avi,
        encode_wav,
        extract_audio_features,
        extract_video_frames,
    )

    rng = np.random.default_rng(6)
    tone = (1000 * np.sin(np.arange(800) / 5.0)).astype(np.int16)
    wav = encode_wav(tone, 8000)
    frames = [
        rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8) for _ in range(3)
    ]
    avi = encode_mjpeg_avi(frames, fps=10)
    cols = [f.name for f in MEDIA_SCHEMA.fields]
    audio = spark.createDataFrame(
        [
            (0, "audio", "audio/wav", None, None, 100, wav),
            (1, "audio", "audio/wav", None, None, 100, wav[:10]),
        ],
        schema=MEDIA_SCHEMA,
    )
    a = {
        r.media_id: r
        for r in extract_audio_features(
            audio, use_fake=False, on_error="permissive"
        ).collect()
    }
    assert a[0].error is None and len(a[0].feature) == 16
    assert a[1].feature is None and a[1].error.startswith("corrupt:")

    video = spark.createDataFrame(
        [
            (0, "video", "video/avi", 16, 16, 300, avi),
            (1, "video", "video/avi", 16, 16, 300, b"RIFFbroken"),
        ],
        schema=MEDIA_SCHEMA,
    )
    v = extract_video_frames(
        video, every_ms=100, use_fake=False, on_error="permissive"
    ).collect()
    ok = [r for r in v if r.media_id == 0]
    bad = [r for r in v if r.media_id == 1]
    assert len(ok) >= 3 and all(r.error is None for r in ok)
    assert len(bad) == 1 and bad[0].feature is None
    assert bad[0].frame_ts_ms is None and bad[0].error.startswith("corrupt:")


def test_permissive_hash_kernels_and_near_dup_filter(spark):
    """Permissive hash kernels emit NULL hashes for bad blobs; the near-dup
    probes exclude NULLs from banding (no spurious bucket in the dropped
    report) while good pairs still match."""
    import pandas as pd

    from covid19_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        audio_fingerprints,
        audio_near_dup_pairs,
        encode_bmp,
        encode_wav,
        image_dhash,
        image_near_dup_pairs,
        video_frame_hashes,
        video_near_dup_pairs,
        encode_mjpeg_avi,
    )

    rng = np.random.default_rng(7)
    cols = [f.name for f in MEDIA_SCHEMA.fields]
    base = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    near = base.copy()
    near[0, 0] = 255 - near[0, 0]
    imgs = spark.createDataFrame(
        [
            (0, "image", "image/bmp", 32, 32, None, encode_bmp(base)),
            (1, "image", "image/bmp", 32, 32, None, encode_bmp(near)),
            (2, "image", "image/bmp", 32, 32, None, b"BMbroken"),
        ],
        schema=MEDIA_SCHEMA,
    )
    hashes = image_dhash(imgs, use_fake=False, on_error="permissive")
    hrows = {r.media_id: r.dhash for r in hashes.collect()}
    assert hrows[2] is None and hrows[0] is not None
    report = []
    pairs = image_near_dup_pairs(
        hashes, max_bucket=10, dropped_report=report
    ).collect()
    assert {(r.doc_a, r.doc_b) for r in pairs} == {(0, 1)}
    # the NULL hash never formed a bucket: report frame exists but is empty
    assert all(rf.count() == 0 for rf in report)

    tone = (3000 * np.sin(np.arange(4000) / 3.0)).astype(np.int16)
    auds = spark.createDataFrame(
        [
            (0, "audio", "audio/wav", None, None, 500, encode_wav(tone, 8000)),
            (1, "audio", "audio/wav", None, None, 500,
             encode_wav((tone * 0.5).astype(np.int16), 8000)),
            (2, "audio", "audio/wav", None, None, 500, b"RIFFnope"),
        ],
        schema=MEDIA_SCHEMA,
    )
    fps = audio_fingerprints(auds, use_fake=False, on_error="permissive")
    assert {r.media_id: r.afp for r in fps.collect()}[2] is None
    apairs = audio_near_dup_pairs(fps).collect()
    assert {(r.doc_a, r.doc_b) for r in apairs} == {(0, 1)}

    frames = [
        rng.integers(0, 256, size=(80, 80, 3), dtype=np.uint8) for _ in range(4)
    ]
    avi = encode_mjpeg_avi(frames, fps=10)
    vids = spark.createDataFrame(
        [
            (0, "video", "video/avi", 80, 80, 400, avi),
            (1, "video", "video/avi", 80, 80, 400, avi),
            (2, "video", "video/avi", 80, 80, 400, avi[:30]),
        ],
        schema=MEDIA_SCHEMA,
    )
    vh = video_frame_hashes(vids, every_ms=100, on_error="permissive")
    vrows = vh.collect()
    assert any(r.media_id == 2 and r.dhash is None for r in vrows)
    vpairs = video_near_dup_pairs(vh).collect()
    assert {(r.doc_a, r.doc_b) for r in vpairs} == {(0, 1)}


def test_tiff_16bit_and_planar():
    """16-bit samples (both byte orders, predictor 2) and planar
    configuration 2 decode; 16-bit output keeps full precision (uint16)."""
    import struct

    from covid19_spark.operators.multimodal import decode_tiff, encode_tiff

    rng = np.random.default_rng(3)
    img16 = rng.integers(0, 65536, (7, 6, 3), dtype=np.uint16)
    for comp in ("none", "packbits", "lzw"):
        for planar in (1, 2):
            got = decode_tiff(
                encode_tiff(img16, compression=comp, planar=planar, rows_per_strip=3)
            )
            assert got.dtype == np.uint16
            assert np.array_equal(got, img16), (comp, planar)
    # 8-bit planar round-trip
    img8 = rng.integers(0, 256, (5, 4, 3), dtype=np.uint8)
    assert np.array_equal(
        decode_tiff(encode_tiff(img8, compression="lzw", planar=2)), img8
    )
    # 16-bit grayscale replicates to RGB at full depth
    g16 = rng.integers(0, 65536, (4, 9), dtype=np.uint16)
    assert np.array_equal(
        decode_tiff(encode_tiff(g16, compression="packbits")),
        np.repeat(g16[:, :, None], 3, axis=2),
    )

    # hand-built big-endian 16-bit file: sample bytes must honor MM order
    def hand_tiff16(img, endian, extra_tags=()):
        e = "<" if endian == "II" else ">"
        h, w = img.shape[:2]
        raw = img.astype(e + "u2").tobytes()
        tags = [(256, 3, [w]), (257, 3, [h]), (258, 3, [16, 16, 16]),
                (259, 3, [1]), (262, 3, [2]), (273, 4, None), (277, 3, [3]),
                (278, 3, [h]), (279, 4, [len(raw)])] + list(extra_tags)
        tags.sort(key=lambda x: x[0])
        n = len(tags)
        data_off = 8 + 2 + 12 * n + 4
        extra = b""
        ents = []
        for tag, typ, vals in tags:
            if tag == 273:
                vals = [data_off + 6]
            fmt = {3: "H", 4: "I"}[typ]
            sz = {3: 2, 4: 4}[typ] * len(vals)
            body = struct.pack(e + str(len(vals)) + fmt, *vals)
            if sz <= 4:
                ents.append(
                    struct.pack(e + "HHI", tag, typ, len(vals)) + body.ljust(4, b"\x00")
                )
            else:
                ents.append(
                    struct.pack(e + "HHII", tag, typ, len(vals), data_off + len(extra))
                )
                extra += body
        magic = b"II*\x00" if endian == "II" else b"MM\x00*"
        return (magic + struct.pack(e + "I", 8) + struct.pack(e + "H", n)
                + b"".join(ents) + struct.pack(e + "I", 0) + extra + raw)

    assert np.array_equal(decode_tiff(hand_tiff16(img16, "MM")), img16)
    assert np.array_equal(decode_tiff(hand_tiff16(img16, "II")), img16)

    # 16-bit predictor 2: differences are per sample modulo 65536
    diffs = img16.astype(np.int64).copy()
    diffs[:, 1:] = np.diff(img16.astype(np.int64), axis=1)
    stored = (diffs % 65536).astype(np.uint16)
    assert np.array_equal(
        decode_tiff(hand_tiff16(stored, "II", extra_tags=[(317, 3, [2])])), img16
    )

    # unsupported sample widths still fall to the documented seam: rewrite
    # the out-of-line bits array [16,16,16] -> [12,12,12]
    twelve = hand_tiff16(img16, "II").replace(
        struct.pack("<3H", 16, 16, 16), struct.pack("<3H", 12, 12, 12), 1
    )
    with pytest.raises(NotImplementedError, match="samples"):
        decode_tiff(twelve)


def test_tiff_tiled_roundtrip():
    """Tiled TIFF (TIFF 6.0 §15, tags 322-325): edge-padded tiles round-trip
    under every compression, planar config, 8/16-bit, and predictor 2 —
    including tile sizes that do not divide the image dims."""
    from covid19_spark.operators.multimodal import decode_image, decode_tiff, encode_tiff

    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (17, 23, 3), dtype=np.uint8)
    img16 = rng.integers(0, 65536, (10, 12, 3), dtype=np.uint16)
    for comp in ("none", "packbits", "lzw"):
        for planar in (1, 2):
            for tile in ((8, 8), (5, 7)):
                for pred in (1, 2):
                    got = decode_tiff(
                        encode_tiff(img, compression=comp, planar=planar,
                                    tile=tile, predictor=pred)
                    )
                    assert np.array_equal(got, img), (comp, planar, tile, pred)
    got16 = decode_tiff(encode_tiff(img16, compression="lzw", planar=2,
                                    tile=(8, 8), predictor=2))
    assert got16.dtype == np.uint16 and np.array_equal(got16, img16)
    gray = rng.integers(0, 256, (9, 9), dtype=np.uint8)
    out = decode_image(encode_tiff(gray, compression="packbits", tile=(4, 4)))
    assert np.array_equal(out[:, :, 0], gray)
    # strips with predictor 2 through the ENCODER too (the hand-built
    # vectors above cover the decode side only)
    assert np.array_equal(decode_tiff(encode_tiff(img, compression="lzw", predictor=2)), img)


def test_tiff_sub_byte_samples():
    """1/2/4-bit TIFF samples (bilevel/low-depth gray — fax and archival
    scan depths): MSB-first bit-packed rows, byte-aligned per strip/tile
    row, gray scaled exactly to the 8-bit range (1-bit → 0/255), WhiteIsZero
    inverted within the sample depth, palette indexed by a 2^bits colormap."""
    import struct

    from covid19_spark.operators.multimodal import decode_tiff, encode_tiff

    rng = np.random.default_rng(41)
    for bit in (1, 2, 4):
        scale = 255 // ((1 << bit) - 1)
        for comp in ("none", "packbits", "lzw", "deflate"):
            img = rng.integers(0, 1 << bit, (17, 23)).astype(np.uint8)
            got = decode_tiff(encode_tiff(img, compression=comp, rows_per_strip=5, bits=bit))
            assert np.array_equal(got[:, :, 0], img * scale), (bit, comp, "strips")
            got = decode_tiff(encode_tiff(img, compression=comp, tile=(7, 6), bits=bit))
            assert np.array_equal(got[:, :, 0], img * scale), (bit, comp, "tiles")

    # WhiteIsZero: invert within the 1-bit depth
    img = rng.integers(0, 2, (10, 11)).astype(np.uint8)
    p = bytearray(encode_tiff(img, bits=1, rows_per_strip=100))
    i = p.find(struct.pack("<HHI", 262, 3, 1))
    struct.pack_into("<H", p, i + 8, 0)
    assert np.array_equal(decode_tiff(bytes(p))[:, :, 0], (1 - img) * 255)

    # 4-bit palette: photometric 3 + a 16-entry colormap (tag 320, 16-bit
    # per channel R-plane G-plane B-plane) appended to an encoded file
    idx = rng.integers(0, 16, (6, 9)).astype(np.uint8)
    pal = rng.integers(0, 256, (16, 3)).astype(np.uint8)
    # hand-build: nibble pairs per byte, rows byte-aligned
    rb = (9 * 4 + 7) // 8
    rows = []
    for r in range(6):
        padded = np.pad(idx[r], (0, (-9) % 2))
        rows.append(bytes(((padded[0::2] << 4) | padded[1::2]).astype(np.uint8)))
    raw = b"".join(rows)
    assert len(raw) == 6 * rb
    cmap_vals = []
    for ch in range(3):  # R plane then G then B, 16-bit per entry
        cmap_vals += [int(v) << 8 for v in pal[:, ch]]
    e = "<"
    tags = [
        (256, 3, [9]), (257, 3, [6]), (258, 3, [4]), (259, 3, [1]),
        (262, 3, [3]), (273, 4, None), (277, 3, [1]), (278, 3, [6]),
        (279, 4, [len(raw)]), (320, 3, None),
    ]
    n = len(tags)
    data_off = 8 + 2 + 12 * n + 4
    cmap_off = data_off
    strip_off = cmap_off + 2 * len(cmap_vals)
    extra = struct.pack(e + f"{len(cmap_vals)}H", *cmap_vals)
    ents = []
    for tag, typ, vals in tags:
        if tag == 320:
            ents.append(struct.pack(e + "HHII", 320, 3, len(cmap_vals), cmap_off))
            continue
        if tag == 273:
            vals = [strip_off]
        body = struct.pack(e + str(len(vals)) + {3: "H", 4: "I"}[typ], *vals)
        ents.append(struct.pack(e + "HHI", tag, typ, len(vals)) + body.ljust(4, b"\x00"))
    payload = (
        b"II*\x00" + struct.pack(e + "I", 8) + struct.pack(e + "H", n)
        + b"".join(ents) + struct.pack(e + "I", 0) + extra + raw
    )
    assert np.array_equal(decode_tiff(payload), pal[idx])

    with pytest.raises(ValueError, match="range"):
        encode_tiff(np.full((3, 3), 4, np.uint8), bits=2)
    with pytest.raises(ValueError, match="2D"):
        encode_tiff(np.zeros((3, 3, 3), np.uint8), bits=1)


def test_tiff_deflate_compression():
    """Adobe deflate (compression 8): zlib per strip/tile — stdlib-real,
    bit-exact round-trips for strips, tiles, planar, 16-bit, predictor 2,
    and the old-deflate code 32946 decodes identically."""
    from covid19_spark.operators.multimodal import decode_tiff, encode_tiff

    rng = np.random.default_rng(31)
    img = rng.integers(0, 256, (17, 23, 3), dtype=np.uint8)
    img16 = rng.integers(0, 65536, (9, 11, 3), dtype=np.uint16)
    for planar in (1, 2):
        for pred in (1, 2):
            assert np.array_equal(
                decode_tiff(encode_tiff(img, compression="deflate", planar=planar,
                                        predictor=pred, rows_per_strip=5)), img)
            assert np.array_equal(
                decode_tiff(encode_tiff(img, compression="deflate", planar=planar,
                                        tile=(8, 8), predictor=pred)), img)
    got16 = decode_tiff(encode_tiff(img16, compression="deflate", predictor=2))
    assert got16.dtype == np.uint16 and np.array_equal(got16, img16)
    # old-deflate code 32946 is the same zlib stream — patch the tag value
    import struct
    p = bytearray(encode_tiff(img, compression="deflate", rows_per_strip=100))
    i = p.find(struct.pack("<HHI", 259, 3, 1))
    assert i > 0 and struct.unpack_from("<H", p, i + 8)[0] == 8
    struct.pack_into("<H", p, i + 8, 32946)
    assert np.array_equal(decode_tiff(bytes(p)), img)
    # corrupt deflate stream raises ValueError, not zlib.error
    bad = bytearray(encode_tiff(img, compression="deflate", rows_per_strip=100))
    bad[-10] ^= 0xFF
    with pytest.raises(ValueError):
        decode_tiff(bytes(bad))


def test_tiff_jpeg_compression():
    """New-style JPEG-in-TIFF (compression 7, TIFF TechNote 2): every
    strip/tile is a JPEG stream decoded by operators/jpeg. The contract is
    pixel-equality with the per-chunk JPEG round-trip (JPEG is lossy), for
    strips, tiles, grayscale, and separate planes."""
    from covid19_spark.operators.jpeg import decode_jpeg, encode_jpeg
    from covid19_spark.operators.multimodal import decode_tiff, encode_tiff

    rng = np.random.default_rng(21)
    base = rng.integers(0, 256, (5, 6, 3)).astype(np.uint8)
    img = np.repeat(np.repeat(base, 5, axis=0), 5, axis=1)  # 25x30, blocky

    got = decode_tiff(encode_tiff(img, compression="jpeg", rows_per_strip=8))
    exp = np.concatenate(
        [decode_jpeg(encode_jpeg(img[y : y + 8], quality=90)) for y in range(0, 25, 8)],
        axis=0,
    )
    assert np.array_equal(got, exp)
    assert np.abs(got.astype(int) - img.astype(int)).mean() < 10  # lossy but close

    got = decode_tiff(encode_tiff(img, compression="jpeg", tile=(16, 16)))
    assert got.shape == img.shape
    assert np.abs(got.astype(int) - img.astype(int)).mean() < 10

    g = np.repeat(np.repeat(rng.integers(0, 256, (4, 5)).astype(np.uint8), 4, 0), 4, 1)
    got = decode_tiff(encode_tiff(g, compression="jpeg", rows_per_strip=8))
    assert np.abs(got[:, :, 0].astype(int) - g.astype(int)).mean() < 6

    got = decode_tiff(encode_tiff(img, compression="jpeg", planar=2, tile=(16, 16)))
    assert np.abs(got.astype(int) - img.astype(int)).mean() < 10

    with pytest.raises(ValueError, match="8-bit"):
        encode_tiff(img.astype(np.uint16), compression="jpeg")
    with pytest.raises(ValueError, match="predictor"):
        encode_tiff(img, compression="jpeg", predictor=2)


def test_tiff_old_style_jpeg():
    """Old-style JPEG-in-TIFF (compression 6, TIFF 6.0 §22): the forms real
    writers produced decode — (a) a complete interchange stream at tag 513
    (with or without the 514 length, strips entirely absent), (b) strips
    that are themselves complete SOI streams (handled by the compression-7
    fall-through). The tables-split variant without SOI chunks rejects."""
    import struct

    from covid19_spark.operators.jpeg import decode_jpeg, encode_jpeg
    from covid19_spark.operators.multimodal import decode_tiff

    rng = np.random.default_rng(29)
    img = np.repeat(np.repeat(rng.integers(0, 256, (4, 4, 3)).astype(np.uint8), 4, 0), 4, 1)
    stream = encode_jpeg(img, quality=85)  # 16x16
    e = "<"

    def build(tags_spec, trailer):
        n = len(tags_spec)
        data_off = 8 + 2 + 12 * n + 4
        extra = struct.pack(e + "3H", 8, 8, 8)
        ents = []
        for tag, typ, vals in tags_spec:
            if tag == 258:
                ents.append(struct.pack(e + "HHII", 258, 3, 3, data_off))
                continue
            if vals == "TRAILER":
                vals = [data_off + len(extra)]
            fmt = {3: "H", 4: "I"}[typ]
            body = struct.pack(e + str(len(vals)) + fmt, *vals)
            ents.append(struct.pack(e + "HHI", tag, typ, len(vals)) + body.ljust(4, b"\x00"))
        return (b"II*\x00" + struct.pack(e + "I", 8) + struct.pack(e + "H", n)
                + b"".join(ents) + struct.pack(e + "I", 0) + extra + trailer)

    want = decode_jpeg(stream)
    base = [(256, 3, [16]), (257, 3, [16]), (258, 3, None), (259, 3, [6]),
            (262, 3, [6]), (277, 3, [3])]
    # (a) tag 513 + 514, no strips at all
    p = build(base + [(513, 4, "TRAILER"), (514, 4, [len(stream)])], stream)
    assert np.array_equal(decode_tiff(p), want)
    # (a') tag 513 without 514 — length defaults to end of file
    p = build(base + [(513, 4, "TRAILER")], stream)
    assert np.array_equal(decode_tiff(p), want)
    # (b) per-strip complete streams, no 513
    p = build(base + [(273, 4, "TRAILER"), (278, 3, [16]),
                      (279, 4, [len(stream)])], stream)
    assert np.array_equal(decode_tiff(p), want)
    # tables-split seam: strips that are not SOI streams
    p = build(base + [(273, 4, "TRAILER"), (278, 3, [16]),
                      (279, 4, [100])], b"\x00" * 100)
    with pytest.raises(ValueError, match="missing SOI"):
        decode_tiff(p)


def test_tiff_jpeg_tables_abbreviated_stream():
    """TechNote 2's JPEGTables layout: shared DQT/DHT live in tag 347
    (type UNDEFINED) as an abbreviated tables-only stream; each strip is an
    abbreviated image stream WITHOUT its tables. The decoder must merge
    SOI + tables-body + strip-after-SOI and decode identically to the full
    per-strip stream."""
    import struct

    from covid19_spark.operators.jpeg import decode_jpeg, encode_jpeg
    from covid19_spark.operators.multimodal import decode_tiff

    rng = np.random.default_rng(23)
    img = np.repeat(np.repeat(rng.integers(0, 256, (4, 4, 3)).astype(np.uint8), 4, 0), 4, 1)
    full = encode_jpeg(img, quality=85)  # one full-image strip, 16x16

    # split: DQT (FFDB) / DHT (FFC4) segments -> tables; the rest -> strip
    tables, rest = bytearray(b"\xff\xd8"), bytearray(b"\xff\xd8")
    pos = 2
    while pos + 4 <= len(full):
        assert full[pos] == 0xFF
        marker = full[pos + 1]
        if marker == 0xD9:
            break
        if marker == 0xDA:  # SOS: scan data runs to EOI, keep in strip
            rest += full[pos:-2]
            break
        (seglen,) = struct.unpack_from(">H", full, pos + 2)
        seg = full[pos : pos + 2 + seglen]
        (tables if marker in (0xDB, 0xC4) else rest).extend(seg)
        pos += 2 + seglen
    tables += b"\xff\xd9"
    rest += b"\xff\xd9"
    # sanity: the abbreviated strip alone must be missing its tables
    assert b"\xff\xdb" not in bytes(rest[:40])

    e = "<"
    strip = bytes(rest)
    tags = [
        (256, 3, [16]), (257, 3, [16]), (258, 3, None), (259, 3, [7]),
        (262, 3, [6]), (273, 4, None), (277, 3, [3]), (278, 3, [16]),
        (279, 4, [len(strip)]), (347, 7, None),
    ]
    n = len(tags)
    data_off = 8 + 2 + 12 * n + 4
    bits_off = data_off
    tables_off = bits_off + 6
    strip_off = tables_off + len(tables)
    extra = struct.pack(e + "3H", 8, 8, 8) + bytes(tables)
    ents = []
    for tag, typ, vals in tags:
        if tag == 258:
            ents.append(struct.pack(e + "HHII", 258, 3, 3, bits_off))
            continue
        if tag == 273:
            vals = [strip_off]
        if tag == 347:
            ents.append(struct.pack(e + "HHII", 347, 7, len(tables), tables_off))
            continue
        fmt = {3: "H", 4: "I"}[typ]
        body = struct.pack(e + str(len(vals)) + fmt, *vals)
        ents.append(struct.pack(e + "HHI", tag, typ, len(vals)) + body.ljust(4, b"\x00"))
    payload = (
        b"II*\x00" + struct.pack(e + "I", 8) + struct.pack(e + "H", n)
        + b"".join(ents) + struct.pack(e + "I", 0) + extra + strip
    )
    assert np.array_equal(decode_tiff(payload), decode_jpeg(full))


def test_tiff_tiled_hand_built_vector():
    """Hand-built big-endian tiled vector: 4x4 RGB, 2x2 tiles stored in
    tile-row-major order with predictor 2 applied PER TILE (differencing
    restarts at each tile's left edge — the semantic difference from
    strips). Exercises decode only, independent of encode_tiff."""
    import struct

    from covid19_spark.operators.multimodal import decode_tiff

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (4, 4, 3), dtype=np.uint8)
    e = ">"
    tiles = []
    for ty in range(2):
        for tx in range(2):
            blk = img[ty * 2 : ty * 2 + 2, tx * 2 : tx * 2 + 2].astype(np.int64)
            d = blk.copy()
            d[:, 1:] -= blk[:, :-1]  # per-tile horizontal differencing
            tiles.append((d % 256).astype(np.uint8).tobytes())
    tags = [
        (256, 3, [4]), (257, 3, [4]), (258, 3, None), (259, 3, [1]),
        (262, 3, [2]), (277, 3, [3]), (317, 3, [2]),
        (322, 3, [2]), (323, 3, [2]), (324, 4, None), (325, 4, None),
    ]
    n = len(tags)
    data_off = 8 + 2 + 12 * n + 4
    # out-of-line payloads: bits array (6 B), tile offsets (16 B),
    # tile counts (16 B), then the 4 tiles of 12 B each
    bits_off = data_off
    toff_off = bits_off + 6
    tcnt_off = toff_off + 16
    tile0 = tcnt_off + 16
    offsets = [tile0 + 12 * i for i in range(4)]
    extra = struct.pack(e + "3H", 8, 8, 8)
    extra += struct.pack(e + "4I", *offsets)
    extra += struct.pack(e + "4I", 12, 12, 12, 12)
    ents = []
    for tag, typ, vals in tags:
        if tag == 258:
            ents.append(struct.pack(e + "HHII", 258, 3, 3, bits_off))
            continue
        if tag == 324:
            ents.append(struct.pack(e + "HHII", 324, 4, 4, toff_off))
            continue
        if tag == 325:
            ents.append(struct.pack(e + "HHII", 325, 4, 4, tcnt_off))
            continue
        body = struct.pack(e + str(len(vals)) + "H", *vals)
        ents.append(struct.pack(e + "HHI", tag, typ, len(vals)) + body.ljust(4, b"\x00"))
    payload = (
        b"MM\x00*" + struct.pack(e + "I", 8) + struct.pack(e + "H", n)
        + b"".join(ents) + struct.pack(e + "I", 0) + extra + b"".join(tiles)
    )
    assert np.array_equal(decode_tiff(payload), img)
    # a decoder that applied the predictor across the assembled row (strip
    # semantics) instead of per tile would differ wherever a tile boundary
    # crosses a row — guard that the vector actually discriminates: the
    # right-column tiles' first columns are ABSOLUTE samples per-tile but
    # would be differences under strip semantics
    whole = img.astype(np.int64)
    dall = whole.copy()
    dall[:, 1:] -= whole[:, :-1]
    strip_style_tile1 = (dall[0:2, 2:4] % 256).astype(np.uint8).tobytes()
    assert tiles[1] != strip_style_tile1


def _split_jpeg(stream):
    qt, dc, ac = {}, {}, {}
    dri, entropy = 0, None
    pos = 2
    while pos + 4 <= len(stream):
        assert stream[pos] == 0xFF
        marker = stream[pos + 1]
        pos += 2
        if marker == 0xD9:
            break
        ln = int.from_bytes(stream[pos : pos + 2], "big")
        body = stream[pos + 2 : pos + ln]
        if marker == 0xDB:
            b = 0
            while b < len(body):
                qt[body[b] & 0xF] = body[b + 1 : b + 65]
                b += 65
        elif marker == 0xC4:
            b = 0
            while b < len(body):
                tc, th = body[b] >> 4, body[b] & 0xF
                n = sum(body[b + 1 : b + 17])
                (dc if tc == 0 else ac)[th] = body[b + 1 : b + 17 + n]
                b += 17 + n
        elif marker == 0xDD:
            dri = int.from_bytes(body[:2], "big")
        elif marker == 0xDA:
            pos += ln
            entropy = stream[pos:-2]
            return qt, dc, ac, dri, entropy
        pos += ln
    raise AssertionError("no SOS in stream")

def _build_tables_split(w, h, spp, photo, entropies, rps, qt, dc, ac, dri=0, sub=None,
          proc=1, tile=None):
    e = "<"
    blobs = []

    def blob(data):
        blobs.append(bytes(data))
        return len(blobs) - 1

    tsel = lambda ci: 0 if ci == 0 else 1
    q_i = [blob(qt[tsel(ci)]) for ci in range(spp)]
    d_i = [blob(dc[tsel(ci)]) for ci in range(spp)]
    a_i = [blob(ac[tsel(ci)]) for ci in range(spp)]
    s_i = [blob(en) for en in entropies]
    if tile:
        chunk_tags = [
            (322, 4, [tile[0]]), (323, 4, [tile[1]]),
            (324, 4, [("b", i) for i in s_i]),
            (325, 4, [len(en) for en in entropies]),
        ]
    else:
        chunk_tags = [
            (273, 4, [("b", i) for i in s_i]),
            (278, 3, [rps]),
            (279, 4, [len(en) for en in entropies]),
        ]
    tags = [
        (256, 4, [w]), (257, 4, [h]), (258, 3, [8] * spp),
        (259, 3, [6]), (262, 3, [photo]),
        (277, 3, [spp]),
        (512, 3, [proc]),
        (519, 4, [("b", i) for i in q_i]),
        (520, 4, [("b", i) for i in d_i]),
        (521, 4, [("b", i) for i in a_i]),
    ] + chunk_tags
    if dri:
        tags.append((515, 4, [dri]))
    if sub:
        tags.append((530, 3, list(sub)))
    tags.sort()
    n = len(tags)
    ifd_end = 8 + 2 + 12 * n + 4
    tsize = {3: 2, 4: 4}
    val_area = sum(
        tsize[typ] * len(vals)
        for _, typ, vals in tags
        if tsize[typ] * len(vals) > 4
    )
    val_area += val_area % 2
    blob_offs, off = [], ifd_end + val_area
    for b in blobs:
        blob_offs.append(off)
        off += len(b) + (len(b) % 2)
    ents, vals_out = [], b""
    for tag, typ, vals in tags:
        rv = [blob_offs[i] if isinstance(v, tuple) else v
              for v in vals for i in [v[1] if isinstance(v, tuple) else 0]]
        fmt = {3: "H", 4: "I"}[typ]
        body = struct.pack(e + str(len(rv)) + fmt, *rv)
        if len(body) <= 4:
            ents.append(
                struct.pack(e + "HHI", tag, typ, len(rv)) + body.ljust(4, b"\0")
            )
        else:
            voff = ifd_end + len(vals_out)
            ents.append(struct.pack(e + "HHII", tag, typ, len(rv), voff))
            vals_out += body
    vals_out = vals_out.ljust(val_area, b"\0")
    blob_area = b"".join(
        b + b"\0" * (len(b) % 2) for b in blobs
    )
    return (b"II*\x00" + struct.pack(e + "I", 8) + struct.pack(e + "H", n)
            + b"".join(ents) + struct.pack(e + "I", 0) + vals_out + blob_area)



def test_tiff_old_style_jpeg_tables_split():
    """TIFF 6.0 §22 tables-split old-style JPEG — the last §22 form: tags
    519/520/521 point at RAW quant/Huffman table data and the strips are
    BARE entropy-coded scan data (no markers). The decoder must rebuild an
    interchange stream per strip and match the plain JPEG decode of the
    same data. Covers grayscale, multi-strip YCbCr 2x2 (tag 530), restart
    intervals (tag 515 -> DRI, live RSTn markers in the strip bytes), and
    the photometric-2 / lossless-proc seams."""
    import struct

    from covid19_spark.operators.jpeg import decode_jpeg, encode_jpeg
    from covid19_spark.operators.multimodal import decode_tiff

    split_jpeg, build = _split_jpeg, _build_tables_split

    rng = np.random.default_rng(31)

    # grayscale, single strip
    g = rng.integers(0, 256, size=(24, 17), dtype=np.uint8)
    full = encode_jpeg(g, quality=85)
    qt, dc, ac, dri, en = split_jpeg(full)
    p = build(17, 24, 1, 1, [en], 24, qt, dc, ac)
    assert np.array_equal(decode_tiff(p), decode_jpeg(full))

    # YCbCr 2x2, three strips (16 + 16 + 8 rows)
    img = rng.integers(0, 256, size=(40, 32, 3), dtype=np.uint8)
    strips = [img[0:16], img[16:32], img[32:40]]
    streams = [encode_jpeg(s, quality=80, subsampling="420") for s in strips]
    qt, dc, ac, _, _ = split_jpeg(streams[0])
    ens = [split_jpeg(st)[4] for st in streams]
    p = build(32, 40, 3, 6, ens, 16, qt, dc, ac, sub=(2, 2))
    want = np.concatenate([decode_jpeg(st) for st in streams], axis=0)
    assert np.array_equal(decode_tiff(p), want)

    # restart interval: DRI segment + real RSTn markers in the strip bytes
    full = encode_jpeg(img, quality=80, subsampling="420", restart_interval=2)
    qt, dc, ac, dri, en = split_jpeg(full)
    assert dri == 2 and b"\xff\xd0" in en
    p = build(32, 40, 3, 6, [en], 40, qt, dc, ac, dri=dri, sub=(2, 2))
    assert np.array_equal(decode_tiff(p), decode_jpeg(full))

    # photometric 2 (RGB-in-JPEG) stays a seam
    p = build(32, 40, 3, 2, [en], 40, qt, dc, ac, dri=dri)
    with pytest.raises(NotImplementedError, match="photometric 2"):
        decode_tiff(p)
    # lossless old-style proc stays a seam
    p = build(32, 40, 3, 6, [en], 40, qt, dc, ac, dri=dri, sub=(2, 2), proc=14)
    with pytest.raises(NotImplementedError, match="JPEGProc"):
        decode_tiff(p)
    # out-of-range table offset is corrupt, not a crash
    bad = bytearray(build(17, 24, 1, 1, [split_jpeg(encode_jpeg(g))[4]], 24,
                          {0: b"\xff" * 64}, dc, ac))
    i = bad.find(struct.pack("<HH", 519, 4))
    struct.pack_into("<I", bad, i + 8, len(bad) + 10)
    with pytest.raises(ValueError, match="out of range"):
        decode_tiff(bytes(bad))


def test_tiff_rgb_photometric_new_jpeg_is_a_seam():
    """ADVICE r08: decode_jpeg treats every 3-component scan as YCbCr, so a
    third-party RGB-photometric (photo 2) new-style JPEG-in-TIFF would
    decode mis-colored; it must raise the documented NotImplementedError
    instead — the same guard the tables-split old-JPEG path already has."""
    from covid19_spark.operators.multimodal import decode_tiff, encode_tiff

    rng = np.random.default_rng(23)
    img = rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)
    payload = bytearray(encode_tiff(img, compression="jpeg"))
    # tag 262 (PhotometricInterpretation), SHORT, count 1, value 6 (YCbCr)
    entry = bytes.fromhex("060103000100000006000000")
    i = payload.find(entry)
    assert i >= 0
    payload[i + 8] = 2  # rewrite to photometric 2 (RGB)
    with pytest.raises(NotImplementedError, match="RGB-photometric"):
        decode_tiff(bytes(payload))


def test_tiff_old_style_jpeg_tables_split_tiled():
    """VERDICT r08 task #7: the tiled organization of the §22 tables-split
    form — the same rebuilt-stream kernel over TIFF 6.0 §15 grid framing.
    Every tile is a FULL tile-size scan (edge tiles padded by the writer);
    the decoder assembles row-major and crops. Grayscale and YCbCr 2x2
    grids, plus the short-tile-list corruption guard."""
    from covid19_spark.operators.jpeg import decode_jpeg, encode_jpeg
    from covid19_spark.operators.multimodal import decode_tiff

    rng = np.random.default_rng(37)

    def tiles_of(img, tw, tl):
        h, w = img.shape[:2]
        padded = np.pad(
            img,
            ((0, -h % tl), (0, -w % tw)) + ((0, 0),) * (img.ndim - 2),
            mode="edge",
        )
        return [
            padded[y : y + tl, x : x + tw]
            for y in range(0, padded.shape[0], tl)
            for x in range(0, padded.shape[1], tw)
        ]

    # grayscale 40x50, 16x16 tiles (4x3 grid, both edges ragged)
    g = rng.integers(0, 256, size=(40, 50), dtype=np.uint8)
    streams = [encode_jpeg(tp, quality=85) for tp in tiles_of(g, 16, 16)]
    qt, dc, ac, _, _ = _split_jpeg(streams[0])
    ens = [_split_jpeg(st)[4] for st in streams]
    p = _build_tables_split(50, 40, 1, 1, ens, 0, qt, dc, ac, tile=(16, 16))
    rows = [
        np.concatenate([decode_jpeg(st) for st in streams[r * 4 : r * 4 + 4]], axis=1)
        for r in range(3)
    ]
    want = np.concatenate(rows, axis=0)[:40, :50]
    assert np.array_equal(decode_tiff(p), want)

    # YCbCr 2x2-subsampled RGB, 32x16 tiles over 30x40
    img = rng.integers(0, 256, size=(30, 40, 3), dtype=np.uint8)
    streams = [
        encode_jpeg(tp, quality=80, subsampling="420")
        for tp in tiles_of(img, 32, 16)
    ]
    qt, dc, ac, _, _ = _split_jpeg(streams[0])
    ens = [_split_jpeg(st)[4] for st in streams]
    p = _build_tables_split(
        40, 30, 3, 6, ens, 0, qt, dc, ac, sub=(2, 2), tile=(32, 16)
    )
    rows = [
        np.concatenate([decode_jpeg(st) for st in streams[r * 2 : r * 2 + 2]], axis=1)
        for r in range(2)
    ]
    want = np.concatenate(rows, axis=0)[:30, :40]
    assert np.array_equal(decode_tiff(p), want)

    # a tile list shorter than the grid is corrupt, not a crash
    p = _build_tables_split(40, 30, 3, 6, ens[:2], 0, qt, dc, ac,
                            sub=(2, 2), tile=(32, 16))
    with pytest.raises(ValueError, match="tiles cover less"):
        decode_tiff(p)
