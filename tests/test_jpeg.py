"""Baseline JPEG codec (operators/jpeg.py): round-trip fidelity, subsampling,
restart markers, reject paths. No Spark session needed — the codec is a
per-row kernel; its Spark plumbing is covered by test_multimodal.py."""

import numpy as np
import pytest

from covid19_spark.operators.jpeg import decode_jpeg, encode_jpeg
from covid19_spark.operators.multimodal import decode_image


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return float("inf") if mse == 0 else 10 * np.log10(255.0**2 / mse)


def _gradient(h=40, w=56):
    yy, xx = np.mgrid[0:h, 0:w]
    r = (xx * 255 / max(w - 1, 1)).astype(np.uint8)
    g = (yy * 255 / max(h - 1, 1)).astype(np.uint8)
    b = ((xx + yy) * 255 / (h + w - 2)).astype(np.uint8)
    return np.stack([r, g, b], axis=2)


def test_roundtrip_444_high_quality():
    img = _gradient()
    out = decode_jpeg(encode_jpeg(img, quality=92))
    assert out.shape == img.shape
    assert _psnr(img, out) > 32


def test_roundtrip_420_subsampled():
    img = _gradient()
    payload = encode_jpeg(img, quality=90, subsampling="420")
    out = decode_jpeg(payload)
    assert out.shape == img.shape
    assert _psnr(img, out) > 28
    # 4:2:0 files are smaller than 4:4:4 at the same quality
    assert len(payload) < len(encode_jpeg(img, quality=90, subsampling="444"))


def test_flat_color_near_exact():
    img = np.full((24, 24, 3), 130, dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=90))
    assert int(np.abs(out.astype(int) - 130).max()) <= 2


def test_grayscale_roundtrip():
    yy, xx = np.mgrid[0:32, 0:24]
    gray = ((xx * 7 + yy * 3) % 256).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(gray, quality=95))
    assert out.shape == (32, 24, 3)
    # all three channels replicate Y
    assert np.array_equal(out[:, :, 0], out[:, :, 1])
    assert _psnr(np.repeat(gray[:, :, None], 3, axis=2), out) > 25


def test_odd_dimensions_crop_back():
    img = _gradient(17, 13)
    for ss in ("444", "420"):
        out = decode_jpeg(encode_jpeg(img, quality=90, subsampling=ss))
        assert out.shape == (17, 13, 3)


def test_restart_markers_equivalent():
    img = _gradient(33, 47)
    plain = decode_jpeg(encode_jpeg(img, quality=85))
    with_rst = encode_jpeg(img, quality=85, restart_interval=2)
    assert b"\xff\xdd" in with_rst  # DRI segment present
    assert with_rst.count(b"\xff\xd0") >= 1  # at least one RST0
    assert np.array_equal(decode_jpeg(with_rst), plain)


def test_encode_deterministic():
    img = _gradient()
    assert encode_jpeg(img, quality=80) == encode_jpeg(img, quality=80)


def test_quality_monotone_size():
    img = _gradient()
    sizes = [len(encode_jpeg(img, quality=q)) for q in (30, 60, 90)]
    assert sizes[0] < sizes[1] < sizes[2]


def test_rejects_arithmetic_and_garbage():
    img = _gradient(16, 16)
    payload = bytearray(encode_jpeg(img, quality=80))
    i = payload.find(b"\xff\xc0")
    # PROGRESSIVE arithmetic (SOF10) stays an explicit seam — sequential
    # SOF9 is now decoded (tests/test_jpeg_arith.py)
    payload[i + 1] = 0xCA
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(payload))
    # SOF2 is now DECODED — but a baseline scan header (Ss=0, Se=63) under a
    # progressive frame is an illegal band combination, not silent garbage
    payload[i + 1] = 0xC2
    with pytest.raises(ValueError, match="spectral"):
        decode_jpeg(bytes(payload))
    with pytest.raises(ValueError):
        decode_jpeg(b"\x00\x01\x02")
    with pytest.raises(ValueError):
        decode_jpeg(None)


def test_seam_rejection_happens_at_sniff_cost():
    """VERDICT r06 task #8: unsupported-variant/12-bit streams are refused by the
    header marker walk BEFORE any DQT/DHT parsing. Proof: plant a DHT whose
    body is corrupt (counts point past the segment) ahead of the SOF — the
    main walk would raise ValueError parsing it, so getting
    NotImplementedError means the seam fired without touching the tables."""
    import struct

    from covid19_spark.operators.jpeg import sniff_jpeg_frame

    img = _gradient(16, 16)
    payload = bytearray(encode_jpeg(img, quality=80))
    i = payload.find(b"\xff\xc0")
    # corrupt DHT: 16 count bytes claiming 255 symbols with a 1-byte body
    bad_dht = b"\xff\xc4" + struct.pack(">H", 2 + 17 + 1) + b"\x00" + b"\xff" * 16 + b"\x00"
    seam = payload[:i] + bad_dht + payload[i:]

    arith = bytearray(seam)
    j = bytes(arith).find(b"\xff\xc0")
    arith[j + 1] = 0xCA
    with pytest.raises(NotImplementedError, match="SOF marker 0xca"):
        decode_jpeg(bytes(arith))

    deep = bytearray(seam)
    deep[j + 4] = 12  # precision byte of the SOF body
    with pytest.raises(NotImplementedError, match="12-bit"):
        decode_jpeg(bytes(deep))

    # the sniff itself reports the frame header for both
    marker, prec, h, w = sniff_jpeg_frame(bytes(arith))
    assert (marker, h, w) == (0xCA, 16, 16)
    assert sniff_jpeg_frame(bytes(deep))[1] == 12

    # control: the same corrupt DHT under a SUPPORTED SOF still surfaces
    # the table error from the main walk
    with pytest.raises(ValueError, match="corrupt JPEG"):
        decode_jpeg(bytes(seam))


def test_decode_image_dispatches_jpeg():
    img = _gradient(16, 16)
    out = decode_image(encode_jpeg(img, quality=92))
    assert out.shape == (16, 16, 3)
    assert _psnr(img, out) > 30


def test_truncated_payload_raises_valueerror_everywhere():
    """Any prefix of a valid JPEG that passes the SOI magic must fail with
    the documented ValueError('corrupt JPEG...') contract — never a raw
    struct.error / IndexError escaping the marker loop or the entropy bit
    reader (ADVICE r04). Sweep every segment boundary plus mid-entropy cuts."""
    payload = encode_jpeg(_gradient(24, 24), quality=85)
    # a sweep over prefix lengths: fine-grained through the headers, then
    # strided through the entropy-coded segment
    cuts = list(range(2, min(len(payload), 200))) + list(
        range(200, len(payload) - 1, 37)
    )
    for n in cuts:
        with pytest.raises((ValueError, NotImplementedError)):
            decode_jpeg(payload[:n])


def test_corrupted_segment_length_raises_valueerror():
    """A segment length pointing past end-of-buffer is truncation, not a
    crash."""
    payload = bytearray(encode_jpeg(_gradient(16, 16), quality=85))
    # APP0/DQT length field lives right after the first marker: blow it up
    payload[4] = 0xFF
    payload[5] = 0xFF
    with pytest.raises(ValueError, match="truncated"):
        decode_jpeg(bytes(payload[:64]))


# --- progressive (SOF2) ------------------------------------------------------


def test_progressive_matches_baseline_exactly():
    """Progressive and baseline encodings share the same quantized
    coefficients, so their decodes must be bit-identical — this closes the
    loop on every Annex G scan type the encoder's script emits (interleaved
    DC first/refine, spectral-selection AC first, AC refinement, EOB runs)."""
    rng = np.random.default_rng(3)
    cases = [
        (_gradient(), dict(subsampling="444")),
        (_gradient(), dict(subsampling="420")),
        (rng.integers(0, 256, (24, 40, 3), dtype=np.uint8), dict(subsampling="444")),
        (_gradient(17, 13), dict(subsampling="420")),
        ((np.mgrid[0:32, 0:24][0] * 7 % 256).astype(np.uint8), {}),
        (_gradient(48, 48), dict(subsampling="420", restart_interval=2)),
    ]
    for img, kw in cases:
        base = decode_jpeg(encode_jpeg(img, quality=85, **kw))
        prog = decode_jpeg(encode_jpeg(img, quality=85, progressive=True, **kw))
        assert np.array_equal(base, prog), kw


def test_progressive_large_smooth_exercises_eob_runs():
    """A large flat image makes every AC band all-zero -> EOBn codes with
    multi-block runs (the decoder's r>0 EOB path), including refinement
    scans whose run blocks consume correction bits."""
    img = np.full((80, 80, 3), 200, dtype=np.uint8)
    payload = encode_jpeg(img, quality=85, progressive=True)
    out = decode_jpeg(payload)
    assert int(np.abs(out.astype(int) - 200).max()) <= 2
    base = decode_jpeg(encode_jpeg(img, quality=85))
    assert np.array_equal(out, base)


def test_progressive_is_sof2_and_multiscan():
    payload = encode_jpeg(_gradient(), quality=85, progressive=True)
    assert b"\xff\xc2" in payload  # SOF2
    assert payload.count(b"\xff\xda") >= 6  # one SOS per scan-script entry
    # progressive file differs from baseline but decodes identically
    assert b"\xff\xc0" not in payload


def test_progressive_truncation_raises_valueerror():
    payload = encode_jpeg(_gradient(24, 24), quality=85, progressive=True)
    cuts = list(range(2, min(len(payload), 300), 3)) + list(
        range(300, len(payload) - 1, 101)
    )
    for n in cuts:
        with pytest.raises((ValueError, NotImplementedError)):
            decode_jpeg(payload[:n])


def test_decode_image_dispatches_progressive():
    img = _gradient(16, 16)
    out = decode_image(encode_jpeg(img, quality=92, progressive=True))
    assert out.shape == (16, 16, 3)
    assert _psnr(img, out) > 30


def test_peek_jpeg_dims_contracts():
    """Header-only dimension probe: agrees with the decoded shape for
    baseline 4:4:4, 4:2:0, grayscale, and progressive streams; rejects
    non-JPEG and SOF-less payloads with ValueError."""
    import pytest

    from covid19_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
        peek_jpeg_dims,
    )

    rng = np.random.default_rng(11)
    img = np.repeat(
        np.repeat(rng.integers(0, 256, (5, 7, 3), dtype=np.uint8), 8, 0), 8, 1
    )
    for payload in (
        encode_jpeg(img, quality=85, subsampling="444"),
        encode_jpeg(img, quality=85, subsampling="420"),
        encode_jpeg(img.mean(axis=2).astype(np.uint8), quality=85),
        encode_jpeg(img, quality=85, progressive=True),
    ):
        h, w = peek_jpeg_dims(payload)
        assert (h, w) == decode_jpeg(payload).shape[:2] == (40, 56)
    with pytest.raises(ValueError, match="not a JPEG"):
        peek_jpeg_dims(b"BM\x00\x00")
    with pytest.raises(ValueError):
        peek_jpeg_dims(b"\xff\xd8\xff\xd9")  # SOI+EOI, no SOF


def test_dc_decode_tracks_block_means_across_variants():
    """decode_jpeg_dc must return (ceil(H/8), ceil(W/8), 3) block means for
    every supported stream shape — 4:4:4, 4:2:0 (chroma upsample-by-repeat
    in _dc_assemble), grayscale (replicated), restart markers, and the
    progressive fallback — each within quantization distance of the full
    decode's true 8x8 block means."""
    from covid19_spark.operators.jpeg import (
        decode_jpeg,
        decode_jpeg_dc,
        encode_jpeg,
    )

    rng = np.random.default_rng(13)
    base = rng.integers(40, 216, (6, 8, 3), dtype=np.uint8)
    img = np.repeat(np.repeat(base, 8, 0), 8, 1)  # 48x64, smooth blocks
    gray = img.mean(axis=2).astype(np.uint8)
    variants = [
        ("444", encode_jpeg(img, quality=90, subsampling="444")),
        ("420", encode_jpeg(img, quality=90, subsampling="420")),
        ("gray", encode_jpeg(gray, quality=90)),
        ("rst", encode_jpeg(img, quality=90, restart_interval=2)),
        ("prog", encode_jpeg(img, quality=90, progressive=True)),
    ]
    for name, payload in variants:
        dc = decode_jpeg_dc(payload)
        assert dc.shape == (6, 8, 3), name
        full = decode_jpeg(payload).astype(np.float64)
        bm = full.reshape(6, 8, 8, 8, 3).mean(axis=(1, 3))
        if name == "420":
            # one chroma DC covers a 16x16 area, so per-8x8-block chroma
            # means legitimately differ (the full decode carries chroma AC
            # the 1/8-scale image cannot) — but luma is full-resolution and
            # the JFIF inverse transform makes 0.299R+0.587G+0.114B recover
            # the Y plane exactly, so compare in luma space
            w = np.array([0.299, 0.587, 0.114])
            assert np.abs((dc.astype(np.float64) - bm) @ w).max() <= 3.0
        else:
            assert np.abs(dc.astype(np.float64) - bm).max() <= 3.0, name


def test_lossless_sof3_roundtrip_and_contracts():
    """Lossless JPEG (SOF3, T.81 Annex H — previously a NotImplementedError
    seam): bit-exact round-trips for every predictor 1-7, grayscale and
    RGB, plus the shared-surface contracts (header peek, DC thumbnail
    fallback, invalid predictor rejection)."""
    import pytest

    from covid19_spark.operators.jpeg import (
        decode_jpeg,
        decode_jpeg_dc,
        encode_jpeg_lossless,
        peek_jpeg_dims,
    )

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (21, 34, 3), dtype=np.uint8)
    for pred in range(1, 8):
        payload = encode_jpeg_lossless(img, predictor=pred)
        assert np.array_equal(decode_jpeg(payload), img)
    payload = encode_jpeg_lossless(img)
    assert peek_jpeg_dims(payload) == (21, 34)
    # DC thumbnail fallback: block means of the (exactly recovered) image
    dc = decode_jpeg_dc(payload)
    assert dc.shape == (3, 5, 3)
    gray = img.mean(axis=2).astype(np.uint8)
    assert np.array_equal(
        decode_jpeg(encode_jpeg_lossless(gray, predictor=2)),
        np.repeat(gray[:, :, None], 3, axis=2),
    )
    with pytest.raises(ValueError, match="predictor"):
        encode_jpeg_lossless(img, predictor=0)


def test_16bit_quantization_tables_decode_identically():
    """DQT precision 1 (16-bit entries, T.81 B.2.4.1 — emitted by some
    encoders even for 8-bit images): rewrite a file's 8-bit DQT as 16-bit
    with the same values; the decode must be bit-identical."""
    import struct

    payload = encode_jpeg(_gradient(24, 24), quality=85)
    out = bytearray()
    pos = 2
    out += payload[:2]
    while pos + 4 <= len(payload):
        marker = payload[pos + 1]
        if payload[pos] != 0xFF:
            break
        if marker == 0xD9:
            out += payload[pos:]
            break
        if marker == 0xDA:  # entropy data follows: copy the rest verbatim
            out += payload[pos:]
            break
        (seglen,) = struct.unpack_from(">H", payload, pos + 2)
        body = payload[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:
            nb = bytearray()
            b = 0
            while b < len(body):
                tq = body[b] & 0x0F
                nb.append(0x10 | tq)  # pq=1
                for v in body[b + 1 : b + 65]:
                    nb += struct.pack(">H", v)
                b += 65
            out += bytes([0xFF, 0xDB]) + struct.pack(">H", len(nb) + 2) + bytes(nb)
        else:
            out += payload[pos : pos + 2 + seglen]
        pos += 2 + seglen
    assert np.array_equal(decode_jpeg(bytes(out)), decode_jpeg(payload))
    with pytest.raises(ValueError, match="DQT precision"):
        bad = bytearray(payload)
        i = bad.find(b"\xff\xdb")
        bad[i + 4] = 0x20 | (bad[i + 4] & 0x0F)  # pq=2: invalid
        decode_jpeg(bytes(bad))


def test_12bit_extended_sequential_roundtrip():
    """12-bit SOF1 (T.81 extended sequential): encode from uint16 [0,4095],
    decode back to uint16 RGB with high fidelity; true 12-bit dynamic range
    survives (values above 255 come back above 255, i.e. no 8-bit clamp
    anywhere in the pipeline)."""
    rng = np.random.default_rng(11)
    h, w = 40, 56
    yy, xx = np.mgrid[0:h, 0:w]
    gray12 = ((yy * 60 + xx * 40) % 4096).astype(np.uint16)
    base = rng.integers(0, 4096, (5, 7, 3), dtype=np.uint16)
    rgb12 = np.repeat(np.repeat(base, 8, axis=0), 8, axis=1)

    for img in (gray12, rgb12):
        payload = encode_jpeg(img, quality=92, precision=12)
        out = decode_jpeg(payload)
        assert out.dtype == np.uint16 and out.shape == (h, w, 3)
        ref = img if img.ndim == 3 else np.repeat(img[:, :, None], 3, axis=2)
        assert _psnr_peak(ref, out, 4095) > 45
        assert out.max() > 255  # 12-bit range survives end to end

    # subsampling + restart markers compose with 12-bit
    p420 = encode_jpeg(rgb12, quality=85, precision=12, subsampling="420",
                       restart_interval=2)
    assert _psnr_peak(rgb12, decode_jpeg(p420), 4095) > 28

    # DC-only thumbnail path keeps the 12-bit dtype and block geometry
    dc = decode_jpeg(encode_jpeg(gray12, quality=92, precision=12), dc_only=True)
    assert dc.dtype == np.uint16 and dc.shape == (5, 7, 3)


def _psnr_peak(a, b, peak):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return float("inf") if mse == 0 else 10 * np.log10(peak * peak / mse)


def test_12bit_matches_8bit_pipeline_at_same_content():
    """Encoding an 8-bit image and its exact x16 12-bit lift must decode to
    the same picture on each path's own scale (within quantization slack of
    the scaled tables) — pins that level shift, DQT x16 scaling, and the
    colour transform all moved to the 12-bit centre coherently."""
    rng = np.random.default_rng(13)
    base = rng.integers(0, 256, (4, 5, 3), dtype=np.uint8)
    img8 = np.repeat(np.repeat(base, 8, axis=0), 8, axis=1)
    img12 = (img8.astype(np.uint16) * 16)

    out8 = decode_jpeg(encode_jpeg(img8, quality=90)).astype(np.float64)
    out12 = decode_jpeg(encode_jpeg(img12, quality=90, precision=12)).astype(np.float64)
    assert np.abs(out12 / 16.0 - out8).mean() < 4.0


def test_12bit_rejections_and_truncation_contract():
    """12-bit baseline (SOF0) stays refused at sniff cost — T.81 restricts
    baseline to 8-bit — and the truncation sweep contract extends to 12-bit
    payloads."""
    gray12 = (np.arange(32 * 40, dtype=np.uint16).reshape(32, 40) * 3) % 4096
    payload = encode_jpeg(gray12, quality=88, precision=12)

    from covid19_spark.operators.jpeg import sniff_jpeg_frame

    assert sniff_jpeg_frame(payload)[:2] == (0xC1, 12)
    mutated = bytearray(payload)
    i = mutated.find(b"\xff\xc1")
    mutated[i + 1] = 0xC0
    with pytest.raises(NotImplementedError, match="12-bit"):
        decode_jpeg(bytes(mutated))

    cuts = list(range(2, min(len(payload), 180))) + list(range(180, len(payload) - 1, 41))
    for n in cuts:
        with pytest.raises((ValueError, NotImplementedError)):
            decode_jpeg(payload[:n])


def test_12bit_progressive_matches_sequential_exactly():
    """12-bit progressive (SOF2, P=12 per T.81 Table B.2) shares the same
    quantized coefficients as the 12-bit sequential encode, so decodes must
    be bit-identical — the progressive encoder's per-scan derived tables
    absorb the wider magnitude categories with no special casing."""
    from covid19_spark.operators.jpeg import sniff_jpeg_frame

    rng = np.random.default_rng(9)
    base = rng.integers(0, 4096, (5, 7, 3), dtype=np.uint16)
    rgb12 = np.repeat(np.repeat(base, 8, axis=0), 8, axis=1)
    for kw in ({}, dict(subsampling="420"), dict(restart_interval=2)):
        seq = decode_jpeg(encode_jpeg(rgb12, quality=90, precision=12, **kw))
        prog_payload = encode_jpeg(
            rgb12, quality=90, precision=12, progressive=True, **kw
        )
        assert sniff_jpeg_frame(prog_payload)[:2] == (0xC2, 12)
        prog = decode_jpeg(prog_payload)
        assert prog.dtype == np.uint16
        assert np.array_equal(seq, prog), kw
    # the DC-only thumbnail path keeps the 12-bit dtype on progressive too
    dc = decode_jpeg(
        encode_jpeg(rgb12, quality=90, precision=12, progressive=True), dc_only=True
    )
    assert dc.dtype == np.uint16 and dc.shape == (5, 7, 3)


def test_lossless_high_precision_roundtrips_bit_exact():
    """SOF3 at the DICOM precisions: 12- and 16-bit samples round-trip
    bit-exactly through every predictor, including the mod-2^16 wrap case
    (category 16, no extra bits) that only appears above 8 bits."""
    from covid19_spark.operators.jpeg import encode_jpeg_lossless, sniff_jpeg_frame

    rng = np.random.default_rng(7)
    g16 = rng.integers(0, 65536, (23, 31), dtype=np.uint16)
    payload = encode_jpeg_lossless(g16, predictor=1)
    assert sniff_jpeg_frame(payload)[:2] == (0xC3, 16)
    out = decode_jpeg(payload)
    assert out.dtype == np.uint16
    assert np.array_equal(out[:, :, 0], g16)

    # 0/65535 alternation forces the ±32768 wrap on every sample
    alt = np.zeros((6, 8), dtype=np.uint16)
    alt[:, 1::2] = 65535
    for pred in range(1, 8):
        got = decode_jpeg(encode_jpeg_lossless(alt, predictor=pred))[:, :, 0]
        assert np.array_equal(got, alt), pred

    rgb12 = rng.integers(0, 4096, (9, 11, 3), dtype=np.uint16)
    p12 = encode_jpeg_lossless(rgb12, predictor=4, precision=12)
    assert sniff_jpeg_frame(p12)[:2] == (0xC3, 12)
    assert np.array_equal(decode_jpeg(p12), rgb12)

    # uint8 input keeps the 8-bit contract (dtype and Annex K table)
    g8 = rng.integers(0, 256, (12, 12), dtype=np.uint8)
    o8 = decode_jpeg(encode_jpeg_lossless(g8))
    assert o8.dtype == np.uint8 and np.array_equal(o8[:, :, 0], g8)

    with pytest.raises(ValueError, match="exceed"):
        encode_jpeg_lossless(rgb12, precision=8)
    with pytest.raises(ValueError, match="precision"):
        encode_jpeg_lossless(g8, precision=1)
