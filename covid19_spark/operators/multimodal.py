"""Multimodal (binary) column plumbing: images/audio/video as opaque BINARY
with typed metadata, processed via Arrow-batched ``mapInPandas``.

The container has no codec libraries, so the REAL decode paths are the
formats a pure-stdlib reader can handle: uncompressed 24-bpp BMP, full PNG
(all five color types incl. palette, depths 1-16, Adam7 interlace — the
chart format the reference serves, covid19-visualizer Visualizer.java:469,520 / ChartRequest.java:23),
baseline + progressive + lossless-SOF3 JPEG (operators/jpeg.py) plus
arithmetic-coded JPEG — the full ITU-T T.81 Annex D/E/F decoder+encoder in
operators/jpeg_arith.py (oracle-green `jpeg_entropy_matrix`) — TIFF
(incl. tiled + CCITT G3/G4), GIF, RIFF/WAVE audio (PCM 8/16/24/32-bit +
IEEE float + G.711 A-law/mu-law + IMA ADPCM), and Motion-JPEG AVI video
(RIFF container walk + per-frame JPEG decode, real frame sampling). The
seams that truly remain ``NotImplementedError`` (with deterministic fakes
for the test path) are compressed-audio-in-WAV (MP3/AAC payloads) and
inter-frame video codecs (H.264/VP9) — formats whose decoders are out of
pure-stdlib reach. Everything Spark-side is real and tested: schemas,
batch iteration, partition sizing, UDF signatures.

Scale design: media blobs dominate bytes, not rows — so (1) metadata-only
predicates must prune *before* any decode (keep metadata in top-level columns,
never inside the blob), (2) decode runs in ``mapInPandas`` so one Python
worker handles an Arrow batch at a time with bounded memory
(``maxRecordsPerBatch`` sized to blob size), and (3) outputs carry fixed-size
feature vectors, not re-encoded media, to keep the shuffle small.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("payload", T.BinaryType(), True),
    ]
)

IMAGE_FEATURES_SCHEMA = (
    "media_id long, mime string, width int, height int, n_bytes long, "
    "feature array<float>"
)


def encode_bmp(pixels: "np.ndarray") -> bytes:
    """Encode an (H, W, 3) uint8 RGB array as an uncompressed 24-bpp
    bottom-up BMP (BITMAPINFOHEADER). Pure numpy/struct — used by tests and
    the demo media synthesizer to produce REAL decodable payloads."""
    import struct

    arr = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = arr.shape
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    # bottom-up rows, BGR channel order, 4-byte row padding
    body = b"".join(
        arr[r, :, ::-1].tobytes() + b"\x00" * pad for r in range(h - 1, -1, -1)
    )
    pixel_offset = 14 + 40
    file_size = pixel_offset + len(body)
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, pixel_offset)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return header + info + body


def decode_bmp(payload: bytes) -> "np.ndarray":
    """Decode an uncompressed 24-bpp BMP (the one format a pure-numpy reader
    can handle without a codec library) to an (H, W, 3) uint8 RGB array.
    Handles bottom-up (positive height) and top-down (negative height) rows
    and 4-byte row padding; rejects compressed/paletted variants."""
    import struct

    if payload is None or len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    pixel_offset = struct.unpack_from("<I", payload, 10)[0]
    header_size = struct.unpack_from("<I", payload, 14)[0]
    if header_size < 40:
        raise NotImplementedError("BITMAPCOREHEADER BMPs not supported")
    w, h_raw = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"only uncompressed 24-bpp BMP supported (got bpp={bpp}, "
            f"compression={compression})"
        )
    top_down = h_raw < 0
    h = -h_raw if top_down else h_raw
    row_bytes = w * 3
    stride = row_bytes + ((-row_bytes) % 4)
    data = np.frombuffer(payload, dtype=np.uint8, count=stride * h, offset=pixel_offset)
    rows = data.reshape(h, stride)[:, :row_bytes].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR -> RGB


PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _paeth_predict(a: int, b: int, c: int) -> int:
    """PNG Paeth predictor (RFC 2083 §6.6): pick left/up/upper-left whichever
    is closest to the linear estimate a + b - c."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def encode_png(pixels: "np.ndarray", filter_type: int = 0) -> bytes:
    """Encode a uint8 array as an 8-bit PNG — pure stdlib (struct + zlib),
    no codec library. (H, W) → grayscale (color type 0), (H, W, 3) → RGB
    (type 2), (H, W, 4) → RGBA (type 6). ``filter_type`` applies one of the
    five PNG scanline filters to every row (0=None, 1=Sub, 2=Up, 3=Average,
    4=Paeth) — used by tests to exercise every unfilter path in
    ``decode_png``; 0 is the fastest to write."""
    import struct
    import zlib

    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        ctype, arr3 = 0, arr[:, :, None]
    elif arr.shape[2] == 3:
        ctype, arr3 = 2, arr
    elif arr.shape[2] == 4:
        ctype, arr3 = 6, arr
    else:
        raise ValueError(f"unsupported channel count {arr.shape[2]}")
    h, w, nch = arr3.shape
    if filter_type not in (0, 1, 2, 3, 4):
        raise ValueError(f"invalid PNG filter type {filter_type}")

    def left_of(cur: "np.ndarray") -> "np.ndarray":
        return np.concatenate([np.zeros(nch, dtype=np.int32), cur[:-nch]])

    lines = []
    prev = np.zeros(w * nch, dtype=np.int32)
    for r in range(h):
        cur = arr3[r].reshape(-1).astype(np.int32)
        if filter_type == 0:
            filt = cur
        elif filter_type == 1:
            filt = cur - left_of(cur)
        elif filter_type == 2:
            filt = cur - prev
        elif filter_type == 3:
            filt = cur - (left_of(cur) + prev) // 2
        else:  # Paeth — inherently sequential in the spec's byte order
            lo, filt = left_of(cur), np.empty_like(cur)
            lo_prev = left_of(prev)
            for i in range(len(cur)):
                filt[i] = cur[i] - _paeth_predict(int(lo[i]), int(prev[i]), int(lo_prev[i]))
        lines.append(bytes([filter_type]) + (filt & 0xFF).astype(np.uint8).tobytes())
        prev = cur
    raw = b"".join(lines)

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


# Adam7 pass grid: (x_origin, y_origin, x_step, y_step) per pass, RFC 2083
# §2.6 — each pass is an independently filtered reduced image.
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def _png_unfilter(
    raw: bytes, rpos: int, width: int, height: int, nch: int, depth: int
) -> "tuple[np.ndarray, int]":
    """Unfilter one (sub)image's scanlines starting at ``rpos`` → ``(samples,
    new_rpos)`` where samples is (height, width, nch) uint16 — per-channel
    sample values in the source bit depth (0..2^depth-1; 16-bit reduced to
    the high byte). Filter byte offsets use bpp = the spec's per-pixel byte
    count (min 1), which differs from nch for sub-byte and 16-bit depths."""
    bpp = max(1, (nch * depth) // 8)
    stride = (width * nch * depth + 7) // 8
    if rpos + (stride + 1) * height > len(raw):
        raise ValueError("PNG pixel data length mismatch")
    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for r in range(height):
        ftype = raw[rpos]
        line = np.frombuffer(raw, np.uint8, stride, rpos + 1).astype(np.int32)
        rpos += stride + 1
        if ftype == 0:
            cur = line
        elif ftype == 2:  # Up — vectorized (no within-row dependency)
            cur = (line + prev) & 0xFF
        elif ftype in (1, 3, 4):  # Sub/Average/Paeth — sequential in-row
            cur = np.zeros(stride, dtype=np.int32)
            for i in range(stride):
                a = cur[i - bpp] if i >= bpp else 0
                if ftype == 1:
                    pred = a
                elif ftype == 3:
                    pred = (a + int(prev[i])) // 2
                else:
                    c = int(prev[i - bpp]) if i >= bpp else 0
                    pred = _paeth_predict(a, int(prev[i]), c)
                cur[i] = (int(line[i]) + pred) & 0xFF
        else:
            raise ValueError(f"invalid PNG scanline filter {ftype}")
        out[r] = cur.astype(np.uint8)
        prev = cur
    if depth == 8:
        samples = out.reshape(height, width, nch).astype(np.uint16)
    elif depth == 16:
        # standard 16→8 reduction: the high byte of each big-endian sample
        samples = out[:, 0::2].reshape(height, width, nch).astype(np.uint16)
    else:  # 1/2/4-bit (gray or palette index): MSB-first packed samples
        bits = np.unpackbits(out, axis=1)  # (height, stride*8)
        groups = bits[:, : width * depth].reshape(height, width, depth)
        weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint16)
        samples = (groups * weights).sum(axis=2, dtype=np.uint16)[:, :, None]
    return samples, rpos


def decode_png(payload: bytes) -> "np.ndarray":
    """Decode a PNG to an (H, W, 3) uint8 RGB array — pure stdlib (struct +
    zlib + numpy), the format the reference actually serves for charts
    (covid19-visualizer Visualizer.java:469,520 requests "png" charts (ChartRequest.java:23)). Supports all five
    color types (0 gray → replicated, 2 RGB, 3 palette via PLTE, 4
    gray+alpha and 6 RGBA → alpha dropped), every legal bit depth
    (1/2/4/8/16; 16-bit reduced to the high byte), both interlace methods
    (none + Adam7 — each of the 7 passes is an independently filtered
    reduced image scattered onto the pass grid), all five scanline filters,
    CRC-validated chunks, multi-IDAT streams."""
    import struct
    import zlib

    if payload is None or len(payload) < 8 or payload[:8] != PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, ihdr, idat, plte = 8, None, [], None
    while pos + 12 <= len(payload):
        (ln,) = struct.unpack_from(">I", payload, pos)
        typ = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + ln]
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + ln)
        if zlib.crc32(typ + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {typ!r} CRC mismatch")
        if typ == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif typ == b"PLTE":
            plte = data
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
        pos += 12 + ln
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT chunks")
    w, h, depth, ctype, comp, filt, interlace = ihdr
    if comp != 0 or filt != 0:
        raise ValueError(f"invalid PNG compression/filter method ({comp}/{filt})")
    legal_depths = {0: (1, 2, 4, 8, 16), 2: (8, 16), 3: (1, 2, 4, 8), 4: (8, 16), 6: (8, 16)}
    if ctype not in legal_depths or depth not in legal_depths[ctype]:
        raise ValueError(
            f"invalid PNG depth/color-type combination (depth={depth}, color type={ctype})"
        )
    nch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ctype]
    raw = zlib.decompress(b"".join(idat))
    if interlace == 0:
        samples, rpos = _png_unfilter(raw, 0, w, h, nch, depth)
    elif interlace == 1:
        samples = np.zeros((h, w, nch), dtype=np.uint16)
        rpos = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue  # empty pass for small images: zero scanlines
            sub, rpos = _png_unfilter(raw, rpos, pw, ph, nch, depth)
            samples[y0::dy, x0::dx] = sub
    else:
        raise ValueError(f"invalid PNG interlace method {interlace}")
    if rpos != len(raw):
        raise ValueError("PNG pixel data length mismatch")
    if ctype == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE chunk")
        pal = np.frombuffer(plte, dtype=np.uint8)
        if len(pal) % 3 != 0:
            raise ValueError("PNG PLTE length not a multiple of 3")
        pal = pal.reshape(-1, 3)
        idx = samples[:, :, 0]
        if int(idx.max(initial=0)) >= len(pal):
            raise ValueError("PNG palette index out of range")
        return pal[idx].copy()
    if depth < 8:  # grayscale sub-byte: scale 0..2^depth-1 to 0..255 exactly
        samples = samples * (255 // ((1 << depth) - 1))
    px = samples.astype(np.uint8)
    if ctype == 0:
        return np.repeat(px, 3, axis=2).copy()
    if ctype == 4:  # gray+alpha: drop alpha, replicate gray
        return np.repeat(px[:, :, :1], 3, axis=2).copy()
    if ctype == 6:
        return px[:, :, :3].copy()
    return px.copy()


# --- GIF (GIF87a/GIF89a) — pure-stdlib LZW codec -----------------------------
#
# Web crawls are full of GIFs, so the multimodal decode path covers them for
# real: logical screen + global/local color tables, interlaced images, the
# 89a graphic-control extension (transparency honored, frames composited
# draw-over), and the variable-code-size LZW decompressor — all straight
# from the public GIF89a specification, no external tables. `encode_gif`
# is the deterministic round-trip twin (exact for images with <= 256
# distinct colors, which is all a GIF can hold).


def decode_gif_frames(payload: bytes):
    """Yield (delay_ms, (H, W, 3) uint8 RGB) per frame, composited onto the
    logical screen draw-over (disposal "do not dispose" semantics — the
    common animation case; restore-to-background clears the frame's own
    rect to the background color first). Transparent pixels keep the
    underlying canvas. Raises ValueError on corrupt streams."""
    import struct

    if payload is None or len(payload) < 13 or payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    w, h = struct.unpack_from("<HH", payload, 6)
    packed, bg_idx, _ar = payload[10], payload[11], payload[12]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload, np.uint8, 3 * n, pos).reshape(n, 3)
        pos += 3 * n
    canvas = np.zeros((h, w, 3), dtype=np.uint8)
    if gct is not None and bg_idx < len(gct):
        canvas[:, :] = gct[bg_idx]
    transparent = None
    delay_ms = 0
    disposal = 0
    prev_rect = None
    prev_disposal = 0
    while True:
        if pos >= len(payload):
            raise ValueError("corrupt GIF: missing trailer")
        b = payload[pos]
        pos += 1
        if b == 0x3B:  # trailer
            return
        if b == 0x21:  # extension
            if pos + 1 > len(payload):
                raise ValueError("corrupt GIF: truncated extension")
            label = payload[pos]
            pos += 1
            if label == 0xF9:  # graphic control
                if pos + 6 > len(payload) or payload[pos] != 4:
                    raise ValueError("corrupt GIF: bad graphic control block")
                flags = payload[pos + 1]
                delay_ms = struct.unpack_from("<H", payload, pos + 2)[0] * 10
                transparent = payload[pos + 4] if flags & 0x01 else None
                disposal = (flags >> 2) & 0x07
                pos += 5
            # skip remaining sub-blocks (any extension type)
            while True:
                if pos >= len(payload):
                    raise ValueError("corrupt GIF: truncated extension")
                ln = payload[pos]
                pos += 1
                if ln == 0:
                    break
                pos += ln
                if pos > len(payload):
                    raise ValueError("corrupt GIF: truncated extension")
            continue
        if b != 0x2C:  # image descriptor is the only other block type
            raise ValueError(f"corrupt GIF: unknown block {b:#x}")
        if pos + 9 > len(payload):
            raise ValueError("corrupt GIF: truncated image descriptor")
        ix, iy, iw, ih = struct.unpack_from("<HHHH", payload, pos)
        ipacked = payload[pos + 8]
        pos += 9
        if ix + iw > w or iy + ih > h or iw == 0 or ih == 0:
            raise ValueError("corrupt GIF: image rect outside logical screen")
        ct = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            if pos + 3 * n > len(payload):
                raise ValueError("corrupt GIF: truncated local color table")
            ct = np.frombuffer(payload, np.uint8, 3 * n, pos).reshape(n, 3)
            pos += 3 * n
        if ct is None:
            raise ValueError("corrupt GIF: no color table")
        if pos >= len(payload):
            raise ValueError("corrupt GIF: truncated image data")
        min_code = payload[pos]
        pos += 1
        if not 2 <= min_code <= 11:
            raise ValueError(f"corrupt GIF: LZW minimum code size {min_code}")
        data = bytearray()
        while True:
            if pos >= len(payload):
                raise ValueError("corrupt GIF: truncated image data")
            ln = payload[pos]
            pos += 1
            if ln == 0:
                break
            data += payload[pos : pos + ln]
            pos += ln
            if pos > len(payload):
                raise ValueError("corrupt GIF: truncated image data")
        indices = _gif_lzw_decode(bytes(data), min_code, iw * ih)
        idx = np.frombuffer(indices, np.uint8).reshape(ih, iw)
        if ipacked & 0x40:  # interlaced: 4-pass row order
            order = np.concatenate([
                np.arange(0, ih, 8), np.arange(4, ih, 8),
                np.arange(2, ih, 4), np.arange(1, ih, 2),
            ])
            deinter = np.empty_like(idx)
            deinter[order] = idx
            idx = deinter
        if idx.max(initial=0) >= len(ct):
            raise ValueError("corrupt GIF: pixel index outside color table")
        # A GCE's disposal method says how its OWN image is disposed after
        # display (GIF89a §23), so before drawing frame N we apply frame
        # N-1's disposal — not the current GCE's — to frame N-1's rect.
        if prev_disposal == 2 and prev_rect is not None:
            py, px_, ph_, pw_ = prev_rect
            canvas[py : py + ph_, px_ : px_ + pw_] = (
                gct[bg_idx] if gct is not None and bg_idx < len(gct) else 0
            )
        rect = canvas[iy : iy + ih, ix : ix + iw]
        rgb = ct[idx]
        if transparent is not None:
            mask = idx != transparent
            rect[mask] = rgb[mask]
        else:
            rect[:, :] = rgb
        prev_rect = (iy, ix, ih, iw)
        prev_disposal = disposal
        yield delay_ms, canvas.copy()
        transparent = None
        delay_ms = 0
        disposal = 0


def decode_gif(payload: bytes) -> "np.ndarray":
    """First composited frame of a GIF as (H, W, 3) uint8 RGB."""
    for _delay, frame in decode_gif_frames(payload):
        return frame
    raise ValueError("corrupt GIF: no image data")


def _gif_lzw_decode(data: bytes, min_code: int, expect: int) -> bytes:
    """GIF variable-code-size LZW: codes start at min_code+1 bits, the table
    grows to 4095 entries, CLEAR resets, EOI terminates. Little-endian bit
    packing per the spec."""
    clear = 1 << min_code
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0
    di = 0
    width = min_code + 1
    table = [bytes([i]) for i in range(clear)] + [b"", b""]
    next_code = eoi + 1  # the ENCODER's next free slot, tracked 1:1 (the
    # string for it lands one code later — classic LZW lag — but the WIDTH
    # follows this counter, not the lagged table length)
    prev = None
    while len(out) < expect:
        while nbits < width:
            if di >= len(data):
                raise ValueError("corrupt GIF: LZW stream exhausted")
            acc |= data[di] << nbits
            di += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code + 1
            next_code = eoi + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("corrupt GIF: LZW code before table entry")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < 4096:
                table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            if len(table) < 4096:
                table.append(entry)
        else:
            raise ValueError("corrupt GIF: LZW code out of range")
        out += entry
        prev = entry
        if next_code < 4096:
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
    if len(out) < expect:
        raise ValueError("corrupt GIF: pixel data short of image size")
    return bytes(out[:expect])


def encode_gif(pixels: "np.ndarray", delays_ms=None) -> bytes:
    """Encode one (H, W, 3) uint8 frame — or a list of same-size frames as
    an animation — as GIF89a with a shared palette built from the distinct
    colors (> 256 distinct colors raises: GIF is palette-bound; production
    quantizes first). Round-trips bit-exactly through ``decode_gif``."""
    import struct

    frames = pixels if isinstance(pixels, (list, tuple)) else [pixels]
    frames = [np.asarray(f, dtype=np.uint8) for f in frames]
    h, w = frames[0].shape[:2]
    if any(f.shape != (h, w, 3) for f in frames):
        raise ValueError("all GIF frames must be (H, W, 3) and same size")
    colors = np.unique(np.concatenate([f.reshape(-1, 3) for f in frames]), axis=0)
    if len(colors) > 256:
        raise ValueError(f"GIF needs <= 256 distinct colors (got {len(colors)})")
    depth = 1
    while (1 << depth) < max(len(colors), 2):
        depth += 1
    n = 1 << depth
    palette = np.zeros((n, 3), dtype=np.uint8)
    palette[: len(colors)] = colors
    lut = {tuple(c): i for i, c in enumerate(colors)}
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | (depth - 1), 0, 0])  # GCT present, bg 0, square px
    out += palette.tobytes()
    min_code = max(depth, 2)
    if delays_ms is None:
        delays_ms = [0] * len(frames)
    for f, delay in zip(frames, delays_ms):
        if len(frames) > 1 or delay:
            out += bytes([0x21, 0xF9, 4, 0x00]) + struct.pack("<H", delay // 10) + bytes([0, 0])
        out += bytes([0x2C]) + struct.pack("<HHHH", 0, 0, w, h) + bytes([0])
        idx = np.array(
            [lut[tuple(px)] for px in f.reshape(-1, 3)], dtype=np.uint16
        )
        out += bytes([min_code])
        lzw = _gif_lzw_encode(idx, min_code)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


def _gif_lzw_encode(indices: "np.ndarray", min_code: int) -> bytes:
    """Greedy longest-match LZW with CLEAR emitted first (decoder-friendly)
    and on table overflow, little-endian bit packing."""
    clear = 1 << min_code
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0
    width = min_code + 1

    def emit(code):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    emit(clear)
    prev = b""
    for v in indices:
        cur = prev + bytes([int(v)])
        if cur in table:
            prev = cur
            continue
        emit(table[prev])
        # the decoder grows its table one step behind the encoder: widen
        # AFTER emitting when the new entry fills the current width
        if next_code < 4096:
            table[cur] = next_code
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        else:
            emit(clear)  # table full: reset (emitted at the pre-reset width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code + 1
        prev = bytes([int(v)])
    if prev:
        emit(table[prev])
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# --- TIFF 6.0 baseline — pure-stdlib strip codec ------------------------------
#
# Scanned-document corpora ship as TIFF, so the decode path covers the
# baseline profile for real: both byte orders, RGB/grayscale/palette at 8
# or 16 bits per sample (16-bit decodes keep full uint16 precision —
# `image_features_from_pixels` is peak-aware), chunky AND separate-plane
# (PlanarConfiguration 2) strip organization, Compression 1 (none), 32773
# (PackBits) and 5 (LZW — MSB-first bit packing with the spec's "early
# change" code widening, the documented difference from GIF's LZW), and
# Predictor 2 (horizontal differencing, per-sample modulo the sample
# width). TILED organization (TIFF 6.0 §15, tags 322-325 — the layout of
# satellite/scan corpora) decodes through the same codec kernels over the
# tile geometry, with the predictor undone per tile (differencing restarts
# at each tile's left edge). Round 8 additions: new-style JPEG-in-TIFF
# (compression 7 + tag-347 JPEGTables merge, each chunk decoded by
# operators/jpeg), Adobe/old deflate (8/32946, stdlib zlib), sub-byte
# samples (1/2/4-bit bilevel/gray/palette, MSB-first row-aligned packing),
# and the CCITT fax codecs (compression 4 Group 4 T.6 MMR, compression 3
# Group 3 T.4 with EOLs incl. 2D mode via T4Options bit 0, compression 2
# 1D Modified Huffman — operators/ccitt.py, photometric-0 convention).
# `encode_tiff` is the round-trip twin (8/16-bit by dtype or bits=1|2|4,
# planar=1|2, strip or tiled, predictor 1|2, none/packbits/lzw/deflate/
# jpeg/g4/g3/g3_2d/mh). Old-style JPEG (compression 6, §22) decodes in
# ALL the forms real writers produced: a full interchange stream at tag
# 513, per-chunk SOI streams via the compression-7 path, and the
# tables-split variant (tags 519-521 raw tables + bare entropy strips,
# incl. tag-530 subsampling and tag-515 restarts — round 8). Remaining
# seams raising NotImplementedError: T.4 uncompressed mode, tiled or
# RGB-photometric tables-split JPEG, lossless JPEGProc, and
# non-power-of-two sample widths (e.g. 12-bit).

_TIFF_TAG_NAMES = {
    256: "width", 257: "height", 258: "bits", 259: "compression",
    262: "photometric", 273: "strip_offsets", 277: "spp",
    278: "rows_per_strip", 279: "strip_counts", 284: "planar",
    292: "t4_options", 317: "predictor", 320: "colormap",
    512: "jpeg_proc", 513: "jpeg_if", 514: "jpeg_if_len",
    515: "jpeg_restart", 519: "jpeg_q", 520: "jpeg_dc", 521: "jpeg_ac",
    530: "ycbcr_sub",
    322: "tile_width", 323: "tile_length", 324: "tile_offsets",
    325: "tile_counts", 347: "jpeg_tables",
}


def _tiff_read_ifd(payload: bytes, endian: str):
    import struct

    (ifd_off,) = struct.unpack_from(endian + "I", payload, 4)
    if ifd_off + 2 > len(payload):
        raise ValueError("corrupt TIFF: IFD offset out of range")
    (n_tags,) = struct.unpack_from(endian + "H", payload, ifd_off)
    tags = {}
    type_size = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 7: 1}
    type_fmt = {1: "B", 3: "H", 4: "I", 7: "B"}  # 7 = UNDEFINED (raw bytes)
    for i in range(n_tags):
        base = ifd_off + 2 + 12 * i
        if base + 12 > len(payload):
            raise ValueError("corrupt TIFF: truncated IFD")
        tag, typ, count = struct.unpack_from(endian + "HHI", payload, base)
        if tag not in _TIFF_TAG_NAMES or typ not in type_fmt:
            continue
        sz = type_size[typ] * count
        if sz <= 4:
            off = base + 8
        else:
            (off,) = struct.unpack_from(endian + "I", payload, base + 8)
        if off + sz > len(payload):
            raise ValueError("corrupt TIFF: tag value out of range")
        vals = struct.unpack_from(endian + str(count) + type_fmt[typ], payload, off)
        tags[_TIFF_TAG_NAMES[tag]] = list(vals)
    return tags


def _decode_old_jpeg_tables_split(payload, t, w, h, spp, photo, rows_per_strip):
    """TIFF 6.0 §22 tables-split old-style JPEG: rebuild one interchange
    stream per strip from the tag-pointed raw tables and the strip's bare
    entropy bytes, decode via operators/jpeg, and stack the strips.

    Table mapping per §22: JPEGQTables/JPEGDCTables/JPEGACTables each hold
    ONE offset per component; component ci is assigned quant/Huffman table
    id ci in the synthesized stream (writers shared chroma tables by
    pointing both chroma components at the same offset — duplicating the
    table under two ids is byte-identical decode-wise). Luma carries the
    tag-530 subsampling factors (spec default 2×2); JPEGRestartInterval
    (tag 515) becomes a DRI segment — the strip data then contains real
    RSTn markers, which the rebuilt stream's decoder consumes natively."""
    import struct

    from covid19_spark.operators.jpeg import decode_jpeg

    qoffs = t["jpeg_q"]
    dcoffs = t.get("jpeg_dc", [])
    acoffs = t.get("jpeg_ac", [])
    if len(qoffs) < spp or len(dcoffs) < spp or len(acoffs) < spp:
        raise ValueError("corrupt TIFF: tables-split JPEG missing per-component tables")

    def seg(marker, body):
        return struct.pack(">HH", marker, len(body) + 2) + body

    def huff_body(off, tc, th):
        if off + 17 > len(payload):
            raise ValueError("corrupt TIFF: JPEG Huffman table out of range")
        counts = payload[off : off + 16]
        n = sum(counts)
        if off + 16 + n > len(payload):
            raise ValueError("corrupt TIFF: JPEG Huffman table out of range")
        return bytes([(tc << 4) | th]) + counts + payload[off + 16 : off + 16 + n]

    tables = b""
    for ci in range(spp):
        qo = qoffs[ci]
        if qo + 64 > len(payload):
            raise ValueError("corrupt TIFF: JPEG quant table out of range")
        tables += seg(0xFFDB, bytes([ci]) + payload[qo : qo + 64])
    for ci in range(spp):
        tables += seg(0xFFC4, huff_body(dcoffs[ci], 0, ci))
        tables += seg(0xFFC4, huff_body(acoffs[ci], 1, ci))
    if t.get("jpeg_restart", [0])[0]:
        tables += seg(0xFFDD, struct.pack(">H", t["jpeg_restart"][0]))
    sub_h, sub_v = (t.get("ycbcr_sub", [2, 2]) + [2])[:2] if photo == 6 else (1, 1)

    def chunk_px(off, cnt, ch, cw, what):
        # one rebuilt interchange stream per chunk — strips and tiles share
        # everything but the declared SOF dimensions
        if off + cnt > len(payload):
            raise ValueError(f"corrupt TIFF: {what} out of range")
        sof = struct.pack(">BHHB", 8, ch, cw, spp)
        sos = bytes([spp])
        for ci in range(spp):
            hf, vf = (sub_h, sub_v) if (photo == 6 and ci == 0) else (1, 1)
            sof += bytes([ci + 1, (hf << 4) | vf, ci])
            sos += bytes([ci + 1, (ci << 4) | ci])
        sos += bytes([0, 63, 0])
        stream = (
            b"\xff\xd8" + tables + seg(0xFFC0, sof) + seg(0xFFDA, sos)
            + payload[off : off + cnt] + b"\xff\xd9"
        )
        px = decode_jpeg(stream)
        if px.shape[0] < ch or px.shape[1] < cw:
            raise ValueError(f"corrupt TIFF: {what} smaller than declared")
        return px[:ch, :cw]

    if "tile_offsets" in t:
        # tiled organization (TIFF 6.0 §15 framing over the same §22
        # kernel): every tile is a FULL tile_width x tile_length scan
        # (edge tiles padded by the writer), assembled in row-major grid
        # order and cropped to the declared image size.
        tw, tl = t["tile_width"][0], t["tile_length"][0]
        offs, cnts = t["tile_offsets"], t["tile_counts"]
        tiles_x, tiles_y = -(-w // tw), -(-h // tl)
        if len(offs) < tiles_x * tiles_y:
            raise ValueError("corrupt TIFF: tiles cover less than declared size")
        rows = []
        for ty in range(tiles_y):
            row = [
                chunk_px(
                    offs[ty * tiles_x + tx], cnts[ty * tiles_x + tx],
                    tl, tw, f"tile {ty * tiles_x + tx}",
                )
                for tx in range(tiles_x)
            ]
            rows.append(np.concatenate(row, axis=1))
        img = np.concatenate(rows, axis=0)[:h, :w]
    else:
        offs, cnts = t["strip_offsets"], t["strip_counts"]
        strips = []
        y = 0
        for si, (off, cnt) in enumerate(zip(offs, cnts)):
            strip_h = min(rows_per_strip, h - y)
            if strip_h <= 0:
                break
            strips.append(chunk_px(off, cnt, strip_h, w, f"strip {si}")[:, :w])
            y += strip_h
        if y < h:
            raise ValueError("corrupt TIFF: strips cover fewer rows than declared")
        img = np.concatenate(strips, axis=0)
    if photo == 6:
        return np.ascontiguousarray(img[:, :, :3])
    g = img[:, :, 0]
    if photo == 0:
        g = 255 - g
    return np.repeat(g[:, :, None], 3, axis=2)


def decode_tiff(payload: bytes) -> "np.ndarray":
    """Baseline TIFF (strip or tiled organization) → (H, W, 3) uint8 RGB
    (grayscale replicated, palette expanded). See the section comment for
    the supported profile."""
    import struct

    if payload is None or len(payload) < 8:
        raise ValueError("not a TIFF payload")
    if payload[:4] == b"II*\x00":
        endian = "<"
    elif payload[:4] == b"MM\x00*":
        endian = ">"
    else:
        raise ValueError("not a TIFF payload")
    t = _tiff_read_ifd(payload, endian)
    tiled = "tile_offsets" in t
    # old-style JPEG via tag 513 carries the whole image in ONE interchange
    # stream — many real writers omitted strip tags entirely
    old_jpeg_stream = (
        t.get("compression", [1])[0] == 6 and "jpeg_if" in t and not tiled
    )
    chunk_req = (
        ("tile_width", "tile_length", "tile_counts")
        if tiled
        else () if old_jpeg_stream else ("strip_offsets", "strip_counts")
    )
    for req in ("width", "height") + chunk_req:
        if req not in t:
            raise ValueError(f"corrupt TIFF: missing {req}")
    w, h = t["width"][0], t["height"][0]
    spp = t.get("spp", [1])[0]
    bits = t.get("bits", [8] * spp)
    comp = t.get("compression", [1])[0]
    photo = t.get("photometric", [1])[0]
    planar = t.get("planar", [1])[0]
    predictor = t.get("predictor", [1])[0]
    rows_per_strip = t.get("rows_per_strip", [h])[0] or h
    if planar not in (1, 2):
        raise ValueError(f"corrupt TIFF: unknown planar config {planar}")
    if any(b not in (1, 2, 4, 8, 16) for b in bits) or len(set(bits)) != 1:
        raise NotImplementedError(f"{bits}-bit TIFF samples not supported")
    sub_byte = bits[0] < 8
    if sub_byte:
        # bilevel/low-depth gray and palette scans (fax/archival corpora):
        # rows are bit-packed MSB-first and padded to a byte boundary per
        # strip/tile row (TIFF 6.0 §Image File Directory, BitsPerSample).
        # Single-sample images only — sub-byte RGB does not occur in the
        # wild and the spec's chunky packing for it is ambiguous.
        if spp != 1:
            raise NotImplementedError("sub-byte TIFF with multiple samples")
        if predictor == 2:
            raise NotImplementedError("predictor with sub-byte TIFF samples")
        if comp == 7:
            raise ValueError("corrupt TIFF: JPEG compression with sub-byte samples")
    deep = bits[0] == 16
    if comp not in (1, 2, 3, 4, 5, 32773, 6, 7, 8, 32946):
        raise NotImplementedError(
            f"TIFF compression {comp} needs a codec library (libtiff seam)"
        )
    if comp == 6:
        # Old-style JPEG-in-TIFF (TIFF 6.0 §22, deprecated by TechNote 2
        # for being underspecified). The form real writers produced — a
        # complete JFIF stream at tag 513 JPEGInterchangeFormat, or strips
        # that each start with SOI — decodes through operators/jpeg; the
        # tables-split variants (tags 519-521 without a full stream) stay
        # the documented seam.
        if "jpeg_if" in t:
            off = t["jpeg_if"][0]
            ln = t.get("jpeg_if_len", [len(payload) - off])[0]
            if off + ln > len(payload):
                raise ValueError("corrupt TIFF: JPEGInterchangeFormat out of range")
            from covid19_spark.operators.jpeg import decode_jpeg

            px = decode_jpeg(payload[off : off + ln])
            if px.ndim == 2:
                px = px[:, :, None]
            if px.shape[0] < h or px.shape[1] < w:
                raise ValueError("corrupt TIFF: old-JPEG stream smaller than declared")
            if photo in (2, 6):
                if px.shape[2] < 3:
                    raise ValueError("corrupt TIFF: old-JPEG missing color channels")
                return np.ascontiguousarray(px[:h, :w, :3])
            g = px[:h, :w, 0]
            if photo == 0:
                g = 255 - g
            return np.repeat(g[:, :, None], 3, axis=2)
        if "jpeg_q" in t:
            # §22 tables-split variant: tags 519/520/521 point at RAW table
            # data (64-byte zigzag quant tables; 16-count+values Huffman
            # tables, no DQT/DHT headers) and the strips carry BARE
            # entropy-coded scan data with no markers at all. Rebuild a
            # full interchange stream per strip/tile (SOI + synthesized
            # DQT/SOF0/DHT/DRI/SOS + chunk bytes + EOI) and decode through
            # operators/jpeg; the tiled organization is the same kernel
            # under §15 grid framing (full-size edge-padded tiles, cropped
            # after assembly). Real writers produced this for grayscale and
            # YCbCr (tag 530 subsampling, spec default 2×2); RGB-in-JPEG
            # (photometric 2) stays a seam — decode_jpeg's 3-component path
            # is YCbCr by JPEG convention and would mis-color it.
            if photo not in (0, 1, 6):
                raise NotImplementedError(
                    f"tables-split old-style JPEG with photometric {photo}"
                )
            if t.get("jpeg_proc", [1])[0] != 1:
                raise NotImplementedError(
                    "lossless old-style JPEG (JPEGProc != 1) not supported"
                )
            return _decode_old_jpeg_tables_split(
                payload, t, w, h, spp, photo, rows_per_strip
            )
        # No interchange stream and no split tables: fall through to the
        # per-chunk JPEG decode, which requires each strip/tile to be a
        # complete SOI stream (the required-tags check above already
        # guaranteed chunks exist); chunks without SOI fail there with
        # "JPEG strip missing SOI".
        comp = 7
    if comp in (2, 3, 4):
        # CCITT codecs (operators/ccitt.py): 2 = 1D Modified Huffman,
        # 3 = Group 3 T.4 with EOLs (T4Options bit 0 selects 2D lines),
        # 4 = Group 4 T.6 MMR. Bilevel only; the fax convention is
        # photometric 0 (0 = white), which the shared sub-byte tail then
        # maps to 255/0 gray.
        if bits[0] != 1 or spp != 1:
            raise ValueError(
                "corrupt TIFF: CCITT compression requires 1-bit single-sample data"
            )
        # T4Options (tag 292): bit 0 = 2D coding, bit 1 = uncompressed-mode
        # extension (decoded natively by operators/ccitt), bit 2 = fill
        # bits before EOL (the EOL scanner consumes leading zeros anyway)
        # — every defined bit is handled, so no option value is a seam.
    if predictor not in (1, 2):
        raise ValueError(f"corrupt TIFF: unknown predictor {predictor}")
    if comp == 7:
        # new-style JPEG-in-TIFF (TIFF TechNote 2): every strip/tile is a
        # JPEG stream decoded by operators/jpeg; tag 347 JPEGTables holds
        # shared DQT/DHT for abbreviated chunk streams. YCbCr (photo 6) is
        # the JPEG-internal color space — decode_jpeg already returns RGB.
        if deep:
            raise NotImplementedError("12-bit JPEG-in-TIFF not supported")
        if predictor == 2:
            raise ValueError("corrupt TIFF: predictor with JPEG compression")
        if photo == 2:
            # RGB-stored JPEG scans: decode_jpeg treats every 3-component
            # scan as YCbCr by JPEG convention, so an RGB-photometric
            # JPEG-in-TIFF would decode mis-colored. Same seam (and same
            # guard) as the tables-split old-JPEG path above.
            raise NotImplementedError("RGB-photometric JPEG-in-TIFF not supported")
    if photo not in (0, 1, 2, 3) and not (photo == 6 and comp == 7):
        raise NotImplementedError(f"TIFF photometric {photo} not supported")
    if photo in (2, 6) and spp < 3:
        raise ValueError("corrupt TIFF: RGB needs 3 samples per pixel")
    bps = 2 if deep else 1
    sample_dtype = np.dtype(endian + ("u2" if deep else "u1"))
    native_dtype = np.uint16 if deep else np.uint8
    # planar 1 (chunky): samples interleave within each chunk row.
    # planar 2 (separate): all plane-0 chunks, then plane-1, ... — each
    # chunk carries ONE sample plane.
    n_planes = spp if planar == 2 else 1
    row_samples = 1 if planar == 2 else spp

    def _decompress(chunk: bytes, want: int, what: str) -> bytes:
        if comp == 1:
            out = chunk[:want]
        elif comp == 32773:
            out = _packbits_decode(chunk, want)
        elif comp in (8, 32946):  # Adobe deflate / old deflate: zlib stream
            import zlib

            try:
                out = zlib.decompress(chunk)
            except zlib.error as exc:
                raise ValueError(f"corrupt TIFF: bad deflate {what}: {exc}") from exc
        else:
            out = _tiff_lzw_decode(chunk, want)
        if len(out) < want:
            raise ValueError(f"corrupt TIFF: {what} data short of image size")
        return out[:want]

    def _chunk_bytes(offsets, counts, ci: int, want: int, what: str) -> bytes:
        off, cnt = offsets[ci], counts[ci]
        if off + cnt > len(payload):
            raise ValueError(f"corrupt TIFF: {what} out of range")
        return _decompress(payload[off : off + cnt], want, what)

    jpeg_tables = bytes(t["jpeg_tables"]) if "jpeg_tables" in t else None

    def _fax_chunk(offsets, counts, ci: int, rows: int, cols: int, what: str):
        from covid19_spark.operators.ccitt import g3_decode, g4_decode, mh_decode

        off, cnt = offsets[ci], counts[ci]
        if off + cnt > len(payload):
            raise ValueError(f"corrupt TIFF: {what} out of range")
        chunk = payload[off : off + cnt]
        if comp == 4:
            return g4_decode(chunk, cols, rows)
        if comp == 3:
            two_d = bool(t.get("t4_options", [0])[0] & 0x1)
            return g3_decode(chunk, cols, rows, two_d=two_d)
        return mh_decode(chunk, cols, rows)

    def _jpeg_chunk(offsets, counts, ci: int, rows: int, cols: int, what: str):
        """Decode one JPEG-compressed strip/tile to a (rows, cols,
        row_samples) uint8 array. Abbreviated chunk streams (TechNote 2)
        are merged with the JPEGTables body: SOI + tables + chunk-after-SOI
        — a full per-chunk stream (JPEGTables absent) passes through."""
        from covid19_spark.operators.jpeg import decode_jpeg

        off, cnt = offsets[ci], counts[ci]
        if off + cnt > len(payload):
            raise ValueError(f"corrupt TIFF: {what} out of range")
        data = payload[off : off + cnt]
        if len(data) < 2 or data[:2] != b"\xff\xd8":
            raise ValueError(f"corrupt TIFF: JPEG {what} missing SOI")
        if jpeg_tables is not None and len(jpeg_tables) >= 4:
            if jpeg_tables[:2] != b"\xff\xd8":
                raise ValueError("corrupt TIFF: JPEGTables missing SOI")
            body = jpeg_tables[2:]
            if body.endswith(b"\xff\xd9"):
                body = body[:-2]
            data = b"\xff\xd8" + body + data[2:]
        px = decode_jpeg(data)
        if px.ndim == 2:
            px = px[:, :, None]
        if px.shape[0] < rows or px.shape[1] < cols or px.shape[2] < row_samples:
            raise ValueError(f"corrupt TIFF: JPEG {what} smaller than declared")
        return np.ascontiguousarray(px[:rows, :cols, :row_samples]).astype(native_dtype)

    def _undiff(a: "np.ndarray") -> "np.ndarray":
        # horizontal differencing is per sample, modulo the sample width;
        # axis 1 is the scanline axis of the (rows, cols, samples) block
        a = np.cumsum(a.astype(np.int64), axis=1)
        return (a & (0xFFFF if deep else 0xFF)).astype(native_dtype)

    def _unpack_rows(raw: bytes, rows: int, cols: int, rb: int) -> "np.ndarray":
        # sub-byte samples: MSB-first bit packing, each row padded to a
        # byte boundary of rb bytes → (rows, cols) raw sample values
        b = np.frombuffer(raw, np.uint8).reshape(rows, rb)
        bit = bits[0]
        if bit == 1:
            vals = np.unpackbits(b, axis=1)
        elif bit == 2:
            shifts = np.tile(np.array([6, 4, 2, 0], np.uint8), rb)
            vals = (np.repeat(b, 4, axis=1) >> shifts) & 0x3
        else:  # 4
            shifts = np.tile(np.array([4, 0], np.uint8), rb)
            vals = (np.repeat(b, 2, axis=1) >> shifts) & 0xF
        return vals[:, :cols].astype(np.uint8)

    if tiled:
        # TIFF 6.0 §15: the image is a grid of tw×th tiles, each compressed
        # independently and PADDED to full tile size at the right/bottom
        # edges; planar 2 stores all plane-0 tiles, then plane-1, ... The
        # predictor restarts at every tile's left edge (differencing runs
        # per tile scanline), so it must be undone per tile BEFORE assembly
        # — the one semantic difference from strips, which span the full
        # image width.
        tw, th = t["tile_width"][0], t["tile_length"][0]
        if tw == 0 or th == 0:
            raise ValueError("corrupt TIFF: zero tile dimensions")
        across, down = -(-w // tw), -(-h // th)
        tiles_per_plane = across * down
        n_tiles = len(t["tile_offsets"])
        if len(t["tile_counts"]) != n_tiles:
            raise ValueError("corrupt TIFF: tile offset/count mismatch")
        if n_tiles < tiles_per_plane * n_planes:
            raise ValueError("corrupt TIFF: too few tiles for image size")
        tile_rb = (tw * bits[0] + 7) // 8 if sub_byte else tw * row_samples * bps
        want = th * tile_rb
        plane_arrs = []
        for p in range(n_planes):
            canvas = np.zeros((down * th, across * tw, row_samples), native_dtype)
            for ti in range(tiles_per_plane):
                if comp == 7:
                    tile = _jpeg_chunk(
                        t["tile_offsets"], t["tile_counts"],
                        p * tiles_per_plane + ti, th, tw, "tile",
                    )
                elif comp in (2, 3, 4):
                    tile = _fax_chunk(
                        t["tile_offsets"], t["tile_counts"],
                        p * tiles_per_plane + ti, th, tw, "tile",
                    )[:, :, None]
                elif sub_byte:
                    raw = _chunk_bytes(
                        t["tile_offsets"], t["tile_counts"],
                        p * tiles_per_plane + ti, want, "tile",
                    )
                    tile = _unpack_rows(raw, th, tw, tile_rb)[:, :, None]
                else:
                    raw = _chunk_bytes(
                        t["tile_offsets"], t["tile_counts"],
                        p * tiles_per_plane + ti, want, "tile",
                    )
                    tile = np.frombuffer(raw, sample_dtype).reshape(th, tw, row_samples)
                    tile = _undiff(tile) if predictor == 2 else tile.astype(native_dtype)
                ty, tx = divmod(ti, across)
                canvas[ty * th : (ty + 1) * th, tx * tw : (tx + 1) * tw] = tile
            plane_arrs.append(canvas[:h, :w])
        arr = (
            np.concatenate(plane_arrs, axis=2) if planar == 2 else plane_arrs[0]
        )
    else:
        n_strips = len(t["strip_offsets"])
        if len(t["strip_counts"]) != n_strips:
            raise ValueError("corrupt TIFF: strip offset/count mismatch")
        strips_per_plane = -(-h // rows_per_strip)
        samples_per_row = w * row_samples
        row_bytes = (w * bits[0] + 7) // 8 if sub_byte else samples_per_row * bps
        if n_strips < strips_per_plane * n_planes:
            raise ValueError("corrupt TIFF: too few strips for image size")
        planes = []
        for p in range(n_planes):
            if comp in (2, 3, 4, 7):
                blocks = []
                for si in range(strips_per_plane):
                    strip_rows = min(rows_per_strip, h - si * rows_per_strip)
                    if comp == 7:
                        px = _jpeg_chunk(
                            t["strip_offsets"], t["strip_counts"],
                            p * strips_per_plane + si, strip_rows, w, "strip",
                        )
                    else:
                        px = _fax_chunk(
                            t["strip_offsets"], t["strip_counts"],
                            p * strips_per_plane + si, strip_rows, w, "strip",
                        )[:, :, None]
                    blocks.append(px.reshape(strip_rows, samples_per_row))
                planes.append(np.concatenate(blocks, axis=0))
                continue
            raw = bytearray()
            for si in range(strips_per_plane):
                strip_rows = min(rows_per_strip, h - si * rows_per_strip)
                raw += _chunk_bytes(
                    t["strip_offsets"], t["strip_counts"],
                    p * strips_per_plane + si, strip_rows * row_bytes, "strip",
                )
            if sub_byte:
                planes.append(_unpack_rows(bytes(raw), h, w, row_bytes))
            else:
                plane = np.frombuffer(bytes(raw), sample_dtype, h * samples_per_row)
                planes.append(plane.reshape(h, samples_per_row))
        if planar == 2:
            arr = np.stack(planes, axis=2)  # (h, w, spp)
        else:
            arr = planes[0].reshape(h, w, spp)
        arr = _undiff(arr) if predictor == 2 else arr.astype(native_dtype)
    peak = 0xFFFF if deep else 0xFF
    if photo in (2, 6):  # 6 = YCbCr, already RGB after the JPEG decode
        return np.ascontiguousarray(arr[:, :, :3])
    if photo == 3:
        if deep:
            raise NotImplementedError("16-bit palette TIFF not supported")
        n_colors = (1 << bits[0]) if sub_byte else 256
        cmap = t.get("colormap")
        if not cmap or len(cmap) < 3 * n_colors:
            raise ValueError("corrupt TIFF: palette image without colormap")
        # TIFF colormaps are 16-bit per channel, R then G then B planes
        cm = np.array(cmap[: 3 * n_colors], np.uint32).reshape(3, n_colors) >> 8
        return cm.T[arr[:, :, 0]].astype(np.uint8)
    gray = arr[:, :, 0]
    if sub_byte:
        # scale 0..2^bits-1 to full 8-bit range (exact: 255 divides evenly)
        sval = (1 << bits[0]) - 1
        if photo == 0:  # WhiteIsZero
            gray = sval - gray
        gray = (gray.astype(np.uint16) * (255 // sval)).astype(np.uint8)
    elif photo == 0:  # WhiteIsZero
        gray = peak - gray
    return np.repeat(gray[:, :, None], 3, axis=2)


def _packbits_decode(data: bytes, expect: int) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < expect:
        n = data[i]
        i += 1
        if n < 128:  # literal run of n+1 bytes
            if i + n + 1 > len(data):
                raise ValueError("corrupt TIFF: PackBits literal past end")
            out += data[i : i + n + 1]
            i += n + 1
        elif n > 128:  # repeat next byte 257-n times
            if i >= len(data):
                raise ValueError("corrupt TIFF: PackBits repeat past end")
            out += bytes([data[i]]) * (257 - n)
            i += 1
        # n == 128: no-op
    return bytes(out)


def _packbits_encode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        # find run length at i
        j = i
        while j + 1 < n and data[j + 1] == data[i] and j - i < 127:
            j += 1
        run = j - i + 1
        if run >= 2:
            out += bytes([257 - run, data[i]])
            i = j + 1
            continue
        # literal: extend until a run of >= 3 starts or 128 bytes
        j = i
        while j + 1 <= n - 1 and j - i < 127:
            if j + 2 < n and data[j + 1] == data[j + 2] and (
                j + 3 >= n or data[j + 3] == data[j + 1]
            ):
                break
            j += 1
        out += bytes([j - i]) + data[i : j + 1]
        i = j + 1
    return bytes(out)


def _tiff_lzw_decode(data: bytes, expect: int) -> bytes:
    """TIFF LZW (spec section 13): MSB-first bit packing, Clear=256,
    EOI=257, first free code 258, and EARLY code widening — the width
    bumps when the next free slot reaches 2^width - 1 (one code earlier
    than GIF's LZW; the spec's own documented quirk)."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    acc = 0
    nbits = 0
    di = 0
    width = 9
    table: list[bytes] = []
    next_code = 258
    prev = None

    def reset():
        nonlocal table, next_code, width, prev
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        next_code = 258
        width = 9
        prev = None

    reset()
    while len(out) < expect:
        while nbits < width:
            if di >= len(data):
                raise ValueError("corrupt TIFF: LZW stream exhausted")
            acc = (acc << 8) | data[di]
            di += 1
            nbits += 8
        code = (acc >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        if code == CLEAR:
            reset()
            continue
        if code == EOI:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("corrupt TIFF: LZW code before table entry")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if next_code < 4096:
                table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            if next_code < 4096:
                table.append(entry)
        else:
            raise ValueError("corrupt TIFF: LZW code out of range")
        out += entry
        prev = entry
        if next_code < 4096:
            next_code += 1
            if next_code == (1 << width) - 1 and width < 12:  # early change
                width += 1
    if len(out) < expect:
        raise ValueError("corrupt TIFF: LZW data short of strip size")
    return bytes(out[:expect])


def _tiff_lzw_encode(data: bytes) -> bytes:
    CLEAR, EOI = 256, 257
    out = bytearray()
    acc = 0
    nbits = 0
    width = 9

    def emit(code):
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8

    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    emit(CLEAR)
    prev = b""
    for b in data:
        cur = prev + bytes([b])
        if cur in table:
            prev = cur
            continue
        emit(table[prev])
        if next_code < 4094:
            table[cur] = next_code
            next_code += 1
            if next_code == (1 << width) - 1 and width < 12:  # early change
                width += 1
        else:
            emit(CLEAR)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        prev = bytes([b])
    if prev:
        emit(table[prev])
    emit(EOI)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def encode_tiff(
    pixels: "np.ndarray",
    compression: str = "none",
    rows_per_strip: int = 8,
    planar: int = 1,
    tile: "tuple[int, int] | None" = None,
    predictor: int = 1,
    jpeg_quality: int = 90,
    bits: "int | None" = None,
) -> bytes:
    """Encode (H, W, 3) RGB or (H, W) grayscale pixels as baseline
    little-endian TIFF — ``compression``: "none", "packbits",
    "lzw", "deflate" (Adobe deflate, compression 8: zlib per
    strip/tile), or "jpeg" (new-style JPEG-in-TIFF, compression 7: every
    strip/tile is a complete JPEG stream from ``operators/jpeg``; lossy,
    uint8 only, so the round-trip contract is pixel-equality with the
    per-chunk JPEG round-trip, not the raw input); uint8 input writes
    8-bit samples, uint16 writes 16-bit; ``planar=2`` writes separate
    sample planes (all R chunks, then G, then B); ``tile=(tw, th)``
    writes a TIFF 6.0 §15 tiled organization (tags 322-325, edge tiles
    zero-padded to full size) instead of strips; ``predictor=2`` applies
    horizontal differencing per strip/tile scanline (tag 317; not
    combinable with "jpeg"); ``bits=1|2|4`` writes sub-byte samples
    (bilevel/low-depth gray — the fax/archival scan depths) from 2D input
    whose values fit the depth, rows bit-packed MSB-first and padded to a
    byte boundary per strip/tile row. Lossless modes round-trip
    bit-exactly through ``decode_tiff`` (sub-byte gray reads back scaled
    to the full 8-bit range, e.g. 1-bit → 0/255)."""
    import struct

    comp_id = {
        "none": 1, "lzw": 5, "packbits": 32773, "jpeg": 7, "deflate": 8,
        "g4": 4, "mh": 2, "g3": 3, "g3_2d": 3, "g3_uncomp": 3,
    }.get(compression)
    if comp_id is None:
        raise ValueError(f"unsupported compression {compression!r}")
    if planar not in (1, 2):
        raise ValueError(f"planar must be 1 or 2 (got {planar})")
    if predictor not in (1, 2):
        raise ValueError(f"predictor must be 1 or 2 (got {predictor})")
    src = np.asarray(pixels)
    deep = src.dtype == np.uint16
    if comp_id == 7:
        if deep:
            raise ValueError("jpeg compression writes 8-bit samples only")
        if predictor == 2:
            raise ValueError("predictor is not combinable with jpeg compression")
    if bits is not None:
        if bits not in (1, 2, 4):
            raise ValueError(f"bits must be 1, 2 or 4 (got {bits})")
        if src.ndim != 2:
            raise ValueError("sub-byte encoding requires 2D grayscale input")
        if deep or comp_id == 7 or predictor == 2:
            raise ValueError("sub-byte samples: 8-bit input, no jpeg/predictor")
        if int(src.max(initial=0)) >= (1 << bits):
            raise ValueError(f"sample values exceed {bits}-bit range")
    if comp_id in (2, 3, 4) and bits != 1:
        raise ValueError(f"{compression} compression requires bits=1 bilevel input")
    arr = src.astype(np.uint16 if deep else np.uint8)
    gray = arr.ndim == 2
    arr3 = arr[:, :, None] if gray else arr
    h, w, spp = arr3.shape
    if spp not in (1, 3):
        raise ValueError(f"unsupported channel count {spp}")
    if planar == 2 and spp == 1:
        planar = 1  # single plane: chunky and separate are identical
    sample_bits = bits if bits is not None else (16 if deep else 8)
    # little-endian sample bytes match the II header
    le = arr3.astype("<u2") if deep else arr3

    def _compress(raw: bytes) -> bytes:
        if comp_id == 1:
            return raw
        if comp_id == 32773:
            return _packbits_encode(raw)
        if comp_id == 8:
            import zlib

            return zlib.compress(raw, 6)
        return _tiff_lzw_encode(raw)

    def _pack_rows(block2d: "np.ndarray") -> bytes:
        # MSB-first sub-byte packing, rows padded to a byte boundary
        rows, cols = block2d.shape
        per_byte = 8 // bits
        pad = (-cols) % per_byte
        if pad:
            block2d = np.pad(block2d, ((0, 0), (0, pad)))
        grouped = block2d.reshape(rows, -1, per_byte).astype(np.uint16)
        shifts = np.arange(per_byte - 1, -1, -1, dtype=np.uint16) * bits
        return (grouped << shifts).sum(axis=2).astype(np.uint8).tobytes()

    def _encode_block(block: "np.ndarray") -> bytes:
        # block is (rows, cols, s) in file sample order
        if comp_id == 7:
            from covid19_spark.operators.jpeg import encode_jpeg

            img = block[:, :, 0] if block.shape[2] == 1 else block
            return encode_jpeg(np.ascontiguousarray(img), quality=jpeg_quality)
        if comp_id in (2, 3, 4):
            from covid19_spark.operators.ccitt import g3_encode, g4_encode, mh_encode

            if comp_id == 4:
                return g4_encode(block[:, :, 0])
            if comp_id == 3:
                return g3_encode(
                    block[:, :, 0],
                    two_d=(compression == "g3_2d"),
                    uncompressed=(compression == "g3_uncomp"),
                )
            return mh_encode(block[:, :, 0])
        if bits is not None:
            return _compress(_pack_rows(block[:, :, 0]))
        return _compress(_maybe_diff(block).tobytes())

    def _maybe_diff(block: "np.ndarray") -> "np.ndarray":
        # horizontal differencing per scanline (axis 1), per sample channel
        if predictor != 2:
            return block
        d = block.astype(np.int64).copy()
        d[:, 1:] -= block.astype(np.int64)[:, :-1]
        return (d & (0xFFFF if deep else 0xFF)).astype("<u2" if deep else np.uint8)

    planes = (
        [le]
        if planar == 1
        else [np.ascontiguousarray(le[:, :, p : p + 1]) for p in range(spp)]
    )
    strips = []
    if tile is not None:
        tw, th = tile
        if tw <= 0 or th <= 0:
            raise ValueError(f"tile dims must be positive (got {tile})")
        across, down = -(-w // tw), -(-h // th)
        for pl in planes:
            padded = np.zeros((down * th, across * tw, pl.shape[2]), pl.dtype)
            padded[:h, :w] = pl
            for ty in range(down):
                for tx in range(across):
                    blk = padded[ty * th : (ty + 1) * th, tx * tw : (tx + 1) * tw]
                    strips.append(_encode_block(blk))
    else:
        for pl in planes:
            for y0 in range(0, h, rows_per_strip):
                strips.append(_encode_block(pl[y0 : y0 + rows_per_strip]))
    # new-style JPEG writes photometric 6 (YCbCr — the JPEG-internal color
    # space, per TechNote 2 / libtiff practice) for color, 1 for grayscale;
    # G4 writes the fax convention 0 (WhiteIsZero: sample 1 = black ink)
    if comp_id in (2, 3, 4):
        photometric = 0
    elif comp_id == 7:
        photometric = 6 if spp == 3 else 1
    else:
        photometric = 2 if spp == 3 else 1
    tags = [
        (256, 3, [w]), (257, 3, [h]), (258, 3, [sample_bits] * spp),
        (259, 3, [comp_id]), (262, 3, [photometric]),
        (277, 3, [spp]),
    ]
    if comp_id == 3:
        # T4Options: bit 0 = 2D coding, bit 1 = uncompressed mode in use
        tags.append(
            (292, 4, [1 if compression == "g3_2d"
                      else 2 if compression == "g3_uncomp" else 0])
        )
    if tile is not None:
        tags += [(322, 3, [tile[0]]), (323, 3, [tile[1]])]
    else:
        tags.append((278, 3, [rows_per_strip]))
    if predictor == 2:
        tags.append((317, 3, [2]))
    if planar == 2:
        tags.append((284, 3, [2]))
    n_tags = len(tags) + 2  # + strip/tile offsets/counts
    ifd_off = 8
    data_off = ifd_off + 2 + 12 * n_tags + 4
    # out-of-line tag data (bits for RGB, strip arrays) then strip data
    extra = bytearray()

    def tag_bytes(tag, typ, vals):
        nonlocal extra
        fmt = {3: "H", 4: "I"}[typ]
        sz = {3: 2, 4: 4}[typ] * len(vals)
        body = struct.pack("<" + str(len(vals)) + fmt, *vals)
        if sz <= 4:
            return struct.pack("<HHI", tag, typ, len(vals)) + body.ljust(4, b"\x00")
        off = data_off + len(extra)
        extra += body
        return struct.pack("<HHII", tag, typ, len(vals), off)

    # assemble twice: first pass to size `extra`, strips go after it
    entries = []
    for tag, typ, vals in tags:
        entries.append(tag_bytes(tag, typ, vals))
    strip_data_off = data_off + len(extra) + 8 * len(strips) * 0  # placeholder
    # strip offsets array is itself out-of-line when > 1 strip
    counts = [len(s) for s in strips]
    # reserve space for the two arrays if out-of-line
    arrays_sz = 0
    if len(strips) > 1:
        arrays_sz = 4 * len(strips) * 2
    strip_base = data_off + len(extra) + arrays_sz
    offsets = []
    acc_off = strip_base
    for c in counts:
        offsets.append(acc_off)
        acc_off += c
    entries.append(tag_bytes(324 if tile is not None else 273, 4, offsets))
    entries.append(tag_bytes(325 if tile is not None else 279, 4, counts))
    entries.sort(key=lambda e: struct.unpack("<H", e[:2])[0])
    out = bytearray(b"II*\x00" + struct.pack("<I", ifd_off))
    out += struct.pack("<H", n_tags)
    for e in entries:
        out += e
    out += struct.pack("<I", 0)  # next IFD
    out += extra
    for s in strips:
        out += s
    return bytes(out)


def decode_image(payload: bytes) -> "np.ndarray":
    """Real decode path: pure-stdlib readers for uncompressed 24-bpp BMP,
    full PNG (gray/RGB/palette/alpha, depths 1-16, Adam7 — the chart format
    the reference serves), baseline + progressive + lossless JPEG
    (operators/jpeg.py — tables read from the stream's own DQT/DHT), and
    GIF87a/89a (LZW, interlace, transparency — first composited frame), and
    baseline TIFF (both byte orders; none/PackBits/LZW strips, predictor 2,
    RGB/gray/palette);
    anything else needs a codec library the container doesn't ship (a
    production build plugs Pillow/turbojpeg into the fall-through)."""
    if payload is not None and len(payload) >= 2 and payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload is not None and len(payload) >= 8 and payload[:8] == PNG_SIG:
        return decode_png(payload)
    if payload is not None and len(payload) >= 2 and payload[:2] == b"\xff\xd8":
        from covid19_spark.operators.jpeg import decode_jpeg

        return decode_jpeg(payload)
    if payload is not None and len(payload) >= 6 and payload[:6] in (b"GIF87a", b"GIF89a"):
        return decode_gif(payload)
    if payload is not None and len(payload) >= 4 and payload[:4] in (b"II*\x00", b"MM\x00*"):
        return decode_tiff(payload)
    raise NotImplementedError(
        "no codec for non-BMP/PNG/JPEG/GIF/TIFF image formats in this environment"
    )


def decode_image_with_peak(payload: bytes) -> "tuple[np.ndarray, float]":
    """``(pixels, sample_peak)`` — ``decode_image`` plus the true peak
    sample value the decode can produce, for [0, 1]-normalized feature
    extraction. Dtype alone cannot carry this: a 12-bit JPEG decodes to
    uint16 with peak 4095, and normalizing it by 65535 shrinks mean-RGB
    features ~16x and collapses the gray histogram into the lowest buckets
    (advisor finding, round 8). JPEG is the only format here whose
    precision is not implied by the output dtype, and its SOF precision
    field is an O(header) marker-walk sniff; every other codec's peak is
    the dtype max."""
    pixels = decode_image(payload)
    if (
        payload is not None
        and len(payload) >= 2
        and payload[:2] == b"\xff\xd8"
        and pixels.dtype != np.uint8
    ):
        from covid19_spark.operators.jpeg import sniff_jpeg_frame

        _, precision, _, _ = sniff_jpeg_frame(payload)
        return pixels, float((1 << precision) - 1)
    if pixels.dtype.kind in "iu":
        return pixels, float(np.iinfo(pixels.dtype).max)
    return pixels, 255.0


def image_features_from_pixels(
    pixels: "np.ndarray", dim: int = 8, peak: float | None = None
) -> np.ndarray:
    """Fixed-width features from DECODED pixels: mean R/G/B (scaled to [0,1])
    plus a (dim-3)-bucket grayscale histogram, L2-normalized — the
    deterministic stand-in for a CNN embedding on the real-decode path.
    Precision-aware: for deep decodes (uint16 — e.g. 12-bit SOF1 / 12-16
    bit SOF3 JPEG) pass the sample ``peak`` (4095 for 12-bit; default
    65535 for uint16, full-range 16-bit convention) and the [0, 1]
    contract holds at any depth. The uint8 path (peak 255) is bit-identical
    to the historical formula; dtype alone cannot distinguish 12- from
    16-bit data in a uint16 array, hence the explicit parameter."""
    src = np.asarray(pixels)
    if peak is None:
        peak = (
            float(np.iinfo(src.dtype).max) if src.dtype.kind in "iu" else 255.0
        )
    arr = src.astype(np.float32)
    means = arr.reshape(-1, 3).mean(axis=0) / peak
    gray_f = arr.mean(axis=2)
    if peak != 255.0:
        gray_f = gray_f * (255.0 / peak)
    gray = gray_f.astype(np.uint8).reshape(-1)
    n_hist = dim - 3
    hist = np.histogram(gray, bins=n_hist, range=(0, 256))[0]
    feat = np.concatenate([means, hist.astype(np.float32)])
    norm = float(np.linalg.norm(feat))
    return (feat / norm if norm > 0 else feat).astype(np.float32)


def fake_image_features(payload: bytes, dim: int = 8) -> np.ndarray:
    """Deterministic fake feature extractor for tests: byte-histogram folded
    to ``dim`` buckets, L2-normalized. Stands in for a CNN embedding."""
    if payload is None or len(payload) == 0:
        return np.zeros(dim, dtype=np.float32)
    counts = np.bincount(np.frombuffer(payload, dtype=np.uint8), minlength=256)
    folded = counts.reshape(dim, 256 // dim).sum(axis=1).astype(np.float32)
    norm = float(np.linalg.norm(folded))
    return folded / norm if norm > 0 else folded


def _classify_decode_error(exc: Exception) -> str:
    """Stable, low-cardinality error label for the permissive decode path:
    ``"unsupported: <msg>"`` for documented codec seams
    (NotImplementedError), ``"corrupt: <msg>"`` for malformed payloads —
    bounded length so the error column stays groupable at scale."""
    kind = "unsupported" if isinstance(exc, NotImplementedError) else "corrupt"
    return f"{kind}: {str(exc)[:120]}"


def _check_on_error(on_error: str) -> None:
    if on_error not in ("fail", "permissive"):
        raise ValueError(
            f"on_error must be 'fail' or 'permissive' (got {on_error!r})"
        )


def extract_image_features(
    media: DataFrame, use_fake: bool = True, on_error: str = "fail"
) -> DataFrame:
    """Per-blob feature extraction via ``mapInPandas`` (Arrow batches).

    Metadata-only columns pass through untouched; only the payload column is
    read inside Python. ``use_fake=False`` is the REAL path: decode the blob
    (pure-numpy BMP reader; other formats raise where a production codec
    plugs in) and featurize the decoded pixels.

    ``on_error``: ``"fail"`` (default) lets a decode error fail the task —
    correct for curated corpora where a bad blob means a pipeline bug.
    ``"permissive"`` is the 100 TB-crawl contract: a corrupt or
    unsupported payload yields ``feature = NULL`` plus an ``error`` string
    column (appended to the schema ONLY in this mode, so default callers
    see the identical schema as before) instead of killing the job — at
    scale one bad blob per billion is a certainty, not an anomaly, and a
    job that dies at 99% on it wastes the whole cluster pass. Decode
    errors stay per-row observable (`WHERE error IS NOT NULL`), never
    silently dropped."""
    _check_on_error(on_error)
    permissive = on_error == "permissive"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats, errs = [], []
            for p in pdf["payload"]:
                try:
                    if use_fake:
                        feats.append(fake_image_features(p))
                    else:
                        px, peak = decode_image_with_peak(p)
                        feats.append(image_features_from_pixels(px, peak=peak))
                    errs.append(None)
                except Exception as exc:  # noqa: BLE001 — policy boundary
                    if not permissive:
                        raise
                    feats.append(None)
                    errs.append(_classify_decode_error(exc))
            out = {
                "media_id": pdf["media_id"],
                "mime": pdf["mime"],
                "width": pdf["width"],
                "height": pdf["height"],
                "n_bytes": pdf["payload"].map(lambda b: 0 if b is None else len(b)),
                "feature": [None if f is None else f.tolist() for f in feats],
            }
            if permissive:
                out["error"] = errs
            yield pd.DataFrame(out)

    schema = IMAGE_FEATURES_SCHEMA + (", error string" if permissive else "")
    return media.mapInPandas(batches, schema=schema)


def encode_mjpeg_avi(
    frames: "list[np.ndarray]", fps: int = 10, quality: int = 85
) -> bytes:
    """Encode a list of (H, W, 3) uint8 frames as a Motion-JPEG AVI — pure
    stdlib RIFF assembly over the module's own JPEG encoder. The one video
    container a no-codec-library environment can produce AND consume for
    real (every frame is a baseline JPEG)."""
    import struct

    from covid19_spark.operators.jpeg import encode_jpeg

    if not frames:
        raise ValueError("cannot encode an empty AVI")
    h, w = frames[0].shape[:2]
    payloads = [encode_jpeg(f, quality=quality) for f in frames]

    def chunk(cid: bytes, data: bytes) -> bytes:
        pad = b"\x00" if len(data) % 2 else b""
        return cid + struct.pack("<I", len(data)) + data + pad

    def lst(four: bytes, data: bytes) -> bytes:
        return chunk(b"LIST", four + data)

    us_per_frame = int(round(1_000_000 / fps))
    avih = struct.pack(
        "<IIIIIIIIII4I",
        us_per_frame, 0, 0, 0x10, len(frames), 0, 1, 0, w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIiI4h", 0, 0, 0, 0, 1, fps, 0, len(frames), 0, -1, 0, 0, 0, 0, 0)
    )
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0)
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = lst(b"movi", b"".join(chunk(b"00dc", p) for p in payloads))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi_frames(payload: bytes) -> "tuple[list[bytes], float]":
    """Parse a Motion-JPEG AVI into ``(frame payloads, fps)`` — pure stdlib
    RIFF walk: avih gives the frame period, the movi LIST holds one
    00dc/00db chunk per frame (each a complete JPEG, decodable by
    ``operators/jpeg.decode_jpeg``). Unknown chunks are skipped;
    non-MJPEG streams raise NotImplementedError (the codec-library seam
    for real H.264/VP9 containers)."""
    import struct

    if payload is None or len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")
    fps = 0.0
    frames_by_stream: dict[int, list[bytes]] = {}
    n_streams = 0
    video_stream: int | None = None  # strh order defines the NNdc prefix

    def walk(buf: bytes, pos: int, end: int) -> None:
        nonlocal fps, n_streams, video_stream
        while pos + 8 <= end:
            cid = buf[pos : pos + 4]
            (ln,) = struct.unpack_from("<I", buf, pos + 4)
            body_start, body_end = pos + 8, pos + 8 + ln
            if body_end > end:
                raise ValueError("corrupt AVI: truncated chunk")
            if cid == b"LIST":
                walk(buf, body_start + 4, body_end)
            elif cid == b"avih":
                if ln < 4:
                    raise ValueError("corrupt AVI: short avih")
                (uspf,) = struct.unpack_from("<I", buf, body_start)
                fps = 1_000_000 / uspf if uspf else 0.0
            elif cid == b"strh":
                # streams are numbered in strh order; the frame chunks of
                # stream N carry the two-digit prefix f"{N:02d}" — don't
                # assume the video stream is stream 0 (an audio-first AVI
                # puts its video frames in 01dc chunks)
                if buf[body_start : body_start + 4] == b"vids":
                    if ln < 8:
                        raise ValueError("corrupt AVI: short vids strh")
                    if buf[body_start + 4 : body_start + 8] not in (b"MJPG", b"mjpg"):
                        raise NotImplementedError(
                            "only MJPEG AVI video decodes without a codec library"
                        )
                    if video_stream is None:
                        video_stream = n_streams
                n_streams += 1
            elif len(cid) == 4 and cid[2:4] in (b"dc", b"db") and cid[:2].isdigit():
                frames_by_stream.setdefault(int(cid[:2]), []).append(
                    buf[body_start:body_end]
                )
            pos = body_end + (ln & 1)

    walk(payload, 12, len(payload))
    if video_stream is None:
        if n_streams == 0 and 0 in frames_by_stream:
            # headerless/minimal AVI with bare 00dc chunks: keep the old
            # tolerance (frames are self-describing JPEGs) — only files that
            # DECLARE streams must declare a video one
            video_stream = 0
        else:
            raise ValueError("corrupt AVI: no video stream declared")
    frames = frames_by_stream.get(video_stream, [])
    if not frames:
        raise ValueError("corrupt AVI: no video frames")
    return frames, fps


def _sampled_avi_frames(payload: bytes, every_ms: int):
    """Yield ``(frame_ts_ms, frame_index, jpeg_bytes)`` along the sampled
    timeline — the SINGLE sampling arithmetic (fps fallback, inclusive
    duration bound, index clamp) that feature extraction AND per-frame
    hashing share: ``video_near_dup_pairs`` aligns videos on the sample
    rank, so the two consumers must never drift apart."""
    if every_ms <= 0:
        raise ValueError(f"every_ms must be positive (got {every_ms})")
    frames, fps = decode_avi_frames(payload)
    if fps <= 0:
        fps = 10.0
    duration_ms = int(len(frames) * 1000 / fps)
    ts = 0
    while ts <= duration_ms:
        idx = min(int(ts * fps / 1000), len(frames) - 1)
        yield ts, idx, frames[idx]
        ts += every_ms


def video_frame_features(
    payload: bytes, every_ms: int, dim: int = 8
) -> "list[tuple[int, int, np.ndarray]]":
    """Real video path: decode the MJPEG AVI, sample one frame per
    ``every_ms`` of timeline, decode each sampled JPEG and featurize its
    pixels. Returns [(frame_ts_ms, frame_index, feature)]."""
    from covid19_spark.operators.jpeg import decode_jpeg

    return [
        (ts, idx, image_features_from_pixels(decode_jpeg(jpeg), dim))
        for ts, idx, jpeg in _sampled_avi_frames(payload, every_ms)
    ]


VIDEO_FRAME_SCHEMA = (
    "media_id long, frame_ts_ms long, frame_index int, feature array<float>"
)


def extract_video_frames(
    media: DataFrame,
    every_ms: int = 1000,
    dim: int = 8,
    use_fake: bool = True,
    on_error: str = "fail",
) -> DataFrame:
    """Sampled-frame feature extraction for video rows via ``mapInPandas``:
    metadata (kind) prunes before any decode; the real path parses the
    MJPEG AVI container and decodes each sampled frame with the module's
    own JPEG decoder; the fake path derives deterministic features from
    the payload bytes + timestamp (same output schema).

    ``on_error="permissive"``: an undecodable container/frame yields ONE
    sentinel row for the blob (``frame_ts_ms``/``frame_index``/``feature``
    NULL, ``error`` set) instead of failing the task — the blob stays
    observable in the output rather than silently vanishing. The error is
    container-granular: MJPEG frames share the container's coding tables,
    so a bad frame means a bad blob, not a salvageable remainder."""
    if every_ms <= 0:
        raise ValueError(f"every_ms must be positive (got {every_ms})")
    _check_on_error(on_error)
    permissive = on_error == "permissive"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, tss, idxs, feats, errs = [], [], [], [], []
            for mid, payload, dur in zip(
                pdf["media_id"], pdf["payload"], pdf["duration_ms"]
            ):
                start = len(ids)
                try:
                    if use_fake:
                        dur = int(dur) if dur is not None and not pd.isna(dur) else 0
                        for ts in range(0, dur + 1, every_ms):
                            ids.append(mid)
                            tss.append(ts)
                            idxs.append(ts // max(every_ms, 1))
                            feats.append(
                                fake_image_features(
                                    (payload or b"") + ts.to_bytes(4, "little"), dim
                                ).tolist()
                            )
                            errs.append(None)
                    else:
                        for ts, idx, feat in video_frame_features(
                            payload, every_ms, dim
                        ):
                            ids.append(mid)
                            tss.append(ts)
                            idxs.append(idx)
                            feats.append(feat.tolist())
                            errs.append(None)
                except Exception as exc:  # noqa: BLE001 — policy boundary
                    if not permissive:
                        raise
                    # drop any partial frames from this blob: one sentinel row
                    del ids[start:], tss[start:], idxs[start:], feats[start:]
                    del errs[start:]
                    ids.append(mid)
                    tss.append(None)
                    idxs.append(None)
                    feats.append(None)
                    errs.append(_classify_decode_error(exc))
            out = {
                "media_id": ids,
                "frame_ts_ms": pd.array(tss, dtype="Int64"),
                "frame_index": pd.array(idxs, dtype="Int32"),
                "feature": feats,
            }
            if permissive:
                out["error"] = errs
            yield pd.DataFrame(out)

    schema = VIDEO_FRAME_SCHEMA + (", error string" if permissive else "")
    return media.filter(F.col("kind") == "video").mapInPandas(
        batches, schema=schema
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one row per (media_id, frame_ts_ms) —
    computed declaratively with ``sequence``/``explode`` so the expensive
    decode fan-out is an ordinary distributed transform. The decode itself
    is ``extract_video_frames`` (real for MJPEG AVI)."""
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.coalesce(F.col("duration_ms"), F.lit(0)), F.lit(every_ms))
            ).alias("frame_ts_ms"),
        )
    )


RESIZED_SCHEMA = "media_id long, mime string, width int, height int, payload binary"

AUDIO_FEATURES_SCHEMA = (
    "media_id long, mime string, duration_ms long, n_bytes long, "
    "n_windows int, feature array<float>"
)


def fake_resize(payload: bytes, target_w: int, target_h: int) -> bytes:
    """Deterministic fake resize: fold/repeat the byte stream to exactly
    ``target_w*target_h`` bytes. Stands in for a real interpolating resize;
    preserves the binary-in → binary-out contract and output sizing."""
    size = target_w * target_h
    if payload is None or len(payload) == 0:
        return bytes(size)
    arr = np.frombuffer(payload, dtype=np.uint8)
    reps = -(-size // len(arr))  # ceil division
    return bytes(np.tile(arr, reps)[:size])


def resize_images(media: DataFrame, target_w: int, target_h: int, use_fake: bool = True) -> DataFrame:
    """Batch image resize via ``mapInPandas``: binary in → binary out with
    the metadata columns REWRITTEN to the target dimensions (metadata lives
    outside the blob, so downstream pruning still never decodes). The real
    path raises where a codec-backed resize plugs in; output payload size is
    exactly ``target_w*target_h`` per row either way, keeping the shuffle
    footprint predictable."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not use_fake:
                decode_image(None)  # raises NotImplementedError at task level
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "width": target_w,
                    "height": target_h,
                    "payload": [fake_resize(p, target_w, target_h) for p in pdf["payload"]],
                }
            )

    return media.filter(F.col("kind") == "image").mapInPandas(batches, schema=RESIZED_SCHEMA)


def _area_resize(gray: "np.ndarray", out_h: int, out_w: int) -> "np.ndarray":
    """Deterministic area-mean resize via an integral image — the fixed
    downsampling step of the perceptual hash (no interpolation libraries)."""
    h, w = gray.shape
    if h < out_h:
        gray = np.repeat(gray, -(-out_h // h), axis=0)
        h = gray.shape[0]
    if w < out_w:
        gray = np.repeat(gray, -(-out_w // w), axis=1)
        w = gray.shape[1]
    ii = np.zeros((h + 1, w + 1), dtype=np.float64)
    ii[1:, 1:] = gray.cumsum(axis=0).cumsum(axis=1)
    # integer bin edges (floor of i*h/out_h): strictly increasing whenever
    # h >= out_h (guaranteed by the repeat above) — np.round's banker's
    # rounding could produce equal neighbors, i.e. an empty bin
    ys = (np.arange(out_h + 1) * h) // out_h
    xs = (np.arange(out_w + 1) * w) // out_w
    out = np.empty((out_h, out_w), dtype=np.float64)
    for r in range(out_h):
        y0, y1 = ys[r], ys[r + 1]
        area_rows = ii[y1] - ii[y0]
        widths = (xs[1:] - xs[:-1]) * (y1 - y0)
        out[r] = (area_rows[xs[1:]] - area_rows[xs[:-1]]) / np.maximum(widths, 1)
    return out


def dhash_pixels(pixels: "np.ndarray", hash_size: int = 8) -> int:
    """Difference hash (dHash) of decoded pixels: grayscale → area-resize to
    (hash_size, hash_size+1) → horizontal gradient sign bits → signed int64
    (bit 63 as the sign bit, matching the SimHash storage convention so the
    banded Hamming probe operates on plain BIGINT columns). Robust to
    re-encoding, mild noise, and rescaling — the standard perceptual
    near-dup key for image corpora.

    ``hash_size`` is pinned to 8: the downstream 4 x 16-bit banded probe
    assumes EXACTLY 64 bits — more would overflow the int64 packing, fewer
    would zero out whole sub-bands and turn the band self-join into a
    near cross join."""
    if hash_size != 8:
        raise ValueError(
            "hash_size must be 8: the 64-bit banded Hamming probe assumes "
            "exactly 8x8 gradient bits"
        )
    arr = np.asarray(pixels, dtype=np.float64)
    gray = arr.mean(axis=2) if arr.ndim == 3 else arr
    small = _area_resize(gray, hash_size, hash_size + 1)
    bits = (small[:, 1:] > small[:, :-1]).reshape(-1)
    v = 0
    for i, b in enumerate(bits):
        if b:
            v |= 1 << i
    return v - (1 << 64) if v >= (1 << 63) else v


def image_dhash(
    media: DataFrame,
    use_fake: bool = True,
    hash_size: int = 8,
    on_error: str = "fail",
) -> DataFrame:
    """``(media_id, dhash)`` per image row via ``mapInPandas`` — real path
    decodes the payload (BMP/PNG/JPEG), fake path hashes a deterministic
    pixel grid derived from the payload bytes (same schema).

    Deliberately does NOT use the DC thumbnail decode that
    ``video_frame_hashes`` rides: an image corpus mixes formats, and a
    JPEG hashed from its 1/8-scale DC image does not match its BMP/PNG
    twin hashed at full resolution (measured: Hamming 19 on identical
    content) — cross-format near-dup detection requires every image to
    hash through the SAME resolution path. Video can use the DC path
    because frames only ever compare against other frames decoded the
    same way. The full JPEG decode is ~3x faster since the LUT entropy
    decoder, so the consistency choice stays cheap."""

    def _real_pixels(payload):
        return decode_image(payload)

    _check_on_error(on_error)
    permissive = on_error == "permissive"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            hashes = []
            for payload in pdf["payload"]:
                try:
                    if use_fake:
                        raw = np.frombuffer(payload or b"\x00", dtype=np.uint8)
                        side = max(int(len(raw) ** 0.5), 1)
                        grid = np.resize(raw, (side, side)).astype(np.float64)
                        hashes.append(dhash_pixels(grid, hash_size))
                    else:
                        hashes.append(dhash_pixels(_real_pixels(payload), hash_size))
                except Exception:  # noqa: BLE001 — policy boundary
                    if not permissive:
                        raise
                    # NULL hash, not a dropped row: the bad blob stays
                    # countable downstream, and the near-dup probe filters
                    # nulls before banding.
                    hashes.append(None)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "dhash": pd.array(hashes, dtype="Int64"),
                }
            )

    return media.filter(F.col("kind") == "image").mapInPandas(
        batches, schema="media_id long, dhash long"
    )


def image_near_dup_pairs(
    hash_df: DataFrame,
    id_col: str = "media_id",
    max_hamming: int = 10,
    max_bucket: int | None = 10_000,
    dropped_report: list | None = None,
) -> DataFrame:
    """Perceptual near-duplicate candidate pairs over a dHash frame: the
    64-bit hashes ride the SAME banded Hamming probe as SimHash text dedup
    (4 x 16-bit sub-bands). Pigeonhole guarantee holds only for Hamming
    <= 3 (a distance-4 pair can spread one bit per band and never meet);
    pairs at 4..max_hamming are recalled probabilistically — this is a
    CANDIDATE generator, not a certifier. One thin self-join, never O(n²)
    over the image corpus; ``max_bucket`` guards the common degenerate case
    (black/constant images all share a sub-band key — see
    ``drop_oversized_buckets``)."""
    from covid19_spark.operators.dedup import simhash_candidate_pairs

    return simhash_candidate_pairs(
        # NULL hashes are permissive-mode decode failures: not bandable,
        # excluded here so they never masquerade as a degenerate bucket.
        hash_df.filter(F.col("dhash").isNotNull()).select(
            F.col(id_col), F.col("dhash").alias("simhash")
        ),
        id_col,
        max_hamming=max_hamming,
        max_bucket=max_bucket,
        dropped_report=dropped_report,
    )


def video_frame_hashes(
    media: DataFrame,
    every_ms: int = 1000,
    hash_size: int = 8,
    decode_path: str = "auto",
    on_error: str = "fail",
) -> DataFrame:
    """``(media_id, frame_rank, dhash)`` — one perceptual hash per sampled
    video frame (real MJPEG-AVI decode; ``frame_rank`` is the 0-based index
    in the sample sequence, the alignment key for video-to-video
    comparison). Shares ``_sampled_avi_frames`` with the feature extractor
    so the two timelines can never drift. Map-only mapInPandas, metadata
    prunes before decode.

    Frames decode via ``decode_jpeg_dc`` — the DC-only 1/8-scale block-mean
    image (VERDICT r05 task #3): dHash area-means down to 8x9 anyway, and
    block means ARE an area-mean, so the hash sees the same signal while
    the decoder skips AC materialization + IDCT + color upsampling
    (measured ~5x per frame). The DC path only engages when the DC image
    covers the dHash grid (frame >= 8*hash_size tall and
    8*(hash_size+1) wide — below that the 1/8-scale image UNDERSAMPLES the
    hash and recall collapses; measured: planted-pair recall 20/40 on
    32x24 frames vs 40/40 on 80x64); smaller frames take the full decode,
    itself ~3x faster since the LUT entropy decoder. ``test_multimodal.py``
    pins DC-path/full-decode pair-set equality on the registry corpus.

    ``decode_path`` (r06 ADVICE): ``"auto"`` picks per frame by the size
    threshold above — correct when near-dup candidates share a size class,
    the normal video case (re-encodes keep resolution). But a DC-hashed
    frame and a full-decode-hashed frame of the SAME content land ~19 bits
    apart (the measured cross-path inconsistency of ``image_dhash``), so a
    corpus whose near-dup pairs STRADDLE the threshold (e.g. originals next
    to downscaled copies) silently loses recall under "auto". For such
    mixed-resolution corpora pass ``"full"`` (every frame full-decodes —
    consistent at any size) or ``"dc"`` (every frame DC-decodes — fastest,
    but small frames undersample the hash grid)."""
    from covid19_spark.operators.jpeg import (
        decode_jpeg,
        decode_jpeg_dc,
        peek_jpeg_dims,
    )

    if every_ms <= 0:
        raise ValueError(f"every_ms must be positive (got {every_ms})")
    if decode_path not in ("auto", "dc", "full"):
        raise ValueError(
            f"decode_path must be 'auto', 'dc', or 'full' (got {decode_path!r})"
        )
    min_h, min_w = 8 * hash_size, 8 * (hash_size + 1)

    _check_on_error(on_error)
    permissive = on_error == "permissive"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, ranks, hashes = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                start = len(ids)
                try:
                    for rank, (_ts, _idx, jpeg) in enumerate(
                        _sampled_avi_frames(payload, every_ms)
                    ):
                        fh, fw = peek_jpeg_dims(jpeg)
                        use_dc = decode_path == "dc" or (
                            decode_path == "auto" and fh >= min_h and fw >= min_w
                        )
                        px = decode_jpeg_dc(jpeg) if use_dc else decode_jpeg(jpeg)
                        ids.append(mid)
                        ranks.append(rank)
                        hashes.append(dhash_pixels(px, hash_size))
                except Exception:  # noqa: BLE001 — policy boundary
                    if not permissive:
                        raise
                    # container-granular NULL sentinel (see extract_video_frames)
                    del ids[start:], ranks[start:], hashes[start:]
                    ids.append(mid)
                    ranks.append(None)
                    hashes.append(None)
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "frame_rank": pd.array(ranks, dtype="Int32"),
                    "dhash": pd.array(hashes, dtype="Int64"),
                }
            )

    return media.filter(F.col("kind") == "video").mapInPandas(
        batches, schema="media_id long, frame_rank int, dhash long"
    )


def video_near_dup_pairs(
    frame_hash_df: DataFrame,
    id_col: str = "media_id",
    max_hamming: int = 10,
    min_matching_frames: int = 3,
    max_bucket: int | None = 10_000,
    dropped_report: list | None = None,
) -> DataFrame:
    """Video-level near-duplicates from per-frame perceptual hashes: frames
    align on ``frame_rank`` and candidate-join via the 4 x 16-bit sub-band
    probe keyed by (rank, band, key) — a pair of videos never meets unless
    some aligned frame pair shares an exact sub-band, so the join stays
    thin at corpus scale (the shuffle carries |videos| x frames x 4 thin
    rows, never video pairs; ``max_bucket`` drops degenerate
    (rank, band, key) groups — black/constant frames at the same rank hash
    identically across a large corpus fraction — see
    ``drop_oversized_buckets``). A pair verifies when
    >= ``min_matching_frames`` aligned frames are within ``max_hamming``
    bits (recall guaranteed only for per-frame Hamming <= 3 — the 4-band
    pigeonhole bound — and probabilistic above). Output:
    (doc_a, doc_b, matching_frames, mean_hamming)."""
    from covid19_spark.operators.dedup import (
        drop_oversized_buckets,
        hamming_band_keys,
    )

    bands = hamming_band_keys("dhash")
    banded = (
        # NULL frame hashes are permissive-mode sentinels — not bandable.
        frame_hash_df.filter(F.col("dhash").isNotNull())
        .select(id_col, "frame_rank", "dhash", F.explode(bands).alias("bb"))
        .select(id_col, "frame_rank", "dhash", "bb.band", "bb.key")
    )
    banded = drop_oversized_buckets(
        banded, ["frame_rank", "band", "key"], max_bucket, dropped_report
    )
    a, b = banded.alias("a"), banded.alias("b")
    ham = F.bit_count(F.col("a.dhash").bitwiseXOR(F.col("b.dhash")))
    frame_pairs = (
        a.join(
            b,
            (F.col("a.frame_rank") == F.col("b.frame_rank"))
            & (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            F.col("a.frame_rank").alias("frame_rank"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["doc_a", "doc_b", "frame_rank"])
    )
    return (
        frame_pairs.groupBy("doc_a", "doc_b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("matching_frames"),
            F.round(F.avg("hamming"), 4).alias("mean_hamming"),
        )
        .filter(F.col("matching_frames") >= min_matching_frames)
    )


def encode_wav(
    samples: "np.ndarray", sample_rate: int = 16000, dtype: str = "i16"
) -> bytes:
    """Encode PCM samples as a RIFF/WAVE file — pure stdlib (struct).
    ``samples``: int16 array, (n,) mono or (n, channels). ``dtype`` picks
    the container depth: ``i16`` (default), ``i24``/``i32`` (the int16
    signal shifted into the wider word — decodes to the SAME normalized
    float, x/32768, bit-exactly), or ``f32``/``f64`` IEEE float (format 3,
    storing x/32768 exactly: an int16 over 2^15 is exactly representable).
    Deterministic; exists so tests and synthesizers can produce REAL
    decodable audio at every PCM depth the decoder supports."""
    import struct

    arr = np.asarray(samples, dtype=np.int16)
    if arr.ndim == 1:
        arr = arr[:, None]
    n, ch = arr.shape
    if dtype == "i16":
        audio_fmt, bits, data = 1, 16, arr.astype("<i2").tobytes()
    elif dtype == "i24":
        v = (arr.astype("<i4") << 8).tobytes()
        b = np.frombuffer(v, np.uint8).reshape(-1, 4)
        audio_fmt, bits, data = 1, 24, b[:, :3].tobytes()
    elif dtype == "i32":
        audio_fmt, bits, data = 1, 32, (arr.astype("<i4") << 16).tobytes()
    elif dtype == "f32":
        audio_fmt, bits = 3, 32
        data = (arr.astype(np.float32) / np.float32(32768.0)).astype("<f4").tobytes()
    elif dtype == "f64":
        audio_fmt, bits = 3, 64
        data = (arr.astype(np.float64) / 32768.0).astype("<f8").tobytes()
    else:
        raise ValueError(f"dtype must be i16/i24/i32/f32/f64 (got {dtype!r})")
    step = bits // 8
    byte_rate = sample_rate * ch * step
    fmt = struct.pack("<HHIIHH", audio_fmt, ch, sample_rate, byte_rate, ch * step, bits)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def encode_wav_g711(
    samples: "np.ndarray", law: str = "mulaw", sample_rate: int = 8000
) -> bytes:
    """Encode float samples in [-1, 1] as a G.711 companded RIFF/WAVE file
    (format 6 = A-law, 7 = mu-law, always 8-bit). Mono or (n, channels);
    test/synthesizer twin of the format-6/7 decode path."""
    import struct

    fmt_code = {"alaw": 6, "mulaw": 7}[law]
    arr = np.asarray(samples, dtype=np.float32)
    if arr.ndim == 1:
        arr = arr[:, None]
    _n, ch = arr.shape
    data = g711_encode(arr.reshape(-1), law)
    byte_rate = sample_rate * ch
    fmt = struct.pack("<HHIIHH", fmt_code, ch, sample_rate, byte_rate, ch, 8)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _g711_tables() -> "tuple[np.ndarray, np.ndarray]":
    """256-entry expansion tables for the ITU-T G.711 companded encodings,
    built from the public expansion formulas (A-law: invert the 0x55 XOR
    mask, reassemble segment+mantissa; mu-law: bias-132 exponential).
    Output float32 in [-1, 1] (linear range ±32256 / ±32124 over 32768)."""
    alaw = np.empty(256, np.float32)
    mulaw = np.empty(256, np.float32)
    for code in range(256):
        a = code ^ 0x55
        t = (a & 0x0F) << 4
        seg = (a & 0x70) >> 4
        if seg == 0:
            t += 8
        elif seg == 1:
            t += 0x108
        else:
            t = (t + 0x108) << (seg - 1)
        alaw[code] = (t if a & 0x80 else -t) / 32768.0
        u = ~code & 0xFF
        m = (((u & 0x0F) << 3) + 0x84) << ((u & 0x70) >> 4)
        mulaw[code] = ((0x84 - m) if u & 0x80 else (m - 0x84)) / 32768.0
    return alaw, mulaw


_ALAW_TABLE, _MULAW_TABLE = _g711_tables()


def g711_encode(samples: "np.ndarray", law: str) -> bytes:
    """Compand float samples in [-1, 1] to 8-bit G.711 codes ("alaw" or
    "mulaw") — nearest-codeword search against the expansion table (exact
    inverse of the decode path by construction; the segmented bit-twiddling
    encoder is equivalent but this form cannot drift from the table).
    Test/synthesizer helper for producing REAL format-6/7 WAV payloads."""
    table = {"alaw": _ALAW_TABLE, "mulaw": _MULAW_TABLE}[law]
    order = np.argsort(table)
    flat = np.clip(np.asarray(samples, np.float32).reshape(-1), -1.0, 1.0)
    idx = np.searchsorted(table[order], flat)
    idx = np.clip(idx, 1, 255)
    left, right = table[order][idx - 1], table[order][np.clip(idx, 0, 255)]
    pick = np.where(np.abs(flat - left) <= np.abs(right - flat), idx - 1, idx)
    return order[pick].astype(np.uint8).tobytes()


# IMA/DVI ADPCM (public spec; WAV format 0x11): 89-entry step-size table and
# the 16-entry index-adjustment table, per the IMA Digital Audio Pack (1992).
_IMA_STEPS = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37, 41,
    45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173, 190,
    209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658, 724,
    796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066, 2272,
    2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894, 6484, 7132,
    7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289, 16818, 18500,
    20350, 22385, 24623, 27086, 29794, 32767,
], dtype=np.int32)
_IMA_INDEX_ADJ = np.array(
    [-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int32
)


def _ima_decode_nibbles(nibbles, predictor: int, index: int) -> "tuple[list[int], int, int]":
    """Decode a sequence of 4-bit IMA ADPCM codes given the running
    predictor/step-index state; returns (samples, predictor, index).
    Sequential by construction (each sample feeds the next prediction) —
    per-block Python loop, invoked from Arrow-batched kernels only."""
    out = []
    for nib in nibbles:
        step = int(_IMA_STEPS[index])
        diff = step >> 3
        if nib & 1:
            diff += step >> 2
        if nib & 2:
            diff += step >> 1
        if nib & 4:
            diff += step
        predictor = predictor - diff if nib & 8 else predictor + diff
        predictor = max(-32768, min(32767, predictor))
        index = max(0, min(88, index + int(_IMA_INDEX_ADJ[nib])))
        out.append(predictor)
    return out, predictor, index


def _decode_ima_adpcm(data: bytes, ch: int, block_align: int) -> "np.ndarray":
    """IMA ADPCM 'data' chunk → float32 samples (n, ch) in [-1, 1]. Blocks
    are independent (each carries its own predictor/step-index header), so
    a corrupt tail only loses its own block. Stereo interleaves 4-byte
    nibble groups per channel within each block (IMA spec layout)."""
    samples_per_ch: list[list[int]] = [[] for _ in range(ch)]
    for bstart in range(0, len(data) - (len(data) % block_align), block_align):
        block = data[bstart : bstart + block_align]
        preds, idxs = [], []
        for c in range(ch):
            h = block[c * 4 : c * 4 + 4]
            pred = int.from_bytes(h[0:2], "little", signed=True)
            idxs.append(max(0, min(88, h[2])))
            preds.append(pred)
            samples_per_ch[c].append(pred)  # header predictor IS sample 0
        body = block[4 * ch :]
        # nibble stream: groups of 4 bytes per channel, round-robin
        per_ch_nibbles: list[list[int]] = [[] for _ in range(ch)]
        for g in range(0, len(body), 4 * ch):
            for c in range(ch):
                for b in body[g + 4 * c : g + 4 * c + 4]:
                    per_ch_nibbles[c].append(b & 0x0F)
                    per_ch_nibbles[c].append(b >> 4)
        for c in range(ch):
            dec, _p, _i = _ima_decode_nibbles(per_ch_nibbles[c], preds[c], idxs[c])
            samples_per_ch[c].extend(dec)
    n = min(len(s) for s in samples_per_ch) if ch else 0
    arr = np.stack([np.array(s[:n], np.float32) for s in samples_per_ch], axis=1)
    return arr / 32768.0


#: Microsoft ADPCM predictor coefficient pairs and delta adaptation table —
#: the canonical constants of the public RIFF/WAVE format-2 specification
#: (shipped in every fmt-chunk extension; kept here as the default set).
_MS_ADPCM_COEFFS = (
    (256, 0), (512, -256), (0, 0), (192, 64), (240, 0), (460, -208), (392, -232)
)
_MS_ADPCM_ADAPT = (
    230, 230, 230, 230, 307, 409, 512, 614, 768, 614, 512, 409, 307, 230, 230, 230
)


def _decode_ms_adpcm(
    data: bytes, ch: int, block_align: int, coeffs
) -> "np.ndarray":
    """Microsoft ADPCM (WAV format 0x02) 'data' chunk → float32 (n, ch) in
    [-1, 1]. Per block and channel: a predictor index into the coefficient
    pairs, an initial delta, and the two seed samples (iSamp2 is older and
    emits first); each 4-bit code then reconstructs
    ``((s1·c1 + s2·c2) >> 8) + signed_nibble·delta`` with the public
    16-entry delta adaptation. Blocks are independent — corruption loses
    only its own block. Stereo alternates channels per nibble."""
    samples_per_ch: list[list[int]] = [[] for _ in range(ch)]
    for bstart in range(0, len(data) - len(data) % block_align, block_align):
        block = data[bstart : bstart + block_align]
        pred = list(block[:ch])
        if any(p >= len(coeffs) for p in pred):
            raise ValueError("corrupt WAV: MS ADPCM predictor out of range")
        off = ch
        delta = [
            int.from_bytes(block[off + 2 * c : off + 2 * c + 2], "little", signed=True)
            for c in range(ch)
        ]
        off += 2 * ch
        s1 = [
            int.from_bytes(block[off + 2 * c : off + 2 * c + 2], "little", signed=True)
            for c in range(ch)
        ]
        off += 2 * ch
        s2 = [
            int.from_bytes(block[off + 2 * c : off + 2 * c + 2], "little", signed=True)
            for c in range(ch)
        ]
        off += 2 * ch
        for c in range(ch):
            samples_per_ch[c].append(s2[c])
            samples_per_ch[c].append(s1[c])
        i = 0
        for b in block[off:]:
            for nib in (b >> 4, b & 0x0F):
                c = i % ch
                i += 1
                c1, c2 = coeffs[pred[c]]
                predicted = (s1[c] * c1 + s2[c] * c2) >> 8
                signed = nib - 16 if nib >= 8 else nib
                new = max(-32768, min(32767, predicted + signed * delta[c]))
                s2[c], s1[c] = s1[c], new
                delta[c] = max(16, (_MS_ADPCM_ADAPT[nib] * delta[c]) >> 8)
                samples_per_ch[c].append(new)
    n = min(len(s) for s in samples_per_ch) if ch else 0
    arr = np.stack([np.array(s[:n], np.float32) for s in samples_per_ch], axis=1)
    return arr / 32768.0


def encode_wav_ms_adpcm(
    samples: "np.ndarray", sample_rate: int = 8000, block_samples: int = 500
) -> bytes:
    """Encode mono int16 samples as a Microsoft ADPCM (format 0x02)
    RIFF/WAVE file — the test/synthesizer twin of the format-2 decode path.
    Per block the encoder trials all 7 standard predictors and keeps the
    one with least total quantization error (the reference strategy);
    nibbles quantize the prediction error against the adapting delta via
    the SAME update arithmetic the decoder runs. Writes the full fmt
    extension (samplesPerBlock, the 7 coefficient pairs) and a 'fact'
    chunk so partial final blocks decode to the exact input length."""
    import struct

    arr = np.asarray(samples, dtype=np.int16).reshape(-1)
    if block_samples < 4:
        raise ValueError("block_samples must be at least 4")
    nib_per_block = block_samples - 2  # two seed samples ride the header
    if nib_per_block % 2:
        raise ValueError("block_samples must be even")
    block_align = 7 + nib_per_block // 2
    out = bytearray()
    for bstart in range(0, len(arr), block_samples):
        blk = [int(v) for v in arr[bstart : bstart + block_samples]]
        if len(blk) < 2:
            blk += [blk[-1] if blk else 0] * (2 - len(blk))
        best = None
        for pi, (c1, c2) in enumerate(_MS_ADPCM_COEFFS):
            s2_0, s1_0 = blk[0], blk[1]
            deltas = [abs(blk[i] - ((blk[i - 1] * c1 + blk[i - 2] * c2) >> 8))
                      for i in range(2, len(blk))]
            # mean |prediction error| can exceed int16 range for full-swing
            # alternating input (e.g. ±32767 square wave) — clamp so the
            # '<h' header pack cannot raise; the adaptive loop recovers the
            # effective step within a few samples either way
            delta0 = min(max(16, (sum(deltas) // max(len(deltas), 1)) or 16), 32767)
            s1, s2, delta = s1_0, s2_0, delta0
            nibs = []
            err_total = 0
            for i in range(2, len(blk)):
                predicted = (s1 * c1 + s2 * c2) >> 8
                err = blk[i] - predicted
                nib = max(-8, min(7, int(round(err / delta))))
                code = nib & 0x0F
                new = max(-32768, min(32767, predicted + nib * delta))
                err_total += abs(blk[i] - new)
                s2, s1 = s1, new
                delta = max(16, (_MS_ADPCM_ADAPT[code] * delta) >> 8)
                nibs.append(code)
            if best is None or err_total < best[0]:
                best = (err_total, pi, delta0, nibs)
        _, pi, delta0, nibs = best
        nibs = nibs + [0] * (nib_per_block - len(nibs))
        out += bytes([pi])
        out += struct.pack("<hhh", delta0, blk[1], blk[0])
        for i in range(0, len(nibs), 2):
            out += bytes([(nibs[i] << 4) | nibs[i + 1]])
    byte_rate = sample_rate * block_align // block_samples
    coef_ext = b"".join(struct.pack("<hh", c1, c2) for c1, c2 in _MS_ADPCM_COEFFS)
    fmt = struct.pack(
        "<HHIIHHHHH", 0x02, 1, sample_rate, byte_rate, block_align, 4,
        4 + 4 * len(_MS_ADPCM_COEFFS), block_samples, len(_MS_ADPCM_COEFFS),
    ) + coef_ext
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"fact" + struct.pack("<II", 4, len(arr))
    body += b"data" + struct.pack("<I", len(out)) + bytes(out)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def encode_wav_ima_adpcm(
    samples: "np.ndarray", sample_rate: int = 8000, block_samples: int = 505
) -> bytes:
    """Encode mono int16 samples as an IMA ADPCM (format 0x11) RIFF/WAVE
    file — the test/synthesizer twin of the format-17 decode path. Standard
    greedy encoder: per block, sample 0 goes in the header verbatim, each
    later sample quantizes its prediction error to the 4-bit code whose
    decode lands nearest (encode and decode share the step tables, so
    round-trip error is bounded by the step size)."""
    import struct

    arr = np.asarray(samples, dtype=np.int16).reshape(-1)
    nib_per_block = block_samples - 1
    if nib_per_block % 8:
        raise ValueError("block_samples - 1 must be a multiple of 8")
    block_align = 4 + nib_per_block // 2
    out = bytearray()
    pred_state, index_state = 0, 0
    for bstart in range(0, len(arr), block_samples):
        blk = arr[bstart : bstart + block_samples]
        if len(blk) == 0:
            break
        pred_state = int(blk[0])
        out += struct.pack("<hBB", pred_state, index_state, 0)
        nibbles = []
        for s in blk[1:]:
            step = int(_IMA_STEPS[index_state])
            diff = int(s) - pred_state
            nib = 0
            if diff < 0:
                nib |= 8
                diff = -diff
            if diff >= step:
                nib |= 4
                diff -= step
            if diff >= step >> 1:
                nib |= 2
                diff -= step >> 1
            if diff >= step >> 2:
                nib |= 1
            dec, pred_state, index_state = _ima_decode_nibbles(
                [nib], pred_state, index_state
            )
            nibbles.append(nib)
        nibbles += [0] * (nib_per_block - len(nibbles))
        for i in range(0, len(nibbles), 2):
            out.append(nibbles[i] | (nibbles[i + 1] << 4))
    byte_rate = sample_rate * block_align // block_samples
    fmt = struct.pack(
        "<HHIIHHHH", 0x11, 1, sample_rate, byte_rate, block_align, 4, 2, block_samples
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    # 'fact' chunk: true sample count. The final block zero-pads to a full
    # nibble body, so without it a decoder returns the padded length — a
    # 100-sample signal came back as 505 samples (r06 ADVICE); decode_wav
    # trims compressed-format output to this count.
    body += b"fact" + struct.pack("<II", 4, len(arr))
    body += b"data" + struct.pack("<I", len(out)) + bytes(out)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> "tuple[np.ndarray, int]":
    """Decode a RIFF/WAVE file to ``(samples, sample_rate)`` — samples as
    float32 in [-1, 1], shape (n, channels). Pure stdlib. Supports PCM
    (format 1) at 8 (unsigned), 16, 24 (packed), and 32 bits, IEEE float
    (format 3) at 32/64 bits, the ITU-T G.711 companded formats — A-law
    (format 6) and mu-law (format 7), decoded by the public expansion
    formulas — Microsoft ADPCM (format 0x02, the public RIFF coefficient
    tables, honoring a stream's own fmt-extension table), and IMA/DVI
    ADPCM (format 0x11, the public 4-bit step-adaptive codec); skips
    unknown chunks (LIST, cue, ...). The remaining compressed formats
    (MP3-in-WAV and vendor codecs) raise NotImplementedError — the
    codec-library seam."""
    import struct

    if payload is None or len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, fmt, data, fact_samples = 12, None, None, None
    fmt_raw = b""
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (ln,) = struct.unpack_from("<I", payload, pos + 4)
        body_end = pos + 8 + ln
        if body_end > len(payload):
            raise ValueError("corrupt WAV: truncated chunk")
        if cid == b"fmt ":
            if ln < 16:
                raise ValueError("corrupt WAV: short fmt chunk")
            fmt = struct.unpack_from("<HHIIHH", payload, pos + 8)
            fmt_raw = payload[pos + 8 : body_end]
        elif cid == b"data":
            data = payload[pos + 8 : body_end]
        elif cid == b"fact" and ln >= 4:
            # true per-channel sample count — authoritative for compressed
            # formats whose final block pads to a whole nibble body
            (fact_samples,) = struct.unpack_from("<I", payload, pos + 8)
        pos = body_end + (ln & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("corrupt WAV: missing fmt/data chunk")
    audio_fmt, ch, rate, _brate, _align, bits = fmt
    if ch < 1:
        raise ValueError("corrupt WAV: zero channels")
    if audio_fmt == 1:  # integer PCM
        if bits == 8:
            arr = np.frombuffer(data, np.uint8).astype(np.float32)
            arr = (arr - 128.0) / 128.0
        elif bits == 16:
            arr = np.frombuffer(data, "<i2").astype(np.float32) / 32768.0
        elif bits == 24:
            raw = np.frombuffer(data[: len(data) - len(data) % 3], np.uint8).reshape(-1, 3)
            vals = (
                raw[:, 0].astype(np.int32)
                | (raw[:, 1].astype(np.int32) << 8)
                | (raw[:, 2].astype(np.int32) << 16)
            )
            vals = np.where(vals >= 1 << 23, vals - (1 << 24), vals)
            arr = vals.astype(np.float32) / float(1 << 23)
        elif bits == 32:
            arr = np.frombuffer(data, "<i4").astype(np.float32) / float(1 << 31)
        else:
            raise ValueError(f"corrupt WAV: invalid PCM bit depth {bits}")
    elif audio_fmt == 3:  # IEEE float
        if bits == 32:
            arr = np.frombuffer(data, "<f4").astype(np.float32)
        elif bits == 64:
            arr = np.frombuffer(data, "<f8").astype(np.float32)
        else:
            raise ValueError(f"corrupt WAV: invalid float bit depth {bits}")
    elif audio_fmt in (6, 7):  # ITU-T G.711 A-law / mu-law, always 8-bit
        if bits != 8:
            raise ValueError(f"corrupt WAV: G.711 requires 8-bit samples, got {bits}")
        arr = (
            _ALAW_TABLE if audio_fmt == 6 else _MULAW_TABLE
        )[np.frombuffer(data, np.uint8)]
    elif audio_fmt == 0x02:  # Microsoft ADPCM (public RIFF spec tables)
        if bits != 4:
            raise ValueError(f"corrupt WAV: MS ADPCM requires 4-bit samples, got {bits}")
        if _align < 7 * ch:
            raise ValueError("corrupt WAV: MS ADPCM block align below header size")
        coeffs = _MS_ADPCM_COEFFS
        # coefficient table travels in the fmt extension (cbSize,
        # samplesPerBlock, numCoef, pairs) — honor a stream's own table
        if len(fmt_raw) >= 22:
            (ncoef,) = struct.unpack_from("<H", fmt_raw, 20)
            if ncoef and len(fmt_raw) >= 22 + 4 * ncoef:
                coeffs = tuple(
                    struct.unpack_from("<hh", fmt_raw, 22 + 4 * i)
                    for i in range(ncoef)
                )
        decoded = _decode_ms_adpcm(data, ch, _align, coeffs)
        if fact_samples is not None:
            decoded = decoded[:fact_samples]
        return decoded, rate
    elif audio_fmt == 0x11:  # IMA/DVI ADPCM, 4-bit nibble codes
        if bits != 4:
            raise ValueError(f"corrupt WAV: IMA ADPCM requires 4-bit samples, got {bits}")
        if _align < 4 * ch + 4:
            raise ValueError("corrupt WAV: ADPCM block align below header size")
        decoded = _decode_ima_adpcm(data, ch, _align)
        if fact_samples is not None:
            decoded = decoded[:fact_samples]  # trim final-block zero padding
        return decoded, rate
    else:
        raise NotImplementedError(
            f"compressed WAV format {audio_fmt} needs a codec library"
        )
    n = len(arr) - len(arr) % ch
    return arr[:n].reshape(-1, ch), rate


def audio_fingerprint(samples: "np.ndarray", n_windows: int = 9, n_bands: int = 8) -> int:
    """Chromaprint-style perceptual audio fingerprint: mono mix → 9 equal
    time windows → per-window spectral energy in 8 log-spaced bands (rfft)
    → sign of the time-delta per band → 8 x 8 = 64 bits packed into a
    signed int64 (SimHash storage convention, so the banded Hamming probe
    applies unchanged). Gain-invariant by construction (energy comparisons
    between adjacent windows survive uniform scaling), and window edges are
    fractions of total length, so resampled/requantized copies land within
    a few bits of the original. The (9, 8) window/band split was chosen
    empirically over (17, 4) and (5, 16): on a family of chirp+AM probes it
    gives planted gain/requant copies Hamming <= 6 while unrelated signals
    stay >= 10 (finer bands separate carrier frequencies; fewer windows
    keep per-window spectra stable)."""
    mono = np.asarray(samples, dtype=np.float64)
    if mono.ndim == 2:
        mono = mono.mean(axis=1)
    if mono.size < n_windows:
        mono = np.pad(mono, (0, n_windows - mono.size))
    edges = (np.arange(n_windows + 1) * len(mono)) // n_windows
    energies = np.zeros((n_windows, n_bands))
    for t in range(n_windows):
        frame = mono[edges[t] : edges[t + 1]]
        spec = np.abs(np.fft.rfft(frame)) ** 2
        if len(spec) < 2:
            continue
        # log-spaced band edges over the positive spectrum (skip DC)
        be = np.unique(
            np.geomspace(1, len(spec) - 1, n_bands + 1).astype(int)
        )
        for b in range(min(n_bands, len(be) - 1)):
            energies[t, b] = spec[be[b] : be[b + 1] + 1].sum()
    bits = (energies[1:] > energies[:-1]).reshape(-1)  # (n_windows-1)*n_bands
    v = 0
    for i, b in enumerate(bits[:64]):
        if b:
            v |= 1 << i
    return v - (1 << 64) if v >= (1 << 63) else v


def audio_fingerprints(
    media: DataFrame, use_fake: bool = True, on_error: str = "fail"
) -> DataFrame:
    """``(media_id, afp)`` per audio row via ``mapInPandas`` — real path
    decodes the WAV payload; fake path fingerprints a deterministic sample
    stream derived from the payload bytes (same schema).
    ``on_error="permissive"``: undecodable payload → NULL fingerprint
    (filtered before banding by ``audio_near_dup_pairs``, countable by the
    caller) instead of a task failure."""
    _check_on_error(on_error)
    permissive = on_error == "permissive"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            fps = []
            for payload in pdf["payload"]:
                try:
                    if use_fake:
                        raw = np.frombuffer(payload or b"\x00", dtype=np.uint8)
                        fps.append(audio_fingerprint(raw.astype(np.float64) - 128.0))
                    else:
                        fps.append(audio_fingerprint(decode_wav(payload)[0]))
                except Exception:  # noqa: BLE001 — policy boundary
                    if not permissive:
                        raise
                    fps.append(None)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "afp": pd.array(fps, dtype="Int64"),
                }
            )

    return media.filter(F.col("kind") == "audio").mapInPandas(
        batches, schema="media_id long, afp long"
    )


def audio_near_dup_pairs(
    fp_df: DataFrame,
    id_col: str = "media_id",
    max_hamming: int = 10,
    max_bucket: int | None = 10_000,
    dropped_report: list | None = None,
) -> DataFrame:
    """Perceptual audio near-duplicate candidates: the 64-bit fingerprints
    ride the same banded 16-bit-sub-band Hamming probe as SimHash/dHash —
    one thin self-join, never O(n²) over the audio corpus (``max_bucket``
    drops degenerate keys — digital silence fingerprints identically — see
    ``drop_oversized_buckets``)."""
    from covid19_spark.operators.dedup import simhash_candidate_pairs

    return simhash_candidate_pairs(
        # NULL fingerprints are permissive-mode decode failures (see
        # image_near_dup_pairs).
        fp_df.filter(F.col("afp").isNotNull()).select(
            F.col(id_col), F.col("afp").alias("simhash")
        ),
        id_col,
        max_hamming=max_hamming,
        max_bucket=max_bucket,
        dropped_report=dropped_report,
    )


def audio_features_from_samples(samples: "np.ndarray", n_windows: int = 16) -> np.ndarray:
    """Fixed-width features from DECODED audio: per-window RMS energy over
    the mono mix, peak-normalized — the real-decode twin of
    ``fake_audio_features`` (same output shape and [0, 1] contract)."""
    mono = np.asarray(samples, dtype=np.float32)
    if mono.ndim == 2:
        mono = mono.mean(axis=1)
    if mono.size == 0:
        return np.zeros(n_windows, dtype=np.float32)
    pad = -len(mono) % n_windows
    if pad:
        mono = np.pad(mono, (0, pad))
    frames = mono.reshape(n_windows, -1)
    rms = np.sqrt((frames * frames).mean(axis=1))
    peak = float(rms.max())
    return (rms / peak if peak > 0 else rms).astype(np.float32)


def fake_audio_features(payload: bytes, n_windows: int = 16) -> np.ndarray:
    """Deterministic fake audio features: window the byte stream into
    ``n_windows`` frames and emit per-frame mean energy (RMS-ish),
    normalized. Stands in for MFCC/mel features; fixed output width."""
    if payload is None or len(payload) == 0:
        return np.zeros(n_windows, dtype=np.float32)
    arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float32) - 128.0
    pad = -len(arr) % n_windows
    if pad:
        arr = np.pad(arr, (0, pad))
    frames = arr.reshape(n_windows, -1)
    rms = np.sqrt((frames * frames).mean(axis=1))
    peak = float(rms.max())
    return (rms / peak if peak > 0 else rms).astype(np.float32)


def extract_audio_features(
    media: DataFrame,
    n_windows: int = 16,
    use_fake: bool = True,
    on_error: str = "fail",
) -> DataFrame:
    """Windowed audio feature extraction via ``mapInPandas`` — same
    metadata-prunes-before-decode and fixed-width-output contract as the
    image kernel.  ``on_error="permissive"`` matches
    ``extract_image_features``: bad payloads yield ``feature = NULL`` plus
    an ``error`` column instead of failing the task (schema unchanged in
    the default ``"fail"`` mode)."""
    _check_on_error(on_error)
    permissive = on_error == "permissive"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats, errs = [], []
            for p in pdf["payload"]:
                try:
                    feats.append(
                        fake_audio_features(p, n_windows)
                        if use_fake
                        # real decode: RIFF/WAVE via the pure-stdlib codec
                        else audio_features_from_samples(
                            decode_wav(p)[0], n_windows
                        )
                    )
                    errs.append(None)
                except Exception as exc:  # noqa: BLE001 — policy boundary
                    if not permissive:
                        raise
                    feats.append(None)
                    errs.append(_classify_decode_error(exc))
            out = {
                "media_id": pdf["media_id"],
                "mime": pdf["mime"],
                "duration_ms": pdf["duration_ms"],
                "n_bytes": pdf["payload"].map(lambda b: 0 if b is None else len(b)),
                "n_windows": n_windows,
                "feature": [None if f is None else f.tolist() for f in feats],
            }
            if permissive:
                out["error"] = errs
            yield pd.DataFrame(out)

    schema = AUDIO_FEATURES_SCHEMA + (", error string" if permissive else "")
    return media.filter(F.col("kind") == "audio").mapInPandas(
        batches, schema=schema
    )


def synthesize_media(spark, n: int = 64, seed: int = 7) -> DataFrame:
    """Deterministic fake media table for tests (payload = seeded bytes)."""
    rows = []
    for i in range(n):
        rng = np.random.default_rng(seed + i)
        kind = ["image", "audio", "video"][i % 3]
        payload = bytes(rng.integers(0, 256, size=128 + (i % 5) * 64, dtype=np.uint8))
        rows.append(
            (
                i,
                kind,
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                64 + i % 32,
                48 + i % 32,
                1000 * (i % 10) if kind == "video" else None,
                payload,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
