"""Baseline JPEG codec — pure stdlib + numpy, no codec library.

Closes the last real-decode seam in operators/multimodal.py: the container
ships no Pillow/libjpeg, and the reference's media surface is chart image
bytes (covid19-visualizer Visualizer.java:469,520 / ChartRequest.java:23 — PNG there, but any realistic media
column mixes JPEG in). Everything here follows the public JPEG standard
(ITU-T T.81): baseline sequential DCT, Huffman entropy coding, JFIF color
space.

Decoder (`decode_jpeg`): real decoder for baseline sequential (SOF0/1) AND
progressive (SOF2) files — it reads quantization and Huffman tables from the
stream's own DQT/DHT segments (never from the built-in constants), handles
grayscale and 3-component scans, sampling factors 1-2 per axis (4:4:4,
4:2:2, 4:2:0), multi-segment tables, DRI/RSTn restart intervals, and the
full Annex G progressive feature set (spectral-selection bands,
successive-approximation DC/AC first + refinement scans, EOB runs), and
lossless SOF3 at the full T.81 precision range 2-16 bits (Annex H
predictors 1-7, bit-exact incl. the mod-2^16 category-16 wrap —
`encode_jpeg_lossless` is its round-trip twin), and 12-bit extended
sequential SOF1 AND progressive SOF2 (uint16 output, 16-bit DQT, level
shift 2048 — `encode_jpeg(precision=12[, progressive=True])` is the
round-trip twin; 12-bit progressive==sequential pinned bit-exact).
Arithmetic coding, hierarchical mode, and >2 sampling factors raise
NotImplementedError — the documented seam where a production build plugs
libjpeg-turbo in.

Encoder (`encode_jpeg`): baseline 8-bit encoder with the Annex K example
tables (embedded into the file via DQT/DHT, so round-trip never depends on
both sides sharing constants), libjpeg-style quality scaling, 4:4:4 or 4:2:0
subsampling; `progressive=True` emits an SOF2 stream with a libjpeg-shaped
scan script (per-scan Huffman tables) from the SAME quantized coefficients,
so progressive and baseline encodings of one image decode bit-identically.
Exists so tests and the media synthesizer can produce REAL decodable JPEG
payloads deterministically.

The DCT/IDCT run as batched 8x8 matrix products over all blocks of a
component at once (numpy); only the entropy coding is sequential per spec.
This module is a per-row kernel invoked from Arrow-batched `mapInPandas` —
it never touches Spark itself.
"""

from __future__ import annotations

import struct

import numpy as np

# --- constants from the public standard (ITU-T T.81) -------------------------

# Annex K.1 example quantization tables (row-major 8x8).
QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)

QUANT_CHROMA = np.array(
    [17, 18, 24, 47, 99, 99, 99, 99,
     18, 21, 26, 66, 99, 99, 99, 99,
     24, 26, 56, 99, 99, 99, 99, 99,
     47, 66, 99, 99, 99, 99, 99, 99]
    + [99] * 32,
    dtype=np.int32,
)

# Annex K.3 example Huffman tables: (bits[1..16], values). The decoder reads
# tables from the file's DHT segments; these are only what the ENCODER emits.
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))

AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def _zigzag() -> np.ndarray:
    """Zigzag scan order: position i in scan order -> row-major index."""
    coords = sorted(
        ((r, c) for r in range(8) for c in range(8)),
        key=lambda rc: (rc[0] + rc[1], -rc[0] if (rc[0] + rc[1]) % 2 == 0 else rc[0]),
    )
    return np.array([r * 8 + c for r, c in coords], dtype=np.int64)


ZIGZAG = _zigzag()
UNZIGZAG = np.argsort(ZIGZAG)

# Orthonormal 8-point DCT-II basis: dct = A @ block @ A.T, idct = A.T @ C @ A.
_A = np.array(
    [
        [
            (np.sqrt(1 / 8) if k == 0 else np.sqrt(2 / 8))
            * np.cos((2 * n + 1) * k * np.pi / 16)
            for n in range(8)
        ]
        for k in range(8)
    ]
)


def _build_huffman_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman code assignment (T.81 Annex C): symbol -> (code, length)."""
    assert len(vals) == sum(bits), "invalid Huffman spec"
    codes, code = {}, 0
    vi = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[vi]] = (code, length)
            code += 1
            vi += 1
        code <<= 1
    return codes


from functools import lru_cache


@lru_cache(maxsize=64)
def _huff_lut(bits: tuple[int, ...], vals: tuple[int, ...]) -> tuple[list[int], list[int]]:
    """16-bit-peek Huffman lookup tables for a DHT spec: ``sym[v16]`` is the
    decoded symbol when the next 16 bits of the stream read ``v16`` (-1 for
    an invalid prefix), ``length[v16]`` how many of those bits the code
    consumed. One table lookup replaces the bit-by-bit canonical walk — the
    entropy decode is the dominant cost of the pure-Python path (profiled:
    ~85 % of ``decode_jpeg``), and encoders reuse the Annex K tables across
    every frame of a stream, so the build cost is amortized by the cache.
    Plain Python lists: scalar indexing beats numpy arrays here."""
    sym = [-1] * (1 << 16)
    ln = [0] * (1 << 16)
    code, vi = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            lo = code << (16 - length)
            for v16 in range(lo, lo + (1 << (16 - length))):
                sym[v16] = vals[vi]
                ln[v16] = length
            code += 1
            vi += 1
        code <<= 1
    return sym, ln


class _HuffDecoder:
    """Canonical Huffman decoder built from a DHT (bits, values) spec:
    per-length first-code/first-index tables, O(code length) per symbol.
    Also carries the immutable ``spec`` so the fast baseline-scan path can
    fetch the cached 16-bit LUT (``_huff_lut``)."""

    def __init__(self, bits: list[int], vals: list[int]):
        if len(vals) != sum(bits):
            raise ValueError("corrupt DHT: value count != sum of bits")
        self.vals = vals
        self.spec = (tuple(bits), tuple(vals))
        self.mincode, self.maxcode, self.valptr = [0] * 17, [-1] * 17, [0] * 17
        code, vi = 0, 0
        for length in range(1, 17):
            if bits[length - 1]:
                self.valptr[length] = vi
                self.mincode[length] = code
                code += bits[length - 1]
                vi += bits[length - 1]
                self.maxcode[length] = code - 1
            else:
                self.maxcode[length] = -1
            code <<= 1

    def decode(self, br: "_BitReader") -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | br.read_bit()
            if self.maxcode[length] >= 0 and code <= self.maxcode[length]:
                return self.vals[self.valptr[length] + code - self.mincode[length]]
        raise ValueError("corrupt JPEG: invalid Huffman code")


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def _pad_to_byte(self) -> None:
        if self.nbits:
            self.write(0x7F, 8 - self.nbits)  # pad with 1s

    def restart(self, n: int) -> None:
        """Byte-align and emit an RSTn marker (markers are never stuffed)."""
        self._pad_to_byte()
        self.out += bytes([0xFF, 0xD0 + (n % 8)])

    def flush(self) -> bytes:
        self._pad_to_byte()
        return bytes(self.out)


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment; un-stuffs 0xFF00
    and stops (reports) at any other marker."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        if self.marker is not None:
            # past end of scan: feed 1-bits (standard-tolerated padding)
            self.acc = (self.acc << 8) | 0xFF
            self.nbits += 8
            return
        if self.pos >= len(self.data):
            raise ValueError("corrupt JPEG: truncated stream")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos >= len(self.data):
                raise ValueError("corrupt JPEG: truncated stream")
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1
            else:
                self.marker = nxt
                self.pos += 1
                self.acc = (self.acc << 8) | 0xFF
                self.nbits += 8
                return
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_and_expect_rst(self, n: int) -> None:
        """Restart: drop partial bits, consume the RSTn marker."""
        self.acc = 0
        self.nbits = 0
        if self.marker is None:
            # marker not yet hit while filling: it must be next in the stream
            if self.pos + 1 >= len(self.data):
                raise ValueError("corrupt JPEG: truncated stream")
            if self.data[self.pos] == 0xFF:
                self.marker = self.data[self.pos + 1]
                self.pos += 2
        if self.marker != 0xD0 + (n % 8):
            raise ValueError(
                f"corrupt JPEG: expected RST{n % 8}, got {self.marker:#x}"
                if self.marker is not None
                else "corrupt JPEG: missing restart marker"
            )
        self.marker = None


def _extend(v: int, size: int) -> int:
    """DIFF/coefficient sign extension (T.81 F.2.2.1)."""
    return v - (1 << size) + 1 if v < (1 << (size - 1)) else v


def _csize(v: int) -> int:
    """Bit category of a coefficient value."""
    return int(abs(v)).bit_length()


# --- encoder -----------------------------------------------------------------


def _quality_scaled(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg-style quality scaling of a base table (public formula)."""
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int32)


def _plane_blocks(plane: np.ndarray) -> np.ndarray:
    """(H, W) float plane (H, W multiples of 8) -> (rows, cols, 8, 8)."""
    h, w = plane.shape
    return plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3)


def _pad_to(plane: np.ndarray, mh: int, mw: int) -> np.ndarray:
    """Edge-replicate pad to multiples of (mh, mw)."""
    h, w = plane.shape
    return np.pad(
        plane, ((0, (-h) % mh), (0, (-w) % mw)), mode="edge"
    )


def _prepare_quantized_coefs(
    pixels: np.ndarray, quality: int, subsampling: str, precision: int
):
    """Shared encoder front half: RGB→YCbCr (or grayscale), optional 4:2:0
    chroma averaging, MCU-grid edge padding, FDCT, quality-scaled
    quantization. Returns ``(gray, factors, qtabs, comp_coefs, h0, w0)``
    where ``comp_coefs[ci]`` is a (rows, cols, 64) int32 grid in ZIGZAG
    order — the entropy-coding back halves (baseline/progressive Huffman
    and the SOF9 arithmetic twin) all consume this one representation, so
    every entropy mode of one image encodes the SAME quantized
    coefficients."""
    if precision not in (8, 12):
        raise ValueError(f"precision must be 8 or 12 (got {precision})")
    center = float(1 << (precision - 1))
    arr = np.asarray(pixels, dtype=np.float64)
    gray = arr.ndim == 2
    if subsampling not in ("444", "420"):
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    if gray:
        planes = [arr]
        factors = [(1, 1)]
    else:
        r, g, b = arr[:, :, 0], arr[:, :, 1], arr[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + center
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + center
        if subsampling == "420":
            cbp = _pad_to(cb, 2, 2)
            crp = _pad_to(cr, 2, 2)
            cb = cbp.reshape(cbp.shape[0] // 2, 2, cbp.shape[1] // 2, 2).mean(axis=(1, 3))
            cr = crp.reshape(crp.shape[0] // 2, 2, crp.shape[1] // 2, 2).mean(axis=(1, 3))
            factors = [(2, 2), (1, 1), (1, 1)]
        else:
            factors = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]
    h0, w0 = arr.shape[:2]
    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)

    qtabs = [_quality_scaled(QUANT_LUMA, quality), _quality_scaled(QUANT_CHROMA, quality)]
    if precision == 12:
        # ×16 keeps each table's RELATIVE step at the 12-bit sample scale
        # (samples span 16× the 8-bit range); entries stay well inside the
        # 16-bit DQT field.
        qtabs = [np.clip(q.astype(np.int64) * 16, 1, 65535).astype(np.int32) for q in qtabs]
    # quantized zigzag coefficients per component, as (rows, cols, 64) grids
    comp_coefs = []
    for ci, (plane, (hf, vf)) in enumerate(zip(planes, factors)):
        # pad (edge-replicate) so the component plane tiles the full MCU
        # grid: ceil(h0 / (8*vmax)) * vf blocks vertically, similarly across
        mcus_y = -(-h0 // (8 * vmax))
        mcus_x = -(-w0 // (8 * hmax))
        need_h, need_w = mcus_y * vf * 8, mcus_x * hf * 8
        ph, pw = plane.shape
        plane = np.pad(plane, ((0, need_h - ph), (0, need_w - pw)), mode="edge")
        blocks = _plane_blocks(plane - center)
        coefs = np.einsum("ij,rcjk,lk->rcil", _A, blocks, _A)
        q = qtabs[0 if ci == 0 else 1].reshape(8, 8)
        quant = np.round(coefs / q).astype(np.int32)
        comp_coefs.append(quant.reshape(quant.shape[0], quant.shape[1], 64)[:, :, ZIGZAG])
    return gray, factors, qtabs, comp_coefs, h0, w0


def encode_jpeg(
    pixels: np.ndarray,
    quality: int = 85,
    subsampling: str = "444",
    restart_interval: int = 0,
    progressive: bool = False,
    precision: int = 8,
) -> bytes:
    """Encode (H, W, 3) RGB or (H, W) grayscale uint8 pixels as a baseline
    JFIF JPEG — or, with ``progressive=True``, as a progressive (SOF2)
    stream using a libjpeg-style scan script (interleaved DC first at Al=1,
    spectral-selection AC first scans, AC refinements, DC refinement) so
    every Annex G decode path has a real test vector. ``subsampling``:
    "444" (no chroma subsampling) or "420" (2x2 chroma averaging).
    Deterministic for fixed inputs. Both modes produce the SAME quantized
    coefficients, so progressive and baseline encodings of one image decode
    to bit-identical pixels.

    ``precision=12`` emits a T.81 extended sequential (SOF1) 12-bit stream
    from uint16 samples in [0, 4095]: level shift 2048, 16-bit DQT entries
    (pq=1, base tables ×16 to keep relative quality), and fixed-length
    Huffman tables covering the wider magnitude categories (DC SSSS 0-16,
    AC 1-14 — Annex K's 8-bit tables stop at 11/10). 12-bit applies to both
    output modes: ``progressive=True`` emits a 12-bit SOF2 stream (the
    precision threads into the same scan script)."""
    gray, factors, qtabs, comp_coefs, h0, w0 = _prepare_quantized_coefs(
        pixels, quality, subsampling, precision
    )

    if progressive:
        return _encode_progressive(
            h0, w0, gray, factors, qtabs, comp_coefs, restart_interval, precision
        )
    planes_n = 1 if gray else 3

    if precision == 12:
        # one fixed-length DC and AC table shared by every component: the
        # 12-bit magnitude categories (DC SSSS ≤ 16, AC size ≤ 14) overflow
        # Annex K's 8-bit tables, and a data-independent legal table keeps
        # the encoder deterministic without a symbol-frequency pass.
        dc_spec12 = _fixed_length_table(list(range(17)))
        ac_spec12 = _fixed_length_table(
            [0x00, 0xF0] + [(r << 4) | s for r in range(16) for s in range(1, 15)]
        )
        dc_codes = [_build_huffman_codes(*dc_spec12)] * 2
        ac_codes = [_build_huffman_codes(*ac_spec12)] * 2
    else:
        dc_codes = [_build_huffman_codes(DC_LUMA_BITS, DC_LUMA_VALS),
                    _build_huffman_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)]
        ac_codes = [_build_huffman_codes(AC_LUMA_BITS, AC_LUMA_VALS),
                    _build_huffman_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)]

    bw = _BitWriter()
    pred = [0] * planes_n
    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    mcus_y = -(-h0 // (8 * vmax))
    mcus_x = -(-w0 // (8 * hmax))
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                bw.restart(mcu_count // restart_interval - 1)
                pred = [0] * planes_n
            mcu_count += 1
            for ci, (hf, vf) in enumerate(factors):
                tsel = 0 if ci == 0 else 1
                for by in range(vf):
                    for bx in range(hf):
                        zz = comp_coefs[ci][my * vf + by, mx * hf + bx]
                        diff = int(zz[0]) - pred[ci]
                        pred[ci] = int(zz[0])
                        s = _csize(diff)
                        code, ln = dc_codes[tsel][s]
                        bw.write(code, ln)
                        if s:
                            bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
                        run = 0
                        for i in range(1, 64):
                            v = int(zz[i])
                            if v == 0:
                                run += 1
                                continue
                            while run > 15:
                                code, ln = ac_codes[tsel][0xF0]  # ZRL
                                bw.write(code, ln)
                                run -= 16
                            s = _csize(v)
                            code, ln = ac_codes[tsel][(run << 4) | s]
                            bw.write(code, ln)
                            bw.write(v if v >= 0 else v + (1 << s) - 1, s)
                            run = 0
                        if run:
                            code, ln = ac_codes[tsel][0x00]  # EOB
                            bw.write(code, ln)
    entropy = bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for tid, q in enumerate(qtabs[: 1 if gray else 2]):
        if precision == 12:
            out += seg(
                0xFFDB,
                bytes([0x10 | tid])
                + b"".join(struct.pack(">H", int(x)) for x in q[ZIGZAG]),
            )
        else:
            out += seg(0xFFDB, bytes([tid]) + bytes(int(x) for x in q[ZIGZAG]))
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", precision, h0, w0, ncomp)
    for ci in range(ncomp):
        hf, vf = factors[ci]
        sof += bytes([ci + 1, (hf << 4) | vf, 0 if ci == 0 else 1])
    out += seg(0xFFC0 if precision == 8 else 0xFFC1, sof)
    dht = b""
    if precision == 12:
        specs = [(0x00, *dc_spec12), (0x10, *ac_spec12)]
        if not gray:
            specs += [(0x01, *dc_spec12), (0x11, *ac_spec12)]
    else:
        specs = [(0x00, DC_LUMA_BITS, DC_LUMA_VALS), (0x10, AC_LUMA_BITS, AC_LUMA_VALS)]
        if not gray:
            specs += [(0x01, DC_CHROMA_BITS, DC_CHROMA_VALS), (0x11, AC_CHROMA_BITS, AC_CHROMA_VALS)]
    for tc, bits, vals in specs:
        dht += bytes([tc]) + bytes(bits) + bytes(vals)
    out += seg(0xFFC4, dht)
    if restart_interval:
        out += seg(0xFFDD, struct.pack(">H", restart_interval))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        tsel = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (tsel << 4) | tsel])
    sos += bytes([0, 63, 0])
    out += seg(0xFFDA, sos)
    out += entropy
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --- progressive encoder (SOF2, T.81 Annex G) --------------------------------


def _fixed_length_table(symbols: list[int]) -> tuple[list[int], list[int]]:
    """A legal canonical Huffman table giving every distinct symbol the same
    code length L = ceil(log2(n+1)) — suboptimal compression but simple and
    always decodable (the all-ones code stays unused as T.81 requires).
    Returns the DHT (bits, vals) spec."""
    syms = sorted(set(symbols)) or [0]
    n = len(syms)
    length = 1
    while (1 << length) < n + 1:
        length += 1
    bits = [0] * 16
    bits[length - 1] = n
    return bits, syms


def _ac_scan_entropy(
    grid, bh_n, bw_n, ss, se, ah, al, tkey,
    restart_interval, emit_symbol, emit_bits, do_restart,
):
    """Entropy-code one AC scan (first pass Ah=0 or refinement Ah>0) over a
    component's real (non-padding) block grid, with EOB-run accumulation and
    restart support. ``emit_symbol``/``emit_bits``/``do_restart`` abstract
    the output so the same logic runs the symbol-collection pass (building
    the scan's Huffman table) and the real bit-writing pass."""
    eobrun = 0
    pending: list[int] = []  # refinement correction bits deferred behind an EOB run

    def flush():
        nonlocal eobrun, pending
        if eobrun > 0:
            nbits = eobrun.bit_length() - 1
            emit_symbol(tkey, nbits << 4)
            if nbits:
                emit_bits(eobrun - (1 << nbits), nbits)
            eobrun = 0
        for b in pending:
            emit_bits(b, 1)
        pending = []

    unit = 0
    for by in range(bh_n):
        for bx in range(bw_n):
            if restart_interval and unit and unit % restart_interval == 0:
                flush()
                do_restart(unit // restart_interval - 1)
            zz = grid[by, bx]
            if ah == 0:  # AC first: values scaled by 2^al, EOBn runs
                r = 0
                for k in range(ss, se + 1):
                    t = int(zz[k])
                    a = abs(t) >> al
                    if a == 0:
                        r += 1
                        continue
                    flush()
                    while r > 15:
                        emit_symbol(tkey, 0xF0)  # ZRL
                        r -= 16
                    s = a.bit_length()
                    emit_symbol(tkey, (r << 4) | s)
                    v = a if t >= 0 else -a
                    emit_bits(v if v >= 0 else v + (1 << s) - 1, s)
                    r = 0
                if r:
                    eobrun += 1
                    if eobrun == 0x7FFF:
                        flush()
            else:  # AC refinement (G.1.2.3 encoder side)
                band = list(range(ss, se + 1))
                absv = [abs(int(zz[k])) >> al for k in band]
                eob_idx = ss - 1
                for i, a in enumerate(absv):
                    if a == 1:
                        eob_idx = ss + i
                r = 0
                br_bits: list[int] = []
                for i, k in enumerate(band):
                    t = absv[i]
                    if t == 0:
                        r += 1
                        continue
                    while r > 15 and k <= eob_idx:
                        flush()
                        emit_symbol(tkey, 0xF0)
                        r -= 16
                        for b in br_bits:
                            emit_bits(b, 1)
                        br_bits = []
                    if t > 1:
                        # previously-nonzero coefficient: correction bit only
                        br_bits.append(t & 1)
                        continue
                    # newly-nonzero (|coef| >> Al == 1): (run, 1) + sign
                    flush()
                    emit_symbol(tkey, (r << 4) | 1)
                    emit_bits(1 if int(zz[k]) >= 0 else 0, 1)
                    for b in br_bits:
                        emit_bits(b, 1)
                    br_bits = []
                    r = 0
                if r > 0 or br_bits:
                    eobrun += 1
                    pending.extend(br_bits)
                    if eobrun == 0x7FFF or len(pending) > 900:
                        flush()
            unit += 1
    flush()


def _dc_scan_entropy(
    comp_idx, comp_coefs, factors, mcus_x, mcus_y, ah, al,
    restart_interval, emit_symbol, emit_bits, do_restart,
):
    """Entropy-code one (possibly interleaved) DC scan: first pass = DPCM of
    the point-transformed (arithmetic >> Al) DC values, refinement = one raw
    bit per block revealing bit Al."""
    pred = {ci: 0 for ci in comp_idx}
    unit = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and unit and unit % restart_interval == 0:
                do_restart(unit // restart_interval - 1)
                pred = {ci: 0 for ci in comp_idx}
            for ci in comp_idx:
                hf, vf = factors[ci]
                for by in range(vf):
                    for bx in range(hf):
                        dc = int(comp_coefs[ci][my * vf + by, mx * hf + bx, 0])
                        if ah == 0:
                            v = dc >> al  # arithmetic shift per G.1.1.2
                            diff = v - pred[ci]
                            pred[ci] = v
                            s = _csize(diff)
                            emit_symbol(("dc", 0 if ci == 0 else 1), s)
                            if s:
                                emit_bits(diff if diff >= 0 else diff + (1 << s) - 1, s)
                        else:
                            emit_bits((dc >> al) & 1, 1)
            unit += 1


def _encode_progressive(
    h0, w0, gray, factors, qtabs, comp_coefs, restart_interval, precision=8
) -> bytes:
    """Assemble a progressive JFIF stream from the quantized coefficient
    grids: SOF2 + per-scan DHT/SOS. Scan script (libjpeg-shaped): DC first
    (all components, Al=1), spectral-selection AC first scans at Al=1, AC
    refinements to Al=0, DC refinement. Each scan carries its own Huffman
    table(s), built from that scan's actual symbol set — which is also why
    12-bit needs no special tables here: the wider magnitude categories
    simply appear in the derived per-scan sets."""
    ncomp = 1 if gray else 3
    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    mcus_x = -(-w0 // (8 * hmax))
    mcus_y = -(-h0 // (8 * vmax))
    real_blocks = []
    for ci in range(ncomp):
        hf, vf = factors[ci]
        comp_w = -(-(w0 * hf) // hmax)
        comp_h = -(-(h0 * vf) // vmax)
        real_blocks.append((-(-comp_h // 8), -(-comp_w // 8)))

    all_idx = list(range(ncomp))
    if gray:
        scans = [
            (all_idx, 0, 0, 0, 1),
            ([0], 1, 5, 0, 1), ([0], 6, 63, 0, 1),
            ([0], 1, 5, 1, 0), ([0], 6, 63, 1, 0),
            (all_idx, 0, 0, 1, 0),
        ]
    else:
        scans = [
            (all_idx, 0, 0, 0, 1),
            ([0], 1, 5, 0, 1), ([0], 6, 63, 0, 1),
            ([1], 1, 63, 0, 1), ([2], 1, 63, 0, 1),
            ([0], 1, 5, 1, 0), ([0], 6, 63, 1, 0),
            ([1], 1, 63, 1, 0), ([2], 1, 63, 1, 0),
            (all_idx, 0, 0, 1, 0),
        ]

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for tid, q in enumerate(qtabs[: 1 if gray else 2]):
        if precision == 12:
            out += seg(
                0xFFDB,
                bytes([0x10 | tid])
                + b"".join(struct.pack(">H", int(x)) for x in q[ZIGZAG]),
            )
        else:
            out += seg(0xFFDB, bytes([tid]) + bytes(int(x) for x in q[ZIGZAG]))
    sof = struct.pack(">BHHB", precision, h0, w0, ncomp)
    for ci in range(ncomp):
        hf, vf = factors[ci]
        sof += bytes([ci + 1, (hf << 4) | vf, 0 if ci == 0 else 1])
    out += seg(0xFFC2, sof)
    if restart_interval:
        out += seg(0xFFDD, struct.pack(">H", restart_interval))

    for scan_def in scans:
        comp_idx, ss, se, ah, al = scan_def

        def run(emit_symbol, emit_bits, do_restart):
            if ss == 0:
                _dc_scan_entropy(
                    comp_idx, comp_coefs, factors, mcus_x, mcus_y, ah, al,
                    restart_interval, emit_symbol, emit_bits, do_restart,
                )
            else:
                ci = comp_idx[0]
                bh_n, bw_n = real_blocks[ci]
                _ac_scan_entropy(
                    comp_coefs[ci], bh_n, bw_n, ss, se, ah, al,
                    ("ac", 0 if ci == 0 else 1),
                    restart_interval, emit_symbol, emit_bits, do_restart,
                )

        # pass 1: collect the symbols this scan actually emits
        recorded: dict[tuple, list[int]] = {}
        run(
            lambda key, sym: recorded.setdefault(key, []).append(sym),
            lambda v, n: None,
            lambda n: None,
        )
        tables = {}
        dht = b""
        for (kind, tid), syms in sorted(recorded.items()):
            bits, vals = _fixed_length_table(syms)
            tables[(kind, tid)] = _build_huffman_codes(bits, vals)
            dht += bytes([((0 if kind == "dc" else 1) << 4) | tid]) + bytes(bits) + bytes(vals)
        if dht:
            out_dht = seg(0xFFC4, dht)
        else:
            out_dht = b""  # DC refinement scans use no Huffman table

        # pass 2: real bits
        bw = _BitWriter()

        def emit_symbol(key, sym):
            code, ln = tables[key][sym]
            bw.write(code, ln)

        run(emit_symbol, bw.write, bw.restart)
        entropy = bw.flush()

        sos = bytes([len(comp_idx)])
        for ci in comp_idx:
            tsel = 0 if ci == 0 else 1
            sos += bytes([ci + 1, (tsel << 4) | tsel])
        sos += bytes([ss, se, (ah << 4) | al])
        out += out_dht + seg(0xFFDA, sos) + entropy
    out += b"\xff\xd9"
    return bytes(out)


# --- decoder -----------------------------------------------------------------


def decode_jpeg(payload: bytes, dc_only: bool = False) -> np.ndarray:
    """Decode a baseline/extended sequential, progressive, or lossless
    (SOF0/1/2/3) JPEG to (H, W, 3) RGB — uint8 for 8-bit frames, uint16
    for 12-bit extended sequential (SOF1, T.81 Table B.2: level shift
    2^(P-1), 16-bit DQT, wider magnitude categories; grayscale replicated
    to 3 channels). Tables come from the stream's own DQT/DHT; supports
    1- or 3-component scans, sampling factors 1-2, DRI restarts, and for
    progressive streams the full Annex G Huffman feature set:
    spectral-selection bands, successive-approximation DC/AC
    first+refinement scans, EOB runs. 12-bit applies to progressive
    (SOF2) frames too; lossless (SOF3) takes the full 2-16 bit range.
    Raises NotImplementedError on arithmetic-coded/hierarchical variants.

    ``dc_only=True`` returns the 1/8-scale block-mean image instead —
    (ceil(H/8), ceil(W/8), 3) uint8 — decoding only DC coefficients on the
    baseline path (see ``decode_jpeg_dc``); progressive streams fall back
    to a full decode + 8x8 block means (their DC scan alone is a valid
    image, but refinement scans shift DC magnitudes, so the honest
    equivalent is the assembled image's block means)."""
    if payload is None or len(payload) < 4 or payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    # Seam rejection at sniff cost (VERDICT r06 task #8): arithmetic-coded/
    # hierarchical SOFs and non-8-bit precision are identified by a marker
    # walk BEFORE any DQT/DHT parsing — a stream whose tables precede its
    # SOF otherwise pays full Huffman-LUT construction just to be refused.
    # Malformed headers fall through so the main walk reports its precise
    # corrupt-stream errors.
    try:
        _sof_marker, _sof_prec, _, _ = sniff_jpeg_frame(payload)
    except ValueError:
        pass
    else:
        if _sof_marker in _UNSUPPORTED_SOF:
            raise NotImplementedError(
                "only sequential/progressive/lossless Huffman JPEG supported "
                f"(got SOF marker {_sof_marker:#x})"
            )
        if not (
            _sof_prec == 8
            or (_sof_prec == 12 and _sof_marker in (0xC1, 0xC2, 0xC9))
            or (2 <= _sof_prec <= 16 and _sof_marker == 0xC3)
        ):
            raise NotImplementedError(f"{_sof_prec}-bit precision not supported")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffDecoder] = {}
    huff_ac: dict[int, _HuffDecoder] = {}
    frame = None
    restart_interval = 0
    progressive = False
    lossless = False
    arith = False
    dc_cond: dict[int, tuple[int, int]] = {}
    ac_cond: dict[int, int] = {}
    saw_eoi = False
    grids: dict[int, np.ndarray] | None = None
    data = payload
    while pos < len(data):
        if pos + 1 >= len(data):
            raise ValueError("corrupt JPEG: truncated stream")
        if data[pos] != 0xFF:
            raise ValueError("corrupt JPEG: expected marker")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            saw_eoi = True
            break
        if marker in (0x01, *range(0xD0, 0xD8)):  # TEM/RSTn: no payload
            continue
        if pos + 2 > len(data):
            raise ValueError("corrupt JPEG: truncated stream")
        (seglen,) = struct.unpack_from(">H", data, pos)
        if seglen < 2 or pos + seglen > len(data):
            raise ValueError("corrupt JPEG: truncated stream")
        body = data[pos + 2 : pos + seglen]
        pos += seglen
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            b = 0
            while b < len(body):
                pq, tq = body[b] >> 4, body[b] & 0x0F
                if pq not in (0, 1):
                    raise ValueError(f"corrupt JPEG: invalid DQT precision {pq}")
                # pq=1: 16-bit big-endian table entries — some encoders emit
                # these even for 8-bit images (T.81 B.2.4.1)
                width = 2 if pq else 1
                if b + 1 + 64 * width > len(body):
                    raise ValueError("corrupt JPEG: truncated stream")
                if pq:
                    tab = (
                        np.frombuffer(body, ">u2", 64, b + 1).astype(np.int32)
                    )
                else:
                    tab = np.frombuffer(body, np.uint8, 64, b + 1).astype(np.int32)
                qtabs[tq] = tab[UNZIGZAG].reshape(8, 8)
                b += 1 + 64 * width
        elif marker == 0xC4:  # DHT
            b = 0
            while b < len(body):
                if b + 17 > len(body):
                    raise ValueError("corrupt JPEG: truncated stream")
                tc, th = body[b] >> 4, body[b] & 0x0F
                bits = list(body[b + 1 : b + 17])
                n = sum(bits)
                if b + 17 + n > len(body):
                    raise ValueError("corrupt JPEG: truncated stream")
                vals = list(body[b + 17 : b + 17 + n])
                (huff_dc if tc == 0 else huff_ac)[th] = _HuffDecoder(bits, vals)
                b += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2, 0xC3, 0xC9):
            # SOF0/1 baseline(+ext seq), SOF2 progressive, SOF3 lossless
            if len(body) < 6:
                raise ValueError("corrupt JPEG: truncated stream")
            prec, h0, w0, ncomp = struct.unpack_from(">BHHB", body, 0)
            if len(body) < 6 + 3 * ncomp:
                raise ValueError("corrupt JPEG: truncated stream")
            # Per T.81 Table B.2: DCT paths take P=8 everywhere and P=12 in
            # extended sequential (SOF1) and progressive (SOF2); lossless
            # (SOF3) takes the full P=2..16 range.
            if not (
                prec == 8
                or (prec == 12 and marker in (0xC1, 0xC2, 0xC9))
                or (2 <= prec <= 16 and marker == 0xC3)
            ):
                raise NotImplementedError(f"{prec}-bit precision not supported")
            comps = []
            for i in range(ncomp):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                hf, vf = hv >> 4, hv & 0x0F
                if marker == 0xC3 and (hf != 1 or vf != 1):
                    raise NotImplementedError(
                        "subsampled lossless JPEG not supported"
                    )
                if hf not in (1, 2) or vf not in (1, 2):
                    raise NotImplementedError(f"sampling factor {hf}x{vf} not supported")
                comps.append({"id": cid, "h": hf, "v": vf, "tq": tq})
            frame = {"h": h0, "w": w0, "comps": comps, "prec": prec}
            progressive = marker == 0xC2
            lossless = marker == 0xC3
            arith = marker == 0xC9
        elif marker in (0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only sequential/progressive/lossless Huffman JPEG supported "
                f"(got SOF marker {marker:#x})"
            )
        elif marker == 0xCC:  # DAC: arithmetic conditioning (B.2.4.3)
            b = 0
            while b + 1 < len(body):
                tc, tb = body[b] >> 4, body[b] & 0x0F
                val = body[b + 1]
                if tc == 0:
                    dc_cond[tb] = (val & 0x0F, val >> 4)  # (L, U)
                else:
                    ac_cond[tb] = val  # Kx
                b += 2
        elif marker == 0xDD:  # DRI
            if len(body) < 2:
                raise ValueError("corrupt JPEG: truncated stream")
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("corrupt JPEG: SOS before SOF")
            if len(body) < 1:
                raise ValueError("corrupt JPEG: truncated stream")
            ns = body[0]
            if len(body) < 1 + 2 * ns:
                raise ValueError("corrupt JPEG: truncated stream")
            scan = []
            for i in range(ns):
                cs, tt = body[1 + 2 * i], body[2 + 2 * i]
                comp = next(
                    (c for c in frame["comps"] if c["id"] == cs), None
                )
                if comp is None:
                    raise ValueError("corrupt JPEG: scan references unknown component")
                scan.append((comp, tt >> 4, tt & 0x0F))
            if lossless:
                if len(body) < 1 + 2 * ns + 3:
                    raise ValueError("corrupt JPEG: truncated stream")
                pred_sel = body[1 + 2 * ns]  # Ss = predictor selector
                pt = body[3 + 2 * ns] & 0x0F  # Al = point transform
                if pred_sel < 1 or pred_sel > 7:
                    raise ValueError(
                        f"corrupt JPEG: invalid lossless predictor {pred_sel}"
                    )
                if pt != 0:
                    raise NotImplementedError(
                        "lossless point transform (Al != 0) not supported"
                    )
                if restart_interval:
                    raise NotImplementedError(
                        "restart markers in lossless JPEG not supported"
                    )
                img = _decode_lossless_scan(data, pos, frame, scan, huff_dc, pred_sel)
                if dc_only:
                    imgf = img.astype(np.float64)
                    hh, ww = imgf.shape[:2]
                    ph, pw = -(-hh // 8) * 8, -(-ww // 8) * 8
                    imgf = np.pad(
                        imgf, ((0, ph - hh), (0, pw - ww), (0, 0)), mode="edge"
                    )
                    bm = imgf.reshape(ph // 8, 8, pw // 8, 8, 3).mean(axis=(1, 3))
                    return np.clip(bm, 0, 255).astype(np.uint8)
                return img
            if arith:
                from covid19_spark.operators.jpeg_arith import (
                    ALLOW_FOREIGN_SOF9,
                    SOF9_SELF_SIGNATURE,
                    _decode_arith_scan,
                )

                # Interop gate (ADVICE r08): the QM coder is round-trip
                # verified only against encode_jpeg_arith; a third-party
                # SOF9 stream could mis-decode silently if its writer used
                # a different subinterval-ordering/byte-feed convention.
                # Our encoder stamps a COM signature into the header; an
                # unsigned stream fails loudly unless the documented
                # module flag opts in.
                sig = struct.pack(
                    ">HH", 0xFFFE, len(SOF9_SELF_SIGNATURE) + 2
                ) + SOF9_SELF_SIGNATURE
                if not ALLOW_FOREIGN_SOF9 and sig not in data[:pos]:
                    raise NotImplementedError(
                        "third-party arithmetic-coded JPEG (SOF9): "
                        "cross-library interop unverified; set "
                        "jpeg_arith.ALLOW_FOREIGN_SOF9 = True after "
                        "differential testing against jdarith"
                    )
                # Strictness guard: a truncated arithmetic scan cannot be
                # detected from the coder itself (the byte feed pads with
                # 1-bits past any end, per F.2.2.1), so a stream whose EOI
                # was cut off would silently decode to garbage. Entropy
                # bytes can never contain 0xFF followed by > 0x8F (bit
                # stuffing), so finding EOI in the remaining bytes is exact.
                if b"\xff\xd9" not in data[pos:]:
                    raise ValueError("corrupt JPEG: truncated stream")
                img = _decode_arith_scan(
                    data, pos, frame, scan, qtabs, dc_cond, ac_cond,
                    restart_interval,
                )
                if dc_only:
                    # same honest fallback as progressive: assembled image's
                    # 8x8 block means (adaptive contexts give no cheap
                    # DC-only walk — every AC decision must be decoded)
                    prec_ = frame.get("prec", 8)
                    maxv = (1 << prec_) - 1
                    imgf = img.astype(np.float64)
                    hh, ww = imgf.shape[:2]
                    ph, pw = -(-hh // 8) * 8, -(-ww // 8) * 8
                    imgf = np.pad(
                        imgf, ((0, ph - hh), (0, pw - ww), (0, 0)), mode="edge"
                    )
                    bm = imgf.reshape(ph // 8, 8, pw // 8, 8, 3).mean(axis=(1, 3))
                    return np.clip(bm, 0, maxv).astype(
                        np.uint8 if prec_ == 8 else np.uint16
                    )
                return img
            if not progressive:
                return _decode_scan(
                    data, pos, frame, scan, qtabs, huff_dc, huff_ac,
                    restart_interval, dc_only=dc_only,
                )
            if len(body) < 1 + 2 * ns + 3:
                raise ValueError("corrupt JPEG: truncated stream")
            ss, se, ahal = body[1 + 2 * ns], body[2 + 2 * ns], body[3 + 2 * ns]
            if grids is None:
                hmax = max(c["h"] for c in frame["comps"])
                vmax = max(c["v"] for c in frame["comps"])
                mcus_x = -(-frame["w"] // (8 * hmax))
                mcus_y = -(-frame["h"] // (8 * vmax))
                grids = {
                    c["id"]: np.zeros((mcus_y * c["v"], mcus_x * c["h"], 64), np.int32)
                    for c in frame["comps"]
                }
            pos = _decode_progressive_scan(
                data, pos, frame, scan, grids, huff_dc, huff_ac,
                restart_interval, ss, se, ahal >> 4, ahal & 0x0F,
            )
    if progressive and grids is not None and dc_only:
        if not saw_eoi:
            raise ValueError("corrupt JPEG: truncated stream")
        comps = frame["comps"]
        prec = frame.get("prec", 8)
        maxv = (1 << prec) - 1
        hmax = max(c["h"] for c in comps)
        vmax = max(c["v"] for c in comps)
        img = _idct_and_assemble(
            frame["h"], frame["w"], comps,
            [grids[c["id"]] for c in comps], qtabs, hmax, vmax, prec,
        ).astype(np.float64)
        h0, w0 = img.shape[:2]
        ph, pw = -(-h0 // 8) * 8, -(-w0 // 8) * 8
        img = np.pad(img, ((0, ph - h0), (0, pw - w0), (0, 0)), mode="edge")
        bm = img.reshape(ph // 8, 8, pw // 8, 8, 3).mean(axis=(1, 3))
        return np.clip(bm, 0, maxv).astype(np.uint8 if prec == 8 else np.uint16)
    if progressive and grids is not None:
        # Strict contract: a progressive stream cut off between scans is
        # truncated data, not a smaller-but-valid image (a lenient viewer
        # would render the partial refinement; a data pipeline must not
        # silently accept it).
        if not saw_eoi:
            raise ValueError("corrupt JPEG: truncated stream")
        comps = frame["comps"]
        hmax = max(c["h"] for c in comps)
        vmax = max(c["v"] for c in comps)
        return _idct_and_assemble(
            frame["h"], frame["w"], comps,
            [grids[c["id"]] for c in comps], qtabs, hmax, vmax,
            frame.get("prec", 8),
        )
    raise ValueError("corrupt JPEG: no SOS marker")


def _lossless_predict(plane, y: int, x: int, predictor: int, default: int = 128) -> int:
    """T.81 H.1 sample prediction, shared verbatim by the SOF3 encoder and
    decoder so round-trips are exact by construction: the scan's first
    sample predicts 2^(P-1) (``default``), the rest of the first line
    predicts Ra (left), the first column predicts Rb (above), and interior
    samples use the selected predictor 1-7."""
    if y == 0 and x == 0:
        return default
    if y == 0:
        return int(plane[0, x - 1])
    if x == 0:
        return int(plane[y - 1, 0])
    ra, rb, rc = int(plane[y, x - 1]), int(plane[y - 1, x]), int(plane[y - 1, x - 1])
    if predictor == 1:
        return ra
    if predictor == 2:
        return rb
    if predictor == 3:
        return rc
    if predictor == 4:
        return ra + rb - rc
    if predictor == 5:
        return ra + ((rb - rc) >> 1)
    if predictor == 6:
        return rb + ((ra - rc) >> 1)
    return (ra + rb) >> 1  # predictor 7


def _decode_lossless_scan(data, pos, frame, scan, huff_dc, predictor):
    """SOF3 lossless scan (T.81 Annex H, Huffman): per raster sample, a
    DC-style Huffman category + magnitude bits gives the prediction
    difference; reconstruction is (prediction + diff) mod 2^16. Components
    are interleaved one sample per MCU (sampling factors pinned 1x1 at the
    SOF parse). Rides the same 16-bit-LUT reader as the baseline path.
    Precision P is 2-16 (T.81 Table B.2 lossless range): the first sample
    predicts 2^(P-1), samples clamp to 2^P - 1. Output: (H, W, 3) — uint8
    for P <= 8, uint16 above — 1 component replicated to gray, 3 components
    taken as direct RGB (lossless JPEG carries no color transform)."""
    h0, w0 = frame["h"], frame["w"]
    prec = frame.get("prec", 8)
    default = 1 << (prec - 1)
    maxv = (1 << prec) - 1
    dtype = np.uint8 if prec <= 8 else np.uint16
    ncomp = len(scan)
    planes = [np.zeros((h0, w0), dtype=np.int32) for _ in range(ncomp)]
    luts = [_huff_lut(*huff_dc[td].spec) for _, td, _ta in scan]
    dlen = len(data)
    acc = 0
    nbits = 0
    mark = None

    def refill():
        nonlocal acc, nbits, pos, mark
        acc &= (1 << nbits) - 1
        while nbits < 16:
            if mark is not None:
                acc = (acc << 8) | 0xFF
                nbits += 8
                continue
            if pos >= dlen:
                raise ValueError("corrupt JPEG: truncated stream")
            b = data[pos]
            pos += 1
            if b == 0xFF:
                if pos >= dlen:
                    raise ValueError("corrupt JPEG: truncated stream")
                nxt = data[pos]
                if nxt == 0x00:
                    pos += 1
                else:
                    mark = nxt
                    pos += 1
                    acc = (acc << 8) | 0xFF
                    nbits += 8
                    continue
            acc = (acc << 8) | b
            nbits += 8

    for y in range(h0):
        for x in range(w0):
            for ci in range(ncomp):
                sym, ln = luts[ci]
                if nbits < 16:
                    refill()
                v16 = (acc >> (nbits - 16)) & 0xFFFF
                s = sym[v16]
                if s < 0:
                    raise ValueError("corrupt JPEG: invalid Huffman code")
                nbits -= ln[v16]
                if s == 16:  # T.81 H.2: category 16 carries no extra bits
                    diff = 32768
                elif s:
                    if nbits < s:
                        refill()
                    diff = (acc >> (nbits - s)) & ((1 << s) - 1)
                    nbits -= s
                    if diff < (1 << (s - 1)):
                        diff += 1 - (1 << s)
                else:
                    diff = 0
                px = _lossless_predict(planes[ci], y, x, predictor, default)
                planes[ci][y, x] = (px + diff) & 0xFFFF
    out = [np.clip(p, 0, maxv).astype(dtype) for p in planes]
    if ncomp == 1:
        return np.repeat(out[0][:, :, None], 3, axis=2)
    if ncomp == 3:
        return np.stack(out, axis=2)
    raise NotImplementedError(f"{ncomp}-component lossless JPEG not supported")


def encode_jpeg_lossless(
    pixels: np.ndarray, predictor: int = 4, precision: int | None = None
) -> bytes:
    """Encode (H, W) grayscale or (H, W, 3) RGB pixels as a lossless SOF3
    JPEG (T.81 Annex H): per-sample prediction differences, DC-style
    Huffman categories, components interleaved one sample per MCU, NO
    color transform or subsampling. Round-trips bit-exactly through
    ``decode_jpeg`` by construction (shared ``_lossless_predict``).

    ``precision`` defaults to 8 for uint8 input and 16 for anything wider;
    any P in 2..16 is accepted (samples must fit in P bits — the DICOM
    12/16-bit family). P > 8 switches to a fixed-length category table
    (Annex K's stops at 11) and mod-2^16 difference coding with the
    category-16 no-extra-bits case (H.2) for the ±32768 wrap."""
    if predictor < 1 or predictor > 7:
        raise ValueError(f"invalid lossless predictor {predictor}")
    arr = np.asarray(pixels)
    if precision is None:
        precision = 8 if arr.dtype == np.uint8 else 16
    if not 2 <= precision <= 16:
        raise ValueError(f"precision must be in 2..16 (got {precision})")
    if arr.max(initial=0) > (1 << precision) - 1:
        raise ValueError(f"samples exceed {precision}-bit range")
    default = 1 << (precision - 1)
    gray = arr.ndim == 2
    arr3 = arr[:, :, None] if gray else arr
    h, w, ncomp = arr3.shape
    if ncomp not in (1, 3):
        raise ValueError(f"unsupported channel count {ncomp}")
    if precision <= 8:
        dc_spec = (DC_LUMA_BITS, DC_LUMA_VALS)
    else:
        dc_spec = _fixed_length_table(list(range(17)))
    codes = _build_huffman_codes(*dc_spec)
    bw = _BitWriter()
    planes = [arr3[:, :, c].astype(np.int32) for c in range(ncomp)]
    for y in range(h):
        for x in range(w):
            for ci in range(ncomp):
                px = _lossless_predict(planes[ci], y, x, predictor, default)
                # T.81 H.1.2.1: differences are mod 2^16 — fold into
                # [-32768, 32767]; the -32768 case is category 16 with no
                # extra bits (decoder adds +32768 ≡ -32768 mod 2^16)
                diff = ((int(planes[ci][y, x]) - px + 32768) & 0xFFFF) - 32768
                if diff == -32768:
                    code, length = codes[16]
                    bw.write(code, length)
                    continue
                s = _csize(diff)
                code, length = codes[s]
                bw.write(code, length)
                if s:
                    v = diff if diff >= 0 else diff + (1 << s) - 1
                    bw.write(v, s)
    entropy = bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    dht = seg(
        0xC4,
        bytes([0x00]) + bytes(dc_spec[0]) + bytes(dc_spec[1]),
    )
    sof = seg(
        0xC3,
        struct.pack(">BHHB", precision, h, w, ncomp)
        + b"".join(struct.pack("BBB", 1 + c, 0x11, 0) for c in range(ncomp)),
    )
    sos = seg(
        0xDA,
        bytes([ncomp])
        + b"".join(bytes([1 + c, 0x00]) for c in range(ncomp))
        + bytes([predictor, 0, 0]),  # Ss=predictor, Se=0, AhAl=0
    )
    return b"\xff\xd8" + dht + sof + sos + entropy + b"\xff\xd9"


#: SOF markers for variants behind the codec-library seam (progressive/
#: lossless arithmetic coding, differential/hierarchical modes). Sequential
#: arithmetic (SOF9, 0xC9) is SUPPORTED — see operators/jpeg_arith.py.
_UNSUPPORTED_SOF = frozenset({0xC5, 0xC6, 0xC7, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF})


def sniff_jpeg_frame(payload: bytes) -> tuple[int, int, int, int]:
    """(sof_marker, precision, height, width) from the SOF header via a
    marker walk that SKIPS segment bodies — no table builds, no entropy
    decode, O(header markers). The shared sniff of ``peek_jpeg_dims`` and
    ``decode_jpeg``'s seam rejection."""
    if payload is None or len(payload) < 4 or payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("corrupt JPEG: expected marker")
        marker = payload[pos + 1]
        pos += 2
        if marker in (0x01, 0xD9, *range(0xD0, 0xD8)):
            continue
        (seglen,) = struct.unpack_from(">H", payload, pos)
        if marker in (0xC0, 0xC1, 0xC2, 0xC3, 0xC9, *_UNSUPPORTED_SOF):
            if pos + 7 > len(payload):
                raise ValueError("corrupt JPEG: truncated stream")
            prec, h0, w0 = struct.unpack_from(">BHH", payload, pos + 2)
            return marker, prec, h0, w0
        pos += seglen
    raise ValueError("corrupt JPEG: no SOF marker")


def peek_jpeg_dims(payload: bytes) -> tuple[int, int]:
    """(height, width) from the SOF header via a marker walk — no entropy
    decode, O(header bytes). Lets callers choose a decode path (DC-only vs
    full) before paying for either."""
    _, _, h0, w0 = sniff_jpeg_frame(payload)
    return h0, w0


def decode_jpeg_dc(payload: bytes) -> np.ndarray:
    """Thumbnail decode: the (ceil(H/8), ceil(W/8), 3) uint8 block-mean
    image from DC coefficients only — the IDCT of a DC-only block is the
    constant ``dc * q0 / 8``, so this skips AC sign-extension/coefficient
    stores, dequantization, IDCT, upsampling, and the full-resolution color
    transform (AC Huffman codes still have to be *walked* to find block
    boundaries — JPEG has no block index). Perceptual hashing (dHash is
    computed from an 8x9 area-mean anyway) rides this path: VERDICT r05
    task #3, the standard libjpeg `scale_denom=8` trick."""
    return decode_jpeg(payload, dc_only=True)


def _decode_scan(
    data, pos, frame, scan, qtabs, huff_dc, huff_ac, restart_interval, dc_only=False
):
    """Baseline-sequential entropy scan via the 16-bit-peek Huffman LUT and
    an integer-accumulator bit reader (the libjpeg fast path, re-derived
    from T.81 F.2): one table lookup per symbol instead of a bit-by-bit
    canonical walk — profiled ~5x over the `_BitReader` loop, which remains
    the progressive (Annex G) path's reader.

    ``dc_only=True`` decodes DC terms only and *skips* AC magnitudes without
    materializing them (codes still have to be walked — JPEG has no block
    index — but no sign-extension, no coefficient stores, no IDCT): returns
    the 1/8-scale block-mean image via ``_dc_assemble``. This is the
    standard thumbnail-decode trick perceptual hashing rides on."""
    h0, w0 = frame["h"], frame["w"]
    hmax = max(c["h"] for c, _, _ in scan)
    vmax = max(c["v"] for c, _, _ in scan)
    mcus_x = -(-w0 // (8 * hmax))
    mcus_y = -(-h0 // (8 * vmax))
    # per scan component: coefficient grids (full) or DC grids (dc_only)
    if dc_only:
        dc_grids = [
            np.zeros((mcus_y * c["v"], mcus_x * c["h"]), dtype=np.int32)
            for c, _, _ in scan
        ]
        grids = None
    else:
        grids = [
            np.zeros((mcus_y * c["v"], mcus_x * c["h"], 64), dtype=np.int32)
            for c, _, _ in scan
        ]
        dc_grids = None
    luts = [
        (*_huff_lut(*huff_dc[td].spec), *_huff_lut(*huff_ac[ta].spec))
        for _, td, ta in scan
    ]
    dlen = len(data)
    acc = 0
    nbits = 0
    mark = None  # marker byte hit while refilling (entropy data exhausted)

    def refill():
        # top up the accumulator to >= 16 buffered bits, un-stuffing 0xFF00
        # and switching to 1-bit padding once a marker is hit (the original
        # `_BitReader` semantics, amortized to one call per symbol at most)
        nonlocal acc, nbits, pos, mark
        acc &= (1 << nbits) - 1
        while nbits < 16:
            if mark is not None:
                acc = (acc << 8) | 0xFF
                nbits += 8
                continue
            if pos >= dlen:
                raise ValueError("corrupt JPEG: truncated stream")
            b = data[pos]
            pos += 1
            if b == 0xFF:
                if pos >= dlen:
                    raise ValueError("corrupt JPEG: truncated stream")
                nxt = data[pos]
                if nxt == 0x00:
                    pos += 1
                else:
                    mark = nxt
                    pos += 1
                    acc = (acc << 8) | 0xFF
                    nbits += 8
                    continue
            acc = (acc << 8) | b
            nbits += 8

    pred = [0] * len(scan)
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                # byte-align: drop buffered bits, consume the RSTn marker
                n = mcu_count // restart_interval - 1
                acc = 0
                nbits = 0
                if mark is None:
                    if pos + 1 >= dlen:
                        raise ValueError("corrupt JPEG: truncated stream")
                    if data[pos] == 0xFF:
                        mark = data[pos + 1]
                        pos += 2
                if mark != 0xD0 + (n % 8):
                    raise ValueError(
                        f"corrupt JPEG: expected RST{n % 8}, got {mark:#x}"
                        if mark is not None
                        else "corrupt JPEG: missing restart marker"
                    )
                mark = None
                pred = [0] * len(scan)
            for si, (comp, _td, _ta) in enumerate(scan):
                dc_sym, dc_len, ac_sym, ac_len = luts[si]
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        # --- DC: one LUT hit + magnitude bits -------------
                        if nbits < 16:
                            refill()
                        v16 = (acc >> (nbits - 16)) & 0xFFFF
                        s = dc_sym[v16]
                        if s < 0:
                            raise ValueError("corrupt JPEG: invalid Huffman code")
                        nbits -= dc_len[v16]
                        if s:
                            if nbits < s:
                                refill()
                            diff = (acc >> (nbits - s)) & ((1 << s) - 1)
                            nbits -= s
                            if diff < (1 << (s - 1)):
                                diff += 1 - (1 << s)
                            pred[si] += diff
                        if dc_only:
                            dc_grids[si][
                                my * comp["v"] + by, mx * comp["h"] + bx
                            ] = pred[si]
                            zz = None
                        else:
                            zz = grids[si][my * comp["v"] + by, mx * comp["h"] + bx]
                            zz[0] = pred[si]
                        # --- AC: LUT hits; skip magnitudes when dc_only ---
                        k = 1
                        while k < 64:
                            if nbits < 16:
                                refill()
                            v16 = (acc >> (nbits - 16)) & 0xFFFF
                            rs = ac_sym[v16]
                            if rs < 0:
                                raise ValueError("corrupt JPEG: invalid Huffman code")
                            nbits -= ac_len[v16]
                            s = rs & 0x0F
                            if s == 0:
                                if rs == 0xF0:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += rs >> 4
                            if k > 63:
                                raise ValueError("corrupt JPEG: AC run past block end")
                            if nbits < s:
                                refill()
                            if dc_only:
                                nbits -= s  # skip magnitude bits unconverted
                            else:
                                m = (acc >> (nbits - s)) & ((1 << s) - 1)
                                nbits -= s
                                zz[k] = m + 1 - (1 << s) if m < (1 << (s - 1)) else m
                            k += 1
            mcu_count += 1
    comps = [comp for comp, _, _ in scan]
    prec = frame.get("prec", 8)
    if dc_only:
        return _dc_assemble(h0, w0, comps, dc_grids, qtabs, hmax, vmax, prec)
    return _idct_and_assemble(h0, w0, comps, grids, qtabs, hmax, vmax, prec)


def _planes_to_rgb(planes, prec):
    """Shared colour tail: grayscale replication or YCbCr→RGB at the frame's
    sample precision — centre 2^(P-1), clamp to 2^P - 1, uint8 for 8-bit
    frames and uint16 for 12-bit (T.81 extended sequential)."""
    center = float(1 << (prec - 1))
    maxv = (1 << prec) - 1
    dtype = np.uint8 if prec == 8 else np.uint16
    if len(planes) == 1:
        y = np.clip(planes[0], 0, maxv).astype(dtype)
        return np.repeat(y[:, :, None], 3, axis=2)
    y, cb, cr = planes
    r = y + 1.402 * (cr - center)
    g = y - 0.344136 * (cb - center) - 0.714136 * (cr - center)
    b = y + 1.772 * (cb - center)
    return np.clip(np.stack([r, g, b], axis=2), 0, maxv).astype(dtype)


def _dc_assemble(h0, w0, comps, dc_grids, qtabs, hmax, vmax, prec=8):
    """Assemble the 1/8-scale block-mean image from DC coefficients: the
    IDCT of a DC-only block is the constant ``dc * q0 / 8`` (orthonormal
    basis), so dequantizing ONE coefficient per block replaces dequant +
    IDCT + full-res upsampling + full-res color transform. Chroma DC grids
    upsample by block replication; output is (ceil(H/8), ceil(W/8), 3)
    RGB at the frame precision's dtype."""
    bh, bw = -(-h0 // 8), -(-w0 // 8)
    center = float(1 << (prec - 1))
    planes = []
    for comp, grid in zip(comps, dc_grids):
        if comp["tq"] not in qtabs:
            raise ValueError("corrupt JPEG: missing quantization table")
        q0 = float(qtabs[comp["tq"]][0, 0])
        plane = grid.astype(np.float64) * (q0 / 8.0) + center
        plane = np.repeat(
            np.repeat(plane, vmax // comp["v"], axis=0), hmax // comp["h"], axis=1
        )
        planes.append(plane[:bh, :bw])
    return _planes_to_rgb(planes, prec)


def _idct_and_assemble(h0, w0, comps, grids, qtabs, hmax, vmax, prec=8):
    """Dequantize + batched IDCT per component grid, upsample to full
    resolution, YCbCr→RGB (or replicate grayscale). Shared tail of the
    baseline and progressive decode paths."""
    center = float(1 << (prec - 1))
    planes = []
    for comp, grid in zip(comps, grids):
        if comp["tq"] not in qtabs:
            raise ValueError("corrupt JPEG: missing quantization table")
        q = qtabs[comp["tq"]].reshape(64)[ZIGZAG]  # zigzag-order dequant
        coefs = (grid * q)[:, :, UNZIGZAG].reshape(
            grid.shape[0], grid.shape[1], 8, 8
        )
        blocks = np.einsum("ji,rcjk,kl->rcil", _A, coefs.astype(np.float64), _A)
        rows, cols = blocks.shape[:2]
        plane = blocks.transpose(0, 2, 1, 3).reshape(rows * 8, cols * 8) + center
        plane = np.repeat(np.repeat(plane, vmax // comp["v"], axis=0), hmax // comp["h"], axis=1)
        planes.append(plane[:h0, :w0])
    return _planes_to_rgb(planes, prec)


# --- progressive (SOF2) scan decoding — T.81 Annex G, Huffman ----------------


def _require_table(tabs: dict, idx: int, kind: str) -> "_HuffDecoder":
    if idx not in tabs:
        raise ValueError(f"corrupt JPEG: missing {kind} Huffman table {idx}")
    return tabs[idx]


def _ac_first_block(br, dec, zz, ss, se, al, eobrun) -> int:
    """AC first scan (Ah=0) for one block: spectral band [ss, se], values
    scaled by 2^al, EOBn codes start a run of end-of-band blocks."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = dec.decode(br)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r != 15:
                eobrun = (1 << r) - 1
                if r:
                    eobrun += br.receive(r)
                break
            k += 16  # ZRL
        else:
            k += r
            if k > se:
                raise ValueError("corrupt JPEG: AC run past band end")
            zz[k] = _extend(br.receive(s), s) << al
            k += 1
    return eobrun


def _ac_refine_block(br, dec, zz, ss, se, al, eobrun) -> int:
    """AC refinement scan (Ah=Al+1) for one block: one correction bit per
    already-nonzero coefficient in the band, (run, 1)-coded newly-nonzero
    coefficients, EOB runs whose covered blocks still consume correction
    bits (T.81 G.1.2.3; control flow mirrors the reference algorithm)."""
    p1 = 1 << al
    m1 = -1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = dec.decode(br)
            r, s = rs >> 4, rs & 0x0F
            sval = 0
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += br.receive(r)
                    break  # rest of band handled by the EOB-run path below
                # ZRL: skip 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError("corrupt JPEG: invalid refinement size")
                sval = p1 if br.read_bit() else m1
            # advance past r zero-history coefficients, emitting correction
            # bits for every nonzero-history coefficient crossed
            while k <= se:
                if zz[k] != 0:
                    if br.read_bit() and (zz[k] & p1) == 0:
                        zz[k] += p1 if zz[k] >= 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if sval:
                if k > se:
                    raise ValueError("corrupt JPEG: refinement past band end")
                zz[k] = sval
            k += 1
    if eobrun > 0:
        # this block is inside an end-of-band run: only correction bits for
        # its remaining nonzero-history coefficients
        while k <= se:
            if zz[k] != 0:
                if br.read_bit() and (zz[k] & p1) == 0:
                    zz[k] += p1 if zz[k] >= 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def _next_marker_pos(br: "_BitReader") -> int:
    """Offset of the next non-RST marker after a decoded scan (pointing at
    its 0xFF). The bit reader may already have consumed it mid-fill."""
    if br.marker is not None and not (0xD0 <= br.marker <= 0xD7):
        return br.pos - 2
    p, data = br.pos, br.data
    while p + 1 < len(data):
        if data[p] == 0xFF and data[p + 1] != 0x00 and not (
            0xD0 <= data[p + 1] <= 0xD7
        ):
            return p
        p += 1
    raise ValueError("corrupt JPEG: truncated stream")


def _decode_progressive_scan(
    data, pos, frame, scan, grids, huff_dc, huff_ac,
    restart_interval, ss, se, ah, al,
):
    """Decode ONE progressive scan into the persistent per-component
    coefficient grids; returns the offset of the next marker. DC scans
    (Ss=0) may be interleaved; AC scans are single-component per T.81."""
    h0, w0 = frame["h"], frame["w"]
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    if ss == 0 and se != 0:
        raise ValueError("corrupt JPEG: DC scan with nonzero spectral end")
    if ss > 63 or se > 63 or se < ss:
        raise ValueError("corrupt JPEG: bad spectral band")
    if ss > 0 and len(scan) != 1:
        raise ValueError("corrupt JPEG: interleaved AC scan")
    br = _BitReader(data, pos)
    pred = [0] * len(scan)
    eobrun = 0
    interleaved = len(scan) > 1
    if interleaved:
        units_x = -(-w0 // (8 * hmax))
        units_y = -(-h0 // (8 * vmax))
    else:
        comp = scan[0][0]
        comp_w = -(-(w0 * comp["h"]) // hmax)
        comp_h = -(-(h0 * comp["v"]) // vmax)
        units_x = -(-comp_w // 8)
        units_y = -(-comp_h // 8)
    unit = 0
    for uy in range(units_y):
        for ux in range(units_x):
            if restart_interval and unit and unit % restart_interval == 0:
                br.align_and_expect_rst(unit // restart_interval - 1)
                pred = [0] * len(scan)
                eobrun = 0
            if ss == 0:  # DC scan
                for si, (comp, td, _ta) in enumerate(scan):
                    blocks = (
                        [(uy * comp["v"] + by, ux * comp["h"] + bx)
                         for by in range(comp["v"]) for bx in range(comp["h"])]
                        if interleaved else [(uy, ux)]
                    )
                    for by, bx in blocks:
                        zz = grids[comp["id"]][by, bx]
                        if ah == 0:
                            s = _require_table(huff_dc, td, "DC").decode(br)
                            diff = _extend(br.receive(s), s) if s else 0
                            pred[si] += diff
                            zz[0] = pred[si] << al
                        elif br.read_bit():
                            zz[0] |= 1 << al
            else:  # AC scan: single component, one block per unit
                comp, _td, ta = scan[0]
                zz = grids[comp["id"]][uy, ux]
                dec = _require_table(huff_ac, ta, "AC")
                if ah == 0:
                    eobrun = _ac_first_block(br, dec, zz, ss, se, al, eobrun)
                else:
                    eobrun = _ac_refine_block(br, dec, zz, ss, se, al, eobrun)
            unit += 1
    return _next_marker_pos(br)
