"""Pure-numpy baseline JPEG codec (ITU T.81 sequential DCT, Huffman).

Closes the last stubbed image path in functions/multimodal.py: BMP, PNG
and GIF already have real pure-numpy codecs; JPEG previously raised
NotImplementedError at the decode call site because PIL is absent from
the container. This module implements the BASELINE profile from the
public spec only:

* **encode**: 8-bit RGB or grayscale, 4:4:4 or 4:2:0 chroma subsampling
  (``subsampling="420"`` — 2x2 box-averaged chroma, 2x2-factor luma
  MCUs), JFIF APP0, Annex-K quantization tables scaled by ``quality``,
  Annex-K Huffman tables, standard zigzag + DC-differential entropy
  coding with 0xFF byte stuffing.
* **decode**: baseline sequential SOF0, Huffman tables read from the
  FILE's DHT segments (so real-world baseline JPEGs decode with their
  own tables), DRI/RSTn restart markers, grayscale or 3-component YCbCr
  with arbitrary integer-ratio sampling factors (4:4:4, 4:2:0, 4:2:2,
  4:4:0 — 4:2:0 is what virtually every camera/web JPEG ships).
  Progressive (SOF2) streams raise ``NotImplementedError`` — honestly
  partial, like the mp4 pixel-decode stub, rather than silently wrong.

Everything numeric is vectorized numpy (matrix DCT over all blocks at
once); the only per-element Python is the Huffman bit stream, which is
inherent to the format. No reference analogue: the reference repo has no
media path at all — this belongs to the multimodal mandate of the
training-data pipeline.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# constants (ITU T.81 Annex K — public spec tables)
# ---------------------------------------------------------------------------

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)
_UNZIG = np.argsort(ZIGZAG)

#: K.1 luminance / K.2 chrominance quantization tables (natural order)
QUANT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
QUANT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)

# Annex-K Huffman specs: (BITS[1..16], HUFFVAL)
DC_LUMA_SPEC = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
DC_CHROMA_SPEC = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
AC_LUMA_SPEC = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
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
    ],
)
AC_CHROMA_SPEC = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
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
    ],
)

# orthonormal 8-point DCT-II basis: coeffs = T @ block @ T.T
_T = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _T[_k, _n] = np.cos((2 * _n + 1) * _k * np.pi / 16) * (
            np.sqrt(1 / 8) if _k == 0 else np.sqrt(2 / 8)
        )


def _huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), canonical (T.81 C.2)."""
    if sum(bits) != len(vals):
        raise ValueError("BITS/HUFFVAL length mismatch")
    out: dict[int, tuple[int, int]] = {}
    code = 0
    i = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            if code >= (1 << length):
                raise ValueError("Huffman spec overflows code space")
            out[vals[i]] = (code, length)
            code += 1
            i += 1
        code <<= 1
    return out


def _scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG-style quality scaling of a base table (public libjpeg formula)."""
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (base * scale + 50) // 100
    return np.clip(q, 1, 255)


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


def _magnitude(v: int) -> tuple[int, int]:
    """(category, value-bits) for a DC diff / AC coefficient (F.1.2.1)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    cat = a.bit_length()
    bits = v if v > 0 else v + (1 << cat) - 1
    return cat, bits


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def put(self, code: int, length: int) -> None:
        if length == 0:
            return
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            self._n -= 8
            byte = (self._acc >> self._n) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)

    def flush(self) -> bytes:
        if self._n:
            pad = 8 - self._n
            self.put((1 << pad) - 1, pad)  # 1-fill (F.1.2.3)
        return bytes(self.out)


def _encode_component(
    writer: _BitWriter,
    blocks: np.ndarray,
    dc_codes: dict,
    ac_codes: dict,
    pred: int,
) -> int:
    """Entropy-encode one component's (N, 64) zigzag-quantized blocks."""
    for zz in blocks:
        diff = int(zz[0]) - pred
        pred = int(zz[0])
        cat, bits = _magnitude(diff)
        code, ln = dc_codes[cat]
        writer.put(code, ln)
        writer.put(bits, cat)
        run = 0
        nz = np.nonzero(zz[1:])[0]
        last = nz[-1] + 1 if nz.size else 0
        for k in range(1, last + 1):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = ac_codes[0xF0]  # ZRL
                writer.put(code, ln)
                run -= 16
            cat, bits = _magnitude(v)
            code, ln = ac_codes[(run << 4) | cat]
            writer.put(code, ln)
            writer.put(bits, cat)
            run = 0
        if last < 63:
            code, ln = ac_codes[0x00]  # EOB
            writer.put(code, ln)
    return pred


def _blockify(plane: np.ndarray) -> np.ndarray:
    """(H, W) float plane (level-shifted) -> (N, 8, 8) edge-padded blocks."""
    h, w = plane.shape
    ph, pw = (-h) % 8, (-w) % 8
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    hh, ww = plane.shape
    return (
        plane.reshape(hh // 8, 8, ww // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )


#: luma sampling factors (fh, fv) per subsampling mode; chroma is always
#: 1x1, so chroma is stored at (1/fh, 1/fv) of luma resolution.
_SUBSAMPLE_FACTORS = {"444": (1, 1), "422": (2, 1), "420": (2, 2)}


def _pad_edge(plane: np.ndarray, mh: int, mw: int) -> np.ndarray:
    """Edge-replicate pad a (H, W) plane to multiples of (mh, mw)."""
    h, w = plane.shape
    ph, pw = (-h) % mh, (-w) % mw
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return plane


def jpeg_encode(
    pixels: np.ndarray, quality: int = 90, subsampling: str = "444"
) -> bytes:
    """Baseline JFIF encode of (H, W) grayscale or (H, W, 3) RGB uint8.

    ``subsampling="444"`` keeps full-resolution chroma (1x1 factors);
    ``"420"`` box-averages chroma 2x2 and interleaves 2x2-factor luma MCUs
    — the layout virtually every real-world baseline JPEG uses; ``"422"``
    halves chroma horizontally only (2x1 luma factors). Grayscale input
    ignores the flag (there is no chroma to subsample)."""
    if subsampling not in _SUBSAMPLE_FACTORS:
        raise ValueError("subsampling must be '444', '422' or '420'")
    px = np.asarray(pixels)
    if px.ndim == 2:
        px = px[:, :, None]
    if px.ndim != 3 or px.shape[2] not in (1, 3):
        raise ValueError("expected (H, W), (H, W, 1) or (H, W, 3) uint8 pixels")
    h, w, nc = px.shape
    px = px.astype(np.float64)
    if nc == 3:
        r, g, b = px[:, :, 0], px[:, :, 1], px[:, :, 2]
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
    else:
        planes = [px[:, :, 0]]
    fh, fv = _SUBSAMPLE_FACTORS[subsampling] if nc == 3 else (1, 1)
    qluma = _scaled_quant(QUANT_LUMA, quality)
    qchroma = _scaled_quant(QUANT_CHROMA, quality)
    quants = [qluma] + [qchroma] * (len(planes) - 1)

    def dct_quant(blocks: np.ndarray, q: np.ndarray) -> np.ndarray:
        coef = np.einsum("kn,bnm,lm->bkl", _T, blocks, _T)
        return np.round(coef.reshape(-1, 64)[:, ZIGZAG] / q[ZIGZAG]).astype(np.int64)

    comps_zz = []  # per component: (n_mcu, blocks_per_mcu, 64) in MCU order
    if (fh, fv) != (1, 1):
        # MCU = (8*fv)x(8*fh) pixels: fh*fv raster-order luma blocks + one
        # block per chroma plane box-averaged (fv, fh) (pad first so the
        # average never mixes replicated and real pixels asymmetrically
        # across blocks).
        mcuh, mcuw = 8 * fv, 8 * fh
        mcuy, mcux = -(-h // mcuh), -(-w // mcuw)
        n_mcu = mcuy * mcux
        y = _pad_edge(planes[0], mcuh, mcuw) - 128.0
        yb = (
            y.reshape(mcuy, fv, 8, mcux, fh, 8)
            .transpose(0, 3, 1, 4, 2, 5)
            .reshape(n_mcu * fv * fh, 8, 8)
        )
        comps_zz.append(dct_quant(yb, qluma).reshape(n_mcu, fv * fh, 64))
        for cplane in planes[1:]:
            csub = (
                _pad_edge(cplane, mcuh, mcuw)
                .reshape(mcuy * 8, fv, mcux * 8, fh)
                .mean(axis=(1, 3))
                - 128.0
            )
            cb = (
                csub.reshape(mcuy, 8, mcux, 8)
                .transpose(0, 2, 1, 3)
                .reshape(n_mcu, 8, 8)
            )
            comps_zz.append(dct_quant(cb, qchroma).reshape(n_mcu, 1, 64))
    else:
        # 1x1 factors: MCU = one block per component, raster order
        for plane, q in zip(planes, quants):
            zz = dct_quant(_blockify(plane - 128.0), q)
            comps_zz.append(zz.reshape(-1, 1, 64))

    dc_l = _huff_codes(*DC_LUMA_SPEC)
    ac_l = _huff_codes(*AC_LUMA_SPEC)
    dc_c = _huff_codes(*DC_CHROMA_SPEC)
    ac_c = _huff_codes(*AC_CHROMA_SPEC)
    writer = _BitWriter()
    preds = [0] * len(planes)
    for b in range(comps_zz[0].shape[0]):
        for ci, zz in enumerate(comps_zz):
            dc, ac = (dc_l, ac_l) if ci == 0 else (dc_c, ac_c)
            preds[ci] = _encode_component(writer, zz[b], dc, ac, preds[ci])
    scan = writer.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, b"\x00" + bytes(qluma[ZIGZAG].astype(np.uint8)))
    if len(planes) > 1:
        out += seg(0xDB, b"\x01" + bytes(qchroma[ZIGZAG].astype(np.uint8)))
    sof = struct.pack(">BHHB", 8, h, w, len(planes))
    for ci in range(len(planes)):
        hv = (fh << 4) | fv if ci == 0 else 0x11
        sof += struct.pack(">BBB", ci + 1, hv, 0 if ci == 0 else 1)
    out += seg(0xC0, sof)
    for tc_th, spec in (
        (0x00, DC_LUMA_SPEC),
        (0x10, AC_LUMA_SPEC),
        (0x01, DC_CHROMA_SPEC),
        (0x11, AC_CHROMA_SPEC),
    ):
        if len(planes) == 1 and tc_th in (0x01, 0x11):
            continue
        out += seg(0xC4, bytes([tc_th]) + bytes(spec[0]) + bytes(spec[1]))
    sos = bytes([len(planes)])
    for ci in range(len(planes)):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += b"\x00\x3f\x00"
    out += seg(0xDA, sos)
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


class _BitReader:
    """Entropy-segment bit reader with 0xFF00 unstuffing; stops at markers."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartMarker(nxt)
            else:
                raise EOFError("hit marker inside entropy data")
        else:
            self.pos += 1
        self._acc = (self._acc << 8) | b
        self._n += 8

    def bit(self) -> int:
        if self._n == 0:
            self._fill()
        self._n -= 1
        return (self._acc >> self._n) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align(self) -> None:
        self._acc = 0
        self._n = 0


class _RestartMarker(Exception):
    def __init__(self, marker: int) -> None:
        self.marker = marker


def _huff_decoder(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol lookup."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    i = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[i]
            code += 1
            i += 1
        code <<= 1
    return table


def _read_symbol(reader: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in scan")


def _extend(bits: int, cat: int) -> int:
    if cat == 0:
        return 0
    return bits if bits >= (1 << (cat - 1)) else bits - (1 << cat) + 1


def jpeg_decode(data: bytes) -> np.ndarray:
    """Decode a baseline sequential JPEG to (H, W) or (H, W, 3) uint8.

    Supports: SOF0, per-file DQT/DHT tables, DRI/RSTn, grayscale and
    3-component YCbCr at any integer-ratio sampling factors (4:4:4,
    4:2:0, 4:2:2, ...), nearest-neighbor chroma upsampling. Raises
    NotImplementedError for progressive SOFs."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue
        (ln,) = struct.unpack(">H", data[pos : pos + 2])
        body = data[pos + 2 : pos + ln]
        if marker == 0xDB:  # DQT
            bp = 0
            while bp < len(body):
                pq, tq = body[bp] >> 4, body[bp] & 0xF
                bp += 1
                if pq == 0:
                    tbl = np.frombuffer(body[bp : bp + 64], dtype=np.uint8).astype(
                        np.int64
                    )
                    bp += 64
                else:
                    tbl = np.frombuffer(
                        body[bp : bp + 128], dtype=">u2"
                    ).astype(np.int64)
                    bp += 128
                quant[tq] = tbl[_UNZIG]  # store natural order
        elif marker == 0xC4:  # DHT
            bp = 0
            while bp < len(body):
                tc, th = body[bp] >> 4, body[bp] & 0xF
                bits = list(body[bp + 1 : bp + 17])
                n = sum(bits)
                vals = list(body[bp + 17 : bp + 17 + n])
                (huff_dc if tc == 0 else huff_ac)[th] = _huff_decoder(bits, vals)
                bp += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 (baseline/ext seq)
            precision, h, w, nc = struct.unpack(">BHHB", body[:6])
            if precision != 8:
                raise NotImplementedError("only 8-bit precision supported")
            comps = []
            for ci in range(nc):
                cid, hv, tq = body[6 + 3 * ci : 9 + 3 * ci]
                hi, vi = hv >> 4, hv & 0xF
                if not (1 <= hi <= 4 and 1 <= vi <= 4):
                    raise ValueError(f"bad sampling factors {hi}x{vi}")
                comps.append((cid, tq, hi, vi))
            frame = (h, w, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError("progressive/hierarchical JPEG not supported")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan_tabs = []
            for si in range(ns):
                cs, tdta = body[1 + 2 * si : 3 + 2 * si]
                scan_tabs.append((cs, tdta >> 4, tdta & 0xF))
            h, w, comps = frame
            if ns != len(comps):
                raise NotImplementedError(
                    "non-interleaved multi-scan baseline not supported"
                )
            comp_by_id = {c[0]: c for c in comps}
            scan_comps = [comp_by_id[cs] for cs, _, _ in scan_tabs]
            hmax = max(c[2] for c in comps)
            vmax = max(c[3] for c in comps)
            mcux = (w + 8 * hmax - 1) // (8 * hmax)
            mcuy = (h + 8 * vmax - 1) // (8 * vmax)
            n_mcu = mcux * mcuy
            coefs = [
                np.zeros((n_mcu, c[2] * c[3], 64), dtype=np.int64)
                for c in scan_comps
            ]
            reader = _BitReader(data, pos + ln)
            preds = [0] * len(comps)
            mcu = 0
            while mcu < n_mcu:
                try:
                    for si, (cs, td, ta) in enumerate(scan_tabs):
                        dc_tab, ac_tab = huff_dc[td], huff_ac[ta]
                        _, _, hi, vi = scan_comps[si]
                        for bi in range(hi * vi):
                            zz = coefs[si][mcu, bi]
                            cat = _read_symbol(reader, dc_tab)
                            diff = _extend(reader.bits(cat), cat)
                            preds[si] += diff
                            zz[0] = preds[si]
                            k = 1
                            while k <= 63:
                                rs = _read_symbol(reader, ac_tab)
                                run, cat = rs >> 4, rs & 0xF
                                if cat == 0:
                                    if run == 15:
                                        k += 16
                                        continue
                                    break  # EOB
                                k += run
                                if k > 63:
                                    raise ValueError("AC run past block end")
                                zz[k] = _extend(reader.bits(cat), cat)
                                k += 1
                    mcu += 1
                except _RestartMarker:
                    # RSTn sits between MCUs: re-align, skip the marker, reset
                    # the DC predictors and retry the same MCU (DRI interval
                    # itself needs no bookkeeping — the marker IS the signal).
                    # Pad bits before the marker can decode as a short symbol
                    # first, so the aborted attempt may have scribbled into
                    # this MCU's coefficients — zero them before the retry.
                    for c in coefs:
                        c[mcu, :, :] = 0
                    reader.align()
                    reader.pos += 2
                    preds = [0] * len(comps)
            # reconstruct planes: blocks land at grid (my*vi+dy, mx*hi+dx),
            # then nearest-neighbor upsample each plane to the hmax/vmax grid
            planes = []
            for si, (cs, td, ta) in enumerate(scan_tabs):
                cid, tq, hi, vi = scan_comps[si]
                q = quant[tq]
                nat = np.zeros((n_mcu, hi * vi, 64), dtype=np.float64)
                nat[:, :, ZIGZAG] = coefs[si]
                nat *= q[None, None, :]
                blocks = nat.reshape(-1, 8, 8)
                pix = np.einsum("kn,bkl,lm->bnm", _T, blocks, _T) + 128.0
                full = (
                    pix.reshape(mcuy, mcux, vi, hi, 8, 8)
                    .transpose(0, 2, 4, 1, 3, 5)
                    .reshape(mcuy * vi * 8, mcux * hi * 8)
                )
                if hi != hmax or vi != vmax:
                    if hmax % hi or vmax % vi:
                        raise NotImplementedError(
                            "non-integer chroma upsampling ratios not supported"
                        )
                    full = np.repeat(
                        np.repeat(full, vmax // vi, axis=0), hmax // hi, axis=1
                    )
                planes.append(full[:h, :w])
            if len(planes) == 1:
                return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
            y, cb, cr = planes
            cb = cb - 128.0
            cr = cr - 128.0
            r = y + 1.402 * cr
            g = y - 0.344136 * cb - 0.714136 * cr
            b = y + 1.772 * cb
            rgb = np.stack([r, g, b], axis=2)
            return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
        else:
            pass  # APPn/COM/unknown: skip
        pos += ln
    raise ValueError("no scan data found (missing SOS)")
