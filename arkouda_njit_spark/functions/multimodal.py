"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real (schema, partition-aware batch processing,
Arrow batch shapes). Codec status per path:

* ``decode="bmp"`` — a REAL, pure-numpy codec for uncompressed 24-bit
  BI_RGB Windows bitmaps (encode + decode + nearest-neighbour resize), no
  external library needed; exercises the full decode→pixels→re-encode path.
* ``decode="png"`` — a REAL, pure-numpy + stdlib-zlib codec for 8-bit
  greyscale/RGB/RGBA non-interlaced PNG: chunk walk with CRC checks,
  DEFLATE via ``zlib``, all five scanline filters (None/Sub/Up/Average/
  Paeth) on both encode and decode.
* ``decode="gif"`` — a REAL, pure-python GIF89a codec: genuine LZW
  (variable-width codes, table clears, KwKwK case, deferred-clear
  tolerant) with palette encode/decode; validated against the canonical
  minimal GIF byte sequence, not just its own round trip.
* ``decode="jpeg"`` — a REAL, pure-numpy baseline JPEG codec
  (functions/jpeg.py: matrix DCT, Annex-K quant/Huffman tables, byte
  stuffing, per-file DHT on decode; 4:4:4 + grayscale — progressive and
  subsampled streams raise).
* ``decode="wav"`` — a REAL, pure-numpy codec for PCM-16 RIFF/WAVE audio
  (chunk-walking decode + encode + windowed-RMS features).
* ``decode="mp4"`` (sample_frames) — a REAL, pure-stdlib ISO BMFF
  demuxer (functions/mp4.py): box-tree walk + full stbl sample-table
  expansion (stts/ctts/stss/stsz/stsc/stco/co64) yielding per-frame byte
  ranges, timestamps and keyframe flags; the H.264 pixel decode below it
  is the honest NotImplementedError.
* ``decode="fake"`` — deterministic content-derived stand-in so the
  distributed pipeline is testable end-to-end on arbitrary bytes.
* ``decode="real"`` — raises NotImplementedError at the exact call site
  where PIL/soundfile/pyav would plug in (not shipped here; of the image
  formats only exotic ones — WebP/AVIF — still need it).

Schema convention:

  media(media_id long, kind string in {image,audio,video},
        data binary, meta map<string,string>)

Every operator is ``mapInPandas`` — per-partition Arrow batches, no per-row
Python round trips.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = "media_id long, kind string, data binary, meta map<string,string>"

FEATURE_SCHEMA = "media_id long, kind string, n_bytes int, feature array<float>"


# ---------------------------------------------------------------------------
# pure-numpy BMP codec (24-bit uncompressed BI_RGB, bottom-up rows)
# ---------------------------------------------------------------------------


def bmp_encode(pixels: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a 24-bit BI_RGB .bmp."""
    if pixels.ndim != 3 or pixels.shape[2] != 3 or pixels.dtype != np.uint8:
        raise ValueError("bmp_encode expects an (h, w, 3) uint8 array")
    h, w, _ = pixels.shape
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    stride = row_bytes + pad
    img_size = stride * h
    # pixel rows are stored bottom-up, channels as BGR
    bgr = pixels[::-1, :, ::-1]
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :row_bytes] = bgr.reshape(h, row_bytes)
    import struct

    header = struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    return header + info + rows.tobytes()


def bmp_decode(data: bytes) -> np.ndarray:
    """Decode a 24-bit uncompressed BI_RGB .bmp to an (h, w, 3) uint8 RGB
    array. Handles bottom-up (height > 0) and top-down (height < 0) rows."""
    import struct

    if len(data) < 54 or data[:2] != b"BM":
        raise ValueError("not a BMP file")
    pixel_off = struct.unpack_from("<I", data, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", data, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", data, 26)
    if hdr_size < 40 or bpp != 24 or compression != 0:
        raise ValueError(
            f"unsupported BMP variant (header={hdr_size}, bpp={bpp}, "
            f"compression={compression}); only 24-bit BI_RGB is implemented"
        )
    top_down = h < 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    raw = np.frombuffer(data, dtype=np.uint8, count=stride * h, offset=pixel_off)
    rows = raw.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR -> RGB


def bmp_resize_nearest(pixels: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbour resize of an (h, w, 3) array (pixel-center sampling)."""
    h, w, _ = pixels.shape
    ys = np.minimum(((np.arange(height) + 0.5) * h / height).astype(np.int64), h - 1)
    xs = np.minimum(((np.arange(width) + 0.5) * w / width).astype(np.int64), w - 1)
    return pixels[ys][:, xs]


def _bmp_feature(data: bytes, dim: int) -> np.ndarray:
    """REAL image feature from decoded BMP pixels: grayscale mean-pooled
    over a grid folded to ``dim`` cells, L2-normalized."""
    px = bmp_decode(data).astype("float64")
    gray = px.mean(axis=2).ravel()
    cells = np.arange(gray.size) % dim
    folded = np.bincount(cells, weights=gray, minlength=dim)[:dim]
    counts = np.bincount(cells, minlength=dim)[:dim]
    folded = (folded / np.maximum(counts, 1)).astype("float32")
    norm = np.linalg.norm(folded)
    return folded / norm if norm > 0 else folded


def _jpeg_feature(data: bytes, dim: int) -> np.ndarray:
    """REAL image feature from decoded JPEG pixels: grayscale mean-pooled
    over modulo-folded cells, L2-normalized (same shape as _bmp_feature)."""
    from .jpeg import jpeg_decode

    px = jpeg_decode(data).astype("float64")
    gray = px.mean(axis=2).ravel() if px.ndim == 3 else px.ravel()
    cells = np.arange(gray.size) % dim
    folded = np.bincount(cells, weights=gray, minlength=dim)[:dim]
    counts = np.bincount(cells, minlength=dim)[:dim]
    folded = (folded / np.maximum(counts, 1)).astype("float32")
    norm = np.linalg.norm(folded)
    return folded / norm if norm > 0 else folded


def _fake_feature(data: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in for a decoder: byte-histogram folded to dim
    via modulo binning (well-defined for ANY dim — the old truncate+reshape
    silently produced all-zero vectors for dim > 256)."""
    arr = np.frombuffer(data, dtype=np.uint8)
    hist = np.bincount(arr, minlength=256).astype("float64")
    folded = np.bincount(
        np.arange(256) % dim, weights=hist, minlength=dim
    )[:dim].astype("float32")
    norm = np.linalg.norm(folded)
    return folded / norm if norm > 0 else folded


def extract_features(
    media: DataFrame, dim: int = 16, decode: str = "fake"
) -> DataFrame:
    """Decode + feature-extract per media row (Arrow-batched).

    decode="real" marks where an actual codec (PIL.Image.open /
    soundfile.read / pyav) would be invoked — NOT IMPLEMENTED in this
    container, by design."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode == "real":
                raise NotImplementedError(
                    "real media decode requires PIL/soundfile/pyav, not present; "
                    "use decode='bmp'/'png'/'gif'/'jpeg'/'wav' (pure-numpy codecs) "
                    "or decode='fake'"
                )
            if decode == "bmp":
                feats = [
                    _bmp_feature(bytes(b) if b is not None else b"", dim).tolist()
                    for b in pdf["data"]
                ]
            elif decode == "png":
                feats = [
                    _png_feature(bytes(b) if b is not None else b"", dim).tolist()
                    for b in pdf["data"]
                ]
            elif decode == "gif":
                feats = [
                    _gif_feature(bytes(b) if b is not None else b"", dim).tolist()
                    for b in pdf["data"]
                ]
            elif decode == "jpeg":
                feats = [
                    _jpeg_feature(bytes(b) if b is not None else b"", dim).tolist()
                    for b in pdf["data"]
                ]
            elif decode == "wav":
                feats = [
                    _wav_feature(bytes(b) if b is not None else b"", dim).tolist()
                    for b in pdf["data"]
                ]
            else:
                feats = [
                    _fake_feature(bytes(b) if b is not None else b"", dim).tolist()
                    for b in pdf["data"]
                ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["data"].apply(lambda b: len(b) if b is not None else 0),
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


RESIZE_SCHEMA = "media_id long, kind string, data binary, meta map<string,string>"


def resize_images(media: DataFrame, width: int, height: int, decode: str = "fake") -> DataFrame:
    """Image resize. ``decode="bmp"`` / ``decode="png"`` are REAL paths:
    decode the bytes, nearest-neighbour resample, re-encode the same format
    — all numpy inside the Arrow batch. ``decode="fake"`` passes bytes
    through and only records the target size in meta (for other payloads)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode == "real":
                raise NotImplementedError(
                    "real resize of WebP/AVIF/etc requires PIL; use "
                    "decode='bmp'/'png'/'gif'/'jpeg' (pure-numpy codecs)"
                )
            metas, datas = [], []
            for m, b in zip(pdf["meta"], pdf["data"]):
                m = dict(m) if m is not None else {}
                m["resized_to"] = f"{width}x{height}"
                if decode == "bmp":
                    px = bmp_resize_nearest(bmp_decode(bytes(b)), width, height)
                    b = bmp_encode(px)
                elif decode == "png":
                    px = png_decode(bytes(b))
                    grey = px.ndim == 2
                    px = bmp_resize_nearest(px[:, :, None] if grey else px, width, height)
                    b = png_encode(px[:, :, 0] if grey else px)
                elif decode == "gif":
                    # nearest-neighbour keeps pixels a subset of the source
                    # palette, so the resized frame re-encodes losslessly
                    b = gif_encode(bmp_resize_nearest(gif_decode(bytes(b)), width, height))
                elif decode == "jpeg":
                    from .jpeg import jpeg_decode, jpeg_encode

                    px = jpeg_decode(bytes(b))
                    grey = px.ndim == 2
                    px = bmp_resize_nearest(
                        px[:, :, None] if grey else px, width, height
                    )
                    b = jpeg_encode(px[:, :, 0] if grey else px)
                metas.append(m)
                datas.append(b)
            out = pdf.copy()
            out["meta"] = metas
            out["data"] = datas
            yield out

    return media.filter(F.col("kind") == "image").mapInPandas(run, schema=RESIZE_SCHEMA)


FRAME_SCHEMA = "media_id long, frame_idx int, pts double, keyframe boolean, data binary"


def sample_frames(
    media: DataFrame,
    every_n_bytes: int = 1024,
    decode: str = "fake",
    keyframes_only: bool = False,
    every_n: int = 1,
) -> DataFrame:
    """Video frame sampling (one output row per selected frame/sample).

    ``decode="mp4"`` is the REAL container path: parse the ISO BMFF box
    tree (functions/mp4.py — moov/trak/stbl sample tables) and emit each
    selected sample's actual byte range with its presentation timestamp
    and keyframe flag, exactly what a demuxer hands a video codec.
    ``keyframes_only``/``every_n`` select sync samples / every nth sample
    WITHOUT touching the skipped payloads. Decoding the returned payload
    to pixels needs the codec layer (pyav/ffmpeg) — honestly absent.

    ``decode="fake"`` slices the byte stream at fixed strides (pts =
    stride index, all keyframes), keeping the explode-shaped plumbing
    testable on arbitrary bytes."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .mp4 import mp4_extract_samples

        for pdf in batches:
            if decode == "real":
                raise NotImplementedError("real frame sampling requires pyav/ffmpeg")
            ids, idxs, ptss, keys, datas = [], [], [], [], []
            for mid, b in zip(pdf["media_id"], pdf["data"]):
                b = bytes(b) if b is not None else b""
                if decode == "mp4":
                    for idx, pts, key, payload in mp4_extract_samples(
                        b, keyframes_only=keyframes_only, every_n=every_n
                    ):
                        ids.append(mid)
                        idxs.append(idx)
                        ptss.append(pts)
                        keys.append(key)
                        datas.append(payload)
                else:
                    for i in range(0, max(len(b), 1), every_n_bytes):
                        ids.append(mid)
                        idxs.append(i // every_n_bytes)
                        ptss.append(float(i // every_n_bytes))
                        keys.append(True)
                        datas.append(b[i : i + every_n_bytes])
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "frame_idx": idxs,
                    "pts": ptss,
                    "keyframe": keys,
                    "data": datas,
                }
            )

    return media.filter(F.col("kind") == "video").mapInPandas(run, schema=FRAME_SCHEMA)


def generate_media(spark, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table for tests (binary payload =
    hash-derived bytes; kind round-robins image/audio/video)."""
    kinds = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.col("id"), F.lit(3)) + 1).cast("int"),
    )
    payload = F.encode(
        F.concat_ws(
            "",
            F.transform(
                F.sequence(F.lit(0), F.lit(63)),
                lambda i: F.chr(F.pmod(F.xxhash64(F.col("id"), i, F.lit(seed)), F.lit(94)) + 33),
            ),
        ),
        "UTF-8",
    )
    return spark.range(n).select(
        F.col("id").alias("media_id"),
        kinds.alias("kind"),
        payload.alias("data"),
        F.create_map(F.lit("source"), F.lit("synthetic")).alias("meta"),
    )


# ---------------------------------------------------------------------------
# pure-numpy PNG codec (stdlib zlib; 8-bit greyscale/RGB/RGBA, filters 0-4)
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# color type -> samples per pixel (8-bit depth only)
_PNG_CHANNELS = {0: 1, 2: 3, 6: 4}


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def png_encode(pixels: np.ndarray, filter_type: int = 0, level: int = 6) -> bytes:
    """Encode an 8-bit image as PNG. Accepts (h, w) greyscale, (h, w, 3)
    RGB, or (h, w, 4) RGBA uint8 arrays. ``filter_type`` selects the
    scanline pre-filter applied to EVERY row (0=None, 1=Sub, 2=Up,
    3=Average, 4=Paeth) — exposed so tests can exercise each unfilter
    path in :func:`png_decode` with real encoder output."""
    import struct
    import zlib

    if pixels.dtype != np.uint8:
        raise ValueError("png_encode expects uint8 pixels")
    if pixels.ndim == 2:
        color_type, px = 0, pixels[:, :, None]
    elif pixels.ndim == 3 and pixels.shape[2] == 3:
        color_type, px = 2, pixels
    elif pixels.ndim == 3 and pixels.shape[2] == 4:
        color_type, px = 6, pixels
    else:
        raise ValueError("png_encode expects (h,w), (h,w,3) or (h,w,4)")
    if filter_type not in (0, 1, 2, 3, 4):
        raise ValueError(f"unknown PNG filter {filter_type}")
    h, w, ch = px.shape
    raw = px.reshape(h, w * ch).astype(np.int64)
    # per-row filter inputs: a = left pixel, b = row above, c = upper-left
    left = np.zeros_like(raw)
    left[:, ch:] = raw[:, :-ch]
    up = np.zeros_like(raw)
    up[1:] = raw[:-1]
    upleft = np.zeros_like(raw)
    upleft[1:, ch:] = raw[:-1, :-ch]
    if filter_type == 0:
        filt = raw
    elif filter_type == 1:
        filt = raw - left
    elif filter_type == 2:
        filt = raw - up
    elif filter_type == 3:
        filt = raw - (left + up) // 2
    else:  # Paeth
        filt = raw - _paeth(left, up, upleft)
    lines = np.concatenate(
        [np.full((h, 1), filter_type, dtype=np.uint8), (filt & 0xFF).astype(np.uint8)],
        axis=1,
    )
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(lines.tobytes(), level))
        + _png_chunk(b"IEND", b"")
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor, vectorized (RFC 2083 §6.6)."""
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def png_decode(data: bytes) -> np.ndarray:
    """Decode an 8-bit non-interlaced PNG (greyscale / RGB / RGBA) to a
    uint8 array of shape (h, w), (h, w, 3) or (h, w, 4). Walks the chunk
    list (multiple IDATs are concatenated, ancillary chunks skipped) and
    inverts all five scanline filters. CRCs are verified."""
    import struct
    import zlib

    if len(data) < 8 or data[:8] != _PNG_SIG:
        raise ValueError("not a PNG file")
    pos, ihdr, idat = 8, None, []
    while pos + 12 <= len(data):
        size = struct.unpack_from(">I", data, pos)[0]
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + size]
        crc = struct.unpack_from(">I", data, pos + 8 + size)[0]
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
        pos += 12 + size
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT chunk")
    w, h, depth, color_type, comp, filt_method, interlace = ihdr
    if depth != 8 or color_type not in _PNG_CHANNELS or comp != 0 or interlace != 0:
        raise ValueError(
            f"unsupported PNG variant (depth={depth}, color={color_type}, "
            f"interlace={interlace}); 8-bit grey/RGB/RGBA non-interlaced only"
        )
    ch = _PNG_CHANNELS[color_type]
    stride = w * ch
    lines = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    if lines.size != h * (stride + 1):
        raise ValueError("PNG pixel data has wrong length")
    lines = lines.reshape(h, stride + 1)
    filters, rows = lines[:, 0], lines[:, 1:].astype(np.int64)
    out = np.zeros((h, stride), dtype=np.int64)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        f, row = filters[y], rows[y]
        if f == 0:
            cur = row
        elif f == 2:
            cur = (row + prev) & 0xFF
        else:
            # Sub/Average/Paeth have an in-row left dependency: recon one
            # pixel (ch samples) at a time, vectorized across channels
            cur = np.zeros(stride, dtype=np.int64)
            for x in range(0, stride, ch):
                a = cur[x - ch : x] if x else np.zeros(ch, dtype=np.int64)
                b = prev[x : x + ch]
                c = prev[x - ch : x] if x else np.zeros(ch, dtype=np.int64)
                if f == 1:
                    pred = a
                elif f == 3:
                    pred = (a + b) // 2
                elif f == 4:
                    pred = _paeth(a, b, c)
                else:
                    raise ValueError(f"unknown PNG filter {f} on row {y}")
                cur[x : x + ch] = (row[x : x + ch] + pred) & 0xFF
        out[y] = cur
        prev = cur
    px = out.astype(np.uint8).reshape(h, w, ch)
    return px[:, :, 0] if color_type == 0 else px


def _png_feature(data: bytes, dim: int) -> np.ndarray:
    """REAL image feature from decoded PNG pixels: same grid-folded
    grayscale pooling as the BMP path, L2-normalized."""
    px = png_decode(data).astype("float64")
    gray = px if px.ndim == 2 else px[:, :, :3].mean(axis=2)
    gray = gray.ravel()
    cells = np.arange(gray.size) % dim
    folded = np.bincount(cells, weights=gray, minlength=dim)[:dim]
    counts = np.bincount(cells, minlength=dim)[:dim]
    folded = (folded / np.maximum(counts, 1)).astype("float32")
    norm = np.linalg.norm(folded)
    return folded / norm if norm > 0 else folded


# ---------------------------------------------------------------------------
# pure-python GIF codec (GIF89a, 8-bit palette, real LZW, non-interlaced)
# ---------------------------------------------------------------------------


class _BitWriter:
    """LSB-first variable-width code packer (GIF's LZW bit order)."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, width: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
        return bytes(self.out)


def _lzw_encode(indices, min_code_size: int) -> bytes:
    """GIF LZW: dict-building compression with CLEAR emitted on table
    overflow (4096) and the standard (late) width-change convention."""
    clear, end = 1 << min_code_size, (1 << min_code_size) + 1
    bw = _BitWriter()

    def reset():
        return {(i,): i for i in range(clear)}, end + 1, min_code_size + 1

    table, next_code, width = reset()
    bw.write(clear, width)
    buf: tuple = ()
    for px in indices:
        cand = buf + (int(px),)
        if cand in table:
            buf = cand
            continue
        bw.write(table[buf], width)
        table[cand] = next_code
        if next_code == (1 << width) and width < 12:
            width += 1
        next_code += 1
        buf = (int(px),)
        if next_code > 4095:
            bw.write(clear, width)
            table, next_code, width = reset()
    if buf:
        bw.write(table[buf], width)
        # the decoder appends one table entry per code READ (lagging the
        # encoder's adds by one), so it still fills slot ``next_code`` on
        # this final data code — and widens if that lands exactly on
        # 1<<width. Mirror that here or END is written one bit short
        # (only bites when the stream length hits the boundary exactly;
        # found by the hypothesis round-trip test).
        if next_code == (1 << width) and width < 12 and next_code > end + 1:
            width += 1
    bw.write(end, width)
    return bw.flush()


def _lzw_decode(data: bytes, min_code_size: int) -> list:
    """Inverse of :func:`_lzw_encode`; matches any standard GIF encoder
    (handles the code==len(table) self-reference case)."""
    clear, end = 1 << min_code_size, (1 << min_code_size) + 1
    out: list[int] = []
    # a stream is not required to start with CLEAR: begin in post-clear state
    table: list[tuple] = [(i,) for i in range(clear)] + [(), ()]
    width = min_code_size + 1
    prev: tuple | None = None
    pos = 0  # bit position
    total = len(data) * 8
    while pos + width <= total:
        byte, off = divmod(pos, 8)
        chunk = int.from_bytes(data[byte : byte + 4], "little")
        code = (chunk >> off) & ((1 << width) - 1)
        pos += width
        if code == clear:
            table = [(i,) for i in range(clear)] + [(), ()]
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            return out
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
        elif code == len(table):
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError(f"LZW code {code} beyond table size {len(table)}")
        out.extend(entry)
        # table is capped at 4096: encoders using a deferred clear keep
        # emitting existing codes at width 12 without new entries
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    raise ValueError("LZW stream ended without an end-of-information code")


def gif_encode(pixels: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a single-frame GIF89a.

    GIF is palette-based: the image may contain at most 256 distinct
    colors (raises otherwise — quantization is a modeling choice this
    codec refuses to make silently). Real LZW compression, one global
    color table, no interlace."""
    import struct

    if pixels.ndim != 3 or pixels.shape[2] != 3 or pixels.dtype != np.uint8:
        raise ValueError("gif_encode expects an (h, w, 3) uint8 array")
    h, w, _ = pixels.shape
    flat = pixels.reshape(-1, 3)
    palette, indices = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError(f"GIF supports <=256 colors, image has {len(palette)}")
    # palette size must be a power of two >= 2
    bits = max(1, int(np.ceil(np.log2(max(len(palette), 2)))))
    pal = np.zeros((1 << bits, 3), dtype=np.uint8)
    pal[: len(palette)] = palette
    mcs = max(2, bits)  # LZW minimum code size (spec floor of 2)
    hdr = b"GIF89a" + struct.pack("<HHBBB", w, h, 0x80 | ((bits - 1) << 4) | (bits - 1), 0, 0)
    img = struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)
    lzw = _lzw_encode(indices, mcs)
    blocks = bytearray([mcs])
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        blocks.append(len(chunk))
        blocks.extend(chunk)
    blocks.append(0)
    return hdr + pal.tobytes() + img + bytes(blocks) + b"\x3b"


def gif_decode(data: bytes) -> np.ndarray:
    """Decode the first frame of a non-interlaced GIF87a/89a into an
    (h, w, 3) uint8 RGB array. Walks extension blocks, honors local color
    tables, ignores transparency (renders the palette color)."""
    import struct

    if len(data) < 13 or data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF file")
    w, h, packed, _bg, _ar = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(data, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    while pos < len(data):
        block = data[pos]
        if block == 0x21:  # extension: label + sub-blocks
            pos += 2
            while data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
        elif block == 0x2C:  # image descriptor
            _l, _t, iw, ih, ipk = struct.unpack_from("<HHHHB", data, pos + 1)
            pos += 10
            pal = gct
            if ipk & 0x80:
                n = 2 << (ipk & 0x07)
                pal = np.frombuffer(data, np.uint8, n * 3, pos).reshape(n, 3)
                pos += n * 3
            if ipk & 0x40:
                raise ValueError("interlaced GIF not supported")
            if pal is None:
                raise ValueError("GIF image has no color table")
            mcs = data[pos]
            pos += 1
            lzw = bytearray()
            while data[pos] != 0:
                ln = data[pos]
                lzw.extend(data[pos + 1 : pos + 1 + ln])
                pos += 1 + ln
            idx = _lzw_decode(bytes(lzw), mcs)
            if len(idx) < iw * ih:
                raise ValueError(f"GIF pixel data short: {len(idx)} < {iw * ih}")
            return pal[np.asarray(idx[: iw * ih], dtype=np.int64)].reshape(ih, iw, 3)
        elif block == 0x3B:
            break
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x} at {pos}")
    raise ValueError("GIF contains no image data")


def _gif_feature(data: bytes, dim: int) -> np.ndarray:
    """REAL image feature from decoded GIF pixels (same pooling as BMP/PNG)."""
    px = gif_decode(data).astype("float64")
    gray = px.mean(axis=2).ravel()
    cells = np.arange(gray.size) % dim
    folded = np.bincount(cells, weights=gray, minlength=dim)[:dim]
    counts = np.bincount(cells, minlength=dim)[:dim]
    folded = (folded / np.maximum(counts, 1)).astype("float32")
    norm = np.linalg.norm(folded)
    return folded / norm if norm > 0 else folded


# ---------------------------------------------------------------------------
# pure-numpy WAV codec (RIFF, PCM 16-bit little-endian)
# ---------------------------------------------------------------------------


def wav_encode(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Encode float samples in [-1, 1] (mono (n,) or (n, ch)) as a 16-bit
    PCM RIFF/WAVE file."""
    import struct

    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    pcm = np.clip(np.round(samples * 32767.0), -32768, 32767).astype("<i2")
    data = pcm.tobytes()
    byte_rate = sample_rate * ch * 2
    hdr = (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, ch, sample_rate, byte_rate, ch * 2, 16)
        + b"data" + struct.pack("<I", len(data))
    )
    return hdr + data


def wav_decode(data: bytes) -> tuple[np.ndarray, int]:
    """Decode a PCM-16 RIFF/WAVE file → (float64 samples in [-1, 1] of
    shape (n, ch), sample_rate). Walks the chunk list, so extra chunks
    (LIST/fact) before ``data`` are handled."""
    import struct

    if len(data) < 44 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, fmt, raw = 12, None, None
    while pos + 8 <= len(data):
        cid, size = data[pos : pos + 4], struct.unpack_from("<I", data, pos + 4)[0]
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            raw = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or raw is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, ch, sample_rate, _, _, bits = fmt
    if audio_format != 1 or bits != 16:
        raise ValueError(
            f"unsupported WAV variant (format={audio_format}, bits={bits}); "
            f"only PCM-16 is implemented"
        )
    pcm = np.frombuffer(raw, dtype="<i2")
    # scale convention: /32767 is the exact inverse of wav_encode's *32767,
    # with a clip so the one unmatched code point (-32768, producible only
    # by foreign encoders) stays inside the documented [-1, 1] range
    samples = np.clip(pcm.astype("float64") / 32767.0, -1.0, 1.0)
    return samples.reshape(-1, ch), sample_rate


def _wav_feature(data: bytes, dim: int) -> np.ndarray:
    """REAL audio feature from decoded PCM: per-window RMS energy over
    ``dim`` equal windows of the mono mix, L2-normalized."""
    samples, _ = wav_decode(data)
    mono = samples.mean(axis=1)
    n = len(mono)
    if n == 0:
        return np.zeros(dim, dtype="float32")
    idx = (np.arange(n) * dim) // n
    energy = np.bincount(idx, weights=mono * mono, minlength=dim)[:dim]
    counts = np.bincount(idx, minlength=dim)[:dim]
    rms = np.sqrt(energy / np.maximum(counts, 1)).astype("float32")
    norm = np.linalg.norm(rms)
    return rms / norm if norm > 0 else rms
