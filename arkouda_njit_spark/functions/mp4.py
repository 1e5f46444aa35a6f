"""Pure-stdlib MP4 (ISO BMFF / ISO 14496-12) container demux + mux.

Closes the container half of the video stub in functions/multimodal.py:
``sample_frames`` previously only had the byte-stride fake. Real frame
sampling has two layers — the CONTAINER (find each sample's byte range,
timestamp and keyframe flag: what ``ffprobe -show_frames`` reads from
moov) and the CODEC (H.264/H.265 pixel decode). This module makes the
container layer real from the public ISO base-media spec:

* **demux**: walk the box tree (ftyp/moov/trak/mdia/minf/stbl), parse
  the sample tables — stts (decode timestamps), ctts (composition
  offsets), stss (sync samples = keyframes), stsz/stz2 (sizes),
  stsc (sample→chunk map), stco/co64 (chunk offsets) — and expand them
  into one record per sample: (index, byte offset, size, pts seconds,
  keyframe). Handles general stsc runs and multi-trak files (first
  video handler ``vide`` wins).
* **mux**: write a minimal valid single-trak ISO BMFF file from a list
  of opaque sample payloads (ftyp + mdat + moov with full stbl), one
  chunk per sample, caller-marked keyframes. The muxer exists so the
  demuxer is testable round-trip without shipping binary fixtures —
  and it exercises the general stsc path via ``samples_per_chunk``.

The CODEC layer (entropy-decoding H.264 macroblocks to pixels) stays an
honest ``NotImplementedError`` — that genuinely needs pyav/ffmpeg.

No reference analogue: the reference repo has no media path; this
belongs to the multimodal mandate of the training-data pipeline.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

_U32 = struct.Struct(">I")
_U64 = struct.Struct(">Q")

# ---------------------------------------------------------------------------
# box walking
# ---------------------------------------------------------------------------

#: container boxes whose payload is a sequence of child boxes
_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl", b"edts", b"dinf"}


def _iter_boxes(data: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_end) for each box in
    data[start:end]. Supports 64-bit largesize boxes (size==1)."""
    pos = start
    while pos + 8 <= end:
        (size,) = _U32.unpack_from(data, pos)
        fourcc = data[pos + 4 : pos + 8]
        hdr = 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError("truncated largesize box header")
            (size,) = _U64.unpack_from(data, pos + 8)
            hdr = 16
        elif size == 0:  # box extends to end of file
            size = end - pos
        if size < hdr or pos + size > end:
            raise ValueError(f"bad box size {size} for {fourcc!r} at {pos}")
        yield fourcc, pos + hdr, pos + size
        pos += size


def _find_box(data: bytes, start: int, end: int, path: list[bytes]):
    """Return (payload_start, payload_end) of the first box at `path`
    (e.g. [b'moov', b'trak', b'mdia']), or None."""
    head, rest = path[0], path[1:]
    for fourcc, ps, pe in _iter_boxes(data, start, end):
        if fourcc != head:
            continue
        if not rest:
            return ps, pe
        got = _find_box(data, ps, pe, rest)
        if got is not None:
            return got
    return None


def _full_box(data: bytes, ps: int) -> tuple[int, int]:
    """(version, payload_start_after_version_flags) for a FullBox."""
    return data[ps], ps + 4


# ---------------------------------------------------------------------------
# sample-table parsing
# ---------------------------------------------------------------------------


@dataclass
class Mp4Sample:
    index: int          # 0-based sample number within the track
    offset: int         # absolute byte offset of the sample in the file
    size: int           # sample byte length
    pts: float          # presentation time in seconds (dts + ctts offset)
    keyframe: bool      # listed in stss (or no stss box => all sync)


@dataclass
class Mp4Track:
    handler: bytes      # e.g. b"vide", b"soun"
    timescale: int
    duration: float     # seconds (from mdhd)
    width: int
    height: int
    codec: bytes        # first sample-entry fourcc in stsd, e.g. b"avc1"
    samples: list[Mp4Sample]


def _parse_stbl(data: bytes, ps: int, pe: int, timescale: int) -> tuple[list[Mp4Sample], bytes]:
    boxes = {fourcc: (a, b) for fourcc, a, b in _iter_boxes(data, ps, pe)}

    # --- sizes ---
    if b"stsz" in boxes:
        a, _ = boxes[b"stsz"]
        _, p = _full_box(data, a)
        fixed, count = struct.unpack_from(">II", data, p)
        if fixed:
            sizes = [fixed] * count
        else:
            sizes = list(struct.unpack_from(f">{count}I", data, p + 8))
    elif b"stz2" in boxes:
        a, _ = boxes[b"stz2"]
        _, p = _full_box(data, a)
        field_size = data[p + 3]
        (count,) = _U32.unpack_from(data, p + 4)
        raw = data[p + 8 :]
        if field_size == 16:
            sizes = list(struct.unpack_from(f">{count}H", raw, 0))
        elif field_size == 8:
            sizes = list(raw[:count])
        elif field_size == 4:
            sizes = []
            for i in range(count):
                byte = raw[i // 2]
                sizes.append((byte >> 4) if i % 2 == 0 else (byte & 0xF))
        else:
            raise ValueError(f"stz2 field size {field_size}")
    else:
        raise ValueError("no stsz/stz2 sample size box")
    n = len(sizes)

    # --- chunk offsets ---
    if b"stco" in boxes:
        a, _ = boxes[b"stco"]
        _, p = _full_box(data, a)
        (count,) = _U32.unpack_from(data, p)
        chunk_offsets = list(struct.unpack_from(f">{count}I", data, p + 4))
    elif b"co64" in boxes:
        a, _ = boxes[b"co64"]
        _, p = _full_box(data, a)
        (count,) = _U32.unpack_from(data, p)
        chunk_offsets = list(struct.unpack_from(f">{count}Q", data, p + 4))
    else:
        raise ValueError("no stco/co64 chunk offset box")

    # --- sample→chunk map: expand runs to per-chunk sample counts ---
    a, _ = boxes[b"stsc"]
    _, p = _full_box(data, a)
    (entry_count,) = _U32.unpack_from(data, p)
    runs = [struct.unpack_from(">III", data, p + 4 + 12 * i) for i in range(entry_count)]
    per_chunk: list[int] = []
    for i, (first_chunk, spc, _desc) in enumerate(runs):
        last = runs[i + 1][0] - 1 if i + 1 < len(runs) else len(chunk_offsets)
        per_chunk.extend([spc] * (last - first_chunk + 1))
    if sum(per_chunk) < n:
        raise ValueError("stsc covers fewer samples than stsz")

    # --- per-sample byte offsets ---
    offsets: list[int] = []
    si = 0
    for ci, spc in enumerate(per_chunk):
        pos = chunk_offsets[ci]
        for _ in range(spc):
            if si >= n:
                break
            offsets.append(pos)
            pos += sizes[si]
            si += 1

    # --- decode timestamps (stts) ---
    a, _ = boxes[b"stts"]
    _, p = _full_box(data, a)
    (entry_count,) = _U32.unpack_from(data, p)
    dts: list[int] = []
    t = 0
    for i in range(entry_count):
        cnt, delta = struct.unpack_from(">II", data, p + 4 + 8 * i)
        for _ in range(cnt):
            dts.append(t)
            t += delta
    if len(dts) < n:
        raise ValueError("stts covers fewer samples than stsz")

    # --- composition offsets (ctts, optional) ---
    cts = [0] * n
    if b"ctts" in boxes:
        a, _ = boxes[b"ctts"]
        version, p = _full_box(data, a)
        (entry_count,) = _U32.unpack_from(data, p)
        j = 0
        for i in range(entry_count):
            if version == 0:
                cnt, off = struct.unpack_from(">II", data, p + 4 + 8 * i)
            else:
                cnt, off = struct.unpack_from(">Ii", data, p + 4 + 8 * i)
            for _ in range(cnt):
                if j < n:
                    cts[j] = off
                j += 1

    # --- sync samples (stss, optional; absent => every sample is sync) ---
    if b"stss" in boxes:
        a, _ = boxes[b"stss"]
        _, p = _full_box(data, a)
        (count,) = _U32.unpack_from(data, p)
        sync = set(struct.unpack_from(f">{count}I", data, p + 4))  # 1-based
        keyframes = [(i + 1) in sync for i in range(n)]
    else:
        keyframes = [True] * n

    # --- codec fourcc from stsd ---
    codec = b"????"
    if b"stsd" in boxes:
        a, b_ = boxes[b"stsd"]
        _, p = _full_box(data, a)
        for fourcc, _, _ in _iter_boxes(data, p + 4, b_):
            codec = fourcc
            break

    samples = [
        Mp4Sample(
            index=i,
            offset=offsets[i],
            size=sizes[i],
            pts=(dts[i] + cts[i]) / timescale,
            keyframe=keyframes[i],
        )
        for i in range(n)
    ]
    return samples, codec


def mp4_demux(data: bytes, handler: bytes = b"vide") -> Mp4Track:
    """Parse the first track with the given handler type and return its
    full sample table. Raises ValueError on malformed files and on
    fragmented MP4s (moof) whose samples live outside moov."""
    moov = _find_box(data, 0, len(data), [b"moov"])
    if moov is None:
        raise ValueError("no moov box (fragmented/streaming MP4s unsupported)")
    for fourcc, tps, tpe in _iter_boxes(data, *moov):
        if fourcc != b"trak":
            continue
        mdia = _find_box(data, tps, tpe, [b"mdia"])
        if mdia is None:
            continue
        hdlr = _find_box(data, *mdia, [b"hdlr"])
        if hdlr is None or data[hdlr[0] + 8 : hdlr[0] + 12] != handler:
            continue
        mdhd = _find_box(data, *mdia, [b"mdhd"])
        version, p = _full_box(data, mdhd[0])
        if version == 1:
            timescale, duration = struct.unpack_from(">IQ", data, p + 16)
        else:
            timescale, duration = struct.unpack_from(">II", data, p + 8)
        width = height = 0
        tkhd = _find_box(data, tps, tpe, [b"tkhd"])
        if tkhd is not None:
            tv, tp = _full_box(data, tkhd[0])
            fix_off = tp + (32 if tv == 1 else 20) + 52
            w16, h16 = struct.unpack_from(">II", data, fix_off)
            width, height = w16 >> 16, h16 >> 16
        stbl = _find_box(data, *mdia, [b"minf", b"stbl"])
        if stbl is None:
            raise ValueError("track has no stbl")
        samples, codec = _parse_stbl(data, *stbl, timescale)
        return Mp4Track(
            handler=handler,
            timescale=timescale,
            duration=duration / timescale if timescale else 0.0,
            width=width,
            height=height,
            codec=codec,
            samples=samples,
        )
    raise ValueError(f"no {handler!r} track")


def mp4_extract_samples(
    data: bytes, keyframes_only: bool = False, every_n: int = 1
) -> list[tuple[int, float, bool, bytes]]:
    """(index, pts_seconds, keyframe, payload bytes) per selected sample —
    the container half of frame extraction. Decoding the payload to
    pixels needs the codec layer (pyav/ffmpeg), not shipped here."""
    track = mp4_demux(data)
    picked = [s for s in track.samples if s.keyframe] if keyframes_only else track.samples
    picked = picked[:: max(every_n, 1)]
    return [(s.index, s.pts, s.keyframe, data[s.offset : s.offset + s.size]) for s in picked]


# ---------------------------------------------------------------------------
# minimal muxer (single trak, one-or-more samples per chunk)
# ---------------------------------------------------------------------------


def _box(fourcc: bytes, payload: bytes) -> bytes:
    return _U32.pack(8 + len(payload)) + fourcc + payload


def _full(fourcc: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _box(fourcc, bytes([version]) + flags.to_bytes(3, "big") + payload)


def mp4_mux(
    frames: list[bytes],
    fps: int = 30,
    width: int = 64,
    height: int = 64,
    keyframe_every: int = 10,
    samples_per_chunk: int = 1,
    codec: bytes = b"avc1",
) -> bytes:
    """Mux opaque sample payloads into a valid single-trak ISO BMFF file.

    ``samples_per_chunk > 1`` groups samples into shared chunks so the
    demuxer's general stsc/stco expansion is exercised, not just the
    trivial one-chunk-per-sample layout."""
    if not frames:
        raise ValueError("mp4_mux needs at least one frame")
    timescale = fps
    n = len(frames)

    ftyp = _box(b"ftyp", b"isom" + _U32.pack(512) + b"isomiso2mp41")
    mdat_payload = b"".join(frames)
    mdat = _box(b"mdat", mdat_payload)
    mdat_data_start = len(ftyp) + 8  # absolute offset of first sample

    # chunk layout
    sizes = [len(f) for f in frames]
    chunk_offsets = []
    pos = mdat_data_start
    for i in range(0, n, samples_per_chunk):
        chunk_offsets.append(pos)
        pos += sum(sizes[i : i + samples_per_chunk])

    stsd = _full(
        b"stsd", 0, 0,
        _U32.pack(1)
        + _box(
            codec,
            b"\x00" * 6 + struct.pack(">H", 1)        # reserved + data_ref_index
            + b"\x00" * 16                              # pre_defined/reserved
            + struct.pack(">HH", width, height)
            + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
            + b"\x00" * 4 + struct.pack(">H", 1)       # reserved + frame_count
            + b"\x00" * 32                              # compressorname
            + struct.pack(">Hh", 24, -1),               # depth, pre_defined
        ),
    )
    stts = _full(b"stts", 0, 0, _U32.pack(1) + struct.pack(">II", n, 1))
    sync = [i + 1 for i in range(n) if i % max(keyframe_every, 1) == 0]
    stss = _full(b"stss", 0, 0, _U32.pack(len(sync)) + struct.pack(f">{len(sync)}I", *sync))
    last_chunk_samples = n - samples_per_chunk * (len(chunk_offsets) - 1)
    stsc_runs = [(1, samples_per_chunk, 1)]
    if last_chunk_samples != samples_per_chunk and len(chunk_offsets) > 1:
        stsc_runs.append((len(chunk_offsets), last_chunk_samples, 1))
    stsc = _full(
        b"stsc", 0, 0,
        _U32.pack(len(stsc_runs))
        + b"".join(struct.pack(">III", *r) for r in stsc_runs),
    )
    stsz = _full(b"stsz", 0, 0, struct.pack(">II", 0, n) + struct.pack(f">{n}I", *sizes))
    stco = _full(
        b"stco", 0, 0,
        _U32.pack(len(chunk_offsets))
        + struct.pack(f">{len(chunk_offsets)}I", *chunk_offsets),
    )
    stbl = _box(b"stbl", stsd + stts + stss + stsc + stsz + stco)

    dref = _full(b"dref", 0, 0, _U32.pack(1) + _full(b"url ", 0, 1, b""))
    dinf = _box(b"dinf", dref)
    vmhd = _full(b"vmhd", 0, 1, b"\x00" * 8)
    minf = _box(b"minf", vmhd + dinf + stbl)
    hdlr = _full(b"hdlr", 0, 0, b"\x00" * 4 + b"vide" + b"\x00" * 12 + b"video\x00")
    mdhd = _full(
        b"mdhd", 0, 0,
        struct.pack(">IIII", 0, 0, timescale, n) + struct.pack(">HH", 0x55C4, 0),
    )
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    tkhd = _full(
        b"tkhd", 0, 7,
        struct.pack(">IIIII", 0, 0, 1, 0, n)            # times, track id, dur
        + b"\x00" * 8 + struct.pack(">HHHH", 0, 0, 0, 0)
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", width << 16, height << 16),
    )
    trak = _box(b"trak", tkhd + mdia)
    mvhd = _full(
        b"mvhd", 0, 0,
        struct.pack(">IIII", 0, 0, timescale, n)
        + struct.pack(">IHH", 0x00010000, 0x0100, 0)
        + b"\x00" * 8
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24
        + _U32.pack(2),                                  # next track id
    )
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov
