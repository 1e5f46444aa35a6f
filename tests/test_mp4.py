"""ISO BMFF (MP4) container demux/mux: real frame sampling at the
container layer (byte ranges + pts + keyframes from moov sample tables)."""

import struct

import pytest
from pyspark.sql import functions as F

from arkouda_njit_spark.functions.mp4 import (
    mp4_demux,
    mp4_extract_samples,
    mp4_mux,
)
from arkouda_njit_spark.functions.multimodal import sample_frames


def _frames(n, base=11):
    # variable-size deterministic payloads so offset arithmetic is exercised
    return [bytes([i % 251]) * (base + (i * 7) % 23) for i in range(n)]


class TestMuxDemuxRoundTrip:
    def test_payload_bytes_exact(self):
        frames = _frames(17)
        blob = mp4_mux(frames, fps=30, width=64, height=48)
        got = mp4_extract_samples(blob)
        assert [g[3] for g in got] == frames
        assert [g[0] for g in got] == list(range(17))

    def test_pts_from_stts(self):
        frames = _frames(10)
        blob = mp4_mux(frames, fps=25)
        got = mp4_extract_samples(blob)
        # stts: every sample 1 tick at timescale=fps -> pts = i/25
        assert [g[1] for g in got] == pytest.approx([i / 25 for i in range(10)])

    def test_keyframe_flags(self):
        blob = mp4_mux(_frames(12), keyframe_every=5)
        got = mp4_extract_samples(blob)
        assert [g[2] for g in got] == [i % 5 == 0 for i in range(12)]

    def test_keyframes_only_selection(self):
        frames = _frames(12)
        blob = mp4_mux(frames, keyframe_every=5)
        got = mp4_extract_samples(blob, keyframes_only=True)
        assert [g[0] for g in got] == [0, 5, 10]
        assert [g[3] for g in got] == [frames[0], frames[5], frames[10]]

    def test_every_n_skips_without_reading(self):
        frames = _frames(9)
        blob = mp4_mux(frames)
        got = mp4_extract_samples(blob, every_n=3)
        assert [g[0] for g in got] == [0, 3, 6]

    @pytest.mark.parametrize("spc", [1, 3, 4])
    def test_general_stsc_multi_sample_chunks(self, spc):
        # 10 samples in chunks of spc: the last chunk is short when
        # 10 % spc != 0, forcing the two-run stsc path
        frames = _frames(10)
        blob = mp4_mux(frames, samples_per_chunk=spc)
        got = mp4_extract_samples(blob)
        assert [g[3] for g in got] == frames

    def test_track_metadata(self):
        blob = mp4_mux(_frames(30), fps=30, width=320, height=240)
        track = mp4_demux(blob)
        assert (track.width, track.height) == (320, 240)
        assert track.timescale == 30
        assert track.duration == pytest.approx(1.0)
        assert track.codec == b"avc1"
        assert len(track.samples) == 30


class TestMalformed:
    def test_no_moov_raises(self):
        with pytest.raises(ValueError, match="moov"):
            mp4_demux(struct.pack(">I", 16) + b"ftypisom\x00\x00\x02\x00")

    def test_truncated_box_raises(self):
        blob = mp4_mux(_frames(3))
        with pytest.raises(ValueError):
            mp4_demux(blob[:-20] + struct.pack(">I", 10 ** 6) + b"trak")

    def test_garbage_raises(self):
        with pytest.raises(ValueError):
            mp4_demux(b"\x00" * 64)


class TestSparkPath:
    def test_sample_frames_mp4(self, spark):
        rows = []
        for mid in range(6):
            frames = _frames(8, base=5 + mid)
            rows.append((mid, "video", mp4_mux(frames, fps=10, keyframe_every=4), None))
        media = spark.createDataFrame(
            rows, "media_id long, kind string, data binary, meta map<string,string>"
        )
        out = sample_frames(media, decode="mp4").collect()
        assert len(out) == 6 * 8
        by_id = {}
        for r in out:
            by_id.setdefault(r["media_id"], []).append(r)
        for mid, rs in by_id.items():
            rs.sort(key=lambda r: r["frame_idx"])
            assert [bytes(r["data"]) for r in rs] == _frames(8, base=5 + mid)
            assert [r["keyframe"] for r in rs] == [i % 4 == 0 for i in range(8)]
            assert [r["pts"] for r in rs] == pytest.approx([i / 10 for i in range(8)])

    def test_sample_frames_mp4_keyframes_only(self, spark):
        media = spark.createDataFrame(
            [(1, "video", mp4_mux(_frames(10), keyframe_every=3), None)],
            "media_id long, kind string, data binary, meta map<string,string>",
        )
        out = sample_frames(media, decode="mp4", keyframes_only=True).collect()
        assert sorted(r["frame_idx"] for r in out) == [0, 3, 6, 9]
        assert all(r["keyframe"] for r in out)

    def test_fake_path_keeps_shape(self, spark):
        media = spark.createDataFrame(
            [(1, "video", b"x" * 64, None)],
            "media_id long, kind string, data binary, meta map<string,string>",
        )
        out = sample_frames(media, every_n_bytes=16).collect()
        assert len(out) == 4
        assert all(r["keyframe"] for r in out)
