"""Matroska demuxer parity + MP4 muxer round-trip tests."""

import os
import subprocess
import zlib

import numpy as np
import pytest

import refutil
from conftest import requires_ref

from ffmpeg_tpu.codecs import CodecContext
from ffmpeg_tpu.io import open_input, open_output


@pytest.fixture
def av_mkv(tmp_path):
    p = tmp_path / "t.mkv"
    subprocess.run([str(refutil.REF), "-v", "error",
                    "-f", "lavfi", "-i", "testsrc2=size=160x120:rate=25",
                    "-f", "lavfi", "-i", "sine=frequency=440:sample_rate=44100",
                    "-t", "1", "-c:v", "mjpeg", "-q:v", "3",
                    "-pix_fmt", "yuvj420p", "-c:a", "aac", "-b:a", "64k",
                    "-y", str(p)], check=True, capture_output=True)
    return p


def _ref_rows(path):
    out = subprocess.run(
        [str(refutil.REF), "-v", "error", "-i", str(path), "-c", "copy",
         "-fflags", "+bitexact", "-f", "framecrc", "-"],
        check=True, capture_output=True).stdout.decode()
    rows = []
    for l in out.splitlines():
        if l and not l.startswith("#"):
            p = [x.strip() for x in l.split(",")]
            rows.append((int(p[0]), int(p[2]), int(p[4]), int(p[5], 16)))
    return rows


@requires_ref
def test_matroska_packets_match_reference(av_mkv):
    d = open_input(str(av_mkv))
    assert d.name == "matroska"
    assert d.streams[0].codecpar.codec_id == "mjpeg"
    assert d.streams[1].codecpar.codec_id == "aac"
    ours = [(p.stream_index, p.pts, len(p.data), zlib.adler32(p.data, 0))
            for p in d.packets()]
    ref = _ref_rows(av_mkv)
    assert sorted(ours) == sorted(ref)


@requires_ref
def test_matroska_decode_tracks(av_mkv):
    d = open_input(str(av_mkv))
    pkts = list(d.packets())
    vdec = CodecContext.open_decoder(d.streams[0].codecpar)
    frames = vdec.decode_all(p for p in pkts if p.stream_index == 0)
    assert len(frames) == 25
    adec = CodecContext.open_decoder(d.streams[1].codecpar)
    aframes = adec.decode_all(p for p in pkts if p.stream_index == 1)
    assert sum(f.nb_samples for f in aframes) >= 44100


@requires_ref
def test_mp4_mux_roundtrip(av_mkv, tmp_path):
    """Remux mkv → our MP4; the reference must read identical payloads."""
    d = open_input(str(av_mkv))
    out = tmp_path / "out.mp4"
    m = open_output(str(out), format="mov")
    for st in d.streams:
        m.add_stream(st.codecpar, time_base=st.time_base)
    for p in d.packets():
        m.write_packet(p)
    m.write_trailer()
    m.close()

    src_rows = _ref_rows(av_mkv)
    out_rows = _ref_rows(out)
    # per-stream payload sequences must match exactly (crc+size)
    for sidx in (0, 1):
        a = [(r[2], r[3]) for r in src_rows if r[0] == sidx]
        b = [(r[2], r[3]) for r in out_rows if r[0] == sidx]
        assert a == b, f"stream {sidx} payloads differ"
    # our own demuxer reads it back too
    d2 = open_input(str(out))
    ours = [(p.stream_index, len(p.data), zlib.adler32(p.data, 0))
            for p in d2.packets()]
    assert sorted(ours) == sorted((r[0], r[2], r[3]) for r in src_rows)


@requires_ref
def test_matroska_mux_roundtrip(av_mkv, tmp_path):
    """Remux mkv → OUR mkv muxer; the reference must read identical
    payloads and timestamps, and our demuxer must round-trip."""
    d = open_input(str(av_mkv))
    out = tmp_path / "out.mkv"
    m = open_output(str(out), format="matroska")
    for st in d.streams:
        m.add_stream(st.codecpar, time_base=st.time_base)
    for p in d.packets():
        m.write_packet(p)
    m.write_trailer()
    m.close()

    src_rows = _ref_rows(av_mkv)
    out_rows = _ref_rows(out)
    for sidx in (0, 1):
        a = [(r[2], r[3]) for r in src_rows if r[0] == sidx]
        b = [(r[2], r[3]) for r in out_rows if r[0] == sidx]
        assert a == b, f"stream {sidx} payloads differ"
    # our own demuxer reads our own mux back
    d2 = open_input(str(out))
    assert d2.name == "matroska"
    assert d2.streams[0].codecpar.codec_id == "mjpeg"
    assert d2.streams[1].codecpar.codec_id == "aac"
    ours = [(p.stream_index, len(p.data), zlib.adler32(p.data, 0))
            for p in d2.packets()]
    assert sorted(ours) == sorted((r[0], r[2], r[3]) for r in src_rows)


@requires_ref
def test_matroska_mux_reference_transcodes(av_mkv, tmp_path):
    """The reference must fully decode a file we muxed (timestamps sane
    enough for A/V interleave) and report a duration."""
    d = open_input(str(av_mkv))
    out = tmp_path / "o3.mkv"
    m = open_output(str(out), format="matroska")
    for st in d.streams:
        m.add_stream(st.codecpar, time_base=st.time_base)
    for p in d.packets():
        m.write_packet(p)
    m.write_trailer()
    m.close()
    r = subprocess.run(
        [str(refutil.REF).replace("ffmpeg", "ffprobe"), "-v", "error",
         "-show_entries", "format=duration:stream=codec_name",
         "-of", "csv", str(out)], check=True, capture_output=True)
    text = r.stdout.decode()
    assert "mjpeg" in text and "aac" in text
    subprocess.run([str(refutil.REF), "-v", "error", "-i", str(out),
                    "-f", "null", "-"], check=True, capture_output=True)


@requires_ref
def test_mp4_mux_probe_fields(av_mkv, tmp_path):
    d = open_input(str(av_mkv))
    out = tmp_path / "o2.mp4"
    m = open_output(str(out), format="mov")
    for st in d.streams:
        m.add_stream(st.codecpar, time_base=st.time_base)
    for p in d.packets():
        m.write_packet(p)
    m.write_trailer()
    m.close()
    pr = subprocess.run([str(refutil.REFPROBE), "-v", "error",
                         "-show_streams", "-of", "flat", str(out)],
                        check=True, capture_output=True).stdout.decode()
    assert 'codec_name="mjpeg"' in pr
    assert 'codec_name="aac"' in pr
    assert "width=160" in pr
    assert 'sample_rate="44100"' in pr
