"""MP4/MOV demuxer tests: packet-exact parity with the reference."""

import os
import subprocess
import zlib

import numpy as np
import pytest

import refutil
from conftest import requires_ref

from ffmpeg_tpu.codecs import CodecContext
from ffmpeg_tpu.io import open_input


def _make_mp4(tmp_path, movflags=None, audio=True):
    mp4 = str(tmp_path / "t.mp4")
    cmd = [str(refutil.REF), "-v", "error",
           "-f", "lavfi", "-i", "testsrc2=size=160x120:rate=25"]
    if audio:
        cmd += ["-f", "lavfi", "-i", "sine=frequency=440:sample_rate=44100"]
    cmd += ["-t", "1", "-c:v", "mjpeg", "-q:v", "3", "-pix_fmt", "yuvj420p"]
    if audio:
        cmd += ["-c:a", "aac", "-b:a", "64k"]
    if movflags:
        cmd += ["-movflags", movflags]
    cmd += ["-y", mp4]
    subprocess.run(cmd, check=True, capture_output=True)
    return mp4


def _ref_packets(path):
    out = subprocess.run(
        [str(refutil.REF), "-v", "error", "-i", path, "-c", "copy",
         "-fflags", "+bitexact", "-f", "framecrc", "-"],
        check=True, capture_output=True).stdout.decode()
    pkts = []
    for line in out.splitlines():
        if not line or line.startswith("#"):
            continue
        p = [x.strip() for x in line.split(",")]
        pkts.append((int(p[0]), int(p[1]), int(p[2]), int(p[4]), int(p[5], 16)))
    return pkts


def _our_packets(path):
    d = open_input(path)
    return d, [(p.stream_index, p.dts, p.pts, len(p.data),
                zlib.adler32(p.data, 0)) for p in d.packets()]


@requires_ref
def test_mp4_packets_match_reference(tmp_path):
    mp4 = _make_mp4(tmp_path)
    ref = _ref_packets(mp4)
    d, ours = _our_packets(mp4)
    assert d.streams[0].codecpar.codec_id == "mjpeg"
    assert d.streams[1].codecpar.codec_id == "aac"
    assert sorted(ours) == sorted(ref)


@requires_ref
def test_fragmented_mp4(tmp_path):
    mp4 = _make_mp4(tmp_path, movflags="frag_keyframe+empty_moov")
    ref = _ref_packets(mp4)
    d, ours = _our_packets(mp4)
    assert sorted(ours) == sorted(ref)


@requires_ref
def test_faststart_mp4(tmp_path):
    mp4 = _make_mp4(tmp_path, movflags="faststart", audio=False)
    ref = _ref_packets(mp4)
    d, ours = _our_packets(mp4)
    assert sorted(ours) == sorted(ref)


@requires_ref
def test_mp4_decode_video_track(tmp_path):
    mp4 = _make_mp4(tmp_path, audio=False)
    d = open_input(mp4)
    dec = CodecContext.open_decoder(d.streams[0].codecpar)
    frames = dec.decode_all(d.packets())
    assert len(frames) == 25
    assert frames[0].width == 160 and frames[0].format == "yuv420p"


@requires_ref
def test_mp4_seek(tmp_path):
    mp4 = _make_mp4(tmp_path, audio=False)
    d = open_input(mp4)
    all_pkts = list(d.packets())
    # mjpeg: all keyframes; seek to dts of 10th packet
    target = all_pkts[10].dts
    d.seek(0, target)
    pkt = d.read_packet()
    assert pkt.dts == target
