"""MPEG-TS demuxer tests: payload parity with the reference + decode."""

import subprocess
import zlib

import pytest

import refutil
from conftest import requires_ref

from ffmpeg_tpu.codecs import CodecContext
from ffmpeg_tpu.io import open_input


@pytest.fixture
def ts_file(tmp_path):
    p = tmp_path / "t.ts"
    subprocess.run([str(refutil.REF), "-v", "error",
                    "-f", "lavfi", "-i", "testsrc2=size=160x120:rate=25",
                    "-f", "lavfi", "-i", "sine=frequency=440:sample_rate=44100",
                    "-t", "1", "-c:v", "mpeg2video", "-q:v", "5",
                    "-pix_fmt", "yuv420p", "-c:a", "aac", "-b:a", "64k",
                    "-y", str(p)], check=True, capture_output=True)
    return p


@requires_ref
def test_ts_payload_parity(ts_file):
    d = open_input(str(ts_file))
    assert d.name == "mpegts"
    assert d.streams[0].codecpar.codec_id == "mpeg2video"
    assert d.streams[1].codecpar.codec_id == "aac"
    pkts = list(d.packets())
    out = subprocess.run(
        [str(refutil.REF), "-v", "error", "-i", str(ts_file), "-c", "copy",
         "-fflags", "+bitexact", "-f", "framecrc", "-"],
        check=True, capture_output=True).stdout.decode()
    ref = {0: [], 1: []}
    for l in out.splitlines():
        if l and not l.startswith("#"):
            p = [x.strip() for x in l.split(",")]
            ref[int(p[0])].append((int(p[4]), int(p[5], 16)))
    ours = {0: [], 1: []}
    for p in pkts:
        ours[p.stream_index].append((len(p.data), zlib.adler32(p.data, 0)))
    assert ours[0] == ref[0]
    assert ours[1] == ref[1]


@requires_ref
def test_ts_aac_decodes(ts_file):
    d = open_input(str(ts_file))
    pkts = list(d.packets())
    adec = CodecContext.open_decoder(d.streams[1].codecpar)
    frames = adec.decode_all(p for p in pkts if p.stream_index == 1)
    assert sum(f.nb_samples for f in frames) >= 44100
    assert frames[0].sample_rate == 44100
