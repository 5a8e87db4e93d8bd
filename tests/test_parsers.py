"""Packet parsers (codecs/parsers.py): frame splitting over arbitrary
chunk boundaries must match the reference's packetization."""

import subprocess

import numpy as np
import pytest

import refutil
from conftest import requires_ref

from ffmpeg_tpu.codecs.parsers import get_parser, parser_names


def _chunked_parse(name, data, chunk=333):
    p = get_parser(name)
    frames = []
    for i in range(0, len(data), chunk):
        frames.extend(p.feed(data[i:i + chunk]))
    frames.extend(p.flush())
    return frames


def _ref_packet_sizes(path, fmt=None):
    args = [str(refutil.REF), "-v", "error"]
    if fmt:
        args += ["-f", fmt]
    args += ["-i", str(path), "-c", "copy", "-fflags", "+bitexact",
             "-f", "framecrc", "-"]
    out = subprocess.run(args, check=True, capture_output=True) \
        .stdout.decode()
    return [int(l.split(",")[4]) for l in out.splitlines()
            if l and not l.startswith("#")]


def test_registry():
    names = parser_names()
    for n in ("aac", "mp3", "ac3", "mpeg2video", "mjpeg", "h264"):
        assert n in names, names


@requires_ref
@pytest.mark.parametrize("codec,fmt,gen", [
    ("aac", "aac", ["-f", "lavfi", "-i", "sine=frequency=440", "-t",
                     "0.5", "-c:a", "aac", "-f", "adts"]),
    ("ac3", "ac3", ["-f", "lavfi", "-i", "sine=frequency=220", "-t",
                    "0.5", "-c:a", "ac3", "-f", "ac3"]),
    ("mjpeg", "mjpeg", ["-f", "lavfi", "-i", "testsrc2=size=96x64:rate=10",
                        "-t", "0.5", "-c:v", "mjpeg", "-q:v", "5",
                        "-f", "mjpeg"]),
])
def test_parser_matches_reference_packets(tmp_path, codec, fmt, gen):
    path = tmp_path / f"s.{fmt}.bin"
    subprocess.run([str(refutil.REF), "-v", "error", *gen, "-y",
                    str(path)], check=True, capture_output=True)
    data = path.read_bytes()
    frames = _chunked_parse(codec, data)
    sizes = _ref_packet_sizes(path, fmt)
    assert [len(f) for f in frames] == sizes
    assert b"".join(frames) == data[:sum(sizes)]


@requires_ref
def test_mpegaudio_parser(tmp_path):
    """mp2 extracted from TS (the slim build has no raw mpegaudio
    muxer), re-split by our parser, sizes matching the reference."""
    ts = tmp_path / "a.ts"
    subprocess.run([str(refutil.REF), "-v", "error", "-f", "lavfi",
                    "-i", "sine=frequency=330", "-t", "0.5",
                    "-c:a", "mp2", "-f", "mpegts", "-y", str(ts)],
                   check=True, capture_output=True)
    from ffmpeg_tpu.io import open_input
    d = open_input(str(ts))
    raw = b"".join(p.data for p in d.packets())
    rawf = tmp_path / "a.mp2"
    rawf.write_bytes(raw)
    frames = _chunked_parse("mp2", raw, chunk=217)
    sizes = _ref_packet_sizes(rawf, "mp3")
    assert [len(f) for f in frames] == sizes


def test_h264_au_split():
    import test_h264 as H
    stream = H.craft_i16x16_residual(seed=1)
    stream += H.craft_p_frame(frame_num=1, seed=2)
    stream += H.craft_p_frame(frame_num=2, seed=3)
    frames = _chunked_parse("h264", stream, chunk=97)
    assert len(frames) == 3
    assert b"".join(frames) == stream
    # each AU after the first starts with a VCL NAL of first_mb 0
    for f in frames[1:]:
        assert f.startswith(b"\x00\x00\x00\x01") or \
            f.startswith(b"\x00\x00\x01")
