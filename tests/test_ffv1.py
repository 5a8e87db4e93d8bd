"""FFV1 decoder tests: reference-encoded streams across the
coder/level/context/slices matrix, decoded byte-exact (lossless
codec — any mismatch is a bug)."""

import subprocess

import numpy as np
import pytest

import refutil
from conftest import requires_ref

from ffmpeg_tpu.io.demux import open_input
from ffmpeg_tpu.codecs import CodecContext

W, H = 112, 80


def _make(tmp_path, name, extra, frames=8, size=f"{W}x{H}"):
    p = tmp_path / name
    subprocess.run(
        [str(refutil.REF), "-v", "error", "-f", "lavfi", "-i",
         f"testsrc2=size={size}:rate=25", "-frames:v", str(frames),
         "-c:v", "ffv1", *extra, "-y", str(p)], check=True)
    return p


def _check_exact(path):
    d = open_input(str(path))
    dec = CodecContext.open_decoder(d.streams[0].codecpar)
    pkts = []
    while True:
        try:
            pkts.append(d.read_packet())
        except Exception:
            break
    frames = dec.decode_all(pkts)
    assert frames
    fmt = frames[0].format
    ref = subprocess.run(
        [str(refutil.REF), "-v", "error", "-i", str(path), "-f",
         "rawvideo", "-pix_fmt", fmt, "-"],
        check=True, capture_output=True).stdout
    ours = b"".join(np.asarray(pl).astype(np.uint8).tobytes()
                    for f in frames for pl in f.planes)
    assert len(ours) == len(ref)
    assert ours == ref


@requires_ref
@pytest.mark.parametrize("extra", [
    [],                                   # v3, range coder default tab
    ["-coder", "-2"],                     # v3, golomb-rice
    ["-coder", "1"],                      # v3, custom range table
    ["-level", "1"],                      # v0/1 header, rice
    ["-level", "1", "-coder", "1"],       # v0/1, custom range table
    ["-context", "1", "-coder", "1"],     # large (5-neighbour) context
    ["-g", "6", "-coder", "1"],           # inter frames (state carry)
    ["-slices", "4", "-coder", "1"],      # multi-slice
], ids=["v3-range", "v3-rice", "v3-custom", "v1-rice", "v1-custom",
        "context1", "gop6", "slices4"])
def test_ffv1_matrix(tmp_path, extra):
    _check_exact(_make(tmp_path, "f.avi", extra))


@requires_ref
def test_ffv1_yuv422(tmp_path):
    _check_exact(_make(tmp_path, "f422.avi",
                       ["-pix_fmt", "yuv422p", "-coder", "1"]))


@requires_ref
def test_ffv1_odd_dims(tmp_path):
    _check_exact(_make(tmp_path, "fodd.avi", ["-coder", "1"],
                       size="70x50"))
