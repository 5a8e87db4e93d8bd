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
    ours = b"".join(np.ascontiguousarray(pl).tobytes()
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


@requires_ref
@pytest.mark.parametrize("pix,extra", [
    ("yuv420p10le", ["-level", "1", "-coder", "1"]),
    ("yuv420p10le", ["-level", "1", "-coder", "0"]),
    ("yuv422p10le", ["-coder", "1", "-slices", "4"]),
    ("yuv444p16le", ["-coder", "1", "-slices", "4"]),
    ("yuv420p9le", ["-coder", "-2", "-slices", "4"]),
    ("yuv444p12le", ["-coder", "-2"]),
], ids=["420p10-v1-range", "420p10-v1-rice", "422p10-slices",
        "444p16-slices", "420p9-rice", "444p12-rice"])
def test_ffv1_highdepth_yuv(tmp_path, pix, extra):
    """>8-bit YUV: per-plane bit widths, int16 sample wrap at 16
    bits (ffv1dec.c decode_plane's int16_t buffers)."""
    _check_exact(_make(tmp_path, "hd.avi", ["-pix_fmt", pix] + extra))


@requires_ref
@pytest.mark.parametrize("pix,extra", [
    ("bgr0", ["-level", "1", "-coder", "0"]),
    ("bgr0", ["-coder", "1", "-slices", "4"]),
    ("rgb32", ["-coder", "1", "-slices", "4"]),       # 8-bit + alpha
    ("gbrp10le", ["-coder", "1", "-slices", "4"]),
    ("gbrp10le", ["-coder", "-2"]),
    ("gbrp16le", ["-coder", "1"]),
    ("gbrap10le", ["-coder", "1", "-slices", "4"]),
    ("gbrap16le", ["-coder", "1"]),
], ids=["bgr0-v1-rice", "bgr0-slices", "rgb32-alpha", "gbrp10",
        "gbrp10-rice", "gbrp16", "gbrap10", "gbrap16"])
def test_ffv1_rgb(tmp_path, pix, extra):
    """RGB via JPEG2000-RCT: interleaved per-row G,B,R(,A) planes,
    bits+1 sample range, offset 1<<bits, and the reference's
    9..15-bit no-alpha plane-store swap
    (ffv1dec_template.c decode_rgb_frame)."""
    d = open_input(str(_make(tmp_path, "rgb.avi",
                             ["-pix_fmt", pix] + extra)))
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
    assert fmt.startswith("gbr")
    ref = subprocess.run(
        [str(refutil.REF), "-v", "error", "-i",
         str(tmp_path / "rgb.avi"), "-f", "rawvideo",
         "-pix_fmt", fmt, "-"],
        check=True, capture_output=True).stdout
    ours = b"".join(np.ascontiguousarray(pl).tobytes()
                    for f in frames for pl in f.planes)
    assert ours == ref


@requires_ref
@pytest.mark.parametrize("pix", ["yuva420p", "yuva444p10le",
                                 "yuva422p10le"])
def test_ffv1_yuv_alpha(tmp_path, pix):
    """YUV + alpha: 3rd coded plane (state plane 2, own quant-table
    index in the slice header — ffv1dec.c decode_slice)."""
    _check_exact(_make(tmp_path, "ya.avi",
                       ["-pix_fmt", pix, "-coder", "1",
                        "-slices", "4"]))
