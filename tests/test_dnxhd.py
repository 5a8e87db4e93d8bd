"""DNxHR decoder tests — differential vs the reference encoder/decoder
(float matmul IDCT vs integer simple_idct: <=1 LSB at 8 bit, small-LSB
at 10/12 bit)."""

import subprocess

import numpy as np
import pytest

import refutil
from conftest import requires_ref

from ffmpeg_tpu.codecs import CodecContext
from ffmpeg_tpu.io import open_input


def _roundtrip(tmp_path, profile, pix, w=256, h=128, tol=1, frames=2):
    p = tmp_path / f"{profile}.mov"
    subprocess.run(
        [str(refutil.REF), "-v", "error", "-f", "lavfi",
         "-i", f"testsrc2=size={w}x{h}:rate=25", "-frames:v", str(frames),
         "-c:v", "dnxhd", "-profile:v", profile, "-pix_fmt", pix,
         "-y", str(p)], check=True, capture_output=True)
    d = open_input(str(p))
    dec = CodecContext.open_decoder(d.streams[0].codecpar)
    out = dec.decode_all([x for x in d.packets()])
    assert len(out) == frames
    raw = subprocess.run(
        [str(refutil.REF), "-v", "error", "-i", str(p),
         "-f", "rawvideo", "-"], check=True, capture_output=True).stdout
    bpp = 1 if out[0].format == "yuv422p" else 2
    is444 = "444" in out[0].format
    cw = w if is444 else w // 2
    fsz = (w * h + 2 * cw * h) * bpp
    dt = np.uint8 if bpp == 1 else "<u2"
    for i, f in enumerate(out):
        off = i * fsz
        planes = [np.frombuffer(raw[off:off + w * h * bpp],
                                dt).reshape(h, w)]
        off += w * h * bpp
        for _ in range(2):
            planes.append(np.frombuffer(raw[off:off + cw * h * bpp],
                                        dt).reshape(h, cw))
            off += cw * h * bpp
        for a, b in zip(f.planes, planes):
            d_ = np.abs(np.asarray(a).astype(int) - b.astype(int))
            assert d_.max() <= tol, f"frame {i}: max {d_.max()}"


@requires_ref
def test_dnxhr_lb(tmp_path):
    _roundtrip(tmp_path, "dnxhr_lb", "yuv422p")


@requires_ref
def test_dnxhr_sq(tmp_path):
    _roundtrip(tmp_path, "dnxhr_sq", "yuv422p")


@requires_ref
def test_dnxhr_hq(tmp_path):
    _roundtrip(tmp_path, "dnxhr_hq", "yuv422p")


@requires_ref
def test_dnxhr_hqx_10bit(tmp_path):
    _roundtrip(tmp_path, "dnxhr_hqx", "yuv422p10le", tol=4)


@requires_ref
def test_dnxhr_odd_size(tmp_path):
    _roundtrip(tmp_path, "dnxhr_sq", "yuv422p", w=260, h=130, frames=1)
