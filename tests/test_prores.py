"""ProRes decoder tests — differential vs the reference encoder/decoder.
Our float matmul IDCT vs the reference's integer simple_idct: <=1 LSB
at 10 bit."""

import subprocess

import numpy as np
import pytest

import refutil
from conftest import requires_ref

from ffmpeg_tpu.codecs import CodecContext
from ffmpeg_tpu.io import open_input


def _encode(tmp_path, size="128x96", pix="yuv422p10le", profile=None,
            frames=2, name="p.mov"):
    p = tmp_path / name
    cmd = [str(refutil.REF), "-v", "error", "-f", "lavfi",
           "-i", f"testsrc2=size={size}:rate=25", "-frames:v", str(frames),
           "-c:v", "prores", "-pix_fmt", pix]
    if profile is not None:
        cmd += ["-profile:v", str(profile)]
    cmd += ["-y", str(p)]
    subprocess.run(cmd, check=True, capture_output=True)
    return p


def _compare(path, w, h, is444, nframes, tol=1):
    d = open_input(str(path))
    dec = CodecContext.open_decoder(d.streams[0].codecpar)
    frames = dec.decode_all([p for p in d.packets()])
    assert len(frames) == nframes
    raw = subprocess.run(
        [str(refutil.REF), "-v", "error", "-i", str(path),
         "-f", "rawvideo", "-"], check=True, capture_output=True).stdout
    cw = w if is444 else w // 2
    fsz = (w * h + 2 * cw * h) * 2
    assert len(raw) == nframes * fsz
    for i, f in enumerate(frames):
        off = i * fsz
        exp = [np.frombuffer(raw[off:off + w * h * 2],
                             "<u2").reshape(h, w)]
        off += w * h * 2
        for _ in range(2):
            exp.append(np.frombuffer(raw[off:off + cw * h * 2],
                                     "<u2").reshape(h, cw))
            off += cw * h * 2
        for a, b in zip(f.planes, exp):
            d_ = np.abs(np.asarray(a).astype(int) - b.astype(int))
            assert d_.max() <= tol, f"frame {i}: max diff {d_.max()}"
            assert d_.mean() < 0.5


@requires_ref
def test_prores_422_standard(tmp_path):
    p = _encode(tmp_path)
    _compare(p, 128, 96, False, 2)


@requires_ref
def test_prores_422_hq_large(tmp_path):
    p = _encode(tmp_path, size="320x180", profile=3, frames=1)
    _compare(p, 320, 180, False, 1)


@requires_ref
def test_prores_4444(tmp_path):
    p = _encode(tmp_path, pix="yuv444p10le", profile=4, frames=1)
    # 4444 decodes at 12 bit: the reference's 16-bit-intermediate integer
    # IDCT deviates more from the exact transform there
    _compare(p, 128, 96, True, 1, tol=16)


@requires_ref
def test_prores_odd_size(tmp_path):
    p = _encode(tmp_path, size="130x98", frames=1)
    _compare(p, 130, 98, False, 1)
