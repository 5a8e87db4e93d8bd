"""DNxHD/DNxHR encoder tests: reference-binary decode of our stream
(dnxhddec.c interop) plus our own decoder, with per-depth quality
gates and a cross-decoder agreement check."""

import subprocess

import numpy as np
import pytest

import refutil
from conftest import requires_ref

from ffmpeg_tpu.codecs import CodecContext
from ffmpeg_tpu.core.frame import Frame
from ffmpeg_tpu.io import open_output
from ffmpeg_tpu.io.stream import CodecParameters, MediaType
from ffmpeg_tpu.utils.rational import Rational

W, H = 128, 80

_CASES = [("yuv422p10le", 10, 55.0), ("yuv422p", 8, 45.0)]


def _content(bits, nframes=2):
    mx = (1 << bits) - 1
    mid = 1 << (bits - 1)
    amp = mx // 4
    dt = np.uint16 if bits > 8 else np.uint8
    cw = W // 2
    yy, xx = np.mgrid[0:H, 0:W]
    out = []
    for i in range(nframes):
        y = ((mid + amp * np.sin(xx / 9 + i) + amp // 2 * np.cos(yy / 7))
             .astype(np.int64) & mx).astype(dt)
        u = ((mid + amp // 3 * np.sin(xx[:, :cw] / 5 + i))
             .astype(np.int64) & mx).astype(dt)
        v = ((mid + amp // 3 * np.cos(yy[:, :cw] / 6))
             .astype(np.int64) & mx).astype(dt)
        out.append([y, u, v])
    return out


def _encode(fmt, content):
    par = CodecParameters(codec_type=MediaType.VIDEO, codec_id="dnxhd",
                          width=W, height=H, pix_fmt=fmt,
                          framerate=Rational(25, 1))
    enc = CodecContext.open_encoder(par)
    pkts = []
    for i, planes in enumerate(content):
        p = enc.codec.encode(Frame.video(W, H, fmt, planes=planes, pts=i,
                                         time_base=Rational(1, 25)))[0]
        p.stream_index = 0
        p.duration = 1
        pkts.append(p)
    return par, pkts


@pytest.mark.parametrize("fmt,bits,gate", _CASES, ids=[c[0] for c in _CASES])
def test_own_decode_quality(fmt, bits, gate):
    content = _content(bits)
    par, pkts = _encode(fmt, content)
    dec = CodecContext.open_decoder(
        CodecParameters(codec_type=MediaType.VIDEO, codec_id="dnxhd",
                        width=W, height=H))
    mx = (1 << bits) - 1
    for planes, pkt in zip(content, pkts):
        out = dec.codec.decode(pkt)
        assert out and out[0].format == fmt
        for a, b in zip(planes, out[0].planes):
            mse = np.mean((a.astype(float)
                           - np.asarray(b).astype(float)) ** 2)
            assert 10 * np.log10(mx * mx / max(mse, 1e-9)) > gate


@requires_ref
@pytest.mark.parametrize("fmt,bits,gate", _CASES, ids=[c[0] for c in _CASES])
def test_reference_decodes_ours(fmt, bits, gate, tmp_path):
    content = _content(bits)
    par, pkts = _encode(fmt, content)
    path = tmp_path / "ours.mov"
    m = open_output(str(path), format="mov")
    m.add_stream(par, time_base=Rational(1, 25))
    for pkt in pkts:
        m.write_packet(pkt)
    m.write_trailer()
    m.close()
    r = subprocess.run(
        [str(refutil.REF), "-v", "error", "-nostdin", "-i", str(path),
         "-f", "rawvideo", "-pix_fmt", fmt, "-"],
        check=True, capture_output=True)
    dtype = "<u2" if bits > 8 else "u1"
    ref = np.frombuffer(r.stdout, dtype)
    ours = np.concatenate([pl.reshape(-1) for planes in content
                           for pl in planes])
    assert ref.size == ours.size
    mx = (1 << bits) - 1
    mse = np.mean((ref.astype(float) - ours.astype(float)) ** 2)
    assert 10 * np.log10(mx * mx / max(mse, 1e-9)) > gate

    # our decoder agrees with the reference within the IDCT tolerance
    dec = CodecContext.open_decoder(
        CodecParameters(codec_type=MediaType.VIDEO, codec_id="dnxhd",
                        width=W, height=H))
    mine = np.concatenate([
        np.asarray(pl).reshape(-1)
        for pkt in pkts for f in dec.codec.decode(pkt) for pl in f.planes])
    assert np.max(np.abs(mine.astype(int) - ref.astype(int))) <= 2
