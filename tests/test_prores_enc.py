"""ProRes encoder tests: our bitstream must decode in the REFERENCE
decoder (proresdec.c) close to the input (quality gate at the flat-4
qmat), and our own decoder must agree with the reference decode within
the float-vs-integer IDCT tolerance."""

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

W, H = 120, 70


def _content(bits, is444, nframes=2):
    mx = (1 << bits) - 1
    cw = W if is444 else W // 2
    mid = 1 << (bits - 1)
    amp = mx // 4
    out = []
    yy, xx = np.mgrid[0:H, 0:W]
    for i in range(nframes):
        y = ((mid + amp * np.sin(xx / 9 + i) + amp / 2 * np.cos(yy / 7))
             .astype(np.int64)) & mx
        u = ((mid + amp / 3 * np.sin(xx[:, :cw] / 5 + i))
             .astype(np.int64)) & mx
        v = ((mid + amp / 3 * np.cos(yy[:, :cw] / 6))
             .astype(np.int64)) & mx
        out.append([y.astype(np.uint16), u.astype(np.uint16),
                    v.astype(np.uint16)])
    return out


def _encode(fmt, content):
    par = CodecParameters(codec_type=MediaType.VIDEO, codec_id="prores",
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


_CASES = [("yuv422p10le", 10, False), ("yuv444p12le", 12, True)]


@pytest.mark.parametrize("fmt,bits,is444", _CASES, ids=[c[0] for c in _CASES])
def test_own_decode_quality(fmt, bits, is444):
    content = _content(bits, is444)
    par, pkts = _encode(fmt, content)
    dpar = CodecParameters(codec_type=MediaType.VIDEO, codec_id="prores",
                           width=W, height=H, codec_tag=par.codec_tag)
    dec = CodecContext.open_decoder(dpar)
    mx = (1 << bits) - 1
    for planes, pkt in zip(content, pkts):
        out = dec.codec.decode(pkt)
        assert out and out[0].format == fmt
        for a, b in zip(planes, out[0].planes):
            mse = np.mean((a.astype(float) - np.asarray(b).astype(float))
                          ** 2)
            psnr = 10 * np.log10(mx * mx / max(mse, 1e-9))
            assert psnr > 55, psnr


@requires_ref
@pytest.mark.parametrize("fmt,bits,is444", _CASES, ids=[c[0] for c in _CASES])
def test_reference_decodes_ours(fmt, bits, is444, tmp_path):
    content = _content(bits, is444)
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
    ref = np.frombuffer(r.stdout, "<u2")
    ours = np.concatenate([pl.reshape(-1) for planes in content
                           for pl in planes])
    assert ref.size == ours.size
    mx = (1 << bits) - 1
    mse = np.mean((ref.astype(float) - ours.astype(float)) ** 2)
    psnr = 10 * np.log10(mx * mx / max(mse, 1e-9))
    assert psnr > 55, psnr

    # cross-check: our decode of the same stream matches the reference
    # decode within the integer-vs-float IDCT tolerance class
    dpar = CodecParameters(codec_type=MediaType.VIDEO, codec_id="prores",
                           width=W, height=H, codec_tag=par.codec_tag)
    dec = CodecContext.open_decoder(dpar)
    mine = np.concatenate([
        np.asarray(pl).reshape(-1)
        for pkt in pkts for f in dec.codec.decode(pkt) for pl in f.planes])
    assert mine.size == ref.size
    assert np.max(np.abs(mine.astype(int) - ref.astype(int))) <= 2
