"""MJPEG codec tests: differential vs reference decoder/encoder, native
vs python entropy paths, demuxer splitting."""

import subprocess

import numpy as np
import pytest

import refutil
from conftest import requires_ref

from ffmpeg_tpu.codecs import CodecContext
from ffmpeg_tpu.codecs.mjpeg import MjpegDecoder
from ffmpeg_tpu.core.frame import Frame
from ffmpeg_tpu.core.packet import Packet
from ffmpeg_tpu.io import open_input
from ffmpeg_tpu.io.stream import CodecParameters, MediaType


def _par(**kw):
    return CodecParameters(codec_type=MediaType.VIDEO, codec_id="mjpeg", **kw)


def _ref_jpeg(w=160, h=120, pix="yuvj420p", q=3, frames=1):
    return refutil.run(["-f", "lavfi", "-i", f"testsrc2=size={w}x{h}:rate=25",
                        "-frames:v", str(frames), "-pix_fmt", pix,
                        "-q:v", str(q), "-f", "mjpeg", "-c:v", "mjpeg", "-"])


def _ref_decode(jpg, w, h, pix="yuvj420p"):
    raw = subprocess.run(
        [str(refutil.REF), "-v", "error", "-f", "mjpeg", "-i", "-",
         "-pix_fmt", pix, "-f", "rawvideo", "-"],
        input=jpg, check=True, capture_output=True).stdout
    base = {"yuvj420p": "yuv420p", "yuvj422p": "yuv422p",
            "yuvj444p": "yuv444p", "gray": "gray"}[pix]
    return Frame.from_bytes(raw, base, w, h)


@requires_ref
@pytest.mark.parametrize("pix,w,h", [
    ("yuvj420p", 160, 120), ("yuvj422p", 160, 120), ("yuvj444p", 96, 96),
])
def test_decode_matches_reference(pix, w, h):
    jpg = _ref_jpeg(w, h, pix)
    dec = CodecContext.open_decoder(_par())
    (f,) = dec.decode_all([Packet(data=jpg, pts=0)])
    ref = _ref_decode(jpg, w, h, pix)
    assert (f.width, f.height) == (w, h)
    for i, (a, b) in enumerate(zip(f.numpy().planes, ref.planes)):
        d = np.abs(np.asarray(a, np.int32) - np.asarray(b, np.int32))
        assert d.max() <= 1, f"comp {i}: maxdiff {d.max()}"


@requires_ref
def test_odd_dims_roundtrip_vs_reference():
    """Odd dims exercise MCU padding/cropping: our encoder → both decoders."""
    w, h = 97, 63
    rng = np.random.default_rng(1)
    planes = [(rng.random((h, w)) * 200 + 20).astype(np.uint8) for _ in range(3)]
    src = Frame.video(w, h, "yuv444p", planes=planes)
    enc = CodecContext.open_encoder(_par(width=w, height=h),
                                    options={"quality": 97})
    enc.send_frame(src)
    pkt = enc.receive_packet()
    ref = _ref_decode(pkt.data, w, h, "yuvj444p")
    dec = CodecContext.open_decoder(_par())
    (f,) = dec.decode_all([pkt])
    assert (f.width, f.height) == (w, h)
    for i, (a, b) in enumerate(zip(f.numpy().planes, ref.planes)):
        d = np.abs(np.asarray(a, np.int32) - np.asarray(b, np.int32))
        assert d.max() <= 1, f"comp {i}: maxdiff {d.max()}"


@requires_ref
def test_python_fallback_matches_native():
    jpg = _ref_jpeg(64, 48)
    dec_native = MjpegDecoder(_par())
    dec_py = MjpegDecoder(_par())
    (f1,) = dec_native.decode(Packet(data=jpg))
    # force python path
    dec_py._decode_scan = dec_py._decode_scan_py
    (f2,) = dec_py.decode(Packet(data=jpg))
    for a, b in zip(f1.planes, f2.planes):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@requires_ref
def test_restart_markers():
    """Our encoder emits DRI/RSTn; both our decoder and the reference must
    agree on the result."""
    w, h = 96, 64
    raw = refutil.gen_rawvideo(w, h, "yuv420p")
    src = Frame.from_bytes(raw, "yuv420p", w, h)
    enc = CodecContext.open_encoder(_par(width=w, height=h),
                                    options={"quality": 92, "restart_interval": 2})
    enc.send_frame(src)
    jpg = enc.receive_packet().data
    assert b"\xFF\xDD" in jpg and b"\xFF\xD0" in jpg
    dec = CodecContext.open_decoder(_par())
    (f,) = dec.decode_all([Packet(data=jpg, pts=0)])
    ref = _ref_decode(jpg, w, h)
    for a, b in zip(f.numpy().planes, ref.planes):
        d = np.abs(np.asarray(a, np.int32) - np.asarray(b, np.int32))
        assert d.max() <= 1


@requires_ref
def test_encoder_reference_decodable():
    w, h = 160, 120
    raw = refutil.gen_rawvideo(w, h, "yuv420p")
    src = Frame.from_bytes(raw, "yuv420p", w, h)
    enc = CodecContext.open_encoder(_par(width=w, height=h),
                                    options={"quality": 90})
    enc.send_frame(src)
    pkt = enc.receive_packet()
    ref = _ref_decode(pkt.data, w, h)
    for i, (a, b) in enumerate(zip(src.planes, ref.planes)):
        p = refutil.psnr(a, b)
        assert p > 35, f"comp {i}: roundtrip psnr {p:.1f}"


@requires_ref
def test_optimal_huffman_encoder():
    """huffman=optimal builds per-frame length-limited (<=9 bit) tables:
    smaller files, still decodable by the reference and by us."""
    w, h = 160, 120
    raw = refutil.gen_rawvideo(w, h, "yuv420p")
    src = Frame.from_bytes(raw, "yuv420p", w, h)
    sizes = {}
    for name, opts in (("std", {}), ("opt", {"huffman": "optimal"})):
        enc = CodecContext.open_encoder(
            _par(width=w, height=h),
            options={"quality": 90, "restart_interval": 2, **opts})
        enc.send_frame(src)
        jpg = enc.receive_packet().data
        sizes[name] = len(jpg)
        ref = _ref_decode(jpg, w, h)
        dec = CodecContext.open_decoder(_par())
        (f,) = dec.decode_all([Packet(data=jpg, pts=0)])
        for a, b in zip(f.numpy().planes, ref.planes):
            d = np.abs(np.asarray(a, np.int32) - np.asarray(b, np.int32))
            assert d.max() <= 1
    assert sizes["opt"] < sizes["std"]


@requires_ref
def test_mjpeg_stream_demuxer():
    jpg = _ref_jpeg(64, 48, frames=3)
    d = open_input(jpg, format="mjpeg")
    pkts = list(d.packets())
    assert len(pkts) == 3
    dec = CodecContext.open_decoder(d.streams[0].codecpar)
    frames = dec.decode_all(iter(pkts))
    assert len(frames) == 3
    assert frames[0].width == 64


def test_gray_jpeg_roundtrip():
    w, h = 80, 64
    rng = np.random.default_rng(0)
    plane = (rng.random((h, w)) * 64 + 96).astype(np.uint8)
    src = Frame.video(w, h, "gray", planes=[plane])
    enc = CodecContext.open_encoder(_par(width=w, height=h),
                                    options={"quality": 95})
    enc.send_frame(src)
    pkt = enc.receive_packet()
    dec = CodecContext.open_decoder(_par())
    (f,) = dec.decode_all([pkt])
    assert f.format == "gray"
    p = refutil.psnr(np.asarray(f.planes[0]), plane)
    assert p > 30, p
