"""QOI + TIFF image codec tests: reference-encoded files decoded
pixel-exact; our encodes decoded by the reference back to the exact
pixels (QOI encode is byte-identical to the reference's)."""

import subprocess

import numpy as np
import pytest

import refutil
from conftest import requires_ref

from ffmpeg_tpu.codecs import CodecContext
from ffmpeg_tpu.io import open_input
from ffmpeg_tpu.io.stream import CodecParameters, MediaType

W, H = 150, 110


def _make(tmp_path, ext, extra):
    p = tmp_path / f"i.{ext}"
    subprocess.run(
        [str(refutil.REF), "-v", "error", "-f", "lavfi", "-i",
         f"testsrc2=size={W}x{H}", "-frames:v", "1", *extra,
         "-y", str(p)], check=True)
    return p


def _ours(path):
    d = open_input(str(path))
    dec = CodecContext.open_decoder(d.streams[0].codecpar)
    return dec.decode_all([d.read_packet()])[0]


def _ref_raw(path, fmt):
    return subprocess.run(
        [str(refutil.REF), "-v", "error", "-i", str(path), "-f",
         "rawvideo", "-pix_fmt", fmt, "-"],
        check=True, capture_output=True).stdout


def _interleaved(f):
    if f.format.startswith("yuv"):      # planar comparison
        return b"".join(np.asarray(p).tobytes() for p in f.planes)
    return np.stack([np.asarray(p) for p in f.planes], -1).tobytes()


@requires_ref
@pytest.mark.parametrize("pix", ["rgb24", "rgba"])
def test_qoi_decode(tmp_path, pix):
    p = _make(tmp_path, "qoi", ["-pix_fmt", pix])
    f = _ours(p)
    assert f.format == pix
    assert _interleaved(f) == _ref_raw(p, pix)


@requires_ref
def test_qoi_encode_byte_identical(tmp_path):
    p = _make(tmp_path, "qoi", ["-pix_fmt", "rgb24"])
    f = _ours(p)
    par = CodecParameters(codec_type=MediaType.VIDEO, codec_id="qoi",
                          width=f.width, height=f.height)
    enc = CodecContext.open_encoder(par)
    enc.send_frame(f)
    enc.send_frame(None)
    assert bytes(enc.receive_packet().data) == p.read_bytes()


@requires_ref
@pytest.mark.parametrize("pix,comp", [
    ("rgb24", "raw"), ("rgb24", "packbits"), ("rgb24", "lzw"),
    ("rgb24", "deflate"), ("gray8", "packbits"), ("pal8", "lzw"),
    ("yuv420p", "lzw"), ("yuv422p", "packbits"), ("yuv444p", "raw"),
    ("rgb48le", "raw"), ("rgba", "packbits"), ("monob", "raw"),
])
def test_tiff_decode(tmp_path, pix, comp):
    p = _make(tmp_path, "tif",
              ["-pix_fmt", pix, "-compression_algo", comp])
    f = _ours(p)
    assert _interleaved(f) == _ref_raw(p, f.format)


@requires_ref
@pytest.mark.parametrize("comp", ["raw", "packbits", "deflate"])
def test_tiff_encode(tmp_path, comp):
    src = _make(tmp_path, "tif", ["-pix_fmt", "rgb24",
                                  "-compression_algo", "raw"])
    f = _ours(src)
    par = CodecParameters(codec_type=MediaType.VIDEO, codec_id="tiff",
                          width=f.width, height=f.height)
    enc = CodecContext.open_encoder(par, {"compression_algo": comp})
    enc.send_frame(f)
    enc.send_frame(None)
    out = tmp_path / "o.tif"
    out.write_bytes(bytes(enc.receive_packet().data))
    assert _ref_raw(out, "rgb24") == _ref_raw(src, "rgb24")


@requires_ref
def test_qoi_cli_roundtrip(tmp_path):
    """testsrc2 png → our CLI → .qoi read back by the reference."""
    from ffmpeg_tpu.cli.ffmpeg import main
    src = _make(tmp_path, "png", ["-pix_fmt", "rgb24"])
    out = tmp_path / "o.qoi"
    assert main(["-v", "error", "-i", str(src), "-y", str(out)]) == 0
    assert _ref_raw(out, "rgb24") == _ref_raw(src, "rgb24")
