"""WebP tests: crafted lossy files (our VP8 keyframe craft wrapped in
RIFF) decoded byte-exact vs the reference webp decoder."""

import subprocess

import numpy as np
import pytest

import refutil
from conftest import requires_ref

from test_vp8 import Plan, craft_kf

from ffmpeg_tpu.codecs import CodecContext
from ffmpeg_tpu.codecs.webp import wrap_webp
from ffmpeg_tpu.io.demux import open_input

W, H = 80, 64


def _ref_webp_ok():
    out = subprocess.run([str(refutil.REF), "-decoders"],
                         capture_output=True, text=True).stdout
    return " webp " in out


@requires_ref
@pytest.mark.parametrize("seed", [0, 3])
def test_webp_lossless_vs_ref(tmp_path, seed):
    """Our VP8L encoder's output decodes identically in the reference
    and round-trips losslessly through our decoder."""
    if not _ref_webp_ok():
        pytest.skip("reference lacks webp decoder")
    from ffmpeg_tpu.codecs.webp_vp8l import decode_vp8l
    from ffmpeg_tpu.codecs.webp_vp8l_enc import (encode_vp8l,
                                                 wrap_webp_lossless)
    rng = np.random.default_rng(seed)
    img = (rng.integers(0, 8, (40, 56, 4)) * 32).astype(np.uint8)
    img[:, :, 0] = 255
    payload = encode_vp8l(img, subtract_green=bool(seed))
    f = tmp_path / "l.webp"
    f.write_bytes(wrap_webp_lossless(payload))
    raw = subprocess.run(
        [str(refutil.REF), "-v", "error", "-i", str(f),
         "-f", "rawvideo", "-"], check=True, capture_output=True).stdout
    ref = np.frombuffer(raw, np.uint8).reshape(40, 56, 4)
    np.testing.assert_array_equal(ref, img)
    _, _, ours = decode_vp8l(payload)
    np.testing.assert_array_equal(ours, img)


@requires_ref
def test_webp_encoder_cli_roundtrip(tmp_path):
    """CLI: png → webp (our encoder) → reference decodes losslessly."""
    if not _ref_webp_ok():
        pytest.skip("reference lacks webp decoder")
    import subprocess as sp
    src = tmp_path / "in.png"
    sp.run([str(refutil.REF), "-v", "error", "-f", "lavfi", "-i",
            "testsrc2=size=64x48", "-frames:v", "1", "-pix_fmt",
            "rgb24", str(src)], check=True)
    out = tmp_path / "out.webp"
    sp.run(["python", "-m", "ffmpeg_tpu.cli.ffmpeg", "-v", "error",
            "-i", str(src), "-frames:v", "1", str(out)], check=True,
           env=_env())
    a = sp.run([str(refutil.REF), "-v", "error", "-i", str(out),
                "-pix_fmt", "rgb24", "-f", "rawvideo", "-"],
               check=True, capture_output=True).stdout
    b = sp.run([str(refutil.REF), "-v", "error", "-i", str(src),
                "-f", "rawvideo", "-"], check=True,
               capture_output=True).stdout
    assert a == b


def _env():
    import os
    e = dict(os.environ)
    e.setdefault("JAX_PLATFORMS", "cpu")
    return e


@requires_ref
@pytest.mark.parametrize("seed", [0, 7])
def test_webp_lossy(tmp_path, seed):
    if not _ref_webp_ok():
        pytest.skip("reference lacks webp decoder")
    rng = np.random.default_rng(seed)
    vp8 = craft_kf(Plan(rng), filter_level=20)
    f = tmp_path / "img.webp"
    f.write_bytes(wrap_webp(vp8))
    raw = subprocess.run(
        [str(refutil.REF), "-v", "error", "-i", str(f),
         "-f", "rawvideo", "-"], check=True, capture_output=True).stdout
    d = open_input(str(f))
    assert d.streams[0].codecpar.codec_id == "webp"
    assert (d.streams[0].codecpar.width,
            d.streams[0].codecpar.height) == (W, H)
    dec = CodecContext.open_decoder(d.streams[0].codecpar)
    frames = dec.decode_all([d.read_packet()])
    assert len(frames) == 1
    got = np.concatenate([np.asarray(pl).ravel()
                          for pl in frames[0].planes])
    np.testing.assert_array_equal(got, np.frombuffer(raw, np.uint8))
