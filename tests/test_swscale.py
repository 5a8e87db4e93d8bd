"""Scaler correctness: self-consistency + differential tests vs the
reference swscale (tolerance-gated, FATE oneoff/stddev-style)."""

import numpy as np
import pytest

import refutil
from conftest import requires_ref

from ffmpeg_tpu.core import imgutils
from ffmpeg_tpu.core.frame import Frame
from ffmpeg_tpu.formats import pixfmt
from ffmpeg_tpu.scale.swscale import Scaler, scale_frame
from ffmpeg_tpu.scale import filters as sf


def test_resize_matrix_rows_sum_to_one():
    for name in ("bilinear", "bicubic", "lanczos", "area", "gauss", "spline", "neighbor"):
        m = sf.resize_matrix(224, 1080, name)
        np.testing.assert_allclose(m.sum(axis=1), 1.0, atol=1e-5)
        m = sf.resize_matrix(1080, 224, name)  # upscale
        np.testing.assert_allclose(m.sum(axis=1), 1.0, atol=1e-5)


def test_identity_is_exact():
    m = sf.resize_matrix(64, 64, "bicubic")
    np.testing.assert_allclose(m, np.eye(64), atol=1e-6)


def _rand_frame(w, h, fmt, seed=0):
    rng = np.random.default_rng(seed)
    d = pixfmt.get(fmt)
    comps = []
    for i, c in enumerate(d.comp):
        wc, hc = imgutils.component_dims(d, i, w, h)
        comps.append(rng.integers(0, (1 << c.depth), (hc, wc)).astype(d.component_dtype()))
    return Frame.video(w, h, fmt, planes=comps)


def test_same_fmt_resize_shapes():
    f = _rand_frame(64, 48, "yuv420p")
    out = scale_frame(f, 32, 24, "yuv420p")
    assert out.width == 32 and out.height == 24
    assert np.asarray(out.planes[0]).shape == (24, 32)
    assert np.asarray(out.planes[1]).shape == (12, 16)


def test_rgb_to_yuv_and_back_roundtrip():
    # RGB → YUV444 → RGB stays in gamut, so the roundtrip must be tight
    f = _rand_frame(32, 32, "rgb24", seed=1)
    yuv = scale_frame(f, 32, 32, "yuv444p")
    back = scale_frame(yuv, 32, 32, "rgb24", src_colorspace="bt470bg")
    for a, b in zip(f.planes, back.planes):
        d = np.abs(np.asarray(a, np.int32) - np.asarray(b, np.int32))
        assert d.max() <= 3, d.max()


def test_gray_passthrough_exact():
    f = _rand_frame(33, 17, "gray")
    out = scale_frame(f, 33, 17, "gray")
    np.testing.assert_array_equal(np.asarray(out.planes[0]), np.asarray(f.planes[0]))


def test_rgb_reorder_exact():
    f = _rand_frame(16, 8, "rgb24")
    out = scale_frame(f, 16, 8, "bgr24")
    # bgr24 unpack order is canonical (R,G,B) too — conversion is identity
    for a, b in zip(f.planes, out.planes):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_bitdepth_up_exact_scaling():
    f = _rand_frame(16, 8, "yuv420p")
    out = scale_frame(f, 16, 8, "yuv420p10le")
    y8 = np.asarray(f.planes[0], np.float64)
    y10 = np.asarray(out.planes[0], np.float64)
    # limited-range 8->10 bit is a 4x level stretch
    expect = np.clip(np.floor((y8 - 16) * (876.0 / 219.0) + 64 + 0.5), 0, 1023)
    assert np.abs(y10 - expect).max() <= 1


def test_batched_matches_single():
    import jax.numpy as jnp
    sc = Scaler(src_w=64, src_h=48, src_fmt="yuv420p",
                dst_w=32, dst_h=32, dst_fmt="rgb24")
    f1 = _rand_frame(64, 48, "yuv420p", seed=3)
    f2 = _rand_frame(64, 48, "yuv420p", seed=4)
    single1 = sc.run([jnp.asarray(p) for p in f1.planes])
    single2 = sc.run([jnp.asarray(p) for p in f2.planes])
    batched = sc.run([jnp.stack([np.asarray(a), np.asarray(b)])
                      for a, b in zip(f1.planes, f2.planes)])
    for i in range(3):
        np.testing.assert_array_equal(np.asarray(batched[i][0]), np.asarray(single1[i]))
        np.testing.assert_array_equal(np.asarray(batched[i][1]), np.asarray(single2[i]))


# ---------- differential vs reference swscale --------------------------------

def _ref_frame(w, h, fmt, n=1):
    raw = refutil.gen_rawvideo(w, h, fmt, nframes=n)
    fsz = imgutils.image_buffer_size(fmt, w, h)
    return [Frame.from_bytes(raw[i * fsz:(i + 1) * fsz], fmt, w, h) for i in range(n)]


@requires_ref
@pytest.mark.parametrize("dst_fmt", ["rgb24", "bgr24", "gray", "yuv444p", "nv12"])
def test_unscaled_convert_vs_reference(dst_fmt):
    w, h = 128, 96
    (f,) = _ref_frame(w, h, "yuv420p")
    ours = scale_frame(f, w, h, dst_fmt).numpy()
    ref_raw = refutil.ref_scale(f.to_bytes(), w, h, "yuv420p", w, h, dst_fmt,
                                flags="bicubic+full_chroma_int+full_chroma_inp+accurate_rnd")
    ref = Frame.from_bytes(ref_raw, dst_fmt, w, h)
    for i, (a, b) in enumerate(zip(ours.planes, ref.planes)):
        p = refutil.psnr(a, b)
        assert p > 50, f"comp {i}: psnr {p:.1f} too low vs reference"


@requires_ref
@pytest.mark.parametrize("dst_wh", [(224, 224), (64, 48), (256, 192)])
def test_scale_vs_reference_bicubic(dst_wh):
    w, h = 128, 96
    dw, dh = dst_wh
    (f,) = _ref_frame(w, h, "yuv420p")
    ours = scale_frame(f, dw, dh, "rgb24", filter="bicubic").numpy()
    ref_raw = refutil.ref_scale(f.to_bytes(), w, h, "yuv420p", dw, dh, "rgb24",
                                flags="bicubic+full_chroma_int+full_chroma_inp+accurate_rnd")
    ref = Frame.from_bytes(ref_raw, "rgb24", dw, dh)
    for i, (a, b) in enumerate(zip(ours.planes, ref.planes)):
        p = refutil.psnr(a, b)
        assert p > 50, f"comp {i}: psnr {p:.1f} too low vs reference scale"


@requires_ref
def test_range_conversion_vs_reference():
    w, h = 64, 64
    (f,) = _ref_frame(w, h, "yuv420p")
    ours = scale_frame(f, w, h, "yuv420p", dst_range=True).numpy()
    ref_raw = refutil.ref_scale(f.to_bytes(), w, h, "yuv420p", w, h, "yuv420p",
                                extra=":in_range=tv:out_range=pc")
    ref = Frame.from_bytes(ref_raw, "yuv420p", w, h)
    p = refutil.psnr(ours.planes[0], ref.planes[0])
    assert p > 45, p
