import numpy as np
import pytest

from ffmpeg_tpu.core import imgutils
from ffmpeg_tpu.formats import pixfmt


def test_registry_basics():
    d = pixfmt.get("yuv420p")
    assert d.nb_components == 3
    assert d.nb_planes == 3
    assert d.log2_chroma_w == 1 and d.log2_chroma_h == 1
    assert d.is_planar and not d.is_rgb
    assert d.bits_per_pixel() == 12

    d = pixfmt.get("rgb24")
    assert d.nb_planes == 1 and d.is_rgb
    assert d.bits_per_pixel() == 24

    d = pixfmt.get("nv12")
    assert d.nb_planes == 2
    assert d.bits_per_pixel() == 12

    d = pixfmt.get("yuv420p10le")
    assert d.depth == 10
    assert d.bits_per_pixel() == 15


def test_aliases():
    assert pixfmt.get("yuvj420p").name == "yuv420p"
    assert pixfmt.get("yuv420p10").name == "yuv420p10le"
    assert pixfmt.get("gray8").name == "gray"


def test_chroma_dims_odd():
    d = pixfmt.get("yuv420p")
    assert d.chroma_dims(1920, 1080) == (960, 540)
    assert d.chroma_dims(7, 5) == (4, 3)  # ceil


def test_linesize():
    d = pixfmt.get("yuyv422")
    assert imgutils.plane_linesize(d, 0, 16) == 32
    d = pixfmt.get("rgb24")
    assert imgutils.plane_linesize(d, 0, 16) == 48
    d = pixfmt.get("nv12")
    assert imgutils.plane_linesize(d, 0, 16) == 16
    assert imgutils.plane_linesize(d, 1, 16) == 16
    d = pixfmt.get("monow")
    assert imgutils.plane_linesize(d, 0, 10) == 2


@pytest.mark.parametrize("fmt", [
    "yuv420p", "yuv422p", "yuv444p", "yuva420p", "nv12", "nv21",
    "rgb24", "bgr24", "rgba", "argb", "gray", "gray16le", "gray16be",
    "yuyv422", "uyvy422", "yuv420p10le", "yuv420p10be", "yuv444p16le",
    "gbrp", "gbrp10le", "rgb48le", "rgb565le", "rgb555le", "p010le",
    "monow", "grayf32le", "gbrpf32le",
])
def test_pack_unpack_roundtrip(fmt):
    rng = np.random.default_rng(42)
    d = pixfmt.get(fmt)
    w, h = 32, 16
    comps = []
    for i, c in enumerate(d.comp):
        w_c, h_c = imgutils.component_dims(d, i, w, h)
        if d.is_float:
            comps.append(rng.random((h_c, w_c), np.float32))
        else:
            hi = (1 << c.depth) - 1
            comps.append(rng.integers(0, hi + 1, (h_c, w_c)).astype(d.component_dtype()))
    buf = imgutils.pack(comps, fmt, w, h)
    assert len(buf) == imgutils.image_buffer_size(fmt, w, h)
    back = imgutils.unpack(buf, fmt, w, h)
    for a, b in zip(comps, back):
        np.testing.assert_array_equal(np.asarray(a, np.float64), np.asarray(b, np.float64))


def test_unpack_matches_reference_layout():
    """yuyv422: check byte positions Y0 U Y1 V explicitly."""
    # 2 pixels: Y0=10 U=20 Y1=30 V=40
    buf = bytes([10, 20, 30, 40])
    y, u, v = imgutils.unpack(buf, "yuyv422", 2, 1)
    assert y.tolist() == [[10, 30]]
    assert u.tolist() == [[20]]
    assert v.tolist() == [[40]]


def test_fill_black():
    comps = imgutils.fill_black("yuv420p", 4, 4)
    assert comps[0][0, 0] == 16
    assert comps[1][0, 0] == 128
