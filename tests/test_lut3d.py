"""3D LUT / color management tests (scale/lut3d.py + lut3d filter)."""

import numpy as np
import pytest

from ffmpeg_tpu.scale.lut3d import (apply_lut3d, identity_lut, parse_cube)


def test_parse_cube_ordering():
    # 2x2x2 LUT whose entries encode their own (r,g,b) index
    lines = ["# comment", "LUT_3D_SIZE 2"]
    for b in (0, 1):
        for g in (0, 1):
            for r in (0, 1):
                lines.append(f"{r}.0 {g}.0 {b}.0")
    lut, dmin, dmax = parse_cube("\n".join(lines))
    assert lut.shape == (2, 2, 2, 3)
    np.testing.assert_allclose(lut[1, 0, 0], [1, 0, 0])  # r index → r out
    np.testing.assert_allclose(lut[0, 0, 1], [0, 0, 1])


def test_identity_lut_is_identity():
    rng = np.random.default_rng(0)
    rgb = rng.random((33, 17, 3), np.float32)
    for method in ("tetrahedral", "trilinear"):
        out = np.asarray(apply_lut3d(rgb, identity_lut(17), method=method))
        np.testing.assert_allclose(out, rgb, atol=1e-5)


def test_gamma_lut_matches_direct():
    n = 33
    g = np.linspace(0, 1, n, dtype=np.float32)
    r, gg, b = np.meshgrid(g, g, g, indexing="ij")
    lut = np.stack([r, gg, b], -1) ** 2.2
    rgb = np.random.default_rng(1).random((64, 64, 3), np.float32)
    out = np.asarray(apply_lut3d(rgb, lut, method="tetrahedral"))
    np.testing.assert_allclose(out, rgb ** 2.2, atol=2e-3)


def test_filter_graph_lut3d(tmp_path):
    from ffmpeg_tpu.core.frame import Frame
    from ffmpeg_tpu.filters import parse_graph
    from ffmpeg_tpu.utils.rational import Rational
    # invert LUT: out = 1 - in
    n = 5
    lines = [f"LUT_3D_SIZE {n}"]
    g = np.linspace(0, 1, n)
    for b in g:
        for gg in g:
            for r in g:
                lines.append(f"{1-r:.6f} {1-gg:.6f} {1-b:.6f}")
    p = tmp_path / "invert.cube"
    p.write_text("\n".join(lines))
    rng = np.random.default_rng(2)
    planes = [rng.integers(0, 256, (32, 32)).astype(np.uint8)
              for _ in range(3)]
    f = Frame.video(32, 32, "rgb24", planes=planes, pts=0,
                    time_base=Rational(1, 25))
    (o,) = parse_graph(f"lut3d=file={p}").run([f])
    for i in range(3):
        np.testing.assert_allclose(np.asarray(o.planes[i]).astype(int),
                                   255 - planes[i].astype(int), atol=1)


def test_lut3d_rejects_yuv():
    from ffmpeg_tpu.core.frame import Frame
    from ffmpeg_tpu.filters import parse_graph
    from ffmpeg_tpu.utils.error import InvalidData
    from ffmpeg_tpu.utils.rational import Rational
    planes = [np.zeros((16, 16), np.uint8), np.zeros((8, 8), np.uint8),
              np.zeros((8, 8), np.uint8)]
    f = Frame.video(16, 16, "yuv420p", planes=planes, pts=0,
                    time_base=Rational(1, 25))
    with pytest.raises(InvalidData):
        parse_graph("lut3d").run([f])
