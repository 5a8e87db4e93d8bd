"""negate/eq/boxblur/unsharp/hue filter tests."""

import numpy as np
import pytest

from ffmpeg_tpu.core.frame import Frame
from ffmpeg_tpu.filters import parse_graph
from ffmpeg_tpu.utils.rational import Rational


def _frame(w=32, h=24, fill=None, seed=0):
    rng = np.random.default_rng(seed)
    if fill:
        planes = [np.full((h, w), fill[0], np.uint8),
                  np.full((h // 2, w // 2), fill[1], np.uint8),
                  np.full((h // 2, w // 2), fill[2], np.uint8)]
    else:
        planes = [rng.integers(0, 256, (h, w)).astype(np.uint8),
                  rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8),
                  rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8)]
    return Frame.video(w, h, "yuv420p", planes=planes, pts=0,
                       time_base=Rational(1, 25))


def test_negate():
    f = _frame(seed=1)
    (o,) = parse_graph("negate").run([f])
    for a, b in zip(f.planes, o.planes):
        np.testing.assert_array_equal(255 - np.asarray(a), np.asarray(b))


def test_negate_involution():
    f = _frame(seed=2)
    (o,) = parse_graph("negate,negate").run([f])
    for a, b in zip(f.planes, o.planes):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_eq_brightness_contrast():
    f = _frame(fill=(100, 128, 128))
    (o,) = parse_graph("eq=contrast=2.0:brightness=0.1").run([f])
    y = np.asarray(o.planes[0])
    # (100-128)*2 + 128 + 25.5 = 97.5 -> 98
    assert y[0, 0] == 98
    np.testing.assert_array_equal(np.asarray(o.planes[1]),
                                  np.asarray(f.planes[1]))


def test_eq_saturation():
    f = _frame(fill=(100, 168, 88))
    (o,) = parse_graph("eq=saturation=0.5").run([f])
    assert np.asarray(o.planes[1])[0, 0] == 148    # (168-128)*0.5+128
    assert np.asarray(o.planes[2])[0, 0] == 108


def test_boxblur_flat_invariant():
    f = _frame(fill=(77, 150, 60))
    (o,) = parse_graph("boxblur=luma_radius=3").run([f])
    for a, b in zip(f.planes, o.planes):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_boxblur_smooths():
    f = _frame(seed=3)
    (o,) = parse_graph("boxblur=luma_radius=2").run([f])
    y0 = np.asarray(f.planes[0]).astype(float)
    y1 = np.asarray(o.planes[0]).astype(float)
    assert y1.std() < y0.std()
    assert abs(y1.mean() - y0.mean()) < 2.0


def test_boxblur_matches_direct_mean():
    f = _frame(seed=4)
    (o,) = parse_graph("boxblur=luma_radius=1:chroma_radius=0").run([f])
    y = np.asarray(f.planes[0]).astype(np.float64)
    pad = np.pad(y, 1, mode="edge")
    direct = sum(pad[dy:dy + y.shape[0], dx:dx + y.shape[1]]
                 for dy in range(3) for dx in range(3)) / 9.0
    np.testing.assert_array_equal(
        np.asarray(o.planes[0]),
        np.clip(np.round(direct.astype(np.float32)), 0, 255)
        .astype(np.uint8))


def test_unsharp_increases_contrast():
    f = _frame(seed=5)
    (o,) = parse_graph("unsharp=luma_amount=1.5").run([f])
    assert np.asarray(o.planes[0]).astype(float).std() > \
        np.asarray(f.planes[0]).astype(float).std()
    np.testing.assert_array_equal(np.asarray(o.planes[1]),
                                  np.asarray(f.planes[1]))


def test_hue_rotation():
    f = _frame(fill=(128, 178, 128))     # pure +U
    (o,) = parse_graph("hue=h=90").run([f])
    # 90°: U -> V
    assert abs(int(np.asarray(o.planes[1])[0, 0]) - 128) <= 1
    assert abs(int(np.asarray(o.planes[2])[0, 0]) - 178) <= 1


def test_hue_saturation_zero_greys():
    f = _frame(seed=6)
    (o,) = parse_graph("hue=s=0").run([f])
    assert (np.asarray(o.planes[1]) == 128).all()
    assert (np.asarray(o.planes[2]) == 128).all()
