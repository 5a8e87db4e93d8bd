"""Deblocking stencil kernel tests (ops/deblock.py)."""

import numpy as np

from ffmpeg_tpu.ops.deblock import deblock_plane


def _blocky(h=32, w=32, block=8, lo=100, hi=110, seed=0):
    """Plane of per-block constant levels — pure blocking artifacts."""
    rng = np.random.default_rng(seed)
    levels = rng.integers(lo, hi, (h // block, w // block))
    return np.kron(levels, np.ones((block, block))).astype(np.uint8)


def test_smooths_block_edges():
    x = _blocky()
    y = np.asarray(deblock_plane(x, qp=30))
    # edge discontinuities must shrink at every internal vertical edge
    before = np.abs(x[:, 7].astype(int) - x[:, 8].astype(int))
    after = np.abs(y[:, 7].astype(int) - y[:, 8].astype(int))
    assert after.sum() < before.sum()
    # interior samples (2+ away from any edge) untouched
    np.testing.assert_array_equal(y[2:6, 2:6], x[2:6, 2:6])


def test_preserves_real_edges():
    # a strong edge (|p0-q0| >= alpha) must NOT be filtered
    x = np.zeros((16, 16), np.uint8)
    x[:, 8:] = 200
    y = np.asarray(deblock_plane(x, qp=30))
    np.testing.assert_array_equal(y, x)


def test_flat_plane_noop():
    x = np.full((24, 24), 77, np.uint8)
    y = np.asarray(deblock_plane(x, qp=40))
    np.testing.assert_array_equal(y, x)


def test_qp_zero_noop():
    x = _blocky()
    np.testing.assert_array_equal(np.asarray(deblock_plane(x, qp=0)), x)


def test_batched_shapes():
    x = np.stack([_blocky(seed=i) for i in range(3)])
    y = np.asarray(deblock_plane(x, qp=36))
    assert y.shape == x.shape and y.dtype == x.dtype
