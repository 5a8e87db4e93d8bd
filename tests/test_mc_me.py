"""Motion compensation + estimation kernel tests (checkasm-style:
randomized inputs vs a numpy reference)."""

import numpy as np
import pytest

from ffmpeg_tpu.ops import mc, me


def test_mc_integer_displacement_exact():
    rng = np.random.default_rng(0)
    ref = rng.integers(0, 256, (64, 64)).astype(np.float32)
    # one 16x16 block grid with integer MVs (quarter-pel units: *4)
    mvs = np.zeros((3, 3, 2), np.int32)
    mvs[1, 1] = (8, -4)   # dy=+2, dx=-1 full-pel
    out = np.asarray(mc.mc_blocks(ref, mvs, block=16))
    np.testing.assert_allclose(out[:16, :16], ref[:16, :16], atol=1e-4)
    np.testing.assert_allclose(
        out[16:32, 16:32], ref[18:34, 15:31], atol=1e-4)


def test_mc_halfpel_matches_sixtap():
    rng = np.random.default_rng(1)
    ref = rng.integers(0, 256, (32, 32)).astype(np.float32)
    mvs = np.full((2, 2, 2), 0, np.int32)
    mvs[..., 1] = 2   # half-pel horizontal
    out = np.asarray(mc.mc_blocks(ref, mvs, block=16))
    # numpy 6-tap on row 0 interior
    taps = np.array([1, -5, 20, 20, -5, 1], np.float64) / 32.0
    x = np.pad(ref, ((0, 0), (2, 3)), mode="edge")
    expect = sum(t * x[:, i:i + 32] for i, t in enumerate(taps))
    np.testing.assert_allclose(out, expect, atol=1e-3)


def test_mc_bilinear_quarter():
    ref = np.arange(64, dtype=np.float32).reshape(8, 8)
    mvs = np.zeros((1, 1, 2), np.int32)
    mvs[0, 0] = (4, 4)    # half-pel in 1/8 units
    out = np.asarray(mc.mc_bilinear(ref, mvs, block=8))
    expect = (ref + np.roll(ref, -1, 0) + np.roll(ref, -1, 1)
              + np.roll(np.roll(ref, -1, 0), -1, 1)) / 4
    np.testing.assert_allclose(out[:7, :7], expect[:7, :7], atol=1e-4)


def test_motion_search_finds_known_shift():
    rng = np.random.default_rng(2)
    ref = rng.integers(0, 256, (64, 64)).astype(np.float32)
    # current = reference shifted by (+3, -2): block content at (y,x)
    # comes from ref at (y+3, x-2) → MV (dy,dx)=(3,-2)
    cur = np.zeros_like(ref)
    cur[:, :] = np.roll(np.roll(ref, -3, 0), 2, 1)
    mvs, cost = me.motion_search(cur, ref, block=16, search=4)
    mvs = np.asarray(mvs)
    # interior blocks (no wrap-around contamination)
    assert tuple(mvs[1, 1]) == (3, -2)
    assert tuple(mvs[2, 1]) == (3, -2)
    assert float(np.asarray(cost)[1, 1]) == 0.0


def test_sad_volume_matches_numpy():
    rng = np.random.default_rng(3)
    cur = rng.integers(0, 256, (32, 32)).astype(np.float32)
    ref = rng.integers(0, 256, (32, 32)).astype(np.float32)
    vol = np.asarray(me.sad_cost_volume(cur, ref, block=16, search=2))
    refp = np.pad(ref, 2, mode="edge")
    for dy in range(-2, 3):
        for dx in range(-2, 3):
            shifted = refp[2 + dy:2 + dy + 32, 2 + dx:2 + dx + 32]
            expect = np.abs(cur[:16, :16] - shifted[:16, :16]).sum()
            assert abs(vol[0, 0, dy + 2, dx + 2] - expect) < 1e-2


def test_satd_zero_for_identical():
    rng = np.random.default_rng(4)
    a = rng.integers(0, 256, (16, 16)).astype(np.float32)
    s = np.asarray(me.satd_blocks(a, a, block=8))
    np.testing.assert_allclose(s, 0.0)
    b = a + 1.0   # DC offset: SATD = 8*8*1/8 per block via DC coefficient
    s2 = np.asarray(me.satd_blocks(a, b, block=8))
    np.testing.assert_allclose(s2, 8.0, atol=1e-4)


def test_sad_pl_matches_xla():
    """Pallas full-search SAD (interpreter mode on CPU) == the XLA
    reference formulation, including frame edges."""
    import jax.numpy as jnp
    rng = np.random.default_rng(3)
    cur = rng.integers(0, 256, (40, 144)).astype(np.uint8)
    ref = rng.integers(0, 256, (40, 144)).astype(np.uint8)
    a = np.asarray(me.sad_cost_volume(jnp.asarray(cur),
                                      jnp.asarray(ref), 8, 4))
    b = np.asarray(me.sad_cost_volume_pl(jnp.asarray(cur),
                                         jnp.asarray(ref), 8, 4,
                                         interpret=True))
    np.testing.assert_array_equal(a, b)


def test_mc_bounded_matches_exact_interior():
    """mc_blocks_bounded == mc_blocks wherever the tap window stays
    inside the frame (at edges the bounded form interpolates the
    edge-padded SOURCE — libavcodec emulated_edge_mc semantics — while
    mc_blocks clamps interpolated coordinates)."""
    import jax.numpy as jnp
    rng = np.random.default_rng(4)
    ref = rng.integers(0, 256, (64, 128)).astype(np.float32)
    mvs = rng.integers(-24, 24, (4, 8, 2)).astype(np.int32)
    a = np.asarray(mc.mc_blocks(jnp.asarray(ref), jnp.asarray(mvs)))
    b = np.asarray(mc.mc_blocks_bounded(jnp.asarray(ref),
                                        jnp.asarray(mvs),
                                        max_disp=8))
    np.testing.assert_allclose(a[16:-16, 16:-16], b[16:-16, 16:-16],
                               atol=1e-4)
