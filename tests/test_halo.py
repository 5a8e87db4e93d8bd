"""shard_map halo exchange: spatially-sharded deblock must equal the
unsharded whole-plane filter (SURVEY §5 stencil-halo pattern)."""

import numpy as np
import pytest


def test_sharded_deblock_matches_unsharded():
    import jax
    import jax.numpy as jnp
    from ffmpeg_tpu.parallel.mesh import make_mesh
    from ffmpeg_tpu.parallel.halo import sharded_deblock
    from ffmpeg_tpu.ops.deblock import deblock_plane

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(8, spatial=8)
    rng = np.random.default_rng(0)
    # blocky content: per-8x8 constant + noise so edges actually filter
    base = rng.integers(0, 255, (16, 16)).repeat(8, 0).repeat(8, 1)
    plane = np.clip(base + rng.integers(-3, 4, (128, 128)), 0,
                    255).astype(np.uint8)
    want = np.asarray(deblock_plane(jnp.asarray(plane), qp=40))
    got = np.asarray(sharded_deblock(jnp.asarray(plane), mesh, qp=40))
    assert not np.array_equal(plane, want)      # filter actually acted
    np.testing.assert_array_equal(got, want)


def test_sharded_deblock_4way():
    import jax
    import jax.numpy as jnp
    from ffmpeg_tpu.parallel.mesh import make_mesh
    from ffmpeg_tpu.parallel.halo import sharded_deblock
    from ffmpeg_tpu.ops.deblock import deblock_plane

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(8, spatial=4)       # ('data', 'spatial') = (2, 4)
    rng = np.random.default_rng(3)
    plane = rng.integers(0, 255, (96, 64)).astype(np.uint8)
    want = np.asarray(deblock_plane(jnp.asarray(plane), qp=30))
    got = np.asarray(sharded_deblock(jnp.asarray(plane), mesh, qp=30))
    np.testing.assert_array_equal(got, want)
