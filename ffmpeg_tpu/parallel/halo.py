"""Halo exchange for spatially-sharded stencil filters (SURVEY §5:
"the deblock filter crosses tile edges exactly like a stencil halo").

A plane sharded by rows over the mesh's 'spatial' axis cannot filter
the edges that straddle shard boundaries without its neighbours' border
rows. `halo_exchange` moves those rows over ICI with lax.ppermute
inside shard_map; `sharded_deblock` applies ops/deblock.deblock_plane
to each shard with block-aligned halos attached and equals the
unsharded filter exactly. This is the tile-parallel (P3-across-chips)
communication pattern VP9/HEVC tile decoding uses.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def halo_exchange(shard, axis_name: str, halo: int):
    """shard: this device's (rows, w) block. Returns (top, bottom): the
    `halo` boundary rows owned by the previous/next shard along the
    mesh axis. At the mesh edges the halos are poisoned with a large
    offset so threshold-gated stencils treat the frame border as
    unfilterable (matching the unsharded filter, which has no edge
    there)."""
    n = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    fwd = [(i, (i + 1) % n) for i in range(n)]       # bottom -> next
    bwd = [((i + 1) % n, i) for i in range(n)]       # top -> previous
    from_prev = jax.lax.ppermute(shard[-halo:], axis_name, fwd)
    from_next = jax.lax.ppermute(shard[:halo], axis_name, bwd)
    poison = jnp.asarray(10000, shard.dtype)
    top = jnp.where(idx == 0, from_prev + poison, from_prev)
    bottom = jnp.where(idx == n - 1, from_next + poison, from_next)
    return top, bottom


def sharded_deblock(plane, mesh: Mesh, qp: int = 30, block: int = 8,
                    axis: str = "spatial"):
    """Row-sharded deblock with halo exchange; equals the unsharded
    ops/deblock.deblock_plane on the same plane."""
    from ..ops.deblock import deblock_plane

    halo = block        # block-aligned halo keeps the edge grid intact
    nsh = mesh.shape[axis]
    h = plane.shape[0]
    if h % (nsh * block) != 0:
        raise ValueError("shard boundaries must be block-aligned")

    def local(shard):
        f32 = shard.astype(jnp.float32)
        top, bottom = halo_exchange(f32, axis, halo)
        ext = jnp.concatenate([top, f32, bottom], axis=0)
        out = deblock_plane(ext, qp=qp, block=block)
        return out[halo:halo + shard.shape[0]].astype(shard.dtype)

    spec = P(axis, None)
    fn = jax.jit(jax.shard_map(local, mesh=mesh, in_specs=spec,
                               out_specs=spec))
    return fn(plane)
