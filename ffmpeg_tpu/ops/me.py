"""Motion estimation metrics & search (analog of me_cmp.c SAD/SATD and the
EPZS search driver in motion_est.c — BASELINE 'encode hot loop' config).

TPU-first formulation: full-search SAD over a ±R window computed for ALL
blocks of a frame at once as a (2R+1)² cost volume — each candidate offset
is one vectorized subtract/abs/reduce over the block grid, unrolled at
trace time so XLA pipelines the whole volume. SATD uses the 8x8 Hadamard
as a matmul (MXU) per candidate.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=4)
def _hadamard(n: int) -> np.ndarray:
    h = np.array([[1.0]])
    while h.shape[0] < n:
        h = np.block([[h, h], [h, -h]])
    return h


def _blockify(plane, block):
    """(H, W) → (by, bx, B, B)."""
    h, w = plane.shape[-2:]
    by, bx = h // block, w // block
    return plane[:by * block, :bx * block].reshape(by, block, bx, block) \
        .transpose(0, 2, 1, 3)


def sad_cost_volume(cur, ref, block: int = 16, search: int = 8):
    """Full-search SAD.

    cur, ref: (H, W) planes (same shape).
    Returns (by, bx, 2*search+1, 2*search+1) float32 cost volume: entry
    [b, (dy+R), (dx+R)] = SAD of block b vs ref displaced by (dy, dx).
    """
    h, w = cur.shape[-2:]
    curb = _blockify(cur.astype(jnp.float32), block)       # (by,bx,B,B)
    refp = jnp.pad(ref.astype(jnp.float32),
                   ((search, search), (search, search)), mode="edge")
    costs = []
    for dy in range(-search, search + 1):
        row = []
        for dx in range(-search, search + 1):
            shifted = jax.lax.dynamic_slice(
                refp, (dy + search, dx + search), (h, w))
            refb = _blockify(shifted, block)
            row.append(jnp.sum(jnp.abs(curb - refb), axis=(-1, -2)))
        costs.append(jnp.stack(row, axis=-1))
    return jnp.stack(costs, axis=-2)


def best_mvs(cost_volume, search: int):
    """argmin over the cost volume → integer MVs (by, bx, 2) (dy, dx)."""
    by, bx, sh, sw = cost_volume.shape
    flat = cost_volume.reshape(by, bx, sh * sw)
    idx = jnp.argmin(flat, axis=-1)
    dy = idx // sw - search
    dx = idx % sw - search
    return jnp.stack([dy, dx], axis=-1)


def satd_blocks(a, b, block: int = 8):
    """Sum of absolute Hadamard-transformed differences per block.
    a, b: (H, W). Returns (by, bx) float32."""
    d = _blockify(a.astype(jnp.float32) - b.astype(jnp.float32), block)
    hmat = jnp.asarray(_hadamard(block), jnp.float32)
    t = jnp.einsum("ij,...jk,kl->...il", hmat, d, hmat,
                   preferred_element_type=jnp.float32)
    return jnp.sum(jnp.abs(t), axis=(-1, -2)) / block


@partial(jax.jit, static_argnames=("block", "search"))
def motion_search(cur, ref, block: int = 16, search: int = 8):
    """One fused program: SAD cost volume → best integer MVs + costs."""
    vol = sad_cost_volume(cur, ref, block, search)
    mvs = best_mvs(vol, search)
    best = jnp.min(vol.reshape(*vol.shape[:2], -1), axis=-1)
    return mvs, best
