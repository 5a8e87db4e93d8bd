"""Motion compensation kernels (analogs of h264qpel/h264chroma/hpeldsp).

TPU-first design: instead of per-macroblock scalar loops, MC is expressed
over the whole frame at once —
  * fractional interpolation as separable convolutions over the padded
    reference plane (XLA fuses the 2 passes; taps match H.264's 6-tap
    [1,-5,20,20,-5,1] quarter-pel and bilinear chroma),
  * per-block integer displacement as one gather from the interpolated
    planes, batched over (frames, blocks).
The DPB stays resident in HBM as a (nref, H, W) stack.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

H264_QPEL_TAPS = np.array([1, -5, 20, 20, -5, 1], np.float32) / 32.0


def _conv1d(x, taps, axis):
    """Same-size 1-D convolution along axis with edge replication."""
    k = len(taps)
    pad = [(0, 0)] * x.ndim
    lo = (k - 1) // 2
    hi = k - 1 - lo
    pad[axis] = (lo, hi)
    xe = jnp.pad(x, pad, mode="edge")
    out = jnp.zeros_like(x, dtype=jnp.float32)
    for i, t in enumerate(taps):
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(i, i + x.shape[axis])
        out = out + float(t) * xe[tuple(sl)].astype(jnp.float32)
    return out


def halfpel_planes(plane):
    """(…, H, W) integer plane → (4, …, H, W): [full, half-h, half-v,
    half-hv] interpolated planes (H.264 6-tap)."""
    f = plane.astype(jnp.float32)
    h = _conv1d(f, H264_QPEL_TAPS, axis=-1)
    v = _conv1d(f, H264_QPEL_TAPS, axis=-2)
    hv = _conv1d(h, H264_QPEL_TAPS, axis=-2)
    return jnp.stack([f, h, v, hv])


def qpel_phase_planes(ref_plane):
    """(H, W) → (16, H, W): the 16 quarter-pel phase planes. Phase
    q = fy*4+fx is the average of the two nearest half positions
    (H.264 semantics). Built once per reference frame; MC then only
    gathers."""
    hp = halfpel_planes(ref_plane)              # (4, H, W)
    phs = []
    for qy in range(4):
        for qx in range(4):
            a = 2 * ((qy + 0) >> 1) + ((qx + 0) >> 1)
            b = 2 * ((qy + 1) >> 1) + ((qx + 1) >> 1)
            phs.append((hp[a] + hp[b]) * 0.5)
    return jnp.stack(phs)


def mc_blocks(ref_plane, mvs, block: int = 16):
    """Whole-frame quarter-pel MC (exact for ANY mv magnitude:
    per-coordinate edge clamp).

    ref_plane: (H, W) reference samples.
    mvs: (by, bx, 2) motion vectors in quarter-pel units (dy, dx).
    Returns (by*block, bx*block) predicted frame.

    r5: one linear gather from the 16 precomputed phase planes
    (previously two gathers from the 4 halfpel planes + an average).
    """
    ph16 = qpel_phase_planes(ref_plane).reshape(-1)
    h, w = ref_plane.shape[-2:]
    by, bx = mvs.shape[0], mvs.shape[1]
    iy = mvs[..., 0] >> 2
    ix = mvs[..., 1] >> 2
    pidx = (mvs[..., 0] & 3) * 4 + (mvs[..., 1] & 3)
    y0 = jnp.arange(by)[:, None] * block + iy          # (by, bx)
    x0 = jnp.arange(bx)[None, :] * block + ix
    oy = jnp.arange(block)
    ox = jnp.arange(block)
    yy = jnp.clip(y0[..., None, None] + oy[None, None, :, None], 0, h - 1)
    xx = jnp.clip(x0[..., None, None] + ox[None, None, None, :], 0, w - 1)
    lin = pidx[..., None, None] * (h * w) + yy * w + xx
    pred = ph16[lin]
    return pred.transpose(0, 2, 1, 3).reshape(by * block, bx * block)


def mc_blocks_bounded(ref_plane, mvs, block: int = 16,
                      max_disp: int = 24):
    """Quarter-pel MC for BOUNDED displacements (|integer part of mv|
    <= max_disp px — the encode-loop case, where mvs come from our own
    motion search with a known range).

    The 16 phase planes are edge-padded by max_disp+block, so each
    block is ONE vmapped dynamic_slice (a slice-gather: ~3x faster on
    TPU than the element gather of mc_blocks, which this matches
    exactly within the bound)."""
    P = max_disp + block
    padded = jnp.pad(ref_plane, P, mode="edge")
    ph16 = qpel_phase_planes(padded)
    h, w = ref_plane.shape[-2:]
    by, bx = mvs.shape[0], mvs.shape[1]
    iy = jnp.clip(mvs[..., 0] >> 2, -max_disp, max_disp)
    ix = jnp.clip(mvs[..., 1] >> 2, -max_disp, max_disp)
    pidx = ((mvs[..., 0] & 3) * 4 + (mvs[..., 1] & 3)).reshape(-1)
    y0 = (jnp.arange(by)[:, None] * block + iy).reshape(-1) + P
    x0 = (jnp.arange(bx)[None, :] * block + ix).reshape(-1) + P

    def slice_one(p, y, x):
        return jax.lax.dynamic_slice(ph16, (p, y, x),
                                     (1, block, block))[0]

    blocks = jax.vmap(slice_one)(pidx, y0, x0)
    out = blocks.reshape(by, bx, block, block).transpose(0, 2, 1, 3)
    return out.reshape(by * block, bx * block)


def mc_bilinear(ref_plane, mvs, block: int = 8, frac_bits: int = 3):
    """Chroma-style bilinear MC (h264chroma analog): mvs in 1/2^frac_bits
    pel units."""
    h, w = ref_plane.shape[-2:]
    by, bx = mvs.shape[0], mvs.shape[1]
    scale = 1 << frac_bits
    iy = mvs[..., 0] >> frac_bits
    ix = mvs[..., 1] >> frac_bits
    fy = (mvs[..., 0] & (scale - 1)).astype(jnp.float32) / scale
    fx = (mvs[..., 1] & (scale - 1)).astype(jnp.float32) / scale

    y0 = jnp.arange(by)[:, None] * block + iy
    x0 = jnp.arange(bx)[None, :] * block + ix
    oy = jnp.arange(block)
    ox = jnp.arange(block)

    def gather(dy, dx):
        yy = jnp.clip(y0[..., None, None] + oy[None, None, :, None] + dy, 0, h - 1)
        xx = jnp.clip(x0[..., None, None] + ox[None, None, None, :] + dx, 0, w - 1)
        return ref_plane[yy, xx].astype(jnp.float32)

    p00 = gather(0, 0)
    p01 = gather(0, 1)
    p10 = gather(1, 0)
    p11 = gather(1, 1)
    fy_ = fy[..., None, None]
    fx_ = fx[..., None, None]
    pred = ((1 - fy_) * (1 - fx_) * p00 + (1 - fy_) * fx_ * p01 +
            fy_ * (1 - fx_) * p10 + fy_ * fx_ * p11)
    return pred.transpose(0, 2, 1, 3).reshape(by * block, bx * block)
