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


def mc_blocks(ref_plane, mvs, block: int = 16):
    """Whole-frame quarter-pel MC.

    ref_plane: (H, W) reference samples.
    mvs: (by, bx, 2) motion vectors in quarter-pel units (dy, dx).
    Returns (by*block, bx*block) predicted frame.

    Quarter positions are the average of the two nearest half positions
    (H.264 semantics). The gather is one take per (sub-position) plane.
    """
    hp = halfpel_planes(ref_plane)             # (4, H, W)
    h, w = ref_plane.shape[-2:]
    by, bx = mvs.shape[0], mvs.shape[1]

    iy = mvs[..., 0] >> 2
    ix = mvs[..., 1] >> 2
    fy = mvs[..., 0] & 3
    fx = mvs[..., 1] & 3

    # block top-left coords
    y0 = jnp.arange(by)[:, None] * block + iy          # (by, bx)
    x0 = jnp.arange(bx)[None, :] * block + ix
    oy = jnp.arange(block)
    ox = jnp.arange(block)
    yy = jnp.clip(y0[..., None, None] + oy[None, None, :, None], 0, h - 1)
    xx = jnp.clip(x0[..., None, None] + ox[None, None, None, :], 0, w - 1)

    def sample(plane_idx_y, plane_idx_x):
        """Gather from the halfpel plane selected per-block."""
        pidx = plane_idx_x + 2 * plane_idx_y            # (by, bx)
        flat = hp.reshape(4, -1)
        lin = yy * w + xx                                # (by,bx,B,B)
        gathered = flat[pidx[..., None, None], lin]
        return gathered

    # halfpel components for quarter averaging:
    #   value = (P[a] + P[b] + 1)/2 in integer H.264; float here
    hx = fx >> 1
    hy = fy >> 1
    # nearest halfpel grid points left/right of the quarter position
    ax_ = (fx + 0) >> 1
    bx_ = (fx + 1) >> 1
    ay_ = (fy + 0) >> 1
    by_ = (fy + 1) >> 1
    pa = sample(ay_, ax_)
    pb = sample(by_, bx_)
    pred = (pa + pb) * 0.5
    out = pred.transpose(0, 2, 1, 3).reshape(by * block, bx * block)
    return out


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
