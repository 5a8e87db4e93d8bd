"""8x8 block transforms on TPU (analog of libavcodec idctdsp/fdctdsp +
simple_idct). Blocks are batched (..., 8, 8); the 2-D transform is two
8-wide matmuls, which XLA fuses with surrounding dequant/bias/clip math
into one kernel. The fused JPEG path (dequant → dezigzag → IDCT → level
shift → clamp → tile reassembly) is a single jitted program per plane
shape, the moral equivalent of mjpegdec's per-block loop run over every
block of a frame at once."""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

# zigzag scan order (same table as the reference's ff_zigzag_direct)
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63],
    np.int32)

UNZIGZAG = np.argsort(ZIGZAG).astype(np.int32)


@lru_cache(maxsize=1)
def _dct8_matrix() -> np.ndarray:
    """Orthonormal-style JPEG IDCT basis: A[u, x] = C(u)/2 cos((2x+1)uπ/16)."""
    u = np.arange(8)[:, None]
    x = np.arange(8)[None, :]
    a = 0.5 * np.cos((2 * x + 1) * u * np.pi / 16.0)
    a[0, :] *= 1.0 / np.sqrt(2.0)
    return a


def idct8x8(blocks):
    """(..., 8, 8) DCT coeffs → samples (float32): A^T F A."""
    a = jnp.asarray(_dct8_matrix(), jnp.float32)
    return jnp.einsum("ux,...uv,vy->...xy", a, blocks, a,
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)


def fdct8x8(blocks):
    """(..., 8, 8) samples → DCT coeffs: A F A^T."""
    a = jnp.asarray(_dct8_matrix(), jnp.float32)
    return jnp.einsum("ux,...xy,vy->...uv", a, blocks, a,
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)


@lru_cache(maxsize=32)
def _recon_matrix(s: int, ncoeff: int) -> np.ndarray:
    """(s*s, ncoeff) matrix mapping the first `ncoeff` zigzag DCT coeffs of
    an 8x8 block to an s×s pixel tile (s=8: exact IDCT; s<8: exact
    block-average downsample of the IDCT — DCT-domain scaled decode, the
    TPU-native generalization of the reference's `lowres` fast paths).
    The whole 2-D transform becomes ONE (blocks, ncoeff)@(ncoeff, s²)
    matmul, which is the MXU-native formulation."""
    a = _dct8_matrix()           # A[u, x]
    # pix[x*8+y, u*8+v] = A[u,x] * A[v,y]
    w_full = np.einsum("ux,vy->xyuv", a, a).reshape(64, 64)
    r = 8 // s
    g = np.zeros((s * s, 64))
    for bx in range(s):
        for by in range(s):
            for ix in range(r):
                for iy in range(r):
                    g[bx * s + by, (bx * r + ix) * 8 + (by * r + iy)] = 1.0 / (r * r)
    w_s = g @ w_full             # (s², 64) in raster coeff order
    w_zz = w_s[:, ZIGZAG]        # columns reordered to zigzag
    return np.ascontiguousarray(w_zz[:, :ncoeff]).astype(np.float32)


def jpeg_plane_reconstruct(coeffs_zz, qtab, out_h: int, out_w: int,
                           bit_depth: int = 8, scale: int = 1):
    """Traceable fused JPEG plane reconstruction, batched over leading dims.

    coeffs_zz: (..., rows, cols, L) int16, first L zigzag coefficients per
               block, as produced by the host entropy stage (L=64 full).
    qtab:      (64,) quantizer, zigzag order (first L entries used).
    scale:     1, 2, 4 or 8 — output is downscaled by `scale` (DCT-domain),
               out_h/out_w are in the DOWNSCALED grid.
    Returns (..., out_h, out_w) uint8/uint16 plane (cropped from s×s tiles).
    """
    *lead, rows, cols, ncoeff = coeffs_zz.shape
    s = 8 // scale
    w = jnp.asarray(_recon_matrix(s, ncoeff))            # (s², L)
    q = qtab.astype(jnp.float32)[:ncoeff]
    wq = w * q[None, :]                                   # fold dequant
    flat = coeffs_zz.reshape(*lead, rows * cols, ncoeff).astype(jnp.float32)
    pix = jnp.matmul(flat, wq.T, preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
    level = 1 << (bit_depth - 1)
    maxv = (1 << bit_depth) - 1
    pix = jnp.clip(pix + (level + 0.5), 0, maxv)          # +0.5: round via floor-cast
    pix = pix.reshape(*lead, rows, cols, s, s)
    nd = pix.ndim
    perm = tuple(range(nd - 4)) + (nd - 4, nd - 2, nd - 3, nd - 1)
    plane = pix.transpose(perm).reshape(*lead, rows * s, cols * s)
    dtype = jnp.uint8 if bit_depth <= 8 else jnp.uint16
    return plane[..., :out_h, :out_w].astype(dtype)


@partial(jax.jit, static_argnames=("out_h", "out_w", "bit_depth"))
def jpeg_block_transform(coeffs_zz, qtab, out_h: int, out_w: int,
                         bit_depth: int = 8):
    """Jitted wrapper around jpeg_plane_reconstruct (per-plane decode path)."""
    return jpeg_plane_reconstruct(coeffs_zz, qtab, out_h, out_w, bit_depth)


@partial(jax.jit, static_argnames=("rows", "cols"))
def jpeg_forward_transform(plane, qtab, rows: int, cols: int):
    """Fused JPEG plane analysis for the encoder: tile → level shift →
    FDCT → quantize → zigzag. plane: (rows*8, cols*8) float32/uint8.
    Returns (rows, cols, 64) int32 zigzag quantized coefficients."""
    x = plane.astype(jnp.float32) - 128.0
    blocks = x.reshape(rows, 8, cols, 8).transpose(0, 2, 1, 3)
    coeffs = fdct8x8(blocks).reshape(rows, cols, 64)
    zz = jnp.take(coeffs, jnp.asarray(ZIGZAG), axis=-1)
    q = jnp.round(zz / qtab.astype(jnp.float32))
    return q.astype(jnp.int32)
