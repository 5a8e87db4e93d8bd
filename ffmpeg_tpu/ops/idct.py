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
                      preferred_element_type=jnp.float32)


def fdct8x8(blocks):
    """(..., 8, 8) samples → DCT coeffs: A F A^T."""
    a = jnp.asarray(_dct8_matrix(), jnp.float32)
    return jnp.einsum("ux,...xy,vy->...uv", a, blocks, a,
                      preferred_element_type=jnp.float32)


@partial(jax.jit, static_argnames=("out_h", "out_w", "bit_depth"))
def jpeg_block_transform(coeffs_zz, qtab, out_h: int, out_w: int,
                         bit_depth: int = 8):
    """Fused JPEG plane reconstruction.

    coeffs_zz: (rows, cols, 64) int16, zigzag order, as produced by the
               host entropy stage.
    qtab:      (64,) quantizer, zigzag order.
    Returns (out_h, out_w) uint8/uint16 plane (cropped from 8x8 tiles).
    """
    rows, cols, _ = coeffs_zz.shape
    deq = coeffs_zz.astype(jnp.float32) * qtab.astype(jnp.float32)
    # dezigzag: scatter each of the 64 zigzag entries to its raster slot
    blocks = jnp.take(deq, jnp.asarray(UNZIGZAG), axis=-1).reshape(rows, cols, 8, 8)
    pix = idct8x8(blocks)
    level = 1 << (bit_depth - 1)
    maxv = (1 << bit_depth) - 1
    pix = jnp.clip(jnp.round(pix + level), 0, maxv)
    # (rows, cols, 8, 8) → (rows*8, cols*8)
    plane = pix.transpose(0, 2, 1, 3).reshape(rows * 8, cols * 8)
    dtype = jnp.uint8 if bit_depth <= 8 else jnp.uint16
    return plane[:out_h, :out_w].astype(dtype)


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
