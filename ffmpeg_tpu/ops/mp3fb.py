"""MP3 hybrid filterbank on TPU (reference: libavcodec/mpegaudiodec_template.c
compute_imdct + mpegaudiodsp dct32/apply_window).

TPU-first formulation: the 36/12-point IMDCTs and the 32-band polyphase
synthesis matrixing are small dense matmuls, batched over (granule,
channel, subband) and over time slots respectively, so one jitted call
reconstructs a whole frame; overlap/FIFO state is threaded functionally.
The reference runs these as per-band scalar/SIMD loops."""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from ..codecs.mp3_tables import ENWINDOW

SBLIMIT = 32


# ---------------------------------------------------------------------------
# constant matrices

@lru_cache()
def _imdct36_matrix() -> np.ndarray:
    # x[n] = sum_k X[k] cos(pi/72 (2n+1+18)(2k+1)), 18 coeffs -> 36 samples
    n = np.arange(36)[:, None]
    k = np.arange(18)[None, :]
    return np.cos(np.pi / 72 * (2 * n + 1 + 18) * (2 * k + 1)).astype(np.float32)


@lru_cache()
def _imdct12_matrix() -> np.ndarray:
    n = np.arange(12)[:, None]
    k = np.arange(6)[None, :]
    return np.cos(np.pi / 24 * (2 * n + 1 + 6) * (2 * k + 1)).astype(np.float32)


@lru_cache()
def _windows() -> np.ndarray:
    """IMDCT windows for block types 0..3 (type 2 = short handled apart)."""
    w = np.zeros((4, 36), np.float32)
    n = np.arange(36)
    w[0] = np.sin(np.pi / 36 * (n + 0.5))
    w[1][:18] = np.sin(np.pi / 36 * (n[:18] + 0.5))
    w[1][18:24] = 1.0
    w[1][24:30] = np.sin(np.pi / 12 * (n[24:30] - 24 + 0.5))
    w[1][30:] = 0.0
    w[3][:6] = 0.0
    w[3][6:12] = np.sin(np.pi / 12 * (n[6:12] - 6 + 0.5))
    w[3][12:18] = 1.0
    w[3][18:] = np.sin(np.pi / 36 * (n[18:] + 0.5))
    w[2] = 0.0   # unused (short)
    return w


@lru_cache()
def _short_window() -> np.ndarray:
    return np.sin(np.pi / 12 * (np.arange(12) + 0.5)).astype(np.float32)


@lru_cache()
def _synth_matrix() -> np.ndarray:
    # ISO 11172-3 matrixing: V[i] = sum_k cos((16+i)(2k+1) pi/64) S[k]
    i = np.arange(64)[:, None]
    k = np.arange(32)[None, :]
    return np.cos((16 + i) * (2 * k + 1) * np.pi / 64).astype(np.float32)


@lru_cache()
def _synth_window() -> np.ndarray:
    """Full 512-tap ISO D window reconstructed from the half table
    (mpegaudiodsp_template.c mpa_synth_init sign rule)."""
    # 2^-16: 2^-15 table scale x the 1/2 folded into the ISO matrixing
    # (calibrated exactly against the reference decoder's output level)
    half = np.asarray(ENWINDOW, np.float64) / (1 << 16)
    d = np.zeros(512, np.float64)
    d[:257] = half
    for i in range(1, 256):
        v = half[i]
        d[512 - i] = v if (i & 63) == 0 else -v
    return d.astype(np.float32)


def _freq_inversion() -> np.ndarray:
    """Odd time samples of odd subbands are sign-flipped."""
    inv = np.ones((SBLIMIT, 18), np.float32)
    inv[1::2, 1::2] = -1.0
    return inv


# ---------------------------------------------------------------------------

@jax.jit
def imdct_granule(xr, block_types, overlap):
    """Hybrid synthesis for one granule.

    xr:          (ch, 32, 18) dequantized spectra (band-major)
    block_types: (ch, 32) int32 effective block type per subband
                 (mixed blocks already resolved by the host)
    overlap:     (ch, 32, 18) carry from the previous granule
    → (sb_samples (ch, 18, 32), new overlap)
    """
    m36 = jnp.asarray(_imdct36_matrix())
    m12 = jnp.asarray(_imdct12_matrix())
    wins = jnp.asarray(_windows())
    ws = jnp.asarray(_short_window())

    # long transform for every band under each of the 3 long window types
    long_out = jnp.einsum("nk,csk->csn", m36, xr)          # (ch, 32, 36)
    w = wins[jnp.clip(block_types, 0, 3)]                  # (ch, 32, 36)
    long_out = long_out * w

    # short: 3 x 12-point IMDCTs on interleaved coeffs X[w + 3k]
    xs = xr.reshape(*xr.shape[:-1], 6, 3)                  # (ch,32,6,3) k,w
    xs = jnp.swapaxes(xs, -1, -2)                          # (ch,32,3,6)
    short = jnp.einsum("nk,cswk->cswn", m12, xs) * ws      # (ch,32,3,12)
    # layout: window w occupies samples 6 + 6w .. 6 + 6w + 11, summed
    short_full = jnp.zeros(long_out.shape, long_out.dtype)
    for wnd in range(3):
        short_full = short_full.at[..., 6 + 6 * wnd:18 + 6 * wnd].add(
            short[:, :, wnd])
    out36 = jnp.where((block_types == 2)[..., None], short_full, long_out)

    sb = out36[..., :18] + overlap                         # (ch, 32, 18)
    new_overlap = out36[..., 18:]
    sb = sb * jnp.asarray(_freq_inversion())
    return jnp.swapaxes(sb, 1, 2), new_overlap             # (ch, 18, 32)


@jax.jit
def synth_granule(sb_samples, fifo):
    """Polyphase synthesis for 18 time slots (one granule).

    sb_samples: (ch, 18, 32); fifo: (ch, 16, 64) newest-first V history.
    → (pcm (ch, 18*32), new fifo)
    """
    n = jnp.asarray(_synth_matrix())
    d = jnp.asarray(_synth_window()).reshape(16, 32)

    def slot(fifo, s):
        v = jnp.einsum("ik,ck->ci", n, s)                  # (ch, 64)
        fifo = jnp.concatenate([v[:, None], fifo[:, :15]], axis=1)
        # U: (ch, 16, 32) — even half-slots take V[0:32], odd take V[96:128]
        # of the 128-stride view; with a (16,64) fifo that is:
        u_even = fifo[:, 0::2, :32]
        u_odd = fifo[:, 1::2, 32:]
        u = jnp.stack([u_even, u_odd], axis=2).reshape(v.shape[0], 16, 32)
        out = jnp.sum(u * d, axis=1)                       # (ch, 32)
        return fifo, out

    fifo, pcm = jax.lax.scan(slot, fifo, jnp.swapaxes(sb_samples, 0, 1))
    return jnp.swapaxes(pcm, 0, 1).reshape(sb_samples.shape[0], -1), fifo
