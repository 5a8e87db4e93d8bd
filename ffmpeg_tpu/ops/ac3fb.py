"""AC-3 synthesis filterbank (ATSC A/52 §7.9): 512/256-point TDAC
inverse MDCT + KBD window overlap-add (reference: libavcodec/ac3dec.c
do_imdct + libavutil/tx_template.c mdct_naive_inv + kbd window init).

TPU mapping: the IMDCT is a (blocks·channels, 256) × (256, 256) matmul
on the MXU; windowing/overlap-add are fused elementwise ops. The
half-transform convention matches the reference exactly so the float
outputs agree to rounding:
    out[i]      = Σ_k X[k] cos((2k+1)·π(2N - 2i - 1)/(4N))        i<N/2
    out[i+N/2]  = -Σ_k X[k] cos((2k+1)·π(3N·2 + 2i + 1)/(4N·2))?  (see
matrix builder below for the exact phases with N = number of coeffs)."""

from __future__ import annotations

import functools

import numpy as np


def kbd_window(n: int = 256, alpha: float = 5.0) -> np.ndarray:
    """Kaiser-Bessel-derived window (A/52 Table 7.33 construction)."""
    alpha2 = (alpha * np.pi / n) ** 2
    local = np.zeros(n)
    acc = 0.0
    for i in range(n):
        tmp = i * (n - i) * alpha2
        bessel = 1.0
        for j in range(25, 0, -1):          # I0 series
            bessel = bessel * tmp / (j * j) + 1.0
        acc += bessel
        local[i] = acc
    return np.sqrt(local / (acc + 1.0)).astype(np.float32)


@functools.lru_cache(maxsize=None)
def _imdct_matrix(n_coeffs: int) -> np.ndarray:
    """(n_coeffs, 2*n_coeffs... ) half-IMDCT matrix M with out = X @ M,
    out length = n_coeffs (the reference's tx 'imdct half')."""
    n = n_coeffs            # input coefficients
    half = n // 2
    phase = np.pi / (4.0 * n)
    k = np.arange(n, dtype=np.float64)      # coeff index
    i = np.arange(half, dtype=np.float64)   # output index within halves
    # first half: cos((2k+1) * phase*(4*half - 2i - 1))
    a_d = np.cos(np.outer(2 * k + 1, phase * (4 * half - 2 * i - 1)))
    # second half: -cos((2k+1) * phase*(3*n*2? ...)) per tx_template:
    # i_u = phase * (3*len2 + 2*i + 1) with len2 = n
    a_u = -np.cos(np.outer(2 * k + 1, phase * (3 * n + 2 * i + 1)))
    return np.concatenate([a_d, a_u], axis=1).astype(np.float32)


def imdct_half(coeffs: np.ndarray) -> np.ndarray:
    """Batched half-IMDCT: (..., n) coeffs → (..., n) time samples."""
    import jax
    import jax.numpy as jnp
    m = jnp.asarray(_imdct_matrix(coeffs.shape[-1]))
    return np.asarray(jnp.matmul(
        jnp.asarray(coeffs, jnp.float32), m,
        precision=jax.lax.Precision.HIGHEST))


_WINDOW = None


def window() -> np.ndarray:
    global _WINDOW
    if _WINDOW is None:
        _WINDOW = kbd_window()
    return _WINDOW


def overlap_window(delay: np.ndarray, first_half: np.ndarray) -> np.ndarray:
    """vector_fmul_window analog (len=128): 256 output samples from the
    128-sample saved delay and the half-transform's first 128 samples."""
    w = window()
    k = np.arange(128)
    out = np.empty(256, np.float32)
    tmp_rev = first_half[127 - k]
    out[:128] = delay * w[255 - k] - tmp_rev * w[k]
    out[255 - k] = delay * w[k] + tmp_rev * w[255 - k]
    return out
