"""Transform engine — FFT / MDCT / DCT / RDFT (analog of libavutil/tx.{c,h}).

The reference's av_tx selects "codelets" per size/arch (tx.c:340-352). The
TPU analog has two codelet classes, both built from real matmuls so they
run on the MXU (the TPU backend implements neither complex arithmetic nor
a native FFT, so everything is expressed in real float32):

  * direct DFT/DCT/MDCT matmul codelets for N <= MATMUL_MAX — exact and
    MXU-native; covers every codec size (AAC 1024/128, AC-3 256, MP3
    576/192, Opus 960...)
  * 4-step (Bailey) decomposition for large FFTs: N = A*B is computed as
    DFT_A → twiddle → DFT_B with batched matmuls + one transpose.

Complex data is interleaved float pairs (..., 2) = (re, im) — the same
wire format as the reference's AVComplexFloat (tx.h). All functions are
traceable (usable inside jit) and batched over leading axes. `scale`
multiplies the output like av_tx's scale argument.

MDCT convention matches tx.h:39-111: forward takes 2N samples → N coeffs;
inverse takes N → 2N time samples for windowed overlap-add.
"""

from __future__ import annotations

import math
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

MATMUL_MAX = 4096
DFT_DIRECT_MAX = 1024


# ---------------------------------------------------------------------------
# matrix builders (float64 on host, cast to float32 constants)
# ---------------------------------------------------------------------------

@lru_cache(maxsize=64)
def _mdct_matrix(n: int) -> np.ndarray:
    """(N, 2N): X[k] = sum_n x[n] cos(π/2N (2n+1+N)(2k+1)/2)."""
    k = np.arange(n)[:, None]
    j = np.arange(2 * n)[None, :]
    return np.cos(np.pi / (2 * n) * (2 * j + 1 + n) * (2 * k + 1) / 2.0)


@lru_cache(maxsize=64)
def _dct2_matrix(n: int) -> np.ndarray:
    k = np.arange(n)[:, None]
    j = np.arange(n)[None, :]
    return 2.0 * np.cos(np.pi * k * (2 * j + 1) / (2 * n))


@lru_cache(maxsize=64)
def _dct3_matrix(n: int) -> np.ndarray:
    k = np.arange(n)[:, None]
    j = np.arange(n)[None, :]
    m = 2.0 * np.cos(np.pi * j * (2 * k + 1) / (2 * n))
    m[:, 0] = 1.0
    return m


@lru_cache(maxsize=64)
def _dct4_matrix(n: int) -> np.ndarray:
    k = np.arange(n)[:, None]
    j = np.arange(n)[None, :]
    return 2.0 * np.cos(np.pi * (2 * j + 1) * (2 * k + 1) / (4 * n))


@lru_cache(maxsize=64)
def _dct1_matrix(n: int) -> np.ndarray:
    k = np.arange(n)[:, None]
    j = np.arange(n)[None, :]
    m = 2.0 * np.cos(np.pi * k * j / (n - 1))
    m[:, 0] *= 0.5
    m[:, -1] *= 0.5
    return m


@lru_cache(maxsize=64)
def _dst1_matrix(n: int) -> np.ndarray:
    k = np.arange(1, n + 1)[:, None]
    j = np.arange(1, n + 1)[None, :]
    return 2.0 * np.sin(np.pi * k * j / (n + 1))


@lru_cache(maxsize=64)
def _dft_matrices(n: int, inverse: bool):
    """(Wr, Wi) real/imag parts of the DFT matrix."""
    k = np.arange(n)[:, None]
    j = np.arange(n)[None, :]
    sign = 2.0 if inverse else -2.0
    ang = sign * np.pi * k * j / n
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


@lru_cache(maxsize=64)
def _rdft_matrices(n: int):
    """Real-input DFT: (n//2+1, n) cos and sin matrices."""
    k = np.arange(n // 2 + 1)[:, None]
    j = np.arange(n)[None, :]
    ang = -2.0 * np.pi * k * j / n
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def _matmul_codelet(mat: np.ndarray, scale: float):
    # pre-transpose on the host and jit: the codelet is often called
    # eagerly per audio frame, where un-jitted dispatch (transpose +
    # matmul as two eager ops) costs ~20 ms/call over a tunneled link
    m_t = jnp.asarray((mat * scale).T.copy(), jnp.float32)

    @jax.jit
    def fn(x):
        return jnp.matmul(x, m_t, preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)
    return fn


# ---------------------------------------------------------------------------
# complex helpers on interleaved (..., 2) float pairs
# ---------------------------------------------------------------------------

def _split(x):
    return x[..., 0], x[..., 1]


def _join(re, im):
    return jnp.stack([re, im], axis=-1)


def _cmatmul(wr, wi, xr, xi):
    """(W @ x) for complex W (given as real parts) and complex x, contracting
    x's last axis: x (..., n), W (m, n) → (..., m)."""
    yr = jnp.matmul(xr, wr.T, preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST) - \
        jnp.matmul(xi, wi.T, preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
    yi = jnp.matmul(xr, wi.T, preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST) + \
        jnp.matmul(xi, wr.T, preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
    return yr, yi


def _factor(n: int):
    a = 1 << int(math.floor(math.log2(math.sqrt(n))))
    while n % a:
        a >>= 1
    return a, n // a


def _fft_pairs(n: int, inverse: bool):
    """fn on (..., n, 2): DFT via direct matmul or 4-step decomposition."""
    if n <= DFT_DIRECT_MAX:
        wr, wi = _dft_matrices(n, inverse)
        wr_j, wi_j = jnp.asarray(wr), jnp.asarray(wi)

        def direct(x):
            xr, xi = _split(x)
            yr, yi = _cmatmul(wr_j, wi_j, xr, xi)
            return _join(yr, yi)
        return direct

    a, b = _factor(n)
    if a == 1:
        raise NotImplementedError(f"fft size {n} has no power-of-2 factor")
    wra, wia = map(jnp.asarray, _dft_matrices(a, inverse))
    wrb, wib = map(jnp.asarray, _dft_matrices(b, inverse))
    ka = np.arange(a)[:, None]
    kb = np.arange(b)[None, :]
    sign = 2.0 if inverse else -2.0
    tw = sign * np.pi * ka * kb / n
    twr = jnp.asarray(np.cos(tw).astype(np.float32))
    twi = jnp.asarray(np.sin(tw).astype(np.float32))

    def four_step(x):
        xr, xi = _split(x)
        lead = xr.shape[:-1]
        xr = xr.reshape(lead + (a, b))
        xi = xi.reshape(lead + (a, b))
        # DFT over the a axis: treat b as batch → move a last
        xr_t = jnp.swapaxes(xr, -1, -2)  # (..., b, a)
        xi_t = jnp.swapaxes(xi, -1, -2)
        yr, yi = _cmatmul(wra, wia, xr_t, xi_t)        # (..., b, a)
        yr = jnp.swapaxes(yr, -1, -2)                   # (..., a, b)
        yi = jnp.swapaxes(yi, -1, -2)
        # twiddle
        tr = yr * twr - yi * twi
        ti = yr * twi + yi * twr
        # DFT over the b axis
        zr, zi = _cmatmul(wrb, wib, tr, ti)             # (..., a, b)
        # output index k = k_b * a + k_a → transpose (a,b) → (b,a) then flatten
        zr = jnp.swapaxes(zr, -1, -2).reshape(lead + (n,))
        zi = jnp.swapaxes(zi, -1, -2).reshape(lead + (n,))
        return _join(zr, zi)
    return four_step


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------

@lru_cache(maxsize=256)
def tx_init(kind: str, n: int, inverse: bool = False, scale: float = 1.0):
    """Cached, jitted transform: fn(x)->y operating on the last axes.

    Audio codecs call this eagerly once per frame per channel; without
    the jit wrapper each call pays multiple eager dispatches (~20 ms
    over a tunneled device link), and without the cache each call
    would retrace."""
    import jax as _jax
    return _jax.jit(_tx_init(kind, n, inverse, scale))


def _tx_init(kind: str, n: int, inverse: bool = False, scale: float = 1.0):
    """Return a traceable fn(x)->y operating on the last axes.

    kinds:
      "fft":  (..., n, 2) → (..., n, 2)       interleaved complex
      "rdft": fwd real (..., n) → (..., n//2+1, 2); inv the reverse
      "mdct": fwd (..., 2n) → (..., n); inv (..., n) → (..., 2n)
      "dct1"/"dct2"/"dct3"/"dct4"/"dst1": real (..., n) → (..., n)
    """
    if kind == "fft":
        f = _fft_pairs(n, inverse)
        if scale == 1.0:
            return f
        return lambda x: f(x) * scale
    if kind == "rdft":
        cr, ci = _rdft_matrices(n)
        if not inverse:
            crj, cij = jnp.asarray(cr * scale), jnp.asarray(ci * scale)

            def fwd(x):
                yr = jnp.matmul(x, crj.T, preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
                yi = jnp.matmul(x, cij.T, preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
                return _join(yr, yi)
            return fwd
        # inverse: x[j] = 1/n * sum_k (weighted) — build (n, n//2+1) matrices
        # with hermitian symmetry folded in: weight 1 for k=0 and k=n/2, 2 else
        w = np.full(n // 2 + 1, 2.0)
        w[0] = 1.0
        if n % 2 == 0:
            w[-1] = 1.0
        ir = (cr.T * w) / n * scale          # (n, n//2+1)
        ii = (-ci.T * w) / n * scale
        irj, iij = jnp.asarray(ir.astype(np.float32)), jnp.asarray(ii.astype(np.float32))

        def inv(x):
            xr, xi = _split(x)
            return (jnp.matmul(xr, irj.T, preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
                    - jnp.matmul(xi, iij.T, preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST))
        return inv
    if kind == "mdct":
        if n > MATMUL_MAX:
            raise NotImplementedError(f"mdct size {n} > {MATMUL_MAX}")
        mat = _mdct_matrix(n).T if inverse else _mdct_matrix(n)
        return _matmul_codelet(mat, scale)
    if kind == "dct2":
        return _matmul_codelet(_dct2_matrix(n), scale)
    if kind == "dct3":
        return _matmul_codelet(_dct3_matrix(n), scale)
    if kind == "dct4":
        return _matmul_codelet(_dct4_matrix(n), scale)
    if kind == "dct1":
        return _matmul_codelet(_dct1_matrix(n), scale)
    if kind == "dst1":
        return _matmul_codelet(_dst1_matrix(n), scale)
    raise ValueError(f"unknown transform {kind!r}")


def fft(x, inverse: bool = False, scale: float = 1.0):
    return tx_init("fft", int(x.shape[-2]), inverse, scale)(x)


def rdft(x, n: int, inverse: bool = False, scale: float = 1.0):
    return tx_init("rdft", n, inverse, scale)(x)


def mdct(x, n: int, scale: float = 1.0):
    return tx_init("mdct", n, False, scale)(x)


def imdct(x, n: int, scale: float = 1.0):
    """N coeffs → 2N time samples (caller overlap-adds windowed halves)."""
    return tx_init("mdct", n, True, scale)(x)


# ---------------------------------------------------------------------------
# windows (used by MDCT codecs; aacdec, ac3, opus)
# ---------------------------------------------------------------------------

@lru_cache(maxsize=32)
def sine_window(n: int) -> np.ndarray:
    return np.sin(np.pi / n * (np.arange(n) + 0.5))


@lru_cache(maxsize=32)
def kbd_window(n: int, alpha: float = 4.0) -> np.ndarray:
    """Kaiser-Bessel derived window of length n (AAC/AC-3): symmetric,
    satisfies the Princen-Bradley condition w[i]^2 + w[i+n/2]^2 = 1."""
    from numpy import i0
    h = n // 2
    # Kaiser kernel on h+1 points
    x = 2.0 * np.arange(h + 1) / h - 1.0
    k = i0(np.pi * alpha * np.sqrt(np.maximum(0.0, 1.0 - x * x)))
    c = np.cumsum(k)
    first = np.sqrt(c[:h] / c[h])
    return np.concatenate([first, first[::-1]])
