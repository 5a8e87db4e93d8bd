"""Transform engine tests: DFT vs numpy, DCT identities, MDCT TDAC
perfect reconstruction. Complex data is interleaved (..., 2) float pairs
(AVComplexFloat wire format)."""

import numpy as np
import pytest

from ffmpeg_tpu.ops import tx


def _to_pairs(z):
    return np.stack([z.real, z.imag], axis=-1).astype(np.float32)


def _to_complex(p):
    p = np.asarray(p)
    return p[..., 0] + 1j * p[..., 1]


@pytest.mark.parametrize("n", [64, 256, 2048, 4096])
def test_fft_matches_numpy(n):
    rng = np.random.default_rng(0)
    z = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    y = _to_complex(tx.fft(_to_pairs(z)))
    ref = np.fft.fft(z)
    np.testing.assert_allclose(y, ref, atol=2e-2 * np.sqrt(n))


def test_fft_roundtrip():
    rng = np.random.default_rng(1)
    z = rng.standard_normal(256) + 1j * rng.standard_normal(256)
    f = tx.tx_init("fft", 256)
    fi = tx.tx_init("fft", 256, inverse=True, scale=1.0 / 256)
    back = _to_complex(fi(f(_to_pairs(z))))
    np.testing.assert_allclose(back, z, atol=1e-4)


def test_rdft_matches_numpy():
    rng = np.random.default_rng(2)
    x = rng.standard_normal(128).astype(np.float32)
    y = _to_complex(tx.rdft(x, 128))
    np.testing.assert_allclose(y, np.fft.rfft(x), atol=1e-3)


def test_rdft_roundtrip():
    rng = np.random.default_rng(3)
    x = rng.standard_normal(256).astype(np.float32)
    spec = tx.rdft(x, 256)
    back = np.asarray(tx.rdft(spec, 256, inverse=True))
    np.testing.assert_allclose(back, x, atol=1e-4)


@pytest.mark.parametrize("n", [8, 64, 480])
def test_dct2_dct3_inverse_pair(n):
    rng = np.random.default_rng(4)
    x = rng.standard_normal(n).astype(np.float32)
    d2 = tx.tx_init("dct2", n)
    d3 = tx.tx_init("dct3", n, scale=1.0 / (2 * n))
    np.testing.assert_allclose(np.asarray(d3(d2(x))), x, atol=1e-3)


def test_dct2_matches_direct():
    n = 32
    rng = np.random.default_rng(5)
    x = rng.standard_normal(n)
    d2 = tx.tx_init("dct2", n)
    direct = np.array([2 * sum(x[j] * np.cos(np.pi * k * (2 * j + 1) / (2 * n))
                               for j in range(n)) for k in range(n)])
    np.testing.assert_allclose(np.asarray(d2(x.astype(np.float32))), direct, atol=1e-3)


def test_dct4_self_inverse():
    n = 64
    rng = np.random.default_rng(6)
    x = rng.standard_normal(n).astype(np.float32)
    d4 = tx.tx_init("dct4", n)
    np.testing.assert_allclose(np.asarray(d4(d4(x))) / (2 * n), x, atol=1e-3)


@pytest.mark.parametrize("n", [128, 1024])
def test_mdct_tdac_perfect_reconstruction(n):
    """Windowed MDCT → IMDCT with 50% overlap-add reconstructs the signal."""
    rng = np.random.default_rng(7)
    nblocks = 6
    sig = rng.standard_normal(n * (nblocks + 1)).astype(np.float32)
    win = tx.sine_window(2 * n).astype(np.float32)
    recon = np.zeros_like(sig)
    for b in range(nblocks):
        seg = sig[b * n:(b + 2) * n] * win
        coeffs = np.asarray(tx.mdct(seg, n))
        out = np.asarray(tx.imdct(coeffs, n, scale=2.0 / n)) * win
        recon[b * n:(b + 2) * n] += out
    lo, hi = n, nblocks * n
    np.testing.assert_allclose(recon[lo:hi], sig[lo:hi], atol=1e-2)


def test_mdct_batched():
    rng = np.random.default_rng(8)
    x = rng.standard_normal((4, 256)).astype(np.float32)
    y = np.asarray(tx.mdct(x, 128))
    assert y.shape == (4, 128)
    # batched vs single now compile separately (tx_init jits per input
    # shape), so XLA fusion may reassociate within float tolerance
    np.testing.assert_allclose(y[0], np.asarray(tx.mdct(x[0], 128)),
                               atol=1e-4, rtol=1e-5)


def test_kbd_window_properties():
    w = tx.kbd_window(256)
    assert w.shape == (256,)
    # Princen-Bradley: w[i]^2 + w[i + n/2]^2 = 1
    np.testing.assert_allclose(w[:128] ** 2 + w[128:] ** 2, 1.0, atol=1e-9)
    # symmetry
    np.testing.assert_allclose(w, w[::-1], atol=0)
