"""Resampler correctness: sine reconstruction quality, streaming equivalence,
rematrix rules, and differential tests vs the reference swresample."""

import numpy as np
import pytest

import refutil
from conftest import requires_ref

from ffmpeg_tpu.formats.channel_layout import ChannelLayout
from ffmpeg_tpu.resample.rematrix import build_matrix
from ffmpeg_tpu.resample.swresample import Resampler, SwrContext


def _sine(rate, freq, n, ch=1):
    t = np.arange(n) / rate
    x = 0.5 * np.sin(2 * np.pi * freq * t).astype(np.float32)
    return np.tile(x, (ch, 1))


def _snr(sig, err):
    return 10 * np.log10((sig ** 2).mean() / max(1e-12, (err ** 2).mean()))


@pytest.mark.parametrize("rates", [(48000, 16000), (44100, 48000), (48000, 44100), (8000, 48000)])
def test_sine_quality(rates):
    in_rate, out_rate = rates
    n = in_rate // 4
    x = _sine(in_rate, 440.0, n)
    r = Resampler(in_rate, out_rate, 1)
    y = np.concatenate([r.process(x), r.flush()], axis=1)[0]
    m = y.shape[0]
    assert abs(m - n * out_rate // in_rate) <= 2
    # compare against the ideal sine at output positions (skip filter edges)
    k = np.arange(m)
    ideal = 0.5 * np.sin(2 * np.pi * 440.0 * (k * in_rate / out_rate) / in_rate)
    lo, hi = 100, m - 100
    snr = _snr(ideal[lo:hi], y[lo:hi] - ideal[lo:hi])
    assert snr > 60, f"{rates}: snr {snr:.1f} dB"


def test_streaming_matches_oneshot():
    in_rate, out_rate = 48000, 16000
    x = _sine(in_rate, 1234.5, 9601, ch=2)
    one = Resampler(in_rate, out_rate, 2)
    y1 = np.concatenate([one.process(x), one.flush()], axis=1)
    st = Resampler(in_rate, out_rate, 2)
    outs = []
    pos = 0
    rng = np.random.default_rng(7)
    while pos < x.shape[1]:
        step = int(rng.integers(1, 997))
        outs.append(st.process(x[:, pos:pos + step]))
        pos += step
    outs.append(st.flush())
    y2 = np.concatenate(outs, axis=1)
    assert y1.shape == y2.shape
    np.testing.assert_allclose(y1, y2, atol=1e-6)


def test_identity_rate_passthrough():
    ctx = SwrContext(48000, "stereo", "s16", 48000, "stereo", "s16")
    x = (np.arange(64) * 100).astype(np.int16).reshape(2, 32)
    y = ctx.convert(x)
    np.testing.assert_array_equal(x, y)


def test_rematrix_downmix_5_1_to_stereo():
    m = build_matrix(ChannelLayout.from_string("5.1"),
                     ChannelLayout.from_string("stereo"))
    assert m.shape == (2, 6)
    names = ChannelLayout.from_string("5.1").channel_names()
    fl, fr, fc, lfe, bl, br = (names.index(c) for c in ("FL", "FR", "FC", "LFE", "BL", "BR"))
    # FL_out gets FL + .707 FC + .707 BL (then normalized)
    assert m[0, fl] > 0 and m[0, fc] > 0 and m[0, bl] > 0
    assert m[0, fr] == 0 and m[0, br] == 0
    assert m[0, lfe] == 0
    # normalization: no row exceeds unity sum
    assert np.abs(m).sum(axis=1).max() <= 1.0 + 1e-9


def test_mono_to_stereo():
    ctx = SwrContext(48000, "mono", "flt", 48000, "stereo", "flt")
    x = np.ones((1, 16), np.float32) * 0.25
    y = ctx.convert(x)
    assert y.shape == (2, 16)
    np.testing.assert_allclose(y, 0.25)


def test_delay_reporting():
    r = Resampler(48000, 16000, 1)
    r.process(np.zeros((1, 4800), np.float32))
    assert 0 <= r.delay_samples <= 32


@requires_ref
def test_vs_reference_swresample():
    """48k stereo → 16k mono, like the Whisper frontend config."""
    in_rate, out_rate = 48000, 16000
    raw = refutil.gen_audio(rate=in_rate, channels=1, duration=0.5)
    x = np.frombuffer(raw, np.int16).astype(np.float32)[None, :] / 32768.0
    # reference path
    import subprocess
    p = subprocess.run(
        [str(refutil.REF), "-hide_banner", "-v", "error",
         "-f", "s16le", "-ar", str(in_rate), "-ac", "1", "-i", "-",
         "-ar", str(out_rate), "-f", "s16le", "-"],
        input=raw, check=True, capture_output=True)
    ref = np.frombuffer(p.stdout, np.int16).astype(np.float32) / 32768.0
    # our path
    r = Resampler(in_rate, out_rate, 1)
    ours = np.concatenate([r.process(x), r.flush()], axis=1)[0]
    n = min(len(ref), len(ours))
    assert abs(len(ref) - len(ours)) <= 32
    lo, hi = 200, n - 200
    err = ours[lo:hi] - ref[lo:hi]
    snr = _snr(ref[lo:hi], err)
    assert snr > 40, f"snr vs reference {snr:.1f} dB"


def test_noise_shaping_dither_presets():
    """Noise-shaped quantization must push error energy out of the
    low band: in-band (<4 kHz) error power below plain TPDF's, total
    error bounded (reference: swresample dither.c presets)."""
    from ffmpeg_tpu.resample.swresample import SwrContext
    sr = 44100
    n = 8192
    t = np.arange(n) / sr
    x = (0.3 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)[None, :]

    def err_spectrum(method):
        c = SwrContext(sr, "mono", "flt", sr, "mono", "s16",
                       dither=method)
        y = c.convert(x).astype(np.float64) / 32768.0
        e = y[0] - x[0]
        spec = np.abs(np.fft.rfft(e)) ** 2
        freqs = np.fft.rfftfreq(n, 1 / sr)
        return spec[freqs < 4000].sum(), spec.sum()

    low_tpdf, tot_tpdf = err_spectrum("tpdf")
    for preset in ("lipshitz", "f_weighted", "shibata"):
        low, tot = err_spectrum(preset)
        assert low < low_tpdf * 0.5, (preset, low, low_tpdf)
        assert tot < tot_tpdf * 400, (preset, tot)
    for basic in ("rectangular", "triangular_hp"):
        _lo, tot = err_spectrum(basic)
        assert tot < tot_tpdf * 4
