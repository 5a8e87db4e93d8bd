"""Loudness / time / convolution audio filter tests (ebur128,
loudnorm, atempo, afir) against the reference binary where available,
plus self-contained invariants."""

import re
import struct
import subprocess

import numpy as np
import pytest

import refutil
from conftest import requires_ref

from ffmpeg_tpu.core.frame import Frame
from ffmpeg_tpu.filters import get_filter

SR = 48000


def _ref_has(flt):
    if not refutil.REF.exists():
        return False
    out = subprocess.run([str(refutil.REF), "-v", "0", "-filters"],
                         capture_output=True).stdout
    return (" " + flt + " ").encode() in out


def _mkwav(path, x):
    """x: (ch, n) float in [-1,1] -> s16 wav."""
    ch, _ = x.shape
    pcm = (np.clip(x, -1, 1) * 32767).astype(np.int16).T
    d = pcm.tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(d)) + b"WAVEfmt " + \
        struct.pack("<IHHIIHH", 16, 1, ch, SR, SR * 2 * ch, 2 * ch,
                    16) + b"data" + struct.pack("<I", len(d))
    path.write_bytes(hdr + d)
    return pcm.T.astype(np.float64) / 32768.0


def _noise(tmp_path, seed=4, dur=4.0, ch=2):
    rng = np.random.default_rng(seed)
    n = int(SR * dur)
    env = np.concatenate([np.full(n // 2, 1.0),
                          np.full(n - n // 2, 0.3)])
    x = rng.standard_normal((ch, n)) * 0.15 * env
    p = tmp_path / "in.wav"
    return p, _mkwav(p, x)


def _feed(flt, x, chunk=4800, flush=True):
    outs = []
    for i in range(0, x.shape[1], chunk):
        outs += flt.process(Frame.audio(
            x[:, i:i + chunk].astype(np.float32), SR, fmt="fltp"))
    if flush:
        outs += flt.process(None)
    return outs


def test_ebur128_reference_sine():
    """-18 dBFS 997 Hz stereo sine reads -18.0 LUFS (R128 ref
    case)."""
    t = np.arange(SR * 5) / SR
    amp = 10 ** (-18 / 20)
    x = np.tile(amp * np.sin(2 * np.pi * 997 * t), (2, 1))
    f = get_filter("ebur128")("")
    _feed(f, x, flush=False)
    s = f.stats
    assert abs(s["I"] + 18.0) < 0.1
    assert s["LRA"] < 0.5


@requires_ref
@pytest.mark.skipif(not _ref_has("ebur128"),
                    reason="reference lacks ebur128")
def test_ebur128_vs_reference(tmp_path):
    p, x = _noise(tmp_path)
    r = subprocess.run(
        [str(refutil.REF), "-v", "info", "-i", str(p),
         "-af", "ebur128=peak=sample", "-f", "null", "-"],
        capture_output=True)
    tail = r.stderr.decode()
    tail = tail[tail.find("Summary:"):]
    ref_i = float(re.search(r"I:\s+(-?[\d.]+) LUFS", tail).group(1))
    ref_lra = float(re.search(r"LRA:\s+(-?[\d.]+) LU",
                              tail).group(1))
    ref_peak = float(re.search(r"Peak:\s+(-?[\d.]+) dBFS",
                               tail).group(1))
    f = get_filter("ebur128")("")
    _feed(f, x, flush=False)
    s = f.stats
    assert abs(s["I"] - ref_i) < 0.15
    assert abs(s["LRA"] - ref_lra) < 0.15
    assert abs(s["sample_peak"] - ref_peak) < 0.15


@requires_ref
@pytest.mark.skipif(not _ref_has("loudnorm"),
                    reason="reference lacks loudnorm")
def test_loudnorm_linear_bit_exact(tmp_path):
    p, x = _noise(tmp_path)
    args = ("I=-20:TP=-2:LRA=11:measured_I=-12.8:measured_TP=-3.3:"
            "measured_LRA=2.3:measured_thresh=-22.8:linear=true")
    out = tmp_path / "ref.wav"
    subprocess.run(
        [str(refutil.REF), "-v", "error", "-y", "-i", str(p),
         "-af", "loudnorm=" + args, "-ar", str(SR),
         "-c:a", "pcm_f32le", "-f", "wav", str(out)], check=True)
    raw = out.read_bytes()
    want = np.frombuffer(raw[raw.find(b"data") + 8:], np.float32) \
        .reshape(-1, 2).T
    f = get_filter("loudnorm")(args)
    got = np.concatenate([o.audio_data for o in _feed(f, x)],
                         axis=1)
    n = min(got.shape[1], want.shape[1])
    np.testing.assert_allclose(got[:, :n], want[:, :n], atol=1e-7)


def test_loudnorm_dynamic_hits_target():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, SR * 6)) * 0.02       # quiet input
    f = get_filter("loudnorm")("I=-20:TP=-2")
    y = np.concatenate([o.audio_data for o in _feed(f, x)], axis=1)
    meter = get_filter("ebur128")("")
    _feed(meter, y.astype(np.float64), flush=False)
    # converges toward target (skip the attack: measure whole-file
    # loudness which is dominated by the converged region)
    assert abs(meter.stats["I"] + 20.0) < 3.0
    assert meter.stats["sample_peak"] <= -1.9


@requires_ref
@pytest.mark.skipif(not _ref_has("atempo"),
                    reason="reference lacks atempo")
@pytest.mark.parametrize("tempo", [0.75, 1.5, 2.0])
def test_atempo_duration(tmp_path, tempo):
    p, x = _noise(tmp_path, dur=3.0)
    out = tmp_path / "at.wav"
    subprocess.run(
        [str(refutil.REF), "-v", "error", "-y", "-i", str(p),
         "-af", f"atempo={tempo}", "-c:a", "pcm_f32le", "-f",
         "wav", str(out)], check=True)
    raw = out.read_bytes()
    refn = len(np.frombuffer(raw[raw.find(b"data") + 8:],
                             np.float32)) // 2
    f = get_filter("atempo")(str(tempo))
    ourn = sum(o.nb_samples for o in _feed(f, x))
    assert abs(ourn - refn) / refn < 0.02


def test_atempo_preserves_pitch():
    t = np.arange(SR * 2) / SR
    x = np.sin(2 * np.pi * 440 * t)[None, :]
    f = get_filter("atempo")("2.0")
    y = np.concatenate([o.audio_data for o in _feed(f, x)], axis=1)
    seg = y[0, 1000:1000 + 32768]
    pk = np.argmax(np.abs(np.fft.rfft(seg))) * SR / 32768
    assert abs(pk - 440) < 5


def test_afir_matches_numpy_convolve():
    rng = np.random.default_rng(0)
    sig = rng.standard_normal((1, 9000)) * 0.2
    ir = np.array([[1.0, 0.5, 0.25]])
    f = get_filter("afir")("")
    f.process(Frame.audio(ir.astype(np.float32), SR, fmt="fltp"),
              pad=1)
    f.process(None, pad=1)
    y = np.concatenate([o.audio_data for o in _feed(f, sig)],
                       axis=1)
    irn = ir[0] / np.abs(ir[0]).sum()
    want = np.convolve(sig[0], irn)
    n = min(len(want), y.shape[1])
    np.testing.assert_allclose(y[0, :n], want[:n], atol=1e-6)


@requires_ref
@pytest.mark.skipif(not _ref_has("afir"),
                    reason="reference lacks afir")
def test_afir_vs_reference(tmp_path):
    p, x = _noise(tmp_path, dur=2.0)
    rng = np.random.default_rng(1)
    ir = np.exp(-np.arange(64) / 10.0) * \
        rng.standard_normal(64) * 0.3
    irp = tmp_path / "ir.wav"
    irq = _mkwav(irp, ir[None, :])
    out = tmp_path / "fir.wav"
    subprocess.run(
        [str(refutil.REF), "-v", "error", "-y", "-i", str(p),
         "-i", str(irp), "-filter_complex", "[0:a][1:a]afir",
         "-c:a", "pcm_f32le", "-f", "wav", str(out)], check=True)
    raw = out.read_bytes()
    want = np.frombuffer(raw[raw.find(b"data") + 8:], np.float32) \
        .reshape(-1, 2).T
    f = get_filter("afir")("")
    f.process(Frame.audio(irq.astype(np.float32), SR, fmt="fltp"),
              pad=1)
    f.process(None, pad=1)
    got = np.concatenate([o.audio_data for o in _feed(f, x)],
                         axis=1)
    n = min(got.shape[1], want.shape[1])
    err = got[:, :n] - want[:, :n]
    snr = 10 * np.log10(np.sum(want[:, :n] ** 2)
                        / max(np.sum(err ** 2), 1e-30))
    assert snr > 90
