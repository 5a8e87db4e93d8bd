"""AAC-LC decoder tests: differential vs the reference decoder
(FATE stddev-style tolerance on the float output)."""

import math
import subprocess

import numpy as np
import pytest

import refutil
from conftest import requires_ref

from ffmpeg_tpu.codecs import CodecContext
from ffmpeg_tpu.io import open_input


def _make_adts(tmp_path, lavfi, name, extra=()):
    p = tmp_path / name
    subprocess.run([str(refutil.REF), "-v", "error", "-f", "lavfi",
                    "-i", lavfi, *extra, "-c:a", "aac", "-b:a", "96k",
                    "-f", "adts", "-y", str(p)],
                   check=True, capture_output=True)
    return p


def _ours(path):
    d = open_input(str(path))
    dec = CodecContext.open_decoder(d.streams[0].codecpar)
    frames = dec.decode_all(d.packets())
    return np.concatenate([f.audio_data for f in frames], axis=1)


def _ref(path, ch):
    raw = subprocess.run(
        [str(refutil.REF), "-v", "error", "-f", "aac", "-i", str(path),
         "-f", "s16le", "-"], check=True, capture_output=True).stdout
    return np.frombuffer(raw, np.int16).astype(np.float64).reshape(-1, ch).T / 32768.0


def _snr(a, b):
    n = min(a.shape[-1], b.shape[-1])
    a, b = a[..., :n], b[..., :n]
    err = a - b
    return 10 * math.log10(float((b ** 2).mean()) /
                           max(1e-12, float((err ** 2).mean())))


@requires_ref
def test_aac_mono_sine(tmp_path):
    p = _make_adts(tmp_path, "sine=frequency=440:sample_rate=44100",
                   "m.aac", extra=("-t", "1"))
    ours = _ours(p)
    ref = _ref(p, 1)
    assert ours.shape[0] == 1
    snr = _snr(ours, ref)
    assert snr > 40, f"mono snr {snr:.1f} dB"


@requires_ref
def test_aac_stereo_cpe(tmp_path):
    """Stereo CPE exercises common windows + M/S; correlated channels."""
    rng = np.random.default_rng(11)
    n = 44100
    t = np.arange(n) / 44100
    left = 0.4 * np.sin(2 * np.pi * 523.25 * t) + 0.1 * np.sin(2 * np.pi * 1200 * t)
    right = 0.4 * np.sin(2 * np.pi * 523.25 * t) - 0.1 * np.sin(2 * np.pi * 1200 * t)
    pcm = np.stack([left, right], 1)
    s16 = (np.clip(pcm, -1, 1) * 32767).astype(np.int16)
    p = tmp_path / "s.aac"
    subprocess.run([str(refutil.REF), "-v", "error", "-f", "s16le",
                    "-ar", "44100", "-ac", "2", "-i", "-",
                    "-c:a", "aac", "-b:a", "128k", "-f", "adts", "-y", str(p)],
                   input=s16.tobytes(), check=True, capture_output=True)
    ours = _ours(p)
    ref = _ref(p, 2)
    assert ours.shape[0] == 2
    snr = _snr(ours, ref)
    assert snr > 35, f"stereo snr {snr:.1f} dB"


@requires_ref
def test_aac_transients_short_windows(tmp_path):
    """Click train forces EIGHT_SHORT windows."""
    n = 44100 // 2
    pcm = np.zeros(n)
    pcm[::3000] = 0.9
    pcm += 0.05 * np.sin(2 * np.pi * 800 * np.arange(n) / 44100)
    s16 = (np.clip(pcm, -1, 1) * 32767).astype(np.int16)
    p = tmp_path / "t.aac"
    subprocess.run([str(refutil.REF), "-v", "error", "-f", "s16le",
                    "-ar", "44100", "-ac", "1", "-i", "-",
                    "-c:a", "aac", "-b:a", "96k", "-f", "adts", "-y", str(p)],
                   input=s16.tobytes(), check=True, capture_output=True)
    ours = _ours(p)
    ref = _ref(p, 1)
    snr = _snr(ours, ref)
    assert snr > 25, f"transient snr {snr:.1f} dB"


@requires_ref
def test_aac_in_mp4(tmp_path):
    """AAC inside MP4 (ASC extradata path, no ADTS headers)."""
    mp4 = tmp_path / "a.mp4"
    subprocess.run([str(refutil.REF), "-v", "error", "-f", "lavfi",
                    "-i", "sine=frequency=660:sample_rate=48000", "-t", "0.5",
                    "-c:a", "aac", "-b:a", "96k", "-y", str(mp4)],
                   check=True, capture_output=True)
    d = open_input(str(mp4))
    st = d.streams[0]
    assert st.codecpar.codec_id == "aac"
    assert st.codecpar.extradata
    dec = CodecContext.open_decoder(st.codecpar)
    frames = dec.decode_all(d.packets())
    ours = np.concatenate([f.audio_data for f in frames], axis=1)
    assert frames[0].sample_rate == 48000
    raw = subprocess.run(
        [str(refutil.REF), "-v", "error", "-i", str(mp4), "-f", "s16le", "-"],
        check=True, capture_output=True).stdout
    ref = np.frombuffer(raw, np.int16).astype(np.float64)[None, :] / 32768.0
    # mp4 decode trims encoder priming — align by best lag
    best = (0, -1)
    for lag in range(0, 4200):
        nn = 4096
        if lag + nn > ours.shape[1]:
            break
        a = ours[0, lag:lag + nn]
        b = ref[0, :nn]
        c = float(np.dot(a, b)) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
        if c > best[1]:
            best = (lag, c)
    lag, c = best
    assert c > 0.99, f"correlation {c}"
    snr = _snr(ours[:, lag:], ref)
    assert snr > 30, f"mp4 aac snr {snr:.1f}"


@requires_ref
def test_whisper_frontend_pipeline(tmp_path):
    """BASELINE config 2: 48kHz stereo AAC decode + resample to 16kHz mono."""
    from ffmpeg_tpu.resample.swresample import SwrContext
    p = tmp_path / "w.aac"
    subprocess.run([str(refutil.REF), "-v", "error", "-f", "lavfi",
                    "-i", "sine=frequency=440:sample_rate=48000",
                    "-af", "aformat=channel_layouts=stereo",
                    "-t", "0.5", "-c:a", "aac", "-b:a", "128k",
                    "-f", "adts", "-y", str(p)],
                   check=True, capture_output=True)
    d = open_input(str(p))
    dec = CodecContext.open_decoder(d.streams[0].codecpar)
    swr = SwrContext(48000, "stereo", "fltp", 16000, "mono", "flt")
    chunks = []
    for f in dec.decode_all(d.packets()):
        y = swr.convert(f.audio_data)
        if y.size:
            chunks.append(y)
    chunks.append(swr.flush())
    ours = np.concatenate(chunks, axis=1)
    # reference equivalent
    raw = subprocess.run(
        [str(refutil.REF), "-v", "error", "-f", "aac", "-i", str(p),
         "-ar", "16000", "-ac", "1", "-f", "s16le", "-"],
        check=True, capture_output=True).stdout
    ref = np.frombuffer(raw, np.int16).astype(np.float64)[None, :] / 32768.0
    snr = _snr(ours[:, 500:-500], ref[:, 500:-500])
    assert snr > 30, f"whisper frontend snr {snr:.1f}"


@requires_ref
def test_aac_decode_frames_batched(tmp_path):
    """decode_frames (batched device IMDCT) == sequential decode."""
    p = tmp_path / "a.adts"
    subprocess.run([str(refutil.REF), "-v", "error", "-f", "lavfi",
                    "-i", "sine=frequency=600:sample_rate=48000",
                    "-ac", "2", "-t", "1.0", "-c:a", "aac",
                    "-f", "adts", "-y", str(p)],
                   check=True, capture_output=True)
    d = open_input(str(p))
    pkts = list(d.packets())
    seq = CodecContext.open_decoder(d.streams[0].codecpar)
    a = seq.decode_all(list(pkts))
    bat = CodecContext.open_decoder(d.streams[0].codecpar)
    b = bat.decode_frames(pkts)
    assert len(a) == len(b)
    for fa, fb in zip(a, b):
        np.testing.assert_allclose(np.asarray(fa.audio_data),
                                   np.asarray(fb.audio_data),
                                   atol=1e-6)
