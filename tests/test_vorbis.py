"""Vorbis decoder tests: reference-encoded streams (native vorbis
encoder in the oracle build) decoded by both sides, SNR-gated."""

import subprocess

import numpy as np
import pytest

import refutil
from conftest import requires_ref

from ffmpeg_tpu.io.demux import open_input


def _have_vorbis_enc():
    try:
        out = subprocess.run([str(refutil.REF), "-hide_banner",
                              "-encoders"], capture_output=True,
                             text=True).stdout
        return " vorbis " in out
    except Exception:
        return False


def _make(tmp_path, lavfi, name, ch=2, rate=44100, extra=()):
    p = tmp_path / name
    subprocess.run([str(refutil.REF), "-v", "error", "-f", "lavfi",
                    "-i", lavfi, "-ar", str(rate), "-ac", str(ch),
                    "-c:a", "vorbis", "-strict", "-2", *extra,
                    "-f", "matroska", "-y", str(p)], check=True)
    return p


def _ref(path, ch):
    raw = subprocess.run([str(refutil.REF), "-v", "error", "-i",
                          str(path), "-c:a", "pcm_f32le", "-f", "wav",
                          "-"], check=True, capture_output=True).stdout
    off = raw.find(b"data") + 8
    a = np.frombuffer(raw[off:], np.float32)
    return a[:len(a) // ch * ch].reshape(-1, ch).T


def _ours(path):
    from ffmpeg_tpu.codecs import CodecContext
    dmx = open_input(str(path))
    st = dmx.streams[0]
    dec = CodecContext.open_decoder(st.codecpar)
    pkts = []
    while True:
        try:
            pkts.append(dmx.read_packet())
        except Exception:
            break
    frames = dec.decode_all(pkts)
    return np.concatenate([f.audio_data for f in frames], axis=1)


def _snr(a, b):
    n = min(a.shape[1], b.shape[1])
    a, b = a[:, :n].astype(np.float64), b[:, :n].astype(np.float64)
    err = ((a - b) ** 2).mean()
    sig = (b ** 2).mean()
    if err == 0:
        return 200.0
    return 10 * np.log10(sig / max(err, 1e-30))


def _align(ours, ref):
    """Best small non-negative lag of ours vs ref."""
    best = (None, -1e9)
    for lag in range(0, 4097, 64):
        if ours.shape[1] - lag < ref.shape[1] // 2:
            break
        s = _snr(ours[:, lag:], ref)
        if s > best[1]:
            best = (lag, s)
    return best


vorbis_enc = pytest.mark.skipif(not _have_vorbis_enc(),
                                reason="oracle lacks vorbis encoder")


@requires_ref
@vorbis_enc
def test_vorbis_sine(tmp_path):
    """The encoder is stereo-only; a pure sine upmixed to stereo."""
    p = _make(tmp_path, "sine=frequency=440:duration=0.6", "m.mka")
    ours = _ours(p)
    ref = _ref(p, 2)
    lag, snr = _align(ours, ref)
    assert snr > 40, f"vorbis sine snr {snr:.1f} dB (lag {lag})"


@requires_ref
@vorbis_enc
def test_vorbis_stereo_coupled(tmp_path):
    p = _make(tmp_path,
              "sine=frequency=440:duration=0.6", "s.mka", ch=2)
    ours = _ours(p)
    ref = _ref(p, 2)
    lag, snr = _align(ours, ref)
    assert snr > 35, f"stereo vorbis snr {snr:.1f} dB (lag {lag})"


@requires_ref
@vorbis_enc
def test_vorbis_noise(tmp_path):
    """Wideband noise: dense residues across all partitions."""
    import struct
    rng = np.random.default_rng(7)
    n = 24000
    pcm = (rng.standard_normal((n, 2)) * 6000).astype(np.int16)
    wav = tmp_path / "in.wav"
    body = pcm.tobytes()
    wav.write_bytes(
        b"RIFF" + struct.pack("<I", 36 + len(body)) + b"WAVEfmt " +
        struct.pack("<IHHIIHH", 16, 1, 2, 48000, 192000, 4, 16) +
        b"data" + struct.pack("<I", len(body)) + body)
    p = tmp_path / "n.mka"
    subprocess.run([str(refutil.REF), "-v", "error", "-i", str(wav),
                    "-c:a", "vorbis", "-strict", "-2", "-f",
                    "matroska", "-y", str(p)], check=True)
    ours = _ours(p)
    ref = _ref(p, 2)
    lag, snr = _align(ours, ref)
    assert snr > 30, f"noise vorbis snr {snr:.1f} dB (lag {lag})"
