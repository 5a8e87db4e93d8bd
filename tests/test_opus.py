"""Opus decoder tests (CELT mode): reference-encoded streams decoded
by both sides, SNR-gated. The reference's native opus encoder is
CELT-only, which matches our implemented scope."""

import subprocess

import numpy as np
import pytest

import refutil
from conftest import requires_ref

from ffmpeg_tpu.io.demux import open_input


def _have_enc():
    try:
        out = subprocess.run([str(refutil.REF), "-hide_banner",
                              "-encoders"], capture_output=True,
                             text=True).stdout
        return " opus " in out
    except Exception:
        return False


opus_enc = pytest.mark.skipif(not _have_enc(),
                              reason="oracle lacks opus encoder")


def _make(tmp_path, lavfi, name, ch=2, extra=()):
    p = tmp_path / name
    subprocess.run([str(refutil.REF), "-v", "error", "-f", "lavfi",
                    "-i", lavfi, "-ac", str(ch), "-c:a", "opus",
                    "-strict", "-2", *extra, "-f", "matroska",
                    "-y", str(p)], check=True)
    return p


def _ours(path):
    from ffmpeg_tpu.codecs import CodecContext
    dmx = open_input(str(path))
    dec = CodecContext.open_decoder(dmx.streams[0].codecpar)
    pkts = []
    while True:
        try:
            pkts.append(dmx.read_packet())
        except Exception:
            break
    frames = dec.decode_all(pkts)
    return np.concatenate([f.audio_data for f in frames], axis=1)


def _ref(path, ch):
    raw = subprocess.run([str(refutil.REF), "-v", "error", "-i",
                          str(path), "-c:a", "pcm_f32le", "-f", "wav",
                          "-"], check=True, capture_output=True).stdout
    off = raw.find(b"data") + 8
    a = np.frombuffer(raw[off:], np.float32)
    return a[:len(a) // ch * ch].reshape(-1, ch).T


def _snr(ours, ref):
    n = min(ours.shape[1], ref.shape[1])
    a = ours[:, :n].astype(np.float64)
    b = ref[:, :n].astype(np.float64)
    err = ((a - b) ** 2).mean()
    sig = (b ** 2).mean()
    if err == 0:
        return 200.0
    return 10 * np.log10(sig / max(err, 1e-30))


@requires_ref
@opus_enc
def test_opus_celt_sine(tmp_path):
    p = _make(tmp_path, "sine=frequency=440:duration=0.5", "s.mka")
    snr = _snr(_ours(p), _ref(p, 2))
    assert snr > 60, f"opus sine snr {snr:.1f} dB"


@requires_ref
@opus_enc
def test_opus_celt_mono(tmp_path):
    p = _make(tmp_path, "sine=frequency=880:duration=0.5", "m.mka",
              ch=1)
    snr = _snr(_ours(p), _ref(p, 1))
    assert snr > 60, f"opus mono snr {snr:.1f} dB"


@requires_ref
@opus_enc
def test_opus_celt_noise_transients(tmp_path):
    """Wideband noise: transients, short blocks, anti-collapse."""
    import struct
    rng = np.random.default_rng(3)
    n = 24000
    pcm = (rng.standard_normal((n, 2)) * 8000).astype(np.int16)
    wav = tmp_path / "in.wav"
    body = pcm.tobytes()
    wav.write_bytes(
        b"RIFF" + struct.pack("<I", 36 + len(body)) + b"WAVEfmt " +
        struct.pack("<IHHIIHH", 16, 1, 2, 48000, 192000, 4, 16) +
        b"data" + struct.pack("<I", len(body)) + body)
    p = tmp_path / "n.mka"
    subprocess.run([str(refutil.REF), "-v", "error", "-i", str(wav),
                    "-c:a", "opus", "-strict", "-2", "-f", "matroska",
                    "-y", str(p)], check=True)
    snr = _snr(_ours(p), _ref(p, 2))
    assert snr > 45, f"opus noise snr {snr:.1f} dB"


@requires_ref
@opus_enc
def test_opus_celt_sweep_high_rate(tmp_path):
    """Frequency sweep at high bitrate: dense PVQ across all bands."""
    p = _make(tmp_path, "sine=frequency=200:duration=0.5", "hr.mka",
              extra=("-b:a", "256k"))
    snr = _snr(_ours(p), _ref(p, 2))
    assert snr > 60, f"opus 256k snr {snr:.1f} dB"


@requires_ref
@opus_enc
def test_opus_celt_low_bitrate(tmp_path):
    """Low bitrate: folding, band skipping, sparse allocation."""
    p = _make(tmp_path, "sine=frequency=440:duration=0.5", "lb.mka",
              extra=("-b:a", "16k"))
    snr = _snr(_ours(p), _ref(p, 2))
    assert snr > 40, f"opus 16k snr {snr:.1f} dB"
