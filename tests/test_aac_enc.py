"""AAC-LC encoder tests: our ADTS streams must decode in the
reference decoder with good fidelity, and the reference's decode of
our stream must match our own decoder's (stream-level parity)."""

import subprocess

import numpy as np
import pytest

import refutil
from conftest import requires_ref

from ffmpeg_tpu.codecs import CodecContext
from ffmpeg_tpu.core.frame import Frame
from ffmpeg_tpu.io.stream import CodecParameters, MediaType
from ffmpeg_tpu.formats.channel_layout import default_layout
from ffmpeg_tpu.utils.rational import Rational
from ffmpeg_tpu.utils.error import TryAgain, EndOfStream


def _signal(n, rate, ch, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / rate
    base = (0.3 * np.sin(2 * np.pi * 440 * t) +
            0.15 * np.sin(2 * np.pi * 1870 * t) +
            0.04 * rng.normal(size=n))
    if ch == 1:
        return base[None, :].astype(np.float32)
    second = (0.25 * np.sin(2 * np.pi * 660 * t) +
              0.04 * rng.normal(size=n))
    return np.stack([base, second]).astype(np.float32)


def _encode(sig, rate, quality=2):
    ch = sig.shape[0]
    par = CodecParameters(codec_type=MediaType.AUDIO, codec_id="aac",
                          sample_rate=rate,
                          ch_layout=default_layout(ch))
    enc = CodecContext.open_encoder(par, options={"quality": quality})
    f = Frame.audio(sig, rate, "fltp", default_layout(ch), pts=0,
                    time_base=Rational(1, rate))
    pkts = []
    for fr in (f, None):
        enc.send_frame(fr)
        while True:
            try:
                pkts.append(enc.receive_packet())
            except (TryAgain, EndOfStream):
                break
    return pkts


def _ref_decode(tmp_path, pkts, ch):
    f = tmp_path / "ours.aac"
    f.write_bytes(b"".join(bytes(p.data) for p in pkts))
    raw = subprocess.run(
        [str(refutil.REF), "-v", "error", "-i", str(f), "-c:a",
         "pcm_f32le", "-f", "wav", "-"],
        check=True, capture_output=True).stdout
    a = np.frombuffer(raw[raw.find(b"data") + 8:], np.float32)
    return a[:len(a) // ch * ch].reshape(-1, ch).T


def _our_decode(pkts, rate, ch):
    dec = CodecContext.open_decoder(CodecParameters(
        codec_type=MediaType.AUDIO, codec_id="aac",
        sample_rate=rate))
    frames = dec.decode_all(pkts)
    return np.concatenate(
        [np.stack([np.asarray(p).ravel() for p in fr.planes])
         for fr in frames], axis=1)


def _snr(a, b):
    n = min(a.shape[-1], b.shape[-1])
    a = a[..., :n].astype(np.float64)
    b = b[..., :n].astype(np.float64)
    return 10 * np.log10(np.mean(b ** 2) /
                         max(np.mean((a - b) ** 2), 1e-30))


@requires_ref
@pytest.mark.parametrize("rate", [44100, 48000])
def test_aac_encode_mono(tmp_path, rate):
    n = rate
    sig = _signal(n, rate, 1)
    pkts = _encode(sig, rate)
    ref = _ref_decode(tmp_path, pkts, 1)
    # encoder delay = 1024 samples
    snr = _snr(ref[:, 1024:1024 + n - 4096], sig[:, :n - 4096])
    assert snr > 30, f"ref decodes our AAC at {snr:.1f} dB"
    ours = _our_decode(pkts, rate, 1)
    consist = _snr(ours, ref)
    assert consist > 60, f"decoder parity {consist:.1f} dB"


@requires_ref
def test_aac_encode_stereo(tmp_path):
    rate = 48000
    n = rate
    sig = _signal(n, rate, 2)
    pkts = _encode(sig, rate)
    ref = _ref_decode(tmp_path, pkts, 2)
    snr = _snr(ref[:, 1024:1024 + n - 4096], sig[:, :n - 4096])
    assert snr > 30, f"ref decodes our stereo AAC at {snr:.1f} dB"
    ours = _our_decode(pkts, rate, 2)
    assert _snr(ours, ref) > 60


@requires_ref
def test_aac_encode_quality_ladder(tmp_path):
    rate = 44100
    n = rate // 2
    sig = _signal(n, rate, 1)
    sizes = []
    snrs = []
    for q in (1, 3, 5):
        pkts = _encode(sig, rate, quality=q)
        sizes.append(sum(len(p.data) for p in pkts))
        ref = _ref_decode(tmp_path, pkts, 1)
        snrs.append(_snr(ref[:, 1024:1024 + n - 4096],
                         sig[:, :n - 4096]))
    assert sizes[0] > sizes[1] > sizes[2]
    assert snrs[0] > snrs[1] > snrs[2] > 18


@requires_ref
def test_aac_encode_cli(tmp_path):
    """wav → AAC via the CLI; the reference decodes the result."""
    import struct
    from ffmpeg_tpu.cli import ffmpeg as cli
    rate = 44100
    sig = _signal(rate // 2, rate, 1)[0]
    wav = tmp_path / "in.wav"
    data = sig.astype(np.float32).tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVEfmt " + \
        struct.pack("<IHHIIHH", 16, 3, 1, rate, rate * 4, 4, 32) + \
        b"data" + struct.pack("<I", len(data))
    wav.write_bytes(hdr + data)
    out = tmp_path / "out.aac"
    cli.main(["-v", "error", "-i", str(wav), "-c:a", "aac", "-f",
              "adts", "-y", str(out)])
    raw = subprocess.run(
        [str(refutil.REF), "-v", "error", "-i", str(out), "-c:a",
         "pcm_f32le", "-f", "wav", "-"],
        check=True, capture_output=True).stdout
    dec = np.frombuffer(raw[raw.find(b"data") + 8:], np.float32)
    snr = _snr(dec[1024:1024 + len(sig) - 4096],
               sig[:len(sig) - 4096])
    assert snr > 28, f"CLI AAC encode: {snr:.1f} dB"
