"""AC-3 decoder tests: the reference's AC-3 encoder is the stream
source, its decoder the oracle. Mantissa/bit-allocation integer state
must match exactly (incl. the replicated lagged-Fibonacci dither PRNG);
the float filterbank is compared to float rounding tolerance."""

import subprocess

import numpy as np
import pytest

import refutil
from conftest import requires_ref

from ffmpeg_tpu.codecs import CodecContext
from ffmpeg_tpu.io import open_input
from ffmpeg_tpu.io.stream import MediaType

TOL = 3e-5


def _encode(tmp_path, name, lavfi, rate, extra=()):
    p = tmp_path / name
    subprocess.run([str(refutil.REF), "-v", "error", "-f", "lavfi",
                    "-i", lavfi, *extra, "-c:a", "ac3",
                    "-ar", str(rate), "-y", str(p)],
                   check=True, capture_output=True)
    return p


def _ref_decode(path):
    out = subprocess.run(
        [str(refutil.REF), "-v", "error", "-i", str(path),
         "-c:a", "pcm_f32le", "-f", "wav", "-"],
        check=True, capture_output=True).stdout
    pos = out.find(b"data")
    assert pos > 0
    return np.frombuffer(out[pos + 8:], "<f4")


def _our_decode(path):
    d = open_input(str(path))
    st = [s for s in d.streams if s.codecpar.codec_type == MediaType.AUDIO][0]
    dec = CodecContext.open_decoder(st.codecpar)
    frames = dec.decode_all([p for p in d.packets()
                             if p.stream_index == st.index])
    assert frames
    chans = len(frames[0].planes)
    pcm = np.concatenate([np.stack([np.asarray(pl) for pl in f.planes])
                          for f in frames], axis=1)
    return pcm.T.reshape(-1), chans     # interleaved like wav


@requires_ref
def test_ac3_mono_sine(tmp_path):
    p = _encode(tmp_path, "m.ac3", "sine=frequency=440:duration=1", 48000)
    ref = _ref_decode(p)
    ours, ch = _our_decode(p)
    assert ch == 1
    n = min(len(ref), len(ours))
    assert n > 40000
    np.testing.assert_allclose(ours[:n], ref[:n], atol=TOL)


def _encode_stereo(tmp_path, rate, bitrate, seed=3):
    """Two detuned tones + a touch of noise, L≠R, via a crafted WAV."""
    rng = np.random.default_rng(seed)
    t = np.arange(rate, dtype=np.float64) / rate
    left = 0.5 * np.sin(2 * np.pi * 440 * t) + \
        0.05 * rng.standard_normal(rate)
    right = 0.4 * np.sin(2 * np.pi * 523 * t) + \
        0.2 * np.sin(2 * np.pi * 3000 * t)
    pcm = np.stack([left, right], 1).ravel()
    pcm = np.clip(pcm * 32767, -32768, 32767).astype("<i2").tobytes()
    wav = tmp_path / "src.wav"
    hdr = (b"RIFF" + (36 + len(pcm)).to_bytes(4, "little") + b"WAVEfmt " +
           (16).to_bytes(4, "little") + (1).to_bytes(2, "little") +
           (2).to_bytes(2, "little") + rate.to_bytes(4, "little") +
           (rate * 4).to_bytes(4, "little") + (4).to_bytes(2, "little") +
           (16).to_bytes(2, "little") + b"data" +
           len(pcm).to_bytes(4, "little"))
    wav.write_bytes(hdr + pcm)
    p = tmp_path / "s.ac3"
    subprocess.run([str(refutil.REF), "-v", "error", "-i", str(wav),
                    "-c:a", "ac3", "-b:a", bitrate, "-y", str(p)],
                   check=True, capture_output=True)
    return p


@requires_ref
def test_ac3_stereo(tmp_path):
    """Stereo at 44.1k: rematrixing (and coupling when the encoder
    enables it) with two detuned tones."""
    p = _encode_stereo(tmp_path, 44100, "128k")
    ref = _ref_decode(p)
    ours, ch = _our_decode(p)
    assert ch == 2
    n = min(len(ref), len(ours))
    assert n > 80000
    np.testing.assert_allclose(ours[:n], ref[:n], atol=TOL)


@requires_ref
def test_ac3_noise_blocksw(tmp_path):
    """Shaped noise drives wide bap coverage (and block switching on
    transient content); 32 kHz exercises the third sr_code."""
    p = _encode(tmp_path, "n.ac3",
                "anoisesrc=duration=1:colour=pink:seed=7,"
                "aformat=sample_fmts=s16", 32000,
                extra=("-b:a", "160k"))
    ref = _ref_decode(p)
    ours, ch = _our_decode(p)
    n = min(len(ref), len(ours))
    assert n > 20000
    np.testing.assert_allclose(ours[:n], ref[:n], atol=TOL)


@requires_ref
def test_ac3_cli_end_to_end(tmp_path):
    """.ac3 → our CLI → wav matches the reference decode."""
    from ffmpeg_tpu.cli.ffmpeg import main
    p = _encode(tmp_path, "c.ac3", "sine=frequency=330:duration=1", 48000)
    out = tmp_path / "c.wav"
    assert main(["-v", "error", "-i", str(p), "-c:a", "pcm_f32le",
                 "-y", str(out)]) == 0
    got = np.frombuffer(out.read_bytes().split(b"data", 1)[1][4:], "<f4")
    ref = _ref_decode(p)
    n = min(len(ref), len(got))
    assert n > 40000
    np.testing.assert_allclose(got[:n], ref[:n], atol=TOL)
