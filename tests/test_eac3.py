"""E-AC-3 decoder tests: the reference's eac3 encoder is the stream
source, its decoder the oracle (same policy as test_ac3.py — integer
entropy/bit-allocation state must match exactly, float filterbank to
rounding tolerance)."""

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
                    "-i", lavfi, *extra, "-c:a", "eac3",
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
    st = [s for s in d.streams
          if s.codecpar.codec_type == MediaType.AUDIO][0]
    assert st.codecpar.codec_id == "eac3"
    dec = CodecContext.open_decoder(st.codecpar)
    frames = dec.decode_all([p for p in d.packets()
                             if p.stream_index == st.index])
    assert frames
    chans = len(frames[0].planes)
    pcm = np.concatenate([np.stack([np.asarray(pl) for pl in f.planes])
                          for f in frames], axis=1)
    return pcm.T.reshape(-1), chans     # interleaved like wav


def _check(p, want_ch, min_n):
    ref = _ref_decode(p)
    ours, ch = _our_decode(p)
    assert ch == want_ch
    n = min(len(ref), len(ours))
    assert n > min_n
    np.testing.assert_allclose(ours[:n], ref[:n], atol=TOL)


@requires_ref
def test_eac3_mono_sine(tmp_path):
    _check(_encode(tmp_path, "m.eac3",
                   "sine=frequency=440:duration=1", 48000), 1, 40000)


@requires_ref
def test_eac3_stereo_noise(tmp_path):
    """Pink noise at 44.1k drives wide bap coverage (plus coupling and
    rematrixing when the encoder enables them)."""
    _check(_encode(tmp_path, "s.eac3",
                   "anoisesrc=duration=1:colour=pink:seed=11,"
                   "aformat=sample_fmts=s16:channel_layouts=stereo",
                   44100, extra=("-b:a", "128k")), 2, 80000)


@requires_ref
def test_eac3_stereo_tones(tmp_path):
    rng = np.random.default_rng(5)
    rate = 48000
    t = np.arange(rate) / rate
    left = 0.5 * np.sin(2 * np.pi * 440 * t) + \
        0.05 * rng.standard_normal(rate)
    right = 0.4 * np.sin(2 * np.pi * 523 * t) + \
        0.2 * np.sin(2 * np.pi * 3000 * t)
    pcm = np.stack([left, right], 1).ravel()
    pcm = np.clip(pcm * 32767, -32768, 32767).astype("<i2").tobytes()
    wav = tmp_path / "src.wav"
    hdr = (b"RIFF" + (36 + len(pcm)).to_bytes(4, "little") +
           b"WAVEfmt " + (16).to_bytes(4, "little") +
           (1).to_bytes(2, "little") + (2).to_bytes(2, "little") +
           rate.to_bytes(4, "little") +
           (rate * 4).to_bytes(4, "little") +
           (4).to_bytes(2, "little") + (16).to_bytes(2, "little") +
           b"data" + len(pcm).to_bytes(4, "little"))
    wav.write_bytes(hdr + pcm)
    p = tmp_path / "t.eac3"
    subprocess.run([str(refutil.REF), "-v", "error", "-i", str(wav),
                    "-c:a", "eac3", "-b:a", "192k", "-y", str(p)],
                   check=True, capture_output=True)
    _check(p, 2, 80000)


@requires_ref
def test_eac3_5_1(tmp_path):
    """5.1: LFE + the decoded→native channel remap
    (ff_ac3_dec_channel_map)."""
    graph = ";".join(
        f"anoisesrc=duration=1:colour=pink:seed={i}[c{i}]"
        for i in range(6))
    graph += (";" + "".join(f"[c{i}]" for i in range(6)) +
              "amerge=inputs=6,"
              "aformat=sample_fmts=s16:channel_layouts=5.1[out]")
    p = tmp_path / "six.eac3"
    subprocess.run([str(refutil.REF), "-v", "error", "-filter_complex",
                    graph, "-map", "[out]", "-c:a", "eac3", "-b:a",
                    "384k", "-y", str(p)],
                   check=True, capture_output=True)
    _check(p, 6, 200000)


@requires_ref
def test_eac3_cli_end_to_end(tmp_path):
    from ffmpeg_tpu.cli.ffmpeg import main
    p = _encode(tmp_path, "c.eac3",
                "sine=frequency=330:duration=1", 48000)
    out = tmp_path / "c.wav"
    assert main(["-v", "error", "-i", str(p), "-c:a", "pcm_f32le",
                 "-y", str(out)]) == 0
    got = np.frombuffer(out.read_bytes().split(b"data", 1)[1][4:],
                        "<f4")
    ref = _ref_decode(p)
    n = min(len(ref), len(got))
    assert n > 40000
    np.testing.assert_allclose(got[:n], ref[:n], atol=TOL)
