"""MLP / TrueHD decoder tests: BIT-EXACT vs the reference decoder
(lossless codec ⇒ byte-identical PCM required) on reference-encoded
streams: MLP mono/stereo/5.1 (multi-substream) and TrueHD
stereo, sine and noise content, 44.1/48 kHz."""

import subprocess

import numpy as np
import pytest

import refutil
from conftest import requires_ref

from ffmpeg_tpu.codecs import CodecContext
from ffmpeg_tpu.io import open_input


def _roundtrip(tmp_path, src_args, codec, label):
    fmt = "mlp" if codec == "mlp" else "truehd"
    f = tmp_path / f"{label}.{ 'mlp' if codec == 'mlp' else 'thd'}"
    subprocess.run([str(refutil.REF), "-v", "error", *src_args,
                    "-c:a", codec, "-strict", "-2", "-f", fmt,
                    "-y", str(f)], check=True, capture_output=True)
    d = open_input(str(f))
    assert d.streams[0].codecpar.codec_id == codec
    pkts = list(d.packets())
    dec = CodecContext.open_decoder(d.streams[0].codecpar)
    frames = dec.decode_all(pkts)
    assert frames
    ours = np.concatenate(
        [np.stack([np.asarray(p) for p in fr.planes], 0)
         for fr in frames], axis=1)
    outfmt = "s16le" if frames[0].format == "s16p" else "s32le"
    raw = subprocess.run(
        [str(refutil.REF), "-v", "error", "-f", fmt, "-i", str(f),
         "-f", outfmt, "-"], capture_output=True, check=True).stdout
    dt = np.int16 if outfmt == "s16le" else np.int32
    ref = np.frombuffer(raw, dt).reshape(-1, ours.shape[0]).T
    n = min(ours.shape[1], ref.shape[1])
    assert n > 0
    np.testing.assert_array_equal(ours[:, :n], ref[:, :n])


@requires_ref
def test_mlp_stereo_sine(tmp_path):
    _roundtrip(tmp_path, ["-f", "lavfi", "-i",
                          "sine=frequency=440:sample_rate=48000",
                          "-ac", "2", "-t", "0.4"], "mlp", "s2")


@requires_ref
def test_mlp_mono_44k(tmp_path):
    _roundtrip(tmp_path, ["-f", "lavfi", "-i",
                          "sine=frequency=300:sample_rate=44100",
                          "-ac", "1", "-t", "0.4"], "mlp", "m44")


@requires_ref
def test_mlp_stereo_noise(tmp_path):
    """White noise forces the escape/LSB-heavy entropy paths."""
    _roundtrip(tmp_path, ["-f", "lavfi", "-i",
                          "anoisesrc=color=white:seed=7:"
                          "sample_rate=48000",
                          "-ac", "2", "-t", "0.4"], "mlp", "n2")


@requires_ref
def test_mlp_5point1_substreams(tmp_path):
    """5.1 MLP carries a second substream (downmix + extension)."""
    _roundtrip(tmp_path, ["-f", "lavfi", "-i",
                          "aevalsrc=0.3*sin(330*2*PI*t)|"
                          "0.2*cos(500*2*PI*t)|0.1*sin(80*2*PI*t)|"
                          "0.2*sin(1000*2*PI*t)|0.1*cos(70*2*PI*t)|"
                          "0.05*sin(3000*2*PI*t):s=48000:c=5.1",
                          "-t", "0.3"], "mlp", "51")


@requires_ref
def test_truehd_stereo(tmp_path):
    _roundtrip(tmp_path, ["-f", "lavfi", "-i",
                          "sine=frequency=440:sample_rate=48000",
                          "-ac", "2", "-t", "0.4"], "truehd", "t2")


@requires_ref
def test_truehd_noise(tmp_path):
    _roundtrip(tmp_path, ["-f", "lavfi", "-i",
                          "anoisesrc=color=pink:seed=3:"
                          "sample_rate=48000",
                          "-ac", "2", "-t", "0.4"], "truehd", "tn")
