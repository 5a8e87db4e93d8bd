"""ADPCM (IMA WAV + Microsoft) tests: decode is bit-exact vs the
reference; our encodes are byte-identical to the reference encoder's
data chunk (non-trellis path) on block-aligned input."""

import struct
import subprocess

import numpy as np
import pytest

import refutil
from conftest import requires_ref

from ffmpeg_tpu.codecs import CodecContext
from ffmpeg_tpu.io import open_input
from ffmpeg_tpu.io.stream import MediaType


def _our_decode(path):
    d = open_input(str(path))
    dec = CodecContext.open_decoder(d.streams[0].codecpar)
    frames = dec.decode_all(list(d.packets()))
    return np.concatenate(
        [np.stack([np.asarray(p) for p in f.planes]) for f in frames],
        axis=1)


def _ref_decode(path, ch):
    out = subprocess.run(
        [str(refutil.REF), "-v", "error", "-i", str(path),
         "-f", "s16le", "-"], check=True, capture_output=True).stdout
    return np.frombuffer(out, "<i2").reshape(-1, ch).T


def _wav_s16(path, pcm, rate):
    """pcm: (ch, n) int16 → interleaved wav."""
    ch, n = pcm.shape
    body = pcm.T.reshape(-1).astype("<i2").tobytes()
    hdr = (b"RIFF" + (36 + len(body)).to_bytes(4, "little") +
           b"WAVEfmt " + (16).to_bytes(4, "little") +
           struct.pack("<HHIIHH", 1, ch, rate, rate * 2 * ch, 2 * ch,
                       16) + b"data" + len(body).to_bytes(4, "little"))
    path.write_bytes(hdr + body)


def _data_chunk(path):
    d = path.read_bytes()
    pos = d.find(b"data")
    sz = int.from_bytes(d[pos + 4:pos + 8], "little")
    return d[pos + 8:pos + 8 + sz]


@requires_ref
@pytest.mark.parametrize("codec,layout", [
    ("adpcm_ima_wav", "mono"), ("adpcm_ima_wav", "stereo"),
    ("adpcm_ms", "mono"), ("adpcm_ms", "stereo"),
])
def test_adpcm_decode_exact(tmp_path, codec, layout):
    p = tmp_path / "a.wav"
    subprocess.run(
        [str(refutil.REF), "-v", "error", "-f", "lavfi", "-i",
         f"anoisesrc=duration=0.4:colour=pink:seed=9,"
         f"aformat=sample_fmts=s16:channel_layouts={layout}",
         "-c:a", codec, "-y", str(p)], check=True)
    ours = _our_decode(p)
    ch = ours.shape[0]
    ref = _ref_decode(p, ch)
    n = min(ours.shape[1], ref.shape[1])
    assert n > 15000
    assert np.array_equal(ours[:, :n], ref[:, :n])


@requires_ref
@pytest.mark.parametrize("codec,ch", [
    ("adpcm_ima_wav", 1), ("adpcm_ima_wav", 2),
    ("adpcm_ms", 1), ("adpcm_ms", 2),
])
def test_adpcm_encode_byte_identical(tmp_path, codec, ch):
    rate = 16000
    if codec == "adpcm_ima_wav":
        spb = (1024 - 4 * ch) * 8 // (4 * ch) + 1
    else:
        spb = (1024 - 7 * ch) * 2 // ch + 2
    n = spb * 5
    rng = np.random.default_rng(3)
    t = np.arange(n) / rate
    pcm = np.stack([(np.sin(2 * np.pi * (300 + 100 * c) * t) * 12000 +
                     rng.standard_normal(n) * 500)
                    for c in range(ch)]).astype(np.int16)
    src = tmp_path / "src.wav"
    _wav_s16(src, pcm, rate)
    refout = tmp_path / "ref.wav"
    subprocess.run([str(refutil.REF), "-v", "error", "-i", str(src),
                    "-c:a", codec, "-y", str(refout)], check=True)
    # our encode
    from ffmpeg_tpu.io.stream import CodecParameters
    from ffmpeg_tpu.formats.channel_layout import default_layout
    from ffmpeg_tpu.core.frame import Frame
    par = CodecParameters(codec_type=MediaType.AUDIO, codec_id=codec,
                          sample_rate=rate,
                          ch_layout=default_layout(ch))
    enc = CodecContext.open_encoder(par)
    f = Frame.audio(pcm, rate, "s16p", default_layout(ch), pts=0)
    enc.send_frame(f)
    enc.send_frame(None)
    ours = b""
    while True:
        try:
            ours += bytes(enc.receive_packet().data)
        except Exception:
            break
    assert ours == _data_chunk(refout)


@requires_ref
@pytest.mark.parametrize("codec", ["adpcm_ima_wav", "adpcm_ms"])
def test_adpcm_cli_roundtrip(tmp_path, codec):
    """wav → our CLI encode → reference decodes it == our decode."""
    from ffmpeg_tpu.cli.ffmpeg import main
    src = tmp_path / "src.wav"
    rng = np.random.default_rng(11)
    pcm = (rng.standard_normal((2, 20000)) * 8000).astype(np.int16)
    _wav_s16(src, pcm, 44100)
    out = tmp_path / "o.wav"
    assert main(["-v", "error", "-i", str(src), "-c:a", codec,
                 "-y", str(out)]) == 0
    ref = _ref_decode(out, 2)
    ours = _our_decode(out)
    n = min(ref.shape[1], ours.shape[1])
    assert n > 19000
    assert np.array_equal(ours[:, :n], ref[:, :n])
