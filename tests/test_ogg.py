"""Ogg demuxer: packet parity with the reference demuxer and end-to-end
decode of vorbis/opus/flac-in-ogg through our own decoders."""

import subprocess
import wave
import zlib

import numpy as np
import pytest

import refutil
from conftest import requires_ref

from ffmpeg_tpu.io import open_input


def _make_ogg(tmp_path, codec, extra=()):
    f = tmp_path / f"t.{codec}.ogg"
    subprocess.run(
        [str(refutil.REF), "-v", "error", "-f", "lavfi", "-i",
         "sine=frequency=440:sample_rate=48000", "-t", "1",
         "-c:a", codec, *extra, "-f", "ogg", "-y", str(f)],
        check=True, capture_output=True)
    return f


CODECS = [("vorbis", ("-strict", "-2", "-ac", "2")),
          ("opus", ("-strict", "-2")),
          ("flac", ())]


@requires_ref
@pytest.mark.parametrize("codec,extra", CODECS)
def test_ogg_packet_parity(tmp_path, codec, extra):
    """Our page/lacing assembly must produce exactly the reference's
    packet sequence (size + adler32, framecrc semantics)."""
    f = _make_ogg(tmp_path, codec, extra)
    d = open_input(str(f))
    assert d.name == "ogg"
    st = d.streams[0]
    assert st.codecpar.codec_id == codec
    ours = [(len(p.data), zlib.adler32(p.data, 0)) for p in d.packets()]
    ref = subprocess.run(
        [str(refutil.REF), "-v", "error", "-i", str(f), "-c", "copy",
         "-fflags", "+bitexact", "-f", "framecrc", "-"],
        check=True, capture_output=True, text=True).stdout
    rows = [l.split(", ") for l in ref.splitlines()
            if l and l[0].isdigit()]
    refp = [(int(r[4]), int(r[5], 16)) for r in rows]
    assert ours == refp


@requires_ref
@pytest.mark.parametrize("codec,extra", CODECS)
def test_ogg_decode_end_to_end(tmp_path, codec, extra):
    """demux .ogg -> our decoder -> wav; >= 60 dB vs the reference's
    decode of the same file."""
    from ffmpeg_tpu.cli import ffmpeg as cli
    f = _make_ogg(tmp_path, codec, extra)
    ours = tmp_path / "ours.wav"
    assert cli.main(["-v", "error", "-i", str(f), "-y", str(ours)]) == 0
    refw = tmp_path / "ref.wav"
    subprocess.run([str(refutil.REF), "-v", "error", "-i", str(f),
                    "-y", str(refw)], check=True, capture_output=True)

    def rd(p):
        w = wave.open(str(p))
        return np.frombuffer(w.readframes(w.getnframes()),
                             np.int16).astype(np.float64)

    a, b = rd(ours), rd(refw)
    # end-of-stream granule trim may differ by up to one frame
    assert abs(len(a) - len(b)) <= 1024 * 2
    n = min(len(a), len(b))
    a, b = a[:n], b[:n]
    err = a - b
    snr = 10 * np.log10((b ** 2).mean() / max((err ** 2).mean(), 1e-12))
    assert snr >= 60.0, f"{codec}: SNR {snr:.1f} dB"


@requires_ref
def test_ogg_opus_toc_timestamps(tmp_path):
    """Opus packet pts/durations from the TOC must be self-consistent
    and line up with the final page granule (incl. pre-skip)."""
    f = _make_ogg(tmp_path, "opus", ("-strict", "-2"))
    d = open_input(str(f))
    pk = list(d.packets())
    assert all(p.duration > 0 for p in pk)
    for a, b in zip(pk, pk[1:]):
        assert b.pts == a.pts + a.duration
    # 1 s at 48 kHz minus pre-skip offset at the start
    assert pk[0].pts <= 0
    total = pk[-1].pts + pk[-1].duration
    assert total >= 47800


@requires_ref
def test_ogg_vorbis_extradata_xiph_lacing(tmp_path):
    f = _make_ogg(tmp_path, "vorbis", ("-strict", "-2", "-ac", "2"))
    d = open_input(str(f))
    ed = d.streams[0].codecpar.extradata
    assert ed[0] == 2                     # two laced header sizes
    # first laced packet is the 30-byte id header
    i, n = 1, 0
    while ed[i] == 255:
        n += 255
        i += 1
    n += ed[i]
    assert n == 30
