"""DASH muxer (dashenc.py vs libavformat/dashenc.c): fMP4 init/chunk
segments + static MPD with SegmentTimeline. Gates: the reference
decodes the concatenated init+chunks byte-stream with identical frame
CRCs to the source stream, and our own DASH demuxer round-trips the
MPD packet-exact. (The reference binary here has no DASH demuxer —
built without libxml2 — so the MPD itself is validated by our
demuxer, whose parser is oracle-tested elsewhere.)"""

import subprocess

import pytest

import refutil
from conftest import requires_ref

from ffmpeg_tpu.io import open_input, open_output
from ffmpeg_tpu.utils.rational import Rational

from test_fuzz import _encode_video


def _mux_dash(tmp_path, par, pkts, seg_duration=0.2):
    mpd = tmp_path / "out.mpd"
    m = open_output(str(mpd), format="dash")
    m.seg_duration = seg_duration
    m.add_stream(codecpar=par, time_base=Rational(1, 25))
    m.write_header()
    datas = []
    for i, p in enumerate(pkts):
        p.stream_index = 0
        p.pts = p.dts = i
        p.duration = 1
        p.time_base = Rational(1, 25)
        datas.append(bytes(p.data))
        m.write_packet(p)
    m.write_trailer()
    return mpd, datas


def test_dash_mux_roundtrip(tmp_path):
    """Our DASH demuxer reads the MPD back packet-exact."""
    par, pkts = _encode_video("mjpeg", n=12, opts={"quality": 70})
    mpd, datas = _mux_dash(tmp_path, par, pkts)
    segs = sorted(p.name for p in tmp_path.glob("*.m4s"))
    assert "init-stream0.m4s" in segs
    assert sum(s.startswith("chunk-") for s in segs) >= 3
    d = open_input(str(mpd))
    got = [bytes(p.data) for p in d.packets()]
    assert got == datas


@requires_ref
def test_dash_mux_ref_decodes(tmp_path):
    """Reference decode of init+chunks == reference decode of the
    source stream (same frame CRCs)."""
    par, pkts = _encode_video("mjpeg", n=12, opts={"quality": 70})
    raw = tmp_path / "src.mjpeg"
    raw.write_bytes(b"".join(bytes(p.data) for p in pkts))
    mpd, _ = _mux_dash(tmp_path, par, pkts)
    allf = tmp_path / "all.mp4"
    with open(allf, "wb") as f:
        f.write((tmp_path / "init-stream0.m4s").read_bytes())
        for c in sorted(tmp_path.glob("chunk-*.m4s")):
            f.write(c.read_bytes())
    a = subprocess.run(
        [str(refutil.REF), "-v", "error", "-i", str(allf),
         "-f", "framecrc", "-"], check=True,
        capture_output=True).stdout.decode()
    b = subprocess.run(
        [str(refutil.REF), "-v", "error", "-f", "mjpeg", "-r", "25",
         "-i", str(raw), "-f", "framecrc", "-"], check=True,
        capture_output=True).stdout.decode()
    crc = [ln.split(",")[-1] for ln in a.splitlines() if "," in ln]
    want = [ln.split(",")[-1] for ln in b.splitlines() if "," in ln]
    assert crc == want and len(crc) == 12


@requires_ref
def test_dash_mux_audio(tmp_path):
    """AAC representation: reference decodes the audio segments."""
    import io
    import numpy as np
    from ffmpeg_tpu.codecs import CodecContext
    from ffmpeg_tpu.core.frame import Frame
    from ffmpeg_tpu.io.stream import CodecParameters, MediaType
    from ffmpeg_tpu.formats.channel_layout import default_layout
    from ffmpeg_tpu.utils.error import EndOfStream, TryAgain

    apar = CodecParameters(codec_type=MediaType.AUDIO, codec_id="aac",
                           sample_rate=44100, sample_fmt="fltp",
                           ch_layout=default_layout(1))
    enc = CodecContext.open_encoder(apar)
    sine = np.sin(2 * np.pi * 440 * np.arange(44100)
                  / 44100).astype(np.float32)
    pkts = []
    for i in range(0, 43008, 1024):
        enc.send_frame(Frame.audio(sine[None, i:i + 1024], 44100,
                                   fmt="fltp"))
        while True:
            try:
                pkts.append(enc.receive_packet())
            except (TryAgain, EndOfStream):
                break
    mpd = tmp_path / "a.mpd"
    m = open_output(str(mpd), format="dash")
    m.seg_duration = 0.3
    m.add_stream(codecpar=enc.par, time_base=Rational(1, 44100))
    m.write_header()
    for i, p in enumerate(pkts):
        p.stream_index = 0
        p.pts = p.dts = i * 1024
        p.duration = 1024
        p.time_base = Rational(1, 44100)
        m.write_packet(p)
    m.write_trailer()
    allf = tmp_path / "a.mp4"
    with open(allf, "wb") as f:
        f.write((tmp_path / "init-stream0.m4s").read_bytes())
        for c in sorted(tmp_path.glob("chunk-*.m4s")):
            f.write(c.read_bytes())
    out = subprocess.run(
        [str(refutil.REF), "-v", "error", "-i", str(allf),
         "-f", "s16le", "-"], check=True, capture_output=True).stdout
    assert len(out) >= 2 * 40000      # ~1 s of samples decoded
