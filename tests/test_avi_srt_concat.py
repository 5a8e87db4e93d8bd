"""AVI demuxer, SRT subtitles, concat demuxer, segment muxer tests."""

import subprocess
import zlib

import pytest

import refutil
from conftest import requires_ref

from ffmpeg_tpu.codecs import CodecContext
from ffmpeg_tpu.core.packet import Packet
from ffmpeg_tpu.io import open_input, open_output


@pytest.fixture
def avi_file(tmp_path):
    p = tmp_path / "t.avi"
    if refutil.REF.exists():
        subprocess.run(
            [str(refutil.REF), "-v", "error",
             "-f", "lavfi", "-i", "testsrc2=size=160x120:rate=25",
             "-f", "lavfi", "-i", "sine=frequency=440:sample_rate=44100",
             "-t", "1", "-c:v", "mjpeg", "-q:v", "3",
             "-pix_fmt", "yuvj420p", "-c:a", "pcm_s16le",
             "-y", str(p)], check=True, capture_output=True)
        return p
    from conftest import own_avi_clip
    return own_avi_clip(p)


@requires_ref
def test_avi_payload_parity(avi_file):
    d = open_input(str(avi_file))
    assert d.name == "avi"
    assert d.streams[0].codecpar.codec_id == "mjpeg"
    assert d.streams[1].codecpar.codec_id == "pcm_s16le"
    ours = [(p.stream_index, len(p.data), zlib.adler32(p.data, 0))
            for p in d.packets()]
    ref = subprocess.run(
        [str(refutil.REF), "-v", "error", "-i", str(avi_file), "-c", "copy",
         "-fflags", "+bitexact", "-f", "framecrc", "-"],
        check=True, capture_output=True).stdout.decode()
    rows = [(int(p[0]), int(p[4]), int(p[5], 16))
            for l in ref.splitlines() if l and not l.startswith("#")
            for p in [[x.strip() for x in l.split(",")]]]
    assert sorted(ours) == sorted(rows)


def test_srt_roundtrip(tmp_path):
    src = tmp_path / "in.srt"
    src.write_text("1\n00:00:01,000 --> 00:00:02,500\nHello <i>world</i>\n\n"
                   "2\n00:01:03,000 --> 00:01:04,250\nSecond\ncue\n\n")
    d = open_input(str(src))
    assert d.streams[0].codecpar.codec_id == "subrip"
    pkts = list(d.packets())
    assert len(pkts) == 2
    assert pkts[0].pts == 1000 and pkts[0].duration == 1500
    assert pkts[1].pts == 63000
    dec = CodecContext.open_decoder(d.streams[0].codecpar)
    frames = dec.decode_all(iter(pkts))
    assert frames[0].side_data["text"] == "Hello world"
    assert "Second\ncue" in frames[1].side_data["text"]
    out = tmp_path / "out.srt"
    m = open_output(str(out), format="srt")
    m.add_stream(d.streams[0].codecpar, time_base=d.streams[0].time_base)
    for p in pkts:
        m.write_packet(p)
    m.write_trailer()
    m.close()
    d2 = open_input(str(out))
    pkts2 = list(d2.packets())
    assert [(p.pts, p.duration, p.data) for p in pkts2] == \
        [(p.pts, p.duration, p.data) for p in pkts]


@requires_ref
def test_concat_demuxer(avi_file, tmp_path):
    lst = tmp_path / "c.ffconcat"
    lst.write_text(f"ffconcat version 1.0\nfile '{avi_file}'\nfile '{avi_file}'\n")
    d = open_input(str(lst))
    assert d.name == "concat"
    pkts = list(d.packets())
    single = len(list(open_input(str(avi_file)).packets()))
    assert len(pkts) == 2 * single
    # timestamps of the second copy continue after the first
    v = [p.pts for p in pkts if p.stream_index == 0]
    assert v[single // 2 + 12] > v[0]


@requires_ref
def test_segment_muxer(avi_file, tmp_path):
    d = open_input(str(avi_file))
    pat = str(tmp_path / "seg%03d.mp4")
    m = open_output(pat, format="segment")
    m.segment_time = 0.4
    m.segment_format = "mov"
    for st in d.streams:
        m.add_stream(st.codecpar, time_base=st.time_base)
    for p in d.packets():
        m.write_packet(p)
    m.write_trailer()
    m.close()
    import glob
    segs = sorted(glob.glob(str(tmp_path / "seg*.mp4")))
    assert len(segs) >= 2
    # each segment independently readable by the reference
    for s in segs[:2]:
        pr = subprocess.run([str(refutil.REF), "-v", "error", "-i", s,
                             "-f", "null", "-"], capture_output=True)
        assert pr.returncode == 0, pr.stderr[:200]


# ---------------- AVI muxer --------------------------------------------------

@requires_ref
def test_avi_mux_remux_reference_decodes(avi_file, tmp_path):
    """Remux reference AVI through our muxer; reference must demux it back
    with identical payloads and accept the idx1 index."""
    out = tmp_path / "ours.avi"
    d = open_input(str(avi_file))
    m = open_output(str(out), format="avi")
    for st in d.streams:
        m.add_stream(st.codecpar, time_base=st.time_base)
    for p in d.packets():
        m.write_packet(p)
    m.write_trailer()
    m.close()
    d.close()

    ref = subprocess.run(
        [str(refutil.REF), "-v", "error", "-i", str(out), "-c", "copy",
         "-fflags", "+bitexact", "-f", "framecrc", "-"],
        check=True, capture_output=True)
    orig = subprocess.run(
        [str(refutil.REF), "-v", "error", "-i", str(avi_file), "-c", "copy",
         "-fflags", "+bitexact", "-f", "framecrc", "-"],
        check=True, capture_output=True)
    # payload CRCs per packet must match (timestamps may differ in rounding)
    crc = lambda txt: [l.rsplit(",", 1)[-1] for l in
                       txt.decode().splitlines() if l.startswith("0,")]
    assert crc(ref.stdout) == crc(orig.stdout)
    assert ref.stderr == b""


def test_avi_mux_roundtrip_own_demuxer(avi_file, tmp_path):
    out = tmp_path / "ours.avi"
    d = open_input(str(avi_file))
    pkts_in = []
    m = open_output(str(out), format="avi")
    for st in d.streams:
        m.add_stream(st.codecpar, time_base=st.time_base)
    for p in d.packets():
        pkts_in.append((p.stream_index, zlib.adler32(p.data, 0)))
        m.write_packet(p)
    m.write_trailer()
    m.close()
    d.close()
    d2 = open_input(str(out))
    pkts_out = [(p.stream_index, zlib.adler32(p.data, 0))
                for p in d2.packets()]
    assert pkts_in == pkts_out
    assert d2.streams[0].codecpar.width == 160
    assert d2.streams[1].codecpar.sample_rate == 44100
