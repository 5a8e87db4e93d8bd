"""Container layer tests: probe, wav/y4m roundtrips, framecrc byte-parity
with the reference."""

import io
import subprocess

import numpy as np
import pytest

import refutil
from conftest import requires_ref

from ffmpeg_tpu.codecs import CodecContext
from ffmpeg_tpu.core.frame import Frame
from ffmpeg_tpu.io import open_input, open_output, avio
from ffmpeg_tpu.io.stream import CodecParameters, MediaType
from ffmpeg_tpu.formats.channel_layout import default_layout
from ffmpeg_tpu.utils.rational import Rational


def _make_wav_bytes(rate=8000, ch=1, n=1600):
    t = np.arange(n) / rate
    x = (np.sin(2 * np.pi * 440 * t) * 10000).astype(np.int16)
    x = np.tile(x, (ch, 1))
    buf = io.BytesIO()
    par = CodecParameters(codec_type=MediaType.AUDIO, codec_id="pcm_s16le",
                          sample_rate=rate, ch_layout=default_layout(ch))
    with open_output(buf, format="wav") as m:
        m.add_stream(par, time_base=Rational(1, rate))
        enc = CodecContext.open_encoder(par)
        enc.send_frame(Frame.audio(x, rate, "s16", pts=0))
        m.write_packet(enc.receive_packet())
    return buf.getvalue(), x


def test_wav_roundtrip():
    data, x = _make_wav_bytes()
    d = open_input(data)
    assert d.name == "wav"
    st = d.streams[0]
    assert st.codecpar.codec_id == "pcm_s16le"
    assert st.codecpar.sample_rate == 8000
    dec = CodecContext.open_decoder(st.codecpar)
    frames = dec.decode_all(d.packets())
    got = np.concatenate([f.audio_data for f in frames], axis=1)
    np.testing.assert_array_equal(got, x)


@requires_ref
def test_wav_mux_readable_by_reference(tmp_path):
    data, x = _make_wav_bytes(rate=16000, ch=2, n=800)
    p = tmp_path / "t.wav"
    p.write_bytes(data)
    out = subprocess.run(
        [str(refutil.REF), "-v", "error", "-i", str(p), "-f", "s16le", "-"],
        check=True, capture_output=True).stdout
    got = np.frombuffer(out, np.int16).reshape(-1, 2).T
    np.testing.assert_array_equal(got, x)


@requires_ref
def test_wav_demux_reference_file(tmp_path):
    raw = refutil.gen_audio(rate=22050, channels=1, duration=0.2)
    p = tmp_path / "ref.wav"
    subprocess.run([str(refutil.REF), "-v", "error", "-f", "s16le",
                    "-ar", "22050", "-ac", "1", "-i", "-", "-y", str(p)],
                   input=raw, check=True, capture_output=True)
    d = open_input(str(p))
    assert d.streams[0].codecpar.sample_rate == 22050
    payload = b"".join(pkt.data for pkt in d.packets())
    assert payload == raw


def test_y4m_roundtrip():
    w, h = 32, 24
    f = Frame.video(w, h, "yuv420p")
    par = CodecParameters(codec_type=MediaType.VIDEO, codec_id="rawvideo",
                          width=w, height=h, pix_fmt="yuv420p",
                          framerate=Rational(25, 1))
    buf = io.BytesIO()
    with open_output(buf, format="yuv4mpegpipe") as m:
        m.add_stream(par, time_base=Rational(1, 25))
        enc = CodecContext.open_encoder(par)
        for i in range(3):
            fr = f.clone_props()
            fr.pts = i
            enc.send_frame(fr)
            m.write_packet(enc.receive_packet())
    d = open_input(buf.getvalue())
    assert d.name == "yuv4mpegpipe"
    st = d.streams[0]
    assert (st.codecpar.width, st.codecpar.height) == (w, h)
    pkts = list(d.packets())
    assert len(pkts) == 3
    dec = CodecContext.open_decoder(st.codecpar)
    frames = dec.decode_all(iter(pkts))
    np.testing.assert_array_equal(np.asarray(frames[0].planes[0]),
                                  np.asarray(f.planes[0]))


@requires_ref
def test_y4m_framecrc_parity_with_reference(tmp_path):
    """Same y4m input → byte-identical framecrc output vs the reference."""
    y4m = refutil.run(["-f", "lavfi", "-i", "testsrc2=size=64x48:rate=25",
                       "-frames:v", "5", "-pix_fmt", "yuv420p",
                       "-f", "yuv4mpegpipe", "-"])
    ref_crc = subprocess.run(
        [str(refutil.REF), "-v", "error", "-i", "-", "-c", "copy",
         "-fflags", "+bitexact", "-f", "framecrc", "-"],
        input=y4m, check=True, capture_output=True).stdout.decode()

    d = open_input(y4m)
    buf = io.BytesIO()
    with open_output(buf, format="framecrc") as m:
        st_in = d.streams[0]
        m.add_stream(st_in.codecpar, time_base=st_in.time_base)
        for pkt in d.packets():
            m.write_packet(pkt)
    ours = buf.getvalue().decode()
    assert ours == ref_crc, f"ours:\n{ours}\nref:\n{ref_crc}"


def test_probe_rejects_garbage():
    from ffmpeg_tpu.utils.error import DemuxerNotFound
    with pytest.raises(DemuxerNotFound):
        open_input(b"\x00" * 64)


def test_wav_seek(tmp_path):
    import struct
    import numpy as np
    from ffmpeg_tpu.io import open_input
    sr, n = 8000, 8000
    samples = np.arange(n, dtype="<i2")
    pcm = samples.tobytes()
    hdr = (b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVEfmt "
           + struct.pack("<IHHIIHH", 16, 1, 1, sr, sr * 2, 2, 16)
           + b"data" + struct.pack("<I", len(pcm)))
    p = tmp_path / "s.wav"
    p.write_bytes(hdr + pcm)
    d = open_input(str(p))
    d.seek(0, 4000)
    pkt = d.read_packet()
    assert pkt.pts == 4000
    first = np.frombuffer(pkt.data[:2], "<i2")[0]
    assert first == 4000
    # seek back
    d.seek(0, 100)
    pkt = d.read_packet()
    assert pkt.pts == 100
    assert np.frombuffer(pkt.data[:2], "<i2")[0] == 100


def test_avi_seek(tmp_path):
    import subprocess
    import refutil
    import pytest
    if not refutil.REF.exists():
        pytest.skip("reference not built")
    from ffmpeg_tpu.io import open_input
    p = tmp_path / "s.avi"
    subprocess.run([str(refutil.REF), "-v", "error", "-f", "lavfi",
                    "-i", "testsrc2=size=96x64:rate=10", "-frames:v", "20",
                    "-c:v", "mjpeg", "-q:v", "5", "-y", str(p)],
                   check=True, capture_output=True)
    d = open_input(str(p))
    d.seek(0, 12)
    pkt = d.read_packet()
    assert pkt.pts == 12          # mjpeg: every frame is a keyframe
    assert pkt.data[:2] == b"\xff\xd8"
    d.seek(0, 0)
    assert d.read_packet().pts == 0


@requires_ref
def test_generic_seek_matroska(tmp_path):
    """Formats without a dedicated seek handler use the generic
    read-based fallback (seek.c analog): land on the newest keyframe
    at-or-before the target and keep stream order intact."""
    import subprocess
    p = tmp_path / "g.mkv"
    subprocess.run([str(refutil.REF), "-v", "error", "-f", "lavfi",
                    "-i", "testsrc2=size=96x64:rate=10", "-t", "2",
                    "-c:v", "mjpeg", "-q:v", "5", "-pix_fmt", "yuvj420p",
                    "-y", str(p)], check=True, capture_output=True)
    d = open_input(str(p))
    tb = d.streams[0].time_base
    all_pts = [pkt.pts for pkt in d.packets()]
    assert len(all_pts) == 20
    # seek to 1.0s: every mjpeg frame is a keyframe, so the first packet
    # after the seek must be the one at exactly 1.0s
    target = int(1.0 * tb.den / tb.num)
    d.seek(0, target)
    pts = [pkt.pts for pkt in d.packets()]
    assert pts[0] <= target <= pts[0] + int(0.11 * tb.den / tb.num)
    assert pts == [p_ for p_ in all_pts if p_ >= pts[0]]
    d.close()
