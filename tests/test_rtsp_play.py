"""RTSP PLAY + RTP packetizer tests (rtspenc.c / rtsp.c / rtpenc.c
analogs): packetizer↔depacketizer loopback, our PLAY server ↔ our
PLAY client over loopback TCP, the REFERENCE rtsp client pulling from
our PLAY server, and our RECORD client pushing to the reference's
listen-mode server."""

import socket
import subprocess
import threading
import time

import numpy as np
import pytest

import refutil
from conftest import requires_ref

from ffmpeg_tpu.core.packet import Packet
from ffmpeg_tpu.io.demux import open_input
from ffmpeg_tpu.io.formats import rtpenc
from ffmpeg_tpu.io.formats.rtp import _RtpSession
from ffmpeg_tpu.io.mux import open_output
from ffmpeg_tpu.io.stream import CodecParameters, MediaType, StreamInfo
from ffmpeg_tpu.utils.rational import Rational


def _free_port():
    s = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _spawn(fn, *a, **kw):
    t = threading.Thread(target=fn, args=a, kwargs=kw, daemon=True)
    t.start()
    return t


def _mp3_frames(n=20):
    """Deterministic fake mp3-sized payload frames."""
    rng = np.random.default_rng(7)
    return [bytes(rng.integers(0, 255, 417, dtype=np.uint8))
            for _ in range(n)]


def test_packetizer_loopback_h264():
    st = StreamInfo(index=0, codecpar=CodecParameters(
        codec_type=MediaType.VIDEO, codec_id="h264"),
        time_base=Rational(1, 90000))
    pay = rtpenc.make_pay(st, 0)
    rng = np.random.default_rng(1)
    aus = []
    for _ in range(3):
        nal1 = bytes([0x67]) + bytes(rng.integers(1, 255, 20,
                                                  dtype=np.uint8))
        nal2 = bytes([0x65]) + bytes(rng.integers(1, 255, 4000,
                                                  dtype=np.uint8))
        aus.append(b"\x00\x00\x00\x01" + nal1 + b"\x00\x00\x01" + nal2)
    media = {"type": "video", "pt": 96, "enc": "H264", "clock": 90000,
             "channels": 1, "fmtp": {}, "dest": None}
    sess = _RtpSession(media)
    got = []
    for i, au in enumerate(aus):
        for rp in pay.packets(Packet(data=au, pts=i * 3600,
                                     stream_index=0,
                                     time_base=Rational(1, 90000))):
            got.extend(sess.packets(rp, 0, Rational(1, 90000)))
    assert len(got) == 3
    for au, p in zip(aus, got):
        assert rtpenc._split_annexb(au) == \
            rtpenc._split_annexb(bytes(p.data))


def test_packetizer_loopback_aac():
    st = StreamInfo(index=0, codecpar=CodecParameters(
        codec_type=MediaType.AUDIO, codec_id="aac", sample_rate=48000,
        extradata=b"\x11\x90"), time_base=Rational(1, 48000))
    pay = rtpenc.make_pay(st, 1)
    media = {"type": "audio", "pt": 97, "enc": "MPEG4-GENERIC",
             "clock": 48000, "channels": 2,
             "fmtp": {"sizelength": "13", "indexlength": "3"},
             "dest": None}
    sess = _RtpSession(media)
    rng = np.random.default_rng(3)
    frames = [bytes(rng.integers(0, 255, n, dtype=np.uint8))
              for n in (211, 340, 12)]
    got = []
    for i, f in enumerate(frames):
        for rp in pay.packets(Packet(data=f, pts=i * 1024,
                                     stream_index=0,
                                     time_base=Rational(1, 48000))):
            got.extend(sess.packets(rp, 0, Rational(1, 48000)))
    assert [bytes(p.data) for p in got] == frames


def _size_crc(framecrc_text):
    """framecrc rows → [(size, crc)] (timestamps differ per transport)."""
    rows = []
    for line in framecrc_text.splitlines():
        if line.startswith("0,"):
            f = [x.strip() for x in line.split(",")]
            rows.append((int(f[4]), f[5].split()[0].lower()))
    return rows


def _frame_crc(data: bytes):
    import zlib
    return (len(data), f"0x{zlib.adler32(data):08x}")


def _serve(url, frames, err):
    try:
        m = open_output(url, format="rtsp", listen=True, timeout=20.0)
        m.add_stream(CodecParameters(codec_type=MediaType.AUDIO,
                                     codec_id="mp3"),
                     time_base=Rational(1, 90000))
        for i, f in enumerate(frames):
            m.write_packet(Packet(data=f, pts=i * 2351, dts=i * 2351,
                                  stream_index=0,
                                  time_base=Rational(1, 90000)))
        m.write_trailer()
        m.close()
    except Exception as e:          # noqa: BLE001
        err["server"] = e


def test_play_loopback():
    """Our PLAY server ↔ our PLAY client over loopback TCP."""
    port = _free_port()
    url = f"rtsp://127.0.0.1:{port}/live"
    frames = _mp3_frames()
    err = {}
    t = _spawn(_serve, url, frames, err)
    time.sleep(0.5)
    d = open_input(url, listen_timeout=20.0)
    assert [s.codecpar.codec_id for s in d.streams] == ["mp3"]
    got = []
    while True:
        try:
            got.append(d.read_packet())
        except Exception:
            break
    t.join(timeout=30)
    assert "server" not in err, err.get("server")
    assert [bytes(p.data) for p in got] == frames
    assert got[1].pts == 2351


def _real_mp2_frames(tmp_path, n=25):
    src = tmp_path / "src.mp2"
    subprocess.run(
        [str(refutil.REF), "-v", "error", "-f", "lavfi", "-i",
         "sine=frequency=440:sample_rate=48000", "-t", "0.7",
         "-c:a", "mp2", "-b:a", "128k", "-f", "mp2", "-y", str(src)],
        check=True)
    d = open_input(str(src))
    frames = []
    while len(frames) < n:
        try:
            frames.append(bytes(d.read_packet().data))
        except Exception:
            break
    assert frames
    return frames


@requires_ref
def test_reference_client_pulls_from_our_play_server(tmp_path):
    """The reference rtsp demuxer (PLAY client) consumes our PLAY
    server's TCP-interleaved stream; payloads must match."""
    port = _free_port()
    url = f"rtsp://127.0.0.1:{port}/live"
    frames = _real_mp2_frames(tmp_path)
    err = {}
    t = _spawn(_serve, url, frames, err)
    time.sleep(0.5)
    out = subprocess.run(
        [str(refutil.REF), "-v", "error", "-rtsp_transport", "tcp",
         "-i", url, "-map", "0:a:0", "-c", "copy", "-f", "framecrc",
         "-"],
        capture_output=True, timeout=120, text=True)
    t.join(timeout=30)
    assert "server" not in err, err.get("server")
    assert out.returncode == 0, out.stderr[:800]
    got = _size_crc(out.stdout)
    want = [_frame_crc(f) for f in frames]
    assert len(got) >= len(want) * 8 // 10
    assert got == want[:len(got)]


@requires_ref
def test_our_record_client_pushes_to_reference_listener(tmp_path):
    """Our RECORD client (rtspenc.c analog) publishes to the
    reference's `-rtsp_flags listen` server."""
    port = _free_port()
    url = f"rtsp://127.0.0.1:{port}/pub"
    frames = _real_mp2_frames(tmp_path)
    outfile = tmp_path / "got.mp3"
    proc = subprocess.Popen(
        [str(refutil.REF), "-v", "error", "-rtsp_flags", "listen",
         "-i", url, "-map", "0:a:0", "-c", "copy", "-f", "framecrc",
         "-y", str(outfile)],
        stderr=subprocess.PIPE)
    time.sleep(1.0)
    m = open_output(url, format="rtsp", timeout=20.0)
    m.add_stream(CodecParameters(codec_type=MediaType.AUDIO,
                                 codec_id="mp3"),
                 time_base=Rational(1, 90000))
    for i, f in enumerate(frames):
        m.write_packet(Packet(data=f, pts=i * 2351, dts=i * 2351,
                              stream_index=0,
                              time_base=Rational(1, 90000)))
    m.write_trailer()
    m.close()
    try:
        proc.wait(timeout=30)
    except subprocess.TimeoutExpired:
        proc.kill()
        proc.wait()
    got = _size_crc(outfile.read_text()) if outfile.exists() else []
    want = [_frame_crc(f) for f in frames]
    assert len(got) >= len(want) * 8 // 10, (len(got), len(want))
    assert got == want[:len(got)]
