"""RTMP loopback tests (rtmpproto.c scope): chunk stream, AMF0
command sequence, publish (client→server ingest) and play
(server→client) both carried as FLV."""

import struct
import threading

import numpy as np
import pytest

from ffmpeg_tpu.io import open_input
from ffmpeg_tpu.io.mux import open_output
from ffmpeg_tpu.io.rtmp import (MSG_AUDIO, MSG_VIDEO, RtmpServer,
                                amf_decode_all, amf_number, amf_object,
                                amf_string)
from ffmpeg_tpu.io.stream import CodecParameters, MediaType
from ffmpeg_tpu.core.packet import Packet, PKT_FLAG_KEY
from ffmpeg_tpu.formats.channel_layout import default_layout
from ffmpeg_tpu.utils.rational import Rational


def test_amf0_roundtrip():
    body = (amf_string("connect") + amf_number(1) +
            amf_object({"app": "live", "n": 2.5, "flag": True,
                        "nested": {"x": "y"}}))
    vals = amf_decode_all(body)
    assert vals[0] == "connect" and vals[1] == 1.0
    assert vals[2] == {"app": "live", "n": 2.5, "flag": True,
                       "nested": {"x": "y"}}


def _mjpeg_flv_packets(tmp_path, n=5):
    """Craft a tiny FLV in memory via our mjpeg encoder → flv muxer is
    overkill; instead use raw 'fake' codec payloads accepted by the flv
    muxer: we use pcm audio + no video to keep it codec-neutral."""
    return None


def _publish_session(tmp_path, url_app="live/stream"):
    srv = RtmpServer()
    got = []

    def run():
        mode = srv.accept()
        assert mode == "publish"
        while True:
            m = srv.recv_media()
            if m is None:
                break
            got.append(m)

    th = threading.Thread(target=run, daemon=True)
    th.start()
    return srv, got, th


def test_rtmp_publish_flv_mux(tmp_path):
    srv, got, th = _publish_session(tmp_path)
    url = f"rtmp://127.0.0.1:{srv.port}/live/stream"
    par = CodecParameters(codec_type=MediaType.AUDIO, codec_id="mp3",
                          sample_rate=44100, ch_layout=default_layout(2))
    mux = open_output(url, format="flv")
    mux.add_stream(par, time_base=Rational(1, 1000))
    mux.write_header()
    payloads = [bytes([0xFF, 0xFB, 0x90, 0x00]) + bytes([i]) * 40
                for i in range(6)]
    for i, p in enumerate(payloads):
        mux.write_packet(Packet(data=p, pts=i * 26, dts=i * 26,
                                stream_index=0, flags=PKT_FLAG_KEY,
                                time_base=Rational(1, 1000)))
    mux.write_trailer()
    mux.close()
    th.join(timeout=10)
    srv.close()
    assert srv.app == "live" and srv.stream == "stream"
    media = [(t, ts, pl) for (t, ts, pl) in got if t == MSG_AUDIO]
    assert len(media) == 6
    for i, (t, ts, pl) in enumerate(media):
        assert ts == i * 26
        assert pl[1:] == payloads[i]     # first byte = FLV audio tag hdr


def test_rtmp_play_demux(tmp_path):
    srv = RtmpServer()

    def run():
        mode = srv.accept()
        assert mode == "play"
        # hand-built FLV audio tag bodies: SoundFormat=2 (MP3) 44k st
        for i in range(4):
            body = bytes([0x2F]) + b"\xff\xfb\x90\x00" + bytes([i]) * 24
            srv.send_media(MSG_AUDIO, i * 26, body)
        srv.io.sock.close()

    th = threading.Thread(target=run, daemon=True)
    th.start()
    d = open_input(f"rtmp://127.0.0.1:{srv.port}/live/stream")
    assert d.name == "flv"
    st = d.streams[0]
    assert st.codecpar.codec_id == "mp3"
    pkts = list(d.packets())
    assert len(pkts) == 4
    for i, p in enumerate(pkts):
        assert bytes(p.data) == b"\xff\xfb\x90\x00" + bytes([i]) * 24
    th.join(timeout=10)
    srv.close()


def test_rtmp_large_message_chunking(tmp_path):
    """Payloads far larger than the chunk size must reassemble exactly."""
    srv, got, th = _publish_session(tmp_path)
    url = f"rtmp://127.0.0.1:{srv.port}/app/big"
    from ffmpeg_tpu.io.rtmp import RtmpClient
    cl = RtmpClient(url, publish=True)
    rng = np.random.default_rng(3)
    blobs = [rng.integers(0, 256, size=n, dtype=np.uint8).tobytes()
             for n in (100, 5000, 70000)]
    for i, b in enumerate(blobs):
        cl.send_media(MSG_VIDEO, 1000 * i + 7, b)
    cl.close()
    th.join(timeout=10)
    srv.close()
    vids = [(ts, pl) for (t, ts, pl) in got if t == MSG_VIDEO]
    assert [(1000 * i + 7, b) for i, b in enumerate(blobs)] == vids
