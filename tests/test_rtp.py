"""RTP/SDP/RTSP ingest tests: the reference ffmpeg streams to us over
loopback (UDP RTP sessions described by SDP, and TCP-interleaved
RECORD-mode RTSP) and the depacketized payloads must match the
original packets."""

import socket
import subprocess
import threading
import time

import numpy as np
import pytest

import refutil
from conftest import requires_ref

from ffmpeg_tpu.io.demux import open_input


def _free_port(kind=socket.SOCK_DGRAM):
    s = socket.socket(socket.AF_INET, kind)
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _make_media(tmp_path, acodec="mp2", vcodec="mpeg2video"):
    f = tmp_path / "src.ts"
    subprocess.run(
        [str(refutil.REF), "-v", "error",
         "-f", "lavfi", "-i", "testsrc2=size=192x128:rate=25",
         "-f", "lavfi", "-i", "sine=frequency=440:sample_rate=48000",
         "-frames:v", "30", "-c:v", vcodec, "-q:v", "5",
         "-c:a", acodec, "-b:a", "128k", str(f)], check=True)
    return f


def _send_rtp(src, port, args=("-f", "rtp"), select="0:v:0",
              fmt_args=()):
    """Stream one elementary stream via RTP; returns the SDP text."""
    out = subprocess.run(
        [str(refutil.REF), "-v", "error", "-re", "-i", str(src),
         "-map", select, "-c", "copy", *fmt_args, *args,
         f"rtp://127.0.0.1:{port}"],
        capture_output=True, text=True, timeout=120)
    return out


def _spawn(fn, *a, **kw):
    t = threading.Thread(target=fn, args=a, kwargs=kw, daemon=True)
    t.start()
    return t


def _collect(url, out, **opts):
    try:
        d = open_input(url, **opts)
        pkts = []
        while True:
            try:
                pkts.append(d.read_packet())
            except Exception:
                break
        out["streams"] = [s.codecpar.codec_id for s in d.streams]
        out["pkts"] = pkts
    except Exception as e:
        out["error"] = e


def _ref_packets(src, select):
    """Reference packet payload sizes+crc via -c copy framecrc."""
    out = subprocess.run(
        [str(refutil.REF), "-v", "error", "-i", str(src), "-map",
         select, "-c", "copy", "-f", "framecrc", "-"],
        check=True, capture_output=True, text=True).stdout
    rows = []
    for line in out.splitlines():
        if line.startswith("0,"):
            f = [x.strip() for x in line.split(",")]
            rows.append((int(f[4]), f[5].split()[0]))
    return rows


def _crc(data):
    import zlib
    return f"0x{zlib.adler32(bytes(data)) & 0xFFFFFFFF:08x}"


@requires_ref
def test_rtp_mpa(tmp_path):
    """MPEG audio over RTP (RFC 2250 payload 14)."""
    src = _make_media(tmp_path)
    port = _free_port()
    sdp = tmp_path / "s.sdp"
    # grab the SDP first without streaming
    subprocess.run(
        [str(refutil.REF), "-v", "error", "-i", str(src), "-map",
         "0:a:0", "-c", "copy", "-t", "0.04", "-f", "rtp",
         "-sdp_file", str(sdp), f"rtp://127.0.0.1:{_free_port()}"],
        check=True, capture_output=True)
    res = {}
    t = _spawn(_collect, str(sdp), res, listen_timeout=15.0)
    # rewrite the SDP port to our listening port... instead stream to
    # the port in the SDP
    txt = sdp.read_text()
    port = [int(l.split()[1]) for l in txt.splitlines()
            if l.startswith("m=")][0]
    time.sleep(1.0)
    _send_rtp(src, port, select="0:a:0")
    t.join(timeout=60)
    assert "error" not in res, res.get("error")
    assert res["streams"] == ["mp3"]
    want = _ref_payload_cat(src, "0:a:0", tmp_path)
    got = b"".join(bytes(p.data) for p in res["pkts"])
    # the reference sender may drop trailing frames at EOF flush
    assert len(got) >= len(want) * 8 // 10
    assert got == want[:len(got)]


def _ref_payload_cat(src, select, tmp_path):
    """Concatenated elementary-stream payload via our own demuxer
    (packet-exact vs the reference per the mpegts tests)."""
    want_audio = ":a:" in select
    d = open_input(str(src))
    idx = [i for i, s in enumerate(d.streams)
           if (s.codecpar.codec_type == "audio") == want_audio]
    out = bytearray()
    for p in _drain(d):
        if p.stream_index in idx:
            out += bytes(p.data)
    return bytes(out)


@requires_ref
def test_rtp_mpv(tmp_path):
    """MPEG video over RTP (RFC 2250 payload 32): reassembled frames
    decode identically to the source."""
    src = _make_media(tmp_path)
    sdp = tmp_path / "s.sdp"
    subprocess.run(
        [str(refutil.REF), "-v", "error", "-i", str(src), "-map",
         "0:v:0", "-c", "copy", "-t", "0.04", "-f", "rtp",
         "-sdp_file", str(sdp), f"rtp://127.0.0.1:{_free_port()}"],
        check=True, capture_output=True)
    res = {}
    t = _spawn(_collect, str(sdp), res, listen_timeout=15.0)
    txt = sdp.read_text()
    port = [int(l.split()[1]) for l in txt.splitlines()
            if l.startswith("m=")][0]
    time.sleep(1.0)
    _send_rtp(src, port, select="0:v:0")
    t.join(timeout=120)
    assert "error" not in res, res.get("error")
    assert res["streams"] == ["mpeg2video"]
    # frame payloads equal the demuxed source packets (prefix: the
    # sender may drop trailing frames at EOF)
    want = _src_video_packets(src)
    got = [bytes(p.data) for p in res["pkts"]]
    assert len(got) >= len(want) * 8 // 10
    assert got == want[:len(got)]


def _src_video_packets(src):
    d = open_input(str(src))
    vidx = [i for i, st in enumerate(d.streams)
            if st.codecpar.codec_type == "video"][0]
    return [bytes(p.data) for p in _drain(d)
            if p.stream_index == vidx]


@requires_ref
def test_rtp_h264(tmp_path):
    """H.264 over RTP (RFC 6184): NAL reassembly across FU-A/STAP-A."""
    from test_h264 import craft_i16x16_residual
    h264 = tmp_path / "s.h264"
    h264.write_bytes(craft_i16x16_residual(mb_w=8, mb_h=6))
    sdp = tmp_path / "s.sdp"
    subprocess.run(
        [str(refutil.REF), "-v", "error", "-i", str(h264), "-c",
         "copy", "-t", "0.04", "-f", "rtp", "-sdp_file", str(sdp),
         f"rtp://127.0.0.1:{_free_port()}"],
        check=True, capture_output=True)
    res = {}
    t = _spawn(_collect, str(sdp), res, listen_timeout=15.0)
    txt = sdp.read_text()
    port = [int(l.split()[1]) for l in txt.splitlines()
            if l.startswith("m=")][0]
    time.sleep(1.0)
    _send_rtp(h264, port)
    t.join(timeout=120)
    assert "error" not in res, res.get("error")
    assert res["streams"] == ["h264"]
    # decode both through our stack: the RTP AUs must reproduce the
    # same frames as the file
    from ffmpeg_tpu.codecs import CodecContext
    d = open_input(str(h264))
    dec = CodecContext.open_decoder(d.streams[0].codecpar)
    ref_frames = dec.decode_all(list(_drain(d)))
    dec2 = CodecContext.open_decoder(res["pkts"] and
                                     _h264_par(res))
    rtp_frames = dec2.decode_all(res["pkts"])
    assert len(rtp_frames) == len(ref_frames)
    for a, b in zip(rtp_frames, ref_frames):
        for pa, pb in zip(a.planes, b.planes):
            np.testing.assert_array_equal(np.asarray(pa),
                                          np.asarray(pb))


def _h264_par(res):
    from ffmpeg_tpu.io.stream import CodecParameters, MediaType
    return CodecParameters(codec_type=MediaType.VIDEO,
                           codec_id="h264")


def _drain(d):
    while True:
        try:
            yield d.read_packet()
        except Exception:
            return


@requires_ref
def test_rtp_mpegts(tmp_path):
    """Full transport stream over RTP (payload 33, rtp_mpegts)."""
    src = _make_media(tmp_path)
    port = _free_port()
    sdp = tmp_path / "s.sdp"
    sdp.write_text("v=0\r\no=- 0 0 IN IP4 127.0.0.1\r\n"
                   "s=No Name\r\nc=IN IP4 127.0.0.1\r\nt=0 0\r\n"
                   f"m=video {port} RTP/AVP 33\r\n")
    res = {}
    t = _spawn(_collect, str(sdp), res, listen_timeout=15.0)
    time.sleep(1.0)
    subprocess.run(
        [str(refutil.REF), "-v", "error", "-re", "-i", str(src),
         "-c", "copy", "-f", "rtp_mpegts",
         f"rtp://127.0.0.1:{port}"],
        check=True, capture_output=True, timeout=120)
    t.join(timeout=60)
    assert "error" not in res, res.get("error")
    assert sorted(res["streams"]) == ["mp3", "mpeg2video"]
    vids = [p for p in res["pkts"]
            if res["streams"][p.stream_index] == "mpeg2video"]
    want = _src_video_packets(src)
    got = [bytes(p.data) for p in vids]
    assert len(got) >= len(want) * 8 // 10
    assert got == want[:len(got)]


@requires_ref
def test_rtsp_record(tmp_path):
    """RECORD-mode RTSP server: the reference publishes over
    TCP-interleaved RTSP; we accept and depacketize."""
    src = _make_media(tmp_path)
    port = _free_port(socket.SOCK_STREAM)
    res = {}
    t = _spawn(_collect, f"rtsp://127.0.0.1:{port}/live", res,
               listen_timeout=20.0)
    time.sleep(1.0)
    subprocess.run(
        [str(refutil.REF), "-v", "error", "-re", "-i", str(src),
         "-map", "0:a:0", "-c", "copy", "-rtsp_transport", "tcp",
         "-f", "rtsp", f"rtsp://127.0.0.1:{port}/live"],
        check=True, capture_output=True, timeout=120)
    t.join(timeout=60)
    assert "error" not in res, res.get("error")
    assert res["streams"] == ["mp3"]
    want = _ref_payload_cat(src, "0:a:0", tmp_path)
    got = b"".join(bytes(p.data) for p in res["pkts"])
    assert len(got) >= len(want) * 8 // 10
    assert got == want[:len(got)]
