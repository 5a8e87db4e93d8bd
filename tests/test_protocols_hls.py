"""AES, HTTP/TCP protocols, and HLS demuxer tests."""

import http.server
import io
import os
import socket
import subprocess
import threading
import zlib

import numpy as np
import pytest

import refutil
from conftest import requires_ref

from ffmpeg_tpu.io import open_input
from ffmpeg_tpu.utils.aes import (AES, cbc_decrypt, cbc_encrypt, ctr_crypt)


# ---------------- AES -------------------------------------------------------

def test_aes_fips197_vectors():
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    assert AES(bytes(range(16))).encrypt_blocks(pt).hex() == \
        "69c4e0d86a7b0430d8cdb78070b4c55a"
    assert AES(bytes(range(24))).encrypt_blocks(pt).hex() == \
        "dda97ca4864cdfe06eaf70a0ec0d7191"
    assert AES(bytes(range(32))).encrypt_blocks(pt).hex() == \
        "8ea2b7ca516745bfeafc49904b496089"
    ct = AES(bytes(range(16))).encrypt_blocks(pt)
    assert AES(bytes(range(16))).decrypt_blocks(ct) == pt


def test_aes_cbc_nist_vector():
    key = bytes.fromhex("2b7e151628aed2a6abf7158809cf4f3c")
    iv = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    p1 = bytes.fromhex("6bc1bee22e409f96e93d7e117393172a")
    c1 = cbc_encrypt(key, iv, p1, add_padding=False)
    assert c1.hex() == "7649abac8119b246cee98e9b12e9197d"
    assert cbc_decrypt(key, iv, c1, strip_padding=False) == p1


def test_aes_ctr_nist_vector():
    key = bytes.fromhex("2b7e151628aed2a6abf7158809cf4f3c")
    iv = bytes.fromhex("f0f1f2f3f4f5f6f7f8f9fafbfcfdfeff")
    p1 = bytes.fromhex("6bc1bee22e409f96e93d7e117393172a")
    assert ctr_crypt(key, iv, p1).hex() == \
        "874d6191b620e3261bef6864990db6ce"
    assert ctr_crypt(key, iv, ctr_crypt(key, iv, b"hello world")) == \
        b"hello world"


def test_cbc_padding_roundtrip():
    key, iv = bytes(16), bytes(16)
    for n in (0, 1, 15, 16, 17, 100):
        data = os.urandom(n)
        assert cbc_decrypt(key, iv, cbc_encrypt(key, iv, data)) == data


# ---------------- HTTP protocol ---------------------------------------------

@pytest.fixture
def http_root(tmp_path):
    handler = lambda *a, **kw: http.server.SimpleHTTPRequestHandler(
        *a, directory=str(tmp_path), **kw)
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield tmp_path, f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_http_read(http_root):
    root, base = http_root
    (root / "hello.txt").write_bytes(b"payload-123" * 100)
    from ffmpeg_tpu.io import avio
    r = avio.open_read(f"{base}/hello.txt")
    assert r.read(11) == b"payload-123"
    rest = r.read_exact(11 * 99)
    assert rest == b"payload-123" * 99
    r.close()


def test_http_demux_wav(http_root):
    root, base = http_root
    refutil_make_wav(root / "a.wav")
    d = open_input(f"{base}/a.wav")
    assert d.streams[0].codecpar.codec_id == "pcm_s16le"
    total = sum(len(p.data) for p in d.packets())
    assert total == 1600 * 2
    d.close()


def refutil_make_wav(path, sr=8000, n=1600):
    import struct
    pcm = (np.sin(np.arange(n) * 0.05) * 9000).astype("<i2").tobytes()
    hdr = (b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVEfmt "
           + struct.pack("<IHHIIHH", 16, 1, 1, sr, sr * 2, 2, 16)
           + b"data" + struct.pack("<I", len(pcm)))
    path.write_bytes(hdr + pcm)


def test_http_seek_on_range_ignoring_server():
    """A server that advertises Accept-Ranges but answers 200 to Range
    requests must not corrupt post-seek reads (http.c full-resource
    fallback: skip to the offset)."""
    body = bytes(range(256)) * 8

    class H(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            self.send_response(200)
            self.send_header("Accept-Ranges", "bytes")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        from ffmpeg_tpu.io.protocols import HttpStream
        s = HttpStream(f"http://127.0.0.1:{srv.server_address[1]}/x")
        assert s.read(16) == body[:16]
        s.seek(1000)
        assert s.read(32) == body[1000:1032]
        assert s.size == len(body)
        s.close()
    finally:
        srv.shutdown()


def test_http_relative_redirect():
    body = b"redirected-content" * 10

    class H(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            if self.path == "/start":
                self.send_response(302)
                self.send_header("Location", "/real/file.bin")
                self.send_header("Content-Length", "0")
                self.end_headers()
            else:
                assert self.path == "/real/file.bin"
                self.send_response(200)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        from ffmpeg_tpu.io.protocols import HttpStream
        s = HttpStream(f"http://127.0.0.1:{srv.server_address[1]}/start")
        assert s.read(-1) == body
        s.close()
    finally:
        srv.shutdown()


def test_udp_protocol():
    from ffmpeg_tpu.io.protocols import UdpStream
    rx = UdpStream("udp://127.0.0.1:0")        # port 0: pick free port
    port = rx._s.getsockname()[1]
    tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    tx.sendto(b"datagram-one", ("127.0.0.1", port))
    tx.sendto(b"datagram-two", ("127.0.0.1", port))
    assert rx.read(-1) == b"datagram-one"
    assert rx.read(8) == b"datagram"
    assert rx.read(-1) == b"-two"
    rx.close()
    tx.close()


def test_tls_protocol(tmp_path):
    import ssl
    import subprocess as sp
    key, crt = tmp_path / "k.pem", tmp_path / "c.pem"
    sp.run(["openssl", "req", "-x509", "-newkey", "rsa:2048",
            "-keyout", str(key), "-out", str(crt), "-days", "1",
            "-nodes", "-subj", "/CN=localhost"],
           check=True, capture_output=True)
    ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
    ctx.load_cert_chain(str(crt), str(key))
    srv = socket.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]

    def serve():
        conn, _ = srv.accept()
        tls = ctx.wrap_socket(conn, server_side=True)
        tls.sendall(b"secret payload over tls")
        tls.close()
    t = threading.Thread(target=serve, daemon=True)
    t.start()
    from ffmpeg_tpu.io.protocols import open_tls
    s = open_tls(f"tls://127.0.0.1:{port}")
    assert s.read(-1) == b"secret payload over tls"
    s.close()
    srv.close()


def test_tcp_protocol():
    srv = socket.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]

    def serve():
        c, _ = srv.accept()
        c.sendall(b"streamed-bytes")
        c.close()

    t = threading.Thread(target=serve, daemon=True)
    t.start()
    from ffmpeg_tpu.io import avio
    r = avio.open_read(f"tcp://127.0.0.1:{port}")
    assert r.read(14) == b"streamed-bytes"
    r.close()
    srv.close()


# ---------------- HLS --------------------------------------------------------

@pytest.fixture
def ts_segments(tmp_path):
    """3 sequential MPEG-TS segments with continuous timestamps."""
    if not refutil.REF.exists():
        pytest.skip("reference not built")
    segs = []
    for i in range(3):
        p = tmp_path / f"seg{i}.ts"
        subprocess.run(
            [str(refutil.REF), "-v", "error", "-f", "lavfi",
             "-i", "testsrc2=size=128x96:rate=25", "-frames:v", "5",
             "-c:v", "mjpeg", "-q:v", "5",
             "-output_ts_offset", str(i * 0.2),
             "-muxdelay", "0", "-y", str(p)],
            check=True, capture_output=True)
        segs.append(p)
    return segs


def _playlist(tmp_path, segs, key_lines=()):
    lines = ["#EXTM3U", "#EXT-X-VERSION:3", "#EXT-X-TARGETDURATION:1",
             "#EXT-X-MEDIA-SEQUENCE:0"]
    lines += list(key_lines)
    for s in segs:
        lines.append("#EXTINF:0.2,")
        lines.append(os.path.basename(s))
    lines.append("#EXT-X-ENDLIST")
    p = tmp_path / "pl.m3u8"
    p.write_text("\n".join(lines))
    return p


def _payloads(d):
    return [(p.stream_index, zlib.adler32(p.data, 0)) for p in d.packets()]


@requires_ref
def test_hls_plain(ts_segments, tmp_path):
    pl = _playlist(tmp_path, ts_segments)
    d = open_input(str(pl))
    assert d.name == "hls"
    got = _payloads(d)
    want = []
    for s in ts_segments:
        want += _payloads(open_input(str(s)))
    assert got == want
    assert len(got) >= 15


@requires_ref
def test_hls_aes128(ts_segments, tmp_path):
    key = os.urandom(16)
    (tmp_path / "k.bin").write_bytes(key)
    enc = []
    for i, s in enumerate(ts_segments):
        iv = i.to_bytes(16, "big")        # default IV = media sequence
        e = tmp_path / f"enc{i}.ts"
        e.write_bytes(cbc_encrypt(key, iv, s.read_bytes()))
        enc.append(e)
    pl = _playlist(tmp_path, enc,
                   key_lines=['#EXT-X-KEY:METHOD=AES-128,URI="k.bin"'])
    got = _payloads(open_input(str(pl)))
    want = []
    for s in ts_segments:
        want += _payloads(open_input(str(s)))
    assert got == want


@requires_ref
def test_hls_over_http_master_variant(ts_segments, tmp_path, http_root):
    root, base = http_root
    for s in ts_segments:
        (root / s.name).write_bytes(s.read_bytes())
    media = _playlist(root, ts_segments)
    master = root / "master.m3u8"
    master.write_text("#EXTM3U\n"
                      "#EXT-X-STREAM-INF:BANDWIDTH=100000\npl.m3u8\n")
    d = open_input(f"{base}/master.m3u8")
    got = _payloads(d)
    assert len(got) >= 15


@requires_ref
def test_hls_mux_roundtrip(ts_segments, tmp_path):
    """Transcode-free remux: packets → hls muxer → our hls demuxer."""
    from ffmpeg_tpu.io import open_output
    src = open_input(str(ts_segments[0]))
    out = tmp_path / "out" / "live.m3u8"
    out.parent.mkdir()
    m = open_output(str(out), format="hls")
    m.hls_time = 0.08          # force multiple segments (5 frames @25fps)
    for st in src.streams:
        m.add_stream(st.codecpar, time_base=st.time_base)
    pkts_in = []
    for p in src.packets():
        pkts_in.append(zlib.adler32(p.data, 0))
        m.write_packet(p)
    m.write_trailer()
    m.close()
    text = out.read_text()
    assert text.startswith("#EXTM3U") and "#EXT-X-ENDLIST" in text
    segs = [l for l in text.splitlines() if l and not l.startswith("#")]
    assert len(segs) >= 2      # actually segmented
    d = open_input(str(out))
    pkts_out = [zlib.adler32(p.data, 0) for p in d.packets()]
    assert pkts_out == pkts_in


@requires_ref
def test_reference_plays_our_hls(tmp_path):
    """Our hls muxer (real TS segments + playlist) must be playable by the
    reference. Uses mpeg2video: the reference cannot re-identify its own
    mjpeg-in-TS (stream_type 0x06 probes below threshold -> bin_data), so
    a properly-typed codec is the honest interop test."""
    from ffmpeg_tpu.io import open_output
    if b" hls " not in subprocess.run(
            [str(refutil.REF), "-hide_banner", "-demuxers"],
            capture_output=True).stdout:
        pytest.skip("reference build lacks hls demuxer")
    src_ts = tmp_path / "src.ts"
    subprocess.run(
        [str(refutil.REF), "-v", "error", "-f", "lavfi",
         "-i", "testsrc2=size=128x96:rate=25", "-frames:v", "10",
         "-c:v", "mpeg2video", "-g", "2", "-bf", "0", "-muxdelay", "0",
         "-y", str(src_ts)], check=True, capture_output=True)
    src = open_input(str(src_ts))
    out = tmp_path / "o" / "x.m3u8"
    out.parent.mkdir()
    m = open_output(str(out), format="hls")
    m.hls_time = 0.08
    for st in src.streams:
        m.add_stream(st.codecpar, time_base=st.time_base)
    for p in src.packets():
        m.write_packet(p)
    m.write_trailer()
    m.close()
    # reference must demux the playlist and decode every frame
    r = subprocess.run(
        [str(refutil.REF), "-v", "error", "-i", str(out),
         "-f", "framecrc", "-"], capture_output=True)
    assert r.returncode == 0, r.stderr.decode()
    assert len([l for l in r.stdout.splitlines()
                if l.startswith(b"0,")]) == 10
    # and the decoded pixels must match the straight-through file
    a = subprocess.run([str(refutil.REF), "-v", "error", "-i", str(out),
                        "-f", "md5", "-"], capture_output=True).stdout
    b = subprocess.run([str(refutil.REF), "-v", "error", "-i", str(src_ts),
                        "-f", "md5", "-"], capture_output=True).stdout
    assert a == b and a.startswith(b"MD5=")
