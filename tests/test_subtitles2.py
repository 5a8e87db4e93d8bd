"""mov_text (tx3g) and PGS subtitle codec tests."""

import struct
import subprocess

import numpy as np
import pytest

import refutil
from conftest import requires_ref

from ffmpeg_tpu.codecs import CodecContext
from ffmpeg_tpu.codecs.subtitles2 import decode_pgs_rle
from ffmpeg_tpu.core.frame import Frame
from ffmpeg_tpu.core.packet import Packet
from ffmpeg_tpu.io.demux import open_input
from ffmpeg_tpu.io.stream import CodecParameters, MediaType


def _ref_has_movtext():
    if not refutil.REF.exists():
        return False
    out = subprocess.run([str(refutil.REF), "-v", "0", "-encoders"],
                         capture_output=True).stdout
    return b" mov_text " in out


def _par(cid):
    return CodecParameters(codec_type=MediaType.SUBTITLE,
                           codec_id=cid)


# ----------------------------------------------------------- mov_text
def test_movtext_roundtrip():
    enc = CodecContext.open_encoder(_par("mov_text"))
    f = Frame(pts=0)
    f.side_data["text"] = "Héllo wörld\nsecond"
    pkt = enc.codec.encode(f)[0]
    assert pkt.data[:2] == struct.pack(">H", len(
        "Héllo wörld\nsecond".encode()))
    dec = CodecContext.open_decoder(_par("mov_text"))
    out = dec.codec.decode(pkt)
    assert out[0].side_data["text"] == "Héllo wörld\nsecond"


def test_movtext_styl_box():
    text = "bold text".encode()
    styl = struct.pack(">H", 1) + struct.pack(
        ">HHHBB4B", 0, 4, 1, 1, 18, 255, 255, 255, 255)
    box = struct.pack(">I4s", 8 + len(styl), b"styl") + styl
    data = struct.pack(">H", len(text)) + text + box
    dec = CodecContext.open_decoder(_par("mov_text"))
    out = dec.codec.decode(Packet(data=data, pts=0))
    assert out[0].side_data["text"] == "bold text"
    st = out[0].side_data["styles"][0]
    assert st["bold"] and not st["italic"]
    assert r"\b1" in out[0].side_data["ass"]


@requires_ref
@pytest.mark.skipif(not _ref_has_movtext(),
                    reason="reference lacks mov_text encoder")
def test_movtext_from_reference_mp4(tmp_path):
    srt = tmp_path / "t.srt"
    srt.write_text("1\n00:00:01,000 --> 00:00:03,000\n"
                   "Hello world\n\n"
                   "2\n00:00:04,000 --> 00:00:06,000\n"
                   "Second line\n")
    mp4 = tmp_path / "t.mp4"
    subprocess.run(
        [str(refutil.REF), "-v", "error", "-y", "-i", str(srt),
         "-c:s", "mov_text", str(mp4)], check=True)
    dmx = open_input(str(mp4))
    st = next(s for s in dmx.streams
              if s.codecpar.codec_type == MediaType.SUBTITLE)
    assert st.codecpar.codec_id == "mov_text"
    dec = CodecContext.open_decoder(st.codecpar)
    texts = []
    while True:
        try:
            pkt = dmx.read_packet()
        except Exception:
            break
        if pkt.stream_index != st.index:
            continue
        for f in dec.codec.decode(pkt):
            if f.side_data.get("text"):
                texts.append(f.side_data["text"])
    assert texts == ["Hello world", "Second line"]


# ---------------------------------------------------------------- PGS
def _seg(t, payload):
    return bytes([t]) + struct.pack(">H", len(payload)) + payload


def _rle_encode(idx):
    out = bytearray()
    _, w = idx.shape
    for row in idx:
        i = 0
        while i < w:
            c = int(row[i])
            run = 1
            while i + run < w and row[i + run] == c:
                run += 1
            if c != 0 and run <= 2:
                out += bytes([c]) * run
            elif c == 0:
                if run <= 63:
                    out += bytes([0, run])
                else:
                    out += bytes([0, 0x40 | (run >> 8), run & 0xFF])
            else:
                if run <= 63:
                    out += bytes([0, 0x80 | run, c])
                else:
                    out += bytes([0, 0xC0 | (run >> 8), run & 0xFF,
                                  c])
            i += run
        out += bytes([0, 0])
    return bytes(out)


def _craft_display_set(idx, x=100, y=200, canvas=(1920, 1080)):
    h, w = idx.shape
    rle = _rle_encode(idx)
    pres = struct.pack(">HHBHBBBB", canvas[0], canvas[1], 0x10, 1,
                       0x80, 0, 0, 1) + \
        struct.pack(">HBBHH", 1, 0, 0, x, y)
    pal = bytes([0, 0]) \
        + bytes([0, 16, 128, 128, 0]) \
        + bytes([1, 235, 128, 128, 255]) \
        + bytes([2, 81, 90, 240, 200])
    obj = struct.pack(">HBB", 1, 0, 0xC0) \
        + (len(rle) + 4).to_bytes(3, "big") \
        + struct.pack(">HH", w, h) + rle
    win = b"\x01\x00" + struct.pack(">HHHH", x, y, w, h)
    return _seg(0x16, pres) + _seg(0x14, pal) + _seg(0x15, obj) \
        + _seg(0x17, win) + _seg(0x80, b"")


def test_pgs_rle_roundtrip():
    rng = np.random.default_rng(1)
    idx = rng.integers(0, 3, (16, 40)).astype(np.uint8)
    assert np.array_equal(decode_pgs_rle(_rle_encode(idx), 40, 16),
                          idx)


def test_pgs_decode_display_set():
    rng = np.random.default_rng(0)
    idx = rng.integers(0, 3, (4, 8)).astype(np.uint8)
    data = _craft_display_set(idx)
    dec = CodecContext.open_decoder(_par("hdmv_pgs_subtitle"))
    frames = dec.decode_all([Packet(data=data, pts=90000)])
    assert len(frames) == 1
    r = frames[0].side_data["rects"][0]
    assert (r["x"], r["y"], r["w"], r["h"]) == (100, 200, 8, 4)
    assert np.array_equal(r["indices"], idx)
    # white/transparent palette entries decode as expected
    assert tuple(r["rgba"][idx == 1][0]) == (255, 255, 255, 255)
    assert tuple(r["rgba"][idx == 0][0]) == (0, 0, 0, 0)
    assert frames[0].side_data["canvas"] == (1920, 1080)


def test_pgs_fragmented_object():
    """Object RLE split across two OBJECT segments (sequence flag
    continuation)."""
    rng = np.random.default_rng(2)
    idx = rng.integers(0, 3, (8, 32)).astype(np.uint8)
    rle = _rle_encode(idx)
    half = len(rle) // 2
    pres = struct.pack(">HHBHBBBB", 1920, 1080, 0x10, 1, 0x80, 0,
                       0, 1) + struct.pack(">HBBHH", 1, 0, 0, 0, 0)
    pal = bytes([0, 0]) + bytes([1, 235, 128, 128, 255])
    obj1 = struct.pack(">HBB", 1, 0, 0x80) \
        + (len(rle) + 4).to_bytes(3, "big") \
        + struct.pack(">HH", 32, 8) + rle[:half]
    obj2 = struct.pack(">HBB", 1, 0, 0x00) + rle[half:]
    data = _seg(0x16, pres) + _seg(0x14, pal) + _seg(0x15, obj1) \
        + _seg(0x15, obj2) + _seg(0x80, b"")
    dec = CodecContext.open_decoder(_par("hdmv_pgs_subtitle"))
    frames = dec.decode_all([Packet(data=data, pts=0)])
    assert np.array_equal(frames[0].side_data["rects"][0]["indices"],
                          idx)
