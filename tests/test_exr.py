"""OpenEXR decoder tests (libavcodec/exr.c scope). Streams are crafted
by an independent in-test writer implementing the spec's scanline
format (predictor + half-interleave + zlib/rle), so decode must invert
it exactly."""

import struct
import zlib

import numpy as np
import pytest

from ffmpeg_tpu.codecs import CodecContext
from ffmpeg_tpu.core.packet import Packet
from ffmpeg_tpu.io import open_input
from ffmpeg_tpu.io.stream import CodecParameters, MediaType
from ffmpeg_tpu.utils.error import NotSupported

MAGIC = b"\x76\x2f\x31\x01"


def _attr(name, atype, payload):
    return name.encode() + b"\x00" + atype.encode() + b"\x00" + \
        struct.pack("<i", len(payload)) + payload


def _chlist(channels):
    out = bytearray()
    for name, ptype in channels:
        out += name.encode() + b"\x00"
        out += struct.pack("<i", ptype)
        out += b"\x00" * 4                     # pLinear + reserved
        out += struct.pack("<ii", 1, 1)        # xSampling, ySampling
    out += b"\x00"
    return bytes(out)


def _forward_transform(data: bytes) -> bytes:
    """EXR compress-side reorder + predictor (inverse of decode)."""
    arr = np.frombuffer(data, np.uint8)
    n = len(arr)
    half = (n + 1) // 2
    re = np.empty(n, np.uint8)
    re[:half] = arr[0::2]
    re[half:] = arr[1::2]
    d = np.empty(n, np.uint8)
    d[0] = re[0]
    d[1:] = (np.diff(re.astype(np.int16)) + 128).astype(np.uint8)
    return d.tobytes()


def _rle_compress(data: bytes) -> bytes:
    """Simple conforming RLE: literal runs only (count 256-k)."""
    out = bytearray()
    i = 0
    while i < len(data):
        run = min(127, len(data) - i)
        out.append(256 - run)
        out += data[i:i + run]
        i += run
    return bytes(out)


def _write_exr(planes: dict, ptype=2, compression=0, line_order=0):
    """planes: {name: 2D float array}; ptype 1=half 2=float."""
    names = sorted(planes)
    h, w = planes[names[0]].shape
    channels = [(n, ptype) for n in names]
    hdr = bytearray(MAGIC + bytes([2, 0, 0, 0]))
    hdr += _attr("channels", "chlist", _chlist(channels))
    hdr += _attr("compression", "compression", bytes([compression]))
    box = struct.pack("<iiii", 0, 0, w - 1, h - 1)
    hdr += _attr("dataWindow", "box2i", box)
    hdr += _attr("displayWindow", "box2i", box)
    hdr += _attr("lineOrder", "lineOrder", bytes([line_order]))
    hdr += _attr("pixelAspectRatio", "float", struct.pack("<f", 1.0))
    hdr += _attr("screenWindowCenter", "v2f", struct.pack("<ff", 0, 0))
    hdr += _attr("screenWindowWidth", "float", struct.pack("<f", 1.0))
    hdr += b"\x00"
    lpb = 16 if compression == 3 else 1
    nblocks = (h + lpb - 1) // lpb
    blocks = []
    for bi in range(nblocks):
        y0 = bi * lpb
        nlines = min(lpb, h - y0)
        raw = bytearray()
        for li in range(nlines):
            yy = y0 + li
            for n in names:
                row = planes[n][yy]
                raw += row.astype("<f2" if ptype == 1 else "<f4").tobytes()
        raw = bytes(raw)
        if compression == 0:
            comp = raw
        elif compression == 1:
            comp = _rle_compress(_forward_transform(raw))
        else:
            comp = zlib.compress(_forward_transform(raw))
            if len(comp) >= len(raw):
                comp = raw                     # stored-raw fallback
        blocks.append((y0, comp))
    if line_order == 1:
        # DECREASING_Y only reorders blocks in the file; each header keeps
        # the block's real y coordinate.
        blocks.reverse()
    table_pos = len(hdr)
    out = bytearray(hdr)
    out += b"\x00" * (8 * nblocks)
    offsets = []
    for y0, comp in blocks:
        offsets.append(len(out))
        out += struct.pack("<ii", y0, len(comp)) + comp
    for i, off in enumerate(offsets):
        struct.pack_into("<Q", out, table_pos + 8 * i, off)
    return bytes(out)


def _decode(data):
    par = CodecParameters(codec_type=MediaType.VIDEO, codec_id="exr")
    ctx = CodecContext.open_decoder(par)
    return ctx.codec.decode(Packet(data=data, pts=0))[0]


def _rng_planes(names, h, w, seed=7):
    r = np.random.default_rng(seed)
    return {n: r.random((h, w), dtype=np.float32) for n in names}


@pytest.mark.parametrize("compression", [0, 2, 3])
def test_exr_rgb_float(compression):
    pl = _rng_planes("RGB", 21, 17)
    f = _decode(_write_exr(pl, ptype=2, compression=compression))
    assert f.format == "gbrpf32le" and f.width == 17 and f.height == 21
    for i, n in enumerate("RGB"):
        np.testing.assert_array_equal(np.asarray(f.planes[i]), pl[n])


def test_exr_rgba_half_zip():
    pl = _rng_planes("ABGR", 33, 9)
    half = {n: v.astype(np.float16).astype(np.float32)
            for n, v in pl.items()}
    f = _decode(_write_exr(pl, ptype=1, compression=3))
    assert f.format == "gbrapf32le"
    for i, n in enumerate("RGBA"):
        np.testing.assert_array_equal(np.asarray(f.planes[i]), half[n])


def test_exr_luminance_rle():
    pl = _rng_planes("Y", 13, 31)
    f = _decode(_write_exr(pl, ptype=2, compression=1))
    assert f.format == "grayf32le"
    np.testing.assert_array_equal(np.asarray(f.planes[0]), pl["Y"])


def test_exr_decreasing_line_order():
    pl = _rng_planes("RGB", 8, 8)
    f = _decode(_write_exr(pl, compression=0, line_order=1))
    for i, n in enumerate("RGB"):
        np.testing.assert_array_equal(np.asarray(f.planes[i]), pl[n])


def test_exr_piz_raises_notsupported():
    pl = _rng_planes("RGB", 4, 4)
    data = _write_exr(pl, compression=0)
    bad = data.replace(b"compression\x00compression\x00"
                       + struct.pack("<i", 1) + b"\x00",
                       b"compression\x00compression\x00"
                       + struct.pack("<i", 1) + b"\x04")
    with pytest.raises(NotSupported):
        _decode(bad)


def test_exr_demux_and_decode(tmp_path):
    pl = _rng_planes("RGB", 12, 10)
    p = str(tmp_path / "t.exr")
    with open(p, "wb") as f:
        f.write(_write_exr(pl, compression=3))
    d = open_input(p)
    assert d.streams[0].codecpar.codec_id == "exr"
    pkts = list(d.packets())
    assert len(pkts) == 1
    fr = _decode(bytes(pkts[0].data))
    np.testing.assert_array_equal(np.asarray(fr.planes[0]), pl["R"])
