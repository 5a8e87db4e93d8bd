"""MPEG-1/2 video decoder tests: differential vs the reference decoder
(float-IDCT tolerance; intra paths near-exact)."""

import subprocess

import numpy as np
import pytest

import refutil
from conftest import requires_ref

from ffmpeg_tpu.codecs import CodecContext
from ffmpeg_tpu.core.frame import Frame
from ffmpeg_tpu.core.packet import Packet
from ffmpeg_tpu.io import open_input
from ffmpeg_tpu.io.stream import CodecParameters, MediaType

W, H = 160, 120
FSZ = W * H * 3 // 2


def _make_ts(tmp_path, nframes, extra, codec="mpeg2video"):
    p = tmp_path / "v.ts"
    subprocess.run([str(refutil.REF), "-v", "error", "-f", "lavfi",
                    "-i", f"testsrc2=size={W}x{H}:rate=25",
                    "-frames:v", str(nframes), "-c:v", codec,
                    "-q:v", "4", *extra, "-pix_fmt", "yuv420p",
                    "-y", str(p)], check=True, capture_output=True)
    return p


def _decode_ours(ts):
    d = open_input(str(ts))
    es = b"".join(p.data for p in d.packets() if p.stream_index == 0)
    dec = CodecContext.open_decoder(CodecParameters(
        codec_type=MediaType.VIDEO, codec_id="mpeg2video"))
    return dec.decode_all([Packet(data=es, pts=0)])


def _decode_ref(ts):
    raw = subprocess.run(
        [str(refutil.REF), "-v", "error", "-i", str(ts),
         "-f", "rawvideo", "-"], check=True, capture_output=True).stdout
    return [Frame.from_bytes(raw[i * FSZ:(i + 1) * FSZ], "yuv420p", W, H)
            for i in range(len(raw) // FSZ)]


def _min_psnr(ours, refs):
    worst = 1e9
    for f, r in zip(ours, refs):
        for a, b in zip(f.numpy().planes, r.planes):
            worst = min(worst, refutil.psnr(a, b))
    return worst


@requires_ref
def test_mpeg2_intra_near_exact(tmp_path):
    ts = _make_ts(tmp_path, 3, ["-g", "1"])
    ours = _decode_ours(ts)
    refs = _decode_ref(ts)
    assert len(ours) == len(refs) == 3
    for f, r in zip(ours, refs):
        for a, b in zip(f.numpy().planes, r.planes):
            d = np.abs(np.asarray(a, np.int32) - np.asarray(b, np.int32))
            assert d.max() <= 1, d.max()


@requires_ref
def test_mpeg2_ip_gop(tmp_path):
    ts = _make_ts(tmp_path, 20, ["-g", "12", "-bf", "0"])
    ours = _decode_ours(ts)
    refs = _decode_ref(ts)
    assert len(ours) == len(refs) == 20
    assert _min_psnr(ours, refs) > 45


@requires_ref
def test_mpeg2_ipb_gop(tmp_path):
    ts = _make_ts(tmp_path, 12, ["-g", "12", "-bf", "2"])
    ours = _decode_ours(ts)
    refs = _decode_ref(ts)
    assert len(ours) == len(refs) == 12
    # frame order must match (display order with B reordering)
    assert [f.pict_type for f in ours[:4]] == ["I", "B", "B", "P"]
    assert _min_psnr(ours, refs) > 45


@requires_ref
def test_mpeg1_decode(tmp_path):
    p = tmp_path / "v.m1v"
    subprocess.run([str(refutil.REF), "-v", "error", "-f", "lavfi",
                    "-i", f"testsrc2=size={W}x{H}:rate=25",
                    "-frames:v", "10", "-c:v", "mpeg1video", "-q:v", "4",
                    "-g", "5", "-bf", "0", "-pix_fmt", "yuv420p",
                    "-f", "mpeg1video", "-y", str(p)],
                   check=True, capture_output=True)
    d = open_input(str(p))   # probed via the 00 00 01 B3 sequence header
    assert d.name == "mpegvideo"
    pkts = list(d.packets())
    assert len(pkts) == 10
    dec = CodecContext.open_decoder(d.streams[0].codecpar)
    ours = dec.decode_all(iter(pkts))
    raw = subprocess.run(
        [str(refutil.REF), "-v", "error", "-f", "mpegvideo", "-i", str(p),
         "-f", "rawvideo", "-"], capture_output=True)
    if raw.returncode != 0:   # slim build may lack the raw mpegvideo demuxer
        assert len(ours) == 10
        return
    refs = [Frame.from_bytes(raw.stdout[i * FSZ:(i + 1) * FSZ], "yuv420p", W, H)
            for i in range(len(raw.stdout) // FSZ)]
    assert _min_psnr(ours, refs) > 40


@requires_ref
def test_mpeg1_truncated_slice_explodes(tmp_path):
    """A slice that aborts before its last MB must raise under
    err_detect=explode and conceal (not crash) otherwise
    (decode.c AV_EF_EXPLODE semantics)."""
    p = tmp_path / "v.m1v"
    subprocess.run([str(refutil.REF), "-v", "error", "-f", "lavfi",
                    "-i", f"testsrc2=size={W}x{H}:rate=25",
                    "-frames:v", "1", "-c:v", "mpeg1video", "-q:v", "4",
                    "-g", "5", "-bf", "0", "-pix_fmt", "yuv420p",
                    "-f", "mpeg1video", "-y", str(p)],
                   check=True, capture_output=True)
    d = open_input(str(p))
    par = d.streams[0].codecpar
    pkt = next(iter(d.packets()))
    cut = Packet(data=pkt.data[:len(pkt.data) // 2], pts=0)
    from ffmpeg_tpu.utils.error import InvalidData
    dec = CodecContext.open_decoder(par, options={"err_detect": "explode"})
    with pytest.raises(InvalidData):
        dec.decode_all([cut])
    dec2 = CodecContext.open_decoder(par)
    frames = dec2.decode_all([cut])     # concealed, no raise
    assert len(frames) == 1


@requires_ref
def test_mpeg2_interlaced_ip(tmp_path):
    """Interlaced coding tools in frame pictures: field motion (ilme)
    + interlaced DCT (ildct) + alternate scan, IP GOP."""
    ts = _make_ts(tmp_path, 16, ["-flags", "+ildct+ilme", "-bf", "0",
                                 "-g", "8", "-alternate_scan", "1"])
    ours = _decode_ours(ts)
    refs = _decode_ref(ts)
    assert len(ours) == len(refs) == 16
    assert _min_psnr(ours, refs) > 42


@requires_ref
def test_mpeg2_interlaced_ipb(tmp_path):
    """Interlaced tools with B frames (field bipred)."""
    ts = _make_ts(tmp_path, 12, ["-flags", "+ildct+ilme", "-bf", "2",
                                 "-g", "12"])
    ours = _decode_ours(ts)
    refs = _decode_ref(ts)
    assert len(ours) == len(refs) == 12
    assert _min_psnr(ours, refs) > 42
