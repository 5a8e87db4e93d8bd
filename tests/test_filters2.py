"""Tests for overlay/split/psnr/ssim/yadif/drawbox/fade filters and BSFs."""

import numpy as np
import pytest

from ffmpeg_tpu.core.frame import Frame
from ffmpeg_tpu.core.packet import Packet, PKT_FLAG_KEY
from ffmpeg_tpu.filters import FilterGraph, get_filter, parse_graph
from ffmpeg_tpu.utils.rational import Rational
from ffmpeg_tpu.codecs.bsf import get_bsf, bsf_names


def _frame(w=64, h=48, fmt="yuv420p", pts=0, fill=None, seed=0):
    from ffmpeg_tpu.formats import pixfmt
    from ffmpeg_tpu.core import imgutils
    d = pixfmt.get(fmt)
    rng = np.random.default_rng(seed + pts)
    comps = []
    for i, c in enumerate(d.comp):
        cw, ch = imgutils.component_dims(d, i, w, h)
        if fill is not None:
            comps.append(np.full((ch, cw), fill[i], d.component_dtype()))
        else:
            comps.append(rng.integers(0, 1 << c.depth, (ch, cw))
                         .astype(d.component_dtype()))
    return Frame.video(w, h, fmt, planes=comps, pts=pts,
                       time_base=Rational(1, 25))


def test_overlay_two_inputs():
    g = parse_graph("[in][ovl]overlay=8:8[out]")
    main = _frame(64, 48, fill=(100, 128, 128))
    over = _frame(16, 16, fill=(200, 100, 50))
    g.feed(main, "in")
    g.feed(over, "ovl")
    (out,) = g.pull("out")
    y = np.asarray(out.planes[0])
    assert y[0, 0] == 100
    assert y[10, 10] == 200
    assert y[30, 30] == 100
    u = np.asarray(out.planes[1])
    assert u[6, 6] == 100


def test_split_fanout():
    g = parse_graph("split[a][b]")
    f = _frame()
    g.feed(f, "in")
    assert len(g.pull("a")) == 1
    assert len(g.pull("b")) == 1


def test_psnr_identical_frames():
    g = parse_graph("[in][ref]psnr[out]")
    f = _frame(seed=1)
    g.feed(f, "in")
    g.feed(f.clone_props(), "ref")
    (out,) = g.pull("out")
    node = [n for n in g.nodes if n.filter.name == "psnr"][0]
    assert node.filter.scores[0] == float("inf")


def test_ssim_range():
    g = parse_graph("[in][ref]ssim[out]")
    a = _frame(seed=2)
    b = _frame(seed=3)
    g.feed(a, "in")
    g.feed(b, "ref")
    g.pull("out")
    node = [n for n in g.nodes if n.filter.name == "ssim"][0]
    assert -1.0 <= node.filter.scores[0] <= 1.0


def test_yadif_passes_kept_field():
    f = _frame(32, 32, seed=4)
    f.interlaced = True
    (out,) = parse_graph("yadif").run([f])
    y_in = np.asarray(f.planes[0])
    y_out = np.asarray(out.planes[0])
    # parity rows preserved
    np.testing.assert_array_equal(y_out[1::2], y_in[1::2])
    assert not out.interlaced


def test_drawbox():
    (out,) = parse_graph("drawbox=8:8:16:16:thickness=2").run(
        [_frame(fill=(60, 128, 128))])
    y = np.asarray(out.planes[0])
    assert y[8, 8] == 255       # border
    assert y[16, 16] == 60      # inside (past thickness)
    assert y[0, 0] == 60        # outside


def test_fade_in():
    g = parse_graph("fade=in:0:10")
    frames = [_frame(fill=(200, 128, 128), pts=i) for i in range(12)]
    out = g.run(frames)
    y0 = np.asarray(out[0].planes[0])[0, 0]
    y5 = np.asarray(out[5].planes[0])[0, 0]
    y11 = np.asarray(out[11].planes[0])[0, 0]
    assert y0 == 16 and y0 < y5 < y11 == 200


# ---------------- BSFs ------------------------------------------------------

def test_bsf_registry():
    for n in ("null", "h264_mp4toannexb", "extract_extradata", "noise",
              "chomp", "setts", "dump_extradata"):
        assert n in bsf_names()


def test_h264_mp4toannexb():
    from ffmpeg_tpu.io.stream import CodecParameters
    sps = b"\x67\x42\x00\x1e"
    pps = b"\x68\xce\x38\x80"
    avcc = (b"\x01\x42\x00\x1e\xff\xe1" + len(sps).to_bytes(2, "big") + sps
            + b"\x01" + len(pps).to_bytes(2, "big") + pps)
    par = CodecParameters(codec_id="h264", extradata=avcc)
    f = get_bsf("h264_mp4toannexb", par)
    idr = b"\x65\x88\x84\x00"
    payload = len(idr).to_bytes(4, "big") + idr
    (out,) = f.filter(Packet(data=payload, flags=PKT_FLAG_KEY))
    assert out.data.startswith(b"\x00\x00\x00\x01\x67")
    assert b"\x00\x00\x00\x01\x68" in out.data
    assert out.data.endswith(b"\x00\x00\x00\x01" + idr)


def test_noise_bsf_corrupts_deterministically():
    f1 = get_bsf("noise", amount=10, seed=42)
    f2 = get_bsf("noise", amount=10, seed=42)
    data = bytes(range(256)) * 4
    (a,) = f1.filter(Packet(data=data))
    (b,) = f2.filter(Packet(data=data))
    assert a.data == b.data
    assert a.data != data


def test_chomp():
    (out,) = get_bsf("chomp").filter(Packet(data=b"abc\x00\x00"))
    assert out.data == b"abc"


def test_amix():
    from ffmpeg_tpu.formats.channel_layout import STEREO
    x = np.ones((2, 64), np.float32) * 0.25
    f = Frame.audio(x, 48000, "flt", STEREO, pts=0,
                    time_base=Rational(1, 48000))
    g = parse_graph("[a][b]amix[out]")
    g.feed(f, "a")
    g.feed(f.clone_props(), "b")
    (o,) = g.pull("out")
    assert abs(float(o.audio_data[0, 0]) - 0.25) < 1e-6


def test_pan_stereo_to_mono():
    from ffmpeg_tpu.formats.channel_layout import STEREO
    x = np.stack([np.full(32, 0.5, np.float32), np.full(32, -0.1, np.float32)])
    f = Frame.audio(x, 48000, "flt", STEREO, pts=0,
                    time_base=Rational(1, 48000))
    (o,) = parse_graph("pan=1:0.5:0.5").run([f])
    assert o.audio_data.shape[0] == 1
    assert abs(float(o.audio_data[0, 0]) - 0.2) < 1e-6


def test_channelsplit():
    from ffmpeg_tpu.formats.channel_layout import STEREO
    x = np.stack([np.full(16, 0.3, np.float32), np.full(16, -0.3, np.float32)])
    f = Frame.audio(x, 48000, "flt", STEREO, pts=0,
                    time_base=Rational(1, 48000))
    from ffmpeg_tpu.filters import get_filter
    outs = get_filter("channelsplit")().process(f)
    assert len(outs) == 2
    assert outs[0].side_data["channel"] == 0
    assert float(outs[1].audio_data[0, 0]) == np.float32(-0.3)


def test_frame_audio_import():
    pass
