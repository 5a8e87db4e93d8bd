"""Breadth-batch filter tests (video6/audio5) — differential against
the reference binary for the numeric filters, invariants for the
structural ones."""

import struct
import subprocess

import numpy as np
import pytest

import refutil
from conftest import requires_ref

from ffmpeg_tpu.core.frame import Frame
from ffmpeg_tpu.filters import get_filter

W, H = 32, 24
SR = 48000


def _yuv(seed=0):
    rng = np.random.default_rng(seed)
    return [rng.integers(0, 256, (H, W)).astype(np.uint8),
            rng.integers(0, 256, (H // 2, W // 2)).astype(np.uint8),
            rng.integers(0, 256, (H // 2, W // 2)).astype(np.uint8)]


def _gbrp(seed=1):
    rng = np.random.default_rng(seed)
    return [rng.integers(0, 256, (H, W)).astype(np.uint8)
            for _ in range(3)]


def _ref_vf(tmp_path, vf, planes, fmt):
    raw = tmp_path / "in.raw"
    raw.write_bytes(b"".join(p.tobytes() for p in planes))
    out = tmp_path / "out.raw"
    subprocess.run(
        [str(refutil.REF), "-v", "error", "-y", "-f", "rawvideo",
         "-pix_fmt", fmt, "-s", f"{W}x{H}", "-i", str(raw),
         "-vf", vf, "-f", "rawvideo", str(out)], check=True)
    return np.frombuffer(out.read_bytes(), np.uint8)


def _ours_vf(name, args, planes, fmt):
    f = get_filter(name)(args)
    fr = Frame.video(W, H, fmt, planes=[p.copy() for p in planes])
    res = f.process(fr) + f.process(None)
    return np.concatenate([np.asarray(p).ravel()
                           for p in res[0].planes])


@requires_ref
@pytest.mark.parametrize("name,args,fmt", [
    ("lutyuv", "y=negval:u=negval:v=val", "yuv420p"),
    ("lutyuv", "y=val*2:u=clipval:v=minval+val/2", "yuv420p"),
    ("lutrgb", "r=negval:g=val:b=maxval-val", "gbrp"),
    ("limiter", "min=30:max=200", "yuv420p"),
    ("dilation", "", "yuv420p"),
    ("erosion", "", "yuv420p"),
    ("inflate", "", "yuv420p"),
    ("deflate", "", "yuv420p"),
    ("median", "", "yuv420p"),
    ("sobel", "", "yuv420p"),
    ("prewitt", "", "yuv420p"),
    ("sobel", "scale=2:delta=10", "yuv420p"),
    ("fillborders",
     "left=4:right=4:top=2:bottom=2:mode=smear", "yuv420p"),
    ("fillborders",
     "left=4:right=4:top=2:bottom=2:mode=mirror", "yuv420p"),
    ("colorchannelmixer", "rr=0.5:rg=0.5:gg=1:bb=0.3:br=0.7",
     "gbrp"),
])
def test_video_filter_vs_reference(tmp_path, name, args, fmt):
    planes = _yuv() if fmt == "yuv420p" else _gbrp()
    want = _ref_vf(tmp_path, f"{name}={args}" if args else name,
                   planes, fmt)
    got = _ours_vf(name, args, planes, fmt)
    assert len(got) == len(want)
    d = np.abs(got.astype(int) - want.astype(int))
    # colorchannelmixer uses float rounding internally: allow +-1
    tol = 1 if name == "colorchannelmixer" else 0
    assert d.max() <= tol, f"maxerr {d.max()}"


def test_hstack_vstack_tile():
    a = _yuv(0)
    b = _yuv(5)
    fa = Frame.video(W, H, "yuv420p", planes=a)
    fb = Frame.video(W, H, "yuv420p", planes=b)
    hs = get_filter("hstack")("")
    hs.process(fa, pad=0)
    out = hs.process(fb, pad=1)[0]
    assert out.width == 2 * W and out.height == H
    assert np.array_equal(np.asarray(out.planes[0])[:, :W], a[0])
    assert np.array_equal(np.asarray(out.planes[0])[:, W:], b[0])
    vs = get_filter("vstack")("")
    vs.process(fa, pad=0)
    out = vs.process(fb, pad=1)[0]
    assert out.height == 2 * H
    tile = get_filter("tile")("2x2")
    outs = []
    for fr in (fa, fb, fa, fb):
        outs += tile.process(Frame.video(
            W, H, "yuv420p",
            planes=[np.asarray(p).copy() for p in fr.planes]))
    assert outs[0].width == 2 * W and outs[0].height == 2 * H


def test_shuffle_extract_planes():
    planes = _yuv(2)
    f = get_filter("shuffleplanes")("map0=2:map1=0:map2=1")
    out = f.process(Frame.video(W, H, "yuv444p",
                                planes=[p[:H, :W].copy()
                                        for p in [planes[0]] * 3]))
    y3 = [np.asarray(p) for p in out[0].planes]
    assert len(y3) == 3
    ex = get_filter("extractplanes")("y")
    fr = Frame.video(W, H, "yuv420p", planes=planes)
    outs = ex.process(fr)
    assert outs[0].format == "gray"
    assert np.array_equal(np.asarray(outs[0].planes[0]), planes[0])


def test_reverse_loop_tpad():
    frames = [Frame.video(W, H, "yuv420p", planes=_yuv(i), pts=i)
              for i in range(4)]
    rv = get_filter("reverse")("")
    for f in frames:
        rv.process(f)
    out = rv.process(None)
    assert [f.pts for f in out] == [0, 1, 2, 3]
    assert np.array_equal(np.asarray(out[0].planes[0]),
                          np.asarray(frames[3].planes[0]))
    lp = get_filter("loop")("loop=1:size=2:start=0")
    outs = []
    for f in frames[:3]:
        outs += lp.process(Frame.video(
            W, H, "yuv420p",
            planes=[np.asarray(p).copy() for p in f.planes],
            pts=f.pts))
    outs += lp.process(None)
    assert len(outs) == 5                    # 3 + window of 2
    tp = get_filter("tpad")("start=2:stop=1")
    outs = tp.process(frames[0])
    assert len(outs) == 3                    # 2 pad + 1 real
    assert float(np.asarray(outs[0].planes[0]).max()) == 0
    outs = tp.process(None)
    assert len(outs) == 1


def test_rotate_and_keying():
    planes = _yuv(3)
    rot = get_filter("rotate")("0")
    out = rot.process(Frame.video(W, H, "yuv420p",
                                  planes=planes))[0]
    np.testing.assert_array_equal(np.asarray(out.planes[0]),
                                  planes[0])
    ck = get_filter("chromakey")("color=lime:similarity=0.2")
    out = ck.process(Frame.video(W, H, "yuv420p",
                                 planes=_yuv(4)))[0]
    assert len(out.planes) == 4
    assert out.format == "yuva420p"


def test_masked_merge():
    base = [np.zeros((H, W), np.uint8)] * 3
    over = [np.full((H, W), 200, np.uint8)] * 3
    mask = [np.full((H, W), 255, np.uint8)] * 3
    mm = get_filter("maskedmerge")("")
    mm.process(Frame.video(W, H, "gbrp", planes=base), pad=0)
    mm.process(Frame.video(W, H, "gbrp", planes=over), pad=1)
    out = mm.process(Frame.video(W, H, "gbrp", planes=mask),
                     pad=2)[0]
    assert float(np.asarray(out.planes[0]).min()) == 200


@requires_ref
@pytest.mark.parametrize("iall,oall", [
    ("bt601-6-625", "bt709"),
    ("bt709", "bt2020"),
    ("smpte170m", "bt709"),
])
def test_colorspace_vs_reference(tmp_path, iall, oall):
    rng = np.random.default_rng(0)
    planes = [
        np.clip(rng.normal(128, 40, (H, W)), 20, 230)
        .astype(np.uint8),
        np.clip(rng.normal(128, 30, (H // 2, W // 2)), 20, 230)
        .astype(np.uint8),
        np.clip(rng.normal(128, 30, (H // 2, W // 2)), 20, 230)
        .astype(np.uint8)]
    want = _ref_vf(tmp_path,
                   f"colorspace=all={oall}:iall={iall}:"
                   "format=yuv420p", planes, "yuv420p")
    got = _ours_vf("colorspace", f"all={oall}:iall={iall}",
                   planes, "yuv420p")
    d = np.abs(got.astype(int) - want.astype(int))
    # our float chain vs the reference's 15-bit fixed point: 1 LSB
    assert d.max() <= 1


# --------------------------------------------------------------- audio
def _wav(tmp_path, x):
    pcm = (np.clip(x, -1, 1).T * 32767).astype(np.int16)
    d = pcm.tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(d)) + b"WAVEfmt " \
        + struct.pack("<IHHIIHH", 16, 1, x.shape[0], SR,
                      SR * 2 * x.shape[0], 2 * x.shape[0], 16) \
        + b"data" + struct.pack("<I", len(d))
    p = tmp_path / "a.wav"
    p.write_bytes(hdr + d)
    return p, pcm.T.astype(np.float64) / 32768.0


def _ref_af(tmp_path, wav, af):
    out = tmp_path / "ao.wav"
    subprocess.run(
        [str(refutil.REF), "-v", "error", "-y", "-i", str(wav),
         "-af", af, "-c:a", "pcm_f32le", "-f", "wav", str(out)],
        check=True)
    raw = out.read_bytes()
    return np.frombuffer(raw[raw.find(b"data") + 8:], np.float32) \
        .reshape(-1, 2).T


def _ours_af(name, args, x):
    f = get_filter(name)(args)
    outs = []
    for i in range(0, x.shape[1], 4800):
        outs += f.process(Frame.audio(
            x[:, i:i + 4800].astype(np.float32), SR, fmt="fltp"))
    outs += f.process(None)
    return np.concatenate([o.audio_data for o in outs], axis=1)


@requires_ref
@pytest.mark.parametrize("name,args", [
    ("tremolo", "f=8:d=0.7"),
    ("vibrato", "f=6:d=0.4"),
    ("crystalizer", "i=2"),
    ("extrastereo", "m=2.5"),
    ("stereowiden", ""),
])
def test_audio_filter_vs_reference(tmp_path, name, args):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, SR)) * 0.2
    wav, xq = _wav(tmp_path, x)
    want = _ref_af(tmp_path, wav,
                   f"{name}={args}" if args else name)
    got = _ours_af(name, args, xq)
    n = min(got.shape[1], want.shape[1])
    e = got[:, :n] - want[:, :n]
    snr = 10 * np.log10(max(np.sum(want[:, :n] ** 2), 1e-30)
                        / max(np.sum(e ** 2), 1e-30))
    assert snr > 90, f"SNR {snr:.1f}"


def test_afade_amerge_channelmap():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, SR // 2)) * 0.3
    f = get_filter("afade")("type=in:duration=0.25")
    y = _ours_af("afade", "type=in:duration=0.25", x)
    assert abs(y[0, 0]) < 1e-6                  # starts silent
    assert np.allclose(y[:, -1], x[:, -1], atol=1e-6)
    m = get_filter("amerge")("")
    f1 = Frame.audio(x[:1].astype(np.float32), SR, fmt="fltp")
    f2 = Frame.audio(x[1:].astype(np.float32), SR, fmt="fltp")
    m.process(f1, pad=0)
    out = m.process(f2, pad=1)[0]
    assert out.audio_data.shape[0] == 2
    cm = get_filter("channelmap")("map=1|0")
    out = cm.process(Frame.audio(x.astype(np.float32), SR,
                                 fmt="fltp"))[0]
    np.testing.assert_allclose(out.audio_data[0], x[1].astype(
        np.float32), atol=1e-6)


def test_anoisesrc_colors():
    for color in ("white", "pink", "brown"):
        src = get_filter("anoisesrc")(f"color={color}:sample_rate="
                                      f"{SR}:seed=1")
        frames = list(src.generate(4))
        x = np.concatenate([f.audio_data for f in frames], axis=1)
        assert np.abs(x).max() <= 1.0
        assert np.abs(x).std() > 1e-3
