"""negate/eq/boxblur/unsharp/hue filter tests."""

import numpy as np
import pytest

from ffmpeg_tpu.core.frame import Frame
from ffmpeg_tpu.filters import parse_graph
from ffmpeg_tpu.utils.rational import Rational


def _frame(w=32, h=24, fill=None, seed=0):
    rng = np.random.default_rng(seed)
    if fill:
        planes = [np.full((h, w), fill[0], np.uint8),
                  np.full((h // 2, w // 2), fill[1], np.uint8),
                  np.full((h // 2, w // 2), fill[2], np.uint8)]
    else:
        planes = [rng.integers(0, 256, (h, w)).astype(np.uint8),
                  rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8),
                  rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8)]
    return Frame.video(w, h, "yuv420p", planes=planes, pts=0,
                       time_base=Rational(1, 25))


def test_negate():
    f = _frame(seed=1)
    (o,) = parse_graph("negate").run([f])
    for a, b in zip(f.planes, o.planes):
        np.testing.assert_array_equal(255 - np.asarray(a), np.asarray(b))


def test_negate_involution():
    f = _frame(seed=2)
    (o,) = parse_graph("negate,negate").run([f])
    for a, b in zip(f.planes, o.planes):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_eq_brightness_contrast():
    f = _frame(fill=(100, 128, 128))
    (o,) = parse_graph("eq=contrast=2.0:brightness=0.1").run([f])
    y = np.asarray(o.planes[0])
    # (100-128)*2 + 128 + 25.5 = 97.5 -> 98
    assert y[0, 0] == 98
    np.testing.assert_array_equal(np.asarray(o.planes[1]),
                                  np.asarray(f.planes[1]))


def test_eq_saturation():
    f = _frame(fill=(100, 168, 88))
    (o,) = parse_graph("eq=saturation=0.5").run([f])
    assert np.asarray(o.planes[1])[0, 0] == 148    # (168-128)*0.5+128
    assert np.asarray(o.planes[2])[0, 0] == 108


def test_boxblur_flat_invariant():
    f = _frame(fill=(77, 150, 60))
    (o,) = parse_graph("boxblur=luma_radius=3").run([f])
    for a, b in zip(f.planes, o.planes):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_boxblur_smooths():
    f = _frame(seed=3)
    (o,) = parse_graph("boxblur=luma_radius=2").run([f])
    y0 = np.asarray(f.planes[0]).astype(float)
    y1 = np.asarray(o.planes[0]).astype(float)
    assert y1.std() < y0.std()
    assert abs(y1.mean() - y0.mean()) < 2.0


def test_boxblur_matches_direct_mean():
    f = _frame(seed=4)
    (o,) = parse_graph("boxblur=luma_radius=1:chroma_radius=0").run([f])
    y = np.asarray(f.planes[0]).astype(np.float64)
    pad = np.pad(y, 1, mode="edge")
    direct = sum(pad[dy:dy + y.shape[0], dx:dx + y.shape[1]]
                 for dy in range(3) for dx in range(3)) / 9.0
    np.testing.assert_array_equal(
        np.asarray(o.planes[0]),
        np.clip(np.round(direct.astype(np.float32)), 0, 255)
        .astype(np.uint8))


def test_unsharp_increases_contrast():
    f = _frame(seed=5)
    (o,) = parse_graph("unsharp=luma_amount=1.5").run([f])
    assert np.asarray(o.planes[0]).astype(float).std() > \
        np.asarray(f.planes[0]).astype(float).std()
    np.testing.assert_array_equal(np.asarray(o.planes[1]),
                                  np.asarray(f.planes[1]))


def test_hue_rotation():
    f = _frame(fill=(128, 178, 128))     # pure +U
    (o,) = parse_graph("hue=h=90").run([f])
    # 90°: U -> V
    assert abs(int(np.asarray(o.planes[1])[0, 0]) - 128) <= 1
    assert abs(int(np.asarray(o.planes[2])[0, 0]) - 178) <= 1


def test_hue_saturation_zero_greys():
    f = _frame(seed=6)
    (o,) = parse_graph("hue=s=0").run([f])
    assert (np.asarray(o.planes[1]) == 128).all()
    assert (np.asarray(o.planes[2]) == 128).all()


# ---------------- video4 / audio2 batches ------------------------------------

def _gray_frame(w=64, h=48, value=None):
    import numpy as np
    from ffmpeg_tpu.core.frame import Frame
    y = (np.add.outer(np.arange(h), np.arange(w)) % 256).astype(np.uint8) \
        if value is None else np.full((h, w), value, np.uint8)
    u = np.full((h // 2, w // 2), 100, np.uint8)
    v = np.full((h // 2, w // 2), 160, np.uint8)
    return Frame.video(w, h, "yuv420p", planes=[y, u, v], pts=0)


def _run1(name, args, frame):
    from ffmpeg_tpu.filters import get_filter
    f = get_filter(name)(args)
    f.configure([_props(frame)])
    return f.process(frame)[0]


def _props(frame):
    from ffmpeg_tpu.filters.base import props_of
    return props_of(frame)


def test_gblur_smooths():
    import numpy as np
    fr = _gray_frame()
    out = _run1("gblur", "sigma=2", fr)
    a = np.asarray(fr.planes[0], np.float64)
    b = np.asarray(out.planes[0], np.float64)
    assert np.abs(np.diff(b, axis=1)).mean() < np.abs(np.diff(a, axis=1)).mean() + 1e-9
    assert abs(a.mean() - b.mean()) < 3


def test_swapuv_and_monochrome():
    import numpy as np
    fr = _gray_frame()
    out = _run1("swapuv", "", fr)
    assert np.asarray(out.planes[1])[0, 0] == 160
    assert np.asarray(out.planes[2])[0, 0] == 100
    m = _run1("monochrome", "", fr)
    assert (np.asarray(m.planes[1]) == 128).all()


def test_edgedetect_flat_is_black():
    import numpy as np
    fr = _gray_frame(value=100)
    out = _run1("edgedetect", "", fr)
    assert np.asarray(out.planes[0]).max() == 0


def test_framestep_and_select():
    from ffmpeg_tpu.filters import get_filter
    fs = get_filter("framestep")("step=3")
    kept = [i for i in range(9) if fs.process(_gray_frame())]
    assert kept == [0, 3, 6]
    sel = get_filter("select")("expr=mod(n\\,2)")
    kept = [i for i in range(6) if sel.process(_gray_frame())]
    assert kept == [1, 3, 5]


def test_tmix_averages():
    import numpy as np
    from ffmpeg_tpu.filters import get_filter
    f = get_filter("tmix")("frames=2")
    f.process(_gray_frame(value=0))
    out = f.process(_gray_frame(value=100))[0]
    assert abs(int(np.asarray(out.planes[0])[0, 0]) - 50) <= 1


def test_biquad_lowpass_attenuates_highs():
    import numpy as np
    from ffmpeg_tpu.core.frame import Frame
    from ffmpeg_tpu.filters import get_filter
    sr, n = 48000, 4800
    t = np.arange(n) / sr
    low = np.sin(2 * np.pi * 200 * t)
    high = np.sin(2 * np.pi * 12000 * t)
    x = ((low + high) * 0.4 * 32767).astype(np.int16)[None, :]
    fr = Frame.audio(x, sr, "s16p", "mono", pts=0)
    f = get_filter("lowpass")("frequency=1000")
    out = f.process(fr)[0]
    y = np.asarray(out.planes[0], np.float64).ravel() / 32767
    spec = np.abs(np.fft.rfft(y * np.hanning(n)))
    freqs = np.fft.rfftfreq(n, 1 / sr)
    p_low = spec[np.argmin(np.abs(freqs - 200))]
    p_high = spec[np.argmin(np.abs(freqs - 12000))]
    assert p_low > 30 * p_high


def test_adelay_shifts():
    import numpy as np
    from ffmpeg_tpu.core.frame import Frame
    from ffmpeg_tpu.filters import get_filter
    sr = 8000
    x = (np.arange(1, 801) % 100 * 300).astype(np.int16)[None, :]
    fr = Frame.audio(x, sr, "s16p", "mono", pts=0)
    f = get_filter("adelay")("delays=100")       # 100 ms = 800 samples
    out = f.process(fr)[0]
    assert (np.asarray(out.planes[0]) == 0).all()
    out2 = f.process(fr)[0]
    np.testing.assert_array_equal(
        np.asarray(out2.planes[0]).ravel(), x.ravel())


def test_aecho_adds_delayed_copy():
    import numpy as np
    from ffmpeg_tpu.core.frame import Frame
    from ffmpeg_tpu.filters import get_filter
    sr = 8000
    x = np.zeros(1600, np.float32)
    x[0] = 0.5
    fr = Frame.audio(x[None, :], sr, "fltp", "mono", pts=0)
    f = get_filter("aecho")("in_gain=1.0:out_gain=1.0:delays=100:decays=0.5")
    out = f.process(fr)[0]
    y = np.asarray(out.planes[0]).ravel()
    assert abs(y[0] - 0.5) < 1e-4
    assert abs(y[800] - 0.25) < 1e-4


def test_framesync_pairs_by_pts():
    from ffmpeg_tpu.filters.framesync import FrameSync
    from ffmpeg_tpu.utils.rational import Rational

    def fr(pts):
        f = _gray_frame(value=pts)
        f.pts = pts
        f.time_base = Rational(1, 10)
        return f

    fs = FrameSync(2)
    # secondary at half the master rate: master pts 0..5, secondary 0,2,4
    for p in (0, 2, 4):
        fs.push(fr(p), 1)
    fs.push(None, 1)
    for p in range(6):
        fs.push(fr(p), 0)
    groups = fs.events()
    assert len(groups) == 6
    picked = [g[1].pts for g in groups]
    assert picked == [0, 0, 2, 2, 4, 4]


def test_blend_average():
    import numpy as np
    from ffmpeg_tpu.filters import get_filter
    f = get_filter("blend")("all_mode=average")
    a, b = _gray_frame(value=100), _gray_frame(value=200)
    a.pts = b.pts = 0
    assert f.process(a, 0) == []
    f.process(b, 1)
    f.process(None, 1)
    out = f.process(None, 0)
    # master frame was already queued; pull via a fresh event check
    f2 = get_filter("blend")("all_mode=average")
    f2.process(b, 1)
    f2.process(None, 1)
    (res,) = f2.process(a, 0)
    assert abs(int(np.asarray(res.planes[0])[0, 0]) - 150) <= 1
