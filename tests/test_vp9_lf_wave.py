"""VP9 wavefront loop filter (lf_wave.py) — bit-exact vs the host
filter (lf.py) on crafted frames with real recon state, including
frame edges, partial SBs and strong filter levels."""

import numpy as np
import pytest

import test_vp9 as K
import test_vp9_inter as I
from ffmpeg_tpu.codecs.vp9 import VP9Core, split_superframe
from ffmpeg_tpu.codecs.vp9 import lf as LF
from ffmpeg_tpu.codecs.vp9.lf_tpu import _luts
from ffmpeg_tpu.codecs.vp9.lf_wave import loopfilter_wavefront


def _pre_lf_states(frames):
    """Decode, capturing each frame's pre-loop-filter state."""
    states = []
    real = LF.loopfilter_frame

    def capture(fs):
        states.append((fs.y.copy(), fs.u.copy(), fs.v.copy(), fs))
        real(fs)

    LF.loopfilter_frame = capture
    import ffmpeg_tpu.codecs.vp9 as V
    old = V.loopfilter_frame
    V.loopfilter_frame = capture
    try:
        core = VP9Core()
        for f in frames:
            for sub in split_superframe(f):
                core.decode_frame(sub)
    finally:
        LF.loopfilter_frame = real
        V.loopfilter_frame = old
    return states


def _check(frames):
    states = _pre_lf_states(frames)
    assert states
    for y0, u0, v0, fs in states:
        h = fs.h
        if not h.filter_level:
            continue
        lim, mblim = _luts(h.sharpness)
        lvl8 = np.zeros((fs.sb_rows * 8, fs.sb_cols * 8), np.int32)
        lvl8[:fs.rows, :fs.cols] = fs.lf_lvl
        pw, ph = fs.cols * 8, fs.rows * 8
        dims = (pw >> 2, ph >> 2, pw >> 3, ph >> 3)
        yw, uw, vw = loopfilter_wavefront(
            y0, u0, v0, fs.wd_v, fs.wd_h, fs.wd_v_uv, fs.wd_h_uv,
            lvl8, np.asarray(lim), np.asarray(mblim),
            fs.sb_rows, fs.sb_cols, dims)
        # fs.y/u/v hold the host-filtered result
        np.testing.assert_array_equal(np.asarray(yw).astype(np.uint8),
                                      fs.y, err_msg="luma")
        np.testing.assert_array_equal(np.asarray(uw).astype(np.uint8),
                                      fs.u, err_msg="u")
        np.testing.assert_array_equal(np.asarray(vw).astype(np.uint8),
                                      fs.v, err_msg="v")


def test_lf_wave_kf():
    rng = np.random.default_rng(0)
    _check([K.craft_frame(K.Plan(rng), filter_level=32)])


def test_lf_wave_kf_multi_sb():
    rng = np.random.default_rng(1)
    _check([K.craft_frame(K.Plan(rng), width=192, height=128,
                          filter_level=24, sharpness=2)])


def test_lf_wave_partial_sb():
    rng = np.random.default_rng(2)
    _check([K.craft_frame(K.Plan(rng), width=152, height=88,
                          filter_level=40)])


def test_lf_wave_inter():
    rng = np.random.default_rng(3)
    s = I.CraftSession(width=192, height=128)
    s.key(K.Plan(rng), filter_level=20)
    for _ in range(2):
        s.inter(I.InterPlan(rng), filter_level=36)
    _check(s.frames)
