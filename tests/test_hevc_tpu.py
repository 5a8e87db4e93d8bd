"""HEVC device filters (filter_tpu) vs the host filter.py — bit-exact
on crafted streams, including tiles/WPP, filters across tiles on/off,
and 10-bit. Runs on the CPU JAX backend (conftest); the math is pure
int32 so the TPU result is identical."""

import numpy as np
import pytest

import test_hevc as T
from ffmpeg_tpu.codecs.h264 import nal as _nal
from ffmpeg_tpu.codecs.h264.cabac import CabacDecoder
from ffmpeg_tpu.codecs.hevc import params as HP
from ffmpeg_tpu.codecs.hevc.ctu import CtuCoder, FrameDec
from ffmpeg_tpu.codecs.hevc.filter import deblock_frame, sao_frame
from ffmpeg_tpu.codecs.hevc.filter_tpu import filters_tpu


def _decode_to_prefilter(stream):
    sps = pps = None
    dec = None
    for u in _nal.split_annexb(stream):
        nt = (u[0] >> 1) & 0x3F
        rb = _nal.unescape(u[2:])
        if nt == HP.NAL_SPS:
            sps = HP.parse_sps(rb)
        elif nt == HP.NAL_PPS:
            pps = HP.parse_pps(rb)
        elif HP.is_slice(nt):
            sh = HP.parse_slice_header(rb, nt, sps, {0: pps})
            dec = FrameDec(sps, pps, sh)
            pay = rb[sh.data_bit_pos // 8:]
            CtuCoder(dec, CabacDecoder(pay),
                     payload=pay).code_slice_data()
    return dec


def _check(stream):
    dec = _decode_to_prefilter(stream)
    ty, tu, tv = filters_tpu(dec)
    # host path mutates in place
    if not dec.sh.deblocking_disabled:
        deblock_frame(dec)
    if dec.sps.sao_enabled and (dec.sh.sao_luma or dec.sh.sao_chroma):
        sao_frame(dec)
    np.testing.assert_array_equal(ty, dec.y)
    np.testing.assert_array_equal(tu, dec.u)
    np.testing.assert_array_equal(tv, dec.v)


@pytest.mark.parametrize("seed", [0, 5])
def test_hevc_tpu_deblock(seed):
    rng = np.random.default_rng(seed)
    _check(T.craft_frame(T.Plan(rng, maxn=10, amp=40),
                         pps_kw=dict(deblock=True)))


def test_hevc_tpu_deblock_offsets():
    rng = np.random.default_rng(7)
    _check(T.craft_frame(T.Plan(rng, maxn=12, amp=60), qp_delta=10,
                         pps_kw=dict(deblock=True, beta_offset=4,
                                     tc_offset=-4)))


@pytest.mark.parametrize("seed", [1, 9])
def test_hevc_tpu_sao(seed):
    rng = np.random.default_rng(seed)
    _check(T.craft_frame(T.Plan(rng, maxn=8, amp=40), sao=True))


def test_hevc_tpu_sao_deblock():
    rng = np.random.default_rng(3)
    _check(T.craft_frame(T.Plan(rng, maxn=8, amp=40), sao=True,
                         pps_kw=dict(deblock=True)))


def test_hevc_tpu_sao_deblock_96x64():
    rng = np.random.default_rng(12)
    _check(T.craft_frame(T.Plan(rng, maxn=8, amp=40), width=96,
                         height=64, sao=True,
                         pps_kw=dict(deblock=True)))


@pytest.mark.parametrize("across", [True, False])
def test_hevc_tpu_tiles(across):
    rng = np.random.default_rng(21)
    _check(T.craft_frame(T.Plan(rng, maxn=8, amp=40), sao=True,
                         pps_kw=dict(tiles=(2, 2), deblock=True,
                                     lf_across_tiles=across)))


def test_hevc_tpu_10bit():
    rng = np.random.default_rng(31)
    _check(T.craft_frame(T.Plan(rng, maxn=8, amp=80), bit_depth=10,
                         sao=True, pps_kw=dict(deblock=True)))


def test_hevc_tpu_12bit():
    rng = np.random.default_rng(33)
    _check(T.craft_frame(T.Plan(rng, maxn=6, amp=120), bit_depth=12,
                         sao=True, pps_kw=dict(deblock=True)))


# ---------------------------------------------------------------------------
# tile-column sharding across an 8-device mesh


def _check_sharded(stream, ndev=8):
    import jax
    if len(jax.devices()) < ndev:
        pytest.skip("needs virtual device mesh")
    from ffmpeg_tpu.parallel.mesh import make_mesh
    from ffmpeg_tpu.codecs.hevc.filter_tpu import sharded_filters
    mesh = make_mesh(ndev, spatial=ndev)
    dec = _decode_to_prefilter(stream)
    want = filters_tpu(dec)
    got = sharded_filters(dec, mesh)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)


def test_hevc_sharded_tiles_8col():
    """8 tile columns on 8 devices, filters across tiles ON: the
    cross-tile deblock rides the halo exchange."""
    rng = np.random.default_rng(41)
    _check_sharded(T.craft_frame(
        T.Plan(rng, maxn=8, amp=40), width=256, height=64,
        log2_ctb=4, log2_max_tb=4, sao=True,
        pps_kw=dict(tiles=(8, 1), deblock=True)))


def test_hevc_sharded_tiles_independent():
    """loop_filter_across_tiles=0: shards are fully independent."""
    rng = np.random.default_rng(43)
    _check_sharded(T.craft_frame(
        T.Plan(rng, maxn=8, amp=40), width=256, height=64,
        log2_ctb=4, log2_max_tb=4, sao=True,
        pps_kw=dict(tiles=(8, 1), deblock=True,
                    lf_across_tiles=False)))


def test_hevc_sharded_untiled():
    """Plain picture sharded in 8 columns (pure halo case)."""
    rng = np.random.default_rng(45)
    _check_sharded(T.craft_frame(
        T.Plan(rng, maxn=10, amp=50), width=256, height=64,
        sao=True, pps_kw=dict(deblock=True)))
