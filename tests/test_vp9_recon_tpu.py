"""VP9 device reconstruction (codecs/vp9/recon_tpu.py) vs the inline
host path — byte-exact on crafted streams: keyframe intra (all tx
sizes, sub-8x8 modes, partial SBs, tiles), inter P-frames (single +
compound prediction, all filters, high-precision MVs, sub-8x8
partitions) and intra-in-inter blocks.  Runs on the CPU JAX backend
(conftest); the math is pure int32 so the TPU result is identical.

Reference scope: libavcodec/vp9recon.c intra_recon/inter_recon
(inline) vs the recorded-replay split; the device program mirrors
vp9dsp_template.c exactly (itxfm via the SAME 1-D kernels)."""

import numpy as np
import pytest

import test_vp9 as K
import test_vp9_inter as I
from ffmpeg_tpu.codecs import CodecContext
from ffmpeg_tpu.core.packet import Packet
from ffmpeg_tpu.io.stream import CodecParameters, MediaType


def _decode(frames, opts):
    par = CodecParameters(codec_type=MediaType.VIDEO, codec_id="vp9")
    d = CodecContext.open_decoder(par, options=opts)
    return d.decode_all([Packet(data=f, pts=i)
                         for i, f in enumerate(frames)])


def _check(frames, n_visible=None):
    host = _decode(frames, {})
    dev = _decode(frames, {"device_recon": True})
    assert len(host) == len(dev)
    if n_visible is not None:
        assert len(host) == n_visible
    for fh, fd in zip(host, dev):
        for a, b in zip(fh.planes, fd.planes):
            np.testing.assert_array_equal(np.asarray(a),
                                          np.asarray(b))


@pytest.mark.parametrize("seed", [0, 3])
def test_vp9_recon_tpu_kf(seed):
    rng = np.random.default_rng(seed)
    _check([K.craft_frame(K.Plan(rng))])


def test_vp9_recon_tpu_kf_tx_sizes():
    rng = np.random.default_rng(1)
    _check([K.craft_frame(K.Plan(rng), txmode=1)])


def test_vp9_recon_tpu_kf_partial_sb():
    rng = np.random.default_rng(2)
    _check([K.craft_frame(K.Plan(rng), width=152, height=88)])


def test_vp9_recon_tpu_kf_tiles():
    rng = np.random.default_rng(4)
    _check([K.craft_frame(K.Plan(rng), width=512, height=128,
                          tile_cols_log2=1)])


@pytest.mark.parametrize("seed", [0, 9])
def test_vp9_recon_tpu_inter(seed):
    rng = np.random.default_rng(seed)
    s = I.CraftSession()
    s.key(K.Plan(rng))
    for _ in range(3):
        s.inter(I.InterPlan(rng), errorres=True)
    _check(s.frames)


def test_vp9_recon_tpu_inter_compound():
    rng = np.random.default_rng(7)
    s = I.CraftSession()
    s.key(K.Plan(rng))
    for _ in range(2):
        s.inter(I.InterPlan(rng, comp_p=0.5), signbias=(0, 0, 1),
                errorres=True)
    _check(s.frames)


def test_vp9_recon_tpu_inter_hp():
    rng = np.random.default_rng(5)
    s = I.CraftSession()
    s.key(K.Plan(rng))
    s.inter(I.InterPlan(rng, mv_amp=30), hp=True, errorres=True)
    _check(s.frames)


@pytest.mark.parametrize("fm", [0, 1, 2, 3])
def test_vp9_recon_tpu_filters(fm):
    rng = np.random.default_rng(20 + fm)
    s = I.CraftSession()
    s.key(K.Plan(rng))
    s.inter(I.InterPlan(rng), filtermode=fm, errorres=True)
    _check(s.frames)
