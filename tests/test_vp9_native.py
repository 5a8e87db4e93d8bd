"""Native (C++) VP9 parse (csrc/vp9_parse.cpp) vs the Python walker —
byte-exact frames on crafted streams covering keyframes (all tx sizes,
sub-8x8 modes, partial SBs, tiles) and inter frames (single+compound
prediction, all filters, NEWMV chains, frame-context adaptation).

The Python walker is itself byte-exact vs the reference decoder
(test_vp9*.py), so equality here transitively pins the C++ port to
libavcodec/vp9.c behavior. Adaptation chains run WITHOUT errorres, so
count parity is exercised through prob.adapt_probs."""

import numpy as np
import pytest

import test_vp9 as K
import test_vp9_inter as I
from ffmpeg_tpu import native
from ffmpeg_tpu.codecs import CodecContext
from ffmpeg_tpu.core.packet import Packet
from ffmpeg_tpu.io.stream import CodecParameters, MediaType

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native build unavailable")


def _decode(frames, opts):
    par = CodecParameters(codec_type=MediaType.VIDEO, codec_id="vp9")
    d = CodecContext.open_decoder(par, options=opts)
    return d.decode_all([Packet(data=f, pts=i)
                         for i, f in enumerate(frames)])


def _check(frames):
    host = _decode(frames, {})
    nat = _decode(frames, {"native": True})
    assert len(host) == len(nat)
    for i, (fh, fn) in enumerate(zip(host, nat)):
        for pl, (a, b) in enumerate(zip(fh.planes, fn.planes)):
            np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b),
                err_msg=f"frame {i} plane {pl}")


@pytest.mark.parametrize("seed", [0, 3])
def test_vp9_native_kf(seed):
    rng = np.random.default_rng(seed)
    _check([K.craft_frame(K.Plan(rng))])


@pytest.mark.parametrize("txb", [0, 1, 2, 3])
def test_vp9_native_kf_tx_sizes(txb):
    rng = np.random.default_rng(10 + txb)
    _check([K.craft_frame(K.Plan(rng, split_p=0.2, tx_bias=txb))])


def test_vp9_native_kf_partial_sb():
    rng = np.random.default_rng(2)
    _check([K.craft_frame(K.Plan(rng), width=152, height=88)])


def test_vp9_native_kf_tiles():
    rng = np.random.default_rng(4)
    _check([K.craft_frame(K.Plan(rng), width=512, height=128,
                          tile_cols_log2=1)])


def test_vp9_native_kf_skip():
    rng = np.random.default_rng(5)
    _check([K.craft_frame(K.Plan(rng, skip_p=1.0))])


@pytest.mark.parametrize("seed", [0, 9])
def test_vp9_native_inter(seed):
    rng = np.random.default_rng(seed)
    s = I.CraftSession()
    s.key(K.Plan(rng))
    for _ in range(3):
        s.inter(I.InterPlan(rng))
    _check(s.frames)


def test_vp9_native_inter_compound():
    rng = np.random.default_rng(7)
    s = I.CraftSession()
    s.key(K.Plan(rng))
    for _ in range(2):
        s.inter(I.InterPlan(rng, comp_p=0.5), signbias=(0, 0, 1))
    _check(s.frames)


def test_vp9_native_inter_hp():
    rng = np.random.default_rng(5)
    s = I.CraftSession()
    s.key(K.Plan(rng))
    s.inter(I.InterPlan(rng, mv_amp=30), hp=True)
    _check(s.frames)


@pytest.mark.parametrize("fm", [0, 1, 2, 3])
def test_vp9_native_filters(fm):
    rng = np.random.default_rng(20 + fm)
    s = I.CraftSession()
    s.key(K.Plan(rng))
    s.inter(I.InterPlan(rng), filtermode=fm)
    _check(s.frames)


def test_vp9_native_adapt_chain():
    """6-frame chain exercising backward adaptation (counts parity)."""
    rng = np.random.default_rng(9)
    s = I.CraftSession()
    s.key(K.Plan(rng))
    for _ in range(6):
        s.inter(I.InterPlan(rng))
    _check(s.frames)
