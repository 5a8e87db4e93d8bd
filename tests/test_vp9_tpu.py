"""Windowed VP9 TPU decoder (models/vp9_tpu.py) — full decode (C++
parse + one-program-per-window device recon + fused in-loop deblock,
DPB device-resident) byte-exact vs the host decoder on crafted
key+inter sequences with loop filtering enabled."""

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


def _decode_host(frames):
    par = CodecParameters(codec_type=MediaType.VIDEO, codec_id="vp9")
    d = CodecContext.open_decoder(par)
    return d.decode_all([Packet(data=f, pts=i)
                         for i, f in enumerate(frames)])


def _check(frames):
    from ffmpeg_tpu.models.vp9_tpu import Vp9TpuDecoder
    host = _decode_host(frames)
    dec = Vp9TpuDecoder()
    dev = dec.decode(frames, emit_planes=True)
    assert len(host) == len(dev)
    for i, (fh, (y, u, v)) in enumerate(zip(host, dev)):
        for pl, (a, b) in enumerate(zip(fh.planes, (y, u, v))):
            np.testing.assert_array_equal(
                np.asarray(a), b, err_msg=f"frame {i} plane {pl}")


def test_vp9_tpu_window_kf_lf():
    rng = np.random.default_rng(0)
    _check([K.craft_frame(K.Plan(rng), filter_level=24)])


def test_vp9_tpu_window_inter_lf():
    rng = np.random.default_rng(3)
    s = I.CraftSession()
    s.key(K.Plan(rng), filter_level=20)
    for _ in range(3):
        s.inter(I.InterPlan(rng), filter_level=28)
    _check(s.frames)


def test_vp9_tpu_window_mixed():
    """Varying density across the window (shared padded program)."""
    rng = np.random.default_rng(5)
    s = I.CraftSession()
    s.key(K.Plan(rng, skip_p=0.8), filter_level=12)
    s.inter(I.InterPlan(rng, skip_p=0.9, inter_p=1.0))
    s.inter(I.InterPlan(rng, skip_p=0.2, newmv_p=0.6), filter_level=40)
    _check(s.frames)
