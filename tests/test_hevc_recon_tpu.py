"""HEVC device reconstruction (codecs/hevc/recon_tpu.py) vs the inline
host path — byte-exact on crafted streams across the toolset matrix:
intra (all CTB sizes, partial CTBs, transform skip), P/GPB/B inter with
deblock+SAO, 10-bit, tiles and WPP.  Runs on the CPU JAX backend
(conftest); the math is pure int32 so the TPU result is identical.

Reference scope: libavcodec/hevc/hevcdec.c hls_coding_unit (inline
recon) vs the recorded-replay split; the device program mirrors
pred_template.c / dsp_template.c exactly.
"""

import numpy as np
import pytest

import test_hevc as T
from ffmpeg_tpu.codecs import CodecContext
from ffmpeg_tpu.core.packet import Packet
from ffmpeg_tpu.io.stream import CodecParameters, MediaType


def _decode(stream, opts):
    par = CodecParameters(codec_type=MediaType.VIDEO, codec_id="hevc")
    d = CodecContext.open_decoder(par, options=opts)
    fr = d.decode_all([Packet(data=stream, pts=0)])
    fr += d.decode_all([None])
    return fr


def _check(stream):
    host = _decode(stream, {})
    dev = _decode(stream, {"device_recon": True})
    assert len(host) == len(dev)
    for fh, fd in zip(host, dev):
        for a, b in zip(fh.planes, fd.planes):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_recon_tpu_i_mixed():
    rng = np.random.default_rng(1)
    _check(T.craft_frame(T.Plan(rng)))


def test_recon_tpu_i_partial_ctbs():
    rng = np.random.default_rng(2)
    _check(T.craft_frame(T.Plan(rng), width=72, height=56))


def test_recon_tpu_i_tskip_dense():
    rng = np.random.default_rng(3)
    _check(T.craft_frame(T.Plan(rng, maxn=24, amp=60),
                         pps_kw={"transform_skip": True}))


def test_recon_tpu_i_sao_deblock():
    rng = np.random.default_rng(4)
    _check(T.craft_frame(T.Plan(rng, maxn=20, amp=70), sao=True,
                         pps_kw={"deblock": True}))


def test_recon_tpu_bit10():
    rng = np.random.default_rng(5)
    _check(T.craft_frame(T.Plan(rng), bit_depth=10))


def test_recon_tpu_p_gop():
    rng = np.random.default_rng(6)
    st, _ = T.craft_gop(lambda: T.InterPlan(rng), n_frames=4)
    _check(st)


def test_recon_tpu_b_reorder_sao_deblock():
    rng = np.random.default_rng(7)
    st, _ = T.craft_gop(lambda: T.InterPlan(rng, maxn=10, amp=40),
                        n_frames=5, gop_kind="B", sao=True,
                        pps_kw={"deblock": True})
    _check(st)


@pytest.mark.parametrize("pps_kw", [{"tiles": (2, 2)}, {"wpp": True}])
def test_recon_tpu_substreams(pps_kw):
    rng = np.random.default_rng(8)
    _check(T.craft_frame(T.Plan(rng), pps_kw=pps_kw))
