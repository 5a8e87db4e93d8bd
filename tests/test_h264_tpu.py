"""Device (recon_tpu) vs host (recon_host) H.264 reconstruction equality.

Every crafted-stream family from test_h264 / test_h264_cabac is decoded
twice — numpy host path and the jitted wavefront device path (on the
8-device CPU backend the suite forces) — and must match byte-for-byte.
Since the host path is differentially verified against the reference
ffmpeg, equality here transitively proves the TPU path conformant."""

import numpy as np
import pytest

import test_h264 as H
import test_h264_cabac as C

from ffmpeg_tpu.codecs import CodecContext
from ffmpeg_tpu.core.packet import Packet
from ffmpeg_tpu.io.stream import CodecParameters, MediaType
from ffmpeg_tpu.utils.rational import Rational


def _decode(stream, options=None):
    par = CodecParameters(codec_type=MediaType.VIDEO, codec_id="h264")
    dec = CodecContext.open_decoder(par, options=options)
    frames = dec.decode_all([Packet(data=stream, pts=0,
                                    time_base=Rational(1, 25))])
    return [[np.asarray(p) for p in f.planes] for f in frames]


def _assert_equal(stream):
    host = _decode(stream)
    tpu = _decode(stream, options={"recon": "tpu"})
    assert len(host) == len(tpu) and host
    for i, (hf, tf) in enumerate(zip(host, tpu)):
        for pi, (hp, tp) in enumerate(zip(hf, tf)):
            np.testing.assert_array_equal(
                tp, hp, err_msg=f"frame {i} plane {pi}")


def test_tpu_ipcm():
    _assert_equal(H.craft_ipcm())


@pytest.mark.parametrize("mode", [0, 1, 2, 3])
def test_tpu_i16x16_modes(mode):
    _assert_equal(H.craft_i16x16(pred_mode=mode))


def test_tpu_i16x16_residual():
    _assert_equal(H.craft_i16x16_residual())


def test_tpu_i4x4():
    _assert_equal(H.craft_i4x4())


def test_tpu_i_deblocked():
    _assert_equal(H.craft_i4x4(with_residual=True)
                  if False else C.craft_cabac_i(deblock=True))


@pytest.mark.parametrize("seed", [0, 5])
def test_tpu_p_gop(seed):
    stream = H.craft_i16x16_residual(seed=4 + seed)
    for i in range(3):
        stream += H.craft_p_frame(frame_num=i + 1, seed=30 + seed + i)
    _assert_equal(stream)


def test_tpu_p_gop_deblocked():
    stream = H.craft_i16x16_residual(seed=8)
    for i in range(3):
        stream += H.craft_p_frame(frame_num=i + 1, seed=60 + i,
                                  deblock=True)
    _assert_equal(stream)


def _with_two_refs(build):
    orig = H.make_sps
    H.make_sps = lambda mb_w=4, mb_h=3: orig(mb_w, mb_h, num_ref=2)
    try:
        return build()
    finally:
        H.make_sps = orig


@pytest.mark.parametrize("seed", [1, 9])
def test_tpu_b_frames(seed):
    stream = _with_two_refs(lambda: H.craft_i16x16_residual(seed=seed))
    stream += H.craft_p_frame_poc(1, 4, seed=20 + seed)
    stream += H.craft_b_frame(frame_num=2, poc_lsb=2, seed=40 + seed)
    _assert_equal(stream)


def test_tpu_p_multiref():
    stream = _with_two_refs(lambda: H.craft_i16x16_residual(seed=3))
    stream += H.craft_p_frame(frame_num=1, seed=81)
    stream += H.craft_p_frame(frame_num=2, seed=91, num_ref=2)
    stream += H.craft_p_frame(frame_num=3, seed=96, num_ref=2,
                              deblock=True)
    _assert_equal(stream)


@pytest.mark.parametrize("seed", [0, 3])
def test_tpu_cabac_gop(seed):
    stream = C.craft_cabac_i(seed=seed, deblock=True)
    stream += C.craft_cabac_p(frame_num=1, seed=seed + 1, deblock=True)
    _assert_equal(stream)


def test_tpu_cabac_b():
    stream = C.craft_cabac_i(seed=2)
    stream += C.craft_cabac_p(frame_num=1, seed=3, poc_lsb=4)
    stream += C.craft_cabac_b(frame_num=2, poc_lsb=2, seed=7)
    _assert_equal(stream)
