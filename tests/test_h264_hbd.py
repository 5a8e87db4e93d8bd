"""H.264 High 10 / High 12 (4:2:0) decode, byte-exact vs the reference.

Crafted-bitstream differential tests for >8-bit luma/chroma: PCM
baseline, I_16x16 and I_4x4 with residuals, negative slice QP (legal
only with QpBdOffset), deblocking at scaled thresholds, and a P frame
with quarter-pel MC. Reference scope: libavcodec/h264dec.c bit-depth
dispatch (init_dimensions/ff_h264_decode_seq_parameter_set),
h264idct_template.c / h264pred_template.c BIT_DEPTH instantiations.
"""

import subprocess

import numpy as np
import pytest

import refutil
from conftest import requires_ref

from test_h264 import BW, nal, write_residual, _nc

from ffmpeg_tpu.codecs import CodecContext
from ffmpeg_tpu.core.packet import Packet
from ffmpeg_tpu.io.stream import CodecParameters, MediaType
from ffmpeg_tpu.utils.rational import Rational


def make_sps_hbd(mb_w=4, mb_h=3, bd=10, num_ref=1):
    w = BW()
    w.u(110, 8)           # High 10 profile
    w.u(0, 8)
    w.u(40, 8)            # level 4.0
    w.ue(0)               # sps_id
    w.ue(1)               # chroma_format_idc = 1 (4:2:0)
    w.ue(bd - 8)          # bit_depth_luma_minus8
    w.ue(bd - 8)          # bit_depth_chroma_minus8
    w.u(0, 1)             # qpprime_y_zero_transform_bypass
    w.u(0, 1)             # seq_scaling_matrix_present
    w.ue(4)               # log2_max_frame_num - 4
    w.ue(0)               # poc type 0
    w.ue(4)               # log2_max_poc_lsb - 4
    w.ue(num_ref)
    w.u(0, 1)             # gaps allowed
    w.ue(mb_w - 1)
    w.ue(mb_h - 1)
    w.u(1, 1)             # frame_mbs_only
    w.u(1, 1)             # direct_8x8_inference
    w.u(0, 1)             # no cropping
    w.u(0, 1)             # no vui
    return nal(3, 7, w.rbsp())


def make_pps_hbd(chroma_qp_off=0):
    w = BW()
    w.ue(0)
    w.ue(0)
    w.u(0, 1)             # CAVLC
    w.u(0, 1)
    w.ue(0)
    w.ue(0)
    w.ue(0)
    w.u(0, 1)
    w.u(0, 2)
    w.se(0)               # init_qp - 26
    w.se(0)
    w.se(chroma_qp_off)
    w.u(1, 1)             # deblocking_filter_control_present
    w.u(0, 1)
    w.u(0, 1)
    return nal(3, 8, w.rbsp())


def slice_head_hbd(w, qp_delta=0, disable_deblock=True, frame_num=0,
                   idr=True, slice_type=7, poc_lsb=0):
    w.ue(0)
    w.ue(slice_type)
    w.ue(0)
    w.u(frame_num, 8)
    if idr:
        w.ue(0)           # idr_pic_id
    w.u(poc_lsb, 8)
    if slice_type % 5 == 0:            # P
        w.u(0, 1)         # num_ref_idx_active_override
        w.u(0, 1)         # ref_pic_list_modification_flag_l0
    if idr:
        w.u(0, 1)
        w.u(0, 1)
    else:
        w.u(0, 1)         # adaptive_ref_pic_marking_mode
    w.se(qp_delta)
    w.ue(1 if disable_deblock else 0)
    if not disable_deblock:
        w.se(0)
        w.se(0)


def craft_pcm_hbd(mb_w=2, mb_h=2, bd=10, seed=0):
    rng = np.random.default_rng(seed)
    w = BW()
    slice_head_hbd(w)
    for _ in range(mb_w * mb_h):
        w.ue(25)
        while len(w.bits) % 8:
            w.u(0, 1)
        for _ in range(384):
            w.u(int(rng.integers(0, 1 << bd)), bd)
    return make_sps_hbd(mb_w, mb_h, bd) + make_pps_hbd() + \
        nal(3, 5, w.rbsp())


def craft_i16_res_hbd(mb_w=4, mb_h=3, bd=10, seed=3, qp_delta=0,
                      deblock=False, chroma_qp_off=0):
    """First MB PCM (content), rest I_16x16 DC-pred with DC+AC luma and
    chroma residuals (structured like test_h264.craft_i16x16_residual,
    with per-component chroma nnz contexts)."""
    from ffmpeg_tpu.codecs.h264.slice_dec import _BLK_XY
    rng = np.random.default_rng(seed)
    w = BW()
    slice_head_hbd(w, qp_delta=qp_delta, disable_deblock=not deblock)
    nnz = np.full((mb_h * 4, mb_w * 4), -1, np.int32)
    nnzc = [np.full((mb_h * 2, mb_w * 2), -1, np.int32)
            for _ in range(2)]
    for idx in range(mb_w * mb_h):
        mbx, mby = idx % mb_w, idx // mb_w
        if idx == 0:
            w.ue(25)
            while len(w.bits) % 8:
                w.u(0, 1)
            for _ in range(384):
                w.u(int(rng.integers(0, 1 << bd)), bd)
            nnz[mby * 4:mby * 4 + 4, mbx * 4:mbx * 4 + 4] = 16
            for ci in range(2):
                nnzc[ci][mby * 2:mby * 2 + 2, mbx * 2:mbx * 2 + 2] = 16
            continue
        # I_16x16 DC pred, cbp_luma=15, cbp_chroma=2
        w.ue(1 + 2 + 4 * 2 + 12)
        w.ue(0)                        # chroma DC pred
        w.se(0)                        # mb_qp_delta
        dc = [0] * 16
        dc[0] = int(rng.integers(-4, 5)) or 1
        dc[2] = int(rng.integers(-2, 3))
        write_residual(w, dc, 16, _nc(nnz, mbx * 4, mby * 4))
        for blk in range(16):
            dxb, dyb = _BLK_XY[blk]
            bx4, by4 = mbx * 4 + dxb, mby * 4 + dyb
            lv = [0] * 15
            n = int(rng.integers(0, 4))
            for pv in (sorted(rng.choice(15, n, replace=False))
                       if n else []):
                lv[pv] = int(rng.integers(-6, 7)) or 2
            nnz[by4, bx4] = write_residual(w, lv, 15,
                                           _nc(nnz, bx4, by4))
        for ci in range(2):
            lv = [int(rng.integers(-3, 4)), 0, int(rng.integers(-2, 3)), 0]
            write_residual(w, lv, 4, -1)
        for ci in range(2):
            for blk in range(4):
                bx2 = mbx * 2 + (blk & 1)
                by2 = mby * 2 + (blk >> 1)
                lv = [0] * 15
                if rng.integers(0, 2):
                    lv[int(rng.integers(0, 6))] = \
                        int(rng.integers(-3, 4)) or 1
                nnzc[ci][by2, bx2] = write_residual(
                    w, lv, 15, _nc(nnzc[ci], bx2, by2))
    return make_sps_hbd(mb_w, mb_h, bd) + make_pps_hbd(chroma_qp_off) + \
        nal(3, 5, w.rbsp())


def _ours(data, nframes=1):
    par = CodecParameters(codec_type=MediaType.VIDEO, codec_id="h264")
    dec = CodecContext.open_decoder(par)
    frames = dec.decode_all([Packet(data=data, pts=0,
                                    time_base=Rational(1, 25))])
    assert len(frames) == nframes
    return frames


def _ref_hbd(data, w, h, bd, tmp_path, nframes=1):
    p = tmp_path / "t.h264"
    p.write_bytes(data)
    fmt = f"yuv420p{bd}le"
    raw = subprocess.run(
        [str(refutil.REF), "-v", "error", "-f", "h264", "-i", str(p),
         "-pix_fmt", fmt, "-f", "rawvideo", "-"],
        check=True, capture_output=True).stdout
    n = w * h * 2
    frames = []
    fsz = n + n // 2
    for k in range(nframes):
        b = raw[k * fsz:(k + 1) * fsz]
        y = np.frombuffer(b[:n], "<u2").reshape(h, w)
        u = np.frombuffer(b[n:n + n // 4], "<u2").reshape(h // 2, w // 2)
        v = np.frombuffer(b[n + n // 4:], "<u2").reshape(h // 2, w // 2)
        frames.append([y, u, v])
    return frames


def _check(data, w, h, bd, tmp_path, nframes=1):
    ours = _ours(data, nframes)
    refs = _ref_hbd(data, w, h, bd, tmp_path, nframes)
    for fr, ref in zip(ours, refs):
        assert fr.format == f"yuv420p{bd}le"
        for a, b in zip(fr.planes, ref):
            np.testing.assert_array_equal(np.asarray(a), b)


@requires_ref
@pytest.mark.parametrize("bd", [10, 12])
def test_pcm_hbd_exact(tmp_path, bd):
    _check(craft_pcm_hbd(bd=bd), 32, 32, bd, tmp_path)


@requires_ref
@pytest.mark.parametrize("bd", [10, 12])
def test_i16x16_residual_hbd_exact(tmp_path, bd):
    _check(craft_i16_res_hbd(bd=bd), 64, 48, bd, tmp_path)


@requires_ref
def test_negative_slice_qp_10bit(tmp_path):
    # QPY = 26 - 36 = -10: legal only via QpBdOffsetY=12 (10-bit)
    _check(craft_i16_res_hbd(bd=10, qp_delta=-36), 64, 48, 10, tmp_path)


@requires_ref
def test_deblock_10bit_scaled_thresholds(tmp_path):
    _check(craft_i16_res_hbd(bd=10, deblock=True, seed=9), 64, 48, 10,
           tmp_path)


@requires_ref
def test_chroma_qp_offset_10bit(tmp_path):
    _check(craft_i16_res_hbd(bd=10, chroma_qp_off=-8, seed=5), 64, 48,
           10, tmp_path)


@requires_ref
@pytest.mark.parametrize("bd", [10, 12])
def test_p_frames_hbd_exact(tmp_path, bd):
    """P slices (skip runs, 16x16/16x8/8x16/8x8 partitions, qpel MC,
    residuals) over a high-bit-depth reference frame; craft_p_frame's
    syntax is bit-depth independent so it rides the hbd SPS."""
    from test_h264 import craft_p_frame
    stream = craft_i16_res_hbd(bd=bd, seed=4)
    for i in range(3):
        stream += craft_p_frame(frame_num=i + 1, seed=30 + i)
    ours = _ours(stream, 4)
    refs = _ref_hbd(stream, 64, 48, bd, tmp_path, 4)
    for fr, ref in zip(ours, refs):
        for a, b in zip(fr.planes, ref):
            np.testing.assert_array_equal(np.asarray(a), b)


@requires_ref
def test_p_deblock_hbd_exact(tmp_path):
    from test_h264 import craft_p_frame
    stream = craft_i16_res_hbd(bd=10, seed=6, deblock=True)
    stream += craft_p_frame(frame_num=1, seed=77, deblock=True)
    ours = _ours(stream, 2)
    refs = _ref_hbd(stream, 64, 48, 10, tmp_path, 2)
    for fr, ref in zip(ours, refs):
        for a, b in zip(fr.planes, ref):
            np.testing.assert_array_equal(np.asarray(a), b)


@requires_ref
@pytest.mark.parametrize("bd", [10])
def test_cabac_gop_hbd_exact(tmp_path, monkeypatch, bd):
    """CABAC I+P GOP at 10-bit: the CABAC syntax layer is bit-depth
    independent, but dequant/recon/deblock all shift — decode must stay
    byte-exact vs the reference."""
    import test_h264_cabac as C
    monkeypatch.setattr(
        C, "make_sps",
        lambda mb_w, mb_h, num_ref=1: make_sps_hbd(mb_w, mb_h, bd,
                                                   num_ref))
    stream = C.craft_cabac_i(seed=2)
    stream += C.craft_cabac_p(frame_num=1, seed=11)
    ours = _ours(stream, 2)
    refs = _ref_hbd(stream, 64, 48, bd, tmp_path, 2)
    for fr, ref in zip(ours, refs):
        assert fr.format == f"yuv420p{bd}le"
        for a, b in zip(fr.planes, ref):
            np.testing.assert_array_equal(np.asarray(a), b)
