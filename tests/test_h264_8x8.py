"""H.264 High profile: 8x8 transform, Intra_8x8 prediction, scaling
matrices — crafted-stream differential vs the reference decoder
(test_h264.py strategy), plus host/TPU equality where wired."""

import subprocess

import numpy as np
import pytest

import refutil
import test_h264 as H
from conftest import requires_ref

from ffmpeg_tpu.codecs import CodecContext
from ffmpeg_tpu.core.packet import Packet
from ffmpeg_tpu.io.stream import CodecParameters, MediaType
from ffmpeg_tpu.utils.rational import Rational

MB_W, MB_H = 4, 3
W16, H16 = MB_W * 16, MB_H * 16


def write_scaling_list(w, vals):
    """scaling_list() syntax: delta-coded in zigzag order."""
    last = 8
    for v in vals:
        w.se((v - last) % 256 if (v - last) % 256 < 128
             else (v - last) % 256 - 256)
        last = v


def make_sps_high(mb_w=MB_W, mb_h=MB_H, num_ref=1, s4=None, s8=None):
    w = H.BW()
    w.u(100, 8)           # High profile
    w.u(0, 8)
    w.u(40, 8)
    w.ue(0)               # sps_id
    w.ue(1)               # chroma_format_idc 4:2:0
    w.ue(0)               # bit_depth_luma - 8
    w.ue(0)               # bit_depth_chroma - 8
    w.u(0, 1)             # qpprime bypass
    if s4 is not None or s8 is not None:
        w.u(1, 1)         # seq_scaling_matrix_present
        for i in range(6):
            if s4 is not None:
                w.u(1, 1)
                write_scaling_list(w, s4[i])
            else:
                w.u(0, 1)
        for i in range(2):
            if s8 is not None:
                w.u(1, 1)
                write_scaling_list(w, s8[i])
            else:
                w.u(0, 1)
    else:
        w.u(0, 1)
    w.ue(4)               # log2_max_frame_num - 4
    w.ue(0)               # poc type 0
    w.ue(4)               # log2_max_poc_lsb - 4
    w.ue(num_ref)
    w.u(0, 1)
    w.ue(mb_w - 1)
    w.ue(mb_h - 1)
    w.u(1, 1)             # frame_mbs_only
    w.u(1, 1)             # direct_8x8_inference
    w.u(0, 1)
    w.u(0, 1)
    return H.nal(3, 7, w.rbsp())


def make_pps_8x8(cabac=False):
    w = H.BW()
    w.ue(0)
    w.ue(0)
    w.u(1 if cabac else 0, 1)
    w.u(0, 1)
    w.ue(0)
    w.ue(0)
    w.ue(0)
    w.u(0, 1)
    w.u(0, 2)
    w.se(0)
    w.se(0)
    w.se(0)
    w.u(1, 1)             # deblocking control present
    w.u(0, 1)
    w.u(0, 1)
    # PPS extension: transform_8x8_mode on
    w.u(1, 1)             # transform_8x8_mode_flag
    w.u(0, 1)             # no pic scaling matrix
    w.se(0)               # second_chroma_qp_index_offset
    return H.nal(3, 8, w.rbsp())


def craft_i8x8_frame(mb_w=MB_W, mb_h=MB_H, seed=0, deblock=False,
                     with_residual=True, qp_delta=0):
    """IDR with every MB coded Intra_8x8 (CAVLC)."""
    from ffmpeg_tpu.codecs.h264.params import ZZ8
    rng = np.random.default_rng(seed)
    w = H.BW()
    H.slice_head(w, qp_delta=qp_delta, disable_deblock=not deblock)
    nnz = np.full((mb_h * 4, mb_w * 4), -1, np.int32)
    nnz_c = [np.full((mb_h * 2, mb_w * 2), -1, np.int32)
             for _ in range(2)]
    mode_arr = np.full((mb_h * 4, mb_w * 4), -1, np.int32)
    done = np.zeros((mb_h, mb_w), bool)
    for idx in range(mb_w * mb_h):
        mbx, mby = idx % mb_w, idx // mb_w
        w.ue(0)                       # mb_type I_NxN
        w.u(1, 1)                     # transform_size_8x8_flag = 1
        # four 8x8 pred modes
        for dx8, dy8 in ((0, 0), (1, 0), (0, 1), (1, 1)):
            bx4, by4 = mbx * 4 + dx8 * 2, mby * 4 + dy8 * 2
            la = (bx4 > 0 and (mode_arr[by4, bx4 - 1] >= 0
                               or done[mby, mbx - 1] if dx8 == 0
                               else True))
            # availability mirrors the decoder's _nbr_avail
            la = _nbr_avail(mode_arr, done, bx4 - 1, by4, mbx, mby,
                            mb_w)
            ta = _nbr_avail(mode_arr, done, bx4, by4 - 1, mbx, mby,
                            mb_w)
            if not la or not ta:
                pred = 2
            else:
                lm = int(mode_arr[by4, bx4 - 1])
                tm = int(mode_arr[by4 - 1, bx4])
                pred = min(lm if lm >= 0 else 2, tm if tm >= 0 else 2)
            # choose a safe mode given availability
            choices = [2]
            av_l = la
            av_t = ta
            if av_t:
                choices += [0, 3, 7]
            if av_l:
                choices += [1, 8]
            if av_l and av_t:
                choices += [4, 5, 6]
            mode = int(rng.choice(choices))
            if mode == pred:
                w.u(1, 1)
            else:
                w.u(0, 1)
                rem = mode if mode < pred else mode - 1
                w.u(rem, 3)
            mode_arr[by4:by4 + 2, bx4:bx4 + 2] = mode
        w.ue(0)                       # chroma DC pred
        cbp_luma = int(rng.integers(0, 16)) if with_residual else 0
        cbp_chroma = int(rng.integers(0, 3)) if with_residual else 0
        cbp = cbp_luma | (cbp_chroma << 4)
        w.ue(H._INV_I4_CBP[cbp])
        if cbp:
            w.se(0)
        # luma residual: per coded 8x8 block, 4 interleaved 4x4 scans
        for blk8 in range(4):
            dx8, dy8 = ((0, 0), (1, 0), (0, 1), (1, 1))[blk8]
            if not (cbp_luma & (1 << blk8)):
                nnz[mby * 4 + dy8 * 2:mby * 4 + dy8 * 2 + 2,
                    mbx * 4 + dx8 * 2:mbx * 4 + dx8 * 2 + 2] = 0
                continue
            for n in range(4):
                bx4 = mbx * 4 + dx8 * 2 + (n & 1)
                by4 = mby * 4 + dy8 * 2 + (n >> 1)
                lv = [0] * 16
                for _ in range(int(rng.integers(1, 4))):
                    lv[int(rng.integers(0, 10))] = \
                        int(rng.integers(-6, 7)) or 1
                nc = H._nc(nnz, bx4, by4)
                total = H.write_residual(w, lv, 16, nc)
                nnz[by4, bx4] = total
        # chroma residual (same syntax as 4x4 path)
        for ci in range(2):
            if cbp_chroma:
                dc = [0] * 4
                dc[int(rng.integers(0, 4))] = int(rng.integers(-4, 5)) or 1
                H.write_residual(w, dc, 4, -1)
        for ci in range(2):
            for blk in range(4):
                dx, dy = blk & 1, blk >> 1
                bx2, by2 = mbx * 2 + dx, mby * 2 + dy
                if cbp_chroma == 2:
                    ac = [0] * 15
                    if rng.integers(0, 2):
                        ac[int(rng.integers(0, 6))] = \
                            int(rng.integers(-3, 4)) or 1
                    nc = H._nc(nnz_c[ci], bx2, by2)
                    total = H.write_residual(w, ac, 15, nc)
                    nnz_c[ci][by2, bx2] = total
                else:
                    nnz_c[ci][by2, bx2] = 0
        done[mby, mbx] = True
    return H.nal(3, 5, w.rbsp())


def _nbr_avail(mode_arr, done, bx, by, mbx, mby, mb_w):
    if bx < 0 or by < 0 or bx >= mb_w * 4:
        return False
    nmbx, nmby = bx // 4, by // 4
    if (nmbx, nmby) == (mbx, mby):
        return mode_arr[by, bx] >= 0
    return bool(done[nmby, nmbx])


def _decode_vs_ref(stream, nframes, tmp_path, tpu=False):
    p = tmp_path / "s.h264"
    p.write_bytes(stream)
    par = CodecParameters(codec_type=MediaType.VIDEO, codec_id="h264")
    raw = subprocess.run(
        [str(refutil.REF), "-v", "error", "-f", "h264", "-i", str(p),
         "-f", "rawvideo", "-"], check=True, capture_output=True).stdout
    sz = W16 * H16 * 3 // 2
    assert len(raw) == nframes * sz
    for opts in ([None, {"recon": "tpu"}] if tpu else [None]):
        dec = CodecContext.open_decoder(par, options=opts)
        frames = dec.decode_all([Packet(data=stream, pts=0,
                                        time_base=Rational(1, 25))])
        assert len(frames) == nframes
        for i, f in enumerate(frames):
            got = np.concatenate([np.asarray(pl).ravel()
                                  for pl in f.planes])
            want = np.frombuffer(raw[i * sz:(i + 1) * sz], np.uint8)
            np.testing.assert_array_equal(
                got, want, err_msg=f"{opts} frame {i}")


@requires_ref
@pytest.mark.parametrize("seed", [0, 5, 9])
def test_i8x8_cavlc_exact(tmp_path, seed):
    stream = make_sps_high() + make_pps_8x8() \
        + craft_i8x8_frame(seed=seed)
    _decode_vs_ref(stream, 1, tmp_path, tpu=True)


@requires_ref
def test_i8x8_cavlc_deblocked_exact(tmp_path):
    stream = make_sps_high() + make_pps_8x8() \
        + craft_i8x8_frame(seed=3, deblock=True)
    _decode_vs_ref(stream, 1, tmp_path, tpu=True)


@requires_ref
def test_p_trans8_cavlc_exact(tmp_path):
    """I(8x8) then P frames whose residual uses the 8x8 transform."""
    stream = make_sps_high() + make_pps_8x8() \
        + craft_i8x8_frame(seed=1)
    stream += _craft_p_trans8(frame_num=1, seed=21)
    stream += _craft_p_trans8(frame_num=2, seed=22, deblock=True)
    _decode_vs_ref(stream, 3, tmp_path, tpu=True)


def _craft_p_trans8(frame_num, seed, mb_w=MB_W, mb_h=MB_H,
                    deblock=False):
    """P frame: P_16x16 MBs with mvd and 8x8-transform residual."""
    from ffmpeg_tpu.codecs.h264 import tables as HT
    rng = np.random.default_rng(seed)
    w = H.BW()
    H.p_slice_head(w, frame_num, disable_deblock=not deblock)
    nnz = np.full((mb_h * 4, mb_w * 4), -1, np.int32)
    nnz_c = [np.full((mb_h * 2, mb_w * 2), -1, np.int32)
             for _ in range(2)]
    inv_inter_cbp = {v: i for i, v in
                     enumerate(HT.GOLOMB_TO_INTER_CBP)}
    for idx in range(mb_w * mb_h):
        mbx, mby = idx % mb_w, idx // mb_w
        w.ue(0)                       # no skip run
        w.ue(0)                       # P_16x16
        w.se(int(rng.integers(-6, 7)))   # mvd x
        w.se(int(rng.integers(-4, 5)))   # mvd y
        cbp_luma = int(rng.integers(1, 16))
        cbp_chroma = 0
        w.ue(inv_inter_cbp[cbp_luma])
        w.u(1, 1)                     # transform_size_8x8_flag
        w.se(0)                       # qp delta
        for blk8 in range(4):
            dx8, dy8 = ((0, 0), (1, 0), (0, 1), (1, 1))[blk8]
            if not (cbp_luma & (1 << blk8)):
                nnz[mby * 4 + dy8 * 2:mby * 4 + dy8 * 2 + 2,
                    mbx * 4 + dx8 * 2:mbx * 4 + dx8 * 2 + 2] = 0
                continue
            for n in range(4):
                bx4 = mbx * 4 + dx8 * 2 + (n & 1)
                by4 = mby * 4 + dy8 * 2 + (n >> 1)
                lv = [0] * 16
                lv[int(rng.integers(0, 8))] = int(rng.integers(-5, 6)) or 1
                nc = H._nc(nnz, bx4, by4)
                total = H.write_residual(w, lv, 16, nc)
                nnz[by4, bx4] = total
        for ci in range(2):
            nnz_c[ci][mby * 2:mby * 2 + 2, mbx * 2:mbx * 2 + 2] = 0
    return H.nal(2, 1, w.rbsp())


@requires_ref
@pytest.mark.parametrize("which", ["4x4", "8x8", "both"])
def test_scaling_matrices_exact(tmp_path, which):
    """Custom SPS scaling lists change dequant on both 4x4 and 8x8
    paths; output must match the reference exactly."""
    rng = np.random.default_rng(11)
    s4 = [[int(v) for v in rng.integers(8, 40, 16)] for _ in range(6)]
    s8 = [[int(v) for v in rng.integers(8, 40, 64)] for _ in range(2)]
    if which == "4x4":
        sps = make_sps_high(s4=s4)
    elif which == "8x8":
        sps = make_sps_high(s8=s8)
    else:
        sps = make_sps_high(s4=s4, s8=s8)
    stream = sps + make_pps_8x8() + craft_i8x8_frame(seed=2)
    # also a 4x4-transform I frame under the same SPS
    import test_h264 as me
    stream += H.craft_i16x16_residual(seed=4)[len(H.make_sps())
                                              + len(H.make_pps()):]
    _decode_vs_ref(stream, 2, tmp_path, tpu=True)


# ---------------------------------------------------------------------------
# CABAC 8x8 (cat-5 residual, ctx 399-401 flag, Intra_8x8 mode coding)

def _cabac_8x8_env(slice_type, idr, frame_num=0, deblock=False):
    """Header bits + scratch decoder for a High-profile CABAC slice.
    The baseline header syntax of test_h264_cabac._setup matches our
    High SPS/PPS field-for-field; only the parameter-set NALs differ."""
    import test_h264_cabac as C
    w, dec, _s, _p = C._setup(MB_W, MB_H, slice_type, idr, frame_num,
                              deblock=deblock)
    dec.pps.transform_8x8_mode = True
    return w, dec


def _encode_mb_i8x8_cabac(dec, sc, mbx, mby, rng):
    import test_h264_cabac as C
    avail_l = dec._avail(mbx, mby, -1, 0)
    avail_t = dec._avail(mbx, mby, 0, -1)
    dec.mb_intra[mby, mbx] = True
    bx, by = mbx * 4, mby * 4
    sc._cur_comp = 0
    sc.intra_mb_type(mbx, mby, 3, 1, v=(0, 0, 0, 0))
    sc.i4x4_tab[mby, mbx] = True
    sc.transform_size_8x8_flag(mbx, mby, v=1)
    dec.trans8[mby, mbx] = True
    dec.mb_16x16[mby, mbx] = True
    modes = []
    for dx8, dy8 in dec._BLK8_XY:
        bxx, byy = bx + dx8 * 2, by + dy8 * 2
        la = dec._nbr_avail(bxx - 1, byy, mbx, mby)
        ta = dec._nbr_avail(bxx, byy - 1, mbx, mby)
        if not la or not ta:
            pred = 2
        else:
            lm = int(dec.intra4x4_modes[byy, bxx - 1])
            tm = int(dec.intra4x4_modes[byy - 1, bxx])
            pred = min(lm if lm >= 0 else 2, tm if tm >= 0 else 2)
        choices = [2]
        if ta:
            choices += [0, 3, 7]
        if la:
            choices += [1, 8]
        if la and ta:
            choices += [4, 5, 6]
        mode = int(rng.choice(choices))
        sc.intra4x4_mode(pred, v=mode)
        modes.append(mode)
        dec.intra4x4_modes[byy:byy + 2, bxx:bxx + 2] = mode
    cl = [0]
    if avail_l:
        cl.append(1)
    if avail_t:
        cl.append(2)
    if avail_l and avail_t:
        cl.append(3)
    chroma_mode = int(cl[rng.integers(0, len(cl))])
    sc.chroma_mode_tab[mby, mbx] = chroma_mode
    sc.chroma_pred_mode(mbx, mby, v=chroma_mode)
    cbp_luma = int(rng.integers(0, 16))
    cbp_chroma = int(rng.integers(0, 3))
    cbp_entry = cbp_luma | (cbp_chroma << 4)
    sc.cbp(mbx, mby, True, v=cbp_entry)
    if cbp_luma or cbp_chroma:
        sc.mb_qp_delta(v=0)
    else:
        sc.last_dqp = 0
    for blk8 in range(4):
        dec._record_blk8(mbx, mby, blk8, modes[blk8])
        dx8, dy8 = dec._BLK8_XY[blk8]
        x4, y4 = bx + dx8 * 2, by + dy8 * 2
        if cbp_luma & (1 << blk8):
            lv = C._rand_levels(rng, 64, maxn=6, amp=6)
            if not any(lv):
                lv[int(rng.integers(0, 40))] = 1
            sc.residual(5, mbx, mby, x4, y4, 64, True, levels=lv)
            dec.nnz_y[y4:y4 + 2, x4:x4 + 2] = 1
        else:
            dec.nnz_y[y4:y4 + 2, x4:x4 + 2] = 0
    cbp_entry = C._encode_chroma(dec, sc, mbx, mby, cbp_entry, rng,
                                 intra=True)
    sc.cbp_tab[mby, mbx] = cbp_entry
    dec.blk_done[by:by + 4, bx:bx + 4] = True
    dec.mb_avail[mby, mbx] = True


def craft_cabac_i8x8(seed=0, deblock=False):
    import test_h264_cabac as C
    from ffmpeg_tpu.codecs.h264.cabac import CabacEncoder
    from ffmpeg_tpu.codecs.h264.cabac_slice import CabacSliceCoder
    w, dec = _cabac_8x8_env(2, True, deblock=deblock)
    rng = np.random.default_rng(seed)
    enc = CabacEncoder()
    sc = CabacSliceCoder(dec, enc, 2, 26, encode=True)
    n = MB_W * MB_H
    for idx in range(n):
        _encode_mb_i8x8_cabac(dec, sc, idx % MB_W, idx // MB_W, rng)
        enc.terminate(1 if idx == n - 1 else 0)
    payload = C._bits_to_bytes(w.bits) + C._bits_to_bytes(enc.bitstring())
    return H.nal(3, 5, payload)


def craft_cabac_p_trans8(frame_num, seed, deblock=False):
    """P slice: P_16x16 MBs, every coded-luma MB uses the 8x8 transform."""
    import test_h264_cabac as C
    from ffmpeg_tpu.codecs.h264.cabac import CabacEncoder
    from ffmpeg_tpu.codecs.h264.cabac_slice import CabacSliceCoder, _amvd
    w, dec = _cabac_8x8_env(0, False, frame_num, deblock=deblock)
    dec.num_ref = (1, 1)
    rng = np.random.default_rng(seed)
    enc = CabacEncoder()
    sc = CabacSliceCoder(dec, enc, 0, 26, encode=True)
    n = MB_W * MB_H
    for idx in range(n):
        mbx, mby = idx % MB_W, idx // MB_W
        bx, by = mbx * 4, mby * 4
        sc.mb_skip_flag(mbx, mby, v=0)
        sc.p_mb_type(v=0)
        sc._ref_set.clear()
        for comp in range(2):
            amvd = _amvd(sc, bx, by, comp)
            mvd = int(rng.integers(-10, 11))
            sc.mvd(40 if comp == 0 else 47, amvd, v=mvd)
            sc.mvd_cache[0, by:by + 4, bx:bx + 4, comp] = \
                min(abs(mvd), 70)
        cbp_luma = int(rng.integers(1, 16))
        cbp_chroma = int(rng.integers(0, 3))
        cbp = cbp_luma | (cbp_chroma << 4)
        sc.cbp(mbx, mby, False, v=cbp)
        sc.transform_size_8x8_flag(mbx, mby, v=1)
        dec.trans8[mby, mbx] = True
        sc.mb_qp_delta(v=0)
        for blk8 in range(4):
            dx8, dy8 = dec._BLK8_XY[blk8]
            x4, y4 = bx + dx8 * 2, by + dy8 * 2
            if cbp_luma & (1 << blk8):
                lv = C._rand_levels(rng, 64, maxn=4, amp=5)
                if not any(lv):
                    lv[int(rng.integers(0, 40))] = 1
                sc.residual(5, mbx, mby, x4, y4, 64, False, levels=lv)
                dec.nnz_y[y4:y4 + 2, x4:x4 + 2] = 1
            else:
                dec.nnz_y[y4:y4 + 2, x4:x4 + 2] = 0
        cbp_entry = C._encode_chroma(dec, sc, mbx, mby, cbp, rng,
                                     intra=False)
        sc.cbp_tab[mby, mbx] = cbp_entry
        dec.blk_done[by:by + 4, bx:bx + 4] = True
        dec.mb_avail[mby, mbx] = True
        enc.terminate(1 if idx == n - 1 else 0)
    payload = C._bits_to_bytes(w.bits) + C._bits_to_bytes(enc.bitstring())
    return H.nal(2, 1, payload)


@requires_ref
@pytest.mark.parametrize("seed", [0, 7])
def test_i8x8_cabac_exact(tmp_path, seed):
    stream = make_sps_high() + make_pps_8x8(cabac=True) \
        + craft_cabac_i8x8(seed=seed)
    _decode_vs_ref(stream, 1, tmp_path, tpu=True)


@requires_ref
def test_i8x8_cabac_deblocked_exact(tmp_path):
    stream = make_sps_high() + make_pps_8x8(cabac=True) \
        + craft_cabac_i8x8(seed=4, deblock=True)
    _decode_vs_ref(stream, 1, tmp_path, tpu=True)


@requires_ref
def test_p_trans8_cabac_exact(tmp_path):
    stream = make_sps_high() + make_pps_8x8(cabac=True) \
        + craft_cabac_i8x8(seed=1) \
        + craft_cabac_p_trans8(frame_num=1, seed=31) \
        + craft_cabac_p_trans8(frame_num=2, seed=32, deblock=True)
    _decode_vs_ref(stream, 3, tmp_path, tpu=True)
