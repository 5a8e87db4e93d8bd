"""H.264 I-slice decoder tests (codecs/h264/).

No H.264 encoder exists in this environment; streams are crafted
bit-by-bit (SPS/PPS/IDR) and our output is compared sample-exactly with
the reference decoder (see crafted-bitstream notes in test_mp3.py)."""

import subprocess

import numpy as np
import pytest

import refutil
from conftest import requires_ref

from ffmpeg_tpu.codecs import CodecContext
from ffmpeg_tpu.codecs.h264 import tables as HT
from ffmpeg_tpu.io.stream import CodecParameters, MediaType
from ffmpeg_tpu.core.packet import Packet
from ffmpeg_tpu.utils.rational import Rational


class BW:
    """RBSP bit writer with trailing-bit + emulation-prevention output."""

    def __init__(self):
        self.bits = []

    def u(self, v, n):
        for i in range(n - 1, -1, -1):
            self.bits.append((v >> i) & 1)
        return self

    def ue(self, v):
        v += 1
        n = v.bit_length()
        self.u(0, n - 1)
        self.u(v, n)
        return self

    def se(self, v):
        self.ue(2 * v - 1 if v > 0 else -2 * v)
        return self

    def rbsp(self):
        bits = self.bits + [1]
        while len(bits) % 8:
            bits.append(0)
        out = bytearray()
        for i in range(0, len(bits), 8):
            b = 0
            for j in range(8):
                b = (b << 1) | bits[i + j]
            out.append(b)
        return bytes(out)


def escape(rbsp: bytes) -> bytes:
    out = bytearray()
    zeros = 0
    for byte in rbsp:
        if zeros >= 2 and byte <= 3:
            out.append(3)
            zeros = 0
        out.append(byte)
        zeros = zeros + 1 if byte == 0 else 0
    return bytes(out)


def nal(ref_idc, ntype, rbsp):
    return b"\x00\x00\x00\x01" + bytes([(ref_idc << 5) | ntype]) + \
        escape(rbsp)


def make_sps(mb_w=4, mb_h=3, num_ref=1):
    w = BW()
    w.u(66, 8)            # baseline
    w.u(0, 8)
    w.u(30, 8)            # level 3.0
    w.ue(0)               # sps_id
    w.ue(4)               # log2_max_frame_num - 4 ... (value 4 -> 8)
    w.ue(0)               # poc type 0
    w.ue(4)               # log2_max_poc_lsb - 4
    w.ue(num_ref)         # num_ref_frames
    w.u(0, 1)             # gaps allowed
    w.ue(mb_w - 1)
    w.ue(mb_h - 1)
    w.u(1, 1)             # frame_mbs_only
    w.u(1, 1)             # direct_8x8_inference
    w.u(0, 1)             # no cropping
    w.u(0, 1)             # no vui
    return nal(3, 7, w.rbsp())


def make_pps():
    w = BW()
    w.ue(0)               # pps_id
    w.ue(0)               # sps_id
    w.u(0, 1)             # CAVLC
    w.u(0, 1)             # pic_order_present
    w.ue(0)               # num_slice_groups - 1
    w.ue(0)               # num_ref_idx_l0 - 1
    w.ue(0)               # num_ref_idx_l1 - 1
    w.u(0, 1)             # weighted_pred
    w.u(0, 2)             # weighted_bipred
    w.se(0)               # init_qp - 26
    w.se(0)               # init_qs
    w.se(0)               # chroma_qp_index_offset
    w.u(1, 1)             # deblocking_filter_control_present
    w.u(0, 1)             # constrained intra
    w.u(0, 1)             # redundant pic cnt
    return nal(3, 8, w.rbsp())


def slice_head(w, qp_delta=0, disable_deblock=True):
    w.ue(0)               # first_mb
    w.ue(7)               # slice_type: I (all slices of pic)
    w.ue(0)               # pps_id
    w.u(0, 8)             # frame_num (log2=8)
    w.ue(0)               # idr_pic_id
    w.u(0, 8)             # poc lsb (log2=8)
    w.u(0, 1)             # no_output_of_prior_pics
    w.u(0, 1)             # long_term_reference
    w.se(qp_delta)        # slice_qp_delta
    w.ue(1 if disable_deblock else 0)   # disable_deblocking_filter_idc
    if not disable_deblock:
        w.se(0)
        w.se(0)


def craft_ipcm(mb_w=2, mb_h=2, seed=0):
    rng = np.random.default_rng(seed)
    w = BW()
    slice_head(w)
    for _ in range(mb_w * mb_h):
        w.ue(25)          # I_PCM
        while len(w.bits) % 8:
            w.u(0, 1)     # pcm_alignment_zero_bit
        for _ in range(256):
            w.u(int(rng.integers(0, 256)), 8)
        for _ in range(128):
            w.u(int(rng.integers(0, 256)), 8)
    return make_sps(mb_w, mb_h) + make_pps() + nal(3, 5, w.rbsp())


_CT_INDEX = [0, 0, 1, 1, 2, 2, 2, 2] + [3] * 9


def write_residual(w, levels, n_coeffs, nc):
    """CAVLC-encode `levels` (scan order, length n_coeffs) — inverse of
    cavlc.decode_residual; supports totals the tests need."""
    nz = [(i, v) for i, v in enumerate(levels) if v]
    total = len(nz)
    # trailing ones: up to 3 |v|==1 at the high-frequency end
    trailing = 0
    for i in range(total - 1, -1, -1):
        if abs(nz[i][1]) == 1 and trailing < 3:
            trailing += 1
        else:
            break
    if nc == -1:
        lut_len = HT.CHROMA_DC_COEFF_TOKEN_LEN
        lut_bits = HT.CHROMA_DC_COEFF_TOKEN_BITS
        sym = total * 4 + trailing
        w.u(lut_bits[sym], lut_len[sym])
    else:
        t = _CT_INDEX[min(nc, 16)]
        sym = total * 4 + trailing
        w.u(HT.COEFF_TOKEN_BITS[t][sym], HT.COEFF_TOKEN_LEN[t][sym])
    if total == 0:
        return 0
    # trailing one signs, highest frequency first
    for i in range(total - 1, total - 1 - trailing, -1):
        w.u(1 if nz[i][1] < 0 else 0, 1)
    # levels, highest-to-lowest frequency after trailing ones
    suffix_length = 1 if (total > 10 and trailing < 3) else 0
    first = True
    for i in range(total - 1 - trailing, -1, -1):
        level = nz[i][1]
        lc = 2 * abs(level) - 2 if level > 0 else -2 * level - 1
        if first and trailing < 3:
            lc -= 2
        first = False
        # encode lc with current suffix_length (small values only)
        if suffix_length == 0:
            if lc < 14:
                w.u(1, lc + 1)                 # lc zeros + 1
            elif lc < 30:
                w.u(1, 15)                     # prefix 14 + 4-bit suffix
                w.u(lc - 14, 4)
            else:
                w.u(1, 16)
                w.u(lc - 30, 12)
        else:
            if (lc >> suffix_length) < 15:
                w.u(1, (lc >> suffix_length) + 1)
                w.u(lc & ((1 << suffix_length) - 1), suffix_length)
            else:
                w.u(1, 16)
                w.u(lc - (15 << suffix_length), 12)
        if suffix_length == 0:
            suffix_length = 1
        if abs(level) > (3 << (suffix_length - 1)) and suffix_length < 6:
            suffix_length += 1
    # total zeros
    tz = nz[-1][0] + 1 - total
    if total < n_coeffs:
        if nc == -1:
            w.u(HT.CHROMA_DC_TOTAL_ZEROS_BITS[total - 1][tz],
                HT.CHROMA_DC_TOTAL_ZEROS_LEN[total - 1][tz])
        else:
            w.u(HT.TOTAL_ZEROS_BITS[total - 1][tz],
                HT.TOTAL_ZEROS_LEN[total - 1][tz])
    else:
        tz = 0
    # run_before, highest frequency first
    zeros_left = tz
    for i in range(total - 1, 0, -1):
        if zeros_left <= 0:
            break
        run = nz[i][0] - nz[i - 1][0] - 1
        tbl = min(zeros_left - 1, 6)
        w.u(HT.RUN_BITS[tbl][run], HT.RUN_LEN[tbl][run])
        zeros_left -= run
    return total


def craft_i16x16(mb_w=4, mb_h=3, pred_mode=2, qp_delta=0, seed=7):
    """All-MB I_16x16, no residual (cbp 0). Border MBs fall back to a
    legal mode (vertical needs top, horizontal needs left, plane both);
    the interior uses `pred_mode`. First MB is PCM so predictions have
    real content to work from."""
    rng = np.random.default_rng(seed)
    w = BW()
    slice_head(w)
    nnz = np.full((mb_h * 4, mb_w * 4), -1, np.int32)
    for idx in range(mb_w * mb_h):
        mbx, mby = idx % mb_w, idx // mb_w
        mode = pred_mode
        if mode in (0, 3) and mby == 0:
            mode = 2
        if mode in (1, 3) and mbx == 0:
            mode = 2
        if idx == 0:
            w.ue(25)
            while len(w.bits) % 8:
                w.u(0, 1)
            for _ in range(384):
                w.u(int(rng.integers(0, 256)), 8)
            nnz[mby * 4:mby * 4 + 4, mbx * 4:mbx * 4 + 4] = 16
            continue
        cmode = 0
        if mode == 3 and mbx > 0 and mby > 0:
            cmode = 3              # chroma plane too
        w.ue(1 + mode)             # I_16x16, cbp 0
        w.ue(cmode)
        w.se(qp_delta)             # mb_qp_delta
        # luma DC block is always coded for I_16x16 — emit total=0 with
        # the context the decoder will compute
        nc = _nc(nnz, mbx * 4, mby * 4)
        write_residual(w, [0] * 16, 16, nc)
        nnz[mby * 4:mby * 4 + 4, mbx * 4:mbx * 4 + 4] = 0
    return make_sps(mb_w, mb_h) + make_pps() + nal(3, 5, w.rbsp())


def _nc(nnz, bx, by):
    left = int(nnz[by, bx - 1]) if bx > 0 else -1
    top = int(nnz[by - 1, bx]) if by > 0 else -1
    if left >= 0 and top >= 0:
        return (left + top + 1) >> 1
    if left >= 0:
        return left
    return top if top >= 0 else 0


def _ours(data, nframes=1):
    par = CodecParameters(codec_type=MediaType.VIDEO, codec_id="h264")
    dec = CodecContext.open_decoder(par)
    frames = dec.decode_all([Packet(data=data, pts=0,
                                    time_base=Rational(1, 25))])
    assert len(frames) == nframes
    return [np.asarray(p) for p in frames[0].planes]


def _ref(data, w, h, tmp_path):
    p = tmp_path / "t.h264"
    p.write_bytes(data)
    raw = subprocess.run(
        [str(refutil.REF), "-v", "error", "-f", "h264", "-i", str(p),
         "-f", "rawvideo", "-"], check=True, capture_output=True).stdout
    n = w * h
    y = np.frombuffer(raw[:n], np.uint8).reshape(h, w)
    u = np.frombuffer(raw[n:n + n // 4], np.uint8).reshape(h // 2, w // 2)
    v = np.frombuffer(raw[n + n // 4:n + n // 2],
                      np.uint8).reshape(h // 2, w // 2)
    return [y, u, v]


@requires_ref
def test_ipcm_exact(tmp_path):
    data = craft_ipcm()
    ours = _ours(data)
    ref = _ref(data, 32, 32, tmp_path)
    for a, b in zip(ours, ref):
        np.testing.assert_array_equal(a, b)


@requires_ref
@pytest.mark.parametrize("mode", [0, 1, 2, 3])
def test_i16x16_pred_modes_exact(tmp_path, mode):
    data = craft_i16x16(pred_mode=mode)
    ours = _ours(data)
    ref = _ref(data, 64, 48, tmp_path)
    for a, b in zip(ours, ref):
        np.testing.assert_array_equal(a, b)


def craft_i16x16_residual(mb_w=4, mb_h=3, seed=3, qp_delta=0):
    """I_16x16 DC-pred MBs with real luma DC+AC and chroma residuals."""
    rng = np.random.default_rng(seed)
    w = BW()
    slice_head(w)
    nnz = np.full((mb_h * 4, mb_w * 4), -1, np.int32)
    nnz_c = [np.full((mb_h * 2, mb_w * 2), -1, np.int32) for _ in range(2)]
    for idx in range(mb_w * mb_h):
        mbx, mby = idx % mb_w, idx // mb_w
        cbp_luma, cbp_chroma = 15, 2
        w.ue(1 + 2 + 4 * cbp_chroma + 12)      # DC pred, cbp 15/2
        w.ue(0)                                # chroma DC pred
        w.se(qp_delta)
        # luma DC: a few small levels
        dc = [0] * 16
        dc[0] = int(rng.integers(-4, 5)) or 1
        dc[2] = int(rng.integers(-2, 3))
        nc = _nc(nnz, mbx * 4, mby * 4)
        write_residual(w, dc, 16, nc)
        # 16 AC blocks in zscan order
        from ffmpeg_tpu.codecs.h264.slice_dec import _BLK_XY
        for blk in range(16):
            dx, dy = _BLK_XY[blk]
            bx, by = mbx * 4 + dx, mby * 4 + dy
            ac = [0] * 15
            n = int(rng.integers(0, 4))
            posv = sorted(rng.choice(15, n, replace=False)) if n else []
            for pv in posv:
                ac[pv] = int(rng.integers(-6, 7)) or 2
            nc = _nc(nnz, bx, by)
            total = write_residual(w, ac, 15, nc)
            nnz[by, bx] = total
        # chroma DC (2 components), then AC
        cdc = []
        for ci in range(2):
            lv = [int(rng.integers(-3, 4)), 0, int(rng.integers(-2, 3)), 0]
            write_residual(w, lv, 4, -1)
            cdc.append(lv)
        for ci in range(2):
            for blk in range(4):
                dx, dy = blk & 1, blk >> 1
                bx, by = mbx * 2 + dx, mby * 2 + dy
                ac = [0] * 15
                if rng.integers(0, 2):
                    ac[int(rng.integers(0, 6))] = int(rng.integers(-3, 4)) or 1
                nc = _nc(nnz_c[ci], bx, by)
                total = write_residual(w, ac, 15, nc)
                nnz_c[ci][by, bx] = total
    return make_sps(mb_w, mb_h) + make_pps() + nal(3, 5, w.rbsp())


_INV_I4_CBP = {v: i for i, v in
               enumerate(HT.GOLOMB_TO_INTRA4X4_CBP)}


def craft_i4x4(mb_w=3, mb_h=3, seed=11, with_residual=True):
    """I_NxN MBs cycling through legal 4x4 modes, optional residual."""
    from ffmpeg_tpu.codecs.h264.slice_dec import _BLK_XY
    rng = np.random.default_rng(seed)
    w = BW()
    slice_head(w)
    nmbx4 = mb_w * 4
    modes_arr = np.full((mb_h * 4, nmbx4), -1, np.int32)
    done = np.zeros((mb_h * 4, nmbx4), bool)
    nnz = np.full((mb_h * 4, mb_w * 4), -1, np.int32)
    nnz_c = [np.full((mb_h * 2, mb_w * 2), -1, np.int32) for _ in range(2)]
    mb_done = np.zeros((mb_h, mb_w), bool)

    def navail(bx, by, mbx, mby):
        if bx < 0 or by < 0 or bx >= nmbx4:
            return False
        if (bx // 4, by // 4) == (mbx, mby):
            return modes_arr[by, bx] >= 0
        return bool(mb_done[by // 4, bx // 4])

    for idx in range(mb_w * mb_h):
        mbx, mby = idx % mb_w, idx // mb_w
        w.ue(0)              # I_NxN
        mb_modes = []
        for blk in range(16):
            dx, dy = _BLK_XY[blk]
            bx, by = mbx * 4 + dx, mby * 4 + dy
            la = navail(bx - 1, by, mbx, mby)
            ta = navail(bx, by - 1, mbx, mby)
            pred = 2
            if la and ta:
                lm = int(modes_arr[by, bx - 1])
                tm = int(modes_arr[by - 1, bx])
                pred = min(lm if lm >= 0 else 2, tm if tm >= 0 else 2)
            # choose a legal mode: need left for 1,4,5,6,8; top for 0,3..7
            legal = [2]
            if ta:
                legal += [0, 3, 7]
            if la:
                legal += [1, 8]
            if ta and la:
                legal += [4, 5, 6]
            mode = int(legal[rng.integers(0, len(legal))])
            if mode == pred:
                w.u(1, 1)
            else:
                w.u(0, 1)
                w.u(mode if mode < pred else mode - 1, 3)
            modes_arr[by, bx] = mode
            mb_modes.append(mode)
        w.ue(0)              # chroma DC pred
        cbp_luma = 15 if with_residual else 0
        cbp_chroma = 0
        w.ue(_INV_I4_CBP[cbp_luma + 16 * cbp_chroma])
        if cbp_luma or cbp_chroma:
            w.se(0)          # mb_qp_delta
        if cbp_luma:
            for blk in range(16):
                dx, dy = _BLK_XY[blk]
                bx, by = mbx * 4 + dx, mby * 4 + dy
                lv = [0] * 16
                n = int(rng.integers(0, 5))
                posv = sorted(rng.choice(16, n, replace=False)) if n else []
                for pv in posv:
                    lv[pv] = int(rng.integers(-8, 9)) or 3
                nc = _nc(nnz, bx, by)
                total = write_residual(w, lv, 16, nc)
                nnz[by, bx] = total
        else:
            nnz[mby * 4:mby * 4 + 4, mbx * 4:mbx * 4 + 4] = 0
        for ci in range(2):
            nnz_c[ci][mby * 2:mby * 2 + 2, mbx * 2:mbx * 2 + 2] = 0
        mb_done[mby, mbx] = True
    return make_sps(mb_w, mb_h) + make_pps() + nal(3, 5, w.rbsp())


@requires_ref
def test_i16x16_with_residual_exact(tmp_path):
    data = craft_i16x16_residual()
    ours = _ours(data)
    ref = _ref(data, 64, 48, tmp_path)
    for a, b in zip(ours, ref):
        np.testing.assert_array_equal(a, b)


@requires_ref
def test_i16x16_qp_delta_exact(tmp_path):
    # qp_delta -1 per MB: exercises the qp chain without wrapping into
    # coefficient magnitudes that overflow the reference's int16 blocks
    data = craft_i16x16_residual(seed=9, qp_delta=-1)
    ours = _ours(data)
    ref = _ref(data, 64, 48, tmp_path)
    for a, b in zip(ours, ref):
        np.testing.assert_array_equal(a, b)


@requires_ref
def test_i4x4_modes_exact(tmp_path):
    data = craft_i4x4(with_residual=False)
    ours = _ours(data)
    ref = _ref(data, 48, 48, tmp_path)
    for a, b in zip(ours, ref):
        np.testing.assert_array_equal(a, b)


@requires_ref
def test_i4x4_with_residual_exact(tmp_path):
    data = craft_i4x4(with_residual=True, seed=13)
    ours = _ours(data)
    ref = _ref(data, 48, 48, tmp_path)
    for a, b in zip(ours, ref):
        np.testing.assert_array_equal(a, b)


@requires_ref
def test_deblocking_filter_exact(tmp_path):
    """Same residual-rich stream, deblocking ON — the in-loop filter must
    match the reference bit-exactly."""
    import test_h264 as me
    orig = me.slice_head

    def head_with_deblock(w, qp_delta=0, disable_deblock=False):
        orig(w, qp_delta, disable_deblock)
    me.slice_head = head_with_deblock
    try:
        data = craft_i16x16_residual(seed=5)
        data2 = craft_i4x4(with_residual=True, seed=17)
    finally:
        me.slice_head = orig
    for stream, (w, h) in ((data, (64, 48)), (data2, (48, 48))):
        ours = _ours(stream)
        ref = _ref(stream, w, h, tmp_path)
        for a, b in zip(ours, ref):
            np.testing.assert_array_equal(a, b)


def p_slice_head(w, frame_num=1, disable_deblock=True, num_ref=1):
    w.ue(0)               # first_mb
    w.ue(5)               # slice_type: P (all slices)
    w.ue(0)               # pps_id
    w.u(frame_num & 0xFF, 8)
    w.u(0, 8)             # poc lsb
    if num_ref > 1:
        w.u(1, 1)         # num_ref_idx_active_override
        w.ue(num_ref - 1)
    else:
        w.u(0, 1)
    w.u(0, 1)             # ref_pic_list_modification
    w.u(0, 1)             # adaptive_ref_pic_marking
    w.se(0)               # slice_qp_delta
    w.ue(1 if disable_deblock else 0)
    if not disable_deblock:
        w.se(0)
        w.se(0)


def craft_p_frame(mb_w=4, mb_h=3, frame_num=1, seed=0, deblock=False,
                  with_residual=True, num_ref=1):
    """P frame: mix of skip runs, P_16x16/16x8/8x16 with random mvds and
    optional residual. num_ref=2 exercises te(v) ref_idx fields."""
    rng = np.random.default_rng(seed)
    w = BW()
    if num_ref > 1:
        p_slice_head(w, frame_num, disable_deblock=not deblock,
                     num_ref=num_ref)
    else:
        p_slice_head(w, frame_num, disable_deblock=not deblock)
    nnz = np.full((mb_h * 4, mb_w * 4), -1, np.int32)
    nnz_c = [np.full((mb_h * 2, mb_w * 2), -1, np.int32) for _ in range(2)]
    idx = 0
    n = mb_w * mb_h
    while idx < n:
        # occasional skip run
        run = int(rng.integers(0, 3)) if idx > 0 and n - idx > 2 else 0
        w.ue(run)
        for _ in range(run):
            mbx, mby = idx % mb_w, idx // mb_w
            nnz[mby * 4:mby * 4 + 4, mbx * 4:mbx * 4 + 4] = 0
            for c in nnz_c:
                c[mby * 2:mby * 2 + 2, mbx * 2:mbx * 2 + 2] = 0
            idx += 1
        if idx >= n:
            break
        mbx, mby = idx % mb_w, idx // mb_w
        mb_type = int(rng.integers(0, 4))
        w.ue(mb_type)
        if mb_type == 3:                        # P_8x8
            subs = [int(rng.integers(0, 4)) for _ in range(4)]
            for st in subs:
                w.ue(st)
            if num_ref == 2:                    # per-8x8 te(v) ref_idx
                for _ in range(4):
                    w.u(1 - int(rng.integers(0, 2)), 1)
            nparts = sum((1, 2, 2, 4)[st] for st in subs)
        else:
            nparts = 1 if mb_type == 0 else 2
            if num_ref == 2:                    # per-partition ref_idx
                for _ in range(nparts):
                    w.u(1 - int(rng.integers(0, 2)), 1)
        for _ in range(nparts):
            w.se(int(rng.integers(-10, 11)))    # mvd x (quarter pel)
            w.se(int(rng.integers(-10, 11)))    # mvd y
        if with_residual and rng.integers(0, 2):
            cbp_luma, cbp_chroma = 15, int(rng.integers(0, 3))
        else:
            cbp_luma, cbp_chroma = 0, 0
        cbp = cbp_luma + 16 * cbp_chroma
        code = HT.GOLOMB_TO_INTER_CBP.index(cbp)
        w.ue(code)
        if cbp:
            w.se(0)
        from ffmpeg_tpu.codecs.h264.slice_dec import _BLK_XY
        if cbp_luma:
            for blk in range(16):
                dx, dy = _BLK_XY[blk]
                bx, by = mbx * 4 + dx, mby * 4 + dy
                lv = [0] * 16
                nlv = int(rng.integers(0, 3))
                posv = sorted(rng.choice(16, nlv, replace=False)) \
                    if nlv else []
                for pv in posv:
                    lv[pv] = int(rng.integers(-5, 6)) or 1
                nc = _nc(nnz, bx, by)
                total = write_residual(w, lv, 16, nc)
                nnz[by, bx] = total
        else:
            nnz[mby * 4:mby * 4 + 4, mbx * 4:mbx * 4 + 4] = 0
        if cbp_chroma:
            for ci in range(2):
                lv = [int(rng.integers(-2, 3)), 0, 0, 0]
                write_residual(w, lv, 4, -1)
            for ci in range(2):
                for blk in range(4):
                    dx, dy = blk & 1, blk >> 1
                    bx, by = mbx * 2 + dx, mby * 2 + dy
                    ac = [0] * 15
                    if cbp_chroma == 2 and rng.integers(0, 2):
                        ac[int(rng.integers(0, 5))] = \
                            int(rng.integers(-2, 3)) or 1
                    if cbp_chroma == 2:
                        nc = _nc(nnz_c[ci], bx, by)
                        total = write_residual(w, ac, 15, nc)
                        nnz_c[ci][by, bx] = total
                    else:
                        nnz_c[ci][by, bx] = 0
        else:
            for ci in range(2):
                nnz_c[ci][mby * 2:mby * 2 + 2, mbx * 2:mbx * 2 + 2] = 0
        idx += 1
    return nal(2, 1, w.rbsp())


@requires_ref
def test_p_slices_exact(tmp_path):
    ref_frame = craft_i16x16_residual(seed=4)
    stream = ref_frame
    for i in range(3):
        stream += craft_p_frame(frame_num=i + 1, seed=30 + i)
    p = tmp_path / "p.h264"
    p.write_bytes(stream)
    par = CodecParameters(codec_type=MediaType.VIDEO, codec_id="h264")
    dec = CodecContext.open_decoder(par)
    frames = dec.decode_all([Packet(data=stream, pts=0,
                                    time_base=Rational(1, 25))])
    assert len(frames) == 4
    raw = subprocess.run(
        [str(refutil.REF), "-v", "error", "-f", "h264", "-i", str(p),
         "-f", "rawvideo", "-"], check=True, capture_output=True).stdout
    sz = 64 * 48 * 3 // 2
    assert len(raw) == 4 * sz
    for i, f in enumerate(frames):
        got = np.concatenate([np.asarray(pl).ravel() for pl in f.planes])
        want = np.frombuffer(raw[i * sz:(i + 1) * sz], np.uint8)
        np.testing.assert_array_equal(got, want, err_msg=f"frame {i}")


@requires_ref
def test_p_slices_with_deblock_exact(tmp_path):
    ref_frame = craft_i16x16_residual(seed=8)
    stream = ref_frame + craft_p_frame(frame_num=1, seed=44, deblock=True)
    p = tmp_path / "pd.h264"
    p.write_bytes(stream)
    par = CodecParameters(codec_type=MediaType.VIDEO, codec_id="h264")
    dec = CodecContext.open_decoder(par)
    frames = dec.decode_all([Packet(data=stream, pts=0,
                                    time_base=Rational(1, 25))])
    raw = subprocess.run(
        [str(refutil.REF), "-v", "error", "-f", "h264", "-i", str(p),
         "-f", "rawvideo", "-"], check=True, capture_output=True).stdout
    sz = 64 * 48 * 3 // 2
    for i, f in enumerate(frames):
        got = np.concatenate([np.asarray(pl).ravel() for pl in f.planes])
        want = np.frombuffer(raw[i * sz:(i + 1) * sz], np.uint8)
        np.testing.assert_array_equal(got, want, err_msg=f"frame {i}")


@requires_ref
def test_full_gop_all_deblocked(tmp_path):
    """I + 3 P frames, every frame deblocked — P references the filtered
    reconstruction, so any filter divergence compounds and gets caught."""
    import test_h264 as me
    orig = me.slice_head

    def head_deblock(w, qp_delta=0, disable_deblock=False):
        orig(w, qp_delta, disable_deblock)
    me.slice_head = head_deblock
    try:
        stream = craft_i16x16_residual(seed=2)
    finally:
        me.slice_head = orig
    for i in range(3):
        stream += craft_p_frame(frame_num=i + 1, seed=60 + i, deblock=True)
    p = tmp_path / "gop.h264"
    p.write_bytes(stream)
    par = CodecParameters(codec_type=MediaType.VIDEO, codec_id="h264")
    dec = CodecContext.open_decoder(par)
    frames = dec.decode_all([Packet(data=stream, pts=0,
                                    time_base=Rational(1, 25))])
    raw = subprocess.run(
        [str(refutil.REF), "-v", "error", "-f", "h264", "-i", str(p),
         "-f", "rawvideo", "-"], check=True, capture_output=True).stdout
    sz = 64 * 48 * 3 // 2
    assert len(frames) == len(raw) // sz == 4
    for i, f in enumerate(frames):
        got = np.concatenate([np.asarray(pl).ravel() for pl in f.planes])
        want = np.frombuffer(raw[i * sz:(i + 1) * sz], np.uint8)
        np.testing.assert_array_equal(got, want, err_msg=f"frame {i}")


def test_avcc_extradata_path():
    """Same stream packaged MP4-style: AVCC extradata + length-prefixed
    NALs must decode identically to Annex B."""
    from ffmpeg_tpu.codecs.h264 import nal as N
    stream = craft_i4x4(with_residual=True, seed=13)
    units = N.split_annexb(stream)
    sps = [u for u in units if (u[0] & 0x1F) == 7][0]
    pps = [u for u in units if (u[0] & 0x1F) == 8][0]
    idr = [u for u in units if (u[0] & 0x1F) == 5][0]
    avcc = (b"\x01" + sps[1:4] + b"\xff\xe1"
            + len(sps).to_bytes(2, "big") + sps
            + b"\x01" + len(pps).to_bytes(2, "big") + pps)
    par = CodecParameters(codec_type=MediaType.VIDEO, codec_id="h264",
                          extradata=avcc)
    dec = CodecContext.open_decoder(par)
    payload = len(idr).to_bytes(4, "big") + idr
    frames = dec.decode_all([Packet(data=payload, pts=0,
                                    time_base=Rational(1, 25))])
    assert len(frames) == 1
    # annexb route for comparison
    ours = _ours(stream)
    for a, b in zip(frames[0].planes, ours):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def b_slice_head(w, frame_num, poc_lsb, deblock=False):
    w.ue(0)               # first_mb
    w.ue(6)               # slice_type: B (all slices)
    w.ue(0)               # pps_id
    w.u(frame_num & 0xFF, 8)
    w.u(poc_lsb & 0xFF, 8)
    w.u(1, 1)             # direct_spatial_mv_pred_flag
    w.u(0, 1)             # num_ref_idx_active_override
    w.u(0, 1)             # ref_pic_list_modification l0
    w.u(0, 1)             # ref_pic_list_modification l1
    # nal_ref_idc == 0 -> no dec_ref_pic_marking
    w.se(0)               # slice_qp_delta
    w.ue(1 if not deblock else 0)
    if not deblock:
        return
    w.se(0)
    w.se(0)


_B_MASKS = {0: (None, ()), 1: ("16x16", (1,)), 2: ("16x16", (2,)),
            3: ("16x16", (3,)),
            4: ("16x8", (1, 1)), 5: ("8x16", (1, 1)),
            6: ("16x8", (2, 2)), 7: ("8x16", (2, 2)),
            8: ("16x8", (1, 2)), 9: ("8x16", (1, 2)),
            10: ("16x8", (2, 1)), 11: ("8x16", (2, 1)),
            12: ("16x8", (1, 3)), 13: ("8x16", (1, 3)),
            14: ("16x8", (2, 3)), 15: ("8x16", (2, 3)),
            16: ("16x8", (3, 1)), 17: ("8x16", (3, 1)),
            18: ("16x8", (3, 2)), 19: ("8x16", (3, 2)),
            20: ("16x8", (3, 3)), 21: ("8x16", (3, 3))}


def craft_b_frame(mb_w=4, mb_h=3, frame_num=2, poc_lsb=2, seed=0,
                  deblock=False, with_residual=True):
    rng = np.random.default_rng(seed)
    w = BW()
    b_slice_head(w, frame_num, poc_lsb, deblock=deblock)
    nnz = np.full((mb_h * 4, mb_w * 4), -1, np.int32)
    nnz_c = [np.full((mb_h * 2, mb_w * 2), -1, np.int32) for _ in range(2)]
    idx = 0
    n = mb_w * mb_h
    while idx < n:
        run = int(rng.integers(0, 2)) if idx > 0 and n - idx > 2 else 0
        w.ue(run)
        for _ in range(run):
            mbx, mby = idx % mb_w, idx // mb_w
            nnz[mby * 4:mby * 4 + 4, mbx * 4:mbx * 4 + 4] = 0
            for c in nnz_c:
                c[mby * 2:mby * 2 + 2, mbx * 2:mbx * 2 + 2] = 0
            idx += 1
        if idx >= n:
            break
        mbx, mby = idx % mb_w, idx // mb_w
        mb_type = int(rng.choice([0, 1, 2, 3, 3, 8, 9, 10, 12, 16, 20, 21]))
        w.ue(mb_type)
        shape, masks = _B_MASKS[mb_type]
        nparts = len(masks)
        for lst in range(2):
            for m in masks:
                if m & (1 << lst):
                    w.se(int(rng.integers(-8, 9)))
                    w.se(int(rng.integers(-8, 9)))
        if with_residual and rng.integers(0, 2):
            cbp_luma, cbp_chroma = 15, int(rng.integers(0, 3))
        else:
            cbp_luma, cbp_chroma = 0, 0
        cbp = cbp_luma + 16 * cbp_chroma
        w.ue(HT.GOLOMB_TO_INTER_CBP.index(cbp))
        if cbp:
            w.se(0)
        from ffmpeg_tpu.codecs.h264.slice_dec import _BLK_XY
        if cbp_luma:
            for blk in range(16):
                dx, dy = _BLK_XY[blk]
                bx, by = mbx * 4 + dx, mby * 4 + dy
                lv = [0] * 16
                nlv = int(rng.integers(0, 3))
                posv = sorted(rng.choice(16, nlv, replace=False)) \
                    if nlv else []
                for pv in posv:
                    lv[pv] = int(rng.integers(-4, 5)) or 1
                nc = _nc(nnz, bx, by)
                total = write_residual(w, lv, 16, nc)
                nnz[by, bx] = total
        else:
            nnz[mby * 4:mby * 4 + 4, mbx * 4:mbx * 4 + 4] = 0
        if cbp_chroma:
            for ci in range(2):
                write_residual(w, [int(rng.integers(-2, 3)), 0, 0, 0],
                               4, -1)
            for ci in range(2):
                for blk in range(4):
                    dx, dy = blk & 1, blk >> 1
                    bx, by = mbx * 2 + dx, mby * 2 + dy
                    if cbp_chroma == 2:
                        ac = [0] * 15
                        if rng.integers(0, 2):
                            ac[int(rng.integers(0, 5))] = \
                                int(rng.integers(-2, 3)) or 1
                        nc = _nc(nnz_c[ci], bx, by)
                        total = write_residual(w, ac, 15, nc)
                        nnz_c[ci][by, bx] = total
                    else:
                        nnz_c[ci][by, bx] = 0
        else:
            for ci in range(2):
                nnz_c[ci][mby * 2:mby * 2 + 2, mbx * 2:mbx * 2 + 2] = 0
        idx += 1
    return nal(0, 1, w.rbsp())


def craft_p_frame_poc(frame_num, poc_lsb, seed, deblock=False):
    """craft_p_frame but with an explicit poc."""
    import test_h264 as me
    orig = me.p_slice_head

    def head(w, fn=1, disable_deblock=True):
        w.ue(0)
        w.ue(5)
        w.ue(0)
        w.u(fn & 0xFF, 8)
        w.u(poc_lsb & 0xFF, 8)
        w.u(0, 1)
        w.u(0, 1)
        w.u(0, 1)
        w.se(0)
        w.ue(1 if disable_deblock else 0)
        if not disable_deblock:
            w.se(0)
            w.se(0)
    me.p_slice_head = head
    try:
        return craft_p_frame(frame_num=frame_num, seed=seed,
                             deblock=deblock)
    finally:
        me.p_slice_head = orig


@requires_ref
@pytest.mark.parametrize("seed", [0, 3])
def test_b_frames_exact(tmp_path, seed):
    """IDR(poc0) P(poc4) B(poc2) with 2 reference slots: the B's L0 is
    the IDR and L1 the P; display order I,B,P must match the reference
    sample-exactly."""
    import test_h264 as me
    orig = me.make_sps
    me.make_sps = lambda mb_w=4, mb_h=3: orig(mb_w, mb_h, num_ref=2)
    try:
        stream = craft_i16x16_residual(seed=seed)      # poc 0
    finally:
        me.make_sps = orig
    stream += craft_p_frame_poc(1, 4, 50 + seed)       # poc 4
    stream += craft_b_frame(frame_num=2, poc_lsb=2, seed=60 + seed)
    p = tmp_path / "b.h264"
    p.write_bytes(stream)
    par = CodecParameters(codec_type=MediaType.VIDEO, codec_id="h264")
    dec = CodecContext.open_decoder(par)
    frames = dec.decode_all([Packet(data=stream, pts=0,
                                    time_base=Rational(1, 25))])
    raw = subprocess.run(
        [str(refutil.REF), "-v", "error", "-f", "h264", "-i", str(p),
         "-f", "rawvideo", "-"], check=True, capture_output=True).stdout
    sz = 64 * 48 * 3 // 2
    assert len(frames) == len(raw) // sz == 3
    for i, f in enumerate(frames):
        got = np.concatenate([np.asarray(pl).ravel() for pl in f.planes])
        want = np.frombuffer(raw[i * sz:(i + 1) * sz], np.uint8)
        np.testing.assert_array_equal(got, want, err_msg=f"frame {i}")


@requires_ref
def test_h264_in_mp4_end_to_end(tmp_path):
    """Crafted h264 wrapped in MP4 by the reference → our mov demuxer
    (AVCC extradata + length-prefixed samples) → our decoder, byte-exact."""
    raw = tmp_path / "s.h264"
    raw.write_bytes(craft_i4x4(with_residual=True, seed=13)
                    + craft_i4x4(with_residual=True, seed=29))
    mp4 = tmp_path / "s.mp4"
    subprocess.run([str(refutil.REF), "-v", "error", "-f", "h264",
                    "-r", "25", "-i", str(raw), "-c", "copy",
                    "-y", str(mp4)], check=True, capture_output=True)
    from ffmpeg_tpu.io import open_input
    d = open_input(str(mp4))
    vst = [s for s in d.streams if s.codecpar.codec_id == "h264"][0]
    dec = CodecContext.open_decoder(vst.codecpar)
    pkts = [p for p in d.packets() if p.stream_index == vst.index]
    frames = dec.decode_all(pkts)
    assert len(frames) == 2
    want = _ours(raw.read_bytes(), nframes=2)
    got = [np.asarray(p) for p in frames[0].planes]
    for a, b in zip(got, want):
        np.testing.assert_array_equal(a, b)


@requires_ref
@pytest.mark.parametrize("seed", [0, 5])
def test_p_multiref_exact(tmp_path, seed):
    """P slices with two active L0 references (te(v) ref_idx on 16x16/
    16x8/8x16/P_8x8 partitions): each partition picks ref 0 or 1, so
    motion compensation must read the right DPB picture and the mv
    median predictor must match against the partition's refIdx."""
    import test_h264 as me
    orig = me.make_sps
    me.make_sps = lambda mb_w=4, mb_h=3: orig(mb_w, mb_h, num_ref=2)
    try:
        stream = craft_i16x16_residual(seed=seed)
    finally:
        me.make_sps = orig
    stream += craft_p_frame(frame_num=1, seed=80 + seed)
    stream += craft_p_frame(frame_num=2, seed=90 + seed, num_ref=2)
    stream += craft_p_frame(frame_num=3, seed=95 + seed, num_ref=2,
                            deblock=True)
    p = tmp_path / "mref.h264"
    p.write_bytes(stream)
    par = CodecParameters(codec_type=MediaType.VIDEO, codec_id="h264")
    dec = CodecContext.open_decoder(par)
    frames = dec.decode_all([Packet(data=stream, pts=0,
                                    time_base=Rational(1, 25))])
    raw = subprocess.run(
        [str(refutil.REF), "-v", "error", "-f", "h264", "-i", str(p),
         "-f", "rawvideo", "-"], check=True, capture_output=True).stdout
    sz = 64 * 48 * 3 // 2
    assert len(frames) == len(raw) // sz == 4
    for i, f in enumerate(frames):
        got = np.concatenate([np.asarray(pl).ravel() for pl in f.planes])
        want = np.frombuffer(raw[i * sz:(i + 1) * sz], np.uint8)
        np.testing.assert_array_equal(got, want, err_msg=f"frame {i}")


def b_slice_head_temporal(w, frame_num, poc_lsb):
    """B slice header with direct_spatial_mv_pred_flag = 0."""
    w.ue(0)
    w.ue(6)
    w.ue(0)
    w.u(frame_num & 0xFF, 8)
    w.u(poc_lsb & 0xFF, 8)
    w.u(0, 1)             # temporal direct
    w.u(0, 1)
    w.u(0, 1)
    w.u(0, 1)
    w.se(0)
    w.ue(1)


def craft_b_temporal(mb_w=4, mb_h=3, frame_num=2, poc_lsb=2, seed=0):
    """All-direct/skip B frame under temporal direct mode: the MVs
    come entirely from scaling the co-located P MVs (8.4.1.2.3)."""
    rng = np.random.default_rng(seed)
    w = BW()
    b_slice_head_temporal(w, frame_num, poc_lsb)
    n = mb_w * mb_h
    idx = 0
    while idx < n:
        run = int(rng.integers(0, 3)) if 0 < idx < n - 1 else 0
        run = min(run, n - idx)
        w.ue(run)
        idx += run
        if idx >= n:
            break
        w.ue(0)            # B_Direct_16x16
        w.ue(HT.GOLOMB_TO_INTER_CBP.index(0))
        idx += 1
    return nal(0, 1, w.rbsp())


@requires_ref
@pytest.mark.parametrize("seed", [0, 4, 9])
def test_b_temporal_direct_exact(tmp_path, seed):
    """IDR(poc0) P(poc4) B(poc2, temporal direct): co-located MV
    scaling must match the reference sample-exactly."""
    import test_h264 as me
    orig = me.make_sps
    me.make_sps = lambda mb_w=4, mb_h=3: orig(mb_w, mb_h, num_ref=2)
    try:
        stream = craft_i16x16_residual(seed=seed)
    finally:
        me.make_sps = orig
    stream += craft_p_frame_poc(1, 4, 50 + seed)
    stream += craft_b_temporal(frame_num=2, poc_lsb=2,
                               seed=60 + seed)
    p = tmp_path / "bt.h264"
    p.write_bytes(stream)
    par = CodecParameters(codec_type=MediaType.VIDEO,
                          codec_id="h264")
    dec = CodecContext.open_decoder(par)
    frames = dec.decode_all([Packet(data=stream, pts=0,
                                    time_base=Rational(1, 25))])
    raw = subprocess.run(
        [str(refutil.REF), "-v", "error", "-f", "h264", "-i",
         str(p), "-f", "rawvideo", "-"],
        check=True, capture_output=True).stdout
    sz = 64 * 48 * 3 // 2
    assert len(frames) == len(raw) // sz == 3
    for i, f in enumerate(frames):
        got = np.concatenate([np.asarray(pl).ravel()
                              for pl in f.planes])
        want = np.frombuffer(raw[i * sz:(i + 1) * sz], np.uint8)
        np.testing.assert_array_equal(got, want,
                                      err_msg=f"frame {i}")


_SUB_MASK_B = {1: 1, 2: 2, 3: 3, 4: 1, 5: 1, 6: 2, 7: 2, 8: 3,
               9: 3, 10: 1, 11: 2, 12: 3}
_SUB_NPART_B = {1: 1, 2: 1, 3: 1, 4: 2, 5: 2, 6: 2, 7: 2, 8: 2,
                9: 2, 10: 4, 11: 4, 12: 4}


def craft_b8x8_frame(mb_w=4, mb_h=3, frame_num=2, poc_lsb=2, seed=0,
                     spatial=True, sub_pool=None):
    """B frame of B_8x8 MBs with random sub types (incl.
    B_Direct_8x8)."""
    rng = np.random.default_rng(seed)
    w = BW()
    if spatial:
        b_slice_head(w, frame_num, poc_lsb)
    else:
        b_slice_head_temporal(w, frame_num, poc_lsb)
    pool = sub_pool or list(range(13))
    for idx in range(mb_w * mb_h):
        w.ue(0)
        w.ue(22)
        subs = [int(rng.choice(pool)) for _ in range(4)]
        for st in subs:
            w.ue(st)
        for lst in range(2):
            for st in subs:
                if st and (_SUB_MASK_B[st] & (1 << lst)):
                    for _ in range(_SUB_NPART_B[st]):
                        w.se(int(rng.integers(-6, 7)))
                        w.se(int(rng.integers(-6, 7)))
        w.ue(HT.GOLOMB_TO_INTER_CBP.index(0))
    return nal(0, 1, w.rbsp())


@requires_ref
@pytest.mark.parametrize("seed,spatial", [(7, True), (21, True),
                                          (33, False), (44, False)])
def test_b8x8_partitions_exact(tmp_path, seed, spatial):
    """B_8x8 sub-macroblocks (all 13 sub types) under spatial and
    temporal direct."""
    import test_h264 as me
    orig = me.make_sps
    me.make_sps = lambda mb_w=4, mb_h=3: orig(mb_w, mb_h, num_ref=2)
    try:
        stream = craft_i16x16_residual(seed=3)
    finally:
        me.make_sps = orig
    stream += craft_p_frame_poc(1, 4, 53)
    stream += craft_b8x8_frame(seed=seed, spatial=spatial)
    p = tmp_path / "b8.h264"
    p.write_bytes(stream)
    par = CodecParameters(codec_type=MediaType.VIDEO,
                          codec_id="h264")
    dec = CodecContext.open_decoder(par)
    frames = dec.decode_all([Packet(data=stream, pts=0,
                                    time_base=Rational(1, 25))])
    raw = subprocess.run(
        [str(refutil.REF), "-v", "error", "-f", "h264", "-i",
         str(p), "-f", "rawvideo", "-"],
        check=True, capture_output=True).stdout
    sz = 64 * 48 * 3 // 2
    assert len(frames) == len(raw) // sz == 3
    for i, f in enumerate(frames):
        got = np.concatenate([np.asarray(pl).ravel()
                              for pl in f.planes])
        want = np.frombuffer(raw[i * sz:(i + 1) * sz], np.uint8)
        np.testing.assert_array_equal(got, want,
                                      err_msg=f"frame {i}")


def make_pps_constrained():
    w = BW()
    w.ue(0)
    w.ue(0)
    w.u(0, 1)
    w.u(0, 1)
    w.ue(0)
    w.ue(0)
    w.ue(0)
    w.u(0, 1)
    w.u(0, 2)
    w.se(0)
    w.se(0)
    w.se(0)
    w.u(1, 1)
    w.u(1, 1)             # constrained_intra_pred
    w.u(0, 1)
    return nal(3, 8, w.rbsp())


def craft_p_with_intra_mbs(seed=0):
    """P frame mixing P_16x16 and I_16x16 MBs (intra islands)."""
    rng = np.random.default_rng(seed)
    w = BW()
    p_slice_head(w, 1)
    nnz = np.full((12, 16), -1, np.int32)
    for idx in range(12):
        mbx, mby = idx % 4, idx // 4
        w.ue(0)
        if idx % 3 == 1:
            w.ue(5 + 3)       # I_16x16 DC, cbp 0 (P-slice offset 5)
            w.ue(0)
            w.se(0)
            lv = [0] * 16
            for ppos in sorted(rng.choice(16, 2, replace=False)):
                lv[ppos] = int(rng.integers(-5, 6)) or 1
            nc = _nc(nnz, mbx * 4, mby * 4)
            t = write_residual(w, lv, 16, nc)
            nnz[mby * 4:mby * 4 + 4, mbx * 4:mbx * 4 + 4] = t
        else:
            w.ue(0)
            w.se(int(rng.integers(-8, 9)))
            w.se(int(rng.integers(-8, 9)))
            w.ue(HT.GOLOMB_TO_INTER_CBP.index(0))
            nnz[mby * 4:mby * 4 + 4, mbx * 4:mbx * 4 + 4] = 0
    return nal(2, 1, w.rbsp())


@requires_ref
@pytest.mark.parametrize("seed", [5, 12])
def test_constrained_intra_pred_exact(tmp_path, seed):
    """constrained_intra_pred_flag: intra MBs in P slices must not
    predict from inter neighbours."""
    import test_h264 as me
    orig = me.make_pps
    me.make_pps = make_pps_constrained
    try:
        stream = craft_i16x16_residual(seed=3)
    finally:
        me.make_pps = orig
    stream += craft_p_with_intra_mbs(seed)
    p = tmp_path / "ci.h264"
    p.write_bytes(stream)
    par = CodecParameters(codec_type=MediaType.VIDEO,
                          codec_id="h264")
    dec = CodecContext.open_decoder(par)
    frames = dec.decode_all([Packet(data=stream, pts=0,
                                    time_base=Rational(1, 25))])
    raw = subprocess.run(
        [str(refutil.REF), "-v", "error", "-f", "h264", "-i",
         str(p), "-f", "rawvideo", "-"],
        check=True, capture_output=True).stdout
    got = np.concatenate(
        [np.concatenate([np.asarray(pl).ravel() for pl in f.planes])
         for f in frames])
    np.testing.assert_array_equal(got, np.frombuffer(raw, np.uint8))


def _head_longterm(w, fn, poc, num_ref=1, reorder_lt=None,
                   mmco6=None):
    w.ue(0)
    w.ue(5)
    w.ue(0)
    w.u(fn & 0xFF, 8)
    w.u(poc & 0xFF, 8)
    if num_ref > 1:
        w.u(1, 1)
        w.ue(num_ref - 1)
    else:
        w.u(0, 1)
    if reorder_lt is not None:
        w.u(1, 1)
        w.ue(2)               # idc 2: long_term_pic_num
        w.ue(reorder_lt)
        w.ue(3)
    else:
        w.u(0, 1)
    if mmco6 is not None:
        w.u(1, 1)
        w.ue(6)               # mmco 6: mark current long-term
        w.ue(mmco6)
        w.ue(0)
    else:
        w.u(0, 1)
    w.se(0)
    w.ue(1)


def craft_p_longterm(fn, poc, seed, num_ref=1, reorder_lt=None,
                     mmco6=None):
    import test_h264 as me
    orig = me.p_slice_head

    def head(w, *a, **kw):
        _head_longterm(w, fn, poc, num_ref, reorder_lt, mmco6)

    me.p_slice_head = head
    try:
        return craft_p_frame(frame_num=fn, seed=seed,
                             num_ref=num_ref)
    finally:
        me.p_slice_head = orig


@requires_ref
@pytest.mark.parametrize("seed", [0, 6])
def test_long_term_references_exact(tmp_path, seed):
    """MMCO 6 (mark current long-term), long-term list modification
    (idc 2), and sliding window coexisting with a long-term entry."""
    import test_h264 as me
    orig = me.make_sps
    me.make_sps = lambda mb_w=4, mb_h=3: orig(mb_w, mb_h, num_ref=3)
    try:
        stream = craft_i16x16_residual(seed=3 + seed)
    finally:
        me.make_sps = orig
    stream += craft_p_longterm(1, 2, 50 + seed, mmco6=0)
    stream += craft_p_longterm(2, 4, 51 + seed)
    stream += craft_p_longterm(3, 6, 52 + seed, num_ref=2,
                               reorder_lt=0)
    stream += craft_p_longterm(4, 8, 54 + seed, num_ref=2)
    p = tmp_path / "lt.h264"
    p.write_bytes(stream)
    par = CodecParameters(codec_type=MediaType.VIDEO,
                          codec_id="h264")
    dec = CodecContext.open_decoder(par)
    frames = dec.decode_all([Packet(data=stream, pts=0,
                                    time_base=Rational(1, 25))])
    raw = subprocess.run(
        [str(refutil.REF), "-v", "error", "-f", "h264", "-i",
         str(p), "-f", "rawvideo", "-"],
        check=True, capture_output=True).stdout
    assert len(frames) == 5
    got = np.concatenate(
        [np.concatenate([np.asarray(pl).ravel() for pl in f.planes])
         for f in frames])
    np.testing.assert_array_equal(got, np.frombuffer(raw, np.uint8))
