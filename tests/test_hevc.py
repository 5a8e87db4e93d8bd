"""HEVC I-slice decoder tests: crafted streams (our CABAC encoder
driving the same syntax walker) cross-checked against the reference
decoder, mirroring the H.264 test strategy."""

import subprocess

import numpy as np
import pytest

import refutil
from conftest import requires_ref

from test_h264 import BW

from ffmpeg_tpu.codecs import CodecContext
from ffmpeg_tpu.codecs.h264.cabac import CabacEncoder
from ffmpeg_tpu.codecs.hevc import params as HP
from ffmpeg_tpu.codecs.hevc.ctu import CtuCoder, FrameDec
from ffmpeg_tpu.core.packet import Packet
from ffmpeg_tpu.io.stream import CodecParameters, MediaType
from ffmpeg_tpu.utils.rational import Rational

W, H = 64, 64


def _escape(rbsp: bytes) -> bytes:
    out = bytearray()
    zeros = 0
    for b in rbsp:
        if zeros >= 2 and b <= 3:
            out.append(3)
            zeros = 0
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


def hnal(ntype: int, rbsp: bytes) -> bytes:
    return b"\x00\x00\x00\x01" + bytes([(ntype << 1) & 0x7E, 1]) \
        + _escape(rbsp)


def _ptl(w, profile=1):
    w.u(0, 2)            # profile_space
    w.u(0, 1)            # tier
    w.u(profile, 5)      # 1 = Main, 2 = Main10
    for i in range(32):
        w.u(1 if i == profile else 0, 1)  # compatibility flags
    w.u(1, 1)            # progressive_source
    w.u(0, 1)            # interlaced
    w.u(0, 1)            # non_packed
    w.u(1, 1)            # frame_only
    for _ in range(44):
        w.u(0, 1)        # reserved_zero_44bits
    w.u(120, 8)          # level 4.0


def make_vps(profile=1):
    w = BW()
    w.u(0, 4)            # vps_id
    w.u(1, 1)            # base_layer_internal
    w.u(1, 1)            # base_layer_available
    w.u(0, 6)            # max_layers - 1
    w.u(0, 3)            # max_sub_layers - 1
    w.u(1, 1)            # temporal_id_nesting
    w.u(0xFFFF, 16)      # reserved
    _ptl(w, profile)
    w.u(0, 1)            # sub_layer_ordering_info_present
    w.ue(1)              # max_dec_pic_buffering - 1
    w.ue(0)              # num_reorder_pics
    w.ue(0)              # max_latency_increase + 1
    w.u(0, 6)            # max_layer_id
    w.ue(0)              # num_layer_sets - 1
    w.u(0, 1)            # timing_info_present
    w.u(0, 1)            # extension
    return hnal(HP.NAL_VPS, w.rbsp())


def make_sps(width=W, height=H, log2_ctb=5, log2_min_cb=3,
             log2_min_tb=2, log2_max_tb=5, max_td_intra=0,
             strong_smoothing=False, sao=False, max_td_inter=0,
             num_reorder=0, bit_depth=8, crop=None):
    w = BW()
    w.u(0, 4)            # vps_id
    w.u(0, 3)            # max_sub_layers - 1
    w.u(1, 1)            # temporal_id_nesting
    _ptl(w, 2 if bit_depth > 8 else 1)
    w.ue(0)              # sps_id
    w.ue(1)              # chroma_format_idc
    w.ue(width)
    w.ue(height)
    if crop:
        w.u(1, 1)        # conformance_window present
        for v in crop:   # l, r, t, b in chroma units
            w.ue(v)
    else:
        w.u(0, 1)        # conformance_window
    w.ue(bit_depth - 8)  # bit_depth_luma - 8
    w.ue(bit_depth - 8)  # bit_depth_chroma - 8
    w.ue(4)              # log2_max_poc_lsb - 4
    w.u(1, 1)            # sub_layer_ordering_info_present
    w.ue(4)              # max_dec_pic_buffering - 1
    w.ue(num_reorder)    # num_reorder
    w.ue(0)              # max_latency
    w.ue(log2_min_cb - 3)
    w.ue(log2_ctb - log2_min_cb)
    w.ue(log2_min_tb - 2)
    w.ue(log2_max_tb - log2_min_tb)
    w.ue(max_td_inter)   # max_transform_hierarchy_depth_inter
    w.ue(max_td_intra)   # max_transform_hierarchy_depth_intra
    w.u(0, 1)            # scaling_list_enabled
    w.u(0, 1)            # amp_enabled
    w.u(1 if sao else 0, 1)  # sample_adaptive_offset_enabled
    w.u(0, 1)            # pcm_enabled
    w.ue(0)              # num_short_term_ref_pic_sets
    w.u(0, 1)            # long_term_ref_pics_present
    w.u(0, 1)            # temporal_mvp
    w.u(1 if strong_smoothing else 0, 1)
    w.u(0, 1)            # vui
    w.u(0, 1)            # extension
    return hnal(HP.NAL_SPS, w.rbsp())


def make_pps(deblock=False, beta_offset=0, tc_offset=0,
             cb_qp_offset=0, cr_qp_offset=0, sign_hiding=False,
             tiles=None, wpp=False, lf_across_tiles=True,
             transform_skip=False, cabac_init=False,
             lists_mod=False):
    """tiles: None, (cols, rows) uniform, or dict(cols=[...CTB widths,
    all but last], rows=[...]) explicit."""
    w = BW()
    w.ue(0)              # pps_id
    w.ue(0)              # sps_id
    w.u(0, 1)            # dependent_slice_segments
    w.u(0, 1)            # output_flag_present
    w.u(0, 3)            # num_extra_slice_header_bits
    w.u(1 if sign_hiding else 0, 1)   # sign_data_hiding
    w.u(1 if cabac_init else 0, 1)    # cabac_init_present
    w.ue(0)              # num_ref_idx_l0_default - 1
    w.ue(0)              # num_ref_idx_l1_default - 1
    w.se(0)              # init_qp - 26
    w.u(0, 1)            # constrained_intra_pred
    w.u(1 if transform_skip else 0, 1)  # transform_skip
    w.u(0, 1)            # cu_qp_delta_enabled
    w.se(cb_qp_offset)   # cb_qp_offset
    w.se(cr_qp_offset)   # cr_qp_offset
    w.u(0, 1)            # slice_chroma_qp_offsets_present
    w.u(0, 1)            # weighted_pred
    w.u(0, 1)            # weighted_bipred
    w.u(0, 1)            # transquant_bypass
    w.u(1 if tiles else 0, 1)         # tiles_enabled
    w.u(1 if wpp else 0, 1)           # entropy_coding_sync
    if tiles:
        if isinstance(tiles, dict):
            cols, rows = tiles["cols"], tiles["rows"]
            w.ue(len(cols))           # num_tile_columns_minus1
            w.ue(len(rows))
            w.u(0, 1)                 # uniform_spacing
            for cwid in cols:
                w.ue(cwid - 1)
            for rh in rows:
                w.ue(rh - 1)
        else:
            w.ue(tiles[0] - 1)
            w.ue(tiles[1] - 1)
            w.u(1, 1)                 # uniform_spacing
        w.u(1 if lf_across_tiles else 0, 1)
    w.u(1, 1)            # loop_filter_across_slices
    w.u(1, 1)            # deblocking_filter_control_present
    w.u(0, 1)            # deblocking_filter_override_enabled
    w.u(0 if deblock else 1, 1)       # pps_deblocking_filter_disabled
    if deblock:
        w.se(beta_offset // 2)        # pps_beta_offset_div2
        w.se(tc_offset // 2)          # pps_tc_offset_div2
    w.u(0, 1)            # pps_scaling_list_data_present
    w.u(1 if lists_mod else 0, 1)     # lists_modification_present
    w.ue(0)              # log2_parallel_merge_level - 2
    w.u(0, 1)            # slice_segment_header_extension
    w.u(0, 1)            # pps_extension
    return hnal(HP.NAL_PPS, w.rbsp())


def _write_entry_points(w, ep):
    """ep None = PPS has neither tiles nor WPP; list = substream byte
    sizes for all but the last substream."""
    if ep is None:
        return
    w.ue(len(ep))
    if ep:
        olen = max(1, max(int(s - 1).bit_length() for s in ep))
        w.ue(olen - 1)
        for s in ep:
            w.u(s - 1, olen)


def slice_header_bits(qp_delta=0, deblock=False, sao=False, ep=None):
    w = BW()
    w.u(1, 1)            # first_slice_segment_in_pic
    w.u(0, 1)            # no_output_of_prior_pics
    w.ue(0)              # pps_id
    w.ue(2)              # slice_type I
    if sao:
        w.u(1, 1)        # slice_sao_luma_flag
        w.u(1, 1)        # slice_sao_chroma_flag
    w.se(qp_delta)       # slice_qp_delta
    if deblock or sao:
        w.u(1, 1)        # slice_loop_filter_across_slices_enabled
    _write_entry_points(w, ep)
    w.u(1, 1)            # byte_alignment: alignment_bit_equal_to_one
    while len(w.bits) % 8:
        w.u(0, 1)
    return w


class Plan:
    """CU intents for the encode-direction walker."""

    def __init__(self, rng, split_p=0.5, nxn_p=0.5, tt_split_p=0.3,
                 cbf_p=0.7, maxn=4, amp=8, mode_pool=None,
                 tskip_p=0.0):
        self.rng = rng
        self.tskip_p = tskip_p
        self.split_p = split_p
        self.nxn_p = nxn_p
        self.tt_split_p = tt_split_p
        self.cbf_p = cbf_p
        self.maxn = maxn
        self.amp = amp
        self.mode_pool = mode_pool or list(range(35))
        self._sao_cache = {}

    def split(self, x0, y0, log2):
        return self.rng.random() < self.split_p

    def part_nxn(self, x0, y0, log2):
        return self.rng.random() < self.nxn_p

    def luma_mode(self, x0, y0, log2, i):
        return int(self.rng.choice(self.mode_pool))

    def chroma_mode(self, x0, y0, log2, luma_mode):
        return int(self.rng.integers(0, 5))

    def split_tt(self, x0, y0, log2, depth):
        return self.rng.random() < self.tt_split_p

    def cbf_cb(self, x0, y0, log2, depth, split):
        return self.rng.random() < self.cbf_p

    def cbf_cr(self, x0, y0, log2, depth, split):
        return self.rng.random() < self.cbf_p

    def cbf_luma(self, x0, y0, log2, depth):
        return self.rng.random() < self.cbf_p

    def transform_skip(self, x0, y0, c_idx):
        return self.rng.random() < self.tskip_p

    def levels(self, x0, y0, log2, c_idx):
        n = 1 << log2
        lv = np.zeros((n, n), np.int64)
        k = int(self.rng.integers(1, self.maxn + 1))
        for _ in range(k):
            yy = int(self.rng.integers(0, n))
            xx = int(self.rng.integers(0, n))
            lv[yy, xx] = int(self.rng.integers(-self.amp,
                                               self.amp + 1)) or 1
        return lv

    # ---- SAO intents ----
    def sao_merge_left(self, rx, ry):
        return self.rng.random() < 0.25

    def sao_merge_up(self, rx, ry):
        return self.rng.random() < 0.25

    def sao_type(self, c, rx, ry):
        return int(self.rng.integers(0, 3))

    def sao_offset(self, c, rx, ry, i):
        key = (c, rx, ry, i)
        if key not in self._sao_cache:
            self._sao_cache[key] = int(self.rng.integers(-7, 8))
        return self._sao_cache[key]

    def sao_band_position(self, c, rx, ry):
        return int(self.rng.integers(0, 32))

    def sao_eo_class(self, c, rx, ry):
        return int(self.rng.integers(0, 4))


def craft_frame(plan, qp_delta=0, width=W, height=H, pps_kw=None,
                **sps_kw):
    sps_kw = dict(sps_kw, width=width, height=height)
    pps_kw = pps_kw or {}
    sps_nal = make_vps(2 if sps_kw.get("bit_depth", 8) > 8
                       else 1) + make_sps(**sps_kw)
    pps_nal = make_pps(**pps_kw)
    from ffmpeg_tpu.codecs.h264 import nal as N
    sps = HP.parse_sps(N.unescape(make_sps(**sps_kw)[6:]))
    pps = HP.parse_pps(N.unescape(pps_nal[6:]))
    sao = sps_kw.get("sao", False)
    sh = HP.HevcSliceHeader(qp=26 + qp_delta, sao_luma=sao,
                            sao_chroma=sao)
    dec = FrameDec(sps, pps, sh)
    enc = CabacEncoder()
    cc = CtuCoder(dec, enc, encode=True, plan=plan)
    cc.code_slice_data()
    from test_h264_cabac import _bits_to_bytes
    subs = [_bits_to_bytes(e.bitstring()) for e in cc.enc_substreams]
    ep = [len(s) for s in subs[:-1]] \
        if (pps.tiles_enabled or pps.entropy_coding_sync) else None
    hw = slice_header_bits(qp_delta, deblock=pps_kw.get("deblock",
                                                        False),
                           sao=sao, ep=ep)
    payload = _bits_to_bytes(hw.bits) + b"".join(subs)
    return sps_nal + pps_nal + hnal(HP.NAL_IDR_W_RADL, payload)


def _decode_vs_ref(stream, tmp_path, width=W, height=H, bit_depth=8):
    p = tmp_path / "s.h265"
    p.write_bytes(stream)
    raw = subprocess.run(
        [str(refutil.REF), "-v", "error", "-f", "hevc", "-i", str(p),
         "-f", "rawvideo", "-"], check=True, capture_output=True).stdout
    dt = np.uint8 if bit_depth == 8 else np.uint16
    sz = width * height * 3 // 2 * dt().nbytes
    assert len(raw) == sz, f"reference produced {len(raw)} bytes"
    par = CodecParameters(codec_type=MediaType.VIDEO, codec_id="hevc")
    dec = CodecContext.open_decoder(par)
    frames = dec.decode_all([Packet(data=stream, pts=0,
                                    time_base=Rational(1, 25))])
    assert len(frames) == 1
    got = np.concatenate([np.asarray(pl).ravel()
                          for pl in frames[0].planes])
    want = np.frombuffer(raw, dt)
    np.testing.assert_array_equal(got, want)


@requires_ref
@pytest.mark.parametrize("seed", [0, 3, 8])
def test_hevc_i_exact(tmp_path, seed):
    rng = np.random.default_rng(seed)
    _decode_vs_ref(craft_frame(Plan(rng)), tmp_path)


@requires_ref
def test_hevc_i_pred_only(tmp_path):
    rng = np.random.default_rng(1)
    _decode_vs_ref(craft_frame(Plan(rng, cbf_p=0.0)), tmp_path)


@requires_ref
def test_hevc_i_tt_depth(tmp_path):
    """Deeper transform trees (max_transform_hierarchy_depth_intra=2)."""
    rng = np.random.default_rng(5)
    _decode_vs_ref(craft_frame(Plan(rng, tt_split_p=0.6),
                               max_td_intra=2), tmp_path)


@requires_ref
def test_hevc_i_ctb64(tmp_path):
    """64x64 CTBs with 32x32 max TBs (forced transform split)."""
    rng = np.random.default_rng(7)
    _decode_vs_ref(craft_frame(Plan(rng, split_p=0.4), log2_ctb=6),
                   tmp_path)


@requires_ref
def test_hevc_i_dense_residual(tmp_path):
    """Many coefficients: exercises greater1/2, remaining, rice."""
    rng = np.random.default_rng(9)
    _decode_vs_ref(craft_frame(Plan(rng, maxn=40, amp=60)), tmp_path)


@requires_ref
def test_hevc_i_partial_ctbs(tmp_path):
    """Frame not a CTB multiple: implicit quadtree splits at edges."""
    rng = np.random.default_rng(11)
    _decode_vs_ref(craft_frame(Plan(rng), width=72, height=56),
                   tmp_path, width=72, height=56)


@requires_ref
@pytest.mark.parametrize("qpd", [-16, 10, 20])
def test_hevc_i_qp(tmp_path, qpd):
    rng = np.random.default_rng(13)
    _decode_vs_ref(craft_frame(Plan(rng), qp_delta=qpd), tmp_path)


@requires_ref
def test_hevc_i_ctb16(tmp_path):
    rng = np.random.default_rng(17)
    _decode_vs_ref(craft_frame(Plan(rng, split_p=0.3), log2_ctb=4,
                               log2_max_tb=4), tmp_path)


@requires_ref
@pytest.mark.parametrize("seed", [33, 37])
def test_hevc_i_sao(tmp_path, seed):
    """SAO band + edge offsets with merge flags, deblock off."""
    rng = np.random.default_rng(seed)
    _decode_vs_ref(craft_frame(Plan(rng, maxn=16, amp=60), sao=True),
                   tmp_path)


@requires_ref
def test_hevc_i_sao_and_deblock(tmp_path):
    """Deblock then SAO, the full in-loop filter chain."""
    rng = np.random.default_rng(41)
    _decode_vs_ref(craft_frame(Plan(rng, maxn=20, amp=70), sao=True,
                               pps_kw=dict(deblock=True)), tmp_path)


@requires_ref
def test_hevc_i_sao_ctb16(tmp_path):
    """Small CTBs: many SAO merge chains."""
    rng = np.random.default_rng(43)
    _decode_vs_ref(craft_frame(Plan(rng, split_p=0.3), sao=True,
                               log2_ctb=4, log2_max_tb=4), tmp_path)


@requires_ref
@pytest.mark.parametrize("seed", [21, 23])
def test_hevc_i_deblock(tmp_path, seed):
    """In-loop deblocking enabled (strong + weak paths via dense
    residual at default qp)."""
    rng = np.random.default_rng(seed)
    _decode_vs_ref(craft_frame(Plan(rng, maxn=24, amp=80),
                               pps_kw=dict(deblock=True)), tmp_path)


@requires_ref
def test_hevc_i_deblock_offsets(tmp_path):
    """Non-zero beta/tc offsets and chroma qp offsets."""
    rng = np.random.default_rng(27)
    _decode_vs_ref(craft_frame(
        Plan(rng, maxn=16, amp=40), qp_delta=8,
        pps_kw=dict(deblock=True, beta_offset=4, tc_offset=-4,
                    cb_qp_offset=3, cr_qp_offset=-3)), tmp_path)


@requires_ref
def test_hevc_i_deblock_high_qp(tmp_path):
    """High qp drives the strong-filter decision everywhere."""
    rng = np.random.default_rng(29)
    _decode_vs_ref(craft_frame(Plan(rng, maxn=8, amp=120),
                               qp_delta=18,
                               pps_kw=dict(deblock=True)), tmp_path)




# ---------------------------------------------------------------------------
# P/B slices: crafted GOPs


def inter_slice_header_bits(slice_type, poc, rps_neg, rps_pos=(),
                            num_ref=(1, 1), qp_delta=0, deblock=False,
                            sao=False, mvd_l1_zero=False, ep=None,
                            lists_mod=False, list_entry=None,
                            cabac_init=None):
    """slice_type 1 = P, 0 = B; rps_neg/pos: tuples of (delta_poc,
    used) with negative/positive deltas in coding order."""
    w = BW()
    w.u(1, 1)            # first_slice_segment_in_pic
    w.ue(0)              # pps_id
    w.ue(slice_type)
    w.u(poc & 255, 8)    # poc_lsb (log2_max_poc_lsb = 8)
    w.u(0, 1)            # short_term_ref_pic_set_sps_flag
    # st_ref_pic_set(0): explicit, no inter-RPS prediction
    w.ue(len(rps_neg))
    w.ue(len(rps_pos))
    prev = 0
    for d, used in rps_neg:
        w.ue(prev - d - 1)               # delta_poc_s0_minus1
        prev = d
        w.u(1 if used else 0, 1)
    prev = 0
    for d, used in rps_pos:
        w.ue(d - prev - 1)
        prev = d
        w.u(1 if used else 0, 1)
    if sao:
        w.u(1, 1)
        w.u(1, 1)
    # num_ref_idx_active_override
    w.u(1, 1)
    w.ue(num_ref[0] - 1)
    if slice_type == 0:
        w.ue(num_ref[1] - 1)
    n_total = sum(1 for _, u in rps_neg if u) + \
        sum(1 for _, u in rps_pos if u)
    if lists_mod and n_total > 1:
        nbits = (n_total - 1).bit_length()
        for ll in range(2 if slice_type == 0 else 1):
            le = list_entry[ll] if list_entry else None
            if le is None:
                w.u(0, 1)                # ref_pic_list_modification_lX
            else:
                w.u(1, 1)
                for i in range(num_ref[ll]):
                    w.u(le[i], nbits)
    if slice_type == 0:
        w.u(1 if mvd_l1_zero else 0, 1)  # mvd_l1_zero_flag
    if cabac_init is not None:
        w.u(1 if cabac_init else 0, 1)   # cabac_init_flag
    w.ue(0)              # five_minus_max_num_merge_cand → 5
    w.se(qp_delta)
    if deblock or sao:
        w.u(1, 1)        # slice_loop_filter_across_slices_enabled
    _write_entry_points(w, ep)
    w.u(1, 1)            # byte_alignment
    while len(w.bits) % 8:
        w.u(0, 1)
    return w


class InterPlan(Plan):
    """Adds inter CU intents to Plan."""

    def __init__(self, rng, skip_p=0.2, inter_p=0.75, merge_p=0.5,
                 mvd_range=24, bi_p=0.4, rqt_p=0.7, **kw):
        super().__init__(rng, **kw)
        self.skip_p = skip_p
        self.inter_p = inter_p
        self.merge_p = merge_p
        self.mvd_range = mvd_range
        self.bi_p = bi_p
        self.rqt_p = rqt_p
        self.nref = (1, 0)
        self.is_b = False

    def cu_skip(self, x0, y0, log2):
        return self.rng.random() < self.skip_p

    def cu_is_inter(self, x0, y0, log2):
        return self.rng.random() < self.inter_p

    def part_mode_inter(self, x0, y0, log2):
        r = self.rng.random()
        if log2 == 3:                     # avoid 8x4/4x8 complexity mix
            return "2Nx2N" if r < 0.7 else ("2NxN" if r < 0.85
                                            else "Nx2N")
        return "2Nx2N" if r < 0.5 else ("2NxN" if r < 0.75 else "Nx2N")

    def pu_merge(self, x0, y0, pidx):
        return self.rng.random() < self.merge_p

    def pu_merge_idx(self, x0, y0, pidx):
        return int(self.rng.integers(0, 5))

    def pu_inter_pred_idc(self, x0, y0, w, h):
        if w + h == 12 or not self.is_b:
            return int(self.rng.integers(0, 2))
        r = self.rng.random()
        if r < self.bi_p:
            return 2
        return int(self.rng.integers(0, 2))

    def pu_ref_idx(self, x0, y0, pidx, ll):
        return int(self.rng.integers(0, max(1, self.nref[ll])))

    def pu_mvd(self, x0, y0, pidx, ll):
        m = self.mvd_range
        return (int(self.rng.integers(-m, m + 1)),
                int(self.rng.integers(-m, m + 1)))

    def pu_mvp_flag(self, x0, y0, pidx, ll):
        return int(self.rng.integers(0, 2))

    def rqt_root_cbf(self, x0, y0, log2):
        return self.rng.random() < self.rqt_p


def craft_gop(plan_factory, n_frames=4, gop_kind="P", width=W,
              height=H, qp_delta=0, pps_kw=None, sh_kw=None,
              **sps_kw):
    """Craft an IDR + (n_frames-1) inter frames. gop_kind:
    'P' → IPPP (one ref), 'GPB' → low-delay B (two past refs, both
    lists), 'B' → I P B P B ... with reordering (POC order differs
    from coding order)."""
    from ffmpeg_tpu.codecs.h264 import nal as N
    from test_h264_cabac import _bits_to_bytes

    sps_kw = dict(sps_kw, width=width, height=height)
    if gop_kind == "B":
        sps_kw.setdefault("num_reorder", 1)
    pps_kw = pps_kw or {}
    sao = sps_kw.get("sao", False)
    deblock = pps_kw.get("deblock", False)
    sps_nal = make_vps(2 if sps_kw.get("bit_depth", 8) > 8
                       else 1) + make_sps(**sps_kw)
    pps_nal = make_pps(**pps_kw)
    sps = HP.parse_sps(N.unescape(make_sps(**sps_kw)[6:]))
    pps = HP.parse_pps(N.unescape(pps_nal[6:]))

    stream = sps_nal + pps_nal

    # coding order description: list of (poc, slice_type, rps_neg,
    # rps_pos, num_ref)
    frames = []
    if gop_kind == "P":
        for k in range(1, n_frames):
            frames.append((k, 1, [(-1, True)], [], (1, 0)))
    elif gop_kind == "GPB":
        for k in range(1, n_frames):
            neg = [(-1, True)] + ([(-2, True)] if k >= 2 else [])
            nr = min(2, len(neg))
            frames.append((k, 0, neg, [], (nr, nr)))
    else:                                 # hierarchical-lite B
        poc = 0
        for k in range(1, n_frames):
            if k % 2 == 1:                # forward P, poc advances by 2
                poc += 2
                frames.append((poc, 1, [(-2, True)] +
                               ([(-4, False)] if poc >= 4 else []),
                               [], (1, 0)))
            else:                         # B between the two P frames
                frames.append((poc - 1, 0, [(-1, True)], [(1, True)],
                               (1, 1)))

    has_ss = pps.tiles_enabled or pps.entropy_coding_sync
    ep0 = [] if has_ss else None          # parse-only header stub

    def assemble(cc, hw_fn):
        subs = [_bits_to_bytes(e.bitstring())
                for e in cc.enc_substreams]
        ep = [len(s) for s in subs[:-1]] if has_ss else None
        return _bits_to_bytes(hw_fn(ep).bits) + b"".join(subs)

    # IDR I frame
    hw = slice_header_bits(qp_delta, deblock=deblock, sao=sao, ep=ep0)
    sh = HP.parse_slice_header(
        bytes(_bits_to_bytes(hw.bits)), HP.NAL_IDR_W_RADL, sps,
        {0: pps})
    sh.qp = 26 + qp_delta
    plan = plan_factory()
    dec0 = FrameDec(sps, pps, sh, poc=0)
    enc = CabacEncoder()
    cc = CtuCoder(dec0, enc, encode=True, plan=plan)
    cc.code_slice_data()
    stream += hnal(HP.NAL_IDR_W_RADL, assemble(
        cc, lambda ep: slice_header_bits(qp_delta, deblock=deblock,
                                         sao=sao, ep=ep)))

    shk = sh_kw or {}
    pocs = [0]
    for poc, stype, neg, pos, nref in frames:
        hw = inter_slice_header_bits(stype, poc, neg, pos, nref,
                                     qp_delta, deblock=deblock,
                                     sao=sao, ep=ep0, **shk)
        nalt = HP.NAL_TRAIL_R
        sh = HP.parse_slice_header(bytes(_bits_to_bytes(hw.bits)),
                                   nalt, sps, {0: pps})
        # rpl construction mirrors the decoder (POCs only; the encode
        # walker needs rpl for merge/AMVP, not pixels)
        before = [poc + d for d, used in neg if used]
        after = [poc + d for d, used in pos if used]
        rpl = [[], []]
        for ll, order in ((0, before + after), (1, after + before)):
            mod = sh.list_entry[ll]
            for i in range(sh.num_ref_idx[ll]):
                rpl[ll].append(order[mod[i]] if mod is not None
                               else order[i % len(order)])
        plan = plan_factory()
        plan.nref = sh.num_ref_idx
        plan.is_b = stype == 0
        dec = FrameDec(sps, pps, sh, poc=poc, rpl=rpl)
        enc = CabacEncoder()
        cc = CtuCoder(dec, enc, encode=True, plan=plan)
        cc.code_slice_data()
        stream += hnal(nalt, assemble(
            cc, lambda ep, a=(stype, poc, neg, pos, nref):
            inter_slice_header_bits(*a, qp_delta, deblock=deblock,
                                    sao=sao, ep=ep, **shk)))
        pocs.append(poc)
    return stream, len(pocs)


def _decode_gop_vs_ref(stream, n_frames, tmp_path, width=W, height=H,
                       bit_depth=8):
    p = tmp_path / "s.h265"
    p.write_bytes(stream)
    raw = subprocess.run(
        [str(refutil.REF), "-v", "error", "-f", "hevc", "-i", str(p),
         "-f", "rawvideo", "-"], check=True, capture_output=True).stdout
    dt = np.uint8 if bit_depth == 8 else np.uint16
    sz = width * height * 3 // 2 * dt().nbytes
    assert len(raw) == sz * n_frames, \
        f"reference produced {len(raw)} bytes, want {sz * n_frames}"
    par = CodecParameters(codec_type=MediaType.VIDEO, codec_id="hevc")
    dec = CodecContext.open_decoder(par)
    frames = dec.decode_all([Packet(data=stream, pts=0,
                                    time_base=Rational(1, 25))])
    assert len(frames) == n_frames
    got = np.concatenate([np.asarray(pl).ravel()
                          for f in frames for pl in f.planes])
    want = np.frombuffer(raw, dt)
    np.testing.assert_array_equal(got, want)


@requires_ref
@pytest.mark.parametrize("seed", [1, 5, 9])
def test_hevc_p_gop(tmp_path, seed):
    """IPPP: merge + AMVP + skip + intra CUs in P slices."""
    rng = np.random.default_rng(seed)
    stream, n = craft_gop(lambda: InterPlan(rng), n_frames=4)
    _decode_gop_vs_ref(stream, n, tmp_path)


@requires_ref
def test_hevc_p_deblock(tmp_path):
    """P slices with in-loop deblock: inter bS 0/1/2 paths."""
    rng = np.random.default_rng(13)
    stream, n = craft_gop(lambda: InterPlan(rng, maxn=12, amp=40),
                          n_frames=4, pps_kw=dict(deblock=True))
    _decode_gop_vs_ref(stream, n, tmp_path)


@requires_ref
def test_hevc_p_sao_deblock(tmp_path):
    rng = np.random.default_rng(17)
    stream, n = craft_gop(lambda: InterPlan(rng, maxn=10, amp=40),
                          n_frames=3, sao=True,
                          pps_kw=dict(deblock=True))
    _decode_gop_vs_ref(stream, n, tmp_path)


@requires_ref
def test_hevc_p_multi_ref(tmp_path):
    """GPB low-delay B: two past refs in both lists, bi-pred."""
    rng = np.random.default_rng(21)
    stream, n = craft_gop(lambda: InterPlan(rng), n_frames=5,
                          gop_kind="GPB")
    _decode_gop_vs_ref(stream, n, tmp_path)


@requires_ref
@pytest.mark.parametrize("seed", [25, 29])
def test_hevc_b_reorder(tmp_path, seed):
    """True B frames with POC reordering (decode order != output)."""
    rng = np.random.default_rng(seed)
    stream, n = craft_gop(lambda: InterPlan(rng), n_frames=5,
                          gop_kind="B")
    _decode_gop_vs_ref(stream, n, tmp_path)


@requires_ref
def test_hevc_p_tt_depth_inter(tmp_path):
    """Inter TUs spanning PU boundaries (max_td_inter > 0)."""
    rng = np.random.default_rng(33)
    stream, n = craft_gop(lambda: InterPlan(rng, tt_split_p=0.5),
                          n_frames=3, max_td_inter=2,
                          pps_kw=dict(deblock=True))
    _decode_gop_vs_ref(stream, n, tmp_path)


@requires_ref
def test_hevc_p_ctb16_small_cu(tmp_path):
    """Small CTBs: 8x8 inter CUs with 8x4/4x8 PUs (no bi-pred)."""
    rng = np.random.default_rng(37)
    stream, n = craft_gop(lambda: InterPlan(rng, split_p=0.6),
                          n_frames=3, log2_ctb=4, log2_max_tb=4)
    _decode_gop_vs_ref(stream, n, tmp_path)


# ---------------------------------------------------------------------------
# Main10 / Main12 (bit depths > 8)


@requires_ref
@pytest.mark.parametrize("bd", [10, 12])
@pytest.mark.parametrize("seed", [2, 7])
def test_hevc_i_highbit(tmp_path, bd, seed):
    rng = np.random.default_rng(seed)
    _decode_vs_ref(craft_frame(Plan(rng, amp=40), bit_depth=bd),
                   tmp_path, bit_depth=bd)


@requires_ref
def test_hevc_i_10bit_sao_deblock(tmp_path):
    rng = np.random.default_rng(11)
    _decode_vs_ref(craft_frame(Plan(rng, maxn=10, amp=80), sao=True,
                               bit_depth=10,
                               pps_kw=dict(deblock=True)),
                   tmp_path, bit_depth=10)


@requires_ref
def test_hevc_p_gop_10bit(tmp_path):
    """IPPP at 10 bit: MC shifts, deblock tc/beta scaling."""
    rng = np.random.default_rng(41)
    stream, n = craft_gop(lambda: InterPlan(rng, maxn=8, amp=60),
                          n_frames=4, bit_depth=10,
                          pps_kw=dict(deblock=True))
    _decode_gop_vs_ref(stream, n, tmp_path, bit_depth=10)


@requires_ref
def test_hevc_b_reorder_10bit(tmp_path):
    rng = np.random.default_rng(43)
    stream, n = craft_gop(lambda: InterPlan(rng), n_frames=5,
                          gop_kind="B", bit_depth=10, sao=True,
                          pps_kw=dict(deblock=True))
    _decode_gop_vs_ref(stream, n, tmp_path, bit_depth=10)


# ---------------------------------------------------------------------------
# Tiles and WPP (hevcdec.c:1118 tiles/WPP entry, :2717 WPP substreams)


@requires_ref
@pytest.mark.parametrize("seed", [0, 4])
def test_hevc_tiles_2x2(tmp_path, seed):
    rng = np.random.default_rng(seed)
    _decode_vs_ref(craft_frame(Plan(rng), pps_kw=dict(tiles=(2, 2))),
                   tmp_path)


@requires_ref
def test_hevc_tiles_explicit(tmp_path):
    """3x2 tiles with explicit (non-uniform) column/row sizes."""
    rng = np.random.default_rng(6)
    _decode_vs_ref(
        craft_frame(Plan(rng), width=96, height=64, log2_ctb=4,
                    log2_max_tb=4,
                    pps_kw=dict(tiles=dict(cols=[1, 3], rows=[3]))),
        tmp_path, width=96, height=64)


@requires_ref
@pytest.mark.parametrize("across", [True, False])
def test_hevc_tiles_sao_deblock(tmp_path, across):
    """Tiles with in-loop filters; loop_filter_across_tiles on/off."""
    rng = np.random.default_rng(8)
    _decode_vs_ref(
        craft_frame(Plan(rng, maxn=10, amp=40), sao=True,
                    pps_kw=dict(tiles=(2, 2), deblock=True,
                                lf_across_tiles=across)),
        tmp_path)


@requires_ref
def test_hevc_tiles_10bit(tmp_path):
    rng = np.random.default_rng(10)
    _decode_vs_ref(
        craft_frame(Plan(rng, amp=40), bit_depth=10, sao=True,
                    pps_kw=dict(tiles=(2, 2), deblock=True)),
        tmp_path, bit_depth=10)


@requires_ref
@pytest.mark.parametrize("seed", [1, 5])
def test_hevc_wpp(tmp_path, seed):
    """WPP: per-row substreams with context sync from CTU 1."""
    rng = np.random.default_rng(seed)
    _decode_vs_ref(craft_frame(Plan(rng), pps_kw=dict(wpp=True)),
                   tmp_path)


@requires_ref
def test_hevc_wpp_deblock_ctb16(tmp_path):
    """ctb16 rows; sao+deblock combined is excluded at ctb16 ONLY
    because the reference deviates from spec 8.7.3 there: its chroma
    H-edge deblock defers 16 luma columns (= a whole ctb16), so its
    SAO reads the right-neighbour column's bottom sample before that
    sample's bottom-boundary H edge ran (filter.c:646 x_end2 vs
    :895 sao lag). We keep the spec's fully-deblocked SAO input."""
    rng = np.random.default_rng(12)
    _decode_vs_ref(
        craft_frame(Plan(rng, maxn=8, amp=40), width=96, height=64,
                    log2_ctb=4, log2_max_tb=4,
                    pps_kw=dict(wpp=True, deblock=True)),
        tmp_path, width=96, height=64)


@requires_ref
def test_hevc_wpp_sao_deblock(tmp_path):
    """WPP + SAO + deblock at ctb32 (3x2 CTB rows/cols)."""
    rng = np.random.default_rng(12)
    _decode_vs_ref(
        craft_frame(Plan(rng, maxn=8, amp=40), width=96, height=64,
                    sao=True, pps_kw=dict(wpp=True, deblock=True)),
        tmp_path, width=96, height=64)


@requires_ref
def test_hevc_tiles_p_gop(tmp_path):
    """Tiles in P slices: merge/AMVP availability at tile edges."""
    rng = np.random.default_rng(14)
    stream, n = craft_gop(lambda: InterPlan(rng), n_frames=4,
                          pps_kw=dict(tiles=(2, 2)))
    _decode_gop_vs_ref(stream, n, tmp_path)


@requires_ref
def test_hevc_wpp_p_gop(tmp_path):
    rng = np.random.default_rng(16)
    stream, n = craft_gop(lambda: InterPlan(rng), n_frames=4,
                          pps_kw=dict(wpp=True))
    _decode_gop_vs_ref(stream, n, tmp_path)


@requires_ref
def test_hevc_tiles_b_10bit(tmp_path):
    """The full matrix point: tiles x B-frames x 10-bit x filters."""
    rng = np.random.default_rng(18)
    stream, n = craft_gop(lambda: InterPlan(rng), n_frames=5,
                          gop_kind="B", bit_depth=10, sao=True,
                          pps_kw=dict(tiles=(2, 2), deblock=True))
    _decode_gop_vs_ref(stream, n, tmp_path, bit_depth=10)


@requires_ref
@pytest.mark.parametrize("crop", [(1, 1, 2, 2), (0, 2, 0, 4),
                                  (3, 0, 1, 0)])
def test_hevc_conformance_window(tmp_path, crop):
    """Conformance-window cropping (7.4.3.2.1): coded 64x64, output
    cropped by the chroma-unit offsets x2."""
    rng = np.random.default_rng(11)
    stream = craft_frame(Plan(rng), crop=crop)
    p = tmp_path / "crop.h265"
    p.write_bytes(stream)
    raw = subprocess.run(
        [str(refutil.REF), "-v", "error", "-f", "hevc", "-i",
         str(p), "-f", "rawvideo", "-"],
        check=True, capture_output=True).stdout
    par = CodecParameters(codec_type=MediaType.VIDEO,
                          codec_id="hevc")
    dec = CodecContext.open_decoder(par)
    frames = dec.decode_all([Packet(data=stream, pts=0,
                                    time_base=Rational(1, 25))])
    f = frames[0]
    left, right, top, bottom = crop
    assert f.width == W - 2 * (left + right)
    assert f.height == H - 2 * (top + bottom)
    got = np.concatenate([np.asarray(pl).ravel()
                          for pl in f.planes])
    np.testing.assert_array_equal(got, np.frombuffer(raw, np.uint8))


@requires_ref
@pytest.mark.parametrize("seed", [3, 11])
def test_hevc_transform_skip(tmp_path, seed):
    """4x4 transform-skip TUs mixed with transformed TUs
    (cabac.c hevc_transform_skip_flag_decode + dsp dequant path)."""
    rng = np.random.default_rng(seed)
    stream = craft_frame(Plan(rng, tskip_p=0.6),
                         pps_kw=dict(transform_skip=True))
    _decode_vs_ref(stream, tmp_path)


@requires_ref
def test_hevc_transform_skip_sign_hiding(tmp_path):
    """Transform skip + sign data hiding interact (sign_hidden stays
    active for skipped blocks in Main profile)."""
    rng = np.random.default_rng(7)
    stream = craft_frame(Plan(rng, tskip_p=0.7, cbf_p=0.9),
                         pps_kw=dict(transform_skip=True,
                                     sign_hiding=True))
    _decode_vs_ref(stream, tmp_path)


@requires_ref
def test_hevc_transform_skip_p_gop(tmp_path):
    """Transform skip on inter residuals across a P GOP."""
    rng = np.random.default_rng(21)
    stream, n = craft_gop(lambda: InterPlan(rng, tskip_p=0.6),
                          n_frames=3,
                          pps_kw=dict(transform_skip=True))
    _decode_gop_vs_ref(stream, n, tmp_path)


@requires_ref
@pytest.mark.parametrize("kind", ["P", "GPB"])
def test_hevc_cabac_init_flag(tmp_path, kind):
    """cabac_init_flag swaps the P/B context init tables
    (spec 9.2.1 initType)."""
    rng = np.random.default_rng(13)
    stream, n = craft_gop(lambda: InterPlan(rng), n_frames=4,
                          gop_kind=kind,
                          pps_kw=dict(cabac_init=True),
                          sh_kw=dict(cabac_init=True))
    _decode_gop_vs_ref(stream, n, tmp_path)


@requires_ref
def test_hevc_ref_list_modification(tmp_path):
    """ref_pic_lists_modification: explicit temp-list reordering
    (7.3.6.2 / 8.3.4 RefPicListTemp indexing)."""
    rng = np.random.default_rng(17)
    stream, n = craft_gop(lambda: InterPlan(rng), n_frames=4,
                          gop_kind="GPB",
                          pps_kw=dict(lists_mod=True),
                          sh_kw=dict(lists_mod=True,
                                     list_entry=([1, 0], [1, 0])))
    _decode_gop_vs_ref(stream, n, tmp_path)
