"""SPS / PPS parsing (reference: libavcodec/h264_ps.c). Baseline/main
frame-coded subset: 4:2:0 8-bit, no scaling lists beyond defaults."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

from ...utils.error import NotSupported
from .bits import Bits


@dataclass
class SPS:
    profile_idc: int = 66
    level_idc: int = 30
    sps_id: int = 0
    chroma_format_idc: int = 1
    bit_depth_luma: int = 8
    bit_depth_chroma: int = 8
    log2_max_frame_num: int = 4
    poc_type: int = 0
    log2_max_poc_lsb: int = 4
    delta_pic_order_always_zero: bool = False
    num_ref_frames: int = 1
    gaps_in_frame_num_allowed: bool = False
    mb_width: int = 0
    mb_height: int = 0
    frame_mbs_only: bool = True
    mb_aff: bool = False
    direct_8x8_inference: bool = True
    crop_left: int = 0
    crop_right: int = 0
    crop_top: int = 0
    crop_bottom: int = 0

    @property
    def width(self) -> int:
        return self.mb_width * 16 - 2 * (self.crop_left + self.crop_right)

    @property
    def height(self) -> int:
        return self.mb_height * 16 - 2 * (self.crop_top + self.crop_bottom)


def parse_sps(rbsp: bytes) -> SPS:
    b = Bits(rbsp)
    s = SPS()
    s.profile_idc = b.get(8)
    b.get(8)                    # constraint flags + reserved
    s.level_idc = b.get(8)
    s.sps_id = b.ue()
    if s.profile_idc in (100, 110, 122, 244, 44, 83, 86, 118, 128, 138,
                         139, 134, 135):
        s.chroma_format_idc = b.ue()
        if s.chroma_format_idc == 3:
            b.get1()            # separate_colour_plane
        s.bit_depth_luma = b.ue() + 8
        s.bit_depth_chroma = b.ue() + 8
        b.get1()                # qpprime_y_zero_transform_bypass
        if b.get1():            # seq_scaling_matrix_present
            raise NotSupported("h264: scaling matrices")
    if s.chroma_format_idc != 1 or s.bit_depth_luma != 8:
        raise NotSupported("h264: only 4:2:0 8-bit supported")
    s.log2_max_frame_num = b.ue() + 4
    s.poc_type = b.ue()
    if s.poc_type == 0:
        s.log2_max_poc_lsb = b.ue() + 4
    elif s.poc_type == 1:
        s.delta_pic_order_always_zero = bool(b.get1())
        b.se()
        b.se()
        for _ in range(b.ue()):
            b.se()
    s.num_ref_frames = b.ue()
    s.gaps_in_frame_num_allowed = bool(b.get1())
    s.mb_width = b.ue() + 1
    s.mb_height = b.ue() + 1
    s.frame_mbs_only = bool(b.get1())
    if not s.frame_mbs_only:
        raise NotSupported("h264: interlaced (field/MBAFF)")
    s.direct_8x8_inference = bool(b.get1())
    if b.get1():                # frame_cropping
        s.crop_left = b.ue()
        s.crop_right = b.ue()
        s.crop_top = b.ue()
        s.crop_bottom = b.ue()
    return s


@dataclass
class PPS:
    pps_id: int = 0
    sps_id: int = 0
    cabac: bool = False
    pic_order_present: bool = False
    num_ref_idx: tuple = (1, 1)
    weighted_pred: bool = False
    weighted_bipred_idc: int = 0
    init_qp: int = 26
    chroma_qp_index_offset: int = 0
    deblocking_filter_control_present: bool = False
    constrained_intra_pred: bool = False
    redundant_pic_cnt_present: bool = False
    transform_8x8_mode: bool = False
    second_chroma_qp_index_offset: int = 0


def parse_pps(rbsp: bytes) -> PPS:
    b = Bits(rbsp)
    p = PPS()
    p.pps_id = b.ue()
    p.sps_id = b.ue()
    p.cabac = bool(b.get1())
    p.pic_order_present = bool(b.get1())
    if b.ue() != 0:             # num_slice_groups - 1
        raise NotSupported("h264: FMO slice groups")
    p.num_ref_idx = (b.ue() + 1, b.ue() + 1)
    p.weighted_pred = bool(b.get1())
    p.weighted_bipred_idc = b.get(2)
    p.init_qp = b.se() + 26
    b.se()                      # init_qs
    p.chroma_qp_index_offset = b.se()
    p.deblocking_filter_control_present = bool(b.get1())
    p.constrained_intra_pred = bool(b.get1())
    if p.constrained_intra_pred:
        raise NotSupported("h264: constrained intra pred")
    p.redundant_pic_cnt_present = bool(b.get1())
    if b.more_rbsp():
        p.transform_8x8_mode = bool(b.get1())
        if p.transform_8x8_mode:
            raise NotSupported("h264: 8x8 transform")
        if b.get1():
            raise NotSupported("h264: pps scaling matrices")
        p.second_chroma_qp_index_offset = b.se()
    else:
        p.second_chroma_qp_index_offset = p.chroma_qp_index_offset
    return p
