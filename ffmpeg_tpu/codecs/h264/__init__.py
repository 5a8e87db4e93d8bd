"""H.264/AVC decoder (reference: libavcodec/h264dec.c).

Round-1 scope: CAVLC I slices (I_4x4 / I_16x16 / I_PCM), 4:2:0 8-bit,
frame MBs, single slice group. The in-loop deblocking filter and
P slices are the next increments (see PARITY.md). Host entropy decode →
exact-integer reconstruction; residual batches shaped for TPU offload."""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from ...core.frame import Frame
from ...core.packet import Packet
from ...io.stream import MediaType
from ...utils.error import InvalidData, NotSupported
from ...utils.rational import Rational
from ..codec import Codec, register_decoder
from . import nal as _nal
from .bits import Bits
from .params import parse_pps, parse_sps
from .slice_dec import SliceDecoder, parse_slice_header


@register_decoder
class H264Decoder(Codec):
    codec_id = "h264"
    codec_type = MediaType.VIDEO

    def __init__(self, par, options=None):
        super().__init__(par, options)
        self.sps = {}
        self.pps = {}
        self.nal_size = 0          # 0 = Annex B
        ed = par.extradata or b""
        if ed[:1] == b"\x01":      # AVCC
            self.nal_size = (ed[4] & 3) + 1
            n_sps = ed[5] & 0x1F
            pos = 6
            for _ in range(n_sps):
                ln = int.from_bytes(ed[pos:pos + 2], "big")
                self._handle_nal(ed[pos + 2:pos + 2 + ln])
                pos += 2 + ln
            n_pps = ed[pos]
            pos += 1
            for _ in range(n_pps):
                ln = int.from_bytes(ed[pos:pos + 2], "big")
                self._handle_nal(ed[pos + 2:pos + 2 + ln])
                pos += 2 + ln
        elif ed:
            for u in _nal.split_annexb(ed):
                self._handle_nal(u)
        self._ref = None           # last decoded picture (DPB of depth 1)

    def _handle_nal(self, unit: bytes):
        if not unit:
            return None
        ref_idc, ntype = _nal.parse_nal_header(unit)
        self._last_ref_idc = ref_idc
        rbsp = _nal.unescape(unit[1:])
        if ntype == _nal.NAL_SPS:
            s = parse_sps(rbsp)
            self.sps[s.sps_id] = s
        elif ntype == _nal.NAL_PPS:
            p = parse_pps(rbsp)
            self.pps[p.pps_id] = p
        return ntype, rbsp

    def decode(self, pkt: Optional[Packet]) -> List[Frame]:
        if pkt is None:
            return []
        units = _nal.split_avcc(pkt.data, self.nal_size) if self.nal_size \
            else _nal.split_annexb(pkt.data)
        frames: List[Frame] = []
        dec: Optional[SliceDecoder] = None
        for unit in units:
            r = self._handle_nal(unit)
            if r is None:
                continue
            ntype, rbsp = r
            if ntype in (_nal.NAL_SLICE, _nal.NAL_IDR):
                b = Bits(rbsp)
                # peek header to find pps/sps
                probe = Bits(rbsp)
                probe.ue()
                probe.ue()
                pps_id = probe.ue()
                pps = self.pps.get(pps_id)
                if pps is None:
                    raise InvalidData("h264: unknown PPS")
                sps = self.sps.get(pps.sps_id)
                if sps is None:
                    raise InvalidData("h264: unknown SPS")
                sh = parse_slice_header(b, ntype, sps, pps,
                                        self._last_ref_idc)
                if dec is None or sh.first_mb == 0:
                    if dec is not None:
                        frames.append(self._emit(dec, pkt))
                    dec = SliceDecoder(sps, pps)
                    dec.ref_frame = self._ref
                if pps.cabac:
                    from .cabac_slice import decode_slice_cabac
                    decode_slice_cabac(dec, rbsp, b.pos, sh)
                else:
                    dec.decode_slice(b, sh)
                dec.last_sh = sh
        if dec is not None:
            frames.append(self._emit(dec, pkt))
        return frames

    def _emit(self, dec: SliceDecoder, pkt: Packet) -> Frame:
        sh = getattr(dec, "last_sh", None)
        if sh is not None and sh.disable_deblocking != 1:
            from .loopfilter import deblock_frame
            deblock_frame(dec, sh.alpha_c0_offset, sh.beta_offset)
        self._ref = (dec.y.copy(), dec.u.copy(), dec.v.copy())
        sps = dec.sps
        t, b = sps.crop_top * 2, sps.crop_bottom * 2
        l, r = sps.crop_left * 2, sps.crop_right * 2
        h, w = sps.mb_height * 16 - t - b, sps.mb_width * 16 - l - r
        y = dec.y[t:t + h, l:l + w]
        u = dec.u[t // 2:(t + h) // 2, l // 2:(l + w) // 2]
        v = dec.v[t // 2:(t + h) // 2, l // 2:(l + w) // 2]
        f = Frame.video(w, h, "yuv420p", planes=[y.copy(), u.copy(),
                                                  v.copy()], pts=pkt.pts,
                        time_base=pkt.time_base or Rational(1, 25))
        f.key_frame = bool(getattr(dec, "last_sh", None)
                           and dec.last_sh.idr)
        return f
