"""HEVC decoder (ITU-T H.265; reference: libavcodec/hevc/hevcdec.c).

Scope this round: Main profile 8-bit 4:2:0 IDR I-slices, no tiles/WPP,
SAO/deblock pending. Crafted-stream differential tests validate the
entropy layer and reconstruction against the reference decoder."""

from __future__ import annotations

from typing import List, Optional

from ...core.frame import Frame
from ...core.packet import Packet
from ...io.stream import MediaType
from ...utils.error import InvalidData
from ...utils.rational import Rational
from ..codec import Codec, register_decoder
from ..h264 import nal as _nal
from ..h264.cabac import CabacDecoder
from . import params as P
from .ctu import CtuCoder, FrameDec


@register_decoder
class HevcDecoder(Codec):
    codec_id = "hevc"
    codec_type = MediaType.VIDEO

    def __init__(self, par, options=None):
        super().__init__(par, options)
        # device_recon: run transforms + inter MC + intra prediction +
        # in-loop filters on the TPU (recon_tpu.py); host does only the
        # CABAC parse. Byte-exact with the host path.
        self.device_recon = bool(
            (options or {}).get("device_recon", False))
        self.sps = {}
        self.pps = {}
        self.nal_size = 0
        self.dpb = []                    # {poc, y, u, v} filtered pics
        self._reorder = []               # (poc, Frame) awaiting output
        self._prev_poc = 0               # prevTid0Pic for POC MSB
        ed = par.extradata or b""
        if len(ed) > 22 and ed[0] == 1:      # hvcC
            self.nal_size = (ed[21] & 3) + 1
            n_arrays = ed[22]
            pos = 23
            for _ in range(n_arrays):
                pos += 1                     # array header
                n = int.from_bytes(ed[pos:pos + 2], "big")
                pos += 2
                for _ in range(n):
                    ln = int.from_bytes(ed[pos:pos + 2], "big")
                    self._handle_nal(ed[pos + 2:pos + 2 + ln])
                    pos += 2 + ln
        elif ed:
            for u in _nal.split_annexb(ed):
                self._handle_nal(u)

    def _handle_nal(self, unit: bytes, pkt: Optional[Packet] = None):
        if len(unit) < 3:
            return None
        ntype = (unit[0] >> 1) & 0x3F
        rbsp = _nal.unescape(unit[2:])
        if ntype == P.NAL_SPS:
            s = P.parse_sps(rbsp)
            self.sps[s.sps_id] = s
        elif ntype == P.NAL_PPS:
            p = P.parse_pps(rbsp)
            self.pps[p.pps_id] = p
        elif P.is_slice(ntype):
            return self._decode_slice(rbsp, ntype, pkt)
        return None

    def _poc(self, sps, ntype, poc_lsb):
        """PicOrderCntVal (spec 8.3.1)."""
        if ntype in (P.NAL_IDR_W_RADL, P.NAL_IDR_N_LP):
            return 0
        max_lsb = 1 << sps.log2_max_poc_lsb
        prev_lsb = self._prev_poc & (max_lsb - 1)
        prev_msb = self._prev_poc - prev_lsb
        if poc_lsb < prev_lsb and prev_lsb - poc_lsb >= max_lsb // 2:
            msb = prev_msb + max_lsb
        elif poc_lsb > prev_lsb and poc_lsb - prev_lsb > max_lsb // 2:
            msb = prev_msb - max_lsb
        else:
            msb = prev_msb
        return msb + poc_lsb

    def _ref_lists(self, sps, sh, poc):
        """RPS application + RefPicList construction (8.3.2/8.3.4).
        Also evicts DPB pictures outside the RPS."""
        keep = {poc + d for d, _ in sh.rps_neg} | \
               {poc + d for d, _ in sh.rps_pos}
        self.dpb = [e for e in self.dpb if e["poc"] in keep]
        by_poc = {e["poc"]: e for e in self.dpb}
        before, after = [], []
        for d, used in sh.rps_neg:
            if used:
                e = by_poc.get(poc + d)
                if e is None:
                    raise InvalidData(f"hevc: ref poc {poc + d} "
                                      "missing from DPB")
                before.append(e)
        for d, used in sh.rps_pos:
            if used:
                e = by_poc.get(poc + d)
                if e is None:
                    raise InvalidData(f"hevc: ref poc {poc + d} "
                                      "missing from DPB")
                after.append(e)
        refs = [[], []]
        rpl = [[], []]
        for ll, order in ((0, before + after), (1, after + before)):
            n = sh.num_ref_idx[ll]
            if n and not order:
                raise InvalidData("hevc: empty reference list")
            mod = sh.list_entry[ll]
            for i in range(n):
                if mod is not None:
                    if mod[i] >= len(order):
                        raise InvalidData("hevc: list_entry out of "
                                          "range")
                    e = order[mod[i]]
                else:
                    e = order[i % len(order)]
                refs[ll].append((e["y"], e["u"], e["v"]))
                rpl[ll].append(e["poc"])
        return refs, rpl

    def _decode_slice(self, rbsp: bytes, ntype: int, pkt):
        # slice_pic_parameter_set_id follows first_slice(+irap flag)
        from ..h264.bits import Bits
        probe = Bits(rbsp)
        probe.get1()
        if P.is_irap(ntype):
            probe.get1()
        pps = self.pps.get(probe.ue())
        if pps is None:
            raise InvalidData("hevc: unknown PPS")
        sps = self.sps.get(pps.sps_id)
        if sps is None:
            raise InvalidData("hevc: unknown SPS")
        sh = P.parse_slice_header(rbsp, ntype, sps, self.pps)
        is_idr = ntype in (P.NAL_IDR_W_RADL, P.NAL_IDR_N_LP)
        flushed = []
        if is_idr:
            flushed = self._flush_reorder()
            self.dpb = []
        poc = self._poc(sps, ntype, sh.poc_lsb)
        if ntype != P.NAL_TRAIL_N:       # prevTid0Pic: reference pics
            self._prev_poc = poc
        refs, rpl = ([[], []], [[], []])
        if sh.slice_type != 2:
            refs, rpl = self._ref_lists(sps, sh, poc)
        dec = FrameDec(sps, pps, sh, poc=poc, refs=refs, rpl=rpl)
        if self.device_recon:
            from .recorder import ReconRecorder
            dec.recorder = ReconRecorder(dec)
        payload = rbsp[sh.data_bit_pos // 8:]
        core = CabacDecoder(payload)
        CtuCoder(dec, core, payload=payload).code_slice_data()
        if dec.recorder is not None:
            from . import recon_tpu
            recon_tpu.reconstruct(dec, dec.recorder)
            from .filter_tpu import filters_tpu
            dec.y, dec.u, dec.v = filters_tpu(dec)
        else:
            from .filter import deblock_frame, sao_frame
            if not sh.deblocking_disabled:
                deblock_frame(dec)
            if sps.sao_enabled and (sh.sao_luma or sh.sao_chroma):
                sao_frame(dec)
        y, u, v = dec.y.copy(), dec.u.copy(), dec.v.copy()
        self.dpb.append({"poc": poc, "y": y, "u": u, "v": v})
        fmt = {8: "yuv420p", 10: "yuv420p10le",
               12: "yuv420p12le"}[sps.bit_depth]
        ow = sps.width - sps.crop_left - sps.crop_right
        oh = sps.height - sps.crop_top - sps.crop_bottom
        oy, ou, ov = y, u, v
        if (ow, oh) != (sps.width, sps.height):
            l, t = sps.crop_left, sps.crop_top
            oy = y[t:t + oh, l:l + ow].copy()
            ou = u[t // 2:(t + oh) // 2, l // 2:(l + ow) // 2].copy()
            ov = v[t // 2:(t + oh) // 2, l // 2:(l + ow) // 2].copy()
        f = Frame.video(ow, oh, fmt,
                        planes=[oy, ou, ov],
                        pts=pkt.pts if pkt else 0,
                        time_base=(pkt.time_base if pkt else None)
                        or Rational(1, 25))
        f.key_frame = is_idr
        self._reorder.append((poc, f))
        out = flushed
        while len(self._reorder) > sps.num_reorder:
            self._reorder.sort(key=lambda t: t[0])
            out.append(self._reorder.pop(0)[1])
        return out

    def _flush_reorder(self):
        out = []
        while self._reorder:
            self._reorder.sort(key=lambda t: t[0])
            out.append(self._reorder.pop(0)[1])
        return out

    def decode(self, pkt: Optional[Packet]) -> List[Frame]:
        if pkt is None or not pkt.data:
            return self._flush_reorder()
        frames = []
        if self.nal_size:
            data = pkt.data
            pos = 0
            units = []
            while pos + self.nal_size <= len(data):
                ln = int.from_bytes(data[pos:pos + self.nal_size], "big")
                pos += self.nal_size
                units.append(data[pos:pos + ln])
                pos += ln
        else:
            units = _nal.split_annexb(pkt.data)
        for u in units:
            f = self._handle_nal(u, pkt)
            if f:
                frames.extend(f)
        return frames

