"""MJPEG / baseline JPEG decoder (reference: libavcodec/mjpegdec.c).

TPU-native architecture (SURVEY.md §7 step 6): the host parses markers and
entropy-decodes the scan into dense coefficient tensors (C++ fast path via
ffmpeg_tpu.native, pure-Python fallback); the TPU runs ONE fused program
per plane: dequant → dezigzag → 8x8 IDCT → level shift → clamp → tile
reassembly (ops/idct.py). Output is full-range YUV (yuvj semantics).
"""

from __future__ import annotations

import ctypes
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..core.frame import Frame
from ..core.packet import Packet
from ..io.stream import MediaType
from ..ops.idct import jpeg_block_transform
from ..utils.error import InvalidData, NotSupported
from .. import native
from .codec import Codec, register_decoder

# markers
SOI, EOI, SOS, DQT, DHT, DRI = 0xD8, 0xD9, 0xDA, 0xDB, 0xC4, 0xDD
SOF0, SOF1, SOF2 = 0xC0, 0xC1, 0xC2


@dataclass
class _Component:
    cid: int
    h: int
    v: int
    q_idx: int
    dc_tab: int = 0
    ac_tab: int = 0


class _JpegState:
    def __init__(self):
        self.qtabs: Dict[int, np.ndarray] = {}
        self.dc_counts = np.zeros((4, 16), np.uint8)
        self.dc_values = np.zeros((4, 256), np.uint8)
        self.ac_counts = np.zeros((4, 16), np.uint8)
        self.ac_values = np.zeros((4, 256), np.uint8)
        self.width = 0
        self.height = 0
        self.bits = 8
        self.components: List[_Component] = []
        self.restart_interval = 0
        self.progressive = False


def _parse_until_scan(data: bytes, st: _JpegState) -> Tuple[int, bytes]:
    """Parse markers up to and including SOS; return (scan_data_offset, sos)."""
    i = 0
    n = len(data)
    if n < 2 or data[0] != 0xFF or data[1] != SOI:
        raise InvalidData("mjpeg: no SOI")
    i = 2
    while i + 4 <= n:
        if data[i] != 0xFF:
            i += 1
            continue
        marker = data[i + 1]
        i += 2
        if marker in (SOI, EOI) or 0xD0 <= marker <= 0xD7:
            continue
        if i + 2 > n:
            break
        seglen = data[i] << 8 | data[i + 1]
        seg = data[i + 2:i + seglen]
        if marker == DQT:
            j = 0
            while j < len(seg):
                pq = seg[j] >> 4
                tq = seg[j] & 15
                j += 1
                if pq:
                    q = np.frombuffer(seg[j:j + 128], ">u2").astype(np.int32)
                    j += 128
                else:
                    q = np.frombuffer(seg[j:j + 64], np.uint8).astype(np.int32)
                    j += 64
                st.qtabs[tq] = q
        elif marker == DHT:
            j = 0
            while j < len(seg):
                tc = seg[j] >> 4   # 0=DC 1=AC
                th = seg[j] & 15
                j += 1
                counts = np.frombuffer(seg[j:j + 16], np.uint8)
                j += 16
                total = int(counts.sum())
                values = np.frombuffer(seg[j:j + total], np.uint8)
                j += total
                if tc == 0:
                    st.dc_counts[th] = counts
                    st.dc_values[th, :total] = values
                else:
                    st.ac_counts[th] = counts
                    st.ac_values[th, :total] = values
        elif marker in (SOF0, SOF1, SOF2):
            st.progressive = marker == SOF2
            st.bits = seg[0]
            st.height = seg[1] << 8 | seg[2]
            st.width = seg[3] << 8 | seg[4]
            nc = seg[5]
            st.components = []
            for c in range(nc):
                cid = seg[6 + c * 3]
                hv = seg[7 + c * 3]
                st.components.append(_Component(
                    cid=cid, h=hv >> 4, v=hv & 15, q_idx=seg[8 + c * 3]))
        elif marker == DRI:
            st.restart_interval = seg[0] << 8 | seg[1]
        elif marker == SOS:
            ns = seg[0]
            for c in range(ns):
                cid = seg[1 + c * 2]
                tabs = seg[2 + c * 2]
                for comp in st.components:
                    if comp.cid == cid:
                        comp.dc_tab = tabs >> 4
                        comp.ac_tab = tabs & 15
            return i + seglen, seg
        i += seglen
    raise InvalidData("mjpeg: no SOS marker")


def _pix_fmt_for(st: _JpegState) -> str:
    nc = len(st.components)
    if nc == 1:
        return "gray"
    if nc not in (3, 4):
        raise NotSupported(f"mjpeg: {nc} components")
    hmax = max(c.h for c in st.components)
    vmax = max(c.v for c in st.components)
    c1 = st.components[1]
    key = (hmax // max(1, c1.h), vmax // max(1, c1.v))
    fmt = {(2, 2): "yuv420p", (2, 1): "yuv422p", (1, 1): "yuv444p",
           (4, 1): "yuv411p", (1, 2): "yuv440p"}.get(key)
    if fmt is None:
        raise NotSupported(f"mjpeg: sampling {key}")
    return fmt


# ---------------------------------------------------------------------------
# pure-Python scan decode fallback (slow path; used when csrc/ is absent)
# ---------------------------------------------------------------------------

def _build_lut(counts, values):
    lut_sym = np.zeros(1 << 16, np.uint8)
    lut_len = np.zeros(1 << 16, np.uint8)
    code = 0
    vi = 0
    for l in range(1, 17):
        for _ in range(int(counts[l - 1])):
            lo = code << (16 - l)
            hi = lo + (1 << (16 - l))
            lut_sym[lo:hi] = values[vi]
            lut_len[lo:hi] = l
            code += 1
            vi += 1
        code <<= 1
    return lut_sym, lut_len


def _py_decode_scan(scan: bytes, st: _JpegState, specs, mcus_x, mcus_y, outs):
    luts = {}
    for c, comp in enumerate(st.components):
        luts[(0, comp.dc_tab)] = luts.get((0, comp.dc_tab)) or _build_lut(
            st.dc_counts[comp.dc_tab], st.dc_values[comp.dc_tab])
        luts[(1, comp.ac_tab)] = luts.get((1, comp.ac_tab)) or _build_lut(
            st.ac_counts[comp.ac_tab], st.ac_values[comp.ac_tab])

    # destuff & split at restart markers
    segments = []
    cur = bytearray()
    i = 0
    n = len(scan)
    while i < n:
        b = scan[i]
        if b == 0xFF:
            nxt = scan[i + 1] if i + 1 < n else 0
            if nxt == 0x00:
                cur.append(0xFF)
                i += 2
                continue
            if 0xD0 <= nxt <= 0xD7:
                segments.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
            break
        cur.append(b)
        i += 1
    segments.append(bytes(cur))

    class BR:
        __slots__ = ("d", "pos", "cache", "bits")

        def __init__(self, d):
            self.d = d
            self.pos = 0
            self.cache = 0
            self.bits = 0

        def peek16(self):
            while self.bits < 16:
                b = self.d[self.pos] if self.pos < len(self.d) else 0
                self.pos += 1
                self.cache = (self.cache << 8) | b
                self.bits += 8
            return (self.cache >> (self.bits - 16)) & 0xFFFF

        def skip(self, k):
            self.bits -= k
            self.cache &= (1 << self.bits) - 1

        def get(self, k):
            if k == 0:
                return 0
            v = self.peek16() >> (16 - k)
            self.skip(k)
            return v

    def extend(v, s):
        return v - (1 << s) + 1 if s and v < (1 << (s - 1)) else v

    ri = st.restart_interval
    mcu_total = mcus_x * mcus_y
    seg_idx = 0
    br = BR(segments[0])
    pred = [0] * len(st.components)
    for mcu in range(mcu_total):
        my, mx = divmod(mcu, mcus_x)
        for c, comp in enumerate(st.components):
            ds, dl = luts[(0, comp.dc_tab)]
            asym, alen = luts[(1, comp.ac_tab)]
            bw = specs[c][4]
            for by in range(comp.v):
                for bx in range(comp.h):
                    row = my * comp.v + by
                    col = mx * comp.h + bx
                    blk = outs[c][row * bw + col]
                    look = br.peek16()
                    l = dl[look]
                    if not l:
                        raise InvalidData("mjpeg: bad DC code")
                    s = ds[look]
                    br.skip(int(l))
                    pred[c] += extend(br.get(int(s)), int(s))
                    blk[0] = pred[c]
                    k = 1
                    while k < 64:
                        look = br.peek16()
                        l = alen[look]
                        if not l:
                            raise InvalidData("mjpeg: bad AC code")
                        rs = asym[look]
                        br.skip(int(l))
                        run, sz = rs >> 4, rs & 15
                        if sz == 0:
                            if run == 15:
                                k += 16
                                continue
                            break
                        k += run
                        if k > 63:
                            raise InvalidData("mjpeg: AC overflow")
                        blk[k] = extend(br.get(int(sz)), int(sz))
                        k += 1
        if ri and (mcu + 1) % ri == 0 and mcu + 1 < mcu_total:
            seg_idx += 1
            if seg_idx >= len(segments):
                raise InvalidData("mjpeg: missing restart segment")
            br = BR(segments[seg_idx])
            pred = [0] * len(st.components)


# ---------------------------------------------------------------------------

@register_decoder
class MjpegDecoder(Codec):
    codec_id = "mjpeg"
    codec_type = MediaType.VIDEO
    aliases = ("jpeg", "jpegls_off")

    def decode(self, pkt: Optional[Packet]) -> List[Frame]:
        if pkt is None or not pkt.data:
            return []
        st = _JpegState()
        scan_off, _ = _parse_until_scan(pkt.data, st)
        if st.progressive:
            raise NotSupported("mjpeg: progressive JPEG not yet supported")
        if st.bits != 8:
            raise NotSupported(f"mjpeg: {st.bits}-bit")
        if not st.components or not st.width:
            raise InvalidData("mjpeg: no SOF before SOS")

        hmax = max(c.h for c in st.components)
        vmax = max(c.v for c in st.components)
        mcus_x = -(-st.width // (8 * hmax))
        mcus_y = -(-st.height // (8 * vmax))

        specs = []
        outs = []
        for comp in st.components:
            bw = mcus_x * comp.h
            bh = mcus_y * comp.v
            specs.append((comp.dc_tab, comp.ac_tab, comp.h, comp.v, bw))
            outs.append(np.zeros((bh * bw, 64), np.int16))

        scan = pkt.data[scan_off:]
        self._decode_scan(scan, st, specs, mcus_x, mcus_y, outs)

        # TPU stage: fused dequant+IDCT per component
        planes = []
        for comp, spec, coeffs in zip(st.components, specs, outs):
            bw = spec[4]
            bh = coeffs.shape[0] // bw
            cw = -(-st.width * comp.h // hmax)
            ch = -(-st.height * comp.v // vmax)
            q = st.qtabs[comp.q_idx]
            plane = jpeg_block_transform(
                coeffs.reshape(bh, bw, 64), q.astype(np.int32), ch, cw)
            planes.append(plane)

        fmt = _pix_fmt_for(st)
        f = Frame.video(st.width, st.height, fmt, planes=planes,
                        pts=pkt.pts, duration=pkt.duration,
                        time_base=pkt.time_base)
        f.color_range = "pc"
        f.color_space = "bt470bg"
        f.chroma_location = "center"
        return [f]

    def _decode_scan(self, scan, st, specs, mcus_x, mcus_y, outs):
        try:
            lib = native.get()
        except native.NativeUnavailable:
            self._decode_scan_py(scan, st, specs, mcus_x, mcus_y, outs)
            return
        spec_arr = (ctypes.c_int * (5 * len(specs)))(
            *[v for s in specs for v in s])
        out_ptrs = (ctypes.POINTER(ctypes.c_int16) * len(outs))(
            *[o.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)) for o in outs])
        ret = lib.mjpeg_decode_scan(
            scan, len(scan),
            st.dc_counts.tobytes(), st.dc_values.tobytes(),
            st.ac_counts.tobytes(), st.ac_values.tobytes(),
            spec_arr, len(specs), mcus_x, mcus_y, st.restart_interval,
            64, out_ptrs)
        if ret != 0:
            raise InvalidData(f"mjpeg: scan decode failed ({ret})")

    def _decode_scan_py(self, scan, st, specs, mcus_x, mcus_y, outs):
        _py_decode_scan(scan, st, specs, mcus_x, mcus_y, outs)
